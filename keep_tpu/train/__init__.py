from keep_tpu.train import loss  # noqa: F401
