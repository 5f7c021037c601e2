from keep_tpu.utils.logging import AverageMeter, setup_logging  # noqa: F401
