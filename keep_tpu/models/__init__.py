from keep_tpu.models import bert, keep, vit  # noqa: F401
