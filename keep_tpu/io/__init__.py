from keep_tpu.io.h5 import WSIDataset, read_h5_slide  # noqa: F401
