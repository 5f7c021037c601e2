from keep_tpu.io.h5 import WSIDataset, read_h5_slide  # noqa: F401
from keep_tpu.io.fast_decode import decode_files, decode_image  # noqa: F401
