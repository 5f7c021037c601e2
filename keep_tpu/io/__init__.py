from keep_tpu.io.h5 import WSIDataset, read_h5_slide  # noqa: F401
from keep_tpu.io.fast_decode import decode_files, decode_image  # noqa: F401
from keep_tpu.io.tiles import cut_tiles, iter_wsi_tiles, tissue_mask  # noqa: F401
from keep_tpu.io.wsi import WSIReader, open_slide, write_pyramid  # noqa: F401
