from keep_tpu.compat.torch_loader import (  # noqa: F401
    convert_hf_bert,
    convert_timm_vit,
    load_keep_checkpoint,
)
