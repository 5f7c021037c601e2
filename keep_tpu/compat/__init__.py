from keep_tpu.compat.composite import (  # noqa: F401
    load_coca_checkpoint,
    load_kep_checkpoint,
    load_pmc_clip_checkpoint,
)
from keep_tpu.compat.torch_loader import (  # noqa: F401
    convert_hf_bert,
    convert_timm_vit,
    load_keep_checkpoint,
)
