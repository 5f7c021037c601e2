from keep_tpu.ops.nn import (  # noqa: F401
    gelu,
    l2_normalize,
    layer_norm,
    linear,
    mha_attention,
    mlp,
)
from keep_tpu.ops.preprocess import normalize_only, preprocess  # noqa: F401
