from keep_tpu.kernels.flash_attention import (  # noqa: F401
    attention_qkv_heads,
    attention_qkv_slab,
    flash_attention,
)
from keep_tpu.kernels.ln_matmul import ln_matmul  # noqa: F401
from keep_tpu.kernels.qmatmul import qlinear_fused, quantized_matmul  # noqa: F401
