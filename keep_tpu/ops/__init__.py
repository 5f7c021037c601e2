from keep_tpu.ops.nn import gelu, layer_norm, linear, mha_attention, mlp  # noqa: F401
