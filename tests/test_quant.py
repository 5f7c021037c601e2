"""int8 quantized inference path: accuracy vs fp32 + pipeline integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.configs import ViTConfig
from keep_tpu.models import vit
from keep_tpu.ops.nn import linear
from keep_tpu.quant import (
    quantization_error,
    quantize_kernel,
    quantize_linear_weights,
)


def test_qlinear_accuracy(rng):
    x = jnp.asarray(rng.standard_normal((64, 128), dtype=np.float32))
    p = {
        "kernel": jnp.asarray(rng.standard_normal((128, 96), dtype=np.float32) * 0.05),
        "bias": jnp.asarray(rng.standard_normal(96, dtype=np.float32) * 0.01),
    }
    ref = np.asarray(linear(p, x))
    qp = {**quantize_kernel(p["kernel"]), "bias": p["bias"]}
    got = np.asarray(linear(qp, x))
    # W8A8 error bound: ~1% relative on random gaussians
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02
    cos = np.sum(got * ref) / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.9995


def test_quantize_pytree_structure(rng):
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_linear_weights(params)
    blocks = qparams["blocks"]
    assert blocks["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    assert blocks["attn"]["qkv"]["scale"].shape == (2, 3 * 64)
    assert blocks["mlp"]["fc1"]["kernel_q"].shape == (2, 64, 256)  # ratio 4.0
    assert qparams["patch_embed"]["kernel_q"].dtype == jnp.int8
    # non-targets untouched
    assert "kernel_q" not in str(type(qparams["norm"]))
    assert (np.asarray(qparams["cls_token"]) == np.asarray(params["cls_token"])).all()
    errs = quantization_error(params, qparams)
    assert errs and max(errs.values()) < 0.01


def test_vit_int8_close_to_fp32(rng):
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=4)
    params = vit.init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3), dtype=np.float32))
    ref = np.asarray(vit.forward(params, x, cfg))
    got = np.asarray(vit.forward(quantize_linear_weights(params), x, cfg))
    cos = np.mean(
        np.sum(got * ref, axis=1)
        / (np.linalg.norm(got, axis=1) * np.linalg.norm(ref, axis=1))
    )
    assert cos > 0.995, cos


def test_int8_keep_encode(rng):
    from keep_tpu.models import keep
    from tests.test_keep_api import TINY

    params = keep.init(jax.random.PRNGKey(0), TINY)
    qparams = quantize_linear_weights(params)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    a = np.asarray(keep.encode_image(params, x, TINY))
    b = np.asarray(keep.encode_image(qparams, x, TINY))
    cos = np.mean(np.sum(a * b, axis=1))  # both unit-norm
    assert cos > 0.99, cos
    ids = jnp.asarray(rng.integers(1, TINY.text.vocab_size, (2, 16)))
    ta = np.asarray(keep.encode_text(params, ids, cfg=TINY))
    tb = np.asarray(keep.encode_text(qparams, ids, cfg=TINY))
    assert np.mean(np.sum(ta * tb, axis=1)) > 0.99


def test_fused_qmatmul_matches_xla_qlinear(rng):
    """The fused Pallas kernel (interpret mode on CPU) == the XLA W8A8 path."""
    import jax.numpy as jnp

    from keep_tpu.kernels.qmatmul import quantized_matmul
    from keep_tpu.quant import quantize_kernel

    x = rng.standard_normal((70, 128)).astype(np.float32)
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.05
    bias = rng.standard_normal(64).astype(np.float32) * 0.01
    q = quantize_kernel(jnp.asarray(w))
    ref = np.asarray(linear({**q, "bias": jnp.asarray(bias)}, jnp.asarray(x)))
    got = np.asarray(quantized_matmul(
        jnp.asarray(x), q["kernel_q"], q["scale"], jnp.asarray(bias),
        out_dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    # fused gelu epilogue vs post-hoc tanh gelu
    got_g = np.asarray(quantized_matmul(
        jnp.asarray(x), q["kernel_q"], q["scale"], jnp.asarray(bias),
        activation="gelu_tanh", out_dtype=jnp.float32))
    ref_g = np.asarray(jax.nn.gelu(jnp.asarray(ref), approximate=True))
    np.testing.assert_allclose(got_g, ref_g, atol=1e-4, rtol=1e-3)
