"""Flash-attention kernel vs the XLA reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from keep_tpu.kernels.flash_attention import flash_attention
from keep_tpu.ops.nn import mha_attention


@pytest.mark.parametrize("s", [197, 256, 64])
def test_matches_xla(s, rng):
    b, h, dh = 2, 4, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, dh), dtype=np.float32))
        for _ in range(3)
    )
    ref = np.asarray(mha_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, group=4))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_with_key_bias(rng):
    b, h, s, dh = 3, 2, 40, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, dh), dtype=np.float32))
        for _ in range(3)
    )
    mask = np.ones((b, s), np.float32)
    mask[1, 25:] = 0
    mask[2, 7:] = 0
    bias = jnp.asarray((1.0 - mask)[:, None, None, :] * -1e9)
    ref = np.asarray(mha_attention(q, k, v, bias=bias))
    got = np.asarray(flash_attention(q, k, v, bias=bias, group=2))
    valid = mask.astype(bool)
    # compare query rows at valid positions for every batch (padded-key cols
    # never contribute; padded-query rows are still computed identically)
    np.testing.assert_allclose(got.transpose(0, 2, 1, 3)[valid],
                               ref.transpose(0, 2, 1, 3)[valid],
                               atol=2e-5, rtol=2e-5)


def test_bf16(rng):
    b, h, s, dh = 2, 4, 197, 64
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, h, s, dh), dtype=np.float32)
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    ref = np.asarray(mha_attention(q, k, v)).astype(np.float32)
    got = np.asarray(flash_attention(q, k, v)).astype(np.float32)
    assert np.max(np.abs(got - ref)) < 0.05


def test_slab_kernel_matches(rng):
    """attention_qkv_slab (unsplit [B,S,3HD] input) == generic path."""
    from keep_tpu.kernels.flash_attention import attention_qkv_slab

    b, s, h, dh = 2, 50, 4, 16
    qkv = rng.standard_normal((b, s, 3 * h * dh)).astype(np.float32)
    got = np.asarray(
        attention_qkv_slab(jnp.asarray(qkv), num_heads=h)
    )
    qh = qkv.reshape(b, s, 3, h, dh).transpose(2, 0, 3, 1, 4)
    ref = np.asarray(
        mha_attention(jnp.asarray(qh[0]), jnp.asarray(qh[1]), jnp.asarray(qh[2]))
    ).transpose(0, 2, 1, 3).reshape(b, s, h * dh)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)

    # with key bias
    mask = np.ones((b, s), np.float32)
    mask[1, 30:] = 0
    kb = jnp.asarray((1.0 - mask) * -1e9)
    got_b = np.asarray(
        attention_qkv_slab(jnp.asarray(qkv), key_bias=kb, num_heads=h)
    )
    ref_b = np.asarray(
        mha_attention(
            jnp.asarray(qh[0]), jnp.asarray(qh[1]), jnp.asarray(qh[2]),
            bias=kb[:, None, None, :],
        )
    ).transpose(0, 2, 1, 3).reshape(b, s, h * dh)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got_b[valid], ref_b[valid], atol=2e-5, rtol=2e-5)


def test_group_fallback_when_not_divisible(rng):
    """B*H=6 not divisible by default group=8 → group degrades cleanly."""
    b, h, s, dh = 3, 2, 30, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, dh), dtype=np.float32))
    out = flash_attention(q, q, q)
    ref = np.asarray(mha_attention(q, q, q))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_slab_kernel_gradients(rng):
    """Custom VJP (Pallas fwd / XLA bwd) == pure-XLA gradients."""
    import jax

    from keep_tpu.kernels.flash_attention import attention_qkv_slab

    b, s, h, dh = 2, 33, 4, 16
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * dh)).astype(np.float32))
    mask = np.ones((b, s), np.float32)
    mask[1, 20:] = 0
    kb = jnp.asarray((1.0 - mask) * -1e9)
    tgt = jnp.asarray(rng.standard_normal((b, s, h * dh)).astype(np.float32))

    def loss_flash(qkv):
        out = attention_qkv_slab(qkv, key_bias=kb, num_heads=h)
        return jnp.sum((out - tgt) ** 2 * jnp.asarray(mask)[..., None])

    def loss_xla(qkv):
        qh = qkv.reshape(b, s, 3, h, dh).transpose(2, 0, 3, 1, 4)
        out = mha_attention(qh[0], qh[1], qh[2], bias=kb[:, None, None, :])
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * dh)
        return jnp.sum((out - tgt) ** 2 * jnp.asarray(mask)[..., None])

    v1, g1 = jax.value_and_grad(loss_flash)(qkv)
    v2, g2 = jax.value_and_grad(loss_xla)(qkv)
    assert float(v1) == pytest.approx(float(v2), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4, rtol=1e-4)


def test_bad_head_count_raises(rng):
    """Non-divisible lane dims raise instead of silently truncating heads."""
    from keep_tpu.kernels.flash_attention import (attention_qkv_heads,
                                                  attention_qkv_slab)

    x = jnp.asarray(rng.standard_normal((2, 8, 96), dtype=np.float32))
    with pytest.raises(ValueError, match="not divisible"):
        attention_qkv_heads(x, x, x, num_heads=5)
    with pytest.raises(ValueError, match="not divisible"):
        attention_qkv_slab(x, num_heads=5)


def test_ln_matmul_matches_unfused(rng):
    from keep_tpu.kernels.ln_matmul import ln_matmul
    from keep_tpu.ops.nn import layer_norm, linear

    m, k, n = 70, 64, 48
    x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32))
    g = jnp.asarray(rng.random(k).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.standard_normal(k).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.05)
    wb = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.01)
    got = np.asarray(ln_matmul(x, g, b, w, wb, eps=1e-6, out_dtype=jnp.float32))
    y = layer_norm({"scale": g, "bias": b}, x, 1e-6)
    ref = np.asarray(linear({"kernel": w, "bias": wb}, y))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)
