"""Swin / ctranspath tower: window math, shifted masks, end-to-end shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.models import swin
from keep_tpu.models.swin import (

    SwinConfig,
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_reverse,
)

pytestmark = pytest.mark.slow  # oracle/parity tests; fast pass: -m 'not slow'

TINY = SwinConfig(
    img_size=32, embed_dim=16, depths=(1, 1), heads=(2, 4), window=4,
)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5), dtype=np.float32))
    wins = window_partition(x, 4)
    assert wins.shape == (2 * 2 * 3, 4, 4, 5)
    back = window_reverse(wins, 4, 8, 12)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index():
    idx = relative_position_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25  # (2*3-1)^2 table entries
    # relative displacement symmetry: idx[i,j] and idx[j,i] mirror around center
    assert idx[0, 0] == idx[4, 4] == idx[8, 8]  # zero displacement


def test_shift_mask_blocks_cross_seam():
    mask = shift_attn_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    # some pairs masked, diagonals never
    assert (mask < 0).any()
    for wi in range(4):
        assert (np.diag(mask[wi]) == 0).all()


def test_forward_shapes(rng):
    params = swin.init(jax.random.PRNGKey(0), TINY)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    out = swin.forward(params, x, TINY)
    assert out.shape == (2, TINY.embed_dim * 2)  # one merge: 16 → 32
    assert np.isfinite(np.asarray(out)).all()


def test_linear_patch_embed_variant(rng):
    cfg = SwinConfig(img_size=32, embed_dim=16, depths=(1, 1), heads=(2, 4),
                     window=4, conv_stem=False)
    params = swin.init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    out = swin.forward(params, x, cfg)
    assert out.shape == (1, 32)


def test_shifted_window_changes_output(rng):
    """The shifted block must mix information across window boundaries:
    zeroing a far-away pixel changes a window's output only via shift."""
    params = swin.init(jax.random.PRNGKey(0), TINY)
    x = np.zeros((1, 32, 32, 3), np.float32)
    x[0, :16] = rng.standard_normal((16, 32, 3))
    a = np.asarray(swin.forward(params, jnp.asarray(x), TINY))
    x2 = x.copy()
    # both signs: the ctranspath stem's first conv has only d/8 channels
    # at this tiny width and its ReLU could swallow a one-signed bump
    x2[0, 20, 20] = 5.0
    x2[0, 21, 21] = -5.0
    b = np.asarray(swin.forward(params, jnp.asarray(x2), TINY))
    assert np.abs(a - b).max() > 1e-6


def test_swin_t_full_config(rng):
    """Full Swin-T at 224² (conv stem, 4 stages) produces 768-d features."""
    cfg = SwinConfig()
    params = swin.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((1, 224, 224, 3), dtype=np.float32))
    out = swin.forward(params, x, cfg)
    assert out.shape == (1, 768)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_timm_swin_layout(rng):
    """Synthetic timm-layout Swin state dict converts and runs (linear
    patch-embed variant)."""
    import torch

    from keep_tpu.models.swin import convert_timm_swin

    cfg = SwinConfig(img_size=32, embed_dim=16, depths=(1, 1), heads=(2, 4),
                     window=4, conv_stem=False)
    torch.manual_seed(0)
    sd = {}
    sd["patch_embed.proj.weight"] = torch.randn(16, 3, 4, 4) * 0.05
    sd["patch_embed.proj.bias"] = torch.zeros(16)
    sd["patch_embed.norm.weight"] = torch.rand(16) + 0.5
    sd["patch_embed.norm.bias"] = torch.randn(16) * 0.1
    c = 16
    for si, depth in enumerate(cfg.depths):
        for bi in range(depth):
            pre = f"layers.{si}.blocks.{bi}"
            sd[pre + ".norm1.weight"] = torch.rand(c) + 0.5
            sd[pre + ".norm1.bias"] = torch.randn(c) * 0.1
            sd[pre + ".attn.qkv.weight"] = torch.randn(3 * c, c) * 0.05
            sd[pre + ".attn.qkv.bias"] = torch.zeros(3 * c)
            sd[pre + ".attn.proj.weight"] = torch.randn(c, c) * 0.05
            sd[pre + ".attn.proj.bias"] = torch.zeros(c)
            sd[pre + ".attn.relative_position_bias_table"] = (
                torch.randn((2 * 4 - 1) ** 2, cfg.heads[si]) * 0.02
            )
            sd[pre + ".norm2.weight"] = torch.rand(c) + 0.5
            sd[pre + ".norm2.bias"] = torch.randn(c) * 0.1
            sd[pre + ".mlp.fc1.weight"] = torch.randn(4 * c, c) * 0.05
            sd[pre + ".mlp.fc1.bias"] = torch.zeros(4 * c)
            sd[pre + ".mlp.fc2.weight"] = torch.randn(c, 4 * c) * 0.05
            sd[pre + ".mlp.fc2.bias"] = torch.zeros(c)
        if si < len(cfg.depths) - 1:
            sd[f"layers.{si}.downsample.norm.weight"] = torch.rand(4 * c) + 0.5
            sd[f"layers.{si}.downsample.norm.bias"] = torch.randn(4 * c) * 0.1
            sd[f"layers.{si}.downsample.reduction.weight"] = torch.randn(2 * c, 4 * c) * 0.05
            c *= 2
    sd["norm.weight"] = torch.rand(c) + 0.5
    sd["norm.bias"] = torch.randn(c) * 0.1

    params = convert_timm_swin(sd, cfg)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    out = swin.forward(jax.tree.map(jnp.asarray, params), x, cfg)
    assert out.shape == (1, 32)
    assert np.isfinite(np.asarray(out)).all()
