"""Golden parity: keep_tpu ViT vs a torch fixture with timm semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from keep_tpu.compat.torch_loader import convert_timm_vit
from keep_tpu.configs import ViTConfig
from keep_tpu.models import vit
from tests.torch_fixtures import TorchViT

SMALL = ViTConfig(
    img_size=32, patch_size=8, embed_dim=64, depth=3, num_heads=4, mlp_ratio=2.0
)
MEDIUM = ViTConfig(
    img_size=64, patch_size=16, embed_dim=128, depth=4, num_heads=8
)


@pytest.mark.parametrize("cfg", [SMALL, MEDIUM], ids=["small", "medium"])
def test_vit_matches_torch(cfg, rng):
    tmodel = TorchViT(cfg).eval()
    params = convert_timm_vit(tmodel.state_dict(), cfg)

    x = rng.standard_normal((2, cfg.img_size, cfg.img_size, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(vit.forward(params, jnp.asarray(x), cfg))

    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_vit_no_layerscale(rng):
    cfg = ViTConfig(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        layerscale_init=None,
    )
    # torch fixture with layerscale ~ 1.0 equals a no-layerscale model.
    tcfg = ViTConfig(**{**cfg.__dict__, "layerscale_init": 1.0})
    tmodel = TorchViT(tcfg).eval()
    params = convert_timm_vit(tmodel.state_dict(), tcfg)
    del params["blocks"]["ls1"], params["blocks"]["ls2"]

    x = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(vit.forward(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_dynamic_image_size(rng):
    """dynamic_img_size=True semantics: other multiples of P run with a
    bicubically resampled pos embed (reference model.py:563-594)."""
    cfg = SMALL
    tmodel = TorchViT(cfg).eval()
    params = convert_timm_vit(tmodel.state_dict(), cfg)
    x = rng.standard_normal((2, 48, 64, 3), dtype=np.float32)
    out = vit.forward(params, jnp.asarray(x), cfg)
    assert out.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_resample_pos_embed_matches_torch(rng):
    """resample_pos_embed == the reference's F.interpolate(mode='bicubic',
    antialias=True, align_corners=False) resample (model.py:563-594),
    oracle-checked against real torch at up- and down-scale."""
    import torch.nn.functional as F

    d = 6
    for old, (gh, gw) in [(14, (32, 32)), (16, (7, 9)), (8, (11, 5))]:
        pe = rng.standard_normal((1, 1 + old * old, d)).astype(np.float32)
        got = np.asarray(vit.resample_pos_embed(jnp.asarray(pe), (gh, gw), 1))
        grid = torch.from_numpy(
            pe[0, 1:].reshape(1, old, old, d)).permute(0, 3, 1, 2)
        ref = F.interpolate(grid, size=(gh, gw), mode="bicubic",
                            antialias=True, align_corners=False)
        ref = ref.permute(0, 2, 3, 1).reshape(1, gh * gw, d).numpy()
        np.testing.assert_allclose(got[:, 1:], ref, atol=2e-5, rtol=1e-4)
        np.testing.assert_array_equal(got[:, :1], pe[:, :1])  # prefix kept


def test_fuse_ln_parity(rng):
    """The opt-in fuse_ln path (kernels/ln_matmul) must stay numerically
    equal to the unfused forward (it is perf-gated off by default,
    docs/PERF.md — this pins it against bit-rot)."""
    cfg = SMALL
    params = vit.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    base = np.asarray(vit.forward(params, x, cfg, use_flash=True))
    fused = np.asarray(vit.forward(params, x, cfg, use_flash=True,
                                   fuse_ln=True))
    np.testing.assert_allclose(fused, base, atol=2e-5, rtol=2e-5)


def test_validation_errors(rng):
    """Clear errors instead of silent mismatch / opaque broadcast failures."""
    import dataclasses

    from keep_tpu.configs import BertConfig
    from keep_tpu.models import bert
    from keep_tpu.ops.nn import mlp

    with pytest.raises(ValueError, match="register tokens"):
        cfg2 = dataclasses.replace(SMALL, num_prefix_tokens=2)
        vit.forward(vit.init(jax.random.PRNGKey(0), SMALL),
                    jnp.zeros((1, 32, 32, 3)), cfg2)

    bcfg = BertConfig(vocab_size=50, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=16)
    bparams = bert.init(jax.random.PRNGKey(0), bcfg)
    with pytest.raises(ValueError, match="max_position_embeddings"):
        bert.forward(bparams, jnp.ones((1, 32), jnp.int32), cfg=bcfg)

    p = {"fc1": {"kernel": jnp.zeros((4, 8)), "bias": jnp.zeros(8)},
         "fc2": {"kernel": jnp.zeros((8, 4)), "bias": jnp.zeros(4)}}
    with pytest.raises(ValueError, match="unknown mlp act"):
        mlp(p, jnp.zeros((2, 4)), act="relu")


def test_bf16_close_to_fp32(rng):
    cfg = SMALL
    tmodel = TorchViT(cfg).eval()
    params = convert_timm_vit(tmodel.state_dict(), cfg)
    x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    f32 = np.asarray(vit.forward(params, jnp.asarray(x), cfg))
    bf16 = np.asarray(
        vit.forward(params, jnp.asarray(x), cfg, dtype=jnp.bfloat16)
    ).astype(np.float32)
    # bf16 matmuls with fp32 accumulation & fp32 LN: outputs stay close.
    assert np.max(np.abs(f32 - bf16)) < 0.15
    corr = np.corrcoef(f32.ravel(), bf16.ravel())[0, 1]
    assert corr > 0.999


def test_remat_matches(rng):
    cfg = SMALL
    tmodel = TorchViT(cfg).eval()
    params = convert_timm_vit(tmodel.state_dict(), cfg)
    x = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
    a = np.asarray(vit.forward(params, jnp.asarray(x), cfg))
    b = np.asarray(vit.forward(params, jnp.asarray(x), cfg, remat=True))
    np.testing.assert_allclose(a, b, atol=1e-6)
