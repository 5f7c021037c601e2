"""Golden parity: keep_tpu ViT vs a torch fixture with timm semantics."""

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
