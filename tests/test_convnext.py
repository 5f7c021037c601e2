"""ConvNeXt tower parity vs the REAL ``transformers.ConvNextModel`` oracle
(the reference's convnext_* presets delegate to timm via TimmModel,
timm_model.py:28-149; HF's ConvNeXt is the same published architecture)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.models import convnext

pytestmark = pytest.mark.slow  # oracle/parity tests; fast pass: -m 'not slow'

DIMS = (8, 16, 32, 64)
DEPTHS = (1, 2, 2, 1)
CFG = convnext.ConvNeXtConfig(img_size=64, depths=DEPTHS, dims=DIMS,
                              ln_eps=1e-12)  # HF default eps


@pytest.fixture(scope="module")
def oracle():
    import torch
    from transformers import ConvNextConfig, ConvNextModel

    torch.manual_seed(0)
    m = ConvNextModel(ConvNextConfig(
        num_channels=3, hidden_sizes=list(DIMS), depths=list(DEPTHS),
        image_size=CFG.img_size)).eval()
    # HF inits layer_scale_parameter to 1e-6; randomize so the test is sharp
    with torch.no_grad():
        for mod in m.state_dict().values():
            if mod.ndim == 1 and mod.numel() in DIMS:
                mod.add_(torch.randn_like(mod) * 0.05)
    return m


def test_convnext_matches_transformers(oracle):
    import torch

    params = convnext.convert_hf_convnext(oracle.state_dict(), CFG)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, CFG.img_size, CFG.img_size, 3),
                            dtype=np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).pooler_output
    got = np.asarray(convnext.forward(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x), CFG))
    # conv stacks accumulate in different orders (oneDNN vs XLA); 1e-4 is
    # well below any architectural discrepancy at these scales
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-4, rtol=1e-3)


def test_convnext_init_and_shapes():
    params = convnext.init(jax.random.PRNGKey(0), CFG)
    x = jnp.zeros((1, 64, 64, 3))
    pooled = convnext.forward(params, x, CFG)
    assert pooled.shape == (1, 64)
    fmap = convnext.forward(params, x, CFG, pool=False)
    assert fmap.shape == (1, 2, 2, 64)  # 64 / 4 / 2 / 2 / 2
    assert np.isfinite(np.asarray(pooled)).all()


def test_convnext_timm_layout_roundtrip(oracle):
    """timm-layout keys (stem.N / stages.N.blocks.M.conv_dw|mlp.fcK|gamma /
    head.norm) convert to the same pytree as the HF layout."""
    import torch

    hf = oracle.state_dict()
    timm_sd = {}
    timm_sd["stem.0.weight"] = hf["embeddings.patch_embeddings.weight"]
    timm_sd["stem.0.bias"] = hf["embeddings.patch_embeddings.bias"]
    timm_sd["stem.1.weight"] = hf["embeddings.layernorm.weight"]
    timm_sd["stem.1.bias"] = hf["embeddings.layernorm.bias"]
    timm_sd["head.norm.weight"] = hf["layernorm.weight"]
    timm_sd["head.norm.bias"] = hf["layernorm.bias"]
    ren = {"dwconv": "conv_dw", "layernorm": "norm", "pwconv1": "mlp.fc1",
           "pwconv2": "mlp.fc2", "layer_scale_parameter": "gamma"}
    for s in range(4):
        for i in range(DEPTHS[s]):
            for old, new in ren.items():
                for suf in ([""] if old == "layer_scale_parameter"
                            else [".weight", ".bias"]):
                    src = f"encoder.stages.{s}.layers.{i}.{old}{suf}"
                    dst = (f"stages.{s}.blocks.{i}.{new}{suf}"
                           if suf else f"stages.{s}.blocks.{i}.{new}")
                    timm_sd[dst] = hf[src]
        if s > 0:
            for j in (0, 1):
                for suf in (".weight", ".bias"):
                    timm_sd[f"stages.{s}.downsample.{j}{suf}"] = hf[
                        f"encoder.stages.{s}.downsampling_layer.{j}{suf}"]
    a = convnext.convert_hf_convnext(hf, CFG)
    b = convnext.convert_timm_convnext(timm_sd, CFG)
    jax.tree.map(np.testing.assert_array_equal, a, b)
