"""KEEP facade API contract: encode_image/encode_text shapes, unit norm,
logit_scale, end-to-end conversion of a full torch KEEP state dict."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from keep_tpu.compat.torch_loader import convert_keep_state_dict
from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
from keep_tpu.models import keep
from tests.test_bert_parity import make_hf_model
from tests.torch_fixtures import TorchViT

TINY = KEEPConfig(
    vision=ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4),
    text=BertConfig(
        vocab_size=128, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, max_position_embeddings=64,
    ),
    projection_dim=48,  # == text hidden size, as in the real model (768 == 768)
)


def build_torch_keep(cfg: KEEPConfig):
    """Assemble a torch state dict in the released HF layout
    (visual.* / visual_head.{0,2}.* / text.* / logit_scale)."""
    torch.manual_seed(1)
    visual = TorchViT(cfg.vision)
    head = nn.Sequential(
        nn.Linear(cfg.vision.embed_dim, cfg.projection_dim),
        nn.GELU(),
        nn.Linear(cfg.projection_dim, cfg.projection_dim),
    )
    text = make_hf_model(cfg.text)
    sd = {}
    sd.update({f"visual.{k}": v for k, v in visual.state_dict().items()})
    sd.update({f"visual_head.{k}": v for k, v in head.state_dict().items()})
    sd.update({f"text.{k}": v for k, v in text.state_dict().items()})
    sd["logit_scale"] = torch.ones([]) * np.log(1 / 0.04)
    return visual, head, text, sd


def test_encode_image_parity(rng):
    visual, head, text, sd = build_torch_keep(TINY)
    params = convert_keep_state_dict(sd, TINY)
    x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        feats = visual(torch.from_numpy(x).permute(0, 3, 1, 2))
        ref = torch.nn.functional.normalize(head(feats), dim=-1).numpy()
    got = np.asarray(keep.encode_image(params, jnp.asarray(x), TINY))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-6)


def test_encode_text_parity(rng):
    visual, head, text, sd = build_torch_keep(TINY)
    params = convert_keep_state_dict(sd, TINY)
    ids = rng.integers(1, TINY.text.vocab_size, size=(3, 24))
    mask = np.ones((3, 24), np.int64)
    mask[1, 10:] = 0
    mask[2, 4:] = 0
    ids = ids * mask
    with torch.no_grad():
        pooled = text(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).pooler_output
        ref = torch.nn.functional.normalize(pooled, dim=-1).numpy()
    got = np.asarray(
        keep.encode_text(params, jnp.asarray(ids), jnp.asarray(mask), cfg=TINY)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_similarity_row_parity(rng):
    """The quick_start end print: img_feature @ text_feature.T
    (reference keep_inference.py:104)."""
    visual, head, text, sd = build_torch_keep(TINY)
    params = convert_keep_state_dict(sd, TINY)
    x = rng.standard_normal((1, 32, 32, 3), dtype=np.float32)
    ids = rng.integers(1, TINY.text.vocab_size, size=(3, 16))
    with torch.no_grad():
        img = torch.nn.functional.normalize(
            head(visual(torch.from_numpy(x).permute(0, 3, 1, 2))), dim=-1
        )
        txt = torch.nn.functional.normalize(
            text(input_ids=torch.from_numpy(ids)).pooler_output, dim=-1
        )
        ref = (img @ txt.T).numpy()
    img_j = keep.encode_image(params, jnp.asarray(x), TINY)
    txt_j = keep.encode_text(params, jnp.asarray(ids), cfg=TINY)
    got = np.asarray(img_j @ txt_j.T)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_init_and_model_wrapper(rng):
    params = keep.init(jax.random.PRNGKey(0), TINY)
    model = keep.KEEPModel(params=params, cfg=TINY)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(1, TINY.text.vocab_size, size=(2, 16)))
    img = model.encode_image(x)
    txt = model.encode_text(ids)
    assert img.shape == (2, TINY.projection_dim)
    assert txt.shape == (2, TINY.text.hidden_size)
    assert abs(model.logit_scale - 25.0) < 1e-3  # exp(ln(1/0.04)) = 25


def test_converter_released_key_quirks(rng):
    """Checkpoint quirk round-trip: DDP ``module.`` prefixes on every key,
    ``position_ids`` buffers (older transformers), and the training
    ``{'state_dict': ...}`` wrapper must all convert to the identical pytree
    (reference main.py:306-326, factory.py:101-109)."""
    *_, sd = build_torch_keep(TINY)
    clean = convert_keep_state_dict(sd, TINY)

    quirky = {f"module.{k}": v for k, v in sd.items()}
    quirky["module.text.embeddings.position_ids"] = torch.arange(64)[None]
    wrapped = {"state_dict": quirky, "epoch": 3, "name": "exp"}
    got = convert_keep_state_dict(wrapped, TINY)

    flat_a = jax.tree_util.tree_leaves_with_path(clean)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(got)}
    assert len(flat_a) == len(flat_b)
    for p, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(flat_b[jax.tree_util.keystr(p)]),
                                      err_msg=jax.tree_util.keystr(p))


def test_forward_contract_and_aux():
    """keep.forward matches every other family's contract
    ('image_features'/'text_features'); return_aux surfaces the MoE aux
    without leaking the kwarg into encode_text."""
    import jax

    from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig

    cfg = KEEPConfig(
        vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=1,
                         num_heads=2),
        text=BertConfig(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=16),
        projection_dim=32, max_text_length=16,
    )
    params = keep.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 32, (2, 16)))
    out = keep.forward(params, px, ids, None, cfg)
    assert set(out) == {"image_features", "text_features"}
    out2 = keep.forward(params, px, ids, None, cfg, return_aux=True)
    assert set(out2) == {"image_features", "text_features", "aux"}
    assert float(out2["aux"]) == 0.0  # dense trunk
    np.testing.assert_allclose(np.asarray(out["image_features"]),
                               np.asarray(out2["image_features"]), atol=0)


def test_vit_init_matches_converted_structure():
    """init() and the torch converter must produce the SAME pytree
    structure for the same config — LayerScale params exist iff
    layerscale_init is set (regression: init emitted ls1/ls2 at 1.0 for
    layerscale_init=None archs, silently changing CLIP/CoCa trunks and
    breaking tree.map against converted checkpoints)."""
    import jax

    from keep_tpu.configs import ViTConfig
    from keep_tpu.models import vit

    with_ls = vit.init(jax.random.PRNGKey(0),
                       ViTConfig(img_size=16, patch_size=8, embed_dim=32,
                                 depth=2, num_heads=2, layerscale_init=1e-5))
    without = vit.init(jax.random.PRNGKey(0),
                       ViTConfig(img_size=16, patch_size=8, embed_dim=32,
                                 depth=2, num_heads=2, layerscale_init=None))
    assert "ls1" in with_ls["blocks"] and "ls2" in with_ls["blocks"]
    assert "ls1" not in without["blocks"] and "ls2" not in without["blocks"]
