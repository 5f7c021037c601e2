"""EVA02 trunk + relpos ViT + coca_roberta wiring.

No released-weight oracle exists in-image (timm uninstallable), so these
tests establish correctness by INVARIANTS — rope relative-position
invariance/norm preservation, relpos-bias translation invariance — plus
synthetic timm-layout converter round-trips and end-to-end preset builds
(round-2 review missing #2 / next-round #4).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.models import eva
from keep_tpu.models import vit_relpos as vrp


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# rope invariants
# ---------------------------------------------------------------------------


def test_rope_relative_position_invariance(rng):
    """q·k after rotation depends only on the RELATIVE grid offset: shifting
    both positions by the same delta leaves the score unchanged — the defining
    property of rotary embeddings (holds per axis in the 2D axial split)."""
    dh, g = 16, 8
    ang = eva.rope_2d_angles(g, g, dh, temperature=100.0)
    q = rng.standard_normal(dh).astype(np.float32)
    k = rng.standard_normal(dh).astype(np.float32)

    def score(pq, pk):
        iq, ik = pq[0] * g + pq[1], pk[0] * g + pk[1]
        rq = eva.apply_rope(jnp.asarray(q)[None], ang[iq][None])[0]
        rk = eva.apply_rope(jnp.asarray(k)[None], ang[ik][None])[0]
        return float(jnp.dot(rq, rk))

    base = score((1, 2), (3, 1))
    for dr, dc in [(1, 0), (0, 3), (2, 4)]:
        shifted = score((1 + dr, 2 + dc), (3 + dr, 1 + dc))
        assert shifted == pytest.approx(base, abs=1e-4), (dr, dc)
    # and it DOES change when the relative offset changes
    assert score((1, 2), (4, 1)) != pytest.approx(base, abs=1e-3)


def test_rope_norm_preservation_and_identity(rng):
    dh, g = 32, 4
    ang = eva.rope_2d_angles(g, g, dh)
    x = jnp.asarray(rng.standard_normal((g * g, dh)).astype(np.float32))
    out = eva.apply_rope(x, ang)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)
    # grid position (0, 0) has zero angles → identity
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0]), atol=1e-6)


TINY_TRV = eva.EvaConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                         num_heads=4, mlp_hidden=80, out_dim=48)
TINY_E = eva.EvaConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                       num_heads=4, mlp_hidden=128, swiglu=False,
                       scale_mlp=False, scale_attn_inner=False,
                       qkv_fused=True, rope=False, post_norm=True, out_dim=48)


def test_eva_forward_trv(rng):
    params = eva.init(jax.random.PRNGKey(0), TINY_TRV)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    out = eva.forward(params, x, TINY_TRV)
    assert out.shape == (2, 48)
    assert np.isfinite(np.asarray(out)).all()
    # k projection really has no bias
    assert "bias" not in params["blocks"]["attn"]["k"]


def test_eva_forward_e_variant(rng):
    params = eva.init(jax.random.PRNGKey(1), TINY_E)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    out = eva.forward(params, x, TINY_E)
    assert out.shape == (2, 48)
    assert np.isfinite(np.asarray(out)).all()


def test_eva_named_configs_shapes():
    cfg = eva.EVA02_CONFIGS["EVA02-B-16"]
    assert (cfg.embed_dim, cfg.depth, cfg.num_heads) == (768, 12, 12)
    assert cfg.mlp_hidden == 2048 and cfg.swiglu and cfg.rope
    cfg = eva.EVA02_CONFIGS["EVA02-L-14"]
    assert cfg.mlp_hidden == 2730  # int(1024 * 8/3)
    cfg = eva.EVA02_CONFIGS["EVA02-E-14"]
    assert (cfg.embed_dim, cfg.depth) == (1792, 64)
    assert cfg.qkv_fused and not cfg.swiglu and cfg.post_norm and not cfg.rope


# ---------------------------------------------------------------------------
# converters: synthetic timm-layout state dicts
# ---------------------------------------------------------------------------


def _timm_eva_sd(cfg: eva.EvaConfig, rng) -> dict:
    """Synthetic timm Eva state dict with every layout quirk (split q/k/v,
    zero k_bias buffer or fused q_bias/v_bias params, SwiGLU naming)."""
    d, f, hd = cfg.embed_dim, cfg.mlp_hidden, cfg.out_dim
    n = cfg.grid * cfg.grid
    r = lambda *s: rng.standard_normal(s).astype(np.float32)
    sd = {
        "patch_embed.proj.weight": r(d, 3, cfg.patch_size, cfg.patch_size),
        "patch_embed.proj.bias": r(d),
        "cls_token": r(1, 1, d),
        "pos_embed": r(1, 1 + n, d),
        "norm.weight": r(d), "norm.bias": r(d),
        "head.weight": r(hd, d), "head.bias": r(hd),
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"], sd[p + "norm1.bias"] = r(d), r(d)
        sd[p + "norm2.weight"], sd[p + "norm2.bias"] = r(d), r(d)
        if cfg.qkv_fused:
            sd[p + "attn.qkv.weight"] = r(3 * d, d)
            sd[p + "attn.q_bias"] = r(d)
            sd[p + "attn.v_bias"] = r(d)
        else:
            sd[p + "attn.q_proj.weight"], sd[p + "attn.q_proj.bias"] = r(d, d), r(d)
            sd[p + "attn.k_proj.weight"] = r(d, d)  # no bias
            sd[p + "attn.v_proj.weight"], sd[p + "attn.v_proj.bias"] = r(d, d), r(d)
        if cfg.scale_attn_inner:
            sd[p + "attn.norm.weight"], sd[p + "attn.norm.bias"] = r(d), r(d)
        sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"] = r(d, d), r(d)
        if cfg.swiglu:
            sd[p + "mlp.fc1_g.weight"], sd[p + "mlp.fc1_g.bias"] = r(f, d), r(f)
            sd[p + "mlp.fc1_x.weight"], sd[p + "mlp.fc1_x.bias"] = r(f, d), r(f)
            if cfg.scale_mlp:
                sd[p + "mlp.norm.weight"], sd[p + "mlp.norm.bias"] = r(f), r(f)
        else:
            sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"] = r(f, d), r(f)
        sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"] = r(d, f), r(d)
    return sd


@pytest.mark.parametrize("cfg", [TINY_TRV, TINY_E], ids=["trv", "e"])
def test_eva_converter_roundtrip(cfg, rng):
    from keep_tpu.compat.torch_loader import convert_timm_eva

    sd = _timm_eva_sd(cfg, rng)
    params = jax.tree.map(jnp.asarray, convert_timm_eva(sd, cfg))
    # structure matches init exactly
    ref = eva.init(jax.random.PRNGKey(0), cfg)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(ref))
    # spot-check weight mapping (transpose + stacking)
    if cfg.qkv_fused:
        np.testing.assert_array_equal(
            np.asarray(params["blocks"]["attn"]["qkv"]["kernel"][1]),
            sd["blocks.1.attn.qkv.weight"].T)
        # fused bias = [q_bias, zeros, v_bias]
        b = np.asarray(params["blocks"]["attn"]["qkv"]["bias"][0])
        np.testing.assert_array_equal(b[: cfg.embed_dim],
                                      sd["blocks.0.attn.q_bias"])
        assert (b[cfg.embed_dim : 2 * cfg.embed_dim] == 0).all()
    else:
        np.testing.assert_array_equal(
            np.asarray(params["blocks"]["attn"]["q"]["kernel"][0]),
            sd["blocks.0.attn.q_proj.weight"].T)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    out = eva.forward(params, x, cfg)
    assert out.shape == (1, cfg.out_dim) and np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# relpos ViT
# ---------------------------------------------------------------------------

TINY_RP = vrp.ViTRelPosConfig(img_size=32, patch_size=8, embed_dim=64,
                              depth=2, num_heads=4, rel_pos_hidden=32)


def test_relpos_bias_translation_invariance(rng):
    """bias[h, i, j] depends only on the grid offset between patches i and j;
    the CLS row/column carries zero bias (timm prefix-token padding)."""
    g = 4
    p = {
        "fc1": {"kernel": jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32)),
                "bias": jnp.zeros(16)},
        "fc2": {"kernel": jnp.asarray(rng.standard_normal((16, 3)).astype(np.float32)),
                "bias": jnp.zeros(3)},
    }
    bias = np.asarray(vrp.rel_pos_bias(p, g, g, 3))
    assert bias.shape == (3, 1 + g * g, 1 + g * g)
    assert (bias[:, 0, :] == 0).all() and (bias[:, :, 0] == 0).all()
    # pairs with equal (Δrow, Δcol) share the bias: (r, c) flat = r*g + c
    pairs_same_offset = [((0, 0), (1, 2)), ((1, 1), (2, 3)), ((2, 0), (3, 2))]
    vals = [
        bias[:, 1 + a[0] * g + a[1], 1 + b[0] * g + b[1]]
        for a, b in pairs_same_offset
    ]
    np.testing.assert_allclose(vals[0], vals[1], atol=1e-6)
    np.testing.assert_allclose(vals[0], vals[2], atol=1e-6)
    # a different offset gives a different bias (non-degenerate MLP)
    other = bias[:, 1 + 0 * g + 0, 1 + 2 * g + 1]
    assert not np.allclose(vals[0], other, atol=1e-5)


def test_relpos_forward_and_converter(rng):
    params = vrp.init(jax.random.PRNGKey(0), TINY_RP)
    assert "pos_embed" not in params  # relpos ViTs have no abs pos embed
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    out = vrp.forward(params, x, TINY_RP)
    assert out.shape == (2, 64) and np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError, match="fixed"):
        vrp.forward(params, jnp.zeros((1, 40, 40, 3)), TINY_RP)

    # converter round-trip over a synthetic timm layout
    from keep_tpu.compat.torch_loader import convert_timm_vit_relpos

    d, f, h = 64, TINY_RP.mlp_hidden, TINY_RP.rel_pos_hidden
    r = lambda *s: rng.standard_normal(s).astype(np.float32)
    sd = {
        "patch_embed.proj.weight": r(d, 3, 8, 8),
        "patch_embed.proj.bias": r(d),
        "cls_token": r(1, 1, d),
        "norm.weight": r(d), "norm.bias": r(d),
    }
    for i in range(2):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"], sd[p + "norm1.bias"] = r(d), r(d)
        sd[p + "norm2.weight"], sd[p + "norm2.bias"] = r(d), r(d)
        sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"] = r(3 * d, d), r(3 * d)
        sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"] = r(d, d), r(d)
        sd[p + "attn.rel_pos.mlp.fc1.weight"] = r(h, 2)
        sd[p + "attn.rel_pos.mlp.fc1.bias"] = r(h)
        sd[p + "attn.rel_pos.mlp.fc2.weight"] = r(4, h)
        sd[p + "attn.rel_pos.mlp.fc2.bias"] = r(4)
        sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"] = r(f, d), r(f)
        sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"] = r(d, f), r(d)
    conv = jax.tree.map(jnp.asarray, convert_timm_vit_relpos(sd, TINY_RP))
    assert (jax.tree_util.tree_structure(conv)
            == jax.tree_util.tree_structure(params))
    out = vrp.forward(conv, x, TINY_RP)
    assert np.isfinite(np.asarray(out)).all()

    # remat/gelu_approx are honored (remat: same numbers, recompute only)
    out_r = vrp.forward(conv, x, TINY_RP, remat=True)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out), atol=1e-6)

    # timm registers vit_relpos presets with qkv_bias=False — released
    # checkpoints carry no qkv bias; the converter synthesizes zeros
    sd_nobias = {k: v for k, v in sd.items()
                 if not k.endswith("attn.qkv.bias")}
    conv_nb = convert_timm_vit_relpos(sd_nobias, TINY_RP)
    assert (conv_nb["blocks"]["attn"]["qkv"]["bias"] == 0).all()
    assert conv_nb["blocks"]["attn"]["qkv"]["bias"].shape == (2, 3 * d)


def test_relpos_mlp_is_relu():
    """timm RelPosMlp uses act_layer=nn.ReLU — a constant −0.5 fc1
    pre-activation must die to exactly zero (GELU would leak −0.154)."""
    h = 8
    p = {
        "fc1": {"kernel": jnp.zeros((2, h)), "bias": jnp.full((h,), -0.5)},
        "fc2": {"kernel": jnp.ones((h, 3)), "bias": jnp.zeros(3)},
    }
    bias = np.asarray(vrp.rel_pos_bias(p, 4, 4, 3))
    assert (bias == 0).all()


# ---------------------------------------------------------------------------
# presets wiring
# ---------------------------------------------------------------------------


def test_eva02_presets_resolve():
    from keep_tpu import presets

    assert not presets.UNSUPPORTED  # round-2 review #4: inventory complete
    r = presets.resolve("EVA02-L-14")
    assert r.vision_kind == "eva02" and r.vision_cfg.embed_dim == 1024
    assert r.vision_cfg.out_dim == r.embed_dim == 768
    r = presets.resolve("EVA02-E-14-plus")
    assert r.text_cfg.width == 1280 and r.text_cfg.layers == 32
    r = presets.resolve("vit_relpos_medium_patch16_cls_224")
    assert r.vision_kind == "vit_relpos" and r.vision_cfg.embed_dim == 512
    assert r.vision_cfg.rel_pos_hidden == 256  # timm rel_pos_dim=256
    r = presets.resolve("coca_roberta-ViT-B-32")
    assert r.family == "coca"
    assert r.text_cfg.hf_text is not None and not r.text_cfg.use_attn_pool
    assert (r.text_cfg.pad_id, r.text_cfg.sot_id, r.text_cfg.eos_id) == (1, 0, 2)
    with pytest.raises(presets.UnsupportedPresetError, match="roberta"):
        presets.tokenizer_kind("coca_roberta-ViT-B-32")


@pytest.mark.slow
def test_eva02_preset_shrunken_forward(rng):
    """A shrunken clone of the resolved EVA02-B-16 config proves the preset
    dispatch end-to-end (the full tower is too heavy for unit tests)."""
    from keep_tpu import presets

    r = presets.resolve("EVA02-B-16")
    small = dataclasses.replace(r.vision_cfg, img_size=32, patch_size=8,
                                embed_dim=64, depth=2, num_heads=4,
                                mlp_hidden=80)
    r2 = dataclasses.replace(r, vision_cfg=small)
    import keep_tpu.presets as P

    orig = P.resolve
    try:
        P.resolve = lambda name: r2 if name == "EVA02-B-16" else orig(name)
        params, model = presets.create_preset("EVA02-B-16")
    finally:
        P.resolve = orig
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    feats = model.encode_image(params, x, normalize=True)
    assert feats.shape == (1, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1),
                               1.0, atol=1e-5)


@pytest.mark.slow
def test_coca_roberta_shrunken_forward(rng):
    """Shrunken coca_roberta: roberta hidden states feed the decoder, no
    attentional pooler, contrastive latents + captioning logits come out."""
    from keep_tpu.configs import BertConfig, ViTConfig
    from keep_tpu.models import coca
    from keep_tpu.models.hf_text import HFTextConfig

    hf = HFTextConfig(
        arch="roberta",
        trunk=BertConfig(vocab_size=96, hidden_size=48, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=96,
                         max_position_embeddings=64, type_vocab_size=1,
                         ln_eps=1e-5, pad_token_id=1),
        output_dim=32, pooler="mean", proj="linear",
    )
    cfg = coca.CoCaConfig(
        embed_dim=32, vocab_size=96, context_length=15,
        text_width=48, text_heads=4, text_layers=2,
        decoder_layers=2, decoder_heads=4,
        vision=ViTConfig(img_size=32, patch_size=8, embed_dim=48, depth=2,
                         num_heads=4, layerscale_init=None, ln_eps=1e-5,
                         pool="none"),
        hf_text=hf, use_attn_pool=False, pad_id=1, sot_id=0, eos_id=2,
    )
    params = coca.init(jax.random.PRNGKey(0), cfg)
    assert "attn_pool" not in params
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ids = np.full((2, 16), 7, np.int64)
    ids[:, 0], ids[:, -1] = 0, 2
    ids[1, 10:] = 1  # roberta pads
    out = coca.forward(params, x, jnp.asarray(ids), cfg)
    assert out["image_features"].shape == (2, 32)
    assert out["text_features"].shape == (2, 32)
    # decoder sees the trimmed token stream (S-1), labels align
    assert out["logits"].shape == (2, 15, 96)
    assert out["labels"].shape == (2, 15)
    np.testing.assert_array_equal(np.asarray(out["labels"]), ids[:, 1:])
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0,
        atol=1e-5)
