"""CoCa: forward shapes, decoder causality, caption loss, generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.configs import ViTConfig
from keep_tpu.models import coca
from keep_tpu.models.coca import CoCaConfig, caption_loss

pytestmark = pytest.mark.slow

# embed_dim must equal text_width: the decoder cross-attends over pooled
# image tokens at embed_dim with d_model = text width (reference constraint,
# transformer.py:658-669 / open_clip CoCa presets)
CFG = CoCaConfig(
    embed_dim=32,
    vocab_size=64,
    context_length=12,
    text_width=32,
    text_heads=4,
    text_layers=2,
    decoder_layers=2,
    decoder_heads=4,
    n_queries=6,
    attn_pooler_heads=4,
    vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                     num_heads=4, layerscale_init=None, ln_eps=1e-5, pool="none"),
    sot_id=62,
    eos_id=63,
)


@pytest.fixture(scope="module")
def params():
    return coca.init(jax.random.PRNGKey(0), CFG)


def test_forward_shapes(params, rng):
    pixels = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(1, 60, size=(2, 12)))
    out = coca.forward(params, pixels, ids, CFG)
    assert out["image_features"].shape == (2, 32)
    assert out["text_features"].shape == (2, 32)
    # decoder sees S-1 tokens (CLS takes the last slot)
    assert out["logits"].shape == (2, 11, 64)
    assert out["labels"].shape == (2, 11)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=1), 1.0, atol=1e-5
    )
    loss = caption_loss(out["logits"], out["labels"])
    assert np.isfinite(float(loss))


def test_decoder_causality(params, rng):
    """Changing a future token must not affect earlier logits."""
    pixels = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    ids = rng.integers(1, 60, size=(1, 12))
    out1 = np.asarray(coca.forward(params, pixels, jnp.asarray(ids), CFG)["logits"])
    ids2 = ids.copy()
    ids2[0, 8] = (ids2[0, 8] + 7) % 60 + 1
    out2 = np.asarray(coca.forward(params, pixels, jnp.asarray(ids2), CFG)["logits"])
    np.testing.assert_allclose(out1[0, :8], out2[0, :8], atol=1e-5)
    assert np.abs(out1[0, 8:] - out2[0, 8:]).max() > 1e-6


def test_image_conditioning(params, rng):
    """Different images must change the caption logits (cross-attn works)."""
    ids = jnp.asarray(rng.integers(1, 60, size=(1, 12)))
    p1 = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    p2 = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    l1 = np.asarray(coca.forward(params, p1, ids, CFG)["logits"])
    l2 = np.asarray(coca.forward(params, p2, ids, CFG)["logits"])
    assert np.abs(l1 - l2).max() > 1e-5


def test_generate_greedy(params, rng):
    pixels = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    ids = coca.generate(params, pixels, CFG, seq_len=8)
    assert ids.shape[0] == 2 and ids.shape[1] <= 8
    assert (ids[:, 0] == CFG.sot_id).all()
    # deterministic
    ids2 = coca.generate(params, pixels, CFG, seq_len=8)
    np.testing.assert_array_equal(ids, ids2)


def test_generate_topk_sampling(params, rng):
    pixels = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    a = coca.generate(params, pixels, CFG, seq_len=8, generation_type="top_k",
                      top_k=8, key=jax.random.PRNGKey(1))
    b = coca.generate(params, pixels, CFG, seq_len=8, generation_type="top_k",
                      top_k=8, key=jax.random.PRNGKey(2))
    assert a.shape[0] == 1
    # different keys generally sample different continuations
    assert a.shape != b.shape or not (a == b).all()


def test_caption_loss_masks_padding(rng):
    logits = jnp.asarray(rng.standard_normal((2, 5, 10), dtype=np.float32))
    labels = jnp.asarray([[1, 2, 3, 0, 0], [4, 5, 6, 7, 8]])
    full = caption_loss(logits, labels, pad_id=0)
    # recompute manually over non-pad slots
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    lab = np.asarray(labels)
    total, count = 0.0, 0
    for b in range(2):
        for t in range(5):
            if lab[b, t] != 0:
                total -= logp[b, t, lab[b, t]]
                count += 1
    assert float(full) == pytest.approx(total / count, rel=1e-5)


# ---------------------------------------------------------------------------
# PMC-CLIP
# ---------------------------------------------------------------------------


def test_pmc_clip_forward(rng):
    from keep_tpu.configs import BertConfig
    from keep_tpu.models import pmc_clip
    from keep_tpu.models.resnet import ModifiedResNetConfig

    cfg = pmc_clip.PMCCLIPConfig(
        embed_dim=32,
        vision=ModifiedResNetConfig(layers=(1, 1, 1, 1), width=8, image_size=64,
                                    heads=4, output_dim=32),
        text=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=80),
        fusion_layers=2, fusion_heads=4, context_length=16, cls_id=2,
    )
    params = pmc_clip.init(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    ids = rng.integers(3, 64, size=(2, 16))
    ids[:, 0] = 2  # [CLS]
    mask = np.ones((2, 16), np.int32)
    out = pmc_clip.forward(params, pixels, jnp.asarray(ids), jnp.asarray(mask), cfg)
    assert out["image_features"].shape == (2, 32)
    assert out["text_features"].shape == (2, 32)
    assert out["bert_prediction"].shape == (2, 16, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["text_features"]), axis=1), 1.0, atol=1e-5
    )
    # log-softmax rows sum to 1 in prob space
    probs = np.exp(np.asarray(out["bert_prediction"]))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)

    labels = np.zeros((2, 16), np.int64)
    labels[:, 3] = 7  # one masked position
    loss = pmc_clip.mlm_loss(out["bert_prediction"], jnp.asarray(labels))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_pmc_clip_cls_position(rng):
    """Text features follow the [CLS] position, wherever it is."""
    from keep_tpu.configs import BertConfig
    from keep_tpu.models import pmc_clip
    from keep_tpu.models.resnet import ModifiedResNetConfig

    cfg = pmc_clip.PMCCLIPConfig(
        embed_dim=16,
        vision=ModifiedResNetConfig(layers=(1, 1, 1, 1), width=8, image_size=64,
                                    heads=4, output_dim=16),
        text=BertConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=32,
                        max_position_embeddings=32),
        fusion_layers=1, fusion_heads=2, cls_id=2, mlm=False,
    )
    params = pmc_clip.init(jax.random.PRNGKey(1), cfg)
    img_feat = jnp.asarray(rng.standard_normal((1, 16), dtype=np.float32))
    ids = rng.integers(3, 32, size=(1, 8))
    ids[0, 5] = 2
    mask = jnp.ones((1, 8), jnp.int32)
    out = pmc_clip.encode_text(params, jnp.asarray(ids), mask, img_feat, cfg)
    # manual: bert hidden at position 5 @ projection
    from keep_tpu.models import bert as bert_mod

    hid = bert_mod.forward(params["text"], jnp.asarray(ids), mask, cfg=cfg.text)
    ref = np.asarray(hid["last_hidden_state"])[0, 5] @ np.asarray(
        params["text_projection"]
    )
    np.testing.assert_allclose(np.asarray(out["text_features"])[0], ref, atol=1e-5)


def test_generate_knobs(params, rng):
    pixels = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    # min_seq_len suppresses EOS early
    ids = coca.generate(params, pixels, CFG, seq_len=6, min_seq_len=6)
    assert not (ids[:, 1:5] == CFG.eos_id).any()
    # top_p sampling runs and starts at SOT
    ids_p = coca.generate(params, pixels, CFG, seq_len=6,
                          generation_type="top_p", top_p=0.5,
                          key=jax.random.PRNGKey(3))
    assert ids_p[0, 0] == CFG.sot_id
    # repetition penalty changes the continuation vs greedy on a repetitive model
    a = coca.generate(params, pixels, CFG, seq_len=8)
    b = coca.generate(params, pixels, CFG, seq_len=8, repetition_penalty=10.0)
    assert a.shape[0] == b.shape[0]


def test_coca_loss_composite(params, rng):
    from keep_tpu.models.coca import coca_loss

    pixels = jnp.asarray(rng.standard_normal((4, 16, 16, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(1, 60, size=(4, 12)))
    out = coca.forward(params, pixels, ids, CFG)
    loss = coca_loss(out, pad_id=CFG.pad_id)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # caption_weight scales the caption term
    l0 = coca_loss(out, caption_weight=0.0)
    l2 = coca_loss(out, caption_weight=2.0)
    cap = caption_loss(out["logits"], out["labels"], pad_id=CFG.pad_id)
    assert float(l2) == pytest.approx(float(l0) + 2.0 * float(cap), rel=1e-5)


def test_top_p_is_hf_nucleus_semantics(params, rng):
    """top_p keeps the smallest prefix whose mass reaches top_p — what the
    reference RUNS (HF TopPLogitsWarper; its '1 - top_p quantile' comment
    contradicts its own warper). Regression: the old code kept the
    complement nucleus."""
    probs = np.array([0.5, 0.3, 0.15, 0.05])
    logits = np.log(probs)[None]
    order = np.argsort(-logits, axis=-1)
    sorted_p = np.take_along_axis(
        np.exp(logits - logits.max(-1, keepdims=True))
        / np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True),
        order, axis=-1)
    cum = np.cumsum(sorted_p, axis=-1)
    keep_09 = ~((cum - sorted_p) > 0.9)
    keep_01 = ~((cum - sorted_p) > 0.1)
    np.testing.assert_array_equal(keep_09[0], [True, True, True, False])
    np.testing.assert_array_equal(keep_01[0], [True, False, False, False])


def test_no_pool_decoder_context_is_raw_tokens(rng):
    """coca_base/no-pool path: the decoder context must be the RAW trunk
    patch tokens (reference ln_posts only the pooled CLS,
    transformer.py:494-495)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, use_attn_pool=False)
    p = coca.init(jax.random.PRNGKey(3), cfg)
    # make ln_post non-trivial so a normalized context would differ
    p["ln_post"]["scale"] = p["ln_post"]["scale"] * 3.0 + 1.0
    px = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    latent, context = coca.encode_image(p, px, cfg)
    from keep_tpu.models import vit as _vit

    raw = _vit.forward(p["visual"], px, cfg.vision)
    np.testing.assert_allclose(np.asarray(context), np.asarray(raw[:, 1:]),
                               atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(latent), axis=1),
                               1.0, atol=1e-5)


def test_coca_base_preset_builds_and_forwards():
    """coca_base has NO attentional pooler in the reference config —
    regression: resolve() used to give it one and forward crashed."""
    from keep_tpu import presets

    r = presets.resolve("coca_base")
    assert r.text_cfg.use_attn_pool is False
    r32 = presets.resolve("coca_ViT-B-32")
    assert r32.text_cfg.use_attn_pool is True
    assert r32.text_cfg.attn_pooler_heads == 8
    rl14 = presets.resolve("coca_ViT-L-14")
    # vision cfg's 8 pooler heads, NOT the dead multimodal 12
    assert rl14.text_cfg.attn_pooler_heads == 8
    assert rl14.text_cfg.decoder_heads == 12


def test_preset_coca_encode_returns_latent_array():
    """The PresetModel surface is uniform: encode_* return [B, E] arrays
    (normalize kwarg accepted), not (latent, tokens) tuples. Checked via
    eval_shape (no compute)."""
    from keep_tpu import presets

    params, model = presets.create_preset("coca_ViT-B-32")
    out = jax.eval_shape(
        lambda p, x: model.encode_image(p, x, normalize=True),
        params, jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32))
    assert isinstance(out, jax.ShapeDtypeStruct), type(out)
    assert out.shape == (1, 512)
    tout = jax.eval_shape(
        lambda p, i: model.encode_text(p, i, normalize=True),
        params, jax.ShapeDtypeStruct((2, 77), jnp.int32))
    assert isinstance(tout, jax.ShapeDtypeStruct) and tout.shape == (2, 512)
