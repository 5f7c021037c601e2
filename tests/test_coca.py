"""CoCa: forward shapes, decoder causality, caption loss, generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.configs import ViTConfig
from keep_tpu.models import coca
from keep_tpu.models.coca import CoCaConfig, caption_loss

CFG = CoCaConfig(
    embed_dim=16,
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
    assert out["image_features"].shape == (2, 16)
    assert out["text_features"].shape == (2, 16)
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
