"""factory.py branch coverage (VERDICT r05 #9): every registered builder at
tiny override shapes, the error legs, the preset pass-through, and the
tokenizer-kind dispatch."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from keep_tpu import factory
from keep_tpu.configs import BertConfig, ViTConfig

TINY_VIT = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                     num_heads=2)
TINY_BERT = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=32)


def test_list_models_merges_registry_and_presets():
    names = factory.list_models()
    assert "keep" in names and "kep" in names
    assert "ViT-B-32" in names  # preset inventory folded in
    assert names == sorted(names)


def test_keep_builder_with_overrides():
    params, spec = factory.create_model(
        "keep", vision=TINY_VIT, text=TINY_BERT, projection_dim=16)
    assert spec.family == "keep"
    assert spec.config.vision.depth == 1
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    feats = spec.encode_image(params, x, spec.config)
    assert feats.shape == (1, 16)


def test_kep_builder_with_overrides():
    params, spec = factory.create_model(
        "kep", vision=TINY_VIT, text=TINY_BERT, embed_dim=32,
        with_knowledge=False)
    assert spec.family == "kep"
    assert "visual" in params


def test_clip_builders_with_overrides():
    from keep_tpu.models.text_transformer import TextTransformerConfig

    tiny_tt = TextTransformerConfig(vocab_size=64, context_length=8,
                                    width=32, heads=2, layers=1,
                                    output_dim=32)
    for name in ("clip-vit-b-16", "clip-vit-l-14"):
        params, spec = factory.create_model(
            name, vision=TINY_VIT, text=tiny_tt, embed_dim=32)
        assert spec.family == "clip"
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        assert spec.encode_image(params, x, spec.config).shape == (1, 32)


def test_rn50_builder_with_overrides():
    params, spec = factory.create_model(
        "rn50-clip", layers=(1, 1, 1, 1), width=8, heads=2, output_dim=16,
        image_size=32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    assert spec.encode_image(params, x, spec.config).shape == (1, 16)


def test_coca_builder_with_overrides():
    params, spec = factory.create_model(
        "coca", embed_dim=16, vocab_size=64, context_length=10,
        text_width=16, text_heads=2, text_layers=1, decoder_layers=1,
        decoder_heads=2, n_queries=4, attn_pooler_heads=2, vision=ViTConfig(
            img_size=32, patch_size=16, embed_dim=32, depth=1, num_heads=2,
            layerscale_init=None, pool="none"))
    assert spec.family == "coca"


def test_pmc_builder_with_overrides():
    from keep_tpu.models.resnet import ModifiedResNetConfig

    params, spec = factory.create_model(
        "pmc-clip", embed_dim=32, fusion_layers=1, fusion_heads=2,
        context_length=12, text=TINY_BERT,  # embed_dim == text.hidden_size
        vision=ModifiedResNetConfig(layers=(1, 1, 1, 1), width=8, heads=2,
                                    output_dim=32, image_size=32))
    assert spec.family == "pmc_clip"


def test_preset_passthrough_spec():
    # the smallest real preset: ViT-B-32 (the ModelSpec wrapper leg)
    params, spec = factory.create_model("ViT-B-32")
    assert spec.family in ("clip", "vit")
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    assert np.asarray(spec.encode_image(params, x)).shape[0] == 1


def test_error_legs(tmp_path):
    with pytest.raises(KeyError, match="unknown model"):
        factory.create_model("not-a-model")
    with pytest.raises(NotImplementedError, match="pretrained"):
        factory.create_model("coca", pretrained="x")
    with pytest.raises(ValueError, match="overrides"):
        factory.create_model("ViT-B-32", embed_dim=99)
    with pytest.raises(FileNotFoundError, match="no weights file"):
        factory.create_model("keep", pretrained=str(tmp_path))  # empty dir


VOCAB = "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                   "an", "image", "of", "tumor", "##s", "a"])


def test_get_tokenizer_bert_file_and_dir(tmp_path):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text(VOCAB)
    for path in (str(vocab), str(tmp_path)):
        tok = factory.get_tokenizer("bert", path)
        enc = tok(["an image of tumors"], max_length=8)
        ids = np.asarray(enc["input_ids"])
        assert ids.shape == (1, 8)
        assert ids[0, 0] == 2  # [CLS]


def test_get_tokenizer_unknown_kind():
    with pytest.raises(ValueError, match="unknown tokenizer kind"):
        factory.get_tokenizer("sentencepiece", "x")


def test_pretrained_dir_with_config_and_weights(tmp_path):
    """The pretrained-dir happy path: config.json read (user overrides on
    top), pytorch_model.bin found, checkpoint loaded (factory.py:95-113)."""
    import jax

    from keep_tpu.compat.export import save_pretrained
    from keep_tpu.configs import KEEPConfig
    from keep_tpu.models import keep

    cfg = KEEPConfig(vision=TINY_VIT, text=TINY_BERT, projection_dim=16)
    params = keep.init(jax.random.PRNGKey(0), cfg)
    d = tmp_path / "release"
    save_pretrained(str(d), params, cfg)

    got_params, spec = factory.create_model("keep", pretrained=str(d))
    assert spec.config.projection_dim == 16
    assert spec.config.vision.depth == TINY_VIT.depth
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(spec.encode_image(got_params, x, spec.config)),
        np.asarray(keep.encode_image(params, x, cfg)), atol=1e-5)

    # overrides layer ON TOP of the checkpoint config
    _, spec2 = factory.create_model("keep", pretrained=str(d),
                                    max_text_length=17)
    assert spec2.config.max_text_length == 17
    assert spec2.config.projection_dim == 16


MERGES = ["t u", "tu m", "tum or</w>", "o f</w>", "a n</w>"]


def test_get_tokenizer_clip_fast_and_fallback(tmp_path, monkeypatch):
    merges = tmp_path / "merges.txt"
    merges.write_text("#version: 0.2\n" + "\n".join(MERGES) + "\n")
    tok = factory.get_tokenizer("clip", str(merges), context_length=16)
    ids = np.asarray(tok(["tumor of an"]))
    assert ids.shape == (1, 16)

    # force the native import to fail -> the pure-python BPE fallback leg
    import sys

    monkeypatch.setitem(sys.modules, "keep_tpu.text.fast_tokenizer", None)
    tok2 = factory.get_tokenizer("clip", str(merges), context_length=16)
    np.testing.assert_array_equal(np.asarray(tok2(["tumor of an"])), ids)
