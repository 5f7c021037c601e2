"""KEP training model, OpenCLIP-style CLIP/TextTransformer (+ torch parity),
and the BPE tokenizer vs transformers.CLIPTokenizer."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from keep_tpu.configs import BertConfig, ViTConfig

pytestmark = pytest.mark.slow
from keep_tpu.models import clip as clip_model
from keep_tpu.models import kep, text_transformer
from keep_tpu.models.text_transformer import (
    TextTransformerConfig,
    convert_openclip_text,
)

TT_CFG = TextTransformerConfig(
    vocab_size=100, context_length=24, width=32, heads=4, layers=2, output_dim=16
)


class TorchOpenAIText(nn.Module):
    """OpenAI CLIP text tower semantics with torch MHA (state-dict keys match
    the open_clip layout consumed by convert_openclip_text)."""

    def __init__(self, cfg):
        super().__init__()
        torch.manual_seed(0)
        self.cfg = cfg
        self.token_embedding = nn.Embedding(cfg.vocab_size, cfg.width)
        self.positional_embedding = nn.Parameter(torch.randn(cfg.context_length, cfg.width) * 0.01)

        class Block(nn.Module):
            def __init__(self):
                super().__init__()
                self.ln_1 = nn.LayerNorm(cfg.width, eps=cfg.ln_eps)
                self.attn = nn.MultiheadAttention(cfg.width, cfg.heads, batch_first=False)
                self.ln_2 = nn.LayerNorm(cfg.width, eps=cfg.ln_eps)
                self.mlp = nn.Sequential()
                self.mlp.add_module("c_fc", nn.Linear(cfg.width, cfg.width * 4))
                self.mlp.add_module("gelu", nn.GELU())
                self.mlp.add_module("c_proj", nn.Linear(cfg.width * 4, cfg.width))

            def forward(self, x, mask):
                y = self.ln_1(x)
                y = self.attn(y, y, y, need_weights=False, attn_mask=mask)[0]
                x = x + y
                return x + self.mlp(self.ln_2(x))

        class Transformer(nn.Module):
            def __init__(self):
                super().__init__()
                self.resblocks = nn.ModuleList([Block() for _ in range(cfg.layers)])

        self.transformer = Transformer()
        self.ln_final = nn.LayerNorm(cfg.width, eps=cfg.ln_eps)
        self.text_projection = nn.Parameter(torch.randn(cfg.width, cfg.output_dim) * 0.05)

    def forward(self, ids):
        x = self.token_embedding(ids) + self.positional_embedding[: ids.shape[1]]
        x = x.permute(1, 0, 2)  # LND
        s = ids.shape[1]
        mask = torch.triu(torch.full((s, s), float("-inf")), diagonal=1)
        for blk in self.transformer.resblocks:
            x = blk(x, mask)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), ids.argmax(dim=-1)]
        return pooled @ self.text_projection


def test_text_transformer_matches_torch(rng):
    tmodel = TorchOpenAIText(TT_CFG).eval()
    params = convert_openclip_text(tmodel.state_dict(), TT_CFG)
    ids = rng.integers(1, 80, size=(3, 24))
    ids[:, -1] = 99  # EOT = highest id
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(ids)).numpy()
    got = np.asarray(
        text_transformer.forward(params, jnp.asarray(ids), TT_CFG)
    )
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)


def test_eot_pooling_position(rng):
    """Pooling follows argmax(ids): EOT mid-sequence must change the output."""
    params = text_transformer.init(jax.random.PRNGKey(0), TT_CFG)
    ids = np.full((1, 24), 5, np.int64)
    ids[0, 10] = 99
    a = text_transformer.forward(params, jnp.asarray(ids), TT_CFG)
    ids2 = ids.copy()
    ids2[0, 10] = 5
    ids2[0, 20] = 99
    b = text_transformer.forward(params, jnp.asarray(ids2), TT_CFG)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


def test_clip_model_api(rng):
    cfg = clip_model.CLIPConfig(
        embed_dim=16,
        vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                         num_heads=2, layerscale_init=None, ln_eps=1e-5),
        text=TT_CFG,
    )
    params = clip_model.init(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(1, 99, size=(2, 24)))
    out = clip_model.forward(params, pixels, ids, cfg)
    assert out["image_features"].shape == (2, 16)
    assert out["text_features"].shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=1), 1.0, atol=1e-5
    )
    assert float(out["logit_scale"]) == pytest.approx(1 / 0.07, rel=1e-4)


def test_kep_model(rng):
    cfg = kep.KEPConfig(
        vision=ViTConfig(img_size=16, patch_size=8, embed_dim=24, depth=2, num_heads=2),
        text=BertConfig(vocab_size=50, hidden_size=24, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=48,
                        max_position_embeddings=32),
        embed_dim=20,
    )
    params = kep.init(jax.random.PRNGKey(0), cfg)
    assert "knowledge" in params and "visual_head" in params
    pixels = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(1, 50, size=(2, 16)))
    out = kep.forward(params, pixels, ids, cfg=cfg)
    assert out["image_features"].shape == (2, 20)
    assert out["text_features"].shape == (2, 20)
    assert out["knowledge_features"].shape == (2, 20)
    # knowledge tower differs from text tower (separate params)
    assert np.abs(
        np.asarray(out["text_features"]) - np.asarray(out["knowledge_features"])
    ).max() > 1e-3
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["knowledge_features"]), axis=1), 1.0, atol=1e-5
    )


# ---------------------------------------------------------------------------


def make_clip_bpe_fixture(tmp_path):
    """Tiny vocab/merges consumable by both our BPE and transformers'
    CLIPTokenizer."""
    import json

    from keep_tpu.text.bpe import bytes_to_unicode

    merges = ["l o", "lo w", "e r</w>", "h e", "he l", "hel lo</w>", "w o",
              "wo r", "wor ld</w>", "l d</w>"]
    base = list(bytes_to_unicode().values())
    vocab = base + [v + "</w>" for v in base] + ["".join(m.split()) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    (tmp_path / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    (tmp_path / "vocab.json").write_text(
        json.dumps({v: i for i, v in enumerate(vocab)})
    )
    return str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")


def test_bpe_matches_transformers(tmp_path, rng):
    from transformers import CLIPTokenizer

    from keep_tpu.text.bpe import BPETokenizer

    vocab_path, merges_path = make_clip_bpe_fixture(tmp_path)
    ours = BPETokenizer(merges_path, context_length=16)
    hf = CLIPTokenizer(vocab_path, merges_path)

    for text in ["hello world", "lower", "Hello, WORLD!", "held low", ""]:
        got = ours.encode(text)
        ref = hf(text, add_special_tokens=False)["input_ids"]
        assert got == ref, text

    batch = ours(["hello world", "lower"], context_length=16)
    assert batch.shape == (2, 16)
    assert batch[0, 0] == ours.sot
    assert ours.eot in batch[0]


def test_bpe_truncation_keeps_eot(tmp_path):
    from keep_tpu.text.bpe import BPETokenizer

    vocab_path, merges_path = make_clip_bpe_fixture(tmp_path)
    tok = BPETokenizer(merges_path, context_length=6)
    out = tok("hello world hello world hello world")
    assert out.shape == (1, 6)
    assert out[0, -1] == tok.eot


def test_bpe_decode_roundtrip(tmp_path):
    from keep_tpu.text.bpe import BPETokenizer

    vocab_path, merges_path = make_clip_bpe_fixture(tmp_path)
    tok = BPETokenizer(merges_path)
    ids = tok.encode("hello world")
    assert tok.decode(ids).strip() == "hello world"


def test_poolers(rng):
    from keep_tpu.models.poolers import get_pooler

    hidden = jnp.asarray(rng.standard_normal((2, 5, 4), dtype=np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]]))
    mean = np.asarray(get_pooler("mean_pooler")(hidden, mask))
    np.testing.assert_allclose(mean[0], np.asarray(hidden[0, :3]).mean(0), atol=1e-6)
    mx = np.asarray(get_pooler("max_pooler")(hidden, mask))
    np.testing.assert_allclose(mx[0], np.asarray(hidden[0, :3]).max(0), atol=1e-6)
    po = jnp.asarray(rng.standard_normal((2, 4), dtype=np.float32))
    np.testing.assert_allclose(
        np.asarray(get_pooler("cls_pooler")(hidden, mask, po)), np.asarray(po)
    )
    np.testing.assert_allclose(
        np.asarray(get_pooler("cls_last_hidden_state_pooler")(hidden, mask, po)),
        np.asarray(hidden[:, 0]),
    )
    with pytest.raises(KeyError):
        get_pooler("nope")


def test_factory_registry(rng):
    from keep_tpu import factory

    names = factory.list_models()
    assert {"keep", "kep", "clip-vit-b-16", "coca", "pmc-clip"} <= set(names)
    params, spec = factory.create_model("keep")
    assert "visual" in params and spec.family == "keep"
    with pytest.raises(KeyError):
        factory.create_model("nope")


def test_fold_layerscale(rng):
    from keep_tpu.models import vit as vit_mod

    cfg = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2, num_heads=4)
    params = vit_mod.init(jax.random.PRNGKey(0), cfg)
    # non-trivial gammas
    params["blocks"]["ls1"] = jnp.asarray(
        rng.random((2, 32)).astype(np.float32) + 0.5)
    params["blocks"]["ls2"] = jnp.asarray(
        rng.random((2, 32)).astype(np.float32) + 0.5)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    ref = np.asarray(vit_mod.forward(params, x, cfg))
    folded = vit_mod.fold_layerscale(params)
    assert "ls1" not in folded["blocks"]
    got = np.asarray(vit_mod.forward(folded, x, cfg))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_coca_beam_search(rng):
    from keep_tpu.models import coca as coca_mod
    from tests.test_coca import CFG as COCA_CFG

    params = coca_mod.init(jax.random.PRNGKey(0), COCA_CFG)
    pixels = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    out = coca_mod.generate_beam(params, pixels, COCA_CFG, seq_len=7, num_beams=3)
    assert out.shape[0] == 2 and out.shape[1] <= 7
    assert (out[:, 0] == COCA_CFG.sot_id).all()
    # beam-1 equals greedy
    beam1 = coca_mod.generate_beam(params, pixels, COCA_CFG, seq_len=7, num_beams=1)
    greedy = coca_mod.generate(params, pixels, COCA_CFG, seq_len=7)
    np.testing.assert_array_equal(beam1, greedy[:, :beam1.shape[1]])


def test_copy_codebase(tmp_path):
    from keep_tpu.utils.logging import copy_codebase

    dst = copy_codebase(str(tmp_path))
    import os

    assert os.path.exists(os.path.join(dst, "keep_tpu", "models", "vit.py"))
    # idempotent: a resumed run reusing out_dir keeps the original snapshot
    assert copy_codebase(str(tmp_path)) == dst


def test_kep_res_ssl_tower(rng):
    """KEP with the res_ssl trunk image encoder (KEP model.py:283-285)."""
    from keep_tpu.models import kep as kep_mod
    from keep_tpu.models import resnet as rn

    tcfg = BertConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=32,
                      max_position_embeddings=16)
    cfg = kep_mod.KEPConfig(text=tcfg, embed_dim=16, image_encoder="res_ssl",
                            with_knowledge=False)
    params = kep_mod.init(jax.random.PRNGKey(0), cfg)
    # swap in a tiny RN trunk (init builds a ViT by default; the factory
    # pattern is to load/replace the tower explicitly)
    torch.manual_seed(0)
    trunk = {"conv1": {"kernel": jnp.asarray(
                 np.random.default_rng(0).standard_normal((7, 7, 3, 8)) * 0.05,
                 jnp.float32)},
             "bn1": {"scale": jnp.ones(8), "bias": jnp.zeros(8),
                     "mean": jnp.zeros(8), "var": jnp.ones(8)}}
    cin = 8
    for li in range(1, 5):
        planes = 8 * 2 ** (li - 1)
        blk = {
            "conv1": {"kernel": jnp.asarray(np.random.default_rng(li).standard_normal((1, 1, cin, planes)) * 0.05, jnp.float32)},
            "bn1": {"scale": jnp.ones(planes), "bias": jnp.zeros(planes), "mean": jnp.zeros(planes), "var": jnp.ones(planes)},
            "conv2": {"kernel": jnp.asarray(np.random.default_rng(li + 10).standard_normal((3, 3, planes, planes)) * 0.05, jnp.float32)},
            "bn2": {"scale": jnp.ones(planes), "bias": jnp.zeros(planes), "mean": jnp.zeros(planes), "var": jnp.ones(planes)},
            "conv3": {"kernel": jnp.asarray(np.random.default_rng(li + 20).standard_normal((1, 1, planes, planes * 4)) * 0.05, jnp.float32)},
            "bn3": {"scale": jnp.ones(planes * 4), "bias": jnp.zeros(planes * 4), "mean": jnp.zeros(planes * 4), "var": jnp.ones(planes * 4)},
            "downsample": {"conv": {"kernel": jnp.asarray(np.random.default_rng(li + 30).standard_normal((1, 1, cin, planes * 4)) * 0.05, jnp.float32)},
                           "bn": {"scale": jnp.ones(planes * 4), "bias": jnp.zeros(planes * 4), "mean": jnp.zeros(planes * 4), "var": jnp.ones(planes * 4)}},
        }
        trunk[f"layer{li}"] = [blk]
        cin = planes * 4
    params["visual"] = trunk
    # visual head must map 256 (=8*32) -> embed_dim
    params["visual_head"] = {
        "fc1": {"kernel": jnp.asarray(np.random.default_rng(9).standard_normal((256, 16)) * 0.05, jnp.float32),
                "bias": jnp.zeros(16)},
        "fc2": {"kernel": jnp.asarray(np.random.default_rng(8).standard_normal((16, 16)) * 0.05, jnp.float32),
                "bias": jnp.zeros(16)},
    }
    pixels = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64, 64, 3)), jnp.float32)
    feats = kep_mod.encode_image(params, pixels, cfg, normalize=True)
    assert feats.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=1), 1.0,
                               atol=1e-5)


def test_openai_clip_loader(rng):
    """Synthetic OpenAI-layout CLIP checkpoint: config inference + conversion
    + forward through models.clip."""
    import torch

    from keep_tpu.compat.openai import infer_clip_config, load_openai_clip
    from keep_tpu.models import clip as clip_model

    torch.manual_seed(0)
    D, P, L, W, TL, V, CTX, E = 64, 8, 2, 32, 2, 96, 20, 16
    grid = 4  # img 32
    sd = {}
    sd["visual.conv1.weight"] = torch.randn(D, 3, P, P) * 0.05
    sd["visual.class_embedding"] = torch.randn(D) * 0.02
    sd["visual.positional_embedding"] = torch.randn(grid * grid + 1, D) * 0.02
    sd["visual.ln_pre.weight"] = torch.rand(D) + 0.5
    sd["visual.ln_pre.bias"] = torch.randn(D) * 0.1
    for i in range(L):
        pre = f"visual.transformer.resblocks.{i}."
        sd[pre + "ln_1.weight"] = torch.rand(D) + 0.5
        sd[pre + "ln_1.bias"] = torch.randn(D) * 0.1
        sd[pre + "attn.in_proj_weight"] = torch.randn(3 * D, D) * 0.05
        sd[pre + "attn.in_proj_bias"] = torch.zeros(3 * D)
        sd[pre + "attn.out_proj.weight"] = torch.randn(D, D) * 0.05
        sd[pre + "attn.out_proj.bias"] = torch.zeros(D)
        sd[pre + "ln_2.weight"] = torch.rand(D) + 0.5
        sd[pre + "ln_2.bias"] = torch.randn(D) * 0.1
        sd[pre + "mlp.c_fc.weight"] = torch.randn(4 * D, D) * 0.05
        sd[pre + "mlp.c_fc.bias"] = torch.zeros(4 * D)
        sd[pre + "mlp.c_proj.weight"] = torch.randn(D, 4 * D) * 0.05
        sd[pre + "mlp.c_proj.bias"] = torch.zeros(D)
    sd["visual.ln_post.weight"] = torch.rand(D) + 0.5
    sd["visual.ln_post.bias"] = torch.randn(D) * 0.1
    sd["visual.proj"] = torch.randn(D, E) * 0.05
    sd["token_embedding.weight"] = torch.randn(V, W) * 0.02
    sd["positional_embedding"] = torch.randn(CTX, W) * 0.01
    for i in range(TL):
        pre = f"transformer.resblocks.{i}."
        sd[pre + "ln_1.weight"] = torch.rand(W) + 0.5
        sd[pre + "ln_1.bias"] = torch.randn(W) * 0.1
        sd[pre + "attn.in_proj_weight"] = torch.randn(3 * W, W) * 0.05
        sd[pre + "attn.in_proj_bias"] = torch.zeros(3 * W)
        sd[pre + "attn.out_proj.weight"] = torch.randn(W, W) * 0.05
        sd[pre + "attn.out_proj.bias"] = torch.zeros(W)
        sd[pre + "ln_2.weight"] = torch.rand(W) + 0.5
        sd[pre + "ln_2.bias"] = torch.randn(W) * 0.1
        sd[pre + "mlp.c_fc.weight"] = torch.randn(4 * W, W) * 0.05
        sd[pre + "mlp.c_fc.bias"] = torch.zeros(4 * W)
        sd[pre + "mlp.c_proj.weight"] = torch.randn(W, 4 * W) * 0.05
        sd[pre + "mlp.c_proj.bias"] = torch.zeros(W)
    sd["ln_final.weight"] = torch.rand(W) + 0.5
    sd["ln_final.bias"] = torch.randn(W) * 0.1
    sd["text_projection"] = torch.randn(W, E) * 0.05
    sd["logit_scale"] = torch.ones([]) * np.log(1 / 0.07)

    cfg = infer_clip_config(sd)
    assert cfg.vision.img_size == 32 and cfg.vision.depth == L
    assert cfg.text.vocab_size == V and cfg.embed_dim == E
    # head count inference uses width//64; tiny dims need an override
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        vision=dataclasses.replace(cfg.vision, num_heads=4),
        text=dataclasses.replace(cfg.text, heads=4),
    )
    params, cfg = load_openai_clip(sd, cfg)
    pixels = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(1, V - 1, size=(2, CTX)))
    out = clip_model.forward(params, pixels, ids, cfg)
    assert out["image_features"].shape == (2, E)
    assert out["text_features"].shape == (2, E)
    assert np.isfinite(np.asarray(out["image_features"])).all()


def test_get_tokenizer_factory(tmp_path):
    from keep_tpu.factory import get_tokenizer

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join("[PAD] [UNK] [CLS] [SEP] [MASK] hello world".split()))
    tok = get_tokenizer("bert", str(vocab))
    out = tok(["hello world"], max_length=8)
    assert out["input_ids"].shape == (1, 8)
    with pytest.raises(ValueError):
        get_tokenizer("nope", "x")


def test_quick_gelu_parity(rng):
    """act='quick_gelu' matches the torch x·sigmoid(1.702x) (OpenCLIP
    QuickGELU, transformer.py:31) through a full text block; the OpenAI
    loader must infer it (build_model_from_openai_state_dict hardcodes
    quick_gelu=True, model/model.py:487-544)."""
    import dataclasses

    import torch

    qcfg = dataclasses.replace(TT_CFG, act="quick_gelu")
    tmodel = TorchOpenAIText(TT_CFG).eval()
    for blk in tmodel.transformer.resblocks:

        class QuickGELU(torch.nn.Module):
            def forward(self, x):
                return x * torch.sigmoid(1.702 * x)

        blk.mlp.gelu = QuickGELU()
    params = convert_openclip_text(tmodel.state_dict(), qcfg)
    ids = rng.integers(1, 80, size=(3, 24))
    ids[:, -1] = 99
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(ids)).numpy()
    got = np.asarray(text_transformer.forward(params, jnp.asarray(ids), qcfg))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)
    # erf-GELU forward must now disagree (guards against act being ignored)
    plain = np.asarray(text_transformer.forward(params, jnp.asarray(ids), TT_CFG))
    assert np.abs(plain - ref).max() > 1e-4

    from keep_tpu.compat.openai import infer_clip_config

    sd = {
        "visual.conv1.weight": torch.randn(64, 3, 8, 8),
        "visual.positional_embedding": torch.randn(17, 64),
        "text_projection": torch.randn(32, 16),
        "ln_final.weight": torch.rand(32),
        "token_embedding.weight": torch.randn(96, 32),
        "positional_embedding": torch.randn(20, 32),
        "visual.transformer.resblocks.0.ln_1.weight": torch.rand(64),
        "transformer.resblocks.0.ln_1.weight": torch.rand(32),
    }
    inferred = infer_clip_config(sd)
    assert inferred.vision.act == "quick_gelu"
    assert inferred.text.act == "quick_gelu"


def test_openai_loader_path_legs(tmp_path):
    """File-path loading: a plain torch.save state dict goes through the
    weights_only fast path; a TorchScript archive (every ORIGINAL OpenAI
    CLIP release) falls through to torch.jit.load; an RN-tower dict
    without an explicit config is routed to the dedicated error."""
    import pytest
    import torch

    from keep_tpu.compat.openai import load_openai_clip

    plain = tmp_path / "plain.pt"
    torch.save({"token_embedding.weight": torch.zeros(4, 8)}, plain)
    with pytest.raises(ValueError, match="RN-tower"):
        load_openai_clip(str(plain))

    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer("weight", torch.zeros(2))

    scripted = tmp_path / "scripted.pt"
    torch.jit.save(torch.jit.script(M()), str(scripted))
    with pytest.raises(ValueError, match="RN-tower"):
        load_openai_clip(str(scripted))
