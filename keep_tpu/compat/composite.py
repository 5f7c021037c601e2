"""Composite full-model checkpoint converters: CoCa and PMC-CLIP.

The reference ships these families as single torch state dicts
(coca_model.py:79-457, model/pmc_clip.py:81-269). These loaders take the
FULL state dict — vision tower + text tower + pooler/fusion/decoder heads +
scalar params — and emit our model pytrees, reusing the per-tower converters
(openai.convert_openclip_vit_trunk, models.resnet.convert_openai_resnet,
torch_loader.convert_hf_bert).

Handles the released-layout quirks via torch_loader.normalize_state_dict:
DDP ``module.`` prefixes, ``{'state_dict': ...}`` training-checkpoint
wrappers, ``position_ids`` buffers.

Parity: tests/test_composite_converters.py instantiates the reference's own
torch CoCa (coca_model.CoCa) at a tiny config and checks our forward against
it end-to-end; the PMC-CLIP path is checked against the reference's blocks
(blocks.ModifiedResNet / blocks.Transformer) plus a transcription of
pmc_clip.py:209-243's glue.
"""

from __future__ import annotations

import re

import numpy as np

from keep_tpu.configs import BertConfig, ViTConfig
from keep_tpu.models.coca import CoCaConfig
from keep_tpu.models.pmc_clip import PMCCLIPConfig
from keep_tpu.models.resnet import ModifiedResNetConfig, convert_openai_resnet


def _g(sd, k):
    v = sd[k]
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _count_layers(sd, pattern: str) -> int:
    rx = re.compile(pattern)
    return len({m.group(1) for m in (rx.match(k) for k in sd) if m})


def _sub(sd, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _ln(sd, k):
    return {"scale": _g(sd, k + ".weight"), "bias": _g(sd, k + ".bias")}


def _stack_resblocks(sd, fmt: str, depth: int, cross: bool = False) -> dict:
    """torch ResidualAttentionBlock keys (ln_1/attn.in_proj/attn.out_proj/
    ln_2/mlp.c_fc/mlp.c_proj [+ ln_1_kv]) → our stacked-block pytree.

    Cross-attention blocks split the fused in_proj into q ([:W] rows) and
    kv ([W:] rows) to match our models.coca._attn_block cross layout."""

    def stack(suffix, transpose=False):
        mats = [_g(sd, fmt.format(i) + suffix) for i in range(depth)]
        return np.stack([m.T if transpose else m for m in mats])

    def stack_ln(name):
        return {"scale": stack(name + ".weight"), "bias": stack(name + ".bias")}

    inw = stack(".attn.in_proj_weight", transpose=True)  # [L, W, 3W]
    inb = stack(".attn.in_proj_bias")  # [L, 3W]
    w = inw.shape[1]
    if cross:
        attn = {
            "q": {"kernel": inw[:, :, :w], "bias": inb[:, :w]},
            "kv": {"kernel": inw[:, :, w:], "bias": inb[:, w:]},
        }
    else:
        attn = {"qkv": {"kernel": inw, "bias": inb}}
    attn["proj"] = {"kernel": stack(".attn.out_proj.weight", transpose=True),
                    "bias": stack(".attn.out_proj.bias")}
    out = {
        "norm1": stack_ln(".ln_1"),
        "attn": attn,
        "norm2": stack_ln(".ln_2"),
        "mlp": {
            "fc1": {"kernel": stack(".mlp.c_fc.weight", transpose=True),
                    "bias": stack(".mlp.c_fc.bias")},
            "fc2": {"kernel": stack(".mlp.c_proj.weight", transpose=True),
                    "bias": stack(".mlp.c_proj.bias")},
        },
    }
    if cross:
        out["norm1_kv"] = stack_ln(".ln_1_kv")
    return out


# --------------------------------------------------------------------------
# CoCa
# --------------------------------------------------------------------------


def infer_coca_config(sd) -> CoCaConfig:
    """Shape-sniff a CoCa state dict. Head counts are not recorded in torch
    state dicts — they default to width//64 (vision), 8 (pooler/decoder,
    the open_clip CoCa presets); pass an explicit cfg when they differ."""
    if "visual.attn_pool.query" not in sd:
        raise ValueError(
            "coca checkpoint without an attentional pooler (the coca_base/"
            "coca_roberta layout) — this converter covers the attn-pool + "
            "CLIP-text layout (coca_ViT-B-32/L-14); build the model via "
            "presets.create_preset and load the towers individually")
    vw = _g(sd, "visual.conv1.weight").shape[0]
    patch = _g(sd, "visual.conv1.weight").shape[-1]
    vlayers = _count_layers(sd, r"visual\.transformer\.resblocks\.(\d+)\.ln_1\.weight")
    grid = int(round((_g(sd, "visual.positional_embedding").shape[0] - 1) ** 0.5))
    e = _g(sd, "visual.ln_post.weight").shape[0]
    w = _g(sd, "text.ln_final.weight").shape[0]
    return CoCaConfig(
        embed_dim=e,
        vocab_size=_g(sd, "text.token_embedding.weight").shape[0],
        context_length=_g(sd, "text.positional_embedding").shape[0] - 1,
        text_width=w,
        text_heads=max(1, w // 64),
        text_layers=_count_layers(sd, r"text\.transformer\.resblocks\.(\d+)\.ln_1\.weight"),
        decoder_layers=_count_layers(sd, r"text_decoder\.resblocks\.(\d+)\.ln_1\.weight"),
        # every shipped coca config sets multimodal heads = width/64
        # (B-32: 512/8, L-14/base: 768/12) — a hardcoded 8 silently ran
        # 12-head-trained decoders with the wrong head grouping
        decoder_heads=max(1, w // 64),
        n_queries=_g(sd, "visual.attn_pool.query").shape[0],
        attn_pooler_heads=8,
        vision=ViTConfig(
            img_size=grid * patch, patch_size=patch, embed_dim=vw,
            depth=vlayers, num_heads=max(1, vw // 64), layerscale_init=None,
            ln_eps=1e-5, pool="none",
        ),
    )


def convert_coca_state_dict(sd, cfg: CoCaConfig) -> dict:
    """Full reference CoCa state dict → models.coca pytree (all towers)."""
    from keep_tpu.compat.openai import convert_openclip_vit_trunk

    vw, e = cfg.vision.embed_dim, cfg.embed_dim

    visual = convert_openclip_vit_trunk(sd, vw, cfg.vision.depth)
    # attn-pool tower variant: no trunk-final LN (transformer.py:489-492) —
    # our vit.forward always applies ``norm``, so write the identity.
    visual["norm"] = {"scale": np.ones(vw, np.float32),
                      "bias": np.zeros(vw, np.float32)}

    # AttentionalPooler (transformer.py:163-187): d_model=e, kdim=vdim=vw.
    # torch MHA stores separate q/k/v projections when kdim != embed_dim and
    # a fused in_proj_weight when they match — handle both.
    ap = "visual.attn_pool.attn."
    if ap + "in_proj_weight" in sd:
        inw = _g(sd, ap + "in_proj_weight")
        qw, kw, vw_ = inw[:e], inw[e : 2 * e], inw[2 * e :]
    else:
        qw = _g(sd, ap + "q_proj_weight")
        kw = _g(sd, ap + "k_proj_weight")
        vw_ = _g(sd, ap + "v_proj_weight")
    inb = _g(sd, ap + "in_proj_bias")
    attn_pool = {
        "query": _g(sd, "visual.attn_pool.query"),
        "ln_q": _ln(sd, "visual.attn_pool.ln_q"),
        "ln_k": _ln(sd, "visual.attn_pool.ln_k"),
        "q": {"kernel": qw.T, "bias": inb[:e]},
        "k": {"kernel": kw.T, "bias": inb[e : 2 * e]},
        "v": {"kernel": vw_.T, "bias": inb[2 * e :]},
        "proj": {"kernel": _g(sd, ap + "out_proj.weight").T,
                 "bias": _g(sd, ap + "out_proj.bias")},
    }

    text = {
        "token_embedding": _g(sd, "text.token_embedding.weight"),
        "pos_embed": _g(sd, "text.positional_embedding"),
        "cls_emb": _g(sd, "text.cls_emb").reshape(-1),
        "blocks": _stack_resblocks(sd, "text.transformer.resblocks.{}",
                                   cfg.text_layers),
        "ln_final": _ln(sd, "text.ln_final"),
        "text_projection": _g(sd, "text.text_projection"),
    }

    decoder = {
        "self_blocks": _stack_resblocks(sd, "text_decoder.resblocks.{}",
                                        cfg.decoder_layers),
        "cross_blocks": _stack_resblocks(sd, "text_decoder.cross_attn.{}",
                                         cfg.decoder_layers, cross=True),
        "ln_final": _ln(sd, "text_decoder.ln_final"),
        "to_logits": _g(sd, "text_decoder.text_projection"),
    }

    return {
        "visual": visual,
        "attn_pool": attn_pool,
        "ln_post": _ln(sd, "visual.ln_post"),
        "visual_proj": _g(sd, "visual.proj"),
        "text": text,
        "decoder": decoder,
        "logit_scale": _g(sd, "logit_scale").reshape(()),
    }


def load_coca_checkpoint(path_or_sd, cfg: CoCaConfig | None = None):
    """(params, cfg) for ``keep_tpu.models.coca`` from a reference CoCa
    checkpoint (state dict, training checkpoint, or torch file path)."""
    import jax
    import jax.numpy as jnp

    from keep_tpu.compat.torch_loader import normalize_state_dict

    sd = path_or_sd
    if isinstance(path_or_sd, str):
        import torch

        sd = torch.load(path_or_sd, map_location="cpu", weights_only=True)
    sd = normalize_state_dict(sd)
    cfg = cfg or infer_coca_config(sd)
    return jax.tree.map(jnp.asarray, convert_coca_state_dict(sd, cfg)), cfg


# --------------------------------------------------------------------------
# PMC-CLIP
# --------------------------------------------------------------------------


def infer_pmc_clip_config(sd) -> PMCCLIPConfig:
    """Shape-sniff a PMC-CLIP state dict (ModifiedRN50 + HF BERT layout,
    the shipped model_config in model/pmc_clip.py:27-50)."""
    e = _g(sd, "text_projection").shape[1]
    w = _g(sd, "text_projection").shape[0]
    layers = tuple(
        _count_layers(sd, rf"visual\.layer{i}\.(\d+)\.conv1\.weight")
        for i in (1, 2, 3, 4)
    )
    width = _g(sd, "visual.conv1.weight").shape[0] * 2  # stem conv1 = width//2
    bert_layers = _count_layers(
        sd, r"text_encoder\.encoder\.layer\.(\d+)\.output\.dense\.weight")
    vocab, hidden = _g(sd, "text_encoder.embeddings.word_embeddings.weight").shape
    return PMCCLIPConfig(
        embed_dim=e,
        vision=ModifiedResNetConfig(
            layers=layers, width=width, output_dim=e,
            heads=width * 32 // 64,
        ),
        text=BertConfig(
            vocab_size=vocab, hidden_size=hidden,
            num_hidden_layers=bert_layers,
            num_attention_heads=max(1, hidden // 64),
            intermediate_size=_g(
                sd, "text_encoder.encoder.layer.0.intermediate.dense.weight"
            ).shape[0],
            max_position_embeddings=_g(
                sd, "text_encoder.embeddings.position_embeddings.weight"
            ).shape[0],
        ),
        fusion_layers=_count_layers(
            sd, r"fusion_module\.resblocks\.(\d+)\.ln_1\.weight"),
        mlm="mlm_projection" in sd,
    )


def convert_pmc_clip_state_dict(sd, cfg: PMCCLIPConfig) -> dict:
    """Full reference PMC_CLIP state dict → models.pmc_clip pytree."""
    from keep_tpu.compat.torch_loader import convert_hf_bert

    params = {
        "visual": convert_openai_resnet(_sub(sd, "visual."), cfg.vision),
        "text": convert_hf_bert(_sub(sd, "text_encoder."), cfg.text),
        "text_projection": _g(sd, "text_projection"),
        "img_special_token": _g(sd, "img_special_token"),
        "fusion": _stack_resblocks(sd, "fusion_module.resblocks.{}",
                                   cfg.fusion_layers),
        "logit_scale": _g(sd, "logit_scale").reshape(()),
    }
    if cfg.mlm and "mlm_projection" in sd:
        params["mlm_projection"] = _g(sd, "mlm_projection")
    return params


def load_pmc_clip_checkpoint(path_or_sd, cfg: PMCCLIPConfig | None = None):
    """(params, cfg) for ``keep_tpu.models.pmc_clip`` from a reference
    PMC_CLIP checkpoint (state dict, training checkpoint, or file path)."""
    import jax
    import jax.numpy as jnp

    from keep_tpu.compat.torch_loader import normalize_state_dict

    sd = path_or_sd
    if isinstance(path_or_sd, str):
        import torch

        sd = torch.load(path_or_sd, map_location="cpu", weights_only=True)
    sd = normalize_state_dict(sd)
    cfg = cfg or infer_pmc_clip_config(sd)
    return jax.tree.map(jnp.asarray, convert_pmc_clip_state_dict(sd, cfg)), cfg


# --------------------------------------------------------------------------
# KEP (the training-time model the reference's main.py checkpoints)
# --------------------------------------------------------------------------


def _mlp_head(sd, prefix: str) -> dict:
    """torch ``nn.Sequential(Linear, GELU, Linear)`` (KEP heads / PATH_BERT
    mlp_embed — model.py:295-313, knowledge_bert.py:25-29) → {fc1, fc2}."""
    return {
        "fc1": {"kernel": _g(sd, prefix + ".0.weight").T,
                "bias": _g(sd, prefix + ".0.bias")},
        "fc2": {"kernel": _g(sd, prefix + ".2.weight").T,
                "bias": _g(sd, prefix + ".2.bias")},
    }


def infer_kep_config(sd):
    """Shape-sniff a KEP training checkpoint (timm-ViT 'uni' image encoder —
    the KEEP config path, factory.py:211-217)."""
    from keep_tpu.models.kep import KEPConfig

    conv = _g(sd, "visual.patch_embed.proj.weight")  # [D, 3, P, P]
    vw, patch = conv.shape[0], conv.shape[-1]
    depth = _count_layers(sd, r"visual\.blocks\.(\d+)\.norm1\.weight")
    grid = int(round((_g(sd, "visual.pos_embed").shape[1] - 1) ** 0.5))
    ls = 1e-5 if "visual.blocks.0.ls1.gamma" in sd else None
    e = _g(sd, "text.mlp_embed.0.weight").shape[0]
    vocab, hidden = _g(sd, "text.bert_model.embeddings.word_embeddings.weight").shape
    return KEPConfig(
        vision=ViTConfig(img_size=grid * patch, patch_size=patch,
                         embed_dim=vw, depth=depth,
                         num_heads=max(1, vw // 64), layerscale_init=ls),
        text=BertConfig(
            vocab_size=vocab, hidden_size=hidden,
            num_hidden_layers=_count_layers(
                sd, r"text\.bert_model\.encoder\.layer\.(\d+)\.output\.dense\.weight"),
            num_attention_heads=max(1, hidden // 64),
            intermediate_size=_g(
                sd, "text.bert_model.encoder.layer.0.intermediate.dense.weight"
            ).shape[0],
            max_position_embeddings=_g(
                sd, "text.bert_model.embeddings.position_embeddings.weight"
            ).shape[0],
        ),
        embed_dim=e,
        visual_embedding_head="visual_head.0.weight" in sd,
        text_embedding_head="text_head.0.weight" in sd,
        with_knowledge="knowledge.mlp_embed.0.weight" in sd,
    )


def convert_kep_state_dict(sd, cfg) -> dict:
    """Full reference KEP training state dict (main.py:424-431 layout after
    normalize_state_dict) → models.kep pytree."""
    from keep_tpu.compat.torch_loader import convert_hf_bert, convert_timm_vit

    def path_bert(prefix: str) -> dict:
        return {
            "bert": convert_hf_bert(_sub(sd, prefix + ".bert_model."), cfg.text),
            "mlp_embed": _mlp_head(sd, prefix + ".mlp_embed"),
        }

    params = {
        "visual": convert_timm_vit(_sub(sd, "visual."), cfg.vision),
        "text": path_bert("text"),
        "logit_scale": _g(sd, "logit_scale").reshape(()),
    }
    if cfg.visual_embedding_head and "visual_head.0.weight" in sd:
        params["visual_head"] = _mlp_head(sd, "visual_head")
    if cfg.text_embedding_head and "text_head.0.weight" in sd:
        params["text_head"] = _mlp_head(sd, "text_head")
    if cfg.with_knowledge and "knowledge.mlp_embed.0.weight" in sd:
        params["knowledge"] = path_bert("knowledge")
    return params


def load_kep_checkpoint(path_or_sd, cfg=None):
    """(params, cfg) for ``keep_tpu.models.kep`` from a reference KEP
    training checkpoint (``{epoch, name, state_dict}`` dict, bare state dict,
    or torch file path; DDP prefixes handled)."""
    import jax
    import jax.numpy as jnp

    from keep_tpu.compat.torch_loader import normalize_state_dict

    sd = path_or_sd
    if isinstance(path_or_sd, str):
        import torch

        sd = torch.load(path_or_sd, map_location="cpu", weights_only=True)
    sd = normalize_state_dict(sd)
    cfg = cfg or infer_kep_config(sd)
    return jax.tree.map(jnp.asarray, convert_kep_state_dict(sd, cfg)), cfg
