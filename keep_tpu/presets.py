"""OpenCLIP architecture presets — the reference's ``model_configs/*.json``
inventory (62 entries, training/path_open_clip/factory.py:41-62) as native
config data + builders.

Each entry is the numeric data contract transcribed from the reference JSON
(embed dim / tower shapes — data, not code). ``resolve(name)`` maps it onto
our native towers:

- plain ViT + CLIP text  → ``models.vit`` (OpenCLIP variant: ln_pre + proj
  matrix) + ``models.text_transformer``
- ``RN*``                → ``models.resnet.ModifiedResNet`` (attn-pool
  projects to embed_dim)
- ``convnext_*``         → ``models.convnext`` + linear/mlp head
  (TimmModel head semantics, timm_model.py:95-106)
- ``swin_base_*``        → ``models.swin`` + linear head
- ``eva_giant`` (EVA01)  → ``models.vit`` (plain pre-LN trunk) + the timm
  classifier head as projection (TimmModel builds the trunk with
  ``num_classes=embed_dim`` when ``timm_proj`` is null, timm_model.py:58-67)
- ``vit_medium_gap``     → ``models.vit`` with ``num_prefix_tokens=0``,
  avg pool, post-pool fc_norm
- ``*-bert``             → BERT trunk + tanh pooler + mlp_embed
  (``models.kep.path_bert_encode``)
- ``roberta/xlm-roberta`` → ``models.hf_text`` (mean pooler + mlp proj)
- ``coca_*``             → ``models.coca``

- EVA02 (rope/SwiGLU)    → ``models.eva``; relpos ViTs → ``models.vit_relpos``;
  mT5 encoder → ``models.t5``

All 62 entries build natively (``UNSUPPORTED`` is empty). The
:class:`UnsupportedPresetError` machinery remains for forward compatibility:
a future preset whose tower is missing fails fast naming it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.configs import BertConfig, ViTConfig

Array = jax.Array

# ---------------------------------------------------------------------------
# data: transcribed from /root/reference/training/path_open_clip/model_configs
# ---------------------------------------------------------------------------

_VIT = "vit"  # plain OpenCLIP VisionTransformer

_T = {"context_length": 77, "vocab_size": 49408}  # the common CLIP text base


def _vt(w, h, l):  # text_cfg shorthand
    return dict(_T, width=w, heads=h, layers=l)


PRESETS: dict[str, dict] = {
    # --- plain ViT + CLIP text -------------------------------------------
    "ViT-S-32": {"embed_dim": 384, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 384, "patch_size": 32}, "text": _vt(384, 6, 12)},
    "ViT-S-32-alt": {"embed_dim": 256, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 384, "patch_size": 32}, "text": _vt(256, 4, 10)},
    "ViT-S-16": {"embed_dim": 384, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 384, "patch_size": 16}, "text": _vt(384, 6, 12)},
    "ViT-S-16-alt": {"embed_dim": 256, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 384, "patch_size": 16}, "text": _vt(256, 4, 10)},
    "ViT-M-32": {"embed_dim": 512, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 512, "patch_size": 32}, "text": _vt(512, 8, 12)},
    "ViT-M-32-alt": {"embed_dim": 384, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 512, "patch_size": 32}, "text": _vt(384, 6, 12)},
    "ViT-M-16": {"embed_dim": 512, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 512, "patch_size": 16}, "text": _vt(512, 8, 12)},
    "ViT-M-16-alt": {"embed_dim": 384, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 512, "patch_size": 16, "ls_init_value": 1e-4}, "text": _vt(384, 6, 12)},
    "ViT-B-32": {"embed_dim": 512, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 768, "patch_size": 32}, "text": _vt(512, 8, 12)},
    "ViT-B-32-quickgelu": {"embed_dim": 512, "quick_gelu": True, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 768, "patch_size": 32}, "text": _vt(512, 8, 12)},
    "ViT-B-32-plus-256": {"embed_dim": 640, "vision": {"kind": _VIT, "image_size": 256, "layers": 12, "width": 896, "patch_size": 32}, "text": _vt(640, 10, 12)},
    "ViT-B-16": {"embed_dim": 512, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 768, "patch_size": 16}, "text": _vt(512, 8, 12)},
    "ViT-B-16-plus": {"embed_dim": 640, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 896, "patch_size": 16}, "text": _vt(640, 10, 12)},
    "ViT-B-16-plus-240": {"embed_dim": 640, "vision": {"kind": _VIT, "image_size": 240, "layers": 12, "width": 896, "patch_size": 16}, "text": _vt(640, 10, 12)},
    "ViT-L-14": {"embed_dim": 768, "vision": {"kind": _VIT, "image_size": 224, "layers": 24, "width": 1024, "patch_size": 14}, "text": _vt(768, 12, 12)},
    "ViT-L-14-280": {"embed_dim": 768, "vision": {"kind": _VIT, "image_size": 280, "layers": 24, "width": 1024, "patch_size": 14}, "text": _vt(768, 12, 12)},
    "ViT-L-14-336": {"embed_dim": 768, "vision": {"kind": _VIT, "image_size": 336, "layers": 24, "width": 1024, "patch_size": 14}, "text": _vt(768, 12, 12)},
    "ViT-L-16": {"embed_dim": 768, "vision": {"kind": _VIT, "image_size": 224, "layers": 24, "width": 1024, "patch_size": 16}, "text": _vt(768, 12, 12)},
    "ViT-L-16-320": {"embed_dim": 768, "vision": {"kind": _VIT, "image_size": 320, "layers": 24, "width": 1024, "patch_size": 16}, "text": _vt(768, 12, 12)},
    "ViT-H-14": {"embed_dim": 1024, "vision": {"kind": _VIT, "image_size": 224, "layers": 32, "width": 1280, "head_width": 80, "patch_size": 14}, "text": _vt(1024, 16, 24)},
    "ViT-H-16": {"embed_dim": 1024, "vision": {"kind": _VIT, "image_size": 224, "layers": 32, "width": 1280, "head_width": 80, "patch_size": 16}, "text": _vt(1024, 16, 24)},
    "ViT-g-14": {"embed_dim": 1024, "vision": {"kind": _VIT, "image_size": 224, "layers": 40, "width": 1408, "head_width": 88, "mlp_ratio": 4.3637, "patch_size": 14}, "text": _vt(1024, 16, 24)},
    "ViT-bigG-14": {"embed_dim": 1280, "vision": {"kind": _VIT, "image_size": 224, "layers": 48, "width": 1664, "head_width": 104, "mlp_ratio": 4.9231, "patch_size": 14}, "text": _vt(1280, 20, 32)},
    "ViT-e-14": {"embed_dim": 1280, "vision": {"kind": _VIT, "image_size": 224, "layers": 56, "width": 1792, "head_width": 112, "mlp_ratio": 8.5715, "patch_size": 14}, "text": _vt(1280, 20, 36)},
    # --- ModifiedResNet ---------------------------------------------------
    "RN50": {"embed_dim": 1024, "vision": {"kind": "rn", "image_size": 224, "layers": (3, 4, 6, 3), "width": 64}, "text": _vt(512, 8, 12)},
    "RN50-quickgelu": {"embed_dim": 1024, "quick_gelu": True, "vision": {"kind": "rn", "image_size": 224, "layers": (3, 4, 6, 3), "width": 64}, "text": _vt(512, 8, 12)},
    "RN101": {"embed_dim": 512, "vision": {"kind": "rn", "image_size": 224, "layers": (3, 4, 23, 3), "width": 64}, "text": _vt(512, 8, 12)},
    "RN101-quickgelu": {"embed_dim": 512, "quick_gelu": True, "vision": {"kind": "rn", "image_size": 224, "layers": (3, 4, 23, 3), "width": 64}, "text": _vt(512, 8, 12)},
    "RN50x4": {"embed_dim": 640, "vision": {"kind": "rn", "image_size": 288, "layers": (4, 6, 10, 6), "width": 80}, "text": _vt(640, 10, 12)},
    "RN50x16": {"embed_dim": 768, "vision": {"kind": "rn", "image_size": 384, "layers": (6, 8, 18, 8), "width": 96}, "text": _vt(768, 12, 12)},
    "RN50x64": {"embed_dim": 1024, "vision": {"kind": "rn", "image_size": 448, "layers": (3, 15, 36, 10), "width": 128}, "text": _vt(1024, 16, 12)},
    # --- timm-delegated towers, implemented natively ----------------------
    "convnext_tiny": {"embed_dim": 1024, "vision": {"kind": "convnext", "image_size": 224, "depths": (3, 3, 9, 3), "dims": (96, 192, 384, 768), "proj": "linear"}, "text": _vt(512, 8, 12)},
    "convnext_small": {"embed_dim": 512, "vision": {"kind": "convnext", "image_size": 224, "depths": (3, 3, 27, 3), "dims": (96, 192, 384, 768), "proj": "linear"}, "text": _vt(512, 8, 12)},
    "convnext_base": {"embed_dim": 512, "vision": {"kind": "convnext", "image_size": 224, "depths": (3, 3, 27, 3), "dims": (128, 256, 512, 1024), "proj": "linear"}, "text": _vt(512, 8, 12)},
    "convnext_base_w": {"embed_dim": 640, "vision": {"kind": "convnext", "image_size": 256, "depths": (3, 3, 27, 3), "dims": (128, 256, 512, 1024), "proj": "linear"}, "text": _vt(640, 10, 12)},
    "convnext_base_w_320": {"embed_dim": 640, "vision": {"kind": "convnext", "image_size": 320, "depths": (3, 3, 27, 3), "dims": (128, 256, 512, 1024), "proj": "linear"}, "text": _vt(640, 10, 12)},
    "convnext_large": {"embed_dim": 768, "vision": {"kind": "convnext", "image_size": 224, "depths": (3, 3, 27, 3), "dims": (192, 384, 768, 1536), "proj": "linear"}, "text": _vt(768, 12, 12)},
    "convnext_large_d": {"embed_dim": 768, "vision": {"kind": "convnext", "image_size": 256, "depths": (3, 3, 27, 3), "dims": (192, 384, 768, 1536), "proj": "mlp"}, "text": _vt(768, 12, 16)},
    "convnext_large_d_320": {"embed_dim": 768, "vision": {"kind": "convnext", "image_size": 320, "depths": (3, 3, 27, 3), "dims": (192, 384, 768, 1536), "proj": "mlp"}, "text": _vt(768, 12, 16)},
    "convnext_xlarge": {"embed_dim": 1024, "vision": {"kind": "convnext", "image_size": 256, "depths": (3, 3, 27, 3), "dims": (256, 512, 1024, 2048), "proj": "linear"}, "text": _vt(1024, 16, 20)},
    "convnext_xxlarge": {"embed_dim": 1024, "vision": {"kind": "convnext", "image_size": 256, "depths": (3, 4, 30, 3), "dims": (384, 768, 1536, 3072), "proj": "linear"}, "text": _vt(1024, 16, 24)},
    "convnext_xxlarge_320": {"embed_dim": 1024, "vision": {"kind": "convnext", "image_size": 320, "depths": (3, 4, 30, 3), "dims": (384, 768, 1536, 3072), "proj": "linear"}, "text": _vt(1024, 16, 24)},
    "swin_base_patch4_window7_224": {"embed_dim": 640, "vision": {"kind": "swin", "image_size": 224, "proj": "linear"}, "text": _vt(640, 10, 12)},
    "vit_medium_patch16_gap_256": {"embed_dim": 512, "vision": {"kind": "vit_gap", "image_size": 256, "layers": 12, "width": 512, "patch_size": 16, "proj": "linear"}, "text": _vt(512, 8, 12)},
    "EVA01-g-14": {"embed_dim": 1024, "vision": {"kind": "eva01_g", "image_size": 224, "proj": "linear_bias"}, "text": _vt(768, 12, 12)},
    "EVA01-g-14-plus": {"embed_dim": 1024, "vision": {"kind": "eva01_g", "image_size": 224, "proj": "linear_bias"}, "text": _vt(1024, 16, 24)},
    # EVA02 trunks (models/eva.py, shapes from EVA02-*.json; timm_proj null →
    # the trunk's own head projects to embed_dim)
    "EVA02-B-16": {"embed_dim": 512, "vision": {"kind": "eva02", "proj": "none"}, "text": _vt(512, 8, 12)},
    "EVA02-L-14": {"embed_dim": 768, "vision": {"kind": "eva02", "proj": "none"}, "text": _vt(768, 12, 12)},
    "EVA02-L-14-336": {"embed_dim": 768, "vision": {"kind": "eva02", "proj": "none"}, "text": _vt(768, 12, 12)},
    "EVA02-E-14": {"embed_dim": 1024, "vision": {"kind": "eva02", "proj": "none"}, "text": _vt(1024, 16, 24)},
    "EVA02-E-14-plus": {"embed_dim": 1024, "vision": {"kind": "eva02", "proj": "none"}, "text": _vt(1280, 20, 32)},
    "vit_relpos_medium_patch16_cls_224": {"embed_dim": 512, "vision": {"kind": "vit_relpos", "image_size": 224, "proj": "linear"}, "text": _vt(512, 8, 12)},
    # --- HF text towers ----------------------------------------------------
    "ViT-B-32-bert": {"embed_dim": 768, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 768, "patch_size": 32}, "text": {"kind": "path_bert", "context_length": 256, "vocab_size": 30522, "width": 768, "heads": 12, "layers": 12}},
    "roberta-ViT-B-32": {"embed_dim": 512, "quick_gelu": True, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 768, "patch_size": 32}, "text": {"kind": "roberta", "vocab_size": 50265, "width": 768, "heads": 12, "layers": 12, "proj": "mlp"}},
    "xlm-roberta-base-ViT-B-32": {"embed_dim": 512, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 768, "patch_size": 32}, "text": {"kind": "xlm-roberta", "vocab_size": 250002, "width": 768, "heads": 12, "layers": 12, "proj": "mlp"}},
    "xlm-roberta-large-ViT-H-14": {"embed_dim": 1024, "vision": {"kind": _VIT, "image_size": 224, "layers": 32, "width": 1280, "head_width": 80, "patch_size": 14}, "text": {"kind": "xlm-roberta", "vocab_size": 250002, "width": 1024, "heads": 16, "layers": 24, "proj": "mlp"}},
    # mt5 trunk shapes from the HF google/mt5-{base,xl} configs (data contract)
    "mt5-base-ViT-B-32": {"embed_dim": 512, "vision": {"kind": _VIT, "image_size": 224, "layers": 12, "width": 768, "patch_size": 32}, "text": {"kind": "mt5", "vocab_size": 250112, "width": 768, "heads": 12, "layers": 12, "d_ff": 2048, "proj": "mlp"}},
    "mt5-xl-ViT-H-14": {"embed_dim": 1024, "vision": {"kind": _VIT, "image_size": 224, "layers": 32, "width": 1280, "head_width": 80, "patch_size": 14}, "text": {"kind": "mt5", "vocab_size": 250112, "width": 2048, "heads": 32, "layers": 24, "d_ff": 5120, "proj": "mlp"}},
    # --- CoCa --------------------------------------------------------------
    "coca_ViT-B-32": {"embed_dim": 512, "family": "coca", "vision": {"image_size": 224, "layers": 12, "width": 768, "patch_size": 32, "attentional_pool": True, "attn_pooler_heads": 8}, "text": {"width": 512, "heads": 8, "layers": 12, "vocab_size": 49408}, "multimodal": {"layers": 12, "heads": 8}},
    "coca_ViT-L-14": {"embed_dim": 768, "family": "coca", "vision": {"image_size": 224, "layers": 24, "width": 1024, "patch_size": 14, "attentional_pool": True, "attn_pooler_heads": 8}, "text": {"width": 768, "heads": 12, "layers": 12, "vocab_size": 49408}, "multimodal": {"layers": 12, "heads": 12}},
    "coca_base": {"embed_dim": 512, "family": "coca", "vision": {"image_size": 288, "layers": 12, "width": 768, "patch_size": 18}, "text": {"width": 768, "heads": 12, "layers": 12, "vocab_size": 64000}, "multimodal": {"layers": 12, "heads": 12, "n_queries": 256}},
    # CoCa with a RoBERTa token tower: no attentional pooler (decoder
    # cross-attends raw ViT patch tokens at trunk width 768 == multimodal
    # width), roberta hidden states feed the decoder
    # (coca_roberta-ViT-B-32.json)
    "coca_roberta-ViT-B-32": {"embed_dim": 512, "family": "coca", "vision": {"image_size": 224, "layers": 12, "width": 768, "patch_size": 32}, "text": {"kind": "roberta", "vocab_size": 50265, "width": 768, "heads": 12, "layers": 12, "proj": "linear"}, "multimodal": {"layers": 12, "heads": 8, "context_length": 76}},
}

UNSUPPORTED: dict[str, str] = {}


class UnsupportedPresetError(NotImplementedError):
    pass


# per-encoder normalization stats (reference factory.py:246-258 +
# constants.py): OpenCLIP presets default to the OpenAI CLIP stats; the
# pathology encoders (uni/ctp/prov) use ImageNet; res_ssl uses lunit's.
OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
RES_SSL_MEAN = (0.70322989, 0.53606487, 0.66096631)
RES_SSL_STD = (0.21716536, 0.26081574, 0.20723464)

ENCODER_STATS = {
    "uni": (IMAGENET_MEAN, IMAGENET_STD),
    "ctp": (IMAGENET_MEAN, IMAGENET_STD),
    "prov": (IMAGENET_MEAN, IMAGENET_STD),
    "res_ssl": (RES_SSL_MEAN, RES_SSL_STD),
}


def tokenizer_kind(name: str) -> str:
    """→ the tokenizer family a preset's text tower expects (reference
    factory.get_tokenizer, factory.py:85-98): 'clip' (byte-level BPE,
    ``text/bpe.py``), 'bert' (WordPiece, ``text/tokenizer.py``). RoBERTa/
    XLM-R/mT5 presets need their upstream HF tokenizers (byte-BPE /
    SentencePiece vocabularies that ship with those models, not derivable
    offline) — raises with that reason."""
    r = resolve(name)
    if r.family == "coca" and getattr(r.text_cfg, "hf_text", None) is not None:
        arch = r.text_cfg.hf_text.arch  # coca_roberta → the HF tokenizer path
    elif r.text_kind == "clip" or r.family == "coca":
        return "clip"
    elif r.text_kind == "path_bert":
        return "bert"
    else:
        arch = getattr(r.text_cfg, "arch", "?")
    raise UnsupportedPresetError(
        f"{name}: the {arch} text tower uses its upstream HF tokenizer "
        f"({'SentencePiece' if arch in ('xlm-roberta', 'mt5') else 'byte-BPE'}"
        f" vocabulary shipped with the checkpoint); load it via "
        f"transformers.AutoTokenizer from a local checkout")


def preprocess_config(name: str):
    """→ ``PreprocessConfig`` (size + mean/std) for a preset — the
    reference's ``image_transform(model.visual.image_size, mean, std)``
    wiring (factory.py:323-337)."""
    from keep_tpu.configs import PreprocessConfig

    r = resolve(name)
    size = getattr(r.vision_cfg, "img_size", None) or getattr(
        r.vision_cfg, "image_size")
    return PreprocessConfig(size=size, mean=OPENAI_DATASET_MEAN,
                            std=OPENAI_DATASET_STD)


def preset_names(include_unsupported: bool = False) -> list[str]:
    names = sorted(PRESETS)
    if include_unsupported:
        names = sorted(set(names) | set(UNSUPPORTED))
    return names


# ---------------------------------------------------------------------------
# resolution
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ResolvedPreset:
    name: str
    family: str  # 'clip' | 'coca'
    embed_dim: int
    vision_kind: str
    vision_cfg: Any
    vision_proj: str  # 'matrix' | 'linear' | 'linear_bias' | 'mlp' | 'none'
    text_kind: str  # 'clip' | 'path_bert' | 'hf'
    text_cfg: Any
    quick_gelu: bool = False


def resolve(name: str) -> ResolvedPreset:
    if name in UNSUPPORTED:
        raise UnsupportedPresetError(f"{name}: {UNSUPPORTED[name]}")
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {preset_names()} "
                       f"(+{len(UNSUPPORTED)} unsupported)")
    raw = PRESETS[name]
    e = raw["embed_dim"]
    qg = raw.get("quick_gelu", False)
    act = "quick_gelu" if qg else "gelu"
    v = raw["vision"]

    if raw.get("family") == "coca":
        from keep_tpu.models.coca import CoCaConfig

        mm = raw["multimodal"]
        t = raw["text"]
        vision = ViTConfig(
            img_size=v["image_size"], patch_size=v["patch_size"],
            embed_dim=v["width"], depth=v["layers"],
            num_heads=v["width"] // v.get("head_width", 64),
            layerscale_init=None, ln_eps=1e-5, pool="none",
        )
        if t.get("kind") == "roberta":
            # coca_roberta: HF token tower + no attentional pooler; roberta
            # special ids (<s>=0, <pad>=1, </s>=2)
            from keep_tpu.models.hf_text import HFTextConfig

            hf = HFTextConfig(
                arch="roberta",
                trunk=BertConfig(
                    vocab_size=t["vocab_size"], hidden_size=t["width"],
                    num_hidden_layers=t["layers"],
                    num_attention_heads=t["heads"],
                    intermediate_size=4 * t["width"],
                    max_position_embeddings=514, type_vocab_size=1,
                    ln_eps=1e-5, pad_token_id=1,
                ),
                output_dim=e, pooler="mean", proj=t["proj"],
            )
            cfg = CoCaConfig(
                embed_dim=e, vocab_size=t["vocab_size"],
                context_length=mm.get("context_length", 76),
                text_width=t["width"], text_heads=t["heads"],
                text_layers=t["layers"], decoder_layers=mm["layers"],
                decoder_heads=mm["heads"], vision=vision,
                hf_text=hf, use_attn_pool=False,
                pad_id=1, sot_id=0, eos_id=2,
            )
            return ResolvedPreset(name, "coca", e, "vit", cfg.vision, "none",
                                  "coca", cfg, qg)
        cfg = CoCaConfig(
            embed_dim=e, vocab_size=t["vocab_size"], context_length=76,
            text_width=t["width"], text_heads=t["heads"],
            text_layers=t["layers"], decoder_layers=mm["layers"],
            decoder_heads=mm["heads"],
            # the pooler belongs to the VISION cfg (model/model.py:135-137;
            # coca_base has none, and coca_ViT-L-14's pooler runs 8 heads —
            # its multimodal attn_pooler_heads=12 is dead config)
            use_attn_pool=v.get("attentional_pool", False),
            attn_pooler_heads=v.get("attn_pooler_heads", 8),
            n_queries=mm.get("n_queries", 256),
            vision=vision,
            sot_id=t["vocab_size"] - 2, eos_id=t["vocab_size"] - 1,
        )
        return ResolvedPreset(name, "coca", e, "vit", cfg.vision, "none",
                              "coca", cfg, qg)

    kind = v["kind"]
    if kind == "vit":
        vcfg = ViTConfig(
            img_size=v["image_size"], patch_size=v["patch_size"],
            embed_dim=v["width"], depth=v["layers"],
            num_heads=v["width"] // v.get("head_width", 64),
            mlp_ratio=v.get("mlp_ratio", 4.0),
            layerscale_init=v.get("ls_init_value"), ln_eps=1e-5, act=act,
        )
        vproj = "matrix"
    elif kind == "rn":
        from keep_tpu.models.resnet import ModifiedResNetConfig

        vcfg = ModifiedResNetConfig(
            layers=tuple(v["layers"]), width=v["width"],
            image_size=v["image_size"], heads=v["width"] * 32 // 64,
            output_dim=e,
        )
        vproj = "none"
    elif kind == "convnext":
        from keep_tpu.models.convnext import ConvNeXtConfig

        vcfg = ConvNeXtConfig(img_size=v["image_size"],
                              depths=tuple(v["depths"]),
                              dims=tuple(v["dims"]))
        vproj = v["proj"]
    elif kind == "swin":
        from keep_tpu.models.swin import SwinConfig

        vcfg = SwinConfig(img_size=v["image_size"], embed_dim=128,
                          depths=(2, 2, 18, 2), heads=(4, 8, 16, 32),
                          conv_stem=False)
        vproj = v["proj"]
    elif kind == "vit_gap":
        vcfg = ViTConfig(
            img_size=v["image_size"], patch_size=v["patch_size"],
            embed_dim=v["width"], depth=v["layers"],
            num_heads=v["width"] // 64, layerscale_init=None, ln_eps=1e-6,
            num_prefix_tokens=0, pool="avg", fc_norm=True,
        )
        vproj = v["proj"]
    elif kind == "eva01_g":
        # timm eva_giant_patch14_224: plain pre-LN ViT, width 1408, depth 40,
        # heads 16, mlp 6144 (ratio 6144/1408), no LayerScale, CLS pool
        vcfg = ViTConfig(
            img_size=v["image_size"], patch_size=14, embed_dim=1408,
            depth=40, num_heads=16, mlp_ratio=6144 / 1408,
            layerscale_init=None, ln_eps=1e-6,
        )
        vproj = v["proj"]
    elif kind == "eva02":
        from keep_tpu.models.eva import EVA02_CONFIGS

        vcfg = EVA02_CONFIGS[name]  # trunk head projects to embed_dim
        vproj = "none"
    elif kind == "vit_relpos":
        from keep_tpu.models.vit_relpos import ViTRelPosConfig

        # timm vit_relpos_medium_patch16_cls_224: width 512, depth 12,
        # heads 8, rel_pos_dim=256, qkv_bias=False
        vcfg = ViTRelPosConfig(img_size=v["image_size"], patch_size=16,
                               embed_dim=512, depth=12, num_heads=8,
                               rel_pos_hidden=256)
        vproj = v["proj"]
    else:  # pragma: no cover
        raise ValueError(f"bad vision kind {kind!r}")

    t = raw["text"]
    tkind = t.get("kind", "clip")
    if tkind == "clip":
        from keep_tpu.models.text_transformer import TextTransformerConfig

        tcfg = TextTransformerConfig(
            vocab_size=t["vocab_size"], context_length=t["context_length"],
            width=t["width"], heads=t["heads"], layers=t["layers"],
            output_dim=e, act=act,
        )
    elif tkind == "path_bert":
        tcfg = BertConfig(vocab_size=t["vocab_size"], hidden_size=t["width"],
                          num_hidden_layers=t["layers"],
                          num_attention_heads=t["heads"],
                          intermediate_size=4 * t["width"])
    elif tkind == "mt5":
        from keep_tpu.models.hf_text import HFTextConfig
        from keep_tpu.models.t5 import T5EncoderConfig

        tcfg = HFTextConfig(
            arch="mt5",
            trunk=T5EncoderConfig(
                vocab_size=t["vocab_size"], d_model=t["width"],
                num_heads=t["heads"], num_layers=t["layers"],
                d_ff=t["d_ff"],
            ),
            output_dim=e, pooler="mean", proj=t["proj"],
        )
        tkind = "hf"
    elif tkind in ("roberta", "xlm-roberta"):
        from keep_tpu.models.hf_text import HFTextConfig

        tcfg = HFTextConfig(
            arch=tkind,
            trunk=BertConfig(
                vocab_size=t["vocab_size"], hidden_size=t["width"],
                num_hidden_layers=t["layers"],
                num_attention_heads=t["heads"],
                intermediate_size=4 * t["width"],
                max_position_embeddings=514, type_vocab_size=1,
                ln_eps=1e-5, pad_token_id=1,
            ),
            output_dim=e, pooler="mean", proj=t["proj"],
        )
        tkind = "hf"
    else:  # pragma: no cover
        raise ValueError(f"bad text kind {tkind!r}")
    return ResolvedPreset(name, "clip", e, kind, vcfg, vproj, tkind, tcfg, qg)


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------


def _head_init(key, kind: str, fin: int, fout: int, dtype) -> dict | None:
    k1, k2 = jax.random.split(key)
    n = lambda k, s, std: (jax.random.normal(k, s) * std).astype(dtype)
    if kind == "matrix":
        return {"proj": n(k1, (fin, fout), fin**-0.5)}
    if kind == "linear":
        return {"w": n(k1, (fin, fout), fin**-0.5)}
    if kind == "linear_bias":
        return {"w": n(k1, (fin, fout), fin**-0.5),
                "b": jnp.zeros((fout,), dtype)}
    if kind == "mlp":  # TimmModel mlp head: hidden = 2*embed_dim,
        # fc1 biased, fc2 unbiased (timm_model.py:103)
        hid = 2 * fout
        return {"fc1": n(k1, (fin, hid), fin**-0.5),
                "fc1_b": jnp.zeros((hid,), dtype),
                "fc2": n(k2, (hid, fout), hid**-0.5)}
    return None


def _head_apply(head: dict | None, kind: str, x: Array) -> Array:
    if kind in ("matrix", "none") and head is None:
        return x
    if kind == "matrix":
        return jnp.dot(x, head["proj"].astype(x.dtype))
    if kind == "linear":
        return jnp.dot(x, head["w"].astype(x.dtype))
    if kind == "linear_bias":
        return jnp.dot(x, head["w"].astype(x.dtype)) + head["b"].astype(x.dtype)
    if kind == "mlp":
        from keep_tpu.ops.nn import gelu

        h = gelu(jnp.dot(x, head["fc1"].astype(x.dtype))
                 + head["fc1_b"].astype(x.dtype))
        return jnp.dot(h, head["fc2"].astype(x.dtype))
    return x


@dataclasses.dataclass(frozen=True)
class PresetModel:
    """encode_image/encode_text/forward closures for a resolved preset —
    the CustomTextCLIP surface (model/model.py:379-432)."""

    preset: ResolvedPreset
    encode_image: Callable
    encode_text: Callable
    forward: Callable


def create_preset(name: str, seed: int = 0, dtype=jnp.float32):
    """→ (params, PresetModel). Raises UnsupportedPresetError with the exact
    missing-tower reason for the inventory entries we do not implement."""
    from keep_tpu.ops.nn import l2_normalize

    r = resolve(name)

    if r.family == "coca":
        from keep_tpu.models import coca

        params = coca.init(jax.random.PRNGKey(seed), r.text_cfg, dtype)

        # uniform PresetModel surface: [B, E] latents (already normalized —
        # the reference's CLIP-facing CoCa.encode_image/encode_text return
        # the latent alone, coca_model.py:145-151). The decoder-context
        # tokens stay reachable via coca.encode_image/encode_text directly.
        def coca_encode_image(p, x, *, normalize=False, **kw):
            return coca.encode_image(p, x, r.text_cfg, **kw)[0]

        def coca_encode_text(p, ids, *, normalize=False, **kw):
            return coca.encode_text(p, ids, r.text_cfg, **kw)[0]

        return params, PresetModel(
            preset=r,
            encode_image=coca_encode_image,
            encode_text=coca_encode_text,
            forward=lambda p, x, ids, **kw: coca.forward(
                p, x, ids, r.text_cfg, **kw),
        )

    kv, kh, kt, kth = jax.random.split(jax.random.PRNGKey(seed), 4)

    # --- vision -----------------------------------------------------------
    vk = r.vision_kind
    if vk == "rn":
        from keep_tpu.models import resnet as _v

        visual = _v.init(kv, r.vision_cfg, dtype)
        vfeat = lambda p, x, **kw: _v.forward(p, x, r.vision_cfg)
        fin = r.embed_dim  # attnpool already projects
    elif vk == "convnext":
        from keep_tpu.models import convnext as _v

        visual = _v.init(kv, r.vision_cfg, dtype)
        vfeat = lambda p, x, **kw: _v.forward(p, x, r.vision_cfg, **kw)
        fin = r.vision_cfg.num_features
    elif vk == "swin":
        from keep_tpu.models import swin as _v

        visual = _v.init(kv, r.vision_cfg, dtype)
        vfeat = lambda p, x, **kw: _v.forward(p, x, r.vision_cfg)
        fin = r.vision_cfg.num_features
    elif vk == "eva02":
        from keep_tpu.models import eva as _v

        visual = _v.init(kv, r.vision_cfg, dtype)
        vfeat = lambda p, x, **kw: _v.forward(p, x, r.vision_cfg, **kw)
        fin = r.vision_cfg.out_dim  # trunk head already projects
    elif vk == "vit_relpos":
        from keep_tpu.models import vit_relpos as _v

        visual = _v.init(kv, r.vision_cfg, dtype)
        vfeat = lambda p, x, **kw: _v.forward(p, x, r.vision_cfg, **kw)
        fin = r.vision_cfg.embed_dim
    else:  # vit / vit_gap / eva01_g
        from keep_tpu.models import vit as _v

        visual = _v.init(kv, r.vision_cfg, dtype)
        if r.vision_proj == "matrix":  # OpenCLIP ViT: ln_pre + proj matrix
            visual["ln_pre"] = {
                "scale": jnp.ones((r.vision_cfg.embed_dim,), dtype),
                "bias": jnp.zeros((r.vision_cfg.embed_dim,), dtype)}
        vfeat = lambda p, x, **kw: _v.forward(p, x, r.vision_cfg, **kw)
        fin = r.vision_cfg.embed_dim

    head = _head_init(kh, r.vision_proj, fin, r.embed_dim, dtype)

    # --- text ---------------------------------------------------------------
    tk = r.text_kind
    if tk == "clip":
        from keep_tpu.models import text_transformer as _t

        text = _t.init(kt, r.text_cfg, dtype)
        tfeat = lambda p, ids, **kw: _t.forward(p, ids, r.text_cfg, **kw)
    elif tk == "path_bert":
        from keep_tpu.models import bert as _b
        from keep_tpu.models.kep import path_bert_encode

        text = {"bert": _b.init(kt, r.text_cfg, dtype)}
        d = r.text_cfg.hidden_size
        nrm = lambda k, s, std: (jax.random.normal(k, s) * std).astype(dtype)
        k1, k2 = jax.random.split(kth)
        text["mlp_embed"] = {  # knowledge_bert.py:33-40, init std=D^-0.5
            "fc1": {"kernel": nrm(k1, (d, r.embed_dim), r.embed_dim**-0.5),
                    "bias": jnp.zeros((r.embed_dim,), dtype)},
            "fc2": {"kernel": nrm(k2, (r.embed_dim, r.embed_dim),
                                  r.embed_dim**-0.5),
                    "bias": jnp.zeros((r.embed_dim,), dtype)},
        }
        tfeat = lambda p, ids, **kw: path_bert_encode(
            p, ids, (ids != 0).astype(jnp.int32), r.text_cfg, **kw)
    else:  # hf (roberta family)
        from keep_tpu.models import hf_text as _t

        text = _t.init(kt, r.text_cfg, dtype)
        tfeat = lambda p, ids, **kw: _t.forward(p, ids, r.text_cfg, **kw)

    params = {"visual": visual, "text": text,
              "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32)}
    if head is not None:
        params["visual_head"] = head

    def encode_image(p, pixels, *, normalize=False, **kw):
        f = _head_apply(p.get("visual_head"), r.vision_proj,
                        vfeat(p["visual"], pixels, **kw))
        return l2_normalize(f.astype(jnp.float32)) if normalize else f

    def encode_text(p, ids, *, normalize=False, **kw):
        f = tfeat(p["text"], ids, **kw)
        return l2_normalize(f.astype(jnp.float32)) if normalize else f

    def forward(p, pixels, ids, **kw):
        return {
            "image_features": encode_image(p, pixels, normalize=True, **kw),
            "text_features": encode_text(p, ids, normalize=True),
            "logit_scale": jnp.exp(p["logit_scale"]),
        }

    return params, PresetModel(preset=r, encode_image=encode_image,
                               encode_text=encode_text, forward=forward)
