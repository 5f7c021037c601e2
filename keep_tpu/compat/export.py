"""Export JAX params back to the released HF checkpoint layout
(``pytorch_model.bin`` + ``config.json``), enabling interop both ways: a
user of the reference can load weights trained here, and round-trip tests
pin the converter (``torch_loader``) exactly.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from keep_tpu.configs import KEEPConfig


def _np(x) -> np.ndarray:
    return np.asarray(x)


def vit_to_timm_state_dict(params: dict, cfg) -> dict:
    """Inverse of ``convert_timm_vit``: pytree → timm key layout."""
    out = {}
    k = params["patch_embed"]["kernel"]  # [P*P*3, D] flatten (ph, pw, c)
    p, d = cfg.patch_size, cfg.embed_dim
    out["patch_embed.proj.weight"] = (
        _np(k).reshape(p, p, 3, d).transpose(3, 2, 0, 1)
    )
    out["patch_embed.proj.bias"] = _np(params["patch_embed"]["bias"])
    out["cls_token"] = _np(params["cls_token"])
    out["pos_embed"] = _np(params["pos_embed"])
    b = params["blocks"]
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        out[pre + "norm1.weight"] = _np(b["norm1"]["scale"][i])
        out[pre + "norm1.bias"] = _np(b["norm1"]["bias"][i])
        out[pre + "attn.qkv.weight"] = _np(b["attn"]["qkv"]["kernel"][i]).T
        out[pre + "attn.qkv.bias"] = _np(b["attn"]["qkv"]["bias"][i])
        out[pre + "attn.proj.weight"] = _np(b["attn"]["proj"]["kernel"][i]).T
        out[pre + "attn.proj.bias"] = _np(b["attn"]["proj"]["bias"][i])
        out[pre + "norm2.weight"] = _np(b["norm2"]["scale"][i])
        out[pre + "norm2.bias"] = _np(b["norm2"]["bias"][i])
        out[pre + "mlp.fc1.weight"] = _np(b["mlp"]["fc1"]["kernel"][i]).T
        out[pre + "mlp.fc1.bias"] = _np(b["mlp"]["fc1"]["bias"][i])
        out[pre + "mlp.fc2.weight"] = _np(b["mlp"]["fc2"]["kernel"][i]).T
        out[pre + "mlp.fc2.bias"] = _np(b["mlp"]["fc2"]["bias"][i])
        if "ls1" in b:
            out[pre + "ls1.gamma"] = _np(b["ls1"][i])
            out[pre + "ls2.gamma"] = _np(b["ls2"][i])
    out["norm.weight"] = _np(params["norm"]["scale"])
    out["norm.bias"] = _np(params["norm"]["bias"])
    return out


def bert_to_hf_state_dict(params: dict, cfg) -> dict:
    """Inverse of ``convert_hf_bert``: pytree → HF BertModel key layout."""
    out = {}
    emb = params["embeddings"]
    out["embeddings.word_embeddings.weight"] = _np(emb["word"])
    out["embeddings.position_embeddings.weight"] = _np(emb["position"])
    out["embeddings.token_type_embeddings.weight"] = _np(emb["token_type"])
    out["embeddings.LayerNorm.weight"] = _np(emb["norm"]["scale"])
    out["embeddings.LayerNorm.bias"] = _np(emb["norm"]["bias"])
    b = params["blocks"]
    d = cfg.hidden_size
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}."
        qkv_k = _np(b["attn"]["qkv"]["kernel"][i])  # [D, 3D]
        qkv_b = _np(b["attn"]["qkv"]["bias"][i])
        for j, n in enumerate(("query", "key", "value")):
            out[pre + f"attention.self.{n}.weight"] = qkv_k[:, j * d : (j + 1) * d].T
            out[pre + f"attention.self.{n}.bias"] = qkv_b[j * d : (j + 1) * d]
        out[pre + "attention.output.dense.weight"] = _np(b["attn"]["out"]["kernel"][i]).T
        out[pre + "attention.output.dense.bias"] = _np(b["attn"]["out"]["bias"][i])
        out[pre + "attention.output.LayerNorm.weight"] = _np(b["attn"]["norm"]["scale"][i])
        out[pre + "attention.output.LayerNorm.bias"] = _np(b["attn"]["norm"]["bias"][i])
        out[pre + "intermediate.dense.weight"] = _np(b["mlp"]["fc1"]["kernel"][i]).T
        out[pre + "intermediate.dense.bias"] = _np(b["mlp"]["fc1"]["bias"][i])
        out[pre + "output.dense.weight"] = _np(b["mlp"]["fc2"]["kernel"][i]).T
        out[pre + "output.dense.bias"] = _np(b["mlp"]["fc2"]["bias"][i])
        out[pre + "output.LayerNorm.weight"] = _np(b["norm"]["scale"][i])
        out[pre + "output.LayerNorm.bias"] = _np(b["norm"]["bias"][i])
    out["pooler.dense.weight"] = _np(params["pooler"]["kernel"]).T
    out["pooler.dense.bias"] = _np(params["pooler"]["bias"])
    return out


def to_keep_state_dict(params: dict, cfg: KEEPConfig) -> dict:
    """Full KEEP params → the released HF layout (inverse of
    ``convert_keep_state_dict``)."""
    out = {}
    out.update({f"visual.{k}": v for k, v in
                vit_to_timm_state_dict(params["visual"], cfg.vision).items()})
    head = params["visual_head"]
    out["visual_head.0.weight"] = _np(head["fc1"]["kernel"]).T
    out["visual_head.0.bias"] = _np(head["fc1"]["bias"])
    out["visual_head.2.weight"] = _np(head["fc2"]["kernel"]).T
    out["visual_head.2.bias"] = _np(head["fc2"]["bias"])
    out.update({f"text.{k}": v for k, v in
                bert_to_hf_state_dict(params["text"], cfg.text).items()})
    out["logit_scale"] = _np(params["logit_scale"])
    return out


def _config_dict(cfg: KEEPConfig) -> dict:
    return {
        "model_type": "keep",
        "projection_dim": cfg.projection_dim,
        "max_text_length": cfg.max_text_length,
        "vision_config": dataclasses.asdict(cfg.vision),
        "text_config": {
            "vocab_size": cfg.text.vocab_size,
            "hidden_size": cfg.text.hidden_size,
            "num_hidden_layers": cfg.text.num_hidden_layers,
            "num_attention_heads": cfg.text.num_attention_heads,
            "intermediate_size": cfg.text.intermediate_size,
            "max_position_embeddings": cfg.text.max_position_embeddings,
            "type_vocab_size": cfg.text.type_vocab_size,
            "layer_norm_eps": cfg.text.ln_eps,
            "pad_token_id": cfg.text.pad_token_id,
        },
    }


def save_pretrained(model_dir: str, params: dict, cfg: KEEPConfig) -> None:
    """Write ``config.json`` + ``pytorch_model.bin`` in the published layout
    (loadable by both the reference's AutoModel wrapper and
    ``KEEPModel.from_pretrained``)."""
    import torch

    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(_config_dict(cfg), f, indent=2)
    # note: np.ascontiguousarray promotes 0-d scalars to 1-d — use copy()
    sd = {k: torch.from_numpy(np.asarray(v, np.float32).copy())
          for k, v in to_keep_state_dict(params, cfg).items()}
    torch.save(sd, os.path.join(model_dir, "pytorch_model.bin"))


QUANTIZED_SUBDIR = "quantized"


def save_quantized(model_dir: str, params: dict, cfg: KEEPConfig) -> None:
    """Write the native int8 DEPLOY artifact: ``config.json`` + the
    (already-quantized) params pytree under ``<model_dir>/quantized/``
    (Orbax — dtype-preserving, so the int8 ``kernel_q`` tensors, fp32
    scales, and any SmoothQuant ``pre_scale`` rows round-trip exactly).

    Quantize ONCE offline — with SmoothQuant calibration data, which a
    serving process doesn't have — then ``KEEPModel.from_pretrained``
    auto-detects the artifact and ``keep_tpu.serve --int8`` serves it
    without re-quantizing. The weight payload is ~half the fp32
    ``pytorch_model.bin``. No torch-format counterpart exists by design:
    the reference has no quantized inference path to interop with."""
    from keep_tpu.quant import is_quantized
    from keep_tpu.train import checkpoint as ckpt

    if not is_quantized(params):
        raise ValueError(
            "save_quantized expects an already-quantized params tree "
            "(KEEPModel.quantize(...).params) — got unquantized kernels")
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(_config_dict(cfg), f, indent=2)
    ckpt.save(os.path.join(model_dir, QUANTIZED_SUBDIR), 0, params,
              keep_previous=False)
