"""PMC-CLIP — RN50 image tower + BERT text encoder + image-text fusion
module with an MLM head (alternative baseline family; reference
training/path_open_clip/model/pmc_clip.py:81-269).

Semantics:
- image features from an RN tower (our ModifiedResNet / RN trunk);
- text features = BERT last_hidden_state at the [CLS] position (the PubMedBERT
  tokenizer's CLS id) @ text_projection;
- fusion: concat [text tokens, img_special_token, image feature] along the
  sequence, run a small (non-causal) transformer, drop the 2 image slots;
- MLM head: log-softmax(fused @ mlm_projection) against masked-token labels.

Our rebuild returns plain tensors instead of the reference's ``eval(key)``
dict construction (SURVEY §2.2 flags it as dark magic).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.configs import BertConfig
from keep_tpu.models import bert
from keep_tpu.models.resnet import ModifiedResNetConfig
from keep_tpu.ops.nn import l2_normalize, layer_norm, linear, mha_attention, mlp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PMCCLIPConfig:
    embed_dim: int = 768
    vision: ModifiedResNetConfig = dataclasses.field(
        default_factory=lambda: ModifiedResNetConfig(output_dim=768)
    )
    text: BertConfig = dataclasses.field(default_factory=BertConfig)
    fusion_layers: int = 4
    fusion_heads: int = 8
    context_length: int = 77
    cls_id: int = 2  # PubMedBERT [CLS]
    mlm: bool = True
    ln_eps: float = 1e-5
    mlp_ratio: float = 4.0


def _fusion_block(p, x, cfg):
    b, s, d = x.shape
    heads = cfg.fusion_heads
    dh = d // heads
    y = layer_norm(p["norm1"], x, cfg.ln_eps)
    qkv = linear(p["attn"]["qkv"], y).reshape(b, s, 3, heads, dh)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    attn = mha_attention(q, k, v)
    x = x + linear(p["attn"]["proj"], attn.transpose(0, 2, 1, 3).reshape(b, s, d))
    return x + mlp(p["mlp"], layer_norm(p["norm2"], x, cfg.ln_eps))


def encode_image(params, pixels, cfg: PMCCLIPConfig, *, dtype=jnp.float32) -> Array:
    from keep_tpu.models import resnet

    return resnet.forward(params["visual"], pixels, cfg.vision, dtype=dtype)


def encode_text(
    params,
    input_ids: Array,
    attention_mask: Array,
    image_features: Array,
    cfg: PMCCLIPConfig,
    *,
    dtype=jnp.float32,
) -> dict:
    """→ {text_features, bert_prediction (log-probs) or None}.

    The reference encodes text UNMASKED — `self.text_encoder(input_ids=...)`
    with no attention_mask (pmc_clip.py:217-221), so pad positions attend;
    reproduced as-is for checkpoint parity (``attention_mask`` is accepted
    for signature uniformity but deliberately not applied)."""
    del attention_mask  # reference parity: pads attend
    out = bert.forward(params["text"], input_ids, None,
                       cfg=cfg.text, dtype=dtype)
    hidden = out["last_hidden_state"]  # [B, S, W]
    b, s, w = hidden.shape

    # features at the [CLS] token position (pmc_clip.py:222-224)
    cls_pos = jnp.argmax((input_ids == cfg.cls_id).astype(jnp.int32), axis=1)
    pooled = hidden[jnp.arange(b), cls_pos]
    text_features = jnp.dot(pooled, params["text_projection"].astype(pooled.dtype),
                            preferred_element_type=jnp.float32).astype(dtype)

    # fusion: [text tokens, img_special_token, image feature]
    img = image_features[:, None, :].astype(dtype)
    special = jnp.broadcast_to(params["img_special_token"].astype(dtype),
                               (b, 1, w))
    x = jnp.concatenate([hidden.astype(dtype), special, img], axis=1)

    def body(carry, lp):
        return _fusion_block(lp, carry, cfg), None

    x, _ = jax.lax.scan(body, x, params["fusion"])
    x = x[:, :-2]  # drop [img_special_token, img]

    bert_prediction = None
    if cfg.mlm and "mlm_projection" in params:
        logits = jnp.dot(x, params["mlm_projection"].astype(x.dtype),
                         preferred_element_type=jnp.float32)
        bert_prediction = jax.nn.log_softmax(logits, axis=-1)
    return {"text_features": text_features, "bert_prediction": bert_prediction}


def forward(params, pixels, input_ids, attention_mask, cfg: PMCCLIPConfig,
            **kw) -> dict:
    image_features = l2_normalize(
        encode_image(params, pixels, cfg, **kw).astype(jnp.float32)
    )
    text_out = encode_text(params, input_ids, attention_mask, image_features,
                           cfg, **kw)
    return {
        "image_features": image_features,
        "text_features": l2_normalize(text_out["text_features"].astype(jnp.float32)),
        "bert_prediction": text_out["bert_prediction"],
        "logit_scale": jnp.exp(params["logit_scale"]),
    }


def mlm_loss(bert_prediction: Array, labels: Array, ignore_id: int = 0) -> Array:
    """Masked-LM NLL over non-pad label positions (the MLM objective the
    reference trains with)."""
    ll = jnp.take_along_axis(bert_prediction, labels[..., None], axis=-1)[..., 0]
    mask = (labels != ignore_id).astype(jnp.float32)
    return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def init(key: jax.Array, cfg: PMCCLIPConfig, dtype=jnp.float32) -> dict:
    from keep_tpu.models import resnet

    if cfg.embed_dim != cfg.text.hidden_size:
        # the fusion stream concatenates [text hidden, img_special_token,
        # image feature] at ONE width (reference pmc_clip.py:227-231:
        # embed_dim == text width == 768); a mismatch would break the
        # broadcast/concat deep inside encode_text
        raise ValueError(
            f"PMC-CLIP requires embed_dim ({cfg.embed_dim}) == "
            f"text.hidden_size ({cfg.text.hidden_size})")
    keys = iter(jax.random.split(key, 12))
    w = cfg.text.hidden_size
    normal = lambda k, shape, std: (jax.random.normal(k, shape) * std).astype(dtype)

    def block(k):
        ks = jax.random.split(k, 4)
        f = int(w * cfg.mlp_ratio)
        lin = lambda kk, fi, fo: {
            "kernel": normal(kk, (fi, fo), fi**-0.5),
            "bias": jnp.zeros((fo,), dtype),
        }
        ln = lambda: {"scale": jnp.ones((w,), dtype), "bias": jnp.zeros((w,), dtype)}
        return {
            "norm1": ln(),
            "attn": {"qkv": lin(ks[0], w, 3 * w), "proj": lin(ks[1], w, w)},
            "norm2": ln(),
            "mlp": {"fc1": lin(ks[2], w, f), "fc2": lin(ks[3], f, w)},
        }

    blocks = [block(k) for k in jax.random.split(next(keys), cfg.fusion_layers)]
    fusion = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params = {
        "visual": resnet.init(next(keys), cfg.vision, dtype),
        "text": bert.init(next(keys), cfg.text, dtype),
        "text_projection": normal(next(keys), (w, cfg.embed_dim), w**-0.5),
        "img_special_token": jnp.zeros((1, 1, cfg.embed_dim), dtype),
        "fusion": fusion,
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }
    if cfg.mlm:
        params["mlm_projection"] = normal(
            next(keys), (w, cfg.text.vocab_size), w**-0.5
        )
    return params
