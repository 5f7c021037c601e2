"""T5/mT5 encoder — the text trunk of the reference's ``mt5-*-ViT-*``
presets (hf_model.py:93-169 wraps ``AutoModel('google/mt5-*')`` and keeps
``.encoder`` only, hf_model.py:124-126; this is a native implementation of
the documented architecture, oracle-tested vs ``transformers.MT5EncoderModel``).

T5 specifics (all verified against the HF implementation):
- RMSNorm (no mean subtraction, no bias), computed in fp32;
- NO absolute position embeddings — a bucketed relative-position bias
  [H, S, S] added to the attention scores, computed once from the FIRST
  layer's bias table and shared by every layer;
- attention scores are NOT scaled by 1/sqrt(d_k) (T5 folds it into init);
- no biases on any linear; attention inner dim = num_heads*d_kv may differ
  from d_model;
- mT5 feed-forward is gated: ``wo(gelu_tanh(wi_0(x)) * wi_1(x))``.

TPU notes: the bias table lookup is a host-precomputable [S, S] bucket
matrix (static per sequence length) → one gather; blocks run under
``lax.scan`` over stacked params with the shared bias as a carry constant.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 250112  # mt5
    d_model: int = 768
    d_kv: int = 64
    num_heads: int = 12
    d_ff: int = 2048
    num_layers: int = 12
    rel_buckets: int = 32
    rel_max_distance: int = 128
    ln_eps: float = 1e-6
    gated_ff: bool = True  # mt5 'gated-gelu'; False = original T5 ReLU
    pad_token_id: int = 0

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


def rms_norm(p: dict, x: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * p["scale"].astype(
        x.dtype)


@functools.lru_cache(maxsize=8)
def relative_position_buckets(qlen: int, klen: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """HF ``_relative_position_bucket`` (bidirectional) as a static
    [qlen, klen] int table — host-precomputed, hashable per shape."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    ret = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return ret + np.where(is_small, rel, large)


def _attention(p: dict, x: Array, bias: Array, cfg: T5EncoderConfig) -> Array:
    b, s, _ = x.shape
    h, dk = cfg.num_heads, cfg.d_kv

    def proj(w, t):
        return jnp.dot(t, w.astype(t.dtype)).reshape(b, s, h, dk).transpose(
            0, 2, 1, 3)

    q = proj(p["q"], x)  # NOTE: no 1/sqrt(dk) — T5 semantics
    k = proj(p["k"], x)
    v = proj(p["v"], x)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.inner_dim)
    return jnp.dot(out, p["o"].astype(out.dtype))


def block(p: dict, x: Array, bias: Array, cfg: T5EncoderConfig) -> Array:
    x = x + _attention(p["attn"], rms_norm(p["ln1"], x, cfg.ln_eps), bias, cfg)
    y = rms_norm(p["ln2"], x, cfg.ln_eps)
    if cfg.gated_ff:
        hid = jax.nn.gelu(jnp.dot(y, p["wi_0"].astype(y.dtype)),
                          approximate=True)  # HF NewGELUActivation
        hid = hid * jnp.dot(y, p["wi_1"].astype(y.dtype))
    else:
        hid = jax.nn.relu(jnp.dot(y, p["wi"].astype(y.dtype)))
    return x + jnp.dot(hid, p["wo"].astype(hid.dtype))


def forward(params: dict, input_ids: Array,
            attention_mask: Array | None = None,
            cfg: T5EncoderConfig = T5EncoderConfig(), *,
            dtype=jnp.float32) -> dict:
    """[B, S] ids → {'last_hidden_state': [B, S, d_model]}."""
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    x = jnp.take(params["embed"], input_ids, axis=0).astype(dtype)

    buckets = jnp.asarray(relative_position_buckets(
        s, s, cfg.rel_buckets, cfg.rel_max_distance))
    # [S, S] buckets → [1, H, S, S] bias from the (shared) first-layer table
    bias = jnp.take(params["rel_bias"], buckets, axis=0).transpose(2, 0, 1)
    bias = bias[None].astype(jnp.float32)
    bias = bias + (1.0 - attention_mask[:, None, None, :].astype(
        jnp.float32)) * -1e9

    def body(carry, layer_params):
        return block(layer_params, carry, bias, cfg), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return {"last_hidden_state": rms_norm(params["final_ln"], x, cfg.ln_eps)}


def init(key: jax.Array, cfg: T5EncoderConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 10))
    d, di, df, l = cfg.d_model, cfg.inner_dim, cfg.d_ff, cfg.num_layers

    def nrm(k, shape, std):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    def stack(k, fi, fo, std=None):
        return nrm(k, (l, fi, fo), std or fi**-0.5)

    blocks = {
        "ln1": {"scale": jnp.ones((l, d), dtype)},
        "attn": {
            "q": stack(next(keys), d, di, (d * cfg.d_kv) ** -0.5),
            "k": stack(next(keys), d, di),
            "v": stack(next(keys), d, di),
            "o": stack(next(keys), di, d),
        },
        "ln2": {"scale": jnp.ones((l, d), dtype)},
        "wo": stack(next(keys), df, d),
    }
    if cfg.gated_ff:
        blocks["wi_0"] = stack(next(keys), d, df)
        blocks["wi_1"] = stack(next(keys), d, df)
    else:
        blocks["wi"] = stack(next(keys), d, df)
    return {
        "embed": nrm(next(keys), (cfg.vocab_size, d), 1.0),
        "rel_bias": nrm(next(keys), (cfg.rel_buckets, cfg.num_heads),
                        di**-0.5),
        "blocks": blocks,
        "final_ln": {"scale": jnp.ones((d,), dtype)},
    }


def convert_hf_t5_encoder(sd, cfg: T5EncoderConfig) -> dict:
    """``transformers.(M)T5EncoderModel`` state dict → our pytree."""

    def g(k):
        v = sd[k]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    l = cfg.num_layers
    pre = "encoder.block.{}."

    def stack(fmt, transpose=True):
        return np.stack([g(pre.format(i) + fmt).T if transpose
                         else g(pre.format(i) + fmt) for i in range(l)])

    blocks = {
        "ln1": {"scale": stack("layer.0.layer_norm.weight", transpose=False)},
        "attn": {
            "q": stack("layer.0.SelfAttention.q.weight"),
            "k": stack("layer.0.SelfAttention.k.weight"),
            "v": stack("layer.0.SelfAttention.v.weight"),
            "o": stack("layer.0.SelfAttention.o.weight"),
        },
        "ln2": {"scale": stack("layer.1.layer_norm.weight", transpose=False)},
        "wo": stack("layer.1.DenseReluDense.wo.weight"),
    }
    if cfg.gated_ff:
        blocks["wi_0"] = stack("layer.1.DenseReluDense.wi_0.weight")
        blocks["wi_1"] = stack("layer.1.DenseReluDense.wi_1.weight")
    else:
        blocks["wi"] = stack("layer.1.DenseReluDense.wi.weight")
    return {
        "embed": g("shared.weight") if "shared.weight" in sd
        else g("encoder.embed_tokens.weight"),
        "rel_bias": g("encoder.block.0.layer.0.SelfAttention"
                      ".relative_attention_bias.weight"),
        "blocks": blocks,
        "final_ln": {"scale": g("encoder.final_layer_norm.weight")},
    }
