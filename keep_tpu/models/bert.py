"""BERT text encoder, TPU-native.

Matches HF ``BertModel`` semantics as used by the reference
(quick_start/keep_inference.py:49-50,60-62 and the training text tower
``PATH_BERT``, training/path_open_clip/model/knowledge_bert.py:17-65):

- word + learned-position + token-type embeddings, LayerNorm(eps=1e-12),
- 12 post-LN encoder blocks (attn → add&LN → GELU-MLP → add&LN),
- additive padding mask on attention scores,
- tanh pooler over the [CLS] position (``pooler_output``).

Per-layer params are stacked on a leading axis and scanned, like the ViT.

Param pytree layout (D=hidden, F=intermediate, L=layers):
  embeddings: {word [V,D], position [Pmax,D], token_type [T,D],
               norm {scale,bias [D]}}
  blocks:     {attn:{qkv:{kernel [L,D,3D], bias [L,3D]},
               out:{kernel [L,D,D], bias [L,D]}, norm:{scale,bias [L,D]}},
               mlp:{fc1:{kernel [L,D,F], bias [L,F]},
               fc2:{kernel [L,F,D], bias [L,D]}}, norm:{scale,bias [L,D]}}
  pooler:     {kernel [D,D], bias [D]}
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from keep_tpu.configs import BertConfig
from keep_tpu.ops.nn import layer_norm, linear, mha_attention, mlp

Array = jax.Array

# Additive mask value for padded keys. HF adds ``finfo(dtype).min``; any value
# that zeroes the softmax weight is equivalent at fp32 tolerance, and a finite
# moderate constant is safer under bf16 arithmetic.
MASK_VALUE = -1e9


def block(p: dict, x: Array, mask_bias: Array, cfg: BertConfig, *,
          use_flash: bool, gelu_approx: bool = False,
          collect_ln_stats: bool = False) -> Array:
    """``collect_ln_stats=True`` (calibration only — quant.smooth_bert) also
    returns per-channel abs-max of the qkv input (the block input) and the
    fc1 input (the attention sub-block's exit LN), pad positions zeroed."""
    b, s, d = x.shape
    h, dh = cfg.num_attention_heads, cfg.head_dim

    quantized = "kernel_q" in p["attn"]["qkv"]
    if collect_ln_stats and quantized:
        raise ValueError("LN-stats calibration needs unquantized params")
    if (
        use_flash and gelu_approx and quantized
        and "kernel_q" in p["attn"]["out"]
        and "kernel_q" in p["mlp"]["fc1"] and "kernel_q" in p["mlp"]["fc2"]
    ):
        # int8 megakernel path (mirrors vit.block): the whole post-LN
        # attention sub-block in one kernel (int8 qkv → masked MHA → int8
        # out → LN(x+·)), then the int8 MLP pair with the exit LN fused —
        # each layer reads/writes the [B, S, D] stream exactly twice.
        # SmoothQuant pre_scale leaves (quant.smooth_bert) ride into the
        # kernels' quantize steps.
        from keep_tpu.kernels.qblock import quantized_attention_block_postln
        from keep_tpu.kernels.qmlp import quantized_mlp_bsd

        x = quantized_attention_block_postln(
            x, mask_bias.reshape(b, s), p["attn"]["norm"],
            p["attn"]["qkv"], p["attn"]["out"], num_heads=h, eps=cfg.ln_eps,
        )
        m = p["mlp"]
        return quantized_mlp_bsd(
            x,
            m["fc1"]["kernel_q"], m["fc1"]["scale"], m["fc1"]["bias"],
            m["fc2"]["kernel_q"], m["fc2"]["scale"], m["fc2"]["bias"],
            out_dtype=x.dtype,
            ln_scale=p["norm"]["scale"], ln_bias=p["norm"]["bias"],
            eps=cfg.ln_eps, post_ln=True,
            pre_scale1=m["fc1"].get("pre_scale"),
        )
    if collect_ln_stats:
        # pad positions carry embedding noise irrelevant to real outputs
        # ([CLS] pooling + key masking) — exclude them from the abs-max
        valid = (mask_bias.reshape(b, s) == 0).astype(jnp.float32)[..., None]
        stat_qkv = jnp.max(jnp.abs(x.astype(jnp.float32)) * valid, axis=(0, 1))
    if use_flash:
        from keep_tpu.kernels.flash_attention import attention_qkv_slab

        attn = attention_qkv_slab(
            linear(p["attn"]["qkv"], x),
            key_bias=mask_bias.reshape(b, s), num_heads=h,
        )
    else:
        qkv = linear(p["attn"]["qkv"], x)
        qkv = qkv.reshape(b, s, 3, h, dh).transpose(2, 0, 3, 1, 4)
        attn = mha_attention(qkv[0], qkv[1], qkv[2], bias=mask_bias, use_flash=False)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
    attn = linear(p["attn"]["out"], attn)
    x = layer_norm(p["attn"]["norm"], x + attn, cfg.ln_eps)

    y = mlp(p["mlp"], x, gelu_approx=gelu_approx)
    out = layer_norm(p["norm"], x + y, cfg.ln_eps)
    if collect_ln_stats:
        stat_fc1 = jnp.max(jnp.abs(x.astype(jnp.float32)) * valid, axis=(0, 1))
        return out, {"qkv": stat_qkv, "fc1": stat_fc1}
    return out


def forward(
    params: dict,
    input_ids: Array,
    attention_mask: Array | None = None,
    token_type_ids: Array | None = None,
    cfg: BertConfig = BertConfig(),
    *,
    dtype: jnp.dtype = jnp.float32,
    use_flash: bool = False,
    gelu_approx: bool = False,
    remat: bool = False,
    position_ids: Array | None = None,
    act_sharding=None,
    ln_stats: bool = False,
) -> dict:
    """[B, S] int token ids → {'last_hidden_state': [B,S,D], 'pooler_output': [B,D]}.

    ``position_ids`` overrides the default 0..S-1 positions (RoBERTa-family
    towers derive positions from the padding mask — ``models.hf_text``).
    ``act_sharding`` pins the [B, S, D] stream at block boundaries
    (Megatron-SP via GSPMD constraints — ``parallel.sp``); an identity.
    ``ln_stats=True`` returns ``(outputs, {"qkv": [L, D], "fc1": [L, D]})``
    per-layer abs-max of the int8 path's quantize inputs — the calibration
    pass for ``quant.smooth_bert``."""
    b, s = input_ids.shape
    if s > cfg.max_position_embeddings:
        # the position-table slice would silently shorten and fail later
        # with an opaque broadcast error
        raise ValueError(
            f"sequence length {s} exceeds max_position_embeddings="
            f"{cfg.max_position_embeddings}; truncate at the tokenizer")
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    if token_type_ids is None:
        token_type_ids = jnp.zeros((b, s), jnp.int32)

    emb = params["embeddings"]
    if position_ids is None:
        pos = emb["position"][None, :s]
    else:
        pos = jnp.take(emb["position"], position_ids, axis=0)
    x = (
        jnp.take(emb["word"], input_ids, axis=0)
        + pos
        + jnp.take(emb["token_type"], token_type_ids, axis=0)
    )
    x = layer_norm(emb["norm"], x, cfg.ln_eps).astype(dtype)

    # [B, 1, 1, S] additive bias on key positions.
    mask_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * MASK_VALUE

    block_fn = functools.partial(block, cfg=cfg, use_flash=use_flash,
                                 gelu_approx=gelu_approx,
                                 collect_ln_stats=ln_stats)
    if remat:
        block_fn = jax.checkpoint(block_fn)

    if act_sharding is not None:
        x = jax.lax.with_sharding_constraint(x, act_sharding)

    def scan_body(carry, layer_params):
        out = block_fn(layer_params, carry, mask_bias)
        out, extra = (out[0], out[1]) if ln_stats else (out, None)
        if act_sharding is not None:
            out = jax.lax.with_sharding_constraint(out, act_sharding)
        return out, extra

    x, stats = jax.lax.scan(scan_body, x, params["blocks"])

    out = {"last_hidden_state": x}
    if "pooler" in params:  # absent for add_pooling_layer=False towers
        out["pooler_output"] = jnp.tanh(linear(params["pooler"], x[:, 0]))
    return (out, stats) if ln_stats else out


def init(key: jax.Array, cfg: BertConfig, dtype: jnp.dtype = jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 16))
    d, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers

    def normal(key, shape, std=0.02):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    def lin(key, fan_in, fan_out, layers=None):
        shape = (fan_in, fan_out) if layers is None else (layers, fan_in, fan_out)
        bshape = (fan_out,) if layers is None else (layers, fan_out)
        return {
            "kernel": normal(key, shape),
            "bias": jnp.zeros(bshape, dtype),
        }

    def ln_params(shape):
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    return {
        "embeddings": {
            "word": normal(next(keys), (cfg.vocab_size, d)),
            "position": normal(next(keys), (cfg.max_position_embeddings, d)),
            "token_type": normal(next(keys), (cfg.type_vocab_size, d)),
            "norm": ln_params((d,)),
        },
        "blocks": {
            "attn": {
                "qkv": lin(next(keys), d, 3 * d, layers=l),
                "out": lin(next(keys), d, d, layers=l),
                "norm": ln_params((l, d)),
            },
            "mlp": {
                "fc1": lin(next(keys), d, f, layers=l),
                "fc2": lin(next(keys), f, d, layers=l),
            },
            "norm": ln_params((l, d)),
        },
        "pooler": lin(next(keys), d, d),
    }
