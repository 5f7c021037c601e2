"""OpenCLIP-style causal text transformer (the fused text tower of the
reference's ``CLIP`` class — training/path_open_clip/transformer.py:506-631).

Semantics: token embedding + learned positions, pre-LN blocks (no
LayerScale), causal attention, final LN, pooling at the ARGMAX token id
(the EOT token has the highest id in the CLIP BPE vocab), then a text
projection matrix.

Param pytree: {token_embedding [V,W], pos_embed [CTX,W],
blocks {** vit-style stacked, no ls}, ln_final {scale,bias},
text_projection [W,E]}.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from keep_tpu.ops.nn import layer_norm, linear, mha_attention, mlp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TextTransformerConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 512
    ln_eps: float = 1e-5
    act: str = "gelu"  # 'gelu' | 'quick_gelu' (OpenAI '-quickgelu' arches)
    # CustomResidualAttentionBlock options (transformer.py:246-285) — the
    # reference's experimental block variant (unused by the KEEP config):
    scaled_cosine: bool = False  # cosine attention w/ learned per-head temp
    scale_heads: bool = False  # learned per-head output gain
    scale_attn: bool = False  # extra LN on the attention output (ln_attn)
    scale_fc: bool = False  # extra LN inside the MLP, after fc1 (mlp.ln)

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


def _block(p, x, causal_bias, cfg: TextTransformerConfig):
    b, s, d = x.shape
    h, dh = cfg.heads, cfg.head_dim
    y = layer_norm(p["norm1"], x, cfg.ln_eps)
    qkv = linear(p["attn"]["qkv"], y).reshape(b, s, 3, h, dh).transpose(2, 0, 3, 1, 4)
    if "logit_scale" in p["attn"]:  # scaled-cosine custom block
        from keep_tpu.ops.nn import cosine_attention

        attn = cosine_attention(
            qkv[0], qkv[1], qkv[2], p["attn"]["logit_scale"],
            bias=causal_bias, head_scale=p["attn"].get("head_scale"),
        )
    else:
        attn = mha_attention(qkv[0], qkv[1], qkv[2], bias=causal_bias)
        if "head_scale" in p["attn"]:  # scale_heads without scaled_cosine
            attn = attn * p["attn"]["head_scale"].reshape(1, -1, 1, 1).astype(
                attn.dtype)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
    attn = linear(p["attn"]["proj"], attn)
    if "ln_attn" in p:  # scale_attn: LN on the attention branch output
        attn = layer_norm(p["ln_attn"], attn, cfg.ln_eps)
    x = x + attn
    y = layer_norm(p["norm2"], x, cfg.ln_eps)
    if "ln" in p["mlp"]:  # scale_fc: LN after fc1, before the GELU
        from keep_tpu.ops.nn import gelu

        hid = layer_norm(p["mlp"]["ln"], linear(p["mlp"]["fc1"], y), cfg.ln_eps)
        if cfg.act == "quick_gelu":
            from keep_tpu.ops.nn import quick_gelu

            return x + linear(p["mlp"]["fc2"], quick_gelu(hid))
        return x + linear(p["mlp"]["fc2"], gelu(hid))
    return x + mlp(p["mlp"], y, act=cfg.act)


def forward(
    params: dict,
    input_ids: Array,
    cfg: TextTransformerConfig,
    *,
    dtype: jnp.dtype = jnp.float32,
) -> Array:
    """[B, S] BPE token ids → [B, output_dim] EOT-pooled projected features."""
    b, s = input_ids.shape
    x = jnp.take(params["token_embedding"], input_ids, axis=0).astype(dtype)
    x = x + params["pos_embed"][:s].astype(dtype)

    causal = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]

    def body(carry, layer_params):
        return _block(layer_params, carry, causal, cfg), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(params["ln_final"], x, cfg.ln_eps)

    eot = jnp.argmax(input_ids, axis=-1)  # EOT = highest token id
    pooled = x[jnp.arange(b), eot]
    return jnp.dot(
        pooled, params["text_projection"].astype(pooled.dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def init(key: jax.Array, cfg: TextTransformerConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 8))
    w, l, f = cfg.width, cfg.layers, int(cfg.width * cfg.mlp_ratio)

    def normal(key, shape, std):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    def lin(key, fi, fo, std):
        return {"kernel": normal(key, (l, fi, fo), std),
                "bias": jnp.zeros((l, fo), dtype)}

    # the reference's TextTransformer.init_parameters stds
    # (transformer.py:557-567): depth-scaled residual-out projections
    proj_std = w**-0.5 * (2 * l) ** -0.5
    attn_std = w**-0.5
    fc_std = (2 * w) ** -0.5

    ln = lambda: {"scale": jnp.ones((l, w), dtype), "bias": jnp.zeros((l, w), dtype)}
    attn = {"qkv": lin(next(keys), w, 3 * w, attn_std),
            "proj": lin(next(keys), w, w, proj_std)}
    if cfg.scaled_cosine:
        # per-head log temperature, init log(10) (transformer.py:116)
        attn["logit_scale"] = jnp.full((l, cfg.heads), jnp.log(10.0), dtype)
    if cfg.scale_heads:
        attn["head_scale"] = jnp.ones((l, cfg.heads), dtype)
    blocks = {
        "norm1": ln(),
        "attn": attn,
        "norm2": ln(),
        "mlp": {"fc1": lin(next(keys), w, f, fc_std),
                "fc2": lin(next(keys), f, w, proj_std)},
    }
    if cfg.scale_attn:
        blocks["ln_attn"] = ln()
    if cfg.scale_fc:
        blocks["mlp"]["ln"] = {"scale": jnp.ones((l, f), dtype),
                               "bias": jnp.zeros((l, f), dtype)}
    return {
        "token_embedding": normal(next(keys), (cfg.vocab_size, w), 0.02),
        "pos_embed": normal(next(keys), (cfg.context_length, w), 0.01),
        "blocks": blocks,
        "ln_final": {"scale": jnp.ones((w,), dtype), "bias": jnp.zeros((w,), dtype)},
        "text_projection": normal(next(keys), (w, cfg.output_dim), w**-0.5),
    }


def convert_openclip_text(sd, cfg: TextTransformerConfig) -> dict:
    """OpenCLIP/OpenAI text-tower state dict → pytree (keys:
    token_embedding.weight, positional_embedding, transformer.resblocks.N.*,
    ln_final.*, text_projection). Also picks up the
    CustomResidualAttentionBlock extras when present (attn.logit_scale,
    attn.head_scale, ln_attn.*, mlp.ln.* — transformer.py:246-285)."""
    import numpy as np

    g = lambda k: (sd[k].detach().cpu().numpy() if hasattr(sd[k], "detach") else np.asarray(sd[k]))
    L = cfg.layers

    def stack(fmt, transpose=False):
        mats = [g(fmt.format(i)) for i in range(L)]
        return np.stack([m.T if transpose else m for m in mats])

    pre = "transformer.resblocks.{}."
    out = {
        "token_embedding": g("token_embedding.weight"),
        "pos_embed": g("positional_embedding"),
        "blocks": {
            "norm1": {"scale": stack(pre + "ln_1.weight"), "bias": stack(pre + "ln_1.bias")},
            "attn": {
                "qkv": {"kernel": stack(pre + "attn.in_proj_weight", transpose=True),
                        "bias": stack(pre + "attn.in_proj_bias")},
                "proj": {"kernel": stack(pre + "attn.out_proj.weight", transpose=True),
                         "bias": stack(pre + "attn.out_proj.bias")},
            },
            "norm2": {"scale": stack(pre + "ln_2.weight"), "bias": stack(pre + "ln_2.bias")},
            "mlp": {
                "fc1": {"kernel": stack(pre + "mlp.c_fc.weight", transpose=True),
                        "bias": stack(pre + "mlp.c_fc.bias")},
                "fc2": {"kernel": stack(pre + "mlp.c_proj.weight", transpose=True),
                        "bias": stack(pre + "mlp.c_proj.bias")},
            },
        },
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
    }
    if pre.format(0) + "attn.logit_scale" in sd:
        out["blocks"]["attn"]["logit_scale"] = stack(
            pre + "attn.logit_scale").reshape(L, -1)
    if pre.format(0) + "attn.head_scale" in sd:
        out["blocks"]["attn"]["head_scale"] = stack(
            pre + "attn.head_scale").reshape(L, -1)
    if pre.format(0) + "ln_attn.weight" in sd:
        out["blocks"]["ln_attn"] = {"scale": stack(pre + "ln_attn.weight"),
                                    "bias": stack(pre + "ln_attn.bias")}
    if pre.format(0) + "mlp.ln.weight" in sd:
        out["blocks"]["mlp"]["ln"] = {"scale": stack(pre + "mlp.ln.weight"),
                                      "bias": stack(pre + "mlp.ln.bias")}
    return out
