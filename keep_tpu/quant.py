"""Post-training int8 quantization for the inference path.

v5e's MXU runs int8×int8→int32 at twice the bf16 rate (the reference has no
quantized path at all — this is a beyond-parity capability). Scheme:
per-output-channel abs-max weight scales, dynamic per-token activation
scales, fp32 dequantize epilogue. ALL dense matmul kernels named in
``DEFAULT_TARGETS`` are quantized — the attention qkv/proj projections, the
MLP fc1/fc2 pairs (which includes the KEEP ``visual_head`` projection MLP),
and the patch embed; LayerNorms, biases, embeddings, poolers, and the
softmax(QKᵀ)V contractions themselves stay high-precision. Measured: dense
matmuls 1.67× faster than bf16 including the quantize/dequantize work.

``quantize_linear_weights(params)`` rewrites matmul ``kernel`` leaves into
``{kernel_q: int8, scale: fp32}``; ``ops.nn.linear`` dispatches on the
presence of ``kernel_q`` so every model in the framework runs quantized with
no forward-code changes.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# pytree keys whose 'kernel' should be quantized (the big matmuls); heads,
# poolers and embeddings stay fp32/bf16.
DEFAULT_TARGETS = ("qkv", "proj", "fc1", "fc2", "out", "patch_embed")

# MoE expert matmuls (wi/wo under a 'moe' subtree) carry the trunk's FLOPs
# when cfg.vision.moe_experts > 0; the router stays fp32 (tiny, and its
# argmax decides token placement — quantization noise there moves tokens).
MOE_TARGETS = DEFAULT_TARGETS + ("wi", "wo")


def is_quantized(params) -> bool:
    """True if any leaf-dict in the pytree carries a ``kernel_q`` (i.e. the
    tree already went through `quantize_linear_weights`) — the dispatch
    marker ``ops.nn.linear`` keys on, exposed so save/serve paths can fail
    fast instead of double-quantizing int8 kernels."""
    found = False

    def walk(node):
        nonlocal found
        if isinstance(node, dict):
            if "kernel_q" in node:
                found = True
                return
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            # mirror quantize_linear_weights' visit: quantized linears can
            # sit inside stacked-layer lists/tuples too
            for v in node:
                walk(v)

    walk(params)
    return found


def quantize_kernel(kernel: Array) -> dict:
    """[..., K, N] fp kernel → int8 + per-output-channel scale [..., N].

    For stacked per-layer kernels [L, K, N] the scale is per (layer, column).
    """
    k = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2, keepdims=True)  # over K
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return {"kernel_q": q, "scale": scale.squeeze(-2)}


def quantize_linear_weights(
    params, targets: Sequence[str] = DEFAULT_TARGETS,
    weight_only: Sequence[str] = (),
) -> "object":
    """Rewrite targeted linear params in a pytree of nested dicts.

    Name matching is PATH-aware to keep the stated policy on every tower:
    ``proj`` means the attention OUTPUT projection (parent dict ``attn``) —
    projection HEADS that happen to be named ``proj`` (CoCa's text head,
    the EVA trunk head) stay high-precision; and nothing inside a
    ``rel_pos`` subtree is touched (the vit_relpos bias MLP is a K=2
    coordinate network whose per-token int8 quantization would corrupt
    every head's attention bias for negligible FLOPs).

    Targets also named in ``weight_only`` are marked W8A16: the int8
    kernel is dequantized to the activation dtype inside the consuming
    einsum (activations never quantized). The marker is an EMPTY-TUPLE
    leaf ``w_only`` — structural (visible to `"w_only" in p` under jit),
    zero pytree leaves. Used for MoE expert wi/wo, whose int8 win is
    expert-weight HBM traffic, not MXU rate (docs/PERF.md)."""

    def eligible(node, name, parent, ancestors):
        if not ("kernel" in node and "bias" in node and name in targets):
            return False
        if "rel_pos" in ancestors:
            return False
        if name == "proj" and parent != "attn":
            return False
        if name in ("wi", "wo") and parent != "moe":
            return False
        return True

    def visit(node, name="", ancestors=()):
        if isinstance(node, dict):
            parent = ancestors[-1] if ancestors else ""
            if eligible(node, name, parent, ancestors):
                q = quantize_kernel(node["kernel"])
                if name in weight_only:
                    q["w_only"] = ()
                # keep any sibling leaves (adapters, cached transforms) —
                # only 'kernel' is replaced by (kernel_q, scale)
                rest = {k: v for k, v in node.items() if k != "kernel"}
                return {**rest, **q}
            return {k: visit(v, k, ancestors + (name,))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(visit(v, name, ancestors) for v in node)
        return node

    return visit(params)


def quantization_error(params, qparams) -> dict:
    """Max relative weight reconstruction error per quantized kernel."""
    out = {}

    def visit(a, b, path=""):
        if isinstance(a, dict):
            if "kernel" in a and isinstance(b, dict) and "kernel_q" in b:
                k = np.asarray(a["kernel"], np.float32)
                r = np.asarray(b["kernel_q"], np.float32) * np.expand_dims(
                    np.asarray(b["scale"], np.float32), -2
                )
                denom = np.abs(k).max() or 1.0
                out[path] = float(np.abs(k - r).max() / denom)
                return
            for key in a:
                if isinstance(b, dict) and key in b:
                    visit(a[key], b[key], f"{path}/{key}")

    visit(params, qparams)
    return out


def smooth_scales(act_amax: Array, kernel: Array, alpha: float = 0.5) -> Array:
    """SmoothQuant-style per-input-channel equalization scale.

    ``s_j = act_amax_j^alpha / w_amax_j^(1-alpha)`` (Xiao et al., 2022),
    normalized to geometric mean 1 so overall magnitudes are untouched;
    channels with degenerate stats keep s=1. ``kernel`` is [..., K, N] and
    ``act_amax`` [..., K] (per input channel)."""
    a = jnp.maximum(jnp.asarray(act_amax, jnp.float32), 1e-8)
    w = jnp.maximum(
        jnp.max(jnp.abs(jnp.asarray(kernel, jnp.float32)), axis=-1), 1e-8
    )
    s = a**alpha / w ** (1.0 - alpha)
    s = s / jnp.exp(jnp.mean(jnp.log(s), axis=-1, keepdims=True))
    return jnp.clip(s, 1e-3, 1e3)


def _fold_smooth(norm: dict, lin: dict, act_amax: Array, alpha: float):
    """Divide the LN affine by s, multiply the kernel's input rows by s —
    mathematically exact (LN(x)/s) @ (s·W) == LN(x) @ W, but the activation
    outliers migrate into the weights where per-channel scales absorb them."""
    s = smooth_scales(act_amax, lin["kernel"], alpha)
    norm_dtype = norm["scale"].dtype
    k_dtype = lin["kernel"].dtype
    new_norm = {
        "scale": (norm["scale"].astype(jnp.float32) / s).astype(norm_dtype),
        "bias": (norm["bias"].astype(jnp.float32) / s).astype(norm_dtype),
    }
    new_lin = {
        **lin,
        "kernel": (lin["kernel"].astype(jnp.float32) * s[..., None]).astype(
            k_dtype),
    }
    return new_norm, new_lin


def smooth_vit(params: dict, stats: dict, alpha: float = 0.5) -> dict:
    """Migrate activation outliers into weights at the ViT's two exclusive
    LN→linear edges (norm1→qkv, norm2→fc1) ahead of W8A8 quantization.

    ``stats`` comes from ``vit.forward(..., ln_stats=True)`` on a
    calibration batch: per-layer per-channel abs-max of the LN outputs —
    exactly the tensors the int8 path quantizes per token. The fold is
    exact in fp; the payoff is that dynamic per-token activation quant no
    longer spends its 8 bits on a few outlier channels (the classic
    transformer outlier pathology). Only these two edges are smoothable:
    proj's input (attention output) and fc2's input (GELU output) have no
    preceding affine op to fold into, and post-LN BERT's LN outputs also
    feed residuals, so folding there would change the model — the BERT
    tower uses the pre_scale form instead (``smooth_bert``).
    """
    p = dict(params)
    blocks = dict(p["blocks"])
    attn = dict(blocks["attn"])
    mlp_ = dict(blocks["mlp"])
    n1, qkv = _fold_smooth(blocks["norm1"], attn["qkv"], stats["qkv"], alpha)
    n2, fc1 = _fold_smooth(blocks["norm2"], mlp_["fc1"], stats["fc1"], alpha)
    blocks["norm1"], blocks["norm2"] = n1, n2
    attn["qkv"], mlp_["fc1"] = qkv, fc1
    blocks["attn"], blocks["mlp"] = attn, mlp_
    p["blocks"] = blocks
    return p


def _prescale_lin(lin: dict, act_amax: Array, alpha: float) -> dict:
    """Smooth a linear WITHOUT a foldable preceding affine: multiply the
    kernel's input rows by s offline and store ``pre_scale = 1/s`` to be
    applied to the activation inside the per-token quantize —
    ``(x/s) @ (s·W) == x @ W`` exactly, but the int8 rounding is spent on
    the equalized tensor. ``ops.nn.linear`` and the int8 megakernels
    (qblock post-LN, qmlp ``pre_scale1``) honor the leaf."""
    s = smooth_scales(act_amax, lin["kernel"], alpha)
    k_dtype = lin["kernel"].dtype
    return {
        **lin,
        "kernel": (lin["kernel"].astype(jnp.float32) * s[..., None]).astype(
            k_dtype),
        "pre_scale": (1.0 / s).astype(jnp.float32),
    }


def smooth_bert(params: dict, stats: dict, alpha: float = 0.5) -> dict:
    """SmoothQuant for the post-LN BERT tower (qkv and fc1 edges).

    Unlike the pre-LN ViT (``smooth_vit``), BERT's qkv/fc1 inputs also feed
    residual paths, so dividing the preceding LN affine by s would change
    the model. Instead the equalization rides WITH each quantized linear as
    a ``pre_scale`` leaf (see ``_prescale_lin``) — one extra per-channel
    VPU multiply inside the quantize step, numerics otherwise identical.

    ``stats`` comes from ``bert.forward(..., ln_stats=True)`` on a
    calibration batch: per-layer [L, D] abs-max of the qkv input (the block
    input stream) and the fc1 input (the attention sub-block's exit LN),
    pad positions masked out."""
    p = dict(params)
    blocks = dict(p["blocks"])
    attn = dict(blocks["attn"])
    mlp_ = dict(blocks["mlp"])
    attn["qkv"] = _prescale_lin(attn["qkv"], stats["qkv"], alpha)
    mlp_["fc1"] = _prescale_lin(mlp_["fc1"], stats["fc1"], alpha)
    blocks["attn"], blocks["mlp"] = attn, mlp_
    p["blocks"] = blocks
    return p


def smooth_moe(params: dict, stats: dict, alpha: float = 0.5) -> dict:
    """SmoothQuant (LN-fold form) for the Switch-MoE visual trunk.

    The qkv edge folds exactly as in ``smooth_vit``. The MLP edge differs:
    norm2's output feeds BOTH the router and every expert's ``wi``, so the
    fold divides norm2 by one per-input-channel ``s`` SHARED across experts
    (computed against the abs-max over all experts' wi rows) and multiplies
    *both* consumers' kernels by s — wi's input rows ([L, E, D, F] × s over
    D) and the router's rows ([L, D, E] × s over D). Router logits are
    therefore bit-comparable in fp: token→expert assignments cannot move.
    Per-(layer, expert, column) weight scales (``quantize_kernel`` on the
    stacked [L, E, D, F] kernels) then absorb the migrated outliers
    per expert. ``stats`` comes from ``moe.vit_forward(..., ln_stats=True)``:
    {"qkv": [L, D], "wi": [L, D]} abs-max of the two LN outputs."""
    p = dict(params)
    blocks = dict(p["blocks"])
    attn = dict(blocks["attn"])
    moe_p = dict(blocks["moe"])
    n1, qkv = _fold_smooth(blocks["norm1"], attn["qkv"], stats["qkv"], alpha)

    wi = moe_p["wi"]
    k = jnp.asarray(wi["kernel"], jnp.float32)          # [L, E, D, F]
    l, e, d, f = k.shape
    s = smooth_scales(stats["wi"],
                      k.transpose(0, 2, 1, 3).reshape(l, d, e * f),
                      alpha)                             # [L, D]
    norm2 = blocks["norm2"]
    n_dt, k_dt = norm2["scale"].dtype, wi["kernel"].dtype
    blocks["norm2"] = {
        "scale": (norm2["scale"].astype(jnp.float32) / s).astype(n_dt),
        "bias": (norm2["bias"].astype(jnp.float32) / s).astype(n_dt),
    }
    moe_p["wi"] = {**wi, "kernel": (k * s[:, None, :, None]).astype(k_dt)}
    router = moe_p["router"]
    moe_p["router"] = {
        **router,
        "kernel": (router["kernel"].astype(jnp.float32)
                   * s[..., None]).astype(router["kernel"].dtype),
    }
    blocks["norm1"], attn["qkv"] = n1, qkv
    blocks["attn"], blocks["moe"] = attn, moe_p
    p["blocks"] = blocks
    return p


def calibrate_smooth_moe(params: dict, calib_pixels: Array, cfg,
                         alpha: float = 0.5) -> dict:
    """Calibrate LN abs-max stats on ``calib_pixels`` and fold them into
    the MoE trunk (``smooth_moe``) — the shared calibrate+smooth step of
    `smooth_quantize_moe_vit` and `KEEPModel.quantize(calib_pixels=...)`
    (which quantizes later, together with its other towers)."""
    from keep_tpu.models import moe

    _, _, stats = moe.vit_forward(params, calib_pixels, cfg, ln_stats=True)
    return smooth_moe(params, stats, alpha)


def smooth_quantize_moe_vit(params: dict, calib_pixels: Array, cfg,
                            alpha: float = 0.5) -> dict:
    """Calibrate on ``calib_pixels`` → smooth (``smooth_moe``) →
    int8-quantize the MoE visual tower (expert wi/wo included via
    ``MOE_TARGETS``). No LayerScale to fold — the MoE trunk has none."""
    return quantize_linear_weights(
        calibrate_smooth_moe(params, calib_pixels, cfg, alpha), MOE_TARGETS)


def smooth_quantize_bert(params: dict, input_ids: Array,
                         attention_mask: Array | None, cfg,
                         alpha: float = 0.5) -> dict:
    """Calibrate on a token batch → smooth (pre_scale form) → int8-quantize
    the BERT tower. The result runs the same megakernel path as a plainly
    quantized tower (``bert.block`` threads pre_scale into the kernels)."""
    from keep_tpu.models import bert

    _, stats = bert.forward(params, input_ids, attention_mask, cfg=cfg,
                            ln_stats=True)
    return quantize_linear_weights(smooth_bert(params, stats, alpha))


def smooth_quantize_vit(params: dict, calib_pixels: Array, cfg,
                        alpha: float = 0.5) -> dict:
    """Calibrate on ``calib_pixels`` → fold LayerScale → smooth →
    int8-quantize the ViT. The fold comes first (exact; same LN outputs,
    so calibration stats are unaffected) because the int8 megakernel path
    requires LayerScale pre-folded (vit.block's dispatch gate) — without
    it this helper's output would silently fall back to the slower
    per-matmul int8 dispatch."""
    from keep_tpu.models import vit

    _, stats = vit.forward(params, calib_pixels, cfg, ln_stats=True)
    return quantize_linear_weights(
        smooth_vit(vit.fold_layerscale(params), stats, alpha))
