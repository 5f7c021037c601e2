"""Shared NN ops for the TPU-native encoders.

Conventions:
- Linear params are ``{'kernel': [in, out], 'bias': [out]}`` (kernel is the
  transpose of a torch ``nn.Linear.weight``).
- LayerNorm runs in fp32 regardless of activation dtype (TPU numerics: params
  fp32, matmul compute bf16 — replaces the reference's AMP/GradScaler,
  ``training/path_training/precision.py:5-12``).
- Matmuls go through ``jnp.dot``/``einsum`` with fp32 accumulation
  (``preferred_element_type``) so the MXU accumulates at full precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def gelu(x: Array, approximate: bool = False) -> Array:
    """GELU. ``approximate=False`` = exact erf — torch ``nn.GELU()`` default
    used throughout the reference (e.g. visual head, keep_inference.py:44).

    Perf note (measured on v5e): fp32 erf over the ViT-L MLP activations
    costs ~50 ms/forward of pure VPU time (125 → 184 TF/s effective when
    switched to tanh). The tanh form's error (<1e-3) is below bf16 rounding
    noise, so bf16 inference uses it via ``mlp(..., gelu_approx=True)``.
    """
    return jax.nn.gelu(x, approximate=approximate)


def linear(p: dict, x: Array) -> Array:
    if "kernel_q" in p:
        return _qlinear(p, x)
    if "pre_scale" in p:
        # SmoothQuant pre_scale form (quant._prescale_lin): the kernel rows
        # carry s, the input is divided by s — exact identity in fp
        x = (x.astype(jnp.float32) * p["pre_scale"]).astype(x.dtype)
    out = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    out = out + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def _qlinear(p: dict, x: Array) -> Array:
    """W8A8 linear: per-output-channel int8 weights (``kernel_q`` +
    ``scale``), dynamic per-token activation quantization, int8 MXU matmul
    with int32 accumulation (2× the bf16 MXU rate on v5e). On TPU the whole
    chain runs as one fused Pallas kernel; below is the XLA fallback."""
    if jax.default_backend() == "tpu" and p["kernel_q"].ndim == 2:
        from keep_tpu.kernels.qmatmul import qlinear_fused

        # a SmoothQuant pre_scale leaf rides INTO the kernel (applied fp32
        # before quant_rows) — the activation stream stays bf16 through HBM
        return qlinear_fused(p, x)
    if p["kernel_q"].ndim != 2:
        # stacked [L, K, N] kernels are consumed one layer at a time inside
        # lax.scan; the fallback below would contract x against the LAYER
        # axis (a shape error, or silent garbage when L == K)
        raise ValueError(
            f"_qlinear takes a single [K, N] kernel; got "
            f"{p['kernel_q'].shape} — slice the stacked layer axis first")
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if "pre_scale" in p:
        xf = xf * p["pre_scale"]
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    ascale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / ascale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, p["kernel_q"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * ascale * p["scale"].astype(jnp.float32)
    return (out + p["bias"].astype(jnp.float32)).astype(dtype)


def layer_norm(p: dict, x: Array, eps: float) -> Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def mha_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    bias: Array | None = None,
    use_flash: bool = False,
) -> Array:
    """Multi-head attention core over [B, H, S, Dh] tensors.

    Softmax is computed in fp32. ``bias`` is an additive mask; the XLA path
    takes any broadcastable [B, 1|H, S|1, S]. ``use_flash`` routes to the
    Pallas fused kernel (TPU only), which supports ONLY key masks shaped
    [B, 1, 1, S] (the BERT padding mask) and raises on full score-level
    biases — pass ``use_flash=False`` for those.
    """
    if use_flash:
        from keep_tpu.kernels.flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias)

    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)


def quick_gelu(x: Array) -> Array:
    """OpenCLIP ``QuickGELU`` — x·sigmoid(1.702x) (transformer.py:31); used
    by the original OpenAI CLIP checkpoints (the ``-quickgelu`` presets)."""
    return x * jax.nn.sigmoid(1.702 * x)


def mlp(p: dict, x: Array, gelu_approx: bool = False,
        act: str = "gelu") -> Array:
    """fc1 → act → fc2 (timm ``Mlp`` / BERT intermediate+output semantics).
    ``act``: 'gelu' (erf or tanh per ``gelu_approx``) | 'quick_gelu'.

    Fully-quantized MLPs on TPU run the fused int8 pair kernel (the [M, F]
    hidden never leaves VMEM — ``kernels.qmlp``); a quantized fc1 alone fuses
    the tanh-GELU into the int8 matmul epilogue."""
    if act == "quick_gelu":  # OpenAI-CLIP variant; no fused int8 epilogue
        return linear(p["fc2"], quick_gelu(linear(p["fc1"], x)))
    if act != "gelu":
        # fail fast: a typo'd/unknown activation silently running GELU
        # would be wrong for every token with no signal
        raise ValueError(f"unknown mlp act {act!r}; expected 'gelu' or "
                         f"'quick_gelu'")
    if (
        gelu_approx
        and "kernel_q" in p["fc1"]
        and p["fc1"]["kernel_q"].ndim == 2
        and jax.default_backend() == "tpu"
    ):
        # fc1's SmoothQuant pre_scale (if any) rides into the fused kernels;
        # fc2 never carries one (its input is the in-kernel GELU output)
        if "kernel_q" in p["fc2"] and p["fc2"]["kernel_q"].ndim == 2:
            from keep_tpu.kernels.qmlp import qmlp_fused

            return qmlp_fused(p["fc1"], p["fc2"], x)
        from keep_tpu.kernels.qmatmul import qlinear_fused

        return linear(p["fc2"], qlinear_fused(p["fc1"], x, activation="gelu_tanh"))
    return linear(p["fc2"], gelu(linear(p["fc1"], x), approximate=gelu_approx))


def l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch ``F.normalize(x, dim=-1)`` semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)


def cosine_attention(
    q: Array,
    k: Array,
    v: Array,
    logit_scale: Array,
    *,
    bias: Array | None = None,
    logit_scale_max: float = 4.6051702,  # ln(1/0.01), the reference default
    head_scale: Array | None = None,
) -> Array:
    """Scaled-cosine multi-head attention over [B, H, S, Dh] tensors
    (reference custom ``Attention``, transformer.py:87-160).

    Scores are cosine similarities — L2-normalized q and k — multiplied by a
    LEARNED per-head temperature ``exp(min(logit_scale, logit_scale_max))``
    (``logit_scale`` enters in log space, shape [H] or [H, 1, 1]), instead of
    the fixed Dh^-0.5. ``head_scale`` [H] is a learned per-head output gain
    (``scale_heads``; the reference's own head_scale multiply reshapes
    [B·H, S, Dh] as [B, H, S, dim] and only runs at H==1 — we apply the gain
    on the per-head outputs, the evident intent).
    """
    scale = jnp.exp(
        jnp.minimum(logit_scale.reshape(-1).astype(jnp.float32), logit_scale_max)
    )  # [H]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", l2_normalize(q.astype(jnp.float32)),
        l2_normalize(k.astype(jnp.float32)),
        preferred_element_type=jnp.float32,
    ) * scale[None, :, None, None]
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    if head_scale is not None:
        out = out * head_scale.reshape(1, -1, 1, 1).astype(out.dtype)
    return out.astype(v.dtype)
