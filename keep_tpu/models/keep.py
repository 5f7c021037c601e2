"""The KEEP model facade: the published inference API, TPU-native.

API contract (reference quick_start/keep_inference.py:54-62):
  encode_image(pixels)        = l2_normalize(visual_head(vit(pixels)))
  encode_text(ids, mask, tt)  = l2_normalize(bert(...).pooler_output)
with ``visual_head`` = Linear(1024→768) → GELU → Linear(768→768)
(keep_inference.py:42-46) and ``logit_scale = ln(1/0.04)`` (:52, unused at
inference — the quick_start script prints raw ``img @ text.T``).

Params pytree: {'visual': vit params, 'visual_head': {fc1, fc2},
'text': bert params, 'logit_scale': scalar}.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.configs import KEEPConfig
from keep_tpu.models import bert, vit
from keep_tpu.ops.nn import gelu, l2_normalize, linear

Array = jax.Array


def encode_image(
    params: dict,
    pixels: Array,
    cfg: KEEPConfig,
    *,
    dtype: jnp.dtype = jnp.float32,
    use_flash: bool = False,
    gelu_approx: bool = False,
    remat: bool = False,
    act_sharding=None,
    return_aux: bool = False,
) -> Array:
    """[B, H, W, 3] normalized pixels → [B, projection_dim] unit features.

    ``return_aux=True`` additionally returns the MoE load-balancing aux
    loss (0.0 for the dense trunk) — the trainer adds
    ``cfg.vision.moe_aux_weight * aux`` when ``moe_experts > 0``."""
    if getattr(cfg.vision, "moe_experts", 0) > 0:
        from keep_tpu.models import moe

        if act_sharding is not None:
            # silently un-applied SP constraints would reshard behind the
            # user's back (the CLI already rejects sp with MoE — this
            # guards library callers); use_flash is a no-op by design: the
            # MoE trunk's attention is the XLA path
            raise NotImplementedError(
                "act_sharding (sequence parallelism) is not supported for "
                "the MoE trunk")
        feats, aux = moe.vit_forward(
            params["visual"], pixels, cfg.vision, dtype=dtype,
            gelu_approx=gelu_approx, remat=remat,
        )
    else:
        feats = vit.forward(
            params["visual"], pixels, cfg.vision, dtype=dtype,
            use_flash=use_flash, gelu_approx=gelu_approx, remat=remat,
            act_sharding=act_sharding,
        )
        aux = jnp.zeros((), jnp.float32)
    feats = _visual_head(params, feats)
    return (feats, aux) if return_aux else feats


def _visual_head(params: dict, feats: Array) -> Array:
    head = params["visual_head"]
    feats = linear(head["fc2"], gelu(linear(head["fc1"], feats)))
    return l2_normalize(feats.astype(jnp.float32))


def encode_image_pp(
    params: dict,
    pixels: Array,
    cfg: KEEPConfig,
    mesh,
    *,
    dtype: jnp.dtype = jnp.float32,
    use_flash: bool = False,
    gelu_approx: bool = False,
    remat: bool = False,
    num_microbatches: int | None = None,
    batch_axis: str | None = "dp",
) -> Array:
    """encode_image with the ViT trunk pipelined over the mesh's 'pp' axis
    (GPipe; parallel/pp.py). Exact vs :func:`encode_image`; the stem, head
    MLP and text tower stay replicated SPMD."""
    if getattr(cfg.vision, "moe_experts", 0) > 0:
        raise NotImplementedError(
            "pipeline parallelism does not compose with the MoE trunk "
            "(train it with dp/fsdp/ep) — same rule the CLI enforces")
    from keep_tpu.parallel.pp import vit_forward_pp

    feats = vit_forward_pp(
        params["visual"], pixels, cfg.vision, mesh, dtype=dtype,
        use_flash=use_flash, gelu_approx=gelu_approx, remat=remat,
        num_microbatches=num_microbatches, batch_axis=batch_axis,
    )
    return _visual_head(params, feats)


def encode_text(
    params: dict,
    input_ids: Array,
    attention_mask: Array | None = None,
    token_type_ids: Array | None = None,
    cfg: KEEPConfig = KEEPConfig(),
    *,
    dtype: jnp.dtype = jnp.float32,
    use_flash: bool = False,
    gelu_approx: bool = False,
    remat: bool = False,
    act_sharding=None,
) -> Array:
    """[B, S] token ids (+mask) → [B, hidden] unit features (BERT pooler)."""
    out = bert.forward(
        params["text"],
        input_ids,
        attention_mask,
        token_type_ids,
        cfg.text,
        dtype=dtype,
        use_flash=use_flash,
        gelu_approx=gelu_approx,
        remat=remat,
        act_sharding=act_sharding,
    )
    return l2_normalize(out["pooler_output"].astype(jnp.float32))


def forward(params: dict, pixels: Array, input_ids: Array,
            attention_mask: Array | None, cfg: KEEPConfig, **kw) -> dict:
    """Uniform factory forward contract: every family returns
    'image_features'/'text_features' (clip/kep/pmc_clip/coca do).
    Shared kwargs fan out to both encoders; encode_image-only kwargs
    (return_aux — the MoE aux loss surfaces as out['aux']) do not."""
    img_only = {"return_aux"}
    txt_kw = {k: v for k, v in kw.items() if k not in img_only}
    img = encode_image(params, pixels, cfg, **kw)
    out = {}
    if kw.get("return_aux"):
        img, out["aux"] = img
    out["image_features"] = img
    out["text_features"] = encode_text(params, input_ids, attention_mask,
                                       cfg=cfg, **txt_kw)
    return out


def init(key: jax.Array, cfg: KEEPConfig, dtype: jnp.dtype = jnp.float32) -> dict:
    kv, kh1, kh2, kt = jax.random.split(key, 4)
    d_in, d_out = cfg.vision.embed_dim, cfg.projection_dim

    def lin(key, fan_in, fan_out):
        return {
            "kernel": (jax.random.normal(key, (fan_in, fan_out)) * fan_in**-0.5).astype(dtype),
            "bias": jnp.zeros((fan_out,), dtype),
        }

    if getattr(cfg.vision, "moe_experts", 0) > 0:
        from keep_tpu.models import moe

        visual = moe.init_vit(kv, cfg.vision, dtype)
    else:
        visual = vit.init(kv, cfg.vision, dtype)
    return {
        "visual": visual,
        "visual_head": {"fc1": lin(kh1, d_in, d_out), "fc2": lin(kh2, d_out, d_out)},
        "text": bert.init(kt, cfg.text, dtype),
        "logit_scale": jnp.asarray(np.log(1.0 / cfg.logit_scale_init), jnp.float32),
    }


@dataclasses.dataclass
class KEEPModel:
    """Convenience object wrapper (jitted, cached per shape) around the pure fns.

    ``KEEPModel.from_pretrained(dir)`` mirrors the HF AutoModel entry point
    (reference quick_start/keep_inference.py:79-83): reads ``config.json`` +
    ``pytorch_model.bin`` and converts the torch weights to JAX pytrees.
    """

    params: dict
    cfg: KEEPConfig
    dtype: Any = jnp.float32
    use_flash: bool = False
    gelu_approx: Any = None  # None = auto: tanh-approx GELU under bf16
                             # (error below bf16 rounding noise; ~20% faster)

    def __post_init__(self):
        if self.gelu_approx is None:
            self.gelu_approx = self.dtype == jnp.bfloat16
        static = dict(cfg=self.cfg, dtype=self.dtype, use_flash=self.use_flash,
                      gelu_approx=self.gelu_approx)
        from keep_tpu.utils.compile import tpu_compiler_options

        opts = tpu_compiler_options()
        self._encode_image = jax.jit(
            functools.partial(encode_image, **static), compiler_options=opts
        )
        self._encode_text = jax.jit(
            functools.partial(encode_text, **static), compiler_options=opts
        )

    def encode_image(self, pixels: Array) -> Array:
        return self._encode_image(self.params, pixels)

    def encode_text(
        self,
        input_ids: Array,
        attention_mask: Array | None = None,
        token_type_ids: Array | None = None,
    ) -> Array:
        return self._encode_text(self.params, input_ids, attention_mask, token_type_ids)

    @property
    def logit_scale(self) -> float:
        return float(jnp.exp(self.params["logit_scale"]))

    def quantize(self, calib_pixels=None, smooth_alpha: float = 0.5,
                 calib_text=None, moe_w8a16: bool = False) -> "KEEPModel":
        """Opt-in W8A8 int8 inference variant (see ``keep_tpu.quant``).
        LayerScale is folded into proj/fc2 first (exact) so the quantized
        kernels carry it for free. With ``calib_pixels`` ([N, H, W, 3]
        normalized calibration images), the visual tower is SmoothQuant-
        calibrated first: activation outliers migrate into per-channel
        weight scales at the LN→qkv/fc1 edges (``quant.smooth_vit``) —
        recommended for released real-data checkpoints, where LN-output
        outlier channels are common. ``calib_text`` (``input_ids`` [N, S]
        or ``(input_ids, attention_mask)``) does the same for the BERT
        tower in the pre_scale form (``quant.smooth_bert`` — post-LN
        residuals forbid the LN fold). MoE visual trunks calibrate via
        ``quant.smooth_moe`` (router-compensated fold; routing unchanged).

        When is calibration worth it? It is insurance against ACTIVATION
        OUTLIER channels, and a no-op without them: on outlier-free
        weights it moves the int8-vs-bf16 feature cosine by ~1e-5
        (measured, docs/PERF.md), while on an injected-outlier tower it
        recovers 0.997 → 0.99999 (tests/test_quant.py). Cost at inference
        is nil (ViT: exact LN fold; BERT: an in-kernel per-channel
        multiply, +1.1% measured). Rule of thumb: quantize plainly, check
        features against the bf16 model on a handful of real inputs
        (cos ≥ 0.999, the bench gate); calibrate only if that check
        fails.

        MoE trunks: full W8A8 experts measure feature cos ≈0.995 vs bf16
        at random init — but a routing-pinned A/B (scripts/moe_lab.py
        --route-study, docs/PERF.md round 4) shows the int8 NUMERICS meet
        the 0.999 gate (pinned cos 0.9994); the gap is ~3.5% discrete
        router flips from the perturbed stream, which W8A16
        (``moe_w8a16=True``: weight-only int8 experts, bf16 activations)
        does NOT reduce (same flip rate, +0.00001 numerics, 20% slower —
        measured). W8A8 therefore stays the default; check features on
        your own trained checkpoint, where router margins are larger than
        at the random init these numbers come from."""
        from keep_tpu.models.vit import fold_layerscale
        from keep_tpu.quant import (DEFAULT_TARGETS, MOE_TARGETS,
                                    is_quantized, quantize_linear_weights,
                                    smooth_bert, smooth_vit)

        if is_quantized(self.params):
            raise ValueError(
                "params are already quantized (kernel_q present) — "
                "double-quantizing int8 kernels would corrupt them; a "
                "save_quantized artifact loads ready to serve")
        params = dict(self.params)
        if calib_text is not None:
            from keep_tpu.models import bert as _bert

            ids, mask = (calib_text if isinstance(calib_text, (tuple, list))
                         else (calib_text, None))
            _, tstats = _bert.forward(params["text"], ids, mask,
                                      cfg=self.cfg.text, ln_stats=True)
            params["text"] = smooth_bert(params["text"], tstats, smooth_alpha)
        if getattr(self.cfg.vision, "moe_experts", 0) > 0:
            # MoE trunk: expert wi/wo + attention/stem matmuls go int8
            # (moe._expert_linear / ops.nn.linear dispatch on kernel_q);
            # no LayerScale to fold. SmoothQuant calibration folds norm2's
            # equalization into BOTH consumers — router and expert wi —
            # so token→expert routing is unchanged (quant.smooth_moe).
            if calib_pixels is not None:
                from keep_tpu.quant import calibrate_smooth_moe

                params["visual"] = calibrate_smooth_moe(
                    params["visual"], calib_pixels, self.cfg.vision,
                    smooth_alpha)
            targets = MOE_TARGETS
        else:
            targets = DEFAULT_TARGETS
            params["visual"] = fold_layerscale(params["visual"])
            if calib_pixels is not None:
                from keep_tpu.models import vit as _vit

                _, stats = _vit.forward(params["visual"], calib_pixels,
                                        self.cfg.vision, ln_stats=True)
                params["visual"] = smooth_vit(params["visual"], stats,
                                              smooth_alpha)
        w_only = ("wi", "wo") if (
            targets is MOE_TARGETS and moe_w8a16) else ()
        return KEEPModel(
            params=quantize_linear_weights(params, targets,
                                           weight_only=w_only),
            cfg=self.cfg,
            dtype=self.dtype,
            use_flash=self.use_flash,
            gelu_approx=self.gelu_approx,
        )

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        dtype: Any = jnp.float32,
        use_flash: bool = False,
        cfg: Optional[KEEPConfig] = None,
    ) -> "KEEPModel":
        import os

        from keep_tpu.compat.torch_loader import load_keep_checkpoint

        cfg = cfg or KEEPConfig.from_hf_json(os.path.join(model_dir, "config.json"))
        # native int8 deploy artifact (compat.export.save_quantized):
        # pre-calibrated quantized params, no torch weights needed
        from keep_tpu.compat.export import QUANTIZED_SUBDIR

        qdir = os.path.join(model_dir, QUANTIZED_SUBDIR)
        if os.path.isdir(qdir):
            from keep_tpu.train import checkpoint as ckpt

            params = jax.tree.map(jnp.asarray, ckpt.restore(qdir)["params"])
            return cls(params=params, cfg=cfg, dtype=dtype,
                       use_flash=use_flash)
        for name in ("pytorch_model.bin", "model.safetensors"):
            weights = os.path.join(model_dir, name)
            if os.path.exists(weights):
                break
        else:
            raise FileNotFoundError(
                f"no pytorch_model.bin or model.safetensors in {model_dir}")
        params = load_keep_checkpoint(weights, cfg)
        return cls(params=params, cfg=cfg, dtype=dtype, use_flash=use_flash)
