"""The training step: data-parallel contrastive/metric pretraining on a mesh.

Reference inner loop (training/path_training/train_hierarchy.py:73-248):
tokenize → autocast bf16 encode_image/encode_text → HyMetricLoss (or
ClipLoss) with logit_scale.exp() → backward → grad clip → AdamW step →
clamp logit_scale to [0, ln 100]. Gradient accumulation caches no-grad
features and re-forwards each chunk with the cached rest as negatives
(:127-165).

TPU-native: one jitted step under ``jax.jit`` with NamedSharding — batch
sharded over the mesh's 'dp' axis, params replicated; XLA inserts the
all-gathers the similarity matrix needs (the reference's gather_features /
DDP allreduce have no user-space analog here). bf16 compute, fp32 params —
no GradScaler. Accumulation is a ``lax.scan`` over microbatches with
stop-gradient feature caching, exactly the reference semantics.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keep_tpu.configs import KEEPConfig
from keep_tpu.models import keep
from keep_tpu.train.loss import clip_loss, hy_metric_loss

Array = jax.Array

LOGIT_SCALE_MAX = float(np.log(100.0))  # train_hierarchy.py:190-192


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Array

    def replace(self, **kw) -> "TrainState":
        return dataclasses.replace(self, **kw)


def tree_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    kind: str = "hierarchy_metric"  # or 'clip'
    caption_num: int = 32
    loss_subtype: str = "lhp-hn"
    local_loss: bool = False


def _encode_batch(params, batch, cfg: KEEPConfig, dtype, use_flash, remat=True,
                  pp_mesh=None, act_sharding=None):
    # remat trades recompute for memory: ViT-L+BERT backward at useful batch
    # sizes exceeds one v5e's 16GB HBM without it
    aux = jnp.zeros((), jnp.float32)
    if pp_mesh is not None:
        if getattr(cfg.vision, "moe_experts", 0) > 0:
            # encode_image_pp raises too; fail here so library callers of
            # compute_loss can't silently train the router with zero aux
            raise NotImplementedError(
                "pipeline parallelism does not compose with the MoE trunk")
        # ViT trunk staged over the mesh's 'pp' axis (GPipe, parallel/pp.py);
        # batch stays sharded over 'dp' through the pipeline
        img = keep.encode_image_pp(params, batch["pixels"], cfg, pp_mesh,
                                   dtype=dtype, use_flash=use_flash,
                                   remat=remat, batch_axis="dp")
    else:
        img, aux = keep.encode_image(params, batch["pixels"], cfg,
                                     dtype=dtype, use_flash=use_flash,
                                     remat=remat, act_sharding=act_sharding,
                                     return_aux=True)
    txt = keep.encode_text(
        params,
        batch["input_ids"],
        batch.get("attention_mask"),
        batch.get("token_type_ids"),
        cfg,
        dtype=dtype,
        use_flash=use_flash,
        remat=remat,
        act_sharding=act_sharding,
    )
    return img, txt, aux


def compute_loss(
    params, batch, cfg: KEEPConfig, loss_cfg: LossConfig,
    *, dtype=jnp.bfloat16, use_flash=False, axis_name=None, pp_mesh=None,
    act_sharding=None,
):
    img, txt, aux = _encode_batch(params, batch, cfg, dtype, use_flash,
                                  pp_mesh=pp_mesh, act_sharding=act_sharding)
    scale = jnp.exp(params["logit_scale"])
    if loss_cfg.kind == "hierarchy_metric":
        # HyMetricLoss consumes the global batch: with pjit sharding the
        # [n, n] similarity forces the all-gather automatically.
        loss = hy_metric_loss(
            img, txt, batch["node_connection"], scale,
            caption_num=loss_cfg.caption_num, loss_type=loss_cfg.loss_subtype,
        )
    else:
        loss = clip_loss(
            img, txt, scale, axis_name=axis_name,
            local_loss=loss_cfg.local_loss, labels=batch.get("labels"),
        )
    if getattr(cfg.vision, "moe_experts", 0) > 0:
        loss = loss + cfg.vision.moe_aux_weight * aux
    return loss


def _apply_freeze(tree, frozen):
    """Zero leaves where the freeze mask is 1 (see ``optim.freeze_mask``).
    Applied to both grads (so Adam moments of frozen leaves stay exactly
    zero) and post-optimizer updates (so decoupled weight decay cannot move
    frozen params) — the requires_grad=False equivalent."""
    if frozen is None:
        return tree
    return jax.tree.map(lambda x, f: x * (1.0 - f).astype(x.dtype), tree, frozen)


def _optimizer_apply(state, grads, tx, frozen, loss):
    """The freeze→update→clamp→metrics tail shared by both step factories."""
    grads = _apply_freeze(grads, frozen)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    updates = _apply_freeze(updates, frozen)  # kill weight-decay drift too
    params = optax.apply_updates(state.params, updates)
    params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0, LOGIT_SCALE_MAX)
    new_state = state.replace(
        params=params, opt_state=opt_state, step=state.step + 1
    )
    return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads),
                       "logit_scale": jnp.exp(params["logit_scale"])}


def make_train_step(
    cfg: KEEPConfig,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    *,
    dtype=jnp.bfloat16,
    use_flash: bool = False,
    donate: bool = True,
    static_frozen=None,
    pp_mesh=None,
    act_sharding=None,
    lora_scale: float = None,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """One optimizer step. Shard the batch over 'dp' (NamedSharding) and keep
    params replicated. The optional third ``frozen`` argument (a
    ``optim.freeze_mask`` pytree of 0/1 scalars) is a dynamic input — one
    compile serves every freeze phase and the optimizer state (Adam moments +
    schedule count) is continuous across phases.

    ``static_frozen`` (a pytree of python BOOLS matching params) additionally
    stop-gradients the frozen leaves at COMPILE time: when a whole tower is
    frozen (the shipped config freezes visual+text for epoch 1,
    keep_config.yml) nothing consumes its cotangents — pixels/ids are leaf
    inputs — so XLA dead-code-eliminates the entire tower backward
    (+rematerialization). Grads for those leaves become exactly the zeros the
    dynamic mask would produce, so training is bit-identical; the cost is one
    extra compile per freeze phase. Keep passing the dynamic ``frozen`` mask
    too — it also masks the post-optimizer update (decoupled weight decay).

    ``lora_scale`` switches the step to LoRA fine-tuning (train/lora.py):
    ``state.params`` is the ADAPTER tree, the frozen base params arrive as
    the step's fourth argument, and the model forward consumes
    ``apply_lora(base, adapters, lora_scale)`` — grads flow only into the
    rank-r factors (+ logit_scale)."""

    def step(state: TrainState, batch: dict, frozen=None, base=None):
        def loss_fn(params):
            if static_frozen is not None:
                params = jax.tree.map(
                    lambda p, f: jax.lax.stop_gradient(p) if f else p,
                    params, static_frozen,
                )
            if lora_scale is not None:
                from keep_tpu.train.lora import apply_lora

                params = apply_lora(base, params, lora_scale)
            return compute_loss(
                params, batch, cfg, loss_cfg, dtype=dtype,
                use_flash=use_flash, pp_mesh=pp_mesh,
                act_sharding=act_sharding,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return _optimizer_apply(state, grads, tx, frozen, loss)

    from keep_tpu.utils.compile import tpu_compiler_options

    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   compiler_options=tpu_compiler_options())


def make_accum_train_step(
    cfg: KEEPConfig,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    accum_freq: int,
    *,
    dtype=jnp.bfloat16,
    use_flash: bool = False,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Gradient accumulation with cached negatives (train_hierarchy.py:127-165):
    microbatch features are cached without grad, then each chunk is
    re-forwarded with the cached others as negatives; grads sum across chunks
    before one optimizer step. ``batch`` arrays carry a leading
    [accum_freq, micro, ...] axis.

    Hierarchy-loss semantics: each microbatch is group-blocked with
    ``caption_num`` groups, so the concatenated super-batch is group-blocked
    with ``accum_freq · caption_num`` groups of ``micro // caption_num``
    instances. ``batches['node_connection']`` must therefore be ONE
    [accum·caption_num, accum·caption_num] DO-reachability matrix built over
    all chunks' group labels (``main.py`` builds it from the concatenated
    cap_labels) — NOT a per-chunk stack; chunk 0's matrix alone would wrongly
    merge distinct groups across chunks."""

    def step(state: TrainState, batches: dict, frozen=None):
        def encode(params, mb):
            return _encode_batch(params, mb, cfg, dtype, use_flash)

        def cache_one(_, mb):
            img, txt, _aux = encode(state.params, mb)
            return None, (jax.lax.stop_gradient(img), jax.lax.stop_gradient(txt))

        stacked = {k: v for k, v in batches.items() if k != "node_connection"}
        _, (img_cache, txt_cache) = jax.lax.scan(cache_one, None, stacked)
        # [accum, micro, D] → splice chunk j live, rest cached
        micro = img_cache.shape[1]

        def loss_for_chunk(params, j):
            mb = jax.tree.map(lambda x: x[j], stacked)
            img_j, txt_j, aux_j = encode(params, mb)
            img_all = jax.lax.dynamic_update_slice_in_dim(
                img_cache.reshape(-1, img_cache.shape[-1]), img_j, j * micro, 0
            )
            txt_all = jax.lax.dynamic_update_slice_in_dim(
                txt_cache.reshape(-1, txt_cache.shape[-1]), txt_j, j * micro, 0
            )
            scale = jnp.exp(params["logit_scale"])
            if loss_cfg.kind == "hierarchy_metric":
                # super-batch group structure: accum·caption_num groups
                loss = hy_metric_loss(
                    img_all, txt_all, batches["node_connection"], scale,
                    caption_num=accum_freq * loss_cfg.caption_num,
                    loss_type=loss_cfg.loss_subtype,
                )
            else:
                # forward the labels like the non-accum path does — silently
                # dropping them would turn mask_contrastive into plain
                # InfoNCE only when accumulation is on
                labels = batches.get("labels")
                loss = clip_loss(
                    img_all, txt_all, scale,
                    labels=None if labels is None else labels.reshape(-1),
                )
            if getattr(cfg.vision, "moe_experts", 0) > 0:
                # each chunk carries its own live aux; the chunk grads SUM,
                # so weight each by 1/accum — the summed aux gradient then
                # equals aux_weight·grad(mean-over-chunks aux), matching the
                # non-accum step's weighting instead of accum× it
                loss = loss + (cfg.vision.moe_aux_weight / accum_freq) * aux_j
            return loss

        def accum_one(grads, j):
            loss, g = jax.value_and_grad(loss_for_chunk)(state.params, j)
            return jax.tree.map(jnp.add, grads, g), loss

        zero = jax.tree.map(jnp.zeros_like, state.params)
        grads, losses = jax.lax.scan(accum_one, zero, jnp.arange(accum_freq))
        # summed chunk grads == the exact full-batch gradient for every
        # FEATURE parameter (each chunk's backward sees the full-batch loss
        # through its live features, and only chunk j's features are live in
        # chunk j's backward). logit_scale is the exception: every chunk's
        # loss applies the live scale to the full similarity matrix, so its
        # summed gradient is ~accum× the full-batch one — exactly the
        # reference's behavior (train_hierarchy.py:127-165 accumulates
        # whole-matrix backwards without dividing), reproduced as-is.
        return _optimizer_apply(state, grads, tx, frozen, jnp.mean(losses))

    from keep_tpu.utils.compile import tpu_compiler_options

    return jax.jit(step, donate_argnums=(0,),
                   compiler_options=tpu_compiler_options())
