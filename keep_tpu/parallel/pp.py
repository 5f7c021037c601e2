"""Pipeline parallelism over the stacked-layer towers — the 'pp' mesh axis.

The reference has no pipeline support at all (its towers fit one GPU;
SURVEY §2.4). On TPU slices, pipelining is the natural third axis next to
dp/tp once a tower outgrows one chip's HBM (ViT-g/EVA02-E scale presets):
stage i holds layers [i·L/n, (i+1)·L/n) — the stacked ``blocks`` pytree
shards on its LEADING layer axis, so placement is a one-line
``NamedSharding(mesh, P('pp'))`` and each chip stores 1/n of the tower.

Schedule: GPipe (forward) expressed as a ``lax.scan`` over
``M + n_stages - 1`` ticks inside one ``shard_map`` program. Each tick every
stage runs its local layer-scan, then hands its activation to the next
stage over the ICI ring with a single ``lax.ppermute`` — the only
communication in the whole pipeline (one [mb, S, D] hop per tick per
stage boundary; no collectives). Stage 0 feeds microbatch ``t``; stage
``n-1`` banks microbatch ``t - (n-1)``; the bubble is the standard
``(n-1)/(M+n-1)`` GPipe bubble, amortized by choosing M ≥ 2n.

Inactive (bubble) ticks compute on zeros — a masked select keeps the
garbage bounded and the results exact; XLA hoists the select off the hot
path. Everything is trace-once / compile-once: no per-stage Python, no
host round-trips between ticks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def stage_shardings(blocks, mesh: Mesh, axis: str = "pp"):
    """Pytree of NamedShardings splitting every [L, ...] leaf's leading
    layer axis over ``axis`` — stage i holds its own layers only."""
    spec = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda _: spec, blocks)


def place_stages(blocks, mesh: Mesh, axis: str = "pp"):
    """device_put the stacked blocks with their per-stage shardings."""
    return jax.tree.map(jax.device_put, blocks, stage_shardings(blocks, mesh, axis))


def pipeline_blocks(
    block_fn,
    blocks,
    x: Array,
    mesh: Mesh,
    axis: str = "pp",
    num_microbatches: int | None = None,
    batch_axis: str | None = None,
    remat: bool = False,
) -> Array:
    """Run ``x`` through all L stacked layers, pipelined over ``axis``.

    ``block_fn(layer_params, h) -> h`` is the single-layer step (same
    contract as the towers' ``lax.scan`` bodies); ``blocks`` the stacked
    [L, ...] pytree; ``x`` [B, ...] activations. Returns exactly what a
    single-device scan over all L layers would. Constraints (static):
    L % n_stages == 0 and B % num_microbatches == 0.

    ``batch_axis``: compose with data parallelism on a 2-D (dp, pp) mesh —
    the microbatch's batch dimension stays sharded over that mesh axis
    through the shard_map (no gather; each dp slice runs its own pipeline).
    ``remat``: checkpoint each layer inside the stage scan (training needs
    it for the same HBM reasons as the plain tower path).

    Known memory trade-off: every stage holds the full [m, mb, ...] input
    AND an equal-sized output accumulator (only stage 0 consumes the
    former, only stage n-1 fills the latter; the final psum replicates
    results) — ~2× the full-batch activation residency per stage. Exact
    xs/outs sharding over 'pp' needs circular-schedule bookkeeping that
    isn't warranted at the scales this trains (ViT-L/EVA02 activations are
    MBs; the HBM pressure is weights+moments, which DO stage over 'pp').
    Revisit if a tower's activations outgrow a stage.
    """
    n = mesh.shape[axis]
    L = jax.tree.leaves(blocks)[0].shape[0]
    if L % n:
        raise ValueError(f"depth {L} not divisible by {n} '{axis}' stages")
    m = num_microbatches or n
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    step_fn = jax.checkpoint(block_fn) if remat else block_fn
    if n == 1:  # degenerate mesh: plain scan
        def body(c, lp):
            return step_fn(lp, c), None
        return lax.scan(body, x, blocks)[0]

    xs = x.reshape(m, b // m, *x.shape[1:])
    xspec = P(None, batch_axis) if batch_axis else P()

    def spmd(local_blocks, xs):
        idx = lax.axis_index(axis)

        def local_stage(h):
            def body(c, lp):
                return step_fn(lp, c), None
            return lax.scan(body, h, local_blocks)[0]

        zero = jnp.zeros_like(xs[0])

        def tick(carry, t):
            buf, outs = carry
            mb_id = t - idx
            active = (mb_id >= 0) & (mb_id < m)
            inp = jnp.where(
                idx == 0,
                lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, m - 1), 0,
                                         keepdims=False),
                buf,
            )
            inp = jnp.where(active, inp, zero)  # bounded bubble compute
            y = local_stage(inp)
            # one ICI hop: stage i → i+1 (stage 0 receives zeros)
            nxt = lax.ppermute(y, axis, [(i, i + 1) for i in range(n - 1)])
            done = t - (n - 1)  # microbatch leaving the last stage
            outs = jnp.where(
                (idx == n - 1) & (done >= 0),
                lax.dynamic_update_index_in_dim(
                    outs, y, jnp.clip(done, 0, m - 1), 0),
                outs,
            )
            return (nxt, outs), None

        # scan carries become device-varying on 'pp' after one tick; mark the
        # (replicated-zero) initial carry as varying so the types line up
        init = jax.lax.pcast((zero, jnp.zeros_like(xs)), (axis,), to="varying")
        (_, outs), _ = lax.scan(tick, init, jnp.arange(m + n - 1))
        # results live on the last stage only; mask + psum replicates them
        outs = jnp.where(idx == n - 1, outs, jnp.zeros_like(outs))
        return lax.psum(outs, axis)

    out = jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P(axis), xspec),
        out_specs=xspec,
    )(blocks, xs)
    out = out.reshape(b, *x.shape[1:])
    if batch_axis:
        # merging [m, mb] -> [B] can't express "shard the mb factor", so
        # GSPMD would replicate here; re-pin the batch axis for downstream
        out = jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P(batch_axis)))
    return out


def pp_state_shardings(tree, mesh: Mesh, axis: str = "pp"):
    """NamedShardings for a TrainState-shaped pytree: every leaf that lives
    under a ``visual``→``blocks`` path (params AND the Adam moments, whose
    pytrees mirror the params') stages its leading layer axis over
    ``axis``; everything else replicates. Same matcher idea as
    ``parallel.tp.tp_shardings``."""
    n = mesh.shape[axis]

    def one(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        staged = (
            "blocks" in names
            and "visual" in names
            and np.ndim(leaf) >= 1
            and np.shape(leaf)[0] % n == 0
        )
        return NamedSharding(mesh, P(axis) if staged else P())

    return jax.tree_util.tree_map_with_path(one, tree)


def place_pp(tree, mesh: Mesh, axis: str = "pp"):
    """device_put a TrainState (or params) with its pipeline shardings."""
    return jax.tree.map(jax.device_put, tree,
                        pp_state_shardings(tree, mesh, axis))


def pp_fraction(params, mesh: Mesh, axis: str = "pp") -> float:
    """Fraction of parameter elements staged over ``axis``."""
    import math

    shardings = pp_state_shardings(params, mesh, axis)
    total = split = 0
    for leaf, sh in zip(jax.tree.leaves(params), jax.tree.leaves(shardings)):
        n = math.prod(np.shape(leaf)) or 1
        total += n
        if sh.spec != P():
            split += n
    return split / max(total, 1)


def vit_forward_pp(
    params: dict,
    x: Array,
    cfg,
    mesh: Mesh,
    axis: str = "pp",
    num_microbatches: int | None = None,
    dtype: jnp.dtype = jnp.float32,
    use_flash: bool = False,
    gelu_approx: bool = False,
    batch_axis: str | None = None,
    remat: bool = False,
) -> Array:
    """ViT image encode with the 24-block trunk pipelined over ``axis``.

    The stem (patchify + cls/pos embed) and head (final LN + pool) are
    O(B·D) — they run replicated; only the [L, ...] trunk is staged. Exact
    parity with :func:`keep_tpu.models.vit.forward` (same block_fn, same
    scan order). ``params['blocks']`` may be pre-placed with
    :func:`place_stages`; anything else works too — shard_map's in_spec
    resharding handles it.
    """
    from keep_tpu.models import vit
    from keep_tpu.ops.nn import layer_norm

    b, h, w, _ = x.shape
    ps = cfg.patch_size
    if h % ps or w % ps:
        raise ValueError(f"image size {(h, w)} not a multiple of patch_size {ps}")
    x = x.astype(dtype)
    tokens = vit.patchify(params["patch_embed"], x, ps)
    if "cls_token" in params:
        cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                               (b, 1, cfg.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = vit.resample_pos_embed(
        params["pos_embed"], (h // ps, w // ps), cfg.num_prefix_tokens
    )
    tokens = tokens + pos.astype(dtype)
    if "ln_pre" in params:
        tokens = layer_norm(params["ln_pre"], tokens, cfg.ln_eps)

    block_fn = functools.partial(
        vit.block, cfg=cfg, use_flash=use_flash, gelu_approx=gelu_approx
    )
    tokens = pipeline_blocks(
        lambda lp, c: block_fn(lp, c),
        params["blocks"], tokens, mesh, axis, num_microbatches,
        batch_axis=batch_axis, remat=remat,
    )

    if not cfg.fc_norm:
        tokens = layer_norm(params["norm"], tokens, cfg.ln_eps)
    if cfg.pool == "token":
        pooled = tokens[:, 0]
    elif cfg.pool == "avg":
        pooled = jnp.mean(tokens[:, cfg.num_prefix_tokens:], axis=1)
    else:
        return tokens
    if cfg.fc_norm:
        pooled = layer_norm(params["norm"], pooled, cfg.ln_eps)
    return pooled
