"""Mixture-of-Experts MLP + MoE transformer trunk, TPU-native (beyond
reference — the reference model zoo is dense-only; this exists so the
trainer's device-mesh story covers expert parallelism ('ep') alongside
dp/fsdp/tp/sp/pp, and so LIMoE/Switch-style sparse towers drop into the
same stack).

Design (Switch Transformer routing, Fedus et al. 2021, expressed as
static-shape einsums so everything lands on the MXU and nothing is
data-dependent under jit):

- routing is GROUPED (GShard-style): a [B, S, D] stream routes each
  batch row independently, with per-expert capacity
  C = ceil(k·S/E · capacity_factor) PER GROUP — the one-hot
  dispatch/combine tensors are [G, S, E, C] ≈ k·cf·S elements per token
  (NOT the O(T²) a global flat routing would cost), and the group axis
  rides the 'dp' sharding of the batch. Tokens over their group's
  capacity are DROPPED (their MLP contribution is zero — the residual
  stream carries them).
- dispatch/combine are one-hot einsums: gather-free, all-to-all-free as
  written; under a mesh with the expert-stacked kernels sharded
  P('ep', ...) GSPMD turns the [G, E, C, D] einsums into exactly the
  dispatch all-to-alls a hand-written MoE would use.
- aux load-balancing loss: E · Σ_e f_e · P_e (Switch eq. 4) — 1.0 at
  perfect balance; add ``aux_weight * (aux - 1)`` to the task loss.

Param pytree (E experts, k top-k, stacked trunks add a leading [L]):
  router: {kernel [D, E]}                      (no bias — Switch)
  wi:     {kernel [E, D, F], bias [E, F]}
  wo:     {kernel [E, F, D], bias [E, D]}

Expert parallelism: ``ep_shardings(params, mesh)`` pins the expert axis
of wi/wo (and nothing else) over 'ep'; activations flow [T, D] →
[E, C, D] → [T, D], and the [E, ·, ·] intermediates shard over 'ep'
automatically. Forward is parity-tested vs the dense ``ops.nn.mlp`` when
all experts carry the same weights, and sharded == unsharded on an
8-device mesh (tests/test_moe.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.ops.nn import gelu, layer_norm, linear, mha_attention

Array = jax.Array


def moe_capacity(group_tokens: int, num_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Per-expert, per-GROUP token capacity (static — shapes under jit
    depend on it)."""
    return max(1, math.ceil(
        top_k * group_tokens / num_experts * capacity_factor))


def _chunked_cumsum(x: Array, rows: int = 128) -> Array:
    """Inclusive cumsum along axis 0 as a two-level scan: within fixed-size
    chunks, then across chunk totals. Both scans run over short axes — on
    TPU this avoids the long single-axis prefix pass (the VPU cost that
    made the flat-routing cumsum a bottleneck; scripts/moe_lab.py)."""
    t = x.shape[0]
    cols = -(-t // rows)
    xp = jnp.pad(x, ((0, rows * cols - t),) + ((0, 0),) * (x.ndim - 1))
    x3 = xp.reshape((rows, cols) + x.shape[1:])
    within = jnp.cumsum(x3, axis=1)
    totals = jnp.cumsum(within[:, -1], axis=0)
    off = jnp.concatenate([jnp.zeros_like(totals[:1]), totals[:-1]], axis=0)
    return (within + off[:, None]).reshape((rows * cols,) + x.shape[1:])[:t]


def _expert_linear(p_lin: dict, x: Array, eq: str) -> Array:
    """Expert-stacked linear: [..., E, C, D] activations against [E, D, F]
    kernels (einsum string ``eq``), plus the [E, F] bias. Dispatches on
    ``kernel_q`` like ``ops.nn.linear``: int8 MXU contraction (2x the bf16
    rate on v5e) with dynamic per-token activation scales and the
    per-(expert, column) weight scales ``quant.quantize_kernel`` emits for
    stacked kernels. Dropped/pad rows are all-zero, so their activation
    scale degenerates harmlessly."""
    bias = p_lin["bias"][:, None, :]
    if "kernel_q" in p_lin and "w_only" in p_lin:
        # W8A16: int8 weights dequantized into the einsum's operand read
        # (XLA fuses convert*scale into the dot) — keeps the E× weight-HBM
        # halving that is the whole MoE-int8 win while the activations and
        # the MXU contraction stay bf16, so there is no per-token
        # activation-quant noise (the W8A8 path's cos-gate failure mode).
        w = (p_lin["kernel_q"].astype(x.dtype)
             * p_lin["scale"][:, None, :].astype(x.dtype))
        return jnp.einsum(eq, x, w) + bias.astype(x.dtype)
    if "kernel_q" in p_lin:
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        ascale = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / ascale), -127, 127).astype(jnp.int8)
        acc = jnp.einsum(eq, xq, p_lin["kernel_q"],
                         preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * ascale * p_lin["scale"][:, None, :]
        return (out + bias.astype(jnp.float32)).astype(x.dtype)
    return jnp.einsum(eq, x, p_lin["kernel"].astype(x.dtype)) + bias.astype(
        x.dtype)


def moe_mlp_gather(
    p: dict,
    x: Array,
    *,
    top_k: int = 1,
    capacity_factor: float = 1.25,
    gelu_approx: bool = False,
    route: Array | None = None,
    return_route: bool = False,
) -> tuple:
    """Top-k sparse MLP with GLOBAL routing and gather-only data movement
    (the single-device / dp fast path; `dispatch='gather'`).

    Where `moe_mlp` builds [G, S, E, C] one-hot dispatch/combine tensors
    (the shardable einsum form EP needs), this routes the whole [..., S, D]
    stream as ONE group of T tokens and moves rows by gathers:

    - capacity C = ceil(T/E · cf) over ALL tokens — per-group capacity
      exists only to keep EP-shardable shapes, so global routing strictly
      reduces drops at the same cf;
    - slot assignment via a chunked token-order cumsum (`_chunked_cumsum`);
    - the inverse map (which token fills expert slot (e, p)) is a scalar
      scatter of token ids into [E*C] (kept tokens' slots are unique;
      dropped tokens all hit a discarded pad slot) — measured faster than
      both argsort (+1.8 ms/layer) and a vmapped searchsorted
      (+1.6 ms/layer) on v5e;
    - expert matmuls see [E, C, D] with C ≈ T·cf/E (fat MXU tiles vs the
      grouped path's C ≈ S·cf/E ≈ 31-wide slivers).

    Measured (scripts/moe_lab.py, 24-layer ViT-L trunk, B=64, E=8, one
    v5e): see docs/PERF.md. Returns (out, aux) like `moe_mlp`.

    Top-k (round 4): routing is ``lax.top_k`` — equivalent to the einsum
    path's k sequential argmax rounds (same tie order) — with gates = the
    raw per-expert probs (GShard-unnormalized, matching `moe_mlp`) and
    slots claimed in the SAME round-major order (all round-0 winners in
    token order, then round-1, …) via one chunked cumsum over the
    round-major [K·T, E] one-hots. At no-drop capacity the (round, token)
    → slot assignments therefore agree with the einsum path's; outputs
    are bit-equal at k=1 and match up to float reassociation for k≥2
    (einsum accumulates the k expert contributions inside one [E,C] dot,
    gather sums k explicit rows — tested at rtol=1e-4).

    ``route`` ([T] int32, token order = row-major over the flattened input)
    FORCES token→expert assignments, bypassing the router argmax (gates
    still read the router probs at the forced expert). ``return_route``
    appends the realized [T] assignment to the return tuple. Together these
    give expert-utilization tracing and routing-pinned A/B studies (e.g.
    isolating discrete router-flip noise from matmul quantization noise —
    scripts/moe_lab.py --route-study, docs/PERF.md round 4). Both are
    top-1 only.
    """
    if (route is not None or return_route) and top_k != 1:
        raise ValueError("route tracing/forcing is top-1 only")
    orig_shape = x.shape
    d = orig_shape[-1]
    xf = x.reshape(-1, d)
    t = xf.shape[0]
    e = p["router"]["kernel"].shape[-1]
    if top_k > e:
        raise ValueError(f"top_k={top_k} > num_experts={e}")
    c = moe_capacity(t, e, top_k, capacity_factor)

    logits = jnp.einsum("td,de->te", xf.astype(jnp.float32),
                        p["router"]["kernel"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    if route is not None:
        # a forced index outside [0, E) would clamp inside take_along_axis
        # and silently zero the token's one-hot; fail loudly when concrete,
        # clip under trace (contract: route values must be in [0, E))
        route = jnp.asarray(route, jnp.int32)
        if not isinstance(route, jax.core.Tracer):
            lo, hi = int(route.min()), int(route.max())
            if lo < 0 or hi >= e:
                raise ValueError(
                    f"forced route indices must be in [0, {e}); "
                    f"got min={lo} max={hi}")
        idx = jnp.clip(route, 0, e - 1)[None]              # [1, T]
        gate = jnp.take_along_axis(probs, idx[0][:, None], 1).T  # [1, T]
    elif top_k == 1:
        idx = jnp.argmax(probs, axis=-1)[None]             # [1, T]
        gate = jnp.take_along_axis(probs, idx[0][:, None], 1).T  # [1, T]
    else:
        gate_v, idx_v = jax.lax.top_k(probs, top_k)        # [T, K]
        idx, gate = idx_v.T, gate_v.T                      # [K, T] round-major
    k = idx.shape[0]
    idx_f = idx.reshape(-1)                                # [K*T], round-major
    onehot = jax.nn.one_hot(idx_f, e, dtype=jnp.int32)     # [K*T, E]
    counts = _chunked_cumsum(onehot)                       # inclusive
    my_pos = jnp.sum((counts - onehot) * onehot, axis=-1)  # [K*T]
    kept = my_pos < c
    slot = jnp.where(kept, idx_f * c + my_pos, e * c)      # [K*T]; E*C = pad

    # inverse map: scatter TOKEN ids into their slots (round-major flatten
    # → token id = flat % T). KEPT (round, token) pairs' slots are unique;
    # every DROPPED pair shares the pad slot e*c, so no unique_indices
    # promise — duplicate writes race only on inv[e*c], discarded below
    token_ids = jnp.tile(jnp.arange(t, dtype=jnp.int32), k)
    inv = jnp.full((e * c + 1,), t, jnp.int32).at[slot].set(
        token_ids, mode="drop")
    tok = inv[: e * c].reshape(e, c)                       # [E, C]
    filled = tok < t
    tok = jnp.minimum(tok, t - 1)
    expert_in = jnp.where(filled[..., None], xf[tok], 0)   # [E, C, D]

    h = gelu(_expert_linear(p["wi"], expert_in, "ecd,edf->ecf"),
             approximate=gelu_approx)
    out = _expert_linear(p["wo"], h, "ecf,efd->ecd")
    flat = jnp.concatenate(
        [out.reshape(e * c, d), jnp.zeros((1, d), x.dtype)], 0)
    w = (gate * kept.reshape(k, t)).astype(x.dtype)        # [K, T]
    yt = jnp.sum(flat[slot.reshape(k, t)] * w[..., None], axis=0)

    f_e = jnp.mean(onehot.astype(jnp.float32), axis=0)
    aux = e * jnp.sum(f_e * jnp.mean(probs, axis=0))
    if return_route:
        return yt.reshape(orig_shape), aux, idx[0]
    return yt.reshape(orig_shape), aux


def moe_mlp(
    p: dict,
    x: Array,
    *,
    top_k: int = 1,
    capacity_factor: float = 1.25,
    gelu_approx: bool = False,
) -> tuple[Array, Array]:
    """Sparse MLP over a [..., S, D] stream. Returns (out, aux []).

    Routing is per GROUP — the leading axes (batch) — with capacity
    ``moe_capacity(S, E, k, cf)`` per group, GShard-style: the one-hot
    dispatch tensors stay [G, S, E, C] (linear in tokens), capacity slots
    don't leak between groups, and the group axis shards over 'dp' with
    the batch. A 2-D [T, D] input routes as a single group. Routing math
    runs in fp32 (router logits are tiny); expert matmuls run in the
    stream dtype (bf16 in training).
    """
    orig_shape = x.shape
    d = orig_shape[-1]
    xg = x[None] if x.ndim == 2 else x.reshape(-1, orig_shape[-2], d)
    g, s, _ = xg.shape  # [G, S, D]
    e = p["router"]["kernel"].shape[-1]
    if top_k > e:
        raise ValueError(f"top_k={top_k} > num_experts={e}")
    c = moe_capacity(s, e, top_k, capacity_factor)

    logits = jnp.einsum(
        "gsd,de->gse", xg.astype(jnp.float32),
        p["router"]["kernel"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)  # [G, S, E]

    # top-k routing as k sequential argmax rounds (k is a small static int);
    # each round's winners claim their group's capacity slots in token
    # order via a per-group cumsum
    remaining = probs
    dispatch = jnp.zeros((g, s, e, c), jnp.float32)
    combine = jnp.zeros((g, s, e, c), jnp.float32)
    # slots already taken per (group, expert), carried across rounds
    fill = jnp.zeros((g, e), jnp.int32)
    # per-expert assignment counts across ALL top-k rounds, pre-drop
    importance = jnp.zeros((e,), jnp.float32)
    for _ in range(top_k):
        idx = jnp.argmax(remaining, axis=-1)  # [G, S]
        gate = jnp.take_along_axis(remaining, idx[..., None], axis=-1)[..., 0]
        onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)  # [G, S, E]
        # position of each token within its (group, expert) slots this round
        pos_in_round = jnp.cumsum(onehot, axis=1) - onehot  # [G, S, E]
        pos = pos_in_round + fill[:, None, :].astype(jnp.float32)
        my_pos = jnp.sum(pos * onehot, axis=-1)  # [G, S]
        kept = (my_pos < c).astype(jnp.float32) * jnp.sum(onehot, axis=-1)
        slot = jax.nn.one_hot(my_pos.astype(jnp.int32), c, dtype=jnp.float32)
        disp = (onehot[..., None] * slot[..., None, :]
                * kept[..., None, None])
        dispatch = dispatch + disp
        combine = combine + disp * gate[..., None, None]
        fill = jnp.minimum(
            fill + jnp.sum(onehot * kept[..., None], axis=1).astype(jnp.int32),
            c)
        importance = importance + jnp.sum(onehot, axis=(0, 1))
        remaining = remaining * (1.0 - onehot)  # mask this round's winner

    # Switch aux loss: f_e = fraction of (token, round) assignments routed
    # to expert e across all top-k rounds, PRE-drop (capacity overflow must
    # still penalize imbalance); p_e = mean router prob
    f_e = importance / (top_k * g * s)
    p_e = jnp.mean(probs, axis=(0, 1))
    aux = e * jnp.sum(f_e * p_e)

    # [G,S,E,C] x [G,S,D] -> [G,E,C,D]: the all-to-all point on an 'ep' mesh
    expert_in = jnp.einsum("gsec,gsd->gecd", dispatch.astype(x.dtype), xg)
    h = gelu(_expert_linear(p["wi"], expert_in, "gecd,edf->gecf"),
             approximate=gelu_approx)
    out = _expert_linear(p["wo"], h, "gecf,efd->gecd")
    yt = jnp.einsum("gsec,gecd->gsd", combine.astype(x.dtype), out)
    return yt.reshape(orig_shape), aux


def block(p: dict, x: Array, cfg, *, top_k: int = 1,
          capacity_factor: float = 1.25, gelu_approx: bool = False,
          dispatch: str = "einsum", collect_ln_stats: bool = False,
          route: Array | None = None, return_route: bool = False
          ) -> tuple:
    """Pre-LN transformer block whose MLP is the sparse ``moe_mlp``:
    attention sub-block identical to ``vit.block``'s XLA path, MoE second
    half. ``dispatch``: 'einsum' (grouped, EP-shardable) or 'gather'
    (global routing, single-device/dp fast path, any top_k). Returns
    (out, aux); with ``collect_ln_stats=True`` (calibration only —
    quant.smooth_moe) returns (out, aux, stats) where stats holds the
    per-channel abs-max of the two LN outputs — the exact tensors the int8
    path quantizes per token (qkv's input and the router/expert-wi input)."""
    b, s, d = x.shape
    h = cfg.num_heads
    dh = d // h
    if route is not None and route.shape[-1] == 0:
        route = None  # forward_trunk's static no-routes placeholder
    if collect_ln_stats and "kernel_q" in p["attn"]["qkv"]:
        raise ValueError("LN-stats calibration needs the unquantized fp path")
    ln1 = layer_norm(p["norm1"], x, cfg.ln_eps)
    qkv = linear(p["attn"]["qkv"], ln1).reshape(b, s, 3, h, dh)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    attn = mha_attention(qkv[0], qkv[1], qkv[2], use_flash=False)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
    x = x + linear(p["attn"]["proj"], attn)
    ln2 = layer_norm(p["norm2"], x, cfg.ln_eps)
    if dispatch == "gather":
        r = moe_mlp_gather(p["moe"], ln2, top_k=top_k,
                           capacity_factor=capacity_factor,
                           gelu_approx=gelu_approx,
                           route=route, return_route=return_route)
        y, aux = r[0], r[1]
    elif dispatch == "einsum":
        if route is not None or return_route:
            raise ValueError("route tracing/forcing needs dispatch='gather'")
        r = moe_mlp(p["moe"], ln2, top_k=top_k,
                    capacity_factor=capacity_factor,
                    gelu_approx=gelu_approx)
        y, aux = r
    else:
        raise ValueError(f"unknown moe dispatch {dispatch!r} "
                         "(expected 'einsum' or 'gather')")
    extras = r[2:]
    if collect_ln_stats:
        stats = {
            "qkv": jnp.max(jnp.abs(ln1.astype(jnp.float32)), axis=(0, 1)),
            "wi": jnp.max(jnp.abs(ln2.astype(jnp.float32)), axis=(0, 1)),
        }
        return (x + y, aux, stats) + extras
    return (x + y, aux) + extras


def forward_trunk(params: dict, tokens: Array, cfg, *, top_k: int = 1,
                  capacity_factor: float = 1.25, gelu_approx: bool = False,
                  remat: bool = False, dispatch: str = "einsum",
                  ln_stats: bool = False, routes: Array | None = None,
                  return_routes: bool = False) -> tuple:
    """Stacked-MoE trunk over [B, S, D] tokens → ([B, S, D], mean aux).
    Blocks stacked on a leading [L] axis and scanned, like ``vit.forward``.
    ``ln_stats=True`` also returns {"qkv": [L, D], "wi": [L, D]} abs-max
    calibration stats (quant.smooth_moe). ``routes`` ([L, T] int32) forces
    per-layer token→expert assignments; ``return_routes=True`` appends the
    realized [L, T] assignments — both gather-dispatch only (see
    ``moe_mlp_gather``)."""
    block_fn = functools.partial(block, cfg=cfg, top_k=top_k,
                                 capacity_factor=capacity_factor,
                                 gelu_approx=gelu_approx, dispatch=dispatch,
                                 collect_ln_stats=ln_stats,
                                 return_route=return_routes)
    if remat:
        block_fn = jax.checkpoint(block_fn)

    def scan_body(carry, xs):
        layer_params, route_l = xs
        out = block_fn(layer_params, carry, route=route_l)
        return out[0], out[1:]

    tokens, ys = jax.lax.scan(
        scan_body, tokens,
        (params["blocks"],
         routes if routes is not None
         else jnp.zeros((_n_layers(params), 0), jnp.int32)))
    aux = jnp.mean(ys[0])
    rest = ys[1:]
    return (tokens, aux) + tuple(rest)


def _n_layers(params: dict) -> int:
    return params["blocks"]["norm1"]["scale"].shape[0]


def init(key: jax.Array, cfg, num_experts: int, depth: int | None = None,
         dtype: jnp.dtype = jnp.float32) -> dict:
    """MoE trunk params: ``depth`` stacked blocks (default cfg.depth), each
    with ``num_experts`` experts of the cfg's MLP shape."""
    d, f = cfg.embed_dim, cfg.mlp_dim
    l = depth if depth is not None else cfg.depth
    ks = jax.random.split(key, 6)

    def lin(key, *shape):
        std = shape[-2] ** -0.5
        return {"kernel": (jax.random.normal(key, shape) * std).astype(dtype),
                "bias": jnp.zeros(shape[:-2] + shape[-1:], dtype)}

    def ln(shape):
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    return {
        "blocks": {
            "norm1": ln((l, d)),
            "attn": {"qkv": lin(ks[0], l, d, 3 * d),
                     "proj": lin(ks[1], l, d, d)},
            "norm2": ln((l, d)),
            "moe": {
                "router": {"kernel": (
                    jax.random.normal(ks[2], (l, d, num_experts)) * 0.02
                ).astype(dtype)},
                "wi": lin(ks[3], l, num_experts, d, f),
                "wo": lin(ks[4], l, num_experts, f, d),
            },
        },
    }


def vit_forward(
    params: dict,
    x: Array,
    cfg,
    *,
    dtype: jnp.dtype = jnp.float32,
    remat: bool = False,
    gelu_approx: bool = False,
    ln_stats: bool = False,
    routes: Array | None = None,
    return_routes: bool = False,
) -> tuple:
    """MoE-ViT image encoder: [B, H, W, 3] → ([B, D] pooled, aux []).
    The stem (patchify, CLS, pos-embed resample) and final LN/pool are
    ``vit.forward``'s; the trunk is the Switch-MoE ``forward_trunk``.
    Selected by ``cfg.moe_experts > 0`` (``keep.encode_image``).
    ``ln_stats=True`` (calibration) returns (pooled, aux, stats).
    ``routes``/``return_routes`` force/trace per-layer token→expert
    assignments (gather dispatch only; see ``forward_trunk``)."""
    from keep_tpu.models import vit as _vit

    b, h, w, _ = x.shape
    ps = cfg.patch_size
    if h % ps or w % ps:
        raise ValueError(f"image size {(h, w)} not a multiple of patch_size {ps}")
    x = x.astype(dtype)
    tokens = _vit.patchify(params["patch_embed"], x, ps)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype),
                           (b, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = _vit.resample_pos_embed(
        params["pos_embed"], (h // ps, w // ps), cfg.num_prefix_tokens)
    tokens = tokens + pos.astype(dtype)

    out = forward_trunk(
        params, tokens, cfg, top_k=cfg.moe_top_k,
        capacity_factor=cfg.moe_capacity_factor, gelu_approx=gelu_approx,
        remat=remat, dispatch=getattr(cfg, "moe_dispatch", "einsum"),
        ln_stats=ln_stats, routes=routes, return_routes=return_routes)
    tokens = layer_norm(params["norm"], out[0], cfg.ln_eps)
    return (tokens[:, 0],) + out[1:]


def init_vit(key: jax.Array, cfg, dtype: jnp.dtype = jnp.float32) -> dict:
    """Full MoE-ViT visual params: vit-shaped stem/norm + MoE trunk blocks
    (``cfg.moe_experts`` experts per layer)."""
    k_stem, k_trunk = jax.random.split(key)
    d = cfg.embed_dim

    def trunc(key, shape, std=0.02):
        return (jax.random.truncated_normal(key, -2, 2, shape) * std).astype(dtype)

    ks = jax.random.split(k_stem, 3)
    pdim = cfg.patch_size * cfg.patch_size * 3
    out = init(k_trunk, cfg, num_experts=cfg.moe_experts, dtype=dtype)
    out.update({
        "patch_embed": {
            "kernel": (jax.random.normal(ks[0], (pdim, d)) * pdim**-0.5
                       ).astype(dtype),
            "bias": jnp.zeros((d,), dtype),
        },
        "cls_token": trunc(ks[1], (1, 1, d)),
        "pos_embed": trunc(
            ks[2], (1, cfg.num_prefix_tokens + cfg.num_patches, d)),
        "norm": {"scale": jnp.ones((d,), dtype),
                 "bias": jnp.zeros((d,), dtype)},
    })
    return out


def ep_shardings(params, mesh, axis: str = "ep"):
    """NamedShardings: expert-stacked leaves (paths through 'moe' → wi/wo)
    shard their expert axis over ``axis``; everything else (router, attn,
    LN) replicates. Works for params AND optimizer moments (mirrored
    paths). The expert axis is positional: kernels are [..., E, in, out]
    (ndim-3), biases [..., E, out] (ndim-2); leaves whose E doesn't divide
    the mesh axis replicate rather than error."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_ep = mesh.shape[axis]

    def one(path, leaf):
        keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        nd = np.ndim(leaf)
        spec = [None] * nd
        if "moe" in keys and any(k in ("wi", "wo") for k in keys):
            e_ax = nd - 3 if any(
                k in ("kernel", "kernel_q") for k in keys) else nd - 2
            if 0 <= e_ax < nd and np.shape(leaf)[e_ax] % n_ep == 0:
                spec[e_ax] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(one, params)


def place_ep(params, mesh, axis: str = "ep"):
    """device_put with the expert-parallel shardings."""
    return jax.tree.map(jax.device_put, params, ep_shardings(params, mesh, axis))
