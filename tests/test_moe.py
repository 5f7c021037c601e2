"""MoE MLP + trunk (models/moe.py): routing math, capacity drops, Switch
aux loss, dense parity with identical experts, grads through the router,
and expert-parallel ('ep') sharding parity on the 8-device mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.configs import ViTConfig
from keep_tpu.models import moe


def tiny_cfg():
    return ViTConfig(embed_dim=32, depth=2, num_heads=4, mlp_ratio=2.0,
                     patch_size=4, img_size=16)


def dense_mlp(wi, wo, x):
    h = jax.nn.gelu(x @ wi["kernel"][0] + wi["bias"][0], approximate=False)
    return h @ wo["kernel"][0] + wo["bias"][0]


def make_moe_params(key, d=32, f=64, e=4):
    ks = jax.random.split(key, 4)
    return {
        "router": {"kernel": jax.random.normal(ks[0], (d, e)) * 0.02},
        "wi": {"kernel": jax.random.normal(ks[1], (e, d, f)) * d**-0.5,
               "bias": jnp.zeros((e, f))},
        "wo": {"kernel": jax.random.normal(ks[2], (e, f, d)) * f**-0.5,
               "bias": jnp.zeros((e, d))},
    }


@pytest.mark.parametrize("path", ["einsum", "gather"])
def test_int8_expert_mlp_matches_float(path):
    """Quantized wi/wo (per-expert per-column int8 scales) track the float
    MoE MLP closely on BOTH dispatch paths, and routing (which tokens land
    where — visible through which outputs are zero) is identical since the
    fp32 router is untouched."""
    from keep_tpu.quant import MOE_TARGETS, quantize_linear_weights

    p = make_moe_params(jax.random.PRNGKey(0))
    qp = quantize_linear_weights({"moe": p}, MOE_TARGETS)["moe"]
    assert qp["wi"]["kernel_q"].dtype == jnp.int8
    assert qp["wo"]["scale"].shape == (4, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
    fn = moe.moe_mlp_gather if path == "gather" else moe.moe_mlp
    y, aux = fn(p, x, capacity_factor=2.0)
    yq, auxq = fn(qp, x, capacity_factor=2.0)
    np.testing.assert_allclose(np.asarray(auxq), np.asarray(aux), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(yq), np.asarray(y),
                               rtol=0.15, atol=0.02)
    rel = np.linalg.norm(np.asarray(yq - y)) / np.linalg.norm(np.asarray(y))
    assert rel < 0.05, rel
    np.testing.assert_array_equal(np.asarray(y) == 0, np.asarray(yq) == 0)


def test_identical_experts_match_gated_dense():
    """With every expert carrying the SAME weights and capacity ample, the
    MoE output must equal gate * dense_mlp(x) token-for-token (top-1 gate =
    the router's max softmax prob)."""
    key = jax.random.PRNGKey(0)
    p = make_moe_params(key)
    # copy expert 0 into all experts
    for w in ("wi", "wo"):
        p[w] = {k: jnp.broadcast_to(v[:1], v.shape) for k, v in p[w].items()}
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 5, 32))
    out, aux = moe.moe_mlp(p, x, top_k=1, capacity_factor=4.0)

    probs = jax.nn.softmax(
        x.reshape(-1, 32) @ p["router"]["kernel"], axis=-1)
    gate = jnp.max(probs, axis=-1).reshape(6, 5, 1)
    want = gate * dense_mlp(p["wi"], p["wo"], x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(float(aux))


def test_top2_sums_both_gates():
    """top_k=2 with identical experts → (g1 + g2) * dense(x)."""
    p = make_moe_params(jax.random.PRNGKey(2))
    for w in ("wi", "wo"):
        p[w] = {k: jnp.broadcast_to(v[:1], v.shape) for k, v in p[w].items()}
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 32))
    out, _ = moe.moe_mlp(p, x, top_k=2, capacity_factor=8.0)
    probs = jax.nn.softmax(x.reshape(-1, 32) @ p["router"]["kernel"], axis=-1)
    top2 = jnp.sum(jax.lax.top_k(probs, 2)[0], axis=-1).reshape(4, 3, 1)
    want = top2 * dense_mlp(p["wi"], p["wo"], x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_capacity_drops_are_zero_rows():
    """Route every token to expert 0 with capacity 1: token 0 is served,
    later tokens are dropped (zero MLP contribution)."""
    p = make_moe_params(jax.random.PRNGKey(4))
    # zero router -> uniform logits -> argmax tie-breaks to expert 0 for
    # every token (gate 1/E, nonzero)
    p["router"]["kernel"] = jnp.zeros_like(p["router"]["kernel"])
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 32))
    # T=8, E=4, top_k=1, cf=0.5 -> capacity = ceil(8/4*0.5) = 1
    out, _ = moe.moe_mlp(p, x, top_k=1, capacity_factor=0.5)
    out = np.asarray(out)[0]
    assert np.abs(out[0]).max() > 0
    np.testing.assert_allclose(out[1:], 0.0, atol=1e-6)


def test_capacity_is_per_group():
    """Routing is grouped by batch row (GShard): each group has its own
    capacity slots, so token 0 of EVERY group is served (a global flat
    routing would serve only the first group's token)."""
    p = make_moe_params(jax.random.PRNGKey(12))
    p["router"]["kernel"] = jnp.zeros_like(p["router"]["kernel"])
    x = jax.random.normal(jax.random.PRNGKey(13), (3, 8, 32))
    out, _ = moe.moe_mlp(p, x, top_k=1, capacity_factor=0.5)  # C=1 per group
    out = np.asarray(out)
    for grp in range(3):
        assert np.abs(out[grp, 0]).max() > 0
        np.testing.assert_allclose(out[grp, 1:], 0.0, atol=1e-6)


def test_top_k_exceeding_experts_raises():
    p = make_moe_params(jax.random.PRNGKey(14))
    x = jax.random.normal(jax.random.PRNGKey(15), (1, 4, 32))
    with pytest.raises(ValueError, match="top_k"):
        moe.moe_mlp(p, x, top_k=5)


def test_aux_loss_balance():
    """Uniform router → aux == 1 (perfect balance); a router that sends
    everything to one expert → aux ≈ E."""
    p = make_moe_params(jax.random.PRNGKey(6))
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 32))
    p["router"]["kernel"] = jnp.zeros_like(p["router"]["kernel"])
    _, aux_uniform = moe.moe_mlp(p, x, capacity_factor=8.0)
    assert abs(float(aux_uniform) - 1.0) < 1e-5
    # pin feature 0 to 1.0 and give only kernel[0, 1] weight: every token's
    # expert-1 logit is exactly +100 -> total collapse onto expert 1
    x = x.at[..., 0].set(1.0)
    p["router"]["kernel"] = p["router"]["kernel"].at[0, 1].set(100.0)
    _, aux_collapsed = moe.moe_mlp(p, x, capacity_factor=8.0)
    assert float(aux_collapsed) > 3.5  # ≈ E = 4


def test_trunk_forward_and_grads():
    """Stacked MoE trunk scans; a loss over (trunk output + aux) produces
    finite, nonzero grads including through the router."""
    cfg = tiny_cfg()
    params = moe.init(jax.random.PRNGKey(8), cfg, num_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 17, 32))

    def loss_fn(params):
        y, aux = moe.forward_trunk(params, x, cfg, capacity_factor=2.0)
        return jnp.mean(y**2) + 0.01 * aux

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert float(jnp.abs(grads["blocks"]["moe"]["router"]["kernel"]).max()) > 0
    assert float(jnp.abs(grads["blocks"]["moe"]["wi"]["kernel"]).max()) > 0


def test_keep_moe_integration():
    """KEEPConfig with vision.moe_experts>0: init builds the MoE visual
    params, encode_image routes through moe.vit_forward and returns the
    aux loss on request; the dense path reports aux == 0."""
    from keep_tpu.configs import BertConfig, KEEPConfig
    from keep_tpu.models import keep

    cfg = KEEPConfig(
        vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                         num_heads=2, moe_experts=4, moe_capacity_factor=2.0),
        text=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=32),
        projection_dim=32,
    )
    params = keep.init(jax.random.PRNGKey(0), cfg)
    assert "moe" in params["visual"]["blocks"]
    assert params["visual"]["blocks"]["moe"]["wi"]["kernel"].shape == (
        2, 4, 32, cfg.vision.mlp_dim)
    px = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    feats, aux = keep.encode_image(params, px, cfg, return_aux=True)
    assert feats.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1),
                               1.0, rtol=1e-5)
    assert np.isfinite(float(aux)) and float(aux) > 0

    dense = KEEPConfig(
        vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=2,
                         num_heads=2),
        text=cfg.text, projection_dim=32)
    dparams = keep.init(jax.random.PRNGKey(0), dense)
    _, daux = keep.encode_image(dparams, px, dense, return_aux=True)
    assert float(daux) == 0.0

    # int8 quantization covers the MoE trunk too (expert wi/wo + attention
    # + stem matmuls go int8); calibrated quantization is covered in
    # tests/test_quant.py (smooth_moe)
    model = keep.KEEPModel(params=params, cfg=cfg)
    qmodel = model.quantize()
    qblocks = qmodel.params["visual"]["blocks"]
    assert qblocks["moe"]["wi"]["kernel_q"].dtype == jnp.int8
    assert qblocks["moe"]["wi"]["scale"].shape == (2, 4, cfg.vision.mlp_dim)
    assert "kernel" in qblocks["moe"]["router"]  # router stays fp
    qfeats = qmodel.encode_image(px)
    cos = float(jnp.mean(jnp.sum(feats * qfeats, axis=-1)))
    assert cos > 0.99, cos


def test_ep_sharding_parity():
    """Experts sharded over an 8-device (dp=2, ep=4) mesh: the wi/wo kernels
    actually split on 'ep', and the jitted trunk forward matches the
    unsharded result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_cfg()
    params = moe.init(jax.random.PRNGKey(10), cfg, num_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(11), (4, 17, 32))

    def fwd(params, x):
        y, aux = moe.forward_trunk(params, x, cfg, capacity_factor=2.0)
        return y, aux

    y_ref, aux_ref = jax.jit(fwd)(params, x)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("dp", "ep"))
    sh = moe.ep_shardings(params, mesh)
    assert sh["blocks"]["moe"]["wi"]["kernel"].spec == P(None, "ep", None, None)
    assert sh["blocks"]["moe"]["wi"]["bias"].spec == P(None, "ep", None)
    assert sh["blocks"]["moe"]["wo"]["kernel"].spec == P(None, "ep", None, None)
    assert sh["blocks"]["moe"]["router"]["kernel"].spec == P(None, None, None)
    with jax.set_mesh(mesh):
        sp = moe.place_ep(params, mesh)
        xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
        y_sh, aux_sh = jax.jit(fwd)(sp, xs)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
    assert abs(float(aux_sh) - float(aux_ref)) < 1e-5


class TestGatherDispatch:
    """`moe_mlp_gather` (dispatch='gather'): global-routing top-1 fast path
    — must match the einsum path when no tokens drop, keep its own
    capacity semantics when they do, and train."""

    def test_matches_einsum_when_no_drops(self):
        p = make_moe_params(jax.random.PRNGKey(20))
        x = jax.random.normal(jax.random.PRNGKey(21), (6, 5, 32))
        ref, aux_ref = moe.moe_mlp(p, x, top_k=1, capacity_factor=4.0)
        out, aux = moe.moe_mlp_gather(p, x, capacity_factor=4.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # aux is identical: same router, same pre-drop assignment counts
        assert abs(float(aux) - float(aux_ref)) < 1e-6

    def test_identical_experts_match_gated_dense(self):
        p = make_moe_params(jax.random.PRNGKey(22))
        for w in ("wi", "wo"):
            p[w] = {k: jnp.broadcast_to(v[:1], v.shape) for k, v in p[w].items()}
        x = jax.random.normal(jax.random.PRNGKey(23), (4, 7, 32))
        out, _ = moe.moe_mlp_gather(p, x, capacity_factor=4.0)
        probs = jax.nn.softmax(x.reshape(-1, 32) @ p["router"]["kernel"], -1)
        gate = jnp.max(probs, axis=-1).reshape(4, 7, 1)
        want = gate * dense_mlp(p["wi"], p["wo"], x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_capacity_drops_are_zero_rows(self):
        """Global capacity: route everything to expert 0; tokens beyond
        C = ceil(T/E * cf) contribute exactly zero."""
        p = make_moe_params(jax.random.PRNGKey(24))
        x = jax.random.normal(jax.random.PRNGKey(25), (2, 8, 32))
        x = x.at[..., 0].set(1.0)
        p["router"]["kernel"] = jnp.zeros_like(
            p["router"]["kernel"]).at[0, 0].set(100.0)
        out, _ = moe.moe_mlp_gather(p, x, capacity_factor=1.0)
        c = moe.moe_capacity(16, 4, 1, 1.0)  # = 4 slots, global
        flat = np.asarray(out).reshape(16, 32)
        assert np.all(flat[:c] != 0)
        np.testing.assert_array_equal(flat[c:], 0)

    def test_global_routing_beats_grouped_drops(self):
        """The same skewed batch drops FEWER tokens under global routing
        than under per-group capacity (the gather path's semantic edge):
        pack all expert-0 traffic into group 0."""
        p = make_moe_params(jax.random.PRNGKey(26))
        x = jax.random.normal(jax.random.PRNGKey(27), (2, 8, 32)) * 0.01
        # group 0 tokens all route to expert 0; group 1 spreads uniformly
        x = x.at[0, :, 0].set(1.0)
        p["router"]["kernel"] = jnp.zeros_like(
            p["router"]["kernel"]).at[0, 0].set(100.0)
        grouped, _ = moe.moe_mlp(p, x, top_k=1, capacity_factor=1.0)
        glob, _ = moe.moe_mlp_gather(p, x, capacity_factor=1.0)
        dropped_grouped = int(np.sum(~np.asarray(grouped).any(-1)))
        dropped_global = int(np.sum(~np.asarray(glob).any(-1)))
        assert dropped_global < dropped_grouped

    def test_trunk_dispatch_flag_and_grads(self):
        cfg = tiny_cfg()
        params = moe.init(jax.random.PRNGKey(28), cfg, num_experts=4)
        x = jax.random.normal(jax.random.PRNGKey(29), (2, 17, 32))

        def loss_fn(params):
            y, aux = moe.forward_trunk(params, x, cfg, capacity_factor=2.0,
                                       dispatch="gather")
            return jnp.mean(y**2) + 0.01 * aux

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree.leaves(grads))
        assert float(jnp.abs(grads["blocks"]["moe"]["router"]["kernel"]).max()) > 0

    def test_unknown_dispatch_raises(self):
        cfg = tiny_cfg()
        params = moe.init(jax.random.PRNGKey(30), cfg, num_experts=4)
        x = jax.random.normal(jax.random.PRNGKey(31), (1, 17, 32))
        with pytest.raises(ValueError, match="dispatch"):
            moe.forward_trunk(params, x, cfg, dispatch="bogus")

    def test_topk2_native_matches_einsum_no_drops(self):
        """dispatch='gather' handles top_k=2 natively (round 4). At no-drop
        capacity the per-token output is slot-numbering-independent, so it
        matches the einsum path exactly; at tight capacity the two differ
        only in WHICH pairs drop (global vs per-group capacity)."""
        cfg = tiny_cfg()
        params = moe.init(jax.random.PRNGKey(32), cfg, num_experts=4)
        x = jax.random.normal(jax.random.PRNGKey(33), (2, 17, 32))
        a, aux_a = moe.forward_trunk(params, x, cfg, top_k=2,
                                     dispatch="gather", capacity_factor=4.0)
        b, aux_b = moe.forward_trunk(params, x, cfg, top_k=2,
                                     dispatch="einsum", capacity_factor=4.0)
        # k>=2 sums the per-expert contributions in different orders
        # (einsum: one [E,C] dot accumulation; gather: explicit k-row sum)
        # -> reassociation noise only
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(float(aux_a), float(aux_b), rtol=1e-6)

    def test_topk2_gather_gates_sum_both_experts(self):
        """Identical experts ⇒ top-2 output = (p1+p2)·dense(x) per token
        (raw-prob gates, GShard-unnormalized, matching moe_mlp)."""
        p = make_moe_params(jax.random.PRNGKey(40), d=32, f=64, e=4)
        for t in ("wi", "wo"):
            k0 = p[t]["kernel"][0]
            p[t]["kernel"] = jnp.broadcast_to(k0, p[t]["kernel"].shape)
        x = jax.random.normal(jax.random.PRNGKey(41), (30, 32))
        y, _ = moe.moe_mlp_gather(p, x, top_k=2, capacity_factor=4.0)
        logits = x @ p["router"]["kernel"]
        probs = jax.nn.softmax(logits, -1)
        top2 = jnp.sum(jax.lax.top_k(probs, 2)[0], -1)
        want = dense_mlp(p["wi"], p["wo"],
                         x[None])[0] * top2[:, None]
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_topk_route_force_raises(self):
        p = make_moe_params(jax.random.PRNGKey(42))
        x = jnp.zeros((8, 32))
        with pytest.raises(ValueError, match="top-1"):
            moe.moe_mlp_gather(p, x, top_k=2, return_route=True)

    def test_chunked_cumsum_matches_flat(self):
        rng = np.random.default_rng(0)
        for t in (1, 7, 128, 129, 1000):
            x = jnp.asarray(rng.integers(0, 3, (t, 5)), jnp.int32)
            np.testing.assert_array_equal(
                np.asarray(moe._chunked_cumsum(x)),
                np.cumsum(np.asarray(x), 0))


class TestRouteTraceAndPin:
    """Round-4 observability: trace token→expert assignments and force them
    (the decomposition tool behind the MoE-int8 route study, docs/PERF.md)."""

    def _cfg(self):
        return ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                         num_heads=4, moe_experts=4, moe_dispatch="gather")

    def test_trace_is_noninvasive_and_pin_roundtrips(self):
        cfg = self._cfg()
        params = moe.init_vit(jax.random.PRNGKey(1), cfg)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (4, 32, 32, 3)), jnp.float32)
        ref = np.asarray(moe.vit_forward(params, x, cfg)[0])
        feat, _, routes = moe.vit_forward(params, x, cfg, return_routes=True)
        assert routes.shape == (cfg.depth, 4 * 17)  # [L, B*S]
        assert routes.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(feat), ref)
        # pinning to the model's own routes is the identity
        pinned = moe.vit_forward(params, x, cfg, routes=routes)[0]
        np.testing.assert_array_equal(np.asarray(pinned), ref)
        # pinning to different routes changes the output
        other = moe.vit_forward(params, x, cfg,
                                routes=(routes + 1) % cfg.moe_experts)[0]
        assert not np.allclose(np.asarray(other), ref)

    def test_compose_with_ln_stats_and_jit(self):
        cfg = self._cfg()
        params = moe.init_vit(jax.random.PRNGKey(1), cfg)
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (2, 32, 32, 3)), jnp.float32)
        fn = jax.jit(lambda p, x: moe.vit_forward(
            p, x, cfg, ln_stats=True, return_routes=True))
        _, _, stats, routes = fn(params, x)
        assert sorted(stats) == ["qkv", "wi"]
        assert routes.shape == (cfg.depth, 2 * 17)

    def test_route_force_requires_gather(self):
        cfg = dataclasses.replace(self._cfg(), moe_dispatch="einsum")
        params = moe.init_vit(jax.random.PRNGKey(1), cfg)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        with pytest.raises(ValueError, match="gather"):
            moe.vit_forward(params, x, cfg, return_routes=True)
