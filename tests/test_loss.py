"""Loss tests: CLIP InfoNCE vs torch cross-entropy; HyMetricLoss vs an
independent loop-based oracle of the documented pooling math (SURVEY §2.1 #16);
distributed gather under shard_map on the 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from keep_tpu.train.loss import (
    DOGraph,
    clip_loss,
    hy_metric_loss,
    mask_contrastive_loss,
)


def test_clip_loss_matches_torch(rng):
    img = rng.standard_normal((8, 16)).astype(np.float32)
    txt = rng.standard_normal((8, 16)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    scale = 25.0
    got = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), scale))
    li = torch.tensor(scale * img @ txt.T)
    labels = torch.arange(8)
    ref = 0.5 * (
        torch.nn.functional.cross_entropy(li, labels)
        + torch.nn.functional.cross_entropy(li.T, labels)
    )
    assert abs(got - float(ref)) < 1e-5


def test_mask_contrastive(rng):
    logits = rng.standard_normal((6, 6)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2])
    got = float(mask_contrastive_loss(jnp.asarray(logits), jnp.asarray(labels)))
    # oracle: denominator over different-label pairs + diagonal
    total = 0.0
    for i in range(6):
        denom = 0.0
        for j in range(6):
            if i == j or labels[i] != labels[j]:
                denom += np.exp(logits[i, j])
        total += -np.log(np.exp(logits[i, i]) / denom)
    assert abs(got - total / 6) < 1e-5


def test_clip_loss_sharded_equals_global(rng):
    from jax.sharding import Mesh, PartitionSpec as P

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("dp",))
    img = rng.standard_normal((16, 8)).astype(np.float32)
    txt = rng.standard_normal((16, 8)).astype(np.float32)

    global_loss = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), 10.0))

    fn = jax.shard_map(
        functools.partial(clip_loss, axis_name="dp"),
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P()),
        out_specs=P(),
    )
    sharded = float(fn(jnp.asarray(img), jnp.asarray(txt), jnp.float32(10.0)))
    assert abs(sharded - global_loss) < 1e-5

    local_fn = jax.shard_map(
        functools.partial(clip_loss, axis_name="dp", local_loss=True),
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P()),
        out_specs=P(),
    )
    # local_loss has per-shard CE means averaged; equal here since shards equal-size
    local = float(local_fn(jnp.asarray(img), jnp.asarray(txt), jnp.float32(10.0)))
    assert abs(local - global_loss) < 1e-5


# ---------------------------------------------------------------------------
# HyMetricLoss oracle
# ---------------------------------------------------------------------------


def oracle_metric_loss(sim, scale, n_id, n_ins, loss_type):
    """Loop-based restatement of the group hard-mining pools."""
    n = n_id * n_ins
    sf = sim * scale
    group = lambda a: a // n_ins

    def e(a, b):  # exp with in-group sign flip (main block only)
        s = -1.0 if group(a) == group(b) else 1.0
        return np.exp(sf[a, b] * s)

    # stage 1: per instance a, per group j: sum over j's members
    gs = np.zeros((n, n_id))
    for a in range(n):
        for j in range(n_id):
            gs[a, j] = sum(e(a, b) for b in range(j * n_ins, (j + 1) * n_ins))

    def finalize(mat):
        l1 = mat / np.abs(mat).sum(1, keepdims=True)
        return -np.mean(np.log(np.diagonal(l1)))

    if loss_type == "hp-hn":
        gg = np.zeros((n_id, n_id))
        for i in range(n_id):
            for j in range(n_id):
                gg[i, j] = gs[i * n_ins : (i + 1) * n_ins, j].sum()
        for i in range(n_id):
            gg[i, i] = 1.0 / gg[i, i]
        return finalize(gg)

    if loss_type == "lhp-hn":
        staged = gs.copy()
        for a in range(n):
            staged[a, group(a)] = 1.0 / gs[a, group(a)]
        gg = np.zeros((n_id, n_id))
        for i in range(n_id):
            gg[i] = staged[i * n_ins : (i + 1) * n_ins].sum(0)
        if sim.shape[1] != n:  # extra negative block, same group structure
            extra = np.zeros((n_id, 1))
            for i in range(n_id):
                for a in range(i * n_ins, (i + 1) * n_ins):
                    for b in range(i * n_ins, (i + 1) * n_ins):
                        extra[i, 0] += np.exp(sf[a, n + b])
            gg = np.concatenate([gg, extra], axis=1)
        return finalize(gg)

    if loss_type == "hp-lhn":
        staged = 1.0 / gs
        for a in range(n):
            staged[a, group(a)] = gs[a, group(a)]
        gg = np.zeros((n_id, n_id))
        for i in range(n_id):
            gg[i] = staged[i * n_ins : (i + 1) * n_ins].sum(0)
        gg = 1.0 / gg
        return finalize(gg)

    if loss_type == "lhp-lhn":
        staged = 1.0 / gs
        gg = np.zeros((n_id, n_id))
        for i in range(n_id):
            gg[i] = staged[i * n_ins : (i + 1) * n_ins].sum(0)
        out = 1.0 / gg
        for i in range(n_id):
            out[i, i] = gg[i, i]
        return finalize(out)


def oracle_hy_loss(img, txt, node_conn, scale, n_id, loss_type, unknown=None):
    imgn = img / np.linalg.norm(img, axis=1, keepdims=True)
    txtn = txt / np.linalg.norm(txt, axis=1, keepdims=True)
    n = img.shape[0]
    n_ins = n // n_id
    sim = imgn @ txtn.T
    mask = np.kron(node_conn, np.ones((n_ins, n_ins)))
    if txt.shape[0] != n:
        mask = np.concatenate(
            [mask, np.kron(unknown, np.ones((n_ins, n_ins)))], axis=1
        )
    sim[mask == -1] = -1.0
    it = oracle_metric_loss(sim, scale, n_id, n_ins, loss_type) / 2
    ti = oracle_metric_loss(sim[:n, :n].T, scale, n_id, n_ins, loss_type) / 2
    return it + ti


@pytest.mark.parametrize("loss_type", ["hp-hn", "lhp-hn", "hp-lhn", "lhp-lhn"])
def test_hy_metric_loss_matches_oracle(loss_type, rng):
    n_id, n_ins, d = 4, 3, 16
    n = n_id * n_ins
    img = rng.standard_normal((n, d)).astype(np.float32)
    txt = rng.standard_normal((n, d)).astype(np.float32)
    node = np.ones((n_id, n_id), np.float32)
    node[0, 2] = node[2, 0] = -1.0  # one DO-related pair masked
    scale = 5.0
    got = float(
        hy_metric_loss(
            jnp.asarray(img), jnp.asarray(txt), jnp.asarray(node), scale,
            caption_num=n_id, loss_type=loss_type,
        )
    )
    ref = oracle_hy_loss(img, txt, node, scale, n_id, loss_type)
    assert got == pytest.approx(ref, rel=1e-4), loss_type


@pytest.mark.parametrize("loss_type", ["hp-hn", "lhp-hn", "hp-lhn", "lhp-lhn"])
def test_hy_metric_loss_finite_at_max_scale(loss_type):
    """The trainer clamps logit_scale at ln(100); at scale=100 a cross-group
    pair with sim ~1 drives exp(scale*sim) past fp32 max. The exponent clamp
    must keep every variant finite (a raw exp infs, then 0*inf NaNs)."""
    n_id, n_ins, d = 3, 2, 8
    n = n_id * n_ins
    v = np.zeros((n, d), np.float32)
    v[:, 0] = 1.0  # every feature identical: all sims exactly 1
    node = np.ones((n_id, n_id), np.float32)
    loss = float(hy_metric_loss(
        jnp.asarray(v), jnp.asarray(v), jnp.asarray(node), 100.0,
        caption_num=n_id, loss_type=loss_type,
    ))
    assert np.isfinite(loss), (loss_type, loss)


def test_metric_loss_hp_lhn_guards_underflowed_positives():
    """hp-lhn's pooled positive column must be guarded like the sibling
    variants: if every in-group exp(-scale*sim) underflows to exactly 0,
    1/pooled would inf -> NaN."""
    from keep_tpu.train.loss import _metric_loss

    n_id, n_ins = 2, 2
    n = n_id * n_ins
    sim = np.full((n, n), 0.1, np.float32)
    within = np.kron(np.eye(n_id), np.ones((n_ins, n_ins))).astype(bool)
    # in-group exponent -110 -> exp underflows to exactly 0 (below the fp32
    # subnormal floor ~e^-103) even on CPU
    sim[within] = 1.1
    loss = float(_metric_loss(jnp.asarray(sim), 100.0, n_id, n_ins, "hp-lhn"))
    assert np.isfinite(loss)


def test_hy_metric_loss_extra_negatives(rng):
    n_id, n_ins, d = 3, 2, 8
    n = n_id * n_ins
    img = rng.standard_normal((n, d)).astype(np.float32)
    txt = rng.standard_normal((2 * n, d)).astype(np.float32)  # extra block
    node = np.ones((n_id, n_id), np.float32)
    labels = ["a", "unknown", "c"]
    unknown = DOGraph({}).unknown_connection(labels)
    got = float(
        hy_metric_loss(
            jnp.asarray(img), jnp.asarray(txt), jnp.asarray(node), 4.0,
            caption_num=n_id, loss_type="lhp-hn",
            unknown_connection=jnp.asarray(unknown),
        )
    )
    ref = oracle_hy_loss(img, txt, node, 4.0, n_id, "lhp-hn", unknown=unknown)
    assert got == pytest.approx(ref, rel=1e-4)


def test_do_graph_reachability():
    g = DOGraph(
        {
            "cancer": [],
            "carcinoma": ["cancer"],
            "adenocarcinoma": ["carcinoma"],
            "melanoma": ["cancer"],
        }
    )
    assert g.reachable("cancer", "adenocarcinoma")
    assert g.reachable("carcinoma", "adenocarcinoma")
    assert not g.reachable("melanoma", "adenocarcinoma")
    assert not g.reachable("adenocarcinoma", "cancer")  # one-directional
    assert g.reachable("cancer", "cancer")
    assert not g.reachable("missing", "cancer")

    conn = g.node_connection(["adenocarcinoma", "melanoma", "cancer"])
    # ancestor/descendant pairs masked either direction
    assert conn[0, 2] == -1 and conn[2, 0] == -1
    assert conn[1, 2] == -1 and conn[2, 1] == -1
    assert conn[0, 1] == 1 and conn[1, 0] == 1
    assert (np.diag(conn) == 1).all()
