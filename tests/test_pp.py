"""Pipeline parallelism (parallel/pp.py): GPipe schedule over the 'pp' mesh
axis must be EXACTLY the single-device layer scan — same values, staged
params, one ppermute hop per boundary. Runs on the 8-virtual-device CPU
mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from keep_tpu.configs import ViTConfig
from keep_tpu.models import vit
from keep_tpu.parallel.pp import (
    pipeline_blocks,
    place_stages,
    stage_shardings,
    vit_forward_pp,
)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("pp",))


def _toy_blocks(rng, L, d):
    return {
        "w": jnp.asarray(rng.standard_normal((L, d, d), dtype=np.float32) / d),
        "b": jnp.asarray(rng.standard_normal((L, d), dtype=np.float32)),
    }


def _toy_block_fn(lp, h):
    return jnp.tanh(h @ lp["w"] + lp["b"])


def _toy_ref(blocks, x):
    def body(c, lp):
        return _toy_block_fn(lp, c), None
    return jax.lax.scan(body, x, blocks)[0]


@pytest.mark.parametrize("n_stages,m", [(2, 2), (4, 4), (4, 8), (8, 8)])
def test_pipeline_matches_scan(rng, n_stages, m):
    L, d, b = 8, 16, 8
    blocks = _toy_blocks(rng, L, d)
    x = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    ref = np.asarray(_toy_ref(blocks, x))
    mesh = _mesh(n_stages)
    got = jax.jit(
        lambda bl, xx: pipeline_blocks(_toy_block_fn, bl, xx, mesh,
                                       num_microbatches=m)
    )(blocks, x)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6, rtol=1e-6)


def test_pipeline_staged_params_really_split(rng):
    """place_stages puts layer slabs on their own devices: stage i's shard
    carries L/n layers, and the pipelined result still matches."""
    L, d, b, n = 8, 16, 8, 4
    blocks = _toy_blocks(rng, L, d)
    mesh = _mesh(n)
    placed = place_stages(blocks, mesh)
    assert stage_shardings(blocks, mesh)["w"].spec == P("pp")
    assert placed["w"].addressable_shards[0].data.shape == (L // n, d, d)
    x = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    got = jax.jit(
        lambda bl, xx: pipeline_blocks(_toy_block_fn, bl, xx, mesh)
    )(placed, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_toy_ref(blocks, x)),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_single_stage_degenerates_to_scan(rng):
    blocks = _toy_blocks(rng, 4, 8)
    x = jnp.asarray(rng.standard_normal((4, 8), dtype=np.float32))
    got = pipeline_blocks(_toy_block_fn, blocks, x, _mesh(1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(_toy_ref(blocks, x)),
                               atol=1e-6)


def test_pipeline_shape_errors(rng):
    blocks = _toy_blocks(rng, 6, 8)  # 6 layers not divisible by 4 stages
    x = jnp.asarray(rng.standard_normal((4, 8), dtype=np.float32))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_blocks(_toy_block_fn, blocks, x, _mesh(4))
    blocks = _toy_blocks(rng, 8, 8)
    x = jnp.asarray(rng.standard_normal((3, 8), dtype=np.float32))  # B=3, m=4
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_blocks(_toy_block_fn, blocks, x, _mesh(4))


def test_pipeline_is_differentiable(rng):
    """Grads through the pipelined scan match the plain scan — the GPipe
    forward reverses into a valid (memory-naive) backward schedule, so the
    same code path trains."""
    L, d, b, n = 4, 8, 4, 4
    blocks = _toy_blocks(rng, L, d)
    x = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    mesh = _mesh(n)

    def loss_pp(bl):
        return jnp.sum(pipeline_blocks(_toy_block_fn, bl, x, mesh) ** 2)

    def loss_ref(bl):
        return jnp.sum(_toy_ref(bl, x) ** 2)

    g_pp = jax.grad(loss_pp)(blocks)
    g_ref = jax.grad(loss_ref)(blocks)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5),
        g_pp, g_ref,
    )


def test_pipeline_dp_composition(rng):
    """pipeline_blocks(batch_axis='dp') on a 2-D (dp, pp) mesh: values AND
    grads match the plain scan while the microbatch batch dim stays
    dp-sharded through the shard_map (no gather)."""
    from jax.sharding import NamedSharding

    L, d, b = 8, 16, 16
    blocks = _toy_blocks(rng, L, d)
    x = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "pp"))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))

    def run(bl, xx):
        return pipeline_blocks(_toy_block_fn, bl, xx, mesh,
                               num_microbatches=4, batch_axis="dp")

    got = jax.jit(run)(blocks, xs)
    # output keeps the dp batch sharding
    assert "dp" in str(got.sharding.spec) or got.sharding.spec == P("dp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(_toy_ref(blocks, x)),
                               atol=1e-6, rtol=1e-6)

    def loss_pp(bl):
        return jnp.sum(run(bl, xs) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(blocks)
    g_ref = jax.grad(lambda bl: jnp.sum(_toy_ref(bl, x) ** 2))(blocks)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5),
        g_pp, g_ref,
    )


def test_pipeline_remat_matches(rng):
    """remat=True (per-layer jax.checkpoint inside the stage scan) is
    numerically identical in both values and grads."""
    L, d, b, n = 4, 8, 4, 4
    blocks = _toy_blocks(rng, L, d)
    x = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    mesh = _mesh(n)

    def loss(bl, remat):
        return jnp.sum(pipeline_blocks(_toy_block_fn, bl, x, mesh,
                                       remat=remat) ** 2)

    g0 = jax.grad(lambda bl: loss(bl, False))(blocks)
    g1 = jax.grad(lambda bl: loss(bl, True))(blocks)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-6, rtol=1e-6),
        g0, g1,
    )


def test_pp_state_shardings_matcher(rng):
    """pp_state_shardings stages exactly the visual blocks (params and a
    mirrored Adam-moment pytree), replicates everything else."""
    from keep_tpu.parallel.pp import pp_fraction, pp_state_shardings

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "pp"))
    tree = {
        "visual": {"blocks": {"w": jnp.zeros((8, 4, 4))},
                   "pos_embed": jnp.zeros((1, 5, 4))},
        "text": {"blocks": {"w": jnp.zeros((8, 4, 4))}},
        "mu": {"visual": {"blocks": {"w": jnp.zeros((8, 4, 4))}}},
    }
    sh = pp_state_shardings(tree, mesh)
    assert sh["visual"]["blocks"]["w"].spec == P("pp")
    assert sh["mu"]["visual"]["blocks"]["w"].spec == P("pp")
    assert sh["visual"]["pos_embed"].spec == P()
    assert sh["text"]["blocks"]["w"].spec == P()  # text tower not staged
    frac = pp_fraction(tree, mesh)  # (128 + 128 staged) / 404 elements
    assert frac == pytest.approx(256 / 404)


def test_vit_forward_pp_parity(rng):
    """Full ViT encode with the trunk pipelined over 4 stages == the plain
    forward (stem/head replicated, 8-layer trunk staged 2 layers/device)."""
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=8,
                    num_heads=4)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3), dtype=np.float32))
    ref = np.asarray(vit.forward(params, x, cfg))
    mesh = _mesh(4)
    got = np.asarray(vit_forward_pp(params, x, cfg, mesh, num_microbatches=4))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_vit_forward_pp_staged_placement(rng):
    """Pre-placing the trunk with place_stages (each device holds 1/n of the
    tower — the HBM win pp exists for) gives the same result."""
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=8,
                    num_heads=4)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    mesh = _mesh(8)
    params2 = dict(params)
    params2["blocks"] = place_stages(params["blocks"], mesh)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3), dtype=np.float32))
    ref = np.asarray(vit.forward(params, x, cfg))
    got = np.asarray(vit_forward_pp(params2, x, cfg, mesh))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
