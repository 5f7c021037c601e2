"""Worker for the 2-process jax.distributed test (tests/test_multiprocess.py).

Run as: python tests/mp_worker.py <coordinator_addr> <num_procs> <proc_id>

Exercises the REAL multi-process branches (jax.process_count() > 1) of
keep_tpu.parallel.multihost — the reference's broadcast_object /
all_gather_object contracts (distributed.py:117-137) — plus a global-batch
contrastive loss over a cross-process mesh (loss.py:21-65 semantics).
"""

import sys


def main(coordinator: str, num: int, pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    if coordinator == "env":
        # torchrun-style env discovery (MASTER_ADDR/MASTER_PORT/RANK/
        # WORLD_SIZE set by the test) through multihost.init_from_env —
        # the reference's env:// init path (params.py:370-374)
        from keep_tpu.parallel.multihost import init_from_env

        assert init_from_env(), "env discovery found no multi-process setup"
    else:
        jax.distributed.initialize(coordinator, num_processes=num,
                                   process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from keep_tpu.parallel import multihost
    from keep_tpu.parallel.mesh import make_mesh

    assert multihost.process_count() == num, multihost.process_count()
    assert multihost.process_index() == pid

    # ---- object broadcast: master's value must win everywhere
    obj = {"resume": "epoch_7.ckpt", "rank_saw": pid} if pid == 0 else None
    got = multihost.broadcast_object(obj)
    assert got == {"resume": "epoch_7.ckpt", "rank_saw": 0}, got

    # ---- object all-gather: one entry per process, rank-ordered
    gathered = multihost.all_gather_object({"pid": pid, "tag": "x" * (pid + 1)})
    assert [g["pid"] for g in gathered] == list(range(num)), gathered
    assert gathered[1]["tag"] == "xx"

    # ---- global-batch contrastive loss over a cross-process mesh
    from keep_tpu.train.loss import clip_loss
    
    from jax import shard_map

    mesh = make_mesh()  # all global devices
    n_global_dev = len(jax.devices())
    per_dev = 2
    rng = np.random.default_rng(0)  # same stream on every process
    img = rng.standard_normal((n_global_dev * per_dev, 8), dtype=np.float32)
    txt = rng.standard_normal((n_global_dev * per_dev, 8), dtype=np.float32)

    def host_local(arr):
        # each process contributes its addressable slice of the global batch
        sharding = NamedSharding(mesh, P("dp"))
        n_local_dev = jax.local_device_count()
        lo = pid * n_local_dev * per_dev
        local = arr[lo: lo + n_local_dev * per_dev]
        return jax.make_array_from_process_local_data(sharding, local)

    loss_fn = shard_map(
        lambda i, t: clip_loss(i, t, jnp.float32(10.0), axis_name="dp"),
        mesh=mesh, in_specs=(P("dp"), P("dp")), out_specs=P(),
        check_vma=False,
    )
    loss = jax.jit(loss_fn)(host_local(img), host_local(txt))
    # replicated output: every process reads its own addressable shard
    loss = float(np.asarray(loss.addressable_shards[0].data))

    # single-device oracle on the full global batch (identical on all ranks)
    ref = float(clip_loss(jnp.asarray(img), jnp.asarray(txt),
                          jnp.float32(10.0)))
    assert abs(loss - ref) < 1e-4, (loss, ref)

    print(f"OK pid={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
