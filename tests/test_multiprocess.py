"""Two-PROCESS jax.distributed test on CPU — the real multi-host code path
(jax.process_count() == 2), not the single-process virtual mesh. Covers the
reference's cross-rank surface: broadcast_object / all_gather_object
(distributed.py:117-137) and global-batch contrastive negatives
(loss.py:21-65) over a mesh spanning both processes."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             coord, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid{pid} rc={p.returncode}\n{out}"
        assert f"OK pid={pid}" in out, out


def test_two_process_env_discovery():
    """The torchrun-style env path: workers call multihost.init_from_env()
    with MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE set (the reference's
    env:// init, params.py:370-374) — same cross-process assertions."""
    port = _free_port()
    base_env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        MASTER_ADDR="127.0.0.1",
        MASTER_PORT=str(port),
        WORLD_SIZE="2",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             "env", "2", str(pid)],
            env=dict(base_env, RANK=str(pid)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("env-discovery workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid{pid} rc={p.returncode}\n{out}"
        assert f"OK pid={pid}" in out, out


def test_init_from_env_noop_single_process():
    """No multi-process markers in the env → False, nothing initialized."""
    import subprocess as sp

    code = (
        "import os\n"
        "for k in ('MASTER_ADDR','WORLD_SIZE','RANK','SLURM_NTASKS',"
        "'OMPI_COMM_WORLD_SIZE','TPU_WORKER_HOSTNAMES',"
        "'MEGASCALE_COORDINATOR_ADDRESS'):\n"
        "    os.environ.pop(k, None)\n"
        "import jax\n"
        "jax.config.update('jax_platforms','cpu')\n"
        "from keep_tpu.parallel.multihost import init_from_env\n"
        "assert init_from_env() is False\n"
        "assert jax.process_count() == 1\n"
        "print('NOOP OK')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = sp.run([sys.executable, "-c", code], env=env, capture_output=True,
               text=True, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "NOOP OK" in r.stdout
