"""Driver-contract smoke: bench.py's LAST line is the parseable headline.

Round 5 layout (bench.py docstring): the headline record is emitted FIRST
(budget-overrun insurance) and re-emitted verbatim as the LAST line for the
driver's last-line parser, with a ``relay_rtt_ms`` calibration record in
between — so tiny mode prints exactly three JSON lines.
"""

import json
import subprocess
import sys


def test_bench_json_lines():
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root",
             "KEEP_BENCH_TINY": "1"},
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 3, proc.stdout + proc.stderr
    recs = [json.loads(l) for l in lines]

    # first and last are the headline; last is what the driver parses
    for rec in (recs[0], recs[-1]):
        assert rec["metric"] == "vit_l16_encode_224_patches_per_sec_per_chip"
        assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
        assert rec["value"] > 0
        assert "relay_rtt_ms" in rec
    assert recs[0]["value"] == recs[-1]["value"]
    assert "elapsed_s" in recs[-1]

    # the calibration record sits between them
    assert recs[1]["metric"] == "relay_rtt_ms"
    assert recs[1]["value"] > 0
    assert recs[1]["upload_mb_per_s"] > 0
