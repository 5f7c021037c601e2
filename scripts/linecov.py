"""First-hit line coverage for keep_tpu via sys.monitoring (PEP 669).

No third-party coverage package exists in this image; this plugin records
each (code, line) in ``keep_tpu/`` once and then DISABLEs that location,
so steady-state overhead is ~zero (unlike sys.settrace).

Usage:
    python -m pytest tests/ -q -p scripts.linecov
    python scripts/linecov_report.py          # merge dumps + diff vs AST

Each pytest process writes ``/tmp/linecov/<pid>.json`` ({file: [lines]});
subprocesses spawned by tests are not instrumented (acceptable — this is a
gap-finder for review, not a shipping metric).
"""

import json
import os
import sys

_TOOL = 3  # sys.monitoring tool id reserved for coverage tools
_PREFIX = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "keep_tpu")
) + os.sep
_hits: dict[str, set[int]] = {}


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(_PREFIX):
        _hits.setdefault(fn, set()).add(line)
    return sys.monitoring.DISABLE


def pytest_configure(config):
    mon = sys.monitoring
    mon.use_tool_id(_TOOL, "linecov")
    mon.register_callback(_TOOL, mon.events.LINE, _on_line)
    mon.set_events(_TOOL, mon.events.LINE)


def pytest_unconfigure(config):
    mon = sys.monitoring
    mon.set_events(_TOOL, 0)
    mon.free_tool_id(_TOOL)
    out_dir = "/tmp/linecov"
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{os.getpid()}.json")
    with open(path, "w") as f:
        json.dump({k: sorted(v) for k, v in _hits.items()}, f)
    print(f"\n[linecov] wrote {path} ({len(_hits)} files)")
