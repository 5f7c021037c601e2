"""Merge /tmp/linecov dumps and report unexecuted statement lines.

Executable lines come from the AST (statement linenos, minus docstrings
and ``if TYPE_CHECKING`` bodies), so the percentages are approximate —
this is a review-time gap-finder, not a shipping metric. Lines inside
jit-traced functions DO execute at trace time, so compute paths count.

    python scripts/linecov_report.py [--min-missing N] [file-substr ...]
"""

import ast
import glob
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def executable_lines(path: str) -> set[int]:
    src = open(path).read()
    tree = ast.parse(src)
    lines: set[int] = set()

    class V(ast.NodeVisitor):
        def _body_sans_docstring(self, node):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                body = body[1:]
            return body

        def visit(self, node):
            if isinstance(node, ast.stmt) and not isinstance(
                node, (ast.Import, ast.ImportFrom, ast.Pass, ast.Global,
                       ast.Nonlocal)
            ):
                # skip bare docstring Exprs (no bytecode line event)
                if not (
                    isinstance(node, ast.Expr)
                    and isinstance(node.value, ast.Constant)
                ):
                    lines.add(node.lineno)
            super().generic_visit(node)

    V().visit(tree)
    return lines


def ranges(sorted_lines):
    out, start, prev = [], None, None
    for x in sorted_lines:
        if start is None:
            start = prev = x
        elif x == prev + 1:
            prev = x
        else:
            out.append((start, prev))
            start = prev = x
    if start is not None:
        out.append((start, prev))
    return ",".join(f"{a}" if a == b else f"{a}-{b}" for a, b in out)


def main(argv):
    min_missing = 1
    substrs = []
    it = iter(argv)
    for a in it:
        if a == "--min-missing":
            min_missing = int(next(it))
        else:
            substrs.append(a)

    hits: dict[str, set[int]] = {}
    for dump in glob.glob("/tmp/linecov/*.json"):
        for fn, lines in json.load(open(dump)).items():
            hits.setdefault(fn, set()).update(lines)
    if not hits:
        print("no dumps under /tmp/linecov — run pytest -p scripts.linecov")
        return 1

    rows = []
    for fn in sorted(glob.glob(os.path.join(REPO, "keep_tpu/**/*.py"),
                               recursive=True)):
        if substrs and not any(s in fn for s in substrs):
            continue
        exe = executable_lines(fn)
        if not exe:
            continue
        missed = sorted(exe - hits.get(fn, set()))
        rows.append((len(missed), len(exe), fn, missed))

    rows.sort(reverse=True)
    total_exe = sum(r[1] for r in rows)
    total_missed = sum(r[0] for r in rows)
    for n_missed, n_exe, fn, missed in rows:
        if n_missed < min_missing:
            continue
        rel = os.path.relpath(fn, REPO)
        pct = 100.0 * (1 - n_missed / n_exe)
        print(f"{rel}: {pct:.0f}% ({n_missed}/{n_exe} missed)  {ranges(missed)}")
    if total_exe:
        print(f"\nTOTAL: {100.0 * (1 - total_missed / total_exe):.1f}% "
              f"({total_missed}/{total_exe} statement lines unexecuted)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
