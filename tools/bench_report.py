"""Regenerate the BASELINE.md comparison table: runs the Spark bench
(bench.py, min-of-2 warm) and the DuckDB oracle bench
(tools/bench_duckdb.py, warm min-of-3) over the same sf dir and
prints the side-by-side markdown table sorted by headline order.

Usage::

    python tools/bench_report.py [sf_dir]          # default sf0.1

Timings on this box vary 2-3x run-to-run (shared machine) — compare
minima across repeated invocations, and treat stage counts
(.explain) as the stable signal.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], env: dict | None = None) -> dict:
    e = dict(os.environ)
    e.update(env or {})
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, env=e, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = _run(
        [sys.executable, "bench.py"], env={"SPARK_GRAFT_SF_DIR": sf_dir}
    )
    duck = _run([sys.executable, "tools/bench_duckdb.py", sf_dir])

    sq, dq = spark["queries"], duck["queries"]
    print(f"| query | Spark sec ({os.path.basename(sf_dir)}) | DuckDB sec | ratio |")
    print("|---|---|---|---|")
    total_s = total_d = 0.0
    for name, s in sq.items():
        d = dq.get(name)
        if d is None:
            print(f"| {name} | {s:.2f} | n/a | — |")
        else:
            total_s += s
            total_d += d
            print(f"| {name} | {s:.2f} | {d:.3f} | {s / d:.1f} |")
    print(
        f"| **total (oracle-paired)** | **{total_s:.2f}** | **{total_d:.2f}** "
        f"| **{total_s / total_d:.1f}** |"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
