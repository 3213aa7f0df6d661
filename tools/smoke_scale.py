"""Scale smoke (RUNBOOK §7, institutionalized r10): drive every
LINEAR registry query once through the noop sink at a large SF under
ANSI mode — a free overflow/failure detector (Spark 4's ANSI
arithmetic throws on int64 overflow instead of wrapping; this is how
the ``ln_ols`` moment-combination bug surfaced at sf10 in r9).

Excluded: the dedup/pair/near-dup families (``make_sfN.py``'s N-copy
replication makes their TRUE cross-copy pair output quadratic in
copies — a data artifact, not an operator bug; production postures
documented per-operator), iterative graph fixpoints, and streaming
entries (exercised by their own replay tests).

Usage::

    SPARK_GRAFT_DRIVER_MEM=24g python tools/smoke_scale.py [sf_dir] [budget_sec]

Set the 24g heap (RUNBOOK §7: moderate-heap-beats-huge, but the 12g
default GC-thrashes at sf10 — measured ~1 min/query vs ~12 s/query).
Defaults: .benchdata/sf10, 2400 s. Prints one JSON line
{"ran": N, "failures": [...], "slow": {...}} and logs progress to
/tmp/smoke_scale.log. Record the result in SCALE.md per round.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

#: Families excluded from the sweep (substring match on query name).
SKIP_SUBSTR = (
    # quadratic-by-replication pair/dup families
    "minhash", "simhash", "jaccard", "near_dedup", "dedup",
    "repeated_spans", "trim_spans", "semantic", "record_linkage",
    "embed_near_dup", "image_near_dup", "winnow",
    # iterative fixpoints / traversals (bounded, but multi-job walls)
    "pagerank", "textrank", "bfs", "cc_", "kmeans", "recursive",
    "triangles", "clustering_coeff",
    # vector pair joins sized for the gate SF
    "knn", "mips", "hard_negatives",
    # streaming / source plumbing with their own harnesses
    "stream", "python_datasource", "etl_flow",
    # pure-Python reference twins
    "bpe",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        REPO / ".benchdata" / "sf10"
    )
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 2400.0

    import __spark_entry__ as entrymod
    from fifa_data_pipeline_spark.session import get_spark

    log = open("/tmp/smoke_scale.log", "w")
    spark = get_spark("smoke-scale")
    queries = entrymod.queries()
    fails: list[tuple[str, str]] = []
    slow: dict[str, float] = {}
    ran = 0
    t00 = time.time()
    for name, fn in queries.items():
        if any(s in name for s in SKIP_SUBSTR):
            continue
        if time.time() - t00 > budget:
            log.write(f"TIME BUDGET HIT after {ran}\n")
            log.flush()
            break
        log.write(f"START {name}\n")
        log.flush()
        try:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ran += 1
            el = time.time() - t0
            if el > 60:
                slow[name] = round(el, 1)
                log.write(f"SLOW {name} {el:.0f}s\n")
                log.flush()
        except Exception as ex:  # noqa: BLE001 — smoke collects all
            fails.append((name, str(ex)[:200]))
            log.write(f"FAIL {name} {str(ex)[:200]}\n")
            log.flush()
    log.write(f"ran {ran} failures {len(fails)}\n")
    log.flush()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "ran": ran,
                "failures": fails,
                "slow": slow,
                "wall_sec": round(time.time() - t00, 1),
            }
        )
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
