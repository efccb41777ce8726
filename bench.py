"""Benchmark driver: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON
line {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed once warm-up-free but after a shared-session JVM
start; timing covers logical-plan build + execution + a count() action
(materializes every row without driver-side collect costs).

Noise protocol: the bench host is shared and single-run timings at sf0.1
swing up to 2× under external load (BASELINE.md §noise). Set
SPARK_GRAFT_BENCH_REPS=N to run every query N times and record the
per-query MINIMUM — the min over reps estimates the uncontended cost and
is the number comparable across rounds. Default stays 1 (the driver's
budget); the JSON carries "reps" so readers know which protocol produced
it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graph_db_spark.plans.queries import QUERIES  # noqa: E402
from graph_db_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "event_day_stats",
    "broadcast_dim_join",
    "asof_nearest_line",
    "sessionization",
    "interval_scoped_avg",
    "running_idx",
    "dedup_first_wins",
    "topk_per_group",
    "enrich_missing_brand",
]


def _loadavg() -> list[float] | None:
    """1/5/15-minute load averages — recorded at start and end so
    cross-round comparisons can reject load-contaminated runs
    mechanically (the shared host swings same-code timings up to 2×)."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_start = _loadavg()
    spark = get_spark("graph-db-spark-bench")
    # warm the JVM + parquet footers with a trivial action
    spark.range(1).count()

    import gc

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1")))
    timings: dict[str, float] = {}
    extra = [n for n in QUERIES if n not in HEADLINE]
    for name in HEADLINE + extra:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
            # release cached blocks (iterative queries localCheckpoint; the
            # blocks only free when the Python-side handles are collected)
            # so later queries aren't squeezed by dead checkpoint storage.
            gc.collect()
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    print(
        json.dumps(
            {
                "metric": "queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "reps": reps,
                "loadavg_start": load_start,
                "loadavg_end": _loadavg(),
                "sf": sf_val,
            }
        )
    )
    # The driver keeps only the TAIL of stdout, so the full per-query line
    # above truncates and has parsed=null in every BENCH_r0*.json. Emit a
    # compact machine-readable summary LAST so it survives tail capture.
    print(
        json.dumps(
            {
                "metric": "queries_total_wall",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "mean_sec_per_query": round(total / max(len(timings), 1), 3),
                "reps": reps,
                "loadavg_end": _loadavg(),
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
