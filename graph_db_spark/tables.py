"""Table layer: load the driver's parquet fixtures as DataFrames.

Replaces the reference's Postgres fetchers (``get_fields`` /
``get_devices`` / ``get_device_data`` — main_graph_topraq.py:99-106,
graph_weather_day.py:201-214 in /root/reference) with declarative parquet
scans: predicate pushdown, column pruning and partition pruning come from
Catalyst instead of hand-parameterized SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Filters/projections applied by callers are
    pushed into the parquet scan by Catalyst (check ``PushedFilters`` in
    ``.explain``).

    ``events.ts`` is TIMESTAMP(NANOS) in parquet. Depending on the Spark
    build it arrives as long nanos (``nanosAsLong``) or as TIMESTAMP_NTZ
    (native nanos read, micro-truncated); either way we normalize to
    session-tz TimestampType truncated to microseconds — the same
    truncation DuckDB applies, so oracles agree. The session runs in UTC
    (session.py), so the NTZ→LTZ cast is value-preserving.
    """
    # Runtime-settable: driver-owned vanilla sessions (no builder factory)
    # would otherwise fail with PARQUET_TYPE_ILLEGAL on events.parquet's
    # INT64 (TIMESTAMP(NANOS,false)) column on Sparks without native nanos.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table; equivalent of opening the reference's
    Postgres pool (main_graph_topraq.py:94-95) — lazy, no I/O yet."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view so ``spark.sql`` text
    runs directly against them — the engine's SQL API surface (same
    Catalyst plans as the DataFrame path; see the sql_api_* queries)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
