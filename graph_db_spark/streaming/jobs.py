"""Structured Streaming analogues of the batch operators — SURVEY.md §2.8.

The reference is batch-only but re-runs overlapping windows incrementally
(``--start/--end``, /root/reference/main_graph_topraq.py:78-80) with
idempotent MERGE writes; these jobs are the honest streaming versions:

| reference behavior                                | here |
|---------------------------------------------------|------|
| daily tumbling aggregation of sensor stats        | ``stream_daily_stats`` (window + watermark) |
| irrigation events = gap-separated intervals       | ``stream_sessions`` (session_window) |
| idempotent MERGE on re-run                        | ``upsert_sink`` (foreachBatch + keyed upsert) |
| late/duplicate rows on overlapping windows        | watermark + ``dedupe_within_watermark`` |

Scale: state size is bounded by the watermark horizon × key cardinality;
output mode "update"/"append" chosen per sink. All transformations are the
same Catalyst plans as the batch versions — one definition, two runners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_daily_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] = ("user_id", "event_type"),
    value_col: str = "value",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming A1: tumbling 1-day window per key with min/max/avg/sum/count
    — the daily sensor aggregation (graph_weather_day.py:74-117) as an
    incremental job. Late rows beyond the watermark are dropped (the batch
    re-run-with-widened-window pattern, graph_irrigation_event.py:52-53,
    becomes the watermark horizon)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 day").alias("win"), *key_cols)
        .agg(
            F.avg(value_col).alias("data"),
            F.min(value_col).alias("min"),
            F.max(value_col).alias("max"),
            F.avg(value_col).alias("avg"),
            F.sum(value_col).alias("sum"),
            F.count(value_col).alias("n"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
            *key_cols,
            "data", "min", "max", "avg", "sum", "n",
        )
    )


def stream_sessions(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming sessionization: ``session_window`` with the same gap
    semantics as the batch lag+cumsum program (operators/sessionize.py) —
    the GET_IRRIGATIONS interval stream."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), *key_cols)
        .agg(
            F.min(ts_col).alias("start_at"),
            F.max(ts_col).alias("end_at"),
            (
                (F.max(F.col(ts_col).cast("double")) - F.min(F.col(ts_col).cast("double")))
                / F.lit(60.0)
            ).alias("duration_min"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("win")
    )


def dedupe_within_watermark(
    events: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "1 day"
) -> DataFrame:
    """Keyed dedupe inside the watermark horizon — the streaming form of the
    idempotent-MERGE contract for replayed rows
    (``dropDuplicatesWithinWatermark``)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def upsert_sink(query_df: DataFrame, path: str, keys: list[str], checkpoint: str):
    """foreachBatch sink running the keyed upsert per micro-batch — MERGE
    semantics onto a parquet table (on Delta/Iceberg this becomes MERGE
    INTO directly). Returns the started StreamingQuery."""
    from graph_db_spark.writers.upsert import upsert

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            existing = spark.read.parquet(path)
        except Exception:
            existing = None
        merged = upsert(existing, batch_df, keys)
        merged.write.mode("overwrite").parquet(path + "_next")
        next_df = spark.read.parquet(path + "_next")
        next_df.write.mode("overwrite").parquet(path)

    return (
        query_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
