"""Gap-based sessionization — SURVEY.md §2.8 / §4.1.3.

The reference consumes pre-computed irrigation intervals from a missing SQL
(``GET_IRRIGATIONS``, /root/reference/app/graph_irrigation_event.py:17-22,
rows ``{id, start_at, end_at, duration_min}`` :55-75). We define the interval
semantics explicitly: events for one key belong to the same session while the
gap to the previous event is ≤ ``gap``; a session's start/end are the
min/max timestamps and duration is their difference.

Batch implementation: lag + cumulative-sum of session-start flags — two
window passes over data partitioned by key, ordered by ts. One shuffle on
the key; scales with executors. The streaming analogue is
``F.session_window`` (see graph_db_spark.streaming.sessions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def _micros(df: DataFrame, ts_col: str) -> Column:
    """Epoch-MICROSECONDS (exact BIGINT) tolerant of TIMESTAMP,
    TIMESTAMP_NTZ and numeric timestamp columns. Integer microseconds,
    never double epoch-seconds: a double's ulp at epoch magnitude
    (~2.4e-7 s) makes gap comparisons and durations 1-ulp
    engine-dependent — the sf0.1 sweep caught a session duration whose
    double-seconds arithmetic rounded to 4.5198 while the oracle's exact
    epoch_us ratio rounded to 4.5199."""
    dt = df.schema[ts_col].dataType
    c = F.col(ts_col)
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return F.unix_micros(c.cast("timestamp"))
    # Round-to-nearest before the long cast: a bare cast truncates toward
    # zero, so 0.3 s -> 0.3*1e6 = 299999.99999999994 -> 299999 µs, a 1 µs
    # skew that can flip a gap/duration comparison landing exactly on a
    # boundary (the timestamp path via unix_micros is exact and unaffected).
    return F.round(c.cast("double") * F.lit(1000000.0)).cast("long")


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: float,
) -> DataFrame:
    """Assign a per-key session id to every row.

    Adds ``session_id`` (1-based, per key, chronological).
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    ts_us = _micros(df, ts_col)
    gap_us = int(round(float(gap_seconds) * 1_000_000))
    prev = F.lag(ts_us).over(w)
    is_new = F.when(prev.isNull() | ((ts_us - prev) > F.lit(gap_us)), 1).otherwise(0)
    return df.withColumn("session_id", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)))


def session_intervals(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: float,
) -> DataFrame:
    """Collapse sessions to interval rows ``(key..., session_id, start_at,
    end_at, duration_min, n_events)`` — the shape GET_IRRIGATIONS returns
    (graph_irrigation_event.py:55-75, duration in minutes :67)."""
    with_ids = sessionize(df, key_cols, ts_col, gap_seconds)
    us = _micros(with_ids, ts_col)
    return (
        with_ids.groupBy(*key_cols, "session_id")
        .agg(
            F.min(ts_col).alias("start_at"),
            F.max(ts_col).alias("end_at"),
            # exact integer-µs difference over a double divisor — the
            # same expression shape as the oracles' epoch_us arithmetic
            ((F.max(us) - F.min(us)) / F.lit(60000000.0)).alias("duration_min"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
