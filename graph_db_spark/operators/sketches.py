"""Mergeable sketch aggregates — the re-aggregation story at 100 TB.

The reference's telemetry counters (SURVEY.md §2.4 A9) are exact and
single-pass; at cluster scale the useful generalization is a *mergeable*
summary: compute one small sketch per (key, day) partition ONCE at ingest,
then answer any date-range distinct-count rollup by merging sketches —
O(days × keys) sketch rows instead of re-scanning the raw 100 TB. All
JVM-side Datasketches builtins (``hll_sketch_agg`` / ``hll_union_agg``),
no Python crossing.

Exact quantiles ride along: ``percentile`` (continuous interpolation) is
exact and matches DuckDB ``quantile_cont``, so it oracle-checks; use
``approx_percentile`` at scales where an exact sort-based percentile is
too heavy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_day_sketches(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per (keys..., day): ``(keys..., day, sketch)``.

    This is the ingest-time pre-aggregation: a day of raw rows collapses to
    one ~2^lg_k-byte binary per group. Map-side partial aggregation does
    most of the collapse before the single key shuffle.
    """
    day = F.date_format(F.to_date(F.col(ts_col)), "yyyy-MM-dd").alias("day")
    return df.groupBy(*keys, day).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    )


def hll_merge_estimate(
    sketches: DataFrame,
    keys: list[str],
    estimate_col: str = "distinct_est",
) -> DataFrame:
    """Merge per-day sketches up to ``keys`` and estimate the distinct
    count: ``(keys..., distinct_est)``. The input is sketch rows (tiny),
    so arbitrary re-rollups never touch the raw data again.
    """
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("bigint").alias(estimate_col)
    )


def exact_percentiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    percentiles: list[float],
) -> DataFrame:
    """Exact continuous-interpolation percentiles per group:
    ``(keys..., p_<pct>...)``. Matches ANSI ``percentile_cont`` /
    DuckDB ``quantile_cont`` bit-for-bit on the fixtures, so it is
    oracle-checkable; swap in ``approx_percentile`` (KLL-style, bounded
    error, single pass) when the per-group sort is the bottleneck."""
    aggs: list[Column] = [
        F.round(F.percentile(F.col(value_col), F.lit(p)), 4).alias(
            f"p_{str(p).replace('.', '_')}"
        )
        for p in percentiles
    ]
    return df.groupBy(*keys).agg(*aggs)
