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


def portable_hll_registers(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Engine-portable HLL: per (keys..., day) the sketch is ``2^p``
    register ROWS ``(idx, r)`` — idx = low p bits of a 62-bit portable
    hash, r = leading-zero rank of the remaining bits. Mergeable by
    ``max(r)`` per (key, idx), exactly like binary sketches but with
    every step (two polynomial char hashes, shift, bin-length rank)
    reproducible in plain SQL — which upgrades the HLL estimate from
    rows-only to an exact hash-matched oracle. The Datasketches builtins
    above stay as the compact-binary production variant."""
    from graph_db_spark.operators.dedup import portable_hash

    m = 1 << p
    day = F.date_format(F.to_date(F.col(ts_col)), "yyyy-MM-dd").alias("day")
    v = F.col(value_col).cast("string")
    h64 = portable_hash(v, 31) * F.lit(2**31).cast("long") + portable_hash(v, 131)
    w = F.shiftright(h64, p)  # integer shift — h64/m float division would
    # lose low bits past the 53-bit mantissa and corrupt ranks
    rho = F.when(w == 0, F.lit(63 - p)).otherwise(F.lit(63 - p) - F.length(F.bin(w)))
    return (
        df.select(*keys, day, h64.bitwiseAND(F.lit(m - 1)).alias("idx"), rho.alias("rho"))
        .groupBy(*keys, "day", "idx")
        .agg(F.max("rho").alias("r"))
    )


def portable_hll_estimate(
    regs: DataFrame,
    keys: list[str],
    p: int = 12,
    estimate_col: str = "distinct_est",
) -> DataFrame:
    """Merge portable register rows up to ``keys`` and apply the standard
    HLL estimator (harmonic mean + linear-counting small-range
    correction). Closed-form floating math — identical in DuckDB."""
    m = 1 << p
    alpha_m2 = (0.7213 / (1 + 1.079 / m)) * m * m
    merged = regs.groupBy(*keys, "idx").agg(F.max("r").alias("r"))
    agg = merged.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.pow(F.lit(0.5), F.col("r"))).alias("s"),
    )
    zeros = (F.lit(m) - F.col("c")).cast("double")
    raw = F.lit(alpha_m2) / (zeros + F.col("s"))
    est = F.when(
        (raw <= 2.5 * m) & (F.col("c") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(*keys, F.round(est, 4).alias(estimate_col))
