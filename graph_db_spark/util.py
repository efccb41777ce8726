"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition to ``n`` (default: cluster parallelism).

    Small fixture tables arrive as one parquet split, so CPU-heavy per-row
    expression stages (signatures, projections) would otherwise run in a
    single task even on 32 cores. At 100 TB the scan itself yields enough
    splits and this becomes a near-no-op rebalance; the explicit spread is
    still correct placement hygiene ahead of expensive narrow stages.
    Only use before order-insensitive operators (aggregate/join) — the
    round-robin destroys source row order.
    """
    n = n or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)
