"""Sequential change-point detection — two-sided CUSUM per key.

The CUSUM recurrence (S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ−μ−kσ)), mirrored for S⁻;
a drift fires when either side exceeds hσ, then resets) is inherently
order-dependent per key — no window function expresses it. Like
``sequence_packing``, the honest Spark shape is ``applyInPandas``: keys
process in parallel, each group's fold runs in one Arrow batch; the
streaming twin is ``applyInPandasWithState`` with (S⁺, S⁻) as the state
(same escape hatch as ``stateful_sessions``).

Scale: one shuffle on the key; group size = events per key (bounded by
the key's activity horizon — repartition the time axis into the key for
unbounded histories). μ/σ come from the same groupBy pass.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

DRIFT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("n_events", LongType()),
        StructField("n_drifts", LongType()),
        StructField("max_cusum", DoubleType()),
    ]
)


def cusum_fold(values: list[float], mean: float, std: float, k_sigmas: float, h_sigmas: float):
    """The reference fold, shared by the executor code and tests: returns
    (n_drifts, max_cusum). Pure float arithmetic in input order — the
    DuckDB oracle replays it with a list_reduce over the same ordering."""
    k = k_sigmas * std
    h = h_sigmas * std
    sp = sn = 0.0
    nd = 0
    mx = 0.0
    for x in values:
        sp = max(0.0, sp + (x - mean - k))
        sn = max(0.0, sn + (mean - x - k))
        mx = max(mx, sp, sn)
        if h > 0 and (sp > h or sn > h):
            nd += 1
            sp = sn = 0.0
    return nd, mx


def cusum_drift(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    k_sigmas: float = 0.5,
    h_sigmas: float = 4.0,
) -> DataFrame:
    """Per-key two-sided CUSUM over time-ordered values: returns
    ``(key, n_events, n_drifts, max_cusum)`` with μ/σ taken per key (the
    self-calibrating form). Deterministic: ordering is (ts, tiebreak),
    and the fold is a pure function of that sequence."""
    rows = events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(order_tiebreak).alias("tb"),
        F.col(value_col).cast("double").alias("x"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas hands the WHOLE group as one DataFrame (unlike
        # mapInPandas' batch iterator) — the fold must see every row
        pdf = pdf.sort_values(["ts", "tb"], kind="mergesort")
        xs = pdf["x"].tolist()
        n = len(xs)
        mean = sum(xs) / n
        var = sum((x - mean) ** 2 for x in xs) / (n - 1) if n > 1 else 0.0
        nd, mx = cusum_fold(xs, mean, var ** 0.5, k_sigmas, h_sigmas)
        return pd.DataFrame(
            {"key": [pdf["key"].iloc[0]], "n_events": [n], "n_drifts": [nd], "max_cusum": [mx]}
        )

    return rows.groupBy("key").applyInPandas(fold, schema=DRIFT_SCHEMA)
