"""Oracle hygiene — fast checks that need no SparkSession.

The correctness gate runs every oracle against DuckDB; these tests catch
oracle bitrot (SQL syntax errors, renamed tables, bad registry entries) in
seconds instead of a multi-minute Spark sweep.
"""

from __future__ import annotations

import duckdb
import pytest

from __spark_entry__ import oracle_sql, queries
from graph_db_spark.plans.queries import _EXPENSIVE_LAST
from graph_db_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_oracle_parses_and_binds(con):
    """EXPLAIN every oracle: parse + bind against the real fixture schemas
    (catches column renames and SQL typos without executing)."""
    bad = []
    for name, sql in oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — collecting all failures
            bad.append(f"{name}: {e}")
    assert not bad, "\n".join(bad)


def test_oracle_keys_subset_of_queries():
    q, o = queries(), oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)
    # rows-only set stays intentional: after the portable-hash MinHash/
    # SimHash conversion, only the Datasketches-impl-specific HLL estimate
    # lacks an exact oracle (it carries hll_error_bound instead)
    rows_only = set(q) - set(o)
    assert rows_only == {"hll_user_reach"}, rows_only


def test_gate_window_and_expensive_tail_ordering():
    """Registration order = the driver's contract: the first 50 names are
    exactly _GATE_WINDOW (the round-6 rotation closing the never-driver-
    checked backlog), and the expensive iterative queries not promoted
    into the window close the tail in their cost order."""
    from graph_db_spark.plans.queries import _GATE_WINDOW

    q = list(queries())
    assert len(_GATE_WINDOW) == 50
    assert q[:50] == _GATE_WINDOW
    assert set(_EXPENSIVE_LAST) <= set(q), set(_EXPENSIVE_LAST) - set(q)
    tail = [n for n in _EXPENSIVE_LAST if n not in set(_GATE_WINDOW)]
    assert q[-len(tail):] == tail


def test_r9_gate_window_covers_the_never_driver_green_pool():
    """r9 rotation contract: the never-driver-green pool (absent from every
    CORRECTNESS_r0{1..8}.json) must be exactly _GATE_WINDOW — the 36-name
    r8 spill queue, rfm_customer_segments re-queued a second time (its
    r8-green row predates the r9 exact-cent ranking rewrite — the
    weighted_sample_docs precedent), and the 13 r9 registrations (the
    freeze lifted with the pool under one window; every name that
    registers after a freeze lifts MUST take a window slot or it stays
    unverified forever — that is what this test enforces). The spill
    queue is EMPTY for the first time since r6: after this window
    drains, the r10 rotation can start re-checking stale early-round
    rows instead of paying down debt."""
    import glob
    import json
    import os

    from graph_db_spark.plans.queries import _GATE_WINDOW

    files = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r0[1-8].json")))
    if len(files) < 8:
        pytest.skip("driver correctness files absent")
    seen = set()
    for f in files:
        with open(f) as fh:
            seen |= set(json.load(fh))
    # r8-green row predates the r9 rewrite (monetary ranked as exact
    # integer cents); re-queued in the r9 window
    seen.discard("rfm_customer_segments")
    r9_new = {
        "nelson_aalen_hazard", "simpson_paradox_check",
        "jackknife_ratio_variance", "brier_calibration_decomposition",
        "kneser_ney_bigram", "information_gain_split",
        "filter_cascade_attrition", "cumulative_gains_deciles",
        "regression_stump_split", "position_based_attribution",
        "abc_inventory_classes", "benjamini_hochberg_fdr",
        "quantile_treatment_effect",
    }
    assert len(r9_new) == 13
    assert r9_new <= set(_GATE_WINDOW), r9_new - set(_GATE_WINDOW)
    never = {n for n in queries() if n not in seen}
    assert never == set(_GATE_WINDOW), never ^ set(_GATE_WINDOW)


def test_bh_z_thresholds_match_textbook_quantiles():
    """The Benjamini-Hochberg threshold table is Python-side bisection on
    Phi (math.erf); pin it against the textbook normal quantile at the
    step-up endpoint — i = m gives alpha/2 = q/2 = 0.05, whose z is the
    universally tabulated 1.6448536269514722 — plus strict monotone
    decrease in i (larger rank -> larger allowed p -> smaller |z|).
    Catches any edit to the bisection or the (m, q) constants that would
    silently shift every rejection decision."""
    from graph_db_spark.plans.queries import _bh_z_thresholds

    th = _bh_z_thresholds()
    assert len(th) == 25
    assert [i for i, _ in th] == list(range(1, 26))
    assert abs(th[24][1] - 1.6448536269514722) < 1e-9
    zs = [z for _, z in th]
    assert all(a > b for a, b in zip(zs, zs[1:]))


def test_rounded_emissions_cannot_produce_negative_zero(spark, sf_dir):
    """Driver-hash trap regression (r5 verdict #2): Spark `r4` and the
    paired oracle `round(...,4) + 0.0` must both normalize IEEE -0.0 —
    the driver's serialized value-hash distinguishes -0.0 from 0.0 even
    though == does not. Exercise the query that actually failed r5
    (weighted_sample_docs: 7 of 100 ES keys round to zero at sf0.01,
    several at sf0.001 too) plus r4 on a literal -0.0-producing column."""
    import math

    import duckdb
    from pyspark.sql import functions as F

    from graph_db_spark.plans.queries import r4

    # unit level: r4 pins the sign of a rounded tiny negative
    row = spark.range(1).select(r4(F.lit(-1e-9)).alias("v")).first()
    assert row.v == 0.0 and math.copysign(1.0, row.v) > 0

    # query level, both engines, at fixture scale
    from __spark_entry__ import oracle_sql as _osql
    from __spark_entry__ import queries as _qs
    from graph_db_spark.tables import TABLE_NAMES

    sdf = _qs()["weighted_sample_docs"](spark, sf_dir)
    svals = [v for r in sdf.collect() for v in r if isinstance(v, float)]
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    ovals = [
        v
        for r in con.execute(_osql()["weighted_sample_docs"]).fetchall()
        for v in r
        if isinstance(v, float)
    ]
    assert any(v == 0.0 for v in svals + ovals), "fixture no longer hits the round-to-zero path"
    bad = [v for v in svals + ovals if v == 0.0 and math.copysign(1.0, v) < 0]
    assert not bad, f"{len(bad)} -0.0 cells emitted"
