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
    # r10: the rows-only pool is EMPTY. hll_user_reach — the last
    # no-oracle entry — now emits the percentile_sketch_bound-style
    # contract shape (exact facts + a 5%-error flag the oracle pins to
    # 1.0), so every registered query has a driver-checkable oracle.
    rows_only = set(q) - set(o)
    assert rows_only == set(), rows_only


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


def test_r10_gate_window_covers_never_green_and_stalest_rows():
    """r10 rotation contract. The never-driver-green debt was paid off in
    r9, so the window now has TWO machine-enforced jobs:

    1. Every name with no green row in any CORRECTNESS_r0{1..9}.json —
       i.e. the r10 registrations plus anything that slipped — MUST hold
       a window slot (a new name outside the window stays driver-
       unverified forever).
    2. Every OTHER slot must be spent on verification that is actually
       informative: a stale re-check (last driver-green in r2/r3, the
       oldest rows) or a re-queue of a query whose query/oracle/operator
       changed this round (the rfm precedent — a green row that predates
       a rewrite proves nothing)."""
    import glob
    import json
    import os

    from graph_db_spark.plans.queries import _GATE_WINDOW

    files = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r0[1-9].json")))
    if len(files) < 9:
        pytest.skip("driver correctness files absent")
    last_green: dict[str, int] = {}
    for f in files:
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r0"):-len(".json")])
        with open(f) as fh:
            for name, row in json.load(fh).items():
                if row.get("err") is None and row.get("rows_match"):
                    last_green[name] = rnd
    never = {n for n in queries() if n not in last_green}
    window = set(_GATE_WINDOW)
    # job 1: the never-green pool is exactly the r10 registrations, and
    # every one of them holds a window slot
    r10_new = {
        "isotonic_calibration_pav", "mann_kendall_trend",
        "friedman_priority_ranks", "logrank_cohort_test",
        "cuped_variance_reduction", "pareto_skyline_parts",
        "flesch_reading_ease", "hodges_lehmann_shift",
        "price_index_fisher", "empirical_bayes_shrinkage",
        # batch 2
        "wilcoxon_signed_rank", "durbin_watson_trend",
        "max_drawdown_daily", "chao1_vocab_richness", "cmh_return_rate",
        # batch 3
        "shapley_channel_attribution", "wasserstein_price_shift",
        "negbin_overdispersion", "engle_granger_cointegration",
        "weibull_time_to_convert",
        # batch 4
        "bray_curtis_source_matrix", "hurst_exponent_rs",
        "auc_doc_length_lang",
        # batch 5
        "interevent_burstiness_memory", "effect_size_priority",
        "mrr_hit_at_k",
        # batch 6
        "relative_risk_ci", "huber_onestep_location",
        # batch 7
        "ipf_raking_margins", "ab_power_sample_size",
        # batch 8
        "page_hinkley_drift", "granger_causality_f",
        # batch 9
        "taylors_power_law", "concentration_hhi", "weekly_cycle_dft",
    }
    # hll_user_reach spent r1-r9 as the rows-only entry (no oracle, so
    # no green row possible); r10 gave it a contract oracle and a slot
    assert never == r10_new | {"hll_user_reach"}, never ^ r10_new
    assert r10_new <= window, r10_new - window
    # job 2: the re-check slots are the stalest rows or this round's
    # re-queues — nothing fresher sneaks in
    requeued = {
        "filter_cascade_attrition", "kneser_ney_bigram",
        "jackknife_ratio_variance", "hll_user_reach",
        "near_dup_clusters", "sessionization",
        # round(,4) magnitude migrations: money sums moved to exact
        # integer grids (order_value_deciles also re-keyed its ranking)
        "pricing_summary", "rollup_pricing", "cube_order_counts",
        "grouping_sets_revenue", "broadcast_dim_join",
        "order_value_deciles", "sql_api_region_revenue",
    }
    assert requeued <= window, requeued - window
    for name in window - r10_new - requeued:
        assert last_green[name] <= 3, (
            f"{name} last green in r{last_green[name]} — window slots must "
            "go to r2/r3-stale rows (or documented re-queues) first"
        )
    # the two r2-stale names are the single oldest debt: always included
    assert {"enrich_missing_brand", "running_idx"} <= window


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
