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


def test_r8_gate_window_covers_the_never_driver_green_pool():
    """r8 rotation contract: the never-driver-green pool (absent from every
    CORRECTNESS_r0{1..7}.json) must be exactly _GATE_WINDOW (the 29 heavies
    deferred from r7 + 21 post-freeze-r7 names: 17 cheapest at sf0.01,
    the 3 whose Spark side was rewritten for the r7-verdict
    global-window fix, and rfm_customer_segments re-queued because its
    r7-green row predates its rewrite) + the documented r9 queue (36
    names). Registration is FROZEN until the pool fits one
    window — any NEW name lands in the r9 queue below or this test fails,
    which is the point: a name in neither list would stay unverified
    forever."""
    import glob
    import json
    import os

    from graph_db_spark.plans.queries import _GATE_WINDOW

    files = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r0[1-7].json")))
    if len(files) < 7:
        pytest.skip("driver correctness files absent")
    seen = set()
    for f in files:
        with open(f) as fh:
            seen |= set(json.load(fh))
    # r7-green row predates the r8 global-window rewrite; re-queued in
    # the r8 window (the weighted_sample_docs precedent from r5→r7)
    seen.discard("rfm_customer_segments")
    post_freeze_r7_r9_queue = {
        "gini_concentration", "benford_first_digit", "cramers_v_association",
        "anova_f_oneway", "kruskal_wallis_test", "ams_f2_moment",
        "stl_seasonal_decompose", "cross_correlation_lead_lag",
        "knn_loo_label_eval", "mutual_nearest_pairs",
        "embedding_centroid_drift", "source_js_divergence",
        "curriculum_phase_assign", "levene_variance_test",
        "katz_walk_centrality", "region_trade_assortativity",
        "association_rule_triples", "item_item_collaborative_topk",
        "markov_absorption_conversion", "pca_power_iteration",
        "good_turing_unseen_mass", "markov_entropy_rate",
        "weighted_median_price", "positional_phrase_search",
        "energy_distance_groups", "trade_reciprocity",
        "rich_club_coefficient", "token_pmi_collocations",
        "open_order_backlog", "kendall_tau_b",
        "theil_index_decomposition", "ndcg_label_retrieval",
        "ljung_box_q", "growth_accounting_weekly", "diff_in_diff_uplift",
        "capture_recapture_estimate",
    }
    assert len(post_freeze_r7_r9_queue) == 36
    never = {n for n in queries() if n not in seen}
    assert never == set(_GATE_WINDOW) | post_freeze_r7_r9_queue, (
        never ^ (set(_GATE_WINDOW) | post_freeze_r7_r9_queue)
    )
    assert not (set(_GATE_WINDOW) & post_freeze_r7_r9_queue)


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
