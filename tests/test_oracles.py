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


def test_r7_gate_window_covers_the_never_driver_green_pool():
    """r7 rotation contract: the never-driver-green pool (absent from every
    CORRECTNESS_r0{1..6}.json, plus weighted_sample_docs whose r5 row was
    hash-red) must be exactly _GATE_WINDOW + the documented r8 queue
    (29 deferred heavies + every post-r7-freeze registration). A name in
    neither list would stay unverified forever — that is the failure this
    test exists to catch."""
    import glob
    import json
    import os

    from graph_db_spark.plans.queries import _GATE_WINDOW

    files = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r0[1-6].json")))
    if len(files) < 6:
        pytest.skip("driver correctness files absent")
    seen = set()
    for f in files:
        with open(f) as fh:
            seen |= set(json.load(fh))
    # hash-red in r5; fixed, re-queued first in the r7 window
    seen.discard("weighted_sample_docs")
    r8_deferred = {
        "betweenness_landmarks", "bitemporal_point_in_time",
        "boruvka_spanning_forest", "core_decomposition_histogram",
        "curation_provenance", "edit_distance_blocked_join",
        "geo_grid_distance_join", "harmonic_centrality_landmarks",
        "hierarchy_subtree_rollup", "hyperanf_neighborhood",
        "ivm_join_view", "kaplan_meier_churn", "kcenter_coreset",
        "landmark_distance_oracle", "landmark_eccentricity",
        "maximal_independent_set", "random_walk_sampling",
        "scc_trade_partners", "snapshot_bloom_point_skip",
        "snapshot_rebucket_evolution", "snapshot_schema_evolution",
        "snapshot_tag_travel", "snapshot_write_audit_publish",
        "streaming_full_outer_attribution", "streaming_scd2_enrichment",
        "streaming_sliding_counts", "streaming_watermark_dedup",
        "wordpiece_vocab_segment", "zorder_clustering_prune",
    }
    # queries registered AFTER the r7 window froze (r8/r9 queue): add
    # EVERY new registration here — this test fails otherwise.
    post_freeze_r7 = {
        "gini_concentration", "benford_first_digit", "cramers_v_association",
        "anova_f_oneway", "kruskal_wallis_test", "ams_f2_moment",
        "stl_seasonal_decompose", "mase_forecast_accuracy",
        "cross_correlation_lead_lag", "ols_normal_equations",
        "naive_bayes_token_screen", "knn_loo_label_eval",
        "mutual_nearest_pairs", "embedding_centroid_drift",
        "dp_noisy_source_counts", "source_js_divergence",
        "curriculum_phase_assign", "quantile_normalize_lengths",
        "welch_t_test", "levene_variance_test", "sprt_sequential_decision",
        "katz_walk_centrality", "region_trade_assortativity",
        "association_rule_triples", "item_item_collaborative_topk",
        "markov_absorption_conversion", "pca_power_iteration",
        "capture_recapture_estimate", "good_turing_unseen_mass",
        "heaps_law_fit", "poisson_rate_ratio", "dispersion_index_check",
        "mcnemar_paired_test", "markov_entropy_rate",
        "binary_segmentation_changepoint", "weighted_median_price",
        "positional_phrase_search", "energy_distance_groups",
        "trade_reciprocity", "rich_club_coefficient",
        "token_pmi_collocations", "corpus_diversity_indices",
        "open_order_backlog", "kendall_tau_b",
        "theil_index_decomposition", "ndcg_label_retrieval",
        "cohens_kappa_raters", "gumbel_extreme_value_fit",
        "runs_test_randomness", "bland_altman_agreement", "ljung_box_q",
        "spc_individuals_chart", "growth_accounting_weekly",
        "revenue_var_cvar", "diff_in_diff_uplift", "brand_price_elasticity",
    }
    never = {n for n in queries() if n not in seen}
    assert never == set(_GATE_WINDOW) | r8_deferred | post_freeze_r7, (
        never ^ (set(_GATE_WINDOW) | r8_deferred | post_freeze_r7)
    )
    assert not (set(_GATE_WINDOW) & (r8_deferred | post_freeze_r7))


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
