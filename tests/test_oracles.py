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


def test_r6_gate_window_is_exactly_the_never_driver_checked_pool():
    """The r6 rotation's whole point (r5 verdict #1): the window must be
    EXACTLY the 50 names absent from every CORRECTNESS_r0{1..5}.json, so
    one green round completes full-inventory driver verification
    (201/202 — weighted_sample_docs has an r5 row, hash-red, re-queued
    first in the r7 window)."""
    import glob
    import json
    import os

    from graph_db_spark.plans.queries import _GATE_WINDOW

    files = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r0[1-5].json")))
    if len(files) < 5:
        pytest.skip("driver correctness files absent")
    seen = set()
    for f in files:
        with open(f) as fh:
            seen |= set(json.load(fh))
    # queries registered AFTER the r6 window froze queue for r7 (behind
    # weighted_sample_docs, whose r5 row was hash-red)
    post_freeze = {
        "tz_zone_correct_offsets",
        "ann_pq_topk",
        "ann_pq_distortion_bound",
        "ann_ivf_pq_topk",
        "dsir_selection",
        "doc_token_entropy",
        "bm25_doc_ranking",
        "zorder_clustering_prune",
        "harmonic_centrality_landmarks",
        "hybrid_retrieval_rerank",
        "degree_assortativity",
        "hard_negative_mining",
        "snapshot_schema_evolution",
        "rrf_fusion_ranking",
        "streaming_watermark_dedup",
        "sample_sum_estimate_bound",
        "scc_trade_partners",
        "snapshot_write_audit_publish",
        "landmark_eccentricity",
        "market_basket_lift",
        "ewma_smoothing",
        "autocorrelation_lags",
        "theil_sen_trend",
        "lineitem_correlations",
        "zipf_law_fit",
        "modularity_communities",
        "jaccard_link_prediction",
        "ngram_containment_pairs",
        "embedding_eval_contamination",
        "streaming_sliding_counts",
        "snapshot_tag_travel",
        "bootstrap_ci_mean",
        "trimmed_mean_stats",
        "psi_distribution_drift",
        "ks_two_sample",
        "streaming_full_outer_attribution",
        "snapshot_bloom_point_skip",
        "ab_test_proportions",
        "mannwhitney_u_test",
        "trade_graph_transitivity",
        "spearman_rank_correlation",
        "snapshot_rebucket_evolution",
        "rfm_customer_segments",
        "session_path_topk",
        "degree_powerlaw_mle",
        "conversion_latency_quantiles",
        "sql_api_region_revenue",
        "streaming_scd2_enrichment",
        "geo_grid_distance_join",
        "kcenter_coreset",
        "hierarchy_subtree_rollup",
        "random_walk_sampling",
        "betweenness_landmarks",
        "prefix_filter_jaccard",
        "holt_trend_forecast",
        "ivm_join_view",
        "cms_join_cardinality",
        "wordpiece_vocab_segment",
        "sampled_triangle_estimate",
        "maximal_independent_set",
        "kaplan_meier_churn",
        "k_anonymity_audit",
        "curation_provenance",
        "sq8_quantization_bound",
        "landmark_distance_oracle",
        "hyperanf_neighborhood",
        "core_decomposition_histogram",
        "bitemporal_point_in_time",
        "boruvka_spanning_forest",
        "moments_rollup_variance",
        "window_funnel_levels",
        "range_partition_balance",
        "gee_distinct_estimate",
        "median_order_statistic_ci",
        "neyman_allocation",
        "rolling_robust_anomaly",
        "label_noise_screen",
        "edit_distance_blocked_join",
    }
    never = {n for n in queries() if n not in seen} - post_freeze
    assert set(_GATE_WINDOW) == never, (
        set(_GATE_WINDOW) ^ never
    )


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
