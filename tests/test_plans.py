"""Physical-plan regression tests — pin the SCALE.md §1 audit.

These assert plan *properties* (pushdown, broadcast choice, no accidental
cartesian products), not plan shapes, so Catalyst/AQE remain free to
re-plan within the contract.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from graph_db_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def plans_of(spark, name: str) -> list[str]:
    """The final plan PLUS the plan of every frame the build EXECUTES
    on its own — the r10-verdict blind spot: a global window that runs
    at build time behind an eager ``localCheckpoint`` (or inside a
    ``collect``/``count`` driver probe, the same hole one layer down)
    never appears in the final plan, so the inventory sweep silently
    skipped it (page_hinkley_drift was enforcement-by-comment only).
    Each patch captures the frame's formatted plan and then delegates
    to the REAL method, so iterative builds keep their lineage cuts
    and build-time behavior is unchanged. ``take``/``head``/``first``
    route through ``collect`` in the classic DataFrame, so patching
    collect + count + localCheckpoint covers every build-time action
    the non-test source uses (writer paths are exercised by their own
    plan/oracle tests, not this sweep)."""
    # patch the CONCRETE class: pyspark 4 routes DataFrame method calls
    # through pyspark.sql.classic.dataframe.DataFrame, which overrides
    # these methods — patching only the abstract parent never fires
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover - pre-4.0 layout
        from pyspark.sql import DataFrame

    captured: list[str] = []

    def wrap(orig):
        def capturing(self, *args, **kwargs):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                self.explain(mode="formatted")
            captured.append(buf.getvalue())
            return orig(self, *args, **kwargs)

        return capturing

    # the capture list is owned by tools/dump_plans.py (BUILDTIME_ACTIONS)
    # so committed plan dumps and this sweep can never drift apart;
    # test_buildtime_capture_list_matches_dump_plans pins the import
    from tools.dump_plans import BUILDTIME_ACTIONS

    origs = {m: getattr(DataFrame, m) for m in BUILDTIME_ACTIONS}
    for m, orig in origs.items():
        setattr(DataFrame, m, wrap(orig))
    try:
        df = QUERIES[name](spark, SF_DIR)
    finally:
        for m, orig in origs.items():
            setattr(DataFrame, m, orig)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return [buf.getvalue()] + captured


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = plan_of(spark, "pricing_summary")
    assert "PushedFilters: [" in plan and "IsNotNull" in plan or "LessThan" in plan
    # column pruning: the scan must not read all 11 lineitem columns
    assert "l_comment" not in plan


def test_broadcast_dim_join_broadcasts(spark):
    plan = plan_of(spark, "broadcast_dim_join")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_grouped_agg_has_partial_aggregation(spark):
    plan = plan_of(spark, "event_day_stats")
    # two-phase aggregate: partial (map-side combine) + final
    assert plan.count("HashAggregate") >= 2


@pytest.mark.parametrize(
    "name",
    [
        "edge_customer_order", "asof_nearest_line", "interval_scoped_avg",
        "enrich_missing_brand", "pipeline_sap_element_results",
        "pipeline_optimum_element_ranges", "pipeline_water_param_results",
        "pipeline_app_nutrient_contents", "cooccurrence_triangles",
        "ngram_jaccard_pairs", "salted_skew_join",
        "benchmark_decontamination", "stratified_sample", "mixture_weights",
        "sequence_packing", "multimodal_audio_features",
        "multimodal_frame_sample", "multimodal_resize",
        "repetition_quality", "pii_scrub_audit", "cms_heavy_hitters",
        "bloom_semi_prune", "tfidf_top_terms", "vocab_coverage",
        "shipping_priority", "large_volume_customers", "cms_day_merge",
        "kmv_audience_overlap", "kmv_source_ngram_overlap",
        "repeated_spans", "doc_chunks", "embedding_diversity",
        "motif_branch_conation", "local_supplier_volume", "funnel_conversion",
        "last_touch_attribution", "cohort_retention", "tokenizer_fertility",
        "unigram_logperplexity", "quality_quantile_filter",
        "event_transition_matrix", "source_dup_rate", "dow_seasonality",
        "degree_histogram", "rolling_anomaly_flags", "session_overlap_pairs",
        "order_priority_checking", "returned_item_reporting",
        "scd2_user_state", "dataset_split_assign", "robust_outliers",
        "link_prediction_adamic_adar", "label_propagation",
        "gap_fill_forward", "table_profile", "dq_validation_report",
        "trigram_lm_topk", "scd2_lookup_join", "equi_depth_histogram",
        "entity_resolution_pairs", "corpus_global_shuffle",
        "min_cost_supplier", "small_quantity_revenue", "sole_late_supplier",
        "join_key_skew_profile", "bpe_top_pairs", "disjunctive_discount_revenue",
        "ann_ivf_pq_topk", "dsir_selection", "tz_zone_correct_offsets",
        "doc_token_entropy", "bm25_doc_ranking", "hybrid_retrieval_rerank",
        "degree_assortativity",
        # round-6 continuation, third batch (the heavy/side-effecting ones
        # — modularity, snapshot, streaming — run driver probes at plan
        # build and are exercised by their own oracle queries instead)
        "autocorrelation_lags", "theil_sen_trend", "lineitem_correlations",
        "zipf_law_fit", "jaccard_link_prediction", "ngram_containment_pairs",
        "psi_distribution_drift", "ks_two_sample", "ab_test_proportions",
        "mannwhitney_u_test", "trimmed_mean_stats", "bootstrap_ci_mean",
        "embedding_eval_contamination",
        # round-6 continuation, fourth batch
        "rfm_customer_segments", "session_path_topk", "degree_powerlaw_mle",
        "conversion_latency_quantiles", "sql_api_region_revenue",
        "geo_grid_distance_join", "hierarchy_subtree_rollup",
        # round-6 continuation, fifth/sixth batches (snapshot-commit and
        # localCheckpoint-at-plan-build queries excluded as before)
        "holt_trend_forecast", "kaplan_meier_churn", "k_anonymity_audit",
        "sq8_quantization_bound", "moments_rollup_variance",
        "window_funnel_levels",
        # round-7 batteries (checkpoint-at-plan-build queries — katz,
        # markov absorption, pca — excluded as before)
        "gini_concentration", "benford_first_digit",
        "cramers_v_association", "anova_f_oneway", "kruskal_wallis_test",
        "ams_f2_moment", "stl_seasonal_decompose", "mase_forecast_accuracy",
        "cross_correlation_lead_lag", "ols_normal_equations",
        "naive_bayes_token_screen", "knn_loo_label_eval",
        "mutual_nearest_pairs", "embedding_centroid_drift",
        "dp_noisy_source_counts", "source_js_divergence",
        "curriculum_phase_assign", "quantile_normalize_lengths",
        "welch_t_test", "levene_variance_test", "sprt_sequential_decision",
        "region_trade_assortativity", "association_rule_triples",
        "item_item_collaborative_topk", "capture_recapture_estimate",
        "good_turing_unseen_mass", "heaps_law_fit", "poisson_rate_ratio",
        "dispersion_index_check", "mcnemar_paired_test",
        "markov_entropy_rate", "binary_segmentation_changepoint",
        "weighted_median_price", "positional_phrase_search",
        "energy_distance_groups",
        "trade_reciprocity", "rich_club_coefficient",
        "token_pmi_collocations", "corpus_diversity_indices",
        "open_order_backlog", "kendall_tau_b",
        "theil_index_decomposition", "ndcg_label_retrieval",
        "cohens_kappa_raters", "gumbel_extreme_value_fit",
        "runs_test_randomness", "bland_altman_agreement", "ljung_box_q",
        "spc_individuals_chart", "growth_accounting_weekly",
        "revenue_var_cvar", "diff_in_diff_uplift", "brand_price_elasticity",
    ],
)
def test_no_accidental_cartesian(spark, name):
    """No CartesianProduct anywhere in the core inventory (the deliberate
    broadcast nested loops — brute-force cosine and constant-matrix
    attachment — are separate queries, excluded here by construction)."""
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name", ["pipeline_optimum_element_ranges", "pipeline_sap_element_results"]
)
def test_parsed_fact_side_never_broadcast(spark, name):
    """SCALE.md §6.2: after spread()+wide parse the planner has no stats
    and may broadcast the parsed FACT side (driver collect + 1-thread hash
    build). The dim side carries the explicit hint; the fact side's
    round-robin exchange must therefore never sit under a BroadcastExchange."""
    plan = plan_of(spark, name)
    fact_exchange = plan.find("RoundRobinPartitioning")
    assert fact_exchange != -1  # the spread() is present
    # walk the formatted tree: the BroadcastExchange node ids present must
    # not reference the round-robin subtree — cheap proxy: the regex parse
    # markers (regexp_extract) must not appear inside a BroadcastExchange
    # input column list
    import re

    for m in re.finditer(r"\((\d+)\) BroadcastExchange\n(Input \[[^\n]*\])", plan):
        assert "regexp_extract" not in m.group(2)


def test_q18_aggregates_before_joining(spark):
    """Q18 shape: the qualifying-order set (aggregate-then-join inversion)
    must be the broadcast build side — lineitem and orders never shuffle
    against each other."""
    plan = plan_of(spark, "large_volume_customers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cms_lookup_broadcasts_the_sketch(spark):
    """The Count-Min sketch (depth×width rows) must be the broadcast side
    of the probe join — a shuffled join would move the fact keys to the
    sketch instead of the sketch to the keys."""
    plan = plan_of(spark, "cms_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bloom_probe_is_narrow(spark):
    """The Bloom probe must ride a 1-row BroadcastNestedLoopJoin (the
    dense-bitmap data column) — never a CartesianProduct, and never a
    sort-merge join against the bit table."""
    plan = plan_of(spark, "bloom_semi_prune")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_dedup_keep_filter_not_pushed_below_repartition(spark):
    """SCALE.md §6.1: the skip-unparsable predicate must evaluate above the
    window (as rn==1 AND keep), not as a scan-side filter dragging the
    parse into the single-split stage. The pre-exchange Filter nodes may
    only carry cheap source predicates (IsNotNull on join keys)."""
    plan = plan_of(spark, "pipeline_optimum_element_ranges")
    head, _, _ = plan.partition("RoundRobinPartitioning")
    # nothing before the round-robin exchange evaluates the range parse
    assert "regexp_extract" not in head.split("== Physical Plan ==")[1]


@pytest.mark.parametrize(
    "name", ["vocab_coverage", "order_value_deciles", "corpus_global_shuffle"]
)
def test_two_level_rank_queries_have_no_global_window(spark, name):
    """SCALE.md: global rankings (the Zipf curve, the revenue deciles)
    must use the two-level prefix sum — every Window in the plan is
    partitioned (by pid), never a global single-partition rank/cumsum,
    and the offset lift must not reintroduce a SinglePartition exchange
    feeding a Window."""
    import re

    plan = plan_of(spark, name)
    # formatted-mode Window detail lines: "Arguments: [fns], [partition], [order]"
    windows = list(re.finditer(r"\(\d+\) Window\n(?:[^\n]*\n)*?Arguments: (.*)", plan))
    assert windows, "expected the pid-partitioned rank/cumsum Window in the plan"
    for m in windows:
        args = m.group(1)
        # partition spec is the 2nd bracket group; empty ("[]") = global window
        groups = re.findall(r"\[[^\]]*\]", args)
        assert len(groups) >= 3 and groups[1] != "[]", f"global Window: {args}"
    assert "CartesianProduct" not in plan


def test_q22_scalar_broadcast_and_anti(spark):
    """Q22 shape: the scalar AVG rides a 1-row BroadcastNestedLoopJoin
    (never a per-row re-scan) and NOT IN decorrelates to a broadcast
    left-anti against the date-pruned buyer list — customer must not
    shuffle for either side."""
    plan = plan_of(spark, "idle_rich_customers")
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_no_forced_broadcast_on_sf_scaling_sides(spark):
    """r12 verdict "What's wrong" #1 — `dim_hint` contract: forced
    ``F.broadcast`` is reserved for SF-invariant sides (nation/region/
    1-row scalars). TPC-H customer/supplier/part grow linearly with SF
    (~15B customer rows at the ~100 TB design point — past Spark's
    8 GB / 512M-row broadcast hard limits), so their joins must carry
    NO broadcast hint in the optimized logical plan: AQE may still
    broadcast them at bench scale (that is its call to make at runtime),
    but nothing forces it at 100 TB. Asserted on the logical plan, not
    the physical one, precisely because AQE's bench-scale broadcast
    choice is legitimate."""
    from graph_db_spark.plans.queries import QUERIES

    for name, scaling_keys in [
        ("nation_volume_shipping", ("c_custkey", "s_suppkey")),
        ("theil_index_decomposition", ("c_custkey",)),
        ("trade_reciprocity", ("c_custkey", "s_suppkey")),
        # part scales at SF x 200k rows (~20B at the 100 TB point) —
        # the same class as customer/supplier, fixed in the r13 second
        # audit pass (11 more li ⋈ part sites; these three keep the
        # part join in the FINAL plan, so the assertion is non-vacuous —
        # market_basket_lift's join hides behind a build-time checkpoint)
        ("promo_revenue_share", ("p_partkey",)),
        ("taylors_power_law", ("p_partkey",)),
        ("concentration_hhi", ("p_partkey",)),
    ]:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            if "Join" not in line:
                continue
            if any(k in line for k in scaling_keys):
                assert "broadcast" not in line.lower(), f"{name}: {line}"
    # and the bounded nation dims keep their explicit hint — exactly the
    # two nation sides of the Q7 shape
    df = QUERIES["nation_volume_shipping"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("strategy=broadcast") == 2, plan


def test_pca_covariance_stage_is_join_free(spark):
    """r12 verdict "What's wrong" #2 — pca_power_iteration's covariance
    must NOT ride a rowid self-join: the pair expansion happens inside
    each row (nested transform → primitive array → posexplode), so the
    only data-sized plan (the build-time grid collect) has no
    SortMergeJoin and exactly one Exchange (the 2144-group partial→final
    aggregate). The final emitted frame is a 1-row local relation."""
    plans = plans_of(spark, "pca_power_iteration")
    data_pass = [p for p in plans if "posexplode" in p or "Generate" in p]
    assert data_pass, "covariance grid plan not captured"
    for p in data_pass:
        assert "SortMergeJoin" not in p, p
        assert p.count("Exchange") <= 2, p  # shuffle + AQE read, nothing else


def test_q17_prunes_fact_before_decorrelated_avg(spark):
    """Q17 shape: the brand filter semi-joins lineitem BEFORE the
    per-part average — the broadcast of the filtered part list must sit
    under the partkey aggregate, and the filtered scan must push the
    brand predicate down."""
    plan = plan_of(spark, "small_quantity_revenue")
    assert "BroadcastHashJoin" in plan
    assert "In(p_brand" in plan or "p_brand" in plan.split("PushedFilters")[1][:400]


def test_q19_disjunction_pushes_per_table_slices(spark):
    """Q19 shape: Catalyst must derive each table's slice of the
    OR-of-ANDs and push it into that table's scan — the lineitem scan
    carries the quantity-range disjunction, the part scan the
    brand/size disjunction. A naive plan evaluates the whole OR
    post-join over the unpruned fact scan."""
    plan = plan_of(spark, "disjunctive_discount_revenue")
    import re

    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    assert any("l_quantity" in p and "Or(" in p for p in pushed)
    assert any("p_brand" in p and "Or(" in p for p in pushed)
    assert "BroadcastHashJoin" in plan


def test_q15_scans_the_fact_once(spark):
    """Q15 shape: the revenue view materializes once and serves both its
    consumers (the global MAX and the final join) — the only parquet
    scan left in the plan is the supplier dimension, never a second
    lineitem scan (exchange reuse across the two consumers is not
    guaranteed, so the query pins it with an explicit checkpoint)."""
    plan = plan_of(spark, "top_supplier_revenue")
    # formatted mode prints each scan node twice (tree + detail section)
    assert plan.count("Scan parquet") <= 2, plan.count("Scan parquet")
    assert "l_extendedprice" not in plan.split("Scan parquet")[-1]
    assert "CartesianProduct" not in plan


def test_iterative_round_reuses_edge_partitioning(spark):
    """Pin the r5 headline wins (CC 20.8→13.0s, PageRank 21.5→13.9s at
    sf0.1): every iterative algorithm pre-partitions its static edge
    table on the per-round join key and checkpoints it
    (graph/algorithms.py:prepartition_for_rounds); LogicalRDD preserves
    the partitioning, so a round's join must shuffle ONLY the narrow
    label/rank side — exactly one Exchange in the plan, never one on the
    checkpointed edge side. Dropping the repartition inside the helper
    turns the count to 2."""
    from pyspark.sql import functions as F

    from graph_db_spark.graph.algorithms import prepartition_for_rounds

    edges = spark.range(2000).select(
        (F.col("id") % 500).cast("string").alias("src"),
        ((F.col("id") * 7) % 500).cast("string").alias("dst"),
    )
    sym = prepartition_for_rounds(edges.select("src", F.col("dst").alias("b")), 8, "b")
    labels = spark.range(500).select(
        F.col("id").cast("string").alias("b"), F.col("id").alias("label")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = sym.join(labels, on="b")
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    n_exchanges = plan.count("Exchange")
    assert n_exchanges == 1, f"expected 1 Exchange (label side only), got {n_exchanges}:\n{plan}"


def test_cc_round_two_has_single_exchange(spark):
    """The full CC round-plan contract (r6): with the static edge table
    through prepartition_for_rounds AND the per-round merged table
    through checkpoint_keep_partitioning, round ≥2's whole pipeline —
    frontier⋈sym (alias-aware hash(id)→hash(b)), groupBy(a), and the
    comp⋈incoming merge join — carries EXACTLY ONE Exchange: the
    aggregation. At cluster scale that makes per-round shuffle volume
    the label deltas alone, not the edge table."""
    from pyspark.sql import functions as F

    from graph_db_spark.graph.algorithms import (
        checkpoint_keep_partitioning,
        prepartition_for_rounds,
    )

    edges = spark.range(4000).select(
        (F.col("id") % 800).cast("string").alias("src"),
        ((F.col("id") * 13) % 800).cast("string").alias("dst"),
    )
    raw = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionAll(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    )
    ids = raw.select("a").distinct()
    # nparts MUST equal spark.sql.shuffle.partitions: the per-round merged
    # table exits its join/agg at shuffle.partitions, and co-partitioned
    # reuse needs matching counts (the algorithms' default —
    # defaultParallelism — matches; callers overriding n_partitions on
    # tiny inputs trade the reuse away knowingly)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = prepartition_for_rounds(
        raw.unionAll(ids.select("a", F.col("a").alias("b"))), nparts, "b"
    )
    comp = sym.filter(F.col("a") == F.col("b")).select(
        F.col("a").alias("id"), F.col("a").alias("component")
    )
    frontier = comp
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = None
        for rnd in range(2):
            incoming = (
                sym.join(
                    frontier.select(
                        F.col("id").alias("b"), F.col("component").alias("flabel")
                    ),
                    on="b",
                )
                .groupBy(F.col("a").alias("id"))
                .agg(F.min("flabel").alias("cand"))
            )
            merged_plan = comp.join(incoming, on="id", how="left").select(
                "id",
                F.col("component").alias("old_component"),
                F.least(
                    F.col("component"), F.coalesce(F.col("cand"), F.col("component"))
                ).alias("new_component"),
            )
            if rnd == 1:
                merged_plan.count()
                plan = merged_plan._jdf.queryExecution().executedPlan().toString()
            merged = checkpoint_keep_partitioning(merged_plan)
            frontier = merged.filter(
                F.col("new_component") != F.col("old_component")
            ).select("id", F.col("new_component").alias("component"))
            comp = merged.select("id", F.col("new_component").alias("component"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    n = plan.count("Exchange")
    assert n == 1, f"expected 1 Exchange (the aggregation), got {n}:\n{plan}"


def test_pagerank_round_two_has_single_exchange(spark):
    """PageRank's round contract (r6, mirrors the CC test): with v and
    the weighted edge table both carrying recorded hash(id) partitioning,
    round ≥2's ranks⋈weighted join and the v⟕contribs null-fill join are
    exchange-free — the union-with-static-complement trick this replaces
    had zero join cost but ERASED partial's partitioning, silently
    re-exchanging the whole rank table every round."""
    from pyspark.sql import functions as F

    from graph_db_spark.graph.algorithms import (
        checkpoint_keep_partitioning,
        prepartition_for_rounds,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        e = spark.range(4000).select(
            (F.col("id") % 800).cast("string").alias("src"),
            ((F.col("id") * 13) % 800).cast("string").alias("dst"),
        )
        v = checkpoint_keep_partitioning(
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        n = v.count()
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        weighted = prepartition_for_rounds(
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("od"))
            .join(e, on="src")
            .select(
                F.col("src").alias("id"), "dst", (F.lit(1.0) / F.col("od")).alias("weight")
            ),
            nparts,
            "id",
        )
        ranks = v.withColumn("rank", F.lit(1.0 / n))
        plan = None
        for rnd in range(2):
            contribs = (
                ranks.join(weighted, on="id")
                .select(
                    F.col("dst").alias("id"),
                    (F.col("rank") * F.col("weight")).alias("contrib"),
                )
                .groupBy("id")
                .agg(F.sum("contrib").alias("ic"))
            )
            # r12 shape: the vertex side is the PREVIOUS round's rank
            # table (projection of the preserving checkpoint — same id
            # set, same recorded partitioning), carrying _prev for the
            # convergence signal. The join must STAY exchange-free.
            partial_plan = (
                ranks.select("id", F.col("rank").alias("_prev"))
                .join(contribs, on="id", how="left")
                .select(
                    "id",
                    "_prev",
                    (
                        F.lit(0.15 / n)
                        + F.lit(0.85) * F.coalesce(F.col("ic"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
            if rnd == 1:
                partial_plan.count()
                plan = partial_plan._jdf.queryExecution().executedPlan().toString()
            partial = checkpoint_keep_partitioning(partial_plan)
            mass, _delta = partial.agg(
                F.sum("rank"), F.sum(F.abs(F.col("rank") - F.col("_prev")))
            ).collect()[0]
            ranks = partial.select(
                "id", (F.col("rank") + F.lit((1.0 - mass) / n)).alias("rank")
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    n_ex = plan.count("Exchange")
    assert n_ex == 1, f"expected 1 Exchange (the aggregation), got {n_ex}:\n{plan}"


def test_forecast_revenue_pushes_all_predicates(spark):
    """Q6 is a pure pushed-filter scan: every predicate (shipdate range,
    discount band, quantity cap) must reach the parquet reader, and the
    projection must prune to the three referenced columns + filters."""
    plan = plan_of(spark, "forecast_revenue")
    pushed = plan.split("PushedFilters")[1][:500]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)
    assert "Exchange" in plan  # only the final 1-row reduce shuffles
    assert "l_returnflag" not in plan  # column pruning held


def test_grid_join_is_equi_join_not_cartesian(spark):
    """The spatial radius join must plan as a hash/sort-merge EQUI join
    on the cell key (the whole point of the grid) — never a
    BroadcastNestedLoop/Cartesian on the distance predicate."""
    plan = plan_of(spark, "geo_grid_distance_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_wordpiece_segmentation_has_no_shuffle_after_vocab(spark):
    """Segmentation is mapInPandas over distinct words with the vocab in
    the closure: the plan downstream of the word-frequency table adds
    python evals + one key join, no global sort."""
    plan = plan_of(spark, "wordpiece_vocab_segment")
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan


def test_cms_join_cardinality_never_scans_base_twice(spark):
    """The estimate path joins two depth*width sketch tables; the exact
    path joins the two key-count tables — four scans total (one per
    side per path), no base-table self-join."""
    plan = plan_of(spark, "cms_join_cardinality")
    assert "CartesianProduct" not in plan
    # the only cross join is the 1-row exact x 1-row est scalar combine
    # (formatted mode prints a node in the tree AND the detail section,
    # so count the tree form, which carries the build annotation)
    assert plan.count("BroadcastNestedLoopJoin Cross") <= 1


def test_item_cf_broadcasts_count_dims(spark):
    """item_item_collaborative_topk: the per-item count tables join the
    pair frame as broadcasts — the pair-space shuffle is the only wide
    exchange in the plan."""
    plan = plan_of(spark, "item_item_collaborative_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_benford_filter_reaches_scan(spark):
    """benford_first_digit: the o_totalprice > 0 filter is pushed into
    the parquet scan, and only the one needed column is read."""
    plan = plan_of(spark, "benford_first_digit")
    assert "PushedFilters" in plan and "GreaterThan(o_totalprice" in plan
    assert "o_orderpriority" not in plan.split("ReadSchema")[1][:200]


# ---------------------------------------------------------------------------
# Inventory-wide single-partition-window sweep (r7 verdict item 3)
# ---------------------------------------------------------------------------

# Queries allowed to carry a globally-ORDERED (partition-free) Window,
# each with the boundedness argument for why the windowed frame does NOT
# grow with the corpus (SCALE.md §26 policy). Everything else in the
# inventory must keep every ordered Window partitioned — the two-level
# prefix sum (`with_global_rank`), closed-form `ntile_of`, or TakeOrdered
# replace the global forms (the r7-verdict rewrites: rfm, sprt, heaps,
# naive-bayes; r8 sweep additions: curriculum, quantile-normalize).
GLOBAL_WINDOW_ALLOWLIST = {
    "ams_f2_moment": "median-of-means rank over the sketch's counter "
    "estimates — row count fixed by sketch config, not by data",
    "binary_segmentation_changepoint": "calendar-bounded daily series",
    "kruskal_wallis_test": "distinct-value grid of the integer-valued "
    "quantity column (~50 rows; cardinality assumption documented in the "
    "query docstring with the with_global_rank escape hatch)",
    "ljung_box_q": "calendar-bounded daily series",
    "open_order_backlog": "calendar-bounded daily series",
    "revenue_var_cvar": "calendar-bounded daily return series",
    "runs_test_randomness": "calendar-bounded daily series",
    "spc_individuals_chart": "calendar-bounded daily series",
    "stl_seasonal_decompose": "calendar-bounded daily series",
    "rrf_fusion_ranking": "rank assignment over post-TakeOrdered 100-row "
    "candidate lists — k-sized by construction",
    "hodges_lehmann_shift": "cumulative count over the adaptive-width "
    "diff histogram — capped at 65536 buckets by construction (width is "
    "derived from the day grids' min/max), independent of corpus size",
    "wilcoxon_signed_rank": "cumulative tie-count over the |diff| value "
    "grid, at most one row per calendar day",
    "durbin_watson_trend": "lag-1 over the calendar-bounded daily series",
    "max_drawdown_daily": "running max over the calendar-bounded daily "
    "series",
    "wasserstein_price_shift": "cumulative counts + lead over the "
    "adaptive-width value histogram — capped at 65536 buckets by "
    "construction",
    "engle_granger_cointegration": "lag-1 over the calendar-bounded "
    "daily residual series",
    "weibull_time_to_convert": "KM at-risk/product windows over the "
    "event-time day grid, bounded by the observation horizon",
    "auc_doc_length_lang": "cumulative negatives over the n_chars value "
    "grid — bounded by the document-length domain ([44, 577] in the "
    "fixtures), not corpus size",
    "granger_causality_f": "lag-1 over the calendar-bounded daily series",
    "page_hinkley_drift": "cumulative mean + running min over the "
    "calendar-bounded daily series — the windows execute at build time "
    "behind eager localCheckpoints, visible to the sweep since the r11 "
    "plans_of checkpoint capture (the r10-verdict blind-spot fix)",
}


def _top_level_bracket_groups(s: str) -> list[str]:
    """Split a formatted-plan Arguments line into its top-level [...]
    groups. Regex bracket-matching miscounts here: the window-function
    spec group itself contains brackets/parens, so only a depth counter
    is reliable."""
    groups, depth, cur = [], 0, None
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                cur = None
                continue
        if cur is not None:
            cur.append(ch)
    return groups


def global_windows_in(plan: str) -> list[str]:
    """Window nodes whose spec is single-partition. Formatted-mode
    `Arguments:` carries [functions], [partition], [order] — but the
    partition group is OMITTED (not emitted empty) when absent, so:
    two groups whose last carries sort tokens = global ORDERED window
    (single-partition sort); any empty partition group = global
    unordered window (Window.partitionBy()); two groups without sort
    tokens = partition-only window (key-partitioned, scale-safe)."""
    import re

    bad = []
    for m in re.finditer(r"\(\d+\) Window\n(?:[^\n]*\n)*?Arguments: (.*)", plan):
        g = _top_level_bracket_groups(m.group(1))
        ordered_last = g and ("ASC NULLS" in g[-1] or "DESC NULLS" in g[-1])
        if (len(g) == 2 and ordered_last) or any(
            not grp.strip() for grp in g[1:]
        ):
            bad.append(m.group(1)[:160])
    return bad


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_inventory_no_global_window_outside_allowlist(spark, name):
    """Every queries() entry: no single-partition Window unless the
    windowed frame is bounded by construction and documented in
    GLOBAL_WINDOW_ALLOWLIST. This is the inventory-wide generalization
    of test_two_level_rank_queries_have_no_global_window — it would
    have caught all four r7-verdict global-window findings at commit
    time, and goes red if any of those fixes is reverted. Since r11 the
    sweep also sees THROUGH eager localCheckpoints (plans_of captures
    each checkpointed frame's pre-checkpoint plan), so a global window
    that executes at build time needs a real allowlist entry too."""
    bad = [b for p in plans_of(spark, name) for b in global_windows_in(p)]
    if name in GLOBAL_WINDOW_ALLOWLIST:
        assert bad, (
            f"{name} is allowlisted for a global window but its plan has "
            "none — remove the stale allowlist entry"
        )
        return
    assert not bad, (
        f"{name}: single-partition Window over a frame not on the bounded "
        f"allowlist: {bad}"
    )


def test_global_window_allowlist_entries_are_registered():
    assert set(GLOBAL_WINDOW_ALLOWLIST) <= set(QUERIES)


# ---------------------------------------------------------------------------
# x100 amplification scale probe (r10 verdict item 5)
# ---------------------------------------------------------------------------
#
# The cuped lesson: "exact to ~sf1" claims on the decimal-moment queries
# went unverified because sf0.1 is the largest fixture — the BIGINT
# overflow in n*Sy^2 only surfaced when the sf0.1 sweep happened to cross
# 2^63. This probe manufactures the regime directly: replicate sf0.01
# orders 100x (salted orderkeys so key joins stay 1:1), which lifts the
# full daily revenue to sf1 magnitude (~9.4e9 cents/day), where any
# per-row int64 product of day-grid sums exceeds 2^63 and throws under
# ANSI mode. The r11 advice fixes (operand-first decimal casts in hurst/
# granger/engle-granger/durbin-watson) are exactly what this pins.


@pytest.fixture(scope="module")
def amplified_sf_dir(spark, tmp_path_factory):
    import os

    from pyspark.sql import functions as F

    src = "/root/testdata/sf0.01"
    dst = tmp_path_factory.mktemp("amplified")
    o = spark.read.parquet(os.path.join(src, "orders.parquet"))
    (
        o.withColumn("_i", F.explode(F.sequence(F.lit(0), F.lit(99))))
        .withColumn(
            "o_orderkey", F.col("o_orderkey") * 100 + F.col("_i")
        )
        .drop("_i")
        .write.parquet(str(dst / "orders.parquet"))
    )
    for t in (
        "customer",
        "lineitem",
        "nation",
        "region",
        "part",
        "supplier",
    ):
        os.symlink(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


def test_amplification_probe_has_teeth(spark, amplified_sf_dir):
    """The probe exercises the real overflow regime: the PRE-fix idiom
    (int64 per-row product, cast to decimal after) must throw an ANSI
    arithmetic overflow on the amplified day grid. If this stops
    raising, the amplification no longer reaches the regime and the
    green results below prove nothing."""
    from pyspark.sql import functions as F

    from graph_db_spark.tables import load_table

    g = (
        load_table(spark, amplified_sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("dayd"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("y")
        )
    )
    with pytest.raises(Exception, match="(?i)overflow"):
        g.agg(
            F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)"))
        ).collect()


@pytest.mark.parametrize(
    "name,stat",
    [
        ("hurst_exponent_rs", "hurst_h"),
        ("durbin_watson_trend", "dw_stat"),
        ("engle_granger_cointegration", "adf_t"),
        ("granger_causality_f", "granger_f"),
        ("cuped_variance_reduction", "var_reduction"),
    ],
)
def test_decimal_moment_queries_survive_sf1_magnitudes(
    spark, amplified_sf_dir, name, stat
):
    """Every decimal-moment query whose per-row products carry the
    SF-dependent daily/period sums must complete at sf1 magnitude and
    emit a finite headline statistic — the operand-first decimal casts
    (and the r10 cuped decimal moments) are load-bearing here, not
    documentation."""
    import math

    rows = QUERIES[name](spark, amplified_sf_dir).collect()
    assert rows, f"{name} returned no rows at amplified scale"
    v = rows[0][stat]
    assert v is not None and math.isfinite(v), (name, stat, v)


def test_buildtime_capture_list_matches_dump_plans():
    """ADVICE r13: the build-time action list used by the committed plan
    dumps (tools/dump_plans.py) and by plans_of above must be the same
    object — a builder switching to another eager action (toPandas,
    isEmpty) must be caught by BOTH captures or neither claim is
    checkable. plans_of imports the list, so equality here pins the
    import wiring, and the list itself must cover every eager action the
    classic DataFrame does not route through collect."""
    from tools.dump_plans import BUILDTIME_ACTIONS

    assert set(BUILDTIME_ACTIONS) >= {
        "collect", "count", "localCheckpoint", "toPandas", "isEmpty"
    }


def test_dump_plans_usage_line_on_missing_args(monkeypatch, capsys):
    """ADVICE r13: fewer than 3 operands prints the usage string and
    returns non-zero instead of raising a bare IndexError."""
    import sys as _sys

    from tools import dump_plans

    monkeypatch.setattr(_sys, "argv", ["dump_plans.py", "outdir"])
    rc = dump_plans.main()
    assert rc == 2
    assert "usage:" in capsys.readouterr().err
