"""Query inventory part 05 (mechanical r12 split of
plans/queries.py — statement order and bodies byte-identical to
the monolith; registration order is preserved by the aggregator's
import order). Registers 27 queries:

  scd2_user_state, dataset_split_assign, corpus_shard_plan
  robust_outliers, link_prediction_adamic_adar, label_propagation
  gap_fill_forward, table_profile, dq_validation_report
  trigram_lm_topk, scd2_lookup_join, equi_depth_histogram
  chi_square_independence, entity_resolution_pairs, corpus_global_shuffle
  hits_scores, range_band_join, motif_var_length
  dedup_skewed_corpus, pipeline_snapshot_merge_rerun, streaming_late_data
  profile_distinct_approx_bound, quantile_approx_bound, snapshot_range_pruning
  ivm_minmax_rescan, k_truss_cooccurrence, truss_communities
"""
from __future__ import annotations

from graph_db_spark.plans.families.q00_base import (  # noqa: F401
    DataFrame, F, ORACLE_SQL, SparkSession,
    Window, _fmt_ts, _poly_sql, _sf_tag,
    load_table, r4, register,
)
from graph_db_spark.plans.families.q01_relational_pipeline import (  # noqa: F401
    P, _SW_SQL, build_graph, edges_sql,
)
from graph_db_spark.plans.families.q02_datetime_rollups import (  # noqa: F401
    STRM, _stream_state_partitions,
)
from graph_db_spark.plans.families.q03_dedup_bounds_gate import (  # noqa: F401
    PF, _metric_rows, _minhash_band_sql,
)
from graph_db_spark.operators.joins import dim_hint

@register(
    "scd2_user_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
             event_id
      FROM events
    ),
    seg AS (
      SELECT user_id, event_type, ts,
             CAST(count(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seg_id
      FROM ordered
    ),
    spans AS (
      SELECT CAST(user_id AS BIGINT) AS user_id, event_type, seg_id,
             min(ts) AS vf, CAST(count(*) AS BIGINT) AS n_events
      FROM seg GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type AS state, seg_id,
           strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           coalesce(strftime(lead(vf) OVER (PARTITION BY user_id ORDER BY seg_id),
                             '%Y-%m-%d %H:%M:%S.%f'), '<current>') AS valid_to,
           lead(vf) OVER (PARTITION BY user_id ORDER BY seg_id) IS NULL AS is_current,
           n_events
    FROM spans
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: collapse each user's event
    stream into contiguous same-state spans with [valid_from, valid_to)
    validity and an is_current flag — the standard warehouse history
    table the reference's MERGE-everything write model implies
    (reference writers upsert current state; SCD2 is the auditable
    superset). One shuffle on user_id serves all three windows (lag →
    change marker → running count → span lead); ordering is (ts,
    event_id) so ties are deterministic. At 100 TB this is the
    incremental-dimension pattern: partition by user, append-only input,
    windows never cross users."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    marker = F.when(prev.isNull() | (prev != F.col("event_type")), 1)
    seg = ev.select(
        "user_id", "event_type", "ts",
        F.count(marker).over(w).cast("bigint").alias("seg_id"),
    )
    spans = seg.groupBy("user_id", "event_type", "seg_id").agg(
        F.min("ts").alias("vf"), F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("seg_id")
    nxt = F.lead("vf").over(w2)
    return spans.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_type").alias("state"),
        "seg_id",
        _fmt_ts(F.col("vf")).alias("valid_from"),
        F.coalesce(_fmt_ts(nxt), F.lit("<current>")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "n_events",
    )


@register("dataset_split_assign")
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment for a training corpus:
    split = portable_hash(doc_id) % 100 → 90/5/5. Hash-based (not
    rand()) so the split is retry-safe, stable across runs and engines,
    and needs zero coordination — every executor computes membership
    locally; no shuffle until the per-(source, split) report agg."""
    from graph_db_spark.operators.dedup import portable_hash

    docs = load_table(spark, sf_dir, "documents")
    bucket = portable_hash(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "valid").otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"), "n_chars")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


@register("corpus_shard_plan")
def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard planner: hash documents into 8 shards and report
    per-shard doc/char totals plus the balance ratio (shard size ×
    n_shards / corpus size — 1.0 = perfectly even). The deterministic
    hash gives writers an embarrassingly parallel partitioner
    (repartition(n, shard) → one output file per shard); the report is
    the pre-flight check that no shard is skewed. The corpus total rides
    a broadcast 1-row join, not a global window."""
    from graph_db_spark.operators.dedup import portable_hash

    docs = load_table(spark, sf_dir, "documents")
    shard = (portable_hash(F.col("doc_id").cast("string")) % 8).alias("shard")
    per = (
        docs.select(shard, "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )
    total = docs.agg(F.count(F.lit(1)).alias("_total"))
    return per.crossJoin(F.broadcast(total)).select(
        F.col("shard").cast("bigint").alias("shard"),
        "n_docs",
        "total_chars",
        r4(F.col("n_docs") * 8.0 / F.col("_total")).alias("balance_ratio"),
    )


@register(
    "robust_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type, round(max(d.med), 4) AS med, round(max(m.mad), 4) AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN abs(d.value - d.med) > 3.5 * 1.4826 * m.mad
                           THEN 1 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1
    """,
)
def robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median/MAD (modified z-score,
    |x − med| > 3.5·1.4826·MAD — Iglewicz-Hoaglin) instead of mean/stddev,
    so the detector isn't dragged by the outliers it hunts. Two grouped
    exact-percentile passes + broadcast joins of the tiny per-group
    stats back onto the facts; at 100 TB flip
    ``profiling.percentile(exact=False)`` (single-pass mergeable quantile
    summary) — that path's error contract is ``quantile_approx_bound``."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(PF.percentile("value", 0.5).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(PF.percentile("adev", 0.5).alias("mad"))
    d = dev.join(F.broadcast(mad), "event_type")
    is_out = F.when(
        F.abs(F.col("value") - F.col("med")) > 3.5 * 1.4826 * F.col("mad"), 1
    )
    return d.groupBy("event_type").agg(
        r4(F.max("med")).alias("med"),
        r4(F.max("mad")).alias("mad"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(is_out).cast("bigint").alias("n_outliers"),
    )


@register(
    "link_prediction_adamic_adar",
    oracle="""
    WITH cp AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    keep AS (
      SELECT p, CAST(count(*) AS BIGINT) AS d FROM cp GROUP BY 1
      HAVING count(*) BETWEEN 2 AND 500
    ),
    w AS (
      SELECT a.c AS ca, b.c AS cb, k.d
      FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
      JOIN keep k ON k.p = a.p
    ),
    aa AS (
      SELECT ca, cb, CAST(count(*) AS BIGINT) AS common_parts,
             round(sum(1.0 / ln(d)), 4) AS aa_score
      FROM w GROUP BY 1, 2
    )
    SELECT CAST(ca AS BIGINT) AS cust_a, CAST(cb AS BIGINT) AS cust_b,
           common_parts, aa_score
    FROM aa ORDER BY aa_score DESC, ca, cb LIMIT 50
    """,
)
def link_prediction_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the customer↔part bipartite graph:
    score customer pairs by Σ 1/ln(deg(part)) over co-purchased parts —
    rare parts bind harder than popular ones. The wedge join enumerates
    pairs per part, so cost is Σ deg², bounded by the hub cap (parts
    touched by >500 customers are suppressed — they contribute ≈0 score
    and quadratic work; standard link-prediction hub suppression, encoded
    identically in the oracle). Top-50 ranks on the ROUNDED score with a
    (cust_a, cust_b) tie-break, deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    keep = (
        cp.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .filter((F.col("d") >= 2) & (F.col("d") <= 500))
    )
    a = cp.alias("a")
    b = cp.select(F.col("c").alias("cb"), F.col("p").alias("pb")).alias("b")
    w = (
        a.join(b, (F.col("a.p") == F.col("pb")) & (F.col("a.c") < F.col("cb")))
        .join(dim_hint(keep, bounded=False), F.col("a.p") == keep.p)
        .select(F.col("a.c").alias("ca"), "cb", "d")
    )
    aa = w.groupBy("ca", "cb").agg(
        F.count(F.lit(1)).cast("bigint").alias("common_parts"),
        r4(F.sum(1.0 / F.log(F.col("d")))).alias("aa_score"),
    )
    return (
        aa.select(
            F.col("ca").cast("bigint").alias("cust_a"),
            F.col("cb").cast("bigint").alias("cust_b"),
            "common_parts",
            "aa_score",
        )
        .orderBy(F.desc("aa_score"), "cust_a", "cust_b")
        .limit(50)
    )


def _lpa_cte(iters: int = 3) -> str:
    """Shared CTE chain: the part co-occurrence graph (`e` undirected
    unique, `ed` both directions) and ``iters`` unrolled synchronous
    label-propagation rounds ending at ``lab{iters}`` — one
    (count, min-label) argmax CTE pair per iteration, same deterministic
    tie-break as the Spark loop. Reused by the LPA query and the
    modularity scorer so both replay the identical community assignment."""
    parts = [
        """op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
    ed AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    lab0 AS (SELECT DISTINCT u AS node, u AS label FROM ed)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""cnt{i} AS (
      SELECT ed.u AS node, l.label, count(*) AS c
      FROM ed JOIN lab{i - 1} l ON ed.v = l.node GROUP BY 1, 2),
    lab{i} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
        FROM cnt{i}) t WHERE rn = 1)"""
        )
    return ",\n    ".join(parts)


def _lpa_oracle_sql(iters: int = 3) -> str:
    return (
        "WITH " + _lpa_cte(iters) + f"""
    SELECT CAST(label AS BIGINT) AS community, CAST(count(*) AS BIGINT) AS size,
           CAST(min(node) AS BIGINT) AS min_node, CAST(max(node) AS BIGINT) AS max_node
    FROM lab{iters} GROUP BY 1"""
    )


def _lpa_edges_labels(
    spark: SparkSession, sf_dir: str, iters: int = 3, keep_edges: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the part co-occurrence graph and run ``iters`` synchronous
    LPA rounds. Returns (e, ed, labels): undirected unique edges, the
    bidirectional edge list (pre-partitioned on the per-round join key
    and checkpointed so every round reuses one exchange), and the final
    (node, label) table. Shared by label_propagation and
    modularity_communities — the modularity score must be computed on
    EXACTLY the assignment the LPA query reports."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    a = op.alias("a")
    b = op.select(F.col("o").alias("ob"), F.col("p").alias("pb")).alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("ob")) & (F.col("a.p") < F.col("pb")))
        .select(F.col("a.p").alias("u"), F.col("pb").alias("v"))
        .distinct()
    )
    if keep_edges:
        # only the modularity caller re-reads e; checkpointing it for the
        # plain LPA query would pay an extra materialization for nothing
        e = e.localCheckpoint(eager=True)
    ed = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    ed = ed.repartition(32, "v").localCheckpoint(eager=True)
    labels = ed.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(iters):
        cnt = (
            ed.join(labels, ed.v == labels.node)
            .groupBy(ed.u.alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax by (c DESC, label ASC) as a HASH aggregate — max of
        # struct(c, -label) — instead of a per-node window sort; partial
        # aggregation halves the shuffled rows and no round pays a sort
        labels = (
            cnt.groupBy("node")
            .agg(F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("m"))
            .select("node", (-F.col("m.nl")).alias("label"))
        )
    return e, ed, labels


@register("label_propagation", oracle=_lpa_oracle_sql())
def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) on the part co-occurrence graph: each node adopts its
    neighborhood's most frequent label, ties to the smallest — 3 fixed
    synchronous rounds so the result is deterministic and the DuckDB
    oracle can replay them unrolled. Per round: one edge⋈label shuffle +
    one (node, label) count + one row_number argmax — the narrow label
    table (not the edge list) is what moves, the same delta discipline
    as connected_components (graph/algorithms.py). Fixed-round sync LPA
    is the scale-safe variant: async/converged LPA is order-dependent
    and irreproducible on a cluster."""
    _, _, labels = _lpa_edges_labels(spark, sf_dir, iters=3)  # keep_edges off
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("size"),
        F.min("node").cast("bigint").alias("min_node"),
        F.max("node").cast("bigint").alias("max_node"),
    ).select(F.col("label").cast("bigint").alias("community"), "size", "min_node", "max_node")


@register(
    "gap_fill_forward",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day, sum(value) AS total
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM span
    ),
    j AS (
      SELECT g.user_id, g.day, d.total
      FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, strftime(day, '%Y-%m-%d') AS day,
           total IS NOT NULL AS observed,
           round(last_value(total IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled_total
    FROM j
    """,
)
def gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: densify each user's daily totals onto a
    complete calendar grid (sequence + explode — the grid is generated
    per key, never a driver-side loop) and forward-fill missing days with
    `last(total, ignorenulls)` over an unbounded-preceding frame. The
    hypertable-resample shape: one user_id shuffle serves the span agg,
    the grid join, and the fill window; grid size is bounded by the span,
    not the event count, so sparse keys cost O(days) not O(events)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum("value").alias("total"))
    span = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("total").isNotNull().alias("observed"),
        r4(F.last("total", ignorenulls=True).over(w)).alias("filled_total"),
    )


_PROFILE_COLS = [
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def _profile_oracle_sql() -> str:
    selects = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn, mx = f"printf('%.4f', min({c}))", f"printf('%.4f', max({c}))"
        elif kind == "ts":
            mn = f"strftime(min({c}), '%Y-%m-%d %H:%M:%S')"
            mx = f"strftime(max({c}), '%Y-%m-%d %H:%M:%S')"
        else:
            mn, mx = f"min({c})", f"max({c})"
        selects.append(
            f"""SELECT '{c}' AS column_name,
           CAST(count({c}) AS BIGINT) AS n_nonnull,
           CAST(count(*) - count({c}) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {mn} AS min_value, {mx} AS max_value
    FROM lineitem"""
        )
        # one scan per column in the oracle is fine; the Spark side does
        # all columns in a single pass
    return "\n    UNION ALL\n    ".join(selects)


@register("table_profile", oracle=_profile_oracle_sql())
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style one-pass column profiler: non-null/null/distinct
    counts + min/max per column of lineitem, long format. ALL columns
    profile in a SINGLE scan (one agg row fanned out with stack) — the
    oracle's per-column UNION is the naive N-scan formulation this
    replaces; at 100 TB that's the difference between 1 and N passes.
    Min/max are emitted via printf/date_format so the cross-engine
    comparison never depends on double→string formatting.

    The exact distinct counts run as their OWN aggregation joined back to
    the min/max/null pass: Spark plans mixed distinct+plain aggregates
    with a (n_distinct+1)-way Expand that replicates every row per
    distinct group (11.8s at sf0.1); the split keeps the plain pass
    codegen-tight and the distinct pass to its own expand (4s total). At
    100 TB flip ``profiling.distinct_count(exact=False)`` (mergeable
    HLL, one pass again) — that path's error contract is
    ``profile_distinct_approx_bound``."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn = F.format_string("%.4f", F.min(c))
            mx = F.format_string("%.4f", F.max(c))
        elif kind == "ts":
            mn = F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss")
            mx = F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss")
        else:
            mn, mx = F.min(c), F.max(c)
        aggs += [
            F.count(c).cast("bigint").alias(f"{c}__nn"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__nul"),
            mn.alias(f"{c}__mn"),
            mx.alias(f"{c}__mx"),
        ]
    nd = li.agg(
        *[
            PF.distinct_count(c, exact=True).cast("bigint").alias(f"{c}__nd")
            for c, _ in _PROFILE_COLS
        ]
    )
    one = li.agg(*aggs).crossJoin(F.broadcast(nd))
    stack = ", ".join(
        f"'{c}', {c}__nn, {c}__nul, {c}__nd, {c}__mn, {c}__mx"
        for c, _ in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS "
            "(column_name, n_nonnull, n_null, n_distinct, min_value, max_value)"
        )
    )


_DQ_RULES = [
    ("li_quantity_range", "lineitem", "l_quantity BETWEEN 1 AND 50"),
    ("li_discount_range", "lineitem", "l_discount BETWEEN 0 AND 0.1"),
    ("li_price_positive", "lineitem", "l_extendedprice > 0"),
    ("ord_date_bounds", "orders",
     "o_orderdate >= TIMESTAMP '1992-01-01' AND o_orderdate < TIMESTAMP '2003-01-01'"),
    ("cust_acctbal_present", "customer", "c_acctbal IS NOT NULL"),
    ("ev_value_finite", "events", "value IS NOT NULL AND NOT isnan(value)"),
]


def _dq_oracle_sql() -> str:
    selects = [
        f"""SELECT '{rid}' AS rule_id, '{tbl}' AS table_name,
           CAST(count(*) AS BIGINT) AS n_checked,
           CAST(count(CASE WHEN NOT ({pred}) THEN 1 END) AS BIGINT) AS n_violations,
           round(count(CASE WHEN ({pred}) THEN 1 END) * 1.0 / count(*), 4) AS pass_rate
    FROM {tbl}"""
        for rid, tbl, pred in _DQ_RULES
    ]
    return "\n    UNION ALL\n    ".join(selects)


@register("dq_validation_report", oracle=_dq_oracle_sql())
def dq_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality validation (Deequ/Great-Expectations
    shape): a rule table of SQL predicates, evaluated as count_if aggs —
    ALL rules on a table share ONE scan (the rule set compiles to one agg
    row per table, not one job per rule); violations are counted, never
    collected. NULL predicate results count as violations (NOT(NULL) is
    NULL → the CASE counts it on neither side unless made explicit —
    both sides use the same NOT(pred) convention so the quirk cancels)."""
    by_table: dict[str, list] = {}
    for rid, tbl, pred in _DQ_RULES:
        by_table.setdefault(tbl, []).append((rid, pred))
    parts = []
    for tbl, rules in by_table.items():
        df = load_table(spark, sf_dir, tbl)
        aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
        for rid, pred in rules:
            aggs.append(
                F.count(F.when(~F.expr(pred), 1)).cast("bigint").alias(f"{rid}__v")
            )
            aggs.append(
                F.count(F.when(F.expr(pred), 1)).cast("bigint").alias(f"{rid}__p")
            )
        one = df.agg(*aggs)
        stack = ", ".join(
            f"'{rid}', '{tbl}', _n, {rid}__v, "
            f"CAST(round({rid}__p * 1.0 / _n, 4) AS DOUBLE)"
            for rid, _ in rules
        )
        parts.append(
            one.select(
                F.expr(
                    f"stack({len(rules)}, {stack}) AS "
                    "(rule_id, table_name, n_checked, n_violations, pass_rate)"
                )
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "trigram_lm_topk",
    oracle="""
    WITH toks AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
    ),
    tri AS (
      SELECT unnest(list_transform(range(1, len(t) - 1),
                    i -> struct_pack(w1 := t[i], w2 := t[i + 1], w3 := t[i + 2]))) AS g
      FROM toks WHERE len(t) >= 3
    ),
    tc AS (
      SELECT g.w1 AS w1, g.w2 AS w2, g.w3 AS w3, CAST(count(*) AS BIGINT) AS c3
      FROM tri GROUP BY 1, 2, 3
    ),
    bc AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c2 FROM tc GROUP BY 1, 2)
    SELECT tc.w1, tc.w2, tc.w3, c3, round(c3 * 1.0 / c2, 4) AS cond_p
    FROM tc JOIN bc ON tc.w1 = bc.w1 AND tc.w2 = bc.w2
    ORDER BY c3 DESC, tc.w1, tc.w2, tc.w3 LIMIT 30
    """,
)
def trigram_lm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based trigram language model over the corpus: trigram counts
    + conditional probability P(w3 | w1 w2), top-30 by frequency. The
    bigram-prefix denominator is derived by RE-AGGREGATING the trigram
    counts (sum over w3) — the corpus is tokenized and shuffled once,
    never twice; both aggs get map-side combine. This is the n-gram LM /
    Kneser-Ney ingestion shape: counts are mergeable across shards, so at
    100 TB each partition emits partial counts and only (gram, count)
    rows move."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tri = (
        docs.select(t.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 3), "
                    "i -> struct(t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3))"
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2", "g.w3")
    )
    tc = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).cast("bigint").alias("c3"))
    bc = tc.groupBy("w1", "w2").agg(F.sum("c3").cast("bigint").alias("c2"))
    return (
        tc.join(bc, ["w1", "w2"])
        .select("w1", "w2", "w3", "c3", r4(F.col("c3") * 1.0 / F.col("c2")).alias("cond_p"))
        .orderBy(F.desc("c3"), "w1", "w2", "w3")
        .limit(30)
    )


@register(
    "scd2_lookup_join",
    oracle="""
    WITH src AS (SELECT * FROM events WHERE event_type <> 'purchase'),
    ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM src
    ),
    seg AS (
      SELECT user_id, event_type, ts,
             CAST(count(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seg_id
      FROM ordered
    ),
    spans AS (
      SELECT user_id, event_type AS state, seg_id, min(ts) AS vf
      FROM seg GROUP BY 1, 2, 3
    ),
    p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase')
    SELECT CAST(p.user_id AS BIGINT) AS user_id,
           CAST(p.event_id AS BIGINT) AS event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           coalesce(s.state, '<none>') AS state_at_purchase,
           s.seg_id
    FROM p ASOF LEFT JOIN spans s
      ON p.user_id = s.user_id AND p.ts >= s.vf
    """,
)
def scd2_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each purchase event resolves the
    SCD2 activity-state span (built from the non-purchase stream)
    prevailing at its timestamp. NOT a range join — the spans and facts
    merge in ONE union + one user_id window (`last(state, ignorenulls)`
    over [unbounded, current]): the classic sort-merge as-of pattern, one
    shuffle total, no per-fact interval probe. Span boundaries sort
    before facts at equal ts (kind 0 < 1) so a purchase at a change
    instant sees the NEW state — the oracle's ASOF `ts >= vf` encodes the
    same inclusive convention."""
    ev = load_table(spark, sf_dir, "events")
    src = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    marker = F.when(prev.isNull() | (prev != F.col("event_type")), 1)
    seg = src.select(
        "user_id", "event_type", "ts",
        F.count(marker).over(w).cast("bigint").alias("seg_id"),
    )
    spans = seg.groupBy("user_id", F.col("event_type").alias("state"), "seg_id").agg(
        F.min("ts").alias("t")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.col("ts").alias("t")
    )
    merged = spans.select(
        "user_id", "t", F.lit(0).alias("kind"), "state", "seg_id",
        F.lit(None).cast("long").alias("event_id"),
    ).unionByName(
        p.select(
            "user_id", "t", F.lit(1).alias("kind"),
            F.lit(None).cast("string").alias("state"),
            F.lit(None).cast("long").alias("seg_id"), "event_id",
        )
    )
    wm = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        "*",
        F.last("state", ignorenulls=True).over(wm).alias("cur_state"),
        F.last("seg_id", ignorenulls=True).over(wm).alias("cur_seg"),
    )
    return filled.filter(F.col("kind") == 1).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_id").cast("bigint").alias("event_id"),
        _fmt_ts(F.col("t")).alias("purchase_ts"),
        F.coalesce("cur_state", F.lit("<none>")).alias("state_at_purchase"),
        F.col("cur_seg").alias("seg_id"),
    )


@register(
    "equi_depth_histogram",
    oracle="""
    WITH tiles AS (
      SELECT event_type, value,
             ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS tile
      FROM events
    )
    SELECT event_type, CAST(tile AS BIGINT) AS tile,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 4) AS lo, round(max(value), 4) AS hi
    FROM tiles GROUP BY 1, 2
    """,
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram per group: ntile(10) over each
    event_type's value distribution → per-bucket count and [lo, hi]
    bounds — the optimizer-statistics / drift-monitoring companion to the
    equi-WIDTH log₂ histogram (`degree_histogram`). The window is
    per-type PARTITIONED (never global); ties assign deterministically
    via the (value, event_id) sort. At 100 TB swap the exact sort for
    `approx_percentile` boundaries — same output shape."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(10).over(w).alias("tile"))
        .groupBy("event_type", "tile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            r4(F.min("value")).alias("lo"),
            r4(F.max("value")).alias("hi"),
        )
        .select("event_type", F.col("tile").cast("bigint").alias("tile"), "n", "lo", "hi")
    )


@register(
    "chi_square_independence",
    oracle="""
    WITH obs AS (
      SELECT event_type AS r, dayofweek(ts) AS c, count(*) AS o
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT r, sum(o) AS ro FROM obs GROUP BY 1),
    ct AS (SELECT c, sum(o) AS co FROM obs GROUP BY 1),
    tot AS (SELECT sum(o) AS tn FROM obs)
    SELECT round(sum((o - CAST(ro AS DOUBLE) * co / tn)
                     * (o - CAST(ro AS DOUBLE) * co / tn)
                     / (CAST(ro AS DOUBLE) * co / tn)), 4)
             AS chi2,
           CAST((count(DISTINCT obs.r) - 1) * (count(DISTINCT obs.c) - 1) AS BIGINT)
             AS dof,
           CAST(max(tn) AS BIGINT) AS n
    FROM obs JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN tot
    """,
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence for event_type ×
    day-of-week — the drift/bias check a pipeline runs before trusting a
    stratified sample. Contingency cells aggregate once; row totals, col
    totals and N re-aggregate from the CELLS (tiny) and join back
    broadcast, so the fact table is scanned exactly once. The statistic
    is label-invariant, so the Spark/DuckDB day-of-week numbering
    difference cancels — only (chi2, dof, n) leave the query."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.col("event_type").alias("r"), F.dayofweek("ts").alias("c")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("r").agg(F.sum("o").alias("ro"))
    ct = obs.groupBy("c").agg(F.sum("o").alias("co"))
    n = obs.agg(F.sum("o").alias("n"))
    # SCALE.md §33: ro·co is a count-quadratic (≈n²/cells) — int64 dies
    # near n≈6e9 rows; double-first is the float-context form (the
    # expected count feeds the double statistic), bit-identical < 2^53
    e = F.col("ro").cast("double") * F.col("co") / F.col("n")
    return (
        obs.join(F.broadcast(rt), "r")
        .join(F.broadcast(ct), "c")
        .crossJoin(F.broadcast(n))
        .agg(
            r4(F.sum((F.col("o") - e) * (F.col("o") - e) / e)).alias("chi2"),
            (
                (F.countDistinct("r") - 1) * (F.countDistinct("c") - 1)
            ).cast("bigint").alias("dof"),
            F.max("n").cast("bigint").alias("n"),
        )
    )


@register(
    "entity_resolution_pairs",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
    ),
    pairs AS (
      SELECT a.c_nationkey AS nationkey, a.c_mktsegment AS mktsegment,
             CASE WHEN levenshtein(a.c_name, b.c_name) <= 2 THEN 1 END AS m
      FROM c a JOIN c b
        ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
       AND a.c_custkey < b.c_custkey
    ),
    blocks AS (
      SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
             CAST(count(*) AS BIGINT) AS n_records
      FROM c GROUP BY 1, 2
    ),
    ps AS (
      SELECT nationkey, mktsegment, CAST(count(*) AS BIGINT) AS n_cand_pairs,
             CAST(count(m) AS BIGINT) AS n_matches
      FROM pairs GROUP BY 1, 2
    )
    SELECT CAST(b.nationkey AS BIGINT) AS nationkey, b.mktsegment, b.n_records,
           CAST(coalesce(ps.n_cand_pairs, 0) AS BIGINT) AS n_cand_pairs,
           CAST(coalesce(ps.n_matches, 0) AS BIGINT) AS n_matches
    FROM blocks b LEFT JOIN ps USING (nationkey, mktsegment)
    """,
)
def entity_resolution_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking + verify: customers block on
    (nationkey, mktsegment); candidate pairs within a block verify with
    levenshtein(name) ≤ 2 (identical edit-distance semantics in both
    engines). The report counts records, candidate pairs, and matches
    per block — the blocking-quality diagnostic an ER pipeline reads
    before running the expensive compare. The pair join is guarded by
    the same big-block probe as the dedup path (`guard_block_pairs`) so
    a degenerate blocking key refuses instead of going quadratic."""
    from graph_db_spark.operators.dedup import guard_block_pairs

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    blocked = c.withColumn(
        "blk", F.concat_ws("|", F.col("c_nationkey"), F.col("c_mktsegment"))
    )
    guard_block_pairs(blocked, "blk", max_block_pairs=50_000_000)
    a = c.alias("a")
    b = c.select(
        F.col("c_custkey").alias("k2"), F.col("c_name").alias("n2"),
        F.col("c_nationkey").alias("nk2"), F.col("c_mktsegment").alias("ms2"),
    )
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("nk2"))
        & (F.col("a.c_mktsegment") == F.col("ms2"))
        & (F.col("a.c_custkey") < F.col("k2")),
    ).select(
        F.col("a.c_nationkey").alias("nationkey"),
        F.col("a.c_mktsegment").alias("mktsegment"),
        F.when(F.levenshtein(F.col("a.c_name"), F.col("n2")) <= 2, 1).alias("m"),
    )
    pair_stats = pairs.groupBy("nationkey", "mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand_pairs"),
        F.count("m").cast("bigint").alias("n_matches"),
    )
    blocks = c.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_records"))
    return (
        blocks.join(pair_stats, ["nationkey", "mktsegment"], "left")
        .select(
            F.col("nationkey").cast("bigint").alias("nationkey"),
            "mktsegment",
            "n_records",
            F.coalesce("n_cand_pairs", F.lit(0)).alias("n_cand_pairs"),
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
        )
    )


@register("corpus_global_shuffle")
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: rank every document
    by (portable_hash(doc_id), doc_id) — a reproducible pseudo-random
    permutation — and carry the RUNNING char budget so a trainer can cut
    'first N tokens of epoch 0' without a second pass. Uses the same
    two-level prefix-sum as the Zipf curve (`with_global_rank`): no
    single-partition window anywhere, a 10⁹-doc corpus shuffles as
    #partitions parallel sorts + a broadcast offset join. Output is the
    head of the permutation (rank ≤ 100); the full table is what a
    writer would persist."""
    from graph_db_spark.operators.aggregates import with_global_rank
    from graph_db_spark.operators.dedup import portable_hash

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars",
        portable_hash(F.col("doc_id").cast("string")).alias("hkey"),
    )
    ranked = with_global_rank(
        docs,
        [F.col("hkey"), F.col("doc_id")],
        rank_col="position",
        cumsum_cols={"chars_through": "n_chars"},
        n_partitions=8,
    )
    return (
        ranked.filter(F.col("position") <= 100)
        .select(
            F.col("position").cast("bigint").alias("position"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("chars_through").cast("bigint").alias("chars_through"),
        )
    )


def _hits_oracle_sql(iters: int = 3) -> str:
    """Unrolled HITS power iteration on the customer→part edge list with
    sum-normalization each half-step — same arithmetic as the Spark loop."""
    parts = [
        """cp AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    h0 AS (SELECT DISTINCT c, 1.0 AS h FROM cp)"""
    ]
    for i in range(1, iters + 1):
        # MATERIALIZED pins each half-step: every score table is
        # referenced twice (by its normalizer and by the next half-step),
        # so inlined CTEs re-evaluate the whole chain 2^(2·iters) times
        parts.append(
            f"""ar{i} AS MATERIALIZED (
      SELECT p, sum(h) AS r FROM cp JOIN h{i - 1} USING (c) GROUP BY 1),
    a{i} AS MATERIALIZED (
      SELECT p, r / (SELECT sum(r) FROM ar{i}) AS a FROM ar{i}),
    hr{i} AS MATERIALIZED (
      SELECT c, sum(a) AS r FROM cp JOIN a{i} USING (p) GROUP BY 1),
    h{i} AS MATERIALIZED (
      SELECT c, r / (SELECT sum(r) FROM hr{i}) AS h FROM hr{i})"""
        )
    return (
        "WITH " + ",\n    ".join(parts) + f"""
    , ranked AS (
      SELECT 'authority' AS role, CAST(p AS BIGINT) AS node_id, round(a, 4) AS score,
             row_number() OVER (ORDER BY round(a, 4) DESC, p) AS rnk
      FROM a{iters}
      UNION ALL
      SELECT 'hub' AS role, CAST(c AS BIGINT) AS node_id, round(h, 4) AS score,
             row_number() OVER (ORDER BY round(h, 4) DESC, c) AS rnk
      FROM h{iters}
    )
    SELECT role, node_id, score, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 10"""
    )


@register("hits_scores", oracle=_hits_oracle_sql())
def hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) hubs & authorities on the customer→part purchase
    graph, 3 power-iteration rounds with sum-normalization — the
    bipartite companion to PageRank (which this engine runs on the
    directed order graph). Each half-step is one edge⋈score shuffle +
    one groupBy; the normalizer is a 1-row agg broadcast back (never a
    driver collect). Fixed rounds keep it deterministic and let the
    oracle replay the exact arithmetic unrolled. Top-10 per role ranks
    on the ROUNDED score with id tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    h = cp.select("c").distinct().withColumn("h", F.lit(1.0))
    a = None
    for _ in range(3):
        # checkpoint each half-step: the score table is referenced twice
        # (normalizer + next half-step), so an uncut lineage re-executes
        # the whole prior chain 2^(2·rounds) times (14s → 2s at sf0.01)
        ar = (
            cp.join(h, "c").groupBy("p").agg(F.sum("h").alias("r"))
            .localCheckpoint(eager=True)
        )
        asum = ar.agg(F.sum("r").alias("s"))
        a = ar.crossJoin(F.broadcast(asum)).select("p", (F.col("r") / F.col("s")).alias("a"))
        hr = (
            cp.join(a, "p").groupBy("c").agg(F.sum("a").alias("r"))
            .localCheckpoint(eager=True)
        )
        hsum = hr.agg(F.sum("r").alias("s"))
        h = hr.crossJoin(F.broadcast(hsum)).select("c", (F.col("r") / F.col("s")).alias("h"))
    auth = a.select(
        F.lit("authority").alias("role"),
        F.col("p").cast("bigint").alias("node_id"),
        r4(F.col("a")).alias("score"),
    )
    hub = h.select(
        F.lit("hub").alias("role"),
        F.col("c").cast("bigint").alias("node_id"),
        r4(F.col("h")).alias("score"),
    )
    # top-10 per role: per-role window over the ~|nodes| score rows (tiny
    # by the time ranking runs — scores are one row per node, and the
    # window partitions by role so it is never a global single-partition
    # sort over raw data)
    wr = Window.partitionBy("role").orderBy(F.desc("score"), "node_id")
    return (
        auth.unionByName(hub)
        .withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rnk") <= 10)
    )


_VALUE_BANDS = [
    ("low", 0.0, 10.0),
    ("mid", 10.0, 50.0),
    ("high", 50.0, 100.0),
    ("extreme", 100.0, 1e18),
]


@register(
    "range_band_join",
    oracle=f"""
    WITH b(band, lo, hi) AS (VALUES
      {", ".join(f"('{n}', {lo!r}, {hi!r})" for n, lo, hi in _VALUE_BANDS)})
    SELECT b.band, CAST(count(e.value) AS BIGINT) AS n,
           round(sum(e.value), 4) AS total
    FROM b LEFT JOIN events e ON e.value >= b.lo AND e.value < b.hi
    GROUP BY 1
    """,
)
def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-dimension lookup (the IP→geo / tariff-band pattern): the
    band table is DATA, not a compiled CASE — it broadcasts and the fact
    stream probes it with a non-equi [lo, hi) condition, so ops can
    repoint the dimension without a code change. Cost is O(facts ×
    bands) comparisons inside a broadcast nested-loop — bounded because
    interval dimensions are small by nature; a sorted dimension would
    drop it to O(log bands) per row via `width_bucket`-style binary
    search, noted as the swap if bands ever grow. Empty bands stay
    visible by re-joining the band table to the AGGREGATED per-band
    stats (tiny⋈tiny) — an outer fact join would force the preserved
    side to be the unbroadcastable one."""
    ev = load_table(spark, sf_dir, "events").select("value")
    bands = spark.createDataFrame(_VALUE_BANDS, ["band", "lo", "hi"])
    j = ev.join(
        F.broadcast(bands),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    agg = j.groupBy("band").agg(
        F.count("value").cast("bigint").alias("n"),
        r4(F.sum("value")).alias("total"),
    )
    return bands.select("band").join(agg, "band", "left").select(
        "band", F.coalesce("n", F.lit(0)).cast("bigint").alias("n"), "total"
    )


ORACLE_SQL["corpus_global_shuffle"] = f"""
    WITH h AS (
      SELECT doc_id, source, n_chars,
             {_poly_sql("CAST(doc_id AS VARCHAR)")} AS hkey
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (ORDER BY hkey, doc_id) AS position,
             sum(n_chars) OVER (ORDER BY hkey, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chars_through
      FROM h
    )
    SELECT CAST(position AS BIGINT) AS position, CAST(doc_id AS BIGINT) AS doc_id,
           source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(chars_through AS BIGINT) AS chars_through
    FROM ranked WHERE position <= 100
"""

ORACLE_SQL["dataset_split_assign"] = f"""
    WITH h AS (
      SELECT source, n_chars,
             {_poly_sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents
    )
    SELECT source,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'valid'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM h GROUP BY 1, 2
"""

ORACLE_SQL["corpus_shard_plan"] = f"""
    WITH h AS (
      SELECT n_chars, {_poly_sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard
      FROM documents
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(count(*) * 8.0 / (SELECT count(*) FROM documents), 4) AS balance_ratio
    FROM h GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Round-5 additions: Kleene-path motifs, skew-guard demonstration, snapshot-
# backed pipeline re-runs, streaming late-data contract, approx-swap bounds
# (VERDICT r4 asks #3-#7).
# ---------------------------------------------------------------------------


@register(
    "motif_var_length",
    oracle=f"""
    WITH RECURSIVE e AS MATERIALIZED (
      SELECT src, dst FROM ({edges_sql()})
    ),
    reach(a, b, d) AS (
      SELECT src, dst, 1 FROM e WHERE src LIKE 'N:%'
      UNION
      SELECT reach.a, e.dst, reach.d + 1
      FROM reach JOIN e ON e.src = reach.b WHERE reach.d < 3
    ),
    pairs AS (SELECT DISTINCT a, b FROM reach)
    SELECT substr(b, 1, 1) AS label, CAST(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY 1
    """,
)
def motif_var_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length (Kleene) path motif — Cypher's ``()-[*1..3]->()``
    (the r4 verdict's missing-capability #3): distinct endpoint pairs
    reachable from Nation anchors within 1-3 hops of any type, counted
    per destination label. ``PropertyGraph.find`` expands the span as
    pair-set BFS with per-level dedup (graph/model.py:_kleene_pairs) and
    pushes the ``:Nation`` anchor label into the seed frontier, so the
    expansion is proportional to the anchored reachable set — never path
    enumeration (a diamond DAG has exponentially many paths but linearly
    many endpoint pairs). Oracle: recursive-CTE reachability with the
    same depth cap."""
    g = build_graph(spark, sf_dir)
    pairs = g.find("(a:Nation)-[*1..3]->(b)")
    return pairs.groupBy(F.substring("b", 1, 1).alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


_SKEW_TEMPLATE = (
    "lorem ipsum boilerplate navigation footer copyright terms privacy "
    "contact sitemap cookie banner subscribe newsletter"
)
_SKEW_N = 200  # 200² = 40,000 pairs > max_task_pairs=2,000 → grid split g=5


@register(
    "dedup_skewed_corpus",
    oracle=f"""
    WITH RECURSIVE skewed_documents AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT 10000000 + i AS doc_id, '{_SKEW_TEMPLATE}' AS text
      FROM range({_SKEW_N}) t(i)
    ),
    {_minhash_band_sql().replace("FROM documents)", "FROM skewed_documents)")},
    toks AS (
      SELECT doc_id,
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM skewed_documents
    ),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM cands c
      JOIN toks a ON a.doc_id = c.id_a
      JOIN toks b ON b.doc_id = c.id_b
      WHERE len(list_intersect(a.t, b.t)) * 1.0
            / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.6
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM verified
      UNION ALL SELECT id_b, id_a FROM verified
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, rid) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.id, e.dst FROM reach r JOIN edges e ON e.src = r.rid
    ),
    memb AS (SELECT id, min(rid) AS canonical FROM reach GROUP BY id),
    sizes AS (SELECT canonical, count(*) AS cluster_size FROM memb GROUP BY 1)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY 1
    """,
)
def dedup_skewed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-guard demonstration (VERDICT r4 ask #5): the documents corpus
    plus an injected block of 200 byte-identical boilerplate docs — the
    templated-page skew-bomb that collapses into ONE LSH signature
    bucket per band. ``max_task_pairs=2000`` forces the 2-D cell-grid
    decomposition (operators/dedup.py:_guarded_bucket_self_join: the
    block implies 40k pairs per band-bucket > 2k budget → g=5 grid, 25
    cells of ≤2k pairs each), and the oracle — the same exact LSH→verify→
    closure replay over the augmented corpus — proves the split changes
    NOTHING: every pair still meets in exactly one cell. Output is the
    cluster-size histogram, so the injected block must surface as one
    cluster of exactly 200."""
    from graph_db_spark.operators.dedup import near_dup_clusters

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    skew = spark.range(_SKEW_N).select(
        (F.lit(10_000_000) + F.col("id")).cast("long").alias("doc_id"),
        F.lit(_SKEW_TEMPLATE).alias("text"),
    )
    corpus = docs.unionByName(skew)
    out = near_dup_clusters(
        corpus, "text", "doc_id", threshold=0.6, max_task_pairs=2000
    )
    sizes = out.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy(
        F.col("cluster_size").cast("bigint").alias("cluster_size")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))


@register(
    "pipeline_snapshot_merge_rerun",
    oracle="""
    WITH ev AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS date, event_type, value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'
        AND event_type IN ('view', 'click')
    ),
    daily AS (
      SELECT user_id, date, event_type, count(value) AS n, max(value) AS mx
      FROM ev GROUP BY 1, 2, 3
    )
    SELECT date,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_stations,
           CAST(sum(CASE WHEN event_type = 'view' THEN n END) AS BIGINT) AS view_n,
           round(max(CASE WHEN event_type = 'click' THEN mx END), 4) AS max_click
    FROM daily GROUP BY 1
    """,
)
def pipeline_snapshot_merge_rerun(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline × table format (VERDICT r4 ask #3): the WeatherDay node
    family materialized through ``SnapshotTable`` MERGE instead of the
    directory-swap upsert writer — the reference's incremental-run MERGE
    contract (graph_fields.py:16-25) with the overlapping −7-day window
    re-processing of graph_irrigation_event.py:52-53. Run 1 commits the
    Jan 1-14 window; run 2 re-processes Jan 8-30 (7 days overlap) and
    MERGEs with a txn marker. Day windows recompute identically inside
    any window that covers them, so the final snapshot must equal ONE
    direct pass over the full month — which is exactly what the oracle
    computes from raw events; a non-idempotent writer (plain append)
    would double the overlap rows and fail on n_stations. Bucket-level
    copy-on-write means run 2 rewrites only buckets its keys touch."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import SnapshotTable

    tag = _sf_tag(sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"graft_snap_rerun_{tag}", "weather_days")
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    run1 = P.build(spark, sf_dir, only=["weather_days"],
                   start="2024-01-01", end="2024-01-15")["weather_days"]
    t = SnapshotTable.create(
        spark, path, run1, keys=["serial_number", "date"], n_buckets=8
    )
    run2 = P.build(spark, sf_dir, only=["weather_days"],
                   start="2024-01-08", end="2024-01-31")["weather_days"]
    t.merge(run2, strategy="overwrite", txn=("weather_days_job", 2))
    final = t.read()
    view, click = F.col("metrics")["view"], F.col("metrics")["click"]
    return final.groupBy("date").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_stations"),
        F.sum(view["n"]).cast("bigint").alias("view_n"),
        r4(F.max(click["max"])).alias("max_click"),
    )


def _run_batched_stream(spark, name, batches, transform, mode="append", tag=""):
    """Run a streaming job over a deterministic SEQUENCE of micro-batches:
    each batch is one parquet file (mtimes 10s apart so the file source's
    oldest-first ordering is unambiguous) and ``maxFilesPerTrigger=1``
    makes admission control take one file per trigger. This is what makes
    watermark semantics oracle-checkable: which rows are late is a pure
    function of the data split, not of scheduling.

    Measured watermark mechanics (Spark 4.1, pinned by the
    streaming_late_data oracle): during batch N, EVICTION (append-mode
    emission of closed windows) uses ``max(event time over batches
    0..N−1) − delay``, while the LATE-ROW FILTER uses the watermark from
    one batch earlier — ``max(batches 0..N−2) − delay`` (SPARK-24588's
    two-watermark design) — and compares the row's WINDOW END, not its
    event time, so a late row whose window is still open always lands."""
    import glob as _glob
    import os
    import shutil
    import tempfile
    import time

    d = os.path.join(tempfile.gettempdir(), f"graft_stream2_{name}_{tag}")
    shutil.rmtree(d, ignore_errors=True)
    src = os.path.join(d, "src")
    os.makedirs(src)
    now = time.time()
    for i, b in enumerate(batches):
        tmp = os.path.join(d, f"w{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(src, f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema(batches[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    qname = f"mem_{name}"
    with _stream_state_partitions(spark):
        q = (
            transform(stream)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        done = q.awaitTermination(300)
    if not done:
        q.stop()
        raise TimeoutError(
            "streaming query did not finish within 300s — the memory sink "
            "is partial; failing loudly instead of surfacing a confusing "
            "oracle mismatch (r5 ADVICE #2)"
        )
    return spark.table(qname)


@register(
    "streaming_late_data",
    oracle="""
    WITH wm1 AS (
      SELECT max(ts) - INTERVAL 2 DAY AS w FROM events
      WHERE user_id % 10 NOT IN (3, 7) AND ts < TIMESTAMP '2024-01-21'
    ),
    wmf AS (SELECT max(ts) - INTERVAL 2 DAY AS w FROM events),
    landed AS (
      SELECT e.* FROM events e, wm1
      WHERE e.user_id % 10 <> 7
         OR date_trunc('day', e.ts) + INTERVAL 1 DAY > wm1.w
    ),
    emitted AS (
      SELECT l.* FROM landed l, wmf
      WHERE date_trunc('day', l.ts) + INTERVAL 1 DAY <= wmf.w
    )
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(user_id AS BIGINT) AS user_id,
           event_type,
           round(avg(value), 4) AS data,
           round(min(value), 4) AS min,
           round(max(value), 4) AS max,
           round(avg(value), 4) AS avg,
           round(sum(value), 4) AS sum,
           CAST(count(value) AS BIGINT) AS n
    FROM emitted GROUP BY 1, 2, 3
    """,
)
def streaming_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 streaming — the watermark late-data contract, oracle-encoded
    (VERDICT r4 ask #4). Three deterministic micro-batches of the daily
    aggregation (watermark = 2 days, append mode):

    - batch 0: the on-time bulk (user_id%10∉{3,7}, ts < Jan 21) — its max
      event time defines the watermark the LATE batch is filtered with
      (the late filter lags eviction by one batch — measured, see
      ``_run_batched_stream``): wm1 = max(batch 0) − 2d ≈ Jan 18 23:59.
    - batch 1: more on-time rows (%10=3, ts < Jan 21) — the lag filler.
    - batch 2: the LATE stream (%10=7, ALL dates) plus the fresh tail
      (%10≠7, ts ≥ Jan 21). Late rows whose day window closed before wm1
      (days ≤ Jan 17) are DROPPED; late rows in still-open windows
      (days ≥ Jan 18) LAND — the filter compares the WINDOW END, so even
      a Jan-18 00:01 row lands although its event time is below wm1. The
      fresh tail advances the final watermark to global-max − 2d, closing
      and emitting every window through Jan 27; the last ~2 days stay
      open and never emit.

    The oracle recomputes all three classes analytically from the same
    split predicates — what lands and what drops is checked value-exactly,
    not just counted."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-21").cast("timestamp")
    mod = F.col("user_id") % 10
    b0 = ev.filter(~mod.isin(3, 7) & (F.col("ts") < cut))
    b1 = ev.filter((mod == 3) & (F.col("ts") < cut))
    b2 = ev.filter((mod == 7) | ((mod != 7) & (F.col("ts") >= cut)))
    import os

    out = _run_batched_stream(
        spark, "late_data", [b0, b1, b2],
        lambda s: STRM.stream_daily_stats(s, watermark="2 days"),
        mode="append",
        tag=_sf_tag(sf_dir),
    )
    return out.select(
        "day",
        F.col("user_id").cast("bigint").alias("user_id"),
        "event_type",
        r4(F.col("data")).alias("data"),
        r4(F.col("min")).alias("min"),
        r4(F.col("max")).alias("max"),
        r4(F.col("avg")).alias("avg"),
        r4(F.col("sum")).alias("sum"),
        F.col("n").cast("bigint").alias("n"),
    )


@register(
    "profile_distinct_approx_bound",
    oracle=f"""
    SELECT 'n_cols' AS metric, CAST({len(_PROFILE_COLS)} AS DOUBLE) AS value
    UNION ALL
    SELECT 'total_exact_distinct',
           CAST(({' + '.join(f'count(DISTINCT {c})' for c, _ in _PROFILE_COLS)}) AS DOUBLE)
    FROM lineitem
    UNION ALL SELECT 'max_rel_err_le_015', 1.0
    """,
)
def profile_distinct_approx_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error contract for the ``profiling.distinct_count(exact=False)``
    scale swap (VERDICT r4 ask #6, the hll_error_bound pattern): the
    HLL++ estimate per profiled lineitem column vs the exact count. The
    oracle recomputes the exact facts; the contract row is 1.0 iff every
    column's relative error ≤ 15% (= 3·rsd at the default rsd 5%;
    measured max across sf0.001-0.1 is 6.4%)."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = [c for c, _ in _PROFILE_COLS]
    # one-row result referenced by three metric selects → checkpoint so
    # the exact+approx distinct pass runs once, not three times
    one = li.agg(
        *[PF.distinct_count(c, exact=True).cast("double").alias(f"e_{c}") for c in cols],
        *[PF.distinct_count(c, exact=False).cast("double").alias(f"a_{c}") for c in cols],
    ).localCheckpoint(eager=True)
    err = F.greatest(
        *[F.abs(F.col(f"a_{c}") - F.col(f"e_{c}")) / F.col(f"e_{c}") for c in cols]
    )
    total = sum((F.col(f"e_{c}") for c in cols), F.lit(0.0))
    return _metric_rows(
        one.select(F.lit("n_cols").alias("metric"), F.lit(float(len(cols))).alias("value")),
        one.select(
            F.lit("total_exact_distinct").alias("metric"), total.alias("value")
        ),
        one.select(
            F.lit("max_rel_err_le_015").alias("metric"),
            F.when(err <= 0.15, 1.0).otherwise(0.0).alias("value"),
        ),
    )


@register(
    "quantile_approx_bound",
    oracle="""
    SELECT 'n_groups' AS metric,
           CAST(count(DISTINCT event_type) AS DOUBLE) AS value FROM events
    UNION ALL
    SELECT 'sum_exact_median',
           round(CAST(sum(m) AS DOUBLE), 4) FROM (
             SELECT quantile_cont(value, 0.5) AS m FROM events GROUP BY event_type)
    UNION ALL SELECT 'max_rel_err_le_002', 1.0
    """,
)
def quantile_approx_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error contract for the ``profiling.percentile(exact=False)`` scale
    swap: per-event-type approx median (accuracy 10000, rank error 1e-4)
    vs the exact interpolated median. Contract row is 1.0 iff every
    group's relative value error ≤ 2% (measured max across sf0.001-0.1
    is 0.62%). The exact medians themselves are oracle-checked as a fact
    row (DuckDB ``quantile_cont`` is the same interpolated definition)."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        PF.percentile("value", 0.5, exact=True).alias("e"),
        PF.percentile("value", 0.5, exact=False).alias("a"),
    ).localCheckpoint(eager=True)
    facts = _metric_rows(
        g.agg(F.count(F.lit(1)).cast("double").alias("value")).select(
            F.lit("n_groups").alias("metric"), "value"
        ),
        g.agg(r4(F.sum("e")).alias("value")).select(
            F.lit("sum_exact_median").alias("metric"), "value"
        ),
    )
    # denominator floored at 1e-12: a group whose exact median is 0 would
    # yield NULL rel-err, F.max would IGNORE it, and the contract row
    # would report pass without checking that group (r5 ADVICE #4) — the
    # floor turns any nonzero absolute error on a zero median into a
    # loud contract failure instead of a silent skip.
    contract = g.agg(
        F.max(
            F.abs(F.col("a") - F.col("e"))
            / F.greatest(F.abs(F.col("e")), F.lit(1e-12))
        ).alias("err")
    ).select(
        F.lit("max_rel_err_le_002").alias("metric"),
        F.when(F.col("err") <= 0.02, 1.0).otherwise(0.0).alias("value"),
    )
    return _metric_rows(facts, contract)


@register(
    "snapshot_range_pruning",
    oracle="""
    WITH sel AS (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_acctbal >= 1000 AND c_acctbal <= 2000
    )
    SELECT 'n_rows' AS metric, CAST(count(*) AS DOUBLE) AS value FROM sel
    UNION ALL
    SELECT 'sum_bal', round(CAST(sum(c_acctbal) AS DOUBLE), 4) FROM sel
    UNION ALL SELECT 'files_pruned', 1.0
    """,
)
def snapshot_range_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table format — range-clustered file layout (Iceberg sort-order
    analog; the gap scan()'s docstring called out: hash bucketing alone
    never prunes a range on a static table). The customer table is
    snapshot-created keyed on c_custkey but CLUSTERED on c_acctbal:
    rows sort within each bucket, files roll every n rows, and each
    file's parquet-footer min/max joins the manifest — so the acctbal
    range scan opens only the files whose range overlaps. The scan's
    ROWS are value-checked against a direct SQL filter (pruning is an
    optimization, never a semantics change) and the contract row is 1.0
    iff the scan read strictly fewer files than the table holds."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import SnapshotTable

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    n = cust.count()
    tag = _sf_tag(sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"graft_snap_range_{tag}", "cust")
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    t = SnapshotTable.create(
        spark, path, cust, keys=["c_custkey"], n_buckets=4,
        cluster_by=["c_acctbal"], records_per_file=max(10, n // 40),
    )
    got = t.scan({"c_acctbal": (1000.0, 2000.0)}).localCheckpoint(eager=True)
    read, total = t.pruned_files({"c_acctbal": (1000.0, 2000.0)})
    return _metric_rows(
        got.agg(F.count(F.lit(1)).cast("double").alias("value")).select(
            F.lit("n_rows").alias("metric"), "value"
        ),
        got.agg(r4(F.sum("c_acctbal")).alias("value")).select(
            F.lit("sum_bal").alias("metric"), "value"
        ),
        spark.range(1).select(
            F.lit("files_pruned").alias("metric"),
            F.lit(1.0 if read < total else 0.0).alias("value"),
        ),
    )


@register(
    "ivm_minmax_rescan",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_mktsegment, c_acctbal FROM customer WHERE c_custkey <= 800
    ),
    up1 AS (
      SELECT c_custkey, c_mktsegment, c_acctbal * 2 AS c_acctbal
      FROM customer WHERE c_custkey > 700 AND c_custkey <= 900
    ),
    m1 AS (
      SELECT * FROM up1
      UNION ALL
      SELECT * FROM base WHERE c_custkey NOT IN (SELECT c_custkey FROM up1)
    ),
    final AS (SELECT * FROM m1 WHERE c_custkey % 53 <> 0)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           round(min(c_acctbal), 4) AS min_bal,
           round(max(c_acctbal), 4) AS max_bal
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def ivm_minmax_rescan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table format — MIN/MAX incremental view maintenance
    (writers/snapshots.py:apply_changes_to_minmax). MIN/MAX are the
    textbook non-self-maintainable aggregates under deletes: inserts
    fold monotonically, but a retraction of the attained bound forces a
    rescan of exactly the affected groups (semi-join-restricted — cost ∝
    those groups' rows, never table size). Same create → doubled-balance
    COW merge → keyed delete sequence as incremental_view_maintenance;
    the doubled balances retract-and-replace per-segment maxima via
    updates, and the modulo deletes retract whatever extremes they hit —
    both the fold path and the rescan path execute, and the hash match
    against the direct SQL replay proves the maintained view equals the
    recompute."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import (
        SnapshotTable,
        apply_changes_to_minmax,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tag = _sf_tag(sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"graft_ivm_mm_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable.create(
        spark, path, cust.filter(F.col("c_custkey") <= 800), ["c_custkey"], n_buckets=8
    )
    feed0 = (
        t.read()
        .withColumn("_change", F.lit("insert"))
        .withColumn("_old_c_mktsegment", F.lit(None).cast("string"))
        .withColumn("_old_c_acctbal", F.lit(None).cast("double"))
    )
    view = apply_changes_to_minmax(
        None, feed0, t.read(), ["c_mktsegment"], "c_acctbal"
    ).localCheckpoint()
    for commit in (
        lambda: t.merge(
            cust.filter((F.col("c_custkey") > 700) & (F.col("c_custkey") <= 900))
            .withColumn("c_acctbal", F.col("c_acctbal") * 2)
        ),
        lambda: t.delete(
            cust.filter(F.col("c_custkey") % 53 == 0).select("c_custkey")
        ),
    ):
        v_before = t.latest_version()
        commit()
        feed = t.changes(v_before, include_old=True)
        view = apply_changes_to_minmax(
            view, feed, t.read(), ["c_mktsegment"], "c_acctbal"
        ).localCheckpoint()
    return view.select(
        "c_mktsegment",
        F.col("n").cast("bigint").alias("n"),
        r4(F.col("min_v")).alias("min_bal"),
        r4(F.col("max_v")).alias("max_bal"),
    ).orderBy("c_mktsegment")


def _k_truss_oracle_sql(k: int = 6, rounds: int = 8) -> str:
    """Unrolled edge-peel replay of graph/algorithms.py:k_truss over the
    p%4 part-co-occurrence graph. The fixture converges in 3-4 rounds at
    every SF (probed 0.001/0.01/0.1); extra rounds are no-ops after the
    fixpoint, so 8 gives margin. Triangles enumerate once per round via
    the id-ordering (x<y<z); a final support pass over the converged
    edge set yields the reported per-edge supports."""
    parts = [
        "WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p"
        " FROM lineitem WHERE l_partkey % 4 = 0)",
        "e0 AS MATERIALIZED (SELECT DISTINCT a.p AS a, b.p AS b"
        " FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)",
    ]
    for r in range(rounds):
        parts.append(
            f"tri{r} AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z"
            f" FROM e{r} e1 JOIN e{r} e2 ON e2.a = e1.b"
            f" JOIN e{r} e3 ON e3.a = e1.a AND e3.b = e2.b)"
        )
        parts.append(
            f"e{r + 1} AS MATERIALIZED (SELECT a, b FROM ("
            f" SELECT x AS a, y AS b FROM tri{r}"
            f" UNION ALL SELECT y, z FROM tri{r}"
            f" UNION ALL SELECT x, z FROM tri{r})"
            f" GROUP BY 1, 2 HAVING count(*) >= {k - 2})"
        )
    r = rounds
    parts.append(
        f"ftri AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z"
        f" FROM e{r} e1 JOIN e{r} e2 ON e2.a = e1.b"
        f" JOIN e{r} e3 ON e3.a = e1.a AND e3.b = e2.b)"
    )
    parts.append(
        "fsupp AS MATERIALIZED (SELECT a, b, count(*) AS s FROM ("
        " SELECT x AS a, y AS b FROM ftri"
        " UNION ALL SELECT y, z FROM ftri"
        " UNION ALL SELECT x, z FROM ftri) GROUP BY 1, 2)"
    )
    return ",\n".join(parts) + """
    SELECT CAST(s AS BIGINT) AS support, CAST(count(*) AS BIGINT) AS n_edges
    FROM fsupp GROUP BY 1
    """


@register("k_truss_cooccurrence", oracle=_k_truss_oracle_sql())
def k_truss_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — the 6-truss of the p%4 part-co-occurrence graph
    (graph/algorithms.py:k_truss): the cohesive backbone where every
    surviving edge closes ≥4 triangles WITHIN the survivors. The edge
    analog of k_core — peeling cascades for 3-4 rounds at every fixture
    SF (a single support filter is NOT the truss; early removals strip
    support from surviving edges). Output is the support histogram of
    the converged truss. Oracle: the peel unrolled round-by-round in SQL
    with a fixpoint margin."""
    from graph_db_spark.graph.algorithms import k_truss

    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.filter(F.col("l_partkey") % 4 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(b, on=[F.col("a.o") == F.col("b.o"), F.col("a.p") < F.col("b.p")])
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    t = k_truss(e, 6)
    return t.groupBy(F.col("support").cast("bigint").alias("support")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    )


@register(
    "truss_communities",
    oracle=_k_truss_oracle_sql().replace(
        "WITH op AS", "WITH RECURSIVE op AS", 1
    ).replace(
        """
    SELECT CAST(s AS BIGINT) AS support, CAST(count(*) AS BIGINT) AS n_edges
    FROM fsupp GROUP BY 1
    """,
        """,
    tedges AS (
      SELECT a AS src, b AS dst FROM fsupp
      UNION ALL SELECT b, a FROM fsupp
    ),
    tnodes AS (SELECT DISTINCT src AS id FROM tedges),
    reach(id, rid) AS (
      SELECT id, id FROM tnodes
      UNION
      SELECT r.id, e.dst FROM reach r JOIN tedges e ON e.src = r.rid
    ),
    memb AS (SELECT id, min(rid) AS comp FROM reach GROUP BY id),
    sizes AS (SELECT comp, count(*) AS community_size FROM memb GROUP BY 1)
    SELECT CAST(community_size AS BIGINT) AS community_size,
           CAST(count(*) AS BIGINT) AS n_communities
    FROM sizes GROUP BY 1
    """,
    ),
)
def truss_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — cohesive community detection by COMPOSITION:
    the 6-truss strips every weakly-attached edge (k_truss), then
    connected components over the surviving edges yields communities in
    which every member edge closes ≥4 internal triangles — the standard
    truss-community construction, and exactly the kind of two-operator
    pipeline a graph-DB user writes. Both stages are the already-verified
    operators; the oracle appends the recursive closure to the unrolled
    peel. Output: community-size histogram."""
    from graph_db_spark.graph.algorithms import connected_components, k_truss

    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.filter(F.col("l_partkey") % 4 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(b, on=[F.col("a.o") == F.col("b.o"), F.col("a.p") < F.col("b.p")])
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    truss = k_truss(e, 6).select(
        F.col("a").cast("string").alias("src"), F.col("b").cast("string").alias("dst")
    )
    comp = connected_components(truss, n_partitions=4)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("community_size"))
    return sizes.groupBy(
        F.col("community_size").cast("bigint").alias("community_size")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_communities"))


_CURATED_ORACLE = f"""
    WITH RECURSIVE {_minhash_band_sql()},
    vtoks AS (
      SELECT doc_id,
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents
    ),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM cands c
      JOIN vtoks a ON a.doc_id = c.id_a
      JOIN vtoks b ON b.doc_id = c.id_b
      WHERE len(list_intersect(a.t, b.t)) * 1.0
            / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.6
    ),
    dedges AS (
      SELECT id_a AS src, id_b AS dst FROM verified
      UNION ALL SELECT id_b, id_a FROM verified
    ),
    dnodes AS (SELECT DISTINCT src AS id FROM dedges),
    reach(id, rid) AS (
      SELECT id, id FROM dnodes
      UNION
      SELECT r.id, e.dst FROM reach r JOIN dedges e ON e.src = r.rid
    ),
    -- the canonical pick must mirror Spark's CC label exactly: component
    -- ids are STRINGS there, so min() is lexicographic ('10' < '9')
    memb AS (
      SELECT id, min(CAST(rid AS VARCHAR)) AS canonical FROM reach GROUP BY id
    ),
    drops AS (SELECT id FROM memb WHERE CAST(id AS VARCHAR) <> canonical),
    keepd AS (
      SELECT * FROM documents WHERE doc_id NOT IN (SELECT id FROM drops)
    ),
    hq AS (
      SELECT doc_id, source, n_chars, text,
             len(list_distinct(list_intersect(
               list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
               {{sw_en}}))) AS h_en,
             len(list_distinct(list_intersect(
               list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
               {{sw_es}}))) AS h_es,
             len(list_distinct(list_intersect(
               list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
               {{sw_de}}))) AS h_de,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok
      FROM keepd
    ),
    q AS (
      SELECT doc_id, source, n_chars,
             round((least(n_tok / 50.0, 1.0)
                    + (1.0 - least(((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) * 1.0
                                    / nullif(length(text), 0)) * 5.0, 1.0))
                    + least((h_en + h_es + h_de) / 5.0, 1.0)) / 3.0, 4) AS quality
      FROM hq
    ),
    med AS (SELECT source, quantile_cont(quality, 0.5) AS m FROM q GROUP BY 1),
    kept AS (
      SELECT q.* FROM q JOIN med ON med.source = q.source WHERE q.quality >= med.m
    ),
    final AS (
      SELECT source,
             CASE WHEN {_poly_sql("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'train'
                  WHEN {_poly_sql("CAST(doc_id AS VARCHAR)")} % 100 < 95 THEN 'valid'
                  ELSE 'test' END AS split,
             n_chars
      FROM kept
    )
    SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM final GROUP BY 1, 2
""".replace("{sw_en}", _SW_SQL["en"]).replace("{sw_es}", _SW_SQL["es"]).replace("{sw_de}", _SW_SQL["de"])


_PROVENANCE_ORACLE = _CURATED_ORACLE[: _CURATED_ORACLE.index("    kept AS (")] + f"""    cls AS (
      SELECT d.doc_id, d.source,
             CASE
               WHEN d.doc_id IN (SELECT id FROM drops) THEN 'near_dup'
               WHEN q.quality < med.m THEN 'low_quality'
               WHEN {_poly_sql("CAST(d.doc_id AS VARCHAR)")} % 100 < 90 THEN 'train'
               WHEN {_poly_sql("CAST(d.doc_id AS VARCHAR)")} % 100 < 95 THEN 'valid'
               ELSE 'test' END AS stage
      FROM documents d
      LEFT JOIN q ON q.doc_id = d.doc_id
      LEFT JOIN med ON med.source = d.source
    )
    SELECT source, stage, CAST(count(*) AS BIGINT) AS n_docs
    FROM cls GROUP BY 1, 2
"""


