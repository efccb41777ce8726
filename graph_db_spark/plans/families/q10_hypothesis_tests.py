"""Query inventory part 10 (mechanical r12 split of
plans/queries.py — statement order and bodies byte-identical to
the monolith; registration order is preserved by the aggregator's
import order). Registers 23 queries:

  welch_t_test, levene_variance_test, sprt_sequential_decision
  katz_walk_centrality, region_trade_assortativity, association_rule_triples
  item_item_collaborative_topk, markov_absorption_conversion, pca_power_iteration
  capture_recapture_estimate, good_turing_unseen_mass, heaps_law_fit
  poisson_rate_ratio, dispersion_index_check, mcnemar_paired_test
  markov_entropy_rate, binary_segmentation_changepoint, weighted_median_price
  positional_phrase_search, energy_distance_groups, trade_reciprocity
  rich_club_coefficient, token_pmi_collocations
"""
from __future__ import annotations

import math

from graph_db_spark.plans.families.q00_base import (  # noqa: F401
    DataFrame, F, SparkSession, Window,
    load_table, r4, register,
)
from graph_db_spark.plans.families.q01_relational_pipeline import (  # noqa: F401
    SIM, edges_sql,
)
from graph_db_spark.operators.joins import dim_hint

@register(
    "welch_t_test",
    oracle="""
    WITH g AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent' ELSE 'low' END AS grp,
             count(*) * 1.0 AS n, sum(o_totalprice) AS s,
             sum(o_totalprice * o_totalprice) AS ss
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY 1
    ),
    m AS (
      SELECT grp, n, s / n AS mean, (ss - s * s / n) / (n - 1) AS var
      FROM g
    ),
    w AS (
      SELECT a.n AS n1, b.n AS n2, a.mean - b.mean AS diff,
             a.var / a.n + b.var / b.n AS se2,
             a.var / a.n AS v1, b.var / b.n AS v2
      FROM m a JOIN m b ON a.grp = 'urgent' AND b.grp = 'low'
    )
    SELECT CAST(n1 AS BIGINT) AS n_urgent, CAST(n2 AS BIGINT) AS n_low,
           round(diff, 4) + 0.0 AS mean_diff,
           round(diff / sqrt(se2), 4) + 0.0 AS t_stat,
           round(se2 * se2 / (v1 * v1 / (n1 - 1) + v2 * v2 / (n2 - 1)), 4)
             + 0.0 AS df_welch
    FROM w
    """,
)
def welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — Welch's unequal-variance t-test (urgent vs low
    priority order totals) with the Welch-Satterthwaite effective df:
    the robust default two-sample test (pooled-variance Student's t is
    wrong under heteroscedasticity). Sufficient statistics only — one
    filtered aggregate, a 2-row self-join, scalar math; emissions are
    ratios/means so float drift stays relative."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    g = o.groupBy(
        F.when(F.col("o_orderpriority") == "1-URGENT", "urgent")
        .otherwise("low")
        .alias("grp")
    ).agg(
        (F.count(F.lit(1)) * 1.0).alias("n"),
        F.sum("o_totalprice").alias("s"),
        F.sum(F.col("o_totalprice") * F.col("o_totalprice")).alias("ss"),
    )
    m = g.select(
        "grp",
        "n",
        (F.col("s") / F.col("n")).alias("mean"),
        ((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)).alias("var"),
    )
    b = m.select(
        F.col("grp").alias("grp2"), F.col("n").alias("n2"),
        F.col("mean").alias("mean2"), F.col("var").alias("var2"),
    )
    w = m.join(b, (F.col("grp") == "urgent") & (F.col("grp2") == "low"))
    v1, v2 = F.col("var") / F.col("n"), F.col("var2") / F.col("n2")
    se2 = v1 + v2
    return w.select(
        F.col("n").cast("bigint").alias("n_urgent"),
        F.col("n2").cast("bigint").alias("n_low"),
        r4(F.col("mean") - F.col("mean2")).alias("mean_diff"),
        r4((F.col("mean") - F.col("mean2")) / F.sqrt(se2)).alias("t_stat"),
        r4(
            se2 * se2
            / (v1 * v1 / (F.col("n") - 1) + v2 * v2 / (F.col("n2") - 1))
        ).alias("df_welch"),
    )


@register(
    "levene_variance_test",
    oracle="""
    WITH med AS (
      SELECT l_returnflag AS flag, quantile_cont(l_quantity, 0.5) AS md
      FROM lineitem GROUP BY 1
    ),
    z AS (
      SELECT li.l_returnflag AS flag,
             abs(li.l_quantity - med.md) AS z
      FROM lineitem li JOIN med ON li.l_returnflag = med.flag
    ),
    g AS (
      SELECT flag, count(*) * 1.0 AS ng, sum(z) AS s, sum(z * z) AS ss
      FROM z GROUP BY 1
    ),
    tot AS (
      SELECT count(*) AS k, sum(ng) AS n, sum(s) AS st, sum(ss) AS sst,
             sum(s * s / ng) AS sb
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           round(((n - k) / (k - 1.0))
                 * (sb - st * st / n) / (sst - sb), 4) + 0.0 AS w_stat
    FROM tot
    """,
)
def levene_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — Brown-Forsythe (median-centered Levene) test for
    variance homogeneity of quantity across return flags: the
    precondition check for pooled-variance ANOVA (anova_f_oneway), and
    robust to non-normality where mean-centered Levene is not. Group
    medians via the interpolating percentile (cross-engine parity
    established by quality_quantile_filter), then a one-way ANOVA on
    |x − med| from sufficient statistics — two aggregates total."""
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.expr("percentile(l_quantity, 0.5)").alias("md")
    )
    z = li.join(
        F.broadcast(med), li.l_returnflag == F.col("flag")
    ).select("flag", F.abs(F.col("l_quantity") - F.col("md")).alias("z"))
    g = z.groupBy("flag").agg(
        (F.count(F.lit(1)) * 1.0).alias("ng"),
        F.sum("z").alias("s"),
        F.sum(F.col("z") * F.col("z")).alias("ss"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("s").alias("st"),
        F.sum("ss").alias("sst"),
        F.sum(F.col("s") * F.col("s") / F.col("ng")).alias("sb"),
    )
    ssb = F.col("sb") - F.col("st") * F.col("st") / F.col("n")
    ssw = F.col("sst") - F.col("sb")
    return tot.select(
        F.col("k").cast("bigint").alias("k"),
        F.col("n").cast("bigint").alias("n"),
        r4(
            ((F.col("n") - F.col("k")) / (F.col("k") - 1.0)) * ssb / ssw
        ).alias("w_stat"),
    )


@register(
    "sprt_sequential_decision",
    oracle="""
    WITH trials AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
             ts, event_id
      FROM events
    ),
    cum AS (
      SELECT x,
             row_number() OVER (ORDER BY ts, event_id) AS rn,
             sum(CASE WHEN x = 1 THEN CAST(0.20067069546215124 AS DOUBLE) ELSE CAST(-0.050010420574661305 AS DOUBLE) END)
               OVER (ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
      FROM trials
    ),
    cross_pt AS (
      SELECT min(rn) AS rn_cross FROM cum
      WHERE llr >= 2.9444389791664403 OR llr <= -2.9444389791664403
    ),
    at_cross AS (
      SELECT c.rn, c.llr FROM cum c, cross_pt WHERE c.rn = cross_pt.rn_cross
    ),
    fin AS (
      SELECT count(*) AS n, sum(x) AS s, max(CASE WHEN rn = (SELECT count(*) FROM cum) THEN llr END) AS llr_final
      FROM cum
    )
    SELECT CAST(fin.n AS BIGINT) AS n_trials,
           CAST(fin.s AS BIGINT) AS n_success,
           CAST(at_cross.rn AS BIGINT) AS decision_at,
           CASE WHEN at_cross.llr IS NULL THEN 'continue'
                WHEN at_cross.llr >= 2.9444389791664403 THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           round(at_cross.llr, 4) + 0.0 AS llr_at_decision,
           round(fin.llr_final, 4) + 0.0 AS llr_final
    FROM fin LEFT JOIN at_cross ON true
    """,
)
def sprt_sequential_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — Wald's SPRT over the event stream as Bernoulli
    trials (purchase vs not, H0: p=0.18 vs H1: p=0.22, α=β=0.05): the
    cumulative log-likelihood ratio walk and the FIRST boundary
    crossing (±ln 19) — the sequential A/B stopping rule that ends
    experiments at the earliest defensible moment instead of a fixed
    horizon (ab_test_proportions is the fixed-horizon twin). The
    per-trial increments are shared double literals. NO global window
    (r7 verdict fix): the cumulative walk comes from the two-level
    prefix sum (``with_global_rank(cumsum_cols=...)`` — range partition
    on (ts, event_id), pid-local ordered cumsum, broadcast per-partition
    offsets) so a billion-trial experiment walks as #partitions parallel
    cumsums. The increments (±0.2, ±0.05 scale) keep accumulated FP
    noise ~1e-12 — far inside the round(,4) guard and never within
    boundary-crossing distance of ±ln 19 on the fixtures. The global
    order is the test's semantics (one experiment = one sequence; a
    real deployment partitions by experiment key)."""
    from graph_db_spark.operators.aggregates import with_global_rank

    ev = load_table(spark, sf_dir, "events")
    trials = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("x"),
        "ts",
        "event_id",
    ).withColumn(
        "z",
        F.when(F.col("x") == 1, F.lit(0.20067069546215124)).otherwise(
            F.lit(-0.050010420574661305)
        ),
    )
    cum = with_global_rank(
        trials,
        [F.asc("ts"), F.asc("event_id")],
        rank_col="rn",
        cumsum_cols={"llr": "z"},
    ).select("x", "rn", "llr")
    cross_pt = cum.filter(
        (F.col("llr") >= 2.9444389791664403) | (F.col("llr") <= -2.9444389791664403)
    ).agg(F.min("rn").alias("rn_cross"))
    at_cross = cum.join(
        F.broadcast(cross_pt), F.col("rn") == F.col("rn_cross")
    ).select(F.col("rn").alias("rn_at"), F.col("llr").alias("llr_at"))
    n_tot = cum.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    fin = cum.crossJoin(F.broadcast(n_tot)).filter(F.col("rn") == F.col("n")).select(
        "n", "s", F.col("llr").alias("llr_final")
    )
    return fin.join(at_cross, how="left", on=F.lit(True)).select(
        F.col("n").cast("bigint").alias("n_trials"),
        F.col("s").cast("bigint").alias("n_success"),
        F.col("rn_at").cast("bigint").alias("decision_at"),
        F.when(F.col("llr_at").isNull(), "continue")
        .when(F.col("llr_at") >= 2.9444389791664403, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
        r4(F.col("llr_at")).alias("llr_at_decision"),
        r4(F.col("llr_final")).alias("llr_final"),
    )


def _katz_oracle_sql() -> str:
    """Truncated-series Katz oracle: integer walk counts w_k (k ≤ 4) by
    repeated edge joins, combined with the SAME python-emitted α^k
    double literals the Spark side uses, in the same fixed summation
    order — per-label masses round(,4) far above summation noise."""
    return f"""
    WITH edges AS MATERIALIZED ({{edges}}),
    verts AS MATERIALIZED (SELECT DISTINCT id FROM
      (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
    w1 AS MATERIALIZED (SELECT dst AS id, count(*) AS w FROM edges GROUP BY 1),
    w2 AS MATERIALIZED (SELECT e.dst AS id, sum(w1.w) AS w
                        FROM edges e JOIN w1 ON e.src = w1.id GROUP BY 1),
    w3 AS MATERIALIZED (SELECT e.dst AS id, sum(w2.w) AS w
                        FROM edges e JOIN w2 ON e.src = w2.id GROUP BY 1),
    w4 AS MATERIALIZED (SELECT e.dst AS id, sum(w3.w) AS w
                        FROM edges e JOIN w3 ON e.src = w3.id GROUP BY 1),
    katz AS (
      SELECT v.id,
             CAST(0.1 AS DOUBLE) * coalesce(w1.w, 0)
             + CAST(0.010000000000000002 AS DOUBLE) * coalesce(w2.w, 0)
             + CAST(0.0010000000000000002 AS DOUBLE) * coalesce(w3.w, 0)
             + CAST(0.00010000000000000002 AS DOUBLE) * coalesce(w4.w, 0) AS c
      FROM verts v
      LEFT JOIN w1 ON v.id = w1.id
      LEFT JOIN w2 ON v.id = w2.id
      LEFT JOIN w3 ON v.id = w3.id
      LEFT JOIN w4 ON v.id = w4.id
    )
    SELECT substr(id, 1, 1) AS label, CAST(count(*) AS BIGINT) AS n,
           round(sum(c), 4) + 0.0 AS katz_mass,
           round(max(c), 4) + 0.0 AS max_katz
    FROM katz GROUP BY 1
    """


@register("katz_walk_centrality", oracle=_katz_oracle_sql().format(edges=edges_sql()))
def katz_walk_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph — truncated-series Katz centrality (α=0.1, 4 terms):
    c(v) = Σ α^k · #walks_k→v with INTEGER walk counts, so unlike the
    power-iteration family every intermediate is exact and the only
    float surface is the final 4-term fixed-order combination (shared
    α^k literals). Completes the centrality family: degree (local),
    PageRank (stationary), HITS (mutual), harmonic/betweenness
    (distance) — Katz weighs ALL walks, damped by length. Spark plan:
    the edge table prepartitions ONCE on src (prepartition_for_rounds),
    each of the 4 rounds shuffles only the |V|-sized walk-count table —
    the standard iterative-join discipline of this engine at 100 TB."""
    from graph_db_spark.graph.algorithms import (
        checkpoint_keep_partitioning,
        prepartition_for_rounds,
    )
    from graph_db_spark.graph.build import build_graph

    g = build_graph(spark, sf_dir)
    nparts = spark.sparkContext.defaultParallelism
    e = prepartition_for_rounds(
        g.edges.select(F.col("src").alias("id"), "dst"), nparts, "id"
    )
    verts = checkpoint_keep_partitioning(
        e.select("id").union(e.select(F.col("dst").alias("id"))).distinct()
    )
    w_cur = verts.select("id", F.lit(1).cast("long").alias("w"))
    walks = []
    for _k in range(4):
        w_cur = checkpoint_keep_partitioning(
            e.join(w_cur, on="id")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("w").alias("w"))
        )
        walks.append(w_cur)
    katz = verts
    for i, wk in enumerate(walks, 1):
        katz = katz.join(
            wk.select("id", F.col("w").alias(f"w{i}".format(i=i))), on="id", how="left"
        )
    c = (
        F.lit(0.1) * F.coalesce("w1", F.lit(0))
        + F.lit(0.010000000000000002) * F.coalesce("w2", F.lit(0))
        + F.lit(0.0010000000000000002) * F.coalesce("w3", F.lit(0))
        + F.lit(0.00010000000000000002) * F.coalesce("w4", F.lit(0))
    )
    return katz.select(F.substring("id", 1, 1).alias("label"), c.alias("c")).groupBy(
        "label"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        r4(F.sum("c")).alias("katz_mass"),
        r4(F.max("c")).alias("max_katz"),
    )


@register(
    "region_trade_assortativity",
    oracle="""
    WITH e AS (
      SELECT ns.n_regionkey AS r_sup, nc.n_regionkey AS r_cust,
             count(*) * 1.0 AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT sum(w) AS m FROM e),
    marg AS (
      SELECT sum(CASE WHEN r_sup = r_cust THEN w ELSE 0 END) / tot.m AS same,
             sum(w) AS allw
      FROM e, tot GROUP BY tot.m
    ),
    ab AS (
      SELECT sum(a.sw * b.cw) AS expct FROM
        (SELECT r_sup, sum(w) / (SELECT m FROM tot) AS sw FROM e GROUP BY 1) a
        JOIN
        (SELECT r_cust, sum(w) / (SELECT m FROM tot) AS cw FROM e GROUP BY 1) b
        ON a.r_sup = b.r_cust
    )
    SELECT CAST((SELECT m FROM tot) AS BIGINT) AS n_edges,
           round(marg.same, 4) + 0.0 AS frac_same_region,
           round(ab.expct, 4) + 0.0 AS expected_same,
           round((marg.same - ab.expct) / (1.0 - ab.expct), 4) + 0.0
             AS assortativity
    FROM marg, ab
    """,
)
def region_trade_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph — nominal (categorical) assortativity of the trade graph
    by REGION: Newman's r = (Σe_ii − Σa_i·b_i)/(1 − Σa_i·b_i) over
    supplier-region → customer-region edge mass (each lineitem one
    weighted edge). Positive = regional trade blocs, ~0 = geography-
    blind trade (degree_assortativity is the numeric-attribute twin;
    this is the attribute-mixing form). The fact join collapses to a
    |regions|² mixing matrix before any ratio — bounded nation dims
    force-broadcast, SF-scaling customer/supplier sides unhinted
    (``dim_hint``, AQE decides), one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dim_hint(c.select("c_custkey", "c_nationkey"), bounded=False), o.o_custkey == F.col("c_custkey"))
        .join(dim_hint(s.select("s_suppkey", "s_nationkey"), bounded=False), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n.select(F.col("n_nationkey").alias("snk"), F.col("n_regionkey").alias("r_sup"))), F.col("s_nationkey") == F.col("snk"))
        .join(F.broadcast(n.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("r_cust"))), F.col("c_nationkey") == F.col("cnk"))
        .groupBy("r_sup", "r_cust")
        .agg((F.count(F.lit(1)) * 1.0).alias("w"))
    )
    tot = e.agg(F.sum("w").alias("m"))
    et = e.crossJoin(F.broadcast(tot))
    marg = et.agg(
        (F.sum(F.when(F.col("r_sup") == F.col("r_cust"), F.col("w")).otherwise(0.0)) / F.first("m")).alias("same"),
        F.first("m").alias("m"),
    )
    a = et.groupBy("r_sup").agg((F.sum("w") / F.first("m")).alias("sw"))
    b = et.groupBy("r_cust").agg((F.sum("w") / F.first("m")).alias("cw"))
    ab = a.join(b, F.col("r_sup") == F.col("r_cust")).agg(
        F.sum(F.col("sw") * F.col("cw")).alias("expct")
    )
    return marg.crossJoin(ab).select(
        F.col("m").cast("bigint").alias("n_edges"),
        r4(F.col("same")).alias("frac_same_region"),
        r4(F.col("expct")).alias("expected_same"),
        r4((F.col("same") - F.col("expct")) / (1.0 - F.col("expct"))).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# r7 batch 6 — Apriori triples / item-item CF / absorbing Markov /
# PCA power iteration
# ---------------------------------------------------------------------------


@register(
    "association_rule_triples",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    nb AS (SELECT count(DISTINCT basket) AS n FROM b),
    i1 AS (SELECT item, count(*) AS n1 FROM b GROUP BY 1),
    i2 AS (
      SELECT a.item AS ia, c.item AS ib, count(*) AS n2
      FROM b a JOIN b c ON a.basket = c.basket AND a.item < c.item
      GROUP BY 1, 2
    ),
    i3 AS (
      SELECT a.item AS ia, c.item AS ib, d.item AS ic, count(*) AS n3
      FROM b a
      JOIN b c ON a.basket = c.basket AND a.item < c.item
      JOIN b d ON a.basket = d.basket AND c.item < d.item
      GROUP BY 1, 2, 3
    ),
    rules AS (
      SELECT i3.ia, i3.ib, i3.ic, i3.n3, i2.n2,
             i3.n3 * 1.0 / i2.n2 AS conf,
             (i3.n3 * 1.0 / i2.n2) / (i1.n1 * 1.0 / nb.n) AS lift
      FROM i3 JOIN i2 ON i3.ia = i2.ia AND i3.ib = i2.ib
              JOIN i1 ON i3.ic = i1.item
              CROSS JOIN nb
      WHERE i3.n3 >= 5
    )
    SELECT ia AS antecedent_a, ib AS antecedent_b, ic AS consequent,
           CAST(n3 AS BIGINT) AS support_abc,
           CAST(n2 AS BIGINT) AS support_ab,
           round(conf, 4) + 0.0 AS confidence,
           round(lift, 4) + 0.0 AS lift
    FROM rules
    ORDER BY lift DESC, conf DESC, ia, ib, ic
    LIMIT 15
    """,
)
def association_rule_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mining — 3-item association rules {A,B}→C over order baskets at
    brand granularity: the Apriori step beyond market_basket_lift's
    pairs (a pair-lift can be confounded by a third item; the triple
    rule surfaces it). Two self-joins on the DISTINCT (basket, item)
    projection with lexicographic item ordering — the candidate space
    is bounded by per-basket item count squared, not catalog size, and
    the ≥5-support floor prunes before the rule join. Counts integer;
    confidence/lift are single divisions."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(dim_hint(p, bounded=False), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
        .distinct()
    )
    nb = b.agg(F.countDistinct("basket").alias("n"))
    i1 = b.groupBy("item").agg(F.count(F.lit(1)).alias("n1"))
    b2 = b.select(F.col("basket"), F.col("item").alias("item2"))
    i2 = (
        b.join(b2, on="basket")
        .filter(F.col("item") < F.col("item2"))
        .groupBy(F.col("item").alias("ia"), F.col("item2").alias("ib"))
        .agg(F.count(F.lit(1)).alias("n2"))
    )
    b3 = b.select(F.col("basket"), F.col("item").alias("item3"))
    i3 = (
        b.join(b2, on="basket")
        .filter(F.col("item") < F.col("item2"))
        .join(b3, on="basket")
        .filter(F.col("item2") < F.col("item3"))
        .groupBy(
            F.col("item").alias("ia"),
            F.col("item2").alias("ib"),
            F.col("item3").alias("ic"),
        )
        .agg(F.count(F.lit(1)).alias("n3"))
        .filter(F.col("n3") >= 5)
    )
    rules = (
        i3.join(i2, on=["ia", "ib"])
        .join(i1.select(F.col("item").alias("ic"), "n1"), on="ic")
        .crossJoin(F.broadcast(nb))
        .select(
            "ia", "ib", "ic", "n3", "n2",
            (F.col("n3") * 1.0 / F.col("n2")).alias("conf"),
            (
                (F.col("n3") * 1.0 / F.col("n2"))
                / (F.col("n1") * 1.0 / F.col("n"))
            ).alias("lift"),
        )
    )
    return (
        rules.orderBy(F.desc("lift"), F.desc("conf"), "ia", "ib", "ic")
        .limit(15)
        .select(
            F.col("ia").alias("antecedent_a"),
            F.col("ib").alias("antecedent_b"),
            F.col("ic").alias("consequent"),
            F.col("n3").cast("bigint").alias("support_abc"),
            F.col("n2").cast("bigint").alias("support_ab"),
            r4(F.col("conf")).alias("confidence"),
            r4(F.col("lift")).alias("lift"),
        )
    )


@register(
    "item_item_collaborative_topk",
    oracle="""
    WITH b AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS item
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    cnt AS (SELECT item, count(*) AS n FROM b GROUP BY 1),
    co AS (
      SELECT a.item AS ia, c.item AS ib, count(*) AS nab
      FROM b a JOIN b c ON a.cust = c.cust AND a.item <> c.item
      WHERE a.item < 10
      GROUP BY 1, 2
    ),
    sim AS (
      SELECT co.ia, co.ib, co.nab,
             co.nab / (sqrt(na.n) * sqrt(nc.n)) AS cos,
             row_number() OVER (
               PARTITION BY co.ia
               ORDER BY co.nab / (sqrt(na.n) * sqrt(nc.n)) DESC, co.ib
             ) AS rnk
      FROM co JOIN cnt na ON co.ia = na.item
              JOIN cnt nc ON co.ib = nc.item
    )
    SELECT ia AS item, ib AS neighbor, CAST(nab AS BIGINT) AS n_co_buyers,
           round(cos, 4) + 0.0 AS cosine_sim, CAST(rnk AS BIGINT) AS rank
    FROM sim WHERE rnk <= 3
    """,
)
def item_item_collaborative_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommender — item-item collaborative filtering (Sarwar et al.):
    cosine over binary customer-purchase vectors, n_ab/√(n_a·n_b),
    top-3 neighbors for the probe items (partkey < 10). The co-buyer
    join runs customer-partitioned, so its cost is Σ per-customer
    basket², independent of catalog size, and only the probe side of
    the pair space materializes (predicate pushed below the self-join).
    Counts integer; one sqrt ratio per pair."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    b = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    cnt = b.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    probe = b.filter(F.col("item") < 10).select(
        "cust", F.col("item").alias("ia")
    )
    co = (
        probe.join(b.select("cust", F.col("item").alias("ib")), on="cust")
        .filter(F.col("ia") != F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("nab"))
    )
    na = cnt.select(F.col("item").alias("ia"), F.col("n").alias("na"))
    nc = cnt.select(F.col("item").alias("ib"), F.col("n").alias("nb"))
    sim = (
        co.join(dim_hint(na, bounded=False), on="ia")
        .join(dim_hint(nc, bounded=False), on="ib")
        .select(
            "ia", "ib", "nab",
            (F.col("nab") / (F.sqrt("na") * F.sqrt("nb"))).alias("cos"),
        )
    )
    w = Window.partitionBy("ia").orderBy(F.desc("cos"), "ib")
    return (
        sim.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("ia").alias("item"),
            F.col("ib").alias("neighbor"),
            F.col("nab").cast("bigint").alias("n_co_buyers"),
            r4(F.col("cos")).alias("cosine_sim"),
            F.col("rnk").cast("bigint").alias("rank"),
        )
    )


@register(
    "markov_absorption_conversion",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    emp AS (
      SELECT prev, event_type AS next, count(*) * 1.0 AS n
      FROM seq WHERE prev IS NOT NULL AND prev <> 'purchase'
      GROUP BY 1, 2
    ),
    m AS MATERIALIZED (
      SELECT prev, next, n / sum(n) OVER (PARTITION BY prev) AS p FROM emp
      UNION ALL
      SELECT 'purchase', 'purchase', CAST(1.0 AS DOUBLE)
    ),
    states AS (SELECT DISTINCT prev AS s FROM m),
    v0 AS (SELECT s, CASE WHEN s = 'purchase' THEN CAST(1.0 AS DOUBLE)
                          ELSE CAST(0.0 AS DOUBLE) END AS v
           FROM states),
    v1 AS (
      SELECT m.prev AS s, sum(m.p * v0.v) AS v
      FROM m JOIN v0 ON m.next = v0.s GROUP BY 1
    ),
    v2 AS (
      SELECT m.prev AS s, sum(m.p * v1.v) AS v
      FROM m JOIN v1 ON m.next = v1.s GROUP BY 1
    ),
    v3 AS (
      SELECT m.prev AS s, sum(m.p * v2.v) AS v
      FROM m JOIN v2 ON m.next = v2.s GROUP BY 1
    ),
    v4 AS (
      SELECT m.prev AS s, sum(m.p * v3.v) AS v
      FROM m JOIN v3 ON m.next = v3.s GROUP BY 1
    ),
    v5 AS (
      SELECT m.prev AS s, sum(m.p * v4.v) AS v
      FROM m JOIN v4 ON m.next = v4.s GROUP BY 1
    ),
    v6 AS (
      SELECT m.prev AS s, sum(m.p * v5.v) AS v
      FROM m JOIN v5 ON m.next = v5.s GROUP BY 1
    ),
    v7 AS (
      SELECT m.prev AS s, sum(m.p * v6.v) AS v
      FROM m JOIN v6 ON m.next = v6.s GROUP BY 1
    ),
    v8 AS (
      SELECT m.prev AS s, sum(m.p * v7.v) AS v
      FROM m JOIN v7 ON m.next = v7.s GROUP BY 1
    )
    SELECT s AS start_state, round(v, 4) + 0.0 AS p_absorb_8
    FROM v8
    """,
)
def markov_absorption_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamics — absorbing-Markov-chain conversion probability: the
    empirical event-transition matrix (event_transition_matrix) with
    'purchase' made absorbing, powered 8 steps — P(convert within 8
    events | current state), the attribution number last-touch models
    fake. 8 unrolled matrix-vector rounds over a |states|² matrix: the
    heavy part is ONE lag-window pass over the fact stream; everything
    after is constant-sized regardless of scale. The same contract as
    the other fixed-round iteratives: both engines run the identical
    truncation, so the emission is comparable, not merely close."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull() & (F.col("prev") != "purchase"))
    emp = seq.groupBy(
        F.col("prev"), F.col("event_type").alias("next")
    ).agg((F.count(F.lit(1)) * 1.0).alias("n"))
    m = emp.select(
        "prev",
        "next",
        (F.col("n") / F.sum("n").over(Window.partitionBy("prev"))).alias("p"),
    ).unionByName(
        ev.sparkSession.createDataFrame(
            [("purchase", "purchase", 1.0)], "prev string, next string, p double"
        )
    )
    # the matrix is reused by all 8 rounds: checkpoint once so the
    # lag-window subtree executes once, then broadcast the 26-row result
    m = F.broadcast(m.localCheckpoint(eager=True))
    states = m.select(F.col("prev").alias("s")).distinct()
    v = states.select(
        "s",
        F.when(F.col("s") == "purchase", 1.0).otherwise(0.0).alias("v"),
    )
    for _ in range(8):
        v = (
            m.join(v, m.next == v.s)
            .groupBy(F.col("prev").alias("s2"))
            .agg(F.sum(F.col("p") * F.col("v")).alias("v"))
            .select(F.col("s2").alias("s"), "v")
        )
    return v.select(F.col("s").alias("start_state"), r4(F.col("v")).alias("p_absorb_8"))


def _pca_power_sql(dim: int = 64, rounds: int = 6) -> str:
    """Unrolled power iteration on the embedding covariance matrix: the
    (i,j) entries are avg(xi·xj) − mi·mj from one dimension-pair
    aggregate; v0 = e1; each round is a matrix-vector product plus an
    L2 normalize. All folds are grouped sums whose cross-engine drift
    is relative (~1e−14) and the Rayleigh quotient is a ratio — r4-safe."""
    parts = [f"""
    WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dims AS MATERIALIZED (
      SELECT t.pos AS i, e.v[t.pos] AS x, rowid
      FROM (SELECT v, row_number() OVER () AS rowid FROM e) e
      CROSS JOIN range(1, {dim + 1}) t(pos)
    ),
    mu AS MATERIALIZED (SELECT i, avg(x) AS m FROM dims GROUP BY 1),
    cov AS MATERIALIZED (
      SELECT a.i AS i, b.i AS j, avg(a.x * b.x) AS exy
      FROM dims a JOIN dims b ON a.rowid = b.rowid
      GROUP BY 1, 2
    ),
    c AS MATERIALIZED (
      SELECT cov.i, cov.j, cov.exy - ma.m * mb.m AS c
      FROM cov JOIN mu ma ON cov.i = ma.i JOIN mu mb ON cov.j = mb.i
    ),
    v0 AS (SELECT i, CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE)
                          ELSE CAST(0.0 AS DOUBLE) END AS v
           FROM (SELECT DISTINCT i FROM mu))"""]
    for k in range(1, rounds + 1):
        parts.append(f"""
    w{k} AS MATERIALIZED (SELECT c.i, sum(c.c * v{k-1}.v) AS w
             FROM c JOIN v{k-1} ON c.j = v{k-1}.i GROUP BY 1),
    n{k} AS MATERIALIZED (SELECT sqrt(sum(w * w)) AS nrm FROM w{k}),
    v{k} AS MATERIALIZED (SELECT i, w / n{k}.nrm AS v FROM w{k}, n{k})""")
    last = f"v{rounds}"
    parts.append(f"""
    ray AS (
      SELECT sum(t.w * {last}.v) AS lambda1 FROM
        (SELECT c.i, sum(c.c * {last}.v) AS w
         FROM c JOIN {last} ON c.j = {last}.i GROUP BY 1) t
        JOIN {last} ON t.i = {last}.i
    ),
    tr AS (SELECT sum(c) AS trace FROM c WHERE i = j)
    SELECT CAST({dim} AS BIGINT) AS dim,
           round(ray.lambda1, 4) + 0.0 AS lambda1,
           round(ray.lambda1 / tr.trace, 4) + 0.0 AS explained_ratio,
           round(tr.trace, 4) + 0.0 AS total_variance
    FROM ray, tr""")
    return ",".join(parts[:-1]) + "," + parts[-1]


@register("pca_power_iteration", oracle=_pca_power_sql())
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML — dominant principal component of the embedding cloud by
    power iteration (6 rounds, e1 start) on the 64×64 covariance
    matrix: emits the top eigenvalue, the explained-variance ratio
    (anisotropy diagnostic — a high ratio says the embedding collapses
    toward one direction and cosine similarities degrade), and total
    variance.

    r12 verdict "What's wrong" #2 — the ONLY data-sized pass is now a
    JOIN-FREE dimension-pair aggregate: a nested ``transform`` builds
    the upper-triangle products (i<=j — covariance is symmetric, so
    each mirrored entry is the SAME multiset of x·y products and the
    lower triangle is filled by reflection, bit-exact) plus one bare
    x_i slot per dimension for the mean, INSIDE each row, as a
    PRIMITIVE double array (2144 slots); one ``posexplode`` + a
    single-int-key groupBy follow. Zero shuffle ahead of the partial
    aggregate — the old shape SortMergeJoined two data×64 exploded
    sides on rowid, two data-sized shuffles the verdict flagged. An
    A/B against a named_struct(i,j,p) expansion measured the struct
    allocation 3-6x slower (12-21 s vs 3-5 s at sf0.1), hence the
    flat-slot layout.

    The power iteration itself runs DRIVER-SIDE on the collected
    dim²-sized grid (2144 doubles — constant in data size), exactly
    Spark MLlib's own shape (RowMatrix.computePrincipalComponents:
    distributed Gramian, local eigensolve): the 64×64 matrix-vector
    rounds are sub-microsecond locally but cost ~20 scheduler
    round-trips as lazy 64-row Spark jobs (measured ~5 s of the old
    6-7 s wall). Emission goes back through a 1-row DataFrame so the
    r4 rounding semantics match the oracle's round(x,4)+0.0. Float
    contract unchanged: grouped-sum drift vs DuckDB is relative
    (~1e-14) and every emission is r4-rounded."""
    e = load_table(spark, sf_dir, "embeddings").select(
        SIM._as_double(F.col("embedding")).alias("v"),
    )
    # slot layout per dimension i0 (0-based): [x_i0] ++ [x_i0*x_j0 for
    # j0 in i0..63] — lengths 65, 64, ..., 2; total 2144
    terms = e.select(
        F.posexplode(
            F.flatten(
                F.expr(
                    "transform(v, (x, i0) -> concat(array(x),"
                    " transform(slice(v, i0 + 1, 64 - i0), y -> x * y)))"
                )
            )
        ).alias("pos", "p")
    )
    grid = terms.groupBy("pos").agg(F.avg("p").alias("exy"))
    got = {r["pos"]: r["exy"] for r in grid.collect()}  # dim²-sized
    dim = 64
    mu = [0.0] * dim
    exy = [[0.0] * dim for _ in range(dim)]
    pos = 0
    for i in range(dim):
        mu[i] = got[pos]
        pos += 1
        for j in range(i, dim):
            exy[i][j] = exy[j][i] = got[pos]
            pos += 1
    c = [[exy[i][j] - mu[i] * mu[j] for j in range(dim)] for i in range(dim)]
    v = [1.0 if i == 0 else 0.0 for i in range(dim)]
    for _ in range(6):
        w = [sum(c[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        nrm = math.sqrt(sum(x * x for x in w))
        v = [x / nrm for x in w]
    wl = [sum(c[i][j] * v[j] for j in range(dim)) for i in range(dim)]
    lam = sum(wl[i] * v[i] for i in range(dim))
    trace = sum(c[i][i] for i in range(dim))
    out = spark.createDataFrame(
        [(lam, trace)], "lambda1 double, trace double"
    )
    return out.select(
        F.lit(dim).cast("bigint").alias("dim"),
        r4(F.col("lambda1")).alias("lambda1"),
        r4(F.col("lambda1") / F.col("trace")).alias("explained_ratio"),
        r4(F.col("trace")).alias("total_variance"),
    )


# ---------------------------------------------------------------------------
# r7 batch 7 — capture-recapture / Good-Turing / Heaps' law /
# Poisson rates / dispersion / McNemar / Markov entropy
# ---------------------------------------------------------------------------


@register(
    "capture_recapture_estimate",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE value <= 0.6),
    b AS (SELECT DISTINCT user_id FROM events
          WHERE value > 0.6 AND value <= 1.3),
    m AS (SELECT count(*) AS m FROM a JOIN b USING (user_id)),
    n AS (SELECT count(DISTINCT user_id) AS n_true FROM events)
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_capture_1,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS n_capture_2,
           CAST(m.m AS BIGINT) AS n_recaptured,
           CAST(n.n_true AS BIGINT) AS n_true_population,
           round(CASE WHEN m.m > 0 THEN (SELECT count(*) FROM a) * 1.0
                 * (SELECT count(*) FROM b) / m.m END, 4) + 0.0
             AS lincoln_petersen,
           round(((SELECT count(*) FROM a) + 1.0)
                 * ((SELECT count(*) FROM b) + 1.0) / (m.m + 1.0) - 1.0, 4)
             + 0.0 AS chapman
    FROM m, n
    """,
)
def capture_recapture_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimation — Lincoln-Petersen / Chapman capture-recapture on the
    user population from two quasi-independent 'captures' (users ever
    sighted in two DISJOINT rare value windows, ≤0.6 and (0.6, 1.3] —
    tail sightings, so neither capture saturates): N̂ = n₁n₂/m
    (m=0 guarded to NULL). The coverage question a crawl pipeline
    asks — how big is the TRUE population given two overlapping
    samples — answered from three distinct-count aggregates; the exact
    population rides along as the referee. All inputs integer; the
    estimators are single divisions."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("value") <= 0.6).select("user_id").distinct()
    b = ev.filter(
        (F.col("value") > 0.6) & (F.col("value") <= 1.3)
    ).select("user_id").distinct()
    na = a.agg(F.count(F.lit(1)).alias("n1"))
    nb = b.agg(F.count(F.lit(1)).alias("n2"))
    m = a.join(b, on="user_id").agg(F.count(F.lit(1)).alias("m"))
    n = ev.agg(F.countDistinct("user_id").alias("n_true"))
    return (
        na.crossJoin(nb).crossJoin(m).crossJoin(n)
        .select(
            F.col("n1").cast("bigint").alias("n_capture_1"),
            F.col("n2").cast("bigint").alias("n_capture_2"),
            F.col("m").cast("bigint").alias("n_recaptured"),
            F.col("n_true").cast("bigint").alias("n_true_population"),
            r4(
                F.when(
                    F.col("m") > 0, F.col("n1") * 1.0 * F.col("n2") / F.col("m")
                )
            ).alias("lincoln_petersen"),
            r4(
                (F.col("n1") + 1.0) * (F.col("n2") + 1.0) / (F.col("m") + 1.0)
                - 1.0
            ).alias("chapman"),
        )
    )


@register(
    "good_turing_unseen_mass",
    oracle="""
    WITH w AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents
    ),
    toks AS (
      SELECT w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS token
      FROM (SELECT w, generate_subscripts(w, 1) AS i FROM w)
      WHERE i + 2 <= len(w)
    ),
    c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
    ff AS (SELECT cnt, count(*) AS f FROM c GROUP BY 1),
    s AS (
      SELECT sum(cnt * f) AS n, sum(f) AS vocab,
             coalesce(sum(CASE WHEN cnt = 1 THEN f END), 0) AS f1,
             coalesce(sum(CASE WHEN cnt = 2 THEN f END), 0) AS f2
      FROM ff
    )
    SELECT CAST(n AS BIGINT) AS n_tokens, CAST(vocab AS BIGINT) AS vocab,
           CAST(f1 AS BIGINT) AS singletons, CAST(f2 AS BIGINT) AS doubletons,
           round(f1 * 1.0 / n, 4) + 0.0 AS unseen_mass,
           round(CASE WHEN f1 > 0 THEN 2.0 * f2 / f1 END, 4) + 0.0
             AS gt_adjusted_r1
    FROM s
    """,
)
def good_turing_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics — Good-Turing unseen-probability mass at
    TRIGRAM granularity: p₀ = f₁/N from the frequency-of-frequencies
    table (the share of the NEXT sample expected to be never-seen
    trigrams — how 'open' the phrase space still is, the number that
    decides whether more crawling buys new content), plus the
    GT-smoothed count for singletons r* = 2f₂/f₁. Trigrams, not
    unigrams: the fixture vocabulary is closed (~31 words, f₁ = 0),
    while its trigram space is genuinely sparse — mirroring real
    corpora where n-gram novelty is the live signal. Two nested count
    aggregates; everything integer until two final divisions."""
    w = load_table(spark, sf_dir, "documents").select(
        F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    )
    toks = w.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 2),"
                " i -> concat(w[i-1], ' ', w[i], ' ', w[i+1]))"
            )
        ).alias("token")
    )
    c = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    ff = c.groupBy("cnt").agg(F.count(F.lit(1)).alias("f"))
    s = ff.agg(
        F.sum(F.col("cnt") * F.col("f")).alias("n"),
        F.sum("f").alias("vocab"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") == 1, F.col("f"))), F.lit(0)
        ).alias("f1"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") == 2, F.col("f"))), F.lit(0)
        ).alias("f2"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_tokens"),
        F.col("vocab").cast("bigint").alias("vocab"),
        F.col("f1").cast("bigint").alias("singletons"),
        F.col("f2").cast("bigint").alias("doubletons"),
        r4(F.col("f1") * 1.0 / F.col("n")).alias("unseen_mass"),
        r4(
            F.when(F.col("f1") > 0, 2.0 * F.col("f2") / F.col("f1"))
        ).alias("gt_adjusted_r1"),
    )


@register(
    "heaps_law_fit",
    oracle="""
    WITH d AS (
      SELECT doc_id, dense_rank() OVER (ORDER BY doc_id) AS r,
             string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    toks AS (
      SELECT r, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS token
      FROM (SELECT r, w, generate_subscripts(w, 1) AS i FROM d)
      WHERE i + 2 <= len(w)
    ),
    firsts AS (SELECT token, min(r) AS fr FROM toks GROUP BY 1),
    newc AS (SELECT fr AS r, count(*) AS nv FROM firsts GROUP BY 1),
    perdoc AS (SELECT r, count(*) AS nt FROM toks GROUP BY 1),
    cum AS (
      SELECT p.r,
             sum(p.nt) OVER (ORDER BY p.r) AS cn,
             sum(coalesce(nc.nv, 0)) OVER (ORDER BY p.r) AS cv
      FROM perdoc p LEFT JOIN newc nc ON p.r = nc.r
    ),
    lg AS (SELECT ln(cn) AS x, ln(cv) AS y FROM cum),
    fit AS (
      SELECT count(*) AS d_docs,
             (sum(x * y) - sum(x) * sum(y) / count(*))
             / (sum(x * x) - sum(x) * sum(x) / count(*)) AS beta,
             sum(y) / count(*) AS my, sum(x) / count(*) AS mx,
             (sum(x * y) - sum(x) * sum(y) / count(*))
             / sqrt((sum(x * x) - sum(x) * sum(x) / count(*))
                    * (sum(y * y) - sum(y) * sum(y) / count(*))) AS rho
      FROM lg
    )
    SELECT CAST(d_docs AS BIGINT) AS n_docs,
           round(beta, 4) + 0.0 AS heaps_beta,
           round(exp(my - beta * mx), 4) + 0.0 AS heaps_k,
           round(rho * rho, 4) + 0.0 AS r2
    FROM fit
    """,
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics — Heaps' law V = k·N^β fit over the corpus's
    own growth curve at TRIGRAM granularity (the fixture's unigram
    vocabulary closes after a handful of documents; its trigram space
    grows like a real corpus): distinct-trigram count vs cumulative
    trigram count at every doc-rank prefix (first-occurrence flags give V(r) as a
    cumsum — no quadratic re-scan), then the log-log OLS slope. β and
    k predict vocabulary at 100 TB from a sample — tokenizer sizing
    and dedup-rate forecasting read straight off this fit. Companion
    to zipf_law_fit (the two laws are duals). Cumulatives are exact
    integers; the fit is one sufficient-statistics aggregate. NO global
    window (r7 verdict fix): doc_id is unique so the doc rank is the
    two-level prefix-sum global row_number (``with_global_rank``, ==
    dense_rank here), and both growth-curve cumulatives ride the same
    helper's ``cumsum_cols`` — a billion-doc corpus ranks and
    accumulates as #partitions parallel sorts, and integer cumsums stay
    exact under any partition split."""
    from graph_db_spark.operators.aggregates import with_global_rank

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    )
    d = with_global_rank(docs, [F.asc("doc_id")], rank_col="r")
    toks = d.select(
        "r",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 2),"
                " i -> concat(w[i-1], ' ', w[i], ' ', w[i+1]))"
            )
        ).alias("token"),
    )
    firsts = toks.groupBy("token").agg(F.min("r").alias("fr"))
    newc = firsts.groupBy(F.col("fr").alias("r")).agg(F.count(F.lit(1)).alias("nv"))
    perdoc = toks.groupBy("r").agg(F.count(F.lit(1)).alias("nt"))
    joined = perdoc.join(newc, on="r", how="left").withColumn(
        "nv0", F.coalesce("nv", F.lit(0))
    )
    cum = with_global_rank(
        joined, [F.asc("r")], rank_col="_rn", cumsum_cols={"cn": "nt", "cv": "nv0"}
    )
    lg = cum.select(F.log("cn").alias("x"), F.log("cv").alias("y"))
    n = F.count(F.lit(1))
    sxy = F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / n
    sxx = F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / n
    syy = F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y") / n
    fit = lg.agg(
        n.alias("d_docs"),
        (sxy / sxx).alias("beta"),
        (F.sum("y") / n).alias("my"),
        (F.sum("x") / n).alias("mx"),
        (sxy / F.sqrt(sxx * syy)).alias("rho"),
    )
    return fit.select(
        F.col("d_docs").cast("bigint").alias("n_docs"),
        r4(F.col("beta")).alias("heaps_beta"),
        r4(F.exp(F.col("my") - F.col("beta") * F.col("mx"))).alias("heaps_k"),
        r4(F.col("rho") * F.col("rho")).alias("r2"),
    )


@register(
    "poisson_rate_ratio",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 'weekend'
                  ELSE 'weekday' END AS kind
      FROM events
    ),
    g AS (
      SELECT kind, count(*) AS k, count(DISTINCT day) AS days
      FROM d GROUP BY 1
    ),
    w AS (
      SELECT a.k AS k1, a.days AS d1, b.k AS k2, b.days AS d2
      FROM g a JOIN g b ON a.kind = 'weekend' AND b.kind = 'weekday'
    )
    SELECT CAST(k1 AS BIGINT) AS n_weekend, CAST(d1 AS BIGINT) AS days_weekend,
           CAST(k2 AS BIGINT) AS n_weekday, CAST(d2 AS BIGINT) AS days_weekday,
           round(k1 * 1.0 / d1, 4) + 0.0 AS rate_weekend,
           round(k2 * 1.0 / d2, 4) + 0.0 AS rate_weekday,
           round((k1 * 1.0 / d1) / (k2 * 1.0 / d2), 4) + 0.0 AS rate_ratio,
           round(ln((k1 * 1.0 / d1) / (k2 * 1.0 / d2))
                 / sqrt(1.0 / k1 + 1.0 / k2), 4) + 0.0 AS wald_z
    FROM w
    """,
)
def poisson_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — Poisson rate-ratio test (weekend vs weekday event
    intensity): per-exposure-day rates, their ratio, and the Wald z on
    the log ratio (1/k₁ + 1/k₂ variance) — the count-data inference
    the proportion tests (ab_test_proportions) cannot express because
    exposure differs between arms. Integer counts + four scalar ops;
    DOW uses the DuckDB 0-6 Sunday-first convention."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        F.to_date("ts").alias("day"),
        F.when((F.dayofweek("ts") - 1).isin(0, 6), "weekend")
        .otherwise("weekday")
        .alias("kind"),
    )
    g = d.groupBy("kind").agg(
        F.count(F.lit(1)).alias("k"), F.countDistinct("day").alias("days")
    )
    b = g.select(
        F.col("kind").alias("kind2"), F.col("k").alias("k2"),
        F.col("days").alias("d2"),
    )
    w = g.join(b, (F.col("kind") == "weekend") & (F.col("kind2") == "weekday"))
    r1 = F.col("k") * 1.0 / F.col("days")
    r2c = F.col("k2") * 1.0 / F.col("d2")
    return w.select(
        F.col("k").cast("bigint").alias("n_weekend"),
        F.col("days").cast("bigint").alias("days_weekend"),
        F.col("k2").cast("bigint").alias("n_weekday"),
        F.col("d2").cast("bigint").alias("days_weekday"),
        r4(r1).alias("rate_weekend"),
        r4(r2c).alias("rate_weekday"),
        r4(r1 / r2c).alias("rate_ratio"),
        r4(
            F.log(r1 / r2c) / F.sqrt(1.0 / F.col("k") + 1.0 / F.col("k2"))
        ).alias("wald_z"),
    )


@register(
    "dispersion_index_check",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) * 1.0 AS c
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT event_type, count(*) AS n, sum(c) AS s, sum(c * c) AS ss
      FROM daily GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(s / n, 4) + 0.0 AS mean_daily,
           round((ss - s * s / n) / (n - 1), 4) + 0.0 AS var_daily,
           round(((ss - s * s / n) / (n - 1)) / (s / n), 4) + 0.0
             AS dispersion_index,
           CAST(CASE WHEN ((ss - s * s / n) / (n - 1)) / (s / n) > 1.0
                     THEN 1 ELSE 0 END AS BIGINT) AS overdispersed
    FROM g
    """,
)
def dispersion_index_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — dispersion index (variance-to-mean ratio of daily
    counts) per event type: the Poisson-adequacy screen that decides
    whether rate models (poisson_rate_ratio) are trustworthy or a
    negative-binomial/burst model is needed (D > 1 = overdispersed =
    bursty traffic). One daily rollup + one sufficient-statistics
    aggregate; the flag is an integer compare."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        (F.count(F.lit(1)) * 1.0).alias("c")
    )
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    return g.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        r4(mean).alias("mean_daily"),
        r4(var).alias("var_daily"),
        r4(var / mean).alias("dispersion_index"),
        F.when(var / mean > 1.0, 1).otherwise(0).cast("bigint").alias("overdispersed"),
    )


@register(
    "mcnemar_paired_test",
    oracle="""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click' AND value >= 90
                      THEN 1 ELSE 0 END) AS clicked,
             max(CASE WHEN event_type = 'purchase' AND value >= 90
                      THEN 1 ELSE 0 END) AS purchased
      FROM events GROUP BY 1
    ),
    ct AS (
      SELECT sum(CASE WHEN clicked = 1 AND purchased = 1 THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN clicked = 1 AND purchased = 0 THEN 1 ELSE 0 END) AS b,
             sum(CASE WHEN clicked = 0 AND purchased = 1 THEN 1 ELSE 0 END) AS c,
             sum(CASE WHEN clicked = 0 AND purchased = 0 THEN 1 ELSE 0 END) AS d
      FROM u
    )
    SELECT CAST(a AS BIGINT) AS both_actions, CAST(b AS BIGINT) AS click_only,
           CAST(c AS BIGINT) AS purchase_only, CAST(d AS BIGINT) AS neither,
           round(CASE WHEN b + c > 0
                      THEN (b - c) * (b - c) * 1.0 / (b + c) END, 4) + 0.0
             AS mcnemar_chi2,
           round(CASE WHEN b + c > 0
                      THEN (abs(b - c) - 1.0) * (abs(b - c) - 1.0) / (b + c)
                 END, 4) + 0.0 AS mcnemar_corrected
    FROM ct
    """,
)
def mcnemar_paired_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — McNemar's test on the paired design 'did the user
    ever emit a high-value (≥90) click' vs '…purchase': each user
    contributes BOTH binary outcomes, so the independent-
    samples proportion test (ab_test_proportions) is invalid — only the
    discordant cells b, c carry information: χ² = (b−c)²/(b+c), with
    the Edwards continuity correction beside it. One per-user pivot
    aggregate + one 2×2 fold; all integers until two divisions."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "click") & (F.col("value") >= 90), 1)
            .otherwise(0)
        ).alias("clicked"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 90), 1
            ).otherwise(0)
        ).alias("purchased"),
    )
    ct = u.agg(
        F.sum(
            F.when((F.col("clicked") == 1) & (F.col("purchased") == 1), 1).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when((F.col("clicked") == 1) & (F.col("purchased") == 0), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("clicked") == 0) & (F.col("purchased") == 1), 1).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("clicked") == 0) & (F.col("purchased") == 0), 1).otherwise(0)
        ).alias("d"),
    )
    bc = F.col("b") + F.col("c")
    return ct.select(
        F.col("a").cast("bigint").alias("both_actions"),
        F.col("b").cast("bigint").alias("click_only"),
        F.col("c").cast("bigint").alias("purchase_only"),
        F.col("d").cast("bigint").alias("neither"),
        r4(
            F.when(bc > 0, (F.col("b") - F.col("c")) * (F.col("b") - F.col("c")) * 1.0 / bc)
        ).alias("mcnemar_chi2"),
        r4(
            F.when(
                bc > 0,
                (F.abs(F.col("b") - F.col("c")) - 1.0)
                * (F.abs(F.col("b") - F.col("c")) - 1.0)
                / bc,
            )
        ).alias("mcnemar_corrected"),
    )


@register(
    "markov_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events
    ),
    pairs AS (
      SELECT prev, event_type AS next, count(*) * 1.0 AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT sum(n) AS nn FROM pairs),
    cond AS (
      SELECT prev, next, n,
             n / sum(n) OVER (PARTITION BY prev) AS p_cond,
             sum(n) OVER (PARTITION BY prev) / tot.nn AS p_state
      FROM pairs, tot
    ),
    h AS (
      SELECT sum(p_state * p_cond * -ln(p_cond)) AS h_rate,
             count(DISTINCT prev) AS k
      FROM cond
    ),
    marg AS (
      SELECT sum(p * -ln(p)) AS h0 FROM (
        SELECT sum(n) / (SELECT nn FROM tot) AS p
        FROM pairs GROUP BY next
      )
    )
    SELECT CAST(h.k AS BIGINT) AS n_states,
           round(marg.h0, 4) + 0.0 AS marginal_entropy,
           round(h.h_rate, 4) + 0.0 AS entropy_rate,
           round(marg.h0 - h.h_rate, 4) + 0.0 AS information_gain
    FROM h, marg
    """,
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information theory — entropy rate of the event-type sequence
    under the empirical first-order Markov model: H = −Σₛ p(s) Σₜ
    p(t|s) ln p(t|s), against the marginal (order-0) entropy; the gap
    is the information one step of history buys — the model-order
    signal sequence models (trigram_lm_topk, session_path_topk) build
    on. One lag window + constant-size probability algebra; p(s) is the
    plug-in visit frequency."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    pairs = seq.groupBy("prev", F.col("event_type").alias("next")).agg(
        (F.count(F.lit(1)) * 1.0).alias("n")
    )
    tot = pairs.agg(F.sum("n").alias("nn"))
    wp = Window.partitionBy("prev")
    cond = pairs.crossJoin(F.broadcast(tot)).select(
        "prev",
        "next",
        "n",
        (F.col("n") / F.sum("n").over(wp)).alias("p_cond"),
        (F.sum("n").over(wp) / F.col("nn")).alias("p_state"),
    )
    h = cond.agg(
        F.sum(F.col("p_state") * F.col("p_cond") * -F.log("p_cond")).alias("h_rate"),
        F.countDistinct("prev").alias("k"),
    )
    marg = (
        pairs.crossJoin(F.broadcast(tot))
        .groupBy("next")
        .agg((F.sum("n") / F.first("nn")).alias("p"))
        .agg(F.sum(F.col("p") * -F.log("p")).alias("h0"))
    )
    return h.crossJoin(marg).select(
        F.col("k").cast("bigint").alias("n_states"),
        r4(F.col("h0")).alias("marginal_entropy"),
        r4(F.col("h_rate")).alias("entropy_rate"),
        r4(F.col("h0") - F.col("h_rate")).alias("information_gain"),
    )


# ---------------------------------------------------------------------------
# r7 batch 8 — changepoint / weighted median / positional phrase search /
# energy distance
# ---------------------------------------------------------------------------


@register(
    "binary_segmentation_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS y
      FROM orders GROUP BY 1
    ),
    pre AS (
      SELECT day, y,
             row_number() OVER (ORDER BY day) AS i,
             sum(y) OVER (ORDER BY day) AS cs,
             sum(y * y) OVER (ORDER BY day) AS css,
             count(*) OVER () AS n,
             sum(y) OVER () AS st,
             sum(y * y) OVER () AS sst
      FROM daily
    ),
    gains AS (
      SELECT day, i, n,
             (sst - st * st / n)
             - ((css - cs * cs / i)
                + ((sst - css) - (st - cs) * (st - cs) / (n - i))) AS gain,
             cs / i AS mean_left, (st - cs) / (n - i) AS mean_right
      FROM pre WHERE i >= 7 AND i <= n - 7
    ),
    best AS (
      SELECT * FROM gains
      ORDER BY gain DESC, day LIMIT 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS split_day,
           CAST(i AS BIGINT) AS split_index, CAST(n AS BIGINT) AS n_days,
           round(mean_left, 4) + 0.0 AS mean_before,
           round(mean_right, 4) + 0.0 AS mean_after,
           round(gain / (SELECT sst - st * st / n FROM pre LIMIT 1), 4) + 0.0
             AS variance_explained
    FROM best
    """,
)
def binary_segmentation_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time series — single-split binary segmentation changepoint on
    daily revenue: the split day maximizing the SSE reduction
    SSE_total − (SSE_left + SSE_right), every candidate scored from
    PREFIX sums in one window pass (O(n), not the textbook O(n²)
    re-scan), with a 7-day margin at each edge. The structural-break
    complement of cusum_drift (which detects drift online; this
    localizes the break offline). Emits the explained-variance ratio —
    a ratio, so float drift stays relative."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("y")
    )
    wo = Window.orderBy("day")
    wall = Window.partitionBy()
    pre = daily.select(
        "day",
        "y",
        F.row_number().over(wo).alias("i"),
        F.sum("y").over(wo).alias("cs"),
        F.sum(F.col("y") * F.col("y")).over(wo).alias("css"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("y").over(wall).alias("st"),
        F.sum(F.col("y") * F.col("y")).over(wall).alias("sst"),
    )
    sse_tot = F.col("sst") - F.col("st") * F.col("st") / F.col("n")
    sse_l = F.col("css") - F.col("cs") * F.col("cs") / F.col("i")
    sse_r = (F.col("sst") - F.col("css")) - (F.col("st") - F.col("cs")) * (
        F.col("st") - F.col("cs")
    ) / (F.col("n") - F.col("i"))
    gains = pre.filter(
        (F.col("i") >= 7) & (F.col("i") <= F.col("n") - 7)
    ).select(
        "day",
        "i",
        "n",
        (sse_tot - (sse_l + sse_r)).alias("gain"),
        (F.col("cs") / F.col("i")).alias("mean_left"),
        ((F.col("st") - F.col("cs")) / (F.col("n") - F.col("i"))).alias(
            "mean_right"
        ),
        sse_tot.alias("sse_tot"),
    )
    best = gains.orderBy(F.desc("gain"), "day").limit(1)
    return best.select(
        F.date_format("day", "yyyy-MM-dd").alias("split_day"),
        F.col("i").cast("bigint").alias("split_index"),
        F.col("n").cast("bigint").alias("n_days"),
        r4(F.col("mean_left")).alias("mean_before"),
        r4(F.col("mean_right")).alias("mean_after"),
        r4(F.col("gain") / F.col("sse_tot")).alias("variance_explained"),
    )


@register(
    "weighted_median_price",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag, l_extendedprice AS p, l_quantity AS wt
      FROM lineitem
    ),
    cum AS (
      SELECT flag, p, wt,
             sum(wt) OVER (PARTITION BY flag ORDER BY p, wt
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             sum(wt) OVER (PARTITION BY flag) AS tw
      FROM w
    ),
    med AS (
      SELECT flag, min(p) AS wmedian FROM cum
      WHERE cw >= tw / 2.0 GROUP BY 1
    ),
    plain AS (
      SELECT flag, quantile_cont(p, 0.5) AS median_unweighted,
             CAST(count(*) AS BIGINT) AS n
      FROM w GROUP BY 1
    )
    SELECT m.flag, plain.n,
           round(m.wmedian, 4) + 0.0 AS weighted_median,
           round(plain.median_unweighted, 4) + 0.0 AS unweighted_median
    FROM med m JOIN plain ON m.flag = plain.flag
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — quantity-weighted median price per return flag: the
    smallest price whose cumulative weight reaches half the total (the
    lower weighted median — deterministic, no interpolation dialect to
    disagree on), beside the plain median for the gap reading. One
    ordered cumsum window per group; weights are integral quantities so
    the cumulative is exact and the threshold compare is
    drift-free."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("p"),
        F.col("l_quantity").alias("wt"),
    )
    wc = (
        Window.partitionBy("flag")
        .orderBy("p", "wt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = li.select(
        "flag",
        "p",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(Window.partitionBy("flag")).alias("tw"),
    )
    med = (
        cum.filter(F.col("cw") >= F.col("tw") / 2.0)
        .groupBy("flag")
        .agg(F.min("p").alias("wmedian"))
    )
    plain = li.groupBy("flag").agg(
        F.expr("percentile(p, 0.5)").alias("median_unweighted"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return med.join(plain, on="flag").select(
        "flag",
        "n",
        r4(F.col("wmedian")).alias("weighted_median"),
        r4(F.col("median_unweighted")).alias("unweighted_median"),
    )


@register(
    "positional_phrase_search",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    idx AS (
      SELECT doc_id, i AS pos, w[i] AS token
      FROM (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM w)
    ),
    tri AS (
      SELECT a.token AS t1, b.token AS t2, c.token AS t3, count(*) AS n
      FROM idx a
      JOIN idx b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN idx c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      GROUP BY 1, 2, 3
    ),
    phrase AS (
      SELECT t1, t2, t3 FROM tri ORDER BY n DESC, t1, t2, t3 LIMIT 1
    ),
    hits AS (
      SELECT a.doc_id, min(a.pos) AS first_pos, count(*) AS n_occurrences
      FROM idx a
      JOIN idx b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN idx c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      JOIN phrase p ON a.token = p.t1 AND b.token = p.t2 AND c.token = p.t3
      GROUP BY 1
    )
    SELECT h.doc_id, p.t1 || ' ' || p.t2 || ' ' || p.t3 AS phrase,
           CAST(h.first_pos AS BIGINT) AS first_pos,
           CAST(h.n_occurrences AS BIGINT) AS n_occurrences
    FROM hits h, phrase p
    """,
)
def positional_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search — positional-index phrase query: build the (doc, pos,
    token) inverted index, pick the corpus's most frequent trigram as
    the probe phrase (deterministic tie-break), and find every document
    containing it with first position and occurrence count — the
    search-engine primitive (adjacency via pos+1 joins on the index,
    exactly how Lucene phrase queries execute) that substring LIKE
    scans cannot do at scale. The index is posexplode once; the phrase
    probe is a broadcast of one row."""
    w = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    )
    idx = w.select(
        "doc_id", F.posexplode("w").alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    b = idx.select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("p2"),
        F.col("token").alias("t2c"),
    )
    c = idx.select(
        F.col("doc_id").alias("d3"), F.col("pos").alias("p3"),
        F.col("token").alias("t3c"),
    )
    tri_rows = (
        idx.join(b, (F.col("doc_id") == F.col("d2")) & (F.col("p2") == F.col("pos") + 1))
        .join(c, (F.col("doc_id") == F.col("d3")) & (F.col("p3") == F.col("pos") + 2))
    )
    tri = tri_rows.groupBy(
        F.col("token").alias("t1"), F.col("t2c").alias("t2"),
        F.col("t3c").alias("t3"),
    ).agg(F.count(F.lit(1)).alias("n"))
    phrase = tri.orderBy(F.desc("n"), "t1", "t2", "t3").limit(1).drop("n")
    hits = (
        tri_rows.join(
            F.broadcast(phrase),
            (F.col("token") == F.col("t1"))
            & (F.col("t2c") == F.col("t2"))
            & (F.col("t3c") == F.col("t3")),
        )
        .groupBy("doc_id")
        .agg(
            F.min("pos").alias("first_pos"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
    )
    return hits.crossJoin(F.broadcast(phrase)).select(
        "doc_id",
        F.concat_ws(" ", "t1", "t2", "t3").alias("phrase"),
        F.col("first_pos").cast("bigint").alias("first_pos"),
        F.col("n_occurrences").cast("bigint").alias("n_occurrences"),
    )


@register(
    "energy_distance_groups",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE label IN (0, 1) AND vec_id % 3 = 0
    ),
    x AS (SELECT vec_id, v FROM e WHERE label = 0),
    y AS (SELECT vec_id, v FROM e WHERE label = 1),
    exy AS (
      SELECT avg(sqrt(list_dot_product(x.v, x.v)
                      - 2 * list_dot_product(x.v, y.v)
                      + list_dot_product(y.v, y.v))) AS d
      FROM x CROSS JOIN y
    ),
    exx AS (
      SELECT avg(sqrt(list_dot_product(a.v, a.v)
                      - 2 * list_dot_product(a.v, b.v)
                      + list_dot_product(b.v, b.v))) AS d
      FROM x a JOIN x b ON a.vec_id < b.vec_id
    ),
    eyy AS (
      SELECT avg(sqrt(list_dot_product(a.v, a.v)
                      - 2 * list_dot_product(a.v, b.v)
                      + list_dot_product(b.v, b.v))) AS d
      FROM y a JOIN y b ON a.vec_id < b.vec_id
    )
    SELECT CAST((SELECT count(*) FROM x) AS BIGINT) AS n_x,
           CAST((SELECT count(*) FROM y) AS BIGINT) AS n_y,
           round(exy.d, 4) + 0.0 AS mean_cross_dist,
           round(exx.d, 4) + 0.0 AS mean_within_x,
           round(eyy.d, 4) + 0.0 AS mean_within_y,
           round(2 * exy.d - exx.d - eyy.d, 4) + 0.0 AS energy_distance
    FROM exy, exx, eyy
    """,
)
def energy_distance_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — energy distance 2E|X−Y| − E|X−X'| − E|Y−Y'| between
    two label classes in embedding space (Székely-Rizzo): the
    multivariate two-sample test ks_two_sample cannot express (KS is
    univariate). ≥ 0 always, 0 iff the distributions coincide — the
    honest answer to 'did the embedding distribution shift between
    slices'. A deterministic 1-in-3 subsample bounds the pair space;
    distances use the expanded-form L2 (left-fold dots — bit-identical
    engines) so the means differ only by summation order, which r4
    absorbs.

    Scale envelope (r13 audit note): the statistic is inherently
    all-pairs — the 1-in-3 modulus bounds the pair space at FIXTURE
    scale, but (n/3)² still grows quadratically with the corpus. The
    100 TB recipe is the same query with the modulus raised so each
    group's sample is a fixed budget (~10⁴ vectors gives a sub-percent
    standard error on each pairwise-mean; the estimator is unbiased
    for the subsampled population), which also keeps the broadcast
    pairwise legs k-sized. Deliberately exempt from the dim_hint
    migration: the broadcast IS the documented brute-force contract
    on the bounded sample."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isin(0, 1) & (F.col("vec_id") % 3 == 0)
    ).select("vec_id", "label", SIM._as_double(F.col("embedding")).alias("v"))
    x = e.filter(F.col("label") == 0).select("vec_id", "v")
    y = e.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("yid"), F.col("v").alias("yv")
    )

    def dot(a, bcol):
        return F.aggregate(
            F.zip_with(F.col(a), F.col(bcol), lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    dist_xy = F.sqrt(dot("v", "v") - 2 * dot("v", "yv") + dot("yv", "yv"))
    exy = x.crossJoin(F.broadcast(y)).agg(F.avg(dist_xy).alias("d"))
    x2 = x.select(F.col("vec_id").alias("bid"), F.col("v").alias("bv"))
    dist_xx = F.sqrt(dot("v", "v") - 2 * dot("v", "bv") + dot("bv", "bv"))
    exx = (
        x.join(F.broadcast(x2), F.col("vec_id") < F.col("bid"))
        .agg(F.avg(dist_xx).alias("d"))
    )
    y1 = y.select(F.col("yid").alias("vec_id"), F.col("yv").alias("v"))
    y2 = y1.select(F.col("vec_id").alias("bid"), F.col("v").alias("bv"))
    eyy = (
        y1.join(F.broadcast(y2), F.col("vec_id") < F.col("bid"))
        .agg(F.avg(dist_xx).alias("d"))
    )
    nx = x.agg(F.count(F.lit(1)).alias("n_x"))
    ny = y.agg(F.count(F.lit(1)).alias("n_y"))
    return (
        nx.crossJoin(ny)
        .crossJoin(exy.select(F.col("d").alias("dxy")))
        .crossJoin(exx.select(F.col("d").alias("dxx")))
        .crossJoin(eyy.select(F.col("d").alias("dyy")))
        .select(
            F.col("n_x").cast("bigint").alias("n_x"),
            F.col("n_y").cast("bigint").alias("n_y"),
            r4(F.col("dxy")).alias("mean_cross_dist"),
            r4(F.col("dxx")).alias("mean_within_x"),
            r4(F.col("dyy")).alias("mean_within_y"),
            r4(2 * F.col("dxy") - F.col("dxx") - F.col("dyy")).alias(
                "energy_distance"
            ),
        )
    )


# ---------------------------------------------------------------------------
# r7 batch 9 — reciprocity / rich club / PMI collocations /
# diversity indices / interval-stabbing backlog
# ---------------------------------------------------------------------------


@register(
    "trade_reciprocity",
    oracle="""
    WITH e AS (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v, count(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT e.u, e.v, e.w, coalesce(b.w, 0) AS wrev
      FROM e LEFT JOIN e b ON e.u = b.v AND e.v = b.u
    )
    SELECT CAST(count(*) AS BIGINT) AS n_directed_edges,
           CAST(sum(CASE WHEN wrev > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_reciprocated,
           round(sum(CASE WHEN wrev > 0 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             + 0.0 AS edge_reciprocity,
           round(sum(least(w, wrev)) * 1.0 / sum(w), 4) + 0.0
             AS weighted_reciprocity
    FROM r
    """,
)
def trade_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph — reciprocity of the directed nation→nation trade graph:
    the share of supplier→customer flows with a reverse flow (edge
    reciprocity) and the Garlaschelli-Loffredo weighted form
    Σ min(w_uv, w_vu)/Σ w_uv — trade-balance symmetry in one number.
    The fact join collapses to the |nations|² flow matrix first; the
    reciprocity join is a self-join on that constant-size table."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dim_hint(c, bounded=False), o.o_custkey == c.c_custkey)
        .join(dim_hint(s, bounded=False), li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    b = e.select(
        F.col("u").alias("bu"), F.col("v").alias("bv"), F.col("w").alias("wrev")
    )
    r = e.join(
        F.broadcast(b), (F.col("u") == F.col("bv")) & (F.col("v") == F.col("bu")), "left"
    ).select("u", "v", "w", F.coalesce("wrev", F.lit(0)).alias("wrev"))
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_directed_edges"),
        F.sum(F.when(F.col("wrev") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_reciprocated"),
        r4(
            F.sum(F.when(F.col("wrev") > 0, 1).otherwise(0)) * 1.0
            / F.count(F.lit(1))
        ).alias("edge_reciprocity"),
        r4(F.sum(F.least("w", "wrev")) * 1.0 / F.sum("w")).alias(
            "weighted_reciprocity"
        ),
    )


@register(
    "rich_club_coefficient",
    oracle=f"""
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM ({{edges}}) WHERE src <> dst
    ),
    deg AS MATERIALIZED (
      SELECT id, count(*) AS d FROM (
        SELECT a AS id FROM edges UNION ALL SELECT b FROM edges
      ) GROUP BY 1
    ),
    ks AS (SELECT k FROM (VALUES (2), (4), (8), (16)) t(k)),
    club AS (
      SELECT ks.k, deg.id FROM ks JOIN deg ON deg.d > ks.k
    ),
    nk AS (SELECT k, count(*) AS n FROM club GROUP BY 1),
    ek AS (
      SELECT c1.k, count(*) AS e
      FROM edges
      JOIN club c1 ON edges.a = c1.id
      JOIN club c2 ON edges.b = c2.id AND c2.k = c1.k
      GROUP BY 1
    )
    SELECT nk.k AS degree_threshold, CAST(nk.n AS BIGINT) AS n_club_nodes,
           CAST(coalesce(ek.e, 0) AS BIGINT) AS n_club_edges,
           round(CASE WHEN nk.n >= 2
                      THEN coalesce(ek.e, 0) * 2.0 / (nk.n * (nk.n - 1.0))
                 END, 4) + 0.0 AS rich_club_phi
    FROM nk LEFT JOIN ek ON nk.k = ek.k
    """.format(edges=edges_sql()),
)
def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph — rich-club coefficient φ(k) = 2E_k/(N_k(N_k−1)) of the
    undirected property graph at degree thresholds 2/4/8/16: do the
    hubs preferentially wire to each other? (The hub-interconnection
    reading degree_histogram and assortativity only hint at.) Club
    membership is a degree-table filter; induced-subgraph edges come
    from two semi-join-shaped hash joins of the edge list against the
    (small) club tables — never an N² scan."""
    from graph_db_spark.graph.build import build_graph

    g = build_graph(spark, sf_dir)
    edges = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        edges.select(F.col("a").alias("id"))
        .union(edges.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ks = spark.createDataFrame([(2,), (4,), (8,), (16,)], "k int")
    club = F.broadcast(ks).join(deg, deg.d > F.col("k")).select("k", "id")
    nk = club.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    c1 = club.select(F.col("k"), F.col("id").alias("ida"))
    c2 = club.select(F.col("k").alias("k2"), F.col("id").alias("idb"))
    ek = (
        edges.join(c1, F.col("a") == F.col("ida"))
        .join(c2, (F.col("b") == F.col("idb")) & (F.col("k2") == F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("e"))
    )
    out = nk.join(ek, on="k", how="left").select(
        F.col("k").cast("bigint").alias("degree_threshold"),
        F.col("n").cast("bigint").alias("n_club_nodes"),
        F.coalesce("e", F.lit(0)).cast("bigint").alias("n_club_edges"),
        r4(
            F.when(
                F.col("n") >= 2,
                F.coalesce("e", F.lit(0)) * 2.0 / (F.col("n") * (F.col("n") - 1.0)),
            )
        ).alias("rich_club_phi"),
    )
    return out


@register(
    "token_pmi_collocations",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents
    ),
    nd AS (SELECT count(*) * 1.0 AS n FROM d),
    occ AS (SELECT doc_id, unnest(t) AS token FROM d),
    uni AS (SELECT token, count(*) AS c FROM occ GROUP BY 1),
    pair AS (
      SELECT a.token AS ta, b.token AS tb, count(*) AS cab
      FROM occ a JOIN occ b ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2
    ),
    pmi AS (
      SELECT ta, tb, cab,
             ln((pair.cab / nd.n)
                / ((ua.c / nd.n) * (ub.c / nd.n))) AS pmi
      FROM pair JOIN uni ua ON pair.ta = ua.token
                JOIN uni ub ON pair.tb = ub.token
                CROSS JOIN nd
      WHERE pair.cab >= 10
    )
    SELECT ta AS token_a, tb AS token_b, CAST(cab AS BIGINT) AS n_docs_both,
           round(pmi, 4) + 0.0 AS pmi
    FROM pmi
    ORDER BY pmi DESC, ta, tb LIMIT 15
    """,
)
def token_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text mining — document-level pointwise mutual information
    collocations: PMI = ln(p(a,b)/(p(a)p(b))) over distinct-token
    co-occurrence, top-15 with a ≥10-doc support floor (PMI without a
    floor surfaces hapax noise — the standard failure). The co-occur
    join is per-document over DISTINCT tokens, so cost is Σ per-doc
    vocab², not corpus²; the unigram tables broadcast. Integer counts;
    one ln per surviving pair."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"),
    )
    nd = d.agg((F.count(F.lit(1)) * 1.0).alias("n"))
    occ = d.select("doc_id", F.explode("t").alias("token"))
    uni = occ.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    b = occ.select(F.col("doc_id"), F.col("token").alias("tb"))
    pair = (
        occ.join(b, on="doc_id")
        .filter(F.col("token") < F.col("tb"))
        .groupBy(F.col("token").alias("ta"), "tb")
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= 10)
    )
    ua = uni.select(F.col("token").alias("ta"), F.col("c").alias("ca"))
    ub = uni.select(F.col("token").alias("tb"), F.col("c").alias("cb"))
    pmi = (
        pair.join(dim_hint(ua, bounded=False), on="ta")
        .join(dim_hint(ub, bounded=False), on="tb")
        .crossJoin(F.broadcast(nd))
        .select(
            "ta", "tb", "cab",
            F.log(
                (F.col("cab") / F.col("n"))
                / ((F.col("ca") / F.col("n")) * (F.col("cb") / F.col("n")))
            ).alias("pmi"),
        )
    )
    return (
        pmi.orderBy(F.desc("pmi"), "ta", "tb")
        .limit(15)
        .select(
            F.col("ta").alias("token_a"),
            F.col("tb").alias("token_b"),
            F.col("cab").cast("bigint").alias("n_docs_both"),
            r4(F.col("pmi")).alias("pmi"),
        )
    )


