"""Driver-contract query registry.

One named entry per implemented SURVEY.md §2 operator:
``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLE_SQL[name]`` —
equivalent ANSI SQL for the DuckDB oracle (views: region nation customer
supplier part orders lineitem events documents embeddings).

Conventions that keep the value-hash comparison deterministic:

- every computed column is aliased identically in Spark and SQL;
- float aggregates are ``round(x, 4)`` on both sides (eliminates
  summation-order last-bit drift);
- dates/timestamps are emitted as formatted strings on both sides;
- integer aggregates are cast to BIGINT on both sides (DuckDB sums of
  integers are HUGEINT otherwise).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_db_spark.functions import scalars as S
from graph_db_spark.operators import aggregates as A
from graph_db_spark.operators import joins as J
from graph_db_spark.operators.sessionize import session_intervals
from graph_db_spark.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _sf_tag(sf_dir: str) -> str:
    """Stable per-SF tag for scratch dirs / stream names. A digest, not
    ``hash()``: Python str hash is salted per process (PYTHONHASHSEED is
    not pinned), so hash-derived tags were random per run — stale
    /tmp/graft_* trees never matched the cleanup path and paths were not
    reproducible across processes (r5 ADVICE #1)."""
    return hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _poly_sql(expr: str, mult: int = 31) -> str:
    """DuckDB replica of operators/dedup.py:portable_hash over ``expr``:
    parse the same 8-hex-digit md5 window (mult 31 → chars 1-8, 131 →
    chars 9-16) as an integer mod 2^31-1. md5 hex output is identical in
    both engines (UTF-8 bytes, lowercase hex — verified incl. multibyte);
    the 8-step digit fold is the engine-neutral hex→int parse."""
    from graph_db_spark.operators.dedup import _MD5_WINDOW
    from graph_db_spark.operators.dedup import _MINHASH_P as P

    off = _MD5_WINDOW[mult]
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split_regex(substr(md5({expr}), {off}, 8), ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        f"(acc, x) -> acc * 16 + x) % {P}"
    )


def r4(c: Column) -> Column:
    # + 0.0 normalizes IEEE negative zero (-0.0 + 0.0 = +0.0): the
    # driver's serialized value-hash distinguishes -0.0 from 0.0, so any
    # rounded emission that can be a tiny negative must pin the sign.
    # Oracle SQL must apply the same `+ 0.0` after round() (r5 verdict:
    # weighted_sample_docs hash-FAIL — DuckDB round keeps -0.0).
    return F.round(c, 4) + F.lit(0.0)


def _fmt_ts(c: Column) -> Column:
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")


# ---------------------------------------------------------------------------
# A1 — daily grouped stats (flagship; weather-day semantics on `events`)
# ---------------------------------------------------------------------------


@register(
    "event_day_stats",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(ts, '%Y-%m-%d') AS day,
           event_type,
           round(avg(value), 4) AS data,
           round(min(value), 4) AS min,
           round(max(value), 4) AS max,
           round(sum(value), 4) AS sum,
           count(value) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def event_day_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — hourly→daily grouped aggregation, weather flavor (parity:
    _aggregate_hourly_to_daily /root/reference/app/graph_weather_day.py:69-117;
    avg-of-avgs semantics §2.10.2). One shuffle on the group key; map-side
    partial aggregation makes it scale linearly."""
    ev = load_table(spark, sf_dir, "events")
    out = A.daily_stats(ev, "ts", ["user_id", "event_type"], "value")
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        r4(F.col("data")).alias("data"),
        r4(F.col("min")).alias("min"),
        r4(F.col("max")).alias("max"),
        r4(F.col("sum")).alias("sum"),
        F.col("n").cast("bigint").alias("n"),
    )


@register(
    "event_day_stats_zero_null",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(ts, '%Y-%m-%d') AS day,
           round(CASE WHEN sum(CASE WHEN event_type = 'error' THEN value END) = 0.0
                      THEN NULL
                      ELSE sum(CASE WHEN event_type = 'error' THEN value END) END, 4) AS sum,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def event_day_stats_zero_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — flow-flavor daily agg with the zero-sum→NULL quirk replicated
    (parity: /root/reference/app/graph_irrigation_day.py:116; SURVEY §2.10.1
    decision: quirk kept behind a flag, exercised here)."""
    ev = load_table(spark, sf_dir, "events")
    masked = F.when(F.col("event_type") == "error", F.col("value"))
    sm = F.sum(masked)
    sm = F.when(sm == 0.0, F.lit(None).cast("double")).otherwise(sm)
    return (
        ev.groupBy(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(r4(sm).alias("sum"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# P1/P2/P4 — projections & filters
# ---------------------------------------------------------------------------


@register(
    "proj_rename",
    oracle="""
    SELECT c_custkey AS field_id, c_name AS name,
           c_mktsegment AS crop_name, CAST(c_nationkey AS BIGINT) AS region_ref
    FROM customer
    """,
)
def proj_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — projection + rename (parity: city→province/county→district
    aliasing, /root/reference/app/graph_fields.py:13-30). Column pruning
    reaches the parquet scan (ReadSchema shows 4 columns)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("field_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("crop_name"),
        F.col("c_nationkey").cast("bigint").alias("region_ref"),
    )


@register(
    "null_guard_filter",
    oracle="""
    SELECT event_id, CAST(user_id AS BIGINT) AS user_id, event_type
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
      AND trim(event_type) <> ''
    """,
)
def null_guard_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P7 — null-guard + empty-string normalize filter (parity: serial /
    device-id guards, /root/reference/app/graph_weather_day.py:165-174;
    _norm_str graph_application_event.py:23-28). Pushed to the scan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & S.norm_str("event_type").isNotNull()
    ).select("event_id", F.col("user_id").cast("bigint").alias("user_id"), "event_type")


@register(
    "set_membership",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
    FROM events WHERE event_type IN ('error', 'purchase')
    GROUP BY 1
    """,
)
def set_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/U2 — set-membership predicate (parity: fw_key ∈ wanted set,
    /root/reference/app/graph_weather_day.py:178-186)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("error", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), r4(F.sum("value")).alias("total"))
    )


# ---------------------------------------------------------------------------
# J1/J2 — edge creation & broadcast dimension joins
# ---------------------------------------------------------------------------


@register(
    "edge_customer_order",
    oracle="""
    SELECT CAST(c.c_custkey AS BIGINT) AS src, CAST(o.o_orderkey AS BIGINT) AS dst,
           'HAS_ORDER' AS rel_type
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def edge_customer_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — typed edge table from two node tables (parity: the
    MATCH/MATCH/MERGE relationship writers, e.g.
    /root/reference/app/graph_stations.py:33-39 and SURVEY §1.3's 27 types).
    customer is the dimension side → broadcast, no fact shuffle."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return J.edge_join(
        c, o, on=c["c_custkey"] == o["o_custkey"], rel_type="HAS_ORDER",
        src_key="c_custkey", dst_key="o_orderkey", broadcast_src=True,
    ).select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
        "rel_type",
    )


@register(
    "broadcast_dim_join",
    oracle="""
    SELECT p.p_brand AS brand,
           count(*) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — broadcast dimension lookup (parity: stations_by_field dict probe,
    /root/reference/main_graph_topraq.py:108-111). `part` broadcast: the
    lineitem side never shuffles for the join; only the groupBy shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = J.broadcast_lookup(li, p, on=[li["l_partkey"] == p["p_partkey"]])
    return (
        joined.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J3 — as-of join
# ---------------------------------------------------------------------------


@register(
    "asof_nearest_line",
    oracle="""
    SELECT o_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_day
    FROM (
      SELECT o.o_orderkey, l.l_linenumber, l.l_shipdate,
             row_number() OVER (
               PARTITION BY o.o_orderkey
               ORDER BY abs(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)),
                      l.l_linenumber, l.l_shipdate
             ) AS rn
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ) WHERE rn = 1
    """,
)
def asof_nearest_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — as-of / nearest-timestamp join: for each order pick the line
    whose shipdate is closest to the order date, ties by (linenumber,
    shipdate) — the synthetic fixture REUSES linenumbers within an order,
    so (diff, linenumber) alone is not a total order and sf0.1 exposed
    equidistant pairs both engines broke arbitrarily (parity:
    best_idx argmin over |AE.start_at − activity.start_at| with
    ORDER BY start_at, idx tiebreak,
    /root/reference/app/graph_product_application.py:156-214)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_shipdate"
    )
    out = J.asof_join(
        o, li, on=["o_orderkey"], left_ts="o_orderdate", right_ts="l_shipdate",
        tiebreak_cols=["l_linenumber", "l_shipdate"],
    )
    return out.filter(F.col("l_linenumber").isNotNull()).select(
        "o_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
    )


# ---------------------------------------------------------------------------
# J4 — enrichment join
# ---------------------------------------------------------------------------


@register(
    "enrich_missing_brand",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           coalesce(CASE WHEN l.l_linenumber % 2 = 0 THEN NULL ELSE 'inline' END,
                    p.p_brand) AS brand
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def enrich_missing_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — enrichment left-join: rows lacking an inline value pull it from
    the catalog (parity: nutrients looked up from FertilizerProduct by
    (name,brand), /root/reference/app/graph_app_nutrient_content.py:306-354).
    part is broadcast — no shuffle on the fact side."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "brand", F.when(F.col("l_linenumber") % 2 == 0, F.lit(None)).otherwise(F.lit("inline"))
    )
    p = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    out = J.enrich_join(li, p, on=["l_partkey"], fill={"brand": "p_brand"})
    return out.select("l_orderkey", "l_linenumber", "brand")


# ---------------------------------------------------------------------------
# J5 — interval-scoped aggregation join
# ---------------------------------------------------------------------------


@register(
    "interval_scoped_avg",
    oracle="""
    WITH intervals AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
             min(ts) AS start_at, max(ts) AS end_at
      FROM events WHERE event_type = 'error'
      GROUP BY 1, 2
    )
    SELECT CAST(i.user_id AS BIGINT) AS user_id, i.day,
           round(avg(e.value), 4) AS avg_value,
           count(*) AS n_points
    FROM events e
    JOIN intervals i
      ON e.user_id = i.user_id AND e.ts >= i.start_at AND e.ts <= i.end_at
    GROUP BY 1, 2
    """,
)
def interval_scoped_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — interval-scoped aggregation join (parity: per-irrigation-event
    flow averaging in [start,end],
    /root/reference/app/graph_irrigation_event.py:119-152). The equi-key
    keeps it a partitioned join; the range predicate filters post-match."""
    ev = load_table(spark, sf_dir, "events")
    intervals = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(
            F.col("user_id").alias("i_user_id"),
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.min("ts").alias("start_at"), F.max("ts").alias("end_at"))
    )
    out = J.interval_agg_join(
        ev.select("user_id", "ts", "value"), intervals,
        point_keys=["user_id"], interval_keys=["i_user_id"],
        ts_col="ts", start_col="start_at", end_col="end_at",
        aggs=[r4(F.avg("value")).alias("avg_value"), F.count(F.lit(1)).alias("n_points")],
        interval_id_cols=["i_user_id", "day"],
    )
    return out.select(F.col("i_user_id").cast("bigint").alias("user_id"), "day", "avg_value", "n_points")


# ---------------------------------------------------------------------------
# J6 — semi / anti joins
# ---------------------------------------------------------------------------


@register(
    "anti_parts_never_ordered",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
)
def anti_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — anti-join: rows with no parent/reference (parity: the
    skip-if-no-ApplicationEvent semantics,
    /root/reference/app/graph_product_application.py:173-176, inverted to
    report the missing side — the dangling-edge check the reference lacks)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return J.anti_missing(p, li, on=["p_partkey"]).select("p_partkey", "p_name")


@register(
    "semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — semi-join keep-if-parent-exists."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return J.semi_keep(c, o, on=["c_custkey"]).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# A4/A5/A7/A8 — group helpers
# ---------------------------------------------------------------------------


@register(
    "earliest_per_group",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS earliest
    FROM events GROUP BY 1, 2
    """,
)
def earliest_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — earliest timestamp per group (parity: min reached_at per depth,
    /root/reference/app/graph_irrigation_event.py:167-178)."""
    ev = load_table(spark, sf_dir, "events")
    out = A.earliest_per_group(ev, ["user_id", "event_type"], "ts")
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "event_type",
        _fmt_ts(F.col("earliest")).alias("earliest"),
    )


@register(
    "distinct_sorted_set",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS type_list
    FROM events GROUP BY 1
    """,
)
def distinct_sorted_set_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — sorted distinct-set aggregation (parity: root_zone_list,
    /root/reference/app/graph_irrigation_event.py:193-196). Emitted as a
    joined string so the oracle hash is type-stable."""
    ev = load_table(spark, sf_dir, "events")
    out = A.distinct_sorted_set(ev, ["user_id"], "event_type")
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.array_join("distinct_values", ",").alias("type_list"),
    )


@register(
    "running_idx",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber) AS BIGINT) AS idx
    FROM lineitem
    """,
)
def running_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — per-group sequential index in deterministic order (parity: the
    in-memory idx counters, /root/reference/app/graph_application_event.py:99,146-150)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = A.running_index(li, ["l_orderkey"], ["l_shipdate", "l_linenumber"])
    return out.select("l_orderkey", "l_linenumber", F.col("idx").cast("bigint").alias("idx"))


@register(
    "dedup_first_wins",
    oracle="""
    SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS day, o_orderkey
    FROM (
      SELECT o_custkey, o_orderdate, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — dedup by key with deterministic first-wins (parity: the
    seen-set skip, /root/reference/app/graph_optimum_sap_range.py:29-62)."""
    o = load_table(spark, sf_dir, "orders")
    out = A.dedup_first(o, ["o_custkey", "o_orderdate"], ["o_orderkey"])
    return out.select(
        "o_custkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"), "o_orderkey"
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS total
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — top-k per group by rank (parity: the top-1-by-proximity argmin
    generalized, /root/reference/app/graph_product_application.py:202-214)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", r4(F.col("o_totalprice")).alias("total"))
    )


# ---------------------------------------------------------------------------
# §2.8 — sessionization
# ---------------------------------------------------------------------------


@register(
    "sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(session_id AS BIGINT) AS session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_at,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_at,
           round((epoch_us(max(ts)) - epoch_us(min(ts))) / 60000000.0, 4) AS duration_min,
           count(*) AS n_events
    FROM sess GROUP BY 1, 2
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 — gap-based sessionization, gap=30min (defines the semantics of
    the reference's missing GET_IRRIGATIONS SQL,
    /root/reference/app/graph_irrigation_event.py:17-22,55-75: intervals
    {start_at, end_at, duration_min})."""
    ev = load_table(spark, sf_dir, "events")
    out = session_intervals(ev, ["user_id"], "ts", gap_seconds=1800)
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("session_id").cast("bigint").alias("session_id"),
        _fmt_ts(F.col("start_at")).alias("start_at"),
        _fmt_ts(F.col("end_at")).alias("end_at"),
        r4(F.col("duration_min")).alias("duration_min"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Scalar library queries (F-family)
# ---------------------------------------------------------------------------


@register(
    "sanitize_prop_names",
    oracle="""
    SELECT DISTINCT p_type,
           regexp_replace(lower(p_type), '[^a-z0-9_]+', '_', 'g') AS prop_name
    FROM part
    """,
)
def sanitize_prop_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — property-name sanitize (parity: _sanitize,
    /root/reference/app/graph_weather_day.py:46-51)."""
    p = load_table(spark, sf_dir, "part")
    return p.select("p_type").distinct().withColumn("prop_name", S.sanitize_prop_name("p_type"))


@register(
    "depth_from_label",
    oracle="""
    SELECT label,
           CAST(coalesce(
             CAST(round_even(CAST(replace(regexp_extract(label, '(\\d{1,3}(?:[.,]\\d+)?)', 1), ',', '.') AS DOUBLE), 0) AS INT),
             -1) AS INT) AS depth_cm
    FROM (SELECT concat('soil_', CAST(p_size AS VARCHAR), ',5_cm') AS label FROM part)
    """,
)
def depth_from_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — depth-from-label with decimal-comma tolerance (parity:
    _depth_from_label, /root/reference/app/graph_soil_layer.py:28-42).
    Labels synthesized as 'soil_<size>,5_cm' — every value is a .5 tie, so
    this query pins the half-even rounding the reference's Python round()
    uses (bround here, round_even in the oracle)."""
    p = load_table(spark, sf_dir, "part")
    labeled = p.select(
        F.concat(F.lit("soil_"), F.col("p_size").cast("string"), F.lit(",5_cm")).alias("label")
    )
    return labeled.withColumn("depth_cm", S.depth_from_label("label"))


@register(
    "loose_number_parse",
    oracle="""
    SELECT raw,
           CAST(replace(regexp_extract(raw, '([-+]?\\d+(?:[.,]\\d+)?)', 1), ',', '.') AS DOUBLE) AS parsed
    FROM (
      SELECT CASE CAST(l_linenumber % 4 AS INT)
                  WHEN 0 THEN concat('~', CAST(l_quantity AS VARCHAR))
                  WHEN 1 THEN concat('>= ', replace(CAST(l_quantity AS VARCHAR), '.', ','))
                  WHEN 2 THEN concat(CAST(l_quantity AS VARCHAR), ' %')
                  ELSE CAST(l_quantity AS VARCHAR) END AS raw
      FROM lineitem
    )
    """,
)
def loose_number_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — loose numeric token parse tolerating ~, >=, %, decimal comma
    (parity: _to_float, /root/reference/app/graph_sap_element_result.py:16-29)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("string")
    raw = (
        F.when(F.col("l_linenumber") % 4 == 0, F.concat(F.lit("~"), qty))
        .when(F.col("l_linenumber") % 4 == 1, F.concat(F.lit(">= "), F.regexp_replace(qty, r"\.", ",")))
        .when(F.col("l_linenumber") % 4 == 2, F.concat(qty, F.lit(" %")))
        .otherwise(qty)
    )
    return li.select(raw.alias("raw")).withColumn("parsed", S.loose_number("raw"))


@register(
    "range_parse",
    oracle="""
    SELECT raw,
           CASE WHEN kind = 0 THEN CAST(p_size AS DOUBLE)
                WHEN kind = 1 THEN CAST(p_size AS DOUBLE)
                ELSE NULL END AS range_min,
           CASE WHEN kind = 0 THEN CAST(p_size + 3 AS DOUBLE)
                WHEN kind = 2 THEN CAST(p_size AS DOUBLE)
                ELSE NULL END AS range_max
    FROM (
      SELECT CAST(p_size % 3 AS INT) AS kind, p_size,
             CASE CAST(p_size % 3 AS INT)
                  WHEN 0 THEN concat(CAST(p_size AS VARCHAR), '-', CAST(p_size + 3 AS VARCHAR))
                  WHEN 1 THEN concat('>=', CAST(p_size AS VARCHAR))
                  ELSE concat('<= ', CAST(p_size AS VARCHAR)) END AS raw
      FROM part
    )
    """,
)
def range_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — optimum-range string parse ("1-4" / ">=2.5" / "<=7" / "3")
    (parity: _parse_range, /root/reference/app/graph_optimum_element_range.py:16-61)."""
    p = load_table(spark, sf_dir, "part")
    size = F.col("p_size").cast("string")
    raw = (
        F.when(F.col("p_size") % 3 == 0, F.concat(size, F.lit("-"), (F.col("p_size") + 3).cast("string")))
        .when(F.col("p_size") % 3 == 1, F.concat(F.lit(">="), size))
        .otherwise(F.concat(F.lit("<= "), size))
    )
    parsed = p.select(raw.alias("raw")).withColumn("r", S.parse_range("raw"))
    return parsed.select("raw", F.col("r.range_min").alias("range_min"), F.col("r.range_max").alias("range_max"))


@register(
    "point_parse",
    oracle="""
    SELECT c_custkey, round(CAST(c_custkey % 360 - 180 AS DOUBLE) + 0.5, 4) AS lon,
           round(CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.25, 4) AS lat
    FROM customer
    """,
)
def point_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21 — Postgres point "(x,y)" parse → lon/lat doubles (parity: the
    monkey-patched point loader /root/reference/app/patches.py:17-27 +
    flattening graph_fields.py:7-11). Point strings synthesized from keys,
    round-tripped through the parser."""
    c = load_table(spark, sf_dir, "customer")
    lon = (F.col("c_custkey") % 360 - 180).cast("double") + 0.5
    lat = (F.col("c_custkey") % 180 - 90).cast("double") + 0.25
    pts = c.select(
        "c_custkey",
        F.concat(F.lit("("), lon.cast("string"), F.lit(","), lat.cast("string"), F.lit(")")).alias("pt"),
    )
    parsed = pts.withColumn("p", S.parse_point("pt"))
    return parsed.select(
        "c_custkey", r4(F.col("p.lon")).alias("lon"), r4(F.col("p.lat")).alias("lat")
    )


@register(
    "composite_id",
    oracle="""
    SELECT concat_ws(':', CAST(l_orderkey AS VARCHAR), CAST(l_partkey AS VARCHAR),
                     CAST(l_linenumber AS VARCHAR)) AS line_id,
           round(l_quantity, 4) AS qty
    FROM lineitem
    """,
)
def composite_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 — stable composite natural-key id (parity:
    /root/reference/app/graph_sap_element_result.py:65-67)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        S.composite_id("l_orderkey", "l_partkey", "l_linenumber").alias("line_id"),
        r4(F.col("l_quantity")).alias("qty"),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16/F18 — JSON property access on the stringly-typed payloads the
    reference stores (SURVEY §1.4); engine policy is native structs with
    JSON only at the edges — this is the edge reader."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


@register(
    "unit_conversion",
    oracle="""
    SELECT unit, round(sum(liters), 4) AS total_liters, count(*) AS n
    FROM (
      SELECT CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'L' WHEN 1 THEN 'ml' ELSE 'oz' END AS unit,
             CASE CAST(event_id % 3 AS INT)
                  WHEN 0 THEN value
                  WHEN 1 THEN value / 1000.0
                  ELSE NULL END AS liters
      FROM events
    )
    GROUP BY 1
    """,
)
def unit_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 + A6 — unit→liters conversion with unconvertible units skipped
    (parity: _unit_to_liters + the heuristic sum,
    /root/reference/app/graph_application_event.py:51-85)."""
    ev = load_table(spark, sf_dir, "events")
    unit = (
        F.when(F.col("event_id") % 3 == 0, F.lit("L"))
        .when(F.col("event_id") % 3 == 1, F.lit("ml"))
        .otherwise(F.lit("oz"))
    )
    w = ev.select(unit.alias("unit"), "value")
    return (
        w.withColumn("liters", S.to_liters("value", "unit"))
        .groupBy("unit")
        .agg(r4(F.sum("liters")).alias("total_liters"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "datetime_coercion",
    oracle="""
    SELECT raw, strftime(CASE CAST(o_orderkey % 3 AS INT)
             WHEN 0 THEN o_orderdate
             WHEN 1 THEN date_trunc('minute', o_orderdate)
             ELSE date_trunc('day', o_orderdate) END, '%Y-%m-%d %H:%M:%S') AS parsed
    FROM (
      SELECT o_orderkey, o_orderdate,
             CASE CAST(o_orderkey % 3 AS INT)
                  WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
                  WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M')
                  ELSE strftime(o_orderdate, '%Y-%m-%d') END AS raw
      FROM orders
    )
    """,
)
def datetime_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — multi-format datetime coercion (parity: _coerce_dt,
    /root/reference/app/utils.py:19-32)."""
    o = load_table(spark, sf_dir, "orders")
    raw = (
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "yyyy-MM-dd HH:mm"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
    )
    return (
        o.select(raw.alias("raw"))
        .withColumn("parsed", F.date_format(S.coerce_datetime("raw"), "yyyy-MM-dd HH:mm:ss"))
    )


@register(
    "first_non_empty_pick",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(trim(CASE WHEN CAST(o_orderkey % 4 AS INT) = 0 THEN '' ELSE o_orderpriority END), ''),
                    nullif(trim(o_orderstatus), ''), 'unknown') AS app_type
    FROM orders
    """,
)
def first_non_empty_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14/F17 — first-non-empty alias pick with default (parity: _app_type,
    /root/reference/app/graph_application_event.py:30-36)."""
    o = load_table(spark, sf_dir, "orders")
    prio = F.when(F.col("o_orderkey") % 4 == 0, F.lit("")).otherwise(F.col("o_orderpriority"))
    return o.select(
        "o_orderkey",
        S.first_non_empty(prio, F.col("o_orderstatus")).alias("app_type"),
    )


# ---------------------------------------------------------------------------
# U1/U3 — set operations
# ---------------------------------------------------------------------------


@register(
    "union_dedup",
    oracle="""
    SELECT name, kind FROM (
      SELECT DISTINCT c_name AS name, 'customer' AS kind FROM customer
      UNION ALL
      SELECT DISTINCT s_name AS name, 'supplier' AS kind FROM supplier
    )
    """,
)
def union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U3 — stream concatenation + distinct (parity: chain(elements,
    others), /root/reference/app/graph_optimum_element_range.py:132-136)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.lit("customer").alias("kind")
    ).distinct()
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("kind")
    ).distinct()
    return c.unionByName(s)


# ---------------------------------------------------------------------------
# Headline TPC-H-style pricing summary (bench anchor)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2025-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the bench anchor query: full-scan
    grouped aggregation, map-side partial agg, 2-key shuffle. The filter and
    the 7-column projection push into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2025-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Graph layer — degrees, motifs, analytics (SURVEY §7.2.7)
# ---------------------------------------------------------------------------

from graph_db_spark.graph.build import build_graph, edges_sql  # noqa: E402
from graph_db_spark.graph.algorithms import connected_components, pagerank  # noqa: E402


@register(
    "graph_degrees",
    oracle=f"""
    WITH edges AS ({edges_sql()})
    SELECT id, count(*) AS degree FROM (
      SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
    ) GROUP BY 1
    """,
)
def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph layer — undirected degree per vertex over the full 7-type edge
    set (the property graph projected from the fixtures the same way the
    reference projects Postgres rows into Neo4j labels, SURVEY §1.1-1.3)."""
    g = build_graph(spark, sf_dir)
    return g.degrees().select("id", F.col("degree").cast("bigint").alias("degree"))


@register(
    "motif_region_order_path",
    oracle=f"""
    WITH edges AS ({edges_sql()})
    SELECT e1.src AS region, count(*) AS n_orders
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst AND e2.rel_type = 'HAS_CUSTOMER'
    JOIN edges e3 ON e3.src = e2.dst AND e3.rel_type = 'HAS_ORDER'
    WHERE e1.rel_type = 'HAS_NATION'
    GROUP BY 1
    """,
)
def motif_region_order_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph layer — 3-hop path motif Region→Nation→Customer→Order (the
    join-composition equivalent of Cypher MATCH path patterns like
    Field→Station→WeatherDay, SURVEY §1.3)."""
    g = build_graph(spark, sf_dir)
    path = g.motif_path(["HAS_NATION", "HAS_CUSTOMER", "HAS_ORDER"])
    return path.groupBy(F.col("v0").alias("region")).agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "motif_branch_conation",
    oracle=f"""
    WITH edges AS ({edges_sql()})
    SELECT e1.src AS region, CAST(count(*) AS BIGINT) AS n_pairs
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst AND e2.rel_type = 'HAS_CUSTOMER'
    JOIN edges e3 ON e3.src = e1.dst AND e3.rel_type = 'HAS_SUPPLIER'
    WHERE e1.rel_type = 'HAS_NATION'
    GROUP BY 1
    """,
)
def motif_branch_conation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph layer — BRANCHING 3-edge motif via the composable
    ``find()`` pattern builder (SURVEY §1.6): co-nation customer/supplier
    pairs per region. The pattern branches at the nation —
    ``(n)-[:HAS_CUSTOMER]->(c)`` and ``(n)-[:HAS_SUPPLIER]->(s)`` share
    ``n`` — which the linear ``motif_path`` chain cannot express; the
    label constraint on ``(r:Region)`` exercises the vertex-label join."""
    g = build_graph(spark, sf_dir)
    m = g.find(
        "(r:Region)-[:HAS_NATION]->(n); (n)-[:HAS_CUSTOMER]->(c); (n)-[:HAS_SUPPLIER]->(s)"
    )
    return m.groupBy(F.col("r").alias("region")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


def _graph_nparts(sf_dir: str) -> int | None:
    """Partition count for iterative graph rounds, from a file-size probe
    (no Spark job): the sf0.01 correctness fixture runs ~8 rounds × 2 jobs
    each, and 32-way stages of near-empty tasks are pure scheduler
    overhead there. Bigger inputs keep the cores-sized default — a 12-way
    tier for sf0.1 measured faster on an idle host (19.0s → 15.7s) but
    adds straggler variance under external CPU contention, so the
    cores-sized width (finer work-stealing granularity) stays."""
    import os.path

    try:
        sz = os.path.getsize(os.path.join(sf_dir, "lineitem.parquet"))
    except OSError:
        return None
    return 8 if sz < 4_000_000 else None


@register(
    "connected_components",
    oracle=f"""
    WITH RECURSIVE edges AS ({edges_sql()}),
    sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
    minv AS (SELECT min(a) AS m FROM sym),
    reach(id) AS (
      SELECT m FROM minv
      UNION
      SELECT s.b FROM reach r JOIN sym s ON s.a = r.id
    )
    SELECT id, (SELECT m FROM minv) AS component FROM reach
    """,
)
def connected_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — connected components by min-label propagation
    (BASELINE.json north star; deterministic output: component = min vertex
    id), now with an EXACT per-vertex oracle: a DuckDB recursive-CTE BFS
    closure from the global min vertex. The fixture graph is one component
    (verified independently by union-find), so the closure IS the full
    ground truth; were the graph ever multi-component, the row-count
    mismatch fails the gate loudly instead of silently passing."""
    g = build_graph(spark, sf_dir)
    return connected_components(g.edges, n_partitions=_graph_nparts(sf_dir))


def _pagerank_oracle_sql(iters: int = 10, reset: float = 0.15) -> str:
    """Generate the DuckDB power-iteration oracle — the same algorithm as
    graph/algorithms.pagerank (uniform init, per-edge 1/out_degree weights
    with duplicate-edge multiplicity, dangling mass recovered by
    conservation), unrolled as one CTE chain per iteration. Per-label rank
    masses round(…, 6) are far above the ~1e-12 summation-order noise, so
    the hash comparison is deterministic."""
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs at every
    # reference, so a 10-iteration chain would expand exponentially (each
    # pr{i} re-expands the whole prefix — measured: 'too many open files')
    parts = [
        f"WITH edges AS MATERIALIZED ({edges_sql()})",
        "verts AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges))",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM verts)",
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)",
        "w AS MATERIALIZED (SELECT edges.src AS id, edges.dst, 1.0 / deg.d AS wt FROM edges JOIN deg ON edges.src = deg.src)",
        "pr0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM verts)",
    ]
    for i in range(iters):
        p, q = f"pr{i}", f"pr{i + 1}"
        parts += [
            f"c{i} AS (SELECT w.dst AS id, sum({p}.rank * w.wt) AS contrib FROM {p} JOIN w ON {p}.id = w.id GROUP BY w.dst)",
            f"t{i} AS MATERIALIZED (SELECT v.id, {reset} / (SELECT n FROM nn) + {1 - reset} * coalesce(c{i}.contrib, 0) AS rank"
            f" FROM verts v LEFT JOIN c{i} ON v.id = c{i}.id)",
            f"{q} AS MATERIALIZED (SELECT id, rank + (1.0 - (SELECT sum(rank) FROM t{i})) / (SELECT n FROM nn) AS rank FROM t{i})",
        ]
        final = q
    return ",\n".join(parts) + f"""
    SELECT label, round(mass, 6) AS mass, CAST(n AS BIGINT) AS n FROM (
      SELECT substr(id, 1, 1) AS label, sum(rank) AS mass, count(*) AS n
      FROM {final} GROUP BY 1
    )
    """


@register("pagerank", oracle=_pagerank_oracle_sql())
def pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — PageRank (10 iterations, reset 0.15, dangling mass
    redistributed by conservation), checked against a full power-iteration
    oracle: DuckDB runs the SAME algorithm as an unrolled CTE chain and the
    per-label rank masses + vertex counts must hash-match. This pins the
    whole rank distribution (Σmass = 1 across 7 labels), not just shape —
    a wrong damping factor, dangling handling, or degree normalization
    shifts label masses at the 3rd-4th decimal and fails the gate."""
    g = build_graph(spark, sf_dir)
    pr = pagerank(g.edges, max_iter=10, n_partitions=_graph_nparts(sf_dir))
    return (
        pr.groupBy(F.substring("id", 1, 1).alias("label"))
        .agg(
            F.round(F.sum("rank"), 6).alias("mass"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators: text analysis, dedup, similarity
# ---------------------------------------------------------------------------

from graph_db_spark.operators import dedup as D  # noqa: E402
from graph_db_spark.operators import similarity as SIM  # noqa: E402
from graph_db_spark.operators import text as TX  # noqa: E402


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_bpe_ish,
           round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) * 1.0
                 / nullif(length(text), 0), 4) AS punct_ratio
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis — token counting (whitespace + BPE-ish regex
    segmentation) and punctuation density, all JVM-side expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count("text").cast("bigint").alias("n_tokens"),
        TX.bpe_ish_token_count("text").cast("bigint").alias("n_bpe_ish"),
        r4(TX.punct_ratio("text")).alias("punct_ratio"),
    )


_SW_SQL = {
    lang: "[" + ", ".join(f"'{w}'" for w in TX.STOPWORDS[lang]) + "]" for lang in TX.STOPWORDS
}

@register(
    "text_quality_lang",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text,
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents
    ), hits AS (
      SELECT doc_id, text,
             len(list_distinct(list_intersect(t, {_SW_SQL['en']}))) AS h_en,
             len(list_distinct(list_intersect(t, {_SW_SQL['es']}))) AS h_es,
             len(list_distinct(list_intersect(t, {_SW_SQL['de']}))) AS h_de,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok
      FROM toks
    )
    SELECT doc_id,
           round((least(n_tok / 50.0, 1.0)
                  + (1.0 - least(((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) * 1.0
                                  / nullif(length(text), 0)) * 5.0, 1.0))
                  + least((h_en + h_es + h_de) / 5.0, 1.0)) / 3.0, 4) AS quality,
           CASE WHEN greatest(h_en, h_es, h_de) = 0 THEN 'und'
                WHEN h_en = greatest(h_en, h_es, h_de) THEN 'en'
                WHEN h_es = greatest(h_en, h_es, h_de) THEN 'es'
                ELSE 'de' END AS pred_lang
    FROM hits
    """,
)
def text_quality_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis — deterministic quality score (length/punct/stopword
    components) and stopword-overlap language ID."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        r4(TX.quality_score("text")).alias("quality"),
        TX.lang_id("text").alias("pred_lang"),
    )


@register(
    "doc_fingerprint_dedup",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
           min(doc_id) AS canonical_id,
           count(*) AS n_dups
    FROM documents
    GROUP BY 1
    """,
)
def doc_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup — exact content dedup by md5 fingerprint of normalized text;
    canonical row = min doc_id. One shuffle on the 128-bit hash — the
    linear-scale exact-dedup baseline."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "text", "doc_id")


@register(
    "ngram_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_distinct(list_intersect(a.t, b.t))) * 1.0
                 / (len(a.t) + len(b.t) - len(list_distinct(list_intersect(a.t, b.t)))), 4) AS jaccard
    FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE len(list_distinct(list_intersect(a.t, b.t))) * 1.0
          / (len(a.t) + len(b.t) - len(list_distinct(list_intersect(a.t, b.t)))) >= 0.8
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup — n-gram (word-set) Jaccard near-dup pairs, blocked by lang,
    threshold 0.8. At scale the pair proposal moves to MinHash-LSH
    (minhash_lsh_dedup below); this is the exact verifier — and it refuses
    to run when any block implies a quadratic pair blow-up
    (guard_block_pairs), delegating huge corpora to the LSH-propose path
    (near_dup_clusters)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.col("lang").alias("blk"),
        F.array_distinct(TX.tokens(F.col("text"))).alias("toks"),
    ).withColumn("sz", F.size("toks"))
    D.guard_block_pairs(toks, "blk", max_block_pairs=25_000_000)
    # language blocks are few, so a join keyed on blk alone runs ~serially;
    # bucket side a by id-hash and replicate side b across the buckets so the
    # join key (blk, bucket) has enough distinct values to parallelize.
    nb = 32
    a = (
        toks.withColumn("bkt", F.pmod(F.xxhash64("id"), F.lit(nb)))
        .repartition(nb, "blk", "bkt")  # the source is one small file → one
        .alias("a")                     # task; spread the probe side explicitly
    )
    b = toks.withColumn(
        "bkt", F.explode(F.sequence(F.lit(0), F.lit(nb - 1)).cast("array<bigint>"))
    ).alias("b")
    # exact length prefilter: jaccard <= min(|A|,|B|)/max(|A|,|B|), so
    # threshold t requires |A| >= t*|B| and |B| >= t*|A| — prunes the pair
    # space inside the join before any array_intersect runs.
    pairs = a.join(
        b,
        on=[
            F.col("a.blk") == F.col("b.blk"),
            F.col("a.bkt") == F.col("b.bkt"),
            F.col("a.id") < F.col("b.id"),
            F.col("a.sz").cast("double") >= 0.8 * F.col("b.sz"),
            F.col("b.sz").cast("double") >= 0.8 * F.col("a.sz"),
        ],
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks"))).cast("double").alias("inter"),
        (F.col("a.sz") + F.col("b.sz")).alias("szsum"),
    )
    jac = F.col("inter") / (F.col("szsum") - F.col("inter"))
    # filter on the RAW jaccard (as the oracle does), round only in the
    # projection — rounding first would admit raw values in [0.79995, 0.8).
    return (
        pairs.withColumn("_raw", jac)
        .filter(F.col("_raw") >= 0.8)
        .select("id_a", "id_b", r4(F.col("_raw")).alias("jaccard"))
    )


@register("minhash_lsh_dedup")  # EXACT oracle assigned post-def (portable hash)
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup — MinHash+LSH candidate pairs (32 hashes, 8 bands, 3-shingles).
    Shuffle volume O(n·bands); the O(n²) pair space never materializes.
    The portable polynomial shingle hash + LCG affine maps make the whole
    pipeline engine-reproducible: DuckDB recomputes signatures, bands and
    the bucket join EXACTLY (oracle at module bottom). Recall/precision vs
    exact Jaccard also unit-tested (tests/test_llm_ops.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_candidates(docs, "text", "doc_id")


@register("simhash_near_dups")  # EXACT oracle assigned post-def (portable hash)
def simhash_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup — SimHash near-dup pairs (64-bit signatures, Hamming ≤ 3,
    block-rotation bucketing so no all-pairs join). The two-polynomial
    portable bit decisions make the whole pipeline engine-reproducible:
    DuckDB recomputes signatures, blocks, and Hamming verify EXACTLY
    (oracle at module bottom)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs, "text", "doc_id", max_hamming=3)


@register(
    "embedding_cosine_topk",
    oracle="""
    SELECT query_id, neighbor_id, round(cosine_sim, 4) AS cosine_sim, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cosine_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                        c.vec_id
             ) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10
    ) WHERE rank <= 5
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity — brute-force cosine top-5 for 10 query vectors over the
    corpus (the exact baseline; LSH variant below is the scale path).
    Queries broadcast; corpus stays partitioned; one shuffle for the global
    top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = SIM.cosine_topk(emb, q, k=5)
    return out.select(
        "query_id", "neighbor_id", r4(F.col("cosine_sim")).alias("cosine_sim"),
        F.col("rank").cast("bigint").alias("rank"),
    )


@register(
    "embedding_near_dup_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cosine_sim
    FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.9
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup — embedding-cosine near-dup pairs (≥0.9), blocked by label so
    the pair space is bounded per block (at scale: LSH buckets replace the
    label blocking)."""
    emb = load_table(spark, sf_dir, "embeddings")
    from graph_db_spark.util import spread

    a = spread(emb).select(F.col("vec_id").alias("id_a"), F.col("label").alias("lbl"),
                           F.col("embedding").cast("array<double>").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("label").alias("lbl"),
                   F.col("embedding").cast("array<double>").alias("vb"))
    cos = SIM.cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, on=["lbl"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", r4(cos).alias("cosine_sim"), cos.alias("_raw"))
        .filter(F.col("_raw") >= 0.9)
        .drop("_raw")
    )


def _lsh_planes_sql(dim: int = 64, n_planes: int = 4, n_tables: int = 16,
                    seed: int = 42) -> str:
    """The LSH hyperplanes as a DuckDB VALUES literal — the planes come
    from a pure-Python LCG (similarity.hyperplanes), so the ENTIRE
    approximate pipeline is reproducible in SQL: same planes, same sign
    buckets, same candidates, same re-rank. ``repr(float)`` round-trips
    exactly, so both engines see bit-identical plane coefficients."""
    rows = []
    for t in range(n_tables):
        for i, plane in enumerate(SIM.hyperplanes(dim, n_planes, seed + 1000 * t)):
            vec = "[" + ", ".join(repr(x) for x in plane) + "]"
            rows.append(f"({t}, {i}, {vec})")
    return ",\n      ".join(rows)


@register(
    "ann_lsh_topk",
    oracle=f"""
    WITH planes(tbl, pidx, pvec) AS (VALUES
      {_lsh_planes_sql()}),
    q AS MATERIALIZED (SELECT vec_id AS query_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                       FROM embeddings WHERE vec_id < 10),
    c AS MATERIALIZED (SELECT vec_id AS neighbor_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
                       FROM embeddings),
    qb AS (SELECT query_id, tbl,
                  CAST(sum(CASE WHEN list_dot_product(qv, pvec) >= 0
                                THEN (1 << pidx) ELSE 0 END) AS BIGINT) AS bucket
           FROM q CROSS JOIN planes GROUP BY 1, 2),
    cb AS (SELECT neighbor_id, tbl,
                  CAST(sum(CASE WHEN list_dot_product(cv, pvec) >= 0
                                THEN (1 << pidx) ELSE 0 END) AS BIGINT) AS bucket
           FROM c CROSS JOIN planes GROUP BY 1, 2),
    cand AS (SELECT DISTINCT qb.query_id, cb.neighbor_id
             FROM qb JOIN cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
             WHERE qb.query_id <> cb.neighbor_id),
    scored AS (SELECT cand.query_id, cand.neighbor_id,
                      CASE WHEN sqrt(list_dot_product(q.qv, q.qv))
                                * sqrt(list_dot_product(c.cv, c.cv)) > 0
                           THEN list_dot_product(q.qv, c.cv)
                                / (sqrt(list_dot_product(q.qv, q.qv))
                                   * sqrt(list_dot_product(c.cv, c.cv)))
                           ELSE 0.0 END AS sim
               FROM cand JOIN q ON cand.query_id = q.query_id
                         JOIN c ON cand.neighbor_id = c.neighbor_id)
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity — ANN top-k via multi-table random-hyperplane LSH
    (16 tables × 4 planes, ~0.93 recall@3 on the fixture embeddings) with
    exact re-rank on the deduped candidate union. Candidate generation
    shuffles on (table, bucket): O(n·tables), the 100 TB path.

    EXACT oracle (was rows-only through round 2): the LCG plane matrix is
    embedded in the SQL as literals, so DuckDB reproduces buckets,
    candidate set, and re-rank bit-for-bit — the driver hash-checks the
    approximate result itself, not just its quality bound."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = SIM.cosine_topk_lsh(emb, q, dim=64, k=5, n_planes=4, n_tables=16)
    return out.select(
        "query_id", "neighbor_id", r4(F.col("cosine_sim")).alias("cosine_sim"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def _ivf_training_sql(n_centroids: int = 16, lloyd_iters: int = 3, dim: int = 64) -> list[str]:
    """Shared DuckDB CTE prefix replicating IVF training + corpus
    assignment (similarity.py:ivf_centroids / ivf_assign): the engine-
    portable LCG seed pick, ``lloyd_iters`` unrolled spherical-k-means
    rounds (argmax assignment with the same larger-index tiebreak, per-
    dimension means rebuilt into normalized centroid lists, empty
    clusters keeping their previous centroid), ending at ``casg`` —
    every corpus vector's cluster. MATERIALIZED throughout (DuckDB
    inlines plain CTEs per reference — same lesson as the PageRank
    oracle). Shared by the ANN top-k and SemDeDup oracles so the
    centroid replay stays in one place."""
    parts = [
        "WITH base AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rawv FROM embeddings)",
        # unit-normalized vectors + LCG seed hash
        "uv AS MATERIALIZED (SELECT id, rawv,"
        " list_transform(rawv, x -> x / sqrt(list_dot_product(rawv, rawv))) AS v,"
        " (id * 1103515245 + 12345) % 2147483648 AS h FROM base)",
        f"cent0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY h, id) - 1 AS cluster, v AS cvec"
        f" FROM uv ORDER BY h, id LIMIT {n_centroids})",
    ]
    cur = "cent0"
    for r in range(lloyd_iters):
        nxt = f"cent{r + 1}"
        parts += [
            # argmax assignment over UNIT vectors; ties → larger cluster idx
            # (mirrors _top_clusters' reverse(array_sort(struct(sim, idx))))
            f"asg{r} AS MATERIALIZED (SELECT id, cluster FROM ("
            f"  SELECT uv.id, c.cluster,"
            f"         row_number() OVER (PARTITION BY uv.id"
            f"           ORDER BY list_dot_product(uv.v, c.cvec) DESC, c.cluster DESC) AS rn"
            f"  FROM uv CROSS JOIN {cur} c) WHERE rn = 1)",
            f"mean{r} AS MATERIALIZED (SELECT a.cluster, t.pos, avg(uv.v[t.pos]) AS m"
            f" FROM asg{r} a JOIN uv ON a.id = uv.id CROSS JOIN range(1, {dim + 1}) t(pos)"
            f" GROUP BY 1, 2)",
            f"{nxt} AS MATERIALIZED (SELECT p.cluster,"
            f" CASE WHEN n.lst IS NULL THEN p.cvec"
            f"      ELSE list_transform(n.lst, x -> x / (CASE WHEN sqrt(list_dot_product(n.lst, n.lst)) = 0"
            f"                                                THEN 1.0 ELSE sqrt(list_dot_product(n.lst, n.lst)) END))"
            f" END AS cvec"
            f" FROM {cur} p LEFT JOIN (SELECT cluster, list(m ORDER BY pos) AS lst"
            f"                         FROM mean{r} GROUP BY cluster) n ON p.cluster = n.cluster)",
        ]
        cur = nxt
    parts += [
        # final inverted lists: corpus assignment over RAW vectors (argmax
        # is scale-invariant; tiebreak identical)
        f"casg AS MATERIALIZED (SELECT id AS neighbor_id, cluster, rawv AS cv FROM ("
        f"  SELECT uv.id, uv.rawv, c.cluster,"
        f"         row_number() OVER (PARTITION BY uv.id"
        f"           ORDER BY list_dot_product(uv.rawv, c.cvec) DESC, c.cluster DESC) AS rn"
        f"  FROM uv CROSS JOIN {cur} c) WHERE rn = 1)",
    ]
    return parts


def _ivf_oracle_sql(n_centroids: int = 16, nprobe: int = 8, lloyd_iters: int = 3,
                    k: int = 5, dim: int = 64) -> str:
    """ANN top-k oracle: the shared IVF training replay + the nprobe
    probe and exact cosine re-rank."""
    parts = _ivf_training_sql(n_centroids, lloyd_iters, dim)
    cur = f"cent{lloyd_iters}"
    parts += [
        f"qpro AS MATERIALIZED (SELECT id AS query_id, cluster, rawv AS qv FROM ("
        f"  SELECT uv.id, uv.rawv, c.cluster,"
        f"         row_number() OVER (PARTITION BY uv.id"
        f"           ORDER BY list_dot_product(uv.rawv, c.cvec) DESC, c.cluster DESC) AS rn"
        f"  FROM uv CROSS JOIN {cur} c WHERE uv.id < 10) WHERE rn <= {nprobe})",
        "scored AS (SELECT q.query_id, c.neighbor_id,"
        " CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv)) > 0"
        "      THEN list_dot_product(q.qv, c.cv)"
        "           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv)))"
        "      ELSE 0.0 END AS sim"
        " FROM qpro q JOIN casg c ON q.cluster = c.cluster AND q.query_id <> c.neighbor_id)",
    ]
    return ",\n".join(parts) + f"""
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def _pq_d2(a: str, b: str) -> str:
    """Squared-L2 in the exact expanded form similarity._l2sq uses."""
    return (
        f"(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}))"
    )


def _pq_training_sql(
    m: int = 4, k_sub: int = 8, lloyd_iters: int = 2, dim: int = 64
) -> list[str]:
    """DuckDB CTE suffix replaying PQ codebook training + corpus encoding
    (operators/similarity.py:pq_codebooks/pq_encode — LCG seed rows,
    unrolled plain-L2 Lloyd rounds with smaller-index tiebreak and
    empty-cluster keep-old), ending at ``codes`` (id, c0..c{m−1}).
    Assumes a ``uv(id, rawv, h)`` CTE exists (both the standalone PQ
    oracle and the IVF-PQ composition provide one — the latter reuses
    `_ivf_training_sql`'s, whose extra columns are harmless)."""
    d2 = _pq_d2
    subdim = dim // m
    lo = lambda s: s * subdim + 1  # noqa: E731
    hi = lambda s: (s + 1) * subdim  # noqa: E731
    parts = [
        f"seeds AS MATERIALIZED (SELECT row_number() OVER (ORDER BY h, id) - 1 AS code, rawv"
        f" FROM uv ORDER BY h, id LIMIT {k_sub})",
    ]
    for s in range(m):
        parts.append(
            f"bk{s}_0 AS MATERIALIZED (SELECT code, rawv[{lo(s)}:{hi(s)}] AS cvec FROM seeds)"
        )
    for r in range(lloyd_iters):
        for s in range(m):
            sub = f"uv.rawv[{lo(s)}:{hi(s)}]"
            parts += [
                f"asg{s}_{r} AS MATERIALIZED (SELECT id, code FROM ("
                f"  SELECT uv.id, b.code,"
                f"         row_number() OVER (PARTITION BY uv.id"
                f"           ORDER BY {d2(sub, 'b.cvec')} ASC, b.code ASC) AS rn"
                f"  FROM uv CROSS JOIN bk{s}_{r} b) WHERE rn = 1)",
                f"mean{s}_{r} AS MATERIALIZED (SELECT a.code, t.pos,"
                f" avg(uv.rawv[{lo(s)} + t.pos - 1]) AS mn"
                f" FROM asg{s}_{r} a JOIN uv ON a.id = uv.id"
                f" CROSS JOIN range(1, {subdim + 1}) t(pos) GROUP BY 1, 2)",
                f"bk{s}_{r + 1} AS MATERIALIZED (SELECT p.code,"
                f" CASE WHEN n.lst IS NULL THEN p.cvec ELSE n.lst END AS cvec"
                f" FROM bk{s}_{r} p LEFT JOIN (SELECT code, list(mn ORDER BY pos) AS lst"
                f"   FROM mean{s}_{r} GROUP BY code) n ON p.code = n.code)",
            ]
    fin = lloyd_iters
    for s in range(m):
        sub = f"uv.rawv[{lo(s)}:{hi(s)}]"
        parts.append(
            f"enc{s} AS MATERIALIZED (SELECT id, code AS c{s} FROM ("
            f"  SELECT uv.id, b.code,"
            f"         row_number() OVER (PARTITION BY uv.id"
            f"           ORDER BY {d2(sub, 'b.cvec')} ASC, b.code ASC) AS rn"
            f"  FROM uv CROSS JOIN bk{s}_{fin} b) WHERE rn = 1)"
        )
    enc_joins = " ".join(f"JOIN enc{s} ON uv.id = enc{s}.id" for s in range(m))
    enc_cols = ", ".join(f"enc{s}.c{s}" for s in range(m))
    parts.append(
        f"codes AS MATERIALIZED (SELECT uv.id, {enc_cols} FROM uv {enc_joins})"
    )
    return parts


def _pq_oracle_sql(
    m: int = 4, k_sub: int = 8, lloyd_iters: int = 2, k: int = 5, dim: int = 64
) -> str:
    """Standalone PQ ANN oracle: training replay + full-corpus ADC scan +
    re-rank. The squared-L2 form and the s=0..m−1 ADC summation order are
    written identically in both engines so argmin comparisons and the
    final distances agree bit-for-bit."""
    subdim = dim // m
    lo = lambda s: s * subdim + 1  # noqa: E731
    hi = lambda s: (s + 1) * subdim  # noqa: E731
    parts = [
        "WITH base AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS rawv FROM embeddings)",
        "uv AS MATERIALIZED (SELECT id, rawv,"
        " (id * 1103515245 + 12345) % 2147483648 AS h FROM base)",
    ] + _pq_training_sql(m, k_sub, lloyd_iters, dim)
    adc = " + ".join(
        _pq_d2(f"q.rawv[{lo(s)}:{hi(s)}]", f"b{s}.cvec") for s in range(m)
    )
    joins = " ".join(
        f"JOIN bk{s}_{lloyd_iters} b{s} ON t.c{s} = b{s}.code" for s in range(m)
    )
    parts.append(
        f"scored AS (SELECT q.id AS query_id, t.id AS neighbor_id, {adc} AS ad"
        f" FROM (SELECT id, rawv FROM uv WHERE id < 10) q"
        f" CROSS JOIN codes t {joins} WHERE q.id <> t.id)"
    )
    return ",\n".join(parts) + f"""
    SELECT query_id, neighbor_id, approx_dist, rank FROM (
      SELECT query_id, neighbor_id, round(ad, 4) AS approx_dist,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY ad ASC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def _ivf_pq_oracle_sql(
    n_centroids: int = 16,
    nprobe: int = 8,
    ivf_iters: int = 3,
    m: int = 4,
    k_sub: int = 8,
    pq_iters: int = 2,
    k: int = 5,
    dim: int = 64,
) -> str:
    """IVF-PQ oracle — BOTH replay generators composed: the IVF prefix
    (`_ivf_training_sql`, whose ``uv`` carries the id/rawv/h columns the
    PQ suffix needs) trains centroids, assigns the corpus (``casg``) and
    probes queries; the PQ suffix (`_pq_training_sql`) trains codebooks
    and encodes; the candidate scan then scores approx cosine
    Σ〈q_s,cw_s〉 / (‖q‖·√Σ‖cw_s‖²) from codes alone — identical
    subspace summation order to similarity.cosine_topk_ivf_pq."""
    subdim = dim // m
    lo = lambda s: s * subdim + 1  # noqa: E731
    hi = lambda s: (s + 1) * subdim  # noqa: E731
    parts = _ivf_training_sql(n_centroids, ivf_iters, dim)
    cur = f"cent{ivf_iters}"
    parts += [
        f"qpro AS MATERIALIZED (SELECT id AS query_id, cluster, rawv AS qv FROM ("
        f"  SELECT uv.id, uv.rawv, c.cluster,"
        f"         row_number() OVER (PARTITION BY uv.id"
        f"           ORDER BY list_dot_product(uv.rawv, c.cvec) DESC, c.cluster DESC) AS rn"
        f"  FROM uv CROSS JOIN {cur} c WHERE uv.id < 10) WHERE rn <= {nprobe})",
    ]
    parts += _pq_training_sql(m, k_sub, pq_iters, dim)
    approx_dot = " + ".join(
        f"list_dot_product(q.qv[{lo(s)}:{hi(s)}], b{s}.cvec)" for s in range(m)
    )
    recon_sq = " + ".join(
        f"list_dot_product(b{s}.cvec, b{s}.cvec)" for s in range(m)
    )
    joins = " ".join(
        f"JOIN bk{s}_{pq_iters} b{s} ON t.c{s} = b{s}.code" for s in range(m)
    )
    parts.append(
        "scored AS (SELECT q.query_id, c.neighbor_id,"
        f" CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) * sqrt({recon_sq}) > 0"
        f"      THEN ({approx_dot}) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt({recon_sq}))"
        "      ELSE 0.0 END AS ac"
        " FROM qpro q JOIN casg c ON q.cluster = c.cluster AND q.query_id <> c.neighbor_id"
        f" JOIN codes t ON t.id = c.neighbor_id {joins})"
    )
    return ",\n".join(parts) + f"""
    SELECT query_id, neighbor_id, approx_cos, rank FROM (
      SELECT query_id, neighbor_id, round(ac, 4) AS approx_cos,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY ac DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register("ann_ivf_pq_topk", oracle=_ivf_pq_oracle_sql())
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity — IVF-PQ: the production-shape ANN at 100 TB. The IVF
    coarse quantizer prunes candidates to nprobe inverted lists
    (corpus·nprobe/n_centroids per query) AND the in-list re-rank is
    compressed — approximate cosine from PQ codes via m table lookups
    per pair, never touching a raw corpus vector (FAISS IVFADC with
    ``by_residual=False``; the residual variant is the documented
    upgrade). Compose-don't-reimplement: reuses `ivf_centroids`/
    `ivf_assign` and `pq_codebooks`/`pq_encode` verbatim.

    EXACT oracle: both unrolled-Lloyd replays (spherical IVF + per-
    subspace L2 PQ) composed in one DuckDB query, then probe, encode,
    compressed-cosine scoring, and re-rank reproduced end to end."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = SIM.cosine_topk_ivf_pq(
        emb, q, k=5, n_centroids=16, nprobe=8, ivf_iters=3, m=4, k_sub=8, pq_iters=2
    )
    return out.select(
        "query_id", "neighbor_id", r4(F.col("approx_cos")).alias("approx_cos"),
        F.col("rank").cast("bigint").alias("rank"),
    )


@register("ann_pq_topk", oracle=_pq_oracle_sql())
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity — ANN top-k via product quantization (Jégou et al.,
    TPAMI 2011): 4 subspace codebooks × 8 codewords compress each 64-dim
    embedding to 4 small ints; queries precompute m×k_sub distance
    tables and the corpus scan is m table lookups per vector (asymmetric
    distance computation). The third classic ANN scale path next to LSH
    (`ann_lsh_topk`) and IVF (`ann_ivf_topk`) — this one shrinks the
    BYTES scanned (16× here before bit-packing), which at 100 TB of
    embeddings is the difference between an in-memory scan and an I/O
    bound one; composes with IVF probe lists exactly as IVF-PQ does.

    EXACT oracle: the LCG seed pick and unrolled plain-L2 Lloyd rounds
    replay in DuckDB (same discipline as `ann_ivf_topk`), then encoding,
    ADC, and re-rank are reproduced end to end — the driver hash-checks
    the approximate result itself."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = SIM.pq_topk(emb, q, k=5, m=4, k_sub=8, lloyd_iters=2)
    return out.select(
        "query_id", "neighbor_id", r4(F.col("approx_dist")).alias("approx_dist"),
        F.col("rank").cast("bigint").alias("rank"),
    )


@register("ann_ivf_topk", oracle=_ivf_oracle_sql())
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity — ANN top-k via an IVF coarse quantizer (spherical
    k-means inverted lists, nprobe nearest lists per query, exact re-rank).
    The fixture embeddings are near-uniform, so recall tracks the probed
    fraction (8/16 lists ≈ 0.87 recall@3); on clustered real embeddings
    the same plan prunes much harder at the same recall. Scale shape: one
    equi-join on cluster id — candidates per query are corpus/n_centroids
    × nprobe, tuned without touching the plan.

    EXACT oracle (was rows-only through round 2): the LCG seed pick is
    plain integer arithmetic, so DuckDB re-trains the SAME centroids with
    unrolled Lloyd rounds and reproduces the probe + re-rank end to end."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = SIM.cosine_topk_ivf(emb, q, k=5, n_centroids=16, nprobe=8)
    return out.select(
        "query_id", "neighbor_id", r4(F.col("cosine_sim")).alias("cosine_sim"),
        F.col("rank").cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Pipeline-DAG outputs (the reference's 25-task ETL re-expressed — §3.1/§3.3)
# ---------------------------------------------------------------------------

from graph_db_spark.plans import pipeline as P  # noqa: E402


@register(
    "pipeline_application_event_idx",
    oracle="""
    SELECT o_custkey AS field_id,
           strftime(o_orderdate, '%Y-%m-%d') AS date,
           coalesce(nullif(trim(o_orderpriority), ''), nullif(trim(o_orderstatus), ''), 'unknown') AS app_type,
           o_orderkey AS order_ref,
           CAST(row_number() OVER (
             PARTITION BY o_custkey, strftime(o_orderdate, '%Y-%m-%d'),
                          coalesce(nullif(trim(o_orderpriority), ''), nullif(trim(o_orderstatus), ''), 'unknown')
             ORDER BY o_orderkey) AS BIGINT) AS idx
    FROM orders
    """,
)
def pipeline_application_event_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — ApplicationEvent idx assignment (A7 row_number replacing
    the reference's in-memory counters, graph_application_event.py:99,146-150)."""
    ae = P.build(spark, sf_dir, only=["application_events"])["application_events"]
    return ae.select(
        "field_id", "date", "app_type", "order_ref", F.col("idx").cast("bigint").alias("idx")
    )


@register(
    "pipeline_soil_param_results",
    oracle="""
    SELECT concat_ws(':', o.o_custkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderkey) AS analysis_id,
           concat('param_', l.l_partkey) AS parameter,
           round(l.l_quantity, 4) AS value
    FROM (SELECT l_orderkey, l_partkey, l_quantity FROM (
            SELECT l_orderkey, l_partkey, l_quantity,
                   row_number() OVER (PARTITION BY l_orderkey, l_partkey
                                      ORDER BY l_linenumber, l_quantity) AS rn
            FROM lineitem) WHERE rn = 1) l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'P'
    """,
)
def pipeline_soil_param_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — per-parameter lab results with composite ids (F15) and
    inequality-trimmed value parse (F4); dedup keeps the first line per
    (analysis, parameter) in linenumber order."""
    spr = P.build(spark, sf_dir, only=["soil_param_results"])["soil_param_results"]
    return spr.select("analysis_id", "parameter", r4(F.col("value")).alias("value"))


@register(
    "pipeline_irrigation_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT concat('ST', user_id) AS serial_number,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_at,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_at,
           round((epoch_us(max(ts)) - epoch_us(min(ts))) / 60000000.0, 4) AS duration_min,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def pipeline_irrigation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — IrrigationEvent intervals: the engine-defined
    GET_IRRIGATIONS semantics (gap 30 min) keyed by station serial."""
    ev = P.build(spark, sf_dir, only=["irrigation_events"])["irrigation_events"]
    return ev.select("serial_number", "start_at", "end_at", "duration_min", "n_events")


@register(
    "pipeline_weather_day_metrics",
    oracle="""
    SELECT concat('ST', user_id) AS serial_number,
           strftime(ts, '%Y-%m-%d') AS date,
           event_type AS measurement,
           round(avg(value), 4) AS data,
           round(min(value), 4) AS min,
           round(max(value), 4) AS max,
           round(sum(value), 4) AS sum,
           count(value) AS n
    FROM events
    WHERE event_type IN ('view', 'click')
    GROUP BY 1, 2, 3
    """,
)
def pipeline_weather_day_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — WeatherDay node metrics exploded back to long form (the
    MapType dynamic-measurement storage round-trips losslessly)."""
    wd = P.build(spark, sf_dir, only=["weather_days"])["weather_days"]
    m = wd.select(
        "serial_number", "date", F.explode("metrics").alias("measurement", "v")
    )
    return m.select(
        "serial_number", "date", "measurement",
        r4(F.col("v.data")).alias("data"), r4(F.col("v.min")).alias("min"),
        r4(F.col("v.max")).alias("max"), r4(F.col("v.sum")).alias("sum"),
        F.col("v.n").cast("bigint").alias("n"),
    )


@register(
    "pipeline_sap_analyses",
    oracle="""
    SELECT o.o_custkey AS field_id,
           strftime(o.o_orderdate, '%Y-%m-%d') AS date,
           c.c_mktsegment AS crop_name,
           lf.leaf_type,
           concat(CASE lf.leaf_type WHEN 'young' THEN 'Y' ELSE 'O' END,
                  CAST(o.o_orderkey AS VARCHAR)) AS sample_id,
           round(o.o_totalprice % 14, 2) AS ph,
           round(o.o_totalprice % 3, 2) AS ec,
           round(o.o_totalprice % 24, 1) AS sugars
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    CROSS JOIN (SELECT 'young' AS leaf_type UNION ALL SELECT 'old') lf
    WHERE lf.leaf_type = 'young' OR o.o_orderkey % 3 <> 0
    """,
)
def pipeline_sap_analyses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — SAPAnalysis nodes: the young/old leaf fan-out with the
    missing-sample guard (graph_sap_analysis.py:144-176) and loose-number
    parses (F3) of '~6,5' / '>= 1.2' / '12 %' scalar strings
    (_extract_scalar_metrics :57-73). The oracle recomputes the parsed
    values analytically, closing the loop on the messy-string round-trip."""
    sa = P.build(spark, sf_dir, only=["sap_analyses"])["sap_analyses"]
    return sa.select(
        "field_id", "date", "crop_name", "leaf_type", "sample_id",
        r4(F.col("ph")).alias("ph"), r4(F.col("ec")).alias("ec"),
        r4(F.col("sugars")).alias("sugars"),
    )


@register(
    "pipeline_sap_element_results",
    oracle="""
    WITH sa AS (
      SELECT o.o_orderkey AS order_ref,
             concat_ws(':', o.o_custkey, strftime(o.o_orderdate, '%Y-%m-%d'),
                       c.c_mktsegment, lf.leaf_type,
                       concat(CASE lf.leaf_type WHEN 'young' THEN 'Y' ELSE 'O' END,
                              CAST(o.o_orderkey AS VARCHAR))) AS sap_analysis_id,
             lf.leaf_type
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      CROSS JOIN (SELECT 'young' AS leaf_type UNION ALL SELECT 'old') lf
      WHERE lf.leaf_type = 'young' OR o.o_orderkey % 3 <> 0
    ), rows_ AS (
      SELECT sa.sap_analysis_id,
             ['n','p','k','ca','mg','fe','zn','mn'][CAST(l.l_partkey % 8 AS INT) + 1] AS nutrient,
             l.l_linenumber AS line_no,
             CASE WHEN l.l_linenumber % 7 = 0 THEN NULL
                  WHEN sa.leaf_type = 'young' THEN l.l_quantity
                  ELSE round(l.l_extendedprice % 500, 2) END AS value_ppm
      FROM lineitem l JOIN sa ON l.l_orderkey = sa.order_ref
    )
    SELECT sap_analysis_id, nutrient, round(value_ppm, 4) AS value_ppm FROM (
      SELECT *, row_number() OVER (PARTITION BY sap_analysis_id, nutrient
                                   ORDER BY line_no, value_ppm) AS rn
      FROM rows_ WHERE value_ppm IS NOT NULL
    ) WHERE rn = 1
    """,
)
def pipeline_sap_element_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — SAPElementResult child fan-out: composite sap_analysis_id
    (F15, _make_sa_id graph_sap_element_result.py:65-67), leaf-dependent
    value pick (:53-57), loose numeric parse with skip-on-unparsable
    (:108-115), A8 first-wins dedup per (analysis, nutrient)."""
    ser = P.build(spark, sf_dir, only=["sap_element_results"])["sap_element_results"]
    return ser.select(
        "sap_analysis_id", "nutrient", r4(F.col("value_ppm")).alias("value_ppm")
    )


@register(
    "pipeline_optimum_element_ranges",
    oracle="""
    WITH sa AS (
      SELECT o.o_orderkey AS order_ref,
             concat_ws('|', c.c_mktsegment, strftime(o.o_orderdate, '%Y-%m-%d')) AS opt_range_id
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), rows_ AS (
      SELECT sa.opt_range_id,
             ['n','p','k','ca','mg','fe','zn','mn'][CAST(l.l_partkey % 8 AS INT) + 1] AS nutrient,
             l.l_linenumber AS line_no,
             CASE WHEN l.l_partkey % 5 IN (0, 1, 3)
                  THEN CAST(trunc(l.l_quantity) AS DOUBLE) END AS range_min,
             CASE WHEN l.l_partkey % 5 = 0 THEN CAST(trunc(l.l_quantity) AS DOUBLE) + 3
                  WHEN l.l_partkey % 5 IN (2, 3)
                  THEN CAST(trunc(l.l_quantity) AS DOUBLE) END AS range_max
      FROM lineitem l JOIN sa ON l.l_orderkey = sa.order_ref
      WHERE l.l_partkey % 5 <> 4
    )
    SELECT opt_range_id, nutrient, range_min, range_max FROM (
      SELECT *, row_number() OVER (PARTITION BY opt_range_id, nutrient
                                   ORDER BY line_no,
                                            range_min ASC NULLS FIRST,
                                            range_max ASC NULLS FIRST) AS rn
      FROM rows_
    ) WHERE rn = 1
    """,
)
def pipeline_optimum_element_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — OptimumElementRange: the F5 range-string parse over all
    four forms ('1-4', '>= 2.5', '<=7', '3') plus the skip-unparsable
    branch (graph_optimum_element_range.py:38-61,146-148); 'crop|date'
    opt_range_id (:117); A8 dedup. The oracle recomputes the parsed bounds
    analytically from the same synthesis rule."""
    oer = P.build(spark, sf_dir, only=["optimum_element_ranges"])["optimum_element_ranges"]
    return oer.select("opt_range_id", "nutrient", "range_min", "range_max")


@register(
    "pipeline_water_param_results",
    oracle="""
    WITH wo AS (
      SELECT o_orderkey, o_custkey AS field_id,
             strftime(o_orderdate, '%Y-%m-%d') AS date,
             CASE WHEN o_orderkey % 3 = 0 THEN 'well'
                  WHEN o_orderkey % 3 = 1 THEN 'canal'
                  ELSE 'unknown' END AS sample_source
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ), rows_ AS (
      SELECT concat_ws(':', wo.field_id, wo.date, wo.sample_source) AS water_analysis_id,
             concat('param_', CAST(l.l_partkey % 10 AS VARCHAR)) AS parameter,
             l.l_linenumber AS line_no,
             l.l_quantity AS value,
             'mg/L' AS unit
      FROM lineitem l JOIN wo ON l.l_orderkey = wo.o_orderkey
    )
    SELECT water_analysis_id, parameter, round(value, 4) AS value, unit FROM (
      SELECT *, row_number() OVER (PARTITION BY water_analysis_id, parameter
                                   ORDER BY line_no, value) AS rn
      FROM rows_
    ) WHERE rn = 1
    """,
)
def pipeline_water_param_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — WaterParamResult: normalized parameter keys (_norm_param
    graph_water_param_result.py:23-27), inequality-trimmed values (F4),
    and the canonical 'unknown' sample_source fill on BOTH parent and
    child (fixing quirk §2.10.4 — the reference's ''-vs-'unknown' split
    left every null-source param dangling). Children collapsing onto one
    WaterAnalysis via shared (field, date, source) merge exactly as the
    reference's MERGE-by-wa_id does."""
    wpr = P.build(spark, sf_dir, only=["water_param_results"])["water_param_results"]
    return wpr.select(
        "water_analysis_id", "parameter", r4(F.col("value")).alias("value"), "unit"
    )


@register(
    "pipeline_app_nutrient_contents",
    oracle="""
    WITH ae AS (
      SELECT o_orderkey AS order_ref,
             concat_ws(':', o_custkey, strftime(o_orderdate, '%Y-%m-%d'),
                       coalesce(nullif(trim(o_orderpriority), ''), nullif(trim(o_orderstatus), ''), 'unknown'),
                       row_number() OVER (
                         PARTITION BY o_custkey, strftime(o_orderdate, '%Y-%m-%d'),
                                      coalesce(nullif(trim(o_orderpriority), ''), nullif(trim(o_orderstatus), ''), 'unknown')
                         ORDER BY o_orderkey)) AS ae_id
      FROM orders
    ), pa AS (
      SELECT concat_ws(':', ae.ae_id,
                       row_number() OVER (PARTITION BY ae.ae_id
                                          ORDER BY l.l_linenumber, l.l_partkey,
                                                   round(l.l_quantity, 4))) AS product_application_id,
             l.l_partkey AS partkey,
             round(l.l_quantity, 4) AS amount
      FROM lineitem l JOIN ae ON l.l_orderkey = ae.order_ref
    ), fp AS (
      SELECT partkey, nutrients_raw FROM (
        SELECT p_partkey AS partkey, p_type AS nutrients_raw,
               row_number() OVER (PARTITION BY p_name, p_brand ORDER BY p_partkey) AS rn
        FROM part WHERE p_name IS NOT NULL AND p_brand IS NOT NULL
      ) WHERE rn = 1
    ), expl AS (
      SELECT pa.product_application_id,
             unnest(string_split(coalesce(fp.nutrients_raw, 'unknown'), ' ')) AS nutrient,
             pa.amount
      FROM pa LEFT JOIN fp ON pa.partkey = fp.partkey
    )
    SELECT product_application_id, nutrient, round(sum(amount), 4) AS amount
    FROM expl GROUP BY 1, 2
    """,
)
def pipeline_app_nutrient_contents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — the deepest dependency chain end-to-end (SURVEY §3.3):
    ApplicationEvent idx (A7) → ProductApplication positional idx over the
    in-engine join (replacing the reference's Neo4j read-back,
    graph_product_application.py:156-214) → FertilizerProduct catalog with
    deterministic min-partkey A8 dedup → nutrient explode (F18) with
    catalog enrichment for missing nutrients (J4,
    graph_app_nutrient_content.py:306-354). The oracle recomputes all four
    stages in SQL, so a regression anywhere in the chain breaks the hash."""
    anc = P.build(spark, sf_dir, only=["app_nutrient_contents"])["app_nutrient_contents"]
    return anc.select("product_application_id", "nutrient", r4(F.col("amount")).alias("amount"))


@register(
    "pipeline_depth_points",
    oracle="""
    SELECT concat('ST', CAST(u.user_id AS VARCHAR)) AS serial_number,
           CAST(d.depth AS BIGINT) AS depth,
           CAST(CASE WHEN d.depth <= 30 THEN d.depth // 10 END AS BIGINT) AS sensor_index,
           round((u.user_id % 50 + d.depth) / 10.0, 4) AS y
    FROM (SELECT DISTINCT user_id FROM events) u
    CROSS JOIN (VALUES (10), (30), (60), (90)) d(depth)
    """,
)
def pipeline_depth_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — DepthPoint nodes with the conditional sensor_index key
    dimension (the reference's two MERGE shapes,
    graph_stations.py:45-66, as one nullable column) and the AT_DEPTH
    fan-out per station."""
    dp = P.build(spark, sf_dir, only=["depth_points"])["depth_points"]
    return dp.select(
        "serial_number",
        F.col("depth").cast("bigint").alias("depth"),
        F.col("sensor_index").cast("bigint").alias("sensor_index"),
        r4(F.col("y")).alias("y"),
    )


# ---------------------------------------------------------------------------
# Remaining §2 coverage: scalar family + agg family + set ops + melt
# ---------------------------------------------------------------------------


@register(
    "tz_offset_map",
    oracle="""
    SELECT tz,
           CASE lower(trim(tz))
                WHEN 'utc' THEN '+00:00'
                WHEN 'gmt' THEN '+00:00'
                WHEN 'europe/istanbul' THEN '+03:00'
                WHEN 'asia/istanbul' THEN '+03:00'
                WHEN 'turkey' THEN '+03:00'
                ELSE NULL END AS offset
    FROM (
      SELECT CASE CAST(c_custkey % 4 AS INT)
                  WHEN 0 THEN 'UTC' WHEN 1 THEN 'Europe/Istanbul'
                  WHEN 2 THEN 'America/New_York' ELSE 'GMT' END AS tz
      FROM customer
    )
    """,
)
def tz_offset_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — the reference's lossy tz→offset map (app/utils.py:34-43),
    replicated for parity; real pipelines use convert_timezone."""
    c = load_table(spark, sf_dir, "customer")
    tz = (
        F.when(F.col("c_custkey") % 4 == 0, F.lit("UTC"))
        .when(F.col("c_custkey") % 4 == 1, F.lit("Europe/Istanbul"))
        .when(F.col("c_custkey") % 4 == 2, F.lit("America/New_York"))
        .otherwise(F.lit("GMT"))
    )
    return c.select(tz.alias("tz")).withColumn("offset", S.tz_offset("tz"))


@register(
    "tz_zone_correct_offsets",
    oracle="""
    WITH t AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(o_orderdate AS TIMESTAMP) + INTERVAL 12 HOUR AS ts
      FROM orders),
    off AS (
      SELECT yr,
             date_diff('hour', ts, timezone('America/New_York', timezone('UTC', ts))) AS ny_off,
             date_diff('hour', ts, timezone('Europe/Istanbul', timezone('UTC', ts))) AS ist_off
      FROM t)
    SELECT yr, CAST(ny_off AS BIGINT) AS ny_off, CAST(ist_off AS BIGINT) AS ist_off,
           CAST(ist_off <> 3 AS BOOLEAN) AS ist_diverges_from_lossy_map,
           CAST(count(*) AS BIGINT) AS n
    FROM off GROUP BY 1, 2, 3, 4
    """,
)
def tz_zone_correct_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8's zone-CORRECT companion (SURVEY §7.4.5 "real zone conversion
    and document divergence"): DST-true conversion via Spark
    ``convert_timezone`` against DuckDB ICU ``timezone()``, grouped into
    per-year (zone-offset) distributions over orders noon timestamps.

    Divergence from the reference's lossy map (app/utils.py:34-43,
    replicated as `tz_offset_map`/F8), measured in the data itself:
    - America/New_York: the lossy map returns NULL; the zone-correct
      offset is -5 (EST) or -4 (EDT) depending on the date.
    - Europe/Istanbul: the lossy map hardcodes +03:00, but Turkey
      observed DST through 2016, so the 1992-1998 order dates split
      +2 (winter) / +3 (summer) — every +2 row is a date the reference
      would shift by a wrong hour. ``ist_diverges_from_lossy_map``
      flags them.
    Scale: pure Column expressions over one scan + one grouped agg."""
    o = load_table(spark, sf_dir, "orders")
    ts = F.to_timestamp_ntz(
        F.concat(F.date_format("o_orderdate", "yyyy-MM-dd"), F.lit(" 12:00:00"))
    )
    ny = F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"), ts)
    ist = F.convert_timezone(F.lit("UTC"), F.lit("Europe/Istanbul"), ts)
    return (
        o.select(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.timestamp_diff("HOUR", ts, ny).cast("bigint").alias("ny_off"),
            F.timestamp_diff("HOUR", ts, ist).cast("bigint").alias("ist_off"),
        )
        .withColumn("ist_diverges_from_lossy_map", F.col("ist_off") != 3)
        .groupBy("yr", "ny_off", "ist_off", "ist_diverges_from_lossy_map")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register(
    "datetime_components",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS year, CAST(month(o_orderdate) AS INT) AS month,
           CAST(day(o_orderdate) AS INT) AS day, CAST(hour(o_orderdate) AS INT) AS hour,
           CAST(minute(o_orderdate) AS INT) AS minute, CAST(second(o_orderdate) AS INT) AS second
    FROM orders
    """,
)
def datetime_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — datetime→component struct (Neo4j-export edge; app/utils.py:45-63),
    flattened for the oracle hash."""
    o = load_table(spark, sf_dir, "orders")
    comp = S.datetime_components("o_orderdate")
    return o.withColumn("comp", comp).select(
        "o_orderkey",
        F.col("comp.year").alias("year"), F.col("comp.month").alias("month"),
        F.col("comp.day").alias("day"), F.col("comp.hour").alias("hour"),
        F.col("comp.minute").alias("minute"), F.col("comp.second").alias("second"),
    )


@register(
    "epoch_seconds",
    oracle="""
    SELECT o_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def epoch_seconds_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F22 — epoch seconds from TimestampType (the reference's heterogenous
    temporal branching collapses after ingest,
    graph_product_application.py:179-197)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", S.epoch_seconds("o_orderdate").cast("bigint").alias("epoch_s")
    )


@register(
    "nutrient_alias_wide",
    oracle="""
    SELECT field_id,
           round(sum(CASE WHEN canon = 'total_nitrogen' THEN val END), 4) AS total_nitrogen,
           round(sum(CASE WHEN canon = 'total_potassium' THEN val END), 4) AS total_potassium,
           round(sum(CASE WHEN canon = 'total_carbon' THEN val END), 4) AS total_carbon
    FROM (
      SELECT o_custkey AS field_id,
             CASE CAST(o_orderkey % 4 AS INT)
                  WHEN 0 THEN 'total_nitrogen' WHEN 1 THEN 'total_potassium'
                  WHEN 2 THEN 'total_carbon' ELSE NULL END AS canon,
             o_totalprice AS val
      FROM orders
    )
    WHERE canon IS NOT NULL
    GROUP BY 1
    """,
)
def nutrient_alias_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12/F13 + A11 — nutrient alias→canonical mapping then wide pivot of
    total_* columns (graph_tnd_analysis.py:66-114). Alias spellings
    synthesized per row; the alias map resolves them; fixed pivot values so
    no discovery pass."""
    o = load_table(spark, sf_dir, "orders")
    raw_name = (
        F.when(F.col("o_orderkey") % 4 == 0, F.lit(" N "))
        .when(F.col("o_orderkey") % 4 == 1, F.lit("Potassium"))
        .when(F.col("o_orderkey") % 4 == 2, F.lit("carbon"))
        .otherwise(F.lit("mystery"))
    )
    rows = o.select(
        F.col("o_custkey").alias("field_id"),
        S.nutrient_canonical(S.mineral_norm(raw_name)).alias("canon"),
        F.col("o_totalprice").alias("val"),
    ).filter(F.col("canon").isNotNull())
    return (
        rows.groupBy("field_id")
        .pivot("canon", ["total_nitrogen", "total_potassium", "total_carbon"])
        .agg(r4(F.sum("val")))
    )


@register(
    "depth_diff",
    oracle="""
    SELECT p_partkey, CAST(p_size + 15 - p_size AS DOUBLE) AS sample_depth_cm
    FROM part
    """,
)
def depth_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19 — sample depth = ending − beginning (graph_haney_analysis.py:99-102)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        S.depth_diff((F.col("p_size") + 15), F.col("p_size")).alias("sample_depth_cm"),
    )


@register(
    "iso_z_parse",
    oracle="""
    SELECT raw, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS parsed
    FROM (SELECT strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || 'Z' AS raw, o_orderdate FROM orders)
    """,
)
def iso_z_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20 — 'Z'-suffixed ISO parse (graph_product_application.py:26-38)."""
    o = load_table(spark, sf_dir, "orders")
    raw = F.concat(F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z"))
    return o.select(raw.alias("raw")).withColumn(
        "parsed", F.date_format(S.iso_z_timestamp("raw"), "yyyy-MM-dd HH:mm:ss")
    )


@register(
    "area_normalized_sum",
    oracle="""
    SELECT unit, round(sum(CASE factor WHEN 0 THEN NULL ELSE val / factor END), 4) AS per_da, count(*) AS n
    FROM (
      SELECT CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'da' WHEN 1 THEN 'ha' WHEN 2 THEN 'm2' ELSE 'acre' END AS unit,
             CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 1.0 WHEN 1 THEN 10.0 WHEN 2 THEN 0.01 ELSE 0 END AS factor,
             value AS val
      FROM events
    )
    GROUP BY 1
    """,
)
def area_normalized_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 + A6 — area-unit normalization to decares with unconvertible
    units skipped (the _estimate_water_per_da_L heuristic,
    graph_application_event.py:38-85)."""
    ev = load_table(spark, sf_dir, "events")
    unit = (
        F.when(F.col("event_id") % 4 == 0, F.lit("da"))
        .when(F.col("event_id") % 4 == 1, F.lit("ha"))
        .when(F.col("event_id") % 4 == 2, F.lit("m2"))
        .otherwise(F.lit("acre"))
    )
    w = ev.select(unit.alias("unit"), F.col("value").alias("val"))
    per_da = F.col("val") / S.area_decare_factor("unit")
    return w.groupBy("unit").agg(
        r4(F.sum(per_da)).alias("per_da"), F.count(F.lit(1)).alias("n")
    )


@register(
    "capped_label_sample",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           array_to_string(list_sort(list_distinct(list(event_type)))[1:3], ',') AS sample
    FROM events GROUP BY 1
    """,
)
def capped_label_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/W3 — capped distinct sample per group (label samples capped at 20,
    graph_soil_layer.py:64-68; cap=3 here)."""
    ev = load_table(spark, sf_dir, "events")
    out = A.capped_sample(ev, ["user_id"], "event_type", cap=3)
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.array_join("sample", ",").alias("sample"),
    )


@register(
    "longest_label_pick",
    oracle="""
    SELECT o_custkey,
           min(o_orderpriority) FILTER (
             WHERE length(o_orderpriority) = maxlen) AS label
    FROM (
      SELECT o_custkey, o_orderpriority,
             max(length(o_orderpriority)) OVER (PARTITION BY o_custkey) AS maxlen
      FROM orders
    )
    GROUP BY o_custkey
    """,
)
def longest_label_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — prefer the longest label per group, min-string tiebreak for
    determinism (_pick_label, graph_soil_layer.py:45-51)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    maxlen = F.max(F.length("o_orderpriority")).over(w)
    return (
        o.withColumn("maxlen", maxlen)
        .filter(F.length("o_orderpriority") == F.col("maxlen"))
        .groupBy("o_custkey")
        .agg(F.min("o_orderpriority").alias("label"))
    )


@register(
    "intersect_types",
    oracle="""
    SELECT event_type FROM events WHERE user_id = 0
    INTERSECT
    SELECT event_type FROM events WHERE user_id = 1
    """,
)
def intersect_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — set intersection (discovered ∩ wanted measurement keys,
    graph_weather_day.py:178-186)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("user_id") == 0).select("event_type")
    b = ev.filter(F.col("user_id") == 1).select("event_type")
    return a.intersect(b)


@register(
    "except_types",
    oracle="""
    SELECT event_type FROM events
    EXCEPT
    SELECT event_type FROM events WHERE event_type IN ('error', 'view')
    """,
)
def except_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-family — EXCEPT set difference (the skip-if-seen anti-pattern as a
    set op, SURVEY §2.6 note): measurement keys minus an exclusion set."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type").distinct()
        .subtract(ev.filter(F.col("event_type").isin("error", "view")).select("event_type").distinct())
    )


@register(
    "wide_melt_roundtrip",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(ts, '%Y-%m-%d') AS day,
           event_type AS measurement,
           round(sum(value), 4) AS total
    FROM events
    WHERE event_type IN ('error', 'view', 'click')
    GROUP BY 1, 2, 3
    """,
)
def wide_melt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/A11 — wide sensor-key rows melted back to long format: pivot to
    wide (the reference's c167_110-style stat columns,
    graph_soil_layer.py:186,205-209) then `unpivot` (melt) back; the
    round-trip must be lossless."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("error", "view", "click")
    )
    wide = (
        ev.groupBy(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        )
        .pivot("event_type", ["error", "view", "click"])
        .agg(F.sum("value"))
    )
    long = wide.unpivot(
        ids=["user_id", "day"], values=["error", "view", "click"],
        variableColumnName="measurement", valueColumnName="total",
    ).filter(F.col("total").isNotNull())
    return long.select("user_id", "day", "measurement", r4(F.col("total")).alias("total"))


# ---------------------------------------------------------------------------
# Check jobs (S14 + §5.5), multimodal plumbing, and remaining P/S/F operators
# ---------------------------------------------------------------------------

from graph_db_spark import checks as CK  # noqa: E402
from graph_db_spark.operators import multimodal as MM  # noqa: E402
from graph_db_spark.operators import packing as PK  # noqa: E402


@register(
    "constraint_violations",
    oracle="""
    SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM orders
    GROUP BY 1, 2
    HAVING count(*) > 1
    """,
)
def constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14/§5.5 — composite-key uniqueness check as a data-quality job
    (the reference's CREATE CONSTRAINT DDL, graph_constraints.py:4-133,
    turned into an assertable violation set). Keyed (customer, day) over
    orders, which deliberately has collisions — the check must find them."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    )
    return CK.key_violations(o, ["o_custkey", "day"]).select(
        "o_custkey", "day", F.col("n_rows").cast("bigint").alias("n_rows")
    )


@register(
    "dangling_edge_check",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    )
    """,
)
def dangling_edge_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§5.5 — dangling-edge detection via left_anti join (the integrity
    breach the reference silently produces when writer key types disagree,
    SURVEY §2.10.3-4). Node set restricted to status-'F' orders so the
    check provably finds the dangling remainder."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    nodes = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return CK.dangling_edges(li, nodes, ["l_orderkey"], ["o_orderkey"])


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id, 'image' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash,
           CAST(CASE WHEN octet_length(encode(text)) > 0 THEN 1 ELSE 0 END AS BIGINT) AS feature_ok
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing — opaque binary media column through the
    ``mapInPandas`` feature extractor (Arrow batches, binary dropped on
    output). This entry checks the byte-level plumbing path (fake decoder);
    the REAL PNG decoder is oracle-checked by multimodal_png_decode."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_media_from_documents(docs)
    feats = MM.extract_features(media, fake=True)
    return feats.select("media_id", "kind", "n_bytes", "content_hash", "feature_ok")


@register(
    "multimodal_png_decode",
    oracle="""
    SELECT d.doc_id AS media_id,
           CAST(4 AS BIGINT) AS width,
           CAST(4 AS BIGINT) AS height,
           round(avg(CAST((d.doc_id * 7 + t.i * 13) % 256 AS DOUBLE)), 4) AS mean_px,
           CAST(1 AS BIGINT) AS feature_ok
    FROM documents d CROSS JOIN generate_series(0, 15) t(i)
    GROUP BY d.doc_id
    """,
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — REAL image decode, end to end: per document a genuine
    8-bit grayscale PNG is encoded (stdlib zlib) with pixel i = (doc_id*7 +
    i*13) % 256, shipped as an opaque binary column, and decoded back by
    the pure-Python PNG decoder (operators/multimodal.py) inside
    Arrow-batched ``mapInPandas``. Because the pixel function is closed
    form, DuckDB recomputes the decoded mean analytically — the oracle
    verifies the DECODER, not just the plumbing. Binary column never
    shuffles (features extracted in the same stage that synthesized it)."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_png_media(docs, width=4, height=4)
    feats = MM.extract_features(media, fake=False)
    return feats.select(
        "media_id", "width", "height", r4(F.col("mean_px")).alias("mean_px"), "feature_ok"
    )


@register(
    "multimodal_audio_features",
    oracle="""
    WITH s AS (
      SELECT d.doc_id, t.i,
             ((d.doc_id * 31 + t.i * 17) % 201) - 100 AS v
      FROM documents d CROSS JOIN generate_series(0, 63) t(i)
    ), z AS (
      SELECT doc_id, i, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM s
    )
    SELECT doc_id AS media_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(64 AS BIGINT) AS n_samples,
           CAST(8 AS BIGINT) AS duration_ms,
           round(sqrt(avg(CAST(v * v AS DOUBLE))), 4) AS rms,
           CAST(sum(CASE WHEN (v >= 0) <> (pv >= 0) THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_crossings,
           CAST(1 AS BIGINT) AS feature_ok
    FROM z GROUP BY doc_id
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — REAL audio decode end to end: per document a genuine
    PCM16 mono RIFF/WAVE file (sample i = ((doc_id*31 + i*17) % 201) - 100,
    8 kHz) is encoded, shipped as an opaque binary column, and decoded back
    by the pure-stdlib WAV parser inside Arrow-batched ``mapInPandas``
    (operators/multimodal.py). RMS energy and zero-crossing count are
    closed-form, so DuckDB recomputes them analytically — the oracle
    verifies the DECODER and the feature math, not just the plumbing.
    Parity: the reference stores no media, but its opaque-payload pattern
    (JSON props columns, graph_fields.py) is the same bytes-stay-opaque
    contract."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_wav_media(docs, n_samples=64, rate=8000)
    feats = MM.extract_audio_features(media)
    return feats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        "duration_ms",
        r4(F.col("rms")).alias("rms"),
        "zero_crossings",
        "feature_ok",
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT d.doc_id AS media_id,
           CAST(f.f AS BIGINT) AS frame_idx,
           CAST(4 AS BIGINT) AS width,
           CAST(4 AS BIGINT) AS height,
           round(avg(CAST((d.doc_id * 11 + f.f * 5 + t.i * 13) % 256 AS DOUBLE)), 4)
             AS mean_px,
           CAST(1 AS BIGINT) AS feature_ok
    FROM documents d
    CROSS JOIN (VALUES (0), (2), (4)) f(f)
    CROSS JOIN generate_series(0, 15) t(i)
    GROUP BY d.doc_id, f.f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — video frame sampling: every 2nd frame of a 6-frame
    raw-gray container (pixel i of frame f = (doc_id*11 + f*5 + i*13) %
    256), one OUTPUT row per sampled frame — ``mapInPandas`` with
    row-expanding batches (frame extraction is a generator, not a map; the
    binary column never leaves the stage). Per-frame means are closed-form
    ⇒ exact oracle. Real containers (MP4) need codec libs absent here; the
    container is synthetic, the distributed sampling plumbing is real."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_rawv_media(docs, width=4, height=4, n_frames=6)
    frames = MM.sample_video_frames(media, every=2)
    return frames.select(
        "media_id",
        "frame_idx",
        "width",
        "height",
        r4(F.col("mean_px")).alias("mean_px"),
        "feature_ok",
    )


@register(
    "multimodal_resize",
    oracle="""
    SELECT d.doc_id AS media_id,
           CAST(2 AS BIGINT) AS width,
           CAST(2 AS BIGINT) AS height,
           round(avg(CAST((d.doc_id * 7 + t.i * 13) % 256 AS DOUBLE)), 4) AS mean_px,
           CAST(1 AS BIGINT) AS feature_ok
    FROM documents d CROSS JOIN (VALUES (0), (2), (8), (10)) t(i)
    GROUP BY d.doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal — image resize as a composable media→media pipeline
    stage: encode a real 4×4 gray PNG per document (pixel i = (doc_id*7 +
    i*13) % 256), nearest-neighbor downsample to 2×2 (target (x,y) reads
    source (x*4//2, y*4//2) ⇒ sources i ∈ {0,2,8,10}), re-encode PNG, then
    decode AGAIN with the feature extractor — a full
    encode→decode→resample→encode→decode round trip through two
    Arrow-batched ``mapInPandas`` stages, with the resized mean recomputed
    analytically by the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.synthesize_png_media(docs, width=4, height=4)
    small = MM.resize_png_batch(media, out_w=2, out_h=2)
    feats = MM.extract_features(small, fake=False)
    return feats.select(
        "media_id",
        "width",
        "height",
        r4(F.col("mean_px")).alias("mean_px"),
        "feature_ok",
    )


@register(
    "benchmark_decontamination",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), gl AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(w) - 2, 0)),
                                          i -> array_to_string(w[i+1:i+3], ' '))) AS grams
      FROM words
    ), grams AS (
      SELECT doc_id, unnest(grams) AS gram FROM gl
    ), eval_g AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 17 = 0
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM grams g JOIN eval_g e USING (gram)
    WHERE g.doc_id % 17 <> 0
    GROUP BY g.doc_id
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data decontamination — the n-gram-collision test of the
    GPT-3/PaLM data papers: a corpus document is contaminated if any of its
    word n-grams appears in the held-out benchmark set (here: docs with
    doc_id % 17 == 0 stand in for the benchmark; n=3 sized to the ~50-word
    fixture docs, production web text uses 8-13). Plan: distinct grams per
    doc via pure Column exprs (transform+slice, codegen), benchmark grams
    — dimension-small by construction, eval suites are tiny vs a 100 TB
    corpus — broadcast to the corpus gram stream; one aggregation per doc.
    The corpus side never self-joins and never shuffles text."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(TX.word_ngrams(F.col("text"), 3)).alias("gram")
    )
    eval_g = grams.filter(F.col("doc_id") % 17 == 0).select("gram").distinct()
    corpus = grams.filter(F.col("doc_id") % 17 != 0)
    return (
        corpus.join(F.broadcast(eval_g), on="gram")
        .groupBy("doc_id")
        # grams are already distinct per doc ⇒ count(*) = distinct shared
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_grams"))
    )


@register(
    "sequence_packing",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS nt
      FROM documents
    ), ord AS (
      SELECT doc_id, lang, nt,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM toks
    ), rec AS (
      SELECT lang, rn, doc_id, nt, 0 AS bin_id, nt AS acc
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.lang, o.rn, o.doc_id, o.nt,
             CASE WHEN r.acc + o.nt > 256 THEN r.bin_id + 1 ELSE r.bin_id END,
             CASE WHEN r.acc + o.nt > 256 THEN o.nt ELSE r.acc + o.nt END
      FROM rec r JOIN ord o ON o.lang = r.lang AND o.rn = r.rn + 1
    )
    SELECT doc_id, lang, CAST(nt AS BIGINT) AS n_tokens,
           CAST(bin_id AS BIGINT) AS bin_id
    FROM rec
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data sequence packing — greedy token-budget (256) bin
    packing per language stream. The reset-at-overflow cumulative fold has
    no window-function form, so it runs as ``applyInPandas`` per stream
    (parallel across streams, linear within — at 100 TB streams are input
    shards, never a global order). The oracle replays the same fold as a
    DuckDB recursive CTE over row_number — an exact check of genuinely
    sequential semantics."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", TX.token_count("text").cast("long").alias("n_tokens")
    )
    packed = PK.pack_sequences(
        toks, stream_col="lang", order_col="doc_id", tokens_col="n_tokens", budget=256
    )
    return packed.select("doc_id", "lang", "n_tokens", "bin_id")


@register(
    "stratified_sample",
    oracle="""
    WITH rates(lang, rate) AS (VALUES ('en', 10), ('de', 30), ('es', 30),
                                      ('fr', 30), ('zh', 30))
    SELECT d.doc_id, d.lang,
           CAST(len(string_split_regex(lower(trim(d.text)), '\\s+')) AS BIGINT)
             AS n_tokens
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE (d.doc_id * 2654435761) % 100 < r.rate
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data stratified sampling — per-language keep rates (the
    standard down-sample-the-head / keep-the-tail mixture move) decided by
    a DETERMINISTIC multiplicative hash of the id, not rand(): the sample
    is reproducible across runs, engines and retries (a shuffle replay
    never changes membership — rand() sampling breaks exactly-once
    semantics under task retry). The rate map is a literal (broadcast by
    construction); the corpus is filtered in one narrow pass."""
    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 10, "de": 30, "es": 30, "fr": 30, "zh": 30}
    rate_map = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])
    return docs.select(
        "doc_id",
        "lang",
        TX.token_count("text").cast("bigint").alias("n_tokens"),
        ((F.col("doc_id") * F.lit(2654435761)) % 100).alias("__h"),
    ).filter(F.col("__h") < rate_map[F.col("lang")]).drop("__h")


def _dsir_oracle_sql(n_buckets: int = 256, k: int = 50) -> str:
    """DSIR replay: same whitespace tokens, same md5-window hash mod
    ``n_buckets``, Laplace-smoothed bucket distributions, identical
    log-ratio formula (division/paren structure matters for float
    parity), per-doc sum, top-k. ``round(w,4) + 0.0`` pins the -0.0
    sign for near-zero weights (r5 lesson)."""
    h = _poly_sql("t")
    return f"""
    WITH tok AS (
      SELECT doc_id, lang, t FROM (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
        FROM documents) WHERE t <> ''
    ),
    hb AS (SELECT doc_id, lang, {h} % {n_buckets} AS b FROM tok),
    tgt AS (SELECT b, count(*) AS ct FROM hb WHERE lang <> 'en' GROUP BY b),
    rawp AS (SELECT b, count(*) AS cr FROM hb WHERE lang = 'en' GROUP BY b),
    tots AS (SELECT (SELECT count(*) FROM hb WHERE lang <> 'en') AS nt,
                    (SELECT count(*) FROM hb WHERE lang = 'en') AS nr),
    lr AS (SELECT r.b,
             ln(((coalesce(t.ct, 0) + 1.0) / (tots.nt + {n_buckets}.0))
                / ((coalesce(w.cr, 0) + 1.0) / (tots.nr + {n_buckets}.0))) AS lw
           FROM range(0, {n_buckets}) r(b)
           LEFT JOIN tgt t ON r.b = t.b
           LEFT JOIN rawp w ON r.b = w.b
           CROSS JOIN tots),
    scored AS (SELECT hb.doc_id, count(*) AS n_tok, sum(lr.lw) AS w
               FROM hb JOIN lr ON hb.b = lr.b
               WHERE hb.lang = 'en' GROUP BY hb.doc_id)
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           round(w, 4) + 0.0 AS dsir_logweight
    FROM scored ORDER BY w DESC, doc_id LIMIT {k}
    """


@register("dsir_selection", oracle=_dsir_oracle_sql())
def dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data selection via hashed-n-gram importance resampling
    (DSIR — Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): estimate target/raw token-bucket
    distributions with ``n_buckets`` hashed features + Laplace
    smoothing, score every raw-pool document by its summed bucket
    log-ratio, and take the top-k most target-like. Here the target
    domain is the non-English documents and the raw pool is English —
    the canonical "select from the big pool what looks like the small
    domain" shape. The selection itself is `weighted_sample_docs`-style
    deterministic top-k (no rand(): retry-safe, oracle-replayable).

    Scale shape: one explode→hash pass over the corpus (linear in
    tokens), two 256-row distribution aggregates, a BROADCAST join of
    the 256-entry log-ratio table back onto the token stream, one
    per-doc sum, TakeOrdered top-k. Nothing quadratic, nothing
    driver-side beyond the k rows; the same plan at 100 TB is one
    map-side-combined shuffle per distribution + one for the doc sum."""
    from graph_db_spark.operators.dedup import portable_hash

    B = 256
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", "lang", F.explode(TX.tokens("text")).alias("t"))
        .filter(F.col("t") != "")
        .select("doc_id", "lang", (portable_hash(F.col("t")) % B).alias("b"))
    )
    tgt = tok.filter(F.col("lang") != "en").groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    rawp = tok.filter(F.col("lang") == "en").groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    # totals ride a 1-row broadcast (the scalar-probe idiom) — a global
    # window over the bucket table would single-partition it
    tots = tgt.agg(F.sum("ct").alias("nt")).crossJoin(rawp.agg(F.sum("cr").alias("nr")))
    buckets = (
        spark.range(B).select(F.col("id").cast("bigint").alias("b"))
        .join(tgt, on="b", how="left")
        .join(rawp, on="b", how="left")
        .crossJoin(F.broadcast(tots))
    )
    lr = buckets.select(
        "b",
        F.log(
            ((F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("nt") + F.lit(float(B))))
            / ((F.coalesce(F.col("cr"), F.lit(0)) + 1.0) / (F.col("nr") + F.lit(float(B))))
        ).alias("lw"),
    )
    scored = (
        tok.filter(F.col("lang") == "en")
        .join(F.broadcast(lr), on="b")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tok"), F.sum("lw").alias("w"))
    )
    return (
        scored.orderBy(F.desc("w"), "doc_id")
        .limit(50)
        .select("doc_id", "n_tok", r4(F.col("w")).alias("dsir_logweight"))
    )


@register(
    "mixture_weights",
    oracle="""
    WITH toks AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY lang
    )
    SELECT lang, n_docs, n_tokens,
           round(n_tokens * 1.0 / (SELECT sum(n_tokens) FROM toks), 4) AS current_share,
           round(0.2 * (SELECT sum(n_tokens) FROM toks) / n_tokens, 4) AS sample_rate,
           CAST(CASE WHEN 0.2 * (SELECT sum(n_tokens) FROM toks) / n_tokens > 1.0
                     THEN 1 ELSE 0 END AS BIGINT) AS needs_upsampling
    FROM toks
    """,
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixture planning — given a target mixture (uniform
    share per language here), compute each stratum's current token share
    and the sampling rate that hits the target: rate = target·Σtokens /
    stratum_tokens; rate > 1 flags strata that need upsampling
    (repetition). One aggregation + a total via window — the whole plan is
    |strata|-sized after the first combine, nothing driver-side."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(TX.token_count("text")).cast("bigint").alias("n_tokens"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    rate = F.lit(0.2) * total / F.col("n_tokens")
    return toks.select(
        "lang",
        "n_docs",
        "n_tokens",
        r4(F.col("n_tokens") / total).alias("current_share"),
        r4(rate).alias("sample_rate"),
        F.when(rate > 1.0, 1).otherwise(0).cast("bigint").alias("needs_upsampling"),
    )


@register(
    "fallback_selection",
    oracle="""
    SELECT user_id, event_type, n FROM (
      SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
             CAST(count(*) AS BIGINT) AS n,
             CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS pri,
             max(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS mx
      FROM events GROUP BY user_id, event_type
    ) WHERE pri = mx
    """,
)
def fallback_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — conditional fallback selection, per group and fully declarative:
    prefer the wanted measurement set; groups where it is empty fall back to
    everything (the reference's filtered→unfiltered discovery fallback,
    graph_weather_day.py:197, graph_soil_layer.py:82-118 — done there with
    a driver-side if-empty re-query)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.col("user_id").cast("bigint").alias("user_id"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    pri = F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
    w = Window.partitionBy("user_id")
    return (
        counts.withColumn("pri", pri)
        .withColumn("mx", F.max("pri").over(w))
        .filter(F.col("pri") == F.col("mx"))
        .select("user_id", "event_type", "n")
    )


@register(
    "data_field_discovery",
    oracle="""
    SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id, event_type
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
    """,
)
def data_field_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 — data-field discovery scan: which measurement keys exist per
    device in a window (``_get_data_fields``, graph_soil_layer.py:82-118) —
    a distinct() over the pushed-down time-range scan."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
        )
        .select(F.col("user_id").cast("bigint").alias("user_id"), "event_type")
        .distinct()
    )


@register(
    "ineq_trimmed_float",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(coalesce(
             TRY_CAST(raw AS DOUBLE),
             TRY_CAST(regexp_replace(raw, '^[<>=\\s]+', '') AS DOUBLE)
           ), 4) AS val
    FROM (
      SELECT l_orderkey, l_linenumber,
             CASE CAST(l_linenumber % 4 AS INT)
                  WHEN 0 THEN CAST(l_quantity AS VARCHAR)
                  WHEN 1 THEN '<' || CAST(l_quantity AS VARCHAR)
                  WHEN 2 THEN '>= ' || CAST(l_quantity AS VARCHAR)
                  ELSE 'n/a' END AS raw
      FROM lineitem
    )
    """,
)
def ineq_trimmed_float_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — inequality-trimmed float parse: plain cast, else strip leading
    ``<>=`` and retry (graph_tnd_analysis.py:24-37)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("string")
    raw = (
        F.when(F.col("l_linenumber") % 4 == 0, qty)
        .when(F.col("l_linenumber") % 4 == 1, F.concat(F.lit("<"), qty))
        .when(F.col("l_linenumber") % 4 == 2, F.concat(F.lit(">= "), qty))
        .otherwise(F.lit("n/a"))
    )
    return li.select(
        "l_orderkey", "l_linenumber", r4(S.ineq_trimmed_float(raw)).alias("val")
    )


@register(
    "json_encode_props",
    oracle="""
    SELECT o_orderkey,
           '{"k":' || CAST(o_orderkey AS VARCHAR) || ',"s":"' || o_orderstatus || '"}' AS packed
    FROM orders
    """,
)
def json_encode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 — JSON-encode packed structures at the export edge
    (``json.dumps`` of wetting-depth structures,
    graph_irrigation_event.py:33-41; engine keeps native structs internally
    and emits JSON only here)."""
    o = load_table(spark, sf_dir, "orders")
    packed = S.json_encode(
        F.struct(F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("s"))
    )
    return o.select("o_orderkey", packed.alias("packed"))


@register(
    "asof_bucketed_line",
    oracle="""
    SELECT o_orderkey, l_linenumber, ship_day FROM (
      SELECT o.o_orderkey, l.l_linenumber,
             strftime(l.l_shipdate, '%Y-%m-%d') AS ship_day,
             row_number() OVER (
               PARTITION BY o.o_orderkey
               ORDER BY abs(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)),
                      l.l_linenumber, l.l_shipdate
             ) AS rn
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         AND abs(epoch(l.l_shipdate) - epoch(o.o_orderdate)) <= 90 * 86400
    ) WHERE rn = 1
    """,
)
def asof_bucketed_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 scale path — tolerance-bounded as-of via (key, coarse-time-bucket)
    equi-join (SURVEY §7.4.2): candidate fan-out per row is bounded by
    right-rows-per-3·tolerance regardless of per-key history. Equivalence
    to the naive join-then-rank is property-tested
    (tests/test_property.py)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_shipdate"
    )
    out = J.asof_join_bucketed(
        o, li, on=["o_orderkey"], left_ts="o_orderdate", right_ts="l_shipdate",
        tolerance_seconds=90 * 86400,
        tiebreak_cols=["l_linenumber", "l_shipdate"],
    )
    return out.filter(F.col("l_linenumber").isNotNull()).select(
        "o_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
    )


# ---------------------------------------------------------------------------
# Streaming entries — availableNow runs of the Structured Streaming jobs;
# stream result == batch result on static input, so both are oracle-checked.
# ---------------------------------------------------------------------------

from graph_db_spark.streaming import jobs as STRM  # noqa: E402


import threading as _threading
from contextlib import contextmanager as _contextmanager

_STREAM_PARTS_LOCK = _threading.Lock()


@_contextmanager
def _stream_state_partitions(spark, n: int = 8):
    """Run a streaming job with a reduced shuffle-partition count — the
    stateful operators (stream-stream joins, windowed aggs, dedup) open
    one state store PER shuffle partition, and at fixture scale the
    per-store open/commit overhead dominates (measured: the full-outer
    interval join 8.8s at 32 partitions -> 4.5s at 8, min-of-2 sf0.1).
    On a real cluster the right number tracks executor count x state
    volume; here it is a fixed small constant. Serialized behind a lock
    and restored in finally, same discipline as the AQE toggle
    (graph/algorithms.py:_aqe_off); partition count never changes
    RESULTS, only state-store fan-out."""
    with _STREAM_PARTS_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def _run_stream_to_table(spark, sf_dir, name, transform, table="events", mode="complete"):
    """Run a streaming job over a (static) fixture table with
    trigger(availableNow) into a memory sink; return the result table.
    The fixture is re-written to a temp dir because the file streaming
    source wants a directory of (already ns→µs-converted) files."""
    import os
    import tempfile

    batch = load_table(spark, sf_dir, table)
    d = os.path.join(
        tempfile.gettempdir(),
        f"graft_stream_{name}_{_sf_tag(sf_dir)}",
    )
    batch.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(batch.schema).parquet(d)
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
    "streaming_daily_stats",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(user_id AS BIGINT) AS user_id,
           event_type,
           round(avg(value), 4) AS data,
           round(min(value), 4) AS min,
           round(max(value), 4) AS max,
           round(avg(value), 4) AS avg,
           round(sum(value), 4) AS sum,
           CAST(count(value) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def streaming_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 streaming — tumbling 1-day windowed stats via Structured
    Streaming (watermark wide enough that the static fixture drops nothing);
    on static input the stream result equals the batch A1 aggregation, so
    the same DuckDB oracle applies."""
    out = _run_stream_to_table(
        spark, sf_dir, "daily_stats",
        lambda s: STRM.stream_daily_stats(s, watermark="3650 days"),
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
    "streaming_sliding_counts",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL 2 HOURS, ts) - k.k * INTERVAL 2 HOURS
               AS window_start,
             event_type, value
      FROM events CROSS JOIN (VALUES (0), (1), (2)) k(k)
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(window_start + INTERVAL 6 HOURS, '%Y-%m-%d %H:%M:%S')
             AS window_end,
           event_type,
           CAST(count(value) AS BIGINT) AS n,
           round(sum(value), 4) AS sum_value
    FROM assigned GROUP BY 1, 2, 3
    """,
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 streaming — SLIDING 6h-window / 2h-slide per-type counts via
    Structured Streaming (complete mode over the static fixture, the same
    runner as streaming_daily_stats). The oracle replays Spark's window
    assignment arithmetic exactly: every event belongs to the w/s = 3
    epoch-aligned windows starting at time_bucket_2h(t) − k·2h, k∈{0,1,2}
    — so the overlap semantics, not just the totals, are hash-checked.
    Tumbling (streaming_daily_stats) is the s = w special case."""
    out = _run_stream_to_table(
        spark, sf_dir, "sliding_counts",
        lambda s: STRM.stream_sliding_counts(s, watermark="3650 days"),
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        r4(F.col("sum_value")).alias("sum_value"),
    )


@register(
    "streaming_exact_dedup",
    oracle="""
    SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
    FROM documents
    """,
)
def streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 streaming × LLM ops — in-flight exact dedup: documents stream
    through ``dropDuplicates`` on the normalized-content hash, so only the
    first copy of each text ever lands (the ingest-time half of the dedup
    story; the batch near_dup_clusters sweep is the at-rest half). The
    surviving hash SET is deterministic even though which doc_id survives
    per hash is arrival-order-dependent — the oracle checks exactly the
    deterministic part."""
    out = _run_stream_to_table(
        spark, sf_dir, "exact_dedup",
        lambda s: STRM.stream_exact_dedup(s, "text"),
        table="documents", mode="append",
    )
    return out.select("content_hash")


@register(
    "streaming_decontamination",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), gl AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(w) - 2, 0)),
                                          i -> array_to_string(w[i+1:i+3], ' '))) AS grams
      FROM words
    ), eval_g AS (
      SELECT DISTINCT unnest(grams) AS gram FROM gl WHERE doc_id % 17 = 0
    ), ev AS (
      SELECT list(gram) AS eg FROM eval_g
    )
    SELECT g.doc_id,
           len(list_intersect(g.grams, ev.eg)) > 0 AS contaminated
    FROM gl g CROSS JOIN ev WHERE g.doc_id % 17 <> 0
    """,
)
def streaming_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 streaming × LLM ops — ingest-time decontamination: corpus
    documents stream past a broadcast eval-set gram array and get a
    per-row contaminated flag via ``arrays_overlap`` (stateless, append
    mode — the in-flight complement of the batch
    ``benchmark_decontamination`` aggregation). Same eval split as the
    batch query (doc_id % 17 == 0 is the held-out benchmark)."""
    docs = load_table(spark, sf_dir, "documents")
    eval_arr = (
        docs.filter(F.col("doc_id") % 17 == 0)
        .select(F.explode(TX.word_ngrams(F.col("text"), 3)).alias("g"))
        .agg(F.collect_set("g").alias("eval_grams"))
    )
    out = _run_stream_to_table(
        spark, sf_dir, "decontam",
        lambda s: STRM.stream_decontaminate(
            s.filter(F.col("doc_id") % 17 != 0), eval_arr
        ),
        table="documents", mode="append",
    )
    return out.select("doc_id", "contaminated")


@register(
    "curated_corpus_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text,
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok
      FROM documents
    ), scored AS (
      SELECT doc_id, text, n_tok,
             round((least(n_tok / 50.0, 1.0)
                    + (1.0 - least(((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) * 1.0
                                    / nullif(length(text), 0)) * 5.0, 1.0))
                    + least((len(list_distinct(list_intersect(t, {_SW_SQL['en']})))
                             + len(list_distinct(list_intersect(t, {_SW_SQL['es']})))
                             + len(list_distinct(list_intersect(t, {_SW_SQL['de']})))) / 5.0, 1.0)) / 3.0, 4) AS quality,
             CASE WHEN greatest(len(list_distinct(list_intersect(t, {_SW_SQL['en']}))),
                               len(list_distinct(list_intersect(t, {_SW_SQL['es']}))),
                               len(list_distinct(list_intersect(t, {_SW_SQL['de']})))) = 0 THEN 'und'
                  WHEN len(list_distinct(list_intersect(t, {_SW_SQL['en']})))
                       = greatest(len(list_distinct(list_intersect(t, {_SW_SQL['es']}))),
                                  len(list_distinct(list_intersect(t, {_SW_SQL['de']}))),
                                  len(list_distinct(list_intersect(t, {_SW_SQL['en']})))) THEN 'en'
                  WHEN len(list_distinct(list_intersect(t, {_SW_SQL['es']})))
                       = greatest(len(list_distinct(list_intersect(t, {_SW_SQL['es']}))),
                                  len(list_distinct(list_intersect(t, {_SW_SQL['de']})))) THEN 'es'
                  ELSE 'de' END AS pred_lang
      FROM toks
    ), kept AS (
      SELECT * FROM scored WHERE quality >= 0.4 AND pred_lang <> 'und'
    ), dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
          ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    )
    SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(quality), 4) AS avg_quality,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM dedup GROUP BY 1
    """,
)
def curated_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM ops — the corpus-curation pipeline END TO END as one verified
    query: quality scoring + language ID filter (drop 'und' and
    quality < 0.4) → exact dedup keeping the min doc_id per normalized
    content hash → per-language corpus stats. This is the shape of a real
    pretraining-data prep job (filter → dedup → budget accounting), every
    stage of which is individually oracle-verified elsewhere; this entry
    verifies the COMPOSITION."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        "text",
        TX.quality_score("text").alias("quality"),
        TX.lang_id("text").alias("pred_lang"),
        TX.token_count("text").alias("n_tok"),
        F.md5(TX.normalize_text(F.col("text"))).alias("content_hash"),
    )
    kept = enriched.filter((F.round(F.col("quality"), 4) >= 0.4) & (F.col("pred_lang") != "und"))
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    dedup = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return dedup.groupBy("pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        r4(F.avg(F.round(F.col("quality"), 4))).alias("avg_quality"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
    )


@register(
    "streaming_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_at,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_at,
           round((epoch_us(max(ts)) - epoch_us(min(ts))) / 60000000.0, 4) AS duration_min,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 streaming — session_window sessionization (gap 30min) via
    Structured Streaming; equals the batch lag+cumsum intervals on static
    input, so the batch sessionization oracle applies (minus session_id,
    which streaming doesn't number)."""
    out = _run_stream_to_table(
        spark, sf_dir, "sessions",
        lambda s: STRM.stream_sessions(s, gap="30 minutes", watermark="3650 days"),
    )
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        _fmt_ts(F.col("start_at")).alias("start_at"),
        _fmt_ts(F.col("end_at")).alias("end_at"),
        r4(F.col("duration_min")).alias("duration_min"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


@register(
    "conditional_edge_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_partkey
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name IS NOT NULL AND trim(p.p_name) <> ''
      AND p.p_brand IS NOT NULL AND trim(p.p_brand) <> ''
      AND p.p_size >= 25
    """,
)
def conditional_edge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/P6 — conditional edge creation: the edge exists only when the
    endpoint passes a predicate (Cypher ``CALL { WITH ... WHERE }`` guard,
    ProductApplication→FertilizerProduct only when name+brand non-null,
    /root/reference/app/graph_app_nutrient_content.py:154-162). A filtered
    broadcast join; the filter prunes the build side before broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").isNotNull() & (F.trim("p_name") != "")
        & F.col("p_brand").isNotNull() & (F.trim("p_brand") != "")
        & (F.col("p_size") >= 25)
    )
    return li.join(
        F.broadcast(p), on=li["l_partkey"] == p["p_partkey"], how="inner"
    ).select("l_orderkey", "l_linenumber", "p_partkey")


@register(
    "window_widened_scan",
    oracle="""
    SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08' - INTERVAL 7 DAY
      AND ts <  TIMESTAMP '2024-01-10' + INTERVAL 1 DAY
    """,
)
def window_widened_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — interval scan with boundary widening (−7d/+1d so events
    straddling the window edge are re-processed idempotently,
    /root/reference/app/graph_irrigation_event.py:43-75, widening :52-53).
    The widened predicate still pushes into the scan / prunes partitions."""
    ev = load_table(spark, sf_dir, "events")
    start, end = F.lit("2024-01-08").cast("timestamp"), F.lit("2024-01-10").cast("timestamp")
    return ev.filter(
        (F.col("ts") >= start - F.expr("INTERVAL 7 DAYS"))
        & (F.col("ts") < end + F.expr("INTERVAL 1 DAYS"))
    ).select(
        "event_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        _fmt_ts(F.col("ts")).alias("ts"),
    )


@register(
    "motif_4hop_counts",
    oracle="""
    WITH edges AS (
      SELECT concat('R:', n_regionkey) AS src, concat('N:', n_nationkey) AS dst, 'HAS_NATION' AS rel_type FROM nation
      UNION ALL
      SELECT concat('N:', c_nationkey), concat('C:', c_custkey), 'HAS_CUSTOMER' FROM customer
      UNION ALL
      SELECT concat('C:', o_custkey), concat('O:', o_orderkey), 'HAS_ORDER' FROM orders
      UNION ALL
      SELECT concat('O:', l_orderkey), concat('L:', l_orderkey, ':', l_linenumber), 'HAS_LINE' FROM lineitem
    )
    SELECT e1.src AS region, CAST(count(*) AS BIGINT) AS n_paths
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst AND e2.rel_type = 'HAS_CUSTOMER'
    JOIN edges e3 ON e3.src = e2.dst AND e3.rel_type = 'HAS_ORDER'
    JOIN edges e4 ON e4.src = e3.dst AND e4.rel_type = 'HAS_LINE'
    WHERE e1.rel_type = 'HAS_NATION'
    GROUP BY 1
    """,
)
def motif_4hop_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph layer — 4-hop typed motif traversal
    Region→Nation→Customer→Order→Line with per-region path counts (the
    Field→Station→WeatherDay chain shape, SURVEY §1.3, two hops deeper).
    Each hop is one equi-join on vertex id; Catalyst chains them without
    materializing intermediate paths."""
    g = build_graph(spark, sf_dir)
    path = g.motif_path(["HAS_NATION", "HAS_CUSTOMER", "HAS_ORDER", "HAS_LINE"])
    first = path.columns[0]
    return (
        path.groupBy(F.col(first).alias("region"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    )


@register(
    "dynamic_measurement_pivot",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(ts, '%Y-%m-%d') AS day,
           round(sum(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
           round(sum(CASE WHEN event_type = 'error' THEN value END), 4) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase,
           round(sum(CASE WHEN event_type = 'signup' THEN value END), 4) AS signup,
           round(sum(CASE WHEN event_type = 'view' THEN value END), 4) AS view
    FROM events
    GROUP BY 1, 2
    """,
)
def dynamic_measurement_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4.1.4 — dynamic measurement pivot: the wide per-measurement property
    columns whose names the reference resolves at runtime
    (graph_weather_day.py:53-67,235-248). Two passes: (1) discover the
    measurement keys (tiny distinct → driver), (2) pivot with the explicit
    value list (skips Spark's own discovery job and keeps the plan
    deterministic). At unbounded key cardinality the engine stores MapType
    instead (pipeline_weather_day_metrics) — this is the bounded-key path.
    """
    ev = load_table(spark, sf_dir, "events")
    keys = sorted(
        r["event_type"] for r in ev.select("event_type").distinct().collect()
    )
    return (
        ev.groupBy(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        )
        .pivot("event_type", keys)
        .agg(r4(F.sum("value")))
    )


# ---------------------------------------------------------------------------
# Grouping analytics — ROLLUP / CUBE / GROUPING SETS (absent in the
# reference, free in Spark per SURVEY.md §2.4; exposed as first-class
# engine surface. One shuffle each: Expand multiplies rows by the number
# of grouping sets BEFORE the exchange, and map-side partial aggregation
# collapses the expansion, so the shuffle stays O(distinct groups).)
# ---------------------------------------------------------------------------


@register(
    "rollup_pricing",
    oracle="""
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals over the pricing summary: (flag, status) →
    (flag) → (). grouping_id disambiguates real NULL group values from
    subtotal rows; the non-null TPC-H columns also get a '<all>' sentinel
    so both sides hash identically."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            r4(F.sum("l_quantity")).alias("sum_qty"),
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_price"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "gid",
            "sum_qty",
            "sum_disc_price",
            "n",
        )
    )


@register(
    "cube_order_counts",
    oracle="""
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^k marginal totals over (status, priority) in one pass — the
    Expand operator emits each input row once per grouping set and the
    partial aggregation collapses them pre-shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            r4(F.sum("o_totalprice")).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n",
            "total",
        )
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT coalesce(n_name, '<all>') AS nation,
           coalesce(strftime(o_orderdate, '%Y') , '<all>') AS year,
           CAST(grouping(n_name) * 2 + grouping(strftime(o_orderdate, '%Y')) AS BIGINT) AS gid,
           round(sum(o_totalprice), 4) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (strftime(o_orderdate, '%Y')), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping-set selection — per-nation and per-year marginals
    plus the grand total, WITHOUT the (nation, year) cross detail a cube
    would also emit. nation is broadcast (true dimension at any scale);
    orders⋈customer is left to AQE — broadcast locally, sort-merge on
    co-bucketed keys at fact scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = o.join(
        c, o["o_custkey"] == c["c_custkey"]
    ).join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).select(
        "n_name", F.date_format("o_orderdate", "yyyy").alias("year"), "o_totalprice"
    )
    return (
        joined.groupingSets(
            [["n_name"], ["year"], []], "n_name", "year"
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            r4(F.sum("o_totalprice")).alias("revenue"),
        )
        .select(
            F.coalesce("n_name", F.lit("<all>")).alias("nation"),
            F.coalesce("year", F.lit("<all>")).alias("year"),
            "gid",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# Mergeable sketches + exact quantiles (A9 telemetry generalized to the
# re-aggregatable 100 TB form — see operators/sketches.py)
# ---------------------------------------------------------------------------

from graph_db_spark.operators import sketches as SK  # noqa: E402


@register(
    "hll_user_reach",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1.0 AS DOUBLE) AS est_within_5pct
    FROM events GROUP BY event_type
    """,
)
def hll_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type from MERGED per-day HLL sketches —
    the range-rollup answers from O(days×types) sketch rows, never
    re-scanning raw events. The Datasketches estimate itself is
    implementation-specific (DuckDB cannot replay the binary sketch), so
    the driver-checked emission is the `percentile_sketch_bound`
    CONTRACT shape: the exact per-type distinct count (a fact DuckDB
    verifies) plus a flag asserting the merged-sketch estimate landed
    within 5% of it — the oracle pins the flag to 1.0, so an estimator
    or merge regression fails the gate, not just a pytest. The portable
    twin `hll_user_reach_portable` hash-matches the full register math."""
    ev = load_table(spark, sf_dir, "events")
    daily = SK.hll_day_sketches(ev, "ts", ["event_type"], "user_id")
    est = SK.hll_merge_estimate(daily, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return exact.join(F.broadcast(est), "event_type").select(
        "event_type",
        "exact_users",
        F.when(
            F.abs(F.col("distinct_est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users"),
            1.0,
        )
        .otherwise(0.0)
        .alias("est_within_5pct"),
    )


@register("hll_user_reach_portable")  # oracle assigned post-def (shared literals)
def hll_user_reach_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type from MERGED per-day PORTABLE-HLL
    register rows — the same mergeable range-rollup shape as
    hll_user_reach, but every step (two-polynomial 62-bit hash, register
    rank, max merge, harmonic estimator + linear-counting correction) is
    plain arithmetic DuckDB reproduces EXACTLY. The Datasketches variant
    stays as the compact-binary production path; this one closes the last
    rows-only gap with a hash-matched oracle."""
    ev = load_table(spark, sf_dir, "events")
    regs = SK.portable_hll_registers(ev, "ts", ["event_type"], "user_id")
    return SK.portable_hll_estimate(regs, ["event_type"])


@register(
    "percentile_value_stats",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p_0_5,
           round(quantile_cont(value, 0.95), 4) AS p_0_95
    FROM events
    GROUP BY event_type
    """,
)
def percentile_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per event_type (ANSI percentile_cont
    semantics, hash-matches DuckDB quantile_cont). At 100 TB swap to
    approx_percentile — same query shape, bounded-error single pass."""
    ev = load_table(spark, sf_dir, "events")
    return SK.exact_percentiles(ev, ["event_type"], "value", [0.5, 0.95])


@register(
    "time_rollup_multigrain",
    oracle="""
    SELECT event_type,
           coalesce(strftime(date_trunc('month', ts), '%Y-%m-%d'), '<all>') AS month,
           coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), '<all>') AS day,
           CAST(grouping(strftime(date_trunc('month', ts), '%Y-%m-%d')) * 2
                + grouping(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS BIGINT) AS gid,
           round(sum(value), 4) AS total,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type, ROLLUP (strftime(date_trunc('month', ts), '%Y-%m-%d'),
                                 strftime(date_trunc('day', ts), '%Y-%m-%d'))
    """,
)
def time_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity time rollup: day, month, and
    all-time totals per event_type in ONE scan — ROLLUP over
    (month, day) truncations instead of three separate aggregations.
    The Expand triples rows pre-shuffle but partial agg collapses them to
    O(groups); at 100 TB this replaces three full passes with one."""
    ev = load_table(spark, sf_dir, "events")
    month = F.date_format(F.date_trunc("month", F.col("ts")), "yyyy-MM-dd")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    return (
        ev.select("event_type", month.alias("m"), day.alias("d"), "value")
        .rollup("event_type", "m", "d")
        .agg(
            F.grouping_id().cast("bigint").alias("g3"),
            r4(F.sum("value")).alias("total"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        # event_type is a real group key on both sides: keep only the
        # rollup levels where it is grouped (g3 < 4 ⇔ grouping(event_type)=0)
        .filter(F.col("g3") < 4)
        .select(
            "event_type",
            F.coalesce("m", F.lit("<all>")).alias("month"),
            F.coalesce("d", F.lit("<all>")).alias("day"),
            (F.col("g3") % 4).alias("gid"),
            "total",
            "n",
        )
    )


@register(
    "rolling_7day_window",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS sum_7d,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
    FROM events
    WHERE user_id < 50
    """,
)
def rolling_7day_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day window aggregate (sum + count) — a true rangeBetween frame over
    epoch seconds (SURVEY.md §2.5: frame-spec windows exposed beyond the
    reference's ranking-only usage). One shuffle on user_id; frames are
    evaluated with a sliding two-pointer pass per partition, no
    per-row rescan."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-7 * 86400, 0)
    )
    # a windowed float MEAN lands on round(x,4) ties often enough (3 rows
    # in 60k outputs) that engine summation order flips the last digit;
    # the rolling SUM over exact DECIMAL is deterministic on both sides
    dec_sum = F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 4)
    n = F.count(F.lit(1)).over(w)
    return ev.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        _fmt_ts(F.col("ts")).alias("ts"),
        dec_sum.cast("double").alias("sum_7d"),
        n.cast("bigint").alias("n_7d"),
    )


@register(
    "streaming_enriched_daily",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           c_mktsegment,
           round(sum(value), 4) AS total,
           CAST(count(*) AS BIGINT) AS n
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
)
def streaming_enriched_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 streaming — stream-static enrichment join (events stream ⋈
    broadcast customer dim) + daily windowed totals per market segment;
    equals the batch join+group on static input, so the plain SQL oracle
    applies."""
    dim = load_table(spark, sf_dir, "customer")
    out = _run_stream_to_table(
        spark, sf_dir, "enriched_daily",
        lambda s: STRM.stream_enriched_daily(
            s, dim, "c_custkey", "c_mktsegment", watermark="3650 days"
        ),
    )
    return out.select(
        "day", "c_mktsegment", r4(F.col("total")).alias("total"),
        F.col("n").cast("bigint").alias("n"),
    )


@register(
    "salted_skew_join",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
           CAST(l_linenumber AS BIGINT) AS linenumber,
           round(o_totalprice, 4) AS totalprice,
           o_orderpriority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-path equi-join: result-identical to the plain join (that IS the
    oracle), but hot keys spread across 8 salt buckets — the explicit
    fallback when one key dominates a fact⋈fact join beyond what AQE's
    skew split absorbs (SCALE.md §2)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderpriority"
    )
    return J.salted_join(li, o, on=["l_orderkey"], n_salts=8).select(
        F.col("l_orderkey").cast("bigint").alias("orderkey"),
        F.col("l_linenumber").cast("bigint").alias("linenumber"),
        r4(F.col("o_totalprice")).alias("totalprice"),
        "o_orderpriority",
    )


@register(
    "cooccurrence_triangles",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS MATERIALIZED (SELECT DISTINCT a.p AS p1, b.p AS p2
                       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
    deg AS MATERIALIZED (SELECT p, count(*) AS d FROM
                         (SELECT p1 AS p FROM e UNION ALL SELECT p2 FROM e) GROUP BY p),
    ore AS MATERIALIZED (
      SELECT CASE WHEN (da.d, e.p1) < (db.d, e.p2) THEN e.p1 ELSE e.p2 END AS u,
             CASE WHEN (da.d, e.p1) < (db.d, e.p2) THEN e.p2 ELSE e.p1 END AS v
      FROM e JOIN deg da ON e.p1 = da.p JOIN deg db ON e.p2 = db.p
    ),
    rk AS MATERIALIZED (SELECT ore.u, ore.v, dv.d AS dv_ FROM ore JOIN deg dv ON ore.v = dv.p)
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM rk e1
    JOIN rk e2 ON e1.u = e2.u AND (e1.dv_, e1.v) < (e2.dv_, e2.v)
    JOIN ore e3 ON e3.u = e1.v AND e3.v = e2.v
    """,
)
def cooccurrence_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics with an EXACT oracle: FULL (unsampled) triangle
    count over the part-co-occurrence graph via degree-ordered orientation
    — every edge points toward its higher-(degree, id) endpoint, so each
    vertex's out-list is bounded by arboricity (~O(√E)) and the wedge join
    Σ out_deg² stays polynomial even with hub parts; each triangle is
    counted exactly once at its lowest-rank vertex. This replaces the
    round-2 10%-sample scope cut: same two-shuffle join shape, but the
    orientation is what makes the full count tractable at 100 TB (the
    count is orientation-invariant — cross-validated against the naive
    p1<p2 enumeration at sf0.001)."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(b, on=[F.col("a.o") == F.col("b.o"), F.col("a.p") < F.col("b.p")])
        .select(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .distinct()
        # e feeds deg (×3), the orientation, and the closure side — without
        # materialization every self-join reference recomputes the whole
        # co-occurrence join+distinct (plan audit: 194 Exchange nodes)
        .localCheckpoint(eager=True)
    )
    # degree table is |parts|-sized (dimension-small) → broadcast to attach
    # ranks without shuffling the edge list
    deg = (
        e.select(F.col("p1").alias("p"))
        .unionAll(e.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = F.broadcast(deg.select(F.col("p").alias("p1"), F.col("d").alias("d1")))
    db = F.broadcast(deg.select(F.col("p").alias("p2"), F.col("d").alias("d2")))
    lower = F.struct("d1", "p1") < F.struct("d2", "p2")
    ore = (
        e.join(da, on="p1")
        .join(db, on="p2")
        .select(
            F.when(lower, F.col("p1")).otherwise(F.col("p2")).alias("u"),
            F.when(lower, F.col("p2")).otherwise(F.col("p1")).alias("v"),
        )
        .localCheckpoint(eager=True)  # referenced by both wedge sides + closure
    )
    dv = F.broadcast(deg.select(F.col("p").alias("v"), F.col("d").alias("dv")))
    rk = ore.join(dv, on="v").select("u", "v", "dv")
    e1, e2 = rk.alias("e1"), rk.alias("e2")
    wedges = e1.join(
        e2,
        on=[
            F.col("e1.u") == F.col("e2.u"),
            F.struct(F.col("e1.dv"), F.col("e1.v")) < F.struct(F.col("e2.dv"), F.col("e2.v")),
        ],
    ).select(F.col("e1.v").alias("wu"), F.col("e2.v").alias("wv"))
    e3 = ore.select(F.col("u").alias("wu"), F.col("v").alias("wv"))
    tri = wedges.join(e3, on=["wu", "wv"])
    return tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


@register(
    "shortest_paths_from_regions",
    oracle="""
    WITH reach AS (
      SELECT 'R:' || CAST(r_regionkey AS VARCHAR) AS landmark,
             'R:' || CAST(r_regionkey AS VARCHAR) AS id, 0 AS dist
      FROM region WHERE r_regionkey = 0
      UNION ALL
      SELECT 'R:' || CAST(n_regionkey AS VARCHAR), 'N:' || CAST(n_nationkey AS VARCHAR), 1
      FROM nation WHERE n_regionkey = 0
      UNION ALL
      SELECT 'R:' || CAST(n_regionkey AS VARCHAR), 'C:' || CAST(c_custkey AS VARCHAR), 2
      FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE n_regionkey = 0
      UNION ALL
      SELECT 'R:' || CAST(n_regionkey AS VARCHAR), 'S:' || CAST(s_suppkey AS VARCHAR), 2
      FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE n_regionkey = 0
      UNION ALL
      SELECT 'R:' || CAST(n_regionkey AS VARCHAR), 'O:' || CAST(o_orderkey AS VARCHAR), 3
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey WHERE n_regionkey = 0
      UNION ALL
      SELECT 'R:' || CAST(n_regionkey AS VARCHAR),
             'L:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR), 4
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey WHERE n_regionkey = 0
      UNION ALL
      SELECT DISTINCT 'R:' || CAST(n_regionkey AS VARCHAR), 'P:' || CAST(l_partkey AS VARCHAR), 5
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey WHERE n_regionkey = 0
      UNION ALL
      SELECT DISTINCT 'R:' || CAST(n_regionkey AS VARCHAR), 'S:' || CAST(l_suppkey AS VARCHAR), 5
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey WHERE n_regionkey = 0
    ), best AS (
      SELECT landmark, id, min(dist) AS dist FROM reach GROUP BY 1, 2
    )
    SELECT landmark, CAST(dist AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS n
    FROM best GROUP BY 1, 2
    """,
)
def shortest_paths_from_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BFS shortest paths from a Region landmark over the
    directed fixture graph, checked against an EXACT oracle — the fixed
    topology lets SQL enumerate every path level (suppliers are reachable
    both directly at dist 2 and through lineitems at dist 5; min wins).
    Aggregated to (landmark, dist, count) so the check is compact."""
    from graph_db_spark.graph.algorithms import shortest_paths

    g = build_graph(spark, sf_dir)
    lms = g.vertices.filter(
        (F.col("label") == "Region") & F.col("id").isin("R:0")
    ).select("id")
    sp = shortest_paths(g.edges, lms, n_partitions=_graph_nparts(sf_dir))
    return (
        sp.groupBy("landmark", F.col("dist").cast("bigint").alias("dist"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# ---------------------------------------------------------------------------
# Quality bounds for approximate operators — driver-visible companion rows
# (VERDICT r2 #8). Each emits (metric, value) rows combining SQL-derivable
# ground-truth facts (DuckDB recomputes them independently) with contract
# rows (the engine measures its own approximation against its own exact
# baseline and emits 1.0 iff the bound holds; the oracle pins the bound).
# A quality regression — worse recall, bigger sketch error — flips a
# contract row to 0.0 and fails the hash match.
# ---------------------------------------------------------------------------


def _metric_rows(*dfs: DataFrame) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


_SHINGLE_TRUTH_SQL = """
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN list_distinct(list_transform(range(1, len(t) - 1),
                                                    i -> array_to_string(t[i:i+2], ' ')))
                  ELSE [array_to_string(t, ' ')] END AS s
      FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents)
"""


@register(
    "minhash_recall_bound",
    oracle=f"""
    WITH sh AS ({_SHINGLE_TRUTH_SQL}),
    ex AS MATERIALIZED (SELECT doc_id, len(s) AS z, unnest(s) AS g FROM sh),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.z AS za, b.z AS zb,
             count(*) AS c
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
           AND a.z >= 0.8 * b.z AND b.z >= 0.8 * a.z
      GROUP BY 1, 2, 3, 4
    )
    SELECT 'n_true_pairs' AS metric, CAST(count(*) AS DOUBLE) AS value
    FROM common WHERE c * 1.0 / (za + zb - c) >= 0.8
    UNION ALL SELECT 'recall_ge_080', 1.0
    """,
)
def minhash_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup quality bound — MinHash-LSH candidate recall against the EXACT
    3-shingle Jaccard≥0.8 truth (the similarity MinHash approximates).
    'n_true_pairs' is recomputed independently by DuckDB (same shingling,
    exact all-pairs); 'recall_ge_080' is 1.0 iff LSH candidates cover ≥80%
    of true pairs (measured 0.96 at sf0.01 with 32 hashes × 8 bands — the
    theoretical band-collision floor at j=0.8 is 1-(1-0.8^4)^8 ≈ 0.985)."""
    from graph_db_spark.util import spread

    docs = load_table(spark, sf_dir, "documents")
    # single-file fixture → one split: spread so shingling + posting-list
    # explode parallelize (SCALE.md §1 fixture artifact)
    sh = spread(docs).select(
        F.col("doc_id").alias("id"), D.shingles(F.col("text"), 3).alias("s")
    )
    # EXACT truth via inverted index (posting-list self-join), not all-pairs:
    # a jaccard≥0.8 pair shares ≥1 shingle, so joining exploded shingles and
    # counting common ones per pair finds every true pair while touching
    # only pairs that overlap at all — measured 284s → ~8s at sf0.1 vs the
    # bucketed array_intersect all-pairs join, and the posting-list shape is
    # the one that survives a 100 TB corpus (work ∝ Σ posting², never n²)
    ex = sh.select(
        F.col("id"), F.size("s").alias("z"), F.explode("s").alias("g")
    )
    a = ex.select(F.col("id").alias("id_a"), F.col("z").alias("za"), "g")
    b = ex.select(F.col("id").alias("id_b"), F.col("z").alias("zb"), "g")
    common = (
        a.join(
            b,
            on=[
                a["g"] == b["g"],
                F.col("id_a") < F.col("id_b"),
                # exact containment prefilter (jaccard ≤ min/max sizes)
                F.col("za").cast("double") >= 0.8 * F.col("zb"),
                F.col("zb").cast("double") >= 0.8 * F.col("za"),
            ],
        )
        .groupBy("id_a", "id_b", "za", "zb")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    truth = (
        common.filter(F.col("c") / (F.col("za") + F.col("zb") - F.col("c")) >= 0.8)
        .select("id_a", "id_b")
        # truth feeds BOTH the fact row and the recall join; without a
        # checkpoint the posting-list join executes twice in the one action
        # (measured 10.7 → 6.6 s at sf0.1). The table is true-pair-sized —
        # tiny — so materializing it is free at any corpus scale.
        .localCheckpoint(eager=True)
    )
    cands = D.minhash_lsh_candidates(docs, "text", "doc_id")
    n_truth = truth.agg(F.count(F.lit(1)).alias("n"))
    hits = truth.join(cands, on=["id_a", "id_b"]).agg(F.count(F.lit(1)).alias("h"))
    contract = n_truth.crossJoin(hits).select(
        F.lit("recall_ge_080").alias("metric"),
        F.when(F.col("h") >= 0.8 * F.col("n"), 1.0).otherwise(0.0).alias("value"),
    )
    facts = n_truth.select(
        F.lit("n_true_pairs").alias("metric"), F.col("n").cast("double").alias("value")
    )
    return _metric_rows(facts, contract)


@register(
    "simhash_completeness_bound",
    oracle=f"""
    WITH g AS (
      SELECT list_sort(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS tset,
             count(*) AS n
      FROM documents GROUP BY 1
    )
    SELECT 'n_identical_tokenset_pairs' AS metric,
           CAST(coalesce(sum(n * (n - 1) / 2), 0) AS DOUBLE) AS value FROM g WHERE n > 1
    UNION ALL SELECT 'all_identical_pairs_found', 1.0
    """,
)
def simhash_completeness_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup quality bound — SimHash completeness: documents with IDENTICAL
    distinct-token sets have identical 64-bit signatures, agree on every
    rotation block, and MUST therefore all be reported at Hamming distance
    0. DuckDB counts those pairs independently; the contract row is 1.0
    iff the block-rotation join surfaced every one of them."""
    docs = load_table(spark, sf_dir, "documents")
    tset = docs.select(
        F.col("doc_id").alias("id"),
        F.array_sort(F.array_distinct(TX.tokens(F.col("text")))).alias("tset"),
    )
    groups = tset.groupBy("tset").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
    # one-row truth, referenced by the fact row and the contract row
    n_pairs = groups.select(
        F.coalesce(F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0)).alias("n")
    ).localCheckpoint(eager=True)
    found = (
        D.simhash_near_dups(docs, "text", "doc_id", max_hamming=3)
        .filter(F.col("hamming") == 0)
        .join(tset.select(F.col("id").alias("id_a"), F.col("tset").alias("ta")), on="id_a")
        .join(tset.select(F.col("id").alias("id_b"), F.col("tset").alias("tb")), on="id_b")
        .filter(F.col("ta") == F.col("tb"))
        .agg(F.count(F.lit(1)).alias("h"))
    )
    facts = n_pairs.select(
        F.lit("n_identical_tokenset_pairs").alias("metric"),
        F.col("n").cast("double").alias("value"),
    )
    contract = n_pairs.crossJoin(found).select(
        F.lit("all_identical_pairs_found").alias("metric"),
        F.when(F.col("h") >= F.col("n"), 1.0).otherwise(0.0).alias("value"),
    )
    return _metric_rows(facts, contract)


_ANN_TRUTH_SQL = """
      WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
      s AS (SELECT q.qid, e.vec_id AS nid,
                   list_cosine_similarity(q.qv, e.embedding) AS sim
            FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
      r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM s)
"""


@register(
    "ann_lsh_recall_bound",
    oracle=f"""
    {_ANN_TRUTH_SQL}
    SELECT 'n_exact_topk_pairs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM r WHERE rn <= 5
    UNION ALL SELECT 'recall_ge_075', 1.0
    """,
)
def ann_lsh_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity quality bound — multi-table hyperplane-LSH recall@5
    against the engine's own brute-force top-5 (which itself hash-matches
    DuckDB, embedding_cosine_topk). DuckDB recomputes the exact top-k pair
    count independently (list_cosine_similarity window); the contract row
    is 1.0 iff LSH recall ≥ 0.75 (measured 0.89 at sf0.01, 16 tables × 4
    planes, fixed LCG seed — fully deterministic)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    # exact feeds both the fact row and the recall join — checkpoint so the
    # brute-force pass runs once (k·|q| rows, tiny at any corpus scale)
    exact = (
        SIM.cosine_topk(emb, q, k=5)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    approx = SIM.cosine_topk_lsh(emb, q, dim=64, k=5, n_planes=4, n_tables=16).select(
        "query_id", "neighbor_id"
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n"))
    hits = exact.join(approx, on=["query_id", "neighbor_id"]).agg(F.count(F.lit(1)).alias("h"))
    facts = n_exact.select(
        F.lit("n_exact_topk_pairs").alias("metric"), F.col("n").cast("double").alias("value")
    )
    contract = n_exact.crossJoin(hits).select(
        F.lit("recall_ge_075").alias("metric"),
        F.when(F.col("h") >= 0.75 * F.col("n"), 1.0).otherwise(0.0).alias("value"),
    )
    return _metric_rows(facts, contract)


@register(
    "ann_ivf_recall_bound",
    oracle=f"""
    {_ANN_TRUTH_SQL}
    SELECT 'n_exact_topk_pairs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM r WHERE rn <= 5
    UNION ALL SELECT 'recall_ge_070', 1.0
    """,
)
def ann_ivf_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity quality bound — IVF (spherical k-means, nprobe=8/16)
    recall@5 vs brute force. Contract floor 0.70 (measured 0.83 at sf0.01;
    near-uniform fixture vectors make recall ≈ probed-list fraction, the
    documented worst case — clustered real embeddings prune harder at the
    same recall)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    # same double-reference as the LSH bound — one brute-force pass
    exact = (
        SIM.cosine_topk(emb, q, k=5)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    approx = SIM.cosine_topk_ivf(emb, q, k=5, n_centroids=16, nprobe=8).select(
        "query_id", "neighbor_id"
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n"))
    hits = exact.join(approx, on=["query_id", "neighbor_id"]).agg(F.count(F.lit(1)).alias("h"))
    facts = n_exact.select(
        F.lit("n_exact_topk_pairs").alias("metric"), F.col("n").cast("double").alias("value")
    )
    contract = n_exact.crossJoin(hits).select(
        F.lit("recall_ge_070").alias("metric"),
        F.when(F.col("h") >= 0.70 * F.col("n"), 1.0).otherwise(0.0).alias("value"),
    )
    return _metric_rows(facts, contract)


@register(
    "ann_pq_distortion_bound",
    oracle="""
    SELECT 'n_scored_pairs' AS metric,
           CAST((SELECT count(*) FROM embeddings WHERE vec_id < 20)
                * ((SELECT count(*) FROM embeddings) - 1) AS DOUBLE) AS value
    UNION ALL SELECT 'max_rel_err_le_080', 1.0
    UNION ALL SELECT 'mean_rel_err_le_050', 1.0
    """,
)
def ann_pq_distortion_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity quality bound — the PQ codec's distance-distortion
    contract (companion to `ann_pq_topk`, same role as
    `ann_lsh_recall_bound`/`ann_ivf_recall_bound` for their paths).

    Recall is deliberately NOT the contract here: the fixture embeddings
    are near-uniform, so 64-dim pairwise distances concentrate and ANY
    lossy codec scrambles the (nearly tied) ranking — measured recall@5
    is ~0.1 while the same codec on clustered real embeddings ranks
    fine. What PQ actually promises is bounded distance distortion, so
    the contract bounds the relative ADC error |ad − d|/d over EVERY
    (query, corpus) pair: max ≤ 0.80, mean ≤ 0.50 (measured stable
    0.66/0.41 at sf0.001 AND sf0.01, m=4 × 8 codewords). The exact pair
    count is the oracle-checked fact row; the error measurement
    recomputes exact distances at verification scale by design
    (`minhash_recall_bound` discipline — the production operator stays
    compressed)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    qq = q.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("qv")
    )
    cc = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").cast("array<double>").alias("cv")
    )
    exact = cc.join(F.broadcast(qq), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", SIM._l2sq(F.col("qv"), F.col("cv")).alias("d")
    )
    approx = SIM.pq_topk(emb, q, k=2**31 - 1, m=4, k_sub=8, lloyd_iters=2).select(
        "query_id", "neighbor_id", "approx_dist"
    )
    rel = exact.join(approx, on=["query_id", "neighbor_id"]).select(
        (
            F.abs(F.col("approx_dist") - F.col("d"))
            / F.greatest(F.col("d"), F.lit(1e-12))
        ).alias("rel")
    )
    stats = rel.agg(
        F.count(F.lit(1)).alias("n"), F.max("rel").alias("mx"), F.avg("rel").alias("mean")
    ).localCheckpoint(eager=True)
    return _metric_rows(
        stats.select(
            F.lit("n_scored_pairs").alias("metric"), F.col("n").cast("double").alias("value")
        ),
        stats.select(
            F.lit("max_rel_err_le_080").alias("metric"),
            F.when(F.col("mx") <= 0.80, 1.0).otherwise(0.0).alias("value"),
        ),
        stats.select(
            F.lit("mean_rel_err_le_050").alias("metric"),
            F.when(F.col("mean") <= 0.50, 1.0).otherwise(0.0).alias("value"),
        ),
    )


@register(
    "hll_error_bound",
    oracle="""
    SELECT 'n_groups' AS metric, CAST(count(DISTINCT event_type) AS DOUBLE) AS value FROM events
    UNION ALL
    SELECT 'total_exact_distinct',
           CAST(sum(n) AS DOUBLE) FROM (
             SELECT count(DISTINCT user_id) AS n FROM events GROUP BY event_type)
    UNION ALL SELECT 'max_rel_err_le_005', 1.0
    """,
)
def hll_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch quality bound — merged per-day HLL estimates vs exact
    distinct counts per event_type. DuckDB recomputes the exact totals;
    the contract row is 1.0 iff every group's relative error ≤ 5% (the
    lgK=12 Datasketches RSE is ~0.8%, so this bound has wide margin;
    measured exact agreement at sf0.01/sf0.1 cardinalities)."""
    from graph_db_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    daily = SK.hll_day_sketches(ev, "ts", ["event_type"], "user_id")
    est = SK.hll_merge_estimate(daily, ["event_type"])
    # referenced by two fact rows + the error join: one exact pass, not three
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .localCheckpoint(eager=True)
    )
    joined = est.join(exact, on="event_type")
    facts = _metric_rows(
        exact.agg(F.count(F.lit(1)).alias("v")).select(
            F.lit("n_groups").alias("metric"), F.col("v").cast("double").alias("value")
        ),
        exact.agg(F.sum("n").alias("v")).select(
            F.lit("total_exact_distinct").alias("metric"), F.col("v").cast("double").alias("value")
        ),
    )
    contract = joined.agg(
        F.max(F.abs(F.col("distinct_est") - F.col("n")) / F.col("n")).alias("err")
    ).select(
        F.lit("max_rel_err_le_005").alias("metric"),
        F.when(F.col("err") <= 0.05, 1.0).otherwise(0.0).alias("value"),
    )
    return _metric_rows(facts, contract)


@register("near_dup_clusters")  # hash-seeded LSH + iterative CC → rows-only; transitivity unit-tested
def near_dup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup — the composed end-to-end pipeline: MinHash-LSH candidates →
    exact Jaccard verification (candidates only) → connected components
    transitively close clusters → min-id canonical. The shape a 100 TB
    training-data dedup actually runs; every stage is the already-verified
    operator (minhash_lsh_dedup, ngram_jaccard_pairs,
    connected_components)."""
    from graph_db_spark.operators.dedup import near_dup_clusters

    docs = load_table(spark, sf_dir, "documents")
    return near_dup_clusters(docs, "text", "doc_id", threshold=0.6)


# ---------------------------------------------------------------------------
# Driver-gate ordering. The correctness driver walks ``queries()`` in
# registration order under a wall-clock budget (round 2 stopped at 50 of 86,
# leaving 36 queries without a driver-visible verdict). Sub-second queries
# run first; the multi-second ones run last, ordered cheapest-first so a
# budget cut drops as few verdicts as possible (measured sf0.01 timings in
# tools/check_correctness.py output).
# ---------------------------------------------------------------------------

_EXPENSIVE_LAST = [
    "markov_absorption_conversion", # ~13s at sf0.01 (8 tiny rounds, job overhead)
    "pca_power_iteration",          # ~14s at sf0.01 (covariance + 6 rounds)
    "katz_walk_centrality",         # ~2.3s at sf0.01 (4 walk-count rounds)
    "link_prediction_adamic_adar",  # ~2.4s at sf0.01 (wedge join)
    "label_propagation",            # ~2.7s (3 sync rounds)
    "streaming_decontamination",    # ~3s at sf0.01 (stream machinery)
    "simhash_completeness_bound",   # ~3s
    "running_idx",                  # ~3.5s
    "ann_ivf_recall_bound",         # ~3.5s
    "salted_skew_join",             # ~3.7s
    "hits_scores",                  # ~4s (6 checkpointed half-steps)
    "pipeline_optimum_element_ranges",  # ~4.3s
    "simhash_near_dups",            # ~4.4s
    "ann_lsh_recall_bound",         # ~5s
    "streaming_exact_dedup",        # ~6s (stream machinery)
    "streaming_watermark_dedup",    # ~10s at sf0.1 (3 micro-batches, keyed state)
    "enrich_missing_brand",         # ~5.6s
    "pipeline_sap_analyses",        # ~6s
    "shortest_paths_from_regions",  # ~6s
    "harmonic_centrality_landmarks",  # ~6s (5-landmark BFS, one frontier run)
    "landmark_eccentricity",        # ~6s (same BFS, max-depth reduction)
    "scc_trade_partners",           # ~7s (one fact pass + nation-sized trim/FW-BW rounds)
    "minhash_recall_bound",         # ~7s
    "pipeline_app_nutrient_contents",  # ~7s
    "pipeline_sap_element_results", # ~8s
    "cooccurrence_triangles",       # ~9s
    "near_dup_clusters",            # ~9s
    "curated_training_corpus",      # ~18s at sf0.01 (LSH dedup → quality cut → split, end-to-end)
    "truss_communities",            # ~17s at sf0.01 (peel + CC + unrolled closure oracle)
    "shortest_path_routes",         # ~14s at sf0.01 (full BFS tree + level-wise reconstruction)
    "streaming_left_outer_attribution",  # ~13s (two-sided state store + null emission)
    "k_truss_cooccurrence",         # ~10s at sf0.01 (3-4 peel rounds, triangle join each)
    "snapshot_schema_evolution",    # ~8s (create + evolving merge; commit-overhead-bound)
    "snapshot_write_audit_publish", # ~9s (create + rejected merge + committed merge)
    "zorder_clustering_prune",      # ~11s (two clustered creates + footer stats; commit-overhead-bound)
    "snapshot_range_pruning",       # ~11s (clustered create + footer stats; commit-overhead-bound)
    "curation_provenance",          # ~18s at sf0.01 (shares the capstone's LSH dedup + closure)
    "ivm_join_view",                # ~19s (5 snapshot commits + CDC folds; SF-independent)
    "ivm_minmax_rescan",            # ~19s (3 commits + minmax folds + rescans; SF-independent)
    "incremental_view_maintenance", # ~12s at sf0.1 (3 commits + 3 CDC folds; SF-independent data)
    "snapshot_table_lifecycle",     # ~10s at sf0.1 (5 commits: COW/MOR/delete/compact — ~15 sequential jobs of driver-fixed overhead; data volume is SF-independent)
    "k_core_4",                     # ~13s at sf0.1 (iterative peel)
    "streaming_touch_pairs",        # ~14s at sf0.1 (two-sided state store)
    "weighted_paths_from_region",   # ~14s at sf0.1 (Bellman-Ford relax rounds)
    "connected_components",         # ~12s
    "pagerank",                     # ~14s
    "personalized_pagerank_regions",  # ~18s at sf0.1 (iterative + per-round restart join)
]


# Round-10 rotation of the driver's correctness window (the driver gate
# reads the FIRST 50 registered queries). The never-driver-checked debt
# was paid off in r9 (every pre-r10 query has a green row in some
# CORRECTNESS_r0{1..9}.json), so from r10 on the window re-checks STALE
# rows — names whose last driver verification ran against code that is
# now many rounds old. Staleness map at r10 open (last-green round):
# r2: 2, r3: 50, r4: 50, r5: 49, r6: 49, r7: 49, r8: 49, r9: 50.
#
# r10 window = (a) the 2 r2-stale names, then (b) the first 27 of the
# r3-stale block in CORRECTNESS_r03 order (longest-waiting first so a
# wall-clock cut drops the freshest evidence, not the oldest debt),
# then (c) 6 RE-QUEUES for queries whose query/oracle/operator changed
# this round (the rfm precedent: a green row predating a rewrite proves
# nothing) — filter_cascade_attrition + kneser_ney_bigram (pinned
# whitespace class), jackknife_ratio_variance (sqrt guard),
# hll_user_reach (new contract oracle), near_dup_clusters (CC
# parallelism probe), sessionization (operator micros rounding) — and
# (d) the 23 r10 registrations (every new name MUST take a window slot
# or it stays driver-unverified forever; the contract test enforces
# this; the second/third/fourth r10 batches displaced the 13 freshest
# r3 slots: motif_region_order_path .. event_day_stats_zero_null). r11
# queue = the 31 remaining r3-stale names + the r4 block.
_GATE_WINDOW = [
    # (a) r2-stale
    "enrich_missing_brand", "running_idx",
    # (b) r3-stale, CORRECTNESS_r03 order, first 19
    "proj_rename", "edge_customer_order", "broadcast_dim_join",
    "asof_nearest_line", "anti_parts_never_ordered",
    "semi_customers_with_orders", "dedup_first_wins", "topk_per_group",
    "sanitize_prop_names", "depth_from_label", "loose_number_parse",
    "range_parse", "point_parse", "composite_id", "datetime_coercion",
    "first_non_empty_pick", "union_dedup", "pricing_summary",
    "graph_degrees",
    # (c) re-queues: changed this round
    "filter_cascade_attrition", "kneser_ney_bigram",
    "jackknife_ratio_variance", "hll_user_reach", "near_dup_clusters",
    "sessionization",
    # (d) r10 registrations (batches 1-3)
    "isotonic_calibration_pav", "mann_kendall_trend",
    "friedman_priority_ranks", "logrank_cohort_test",
    "cuped_variance_reduction", "pareto_skyline_parts",
    "flesch_reading_ease", "hodges_lehmann_shift", "price_index_fisher",
    "empirical_bayes_shrinkage",
    "wilcoxon_signed_rank", "durbin_watson_trend", "max_drawdown_daily",
    "chao1_vocab_richness", "cmh_return_rate",
    "shapley_channel_attribution", "wasserstein_price_shift",
    "negbin_overdispersion", "engle_granger_cointegration",
    "weibull_time_to_convert",
    "bray_curtis_source_matrix", "hurst_exponent_rs",
    "auc_doc_length_lang",
]
assert len(_GATE_WINDOW) == 50


def _reorder_for_gate() -> None:
    head = [n for n in _GATE_WINDOW if n in QUERIES]
    late = [n for n in _EXPENSIVE_LAST if n in QUERIES and n not in set(head)]
    mid = [n for n in QUERIES if n not in set(head) and n not in set(late)]
    for d in (QUERIES, ORACLE_SQL):
        ordered = {n: d[n] for n in head + mid + late if n in d}
        d.clear()
        d.update(ordered)


def _minhash_band_sql(
    num_hashes: int = 32, bands: int = 8, cands_pred: str = "a.doc_id < b.doc_id"
) -> str:
    """Shared CTE body reproducing minhash_lsh_candidates in DuckDB: the
    portable md5-window shingle hash (operators/dedup.py:portable_hash),
    the LCG-derived affine minhashes (minhash_params — emitted here as
    integer literals), and the banded bucket join. ``cands_pred`` selects
    which banded pairs qualify — the default is the full-corpus sweep;
    the incremental query restricts to new-batch × index pairs. Exact,
    not modeled."""
    from graph_db_spark.operators.dedup import _MINHASH_P as P
    from graph_db_spark.operators.dedup import minhash_params

    rpb = num_hashes // bands
    mins = ",\n               ".join(
        f"list_min(list_transform(h, x -> ({a} * x + {b}) % {P}))"
        for a, b in minhash_params(num_hashes)
    )
    band_vals = ", ".join(f"({i})" for i in range(bands))
    return f"""
    sh AS ({_SHINGLE_TRUTH_SQL}),
    ph AS (
      SELECT doc_id,
             list_transform(s, s1 -> {_poly_sql('s1')}) AS h
      FROM sh
    ),
    sig AS (SELECT doc_id, [{mins}] AS sig FROM ph),
    banded AS (
      SELECT doc_id, b.band,
             array_to_string(sig[b.band * {rpb} + 1 : b.band * {rpb} + {rpb}], ',')
               AS band_sig
      FROM sig CROSS JOIN (VALUES {band_vals}) b(band)
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_sig = b.band_sig AND {cands_pred}
    )"""


# portable-hash MinHash made the LSH pipeline engine-reproducible: the two
# formerly rows-only dedup queries get EXACT oracles (assigned post-def
# because the shared shingle CTE is defined late in this module).
ORACLE_SQL["minhash_lsh_dedup"] = f"""
    WITH {_minhash_band_sql()}
    SELECT id_a, id_b FROM cands
    """

def _hex_window_sql(expr: str, off: int) -> str:
    """DuckDB replica of an 8-hex-digit md5 window parsed as a 32-bit
    integer (operators/dedup.py:_token_words, portable family) — the raw
    window, no mod, so all 32 bits stay usable as bit decisions."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split_regex(substr(md5({expr}), {off}, 8), ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        f"(acc, x) -> acc * 16 + x)"
    )


def _simhash_oracle_sql(bits: int = 64, max_hamming: int = 3) -> str:
    """Reproduce simhash_near_dups in DuckDB: per distinct token the two
    32-bit md5 windows, 64 per-bit ±1 sums (unnest + GROUP BY — same
    explode-aggregate shape the Spark side runs), sign pack,
    block-rotation bucket join, Hamming verify. Bit semantics on negative
    BIGINTs (>>, &, xor, bit_count) verified identical."""
    terms = []
    for i in range(bits):
        w, sh = ("w1", i) if i < 32 else ("w2", i - 32)
        cnt = f"sum(CASE WHEN ({w} >> {sh}) & 1 = 1 THEN 1 ELSE -1 END)"
        mask = str(1 << i) if i < bits - 1 else "-9223372036854775808"
        terms.append(f"CASE WHEN {cnt} > 0 THEN CAST({mask} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
    sig_expr = "\n             + ".join(terms)  # sign-bit term last: partial sums stay in int64
    nblocks = max_hamming + 1
    block_bits = bits // nblocks
    blk_vals = ", ".join(f"({i})" for i in range(nblocks))
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_distinct(string_split_regex(lower(trim(coalesce(text, ''))), '\\s+'))) AS t
      FROM documents
    ),
    words AS (
      SELECT doc_id, {_hex_window_sql('t', 1)} AS w1, {_hex_window_sql('t', 9)} AS w2
      FROM toks
    ),
    sig AS (SELECT doc_id, ({sig_expr}) AS sig FROM words GROUP BY doc_id),
    blocked AS (
      SELECT doc_id, sig, b.blk, (sig >> (b.blk * {block_bits})) & {(1 << block_bits) - 1} AS blk_val
      FROM sig CROSS JOIN (VALUES {blk_vals}) b(blk)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.sig, b.sig)) AS hamming
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
    """


ORACLE_SQL["simhash_near_dups"] = _simhash_oracle_sql()


def _portable_hll_oracle_sql(p: int = 12) -> str:
    """Reproduce the portable-HLL pipeline in DuckDB: the same two-window
    md5 62-bit hash, register extraction, per-(type, day) sketch rows, max
    merge, and harmonic estimator with linear-counting correction. The
    alpha constant is computed with the SAME Python expression the Spark
    operator uses, so both engines parse the identical double literal."""
    m = 1 << p
    alpha_m2 = (0.7213 / (1 + 1.079 / m)) * m * m
    rho_max = 63 - p
    return f"""
    WITH h AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             ({_poly_sql("CAST(user_id AS VARCHAR)")} * 2147483648
              + {_poly_sql("CAST(user_id AS VARCHAR)", 131)}) AS h64
      FROM events
    ),
    reg AS (
      SELECT event_type, day, h64 & {m - 1} AS idx,
             max(CASE WHEN (h64 >> {p}) = 0 THEN {rho_max}
                      ELSE {rho_max} - length(bin(h64 >> {p})) END) AS r
      FROM h GROUP BY 1, 2, 3
    ),
    merged AS (SELECT event_type, idx, max(r) AS r FROM reg GROUP BY 1, 2),
    agg AS (
      SELECT event_type, count(*) AS c, sum(power(0.5, r)) AS s
      FROM merged GROUP BY 1
    )
    SELECT event_type,
           round(CASE WHEN {alpha_m2!r} / (({m} - c) + s) <= {2.5 * m!r} AND c < {m}
                      THEN {float(m)!r} * ln({float(m)!r} / ({m} - c))
                      ELSE {alpha_m2!r} / (({m} - c) + s) END, 4) AS distinct_est
    FROM agg
    """


ORACLE_SQL["hll_user_reach_portable"] = _portable_hll_oracle_sql()


# near_dup_clusters: candidates → token-Jaccard ≥ 0.6 verify → transitive
# closure (recursive CTE) → canonical = LEXICOGRAPHIC min id (the engine's
# connected_components works on string vertex ids).
ORACLE_SQL["near_dup_clusters"] = f"""
    WITH RECURSIVE {_minhash_band_sql()},
    toks AS (
      SELECT doc_id,
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents
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
    )
    SELECT CAST(id AS VARCHAR) AS id,
           min(CAST(rid AS VARCHAR)) AS canonical_id,
           CAST(id AS VARCHAR) = min(CAST(rid AS VARCHAR)) AS is_canonical
    FROM reach GROUP BY id
    """


# ---------------------------------------------------------------------------
# Corpus-quality signals, PII scrubbing, Count-Min heavy hitters, Bloom
# pruning (round-3 additions; operators/quality.py, operators/sketches.py)
# ---------------------------------------------------------------------------

from graph_db_spark.operators import profiling as PF  # noqa: E402
from graph_db_spark.operators import quality as QL  # noqa: E402
from graph_db_spark.operators import sketches as SK  # noqa: E402
from graph_db_spark.util import spread  # noqa: E402


@register(
    "repetition_quality",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), tw AS (
      SELECT doc_id, max(cnt) * 1.0 / sum(cnt) AS twf FROM (
        SELECT doc_id, tok, count(*) AS cnt
        FROM (SELECT doc_id, unnest(w) AS tok FROM words) GROUP BY 1, 2
      ) GROUP BY 1
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 2 THEN
               (len(w) - 1 - len(list_distinct(list_transform(
                  generate_series(1, len(w) - 1),
                  i -> array_to_string(w[i:i+1], ' ')))))
               * 1.0 / (len(w) - 1) ELSE 0.0 END AS d2,
             CASE WHEN len(w) >= 3 THEN
               (len(w) - 2 - len(list_distinct(list_transform(
                  generate_series(1, len(w) - 2),
                  i -> array_to_string(w[i:i+2], ' ')))))
               * 1.0 / (len(w) - 2) ELSE 0.0 END AS d3
      FROM words
    )
    SELECT doc_id, round(twf, 4) AS top_word_frac,
           round(d2, 4) AS dup_bigram_frac,
           round(d3, 4) AS dup_trigram_frac,
           (twf > 0.12 OR d2 > 0.06) AS flagged
    FROM tw JOIN g USING (doc_id)
    """,
)
def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): fraction
    of tokens taken by the most frequent token, and fraction of word
    {2,3}-grams that repeat. The Spark side computes every signal per row
    in ONE higher-order-function pass with zero shuffle (the sorted-run
    trick, operators/quality.py) — the explode/groupBy formulation that
    shuffles O(total tokens) exists only in the DuckDB oracle. ``spread``
    first: the signals are CPU-heavy narrow work and the fixture is one
    parquet split."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    sig = docs.select(
        "doc_id",
        QL.top_word_fraction("text").alias("twf"),
        QL.dup_gram_fraction("text", 2).alias("d2"),
        QL.dup_gram_fraction("text", 3).alias("d3"),
    )
    return sig.select(
        "doc_id",
        r4(F.col("twf")).alias("top_word_frac"),
        r4(F.col("d2")).alias("dup_bigram_frac"),
        r4(F.col("d3")).alias("dup_trigram_frac"),
        ((F.col("twf") > 0.12) | (F.col("d2") > 0.06)).alias("flagged"),
    )


@register(
    "pii_scrub_audit",
    oracle="""
    WITH raw AS (
      SELECT c_custkey,
             concat_ws(' ', c_name, 'email:',
               concat(regexp_replace(lower(c_name), '[^a-z0-9]', '.', 'g'),
                      '@example.com'),
               'phone:',
               concat('+', CAST(c_custkey % 90 + 10 AS VARCHAR), '-',
                      lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0'), '-',
                      lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')),
               'card:', lpad(CAST(c_custkey AS VARCHAR), 16, '0'),
               c_mktsegment) AS contact
      FROM customer
    )
    SELECT c_custkey,
           CAST(len(regexp_extract_all(contact,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(contact,
             '[+][0-9]{2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(contact, '[0-9]{16}')) AS BIGINT)
             AS n_cards,
           regexp_replace(regexp_replace(regexp_replace(contact,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '[EMAIL]', 'g'),
             '[0-9]{16}', '[CARD]', 'g'),
             '[+][0-9]{2}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS scrubbed
    FROM raw
    """,
)
def pii_scrub_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing audit — synthesize a deterministic contact blob per
    customer (name-derived email, +NN-NNN-NNNN phone, 16-digit card), then
    mask with the shared Java/RE2 regex subset and report per-row match
    counts (the shard audit log a scrubbing pipeline emits). Pure
    regexp_replace chains: narrow, codegen, zero shuffle at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    contact = F.concat_ws(
        " ",
        F.col("c_name"),
        F.lit("email:"),
        F.concat(
            F.regexp_replace(F.lower("c_name"), "[^a-z0-9]", "."),
            F.lit("@example.com"),
        ),
        F.lit("phone:"),
        F.concat(
            F.lit("+"), (ck % 90 + 10).cast("string"), F.lit("-"),
            F.lpad((ck % 1000).cast("string"), 3, "0"), F.lit("-"),
            F.lpad((ck % 10000).cast("string"), 4, "0"),
        ),
        F.lit("card:"),
        F.lpad(ck.cast("string"), 16, "0"),
        F.col("c_mktsegment"),
    )
    raw = cust.select("c_custkey", contact.alias("contact"))
    n_em, n_ph, n_cd = QL.pii_counts("contact")
    return raw.select(
        "c_custkey",
        n_em.cast("bigint").alias("n_emails"),
        n_ph.cast("bigint").alias("n_phones"),
        n_cd.cast("bigint").alias("n_cards"),
        QL.pii_scrub("contact").alias("scrubbed"),
    )


def _cms_oracle_sql(depth: int = 4, width: int = 256, seed: int = 41) -> str:
    from graph_db_spark.operators.dedup import _MINHASH_P as P
    from graph_db_spark.operators.dedup import minhash_params

    vals = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(minhash_params(depth, seed=seed))
    )
    return f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    exact AS (
      SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt FROM toks GROUP BY 1
    ),
    h AS (SELECT token, exact_cnt, {_poly_sql('token')} AS hh FROM exact),
    rows_ AS (
      SELECT token, exact_cnt, j, ((a * hh + b) % {P}) % {width} AS bucket
      FROM h CROSS JOIN (VALUES {vals}) t(j, a, b)
    ),
    cms AS (SELECT j, bucket, sum(exact_cnt) AS cnt FROM rows_ GROUP BY 1, 2),
    est AS (
      SELECT r.token, min(c.cnt) AS est_cnt
      FROM rows_ r JOIN cms c USING (j, bucket) GROUP BY 1
    )
    SELECT e.token, e.exact_cnt, CAST(est.est_cnt AS BIGINT) AS est_cnt,
           CAST(est.est_cnt - e.exact_cnt AS BIGINT) AS overcount
    FROM exact e JOIN est USING (token)
    ORDER BY e.exact_cnt DESC, e.token LIMIT 20
    """


@register("cms_heavy_hitters", oracle=_cms_oracle_sql())
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters over the document token stream: top-20
    tokens by exact count with their CMS estimates and overcount. The
    sketch (4×256 counters) is built from the pre-aggregated exact counts
    — identical to per-occurrence increments, but the portable hash runs
    once per DISTINCT token and the occurrence collapse happens in the
    exact groupBy's map-side combine. At 100 TB the sketch table is the
    only thing that merges across shards (sum per (j,bucket)); the
    estimate ≥ exact always, ≤ exact + e/width·N w.p. 1−e^−depth —
    deterministic given the portable hash, so DuckDB reproduces every
    counter exactly."""
    docs = spread(load_table(spark, sf_dir, "documents"))  # 1-split fixture:
    # the explode + map-side combine is the heavy narrow stage
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
    exact = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    # Reused twice (sketch build + probe): materialize so the token
    # groupBy and the portable-hash stage execute once.
    exact = spread(exact).localCheckpoint()
    cms = SK.count_min_table(exact, "token", "exact_cnt")
    est = SK.count_min_lookup(cms, exact.select("token"), "token")
    return (
        exact.join(est, on="token")
        .select(
            "token",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.desc("exact_cnt"), "token")
        .limit(20)
    )


def _cms_day_merge_oracle_sql(depth: int = 4, width: int = 64, seed: int = 53) -> str:
    from graph_db_spark.operators.dedup import _MINHASH_P as P
    from graph_db_spark.operators.dedup import minhash_params

    vals = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(minhash_params(depth, seed=seed))
    )
    return f"""
    WITH items AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(user_id AS VARCHAR) AS item
      FROM events
    ),
    daily AS (
      SELECT day, item, CAST(count(*) AS BIGINT) AS n FROM items GROUP BY 1, 2
    ),
    h AS (
      SELECT item, {_poly_sql('item')} AS hh
      FROM (SELECT DISTINCT item FROM daily)
    ),
    cells AS (
      SELECT d.day, t.j, ((t.a * h.hh + t.b) % {P}) % {width} AS bucket,
             sum(d.n) AS cnt
      FROM daily d JOIN h USING (item) CROSS JOIN (VALUES {vals}) t(j, a, b)
      GROUP BY 1, 2, 3
    ),
    merged AS (
      SELECT j, bucket, sum(cnt) AS cnt
      FROM cells WHERE day <= '2024-01-15' GROUP BY 1, 2
    ),
    exact AS (
      SELECT item, sum(n) AS exact_cnt
      FROM daily WHERE day <= '2024-01-15' GROUP BY 1
    ),
    est AS (
      SELECT e.item, min(m.cnt) AS est_cnt
      FROM exact e JOIN h USING (item)
      CROSS JOIN (VALUES {vals}) t(j, a, b)
      JOIN merged m
        ON m.j = t.j AND m.bucket = ((t.a * h.hh + t.b) % {P}) % {width}
      GROUP BY 1
    )
    SELECT CAST(e.item AS BIGINT) AS user_id,
           CAST(e.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(s.est_cnt AS BIGINT) AS est_cnt,
           CAST(s.est_cnt - e.exact_cnt AS BIGINT) AS overcount
    FROM exact e JOIN est s USING (item)
    ORDER BY exact_cnt DESC, user_id LIMIT 10
    """


@register("cms_day_merge", oracle=_cms_day_merge_oracle_sql())
def cms_day_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch re-aggregation as a driver-visible row set: one Count-Min
    sketch per DAY over user activity, merged across a date range by
    summing cells, then the top-10 users by exact range count with the
    merged-sketch estimate. This is the ingest-once/re-rollup-forever
    shape (the CMS counterpart of ``hll_user_reach_portable``): a date
    range rollup touches O(days × depth × width) sketch rows, never the
    raw events. Width 64 against ~150 users forces real collisions, so
    overcount > 0 rows demonstrate the estimate-≥-exact contract rather
    than degenerate equality."""
    ev = load_table(spark, sf_dir, "events")
    items = ev.select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        F.col("user_id").cast("string").alias("item"),
    )
    daily = (
        items.groupBy("day", "item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint()  # feeds the sketch build AND the exact rollup
    )
    cms_daily = SK.count_min_table(
        daily, "item", "n", depth=4, width=64, seed=53, keys=["day"]
    )
    merged = SK.count_min_merge(cms_daily.filter(F.col("day") <= "2024-01-15"))
    exact = (
        daily.filter(F.col("day") <= "2024-01-15")
        .groupBy("item")
        .agg(F.sum("n").cast("bigint").alias("exact_cnt"))
    )
    est = SK.count_min_lookup(
        merged, exact.select("item"), "item", depth=4, width=64, seed=53
    )
    return (
        exact.join(est, on="item")
        .select(
            F.col("item").cast("bigint").alias("user_id"),
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.desc("exact_cnt"), "user_id")
        .limit(10)
    )


def _kmv_oracle_sql(k: int = 32, seed: int = 83) -> str:
    from graph_db_spark.operators.dedup import _MINHASH_P as P
    from graph_db_spark.operators.dedup import minhash_params

    hash_range = float(P * 2**31)
    (a1, b1), (a2, b2) = minhash_params(2, seed=seed)
    return f"""
    WITH du AS (
      SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS item FROM events
    ),
    hs AS (
      SELECT DISTINCT event_type,
             ((({a1} * {_poly_sql('item')} + {b1}) % {P}) * 2147483648
              + ({a2} * {_poly_sql('item', 131)} + {b2}) % {P}) AS h
      FROM du
    ),
    r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hs
    ),
    sk AS (
      SELECT event_type,
             list_sort(list(h) FILTER (rn <= {k})) AS sample
      FROM r GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.sample AS sa, b.sample AS sb,
             list_sort(list_distinct(list_concat(a.sample, b.sample))) AS mall
      FROM sk a JOIN sk b ON a.event_type < b.event_type
    ),
    est AS (
      SELECT type_a, type_b,
             CASE WHEN len(mall) >= {k}
                  THEN {k - 1} * {hash_range!r} / mall[{k}]
                  ELSE CAST(len(mall) AS DOUBLE) END AS union_est,
             len(list_intersect(list_intersect(mall[1:{k}], sa), sb)) * 1.0
               / least(len(mall), {k}) AS jac
      FROM pairs
    ),
    ex AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS exact_intersection
      FROM du a JOIN du b ON a.item = b.item AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    n AS (SELECT event_type, count(*) AS nd FROM du GROUP BY 1)
    SELECT e.type_a, e.type_b,
           CAST(na.nd + nb.nd - x.exact_intersection AS BIGINT) AS exact_union,
           CAST(x.exact_intersection AS BIGINT) AS exact_intersection,
           round(e.union_est, 4) AS union_est,
           round(e.jac * e.union_est, 4) AS intersection_est
    FROM est e
    JOIN ex x ON x.type_a = e.type_a AND x.type_b = e.type_b
    JOIN n na ON na.event_type = e.type_a
    JOIN n nb ON nb.event_type = e.type_b
    """


@register("kmv_audience_overlap", oracle=_kmv_oracle_sql())
def kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch set algebra: per-event-type audience
    sketches (k smallest 62-bit portable hashes of the distinct user set),
    then UNION and INTERSECTION distinct estimates for every type pair —
    the overlap question HLL sketches cannot answer (no intersection
    merge). Ground-truth exact union/intersection ride along for the
    contract. Build: one distinct shuffle on (type, user) + a k-bounded
    window per type; pair estimation is O(k log k) array math on
    sketch-sized rows. Estimators are Beyer et al. 2007; with fewer than
    k distinct hashes the merged sample is the exact set (the sf0.001
    fixture exercises that regime, sf0.01+ the estimating one)."""
    k = 32
    ev = load_table(spark, sf_dir, "events")
    sk = SK.kmv_sketches(ev, "event_type", "user_id", k=k).localCheckpoint()
    a, b = sk.alias("a"), sk.alias("b")
    pairs = (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.sample").alias("sa"),
            F.col("b.sample").alias("sb"),
        )
    )
    est = SK.kmv_union_intersection(pairs, "sa", "sb", k=k)
    du = ev.select("event_type", "user_id").distinct().localCheckpoint()
    xa, xb = du.alias("xa"), du.alias("xb")
    ex = (
        xa.join(
            xb,
            (F.col("xa.user_id") == F.col("xb.user_id"))
            & (F.col("xa.event_type") < F.col("xb.event_type")),
        )
        .groupBy(
            F.col("xa.event_type").alias("type_a"),
            F.col("xb.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersection"))
    )
    n = du.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    return (
        est.join(ex, on=["type_a", "type_b"])
        .join(n.withColumnRenamed("event_type", "type_a").withColumnRenamed("nd", "na"), on="type_a")
        .join(n.withColumnRenamed("event_type", "type_b").withColumnRenamed("nd", "nb"), on="type_b")
        .select(
            "type_a",
            "type_b",
            (F.col("na") + F.col("nb") - F.col("exact_intersection"))
            .cast("bigint")
            .alias("exact_union"),
            "exact_intersection",
            r4(F.col("union_est")).alias("union_est"),
            r4(F.col("intersection_est")).alias("intersection_est"),
        )
    )


def _kmv_ngram_oracle_sql(k: int = 32, seed: int = 83) -> str:
    from graph_db_spark.operators.dedup import _MINHASH_P as P
    from graph_db_spark.operators.dedup import minhash_params

    hash_range = float(P * 2**31)
    (a1, b1), (a2, b2) = minhash_params(2, seed=seed)
    return f"""
    WITH words AS (
      SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    g AS (
      SELECT DISTINCT source, gram FROM (
        SELECT source,
               unnest(list_transform(range(0, greatest(len(w) - 2, 0)),
                                     i -> array_to_string(w[i+1:i+3], ' '))) AS gram
        FROM words
      )
    ),
    hs AS (
      SELECT DISTINCT source,
             ((({a1} * {_poly_sql('gram')} + {b1}) % {P}) * 2147483648
              + ({a2} * {_poly_sql('gram', 131)} + {b2}) % {P}) AS h
      FROM g
    ),
    r AS (
      SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      FROM hs
    ),
    sk AS (
      SELECT source, list_sort(list(h) FILTER (rn <= {k})) AS sample
      FROM r GROUP BY 1
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.sample AS sa, b.sample AS sb,
             list_sort(list_distinct(list_concat(a.sample, b.sample))) AS mall
      FROM sk a JOIN sk b ON a.source < b.source
    ),
    est AS (
      SELECT source_a, source_b,
             CASE WHEN len(mall) >= {k}
                  THEN {k - 1} * {hash_range!r} / mall[{k}]
                  ELSE CAST(len(mall) AS DOUBLE) END AS union_est,
             len(list_intersect(list_intersect(mall[1:{k}], sa), sb)) * 1.0
               / least(len(mall), {k}) AS jac
      FROM pairs
    ),
    ex AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS exact_intersection
      FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
      GROUP BY 1, 2
    ),
    n AS (SELECT source, count(*) AS nd FROM g GROUP BY 1)
    SELECT e.source_a, e.source_b,
           CAST(na.nd + nb.nd - coalesce(x.exact_intersection, 0) AS BIGINT)
             AS exact_union,
           CAST(coalesce(x.exact_intersection, 0) AS BIGINT)
             AS exact_intersection,
           round(e.union_est, 4) AS union_est,
           round(e.jac * e.union_est, 4) AS intersection_est
    FROM est e
    LEFT JOIN ex x ON x.source_a = e.source_a AND x.source_b = e.source_b
    JOIN n na ON na.source = e.source_a
    JOIN n nb ON nb.source = e.source_b
    """


@register("kmv_source_ngram_overlap", oracle=_kmv_ngram_oracle_sql())
def kmv_source_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-overlap via KMV sketches: one k-minimum-values sketch per
    SOURCE over its distinct word-trigram set, then pairwise union and
    INTERSECTION distinct estimates with exact ground truth — the
    cross-source contamination signal a mixture pipeline checks before
    blending feeds (two feeds with high n-gram overlap double-count
    content). Sketch build: one distinct shuffle on (source, gram),
    k-bounded window per source; every pair estimate afterwards is
    O(k log k) on 20 sketch rows — the raw gram sets are never joined
    pairwise (the exact columns here do join them, but they are the
    oracle contract, not the production path). Resolution caveat, by
    design: intersections smaller than union/k are below the sketch's
    floor and estimate to 0 (measured: union rel-err 15% mean at k=32;
    the 2.6%-overlap fixture pairs read 0) — raise k, or use the exact
    `benchmark_decontamination` path, when small overlaps matter."""
    k = 32
    docs = spread(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "source", F.explode(TX.word_ngrams(F.col("text"), 3)).alias("gram")
    )
    sk = SK.kmv_sketches(grams, "source", "gram", k=k).localCheckpoint()
    a, b = sk.alias("a"), sk.alias("b")
    pairs = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("a.sample").alias("sa"),
        F.col("b.sample").alias("sb"),
    )
    est = SK.kmv_union_intersection(pairs, "sa", "sb", k=k)
    du = grams.distinct().localCheckpoint()
    xa, xb = du.alias("xa"), du.alias("xb")
    ex = (
        xa.join(
            xb,
            (F.col("xa.gram") == F.col("xb.gram"))
            & (F.col("xa.source") < F.col("xb.source")),
        )
        .groupBy(
            F.col("xa.source").alias("source_a"),
            F.col("xb.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersection"))
    )
    n = du.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    return (
        est.join(ex, on=["source_a", "source_b"], how="left")
        .join(n.withColumnRenamed("source", "source_a").withColumnRenamed("nd", "na"), on="source_a")
        .join(n.withColumnRenamed("source", "source_b").withColumnRenamed("nd", "nb"), on="source_b")
        .select(
            "source_a",
            "source_b",
            (F.col("na") + F.col("nb") - F.coalesce("exact_intersection", F.lit(0)))
            .cast("bigint")
            .alias("exact_union"),
            F.coalesce("exact_intersection", F.lit(0))
            .cast("bigint")
            .alias("exact_intersection"),
            r4(F.col("union_est")).alias("union_est"),
            r4(F.col("intersection_est")).alias("intersection_est"),
        )
    )


def _bloom_oracle_sql(m: int = 4096, k: int = 3, seed: int = 101) -> str:
    from graph_db_spark.operators.dedup import _MINHASH_P as P
    from graph_db_spark.operators.dedup import minhash_params

    vals = ", ".join(f"({a}, {b})" for a, b in minhash_params(k, seed=seed))
    return f"""
    WITH bkeys AS (
      SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS key
      FROM part WHERE p_size <= 2
    ),
    bh AS (SELECT key, {_poly_sql('key')} AS hh FROM bkeys),
    bbits AS (
      SELECT DISTINCT ((a * hh + b) % {P}) % {m} AS bit
      FROM bh CROSS JOIN (VALUES {vals}) t(a, b)
    ),
    pk AS (SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS key FROM lineitem),
    ph AS (SELECT key, {_poly_sql('key')} AS hh FROM pk),
    probe AS (
      SELECT key,
             bool_and(((a * hh + b) % {P}) % {m} IN (SELECT bit FROM bbits))
               AS bloom_pass
      FROM ph CROSS JOIN (VALUES {vals}) t(a, b)
      GROUP BY key
    )
    SELECT CAST(p.key AS BIGINT) AS partkey, p.bloom_pass,
           (p.key IN (SELECT key FROM bkeys)) AS true_match
    FROM probe p
    """


@register("bloom_semi_prune", oracle=_bloom_oracle_sql())
def bloom_semi_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning: the distinct fact keys (lineitem
    partkeys) probed against a 4096-bit/3-hash Bloom filter of the small
    build side (parts with p_size ≤ 2), with ground truth attached. The
    filter densifies to an m-length 0/1 array in a one-row DataFrame and
    rides a broadcast cross join; each probe is k O(1) element_at calls —
    a narrow map, no shuffle, no join for non-matching keys (the shape of
    Spark's own runtime bloom-filter join, expressed portably so the
    oracle reproduces every bit). No false negatives by construction;
    false positives show as bloom_pass ∧ ¬true_match."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 2)
        .select(F.col("p_partkey").cast("string").alias("key"))
        .distinct()
    )
    bits = SK.bloom_bits(part, "key")
    keys = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").cast("string").alias("key"))
        .distinct()
    )
    probed = SK.bloom_contains(spread(keys), "key", bits)
    truth = part.withColumn("_t", F.lit(1))
    return (
        probed.join(F.broadcast(truth), on="key", how="left")
        .select(
            F.col("key").cast("bigint").alias("partkey"),
            "bloom_pass",
            F.col("_t").isNotNull().alias("true_match"),
        )
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    tf AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    ),
    df AS (
      SELECT token, count(DISTINCT source) AS df FROM tf GROUP BY 1
    ),
    ns AS (SELECT count(DISTINCT source) AS n_sources FROM tf),
    scored AS (
      SELECT t.source, t.token, t.tf,
             t.tf * ln((ns.n_sources + 1.0) / (d.df + 1.0)) AS score
      FROM tf t JOIN df d USING (token) CROSS JOIN ns
    ),
    ranked AS (
      SELECT source, token, tf, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, token) AS rn
      FROM scored
    )
    SELECT source, CAST(rn AS BIGINT) AS rn, token, tf,
           round(score, 4) AS tfidf
    FROM ranked WHERE rn <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-5 terms per source — the standard corpus-characterization
    pass (what distinguishes each feed in a mixed crawl). Two shuffles:
    (source, token) term frequencies with map-side combine, then the
    smoothed document-frequency table — VOCABULARY-sized, ≪ corpus — joins
    back broadcast. The per-source top-k window partitions by source, so
    no global sort ever happens. Smoothing ln((S+1)/(df+1)) keeps the
    math closed-form for the oracle."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    tf = (
        docs.select("source", F.explode(TX.tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    tf = tf.localCheckpoint()  # feeds df-counts, the scalar source count,
    # and the score join — three consumers, one execution
    df = tf.groupBy("token").agg(F.countDistinct("source").alias("df"))
    n_sources = tf.select("source").distinct().count()
    scored = tf.join(F.broadcast(df), on="token").select(
        "source",
        "token",
        "tf",
        (F.col("tf") * F.log((n_sources + 1.0) / (F.col("df") + 1.0))).alias("score"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "source",
            F.col("rn").cast("bigint").alias("rn"),
            "token",
            "tf",
            r4(F.col("score")).alias("tfidf"),
        )
    )


@register(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    open orders ⋈ not-yet-shipped lineitems, revenue top-10. All three
    predicates push into the parquet scans; the filtered customer key set
    joins first (AQE picks broadcast at dimension scale, shuffle join
    when the segment slice outgrows the threshold — no hint, stats are
    present on unrepartitioned scans), and the aggregation is map-side
    combined on l_orderkey. Top-10 via revenue with l_orderkey tiebreak —
    deterministic under LIMIT."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200
    )
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(o_totalprice, 4) AS o_totalprice,
           round(qty, 4) AS qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    lineitem quantity exceeds a threshold, with their customers. The
    HAVING aggregation reduces lineitem to a small qualifying-order set
    BEFORE any join — the classic aggregate-then-join inversion; the
    qualified side then rides broadcast into orders and customer, so the
    two big tables are each scanned once and never shuffled against each
    other."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 200)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            r4(F.col("o_totalprice")).alias("o_totalprice"),
            r4(F.col("qty")).alias("qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "vocab_coverage",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1
    ),
    ranked AS (
      SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rn,
             sum(cnt) OVER (ORDER BY cnt DESC, token
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER () AS total
      FROM counts
    )
    SELECT CAST(rn AS BIGINT) AS rn, token, cnt,
           round(cum * 1.0 / total, 4) AS coverage
    FROM ranked WHERE rn IN (1, 5, 10, 25, 50, 100)
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf vocabulary-coverage curve: what fraction of all token
    occurrences the top-N vocabulary covers (the tokenizer-budget planning
    number).

    NO global window anywhere (a web-scale corpus has 10⁸-10⁹ distinct
    tokens; round 3's global rank/cumsum sorted them on one core): the
    global rank AND the running token mass both come from the shared
    two-level prefix sum (`aggregates.with_global_rank` with a cumsum
    column — range partition + pid-partitioned windows + broadcast
    per-partition offsets)."""
    ranks = [1, 5, 10, 25, 50, 100]
    docs = spread(load_table(spark, sf_dir, "documents"))
    counts = (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        # materialize the corpus-sized explode+count ONCE; the ranked
        # rows, the offsets and the total recompute only vocabulary-sized
        # stages from here. Checkpointing above the window keeps the
        # Window node visible to the plan test.
        .localCheckpoint()
    )
    ranked = A.with_global_rank(
        counts, [F.desc("cnt"), F.asc("token")], rank_col="rn", cumsum_cols={"cum": "cnt"}
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        ranked.filter(F.col("rn").isin(ranks))
        .crossJoin(F.broadcast(total))
        .select(
            "rn",
            "token",
            "cnt",
            r4(F.col("cum") / F.col("total")).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Round-4 additions: exact-substring span detection, RAG chunking,
# embedding diversity, SemDeDup semantic dedup, tokenizer fertility,
# incremental (batch-vs-index) LSH dedup
# ---------------------------------------------------------------------------


@register(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the classic 6-way
    star-schema join — fact⋈fact on orderkey, the customer=supplier
    same-nation condition folded into the supplier join, and the
    region/nation dimension chain broadcast. Date range pushes into the
    orders scan; Catalyst orders the joins from the filtered dimensions
    inward. The canonical multi-way join-planning stress for an OLAP
    engine."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "order_value_deciles",
    oracle="""
    WITH totals AS (
      SELECT o_orderkey, o_custkey, sum(l_extendedprice * (1 - l_discount)) AS total
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    dec AS (
      SELECT ntile(10) OVER (ORDER BY total DESC, o_orderkey) AS decile, total
      FROM totals
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(total), 4) AS decile_revenue,
           round(min(total), 4) AS min_total,
           round(max(total), 4) AS max_total
    FROM dec GROUP BY decile
    """,
)
def order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth — revenue deciles of order totals (exact
    ANSI ``ntile(10)`` semantics): the top-decile concentration report.
    NO global window: the global rank comes from the reusable two-level
    prefix sum (``with_global_rank`` — range partition + pid-local
    row_number + broadcast offsets, the vocab_coverage rewrite factored
    for reuse) and the tile id from closed-form arithmetic over
    (rank, n) (``ntile_of``). Billions of orders rank as #partitions
    parallel sorts. Deterministic tiebreak on o_orderkey; the oracle
    runs DuckDB's real ntile window — matching it pins the arithmetic
    to exact ANSI tile assignment."""
    from graph_db_spark.operators.aggregates import ntile_of, with_global_rank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    totals = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total"))
        .localCheckpoint()  # ranked rows + the count scalar share one materialization
    )
    ranked = with_global_rank(totals, [F.desc("total"), F.asc("o_orderkey")])
    n_total = totals.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .withColumn("decile", ntile_of(F.col("rank"), F.col("_n"), 10))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            r4(F.sum("total")).alias("decile_revenue"),
            r4(F.min("total")).alias("min_total"),
            r4(F.max("total")).alias("max_total"),
        )
        .select(F.col("decile").cast("bigint").alias("decile"),
                "n_orders", "decile_revenue", "min_total", "max_total")
    )


def _session_iv_sql(event_type: str) -> str:
    """CTE body: gap-1800s session intervals of one event type (the
    sessionization oracle's lag/cumsum program, filtered)."""
    return f"""(
      SELECT user_id, min(ts) AS s, max(ts) AS e FROM (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        FROM (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events WHERE event_type = '{event_type}'
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        )
      ) GROUP BY user_id, sid
    )"""


@register(
    "session_overlap_pairs",
    oracle=f"""
    WITH ca AS {_session_iv_sql('click')},
    eb AS {_session_iv_sql('error')}
    SELECT CAST(ca.user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n_overlap_pairs
    FROM ca JOIN eb ON ca.user_id = eb.user_id
     AND ca.s <= eb.e AND eb.s <= ca.e
    GROUP BY ca.user_id
    """,
)
def session_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join — per user, pairs of CLICK sessions and ERROR sessions
    whose time intervals overlap ("were errors happening while the user
    was actively clicking?"). Composes the sessionizer with the
    ``interval_overlap_join`` operator (operators/joins.py): naive keyed
    range join here — per-key fan-out is sessions/user — with the
    bucketed variant as the hot-key scale path (hypothesis-tested
    result-identical)."""
    ev = load_table(spark, sf_dir, "events")

    def sess(t: str) -> DataFrame:
        return session_intervals(
            ev.filter(F.col("event_type") == t), ["user_id"], "ts", gap_seconds=1800
        ).select("user_id", "start_at", "end_at")

    pairs = J.interval_overlap_join(
        sess("click"),
        sess("error").withColumnRenamed("start_at", "e_start").withColumnRenamed("end_at", "e_end"),
        on=["user_id"],
        left_start="start_at", left_end="end_at",
        right_start="e_start", right_end="e_end",
    )
    return pairs.groupBy(F.col("user_id").cast("bigint").alias("user_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap_pairs")
    )


@register(
    "dow_seasonality",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
             avg(value) AS avg_value, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, dow, round(avg_value, 4) AS avg_value, n,
           round(avg_value / avg(avg_value) OVER (PARTITION BY event_type), 4)
             AS vs_weekly_mean
    FROM d
    """,
)
def dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: mean value and
    its ratio to the type's weekly mean (the capacity-planning /
    anomaly-baseline shape). One groupBy plus a window over the
    7×|types| profile table — bounded by the calendar, not the data.
    DuckDB's dayofweek is 0-6 Sunday-first; Spark's dayofweek is 1-7, so
    the Spark side maps to DuckDB's convention explicitly."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("bigint").alias("dow")
    ).agg(F.avg("value").alias("av"), F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type")
    return d.select(
        "event_type", "dow", r4(F.col("av")).alias("avg_value"), "n",
        r4(F.col("av") / F.avg("av").over(w)).alias("vs_weekly_mean"),
    )


@register(
    "degree_histogram",
    oracle=f"""
    WITH edges AS ({edges_sql()}),
    deg AS (
      SELECT id, count(*) AS d FROM (
        SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
      ) GROUP BY 1
    )
    SELECT CAST(length(printf('%b', d)) - 1 AS BIGINT) AS log2_degree_bin,
           CAST(count(*) AS BIGINT) AS n_vertices,
           CAST(min(d) AS BIGINT) AS min_degree,
           CAST(max(d) AS BIGINT) AS max_degree
    FROM deg GROUP BY 1
    """,
)
def degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-binned degree distribution of the graph — the first plot of
    any graph audit (power-law tail ⇒ expect skew in every per-vertex
    join). One degree aggregation + one bounded histogram groupBy; the
    bin count is log(max degree), independent of graph size. The bin is
    ⌊log2 d⌋ computed as bit_length(d) − 1 (binary-string length on both
    engines) — NEVER floor(ln d / ln 2): an integer emission has no
    round(,4) cushion, and at d = an exact power of two a 1-ulp libm
    difference flips the whole bin (the benford digit-clamp lesson,
    applied to the integer-exact alternative)."""
    g = build_graph(spark, sf_dir)
    deg = g.degrees()
    bin_ = F.length(F.conv(F.col("degree"), 10, 2)) - 1
    return deg.groupBy(bin_.cast("bigint").alias("log2_degree_bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
        F.min("degree").cast("bigint").alias("min_degree"),
        F.max("degree").cast("bigint").alias("max_degree"),
    )


@register(
    "rolling_anomaly_flags",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, value,
             avg(value) OVER win AS mu,
             stddev_samp(value) OVER win AS sd,
             count(*) OVER win AS nw
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) FILTER (nw >= 5 AND sd > 0 AND abs(value - mu) / sd > 3.0) AS BIGINT)
             AS n_anomalies,
           CAST(count(*) AS BIGINT) AS n_events
    FROM w GROUP BY 1
    """,
)
def rolling_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against the
    mean/stddev of its user's PRECEDING 10 events (trailing window — the
    point itself excluded, so an outlier can't mask itself), flagged at
    |z| > 3 once ≥5 points of history exist. Per-user partitioned ROWS
    window — parallel across users at any scale; the count rollup is the
    alerting summary."""
    ev = load_table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    scored = ev.select(
        "user_id",
        "value",
        F.avg("value").over(win).alias("mu"),
        F.stddev_samp("value").over(win).alias("sd"),
        F.count(F.lit(1)).over(win).alias("nw"),
    )
    is_anom = (
        (F.col("nw") >= 5)
        & (F.col("sd") > 0)
        & (F.abs(F.col("value") - F.col("mu")) / F.col("sd") > 3.0)
    )
    return scored.groupBy(F.col("user_id").cast("bigint").alias("user_id")).agg(
        F.sum(is_anom.cast("int")).cast("bigint").alias("n_anomalies"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


@register(
    "source_dup_rate",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS BIGINT)
             AS n_unique,
           round(1.0 - count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
                 * 1.0 / count(*), 4) AS dup_rate
    FROM documents GROUP BY source
    """,
)
def source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplication rate — the first number a curation
    review asks for per feed ("how much of this crawl is copies?").
    One groupBy with a distinct-count over the normalized content hash;
    at 100 TB flip ``profiling.distinct_count(exact=False)`` (mergeable
    per-source HLL, same re-aggregation story as hll_user_reach) with the
    exact form as the audit path and ``profile_distinct_approx_bound``
    as the error contract."""
    from graph_db_spark.operators.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(normalize_text(F.col("text")))
    nu = PF.distinct_count(h, exact=True)  # exact=False → per-source HLL
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        nu.cast("bigint").alias("n_unique"),
        r4(F.lit(1.0) - nu / F.count(F.lit(1))).alias("dup_rate"),
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    pairs AS (
      SELECT prev, event_type AS next, count(*) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev, next, CAST(n AS BIGINT) AS n_transitions,
           round(n * 1.0 / sum(n) OVER (PARTITION BY prev), 4) AS p
    FROM pairs
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition estimate over per-user event
    streams: for each (prev → next) event-type pair, the count and the
    conditional probability P(next | prev). One lag window PARTITIONED
    BY user (parallel — never global), one count aggregation, and a
    probability normalization windowed over the 5×5 transition table
    (bounded by the event-type vocabulary, not the data). The behavioral
    fingerprint sessions/funnels read their structure from.
    Deterministic ordering tiebreak on event_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    pairs = seq.groupBy("prev", F.col("event_type").alias("next")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev")
    return pairs.select(
        "prev",
        "next",
        F.col("n").cast("bigint").alias("n_transitions"),
        r4(F.col("n") / F.sum("n").over(wp)).alias("p"),
    )


def _cusum_oracle_sql(k_sig: float = 0.5, h_sig: float = 4.0) -> str:
    """Replay the CUSUM fold in DuckDB with the IDENTICAL left-to-right
    arithmetic: list ordered by (ts, event_id); mean and variance as
    left folds over the same order, so every intermediate double is
    bit-identical to the executor's python fold and the drift-count
    comparisons can't flip at boundaries. The per-key recurrence runs as
    a recursive CTE stepping index i (one row per key per step, sp'/sn'
    named ONCE in a subquery — DuckDB 1.0's list_reduce struct
    accumulators rebind fields sequentially mid-lambda, so the
    reduce-based formulation is not usable); same replay shape as the
    sequence_packing oracle."""
    return f"""
    WITH RECURSIVE ordered AS MATERIALIZED (
      SELECT user_id AS key, list(value ORDER BY ts, event_id) AS xs
      FROM events GROUP BY 1
    ),
    seq AS MATERIALIZED (
      SELECT key, xs, n, mean,
             CASE WHEN n > 1 THEN sqrt(
               list_reduce(list_prepend(0.0, list_transform(xs, x -> (x - mean) * (x - mean))),
                           (a, y) -> a + y) / (n - 1))
             ELSE 0.0 END AS std
      FROM (
        SELECT key, xs, len(xs) AS n,
               list_reduce(list_prepend(0.0, xs), (a, x) -> a + x) / len(xs) AS mean
        FROM ordered
      )
    ),
    rec(key, i, sp, sn, nd, mx) AS (
      SELECT key, 0, 0.0::DOUBLE, 0.0::DOUBLE, 0::BIGINT, 0.0::DOUBLE FROM seq
      UNION ALL
      SELECT key, i,
             CASE WHEN h > 0 AND (sp1 > h OR sn1 > h) THEN 0.0 ELSE sp1 END,
             CASE WHEN h > 0 AND (sp1 > h OR sn1 > h) THEN 0.0 ELSE sn1 END,
             nd + CASE WHEN h > 0 AND (sp1 > h OR sn1 > h) THEN 1 ELSE 0 END,
             greatest(mx, sp1, sn1)
      FROM (
        SELECT r.key, r.i + 1 AS i, r.nd AS nd, r.mx AS mx,
               {h_sig!r} * q.std AS h,
               greatest(0.0, r.sp + (q.xs[r.i + 1] - q.mean - {k_sig!r} * q.std)) AS sp1,
               greatest(0.0, r.sn + (q.mean - q.xs[r.i + 1] - {k_sig!r} * q.std)) AS sn1
        FROM rec r JOIN seq q ON q.key = r.key AND r.i < q.n
      )
    )
    SELECT CAST(r.key AS BIGINT) AS user_id, CAST(q.n AS BIGINT) AS n_events,
           CAST(r.nd AS BIGINT) AS n_drifts, round(r.mx, 4) AS max_cusum
    FROM rec r JOIN seq q ON q.key = r.key AND r.i = q.n
    """


@register("cusum_drift", oracle=_cusum_oracle_sql())
def cusum_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential change-point detection — two-sided self-calibrating
    CUSUM per user over the time-ordered value stream
    (operators/drift.py): the recurrence S⁺/S⁻ with reset-on-drift has
    no window-function form, so it runs as an ``applyInPandas`` fold per
    key (Arrow batches, keys parallel) — the same escape-hatch shape as
    sequence packing, with ``applyInPandasWithState`` as the streaming
    twin. EXACT oracle: DuckDB replays the identical left-to-right fold
    including the mean/variance arithmetic."""
    from graph_db_spark.operators.drift import cusum_drift

    ev = spread(load_table(spark, sf_dir, "events"))
    out = cusum_drift(ev, "user_id", "ts", "value", "event_id")
    return out.select(
        F.col("key").cast("bigint").alias("user_id"),
        "n_events",
        "n_drifts",
        r4(F.col("max_cusum")).alias("max_cusum"),
    )


def _weighted_sample_oracle_sql(k: int = 100, seed: int = 83) -> str:
    """Replay the Efraimidis-Spirakis keys in DuckDB: same portable
    62-bit hash (md5-window polys + affine, sketches.portable_hash64),
    same u=(h+1)/(range+1) map, same ln(u)/w key."""
    from graph_db_spark.operators.dedup import _MINHASH_P as P
    from graph_db_spark.operators.dedup import minhash_params

    (a1, b1), (a2, b2) = minhash_params(2, seed=seed)
    rng = float(P * 2**31)
    h64 = (
        f"((({a1} * {_poly_sql('CAST(doc_id AS VARCHAR)')} + {b1}) % {P}) * 2147483648"
        f" + (({a2} * {_poly_sql('CAST(doc_id AS VARCHAR)', 131)} + {b2}) % {P}))"
    )
    return f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln(({h64} + 1.0) / {rng + 1.0!r}) / greatest(n_chars, 1) AS k
      FROM documents
    )
    SELECT doc_id, n_chars, round(k, 4) + 0.0 AS es_key
    FROM keyed ORDER BY k DESC, doc_id LIMIT {k}
    """


@register("weighted_sample_docs", oracle=_weighted_sample_oracle_sql())
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each document gets key ln(u)/w — u a hash-derived
    uniform in (0,1), w its length weight — and the global top-k by key
    IS a weighted sample. No ``rand()`` anywhere: the sample is a pure
    function of the ids, so task retries, re-runs, and the DuckDB oracle
    all agree — the retry-safety discipline of `stratified_sample`
    extended to weighted selection. Top-k compiles to TakeOrdered
    (per-partition heaps + driver merge of k rows), never a global
    sort."""
    from graph_db_spark.operators.sketches import portable_hash64

    docs = spread(load_table(spark, sf_dir, "documents"))
    rng = float(2147483647 * 2**31)
    u = (portable_hash64(F.col("doc_id").cast("string")) + 1).cast("double") / F.lit(rng + 1.0)
    key = F.log(u) / F.greatest(F.col("n_chars"), F.lit(1))
    return (
        docs.select("doc_id", "n_chars", key.alias("k"))
        .orderBy(F.desc("k"), "doc_id")
        .limit(100)
        .select("doc_id", "n_chars", r4(F.col("k")).alias("es_key"))
    )


@register(
    "percentile_sketch_bound",
    oracle="""
    SELECT 'n_groups' AS metric, CAST(count(DISTINCT event_type) AS DOUBLE) AS value FROM events
    UNION ALL
    SELECT 'total_rows', CAST(count(*) AS DOUBLE) FROM events
    UNION ALL SELECT 'max_rank_err_le_001', 1.0
    """,
)
def percentile_sketch_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch quality bound — the mergeable-quantile half of the sketch
    family's contract story (the analogue of `hll_error_bound`):
    per-group ``approx_percentile`` (Spark's built-in mergeable KLL-style
    sketch, the documented 100 TB swap for `percentile_value_stats`)
    must land within rank error 0.01 of the true median. The rank of
    the sketch's answer is measured against the data itself (fraction of
    values ≤ it), so the contract row is exact arithmetic over exact
    counts — DuckDB verifies the facts and the bound without needing to
    replicate the sketch internals."""
    ev = load_table(spark, sf_dir, "events")
    apx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(1000)).alias("p50_apx")
    )
    ranked = (
        ev.join(F.broadcast(apx), on="event_type")
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.when(F.col("value") <= F.col("p50_apx"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("rank_frac")
        )
    )
    facts = _metric_rows(
        ev.agg(F.countDistinct("event_type").alias("v")).select(
            F.lit("n_groups").alias("metric"), F.col("v").cast("double").alias("value")
        ),
        ev.agg(F.count(F.lit(1)).alias("v")).select(
            F.lit("total_rows").alias("metric"), F.col("v").cast("double").alias("value")
        ),
    )
    contract = ranked.agg(F.max(F.abs(F.col("rank_frac") - 0.5)).alias("err")).select(
        F.lit("max_rank_err_le_001").alias("metric"),
        F.when(F.col("err") <= 0.01, 1.0).otherwise(0.0).alias("value"),
    )
    return _metric_rows(facts, contract)


@register(
    "last_touch_attribution",
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, ts AS pts, user_id, value
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT event_id AS tid, ts AS tts, user_id, event_type AS touch
      FROM events WHERE event_type IN ('view', 'click')
    ),
    sel AS (
      SELECT pid, pts, value, touch FROM (
        SELECT p.pid, p.pts, p.value, t.touch, t.tid,
               row_number() OVER (PARTITION BY p.pid
                 ORDER BY epoch(p.pts) - epoch(t.tts) ASC, t.tid ASC) AS rn
        FROM p LEFT JOIN t
          ON p.user_id = t.user_id AND t.tts <= p.pts
         AND epoch(p.pts) - epoch(t.tts) <= 86400
      ) WHERE rn = 1
    )
    SELECT strftime(pts, '%Y-%m-%d') AS day,
           coalesce(touch, 'unattributed') AS touch_type,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(value), 4) AS attributed_value
    FROM sel GROUP BY 1, 2
    """,
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution — each purchase credits the LAST view/click
    by the same user within 24h (backward as-of join with tolerance;
    purchases with no prior touch report as 'unattributed'). Reuses the
    J3 as-of operator in its attribution costume — the same
    join-then-rank program, with the bucketed variant as the scale path
    when a user's touch stream is hot."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("ts").alias("pts"),
        "user_id", F.col("value").alias("pvalue"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"), F.col("ts").alias("tts"),
        "user_id", F.col("event_type").alias("touch"),
    )
    matched = J.asof_join(
        purchases, touches, on=["user_id"], left_ts="pts", right_ts="tts",
        tolerance_seconds=86400, tiebreak_cols=["tid"], direction="backward",
    )
    return (
        matched.groupBy(
            F.date_format(F.to_date("pts"), "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("touch"), F.lit("unattributed")).alias("touch_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            r4(F.sum("pvalue")).alias("attributed_value"),
        )
    )


@register(
    "streaming_touch_pairs",
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, ts AS pts, user_id FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT ts AS tts, user_id, event_type AS touch FROM events
      WHERE event_type IN ('view', 'click')
    )
    SELECT strftime(p.pts, '%Y-%m-%d') AS day, t.touch AS touch_type,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p JOIN t ON p.user_id = t.user_id
     AND t.tts <= p.pts AND t.tts >= p.pts - INTERVAL 24 HOURS
    GROUP BY 1, 2
    """,
)
def streaming_touch_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 STREAM-STREAM join — purchases ⋈ touches by user within a
    24h interval, both sides arriving as streams with watermarks (the
    state-store shape none of the other streaming jobs exercise: both
    sides buffer, and the interval condition + watermarks bound the
    state). availableNow processes the full fixture, so the pair set
    equals the batch interval join exactly — the oracle is that batch
    join, aggregated per (day, touch type)."""
    import os
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    d = os.path.join(
        tempfile.gettempdir(),
        f"graft_stream_touch_{_sf_tag(sf_dir)}",
    )
    ev.write.mode("overwrite").parquet(d)
    p_stream = (
        spark.readStream.schema(ev.schema).parquet(d)
        .filter(F.col("event_type") == "purchase")
    )
    t_stream = (
        spark.readStream.schema(ev.schema).parquet(d)
        .filter(F.col("event_type").isin("view", "click"))
    )
    pairs = STRM.stream_touch_pairs(p_stream, t_stream)
    qname = "mem_touch_pairs"
    with _stream_state_partitions(spark):
        q = (
            pairs.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
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
    return (
        spark.table(qname)
        .groupBy(
            F.date_format(F.to_date("pts"), "yyyy-MM-dd").alias("day"),
            F.col("touch").alias("touch_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


@register(
    "cohort_retention",
    oracle="""
    WITH firstd AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS c0 FROM events GROUP BY 1
    ),
    act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    joined AS (
      SELECT strftime(f.c0, '%Y-%m-%d') AS cohort,
             CAST(a.d - f.c0 AS BIGINT) AS offset_days,
             a.user_id
      FROM act a JOIN firstd f USING (user_id)
    )
    SELECT cohort, offset_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
    FROM joined GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    day; for each (cohort, day-offset) the count of still-active users —
    the standard product-analytics triangle. Two aggregations + one join
    on user_id (the first-day table is user-sized and co-partitioned
    with the activity table on the join key — no broadcast assumption at
    100 TB, where user counts are huge but the join is a plain key
    shuffle both sides)."""
    ev = load_table(spark, sf_dir, "events")
    firstd = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("c0"))
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        act.join(firstd, on="user_id")
        .groupBy(
            F.date_format("c0", "yyyy-MM-dd").alias("cohort"),
            F.datediff("d", "c0").cast("bigint").alias("offset_days"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users"))
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH steps AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY 1, 2
    )
    SELECT day,
           CAST(count(*) FILTER (t_view IS NOT NULL) AS BIGINT) AS viewed,
           CAST(count(*) FILTER (t_view IS NOT NULL AND t_click > t_view) AS BIGINT) AS clicked,
           CAST(count(*) FILTER (t_view IS NOT NULL AND t_click > t_view
                                 AND t_purchase > t_click) AS BIGINT) AS purchased
    FROM steps GROUP BY day
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence funnel: per (user, day), the first timestamp of
    each step; a user converts a step only if it happens strictly AFTER
    the previous step's first occurrence (view → click → purchase).
    One conditional-min aggregation per step inside a single groupBy —
    no self-joins, no per-user sorting; the standard funnel formulation
    that scales as one map-side-combined pass over the event stream."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    steps = ev.groupBy("user_id", day).agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return steps.groupBy("day").agg(
        F.sum(viewed.cast("int")).cast("bigint").alias("viewed"),
        F.sum(clicked.cast("int")).cast("bigint").alias("clicked"),
        F.sum(purchased.cast("int")).cast("bigint").alias("purchased"),
    )


def _ppr_oracle_sql(iters: int = 10, reset: float = 0.15) -> str:
    """Unrolled power-iteration oracle for personalized PageRank with the
    5 Region vertices as the restart set — same conservation-based
    dangling recovery as graph/algorithms.personalized_pagerank, restart
    mass deposited only on sources. MATERIALIZED per the PageRank oracle
    lesson (plain CTEs inline exponentially in DuckDB)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({edges_sql()})",
        "verts AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges))",
        "sn AS MATERIALIZED (SELECT count(*) AS ns FROM verts WHERE id LIKE 'R:%')",
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)",
        "w AS MATERIALIZED (SELECT edges.src AS id, edges.dst, 1.0 / deg.d AS wt FROM edges JOIN deg ON edges.src = deg.src)",
        "pr0 AS (SELECT id, CASE WHEN id LIKE 'R:%' THEN 1.0 / (SELECT ns FROM sn) ELSE 0.0 END AS rank FROM verts)",
    ]
    final = "pr0"
    for i in range(iters):
        p, q = f"pr{i}", f"pr{i + 1}"
        parts += [
            f"c{i} AS (SELECT w.dst AS id, sum({p}.rank * w.wt) AS contrib FROM {p} JOIN w ON {p}.id = w.id GROUP BY w.dst)",
            f"t{i} AS MATERIALIZED (SELECT v.id, {1 - reset} * coalesce(c{i}.contrib, 0) AS rank"
            f" FROM verts v LEFT JOIN c{i} ON v.id = c{i}.id)",
            f"{q} AS MATERIALIZED (SELECT id, rank + CASE WHEN id LIKE 'R:%'"
            f" THEN (1.0 - (SELECT sum(rank) FROM t{i})) / (SELECT ns FROM sn) ELSE 0.0 END AS rank FROM t{i})",
        ]
        final = q
    return ",\n".join(parts) + f"""
    SELECT label, round(mass, 6) AS mass, CAST(n AS BIGINT) AS n FROM (
      SELECT substr(id, 1, 1) AS label, sum(rank) AS mass, count(*) AS n
      FROM {final} GROUP BY 1
    )
    """


@register("personalized_pagerank_regions", oracle=_ppr_oracle_sql())
def personalized_pagerank_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — personalized PageRank restarted at the 5 Region
    vertices (random walk with restart: rank = proximity to the seed
    set). Checked against a full unrolled power-iteration oracle on
    per-label rank masses, like the uniform `pagerank` query — a wrong
    restart vector or dangling-to-sources recovery shifts label masses
    at the 3rd-4th decimal and fails the gate."""
    from graph_db_spark.graph.algorithms import personalized_pagerank

    g = build_graph(spark, sf_dir)
    sources = g.vertices.filter(F.col("label") == "Region").select("id")
    pr = personalized_pagerank(
        g.edges, sources, max_iter=10, n_partitions=_graph_nparts(sf_dir)
    )
    return (
        pr.groupBy(F.substring("id", 1, 1).alias("label"))
        .agg(
            F.round(F.sum("rank"), 6).alias("mass"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


@register(
    "unigram_logperplexity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
    t AS (SELECT count(*) AS n FROM toks)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln(cnt * 1.0 / n)), 4) AS avg_neg_logp
    FROM toks JOIN c USING (token) CROSS JOIN t
    GROUP BY doc_id
    """,
)
def unigram_logperplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-curation perplexity proxy: per document, the mean negative
    log-probability of its tokens under the corpus's own unigram
    distribution — cheap outlier/gibberish signal (high = rare-token
    soup, low = stopword soup) used to bucket documents before an
    expensive model-based quality pass. One token-count aggregation +
    one equi-join on token (both sides shuffle on the same key; at
    web scale the unigram table is itself distributed — no broadcast
    assumption), then a per-doc mean."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        toks.join(counts, on="token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            r4(F.avg(-F.log(F.col("cnt") / F.col("n")))).alias("avg_neg_logp"),
        )
    )


@register(
    "quality_quantile_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, text,
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents
    ), hits AS (
      SELECT doc_id, source, text,
             len(list_distinct(list_intersect(t, {{sw_en}}))) AS h_en,
             len(list_distinct(list_intersect(t, {{sw_es}}))) AS h_es,
             len(list_distinct(list_intersect(t, {{sw_de}}))) AS h_de,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok
      FROM toks
    ), q AS (
      SELECT doc_id, source,
             round((least(n_tok / 50.0, 1.0)
                    + (1.0 - least(((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) * 1.0
                                    / nullif(length(text), 0)) * 5.0, 1.0))
                    + least((h_en + h_es + h_de) / 5.0, 1.0)) / 3.0, 4) AS quality
      FROM hits
    ), med AS (
      SELECT source, quantile_cont(quality, 0.5) AS median_q FROM q GROUP BY 1
    )
    SELECT q.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (q.quality >= med.median_q) AS BIGINT) AS n_kept,
           round(med.median_q, 4) AS median_q
    FROM q JOIN med ON q.source = med.source
    GROUP BY q.source, med.median_q
    """.replace("{sw_en}", _SW_SQL["en"]).replace("{sw_es}", _SW_SQL["es"]).replace("{sw_de}", _SW_SQL["de"]),
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation: per-source quantile-relative quality filtering — keep
    documents at or above their source's MEDIAN quality score (absolute
    thresholds are wrong across heterogeneous sources; quantile cuts are
    the standard mixture-curation move). Exact interpolated median here
    (oracle-checkable); at 100 TB flip ``profiling.percentile(
    exact=False)`` — per-source medians then come from a single sketch
    pass, with ``quantile_approx_bound`` as the error contract. The
    median is computed over 4-decimal-rounded scores so both engines
    compare identical doubles at the cut boundary."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("source", r4(TX.quality_score("text")).alias("quality"))
    med = q.groupBy("source").agg(PF.percentile(F.col("quality"), 0.5).alias("median_q"))
    return (
        q.join(F.broadcast(med), on="source")
        .groupBy("source", "median_q")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("quality") >= F.col("median_q"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .select("source", "n_docs", "n_kept", r4(F.col("median_q")).alias("median_q"))
    )


def _k_core_oracle_sql(k: int = 4, rounds: int = 14) -> str:
    """Unrolled peel replay of graph/algorithms.py:k_core. The Spark side
    iterates to a fixpoint; the oracle unrolls ``rounds`` peels — the
    sf0.01 fixture converges in 9 (sf0.001 in 6, probed), and extra
    rounds are no-ops after the fixpoint, so 14 gives margin without
    changing the answer. MATERIALIZED so DuckDB doesn't inline the
    peeling chain exponentially."""
    parts = [
        f"WITH edges AS ({edges_sql()})",
        "sym0 AS MATERIALIZED (SELECT DISTINCT a, b FROM ("
        " SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges)"
        " WHERE a <> b)",
    ]
    for r in range(rounds):
        parts.append(
            f"keep{r} AS MATERIALIZED (SELECT a FROM sym{r} GROUP BY a HAVING count(*) >= {k})"
        )
        parts.append(
            f"sym{r + 1} AS MATERIALIZED (SELECT s.a, s.b FROM sym{r} s"
            f" JOIN keep{r} ka ON s.a = ka.a JOIN keep{r} kb ON s.b = kb.a)"
        )
    return ",\n".join(parts) + f"""
    SELECT a AS id, CAST(count(*) AS BIGINT) AS degree
    FROM sym{rounds} GROUP BY a
    """


@register("k_core_4", oracle=_k_core_oracle_sql())
def k_core_4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — the 4-core of the fixture graph (iterative
    degree peeling to the unique fixpoint; graph/algorithms.py:k_core).
    Line vertices have degree 3, so k=4 triggers a genuine multi-round
    cascade (9 rounds at sf0.01). Each round is one degree aggregation +
    two semi-joins, shuffling on vertex id — the same per-round shape as
    connected components, with localCheckpoint bounding lineage."""
    from graph_db_spark.graph.algorithms import k_core

    g = build_graph(spark, sf_dir)
    # NOT assume_simple: the synthetic lineitem table has duplicate
    # (orderkey, linenumber) pairs, so the graph is a genuine multigraph
    # and the symmetrization dedup is semantically required (verified:
    # skipping it inflates the core by 30%)
    return k_core(g.edges, 4)


@register(
    "disjunctive_discount_revenue",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 5 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 10 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    GROUP BY 1 ORDER BY 1
    """,
)
def disjunctive_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive predicates): an OR-of-ANDs spanning
    both join sides. The per-table slices of the disjunction are
    derivable (Catalyst's constraint propagation pushes
    ``p_brand IN (...)`` / the p_size hull into the part scan and the
    l_quantity hull into the lineitem scan), so the join sees pre-pruned
    inputs and only the residual mixed-table disjunction evaluates as
    the join filter. The part side is dimension-sized → broadcast. The
    plan property that matters at 100 TB: a naive engine evaluates the
    whole OR post-join over the full fact scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(10, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        )
        .orderBy("p_brand")
    )


@register(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_rev
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the revenue view + global-argmax
    scalar subquery. Decorrelation: the quarter's per-supplier revenue
    aggregates once (map-side combined, date range pushed into the
    scan), the 1-row MAX broadcasts back over the SAME materialized
    aggregate. The revenue view is localCheckpointed — it is
    supplier-cardinality, i.e. dimension-sized — because exchange reuse
    across the two consumers is not guaranteed (verified: the
    un-materialized form plans TWO lineitem scans); materializing is how
    Q15's CREATE VIEW is meant to behave, and the plan test pins the
    single fact scan. Ties all surface (no arbitrary LIMIT 1), on the
    ROUNDED revenue so both engines compare identical values."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_rev")
    ).localCheckpoint()
    mx = rev.agg(F.max("total_rev").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            "total_rev",
        )
        .orderBy("s_suppkey")
    )


def _weighted_paths_oracle() -> str:
    from graph_db_spark.graph.build import edges_sql

    w = _poly_sql("src || '|' || dst")
    return f"""
    WITH RECURSIVE e AS MATERIALIZED (
      SELECT src, dst, {w} % 9 + 1 AS w FROM ({edges_sql()})
    ),
    walk(id, dist) AS (
      SELECT 'R:0', CAST(0 AS BIGINT)
      UNION ALL
      SELECT e.dst, walk.dist + e.w FROM walk JOIN e ON e.src = walk.id
    ),
    best AS (SELECT id, min(dist) AS dist FROM walk GROUP BY 1)
    SELECT substr(id, 1, 1) AS label, CAST(dist AS BIGINT) AS dist,
           CAST(count(*) AS BIGINT) AS n
    FROM best GROUP BY 1, 2
    """


@register("weighted_paths_from_region", oracle=_weighted_paths_oracle())
def weighted_paths_from_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — WEIGHTED shortest paths from the Region landmark
    (Bellman-Ford relax rounds, graph/algorithms.py:
    weighted_shortest_paths). Suppliers are reachable both directly
    (2 hops) and through lineitems (5 hops) with independent hash
    weights, so the lighter-but-longer path genuinely wins for some
    vertices — the case plain BFS cannot express. Edge weights are the
    engine-portable md5-window hash of (src|dst) in [1, 9] (integer
    arithmetic end-to-end, so the oracle is EXACT: DuckDB re-derives the
    same weights and walks the DAG with a recursive CTE + min). Output
    is aggregated to (label, dist, n) to keep the comparison compact."""
    from graph_db_spark.graph.algorithms import weighted_shortest_paths
    from graph_db_spark.operators.dedup import portable_hash

    g = build_graph(spark, sf_dir)
    e = g.edges.select(
        "src",
        "dst",
        (portable_hash(F.concat_ws("|", F.col("src"), F.col("dst"))) % 9 + 1).alias("weight"),
    )
    lms = g.vertices.filter(F.col("id") == "R:0").select("id")
    sp = weighted_shortest_paths(e, lms, n_partitions=_graph_nparts(sf_dir))
    return (
        sp.groupBy(
            F.substring("id", 1, 1).alias("label"), F.col("dist").cast("bigint").alias("dist")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register(
    "snapshot_table_lifecycle",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_mktsegment, c_acctbal FROM customer WHERE c_custkey <= 1000
    ),
    up1 AS (
      SELECT c_custkey, c_mktsegment, c_acctbal + 100 AS c_acctbal
      FROM customer WHERE c_custkey > 900 AND c_custkey <= 1100
    ),
    up2 AS (
      SELECT c_custkey, c_mktsegment, c_acctbal + 200 AS c_acctbal
      FROM customer WHERE c_custkey > 1050 AND c_custkey <= 1200
    ),
    m1 AS (
      SELECT * FROM up1
      UNION ALL
      SELECT * FROM base WHERE c_custkey NOT IN (SELECT c_custkey FROM up1)
    ),
    m2 AS (
      SELECT * FROM up2
      UNION ALL
      SELECT * FROM m1 WHERE c_custkey NOT IN (SELECT c_custkey FROM up2)
    ),
    final AS (SELECT * FROM m2 WHERE c_custkey % 97 <> 0)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           round(sum(c_acctbal), 4) AS total_bal
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def snapshot_table_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table format — the full snapshot-table DML lifecycle under the
    exact oracle (writers/snapshots.py): create → copy-on-write MERGE →
    merge-on-read fast-ingest MERGE (delta files, read-side resolution)
    → keyed DELETE → compact, then read the final snapshot and
    aggregate per segment. The oracle replays the same upsert semantics
    as precedence unions in plain SQL — what the oracle checks is that
    five commits of manifest arithmetic (atomic publishes, carried
    files, seq resolution, anti-join delete, defragmentation) preserve
    exactly the state a direct computation produces. The reference's
    MERGE-everything write story (app/graph_fields.py:16-25) lands here
    as a transactional table, not a directory swap."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import SnapshotTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tag = _sf_tag(sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"graft_snaptable_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable.create(
        spark, path, cust.filter(F.col("c_custkey") <= 1000), ["c_custkey"], n_buckets=8
    )
    t.merge(
        cust.filter((F.col("c_custkey") > 900) & (F.col("c_custkey") <= 1100))
        .withColumn("c_acctbal", F.col("c_acctbal") + 100)
    )
    t.merge(
        cust.filter((F.col("c_custkey") > 1050) & (F.col("c_custkey") <= 1200))
        .withColumn("c_acctbal", F.col("c_acctbal") + 200),
        mode="mor",
    )
    t.delete(
        cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    )
    t.compact()
    return (
        t.read()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            r4(F.sum("c_acctbal")).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "incremental_view_maintenance",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_mktsegment, c_acctbal FROM customer WHERE c_custkey <= 800
    ),
    up AS (
      SELECT c_custkey, c_mktsegment, c_acctbal * 2 AS c_acctbal
      FROM customer WHERE c_custkey > 700 AND c_custkey <= 900
    ),
    m1 AS (
      SELECT * FROM up
      UNION ALL
      SELECT * FROM base WHERE c_custkey NOT IN (SELECT c_custkey FROM up)
    ),
    final AS (SELECT * FROM m1 WHERE c_custkey % 53 <> 0)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           round(sum(c_acctbal), 4) AS total_bal
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def incremental_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table format — incremental view maintenance under the exact
    oracle: a per-segment COUNT/SUM view is NEVER recomputed from the
    table; it is maintained purely by folding each commit's CDC feed
    (old-image retraction + new-image addition,
    writers/snapshots.py:apply_changes_to_aggregate) across a create →
    COW merge → keyed delete sequence. The oracle computes the final
    view directly from the same DML replayed in SQL — a hash match
    proves the delta algebra (including the doubled-balance updates and
    the deletes' retractions) reconstructs the direct answer exactly.
    At 100 TB this is the materialized-view story: maintenance cost ∝
    churn, never table size."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import (
        SnapshotTable,
        apply_changes_to_aggregate,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tag = _sf_tag(sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"graft_ivm_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable.create(
        spark, path, cust.filter(F.col("c_custkey") <= 800), ["c_custkey"], n_buckets=8
    )
    groups, sums = ["c_mktsegment"], ["c_acctbal"]
    feed0 = (
        t.read()
        .withColumn("_change", F.lit("insert"))
        .withColumn("_old_c_mktsegment", F.lit(None).cast("string"))
        .withColumn("_old_c_acctbal", F.lit(None).cast("double"))
    )
    view = apply_changes_to_aggregate(None, feed0, groups, sums).localCheckpoint()
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
        view = apply_changes_to_aggregate(view, feed, groups, sums).localCheckpoint()
    return view.select(
        "c_mktsegment",
        F.col("n").cast("bigint").alias("n"),
        r4(F.col("sum_c_acctbal")).alias("total_bal"),
    ).orderBy("c_mktsegment")


@register(
    "join_key_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT 'lineitem.l_orderkey' AS key_col, CAST(l_orderkey AS VARCHAR) AS k
      FROM lineitem
      UNION ALL
      SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
      UNION ALL
      SELECT 'events.user_id', CAST(user_id AS VARCHAR) FROM events
    ),
    counts AS (
      SELECT key_col, k, count(*) AS c FROM per_key GROUP BY 1, 2
    )
    SELECT key_col,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_key_rows,
           round(max(c) / avg(c), 4) AS skew_ratio
    FROM counts GROUP BY 1 ORDER BY 1
    """,
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnostics — join-key skew profile: per candidate join key, row
    count, key cardinality, the heaviest key's row count, and the
    max/avg skew ratio. This is the measurement that decides between a
    plain shuffle join, AQE skew splitting, and explicit salting
    (``salted_skew_join``); running it as a first-class query means the
    decision is data-driven, not guessed. One count-per-key aggregation
    per profiled column (map-side combined) + a key_col-grouped rollup —
    at 100 TB each profile is a single linear pass."""
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    sides = [
        ("lineitem.l_orderkey", li.select(F.col("l_orderkey").cast("string").alias("k"))),
        ("lineitem.l_partkey", li.select(F.col("l_partkey").cast("string").alias("k"))),
        ("events.user_id", ev.select(F.col("user_id").cast("string").alias("k"))),
    ]
    per = None
    for name, side in sides:
        tagged = side.withColumn("key_col", F.lit(name))
        per = tagged if per is None else per.unionByName(tagged)
    counts = per.groupBy("key_col", "k").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("key_col")
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("c").cast("bigint").alias("max_key_rows"),
            r4(F.max("c") / F.avg("c")).alias("skew_ratio"),
        )
        .orderBy("key_col")
    )


@register(
    "bpe_top_pairs",
    oracle="""
    WITH wf AS (
      SELECT w, CAST(count(*) AS BIGINT) AS wf
      FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY 1
    ),
    v AS (SELECT wf, string_split_regex(w, '') AS a FROM wf),
    pc AS (
      SELECT unnest(list_transform(range(1, len(a)),
                                   i -> a[i] || ' ' || a[i + 1])) AS pair,
             wf
      FROM v
    )
    SELECT pair, CAST(sum(wf) AS BIGINT) AS freq
    FROM pc GROUP BY 1 ORDER BY freq DESC, pair LIMIT 20
    """,
)
def bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training — one BPE round's heavy step: frequency-
    weighted adjacent-symbol-pair counts over the word-frequency
    vocabulary (operators/text.py:pair_stats). The corpus collapses to
    the vocabulary FIRST (one shuffle), so at 100 TB every merge round
    is a vocabulary-sized aggregation — corpus size only ever affects
    round one. The full iterative trainer (``bpe_learn``) is pinned
    against a canonical Python BPE in tests/test_llm_ops.py; this query
    puts its distributed step under the exact DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = TX.word_freq_table(docs, "text").select(
        "wf", F.split("w", "").alias("syms")
    )
    return TX.pair_stats(vocab, k=20)


@register(
    "tokenizer_fertility",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(len(string_split_regex(trim(text), '\\s+'))), 4) AS avg_words,
           round(avg(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))), 4) AS avg_bpe_ish,
           round(sum(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) * 1.0)
                 / sum(len(string_split_regex(trim(text), '\\s+'))), 4) AS fertility
    FROM documents GROUP BY lang
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-budget planning: per language, mean whitespace words,
    mean BPE-ish tokens, and fertility (BPE tokens per word) — the
    number that converts a per-language document budget into a token
    budget for mixture planning. Pure Column expressions over the scan;
    one small groupBy on lang."""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select(
        "lang",
        TX.token_count("text").cast("double").alias("w"),
        TX.bpe_ish_token_count("text").cast("double").alias("b"),
    )
    return stats.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        r4(F.avg("w")).alias("avg_words"),
        r4(F.avg("b")).alias("avg_bpe_ish"),
        r4(F.sum("b") / F.sum("w")).alias("fertility"),
    )


@register(
    "incremental_lsh_dedup",
    oracle=f"""
    WITH {_minhash_band_sql(cands_pred="a.doc_id >= 400 AND b.doc_id < 400")}
    SELECT id_a AS new_id, id_b AS corpus_id FROM cands
    """,
)
def incremental_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the production crawl-ingest shape: a NEW
    batch (doc_id ≥ 400 here) is deduped against the persisted banded
    LSH index of the existing corpus (doc_id < 400) without the corpus
    ever self-joining or re-signing (operators/dedup.py:minhash_banded /
    minhash_lsh_candidates_against). Shuffle volume is O(batch·bands) +
    touched index rows; oversized new-side buckets take the skew-join
    split. Complements `streaming_exact_dedup` (ingest-time exact half)
    and `minhash_lsh_dedup` (at-rest full sweep)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)
    index = D.minhash_banded(corpus, "text", "doc_id")
    return D.minhash_lsh_candidates_against(new, index, "text", "doc_id")


@register(
    "streaming_incremental_dedup",
    oracle=f"""
    WITH {_minhash_band_sql(cands_pred="a.doc_id >= 400 AND b.doc_id < 400")}
    SELECT id_a AS new_id, id_b AS corpus_id FROM cands
    """,
)
def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 streaming × dedup — the ingest-time form of
    `incremental_lsh_dedup`: new documents arrive in MICRO-BATCHES
    (maxFilesPerTrigger) and each batch is LSH-checked against the
    static banded index of the existing corpus via ``foreachBatch``
    (streaming/jobs.py:stream_incremental_dedup). Batching cannot change
    the answer — candidates are per-document against a static index —
    so the oracle is the same as the batch query's; the union of batch
    outputs must hash-match it exactly."""
    import os
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)
    # index built once, materialized — every micro-batch reuses the rows
    index = D.minhash_banded(corpus, "text", "doc_id").localCheckpoint()
    tag = _sf_tag(sf_dir)
    src = os.path.join(tempfile.gettempdir(), f"graft_incdedup_src_{tag}")
    out = os.path.join(tempfile.gettempdir(), f"graft_incdedup_out_{tag}")
    ckpt = os.path.join(tempfile.gettempdir(), f"graft_incdedup_ckpt_{tag}")
    for d in (out, ckpt):  # append-mode sink + checkpoint must start clean
        shutil.rmtree(d, ignore_errors=True)
    new.repartition(6).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 2)  # force several micro-batches
        .parquet(src)
    )
    q = STRM.stream_incremental_dedup(stream, index, out, ckpt)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming query did not finish within 300s — the memory sink "
            "is partial; failing loudly instead of surfacing a confusing "
            "oracle mismatch (r5 ADVICE #2)"
        )
    return spark.read.parquet(out).select("new_id", "corpus_id").distinct()


@register(
    "repeated_spans",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(0, greatest(len(w) - 4, 0)),
                                   i -> array_to_string(w[i+1:i+5], ' '))) AS span
      FROM w
    )
    SELECT span,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM g GROUP BY span HAVING count(DISTINCT doc_id) >= 2
    ORDER BY n_occurrences DESC, span LIMIT 20
    """,
)
def repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication scan (the bounded-window variant of
    Lee et al. 2022's suffix-array dedup): 5-token spans appearing in ≥2
    distinct documents, with doc and occurrence counts — top-20 by
    frequency. Position-sensitive n-grams (repeats kept) so within-doc
    boilerplate repetition counts too.

    Scale shape: explode + one groupBy on the span string — linear
    shuffle with map-side combine; no pair joins. A 100 TB run groups on
    a span HASH instead of the string (8 bytes vs ~40) and bloom-filters
    singleton spans before the shuffle; the fixture keeps the raw string
    so the DuckDB oracle needs no hash replay."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    spans = docs.select(
        "doc_id", F.explode(TX.positional_ngrams(F.col("text"), 5)).alias("span")
    )
    return (
        spans.groupBy("span")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_occurrences"), "span")
        .limit(20)
    )


@register(
    "doc_chunks",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    starts AS (
      SELECT doc_id, w, unnest(range(1, greatest(len(w), 1) + 1, 24)) AS start
      FROM w
    )
    SELECT doc_id,
           CAST((start - 1) / 24 AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS start_tok,
           CAST(len(w[start:start+31]) AS BIGINT) AS n_tokens,
           array_to_string(w[start:start+31], ' ') AS chunk
    FROM starts
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG / context-window chunking: overlapping 32-token windows every
    24 tokens (8-token overlap), one row per chunk with its index, start
    offset, and cropped tail. Pure Column expressions (sequence + slice)
    — chunking is a narrow map over the scan at any scale; the chunk
    table is what the embedding and packing stages consume."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    chunk = F.explode(TX.chunk_tokens(F.col("text"), 32, 24)).alias("c")
    return docs.select("doc_id", chunk).select(
        "doc_id",
        F.col("c.chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("c.start_tok").cast("bigint").alias("start_tok"),
        F.col("c.n_tokens").cast("bigint").alias("n_tokens"),
        F.col("c.chunk").alias("chunk"),
    )


@register(
    "embedding_diversity",
    oracle="""
    WITH nrm AS (
      SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    u AS (
      SELECT label,
             unnest(list_transform(v, x -> CASE WHEN sqrt(list_dot_product(v, v)) > 0
                                                THEN x / sqrt(list_dot_product(v, v))
                                                ELSE 0.0 END)) AS x,
             generate_subscripts(v, 1) AS pos
      FROM nrm
    ),
    s AS (SELECT label, pos, sum(x) AS s FROM u GROUP BY 1, 2),
    ss AS (SELECT label, sum(s * s) AS ss FROM s GROUP BY 1),
    n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vectors FROM embeddings GROUP BY 1)
    SELECT CAST(label AS BIGINT) AS label, n_vectors,
           round(CASE WHEN n_vectors > 1
                      THEN (ss - n_vectors) / (n_vectors * (n_vectors - 1.0)) END, 4)
             + 0.0 AS mean_pairwise_cosine
    FROM ss JOIN n USING (label)
    """,
)
def embedding_diversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-curation diversity metric: per label, the mean pairwise
    cosine similarity of its embeddings — computed WITHOUT the O(n²)
    pair join via the sum-vector identity ‖Σu‖² − n (operators/
    similarity.py:embedding_diversity). O(n·dim) work and one (key, pos)
    partial-sum shuffle: the redundancy number a mixture planner reads
    per source, at any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = SIM.embedding_diversity(emb, "embedding", ["label"])
    return out.select(
        F.col("label").cast("bigint").alias("label"), "n_vectors", "mean_pairwise_cosine"
    )


def _semantic_dedup_oracle_sql(n_centroids: int = 16, lloyd_iters: int = 3,
                               dim: int = 64, threshold: float = 0.3) -> str:
    """SemDeDup oracle: the shared IVF training replay (same centroids,
    same assignment tiebreak), then the within-cluster keep-first rule."""
    parts = _ivf_training_sql(n_centroids, lloyd_iters, dim)
    parts += [
        f"""dup AS (
      SELECT DISTINCT b.neighbor_id AS id
      FROM casg a JOIN casg b
        ON a.cluster = b.cluster AND a.neighbor_id < b.neighbor_id
      WHERE CASE WHEN sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv)) > 0
                 THEN list_dot_product(a.cv, b.cv)
                      / (sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv)))
                 ELSE 0.0 END >= {threshold!r})"""
    ]
    return ",\n".join(parts) + """
    SELECT c.neighbor_id AS vec_id, CAST(c.cluster AS BIGINT) AS cluster,
           d.id IS NULL AS is_kept
    FROM casg c LEFT JOIN dup d ON c.neighbor_id = d.id
    """


@register("semantic_dedup", oracle=_semantic_dedup_oracle_sql())
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023): IVF-cluster
    the embeddings, drop every vector whose cosine to a lower-id member
    of the SAME cluster is ≥ 0.3 (keep-first). The pair space is bounded
    per cluster by the quantizer (never a corpus-wide pair join), guarded
    by the same big-block probe as the text dedup path. EXACT oracle via
    the shared unrolled-Lloyd centroid replay."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.semantic_dedup(emb, "embedding", "vec_id", threshold=0.3)


# ---------------------------------------------------------------------------
# Round-4 additions (session B): classic decision-support shapes the
# reference's scan→join→agg surface implies but no prior query exercised
# (TPC-H Q4/Q10 shapes), warehouse SCD2 history build, deterministic
# train/valid/test splitting + shard planning for training corpora,
# robust (median/MAD) outlier flags, and two graph-ML staples —
# Adamic-Adar link prediction and label-propagation communities.
# ---------------------------------------------------------------------------


@register(
    "order_priority_checking",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking; late-shipment variant —
    the fixture carries l_shipdate, not commit/receipt dates). The EXISTS
    subquery becomes a LEFT SEMI join so lineitem can never inflate the
    order count; the semi probe side is projected to two columns, the
    date filter prunes orders before any shuffle, and the non-equi
    shipdate predicate rides the same equi-join (no second pass)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_count")
    )


@register(
    "returned_item_reporting",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1995-04-01'
      GROUP BY 1
    )
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
           round(c_acctbal, 4) AS acctbal, revenue
    FROM rev JOIN customer ON c_custkey = o_custkey
    JOIN nation ON c_nationkey = n_nationkey
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top customers by lost
    revenue on returned lineitems in a quarter. Aggregate-then-join —
    lineitem⋈orders collapses to one narrow (custkey, revenue) row per
    customer BEFORE touching the customer table, so the wide dimension
    joins against O(customers) rows, never O(lineitems); nation rides
    broadcast. Top-20 is rank-deterministic: ordered on the ROUNDED
    revenue with custkey tie-break, identical on both sides."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-04-01")
    ).select("o_orderkey", "o_custkey")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    return (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            "c_name",
            "n_name",
            r4(F.col("c_acctbal")).alias("acctbal"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(round(l_extendedprice / l_quantity * 10000) AS BIGINT))
               AS unit_u
      FROM lineitem WHERE l_quantity > 0
      GROUP BY 1, 2
    ),
    best AS (
      SELECT l_partkey, min(unit_u) AS best_u FROM offers GROUP BY 1
    ),
    pick AS (
      SELECT o.l_partkey, o.unit_u AS best_u,
             min(o.l_suppkey) AS best_suppkey
      FROM offers o JOIN best b
        ON o.l_partkey = b.l_partkey AND o.unit_u = b.best_u
      GROUP BY 1, 2
    )
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand,
           best_u / 10000.0 AS best_price,
           CAST(best_suppkey AS BIGINT) AS best_suppkey, s_name
    FROM pick
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = best_suppkey
    WHERE p_size <= 10
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): per part, the supplier offering
    the minimum unit price — the correlated-MIN subquery decorrelated as
    aggregate + join-back. Offers collapse to one row per (part, supplier)
    with map-side combine; ``best`` is a second narrow agg on the already
    O(part×supp) table; the equality join-back on (partkey, price) with a
    min(suppkey) tie-break makes the argmin deterministic without a
    global window sort. Both dimension joins broadcast; the p_size filter
    prunes parts before the result projection. At 100 TB the heavy input
    is scanned once and everything downstream is offer-table-sized."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    # unit price snaps to an INTEGER 1e-4-unit count, never round(x, 4):
    # fractional-scale round is engine-divergent for values exactly on the
    # half boundary (Spark rounds the exact decimal expansion, DuckDB the
    # scaled-multiplied double) and money/quantity ratios land there often
    # enough that the sf0.1 sweep caught a 111.1007-vs-111.1008 flip;
    # scale-0 rounding of the identical product double agrees bit-for-bit
    offers = (
        li.select(
            "l_partkey", "l_suppkey",
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 10000)
            .cast("bigint")
            .alias("u"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("u").alias("unit_u"))
    )
    best = (
        offers.groupBy("l_partkey")
        .agg(F.min("unit_u").alias("best_u"))
        .withColumnRenamed("l_partkey", "bp_partkey")
    )
    pick = (
        offers.join(
            best,
            on=[
                F.col("l_partkey") == F.col("bp_partkey"),
                F.col("unit_u") == F.col("best_u"),
            ],
        )
        .groupBy("l_partkey", "best_u")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supp = load_table(spark, sf_dir, "supplier")
    return (
        pick.join(F.broadcast(part), pick.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), F.col("best_suppkey") == supp.s_suppkey)
        .select(
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            "p_brand",
            (F.col("best_u") / 10000.0).alias("best_price"),
            F.col("best_suppkey").cast("bigint").alias("best_suppkey"),
            "s_name",
        )
    )


@register(
    "small_quantity_revenue",
    oracle="""
    WITH fp AS (
      SELECT p_partkey, p_brand FROM part
      WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
    ),
    fl AS (
      SELECT p_brand, l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN fp ON l_partkey = p_partkey
    ),
    pa AS (
      SELECT l_partkey, 0.5 * avg(l_quantity) AS lim FROM fl GROUP BY 1
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM fl JOIN pa ON fl.l_partkey = pa.l_partkey
    WHERE l_quantity < lim
    GROUP BY 1 ORDER BY 1
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems whose
    quantity is below 50% of their part's average — the correlated scalar
    AVG subquery decorrelated as a per-part aggregate joined back. The
    brand filter is at part granularity, so it semi-joins lineitem FIRST
    (broadcast of the filtered part list) and the per-part average runs
    on the pruned fact — the unoptimized form aggregates all 100 TB of
    lineitem for parts the filter then throws away. One narrow shuffle on
    partkey for the avg; the join-back is partkey-aligned."""
    fp = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    ).select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    fl = li.join(F.broadcast(fp), li.l_partkey == fp.p_partkey).select(
        "p_brand", "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = fl.groupBy("l_partkey").agg((F.lit(0.5) * F.avg("l_quantity")).alias("lim"))
    return (
        fl.join(pa, on="l_partkey")
        .filter(F.col("l_quantity") < F.col("lim"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            r4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
        )
        .orderBy("p_brand")
    )


@register(
    "sole_late_supplier",
    oracle="""
    WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 180 DAY
    ),
    sole AS (
      SELECT l_orderkey, min(l_suppkey) AS l_suppkey
      FROM late GROUP BY 1 HAVING count(*) = 1
    ),
    multi AS (
      SELECT l_orderkey FROM lineitem GROUP BY 1
      HAVING count(DISTINCT l_suppkey) > 1
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM sole
    JOIN multi ON sole.l_orderkey = multi.l_orderkey
    JOIN supplier ON s_suppkey = sole.l_suppkey
    GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 25
    """,
)
def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): in
    multi-supplier orders, the supplier who was the ONLY late shipper.
    The classic EXISTS + NOT-EXISTS pair decorrelates into two per-order
    aggregates — 'exactly one late supplier' is HAVING count(*) = 1 over
    the distinct late pairs (no correlated re-scan per row), and the
    multi-supplier test is a count-distinct semi-join. Three aggregations
    on the same orderkey shuffle key, so AQE coalesces them onto one
    exchange lineage; the supplier dimension broadcasts. Lateness (ship
    > order + 180d) pushes into the fact join, not a post-filter."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 180))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole = (
        late.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("l_suppkey"), F.count(F.lit(1)).alias("n_late"))
        .filter(F.col("n_late") == 1)
        .drop("n_late")
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        sole.join(multi, on="l_orderkey")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


@register(
    "idle_rich_customers",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 4) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-09-01')
    GROUP BY 1 ORDER BY 1
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-promise customers): above-average-balance
    customers with no recent orders. Two decorrelations in one plan: the
    scalar AVG subquery becomes a 1-row aggregate broadcast-cross-joined
    into the filter (never a per-row re-scan), and NOT IN becomes a
    left-anti join against the date-pruned distinct buyer list (the date
    predicate pushes into the orders scan, so the anti side is recent
    buyers only, not all orders). Customer is scanned once; both right
    sides are tiny and broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    cutoff = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-09-01")
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            F.broadcast(recent),
            cust.c_custkey == recent.o_custkey,
            how="left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            r4(F.sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


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
        .join(F.broadcast(keep), F.col("a.p") == keep.p)
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
    SELECT round(sum((o - ro * co / tn) * (o - ro * co / tn) / (ro * co / tn)), 4)
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
    e = F.col("ro") * F.col("co") / F.col("n")
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


@register("curation_provenance", oracle=_PROVENANCE_ORACLE)
def curation_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation lineage/debuggability: the same four-stage pipeline as
    ``curated_training_corpus``, but instead of the survivors' report it
    emits the FUNNEL — for every source, how many docs exited at each
    stage ('near_dup', 'low_quality') and how the survivors split
    (train/valid/test). At 100 TB this is the audit artifact a data team
    ships with a corpus release: every document is attributed to exactly
    one decision, and the counts reconcile to the input by construction
    (Σ stages = |docs| per source). Shares every verified stage operator
    with the capstone; the oracle shares its CTE prefix literally."""
    from graph_db_spark.operators.dedup import near_dup_clusters, portable_hash

    docs = load_table(spark, sf_dir, "documents")
    clusters = near_dup_clusters(docs, "text", "doc_id", threshold=0.6)
    drops = clusters.filter(~F.col("is_canonical")).select(
        F.col("id").cast("bigint").alias("doc_id"), F.lit(1).alias("_dropped")
    )
    keep = docs.join(drops.select("doc_id"), on="doc_id", how="left_anti")
    q = keep.select(
        "doc_id", r4(TX.quality_score("text")).alias("quality"), "source"
    )
    med = q.groupBy("source").agg(PF.percentile(F.col("quality"), 0.5).alias("m"))
    bucket = portable_hash(F.col("doc_id").cast("string")) % 100
    stage = (
        F.when(F.col("_dropped").isNotNull(), "near_dup")
        .when(F.col("quality") < F.col("m"), "low_quality")
        .when(bucket < 90, "train")
        .when(bucket < 95, "valid")
        .otherwise("test")
    )
    cls = (
        docs.join(drops, on="doc_id", how="left")
        .join(q.select("doc_id", "quality"), on="doc_id", how="left")
        .join(F.broadcast(med), on="source", how="left")
        .select("source", stage.alias("stage"))
    )
    return cls.groupBy("source", "stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


@register("curated_training_corpus", oracle=_CURATED_ORACLE)
def curated_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-data curation pipeline as ONE composed
    query — what this engine exists for at 100 TB:

    1. near-duplicate clustering (MinHash-LSH → exact Jaccard verify →
       transitive closure) drops every non-canonical copy;
    2. per-source MEDIAN quality cut (quantile-relative, not absolute);
    3. deterministic hash split into train/valid/test (retry-safe, no
       rand());
    4. the per-(source, split) corpus report.

    Every stage is an already-verified operator; the oracle replays the
    entire composition in SQL (recursive closure included), so the
    four-stage hand-off — including exactly WHICH docs each stage drops
    — is hash-checked end to end."""
    from graph_db_spark.operators.dedup import near_dup_clusters, portable_hash

    docs = load_table(spark, sf_dir, "documents")
    clusters = near_dup_clusters(docs, "text", "doc_id", threshold=0.6)
    drops = clusters.filter(~F.col("is_canonical")).select(
        F.col("id").cast("bigint").alias("doc_id")
    )
    keep = docs.join(drops, on="doc_id", how="left_anti")
    q = keep.select(
        "doc_id", "source", "n_chars", r4(TX.quality_score("text")).alias("quality")
    )
    med = q.groupBy("source").agg(PF.percentile(F.col("quality"), 0.5).alias("m"))
    kept = q.join(F.broadcast(med), on="source").filter(F.col("quality") >= F.col("m"))
    bucket = portable_hash(F.col("doc_id").cast("string")) % 100
    split = F.when(bucket < 90, "train").when(bucket < 95, "valid").otherwise("test")
    return kept.groupBy("source", split.alias("split")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@register(
    "streaming_left_outer_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts AS tts, event_type AS touch FROM events
      WHERE event_type IN ('view', 'click')
    ),
    wm AS (
      SELECT least((SELECT max(pts) FROM p) - INTERVAL 1 DAY,
                   (SELECT max(tts) FROM t) - INTERVAL 2 DAY) AS w
    ),
    matched AS (
      SELECT p.pts, t.touch FROM p JOIN t ON t.user_id = p.user_id
        AND t.tts <= p.pts AND t.tts >= p.pts - INTERVAL 24 HOURS
    ),
    unmatched AS (
      SELECT p.pts, 'none' AS touch FROM p, wm
      WHERE p.pts < wm.w AND NOT EXISTS (
        SELECT 1 FROM t WHERE t.user_id = p.user_id
          AND t.tts <= p.pts AND t.tts >= p.pts - INTERVAL 24 HOURS)
    ),
    allr AS (
      SELECT strftime(pts, '%Y-%m-%d') AS day, touch FROM matched
      UNION ALL
      SELECT strftime(pts, '%Y-%m-%d'), touch FROM unmatched
    )
    SELECT day, touch AS touch_type, CAST(count(*) AS BIGINT) AS n
    FROM allr GROUP BY 1, 2
    """,
)
def streaming_left_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 STREAM-STREAM LEFT OUTER join — the null-emission contract,
    oracle-encoded: matched purchase×touch pairs emit as they join, and
    an untouched purchase emits ONCE with a null touch — but only after
    the query's global watermark (min of the two sides' horizons: here
    max(touch ts) − 2d wins) passes its event time, because a matching
    touch could otherwise still arrive. Purchases younger than that
    horizon at end-of-stream never emit their null row — the oracle's
    ``pts < wm`` cut reproduces exactly which purchases report as
    unattributed vs stay pending. State stays bounded by the interval
    condition + watermarks on both sides, same as the inner variant."""
    import os
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    d = os.path.join(
        tempfile.gettempdir(),
        f"graft_stream_lo_{_sf_tag(sf_dir)}",
    )
    ev.write.mode("overwrite").parquet(d)
    p_stream = (
        spark.readStream.schema(ev.schema).parquet(d)
        .filter(F.col("event_type") == "purchase")
    )
    t_stream = (
        spark.readStream.schema(ev.schema).parquet(d)
        .filter(F.col("event_type").isin("view", "click"))
    )
    pairs = STRM.stream_touch_pairs(p_stream, t_stream, how="left_outer")
    qname = "mem_touch_lo"
    with _stream_state_partitions(spark):
        q = (
            pairs.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
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
    return (
        spark.table(qname)
        .groupBy(
            F.date_format(F.to_date("pts"), "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("touch"), F.lit("none")).alias("touch_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register(
    "streaming_full_outer_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts AS tts, event_type AS touch FROM events
      WHERE event_type IN ('view', 'click')
    ),
    wm AS (
      SELECT least((SELECT max(pts) FROM p) - INTERVAL 1 DAY,
                   (SELECT max(tts) FROM t) - INTERVAL 2 DAY) AS w
    ),
    matched AS (
      SELECT strftime(p.pts, '%Y-%m-%d') AS day, t.touch, 'both' AS side
      FROM p JOIN t ON t.user_id = p.user_id
        AND t.tts <= p.pts AND t.tts >= p.pts - INTERVAL 24 HOURS
    ),
    p_only AS (
      SELECT strftime(p.pts, '%Y-%m-%d') AS day, 'none' AS touch,
             'purchase_only' AS side
      FROM p, wm
      WHERE p.pts < wm.w AND NOT EXISTS (
        SELECT 1 FROM t WHERE t.user_id = p.user_id
          AND t.tts <= p.pts AND t.tts >= p.pts - INTERVAL 24 HOURS)
    ),
    t_only AS (
      SELECT strftime(t.tts, '%Y-%m-%d') AS day, t.touch,
             'touch_only' AS side
      FROM t, wm
      WHERE t.tts + INTERVAL 24 HOURS < wm.w AND NOT EXISTS (
        SELECT 1 FROM p WHERE p.user_id = t.user_id
          AND t.tts <= p.pts AND t.tts >= p.pts - INTERVAL 24 HOURS)
    ),
    allr AS (
      SELECT * FROM matched UNION ALL SELECT * FROM p_only
      UNION ALL SELECT * FROM t_only
    )
    SELECT day, touch AS touch_type, side, CAST(count(*) AS BIGINT) AS n
    FROM allr GROUP BY 1, 2, 3
    """,
)
def streaming_full_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 STREAM-STREAM FULL OUTER join — completes the interval-join
    matrix (inner: streaming_touch_pairs; left: the left_outer variant).
    Both sides' null-emission timing is oracle-encoded against the ONE
    global watermark (min of the two sides' horizons): an untouched
    purchase emits its null row once the watermark passes its event
    time (pts < wm — the pinned left-outer contract), and a touch that
    converted no purchase emits once the watermark passes the END of
    its forward match window (tts + 24h < wm), because until then a
    qualifying purchase could still arrive. Rows younger than their
    horizon at end-of-stream stay pending and never emit — the oracle's
    two cuts reproduce exactly which rows report unmatched."""
    import os
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    d = os.path.join(
        tempfile.gettempdir(),
        f"graft_stream_fo_{_sf_tag(sf_dir)}",
    )
    ev.write.mode("overwrite").parquet(d)
    p_stream = (
        spark.readStream.schema(ev.schema).parquet(d)
        .filter(F.col("event_type") == "purchase")
    )
    t_stream = (
        spark.readStream.schema(ev.schema).parquet(d)
        .filter(F.col("event_type").isin("view", "click"))
    )
    pairs = STRM.stream_touch_pairs(p_stream, t_stream, how="full_outer")
    qname = "mem_touch_fo"
    with _stream_state_partitions(spark):
        q = (
            pairs.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
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
    side = (
        F.when(F.col("pts").isNull(), "touch_only")
        .when(F.col("touch").isNull(), "purchase_only")
        .otherwise("both")
    )
    return (
        spark.table(qname)
        .groupBy(
            F.date_format(
                F.to_date(F.coalesce("pts", "tts")), "yyyy-MM-dd"
            ).alias("day"),
            F.coalesce(F.col("touch"), F.lit("none")).alias("touch_type"),
            side.alias("side"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register(
    "motif_props_projection",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM nation n
    JOIN region r ON r.r_regionkey = n.n_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
)
def motif_props_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Motif finder with PROPERTY projection — Cypher's ``MATCH
    (r:Region)-[:HAS_NATION]->(n)-[:HAS_CUSTOMER]->(c) RETURN r.name,
    n.name, count(c)`` (``PropertyGraph.find(props=...)``): each named
    vertex's requested properties join in column-pruned (never the whole
    vertex attribute set), then the binding table aggregates. The oracle
    is the plain relational join — the property-graph view and the
    relational view of the same data must agree exactly."""
    g = build_graph(spark, sf_dir)
    m = g.find(
        "(r:Region)-[:HAS_NATION]->(n); (n)-[:HAS_CUSTOMER]->(c)",
        props={"r": ["name"], "n": ["name"]},
    )
    return m.groupBy(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))


@register(
    "shortest_path_routes",
    oracle=f"""
    WITH RECURSIVE e AS MATERIALIZED (SELECT src, dst FROM ({edges_sql()})),
    walk(id, dist) AS (
      SELECT 'R:0', 0
      UNION ALL
      SELECT e.dst, walk.dist + 1 FROM walk JOIN e ON e.src = walk.id
      WHERE walk.dist < 8
    ),
    best AS MATERIALIZED (SELECT id, min(dist) AS dist FROM walk GROUP BY 1),
    par AS MATERIALIZED (
      SELECT b.id, min(e.src) AS parent
      FROM best b JOIN e ON e.dst = b.id
      JOIN best p ON p.id = e.src AND p.dist = b.dist - 1
      GROUP BY b.id
    ),
    route(id, path) AS (
      SELECT 'R:0', 'R:0'
      UNION ALL
      SELECT pr.id, route.path || '>' || pr.id
      FROM par pr JOIN route ON route.id = pr.parent
    )
    SELECT id, path FROM route
    -- TRY_CAST, never CAST: DuckDB's vectorized filter does NOT
    -- short-circuit the LIKE guard, so the cast also sees composite
    -- 'L:<order>:<line>' ids ('23919:5' raised at sf0.1); TRY_CAST
    -- nulls them and NULL % 37 = 0 is NULL -> filtered, same semantics
    WHERE id LIKE 'S:%' AND TRY_CAST(substr(id, 3) AS INTEGER) % 37 = 0
    """,
)
def shortest_path_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — shortest-path RECONSTRUCTION (not just
    distances): the deterministic min-parent BFS tree from the Region
    landmark (graph/algorithms.py:shortest_path_tree), with the actual
    path strings rebuilt by a depth-bounded level-by-level join over the
    tree — never a driver-side walk; each level joins only that level's
    vertices against the previous level's routes. Output: the canonical
    route for every 37th supplier. Oracle: recursive-CTE BFS + the same
    min-parent rule + a recursive path walk."""
    from graph_db_spark.graph.algorithms import shortest_path_tree

    g = build_graph(spark, sf_dir)
    tree = shortest_path_tree(g.edges, "R:0", n_partitions=_graph_nparts(sf_dir))
    maxd = tree.agg(F.max("dist").alias("m")).collect()[0]["m"]  # scalar probe
    routes = tree.filter(F.col("dist") == 0).select(
        "id", F.col("id").alias("path")
    ).localCheckpoint(eager=True)
    acc = [routes]
    for d in range(1, maxd + 1):
        routes = (
            tree.filter(F.col("dist") == d)
            .join(
                routes.select(F.col("id").alias("parent"), F.col("path").alias("ppath")),
                on="parent",
            )
            .select("id", F.concat_ws(">", "ppath", "id").alias("path"))
            .localCheckpoint(eager=True)
        )
        acc.append(routes)
    allr = acc[0]
    for r in acc[1:]:
        allr = allr.unionByName(r)
    return allr.filter(
        F.col("id").startswith("S:")
        # try_cast mirrors the oracle's TRY_CAST: under ANSI a plain cast
        # would throw if a plan reorder ever let composite ids reach it
        & (F.expr("try_cast(substring(id, 3, 10) AS int)") % 37 == 0)
    ).select("id", "path")


@register(
    "local_clustering_coeff",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem WHERE l_partkey % 4 = 0),
    e AS MATERIALIZED (SELECT DISTINCT a.p AS a, b.p AS b
                       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
    tri AS MATERIALIZED (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tv AS (
      SELECT v, count(*) AS t FROM (
        SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
      ) GROUP BY 1
    ),
    deg AS (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM e UNION ALL SELECT b FROM e
      ) GROUP BY 1
    ),
    lcc AS (
      SELECT deg.v, deg.d, coalesce(tv.t, 0) AS t,
             CASE WHEN deg.d >= 2
                  THEN round(coalesce(tv.t, 0) * 2.0 / (deg.d * (deg.d - 1)), 4)
                  ELSE 0.0 END AS c
      FROM deg LEFT JOIN tv ON tv.v = deg.v
    )
    SELECT CAST(round(c, 1) AS DOUBLE) AS coeff_bucket,
           CAST(count(*) AS BIGINT) AS n_vertices,
           CAST(sum(t) AS BIGINT) AS total_triangles
    FROM lcc GROUP BY 1
    """,
)
def local_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — per-vertex local clustering coefficient on the
    p%4 part-co-occurrence graph: triangles(v) / C(deg(v), 2). Triangles
    enumerate ONCE via the id-ordering (x<y<z) and fold to per-vertex
    counts — one triangle join + two vertex-sized aggregations, the same
    shuffle shape as k_truss's single round; never per-vertex
    neighborhood intersection. Output is the 0.1-bucketed coefficient
    histogram plus the (3×triangle-count) mass check."""
    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.filter(F.col("l_partkey") % 4 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(b, on=[F.col("a.o") == F.col("b.o"), F.col("a.p") < F.col("b.p")])
        .select(F.col("a.p").alias("a"), F.col("b.p").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    xy = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    yz = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    xz = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = xy.join(yz, on="y").join(xz, on=["x", "z"])
    tv = (
        tri.select(F.col("x").alias("v"))
        .unionAll(tri.select(F.col("y").alias("v")))
        .unionAll(tri.select(F.col("z").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lcc = deg.join(tv, on="v", how="left").select(
        "v", "d", F.coalesce("t", F.lit(0)).alias("t"),
        F.when(
            F.col("d") >= 2,
            F.round(F.coalesce("t", F.lit(0)) * 2.0 / (F.col("d") * (F.col("d") - 1)), 4),
        ).otherwise(0.0).alias("c"),
    )
    return lcc.groupBy(
        F.round(F.col("c"), 1).cast("double").alias("coeff_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
        F.sum("t").cast("bigint").alias("total_triangles"),
    )


# ---------------------------------------------------------------------------
# TPC-H decision-support shapes, rounds 5 additions (Q6/Q7/Q8/Q9/Q11/Q13/
# Q14/Q16 adapted to the fixture columns — no partsupp/comment/shipmode, so
# Q9/Q11 substitute shipped value for supplycost terms). Together with the
# existing Q1-Q5/Q10/Q15/Q17-Q19/Q21/Q22 shapes this closes the classic
# 22-query decision-support surface a reference user would expect.
# ---------------------------------------------------------------------------


@register(
    "forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.025 AND l_discount <= 0.065
      AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — forecast revenue change: single-table filter +
    aggregate. The whole query is one codegen'd scan: shipdate/discount/
    quantity predicates all push to the parquet reader (PushedFilters),
    zero shuffle beyond the final 1-row reduce. Non-boundary discount
    bounds (0.025/0.065) so no stored value sits exactly on a float
    comparison edge in either engine."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.025)
        & (F.col("l_discount") <= 0.065)
        & (F.col("l_quantity") < 24)
    ).agg(
        r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


@register(
    "nation_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume between two nations by
    ship year. Join shape at 100 TB: the fact (lineitem) joins orders on
    the shuffle key once; supplier/customer/nation dims all broadcast,
    and the nation-pair predicate prunes BEFORE the fact join fans out
    (the supplier side filters to two nations' suppliers first)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = F.col("supp_nation").isin("NATION_1", "NATION_2") & F.col(
        "cust_nation"
    ).isin("NATION_1", "NATION_2") & (F.col("supp_nation") != F.col("cust_nation"))
    j = (
        li.join(F.broadcast(s), on=li["l_suppkey"] == s["s_suppkey"])
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sn"), F.col("n_name").alias("supp_nation"))),
            on=F.col("s_nationkey") == F.col("sn"),
        )
        .join(o, on=li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), on=o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("cn"), F.col("n_name").alias("cust_nation"))),
            on=F.col("c_nationkey") == F.col("cn"),
        )
        .filter(pair)
    )
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(
        r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
    )


@register(
    "nation_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM vol GROUP BY 1
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — NATION_3's market share of revenue consumed in
    ASIA, by order year: one fact⋈orders shuffle join, every dimension
    broadcast, the region predicate applied on the customer side BEFORE
    the fact join, and the share computed as a conditional-sum ratio in
    the same aggregation (no second pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia_nations = (
        n.join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
               on=n["n_regionkey"] == r["r_regionkey"])
        .select(F.col("n_nationkey").alias("cn"))
    )
    cust_asia = c.join(F.broadcast(asia_nations), on=c["c_nationkey"] == F.col("cn")).select(
        "c_custkey"
    )
    vol = (
        li.join(F.broadcast(s), on=li["l_suppkey"] == s["s_suppkey"])
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sn"), F.col("n_name").alias("supp_nation"))),
            on=F.col("s_nationkey") == F.col("sn"),
        )
        .join(o, on=li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cust_asia), on=o["o_custkey"] == cust_asia["c_custkey"])
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        r4(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
            / F.sum("volume")
        ).alias("mkt_share")
    )


@register(
    "product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_type = 'PROMO'
    GROUP BY 1, 2
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: the fixture has no partsupp, so profit is
    shipped net revenue) — PROMO-part profit by supplier nation and order
    year. The part-type filter semi-reduces the fact before the orders
    shuffle join; part/supplier/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = (
        li.join(F.broadcast(p), on=li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), on=li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), on=s["s_nationkey"] == n["n_nationkey"])
        .join(o, on=li["l_orderkey"] == o["o_orderkey"])
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("bigint").alias("o_year"),
    ).agg(
        r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("profit")
    )


@register(
    "important_parts_share",
    oracle="""
    WITH pv AS (
      SELECT l.l_partkey, sum(l.l_extendedprice) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_1'
      GROUP BY 1
    )
    SELECT CAST(l_partkey AS BIGINT) AS p_partkey, round(value, 4) AS value
    FROM pv
    WHERE value > (SELECT sum(value) * 0.002 FROM pv)
    """,
)
def important_parts_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: shipped value stands in for
    supplycost×availqty) — parts whose NATION_1-shipped value exceeds
    0.2% of that nation's total. The total is a 1-row aggregate
    broadcast back over the per-part values (the scalar-subquery
    decorrelation shape) — one fact pass feeds both via checkpoint."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1").select("n_nationkey")
    pv = (
        li.join(F.broadcast(s), on=li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), on=F.col("s_nationkey") == n["n_nationkey"])
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
        .localCheckpoint(eager=True)
    )
    cut = pv.agg((F.sum("value") * 0.002).alias("cut"))
    return (
        pv.crossJoin(F.broadcast(cut))
        .filter(F.col("value") > F.col("cut"))
        .select(
            F.col("l_partkey").cast("bigint").alias("p_partkey"),
            r4(F.col("value")).alias("value"),
        )
    )


@register(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1
    ) GROUP BY 1
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — order-count-per-customer histogram INCLUDING
    zero-order customers (the left join is the point: an inner join
    silently drops the empty cohort). Two aggregations, the second over
    customer-sized data."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per = (
        c.join(o, on=c["c_custkey"] == o["o_custkey"], how="left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))


@register(
    "promo_revenue_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                        THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — PROMO share of one month's revenue: conditional
    sum over a date-pruned fact scan with the part dim broadcast; the
    ratio computes inside a single aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(p), on=li["l_partkey"] == p["p_partkey"]).agg(
        r4(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev)
        ).alias("promo_revenue")
    )


@register(
    "parts_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (5, 10, 15, 20, 25)
    GROUP BY 1, 2, 3
    """,
)
def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: supplier relationships observed through
    lineitem instead of partsupp) — distinct suppliers per (brand, type,
    size) for selected sizes, excluding one brand. The part-side
    predicates broadcast-prune the fact before the distinct-count
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(p), on=li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority,
           CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN 'le_30d'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 60 THEN 'le_60d'
                ELSE 'gt_60d' END AS ship_lag,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no shipmode/commitdate columns, so the
    lag is shipdate − orderdate bucketed at 30/60 days) — does shipping
    latency correlate with order priority? One fact⋈orders shuffle join
    + a two-key aggregate; the CASE buckets evaluate inside codegen."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (
        F.when(lag <= 30, "le_30d").when(lag <= 60, "le_60d").otherwise("gt_60d")
    )
    return (
        li.join(o, on=li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority", bucket.alias("ship_lag"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"))
    )


@register(
    "heavy_part_suppliers",
    oracle="""
    WITH sq AS (
      SELECT l.l_suppkey, sum(l.l_quantity) AS total_qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'SMALL'
      GROUP BY 1
    )
    SELECT CAST(sq.l_suppkey AS BIGINT) AS s_suppkey, s.s_name,
           round(sq.total_qty, 4) AS total_qty
    FROM sq JOIN supplier s ON s.s_suppkey = sq.l_suppkey
    WHERE sq.total_qty > (SELECT avg(total_qty) * 1.1 FROM sq)
    """,
)
def heavy_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: shipped quantity stands in for availqty)
    — suppliers who moved >1.1× the average SMALL-part volume (the
    fixture quantities are near-uniform, so 1.1× is the discriminating
    cut at every SF): the
    candidate-supplier decorrelation with the average as a broadcast
    1-row aggregate over the checkpointed per-supplier totals (one fact
    pass feeds both sides)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL").select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sq = (
        li.join(F.broadcast(p), on=li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .localCheckpoint(eager=True)
    )
    cut = sq.agg((F.avg("total_qty") * 1.1).alias("cut"))
    return (
        sq.crossJoin(F.broadcast(cut))
        .filter(F.col("total_qty") > F.col("cut"))
        .join(F.broadcast(s), on=sq["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("l_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            r4(F.col("total_qty")).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Round-6 continuation — retrieval / quality additions
# ---------------------------------------------------------------------------


@register(
    "doc_token_entropy",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t FROM (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
        FROM documents) WHERE t <> ''
    ),
    cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
    ent AS (
      SELECT doc_id, sum(c) AS n, count(*) AS nd, sum(c * ln(c)) AS s
      FROM cnt GROUP BY 1
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(nd AS BIGINT) AS n_distinct,
           round(ln(CAST(n AS DOUBLE)) - s / n, 4) + 0.0 AS entropy,
           round(CASE WHEN nd > 1
                      THEN (ln(CAST(n AS DOUBLE)) - s / n) / ln(CAST(nd AS DOUBLE))
                      ELSE 0.0 END, 4) + 0.0 AS norm_entropy
    FROM ent
    """,
)
def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data quality — per-document Shannon token entropy (the
    C4/RefinedWeb-style repetitiveness signal: near-zero entropy means
    boilerplate/spam, near-1 normalized entropy means diverse text).
    Computed via the fold-free identity H = ln(N) − (Σ c·ln c)/N so one
    (doc, token) count pass and one per-doc aggregate suffice — no
    window, no second scan; both shuffles map-side-combine. Normalized
    entropy divides by ln(n_distinct) (0 when the doc is a single
    repeated token). At 100 TB this is two linear shuffles keyed on
    doc_id — the same shape as any per-doc quality score."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(TX.tokens("text")).alias("t"))
        .filter(F.col("t") != "")
    )
    cnt = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    ent = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("nd"),
        F.sum(F.col("c") * F.log("c")).alias("s"),
    )
    h = F.log(F.col("n").cast("double")) - F.col("s") / F.col("n")
    return ent.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.col("nd").cast("bigint").alias("n_distinct"),
        r4(h).alias("entropy"),
        r4(
            F.when(F.col("nd") > 1, h / F.log(F.col("nd").cast("double"))).otherwise(0.0)
        ).alias("norm_entropy"),
    )


_BM25_TERMS = ("spark", "join", "merge")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_cte_sql() -> str:
    """Shared DuckDB CTE block replaying _bm25_scored: same tokenizer,
    same idf smoothing, same k1/b saturation expression STRUCTURE (float
    parity depends on the division/paren shape matching the Spark
    Columns). Ends with ``scored(doc_id, n_terms, score)``."""
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""dl AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                  x -> x <> '')) AS DOUBLE) AS dl
      FROM documents
    ),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS f FROM (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
        FROM documents)
      WHERE t IN ({terms}) GROUP BY 1, 2
    ),
    idf AS (
      SELECT tf.t, ln(1.0 + (stats.n - count(*) + 0.5) / (count(*) + 0.5)) AS idf
      FROM tf CROSS JOIN stats GROUP BY tf.t, stats.n
    ),
    scored AS (
      SELECT tf.doc_id, count(*) AS n_terms,
             sum(idf.idf * (tf.f * ({_BM25_K1} + 1.0))
                 / (tf.f + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl)))
               AS score
      FROM tf JOIN idf ON tf.t = idf.t
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN stats
      GROUP BY 1
    )"""


def _bm25_scored(docs: DataFrame) -> DataFrame:
    """Okapi BM25 per-doc scores for the fixed ``_BM25_TERMS`` query —
    ``(doc_id, n_terms, score)``, unrounded. One term-pruned explode,
    broadcast idf/stats, one per-doc sum (plan notes on
    bm25_doc_ranking)."""
    dl = docs.select(
        "doc_id",
        F.size(F.filter(TX.tokens("text"), lambda x: x != "")).cast("double").alias("dl"),
    ).localCheckpoint(eager=True)  # feeds stats AND the per-doc join
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
    tf = (
        docs.select("doc_id", F.explode(TX.tokens("text")).alias("t"))
        .filter(F.col("t").isin(*_BM25_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("f"))
    ).localCheckpoint(eager=True)  # feeds idf AND the scored join
    idf = (
        tf.crossJoin(F.broadcast(stats))
        .groupBy("t", "n")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "t",
            F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias("idf"),
        )
    )
    k1, b = _BM25_K1, _BM25_B
    contrib = F.col("idf") * (F.col("f") * (k1 + 1.0)) / (
        F.col("f") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(idf), on="t")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_terms"), F.sum(contrib).alias("score"))
    )


@register(
    "bm25_doc_ranking",
    oracle=f"""
    WITH {_bm25_cte_sql()}
    SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms,
           round(score, 4) + 0.0 AS score
    FROM scored ORDER BY score DESC, doc_id LIMIT 50
    """,
)
def bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval — Okapi BM25 ranking of the corpus against a fixed
    query ("spark join merge"): idf·tf saturation with k1=1.2 and b=0.75
    doc-length normalization (Robertson/Spärck Jones — the standard
    lexical scorer for decontamination lookups and quality-by-relevance
    cuts in training pipelines; tfidf_top_terms covers the unsaturated
    variant). Plan shape: one token explode restricted to the query
    terms (the IN filter prunes before the shuffle), a |terms|-row idf
    table and a 1-row corpus-stats row both BROADCAST onto the per-doc
    partials, one per-doc sum, TakeOrdered top-k — at 100 TB one linear
    pass plus k driver rows, nothing quadratic."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _bm25_scored(docs)
        .orderBy(F.desc("score"), "doc_id")
        .limit(50)
        .select("doc_id", "n_terms", r4(F.col("score")).alias("score"))
    )


@register(
    "zorder_clustering_prune",
    oracle="""
    WITH sel AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey >= 0 AND c_nationkey <= 5
    )
    SELECT 'n_rows' AS metric, CAST(count(*) AS DOUBLE) AS value FROM sel
    UNION ALL
    SELECT 'sum_bal', round(CAST(sum(c_acctbal) AS DOUBLE), 4) + 0.0 FROM sel
    UNION ALL SELECT 'zorder_files_pruned', 1.0
    UNION ALL SELECT 'zorder_beats_linear', 1.0
    """,
)
def zorder_clustering_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table format — MULTI-dimensional clustering via a Z-order (Morton)
    cluster key (writers/snapshots.py:zorder_column; the Delta/Iceberg
    ``OPTIMIZE ZORDER BY`` layout). snapshot_range_pruning proved 1-D
    range clustering prunes its sort column; this query proves the 2-D
    claim by building the SAME customer table twice — linearly clustered
    on (c_acctbal, c_nationkey) and z-ordered over both domains — and
    scanning on nationkey ALONE (6 of 25 values): the dimension the
    linear layout cannot prune, since every acctbal-sorted file spans
    most nationkeys (at every fixture SF the linear scan opens all or
    most files; the z scan opens ~1/3). The scan ROWS hash-match a
    direct SQL filter (pruning
    is an optimization, never a semantics change); the contract rows are
    1.0 iff the z-scan skipped files at all AND opened strictly fewer
    than the linear layout did. At 100 TB the z-key costs one codegen
    expression at write time and prunes every dimension of the
    rectangle at read time."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import SnapshotTable, zorder_column

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    n = cust.count()
    tag = _sf_tag(sf_dir)
    root = os.path.join(tempfile.gettempdir(), f"graft_snap_zorder_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    rpf = max(5, n // 64)
    lin = SnapshotTable.create(
        spark, os.path.join(root, "linear"), cust, keys=["c_custkey"], n_buckets=4,
        cluster_by=["c_acctbal", "c_nationkey"], records_per_file=rpf,
    )
    zdf = cust.withColumn(
        "_z",
        zorder_column(
            [(F.col("c_acctbal"), -1000.0, 10000.0), (F.col("c_nationkey"), 0.0, 25.0)]
        ),
    )
    zt = SnapshotTable.create(
        spark, os.path.join(root, "zorder"), zdf, keys=["c_custkey"], n_buckets=4,
        cluster_by=["_z", "c_acctbal", "c_nationkey"], records_per_file=rpf,
    )
    where = {"c_nationkey": (0, 5)}
    got = zt.scan(where).drop("_z").localCheckpoint(eager=True)
    zread, ztotal = zt.pruned_files(where)
    lread, _ = lin.pruned_files(where)
    return _metric_rows(
        got.agg(F.count(F.lit(1)).cast("double").alias("value")).select(
            F.lit("n_rows").alias("metric"), "value"
        ),
        got.agg(r4(F.sum("c_acctbal")).alias("value")).select(
            F.lit("sum_bal").alias("metric"), "value"
        ),
        spark.range(1).select(
            F.lit("zorder_files_pruned").alias("metric"),
            F.lit(1.0 if zread < ztotal else 0.0).alias("value"),
        ),
        spark.range(1).select(
            F.lit("zorder_beats_linear").alias("metric"),
            F.lit(1.0 if zread < lread else 0.0).alias("value"),
        ),
    )


def _landmark_levels_cte_sql() -> str:
    """Shared DuckDB CTE pair ending in ``best(landmark, id, dist)`` —
    the exact per-landmark BFS distances over the directed fixture graph
    enumerated level by level (the fixed topology makes every path depth
    writable as a join; min(dist) settles the supplier/part double
    reach). Used by the harmonic-centrality and eccentricity oracles."""
    return """reach AS (
      SELECT 'R:' || CAST(r_regionkey AS VARCHAR) AS landmark,
             'R:' || CAST(r_regionkey AS VARCHAR) AS id, 0 AS dist
      FROM region
      UNION ALL
      SELECT 'R:' || CAST(n_regionkey AS VARCHAR), 'N:' || CAST(n_nationkey AS VARCHAR), 1
      FROM nation
      UNION ALL
      SELECT 'R:' || CAST(n_regionkey AS VARCHAR), 'C:' || CAST(c_custkey AS VARCHAR), 2
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      UNION ALL
      SELECT 'R:' || CAST(n_regionkey AS VARCHAR), 'S:' || CAST(s_suppkey AS VARCHAR), 2
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      UNION ALL
      SELECT 'R:' || CAST(n_regionkey AS VARCHAR), 'O:' || CAST(o_orderkey AS VARCHAR), 3
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      UNION ALL
      SELECT 'R:' || CAST(n_regionkey AS VARCHAR),
             'L:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR), 4
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
      UNION ALL
      SELECT DISTINCT 'R:' || CAST(n_regionkey AS VARCHAR), 'P:' || CAST(l_partkey AS VARCHAR), 5
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
      UNION ALL
      SELECT DISTINCT 'R:' || CAST(n_regionkey AS VARCHAR), 'S:' || CAST(l_suppkey AS VARCHAR), 5
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
    ), best AS (
      SELECT landmark, id, min(dist) AS dist FROM reach GROUP BY 1, 2
    )"""


@register(
    "harmonic_centrality_landmarks",
    oracle=f"""
    WITH {_landmark_levels_cte_sql()}
    SELECT landmark, CAST(count(*) AS BIGINT) AS n_reachable,
           round(sum(1.0 / dist), 4) + 0.0 AS harmonic
    FROM best WHERE dist > 0 GROUP BY 1
    """,
)
def harmonic_centrality_landmarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — harmonic centrality of landmark vertices,
    H(l) = Σ_{v reachable} 1/d(l,v) (the reachability-robust closeness
    variant; Boldi & Vigna 2014): one multi-landmark frontier BFS over
    the directed fixture graph with ALL five Region roots at once —
    rounds join only the shrinking frontier against the pre-partitioned
    checkpointed edge table (the CC/PageRank exchange-reuse contract),
    so 5 landmarks cost one BFS, not five. Cross-region reach is real,
    not assumed: another region's suppliers enter at depth 5 through
    customer→order→lineitem while home suppliers settle at depth 2 (the
    oracle's min(dist) proves the BFS settles each pair at its first
    frontier). At 100 TB landmark-set BFS is the standard centrality
    surrogate — state is |landmarks|×V pairs, never all-pairs."""
    from graph_db_spark.graph.algorithms import shortest_paths

    g = build_graph(spark, sf_dir)
    lms = g.vertices.filter(F.col("label") == "Region").select("id")
    sp = shortest_paths(g.edges, lms, n_partitions=_graph_nparts(sf_dir))
    return (
        sp.filter(F.col("dist") > 0)
        .groupBy("landmark")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reachable"),
            r4(F.sum(F.lit(1.0) / F.col("dist"))).alias("harmonic"),
        )
    )


@register(
    "landmark_eccentricity",
    oracle=f"""
    WITH {_landmark_levels_cte_sql()},
    ecc AS (
      SELECT landmark, max(dist) AS e FROM best WHERE dist > 0 GROUP BY 1
    )
    SELECT b.landmark, CAST(ecc.e AS BIGINT) AS eccentricity,
           CAST(count(*) AS BIGINT) AS n_at_ecc,
           CAST((SELECT max(e) FROM ecc) AS BIGINT) AS diameter_lower_bound
    FROM best b JOIN ecc ON b.landmark = ecc.landmark AND b.dist = ecc.e
    GROUP BY 1, 2
    """,
)
def landmark_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — landmark eccentricity and the BFS
    diameter lower bound (the standard scalable diameter estimator:
    exact eccentricity needs all-pairs, but max over a landmark sample
    lower-bounds the diameter and a double-sweep tightens it). Same
    one-run multi-landmark BFS as harmonic_centrality_landmarks, reduced
    to per-landmark max depth + the frontier population at that depth;
    the global max rides a broadcast 1-row aggregate onto the 5 output
    rows, never a global window."""
    from graph_db_spark.graph.algorithms import shortest_paths

    g = build_graph(spark, sf_dir)
    lms = g.vertices.filter(F.col("label") == "Region").select("id")
    sp = shortest_paths(
        g.edges, lms, n_partitions=_graph_nparts(sf_dir)
    ).localCheckpoint(eager=True)  # feeds both the ecc agg and the join back
    ecc = sp.filter(F.col("dist") > 0).groupBy("landmark").agg(
        F.max("dist").alias("e")
    )
    dia = ecc.agg(F.max("e").alias("d"))
    return (
        sp.join(F.broadcast(ecc), on="landmark")
        .filter(F.col("dist") == F.col("e"))
        .groupBy("landmark", F.col("e").cast("bigint").alias("eccentricity"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_at_ecc"))
        .crossJoin(F.broadcast(dia))
        .select(
            "landmark", "eccentricity", "n_at_ecc",
            F.col("d").cast("bigint").alias("diameter_lower_bound"),
        )
    )


def _centroid_cte_sql(label: int = 0) -> str:
    """Shared DuckDB CTE pair ending in ``centv(cv)`` — the label-``label``
    embedding centroid as one list row (replays _label_centroid)."""
    return f"""cent AS (
      SELECT pos, avg(val) AS c FROM (
        SELECT generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS pos,
               unnest(CAST(embedding AS DOUBLE[])) AS val
        FROM embeddings WHERE label = {label}) GROUP BY pos
    ),
    centv AS (SELECT list(c ORDER BY pos) AS cv FROM cent)"""


def _label_centroid(emb: DataFrame, label: int = 0) -> DataFrame:
    """1-row DataFrame ``(cv: array<double>)`` — the mean vector of the
    ``label`` embeddings, computed in-plan (posexplode → per-position avg
    → packed array); broadcast it onto whatever needs scoring."""
    from graph_db_spark.operators.similarity import _as_double

    return (
        emb.filter(F.col("label") == label)
        .select(F.posexplode(_as_double(F.col("embedding"))).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.avg("val").alias("c"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda x: x["c"]
            ).alias("cv")
        )
    )


@register(
    "hybrid_retrieval_rerank",
    oracle=f"""
    WITH {_bm25_cte_sql()},
    cands AS (
      SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 100
    ),
    {_centroid_cte_sql()},
    rer AS (
      SELECT cands.doc_id, cands.score,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), centv.cv) AS cos
      FROM cands JOIN embeddings e ON e.vec_id = cands.doc_id
                 CROSS JOIN centv
    )
    SELECT doc_id, round(score, 4) + 0.0 AS bm25_score,
           round(cos, 4) + 0.0 AS cosine_sim
    FROM rer ORDER BY cos DESC, doc_id LIMIT 20
    """,
)
def hybrid_retrieval_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval capstone — the standard two-stage hybrid stack: BM25
    lexical preselection (cheap, inverted-index-shaped) feeding a dense
    embedding rerank (expensive, quality), here against a deterministic
    query vector (the label-0 centroid — a topic prototype). Stage 1
    reuses _bm25_scored's linear plan and keeps only the top-100
    candidate ids; stage 2 joins JUST those candidates to their
    embeddings (semi-join-sized, never the corpus), scores cosine to
    the centroid via the JVM-side zip_with/aggregate kernel
    (operators/similarity.py:29), and emits the top-20. The centroid is
    computed in-plan (posexplode → 64-row avg → packed array on one
    row, broadcast) — no driver-side vector math. At 100 TB: candidate
    generation is the only corpus-wide pass; the rerank touches k rows.
    Both stages replay exactly in the oracle (same idf smoothing, same
    saturation structure, DuckDB list_cosine_similarity)."""
    from graph_db_spark.operators.similarity import _as_double, cosine

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cands = (
        _bm25_scored(docs)
        .orderBy(F.desc("score"), "doc_id")
        .limit(100)
        .select("doc_id", "score")
        .localCheckpoint(eager=True)
    )
    centv = _label_centroid(emb)
    rer = (
        cands.join(emb, on=cands["doc_id"] == emb["vec_id"])
        .crossJoin(F.broadcast(centv))
        .select(
            "doc_id",
            "score",
            cosine(_as_double(F.col("embedding")), F.col("cv")).alias("cos"),
        )
    )
    return (
        rer.orderBy(F.desc("cos"), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            r4(F.col("score")).alias("bm25_score"),
            r4(F.col("cos")).alias("cosine_sim"),
        )
    )


@register(
    "degree_assortativity",
    oracle=f"""
    WITH e AS ({edges_sql()}),
    outd AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY 1),
    ind AS (SELECT dst, CAST(count(*) AS DOUBLE) AS id_ FROM e GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_edges,
           round(corr(outd.od, ind.id_), 4) + 0.0 AS assortativity,
           round(avg(outd.od), 4) AS mean_src_outdeg,
           round(avg(ind.id_), 4) AS mean_dst_indeg
    FROM e JOIN outd ON e.src = outd.src
           JOIN ind ON e.dst = ind.dst
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — directed degree assortativity (Newman 2002):
    the Pearson correlation, over every edge, between the source's
    out-degree and the destination's in-degree. Negative values mean
    hubs feed leaves (the fixture's hierarchy shape); positive means
    hub-to-hub wiring. Plan: two map-side-combined degree aggregates,
    both joined back onto the edge list (degree tables are
    vertex-sized; the joins shuffle on the same src/dst keys the
    degrees grouped on), then ONE pass of Spark's built-in distributed
    co-moment fold (F.corr) — never a driver-side collect. Exact
    oracle: DuckDB corr() over the identical join."""
    g = build_graph(spark, sf_dir)
    e = g.edges.select("src", "dst")
    outd = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("od"))
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).cast("double").alias("id_"))
    return (
        e.join(outd, on="src")
        .join(ind, on="dst")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            r4(F.corr("od", "id_")).alias("assortativity"),
            F.round(F.avg("od"), 4).alias("mean_src_outdeg"),
            F.round(F.avg("id_"), 4).alias("mean_dst_indeg"),
        )
    )


@register(
    "hard_negative_mining",
    oracle="""
    SELECT query_id, neg_id, round(cosine_sim, 4) + 0.0 AS cosine_sim,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neg_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cosine_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                        c.vec_id
             ) AS rank
      FROM embeddings q JOIN embeddings c ON q.label <> c.label
      WHERE q.vec_id < 10
    ) WHERE rank <= 3
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data op — hard-negative mining for contrastive training
    (the retrieval/embedding-training staple): for each anchor vector,
    the most similar corpus vectors with a DIFFERENT label — maximally
    confusing negatives. Same plan as the brute cosine baseline (anchors
    broadcast, corpus partitioned, one shuffle for the per-anchor
    top-k); the label-mismatch predicate rides the broadcast join. The
    scale path swaps the corpus scan for the IVF/LSH candidate
    generation exactly as in ann_*_topk — this query pins the exact
    semantics those approximations are graded against."""
    from graph_db_spark.operators.similarity import _as_double, cosine
    from graph_db_spark.util import spread

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        _as_double(F.col("embedding")).alias("q_vec"),
    )
    c = spread(emb).select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("c_label"),
        _as_double(F.col("embedding")).alias("c_vec"),
    )
    scored = c.join(F.broadcast(q), on=F.col("q_label") != F.col("c_label")).select(
        "query_id", "neg_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "neg_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id", "neg_id", r4(F.col("cosine_sim")).alias("cosine_sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


@register(
    "snapshot_schema_evolution",
    oracle="""
    WITH up AS (
      SELECT c_custkey, c_mktsegment, c_acctbal * 2 AS c_acctbal,
             CASE WHEN c_acctbal > 5000 THEN 'gold' ELSE 'std' END AS c_tier
      FROM customer WHERE c_custkey > 700 AND c_custkey <= 900
    ),
    base AS (
      SELECT c_custkey, c_mktsegment, c_acctbal, NULL AS c_tier
      FROM customer
      WHERE c_custkey <= 800 AND c_custkey NOT IN (SELECT c_custkey FROM up)
    ),
    m AS (SELECT * FROM up UNION ALL SELECT * FROM base)
    SELECT coalesce(c_tier, '__null__') AS tier, CAST(count(*) AS BIGINT) AS n,
           round(sum(c_acctbal), 4) AS sum_bal
    FROM m GROUP BY 1
    UNION ALL SELECT '__v1_has_tier__', 0, 0.0
    """,
)
def snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table format — explicit schema evolution
    (writers/snapshots.py:_evolve; the Delta mergeSchema contract):
    create the customer table, then MERGE a batch carrying a NEW
    ``c_tier`` column under ``allow_schema_evolution=True`` (without the
    flag the merge raises — typo protection, pytest-pinned). The new
    column appends as a nullable field; untouched buckets' files are
    NOT rewritten — their rows null-fill at read time through the
    evolved manifest schema, so evolution costs one manifest write plus
    the touched buckets, never a table rewrite. The hash check proves
    read-side semantics (updated rows carry tiers, carried-forward rows
    read NULL, doubled balances land); the ``__v1_has_tier__`` contract
    row pins that TIME TRAVEL to v1 still serves the pre-evolution
    schema — old snapshots never grow columns retroactively."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import SnapshotTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tag = _sf_tag(sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"graft_snap_evolve_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable.create(
        spark, path, cust.filter(F.col("c_custkey") <= 800), ["c_custkey"], n_buckets=8
    )
    up = (
        cust.filter((F.col("c_custkey") > 700) & (F.col("c_custkey") <= 900))
        .withColumn(
            "c_tier", F.when(F.col("c_acctbal") > 5000, "gold").otherwise("std")
        )
        .withColumn("c_acctbal", F.col("c_acctbal") * 2)
    )
    t.merge(up, allow_schema_evolution=True)
    agg = (
        t.read()
        .groupBy(F.coalesce(F.col("c_tier"), F.lit("__null__")).alias("tier"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            r4(F.sum("c_acctbal")).alias("sum_bal"),
        )
    )
    v1_has_tier = "c_tier" in t.read(version=1).columns
    return _metric_rows(
        agg,
        spark.range(1).select(
            F.lit("__v1_has_tier__").alias("tier"),
            F.lit(1 if v1_has_tier else 0).cast("bigint").alias("n"),
            F.lit(0.0).alias("sum_bal"),
        ),
    )


@register(
    "rrf_fusion_ranking",
    oracle=f"""
    WITH {_bm25_cte_sql()},
    lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lrank
      FROM scored ORDER BY score DESC, doc_id LIMIT 100
    ),
    {_centroid_cte_sql()},
    -- MATERIALIZE the per-row cosine BEFORE the ranking window: with the
    -- cosine inlined in the window's ORDER BY, DuckDB re-evaluates the
    -- expression (and the non-materialized centroid subquery feeding it)
    -- per sort comparison — the sf0.1 sweep measured this CTE at 5+
    -- CPU-hours; projected-then-ranked it is corpus-linear (~seconds)
    centm AS MATERIALIZED (SELECT cv FROM centv),
    dcos AS MATERIALIZED (
      SELECT vec_id AS doc_id,
             list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                    (SELECT cv FROM centm)) AS cos
      FROM embeddings
    ),
    dense AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY cos DESC, doc_id) AS drank
      FROM dcos ORDER BY drank LIMIT 100
    ),
    fused AS (
      SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id, lex.lrank, dense.drank,
             coalesce(1.0 / (60 + lex.lrank), 0) + coalesce(1.0 / (60 + dense.drank), 0)
               AS rrf
      FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
    )
    SELECT doc_id, CAST(lrank AS BIGINT) AS lex_rank,
           CAST(drank AS BIGINT) AS dense_rank,
           round(rrf, 4) + 0.0 AS rrf_score
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 25
    """,
)
def rrf_fusion_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval — reciprocal-rank fusion (Cormack et al. 2009, the
    standard score-free way to fuse heterogeneous rankers): BM25 lexical
    top-100 and dense centroid-cosine top-100 fuse by
    Σ 1/(60 + rank), which needs no score normalization across the two
    incomparable scales. hybrid_retrieval_rerank is the cascade
    (lexical gates dense); this is the parallel-union alternative —
    docs ranked by either signal survive. Plan: each ranker is a
    corpus-linear pass ending in TakeOrdered(100); rank assignment and
    the FULL OUTER fuse then run on two 100-row sets (the global
    row_number windows are k-sized by construction — never a
    corpus-wide single-partition sort). Both rankers quantize to
    discrete score levels (integer tf/doc-length grids), so ranking is
    reproducible across engines — the oracle replays ranks exactly."""
    from graph_db_spark.operators.similarity import _as_double, cosine

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = (
        _bm25_scored(docs)
        .orderBy(F.desc("score"), "doc_id")
        .limit(100)
        .withColumn(
            "lrank", F.row_number().over(Window.orderBy(F.desc("score"), "doc_id"))
        )
        .select("doc_id", "lrank")
    )
    dense = (
        emb.crossJoin(F.broadcast(_label_centroid(emb)))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(_as_double(F.col("embedding")), F.col("cv")).alias("cos"),
        )
        .orderBy(F.desc("cos"), "doc_id")
        .limit(100)
        .withColumn(
            "drank", F.row_number().over(Window.orderBy(F.desc("cos"), "doc_id"))
        )
        .select("doc_id", "drank")
    )
    fused = lex.join(dense, on="doc_id", how="full_outer").select(
        "doc_id",
        "lrank",
        "drank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("lrank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("drank")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.desc("rrf"), "doc_id")
        .limit(25)
        .select(
            "doc_id",
            F.col("lrank").cast("bigint").alias("lex_rank"),
            F.col("drank").cast("bigint").alias("dense_rank"),
            r4(F.col("rrf")).alias("rrf_score"),
        )
    )


@register(
    "streaming_watermark_dedup",
    oracle="""
    WITH base AS (SELECT event_id, ts FROM events WHERE user_id % 25 = 3),
    m AS (SELECT max(ts) AS m FROM base)
    SELECT CAST(e.event_id AS BIGINT) AS event_id,
           CAST(CASE WHEN e.ts < m.m - INTERVAL 4 DAY THEN 2 ELSE 1 END AS BIGINT)
             AS n_emitted
    FROM base e, m
    """,
)
def streaming_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 streaming — BOUNDED-state dedup via
    ``dropDuplicatesWithinWatermark`` (streaming/jobs.py:
    dedupe_within_watermark): the contract that makes streaming exact
    dedup viable at 100 TB — state holds one entry per key only inside
    the watermark horizon, and the price is that a key re-sent AFTER its
    horizon re-admits. This query pins the exact eviction timing,
    measured on Spark 4.1 (same method as _run_batched_stream's
    late-data mechanics):

    - batch 0: the base cohort — every key lands, state created.
    - batch 1: the ENTIRE cohort re-sent verbatim — every copy drops.
      (Eviction is LAGGED one batch: at batch 1 the operative watermark
      is still −∞, so all state is alive and every resend is a
      duplicate. Even under an unlagged reading the outcome is
      identical: old keys would be evicted but their old timestamps
      fall below the unlagged watermark and drop as late — the batch
      design makes both readings agree, so the oracle is robust to the
      internal two-watermark schedule.)
    - batch 2: the cohort re-sent with a FRESH timestamp (max−1h, which
      also never advances the watermark): evicted keys RE-ADMIT; keys
      still held drop. The measured eviction rule (this oracle went red
      under the naive reading and pinned it): state stores an
      EXPIRATION of first_seen_ts + delay and evicts when that falls
      below the watermark (max_prior_ts − delay) — so with delay d the
      re-admission cutoff is max − 2·d, not max − d. The dedup horizon
      a key is actually protected for is up to TWICE the configured
      delay.

    Emitted copies per key are therefore exactly 2 for keys first seen
    before max−2·delay and 1 otherwise — a pure function of the data
    split that DuckDB replays with one CASE. At scale this is the
    ingest-dedup configuration: O(keys-per-horizon) state instead of
    O(corpus), with the re-admission tail swept by the downstream batch
    near-dup/exact-dedup passes (stream_exact_dedup docstring)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("user_id") % 25 == 3).select("event_id", "ts")
    m = base.agg(F.max("ts")).collect()[0][0]  # 1-row scalar probe
    b2 = base.withColumn(
        "ts", (F.lit(m) - F.expr("INTERVAL 1 HOUR")).cast("timestamp")
    )
    out = _run_batched_stream(
        spark,
        "wm_dedup",
        [base, base, b2],
        lambda s: STRM.dedupe_within_watermark(
            s, ["event_id"], ts_col="ts", watermark="2 days"
        ),
        mode="append",
        tag=_sf_tag(sf_dir),
    )
    return out.groupBy(F.col("event_id").cast("bigint").alias("event_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_emitted")
    )


@register(
    "sample_sum_estimate_bound",
    oracle="""
    WITH li AS (
      SELECT l_extendedprice * (1 - l_discount) AS v,
             (l_orderkey * 2654435761 + l_linenumber) % 100 AS h
      FROM lineitem
    ),
    st AS (
      SELECT count(*) AS n, avg(v) AS m, stddev_samp(v) AS sd, sum(v) AS ssum
      FROM li WHERE h < 10
    ),
    tot AS (SELECT sum(v) AS t FROM li)
    SELECT 'n_sample' AS metric, CAST(st.n AS DOUBLE) AS value FROM st
    UNION ALL
    SELECT 'est_over_true', round(st.ssum * 10 / tot.t, 4) FROM st, tot
    UNION ALL SELECT 'within_3sigma_bound', 1.0
    """,
)
def sample_sum_estimate_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing — estimate a global revenue SUM from
    a deterministic 10% sample with a self-computed CLT error contract
    (the BlinkDB/quickstats move for 100 TB interactive queries: scan
    1/10th, answer with a confidence interval). Membership is the same
    multiplicative-hash idiom as stratified_sample — reproducible across
    engines, runs, and task retries, never rand(). The estimate is
    Horvitz-Thompson (sample sum / sampling fraction); the bound is
    3·√((1−f)/n)·cv with cv taken FROM THE SAMPLE (the production
    setting: the true spread is unknown). The contract row is 1.0 iff
    the TRUE relative error — the oracle computes the full sum too —
    lies inside the bound (verified holding at every fixture SF; the
    sample is fixed, so this is deterministic, not flaky). Plan: two
    aggregations over one scan, the sample side filter-pruned; nothing
    driver-side. The ratio (not the raw sums) is what's hash-compared:
    global float sums of ~1e10 differ across engines in the last ulps,
    while the ratio is stable to 1e-12."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v"),
        ((F.col("l_orderkey") * F.lit(2654435761) + F.col("l_linenumber")) % 100).alias("h"),
    ).localCheckpoint(eager=True)  # one scan feeds both aggregates
    st = li.filter(F.col("h") < 10).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("v").alias("m"),
        F.stddev_samp("v").alias("sd"),
        F.sum("v").alias("ssum"),
    )
    tot = li.agg(F.sum("v").alias("t"))
    joined = st.crossJoin(F.broadcast(tot))
    est = F.col("ssum") * 10
    rel_err = F.abs(est - F.col("t")) / F.col("t")
    bound = 3 * F.sqrt((1.0 - 0.1) / F.col("n")) * (F.col("sd") / F.col("m"))
    return _metric_rows(
        joined.select(
            F.lit("n_sample").alias("metric"), F.col("n").cast("double").alias("value")
        ),
        joined.select(
            F.lit("est_over_true").alias("metric"), r4(est / F.col("t")).alias("value")
        ),
        joined.select(
            F.lit("within_3sigma_bound").alias("metric"),
            F.when(rel_err <= bound, 1.0).otherwise(0.0).alias("value"),
        ),
    )


@register(
    "scc_trade_partners",
    oracle="""
    WITH RECURSIVE flow AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS cnt
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2
    ),
    mx AS (SELECT src, max(cnt) AS m FROM flow GROUP BY 1),
    e AS (SELECT f.src, f.dst FROM flow f JOIN mx ON f.src = mx.src
          WHERE f.cnt = mx.m),
    nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
    reach(a, b) AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src
    ),
    mutual AS (
      SELECT r1.a AS v, r1.b AS w
      FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
      UNION ALL
      SELECT v, v FROM nodes
    )
    SELECT CAST(v AS BIGINT) AS nationkey, CAST(min(w) AS BIGINT) AS scc
    FROM mutual GROUP BY 1
    """,
)
def scc_trade_partners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics — strongly connected components
    (graph/algorithms.py:strongly_connected_components, TRIM + FW-BW) of
    the "top trade partner" digraph: nation A → nation B when B is A's
    heaviest export destination (suppliers in A shipping to customers in
    B through lineitem⋈orders; per-source argmax keeps the graph sparse
    and SCALE-INVARIANT — an absolute volume threshold would change the
    topology with SF). Functional-graph SCCs are the classic mutual-
    top-partner cycles: the fixture yields a 3-cycle at sf0.01, a
    2-cycle at sf0.1, and a pure DAG (all trims) at sf0.001, so the
    oracle exercises both the trim and the pivot-peel paths. Heavy
    lifting is the ONE fact-join pass building the flow matrix (nation
    dim broadcast, map-side-combined count); the SCC loop then runs on a
    |nations|-sized edge list. The DuckDB oracle computes mutual
    reachability via a recursive closure — exact, per-node."""
    from graph_db_spark.graph.algorithms import strongly_connected_components

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    flow = (
        li.join(o, on=li["l_orderkey"] == o["o_orderkey"])
        .join(c, on=o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), on=li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)  # feeds both mx and the edge filter
    )
    mx = flow.groupBy("src").agg(F.max("cnt").alias("m"))
    # zero-pad the ids: the SCC labels are STRING minima (the algorithm's
    # ids are strings, like every graph in this module), so fixed-width
    # rendering makes lexicographic min == numeric min — the oracle's
    # min(nationkey) semantics
    e = (
        flow.join(F.broadcast(mx), on="src")
        .filter(F.col("cnt") == F.col("m"))
        .select(
            F.format_string("%02d", F.col("src")).alias("src"),
            F.format_string("%02d", F.col("dst")).alias("dst"),
        )
    )
    scc = strongly_connected_components(e)
    return scc.select(
        F.col("id").cast("bigint").alias("nationkey"),
        F.col("scc").cast("bigint").alias("scc"),
    )


@register(
    "snapshot_write_audit_publish",
    oracle="""
    WITH m AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 4 = 1 THEN c_acctbal * 2 ELSE c_acctbal END
               AS c_acctbal
      FROM customer
    )
    SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
           round(sum(c_acctbal), 4) AS sum_bal
    FROM m GROUP BY 1
    UNION ALL SELECT '__rejected_left_v1__', 1, 0.0
    UNION ALL SELECT '__published_v2__', 1, 0.0
    """,
)
def snapshot_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table format — write-audit-publish (the Iceberg WAP gate;
    writers/snapshots.py:merge(audit=...)): a DQ check runs against the
    EXACT staged snapshot after the data files land but before the
    manifest publishes, so a failing batch never has a moment of being
    live. Sequence: create → a POISON merge (balances forced to −9999)
    whose audit rejects — the table must still be v1 with pristine
    balances — then the real merge (doubled balances for the
    custkey%4==1 cohort) whose audit passes and publishes v2. The hash check proves the final
    state equals the direct SQL replay WITHOUT the poison batch (the
    rejected write left zero trace in reader-visible state); the
    contract rows pin that rejection kept version=1 and the good commit
    landed as version=2."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import AuditRejected, SnapshotTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tag = _sf_tag(sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"graft_snap_wap_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable.create(spark, path, cust, ["c_custkey"], n_buckets=8)
    # modulus cohort, not a key range: non-empty at EVERY fixture SF
    window = cust.filter(F.col("c_custkey") % 4 == 1)

    def no_poison(df: DataFrame) -> bool:
        # 1-row scalar probe of the staged snapshot — the DQ gate
        return df.filter(F.col("c_acctbal") < -5000).limit(1).count() == 0

    rejected = False
    try:
        t.merge(window.withColumn("c_acctbal", F.lit(-9999.0)), audit=no_poison)
    except AuditRejected:
        rejected = True
    left_v1 = rejected and t.latest_version() == 1
    v2 = t.merge(
        window.withColumn("c_acctbal", F.col("c_acctbal") * 2), audit=no_poison
    )
    agg = t.read().groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        r4(F.sum("c_acctbal")).alias("sum_bal"),
    )
    return _metric_rows(
        agg,
        spark.range(1).select(
            F.lit("__rejected_left_v1__").alias("seg"),
            F.lit(1 if left_v1 else 0).cast("bigint").alias("n"),
            F.lit(0.0).alias("sum_bal"),
        ),
        spark.range(1).select(
            F.lit("__published_v2__").alias("seg"),
            F.lit(1 if v2 == 2 else 0).cast("bigint").alias("n"),
            F.lit(0.0).alias("sum_bal"),
        ),
    )


@register(
    "market_basket_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT count(DISTINCT o) AS n FROM items),
    bc AS (SELECT b, count(*) AS nb FROM items GROUP BY 1),
    pairs AS (
      SELECT a.b AS ba, c.b AS bb, count(*) AS nboth
      FROM items a JOIN items c ON a.o = c.o AND a.b < c.b
      GROUP BY 1, 2
    )
    SELECT ba AS brand_a, bb AS brand_b, CAST(nboth AS BIGINT) AS n_both,
           round(nboth * 1.0 / n.n, 4) AS support,
           round(nboth * 1.0 / x.nb, 4) AS confidence,
           round(nboth * 1.0 * n.n / (x.nb * y.nb), 4) AS lift
    FROM pairs JOIN bc x ON pairs.ba = x.b JOIN bc y ON pairs.bb = y.b
               CROSS JOIN n
    ORDER BY nboth * 1.0 * n.n / (x.nb * y.nb) DESC, ba, bb LIMIT 20
    """,
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining — market-basket support / confidence /
    lift over brand pairs co-purchased in one order (the Apriori
    first-pass; at brand granularity the statistics are dense enough to
    rank). Plan shape is the canonical bounded pair mine: distinct
    (order, brand) baskets — one shuffle — then a per-order self-join
    whose fan-out is capped by basket size (≤ 25 brands/order; the
    ngram-dedup family's big-block guard pattern applies if a basket
    key were unbounded), count aggregation, and |brands|-sized count
    tables broadcast back for the ratio math. All ratios are
    int-over-int divisions with identical expression structure in both
    engines. Top-20 by lift, deterministic brand tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(F.broadcast(p), on=li["l_partkey"] == p["p_partkey"])
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds n, bc, and both pair sides
    )
    n = items.select("o").distinct().count()  # 1-row scalar probe
    bc = items.groupBy("b").agg(F.count(F.lit(1)).alias("nb"))
    a, c = items.alias("a"), items.alias("c")
    pairs = (
        a.join(c, on=[F.col("a.o") == F.col("c.o"), F.col("a.b") < F.col("c.b")])
        .groupBy(F.col("a.b").alias("ba"), F.col("c.b").alias("bb"))
        .agg(F.count(F.lit(1)).alias("nboth"))
    )
    x = bc.select(F.col("b").alias("ba"), F.col("nb").alias("na"))
    y = bc.select(F.col("b").alias("bb"), F.col("nb").alias("nb2"))
    lift = F.col("nboth") * 1.0 * n / (F.col("na") * F.col("nb2"))
    scored = pairs.join(F.broadcast(x), on="ba").join(F.broadcast(y), on="bb")
    return (
        scored.orderBy(lift.desc(), "ba", "bb")
        .limit(20)
        .select(
            F.col("ba").alias("brand_a"),
            F.col("bb").alias("brand_b"),
            F.col("nboth").cast("bigint").alias("n_both"),
            r4(F.col("nboth") * 1.0 / n).alias("support"),
            r4(F.col("nboth") * 1.0 / F.col("na")).alias("confidence"),
            r4(lift).alias("lift"),
        )
    )


_EWMA_ALPHA = 0.3


@register(
    "ewma_smoothing",
    oracle=f"""
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, sum(value) AS x
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, day, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS t
      FROM d
    ),
    s AS (
      SELECT event_type, day, x, t,
             sum(x * power(1.0 / {1 - _EWMA_ALPHA}, t))
               OVER (PARTITION BY event_type ORDER BY t) AS acc,
             first_value(x) OVER (PARTITION BY event_type ORDER BY t) AS x0
      FROM r
    )
    SELECT event_type, day,
           round(power({1 - _EWMA_ALPHA}, t)
                 * ({_EWMA_ALPHA} * (acc - x0) + x0), 2) + 0.0 AS ewma
    FROM s
    """,
)
def ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time series — exponentially weighted moving average (α=0.3,
    ewma₀ = x₀) over the per-type daily value series, WITHOUT a
    sequential fold: the recurrence ewmaₜ = α·xₜ + (1−α)·ewmaₜ₋₁ has
    the closed form (1−α)ᵗ·(α·Σᵢ₌₁..ₜ xᵢ(1−α)⁻ⁱ + x₀), so one
    cumulative-sum window over u = x·(1−α)⁻ᵗ computes every point —
    the same one-shuffle cost as any per-series window, where the naive
    recursion needs applyInPandas (CUSUM covers that genuinely
    order-dependent family; EWMA is the fold that DOESN'T need it).
    Numerical guard: (1−α)⁻ᵗ grows 1.43ᵗ, so the rescaling costs
    ~t·log₂(1.43) ≈ 15 bits at t=29 — exact to ~1e-11 relative on the
    fixture's month of days; an unbounded series would switch to
    per-chunk re-anchoring, documented here rather than silently
    degrading. Windows partition by series — never a global sort."""
    ev = load_table(spark, sf_dir, "events")
    a = _EWMA_ALPHA
    d = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum("value").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    r = d.withColumn("t", F.row_number().over(w) - 1)
    wcum = Window.partitionBy("event_type").orderBy("t")
    s = r.withColumn(
        "acc", F.sum(F.col("x") * F.pow(F.lit(1.0 / (1 - a)), F.col("t"))).over(wcum)
    ).withColumn("x0", F.first("x").over(wcum))
    # emitted at 2 decimals, not the usual r4: the closed form amplifies
    # the engines' summation-order noise by (1−α)⁻ᵗ (~3e4 at t=29 →
    # ~1e-8 jitter on a ~3e3 value), and with 150 emitted reals one
    # landed exactly on a 5e-5 round() boundary at sf0.01. Two decimals
    # put the boundary 5e5× above the jitter.
    return s.select(
        "event_type",
        "day",
        (
            F.round(
                F.pow(F.lit(1 - a), F.col("t"))
                * (F.lit(a) * (F.col("acc") - F.col("x0")) + F.col("x0")),
                2,
            )
            + F.lit(0.0)
        ).alias("ewma"),
    )


@register(
    "autocorrelation_lags",
    oracle="""
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, sum(value) AS x
      FROM events GROUP BY 1, 2
    ),
    l AS (
      SELECT event_type, x,
             lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1,
             lag(x, 2) OVER (PARTITION BY event_type ORDER BY day) AS x2,
             lag(x, 3) OVER (PARTITION BY event_type ORDER BY day) AS x3
      FROM d
    ),
    a AS (
      SELECT event_type,
             corr(x, x1) AS c1, CAST(count(x1) AS BIGINT) AS n1,
             corr(x, x2) AS c2, CAST(count(x2) AS BIGINT) AS n2,
             corr(x, x3) AS c3, CAST(count(x3) AS BIGINT) AS n3
      FROM l GROUP BY 1
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
           round(acf, 4) + 0.0 AS acf
    FROM (
      SELECT event_type, 1 AS lag, n1 AS n_pairs, c1 AS acf FROM a
      UNION ALL SELECT event_type, 2, n2, c2 FROM a
      UNION ALL SELECT event_type, 3, n3, c3 FROM a
    )
    """,
)
def autocorrelation_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time series — sample autocorrelation of the per-type daily revenue
    series at lags 1..3, the ACF head a seasonality detector reads. No
    self-join: `lag(x, k)` window columns align each point with its
    k-back neighbor inside ONE per-series sort, then `corr(x, x_k)` is a
    hash aggregate — so the whole ACF costs one event_type shuffle
    regardless of how many lags are emitted (a lag-join formulation pays
    a shuffle per lag). Pairwise-complete semantics (first k rows of each
    series drop out via corr's null handling) match DuckDB exactly. The
    lag-wide→long unpivot is a metadata-only union of three projections.
    -0.0 guard on the rounded corr (a tiny negative ACF rounds to zero)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum("value").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagd = d.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
        F.lag("x", 3).over(w).alias("x3"),
    )
    a = lagd.groupBy("event_type").agg(
        *[
            e
            for k in (1, 2, 3)
            for e in (
                F.corr("x", f"x{k}").alias(f"c{k}"),
                F.count(f"x{k}").cast("bigint").alias(f"n{k}"),
            )
        ]
    )
    rows = [
        a.select(
            "event_type",
            F.lit(k).cast("bigint").alias("lag"),
            F.col(f"n{k}").alias("n_pairs"),
            r4(F.col(f"c{k}")).alias("acf"),
        )
        for k in (1, 2, 3)
    ]
    return rows[0].unionByName(rows[1]).unionByName(rows[2])


@register(
    "theil_sen_trend",
    oracle="""
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, sum(value) AS x
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, x,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
                  AS DOUBLE) AS t
      FROM d
    ),
    s AS (
      SELECT a.event_type, (b.x - a.x) / (b.t - a.t) AS slope
      FROM r a JOIN r b ON a.event_type = b.event_type AND a.t < b.t
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           round(median(slope), 4) + 0.0 AS sen_slope
    FROM s GROUP BY 1
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time series — Theil-Sen robust trend: the median of all pairwise
    slopes (x_j−x_i)/(t_j−t_i) of each type's daily revenue series,
    insensitive to the outlier days that wreck an OLS fit
    (forecast_revenue is the OLS twin). The pair join is per-series and
    day-bounded — d days → d(d−1)/2 slope rows (~400 for a month), so
    "quadratic" here is quadratic in DAYS, never in events; an unbounded
    series would chunk by window first (the market-basket basket-size
    bound, same discipline). One series-key shuffle feeds the rank, the
    pair join, and the median. Exact interpolated median on both engines
    (Spark `percentile` == DuckDB `median` on doubles)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum("value").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    r = d.select(
        "event_type", "x", (F.row_number().over(w) - 1).cast("double").alias("t")
    )
    a = r.alias("a")
    b = r.select(
        F.col("event_type").alias("et"), F.col("x").alias("xb"), F.col("t").alias("tb")
    ).alias("b")
    s = a.join(
        b, (F.col("a.event_type") == F.col("et")) & (F.col("a.t") < F.col("tb"))
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("xb") - F.col("a.x")) / (F.col("tb") - F.col("a.t"))).alias("slope"),
    )
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (F.round(F.expr("percentile(slope, 0.5)"), 4) + F.lit(0.0)).alias("sen_slope"),
    )


@register(
    "lineitem_correlations",
    oracle="""
    SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
           round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
           round(corr(l_quantity, l_discount), 4) + 0.0 AS corr_qty_disc,
           round(corr(l_extendedprice, l_discount), 4) + 0.0 AS corr_price_disc,
           round(covar_samp(l_quantity, l_extendedprice), 4) + 0.0
             AS covar_qty_price
    FROM lineitem GROUP BY 1
    """,
)
def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — grouped Pearson correlation matrix over the lineitem
    measures (the one-pass relationship profile a feature-engineering
    sweep starts with). `corr`/`covar_samp` are single-pass streaming
    aggregates in both engines — co-moments accumulate map-side, so the
    whole 4-cell matrix costs exactly one returnflag shuffle of 6 partial
    states, never a per-pair scan. Adding measures widens the aggregate
    list, not the pass count. Sample (n−1) semantics on both sides; -0.0
    guard on every rounded cell (a near-zero correlation can round to
    negative zero)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        r4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        r4(F.corr("l_quantity", "l_discount")).alias("corr_qty_disc"),
        r4(F.corr("l_extendedprice", "l_discount")).alias("corr_price_disc"),
        r4(F.covar_samp("l_quantity", "l_extendedprice")).alias("covar_qty_price"),
    )


@register(
    "zipf_law_fit",
    oracle="""
    WITH toks AS (
      SELECT lang,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    freq AS (
      SELECT lang, token, count(*) AS f FROM toks GROUP BY 1, 2
    ),
    ranked AS (
      SELECT lang, f,
             row_number() OVER (PARTITION BY lang ORDER BY f DESC, token) AS rnk
      FROM freq
    ),
    pts AS (
      SELECT lang, ln(CAST(rnk AS DOUBLE)) AS lx, ln(CAST(f AS DOUBLE)) AS ly
      FROM ranked WHERE rnk <= 100
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(ly, lx), 4) + 0.0 AS zipf_slope,
           round(regr_intercept(ly, lx), 4) + 0.0 AS zipf_intercept,
           round(regr_r2(ly, lx), 4) + 0.0 AS r2
    FROM pts GROUP BY 1
    """,
)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis — Zipf's-law fit per language: OLS of ln(freq) on
    ln(rank) over each language's top-100 terms (natural text slopes
    ≈ −1; a flat or cliffed curve flags templated/synthetic corpora —
    the cheap generated-text detector). Plan: one (lang, token) count
    with map-side combine, a per-lang top-k window on the VOCABULARY
    (≪ corpus — the sort input is the distinct-term table), then
    `regr_slope/intercept/r2` as single-pass co-moment aggregates over
    ≤100 points per lang. Rank ties break on token asc, so both engines
    rank — and therefore fit — identically."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("lang", F.explode(TX.tokens(F.col("text"))).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("f"), "token")
    pts = (
        freq.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 100)
        .select(
            "lang",
            F.log(F.col("rnk").cast("double")).alias("lx"),
            F.log(F.col("f").cast("double")).alias("ly"),
        )
    )
    return pts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        r4(F.regr_slope("ly", "lx")).alias("zipf_slope"),
        r4(F.regr_intercept("ly", "lx")).alias("zipf_intercept"),
        r4(F.regr_r2("ly", "lx")).alias("r2"),
    )


@register(
    "modularity_communities",
    oracle="WITH "
    + _lpa_cte(3)
    + """,
    nl AS (SELECT node, label FROM lab3),
    deg AS (SELECT u AS node, count(*) AS d FROM ed GROUP BY 1),
    m AS (SELECT count(*) AS m FROM e),
    internal AS (
      SELECT la.label AS c, count(*) AS li
      FROM e JOIN nl la ON e.u = la.node
             JOIN nl lb ON e.v = lb.node AND la.label = lb.label
      GROUP BY 1
    ),
    per AS (
      SELECT g.c, g.n_nodes, coalesce(i.li, 0) AS li, g.dc,
             coalesce(i.li, 0) * 1.0 / m.m
               - power(g.dc * 1.0 / (2 * m.m), 2) AS q
      FROM (SELECT l.label AS c, count(*) AS n_nodes, sum(d) AS dc
            FROM nl l JOIN deg ON deg.node = l.node GROUP BY 1) g
      LEFT JOIN internal i ON i.c = g.c CROSS JOIN m
    )
    SELECT CAST(c AS BIGINT) AS community, CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(li AS BIGINT) AS internal_edges, CAST(dc AS BIGINT) AS degree_sum,
           round(q, 4) + 0.0 AS q_contrib
    FROM per
    UNION ALL
    SELECT -1, CAST((SELECT count(*) FROM nl) AS BIGINT),
           CAST((SELECT m FROM m) AS BIGINT),
           CAST(2 * (SELECT m FROM m) AS BIGINT),
           round((SELECT sum(q) FROM per), 4) + 0.0
    """,
)
def modularity_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph — Newman modularity of the LPA community assignment:
    Q = Σ_c [L_c/m − (D_c/2m)²] (L_c edges inside c, D_c its degree
    mass, m total edges) — the standard "are these communities real"
    score, computed on EXACTLY the assignment label_propagation reports
    (shared _lpa_edges_labels loop / _lpa_cte oracle). Cost beyond LPA
    itself: the checkpointed edge list joins the narrow (node, label)
    table twice (u then v side) plus two node-key aggregates — all
    hash joins on graph keys, no new quadratic term, so modularity adds
    O(E) work to any community algorithm it audits. Per-community
    contribution rows plus a community=-1 total row (n_nodes=|V|,
    internal_edges=m, degree_sum=2m there — the handshake identity)."""
    e, ed, labels = _lpa_edges_labels(spark, sf_dir, iters=3, keep_edges=True)
    labels = labels.localCheckpoint(eager=True)  # u-join, v-join, degree agg
    m = e.count()  # 1-row scalar probe (total undirected edges)
    deg = ed.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    la = labels.select(F.col("node").alias("nu"), F.col("label").alias("lu"))
    lb = labels.select(F.col("node").alias("nv"), F.col("label").alias("lv"))
    internal = (
        e.join(la, e.u == F.col("nu"))
        .join(lb, (e.v == F.col("nv")) & (F.col("lu") == F.col("lv")))
        .groupBy(F.col("lu").alias("c"))
        .agg(F.count(F.lit(1)).alias("li"))
    )
    g = (
        labels.join(deg, on="node")
        .groupBy(F.col("label").alias("c"))
        .agg(F.count(F.lit(1)).alias("n_nodes"), F.sum("d").alias("dc"))
    )
    per = g.join(internal, on="c", how="left").select(
        "c",
        "n_nodes",
        F.coalesce(F.col("li"), F.lit(0)).alias("li"),
        "dc",
        (
            F.coalesce(F.col("li"), F.lit(0)) * 1.0 / m
            - F.pow(F.col("dc") * 1.0 / (2 * m), F.lit(2))
        ).alias("q"),
    )
    per = per.localCheckpoint(eager=True)  # detail rows + the total fold
    n_nodes_total = labels.count()  # 1-row scalar probe
    total = per.agg(r4(F.sum("q")).alias("qt")).select(
        F.lit(-1).cast("bigint").alias("community"),
        F.lit(n_nodes_total).cast("bigint").alias("n_nodes"),
        F.lit(m).cast("bigint").alias("internal_edges"),
        F.lit(2 * m).cast("bigint").alias("degree_sum"),
        F.col("qt").alias("q_contrib"),
    )
    detail = per.select(
        F.col("c").cast("bigint").alias("community"),
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("li").cast("bigint").alias("internal_edges"),
        F.col("dc").cast("bigint").alias("degree_sum"),
        r4(F.col("q")).alias("q_contrib"),
    )
    return detail.unionByName(total)


@register(
    "psi_distribution_drift",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             CASE WHEN extract(day FROM ts) <= 15 THEN 'ref' ELSE 'cur' END AS g
      FROM events
    ),
    th AS (
      SELECT event_type,
             quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
               AS t
      FROM e WHERE g = 'ref' GROUP BY 1
    ),
    binned AS (
      SELECT e.event_type, g,
             len(list_filter(t, x -> x < value)) AS bin
      FROM e JOIN th ON e.event_type = th.event_type
    ),
    cnt AS (
      SELECT event_type, bin,
             count(*) FILTER (WHERE g = 'ref') AS nr,
             count(*) FILTER (WHERE g = 'cur') AS nc
      FROM binned GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, sum(nr) AS tr, sum(nc) AS tc FROM cnt GROUP BY 1
    ),
    terms AS (
      SELECT cnt.event_type,
             (cnt.nr + 0.5) / (tot.tr + 5.0) AS p,
             (cnt.nc + 0.5) / (tot.tc + 5.0) AS q,
             tot.tr AS tr, tot.tc AS tc
      FROM cnt JOIN tot ON cnt.event_type = tot.event_type
    )
    SELECT event_type, CAST(any_value(tr) AS BIGINT) AS n_ref,
           CAST(any_value(tc) AS BIGINT) AS n_cur,
           round(sum((p - q) * ln(p / q)), 4) + 0.0 AS psi
    FROM terms GROUP BY 1
    """,
)
def psi_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift — Population Stability Index per event type between the
    month's first half (reference window) and second half (current): the
    standard production drift gate (PSI < 0.1 stable, > 0.25 shifted).
    Bins are the REFERENCE deciles — quantile binning, so PSI is
    scale-free — with 0.5/5 Laplace smoothing so an empty bin
    contributes a finite term (encoded identically both engines). Plan:
    one grouped-percentile pass builds the |types|×9 threshold table,
    broadcast back for bin assignment (a 9-element filtered-array count
    — in-task, codegen), then two narrow aggregates. Threshold
    comparisons are strict `<` on identically-interpolated doubles, so
    bin membership is bit-deterministic. This quantile-binned shape is
    also the 100 TB path where the exact-ECDF KS below must degrade."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.when(F.dayofmonth("ts") <= 15, "ref").otherwise("cur").alias("g"),
    )
    th = (
        ev.filter(F.col("g") == "ref")
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
            ).alias("t")
        )
    )
    binned = ev.join(F.broadcast(th), on="event_type").select(
        "event_type",
        "g",
        F.size(F.filter(F.col("t"), lambda x: x < F.col("value"))).alias("bin"),
    )
    cnt = binned.groupBy("event_type", "bin").agg(
        F.count(F.when(F.col("g") == "ref", 1)).alias("nr"),
        F.count(F.when(F.col("g") == "cur", 1)).alias("nc"),
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("nr").alias("tr"), F.sum("nc").alias("tc")
    )
    terms = cnt.join(F.broadcast(tot), on="event_type").select(
        "event_type",
        ((F.col("nr") + 0.5) / (F.col("tr") + 5.0)).alias("p"),
        ((F.col("nc") + 0.5) / (F.col("tc") + 5.0)).alias("q"),
        "tr",
        "tc",
    )
    return terms.groupBy("event_type").agg(
        F.first("tr").cast("bigint").alias("n_ref"),
        F.first("tc").cast("bigint").alias("n_cur"),
        r4(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")))).alias(
            "psi"
        ),
    )


@register(
    "ks_two_sample",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             CASE WHEN extract(day FROM ts) <= 15 THEN 1 ELSE 0 END AS is_ref
      FROM events
    ),
    pv AS (
      SELECT event_type, value,
             sum(is_ref) AS nr, sum(1 - is_ref) AS nc
      FROM e GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, sum(nr) AS tr, sum(nc) AS tc FROM pv GROUP BY 1
    ),
    cdf AS (
      SELECT pv.event_type,
             sum(nr) OVER (PARTITION BY pv.event_type ORDER BY value) * 1.0
               / tot.tr AS fr,
             sum(nc) OVER (PARTITION BY pv.event_type ORDER BY value) * 1.0
               / tot.tc AS fc,
             tot.tr AS tr, tot.tc AS tc
      FROM pv JOIN tot ON pv.event_type = tot.event_type
    )
    SELECT event_type, CAST(any_value(tr) AS BIGINT) AS n_ref,
           CAST(any_value(tc) AS BIGINT) AS n_cur,
           round(max(abs(fr - fc)), 4) AS ks_stat
    FROM cdf GROUP BY 1
    """,
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift — exact two-sample Kolmogorov-Smirnov statistic per type
    (max ECDF gap between the month's first and second half), PSI's
    bin-free companion. Tie-correct: rows collapse to per-(type, value)
    counts FIRST, so both ECDFs step once per distinct value and the sup
    is evaluated after each full step — the textbook treatment of tied
    observations. The running sums ride one per-type window sort over
    the DISTINCT-value table (≪ events when values repeat). Honest
    scale note: a per-key ordered window is a per-key sort — at 100 TB
    per-key cardinalities this becomes the quantile-binned approximation
    (psi_distribution_drift's shape); the exact form is the
    verification-scale oracle for it."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("is_ref"),
    )
    pv = ev.groupBy("event_type", "value").agg(
        F.sum("is_ref").alias("nr"), F.sum(1 - F.col("is_ref")).alias("nc")
    )
    tot = pv.groupBy("event_type").agg(
        F.sum("nr").alias("tr"), F.sum("nc").alias("tc")
    )
    w = Window.partitionBy("event_type").orderBy("value")
    cdf = pv.join(F.broadcast(tot), on="event_type").select(
        "event_type",
        (F.sum("nr").over(w) * 1.0 / F.col("tr")).alias("fr"),
        (F.sum("nc").over(w) * 1.0 / F.col("tc")).alias("fc"),
        "tr",
        "tc",
    )
    return cdf.groupBy("event_type").agg(
        F.first("tr").cast("bigint").alias("n_ref"),
        F.first("tc").cast("bigint").alias("n_cur"),
        r4(F.max(F.abs(F.col("fr") - F.col("fc")))).alias("ks_stat"),
    )


_POIS1_CDF = (  # Poisson(1) CDF at k=0..4 — identical literals both engines
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
)


@register(
    "ab_test_proportions",
    oracle="""
    WITH e AS (
      SELECT dayofweek(ts) AS dow,
             CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS grp,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events
    ),
    g AS (
      SELECT dow,
             sum(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN grp = 'a' THEN conv ELSE 0 END) AS xa,
             sum(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS nb,
             sum(CASE WHEN grp = 'b' THEN conv ELSE 0 END) AS xb
      FROM e GROUP BY 1
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(xa * 1.0 / na, 4) AS p_a, round(xb * 1.0 / nb, 4) AS p_b,
           round((xa * 1.0 / na - xb * 1.0 / nb)
                 / sqrt(((xa + xb) * 1.0 / (na + nb))
                        * (1 - (xa + xb) * 1.0 / (na + nb))
                        * (1.0 / na + 1.0 / nb)), 4) + 0.0 AS z,
           CAST(CASE WHEN abs((xa * 1.0 / na - xb * 1.0 / nb)
                 / sqrt(((xa + xb) * 1.0 / (na + nb))
                        * (1 - (xa + xb) * 1.0 / (na + nb))
                        * (1.0 / na + 1.0 / nb))) > 1.96
                THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM g
    """,
)
def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — the two-proportion z-test, grouped: conversion
    (purchase share) of cohort A (even user ids) vs cohort B (odd) per
    day-of-week, with the pooled-variance z and a |z|>1.96 significance
    flag — the A/B-test readout, computed entirely from four grouped
    counters (one shuffle, map-side combined; the test statistic is
    driver-free closed-form arithmetic on the aggregate row). All inputs
    to the float math are exact integer counts, so both engines derive
    bit-identical z values; chi_square_independence is the k×m
    generalization, ks/psi the distributional cousins."""
    # DuckDB dayofweek is 0-6 Sunday-first; Spark's is 1-7 — map explicitly
    ev = load_table(spark, sf_dir, "events").select(
        (F.dayofweek("ts") - 1).alias("dow"),
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("grp"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    g = ev.groupBy("dow").agg(
        F.sum(F.when(F.col("grp") == "a", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("grp") == "a", F.col("conv")).otherwise(0)).alias("xa"),
        F.sum(F.when(F.col("grp") == "b", 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("grp") == "b", F.col("conv")).otherwise(0)).alias("xb"),
    )
    pa = F.col("xa") * 1.0 / F.col("na")
    pb = F.col("xb") * 1.0 / F.col("nb")
    pp = (F.col("xa") + F.col("xb")) * 1.0 / (F.col("na") + F.col("nb"))
    z = (pa - pb) / F.sqrt(pp * (1 - pp) * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    return g.select(
        F.col("dow").cast("bigint").alias("dow"),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        r4(pa).alias("p_a"),
        r4(pb).alias("p_b"),
        r4(z).alias("z"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).cast("bigint").alias("significant"),
    )


@register(
    "mannwhitney_u_test",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             CASE WHEN extract(day FROM ts) <= 15 THEN 1 ELSE 0 END AS is_ref
      FROM events
    ),
    pv AS (
      SELECT event_type, value,
             sum(is_ref) AS nr, sum(1 - is_ref) AS nc
      FROM e GROUP BY 1, 2
    ),
    rk AS (
      SELECT event_type, nr, nc, nr + nc AS t,
             sum(nr + nc) OVER (PARTITION BY event_type ORDER BY value)
               - (nr + nc) AS below
      FROM pv
    ),
    st AS (
      SELECT event_type,
             sum(nr) AS n1, sum(nc) AS n2,
             sum(nr * (below + (t + 1) / 2.0)) AS r1,
             sum(t * t * t - t) AS ties
      FROM rk GROUP BY 1
    )
    SELECT event_type, CAST(n1 AS BIGINT) AS n_ref, CAST(n2 AS BIGINT) AS n_cur,
           round(r1 - n1 * (n1 + 1) / 2.0, 4) AS u_stat,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / sqrt(n1 * n2 / 12.0
                        * ((n1 + n2 + 1.0)
                           - ties / ((n1 + n2) * (n1 + n2 - 1.0)))), 4) + 0.0
             AS z
    FROM st
    """,
)
def mannwhitney_u_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — Mann-Whitney U (Wilcoxon rank-sum) per event type
    between the month's halves: the NONPARAMETRIC location test the
    parametric z/t tests can't replace under skew, with textbook
    midrank tie handling AND the tie-corrected variance. Rank sums come
    from the same per-(type, distinct value) collapse as the KS query —
    `below + (t+1)/2` is the average rank of a tie group, so no
    row-level ranking ever happens: the window sorts the DISTINCT-value
    table. Every input to the statistic is integer counts → both
    engines compute bit-identical U and z."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("is_ref"),
    )
    pv = ev.groupBy("event_type", "value").agg(
        F.sum("is_ref").alias("nr"), F.sum(1 - F.col("is_ref")).alias("nc")
    )
    w = Window.partitionBy("event_type").orderBy("value")
    t = F.col("nr") + F.col("nc")
    rk = pv.select(
        "event_type",
        "nr",
        "nc",
        t.alias("t"),
        (F.sum(t).over(w) - t).alias("below"),
    )
    st = rk.groupBy("event_type").agg(
        F.sum("nr").alias("n1"),
        F.sum("nc").alias("n2"),
        F.sum(F.col("nr") * (F.col("below") + (F.col("t") + 1) / 2.0)).alias("r1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    mu = F.col("n1") * F.col("n2") / 2.0
    sig = F.sqrt(
        F.col("n1")
        * F.col("n2")
        / 12.0
        * (
            (F.col("n1") + F.col("n2") + 1.0)
            - F.col("ties")
            / ((F.col("n1") + F.col("n2")) * (F.col("n1") + F.col("n2") - 1.0))
        )
    )
    return st.select(
        "event_type",
        F.col("n1").cast("bigint").alias("n_ref"),
        F.col("n2").cast("bigint").alias("n_cur"),
        r4(u).alias("u_stat"),
        r4((u - mu) / sig).alias("z"),
    )


@register(
    "spearman_rank_correlation",
    oracle="""
    WITH li AS (
      SELECT l_returnflag AS flag, l_quantity AS q, l_extendedprice AS p
      FROM lineitem
    ),
    rq AS (
      SELECT flag, q,
             sum(count(*)) OVER (PARTITION BY flag ORDER BY q)
               - count(*) + (count(*) + 1) / 2.0 AS r
      FROM li GROUP BY flag, q
    ),
    rp AS (
      SELECT flag, p,
             sum(count(*)) OVER (PARTITION BY flag ORDER BY p)
               - count(*) + (count(*) + 1) / 2.0 AS r
      FROM li GROUP BY flag, p
    ),
    ranked AS (
      SELECT li.flag, rq.r AS r1, rp.r AS r2
      FROM li JOIN rq ON li.flag = rq.flag AND li.q = rq.q
              JOIN rp ON li.flag = rp.flag AND li.p = rp.p
    )
    SELECT flag, CAST(count(*) AS BIGINT) AS n,
           round(corr(r1, r2), 4) + 0.0 AS spearman_rho
    FROM ranked GROUP BY 1
    """,
)
def spearman_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — Spearman's ρ per return flag (quantity vs price):
    Pearson correlation of MIDRANKS, the tie-correct general form (the
    6Σd² shortcut is wrong under ties, and l_quantity is massively
    tied). Ranks come from the Mann-Whitney trick: collapse to distinct
    values per group, one window cumsum gives every tie group's midrank
    — so the rank "sort" runs over the DISTINCT-value tables (50-ish
    quantities, the price vocabulary), never a per-row ranking of the
    fact stream; the fact table then picks its ranks up via two
    hash joins and feeds one co-moment corr aggregate. Midranks are
    exact multiples of 0.5 → bit-identical inputs on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("q"),
        F.col("l_extendedprice").alias("p"),
    )

    def midranks(col: str) -> DataFrame:
        g = li.groupBy("flag", col).agg(F.count(F.lit(1)).alias("t"))
        w = Window.partitionBy("flag").orderBy(col)
        return g.select(
            "flag",
            col,
            (
                F.sum("t").over(w) - F.col("t") + (F.col("t") + 1) / 2.0
            ).alias(f"r_{col}"),
        )

    ranked = li.join(midranks("q"), on=["flag", "q"]).join(
        midranks("p"), on=["flag", "p"]
    )
    return ranked.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        r4(F.corr("r_q", "r_p")).alias("spearman_rho"),
    )


@register(
    "trade_graph_transitivity",
    oracle="""
    -- every multiply-referenced CTE is MATERIALIZED: DuckDB inlines
    -- plain CTEs per reference, so the un-materialized form re-ran the
    -- corpus-wide 4-way volume join inside EACH of e1/e2/e3 of the
    -- triangle join and each scalar subquery (sf0.1 sweep: >2 min ->
    -- 0.8 s materialized; result identical)
    WITH vol AS MATERIALIZED (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v, sum(l.l_quantity) AS q
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2
    ),
    und AS MATERIALIZED (
      SELECT least(u, v) AS a, greatest(u, v) AS b, sum(q) AS q
      FROM vol GROUP BY 1, 2
    ),
    med AS MATERIALIZED (SELECT median(q) AS m FROM und),
    e AS MATERIALIZED (SELECT a, b FROM und, med WHERE q > med.m),
    ed AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    tri AS (
      SELECT count(*) AS n3
      FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    deg AS MATERIALIZED (SELECT u, count(*) AS d FROM ed GROUP BY 1),
    wed AS (SELECT sum(d * (d - 1) / 2) AS nw FROM deg)
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT n3 FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT nw FROM wed) AS BIGINT) AS n_wedges,
           round(3.0 * (SELECT n3 FROM tri) / (SELECT nw FROM wed), 4)
             AS transitivity
    """,
)
def trade_graph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph — global transitivity (3·triangles / wedges) of the
    inter-nation trade graph, thresholded at the MEDIAN undirected edge
    volume so the topology is scale-invariant (an absolute cutoff would
    change the graph with SF — the scc_trade_partners discipline).
    local_clustering_coeff is the per-node version on the big
    co-occurrence graph; this is the one-number global summary, and on
    the nation graph the triangle join is dimension-sized — the
    heavyweight volume aggregation (the only corpus-wide pass) happens
    BEFORE any graph work. Oriented a<b triangle enumeration counts
    each exactly once; wedges from the degree identity Σd(d−1)/2."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v"))
        .agg(F.sum("l_quantity").alias("q"))
    )
    und = (
        vol.groupBy(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .agg(F.sum("q").alias("q"))
        .localCheckpoint(eager=True)  # median probe + edge filter
    )
    m = und.agg(F.expr("percentile(q, 0.5)").alias("m")).collect()[0]["m"]
    e = und.filter(F.col("q") > m).select("a", "b").localCheckpoint(eager=True)
    ed = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e2.a") == F.col("e1.a")) & (F.col("e2.b") > F.col("e1.b")),
        )
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.b")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .count()
    )
    deg = ed.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("nw"),
    ).collect()[0]
    n_edges = e.count()
    return spark.range(1).select(
        F.lit(stats["nn"]).cast("bigint").alias("n_nodes"),
        F.lit(n_edges).cast("bigint").alias("n_edges"),
        F.lit(tri).cast("bigint").alias("n_triangles"),
        F.lit(stats["nw"]).cast("bigint").alias("n_wedges"),
        r4(F.lit(3.0 * tri / stats["nw"])).alias("transitivity"),
    )


@register(
    "streaming_scd2_enrichment",
    oracle="""
    WITH h AS (SELECT * FROM events WHERE extract(day FROM ts) <= 15),
    ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
             event_id
      FROM h
    ),
    seg AS (
      SELECT user_id, event_type, ts,
             count(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seg_id
      FROM ordered
    ),
    spans AS (
      SELECT user_id, event_type AS state, seg_id, min(ts) AS vf
      FROM seg GROUP BY 1, 2, 3
    ),
    scd2 AS (
      SELECT user_id, state, vf,
             lead(vf) OVER (PARTITION BY user_id ORDER BY seg_id) AS vt
      FROM spans
    ),
    cur AS (
      SELECT e.ts, e.value, s.state
      FROM events e LEFT JOIN scd2 s
        ON e.user_id = s.user_id AND e.ts >= s.vf
           AND (s.vt IS NULL OR e.ts < s.vt)
      WHERE extract(day FROM e.ts) > 15 AND e.event_type = 'purchase'
    )
    SELECT coalesce(state, '<unknown>') AS state_at_purchase,
           strftime(ts, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(value), 4) AS purchase_value
    FROM cur GROUP BY 1, 2
    """,
)
def streaming_scd2_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 streaming × SCD2 — POINT-IN-TIME enrichment: second-half
    purchase events stream through a stream-static LEFT join against
    the SCD2 state history built from the month's first half, matched
    AS OF each purchase's event time (valid_from ≤ ts < valid_to, open
    current spans) — the "what state was this user in when they bought"
    join that naive current-state enrichment gets wrong for late or
    replayed events. Stream-static joins are stateless per micro-batch,
    so this costs a per-batch hash join against the (broadcastable)
    dimension history — no state store, no watermark coupling; the
    batch twin is scd2_lookup_join. Purchases before any span or for
    users with no first-half history report '<unknown>' (the LEFT
    contract, oracle-encoded)."""
    import os
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    h = ev.filter(F.dayofmonth("ts") <= 15)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    marker = F.when(prev.isNull() | (prev != F.col("event_type")), 1)
    seg = h.select(
        "user_id", "event_type", "ts",
        F.count(marker).over(w).alias("seg_id"),
    )
    spans = seg.groupBy("user_id", "event_type", "seg_id").agg(
        F.min("ts").alias("vf")
    )
    w2 = Window.partitionBy("user_id").orderBy("seg_id")
    scd2 = spans.select(
        F.col("user_id").alias("s_user"),
        F.col("event_type").alias("state"),
        "vf",
        F.lead("vf").over(w2).alias("vt"),
    ).localCheckpoint(eager=True)  # frozen dimension history for every batch
    d = os.path.join(
        tempfile.gettempdir(), f"graft_stream_scd2_{_sf_tag(sf_dir)}"
    )
    ev.write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(ev.schema).parquet(d)
        .filter((F.dayofmonth("ts") > 15) & (F.col("event_type") == "purchase"))
    )
    joined = stream.join(
        scd2,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("ts") >= F.col("vf"))
        & (F.col("vt").isNull() | (F.col("ts") < F.col("vt"))),
        "left",
    )
    qname = "mem_scd2_enrich"
    with _stream_state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
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
    return (
        spark.table(qname)
        .groupBy(
            F.coalesce(F.col("state"), F.lit("<unknown>")).alias(
                "state_at_purchase"
            ),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            r4(F.sum("value")).alias("purchase_value"),
        )
    )


_SQL_API_TEXT = """
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 4) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
"""


@register("sql_api_region_revenue", oracle=_SQL_API_TEXT)
def sql_api_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """API surface — the SAME ANSI SQL text runs on both engines:
    `register_views` (tables.py) exposes the fixture tables as temp
    views and `spark.sql` executes the oracle string VERBATIM (the
    oracle here IS the Spark query). Proves the engine's second query
    surface — everything else in this inventory is DataFrame-built, but
    a reference user migrating SQL text needs `spark.sql` to produce
    the identical Catalyst plans, broadcast the dimension chain, and
    push the column prune into the scans exactly as the DataFrame API
    does. Four-table star join: region→nation broadcast down the
    customer→orders fact chain, one aggregate."""
    from graph_db_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_API_TEXT)


@register(
    "degree_powerlaw_mle",
    oracle="""
    WITH deg AS (
      SELECT l_partkey, count(DISTINCT o_custkey) AS d
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    ),
    tail AS (SELECT d FROM deg WHERE d >= 2)
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_tail,
           CAST(2 AS BIGINT) AS d_min,
           round(1.0 + count(*) / sum(ln(d / 1.5)), 4) AS alpha,
           round(avg(d), 4) AS mean_tail_degree
    FROM tail
    """,
)
def degree_powerlaw_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph statistics — the Clauset-Shalizi-Newman MLE for a discrete
    power-law exponent on the part-popularity degree distribution
    (distinct customers per part): α̂ = 1 + n / Σ ln(d/(dmin−½)),
    the estimator a log-log regression (zipf_law_fit's method) biases —
    the two queries are the method pair the CSN paper contrasts. One
    distinct-count aggregate builds the degree table; the MLE is a
    single co-aggregate over its d ≥ dmin tail (no ranking, no
    binning). heavy-tail α near 2-3 ⇒ hub-guard operators (the dedup
    family's bucket caps, skew salting) are mandatory at scale — this
    query is the measurement that justifies them."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    deg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_partkey")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .localCheckpoint(eager=True)  # node count + tail aggregate
    )
    n_nodes = deg.count()  # 1-row scalar probe
    tail = deg.filter(F.col("d") >= 2)
    return tail.agg(
        F.lit(n_nodes).cast("bigint").alias("n_nodes"),
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        F.lit(2).cast("bigint").alias("d_min"),
        r4(1.0 + F.count(F.lit(1)) / F.sum(F.log(F.col("d") / 1.5))).alias("alpha"),
        r4(F.avg("d")).alias("mean_tail_degree"),
    )


@register(
    "conversion_latency_quantiles",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v0 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p0
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.v0
      WHERE e.event_type = 'purchase'
      GROUP BY 1
    ),
    lat AS (
      SELECT epoch(p.p0) - epoch(v.v0) AS sec
      FROM v JOIN p ON v.user_id = p.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(sec / 3600.0, 0.25), 4) AS p25_hours,
           round(quantile_cont(sec / 3600.0, 0.50), 4) AS p50_hours,
           round(quantile_cont(sec / 3600.0, 0.75), 4) AS p75_hours,
           round(quantile_cont(sec / 3600.0, 0.90), 4) AS p90_hours
    FROM lat
    """,
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analytics — time-to-convert distribution: for each user,
    the latency from FIRST view to the first purchase at-or-after it,
    summarized at p25/50/75/90 (funnel_conversion counts who converts;
    this measures HOW FAST — the pair product teams read together).
    Two per-user min-aggregates and one equi-join on user_id (the
    at-or-after condition folds into the purchase-side min over the
    semi-joined stream — never a per-user sort); the final quantiles
    run over the |converted users| latency vector via exact
    interpolated percentile. Latencies are exact epoch-microsecond
    diffs, identical doubles on both engines."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(v), on="user_id")
        .filter(F.col("ts") >= F.col("v0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p0"))
    )
    lat = v.join(p, on="user_id").select(
        (
            (F.unix_micros("p0") - F.unix_micros("v0")) / F.lit(1e6) / 3600.0
        ).alias("hours")
    )
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        r4(F.expr("percentile(hours, 0.25)")).alias("p25_hours"),
        r4(F.expr("percentile(hours, 0.50)")).alias("p50_hours"),
        r4(F.expr("percentile(hours, 0.75)")).alias("p75_hours"),
        r4(F.expr("percentile(hours, 0.90)")).alias("p90_hours"),
    )


@register(
    "session_path_topk",
    oracle="""
    WITH paths AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM events GROUP BY 1, 2
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paths GROUP BY 1
    ORDER BY count(*) DESC, path LIMIT 10
    """,
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining — the top-10 most common user-day event PATHS
    (ordered event-type journeys, 'view>click>purchase'-style): what a
    product team reads before funnel design, and the order-sensitive
    counterpart of event_transition_matrix's first-order pairs. The
    path builds as `array_sort(collect_list(struct(ts, event_id,
    type)))` inside one (user, day) aggregate — event_id breaks
    timestamp ties so both engines concatenate the identical sequence —
    then paths count like any categorical. Per-group state is bounded
    by the session horizon (one day); the top-k ranks the path
    VOCABULARY, not the sessions."""
    ev = load_table(spark, sf_dir, "events")
    paths = ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s.event_type,
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(10)
    )


@register(
    "rfm_customer_segments",
    oracle="""
    WITH mx AS (SELECT max(o_orderdate) AS m FROM orders),
    rfm AS (
      SELECT o_custkey AS c,
             date_diff('day', max(o_orderdate), (SELECT m FROM mx)) AS recency,
             count(*) AS frequency,
             sum(o_totalprice) AS monetary
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT c, recency, frequency, monetary,
             ntile(5) OVER (ORDER BY recency DESC, c) AS r_score,
             ntile(5) OVER (ORDER BY frequency, c) AS f_score,
             ntile(5) OVER (ORDER BY CAST(round(monetary * 100) AS BIGINT), c)
               AS m_score
      FROM rfm
    ),
    seg AS (
      SELECT *,
             CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                  WHEN r_score >= 4 THEN 'recent'
                  WHEN f_score >= 4 THEN 'loyal_lapsing'
                  WHEN r_score <= 2 AND f_score <= 2 THEN 'at_risk'
                  ELSE 'regular' END AS segment
      FROM scored
    )
    SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(recency), 4) AS avg_recency_days,
           round(avg(frequency), 4) AS avg_orders,
           round(sum(monetary), 4) AS total_value,
           CAST(min(c) AS BIGINT) AS min_custkey,
           CAST(max(c) AS BIGINT) AS max_custkey
    FROM seg GROUP BY 1
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytics capstone — RFM (recency / frequency / monetary)
    customer segmentation, the marketing-analytics standard: one grouped
    pass builds the per-customer RFM triple, three global ntile(5)
    windows score it, and a rule CASE maps scores to named segments
    (champion / recent / loyal_lapsing / at_risk / regular). NO global
    window (r7 verdict fix): each of the three quintile scores comes
    from the two-level prefix-sum global rank (``with_global_rank`` —
    range partition + pid-local row_number + broadcast offsets) plus
    the closed-form exact-ANSI tile arithmetic (``ntile_of``) — the
    order_value_deciles pattern ×3. A billion customers rank as
    3 × #partitions parallel sorts; ties break on custkey so both
    engines assign identical quintiles."""
    from graph_db_spark.operators.aggregates import ntile_of, with_global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    mx = o.agg(F.max("o_orderdate")).collect()[0][0]  # 1-row scalar probe
    rfm = o.groupBy(F.col("o_custkey").alias("c")).agg(
        F.datediff(F.lit(mx), F.max("o_orderdate")).alias("recency"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("o_totalprice").alias("monetary"),
    ).localCheckpoint()  # three rankings + the count scalar share one materialization
    n_total = rfm.agg(F.count(F.lit(1)).alias("_n"))
    # ONE ranking pass serves all three quintiles: stack the three
    # (dimension, sort-value) projections dim-tagged into a 3n-row
    # frame and rank it globally by (dim, v, c) — the per-dimension
    # rank is then global_rank − dim·n (each dim block is contiguous
    # in the total order). Negating recency turns its DESC order into
    # the shared ASC one. The shared sort key is DECIMAL(38,0), never
    # raw double (r8 advice): monetary rides as an integer CENT count,
    # rounded to cents IDENTICALLY on both sides (half-up; the oracle
    # ranks CAST(round(monetary*100) AS BIGINT)), so sub-cent FP noise
    # in either engine's double sum can never reorder the quintile sort
    # — noise-distinct values collapse to a tie and break on custkey on
    # BOTH sides; recency/frequency are ints, exact in any integral
    # decimal. (The cent count itself is exact while the double sum is,
    # i.e. below 2^53 cents ≈ $9e13 per customer.)
    stacked = rfm.select(
        "c",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("dim"),
                    (-F.col("recency")).cast("decimal(38,0)").alias("v"),
                ),
                F.struct(
                    F.lit(1).alias("dim"),
                    F.col("frequency").cast("decimal(38,0)").alias("v"),
                ),
                F.struct(
                    F.lit(2).alias("dim"),
                    (F.col("monetary") * 100).cast("decimal(38,0)").alias("v"),
                ),
            )
        ).alias("e"),
    ).select("c", F.col("e.dim").alias("dim"), F.col("e.v").alias("v"))
    ranked = with_global_rank(
        stacked, [F.asc("dim"), F.asc("v"), F.asc("c")], rank_col="_gr"
    )
    tiles = ranked.crossJoin(F.broadcast(n_total)).select(  # 1-row scalar attach
        "c",
        "dim",
        ntile_of(
            F.col("_gr") - F.col("dim").cast("bigint") * F.col("_n"), F.col("_n"), 5
        ).alias("tile"),
    )
    scores = tiles.groupBy("c").agg(
        F.max(F.when(F.col("dim") == 0, F.col("tile"))).alias("r_score"),
        F.max(F.when(F.col("dim") == 1, F.col("tile"))).alias("f_score"),
        F.max(F.when(F.col("dim") == 2, F.col("tile"))).alias("m_score"),
    )
    scored = rfm.join(scores, on="c")
    segment = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when(F.col("r_score") >= 4, "recent")
        .when(F.col("f_score") >= 4, "loyal_lapsing")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "at_risk")
        .otherwise("regular")
    )
    return scored.groupBy(segment.alias("segment")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        r4(F.avg("recency")).alias("avg_recency_days"),
        r4(F.avg("frequency")).alias("avg_orders"),
        r4(F.sum("monetary")).alias("total_value"),
        F.min("c").cast("bigint").alias("min_custkey"),
        F.max("c").cast("bigint").alias("max_custkey"),
    )


@register(
    "snapshot_rebucket_evolution",
    oracle="""
    SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
           round(sum(CASE WHEN c_custkey % 4 = 1 THEN c_acctbal * 2
                          ELSE c_acctbal END), 4) AS sum_bal
    FROM customer GROUP BY 1
    UNION ALL SELECT '__routed_1_of_16__', 1, 0.0
    UNION ALL SELECT '__v1_routed_1_of_4__', 1, 0.0
    """,
)
def snapshot_rebucket_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot table — bucket-count EVOLUTION (partition-spec evolution
    for a hash layout): create at 4 buckets, merge an update, rebucket
    to 16, and verify atomically-switched routing — a point lookup on
    the latest version opens 1 of 16 files while TIME TRAVEL to the
    pre-evolution version still routes 1 of 4 (each manifest carries
    its own count; readers are manifest-driven so nothing is ever
    half-migrated). The aggregate of the post-evolution read is
    hash-checked against the closed-form reconstruction. Cost truth:
    rebucketing is one full rewrite — priced like capacity planning,
    not like a merge; see writers/snapshots.py rebucket."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import SnapshotTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = os.path.join(
        tempfile.gettempdir(), f"graft_snap_rebkt_{_sf_tag(sf_dir)}"
    )
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable.create(spark, path, cust, ["c_custkey"], n_buckets=4)
    t.merge(
        cust.filter(F.col("c_custkey") % 4 == 1).withColumn(
            "c_acctbal", F.col("c_acctbal") * 2
        )
    )
    t.rebucket(16)
    probe = cust.agg(F.min("c_custkey")).collect()[0][0]  # 1-row scalar
    r_new, tot_new = t.pruned_files({"c_custkey": (probe, probe)})
    r_old, tot_old = t.pruned_files({"c_custkey": (probe, probe)}, version=1)
    agg = t.read().groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        r4(F.sum("c_acctbal")).alias("sum_bal"),
    )

    def flag(name: str, ok: bool) -> DataFrame:
        return spark.range(1).select(
            F.lit(name).alias("seg"),
            F.lit(1 if ok else 0).cast("bigint").alias("n"),
            F.lit(0.0).alias("sum_bal"),
        )

    return _metric_rows(
        agg,
        flag("__routed_1_of_16__", r_new == 1 and tot_new == 16),
        flag("__v1_routed_1_of_4__", r_old == 1 and tot_old == 4),
    )


@register(
    "snapshot_bloom_point_skip",
    oracle="""
    WITH probe AS (
      SELECT o_totalprice AS v FROM orders ORDER BY o_orderkey LIMIT 3
    )
    SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o.o_custkey AS BIGINT) AS o_custkey,
           round(o.o_totalprice, 4) AS price
    FROM orders o JOIN probe ON o.o_totalprice = probe.v
    UNION ALL SELECT -1, 1, 0.0
    """,
)
def snapshot_bloom_point_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot table — per-bucket BLOOM-FILTER pruning (the Parquet /
    Iceberg bloom-index analog at manifest level): point lookups on a
    non-key, non-clustered, high-cardinality column (o_totalprice) skip
    every bucket whose filter proves the value absent — the pruning
    dimension hash bucketing (key equality only) and range stats
    (clustered order only) both miss. The query creates an orders
    snapshot with ``bloom_on=['o_totalprice']``, probes the prices of
    the three smallest orderkeys, and emits the matching rows (oracle:
    the same lookup on raw orders) plus a contract row asserting the
    scans together opened FEWER files than 3 full sweeps — with ~10 bits
    per distinct value the expected false-positive rate is ~1%, so at
    least one of the 8 buckets prunes with near-certainty at every SF.
    Filters are built in one distributed aggregate per commit and
    rebuilt only for rewritten buckets (carried entries keep theirs)."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import SnapshotTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = os.path.join(
        tempfile.gettempdir(), f"graft_snap_bloom_{_sf_tag(sf_dir)}"
    )
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable.create(
        spark, path, orders, ["o_orderkey"], n_buckets=8,
        bloom_on=["o_totalprice"],
    )
    probes = [
        r["o_totalprice"]
        for r in orders.orderBy("o_orderkey").limit(3).collect()  # 3-row probe
    ]
    hits = None
    files_read = 0
    files_total = 0
    for v in probes:
        r, tot = t.pruned_files({"o_totalprice": (v, v)})
        files_read, files_total = files_read + r, files_total + tot
        s = t.scan({"o_totalprice": (v, v)})
        hits = s if hits is None else hits.unionByName(s)
    pruned_ok = files_read < files_total
    return _metric_rows(
        hits.select(
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            r4(F.col("o_totalprice")).alias("price"),
        ),
        spark.range(1).select(
            F.lit(-1).cast("bigint").alias("o_orderkey"),
            F.lit(1 if pruned_ok else 0).cast("bigint").alias("o_custkey"),
            F.lit(0.0).alias("price"),
        ),
    )


@register(
    "bootstrap_ci_mean",
    oracle=f"""
    WITH x AS (
      SELECT event_type, value,
             CAST(event_id AS VARCHAR) || ':' || CAST(r.b AS VARCHAR) AS hk,
             r.b AS b
      FROM events CROSS JOIN (SELECT unnest(range(0, 32)) AS b) r
    ),
    w AS (
      SELECT event_type, b, value,
             CASE WHEN u < {_POIS1_CDF[0]} THEN 0
                  WHEN u < {_POIS1_CDF[1]} THEN 1
                  WHEN u < {_POIS1_CDF[2]} THEN 2
                  WHEN u < {_POIS1_CDF[3]} THEN 3
                  WHEN u < {_POIS1_CDF[4]} THEN 4
                  ELSE 5 END AS w
      FROM (SELECT event_type, b, value,
                   ({_poly_sql('hk')}) / 2147483647.0 AS u FROM x)
    ),
    rep AS (
      SELECT event_type, b, sum(w * value) / sum(w) AS mb
      FROM w GROUP BY 1, 2 HAVING sum(w) > 0
    ),
    base AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n, avg(value) AS mean
      FROM events GROUP BY 1
    )
    SELECT base.event_type, n, round(mean, 4) AS mean,
           round(quantile_cont(mb, 0.025), 4) AS ci_lo,
           round(quantile_cont(mb, 0.975), 4) AS ci_hi
    FROM base JOIN rep ON base.event_type = rep.event_type
    GROUP BY 1, 2, 3
    """,
)
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — DISTRIBUTED bootstrap: a 95% CI on each type's mean
    via the Poisson bootstrap (Chamandy et al., "Estimating Uncertainty
    for Massive Data Streams" — resample weights ~ Poisson(1) per
    (row, replicate) instead of multinomial draws, which is the only
    bootstrap that works when no worker can see n). Fully deterministic:
    the weight comes from inverting the Poisson(1) CDF at a portable
    md5-hash uniform of (event_id, replicate), so both engines draw the
    SAME resamples — the randomness is reproducible, not seeded-global.
    Cost: one explode ×32 replicates (linear, constant factor B) + one
    (type, replicate) aggregate + a 32-row-per-type percentile — no
    driver loop, no global sort. The CI percentile interpolates
    identically (Spark `percentile` == DuckDB `quantile_cont`)."""
    from graph_db_spark.operators.dedup import portable_hash
    from graph_db_spark.util import spread

    # spread: events is one parquet file, and the x32 replicate explode +
    # md5 weight draw is the heavy PRE-shuffle stage — without this it
    # runs on a single task
    ev = spread(load_table(spark, sf_dir, "events")).select(
        "event_id", "event_type", "value"
    )
    x = ev.select(
        "event_type",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
        "event_id",
    ).withColumn("hk", F.concat_ws(":", "event_id", "b"))
    u = portable_hash(F.col("hk")) / F.lit(2147483647.0)
    cdf = [F.lit(float(c)) for c in _POIS1_CDF]
    w = (
        F.when(u < cdf[0], 0)
        .when(u < cdf[1], 1)
        .when(u < cdf[2], 2)
        .when(u < cdf[3], 3)
        .when(u < cdf[4], 4)
        .otherwise(5)
    )
    rep = (
        x.withColumn("w", w)
        .groupBy("event_type", "b")
        .agg(
            F.sum(F.col("w") * F.col("value")).alias("swx"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select("event_type", (F.col("swx") / F.col("sw")).alias("mb"))
    )
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("value").alias("mean"),
    )
    ci = rep.groupBy("event_type").agg(
        F.expr("percentile(mb, 0.025)").alias("lo"),
        F.expr("percentile(mb, 0.975)").alias("hi"),
    )
    return base.join(F.broadcast(ci), on="event_type").select(
        "event_type",
        "n",
        r4(F.col("mean")).alias("mean"),
        r4(F.col("lo")).alias("ci_lo"),
        r4(F.col("hi")).alias("ci_hi"),
    )


@register(
    "trimmed_mean_stats",
    oracle="""
    WITH th AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY 1
    )
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 4) AS raw_mean,
           round(avg(value) FILTER (WHERE value >= lo AND value <= hi), 4)
             AS trimmed_mean,
           round(avg(greatest(lo, least(hi, value))), 4) AS winsor_mean,
           round(any_value(lo), 4) AS p05, round(any_value(hi), 4) AS p95
    FROM events e JOIN th ON e.event_type = th.event_type
    GROUP BY 1
    """,
)
def trimmed_mean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — robust location estimates per type: the 5/95-trimmed
    mean (drop the tails) and the winsorized mean (clamp the tails),
    side by side with the raw mean — the outlier-robust aggregation pair
    (robust_outliers is the detection twin; this is the estimation one).
    Plan: one grouped percentile pass produces the |types|-sized
    threshold table, which broadcasts back over the fact stream for the
    conditional/clamped averages — two shuffles total, no per-group
    sort of the fact side. Thresholds interpolate identically in both
    engines, so the trim set membership is bit-deterministic."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    th = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    j = ev.join(F.broadcast(th), on="event_type")
    inside = (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value")))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        r4(F.avg("value")).alias("raw_mean"),
        r4(F.avg(F.when(inside, F.col("value")))).alias("trimmed_mean"),
        r4(F.avg(clamped)).alias("winsor_mean"),
        r4(F.first("lo")).alias("p05"),
        r4(F.first("hi")).alias("p95"),
    )


@register(
    "snapshot_tag_travel",
    oracle="""
    SELECT 'baseline' AS snap, c_mktsegment AS seg,
           CAST(count(*) AS BIGINT) AS n, round(sum(c_acctbal), 4) AS sum_bal
    FROM customer GROUP BY 2
    UNION ALL
    SELECT 'latest', c_mktsegment, CAST(count(*) AS BIGINT),
           round(sum(CASE WHEN c_custkey % 4 = 1 THEN c_acctbal * 2
                          WHEN c_custkey % 4 = 2 THEN c_acctbal + 1000
                          ELSE c_acctbal END), 4)
    FROM customer GROUP BY 2
    UNION ALL SELECT '__flags__', '__tag_pinned_v1__', 1, 0.0
    UNION ALL SELECT '__flags__', '__v2_vacuumed__', 1, 0.0
    """,
)
def snapshot_tag_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot table — named refs (the Iceberg TAG analog): tag v1 as
    `baseline`, commit two more merges, then vacuum with keep_last=1.
    The contract under test: the tagged version's manifest AND data
    files survive vacuum (v2, untagged, is reclaimed — the flag rows
    assert both), and `read(tag=)` still serves the exact v1 snapshot —
    the audit/reproducibility anchor pattern ("the corpus revision this
    run trained on") that plain keep_last retention cannot express.
    Aggregates of the tag read and the latest read are both
    oracle-checked against closed-form reconstructions. Commit overhead
    is SF-independent driver-fixed cost, same as the WAP/lifecycle
    queries; see writers/snapshots.py create_tag/vacuum."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import SnapshotTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = os.path.join(
        tempfile.gettempdir(), f"graft_snap_tag_{_sf_tag(sf_dir)}"
    )
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable.create(spark, path, cust, ["c_custkey"], n_buckets=8)
    t.create_tag("baseline")
    t.merge(
        cust.filter(F.col("c_custkey") % 4 == 1).withColumn(
            "c_acctbal", F.col("c_acctbal") * 2
        )
    )
    t.merge(
        cust.filter(F.col("c_custkey") % 4 == 2).withColumn(
            "c_acctbal", F.col("c_acctbal") + 1000
        )
    )
    t.vacuum(keep_last=1, min_age_seconds=0.0)
    pinned = (
        t.resolve_tag("baseline") == 1
        and os.path.exists(t._manifest_path(1))
        and t.tags() == {"baseline": 1}
    )
    v2_gone = not os.path.exists(t._manifest_path(2))

    def agg(df: DataFrame, snap: str) -> DataFrame:
        return df.groupBy(F.col("c_mktsegment").alias("seg")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            r4(F.sum("c_acctbal")).alias("sum_bal"),
        ).select(F.lit(snap).alias("snap"), "seg", "n", "sum_bal")

    def flag(name: str, ok: bool) -> DataFrame:
        return spark.range(1).select(
            F.lit("__flags__").alias("snap"),
            F.lit(name).alias("seg"),
            F.lit(1 if ok else 0).cast("bigint").alias("n"),
            F.lit(0.0).alias("sum_bal"),
        )

    return _metric_rows(
        agg(t.read(tag="baseline"), "baseline"),
        agg(t.read(), "latest"),
        flag("__tag_pinned_v1__", pinned),
        flag("__v2_vacuumed__", v2_gone),
    )


@register(
    "ngram_containment_pairs",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    gl AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(w) - 2, 0)),
                                          i -> array_to_string(w[i+1:i+3], ' '))) AS grams
      FROM words
    ),
    sz AS (SELECT doc_id, len(grams) AS g FROM gl WHERE len(grams) > 0),
    posting AS (SELECT doc_id, unnest(grams) AS gram FROM gl),
    keepg AS (
      SELECT gram FROM posting GROUP BY 1 HAVING count(*) <= 100
    ),
    pk AS (SELECT doc_id, gram FROM posting JOIN keepg USING (gram)),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      FROM pk a JOIN pk b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT id_a, id_b, n_shared,
             n_shared * 1.0 / x.g AS ca, n_shared * 1.0 / y.g AS cb
      FROM shared JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
    )
    SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
           round(ca, 4) AS cont_a_in_b, round(cb, 4) AS cont_b_in_a
    FROM scored WHERE greatest(ca, cb) >= 0.5
    """,
)
def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup — asymmetric n-gram CONTAINMENT, |g(A)∩g(B)| / |g(A)|: the
    measure that catches a document swallowed inside a larger one, which
    symmetric Jaccard dilutes below threshold (Broder's containment vs
    resemblance distinction — the quote/boilerplate-inclusion detector).
    Scale path: a 3-gram posting-list self-join — never an all-pairs doc
    join — with stop-gram suppression (grams in >100 docs are dropped
    from the posting list; they carry no identification signal and their
    postings are exactly the quadratic blow-up, the ngram-jaccard
    guard_block_pairs discipline applied per-gram). Shared-gram counts
    group once per candidate pair; the per-doc gram-count table joins
    back for the two directional ratios (pure int division — identical
    doubles both engines). Emits both directions per unordered pair,
    kept when either containment ≥ 0.5."""
    from graph_db_spark.util import spread

    # spread: documents is one parquet file; without it the gram build
    # (the dominant expression cost) runs on a single task
    docs = spread(load_table(spark, sf_dir, "documents"))
    gl = docs.select(
        "doc_id", TX.word_ngrams(F.col("text"), 3).alias("grams")
    )
    sz = gl.filter(F.size("grams") > 0).select(
        "doc_id", F.size("grams").alias("g")
    )
    posting = gl.select("doc_id", F.explode("grams").alias("gram"))
    # documents is ONE parquet file -> every descendant op runs single-task
    # unless spread; partition on the pair-join key so the self-join both
    # parallelizes AND needs no further exchange (measured 48s -> ~3s at
    # sf0.1 min-of-2; the ngram_jaccard bucket-spread lesson, same cause)
    posting = posting.repartition(32, "gram").localCheckpoint(eager=True)
    keepg = (
        posting.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 100)
        .select("gram")
    )
    pk = posting.join(F.broadcast(keepg), on="gram")
    a = pk.alias("a")
    b = pk.select(F.col("doc_id").alias("id_b"), F.col("gram").alias("gb")).alias("b")
    shared = (
        a.join(b, (F.col("a.gram") == F.col("gb")) & (F.col("a.doc_id") < F.col("id_b")))
        .groupBy(F.col("a.doc_id").alias("id_a"), "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    x = sz.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    y = sz.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb2"))
    scored = (
        shared.join(F.broadcast(x), on="id_a")
        .join(F.broadcast(y), on="id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            (F.col("n_shared") * 1.0 / F.col("ga")).alias("ca"),
            (F.col("n_shared") * 1.0 / F.col("gb2")).alias("cb"),
        )
    )
    return (
        scored.filter(F.greatest("ca", "cb") >= 0.5)
        .select(
            "id_a",
            "id_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            r4(F.col("ca")).alias("cont_a_in_b"),
            r4(F.col("cb")).alias("cont_b_in_a"),
        )
    )


@register(
    "embedding_eval_contamination",
    oracle="""
    WITH ev AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id % 20 = 0
    ),
    tr AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id % 20 <> 0
    ),
    scored AS (
      SELECT ev.vec_id AS eval_id, tr.vec_id AS train_id,
             list_cosine_similarity(tr.v, ev.v) AS cos,
             row_number() OVER (
               PARTITION BY ev.vec_id
               ORDER BY list_cosine_similarity(tr.v, ev.v) DESC, tr.vec_id
             ) AS rn
      FROM tr CROSS JOIN ev
    )
    SELECT CAST(eval_id AS BIGINT) AS eval_id, CAST(rn AS BIGINT) AS rank,
           CAST(train_id AS BIGINT) AS train_id,
           round(cos, 4) + 0.0 AS cosine,
           CAST(CASE WHEN cos >= 0.9 THEN 1 ELSE 0 END AS BIGINT)
             AS contaminated
    FROM scored WHERE rn <= 3
    """,
)
def embedding_eval_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination — the EMBEDDING twin of benchmark_decontamination:
    for each held-out eval vector (vec_id % 20 == 0 stands in for the
    benchmark embeddings), its 3 nearest TRAINING vectors by cosine with
    a contaminated flag at 0.9 — the paraphrase-contamination audit the
    n-gram collision test misses. Emitting the top-3 (not only
    over-threshold hits) keeps the audit evidential on a clean corpus:
    the fixture has NO cross-set near-dups (max cosine ~0.5 at every
    SF), and a report of the nearest misses is what a real curation run
    reviews. Plan: eval broadcasts (eval suites are tiny vs a 100 TB
    corpus) over the spread train side — the corpus never shuffles and
    never self-joins; the per-eval top-3 window partitions on the
    |eval|-sized key after a |train|×|eval| in-task score pass."""
    from graph_db_spark.util import spread

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    ev = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("eval_id"), v.alias("ve")
    )
    # one-file source -> spread the corpus side or the broadcast nested
    # loop runs on a single task (the embedding_near_dup_pairs lesson)
    tr = spread(emb.filter(F.col("vec_id") % 20 != 0)).select(
        F.col("vec_id").alias("train_id"), v.alias("vt")
    )
    cos = SIM.cosine(F.col("vt"), F.col("ve"))
    scored = tr.crossJoin(F.broadcast(ev)).select(
        "eval_id", "train_id", cos.alias("cos")
    )
    w = Window.partitionBy("eval_id").orderBy(F.desc("cos"), "train_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("eval_id").cast("bigint").alias("eval_id"),
            F.col("rank").cast("bigint").alias("rank"),
            F.col("train_id").cast("bigint").alias("train_id"),
            r4(F.col("cos")).alias("cosine"),
            F.when(F.col("cos") >= 0.9, 1).otherwise(0).cast("bigint").alias(
                "contaminated"
            ),
        )
    )


@register(
    "jaccard_link_prediction",
    oracle="""
    WITH cp AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    keep AS (
      SELECT p FROM cp GROUP BY 1 HAVING count(*) BETWEEN 2 AND 500
    ),
    cpk AS (SELECT c, p FROM cp JOIN keep USING (p)),
    nb AS (SELECT c, count(*) AS d FROM cpk GROUP BY 1),
    w AS (
      SELECT a.c AS ca, b.c AS cb, count(*) AS common
      FROM cpk a JOIN cpk b ON a.p = b.p AND a.c < b.c
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT ca, cb, common,
             common * 1.0 / (x.d + y.d - common) AS j
      FROM w JOIN nb x ON w.ca = x.c JOIN nb y ON w.cb = y.c
    )
    SELECT CAST(ca AS BIGINT) AS cust_a, CAST(cb AS BIGINT) AS cust_b,
           CAST(common AS BIGINT) AS common_parts,
           round(j, 4) AS jaccard
    FROM scored ORDER BY j DESC, ca, cb LIMIT 50
    """,
)
def jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph — Jaccard-coefficient link prediction on the customer↔part
    bipartite graph: |N(a)∩N(b)| / |N(a)∪N(b)| over hub-suppressed part
    neighborhoods (deg 2..500 — the Adamic-Adar query's cap; both
    neighborhood sizes count KEPT parts so numerator and denominator live
    in the same universe). Same Σdeg²-bounded wedge enumeration as
    link_prediction_adamic_adar — one wedge join proposes pairs, then the
    customer-degree table (|customers|-sized) broadcasts back for the
    ratio. Jaccard is pure integer arithmetic, so both engines rank on
    bit-identical doubles; top-50 on the RAW score with (a, b)
    tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    keep = (
        cp.groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter((F.col("d") >= 2) & (F.col("d") <= 500))
        .select("p")
    )
    cpk = cp.join(F.broadcast(keep), on="p").localCheckpoint(eager=True)
    nb = cpk.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    a = cpk.alias("a")
    b = cpk.select(F.col("c").alias("cb"), F.col("p").alias("pb")).alias("b")
    w = (
        a.join(b, (F.col("a.p") == F.col("pb")) & (F.col("a.c") < F.col("cb")))
        .groupBy(F.col("a.c").alias("ca"), "cb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    x = nb.select(F.col("c").alias("ca"), F.col("d").alias("da"))
    y = nb.select(F.col("c").alias("cb"), F.col("d").alias("db"))
    j = F.col("common") * 1.0 / (F.col("da") + F.col("db") - F.col("common"))
    scored = w.join(F.broadcast(x), on="ca").join(F.broadcast(y), on="cb")
    return (
        scored.withColumn("_j", j)
        .orderBy(F.desc("_j"), "ca", "cb")
        .limit(50)
        .select(
            F.col("ca").cast("bigint").alias("cust_a"),
            F.col("cb").cast("bigint").alias("cust_b"),
            F.col("common").cast("bigint").alias("common_parts"),
            r4(F.col("_j")).alias("jaccard"),
        )
    )


@register(
    "sq8_quantization_bound",
    oracle="""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    flat AS (
      SELECT vec_id, unnest(range(1, len(e) + 1)) AS pos, e FROM base
    ),
    vals AS (SELECT vec_id, pos, e[pos] AS v FROM flat),
    dimstats AS (
      SELECT pos, min(v) AS lo, max(v) AS hi,
             (max(v) - min(v)) / 255.0 AS step
      FROM vals GROUP BY 1
    ),
    coded AS (
      SELECT v.vec_id, v.pos, v.v, d.lo, d.step,
             CASE WHEN d.step > 0
                  THEN floor((v.v - d.lo) / d.step + 0.5) ELSE 0.0 END AS code
      FROM vals v JOIN dimstats d USING (pos)
    ),
    errs AS (
      SELECT vec_id, pos,
             CASE WHEN step > 0
                  THEN abs(v - (lo + code * step)) / step ELSE 0.0 END AS es
      FROM coded
    )
    SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
           CAST(count(DISTINCT pos) AS BIGINT) AS n_dims,
           round(max(es), 4) + 0.0 AS max_step_err,
           CAST(CASE WHEN max(es) <= 0.500001 THEN 1 ELSE 0 END AS BIGINT)
             AS within_half_step
    FROM errs
    """,
)
def sq8_quantization_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding compression, scalar-quantization flavor (FAISS SQ8):
    per-dimension global [min, max] ranges, 8-bit codes
    code = floor((v−lo)/step + 0.5), and the reconstruction-error
    contract — every value must decode within HALF a quantization step
    (the definitional bound; emitted as a checked flag). Completes the
    compression family beside PQ/IVF-PQ (which quantize jointly per
    subspace): SQ8 is the 4x-memory-cut default when recall must stay
    near-exact. Train = one narrow posexplode + 64-group min/max;
    encode = one broadcast join — both linear, no shuffle beyond the
    dim-stats agg."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "v")
    stats = vals.groupBy("pos").agg(
        F.min("v").alias("lo"),
        ((F.max("v") - F.min("v")) / 255.0).alias("step"),
    )
    coded = vals.join(F.broadcast(stats), on="pos").select(
        "vec_id",
        "pos",
        "v",
        "lo",
        "step",
        F.when(
            F.col("step") > 0,
            F.floor((F.col("v") - F.col("lo")) / F.col("step") + 0.5).cast("double"),
        )
        .otherwise(0.0)
        .alias("code"),
    )
    errs = coded.select(
        "vec_id",
        "pos",
        F.when(
            F.col("step") > 0,
            F.abs(F.col("v") - (F.col("lo") + F.col("code") * F.col("step")))
            / F.col("step"),
        )
        .otherwise(0.0)
        .alias("es"),
    )
    return errs.agg(
        F.countDistinct("vec_id").cast("bigint").alias("n_vecs"),
        F.countDistinct("pos").cast("bigint").alias("n_dims"),
        r4(F.max("es")).alias("max_step_err"),
        F.when(F.max("es") <= 0.500001, 1).otherwise(0).cast("bigint").alias(
            "within_half_step"
        ),
    )


@register(
    "k_anonymity_audit",
    oracle="""
    WITH q AS (
      SELECT c_nationkey AS qi_nation, c_mktsegment AS qi_segment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS qi_balband,
             c_custkey
      FROM customer
    ),
    eq AS (
      SELECT qi_nation, qi_segment, qi_balband, count(*) AS class_size
      FROM q GROUP BY 1, 2, 3
    ),
    div AS (
      SELECT q.qi_nation, q.qi_segment, q.qi_balband,
             count(DISTINCT o.o_orderpriority) AS l_div
      FROM q LEFT JOIN orders o ON o.o_custkey = q.c_custkey
      GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(e.class_size) AS BIGINT) AS min_class_size,
           CAST(sum(CASE WHEN e.class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_below_k5,
           CAST(sum(CASE WHEN e.class_size < 5 THEN e.class_size ELSE 0 END)
                AS BIGINT) AS rows_at_risk,
           CAST(min(d.l_div) AS BIGINT) AS min_l_diversity,
           CAST(sum(CASE WHEN d.l_div < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_below_l2
    FROM eq e JOIN div d
      ON e.qi_nation = d.qi_nation AND e.qi_segment = d.qi_segment
     AND e.qi_balband = d.qi_balband
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy auditing for data release — k-anonymity + l-diversity over
    the quasi-identifier tuple (nation, market segment, account-balance
    band): equivalence-class sizes (classes below k=5 re-identify their
    members) and the diversity of a sensitive attribute (order priority)
    within each class (classes below l=2 leak it outright). The
    PII-scrub op (quality.py) removes direct identifiers; this is the
    companion audit for the indirect ones. Two groupBys + one key join
    — linear, all integers; at 100 TB the QI groupBy is the same
    shuffle as any cube cell count."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    q = c.select(
        F.col("c_nationkey").alias("qi_nation"),
        F.col("c_mktsegment").alias("qi_segment"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("qi_balband"),
        "c_custkey",
    )
    keys = ["qi_nation", "qi_segment", "qi_balband"]
    eq = q.groupBy(*keys).agg(F.count(F.lit(1)).alias("class_size"))
    div = (
        q.join(
            o.select("o_custkey", "o_orderpriority"),
            on=[F.col("c_custkey") == F.col("o_custkey")],
            how="left",
        )
        .groupBy(*keys)
        .agg(F.countDistinct("o_orderpriority").alias("l_div"))
    )
    joined = eq.join(div, on=keys)
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
        F.sum(F.when(F.col("class_size") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("classes_below_k5"),
        F.sum(F.when(F.col("class_size") < 5, F.col("class_size")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.min("l_div").cast("bigint").alias("min_l_diversity"),
        F.sum(F.when(F.col("l_div") < 2, 1).otherwise(0))
        .cast("bigint")
        .alias("classes_below_l2"),
    )


@register(
    "kaplan_meier_churn",
    oracle="""
    WITH span AS (
      SELECT user_id,
             min(ts) AS first_ts,
             arg_min(event_type, strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                     || '#' || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS cohort
      FROM events GROUP BY 1
    ),
    conv AS (
      SELECT user_id, min(ts) AS conv_ts FROM events
      WHERE event_type = 'purchase' AND value >= 95 GROUP BY 1
    ),
    horizon AS (SELECT max(ts) AS h FROM events),
    obs AS (
      SELECT s.cohort,
             CASE WHEN c.user_id IS NOT NULL
                  THEN CAST(date_diff('day', s.first_ts, c.conv_ts) AS BIGINT)
                  ELSE CAST(date_diff('day', s.first_ts, h) AS BIGINT) END AS t,
             CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END AS death
      FROM span s LEFT JOIN conv c USING (user_id) CROSS JOIN horizon
    ),
    tot AS (SELECT cohort, count(*) AS n FROM obs GROUP BY 1),
    dt AS (
      SELECT cohort, t,
             CAST(sum(death) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS ended
      FROM obs GROUP BY 1, 2
    ),
    risk AS (
      SELECT cohort, t, d,
             tot.n - coalesce(sum(ended) OVER (PARTITION BY cohort ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM dt JOIN tot USING (cohort)
    ),
    km AS (
      -- d = n_risk makes the factor 0 and every later S(t) exactly 0;
      -- guard the ln argument (DuckDB ln(0) ERRORS, Spark NULLs) and
      -- zero the output via the windowed min instead
      SELECT cohort, t, n_risk, d,
             CASE WHEN min(n_risk - d) OVER (PARTITION BY cohort ORDER BY t) = 0
                  THEN 0.0
                  ELSE exp(sum(ln(CASE WHEN n_risk > d
                                       THEN (n_risk - d) * 1.0 / n_risk
                                       ELSE 1.0 END))
                           OVER (PARTITION BY cohort ORDER BY t)) END AS s
      FROM risk WHERE d > 0
    )
    SELECT cohort, t AS t_days, CAST(n_risk AS BIGINT) AS n_risk, d AS d_events,
           round(s, 4) + 0.0 AS survival
    FROM km
    """,
)
def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival analysis — Kaplan-Meier time-to-conversion curves with
    right censoring: per cohort (the user's FIRST event type, ties
    broken on event_id), duration = days from first activity to the
    first high-value purchase (value >= 95); users who never convert
    are CENSORED at the observation horizon (they leave the risk set
    without counting as events — the estimator's whole point vs a naive
    duration histogram; ~17% of users at sf0.01). S(t) = Π (1 − d/n)
    over event times, computed as exp(Σ ln) in one window pass — no
    sequential fold; the at-risk counts are a right-aligned cumulative.
    All counts integer; the one float surface (the product) is
    engine-replayed and rounded."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    span = (
        ev.withColumn("cohort", F.first("event_type").over(w))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.first("cohort").alias("cohort"))
    )
    conv = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") >= 95))
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    h = ev.agg(F.max("ts").alias("h"))
    obs = (
        span.join(conv, on="user_id", how="left")
        .crossJoin(F.broadcast(h))
        .select(
            "cohort",
            F.when(
                F.col("conv_ts").isNotNull(),
                F.datediff(F.col("conv_ts"), F.col("first_ts")),
            )
            .otherwise(F.datediff(F.col("h"), F.col("first_ts")))
            .cast("bigint")
            .alias("t"),
            F.when(F.col("conv_ts").isNotNull(), 1).otherwise(0).alias("death"),
        )
    )
    tot = obs.groupBy("cohort").agg(F.count(F.lit(1)).alias("n"))
    dt = obs.groupBy("cohort", "t").agg(
        F.sum("death").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("ended"),
    )
    wprev = (
        Window.partitionBy("cohort").orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = dt.join(tot, on="cohort").select(
        "cohort", "t", "d",
        (F.col("n") - F.coalesce(F.sum("ended").over(wprev), F.lit(0))).alias("n_risk"),
    )
    wkm = Window.partitionBy("cohort").orderBy("t")
    # mirror the oracle's zero-factor guard: d = n_risk zeroes S(t) from
    # that event time on; ln only ever sees strictly positive factors
    safe = F.when(
        F.col("n_risk") > F.col("d"),
        (F.col("n_risk") - F.col("d")) * F.lit(1.0) / F.col("n_risk"),
    ).otherwise(F.lit(1.0))
    km = risk.filter(F.col("d") > 0).select(
        "cohort", "t", "n_risk", "d",
        F.when(F.min(F.col("n_risk") - F.col("d")).over(wkm) == 0, F.lit(0.0))
        .otherwise(F.exp(F.sum(F.log(safe)).over(wkm)))
        .alias("s"),
    )
    return km.select(
        "cohort",
        F.col("t").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").alias("d_events"),
        r4(F.col("s")).alias("survival"),
    )


def _luby_sql(rounds: int = 6) -> str:
    """DuckDB replay of graph/algorithms.py:luby_mis on the
    customer–supplier bipartite trade graph: identical padded-string
    priority keys per round, identical active-neighborhood min and
    deactivation steps, unrolled ``rounds`` times; per-round rows are
    emitted unconditionally (count 0 + hash-sum 0 for an empty round)
    so the shape never depends on convergence speed."""
    parts = [
        "WITH eb AS MATERIALIZED (SELECT DISTINCT"
        " 'C:' || CAST(o_custkey AS VARCHAR) AS c,"
        " 'S:' || CAST(l_suppkey AS VARCHAR) AS s"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
        "e AS MATERIALIZED (SELECT c AS src, s AS dst FROM eb"
        " UNION ALL SELECT s, c FROM eb)",
        "act0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM e)",
    ]
    for r in range(1, rounds + 1):
        key = (
            f"lpad(CAST(({_poly_sql(f'''id || '#{r}' ''')}) AS VARCHAR), 10, '0')"
            f" || '|' || id"
        )
        parts.append(f"pr{r} AS MATERIALIZED (SELECT id, {key} AS k FROM act{r - 1})")
        parts.append(
            f"nmin{r} AS MATERIALIZED (SELECT e.dst AS id, min(p.k) AS nmin"
            f" FROM e JOIN pr{r} p ON p.id = e.src GROUP BY 1)"
        )
        parts.append(
            f"join{r} AS MATERIALIZED (SELECT p.id FROM pr{r} p"
            f" LEFT JOIN nmin{r} n USING (id)"
            f" WHERE n.nmin IS NULL OR p.k < n.nmin)"
        )
        parts.append(
            f"act{r} AS MATERIALIZED (SELECT a.id FROM act{r - 1} a"
            f" WHERE NOT EXISTS (SELECT 1 FROM join{r} j WHERE j.id = a.id)"
            f" AND NOT EXISTS (SELECT 1 FROM e JOIN join{r} j ON j.id = e.src"
            f" WHERE e.dst = a.id))"
        )
    sels = [
        f"SELECT CAST({r} AS BIGINT) AS round,"
        f" CAST(count(*) AS BIGINT) AS n_joined,"
        f" CAST(coalesce(sum({_poly_sql('id')}), 0) AS BIGINT) AS id_hash_sum"
        f" FROM join{r}"
        for r in range(1, rounds + 1)
    ]
    sels.append(
        f"SELECT CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT),"
        f" CAST(coalesce(sum({_poly_sql('id')}), 0) AS BIGINT) FROM act{rounds}"
    )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sels)


@register("maximal_independent_set", oracle=_luby_sql(6))
def maximal_independent_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel symmetry breaking — Luby's maximal independent set with
    deterministic hash priorities (graph/algorithms.py:luby_mis) over
    the customer–supplier trade graph: per round, the joined count and
    a portable-hash membership fingerprint (exact set identity without
    emitting thousands of ids), plus the round -1 leftover row. MIS is
    the primitive under parallel greedy coloring / scheduling /
    correlation-clustering pivots; hash priorities keep the whp
    O(log n) round bound while making every run (and the oracle replay)
    bit-identical."""
    from graph_db_spark.graph.algorithms import luby_mis
    from graph_db_spark.operators.dedup import portable_hash

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    eb = (
        li.join(o, on=[F.col("l_orderkey") == F.col("o_orderkey")])
        .select(
            F.concat(F.lit("C:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("S:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    e = eb.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        eb.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    mis = luby_mis(e, rounds=6).localCheckpoint(eager=True)
    rows = []
    for r in list(range(1, 7)) + [-1]:
        sub = mis.filter(F.col("round") == r)
        rows.append(
            sub.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_joined"),
                F.coalesce(F.sum(portable_hash(F.col("id"))), F.lit(0))
                .cast("bigint")
                .alias("id_hash_sum"),
            ).select(
                F.lit(r).cast("bigint").alias("round"), "n_joined", "id_hash_sum"
            )
        )
    res = rows[0]
    for fr in rows[1:]:
        res = res.unionByName(fr)
    return res


@register(
    "sampled_triangle_estimate",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    eall AS MATERIALIZED (SELECT DISTINCT a.p AS p1, b.p AS p2
                          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
    e AS MATERIALIZED (
      SELECT p1, p2 FROM eall
      WHERE ({_poly_sql("CAST(p1 AS VARCHAR) || '-' || CAST(p2 AS VARCHAR)")}) % 10 < 3
    ),
    deg AS MATERIALIZED (SELECT p, count(*) AS d FROM
                         (SELECT p1 AS p FROM e UNION ALL SELECT p2 FROM e) GROUP BY p),
    ore AS MATERIALIZED (
      SELECT CASE WHEN (da.d, e.p1) < (db.d, e.p2) THEN e.p1 ELSE e.p2 END AS u,
             CASE WHEN (da.d, e.p1) < (db.d, e.p2) THEN e.p2 ELSE e.p1 END AS v
      FROM e JOIN deg da ON e.p1 = da.p JOIN deg db ON e.p2 = db.p
    ),
    rk AS MATERIALIZED (SELECT ore.u, ore.v, dv.d AS dv_ FROM ore JOIN deg dv ON ore.v = dv.p),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n
      FROM rk e1
      JOIN rk e2 ON e1.u = e2.u AND (e1.dv_, e1.v) < (e2.dv_, e2.v)
      JOIN ore e3 ON e3.u = e1.v AND e3.v = e2.v
    )
    SELECT n AS sampled_triangles,
           round(n / 0.027, 4) + 0.0 AS estimated_triangles
    FROM tri
    """,
)
def sampled_triangle_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION (Tsourakakis et al., KDD'09) sampled triangle counting:
    keep each co-occurrence edge iff portable_hash(edge) mod 10 < 3
    (p = 0.3, DETERMINISTIC — shard retries resample identically, and
    the oracle replays the exact same subgraph), count triangles on the
    sample with the same degree-ordered orientation as the exact query,
    scale by 1/p³. At 100 TB this cuts wedge-join work by ~p³ ≈ 36×
    (unbiased; variance bounds in the paper) — the exact
    ``cooccurrence_triangles`` stays as this query's ground-truth
    companion at verification scale."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    from graph_db_spark.operators.dedup import portable_hash

    a, b = op.alias("a"), op.alias("b")
    ekey = F.concat(
        F.col("p1").cast("string"), F.lit("-"), F.col("p2").cast("string")
    )
    e = (
        a.join(b, on=[F.col("a.o") == F.col("b.o"), F.col("a.p") < F.col("b.p")])
        .select(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .distinct()
        .filter(portable_hash(ekey) % 10 < 3)
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("p1").alias("p"))
        .unionAll(e.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = F.broadcast(deg.select(F.col("p").alias("p1"), F.col("d").alias("d1")))
    db = F.broadcast(deg.select(F.col("p").alias("p2"), F.col("d").alias("d2")))
    lower = F.struct("d1", "p1") < F.struct("d2", "p2")
    ore = (
        e.join(da, on="p1")
        .join(db, on="p2")
        .select(
            F.when(lower, F.col("p1")).otherwise(F.col("p2")).alias("u"),
            F.when(lower, F.col("p2")).otherwise(F.col("p1")).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    dv = F.broadcast(deg.select(F.col("p").alias("v"), F.col("d").alias("dv")))
    rk = ore.join(dv, on="v").select("u", "v", "dv")
    e1, e2 = rk.alias("e1"), rk.alias("e2")
    wedges = e1.join(
        e2,
        on=[
            F.col("e1.u") == F.col("e2.u"),
            F.struct(F.col("e1.dv"), F.col("e1.v")) < F.struct(F.col("e2.dv"), F.col("e2.v")),
        ],
    ).select(F.col("e1.v").alias("wu"), F.col("e2.v").alias("wv"))
    e3 = ore.select(F.col("u").alias("wu"), F.col("v").alias("wv"))
    tri = wedges.join(e3, on=["wu", "wv"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return tri.select(
        F.col("n").alias("sampled_triangles"),
        r4(F.col("n") / F.lit(0.027)).alias("estimated_triangles"),
    )


def _wordpiece_sql(max_len: int = 4, vocab_size: int = 200, topk: int = 30) -> str:
    """DuckDB replay of text.wordpiece_vocab_segment: substring explode
    with the same clamped windows, same (weight DESC, piece) vocab cut,
    and the greedy longest-match walk as a jump-table recursion — the
    CASE checks window lengths in the same descending order, so the
    clamped-window-overshoot behavior at word ends matches the Python
    slice semantics exactly. Integer-only end to end."""
    in_vocab = "IN (SELECT piece FROM vocab)"
    case_jump = " ".join(
        f"WHEN substr(word, pos, {L}) {in_vocab} THEN {L}"
        for L in range(max_len, 0, -1)
    )
    case_piece = " ".join(
        f"WHEN substr(word, pos, {L}) {in_vocab} THEN substr(word, pos, {L})"
        for L in range(max_len, 0, -1)
    )
    return f"""
    WITH RECURSIVE wf AS MATERIALIZED (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents
      ) WHERE length(word) > 0 GROUP BY 1
    ),
    cand AS MATERIALIZED (
      SELECT substr(word, s, L) AS piece, freq
      FROM (SELECT word, freq, unnest(range(1, length(word) + 1)) AS s FROM wf)
      CROSS JOIN (SELECT unnest(range(1, {max_len + 1})) AS L) ll
      WHERE s + L - 1 <= length(word)
    ),
    vocab AS MATERIALIZED (
      SELECT piece FROM (
        SELECT piece, sum(freq) AS weight FROM cand GROUP BY 1
      ) ORDER BY weight DESC, piece LIMIT {vocab_size}
    ),
    jt AS MATERIALIZED (
      SELECT word, pos,
             CASE {case_jump} ELSE 1 END AS jump,
             CASE {case_piece} ELSE '<unk>' END AS piece
      FROM (SELECT word, unnest(range(1, length(word) + 1)) AS pos FROM wf)
    ),
    rec(word, pos) AS (
      SELECT word, 1 FROM wf
      UNION ALL
      SELECT r.word, r.pos + j.jump
      FROM rec r JOIN jt j ON j.word = r.word AND j.pos = r.pos
      WHERE r.pos + j.jump <= length(r.word)
    ),
    seg AS (
      SELECT j.word, j.piece FROM rec r
      JOIN jt j ON j.word = r.word AND j.pos = r.pos
    )
    SELECT piece, CAST(sum(freq) AS BIGINT) AS usage
    FROM seg JOIN wf USING (word)
    GROUP BY 1 ORDER BY usage DESC, piece LIMIT {topk}
    """


@register("wordpiece_vocab_segment", oracle=_wordpiece_sql())
def wordpiece_vocab_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer induction, WordPiece flavor
    (operators/text.py:wordpiece_vocab_segment): induce a 200-piece
    subword vocab from substring statistics, segment every distinct word
    by greedy longest-match, report the top-30 pieces by
    corpus-weighted usage. Completes the tokenizer-training family (BPE
    merge rules, fertility, vocab coverage) with the inference-rule
    side; deterministic integer pipeline — the float-likelihood EM
    trainers (SentencePiece unigram) are out of scope by design (their
    argmax ties are not replayable cross-engine)."""
    from graph_db_spark.operators.text import wordpiece_vocab_segment as wps

    docs = load_table(spark, sf_dir, "documents")
    seg = wps(docs, "text", max_piece_len=4, vocab_size=200)
    return (
        seg.groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("usage"))
        .orderBy(F.desc("usage"), "piece")
        .limit(30)
    )


def _cms_join_size_sql(depth: int = 4, width: int = 256, seed: int = 41) -> str:
    """DuckDB replay of sketches.count_min_inner_product over the
    events.user_id ⋈ orders.o_custkey key overlap: same portable hash,
    same LCG bucket maps, exact integer arithmetic end to end."""
    from graph_db_spark.operators.dedup import _MINHASH_P as P
    from graph_db_spark.operators.dedup import minhash_params

    vals = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(minhash_params(depth, seed=seed))
    )
    return f"""
    WITH ca AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS c
                FROM events GROUP BY 1),
    cb AS (SELECT CAST(o_custkey AS VARCHAR) AS k, count(*) AS c
           FROM orders GROUP BY 1),
    exact AS (SELECT coalesce(sum(ca.c * cb.c), 0) AS v
              FROM ca JOIN cb USING (k)),
    ha AS (SELECT k, c, {_poly_sql('k')} AS hh FROM ca),
    ra AS (SELECT j, ((a * hh + b) % {P}) % {width} AS bucket, c
           FROM ha CROSS JOIN (VALUES {vals}) t(j, a, b)),
    cmsa AS (SELECT j, bucket, sum(c) AS cnt FROM ra GROUP BY 1, 2),
    hb AS (SELECT k, c, {_poly_sql('k')} AS hh FROM cb),
    rb AS (SELECT j, ((a * hh + b) % {P}) % {width} AS bucket, c
           FROM hb CROSS JOIN (VALUES {vals}) t(j, a, b)),
    cmsb AS (SELECT j, bucket, sum(c) AS cnt FROM rb GROUP BY 1, 2),
    prod AS (SELECT a.j, sum(a.cnt * b.cnt) AS p
             FROM cmsa a JOIN cmsb b USING (j, bucket) GROUP BY 1),
    spine AS (SELECT DISTINCT j FROM cmsa UNION SELECT DISTINCT j FROM cmsb),
    est AS (SELECT coalesce(min(coalesce(p, 0)), 0) AS v
            FROM spine LEFT JOIN prod USING (j))
    SELECT CAST(exact.v AS BIGINT) AS exact_join_size,
           CAST(est.v AS BIGINT) AS cms_estimate,
           CAST(CASE WHEN est.v >= exact.v THEN 1 ELSE 0 END AS BIGINT)
             AS estimate_ge_exact
    FROM exact, est
    """


@register("cms_join_cardinality", oracle=_cms_join_size_sql())
def cms_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQP for the optimizer: estimate |events ⋈ orders| on
    user_id = o_custkey from two Count-Min sketches ALONE via the CM
    inner product (sketches.py:count_min_inner_product) — min over rows
    of the bucket-wise count product; the one-sided (≥ exact) guarantee
    is emitted as a checked flag. At 100 TB this is how join strategies
    and shuffle sizing get picked without scanning either table: the
    depth×width sketches come from ingest, the probe is sketch-sized.
    Exact size = Σ_k cA(k)·cB(k) (pure integers; driver-hash-immune)."""
    from graph_db_spark.operators.sketches import (
        count_min_inner_product,
        count_min_table,
    )

    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    ca = ev.groupBy(F.col("user_id").cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cb = o.groupBy(F.col("o_custkey").cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    exact = (
        ca.join(cb.select(F.col("k"), F.col("c").alias("cb")), on="k")
        .agg(F.coalesce(F.sum(F.col("c") * F.col("cb")), F.lit(0)).alias("v"))
    )
    cms_a = count_min_table(ca, "k", "c")
    cms_b = count_min_table(cb, "k", "c")
    est = count_min_inner_product(cms_a, cms_b)
    return exact.crossJoin(est).select(
        F.col("v").cast("bigint").alias("exact_join_size"),
        F.col("est").cast("bigint").alias("cms_estimate"),
        F.when(F.col("est") >= F.col("v"), 1).otherwise(0).cast("bigint").alias(
            "estimate_ge_exact"
        ),
    )


@register(
    "ivm_join_view",
    oracle="""
    WITH o_final AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey <= 300 AND o_orderkey % 7 = 0
                  THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
      FROM orders
      WHERE o_orderkey <= 1200 AND o_orderkey % 97 <> 0
    ),
    c_final AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 500.0
                  ELSE c_acctbal END AS c_acctbal
      FROM customer
    )
    SELECT o.o_orderkey, o.o_custkey,
           round(o.o_totalprice, 4) + 0.0 AS o_totalprice,
           c.c_mktsegment, round(c.c_acctbal, 4) + 0.0 AS c_acctbal
    FROM o_final o JOIN c_final c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey % 7 = 0
    """,
)
def ivm_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table format — incremental maintenance of a JOIN view (the delta
    rules aggregates alone don't cover): a materialized
    orders ⋈ customer view is bootstrapped once and then NEVER
    recomputed — a fact merge (inserts + updates), a fact delete, and a
    dim update each fold their CDC feed through
    writers/snapshots.py:apply_fact_changes_to_join_view /
    apply_dim_changes_to_join_view. The oracle replays the same DML
    directly in SQL; the hash match proves the join-delta algebra
    (including dim-update fan-out patching) reconstructs the direct
    join exactly. Maintenance cost ∝ churn × fan-out; data volumes are
    SF-independent (commit-overhead-bound, like the aggregate IVM)."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import (
        SnapshotTable,
        apply_dim_changes_to_join_view,
        apply_fact_changes_to_join_view,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    tag = _sf_tag(sf_dir)
    po = os.path.join(tempfile.gettempdir(), f"graft_ivmj_o_{tag}")
    pc = os.path.join(tempfile.gettempdir(), f"graft_ivmj_c_{tag}")
    for p in (po, pc):
        shutil.rmtree(p, ignore_errors=True)
    t_o = SnapshotTable.create(
        spark, po, orders.filter(F.col("o_orderkey") <= 800), ["o_orderkey"], n_buckets=8
    )
    t_c = SnapshotTable.create(spark, pc, cust, ["c_custkey"], n_buckets=8)
    view = (
        t_o.read().join(t_c.read(), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment", "c_acctbal")
        .localCheckpoint()
    )
    # fact merge: new orders 800 < k <= 1200 plus doubled-price updates
    v0 = t_o.latest_version()
    t_o.merge(
        orders.filter((F.col("o_orderkey") > 800) & (F.col("o_orderkey") <= 1200))
        .unionByName(
            orders.filter(
                (F.col("o_orderkey") <= 300) & (F.col("o_orderkey") % 7 == 0)
            ).withColumn("o_totalprice", F.col("o_totalprice") * 2)
        )
    )
    view = apply_fact_changes_to_join_view(
        view, t_o.changes(v0, include_old=True), "o_orderkey",
        t_c.read().select("c_custkey", "c_mktsegment", "c_acctbal"), "c_custkey",
        fact_fk="o_custkey",
    ).localCheckpoint()
    # fact delete
    v1 = t_o.latest_version()
    t_o.delete(orders.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey"))
    view = apply_fact_changes_to_join_view(
        view, t_o.changes(v1, include_old=True), "o_orderkey",
        t_c.read().select("c_custkey", "c_mktsegment", "c_acctbal"), "c_custkey",
        fact_fk="o_custkey",
    ).localCheckpoint()
    # dim update: balance bump for custkey % 11
    v2 = t_c.latest_version()
    t_c.merge(
        cust.filter(F.col("c_custkey") % 11 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + 500.0
        )
    )
    view = apply_dim_changes_to_join_view(
        view, t_c.changes(v2, include_old=True), "c_custkey", fact_fk="o_custkey"
    ).localCheckpoint()
    return view.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_custkey",
        r4(F.col("o_totalprice")).alias("o_totalprice"),
        "c_mktsegment",
        r4(F.col("c_acctbal")).alias("c_acctbal"),
    )


def _holt_sql(alpha: float = 0.5, beta: float = 0.3, horizon: int = 3) -> str:
    """Recursive-CTE replay of drift.holt_fold over the per-type daily
    series (the CUSUM-oracle pattern): identical coefficient doubles
    (one-minus constants precomputed in Python, injected via repr),
    identical expression shapes, l1 named once in a subquery."""
    oma, omb = 1.0 - alpha, 1.0 - beta
    return f"""
    WITH RECURSIVE d AS MATERIALIZED (
      SELECT event_type AS key, strftime(ts, '%Y-%m-%d') AS day, sum(value) AS x
      FROM events GROUP BY 1, 2
    ),
    ordered AS MATERIALIZED (
      SELECT key, list(x ORDER BY day) AS xs, count(*) AS n FROM d GROUP BY 1
    ),
    rec(key, i, l, b) AS (
      SELECT key, 1, xs[1], 0.0::DOUBLE FROM ordered
      UNION ALL
      SELECT key, i, l1, {beta!r} * (l1 - l) + {omb!r} * b
      FROM (
        SELECT r.key, r.i + 1 AS i, r.l AS l, r.b AS b,
               {alpha!r} * o.xs[r.i + 1] + {oma!r} * (r.l + r.b) AS l1
        FROM rec r JOIN ordered o ON o.key = r.key AND r.i < o.n
      )
    )
    SELECT r.key AS event_type, CAST(o.n AS BIGINT) AS n_days,
           round(r.l, 4) + 0.0 AS level, round(r.b, 4) + 0.0 AS trend,
           round(r.l + {horizon} * r.b, 4) + 0.0 AS forecast
    FROM rec r JOIN ordered o ON o.key = r.key AND r.i = o.n
    """


@register("holt_trend_forecast", oracle=_holt_sql())
def holt_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting — Holt double-exponential smoothing (level + trend,
    alpha=0.5 beta=0.3) per event type over the daily value series, with
    a 3-day-ahead forecast (operators/drift.py:holt_linear). Completes
    the forecasting trio: closed-form regression (forecast_revenue),
    one-state EWMA (closed-form window), two-state Holt (the honest
    Arrow fold — a 2x2 matrix chain no window expresses). Oracle =
    recursive-CTE replay of the identical fold."""
    from graph_db_spark.operators.drift import holt_linear

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum("value").alias("x"))
    out = holt_linear(d, "event_type", "day", "x", alpha=0.5, beta=0.3, horizon=3)
    return out.select(
        F.col("key").alias("event_type"),
        F.col("n_obs").alias("n_days"),
        r4(F.col("level")).alias("level"),
        r4(F.col("trend")).alias("trend"),
        r4(F.col("forecast")).alias("forecast"),
    )


@register(
    "prefix_filter_jaccard",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    t AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(w) - 2, 0)),
                           i -> array_to_string(w[i+1:i+3], ' '))) AS toks
      FROM w
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
           CAST(len(a.toks) + len(b.toks)
                - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS uni
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE len(a.toks) > 0 AND len(b.toks) > 0
      AND len(list_intersect(a.toks, b.toks)) * 10
          >= (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) * 7
    """,
)
def prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.7 document pairs over word 3-gram shingle sets
    via PPJoin prefix + length + positional filtering
    (operators/dedup.py:prefix_filter_jaccard) — the third exact-dedup
    scale path beside MinHash-LSH (probabilistic) and posting-list +
    stop-gram guards (exact but hub-exposed): index only each doc's
    rarest m - ceil(t*m) + 1 shingles, provably complete for the
    threshold. Shingles (not unigrams) are the scale choice: measured at
    sf0.1, unigram prefixes generate ~132M candidate pairs on this
    small-vocab fixture vs ~500k for 3-grams. Oracle = the naive
    all-pairs verify, exact at checker scale; output is pure integers
    (inter, uni) so the hash has no float surface at all."""
    from graph_db_spark.operators.dedup import prefix_filter_jaccard as ppj

    docs = load_table(spark, sf_dir, "documents")
    out = ppj(docs, "text", "doc_id", num=7, den=10, shingle_n=3)
    return out.select(
        "doc_a", "doc_b",
        F.col("inter").cast("bigint").alias("inter"),
        F.col("uni").cast("bigint").alias("uni"),
    )


@register(
    "edit_distance_blocked_join",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    w AS (SELECT p_name, unnest(string_split(p_name, ' ')) AS w FROM names),
    cand AS (
      SELECT DISTINCT a.p_name AS na, b.p_name AS nb
      FROM w a JOIN w b ON a.w = b.w AND a.p_name < b.p_name
    )
    SELECT na AS name_a, nb AS name_b,
           CAST(levenshtein(na, nb) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(na, nb) <= 4
    """,
)
def edit_distance_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-similarity join for entity resolution: pairs of DISTINCT
    part names that share a word (the blocking key — standard ER
    practice, part of the join's declared semantics) AND sit within
    Levenshtein distance 4. The expensive O(len²) distance runs only on
    blocked candidates; both engines' levenshtein is the same integer
    DP, so the output is float-free. Dedup to distinct names first: the
    quadratic space is vocabulary-sized, never row-count-sized — the
    same collapse the tokenizer trainers use."""
    p = load_table(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    words = names.select("p_name", F.explode(F.split("p_name", " ")).alias("w"))
    a = words.select(F.col("p_name").alias("na"), "w")
    b = words.select(F.col("p_name").alias("nb"), "w")
    cand = (
        a.join(b, on="w")
        .filter(F.col("na") < F.col("nb"))
        .select("na", "nb")
        .distinct()
    )
    d = F.levenshtein(F.col("na"), F.col("nb"))
    return cand.filter(d <= 4).select(
        F.col("na").alias("name_a"),
        F.col("nb").alias("name_b"),
        d.cast("bigint").alias("dist"),
    )


def _label_noise_sql(n_centroids: int = 16, lloyd_iters: int = 3) -> str:
    parts = _ivf_training_sql(n_centroids, lloyd_iters, 64)
    # parts[0] already carries the WITH keyword (shared-helper contract)
    return (
        ",\n".join(parts)
        + """,
    lab AS (SELECT a.neighbor_id AS id, a.cluster, e.label
            FROM casg a JOIN embeddings e ON e.vec_id = a.neighbor_id),
    clc AS (SELECT cluster, label, count(*) AS cl_n FROM lab GROUP BY 1, 2),
    cls AS (SELECT cluster, count(*) AS c_n FROM lab GROUP BY 1)
    SELECT l.label, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN c_n > 1 AND (cl_n - 1) * 5 < (c_n - 1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           round(avg(CASE WHEN c_n > 1 THEN (cl_n - 1) * 1.0 / (c_n - 1)
                          ELSE 1.0 END), 4) + 0.0 AS avg_agreement
    FROM lab l JOIN clc USING (cluster, label) JOIN cls USING (cluster)
    GROUP BY 1
    """
    )


@register("label_noise_screen", oracle=_label_noise_sql())
def label_noise_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-error screening (Confident-Learning-lite): IVF-cluster the
    embeddings (the shared deterministic spherical k-means), then score
    each vector by its cluster's label agreement
    (same-label-neighbors / cluster-peers) — vectors whose agreement
    falls below 20% (an INTEGER cross-multiplied compare, no float
    boundary) are flagged as probable label noise. Per label: vector
    count, flagged count, mean agreement. The screening pass a
    training-data pipeline runs before trusting its classification
    labels; cluster-bounded, no pair join — the SemDeDup cost shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SIM.ivf_centroids(emb, "embedding", "vec_id", n_centroids=16, lloyd_iters=3)
    asg = SIM.ivf_assign(emb, cents).select("id", "cluster")
    lab = asg.join(
        emb.select(F.col("vec_id").alias("id"), "label"), on="id"
    )
    clc = lab.groupBy("cluster", "label").agg(F.count(F.lit(1)).alias("cl_n"))
    cls = lab.groupBy("cluster").agg(F.count(F.lit(1)).alias("c_n"))
    j = lab.join(clc, on=["cluster", "label"]).join(cls, on="cluster")
    flagged = F.when(
        (F.col("c_n") > 1) & ((F.col("cl_n") - 1) * 5 < (F.col("c_n") - 1)), 1
    ).otherwise(0)
    agree = F.when(
        F.col("c_n") > 1,
        (F.col("cl_n") - 1) * 1.0 / (F.col("c_n") - 1),
    ).otherwise(F.lit(1.0))
    return j.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(flagged).cast("bigint").alias("n_flagged"),
        r4(F.avg(agree)).alias("avg_agreement"),
    )


@register(
    "rolling_robust_anomaly",
    oracle="""
    WITH d AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, sum(value) AS x
      FROM events GROUP BY 1, 2
    ),
    fr AS (
      SELECT event_type, day, x,
             list_sort(list(x) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS vals
      FROM d
    ),
    med AS (
      SELECT event_type, day, x, vals,
             (vals[(len(vals) + 1) // 2] + vals[len(vals) // 2 + 1]) / 2.0 AS m
      FROM fr
    ),
    mad AS (
      SELECT event_type, day, x, m, devs,
             (devs[(len(devs) + 1) // 2] + devs[len(devs) // 2 + 1]) / 2.0 AS md
      FROM (SELECT *, list_sort(list_transform(vals, v -> abs(v - m))) AS devs
            FROM med)
    )
    SELECT event_type, day, round(x, 4) + 0.0 AS x,
           round(m, 4) + 0.0 AS rolling_median,
           round(md, 4) + 0.0 AS rolling_mad,
           round(CASE WHEN md > 0 THEN abs(x - m) / (1.4826 * md)
                      ELSE 0.0 END, 4) + 0.0 AS robust_z
    FROM mad
    """,
)
def rolling_robust_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust rolling anomaly scoring — the median/MAD twin of
    ``rolling_anomaly_flags``'s mean/stddev z-score (one outlier day
    poisons a 7-day mean AND its stddev; the breakdown point of the
    median/MAD pair is 50%). The 7-row frame is materialized as a
    sorted list per row (collect_list over the ROWS frame — frame size
    is a constant, so the per-row list is O(7), not a scale concern)
    and both medians come from order statistics with midpoint
    interpolation — pure Column expressions, identically replayed."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum("value").alias("x"))
    w = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    )
    fr = d.withColumn("vals", F.array_sort(F.collect_list("x").over(w)))
    n = F.size("vals")
    lo = F.element_at(F.col("vals"), F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(F.col("vals"), (F.floor(n / 2) + 1).cast("int"))
    med = fr.withColumn("m", (lo + hi) / 2.0)
    devs = F.array_sort(
        F.transform(F.col("vals"), lambda v: F.abs(v - F.col("m")))
    )
    md_frame = med.withColumn("devs", devs)
    nd = F.size("devs")
    dlo = F.element_at(F.col("devs"), F.floor((nd + 1) / 2).cast("int"))
    dhi = F.element_at(F.col("devs"), (F.floor(nd / 2) + 1).cast("int"))
    mad = md_frame.withColumn("md", (dlo + dhi) / 2.0)
    rz = F.when(
        F.col("md") > 0, F.abs(F.col("x") - F.col("m")) / (1.4826 * F.col("md"))
    ).otherwise(F.lit(0.0))
    return mad.select(
        "event_type", "day",
        r4(F.col("x")).alias("x"),
        r4(F.col("m")).alias("rolling_median"),
        r4(F.col("md")).alias("rolling_mad"),
        r4(rz).alias("robust_z"),
    )


@register(
    "median_order_statistic_ci",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk
      FROM events WHERE value IS NOT NULL
    ),
    stats AS (
      SELECT event_type, count(*) AS n,
             quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    cuts AS (
      SELECT event_type, n, med,
             CAST(floor((n - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT) AS lo_rk,
             n - CAST(floor((n - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT) + 1
               AS hi_rk
      FROM stats
    )
    SELECT c.event_type, CAST(c.n AS BIGINT) AS n,
           round(c.med, 4) + 0.0 AS median,
           round(lo.value, 4) + 0.0 AS ci_lo,
           round(hi.value, 4) + 0.0 AS ci_hi
    FROM cuts c
    JOIN ranked lo ON lo.event_type = c.event_type AND lo.rk = c.lo_rk
    JOIN ranked hi ON hi.event_type = c.event_type AND hi.rk = c.hi_rk
    """,
)
def median_order_statistic_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% CI for the MEDIAN via order statistics
    (binomial/sign-test bounds: ranks (n ± 1.96√n)/2) — the
    no-assumptions companion to bootstrap_ci_mean: no resampling, no
    normality, just two rank lookups after the per-group sort the
    exact-percentile already pays. The value at a rank is
    order-unambiguous even with ties (the sorted multiset is unique),
    so no tiebreak column is needed."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.select(
        "event_type", "value", F.row_number().over(w).alias("rk")
    ).localCheckpoint(eager=True)
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), PF.percentile(F.col("value"), 0.5).alias("med")
    )
    lo_rk = F.floor(
        (F.col("n") - 1.96 * F.sqrt(F.col("n").cast("double"))) / 2
    ).cast("bigint")
    cuts = stats.select(
        "event_type", "n", "med", lo_rk.alias("lo_rk"),
        (F.col("n") - lo_rk + 1).alias("hi_rk"),
    )
    lo = ranked.select(
        "event_type", F.col("rk").alias("lo_rk"), F.col("value").alias("lov")
    )
    hi = ranked.select(
        "event_type", F.col("rk").alias("hi_rk"), F.col("value").alias("hiv")
    )
    return (
        cuts.join(lo, on=["event_type", "lo_rk"])
        .join(hi, on=["event_type", "hi_rk"])
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            r4(F.col("med")).alias("median"),
            r4(F.col("lov")).alias("ci_lo"),
            r4(F.col("hiv")).alias("ci_hi"),
        )
    )


@register(
    "neyman_allocation",
    oracle="""
    WITH s AS (
      SELECT event_type, count(value) AS n_rows, stddev_samp(value) AS sd
      FROM events GROUP BY 1
    ),
    tot AS (SELECT sum(n_rows * sd) AS z FROM s)
    SELECT event_type, CAST(n_rows AS BIGINT) AS n_rows,
           round(sd, 4) + 0.0 AS sigma,
           round(1000.0 * n_rows * sd / tot.z, 4) + 0.0 AS neyman_n
    FROM s, tot
    """,
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey-sampling design: Neyman-optimal allocation of a 1000-row
    sample budget across strata (n_h ∝ N_h·σ_h) — the
    variance-minimizing refinement of the proportional
    ``stratified_sample``: high-variance strata earn more than their
    share. One moments pass per stratum + a scalar total; the
    allocation is what a 100 TB AQP layer feeds into the per-stratum
    hash-sample thresholds."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count("value").alias("n_rows"), F.stddev_samp("value").alias("sd")
    )
    tot = s.agg(F.sum(F.col("n_rows") * F.col("sd")).alias("z"))
    return s.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        r4(F.col("sd")).alias("sigma"),
        r4(F.lit(1000.0) * F.col("n_rows") * F.col("sd") / F.col("z")).alias(
            "neyman_n"
        ),
    )


@register(
    "gee_distinct_estimate",
    oracle=f"""
    WITH smp AS (
      SELECT event_type, user_id FROM events
      WHERE ({_poly_sql("CAST(event_id AS VARCHAR)")}) % 20 = 0
    ),
    counts AS (
      SELECT event_type, user_id, count(*) AS c FROM smp GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS d_s,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1
      FROM counts GROUP BY 1
    ),
    exact AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS d
      FROM events GROUP BY 1
    )
    SELECT s.event_type, e.d AS exact_distinct,
           round(sqrt(20.0) * s.f1 + (s.d_s - s.f1), 4) + 0.0 AS gee_estimate,
           round((sqrt(20.0) * s.f1 + (s.d_s - s.f1)) / e.d, 4) + 0.0 AS ratio
    FROM stats s JOIN exact e USING (event_type)
    """,
)
def gee_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQP from a SAMPLE (no full scan, unlike the HLL family which
    needs one pass): the GEE distinct-count estimator
    (Charikar-Chaudhuri-Motwani-Narasayya) D = sqrt(1/q)*f1 + (d_s −
    f1) over a deterministic 5% hash sample — f1 (sample singletons)
    carries the unseen mass, the sqrt is the worst-case-optimal
    multiplier. Emitted beside the exact count and the ratio so the
    estimator's bias on this distribution is visible. This is the
    optimizer's NDV probe when even one pass is too expensive — the
    sample is the only thing read."""
    from graph_db_spark.operators.dedup import portable_hash

    ev = load_table(spark, sf_dir, "events")
    smp = ev.filter(portable_hash(F.col("event_id").cast("string")) % 20 == 0)
    counts = smp.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("c"))
    stats = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d_s"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("d")
    )
    gee = F.sqrt(F.lit(20.0)) * F.col("f1") + (F.col("d_s") - F.col("f1"))
    return stats.join(exact, on="event_type").select(
        "event_type",
        F.col("d").alias("exact_distinct"),
        r4(gee).alias("gee_estimate"),
        r4(gee / F.col("d")).alias("ratio"),
    )


@register(
    "range_partition_balance",
    oracle=f"""
    WITH keys AS (SELECT o_totalprice AS k FROM orders),
    smp AS (
      SELECT o_totalprice AS k FROM orders
      WHERE ({_poly_sql("CAST(o_orderkey AS VARCHAR)")}) % 20 = 0
    ),
    n AS (SELECT count(*) AS c FROM smp),
    bounds AS (
      SELECT q, max(k) AS b FROM (
        SELECT k, CAST(floor((row_number() OVER (ORDER BY k) - 1) * 8
                             / (SELECT c FROM n)) AS BIGINT) AS q
        FROM smp
      ) GROUP BY 1 HAVING q < 7
    ),
    assigned AS (
      SELECT k, coalesce((SELECT count(*) FROM bounds WHERE b < k), 0) AS bucket
      FROM keys
    ),
    per AS (
      SELECT bucket, count(*) AS nr, min(k) AS lo, max(k) AS hi
      FROM assigned GROUP BY 1
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(nr AS BIGINT) AS n_rows,
           round(lo, 4) + 0.0 AS min_key, round(hi, 4) + 0.0 AS max_key,
           round(nr * 8.0 / (SELECT count(*) FROM keys), 4) + 0.0 AS balance
    FROM per
    """,
)
def range_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE global-sort scale primitive, made visible: a deterministic
    ~5% hash sample of the sort key (never rand() — retry-safe), 7
    sampled-quantile boundaries, range assignment of EVERY row by
    boundary counting, and the per-bucket balance ratio (n_rows x
    buckets / total; 1.0 = perfectly even). This is what
    RangePartitioner / total-order sorts do internally at 100 TB — the
    sample and boundary table are driver-sized, the assignment is one
    broadcast-compare per row, and the emitted balance quantifies skew
    BEFORE committing to the shuffle. Boundary semantics: bucket =
    count of boundaries strictly below the key."""
    from graph_db_spark.operators.dedup import portable_hash

    o = load_table(spark, sf_dir, "orders")
    keys = o.select(F.col("o_totalprice").alias("k"))
    smp = o.filter(
        portable_hash(F.col("o_orderkey").cast("string")) % 20 == 0
    ).select(F.col("o_totalprice").alias("k"))
    n = smp.count()  # driver-sized scalar probe (sample cardinality)
    w = Window.orderBy("k")
    bounds = (
        smp.withColumn(
            "q", F.floor((F.row_number().over(w) - 1) * 8 / F.lit(n)).cast("bigint")
        )
        .groupBy("q")
        .agg(F.max("k").alias("b"))
        .filter(F.col("q") < 7)
    )
    blist = sorted(r["b"] for r in bounds.collect())  # 7 boundaries — k-sized
    bucket = sum(F.when(F.col("k") > F.lit(b), 1).otherwise(0) for b in blist)
    per = keys.select(bucket.alias("bucket"), "k").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("nr"), F.min("k").alias("lo"), F.max("k").alias("hi")
    )
    total = keys.count()
    return per.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("nr").cast("bigint").alias("n_rows"),
        r4(F.col("lo")).alias("min_key"),
        r4(F.col("hi")).alias("max_key"),
        r4(F.col("nr") * 8.0 / F.lit(float(total))).alias("balance"),
    )


@register(
    "window_funnel_levels",
    oracle="""
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    l1 AS (SELECT DISTINCT user_id FROM v),
    l2 AS (
      SELECT DISTINCT v.user_id FROM v JOIN c ON c.user_id = v.user_id
      WHERE c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOURS
    ),
    l3 AS (
      SELECT DISTINCT v.user_id FROM v
      JOIN c ON c.user_id = v.user_id
        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOURS
      JOIN p ON p.user_id = v.user_id
        AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL 24 HOURS
    ),
    lev AS (
      SELECT l1.user_id,
             CASE WHEN l3.user_id IS NOT NULL THEN 3
                  WHEN l2.user_id IS NOT NULL THEN 2 ELSE 1 END AS level
      FROM l1
      LEFT JOIN l2 ON l2.user_id = l1.user_id
      LEFT JOIN l3 ON l3.user_id = l1.user_id
    )
    SELECT CAST(level AS BIGINT) AS level, CAST(count(*) AS BIGINT) AS n_users
    FROM lev GROUP BY 1
    """,
)
def window_funnel_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-windowFunnel semantics: per user, the deepest strictly
    time-ordered view → click → purchase chain that fits inside a 24h
    window anchored at the chain's FIRST event (funnel_conversion above
    is the unwindowed variant). Level joins restrict per user — fan-out
    is per-user event counts (bounded per key), never cross-user; the
    DISTINCT collapses the chain enumeration before counting. Integer
    output."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select("user_id", F.col("ts").alias("tv"))
    c = ev.filter(F.col("event_type") == "click").select("user_id", F.col("ts").alias("tc"))
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", F.col("ts").alias("tp"))
    win = F.expr("INTERVAL 24 HOURS")
    l1 = v.select("user_id").distinct()
    l2 = (
        v.join(c, on="user_id")
        .filter((F.col("tc") > F.col("tv")) & (F.col("tc") <= F.col("tv") + win))
        .select("user_id")
        .distinct()
        .withColumnRenamed("user_id", "u2")
    )
    l3 = (
        v.join(c, on="user_id")
        .filter((F.col("tc") > F.col("tv")) & (F.col("tc") <= F.col("tv") + win))
        .join(p, on="user_id")
        .filter((F.col("tp") > F.col("tc")) & (F.col("tp") <= F.col("tv") + win))
        .select("user_id")
        .distinct()
        .withColumnRenamed("user_id", "u3")
    )
    lev = (
        l1.join(l2, on=[F.col("user_id") == F.col("u2")], how="left")
        .join(l3, on=[F.col("user_id") == F.col("u3")], how="left")
        .select(
            F.when(F.col("u3").isNotNull(), 3)
            .when(F.col("u2").isNotNull(), 2)
            .otherwise(1)
            .alias("level")
        )
    )
    return lev.groupBy(F.col("level").cast("bigint").alias("level")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


@register(
    "moments_rollup_variance",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             count(value) AS n, sum(value) AS s, sum(value * value) AS s2
      FROM events GROUP BY 1, 2
    ),
    merged AS (
      SELECT event_type, sum(n) AS n, sum(s) AS s, sum(s2) AS s2
      FROM daily GROUP BY 1
    ),
    native AS (
      SELECT event_type, var_samp(value) AS v FROM events GROUP BY 1
    )
    SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
           round((m.s2 - m.s * m.s / m.n) / (m.n - 1), 4) + 0.0 AS var_rollup,
           CAST(CASE WHEN abs((m.s2 - m.s * m.s / m.n) / (m.n - 1) - nv.v)
                          < 1e-6 THEN 1 ELSE 0 END AS BIGINT) AS matches_native
    FROM merged m JOIN native nv ON nv.event_type = m.event_type
    """,
)
def moments_rollup_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-moments statistics: per-(type, day) partial moments
    (n, Σx, Σx²) roll up EXACTLY to the global sample variance — the
    sketch-style pattern (cms_day_merge, hll day sketches) applied to
    second moments, vs the naive average-of-daily-variances which is
    simply wrong. The matches_native flag cross-checks the rollup
    against the engine's own var_samp within 1e-6 — on BOTH engines, so
    the contract itself is hash-checked. At 100 TB day-level moment
    rows are what lands in the metrics store; any window rolls up
    without touching raw data."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("value").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    merged = daily.groupBy("event_type").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s"), F.sum("s2").alias("s2")
    )
    native = ev.groupBy("event_type").agg(F.var_samp("value").alias("v"))
    vr = (F.col("s2") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    return merged.join(native, on="event_type").select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        r4(vr).alias("var_rollup"),
        F.when(F.abs(vr - F.col("v")) < 1e-6, 1).otherwise(0).cast("bigint").alias(
            "matches_native"
        ),
    )


def _boruvka_sql(rounds: int = 4) -> str:
    """DuckDB replay of graph/algorithms.py:boruvka_forest on the
    order-count-weighted trade graph: per round the contraction join,
    the (w, src, dst)-ordered per-component argmin, the canonical edge
    dedup, and a recursive min-label closure over the chosen
    component pseudo-forest (string-lexicographic min — exactly the CC
    label rule). Per-round rows emit unconditionally; round -1 carries
    the final component count."""
    parts = [
        "eb AS MATERIALIZED (SELECT 'C:' || CAST(o_custkey AS VARCHAR) AS c,"
        " 'S:' || CAST(l_suppkey AS VARCHAR) AS s,"
        " CAST(count(DISTINCT l_orderkey) AS BIGINT) AS w"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2)",
        "e AS MATERIALIZED (SELECT c AS src, s AS dst, w FROM eb"
        " UNION ALL SELECT s, c, w FROM eb)",
        "l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS comp FROM e)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"ce{r} AS MATERIALIZED (SELECT e.src, e.dst, e.w,"
            f" la.comp AS ca, lb.comp AS cb"
            f" FROM e JOIN l{r - 1} la ON la.id = e.src"
            f" JOIN l{r - 1} lb ON lb.id = e.dst WHERE la.comp <> lb.comp)"
        )
        parts.append(
            f"ch{r} AS MATERIALIZED (SELECT ca, cb, src, dst, w FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY ca"
            f" ORDER BY w, src, dst) AS rn FROM ce{r}) WHERE rn = 1)"
        )
        parts.append(
            f"pick{r} AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,"
            f" greatest(src, dst) AS b, w FROM ch{r})"
        )
        parts.append(
            f"sym{r} AS MATERIALIZED (SELECT ca AS x, cb AS y FROM ch{r}"
            f" UNION SELECT cb, ca FROM ch{r})"
        )
        parts.append(
            f"rec{r}(c, rc) AS (SELECT x, x FROM sym{r}"
            f" UNION SELECT r.c, s.y FROM rec{r} r JOIN sym{r} s ON s.x = r.rc)"
        )
        parts.append(
            f"memb{r} AS MATERIALIZED (SELECT c, min(rc) AS newc"
            f" FROM rec{r} GROUP BY 1)"
        )
        parts.append(
            f"l{r} AS MATERIALIZED (SELECT l.id, coalesce(m.newc, l.comp) AS comp"
            f" FROM l{r - 1} l LEFT JOIN memb{r} m ON m.c = l.comp)"
        )
    sels = [
        f"SELECT CAST({r} AS BIGINT) AS round,"
        f" CAST(count(*) AS BIGINT) AS n_edges,"
        f" CAST(coalesce(sum(w), 0) AS BIGINT) AS total_w FROM pick{r}"
        for r in range(1, rounds + 1)
    ]
    sels.append(
        f"SELECT CAST(-1 AS BIGINT), CAST(count(DISTINCT comp) AS BIGINT),"
        f" CAST(0 AS BIGINT) FROM l{rounds}"
    )
    return "WITH RECURSIVE " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sels)


@register("boruvka_spanning_forest", oracle=_boruvka_sql(4))
def boruvka_spanning_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed minimum spanning forest — Borůvka rounds
    (graph/algorithms.py:boruvka_forest) over the trade graph weighted
    by distinct-order counts: per round, how many edges the forest
    gained and their weight; round -1 is the surviving component count
    (1 per connected component = fully contracted — each round at least
    halves components, dense graphs finish in 2-3). MST is the
    backbone/cost-rollout primitive the pointer-jumping CC family
    doesn't cover; determinism comes from the (w, src, dst) total edge
    order."""
    from graph_db_spark.graph.algorithms import boruvka_forest

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    eb = (
        li.join(o, on=[F.col("l_orderkey") == F.col("o_orderkey")])
        .groupBy(
            F.concat(F.lit("C:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("S:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .agg(F.countDistinct("l_orderkey").cast("long").alias("w"))
    )
    e = eb.select(F.col("c").alias("src"), F.col("s").alias("dst"), "w").unionByName(
        eb.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w")
    )
    rounds = 4
    forest, lab = boruvka_forest(e, rounds=rounds)
    frames = []
    for r in range(1, rounds + 1):
        sub = forest.filter(F.col("round") == r)
        frames.append(
            sub.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_edges"),
                F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("total_w"),
            ).select(F.lit(r).cast("bigint").alias("round"), "n_edges", "total_w")
        )
    frames.append(
        lab.agg(F.countDistinct("comp").cast("bigint").alias("n_edges")).select(
            F.lit(-1).cast("bigint").alias("round"),
            "n_edges",
            F.lit(0).cast("bigint").alias("total_w"),
        )
    )
    res = frames[0]
    for fr in frames[1:]:
        res = res.unionByName(fr)
    return res


def _bitemporal_spans_sql(alias: str, where: str) -> str:
    """One SCD2 span build (the scd2_user_state window chain) over
    ``events {where}``, as a CTE named ``alias`` with RAW timestamps."""
    return f"""{alias} AS MATERIALIZED (
      SELECT user_id, state, vf,
             lead(vf) OVER (PARTITION BY user_id ORDER BY seg_id) AS vt
      FROM (
        SELECT CAST(user_id AS BIGINT) AS user_id, event_type AS state,
               seg_id, min(ts) AS vf
        FROM (
          SELECT user_id, event_type, ts, event_id,
                 CAST(count(CASE WHEN prev IS NULL OR prev <> event_type
                                 THEN 1 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS BIGINT) AS seg_id
          FROM (SELECT user_id, event_type, ts, event_id,
                       lag(event_type)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                FROM events {where})
        ) GROUP BY 1, 2, 3
      ))"""


def _bitemporal_sql() -> str:
    probes = []
    for era, alias, pt in [
        (1, "s1", "2024-01-10"), (1, "s1", "2024-01-25"),
        (2, "s2", "2024-01-10"), (2, "s2", "2024-01-25"),
    ]:
        probes.append(
            f"SELECT CAST({era} AS BIGINT) AS era, '{pt}' AS probe_ts, state,"
            f" CAST(count(*) AS BIGINT) AS n_users"
            f" FROM {alias} WHERE vf <= TIMESTAMP '{pt}'"
            f" AND (vt IS NULL OR vt > TIMESTAMP '{pt}') GROUP BY 3"
        )
    return (
        "WITH "
        + _bitemporal_spans_sql("s1", "WHERE ts < TIMESTAMP '2024-01-16'")
        + ",\n"
        + _bitemporal_spans_sql("s2", "")
        + "\n"
        + "\nUNION ALL\n".join(probes)
    )


@register("bitemporal_point_in_time", oracle=_bitemporal_sql())
def bitemporal_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL queries — transaction time × valid time: an SCD2 state
    dimension lives in a snapshot table (transaction time = commit
    version; valid time = the spans). Era 1 commits the history known
    mid-month; era 2 merges the full rebuild (the SCD2 prefix property
    makes that a pure upsert). Each probe answers "what did we BELIEVE
    at era E about the state at time T" — note era 1 still 'believes'
    its open spans extend through 2024-01-25; era 2 has closed them.
    That divergence (same valid-time question, different answers by
    transaction time) is the bitemporal defining property, and the
    oracle replays both table states + all four probes exactly."""
    import os
    import shutil
    import tempfile

    from graph_db_spark.writers.snapshots import SnapshotTable

    ev = load_table(spark, sf_dir, "events")

    def spans(src: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        prev = F.lag("event_type").over(w)
        marker = F.when(prev.isNull() | (prev != F.col("event_type")), 1)
        seg = src.select(
            "user_id", "event_type", "ts",
            F.count(marker).over(w).cast("bigint").alias("seg_id"),
        )
        sp = seg.groupBy("user_id", "event_type", "seg_id").agg(
            F.min("ts").alias("vf")
        )
        w2 = Window.partitionBy("user_id").orderBy("seg_id")
        return sp.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("event_type").alias("state"),
            "seg_id",
            "vf",
            F.lead("vf").over(w2).alias("vt"),
        )

    cutoff = F.lit("2024-01-16").cast("timestamp")
    path = os.path.join(tempfile.gettempdir(), f"graft_bitemp_{_sf_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable.create(
        spark, path, spans(ev.filter(F.col("ts") < cutoff)),
        ["user_id", "seg_id"], n_buckets=8,
    )
    v1 = t.latest_version()
    t.merge(spans(ev))
    v2 = t.latest_version()
    frames = []
    for era, v, pt in [(1, v1, "2024-01-10"), (1, v1, "2024-01-25"),
                       (2, v2, "2024-01-10"), (2, v2, "2024-01-25")]:
        tl = F.lit(pt).cast("timestamp")
        active = t.read(version=v).filter(
            (F.col("vf") <= tl) & (F.col("vt").isNull() | (F.col("vt") > tl))
        )
        frames.append(
            active.groupBy("state")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            .select(
                F.lit(era).cast("bigint").alias("era"),
                F.lit(pt).alias("probe_ts"),
                "state",
                "n_users",
            )
        )
    res = frames[0]
    for fr in frames[1:]:
        res = res.unionByName(fr)
    return res


def _coreness_sql(rounds: int = 8) -> str:
    """DuckDB replay of graph/algorithms.py:core_decomposition: degree
    init, ``rounds`` unrolled h-index contractions (rank-desc window +
    max(least(rank, est))), the round -1 changed-count row proving the
    fixpoint landed inside the truncation."""
    parts = [
        "WITH eb AS MATERIALIZED (SELECT DISTINCT"
        " 'C:' || CAST(o_custkey AS VARCHAR) AS c,"
        " 'S:' || CAST(l_suppkey AS VARCHAR) AS s"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
        "e AS MATERIALIZED (SELECT c AS src, s AS dst FROM eb"
        " UNION ALL SELECT s, c FROM eb)",
        "cor0 AS MATERIALIZED (SELECT dst AS id, count(*) AS cor,"
        " FALSE AS chg FROM e GROUP BY 1)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"h{r} AS MATERIALIZED (SELECT id, max(least(rk, ncor)) AS h FROM ("
            f"SELECT e.dst AS id, c.cor AS ncor,"
            f" row_number() OVER (PARTITION BY e.dst ORDER BY c.cor DESC) AS rk"
            f" FROM cor{r - 1} c JOIN e ON e.src = c.id) GROUP BY 1)"
        )
        parts.append(
            f"cor{r} AS MATERIALIZED (SELECT c.id, least(c.cor, h.h) AS cor,"
            f" least(c.cor, h.h) <> c.cor AS chg"
            f" FROM cor{r - 1} c JOIN h{r} h USING (id))"
        )
    return (
        ",\n".join(parts)
        + f"""
    SELECT CAST(cor AS BIGINT) AS coreness, CAST(count(*) AS BIGINT) AS n_nodes
    FROM cor{rounds} GROUP BY 1
    UNION ALL
    SELECT CAST(-1 AS BIGINT),
           CAST(sum(CASE WHEN chg THEN 1 ELSE 0 END) AS BIGINT)
    FROM cor{rounds}"""
    )


@register("core_decomposition_histogram", oracle=_coreness_sql(8))
def core_decomposition_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL core decomposition — every vertex's coreness in one run
    (graph/algorithms.py:core_decomposition, h-index propagation), vs
    the fixed-k peel of ``k_core_4``: the coreness histogram of the
    trade graph plus the round -1 changed-count row, which the oracle
    pins to 0 — machine-checked proof the truncated propagation REACHED
    the fixpoint, not an assumed convergence."""
    from graph_db_spark.graph.algorithms import core_decomposition

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    eb = (
        li.join(o, on=[F.col("l_orderkey") == F.col("o_orderkey")])
        .select(
            F.concat(F.lit("C:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("S:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    e = eb.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        eb.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    cd = core_decomposition(e, rounds=8).localCheckpoint(eager=True)
    hist = cd.groupBy(F.col("coreness").cast("bigint").alias("coreness")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    moved = cd.agg(
        F.sum(F.when(F.col("changed"), 1).otherwise(0)).cast("bigint").alias("n_nodes")
    ).select(F.lit(-1).cast("bigint").alias("coreness"), "n_nodes")
    return hist.unionByName(moved)


def _hyperanf_sql(p: int = 4, rounds: int = 3) -> str:
    """DuckDB replay of the HyperANF register propagation: same 62-bit
    portable hash → (idx, rho) initial registers, same per-round
    (edge-join + max-merge), same per-node HLL estimator (identical
    alpha literal via repr), rounded per node BEFORE the global sum so
    fold-order ulps can't reach the emitted value."""
    m = 1 << p
    alpha_m2 = (0.7213 / (1 + 1.079 / m)) * m * m
    rho_max = 63 - p
    parts = [
        "WITH eb AS MATERIALIZED (SELECT DISTINCT"
        " 'C:' || CAST(o_custkey AS VARCHAR) AS c,"
        " 'S:' || CAST(l_suppkey AS VARCHAR) AS s"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
        "e AS MATERIALIZED (SELECT c AS src, s AS dst FROM eb"
        " UNION ALL SELECT s, c FROM eb)",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM e)",
        f"h AS MATERIALIZED (SELECT id,"
        f" ({_poly_sql('id')} * 2147483648 + {_poly_sql('id', 131)}) AS h64"
        f" FROM nodes)",
        f"reg0 AS MATERIALIZED (SELECT id, h64 & {m - 1} AS idx,"
        f" CASE WHEN (h64 >> {p}) = 0 THEN {rho_max}"
        f" ELSE {rho_max} - length(bin(h64 >> {p})) END AS r FROM h)",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"reg{t} AS MATERIALIZED (SELECT id, idx, max(r) AS r FROM ("
            f"SELECT id, idx, r FROM reg{t - 1}"
            f" UNION ALL"
            f" SELECT e.dst AS id, g.idx, g.r FROM reg{t - 1} g"
            f" JOIN e ON e.src = g.id) GROUP BY 1, 2)"
        )
    est = (
        f"CASE WHEN {alpha_m2!r} / (({m} - c) + s) <= {2.5 * m!r} AND c < {m}"
        f" THEN {float(m)!r} * ln({float(m)!r} / ({m} - c))"
        f" ELSE {alpha_m2!r} / (({m} - c) + s) END"
    )
    sels = []
    for t in range(rounds + 1):
        sels.append(
            f"SELECT CAST({t} AS BIGINT) AS t,"
            f" round(sum(round({est}, 4)), 4) + 0.0 AS neighborhood_fn FROM ("
            f"SELECT id, count(*) AS c, sum(power(0.5, r)) AS s"
            f" FROM reg{t} GROUP BY 1)"
        )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sels)


@register("hyperanf_neighborhood", oracle=_hyperanf_sql(4, 3))
def hyperanf_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperANF (Boldi-Rosa-Vigna, WWW'11): the graph's neighborhood
    function N(t) = Σ_v |ball(v, t)| estimated by propagating per-node
    HLL registers along edges — each round is ONE edge join + ONE
    (node, idx) max-merge, so the whole distance distribution (and the
    effective diameter read off it) costs rounds × O(E·m) narrow rows
    instead of all-pairs BFS: THE way ball sizes are measured on
    100 TB graphs. Registers here are sketch ROWS (the portable-HLL
    form, sketches.py:portable_hll_registers) so DuckDB replays them
    exactly; m=16 keeps the fixture fan-out small (rsd ~26% — accuracy
    is the paper's concern, the oracle checks the COMPUTATION)."""
    from graph_db_spark.graph.algorithms import prepartition_for_rounds
    from graph_db_spark.operators.dedup import portable_hash

    p, rounds = 4, 3
    m = 1 << p
    alpha_m2 = (0.7213 / (1 + 1.079 / m)) * m * m
    rho_max = 63 - p
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    eb = (
        li.join(o, on=[F.col("l_orderkey") == F.col("o_orderkey")])
        .select(
            F.concat(F.lit("C:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("S:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    e = prepartition_for_rounds(
        eb.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
            eb.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        ),
        spark.sparkContext.defaultParallelism,
        "src",
    )
    nodes = e.select(F.col("src").alias("id")).distinct()
    h64 = portable_hash(F.col("id"), 31) * F.lit(2**31).cast("long") + portable_hash(
        F.col("id"), 131
    )
    w = F.shiftright(h64, p)
    rho = F.when(w == 0, F.lit(rho_max)).otherwise(F.lit(rho_max) - F.length(F.bin(w)))
    regs = nodes.select(
        "id", h64.bitwiseAND(F.lit(m - 1)).alias("idx"), rho.alias("r")
    ).localCheckpoint(eager=True)
    per_round = [regs]
    for _ in range(rounds):
        prev = per_round[-1]
        grown = (
            prev.join(e, prev["id"] == e["src"])
            .select(F.col("dst").alias("id"), "idx", "r")
            .unionByName(prev.select("id", "idx", "r"))
            .groupBy("id", "idx")
            .agg(F.max("r").alias("r"))
            .localCheckpoint(eager=True)
        )
        per_round.append(grown)
    zeros_c = F.lit(m) - F.col("c")
    raw = F.lit(alpha_m2) / (zeros_c + F.col("s"))
    est = F.when(
        (raw <= 2.5 * m) & (F.col("c") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros_c),
    ).otherwise(raw)
    out = []
    for t, rg in enumerate(per_round):
        per_node = rg.groupBy("id").agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.pow(F.lit(0.5), F.col("r"))).alias("s"),
        )
        out.append(
            per_node.agg(
                r4(F.sum(F.round(est, 4))).alias("neighborhood_fn")
            ).select(F.lit(t).cast("bigint").alias("t"), "neighborhood_fn")
        )
    res = out[0]
    for fr in out[1:]:
        res = res.unionByName(fr)
    return res


def _distoracle_sql(depth: int = 8) -> str:
    """DuckDB replay of the landmark distance oracle: multi-source BFS
    (both the 5 landmarks and the 8 sample endpoints as sources)
    unrolled ``depth`` levels — the same settle-once frontier the Spark
    shortest_paths loop runs, truncated identically — then the
    triangle-inequality sandwich per sample pair."""
    parts = [
        "WITH eb AS MATERIALIZED (SELECT DISTINCT"
        " 'C:' || CAST(o_custkey AS VARCHAR) AS c,"
        " 'S:' || CAST(l_suppkey AS VARCHAR) AS s"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
        "e AS MATERIALIZED (SELECT c AS src, s AS dst FROM eb"
        " UNION ALL SELECT s, c FROM eb)",
        "lmk AS MATERIALIZED (SELECT 'C:' || CAST(c_custkey AS VARCHAR) AS id"
        " FROM customer WHERE c_custkey IN (20, 40)"
        " UNION ALL SELECT 'S:' || CAST(s_suppkey AS VARCHAR)"
        " FROM supplier WHERE s_suppkey IN (1, 5, 9))",
        "smp AS MATERIALIZED (SELECT DISTINCT 'C:' || CAST(o_custkey AS VARCHAR) AS id"
        " FROM orders WHERE o_custkey <= 8)",
        "d0 AS MATERIALIZED (SELECT id AS landmark, id, 0 AS dist FROM lmk"
        " UNION SELECT id, id, 0 FROM smp)",
    ]
    for t in range(1, depth + 1):
        parts.append(
            f"g{t} AS MATERIALIZED (SELECT c.landmark, c.id, {t} AS dist FROM ("
            f"SELECT DISTINCT d.landmark, e.dst AS id"
            f" FROM d{t - 1} d JOIN e ON e.src = d.id WHERE d.dist = {t - 1}) c"
            f" WHERE NOT EXISTS (SELECT 1 FROM d{t - 1} s"
            f" WHERE s.landmark = c.landmark AND s.id = c.id))"
        )
        parts.append(
            f"d{t} AS MATERIALIZED (SELECT * FROM d{t - 1}"
            f" UNION ALL SELECT * FROM g{t})"
        )
    parts.append(
        f"""pairs AS (
      SELECT a.id AS u, b.id AS v FROM smp a JOIN smp b ON a.id < b.id
    ),
    bounds AS (
      SELECT p.u, p.v,
             min(du.dist + dv.dist) AS ub,
             max(abs(du.dist - dv.dist)) AS lb
      FROM pairs p
      JOIN d{depth} du ON du.id = p.u JOIN lmk ON du.landmark = lmk.id
      JOIN d{depth} dv ON dv.id = p.v AND dv.landmark = du.landmark
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT d.landmark AS u, d.id AS v, d.dist FROM d{depth} d
      JOIN smp s1 ON d.landmark = s1.id JOIN smp s2 ON d.id = s2.id
    )
    SELECT b.u, b.v, CAST(x.dist AS BIGINT) AS exact_dist,
           CAST(b.lb AS BIGINT) AS lower_bound, CAST(b.ub AS BIGINT) AS upper_bound,
           CAST(CASE WHEN b.lb <= x.dist AND x.dist <= b.ub THEN 1 ELSE 0 END
                AS BIGINT) AS sandwich_ok
    FROM bounds b JOIN exact x ON x.u = b.u AND x.v = b.v"""
    )
    return ",\n".join(parts)


@register("landmark_distance_oracle", oracle=_distoracle_sql(8))
def landmark_distance_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance oracle (Bourgain-style landmark embedding): precompute
    BFS distances from 5 landmarks, then answer ANY pairwise distance
    query with the triangle-inequality sandwich
    max_l |d(l,u)−d(l,v)| <= d(u,v) <= min_l d(l,u)+d(l,v) — O(k) per
    query instead of a BFS, THE practical point-to-point distance
    answerer on a 100 TB graph (the landmark table is the only state).
    The sample endpoints double as BFS sources so the exact distance is
    available for the sandwich check — emitted per pair as a flag.
    Shares graph/algorithms.py:shortest_paths (one multi-source frontier
    run, both landmark sets together)."""
    from graph_db_spark.graph.algorithms import shortest_paths

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    eb = (
        li.join(o, on=[F.col("l_orderkey") == F.col("o_orderkey")])
        .select(
            F.concat(F.lit("C:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("S:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    e = eb.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        eb.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    lmk = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey").isin(20, 40)
    ).select(
        F.concat(F.lit("C:"), F.col("c_custkey").cast("string")).alias("id")
    ).unionByName(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey").isin(1, 5, 9))
        .select(F.concat(F.lit("S:"), F.col("s_suppkey").cast("string")).alias("id"))
    )
    smp = (
        o.filter(F.col("o_custkey") <= 8)
        .select(F.concat(F.lit("C:"), F.col("o_custkey").cast("string")).alias("id"))
        .distinct()
    )
    dist = shortest_paths(
        e, lmk.unionByName(smp), max_iter=8
    ).localCheckpoint(eager=True)
    pairs = (
        smp.select(F.col("id").alias("u"))
        .join(smp.select(F.col("id").alias("v")), on=[F.col("u") < F.col("v")])
    )
    du = dist.join(lmk.select(F.col("id").alias("landmark")), on="landmark").select(
        F.col("landmark"), F.col("id").alias("u"), F.col("dist").alias("dl_u")
    )
    dv = dist.select(
        F.col("landmark"), F.col("id").alias("v"), F.col("dist").alias("dl_v")
    )
    bounds = (
        pairs.join(du, on="u")
        .join(dv, on=["landmark", "v"])
        .groupBy("u", "v")
        .agg(
            F.min(F.col("dl_u") + F.col("dl_v")).alias("ub"),
            F.max(F.abs(F.col("dl_u") - F.col("dl_v"))).alias("lb"),
        )
    )
    exact = dist.join(
        smp.select(F.col("id").alias("landmark")), on="landmark"
    ).select(
        F.col("landmark").alias("u"), F.col("id").alias("v"), F.col("dist").alias("x")
    )
    return (
        bounds.join(exact, on=["u", "v"])
        .select(
            "u", "v",
            F.col("x").cast("bigint").alias("exact_dist"),
            F.col("lb").cast("bigint").alias("lower_bound"),
            F.col("ub").cast("bigint").alias("upper_bound"),
            F.when((F.col("lb") <= F.col("x")) & (F.col("x") <= F.col("ub")), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("sandwich_ok"),
        )
    )


def _brandes_sql(depth: int = 4) -> str:
    """DuckDB replay of graph/algorithms.py:brandes_betweenness on the
    customer–supplier bipartite trade graph, sources C:{1,7,13}: forward
    sigma CTEs (settle-once anti via NOT EXISTS), backward dependency
    CTEs, identical join shapes. Floats: every sigma is an
    integer-valued double (exact); delta sums differ only in fold order
    — the final round(.,4) absorbs the ulps (the PageRank-oracle
    precedent)."""
    parts = [
        "WITH eb AS MATERIALIZED (SELECT DISTINCT"
        " 'C:' || CAST(o_custkey AS VARCHAR) AS c,"
        " 'S:' || CAST(l_suppkey AS VARCHAR) AS s"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
        "e AS MATERIALIZED (SELECT c AS src, s AS dst FROM eb"
        " UNION ALL SELECT s, c FROM eb)",
        "lev0 AS MATERIALIZED (SELECT"
        " 'C:' || CAST(c_custkey AS VARCHAR) AS source,"
        " 'C:' || CAST(c_custkey AS VARCHAR) AS id, 1.0 AS sigma"
        " FROM customer WHERE c_custkey IN (1, 7, 13))",
        "set0 AS MATERIALIZED (SELECT source, id FROM lev0)",
    ]
    for t in range(1, depth + 1):
        parts.append(
            f"lev{t} AS MATERIALIZED (SELECT c.source, c.id, c.sigma FROM ("
            f"SELECT l.source, e.dst AS id, sum(l.sigma) AS sigma"
            f" FROM lev{t - 1} l JOIN e ON e.src = l.id GROUP BY 1, 2) c"
            f" WHERE NOT EXISTS (SELECT 1 FROM set{t - 1} s"
            f" WHERE s.source = c.source AND s.id = c.id))"
        )
        parts.append(
            f"set{t} AS MATERIALIZED (SELECT * FROM set{t - 1}"
            f" UNION ALL SELECT source, id FROM lev{t})"
        )
    parts.append(
        f"d{depth} AS MATERIALIZED (SELECT source, id, sigma, 0.0 AS delta"
        f" FROM lev{depth})"
    )
    for t in range(depth - 1, 0, -1):
        parts.append(
            f"d{t} AS MATERIALIZED (SELECT l.source, l.id, l.sigma,"
            f" coalesce(s.dsum, 0.0) AS delta FROM lev{t} l LEFT JOIN ("
            f"SELECT l2.source, l2.id,"
            f" sum(l2.sigma / n.sigma * (1 + n.delta)) AS dsum"
            f" FROM lev{t} l2 JOIN e ON e.src = l2.id"
            f" JOIN d{t + 1} n ON n.source = l2.source AND n.id = e.dst"
            f" GROUP BY 1, 2) s ON s.source = l.source AND s.id = l.id)"
        )
    unions = " UNION ALL ".join(
        f"SELECT source, id, delta FROM d{t}" for t in range(1, depth + 1)
    )
    return (
        ",\n".join(parts)
        + f""",
    alld AS ({unions}),
    bc AS (SELECT id, sum(delta) AS bc FROM alld GROUP BY 1)
    SELECT id, round(bc, 4) + 0.0 AS bc FROM bc
    ORDER BY round(bc, 4) + 0.0 DESC, id LIMIT 20"""
    )


@register("betweenness_landmarks", oracle=_brandes_sql(4))
def betweenness_landmarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate betweenness centrality: exact Brandes dependency
    accumulation from a 3-landmark source sample
    (graph/algorithms.py:brandes_betweenness) over the customer–supplier
    bipartite trade graph — the sampling estimator that makes
    betweenness feasible at 100 TB (per-source cost is two
    level-synchronous join passes; the sample size, not |V|, sets the
    multiplier). Top-20 brokers by sampled centrality; ordering on the
    ROUNDED score (ties → id) so cross-engine ulps cannot flip ranks."""
    from graph_db_spark.graph.algorithms import brandes_betweenness

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    eb = (
        li.join(o, on=[F.col("l_orderkey") == F.col("o_orderkey")])
        .select(
            F.concat(F.lit("C:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("S:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    e = eb.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        eb.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    sources = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey").isin(1, 7, 13)
    ).select(F.concat(F.lit("C:"), F.col("c_custkey").cast("string")).alias("id"))
    bc = brandes_betweenness(e, sources, depth=4)
    scored = bc.select("id", r4(F.col("bc")).alias("bc"))
    return scored.orderBy(F.desc("bc"), "id").limit(20)


def _walks_sql(length: int = 4) -> str:
    """DuckDB replay of graph/algorithms.py:deterministic_walks on the
    customer–supplier bipartite trade graph: same dst-sorted edge ranks,
    same portable md5-window hash (_poly_sql) choosing
    rank = 1 + hash(start || '#t') % degree at every step."""
    parts = [
        "WITH eb AS MATERIALIZED (SELECT DISTINCT"
        " 'C:' || CAST(o_custkey AS VARCHAR) AS c,"
        " 'S:' || CAST(l_suppkey AS VARCHAR) AS s"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey)",
        "e AS MATERIALIZED (SELECT c AS src, s AS dst FROM eb"
        " UNION ALL SELECT s, c FROM eb)",
        "ranked AS MATERIALIZED (SELECT src, dst,"
        " CAST(row_number() OVER (PARTITION BY src ORDER BY dst) AS BIGINT) AS rnk,"
        " CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS deg FROM e)",
        "w0 AS (SELECT DISTINCT 'C:' || CAST(o_custkey AS VARCHAR) AS start"
        " FROM orders WHERE o_custkey < 50)",
        "s0 AS (SELECT start, start AS cur, start AS path FROM w0)",
    ]
    for t in range(1, length + 1):
        h = _poly_sql(f"w.start || '#{t}'")
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT w.start, r.dst AS cur,"
            f" w.path || '>' || r.dst AS path"
            f" FROM s{t - 1} w JOIN ranked r ON r.src = w.cur"
            f" AND r.rnk = 1 + ({h}) % r.deg)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT start, path, cur AS end_node FROM s{length}"
    )


@register("random_walk_sampling", oracle=_walks_sql(4))
def random_walk_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-embedding preprocessing: deterministic node2vec-style walks
    (graph/algorithms.py:deterministic_walks) over the customer–supplier
    bipartite trade graph — 4 steps from every customer with custkey <
    50, neighbor choice = portable-hash pseudo-randomness so the walk
    corpus is reproducible across engines, retries, and shards (the
    reference's Cypher traversals are the same family of typed-edge
    hops; SURVEY §2 motif/Kleene notes). One equi-join per step,
    degree-resolved BEFORE the edge join so hubs never fan out."""
    from graph_db_spark.graph.algorithms import deterministic_walks

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    eb = (
        li.join(o, on=[F.col("l_orderkey") == F.col("o_orderkey")])
        .select(
            F.concat(F.lit("C:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("S:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    e = eb.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        eb.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    starts = (
        o.filter(F.col("o_custkey") < 50)
        .select(F.concat(F.lit("C:"), F.col("o_custkey").cast("string")).alias("start"))
        .distinct()
    )
    return deterministic_walks(e, starts, length=4)


@register(
    "hierarchy_subtree_rollup",
    oracle="""
    WITH RECURSIVE anc AS (
      SELECT c_custkey AS node, c_custkey // 10 AS anc, 1 AS steps
      FROM customer WHERE c_custkey >= 10
      UNION ALL
      SELECT node, anc // 10, steps + 1 FROM anc WHERE anc >= 10
    ),
    contrib AS (
      SELECT c_custkey AS anc, c_acctbal AS v FROM customer
      UNION ALL
      SELECT a.anc, c.c_acctbal FROM anc a JOIN customer c ON a.node = c.c_custkey
    ),
    depth AS (SELECT node, max(steps) AS d FROM anc GROUP BY 1),
    agg AS (SELECT anc AS node, CAST(count(*) AS BIGINT) AS subtree_n,
                   sum(v) AS s
            FROM contrib GROUP BY 1)
    SELECT agg.node, CAST(coalesce(depth.d, 0) AS BIGINT) AS depth,
           subtree_n, round(s, 4) + 0.0 AS subtree_sum
    FROM agg LEFT JOIN depth USING (node)
    WHERE agg.node < 1000
    """,
)
def hierarchy_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE query family (the reference answers these as Cypher
    variable-length parent-chain MATCHes): per-node SUBTREE aggregates
    over a parent-pointer forest — here the decimal-digit hierarchy
    parent(k) = k div 10 over customers, the deterministic stand-in for
    an org chart / BOM. Spark has no WITH RECURSIVE; the closure comes
    from log2(depth) pointer-doubling self-joins
    (operators/hierarchy.py:ancestor_closure) and the rollup is ONE
    groupBy over the contribution pairs — no per-level rounds, no driver
    walk. The oracle is the textbook recursive CTE."""
    from graph_db_spark.operators.hierarchy import subtree_rollup

    c = load_table(spark, sf_dir, "customer")
    nodes = c.select(F.col("c_custkey").alias("node"), F.col("c_acctbal").alias("v"))
    edges = c.filter(F.col("c_custkey") >= 10).select(
        F.col("c_custkey").alias("node"),
        F.floor(F.col("c_custkey") / 10).cast("bigint").alias("parent"),
    )
    out = subtree_rollup(nodes, edges, "v")
    return out.filter(F.col("node") < 1000).select(
        "node", "depth", "subtree_n", r4(F.col("subtree_sum")).alias("subtree_sum")
    )


def _kcenter_sql(k: int = 8) -> str:
    """DuckDB replay of similarity.kcenter_select: seed = smallest id,
    then ``k`` chained (argmax, fold-min) CTE pairs using the SAME
    expanded-form squared-L2 (_pq_d2 == similarity._l2sq) so every md is
    bit-identical; argmax orders (md DESC, id) with the md > 0
    chosen-duplicate guard mirrored. MATERIALIZED throughout (the
    PageRank-oracle inlining lesson)."""
    parts = [
        "WITH base AS (SELECT CAST(vec_id AS BIGINT) AS id,"
        " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        "seed AS MATERIALIZED (SELECT id, v FROM base ORDER BY id LIMIT 1)",
        f"m0 AS MATERIALIZED (SELECT b.id, b.v, {_pq_d2('b.v', 'seed.v')} AS md"
        f" FROM base b CROSS JOIN seed)",
    ]
    for t in range(1, k + 1):
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT id, v, md FROM m{t - 1}"
            f" WHERE md > 0 ORDER BY md DESC, id LIMIT 1)"
        )
        if t < k:
            parts.append(
                f"m{t} AS MATERIALIZED (SELECT m.id, m.v,"
                f" least(m.md, {_pq_d2('m.v', 'c.v')}) AS md"
                f" FROM m{t - 1} m CROSS JOIN c{t} c)"
            )
    selects = [
        "SELECT CAST(0 AS BIGINT) AS round, seed.id AS id,"
        " round(sqrt(0.0), 4) + 0.0 AS sep FROM seed"
    ]
    for t in range(1, k + 1):
        selects.append(
            f"SELECT CAST({t} AS BIGINT), c{t}.id, round(sqrt(c{t}.md), 4) + 0.0 FROM c{t}"
        )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@register("kcenter_coreset", oracle=_kcenter_sql(8))
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-first data selection: greedy k-center (farthest-point)
    coreset over the embeddings table
    (operators/similarity.py:kcenter_select) — the coverage-maximizing
    complement of semantic_dedup's redundancy removal (both are
    embedding-space curation passes a training-data pipeline runs before
    mixing). Emits the selection order and each pick's separation — the
    monotone radii that certify the 2-approximation. k+1 narrow scans,
    no shuffle; the oracle replays every fold exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = SIM.kcenter_select(emb, "embedding", "vec_id", k=8)
    return out.select("round", "id", r4(F.col("sep")).alias("sep"))


@register(
    "geo_grid_distance_join",
    oracle="""
    WITH s AS (SELECT s_suppkey,
                      CAST((s_suppkey * 53) % 1000 AS DOUBLE) / 10.0 AS sx,
                      CAST((s_suppkey * 17) % 1000 AS DOUBLE) / 10.0 AS sy
               FROM supplier),
    c AS (SELECT c_custkey,
                 CAST((c_custkey * 37) % 1000 AS DOUBLE) / 10.0 AS cx,
                 CAST((c_custkey * 91) % 1000 AS DOUBLE) / 10.0 AS cy
          FROM customer)
    SELECT s_suppkey,
           CAST(count(*) AS BIGINT) AS n_within,
           round(min(sqrt((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy))), 4)
             + 0.0 AS nearest_dist
    FROM s JOIN c
      ON (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 6.25
    GROUP BY 1
    """,
)
def geo_grid_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join via grid-cell bucketing
    (operators/joins.py:grid_distance_join): per supplier site, how many
    customer sites fall within euclidean radius 2.5 and how near the
    closest one is. Coordinates synthesized deterministically from keys
    (the F21 point-parse convention, parity
    /root/reference/app/patches.py:17-27 point columns). The oracle is
    the naive all-pairs distance filter — exact at checker scale; the
    Spark side runs the grid path (one 3x3 neighbor explode + cell
    equi-join), whose candidate set provably contains every
    radius-qualifying pair, so results are identical while shuffle stays
    O(n) at 100 TB. sqrt/multiply are correctly-rounded IEEE ops —
    bit-identical across engines; round AFTER the min fold."""
    from graph_db_spark.operators.joins import grid_distance_join

    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 53 % 1000).cast("double") / 10.0).alias("sx"),
        ((F.col("s_suppkey") * 17 % 1000).cast("double") / 10.0).alias("sy"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 1000).cast("double") / 10.0).alias("cx"),
        ((F.col("c_custkey") * 91 % 1000).cast("double") / 10.0).alias("cy"),
    )
    pairs = grid_distance_join(sup, cust, ("sx", "sy"), ("cx", "cy"), radius=2.5)
    return pairs.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_within"),
        r4(F.min("dist")).alias("nearest_dist"),
    )


# ---------------------------------------------------------------------------
# r7 statistics battery — concentration / digit-law / association /
# variance-decomposition / rank tests / frequency-moment sketch
# ---------------------------------------------------------------------------


@register(
    "gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nation, c.c_custkey AS cust,
             sum(o.o_totalprice) AS x
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT nation, x,
             row_number() OVER (PARTITION BY nation ORDER BY x, cust) AS i
      FROM rev
    )
    SELECT CAST(nation AS BIGINT) AS nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(2.0 * sum(i * x) / (count(*) * sum(x))
                 - (count(*) + 1.0) / count(*), 4) + 0.0 AS gini,
           round(sum(x * x) / (sum(x) * sum(x)), 4) + 0.0 AS hhi
    FROM rk GROUP BY 1
    """,
)
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — revenue-concentration audit per nation: the Gini
    coefficient in its sorted-rank closed form G = 2·Σi·x_i/(n·Σx) −
    (n+1)/n plus the Herfindahl-Hirschman index Σ share². The rank is a
    per-nation window over per-customer revenue (ties broken by custkey;
    permuting equal x leaves Σi·x_i unchanged, so the tiebreak is for
    determinism, not semantics). One narrow join + one window + one agg
    — at 100 TB the window partitions by nation so no global sort ever
    happens, and the fact scan reduces to two pushed columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rev = (
        o.join(c.select("c_custkey", "c_nationkey"), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"), F.col("c_custkey").alias("cust")
        )
        .agg(F.sum("o_totalprice").alias("x"))
    )
    w = Window.partitionBy("nation").orderBy("x", "cust")
    rk = rev.select("nation", "x", F.row_number().over(w).alias("i"))
    n = F.count(F.lit(1))
    return rk.groupBy("nation").agg(
        n.cast("bigint").alias("n_customers"),
        r4(
            2.0 * F.sum(F.col("i") * F.col("x")) / (n * F.sum("x"))
            - (n + 1.0) / n
        ).alias("gini"),
        r4(F.sum(F.col("x") * F.col("x")) / (F.sum("x") * F.sum("x"))).alias("hhi"),
    ).select(F.col("nation").cast("bigint").alias("nation"), "n_customers", "gini", "hhi")


@register(
    "benford_first_digit",
    oracle="""
    WITH raw AS (
      SELECT CAST(floor(o_totalprice
                        / power(10, floor(log10(o_totalprice)))) AS BIGINT) AS rd
      FROM orders WHERE o_totalprice > 0
    ),
    d AS (
      SELECT CASE WHEN rd >= 10 THEN 1 ELSE greatest(rd, 1) END AS digit FROM raw
    ),
    tot AS (SELECT count(*) AS n FROM d)
    SELECT digit, CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0 / tot.n, 4) + 0.0 AS obs_share,
           round(log10(1.0 + 1.0 / digit), 4) + 0.0 AS benford_share,
           round(tot.n * power(count(*) * 1.0 / tot.n
                               - log10(1.0 + 1.0 / digit), 2)
                 / log10(1.0 + 1.0 / digit), 4) + 0.0 AS chi2_term
    FROM d, tot GROUP BY digit, tot.n
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — Benford's-law conformance screen on order totals:
    first significant digit d = ⌊p/10^⌊log10 p⌋⌋ vs the log10(1+1/d)
    expectation, one χ² term per digit (fraud/data-entry anomaly
    screening over financial columns). Digit extraction stays numeric —
    never a double→string format, which is NOT engine-portable — and the
    1-ulp log10 boundary is pinned IDENTICALLY on both sides (r8 advice):
    on an exact power of 10, an engine's independently-rounded log10 can
    land 1 ulp under the integer and yield raw digit 10; the TRUE first
    digit there is 1, so raw>=10 maps to 1 (not a clamp to 9, which would
    encode the wrong boundary value). One pushed-projection scan + a
    9-group agg; the scalar total arrives via a broadcast cross join, so
    the plan is two stages at any scale."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    raw = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("bigint")
    d = o.select(
        F.when(raw >= 10, F.lit(1).cast("bigint"))
        .otherwise(F.greatest(raw, F.lit(1).cast("bigint")))
        .alias("digit")
    )
    tot = d.agg(F.count(F.lit(1)).alias("n_tot"))
    share = F.count(F.lit(1)) * 1.0 / F.first("n_tot")
    exp = F.log(10.0, 1.0 + 1.0 / F.col("digit"))
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy("digit")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            r4(share).alias("obs_share"),
            r4(exp).alias("benford_share"),
            r4(F.first("n_tot") * F.pow(share - exp, 2) / exp).alias("chi2_term"),
        )
    )


@register(
    "cramers_v_association",
    oracle="""
    WITH ct AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
             count(*) AS obs
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT seg, pri, obs,
             sum(obs) OVER (PARTITION BY seg) AS rt,
             sum(obs) OVER (PARTITION BY pri) AS col_t,
             sum(obs) OVER () AS n
      FROM ct
    ),
    chi AS (
      SELECT max(n) AS n,
             count(DISTINCT seg) AS r, count(DISTINCT pri) AS c,
             sum(power(obs - rt * col_t * 1.0 / n, 2) / (rt * col_t * 1.0 / n))
               AS chi2
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST((r - 1) * (c - 1) AS BIGINT) AS df,
           round(chi2, 4) + 0.0 AS chi2,
           round(sqrt(chi2 / (n * (least(r, c) - 1))), 4) + 0.0 AS cramers_v
    FROM chi
    """,
)
def cramers_v_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — Cramér's V association between market segment and
    order priority: χ² over the full contingency table with windowed
    marginals (no second scan), then V = √(χ²/(n·(min(r,c)−1))). The
    contingency table is 5×5 — the windows and the final agg run on 25
    rows regardless of fact-table scale, so the whole test costs one
    groupBy shuffle of the join output."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    ct = (
        o.join(c.select("c_custkey", "c_mktsegment"), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri")
        )
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    m = ct.select(
        "seg",
        "pri",
        "obs",
        F.sum("obs").over(Window.partitionBy("seg")).alias("rt"),
        F.sum("obs").over(Window.partitionBy("pri")).alias("col_t"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("rt") * F.col("col_t") * 1.0 / F.col("n")
    chi = m.agg(
        F.max("n").alias("n"),
        F.countDistinct("seg").alias("r"),
        F.countDistinct("pri").alias("c"),
        F.sum(F.pow(F.col("obs") - e, 2) / e).alias("chi2"),
    )
    return chi.select(
        F.col("n").cast("bigint").alias("n"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("df"),
        r4(F.col("chi2")).alias("chi2"),
        r4(
            F.sqrt(F.col("chi2") / (F.col("n") * (F.least("r", "c") - 1)))
        ).alias("cramers_v"),
    )


@register(
    "anova_f_oneway",
    oracle="""
    WITH g AS (
      SELECT c_mktsegment AS seg, count(*) AS ng,
             sum(c_acctbal) AS s, sum(c_acctbal * c_acctbal) AS ss
      FROM customer GROUP BY 1
    ),
    tot AS (
      SELECT count(*) AS k, sum(ng) AS n, sum(s) AS st, sum(ss) AS sst,
             sum(s * s / ng) AS sb
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           round(st / n, 4) + 0.0 AS grand_mean,
           round(((sb - st * st / n) / (k - 1))
                 / ((sst - sb) / (n - k)), 4) + 0.0 AS f_stat,
           round((sb - st * st / n) / (sst - st * st / n), 4) + 0.0 AS eta_sq
    FROM tot
    """,
)
def anova_f_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — one-way ANOVA of account balance across market
    segments: F = (SSB/(k−1))/(SSW/(n−k)) from the Σx/Σx² sufficient
    statistics (one map-side-combinable agg — no per-row mean join, no
    second pass), plus η² effect size. Emitted values are ratios/means,
    whose cross-engine float drift is relative (~1e−12), never the raw
    sums-of-squares whose ABSOLUTE drift would break 4-decimal hashing."""
    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("c_acctbal").alias("s"),
        F.sum(F.col("c_acctbal") * F.col("c_acctbal")).alias("ss"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("s").alias("st"),
        F.sum("ss").alias("sst"),
        F.sum(F.col("s") * F.col("s") / F.col("ng")).alias("sb"),
    )
    ssb = F.col("sb") - F.col("st") * F.col("st") / F.col("n")
    sst_c = F.col("sst") - F.col("st") * F.col("st") / F.col("n")
    ssw = F.col("sst") - F.col("sb")
    return tot.select(
        F.col("k").cast("bigint").alias("k"),
        F.col("n").cast("bigint").alias("n"),
        r4(F.col("st") / F.col("n")).alias("grand_mean"),
        r4((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))).alias(
            "f_stat"
        ),
        r4(ssb / sst_c).alias("eta_sq"),
    )


@register(
    "kruskal_wallis_test",
    oracle="""
    WITH li AS (SELECT l_returnflag AS flag, l_quantity AS q FROM lineitem),
    rq AS (
      SELECT q, count(*) AS t,
             sum(count(*)) OVER (ORDER BY q) - count(*)
               + (count(*) + 1) / 2.0 AS r
      FROM li GROUP BY q
    ),
    ranked AS (SELECT li.flag, rq.r, rq.t FROM li JOIN rq ON li.q = rq.q),
    n_tot AS (SELECT count(*) AS n FROM li),
    grp AS (
      SELECT flag, count(*) AS ng, avg(r) AS mr FROM ranked GROUP BY 1
    ),
    ties AS (SELECT sum(t * t * t - t) AS tsum FROM rq),
    h AS (
      SELECT n_tot.n AS n, count(*) AS k,
             12.0 / (n_tot.n * (n_tot.n + 1.0))
               * sum(ng * power(mr - (n_tot.n + 1.0) / 2.0, 2)) AS h_raw,
             1.0 - ties.tsum / (power(n_tot.n, 3) - n_tot.n) AS c
      FROM grp, n_tot, ties GROUP BY n_tot.n, ties.tsum
    ),
    final AS (
      SELECT n, k, h_raw / c AS hc FROM h
    )
    SELECT g.flag, CAST(g.ng AS BIGINT) AS n,
           round(g.mr, 4) + 0.0 AS mean_rank,
           CAST(f.k - 1 AS BIGINT) AS df,
           round(f.hc, 4) + 0.0 AS h_corrected
    FROM grp g, final f
    """,
)
def kruskal_wallis_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — Kruskal-Wallis H across return flags on quantity,
    the k-group rank ANOVA with full tie correction (quantity has ~50
    distinct values over the whole fact table — the 6Σd² textbook form
    is unusable). Midranks come from ONE cumsum window over the
    DISTINCT-value table (the spearman_rank_correlation trick at
    queries.py:spearman_rank_correlation): every midrank is an exact
    multiple of 0.5, and sums of half-integers are EXACT in double —
    the emitted H is bit-identical across engines, not merely close.
    CARDINALITY ASSUMPTION (r7 verdict): the global cumsum window runs
    over the distinct-VALUE grid, which is bounded (~50 rows) for the
    integer-valued quantity column this test targets but grows O(n)
    for a continuous measure — on such a column, swap the window for
    ``with_global_rank(cumsum_cols=...)`` (aggregates.py), the
    two-level prefix sum heaps_law_fit/sprt use; midranks stay exact
    .5 multiples under any partition split because integer cumsums
    are associative."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"), F.col("l_quantity").alias("q")
    )
    g = li.groupBy("q").agg(F.count(F.lit(1)).alias("t"))
    w = Window.orderBy("q")
    rq = g.select(
        "q",
        "t",
        (F.sum("t").over(w) - F.col("t") + (F.col("t") + 1) / 2.0).alias("r"),
    )
    ranked = li.join(F.broadcast(rq), on="q")
    grp = ranked.groupBy("flag").agg(
        F.count(F.lit(1)).alias("ng"), F.avg("r").alias("mr")
    )
    n_tot = li.agg(F.count(F.lit(1)).alias("n"))
    ties = rq.agg(F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tsum"))
    h = (
        grp.crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(ties))
        .groupBy("n", "tsum")
        .agg(
            F.count(F.lit(1)).alias("k"),
            (
                12.0
                / (F.col("n") * (F.col("n") + 1.0))
                * F.sum(
                    F.col("ng")
                    * F.pow(F.col("mr") - (F.col("n") + 1.0) / 2.0, 2)
                )
            ).alias("h_raw"),
        )
        .select(
            "n",
            "k",
            (
                F.col("h_raw")
                / (1.0 - F.col("tsum") / (F.pow(F.col("n"), 3) - F.col("n")))
            ).alias("hc"),
        )
    )
    return grp.crossJoin(F.broadcast(h)).select(
        "flag",
        F.col("ng").cast("bigint").alias("n"),
        r4(F.col("mr")).alias("mean_rank"),
        (F.col("k") - 1).cast("bigint").alias("df"),
        r4(F.col("hc")).alias("h_corrected"),
    )


def _ams_f2_sql(n_est: int = 32, per_group: int = 8, seed: int = 17) -> str:
    """DuckDB replay of the AMS F2 (second frequency moment) sketch:
    ±1 four-wise-style signs from the portable hash + the LCG affine
    family (dedup.py:minhash_params, emitted as integer literals),
    median-of-means over ``n_est`` estimators in groups of
    ``per_group``. Every intermediate is integer or an exact
    power-of-two division, so the estimate is bit-identical."""
    from graph_db_spark.operators.dedup import _MINHASH_P as P
    from graph_db_spark.operators.dedup import minhash_params

    vals = ", ".join(
        f"({i}, {i // per_group}, {a}, {b})"
        for i, (a, b) in enumerate(minhash_params(n_est, seed=seed))
    )
    n_groups = n_est // per_group
    lo, hi = n_groups // 2, n_groups // 2 + 1
    return f"""
    WITH f AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS c
               FROM events GROUP BY 1),
    h AS (SELECT k, c, {_poly_sql('k')} AS hh FROM f),
    s AS (SELECT t.i, t.g,
                 sum(CASE WHEN ((t.a * hh + t.b) % {P}) % 2 = 0
                          THEN c ELSE -c END) AS sk
          FROM h CROSS JOIN (VALUES {vals}) t(i, g, a, b) GROUP BY 1, 2),
    means AS (SELECT g, sum(sk * sk) / {per_group}.0 AS m FROM s GROUP BY 1),
    med AS (SELECT m, row_number() OVER (ORDER BY m) AS rn FROM means),
    ams AS (SELECT avg(m) AS v FROM med WHERE rn IN ({lo}, {hi})),
    exact AS (SELECT sum(c * c) AS v FROM f)
    SELECT CAST(exact.v AS BIGINT) AS exact_f2,
           round(ams.v, 4) + 0.0 AS ams_estimate,
           round((ams.v - exact.v) / exact.v, 4) + 0.0 AS rel_error
    FROM exact, ams
    """


@register("ams_f2_moment", oracle=_ams_f2_sql())
def ams_f2_moment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketches — AMS second frequency moment (Alon-Matias-Szegedy
    tug-of-war) of the events user_id stream: 32 ±1-signed counters,
    median of 4 means of 8 squared estimators, vs the exact
    F2 = Σf² self-join size. F2 IS the self-join/skew planning number
    — at 100 TB the 32 counters come from one map-side-combined agg
    over the (already tiny) per-key frequency table, no shuffle wider
    than 32 rows; pair it with cms_join_cardinality for two-sided join
    sizing. Signs/means/median are integer or power-of-two exact —
    the estimate hashes bit-identically (see _ams_f2_sql)."""
    from graph_db_spark.operators.dedup import _MINHASH_P as P
    from graph_db_spark.operators.dedup import minhash_params, portable_hash

    n_est, per_group, seed = 32, 8, 17
    f = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").cast("string").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select("c", portable_hash(F.col("k")).alias("hh"))
    )
    params = spark.createDataFrame(
        [
            (i, i // per_group, a, b)
            for i, (a, b) in enumerate(minhash_params(n_est, seed=seed))
        ],
        "i int, g int, a long, b long",
    )
    sk = (
        f.crossJoin(F.broadcast(params))
        .groupBy("i", "g")
        .agg(
            F.sum(
                F.when(
                    ((F.col("a") * F.col("hh") + F.col("b")) % P) % 2 == 0,
                    F.col("c"),
                ).otherwise(-F.col("c"))
            ).alias("sk")
        )
    )
    means = sk.groupBy("g").agg(
        (F.sum(F.col("sk") * F.col("sk")) / float(per_group)).alias("m")
    )
    n_groups = n_est // per_group
    lo, hi = n_groups // 2, n_groups // 2 + 1
    med = means.select(
        "m", F.row_number().over(Window.orderBy("m")).alias("rn")
    ).filter(F.col("rn").isin(lo, hi))
    ams = med.agg(F.avg("m").alias("v"))
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("ex"))
    )
    return exact.crossJoin(ams).select(
        F.col("ex").cast("bigint").alias("exact_f2"),
        r4(F.col("v")).alias("ams_estimate"),
        r4((F.col("v") - F.col("ex")) / F.col("ex")).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# r7 time-series battery — classical decomposition / forecast-accuracy
# scaling / lead-lag cross-correlation
# ---------------------------------------------------------------------------


@register(
    "stl_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS y
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT day, y,
             CASE WHEN count(*) OVER w = 7 THEN avg(y) OVER w END AS trend
      FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                              AND 3 FOLLOWING)
    ),
    d AS (SELECT day, y, trend, dayofweek(day) AS dow, y - trend AS detr
          FROM t),
    s AS (SELECT dow, avg(detr) AS sd FROM d GROUP BY 1),
    sc AS (SELECT dow, sd - (SELECT avg(sd) FROM s) AS seas FROM s)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           round(d.y, 4) + 0.0 AS revenue,
           round(d.trend, 4) + 0.0 AS trend,
           round(sc.seas, 4) + 0.0 AS seasonal,
           round(d.y - d.trend - sc.seas, 4) + 0.0 AS remainder
    FROM d JOIN sc ON d.dow = sc.dow
    """,
)
def stl_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time series — classical additive decomposition of daily revenue
    (the moving-average core of STL): trend = centered 7-day MA (NULL at
    the edges where the window is partial — no fabricated trend),
    seasonal = day-of-week mean of the detrended series re-centered to
    sum 0, remainder = the rest. The fact scan collapses to a daily
    aggregate before any window runs, so the windows order a
    calendar-sized table — at 100 TB the only full-data pass is the
    map-side-combined groupBy. DOW uses DuckDB's 0-6 Sunday-first
    convention (dow_seasonality precedent)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("y")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.select(
        "day",
        "y",
        F.when(F.count(F.lit(1)).over(w) == 7, F.avg("y").over(w)).alias("trend"),
    )
    d = t.select(
        "day",
        "y",
        "trend",
        (F.dayofweek("day") - 1).alias("dow"),
        (F.col("y") - F.col("trend")).alias("detr"),
    )
    s = d.groupBy("dow").agg(F.avg("detr").alias("sd"))
    grand = s.agg(F.avg("sd").alias("g"))
    sc = s.crossJoin(F.broadcast(grand)).select(
        "dow", (F.col("sd") - F.col("g")).alias("seas")
    )
    return d.join(F.broadcast(sc), on="dow").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        r4(F.col("y")).alias("revenue"),
        r4(F.col("trend")).alias("trend"),
        r4(F.col("seas")).alias("seasonal"),
        r4(F.col("y") - F.col("trend") - F.col("seas")).alias("remainder"),
    )


@register(
    "mase_forecast_accuracy",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, CAST(ts AS DATE) AS day, sum(value) AS v
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT et, v,
             lag(v, 1) OVER (PARTITION BY et ORDER BY day) AS l1,
             lag(v, 7) OVER (PARTITION BY et ORDER BY day) AS l7
      FROM daily
    )
    SELECT et AS event_type, CAST(count(*) AS BIGINT) AS n_days,
           round(avg(abs(v - l1)), 4) + 0.0 AS mae_naive,
           round(avg(abs(v - l7)), 4) + 0.0 AS mae_seasonal,
           round(avg(abs(v - l7)) / avg(abs(v - l1)), 4) + 0.0 AS mase
    FROM lagged GROUP BY 1
    """,
)
def mase_forecast_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time series — MASE (mean absolute scaled error, Hyndman-Koehler)
    per event type: the seasonal-naive (t−7) forecast's MAE scaled by
    the one-step-naive MAE, the standard scale-free way to compare
    forecast baselines across series of different magnitude (< 1 means
    weekly seasonality carries real signal). avg() skips the NULL
    warm-up rows on both engines — that shared semantic IS the
    contract. Windows run per-type on the daily rollup, so state is
    calendar-bounded at any fact scale."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.to_date("ts").alias("day")
    ).agg(F.sum("value").alias("v"))
    w = Window.partitionBy("et").orderBy("day")
    lagged = daily.select(
        "et",
        "v",
        F.lag("v", 1).over(w).alias("l1"),
        F.lag("v", 7).over(w).alias("l7"),
    )
    mae1 = F.avg(F.abs(F.col("v") - F.col("l1")))
    mae7 = F.avg(F.abs(F.col("v") - F.col("l7")))
    return lagged.groupBy(F.col("et").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        r4(mae1).alias("mae_naive"),
        r4(mae7).alias("mae_seasonal"),
        r4(mae7 / mae1).alias("mase"),
    )


@register(
    "cross_correlation_lead_lag",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             count(*) * 1.0 AS c, avg(o_totalprice) AS p
      FROM orders GROUP BY 1
    ),
    lags AS (SELECT range AS lag FROM range(-7, 8)),
    pairs AS (
      SELECT l.lag, a.c, b.p
      FROM lags l
      JOIN daily a ON true
      JOIN daily b ON b.day = a.day + CAST(l.lag || ' days' AS INTERVAL)
    )
    SELECT CAST(lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n_days,
           round(corr(c, p), 4) + 0.0 AS ccf
    FROM pairs GROUP BY 1
    """,
)
def cross_correlation_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time series — cross-correlation function between daily order
    count and daily mean ticket at lags −7..+7: does volume LEAD price
    or follow it? The join key is day+lag over the daily rollup, so the
    15-lag fan-out multiplies a calendar-sized table, never the fact
    stream; corr() is the one co-moment agg per lag. Scale: one groupBy
    shuffle over ≤ 15·|days| rows regardless of order volume."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.count(F.lit(1)) * 1.0).alias("c"), F.avg("o_totalprice").alias("p")
    )
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("lag"))
    b = daily.select(F.col("day").alias("bday"), "p")
    pairs = (
        daily.select("day", "c")
        .crossJoin(F.broadcast(lags))
        .join(b, F.expr("bday = date_add(day, lag)"))
    )
    return pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        r4(F.corr("c", "p")).alias("ccf"),
    ).select(F.col("lag").cast("bigint").alias("lag"), "n_days", "ccf")


# ---------------------------------------------------------------------------
# r7 ML battery — closed-form OLS / multinomial NB token screen /
# leave-one-out 1-NN eval / reciprocal-NN pairs / centroid drift
# ---------------------------------------------------------------------------


@register(
    "ols_normal_equations",
    oracle="""
    WITH s AS (
      SELECT count(*) * 1.0 AS n,
             sum(l_quantity) AS sx1, sum(l_discount) AS sx2,
             sum(l_quantity * l_quantity) AS s11,
             sum(l_quantity * l_discount) AS s12,
             sum(l_discount * l_discount) AS s22,
             sum(l_extendedprice) AS sy,
             sum(l_quantity * l_extendedprice) AS s1y,
             sum(l_discount * l_extendedprice) AS s2y,
             sum(l_extendedprice * l_extendedprice) AS syy
      FROM lineitem
    ),
    d AS (
      SELECT *,
             n * (s11 * s22 - s12 * s12)
             - sx1 * (sx1 * s22 - s12 * sx2)
             + sx2 * (sx1 * s12 - s11 * sx2) AS det
      FROM s
    ),
    beta AS (
      SELECT n, sy, s1y, s2y, syy,
             (sy  * (s11 * s22 - s12 * s12)
              - sx1 * (s1y * s22 - s12 * s2y)
              + sx2 * (s1y * s12 - s11 * s2y)) / det AS b0,
             (n   * (s1y * s22 - s12 * s2y)
              - sy * (sx1 * s22 - s12 * sx2)
              + sx2 * (sx1 * s2y - s1y * sx2)) / det AS b1,
             (n   * (s11 * s2y - s1y * s12)
              - sx1 * (sx1 * s2y - s1y * sx2)
              + sy * (sx1 * s12 - s11 * sx2)) / det AS b2
      FROM d
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(b0, 4) + 0.0 AS intercept,
           round(b1, 4) + 0.0 AS beta_quantity,
           round(b2, 4) + 0.0 AS beta_discount,
           round(1.0 - (syy - (b0 * sy + b1 * s1y + b2 * s2y))
                       / (syy - sy * sy / n), 4) + 0.0 AS r2
    FROM beta
    """,
)
def ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML — closed-form multiple linear regression (extendedprice ~
    quantity + discount) via the 3×3 normal equations solved with
    Cramer's rule: ONE map-side-combinable aggregate collects the ten
    sufficient statistics, the solve is scalar arithmetic on a 1-row
    frame. SSE uses the normal-equation identity yᵀy − βᵀXᵀy, so R²
    needs no second pass. This is the 100 TB regression recipe: no
    gradient loop, no driver matrix library, shuffle width = 10
    doubles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        F.col("l_extendedprice").alias("y"),
    )
    s = li.agg(
        (F.count(F.lit(1)) * 1.0).alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx1, sx2 = F.col("n"), F.col("sx1"), F.col("sx2")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    sy, s1y, s2y, syy = F.col("sy"), F.col("s1y"), F.col("s2y"), F.col("syy")
    det = (
        n * (s11 * s22 - s12 * s12)
        - sx1 * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s12 - s11 * sx2)
    )
    b0 = (
        sy * (s11 * s22 - s12 * s12)
        - sx1 * (s1y * s22 - s12 * s2y)
        + sx2 * (s1y * s12 - s11 * s2y)
    ) / det
    b1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s2y - s1y * sx2)
    ) / det
    b2 = (
        n * (s11 * s2y - s1y * s12)
        - sx1 * (sx1 * s2y - s1y * sx2)
        + sy * (sx1 * s12 - s11 * sx2)
    ) / det
    sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    sst = syy - sy * sy / n
    return s.select(
        n.cast("bigint").alias("n"),
        r4(b0).alias("intercept"),
        r4(b1).alias("beta_quantity"),
        r4(b2).alias("beta_discount"),
        r4(1.0 - sse / sst).alias("r2"),
    )


@register(
    "naive_bayes_token_screen",
    oracle="""
    WITH lab AS (
      SELECT CASE WHEN n_chars >= 300 THEN 'long' ELSE 'short' END AS y,
             lower(trim(text)) AS t
      FROM documents
    ),
    toks AS (SELECT y, unnest(string_split_regex(t, '\\s+')) AS tok FROM lab),
    cnt AS (
      SELECT tok,
             sum(CASE WHEN y = 'long' THEN 1 ELSE 0 END) AS cl,
             sum(CASE WHEN y = 'short' THEN 1 ELSE 0 END) AS cs
      FROM toks GROUP BY 1
    ),
    tot AS (
      SELECT sum(cl) AS tl, sum(cs) AS ts, count(*) AS v FROM cnt
    ),
    llr AS (
      SELECT tok, CAST(cl AS BIGINT) AS count_long,
             CAST(cs AS BIGINT) AS count_short,
             ln((cl + 1.0) / (tot.tl + tot.v))
               - ln((cs + 1.0) / (tot.ts + tot.v)) AS w
      FROM cnt, tot WHERE cl + cs >= 5
    ),
    ranked AS (
      SELECT tok, count_long, count_short, w,
             row_number() OVER (ORDER BY w DESC, tok) AS rl,
             row_number() OVER (ORDER BY w ASC, tok) AS rs
      FROM llr
    )
    SELECT tok AS token, count_long, count_short,
           round(w, 4) + 0.0 AS log_likelihood_ratio,
           CASE WHEN rl <= 10 THEN 'long' ELSE 'short' END AS indicates
    FROM ranked WHERE rl <= 10 OR rs <= 10
    """,
)
def naive_bayes_token_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML — multinomial naive-Bayes feature screen: Laplace-smoothed
    per-token log-likelihood ratios between long (≥300 chars) and short
    documents, top-10 indicators each way. Training IS one token-count
    aggregate (the classic MapReduce NB); the class totals + vocabulary
    size ride in on a broadcast scalar row. The ≥5-occurrence floor
    keeps the screen out of hapax noise. Counts are integers and the
    weights single ln() calls — no float-sum drift anywhere. NO global
    window (r7 verdict fix): the vocabulary grows ~O(corpus^β), so each
    top-10 is a TakeOrdered (``orderBy().limit``) — per-partition top-k
    + a k-row driver merge, the bm25_doc_ranking pattern — and the
    overlap case (vocab ≤ 20) resolves 'long'-wins via a 10-row
    anti-join, matching the oracle's OR semantics exactly."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.when(F.col("n_chars") >= 300, "long").otherwise("short").alias("y"),
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    )
    cnt = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("y") == "long", 1).otherwise(0)).alias("cl"),
        F.sum(F.when(F.col("y") == "short", 1).otherwise(0)).alias("cs"),
    )
    tot = cnt.agg(
        F.sum("cl").alias("tl"), F.sum("cs").alias("ts"), F.count(F.lit(1)).alias("v")
    )
    llr = (
        cnt.filter(F.col("cl") + F.col("cs") >= 5)
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.col("cl").cast("bigint").alias("count_long"),
            F.col("cs").cast("bigint").alias("count_short"),
            (
                F.log((F.col("cl") + 1.0) / (F.col("tl") + F.col("v")))
                - F.log((F.col("cs") + 1.0) / (F.col("ts") + F.col("v")))
            ).alias("w"),
        )
    )
    llr = llr.localCheckpoint()  # both top-k scans share one materialization
    long_top = llr.orderBy(F.desc("w"), F.asc("tok")).limit(10)
    short_top = llr.orderBy(F.asc("w"), F.asc("tok")).limit(10)

    def emit(df: DataFrame, indicates: str) -> DataFrame:
        return df.select(
            F.col("tok").alias("token"),
            "count_long",
            "count_short",
            r4(F.col("w")).alias("log_likelihood_ratio"),
            F.lit(indicates).alias("indicates"),
        )

    short_only = short_top.join(
        F.broadcast(long_top.select("tok")), on="tok", how="left_anti"
    )
    return emit(long_top, "long").unionByName(emit(short_only, "short"))


@register(
    "knn_loo_label_eval",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
                      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[]))) AS nrm
               FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % 5 = 0),
    nn AS (
      SELECT vec_id, label, nlabel FROM (
        SELECT a.vec_id, a.label, b.label AS nlabel,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_dot_product(a.v, b.v) / (a.nrm * b.nrm) DESC,
                          b.vec_id
               ) AS rn
        FROM q a JOIN e b ON a.vec_id <> b.vec_id
      ) WHERE rn = 1
    )
    SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN nlabel = label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(sum(CASE WHEN nlabel = label THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) + 0.0 AS accuracy
    FROM nn GROUP BY 1
    """,
)
def knn_loo_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML — leave-one-out 1-NN label agreement per class on a
    deterministic 1-in-5 query sample (vec_id % 5 == 0; candidates stay
    the FULL corpus, so neighbors are exact): does each sampled
    vector's cosine-nearest OTHER vector carry the same label?
    The standard embedding-quality probe (high accuracy = labels are
    cosine-separable = the embedding is usable for retrieval branching).
    Brute-force sample×corpus — the exact baseline mirroring
    embedding_cosine_topk's fold discipline (left-fold dot products are
    bit-identical cross-engine); per-vector norms are computed ONCE,
    never per pair. The ANN-bucketed variants are the 100 TB path,
    this is their recall referee."""
    sqn = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", SIM._as_double(F.col("embedding")).alias("v")
    ).select("vec_id", "label", "v", sqn.alias("nrm"))
    q = e.filter(F.col("vec_id") % 5 == 0)
    b = e.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlabel"),
        F.col("v").alias("nv"),
        F.col("nrm").alias("nnrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("nv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = q.join(F.broadcast(b), F.col("vec_id") != F.col("nid")).select(
        "vec_id", "label", "nlabel",
        (dot / (F.col("nrm") * F.col("nnrm"))).alias("sim"), "nid",
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "nid")
    nn = pairs.select("*", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") == 1
    )
    agree = F.sum(F.when(F.col("nlabel") == F.col("label"), 1).otherwise(0))
    return nn.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        agree.cast("bigint").alias("n_correct"),
        r4(agree * 1.0 / F.count(F.lit(1))).alias("accuracy"),
    )


@register(
    "mutual_nearest_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
                      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[]))) AS nrm
               FROM embeddings),
    nn AS (
      SELECT vec_id, label, nid, sim FROM (
        SELECT a.vec_id, a.label, b.vec_id AS nid,
               list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_dot_product(a.v, b.v) / (a.nrm * b.nrm) DESC,
                          b.vec_id
               ) AS rn
        FROM e a JOIN e b
          ON a.label = b.label AND a.vec_id <> b.vec_id
      ) WHERE rn = 1
    )
    SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
           round(a.sim, 4) + 0.0 AS cosine_sim
    FROM nn a JOIN nn b
      ON a.nid = b.vec_id AND b.nid = a.vec_id AND a.vec_id < b.vec_id
    """,
)
def mutual_nearest_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML — reciprocal (mutual) nearest-neighbor pairs within each label
    class: (a,b) where each is the other's cosine-1-NN — the
    high-precision seed pairs entity resolution and contrastive-pair
    mining start from (RBM matching). Partitioning the all-pairs by
    label divides the quadratic work by the class count — the same
    blocking idea the dedup family uses; the reciprocal join then runs
    on the |V|-sized NN table. Tie-break and fold order mirror
    embedding_cosine_topk."""
    sqn = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", SIM._as_double(F.col("embedding")).alias("v")
    ).select("vec_id", "label", "v", sqn.alias("nrm"))
    b = e.select(
        F.col("label").alias("nlabel2"),
        F.col("vec_id").alias("nid"),
        F.col("v").alias("nv"),
        F.col("nrm").alias("nnrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("nv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = e.join(
        b,
        (F.col("label") == F.col("nlabel2")) & (F.col("vec_id") != F.col("nid")),
    ).select(
        "vec_id", "label", "nid",
        (dot / (F.col("nrm") * F.col("nnrm"))).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "nid")
    nn = pairs.select("*", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") == 1
    )
    nn2 = nn.select(
        F.col("vec_id").alias("b_vec"), F.col("nid").alias("b_nid")
    )
    return (
        nn.join(
            nn2,
            (F.col("nid") == F.col("b_vec"))
            & (F.col("b_nid") == F.col("vec_id"))
            & (F.col("vec_id") < F.col("b_vec")),
        )
        .select(
            F.col("label").cast("bigint").alias("label"),
            F.col("vec_id").alias("id_a"),
            F.col("b_vec").alias("id_b"),
            r4(F.col("sim")).alias("cosine_sim"),
        )
    )


@register(
    "embedding_centroid_drift",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dims AS MATERIALIZED (
      SELECT label, t.pos, v[t.pos] AS x
      FROM e CROSS JOIN range(1, 65) t(pos)
    ),
    lc AS (SELECT label, pos, avg(x) AS m FROM dims GROUP BY 1, 2),
    gc AS (SELECT pos, avg(x) AS g FROM dims GROUP BY 1),
    agg AS (
      SELECT lc.label, sum(lc.m * gc.g) AS dp,
             sum(lc.m * lc.m) AS l2, sum(gc.g * gc.g) AS g2
      FROM lc JOIN gc USING (pos) GROUP BY 1
    ),
    n AS (SELECT label, count(*) AS nv FROM e GROUP BY 1)
    SELECT CAST(agg.label AS BIGINT) AS label,
           CAST(n.nv AS BIGINT) AS n_vecs,
           round(dp / (sqrt(l2) * sqrt(g2)), 4) + 0.0 AS cos_to_global,
           round(sqrt(l2), 4) + 0.0 AS centroid_norm
    FROM agg JOIN n ON agg.label = n.label
    """,
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML — per-class centroid drift: cosine between each label's mean
    embedding and the corpus mean (low cosine = the class occupies its
    own region; near-1 = the class is not linearly separated from the
    bulk), plus the centroid norm (near-0 = the class averages itself
    away — an isotropy warning). Dimension explode → one
    map-side-combinable avg per (label, dim): the shuffle carries
    |labels|·64 rows however many vectors exist — the canonical
    distributed-centroid plan."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", SIM._as_double(F.col("embedding")).alias("v")
    )
    dims = e.select("label", F.posexplode("v").alias("pos0", "x")).select(
        "label", (F.col("pos0") + 1).alias("pos"), "x"
    )
    lc = dims.groupBy("label", "pos").agg(F.avg("x").alias("m"))
    gc = dims.groupBy("pos").agg(F.avg("x").alias("g"))
    agg = lc.join(F.broadcast(gc), on="pos").groupBy("label").agg(
        F.sum(F.col("m") * F.col("g")).alias("dp"),
        F.sum(F.col("m") * F.col("m")).alias("l2"),
        F.sum(F.col("g") * F.col("g")).alias("g2"),
    )
    n = e.groupBy("label").agg(F.count(F.lit(1)).alias("nv"))
    return agg.join(n, on="label").select(
        F.col("label").cast("bigint").alias("label"),
        F.col("nv").cast("bigint").alias("n_vecs"),
        r4(F.col("dp") / (F.sqrt("l2") * F.sqrt("g2"))).alias("cos_to_global"),
        r4(F.sqrt("l2")).alias("centroid_norm"),
    )


# ---------------------------------------------------------------------------
# r7 pipeline battery — DP release / source-similarity matrix /
# curriculum phases / cross-source quantile normalization
# ---------------------------------------------------------------------------


def _dp_noisy_counts_sql(eps: float = 1.0) -> str:
    """DuckDB replay of the deterministic-Laplace DP release: uniform
    u ∈ (0,1) from the portable hash of the group key, inverse-CDF
    Laplace noise at sensitivity 1. Same hash, same ln — the 'noise' is
    a pure function of the key, so both engines emit identical rows."""
    from graph_db_spark.operators.dedup import _MINHASH_P as P

    return f"""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
    u AS (SELECT source, n,
                 ({_poly_sql('source')} + 1.0) / {P + 1}.0 AS u
          FROM c)
    SELECT source, CAST(n AS BIGINT) AS true_count,
           round(n - (1.0 / {eps}) * sign(u - 0.5)
                     * ln(1.0 - 2.0 * abs(u - 0.5)), 4) + 0.0
             AS noisy_count,
           round(CAST({eps} AS DOUBLE), 4) + 0.0 AS epsilon
    FROM u
    """


@register("dp_noisy_source_counts", oracle=_dp_noisy_counts_sql())
def dp_noisy_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy — ε-differentially-private count release per source:
    Laplace(1/ε) noise via the inverse CDF −(1/ε)·sgn(u−½)·ln(1−2|u−½|)
    over a uniform DERIVED FROM THE PORTABLE KEY HASH, not an RNG — the
    distributional shape of real DP noise with reproducible, oracle-
    checkable draws (the same seeded-noise trick the weighted sampler
    uses). Complements k_anonymity_audit: that one suppresses, this one
    perturbs. u ∈ (0,1) by construction ((h+1)/(P+1)), so the ln
    argument never hits 0. One aggregate + scalar math — shuffle is
    |groups| rows at any scale."""
    from graph_db_spark.operators.dedup import _MINHASH_P as P
    from graph_db_spark.operators.dedup import portable_hash

    eps = 1.0
    c = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    u = (portable_hash(F.col("source")) + 1.0) / float(P + 1)
    noise = (1.0 / eps) * F.signum(u - 0.5) * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    return c.select(
        "source",
        F.col("n").cast("bigint").alias("true_count"),
        r4(F.col("n") - noise).alias("noisy_count"),
        r4(F.lit(eps)).alias("epsilon"),
    )


@register(
    "source_js_divergence",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    c AS (SELECT source, token, count(*) * 1.0 AS cnt
          FROM toks GROUP BY 1, 2),
    t AS (SELECT source, sum(cnt) AS tot FROM c GROUP BY 1),
    p AS (SELECT c.source, c.token, c.cnt / t.tot AS p
          FROM c JOIN t USING (source)),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*) AS shared_terms,
             sum(0.5 * a.p * ln(a.p / ((a.p + b.p) / 2.0))
                 + 0.5 * b.p * ln(b.p / ((a.p + b.p) / 2.0))) AS jsd_shared,
             sum(a.p) AS pa_shared, sum(b.p) AS pb_shared
      FROM p a JOIN p b ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, CAST(shared_terms AS BIGINT) AS shared_terms,
           round(jsd_shared
                 + 0.5 * CAST(0.6931471805599453 AS DOUBLE) * (1.0 - pa_shared)
                 + 0.5 * CAST(0.6931471805599453 AS DOUBLE) * (1.0 - pb_shared),
                 4) + 0.0
             AS js_divergence
    FROM shared
    """,
)
def source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — the source-similarity matrix mixture design reads:
    Jensen-Shannon divergence between source unigram distributions
    (symmetric, bounded [0, ln 2], defined even when supports differ —
    unlike raw KL). Near-zero JSD → redundant sources to merge or
    down-weight in mixture_weights; high JSD → genuine diversity.
    Complements psi_distribution_drift (PSI watches ONE source over
    time; this compares sources pairwise). Tokens present on only one
    side contribute exactly 0.5·p·ln2 each, and Σp = 1, so the
    one-sided mass folds into the closed form 0.5·ln2·(1 − Σp_shared)
    per side — the pairwise work stays an INNER join on the
    (source, token) aggregate: |sources|²·|vocab| however many
    documents exist."""
    toks = load_table(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token"),
    )
    c = toks.groupBy("source", "token").agg((F.count(F.lit(1)) * 1.0).alias("cnt"))
    t = c.groupBy("source").agg(F.sum("cnt").alias("tot"))
    p = c.join(t, on="source").select(
        "source", "token", (F.col("cnt") / F.col("tot")).alias("p")
    )
    b = p.select(
        F.col("source").alias("source_b"), "token", F.col("p").alias("pb")
    )
    m = (F.col("p") + F.col("pb")) / 2.0
    term = 0.5 * F.col("p") * F.log(F.col("p") / m) + 0.5 * F.col("pb") * F.log(
        F.col("pb") / m
    )
    shared = (
        p.join(b, on="token")
        .filter(F.col("source") < F.col("source_b"))
        .groupBy(F.col("source").alias("source_a"), "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("shared_terms"),
            F.sum(term).alias("jsd_shared"),
            F.sum("p").alias("pa_shared"),
            F.sum("pb").alias("pb_shared"),
        )
    )
    ln2 = float(__import__("math").log(2.0))
    return shared.select(
        "source_a",
        "source_b",
        "shared_terms",
        r4(
            F.col("jsd_shared")
            + 0.5 * ln2 * (1.0 - F.col("pa_shared"))
            + 0.5 * ln2 * (1.0 - F.col("pb_shared"))
        ).alias("js_divergence"),
    )


@register(
    "curriculum_phase_assign",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
    t AS (SELECT count(*) AS n FROM toks),
    diff AS (
      SELECT doc_id, count(*) AS n_tokens,
             avg(-ln(cnt * 1.0 / n)) AS difficulty
      FROM toks JOIN c USING (token) CROSS JOIN t GROUP BY 1
    ),
    rk AS (
      SELECT *, row_number() OVER (ORDER BY difficulty, doc_id) AS rn,
             count(*) OVER () AS nd
      FROM diff
    ),
    ph AS (
      SELECT *, CAST(least(3, floor((rn - 1) * 4.0 / nd)) AS BIGINT) AS phase
      FROM rk
    )
    SELECT phase, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(min(difficulty), 4) + 0.0 AS min_difficulty,
           round(avg(difficulty), 4) + 0.0 AS avg_difficulty,
           round(max(difficulty), 4) + 0.0 AS max_difficulty
    FROM ph GROUP BY 1
    """,
)
def curriculum_phase_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — curriculum ordering: rank documents by unigram
    difficulty (mean −ln p under the corpus's own distribution — the
    unigram_logperplexity signal) and cut into 4 equal phases
    (easy→hard), emitting per-phase token budgets for scheduler
    consumption. The explicit ⌊(rn−1)·4/n⌋ bucket replaces ntile() —
    engines disagree on ntile's remainder placement, floor arithmetic
    they cannot. NO global window (r8 plan sweep): the |docs|-sized
    difficulty ranking rides the two-level prefix sum
    (``with_global_rank``) and the doc count arrives as a 1-row
    broadcast — a billion-doc curriculum ranks as #partitions parallel
    sorts."""
    from graph_db_spark.operators.aggregates import with_global_rank
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token"),
    )
    c = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    t = toks.agg(F.count(F.lit(1)).alias("n"))
    diff = (
        toks.join(c, on="token")
        .crossJoin(F.broadcast(t))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(-F.log(F.col("cnt") * 1.0 / F.col("n"))).alias("difficulty"),
        )
    )
    diff = diff.localCheckpoint()  # ranking + the count scalar share one pass
    nd = diff.agg(F.count(F.lit(1)).alias("nd"))
    rk = with_global_rank(
        diff, [F.asc("difficulty"), F.asc("doc_id")], rank_col="rn"
    ).crossJoin(F.broadcast(nd))  # 1-row scalar attach
    ph = rk.select(
        "*",
        F.least(F.lit(3), F.floor((F.col("rn") - 1) * 4.0 / F.col("nd")))
        .cast("bigint")
        .alias("phase"),
    )
    return ph.groupBy("phase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        r4(F.min("difficulty")).alias("min_difficulty"),
        r4(F.avg("difficulty")).alias("avg_difficulty"),
        r4(F.max("difficulty")).alias("max_difficulty"),
    )


@register(
    "quantile_normalize_lengths",
    oracle="""
    WITH g AS (
      SELECT n_chars AS v,
             row_number() OVER (ORDER BY n_chars, doc_id) AS gi,
             count(*) OVER () AS gn
      FROM documents
    ),
    s AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS ns
      FROM documents
    ),
    m AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN ns = 1 THEN 1
                  ELSE CAST(floor((rn - 1.0) / (ns - 1.0) * (
                         (SELECT max(gn) FROM g) - 1) + 0.5) + 1 AS BIGINT)
             END AS gidx
      FROM s
    )
    SELECT m.doc_id, m.source, CAST(m.n_chars AS BIGINT) AS n_chars,
           CAST(g.v AS BIGINT) AS n_chars_normalized
    FROM m JOIN g ON g.gi = m.gidx
    """,
)
def quantile_normalize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — cross-source quantile normalization (the batch-effect
    correction borrowed from bioinformatics): each document's length is
    replaced by the GLOBAL length at its within-source percentile, so
    every source's length distribution becomes the corpus distribution
    — the pre-mixing step that stops a long-doc source from dominating
    a token budget. Index math is ⌊x+0.5⌋ (explicit half-up: engines
    disagree on round-half semantics, never on floor). NO global window
    (r8 plan sweep): the corpus-wide length ranking is the two-level
    prefix sum (``with_global_rank``) and the corpus count a 1-row
    broadcast; only the per-SOURCE rank windows remain, and those are
    key-partitioned. One prefix-sum ranking + one index equi-join."""
    from graph_db_spark.operators.aggregates import with_global_rank

    docs = load_table(spark, sf_dir, "documents")
    g = with_global_rank(
        docs.select(F.col("n_chars").alias("v"), "doc_id"),
        [F.asc("v"), F.asc("doc_id")],
        rank_col="gi",
    ).select("v", "gi")
    s = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("ns"),
    )
    gn = docs.agg(F.count(F.lit(1)).alias("gn"))
    m = s.crossJoin(F.broadcast(gn)).select(
        "doc_id",
        "source",
        "n_chars",
        F.when(F.col("ns") == 1, F.lit(1))
        .otherwise(
            (
                F.floor(
                    (F.col("rn") - 1.0)
                    / (F.col("ns") - 1.0)
                    * (F.col("gn") - 1)
                    + 0.5
                )
                + 1
            ).cast("bigint")
        )
        .alias("gidx"),
    )
    return m.join(g.select("gi", "v"), m.gidx == F.col("gi")).select(
        "doc_id",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("v").cast("bigint").alias("n_chars_normalized"),
    )


# ---------------------------------------------------------------------------
# r7 batch 5 — Welch t / Brown-Forsythe / SPRT / Katz walks /
# nominal assortativity
# ---------------------------------------------------------------------------


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
    |regions|² mixing matrix before any ratio — broadcast-joined
    dimensions, one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
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
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
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
        co.join(F.broadcast(na), on="ia")
        .join(F.broadcast(nc), on="ib")
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
    variance. The ONLY data-sized pass is the dimension-pair covariance
    aggregate (map-side combinable, 64² output rows); iteration then
    runs on the constant-size matrix. The 100 TB plan is therefore one
    shuffle of 4096 partial sums — the classic scalable-PCA shape
    (covariance first, eigen after)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        SIM._as_double(F.col("embedding")).alias("v"),
        F.col("vec_id").alias("rowid"),
    )
    dims = e.select(
        "rowid", F.posexplode("v").alias("pos0", "x")
    ).select("rowid", (F.col("pos0") + 1).alias("i"), "x")
    mu = dims.groupBy("i").agg(F.avg("x").alias("m"))
    b = dims.select(F.col("rowid"), F.col("i").alias("j"), F.col("x").alias("y"))
    cov = (
        dims.join(b, on="rowid")
        .groupBy("i", "j")
        .agg(F.avg(F.col("x") * F.col("y")).alias("exy"))
    )
    c = (
        cov.join(F.broadcast(mu.select(F.col("i"), F.col("m").alias("ma"))), on="i")
        .join(
            F.broadcast(mu.select(F.col("i").alias("j"), F.col("m").alias("mb"))),
            on="j",
        )
        .select("i", "j", (F.col("exy") - F.col("ma") * F.col("mb")).alias("c"))
    )
    # the 64x64 matrix feeds all 6 rounds + the Rayleigh step: checkpoint
    # so the data-sized covariance aggregate executes exactly once
    c = F.broadcast(c.localCheckpoint(eager=True))
    v = mu.select(
        F.col("i").alias("vi"),
        F.when(F.col("i") == 1, 1.0).otherwise(0.0).alias("vv"),
    )
    for _ in range(6):
        w = (
            c.join(v, F.col("j") == F.col("vi"))
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("vv")).alias("w"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v = w.crossJoin(F.broadcast(nrm)).select(
            F.col("i").alias("vi"), (F.col("w") / F.col("nrm")).alias("vv")
        )
    wl = (
        c.join(v, F.col("j") == F.col("vi"))
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("vv")).alias("w"))
    )
    ray = wl.join(v, F.col("i") == F.col("vi")).agg(
        F.sum(F.col("w") * F.col("vv")).alias("lambda1")
    )
    tr = c.filter(F.col("i") == F.col("j")).agg(F.sum("c").alias("trace"))
    return ray.crossJoin(tr).select(
        F.lit(64).cast("bigint").alias("dim"),
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
    absorbs."""
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
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
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
        pair.join(F.broadcast(ua), on="ta")
        .join(F.broadcast(ub), on="tb")
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


@register(
    "corpus_diversity_indices",
    oracle="""
    WITH g AS (
      SELECT source, count(*) * 1.0 AS n FROM documents GROUP BY 1
    ),
    t AS (SELECT sum(n) AS tot, count(*) AS k FROM g),
    p AS (SELECT n / t.tot AS p, t.k FROM g, t)
    SELECT CAST(max(k) AS BIGINT) AS n_sources,
           round(-sum(p * ln(p)), 4) + 0.0 AS shannon_entropy,
           round(exp(-sum(p * ln(p))), 4) + 0.0 AS effective_sources,
           round(1.0 - sum(p * p), 4) + 0.0 AS simpson_diversity,
           round(-sum(p * ln(p)) / ln(max(k)), 4) + 0.0 AS evenness
    FROM p
    """,
)
def corpus_diversity_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline — corpus-mix diversity indices over sources: Shannon
    entropy, its exponential (the effective number of sources — the
    honest 'how many sources do we REALLY have' that raw counts
    overstate under skew), Simpson's 1−Σp², and Pielou evenness.
    The mixture-design dashboard row that mixture_weights (which
    prescribes weights) and source_js_divergence (which compares
    content) read against. One aggregate over the |sources| row
    table."""
    g = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg((F.count(F.lit(1)) * 1.0).alias("n"))
    )
    t = g.agg(F.sum("n").alias("tot"), F.count(F.lit(1)).alias("k"))
    p = g.crossJoin(F.broadcast(t)).select((F.col("n") / F.col("tot")).alias("p"), "k")
    h = -F.sum(F.col("p") * F.log("p"))
    return p.agg(
        F.max("k").cast("bigint").alias("n_sources"),
        r4(h).alias("shannon_entropy"),
        r4(F.exp(h)).alias("effective_sources"),
        r4(1.0 - F.sum(F.col("p") * F.col("p"))).alias("simpson_diversity"),
        r4(h / F.log(F.max("k"))).alias("evenness"),
    )


@register(
    "open_order_backlog",
    oracle="""
    WITH iv AS (
      SELECT CAST(o.o_orderdate AS DATE) AS start_d,
             CAST(l.l_shipdate AS DATE) AS end_d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ),
    ev AS (
      SELECT start_d AS day, 1 AS delta FROM iv
      UNION ALL
      SELECT end_d, -1 FROM iv
    ),
    daily AS (SELECT day, sum(delta) AS d FROM ev GROUP BY 1),
    cum AS (
      SELECT day, sum(d) OVER (ORDER BY day) AS open_lines
      FROM daily
    ),
    mo AS (
      SELECT strftime(day, '%Y-%m') AS month,
             max(open_lines) AS peak, min(open_lines) AS trough,
             avg(open_lines * 1.0) AS avg_open
      FROM cum GROUP BY 1
    )
    SELECT month, CAST(peak AS BIGINT) AS peak_open,
           CAST(trough AS BIGINT) AS trough_open,
           round(avg_open, 4) + 0.0 AS avg_open
    FROM mo
    """,
)
def open_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operations — open-lineitem backlog (work-in-progress) over time
    by SWEEP LINE: each (orderdate, shipdate] interval becomes a +1/−1
    event, one cumsum over the daily event rollup yields the count of
    intervals stabbing every day — O(n) where the naive per-day
    interval-containment join is O(days·n). Monthly peak/trough/mean
    of the curve. The interval-stabbing primitive under capacity and
    concurrency questions at any scale; all counts integer until the
    final mean."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    iv = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.to_date("o_orderdate").alias("start_d"),
            F.to_date("l_shipdate").alias("end_d"),
        )
    )
    ev = iv.select(F.col("start_d").alias("day"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("end_d").alias("day"), F.lit(-1).alias("delta"))
    )
    daily = ev.groupBy("day").agg(F.sum("delta").alias("d"))
    cum = daily.select(
        "day", F.sum("d").over(Window.orderBy("day")).alias("open_lines")
    )
    mo = cum.groupBy(F.date_format("day", "yyyy-MM").alias("month")).agg(
        F.max("open_lines").cast("bigint").alias("peak_open"),
        F.min("open_lines").cast("bigint").alias("trough_open"),
        r4(F.avg(F.col("open_lines") * 1.0)).alias("avg_open"),
    )
    return mo


# ---------------------------------------------------------------------------
# r7 batch 10 — Kendall tau-b / Theil decomposition / NDCG retrieval eval
# ---------------------------------------------------------------------------


@register(
    "kendall_tau_b",
    oracle="""
    WITH ct AS (
      SELECT l_quantity AS x, l_discount AS y, count(*) AS n
      FROM lineitem GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.n * b.n AS w,
             CASE WHEN (a.x < b.x AND a.y < b.y)
                    OR (a.x > b.x AND a.y > b.y) THEN a.n * b.n ELSE 0 END AS c,
             CASE WHEN (a.x < b.x AND a.y > b.y)
                    OR (a.x > b.x AND a.y < b.y) THEN a.n * b.n ELSE 0 END AS d
      FROM ct a JOIN ct b
        ON a.x < b.x OR (a.x = b.x AND a.y < b.y)
    ),
    s AS (
      SELECT sum(c) AS nc, sum(d) AS nd FROM pairs
    ),
    t AS (
      SELECT sum(n) AS n,
             sum(n) * (sum(n) - 1) / 2 AS n0
      FROM ct
    ),
    tx AS (
      SELECT sum(g * (g - 1) / 2) AS t1 FROM
        (SELECT sum(n) AS g FROM ct GROUP BY x)
    ),
    ty AS (
      SELECT sum(g * (g - 1) / 2) AS t2 FROM
        (SELECT sum(n) AS g FROM ct GROUP BY y)
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(s.nc AS BIGINT) AS concordant,
           CAST(s.nd AS BIGINT) AS discordant,
           round((s.nc - s.nd)
                 / (sqrt((t.n0 - tx.t1) * 1.0) * sqrt((t.n0 - ty.t2) * 1.0)),
                 4) + 0.0 AS kendall_tau_b
    FROM s, t, tx, ty
    """,
)
def kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — Kendall's τ-b (quantity vs discount) via the
    CONTINGENCY-TABLE identity: concordant/discordant pair counts come
    from the |X|×|Y| distinct-value grid (50×11 cells → ~150k cell
    pairs), never the O(n²) row-pair space — the same collapse trick
    as the midrank family. Completes the correlation battery: Pearson
    (lineitem_correlations), Spearman (midranks), τ-b (pair
    concordance, the most tie-robust of the three). Everything integer
    until the final normalized division."""
    ct = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_quantity").alias("x"), F.col("l_discount").alias("y"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    b = ct.select(
        F.col("x").alias("bx"), F.col("y").alias("by"), F.col("n").alias("bn")
    )
    pairs = ct.join(
        F.broadcast(b),
        (F.col("x") < F.col("bx"))
        | ((F.col("x") == F.col("bx")) & (F.col("y") < F.col("by"))),
    )
    conc = (
        ((F.col("x") < F.col("bx")) & (F.col("y") < F.col("by")))
        | ((F.col("x") > F.col("bx")) & (F.col("y") > F.col("by")))
    )
    disc = (
        ((F.col("x") < F.col("bx")) & (F.col("y") > F.col("by")))
        | ((F.col("x") > F.col("bx")) & (F.col("y") < F.col("by")))
    )
    s = pairs.agg(
        F.sum(F.when(conc, F.col("n") * F.col("bn")).otherwise(0)).alias("nc"),
        F.sum(F.when(disc, F.col("n") * F.col("bn")).otherwise(0)).alias("nd"),
    )
    t = ct.agg(
        F.sum("n").alias("ntot"),
        (F.sum("n") * (F.sum("n") - 1) / 2).alias("n0"),
    )
    tx = (
        ct.groupBy("x").agg(F.sum("n").alias("g"))
        .agg(F.sum(F.col("g") * (F.col("g") - 1) / 2).alias("t1"))
    )
    ty = (
        ct.groupBy("y").agg(F.sum("n").alias("g"))
        .agg(F.sum(F.col("g") * (F.col("g") - 1) / 2).alias("t2"))
    )
    return (
        s.crossJoin(t).crossJoin(tx).crossJoin(ty)
        .select(
            F.col("ntot").cast("bigint").alias("n"),
            F.col("nc").cast("bigint").alias("concordant"),
            F.col("nd").cast("bigint").alias("discordant"),
            r4(
                (F.col("nc") - F.col("nd"))
                / (
                    F.sqrt((F.col("n0") - F.col("t1")) * 1.0)
                    * F.sqrt((F.col("n0") - F.col("t2")) * 1.0)
                )
            ).alias("kendall_tau_b"),
        )
    )


@register(
    "theil_index_decomposition",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nation, o.o_custkey AS cust,
             sum(o.o_totalprice) AS x
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT count(*) AS n, sum(x) AS sx FROM rev),
    overall AS (
      SELECT sum((x / tot.sx) * ln((x / tot.sx) * tot.n)) AS t_total
      FROM rev, tot
    ),
    pre AS (
      SELECT nation, x,
             sum(x) OVER (PARTITION BY nation) AS sg,
             count(*) OVER (PARTITION BY nation) AS ng
      FROM rev
    ),
    grp2 AS (
      SELECT nation, max(ng) AS ng, max(sg) AS sg,
             sum((x / sg) * ln((x / sg) * ng)) AS tg
      FROM pre GROUP BY 1
    ),
    within AS (
      SELECT sum((grp2.sg / tot.sx) * grp2.tg) AS t_within FROM grp2, tot
    ),
    between_g AS (
      SELECT sum((grp2.sg / tot.sx)
                 * ln((grp2.sg / tot.sx) / (grp2.ng * 1.0 / tot.n)))
               AS t_between
      FROM grp2, tot
    )
    SELECT round(overall.t_total, 4) + 0.0 AS theil_total,
           round(within.t_within, 4) + 0.0 AS theil_within,
           round(between_g.t_between, 4) + 0.0 AS theil_between,
           round(between_g.t_between / overall.t_total, 4) + 0.0
             AS between_share
    FROM overall, within, between_g
    """,
)
def theil_index_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — Theil T inequality index of customer revenue with
    its EXACT decomposition T = T_within + Σ s_g·ln(s_g/p_g): how much
    revenue inequality lives inside nations vs between them — the
    additively-decomposable question Gini (gini_concentration) cannot
    answer. One join + windowed group sums (windows in one pass,
    aggregation in the next — engines agree once the two are not
    nested); emissions are share-weighted ln ratios, drift-relative."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"), F.col("o_custkey").alias("cust")
        )
        .agg(F.sum("o_totalprice").alias("x"))
    )
    tot = rev.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
    rt = rev.crossJoin(F.broadcast(tot))
    overall = rt.agg(
        F.sum(
            (F.col("x") / F.col("sx")) * F.log((F.col("x") / F.col("sx")) * F.col("n"))
        ).alias("t_total")
    )
    wn = Window.partitionBy("nation")
    grp = rev.select(
        "nation",
        "x",
        F.sum("x").over(wn).alias("sg"),
        F.count(F.lit(1)).over(wn).alias("ng"),
    ).select(
        "nation",
        "sg",
        "ng",
        (
            (F.col("x") / F.col("sg"))
            * F.log((F.col("x") / F.col("sg")) * F.col("ng"))
        ).alias("tgi"),
    )
    grp2 = grp.groupBy("nation").agg(
        F.max("sg").alias("sg"), F.max("ng").alias("ng"), F.sum("tgi").alias("tg")
    )
    g2t = grp2.crossJoin(F.broadcast(tot))
    within = g2t.agg(
        F.sum((F.col("sg") / F.col("sx")) * F.col("tg")).alias("t_within")
    )
    between = g2t.agg(
        F.sum(
            (F.col("sg") / F.col("sx"))
            * F.log(
                (F.col("sg") / F.col("sx")) / (F.col("ng") * 1.0 / F.col("n"))
            )
        ).alias("t_between")
    )
    return (
        overall.crossJoin(within).crossJoin(between)
        .select(
            r4(F.col("t_total")).alias("theil_total"),
            r4(F.col("t_within")).alias("theil_within"),
            r4(F.col("t_between")).alias("theil_between"),
            r4(F.col("t_between") / F.col("t_total")).alias("between_share"),
        )
    )


_NDCG_DISC = [
    1.0 / (__import__("math").log(r + 1.0) / __import__("math").log(2.0))
    for r in range(1, 6)
]
_NDCG_IDCG = [sum(_NDCG_DISC[: k + 1]) for k in range(5)]


@register(
    "ndcg_label_retrieval",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
                      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[]))) AS nrm
               FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % 5 = 0),
    top5 AS (
      SELECT vec_id, label, rn,
             CASE WHEN nlabel = label THEN 1.0 ELSE 0.0 END AS rel
      FROM (
        SELECT a.vec_id, a.label, b.label AS nlabel,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_dot_product(a.v, b.v) / (a.nrm * b.nrm) DESC,
                          b.vec_id
               ) AS rn
        FROM q a JOIN e b ON a.vec_id <> b.vec_id
      ) WHERE rn <= 5
    ),
    dcg AS (
      SELECT vec_id, label,
             sum(rel * CASE rn
                 WHEN 1 THEN CAST({_NDCG_DISC[0]!r} AS DOUBLE)
                 WHEN 2 THEN CAST({_NDCG_DISC[1]!r} AS DOUBLE)
                 WHEN 3 THEN CAST({_NDCG_DISC[2]!r} AS DOUBLE)
                 WHEN 4 THEN CAST({_NDCG_DISC[3]!r} AS DOUBLE)
                 WHEN 5 THEN CAST({_NDCG_DISC[4]!r} AS DOUBLE) END) AS dcg,
             sum(rel) AS n_rel
      FROM top5 GROUP BY 1, 2
    ),
    ideal AS (
      SELECT vec_id, label, dcg, n_rel,
             CASE CAST(n_rel AS INTEGER)
                 WHEN 1 THEN CAST({_NDCG_IDCG[0]!r} AS DOUBLE)
                 WHEN 2 THEN CAST({_NDCG_IDCG[1]!r} AS DOUBLE)
                 WHEN 3 THEN CAST({_NDCG_IDCG[2]!r} AS DOUBLE)
                 WHEN 4 THEN CAST({_NDCG_IDCG[3]!r} AS DOUBLE)
                 WHEN 5 THEN CAST({_NDCG_IDCG[4]!r} AS DOUBLE) END AS idcg
      FROM dcg
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           round(avg(coalesce(dcg / idcg, 0.0)), 4) + 0.0 AS mean_ndcg_5,
           round(avg(n_rel) / 5.0, 4) + 0.0 AS mean_precision_5
    FROM ideal GROUP BY 1
    """,
)
def ndcg_label_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval eval — NDCG@5 and precision@5 of brute-force cosine
    retrieval with same-label as the binary relevance judgment, per
    class on the 1-in-5 query sample: the graded-position metric the
    recall bounds (ann_*_recall_bound) don't measure — not just 'did a
    relevant doc appear' but WHERE it ranked. Ideal DCG is the
    closed-form prefix sum over min(n_rel, 5) positions; queries with
    zero relevant neighbors score 0 (coalesce, not dropped). Same fold
    discipline and sample as knn_loo_label_eval. The five rank
    discounts 1/log2(r+1) and their IDCG prefix sums are Python-
    computed shared literals emitted into BOTH engines (the gumbel/
    katz convention — each engine's own ln(2) is an independent 1-ulp
    surface under round(,4))."""
    sqn = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", SIM._as_double(F.col("embedding")).alias("v")
    ).select("vec_id", "label", "v", sqn.alias("nrm"))
    q = e.filter(F.col("vec_id") % 5 == 0)
    b = e.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlabel"),
        F.col("v").alias("nv"),
        F.col("nrm").alias("nnrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("nv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = q.join(F.broadcast(b), F.col("vec_id") != F.col("nid")).select(
        "vec_id", "label", "nlabel",
        (dot / (F.col("nrm") * F.col("nnrm"))).alias("sim"), "nid",
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "nid")
    top5 = pairs.select("*", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= 5
    ).select(
        "vec_id",
        "label",
        "rn",
        F.when(F.col("nlabel") == F.col("label"), 1.0).otherwise(0.0).alias("rel"),
    )
    disc = F.element_at(
        F.array(*[F.lit(d) for d in _NDCG_DISC]), F.col("rn").cast("int")
    )
    dcg = top5.groupBy("vec_id", "label").agg(
        F.sum(F.col("rel") * disc).alias("dcg"),
        F.sum("rel").alias("n_rel"),
    )
    # closed-form ideal DCG over min(n_rel, 5) unit gains — shared literals
    idcg = F.when(
        F.col("n_rel") > 0,
        F.element_at(
            F.array(*[F.lit(d) for d in _NDCG_IDCG]), F.col("n_rel").cast("int")
        ),
    )
    ideal = dcg.select("vec_id", "label", "dcg", "n_rel", idcg.alias("idcg"))
    return ideal.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        r4(F.avg(F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)))).alias(
            "mean_ndcg_5"
        ),
        r4(F.avg("n_rel") / 5.0).alias("mean_precision_5"),
    )


# ---------------------------------------------------------------------------
# r7 batch 11 — Cohen's kappa / Gumbel EVT / runs test / Bland-Altman /
# Ljung-Box
# ---------------------------------------------------------------------------


@register(
    "cohens_kappa_raters",
    oracle=f"""
    WITH r AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS gold,
             CASE WHEN len(list_distinct(list_intersect(
                    list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
                    {{sw_en}}))) >= 2 THEN 1 ELSE 0 END AS pred
      FROM documents
    ),
    ct AS (
      SELECT sum(CASE WHEN gold = 1 AND pred = 1 THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN gold = 1 AND pred = 0 THEN 1 ELSE 0 END) AS b,
             sum(CASE WHEN gold = 0 AND pred = 1 THEN 1 ELSE 0 END) AS c,
             sum(CASE WHEN gold = 0 AND pred = 0 THEN 1 ELSE 0 END) AS d,
             count(*) * 1.0 AS n
      FROM r
    )
    SELECT CAST(a AS BIGINT) AS both_en, CAST(b AS BIGINT) AS gold_only,
           CAST(c AS BIGINT) AS pred_only, CAST(d AS BIGINT) AS neither,
           round((a + d) / n, 4) + 0.0 AS observed_agreement,
           round(((a + b) * (a + c) + (c + d) * (b + d)) / (n * n), 4) + 0.0
             AS expected_agreement,
           round(((a + d) / n - ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n))
                 / (1.0 - ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)),
                 4) + 0.0 AS cohens_kappa
    FROM ct
    """.format(sw_en=_SW_SQL["en"]),
)
def cohens_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annotation QA — Cohen's κ between the gold language label and the
    stopword-overlap English detector (≥2 distinct EN stopwords):
    chance-corrected agreement, the metric that exposes how much of a
    labeler's 'accuracy' is base-rate (raw agreement flatters any
    majority-class rater — κ does not). The 2×2 table is one aggregate;
    κ is scalar algebra on its margins. The labeling-pipeline QA row
    beside k_anonymity_audit and label_noise_screen."""
    from graph_db_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    sw = [F.lit(w) for w in TX.STOPWORDS["en"]]
    pred = (
        F.size(
            F.array_intersect(
                F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+")),
                F.array(*sw),
            )
        )
        >= 2
    )
    r = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("gold"),
        F.when(pred, 1).otherwise(0).alias("pred"),
    )
    ct = r.agg(
        F.sum(F.when((F.col("gold") == 1) & (F.col("pred") == 1), 1).otherwise(0)).alias("a"),
        F.sum(F.when((F.col("gold") == 1) & (F.col("pred") == 0), 1).otherwise(0)).alias("b"),
        F.sum(F.when((F.col("gold") == 0) & (F.col("pred") == 1), 1).otherwise(0)).alias("c"),
        F.sum(F.when((F.col("gold") == 0) & (F.col("pred") == 0), 1).otherwise(0)).alias("d"),
        (F.count(F.lit(1)) * 1.0).alias("n"),
    )
    po = (F.col("a") + F.col("d")) / F.col("n")
    pe = (
        (F.col("a") + F.col("b")) * (F.col("a") + F.col("c"))
        + (F.col("c") + F.col("d")) * (F.col("b") + F.col("d"))
    ) / (F.col("n") * F.col("n"))
    return ct.select(
        F.col("a").cast("bigint").alias("both_en"),
        F.col("b").cast("bigint").alias("gold_only"),
        F.col("c").cast("bigint").alias("pred_only"),
        F.col("d").cast("bigint").alias("neither"),
        r4(po).alias("observed_agreement"),
        r4(pe).alias("expected_agreement"),
        r4((po - pe) / (1.0 - pe)).alias("cohens_kappa"),
    )


_GUMBEL_K = __import__("math").sqrt(6.0) / __import__("math").pi
_GUMBEL_F30 = __import__("math").log(-__import__("math").log(1.0 - 1.0 / 30.0))
_GUMBEL_F365 = __import__("math").log(-__import__("math").log(1.0 - 1.0 / 365.0))


@register(
    "gumbel_extreme_value_fit",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, max(value) AS mx
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT count(*) AS n, avg(mx) AS m,
             sqrt((sum(mx * mx) - sum(mx) * sum(mx) / count(*))
                  / (count(*) - 1)) AS sd
      FROM daily
    ),
    fit AS (
      SELECT n, m, sd,
             sd * CAST({_GUMBEL_K!r} AS DOUBLE) AS beta,
             m - CAST(0.5772156649015329 AS DOUBLE)
               * (sd * CAST({_GUMBEL_K!r} AS DOUBLE)) AS mu
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(mu, 4) + 0.0 AS gumbel_mu,
           round(beta, 4) + 0.0 AS gumbel_beta,
           round(mu - beta * CAST({_GUMBEL_F30!r} AS DOUBLE), 4) + 0.0
             AS return_level_30d,
           round(mu - beta * CAST({_GUMBEL_F365!r} AS DOUBLE), 4) + 0.0
             AS return_level_365d
    FROM fit
    """,
)
def gumbel_extreme_value_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value theory — Gumbel fit to daily maxima of the event
    value stream by method of moments (β = σ√6/π, μ = x̄ − γβ), with
    30-day and 365-day return levels μ − β·ln(−ln(1−1/T)): 'how big a
    spike should we provision for' — the tail question quantiles of the
    raw distribution systematically underestimate (block maxima, not
    raw values, converge to Gumbel). One daily-max rollup + sufficient
    statistics; Euler-Mascheroni, √6/π, and the two ln(−ln(1−1/T))
    return-level factors are all Python-computed shared CAST-AS-DOUBLE
    literals emitted into BOTH engines (r7 advice — the katz/sprt
    convention; a 1-ulp libm difference in either factor times β can
    land on a round(,4) half-way boundary)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.max("value").alias("mx"))
    s = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("mx").alias("m"),
        F.sqrt(
            (F.sum(F.col("mx") * F.col("mx")) - F.sum("mx") * F.sum("mx") / F.count(F.lit(1)))
            / (F.count(F.lit(1)) - 1)
        ).alias("sd"),
    )
    beta = F.col("sd") * F.lit(_GUMBEL_K)
    mu = F.col("m") - 0.5772156649015329 * beta
    return s.select(
        F.col("n").cast("bigint").alias("n_days"),
        r4(mu).alias("gumbel_mu"),
        r4(beta).alias("gumbel_beta"),
        r4(mu - beta * F.lit(_GUMBEL_F30)).alias("return_level_30d"),
        r4(mu - beta * F.lit(_GUMBEL_F365)).alias("return_level_365d"),
    )


@register(
    "runs_test_randomness",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS y
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT day, y - lag(y) OVER (ORDER BY day) AS diff FROM daily
    ),
    sgn AS (
      SELECT day, CASE WHEN diff > 0 THEN 1 ELSE -1 END AS s
      FROM d WHERE diff IS NOT NULL AND diff <> 0
    ),
    runs AS (
      SELECT s, CASE WHEN s <> lag(s) OVER (ORDER BY day) THEN 1 ELSE 0 END AS chg
      FROM sgn
    ),
    agg AS (
      SELECT sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) * 1.0 AS n1,
             sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) * 1.0 AS n2,
             sum(coalesce(chg, 0)) + 1 AS r
      FROM runs
    )
    SELECT CAST(n1 AS BIGINT) AS n_up, CAST(n2 AS BIGINT) AS n_down,
           CAST(r AS BIGINT) AS n_runs,
           round(2.0 * n1 * n2 / (n1 + n2) + 1.0, 4) + 0.0 AS expected_runs,
           round((r - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 4) + 0.0
             AS runs_z
    FROM agg
    """,
)
def runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics — Wald-Wolfowitz runs test on the signs of daily
    revenue changes: too FEW runs = momentum/trending, too MANY =
    mean-reversion — the serial-independence check that corr-based ACF
    misses for nonlinear dependence. Runs are counted as sign-change
    events in one lag window (no sequential fold); the z uses the exact
    two-type runs moments. Zero diffs are dropped (tie handling stated,
    not implicit)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("y")
    )
    wo = Window.orderBy("day")
    d = daily.select("day", (F.col("y") - F.lag("y").over(wo)).alias("diff"))
    sgn = d.filter(F.col("diff").isNotNull() & (F.col("diff") != 0)).select(
        "day", F.when(F.col("diff") > 0, 1).otherwise(-1).alias("s")
    )
    runs = sgn.select(
        "s",
        F.when(F.col("s") != F.lag("s").over(wo), 1).otherwise(0).alias("chg"),
    )
    agg = runs.agg(
        (F.sum(F.when(F.col("s") == 1, 1).otherwise(0)) * 1.0).alias("n1"),
        (F.sum(F.when(F.col("s") == -1, 1).otherwise(0)) * 1.0).alias("n2"),
        (F.sum(F.coalesce("chg", F.lit(0))) + 1).alias("r"),
    )
    n1, n2, rr = F.col("n1"), F.col("n2"), F.col("r")
    er = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    vr = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return agg.select(
        n1.cast("bigint").alias("n_up"),
        n2.cast("bigint").alias("n_down"),
        rr.cast("bigint").alias("n_runs"),
        r4(er).alias("expected_runs"),
        r4((rr - er) / F.sqrt(vr)).alias("runs_z"),
    )


@register(
    "bland_altman_agreement",
    oracle="""
    WITH m AS (
      SELECT l.l_extendedprice AS a, p.p_retailprice * l.l_quantity AS b
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    s AS (
      SELECT count(*) AS n, avg(a - b) AS bias,
             sqrt((sum((a - b) * (a - b))
                   - sum(a - b) * sum(a - b) / count(*))
                  / (count(*) - 1)) AS sd,
             corr(a, b) AS r
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(bias, 4) + 0.0 AS mean_bias,
           round(bias - 1.96 * sd, 4) + 0.0 AS loa_lower,
           round(bias + 1.96 * sd, 4) + 0.0 AS loa_upper,
           round(r, 4) + 0.0 AS pearson_r
    FROM s
    """,
)
def bland_altman_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measurement QA — Bland-Altman agreement between two price
    'instruments' (billed extendedprice vs catalog retailprice ×
    quantity): mean bias and 95% limits of agreement, the method-
    comparison analysis correlation alone cannot do (two measures can
    correlate 0.99 and still disagree by a systematic offset — BA
    shows it, r hides it). One broadcast-joined aggregate of
    sufficient statistics."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    m = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("l_extendedprice").alias("a"),
        (F.col("p_retailprice") * F.col("l_quantity")).alias("b"),
    )
    diff = F.col("a") - F.col("b")
    s = m.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(diff).alias("bias"),
        F.sqrt(
            (F.sum(diff * diff) - F.sum(diff) * F.sum(diff) / F.count(F.lit(1)))
            / (F.count(F.lit(1)) - 1)
        ).alias("sd"),
        F.corr("a", "b").alias("r"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        r4(F.col("bias")).alias("mean_bias"),
        r4(F.col("bias") - 1.96 * F.col("sd")).alias("loa_lower"),
        r4(F.col("bias") + 1.96 * F.col("sd")).alias("loa_upper"),
        r4(F.col("r")).alias("pearson_r"),
    )


def _ljung_box_sql(max_lag: int = 10) -> str:
    """Ljung-Box on the daily revenue series using the pairwise-corr ACF
    variant (matching autocorrelation_lags): lag columns from one
    window sort, one corr() per lag, Q = n(n+2)·Σ r_k²/(n−k)."""
    lags = ",\n             ".join(
        f"lag(y, {k}) OVER (ORDER BY day) AS y{k}" for k in range(1, max_lag + 1)
    )
    corrs = ", ".join(f"corr(y, y{k}) AS c{k}" for k in range(1, max_lag + 1))
    qsum = " + ".join(f"c{k} * c{k} / (n - {k})" for k in range(1, max_lag + 1))
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS y
      FROM orders GROUP BY 1
    ),
    l AS (
      SELECT day, y,
             {lags}
      FROM daily
    ),
    a AS (SELECT count(*) * 1.0 AS n, {corrs} FROM l)
    SELECT CAST(n AS BIGINT) AS n_days, CAST({max_lag} AS BIGINT) AS df,
           round(n * (n + 2.0) * ({qsum}), 4) + 0.0 AS ljung_box_q
    FROM a
    """


@register("ljung_box_q", oracle=_ljung_box_sql())
def ljung_box_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time series — Ljung-Box portmanteau statistic Q = n(n+2)·Σ
    r_k²/(n−k) over lags 1..10 of daily revenue: the single-number
    'is there ANY residual autocorrelation' test that reads the whole
    ACF head at once (autocorrelation_lags shows the individual r_k;
    this is their calibrated sum — the standard residual-whiteness
    check after fitting holt/theil-sen trends). ACF via the same
    pairwise-corr lag-column pattern: one window sort, ten corr
    aggregates, no self-joins."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("y")
    )
    wo = Window.orderBy("day")
    cols = ["day", "y"] + [
        F.lag("y", k).over(wo).alias(f"y{k}") for k in range(1, 11)
    ]
    l = daily.select(*cols)
    aggs = [(F.count(F.lit(1)) * 1.0).alias("n")] + [
        F.corr("y", f"y{k}").alias(f"c{k}") for k in range(1, 11)
    ]
    a = l.agg(*aggs)
    q = F.col("n") * (F.col("n") + 2.0) * sum(
        F.col(f"c{k}") * F.col(f"c{k}") / (F.col("n") - k) for k in range(1, 11)
    )
    return a.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.lit(10).cast("bigint").alias("df"),
        r4(q).alias("ljung_box_q"),
    )


# ---------------------------------------------------------------------------
# r7 batch 12 — SPC individuals chart / growth accounting / VaR-CVaR
# ---------------------------------------------------------------------------


@register(
    "spc_individuals_chart",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, avg(value) AS x
      FROM events GROUP BY 1
    ),
    mr AS (
      SELECT day, x, abs(x - lag(x) OVER (ORDER BY day)) AS r
      FROM daily
    ),
    lim AS (
      SELECT avg(x) AS cl, avg(r) AS mrbar FROM mr
    )
    SELECT strftime(mr.day, '%Y-%m-%d') AS day_date,
           round(mr.x, 4) + 0.0 AS x,
           round(lim.cl, 4) + 0.0 AS center,
           round(lim.cl + 2.66 * lim.mrbar, 4) + 0.0 AS ucl,
           round(lim.cl - 2.66 * lim.mrbar, 4) + 0.0 AS lcl,
           CAST(CASE WHEN mr.x > lim.cl + 2.66 * lim.mrbar
                       OR mr.x < lim.cl - 2.66 * lim.mrbar
                     THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
    FROM mr, lim
    """,
)
def spc_individuals_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality engineering — Shewhart individuals (X-MR) control chart
    on daily mean event value: control limits CL ± 2.66·M̄R from the
    average moving range (the d2-based short-term sigma estimate — NOT
    the overall stddev, which long-term drift inflates and which would
    hide exactly the shifts the chart exists to catch), with per-day
    out-of-control flags. One daily rollup + one lag window + a
    broadcast scalar row of limits."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.avg("value").alias("x"))
    wo = Window.orderBy("day")
    mr = daily.select(
        "day", "x", F.abs(F.col("x") - F.lag("x").over(wo)).alias("r")
    )
    lim = mr.agg(F.avg("x").alias("cl"), F.avg("r").alias("mrbar"))
    j = mr.crossJoin(F.broadcast(lim))
    ucl = F.col("cl") + 2.66 * F.col("mrbar")
    lcl = F.col("cl") - 2.66 * F.col("mrbar")
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day_date"),
        r4(F.col("x")).alias("x"),
        r4(F.col("cl")).alias("center"),
        r4(ucl).alias("ucl"),
        r4(lcl).alias("lcl"),
        F.when((F.col("x") > ucl) | (F.col("x") < lcl), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("out_of_control"),
    )


@register(
    "growth_accounting_weekly",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS wk
      FROM events WHERE event_type = 'purchase' AND value >= 60
    ),
    firsts AS (SELECT user_id, min(wk) AS first_wk FROM uw GROUP BY 1),
    flags AS (
      SELECT uw.user_id, uw.wk, firsts.first_wk,
             lag(uw.wk) OVER (PARTITION BY uw.user_id ORDER BY uw.wk) AS prev_wk
      FROM uw JOIN firsts USING (user_id)
    ),
    cls AS (
      SELECT wk,
             CASE WHEN wk = first_wk THEN 'new'
                  WHEN prev_wk = wk - INTERVAL 7 DAY THEN 'retained'
                  ELSE 'resurrected' END AS kind
      FROM flags
    ),
    act AS (
      SELECT wk, CAST(count(*) AS BIGINT) AS active,
             CAST(sum(CASE WHEN kind = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
             CAST(sum(CASE WHEN kind = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
               AS retained,
             CAST(sum(CASE WHEN kind = 'resurrected' THEN 1 ELSE 0 END)
                  AS BIGINT) AS resurrected
      FROM cls GROUP BY 1
    ),
    churn AS (
      SELECT a.wk + INTERVAL 7 DAY AS wk, count(*) AS c FROM uw a
      LEFT JOIN uw b ON a.user_id = b.user_id
                    AND b.wk = a.wk + INTERVAL 7 DAY
      WHERE b.user_id IS NULL
      GROUP BY 1
    )
    SELECT strftime(act.wk, '%Y-%m-%d') AS week_start, act.active,
           act.new_users, act.retained, act.resurrected,
           CAST(coalesce(churn.c, 0) AS BIGINT) AS churned_into_week
    FROM act LEFT JOIN churn ON act.wk = churn.wk
    """,
)
def growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product analytics — weekly growth accounting over a
    non-saturating activity definition (a high-value purchase that
    week — raw any-event activity is ~100% weekly on this fixture and
    would flatten the decomposition): every active user classified
    new / retained / resurrected (first week, consecutive week,
    gap-return), plus how many of last week's actives churned
    into this week — the decomposition behind 'are we growing or just
    churning', which the raw active count (streaming_daily_stats) and
    diagonal retention (cohort_retention) don't isolate. One distinct
    user-week rollup, one per-user lag window, one anti-join for
    churn."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("value") >= 60)
    )
    uw = ev.select(
        "user_id", F.date_trunc("week", F.to_date("ts")).cast("date").alias("wk")
    ).distinct()
    firsts = uw.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    wlag = Window.partitionBy("user_id").orderBy("wk")
    flags = uw.join(firsts, on="user_id").select(
        "user_id", "wk", "first_wk", F.lag("wk").over(wlag).alias("prev_wk")
    )
    cls = flags.select(
        "wk",
        F.when(F.col("wk") == F.col("first_wk"), "new")
        .when(F.col("prev_wk") == F.date_sub("wk", 7), "retained")
        .otherwise("resurrected")
        .alias("kind"),
    )
    act = cls.groupBy("wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("active"),
        F.sum(F.when(F.col("kind") == "new", 1).otherwise(0))
        .cast("bigint")
        .alias("new_users"),
        F.sum(F.when(F.col("kind") == "retained", 1).otherwise(0))
        .cast("bigint")
        .alias("retained"),
        F.sum(F.when(F.col("kind") == "resurrected", 1).otherwise(0))
        .cast("bigint")
        .alias("resurrected"),
    )
    nxt = uw.select(
        F.col("user_id").alias("bu"), F.col("wk").alias("bwk")
    )
    churn = (
        uw.join(
            nxt,
            (F.col("user_id") == F.col("bu"))
            & (F.col("bwk") == F.date_add("wk", 7)),
            "left",
        )
        .filter(F.col("bu").isNull())
        .groupBy(F.date_add("wk", 7).alias("wk"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return act.join(churn, on="wk", how="left").select(
        F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
        "active",
        "new_users",
        "retained",
        "resurrected",
        F.coalesce("c", F.lit(0)).cast("bigint").alias("churned_into_week"),
    )


@register(
    "revenue_var_cvar",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS y
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT y - lag(y) OVER (ORDER BY day) AS chg FROM daily
    ),
    v AS (
      SELECT count(*) AS n, quantile_cont(chg, 0.05) AS var95
      FROM d WHERE chg IS NOT NULL
    ),
    es AS (
      SELECT avg(chg) AS cvar95, count(*) AS n_tail
      FROM d, v WHERE chg IS NOT NULL AND chg <= v.var95
    )
    SELECT CAST(v.n AS BIGINT) AS n_days,
           round(v.var95, 4) + 0.0 AS var_95,
           round(es.cvar95, 4) + 0.0 AS cvar_95,
           CAST(es.n_tail AS BIGINT) AS n_tail_days
    FROM v, es
    """,
)
def revenue_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Risk — 95% value-at-risk and conditional VaR (expected
    shortfall) of day-over-day revenue changes: the 5th-percentile
    drawdown and the MEAN of everything at or beyond it — CVaR is the
    coherent tail measure VaR alone is not (VaR says where the tail
    starts, CVaR how bad it is inside). Interpolating percentile
    (established cross-engine parity) + one filtered tail
    aggregate."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("y")
    )
    d = daily.select(
        (F.col("y") - F.lag("y").over(Window.orderBy("day"))).alias("chg")
    ).filter(F.col("chg").isNotNull())
    v = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(chg, 0.05)").alias("var95"),
    )
    es = d.crossJoin(F.broadcast(v)).filter(F.col("chg") <= F.col("var95")).agg(
        F.avg("chg").alias("cvar95"), F.count(F.lit(1)).alias("n_tail")
    )
    return v.crossJoin(es).select(
        F.col("n").cast("bigint").alias("n_days"),
        r4(F.col("var95")).alias("var_95"),
        r4(F.col("cvar95")).alias("cvar_95"),
        F.col("n_tail").cast("bigint").alias("n_tail_days"),
    )


# ---------------------------------------------------------------------------
# r7 batch 13 — difference-in-differences / grouped regression aggregates
# ---------------------------------------------------------------------------


@register(
    "diff_in_diff_uplift",
    oracle="""
    WITH cut AS (
      SELECT quantile_cont(date_diff('day', DATE '1970-01-01',
                                     CAST(o_orderdate AS DATE)), 0.5) AS c
      FROM orders
    ),
    j AS (
      SELECT o.o_totalprice AS y,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treat,
             CASE WHEN date_diff('day', DATE '1970-01-01',
                                 CAST(o.o_orderdate AS DATE)) >= cut.c
                  THEN 1 ELSE 0 END AS post
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey, cut
    ),
    g AS (
      SELECT treat, post, count(*) AS n, avg(y) AS m FROM j GROUP BY 1, 2
    )
    SELECT
      CAST((SELECT n FROM g WHERE treat = 1 AND post = 0) AS BIGINT) AS n_treat_pre,
      CAST((SELECT n FROM g WHERE treat = 1 AND post = 1) AS BIGINT) AS n_treat_post,
      round((SELECT m FROM g WHERE treat = 1 AND post = 0), 4) + 0.0 AS treat_pre,
      round((SELECT m FROM g WHERE treat = 1 AND post = 1), 4) + 0.0 AS treat_post,
      round((SELECT m FROM g WHERE treat = 0 AND post = 0), 4) + 0.0 AS control_pre,
      round((SELECT m FROM g WHERE treat = 0 AND post = 1), 4) + 0.0 AS control_post,
      round(((SELECT m FROM g WHERE treat = 1 AND post = 1)
             - (SELECT m FROM g WHERE treat = 1 AND post = 0))
            - ((SELECT m FROM g WHERE treat = 0 AND post = 1)
               - (SELECT m FROM g WHERE treat = 0 AND post = 0)), 4) + 0.0
        AS did_estimate
    """,
)
def diff_in_diff_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal inference — difference-in-differences on order value:
    BUILDING-segment customers as the treated group, the median order
    date (integer day number — no timezone surface) as the policy
    cutoff, DiD = (T_post − T_pre) − (C_post −
    C_pre) — the parallel-trends estimator that subtracts out both the
    group baseline and the common time shock, which the raw post-mean
    comparison (welch_t_test) conflates. One join + one 2×2 group
    aggregate; the cutoff is a broadcast scalar quantile."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    days = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    cut = o.agg(
        F.expr(
            "percentile(datediff(to_date(o_orderdate), date'1970-01-01'), 0.5)"
        ).alias("cut")
    )
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .crossJoin(F.broadcast(cut))
        .select(
            F.col("o_totalprice").alias("y"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("treat"),
            F.when(days >= F.col("cut"), 1).otherwise(0).alias("post"),
        )
    )
    g = j.groupBy("treat", "post").agg(
        F.count(F.lit(1)).alias("n"), F.avg("y").alias("m")
    )
    g2 = g.agg(
        F.max(F.when((F.col("treat") == 1) & (F.col("post") == 0), F.col("n"))).alias("n_tp"),
        F.max(F.when((F.col("treat") == 1) & (F.col("post") == 1), F.col("n"))).alias("n_tq"),
        F.max(F.when((F.col("treat") == 1) & (F.col("post") == 0), F.col("m"))).alias("tp"),
        F.max(F.when((F.col("treat") == 1) & (F.col("post") == 1), F.col("m"))).alias("tq"),
        F.max(F.when((F.col("treat") == 0) & (F.col("post") == 0), F.col("m"))).alias("cp"),
        F.max(F.when((F.col("treat") == 0) & (F.col("post") == 1), F.col("m"))).alias("cq"),
    )
    return g2.select(
        F.col("n_tp").cast("bigint").alias("n_treat_pre"),
        F.col("n_tq").cast("bigint").alias("n_treat_post"),
        r4(F.col("tp")).alias("treat_pre"),
        r4(F.col("tq")).alias("treat_post"),
        r4(F.col("cp")).alias("control_pre"),
        r4(F.col("cq")).alias("control_post"),
        r4(
            (F.col("tq") - F.col("tp")) - (F.col("cq") - F.col("cp"))
        ).alias("did_estimate"),
    )


@register(
    "brand_price_elasticity",
    oracle="""
    WITH pp AS (
      SELECT p.p_brand AS brand, l.l_partkey,
             ln(avg(l.l_extendedprice / l.l_quantity)) AS ln_p,
             ln(sum(l.l_quantity)) AS ln_q
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    )
    SELECT brand, CAST(count(*) AS BIGINT) AS n_parts,
           round(regr_slope(ln_q, ln_p), 4) + 0.0 AS elasticity,
           round(regr_intercept(ln_q, ln_p), 4) + 0.0 AS intercept,
           round(regr_r2(ln_q, ln_p), 4) + 0.0 AS r2
    FROM pp GROUP BY 1
    """,
)
def brand_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Econometrics — log-log price elasticity per brand via the
    BUILT-IN regression aggregates (regr_slope/intercept/r2 — the
    one-pass co-moment machines both engines ship): across a brand's
    parts, how does log demand respond to log unit price? Showcases
    grouped closed-form regression (ols_normal_equations is the
    multi-feature hand-rolled form; this is the per-group built-in
    form a 100 TB pipeline reaches for first — one shuffle, no
    driver math)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "l_partkey")
        .agg(
            F.log(F.avg(F.col("l_extendedprice") / F.col("l_quantity"))).alias(
                "ln_p"
            ),
            F.log(F.sum("l_quantity")).alias("ln_q"),
        )
    )
    return pp.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        r4(F.expr("regr_slope(ln_q, ln_p)")).alias("elasticity"),
        r4(F.expr("regr_intercept(ln_q, ln_p)")).alias("intercept"),
        r4(F.expr("regr_r2(ln_q, ln_p)")).alias("r2"),
    )


# ---------------------------------------------------------------------------
# r9 additions — registration freeze lifted (never-driver-checked pool back
# under one window at r9 open). 13 new queries: survival (Nelson-Aalen),
# LM smoothing (Kneser-Ney), ML screening (information gain, regression
# stump), calibration (Brier decomposition), marketing science (cumulative
# gains, position-based attribution), resampling (jackknife), multiple
# testing (Benjamini-Hochberg), BI classification (ABC), LLM-data curation
# (filter cascade), data-analysis audit (Simpson's paradox), and causal
# inference (quantile treatment effects). Every name is in the r9
# _GATE_WINDOW (tests/test_oracles.py pins the partition).
# ---------------------------------------------------------------------------


@register(
    "nelson_aalen_hazard",
    oracle="""
    WITH span AS (
      SELECT user_id,
             min(ts) AS first_ts,
             arg_min(event_type, strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                     || '#' || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS cohort
      FROM events GROUP BY 1
    ),
    conv AS (
      SELECT user_id, min(ts) AS conv_ts FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    horizon AS (SELECT max(ts) AS h FROM events),
    obs AS (
      SELECT s.cohort,
             CASE WHEN c.user_id IS NOT NULL
                  THEN CAST(date_diff('day', s.first_ts, c.conv_ts) AS BIGINT)
                  ELSE CAST(date_diff('day', s.first_ts, h) AS BIGINT) END AS t,
             CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END AS death
      FROM span s LEFT JOIN conv c USING (user_id) CROSS JOIN horizon
    ),
    tot AS (SELECT cohort, count(*) AS n FROM obs GROUP BY 1),
    dt AS (
      SELECT cohort, t,
             CAST(sum(death) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS ended
      FROM obs GROUP BY 1, 2
    ),
    risk AS (
      SELECT cohort, t, d,
             tot.n - coalesce(sum(ended) OVER (PARTITION BY cohort ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM dt JOIN tot USING (cohort)
    ),
    na AS (
      SELECT cohort, t, n_risk, d,
             sum(d * 1.0 / n_risk) OVER (PARTITION BY cohort ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h,
             sum(d * 1.0 / (n_risk * n_risk)) OVER (PARTITION BY cohort ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
      FROM risk WHERE d > 0
    )
    SELECT cohort, t AS t_days, CAST(n_risk AS BIGINT) AS n_risk, d AS d_events,
           round(h, 4) + 0.0 AS cum_hazard,
           round(sqrt(v), 4) + 0.0 AS hazard_se
    FROM na
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival analysis — Nelson-Aalen cumulative-hazard estimator,
    Kaplan-Meier's additive sibling (H(t) = Σ d_i/n_i with variance
    Σ d_i/n_i², vs KM's multiplicative S(t)): per cohort (the user's
    first event type), time to FIRST purchase of any value, censored at
    the observation horizon. The preferred estimator when hazards are
    the modeling target (Cox baselines, hazard-ratio sanity checks) and
    small risk sets make KM's product unstable. Same distributed shape
    as kaplan_meier_churn: everything reduces to per-(cohort, day)
    integer counts, the at-risk counts are a right-aligned cumulative
    over the bounded per-cohort day grid, and the hazard sums are
    ordered windows over those — each d/n term is an integer ratio, so
    both engines walk bit-identical partial sums."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    span = (
        ev.withColumn("cohort", F.first("event_type").over(w))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.first("cohort").alias("cohort"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    h = ev.agg(F.max("ts").alias("h"))
    obs = (
        span.join(conv, on="user_id", how="left")
        .crossJoin(F.broadcast(h))
        .select(
            "cohort",
            F.when(
                F.col("conv_ts").isNotNull(),
                F.datediff(F.col("conv_ts"), F.col("first_ts")),
            )
            .otherwise(F.datediff(F.col("h"), F.col("first_ts")))
            .cast("bigint")
            .alias("t"),
            F.when(F.col("conv_ts").isNotNull(), 1).otherwise(0).alias("death"),
        )
    )
    tot = obs.groupBy("cohort").agg(F.count(F.lit(1)).alias("n"))
    dt = obs.groupBy("cohort", "t").agg(
        F.sum("death").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("ended"),
    )
    wprev = (
        Window.partitionBy("cohort").orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = dt.join(tot, on="cohort").select(
        "cohort", "t", "d",
        (F.col("n") - F.coalesce(F.sum("ended").over(wprev), F.lit(0))).alias("n_risk"),
    )
    wna = (
        Window.partitionBy("cohort").orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    )
    na = risk.filter(F.col("d") > 0).select(
        "cohort", "t", "n_risk", "d",
        F.sum(F.col("d") * 1.0 / F.col("n_risk")).over(wna).alias("h_cum"),
        F.sum(F.col("d") * 1.0 / (F.col("n_risk") * F.col("n_risk")))
        .over(wna)
        .alias("v_cum"),
    )
    return na.select(
        "cohort",
        F.col("t").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").alias("d_events"),
        r4(F.col("h_cum")).alias("cum_hazard"),
        r4(F.sqrt(F.col("v_cum"))).alias("hazard_se"),
    )


@register(
    "simpson_paradox_check",
    oracle="""
    WITH base AS MATERIALIZED (
      SELECT c_mktsegment AS seg,
             CASE WHEN l_discount >= CAST(0.05 AS DOUBLE) THEN 1 ELSE 0 END AS hi,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
    ),
    strat AS (
      SELECT seg AS stratum, count(*) AS n,
             sum(hi) AS n_hi, sum(hi * ret) AS r_hi,
             sum(1 - hi) AS n_lo, sum((1 - hi) * ret) AS r_lo
      FROM base GROUP BY 1
      UNION ALL
      SELECT 'ALL', count(*), sum(hi), sum(hi * ret),
             sum(1 - hi), sum((1 - hi) * ret)
      FROM base
    ),
    rates AS (
      SELECT stratum, n,
             r_hi * 1.0 / n_hi AS rate_hi, r_lo * 1.0 / n_lo AS rate_lo,
             r_hi * 1.0 / n_hi - r_lo * 1.0 / n_lo AS gap
      FROM strat
    ),
    agg AS (SELECT CASE WHEN gap > 0 THEN 1 WHEN gap < 0 THEN -1 ELSE 0 END AS s
            FROM rates WHERE stratum = 'ALL')
    SELECT stratum, CAST(n AS BIGINT) AS n,
           round(rate_hi, 4) + 0.0 AS rate_high,
           round(rate_lo, 4) + 0.0 AS rate_low,
           round(gap, 4) + 0.0 AS gap,
           CAST(CASE WHEN gap > 0 THEN 1 WHEN gap < 0 THEN -1 ELSE 0 END
                AS BIGINT) AS direction,
           CAST(CASE WHEN stratum = 'ALL' THEN 0
                     WHEN (CASE WHEN gap > 0 THEN 1 WHEN gap < 0 THEN -1
                           ELSE 0 END) * agg.s < 0 THEN 1 ELSE 0 END
                AS BIGINT) AS reversed
    FROM rates CROSS JOIN agg
    """,
)
def simpson_paradox_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-analysis audit — Simpson's-paradox screen: the association
    between high discounting (>= 0.05) and return rate, measured on the
    AGGREGATE and within each market-segment stratum, flagging strata
    whose association direction REVERSES the aggregate's (the classic
    confounding trap every metrics dashboard should run before shipping
    a 'discounts cause returns' conclusion). Pure grouped counting —
    rates are integer ratios so both engines compute identical doubles
    and the direction sign is deterministic, no rounding involved in
    the flag. One fact scan, one broadcast dimension chain, a 6-row
    result at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("hi"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
        )
        .localCheckpoint()  # stratum + aggregate passes share one materialization
    )

    def _rates(df: DataFrame, label_col: Column) -> DataFrame:
        return df.groupBy(label_col.alias("stratum")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("hi").alias("n_hi"),
            F.sum(F.col("hi") * F.col("ret")).alias("r_hi"),
            F.sum(1 - F.col("hi")).alias("n_lo"),
            F.sum((1 - F.col("hi")) * F.col("ret")).alias("r_lo"),
        )

    strat = _rates(base, F.col("seg")).unionByName(_rates(base, F.lit("ALL")))
    gap = F.col("r_hi") * 1.0 / F.col("n_hi") - F.col("r_lo") * 1.0 / F.col("n_lo")
    sgn = F.when(gap > 0, 1).when(gap < 0, -1).otherwise(0)
    rates = strat.select(
        "stratum",
        F.col("n").cast("bigint").alias("n"),
        (F.col("r_hi") * 1.0 / F.col("n_hi")).alias("rate_hi"),
        (F.col("r_lo") * 1.0 / F.col("n_lo")).alias("rate_lo"),
        gap.alias("gap"),
        sgn.cast("bigint").alias("direction"),
    )
    agg_s = rates.filter(F.col("stratum") == "ALL").select(
        F.col("direction").alias("_aggs")
    )
    return rates.crossJoin(F.broadcast(agg_s)).select(  # 1-row scalar attach
        "stratum",
        "n",
        r4(F.col("rate_hi")).alias("rate_high"),
        r4(F.col("rate_lo")).alias("rate_low"),
        r4(F.col("gap")).alias("gap"),
        "direction",
        F.when(F.col("stratum") == "ALL", 0)
        .when(F.col("direction") * F.col("_aggs") < 0, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("reversed"),
    )


@register(
    "jackknife_ratio_variance",
    oracle="""
    WITH pv AS MATERIALIZED (
      SELECT c_nationkey AS nat,
             sum(CASE WHEN l_returnflag = 'R'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END) AS a,
             sum(l_extendedprice * (1 - l_discount)) AS b
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY 1
    ),
    tot AS (SELECT sum(a) AS ta, sum(b) AS tb, count(*) AS g FROM pv),
    ps AS (
      SELECT g, ta, tb, (ta - a) / (tb - b) AS r
      FROM pv CROSS JOIN tot
    ),
    st AS (
      SELECT g, ta, tb, avg(r) AS rbar,
             sum(r * r) - count(*) * avg(r) * avg(r) AS ssq
      FROM ps GROUP BY 1, 2, 3
    )
    SELECT CAST(g AS BIGINT) AS n_groups,
           round(ta / tb, 4) + 0.0 AS ratio,
           round(rbar, 4) + 0.0 AS jackknife_mean,
           round((g - 1) * (rbar - ta / tb), 4) + 0.0 AS jackknife_bias,
           round(sqrt((g - 1) * 1.0 / g * greatest(ssq, CAST(0 AS DOUBLE))),
                 4) + 0.0 AS jackknife_se
    FROM st
    """,
)
def jackknife_ratio_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resampling statistics — delete-one-group jackknife for a RATIO
    estimator (returned revenue / total revenue, groups = customer
    nations): the standard error survey statistics attaches to any
    nonlinear estimator whose closed-form variance doesn't exist. The
    whole resample is algebra over per-group totals — delete-group
    pseudovalues R₍ᵢ₎ = (A−aᵢ)/(B−bᵢ) come from ONE grouped pass plus a
    broadcast of the grand totals, never a second scan per replicate,
    so 10⁹ rows jackknife as one shuffle + a 25-row reduction (the
    at-scale answer to 'bootstrap needs 1000 passes'). Σ(r−r̄)² uses the
    same one-pass Σr²−g·r̄² form on both sides; all emissions rounded.
    The one-pass form is cancellation-prone (pseudovalues cluster
    tightly around the ratio), and FP noise could drive ssq slightly
    NEGATIVE — where DuckDB sqrt(negative) raises while Spark returns
    NaN, an asymmetric cross-engine failure. Both sqrt inputs are
    guarded with greatest(ssq, 0)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pv = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nat"))
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", rev).otherwise(0.0)).alias("a"),
            F.sum(rev).alias("b"),
        )
    )
    tot = pv.agg(
        F.sum("a").alias("ta"), F.sum("b").alias("tb"), F.count(F.lit(1)).alias("g")
    )
    ps = pv.crossJoin(F.broadcast(tot)).select(  # 1-row scalar attach
        "g", "ta", "tb",
        ((F.col("ta") - F.col("a")) / (F.col("tb") - F.col("b"))).alias("r"),
    )
    st = ps.groupBy("g", "ta", "tb").agg(
        F.avg("r").alias("rbar"),
        (
            F.sum(F.col("r") * F.col("r"))
            - F.count(F.lit(1)) * F.avg("r") * F.avg("r")
        ).alias("ssq"),
    )
    return st.select(
        F.col("g").cast("bigint").alias("n_groups"),
        r4(F.col("ta") / F.col("tb")).alias("ratio"),
        r4(F.col("rbar")).alias("jackknife_mean"),
        r4((F.col("g") - 1) * (F.col("rbar") - F.col("ta") / F.col("tb"))).alias(
            "jackknife_bias"
        ),
        r4(
            F.sqrt(
                (F.col("g") - 1) * F.lit(1.0) / F.col("g")
                * F.greatest(F.col("ssq"), F.lit(0.0))
            )
        ).alias("jackknife_se"),
    )


@register(
    "brier_calibration_decomposition",
    oracle="""
    WITH base AS MATERIALIZED (
      SELECT l_discount * CAST(5 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS p,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    g AS (SELECT count(*) AS n, sum(y) AS d,
                 sum((p - y) * (p - y)) AS se FROM base),
    bins AS (
      SELECT p, count(*) AS nk, sum(y) AS dk FROM base GROUP BY 1
    ),
    dec AS (
      SELECT g.n, g.d, g.se,
             sum(nk * (p - dk * 1.0 / nk) * (p - dk * 1.0 / nk)) AS rel_num,
             sum(nk * (dk * 1.0 / nk - g.d * 1.0 / g.n)
                    * (dk * 1.0 / nk - g.d * 1.0 / g.n)) AS res_num
      FROM bins CROSS JOIN g GROUP BY 1, 2, 3
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(se / n, 4) + 0.0 AS brier,
           round(rel_num / n, 4) + 0.0 AS reliability,
           round(res_num / n, 4) + 0.0 AS resolution,
           round(d * 1.0 / n * (1 - d * 1.0 / n), 4) + 0.0 AS uncertainty,
           round(rel_num / n - res_num / n + d * 1.0 / n * (1 - d * 1.0 / n), 4)
             + 0.0 AS decomposition_check
    FROM dec
    """,
)
def brier_calibration_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model calibration — Murphy's decomposition of the Brier score
    (Brier = reliability − resolution + uncertainty) for a deterministic
    probability score (p̂ = 5·discount + 0.2, 11 exact bins from the
    discount grid) predicting returns: the reliability-diagram math that
    separates 'the probabilities are miscalibrated' (reliability) from
    'the model can't discriminate' (low resolution). Binning is EXACT
    group-by on the discrete score — no float bucket edges — so per-bin
    means are integer ratios and both engines agree bit-for-bit before
    the final rounded emission; the check column replays the identity.
    One scan, one 11-group agg, one broadcast of the global scalars."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_discount") * 5.0 + 0.2).alias("p"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    ).localCheckpoint()  # global scalars + bin table share one materialization
    g = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("d"),
        F.sum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias("se"),
    )
    bins = base.groupBy("p").agg(
        F.count(F.lit(1)).alias("nk"), F.sum("y").alias("dk")
    )
    ybark = F.col("dk") * 1.0 / F.col("nk")
    ybar = F.col("d") * 1.0 / F.col("n")
    dec = (
        bins.crossJoin(F.broadcast(g))  # 1-row scalar attach
        .groupBy("n", "d", "se")
        .agg(
            F.sum(F.col("nk") * (F.col("p") - ybark) * (F.col("p") - ybark)).alias(
                "rel_num"
            ),
            F.sum(F.col("nk") * (ybark - ybar) * (ybark - ybar)).alias("res_num"),
        )
    )
    return dec.select(
        F.col("n").cast("bigint").alias("n"),
        r4(F.col("se") / F.col("n")).alias("brier"),
        r4(F.col("rel_num") / F.col("n")).alias("reliability"),
        r4(F.col("res_num") / F.col("n")).alias("resolution"),
        r4(ybar * (1 - ybar)).alias("uncertainty"),
        r4(
            F.col("rel_num") / F.col("n") - F.col("res_num") / F.col("n")
            + ybar * (1 - ybar)
        ).alias("decomposition_check"),
    )


@register(
    "kneser_ney_bigram",
    oracle="""
    WITH toks AS (
      SELECT string_split_regex(lower(trim(text)),
                                '[ \\t\\n\\x0B\\f\\r]+') AS t FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS g
      FROM toks WHERE len(t) >= 2
    ),
    tc AS MATERIALIZED (
      SELECT g.w1 AS w1, g.w2 AS w2, CAST(count(*) AS BIGINT) AS c
      FROM bg GROUP BY 1, 2
    ),
    fw AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1,
                  CAST(count(*) AS BIGINT) AS n_fw FROM tc GROUP BY 1),
    bw AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_bw FROM tc GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM tc)
    SELECT tc.w1, tc.w2, c,
           round(c * 1.0 / c1, 4) + 0.0 AS p_mle,
           round(greatest(c - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE)) / c1
                 + CAST(0.75 AS DOUBLE) * n_fw / c1 * (n_bw * 1.0 / n_types),
                 4) + 0.0 AS p_kn
    FROM tc JOIN fw USING (w1) JOIN bw USING (w2) CROSS JOIN tot
    ORDER BY c DESC, tc.w1, tc.w2 LIMIT 30
    """,
)
def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM smoothing — interpolated Kneser-Ney bigram probabilities over
    the corpus (absolute discount D = 0.75): P(w2|w1) = max(c-D,0)/c(w1.)
    + D*N1+(w1.)/c(w1.) * N1+(.w2)/N1+(..) — the continuation-count
    smoothing every production n-gram LM uses ('how many contexts does
    w2 complete' instead of raw frequency, the fix for 'Francisco' being
    frequent but only after 'San'). Top-30 bigrams by raw count with
    MLE vs KN side by side. The corpus tokenizes and shuffles ONCE into
    (w1,w2) type counts; forward totals, continuation counts, and the
    type total all RE-AGGREGATE that counts table (mergeable across
    shards — the 100 TB shape), and the top-k is TakeOrdered, never a
    global sort. Every probability input is an integer count plus the
    shared D literal -> bit-identical doubles both engines. Whitespace
    is the PINNED class [ \\t\\n\\x0B\\f\\r] on both sides (Java \\s
    includes \\x0B, RE2 \\s does not — a \\x0B document would otherwise
    tokenize differently across engines)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.trim(F.col("text"))), "[ \t\n\x0B\f\r]+")
    bg = (
        docs.select(t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2), "
                    "i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
    )
    # four consumers (forward totals, continuation counts, type total,
    # final join) re-aggregate the counts table: materialize it ONCE so
    # the corpus tokenize+explode never replays — at 100 TB the bigram
    # TYPE table is vocab²-bounded, tiny next to the token stream
    tc = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()
    fw = tc.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n_fw"),
    )
    bw = tc.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n_bw"))
    tot = tc.agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    p_kn = (
        F.greatest(F.col("c") - F.lit(0.75), F.lit(0.0)) / F.col("c1")
        + F.lit(0.75) * F.col("n_fw") / F.col("c1")
        * (F.col("n_bw") * 1.0 / F.col("n_types"))
    )
    return (
        tc.join(fw, "w1")
        .join(bw, "w2")
        .crossJoin(F.broadcast(tot))  # 1-row scalar attach
        .select(
            "w1", "w2", "c",
            r4(F.col("c") * 1.0 / F.col("c1")).alias("p_mle"),
            r4(p_kn).alias("p_kn"),
        )
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(30)
    )


@register(
    "information_gain_split",
    oracle="""
    WITH j AS MATERIALIZED (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
             l_linestatus, o_orderpriority,
             CASE WHEN l_quantity <= 10 THEN 'q01_10'
                  WHEN l_quantity <= 25 THEN 'q11_25'
                  WHEN l_quantity <= 40 THEN 'q26_40'
                  ELSE 'q41_50' END AS qb,
             CASE WHEN l_discount < CAST(0.03 AS DOUBLE) THEN 'low'
                  WHEN l_discount < CAST(0.07 AS DOUBLE) THEN 'mid'
                  ELSE 'high' END AS db
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    s AS MATERIALIZED (
      SELECT 'linestatus' AS feature, l_linestatus AS v, y FROM j
      UNION ALL SELECT 'orderpriority', o_orderpriority, y FROM j
      UNION ALL SELECT 'quantity_band', qb, y FROM j
      UNION ALL SELECT 'discount_band', db, y FROM j
    ),
    cnt AS (SELECT feature, v, y, count(*) AS c FROM s GROUP BY 1, 2, 3),
    cv AS (SELECT feature, v, sum(c) AS n_v FROM cnt GROUP BY 1, 2),
    hv AS (
      SELECT cnt.feature, cnt.v, n_v,
             -sum(c * 1.0 / n_v * log2(c * 1.0 / n_v)) AS h_v
      FROM cnt JOIN cv USING (feature, v) GROUP BY 1, 2, 3
    ),
    ft AS (SELECT feature, sum(n_v) AS n FROM hv GROUP BY 1),
    hc AS (
      SELECT hv.feature, count(*) AS n_values,
             sum(n_v * 1.0 / n * h_v) AS h_cond
      FROM hv JOIN ft USING (feature) GROUP BY 1
    ),
    yc AS (SELECT feature, y, count(*) AS cy FROM s GROUP BY 1, 2),
    hy AS (
      SELECT yc.feature, -sum(cy * 1.0 / n * log2(cy * 1.0 / n)) AS h_y
      FROM yc JOIN ft USING (feature) GROUP BY 1
    )
    SELECT ft.feature, CAST(n AS BIGINT) AS n,
           CAST(n_values AS BIGINT) AS n_values,
           round(h_y, 4) + 0.0 AS target_entropy,
           round(h_cond, 4) + 0.0 AS conditional_entropy,
           round(h_y - h_cond, 4) + 0.0 AS info_gain
    FROM ft JOIN hc USING (feature) JOIN hy USING (feature)
    """,
)
def information_gain_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML feature screening — information gain (mutual information with
    the target) of four candidate categorical splits predicting returns:
    IG(X) = H(Y) - sum_v (n_v/N)*H(Y|X=v), the decision-tree split
    criterion / feature-selection screen. The fact table is scanned
    ONCE; the four features ride a dim-tagged explode (4n rows, one
    shuffle into (feature, value, y) counts) and every entropy reduces
    that counts table — at 100 TB only count triples move after the
    first shuffle. All probabilities are integer-count ratios; the <=5
    per-feature entropy terms sum inside round(,4)'s guard band."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    qb = (
        F.when(F.col("l_quantity") <= 10, "q01_10")
        .when(F.col("l_quantity") <= 25, "q11_25")
        .when(F.col("l_quantity") <= 40, "q26_40")
        .otherwise("q41_50")
    )
    db = (
        F.when(F.col("l_discount") < 0.03, "low")
        .when(F.col("l_discount") < 0.07, "mid")
        .otherwise("high")
    )
    s = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("linestatus").alias("feature"),
                        F.col("l_linestatus").alias("v"),
                    ),
                    F.struct(
                        F.lit("orderpriority").alias("feature"),
                        F.col("o_orderpriority").alias("v"),
                    ),
                    F.struct(F.lit("quantity_band").alias("feature"), qb.alias("v")),
                    F.struct(F.lit("discount_band").alias("feature"), db.alias("v")),
                )
            ).alias("e"),
        )
        .select(F.col("e.feature").alias("feature"), F.col("e.v").alias("v"), "y")
        .localCheckpoint()  # value counts + target marginal share one pass
    )
    # everything downstream of the first aggregation is bounded by the
    # VALUE DOMAINS (<= 28 (feature,value,y) cells, <= 14 (feature,value)
    # rows, 4 features) — broadcast explicitly so the static plan is
    # right at any scale instead of relying on AQE's runtime SMJ->BHJ
    # conversion of unknown-size post-checkpoint stats
    cnt = s.groupBy("feature", "v", "y").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint()  # 28-row cell table; its two consumers skip re-agg
    cv = cnt.groupBy("feature", "v").agg(F.sum("c").alias("n_v"))
    plogp = F.col("c") * 1.0 / F.col("n_v") * F.log2(F.col("c") * 1.0 / F.col("n_v"))
    hv = (
        cnt.join(F.broadcast(cv), ["feature", "v"])
        .groupBy("feature", "v", "n_v")
        .agg((-F.sum(plogp)).alias("h_v"))
    )
    ft = hv.groupBy("feature").agg(F.sum("n_v").alias("n"))
    hc = (
        hv.join(F.broadcast(ft), "feature")
        .groupBy("feature")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum(F.col("n_v") * 1.0 / F.col("n") * F.col("h_v")).alias("h_cond"),
        )
    )
    yc = s.groupBy("feature", "y").agg(F.count(F.lit(1)).alias("cy"))
    pylogpy = F.col("cy") * 1.0 / F.col("n") * F.log2(F.col("cy") * 1.0 / F.col("n"))
    hy = (
        yc.join(F.broadcast(ft), "feature")
        .groupBy("feature")
        .agg((-F.sum(pylogpy)).alias("h_y"))
    )
    return (
        ft.join(F.broadcast(hc), "feature")
        .join(F.broadcast(hy), "feature")
        .select(
            "feature",
            F.col("n").cast("bigint").alias("n"),
            F.col("n_values").cast("bigint").alias("n_values"),
            r4(F.col("h_y")).alias("target_entropy"),
            r4(F.col("h_cond")).alias("conditional_entropy"),
            r4(F.col("h_y") - F.col("h_cond")).alias("info_gain"),
        )
    )


@register(
    "filter_cascade_attrition",
    oracle="""
    WITH flags AS MATERIALIZED (
      SELECT len(string_split_regex(lower(trim(text)),
                                    '[ \\t\\n\\x0B\\f\\r]+')) AS ntok,
             CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS f1,
             CASE WHEN length(text) > 0
                   AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                       / length(text) >= CAST(0.5 AS DOUBLE)
                  THEN 1 ELSE 0 END AS f2,
             CASE WHEN length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]',
                                             '', 'g')) * 1.0
                       / len(string_split_regex(lower(trim(text)),
                                                '[ \\t\\n\\x0B\\f\\r]+'))
                       BETWEEN CAST(2 AS DOUBLE) AND CAST(12 AS DOUBLE)
                  THEN 1 ELSE 0 END AS f3,
             CASE WHEN length(text) > 0
                   AND length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
                       / length(text) <= CAST(0.2 AS DOUBLE)
                  THEN 1 ELSE 0 END AS f4,
             CASE WHEN len(string_split_regex(lower(trim(text)),
                                              '[ \\t\\n\\x0B\\f\\r]+')) >= 30
                  THEN 1 ELSE 0 END AS f5
      FROM documents
    ),
    s AS MATERIALIZED (
      SELECT ntok, f1 AS s1, f1 * f2 AS s2, f1 * f2 * f3 AS s3,
             f1 * f2 * f3 * f4 AS s4, f1 * f2 * f3 * f4 * f5 AS s5
      FROM flags
    ),
    stg AS (
      SELECT '1_min_chars' AS stage, count(*) AS d_in, sum(s1) AS d_out,
             sum(s1 * ntok) AS tok, count(*) AS total FROM s
      UNION ALL SELECT '2_alpha_ratio', sum(s1), sum(s2), sum(s2 * ntok),
             count(*) FROM s
      UNION ALL SELECT '3_word_length', sum(s2), sum(s3), sum(s3 * ntok),
             count(*) FROM s
      UNION ALL SELECT '4_digit_ratio', sum(s3), sum(s4), sum(s4 * ntok),
             count(*) FROM s
      UNION ALL SELECT '5_min_tokens', sum(s4), sum(s5), sum(s5 * ntok),
             count(*) FROM s
    )
    SELECT stage, CAST(d_in AS BIGINT) AS docs_in,
           CAST(d_out AS BIGINT) AS docs_out,
           round(CASE WHEN d_in = 0 THEN 0.0
                      ELSE d_out * 1.0 / d_in END, 4) + 0.0 AS pass_rate,
           round(d_out * 1.0 / total, 4) + 0.0 AS cum_survival,
           CAST(tok AS BIGINT) AS tokens_out
    FROM stg
    """,
)
def filter_cascade_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-data curation — per-rule attrition funnel of a quality-filter
    cascade (the RedPajama/C4-style report: after each rule, how many
    documents and tokens survive): min length -> alphabetic ratio ->
    mean word length -> digit ratio -> min tokens, applied in order,
    with per-stage pass rate and cumulative survival. The corpus is
    scanned ONCE into per-doc flags; the five stages are conditional
    sums over that single pass (stacked, not five scans) — the exact
    shape a 100 TB curation run needs, where each rule re-reading the
    corpus is the difference between hours and days. All rates are
    integer ratios, so both engines agree exactly. Whitespace is the
    PINNED class [ \\t\\n\\x0B\\f\\r] on both sides: Java's \\s includes
    vertical tab \\x0B while RE2's does not, so a bare \\s would make
    nospace/ntok (hence f3/f5 and token totals) engine-divergent on a
    document containing \\x0B."""
    docs = load_table(spark, sf_dir, "documents")
    ws = "[ \t\n\x0B\f\r]"
    ntok = F.size(F.split(F.lower(F.trim(F.col("text"))), ws + "+"))
    ln = F.length("text")
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    nospace = F.length(F.regexp_replace("text", ws, ""))
    digits = F.length(F.regexp_replace("text", "[^0-9]", ""))
    b = F.lit(1)
    f1 = F.when(F.col("n_chars") >= 200, b).otherwise(0)
    f2 = F.when((ln > 0) & (alpha * 1.0 / ln >= 0.5), b).otherwise(0)
    f3 = F.when((nospace * 1.0 / ntok).between(2.0, 12.0), b).otherwise(0)
    f4 = F.when((ln > 0) & (digits * 1.0 / ln <= 0.2), b).otherwise(0)
    f5 = F.when(ntok >= 30, b).otherwise(0)
    s = docs.select(
        ntok.alias("ntok"), f1.alias("s1"), (f1 * f2).alias("s2"),
        (f1 * f2 * f3).alias("s3"), (f1 * f2 * f3 * f4).alias("s4"),
        (f1 * f2 * f3 * f4 * f5).alias("s5"),
    )
    stg = s.select(
        "ntok",
        F.explode(
            F.array(
                F.struct(
                    F.lit("1_min_chars").alias("stage"),
                    F.lit(1).alias("inn"), F.col("s1").alias("out"),
                ),
                F.struct(
                    F.lit("2_alpha_ratio").alias("stage"),
                    F.col("s1").alias("inn"), F.col("s2").alias("out"),
                ),
                F.struct(
                    F.lit("3_word_length").alias("stage"),
                    F.col("s2").alias("inn"), F.col("s3").alias("out"),
                ),
                F.struct(
                    F.lit("4_digit_ratio").alias("stage"),
                    F.col("s3").alias("inn"), F.col("s4").alias("out"),
                ),
                F.struct(
                    F.lit("5_min_tokens").alias("stage"),
                    F.col("s4").alias("inn"), F.col("s5").alias("out"),
                ),
            )
        ).alias("e"),
    ).select(F.col("e.stage").alias("stage"), "e.inn", "e.out", "ntok")
    agg = stg.groupBy("stage").agg(
        F.sum("inn").alias("d_in"),
        F.sum("out").alias("d_out"),
        F.sum(F.col("out") * F.col("ntok")).alias("tok"),
        F.count(F.lit(1)).alias("total"),
    )
    return agg.select(
        "stage",
        F.col("d_in").cast("bigint").alias("docs_in"),
        F.col("d_out").cast("bigint").alias("docs_out"),
        r4(
            F.when(F.col("d_in") == 0, 0.0).otherwise(
                F.col("d_out") * 1.0 / F.col("d_in")
            )
        ).alias("pass_rate"),
        r4(F.col("d_out") * 1.0 / F.col("total")).alias("cum_survival"),
        F.col("tok").cast("bigint").alias("tokens_out"),
    )


@register(
    "cumulative_gains_deciles",
    oracle="""
    WITH resp AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    base AS MATERIALIZED (
      SELECT c_custkey, c_acctbal,
             CASE WHEN resp.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS responder
      FROM customer LEFT JOIN resp ON c_custkey = o_custkey
    ),
    dec AS (
      SELECT ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile,
             responder
      FROM base
    ),
    per AS (
      SELECT decile, count(*) AS nk, sum(responder) AS rk
      FROM dec GROUP BY 1
    ),
    cum AS (
      SELECT a.decile, a.nk, a.rk,
             sum(b.nk) AS cum_n, sum(b.rk) AS cum_r
      FROM per a JOIN per b ON b.decile <= a.decile
      GROUP BY 1, 2, 3
    ),
    tot AS (SELECT count(*) AS n, sum(responder) AS r FROM base)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(nk AS BIGINT) AS n_customers,
           CAST(rk AS BIGINT) AS n_responders,
           CAST(cum_r AS BIGINT) AS cum_responders,
           round(cum_r * 1.0 / r, 4) + 0.0 AS gain,
           round((cum_r * 1.0 / cum_n) / (r * 1.0 / n), 4) + 0.0 AS lift
    FROM cum CROSS JOIN tot
    """,
)
def cumulative_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing science — cumulative gains / lift chart: customers
    ranked by account balance (the 'model score'), responders = placed
    at least one urgent-priority order; per score decile, the share of
    all responders captured so far (gain) and the response-rate ratio
    vs baseline (lift) — the standard campaign-targeting evaluation
    ('the top 20% of scores capture X% of responders'). NO global
    window: deciles come from the two-level prefix-sum global rank +
    closed-form ntile (the order_value_deciles pattern), and the
    cumulative is a 10x10 triangular self-join on the decile grid —
    integer counts only, so both engines agree exactly."""
    from graph_db_spark.operators.aggregates import ntile_of, with_global_rank

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    resp = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    base = c.join(resp, c.c_custkey == resp.o_custkey, "left").select(
        "c_custkey",
        "c_acctbal",
        F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0).alias("responder"),
    ).localCheckpoint()  # ranking + the totals scalar share one materialization
    ranked = with_global_rank(base, [F.desc("c_acctbal"), F.asc("c_custkey")])
    tot = base.agg(F.count(F.lit(1)).alias("n"), F.sum("responder").alias("r"))
    per = (
        ranked.crossJoin(F.broadcast(tot.select(F.col("n").alias("_n"))))
        .withColumn("decile", ntile_of(F.col("rank"), F.col("_n"), 10))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("nk"), F.sum("responder").alias("rk"))
    )
    a, b2 = per.alias("a"), per.alias("b")
    cum = (
        a.join(b2, F.col("b.decile") <= F.col("a.decile"))
        .groupBy(F.col("a.decile").alias("decile"), F.col("a.nk").alias("nk"),
                 F.col("a.rk").alias("rk"))
        .agg(F.sum("b.nk").alias("cum_n"), F.sum("b.rk").alias("cum_r"))
    )
    return cum.crossJoin(F.broadcast(tot)).select(  # 1-row scalar attach
        F.col("decile").cast("bigint").alias("decile"),
        F.col("nk").cast("bigint").alias("n_customers"),
        F.col("rk").cast("bigint").alias("n_responders"),
        F.col("cum_r").cast("bigint").alias("cum_responders"),
        r4(F.col("cum_r") * 1.0 / F.col("r")).alias("gain"),
        r4(
            (F.col("cum_r") * 1.0 / F.col("cum_n")) / (F.col("r") * 1.0 / F.col("n"))
        ).alias("lift"),
    )


@register(
    "regression_stump_split",
    oracle="""
    WITH q AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS x, count(*) AS nq,
             CAST(round(sum(l_extendedprice * 1e-5) * 10000) AS BIGINT) AS i1,
             CAST(round(sum(l_extendedprice * 1e-5 * l_extendedprice * 1e-5)
                        * 10000) AS BIGINT) AS i2
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT sum(nq) AS tn, sum(i1) AS t1, sum(i2) AS t2 FROM q),
    cum AS (
      SELECT a.x, sum(b.nq) AS cn, sum(b.i1) AS c1, sum(b.i2) AS c2
      FROM q a JOIN q b ON b.x <= a.x GROUP BY 1
    ),
    obj AS (
      SELECT x, cn, tn - cn AS rn,
             c1 * 10.0 / cn AS mean_l,
             (t1 - c1) * 10.0 / (tn - cn) AS mean_r,
             (c2 / 10000.0 - (c1 / 10000.0) * (c1 / 10000.0) / cn)
             + ((t2 - c2) / 10000.0
                - ((t1 - c1) / 10000.0) * ((t1 - c1) / 10000.0) / (tn - cn))
               AS sse_split,
             t2 / 10000.0 - (t1 / 10000.0) * (t1 / 10000.0) / tn AS sse_total
      FROM cum CROSS JOIN tot WHERE cn < tn
    )
    SELECT CAST(x AS BIGINT) AS split_at,
           CAST(cn AS BIGINT) AS n_left, CAST(rn AS BIGINT) AS n_right,
           round(mean_l, 4) + 0.0 AS mean_left,
           round(mean_r, 4) + 0.0 AS mean_right,
           round((sse_total - sse_split) / sse_total, 4) + 0.0
             AS variance_reduction
    FROM obj ORDER BY sse_split, x LIMIT 1
    """,
)
def regression_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML on SQL — a regression-stump fit: the single best variance-
    reducing split of quantity (x <= s goes left) predicting extended
    price, i.e. one node of a CART/GBM tree grown with sufficient
    statistics instead of row sorting. The fact table reduces ONCE to
    the 50-value quantity grid's (n, sum y, sum y^2) triples; every
    candidate split's SSE is closed-form algebra over prefix sums of
    that grid (a 50x50 triangular join, no row-level pass per split) —
    the exact histogram-based split search XGBoost/LightGBM use, which
    is also the only shape that works at 100 TB. Cross-engine parity:
    the sufficient statistics are snapped to INTEGER 1e-4 grid units
    (prices pre-scaled by 1e-5), so prefix sums are exact integers and
    the SSE objective is a bit-identical pure function of them — the
    argmin cannot flip between engines. Price magnitudes re-emerge only
    in the rounded mean/share emissions."""
    li = load_table(spark, sf_dir, "lineitem")
    ys = F.col("l_extendedprice") * 1e-5
    q = li.groupBy(F.col("l_quantity").cast("bigint").alias("x")).agg(
        F.count(F.lit(1)).alias("nq"),
        F.round(F.sum(ys) * 10000).cast("bigint").alias("i1"),
        F.round(F.sum(ys * ys) * 10000).cast("bigint").alias("i2"),
    ).localCheckpoint()  # grid + totals + triangular join share one pass
    tot = q.agg(
        F.sum("nq").alias("tn"), F.sum("i1").alias("t1"), F.sum("i2").alias("t2")
    )
    a, b = q.alias("a"), q.alias("b")
    cum = (
        a.join(b, F.col("b.x") <= F.col("a.x"))
        .groupBy(F.col("a.x").alias("x"))
        .agg(
            F.sum("b.nq").alias("cn"),
            F.sum("b.i1").alias("c1"),
            F.sum("b.i2").alias("c2"),
        )
    )
    j = cum.crossJoin(F.broadcast(tot)).filter(F.col("cn") < F.col("tn"))
    c1d, c2d = F.col("c1") / 10000.0, F.col("c2") / 10000.0
    r1d = (F.col("t1") - F.col("c1")) / 10000.0
    r2d = (F.col("t2") - F.col("c2")) / 10000.0
    rn = F.col("tn") - F.col("cn")
    sse_split = (c2d - c1d * c1d / F.col("cn")) + (r2d - r1d * r1d / rn)
    t1d, t2d = F.col("t1") / 10000.0, F.col("t2") / 10000.0
    sse_total = t2d - t1d * t1d / F.col("tn")
    return (
        j.select(
            F.col("x").alias("split_at"),
            F.col("cn").cast("bigint").alias("n_left"),
            rn.cast("bigint").alias("n_right"),
            r4(F.col("c1") * 10.0 / F.col("cn")).alias("mean_left"),
            r4((F.col("t1") - F.col("c1")) * 10.0 / rn).alias("mean_right"),
            r4((sse_total - sse_split) / sse_total).alias("variance_reduction"),
            sse_split.alias("_obj"),
        )
        .orderBy("_obj", "split_at")
        .limit(1)
        .drop("_obj")
    )


@register(
    "position_based_attribution",
    oracle="""
    WITH ek AS MATERIALIZED (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type,
             strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '#'
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
      FROM events
    ),
    purch AS MATERIALIZED (
      SELECT user_id, day, min(k) AS fp FROM ek
      WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    t AS MATERIALIZED (
      SELECT e.user_id, e.day, e.event_type, e.k
      FROM ek e JOIN purch p USING (user_id, day)
      WHERE e.event_type <> 'purchase' AND e.k < p.fp
    ),
    tw AS (
      SELECT user_id, day, event_type,
             row_number() OVER (PARTITION BY user_id, day ORDER BY k) AS pos,
             count(*) OVER (PARTITION BY user_id, day) AS kk
      FROM t
    ),
    credited AS (
      SELECT event_type AS channel,
             CAST(user_id AS VARCHAR) || '#' || day AS sk,
             CASE WHEN kk = 1 THEN CAST(1.0 AS DOUBLE)
                  WHEN kk = 2 THEN CAST(0.5 AS DOUBLE)
                  WHEN pos = 1 OR pos = kk THEN CAST(0.4 AS DOUBLE)
                  ELSE CAST(0.2 AS DOUBLE) / (kk - 2) END AS credit,
             1 AS is_touch
      FROM tw
      UNION ALL
      SELECT '<direct>', CAST(p.user_id AS VARCHAR) || '#' || p.day,
             CAST(1.0 AS DOUBLE), 0
      FROM purch p
      LEFT JOIN (SELECT DISTINCT user_id, day FROM t) s
        ON p.user_id = s.user_id AND p.day = s.day
      WHERE s.user_id IS NULL
    )
    SELECT channel,
           round(sum(credit), 4) + 0.0 AS credited_conversions,
           CAST(count(DISTINCT sk) AS BIGINT) AS n_sessions,
           CAST(sum(is_touch) AS BIGINT) AS n_touches
    FROM credited GROUP BY 1
    """,
)
def position_based_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing science — position-based (U-shaped) multi-touch
    attribution: within each user-day journey that converts (contains a
    purchase), the touches BEFORE the first purchase split the
    conversion credit 40% first / 40% last / 20% across the middles
    (1 touch keeps 100%, 2 touches split 50/50, no touches credit
    '<direct>') — the model between last_touch_attribution's
    winner-take-all and full Shapley. Journey state is per (user, day):
    the windows partition on that key (bounded by the session horizon),
    so a billion users attribute as independent partitions — no global
    anything. Touch ordering uses the formatted ts#event_id key string
    on both sides, so tie handling is engine-identical; credits are
    exact binary fractions summed inside round(,4)'s guard band."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    key = F.concat(
        _fmt_ts(F.col("ts")), F.lit("#"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    ek = ev.select(
        "user_id", day.alias("day"), "event_type", key.alias("k")
    ).localCheckpoint()  # purchases + touches share one materialization
    purch = (
        ek.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "day")
        .agg(F.min("k").alias("fp"))
    )
    t = (
        ek.filter(F.col("event_type") != "purchase")
        .join(purch, ["user_id", "day"])
        .filter(F.col("k") < F.col("fp"))
        .select("user_id", "day", "event_type", "k")
    )
    wsess = Window.partitionBy("user_id", "day")
    tw = t.select(
        "user_id", "day", "event_type",
        F.row_number().over(wsess.orderBy("k")).alias("pos"),
        F.count(F.lit(1)).over(wsess).alias("kk"),
    )
    sk = F.concat(F.col("user_id").cast("string"), F.lit("#"), F.col("day"))
    credit = (
        F.when(F.col("kk") == 1, F.lit(1.0))
        .when(F.col("kk") == 2, F.lit(0.5))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("kk")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("kk") - 2))
    )
    touched = tw.select(
        F.col("event_type").alias("channel"), sk.alias("sk"),
        credit.alias("credit"), F.lit(1).alias("is_touch"),
    )
    direct = (
        purch.join(t.select("user_id", "day").distinct(), ["user_id", "day"], "left_anti")
        .select(
            F.lit("<direct>").alias("channel"), sk.alias("sk"),
            F.lit(1.0).alias("credit"), F.lit(0).alias("is_touch"),
        )
    )
    return (
        touched.unionByName(direct)
        .groupBy("channel")
        .agg(
            r4(F.sum("credit")).alias("credited_conversions"),
            F.countDistinct("sk").cast("bigint").alias("n_sessions"),
            F.sum("is_touch").cast("bigint").alias("n_touches"),
        )
    )


@register(
    "abc_inventory_classes",
    oracle="""
    WITH pr AS MATERIALIZED (
      SELECT l_partkey AS pk,
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100)
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT pk, cents,
             sum(cents) OVER (ORDER BY cents DESC, pk
                              ROWS UNBOUNDED PRECEDING) AS cum_cents
      FROM pr
    ),
    tot AS (SELECT sum(cents) AS t FROM pr),
    cls AS (
      SELECT CASE WHEN cum_cents * 1.0 / t <= CAST(0.80 AS DOUBLE) THEN 'A'
                  WHEN cum_cents * 1.0 / t <= CAST(0.95 AS DOUBLE) THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents, cum_cents * 1.0 / t AS share
      FROM cum CROSS JOIN tot
    )
    SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(cents) / 100.0, 4) + 0.0 AS class_revenue,
           round(min(share), 4) + 0.0 AS min_cum_share,
           round(max(share), 4) + 0.0 AS max_cum_share
    FROM cls GROUP BY 1
    """,
)
def abc_inventory_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BI classification — ABC (Pareto) inventory analysis: parts ranked
    by revenue, class A = the head covering 80% of cumulative revenue,
    B to 95%, C the tail — the standard stock-priority segmentation.
    NO global window (the corpus-sized cumulative is exactly the
    anti-pattern the plan sweep bans): the revenue-ordered running
    total comes from with_global_rank's two-level prefix sum. Per-part
    revenue snaps to an INTEGER cent count first, so the prefix sums,
    the total, and every cumulative share are exact integer arithmetic
    — the A/B/C boundary comparisons are bit-identical across engines
    and partition layouts (the rfm cent-count convention)."""
    from graph_db_spark.operators.aggregates import with_global_rank

    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.round(F.sum(rev) * 100).cast("bigint").alias("cents")
    ).localCheckpoint()  # ranking + the total scalar share one materialization
    ranked = with_global_rank(
        pr, [F.desc("cents"), F.asc("pk")], cumsum_cols={"cum_cents": "cents"}
    )
    tot = pr.agg(F.sum("cents").alias("t"))
    share = F.col("cum_cents") * 1.0 / F.col("t")
    cls = ranked.crossJoin(F.broadcast(tot)).select(  # 1-row scalar attach
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
        "cents",
        share.alias("share"),
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        r4(F.sum("cents") / 100.0).alias("class_revenue"),
        r4(F.min("share")).alias("min_cum_share"),
        r4(F.max("share")).alias("max_cum_share"),
    )


def _bh_z_thresholds(m: int = 25, q: float = 0.10) -> list[tuple[int, float]]:
    """Benjamini-Hochberg rejection thresholds on the |z| scale: for rank
    i (p-values ascending = |z| descending), the step-up rule rejects
    when p(i) <= i*q/m, i.e. |z| >= Phi^-1(1 - i*q/(2m)) for a two-sided
    z test. Computed ONCE in Python with math.erf + bisection and
    injected as identical double literals into BOTH engines — neither
    engine needs erf at runtime, which neither Spark SQL nor portable
    ANSI provides. Deterministic: pure arithmetic, no RNG, no clock."""
    import math

    def phi(z: float) -> float:
        return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))

    out = []
    for i in range(1, m + 1):
        target = 1.0 - (q * i / m) / 2.0
        lo, hi = 0.0, 10.0
        for _ in range(80):  # bisection to ~1e-23, far past double ulp
            mid = (lo + hi) / 2.0
            if phi(mid) < target:
                lo = mid
            else:
                hi = mid
        out.append((i, (lo + hi) / 2.0))
    return out


def _bh_fdr_oracle_sql() -> str:
    """BH oracle with the SAME Python-emitted z thresholds the Spark side
    joins against (shared-literal convention: katz/sprt/gumbel)."""
    rows = ",\n        ".join(
        f"({i}, CAST({z!r} AS DOUBLE))" for i, z in _bh_z_thresholds()
    )
    return f"""
    WITH g AS (
      SELECT avg(l_discount) AS mu, stddev_samp(l_discount) AS sd
      FROM lineitem
    ),
    pb AS MATERIALIZED (
      SELECT p_brand AS brand, count(*) AS n, avg(l_discount) AS mb
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1
    ),
    z AS MATERIALIZED (
      SELECT brand, n,
             round((mb - mu) / (sd / sqrt(n)), 4) + 0.0 AS z4
      FROM pb CROSS JOIN g
    ),
    rk AS MATERIALIZED (
      SELECT a.brand, a.n, a.z4,
             1 + count(CASE WHEN abs(b.z4) > abs(a.z4)
                             OR (abs(b.z4) = abs(a.z4) AND b.brand < a.brand)
                            THEN 1 END) AS i
      FROM z a CROSS JOIN z b GROUP BY 1, 2, 3
    ),
    th(i, zthr) AS (VALUES
        {rows}
    ),
    imax AS (
      SELECT coalesce(max(CASE WHEN abs(rk.z4) >= th.zthr THEN rk.i END), 0)
               AS im
      FROM rk JOIN th USING (i)
    )
    SELECT brand, CAST(n AS BIGINT) AS n, z4 AS z,
           CAST(rk.i AS BIGINT) AS p_rank,
           round(th.zthr, 4) + 0.0 AS z_threshold,
           CAST(CASE WHEN rk.i <= imax.im THEN 1 ELSE 0 END AS BIGINT)
             AS rejected
    FROM rk JOIN th USING (i) CROSS JOIN imax
    """


@register("benjamini_hochberg_fdr", oracle=_bh_fdr_oracle_sql())
def benjamini_hochberg_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple testing — Benjamini-Hochberg FDR control (q = 0.10) over
    25 simultaneous brand-level tests: per brand, a one-sample z test of
    mean discount vs the corpus mean; BH's step-up rule rejects the i
    smallest p-values where p(i) <= i*q/m — run entirely on the |z|
    scale against Phi^-1 thresholds PRECOMPUTED in Python (math.erf +
    bisection, injected as identical literals both sides), since
    neither engine has a portable erf. The z statistics round to 4dp
    BEFORE ranking/thresholding so engine-level FP noise in the means
    cannot reorder ranks or flip a rejection. No window anywhere: ranks
    come from a 25x25 triangular count and the step-up cutoff is a
    broadcast scalar. The brand domain (m = 25) is the TPC-H generator
    constant at every SF; thresholds are build-time constants keyed to
    it."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    g = li.agg(
        F.avg("l_discount").alias("mu"), F.stddev_samp("l_discount").alias("sd")
    )
    pb = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("l_discount").alias("mb"))
    )
    z = pb.crossJoin(F.broadcast(g)).select(  # 1-row scalar attach
        "brand", "n",
        r4((F.col("mb") - F.col("mu")) / (F.col("sd") / F.sqrt(F.col("n")))).alias(
            "z4"
        ),
    ).localCheckpoint()  # rank join + cutoff scalar share one materialization
    a, b = z.alias("a"), z.alias("b")
    rk = (
        a.crossJoin(b)
        .groupBy(
            F.col("a.brand").alias("brand"), F.col("a.n").alias("n"),
            F.col("a.z4").alias("z4"),
        )
        .agg(
            (
                1
                + F.count(
                    F.when(
                        (F.abs(F.col("b.z4")) > F.abs(F.col("a.z4")))
                        | (
                            (F.abs(F.col("b.z4")) == F.abs(F.col("a.z4")))
                            & (F.col("b.brand") < F.col("a.brand"))
                        ),
                        1,
                    )
                )
            ).alias("i")
        )
    )
    th = F.broadcast(
        spark.createDataFrame(_bh_z_thresholds(), "i long, zthr double")
    )
    rj = rk.join(th, "i")
    imax = rj.agg(
        F.coalesce(
            F.max(F.when(F.abs(F.col("z4")) >= F.col("zthr"), F.col("i"))), F.lit(0)
        ).alias("im")
    )
    return rj.crossJoin(F.broadcast(imax)).select(  # 1-row scalar attach
        "brand",
        F.col("n").cast("bigint").alias("n"),
        F.col("z4").alias("z"),
        F.col("i").cast("bigint").alias("p_rank"),
        r4(F.col("zthr")).alias("z_threshold"),
        F.when(F.col("i") <= F.col("im"), 1).otherwise(0).cast("bigint").alias(
            "rejected"
        ),
    )


@register(
    "quantile_treatment_effect",
    oracle="""
    WITH o AS MATERIALIZED (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS grp
      FROM orders
    ),
    cnt AS (SELECT grp, count(*) AS ng FROM o GROUP BY 1),
    rk AS (
      SELECT grp, o_totalprice AS v,
             row_number() OVER (PARTITION BY grp
                                ORDER BY o_totalprice, o_orderkey) AS lr
      FROM o
    ),
    tg AS (
      SELECT grp, ng, d, CAST(ceil(d * ng / 10.0) AS BIGINT) AS tr
      FROM cnt CROSS JOIN (SELECT unnest(range(1, 10)) AS d)
    ),
    qv AS (
      SELECT t.d, t.grp, t.ng, r.v
      FROM tg t JOIN rk r ON t.grp = r.grp AND t.tr = r.lr
    )
    SELECT CAST(d AS BIGINT) AS decile,
           CAST(max(CASE WHEN grp = 1 THEN ng END) AS BIGINT) AS n_treated,
           CAST(max(CASE WHEN grp = 0 THEN ng END) AS BIGINT) AS n_control,
           round(max(CASE WHEN grp = 1 THEN v END), 4) + 0.0 AS q_treated,
           round(max(CASE WHEN grp = 0 THEN v END), 4) + 0.0 AS q_control,
           round(max(CASE WHEN grp = 1 THEN v END)
                 - max(CASE WHEN grp = 0 THEN v END), 4) + 0.0 AS qte
    FROM qv GROUP BY 1
    """,
)
def quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal inference — quantile treatment effects: the
    decile-by-decile difference between the treated (urgent-priority)
    and control order-value distributions, the distributional effect
    readout an average treatment effect hides ('the promo moved the
    p90, not the median'). Exact type-1 order statistics, NO global
    window: both groups rank in ONE stacked with_global_rank pass
    ordered by (grp, value, key) — each group's block is contiguous in
    the total order, so the within-group rank is global_rank minus the
    broadcast size of the groups before it (the rfm dim-stacking trick
    with data-dependent block sizes). The 18 target order statistics
    arrive via an equi-join on (grp, rank), so a billion orders pay
    #partitions parallel sorts and move 18 rows. Quantile values are
    raw data cells (never aggregated), hence identical doubles both
    engines; qte differences round inside the guard band."""
    from graph_db_spark.operators.aggregates import with_global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("grp"),
    ).localCheckpoint()  # ranking + group counts share one materialization
    cnt = o.groupBy("grp").agg(F.count(F.lit(1)).alias("ng"))
    n0 = cnt.filter(F.col("grp") == 0).select(F.col("ng").alias("_n0"))
    ranked = (
        with_global_rank(
            o, [F.asc("grp"), F.asc("o_totalprice"), F.asc("o_orderkey")],
            rank_col="gr",
        )
        .crossJoin(F.broadcast(n0))  # 1-row scalar attach
        .select(
            "grp",
            F.col("o_totalprice").alias("v"),
            (
                F.col("gr")
                - F.when(F.col("grp") == 1, F.col("_n0")).otherwise(F.lit(0))
            ).alias("lr"),
        )
    )
    # target frame renames its key columns: cnt and ranked share lineage
    # (both derive from the checkpointed o), so joining on same-named
    # attributes would hit Spark's ambiguous-self-join resolution
    tg = cnt.select(
        F.col("grp").alias("tgrp"), "ng",
        F.explode(F.sequence(F.lit(1), F.lit(9))).alias("d"),
    ).select(
        "tgrp", "ng", "d",
        F.ceil(F.col("d") * F.col("ng") / F.lit(10.0)).cast("bigint").alias("tr"),
    )
    qv = F.broadcast(tg).join(
        ranked, (F.col("tgrp") == F.col("grp")) & (F.col("tr") == F.col("lr"))
    ).select(F.col("tgrp").alias("g"), "ng", "d", "v")
    return qv.groupBy("d").agg(
        F.max(F.when(F.col("g") == 1, F.col("ng"))).cast("bigint").alias("n_treated"),
        F.max(F.when(F.col("g") == 0, F.col("ng"))).cast("bigint").alias("n_control"),
        r4(F.max(F.when(F.col("g") == 1, F.col("v")))).alias("q_treated"),
        r4(F.max(F.when(F.col("g") == 0, F.col("v")))).alias("q_control"),
        r4(
            F.max(F.when(F.col("g") == 1, F.col("v")))
            - F.max(F.when(F.col("g") == 0, F.col("v")))
        ).alias("qte"),
    ).select(
        F.col("d").cast("bigint").alias("decile"),
        "n_treated", "n_control", "q_treated", "q_control", "qte",
    )


# ---------------------------------------------------------------------------
# r10 additions — calibration, trend/rank tests, survival comparison,
# experimentation, attribution, skyline, text quality, robust shift, indices
# ---------------------------------------------------------------------------


@register(
    "isotonic_calibration_pav",
    oracle="""
    WITH b AS MATERIALIZED (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS k,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM lineitem GROUP BY 1
    ),
    iv AS MATERIALIZED (
      SELECT lo.k AS i, hi.k AS j, sum(m.d) * 1.0 / sum(m.n) AS mean_ij
      FROM b lo JOIN b hi ON lo.k <= hi.k
      JOIN b m ON m.k BETWEEN lo.k AND hi.k
      GROUP BY 1, 2
    ),
    mn AS (
      SELECT b.k AS k, iv.i AS i, min(iv.mean_ij) AS lo_min
      FROM b JOIN iv ON iv.i <= b.k AND iv.j >= b.k
      GROUP BY 1, 2
    ),
    iso AS (SELECT k, max(lo_min) AS iso FROM mn GROUP BY 1)
    SELECT b.k AS disc_pct, b.n AS n,
           round(b.d * 1.0 / b.n, 4) + 0.0 AS rate_raw,
           round(iso.iso, 4) + 0.0 AS rate_iso
    FROM b JOIN iso ON iso.k = b.k
    """,
)
def isotonic_calibration_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone calibration — isotonic regression of the return rate on
    the discount grid via the MINIMAX identity (iso(k) = max_{i<=k}
    min_{j>=k} weightedMean(i..j)), which equals the pool-adjacent-
    violators fit without PAV's sequential merging — the closed form
    that makes the classic calibration step a JOIN, not an iterative
    driver loop. The corpus collapses to an 11-bin (discount-percent)
    table in ONE scan; every remaining step is algebra on that
    broadcast-sized grid (66 intervals), so 10^9 rows calibrate with
    one shuffle. Interval means are ratios of exact integer sums ->
    bit-identical doubles, and min/max over identical doubles is
    engine-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    b = (
        li.groupBy(
            F.round(F.col("l_discount") * 100).cast("bigint").alias("k")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("d"),
        )
        .localCheckpoint()  # 11 rows, consumed by four plan subtrees
    )
    lo = b.select(F.col("k").alias("i"))
    hi = b.select(F.col("k").alias("j"))
    m = b.select(
        F.col("k").alias("mk"), F.col("n").alias("mn"), F.col("d").alias("md")
    )
    iv = (
        lo.join(hi, F.col("i") <= F.col("j"))
        .join(m, (F.col("mk") >= F.col("i")) & (F.col("mk") <= F.col("j")))
        .groupBy("i", "j")
        .agg((F.sum("md") * 1.0 / F.sum("mn")).alias("mean_ij"))
    )
    mn = (
        b.select("k")
        .join(iv, (F.col("i") <= F.col("k")) & (F.col("j") >= F.col("k")))
        .groupBy("k", "i")
        .agg(F.min("mean_ij").alias("lo_min"))
    )
    iso = mn.groupBy("k").agg(F.max("lo_min").alias("iso"))
    return b.join(iso, "k").select(
        F.col("k").alias("disc_pct"),
        "n",
        r4(F.col("d") * 1.0 / F.col("n")).alias("rate_raw"),
        r4(F.col("iso")).alias("rate_iso"),
    )


@register(
    "mann_kendall_trend",
    oracle="""
    WITH d AS MATERIALIZED (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM d a JOIN d b ON a.day < b.day
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    t AS (
      SELECT CAST(coalesce(sum(tc * (tc - 1) * (2 * tc + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT count(*) AS tc FROM d GROUP BY cents HAVING count(*) > 1)
    ),
    v AS (
      SELECT nn.n, s.s_stat,
             (nn.n * (nn.n - 1) * (2 * nn.n + 5) - t.tie_term)
               / CAST(18 AS DOUBLE) AS var_s
      FROM nn CROSS JOIN s CROSS JOIN t
    )
    SELECT n, s_stat, round(var_s, 4) + 0.0 AS var_s,
           round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                      WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                      ELSE CAST(0 AS DOUBLE) END, 4) + 0.0 AS z
    FROM v
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric trend — the Mann-Kendall test (S = sum of pairwise
    sign comparisons, tie-corrected variance, continuity-corrected z)
    on the DAILY revenue series: the standard 'is this KPI drifting'
    test that needs no distributional assumptions, complementing
    theil_sen_trend's slope with a significance statistic. The corpus
    aggregates to the calendar-bounded day grid (~2400 rows regardless
    of corpus size) in one shuffle; the O(days^2) sign sweep is a
    broadcast triangular self-join over that grid — bounded by the
    CALENDAR, not the data, so the quadratic never grows with corpus
    size. Daily totals are exact integer cents, so every sign and the
    tie term are engine-independent integers; var_s is a single exact
    integer divided by 18 (large magnitude, but integer-derived, not a
    noisy cross-engine float sum — SCALE.md round(,4) rule satisfied)."""
    o = load_table(spark, sf_dir, "orders")
    d = (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint()  # calendar-bounded grid, consumed three times
    )
    a = d.select(F.col("day").alias("a_day"), F.col("cents").alias("a_c"))
    bb = d.select(F.col("day").alias("b_day"), F.col("cents").alias("b_c"))
    s = a.join(bb, F.col("a_day") < F.col("b_day")).agg(
        F.sum(
            F.when(F.col("b_c") > F.col("a_c"), 1)
            .when(F.col("b_c") < F.col("a_c"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_stat")
    )
    nn = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tc = F.col("tc")
    t = (
        d.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("tc"))
        .filter(tc > 1)
        .agg(
            F.coalesce(F.sum(tc * (tc - 1) * (2 * tc + 5)), F.lit(0))
            .cast("bigint")
            .alias("tie_term")
        )
    )
    v = (
        nn.crossJoin(F.broadcast(s))  # 1-row scalar attaches
        .crossJoin(F.broadcast(t))
        .select(
            "n",
            "s_stat",
            (
                (
                    F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                    - F.col("tie_term")
                )
                / F.lit(18.0)
            ).alias("var_s"),
        )
    )
    return v.select(
        "n",
        "s_stat",
        r4(F.col("var_s")).alias("var_s"),
        r4(
            F.when(
                F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt("var_s")
            )
            .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt("var_s"))
            .otherwise(F.lit(0.0))
        ).alias("z"),
    )


@register(
    "friedman_priority_ranks",
    oracle="""
    WITH cell AS MATERIALIZED (
      SELECT strftime(o_orderdate, '%Y-%m') AS blk, o_orderpriority AS trt,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS v
      FROM orders GROUP BY 1, 2
    ),
    c2 AS MATERIALIZED (
      SELECT cell.* FROM cell
      JOIN (SELECT blk FROM cell GROUP BY blk HAVING count(*) = 5) fb
      USING (blk)
    ),
    r AS MATERIALIZED (
      SELECT a.blk, a.trt,
             sum(CASE WHEN b.v < a.v THEN CAST(1.0 AS DOUBLE)
                      WHEN b.v = a.v THEN CAST(0.5 AS DOUBLE)
                      ELSE CAST(0.0 AS DOUBLE) END) + CAST(0.5 AS DOUBLE)
               AS rnk
      FROM c2 a JOIN c2 b ON a.blk = b.blk
      GROUP BY 1, 2
    ),
    nb AS (SELECT CAST(count(DISTINCT blk) AS BIGINT) AS nb FROM c2),
    rj AS (SELECT trt, sum(rnk) AS r_j FROM r GROUP BY 1),
    ss AS (SELECT sum(rnk * rnk) AS sum_r2 FROM r),
    q AS (
      SELECT CASE WHEN ss.sum_r2 - 45.0 * nb.nb > 0
                  THEN 4.0 * sum((rj.r_j - 3.0 * nb.nb)
                                 * (rj.r_j - 3.0 * nb.nb))
                       / (ss.sum_r2 - 45.0 * nb.nb)
                  ELSE CAST(0 AS DOUBLE) END AS q_stat
      FROM rj CROSS JOIN nb CROSS JOIN ss
      GROUP BY nb.nb, ss.sum_r2
    )
    SELECT rj.trt AS priority, nb.nb AS n_blocks,
           round(rj.r_j / nb.nb, 4) + 0.0 AS mean_rank,
           round(q.q_stat, 4) + 0.0 AS q_stat,
           CAST(4 AS BIGINT) AS df
    FROM rj CROSS JOIN nb CROSS JOIN q
    """,
)
def friedman_priority_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric blocked comparison — the Friedman test: does order
    priority shift monthly revenue when MONTH is controlled as a block?
    Within each complete month-block the five priorities are average-
    ranked (rank = #smaller + (#tied+1)/2, the tie-exact form) and the
    tie-corrected statistic Q = (k-1)*Sum_j(R_j - n(k+1)/2)^2 /
    (Sum r^2 - nk(k+1)^2/4) ~ chi2(k-1) is emitted alongside each
    priority's mean rank. Cell values are exact integer cents; ranks
    are exact multiples of 0.5 and every squared term an exact multiple
    of 0.25, so ALL sums are order-independent exact doubles — no
    cross-engine float risk anywhere. One corpus shuffle to ~400
    (month x priority) cells; the in-block ranking is a 25-pairs-per-
    block self-join on the tiny cell grid."""
    o = load_table(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("blk"),
        F.col("o_orderpriority").alias("trt"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    fb = (
        cell.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("ntrt"))
        .filter(F.col("ntrt") == 5)
        .select("blk")
    )
    c2 = cell.join(fb, "blk").localCheckpoint()  # grid reused by 4 subtrees
    a = c2.select(
        F.col("blk").alias("a_blk"),
        F.col("trt").alias("a_trt"),
        F.col("v").alias("a_v"),
    )
    bb = c2.select(F.col("blk").alias("b_blk"), F.col("v").alias("b_v"))
    r = (
        a.join(bb, F.col("a_blk") == F.col("b_blk"))
        .groupBy(F.col("a_blk").alias("blk"), F.col("a_trt").alias("trt"))
        .agg(
            (
                F.sum(
                    F.when(F.col("b_v") < F.col("a_v"), 1.0)
                    .when(F.col("b_v") == F.col("a_v"), 0.5)
                    .otherwise(0.0)
                )
                + F.lit(0.5)
            ).alias("rnk")
        )
        .localCheckpoint()  # ranks reused by rj and ss
    )
    nb = c2.agg(F.countDistinct("blk").cast("bigint").alias("nb"))
    rj = r.groupBy("trt").agg(F.sum("rnk").alias("r_j"))
    ss = r.agg(F.sum(F.col("rnk") * F.col("rnk")).alias("sum_r2"))
    q = (
        rj.crossJoin(F.broadcast(nb))  # 5x1x1 scalar attaches
        .crossJoin(F.broadcast(ss))
        .groupBy("nb", "sum_r2")
        .agg(
            F.sum(
                (F.col("r_j") - 3.0 * F.col("nb"))
                * (F.col("r_j") - 3.0 * F.col("nb"))
            ).alias("num")
        )
        .select(
            F.when(
                F.col("sum_r2") - 45.0 * F.col("nb") > 0,
                4.0 * F.col("num") / (F.col("sum_r2") - 45.0 * F.col("nb")),
            )
            .otherwise(F.lit(0.0))
            .alias("q_stat")
        )
    )
    return (
        rj.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(q))
        .select(
            F.col("trt").alias("priority"),
            F.col("nb").alias("n_blocks"),
            r4(F.col("r_j") / F.col("nb")).alias("mean_rank"),
            r4(F.col("q_stat")).alias("q_stat"),
            F.lit(4).cast("bigint").alias("df"),
        )
    )


@register(
    "logrank_cohort_test",
    oracle="""
    WITH span AS (
      SELECT user_id, min(ts) AS first_ts,
             arg_min(event_type, strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                     || '#' || lpad(CAST(event_id AS VARCHAR), 12, '0'))
               AS cohort
      FROM events GROUP BY 1
    ),
    conv AS (
      SELECT user_id, min(ts) AS conv_ts FROM events
      WHERE event_type = 'purchase' AND value >= 95 GROUP BY 1
    ),
    horizon AS (SELECT max(ts) AS h FROM events),
    obs AS MATERIALIZED (
      SELECT CASE WHEN s.cohort = 'view' THEN 1 ELSE 0 END AS grp,
             CASE WHEN c.user_id IS NOT NULL
                  THEN CAST(date_diff('day', s.first_ts, c.conv_ts) AS BIGINT)
                  ELSE CAST(date_diff('day', s.first_ts, h) AS BIGINT) END AS t,
             CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END AS death
      FROM span s LEFT JOIN conv c USING (user_id) CROSS JOIN horizon
      WHERE s.cohort IN ('view', 'click')
    ),
    ended_all AS MATERIALIZED (
      SELECT grp, t, CAST(count(*) AS BIGINT) AS ended,
             CAST(sum(death) AS BIGINT) AS d
      FROM obs GROUP BY 1, 2
    ),
    tot AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM obs GROUP BY 1),
    times AS (SELECT t FROM obs WHERE death = 1 GROUP BY 1),
    risk AS MATERIALIZED (
      SELECT times.t AS tau, tot.grp,
             tot.n - coalesce(sum(CASE WHEN e.t < times.t THEN e.ended END), 0)
               AS n_risk,
             coalesce(sum(CASE WHEN e.t = times.t THEN e.d END), 0) AS d_g
      FROM times CROSS JOIN tot
      LEFT JOIN ended_all e ON e.grp = tot.grp AND e.t <= times.t
      GROUP BY 1, 2, tot.n
    ),
    terms AS (
      SELECT tau, sum(n_risk) AS nt, sum(d_g) AS dt,
             sum(CASE WHEN grp = 1 THEN n_risk ELSE 0 END) AS n1t,
             sum(CASE WHEN grp = 1 THEN d_g ELSE 0 END) AS d1t
      FROM risk GROUP BY 1
    ),
    lr AS (
      SELECT sum(d1t) AS o1, sum(dt * n1t * 1.0 / nt) AS e1,
             sum(CASE WHEN nt > 1
                      THEN dt * (n1t * 1.0 / nt) * (1 - n1t * 1.0 / nt)
                           * (nt - dt) * 1.0 / (nt - 1)
                      ELSE CAST(0 AS DOUBLE) END) AS v
      FROM terms WHERE dt > 0
    )
    SELECT CAST(o1 AS BIGINT) AS observed_view,
           round(e1, 4) + 0.0 AS expected_view,
           round(v, 4) + 0.0 AS variance,
           round(CASE WHEN v > 0 THEN (o1 - e1) * (o1 - e1) / v
                      ELSE CAST(0 AS DOUBLE) END, 4) + 0.0 AS chi2
    FROM lr
    """,
)
def logrank_cohort_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival comparison — the log-rank (Mantel-Cox) test between the
    'view'-first and 'click'-first cohorts on time-to-conversion, the
    hypothesis-test companion to kaplan_meier_churn's curves (same
    event/censoring definitions: first high-value purchase, censored at
    the horizon): O1 vs E1 = Sum d_t*n1t/nt with the hypergeometric
    variance, chi2 = (O1-E1)^2/V ~ chi2(1). At-risk counts come from a
    range join of per-(group, day) ending counts against the pooled
    death-day grid — both sides CALENDAR-bounded (days, not users), so
    the quadratic piece never scales with the corpus; the per-user scan
    is one shuffle. Every n/d is an integer; E1 and V are short sums of
    exact rationals (1-ulp noise at magnitude ~10^2, far from the r4
    boundary)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    span = (
        ev.withColumn("cohort", F.first("event_type").over(w))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.first("cohort").alias("cohort"))
    )
    conv = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") >= 95))
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    h = ev.agg(F.max("ts").alias("h"))
    obs = (
        span.filter(F.col("cohort").isin("view", "click"))
        .join(conv, on="user_id", how="left")
        .crossJoin(F.broadcast(h))
        .select(
            F.when(F.col("cohort") == "view", 1).otherwise(0).alias("grp"),
            F.when(
                F.col("conv_ts").isNotNull(),
                F.datediff(F.col("conv_ts"), F.col("first_ts")),
            )
            .otherwise(F.datediff(F.col("h"), F.col("first_ts")))
            .cast("bigint")
            .alias("t"),
            F.when(F.col("conv_ts").isNotNull(), 1).otherwise(0).alias("death"),
        )
        .localCheckpoint()  # day-bounded rows, consumed by three subtrees
    )
    ended_all = (
        obs.groupBy("grp", "t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ended"),
            F.sum("death").cast("bigint").alias("d"),
        )
        .select(
            F.col("grp").alias("e_grp"), F.col("t").alias("e_t"), "ended", "d"
        )
    )
    tot = obs.groupBy("grp").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    times = (
        obs.filter(F.col("death") == 1)
        .select("t")
        .distinct()
        .select(F.col("t").alias("tau"))
    )
    risk = (
        times.crossJoin(tot)  # death-days x 2 groups, broadcast-tiny
        .join(
            F.broadcast(ended_all),
            (F.col("e_grp") == F.col("grp")) & (F.col("e_t") <= F.col("tau")),
            "left",
        )
        .groupBy("tau", "grp", "n")
        .agg(
            (
                F.col("n")
                - F.coalesce(
                    F.sum(F.when(F.col("e_t") < F.col("tau"), F.col("ended"))),
                    F.lit(0),
                )
            ).alias("n_risk"),
            F.coalesce(
                F.sum(F.when(F.col("e_t") == F.col("tau"), F.col("d"))),
                F.lit(0),
            ).alias("d_g"),
        )
    )
    terms = risk.groupBy("tau").agg(
        F.sum("n_risk").alias("nt"),
        F.sum("d_g").alias("dt"),
        F.sum(F.when(F.col("grp") == 1, F.col("n_risk")).otherwise(0)).alias(
            "n1t"
        ),
        F.sum(F.when(F.col("grp") == 1, F.col("d_g")).otherwise(0)).alias(
            "d1t"
        ),
    )
    p1 = F.col("n1t") * 1.0 / F.col("nt")
    lr = terms.filter(F.col("dt") > 0).agg(
        F.sum("d1t").alias("o1"),
        F.sum(F.col("dt") * p1).alias("e1"),
        F.sum(
            F.when(
                F.col("nt") > 1,
                F.col("dt") * p1 * (1 - p1) * (F.col("nt") - F.col("dt"))
                * 1.0 / (F.col("nt") - 1),
            ).otherwise(F.lit(0.0))
        ).alias("v"),
    )
    return lr.select(
        F.col("o1").cast("bigint").alias("observed_view"),
        r4(F.col("e1")).alias("expected_view"),
        r4(F.col("v")).alias("variance"),
        r4(
            F.when(
                F.col("v") > 0,
                (F.col("o1") - F.col("e1")) * (F.col("o1") - F.col("e1"))
                / F.col("v"),
            ).otherwise(F.lit(0.0))
        ).alias("chi2"),
    )


@register(
    "cuped_variance_reduction",
    oracle="""
    WITH ocents AS (
      SELECT o_custkey,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END
               AS pre,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    cust AS MATERIALIZED (
      SELECT c_custkey, c_custkey % 2 AS arm,
             (coalesce(sum(CASE WHEN pre = 1 THEN cents END), 0) + 50) // 100
               AS x,
             (coalesce(sum(CASE WHEN pre = 0 THEN cents END), 0) + 50) // 100
               AS y
      FROM customer LEFT JOIN ocents ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    s AS (
      -- sums stay HUGEINT (int128): n*S products overflow BIGINT from
      -- ~sf0.1 (n*syy ~ 5e20 > 2^63); the Spark side mirrors with
      -- decimal(38,0)
      SELECT count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx,
             sum(x * y) AS sxy,
             sum(y * y) AS syy
      FROM cust
    ),
    c AS (
      SELECT n, n * sxy - sx * sy AS cxy, n * sxx - sx * sx AS cxx,
             n * syy - sy * sy AS cyy
      FROM s
    ),
    arms AS (
      SELECT CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
             CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
             CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1,
             CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0
      FROM cust
    )
    SELECT arms.n1 AS n_treat, arms.n0 AS n_ctrl,
           round(CASE WHEN c.cxx > 0 THEN c.cxy * 1.0 / c.cxx
                      ELSE CAST(0 AS DOUBLE) END, 4) + 0.0 AS theta,
           round(CASE WHEN c.cxx > 0 AND c.cyy > 0
                      THEN CAST(c.cxy AS DOUBLE)
                           / (sqrt(CAST(c.cxx AS DOUBLE))
                              * sqrt(CAST(c.cyy AS DOUBLE)))
                      ELSE CAST(0 AS DOUBLE) END, 4) + 0.0 AS corr_xy,
           round(CASE WHEN c.cxx > 0 AND c.cyy > 0
                      THEN (CAST(c.cxy AS DOUBLE) * CAST(c.cxy AS DOUBLE))
                           / (CAST(c.cxx AS DOUBLE) * CAST(c.cyy AS DOUBLE))
                      ELSE CAST(0 AS DOUBLE) END, 4) + 0.0 AS var_reduction,
           round(arms.sy1 * 1.0 / arms.n1 - arms.sy0 * 1.0 / arms.n0, 4) + 0.0
             AS diff_raw,
           round(arms.sy1 * 1.0 / arms.n1 - arms.sy0 * 1.0 / arms.n0
                 - CASE WHEN c.cxx > 0 THEN c.cxy * 1.0 / c.cxx
                        ELSE CAST(0 AS DOUBLE) END
                   * (arms.sx1 * 1.0 / arms.n1 - arms.sx0 * 1.0 / arms.n0),
                 4) + 0.0 AS diff_cuped
    FROM c CROSS JOIN arms
    """,
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation — CUPED (controlled experiments using pre-period
    data): theta = cov(X,Y)/var(X) over per-customer PRE-period revenue
    X and POST-period revenue Y (split at 1998-01-01, arm = custkey
    parity as the deterministic A/B assignment), then the treatment
    effect re-estimated on the adjusted metric Y - theta*(X - Xbar).
    Emits theta, corr, the variance-reduction factor rho^2, and the
    raw-vs-CUPED arm difference. All sufficient statistics are EXACT
    integers: per-customer totals are rounded to whole dollars, and the
    centered moments use the n*Sxy - Sx*Sy identity in decimal(38,0)
    (DuckDB: HUGEINT) — no float cancellation, exact to 1e38, which
    covers any realistic corpus (the earlier BIGINT envelope broke at
    sf0.1: n*sum(y^2) ~ 5e20 > 2^63). Per-row x*y products stay BIGINT
    (~2.5e13 per customer, SF-independent). One scan of orders, one
    broadcast-sized customer reduction — the 100 TB CUPED shape."""
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    ocents = o.select(
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("pre"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cust = (
        cst.select("c_custkey", (F.col("c_custkey") % 2).alias("arm"))
        .join(ocents, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "arm")
        .agg(
            F.expr(
                "div(coalesce(sum(CASE WHEN pre = 1 THEN cents END), 0) + 50,"
                " 100)"
            ).alias("x"),
            F.expr(
                "div(coalesce(sum(CASE WHEN pre = 0 THEN cents END), 0) + 50,"
                " 100)"
            ).alias("y"),
        )
        .localCheckpoint()  # consumed by the moment pass and the arm pass
    )
    # moments in decimal(38,0): exact like DuckDB's HUGEINT sums — the
    # n*S products overflow BIGINT from ~sf0.1 (n*syy ~ 5e20 > 2^63)
    dec = "decimal(38,0)"
    s = cust.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    ).select(
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cxy"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("cxx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("cyy"),
    )
    arms = cust.agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("sx1"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("sx0"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sy1"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sy0"),
    )
    theta = F.when(
        F.col("cxx") > 0, F.col("cxy") * 1.0 / F.col("cxx")
    ).otherwise(F.lit(0.0))
    dy = F.col("sy1") * 1.0 / F.col("n1") - F.col("sy0") * 1.0 / F.col("n0")
    dx = F.col("sx1") * 1.0 / F.col("n1") - F.col("sx0") * 1.0 / F.col("n0")
    pos = (F.col("cxx") > 0) & (F.col("cyy") > 0)
    return s.crossJoin(F.broadcast(arms)).select(  # 1-row scalar attach
        F.col("n1").alias("n_treat"),
        F.col("n0").alias("n_ctrl"),
        r4(theta).alias("theta"),
        r4(
            F.when(
                pos,
                F.col("cxy").cast("double")
                / (
                    F.sqrt(F.col("cxx").cast("double"))
                    * F.sqrt(F.col("cyy").cast("double"))
                ),
            ).otherwise(F.lit(0.0))
        ).alias("corr_xy"),
        r4(
            F.when(
                pos,
                (F.col("cxy").cast("double") * F.col("cxy").cast("double"))
                / (F.col("cxx").cast("double") * F.col("cyy").cast("double")),
            ).otherwise(F.lit(0.0))
        ).alias("var_reduction"),
        r4(dy).alias("diff_raw"),
        r4(dy - theta * dx).alias("diff_cuped"),
    )


@register(
    "pareto_skyline_parts",
    oracle="""
    WITH p AS MATERIALIZED (
      SELECT p_partkey, p_brand, p_size,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
    ),
    g AS MATERIALIZED (
      SELECT p_brand, p_size, min(cents) AS mc FROM p GROUP BY 1, 2
    ),
    pref AS (
      SELECT a.p_brand, a.p_size, min(b.mc) AS pm
      FROM g a JOIN g b ON a.p_brand = b.p_brand AND b.p_size < a.p_size
      GROUP BY 1, 2
    )
    SELECT p.p_brand AS brand, p.p_partkey AS partkey,
           CAST(p.p_size AS BIGINT) AS size,
           round(p.cents / 100.0, 4) + 0.0 AS price
    FROM p JOIN g ON p.p_brand = g.p_brand AND p.p_size = g.p_size
    LEFT JOIN pref ON p.p_brand = pref.p_brand AND p.p_size = pref.p_size
    WHERE p.cents = g.mc AND (pref.pm IS NULL OR p.cents < pref.pm)
    """,
)
def pareto_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-front) operator — per brand, the parts not
    DOMINATED on (size, price): no other same-brand part is <= on both
    dimensions and strictly < on one. The classic multi-objective
    shortlist query, computed WITHOUT the naive O(n^2) dominance
    self-join and WITHOUT any window over the corpus: one groupBy to
    the bounded (brand x size) grid (25x50 rows regardless of corpus
    size), a triangular self-join ON THAT GRID for the prefix-min over
    strictly smaller sizes, then one broadcast join back — a part
    survives iff it is the cheapest at its (brand, size) AND strictly
    cheaper than every smaller size's best. Prices compare as exact
    integer cents, so dominance is engine-independent; equal
    (size, price) twins are both kept (neither dominates)."""
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_partkey", "p_brand", "p_size",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
    )
    g = (
        p.groupBy("p_brand", "p_size")
        .agg(F.min("cents").alias("mc"))
        .localCheckpoint()  # bounded grid, reused by pref + the final join
    )
    a = g.select(
        F.col("p_brand").alias("a_brand"), F.col("p_size").alias("a_size")
    )
    bgrid = g.select(
        F.col("p_brand").alias("b_brand"),
        F.col("p_size").alias("b_size"),
        F.col("mc").alias("b_mc"),
    )
    pref = (
        a.join(
            bgrid,
            (F.col("a_brand") == F.col("b_brand"))
            & (F.col("b_size") < F.col("a_size")),
        )
        .groupBy(
            F.col("a_brand").alias("pf_brand"),
            F.col("a_size").alias("pf_size"),
        )
        .agg(F.min("b_mc").alias("pm"))
    )
    gmin = g.select(
        F.col("p_brand").alias("g_brand"),
        F.col("p_size").alias("g_size"),
        "mc",
    )
    out = (
        p.join(
            F.broadcast(gmin),
            (F.col("p_brand") == F.col("g_brand"))
            & (F.col("p_size") == F.col("g_size")),
        )
        .join(
            F.broadcast(pref),
            (F.col("p_brand") == F.col("pf_brand"))
            & (F.col("p_size") == F.col("pf_size")),
            "left",
        )
        .filter(
            (F.col("cents") == F.col("mc"))
            & (F.col("pm").isNull() | (F.col("cents") < F.col("pm")))
        )
    )
    return out.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("partkey"),
        F.col("p_size").cast("bigint").alias("size"),
        r4(F.col("cents") / 100.0).alias("price"),
    )


@register(
    "flesch_reading_ease",
    oracle="""
    WITH per_doc AS MATERIALIZED (
      SELECT lang, source,
             len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'))
               AS w,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
      FROM documents
    ),
    scored AS (
      SELECT lang, source, w, s, syl,
             CAST(206.835 AS DOUBLE)
             - CAST(1.015 AS DOUBLE) * (w * 1.0 / s)
             - CAST(84.6 AS DOUBLE) * (syl * 1.0 / w) AS flesch
      FROM per_doc WHERE w > 0
    )
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(w * 1.0 / s), 4) + 0.0 AS avg_words_per_sentence,
           round(avg(syl * 1.0 / w), 4) + 0.0 AS avg_syllables_per_word,
           round(avg(flesch), 4) + 0.0 AS avg_flesch,
           CAST(sum(CASE WHEN flesch < 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_very_hard
    FROM scored GROUP BY 1, 2
    """,
)
def flesch_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring — Flesch reading ease per (lang, source):
    206.835 - 1.015*(words/sentences) - 84.6*(syllables/word), the
    readability heuristic curation pipelines use to flag boilerplate
    and OCR junk. Words use the PINNED whitespace class (Java \\s and
    RE2 \\s differ on \\x0B); sentences are [.!?]+ runs floored at 1;
    syllables are the standard vowel-group [aeiouy]+ approximation.
    All three counts are integers from identical regexes, per-doc
    ratios are identical doubles, and the group averages add ~500
    identical doubles (1-ulp order noise at magnitude ~10^2 — far from
    the r4 boundary). One scan, one groupBy — pure Column expressions,
    no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    ws = "[ \t\n\x0B\f\r]"
    w = F.size(F.split(F.trim(F.col("text")), ws + "+"))
    s = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    )
    syl = F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
    scored = docs.select(
        "lang", "source", w.alias("w"), s.alias("s"), syl.alias("syl")
    ).filter(F.col("w") > 0).select(
        "lang", "source", "w", "s", "syl",
        (
            F.lit(206.835)
            - F.lit(1.015) * (F.col("w") * 1.0 / F.col("s"))
            - F.lit(84.6) * (F.col("syl") * 1.0 / F.col("w"))
        ).alias("flesch"),
    )
    return scored.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        r4(F.avg(F.col("w") * 1.0 / F.col("s"))).alias(
            "avg_words_per_sentence"
        ),
        r4(F.avg(F.col("syl") * 1.0 / F.col("w"))).alias(
            "avg_syllables_per_word"
        ),
        r4(F.avg("flesch")).alias("avg_flesch"),
        F.sum(F.when(F.col("flesch") < 30, 1).otherwise(0))
        .cast("bigint")
        .alias("n_very_hard"),
    )


@register(
    "hodges_lehmann_shift",
    oracle="""
    WITH u AS MATERIALIZED (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    ),
    l AS MATERIALIZED (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY 1
    ),
    d AS (SELECT u.cents - l.cents AS diff FROM u CROSS JOIN l)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_urgent_days,
           (SELECT CAST(count(*) AS BIGINT) FROM l) AS n_low_days,
           round((SELECT quantile_cont(cents, 0.5) FROM u) / 100.0, 4) + 0.0
             AS median_urgent,
           round((SELECT quantile_cont(cents, 0.5) FROM l) / 100.0, 4) + 0.0
             AS median_low,
           round((SELECT quantile_cont(diff, 0.5) FROM d) / 100.0, 4) + 0.0
             AS hl_shift
    """,
)
def hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust effect size — the Hodges-Lehmann shift estimator between
    the URGENT and LOW daily-revenue distributions: the median of ALL
    pairwise differences x_i - y_j, the location-shift estimate that
    pairs with mannwhitney_u_test the way a mean difference pairs with
    the t-test (50% breakdown vs the mean's 0%). Both series collapse
    to the CALENDAR-bounded day grid first (~2400 rows each regardless
    of corpus size), so the pairwise cross product is a broadcast
    nested loop over bounded grids (~5.8M diffs), never a corpus-scale
    quadratic. Daily totals are exact integer cents. The HL median is
    an exact percentile_cont-interpolated order statistic computed by
    a two-pass bucketed selection: pass 1 histograms the diffs into at
    most 65536 adaptive-width integer buckets (width derived from the
    grids' min/max, so the bucket frame is bounded BY CONSTRUCTION at
    any scale), a cumulative count over that bounded frame locates the
    <=2 buckets containing the target ranks, and pass 2 re-generates
    the diffs, keeps only those buckets, and ranks inside them with a
    bucket-PARTITIONED window over per-value counts (bounded by bucket
    width, not occupancy). Both passes are embarrassingly parallel;
    the alternatives measured at sf0.1: single-reduce exact percentile
    22s (one thread merges every distinct value), with_global_rank
    rank-join 7s (full 5.8M range-shuffle + checkpoint), this 1.6s."""
    o = load_table(spark, sf_dir, "orders")

    def daily(prio: str, nparts: int | None = None) -> DataFrame:
        g = (
            o.filter(F.col("o_orderpriority") == prio)
            .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
            .agg(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias("cents")
            )
        )
        if nparts:  # spread the broadcast nested loop across cores
            g = g.repartition(nparts)
        return g.localCheckpoint()  # day grid, consumed twice

    u = daily("1-URGENT", nparts=32)
    low = daily("5-LOW")
    su = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urgent_days"),
        F.percentile(F.col("cents"), F.lit(0.5)).alias("mu"),
        F.min("cents").alias("u_min"),
        F.max("cents").alias("u_max"),
    )
    sl = low.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_low_days"),
        F.percentile(F.col("cents"), F.lit(0.5)).alias("ml"),
        F.min("cents").alias("l_min"),
        F.max("cents").alias("l_max"),
    )
    # percentile_cont(0.5) = v[k0] + frac*(v[k0+1] - v[k0]) on 1-based
    # ranks, r = 1 + 0.5*(N-1); integers + frac of exactly 0/0.5 make
    # the interpolation bit-identical to DuckDB's quantile_cont
    base = (
        su.crossJoin(F.broadcast(sl))
        .withColumn("N", F.col("n_urgent_days") * F.col("n_low_days"))
        .withColumn("r", F.lit(1.0) + (F.col("N") - 1) / F.lit(2.0))
        .withColumn("k0", F.floor("r").cast("bigint"))
        .withColumn("frac", F.col("r") - F.floor("r"))
        .withColumn("k1", F.least(F.col("k0") + 1, F.col("N")))
        .withColumn("dmin", F.col("u_min") - F.col("l_max"))
        .withColumn(
            "width",
            F.greatest(
                F.lit(1).cast("bigint"),
                F.ceil(
                    (F.col("u_max") - F.col("l_min") - F.col("dmin") + 1)
                    / F.lit(65536.0)
                ).cast("bigint"),
            ),
        )
        .localCheckpoint()  # 1 row; feeds both passes AND the emit
    )

    def diffs() -> DataFrame:  # regenerated per pass — cheap arithmetic
        return (
            u.select(F.col("cents").alias("u_c"))
            .crossJoin(F.broadcast(low.select(F.col("cents").alias("l_c"))))
            .crossJoin(F.broadcast(base.select("dmin", "width")))
            .select(
                (F.col("u_c") - F.col("l_c")).alias("diff"),
                F.expr("(u_c - l_c - dmin) div width").alias("b"),
            )
        )

    bc = diffs().groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    # global-ordered window over the bucket frame: bounded at 65536
    # rows by the adaptive width (plan-sweep allowlisted)
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    bcum = bc.select("b", "c", F.sum("c").over(wcum).alias("cum"))
    sel = (
        bcum.crossJoin(F.broadcast(base.select("k0", "k1")))
        .filter((F.col("cum") >= F.col("k0")) & (F.col("cum") - F.col("c") < F.col("k1")))
        .select("b", (F.col("cum") - F.col("c")).alias("before"))
    )
    ex = (
        diffs()
        .join(F.broadcast(sel), "b")
        .groupBy("b", "before", "diff")
        .agg(F.count(F.lit(1)).alias("cv"))
    )
    wb = (
        Window.partitionBy("b")
        .orderBy("diff")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    inbkt = ex.withColumn("cin", F.sum("cv").over(wb)).crossJoin(
        F.broadcast(base.select("k0", "k1"))
    )
    hit = lambda k: (  # noqa: E731 — rank k lands on this value's run
        (F.col("cin") - F.col("cv") < F.col(k) - F.col("before"))
        & (F.col(k) - F.col("before") <= F.col("cin"))
    )
    picked = inbkt.groupBy().agg(
        F.min(F.when(hit("k0"), F.col("diff"))).alias("v0"),
        F.min(F.when(hit("k1"), F.col("diff"))).alias("v1"),
    )
    md = F.col("v0") + F.col("frac") * (
        F.coalesce(F.col("v1"), F.col("v0")) - F.col("v0")
    )
    return base.crossJoin(F.broadcast(picked)).select(  # 1-row attach
        "n_urgent_days",
        "n_low_days",
        r4(F.col("mu") / 100.0).alias("median_urgent"),
        r4(F.col("ml") / 100.0).alias("median_low"),
        r4(md / 100.0).alias("hl_shift"),
    )


@register(
    "price_index_fisher",
    oracle="""
    WITH ly AS MATERIALIZED (
      SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS yr, l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    base AS MATERIALIZED (
      SELECT l_partkey, cents AS c0, qty AS q0 FROM ly WHERE yr = 1995
    ),
    j AS (
      SELECT ly.yr, ly.cents AS ct, ly.qty AS qt, base.c0, base.q0
      FROM ly JOIN base USING (l_partkey) WHERE ly.yr > 1995
    ),
    ix AS (
      SELECT yr, CAST(count(*) AS BIGINT) AS n_parts,
             sum((ct * 1.0 / qt) * q0) / sum((c0 * 1.0 / q0) * q0) AS lasp,
             sum((ct * 1.0 / qt) * qt) / sum((c0 * 1.0 / q0) * qt) AS paas
      FROM j GROUP BY 1
    )
    SELECT yr AS year, n_parts,
           round(lasp, 4) + 0.0 AS laspeyres,
           round(paas, 4) + 0.0 AS paasche,
           round(sqrt(lasp * paas), 4) + 0.0 AS fisher
    FROM ix
    """,
)
def price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic index numbers — Laspeyres (base-year basket), Paasche
    (current basket) and Fisher (their geometric mean) price indices
    per year vs the 1995 base, over part unit values (yearly revenue /
    yearly quantity per part, matched to parts traded in the base
    year). The index-number machinery every pricing/inflation dashboard
    runs: one corpus shuffle to (year x part) integer sufficient
    statistics (exact cents + integer quantities), one partkey join
    against the base-year slice, one per-year reduction. Unit values
    are identical doubles from exact integers; the basket sums carry
    1-ulp add-order noise at ~10^8 magnitude, so ONLY the ratio indices
    (~1.0) are emitted, never the raw basket sums (SCALE.md round(,4)
    magnitude rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    ly = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.date_format("o_orderdate", "yyyy").cast("bigint").alias("yr"),
            "l_partkey",
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
            F.sum(F.round(F.col("l_quantity")).cast("bigint"))
            .cast("bigint")
            .alias("qty"),
        )
        .localCheckpoint()  # (year x part) stats, consumed twice
    )
    base = ly.filter(F.col("yr") == 1995).select(
        F.col("l_partkey").alias("b_partkey"),
        F.col("cents").alias("c0"),
        F.col("qty").alias("q0"),
    )
    j = ly.filter(F.col("yr") > 1995).join(
        base, F.col("l_partkey") == F.col("b_partkey")
    )
    pt = F.col("cents") * 1.0 / F.col("qty")
    p0 = F.col("c0") * 1.0 / F.col("q0")
    ix = j.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        (F.sum(pt * F.col("q0")) / F.sum(p0 * F.col("q0"))).alias("lasp"),
        (F.sum(pt * F.col("qty")) / F.sum(p0 * F.col("qty"))).alias("paas"),
    )
    return ix.select(
        F.col("yr").alias("year"),
        "n_parts",
        r4(F.col("lasp")).alias("laspeyres"),
        r4(F.col("paas")).alias("paasche"),
        r4(F.sqrt(F.col("lasp") * F.col("paas"))).alias("fisher"),
    )


@register(
    "empirical_bayes_shrinkage",
    oracle="""
    WITH g AS MATERIALIZED (
      SELECT p.p_brand AS brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    pr AS (
      SELECT avg(d * 1.0 / n) AS m,
             CASE WHEN count(*) > 1
                  THEN greatest(
                         (sum((d * 1.0 / n) * (d * 1.0 / n))
                          - count(*) * avg(d * 1.0 / n) * avg(d * 1.0 / n))
                         / (count(*) - 1),
                         CAST(0 AS DOUBLE))
                  ELSE CAST(0 AS DOUBLE) END AS v
      FROM g
    ),
    ab AS (
      SELECT CASE WHEN v > 0 AND m * (1 - m) / v - 1 > 0
                  THEN m * (m * (1 - m) / v - 1)
                  ELSE CAST(0 AS DOUBLE) END AS alpha,
             CASE WHEN v > 0 AND m * (1 - m) / v - 1 > 0
                  THEN (1 - m) * (m * (1 - m) / v - 1)
                  ELSE CAST(0 AS DOUBLE) END AS beta
      FROM pr
    )
    SELECT g.brand, g.n,
           round(g.d * 1.0 / g.n, 4) + 0.0 AS rate_raw,
           round((g.d + ab.alpha) / (g.n + ab.alpha + ab.beta), 4) + 0.0
             AS rate_shrunk,
           round(CASE WHEN ab.alpha + ab.beta > 0
                      THEN g.n / (g.n + ab.alpha + ab.beta)
                      ELSE CAST(1 AS DOUBLE) END, 4) + 0.0 AS weight_data
    FROM g CROSS JOIN ab
    """,
)
def empirical_bayes_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical estimation — empirical-Bayes (beta-binomial) shrinkage
    of per-brand return rates toward the grand prior: method-of-moments
    prior (alpha+beta = m(1-m)/v - 1 from the mean/variance of the
    per-brand rates), posterior rate (d+alpha)/(n+alpha+beta) — the
    James-Stein-style partial pooling every CTR / quality-score
    pipeline uses to stop small groups from dominating a ranking. ALL
    groups are emitted (no top-k on the shrunk double — the cross-
    engine ranking hazard rfm taught). One corpus shuffle to 25 brand
    rows; the prior is a second tiny reduction; the one-pass variance
    is guarded with greatest(v, 0) on both sides (the jackknife
    cancellation lesson) and the degenerate prior (v = 0 or negative
    moment estimate) falls back to no shrinkage identically."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    g = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("d"),
        )
        .localCheckpoint()  # 25 rows, consumed by the prior and the output
    )
    rate = F.col("d") * 1.0 / F.col("n")
    pr = g.agg(
        F.avg(rate).alias("m"),
        F.count(F.lit(1)).alias("k"),
        F.sum(rate * rate).alias("s2"),
    ).select(
        "m",
        F.when(
            F.col("k") > 1,
            F.greatest(
                (F.col("s2") - F.col("k") * F.col("m") * F.col("m"))
                / (F.col("k") - 1),
                F.lit(0.0),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("v"),
    )
    strength = F.col("m") * (1 - F.col("m")) / F.col("v") - 1
    ok = (F.col("v") > 0) & (strength > 0)
    ab = pr.select(
        F.when(ok, F.col("m") * strength).otherwise(F.lit(0.0)).alias("alpha"),
        F.when(ok, (1 - F.col("m")) * strength)
        .otherwise(F.lit(0.0))
        .alias("beta"),
    )
    return g.crossJoin(F.broadcast(ab)).select(  # 1-row scalar attach
        "brand",
        "n",
        r4(rate).alias("rate_raw"),
        r4(
            (F.col("d") + F.col("alpha"))
            / (F.col("n") + F.col("alpha") + F.col("beta"))
        ).alias("rate_shrunk"),
        r4(
            F.when(
                F.col("alpha") + F.col("beta") > 0,
                F.col("n") / (F.col("n") + F.col("alpha") + F.col("beta")),
            ).otherwise(F.lit(1.0))
        ).alias("weight_data"),
    )


# ---------------------------------------------------------------------------
# r10 batch 2 — paired nonparametrics, serial-correlation diagnostics,
# drawdown analytics, species-richness estimation, stratified 2x2 testing
# ---------------------------------------------------------------------------


@register(
    "wilcoxon_signed_rank",
    oracle="""
    WITH g AS MATERIALIZED (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             sum(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
               AS uc,
             sum(CASE WHEN o_orderpriority = '5-LOW'
                      THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
               AS lc
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT uc - lc AS diff FROM g
      WHERE uc IS NOT NULL AND lc IS NOT NULL AND uc <> lc
    ),
    byabs AS (
      SELECT abs(diff) AS a, CAST(count(*) AS BIGINT) AS t,
             CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS pos
      FROM d GROUP BY 1
    ),
    rk AS (
      SELECT a, t, pos,
             sum(t) OVER (ORDER BY a
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM byabs
    ),
    s AS (
      SELECT CAST(sum(t) AS BIGINT) AS n,
             sum(pos * (2.0 * (cum - t) + t + 1) / 2.0) AS wplus,
             CAST(sum(t * t * t - t) AS BIGINT) AS ties
      FROM rk
    )
    SELECT n AS n_pairs, round(wplus, 4) + 0.0 AS w_plus,
           round(CASE WHEN n * (n + 1.0) * (2.0 * n + 1) / 24.0
                           - ties / 48.0 > 0
                      THEN (wplus - n * (n + 1.0) / 4.0)
                           / sqrt(n * (n + 1.0) * (2.0 * n + 1) / 24.0
                                  - ties / 48.0)
                      ELSE CAST(0 AS DOUBLE) END, 4) + 0.0 AS z_stat
    FROM s
    """,
)
def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired nonparametric test — Wilcoxon signed-rank over the
    URGENT-vs-LOW daily-revenue pairs (paired on calendar day, the
    within-day pairing mannwhitney_u_test's unpaired design throws
    away): signed ranks of |d| with midrank ties, W+ and the normal
    approximation z with the exact tie correction Σ(t³−t)/48. One
    corpus scan collapses to the calendar-bounded day grid via
    conditional aggregation; the rank pass is a cumulative count over
    the |d|-value grid (≤ #days rows — plan-sweep allowlisted), so
    ranks are order-independent EXACT half-integers: W+ sums .5
    multiples of integer counts and hashes identically on both
    engines."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    g = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", cents)).alias("uc"),
        F.sum(F.when(F.col("o_orderpriority") == "5-LOW", cents)).alias("lc"),
    )
    d = g.filter(
        F.col("uc").isNotNull()
        & F.col("lc").isNotNull()
        & (F.col("uc") != F.col("lc"))
    ).select((F.col("uc") - F.col("lc")).alias("diff"))
    byabs = d.groupBy(F.abs("diff").alias("a")).agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("pos"),
    )
    wcum = Window.orderBy("a").rowsBetween(Window.unboundedPreceding, 0)
    rk = byabs.select(
        "t", "pos", F.sum("t").over(wcum).alias("cum")
    )
    s = rk.agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(
            F.col("pos") * (2.0 * (F.col("cum") - F.col("t")) + F.col("t") + 1)
            / 2.0
        ).alias("wplus"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("ties"),
    )
    var = (
        F.col("n") * (F.col("n") + 1.0) * (2.0 * F.col("n") + 1) / 24.0
        - F.col("ties") / 48.0
    )
    return s.select(
        F.col("n").alias("n_pairs"),
        r4(F.col("wplus")).alias("w_plus"),
        r4(
            F.when(
                var > 0,
                (F.col("wplus") - F.col("n") * (F.col("n") + 1.0) / 4.0)
                / F.sqrt(var),
            ).otherwise(F.lit(0.0))
        ).alias("z_stat"),
    )


@register(
    "durbin_watson_trend",
    oracle="""
    WITH g AS MATERIALIZED (
      SELECT CAST(o_orderdate AS DATE) AS dayd,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1
    ),
    tg AS MATERIALIZED (
      SELECT datediff('day', (SELECT min(dayd) FROM g), dayd) + 1 AS t, y
      FROM g
    ),
    s AS (
      SELECT count(*) AS n, sum(t) AS st, sum(y) AS sy,
             sum(t * t) AS stt, sum(t * y) AS sty
      FROM tg
    ),
    p AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(n * sty - st * sy AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) AS b,
             CAST(sy AS DOUBLE) AS syd, CAST(st AS DOUBLE) AS std,
             CAST(n AS DOUBLE) AS nd
      FROM s
    ),
    res AS (
      SELECT t,
             CAST(round(y - ((syd - b * std) / nd) - b * t) AS BIGINT) AS e
      FROM tg CROSS JOIN p
    ),
    lagd AS (
      SELECT e, lag(e) OVER (ORDER BY t) AS ep FROM res
    ),
    dws AS (
      SELECT sum(CASE WHEN ep IS NOT NULL
                      THEN (e - ep) * (e - ep) END) AS num,
             sum(e * e) AS den
      FROM lagd
    )
    SELECT p.n AS n_days,
           round(p.b / 100.0, 4) + 0.0 AS slope_dollars_per_day,
           round(CAST(dws.num AS DOUBLE) / CAST(dws.den AS DOUBLE), 4) + 0.0
             AS dw_stat,
           round(1.0 - CAST(dws.num AS DOUBLE) / CAST(dws.den AS DOUBLE)
                 / 2.0, 4) + 0.0 AS rho_approx
    FROM dws CROSS JOIN p
    """,
)
def durbin_watson_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serial-correlation diagnostic — Durbin-Watson on the residuals
    of the daily-revenue linear trend: OLS (a, b) from exact integer
    sufficient statistics in decimal(38,0) (DuckDB: HUGEINT — the cuped
    idiom; Σt·y reaches ~3e15 at sf0.1 and would pass 2^63 near sf100),
    then DW = Σ(eₜ−eₜ₋₁)²/Σeₜ². Residuals are SNAPPED TO INTEGER CENTS
    before the quadratic sums, so both engines sum identical integers
    in any order — the one float step (a, b and the per-row e before
    rounding) is an identical expression tree on identical exact inputs.
    The lag runs on the calendar-bounded day grid (allowlisted); the
    corpus pays one scan + one day-grid reduction."""
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    g = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("dayd"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "y"
            )
        )
        .localCheckpoint()  # day grid: feeds the moments AND the residuals
    )
    m = g.agg(F.min("dayd").alias("d0"))
    tg = g.crossJoin(F.broadcast(m)).select(
        (F.datediff(F.col("dayd"), F.col("d0")) + 1).alias("t"), "y"
    )
    s = tg.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("t").cast(dec)).alias("st"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("t") * F.col("t")).cast(dec)).alias("stt"),
        F.sum((F.col("t").cast("bigint") * F.col("y")).cast(dec)).alias("sty"),
    )
    p = s.select(
        F.col("n").cast("bigint").alias("n"),
        (
            (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast(
                "double"
            )
        ).alias("b"),
        F.col("sy").cast("double").alias("syd"),
        F.col("st").cast("double").alias("std"),
        F.col("n").cast("double").alias("nd"),
    ).localCheckpoint()  # 1 row; feeds the residual pass AND the emit
    res = tg.crossJoin(F.broadcast(p)).select(
        "t",
        F.round(
            F.col("y")
            - (F.col("syd") - F.col("b") * F.col("std")) / F.col("nd")
            - F.col("b") * F.col("t")
        )
        .cast("bigint")
        .alias("e"),
    )
    wlag = Window.orderBy("t")
    lagd = res.select("e", F.lag("e").over(wlag).alias("ep"))
    dws = lagd.agg(
        F.sum(
            F.when(
                F.col("ep").isNotNull(),
                ((F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep"))).cast(
                    dec
                ),
            )
        ).alias("num"),
        F.sum((F.col("e") * F.col("e")).cast(dec)).alias("den"),
    )
    dw = F.col("num").cast("double") / F.col("den").cast("double")
    return dws.crossJoin(F.broadcast(p)).select(  # 1-row scalar attach
        F.col("n").alias("n_days"),
        r4(F.col("b") / 100.0).alias("slope_dollars_per_day"),
        r4(dw).alias("dw_stat"),
        r4(1.0 - dw / 2.0).alias("rho_approx"),
    )


@register(
    "max_drawdown_daily",
    oracle="""
    WITH g AS (
      SELECT CAST(o_orderdate AS DATE) AS dayd,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT y, max(y) OVER (ORDER BY dayd
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS runmax
      FROM g
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(max(1.0 - y * 1.0 / runmax), 4) + 0.0 AS max_drawdown,
           CAST(sum(CASE WHEN y < runmax THEN 1 ELSE 0 END) AS BIGINT)
             AS underwater_days
    FROM r
    """,
)
def max_drawdown_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Risk analytics — maximum drawdown of the daily-revenue series:
    the largest peak-to-trough decline 1 − y/runmax against the running
    maximum, plus the number of underwater days (strict integer compare
    y < runmax, no float threshold). The running max is a cumulative
    window over the calendar-bounded day grid (allowlisted); the corpus
    pays one scan + one day-grid reduction. Integer cents make the
    ratio identical doubles on both engines."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(F.col("o_orderdate").cast("date").alias("dayd")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("y")
    )
    wrun = Window.orderBy("dayd").rowsBetween(Window.unboundedPreceding, 0)
    r = g.select("y", F.max("y").over(wrun).alias("runmax"))
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        r4(F.max(1.0 - F.col("y") * 1.0 / F.col("runmax"))).alias(
            "max_drawdown"
        ),
        F.sum(F.when(F.col("y") < F.col("runmax"), 1).otherwise(0))
        .cast("bigint")
        .alias("underwater_days"),
    )


@register(
    "chao1_vocab_richness",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)),
                                       '[ \\t\\n\\x0B\\f\\r]+')) AS tok
      FROM documents
    ),
    tf AS (SELECT tok, count(*) AS f FROM tok WHERE tok <> '' GROUP BY 1),
    fof AS (SELECT f, CAST(count(*) AS BIGINT) AS m FROM tf GROUP BY 1),
    s AS (
      SELECT CAST(sum(m) AS BIGINT) AS d,
             CAST(coalesce(sum(CASE WHEN f = 1 THEN m END), 0) AS BIGINT)
               AS f1,
             CAST(coalesce(sum(CASE WHEN f = 2 THEN m END), 0) AS BIGINT)
               AS f2,
             CAST(coalesce(sum(CASE WHEN f <= 10 THEN m END), 0) AS BIGINT)
               AS srare,
             CAST(coalesce(sum(CASE WHEN f <= 10 THEN f * m END), 0)
                  AS BIGINT) AS nrare,
             CAST(coalesce(sum(CASE WHEN f > 10 THEN m END), 0) AS BIGINT)
               AS sabund,
             CAST(coalesce(sum(CASE WHEN f <= 10 THEN f * (f - 1) * m END),
                           0) AS BIGINT) AS frare2
      FROM fof
    )
    SELECT d AS vocab_observed, f1 AS singletons, f2 AS doubletons,
           round(d + f1 * (f1 - 1.0) / (2.0 * (f2 + 1)), 4) + 0.0
             AS chao1_estimate,
           round(CASE WHEN nrare > 1 AND nrare > f1 THEN
             sabund + srare / (1.0 - f1 * 1.0 / nrare)
             + f1 / (1.0 - f1 * 1.0 / nrare)
               * greatest((srare / (1.0 - f1 * 1.0 / nrare))
                          * frare2 / (nrare * (nrare - 1.0)) - 1.0, 0.0)
             END, 4) + 0.0 AS ace_estimate
    FROM s
    """,
)
def chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation — unseen-vocabulary estimation: the Chao1
    richness estimator (bias-corrected, D + f1(f1−1)/(2(f2+1))) and ACE
    (abundance-based coverage, rare cutoff 10) from the token
    frequency-of-frequencies. good_turing_unseen_mass prices the
    probability mass of unseen TOKENS; this estimates how many unseen
    TYPES remain — the 'how much more corpus do we need' planning
    number. Whitespace pinned to the engine-independent class (SCALE.md
    §29). Two shuffles: corpus→token counts, counts→the tiny fof grid;
    every emitted float derives from exact integers."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(F.lower(F.trim("text")), "[ \t\n\x0B\f\r]+")
            ).alias("tok")
        )
        .filter(F.col("tok") != "")
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    fof = tf.groupBy("f").agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    z = F.lit(0).cast("bigint")
    s = fof.agg(
        F.sum("m").cast("bigint").alias("d"),
        F.coalesce(F.sum(F.when(F.col("f") == 1, F.col("m"))), z)
        .cast("bigint")
        .alias("f1"),
        F.coalesce(F.sum(F.when(F.col("f") == 2, F.col("m"))), z)
        .cast("bigint")
        .alias("f2"),
        F.coalesce(F.sum(F.when(F.col("f") <= 10, F.col("m"))), z)
        .cast("bigint")
        .alias("srare"),
        F.coalesce(
            F.sum(F.when(F.col("f") <= 10, F.col("f") * F.col("m"))), z
        )
        .cast("bigint")
        .alias("nrare"),
        F.coalesce(F.sum(F.when(F.col("f") > 10, F.col("m"))), z)
        .cast("bigint")
        .alias("sabund"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("f") <= 10,
                    F.col("f") * (F.col("f") - 1) * F.col("m"),
                )
            ),
            z,
        )
        .cast("bigint")
        .alias("frare2"),
    )
    crare = 1.0 - F.col("f1") * 1.0 / F.col("nrare")
    ace = (
        F.col("sabund")
        + F.col("srare") / crare
        + F.col("f1")
        / crare
        * F.greatest(
            (F.col("srare") / crare)
            * F.col("frare2")
            / (F.col("nrare") * (F.col("nrare") - 1.0))
            - 1.0,
            F.lit(0.0),
        )
    )
    return s.select(
        F.col("d").alias("vocab_observed"),
        F.col("f1").alias("singletons"),
        F.col("f2").alias("doubletons"),
        r4(
            F.col("d")
            + F.col("f1") * (F.col("f1") - 1.0) / (2.0 * (F.col("f2") + 1))
        ).alias("chao1_estimate"),
        r4(
            F.when(
                (F.col("nrare") > 1) & (F.col("nrare") > F.col("f1")), ace
            )
        ).alias("ace_estimate"),
    )


@register(
    "cmh_return_rate",
    oracle="""
    WITH ret AS MATERIALIZED (
      SELECT l_orderkey,
             max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
      FROM lineitem GROUP BY 1
    ),
    rows_ AS (
      SELECT r_name,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS x,
             ret.ret AS yy
      FROM orders
      JOIN ret ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    ),
    st AS (
      SELECT r_name, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS n1,
             CAST(sum(yy) AS BIGINT) AS nc1,
             CAST(sum(x * yy) AS BIGINT) AS n11
      FROM rows_ GROUP BY 1
    ),
    terms AS (
      SELECT sum(n11 - n1 * 1.0 * nc1 / n) AS dev,
             sum(n1 * 1.0 * (n - n1) * nc1 * (n - nc1)
                 / (n * 1.0 * n * (n - 1))) AS var,
             sum((n11 * 1.0 * ((n - n1) - (nc1 - n11))) / n) AS ornum,
             sum(((n1 - n11) * 1.0 * (nc1 - n11)) / n) AS orden,
             CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum(n) AS BIGINT) AS n_total
      FROM st
    )
    SELECT n_strata, n_total,
           round(dev * dev / var, 4) + 0.0 AS cmh_chi2,
           round(ornum / orden, 4) + 0.0 AS mh_odds_ratio
    FROM terms
    """,
)
def cmh_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 2x2 testing — Cochran-Mantel-Haenszel: does URGENT
    priority associate with item returns AFTER controlling for region?
    The stratified companion to chi_square_independence (which pools and
    is Simpson-vulnerable — simpson_paradox_check shows why pooling
    lies). Per-region 2x2 margins from exact integer counts, the CMH
    χ² (no continuity correction) and the Mantel-Haenszel common odds
    ratio as 5-term double reductions — per-term doubles are identical
    expression trees on exact integers, so only the final 5-element sum
    carries the shared r4 guard-band risk. One lineitem→order
    reduction, one orders⋈customer shuffle, broadcast nation/region
    dims — the canonical star-join shape."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    na = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    re_ = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    ret = li.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "ret"
        )
    )
    rows = (
        o.join(ret, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cst, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re_), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "r_name",
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("x"),
            F.col("ret").alias("yy"),
        )
    )
    st = rows.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("n1"),
        F.sum("yy").cast("bigint").alias("nc1"),
        F.sum(F.col("x") * F.col("yy")).cast("bigint").alias("n11"),
    )
    terms = st.agg(
        F.sum(
            F.col("n11") - F.col("n1") * 1.0 * F.col("nc1") / F.col("n")
        ).alias("dev"),
        F.sum(
            F.col("n1")
            * 1.0
            * (F.col("n") - F.col("n1"))
            * F.col("nc1")
            * (F.col("n") - F.col("nc1"))
            / (F.col("n") * 1.0 * F.col("n") * (F.col("n") - 1))
        ).alias("var"),
        F.sum(
            (
                F.col("n11")
                * 1.0
                * ((F.col("n") - F.col("n1")) - (F.col("nc1") - F.col("n11")))
            )
            / F.col("n")
        ).alias("ornum"),
        F.sum(
            (
                (F.col("n1") - F.col("n11"))
                * 1.0
                * (F.col("nc1") - F.col("n11"))
            )
            / F.col("n")
        ).alias("orden"),
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    return terms.select(
        "n_strata",
        "n_total",
        r4(F.col("dev") * F.col("dev") / F.col("var")).alias("cmh_chi2"),
        r4(F.col("ornum") / F.col("orden")).alias("mh_odds_ratio"),
    )


@register(
    "shapley_channel_attribution",
    oracle="""
    WITH peru AS MATERIALIZED (
      SELECT user_id,
             CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  + 2 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                  + 4 * max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  + 8 * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS mask,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1
    ),
    cm AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS conv
           FROM peru GROUP BY 1),
    lat AS (SELECT unnest(range(0, 16)) AS s),
    v AS (
      SELECT s, CAST(coalesce(sum(conv), 0) AS BIGINT) AS v
      FROM lat LEFT JOIN cm ON (cm.mask & lat.s) = cm.mask
      GROUP BY 1
    ),
    ch AS (SELECT * FROM (VALUES ('click', CAST(1 AS BIGINT)),
                                 ('signup', CAST(2 AS BIGINT)),
                                 ('view', CAST(4 AS BIGINT)),
                                 ('error', CAST(8 AS BIGINT)))
           AS t(channel, bit)),
    pairs AS (
      SELECT ch.channel,
             ((v0.s & 1) + ((v0.s >> 1) & 1) + ((v0.s >> 2) & 1)
              + ((v0.s >> 3) & 1)) AS pc,
             v1.v - v0.v AS delta
      FROM ch
      JOIN v v0 ON (v0.s & ch.bit) = 0
      JOIN v v1 ON v1.s = (v0.s | ch.bit)
    ),
    phi AS (
      SELECT channel,
             CAST(sum((CASE WHEN pc IN (0, 3) THEN 6 ELSE 2 END) * delta)
                  AS BIGINT) AS phi24
      FROM pairs GROUP BY 1
    ),
    touch AS (
      SELECT channel,
             CAST(sum(CASE WHEN (mask & bit) > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS users_touched
      FROM peru CROSS JOIN ch GROUP BY 1
    )
    SELECT phi.channel AS channel, touch.users_touched,
           round(phi24 / 24.0, 4) + 0.0 AS shapley_conversions
    FROM phi JOIN touch USING (channel)
    """,
)
def shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution — EXACT Shapley values over the 4-channel coalition
    game (click/signup/view/error; purchase = conversion): v(S) = the
    number of converting users whose touched-channel set is contained
    in S, φᵢ = Σ_{S∌i} |S|!(3−|S|)!/4!·(v(S∪i)−v(S)). The game-theoretic
    answer to the position heuristics (last_touch_attribution,
    position_based_attribution) and the Markov removal-effect model
    (markov_absorption_conversion): efficiency guarantees Σφ equals the
    total attributable conversions. The corpus collapses to ≤16
    mask-level conversion counts in one shuffle; the 2⁴ coalition
    lattice, subset sums, and the 4×8 marginal table are broadcast-tiny
    joins at any corpus size. φ·24 is an INTEGER sum (weights 6/2/2/6),
    so the emission is an exact rational — no add-order float risk."""
    ev = load_table(spark, sf_dir, "events")
    bit_of = {"click": 1, "signup": 2, "view": 4, "error": 8}
    peru = ev.groupBy("user_id").agg(
        sum(
            F.max(F.when(F.col("event_type") == c, 1).otherwise(0)) * b
            for c, b in bit_of.items()
        )
        .cast("bigint")
        .alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    cm = peru.groupBy("mask").agg(F.sum("conv").cast("bigint").alias("conv"))
    lat = spark.range(16).select(F.col("id").alias("s"))
    v = (
        lat.join(
            F.broadcast(cm),
            cm["mask"].bitwiseAND(lat["s"]) == cm["mask"],
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv"), F.lit(0)).cast("bigint").alias("v"))
        .localCheckpoint()  # 16 rows, joined against itself below
    )
    ch = spark.createDataFrame(
        list(bit_of.items()), "channel string, bit long"
    )
    v0 = v.select(F.col("s").alias("s0"), F.col("v").alias("vwo"))
    v1 = v.select(F.col("s").alias("s1"), F.col("v").alias("vw"))
    pc = sum(
        F.shiftright(F.col("s0"), i).bitwiseAND(F.lit(1)) for i in range(4)
    )
    pairs = (
        F.broadcast(ch)
        .join(v0, v0["s0"].bitwiseAND(ch["bit"]) == 0)
        .join(v1, F.col("s1") == F.col("s0").bitwiseOR(F.col("bit")))
        .select(
            "channel",
            (
                F.when(pc.isin(0, 3), 6).otherwise(2)
                * (F.col("vw") - F.col("vwo"))
            ).alias("wdelta"),
        )
    )
    phi = pairs.groupBy("channel").agg(
        F.sum("wdelta").cast("bigint").alias("phi24")
    )
    touch = peru.crossJoin(F.broadcast(ch)).groupBy("channel").agg(
        F.sum(
            F.when(F.col("mask").bitwiseAND(F.col("bit")) > 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("users_touched")
    )
    return phi.join(touch, on="channel").select(
        "channel",
        "users_touched",
        r4(F.col("phi24") / 24.0).alias("shapley_conversions"),
    )


@register(
    "wasserstein_price_shift",
    oracle="""
    WITH o2 AS MATERIALIZED (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS u
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    st AS MATERIALIZED (
      SELECT CAST(sum(u) AS BIGINT) AS nu,
             CAST(sum(1 - u) AS BIGINT) AS nl,
             min(cents) AS cmin, max(cents) AS cmax,
             CAST(sum(CASE WHEN u = 1 THEN cents END) AS BIGINT) AS sumu,
             CAST(sum(CASE WHEN u = 0 THEN cents END) AS BIGINT) AS suml,
             greatest(CAST(1 AS BIGINT),
                      CAST(ceil((max(cents) - min(cents) + 1) / 65536.0)
                           AS BIGINT)) AS width
      FROM o2
    ),
    bc AS (
      SELECT (cents - cmin) // width AS b,
             CAST(sum(u) AS BIGINT) AS cu,
             CAST(sum(1 - u) AS BIGINT) AS cl
      FROM o2 CROSS JOIN st GROUP BY 1
    ),
    cum AS (
      SELECT b,
             sum(cu) OVER (ORDER BY b
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cumu,
             sum(cl) OVER (ORDER BY b
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cuml,
             lead(b) OVER (ORDER BY b) AS nb
      FROM bc
    ),
    s AS (
      SELECT sum(CASE WHEN nb IS NOT NULL
                      THEN abs(cumu * st.nl - cuml * st.nu) * (nb - b)
                 END) AS tot
      FROM cum CROSS JOIN st
    )
    SELECT st.nu AS n_urgent, st.nl AS n_low,
           st.width AS quant_width_cents,
           round(CAST(s.tot AS DOUBLE) * st.width
                 / (st.nu * 1.0 * st.nl) / 100.0, 4) + 0.0
             AS w1_dollars,
           round(st.sumu * 1.0 / st.nu / 100.0
                 - st.suml * 1.0 / st.nl / 100.0, 4) + 0.0
             AS mean_diff_dollars
    FROM s CROSS JOIN st
    """,
)
def wasserstein_price_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution distance — exact 1-Wasserstein (earth mover's)
    distance between the URGENT and LOW order-value distributions,
    quantized to ≤65536 adaptive-width integer-cent buckets (the
    hodges_lehmann histogram idiom): W1 = Σ|F_u−F_l|·Δv as the step
    integral over the bucket grid, with gaps between occupied buckets
    carried by lead(b). Where ks_two_sample reports the max CDF gap,
    W1 reports the AREA — the magnitude of the shift in dollars. The
    per-bucket term |cumu·Nl − cuml·Nu| is exact integer arithmetic
    (decimal(38,0) sum; DuckDB HUGEINT) — identical on both engines,
    no add-order float risk. One corpus scan → bucket reduction; the
    cumulative runs on the bounded bucket grid (allowlisted)."""
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    o2 = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("u"),
    )
    st = (
        o2.agg(
            F.sum("u").cast("bigint").alias("nu"),
            F.sum(1 - F.col("u")).cast("bigint").alias("nl"),
            F.min("cents").alias("cmin"),
            F.max("cents").alias("cmax"),
            F.sum(F.when(F.col("u") == 1, F.col("cents")))
            .cast("bigint")
            .alias("sumu"),
            F.sum(F.when(F.col("u") == 0, F.col("cents")))
            .cast("bigint")
            .alias("suml"),
        )
        .withColumn(
            "width",
            F.greatest(
                F.lit(1).cast("bigint"),
                F.ceil((F.col("cmax") - F.col("cmin") + 1) / F.lit(65536.0))
                .cast("bigint"),
            ),
        )
        .localCheckpoint()  # 1 row; feeds the bucket pass AND the emit
    )
    bc = (
        o2.crossJoin(F.broadcast(st.select("cmin", "width")))
        .groupBy(F.expr("(cents - cmin) div width").alias("b"))
        .agg(
            F.sum("u").cast("bigint").alias("cu"),
            F.sum(1 - F.col("u")).cast("bigint").alias("cl"),
        )
    )
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    wlead = Window.orderBy("b")
    cum = bc.select(
        "b",
        F.sum("cu").over(wcum).alias("cumu"),
        F.sum("cl").over(wcum).alias("cuml"),
        F.lead("b").over(wlead).alias("nb"),
    )
    s = cum.crossJoin(F.broadcast(st.select("nu", "nl"))).agg(
        F.sum(
            F.when(
                F.col("nb").isNotNull(),
                F.abs(
                    F.col("cumu") * F.col("nl") - F.col("cuml") * F.col("nu")
                ).cast(dec)
                * (F.col("nb") - F.col("b")),
            )
        ).alias("tot")
    )
    return s.crossJoin(F.broadcast(st)).select(  # 1-row scalar attach
        F.col("nu").alias("n_urgent"),
        F.col("nl").alias("n_low"),
        F.col("width").alias("quant_width_cents"),
        r4(
            F.col("tot").cast("double")
            * F.col("width")
            / (F.col("nu") * 1.0 * F.col("nl"))
            / 100.0
        ).alias("w1_dollars"),
        r4(
            F.col("sumu") * 1.0 / F.col("nu") / 100.0
            - F.col("suml") * 1.0 / F.col("nl") / 100.0
        ).alias("mean_diff_dollars"),
    )


@register(
    "negbin_overdispersion",
    oracle="""
    WITH k AS (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS k
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(k) AS BIGINT) AS sk,
             CAST(sum(k * k) AS BIGINT) AS skk,
             CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS zeros
      FROM k
    ),
    p AS (
      SELECT n, zeros, sk * 1.0 / n AS m,
             (n * 1.0 * skk - sk * 1.0 * sk) / (n * 1.0 * (n - 1)) AS v
      FROM s
    )
    SELECT n AS n_customers, round(m, 4) + 0.0 AS mean_orders,
           round(v, 4) + 0.0 AS var_orders,
           round(v / m, 4) + 0.0 AS dispersion_ratio,
           round(CASE WHEN v > m THEN m * m / (v - m) END, 4) + 0.0
             AS nb_r,
           round(zeros * 1.0 / n, 4) + 0.0 AS zero_frac_obs,
           round(exp(-m), 4) + 0.0 AS zero_frac_poisson
    FROM p
    """,
)
def negbin_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count modeling — overdispersion diagnosis and negative-binomial
    method-of-moments fit on per-customer order counts (zeros INCLUDED
    via the customer left join — dropping them is the classic selection
    bug): dispersion ratio var/mean (Poisson ⇒ 1), NB size r = m²/(v−m)
    when overdispersed, and the observed-vs-Poisson zero fraction (the
    zero-inflation read). Complements dispersion_index_check (events
    per day) with the cross-SECTIONAL count distribution. Sufficient
    statistics are exact BIGINTs (k ≤ ~40 per customer, n·Σk² safe past
    sf100); every emission is an identical-expression double ratio."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    cst = load_table(spark, sf_dir, "customer").select("c_custkey")
    k = (
        cst.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("k"))
    )
    s = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
        F.sum(F.when(F.col("k") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("zeros"),
    )
    m = F.col("sk") * 1.0 / F.col("n")
    v = (F.col("n") * 1.0 * F.col("skk") - F.col("sk") * 1.0 * F.col("sk")) / (
        F.col("n") * 1.0 * (F.col("n") - 1)
    )
    return s.select(
        F.col("n").alias("n_customers"),
        r4(m).alias("mean_orders"),
        r4(v).alias("var_orders"),
        r4(v / m).alias("dispersion_ratio"),
        r4(F.when(v > m, m * m / (v - m))).alias("nb_r"),
        r4(F.col("zeros") * 1.0 / F.col("n")).alias("zero_frac_obs"),
        r4(F.exp(-m)).alias("zero_frac_poisson"),
    )


@register(
    "engle_granger_cointegration",
    oracle="""
    WITH g AS MATERIALIZED (
      SELECT CAST(o_orderdate AS DATE) AS dayd,
             sum(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
               AS uc,
             sum(CASE WHEN o_orderpriority = '5-LOW'
                      THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
               AS lc
      FROM orders GROUP BY 1
      HAVING uc IS NOT NULL AND lc IS NOT NULL
    ),
    s AS (
      SELECT count(*) AS n, sum(lc) AS sl, sum(uc) AS su,
             sum(lc * lc) AS sll, sum(lc * uc) AS slu
      FROM g
    ),
    p AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(n * slu - sl * su AS DOUBLE)
               / CAST(n * sll - sl * sl AS DOUBLE) AS b,
             CAST(su AS DOUBLE) AS sud, CAST(sl AS DOUBLE) AS sld,
             CAST(n AS DOUBLE) AS nd
      FROM s
    ),
    z AS (
      SELECT dayd,
             CAST(round(uc - ((sud - b * sld) / nd) - b * lc) AS BIGINT)
               AS z
      FROM g CROSS JOIN p
    ),
    lagd AS (
      SELECT z, lag(z) OVER (ORDER BY dayd) AS zp FROM z
    ),
    df AS (
      SELECT count(*) AS m,
             sum(zp * zp) AS szz,
             sum(zp * (z - zp)) AS szd,
             sum((z - zp) * (z - zp)) AS sdd
      FROM lagd WHERE zp IS NOT NULL
    ),
    fit AS (
      SELECT CAST(m AS BIGINT) AS m,
             CAST(szd AS DOUBLE) / CAST(szz AS DOUBLE) AS phi,
             CAST(szz AS DOUBLE) AS szzd, CAST(szd AS DOUBLE) AS szdd,
             CAST(sdd AS DOUBLE) AS sddd
      FROM df
    )
    SELECT p.n AS n_days, round(p.b, 4) + 0.0 AS beta,
           round(fit.phi, 4) + 0.0 AS phi,
           round(fit.phi / sqrt(greatest(fit.sddd - 2 * fit.phi * fit.szdd
                                         + fit.phi * fit.phi * fit.szzd,
                                         0.0)
                                / (fit.m - 1) / fit.szzd), 4) + 0.0
             AS adf_t
    FROM fit CROSS JOIN p
    """,
)
def engle_granger_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series econometrics — the Engle-Granger two-step
    cointegration read between the URGENT and LOW daily-revenue series:
    (1) the cointegrating OLS u = a + b·l from exact decimal(38,0)
    moments (the cuped idiom), residuals SNAPPED TO INTEGER CENTS (the
    durbin_watson idiom); (2) the Dickey-Fuller regression Δz = φ·z₋₁
    on those integer residuals, with φ, its no-intercept t-statistic
    (RSS expanded as Σdz² − 2φΣz₋dz + φ²Σz₋² from three exact integer
    sums — never a per-row float residual), and the sqrt guarded with
    greatest(·,0) on BOTH sides (SCALE.md §29). A strongly negative
    adf_t = the spread mean-reverts = the series co-move. Day-grid lag
    windows are calendar-bounded (allowlisted); the corpus pays one
    scan + one day reduction."""
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    g = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("dayd"))
        .agg(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", cents)
            ).alias("uc"),
            F.sum(
                F.when(F.col("o_orderpriority") == "5-LOW", cents)
            ).alias("lc"),
        )
        .filter(F.col("uc").isNotNull() & F.col("lc").isNotNull())
        .localCheckpoint()  # day grid: feeds the moments AND the residuals
    )
    s = g.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("lc").cast(dec)).alias("sl"),
        F.sum(F.col("uc").cast(dec)).alias("su"),
        F.sum((F.col("lc") * F.col("lc")).cast(dec)).alias("sll"),
        F.sum((F.col("lc") * F.col("uc")).cast(dec)).alias("slu"),
    )
    p = s.select(
        F.col("n").cast("bigint").alias("n"),
        (
            (F.col("n") * F.col("slu") - F.col("sl") * F.col("su")).cast(
                "double"
            )
            / (F.col("n") * F.col("sll") - F.col("sl") * F.col("sl")).cast(
                "double"
            )
        ).alias("b"),
        F.col("su").cast("double").alias("sud"),
        F.col("sl").cast("double").alias("sld"),
        F.col("n").cast("double").alias("nd"),
    ).localCheckpoint()  # 1 row; feeds the residual pass AND the emit
    z = g.crossJoin(F.broadcast(p)).select(
        "dayd",
        F.round(
            F.col("uc")
            - (F.col("sud") - F.col("b") * F.col("sld")) / F.col("nd")
            - F.col("b") * F.col("lc")
        )
        .cast("bigint")
        .alias("z"),
    )
    lagd = z.select(
        "z", F.lag("z").over(Window.orderBy("dayd")).alias("zp")
    ).filter(F.col("zp").isNotNull())
    df = lagd.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum((F.col("zp") * F.col("zp")).cast(dec)).alias("szz"),
        F.sum((F.col("zp") * (F.col("z") - F.col("zp"))).cast(dec)).alias(
            "szd"
        ),
        F.sum(
            ((F.col("z") - F.col("zp")) * (F.col("z") - F.col("zp"))).cast(
                dec
            )
        ).alias("sdd"),
    )
    fit = df.select(
        "m",
        (F.col("szd").cast("double") / F.col("szz").cast("double")).alias(
            "phi"
        ),
        F.col("szz").cast("double").alias("szzd"),
        F.col("szd").cast("double").alias("szdd"),
        F.col("sdd").cast("double").alias("sddd"),
    )
    rss = F.greatest(
        F.col("sddd")
        - 2 * F.col("phi") * F.col("szdd")
        + F.col("phi") * F.col("phi") * F.col("szzd"),
        F.lit(0.0),
    )
    return fit.crossJoin(F.broadcast(p)).select(  # 1-row scalar attach
        F.col("n").alias("n_days"),
        r4(F.col("b")).alias("beta"),
        r4(F.col("phi")).alias("phi"),
        r4(
            F.col("phi")
            / F.sqrt(rss / (F.col("m") - 1) / F.col("szzd"))
        ).alias("adf_t"),
    )


@register(
    "weibull_time_to_convert",
    oracle="""
    WITH span AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1
    ),
    conv AS (
      SELECT user_id, min(ts) AS conv_ts FROM events
      WHERE event_type = 'purchase' AND value >= 95 GROUP BY 1
    ),
    horizon AS (SELECT max(ts) AS h FROM events),
    obs AS (
      SELECT CASE WHEN c.user_id IS NOT NULL
                  THEN CAST(date_diff('day', s.first_ts, c.conv_ts) AS BIGINT)
                  ELSE CAST(date_diff('day', s.first_ts, h) AS BIGINT) END
               AS t,
             CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END AS death
      FROM span s LEFT JOIN conv c USING (user_id) CROSS JOIN horizon
    ),
    tot AS (SELECT count(*) AS n FROM obs),
    dt AS (
      SELECT t, CAST(sum(death) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS ended
      FROM obs GROUP BY 1
    ),
    risk AS (
      SELECT t, d,
             tot.n - coalesce(sum(ended) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM dt CROSS JOIN tot
    ),
    km AS (
      SELECT t, d,
             exp(sum(ln(CASE WHEN n_risk > d
                             THEN (n_risk - d) * 1.0 / n_risk
                             ELSE 1.0 END))
                 OVER (ORDER BY t)) AS s
      FROM risk WHERE d > 0
    ),
    pts AS (
      SELECT ln(CAST(t AS DOUBLE)) AS x, ln(-ln(s)) AS y
      FROM km WHERE t > 0 AND s > 0 AND s < 1
    ),
    ols AS (
      SELECT count(*) AS np, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts
    ),
    fit AS (
      SELECT CAST(np AS BIGINT) AS n_points,
             (np * sxy - sx * sy) / (np * sxx - sx * sx) AS shape,
             sy / np AS ybar, sx / np AS xbar
      FROM ols
    ),
    ev AS (SELECT CAST(sum(death) AS BIGINT) AS n_events,
                  CAST(count(*) AS BIGINT) AS n_users FROM obs)
    SELECT ev.n_users, ev.n_events, fit.n_points,
           round(fit.shape, 4) + 0.0 AS weibull_shape,
           round(exp(fit.xbar - fit.ybar / fit.shape), 4) + 0.0
             AS weibull_scale_days,
           round(exp(fit.xbar - fit.ybar / fit.shape)
                 * pow(0.6931471805599453, 1.0 / fit.shape), 4) + 0.0
             AS median_days
    FROM fit CROSS JOIN ev
    """,
)
def weibull_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric survival — Weibull fit to the pooled time-to-
    conversion distribution via Kaplan-Meier linearization: the KM
    curve (same censoring/horizon/conversion definitions as
    kaplan_meier_churn, pooled across cohorts) gives points
    (ln t, ln(−ln S(t))) whose OLS slope IS the Weibull shape k and
    whose intercept gives the scale λ = exp(x̄ − ȳ/k) — shape < 1 means
    conversion hazard falls with tenure (convert-early-or-never),
    > 1 means it accumulates. Emits shape, scale, and the parametric
    median λ·(ln2)^(1/k). The OLS runs over ≤ horizon-days KM points
    (log-log regression over a bounded grid — the heaps_law_fit float
    precedent); event-time windows are horizon-bounded (allowlisted)."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    conv = (
        ev.filter(
            (F.col("event_type") == "purchase") & (F.col("value") >= 95)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    h = ev.agg(F.max("ts").alias("h"))
    obs = (
        span.join(conv, on="user_id", how="left")
        .crossJoin(F.broadcast(h))
        .select(
            F.when(
                F.col("conv_ts").isNotNull(),
                F.datediff(F.col("conv_ts"), F.col("first_ts")),
            )
            .otherwise(F.datediff(F.col("h"), F.col("first_ts")))
            .cast("bigint")
            .alias("t"),
            F.when(F.col("conv_ts").isNotNull(), 1).otherwise(0).alias(
                "death"
            ),
        )
        .localCheckpoint()  # user-level frame: feeds KM grid AND totals
    )
    tot = obs.agg(F.count(F.lit(1)).alias("n"))
    dt = obs.groupBy("t").agg(
        F.sum("death").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("ended"),
    )
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = dt.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (
            F.col("n") - F.coalesce(F.sum("ended").over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    wkm = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    safe = F.when(
        F.col("n_risk") > F.col("d"),
        (F.col("n_risk") - F.col("d")) * F.lit(1.0) / F.col("n_risk"),
    ).otherwise(F.lit(1.0))
    km = risk.filter(F.col("d") > 0).select(
        "t", "d", F.exp(F.sum(F.log(safe)).over(wkm)).alias("s")
    )
    pts = km.filter(
        (F.col("t") > 0) & (F.col("s") > 0) & (F.col("s") < 1)
    ).select(
        F.log(F.col("t").cast("double")).alias("x"),
        F.log(-F.log("s")).alias("y"),
    )
    ols = pts.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    fit = ols.select(
        F.col("np").cast("bigint").alias("n_points"),
        (
            (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("shape"),
        (F.col("sy") / F.col("np")).alias("ybar"),
        (F.col("sx") / F.col("np")).alias("xbar"),
    )
    evs = obs.agg(
        F.sum("death").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
    scale = F.exp(F.col("xbar") - F.col("ybar") / F.col("shape"))
    return fit.crossJoin(F.broadcast(evs)).select(  # 1-row scalar attach
        "n_users",
        "n_events",
        "n_points",
        r4(F.col("shape")).alias("weibull_shape"),
        r4(scale).alias("weibull_scale_days"),
        r4(
            scale * F.pow(F.lit(0.6931471805599453), 1.0 / F.col("shape"))
        ).alias("median_days"),
    )


@register(
    "bray_curtis_source_matrix",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(lower(trim(text)),
                                       '[ \\t\\n\\x0B\\f\\r]+')) AS tok
      FROM documents
    ),
    c AS MATERIALIZED (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
      FROM tok WHERE tok <> '' GROUP BY 1, 2
    ),
    t AS MATERIALIZED (
      SELECT source, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY 1
    ),
    mins AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS shared_tokens,
             CAST(sum(least(a.cnt, b.cnt)) AS BIGINT) AS w
      FROM c a JOIN c b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT m.source_a, m.source_b, m.shared_tokens,
           round(1.0 - 2.0 * m.w / (ta.tot + tb.tot), 4) + 0.0
             AS bray_curtis
    FROM mins m
    JOIN t ta ON ta.source = m.source_a
    JOIN t tb ON tb.source = m.source_b
    """,
)
def bray_curtis_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture design — the Bray-Curtis dissimilarity matrix between
    source unigram count profiles: BC = 1 − 2·Σmin(c_a, c_b)/(N_a+N_b),
    the abundance-weighted ecology measure that complements
    source_js_divergence (JSD compares SHAPES of the normalized
    distributions; BC feels absolute abundance, so a source that is a
    strict subsample of another scores far from 0 under BC but ≈0 under
    JSD — both reads matter when weighting a mixture). EXACT integers
    until the final ratio. One corpus shuffle to (source, token)
    counts; the pairwise Σmin is an inner join on token — |vocab|·
    |pairs-sharing-a-token| work, never |docs|²."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(
                F.split(F.lower(F.trim("text")), "[ \t\n\x0B\f\r]+")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    c = (
        toks.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint()  # consumed by the totals AND both join sides
    )
    t = c.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("tot"))
    a = c.select(
        F.col("source").alias("source_a"), "tok", F.col("cnt").alias("ca")
    )
    b = c.select(
        F.col("source").alias("source_b"), "tok", F.col("cnt").alias("cb")
    )
    mins = (
        a.join(b, on="tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("shared_tokens"),
            F.sum(F.least("ca", "cb")).cast("bigint").alias("w"),
        )
    )
    ta = t.select(F.col("source").alias("source_a"), F.col("tot").alias("tota"))
    tb = t.select(F.col("source").alias("source_b"), F.col("tot").alias("totb"))
    return (
        mins.join(F.broadcast(ta), on="source_a")
        .join(F.broadcast(tb), on="source_b")
        .select(
            "source_a",
            "source_b",
            "shared_tokens",
            r4(
                1.0 - 2.0 * F.col("w") / (F.col("tota") + F.col("totb"))
            ).alias("bray_curtis"),
        )
    )


@register(
    "hurst_exponent_rs",
    oracle="""
    WITH g AS MATERIALIZED (
      SELECT CAST(o_orderdate AS DATE) AS dayd,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1
    ),
    tg AS (
      SELECT datediff('day', (SELECT min(dayd) FROM g), dayd) + 1 AS t, y
      FROM g
    ),
    sc AS (SELECT unnest([8, 16, 32, 64, 128, 256]) AS s),
    blk AS (
      SELECT s, (t - 1) // s AS block, t, y FROM tg CROSS JOIN sc
    ),
    wins AS (
      SELECT s, block, y,
             sum(y) OVER (PARTITION BY s, block ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cumy,
             row_number() OVER (PARTITION BY s, block ORDER BY t) AS k,
             sum(y) OVER (PARTITION BY s, block) AS sy,
             count(*) OVER (PARTITION BY s, block) AS cnt
      FROM blk
    ),
    blocks AS (
      SELECT s, block, max(cnt) AS cnt, max(sy) AS sy,
             sum(y * y) AS syy,
             max(s * cumy - k * sy) AS mx, min(s * cumy - k * sy) AS mn
      FROM wins GROUP BY 1, 2
    ),
    rs AS (
      SELECT s,
             ln((mx - mn)
                / sqrt(CAST(s * syy - sy * sy AS DOUBLE))) AS lnrs
      FROM blocks
      WHERE cnt = s AND s * syy - sy * sy > 0 AND mx > mn
    ),
    pts AS (
      SELECT ln(CAST(s AS DOUBLE)) AS x, avg(lnrs) AS yv,
             CAST(count(*) AS BIGINT) AS nblocks
      FROM rs GROUP BY s
    ),
    ols AS (
      SELECT count(*) AS np, sum(x) AS sx, sum(yv) AS syv,
             sum(x * yv) AS sxy, sum(x * x) AS sxx,
             CAST(sum(nblocks) AS BIGINT) AS blocks_used
      FROM pts
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM g) AS n_days,
           CAST(np AS BIGINT) AS n_scales,
           CAST(coalesce(blocks_used, 0) AS BIGINT) AS blocks_used,
           round(CASE WHEN np >= 2 AND np * sxx - sx * sx <> 0
                      THEN (np * sxy - sx * syv) / (np * sxx - sx * sx)
                 END, 4) + 0.0 AS hurst_h
    FROM ols
    """,
)
def hurst_exponent_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-memory diagnostics — the Hurst exponent by classical
    rescaled-range (R/S) analysis over the daily-revenue series: for
    dyadic scales s ∈ {8..256}, split the day grid into full blocks of
    s days, R = the range of cumulative deviations from the block mean,
    S = the block standard deviation, and H = the log-log OLS slope of
    mean ln(R/S) against ln(s). H≈0.5 is a memoryless walk, H>0.5
    persistent trends, H<0.5 mean reversion — the long-horizon
    complement to ljung_box_q/autocorrelation_lags. EXACT integer core:
    the deviation s·cumy − k·Σy and the variance argument s·Σy² − (Σy)²
    are integer-valued on both engines (decimal for the quadratic at
    scale), so R/S is an identical double; only the per-scale ln mean
    and the 6-point OLS carry the standard add-order guard band. All
    block windows are (s, block)-PARTITIONED — no global window, any
    corpus size."""
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    g = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("dayd"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "y"
            )
        )
        .localCheckpoint()  # day grid: feeds n_days AND the block pass
    )
    m = g.agg(F.min("dayd").alias("d0"))
    nd = g.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    tg = g.crossJoin(F.broadcast(m)).select(
        (F.datediff(F.col("dayd"), F.col("d0")) + 1).alias("t"), "y"
    )
    sc = spark.createDataFrame(
        [(8,), (16,), (32,), (64,), (128,), (256,)], "s long"
    )
    blk = tg.crossJoin(F.broadcast(sc)).select(
        "s", F.expr("(t - 1) div s").alias("block"), "t", "y"
    )
    wcum = (
        Window.partitionBy("s", "block")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("s", "block")
    wins = blk.select(
        "s",
        "block",
        "y",
        F.sum("y").over(wcum).alias("cumy"),
        F.row_number()
        .over(Window.partitionBy("s", "block").orderBy("t"))
        .alias("k"),
        F.sum("y").over(wall).alias("sy"),
        F.count(F.lit(1)).over(wall).alias("cnt"),
    )
    dev = F.col("s") * F.col("cumy") - F.col("k") * F.col("sy")
    blocks = wins.groupBy("s", "block").agg(
        F.max("cnt").alias("cnt"),
        F.max("sy").alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
        F.max(dev).alias("mx"),
        F.min(dev).alias("mn"),
    )
    varg = F.col("s").cast(dec) * F.col("syy") - (
        F.col("sy").cast(dec) * F.col("sy").cast(dec)
    )
    rs = blocks.filter(
        (F.col("cnt") == F.col("s")) & (varg > 0) & (F.col("mx") > F.col("mn"))
    ).select(
        "s",
        F.log((F.col("mx") - F.col("mn")) / F.sqrt(varg.cast("double"))).alias(
            "lnrs"
        ),
    )
    pts = rs.groupBy("s").agg(
        F.avg("lnrs").alias("yv"),
        F.count(F.lit(1)).cast("bigint").alias("nblocks"),
    ).select(F.log(F.col("s").cast("double")).alias("x"), "yv", "nblocks")
    ols = pts.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x").alias("sx"),
        F.sum("yv").alias("syv"),
        F.sum(F.col("x") * F.col("yv")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("nblocks").cast("bigint").alias("blocks_used"),
    )
    den = F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    return ols.crossJoin(F.broadcast(nd)).select(  # 1-row scalar attach
        "n_days",
        F.col("np").cast("bigint").alias("n_scales"),
        F.coalesce(F.col("blocks_used"), F.lit(0))
        .cast("bigint")
        .alias("blocks_used"),
        r4(
            F.when(  # sparse small-SF day grids can leave < 2 scales
                (F.col("np") >= 2) & (den != 0),
                (F.col("np") * F.col("sxy") - F.col("sx") * F.col("syv"))
                / den,
            )
        ).alias("hurst_h"),
    )


@register(
    "auc_doc_length_lang",
    oracle="""
    WITH d AS (
      SELECT n_chars,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    vg AS (
      SELECT n_chars AS v, CAST(sum(pos) AS BIGINT) AS np,
             CAST(sum(1 - pos) AS BIGINT) AS nn
      FROM d GROUP BY 1
    ),
    cum AS (
      SELECT v, np, nn,
             coalesce(sum(nn) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS negs_below
      FROM vg
    ),
    s AS (
      SELECT CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg,
             sum(np * (negs_below + nn / 2.0)) AS u
      FROM cum
    )
    SELECT n_pos, n_neg,
           round(u / (n_pos * 1.0 * n_neg), 4) + 0.0 AS auc,
           round(2.0 * u / (n_pos * 1.0 * n_neg) - 1.0, 4) + 0.0
             AS gini_coefficient
    FROM s
    """,
)
def auc_doc_length_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation — ROC AUC of document length as a score
    for the 'en' label, computed EXACTLY as the Mann-Whitney U
    probability P(len_pos > len_neg) + ½P(=): U = Σ_v pos_v·(negs
    below + ½·negs at v) over the n_chars VALUE GRID — bounded by the
    document-length domain ([44, 577] in the fixtures), not the corpus,
    so the cumulative window is allowlist-bounded while the corpus pays
    one conditional-count shuffle. U sums exact half-integers ⇒
    identical on both engines. AUC completes the eval family: brier
    (calibration), ndcg (ranking), cumulative_gains (targeting) — this
    is threshold-free discrimination, and gini = 2·AUC − 1."""
    d = load_table(spark, sf_dir, "documents").select(
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    vg = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum("pos").cast("bigint").alias("np"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("nn"),
    )
    wprev = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vg.select(
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(wprev), F.lit(0)).alias("negs_below"),
    )
    s = cum.agg(
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum("nn").cast("bigint").alias("n_neg"),
        F.sum(
            F.col("np") * (F.col("negs_below") + F.col("nn") / 2.0)
        ).alias("u"),
    )
    auc = F.col("u") / (F.col("n_pos") * 1.0 * F.col("n_neg"))
    return s.select(
        "n_pos",
        "n_neg",
        r4(auc).alias("auc"),
        r4(2.0 * auc - 1.0).alias("gini_coefficient"),
    )


_reorder_for_gate()
