"""The reference's full ETL DAG — 27 node labels + 27 relationship types —
re-expressed declaratively.

The reference builds a static ordered TASKS list and awaits each
sequentially over Postgres→Neo4j round-trips
(/root/reference/main_graph_topraq.py:117-334); dependencies are implicit
in list position (product_applications at :300 reads ApplicationEvents back
from Neo4j written at :292). Here every task is a **table definition** —
a function from its dependency DataFrames to a node/edge DataFrame — and
the DAG is explicit: ``build()`` resolves topologically, Catalyst optimizes
through the whole lineage, and ``--only/--skip`` becomes target selection
(``_env_enabled`` parity, main_graph_topraq.py:57-62).

Input mapping (FIXTURES.md §B): the driver's TPC-H-ish tables play the
agronomy shapes — customer→Field, events→sensor stream (user_id→station),
orders→lab analyses / application events, lineitem→per-parameter results /
product applications, part→FertilizerProduct catalog.

Every node table ends with a uniqueness assertion on its natural key — the
23 Neo4j constraints (/root/reference/app/graph_constraints.py) as checked
invariants instead of DDL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_db_spark.functions import scalars as S
from graph_db_spark.operators import aggregates as A
from graph_db_spark.operators import joins as J
from graph_db_spark.operators.sessionize import session_intervals
from graph_db_spark.tables import load_table


@dataclass
class TableDef:
    name: str
    kind: str  # "node" | "edge"
    builder: Callable[..., DataFrame]  # (ctx, **dep_dfs) -> DataFrame
    deps: list[str] = field(default_factory=list)
    keys: list[str] = field(default_factory=list)  # uniqueness constraint


@dataclass
class Context:
    spark: SparkSession
    sf_dir: str
    # processing window (ISO dates), mirroring the reference's --start/--end
    # incremental runs (main_graph_topraq.py:78-80): sensor-stream scans are
    # range-filtered; the predicate pushes down / prunes partitions, and the
    # idempotent upsert writer makes overlapping re-runs safe (the MERGE
    # contract the reference relies on, window widening included).
    start: str | None = None
    end: str | None = None

    def table(self, name: str) -> DataFrame:
        df = load_table(self.spark, self.sf_dir, name)
        if name == "events" and (self.start or self.end):
            if self.start:
                df = df.filter(F.col("ts") >= F.lit(self.start).cast("timestamp"))
            if self.end:
                df = df.filter(F.col("ts") < F.lit(self.end).cast("timestamp"))
        return df


REGISTRY: dict[str, TableDef] = {}


def task(name: str, kind: str, deps: list[str] | None = None, keys: list[str] | None = None):
    def deco(fn):
        REGISTRY[name] = TableDef(name, kind, fn, deps or [], keys or [])
        return fn

    return deco


# ---------------------------------------------------------------------------
# Dimensions (reference: fields/crops/stations — graph_fields.py,
# graph_stations.py)
# ---------------------------------------------------------------------------


@task("fields", "node", keys=["field_id"])
def fields(ctx: Context) -> DataFrame:
    """Field nodes (graph_fields.py:13-35): projection+rename off the
    customer dimension; point "(x,y)" parse exercised via synthesized geo."""
    c = ctx.table("customer")
    lon = (F.col("c_custkey") % 360 - 180).cast("double") + 0.5
    lat = (F.col("c_custkey") % 180 - 90).cast("double") + 0.25
    pt = F.concat(F.lit("("), lon.cast("string"), F.lit(","), lat.cast("string"), F.lit(")"))
    parsed = S.parse_point(pt)
    return c.select(
        F.col("c_custkey").alias("field_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("crop_name"),
        F.col("c_nationkey").cast("bigint").alias("customer_id"),
        F.lit("UTC").alias("timezone"),
        parsed["lon"].alias("lon"),
        parsed["lat"].alias("lat"),
    )


@task("crops", "node", deps=["fields"], keys=["name"])
def crops(ctx: Context, fields: DataFrame) -> DataFrame:
    """Crop nodes keyed by name (graph_constraints.py:9-12)."""
    return fields.select(F.col("crop_name").alias("name")).distinct()


@task("planted_with", "edge", deps=["fields", "crops"])
def planted_with(ctx: Context, fields: DataFrame, crops: DataFrame) -> DataFrame:
    """Field-PLANTED_WITH→Crop (graph_fields.py:40-46)."""
    return J.edge_join(
        fields, crops, on=fields["crop_name"] == crops["name"],
        rel_type="PLANTED_WITH", src_key="field_id", dst_key="name", broadcast_dst=True,
    )


@task("stations", "node", keys=["serial_number"])
def stations(ctx: Context) -> DataFrame:
    """Station nodes (graph_stations.py:16-39): registry = distinct event
    emitters; field assignment deterministic (user_id+1 is a valid
    field_id at every SF)."""
    ev = ctx.table("events")
    return (
        ev.select(F.col("user_id").cast("bigint").alias("uid"))
        .distinct()
        .select(
            F.concat(F.lit("ST"), F.col("uid").cast("string")).alias("serial_number"),
            F.col("uid").alias("device_id"),
            (F.col("uid") + 1).alias("field_id"),
            F.lit(True).alias("has_soil_moisture"),
        )
    )


@task("has_station", "edge", deps=["fields", "stations"])
def has_station(ctx: Context, fields: DataFrame, stations: DataFrame) -> DataFrame:
    """Field-HAS_STATION→Station (graph_stations.py:33-39)."""
    return J.edge_join(
        fields, stations, on=fields["field_id"] == stations["field_id"],
        rel_type="HAS_STATION", src_key="field_id", dst_key="serial_number",
        broadcast_dst=True,
    )


# ---------------------------------------------------------------------------
# Sensor-day family (weather/soil/irrigation/canopy/sap days — A1/A2)
# ---------------------------------------------------------------------------


def _day_nodes(ctx: Context, stations: DataFrame, event_types: list[str],
               zero_sum_to_null: bool) -> DataFrame:
    """Shared sensor-day shape: daily stats per (station, day, measurement),
    pivoted to a metrics map (dynamic measurement properties §1.5 as
    MapType — the unbounded-cardinality-safe form, SURVEY §7.4.4)."""
    ev = ctx.table("events").filter(F.col("event_type").isin(event_types))
    daily = A.daily_stats(ev, "ts", ["user_id", "event_type"], "value",
                          zero_sum_to_null=zero_sum_to_null)
    metrics = daily.groupBy("user_id", "day").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("event_type"),
                    F.struct("data", "min", "max", "avg", "sum", "n"),
                )
            )
        ).alias("metrics")
    )
    st = stations.select("serial_number", F.col("device_id").alias("user_id"))
    return (
        metrics.join(F.broadcast(st), on="user_id")
        .select(
            "serial_number",
            F.date_format("day", "yyyy-MM-dd").alias("date"),
            "metrics",
        )
    )


@task("weather_days", "node", deps=["stations"], keys=["serial_number", "date"])
def weather_days(ctx: Context, stations: DataFrame) -> DataFrame:
    """WeatherDay nodes (graph_weather_day.py:151-257): A1 weather-flavor
    aggregation (real zero sums kept — §2.10.1 weather keeps sums)."""
    return _day_nodes(ctx, stations, ["view", "click"], zero_sum_to_null=False)


@task("soil_days", "node", deps=["stations"], keys=["serial_number", "date"])
def soil_days(ctx: Context, stations: DataFrame) -> DataFrame:
    """SoilDay nodes (graph_soil_day.py) — weather-flavor agg."""
    return _day_nodes(ctx, stations, ["error"], zero_sum_to_null=False)


@task("irrigation_days", "node", deps=["stations"], keys=["serial_number", "date"])
def irrigation_days(ctx: Context, stations: DataFrame) -> DataFrame:
    """IrrigationDay nodes (graph_irrigation_day.py:77-135) — flow-flavor
    agg WITH the zero-sum→null quirk replicated (:116)."""
    return _day_nodes(ctx, stations, ["purchase"], zero_sum_to_null=True)


@task("canopy_days", "node", deps=["stations"], keys=["serial_number", "date"])
def canopy_days(ctx: Context, stations: DataFrame) -> DataFrame:
    """CanopyDay nodes (graph_canopy_day.py) — flow flavor."""
    return _day_nodes(ctx, stations, ["signup"], zero_sum_to_null=True)


@task("sap_days", "node", deps=["stations"], keys=["serial_number", "date"])
def sap_days(ctx: Context, stations: DataFrame) -> DataFrame:
    """SAPDay nodes (graph_sap_day.py) — flow flavor."""
    return _day_nodes(ctx, stations, ["view"], zero_sum_to_null=True)


@task("soil_layer_readings", "node", deps=["stations"],
      keys=["serial_number", "date", "depth_cm"])
def soil_layer_readings(ctx: Context, stations: DataFrame) -> DataFrame:
    """SoilLayerReading nodes (graph_soil_layer.py:121-261): per-depth daily
    readings; depth parsed from a sensor label (F2) synthesized off the
    event_type — exercising the wide→long melt + depth regroup (A11)."""
    ev = ctx.table("events")
    label = F.concat(F.lit("soil "), (F.length("event_type") * 10).cast("string"), F.lit(" cm"))
    depth = S.depth_from_label(label)
    daily = (
        ev.withColumn("depth_cm", depth)
        .groupBy("user_id", F.to_date("ts").alias("day"), "depth_cm")
        .agg(
            F.round(F.avg("value"), 4).alias("vwc_avg"),
            F.round(F.min("value"), 4).alias("vwc_min"),
            F.round(F.max("value"), 4).alias("vwc_max"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    st = stations.select("serial_number", F.col("device_id").alias("user_id"))
    return daily.join(F.broadcast(st), on="user_id").select(
        "serial_number", F.date_format("day", "yyyy-MM-dd").alias("date"),
        "depth_cm", "vwc_avg", "vwc_min", "vwc_max", "n",
    )


@task("irrigation_events", "node", deps=["stations"],
      keys=["serial_number", "start_at"])
def irrigation_events(ctx: Context, stations: DataFrame) -> DataFrame:
    """IrrigationEvent nodes (graph_irrigation_event.py:55-348): gap
    sessionization (30 min) of the purchase stream per station; per-event
    stats via the interval-scoped join happen downstream of the same
    intervals."""
    ev = ctx.table("events").filter(F.col("event_type") == "purchase")
    sess = session_intervals(ev, ["user_id"], "ts", gap_seconds=1800)
    st = stations.select("serial_number", F.col("device_id").alias("user_id"))
    return sess.join(F.broadcast(st), on="user_id").select(
        "serial_number",
        F.date_format("start_at", "yyyy-MM-dd HH:mm:ss").alias("start_at"),
        F.date_format("end_at", "yyyy-MM-dd HH:mm:ss").alias("end_at"),
        F.round("duration_min", 4).alias("duration_min"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


@task("et0_days", "node", deps=["stations"], keys=["serial_number", "date"])
def et0_days(ctx: Context, stations: DataFrame) -> DataFrame:
    """ET0Day nodes (graph_et0.py:66-93) — one daily scalar per station;
    canonical date key (fixes quirk §2.10.3: no string dates)."""
    ev = ctx.table("events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.round(F.avg("value"), 4).alias("et0")
    )
    st = stations.select("serial_number", F.col("device_id").alias("user_id"))
    return daily.join(F.broadcast(st), on="user_id").select(
        "serial_number", F.date_format("day", "yyyy-MM-dd").alias("date"), "et0"
    )


@task("weather_forecasts", "node", deps=["stations"], keys=["serial_number", "date"])
def weather_forecasts(ctx: Context, stations: DataFrame) -> DataFrame:
    """WeatherForecast nodes (graph_weather_forecast.py:20-71): map payload
    {measurement → {min,max,avg,total}} per station-day — the `SET wf +=
    $props` dynamic map as native MapType."""
    ev = ctx.table("events")
    per_measure = ev.groupBy("user_id", F.to_date("ts").alias("day"), "event_type").agg(
        F.round(F.min("value"), 4).alias("min"),
        F.round(F.max("value"), 4).alias("max"),
        F.round(F.avg("value"), 4).alias("avg"),
        F.round(F.sum("value"), 4).alias("total"),
    )
    m = per_measure.groupBy("user_id", "day").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", F.struct("min", "max", "avg", "total")))
        ).alias("measurements")
    )
    st = stations.select("serial_number", F.col("device_id").alias("user_id"))
    return m.join(F.broadcast(st), on="user_id").select(
        "serial_number", F.date_format("day", "yyyy-MM-dd").alias("date"), "measurements"
    )


# ---------------------------------------------------------------------------
# Lab-analysis family (orders → analyses; lineitem → param results)
# ---------------------------------------------------------------------------


def _analyses(ctx: Context, status: str) -> DataFrame:
    """Shared lab-analysis shape off orders (S10: one range scan replaces
    the reference's O(days×fields) per-day fetch loops,
    graph_haney_analysis.py:64-84)."""
    o = ctx.table("orders").filter(F.col("o_orderstatus") == status)
    return o.select(
        F.col("o_custkey").alias("field_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
        F.col("o_orderkey").alias("lab_no"),
        F.round("o_totalprice", 4).alias("score"),
    )


@task("haney_analyses", "node", keys=["field_id", "date", "lab_no"])
def haney_analyses(ctx: Context) -> DataFrame:
    """HaneyAnalysis nodes (graph_haney_analysis.py:86-151)."""
    return _analyses(ctx, "F")


@task("tnd_analyses", "node", keys=["field_id", "date", "lab_no"])
def tnd_analyses(ctx: Context) -> DataFrame:
    """TNDAnalysis nodes (graph_tnd_analysis.py:129-230), C/N handled in
    param results via the alias map (F12)."""
    return _analyses(ctx, "O")


@task("soil_analyses", "node", keys=["field_id", "date", "lab_no"])
def soil_analyses(ctx: Context) -> DataFrame:
    """SoilAnalysis nodes (graph_soil_analysis.py:62-144) — canonical
    timestamp-derived keys both here and in param results (fixes the
    string-vs-datetime dangling-edge bug, SURVEY §2.10.3)."""
    return _analyses(ctx, "P")


@task("soil_param_results", "node", deps=["soil_analyses"],
      keys=["analysis_id", "parameter"])
def soil_param_results(ctx: Context, soil_analyses: DataFrame) -> DataFrame:
    """SoilParamResult nodes (graph_soil_param_result.py:28-153): child
    fan-out from lineitem under the parent analysis; values parsed with the
    inequality-trimmed float (F4) from stringified measurements; composite
    id (F15)."""
    li = ctx.table("lineitem")
    parents = soil_analyses.select("field_id", "date", "lab_no")
    rows = li.select(
        F.col("l_orderkey").alias("lab_no"),
        F.col("l_linenumber").alias("line_no"),
        F.concat(F.lit("param_"), F.col("l_partkey").cast("string")).alias("parameter"),
        F.concat(F.lit(">= "), F.col("l_quantity").cast("string")).alias("raw_value"),
    )
    joined = rows.join(parents, on="lab_no")  # J6 semi-ish: only rows with parents
    out = joined.select(
        S.composite_id("field_id", "date", "lab_no").alias("analysis_id"),
        "parameter",
        "line_no",
        S.ineq_trimmed_float("raw_value").alias("value"),
    )
    # A8 dedup with an explicit deterministic order (first line wins; value
    # breaks ties — the fixtures contain true duplicate (order, linenumber)
    # rows) — a bare dropDuplicates picks an arbitrary row and breaks
    # re-run stability
    return A.dedup_first(out, ["analysis_id", "parameter"], ["line_no", "value"]).drop("line_no")


@task("has_soil_param", "edge", deps=["soil_analyses", "soil_param_results"])
def has_soil_param(ctx: Context, soil_analyses: DataFrame,
                   soil_param_results: DataFrame) -> DataFrame:
    """SoilAnalysis-HAS_SOIL_PARAM→SoilParamResult
    (graph_soil_param_result.py:131-146) — keys canonical, so no dangling
    edges (asserted in tests)."""
    sa = soil_analyses.select(
        S.composite_id("field_id", "date", "lab_no").alias("analysis_id")
    )
    return J.edge_join(
        sa, soil_param_results,
        on=sa["analysis_id"] == soil_param_results["analysis_id"],
        rel_type="HAS_SOIL_PARAM", src_key="analysis_id", dst_key="parameter",
    )


# ---------------------------------------------------------------------------
# Activity chain (application events → product applications → products →
# nutrient contents) — the deepest dependency chain (§3.3)
# ---------------------------------------------------------------------------


@task("application_events", "node",
      keys=["field_id", "date", "app_type", "idx"])
def application_events(ctx: Context) -> DataFrame:
    """ApplicationEvent nodes (graph_application_event.py:87-214): the
    in-memory per-group counters (:99,146-150) become a deterministic
    row_number (A7) over (field, date, app_type)."""
    o = ctx.table("orders")
    base = o.select(
        F.col("o_custkey").alias("field_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
        S.first_non_empty(F.col("o_orderpriority"), F.col("o_orderstatus")).alias("app_type"),
        F.col("o_orderkey").alias("order_ref"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("start_at"),
    )
    return A.running_index(base, ["field_id", "date", "app_type"], ["order_ref"])


@task("product_applications", "node", deps=["application_events"],
      keys=["application_event_id", "idx"])
def product_applications(ctx: Context, application_events: DataFrame) -> DataFrame:
    """ProductApplication nodes (graph_product_application.py:107-294):
    the Neo4j read-back + argmin (:156-214) becomes an in-engine as-of join
    (J3) of inventory lines to their nearest application event; per-event
    product idx by position (W1 ordering contract)."""
    li = ctx.table("lineitem")
    o = ctx.table("orders").select("o_orderkey", "o_custkey", "o_orderdate")
    inv = li.join(o, on=li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_custkey").alias("field_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
        F.col("o_orderkey").alias("order_ref"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_partkey").alias("partkey"),
        F.round("l_quantity", 4).alias("amount"),
        "l_shipdate",
    )
    ae = application_events.select(
        S.composite_id("field_id", "date", "app_type", "idx").alias("application_event_id"),
        F.col("order_ref").alias("ae_order_ref"),
    )
    # events and inventories share order_ref in this mapping → equi-join
    # (the general nearest-time matcher asof_join is exercised in
    # queries.asof_nearest_line and tests)
    matched = inv.join(ae, inv["order_ref"] == ae["ae_order_ref"], "inner")
    # full deterministic order: the fixtures contain duplicate (order, line)
    # rows, so linenumber alone would assign idx arbitrarily among dups
    out = A.running_index(
        matched, ["application_event_id"], ["line_no", "partkey", "amount"], idx_name="idx"
    )
    return out.select(
        "application_event_id", "idx", "partkey", "amount",
        S.composite_id("application_event_id", "idx").alias("product_application_id"),
    )


@task("fertilizer_products", "node", keys=["name", "brand"])
def fertilizer_products(ctx: Context) -> DataFrame:
    """FertilizerProduct catalog (graph_fertilizer_product.py:89-237):
    existence precondition name+brand (P6); the keep-existing-unless-new
    COALESCE upsert semantics live in writers.upsert(strategy='coalesce')."""
    p = ctx.table("part")
    rows = p.filter(F.col("p_name").isNotNull() & F.col("p_brand").isNotNull()).select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("nutrients_raw"),
        F.round("p_retailprice", 4).alias("price"),
    )
    # deterministic A8 dedup (min partkey wins) — a bare dropDuplicates
    # picks an arbitrary survivor, making which partkeys resolve in the
    # catalog lookup depend on partition layout
    return A.dedup_first(rows, ["name", "brand"], ["partkey"])


@task("app_nutrient_contents", "node",
      deps=["product_applications", "fertilizer_products"],
      keys=["product_application_id", "nutrient"])
def app_nutrient_contents(ctx: Context, product_applications: DataFrame,
                          fertilizer_products: DataFrame) -> DataFrame:
    """AppNutrientContent nodes (graph_app_nutrient_content.py:168-366):
    nutrient explode (F18) from the product's type string; missing inline
    nutrients enriched from the catalog by key (J4); loose numeric parse
    (F3) on the amounts."""
    fp = fertilizer_products.select("partkey", "nutrients_raw")
    pa = product_applications.join(F.broadcast(fp), on="partkey", how="left")
    exploded = pa.select(
        "product_application_id",
        F.explode(F.split(F.coalesce(F.col("nutrients_raw"), F.lit("unknown")), " ")).alias("nutrient"),
        "amount",
    )
    return (
        exploded.groupBy("product_application_id", "nutrient")
        .agg(F.round(F.sum("amount"), 4).alias("amount"))
    )


# ---------------------------------------------------------------------------
# SAP-analysis family (graph_sap_analysis.py, graph_sap_element_result.py,
# graph_optimum_sap_range.py, graph_optimum_element_range.py)
# ---------------------------------------------------------------------------


@task("sap_analyses", "node", deps=["fields"],
      keys=["field_id", "date", "crop_name", "leaf_type", "sample_id"])
def sap_analyses(ctx: Context, fields: DataFrame) -> DataFrame:
    """SAPAnalysis nodes (graph_sap_analysis.py:97-194): one node per
    (analysis, leaf_type) — the young/old fan-out (:144-176) becomes an
    explode over a 2-element struct array; rows with a missing sample_id
    are dropped (the `if not sample_id: continue` guard, :146). ph/ec/
    sugars are loose-number parses (F3) of messy strings
    (_extract_scalar_metrics, :57-73): '~6,5' / '>= 1.2' / '12 %' forms.
    crop_name resolves through the Field dimension (broadcast, J2)."""
    o = ctx.table("orders")
    dim = fields.select("field_id", "crop_name")
    base = o.join(F.broadcast(dim), on=o["o_custkey"] == dim["field_id"]).select(
        "field_id",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
        "crop_name",
        F.col("o_orderkey").alias("order_ref"),
        F.col("o_totalprice").alias("price"),
    )
    # young sample always present; old sample missing for every 3rd order —
    # exercising the sample-id precondition
    leaf = F.explode(
        F.array(
            F.struct(
                F.lit("young").alias("leaf_type"),
                F.concat(F.lit("Y"), F.col("order_ref").cast("string")).alias("sample_id"),
            ),
            F.struct(
                F.lit("old").alias("leaf_type"),
                F.when(
                    F.col("order_ref") % 3 != 0,
                    F.concat(F.lit("O"), F.col("order_ref").cast("string")),
                ).alias("sample_id"),
            ),
        )
    )
    ph_raw = F.concat(F.lit("~"), F.regexp_replace(F.round(F.col("price") % 14, 2).cast("string"), "\\.", ","))
    ec_raw = F.concat(F.lit(">= "), F.round(F.col("price") % 3, 2).cast("string"))
    sug_raw = F.concat(F.round(F.col("price") % 24, 1).cast("string"), F.lit(" %"))
    return (
        base.select("field_id", "date", "crop_name", "order_ref", "price", leaf.alias("lf"))
        .select(
            "field_id", "date", "crop_name",
            F.col("lf.leaf_type").alias("leaf_type"),
            F.col("lf.sample_id").alias("sample_id"),
            "order_ref",
            S.loose_number(ph_raw).alias("ph"),
            S.loose_number(ec_raw).alias("ec"),
            S.loose_number(sug_raw).alias("sugars"),
        )
        .filter(F.col("sample_id").isNotNull())
    )


_NUTRIENTS = ["n", "p", "k", "ca", "mg", "fe", "zn", "mn"]


@task("sap_element_results", "node", deps=["sap_analyses"],
      keys=["sap_analysis_id", "nutrient"])
def sap_element_results(ctx: Context, sap_analyses: DataFrame) -> DataFrame:
    """SAPElementResult nodes (graph_sap_element_result.py:103-156): per
    (analysis-leaf, nutrient) ppm values; the composite sap_analysis_id
    replicates _make_sa_id (:65-67, F15); values parse with the loose
    number regex (_parse_number :18-29, F3) and unparsable rows are
    skipped (:113-115); leaf_type picks which raw value applies
    (_pick_for_leaf :53-57). A8 first-wins dedup keeps one row per
    (analysis, nutrient) with a deterministic order."""
    from graph_db_spark.util import spread

    # regex parses run BEFORE the join, on a spread scan: the single-file
    # fixture arrives as one split and AQE coalesces the post-join shuffle
    # to a few partitions, so parsing after the join serializes the CPU-
    # heavy part; pre-join both leaf variants parse on all cores
    li = spread(ctx.table("lineitem"))
    parents = sap_analyses.select(
        S.composite_id("field_id", "date", "crop_name", "leaf_type", "sample_id").alias(
            "sap_analysis_id"
        ),
        "order_ref",
        "leaf_type",
    )
    nutrient = F.element_at(
        F.array(*[F.lit(n) for n in _NUTRIENTS]), (F.col("l_partkey") % 8 + 1).cast("int")
    )
    # young reads l_quantity; old reads a comma-decimal price residue; every
    # 7th line is 'n/a' → loose parse null → skipped
    na = F.col("l_linenumber") % 7 == 0
    young_raw = F.when(na, F.lit("n/a")).otherwise(
        F.concat(F.col("l_quantity").cast("string"), F.lit(" ppm"))
    )
    old_raw = F.when(na, F.lit("n/a")).otherwise(
        F.regexp_replace(F.round(F.col("l_extendedprice") % 500, 2).cast("string"), "\\.", ",")
    )
    parsed = li.select(
        F.col("l_orderkey").alias("order_ref"),
        F.col("l_linenumber").alias("line_no"),
        nutrient.alias("nutrient"),
        S.loose_number(young_raw).alias("young_ppm"),
        S.loose_number(old_raw).alias("old_ppm"),
    )
    # broadcast the dim side explicitly — without the hint the planner
    # broadcasts the PARSED lineitem side (no stats post-repartition)
    rows = parsed.join(F.broadcast(parents), on="order_ref").select(
        "sap_analysis_id",
        "nutrient",
        "line_no",
        F.when(F.col("leaf_type") == "young", F.col("young_ppm"))
        .otherwise(F.col("old_ppm"))
        .alias("value_ppm"),
    )
    # skip-unparsable inside the dedup window (see dedup_first(keep=...))
    return A.dedup_first(
        rows,
        ["sap_analysis_id", "nutrient"],
        ["line_no", "value_ppm"],
        keep=F.col("value_ppm").isNotNull(),
    ).drop("line_no")


@task("optimum_sap_ranges", "node", deps=["sap_analyses"], keys=["crop_name", "date"])
def optimum_sap_ranges(ctx: Context, sap_analyses: DataFrame) -> DataFrame:
    """OptimumSAPRange headers (graph_optimum_sap_range.py:23-88): the
    in-memory `seen` set (:29-30,59-62) becomes dropDuplicates on the
    natural key (A8)."""
    return (
        sap_analyses.filter(F.col("crop_name").isNotNull())
        .select("crop_name", "date")
        .dropDuplicates(["crop_name", "date"])
    )


@task("optimum_element_ranges", "node", deps=["sap_analyses"],
      keys=["opt_range_id", "nutrient"])
def optimum_element_ranges(ctx: Context, sap_analyses: DataFrame) -> DataFrame:
    """OptimumElementRange nodes (graph_optimum_element_range.py:86-171):
    optimum range strings ('1-4', '>= 2.5', '<=7', '3') parse to
    (min,max) via F5 (_parse_optimum :38-61 ≙ S.parse_range); rows where
    neither bound parses are skipped (:146-148); opt_range_id =
    'crop|date' (:117). The elements⊎others stream concat (U1, :132-136)
    is one lineitem scan here; A8 dedup keeps the first entry per
    (header, nutrient)."""
    from graph_db_spark.util import spread

    # parse on the spread scan BEFORE joining parents (see
    # sap_element_results for why — post-join partitions are AQE-coalesced)
    li = spread(ctx.table("lineitem"))
    parents = sap_analyses.filter(F.col("leaf_type") == "young").select(
        F.concat_ws("|", "crop_name", "date").alias("opt_range_id"),
        "order_ref",
    )
    q = F.col("l_quantity").cast("int").cast("string")
    q3 = (F.col("l_quantity").cast("int") + 3).cast("string")
    optimum = (
        F.when(F.col("l_partkey") % 5 == 0, F.concat(q, F.lit("-"), q3))
        .when(F.col("l_partkey") % 5 == 1, F.concat(F.lit(">= "), q))
        .when(F.col("l_partkey") % 5 == 2, F.concat(F.lit("<="), q))
        .when(F.col("l_partkey") % 5 == 3, q)
        .otherwise(F.lit("not a range"))  # unparsable → dropped
    )
    nutrient = F.element_at(
        F.array(*[F.lit(n) for n in _NUTRIENTS]), (F.col("l_partkey") % 8 + 1).cast("int")
    )
    parsed = S.parse_range(optimum)
    pre = li.select(
        F.col("l_orderkey").alias("order_ref"),
        F.col("l_linenumber").alias("line_no"),
        nutrient.alias("nutrient"),
        parsed["range_min"].alias("range_min"),
        parsed["range_max"].alias("range_max"),
    )
    # broadcast the dim side explicitly: left to itself the planner has no
    # stats for the parsed fact side and may broadcast THAT (600k rows of
    # regex output collected to the driver, single-threaded build)
    rows = pre.join(F.broadcast(parents), on="order_ref").select(
        "opt_range_id", "nutrient", "line_no", "range_min", "range_max"
    )
    # skip-unparsable via dedup_first(keep=...): a plain pre-dedup filter on
    # the parsed bounds would be pushed below the spread() repartition and
    # drag the whole regex parse into the single-split scan stage
    return A.dedup_first(
        rows,
        ["opt_range_id", "nutrient"],
        ["line_no", "range_min", "range_max"],
        keep=F.col("range_min").isNotNull() | F.col("range_max").isNotNull(),
    ).drop("line_no")


# ---------------------------------------------------------------------------
# Water family (graph_water_analysis.py, graph_water_param_result.py)
# ---------------------------------------------------------------------------


@task("water_analyses", "node", deps=["fields"],
      keys=["field_id", "date", "sample_source"])
def water_analyses(ctx: Context, fields: DataFrame) -> DataFrame:
    """WaterAnalysis nodes (graph_water_analysis.py:73-105): keyed
    (field_id, date, sample_source) with ONE canonical missing-source fill
    ('unknown') — fixing quirk §2.10.4 where the node writer used '' (:77)
    but the edge MATCH used 'unknown' (graph_water_param_result.py:31-32),
    leaving every null-source param result dangling. The reference's
    day×field fetch loop (:51-68) is one range scan (S10)."""
    o = ctx.table("orders").filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    dim = fields.select("field_id", "crop_name")
    src = (
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("well"))
        .when(F.col("o_orderkey") % 3 == 1, F.lit("canal"))
        .otherwise(F.lit(None).cast("string"))
    )
    rows = o.join(F.broadcast(dim), on=o["o_custkey"] == dim["field_id"]).select(
        "field_id",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
        F.coalesce(S.norm_str(src), F.lit("unknown")).alias("sample_source"),
        "crop_name",
        F.col("o_orderkey").alias("lab_id"),
    )
    # MERGE idempotence: several orders can share (field, date, source) —
    # deterministic first-wins on lab_id
    return A.dedup_first(
        rows, ["field_id", "date", "sample_source"], ["lab_id", "crop_name"]
    )


@task("water_param_results", "node", deps=["fields"],
      keys=["water_analysis_id", "parameter"])
def water_param_results(ctx: Context, fields: DataFrame) -> DataFrame:
    """WaterParamResult nodes (graph_water_param_result.py:78-118):
    parameter keys normalized lowercase/trim (_norm_param :23-27), values
    with the inequality-trimmed float (F4), water_analysis_id = _make_wa_id
    (:29-32) — same 'unknown' fill as the parent so no edge dangles.
    Children key by wa_id, NOT by source order: multiple orders collapsing
    to one WaterAnalysis contribute to the same result set, exactly as the
    reference's MERGE-by-wa_id does."""
    o = ctx.table("orders").filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    li = ctx.table("lineitem")
    src = (
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("well"))
        .when(F.col("o_orderkey") % 3 == 1, F.lit("canal"))
        .otherwise(F.lit(None).cast("string"))
    )
    parents = o.select(
        F.col("o_orderkey").alias("order_ref"),
        F.col("o_custkey").alias("field_id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
        F.coalesce(S.norm_str(src), F.lit("unknown")).alias("sample_source"),
    )
    raw_param = F.concat(F.lit("  Param_"), (F.col("l_partkey") % 10).cast("string"), F.lit(" "))
    raw_val = F.concat(F.lit("< "), F.col("l_quantity").cast("string"))
    rows = li.join(parents, on=li["l_orderkey"] == parents["order_ref"]).select(
        S.composite_id("field_id", "date", "sample_source").alias("water_analysis_id"),
        S.mineral_norm(raw_param).alias("parameter"),
        F.col("l_linenumber").alias("line_no"),
        S.ineq_trimmed_float(raw_val).alias("value"),
        F.lit("mg/L").alias("unit"),
    )
    return A.dedup_first(
        rows, ["water_analysis_id", "parameter"], ["line_no", "value"]
    ).drop("line_no")


# ---------------------------------------------------------------------------
# DepthPoint (graph_stations.py:40-66)
# ---------------------------------------------------------------------------


@task("depth_points", "node", deps=["stations"],
      keys=["serial_number", "depth", "sensor_index"])
def depth_points(ctx: Context, stations: DataFrame) -> DataFrame:
    """DepthPoint nodes (graph_stations.py:47-66): one point per station ×
    root depth; sensor_index is a conditional key dimension — present for
    shallow sensors, null for deep ones (the reference branches into two
    MERGE shapes :45-57/:58-66; one nullable column subsumes both)."""
    depth = F.explode(F.array(*[F.lit(d) for d in (10, 30, 60, 90)])).alias("depth")
    d = stations.select("serial_number", F.col("device_id"), depth)
    return d.select(
        "serial_number",
        "depth",
        F.when(F.col("depth") <= 30, (F.col("depth") / 10).cast("int")).alias("sensor_index"),
        F.round((F.col("device_id") % 50 + F.col("depth")) / 10.0, 4).alias("y"),
    )


# ---------------------------------------------------------------------------
# Remaining edges (J1 family)
# ---------------------------------------------------------------------------


@task("at_depth", "edge", deps=["stations", "depth_points"])
def at_depth(ctx: Context, stations: DataFrame, depth_points: DataFrame) -> DataFrame:
    """Station-AT_DEPTH→DepthPoint (graph_stations.py:51-55,62-66)."""
    # depth_points is a narrow projection of stations, so the join lineage
    # is a self-join — rename the key to disambiguate attributes
    dp = depth_points.select(
        F.col("serial_number").alias("dp_serial"),
        S.composite_id("serial_number", "depth", "sensor_index").alias("dp_id"),
    )
    return J.edge_join(
        stations, dp, on=stations["serial_number"] == dp["dp_serial"],
        rel_type="AT_DEPTH", src_key="serial_number", dst_key="dp_id",
        broadcast_src=True,
    )


def _station_day_edge(stations: DataFrame, days: DataFrame, rel_type: str) -> DataFrame:
    """Shared Station→<day-node> edge shape (HAS_WEATHER_DAY et al.): the
    day node key is (serial, date) → composite dst id. Day nodes embed the
    station scan in their lineage (self-join) → renamed join key."""
    d = days.select(
        F.col("serial_number").alias("day_serial"),
        S.composite_id("serial_number", "date").alias("day_id"),
    )
    return J.edge_join(
        stations, d, on=stations["serial_number"] == d["day_serial"],
        rel_type=rel_type, src_key="serial_number", dst_key="day_id",
        broadcast_src=True,
    )


@task("has_forecast", "edge", deps=["stations", "weather_forecasts"])
def has_forecast(ctx: Context, stations: DataFrame, weather_forecasts: DataFrame) -> DataFrame:
    """Station-HAS_FORECAST→WeatherForecast (graph_weather_forecast.py:64-71)."""
    return _station_day_edge(stations, weather_forecasts, "HAS_FORECAST")


@task("has_soil_day", "edge", deps=["stations", "soil_days"])
def has_soil_day(ctx: Context, stations: DataFrame, soil_days: DataFrame) -> DataFrame:
    """Station-HAS_SOIL_DAY→SoilDay (graph_soil_day.py:132-140)."""
    return _station_day_edge(stations, soil_days, "HAS_SOIL_DAY")


@task("has_layer_reading", "edge", deps=["soil_days", "soil_layer_readings"])
def has_layer_reading(ctx: Context, soil_days: DataFrame,
                      soil_layer_readings: DataFrame) -> DataFrame:
    """SoilDay-HAS_LAYER_READING→SoilLayerReading (graph_soil_layer.py:254-261)
    — parent is the (serial, date) day container, child adds depth_cm."""
    # both sides derive from the same events⋈stations lineage — rename the
    # child's join keys to keep attributes unambiguous
    sd = soil_days.select(
        "serial_number", "date", S.composite_id("serial_number", "date").alias("day_id")
    )
    slr = soil_layer_readings.select(
        F.col("serial_number").alias("r_serial"),
        F.col("date").alias("r_date"),
        S.composite_id("serial_number", "date", "depth_cm").alias("reading_id"),
    )
    return J.edge_join(
        sd, slr,
        on=[(sd["serial_number"] == slr["r_serial"]) & (sd["date"] == slr["r_date"])],
        rel_type="HAS_LAYER_READING", src_key="day_id", dst_key="reading_id",
    )


@task("has_irrigation_day", "edge", deps=["stations", "irrigation_days"])
def has_irrigation_day(ctx: Context, stations: DataFrame, irrigation_days: DataFrame) -> DataFrame:
    """Station-HAS_IRRIGATION_DAY→IrrigationDay (graph_irrigation_day.py:233-240)."""
    return _station_day_edge(stations, irrigation_days, "HAS_IRRIGATION_DAY")


@task("has_canopy_day", "edge", deps=["stations", "canopy_days"])
def has_canopy_day(ctx: Context, stations: DataFrame, canopy_days: DataFrame) -> DataFrame:
    """Station-HAS_CANOPY_DAY→CanopyDay (graph_canopy_day.py:231-238)."""
    return _station_day_edge(stations, canopy_days, "HAS_CANOPY_DAY")


@task("has_sap_day", "edge", deps=["stations", "sap_days"])
def has_sap_day(ctx: Context, stations: DataFrame, sap_days: DataFrame) -> DataFrame:
    """Station-HAS_SAP_DAY→SAPDay (graph_sap_day.py:223-230)."""
    return _station_day_edge(stations, sap_days, "HAS_SAP_DAY")


@task("has_et0", "edge", deps=["stations", "et0_days"])
def has_et0(ctx: Context, stations: DataFrame, et0_days: DataFrame) -> DataFrame:
    """Station-HAS_ET0→ET0Day (graph_et0.py:86-93) — canonical date key on
    both sides (quirk §2.10.3 fixed: no bare-string datetime mismatch)."""
    return _station_day_edge(stations, et0_days, "HAS_ET0")


def _field_analysis_edge(fields: DataFrame, analyses: DataFrame, rel_type: str,
                         id_cols: list[str]) -> DataFrame:
    """Shared Field→<analysis> edge shape (HAS_SAP_ANALYSIS / HAS_HANEY /
    HAS_TND / HAS_SOIL / HAS_WATER): composite analysis id as dst.
    Analyses embed the field dimension in their lineage → renamed key."""
    a = analyses.select(
        F.col("field_id").alias("a_field_id"),
        S.composite_id(*id_cols).alias("analysis_node_id"),
    )
    return J.edge_join(
        fields, a, on=fields["field_id"] == a["a_field_id"],
        rel_type=rel_type, src_key="field_id", dst_key="analysis_node_id",
        broadcast_src=True,
    )


@task("has_sap_analysis", "edge", deps=["fields", "sap_analyses"])
def has_sap_analysis(ctx: Context, fields: DataFrame, sap_analyses: DataFrame) -> DataFrame:
    """Field-HAS_SAP_ANALYSIS→SAPAnalysis (graph_sap_analysis.py:180-194)."""
    return _field_analysis_edge(
        fields, sap_analyses, "HAS_SAP_ANALYSIS",
        ["field_id", "date", "crop_name", "leaf_type", "sample_id"],
    )


@task("measured_element", "edge", deps=["sap_analyses", "sap_element_results"])
def measured_element(ctx: Context, sap_analyses: DataFrame,
                     sap_element_results: DataFrame) -> DataFrame:
    """SAPAnalysis-MEASURED_ELEMENT→SAPElementResult
    (graph_sap_element_result.py:135-151)."""
    sa = sap_analyses.select(
        S.composite_id("field_id", "date", "crop_name", "leaf_type", "sample_id").alias(
            "sap_analysis_id"
        )
    )
    ser = sap_element_results.withColumn(
        "ser_id", S.composite_id("sap_analysis_id", "nutrient")
    )
    return J.edge_join(
        sa, ser, on=sa["sap_analysis_id"] == ser["sap_analysis_id"],
        rel_type="MEASURED_ELEMENT", src_key="sap_analysis_id", dst_key="ser_id",
    )


@task("has_optimum_range", "edge", deps=["crops", "optimum_sap_ranges"])
def has_optimum_range(ctx: Context, crops: DataFrame, optimum_sap_ranges: DataFrame) -> DataFrame:
    """Crop-HAS_OPTIMUM_RANGE→OptimumSAPRange (graph_optimum_sap_range.py:74-82)."""
    osr = optimum_sap_ranges.withColumn("osr_id", S.composite_id("crop_name", "date"))
    return J.edge_join(
        crops, osr, on=crops["name"] == osr["crop_name"],
        rel_type="HAS_OPTIMUM_RANGE", src_key="name", dst_key="osr_id",
        broadcast_src=True,
    )


@task("has_optimum_element", "edge", deps=["optimum_sap_ranges", "optimum_element_ranges"])
def has_optimum_element(ctx: Context, optimum_sap_ranges: DataFrame,
                        optimum_element_ranges: DataFrame) -> DataFrame:
    """OptimumSAPRange-HAS_OPTIMUM_ELEMENT→OptimumElementRange
    (graph_optimum_element_range.py:159-167) — join keyed by the
    'crop|date' opt_range_id (:117)."""
    osr = optimum_sap_ranges.select(
        F.concat_ws("|", "crop_name", "date").alias("opt_range_id")
    )
    oer = optimum_element_ranges.withColumn(
        "oer_id", S.composite_id("opt_range_id", "nutrient")
    )
    return J.edge_join(
        osr, oer, on=osr["opt_range_id"] == oer["opt_range_id"],
        rel_type="HAS_OPTIMUM_ELEMENT", src_key="opt_range_id", dst_key="oer_id",
    )


@task("has_haney_analysis", "edge", deps=["fields", "haney_analyses"])
def has_haney_analysis(ctx: Context, fields: DataFrame, haney_analyses: DataFrame) -> DataFrame:
    """Field-HAS_HANEY_ANALYSIS→HaneyAnalysis (graph_haney_analysis.py:135-144)."""
    return _field_analysis_edge(
        fields, haney_analyses, "HAS_HANEY_ANALYSIS", ["field_id", "date", "lab_no"]
    )


@task("has_tnd_analysis", "edge", deps=["fields", "tnd_analyses"])
def has_tnd_analysis(ctx: Context, fields: DataFrame, tnd_analyses: DataFrame) -> DataFrame:
    """Field-HAS_TND_ANALYSIS→TNDAnalysis (graph_tnd_analysis.py:215-224)."""
    return _field_analysis_edge(
        fields, tnd_analyses, "HAS_TND_ANALYSIS", ["field_id", "date", "lab_no"]
    )


@task("has_soil_analysis", "edge", deps=["fields", "soil_analyses"])
def has_soil_analysis(ctx: Context, fields: DataFrame, soil_analyses: DataFrame) -> DataFrame:
    """Field-HAS_SOIL_ANALYSIS→SoilAnalysis (graph_soil_analysis.py:129-138)."""
    return _field_analysis_edge(
        fields, soil_analyses, "HAS_SOIL_ANALYSIS", ["field_id", "date", "lab_no"]
    )


@task("has_water_analysis", "edge", deps=["fields", "water_analyses"])
def has_water_analysis(ctx: Context, fields: DataFrame, water_analyses: DataFrame) -> DataFrame:
    """Field-HAS_WATER_ANALYSIS→WaterAnalysis (graph_water_analysis.py:110-123)."""
    return _field_analysis_edge(
        fields, water_analyses, "HAS_WATER_ANALYSIS",
        ["field_id", "date", "sample_source"],
    )


@task("has_water_param", "edge", deps=["water_analyses", "water_param_results"])
def has_water_param(ctx: Context, water_analyses: DataFrame,
                    water_param_results: DataFrame) -> DataFrame:
    """WaterAnalysis-HAS_WATER_PARAM→WaterParamResult
    (graph_water_param_result.py:120-135) — the canonical 'unknown' fill on
    BOTH sides means zero dangling edges (quirk §2.10.4 fixed; asserted in
    tests)."""
    wa = water_analyses.select(
        S.composite_id("field_id", "date", "sample_source").alias("water_analysis_id")
    )
    wpr = water_param_results.withColumn(
        "wpr_id", S.composite_id("water_analysis_id", "parameter")
    )
    return J.edge_join(
        wa, wpr, on=wa["water_analysis_id"] == wpr["water_analysis_id"],
        rel_type="HAS_WATER_PARAM", src_key="water_analysis_id", dst_key="wpr_id",
    )


@task("has_nutrient_content", "edge", deps=["product_applications", "app_nutrient_contents"])
def has_nutrient_content(ctx: Context, product_applications: DataFrame,
                         app_nutrient_contents: DataFrame) -> DataFrame:
    """ProductApplication-HAS_NUTRIENT_CONTENT→AppNutrientContent
    (graph_app_nutrient_content.py:153)."""
    anc = app_nutrient_contents.select(
        F.col("product_application_id").alias("anc_pa_id"),
        S.composite_id("product_application_id", "nutrient").alias("anc_id"),
    )
    return J.edge_join(
        product_applications, anc,
        on=product_applications["product_application_id"] == anc["anc_pa_id"],
        rel_type="HAS_NUTRIENT_CONTENT", src_key="product_application_id", dst_key="anc_id",
    )


@task("contains_nutrient", "edge",
      deps=["product_applications", "fertilizer_products", "app_nutrient_contents"])
def contains_nutrient(ctx: Context, product_applications: DataFrame,
                      fertilizer_products: DataFrame,
                      app_nutrient_contents: DataFrame) -> DataFrame:
    """FertilizerProduct-CONTAINS_NUTRIENT→AppNutrientContent
    (graph_app_nutrient_content.py:155-162) — the conditional edge (J7):
    only products with name+brand present (the Cypher `CALL { WHERE }`
    subquery) link to the nutrient rows of their applications."""
    pa = product_applications.select("product_application_id", "partkey")
    fp = fertilizer_products.select("partkey", "name", "brand").filter(
        F.col("name").isNotNull() & F.col("brand").isNotNull()
    )
    anc = app_nutrient_contents.select(
        "product_application_id",
        S.composite_id("product_application_id", "nutrient").alias("anc_id"),
    )
    linked = pa.join(F.broadcast(fp), on="partkey").join(anc, on="product_application_id")
    return linked.select(
        F.col("name").alias("src"),
        F.col("anc_id").alias("dst"),
        F.lit("CONTAINS_NUTRIENT").alias("rel_type"),
    )


@task("has_weather_day", "edge", deps=["stations", "weather_days"])
def has_weather_day(ctx: Context, stations: DataFrame, weather_days: DataFrame) -> DataFrame:
    """Station-HAS_WEATHER_DAY→WeatherDay (graph_weather_day.py:250-257)."""
    return _station_day_edge(stations, weather_days, "HAS_WEATHER_DAY")


@task("has_irrigation_event", "edge", deps=["stations", "irrigation_events"])
def has_irrigation_event(ctx: Context, stations: DataFrame,
                         irrigation_events: DataFrame) -> DataFrame:
    """Station-HAS_IRRIGATION_EVENT→IrrigationEvent
    (graph_irrigation_event.py:335-343)."""
    ev = irrigation_events.select(
        F.col("serial_number").alias("ev_serial"),
        S.composite_id("serial_number", "start_at").alias("event_id"),
    )
    return J.edge_join(
        stations, ev, on=stations["serial_number"] == ev["ev_serial"],
        rel_type="HAS_IRRIGATION_EVENT", src_key="serial_number", dst_key="event_id",
        broadcast_src=True,
    )


@task("has_application", "edge", deps=["fields", "application_events"])
def has_application(ctx: Context, fields: DataFrame, application_events: DataFrame) -> DataFrame:
    """Field-HAS_APPLICATION→ApplicationEvent (graph_application_event.py:190-207)."""
    ae = application_events.withColumn(
        "ae_id", S.composite_id("field_id", "date", "app_type", "idx")
    )
    return J.edge_join(
        fields, ae, on=fields["field_id"] == ae["field_id"],
        rel_type="HAS_APPLICATION", src_key="field_id", dst_key="ae_id",
        broadcast_src=True,
    )


@task("has_product_app", "edge", deps=["application_events", "product_applications"])
def has_product_app(ctx: Context, application_events: DataFrame,
                    product_applications: DataFrame) -> DataFrame:
    """ApplicationEvent-HAS_PRODUCT_APP→ProductApplication
    (graph_product_application.py:267-287)."""
    ae = application_events.select(
        S.composite_id("field_id", "date", "app_type", "idx").alias("ae_id")
    )
    return J.edge_join(
        ae, product_applications,
        on=ae["ae_id"] == product_applications["application_event_id"],
        rel_type="HAS_PRODUCT_APP", src_key="ae_id", dst_key="product_application_id",
    )


@task("uses_product", "edge", deps=["product_applications", "fertilizer_products"])
def uses_product(ctx: Context, product_applications: DataFrame,
                 fertilizer_products: DataFrame) -> DataFrame:
    """ProductApplication-USES_PRODUCT→FertilizerProduct
    (graph_fertilizer_product.py:223-230); P6 existence precondition is
    already inside the catalog task."""
    return J.edge_join(
        product_applications, fertilizer_products,
        on=product_applications["partkey"] == fertilizer_products["partkey"],
        rel_type="USES_PRODUCT", src_key="product_application_id", dst_key="name",
        broadcast_dst=True,
    )


# ---------------------------------------------------------------------------
# DAG resolution
# ---------------------------------------------------------------------------


def build(
    spark: SparkSession,
    sf_dir: str,
    only: list[str] | None = None,
    skip: list[str] | None = None,
    start: str | None = None,
    end: str | None = None,
) -> dict[str, DataFrame]:
    """Resolve the task DAG: returns {task → DataFrame} for the selected
    targets (plus their transitive dependencies — unlike the reference,
    where running product_applications without application_events silently
    reads stale Neo4j state). ``start``/``end`` bound the sensor-stream
    window for incremental runs."""
    targets = list(only) if only else list(REGISTRY)
    if skip:
        targets = [t for t in targets if t not in set(skip)]
    for t in targets:
        if t not in REGISTRY:
            raise KeyError(f"unknown task {t!r}; known: {sorted(REGISTRY)}")

    ctx = Context(spark, sf_dir, start=start, end=end)
    built: dict[str, DataFrame] = {}

    def resolve(name: str, stack: tuple[str, ...] = ()) -> DataFrame:
        if name in built:
            return built[name]
        if name in stack:
            raise ValueError(f"dependency cycle: {stack + (name,)}")
        td = REGISTRY[name]
        deps = {d: resolve(d, stack + (name,)) for d in td.deps}
        built[name] = td.builder(ctx, **deps)
        return built[name]

    return {t: resolve(t) for t in targets}


def validate_keys(dfs: dict[str, DataFrame]) -> None:
    """Uniqueness-constraint sweep: assert every node table's natural key
    (the reference's 23 constraints as checks — graph_constraints.py)."""
    from graph_db_spark.writers.upsert import assert_unique_key

    for name, df in dfs.items():
        td = REGISTRY[name]
        if td.kind == "node" and td.keys:
            assert_unique_key(df, td.keys)
