"""The reference's 25-task ETL DAG, re-expressed declaratively.

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

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)


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
    return (
        p.filter(F.col("p_name").isNotNull() & F.col("p_brand").isNotNull())
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("name"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("nutrients_raw"),
            F.round("p_retailprice", 4).alias("price"),
        )
        .dropDuplicates(["name", "brand"])
    )


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
# Remaining edges (J1 family)
# ---------------------------------------------------------------------------


@task("has_weather_day", "edge", deps=["stations", "weather_days"])
def has_weather_day(ctx: Context, stations: DataFrame, weather_days: DataFrame) -> DataFrame:
    """Station-HAS_WEATHER_DAY→WeatherDay (graph_weather_day.py:250-257)."""
    return J.edge_join(
        stations, weather_days,
        on=stations["serial_number"] == weather_days["serial_number"],
        rel_type="HAS_WEATHER_DAY", src_key="serial_number", dst_key="date",
        broadcast_src=True,
    )


@task("has_irrigation_event", "edge", deps=["stations", "irrigation_events"])
def has_irrigation_event(ctx: Context, stations: DataFrame,
                         irrigation_events: DataFrame) -> DataFrame:
    """Station-HAS_IRRIGATION_EVENT→IrrigationEvent
    (graph_irrigation_event.py:335-343)."""
    return J.edge_join(
        stations, irrigation_events,
        on=stations["serial_number"] == irrigation_events["serial_number"],
        rel_type="HAS_IRRIGATION_EVENT", src_key="serial_number", dst_key="start_at",
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
) -> dict[str, DataFrame]:
    """Resolve the task DAG: returns {task → DataFrame} for the selected
    targets (plus their transitive dependencies — unlike the reference,
    where running product_applications without application_events silently
    reads stale Neo4j state)."""
    targets = list(only) if only else list(REGISTRY)
    if skip:
        targets = [t for t in targets if t not in set(skip)]
    for t in targets:
        if t not in REGISTRY:
            raise KeyError(f"unknown task {t!r}; known: {sorted(REGISTRY)}")

    ctx = Context(spark, sf_dir)
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
