"""Pipeline DAG: target selection, dependency resolution, uniqueness
constraints, no dangling edges (the invariant the reference violates,
SURVEY §2.10.3-4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_db_spark.plans.pipeline import REGISTRY, build, validate_keys


def test_registry_covers_reference_families():
    kinds = {n: t.kind for n, t in REGISTRY.items()}
    # dimensions, sensor days, sessions, labs, activity chain, edges
    for expected in [
        "fields", "crops", "stations", "weather_days", "soil_days",
        "irrigation_days", "canopy_days", "sap_days", "soil_layer_readings",
        "irrigation_events", "et0_days", "weather_forecasts",
        "haney_analyses", "tnd_analyses", "soil_analyses",
        "soil_param_results", "application_events", "product_applications",
        "fertilizer_products", "app_nutrient_contents",
    ]:
        assert kinds.get(expected) == "node", expected
    for expected in [
        "planted_with", "has_station", "has_weather_day", "has_soil_param",
        "has_irrigation_event", "has_application", "has_product_app",
        "uses_product",
    ]:
        assert kinds.get(expected) == "edge", expected


def test_only_pulls_transitive_deps(spark, sf_dir):
    out = build(spark, sf_dir, only=["has_product_app"])
    assert set(out) == {"has_product_app"}
    assert out["has_product_app"].columns == ["src", "dst", "rel_type"]


def test_skip_excludes(spark, sf_dir):
    out = build(spark, sf_dir, only=["fields", "crops"], skip=["crops"])
    assert set(out) == {"fields"}


def test_unknown_task_raises(spark, sf_dir):
    with pytest.raises(KeyError):
        build(spark, sf_dir, only=["nope"])


def test_node_keys_unique(spark, sf_dir):
    names = [n for n, t in REGISTRY.items() if t.kind == "node"]
    out = build(spark, sf_dir, only=names)
    validate_keys(out)  # raises on any duplicate natural key


def test_no_dangling_edges(spark, sf_dir):
    """Every edge endpoint resolves to a node — the check the reference
    can't pass for HAS_SOIL_PARAM (string vs datetime keys, §2.10.3)."""
    out = build(spark, sf_dir, only=["soil_analyses", "soil_param_results", "has_soil_param"])
    from graph_db_spark.functions import scalars as S

    nodes = out["soil_analyses"].select(
        S.composite_id("field_id", "date", "lab_no").alias("id")
    )
    dangling = out["has_soil_param"].join(
        nodes, on=out["has_soil_param"]["src"] == nodes["id"], how="left_anti"
    )
    assert dangling.count() == 0


def test_zero_sum_quirk_flavors(spark, sf_dir):
    out = build(spark, sf_dir, only=["weather_days", "irrigation_days"])
    # weather flavor keeps real sums; irrigation flavor nulls zero-sums.
    w = out["weather_days"].select(F.explode("metrics")).select("value.sum")
    assert w.filter(F.col("sum").isNull()).count() == 0


def test_product_idx_deterministic(spark, sf_dir):
    out1 = build(spark, sf_dir, only=["product_applications"])["product_applications"]
    out2 = build(spark, sf_dir, only=["product_applications"])["product_applications"]
    a = {tuple(r) for r in out1.collect()}
    b = {tuple(r) for r in out2.collect()}
    assert a == b
