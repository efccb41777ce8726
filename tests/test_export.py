"""Neo4j-compat export edge: native types project to component maps / JSON
strings only at the boundary."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from graph_db_spark.export import export_graph, neo4j_compat
from graph_db_spark.tables import load_table


def test_timestamp_becomes_component_struct(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2025, 6, 1, 14, 30, 45))], ["id", "at"]
    )
    out = neo4j_compat(df, tz="+03:00")
    assert set(out.columns) == {"id", "at_dt"}
    row = out.collect()[0]["at_dt"]
    assert (row["year"], row["month"], row["day"]) == (2025, 6, 1)
    assert (row["hour"], row["minute"], row["second"]) == (14, 30, 45)
    assert row["timezone"] == "+03:00"


def test_complex_types_become_json(spark):
    df = spark.createDataFrame([(1, [1, 2, 3])], ["id", "depths"]).withColumn(
        "meta", F.struct(F.lit(7).alias("k"), F.lit("x").alias("s"))
    )
    out = neo4j_compat(df)
    assert set(out.columns) == {"id", "depths_json", "meta_json"}
    row = out.collect()[0]
    assert row["depths_json"] == "[1,2,3]"
    assert row["meta_json"] == '{"k":7,"s":"x"}'


def test_scalars_pass_through(spark):
    df = spark.createDataFrame([(1, "a", 2.5, True)], ["id", "s", "v", "b"])
    out = neo4j_compat(df)
    assert out.columns == ["id", "s", "v", "b"]
    assert out.collect() == df.collect()


def test_export_graph_layout(spark, sf_dir, tmp_path):
    customers = load_table(spark, sf_dir, "customer").limit(10)
    orders = load_table(spark, sf_dir, "orders").limit(10)
    edges = orders.select(
        F.col("o_custkey").alias("src"), F.col("o_orderkey").alias("dst")
    )
    root = str(tmp_path / "neo4j_export")
    export_graph(
        {"Customer": customers, "Order": orders}, {"PLACED": edges}, root, tz="+00:00"
    )
    cust_back = spark.read.parquet(f"{root}/nodes/Customer")
    assert cust_back.count() == 10
    orders_back = spark.read.parquet(f"{root}/nodes/Order")
    # timestamp column exported as component struct
    assert "o_orderdate_dt" in orders_back.columns
    assert spark.read.parquet(f"{root}/edges/PLACED").count() == 10
