"""Bucketed co-located joins — the fact⋈fact shuffle-deletion path that
SCALE.md §2 promises for 100 TB (J1 at fact scale): both sides bucketed on
the join key means the sort-merge join reads co-located buckets and the
physical plan carries NO Exchange.
"""

from __future__ import annotations

import pytest

from graph_db_spark.tables import load_table


@pytest.fixture()
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a catalog; session already points at a warehouse dir
    yield
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            spark.table("b_orders")["o_orderkey"]
            == spark.table("b_lineitem")["l_orderkey"],
        )
        n = joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert n == lineitem.count()  # FK join keeps every line
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_reuses_partitioning(spark, warehouse):
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    agg = spark.table("b_orders").groupBy("o_orderkey").count()
    agg.count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # grouping on the bucket key needs no exchange either
    assert "Exchange" not in plan, plan
