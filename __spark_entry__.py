"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (daily event stats, the A1 aggregation
family) at sf0.001. ``queries()`` / ``oracle_sql()`` — the SURVEY.md §2
operator inventory; each PySpark query has an equivalent DuckDB oracle SQL
unless genuinely non-SQL-expressible (graph algorithms, streaming), which
get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graph_db_spark.plans.queries import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["event_day_stats"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omissions → rows-only checks."""
    return dict(ORACLE_SQL)
