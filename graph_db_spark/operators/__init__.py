from graph_db_spark.operators import aggregates, joins, sessionize  # noqa: F401
