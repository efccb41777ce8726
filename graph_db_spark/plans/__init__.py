from graph_db_spark.plans import queries  # noqa: F401
