from graph_db_spark.streaming import jobs  # noqa: F401
