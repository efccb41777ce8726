from graph_db_spark.writers import upsert  # noqa: F401
