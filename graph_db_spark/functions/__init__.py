from graph_db_spark.functions import scalars  # noqa: F401
