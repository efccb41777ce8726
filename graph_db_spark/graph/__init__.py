from graph_db_spark.graph.model import PropertyGraph  # noqa: F401
from graph_db_spark.graph.algorithms import connected_components, pagerank  # noqa: F401
