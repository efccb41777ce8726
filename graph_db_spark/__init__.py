"""graph_db_spark — a PySpark-native analytics engine.

A brand-new engine with the query / data-processing capabilities of the
reference repo ``aarisalan/graph_db`` (an asyncio Postgres→Neo4j property
graph ETL), re-expressed as idiomatic Spark DataFrame / SQL programs:

- node/edge **table layer** with keyed-upsert writers
  (:mod:`graph_db_spark.writers.upsert`),
- **operator layer** — the SURVEY.md §2 inventory as composable DataFrame
  functions, all native Column expressions (:mod:`graph_db_spark.operators`),
- **scalar function library** — every parser/normalizer in the reference
  (SURVEY.md §2.7 F1-F22) as Column helpers
  (:mod:`graph_db_spark.functions.scalars`),
- **graph layer** — vertices/edges assembly, motif joins, connected
  components + PageRank on DataFrames (:mod:`graph_db_spark.graph`),
- **pipeline layer** — the reference's 25-task DAG as declarative table
  definitions (:mod:`graph_db_spark.plans.pipeline`),
- **streaming layer** — Structured Streaming analogues of the daily
  aggregations and gap sessionization (:mod:`graph_db_spark.streaming`),
- **LLM-data-pipeline extensions** — dedup (exact/minhash/simhash/jaccard),
  similarity search, text analysis, multimodal plumbing
  (:mod:`graph_db_spark.operators.dedup` and friends).

Design stance: declare the logical plan with DataFrame/SQL, let Catalyst +
Tungsten choose the physical strategy; no Python row-at-a-time UDFs in hot
paths; shuffles minimized (broadcast dims, partial aggs); every operator
designed for 1000-executor / 100 TB scale even though tests run local.
"""

__version__ = "0.1.0"

from graph_db_spark.session import get_spark  # noqa: F401
from graph_db_spark.tables import load_tables  # noqa: F401
