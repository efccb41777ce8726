"""Neo4j-compatible export edge — the engine's optional S11 sink.

Internally the engine keeps native Spark types everywhere (TimestampType
keys, ArrayType/MapType payloads — fixing SURVEY §2.10.3's type-mismatched
keys). The reference instead writes Neo4j ``datetime($map)`` component maps
(/root/reference/app/utils.py:45-63) and JSON-string properties
(graph_irrigation_event.py:275-319, graph_sap_analysis.py:137-139). This
module performs exactly that lossy projection, only at the export boundary:

- TimestampType / DateType columns → ``struct{year..second[,timezone]}``
  (F9) suffixed ``_dt``;
- Struct/Array/Map columns → JSON strings (F16) suffixed ``_json``;
- everything else passes through.

Scale: a narrow per-row projection — no shuffle; writes stream straight
from the node/edge tables' existing partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DateType,
    MapType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from graph_db_spark.functions.scalars import datetime_components, json_encode


def neo4j_compat(df: DataFrame, tz: str | None = None) -> DataFrame:
    """Project a node/edge table to Neo4j-export shape (see module doc)."""
    cols = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, (TimestampType, TimestampNTZType, DateType)):
            tz_col = F.lit(tz) if tz is not None else None
            cols.append(datetime_components(c, tz=tz_col).alias(f"{field.name}_dt"))
        elif isinstance(field.dataType, (StructType, ArrayType, MapType)):
            cols.append(json_encode(c).alias(f"{field.name}_json"))
        else:
            cols.append(c)
    return df.select(*cols)


def export_graph(
    node_tables: dict[str, DataFrame],
    edge_tables: dict[str, DataFrame],
    path: str,
    tz: str | None = None,
) -> None:
    """Write every node/edge table in Neo4j-compatible shape under
    ``path/nodes/<label>`` and ``path/edges/<rel_type>`` (parquet). A bulk
    importer (``neo4j-admin database import``-style) consumes these
    directly; each label/type keeps its own schema."""
    for label, df in node_tables.items():
        neo4j_compat(df, tz=tz).write.mode("overwrite").parquet(f"{path}/nodes/{label}")
    for rel, df in edge_tables.items():
        neo4j_compat(df, tz=tz).write.mode("overwrite").parquet(f"{path}/edges/{rel}")
