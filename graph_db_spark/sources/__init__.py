"""Source layer: format-pluggable batch readers, a JDBC builder, and
streaming source factories."""

from graph_db_spark.sources.registry import (  # noqa: F401
    jdbc_source,
    read_source,
    stream_file_source,
    stream_rate_source,
)
