"""Format-pluggable source readers.

The reference's only source is an async Postgres pool with hand-written
per-fetcher SQL (/root/reference/main_graph_topraq.py:94-106 and the missing
``db.postgres`` module); every fetch re-parameterizes predicates by hand.
Here a source is a declarative scan: Catalyst pushes predicates/projections
into the format (``PushedFilters`` / ``ReadSchema`` in ``.explain``), and
the same relational shape arrives whether the bytes came from parquet, CSV,
JSON, ORC, or JDBC.

Scale notes:
- Parquet/ORC: splittable + predicate pushdown + column pruning — the
  100 TB default. ``maxPartitionBytes`` governs split sizing.
- CSV/JSON: schema inference costs an extra full pass — always pass an
  explicit ``schema`` at scale; gzip'd files are non-splittable (one task
  per file), so prefer many medium files.
- JDBC: partitioned reads need ``partitionColumn/lowerBound/upperBound/
  numPartitions`` or every executor funnels through one connection; the
  builder below makes the parallel form the easy default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

BATCH_FORMATS = ("parquet", "csv", "json", "orc", "text", "binaryFile", "avro")
# text: one string column `value` per line (raw-corpus ingest).
# binaryFile: (path, modificationTime, length, content) rows — the
#   multimodal blob ingest path (content is the opaque binary column the
#   decode operators consume); batch-only in Spark.
# avro: requires the external spark-avro jar — read_source raises a
#   clear actionable error when the classpath lacks it rather than a
#   bare ClassNotFoundException mid-plan.


def _load_with_avro_hint(reader, path: str) -> DataFrame:
    """``reader.load(path)`` with the avro classpath failure translated:
    spark-avro ships as an external module, and a bare classpath yields an
    opaque "Failed to find data source" AnalysisException — convert it to
    the actionable deploy instruction (Scala suffix varies per build, so
    the hint names the placeholder, not one hardcoded artifact)."""
    try:
        return reader.load(path)
    except Exception as e:  # noqa: BLE001 — AnalysisException subclass set varies
        if "Failed to find data source" in str(e):
            raise RuntimeError(
                "avro support needs the spark-avro package on the "
                "classpath (spark.jars.packages="
                "org.apache.spark:spark-avro_<scala-version>:<spark-version>)"
            ) from e
        raise


def read_source(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: StructType | str | None = None,
    tolerant: bool = False,
    **options: str,
) -> DataFrame:
    """Read a batch source of any supported format.

    CSV defaults to ``header=true``; pass an explicit ``schema`` to skip the
    inference pass (mandatory at scale — inference reads the data twice).

    ``tolerant=True`` is the flag-don't-fail contract at the source layer
    (the multimodal decoders' discipline applied to ingest): corrupt
    FILES are skipped (``ignoreCorruptFiles`` — at 100 TB a single
    truncated object must not kill a day-long job), and for CSV/JSON
    malformed ROWS are captured instead of raising (PERMISSIVE mode;
    include a ``_corrupt_record string`` field in the schema to retain
    the raw bad line for quarantine-and-audit). Default stays strict:
    silent data skipping must be an explicit caller decision.
    """
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unknown source format {fmt!r}; expected one of {BATCH_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    if tolerant:
        reader = reader.option("ignoreCorruptFiles", "true")
        if fmt in ("csv", "json"):
            reader = reader.option("mode", "PERMISSIVE").option(
                "columnNameOfCorruptRecord", "_corrupt_record"
            )
    for k, v in options.items():
        reader = reader.option(k, v)
    if fmt == "avro":
        return _load_with_avro_hint(reader, path)
    return reader.load(path)


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **properties: str,
) -> DataFrame:
    """Build a (lazily-evaluated) JDBC scan — the Spark-native replacement
    for the reference's Postgres pool. With ``partition_column`` bounds the
    scan fans out over ``num_partitions`` parallel connections; without, it
    is a single-connection read (only acceptable for small dimensions).

    Note: unlike file sources, JDBC resolves the schema at ``load()`` time,
    which requires a live connection — in a container without a database
    this raises immediately (tested as such).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def stream_rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic streaming source (``rate`` format) — ``timestamp, value``
    rows; the standard harness for watermark/window tests."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def stream_file_source(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: StructType | str,
    **options: str,
) -> DataFrame:
    """File-arrival streaming source: new files under ``path`` become
    micro-batches. Streaming file sources require an explicit schema."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unknown source format {fmt!r}; expected one of {BATCH_FORMATS}")
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if fmt == "avro":
        return _load_with_avro_hint(reader, path)
    return reader.load(path)
