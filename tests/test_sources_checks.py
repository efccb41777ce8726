"""Sources layer (format registry, JDBC plan construction, streaming
factories) and graph-shape check jobs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_db_spark import checks as CK
from graph_db_spark.sources import (
    jdbc_source,
    read_source,
    stream_file_source,
    stream_rate_source,
)
from graph_db_spark.tables import load_table


# --- sources ---------------------------------------------------------------


def test_csv_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    ref = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "customer_csv")
    ref.write.mode("overwrite").option("header", "true").csv(path)
    back = read_source(spark, "csv", path, schema=ref.schema)
    assert back.count() == ref.count()
    assert sorted(r["c_custkey"] for r in back.collect()) == sorted(
        r["c_custkey"] for r in ref.collect()
    )


def test_json_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    ref = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_json")
    ref.write.mode("overwrite").json(path)
    back = read_source(spark, "json", path, schema=ref.schema)
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in ref.collect()
    )


def test_csv_infers_schema_when_none_given(spark, sf_dir, tmp_path):
    ref = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_csv")
    ref.write.mode("overwrite").option("header", "true").csv(path)
    back = read_source(spark, "csv", path)
    assert back.count() == ref.count()
    assert set(back.columns) == set(ref.columns)


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown source format"):
        read_source(spark, "avro2", "/nonexistent")


def test_text_source_reads_lines(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    got = sorted(r["value"] for r in read_source(spark, "text", str(p)).collect())
    assert got == ["alpha", "beta", "gamma"]


def test_binaryfile_source_reads_blobs(spark, tmp_path):
    (tmp_path / "img.bin").write_bytes(b"\x89PNGfakebytes")
    rows = read_source(
        spark, "binaryFile", str(tmp_path), pathGlobFilter="*.bin"
    ).collect()
    assert len(rows) == 1
    assert rows[0]["content"] == b"\x89PNGfakebytes"
    assert rows[0]["length"] == 13


def test_avro_roundtrip_or_actionable_error(spark, sf_dir, tmp_path):
    """Where the classpath carries spark-avro, a write/read round-trips
    the nation table exactly; where it doesn't (this sandbox), the read
    path must raise the actionable deploy message, never the opaque
    'Failed to find data source'."""
    src = load_table(spark, sf_dir, "nation")
    d = str(tmp_path / "nation_avro")
    try:
        src.write.format("avro").save(d)
    except Exception:
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_source(spark, "avro", str(tmp_path))
        return
    back = read_source(spark, "avro", d)
    assert sorted(back.columns) == sorted(src.columns)
    a = {r["n_nationkey"]: r["n_name"] for r in back.collect()}
    b = {r["n_nationkey"]: r["n_name"] for r in src.collect()}
    assert a == b


def test_jdbc_reaches_driver_layer(spark):
    # JDBC schema resolution needs a live connection/driver; none exists in
    # this container, so the correct observable is a JDBC-layer error (the
    # option wiring made it through Spark's source resolution).
    with pytest.raises(Exception, match="(?i)jdbc|driver|connection"):
        jdbc_source(
            spark,
            url="jdbc:postgresql://db:5432/agro",
            table="fields",
            partition_column="id",
            lower_bound=0,
            upper_bound=1000,
            num_partitions=4,
        )


def test_jdbc_partitioned_requires_bounds(spark):
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        jdbc_source(spark, url="jdbc:x", table="t", partition_column="id")


def test_stream_rate_source_is_streaming(spark):
    df = stream_rate_source(spark, rows_per_second=5)
    assert df.isStreaming
    assert set(df.columns) == {"timestamp", "value"}


def test_stream_file_source_is_streaming(spark, sf_dir, tmp_path):
    ref = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_stream")
    ref.write.mode("overwrite").json(path)
    df = stream_file_source(spark, "json", path, schema=ref.schema)
    assert df.isStreaming


# --- checks ----------------------------------------------------------------


def test_key_violations_empty_on_unique(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    assert CK.key_violations(df, ["k"]).count() == 0


def test_key_violations_finds_dupes(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["k", "v"])
    rows = CK.key_violations(df, ["k"]).collect()
    assert [(r["k"], r["n_rows"]) for r in rows] == [(1, 2)]


def test_composite_key_violations(spark):
    df = spark.createDataFrame(
        [(1, "x", 1.0), (1, "x", 2.0), (1, "y", 3.0)], ["a", "b", "v"]
    )
    rows = CK.key_violations(df, ["a", "b"]).collect()
    assert [(r["a"], r["b"]) for r in rows] == [(1, "x")]


def test_dangling_edges_detects_missing_endpoint(spark):
    edges = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["src", "w"])
    nodes = spark.createDataFrame([(1,), (2,)], ["id"])
    rows = CK.dangling_edges(edges, nodes, ["src"], ["id"]).collect()
    assert [r["src"] for r in rows] == [3]


def test_dangling_edges_empty_when_intact(spark):
    edges = spark.createDataFrame([(1,), (2,)], ["src"])
    nodes = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    assert CK.dangling_edges(edges, nodes, ["src"], ["id"]).count() == 0


def test_check_report_shape(spark):
    nodes_ok = spark.createDataFrame([(1,), (2,)], ["id"])
    nodes_dup = spark.createDataFrame([(1,), (1,)], ["id"])
    edges = spark.createDataFrame([(1,), (9,)], ["src"])
    rep = CK.check_report(
        {"ok_table": (nodes_ok, ["id"]), "dup_table": (nodes_dup, ["id"])},
        [("edge_a", edges, nodes_ok, ["src"], ["id"])],
    )
    got = {(r["check"], r["target"]): r["n_bad"] for r in rep.collect()}
    assert got[("unique_key", "ok_table")] == 0
    assert got[("unique_key", "dup_table")] == 1
    assert got[("no_dangling", "edge_a")] == 1


def test_events_ts_normalized_to_session_timestamp(spark, sf_dir):
    """events.parquet carries TIMESTAMP(NANOS); depending on the Spark
    build it scans as long nanos (nanosAsLong) or TIMESTAMP_NTZ (native
    nanos read). load_table must normalize BOTH to session-tz TimestampType
    truncated to micros — downstream numeric casts (sessionization gap
    math) and DuckDB oracle parity rely on it."""
    from pyspark.sql.types import TimestampType

    from graph_db_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    # numeric cast works (would raise AnalysisException on NTZ)
    from pyspark.sql import functions as F

    assert ev.select(F.col("ts").cast("double")).limit(1).count() == 1


def test_tolerant_read_skips_corrupt_file_and_captures_bad_rows(spark, tmp_path):
    """tolerant=True: a corrupt parquet part is skipped instead of
    failing the scan, and a malformed JSON line lands in _corrupt_record
    for quarantine; the default stays strict."""
    import pytest

    from graph_db_spark.sources.registry import read_source

    # parquet dir: one valid part + one garbage file
    pq = str(tmp_path / "pq")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(1) \
        .write.mode("overwrite").parquet(pq)
    (tmp_path / "pq" / "part-corrupt.parquet").write_bytes(b"not a parquet file at all")
    good = read_source(spark, "parquet", pq, tolerant=True)
    assert {r["id"] for r in good.collect()} == {1, 2}
    with pytest.raises(Exception):
        read_source(spark, "parquet", pq).collect()  # strict default raises

    # json: malformed row captured, valid rows parsed
    js = tmp_path / "rows.json"
    js.write_text('{"id": 1, "v": "ok"}\n{"id": 2 "v": BROKEN}\n{"id": 3, "v": "ok"}\n')
    df = read_source(
        spark, "json", str(js),
        schema="id long, v string, _corrupt_record string", tolerant=True,
    )
    rows = df.collect()
    assert {r["id"] for r in rows if r["_corrupt_record"] is None} == {1, 3}
    assert sum(1 for r in rows if r["_corrupt_record"] is not None) == 1
