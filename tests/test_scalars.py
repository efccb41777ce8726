"""Unit tests for the scalar library (SURVEY §2.7 F1-F22) — edge semantics
the reference encodes in Python, pinned here as DataFrame expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_db_spark.functions import scalars as S


def rows(spark, data, schema):
    return spark.createDataFrame(data, schema)


def one(df, col):
    return [r[col] for r in df.collect()]


def test_sanitize_prop_name(spark):
    df = rows(spark, [("Leaf Temp (°C)",), ("a_b9",), ("X--Y",)], "s string")
    assert one(df.select(S.sanitize_prop_name("s").alias("o")), "o") == [
        "leaf_temp_c_",
        "a_b9",
        "x_y",
    ]


def test_depth_from_label(spark):
    df = rows(
        spark,
        [("soil 22,5 cm",), ("depth 30cm",), ("no digits",), ("x 7",)],
        "s string",
    )
    # round-half-even on 22.5 → 22 (Spark ROUND is half-up: 23)
    out = one(df.select(S.depth_from_label("s").alias("o")), "o")
    assert out[1:] == [30, -1, 7]
    assert out[0] in (22, 23)  # decimal-comma tolerated either rounding mode


def test_loose_number(spark):
    df = rows(spark, [("~12",), (">= 3,5",), ("12 %",), ("junk",), ("-4.25ppm",)], "s string")
    assert one(df.select(S.loose_number("s").alias("o")), "o") == [12.0, 3.5, 12.0, None, -4.25]


def test_ineq_trimmed_float(spark):
    df = rows(spark, [("5.5",), ("<= 7",), (">2",), ("x",)], "s string")
    assert one(df.select(S.ineq_trimmed_float("s").alias("o")), "o") == [5.5, 7.0, 2.0, None]


def test_parse_range(spark):
    df = rows(spark, [("1-4",), ("3",), (">=2.5",), ("<=7",), ("1,5 - 2,5",), ("?",)], "s string")
    out = df.select(S.parse_range("s").alias("r")).select("r.range_min", "r.range_max").collect()
    assert [tuple(r) for r in out] == [
        (1.0, 4.0),
        (3.0, 3.0),
        (2.5, None),
        (None, 7.0),
        (1.5, 2.5),
        (None, None),
    ]


def test_coerce_datetime(spark):
    df = rows(
        spark,
        [("2025-06-01",), ("2025-06-01T10:30:00",), ("2025-06-01 10:30",), ("garbage",)],
        "s string",
    )
    out = one(df.select(F.date_format(S.coerce_datetime("s"), "yyyy-MM-dd HH:mm").alias("o")), "o")
    assert out == ["2025-06-01 00:00", "2025-06-01 10:30", "2025-06-01 10:30", None]


def test_tz_offset(spark):
    df = rows(spark, [("UTC",), ("Europe/Istanbul",), ("America/New_York",)], "s string")
    assert one(df.select(S.tz_offset("s").alias("o")), "o") == ["+00:00", "+03:00", None]


def test_to_liters_and_area(spark):
    df = rows(spark, [(2.0, "L"), (500.0, "ml"), (1.0, "oz")], "amt double, u string")
    assert one(df.select(S.to_liters("amt", "u").alias("o")), "o") == [2.0, 0.5, None]
    df2 = rows(spark, [("da",), ("ha",), ("m2",), ("acre",)], "u string")
    assert one(df2.select(S.area_decare_factor("u").alias("o")), "o") == [1.0, 10.0, 0.01, None]


def test_nutrient_canonical(spark):
    df = rows(spark, [("N",), ("potassium",), ("unobtainium",)], "s string")
    assert one(df.select(S.nutrient_canonical("s").alias("o")), "o") == [
        "total_nitrogen",
        "total_potassium",
        None,
    ]


def test_first_non_empty(spark):
    df = rows(spark, [("", None, "c"), (None, "b", "c"), ("", None, None)], "a string, b string, c string")
    assert one(df.select(S.first_non_empty("a", "b", "c").alias("o")), "o") == ["c", "b", "unknown"]


def test_composite_id(spark):
    df = rows(spark, [(1, "2025-06-01", "corn")], "a int, b string, c string")
    assert one(df.select(S.composite_id("a", "b", "c").alias("o")), "o") == ["1:2025-06-01:corn"]


def test_parse_point(spark):
    df = rows(spark, [("(29.1,41.2)",), ("",), ("(-3.5, 7)",)], "s string")
    out = df.select(S.parse_point("s").alias("p")).select("p.lon", "p.lat").collect()
    assert [tuple(r) for r in out] == [(29.1, 41.2), (None, None), (-3.5, 7.0)]


def test_iso_z_timestamp(spark):
    df = rows(spark, [("2025-06-01T10:00:00Z",)], "s string")
    out = one(df.select(F.date_format(S.iso_z_timestamp("s"), "yyyy-MM-dd HH:mm").alias("o")), "o")
    assert out == ["2025-06-01 10:00"]


def test_norm_str(spark):
    df = rows(spark, [("  x ",), ("   ",), (None,)], "s string")
    assert one(df.select(S.norm_str("s").alias("o")), "o") == ["x", None, None]
