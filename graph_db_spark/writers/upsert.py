"""Keyed-upsert writer library — SURVEY.md §4.1.1.

Cypher ``MERGE`` in the reference is insert-or-update keyed by the 23
composite uniqueness constraints (/root/reference/app/graph_constraints.py),
with three SET variants:

- **overwrite** — plain ``MERGE ... SET`` (e.g. graph_fields.py:16-25):
  the new row's values win.
- **coalesce** — keep-existing-unless-new-non-null
  (``CASE WHEN $nutrients IS NULL THEN fp.nutrients ELSE $nutrients END``,
  graph_fertilizer_product.py:211-219): per-column ``coalesce(new, old)``.
- **if_absent** — set-only-if-currently-null
  (``coalesce(sl.depth_label, $depth_label)``, graph_soil_layer.py:226):
  per-column ``coalesce(old, new)``.

Implementation: pure DataFrame merge (union → window-dedupe or outer-join →
per-column coalesce), so it works on plain parquet tables; on a Delta/Iceberg
lake the same keys/strategies map 1:1 onto ``MERGE INTO``. Idempotent by
construction: re-running the same batch yields an identical table (the
reference's re-run-safe window-widening contract,
graph_irrigation_event.py:52-53).

Scale: one shuffle on the key columns; both inputs are key-partitioned by
the window/join, so repeated upserts into a bucketed table reuse the
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STRATEGIES = ("overwrite", "coalesce", "if_absent")


def upsert(
    existing: DataFrame | None,
    updates: DataFrame,
    keys: list[str],
    strategy: str = "overwrite",
    dedupe_order: list[str] | None = None,
) -> DataFrame:
    """Merge ``updates`` into ``existing`` on ``keys`` with the given
    strategy; returns the new table. ``existing=None`` means first write.

    ``updates`` may itself contain duplicate keys (the reference relies on
    MERGE idempotence for that); they are collapsed first — last wins by
    ``dedupe_order`` (default: all non-key columns, so the collapse is a
    deterministic function of the data regardless of partition layout).
    """
    if strategy not in STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r}; expected one of {STRATEGIES}")

    updates = collapse_duplicates(updates, keys, dedupe_order)
    if existing is None:
        return updates

    if strategy == "overwrite":
        # union with precedence: new rows shadow old rows on the same key.
        tagged_old = existing.select(*updates.columns).withColumn("__pri", F.lit(0))
        tagged_new = updates.withColumn("__pri", F.lit(1))
        w = Window.partitionBy(*keys).orderBy(F.col("__pri").desc())
        return (
            tagged_old.unionByName(tagged_new)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__pri", "__rn")
        )

    # coalesce / if_absent need per-column merging → full outer join.
    value_cols = [c for c in updates.columns if c not in keys]
    old = existing.select(*updates.columns).alias("old")
    new = updates.alias("new")
    joined = old.join(new, on=keys, how="full_outer")
    merged_cols = [F.col(k).alias(k) for k in keys]
    for c in value_cols:
        if strategy == "coalesce":  # new non-null wins
            merged = F.coalesce(new[c], old[c])
        else:  # if_absent: existing value sticks
            merged = F.coalesce(old[c], new[c])
        merged_cols.append(merged.alias(c))
    return joined.select(*merged_cols)


def collapse_duplicates(
    df: DataFrame, keys: list[str], order: list[str] | None = None
) -> DataFrame:
    """Collapse duplicate keys inside one batch — last row wins by ``order``
    (A8 dedup with explicit determinism).

    Without an explicit ``order``, ties among duplicate-key rows are broken
    by ALL non-key columns (desc): the key columns are constant within a
    window partition, so ordering by them would leave the winner up to
    partition layout / task retries — breaking the idempotent-MERGE
    contract. Ordering by the full value tuple makes the collapse a pure
    function of the data.
    """
    if order:
        order_cols = [F.col(c).desc() for c in order]
    else:
        from pyspark.sql.types import ArrayType, MapType, StructType

        def orderable(dt) -> bool:
            # maps aren't orderable at ANY nesting depth (array<map<...>>,
            # struct containing a map fail analysis just like a bare map)
            if isinstance(dt, MapType):
                return False
            if isinstance(dt, ArrayType):
                return orderable(dt.elementType)
            if isinstance(dt, StructType):
                return all(orderable(f.dataType) for f in dt.fields)
            return True

        value_cols = [
            f.name for f in df.schema.fields if f.name not in keys and orderable(f.dataType)
        ]
        unorderable = [
            f.name for f in df.schema.fields if f.name not in keys and not orderable(f.dataType)
        ]
        if value_cols:
            order_cols = [F.col(c).desc_nulls_last() for c in value_cols]
        elif unorderable:
            # every value column is map-bearing: order by a canonical JSON
            # serialization hash so the winner is a pure function of the
            # data, not of partition layout / task retries.
            order_cols = [F.xxhash64(F.to_json(F.struct(*unorderable))).desc()]
        else:
            # no value columns → rows are full duplicates; any winner is identical
            order_cols = [F.col(c).desc_nulls_last() for c in keys]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def assert_unique_key(df: DataFrame, keys: list[str]) -> None:
    """Uniqueness-constraint assertion (replaces the 23 Neo4j constraints,
    /root/reference/app/graph_constraints.py:4-133). Raises on violation."""
    dupes = df.groupBy(*keys).count().filter(F.col("count") > 1)
    bad = dupes.limit(1).collect()
    if bad:
        raise AssertionError(f"duplicate key {keys} example: {bad[0].asDict()}")


def write_table(df: DataFrame, path: str, keys: list[str] | None = None, mode: str = "overwrite") -> None:
    """Materialize a node/edge table as parquet. With ``keys``, repartition
    by key so downstream key-joins read co-located data (bucketing analogue
    for plain parquet)."""
    out = df.repartition(*keys) if keys else df
    out.write.mode(mode).parquet(path)
