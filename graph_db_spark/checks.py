"""Graph-shape invariant checks — the reference's 23 uniqueness constraints
and edge integrity, as data-quality jobs (SURVEY §5.5, §7.3 "custom check
job").

The reference enforces keys with Neo4j ``CREATE CONSTRAINT ... IS UNIQUE``
DDL (/root/reference/app/graph_constraints.py:4-133) and silently produces
dangling relationships when writer key types disagree (SURVEY §2.10.3-4,
e.g. graph_soil_param_result.py:131-146 matching a string-keyed node with a
datetime key). Here both become assertable DataFrame jobs:

- :func:`key_violations` — rows whose composite key appears more than once
  (the uniqueness-constraint breach set; empty ⇔ constraint holds).
- :func:`dangling_edges` — edge rows whose endpoint key has no matching
  node row (the dangling-relationship set; empty ⇔ referential integrity).

Scale: each check is one shuffle on the key columns. For dangling edges the
node side carries only its key columns (column-pruned before the join), and
a ``left_anti`` join never materializes matches — at 100 TB both checks are
a single pass over the edge table plus a key-only scan of the node table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Composite-key uniqueness check: returns ``keys... , n_rows`` for every
    key appearing more than once. Empty result ⇔ the constraint holds."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def dangling_edges(
    edges: DataFrame,
    nodes: DataFrame,
    edge_key: list[str],
    node_key: list[str] | None = None,
) -> DataFrame:
    """Referential-integrity check: edge rows whose endpoint key does not
    exist in ``nodes``. ``node_key`` defaults to ``edge_key`` (same names).

    ``left_anti`` join: the node side is pruned to its key columns only, so
    nothing but keys shuffles.
    """
    node_key = node_key or edge_key
    node_keys = nodes.select(
        *[F.col(n).alias(e) for e, n in zip(edge_key, node_key)]
    ).distinct()
    return edges.join(node_keys, on=edge_key, how="left_anti")


def check_report(
    node_tables: dict[str, tuple[DataFrame, list[str]]],
    edge_specs: list[tuple[str, DataFrame, DataFrame, list[str], list[str] | None]] | None = None,
) -> DataFrame:
    """One-row-per-check summary across a whole graph: ``(check, target,
    n_bad)``. ``node_tables``: name → (df, key_cols). ``edge_specs``:
    (name, edges, nodes, edge_key, node_key) tuples."""
    parts: list[DataFrame] = []
    for name, (df, keys) in node_tables.items():
        v = key_violations(df, keys).agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_bad")
        )
        parts.append(
            v.select(F.lit("unique_key").alias("check"), F.lit(name).alias("target"), "n_bad")
        )
    for name, edges, nodes, ekey, nkey in edge_specs or []:
        d = dangling_edges(edges, nodes, ekey, nkey).agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_bad")
        )
        parts.append(
            d.select(F.lit("no_dangling").alias("check"), F.lit(name).alias("target"), "n_bad")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
