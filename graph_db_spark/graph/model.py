"""Property-graph layer on DataFrames.

The reference materializes a 27-label / 27-relationship property graph in
Neo4j (SURVEY §1.2-1.3); here the graph IS a pair of DataFrames:

- ``vertices``: ``(id, label, properties...)`` — one row per node, ``id`` a
  stable string natural key (F15 composite ids).
- ``edges``: ``(src, dst, rel_type, properties...)``.

Motif traversal (the Cypher ``MATCH (a)-[:R]->(b)`` patterns) is join
composition; analytics (connected components, PageRank) are iterative
DataFrame programs in :mod:`graph_db_spark.graph.algorithms` — the
"GraphX for analytics" stance from BASELINE.json, implemented directly on
DataFrames so no external GraphFrames dependency is needed (SURVEY §7.4.6).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PropertyGraph:
    vertices: DataFrame  # columns: id, label, ...
    edges: DataFrame  # columns: src, dst, rel_type, ...

    def out_degrees(self) -> DataFrame:
        """Out-degree per vertex — one shuffle on src."""
        return self.edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))

    def in_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))

    def degrees(self) -> DataFrame:
        """Total degree treating edges as undirected."""
        ends = self.edges.select(F.col("src").alias("id")).unionAll(
            self.edges.select(F.col("dst").alias("id"))
        )
        return ends.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))

    def expand(self, frontier: DataFrame, rel_type: str | None = None) -> DataFrame:
        """One traversal hop: frontier ``(id, ...)`` → neighbors ``(id, ...)``
        via edges (optionally restricted to one relationship type). The
        building block for motif paths — Cypher ``(a)-[:R]->(b)`` becomes
        ``expand(a_nodes, "R")`` joined to b's label.
        """
        e = self.edges
        if rel_type is not None:
            e = e.filter(F.col("rel_type") == rel_type)
        return (
            frontier.select(F.col("id").alias("src"))
            .join(e, on="src", how="inner")
            .select(F.col("dst").alias("id"))
        )

    def motif_path(self, rel_types: list[str]) -> DataFrame:
        """n-hop path motif: returns ``(v0, v1, ..., vn)`` rows for the
        relationship-type chain — the join-composition equivalent of the
        reference's Field→Station→WeatherDay style paths (SURVEY §1.3).

        Each hop is an equi-join on the previous hop's endpoint; Catalyst
        reorders and AQE handles skew. At 100 TB restrict the anchor set
        first (filter v0) so hops stay selective.
        """
        out = None
        for i, rt in enumerate(rel_types):
            hop = (
                self.edges.filter(F.col("rel_type") == rt)
                .select(F.col("src").alias(f"v{i}"), F.col("dst").alias(f"v{i+1}"))
            )
            out = hop if out is None else out.join(hop, on=f"v{i}", how="inner")
        cols = [f"v{i}" for i in range(len(rel_types) + 1)]
        return out.select(*cols)
