"""Graph analytics on DataFrames — connected components and PageRank.

BASELINE.json's north star: "Graph database analytics (PageRank, connected
components) fit GraphX ... GraphX for analytics". Implemented directly on
DataFrames (no GraphFrames/GraphX dependency — SURVEY §7.4.6 fallback):
iterative join programs with ``localCheckpoint`` lineage truncation, the
same dataflow shape Pregel-on-a-dataflow-engine systems use (Pregelix,
VLDB 2014).

Scale notes:
- Each iteration is one join + one aggregation — shuffle on vertex id.
  Pre-partitioning vertices and edges by id/src lets consecutive iterations
  reuse the exchange.
- Convergence checks are tiny aggregations (count of changed rows).
- ``localCheckpoint(eager=True)`` bounds plan growth; on a real cluster use
  reliable checkpointing to HDFS/S3 instead (driver-fault tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components via iterative min-label propagation
    (large-star/small-star style: each round every vertex adopts the minimum
    component id among itself and its neighbors).

    ``edges`` needs ``src``/``dst`` columns (direction ignored). Returns
    ``(id, component)`` where ``component`` is the minimum vertex id in the
    component (stable, deterministic).

    O(diameter) rounds; for 100 TB graphs switch the propagation to the
    alternating star contractions (O(log n) rounds) — the per-round dataflow
    is identical, so the plan shape below is the one to optimize.
    """
    sym = (
        edges.select(F.col("src").cast("string").alias("a"), F.col("dst").cast("string").alias("b"))
        .unionAll(
            edges.select(F.col("dst").cast("string").alias("a"), F.col("src").cast("string").alias("b"))
        )
        .distinct()
    )
    ids = sym.select(F.col("a")).distinct()
    # self-loops fold "min over self" into the same groupBy as "min over
    # neighbors": per iteration the plan is exactly one join + one
    # aggregation (two key shuffles), no separate left-join-back step.
    sym = sym.unionAll(ids.select("a", F.col("a").alias("b"))).localCheckpoint(eager=True)
    comp = ids.select(F.col("a").alias("id")).withColumn("component", F.col("id"))
    for _ in range(max_iter):
        # checkpoint FIRST (single execution of the join+agg), then run the
        # convergence probe against the materialized result — otherwise the
        # probe action and the checkpoint each execute the full iteration.
        updated = (
            sym.join(
                comp.select(F.col("id").alias("b"), "component"), on="b"
            )
            .groupBy(F.col("a").alias("id"))
            .agg(
                F.min("component").alias("new_component"),
                # the self-loop row carries this vertex's own (old) component
                # through the same join — no join-back needed for convergence
                F.min(F.when(F.col("b") == F.col("a"), F.col("component"))).alias(
                    "old_component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.filter(F.col("new_component") != F.col("old_component")).limit(1).count()
        )
        comp = updated.select("id", F.col("new_component").alias("component"))
        if changed == 0:
            break
    return comp


def pagerank(
    edges: DataFrame,
    reset_prob: float = 0.15,
    max_iter: int = 10,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """PageRank with uniform reset; dangling mass redistributed uniformly.

    ``edges``: ``src``/``dst``. Returns ``(id, rank)`` summing to ~1.

    Per iteration: contributions = rank/out_degree shuffled to dst + two
    scalar aggregations. out_degree is computed once and joined each round —
    co-partitioned with ranks on id, so AQE reuses the exchange.
    """
    e = edges.select(F.col("src").cast("string").alias("src"), F.col("dst").cast("string").alias("dst"))
    if vertices is not None:
        v = vertices.select(F.col("id").cast("string").alias("id")).distinct()
    else:
        v = (
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    v = v.localCheckpoint(eager=True)
    n = v.count()
    # only vertices with out-edges produce contributions; dangling mass is
    # recovered by conservation (see below), so the per-iteration plan never
    # touches zero-degree vertices on the contribution side.
    out_deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("out_degree"))
        .localCheckpoint(eager=True)
    )

    ranks = v.withColumn("rank", F.lit(1.0 / n))
    for _ in range(max_iter):
        contribs = (
            ranks.join(out_deg, on="id")
            .join(e, F.col("id") == e["src"])
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("out_degree")).alias("contrib"))
            .groupBy("id")
            .agg(F.sum("contrib").alias("in_contrib"))
        )
        # partial update without dangling redistribution; one heavy job.
        partial = (
            v.join(contribs, on="id", how="left")
            .select(
                "id",
                (
                    F.lit(reset_prob / n)
                    + F.lit(1 - reset_prob) * F.coalesce(F.col("in_contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        # mass conservation: 1 - sum(partial) == (1-reset)*dangling_mass,
        # redistributed uniformly — a cheap scan of the checkpointed result
        # instead of a second join pipeline per iteration.
        mass = partial.agg(F.sum("rank")).collect()[0][0]
        ranks = partial.withColumn("rank", F.col("rank") + F.lit((1.0 - mass) / n))
    return ranks
