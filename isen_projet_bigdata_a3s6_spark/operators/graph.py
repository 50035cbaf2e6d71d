"""Distributed PageRank — the second iterative-graph operator next to
``functions.dedup.connected_components``, sharing its durability story
(``checkpointing.cut_lineage`` per round: reliable ``checkpoint()`` when a
checkpoint dir is configured, ``localCheckpoint`` otherwise).

Shape per iteration: one equi-join of ranks onto edges (shuffle on src) +
one groupBy dst (shuffle on dst) — the standard Pregel-as-joins layout.
Dangling nodes (no out-edges) redistribute their mass uniformly, so ranks
sum to 1 every iteration (the test asserts it).

At 100 TB: pre-partition ``edges`` by src and persist, so the per-round
join reuses the same partitioning; rank frames stay (node, double) narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpointing import cut_lineage


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    reliable: bool | None = None,
) -> DataFrame:
    """Ranks after ``iterations`` rounds of the power method on the edge
    list (uniform out-edge weights). Returns ``(node, rank)``, ranks
    summing to 1. Deterministic: plain float aggregation order is fixed by
    round6 at the END only — intermediate sums stay unrounded."""
    if not 0 < damping < 1:
        raise ValueError("pagerank: damping must be in (0, 1)")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
    ).persist()
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty graph")
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # pre-join degree onto edges once; partition by src for round reuse
    contrib_edges = (
        e.join(out_deg, "src")
        .repartition("src")
        .persist()
    )
    contrib_edges.count()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        msgs = (
            contrib_edges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .select("dst", (F.col("rank") / F.col("deg")).alias("m"))
            .groupBy("dst")
            .agg(F.sum("m").alias("inflow"))
        )
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
        ).first()["d"]
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(msgs, nodes.node == msgs.dst, "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        ranks = cut_lineage(ranks, reliable=reliable)
    contrib_edges.unpersist()
    nodes.unpersist()
    return ranks
