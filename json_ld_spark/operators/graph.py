"""Graph analytics over the canonical KG edge table.

``pagerank_fixed_point`` — iterative PageRank as pure DataFrame
joins/aggregations (the same execution shape as pipeline/cc.py: per-round
join + groupBy, ``localCheckpoint`` each iteration to cut lineage, AQE
re-planning each round).

Arithmetic is INTEGER fixed-point (ranks in 1e-12 units of total mass,
shares via floor division) rather than float: float PageRank sums are
order-nondeterministic across partitionings (1e-16-ulp drift per
aggregation, amplified over iterations), which would break the bit-exact
DuckDB oracle and replayability. Floor division drops a bounded rounding
remainder per edge per round (< outdeg units, i.e. < 1e-11 of total mass)
— an explicitly chosen determinism-over-mass-conservation trade; dangling
nodes' mass is likewise dropped rather than redistributed (documented,
mirrored exactly by the golden oracle).

Scale: each round shuffles the edge list once (join on src) and the
contribution list once (groupBy dst) — identical cost profile to one CC
round; 10 rounds of a 10^12-edge graph are 20 bounded shuffles with no
driver-side state beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOTAL_MASS = 10**12
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iters: int = 10,
) -> DataFrame:
    """Returns (node, rank) — integer fixed-point PageRank after
    ``n_iters`` rounds with damping 0.85. Deterministic: integer sums are
    associative, floor-division shares are exact, so any partitioning or
    engine produces identical ranks."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    init = TOTAL_MASS // n
    base = (TOTAL_MASS * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n)
    degrees = e.groupBy("src").agg(F.count("*").alias("deg"))

    ranks = nodes.withColumn("rank", F.lit(init).cast("long"))
    for _ in range(n_iters):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .join(degrees, "src")
            .select(
                F.col("dst").alias("node"),
                # share = (rank * 85) div (100 * outdeg): integral `div`
                # keeps the arithmetic exact — a float `/` would reintroduce
                # rounding nondeterminism (rank*85 ≤ 8.5e13 stays well
                # inside long range; all operands non-negative so div ==
                # floor division, matching the oracle's `//`)
                F.expr(
                    f"(rank * {DAMP_NUM}L) div ({DAMP_DEN}L * deg)"
                ).alias("share"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("share").alias("inflow"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce("inflow", F.lit(0))).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
