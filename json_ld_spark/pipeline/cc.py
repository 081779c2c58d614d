"""Connected components over an edge list — large-star / small-star.

Implements the alternating large-star/small-star algorithm of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC'14) —
the same scheme GraphFrames uses — as pure DataFrame joins/aggregations so
Catalyst/AQE handle skew and physical strategy (SURVEY.md §2 J2).

The algorithm runs directly on *string* node ids: Spark's ``min`` on strings
is lexicographic, so the component label is deterministically the
lexicographically-smallest member (the W2 canonical tie-break of SURVEY.md
§2) without a global id-assignment step — a driver-side ``row_number`` over
all nodes would be a single-partition bottleneck at 10^12 scale.

Scale notes:
- Each iteration is join + groupBy().min(); lineage is cut with
  ``localCheckpoint`` every iteration so Catalyst's plan doesn't grow
  unboundedly and AQE re-plans each round (SURVEY.md §4.2).
- Convergence in O(log^2 n) rounds; hub-heavy graphs converge faster since
  stars centralize mass onto min-ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect strictly-larger neighbors to min(N(u) ∪ u)."""
    nbr = _symmetrize(edges)
    with_min = nbr.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        nbr.join(with_min, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect smaller-or-equal neighbors to min(N≤(u) ∪ u)."""
    nbr = _symmetrize(edges).where(F.col("dst") < F.col("src"))
    with_min = nbr.groupBy("src").agg(F.min("dst").alias("m"))
    return (
        nbr.join(with_min, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(with_min.select("src", F.col("m").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Return (id: string, component: string); ``component`` is the
    lexicographically-smallest member of the node's component.

    ``edges`` is treated as undirected; self-loops are dropped.
    """
    ids = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint()
    )
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    def _fingerprint(df: DataFrame):
        """(count, xor-of-row-hashes) — one cheap aggregate job."""
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    fp = _fingerprint(e)
    for _ in range(max_iterations):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        fp2 = _fingerprint(e2)
        # cheap O(1)-row gate every iteration; the exact symmetric-difference
        # check runs only when the fingerprints agree (i.e. once, at
        # convergence) instead of 2 full exceptAll jobs per iteration
        if fp2 == fp and e2.exceptAll(e).isEmpty() and e.exceptAll(e2).isEmpty():
            e = e2
            break
        e, fp = e2, fp2
    # at convergence the graph is a union of stars rooted at component minima
    membership = (
        _symmetrize(e)
        .groupBy("src")
        .agg(F.min("dst").alias("root"))
        .select(F.col("src").alias("id"), F.least("src", "root").alias("component"))
    )
    return (
        ids.join(membership, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
    )
