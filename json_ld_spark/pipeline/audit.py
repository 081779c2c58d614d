"""Data-quality audits for the materialized KG — the checks a production
pipeline runs after every snapshot commit, BEFORE downstream consumers
read the tables.

``kg_integrity`` — one-row referential-integrity report over the
node/edge tables: dangling edge endpoints (an edge referencing a
canon_id absent from the node table is a canonicalization or
partial-write bug), orphan nodes (no edge touches them — expected in
small numbers, a spike means the edge writer dropped a partition),
self-loops, duplicate node ids, and null key fields. Every metric is an
anti-join or filter count — Catalyst plans them as broadcast/shuffled
hash anti-joins over the persisted tables, and the final assembly is a
cross join of eight single-row aggregates (one row each, so the cross
join is free). At 10^12 edges this is a handful of bounded shuffles,
run against persisted tables, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kg_integrity(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """One-row integrity report; all columns BIGINT.

    Columns: n_nodes, n_edges, dup_node_ids, dangling_src, dangling_dst,
    orphan_nodes, self_loops, null_keys.
    """
    # eight audit branches each reference nodes/edges — localCheckpoint so
    # an unpersisted input lineage (e.g. a fresh canonicalize()) executes
    # once, not eight times (measured 37 exchanges -> 15 on the driver
    # query). On already-persisted production tables this is a no-op-cheap
    # re-materialization of two pruned scans.
    nodes = nodes.localCheckpoint()
    edges = edges.localCheckpoint()
    ids = nodes.select(F.col("canon_id").alias("node"))

    def scalar(df: DataFrame, name: str) -> DataFrame:
        # one (metric, value) row per audit branch; the final report
        # UNIONS these and pivots with one conditional aggregate — no
        # join of single-row frames at all (a crossJoin, or an equi-join
        # on a constant key after Catalyst folds it, plans as
        # BroadcastNestedLoopJoin, banned repo-wide)
        return df.agg(F.count("*").cast("long").alias("value")).select(
            F.lit(name).alias("metric"), "value"
        )

    dup_ids = (
        nodes.groupBy("canon_id")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
    )
    dangling_src = edges.join(
        ids.withColumnRenamed("node", "src_canon"), "src_canon", "left_anti"
    )
    dangling_dst = edges.join(
        ids.withColumnRenamed("node", "dst_canon"), "dst_canon", "left_anti"
    )
    touched = (
        edges.select(F.col("src_canon").alias("node"))
        .union(edges.select(F.col("dst_canon").alias("node")))
        .distinct()
    )
    orphans = ids.join(touched, "node", "left_anti")
    self_loops = edges.where(F.col("src_canon") == F.col("dst_canon"))
    null_keys = edges.where(
        F.col("src_canon").isNull()
        | F.col("pred").isNull()
        | F.col("dst_canon").isNull()
    )

    metrics = [
        scalar(nodes, "n_nodes"),
        scalar(edges, "n_edges"),
        scalar(dup_ids, "dup_node_ids"),
        scalar(dangling_src, "dangling_src"),
        scalar(dangling_dst, "dangling_dst"),
        scalar(orphans, "orphan_nodes"),
        scalar(self_loops, "self_loops"),
        scalar(null_keys, "null_keys"),
    ]
    rows = metrics[0]
    for m in metrics[1:]:
        rows = rows.union(m)
    return rows.groupBy().agg(
        *[
            F.max(F.when(F.col("metric") == name, F.col("value"))).alias(name)
            for name in (
                "n_nodes", "n_edges", "dup_node_ids", "dangling_src",
                "dangling_dst", "orphan_nodes", "self_loops", "null_keys",
            )
        ]
    )
