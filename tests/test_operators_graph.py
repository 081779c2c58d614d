"""Fixed-point PageRank invariants (operators/graph.py)."""

import pytest


@pytest.fixture(scope="module")
def pr(spark):
    from json_ld_spark.operators.graph import pagerank_fixed_point

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "a"),  # 3-cycle
            ("d", "a"),                           # feeder into the cycle
            ("e", "e"),                           # self-loop: dropped
        ],
        "src string, dst string",
    )
    return {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(edges, n_iters=20).collect()
    }


def test_pagerank_structure(pr):
    # self-loop-only node vanishes with its degenerate edge
    assert set(pr) == {"a", "b", "c", "d"}
    # the cycle accumulates mass; the source-only feeder keeps base rank
    assert pr["d"] < min(pr["a"], pr["b"], pr["c"])
    # a receives from both c and d → highest
    assert pr["a"] == max(pr.values())
    # bounded: no rank exceeds total mass; all positive
    assert all(0 < v < 10**12 for v in pr.values())


def test_pagerank_deterministic_across_partitionings(spark):
    from json_ld_spark.operators.graph import pagerank_fixed_point

    chain = [(f"n{i}", f"n{(i * 7 + 1) % 40}") for i in range(40)]
    base = spark.createDataFrame(chain, "src string, dst string")
    r1 = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(base.repartition(1)).collect()
    }
    r8 = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(base.repartition(8, "dst")).collect()
    }
    assert r1 == r8  # integer arithmetic: partitioning-independent
