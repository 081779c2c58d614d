"""IVF approximate-nearest-neighbor tests: determinism + recall vs the
exact brute-force baseline."""

import pytest
from pyspark.sql import functions as F

from json_ld_spark.operators.similarity import (
    assign_ivf_cells,
    cosine_topk,
    ivf_topk,
    train_ivf_centroids,
)


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_centroids_deterministic_and_normalized(embeddings):
    import numpy as np

    c1 = train_ivf_centroids(embeddings, n_cells=8, n_iters=2)
    c2 = train_ivf_centroids(embeddings, n_cells=8, n_iters=2)
    assert np.allclose(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)


def test_assignment_covers_all_vectors(embeddings):
    cents = train_ivf_centroids(embeddings, n_cells=8, n_iters=1)
    cells = assign_ivf_cells(embeddings, cents, n_probe=1)
    assert cells.count() == embeddings.count()
    assert cells.select("vec_id").distinct().count() == embeddings.count()
    n_used = cells.select("cell").distinct().count()
    assert n_used > 1  # quantizer actually partitions the space


def test_ivf_recall_vs_exact(embeddings):
    k = 5
    exact = cosine_topk(embeddings, k=k).select("vec_id", "neighbor_id")
    approx = ivf_topk(embeddings, k=k, n_cells=8, n_probe=6).select(
        "vec_id", "neighbor_id"
    )
    n_exact = exact.count()
    hits = exact.intersect(approx).count()
    recall = hits / n_exact
    # 10 label clusters over 8 cells: clusters straddle cell boundaries, so
    # recall needs n_probe > n_cells/2. Measured (deterministic): probe 2 →
    # 0.50, 4 → 0.76, 6 → 0.92, 8 (=exact) → 1.00.
    assert recall >= 0.9, f"recall {recall:.3f}"


def test_lsh_multi_table_improves_recall(embeddings):
    """OR-amplification contract: recall@k grows with the number of hash
    tables (1 - (1-p)^T), and every returned neighbor's cosine is exact.
    The absolute recall is fixture-limited (weak-cosine neighbors are
    LSH-hostile; the data-adaptive IVF reaches ≥0.9 on the same data) —
    the ORDERING is the invariant worth pinning."""
    from json_ld_spark.operators.similarity import lsh_topk

    k = 5
    exact = set(
        map(tuple, cosine_topk(embeddings, k=k).select("vec_id", "neighbor_id").collect())
    )

    def recall(n_tables):
        approx = set(
            map(
                tuple,
                lsh_topk(embeddings, k=k, n_planes=4, n_tables=n_tables)
                .select("vec_id", "neighbor_id")
                .collect(),
            )
        )
        return len(exact & approx) / len(exact)

    r1, r4 = recall(1), recall(4)
    assert r4 > r1, (r1, r4)
    assert r4 >= 2 * r1, (r1, r4)  # amplification, not noise


def test_embedding_neardup_lsh_precision_and_recall(embeddings):
    """LSH-blocked near-dup pairs: every returned pair is a TRUE pair
    (cosine ≥ threshold — exact scoring inside blocks guarantees
    precision 1.0), and recall vs the brute-force ground truth meets the
    analytic OR-amplification bound's ballpark."""
    import numpy as np

    from json_ld_spark.operators.dedup import embedding_neardup_pairs_lsh

    threshold, n_planes, n_tables = 0.35, 3, 6
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_neardup_pairs_lsh(
            embeddings, threshold, n_planes, n_tables
        ).collect()
    }
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    nrm = np.maximum(np.linalg.norm(M, axis=1), 1e-12)
    S = np.round((M @ M.T) / np.outer(nrm, nrm), 6)
    ii, jj = np.where(np.triu(S >= threshold, k=1))
    truth = {
        tuple(sorted((int(ids[i]), int(ids[j])))): S[i, j]
        for i, j in zip(ii, jj)
    }
    assert truth, "fixture should contain pairs at this threshold"
    # precision 1.0: every found pair is true with the exact cosine
    for pair, cos in got.items():
        assert pair in truth and abs(truth[pair] - cos) < 1e-9, pair
    recall = len(got) / len(truth)
    assert recall >= 0.5, recall


def test_ivf_full_probe_is_exact(embeddings):
    k = 3
    sub = embeddings.where(F.col("vec_id") < 80)
    exact = cosine_topk(sub, k=k).select("vec_id", "neighbor_id", "rank")
    approx = ivf_topk(sub, k=k, n_cells=4, n_probe=4).select(
        "vec_id", "neighbor_id", "rank"
    )
    assert exact.exceptAll(approx).count() == 0
    assert approx.exceptAll(exact).count() == 0


def test_lsh_multiprobe_trained_recall(embeddings):
    """The round-2 recall demand: data-adaptive planes + multi-probe must
    lift recall@5 to ≥ 0.5 on this (LSH-hostile, weak-cosine) fixture —
    measured 0.182 plain 4-table → 0.519 multiprobe → 0.550 trained+probe.
    Every returned neighbor's cosine stays exact (in-bucket scoring)."""
    from json_ld_spark.operators.similarity import lsh_topk

    k = 5
    exact = set(
        map(
            tuple,
            cosine_topk(embeddings, k=k).select("vec_id", "neighbor_id").collect(),
        )
    )
    approx = set(
        map(
            tuple,
            lsh_topk(
                embeddings, k=k, n_planes=6, n_tables=4,
                trained=True, n_probe_bits=3,
            )
            .select("vec_id", "neighbor_id")
            .collect(),
        )
    )
    assert len(exact & approx) / len(exact) >= 0.5
