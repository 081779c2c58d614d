"""Similarity search over an embedding column (``array<float>``).

Two tiers, per the scale brief:
- ``cosine_topk`` — exact brute-force baseline: block-nested self-join with
  the dot product computed JVM-side (``zip_with``/``aggregate``, no Python).
  Correct at any k; O(n²) — the verification baseline.
- ``lsh_topk`` — the scale path: deterministic sign-random-projection LSH
  buckets via an Arrow-batched numpy kernel; candidates only form inside a
  bucket, turning O(n²) into O(n·bucket). At 100 TB the same structure holds
  with the bucketer as a coarse IVF quantizer.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _norm_col(col: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    embeddings: DataFrame, k: int = 5, queries: DataFrame | None = None
) -> DataFrame:
    """Exact top-k cosine neighbors per vector.

    Returns (vec_id, neighbor_id, rank, cosine). ``queries`` defaults to the
    corpus itself (all-pairs kNN); self-matches are excluded.
    """
    base = embeddings.select(
        F.col("vec_id"), F.col("embedding"), _norm_col(F.col("embedding")).alias("norm")
    )
    qs = base if queries is None else queries.select(
        F.col("vec_id"), F.col("embedding"), _norm_col(F.col("embedding")).alias("norm")
    )
    q = qs.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    joined = q.crossJoin(base).where(F.col("q_id") != F.col("vec_id"))
    scored = joined.select(
        F.col("q_id").alias("vec_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("norm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank", "cosine")
        .orderBy("vec_id", "rank")
    )


_BUCKET_SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("bucket", StringType()),
])


def lsh_buckets(
    embeddings: DataFrame, n_planes: int = 8, seed: int = 42
) -> DataFrame:
    """Sign-random-projection bucket per vector (deterministic hyperplanes
    from ``seed``). Arrow-batched numpy: one matmul per batch."""

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.default_rng(seed)
        planes = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy())
            if planes is None or planes.shape[1] != mat.shape[1]:
                rng = np.random.default_rng(seed)  # re-seed per worker: deterministic
                planes = rng.standard_normal((n_planes, mat.shape[1]))
            signs = (mat @ planes.T) >= 0
            buckets = ["".join("1" if b else "0" for b in row) for row in signs]
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "bucket": buckets})

    return embeddings.select("vec_id", "embedding").mapInPandas(
        bucketize, schema=_BUCKET_SCHEMA
    )


def lsh_topk(embeddings: DataFrame, k: int = 5, n_planes: int = 6) -> DataFrame:
    """Approximate top-k: exact cosine ranking within LSH buckets."""
    buckets = lsh_buckets(embeddings, n_planes)
    e = embeddings.join(buckets, "vec_id").select(
        "vec_id", "bucket", "embedding", _norm_col(F.col("embedding")).alias("norm")
    )
    a = e.select(
        F.col("bucket"),
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    joined = a.join(e, "bucket").where(F.col("q_id") != F.col("vec_id"))
    scored = joined.select(
        F.col("q_id").alias("vec_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("norm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank", "cosine")
    )


# ------------------------------------------------------------------- IVF

def _to_matrix(series: pd.Series) -> np.ndarray:
    X = np.array(series.tolist(), dtype=np.float64)
    norms = np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return X / norms


def train_ivf_centroids(
    embeddings: DataFrame, n_cells: int = 16, n_iters: int = 3
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer (IVF training).

    Init = the ``n_cells`` lowest vec_ids (deterministic, no RNG — scripts
    must stay replayable); each Lloyd iteration is one distributed assign
    (Arrow kernel) + one JVM-side per-cell/per-dim mean; the (k × d)
    centroid matrix lives on the driver and ships to executors by closure —
    the standard IVF pattern (train small, apply at scale).
    """
    # materialize the (vec_id, embedding) projection once: each Lloyd
    # iteration otherwise re-scans the source twice (assign + member join)
    embeddings = embeddings.select("vec_id", "embedding").localCheckpoint()
    init = embeddings.orderBy("vec_id").limit(n_cells).select("embedding").collect()
    centroids = _to_matrix(pd.Series([r["embedding"] for r in init]))
    dim = centroids.shape[1]
    for _ in range(n_iters):
        assigned = assign_ivf_cells(embeddings, centroids, n_probe=1)
        members = assigned.join(embeddings, "vec_id")
        means = (
            members.select("cell", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = centroids.copy()
        by_cell: dict[int, np.ndarray] = {}
        for r in means:
            by_cell.setdefault(r["cell"], np.zeros(dim))[r["pos"]] = r["m"]
        for cell, vec in by_cell.items():
            nrm = np.linalg.norm(vec)
            if nrm > 1e-12:
                new[cell] = vec / nrm
        centroids = new
    return centroids


def assign_ivf_cells(
    embeddings: DataFrame, centroids: np.ndarray, n_probe: int = 1
) -> DataFrame:
    """(vec_id, cell) rows — nearest ``n_probe`` cells per vector by cosine.
    Arrow-batched matrix product; centroids broadcast via closure capture."""
    cn = np.ascontiguousarray(centroids)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            sims = _to_matrix(pdf["embedding"]) @ cn.T
            order = np.argsort(-sims, axis=1)[:, :n_probe]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_probe),
                    "cell": order.ravel().astype(np.int32),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        kern, "vec_id long, cell int"
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF: coarse-quantize to cells,
    probe ``n_probe`` cells per query, exact JVM-side re-rank inside the
    candidate set. O(n²) → O(n · n/k · n_probe); recall grows with n_probe
    (n_probe = n_cells degenerates to exact search).
    """
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_cells)
    base_cells = assign_ivf_cells(embeddings, centroids, n_probe=1)
    query_cells = assign_ivf_cells(embeddings, centroids, n_probe=n_probe)

    base = embeddings.select(
        F.col("vec_id"), F.col("embedding"), _norm_col(F.col("embedding")).alias("norm")
    )
    cand_base = base.join(base_cells, "vec_id").select(
        "cell", "vec_id", "embedding", "norm"
    )
    q = base.join(query_cells, "vec_id").select(
        "cell",
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    joined = q.join(cand_base, "cell").where(F.col("q_id") != F.col("vec_id"))
    scored = joined.select(
        F.col("q_id").alias("vec_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("norm")),
            6,
        ).alias("cosine"),
    ).dropDuplicates(["vec_id", "neighbor_id"])
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("vec_id", "rank")
    )
