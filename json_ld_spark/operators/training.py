"""Training-data assembly operators: stratified sampling, sequence packing,
near-duplicate clustering.

These complete the LLM-pipeline suite (dedup.py / similarity.py /
textstats.py / multimodal.py) with the three steps that turn a cleaned
corpus into a training mix:

- ``sample_stratified`` — per-source keep rates via a deterministic
  md5-derived uniform (no RNG: replayable, and bit-identical in the DuckDB
  oracle). One map-side filter, no shuffle, pushdown-friendly.
- ``pack_chunks`` — concatenate-then-chunk sequence packing (the standard
  pretraining layout): documents are streamed in deterministic order
  within hash groups and the token stream is cut into fixed-size chunks;
  each document's chunk span is pure window arithmetic — no UDF, fully
  SQL-expressible, embarrassingly parallel across groups.
- ``neardup_clusters`` — MinHash-LSH candidate pairs (dedup.py) promoted
  to transitive clusters via the same large/small-star connected
  components the KG entity layer uses (pipeline/cc.py); each cluster
  keeps its minimum doc_id as canonical. The DuckDB oracle recomputes the
  closure with a recursive CTE — an independent algorithm, so agreement
  cross-checks the distributed CC itself.

Scale notes: sampling/packing are shuffle-minimal (packing shuffles once
by pack_group — at 10^9 docs pick n_groups ≈ cluster parallelism so groups
stay executor-sized); clustering inherits the capped-bucket guarantees of
minhash_lsh_pairs plus CC's O(log²) rounds with per-iteration checkpoints.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import minhash_lsh_pairs


def _uniform01(col: F.Column, salt: str) -> F.Column:
    """Deterministic uniform in [0, 1): first 8 hex chars of
    md5(value#salt) over 2^32 — identical in Spark and DuckDB."""
    h = F.md5(F.concat(col.cast("string"), F.lit(f"#{salt}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )


def sample_stratified(
    docs: DataFrame,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep each document with its source's rate (deterministic).

    ``rates`` maps source → keep probability; unseen sources use
    ``default_rate``. The decision is a pure function of (doc_id, salt),
    so re-runs and the oracle agree bit-for-bit, and changing one source's
    rate never perturbs another source's sample (per-doc independence).
    """
    rate = None
    for src, r in sorted(rates.items()):
        cond = F.col("source") == src
        rate = F.when(cond, F.lit(float(r))) if rate is None else rate.when(
            cond, F.lit(float(r))
        )
    rate = (
        rate.otherwise(F.lit(float(default_rate)))
        if rate is not None
        else F.lit(float(default_rate))
    )
    return docs.where(_uniform01(F.col("doc_id"), salt) < rate)


def pack_chunks(
    docs: DataFrame,
    budget: int = 512,
    n_groups: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Concatenate-then-chunk packing plan.

    Documents hash into ``n_groups`` independent streams; within a stream
    they are ordered by doc_id and their token counts laid end-to-end; the
    stream is cut every ``budget`` tokens. Returns one row per document:

        (doc_id, pack_group, tok_offset, n_tokens, first_chunk, last_chunk)

    ``first_chunk``/``last_chunk`` are the chunk ids the document's tokens
    land in (a document may straddle chunks — the standard pretraining
    packing). Zero-token documents are dropped. Pure window arithmetic:
    one shuffle by pack_group, no UDF, exact SQL oracle.
    """
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    with_counts = docs.select(
        "doc_id",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"#{salt}"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long"),
            F.lit(n_groups),
        ).alias("pack_group"),
        F.size(toks).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        with_counts.withColumn(
            "tok_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .select(
            "doc_id",
            "pack_group",
            "tok_offset",
            "n_tokens",
            F.floor(F.col("tok_offset") / budget).alias("first_chunk"),
            F.floor(
                (F.col("tok_offset") + F.col("n_tokens") - 1) / budget
            ).alias("last_chunk"),
        )
        .orderBy("pack_group", "doc_id")
    )


def neardup_clusters(
    docs: DataFrame,
    n_hashes: int = 16,
    n_bands: int = 4,
    max_bucket: int = 64,
) -> DataFrame:
    """Transitive near-duplicate clusters from MinHash-LSH candidate pairs.

    Returns (doc_id, cluster_id, keep): ``cluster_id`` is the minimum
    doc_id of the document's connected component in the candidate-pair
    graph (singletons are their own cluster), ``keep`` marks the canonical
    representative — the row a dedup pipeline retains.

    CC runs on zero-padded string ids so pipeline/cc.py's lexicographic
    min IS the numeric min — 19 digits covers the full non-negative int64
    range, and non-negativity is checked upfront (for a negative id the
    '-' prefix would invert the lexicographic order and elect the wrong
    canonical doc silently). The oracle recomputes the closure with a
    DuckDB recursive CTE (independent algorithm — label propagation vs
    large/small-star), so a green row cross-checks the distributed CC.
    """
    from ..pipeline.cc import connected_components

    pairs = minhash_lsh_pairs(docs, n_hashes, n_bands, max_bucket)

    # in-plan guard (zero extra scans — an upfront where().count() would
    # pay a full table pass per call): only ids that reach PAIRS can break
    # the lexicographic ordering; negative singletons are harmless
    # (cluster_id = own id regardless of sign)
    def _padded(col: str) -> F.Column:
        return F.when(
            F.col(col) < 0,
            F.raise_error(
                F.lit(
                    "neardup_clusters requires non-negative doc_ids "
                    "(zero-padded lexicographic ordering would misorder "
                    "negatives)"
                )
            ),
        ).otherwise(F.format_string("%019d", F.col(col)))

    edges = pairs.select(
        _padded("doc_a").alias("src"), _padded("doc_b").alias("dst")
    )
    comp = connected_components(edges).select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
    )
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
        .orderBy("doc_id")
    )


def curate(
    docs: DataFrame,
    eval_docs: DataFrame,
    min_tokens: int = 16,
    max_dup_frac: float = 0.10,
    langs: tuple = ("en",),
    ngram: int = 8,
) -> DataFrame:
    """End-to-end curation verdict — the composition a training pipeline
    actually runs before sampling: per document one keep/drop decision
    with a deterministic first-match reject reason:

    1. ``contaminated`` — shares an ``ngram``-gram with the eval set
       (decontaminate: eval grams broadcast, corpus never shuffles text);
    2. ``too_short`` — fewer than ``min_tokens`` tokens;
    3. ``non_english`` — stopword-vote language not in ``langs``;
    4. ``too_repetitive`` — duplicate n-gram fraction above
       ``max_dup_frac`` (zero-shuffle fold);
    else ``keep``.

    Plan shape: every signal is a map-only projection or one bounded
    aggregation keyed on doc_id, and the final assembly is equi-joins on
    doc_id — co-partitioned after the first shuffle, AQE coalesced. No
    signal ever shuffles document text."""
    from .textstats import (
        decontaminate,
        lang_id,
        repetition_stats,
        token_count,
    )

    tc = token_count(docs).select("doc_id", "n_tokens")
    li = lang_id(docs)
    rep = repetition_stats(docs).select("doc_id", "dup_gram_frac")
    dec = decontaminate(docs, eval_docs, n=ngram).select(
        "doc_id", "contaminated"
    )
    j = tc.join(li, "doc_id").join(rep, "doc_id").join(dec, "doc_id")
    reason = (
        F.when(F.col("contaminated"), F.lit("contaminated"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(~F.col("lang_guess").isin(*langs), F.lit("non_english"))
        .when(F.col("dup_gram_frac") > max_dup_frac, F.lit("too_repetitive"))
    )
    return j.select(
        "doc_id",
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"),
    ).orderBy("doc_id")


def kmeans_clusters(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 4,
    scale: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic k-means topic clustering over an embedding column —
    Lloyd's algorithm in integer fixed-point, the same bit-exactness trick
    as operators/graph.pagerank_fixed_point.

    Floating-point k-means is order-nondeterministic (the centroid mean
    depends on partition reduce order), which breaks replayable curation
    runs and makes an independent oracle impossible.  Instead every vector
    quantizes once to int64 (``floor(v * scale + 0.5)`` — exact in binary
    FP for power-of-two scales, identical in numpy), centroid updates are
    exact integer sums + floor division (associative/commutative, so ANY
    shuffle order yields the same centroid), and the assignment argmin
    tie-breaks on cluster index.  Result: bit-identical output on 1 core
    or 1000, verifiable against a plain-numpy mirror.

    Plan shape per iteration: one map-side projection computing k integer
    distances JVM-side (``aggregate`` over ``zip_with`` — no Python), one
    posexplode + groupBy(cluster, pos) partial-agg shuffle of k*dim*2
    longs per partition, and a k*dim-row collect to rebuild the centroid
    literals (bounded: 8*64 longs).  The quantized input localCheckpoints
    once so ``iters`` passes re-scan memory, not the source.  Empty
    clusters keep their previous centroid.  Init: the k lexicographically
    smallest ``id_col`` rows (deterministic, broadcast-sized).

    Output: (vec_id, cluster INT, dist2 BIGINT) ordered by id.
    """
    q = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda v: F.floor(v.cast("double") * scale + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("xq"),
    ).localCheckpoint()

    init = q.orderBy("vec_id").limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need >= {k} vectors, got {len(init)}")
    centroids = [list(r.xq) for r in init]

    def assign(df: DataFrame) -> DataFrame:
        dists = [
            F.aggregate(
                F.zip_with(
                    F.col("xq"),
                    F.array(*[F.lit(int(c)) for c in centroids[j]]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            for j in range(k)
        ]
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        dists[j].alias("d"), F.lit(j).cast("int").alias("j")
                    )
                    for j in range(k)
                ]
            )
        )
        return df.withColumn("best", best)

    dim = len(centroids[0])
    for _ in range(iters):
        sums = (
            assign(q)
            .select(F.col("best.j").alias("cluster"), F.posexplode("xq"))
            .groupBy("cluster", "pos")
            .agg(
                F.sum("col").alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        by_cluster = {}
        for r in sums:
            by_cluster.setdefault(r.cluster, [None] * dim)[r.pos] = (r.s, r.n)
        for j in range(k):
            comps = by_cluster.get(j)
            if comps is None:
                continue  # empty cluster keeps its previous centroid
            centroids[j] = [s // n for (s, n) in comps]

    out = assign(q).select(
        "vec_id",
        F.col("best.j").alias("cluster"),
        F.col("best.d").alias("dist2"),
    )
    return out.orderBy("vec_id")


def assign_dense_ids(
    values: DataFrame,
    col: str,
    n_buckets: int = 64,
    salt: str = "bucket",
) -> DataFrame:
    """Contiguous deterministic ids ``0..n-1`` for a distinct value set,
    WITHOUT a single-partition global sort (the classic row_number-over-
    everything scale killer): values hash into ``n_buckets`` buckets,
    each bucket sorts independently (parallel window), and bucket ids
    offset by a running sum over the tiny per-bucket count table.  The
    id is a pure function of (value set, n_buckets, salt) — any engine
    reproduces it — and per-bucket skew is hash-uniform by construction.

    Returns (value, id).  Used by negative sampling below; also the
    building block for embedding-table row assignment.
    """
    vals = values.select(F.col(col).alias("value")).distinct()
    bucketed = vals.withColumn(
        "bucket",
        F.conv(
            F.substring(F.md5(F.concat(F.col("value"), F.lit(f"#{salt}"))), 1, 8),
            16,
            10,
        ).cast("long")
        % n_buckets,
    )
    w = Window.partitionBy("bucket").orderBy("value")
    ranked = bucketed.withColumn(
        "rn", F.row_number().over(w).cast("long") - 1
    )
    counts = ranked.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.withColumn(
        "offset",
        F.coalesce(
            F.sum("n").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).cast("long"),
    ).select("bucket", "offset")
    # offsets is n_buckets rows — broadcast-sized by construction
    return ranked.join(F.broadcast(offsets), "bucket").select(
        "value", (F.col("offset") + F.col("rn")).alias("id")
    )


def negative_samples(
    triples: DataFrame,
    n_neg: int = 2,
    n_buckets: int = 64,
    salt: str = "neg",
) -> DataFrame:
    """Corrupted-tail negatives for KG-embedding training (TransE/DistMult
    style): for every distinct (src, pred, dst) positive with an IRI
    object, emit ``n_neg`` rows replacing the tail with a pseudo-random
    entity drawn from the node pool — deterministically, so the training
    set is replayable and the oracle bit-exact.

    The draw is ``md5(src|pred|dst|rank#salt) mod n_entities`` (the
    repo's cross-engine uniform-hash convention), joined back to the
    dense-id entity table from :func:`assign_dense_ids` — an equi-join
    on a hash-uniform integer key, so no skew is possible regardless of
    graph shape.  A draw may collide with the true tail (standard in
    this literature); it is emitted with ``collides=true`` so the
    training loop can filter or re-weight rather than silently losing
    the positive's negative budget.

    Scale: one distinct over positives, the id assignment's parallel
    per-bucket sort, a posexplode fan-out of exactly ``n_neg``, and one
    integer equi-join.  Nothing driver-side, nothing quadratic.
    """
    if n_neg < 1:
        raise ValueError("n_neg must be >= 1")
    pos = (
        triples.where(F.col("obj_kind") == F.lit("iri"))
        .select(
            F.col("subj").alias("src"),
            F.col("pred").alias("pred"),
            F.col("obj_value").alias("dst"),
        )
        .distinct()
    )
    pool = (
        pos.select(F.col("src").alias("entity"))
        .union(pos.select(F.col("dst").alias("entity")))
        .distinct()
    )
    ids = assign_dense_ids(pool, "entity", n_buckets=n_buckets).localCheckpoint()
    n_entities = ids.count()
    if n_entities == 0:
        raise ValueError("no IRI entities to sample from")

    fanned = pos.select(
        "src",
        "pred",
        "dst",
        F.posexplode(F.array(*[F.lit(i) for i in range(n_neg)])).alias(
            "neg_rank", "_i"
        ),
    ).drop("_i")
    drawn = fanned.withColumn(
        "neg_id",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("src"),
                        F.col("pred"),
                        F.col("dst"),
                        F.col("neg_rank").cast("string"),
                        F.lit(f"#{salt}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % n_entities,
    )
    return drawn.join(
        ids.select(F.col("id").alias("neg_id"), F.col("value").alias("neg_dst")),
        "neg_id",
    ).select(
        "src",
        "pred",
        "dst",
        F.col("neg_rank").cast("long").alias("neg_rank"),
        "neg_dst",
        (F.col("neg_dst") == F.col("dst")).alias("collides"),
    )
