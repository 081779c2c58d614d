"""Training-data assembly operators: sampling, packing, clustering."""

import pytest
from pyspark.sql import functions as F

# NB: operator modules are imported lazily inside tests — dedup.py binds
# F.col() in default args at import time, which needs a live SparkContext
# (pytest collection runs before the session fixture).


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_sample_stratified_rates_and_determinism(spark, docs):
    from json_ld_spark.operators.training import sample_stratified

    rates = {"src0": 1.0, "src1": 0.0}
    out = sample_stratified(docs, rates, default_rate=0.5)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("src0") == totals["src0"]  # rate 1.0 keeps all
    assert "src1" not in by_src                  # rate 0.0 keeps none
    # default-rate sources land strictly between the extremes
    others = sum(v for k, v in by_src.items() if k not in rates)
    others_total = sum(v for k, v in totals.items() if k not in rates)
    assert 0 < others < others_total
    # deterministic: re-run identical
    again = sample_stratified(docs, rates, default_rate=0.5)
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in again.select("doc_id").collect()
    )
    # a different salt draws a different (but same-law) sample
    other_salt = sample_stratified(docs, rates, default_rate=0.5, salt="v2")
    assert sorted(r["doc_id"] for r in other_salt.select("doc_id").collect()) != sorted(
        r["doc_id"] for r in out.select("doc_id").collect()
    )


def test_pack_chunks_stream_invariants(spark, docs):
    from json_ld_spark.operators.training import pack_chunks

    budget = 128
    out = pack_chunks(docs, budget=budget, n_groups=4).collect()
    assert out
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r["pack_group"], []).append(r)
    for rows in by_group.values():
        rows.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in rows:
            # contiguous token stream: no gaps, no overlaps
            assert r["tok_offset"] == offset
            offset += r["n_tokens"]
            # chunk span arithmetic
            assert r["first_chunk"] == r["tok_offset"] // budget
            assert r["last_chunk"] == (r["tok_offset"] + r["n_tokens"] - 1) // budget
            assert r["first_chunk"] <= r["last_chunk"]
    # every group's stream is fully covered: total chunks ≈ total tokens
    for rows in by_group.values():
        total = sum(r["n_tokens"] for r in rows)
        assert rows[-1]["tok_offset"] + rows[-1]["n_tokens"] == total


def test_neardup_clusters_rejects_negative_ids(spark):
    """Regression: zero-padded lexicographic ordering misorders negative
    ids — the in-plan guard must refuse any negative id that reaches the
    pair graph, not mis-canonicalize silently (the guard is lazy: zero
    extra scans; it fires during the clustering job itself)."""
    import pytest

    from json_ld_spark.operators.training import neardup_clusters

    bad = spark.createDataFrame(
        [(-1, "same text here twice over"), (2, "same text here twice over")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="non-negative"):
        neardup_clusters(bad).collect()


def test_neardup_clusters_consistency(spark, docs):
    from json_ld_spark.operators.dedup import minhash_lsh_pairs
    from json_ld_spark.operators.training import neardup_clusters

    clusters = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in neardup_clusters(docs).collect()
    }
    assert len(clusters) == docs.count()  # every doc assigned
    # every candidate pair ends up in the same cluster
    pairs = minhash_lsh_pairs(docs).collect()
    assert pairs, "fixture should contain near-duplicates"
    for p in pairs:
        assert clusters[p["doc_a"]][0] == clusters[p["doc_b"]][0]
    # canonical = numeric min of the cluster; exactly one keep per cluster
    members: dict = {}
    for doc, (cid, keep) in clusters.items():
        members.setdefault(cid, []).append((doc, keep))
    for cid, docs_in in members.items():
        assert cid == min(d for d, _ in docs_in)
        assert [d for d, k in docs_in if k] == [cid]


def test_simhash_pairs_exact_vs_bruteforce(spark, sf_dir):
    """Pigeonhole contract: band blocking at 48 bits / 4 bands finds EVERY
    pair with hamming <= 3 on this corpus (recall 1.0 vs brute force), and
    every emitted hamming is the exact bit_count of the fingerprint xor."""
    import itertools

    from json_ld_spark.operators.dedup import simhash, simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        tuple(r) for r in simhash_pairs(docs).collect()
    )
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=48).collect()}
    truth = sorted(
        (a, b, bin(sh[a] ^ sh[b]).count("1"))
        for a, b in itertools.combinations(sorted(sh), 2)
        if bin(sh[a] ^ sh[b]).count("1") <= 3
    )
    assert truth, "fixture should contain near-dup fingerprints"
    assert got == truth


def test_curate_reject_precedence_and_coverage(spark):
    """Curation verdict (round 5): deterministic first-match precedence
    (contaminated beats every other reason), every doc gets exactly one
    verdict, and threshold edges behave."""
    from pyspark.sql import functions as F

    from json_ld_spark.operators.training import curate

    rows = [
        # 20 tokens, english, unique grams, shares grams with eval -> contaminated
        (1, "the quick brown fox jumps over the lazy dog and then runs far away from home very fast indeed"),
        # eval member (same text)
        (2, "the quick brown fox jumps over the lazy dog and then runs far away from home very fast indeed"),
        # short AND non-english-looking: too_short wins (precedence)
        (3, "uno dos tres"),
        # english, long enough, hugely repetitive -> too_repetitive
        (4, " ".join(["the cat sat"] * 12)),
        # english, long enough, varied -> keep
        (5, "the archive holds records of seventeen expeditions that crossed "
            "this range with supplies enough for winters in deep snow"),
        # german stopwords -> non_english
        (6, "der hund und die katze das ist nicht ein mit haus garten baum "
            "fluss berg tal wiese wald stein"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in curate(
            docs, docs.where(F.col("doc_id") == 2), min_tokens=10
        ).collect()
    }
    assert len(out) == 6
    assert out[1].reject_reason == "contaminated"
    assert out[2].reject_reason == "contaminated"  # eval doc matches itself
    assert out[3].reject_reason == "too_short"     # beats non_english
    assert out[4].reject_reason == "too_repetitive"
    assert out[5].keep and out[5].reject_reason is None
    assert out[6].reject_reason == "non_english"


def _kmeans_fixture(spark, n=48, dim=6):
    """Deterministic small embedding set with 3 obvious blobs."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = np.array(
        [[1.0] * dim, [-1.0] * dim, [1.0, -1.0] * (dim // 2)]
    )
    x = np.concatenate(
        [c + 0.05 * rng.randn(n // 3, dim) for c in centers]
    ).astype(np.float32)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, x


def _kmeans_numpy(x, k, iters, scale=1 << 20):
    """Inline mirror of the integer fixed-point spec (independent of both
    the operator and tools/make_golden)."""
    import numpy as np

    xq = np.floor(x.astype(np.float64) * scale + 0.5).astype(np.int64)
    c = xq[:k].copy()

    def assign(c):
        d = ((xq[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        j = d.argmin(axis=1)
        return j, d[np.arange(len(xq)), j]

    for _ in range(iters):
        j, _ = assign(c)
        for i in range(k):
            m = xq[j == i]
            if len(m):
                c[i] = m.sum(axis=0) // len(m)
    return assign(c)


def test_kmeans_matches_integer_lloyd_spec(spark):
    from json_ld_spark.operators.training import kmeans_clusters

    df, x = _kmeans_fixture(spark)
    got = kmeans_clusters(df, k=3, iters=3).collect()
    j, d2 = _kmeans_numpy(x, k=3, iters=3)
    assert [(r.vec_id, r.cluster, r.dist2) for r in got] == [
        (i, int(j[i]), int(d2[i])) for i in range(len(x))
    ]
    # the blobs are separated enough that Lloyd's must recover them
    assert len({r.cluster for r in got}) == 3


def test_kmeans_partitioning_invariant(spark):
    """Integer arithmetic makes the result bit-identical under any
    partitioning — the property float k-means cannot give."""
    from json_ld_spark.operators.training import kmeans_clusters

    df, _ = _kmeans_fixture(spark)
    a = kmeans_clusters(df.coalesce(1), k=3, iters=2).collect()
    b = kmeans_clusters(df.repartition(16), k=3, iters=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_kmeans_requires_k_vectors(spark):
    import pytest

    from json_ld_spark.operators.training import kmeans_clusters

    df, _ = _kmeans_fixture(spark, n=6)
    with pytest.raises(ValueError, match="need >= 8"):
        kmeans_clusters(df, k=8)


def test_assign_dense_ids_is_permutation(spark):
    from json_ld_spark.operators.training import assign_dense_ids

    vals = spark.createDataFrame(
        [(f"e{i}",) for i in range(100)], "entity string"
    )
    rows = assign_dense_ids(vals, "entity", n_buckets=8).collect()
    assert sorted(r.id for r in rows) == list(range(100))
    # deterministic across partitionings
    again = assign_dense_ids(
        vals.repartition(7), "entity", n_buckets=8
    ).collect()
    assert {(r.value, r.id) for r in rows} == {(r.value, r.id) for r in again}


def test_negative_samples_contract(spark):
    from json_ld_spark.operators.training import negative_samples

    triples = spark.createDataFrame(
        [
            ("http://a", "knows", "iri", "http://b"),
            ("http://b", "knows", "iri", "http://c"),
            ("http://a", "name", "literal", "Alice"),  # excluded: literal
            ("http://a", "knows", "iri", "http://b"),  # dup positive
        ],
        "subj string, pred string, obj_kind string, obj_value string",
    )
    out = negative_samples(triples, n_neg=3).collect()
    # 2 distinct positives x 3 draws
    assert len(out) == 6
    pool = {"http://a", "http://b", "http://c"}
    for r in out:
        assert r.neg_dst in pool
        assert r.collides == (r.neg_dst == r.dst)
    # replayable: same input -> same draws
    again = negative_samples(triples, n_neg=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_neg"):
        negative_samples(triples, n_neg=0)
    only_lit = triples.where("obj_kind = 'literal'")
    with _pytest.raises(ValueError, match="no IRI entities"):
        negative_samples(only_lit, n_neg=1)
