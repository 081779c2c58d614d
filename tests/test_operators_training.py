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
