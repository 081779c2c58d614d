"""BM25 keyword scoring (operators/search.py)."""

import re

import pytest

S = 1_000_000
K1_S = 1_200_000
B_S = 750_000


def _mirror_scores(texts, terms, k):
    """Plain-Python mirror of the scaled-integer BM25 formula (same op
    sequence, pure ints), independent of any Spark machinery."""
    toks = [re.findall("[a-z0-9]+", t.lower()) for t in texts]
    dls = [len(t) for t in toks]
    n = len(texts)
    avgdl_s = (sum(dls) * S) // n
    dfs = {t: sum(1 for d in toks if t in d) for t in terms}
    out = []
    for doc_id, d in enumerate(toks):
        dl = dls[doc_id]
        score = 0
        n_terms = 0
        for t in terms:
            tf = sum(1 for x in d if x == t)
            if tf == 0 or dfs[t] == 0:
                continue
            n_terms += 1
            idf_s = (n * S) // dfs[t]
            norm = (S - B_S) + ((B_S * dl * S) // avgdl_s)
            denom = tf * S + ((K1_S * norm) // S)
            score += (((tf * S * S) // denom) * idf_s) // S
        if score > 0:
            out.append((doc_id, score, n_terms))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_matches_integer_mirror(spark):
    from json_ld_spark.operators.search import bm25_topk

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "quick quick quick fox",
        "a very long document " + "filler word soup " * 20 + "fox",
        "nothing relevant here at all",
        "dog dog dog dog",
        "fox dog fox dog fox",
    ]
    terms = ["fox", "dog"]
    got = [
        (r.doc_id, r.score_s, r.n_terms)
        for r in bm25_topk(_docs(spark, texts), terms, k=10).collect()
    ]
    assert got == _mirror_scores(texts, terms, 10)


def test_ranking_properties(spark):
    from json_ld_spark.operators.search import bm25_topk

    texts = [
        "fox",  # short doc, one hit -> strong
        "fox " + "x " * 50,  # same tf, much longer -> weaker (length norm)
        "y " * 10,  # no hit -> absent
    ]
    rows = bm25_topk(_docs(spark, texts), ["fox"], k=10).collect()
    assert [r.doc_id for r in rows] == [0, 1]
    assert rows[0].score_s > rows[1].score_s


def test_rare_term_outweighs_common(spark):
    from json_ld_spark.operators.search import bm25_topk

    # "rare" in 1 doc, "common" in all; equal tf and dl -> idf dominates
    texts = ["rare pad pad", "common pad pad", "common pad pad", "common pad pad"]
    rows = {
        r.doc_id: r.score_s
        for r in bm25_topk(_docs(spark, texts), ["rare", "common"], k=10).collect()
    }
    assert rows[0] > rows[1] == rows[2] == rows[3]


def test_deterministic_tiebreak_and_k(spark):
    from json_ld_spark.operators.search import bm25_topk

    texts = ["tie word", "tie word", "tie word", "tie word"]
    rows = bm25_topk(_docs(spark, texts), ["tie"], k=2).collect()
    assert [r.doc_id for r in rows] == [0, 1]  # score ties -> doc_id ASC


def test_validation(spark):
    from json_ld_spark.operators.search import bm25_topk

    d = _docs(spark, ["x"])
    with pytest.raises(ValueError, match="empty query"):
        bm25_topk(d, [])
    with pytest.raises(ValueError, match="duplicate"):
        bm25_topk(d, ["a", "a"])
    with pytest.raises(ValueError, match="plain token"):
        bm25_topk(d, ["a'b"])


def test_plan_is_jvm_map_only(spark):
    from json_ld_spark.operators.search import bm25_topk

    out = bm25_topk(_docs(spark, ["fox dog", "fox"]), ["fox"], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # scoring pass is scan -> project -> TakeOrdered: no shuffle join
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
