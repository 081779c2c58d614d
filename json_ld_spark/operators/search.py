"""Keyword relevance scoring (BM25) over the document corpus.

Training-data curation constantly runs "find the documents about X"
sweeps — seed-document selection, domain up-sampling, targeted decontam
audits — and at 100 TB that is a full-scan ranking problem, not an index
lookup.  This module scores every document against a small bag of query
terms with the BM25 weighting scheme (Robertson/Spärck Jones; the public
formula used by Lucene/Elasticsearch) expressed entirely in JVM-side
Catalyst expressions.

Bit-exactness across engines (why integer fixed-point)
------------------------------------------------------
The driver's correctness gate compares Spark output to an independent
DuckDB oracle value-for-value, and ``ln`` is not guaranteed to round
identically across libm builds.  So the scorer uses a *rational-idf*
BM25 variant in scaled-integer arithmetic (scale ``S = 10^6``):

- ``idf_s(t)   = (N * S) div df_t``             (rational idf, no log —
  monotone in 1/df, which is all ranking needs; documented deviation)
- ``norm_s     = (S - b_s) + (b_s * dl * S) div avgdl_s``
- ``denom_s    = tf * S + (k1_s * norm_s) div S``
- ``contrib    = ((tf * S * S) div denom_s) * idf_s div S``
- ``score_s    = Σ_t contrib_t``  with ``k1 = 1.2``, ``b = 0.75``.

Every operation is 64-bit integer multiply / add / floor-divide, so any
engine computes identical bits.  Overflow headroom: ``tf ≤ dl ≤ 10^6``
keeps ``tf*S*S ≤ 10^18 < 2^63``; ``N*S`` requires ``N < 9.2×10^12``
documents (add a second scaling stage before exceeding that).

Execution model (why this scales)
---------------------------------
Tokenization is ``regexp_extract_all(lower(text))`` and per-term
``tf_t = size(filter(tokens, = t))`` — *map-only*, no explode, no
shuffle, one pass.  Corpus statistics (``N``, ``Σ dl``, ``df_t``) are a
single whole-corpus aggregate collected as ONE bounded row (2 + |terms|
integers), then injected as literals into the scoring pass, which is
map-only + TakeOrderedAndProject for the top-k.  Two passes over the
corpus total; both full scans are embarrassingly parallel with no key
skew possible.  Hot path is 100% whole-stage-codegen JVM.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_S = 1_000_000
_K1_S = 1_200_000  # k1 = 1.2
_B_S = 750_000  # b = 0.75
_TOKEN_RE = "[a-z0-9]+"


def _eq(term: str):
    # a one-parameter lambda: F.filter treats two-parameter lambdas as
    # (element, index), so a default-arg closure would silently rebind
    lit = F.lit(term)
    return lambda x: x == lit


def _tf_cols(terms: Sequence[str]) -> list:
    toks = F.expr(f"regexp_extract_all(lower(text), '{_TOKEN_RE}', 0)")
    cols = [F.size(toks).cast("long").alias("dl")]
    for i, t in enumerate(terms):
        cols.append(
            F.size(F.filter(toks, _eq(t))).cast("long").alias(f"tf_{i}")
        )
    return cols


def bm25_topk(
    docs: DataFrame, terms: Sequence[str], k: int = 50
) -> DataFrame:
    """Top-``k`` documents by fixed-point BM25 score for ``terms``.

    ``docs`` needs columns (doc_id, text).  Returns
    (doc_id, score_s, n_terms) — ``score_s`` is the S-scaled integer
    score, ``n_terms`` how many distinct query terms the document
    contains.  Deterministic tie-break: score DESC, doc_id ASC.
    """
    terms = list(terms)
    if not terms:
        raise ValueError("empty query")
    if len(set(terms)) != len(terms):
        raise ValueError("duplicate query terms")
    for t in terms:
        if not t or any(c in t for c in "'\\"):
            raise ValueError(f"term {t!r} is not a plain token")

    tf = docs.select("doc_id", *_tf_cols(terms))

    # ONE bounded row: N, Σdl, df per term — the only driver-side data
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    n_docs = int(stats["n_docs"])
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl_s = (int(stats["sum_dl"]) * _S) // n_docs
    if avgdl_s == 0:
        raise ValueError("corpus has no tokens")

    # assemble score: Σ_t  when(tf>0, (tfcomp * idf_s) div S, 0)
    score = F.lit(0).cast("long")
    n_terms = F.lit(0).cast("long")
    for i in range(len(terms)):
        df_t = int(stats[f"df_{i}"])
        if df_t == 0:
            continue
        idf_s = (n_docs * _S) // df_t
        term_score = F.expr(
            f"((tf_{i} * {_S} * {_S}) div "
            f"(tf_{i} * {_S} + (({_K1_S} * ({_S - _B_S} + "
            f"(({_B_S} * dl * {_S}) div {avgdl_s}))) div {_S})) "
            f"* {idf_s}) div {_S}"
        )
        score = score + F.when(F.col(f"tf_{i}") > 0, term_score).otherwise(
            F.lit(0)
        )
        n_terms = n_terms + (F.col(f"tf_{i}") > 0).cast("long")

    return (
        tf.select(
            "doc_id",
            score.alias("score_s"),
            n_terms.alias("n_terms"),
        )
        .where(F.col("score_s") > 0)
        .orderBy(F.col("score_s").desc(), F.col("doc_id").asc())
        .limit(k)
    )
