"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All pure JVM expressions (whole-stage codegen) with
bit-identical DuckDB oracles — no UDFs anywhere on these hot paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text, tokens

# tiny per-language stopword seeds for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    "es": ["el", "la", "los", "las", "es", "una", "con", "por"],
}


# GPT-2-style pre-tokenizer (the "BPE-ish" count): contraction suffixes,
# space-prefixed letter runs, space-prefixed digit runs, space-prefixed
# punctuation runs, whitespace runs. Restricted to the Java∩RE2 regex
# subset (no lookahead — GPT-2's original `\s+(?!\S)` branch is dropped;
# trailing-space splits shift ONE match between adjacent whitespace runs,
# irrelevant for counting) so Spark (Java regex) and the DuckDB oracle
# (RE2) count identically. `\s` itself is NOT in that subset — Java's \s
# includes vertical tab \x0B, RE2's does not, so a document with \x0B
# adjacent to other whitespace would count differently — hence the
# explicit class [ \t\n\x0B\f\r], byte-identical in both engines.
_WS = r" \t\n\x0B\f\r"
BPE_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
    rf"| ?[^{_WS}\p{{L}}\p{{N}}]+|[{_WS}]+"
)


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_norm, n_bpe_pretokens) — whitespace+
    regex tokenization plus the GPT-2-style pre-token count, the cheap
    JVM-side estimator of BPE token cost a training pipeline budgets
    sequences with (real BPE merges only ever SPLIT pre-tokens further,
    so this lower-bounds and tracks the true token count)."""
    return docs.select(
        "doc_id",
        F.size(tokens()).alias("n_tokens"),
        F.length(F.trim(normalized_text())).alias("n_chars_norm"),
        F.regexp_count(F.col("text"), F.lit(BPE_PRETOKEN_RE)).alias(
            "n_bpe_pretokens"
        ),
    ).orderBy("doc_id")


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + combined score:
    length band, punctuation ratio, stopword ratio, mean token length."""
    txt = F.col("text")
    n_chars = F.length(txt)
    n_punct = n_chars - F.length(F.regexp_replace(txt, r"[^\w\s]", ""))
    toks = tokens()
    n_tokens = F.size(toks)
    en_stops = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stops, t)))
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / n_tokens,
    ).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), 0.4).otherwise(0.0)
        + F.when((punct_ratio > 0.0) & (punct_ratio < 0.2), 0.2).otherwise(0.0)
        + F.when(stop_ratio > 0.05, 0.2).otherwise(0.0)
        + F.when((mean_tok_len > 2.0) & (mean_tok_len < 12.0), 0.2).otherwise(0.0)
    )
    return docs.select(
        "doc_id",
        F.col("n_chars").alias("n_chars"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(score, 6).alias("quality"),
    ).orderBy("doc_id")


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language guess over {en, de, fr, es}; 'und' when no
    stopword hits. Deterministic tie-break by language code order."""
    toks = tokens()
    votes = []
    for code in sorted(STOPWORDS):
        arr = F.array(*[F.lit(s) for s in STOPWORDS[code]])
        votes.append(
            F.struct(
                (-F.size(F.filter(toks, lambda t: F.array_contains(arr, t))))
                .alias("neg_hits"),
                F.lit(code).alias("code"),
            )
        )
    # sort by (-hits, code) ascending → [0] = max hits, alphabetically-first
    # code on ties (deterministic, mirrored in the DuckDB oracle)
    best = F.array_sort(F.array(*votes))[0]
    return docs.select(
        "doc_id",
        F.when(best["neg_hits"] < 0, best["code"]).otherwise("und").alias("lang_guess"),
    ).orderBy("doc_id")


def fingerprint(docs: DataFrame, n: int = 4) -> DataFrame:
    """Document fingerprint: md5 of normalized text (exact) + winnowed
    min-shingle hash (robust to local edits) — the rolling-hash scheme
    expressed as min over n-gram digests."""
    toks = F.slice(tokens(), 1, 500)
    # Shifted-array zip_with shingling. The obvious
    # transform(sequence(...), i -> slice(toks, i, n)) form embeds the
    # WHOLE tokenizer expression in the lambda body, and higher-order
    # lambdas re-evaluate outer references PER ELEMENT — measured 3.3×
    # slower at sf0.1 (the tokenizer ran once per shingle index). Here
    # toks evaluates n times per row (once per shifted copy), each
    # zip_with input exactly once. slice with length 0 handles short docs
    # (empty grams → null fingerprint, same as before).
    L = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    acc = F.slice(toks, 1, L)
    for k in range(1, n):
        acc = F.zip_with(
            acc, F.slice(toks, k + 1, L),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    grams = F.transform(acc, lambda g: F.md5(g))
    return docs.select(
        "doc_id",
        F.md5(F.trim(normalized_text())).alias("exact_fp"),
        F.array_min(grams).alias("shingle_fp"),
    ).orderBy("doc_id")


def _word_ngrams(toks: F.Column, n: int) -> F.Column:
    """Word n-grams — the shared zip_with builder (see
    dedup.shingle_array for the zip_with-vs-transform rationale)."""
    from .dedup import shingle_array

    return shingle_array(toks, n)


def decontaminate(
    docs: DataFrame, eval_docs: DataFrame, n: int = 8, min_hits: int = 1
) -> DataFrame:
    """Training-set decontamination by word n-gram overlap (the GPT-3 /
    Pile-style eval-leakage filter): flag every document sharing at least
    ``min_hits`` distinct ``n``-grams with the evaluation set.

    Returns (doc_id, n_hits, contaminated) for EVERY input doc (zero-fill
    for clean ones) — the caller drops or downweights flagged docs.

    100 TB shape: the eval side is a benchmark suite — bounded
    (10^3-10^5 docs) regardless of corpus size — so its DISTINCT n-grams
    broadcast; the corpus side is a map-only explode into a
    broadcast-hash join plus one partially-aggregated groupBy(doc_id).
    The corpus text itself is never shuffled, and per-doc gram dedup
    (array_distinct) bounds both the join fan-out and the count
    semantics (n_hits = distinct shared grams, not occurrences)."""
    eval_grams = (
        eval_docs.select(F.explode(_word_ngrams(tokens(), n)).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_word_ngrams(tokens(), n))).alias("gram"),
    )
    hit_counts = (
        doc_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
    return (
        docs.select("doc_id")
        .join(hit_counts, "doc_id", "left")
        .select(
            "doc_id",
            n_hits.alias("n_hits"),
            (n_hits >= min_hits).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# PII patterns chosen for identical semantics in Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, non-capturing
# groups, \b — no lookaround (RE2 has none), no backreferences
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{9,15}\b", "<PHONE>"),
]


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII detection + redaction (the pre-training privacy pass): per doc,
    match counts for each pattern class and the md5 of the text with all
    matches replaced by typed placeholders (``<EMAIL>``/``<IP>``/
    ``<PHONE>``), applied in declaration order.

    Pure JVM regexp expressions (whole-stage codegen, zero Python): the
    scrub itself is a projection — the only exchange in the plan is the
    final presentation sort (driver-contract orderBy, pinned); the
    DuckDB oracle replays the same patterns with RE2, which is why the
    pattern table above restricts itself to the Java∩RE2 subset."""
    txt = F.col("text")
    cols = [F.col("doc_id")]
    scrubbed = txt
    for name, pat, repl in PII_PATTERNS:
        cols.append(F.regexp_count(txt, F.lit(pat)).alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    cols.append(F.md5(scrubbed).alias("scrubbed_md5"))
    return docs.select(*cols).orderBy("doc_id")


def repetition_stats(docs: DataFrame, n: int = 2) -> DataFrame:
    """Gopher/MassiveText-style repetition quality signals per document:
    duplicate word-``n``-gram fraction (1 − distinct/total) and the token
    coverage of the single most frequent n-gram — the two repetition
    rules those filters threshold on to drop degenerate generations and
    boilerplate.

    Plan: ZERO-SHUFFLE map-only projection. The per-doc gram multiset is
    bounded (one document's tokens), so instead of exploding every gram
    into a corpus-wide hash aggregation (a full shuffle of ~tokens×n
    bytes — the first implementation, measured 5.9 s at sf0.1), the gram
    array sorts in-row and a single JVM ``aggregate`` fold walks the
    runs: run length = consecutive-equal count, best = longest run with
    the lexicographically-LAST gram winning ties (ascending sort + ``>=``
    update gives exactly the max(struct(count, gram)) tie-break the
    DuckDB oracle mirrors with ORDER BY c DESC, gram DESC). The only
    exchange left is the presentation sort."""
    toks = tokens()
    grams = F.array_sort(_word_ngrams(toks, n))

    def step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = (run > acc["best_c"]) | (
            (run == acc["best_c"]) & (g >= acc["best_g"])
        )
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best_c"]).alias("best_c"),
            F.when(better, g).otherwise(acc["best_g"]).alias("best_g"),
        )

    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best_c"),
        F.lit(None).cast("string").alias("best_g"),
    )
    base = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(grams).cast("long").alias("n_grams"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_distinct"),
        F.aggregate(grams, zero, step).alias("top"),
    )
    has = F.col("n_grams") > 0
    return base.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "n_grams",
        F.when(
            has,
            F.round(
                1 - F.col("n_distinct") / F.col("n_grams").cast("double"), 6
            ),
        ).alias("dup_gram_frac"),
        F.when(has, F.col("top.best_g")).alias("top_gram"),
        F.when(
            has,
            F.round(
                F.lit(n)
                * F.col("top.best_c")
                / F.col("n_tokens").cast("double"),
                6,
            ),
        ).alias("top_gram_frac"),
    ).orderBy("doc_id")


def length_quantiles(docs: DataFrame) -> DataFrame:
    """Per-source EXACT token-length quantiles — rank statistics, not
    Spark's approx sketches: ``pXX`` is the token count of the document
    at ascending rank ``ceil(q * n)`` (ties broken by doc_id, so the
    selected element — not merely its value — is engine-independent).
    ``percentile_approx``/t-digest answers differ run-to-run and
    engine-to-engine; a curation pipeline that gates on "p99 length"
    needs the gate to be replayable. Rank arithmetic is pure integer
    (``ceil(q*n)`` as ``(q_num*n + q_den-1) div q_den``), every output a
    BIGINT.

    Plan: one window sort per source partition (the same exchange the
    final groupBy reuses) — at 10^12 docs the per-source sort is the
    bound; sources are few and far below task limits, and a pathological
    single-source corpus would switch to the two-pass
    count-then-rank-select formulation (noted, not needed here).
    """
    from pyspark.sql import Window

    n_tok = F.size(tokens()).cast("long")
    base = docs.select("doc_id", "source", n_tok.alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("source"))
    )

    def pick(num: int, den: int, alias: str):
        target = F.expr(f"({num} * n + {den - 1}) div {den}")
        return F.max(
            F.when(F.col("rn") == target, F.col("n_tokens"))
        ).alias(alias)

    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            pick(1, 2, "p50_tokens"),
            pick(9, 10, "p90_tokens"),
            pick(99, 100, "p99_tokens"),
        )
        .orderBy("source")
    )
