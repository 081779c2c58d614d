"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

The gate input is the transcript shape mandated by BASELINE.json input_hint:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. Fixtures derive from the driver-provided read-only
``documents`` parquet (TESTDATA.md) so the corpus scales with sf and stays
deterministic — no randomness, no wall clock, every column a pure function of
(doc_id, turn_idx) built from JVM-side expressions (zero Python in
generation, so synthesis never bottlenecks the benchmark).

Every 4th turn embeds an inline JSON-LD object in ``text`` between
``<jsonld>...</jsonld>`` markers; ``tool`` turns carry a JSON-LD document as
the tool payload. Entity ids follow a Zipf-ish split: ~30% of mentions hit 5
hub entities (person-0..4) — the skew/two-phase-agg fixture of FIXTURES.md §3.
Templates rotate across the fixture contexts so each reference algorithm
branch is exercised end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 2026-01-01T00:00:00Z
_EPOCH_2026 = 1767225600

_TEMPLATES = [
    # (context IRI, format pattern with %d entity slots)
    (
        "https://example.org/ctx/prefix",
        '{"@context":"https://example.org/ctx/prefix",'
        '"@id":"http://ex.org/person-%d","name":"Agent %d",'
        '"knows":{"@id":"http://ex.org/person-%d"}}',
    ),
    (
        "https://example.org/ctx/base",
        '{"@context":"https://example.org/ctx/base",'
        '"@id":"person-%d","name":"Agent %d",'
        '"affil":{"@id":"org-%d"}}',
    ),
    (
        "https://example.org/ctx/typed",
        '{"@context":"https://example.org/ctx/typed",'
        '"@id":"http://ex.org/event-%d","label":"Event %d",'
        '"ref":{"@id":"http://ex.org/person-%d"},"tags":["alpha","beta"]}',
    ),
    (
        "https://example.org/ctx/reverse",
        '{"@context":"https://example.org/ctx/reverse",'
        '"@id":"http://ex.org/person-%d","isKnownBy":{"@id":"http://ex.org/person-%d"}}',
    ),
]


def _zipf_entity(h: F.Column, n_entities: int) -> F.Column:
    """~30% of draws land on 5 hub entities; the rest spread uniformly."""
    return F.when(F.pmod(h, F.lit(10)) < 3, F.pmod(h, F.lit(5))).otherwise(
        F.pmod(F.abs(h), F.lit(n_entities))
    )


def synth_transcripts(
    spark: SparkSession,
    sf_dir: str,
    turns_per_conv: int = 8,
    n_entities: int = 500,
    hot_conv: bool = False,
) -> DataFrame:
    """One conversation per document row; ``turns_per_conv`` turns each.

    With ``hot_conv=True`` half of all conversations collapse into a single
    ``conv-hot`` id (turn_idx re-derived to stay unique) — the conv-level
    skew fixture (FIXTURES.md §5.3).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    turns = docs.select(
        "doc_id",
        F.col("text").alias("doc_text"),
        F.explode(F.sequence(F.lit(0), F.lit(turns_per_conv - 1))).alias("t"),
    )
    h1 = F.xxhash64(F.col("doc_id"), F.col("t"))
    h2 = F.xxhash64(F.col("t"), F.col("doc_id"), F.lit(7))
    # independent hash for template choice — reusing h1 would correlate
    # template parity with entity-id parity and starve some (template,
    # entity) combinations
    h3 = F.xxhash64(F.col("doc_id"), F.col("t"), F.lit(13))
    z1 = _zipf_entity(h1, n_entities)
    z2 = _zipf_entity(h2, n_entities)
    tpl_idx = F.pmod(F.abs(h3), F.lit(len(_TEMPLATES)))

    payload = None
    for i, (_iri, pattern) in enumerate(_TEMPLATES):
        branch = F.format_string(pattern, z1, z1, z2)
        payload = (
            F.when(tpl_idx == i, branch) if payload is None
            else payload.when(tpl_idx == i, branch)
        )

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.pmod(F.col("t"), F.lit(3)) + 1).cast("int"),
    )
    prose = F.concat(
        F.lit("turn "), F.col("t").cast("string"), F.lit(": "),
        F.substring(F.col("doc_text"), 1, 120),
    )
    text = F.when(
        F.pmod(F.col("t"), F.lit(4)) == 1,
        F.concat(prose, F.lit(" <jsonld>"), payload, F.lit("</jsonld>")),
    ).otherwise(prose)

    if hot_conv:
        is_hot = F.pmod(F.col("doc_id"), F.lit(2)) == 0
        conv_id = F.when(is_hot, F.lit("conv-hot")).otherwise(
            F.format_string("conv-%08d", F.col("doc_id"))
        )
        turn_idx = F.when(
            is_hot, (F.col("doc_id") / 2).cast("long") * turns_per_conv + F.col("t")
        ).otherwise(F.col("t"))
    else:
        conv_id = F.format_string("conv-%08d", F.col("doc_id"))
        turn_idx = F.col("t")

    return turns.select(
        conv_id.alias("conv_id"),
        turn_idx.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", payload).alias("tool"),
        F.timestamp_seconds(
            F.lit(_EPOCH_2026) + F.col("doc_id") * 3600 + F.col("t") * 7
        ).alias("ts"),
    )
