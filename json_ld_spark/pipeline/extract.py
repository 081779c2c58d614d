"""Triple extraction: transcripts → triples via an Arrow-batched kernel.

This is operator U1 of SURVEY.md §2 — the ``mapInPandas`` stage that wraps
the whole kernel (A1-A33): per Arrow batch, each JSON-bearing turn's
documents are parsed, their contexts resolved against the broadcast context
dictionary (compiled once per Python worker and memoized), expanded to
triples, and fanned out 1→N. Errors never abort the job: they become
quarantine rows with the exact reference error code (src/error.rs taxonomy)
carried in ``error_code`` (FIXTURES.md §5.4).

Scale design:
- The candidate-turn filter (``tool IS NOT NULL OR text LIKE '%<jsonld>%'``)
  runs JVM-side *before* the Python boundary so non-JSON turns never cross
  Arrow.
- Only (conv_id, turn_idx, text, tool) are selected → column pruning reaches
  the parquet scan.
- The context-compile cache is per-worker and keyed by the canonical JSON of
  the ``@context`` value: ~10^1 distinct contexts vs ~10^12 turns means the
  per-document cost is dict lookups + the expansion walk only.
"""

from __future__ import annotations

import json
import re
from typing import Iterator, Mapping, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..contexts import ContextDict
from ..kernel import (
    Context,
    JsonLdError,
    ProcessorOptions,
    expand_document,
    expanded_to_triples,
    process_context,
)

TRIPLE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj_kind", StringType()),
        StructField("obj_value", StringType()),
        StructField("obj_type", StringType()),
        StructField("obj_lang", StringType()),
        StructField("obj_direction", StringType()),
        StructField("graph", StringType()),
        StructField("error_code", StringType()),
    ]
)

_INLINE_RE = re.compile(r"<jsonld>(.*?)</jsonld>", re.DOTALL)

_TRIPLE_COLS = [f.name for f in TRIPLE_SCHEMA.fields]

# The JVM-side candidate predicate and the Python-side document discovery
# below are THE definition of "which turns carry documents, and which
# documents" — shared by extraction and flatten stats so they can never
# silently diverge. (A function, not a module-level Column: F.col() needs
# an active SparkContext, and this module imports at pytest collection.)


def _candidate_filter():
    return F.col("tool").isNotNull() | F.col("text").contains("<jsonld>")


def iter_turn_documents(text, tool) -> list[str]:
    """Raw JSON-LD document strings carried by one turn: the tool payload
    (if any) followed by every inline ``<jsonld>…</jsonld>`` block."""
    raws: list[str] = []
    if isinstance(tool, str) and tool:
        raws.append(tool)
    if isinstance(text, str) and "<jsonld>" in text:
        raws.extend(_INLINE_RE.findall(text))
    return raws


class TurnExpander:
    """Per-worker expansion kernel with context-compile and document memo
    caches.

    The document memo exploits that expansion is a *pure function* of the
    raw document string once the context dictionary is frozen: identical
    payloads (retried tool calls, templated agent turns, re-sent context
    blobs — extremely common in real transcript corpora) expand once and
    then cost a dict lookup. Bounded FIFO eviction keeps worker memory flat
    regardless of corpus size; cache hit/miss changes throughput, never
    output.
    """

    DOC_CACHE_MAX = 65536

    def __init__(self, raw_contexts: Mapping[str, dict], document_iri: str) -> None:
        self.processor = ProcessorOptions(
            document_iri=document_iri, context_loader=dict(raw_contexts)
        )
        self.document_iri = document_iri
        self._cache: dict[str, Context] = {}
        self._doc_cache: dict[str, tuple[tuple, ...]] = {}
        # memoization hit-rate, surfaced through the extraction metrics
        # accumulator: real corpora reuse a handful of inline @context
        # blobs across millions of turns (the reference keeps a per-run
        # remote-context cache for the same reason —
        # /root/reference/src/remote.rs:29-38), so ctx_hits/(hits+misses)
        # ≈ 1 is the expected steady state; a low rate on a production
        # run is a red flag that context JSON is being perturbed per turn
        self.cache_stats = {
            "ctx_hits": 0, "ctx_misses": 0, "doc_hits": 0, "doc_misses": 0,
        }

    def _active_context(self, ctx_value) -> Context:
        key = json.dumps(ctx_value, sort_keys=True, separators=(",", ":"))
        ctx = self._cache.get(key)
        if ctx is None:
            self.cache_stats["ctx_misses"] += 1
            ctx = process_context(
                self.processor, Context(base=self.document_iri),
                ctx_value, self.document_iri,
            )
            self._cache[key] = ctx
        else:
            self.cache_stats["ctx_hits"] += 1
        return ctx

    def _expand_doc(self, raw: str) -> tuple[tuple, ...]:
        """Expand one raw document string to partial rows (everything after
        the conv_id/turn_idx prefix), memoized on the raw string."""
        cached = self._doc_cache.get(raw)
        if cached is not None:
            self.cache_stats["doc_hits"] += 1
            return cached
        self.cache_stats["doc_misses"] += 1
        out: list[tuple] = []
        try:
            doc = json.loads(raw)
        except (json.JSONDecodeError, ValueError):
            doc = None
            out.append(
                (None, None, None, None, None, None, None, None,
                 "loading document failed")
            )
        if doc is not None:
            try:
                ctx_value = doc.get("@context") if isinstance(doc, Mapping) else None
                if ctx_value is not None:
                    active = self._active_context(ctx_value)
                    body = {k: v for k, v in doc.items() if k != "@context"}
                else:
                    active = Context(base=self.document_iri)
                    body = doc
                expanded = expand_document(self.processor, active, body)
                for t in expanded_to_triples(expanded):
                    out.append(
                        (t["subj"], t["pred"], t["obj_kind"], t["obj_value"],
                         t["obj_type"], t["obj_lang"], t["obj_direction"],
                         t["graph"], None)
                    )
            except JsonLdError as e:
                out = [
                    (None, None, None, None, None, None, None, None,
                     e.code.value)
                ]
        result = tuple(out)
        if len(self._doc_cache) >= self.DOC_CACHE_MAX:
            # FIFO eviction: drop the oldest insertion (dict is ordered)
            self._doc_cache.pop(next(iter(self._doc_cache)))
        self._doc_cache[raw] = result
        return result

    def expand_turn(self, conv_id: str, turn_idx: int, text, tool) -> list[tuple]:
        """All triples (or quarantine rows) for one turn."""
        out: list[tuple] = []
        for raw in iter_turn_documents(text, tool):
            for part in self._expand_doc(raw):
                out.append((conv_id, turn_idx) + part)
        return out


FLATTEN_STATS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("n_docs", IntegerType()),
        StructField("n_nodes", IntegerType()),
        StructField("n_props", IntegerType()),
        StructField("n_blank", IntegerType()),
    ]
)


def flatten_turn_stats(
    transcripts: DataFrame, contexts: Optional[ContextDict] = None
) -> DataFrame:
    """Per JSON-bearing turn, the flattened-graph shape (§8 flattening
    applied to every document in the turn): number of successfully
    flattened docs, total top-level+named-graph nodes, non-keyword
    properties, and distinct blank-node labels. Same Arrow-batched
    plan shape as extract_triples (candidate filter JVM-side, 4-column
    pruning, map-only); docs that fail to parse/expand are skipped, the
    quarantine path being extract_triples' job."""
    from ..kernel import expand_document, flatten_expanded, flatten_stats

    contexts = contexts or ContextDict()
    bc = transcripts.sparkSession.sparkContext.broadcast(
        (contexts.raw, contexts.document_iri)
    )
    candidates = transcripts.select(
        "conv_id", "turn_idx", "text", "tool"
    ).where(_candidate_filter())

    def stats_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raw_contexts, document_iri = bc.value
        expander = TurnExpander(raw_contexts, document_iri)

        def doc_stats(raw: str):
            try:
                doc = json.loads(raw)
            except (json.JSONDecodeError, ValueError):
                return None
            try:
                ctx_value = (
                    doc.get("@context") if isinstance(doc, Mapping) else None
                )
                if ctx_value is not None:
                    active = expander._active_context(ctx_value)
                    body = {k: v for k, v in doc.items() if k != "@context"}
                else:
                    active = Context(base=document_iri)
                    body = doc
                flat = flatten_expanded(
                    expand_document(expander.processor, active, body)
                )
            except JsonLdError:
                return None
            return flatten_stats(flat)

        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text, tool in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["tool"]
            ):
                n_docs = n_nodes = n_props = n_blank = 0
                for raw in iter_turn_documents(text, tool):
                    st = doc_stats(raw)
                    if st is None:
                        continue
                    n_docs += 1
                    n_nodes += st[0]
                    n_props += st[1]
                    n_blank += st[2]
                rows.append(
                    (conv_id, int(turn_idx), n_docs, n_nodes, n_props, n_blank)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "n_docs", "n_nodes",
                    "n_props", "n_blank",
                ],
            )

    return candidates.mapInPandas(stats_batches, schema=FLATTEN_STATS_SCHEMA)


class TaskMetricsParam:
    """AccumulatorParam collecting per-task ``(input_rows, kernel_seconds,
    ctx_hits, ctx_misses, doc_hits, doc_misses)`` tuples — the
    straggler-detection surface of SURVEY §5.2-6 (max task ≤ 2× median
    after salted repartition) plus the TurnExpander memoization hit-rates
    (context-compile and whole-document caches). Listener-free: works
    with the UI disabled and measures exactly the stage where conv-level
    skew would concentrate (the Python kernel)."""

    @staticmethod
    def zero(value):
        return []

    @staticmethod
    def addInPlace(a, b):
        a.extend(b)
        return a


def extract_triples(
    transcripts: DataFrame,
    contexts: Optional[ContextDict] = None,
    dedup: bool = True,
    dedup_turns: bool = False,
    task_metrics_acc=None,
) -> DataFrame:
    """transcripts → triples DataFrame (quarantine rows included;
    filter ``error_code IS NULL`` for clean triples).

    Plan shape: parquet scan (pruned to 4 cols, candidate filter pushed) →
    mapInPandas kernel (with in-kernel per-turn exact dedup — see inline
    note for why that equals a global dropDuplicates) — a single map-only
    stage, no exchange.

    PRECONDITION for ``dedup=True``'s global-dedup guarantee: (conv_id,
    turn_idx) is unique in ``transcripts``. The streaming path enforces this
    with dropDuplicatesWithinWatermark (streaming/ingest.py); batch callers
    with possibly-replayed turn rows (retried tool calls re-appended by an
    upstream writer) must pass ``dedup_turns=True``, which inserts a cheap
    pre-kernel ``dropDuplicates(["conv_id","turn_idx"])`` on the *candidate*
    rows — a shuffle of the JSON-bearing slice only, far smaller than the
    full-output shuffle the old global dropDuplicates paid. The job path
    (pipeline/job.py) enables it.
    """
    contexts = contexts or ContextDict()
    # ship the context dictionary as a real broadcast variable: closure
    # capture re-pickles the dict into every serialized task (10^5 tasks at
    # target scale), a broadcast ships it once per executor (SURVEY §2 S3)
    bc = transcripts.sparkSession.sparkContext.broadcast(
        (contexts.raw, contexts.document_iri)
    )

    candidates = transcripts.select(
        "conv_id", "turn_idx", "text", "tool"
    ).where(_candidate_filter())
    if dedup_turns:
        # deterministic survivor: dropDuplicates keeps whichever replayed
        # row a partitioning happens to deliver first — if an upstream
        # retry re-appended a *different* payload for the same (conv_id,
        # turn_idx), the emitted triples would vary across runs, breaking
        # the byte-identical resume/checksum guarantee. max_by on the
        # payload hash costs the same single shuffle (same groupBy key)
        # and always keeps the lexicographically-max payload; byte-equal
        # replays tie harmlessly.
        # length-prefixed + 0x1f-separated (chr(31) spelled explicitly —
        # a literal byte in source is invisible and has already misled one
        # reviewer): unambiguous even if a payload contains the separator
        # byte, so distinct (text, tool) pairs cannot hash-tie by framing
        payload_hash = F.sha2(
            F.concat_ws(
                chr(31),
                F.length(F.coalesce(F.col("text"), F.lit(""))).cast("string"),
                F.coalesce(F.col("text"), F.lit("")),
                F.coalesce(F.col("tool"), F.lit("")),
            ),
            256,
        )
        candidates = (
            candidates.groupBy("conv_id", "turn_idx")
            .agg(
                F.max_by(F.struct("text", "tool"), payload_hash).alias("_p")
            )
            .select("conv_id", "turn_idx", "_p.text", "_p.tool")
        )

    def expand_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time as _time

        raw_contexts, document_iri = bc.value
        expander = TurnExpander(raw_contexts, document_iri)
        n_in = 0
        t0 = _time.perf_counter()
        for pdf in batches:
            n_in += len(pdf)
            rows: list[tuple] = []
            for conv_id, turn_idx, text, tool in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["tool"]
            ):
                turn_rows = expander.expand_turn(conv_id, int(turn_idx), text, tool)
                if dedup:
                    # G1 — exact triple dedup, shuffle-free. The dedup key is
                    # the FULL row including (conv_id, turn_idx), and a turn
                    # is expanded exactly once in exactly one task, so
                    # duplicates of the key can only arise *within* this
                    # turn's own output (e.g. the same doc in both text and
                    # tool). Per-turn set-dedup is therefore exactly
                    # equivalent to a global dropDuplicates over all 11
                    # columns — minus a ~full-output shuffle, which at the
                    # 100 TB target is the difference between a map-only
                    # stage and a petascale exchange.
                    turn_rows = list(dict.fromkeys(turn_rows))
                rows.extend(turn_rows)
            yield pd.DataFrame(rows, columns=_TRIPLE_COLS)
        if task_metrics_acc is not None:
            # one sample per task — straggler surface + memoization
            # hit-rates (TaskMetricsParam)
            cs = expander.cache_stats
            task_metrics_acc.add([(
                n_in, _time.perf_counter() - t0,
                cs["ctx_hits"], cs["ctx_misses"],
                cs["doc_hits"], cs["doc_misses"],
            )])

    return candidates.mapInPandas(expand_batches, schema=TRIPLE_SCHEMA)


FRAMED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("doc_idx", IntegerType()),
        StructField("root_id", StringType()),
        StructField("n_props", IntegerType()),
        StructField("n_embedded", IntegerType()),
        StructField("frame_fp", StringType()),
    ]
)

# default frame for the transcript corpus: match the entity roots (nodes
# carrying schema:name — the person/entity subjects every template emits)
# and embed everything reachable once. Expanded form: property IRIs direct.
DEFAULT_TURN_FRAME: dict = {"http://schema.org/name": [{}]}


def _framed_node_stats(node) -> tuple[int, int]:
    """(n_props on root, n_embedded node objects anywhere below root)."""
    n_props = sum(1 for p in node if not p.startswith("@"))

    def count_embedded(value) -> int:
        if isinstance(value, list):
            return sum(count_embedded(v) for v in value)
        if isinstance(value, dict):
            if "@list" in value:
                return count_embedded(value["@list"])
            inner = sum(
                count_embedded(v) for k, v in value.items() if k != "@id"
            )
            is_node = "@id" in value and "@value" not in value and len(value) > 1
            return inner + (1 if is_node else 0)
        return 0

    return n_props, sum(
        count_embedded(v) for k, v in node.items() if not k.startswith("@")
    )


def frame_turn_entities(
    transcripts: DataFrame,
    contexts: Optional[ContextDict] = None,
    frame: Optional[dict] = None,
) -> DataFrame:
    """§9 Framing applied per JSON-bearing turn (kernel/frame.py — the last
    JsonLdProcessor entry): each document expands, frames against
    ``frame`` (expanded form; default = entity roots by schema:name), and
    every framed root emits one row with its shape counts plus an md5
    fingerprint of the canonical framed JSON — a bit-exact pin of the
    whole framed structure for the golden oracle. Same Arrow-batched plan
    shape as extract_triples: candidate filter JVM-side, 4-column pruning,
    map-only; failing docs are skipped (quarantine is extract_triples'
    job)."""
    import hashlib

    from ..kernel import frame_expanded

    frame = frame or DEFAULT_TURN_FRAME
    contexts = contexts or ContextDict()
    bc = transcripts.sparkSession.sparkContext.broadcast(
        (contexts.raw, contexts.document_iri, frame)
    )
    candidates = transcripts.select(
        "conv_id", "turn_idx", "text", "tool"
    ).where(_candidate_filter())

    def framed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raw_contexts, document_iri, frame_obj = bc.value
        expander = TurnExpander(raw_contexts, document_iri)

        def frame_doc(raw: str):
            try:
                doc = json.loads(raw)
            except (json.JSONDecodeError, ValueError):
                return []
            try:
                ctx_value = (
                    doc.get("@context") if isinstance(doc, Mapping) else None
                )
                if ctx_value is not None:
                    active = expander._active_context(ctx_value)
                    body = {k: v for k, v in doc.items() if k != "@context"}
                else:
                    active = Context(base=document_iri)
                    body = doc
                expanded = expand_document(expander.processor, active, body)
                return frame_expanded(expanded, frame_obj)
            except JsonLdError:
                return []

        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text, tool in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["tool"]
            ):
                for doc_idx, raw in enumerate(iter_turn_documents(text, tool)):
                    for root in frame_doc(raw):
                        n_props, n_embedded = _framed_node_stats(root)
                        fp = hashlib.md5(
                            json.dumps(
                                root, sort_keys=True, separators=(",", ":")
                            ).encode()
                        ).hexdigest()
                        rows.append(
                            (conv_id, int(turn_idx), doc_idx, root["@id"],
                             n_props, n_embedded, fp)
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "doc_idx", "root_id",
                    "n_props", "n_embedded", "frame_fp",
                ],
            )

    return candidates.mapInPandas(framed_batches, schema=FRAMED_SCHEMA)


FRAMED_COMPACT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("doc_idx", IntegerType()),
        StructField("root_id", StringType()),
        StructField("n_keys", IntegerType()),
        StructField("n_null", IntegerType()),
        StructField("compact_fp", StringType()),
    ]
)

# default COMPACTING frame: entity roots by schema:name, plus a property
# most roots lack (jobTitle) so the spec-default @omitDefault=false path
# and the §4.1 "@null"→null cleanup are exercised on real corpus data
DEFAULT_COMPACT_FRAME: dict = {
    "@context": {
        "name": "http://schema.org/name",
        "knows": "http://schema.org/knows",
        "jobTitle": "http://schema.org/jobTitle",
    },
    "name": {},
    "jobTitle": {},
}


def frame_compact_turn_entities(
    transcripts: DataFrame,
    contexts: Optional[ContextDict] = None,
    frame: Optional[dict] = None,
) -> DataFrame:
    """Framing §4.1 steps 18-21 END-TO-END per JSON-bearing turn: each
    document expands, frames (spec default ``@omitDefault: false`` — the
    round-5 flip), COMPACTS against the frame's own ``@context``, and the
    ``"@null"`` markers become JSON ``null`` (kernel/frame.py
    ``cleanup_null_markers``). Per framed root one row: compacted key
    count, the number of null-cleaned (framed-but-missing) properties,
    and an md5 fingerprint of the canonical compacted JSON — a bit-exact
    pin of the whole §4.1 output shape for the golden oracle. Same
    Arrow-batched map-only plan as frame_turn_entities."""
    import hashlib

    from ..kernel import (
        cleanup_null_markers,
        compact_document,
        expand_frame,
        frame_expanded,
    )

    frame = frame or DEFAULT_COMPACT_FRAME
    contexts = contexts or ContextDict()
    bc = transcripts.sparkSession.sparkContext.broadcast(
        (contexts.raw, contexts.document_iri, frame)
    )
    candidates = transcripts.select(
        "conv_id", "turn_idx", "text", "tool"
    ).where(_candidate_filter())

    def framed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raw_contexts, document_iri, frame_obj = bc.value
        expander = TurnExpander(raw_contexts, document_iri)
        # frame context + expanded frame compile once per worker
        frame_ctx = Context(base=document_iri)
        ctx_value = frame_obj.get("@context")
        if ctx_value is not None:
            frame_ctx = process_context(
                expander.processor, frame_ctx, ctx_value, document_iri
            )
        expanded_frame = expand_frame(
            expander.processor, frame_ctx, frame_obj
        )

        def frame_doc(raw: str):
            try:
                doc = json.loads(raw)
            except (json.JSONDecodeError, ValueError):
                return []
            try:
                ctx_val = (
                    doc.get("@context") if isinstance(doc, Mapping) else None
                )
                if ctx_val is not None:
                    active = expander._active_context(ctx_val)
                    body = {k: v for k, v in doc.items() if k != "@context"}
                else:
                    active = Context(base=document_iri)
                    body = doc
                expanded = expand_document(expander.processor, active, body)
                framed = frame_expanded(expanded, expanded_frame)
                compacted = compact_document(frame_ctx, framed)
                if not isinstance(compacted, list):
                    compacted = [compacted]
                return [cleanup_null_markers(n) for n in compacted]
            except JsonLdError:
                return []

        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text, tool in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["tool"]
            ):
                for doc_idx, raw in enumerate(iter_turn_documents(text, tool)):
                    for root in frame_doc(raw):
                        n_null = sum(1 for v in root.values() if v is None)
                        fp = hashlib.md5(
                            json.dumps(
                                root, sort_keys=True, separators=(",", ":")
                            ).encode()
                        ).hexdigest()
                        rows.append(
                            (conv_id, int(turn_idx), doc_idx,
                             root.get("@id", ""), len(root), n_null, fp)
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "doc_idx", "root_id",
                    "n_keys", "n_null", "compact_fp",
                ],
            )

    return candidates.mapInPandas(framed_batches, schema=FRAMED_COMPACT_SCHEMA)


COMPACTED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("doc_idx", IntegerType()),
        StructField("n_keys", IntegerType()),
        StructField("n_term_keys", IntegerType()),
        StructField("n_iri_keys", IntegerType()),
        StructField("roundtrip_ok", IntegerType()),
        StructField("compact_fp", StringType()),
    ]
)


def _compacted_doc_stats(element) -> tuple[int, int, int]:
    """(non-keyword keys, short-term keys, CURIE/IRI keys) across every
    mapping in the compacted structure. A compacted key containing ``:``
    is a CURIE or absolute IRI; otherwise the inverse context selected a
    short term — the ratio is the observable effect of §6.2/§6.3 term
    selection, pinned bit-exactly by the golden."""
    total = terms = iris = 0
    stack = [element]
    while stack:
        node = stack.pop()
        if isinstance(node, list):
            stack.extend(node)
        elif isinstance(node, Mapping):
            for k, v in node.items():
                stack.append(v)
                if k.startswith("@"):
                    continue
                total += 1
                if ":" in k:
                    iris += 1
                else:
                    terms += 1
    return total, terms, iris


def compact_turn_docs(
    transcripts: DataFrame,
    contexts: Optional[ContextDict] = None,
) -> DataFrame:
    """Full §6.1 compaction applied per JSON-bearing turn document: each
    document expands against its own ``@context``, compacts back against
    the SAME context (inverse-context term selection, container maps,
    ``@reverse`` terms — kernel/compact.py), and re-expands to verify the
    expand→compact→expand fixpoint *inside the operator*
    (``roundtrip_ok``). Each document emits one row with key-class counts
    plus an md5 fingerprint of the canonical compacted JSON — a bit-exact
    pin of the whole compacted structure for the golden oracle.

    Same scale shape as extract_triples / frame_turn_entities: JVM-side
    candidate filter, 4-column pruning, map-only mapInPandas, per-worker
    context-compile cache; failing docs are skipped (quarantine is
    extract_triples' job).
    """
    import hashlib

    from ..kernel import compact_document, normalize_expanded

    contexts = contexts or ContextDict()
    bc = transcripts.sparkSession.sparkContext.broadcast(
        (contexts.raw, contexts.document_iri)
    )
    candidates = transcripts.select(
        "conv_id", "turn_idx", "text", "tool"
    ).where(_candidate_filter())

    def compacted_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raw_contexts, document_iri = bc.value
        expander = TurnExpander(raw_contexts, document_iri)

        def compact_doc(raw: str):
            try:
                doc = json.loads(raw)
            except (json.JSONDecodeError, ValueError):
                return None
            try:
                ctx_value = (
                    doc.get("@context") if isinstance(doc, Mapping) else None
                )
                if ctx_value is not None:
                    active = expander._active_context(ctx_value)
                    body = {k: v for k, v in doc.items() if k != "@context"}
                else:
                    active = Context(base=document_iri)
                    body = doc
                expanded = expand_document(expander.processor, active, body)
                # compactToRelative=False (spec option, default true): the
                # pipeline publishes absolute subject/object IRIs so
                # consumers join without needing the producer's base
                compacted = compact_document(
                    active, expanded, compact_to_relative=False
                )
                reexpanded = expand_document(
                    expander.processor, active, compacted
                )
                rt = normalize_expanded(reexpanded) == normalize_expanded(
                    expanded
                )
                return compacted, 1 if rt else 0
            except JsonLdError:
                return None

        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text, tool in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["tool"]
            ):
                for doc_idx, raw in enumerate(iter_turn_documents(text, tool)):
                    out = compact_doc(raw)
                    if out is None:
                        continue
                    compacted, rt = out
                    n_keys, n_terms, n_iris = _compacted_doc_stats(compacted)
                    fp = hashlib.md5(
                        json.dumps(
                            compacted, sort_keys=True, separators=(",", ":")
                        ).encode()
                    ).hexdigest()
                    rows.append(
                        (conv_id, int(turn_idx), doc_idx,
                         n_keys, n_terms, n_iris, rt, fp)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "doc_idx",
                    "n_keys", "n_term_keys", "n_iri_keys",
                    "roundtrip_ok", "compact_fp",
                ],
            )

    return candidates.mapInPandas(compacted_batches, schema=COMPACTED_SCHEMA)
