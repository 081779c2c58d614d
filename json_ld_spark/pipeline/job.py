"""End-to-end KG-construction job (SURVEY.md §3.4 lifecycle).

    transcripts → [resume filter] → turn dedup → mapInPandas kernel
    → single partitioned write → per-bucket manifest commit
    → entity linking → CC → nodes/edges

Run via ``spark-submit --py-files`` (see bench.py / scripts). The job is
idempotent: killed after bucket k's manifest commit, a re-run processes only
pending buckets and the final triples table is identical
(tests/test_pipeline_resume.py).

Scale shape (the round-1 design rescanned the full input once per bucket —
2 × n_buckets source scans and zero inter-bucket parallelism; at 100 TB
that is the difference between 1 pass and 32):

1. ONE extraction job writes every pending bucket via
   ``partitionBy("bucket")`` with dynamic partition overwrite — all buckets
   extract in parallel, the source is scanned exactly once, and committed
   buckets' directories are never touched. Per-bucket input-row counts ride
   the same action as ``observe()`` counters (round 2 paid a separate count
   job — a second full source scan).
2. ONE grouped metrics job aggregates clean/error/checksum for every
   written bucket directory (round 2 ran 3 jobs per bucket,
   driver-serially — the job-launch-latency wall at 10^3+ buckets).
3. A driver-side loop then writes only the tiny atomic manifest rows. The
   manifest row remains the commit point, so resume granularity is still
   per-bucket: a crash mid-loop leaves later buckets pending, and the
   re-run's dynamic overwrite of those partitions is idempotent.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..contexts import ContextDict
from .entity import canonicalize
from .extract import extract_triples
from .manifest import ParquetManifest, bucket_of
from .transcripts import synth_transcripts


@dataclass
class JobResult:
    run_id: str
    buckets_processed: int
    triples: DataFrame
    nodes: Optional[DataFrame] = None
    edges: Optional[DataFrame] = None


def run_extraction_job(
    spark: SparkSession,
    transcripts: DataFrame,
    warehouse: str,
    n_buckets: int = 16,
    contexts: Optional[ContextDict] = None,
    fail_after_bucket: Optional[int] = None,
    with_entity_layer: bool = False,
    snapshot_id: Optional[str] = None,
) -> JobResult:
    """Single-pass bucketed extraction with manifest commit + resume.

    ``fail_after_bucket`` is the fault-injection hook for the resume test
    (FIXTURES.md §5.2): it raises after exactly that many manifest commits,
    leaving the remaining buckets pending (their data is written but
    uncommitted — exactly the crash-mid-commit window the resume path must
    handle).
    """
    from pyspark.sql import Observation

    run_id = uuid.uuid4().hex[:12]
    manifest = ParquetManifest(spark, warehouse, n_buckets)
    pending = manifest.pending_buckets()
    if not pending:
        # no-op resume: extraction is complete, but the derived node/edge
        # tables must still be (re)computed when requested — returning
        # nodes=None here would crash re-runs of the production entrypoint
        result = JobResult(run_id, 0, manifest.read_triples())
        if with_entity_layer:
            _, result.nodes, result.edges = canonicalize(result.triples)
        return result

    bucketed = transcripts.withColumn(
        "bucket", bucket_of(F.col("conv_id"), n_buckets)
    ).where(F.col("bucket").isin(pending))

    # per-bucket input-row counts ride the extraction action itself via
    # observe() — map-side conditional counters collected while the write
    # job runs, so the source is scanned exactly ONCE (the round-2 shape
    # paid a separate count job = a second full scan). One counter per
    # pending bucket is fine for the Iceberg-typical 16–1024 bucket range;
    # a 10^4+ bucket spec would batch commits into counter groups instead.
    obs = Observation(f"input_rows_{run_id}")
    bucketed = bucketed.observe(
        obs,
        *[
            F.sum(F.when(F.col("bucket") == b, 1).otherwise(0))
            .cast("long")
            .alias(f"b{b}")
            for b in pending
        ],
    )

    # the one extraction job — extract + write ALL pending buckets in one
    # pass. The bucket column is a pure function of conv_id, so it is
    # re-derived on the kernel output rather than threaded through the
    # Arrow boundary. dedup_turns=True enforces the (conv_id, turn_idx)
    # uniqueness precondition of the in-kernel triple dedup on this batch
    # path (replayed/retried turn rows are common in real transcript
    # corpora).
    triples = extract_triples(
        bucketed, contexts, dedup_turns=True
    ).withColumn("bucket", bucket_of(F.col("conv_id"), n_buckets))
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        triples.write.partitionBy("bucket").mode("overwrite").parquet(
            manifest.triples_dir
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    observed = obs.get
    # sum() over zero rows observes NULL, not 0 — normalize (the
    # all-pending-buckets-empty resume case)
    input_rows = {b: observed[f"b{b}"] or 0 for b in pending}

    # ONE grouped metrics job over every written bucket directory, then a
    # driver loop that only writes the tiny atomic manifest rows — commit
    # granularity (and the crash window fail_after_bucket simulates) is
    # still per-bucket.
    stats = manifest.bucket_stats(pending)
    processed = 0
    for bucket in pending:
        manifest.commit_bucket(
            run_id, bucket, input_rows.get(bucket, 0), stats.get(bucket),
            snapshot_id,
        )
        processed += 1
        if fail_after_bucket is not None and processed >= fail_after_bucket:
            raise RuntimeError(f"fault injection after bucket {bucket}")

    all_triples = manifest.read_triples()
    result = JobResult(run_id, processed, all_triples)
    if with_entity_layer:
        _, nodes, edges = canonicalize(all_triples)
        result.nodes = nodes
        result.edges = edges
    return result


def run_full_pipeline(
    spark: SparkSession,
    sf_dir: str,
    warehouse: str,
    n_buckets: int = 16,
) -> JobResult:
    transcripts = synth_transcripts(spark, sf_dir)
    return run_extraction_job(
        spark, transcripts, warehouse, n_buckets, with_entity_layer=True
    )


def run_snapshot_pipeline(
    spark: SparkSession,
    store,
    warehouse: str,
    n_buckets: int = 16,
    fail_after_bucket: Optional[int] = None,
) -> JobResult:
    """Extraction job over a SnapshotStore (pipeline/snapshots.py) with the
    input snapshot PINNED across resume: the first run records the store's
    current snapshot id in every manifest row; a resumed run re-reads that
    same snapshot, so appends committed between crash and resume cannot
    leak into this run's output (north rule: resume idempotently from the
    last committed snapshot). A later fresh run (new warehouse) picks up
    the newer snapshot."""
    manifest = ParquetManifest(spark, warehouse, n_buckets)
    pinned = manifest.pinned_snapshot()
    if pinned is None:
        current = store.current_snapshot_id()
        if current is None:
            raise ValueError("snapshot store is empty")
        pinned = str(current)
    transcripts = store.read(int(pinned))
    return run_extraction_job(
        spark,
        transcripts,
        warehouse,
        n_buckets,
        fail_after_bucket=fail_after_bucket,
        snapshot_id=pinned,
    )


def run_incremental_snapshot_pipeline(
    spark: SparkSession,
    store,
    warehouse: str,
    contexts: Optional[ContextDict] = None,
    fail_before_state_swap: bool = False,
) -> JobResult:
    """Append-incremental entity layer over a SnapshotStore: the first run
    bootstraps (full extraction + canonicalization); each later run
    extracts ONLY the snapshot delta (``store.read_delta``), re-runs CC
    only for blocks a new entity touches and re-aggregates only the edge
    groups a changed canon touches (``entity.incremental_canonicalize``).
    State (triples/entities/canon/edges parquet + the last processed
    snapshot id) lives under ``warehouse/entity_state`` with the same
    write-tmp-then-rename commit the manifest uses.

    At 10^12 turns this turns a snapshot append from "re-run the CC loop
    over every entity and two rewrite joins over every triple" into
    O(delta + affected blocks) — the only full-corpus work left is the
    semi-join-filtered old-triple scan for changed canons.
    """
    import json as _json
    import os

    from .entity import canonicalize, entity_dictionary, incremental_canonicalize

    state_dir = os.path.join(warehouse, "entity_state")
    os.makedirs(state_dir, exist_ok=True)
    meta_path = os.path.join(state_dir, "state.json")
    current = store.current_snapshot_id()
    if current is None:
        raise ValueError("snapshot store is empty")

    def _meta() -> Optional[dict]:
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as fh:
            return _json.load(fh)

    meta = _meta()
    cur_version = meta["version"] if meta else 0

    def _p(name: str, version: Optional[int] = None) -> str:
        v = cur_version if version is None else version
        return os.path.join(state_dir, f"v{v}", name)

    def _commit_state(triples, entities, canon, nodes, edges, snapshot_id):
        # crash-atomic versioned commit: the ENTIRE new state lands under a
        # fresh v<N+1> directory while the previous version stays intact
        # (the new DataFrames are lazy plans READING the old state), then
        # ONE os.replace of state.json — the single atomic commit point —
        # flips the pointer. A crash anywhere before the pointer swap
        # leaves v<N> authoritative and v<N+1> an invisible orphan, so the
        # next run re-applies the delta against the OLD state exactly once
        # (no duplicated triples / double-counted provenance, unlike a
        # dir-by-dir rename sequence). Old versions are pruned only after
        # the swap, best-effort.
        import shutil

        new_version = cur_version + 1
        for name, df in (
            ("triples", triples), ("entities", entities), ("canon", canon),
            ("nodes", nodes), ("edges", edges),
        ):
            df.write.mode("overwrite").parquet(_p(name, new_version))
        tmp_meta = meta_path + ".tmp"
        with open(tmp_meta, "w") as fh:
            _json.dump(
                {"snapshot_id": snapshot_id, "version": new_version}, fh
            )
        if fail_before_state_swap:
            # fault injection for the crash-window test: the full new state
            # is on disk but the pointer never flips — the old version must
            # stay authoritative and the re-run applies the delta once
            raise RuntimeError("fault injection before state pointer swap")
        os.replace(tmp_meta, meta_path)  # atomic commit point
        for entry in os.listdir(state_dir):
            if entry.startswith("v") and entry != f"v{new_version}":
                shutil.rmtree(os.path.join(state_dir, entry), ignore_errors=True)
        return new_version

    run_id = uuid.uuid4().hex[:12]
    if meta is None:
        # bootstrap: full pipeline over the current snapshot. The kernel
        # pass is the job's most expensive stage — checkpoint it once so
        # canonicalize / entity_dictionary / the state write don't each
        # re-run extraction from scratch.
        triples = extract_triples(
            store.read(current), contexts, dedup_turns=True
        ).localCheckpoint()
        canon_map, nodes, edges = canonicalize(triples)
        canon = canon_map.select(
            F.col("id").alias("iri"), F.col("component").alias("canon_id")
        )
        entities = entity_dictionary(
            triples.where(F.col("error_code").isNull())
        )
        v = _commit_state(triples, entities, canon, nodes, edges, current)
        return JobResult(
            run_id, 1, spark.read.parquet(_p("triples", v)),
            spark.read.parquet(_p("nodes", v)),
            spark.read.parquet(_p("edges", v)),
        )

    last = meta["snapshot_id"]
    if current == last:
        return JobResult(
            run_id, 0, spark.read.parquet(_p("triples")),
            spark.read.parquet(_p("nodes")), spark.read.parquet(_p("edges")),
        )

    old_triples = spark.read.parquet(_p("triples"))
    new_triples = extract_triples(
        store.read_delta(last, current), contexts, dedup_turns=True
    ).localCheckpoint()
    entities, canon, nodes, edges = incremental_canonicalize(
        old_triples,
        new_triples,
        spark.read.parquet(_p("entities")),
        spark.read.parquet(_p("canon")),
        spark.read.parquet(_p("edges")),
    )
    all_triples = old_triples.unionByName(new_triples)
    v = _commit_state(all_triples, entities, canon, nodes, edges, current)
    return JobResult(
        run_id, 1, spark.read.parquet(_p("triples", v)),
        spark.read.parquet(_p("nodes", v)), spark.read.parquet(_p("edges", v)),
    )
