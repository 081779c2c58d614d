"""Structured-Streaming incremental KG ingest (SURVEY.md §2 Table B, streaming rows).

Continuous variant of the batch pipeline: new transcript files (an Iceberg
streaming read on a real deployment; a file source here — same DataFrame
surface) flow through the identical Arrow-batched extraction kernel and land
in an append-only triples sink with exactly-once file-sink semantics from
Spark's checkpoint.

Design notes, 100 TB shape:
- The extraction kernel (``extract_triples``) is stateless per-turn, so the
  streaming plan stays a stateless mapInPandas — no state store, no
  watermark needed for the transform itself.
- Late/duplicate data: ``dropDuplicatesWithinWatermark`` on
  (conv_id, turn_idx) with an event-time watermark on ``ts`` bounds state —
  the batch job's global dropDuplicates is unbounded-state in streaming and
  deliberately avoided (`withWatermark` + within-watermark dedup is the
  canonical Spark pattern for exactly-this).
- Entity linking / connected components stay batch: they are iterative
  whole-graph algorithms; the streaming layer lands raw triples and the
  batch canonicalization job periodically folds them in (classic
  lambda-free "streaming ingest + periodic batch consolidation").

Reference tie-in: the kernel applied per micro-batch is the same A1-A33
surface (see json_ld_spark/kernel/*, citing /root/reference/src/*.rs);
streaming only changes the source/sink contract, exactly as SURVEY.md
Table B marks these rows as pipeline scaffolding, not reference algorithms.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..contexts import ContextDict
from ..pipeline.extract import extract_triples

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def stream_transcript_source(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-based streaming source over transcript parquet drops.

    On a real cluster this is ``spark.readStream.format("iceberg")`` with
    ``stream-from-timestamp``; the downstream plan is identical because both
    produce the same (conv_id, turn_idx, role, text, tool, ts) rows.
    ``maxFilesPerTrigger`` bounds micro-batch size so one giant backfill
    drop cannot blow executor memory — the streaming analogue of
    ``spark.sql.files.maxPartitionBytes``.
    """
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def stream_extract_triples(
    transcripts: DataFrame,
    contexts: Optional[ContextDict] = None,
    watermark: str = "1 hour",
    dedup_within_watermark: bool = True,
) -> DataFrame:
    """Streaming plan: watermark → within-watermark turn dedup → kernel.

    Turn-level dedup runs *before* the Python boundary so replayed files
    never pay kernel CPU twice. Triple-level exact dedup is left to the
    downstream batch consolidation (global dropDuplicates would need
    unbounded state in a stream).
    """
    stream = transcripts.withWatermark("ts", watermark)
    if dedup_within_watermark:
        stream = stream.dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
    # ts must survive for the sink's event-time bookkeeping; the kernel
    # operates on the 4 pruned columns internally.
    return extract_triples(stream, contexts, dedup=False)


def windowed_turn_stats(
    transcripts: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window incremental aggregation with late-data semantics
    (SURVEY §2 Table B streaming row): per-(window, role) turn counts and
    an HLL distinct-conversation sketch.

    The same plan runs batch or streaming. In streaming append mode the
    watermark is the late-data contract: a window emits exactly once, when
    the watermark passes its end; rows arriving later than ``watermark``
    behind max event time are dropped and surface in the query progress as
    ``stateOperators[].numRowsDroppedByWatermark`` — and window state is
    freed, so state size is bounded by (watermark / window) × |roles|
    regardless of stream length. approx_count_distinct's HLL merge is
    order-independent, so stream and batch agree exactly on finalized
    windows (pinned by tests/test_streaming_ingest.py)."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("n_convs_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
            "n_convs_approx",
        )
    )


def run_windowed_stats_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    window_duration: str = "10 minutes",
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Drain ``source_dir`` through the windowed aggregation into parquet
    (append mode: only watermark-finalized windows are written)."""
    transcripts = stream_transcript_source(spark, source_dir)
    stats = windowed_turn_stats(transcripts, window_duration, watermark)
    writer = (
        stats.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_to_snapshots(
    spark: SparkSession,
    source_dir: str,
    store,
    checkpoint_dir: str,
    contexts: Optional[ContextDict] = None,
    available_now: bool = True,
    legacy_tags: bool = False,
):
    """Streaming extraction landing ATOMIC SNAPSHOTS: each micro-batch of
    triples commits as one SnapshotStore append (pipeline/snapshots.py),
    so downstream batch consolidation can pin a snapshot id and the whole
    lambda-free architecture closes: stream → snapshot commits → batch
    canonicalization pinned to a snapshot → idempotent resume.

    Exactly-once across restarts: ``foreachBatch`` can replay a batch
    after a crash; the store's tagged append (tag = query id + micro-batch
    id — batch ids alone restart at 0 if the checkpoint is wiped, which
    would make the replay guard silently drop new batches) makes the
    replay a no-op, so no double-counting even when the checkpoint and
    the sink disagree about the last committed batch.

    ``legacy_tags``: pass True exactly once when RESUMING a checkpoint
    whose batches were committed before the query id was part of the tag
    (format ``batch-N``), so the replayed head batch recognizes its
    pre-upgrade commit instead of appending a duplicate. Leave False for
    fresh checkpoints — a blanket legacy lookup would reintroduce the
    wiped-checkpoint silent-drop hazard this tag format prevents."""
    transcripts = stream_transcript_source(spark, source_dir)
    triples = stream_extract_triples(transcripts, contexts)
    query_id: list[str] = []

    def commit(batch_df, batch_id: int) -> None:
        if not query_id:
            query_id.append(_checkpoint_query_id(spark, checkpoint_dir))
        if legacy_tags and store.has_tag(f"batch-{batch_id}"):
            # committed pre-upgrade under the legacy tag format. The plan
            # upstream is STATEFUL (dropDuplicatesWithinWatermark): Spark's
            # state-store commit validation requires foreachBatch to
            # process every partition, so consume the batch before skipping
            # the append (an early return fails the micro-batch).
            batch_df.count()
            return
        store.append(batch_df, tag=f"{query_id[0]}-batch-{batch_id}")

    writer = (
        triples.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _latest_fingerprints(spark: SparkSession, fps_root: str):
    """Latest persisted fingerprint per turn (merge-on-read over the
    append-only per-commit partitions; ``None`` when no state exists).
    A periodic compaction job can rewrite the partitions to one row per
    turn without changing this reader."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(fps_root)
    except AnalysisException:
        return None
    latest = (
        df.groupBy("conv_id", "turn_idx")
        .agg(
            F.max_by(
                F.struct("graph_fp", "n_quads"), F.col("commit_seq")
            ).alias("s")
        )
        .select(
            "conv_id",
            "turn_idx",
            F.col("s.graph_fp").alias("graph_fp"),
            F.col("s.n_quads").alias("n_quads"),
        )
    )
    return latest


def run_stream_to_snapshots_with_change_feed(
    spark: SparkSession,
    source_dir: str,
    store,
    checkpoint_dir: str,
    state_dir: str,
    contexts: Optional[ContextDict] = None,
    available_now: bool = True,
    max_work: int = 400,
):
    """Streaming snapshot ingest + per-commit graph-isomorphism change
    feed (the incremental form of ``pipeline/canonical.graph_diff``).

    Each micro-batch of extracted triples:

    1. commits to the snapshot store exactly-once (same tagged-append
       guard as :func:`run_stream_to_snapshots`);
    2. fingerprints per turn (``turn_fingerprints`` — one exchange, one
       row per turn, quarantine → NULL fp);
    3. diffs against the persisted cumulative fingerprint state with
       ``graph_diff(old_fingerprints=...)`` — so a daily/continuous diff
       never re-canonicalizes history, only the new commit;
    4. writes the commit's change feed under ``state_dir/feed/`` and its
       fingerprints under ``state_dir/fps/`` (per-commit partitions).

    Feed semantics — statuses for the turns IN THIS COMMIT: ``added``
    (turn key never seen), ``changed``/``unchanged`` (isomorphism verdict
    against the turn's latest persisted fingerprint — a re-sent turn that
    merely minted fresh blank labels is ``unchanged``), ``unknown``
    (either side quarantined as too automorphic). ``removed`` is filtered
    out: a full-outer diff against cumulative state would report every
    absent historical turn as removed, which is not what an append-only
    commit feed means.

    Exactly-once: triples reuse the store's tagged commit; fingerprints
    and feed write ``mode("overwrite")`` into a deterministic per-tag
    directory, so a crash-replayed micro-batch rewrites identical bytes
    instead of duplicating state. The batch equality contract (feed ==
    batch-side ``graph_diff`` over the same two snapshots) is pinned by
    tests/test_streaming_ingest.py."""
    import os

    from ..pipeline.canonical import FPS_SCHEMA, graph_diff, turn_fingerprints

    fps_root = os.path.join(state_dir, "fps")
    feed_root = os.path.join(state_dir, "feed")
    transcripts = stream_transcript_source(spark, source_dir)
    # NO within-watermark turn dedup here, unlike run_stream_to_snapshots:
    # that dedup keys on (conv_id, turn_idx) alone, so it would drop
    # UPDATES — a re-sent turn with new payload — which are exactly what
    # the change feed exists to report. Byte-identical replays are still
    # harmless: they surface as 'unchanged' feed rows, and the tagged
    # store append stays exactly-once. Sources must deliver at most one
    # version of a turn per micro-batch (file drops do), else the turn's
    # versions would merge into one fingerprint group.
    triples = stream_extract_triples(
        transcripts, contexts, dedup_within_watermark=False
    )
    query_id: list[str] = []

    def commit(batch_df, batch_id: int) -> None:
        if not query_id:
            query_id.append(_checkpoint_query_id(spark, checkpoint_dir))
        tag = f"{query_id[0]}-batch-{batch_id}"
        batch_df = batch_df.persist()
        try:
            store.append(batch_df, tag=tag)
            new_fps = turn_fingerprints(batch_df, max_work=max_work).persist()
            try:
                old = _latest_fingerprints(spark, fps_root)
                if old is None:  # first commit: diff against empty state
                    old = spark.createDataFrame([], FPS_SCHEMA)
                feed = graph_diff(
                    None, None, old_fingerprints=old, new_fingerprints=new_fps
                ).where(F.col("status") != "removed")
                feed.write.mode("overwrite").parquet(
                    os.path.join(feed_root, f"commit={tag}")
                )
                new_fps.withColumn(
                    "commit_seq", F.lit(batch_id).cast("long")
                ).write.mode("overwrite").parquet(
                    os.path.join(fps_root, f"commit={tag}")
                )
            finally:
                new_fps.unpersist()
        finally:
            batch_df.unpersist()

    writer = (
        triples.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_to_parquet(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    contexts: Optional[ContextDict] = None,
    available_now: bool = True,
):
    """Drain ``source_dir`` into an append-only parquet triples sink.

    ``available_now=True`` processes the current backlog then stops — the
    incremental-backfill trigger; ``False`` runs continuously. Exactly-once
    comes from the file-sink commit log under ``checkpoint_dir``: a replayed
    micro-batch overwrites its own manifest entry instead of double-counting
    (the streaming analogue of ParquetManifest's atomic bucket commit).
    """
    transcripts = stream_transcript_source(spark, source_dir)
    triples = stream_extract_triples(transcripts, contexts)
    writer = (
        triples.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _checkpoint_query_id(spark: SparkSession, checkpoint_dir: str) -> str:
    """Read the streaming query id from ``<checkpoint>/metadata`` through
    the Hadoop filesystem API, so HDFS/S3/file: checkpoint locations work
    exactly like bare local paths (a driver-local ``open()`` would crash
    the first batch on any non-local scheme). foreachBatch runs
    driver-side, where the JVM gateway is available."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(checkpoint_dir, "metadata")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(path)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
    finally:
        stream.close()
    return json.loads("\n".join(lines))["id"]


def run_stream_transcripts_to_snapshots(
    spark: SparkSession,
    source_dir: str,
    store,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
    legacy_tags: bool = False,
):
    """Land RAW transcript micro-batches as atomic snapshot commits — the
    ingest half of the continuously-maintained KG: each drained batch
    becomes one tagged SnapshotStore append (tag = micro-batch id, so a
    crash-replayed batch is a no-op), and
    ``pipeline/job.run_incremental_snapshot_pipeline`` then folds the
    accumulated snapshot deltas into nodes/edges in O(delta + affected
    blocks). Stream and consolidation never share mutable state: the
    snapshot id sequence is the only coupling, which is what makes the
    composition exactly-once end-to-end.

    The idempotency tag embeds the streaming QUERY id (minted when the
    checkpoint is created, persisted in ``<checkpoint>/metadata``, stable
    across restarts of the same checkpoint): batch ids alone are scoped
    to the checkpoint directory, so a wiped or relocated checkpoint would
    restart them at 0 and the replay guard would silently discard the new
    batches as already-committed ones.

    ``legacy_tags``: pass True exactly once when RESUMING a checkpoint
    whose batches were committed before the query id was part of the tag
    (format ``transcripts-batch-N``) — the replayed head batch then
    recognizes its pre-upgrade commit instead of appending a duplicate.
    Leave False (the default) for fresh checkpoints: a blanket legacy
    lookup would reintroduce the wiped-checkpoint data-loss this tag
    format exists to prevent."""
    transcripts = stream_transcript_source(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    query_id: list[str] = []

    def commit(batch_df, batch_id: int) -> None:
        if not query_id:
            # read lazily: Spark writes the metadata file at query start,
            # before the first batch runs (foreachBatch runs driver-side)
            query_id.append(_checkpoint_query_id(spark, checkpoint_dir))
        if legacy_tags and store.has_tag(f"transcripts-batch-{batch_id}"):
            # Consume the batch before skipping the append, mirroring the
            # triples-stream variant: the transcript plan is stateless
            # TODAY, but if a watermark/dedup is ever added upstream,
            # Spark's state-store commit validation requires foreachBatch
            # to process every partition — an early return without
            # consumption would start failing micro-batches.
            batch_df.count()
            return
        store.append(
            batch_df, tag=f"transcripts-{query_id[0]}-batch-{batch_id}"
        )

    writer = (
        transcripts.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
