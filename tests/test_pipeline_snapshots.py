"""Snapshot-store semantics + snapshot-pinned resume (SURVEY §2 S1/K1).

The ParquetSnapshotStore is the sandbox stand-in for the Iceberg surface —
same contract (atomic append commit, snapshot-pinned read); the
IcebergSnapshotStore methods are thin veneers over the public Iceberg API
and need a catalog on the classpath (documented spark-submit conf in
pipeline/snapshots.py), so they are not executable here.
"""

import pytest
from pyspark.sql import functions as F

from json_ld_spark.pipeline.job import run_snapshot_pipeline
from json_ld_spark.pipeline.manifest import ParquetManifest
from json_ld_spark.pipeline.snapshots import ParquetSnapshotStore
from json_ld_spark.pipeline.transcripts import synth_transcripts


def _sorted_triples(df):
    return sorted(
        tuple(r)
        for r in df.select(
            "conv_id", "turn_idx", "subj", "pred", "obj_kind", "obj_value",
            "obj_type", "obj_lang", "obj_direction", "graph", "error_code",
        ).collect()
    )


def test_snapshot_store_append_read_pin(spark, tmp_path):
    store = ParquetSnapshotStore(spark, str(tmp_path / "store"))
    assert store.current_snapshot_id() is None
    with pytest.raises(ValueError):
        store.read()

    a = spark.range(10).select(F.col("id").alias("v"))
    sid1 = store.append(a)
    assert sid1 == 1
    assert store.current_snapshot_id() == 1
    assert store.read().count() == 10

    b = spark.range(10, 25).select(F.col("id").alias("v"))
    sid2 = store.append(b)
    assert sid2 == 2
    # pinned read sees exactly the first commit; latest sees the union
    assert store.read(sid1).count() == 10
    assert store.read().count() == 25
    assert store.read(sid2).count() == 25
    with pytest.raises(ValueError):
        store.read(99)


def test_orphan_data_invisible_without_commit(spark, tmp_path):
    """A crash between data write and snapshot commit must leave the store
    unchanged for readers — the atomic-commit guarantee."""
    import os

    store = ParquetSnapshotStore(spark, str(tmp_path / "store2"))
    store.append(spark.range(5).select(F.col("id").alias("v")))
    # simulate a crashed append: data dir exists, no snapshot references it
    orphan = os.path.join(store.data_dir, "orphan000000")
    spark.range(100).select(F.col("id").alias("v")).write.parquet(orphan)
    assert store.read().count() == 5
    assert store.current_snapshot_id() == 1


def test_stream_commits_snapshots_exactly_once(spark, sf_dir, tmp_path):
    """Streaming → snapshot-store loop: micro-batches land as atomic
    snapshot commits; a re-drain on the same checkpoint adds nothing; a
    direct replayed append with a committed tag is a no-op."""
    import os

    from json_ld_spark.pipeline.extract import extract_triples
    from json_ld_spark.pipeline.snapshots import ParquetSnapshotStore
    from json_ld_spark.streaming.ingest import run_stream_to_snapshots

    source = str(tmp_path / "src")
    os.makedirs(source)
    transcripts = synth_transcripts(spark, sf_dir)
    transcripts.coalesce(1).write.mode("append").parquet(source)

    store = ParquetSnapshotStore(spark, str(tmp_path / "snapstore"))
    q = run_stream_to_snapshots(
        spark, source, store, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(300)
    assert not q.isActive

    n_snaps = store.current_snapshot_id()
    assert n_snaps is not None and n_snaps >= 1
    got = store.read().count()
    want = extract_triples(transcripts, dedup=False).count()
    assert got == want

    # re-drain: committed backlog → no new snapshots, same rows
    q2 = run_stream_to_snapshots(
        spark, source, store, str(tmp_path / "ckpt"), available_now=True
    )
    q2.awaitTermination(300)
    assert store.current_snapshot_id() == n_snaps
    assert store.read().count() == want

    # simulated foreachBatch replay: re-appending under an already-
    # committed tag (query-id-scoped since the wiped-checkpoint fix) is a
    # no-op returning the original snapshot id
    committed_tags = [
        s["tag"] for s in store._snapshots() if s.get("tag")
    ]
    assert committed_tags and all(
        "-batch-" in t for t in committed_tags
    ), committed_tags
    replay = store.append(
        extract_triples(transcripts, dedup=False), tag=committed_tags[0]
    )
    assert replay <= n_snaps
    assert store.current_snapshot_id() == n_snaps
    assert store.has_tag(committed_tags[0])
    assert not store.has_tag("no-such-tag")


def test_resume_pins_input_snapshot(spark, sf_dir, tmp_path):
    """Kill after 2 buckets, append NEW data to the store, resume: the
    resumed run must re-read the pinned snapshot, so the final triples
    equal an uninterrupted run over snapshot 1 — the new append is
    invisible until a fresh run starts."""
    store = ParquetSnapshotStore(spark, str(tmp_path / "store3"))
    transcripts = synth_transcripts(spark, sf_dir)
    store.append(transcripts)

    # uninterrupted baseline over snapshot 1
    base = run_snapshot_pipeline(spark, store, str(tmp_path / "w_base"), 4)
    golden = _sorted_triples(base.triples)

    # crash after 2 buckets
    w = str(tmp_path / "w_pin")
    with pytest.raises(RuntimeError, match="fault injection"):
        run_snapshot_pipeline(spark, store, w, 4, fail_after_bucket=2)

    # new data lands between crash and resume
    extra = transcripts.withColumn(
        "conv_id", F.concat(F.lit("late-"), F.col("conv_id"))
    )
    store.append(extra)
    assert store.current_snapshot_id() == 2

    resumed = run_snapshot_pipeline(spark, store, w, 4)
    assert _sorted_triples(resumed.triples) == golden  # no late- rows
    manifest = ParquetManifest(spark, w, 4).read_manifest()
    sids = {r.snapshot_id for r in manifest.collect()}
    assert sids == {"1"}

    # a FRESH run (new warehouse) picks up snapshot 2
    fresh = run_snapshot_pipeline(spark, store, str(tmp_path / "w_fresh"), 4)
    assert len(_sorted_triples(fresh.triples)) == 2 * len(golden)


def test_append_tag_charset_validated(spark, tmp_path):
    """Both stores share one tag contract: a tag that could break out of a
    SQL literal (IcebergSnapshotStore interpolates it into a metadata
    query) is rejected before any write."""
    store = ParquetSnapshotStore(spark, str(tmp_path / "store_tag"))
    df = spark.range(1).selectExpr(
        "cast(id as string) conv_id", "cast(id as int) turn_idx",
        "'user' role", "'x' text", "cast(null as string) tool",
        "current_timestamp() ts",
    )
    with pytest.raises(ValueError, match="snapshot tag"):
        store.append(df, tag="bad'tag; DROP")
    assert store.current_snapshot_id() is None  # nothing committed
    assert store.append(df, tag="batch-0.retry:1_ok") == 1


def test_incremental_pipeline_over_snapshots(spark, sf_dir, tmp_path):
    """Bootstrap on snapshot 1, append a delta, incremental run: nodes and
    edges must equal a from-scratch pipeline over the full table."""
    from json_ld_spark.pipeline.entity import canonicalize
    from json_ld_spark.pipeline.extract import extract_triples
    from json_ld_spark.pipeline.job import run_incremental_snapshot_pipeline

    store = ParquetSnapshotStore(spark, str(tmp_path / "inc_store"))
    t1 = synth_transcripts(spark, sf_dir)
    store.append(t1)
    w = str(tmp_path / "inc_wh")

    boot = run_incremental_snapshot_pipeline(spark, store, w)
    assert boot.buckets_processed == 1
    n_nodes_1 = boot.nodes.count()

    delta = spark.createDataFrame(
        [
            (
                "conv-new", 0, "tool", "tool call",
                '{"@id":"http://ex.org/a/person-3",'
                '"http://schema.org/name":"alias",'
                '"http://schema.org/knows":{"@id":"http://ex.org/person-4"}}',
            )
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.current_timestamp())
    store.append(delta)

    inc = run_incremental_snapshot_pipeline(spark, store, w)
    assert inc.buckets_processed == 1

    full_triples = extract_triples(store.read(), dedup_turns=True)
    _, full_nodes, full_edges = canonicalize(full_triples, materialize=True)

    def rows(df, cols):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    cols_n = ["canon_id", "iri", "kind", "n_aliases"]
    cols_e = ["src_canon", "pred", "dst_canon", "provenance"]
    assert rows(inc.nodes, cols_n) == rows(full_nodes, cols_n)
    assert rows(inc.edges, cols_e) == rows(full_edges, cols_e)
    assert inc.nodes.count() >= n_nodes_1

    # third run with no new snapshot: clean no-op
    noop = run_incremental_snapshot_pipeline(spark, store, w)
    assert noop.buckets_processed == 0
