"""applyInPandasWithState operator tests: state survives micro-batches and
checkpoint restarts; final snapshots equal the batch ground truth."""

import os

import pytest
from pyspark.sql import functions as F

from json_ld_spark.pipeline.transcripts import synth_transcripts
from json_ld_spark.streaming.ingest import TRANSCRIPT_DDL
from json_ld_spark.streaming.stateful import conversation_stats_stream


def _batch_truth(transcripts):
    return {
        r["conv_id"]: (r["n_turns"], r["n_jsonld"])
        for r in transcripts.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(
                (
                    F.col("text").contains("<jsonld>") | F.col("tool").isNotNull()
                ).cast("long")
            ).alias("n_jsonld"),
        )
        .collect()
    }


def _latest_snapshots(df):
    rows = df.orderBy("n_turns").collect()
    return {r["conv_id"]: (r["n_turns"], r["n_jsonld_turns"]) for r in rows}


def _drain(spark, source, sink, ckpt):
    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", "1")  # force one micro-batch per file
        .parquet(source)
    )
    q = (
        conversation_stats_stream(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive


def test_state_accumulates_across_batches_and_restarts(spark, sf_dir, tmp_path):
    source = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(source)

    transcripts = synth_transcripts(spark, sf_dir)
    # split one corpus into 2 files → 2 micro-batches in the first drain
    part = F.pmod(F.col("turn_idx"), F.lit(2))
    for i in (0, 1):
        transcripts.where(part == i).coalesce(1).write.mode("append").parquet(source)
    _drain(spark, source, sink, ckpt)

    truth = _batch_truth(transcripts)
    got = _latest_snapshots(spark.read.parquet(sink))
    assert got == truth  # state carried across the 2 micro-batches

    # restart with more data for the SAME conversations → state restored
    # from the checkpoint, not recomputed from zero
    extra = transcripts.limit(400).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")
    )
    extra.coalesce(1).write.mode("append").parquet(source)
    _drain(spark, source, sink, ckpt)

    combined = transcripts.unionByName(extra)
    got2 = _latest_snapshots(spark.read.parquet(sink))
    assert got2 == _batch_truth(combined)
