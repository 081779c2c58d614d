"""End-to-end KG-construction job (SURVEY.md §3.4 lifecycle).

    transcripts → [resume filter] → salted repartition → mapInPandas kernel
    → dedup → manifest commit per bucket → entity linking → CC → nodes/edges

Run via ``spark-submit --py-files`` (see bench.py / scripts). The job is
idempotent: killed after bucket k, a re-run processes only pending buckets
and the final triples table is identical (tests/test_pipeline_resume.py).
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
) -> JobResult:
    """Bucket-wise extraction with manifest commit + resume.

    ``fail_after_bucket`` is the fault-injection hook for the resume test
    (FIXTURES.md §5.2).
    """
    run_id = uuid.uuid4().hex[:12]
    manifest = ParquetManifest(spark, warehouse, n_buckets)
    pending = manifest.pending_buckets()

    bucketed = transcripts.withColumn(
        "__bucket", bucket_of(F.col("conv_id"), n_buckets)
    )
    processed = 0
    for bucket in pending:
        part = bucketed.where(F.col("__bucket") == bucket).drop("__bucket")
        input_rows = part.count()
        triples = extract_triples(part, contexts)
        manifest.commit_bucket(run_id, bucket, triples, input_rows)
        processed += 1
        if fail_after_bucket is not None and processed > fail_after_bucket:
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
