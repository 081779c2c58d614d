"""Physical-plan regression tests (SURVEY §4 discipline).

Pins the scale-critical plan properties the round reviews audit by hand:
pruned scans, no accidental nested-loop joins, map-only extraction, no
row-at-a-time Python anywhere. A refactor that silently degrades a plan
(e.g. re-introduces a forced broadcast, un-prunes a scan, or drops the
candidate-filter pushdown) fails here, not at 100 TB.
"""

import re

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as e

    return e


def test_extraction_is_map_only(spark, sf_dir, entrymod):
    """Flagship extraction: single Python stage, no exchange before the
    kernel (the only exchange allowed is the output sort), pruned scan."""
    from json_ld_spark.pipeline.extract import extract_triples
    from json_ld_spark.pipeline.transcripts import synth_transcripts

    # other tests cache the transcript plan fragment; a cache hit replaces
    # the parquet scan with InMemoryTableScan and hides ReadSchema
    spark.catalog.clearCache()
    plan = _plan(extract_triples(synth_transcripts(spark, sf_dir)))
    assert len(re.findall(r"\bExchange\b", plan)) == 0, plan
    assert plan.count("MapInPandas") == 1
    # column pruning reaches the parquet scan: only doc_id + text read
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert scans and all(len(s.split(",")) <= 2 for s in scans), scans


def test_no_nested_loop_joins_anywhere(spark, sf_dir, entrymod):
    """Cartesian/broadcast-nested-loop joins are O(n·m) scans — none of
    the driver queries may contain one (the exact-kNN baseline's bounded
    crossJoin against a LessThan-filtered query side is the one declared
    exception)."""
    for name, fn in entrymod.queries().items():
        plan = _plan(fn(spark, sf_dir))
        if name == "sim_cosine_topk":
            continue  # declared exact-verification baseline, bounded query side
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_no_row_at_a_time_python(spark, sf_dir, entrymod):
    """input_hint bans per-row Python: only Arrow-batched operators
    (MapInPandas / FlatMapGroupsInPandas / ArrowEvalPython) may appear —
    never BatchEvalPython (pickled row-at-a-time UDF)."""
    for name, fn in entrymod.queries().items():
        plan = _plan(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, name


def test_dims_broadcast_facts_not(spark, sf_dir, entrymod):
    """Join-strategy sanity on representative queries: small dims
    broadcast; the unbounded entity dictionary is NOT force-broadcast
    (already pinned harder in test_pipeline_entity, re-checked here at
    default conf where AQE may legitimately pick broadcast)."""
    plan = _plan(entrymod.queries()["rel_nation_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 2, plan  # supplier + nation
    assert "SortMergeJoin" not in plan, plan


def test_pack_chunks_single_shuffle_no_python(spark, sf_dir, entrymod):
    plan = _plan(entrymod.queries()["train_pack_chunks"](spark, sf_dir))
    assert "MapInPandas" not in plan and "EvalPython" not in plan, plan
    # one shuffle by pack_group + the output sort — nothing else
    assert len(re.findall(r"\bExchange\b", plan)) <= 2, plan
