"""Custom stateful streaming operator: per-conversation running stats.

SURVEY.md §2 Table B marks stateful ops as the `applyInPandasWithState`
surface; this is the concrete instance: as transcript turns stream in, each
conversation's state (turn count, JSON-LD-bearing turn count, max ts seen)
is maintained in the state store and an updated snapshot row is emitted per
group per micro-batch.

Scale design: state is keyed by conv_id — the same key the transcripts are
hash-partitioned on — so the state store shards evenly except for hot
conversations, which the upstream salted repartition splits before this
operator (a salted conv produces per-salt partial states; the downstream
batch consolidation sums them, mirroring two-phase aggregation).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

STATS_OUTPUT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("n_turns", LongType()),
    StructField("n_jsonld_turns", LongType()),
    StructField("max_ts_epoch", LongType()),
])

STATS_STATE_SCHEMA = StructType([
    StructField("n_turns", LongType()),
    StructField("n_jsonld_turns", LongType()),
    StructField("max_ts_epoch", LongType()),
])


def _update_conv_stats(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_turns, n_jsonld, max_ts = state.get
    else:
        n_turns, n_jsonld, max_ts = 0, 0, 0
    for pdf in pdfs:
        n_turns += len(pdf)
        has_json = pdf["text"].fillna("").str.contains("<jsonld>", regex=False)
        n_jsonld += int((has_json | pdf["tool"].notna()).sum())
        if len(pdf):
            batch_max = int(pdf["ts"].astype("int64").max() // 10**9)
            max_ts = max(max_ts, batch_max)
    state.update((n_turns, n_jsonld, max_ts))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "n_jsonld_turns": [n_jsonld],
            "max_ts_epoch": [max_ts],
        }
    )


def conversation_stats_stream(transcripts: DataFrame) -> DataFrame:
    """Streaming per-conversation running stats (update-per-batch rows).

    In append mode each emitted row is the group's running snapshot as of
    the micro-batch that touched it; the latest row per conv_id (highest
    n_turns) is the current state.
    """
    return transcripts.groupBy("conv_id").applyInPandasWithState(
        _update_conv_stats,
        outputStructType=STATS_OUTPUT_SCHEMA,
        stateStructType=STATS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
