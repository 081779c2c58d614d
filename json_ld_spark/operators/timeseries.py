"""Time-series operators Spark lacks natively: bounded range join and
hypertable-style gap-filled downsampling.

``bucketed_range_join`` — the classic "range join" (interval
containment over a shared key). Spark compiles a raw range predicate
``l.k = r.k AND r.ts BETWEEN l.ts+lo AND l.ts+hi`` into a SortMergeJoin
on the key with the WHOLE range residual evaluated per key-group — for
a hot key that is O(L_key * R_key) comparisons, the quadratic blowup
commercial engines patch with range-join hints. This operator does the
standard bucketing decomposition instead: quantize time into buckets of
the window's width, explode each left row into the (at most
``ceil(span/width)+1``, here 2) buckets its window touches, equi-join
on (key, bucket), then apply the exact residual. The join becomes a
plain hash/sort-merge equi-join whose per-task work is bounded by
bucket population, not key population — the shape that survives a
10^12-row events table with hot users. Matches are exact (the residual
re-checks the true bounds); the bucket fan-out only bounds candidates.

``time_bucket_gapfill`` — TimescaleDB's ``time_bucket_gapfill``
semantics: aggregate per (key, bucket) AND materialize empty buckets
with zero/default rows over each key's [min, max] activity span. Dense
time series are what downstream windowing/feature code wants; the fill
is ``sequence()`` + ``explode`` (JVM-side range generation, no Python,
no driver loop) left-joined against the sparse aggregate. Fill rows are
bounded by span/width per key — explicit, predictable output sizing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    min_delta: int,
    max_delta: int,
) -> DataFrame:
    """Inner range join: every (left, right) pair sharing ``on`` with
    ``right_ts`` in ``[left_ts + min_delta, left_ts + max_delta]``
    (seconds, both bounds inclusive). Returns all left columns plus all
    right non-key columns; names must not collide.

    Bucket width = window span, so each left row explodes into at most
    2 buckets — constant fan-out regardless of window size.
    """
    if max_delta < min_delta:
        raise ValueError("max_delta < min_delta")
    on = list(on)
    overlap = {c for c in right.columns if c not in on} & {
        c for c in left.columns if c not in on
    }
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    width = max(max_delta - min_delta, 1)

    l_epoch = F.unix_timestamp(F.col(left_ts))
    r_epoch = F.unix_timestamp(F.col(right_ts))
    lo_bucket = F.floor((l_epoch + F.lit(min_delta)) / F.lit(width))
    hi_bucket = F.floor((l_epoch + F.lit(max_delta)) / F.lit(width))
    l_exploded = left.withColumn(
        "__bucket", F.explode(F.sequence(lo_bucket, hi_bucket))
    )
    r_bucketed = right.withColumn("__bucket", F.floor(r_epoch / F.lit(width)))

    joined = l_exploded.join(r_bucketed, on + ["__bucket"])
    # exact residual: the buckets only bound candidates
    l_epoch_j = F.unix_timestamp(F.col(left_ts))
    r_epoch_j = F.unix_timestamp(F.col(right_ts))
    return joined.where(
        (r_epoch_j >= l_epoch_j + F.lit(min_delta))
        & (r_epoch_j <= l_epoch_j + F.lit(max_delta))
    ).drop("__bucket")


def time_bucket_gapfill(
    df: DataFrame,
    on: Sequence[str],
    ts: str,
    width: int,
    aggs: Sequence,
    fills: Sequence,
) -> DataFrame:
    """Per (``on``, bucket) aggregation with empty buckets materialized.

    ``width`` is the bucket size in seconds; ``bucket_start`` in the
    output is the bucket's inclusive start as a timestamp. ``aggs`` are
    aggregate Columns (aliased); ``fills`` are the same-order, same-alias
    literal Columns substituted on gap rows (e.g. ``F.lit(0).alias("n")``
    for a count). Buckets span each key's own [min, max] activity range —
    keys never overlap into each other's quiet eras, keeping fill output
    at sum-of-spans, not n_keys * global_span.
    """
    on = list(on)
    aggs, fills = list(aggs), list(fills)
    if len(aggs) != len(fills):
        # zip() below would silently truncate to the shorter list and
        # DROP aggregate columns from the output — fail loudly instead
        raise ValueError(
            f"aggs ({len(aggs)}) and fills ({len(fills)}) must pair up 1:1"
        )
    bucket = F.floor(F.unix_timestamp(F.col(ts)) / F.lit(width))
    # sparse feeds spans AND the final left join: localCheckpoint so an
    # expensive upstream lineage (plus this groupBy) executes once, not
    # twice — the same lineage-cut discipline as the graph operators.
    sparse = (
        df.withColumn("__bucket", bucket)
        .groupBy(*on, "__bucket")
        .agg(*aggs)
        .localCheckpoint()
    )
    spans = sparse.groupBy(*on).agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    dense = spans.select(
        *on,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("__bucket"),
    )
    agg_names = [sparse.schema[i + len(on) + 1].name
                 for i in range(len(aggs))]
    # explicit presence marker: a legitimate NULL aggregate on a present
    # bucket (e.g. sum of all-null values) must not read as a gap
    sparse = sparse.withColumn("__present", F.lit(True))
    filled = dense.join(sparse, on + ["__bucket"], "left").select(
        *on,
        F.timestamp_seconds(F.col("__bucket") * F.lit(width)).alias(
            "bucket_start"
        ),
        F.col("__present").isNull().alias("gap_filled"),
        *[
            F.coalesce(F.col(name), fill).alias(name)
            for name, fill in zip(agg_names, fills)
        ],
    )
    return filled
