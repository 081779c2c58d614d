"""Bucketed range join + gap-filled downsampling (operators/timeseries.py)."""

import datetime as dt

import pytest


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


def test_range_join_exact_bounds_and_fanout(spark):
    from json_ld_spark.operators.timeseries import bucketed_range_join

    left = spark.createDataFrame(
        [(1, _ts(10), 100), (2, _ts(10), 101)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(4, 59), 200),   # 301s before: outside [-300, 0]
            (1, _ts(5), 201),       # exactly -300: inclusive lower bound
            (1, _ts(8), 202),       # inside
            (1, _ts(10), 203),      # exactly 0: inclusive upper bound
            (1, _ts(10, 1), 204),   # after: outside
            (2, _ts(9), 205),       # other key
        ],
        "k long, rts timestamp, rid long",
    )
    out = bucketed_range_join(
        left, right, ["k"], "ts", "rts", min_delta=-300, max_delta=0
    )
    pairs = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert pairs == [(100, 201), (100, 202), (100, 203), (101, 205)]


def test_range_join_matches_raw_predicate(spark):
    # bucket decomposition == raw theta join on dense synthetic data
    from json_ld_spark.operators.timeseries import bucketed_range_join
    import pyspark.sql.functions as F

    rows = [
        (i % 3, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i * 137), i)
        for i in range(120)
    ]
    left = spark.createDataFrame(rows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        [(k, t, i + 1000) for k, t, i in rows],
        "k long, rts timestamp, rid long",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in bucketed_range_join(
            left, right, ["k"], "ts", "rts", -400, 250
        ).collect()
    )
    raw = sorted(
        (r["lid"], r["rid"])
        for r in left.join(right, "k")
        .where(
            (F.unix_timestamp("rts") >= F.unix_timestamp("ts") - 400)
            & (F.unix_timestamp("rts") <= F.unix_timestamp("ts") + 250)
        )
        .collect()
    )
    assert got == raw and len(got) >= 120


def test_range_join_rejects_bad_bounds(spark):
    from json_ld_spark.operators.timeseries import bucketed_range_join

    df = spark.createDataFrame([(1, _ts(0), 1)], "k long, ts timestamp, x long")
    with pytest.raises(ValueError, match="max_delta"):
        bucketed_range_join(
            df, df.withColumnRenamed("x", "y"), ["k"], "ts", "ts", 5, -5
        )


def test_gapfill_materializes_empty_buckets_per_key_span(spark):
    from json_ld_spark.operators.timeseries import time_bucket_gapfill
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            ("u1", dt.datetime(2024, 1, 1, 0, 0, 30), 1.0),
            ("u1", dt.datetime(2024, 1, 1, 0, 0, 40), 2.0),
            ("u1", dt.datetime(2024, 1, 1, 0, 3, 10), 4.0),  # 2-min gap
            ("u2", dt.datetime(2024, 1, 1, 5, 0, 0), 8.0),   # single bucket
        ],
        "user string, ts timestamp, v double",
    )
    out = time_bucket_gapfill(
        df,
        ["user"],
        "ts",
        60,
        aggs=[F.count("*").alias("n"), F.sum("v").alias("total")],
        fills=[F.lit(0).cast("long"), F.lit(0.0)],
    )
    rows = {
        (r["user"], r["bucket_start"].minute): (
            r["gap_filled"], r["n"], r["total"]
        )
        for r in out.collect()
    }
    # u1 spans minutes 0..3 -> 4 buckets, two of them filled
    assert rows[("u1", 0)] == (False, 2, 3.0)
    assert rows[("u1", 1)] == (True, 0, 0.0)
    assert rows[("u1", 2)] == (True, 0, 0.0)
    assert rows[("u1", 3)] == (False, 1, 4.0)
    # u2's span is its own single bucket — no bleed into u1's range
    assert [k for k in rows if k[0] == "u2"] == [("u2", 0)]
    assert rows[("u2", 0)] == (False, 1, 8.0)


def test_gapfill_present_bucket_with_null_agg_not_marked_gap(spark):
    from json_ld_spark.operators.timeseries import time_bucket_gapfill
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1), None)],
        "user string, ts timestamp, v double",
    )
    out = time_bucket_gapfill(
        df, ["user"], "ts", 60,
        aggs=[F.sum("v").alias("total")], fills=[F.lit(-1.0)],
    ).collect()
    assert len(out) == 1
    # sum(v) is NULL on a PRESENT bucket: not a gap; fill still applies
    assert out[0]["gap_filled"] is False


def test_range_join_bucket_boundaries_property(spark):
    """Hypothesis sweep over window bounds (negative, positive, zero-width,
    zero-crossing) and timestamps clustered near bucket edges — the bucket
    arithmetic must reproduce the raw predicate exactly. Few examples
    (each drives a real Spark job) but adversarial ranges."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st
    import pyspark.sql.functions as F

    from json_ld_spark.operators.timeseries import bucketed_range_join

    base = dt.datetime(2024, 1, 1)

    @settings(max_examples=10, deadline=None)
    @given(
        lo=st.integers(min_value=-900, max_value=900),
        span=st.integers(min_value=0, max_value=900),
        lsecs=st.lists(
            st.integers(min_value=0, max_value=2000), min_size=3, max_size=8
        ),
        rsecs=st.lists(
            st.integers(min_value=0, max_value=2000), min_size=3, max_size=8
        ),
    )
    def check(lo, span, lsecs, rsecs):
        hi = lo + span
        left = spark.createDataFrame(
            [(1, base + dt.timedelta(seconds=s), i)
             for i, s in enumerate(lsecs)],
            "k long, ts timestamp, lid long",
        )
        right = spark.createDataFrame(
            [(1, base + dt.timedelta(seconds=s), i + 1000)
             for i, s in enumerate(rsecs)],
            "k long, rts timestamp, rid long",
        )
        got = sorted(
            (r["lid"], r["rid"])
            for r in bucketed_range_join(
                left, right, ["k"], "ts", "rts", lo, hi
            ).collect()
        )
        raw = sorted(
            (r["lid"], r["rid"])
            for r in left.join(right, "k")
            .where(
                (F.unix_timestamp("rts") >= F.unix_timestamp("ts") + lo)
                & (F.unix_timestamp("rts") <= F.unix_timestamp("ts") + hi)
            )
            .collect()
        )
        assert got == raw

    check()


def test_gapfill_rejects_mismatched_fills(spark):
    import pyspark.sql.functions as F

    from json_ld_spark.operators.timeseries import time_bucket_gapfill

    df = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1), 1.0)],
        "user string, ts timestamp, v double",
    )
    with pytest.raises(ValueError, match="pair up 1:1"):
        time_bucket_gapfill(
            df, ["user"], "ts", 60,
            aggs=[F.count("*").alias("n"), F.sum("v").alias("total")],
            fills=[F.lit(0)],
        )
