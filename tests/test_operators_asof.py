"""Backward-inclusive as-of join semantics (operators/asof.py)."""

import datetime as dt

import pytest


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(5), 100),
            (1, _ts(2), 101),   # equal-ts right row must match (inclusive)
            (1, _ts(1), 102),   # before every right row -> null match
            (2, _ts(9), 103),   # key with no right rows at all
        ],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(2), 200),
            (1, _ts(2), 205),   # (key, ts) tie: greatest rid wins
            (1, _ts(4), 201),
            (1, _ts(6), 202),   # after every left row for k=1
            (3, _ts(1), 203),   # right-only key: never emitted
        ],
        "k long, rts timestamp, rid long",
    )
    return left, right


def test_asof_backward_inclusive(spark, sides):
    from json_ld_spark.operators.asof import asof_join

    left, right = sides
    out = {
        r["lid"]: (r["rid"], r["rts"])
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            tie_break="rid",
        ).collect()
    }
    assert out[100] == (201, _ts(4))   # greatest rts <= ts, skipping ts 6
    assert out[101] == (205, _ts(2))   # equal ts matches; tie keeps max rid
    assert out[102] == (None, None)    # nothing at-or-before
    assert out[103] == (None, None)    # key absent from right
    assert set(out) == {100, 101, 102, 103}  # left-outer: every left row


def test_asof_requires_disjoint_payload_names(spark, sides):
    from json_ld_spark.operators.asof import asof_join

    left, right = sides
    with pytest.raises(ValueError, match="overlapping"):
        asof_join(
            left.withColumnRenamed("lid", "rid"), right,
            on=["k"], left_ts="ts", right_ts="rts",
        )


def test_asof_single_exchange_no_python(spark, sides):
    from json_ld_spark.operators.asof import asof_join

    left, right = sides
    plan = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", tie_break="rid"
    )._jdf.queryExecution().executedPlan().toString()
    # window dedup + window match share the same key: ONE hash exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_asof_matches_pandas_merge_asof(spark):
    """pandas.merge_asof is the reference implementation of backward-
    inclusive as-of semantics — drive both over the same deterministic
    pseudo-random data and require identical matches."""
    import pandas as pd
    import numpy as np

    from json_ld_spark.operators.asof import asof_join

    rng = np.random.RandomState(42)
    base = pd.Timestamp("2024-01-01")
    left_pd = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 200),
            "ts": base + pd.to_timedelta(rng.randint(0, 10_000, 200), "s"),
            "lid": np.arange(200),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.randint(0, 6, 150),
            "rts": base + pd.to_timedelta(rng.randint(0, 10_000, 150), "s"),
            "rid": np.arange(1000, 1150),
        }
    )
    # merge_asof requires unique right (k, ts) for a deterministic match:
    # keep max rid per (k, rts), mirroring tie_break="rid"
    right_uniq = (
        right_pd.sort_values("rid").groupby(["k", "rts"], as_index=False).last()
    )
    expected = pd.merge_asof(
        left_pd.sort_values("ts"),
        right_uniq.sort_values("rts"),
        left_on="ts",
        right_on="rts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("lid")

    got = (
        asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            on=["k"],
            left_ts="ts",
            right_ts="rts",
            tie_break="rid",
        )
        .toPandas()
        .sort_values("lid")
    )
    exp_map = dict(zip(expected["lid"], expected["rid"]))
    got_map = dict(zip(got["lid"], got["rid"]))
    assert len(got_map) == 200
    for lid in range(200):
        e, g = exp_map[lid], got_map[lid]
        assert (pd.isna(e) and pd.isna(g)) or e == g, (lid, e, g)


def test_asof_null_keys_follow_ansi_semantics(spark):
    # NULL never equals NULL in SQL: a NULL-keyed right row matches no
    # one; a NULL-keyed left row survives with null right columns.
    import datetime as dt

    from json_ld_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, dt.datetime(2024, 1, 1, 0, 5), 100)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(None, dt.datetime(2024, 1, 1, 0, 1), 200)],
        "k long, rts timestamp, rid long",
    )
    rows = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", tie_break="rid"
    ).collect()
    assert len(rows) == 1
    assert rows[0]["lid"] == 100 and rows[0]["rid"] is None


def test_asof_forward_direction(spark, sides):
    from json_ld_spark.operators.asof import asof_join

    left, right = sides
    out = {
        r["lid"]: (r["rid"], r["rts"])
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            tie_break="rid", direction="forward",
        ).collect()
    }
    assert out[100] == (202, _ts(6))   # smallest rts >= ts(5)
    assert out[101] == (205, _ts(2))   # equal ts inclusive; max-rid tie
    assert out[102] == (205, _ts(2))   # nearest following from ts(1)
    assert out[103] == (None, None)    # key 2 absent from right

    import pytest as _pytest
    with _pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                  direction="nearest")


def test_asof_forward_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    from json_ld_spark.operators.asof import asof_join

    rng = np.random.RandomState(7)
    base = pd.Timestamp("2024-01-01")
    left_pd = pd.DataFrame({
        "k": rng.randint(0, 4, 120),
        "ts": base + pd.to_timedelta(rng.randint(0, 5000, 120), "s"),
        "lid": np.arange(120),
    })
    right_pd = pd.DataFrame({
        "k": rng.randint(0, 5, 90),
        "rts": base + pd.to_timedelta(rng.randint(0, 5000, 90), "s"),
        "rid": np.arange(1000, 1090),
    })
    right_uniq = (
        right_pd.sort_values("rid").groupby(["k", "rts"], as_index=False).last()
    )
    expected = pd.merge_asof(
        left_pd.sort_values("ts"), right_uniq.sort_values("rts"),
        left_on="ts", right_on="rts", by="k",
        direction="forward", allow_exact_matches=True,
    )
    got = asof_join(
        spark.createDataFrame(left_pd), spark.createDataFrame(right_pd),
        on=["k"], left_ts="ts", right_ts="rts",
        tie_break="rid", direction="forward",
    ).toPandas()
    exp_map = dict(zip(expected["lid"], expected["rid"]))
    got_map = dict(zip(got["lid"], got["rid"]))
    assert len(got_map) == 120
    import pandas as _pd
    for lid in range(120):
        e, g = exp_map[lid], got_map[lid]
        assert (_pd.isna(e) and _pd.isna(g)) or e == g, (lid, e, g)


def test_asof_null_timestamps_follow_ansi_semantics(spark):
    # r.ts <= l.ts is NULL (no match) when either side's ts is NULL:
    # NULL-ts right rows match nothing; NULL-ts left rows come out with
    # null right columns — in BOTH directions.
    from json_ld_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _ts(5), 100), (1, None, 101)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(1, None, 200), (1, _ts(3), 201)],
        "k long, rts timestamp, rid long",
    )
    for direction, expect_100 in (("backward", 201), ("forward", None)):
        out = {
            r["lid"]: r["rid"]
            for r in asof_join(
                left, right, on=["k"], left_ts="ts", right_ts="rts",
                tie_break="rid", direction=direction,
            ).collect()
        }
        assert out[100] == expect_100, direction   # never the NULL-ts 200
        assert out[101] is None, direction         # NULL-ts left: no match


def test_asof_null_tie_break_loses_to_valued(spark):
    # SQL greatest-value semantics ignore NULLs: a NULL-tie right row
    # must lose to the valued one at the same (key, ts)
    from json_ld_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _ts(2), 100)], "k long, ts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [(1, _ts(2), None), (1, _ts(2), 7)],
        "k long, rts timestamp, rid long",
    )
    rows = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", tie_break="rid"
    ).collect()
    assert rows[0]["rid"] == 7


def test_asof_rejects_same_ts_name(spark, sides):
    from json_ld_spark.operators.asof import asof_join

    left, right = sides
    with pytest.raises(ValueError, match="distinct names"):
        asof_join(
            left, right.withColumnRenamed("rts", "ts"),
            on=["k"], left_ts="ts", right_ts="ts",
        )
