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
