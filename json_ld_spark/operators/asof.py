"""As-of (point-in-time) join — the canonical "operator Spark lacks".

For each left row, attach the single right row with the greatest
``right_ts <= left_ts`` sharing the join key (backward-inclusive as-of:
DuckDB's ``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts``, pandas'
``merge_asof(direction="backward")``). The classic uses are attribution
(purchase -> most recent preceding click), mark-to-market (trade -> last
quote), and slowly-changing-dimension lookup.

Spark has no native as-of join; the naive expressions are wrong at scale:

- inequality-join + groupBy(max) EXPLODES: every left row joins ALL
  earlier right rows for its key first (O(L * R_per_key) intermediate);
- a correlated subquery per left row is a nested-loop.

This operator uses the union + running-``last`` formulation instead:
tag both sides, union on (key, ts, tag), and take
``last(right_payload, ignorenulls=True)`` over a window ordered by
``(ts, tag)`` with right rows tagged 0 and left rows tagged 1 — at equal
timestamps the right row sorts first, which is exactly the inclusive
``>=`` bound. One pass, no row multiplication.

Physical plan: a SINGLE exchange (hash-partition by key for the window
sort) and zero Python — every expression is JVM-side. Cost at 10^12
rows is one shuffle of L+R and a per-key sort, the same bound as any
windowed aggregation. A key hot enough that its (L+R) slice outgrows a
task is handled the standard production way: range-bucket ``ts`` into
the partition key and carry each bucket's last right row into the next
bucket (one extra pass emitting per-bucket maxima) — noted here because
this module implements the un-bucketed form, which is the right default
while no single key's history exceeds a task.

Determinism contract: the right side must be unique per (key, ts) —
otherwise "the" most recent right row is undefined and engines may
legitimately disagree. ``asof_join`` resolves this with an optional
``tie_break`` column: among right rows sharing (key, ts) the one with
the GREATEST tie_break value is matched. No extra dedup pass is spent
on it — the tie column simply joins the window's sort key ascending, so
``last(ignorenulls)`` lands on the max-tie row of the run. Pass
``tie_break=None`` to assert uniqueness is already guaranteed upstream.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tie_break: Optional[str] = None,
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join. ``direction="backward"`` (default) matches
    the GREATEST ``right_ts <= left_ts``; ``"forward"`` matches the
    SMALLEST ``right_ts >= left_ts`` (pandas ``merge_asof`` directions;
    "nearest" is deliberately absent — compose both directions and pick,
    its tie rules are convention, not semantics).

    Returns every ``left`` row with all ``right`` non-key, non-ts columns
    appended (null when no right row matches for the key) plus
    ``right_ts`` itself under its own name. Column names must not
    overlap between the two sides except for ``on``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must have distinct names "
            f"(both {left_ts!r}): the matched right timestamp is returned "
            "under its own name alongside the left one"
        )
    on = list(on)
    # ANSI join semantics on NULL keys: a NULL never equals anything, so a
    # right row with a NULL key can match no left row — drop them up
    # front. (The union+window formulation would otherwise group NULL
    # keys together, silently matching NULL-keyed lefts to NULL-keyed
    # rights — a semantic SQL engines never have.) NULL-keyed LEFT rows
    # stay, emitting null right columns like any unmatched left row.
    for key in on:
        right = right.where(F.col(key).isNotNull())
    # Likewise for NULL timestamps: `r.ts <= l.ts` is NULL (no match) in
    # ANSI for a NULL on either side, so NULL-ts right rows can match
    # nothing — drop them. NULL-ts LEFT rows must still come out with
    # null right columns: the window sort below puts NULL __ts FIRST in
    # both directions, so their frame holds no (filtered, non-null-ts)
    # right rows.
    right = right.where(F.col(right_ts).isNotNull())
    right_payload = [c for c in right.columns if c not in on]
    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    overlap = set(right_payload) & set(left_payload)
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")

    # union layout: key cols, event time, side tag, tie column, then both
    # payloads (each side nulls the other's). Right rows tag 0 so that at
    # equal timestamps they sort BEFORE the left row — inclusive `>=`.
    # The (key, ts) tie-break is folded into the SAME window sort rather
    # than a pre-dedup pass: ordering right rows by tie_break ASCENDING
    # puts the greatest-tie row last in its (ts, tag=0) run, which is
    # precisely the row `last(ignorenulls)` resolves to — one exchange
    # and one window pass instead of two of each.
    tie_type = (
        right.schema[tie_break].dataType if tie_break is not None else "int"
    )
    tie = (
        F.col(tie_break).cast(tie_type)
        if tie_break is not None
        else F.lit(0).cast(tie_type)
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(tie_type).alias("__tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in right_payload],
        *[F.col(c) for c in left_payload],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        tie.alias("__tie"),
        *[F.col(c) for c in right_payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_payload],
    )

    # forward direction is the same single window pass with the TIME
    # sort flipped: in descending-ts order the "preceding" frame holds
    # rows with ts >= current, so last(ignorenulls) lands on the nearest
    # following right row; tag and tie orders are direction-independent
    # (right-before-left at equal ts keeps the bound inclusive, max-tie
    # still sorts last in its run).
    ts_ord = (
        F.col("__ts").asc_nulls_first() if direction == "backward"
        else F.col("__ts").desc_nulls_first()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(
            ts_ord,
            F.col("__tag").asc(),
            F.col("__tie").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = r_tagged.unionByName(l_tagged).select(
        *on,
        "__ts",
        "__tag",
        *[F.last(c, ignorenulls=True).over(w).alias(c)
          for c in right_payload],
        *left_payload,
    )
    return matched.where(F.col("__tag") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *left_payload,
        *right_payload,
    )
