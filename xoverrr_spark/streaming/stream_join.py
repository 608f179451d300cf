"""Watermarked stream-stream interval join.

The last standard structured-streaming shape (r03 verdict #5): two
unbounded streams joined on a key plus an event-time bound — the canonical
impression->click attribution form. Built entirely on Spark's native
stream-stream join; what makes it runnable forever is the pair of
constraints Spark uses to BOUND STATE:

- a watermark on BOTH sides (how late either stream may be), and
- a time-range predicate tying the two event times together
  (``right.ts in (left.ts, left.ts + interval]``).

With both present, Spark evicts a buffered left row once the watermark
passes ``left.ts + interval`` and a right row once the watermark passes
its event time — state is O(rows within the horizon), not O(stream).
A right row arriving older than the watermark finds its left partner
already evicted and joins nothing (late-drop, pinned across a checkpoint
restart by tests/test_stream_join.py).

Batch parity: on the same finite inputs the drained append-mode result
equals the equivalent batch inner join (same test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_JOIN_TYPES = {"inner", "left_outer"}


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts_col: str = "ts",
    right_ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
    interval: str = "5 minutes",
    join_type: str = "inner",
) -> DataFrame:
    """Join two streams on ``on`` where the right event lands within
    ``(left_ts, left_ts + interval]``.

    Output: left columns (event time as ``left_ts``) + right non-key
    columns (event time as ``right_ts``). Non-key column names must be
    disjoint across the two sides (same contract as timeseries.asof_join
    — raises up front rather than emitting ambiguous columns). Null join
    keys are filtered with reason: a null key can match nothing in an
    equi-join, and keeping them would only grow state that can never
    emit (the batch twin drops them identically, so parity holds).

    ``join_type``: ``inner`` or ``left_outer`` (Spark emits the unmatched
    left rows only once the watermark closes their interval).
    """
    if join_type not in _JOIN_TYPES:
        raise ValueError(f"join_type must be one of {sorted(_JOIN_TYPES)}")
    overlap = (set(left.columns) - {on, left_ts_col}) & (
        set(right.columns) - {on, right_ts_col}
    )
    if overlap:
        raise ValueError(
            f"non-key columns collide across sides: {sorted(overlap)}; "
            "rename before joining"
        )
    # The output reserves 'left_ts'/'right_ts'/'_r_key'. An input already
    # carrying one of those (other than its OWN ts column, which may
    # legitimately be pre-named) would be silently overwritten — and
    # left_ts_col='left_ts' used to self-destruct (withColumn replaced it,
    # then drop removed the replacement). Raise up front instead.
    for side_name, df, own in (("left", left, {left_ts_col} if left_ts_col == "left_ts" else set()),
                               ("right", right, {right_ts_col} if right_ts_col == "right_ts" else set())):
        reserved = ({"left_ts", "right_ts", "_r_key"} - own) & set(df.columns)
        if reserved:
            raise ValueError(
                f"{side_name} side carries reserved output column(s) "
                f"{sorted(reserved)}; rename before joining"
            )

    def _retime(df, ts_col, out_name):
        # in-place cast when the ts column already has the output name
        # (dropping ts_col afterwards would remove the new column)
        if ts_col == out_name:
            return df.withColumn(out_name, F.col(out_name).cast("timestamp"))
        return df.withColumn(out_name, F.col(ts_col).cast("timestamp")).drop(ts_col)

    l = _retime(left.filter(F.col(on).isNotNull()), left_ts_col, "left_ts").withWatermark(
        "left_ts", watermark_delay
    )
    r = (
        _retime(right.filter(F.col(on).isNotNull()), right_ts_col, "right_ts")
        .withColumnRenamed(on, "_r_key")
        .withWatermark("right_ts", watermark_delay)
    )
    cond = (
        (F.col(on) == F.col("_r_key"))
        & (F.col("right_ts") > F.col("left_ts"))
        & (F.col("right_ts") <= F.expr(f"left_ts + interval {interval}"))
    )
    return l.join(r, cond, join_type).drop("_r_key")
