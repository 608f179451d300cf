"""Streaming windowed aggregation with late-data handling.

The streaming twin of ``operators.counts.daily_counts`` — Spark's built-in
tumbling-window aggregation with an event-time watermark, the canonical
"windowed aggs + watermarks for late data" form (no custom state needed;
contrast with stream_sessions.py, which hand-rolls state for semantics the
built-in cannot express).

Late-data semantics (pinned by tests/test_stream_counts.py):
- a row later than its window but NEWER than the watermark still updates
  the window (late-but-in-time);
- a row OLDER than the watermark is dropped before the aggregation and its
  window's state has been eligible for eviction — the count never moves.
  This requires ``update``/``append`` output mode: in ``complete`` mode
  watermarking neither drops late rows nor evicts state.

State size is O(windows within the watermark horizon × groups) — bounded,
which is what makes this runnable forever on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events_stream: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Streaming events -> per-(tumbling window, group) row counts.

    Output: (window_start, window_end, <group_col>, cnt). Watermarks
    require TIMESTAMP, parquet fixtures carry TIMESTAMP_NTZ — cast first
    (same rule as stream_sessions).
    """
    e = events_stream.withColumn(
        "_ts", F.col(ts_col).cast("timestamp")
    ).withWatermark("_ts", watermark_delay)
    agg = e.groupBy(
        F.window("_ts", window_duration).alias("_w"), F.col(group_col)
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return agg.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        group_col,
        "cnt",
    )
