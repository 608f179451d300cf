"""Per-day row-count reconciliation — the Spark-native ``check_counts``.

Behavior matched from the reference (``/root/reference/src/xoverrr/core.py:321-457``):
per-day counts on each side (pushed-down SQL there; a groupBy here), dates
cross-filled with 0 (``utils.py:959-975``), score from
``sum(abs(src-trg))`` vs ``sum(min(src,trg))`` (``core.py:402-419``,
``README.md:333-338``), mismatched days listed (``utils.py:914-927``).

Spark-first: the reference's chunked fetch + pandas concat + reindex becomes
one groupBy per side and one full-outer join on the date — two shuffles on a
low-cardinality date key, broadcast-joined automatically when one side's
daily summary is small (it always is: rows = #days).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def daily_counts(df: DataFrame, date_col: str | Column) -> DataFrame:
    """(dt, cnt) per day — reference A1 (adapters/postgres.py:236-263)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return df.groupBy(F.to_date(c).alias("dt")).agg(F.count(F.lit(1)).alias("cnt"))


def counts_joined(src_daily: DataFrame, trg_daily: DataFrame) -> DataFrame:
    """Full-outer on dt with zero cross-fill (reference J8, utils.py:959-975)."""
    s = src_daily.select(F.col("dt"), F.col("cnt").alias("src_cnt"))
    t = trg_daily.select(F.col("dt"), F.col("cnt").alias("trg_cnt"))
    return (
        s.join(t, "dt", "full_outer")
        .select(
            "dt",
            F.coalesce("src_cnt", F.lit(0)).alias("src_cnt"),
            F.coalesce("trg_cnt", F.lit(0)).alias("trg_cnt"),
        )
    )


def count_discrepancies(src_daily: DataFrame, trg_daily: DataFrame) -> DataFrame:
    """Days whose counts differ, newest first (reference utils.py:914-927)."""
    j = counts_joined(src_daily, trg_daily)
    return (
        j.filter(F.col("src_cnt") != F.col("trg_cnt"))
        .withColumn("diff", F.col("src_cnt") - F.col("trg_cnt"))
        .orderBy(F.desc("dt"))
    )


@dataclass
class CountStats:
    total_source: int
    total_target: int
    diff_sum: int
    common_sum: int
    diff_pct: float
    final_score: float
    mismatched_days: int


def check_counts(
    src: DataFrame,
    trg: DataFrame,
    src_date_col: str,
    trg_date_col: str | None = None,
) -> CountStats:
    """Score: pct = 100*diff/(diff+common) with diff=sum|s-t|,
    common=sum(min(s,t)) (reference core.py:402-419)."""
    j = counts_joined(daily_counts(src, src_date_col),
                      daily_counts(trg, trg_date_col or src_date_col))
    row = j.agg(
        F.coalesce(F.sum("src_cnt"), F.lit(0)).alias("ts"),
        F.coalesce(F.sum("trg_cnt"), F.lit(0)).alias("tt"),
        F.coalesce(F.sum(F.abs(F.col("src_cnt") - F.col("trg_cnt"))), F.lit(0)).alias("d"),
        F.coalesce(F.sum(F.least("src_cnt", "trg_cnt")), F.lit(0)).alias("c"),
        F.count(F.when(F.col("src_cnt") != F.col("trg_cnt"), 1)).alias("m"),
    ).collect()[0]
    denom = row["d"] + row["c"]
    pct = (row["d"] / denom * 100) if denom else 0.0
    return CountStats(
        int(row["ts"]), int(row["tt"]), int(row["d"]), int(row["c"]),
        pct, 100 - pct, int(row["m"]),
    )
