"""Parquet aggregate pushdown: when the freshness check is footer-only.

Measured facts pinned here (Spark 4.1 parquet DSv2):
- MAX/MIN/COUNT push down for numeric and DATE columns — the whole
  freshness aggregate shape (COUNT(*), COUNT(col), MAX(col)) answers
  from footers, zero data pages, at any table size.
- TIMESTAMP max does NOT push down (any encoding — INT96 or INT64
  micros), so event tables that want footer-only freshness at 100 TB
  carry an epoch-seconds BIGINT or DATE partner column.
- Pushdown needs BOTH spark.sql.parquet.aggregatePushdown=true AND
  parquet removed from spark.sql.sources.useV1SourceList (the v1 scan
  has no aggregate pushdown at all).
"""

import re

import pytest
from pyspark.sql import functions as F

from xoverrr_spark.operators.profile import freshness

_CONF = {
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.sources.useV1SourceList":
        "avro,csv,json,kafka,orc,text",  # parquet -> DSv2
}


@pytest.fixture()
def pushdown_conf(spark):
    old = {k: spark.conf.get(k) for k in _CONF}
    for k, v in _CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        spark.conf.set(k, v)


@pytest.fixture(scope="module")
def event_table(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pushdown") / "events.parquet")
    spark.range(100_000).select(
        "id",
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
        F.when(F.col("id") % 10 != 0,
               F.lit(1704067200) + F.col("id")).alias("ts_epoch"),
        F.when(F.col("id") % 10 != 0,
               F.date_add(F.to_date(F.lit("2024-01-01")),
                          (F.col("id") % 365).cast("int"))).alias("dt"),
    ).write.mode("overwrite").parquet(p)
    return p


def _pushed(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedAggregation: \[[^\]]*\]", plan)
    return m.group(0) if m else ""


def test_freshness_shape_pushes_down_for_epoch_and_date(
        spark, event_table, pushdown_conf):
    df = spark.read.parquet(event_table)
    as_of = "2024-02-01 00:00:00"

    fe = freshness(df, "ts_epoch", as_of=as_of)
    assert "MAX(ts_epoch)" in _pushed(fe) and "COUNT(ts_epoch)" in _pushed(fe)
    row = fe.collect()[0]
    assert row.n_rows == 100_000 and row.n_ts == 90_000  # footer null counts
    # epoch 1704067200+99999 is the max NON-null (id%10!=0 keeps 99999)
    assert row.max_ts.isoformat() == "2024-01-02T03:46:39"

    fd = freshness(df, "dt", as_of=as_of)
    assert "MAX(dt)" in _pushed(fd)
    assert fd.collect()[0].n_ts == 90_000


def test_timestamp_max_does_not_push_down(spark, event_table, pushdown_conf):
    """Pinned DOCUMENTATION: if a Spark upgrade starts pushing TIMESTAMP
    max, the partner-column guidance in freshness()'s docstring can go."""
    df = spark.read.parquet(event_table)
    ft = freshness(df, "ts", as_of="2024-02-01 00:00:00")
    assert _pushed(ft) == "PushedAggregation: []"
    # ...but the answer is still correct, just scan-priced
    assert ft.collect()[0].max_ts.isoformat() == "2024-01-02T03:46:39"


def test_pushdown_and_scan_paths_agree(spark, event_table, pushdown_conf):
    df = spark.read.parquet(event_table)
    as_of = "2024-02-01 00:00:00"
    pushed = freshness(df, "ts_epoch", as_of=as_of).collect()[0]
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    scanned = freshness(spark.read.parquet(event_table), "ts_epoch",
                        as_of=as_of).collect()[0]
    assert pushed == scanned
