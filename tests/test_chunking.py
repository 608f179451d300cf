"""Chunk-iterator goldens (reference tests/unit/test_core_chunking.py:23-38)
and the chunked == unchunked equivalence invariant
(reference test_postgres_chunking_yearly.py:64)."""

import pytest
from pyspark.sql import functions as F

from xoverrr_spark.checker import QualityChecker
from xoverrr_spark.chunking import iter_date_chunks, merge_chunk_stats


def test_single_range_without_chunking():
    assert iter_date_chunks("2024-01-01", "2024-01-31", None) == [
        ("2024-01-01", "2024-01-31")
    ]


def test_splits_range_by_days_inclusive_with_remainder():
    assert iter_date_chunks("2024-01-01", "2024-01-31", 10) == [
        ("2024-01-01", "2024-01-10"),
        ("2024-01-11", "2024-01-20"),
        ("2024-01-21", "2024-01-30"),
        ("2024-01-31", "2024-01-31"),
    ]


def test_non_positive_chunk_size_raises():
    with pytest.raises(ValueError, match="chunk_size_days must be greater than 0"):
        iter_date_chunks("2024-01-01", "2024-01-31", 0)


def test_inverted_range_raises():
    with pytest.raises(ValueError, match="greater than end"):
        iter_date_chunks("2024-02-01", "2024-01-01", 5)


def test_merge_empty_chunks_is_none():
    assert merge_chunk_stats([None, None]) is None


def test_chunked_equals_unchunked(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    trg = orders.filter(F.col("o_orderkey") % 40 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 37 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice")),
    )
    orders.createOrReplaceTempView("chunk_src")
    trg.createOrReplaceTempView("chunk_trg")
    qc = QualityChecker(spark)

    kwargs = dict(
        custom_primary_key=["o_orderkey"],
        date_column="o_orderdate",
        date_range=("1995-01-01", "1996-06-30"),
    )
    _, _, unchunked, _ = qc.check_samples("chunk_src", "chunk_trg", **kwargs)
    _, _, chunked, det = qc.check_samples(
        "chunk_src", "chunk_trg", chunk_size_days=45, **kwargs
    )
    for f in ("total_source_rows", "total_target_rows", "dup_source_rows",
              "only_source_rows", "only_target_rows", "comparable_rows",
              "passed_rows"):
        assert getattr(chunked, f) == getattr(unchunked, f), f
    assert chunked.final_score == pytest.approx(unchunked.final_score)
    assert dict(det.issue_breakdown).get("o_totalprice", 0) > 0
