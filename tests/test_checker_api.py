"""Public API facade tests: the four check methods end-to-end."""

import json

import pytest
from pyspark.sql import functions as F

from xoverrr_spark.checker import QualityChecker


@pytest.fixture(scope="module")
def checker(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("results")
    return QualityChecker(spark, results_table=str(out / "runs"))


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.createOrReplaceTempView("api_orders")
    orders.filter(F.col("o_orderkey") % 50 != 0).createOrReplaceTempView("api_orders_trg")
    return True


def test_check_samples_identical(checker, views):
    status, report, stats, details = checker.check_samples(
        "api_orders", "api_orders", custom_primary_key=["o_orderkey"]
    )
    assert status == "success"
    assert stats.final_score == 100
    assert "final score: 100.00000" in report


def test_check_samples_with_diffs_and_tolerance(checker, views):
    status, report, stats, _ = checker.check_samples(
        "api_orders", "api_orders_trg", custom_primary_key=["o_orderkey"],
        tolerance_pct=5.0,
    )
    assert stats.only_source_rows > 0
    assert status == "success"  # 2% src-only * 0.15 < 5
    status2, _, stats2, _ = checker.check_samples(
        "api_orders", "api_orders_trg", custom_primary_key=["o_orderkey"],
        tolerance_pct=0.0,
    )
    assert status2 == "failed"


def test_check_samples_json_format(checker, views):
    status, report, stats, _ = checker.check_samples(
        "api_orders", "api_orders", custom_primary_key=["o_orderkey"],
        report_output_format="json",
    )
    payload = json.loads(report)
    assert payload["status"] == "success"
    assert payload["stats"]["final_score"] == 100


def test_check_samples_requires_pk(checker, views):
    status, report, stats, details = checker.check_samples("api_orders", "api_orders")
    assert status == "failed" and "custom_primary_key" in report


def test_check_samples_date_range(checker, views, spark, sf_dir):
    status, _, stats, _ = checker.check_samples(
        "api_orders", "api_orders", custom_primary_key=["o_orderkey"],
        date_column="o_orderdate", date_range=("1995-01-01", "1995-12-31"),
    )
    assert status == "success"
    total = spark.sql(
        "SELECT count(*) c FROM api_orders WHERE o_orderdate >= '1995-01-01' "
        "AND o_orderdate < '1996-01-01'"
    ).collect()[0]["c"]
    assert stats.total_source_rows == total


def test_check_counts(checker, views):
    status, report, cstats, disc = checker.check_counts(
        "api_orders", "api_orders_trg", date_column="o_orderdate", tolerance_pct=3.0
    )
    assert status == "success"
    assert cstats.total_source > cstats.total_target


def test_check_custom_queries(checker, views):
    status, report, stats, _ = checker.check_custom_queries(
        "SELECT o_orderkey, o_totalprice FROM api_orders WHERE o_orderkey % 10 = 0",
        "SELECT o_orderkey, o_totalprice * 1.0 AS o_totalprice FROM api_orders WHERE o_orderkey % 10 = 0",
        custom_primary_key=["o_orderkey"],
    )
    assert status == "success"  # 5.0 == 5 canonicalization


def test_check_sniff_query(checker, views):
    status, report, stats, examples = checker.check_sniff_query(
        "SELECT o_orderkey, CASE WHEN o_totalprice > 0 THEN 'y' ELSE 'n' END AS xsniff_passed "
        "FROM api_orders"
    )
    assert status == "success" and stats.final_score == 100.0


def test_sniff_query_missing_flag_fails(checker, views):
    status, report, *_ = checker.check_sniff_query("SELECT o_orderkey FROM api_orders")
    assert status == "failed" and "xsniff_passed" in report


def test_recent_exclusion(checker, spark):
    src = spark.createDataFrame(
        [(1, "a", "n"), (2, "b", "y"), (3, "c", "n")],
        "id int, v string, xrecently_changed string",
    )
    trg = spark.createDataFrame(
        [(1, "a", "n"), (2, "XX", "n"), (3, "c", "y")],
        "id int, v string, xrecently_changed string",
    )
    src.createOrReplaceTempView("api_recent_src")
    trg.createOrReplaceTempView("api_recent_trg")
    status, _, stats, _ = checker.check_samples(
        "api_recent_src", "api_recent_trg", custom_primary_key=["id"]
    )
    # keys 2 and 3 are flagged on either side -> excluded from BOTH
    assert stats.comparable_rows == 1 and stats.passed_rows == 1
    assert status == "success"


def test_results_persisted(checker, spark):
    runs = spark.read.parquet(checker.results_table)
    assert runs.count() >= 5
    assert {"run_id", "check_type", "status", "final_score"} <= set(runs.columns)


def test_session_stats_and_quote_ident(checker, views):
    from xoverrr_spark.checker import quote_ident

    before = checker.session_stats["checked"]
    checker.check_samples("api_orders", "api_orders", custom_primary_key=["o_orderkey"])
    assert checker.session_stats["checked"] == before + 1
    assert checker.session_stats["success"] >= 1
    assert "api_orders" in checker.session_stats["tables"]
    assert quote_ident("date") == "`date`"
    assert quote_ident("o_orderkey") == "o_orderkey"
