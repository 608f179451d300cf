"""Ninth check family: single-table key uniqueness — the standalone
"is this column set actually a primary key?" audit (the reference only
meets duplicate keys as a side effect inside its sample diff,
utils.py:457 keep='first'). Engine semantics (null-key grouping,
excess-row math, deterministic examples) + the facade's scoring/report/
audit/error paths."""

import json

import pytest

from xoverrr_spark.checker import QualityChecker
from xoverrr_spark.operators.integrity import (
    duplicate_key_examples,
    duplicate_key_stats,
    key_duplication,
)


def _dup_frame(spark):
    return spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e"),
         (None, "f"), (None, "g")],
        "k int, v string",
    )


def test_key_duplication_stats_closed_form(spark):
    grouped = key_duplication(_dup_frame(spark), ["k"])
    row = duplicate_key_stats(grouped, ["k"]).collect()[0]
    # 7 rows, 4 distinct keys (1, 2, 3, NULL), dup keys {1: x3, NULL: x2},
    # excess = (3-1) + (2-1) = 3, null-key rows = 2
    assert (row.n_rows, row.n_keys, row.duplicate_keys,
            row.excess_rows, row.null_key_rows) == (7, 4, 2, 3, 2)
    # examples deterministic: count desc, then key asc
    exs = [(r.k, r.row_count)
           for r in duplicate_key_examples(grouped, ["k"], 10).collect()]
    assert exs == [(1, 3), (None, 2)]
    # cap respected
    assert len(duplicate_key_examples(grouped, ["k"], 1).collect()) == 1


def test_key_duplication_composite_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "x", 1), (1, "x", 2), (1, "y", 3), (None, "x", 4), (None, "x", 5)],
        "k1 int, k2 string, v int",
    )
    grouped = key_duplication(df, ["k1", "k2"])
    row = duplicate_key_stats(grouped, ["k1", "k2"]).collect()[0]
    # (1,x) x2 and (NULL,x) x2 duplicate; (1,y) unique
    assert (row.n_rows, row.n_keys, row.duplicate_keys,
            row.excess_rows, row.null_key_rows) == (5, 3, 2, 2, 2)
    with pytest.raises(ValueError, match="not found"):
        key_duplication(df, ["nope"])
    with pytest.raises(ValueError, match="at least one"):
        key_duplication(df, [])


def test_check_uniqueness_scores_reports_and_persists(spark, tmp_path):
    _dup_frame(spark).createOrReplaceTempView("uq_t")
    results = str(tmp_path / "results")
    qc = QualityChecker(spark, results_table=results)

    status, report, stats, details = qc.check_uniqueness("uq_t", ["k"])
    assert status == "failed"
    assert stats == {
        "n_rows": 7,
        "n_keys": 4,
        "duplicate_keys": 2,
        "excess_rows": 3,
        "null_key_rows": 2,
        "duplicate_pct": 42.8571,
        "final_score": 57.1429,
    }
    assert details == [{"k": 1, "row_count": 3}, {"k": None, "row_count": 2}]
    assert "duplicated keys: 2" in report and "2 rows carry a NULL" in report

    # tolerance turns the same data green
    status2, _, _, _ = qc.check_uniqueness("uq_t", ["k"], max_duplicate_pct=50.0)
    assert status2 == "success"

    audit = spark.read.parquet(results).filter("check_type = 'uniqueness'")
    assert audit.count() == 2
    row = audit.filter("status = 'failed'").collect()[0]
    assert row["stats_final_score"] == 57.1429
    assert json.loads(row["details_issue_breakdown_json"]) == [["k", 3]]
    exs = json.loads(row["details_dup_source_keys_examples_json"])
    assert exs == [[1], [None]]


def test_check_uniqueness_clean_empty_and_json(spark, tmp_path):
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    ).createOrReplaceTempView("uq_clean")
    spark.createDataFrame([], "k int, v string").createOrReplaceTempView("uq_empty")
    qc = QualityChecker(spark, results_table=str(tmp_path / "r"))

    status, _, stats, details = qc.check_uniqueness("uq_clean", ["k"])
    assert status == "success" and stats["final_score"] == 100.0
    assert details == []

    # empty table: vacuous pass, said out loud
    status_e, report_e, stats_e, _ = qc.check_uniqueness("uq_empty", ["k"])
    assert status_e == "success" and stats_e["n_rows"] == 0
    assert "vacuous pass" in report_e

    # JSON envelope carries the same stats
    _, payload, _, _ = qc.check_uniqueness(
        "uq_clean", ["k"], report_output_format="json")
    env = json.loads(payload)
    assert env["check_type"] == "uniqueness"
    assert env["stats"]["final_score"] == 100.0


def test_check_uniqueness_error_paths_and_suite(spark, tmp_path):
    _dup_frame(spark).createOrReplaceTempView("uq_t2")
    qc = QualityChecker(spark, results_table=str(tmp_path / "r"))

    # malformed CALL raises BEFORE the try block (no audit row, run_suite
    # records it as a config error without killing the suite)
    with pytest.raises(ValueError, match="at least one"):
        qc.check_uniqueness("uq_t2", [])
    # a missing column is a FAILED check run (wrapped), not a raise
    status, report, stats, _ = qc.check_uniqueness("uq_t2", ["nope"])
    assert status == "failed" and stats is None and "nope" in report

    summary = qc.run_suite([
        {"type": "uniqueness", "source_table": "uq_t2",
         "key_columns": ["k"], "check_name": "pk_uq"},
        {"type": "uniqueness", "source_table": "uq_t2", "key_columns": []},
    ])
    assert summary["checked"] == 2 and summary["failed"] == 2
    by_name = {c["name"]: c for c in summary["checks"]}
    assert "error" in by_name["uniqueness_1"]
    assert by_name["pk_uq"]["final_score"] == 57.1429


def test_check_uniqueness_date_scoped(spark, tmp_path):
    spark.createDataFrame(
        [(1, "2024-01-01"), (1, "2024-01-01"), (1, "2024-01-02"), (2, "2024-01-01")],
        "k int, d string",
    ).selectExpr("k", "cast(d as date) d").createOrReplaceTempView("uq_dated")
    qc = QualityChecker(spark, results_table=str(tmp_path / "r"))
    # full table: key 1 has 3 rows -> fails
    status_all, _, stats_all, _ = qc.check_uniqueness("uq_dated", ["k"])
    assert status_all == "failed" and stats_all["excess_rows"] == 2
    # scoped to day 2: single row per key -> passes
    status_day, _, stats_day, _ = qc.check_uniqueness(
        "uq_dated", ["k"], date_column="d",
        date_range=("2024-01-02", "2024-01-02"))
    assert status_day == "success" and stats_day["n_rows"] == 1
