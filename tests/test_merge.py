"""apply_changes (CDC merge): upsert/delete/version semantics + plan shape."""

import pytest
from pyspark.sql import functions as F

from xoverrr_spark.operators.merge import apply_changes


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (None, "n", 0.0)],
        "k bigint, v string, amt double")


def test_apply_changes_upsert_delete_insert(spark):
    base = _base(spark)
    ch = spark.createDataFrame(
        [(2, "b2", 21.0, "U"),     # update
         (3, "c", 30.0, "D"),      # delete
         (9, "i", 90.0, "U"),      # insert
         (8, "x", 80.0, "D")],     # delete of absent key: no-op
        "k bigint, v string, amt double, op string")
    got = {r.k: (r.v, r.amt) for r in
           apply_changes(base, ch, ["k"], op_col="op").collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 9: ("i", 90.0),
                   None: ("n", 0.0)}


def test_apply_changes_null_key_rows_survive_and_update(spark):
    base = _base(spark)
    ch = spark.createDataFrame([(None, "n2", 1.0, "U")],
                               "k bigint, v string, amt double, op string")
    got = {r.k: r.v for r in
           apply_changes(base, ch, ["k"], op_col="op").collect()}
    # the null-key row is UPDATED, not dropped (window partition, no join)
    assert got[None] == "n2" and len(got) == 4


def test_apply_changes_version_picks_latest(spark):
    base = _base(spark)
    ch = spark.createDataFrame(
        [(1, "v1", 11.0, "U", 1), (1, "v3", 13.0, "U", 3), (1, "v2", 12.0, "U", 2)],
        "k bigint, v string, amt double, op string, ver bigint")
    got = {r.k: r.v for r in
           apply_changes(base, ch, ["k"], op_col="op",
                         version_col="ver").collect()}
    assert got[1] == "v3"


def test_apply_changes_no_op_and_version_is_pure_upsert(spark):
    base = _base(spark)
    ch = spark.createDataFrame([(2, "bb", 22.0)], "k bigint, v string, amt double")
    got = {r.k: r.v for r in apply_changes(base, ch, ["k"]).collect()}
    assert got == {1: "a", 2: "bb", 3: "c", None: "n"}


def test_apply_changes_rejects_missing_columns(spark):
    base = _base(spark)
    ch = spark.createDataFrame([(2, "bb")], "k bigint, v string")
    with pytest.raises(ValueError, match="missing base column"):
        apply_changes(base, ch, ["k"])


def test_apply_changes_plan_single_exchange_no_join(spark):
    base = _base(spark)
    ch = spark.createDataFrame([(2, "bb", 22.0, "U")],
                               "k bigint, v string, amt double, op string")
    plan = apply_changes(base, ch, ["k"], op_col="op")._jdf\
        .queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
