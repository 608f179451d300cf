"""Physical-plan assertions: the plans we designed for are the plans we get.

At 100 TB these properties are the difference between a scan of 7 columns
and a scan of 1 binary blob column per row; between a broadcast and a 2 PB
shuffle. Asserted here so regressions fail loudly.
"""

import pytest
from pyspark.sql import functions as F

from xoverrr_spark.operators.diff import diff_joined
from xoverrr_spark.pipeline.quality_filter import quality_filter


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_bytes_column_pruned_from_scan(spark, tmp_path):
    from xoverrr_spark.fixtures.images import images_df

    p = str(tmp_path / "imgs")
    images_df(spark, 50, 1).write.parquet(p)
    plan = _formatted(quality_filter(spark.read.parquet(p)))
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schema, plan
    assert "bytes" not in scan_schema[0], scan_schema[0]
    assert "caption" in scan_schema[0]


def test_date_filter_pushed_to_parquet(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    q = orders.filter(F.col("o_orderdate") >= "1995-01-01").select("o_orderkey")
    plan = _formatted(q)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "o_orderdate" in pushed[0], plan


def test_diff_is_single_shuffle_no_join(spark, sf_dir):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    trg = src.limit(100)
    j, _ = diff_joined(src, trg, ["o_orderkey"], normalize=False)
    # the tagged-union formulation: ONE key-hash exchange, zero join operators
    plan = _plan(j)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan or "SortAggregate" in plan, plan


def test_anti_join_broadcasts(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    hot = c.limit(10).select("c_custkey")
    out = c.join(F.broadcast(hot), "c_custkey", "left_anti")
    assert "BroadcastHashJoin" in _plan(out) or "BroadcastNestedLoopJoin" in _plan(out)


def test_pipeline_single_python_hop(spark, tmp_path):
    from xoverrr_spark.fixtures.images import images_df

    p = str(tmp_path / "imgs2")
    images_df(spark, 50, 2).write.parquet(p)
    plan = _plan(quality_filter(spark.read.parquet(p)))
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time python


def test_pipeline_no_shuffle(spark, tmp_path):
    from xoverrr_spark.fixtures.images import images_df

    p = str(tmp_path / "imgs3")
    images_df(spark, 50, 3).write.parquet(p)
    plan = _plan(quality_filter(spark.read.parquet(p)))
    assert "Exchange" not in plan, plan
