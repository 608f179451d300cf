"""Source-spec resolution: every reader format + clean Iceberg absence."""

import pytest

from xoverrr_spark.exceptions import QueryExecutionError
from xoverrr_spark.sources import load_table


def test_format_prefixes_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    base = str(tmp_path)
    df.write.parquet(f"{base}/p")
    df.write.orc(f"{base}/o")
    df.write.option("header", True).csv(f"{base}/c")
    df.write.json(f"{base}/j")
    for spec in (f"{base}/p", f"parquet:{base}/p", f"orc:{base}/o",
                 f"csv:{base}/c", f"json:{base}/j"):
        got = load_table(spark, spec)
        assert got.count() == 2
        assert {r["v"] for r in got.select("v").collect()} == {"a", "b"}


def test_table_prefix_and_bare_name(spark):
    spark.createDataFrame([(7,)], "x int").createOrReplaceTempView("src_probe")
    assert load_table(spark, "table:src_probe").count() == 1
    assert load_table(spark, "src_probe").count() == 1


def test_iceberg_absence_reported_cleanly(spark):
    with pytest.raises(QueryExecutionError, match="Iceberg runtime"):
        load_table(spark, "iceberg:cat.db.t")
