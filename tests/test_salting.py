"""Explicit skew salting (north rule): the fixture's dominant phash cluster
lands ~45% of rows in one bucket; salting by hashed image_id must spread a
hot bucket evenly across tasks."""

from pyspark.sql import functions as F

from xoverrr_spark.fixtures.images import images_df


def test_fixture_phash_is_skewed(spark):
    df = images_df(spark, 2000, 42, with_bytes=False)
    counts = (
        df.withColumn("bucket", F.pmod("phash", F.lit(16)))
        .groupBy("bucket").count().collect()
    )
    top = max(r["count"] for r in counts)
    assert top > 2000 * 0.40  # dominant cluster exists

def test_salting_evens_out_hot_bucket(spark):
    df = images_df(spark, 2000, 42, with_bytes=False)
    hot = df.filter(F.pmod("phash", F.lit(16)) == 0)
    salted = hot.repartition(8, F.xxhash64("image_id"))
    sizes = [r["count"] for r in
             salted.groupBy(F.spark_partition_id().alias("p")).count().collect()]
    assert len(sizes) == 8
    assert max(sizes) <= 2 * (sum(sizes) / len(sizes))  # no partition > 2x mean
