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


def test_salted_join_parity_all_supported_hows(spark):
    from xoverrr_spark.operators.salting import salted_join

    big = spark.createDataFrame(
        [(0, i) for i in range(900)] + [(i % 7, 1000 + i) for i in range(100)]
        + [(None, -1), (None, -2)],
        "k bigint, v int")
    small = spark.createDataFrame(
        [(0, "hot"), (1, "a"), (2, "b"), (None, "nullrow"), (9, "unref")],
        "k bigint, name string")
    from collections import Counter

    for how in ("inner", "left", "left_semi", "left_anti"):
        got = salted_join(big, small, ["k"], salt=8, how=how)
        exp = big.join(small, ["k"], how)
        assert Counter(map(tuple, got.collect())) == \
            Counter(map(tuple, exp.collect())), how
        assert got.columns == exp.columns, how


def test_salted_join_spreads_the_hot_key(spark):
    """The byte-blind AQE case (test_skew_aqe third pin): a constant hot
    key AQE will never split. The salted join spreads its rows across
    shuffle partitions instead of one straggler."""
    from xoverrr_spark.operators.salting import salted_join

    big = spark.range(100_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"))
    small = spark.range(1000).select(F.col("id").alias("k"),
                                     (F.col("id") * 2).alias("w"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE would coalesce this small output back into one partition and
    # hide the distribution we're measuring
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        def shares(df):
            rows = (df.groupBy(F.spark_partition_id().alias("p")).count()
                    .collect())
            total = sum(r["count"] for r in rows)
            return {r["p"]: r["count"] / total for r in rows}

        plain = shares(big.join(small, "k"))
        salted = shares(salted_join(big, small, ["k"], salt=8))
        # plain: ~90% of output rows sit in the hot key's one partition
        assert max(plain.values()) > 0.8, plain
        # salted: the hot key is spread — no partition dominates
        assert max(salted.values()) < 0.5, salted
        assert len(salted) > len(plain) or max(salted.values()) < max(plain.values())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                       old_coalesce)


def test_salted_join_validation(spark):
    import pytest as _pytest
    from xoverrr_spark.operators.salting import salted_join

    big = spark.createDataFrame([(1, 2)], "k bigint, v int")
    small = spark.createDataFrame([(1, "a")], "k bigint, name string")
    with _pytest.raises(ValueError, match="salt must be >= 2"):
        salted_join(big, small, ["k"], salt=1)
    with _pytest.raises(ValueError, match="left-preserving"):
        salted_join(big, small, ["k"], how="right")
    with _pytest.raises(ValueError, match="not found"):
        salted_join(big, small, ["nope"])
    with _pytest.raises(ValueError, match="reserved"):
        salted_join(big.withColumn("_salt", F.lit(1)), small, ["k"])


def test_salted_join_map_columns_and_salt_cols(spark):
    """MapType columns are unhashable in Spark — the default salt hash
    must skip them; explicit salt_cols (the binary-payload escape hatch)
    must be honored and validated."""
    import pytest as _pytest
    from collections import Counter
    from xoverrr_spark.operators.salting import salted_join

    big = spark.createDataFrame(
        [(1, {"a": 1}, 10), (2, {"b": 2}, 20), (1, {"c": 3}, 30)],
        "k bigint, m map<string,int>, v int")
    small = spark.createDataFrame([(1, "x")], "k bigint, name string")

    def norm(rows):  # map cells collect as (unhashable) dicts
        return Counter(
            tuple(tuple(sorted(c.items())) if isinstance(c, dict) else c
                  for c in r)
            for r in rows)

    exp = norm(big.join(small, ["k"]).collect())
    assert norm(salted_join(big, small, ["k"], salt=4).collect()) == exp
    assert norm(salted_join(
        big, small, ["k"], salt=4, salt_cols=["v"]).collect()) == exp
    with _pytest.raises(ValueError, match="salt_cols"):
        salted_join(big, small, ["k"], salt_cols=["nope"])
