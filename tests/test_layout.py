"""Z-order layout: measured multi-dimension pruning + exact round-trip.

The pruning assertions read real parquet footer min/max via pyarrow —
the same statistics Spark's scan consults — so "z-order prunes both
dimensions" is a measurement, not a hope.
"""

import pytest
from pyspark.sql import functions as F

from xoverrr_spark.operators.layout import (
    candidate_file_fraction,
    interleave_bits,
    write_zordered,
)


def _two_dim(spark, n=200_000):
    return spark.range(n).select(
        (F.xxhash64("id") % 10000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 10000).alias("y"))


def test_interleave_bits_known_values(spark):
    row = spark.range(1).select(
        interleave_bits([F.lit(0b11), F.lit(0b01)], bits=2).alias("z"),
        interleave_bits([F.lit(5)], bits=3).alias("one"),
    ).collect()[0]
    # x bits land at even positions, y bits at odd: 1 | 1<<1 | 1<<2 = 7
    assert row["z"] == 7
    assert row["one"] == 5  # single column = identity on the low bits

    with pytest.raises(ValueError, match="BIGINT"):
        interleave_bits([F.lit(1), F.lit(1)], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        interleave_bits([], bits=4)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = _two_dim(spark)
    rand_p = str(tmp_path / "rand")
    sortx_p = str(tmp_path / "sortx")
    z_p = str(tmp_path / "z")
    df.orderBy(F.rand(7)).repartition(16).write.parquet(rand_p)
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.parquet(sortx_p))
    write_zordered(df, z_p, ["x", "y"], n_files=16, bits=8)

    lo, hi = -9999, -9999 + 1250  # 1/16 of the value span
    frac = {p: (candidate_file_fraction(p, "x", lo, hi),
                candidate_file_fraction(p, "y", lo, hi))
            for p in (rand_p, sortx_p, z_p)}
    # random layout: every file intersects everything
    assert frac[rand_p][0] == 1.0 and frac[rand_p][1] == 1.0
    # single-column sort: prunes its column, nothing on the other
    assert frac[sortx_p][0] <= 0.25 and frac[sortx_p][1] == 1.0
    # z-order: prunes BOTH dimensions (measured 0.31/0.31 here)
    assert frac[z_p][0] <= 0.5 and frac[z_p][1] <= 0.5, frac[z_p]

    # layout never changes content
    got = spark.read.parquet(z_p)
    assert got.count() == df.count()
    assert got.select(F.sum("x"), F.sum("y")).collect() == \
        df.select(F.sum("x"), F.sum("y")).collect()


def test_zorder_nulls_and_validation(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, 1), (5, None), (3, 4), (8, 2)], "x bigint, y bigint")
    p = str(tmp_path / "zn")
    write_zordered(df, p, ["x", "y"], n_files=2, bits=4)
    got = spark.read.parquet(p)
    assert got.count() == 4  # null keys bucket to 0, never dropped
    assert got.filter(F.col("x").isNull()).count() == 1

    with pytest.raises(ValueError, match="not in DataFrame"):
        write_zordered(df, p, ["nope"], n_files=2)
    with pytest.raises(ValueError, match="n_files"):
        write_zordered(df, p, ["x"], n_files=0)
    with pytest.raises(ValueError, match="at least one"):
        write_zordered(df, p, [], n_files=2)


def test_zorder_skewed_column_still_buckets(spark, tmp_path):
    # 90% of x is one hot value: equal-WIDTH bucketing would put the
    # whole table in one z-stripe; equal-frequency splits keep the tail
    # separable so filters on the tail still skip files
    df = spark.range(50_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id"))
        .alias("x"),
        (F.xxhash64("id") % 1000).alias("y"))
    p = str(tmp_path / "zskew")
    write_zordered(df, p, ["x", "y"], n_files=8, bits=6)
    # tail range far from the hot value: most files skippable
    assert candidate_file_fraction(p, "x", 40_000, 50_000) <= 0.5
    assert spark.read.parquet(p).count() == 50_000
