"""Stream-stream interval join: batch parity on a finite drain, and
late-data drop pinned ACROSS a checkpoint restart (the same two-run,
one-checkpoint protocol as test_stream_counts)."""

from datetime import datetime as dt

import pandas as pd

from xoverrr_spark.streaming.stream_join import interval_join


def _write(path, rows, cols):
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark can't read ns
    pdf.to_parquet(path)


def _drain(spark, left_dir, right_dir, ckpt):
    rows = []
    l = spark.readStream.schema("k bigint, lv string, ts timestamp").parquet(left_dir)
    r = spark.readStream.schema("k bigint, rv string, ts timestamp").parquet(right_dir)
    q = (
        interval_join(l, r, "k", watermark_delay="2 minutes",
                      interval="5 minutes")
        .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {(r.k, r.lv, r.rv) for r in rows}


T0 = dt(2024, 1, 1, 0, 0, 0)


def _t(m, s=0):
    return dt(2024, 1, 1, 0, m, s)


def test_interval_join_matches_batch_and_drops_late(spark, tmp_path):
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(), rdir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # run 1: impressions at 00:00/00:01, clicks in and out of the 5-minute
    # window, plus a 00:20 row on each side to advance the watermark to 00:18
    _write(ldir / "a.parquet",
           [(1, "imp1", _t(0)), (2, "imp2", _t(1)), (9, "wm", _t(20))],
           ["k", "lv", "ts"])
    _write(rdir / "a.parquet",
           [(1, "click_in", _t(3)),        # inside (00:00, 00:05]
            (1, "click_out", _t(6)),       # outside the interval
            (2, "click_in2", _t(5, 59)),   # inside (00:01, 00:06]
            (3, "no_imp", _t(2)),          # key never impressed
            (9, "wm", _t(20, 1))],
           ["k", "rv", "ts"])
    got1 = _drain(spark, str(ldir), str(rdir), ckpt)
    assert got1 == {(1, "imp1", "click_in"), (2, "imp2", "click_in2"),
                    (9, "wm", "wm")}

    # batch parity on the same finite inputs
    lb = spark.read.parquet(str(ldir))
    rb = spark.read.parquet(str(rdir))
    batch = {
        (r.k, r.lv, r.rv)
        for r in interval_join(lb, rb, "k").collect()
    }
    assert batch == got1

    # run 2 (restart, same checkpoint): a matching click OLDER than the
    # watermark (00:18) joins nothing — its impression's state is evicted;
    # a fresh in-time pair still joins.
    _write(rdir / "b.parquet", [(1, "too_late", _t(4, 30))], ["k", "rv", "ts"])
    _write(ldir / "b.parquet", [(5, "imp5", _t(21))], ["k", "lv", "ts"])
    got2 = _drain(spark, str(ldir), str(rdir), ckpt)
    assert not any(r[2] == "too_late" for r in got2), got2

    _write(ldir / "c.parquet", [(6, "imp6", _t(22))], ["k", "lv", "ts"])
    _write(rdir / "c.parquet", [(6, "click6", _t(23))], ["k", "rv", "ts"])
    got3 = _drain(spark, str(ldir), str(rdir), ckpt)
    assert (6, "imp6", "click6") in got3


def test_interval_join_null_keys_and_collisions(spark):
    import pytest

    l = spark.createDataFrame(
        [(None, "a", T0), (1, "b", T0)], "k bigint, lv string, ts timestamp")
    r = spark.createDataFrame(
        [(None, "x", _t(1)), (1, "y", _t(1))], "k bigint, rv string, ts timestamp")
    got = interval_join(l, r, "k").collect()
    # null keys filtered (stated in docstring), the real pair joins
    assert [(x.k, x.lv, x.rv) for x in got] == [(1, "b", "y")]

    bad = r.withColumnRenamed("rv", "lv")
    with pytest.raises(ValueError, match="collide"):
        interval_join(l, bad, "k")

    with pytest.raises(ValueError, match="join_type"):
        interval_join(l, r, "k", join_type="full_outer")


def test_interval_join_left_outer_emits_unmatched(spark):
    # batch form sanity for the left_outer variant: unmatched left rows
    # survive with null right columns
    l = spark.createDataFrame(
        [(1, "hit", T0), (2, "miss", T0)], "k bigint, lv string, ts timestamp")
    r = spark.createDataFrame(
        [(1, "y", _t(1))], "k bigint, rv string, ts timestamp")
    got = {(x.k, x.lv, x.rv)
           for x in interval_join(l, r, "k", join_type="left_outer").collect()}
    assert got == {(1, "hit", "y"), (2, "miss", None)}


def test_interval_join_null_timestamps_never_match(spark):
    """A null event time has no interval position: inner drops the row,
    left_outer keeps the left row unmatched — never a phantom match."""
    from datetime import datetime as dt

    l = spark.createDataFrame(
        [(1, "a", None), (1, "b", dt(2024, 1, 1))],
        "k bigint, lv string, ts timestamp")
    r = spark.createDataFrame(
        [(1, "x", dt(2024, 1, 1, 0, 1)), (1, "y", None)],
        "k bigint, rv string, ts timestamp")
    assert [(x.lv, x.rv) for x in interval_join(l, r, "k").collect()] == [("b", "x")]
    assert sorted(
        (x.lv, x.rv)
        for x in interval_join(l, r, "k", join_type="left_outer").collect()
    ) == [("a", None), ("b", "x")]


def test_interval_join_reserved_names_guarded_and_prenamed_ts_ok(spark):
    """Reserved output names ('left_ts'/'right_ts'/'_r_key') in the inputs
    raise up front instead of being silently overwritten — EXCEPT a ts
    column that already carries its own output name, which is cast in
    place (the old withColumn+drop pair self-destructed it: r4 ADVICE)."""
    import pytest

    l = spark.createDataFrame(
        [(1, "a", T0)], "k bigint, lv string, left_ts timestamp")
    r = spark.createDataFrame(
        [(1, "x", _t(1))], "k bigint, rv string, ts timestamp")
    # left_ts_col='left_ts' is the legitimate pre-named case: works
    got = interval_join(l, r, "k", left_ts_col="left_ts").collect()
    assert [(x.k, x.lv, x.rv) for x in got] == [(1, "a", "x")]
    # ...and symmetrically for the right side
    r2 = r.withColumnRenamed("ts", "right_ts")
    got2 = interval_join(
        l, r2, "k", left_ts_col="left_ts", right_ts_col="right_ts").collect()
    assert [(x.lv, x.rv) for x in got2] == [("a", "x")]

    # a NON-ts column squatting on a reserved name raises
    plain_l = spark.createDataFrame(
        [(1, "a", T0)], "k bigint, lv string, ts timestamp")
    for side, bad_col in (("left", "right_ts"), ("left", "_r_key"),
                          ("right", "left_ts"), ("right", "_r_key")):
        from pyspark.sql import functions as F
        if side == "left":
            badl = plain_l.withColumn(bad_col, F.lit("squat"))
            with pytest.raises(ValueError, match="reserved"):
                interval_join(badl, r, "k")
        else:
            badr = r.withColumn(bad_col, F.lit("squat"))
            with pytest.raises(ValueError, match="reserved"):
                interval_join(plain_l, badr, "k")
