"""Watermarked windowed streaming counts: correctness + late-data semantics.

Two availableNow runs over ONE checkpoint (file source): run 1 sets the
watermark from its max event time; run 2 adds a late-but-in-time row and a
too-late row. Update-mode memory sinks capture exactly the windows each
run touched, so the drop is observable as "no update row for that window".
"""

from datetime import datetime as dt

import pandas as pd
import pytest

from xoverrr_spark.streaming.stream_counts import windowed_counts


def _write(path, rows):
    pdf = pd.DataFrame(rows, columns=["event_type", "ts"])
    # pandas defaults to ns-precision INT64, which Spark can't read as a
    # timestamp — parquet needs MICROS
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(path)


def _drain(spark, src_dir, checkpoint, name):
    # foreachBatch, not the memory sink: memory cannot recover from a
    # checkpoint, and this test NEEDS run 2 to resume run 1's watermark
    rows = []
    stream = spark.readStream.schema("event_type string, ts timestamp").parquet(src_dir)
    q = (
        windowed_counts(stream, window_duration="1 minute",
                        watermark_delay="2 minutes")
        .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {(r.window_start, r.event_type): r.cnt for r in rows}


def test_windowed_counts_late_data_semantics(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two rows in the 00:00 window, one at 00:10 (advances the
    # watermark to 00:08)
    _write(src / "a.parquet", [
        ("x", dt(2024, 1, 1, 0, 0, 10)),
        ("x", dt(2024, 1, 1, 0, 0, 20)),
        ("y", dt(2024, 1, 1, 0, 9, 30)),
        ("x", dt(2024, 1, 1, 0, 10, 0)),
    ])
    got1 = _drain(spark, str(src), ckpt, "wc_run1")
    w = lambda m, s=0: dt(2024, 1, 1, 0, m, s)
    assert got1[(w(0), "x")] == 2
    assert got1[(w(9), "y")] == 1
    assert got1[(w(10), "x")] == 1

    # batch 2: one late-but-in-time row (00:09:40 > watermark 00:08) and
    # one too-late row (00:05 < watermark) that must be dropped
    _write(src / "b.parquet", [
        ("y", dt(2024, 1, 1, 0, 9, 40)),
        ("x", dt(2024, 1, 1, 0, 5, 0)),
    ])
    got2 = _drain(spark, str(src), ckpt, "wc_run2")
    # the in-time late row updated its window...
    assert got2[(w(9), "y")] == 2
    # ...the too-late row produced NO update for its window
    assert (w(5), "x") not in got2
    # and no resurrection of already-final windows
    assert (w(0), "x") not in got2


def test_windowed_counts_matches_batch_groupby(spark, tmp_path):
    """Drain of in-order data == plain batch window aggregation."""
    src = tmp_path / "src2"
    src.mkdir()
    rows = [("t%d" % (i % 3), dt(2024, 1, 1, 0, i % 30, i % 60)) for i in range(300)]
    _write(src / "a.parquet", rows)
    got = _drain(spark, str(src), str(tmp_path / "ckpt2"), "wc_batchcmp")

    from pyspark.sql import functions as F
    batch = (
        spark.read.schema("event_type string, ts timestamp").parquet(str(src))
        .groupBy(F.window(F.col("ts").cast("timestamp"), "1 minute"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want = {(r["window"].start, r.event_type): r.cnt for r in batch.collect()}
    assert got == want and len(want) > 10
