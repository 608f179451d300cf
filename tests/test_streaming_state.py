"""RocksDB state store: the provider actually engages and results match.

Runs the same windowed-counts drain twice — default (HDFS-heap) provider
and RocksDB — and asserts (a) identical results, (b) RocksDB-specific
custom metrics in the query progress (the proof it really ran RocksDB,
not a silently-ignored conf), (c) the provider snapshot/restore helpers
round-trip the session conf.
"""

from datetime import datetime as dt

import pandas as pd
import pytest

from xoverrr_spark.streaming.state import (
    ROCKSDB_PROVIDER,
    restore_state_conf,
    rocksdb_state_conf,
    use_rocksdb_state,
)
from xoverrr_spark.streaming.stream_counts import windowed_counts

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _write(path, rows):
    pdf = pd.DataFrame(rows, columns=["event_type", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(path)


def _drain(spark, src_dir, checkpoint):
    rows = []
    stream = spark.readStream.schema(
        "event_type string, ts timestamp").parquet(src_dir)
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
    progress = [p for p in q.recentProgress if p.get("stateOperators")]
    return {(r.window_start, r.event_type): r.cnt for r in rows}, progress


def test_rocksdb_state_store_engages_and_matches_default(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write(src / "a.parquet", [
        ("x", dt(2024, 1, 1, 0, 0, 10)),
        ("x", dt(2024, 1, 1, 0, 0, 20)),
        ("y", dt(2024, 1, 1, 0, 9, 30)),
        ("x", dt(2024, 1, 1, 0, 10, 0)),
    ])

    got_default, prog_default = _drain(
        spark, str(src), str(tmp_path / "ckpt_default"))
    metrics_default = {
        k for p in prog_default for op in p["stateOperators"]
        for k in op.get("customMetrics", {})}
    assert not any("rocksdb" in k.lower() for k in metrics_default)

    prev = use_rocksdb_state(spark, bounded_memory_mb=512)
    try:
        assert spark.conf.get(_PROVIDER_KEY) == ROCKSDB_PROVIDER
        # provider is fixed at checkpoint creation -> FRESH checkpoint
        got_rocks, prog_rocks = _drain(
            spark, str(src), str(tmp_path / "ckpt_rocks"))
    finally:
        restore_state_conf(spark, prev)

    assert got_rocks == got_default and got_rocks
    metrics_rocks = {
        k for p in prog_rocks for op in p["stateOperators"]
        for k in op.get("customMetrics", {})}
    assert any("rocksdb" in k.lower() for k in metrics_rocks), metrics_rocks

    # session conf restored exactly
    assert spark.conf.get(_PROVIDER_KEY, None) != ROCKSDB_PROVIDER


def test_rocksdb_conf_shape_and_validation(spark):
    conf = rocksdb_state_conf()
    assert conf[_PROVIDER_KEY] == ROCKSDB_PROVIDER
    assert "maxMemoryUsageMB" not in str(conf)  # unbounded unless asked
    bounded = rocksdb_state_conf(bounded_memory_mb=256,
                                 changelog_checkpointing=False)
    assert bounded[
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"] == "256"
    assert bounded[
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    ] == "false"
    with pytest.raises(ValueError, match="bounded_memory_mb"):
        rocksdb_state_conf(bounded_memory_mb=0)
