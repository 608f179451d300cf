"""Streaming CDC upsert: two availableNow runs over one checkpoint fold
successive change batches into the snapshot; the final table equals a
batch apply_changes of all changes in order."""

import pandas as pd

from xoverrr_spark.streaming.stream_merge import read_merged_table, run_stream_merge


def _write(path, rows):
    pd.DataFrame(rows, columns=["k", "v", "op"]).to_parquet(path)


def _drain(spark, src, table, ckpt):
    stream = spark.readStream.schema("k bigint, v string, op string").parquet(src)
    q = run_stream_merge(stream, table, ckpt, ["k"])
    q.awaitTermination(120)
    return {r.k: r.v for r in read_merged_table(spark, table).collect()}


def test_stream_merge_folds_batches_across_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    table, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")

    _write(src / "a.parquet", [(1, "a1", "U"), (2, "b1", "U"), (3, "c1", "U")])
    got1 = _drain(spark, str(src), table, ckpt)
    assert got1 == {1: "a1", 2: "b1", 3: "c1"}

    # batch 2 (a RESTARTED query on the same checkpoint): update 1,
    # delete 2, insert 9
    _write(src / "b.parquet", [(1, "a2", "U"), (2, "b1", "D"), (9, "z1", "U")])
    got2 = _drain(spark, str(src), table, ckpt)
    assert got2 == {1: "a2", 3: "c1", 9: "z1"}


def test_stream_merge_head_flip_is_crash_safe(spark, tmp_path):
    """A version dir without a HEAD flip is never read: HEAD still points
    at the last committed snapshot."""
    import os
    src = tmp_path / "s2"
    src.mkdir()
    table, ckpt = str(tmp_path / "t2"), str(tmp_path / "c2")
    _write(src / "a.parquet", [(1, "x", "U")])
    _drain(spark, str(src), table, ckpt)
    # simulate a crash that wrote v=99 but never flipped HEAD
    spark.createDataFrame([(2, "junk")], "k bigint, v string").write.parquet(
        f"{table}/v=99")
    assert {r.k for r in read_merged_table(spark, table).collect()} == {1}
    assert os.path.exists(f"{table}/HEAD")


def test_stream_merge_replay_after_head_flip_short_circuits(spark, tmp_path):
    """Crash BETWEEN the HEAD flip and the checkpoint commit replays the
    batch whose snapshot is already HEAD. The replay must be a no-op —
    re-folding would read v=<batch_id> (now HEAD) and overwrite the same
    path, which Spark rejects, permanently wedging the stream."""
    from xoverrr_spark.streaming.stream_merge import make_merge_batch_fn

    table = str(tmp_path / "t3")
    batch = spark.createDataFrame(
        [(1, "a1", "U"), (2, "b1", "U")], "k bigint, v string, op string")
    fn = make_merge_batch_fn(spark, table, ["k"])
    fn(batch, 0)
    snap1 = {r.k: r.v for r in read_merged_table(spark, table).collect()}
    assert snap1 == {1: "a1", 2: "b1"}
    # Replay of the SAME batch id (checkpoint commit never happened):
    # without the short-circuit this raises "Cannot overwrite a path that
    # is also being read from".
    fn(batch, 0)
    snap2 = {r.k: r.v for r in read_merged_table(spark, table).collect()}
    assert snap2 == snap1
    # The stream then proceeds normally with the next batch.
    nxt = spark.createDataFrame([(1, "a2", "U")], "k bigint, v string, op string")
    fn(nxt, 1)
    assert {r.k: r.v for r in read_merged_table(spark, table).collect()} == {
        1: "a2", 2: "b1"}
