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


def test_stream_merge_fresh_checkpoint_over_existing_table_is_not_skipped(
        spark, tmp_path):
    """r4 ADVICE: the bare HEAD==batch_id short-circuit silently dropped
    batch 0 of a NEW query (fresh checkpoint) over a reused table_dir.
    The short-circuit now requires the lineage token to match too, and
    versions are decoupled from batch ids so the re-fold never collides
    with the path being read."""
    import json
    import os

    from xoverrr_spark.streaming.stream_merge import make_merge_batch_fn

    table = str(tmp_path / "t4")
    ck_a, ck_b = tmp_path / "cka", tmp_path / "ckb"
    for ck, qid in ((ck_a, "query-A"), (ck_b, "query-B")):
        ck.mkdir()
        (ck / "metadata").write_text(json.dumps({"id": qid}))

    fn_a = make_merge_batch_fn(spark, table, ["k"], checkpoint_dir=str(ck_a))
    b0 = spark.createDataFrame([(1, "a1", "U")], "k bigint, v string, op string")
    fn_a(b0, 0)
    assert {r.k: r.v for r in read_merged_table(spark, table).collect()} == {1: "a1"}
    # replay of the SAME lineage + batch id: short-circuits (idempotent)
    fn_a(b0, 0)
    assert os.path.exists(f"{table}/v=0") and not os.path.exists(f"{table}/v=1")

    # a DIFFERENT lineage delivering batch id 0 must FOLD, not skip
    fn_b = make_merge_batch_fn(spark, table, ["k"], checkpoint_dir=str(ck_b))
    b0_new = spark.createDataFrame(
        [(2, "b1", "U")], "k bigint, v string, op string")
    fn_b(b0_new, 0)
    got = {r.k: r.v for r in read_merged_table(spark, table).collect()}
    assert got == {1: "a1", 2: "b1"}          # new data landed — no loss
    assert os.path.exists(f"{table}/v=1")     # version chain continued


def test_stream_merge_reads_pre_r5_single_line_head(spark, tmp_path):
    """Backward compat: a HEAD file with only a version line (pre-stamp
    layout) still reads, and the next fold continues the version chain."""
    from xoverrr_spark.streaming.stream_merge import make_merge_batch_fn

    table = tmp_path / "t5"
    table.mkdir()
    spark.createDataFrame([(1, "old")], "k bigint, v string").write.parquet(
        str(table / "v=7"))
    (table / "HEAD").write_text("7")
    assert {r.k: r.v for r in read_merged_table(spark, str(table)).collect()} == {
        1: "old"}
    fn = make_merge_batch_fn(spark, str(table), ["k"])
    fn(spark.createDataFrame([(2, "new", "U")], "k bigint, v string, op string"), 7)
    # old layout has no stamp -> no short-circuit even at matching id
    got = {r.k: r.v for r in read_merged_table(spark, str(table)).collect()}
    assert got == {1: "old", 2: "new"}
