"""Cross-batch streaming dedup via applyInPandasWithState: duplicates in
batch 2 of fingerprints already seen in batch 1 must NOT be re-emitted."""

from xoverrr_spark.streaming.stateful_dedup import stream_dedup


def _write(spark, rows, path):
    spark.createDataFrame(rows, "image_id string, caption string").coalesce(1) \
        .write.mode("append").parquet(path)


def _drain(spark, inp, out, ckpt):
    src = spark.readStream.schema("image_id string, caption string").parquet(inp)
    q = (
        stream_dedup(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_first_seen_wins_across_batches(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    _write(spark, [("a1", "the dog"), ("a2", "the dog"), ("b1", "the cat")], inp)
    _drain(spark, inp, out, ckpt)
    got1 = spark.read.parquet(out).toPandas()
    # within-batch dedup: one survivor per fingerprint, smallest id
    assert sorted(got1["image_id"]) == ["a1", "b1"]

    # batch 2: 'the dog' again (seen), plus a new caption
    _write(spark, [("c9", "the dog"), ("d1", "the bird")], inp)
    _drain(spark, inp, out, ckpt)
    got2 = spark.read.parquet(out).toPandas()
    assert sorted(got2["image_id"]) == ["a1", "b1", "d1"]  # c9 suppressed by state
