"""Streaming quality filter: availableNow drain equals the batch result,
and incremental batches are picked up from the same checkpoint."""

import pandas as pd

from xoverrr_spark.fixtures.images import generate_images_pdf, IMAGES_SCHEMA
from xoverrr_spark.pipeline.quality_filter import quality_filter
from xoverrr_spark.streaming.stream_filter import stream_quality_filter


def _write_batch(spark, pdf, path):
    spark.createDataFrame(pdf, schema=IMAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    pdf = generate_images_pdf(300, 42)
    _write_batch(spark, pdf.iloc[:200], inp)

    q = stream_quality_filter(spark, inp, out, ckpt, available_now=True)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == 200

    # second micro-batch: only the new files are processed (checkpoint)
    _write_batch(spark, pdf.iloc[200:], inp)
    q2 = stream_quality_filter(spark, inp, out, ckpt, available_now=True)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(out).toPandas().sort_values("image_id").reset_index(drop=True)
    assert len(got2) == 300

    batch = (
        quality_filter(spark.createDataFrame(pdf, schema=IMAGES_SCHEMA))
        .toPandas().sort_values("image_id").reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got2["keep"], batch["keep"])
    pd.testing.assert_series_equal(got2["caption_scrubbed"], batch["caption_scrubbed"])
