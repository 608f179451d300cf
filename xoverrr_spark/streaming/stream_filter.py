"""Structured-Streaming form of the quality filter.

The reference has no streaming analogue (its "incremental" axis is
date-chunked batch, SURVEY.md §2.9) — this is the Spark-native extension:
the rule/scrub/langid/perplexity stages are stateless per-row transforms,
so the SAME plan builder (``pipeline.quality_filter.quality_filter``) runs
unchanged on a streaming DataFrame. New image batches landing in a
directory (or Kafka topic / Iceberg incremental scan in production) are
filtered continuously with checkpointed exactly-once file output.

Also provided: a watermarked per-minute drop-reason metrics stream — the
streaming twin of ``operators.sniff.drop_reason_breakdown``, tolerating
late events via watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures.images import IMAGES_SCHEMA
from ..pipeline.quality_filter import quality_filter


def stream_quality_filter(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    with_ppl: bool = True,
):
    """File-source stream -> quality filter -> parquet sink.

    ``available_now=True`` drains everything currently present and stops
    (used by tests and backfills); False runs continuously.
    """
    src = (
        spark.readStream.schema(IMAGES_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )
    decisions = quality_filter(src, with_ppl=with_ppl)
    writer = (
        decisions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_drop_reason_metrics(
    decisions_stream: DataFrame,
    event_time_col: str = "event_time",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed per-reason issue counts with late-data tolerance."""
    return (
        decisions_stream.withWatermark(event_time_col, watermark)
        .select(F.col(event_time_col), F.explode("drop_reasons").alias("reason"))
        .groupBy(F.window(event_time_col, window), "reason")
        .agg(F.count(F.lit(1)).alias("issue_count"))
    )
