"""Streaming CDC upsert: maintain a keyed table from a change-row stream.

The micro-batch MERGE pattern: each batch of change rows (op 'U'/'D',
optional version) folds into the current table snapshot with
``operators.merge.apply_changes`` inside ``foreachBatch`` — the standard
way to run MERGE semantics on a plain-parquet sink (an Iceberg/Delta
deployment swaps the snapshot-write for a native MERGE INTO; the fold
logic is identical).

Snapshot layout: ``table_dir/v=N/`` parquet per batch + ``table_dir/HEAD``
(a text file holding N). The write is new-version-then-flip-HEAD, so a
crash mid-write never corrupts the readable snapshot (the half-written
version is simply never referenced); restart resumes from the checkpoint
offset and re-folds the batch onto the last committed HEAD — apply_changes
is idempotent for a replayed batch (same winners per key), so
exactly-once table state comes from at-least-once batch delivery. A crash
in the window BETWEEN the HEAD flip and the checkpoint commit replays a
batch whose snapshot is already HEAD — that replay short-circuits on
``HEAD == batch_id`` (re-folding would read from and overwrite the same
``v=<batch_id>`` path, which Spark rejects, wedging the stream).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_merged_table(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """Current snapshot (None before the first commit)."""
    head = os.path.join(table_dir, "HEAD")
    if not os.path.exists(head):
        return None
    with open(head) as fh:
        v = fh.read().strip()
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def make_merge_batch_fn(
    spark: SparkSession,
    table_dir: str,
    keys: list[str],
    op_col: str | None = "op",
    version_col: str | None = None,
):
    """The foreachBatch function: fold this batch into the snapshot."""
    from ..operators.merge import apply_changes

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(table_dir, exist_ok=True)
        head_path = os.path.join(table_dir, "HEAD")
        if os.path.exists(head_path):
            with open(head_path) as fh:
                if fh.read().strip() == str(batch_id):
                    # Crash landed between the HEAD flip and the checkpoint
                    # commit: this batch is already folded into the snapshot.
                    # Re-folding would read v=<batch_id> (now HEAD) and
                    # overwrite the same path, which Spark rejects ("Cannot
                    # overwrite a path that is also being read from") — the
                    # stream would be permanently stuck. Skip; the checkpoint
                    # commit then completes and the stream moves on.
                    return
        current = read_merged_table(spark, table_dir)
        data_cols = [
            c for c in batch_df.columns if c not in (op_col, version_col)
        ]
        if current is None:
            base = batch_df.select(*data_cols).limit(0)
        else:
            base = current
        merged = apply_changes(
            base, batch_df, keys, op_col=op_col, version_col=version_col
        )
        out = os.path.join(table_dir, f"v={batch_id}")
        merged.write.mode("overwrite").parquet(out)
        tmp = os.path.join(table_dir, "HEAD.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(table_dir, "HEAD"))

    return _merge


def run_stream_merge(
    changes_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    op_col: str | None = "op",
    version_col: str | None = None,
):
    """Start the maintenance query (availableNow-friendly; caller awaits)."""
    spark = changes_stream.sparkSession
    return (
        changes_stream.writeStream.foreachBatch(
            make_merge_batch_fn(spark, table_dir, keys, op_col, version_col)
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
