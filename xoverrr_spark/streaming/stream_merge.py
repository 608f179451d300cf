"""Streaming CDC upsert: maintain a keyed table from a change-row stream.

The micro-batch MERGE pattern: each batch of change rows (op 'U'/'D',
optional version) folds into the current table snapshot with
``operators.merge.apply_changes`` inside ``foreachBatch`` — the standard
way to run MERGE semantics on a plain-parquet sink (an Iceberg/Delta
deployment swaps the snapshot-write for a native MERGE INTO; the fold
logic is identical).

Snapshot layout: ``table_dir/v=N/`` parquet per committed fold plus
``table_dir/HEAD``, a text file of up to three lines::

    <version>          # the committed snapshot: read table_dir/v=<version>
    <lineage token>    # checkpoint identity of the query that wrote it
    <last batch id>    # that query's batch id for the fold

The snapshot VERSION is a monotone counter independent of the stream's
batch id: a fresh write always targets ``v=<HEAD+1>``, so a fold can
never read from and overwrite the same path, whatever batch numbering
the (possibly brand-new) checkpoint hands us.

Crash safety: the write is new-version-then-flip-HEAD, so a crash
mid-write never corrupts the readable snapshot (the half-written version
is simply never referenced); restart resumes from the checkpoint offset
and re-folds the batch onto the last committed HEAD — ``apply_changes``
is idempotent for a replayed batch (same winners per key), so
exactly-once table state comes from at-least-once batch delivery. A
crash in the window BETWEEN the HEAD flip and the checkpoint commit
replays a batch whose fold is already committed; that replay
short-circuits ONLY when BOTH the lineage token and the batch id match
the HEAD stamp — a genuinely-new query (fresh checkpoint = new token)
re-delivering the same batch NUMBER over a reused ``table_dir`` is a
different batch and folds normally (r4 ADVICE: the bare ``HEAD ==
batch_id`` test silently dropped batch 0 of a fresh checkpoint over an
existing table — data loss with no error).

The lineage token is the checkpoint's stable query id
(``<checkpoint_dir>/metadata`` → ``{"id": ...}``, written at query start
and constant across restarts of the same checkpoint). Direct callers
without a checkpoint (unit drivers) share the fixed token ``"adhoc"`` —
same-process replay detection still works; cross-lineage reuse there is
at worst a harmless idempotent re-fold, never a skip of new data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _read_head(table_dir: str) -> tuple[int, str | None, int | None] | None:
    """(version, lineage_token, last_batch_id) or None before first commit.

    Tolerates the pre-r5 single-line layout (version only, no stamp)."""
    head = os.path.join(table_dir, "HEAD")
    if not os.path.exists(head):
        return None
    with open(head) as fh:
        lines = fh.read().splitlines()
    version = int(lines[0].strip())
    token = lines[1].strip() if len(lines) > 1 else None
    batch = int(lines[2].strip()) if len(lines) > 2 else None
    return version, token, batch


def read_merged_table(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """Current snapshot (None before the first commit)."""
    head = _read_head(table_dir)
    if head is None:
        return None
    return spark.read.parquet(os.path.join(table_dir, f"v={head[0]}"))


def _lineage_token(checkpoint_dir: str | None) -> str:
    """Stable identity of the streaming query lineage: the checkpoint's
    query id (constant across restarts of one checkpoint, fresh for a
    fresh checkpoint). Falls back to 'adhoc' for checkpoint-less callers."""
    if not checkpoint_dir:
        return "adhoc"
    meta = os.path.join(checkpoint_dir, "metadata")
    if os.path.exists(meta):
        try:
            with open(meta) as fh:
                return str(json.load(fh).get("id", "adhoc"))
        except (ValueError, OSError):
            return "adhoc"
    return "adhoc"


def make_merge_batch_fn(
    spark: SparkSession,
    table_dir: str,
    keys: list[str],
    op_col: str | None = "op",
    version_col: str | None = None,
    checkpoint_dir: str | None = None,
):
    """The foreachBatch function: fold this batch into the snapshot."""
    from ..operators.merge import apply_changes

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(table_dir, exist_ok=True)
        head = _read_head(table_dir)
        token = _lineage_token(checkpoint_dir)
        if head is not None and head[1] == token and head[2] == batch_id:
            # Crash landed between the HEAD flip and the checkpoint commit:
            # THIS query already folded THIS batch (token + batch id both
            # match the stamp). Skip; the checkpoint commit then completes
            # and the stream moves on. A matching batch NUMBER from a
            # different lineage (fresh checkpoint over a reused table_dir)
            # does NOT match the token and folds normally below.
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
        version = head[0] + 1 if head is not None else 0
        out = os.path.join(table_dir, f"v={version}")
        # version > HEAD always: the write path can never be the path being
        # read, so no "cannot overwrite a path being read from" hazard
        merged.write.mode("overwrite").parquet(out)
        tmp = os.path.join(table_dir, "HEAD.tmp")
        with open(tmp, "w") as fh:
            fh.write(f"{version}\n{token}\n{batch_id}")
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
            make_merge_batch_fn(
                spark, table_dir, keys, op_col, version_col,
                checkpoint_dir=checkpoint_dir,
            )
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
