"""Custom stateful streaming operator: cross-batch exact dedup.

``applyInPandasWithState`` keyed by content fingerprint — the first row of
a fingerprint group ever seen (across ALL micro-batches) passes; later
arrivals are dropped. State per key is one boolean, so the state store
stays O(distinct fingerprints); a production deployment would add a state
TTL (``GroupStateTimeout.ProcessingTimeTimeout``) to bound it over
unbounded streams.

This is the streaming twin of ``operators.dedup.exact_dedup`` and covers
the "custom stateful operator" axis the stateless pipeline doesn't touch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.tokens import fingerprint

OUTPUT_SCHEMA = "image_id string, caption string, text_fp string"
STATE_SCHEMA = "seen boolean"


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    already_seen = state.exists and state.get[0]
    emitted = False
    for pdf in pdfs:
        if already_seen or emitted or pdf.empty:
            continue
        first = pdf.sort_values("image_id").head(1)
        yield first
        emitted = True
    if emitted or already_seen:
        state.update((True,))


def stream_dedup(
    images_stream: DataFrame,
    id_col: str = "image_id",
    caption_col: str = "caption",
) -> DataFrame:
    """Streaming DataFrame -> deduped streaming DataFrame (first-seen
    representative per caption fingerprint survives, across batches)."""
    keyed = images_stream.select(
        F.col(id_col).alias("image_id"),
        F.col(caption_col).alias("caption"),
        fingerprint(F.col(caption_col)).alias("text_fp"),
    )
    return keyed.groupBy("text_fp").applyInPandasWithState(
        _first_seen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
