"""Date-chunk iteration + cross-chunk accumulator merge.

Behavior matched from the reference (``/root/reference/src/xoverrr/
core.py:1447-1483`` ``_iter_date_chunks``; goldens
``tests/unit/test_core_chunking.py:23-38``): inclusive chunk ends,
remainder chunk, single full range when chunking is off, ValueError on
non-positive sizes / inverted ranges.

On Spark a single distributed plan normally covers the whole range (the
chunk loop exists in the reference to bound single-process memory), but
chunked execution remains useful for bounded-retry orchestration and the
chunked==unchunked equivalence is a correctness invariant the reference
pins (``tests/integration/self_db/postgres/test_postgres_chunking_yearly.py:64``)
— mirrored in ``tests/test_chunking.py``.
"""

from __future__ import annotations

from datetime import date, timedelta

from .operators.diff import CheckStats, build_check_stats


def iter_date_chunks(
    start_date: str | None,
    end_date: str | None,
    chunk_size_days: int | None,
) -> list[tuple[str | None, str | None]]:
    if chunk_size_days is not None and chunk_size_days <= 0:
        raise ValueError("chunk_size_days must be greater than 0")
    if not (chunk_size_days and start_date is not None and end_date is not None):
        return [(start_date, end_date)]

    start = date.fromisoformat(start_date)
    end = date.fromisoformat(end_date)
    if start > end:
        raise ValueError(f"date_range start {start_date} is greater than end {end_date}")

    chunks: list[tuple[str, str]] = []
    current = start
    while current <= end:
        chunk_end = min(current + timedelta(days=chunk_size_days - 1), end)
        chunks.append((current.isoformat(), chunk_end.isoformat()))
        current = chunk_end + timedelta(days=1)
    return chunks


def merge_chunk_stats(
    per_chunk: list[CheckStats | None],
    issue_counts_per_chunk: list[dict[str, int]] | None = None,
) -> CheckStats | None:
    """Cross-chunk accumulator merge (reference A10, core.py:1508-1640):
    sum the raw counters across chunks, then recompute every percentage and
    the weighted score from the totals."""
    real = [s for s in per_chunk if s is not None]
    if not real:
        return None
    merged_issues: dict[str, int] = {}
    for d in issue_counts_per_chunk or []:
        for col, n in d.items():
            merged_issues[col] = merged_issues.get(col, 0) + n
    return build_check_stats(
        sum(s.total_source_rows for s in real),
        sum(s.total_target_rows for s in real),
        sum(s.dup_source_rows for s in real),
        sum(s.dup_target_rows for s in real),
        sum(s.only_source_rows for s in real),
        sum(s.only_target_rows for s in real),
        sum(s.comparable_rows for s in real),
        sum(s.passed_rows for s in real),
        [n for n in merged_issues.values() if n > 0],
    )
