"""Text / JSON run reports — the shape of the reference's reporting layer
(``/root/reference/src/xoverrr/reporting.py:208-503``): run header, score
block, per-column breakdown, bounded examples, tolerance verdict.
Driver-side string templating over already-aggregated numbers only.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

_RULE = "=" * 80


def _now_utc_str() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


def _header(check_name: str, run_id: str) -> list[str]:
    return [
        _RULE,
        _now_utc_str(),
        f"run_id: {run_id}",
        f"check: {check_name}",
    ]


def _fmt(x) -> str:
    if isinstance(x, float):
        return f"{x:.5f}"
    return str(x)


def format_report_collection(value) -> str:
    """Collection rendering for report lines (reference utils.py:22-34):
    None/empty -> '', sets sorted by str, sequences in order, comma-joined.
    Key tuples print as-is; single-column keys were already unwrapped to
    scalars when the examples were built (reference format_keys,
    utils.py:978-982 — mirrored by compare_frames._tuples)."""
    if value is None:
        return ""
    if isinstance(value, (set, frozenset)):
        return ", ".join(str(x) for x in sorted(value, key=str))
    if isinstance(value, (tuple, list)):
        return ", ".join(str(x) for x in value)
    return str(value)


def render_samples_report(check_name, run_id, status, stats, details, tolerance_pct) -> str:
    """Full field set of the reference's sample report
    (reporting.py:208-340): run header, summary counters, pct block with
    both scores, the FOUR key-example collections, evaluated + skipped
    column lists, and the issue-breakdown section with its max-issue-pct
    line — pinned by tests/test_report_fields.py."""
    lines = _header(check_name, run_id)
    if stats is None:
        lines += ["both sides empty -> SKIPPED", _RULE]
        return "\n".join(lines)
    lines += [
        "",
        f"source rows: {stats.total_source_rows}   target rows: {stats.total_target_rows}",
        f"duplicates: src={stats.dup_source_rows} ({_fmt(stats.dup_source_rows_pct)}%)"
        f"  trg={stats.dup_target_rows} ({_fmt(stats.dup_target_rows_pct)}%)",
        f"key-only rows: src_only={stats.only_source_rows} ({_fmt(stats.source_only_rows_pct)}%)"
        f"  trg_only={stats.only_target_rows} ({_fmt(stats.target_only_rows_pct)}%)",
        f"comparable rows: {stats.comparable_rows}   matched: {stats.passed_rows}"
        f"   issues: {_fmt(stats.issue_rows_pct)}%",
        f"final score: {_fmt(stats.final_score)} (diff {_fmt(stats.final_diff_score)},"
        f" tolerance {_fmt(tolerance_pct)}) -> {status.upper()}",
    ]
    if details:
        lines += [
            f"source-only key examples: "
            f"{format_report_collection(details.source_only_keys_examples)}",
            f"target-only key examples: "
            f"{format_report_collection(details.target_only_keys_examples)}",
            f"duplicated source key examples: "
            f"{format_report_collection(details.dup_source_keys_examples)}",
            f"duplicated target key examples: "
            f"{format_report_collection(details.dup_target_keys_examples)}",
            f"evaluated columns: "
            f"{format_report_collection(details.evaluated_columns)}",
            f"skipped source columns: "
            f"{format_report_collection(details.skipped_source_columns)}",
            f"skipped target columns: "
            f"{format_report_collection(details.skipped_target_columns)}",
        ]
    if details and details.issue_breakdown:
        lines += [
            "",
            "ISSUE BREAKDOWN (column: count):",
            f"  max issue %: {_fmt(stats.max_issue_pct)}",
        ]
        lines += [f"  {c}: {n}" for c, n in details.issue_breakdown]
    if details and details.issue_examples:
        lines += ["", "EXAMPLES (pk | column | source -> target):"]
        lines += [
            f"  {e['primary_key']} | {e['column_name']} | "
            f"{e['source_value']!r} -> {e['target_value']!r}"
            for e in details.issue_examples
        ]
    lines.append(_RULE)
    return "\n".join(lines)


def render_counts_report(check_name, run_id, status, cstats, discrepancies, tolerance_pct) -> str:
    lines = _header(check_name, run_id)
    lines += [
        "",
        f"source total: {cstats.total_source}   target total: {cstats.total_target}",
        f"abs diff sum: {cstats.diff_sum}   common sum: {cstats.common_sum}",
        f"diff pct: {_fmt(cstats.diff_pct)} (tolerance {_fmt(tolerance_pct)})"
        f" -> {status.upper()}",
        # reference prints BOTH scores (reporting.py:484-485): the
        # discrepancy score (== diff pct) and the quality score (100 - pct)
        f"final score: {_fmt(cstats.final_score)} (diff {_fmt(cstats.diff_pct)})",
        f"mismatched days: {cstats.mismatched_days}",
    ]
    if discrepancies:
        lines += ["", "DAY MISMATCHES (dt: src vs trg):"]
        lines += [
            f"  {r['dt']}: {r['src_cnt']} vs {r['trg_cnt']} (d={r['diff']})"
            for r in discrepancies[:20]
        ]
    lines.append(_RULE)
    return "\n".join(lines)


def render_sniff_report(check_name, run_id, status, stats, histogram, examples, tolerance_pct) -> str:
    lines = _header(check_name, run_id)
    lines += [
        "",
        f"total rows: {stats.total_rows}   passed: {stats.passed_rows}"
        f"   issues: {stats.issue_rows} ({_fmt(stats.issue_rows_pct)}%)",
        # sniff's discrepancy score IS the issue pct (reference
        # reporting.py:384-386 prints both scores; build_sniff_issue_stats
        # sets final_diff_score = issue_rows_pct)
        f"final score: {_fmt(stats.final_score)} (diff {_fmt(stats.issue_rows_pct)},"
        f" tolerance {_fmt(tolerance_pct)}) -> {status.upper()}",
    ]
    if histogram:
        lines += ["", "STATUS VALUES:"]
        lines += [f"  {r['status_value']}: {r['count']}" for r in histogram]
    if examples:
        lines += ["", f"ISSUE ROW EXAMPLES ({len(examples)}):"]
        lines += [f"  {tuple(r)}" for r in examples]
    lines.append(_RULE)
    return "\n".join(lines)


REPORT_OUTPUT_FORMAT_TEXT = "text"
REPORT_OUTPUT_FORMAT_JSON = "json"
REPORT_OUTPUT_FORMATS = (REPORT_OUTPUT_FORMAT_TEXT, REPORT_OUTPUT_FORMAT_JSON)


def validate_report_output_format(report_output_format: str | None) -> str:
    """Normalize + validate (reference reporting.py:146-156)."""
    fmt = (report_output_format or REPORT_OUTPUT_FORMAT_TEXT).lower()
    if fmt not in REPORT_OUTPUT_FORMATS:
        raise ValueError(
            "report_output_format must be either 'json' or 'text', "
            f"got {report_output_format!r}"
        )
    return fmt


def _convert(v):
    """JSON-friendly recursive conversion (reference CheckResult.to_dict
    value converter, reporting.py:62-92)."""
    from dataclasses import asdict, is_dataclass

    from pyspark.sql import Row

    if v is None:
        return None
    if is_dataclass(v) and not isinstance(v, type):
        return {k: _convert(x) for k, x in asdict(v).items()}
    if isinstance(v, Row):
        return {k: _convert(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {k: _convert(x) for k, x in v.items()}
    if isinstance(v, (list, tuple, set, frozenset)):
        return [_convert(x) for x in v]
    return v


def check_result_json(
    *,
    run_id,
    check_type,
    status,
    check_name=None,
    check_tags=None,
    report=None,
    source_table=None,
    target_table=None,
    timezone=None,
    stats=None,
    details=None,
    source_query=None,
    target_query=None,
) -> str:
    """Full result envelope for EVERY check type (reference
    CheckResult.to_dict + format_check_result, reporting.py:55-205)."""
    payload = {
        "timestamp": _now_utc_str(),
        "run_id": run_id,
        "check_type": check_type,
        "status": status,
        "check_name": check_name,
        "check_tags": check_tags,
        "report": report,
        "source_table": source_table if isinstance(source_table, str) else None,
        "target_table": target_table if isinstance(target_table, str) else None,
        "timezone": timezone,
    }
    if stats is not None:
        payload["stats"] = _convert(stats)
    if details is not None:
        payload["details"] = _convert(details)
    if source_query:
        payload["source_query"] = source_query
    if target_query:
        payload["target_query"] = target_query
    return json.dumps(payload, indent=2, ensure_ascii=False, default=str)
