"""Report-field completeness vs the reference's templates (r4 verdict #7).

Line-by-line field audit of the three reference report families
(`/root/reference/src/xoverrr/reporting.py:208-503`): every numeric /
collection the reference prints must appear in our text report. The
audit found THREE real gaps, fixed with these pins: the samples report
omitted the four key-example collections + evaluated/skipped column
lists + the max-issue-pct line; counts omitted the final-quality-score
line; sniff omitted the discrepancy score.
"""

from xoverrr_spark.operators.counts import CountStats
from xoverrr_spark.operators.diff import CheckDetails, build_check_stats
from xoverrr_spark.operators.sniff import SniffStats
from xoverrr_spark.reporting import (
    format_report_collection,
    render_counts_report,
    render_samples_report,
    render_sniff_report,
)


def _details():
    return CheckDetails(
        issue_breakdown=[("amount", 7), ("city", 2)],
        issue_examples=[
            {"primary_key": "41", "column_name": "amount",
             "source_value": "1.5", "target_value": "2.5"},
        ],
        dup_source_keys_examples=(11, 12),
        dup_target_keys_examples=(13,),
        source_only_keys_examples=(1, 2, 3),
        target_only_keys_examples=((9, "b"),),   # composite keys stay tuples
        evaluated_columns=["amount", "city"],
        skipped_source_columns=["src_extra"],
        skipped_target_columns=["trg_extra"],
    )


def test_samples_report_full_field_set():
    """Reference sample report (reporting.py:280-321): 8 summary counters,
    5 pct lines + 2 scores, 4 key-example collections, evaluated + 2
    skipped column lists, max issue % + per-column breakdown + examples."""
    stats = build_check_stats(1000, 998, 3, 1, 4, 2, 994, 985, [7, 2])
    rep = render_samples_report("c", "rid", "failed", stats, _details(), 0.5)

    # summary counters (reference lines 281-288)
    for frag in ("source rows: 1000", "target rows: 998", "src=3", "trg=1",
                 "src_only=4", "trg_only=2", "comparable rows: 994",
                 "matched: 985"):
        assert frag in rep, frag
    # pct + score block (lines 292-298): every pct at 5dp
    for frag in (f"{stats.source_only_rows_pct:.5f}",
                 f"{stats.target_only_rows_pct:.5f}",
                 f"{stats.dup_source_rows_pct:.5f}",
                 f"{stats.dup_target_rows_pct:.5f}",
                 f"{stats.issue_rows_pct:.5f}",
                 f"final score: {stats.final_score:.5f}",
                 f"diff {stats.final_diff_score:.5f}"):
        assert frag in rep, frag
    # the four key-example collections (lines 301-304) — singletons
    # unwrapped (format_keys, utils.py:978-982), composites as tuples
    assert "source-only key examples: 1, 2, 3" in rep
    assert "target-only key examples: (9, 'b')" in rep
    assert "duplicated source key examples: 11, 12" in rep
    assert "duplicated target key examples: 13" in rep
    # evaluated + skipped columns (lines 306-308)
    assert "evaluated columns: amount, city" in rep
    assert "skipped source columns: src_extra" in rep
    assert "skipped target columns: trg_extra" in rep
    # breakdown section (lines 311-321) with its max-issue-pct line
    assert f"max issue %: {stats.max_issue_pct:.5f}" in rep
    assert "amount: 7" in rep and "city: 2" in rep
    assert "'1.5' -> '2.5'" in rep


def test_counts_report_full_field_set():
    """Reference count report (reporting.py:479-489): both totals, common
    + diff sums, discrepancy pct AND both scores, breakdown."""
    cs = CountStats(5000, 4990, 10, 4990, 0.2, 99.8, 3)
    disc = [{"dt": "2024-01-01", "src_cnt": 10, "trg_cnt": 7, "diff": 3}]
    rep = render_counts_report("c", "rid", "failed", cs, disc, 0.1)
    for frag in ("source total: 5000", "target total: 4990",
                 "abs diff sum: 10", "common sum: 4990",
                 "diff pct: 0.20000", "final score: 99.80000",
                 "(diff 0.20000)", "mismatched days: 3",
                 "2024-01-01: 10 vs 7 (d=3)"):
        assert frag in rep, frag


def test_sniff_report_full_field_set():
    """Reference sniff report (reporting.py:379-401): checked/passed/issue
    rows, issue pct, BOTH scores, status histogram, row examples."""
    st = SniffStats(200, 190, 10, 5.0, 95.0)
    hist = [{"status_value": "y", "count": 190}, {"status_value": "n", "count": 10}]
    rep = render_sniff_report("c", "rid", "failed", st, hist, [("r1", "n")], 1.0)
    for frag in ("total rows: 200", "passed: 190", "issues: 10 (5.00000%)",
                 "final score: 95.00000", "diff 5.00000", "y: 190", "n: 10",
                 "('r1', 'n')"):
        assert frag in rep, frag


def test_format_report_collection_rules():
    """Reference utils.py:22-34: None/empty -> '', sets sorted, sequences
    in order."""
    assert format_report_collection(None) == ""
    assert format_report_collection(()) == ""
    assert format_report_collection({3, 1, 2}) == "1, 2, 3"
    assert format_report_collection([3, 1]) == "3, 1"
    assert format_report_collection("x") == "x"
