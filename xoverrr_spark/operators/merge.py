"""Upsert / apply-changes (CDC merge) — maintain a table from a change feed.

The write-side companion to the diff engine: ``compare_frames`` verifies two
tables agree; ``apply_changes`` is how the target got there — inserts,
updates, and deletes from a batch of change rows (Iceberg's MERGE INTO
semantics, expressed as a pure DataFrame op so it runs on any sink).

Scale shape: the SAME single-shuffle tagged-union idiom as the diff engine
(operators/diff.py) and the as-of join — union(base tag 0, changes tag 1)
-> one per-key window -> keep the top row. No join operator, ONE exchange
on the key, null-safe by construction (a window partition on a null key is
a real partition; a MERGE JOIN would silently drop null-key rows, the
CLAUDE.md null-key discipline).

Winner rule: changes beat base (tag); among multiple change rows for one
key, the highest ``version_col`` wins (ties and absent version fall back to
the max value struct — deterministic under any partitioning, the same
tiebreak as asof_join's equal-timestamp rule). A winning change row with
``op_col = 'D'`` deletes the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DELETE_OP = "D"


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str | None = None,
    version_col: str | None = None,
) -> DataFrame:
    """Merged table: base rows overridden by ``changes`` per key.

    ``changes`` must carry every base column (same names), plus optionally
    ``op_col`` ('D' deletes the key, anything else upserts) and
    ``version_col`` (ordering among multiple change rows per key; the
    column itself is not part of the output unless it is a base column).
    New keys in ``changes`` are inserts; base keys absent from ``changes``
    pass through untouched.
    """
    missing = [c for c in base.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing base column(s) {missing}")
    data_cols = list(base.columns)

    op = (
        F.coalesce(F.col(op_col), F.lit("U")) if op_col else F.lit("U")
    )
    ver = F.col(version_col) if version_col else F.lit(0)
    non_keys = [c for c in data_cols if c not in keys]
    tie = F.struct(*[F.col(c) for c in non_keys]) if non_keys else F.lit(0)

    c = changes.select(
        *data_cols, op.alias("_op"), ver.alias("_ver"), tie.alias("_tie"),
        F.lit(1).alias("_tag"),
    )
    b = base.select(
        *data_cols, F.lit("U").alias("_op"), F.lit(None).cast(c.schema["_ver"].dataType.simpleString()).alias("_ver"),
        tie.alias("_tie"), F.lit(0).alias("_tag"),
    )
    u = b.unionByName(c)
    w = Window.partitionBy(*keys).orderBy(
        F.col("_tag").desc(),
        F.col("_ver").desc_nulls_last(),
        F.col("_tie").desc(),
        # final tiebreak: two change rows equal in version AND values but
        # different op ('U' vs 'D') must resolve deterministically — 'U'
        # wins (desc)
        F.col("_op").desc(),
    )
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("_op") != DELETE_OP))
        .select(*data_cols)
    )
