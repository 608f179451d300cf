"""Time-series operators — as-of join (point-in-time lookup).

Beyond the reference's own surface (round brief: custom operators Spark
lacks, e.g. as-of joins). Spark has no ASOF JOIN operator; the standard
scale shape used here is the TAGGED UNION + WINDOW formulation:

    union(left tagged 1, right tagged 0)
      -> one window per key ordered by (ts, tag)
      -> last(right payload, ignorenulls) carries the most recent right
         row forward onto every left row
      -> filter tag = 1

That is ONE shuffle on the key (the union's window partitioning) and zero
join operators — a range-condition join (`l.ts >= r.ts` + per-key top-1)
would otherwise degenerate into a broadcast-nested-loop or an exploding
theta-join. Cost is O(|L| + |R|) rows through one exchange, the same shape
as the single-shuffle diff engine (operators/diff.py).

Ordering (_ts, _tag) with right = 0 makes the match INCLUSIVE
(right.ts == left.ts matches), the same tie rule as DuckDB's
`ASOF JOIN ... ON l.ts >= r.ts`, which the oracle twin replays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    prefix: str = "ref_",
) -> DataFrame:
    """For every left row, attach the most recent right row of the same
    key with ``right.ts <= left.ts`` (inclusive): point-in-time lookup.

    Output = all left columns + ``<prefix><right_ts>`` (the matched
    timestamp) + ``<prefix><col>`` for each of ``right_vals``; unmatched
    left rows keep nulls (left-outer semantics).

    Duplicate (key, ts) right rows resolve to the lexicographically
    LARGEST value struct — not physical row order, which wouldn't be
    reproducible across runs/partitionings. The tiebreak rides the SAME
    window sort (``_rv`` is the last sort key, so among equal timestamps
    the max struct is the one ``last()`` carries) rather than a
    pre-aggregation, which would cost a second exchange on (keys, ts).
    """
    out_names = [f"{prefix}{right_ts}"] + [f"{prefix}{c}" for c in right_vals]
    clash = [c for c in out_names if c in left.columns]
    if clash:
        # Spark would happily emit duplicate column names and every later
        # select on them would be ambiguous — fail loudly at build time
        raise ValueError(
            f"asof_join output column(s) {clash} already exist on the left "
            "side; pass a different prefix"
        )
    rv = F.struct(F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_vals])
    # a null right timestamp would sort FIRST (asc nulls first) and be
    # carried as the "earliest" match for every left row — a row with no
    # valid time can never be the most recent anything, so drop it
    r = (
        right.filter(F.col(right_ts).isNotNull())
        .select(*keys, F.col(right_ts).alias("_ts"), rv.alias("_rv"))
        .withColumn("_tag", F.lit(0))
    )
    l = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_tag", F.lit(1))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # left rows carry a null _rv: asc-nulls-first keeps them ordered purely
    # by (_ts, _tag); right dups at one ts sort ascending by struct, so the
    # frame's last non-null _rv is the max struct
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_tag", F.col("_rv").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the carry column MUST be materialized before the tag filter — a
    # window expression referenced after the filter would be evaluated
    # over the filtered (left-only) rows and never see the right side
    carried = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w)).filter(
        F.col("_tag") == 1
    )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("_m._rts").alias(f"{prefix}{right_ts}"))
    out_cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_vals]
    return carried.select(*out_cols)


def _epoch_bin(ts: Column, width_s: int) -> Column:
    """Conservative time bucket: floor(epoch-seconds / width). Epoch seconds
    (~2^31) divided as doubles are exact well past 2^52, so the floor is the
    true integer quotient."""
    return F.floor(ts.cast("timestamp").cast("long") / F.lit(width_s)).cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    window_seconds: int,
    prefix: str = "r_",
) -> DataFrame:
    """Interval join: all (left, right) pairs of the same key with
    ``left.ts < right.ts <= left.ts + window_seconds`` (strictly-after,
    inclusive upper bound — "what happened in the W seconds after X").

    Spark has no range-join operator; a naive key-equi-join with the range
    as a post-filter degenerates per key into a cartesian product (the
    low-cardinality ``user_id`` case), and a pure theta-join becomes a
    broadcast-nested-loop. The standard scale shape used here is BINNED
    candidate generation:

      - bin width = window_seconds, so every true match spans at most TWO
        adjacent bins: with b = floor(l_sec/W), any r in (l, l+W] has
        floor(r_sec/W) ∈ {b, b+1} (truncation proof in the docstring test).
      - the left side explodes to its two candidate bins (2× rows, no skew),
        the right side keeps its one bin, and the join is an EQUI-join on
        (keys..., bin) — hash-partitioned, AQE-skew-splittable, never
        nested-loop.
      - the exact interval predicate filters candidates at full timestamp
        precision (microseconds), so binning never changes results, only
        bounds the candidate set.

    Each true pair is produced exactly once (a right row lives in one bin).
    Key equality is NULL-SAFE (``<=>``): null-key rows match each other
    instead of silently vanishing (CLAUDE.md null-key discipline; the
    oracle twin uses IS NOT DISTINCT FROM). Left rows with a null timestamp
    have no interval and yield no pairs; null right timestamps fail the
    range predicate in both engines.

    Output: all left columns + ``<prefix><right_ts>`` + ``<prefix><c>`` for
    each right_vals column (inner-join semantics: only matched pairs).
    """
    out_names = [f"{prefix}{right_ts}"] + [f"{prefix}{c}" for c in right_vals]
    clash = [c for c in out_names if c in left.columns]
    if clash:
        raise ValueError(
            f"range_join output column(s) {clash} already exist on the left "
            "side; pass a different prefix"
        )
    w = int(window_seconds)
    if w <= 0:
        raise ValueError("window_seconds must be positive")
    if "_bin" in left.columns:
        # withColumn would silently OVERWRITE it with the candidate bin and
        # the output would carry the internal value under the user's name
        raise ValueError("left side already has a column named '_bin'")
    lbin = _epoch_bin(F.col(left_ts), w)
    l2 = left.withColumn("_bin", F.explode(F.array(lbin, lbin + 1)))
    r2 = right.select(
        *[F.col(k).alias(f"_rk_{k}") for k in keys],
        _epoch_bin(F.col(right_ts), w).alias("_bin"),
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_vals],
    )
    cond = l2["_bin"] == r2["_bin"]
    for k in keys:
        cond = cond & l2[k].eqNullSafe(r2[f"_rk_{k}"])
    rts = F.col(f"{prefix}{right_ts}")
    lts = F.col(left_ts)
    exact = (rts > lts) & (rts <= lts + F.expr(f"INTERVAL {w} SECONDS"))
    joined = l2.join(r2, cond, "inner").filter(exact)
    keep = [l2[c] for c in left.columns] + [F.col(c) for c in out_names]
    return joined.select(*keep)
