"""Z-order file layout: multi-dimensional scan pruning for parquet lakes.

Parquet scans skip whole files/row-groups whose column min/max statistics
exclude the filter predicate — but only if the data layout actually
clusters each filter column. Sorting by one column prunes that column
and destroys locality for every other; random layout prunes nothing.
Z-ordering (bit-interleaving the rank-bucketed filter columns into one
sort key, the Morton curve) keeps ALL interleaved dimensions locally
clustered, so a 100-TB table filtered sometimes by time and sometimes by
user still skips most of its files either way. Same technique Delta's
OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite apply; here it is
plain DataFrame algebra over open parquet:

1. per column: equal-frequency bucket ids from approxQuantile splits
   (equal-width would collapse under skew);
2. interleave the bucket bits into one BIGINT z-value;
3. repartitionByRange(n_files, z) + sortWithinPartitions(z) → write.

Bucket columns are materialized via ``withColumns`` BEFORE the
interleave expression references them — the interleave is a ~2*bits-term
shift/or tree per column and re-inlining it per reference duplicates the
tree combinatorially (the langid-argmax Catalyst trap).

Pruning is measured, not assumed: :func:`candidate_file_fraction` reads
the real parquet footer min/max (what Spark's scan consults) and returns
the fraction of files a range predicate cannot skip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each integral column.

    Bit i of column j lands at output position ``i * len(cols) + j`` —
    total ``bits * len(cols)`` bits, which must stay < 63 (BIGINT, ANSI
    overflow-safe)."""
    n = len(cols)
    if n == 0:
        raise ValueError("need at least one column")
    if bits * n >= 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a signed BIGINT")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            bit = F.shiftrightunsigned(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
    relative_error: float = 0.01,
) -> list[list[float]]:
    """Write ``df`` as ``n_files`` z-ordered parquet files; returns the
    per-column quantile splits used (driver-side list of ~2^bits floats
    per column — bounded, never the data)."""
    if not cols:
        raise ValueError("at least one z-order column is required")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"z-order columns not in DataFrame: {missing}")
    if n_files <= 0:
        raise ValueError(f"n_files must be positive, got {n_files}")
    n_buckets = 1 << bits
    # equal-frequency split points from the approx-quantile sketch (one
    # pass, no shuffle); nulls are ignored by the sketch and bucket to 0
    probs = [i / n_buckets for i in range(1, n_buckets)]
    splits = df.approxQuantile(cols, probs, relative_error)

    def bucket(c: str, sp: list[float]) -> Column:
        # binary-search-free bucketing: sum of (value > split) over the
        # DISTINCT splits — ≤ 2^bits-1 comparisons folded JVM-side via
        # aggregate over a literal array (no Python, no UDF)
        uniq = sorted(set(sp))
        arr = F.array(*[F.lit(s) for s in uniq])
        v = F.col(c).cast("double")
        cnt = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, s: acc + F.when(v > s, F.lit(1)).otherwise(F.lit(0)),
        )
        # skew rescue: a heavy hitter deduplicates most quantile splits,
        # leaving k << 2^bits distinct buckets whose HIGH interleave bits
        # never vary — the z-value degenerates to the other dimensions
        # and this column stops pruning (measured: 90%-hot column spread
        # 7..max across every file). Rescaling bucket ids over the full
        # 0..2^bits-1 range restores high-bit variation.
        scale = (n_buckets - 1) / max(len(uniq), 1)
        cnt = F.floor(cnt * F.lit(scale)).cast("long")
        return F.when(v.isNull(), F.lit(0)).otherwise(cnt)

    bcols = {f"_zb_{c}": bucket(c, sp) for c, sp in zip(cols, splits)}
    z = (
        df.withColumns(bcols)
        .withColumn("_z", interleave_bits(
            [F.col(f"_zb_{c}") for c in cols], bits))
        .drop(*bcols)
    )
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return splits


def candidate_file_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of parquet files under ``path`` whose footer min/max for
    ``col`` intersects [lo, hi] — i.e. the files a predicate-pushdown
    scan must actually read. Uses the same statistics Spark's parquet
    reader consults, via pyarrow (driver-side metadata only)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                fmin = fmax = None  # no stats -> cannot skip
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            hit += 1
    return hit / len(files)
