"""Deterministic synthetic document corpus at arbitrary scale.

Scale-stress input for the staged dedup job (r03 verdict #1): the driver
testdata tops out at 5k documents (sf0.1), far too small to exercise the
job's shuffles. This generates an N-doc corpus with the SAME dup structure
at any N, entirely JVM-side (no Python UDF, no driver loop):

- ids ``0..N-1``; every id with ``id % 10 == 1`` is an EXACT duplicate of
  ``id - 1``; every ``id % 10 == 2`` is a NEAR duplicate of ``id - 2``
  (same text + one appended token => 3-shingle Jaccard ~0.95) — so the
  expected dedup outcome is known in closed form: ~10% exact dups, ~10%
  near dups, ~20% of docs clustered in triples.
- text is ``doc_len`` words drawn from a ``vocab``-word vocabulary by
  ``xxhash64(base_id, position, seed)`` — unrelated docs share almost no
  3-shingles (vocab^3 space), so candidate pairs stay candidate-bounded.

The base-id column is MATERIALIZED before the word transform (a lambda-
captured expression tree re-evaluates per element — the element_at trap
from the shingle work). Output is repartitioned so parquet is splittable.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def corpus_df(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    vocab: int = 1000,
    doc_len: int = 40,
    boilerplate_pct: int = 0,
) -> DataFrame:
    """``boilerplate_pct`` > 0 floods the LAST pct% of ids with one shared
    template plus a per-doc unique tail token — every flood doc is a
    genuine near-dup of every other (J ~= 38/41 shingles), so they all
    land in the SAME LSH buckets in every band: the degenerate
    boilerplate-bucket skew a real web corpus throws at the job. Without
    the bucket cap this is a quadratic C(n*pct/100, 2) pair explosion;
    the stress run proves the cap (operators/dedup.py band-bucket cap)
    bounds it with ``over_cap_docs`` audited, not silently."""
    base = (
        F.when(F.col("id") % 10 == 1, F.col("id") - 1)
        .when(F.col("id") % 10 == 2, F.col("id") - 2)
        .otherwise(F.col("id"))
    )
    n_flood = n * boilerplate_pct // 100
    flood = F.col("id") >= F.lit(n - n_flood)
    if boilerplate_pct:
        # one shared template: fixed pseudo-base -1 (outside the id space)
        base = F.when(flood, F.lit(-1)).otherwise(base)
    df = spark.range(n).withColumn("_base", base)
    words = F.transform(
        F.sequence(F.lit(0), F.lit(doc_len - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(
                F.xxhash64(F.col("_base"), i, F.lit(seed)), F.lit(vocab)
            ).cast("string"),
        ),
    )
    text = F.concat_ws(" ", words)
    # near-dups append one id-unique token: ~38/40 shared 3-shingles
    text = F.when(
        flood if boilerplate_pct else F.lit(False),
        F.concat(text, F.lit(" bp"), F.col("id").cast("string")),
    ).when(
        F.col("id") % 10 == 2,
        F.concat(text, F.lit(" nd"), F.col("id").cast("string")),
    ).otherwise(text)
    return df.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.concat(F.lit("src"), F.pmod(F.xxhash64("_base"), F.lit(20)).cast("string")).alias("source"),
    )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="generate a synthetic dedup corpus")
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--output", required=True)
    ap.add_argument("--files", type=int, default=None,
                    help="output parquet files (default: ~40k rows per file)")
    ap.add_argument("--boilerplate-pct", type=int, default=0,
                    help="flood the last pct%% of ids with one near-identical "
                         "template (degenerate LSH-bucket skew stress)")
    args = ap.parse_args(argv)

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from xoverrr_spark.session import get_spark

    spark = get_spark("gen_corpus")
    files = args.files or max(1, args.n // 40000)
    corpus_df(
        spark, args.n, args.seed, boilerplate_pct=args.boilerplate_pct
    ).repartition(files).write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.n} docs to {args.output} in {files} files")


if __name__ == "__main__":
    main()
