"""Generate driver-testdata-shaped tables at larger scale factors.

The driver ships read-only testdata up to sf0.1 (TESTDATA.md). For the
sf1 parity stretch (r03 verdict #9) this generates the SAME ten-table
star schema — identical column names/types, matched value domains and
distributions (measured from sf0.1), timestamps written as
TIMESTAMP_NTZ like the driver's pandas-written files — at 10x the rows.
Oracle parity is data-independent (Spark and DuckDB read the same
parquet), so a home-grown sf1 exercises the exact same query math at
another 10x.

Deterministic: every value derives from xxhash64(ids..., seed) — no
rand()/randn() (those depend on partition layout). Big fact tables are
generated JVM-side; documents/embeddings (small) via seeded numpy on
the driver for realistic text/cluster structure.

Usage: python scripts/gen_testdata.py --sf 1 --output /root/repo/.bench_cache/sf1
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SEED = 42
SEGMENTS = ["FURNITURE", "BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD"]
PTYPES = ["SMALL", "MEDIUM", "PROMO", "LARGE", "ECONOMY", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
ADJ = ["large", "hot", "blue", "small", "red", "green", "dim", "bright"]
NOUN = ["ring", "bolt", "widget", "cog", "gear", "pin", "cap", "rod"]
DOC_VOCAB = (
    "batch part spark line column order small sort fast value scan a hash "
    "slow group query big filter key window row table stream merge data "
    "vector agg join plan shuffle"
).split() + [f"term{i}" for i in range(90)]
# The driver's sf0.1 corpus draws from ~30 words; scaling that SAME
# distribution 10x densifies the accidental-similarity graph until the
# near-dup relation percolates into one >1000-diameter chain (the
# clustering operator correctly refuses to converge, and the DuckDB
# recursive-CTE twin would blow up on the same graph). The sf1 corpus
# widens the vocabulary so accidental 3-shingle overlap is negligible and
# the near-dup graph is exactly the engineered pairs — the parity math is
# data-independent, and the queries still exercise 10x the rows.
LANGS = ["en", "en", "en", "en", "fr", "es", "zh", "de"]  # ~50% en


def _u(*cols, seed=SEED):
    """Deterministic uniform [0,1) from hashed columns."""
    m = 1 << 30
    return F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(m)) / F.lit(float(m))


def _pick(choices, *cols, seed=SEED):
    arr = F.array(*[F.lit(c) for c in choices])
    return F.element_at(arr, (F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(len(choices))) + 1).cast("int"))


def gen(spark: SparkSession, sf: float, out: str) -> None:
    mul = sf / 0.1  # row counts are calibrated against the sf0.1 shapes
    n_cust = int(15000 * mul)
    n_supp = int(1000 * mul)
    n_part = int(20000 * mul)
    n_ord = int(150000 * mul)
    n_ev = int(100000 * mul)
    n_doc = int(5000 * mul)
    n_emb = int(2000 * mul)

    def w(df, name):
        # the driver testdata is ONE parquet FILE per table (DuckDB views
        # point at the bare path) — write via a temp dir, then move the
        # single part file. Small row groups keep the file splittable for
        # Spark despite being a single file.
        import glob
        import shutil

        tmp = os.path.join(out, f"_tmp_{name}")
        (df.repartition(1).write.mode("overwrite")
         .option("parquet.block.size", 8 * 1024 * 1024)
         .parquet(tmp))
        [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
        os.makedirs(out, exist_ok=True)
        shutil.move(part, os.path.join(out, f"{name}.parquet"))
        shutil.rmtree(tmp)
        print(f"wrote {name}", flush=True)

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    w(spark.createDataFrame(
        [(i, r) for i, r in enumerate(regions)], "r_regionkey int, r_name string"
    ), "region")
    w(spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    ), "nation")

    c = spark.range(n_cust)
    w(c.select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(25)).cast("int").alias("c_nationkey"),
        F.round(_u(F.col("id"), seed=2) * 11000 - 1000, 2).alias("c_acctbal"),
        _pick(SEGMENTS, F.col("id"), seed=3).alias("c_mktsegment"),
    ), "customer")

    s = spark.range(n_supp)
    w(s.select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(25)).cast("int").alias("s_nationkey"),
        F.round(_u(F.col("id"), seed=5) * 11000 - 1000, 2).alias("s_acctbal"),
    ), "supplier")

    p = spark.range(n_part)
    w(p.select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(" ", _pick(ADJ, F.col("id"), seed=6),
                    _pick(NOUN, F.col("id"), seed=7)).alias("p_name"),
        F.concat(F.lit("Brand#"),
                 (F.pmod(F.xxhash64("id", F.lit(8)), F.lit(25)) + 1).cast("string")
                 ).alias("p_brand"),
        _pick(PTYPES, F.col("id"), seed=9).alias("p_type"),
        (F.pmod(F.xxhash64("id", F.lit(10)), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + F.col("id") * 0.1, 2).alias("p_retailprice"),
    ), "part")

    epoch95 = F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    o = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(n_cust)).alias("o_custkey"),
        _pick(STATUSES, F.col("id"), seed=12).alias("o_orderstatus"),
        F.round(_u(F.col("id"), seed=13) * 499000 + 1000, 2).alias("o_totalprice"),
        F.timestamp_add(
            "DAY",
            F.pmod(F.xxhash64("id", F.lit(14)), F.lit(2400)).cast("int"),
            epoch95,
        ).alias("o_orderdate"),
        _pick(PRIORITIES, F.col("id"), seed=15).alias("o_orderpriority"),
    )
    w(o, "orders")

    # ~4 lines per order (1..7), keys/values hashed per (order, linenumber)
    li = (
        o.select("o_orderkey", "o_orderdate")
        .withColumn(
            "_nl", (F.pmod(F.xxhash64("o_orderkey", F.lit(16)), F.lit(7)) + 1).cast("int")
        )
        .select(
            "o_orderkey", "o_orderdate",
            F.explode(F.sequence(F.lit(1), F.col("_nl"))).alias("l_linenumber"),
        )
    )
    k = [F.col("o_orderkey"), F.col("l_linenumber")]
    w(li.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.pmod(F.xxhash64(*k, F.lit(17)), F.lit(n_part)).alias("l_partkey"),
        F.pmod(F.xxhash64(*k, F.lit(18)), F.lit(n_supp)).alias("l_suppkey"),
        F.col("l_linenumber"),
        (F.pmod(F.xxhash64(*k, F.lit(19)), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        F.round(_u(*k, seed=20) * 104100 + 900, 2).alias("l_extendedprice"),
        (F.pmod(F.xxhash64(*k, F.lit(21)), F.lit(11)) / 100.0).alias("l_discount"),
        (F.pmod(F.xxhash64(*k, F.lit(22)), F.lit(9)) / 100.0).alias("l_tax"),
        _pick(["A", "N", "R"], *k, seed=23).alias("l_returnflag"),
        _pick(["F", "O"], *k, seed=24).alias("l_linestatus"),
        F.timestamp_add(
            "DAY", (F.pmod(F.xxhash64(*k, F.lit(25)), F.lit(95)) + 1).cast("int"),
            F.col("o_orderdate"),
        ).alias("l_shipdate"),
    ), "lineitem")

    epoch24 = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    ev = spark.range(n_ev)
    w(ev.select(
        F.col("id").alias("event_id"),
        F.timestamp_add(
            "SECOND",
            F.pmod(F.xxhash64("id", F.lit(26)), F.lit(30 * 86400)).cast("int"),
            epoch24,
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(27)), F.lit(max(1500, n_ev // 66))).alias("user_id"),
        _pick(EVENT_TYPES, F.col("id"), seed=28).alias("event_type"),
        F.round(_u(F.col("id"), seed=29) * 560, 2).alias("value"),
        F.format_string('{"k": %d}', F.pmod(F.xxhash64("id", F.lit(30)), F.lit(100))).alias("props"),
    ), "events")

    # documents: seeded numpy — same vocab flavor, ~0.3% exact-dup pairs
    # and ~0.3% near-dup pairs so clustering queries stay shallow in the
    # DuckDB recursive-CTE twin
    rng = np.random.default_rng(SEED)
    lens = rng.integers(12, 100, n_doc)
    vocab = np.array(DOC_VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens]
    n_pairs = max(1, n_doc // 300)
    for i in range(n_pairs):
        a, b = 10 * i, 10 * i + 1
        texts[b] = texts[a]                       # exact dup
        c, d = 10 * i + 2, 10 * i + 3
        texts[d] = texts[c] + " nd" + str(d)      # near dup
    docs = pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype="int64"),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, len(LANGS), n_doc)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
    })
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    w(spark.createDataFrame(docs), "documents")

    centers = rng.normal(0, 0.25, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = (centers[labels] + rng.normal(0, 0.08, (n_emb, 64))).astype("float32")
    emb = pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype="int64"),
        "embedding": [v.tolist() for v in vecs],
        "label": labels.astype("int32"),
    })
    # explicit schema: the driver files store FLOAT[] (float32), and the
    # element type must match or cross-engine dot products diverge
    w(spark.createDataFrame(
        emb, "vec_id bigint, embedding array<float>, label int"
    ), "embeddings")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)
    from xoverrr_spark.session import get_spark

    gen(get_spark("gen_testdata"), args.sf, args.output)


if __name__ == "__main__":
    main()
