"""Staged dedup job: results equal the direct operator composition, and a
resumed run skips completed stages instead of recomputing them."""

import json
import os

from pyspark.sql import functions as F

from xoverrr_spark.pipeline.dedup_runner import run_dedup


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_staged_dedup_matches_direct_composition(spark, tmp_path):
    from xoverrr_spark.functions.tokens import quality_score
    from xoverrr_spark.operators.dedup import (
        cluster_near_dups,
        cluster_survivors,
        minhash_near_dups,
    )

    out = str(tmp_path / "dedup_run")
    docs = _docs(spark)
    summary = run_dedup(
        spark, docs, out, jaccard_threshold=0.8, log=lambda *_: None
    )

    pairs = minhash_near_dups(docs, "doc_id", "text", jaccard_threshold=0.8)
    labels = cluster_near_dups(pairs)
    scores = docs.select(
        "doc_id", quality_score(F.col("text")).alias("quality_score")
    )
    direct = {
        (r["doc_id"], r["cluster_id"])
        for r in cluster_survivors(labels, scores).collect()
    }
    staged = {
        (r["doc_id"], r["cluster_id"])
        for r in spark.read.parquet(os.path.join(out, "survivors")).collect()
    }
    assert staged == direct
    assert summary["clusters"] == len(direct)
    assert summary["kept_docs"] == summary["total_docs"] - (
        summary["clustered_docs"] - summary["clusters"]
    )
    # the cap audit is part of the job output, not a silent setting
    assert os.path.exists(os.path.join(out, "bucket_stats", "_SUCCESS"))
    assert "over_cap_docs" in summary
    with open(os.path.join(out, "dedup_summary.json")) as fh:
        assert json.load(fh) == summary


def test_staged_dedup_resume_skips_completed_stages(spark, tmp_path):
    out = str(tmp_path / "dedup_resume")
    docs = _docs(spark)
    run_dedup(spark, docs, out, jaccard_threshold=0.8, log=lambda *_: None)

    skipped = []
    run_dedup(
        spark, docs, out, jaccard_threshold=0.8,
        log=lambda m: skipped.append(m),
    )
    assert sum("skipping" in m for m in skipped) == 6  # all six stages
