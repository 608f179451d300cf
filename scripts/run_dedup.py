"""spark-submit entry point for the staged corpus-dedup job.

Usage:
    spark-submit --py-files dist/xoverrr_spark.zip \
        scripts/run_dedup.py --input <documents.parquet> --output <dir>

The package arrives via --py-files; this shim only dispatches to
``xoverrr_spark.pipeline.dedup_runner.main``.
"""

from xoverrr_spark.pipeline.dedup_runner import main

if __name__ == "__main__":
    main()
