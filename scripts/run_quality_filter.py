"""spark-submit entry point.

Usage:
    spark-submit --py-files dist/xoverrr_spark.zip \
        scripts/run_quality_filter.py --input iceberg:cat.db.images \
        --output s3://bucket/qf_out --buckets 4096

The package arrives via --py-files; this shim only dispatches to
``xoverrr_spark.pipeline.runner.main``.
"""

from xoverrr_spark.pipeline.runner import main

if __name__ == "__main__":
    main()
