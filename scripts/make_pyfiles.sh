#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/xoverrr_spark.zip
zip -qr dist/xoverrr_spark.zip xoverrr_spark -x '*__pycache__*'
echo "dist/xoverrr_spark.zip"
