#!/usr/bin/env bash
# Full local verification: the test suite plus the Spark-vs-DuckDB parity
# sweep at both scale factors (the same gates the driver runs).
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -q
echo "== oracle parity sf0.01 =="
python scripts/check_oracle.py /root/testdata/sf0.01
echo "== oracle parity sf0.1 =="
python scripts/check_oracle.py /root/testdata/sf0.1
echo "ALL GREEN"
