#!/bin/sh
# Full verification battery, in the order of fastest feedback:
#   1. registry invariants + unit/property/streaming tests
#   2. physical-plan assertions (design-for-100x)
#   3. full Spark-vs-DuckDB oracle compare at the driver SF
#   4. headline bench (one JSON line)
# Any failure stops the run. ~12 min total on local[32].
set -e
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== plan audit =="
python tools/plan_audit.py

echo "== selfcheck (driver SF) =="
timeout 1800 python tools/selfcheck.py /root/testdata/sf0.01

echo "== bench =="
timeout 900 python bench.py
