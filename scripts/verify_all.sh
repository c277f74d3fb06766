#!/usr/bin/env bash
# One-command repo verification: oracle exact-match at the driver's
# scale, physical-plan audit, full test suite, and the headline bench.
# Usage: bash scripts/verify_all.sh [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
echo "== oracle exact-match vs DuckDB @ ${SF} =="
python scripts/check_oracle.py "$SF"
echo "== physical-plan audit =="
python scripts/audit_plans.py
echo "== pytest =="
python -m pytest tests/ -q
echo "== bench =="
python bench.py
