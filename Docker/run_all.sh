#!/bin/bash
# Run benchmarks and collect artifacts (reference: Docker/run_all.sh, which
# builds ABC and uploads demo_values.csv to S3; here artifacts are written
# to the /out volume — wire your own uploader around the container).
set -euo pipefail
cd /abc_tpu
OUT="${OUT_DIR:-/out}"
mkdir -p "$OUT"

if [ "${1:-}" = "--suite" ]; then
    echo "Running the staged benchmark suite (BASELINE configs 1-6)..."
    python bench.py --suite | tee "$OUT/suite.jsonl"
    exit 0
fi

BENCH="${1:-demo}"
if [ "$BENCH" = "demo" ]; then BENCH=cardio; fi   # ref: ast_demo 'demo'
TARGET="$OUT/${BENCH}_values.csv"
echo "Running abc_tpu benchmark '$BENCH' -> $TARGET"
python -m abc_tpu "$BENCH" "$TARGET" "${@:2}"
cat "$TARGET"
