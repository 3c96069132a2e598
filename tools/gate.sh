#!/bin/bash
# One-command round gate: suite + sf0.01 correctness (Verify -> DuckDB
# oracle) + solo sf0.1 bench, under the SAME measurement conditions
# every time. Produces the three artifacts the driver captures and a
# ready-to-paste BASELINE.md row.
#
#   tools/gate.sh [outdir]        # default /tmp/graft_gate
#
# Steps (each logged, gate FAILS FAST on the first red step):
#   1. sbt test                      -> $OUT/suite.log
#   2. Verify @ sf0.01              -> $OUT/verify/ + check_oracle.py
#   3. Bench  @ sf0.1, 32 cpus      -> $OUT/bench.json (one JSON line)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/graft_gate}"
SF001="${SPARK_GRAFT_SF001:-/root/testdata/sf0.01}"
SF01="${SPARK_GRAFT_SF01:-/root/testdata/sf0.1}"
mkdir -p "$OUT"

echo "== gate step 1/3: sbt test =="
sbt -batch test >"$OUT/suite.log" 2>&1 || {
  tail -30 "$OUT/suite.log"; echo "GATE RED: suite failed (log: $OUT/suite.log)"; exit 1; }
grep -E "Tests: succeeded|All tests passed" "$OUT/suite.log" | tail -2

echo "== gate step 2/3: correctness (Verify @ sf0.01 + DuckDB oracle) =="
rm -rf "$OUT/verify"
tools/run.sh graft.Verify "$SF001" "$OUT/verify" >"$OUT/verify.log" 2>&1 || {
  tail -20 "$OUT/verify.log"; echo "GATE RED: Verify failed"; exit 1; }
python3 tools/check_oracle.py "$SF001" "$OUT/verify" | tee "$OUT/correctness.log"
grep -q " 0 fail" "$OUT/correctness.log" || { echo "GATE RED: oracle mismatches"; exit 1; }

echo "== gate step 3/3: solo bench @ sf0.1 (local[32]) =="
SPARK_GRAFT_SF_DIR="$SF01" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g \
  tools/run.sh graft.Bench >"$OUT/bench.raw" 2>&1 || {
  tail -20 "$OUT/bench.raw"; echo "GATE RED: bench failed"; exit 1; }
grep '^{"metric"' "$OUT/bench.raw" | tail -1 >"$OUT/bench.json"

python3 - "$OUT/bench.json" <<'EOF'
import json, sys
b = json.load(open(sys.argv[1]))
print("\n== GATE GREEN — BASELINE.md row ==")
print(f"cold_total {b.get('cold_total', b.get('value', 0)):.1f} s | "
      f"warm_total {b.get('warm_total', 0):.1f} s | "
      f"failed {b.get('failed', '?')} | sf {b.get('sf', '?')}")
EOF
echo "artifacts: $OUT/suite.log $OUT/correctness.log $OUT/bench.json"
