#!/bin/bash
# Run every BASELINE.json bench config sequentially on the attached device
# (TPUs are single-tenant: NEVER run two configs concurrently).  Each config
# appends its JSON line to bench_all.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=bench_all.jsonl
: > "$OUT"
mkdir -p bench_logs
for c in earthtopography earthtopography-analysis pxmala skrock phasevel weaklensing directional; do
  echo "=== $c ===" >&2
  line=$(PXMCMC_BENCH_CONFIG=$c timeout "${PXMCMC_BENCH_TIMEOUT:-3000}" \
    python bench.py 2>> "bench_logs/bench_${c}_stderr.log")
  rc=$?
  echo "{\"config\": \"$c\", \"rc\": $rc, \"result\": ${line:-null}}" >> "$OUT"
  echo "$line" >&2
done
cat "$OUT"
