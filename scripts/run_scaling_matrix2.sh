#!/bin/bash
# Sharp matrix: THP A/B adjacent (drift control), parquet-spill analyze,
# proportional heap, and the pinned-8 denominator. Results append to
# /tmp/scalex/results.jsonl.
set -u
mkdir -p /tmp/scalex
OUT=/tmp/scalex/results.jsonl
run() {
  local tag="$1"; shift
  echo "=== $tag : $* $(date +%T)" >&2
  local res
  res=$(timeout 2400 python scripts/diag_build_stages.py "$@" 2>/tmp/scalex/last_err.txt)
  if [ -n "$res" ]; then
    echo "{\"tag\": \"$tag\", \"r\": $res}" >> "$OUT"
  else
    echo "{\"tag\": \"$tag\", \"r\": null, \"err\": \"see last_err\"}" >> "$OUT"
    tail -5 /tmp/scalex/last_err.txt >&2
  fi
}
cd /root/repo

# adjacent THP A/B at 32 (drift-controlled repeat of E1/E2)
LSS_THP_DISABLE=1 run "c32_thpoff_mem" --cpus 32 --docs 400000 --dps 1562
run "c32_thpon_mem" --cpus 32 --docs 400000 --dps 1562
# parquet-spill analyze vs JVM cache (both THP-off)
LSS_THP_DISABLE=1 LSS_ANALYZE_MODE=parquet run "c32_thpoff_parquet" --cpus 32 --docs 400000 --dps 1562
# proportional heap at 32 (4x the 8-core level's 12g)
LSS_THP_DISABLE=1 LSS_DRIVER_MEM=48g run "c32_thpoff_mem48" --cpus 32 --docs 400000 --dps 1562
# pinned 8-core denominator, proportional memory
LSS_THP_DISABLE=1 LSS_DRIVER_MEM=12g run "c8pin_thpoff_mem" --cpus 8 --pin --docs 400000 --dps 1562
echo "DONE2 $(date +%T)" >> "$OUT"
