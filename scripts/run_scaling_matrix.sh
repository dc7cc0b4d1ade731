#!/bin/bash
# Sequential scaling experiments on the v2 build (round-3 gate work).
# Each run is a fresh subprocess JVM via diag_build_stages.py.
# Results accumulate in /tmp/scalex/results.jsonl (one JSON per line).
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

# E1: fixed small segments (restores the 100k per-task shape) at 32
run "dps1562_c32" --cpus 32 --docs 400000 --dps 1562
# E2: same + THP disabled in workers
LSS_THP_DISABLE=1 run "dps1562_c32_nothp" --cpus 32 --docs 400000 --dps 1562
# E3: legacy dps baseline at 32 (reproduce collapse)
run "dps6250_c32" --cpus 32 --docs 400000
# E4: pinned 8-core denominator with fixed dps + proportional memory
LSS_DRIVER_MEM=6g run "dps1562_c8pin" --cpus 8 --pin --docs 400000 --dps 1562
echo "DONE $(date +%T)" >> "$OUT"
