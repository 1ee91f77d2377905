#!/bin/bash
# Round-5 measurement sequence — one TPU job at a time, results into
# EVIDENCE/ab_r05.jsonl.  Each bench line is tagged with its variant.
# Run AFTER profile_phases has finished (fresh compiles serialize on
# the axon compile service).
set -u
cd "$(dirname "$0")/.."
OUT=EVIDENCE/ab_r05.jsonl
mkdir -p EVIDENCE

run() {
    local tag="$1"; shift
    echo "[r05] $tag start $(date -u +%H:%M:%S)" >&2
    local line
    line=$("$@" 2>>EVIDENCE/ab_r05.err | tail -1)
    echo "{\"tag\": \"$tag\", \"ts\": \"$(date -u +%FT%T)\", \"result\": $line}" >> "$OUT"
    echo "[r05] $tag done: $line" >&2
}

case "${1:-all}" in
  main)
    run main python bench.py ;;
  chunk32)
    run chunk32 env COMPSEED_BENCH_CHUNK=32768 COMPSEED_BENCH_NCHUNKS=2 python bench.py ;;
  w5)
    run w5 env COMPSEED_CHAIN_W=5 python bench.py ;;
  w4)
    run w4 env COMPSEED_CHAIN_W=4 python bench.py ;;
  pe)
    run pe python scripts/pe_bench.py ;;
  all)
    run main python bench.py
    run chunk32 env COMPSEED_BENCH_CHUNK=32768 COMPSEED_BENCH_NCHUNKS=2 python bench.py
    run w5 env COMPSEED_CHAIN_W=5 python bench.py
    run pe python scripts/pe_bench.py
    ;;
esac
