#!/bin/bash
# Round-4 A/B measurement pass (VERDICT r3 ask #1): every pending
# variant, results appended as JSON lines to EVIDENCE/ab_r04.jsonl so
# the table survives resets.  Serialized — one TPU client at a time.
# Each env-flag variant is a fresh XLA program on this 1-CPU host
# (~10-25 min cold compile; .jax_cache makes warm reruns fast).
set -u
cd "$(dirname "$0")/.."
OUT=EVIDENCE/ab_r04.jsonl
mkdir -p EVIDENCE

run_bench () {  # name, env...
  local name=$1; shift
  echo "== bench: $name ($*)" >&2
  local t0=$(date +%s)
  local line
  line=$(env "$@" timeout 7200 python bench.py 2>/tmp/ab_err.log | tail -1)
  local dt=$(( $(date +%s) - t0 ))
  if [ -n "$line" ]; then
    echo "{\"variant\": \"$name\", \"wall_s\": $dt, \"bench\": $line}" >> "$OUT"
    echo "$name: $line" >&2
  else
    echo "{\"variant\": \"$name\", \"wall_s\": $dt, \"error\": \"no output\"}" >> "$OUT"
    tail -3 /tmp/ab_err.log >&2
  fi
}

run_prof () {  # name, chunk, env...
  local name=$1; local chunk=$2; shift 2
  echo "== profile: $name chunk=$chunk ($*)" >&2
  local t0=$(date +%s)
  local txt
  txt=$(env "$@" timeout 7200 python scripts/profile_phases.py "$chunk" \
        2>/tmp/ab_prof_err.log | grep -E "TOTAL|volumes|decomp" | \
        tr '\n' ';' | sed 's/"/\\"/g')
  local dt=$(( $(date +%s) - t0 ))
  if [ -z "$txt" ]; then
    txt="ERR: $(tail -3 /tmp/ab_prof_err.log | tr '\n' ';' | sed 's/"/\\"/g')"
  fi
  echo "{\"variant\": \"$name\", \"chunk\": $chunk, \"wall_s\": $dt, \"profile\": \"$txt\"}" >> "$OUT"
  echo "$name: $txt" >&2
}

case "${1:-all}" in
  seeding)
    run_prof baseline_r4 16384
    run_prof fwd_memo_off 16384 COMPSEED_FWD_MEMO=0
    run_prof chain_w6 16384 COMPSEED_CHAIN_W=6
    run_prof chain_w10 16384 COMPSEED_CHAIN_W=10
    run_prof r2_dedup_off 16384 COMPSEED_R2_DEDUP=0
    run_prof gp_f28 16384 COMPSEED_GP_F=28
    run_prof chunk32k 32768
    run_prof chunk64k 65536
    ;;
  bench)
    run_bench chain_w6_e2e COMPSEED_CHAIN_W=6
    run_bench bsw_i16 COMPSEED_BSW_I16=1
    run_bench chunk32k COMPSEED_BENCH_CHUNK=32768
    run_bench depth3 COMPSEED_PIPE_DEPTH=3
    run_bench depth1 COMPSEED_PIPE_DEPTH=1
    ;;
  all)
    bash "$0" seeding
    bash "$0" bench
    ;;
  *)
    run_prof "$@"
    ;;
esac
echo "== ab_r04 done; table in $OUT" >&2
