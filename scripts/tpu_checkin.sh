#!/bin/bash
# One-shot measurement pass for when the axon TPU tunnel is back:
#   1. seeding microprofile (gather rates, per-phase jit timings)
#   2. end-to-end bench, 3-run averaged JSON with hit/merge stats
#   3. A/B sweeps of the opt-in perf paths built while the tunnel was
#      down (round 2): Pallas DMA occ gather, round-2 dedup, and the
#      seeding-only chunk-size scaling curve.
# Run from the repo root:  bash scripts/tpu_checkin.sh
# The .jax_cache persistent compile cache makes warm reruns fast; do
# NOT delete it.  Expect long cold compiles on the first pass.
set -u
cd "$(dirname "$0")/.."
echo "== devices =="
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU still unavailable"; exit 1; }
echo "== seeding profile (default config) =="
timeout 3600 python scripts/profile_seeding.py 2>&1 | tail -40
echo "== bench (default config) =="
timeout 5400 python bench.py

echo "== A/B: Pallas DMA occ gather =="
COMPSEED_PALLAS_GATHER=1 timeout 3600 \
  python scripts/profile_seeding.py 2>&1 | tail -12
echo "== A/B: round-2 dedup =="
COMPSEED_R2_DEDUP=1 timeout 3600 \
  python scripts/profile_seeding.py 2>&1 | tail -12
echo "== A/B: forward dedup off (isolate its cost/benefit) =="
COMPSEED_FWD_DEDUP=0 timeout 3600 \
  python scripts/profile_seeding.py 2>&1 | tail -12
echo "== A/B: chain width (savings vs round overhead) =="
for CW in 4 6 8 12; do
  echo "-- W=$CW"
  COMPSEED_CHAIN_W=$CW timeout 3600 python scripts/profile_seeding.py \
    2>&1 | grep -E "TOTAL|volumes"
done
echo "== A/B: staged forward dedup (old engine) =="
COMPSEED_FWD_MEMO=0 timeout 3600 python scripts/profile_seeding.py \
  2>&1 | tail -12
echo "== chunk-size scaling (seeding-only reads/s) =="
for C in 4096 16384 32768; do
  echo "-- chunk $C"
  timeout 3600 python scripts/profile_seeding.py "$C" 2>&1 | \
    grep -E "TOTAL|volumes"
done
echo "== checkin complete: paste the numbers into the round memory note =="
