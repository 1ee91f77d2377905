#!/bin/bash
# One-shot measurement pass for when the axon TPU tunnel is back:
#   1. seeding microprofile (gather rates, per-phase jit timings)
#   2. end-to-end bench, 3-run averaged JSON with hit/merge stats
# Run from the repo root:  bash scripts/tpu_checkin.sh
# The .jax_cache persistent compile cache makes warm reruns fast; do
# NOT delete it.
set -u
cd "$(dirname "$0")/.."
echo "== devices =="
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU still unavailable"; exit 1; }
echo "== seeding profile =="
timeout 3600 python scripts/profile_seeding.py 2>&1 | tail -40
echo "== bench =="
timeout 5400 python bench.py
