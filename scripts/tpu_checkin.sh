#!/bin/bash
# One-shot measurement pass on the axon TPU:
#   1. end-to-end bench (the judged number) with tail profile
#   2. honest per-phase seeding profile (queue-N timing)
#   3. A/B sweeps of the opt-in paths + cap/chunk sizing curves
#   4. hg19-scale on-device alignment (needs /root/hg19_work/mine.*)
# Run from the repo root:  bash scripts/tpu_checkin.sh
# The .jax_cache persistent compile cache makes warm reruns fast; do
# NOT delete it.  Expect long cold compiles on the first pass — every
# env-flag variant is a fresh XLA program on this 1-CPU host.
set -u
cd "$(dirname "$0")/.."
echo "== devices =="
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU still unavailable"; exit 1; }
# bench FIRST — it is the judged number; if the tunnel dies again we
# want it captured before the (hours of) A/B sweeps below
echo "== bench (default config) =="
timeout 5400 python bench.py | tee /tmp/bench_checkin.json
echo "== seeding phase profile (default config) =="
timeout 3600 python scripts/profile_phases.py 16384 --sub 2>&1 | tail -24

echo "== A/B: round-2 dedup (CAPU2_F=12 default) =="
COMPSEED_R2_DEDUP=1 timeout 3600 \
  python scripts/profile_phases.py 2>&1 | grep -E "TOTAL|volumes|r2"
echo "== A/B: staged forward dedup (old engine) =="
COMPSEED_FWD_MEMO=0 timeout 4800 python scripts/profile_phases.py \
  2>&1 | grep -E "TOTAL|volumes"
echo "== A/B: chain width (savings vs round overhead) =="
for CW in 6 8 10; do
  echo "-- W=$CW"
  COMPSEED_CHAIN_W=$CW timeout 3600 python scripts/profile_phases.py \
    2>&1 | grep -E "TOTAL|volumes"
done
echo "== A/B: BSW int16 DP state (Mosaic lowering smoke + bench) =="
timeout 900 python - <<'EOF'
import numpy as np, jax.numpy as jnp
from compseed_tpu.options import MemOptions, fill_scmat
from compseed_tpu.ops.bsw_pallas import LT, bsw_extend_tiles, clamp_band
opt = MemOptions(); mat = np.array(fill_scmat(1, 4), np.int32)
rng = np.random.default_rng(0)
q = rng.integers(0, 4, (LT, 128)).astype(np.int8)
t = rng.integers(0, 4, (LT, 256)).astype(np.int8)
ql = np.full((LT,1), 101, np.int32); tl = np.full((LT,1), 200, np.int32)
h0 = np.full((LT,1), 30, np.int32)
ws = clamp_band(ql[:,0], opt.w, 1, opt.pen_clip5, opt.o_del, opt.e_del,
                opt.o_ins, opt.e_ins)[:, None]
a = {}
for s16 in (False, True):
    a[s16] = np.asarray(bsw_extend_tiles(
        jnp.asarray(mat.reshape(1,25)), jnp.asarray(q), jnp.asarray(ql),
        jnp.asarray(t), jnp.asarray(tl), jnp.asarray(h0), jnp.asarray(ws),
        o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
        e_ins=opt.e_ins, zdrop=opt.zdrop, state16=s16))
print("int16 lowering OK; outputs equal:", np.array_equal(a[False], a[True]))
EOF
COMPSEED_BSW_I16=1 timeout 5400 python bench.py
echo "== chunk-size scaling (seeding-only reads/s) =="
for C in 16384 32768 65536; do
  echo "-- chunk $C"
  timeout 4800 python scripts/profile_phases.py "$C" 2>&1 | \
    grep -E "TOTAL|volumes"
done
echo "== cap headroom sweep (GP_F tighter) =="
COMPSEED_GP_F=28 timeout 3600 python scripts/profile_phases.py 2>&1 | \
  grep -E "TOTAL|volumes"
echo "== hg19-scale device alignment =="
timeout 7200 python scripts/hg19_align.py 2>&1 | tail -8
echo "== checkin complete: paste the numbers into CLAUDE.md + memory =="
