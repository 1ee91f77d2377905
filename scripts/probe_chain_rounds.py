"""Measure chain_scan round counts + alive decay on the bench input.

The while-loop round is the cost unit of the memo engine (each round
pays a 4-key lexsort, 2 argsorts, a W-step rep walk, and a n_lanes*W
pool scatter).  This prints, for r1/r2/r3 call shapes, the number of
rounds and the alive-lane decay so lane-compaction / claim-table
designs can be sized from data.
"""
from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    import bench
    import jax
    import jax.numpy as jnp
    from compseed_tpu.options import MemOptions
    from compseed_tpu.ops import seedscan as ss
    from compseed_tpu.ops.engine import device_seeder
    from compseed_tpu.ops.seeder2 import _bucket, _round_up

    CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    fm, reads_arr = bench._setup()
    opt = MemOptions()
    seeder = device_seeder(opt, fm, dedup=True)
    Rb = _bucket(CHUNK, 256)
    Lb = _round_up(101 + 1, 32)
    qa = np.full((Rb, Lb), 4, np.uint8)
    rl = np.zeros(Rb, np.int32)
    for i in range(min(CHUNK, len(reads_arr))):
        q = reads_arr[i]
        qa[i, :len(q)] = q
        rl[i] = len(q)
    qd, rd = jnp.asarray(qa), jnp.asarray(rl)
    dfi = seeder.dfi
    dt = dfi.dtype
    GP = seeder.GP_F * Rb
    CW = seeder.chain_w
    MEMO_M = (256 // CW) * Rb
    MEMO_H = 1 << (4 * MEMO_M - 1).bit_length()

    @jax.jit
    def j_r1(fm_, qarr, rlens):
        memo0 = ss.make_chain_memo(MEMO_H, MEMO_M, CW, dt)
        return ss.chain_scan(fm_, qarr, rlens, GP, memo0, W=CW,
                             u_cap=max(Rb // 2, 64), report_rounds=True)

    pool, cur, ovf, fq, fc, memo, rnd, hist = j_r1(dfi, qd, rd)
    hist = np.asarray(hist)
    rnd = int(rnd)
    print(f"r1: rounds={rnd} fq={int(fq)} fc={int(fc)} "
          f"n_pool={int(cur)} ovf={bool(ovf)}")
    alive = hist[:rnd]
    q = lambda p: int(np.searchsorted(-alive, -p * Rb))
    print(f"r1 alive decay: start={alive[0]}  "
          f"rounds with alive>75%={q(0.75)} >50%={q(0.5)} >25%={q(0.25)} "
          f">10%={q(0.10)} >1%={q(0.01)}")
    print("r1 alive[every 4th]:", alive[::4].tolist())
    print("lane-rounds total:", int(alive.sum()),
          f"vs full-width cost {rnd * Rb} "
          f"({100.0 * alive.sum() / (rnd * Rb):.1f}% utilized)")


if __name__ == "__main__":
    main()
