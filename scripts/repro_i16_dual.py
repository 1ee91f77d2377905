"""Minimal TPU repro for the COMPSEED_BSW_I16 fused-dual Mosaic crash.

Round-4 A/B found: bsw_extend_tiles(state16=True) lowers and runs clean
standalone, but the fused dual program (bsw_meta_dual -> _call_kernel
x2 with state16=True) dies at Mosaic compile time on the axon tunnel
(EVIDENCE/ab_r04_notes.md row BSW_I16).  This script isolates the two
call shapes at tiny width so the compile is seconds, prints PASS/FAIL
per leg, and surfaces the Mosaic error for the fix.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from compseed_tpu.options import MemOptions, fill_scmat


def main():
    print("backend:", jax.default_backend(), flush=True)
    opt = MemOptions()
    mat = np.array(fill_scmat(1, 4), dtype=np.int32)
    mat25 = jnp.asarray(mat.reshape(1, 25))
    rng = np.random.default_rng(7)

    from compseed_tpu.ops.bsw_pallas import LT, bsw_extend_tiles, clamp_band
    P, Q, T = LT, 32, 128
    qlens = rng.integers(1, Q, P).astype(np.int32)
    tlens = rng.integers(1, T, P).astype(np.int32)
    queries = rng.integers(0, 4, (P, Q)).astype(np.int8)
    targets = rng.integers(0, 4, (P, T)).astype(np.int8)
    h0 = rng.integers(1, 60, P).astype(np.int32)
    ws = clamp_band(qlens, opt.w, 1, opt.pen_clip5, opt.o_del, opt.e_del,
                    opt.o_ins, opt.e_ins)

    for state16 in (False, True):
        try:
            out = np.asarray(bsw_extend_tiles(
                mat25, jnp.asarray(queries), jnp.asarray(qlens[:, None]),
                jnp.asarray(targets), jnp.asarray(tlens[:, None]),
                jnp.asarray(h0[:, None]), jnp.asarray(ws[:, None]),
                o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                e_ins=opt.e_ins, zdrop=opt.zdrop, state16=state16))
            print(f"standalone state16={state16}: PASS "
                  f"(best[0]={out[0, 0]})", flush=True)
        except Exception as e:
            print(f"standalone state16={state16}: FAIL\n{e}", flush=True)

    # --- dual program: tiny fake pac + read matrix, the real meta path
    from compseed_tpu.ops.bsw import bsw_meta_dual
    R, L = 8, 64
    qarr = rng.integers(0, 4, (R, L)).astype(np.int8)
    qflat = jnp.asarray(qarr.reshape(-1))
    l_pac = 4096
    from compseed_tpu.index.build import pack_pac
    from compseed_tpu.ops.device_index import pack_pac_words
    codes = rng.integers(0, 4, l_pac).astype(np.uint8)
    pac_dev = jnp.asarray(pack_pac_words(pack_pac(codes), l_pac))

    meta = np.zeros((LT, 12), np.int32)
    n = LT
    meta[:, 0] = rng.integers(0, R, n)                      # rid
    meta[:, 2] = rng.integers(1, 33, n)                     # qlen
    meta[:, 1] = [rng.integers(0, L - q + 1) for q in meta[:, 2]]
    meta[:, 3] = 0                                          # rev
    meta[:, 6] = rng.integers(1, 120, n)                    # rlen
    # NOTE: r0 ranges over the whole doubled pac, so a target window
    # can straddle the forward/reverse midpoint — a configuration the
    # real pipeline never produces (extensions stay on one strand).
    # Fine for this script's purpose (lowering/compile repro); do not
    # use its scores as a numeric oracle for strand-valid extensions.
    meta[:, 4] = [rng.integers(0, 2 * l_pac - t) for t in meta[:, 6]]
    meta[:, 7] = rng.integers(1, 40, n)                     # h0
    meta[:, 8] = -1                                         # prev
    meta[:, 9] = clamp_band(meta[:, 2].astype(np.int32), opt.w, 1,
                            opt.pen_clip5, opt.o_del, opt.e_del,
                            opt.o_ins, opt.e_ins)
    meta[:, 10] = clamp_band(meta[:, 2].astype(np.int32), 2 * opt.w, 1,
                             opt.pen_clip5, opt.o_del, opt.e_del,
                             opt.o_ins, opt.e_ins)

    for state16 in (False, True):
        try:
            out = np.asarray(bsw_meta_dual(
                mat25, qflat, pac_dev, jnp.asarray(meta),
                Q=32, T=128, L=L, l_pac=l_pac,
                o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                e_ins=opt.e_ins, zdrop=opt.zdrop, w0=opt.w,
                use_pallas=True, state16=state16))
            print(f"dual state16={state16}: PASS (best[0]={out[0, 0]})",
                  flush=True)
        except Exception as e:
            print(f"dual state16={state16}: FAIL\n{e}", flush=True)


if __name__ == "__main__":
    main()
