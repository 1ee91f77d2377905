"""Split the engine's per-chunk cost: pair volumes per call, meta-path
wall (device tile build from metadata + kernel), and the kernel-only
wall on identical shapes — to tell whether the BSW time is DP compute
or the flat-gather tile build in bsw_meta_tiles.

Run: python scripts/probe_bsw.py [chunk_reads]
"""
from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    import bench
    from compseed_tpu.io.fastq import Read
    from compseed_tpu.options import MemOptions
    from compseed_tpu.ops.bsw import BswRunner
    from compseed_tpu.ops.engine import device_seeder
    from compseed_tpu.pipeline.align import align_chunk
    from compseed_tpu.native import NativeTail
    from compseed_tpu.utils import NT4_TO_ASCII

    CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    fm, reads_arr = bench._setup()
    opt = MemOptions()
    seeder = device_seeder(opt, fm, dedup=True)
    tail = NativeTail(opt, fm)

    calls = []

    class ProbeEngine(BswRunner):
        def run_meta(self, qmeta, rmeta, h0, w, pen):
            t0 = time.perf_counter()
            out = super().run_meta(qmeta, rmeta, h0, w, pen)
            calls.append(dict(n=len(h0), w=int(w),
                              qmax=int(qmeta[:, 2].max(initial=0)),
                              tmax=int(rmeta[:, 1].max(initial=0)),
                              wall=time.perf_counter() - t0,
                              qmeta=qmeta.copy(), rmeta=rmeta.copy(),
                              h0=h0.copy(), pen=pen))
            return out

    engine = ProbeEngine(opt, np.array(opt.mat), dfi=seeder.dfi)

    def mk_reads(lo, hi):
        return [Read(name=str(i), seq=bytes(
            NT4_TO_ASCII[reads_arr[i % len(reads_arr)]]).decode(),
            qual=None, comment=None) for i in range(lo, hi)]

    # warm (compiles), then measure one chunk
    align_chunk(opt, fm, mk_reads(0, CHUNK), 0, engine=engine,
                seeder=seeder, tail=tail)
    calls.clear()
    t0 = time.perf_counter()
    align_chunk(opt, fm, mk_reads(0, CHUNK), 0, engine=engine,
                seeder=seeder, tail=tail)
    chunk_wall = time.perf_counter() - t0

    print(f"chunk wall {chunk_wall*1e3:.0f} ms; engine calls:")
    tot = 0.0
    for c in calls:
        print(f"  n={c['n']:7d} w={c['w']:3d} qmax={c['qmax']:4d} "
              f"tmax={c['tmax']:5d} wall={c['wall']*1e3:7.1f} ms")
        tot += c["wall"]
    print(f"engine total {tot*1e3:.0f} ms")

    # replay each call: meta path (timed hot, queue-3) vs kernel-only on
    # the same padded shapes (tile build replaced by host-precomputed
    # tiles shipped once, outside the timed region)
    from compseed_tpu.ops.bsw_pallas import LT, bsw_extend_tiles, \
        bsw_meta_tiles, clamp_band
    import jax.numpy as jnp
    from compseed_tpu.ops.bsw import _bucket, _q_classes

    for c in calls:
        qmeta, rmeta, h0, pen = c["qmeta"], c["rmeta"], c["h0"], c["pen"]
        n = len(h0)
        if n == 0:
            continue
        qlens = qmeta[:, 2].astype(np.int32)
        tlens = rmeta[:, 1].astype(np.int32)
        qflat, L = engine._qctx
        for Q, cls in _q_classes(qlens):
            m = len(cls)
            order = cls[np.argsort(tlens[cls], kind="stable")]
            P = _bucket(m, LT)
            T = _bucket(int(tlens[order].max(initial=1)), 128)
            qm = np.zeros((P, 4), np.int32)
            qm[:m] = qmeta[order]
            r0 = np.zeros(P, rmeta.dtype)
            r0[:m] = rmeta[order, 0]
            rl = np.zeros(P, np.int32)
            rl[:m] = tlens[order]
            h0p = np.ones((P, 1), np.int32)
            h0p[:m, 0] = h0[order]
            ws = np.full((P, 1), c["w"], np.int32)
            ws[:m, 0] = clamp_band(qlens[order], c["w"], engine.max_sc,
                                   pen, opt.o_del, opt.e_del, opt.o_ins,
                                   opt.e_ins)
            dt = engine.dfi.dtype
            args = (engine.mat25, qflat, engine.dfi.pac_words,
                    jnp.asarray(qm), jnp.asarray(r0).astype(dt),
                    jnp.asarray(rl), jnp.asarray(h0p), jnp.asarray(ws))
            kw = dict(Q=Q, T=T, L=L, l_pac=engine.dfi.l_pac,
                      o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                      e_ins=opt.e_ins, zdrop=opt.zdrop, state16=False)
            out = bsw_meta_tiles(*args, **kw)           # compile + warm
            np.asarray(out)
            REP = 5
            t0 = time.perf_counter()
            outs = [bsw_meta_tiles(*args, **kw) for _ in range(REP)]
            np.asarray(outs[-1][0, 0])
            meta_ms = (time.perf_counter() - t0) / REP * 1e3

            # kernel-only: fetch the device-built tiles once, re-feed
            qs8, ts8 = _fetch_tiles(engine, qm, r0, rl, Q, T, L)
            targs = (engine.mat25, jnp.asarray(qs8),
                     jnp.asarray(qm[:, 2:3].astype(np.int32)),
                     jnp.asarray(ts8), jnp.asarray(rl[:, None]),
                     jnp.asarray(h0p), jnp.asarray(ws))
            tkw = dict(o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                       e_ins=opt.e_ins, zdrop=opt.zdrop, state16=False)
            out2 = bsw_extend_tiles(*targs, **tkw)
            np.asarray(out2)
            t0 = time.perf_counter()
            outs = [bsw_extend_tiles(*targs, **tkw) for _ in range(REP)]
            np.asarray(outs[-1][0, 0])
            kern_ms = (time.perf_counter() - t0) / REP * 1e3
            ok = np.array_equal(np.asarray(out)[:m], np.asarray(out2)[:m])
            print(f"  call n={n:7d} class Q={Q} P={P} T={T}: "
                  f"meta {meta_ms:7.1f} ms  kernel-only {kern_ms:7.1f} ms  "
                  f"build {meta_ms-kern_ms:7.1f} ms  equal={ok}")


def _fetch_tiles(engine, qm, r0, rl, Q, T, L):
    """Host copy of the device tile build (bsw_meta_tiles preamble)."""
    import jax.numpy as jnp
    from compseed_tpu.ops.device_index import pac_codes_at
    i32 = np.int32
    qflat, _ = engine._qctx
    rid, q0, ql, rev = (qm[:, 0], qm[:, 1], qm[:, 2], qm[:, 3])
    sign = np.where(rev == 1, -1, 1).astype(i32)
    j = np.arange(Q, dtype=i32)
    qpos = q0[:, None] + sign[:, None] * j[None, :]
    flat = rid[:, None] * L + qpos
    qf = np.asarray(qflat)
    inq = j[None, :] < ql[:, None]
    qt = np.where(inq, qf[np.clip(flat, 0, len(qf) - 1)], 4)
    j2 = np.arange(T, dtype=np.int64)
    l_pac = engine.dfi.l_pac
    gp = r0[:, None].astype(np.int64) + sign[:, None] * j2[None, :]
    fwd = gp < l_pac
    pf = np.where(fwd, gp, 2 * l_pac - 1 - gp)
    tv = np.asarray(pac_codes_at(engine.dfi.pac_words,
                                 jnp.asarray(pf))).astype(i32)
    tv = np.where(fwd, tv, 3 - tv)
    tt = np.where(j2[None, :] < rl[:, None], tv, 4)
    return qt.astype(np.int8), tt.astype(np.int8)


if __name__ == "__main__":
    main()
