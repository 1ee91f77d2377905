"""Queue-N decomposition of the DP engine's device cost at bench
shapes: full bsw_meta_dual vs tile build alone vs DP alone — names the
dominant term of the ~0.7-0.9 s/chunk engine bucket (seeding's twin
probe is profile_phases).

Run on the TPU: python scripts/probe_engine.py [P] [T]
"""
from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

SYNC_S = 0.034


def qtime(label, f, n=8, reps=3):
    import jax

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf).ravel()[:1]

    sync(f())
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = f()
        sync(r)
        dt = (time.perf_counter() - t0 - SYNC_S) / n
        best = dt if best is None else min(best, dt)
    print(f"{label:34s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    import bench
    import jax
    import jax.numpy as jnp

    from compseed_tpu.options import MemOptions, fill_scmat
    from compseed_tpu.ops.bsw_pallas import (build_tiles, build_tiles_ref,
                                             _call_kernel)
    from compseed_tpu.ops.bsw import pallas_available
    from compseed_tpu.ops.device_index import to_device

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    Q, L, R = 128, 128, 16384
    fm, reads_arr = bench._setup()
    dfi = to_device(fm)
    l_pac = int(dfi.l_pac)
    opt = MemOptions()
    mat = jnp.asarray(np.array(fill_scmat(opt.a, opt.b), np.int32)
                      .reshape(1, 25))   # _call_kernel mat25 layout
    rng = np.random.default_rng(5)
    qarr = np.full((R, L), 4, np.uint8)
    qarr[:, :101] = reads_arr[:R]
    qflat = jnp.asarray(qarr.reshape(-1))

    qmeta = np.zeros((P, 4), np.int32)
    qmeta[:, 0] = rng.integers(0, R, P)
    qmeta[:, 2] = rng.integers(20, 102, P)
    qmeta[:, 3] = rng.integers(0, 2, P)
    qmeta[:, 1] = np.where(qmeta[:, 3] == 0,
                           rng.integers(0, 26, P),
                           rng.integers(101, 127, P) - 26)
    rlen = rng.integers(30, 200, P).astype(np.int32)
    r0 = np.where(qmeta[:, 3] == 0,
                  rng.integers(0, l_pac - 210, P),
                  rng.integers(210, l_pac, P)).astype(np.int32)
    h0 = rng.integers(10, 100, P).astype(np.int32)
    ws = np.full((P, 1), opt.w, np.int32)
    qm = jnp.asarray(qmeta)
    r0j = jnp.asarray(r0)
    rl = jnp.asarray(rlen)
    h0j = jnp.asarray(h0[:, None])
    wsj = jnp.asarray(ws)

    tiles_new = jax.jit(lambda: build_tiles(
        qflat, dfi.pac_words, qm, r0j, rl, Q=Q, T=T, L=L, l_pac=l_pac))
    tiles_ref = jax.jit(lambda: build_tiles_ref(
        qflat, dfi.pac_words, qm, r0j, rl, Q=Q, T=T, L=L, l_pac=l_pac))
    t_new = qtime(f"build_tiles packed (P={P})", tiles_new)
    t_ref = qtime(f"build_tiles per-cell (P={P})", tiles_ref)

    use_pallas = pallas_available()
    print(f"pallas_available: {use_pallas}", flush=True)
    qt, ql, tt = jax.jit(lambda: build_tiles(
        qflat, dfi.pac_words, qm, r0j, rl, Q=Q, T=T, L=L,
        l_pac=l_pac))()
    qt = jax.block_until_ready(qt)

    if use_pallas:
        dp = jax.jit(lambda: _call_kernel(
            mat, qt, ql[:, None].astype(jnp.int32), tt,
            rl[:, None], h0j, wsj,
            opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.zdrop))
        t_dp = qtime(f"pallas DP alone (P={P}, T={T})", dp)
    print(f"ratio packed/per-cell: {t_new / max(t_ref, 1e-9):.2f}",
          flush=True)


if __name__ == "__main__":
    main()
