"""Per-phase device timing of the v2 seeder on the bench workload.

Times each jitted phase (r1 scan+walks, r2 re-seed, r3 greedy, merge,
SAL+seeds, pack) with block_until_ready, plus gather-rate microbenches,
so kernel work can be aimed at the real wall. Run on the TPU terminal:

    python scripts/profile_seeding.py [chunk_reads]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# honor an explicit cpu request (the machine profile pins the TPU via
# jax.config, which beats the env var alone)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    try:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import numpy as np


def timed(label, f, *a, n=3):
    f(*a)  # compile + warm
    best = min(_run(f, a) for _ in range(n))
    print(f"{label:28s} {best * 1e3:9.2f} ms")
    return best


def _run(f, a):
    import jax
    t0 = time.time()
    jax.block_until_ready(f(*a))
    return time.time() - t0


def main():
    import bench
    import jax
    import jax.numpy as jnp

    fm, reads_arr = bench._setup()
    CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    from compseed_tpu.options import MemOptions
    from compseed_tpu.ops.engine import device_seeder

    opt = MemOptions()
    seeder = device_seeder(opt, fm, dedup=True)
    queries = [reads_arr[i] for i in range(CHUNK)]

    R = len(queries)
    L = 128  # 101 rounded up per run_flat
    qarr = np.full((R, L), 4, np.uint8)
    rlens = np.zeros(R, np.int32)
    for i, q in enumerate(queries):
        qarr[i, :len(q)] = q
        rlens[i] = len(q)
    from compseed_tpu.ops.seeder2 import _bucket, _round_up
    Rb = _bucket(R, 256)
    Lb = _round_up(101 + 1, 32)
    qa = np.full((Rb, Lb), 4, np.uint8)
    qa[:R, :L if L < Lb else Lb] = qarr[:, :Lb]
    rl = np.zeros(Rb, np.int32)
    rl[:R] = rlens
    fns = seeder._build(Rb, Lb)
    qd, rd = jnp.asarray(qa), jnp.asarray(rl)

    dfi0 = seeder.dfi
    t_r1 = timed("r1 scan+walk(+dedup)", fns["r1"], dfi0, qd, rd)
    r1 = fns["r1"](dfi0, qd, rd)
    (pool, ok, rid, k, l, s, beg, end, ovf1, bad1, n_pool, n_u,
     fqc, fcc, memo) = r1
    t_r2 = timed("r2 reseed", fns["r2"], dfi0, qd, rd, ok, rid, k, s,
                 beg, end, memo)
    r2 = fns["r2"](dfi0, qd, rd, ok, rid, k, s, beg, end, memo)
    t_r3 = timed("r3 greedy", fns["r3"], dfi0, qd, rd, r2[11])
    r3 = fns["r3"](dfi0, qd, rd, r2[11])
    t_mg = timed("merge/lexsort", fns["merge"], ok, rid, k, l, s, beg,
                 end, *r2[:7], *r3[:7])
    merged = fns["merge"](ok, rid, k, l, s, beg, end, *r2[:7], *r3[:7])
    mok, mrid, mk, ml, ms, mbeg, mend, mtotal, movf = merged
    t_sd = timed("SAL walks + seeds", fns["seeds"], dfi0, mok, mrid, mk,
                 ms, mbeg, mend)
    seeds = fns["seeds"](dfi0, mok, mrid, mk, ms, mbeg, mend)
    t_pk = timed("pack blobs", fns["pack"], mok, mrid, ms, mbeg, mend,
                 merged[7], *seeds[:4], seeds[4], seeds[5], ovf1, r2[7],
                 bad1, r2[8], r3[7], merged[8], seeds[6], r3[8],
                 n_pool, n_u, fqc + r2[9] + r3[9], fcc + r2[10] + r3[10])
    total = t_r1 + t_r2 + t_r3 + t_mg + t_sd + t_pk
    print(f"{'TOTAL seeding':28s} {total * 1e3:9.2f} ms "
          f"({CHUNK / total:.0f} reads/s seeding-only)")
    print(f"volumes: n_pool={int(n_pool)} n_u={int(n_u)} "
          f"mems={int(merged[7])} seeds={int(seeds[3])} "
          f"sal_uniq={int(seeds[4])} fwd_q={int(fqc + r2[9] + r3[9])} "
          f"fwd_c={int(fcc + r2[10] + r3[10])}")

    # ---- microbenches: the primitive rates that bound everything
    dfi = seeder.dfi
    nrows = dfi.occ_rows.shape[0]
    for B in (1 << 14, 1 << 17, 1 << 20):
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, nrows, B).astype(
                dfi.dtype))
        f = jax.jit(lambda ix: dfi.occ_rows[ix].sum(dtype=jnp.uint32))
        f(idx)
        t0 = time.time()
        jax.block_until_ready(f(idx))
        dt = time.time() - t0
        print(f"row-gather B={B:>8}: {B / dt / 1e6:8.1f} M rows/s "
              f"({dt * 1e3:.2f} ms)")

    from compseed_tpu.ops.fm import extend_batch
    B = 1 << 14
    rng = np.random.default_rng(1)
    ik = jnp.asarray(np.stack([
        rng.integers(0, dfi.seq_len, B),
        rng.integers(0, dfi.seq_len, B),
        np.ones(B)], axis=1).astype(dfi.dtype))
    g = jax.jit(lambda a: extend_batch(dfi, a, False))
    g(ik)
    t0 = time.time()
    jax.block_until_ready(g(ik))
    dt = time.time() - t0
    print(f"extend_batch B={B}: {B / dt / 1e6:8.1f} M ext/s "
          f"({dt * 1e3:.2f} ms)")


if __name__ == "__main__":
    main()
