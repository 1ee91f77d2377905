"""True per-op TPU rates via K-chaining + D2H sync (axon tunnel).

block_until_ready does NOT block on the axon backend (measured
2026-08-19: a 8192^3 matmul "completes" in 0.03 ms = 200x hardware
peak).  Execution is async; the only real sync is a D2H fetch.  So:
chain K data-dependent copies of the op inside one jit, sync with a
tiny scalar D2H, and difference two K values — the slope is the true
per-op cost, with compile and tunnel latency cancelled out.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
import jax.numpy as jnp


def sync(r):
    return float(np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0]))


def slope(make_fn, k_lo, k_hi, *args, reps=5):
    out = {}
    for K in (k_lo, k_hi):
        f = jax.jit(make_fn(K))
        t0 = time.perf_counter()
        sync(f(*args))
        print(f"    K={K}: first call (compile) {time.perf_counter()-t0:.1f}s",
              flush=True)
        sync(f(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(*args))
            ts.append(time.perf_counter() - t0)
        out[K] = float(np.median(ts))
        print(f"    K={K}: median {out[K]*1e3:.1f} ms", flush=True)
    return (out[k_hi] - out[k_lo]) / (k_hi - k_lo)


def main() -> None:
    dev = jax.devices()[0]
    print("devices:", jax.devices(), flush=True)

    # tiny sync round trip
    x = jax.device_put(np.ones(8, np.float32), dev)
    f = jax.jit(lambda v: v[0])
    sync(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        sync(f(x))
        ts.append(time.perf_counter() - t0)
    print(f"tiny sync round-trip: {np.median(ts)*1e3:.1f} ms", flush=True)

    # matmul sanity
    n = 4096
    a = jax.device_put(np.ones((n, n), np.float32), dev).astype(jnp.bfloat16)

    def mk_mm(K):
        def f(x):
            y = x
            for _ in range(K):
                y = y @ x
            return y[0, 0].astype(jnp.float32)
        return f
    per = slope(mk_mm, 2, 12, a)
    print(f"matmul{n} bf16: {per*1e3:.2f} ms/op = "
          f"{2*n**3/per/1e12:.1f} TFLOP/s", flush=True)

    from bench import _setup
    from compseed_tpu.ops.device_index import to_device
    fm, _ = _setup()
    dfi = to_device(fm)
    table = dfi.occ_rows
    n_rows = np.uint32(table.shape[0])
    rng = np.random.default_rng(0)

    def mk_g(K):
        def f(t, i):
            for _ in range(K):
                r = jnp.take(t, i, axis=0)
                i = ((r[:, 0].astype(jnp.uint32) + i.astype(jnp.uint32))
                     % n_rows).astype(jnp.int32)
            return i[0]
        return f
    for B in (16_384, 131_072, 1_048_576):
        idx = jax.device_put(
            rng.integers(0, int(n_rows), B).astype(np.int32), dev)
        print(f"  gather B={B}:", flush=True)
        per = slope(mk_g, 2, 12, table, idx)
        print(f"gather B={B}: {per*1e3:.3f} ms/op = "
              f"{B/per/1e6:.1f} M rows/s", flush=True)

    # extend_batch slope
    from compseed_tpu.ops.fm import extend_batch
    B = 16_384
    k = rng.integers(0, dfi.seq_len, size=B)
    l_ = rng.integers(0, dfi.seq_len, size=B)
    s = rng.integers(1, 100, size=B)
    ik = jax.device_put(np.stack([k, l_, s], 1).astype(np.int64), dev)

    def mk_e(K):
        def f(iv):
            for _ in range(K):
                out = extend_batch(dfi, iv, True)   # (B, 4, 3)
                iv = out[:, 0, :] % dfi.seq_len
            return iv[0, 0]
        return f
    print("  extend_batch B=16384:", flush=True)
    per = slope(mk_e, 1, 5, ik)
    print(f"extend_batch B={B}: {per*1e3:.2f} ms/op = "
          f"{B/per/1e6:.2f} M ext/s", flush=True)


if __name__ == "__main__":
    main()
