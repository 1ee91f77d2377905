"""Primitive-rate microbench: re-measure the TPU dispatch floor.

Round-2 profiling recorded row-gather rates of 0.3/1.4/9.9 M rows/s at
B=16k/131k/1M (~50-100 ms fixed per dispatch) where round 1 had seen a
~0.5 ms per-op floor — a 100x discrepancy that poisoned every
microbench-derived design decision (VERDICT round 2, Weak #2).  This
script isolates the layers so the regression can be root-caused:

  1. empty dispatch            — device.put + tiny add, timed per-op
  2. donated tiny add          — same without new H2D each call
  3. row gather, XLA path      — B in {16k, 131k, 1M}
  4. row gather, Pallas path   — same sizes
  5. extend_batch              — B = 16k live intervals
  6. H2D / D2H                 — 1 MB packed array round trip

All timings use pre-staged device-resident inputs (indices shipped
once), block_until_ready, and report median of N reps after 2 warmups,
so a tunnel-latency artifact (per-call host sync cost) shows up as a
constant offset across sizes while a true rate change scales with B.
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

REPS = 10


def timed(fn, *args, reps=REPS):
    for _ in range(2):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.min(ts))


def main() -> None:
    print("devices:", jax.devices())
    dev = jax.devices()[0]

    # 1. dispatch floor: tiny jitted add on device-resident data
    x = jax.device_put(np.ones(8, np.float32), dev)
    add = jax.jit(lambda a: a + 1)
    med, lo = timed(add, x, reps=30)
    print(f"tiny-add dispatch: median {med*1e3:.3f} ms  min {lo*1e3:.3f} ms")

    # 2. chained dispatches in one block_until_ready (queue depth cost)
    def chain10(a):
        for _ in range(10):
            a = add(a)
        return a
    med, lo = timed(chain10, x, reps=10)
    print(f"10 chained tiny-adds: median {med*1e3:.3f} ms "
          f"({med*1e2:.3f} ms/op amortized)")

    # 3/4. row gather at sizes
    from bench import _setup
    from compseed_tpu.ops.device_index import to_device
    from compseed_tpu.ops import occ_gather
    fm_host, _ = _setup()
    dfi = to_device(fm_host)
    table = dfi.occ_rows
    n_rows = int(table.shape[0])
    print(f"occ table: {table.shape} {table.dtype} "
          f"({table.size * table.dtype.itemsize / 1e6:.1f} MB)")
    rng = np.random.default_rng(0)

    xla_gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    pal_gather = jax.jit(occ_gather.gather_rows_pallas)
    for B in (16_384, 131_072, 1_048_576):
        idx = jax.device_put(
            rng.integers(0, n_rows, size=B).astype(np.int32), dev)
        med, lo = timed(xla_gather, table, idx)
        print(f"XLA gather   B={B:>8}: median {med*1e3:8.2f} ms  "
              f"{B/med/1e6:8.2f} M rows/s  (min {lo*1e3:.2f} ms)")
        try:
            med, lo = timed(pal_gather, table, idx)
            print(f"Pallas gather B={B:>7}: median {med*1e3:8.2f} ms  "
                  f"{B/med/1e6:8.2f} M rows/s  (min {lo*1e3:.2f} ms)")
        except Exception as e:  # noqa: BLE001
            print(f"Pallas gather B={B}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")

    # 5. extend_batch
    from compseed_tpu.ops.fm import extend_batch
    B = 16_384
    k = rng.integers(0, dfi.seq_len, size=B)
    l = rng.integers(0, dfi.seq_len, size=B)
    s = rng.integers(1, 100, size=B)
    ik = jax.device_put(
        np.stack([k, l, s], axis=1).astype(np.int64), dev)
    ext = jax.jit(lambda iv: extend_batch(dfi, iv, True))
    med, lo = timed(ext, ik)
    print(f"extend_batch B={B}: median {med*1e3:.2f} ms  "
          f"{B/med/1e6:.2f} M ext/s  (min {lo*1e3:.2f} ms)")

    # 6. transfers
    host_buf = np.ones(1 << 20, np.uint8)   # 1 MB
    med, lo = timed(lambda b: jax.device_put(b, dev), host_buf)
    print(f"H2D 1MB: median {med*1e3:.2f} ms ({1/med:.0f} MB/s)")
    dev_buf = jax.device_put(host_buf, dev)
    med, lo = timed(lambda b: np.asarray(b), dev_buf)
    print(f"D2H 1MB: median {med*1e3:.2f} ms ({1/med:.0f} MB/s)")


if __name__ == "__main__":
    main()
