"""Probe for nondeterministic device results / flaky D2H transfers on
the axon backend.

A: run bsw_extend_tiles on one fixed input N times, compare outputs.
B: fetch the same device-resident array N times, compare bytes.
C: run the stage-3 chunk twice, diff SAM outputs run-to-run.
Select with argv letters (default: A B)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
import jax.numpy as jnp


def probe_a(n=10):
    from compseed_tpu.options import MemOptions, fill_scmat
    from compseed_tpu.ops.bsw_pallas import LT, bsw_extend_tiles, clamp_band
    opt = MemOptions()
    mat = np.array(fill_scmat(1, 4), np.int32)
    rng = np.random.default_rng(0)
    P = 2048
    q = rng.integers(0, 4, (P, 128)).astype(np.int8)
    t = rng.integers(0, 4, (P, 256)).astype(np.int8)
    ql = np.full((P, 1), 101, np.int32)
    tl = rng.integers(50, 256, (P, 1)).astype(np.int32)
    h0 = rng.integers(1, 60, (P, 1)).astype(np.int32)
    ws = clamp_band(ql[:, 0], opt.w, 1, opt.pen_clip5, opt.o_del,
                    opt.e_del, opt.o_ins, opt.e_ins)[:, None]
    args = [jnp.asarray(x) for x in
            (mat.reshape(1, 25), q, ql, t, tl, h0, ws)]
    outs = []
    for i in range(n):
        outs.append(np.asarray(bsw_extend_tiles(
            *args, o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
            e_ins=opt.e_ins, zdrop=opt.zdrop)))
    base = outs[0]
    for i, o in enumerate(outs[1:], 1):
        if not np.array_equal(base, o):
            d = np.nonzero((base != o).any(axis=1))[0]
            print(f"[A] run {i} DIFFERS from run 0 in {len(d)} rows; "
                  f"first {d[:5]}")
            for r in d[:3]:
                print("   run0", base[r], "runi", o[r])
    print(f"[A] {n} kernel runs compared")


def probe_b(n=20):
    rng = np.random.default_rng(1)
    host = rng.integers(-2**31, 2**31 - 1, (4096, 512), np.int64)
    host = host.astype(np.int32)
    dev = jnp.asarray(host)
    dev.block_until_ready()
    for i in range(n):
        got = np.asarray(jax.device_get(dev))
        if not np.array_equal(got, host):
            d = np.nonzero((got != host).any(axis=1))[0]
            print(f"[B] fetch {i} CORRUPT in {len(d)} rows; first {d[:5]}")
    print(f"[B] {n} fetches of a 8 MB device array compared")


def probe_c():
    import bench
    from compseed_tpu.io.fastq import Read
    from compseed_tpu.options import MemOptions
    from compseed_tpu.ops.engine import device_seeder
    from compseed_tpu.ops.bsw import BswRunner
    from compseed_tpu.pipeline.align import align_chunk
    from compseed_tpu.native import NativeTail
    from compseed_tpu.utils import NT4_TO_ASCII
    fm, reads_arr = bench._setup()
    opt = MemOptions()
    seeder = device_seeder(opt, fm, dedup=True)
    tail = NativeTail(opt, fm)
    eng = BswRunner(opt, np.array(opt.mat), use_pallas=True, dfi=None)
    sams = []
    for rep in range(2):
        reads = [Read(name=str(i),
                      seq=bytes(NT4_TO_ASCII[reads_arr[i]]).decode(),
                      qual=None, comment=None) for i in range(16384)]
        align_chunk(opt, fm, reads, 0, engine=eng, seeder=seeder, tail=tail)
        bad = [r.name for r in reads if any(ord(c) > 127 for c in r.sam)]
        print(f"[C] rep {rep}: {len(bad)} corrupt: {bad[:8]}")
        sams.append([r.sam for r in reads])
    diff = [i for i, (a, b) in enumerate(zip(*sams)) if a != b]
    print(f"[C] rep0 vs rep1: {len(diff)} SAMs differ; first {diff[:8]}")


if __name__ == "__main__":
    sel = sys.argv[1:] or ["A", "B"]
    if "A" in sel:
        probe_a()
    if "B" in sel:
        probe_b()
    if "C" in sel:
        probe_c()
