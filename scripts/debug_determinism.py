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


def probe_a2(n=12, sync=False):
    """Like A, but a FRESH host->device transfer feeds every call (the
    pipeline's actual pattern).  sync=True blocks on the uploads before
    the kernel call — if A2 flakes and A2-sync doesn't, the axon H2D
    path races kernel execution."""
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
    host = (mat.reshape(1, 25), q, ql, t, tl, h0, ws)
    outs = []
    for i in range(n):
        args = [jnp.asarray(x.copy()) for x in host]
        if sync:
            for a in args:
                a.block_until_ready()
        outs.append(np.asarray(bsw_extend_tiles(
            *args, o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
            e_ins=opt.e_ins, zdrop=opt.zdrop)))
    base = outs[0]
    nbad = 0
    for i, o in enumerate(outs[1:], 1):
        if not np.array_equal(base, o):
            d = np.nonzero((base != o).any(axis=1))[0]
            nbad += 1
            print(f"[A2 sync={sync}] run {i} differs in {len(d)} rows; "
                  f"first {d[:5]}")
    print(f"[A2 sync={sync}] {n} fresh-upload runs, {nbad} differ")


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


def probe_d(n=4):
    """Seeder determinism: same 16k-read chunk through run_flat n times."""
    import bench
    from compseed_tpu.options import MemOptions
    from compseed_tpu.ops.engine import device_seeder
    from compseed_tpu.pipeline.align import encode_read
    from compseed_tpu.utils import NT4_TO_ASCII
    fm, reads_arr = bench._setup()
    opt = MemOptions()
    seeder = device_seeder(opt, fm, dedup=True)
    queries = [encode_read(bytes(NT4_TO_ASCII[reads_arr[i]]).decode())
               for i in range(16384)]
    base = None
    for rep in range(n):
        lrep, sflat, soff = seeder.run_flat(queries, None)
        if base is None:
            base = (lrep.copy(), sflat.copy(), soff.copy())
            continue
        for name, got, want in (("lrep", lrep, base[0]),
                                ("sflat", sflat, base[1]),
                                ("soff", soff, base[2])):
            if got.shape != want.shape or not np.array_equal(got, want):
                print(f"[D] rep {rep} {name} DIFFERS "
                      f"(shape {got.shape} vs {want.shape})")
                if got.shape == want.shape:
                    d = np.nonzero(np.atleast_2d(
                        (got != want)).reshape(len(got), -1).any(axis=1))[0]
                    print("   first diffs", d[:8])
    print(f"[D] {n} seeder runs compared")


def probe_c2():
    """Probe C with a runner that only RETAINS the host input buffers
    (no other behavior change).  If C flakes and C2 doesn't, the axon
    H2D transfer reads the host buffer after Python frees it."""
    import bench
    from compseed_tpu.options import MemOptions
    from compseed_tpu.ops.engine import device_seeder
    from compseed_tpu.ops.bsw import BswRunner
    from compseed_tpu.pipeline.align import align_chunk
    from compseed_tpu.native import NativeTail
    from compseed_tpu.utils import NT4_TO_ASCII

    keep = []

    class RetainingRunner(BswRunner):
        def _run_pallas(self, qbuf, qoff, rbuf, roff, h0, w, pen_clip):
            keep.append((qbuf.copy(), qoff.copy(), rbuf.copy(),
                         roff.copy(), h0.copy()))
            return super()._run_pallas(qbuf, qoff, rbuf, roff, h0, w,
                                       pen_clip)

    fm, reads_arr = bench._setup()
    opt = MemOptions()
    seeder = device_seeder(opt, fm, dedup=True)
    tail = NativeTail(opt, fm)
    eng = RetainingRunner(opt, np.array(opt.mat), use_pallas=True, dfi=None)
    sams = []
    from compseed_tpu.io.fastq import Read
    for rep in range(2):
        reads = [Read(name=str(i),
                      seq=bytes(NT4_TO_ASCII[reads_arr[i]]).decode(),
                      qual=None, comment=None) for i in range(16384)]
        align_chunk(opt, fm, reads, 0, engine=eng, seeder=seeder, tail=tail)
        bad = [r.name for r in reads if any(ord(c) > 127 for c in r.sam)]
        print(f"[C2] rep {rep}: {len(bad)} corrupt: {bad[:8]}")
        sams.append([r.sam for r in reads])
    diff = [i for i, (a, b) in enumerate(zip(*sams)) if a != b]
    print(f"[C2] rep0 vs rep1: {len(diff)} SAMs differ; first {diff[:8]}")


def probe_c(use_pallas=True):
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
    eng = BswRunner(opt, np.array(opt.mat), use_pallas=use_pallas, dfi=None)
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
    backend = jax.default_backend()
    with open(f"/tmp/sams_{backend}.txt", "w") as f:
        f.writelines(sams[0])
    print(f"[C] rep0 SAMs written to /tmp/sams_{backend}.txt")


if __name__ == "__main__":
    sel = sys.argv[1:] or ["A", "B"]
    if "cpu" in sel:
        jax.config.update("jax_platforms", "cpu")
    if "A" in sel:
        probe_a()
    if "A2" in sel:
        probe_a2(sync=False)
        probe_a2(sync=True)
    if "B" in sel:
        probe_b()
    if "C" in sel:
        probe_c(use_pallas="cpu" not in sel)
    if "D" in sel:
        probe_d()
