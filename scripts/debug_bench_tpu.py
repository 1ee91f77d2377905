"""Stage-by-stage TPU localization of the checkin SAM corruption.

Stage 1: run the device seeder on TPU, diff (lrep, sflat, soff) against
the CPU capture (/tmp/seeds_cpu.npz from debug_bench_cpu.py).
Stage 2: run the native tail with the XLA (non-Pallas) engine on TPU
and scan for non-ASCII SAM.
Stage 3: run with the Pallas engine but the meta path disabled.
Stage 4: full bench configuration (Pallas + meta).
Pass stage numbers as argv (default: 1)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np

import bench
from compseed_tpu.io.fastq import Read
from compseed_tpu.options import MemOptions
from compseed_tpu.ops.engine import device_seeder
from compseed_tpu.ops.bsw import BswRunner
from compseed_tpu.pipeline.align import align_chunk, encode_read
from compseed_tpu.utils import NT4_TO_ASCII

CHUNK = 16384


def scan_sams(reads, label):
    bad = []
    for r in reads:
        try:
            r.sam.encode("ascii")
        except UnicodeEncodeError:
            bad.append(r.name)
    print(f"[{label}] {len(reads)} SAMs, {len(bad)} corrupt"
          + (f"; first bad reads: {bad[:5]}" if bad else ""))
    return bad


def main() -> None:
    stages = [int(a) for a in sys.argv[1:]] or [1]
    fm, reads_arr = bench._setup()
    opt = MemOptions()
    seeder = device_seeder(opt, fm, dedup=True)
    queries = [encode_read(bytes(NT4_TO_ASCII[reads_arr[i]]).decode())
               for i in range(CHUNK)]
    reads = [Read(name=str(i), seq=bytes(NT4_TO_ASCII[reads_arr[i]]).decode(),
                  qual=None, comment=None) for i in range(CHUNK)]

    if 1 in stages:
        lrep, sflat, soff = seeder.run_flat(queries, None)
        ref = np.load("/tmp/seeds_cpu.npz")
        for name, got in (("lrep", lrep), ("sflat", sflat), ("soff", soff)):
            want = ref[name]
            eq = got.shape == want.shape and np.array_equal(got, want)
            print(f"[stage1] {name}: shape {got.shape} "
                  f"{'== CPU' if eq else '!= CPU  <-- MISMATCH'}")
            if not eq and got.shape == want.shape:
                d = np.nonzero(~np.all(np.atleast_2d(got == want), axis=-1))
                print("   first diffs at", d[0][:10])

    from compseed_tpu.native import NativeTail
    tail = NativeTail(opt, fm)

    def run_tail(engine, label):
        for r in reads:
            r.sam = None
        align_chunk(opt, fm, reads, 0, engine=engine, seeder=seeder,
                    tail=tail)
        return scan_sams(reads, label)

    if 2 in stages:
        eng = BswRunner(opt, np.array(opt.mat), use_pallas=False,
                        dfi=seeder.dfi)
        run_tail(eng, "stage2 XLA engine")
    if 3 in stages:
        eng = BswRunner(opt, np.array(opt.mat), use_pallas=True,
                        dfi=None)   # dfi None => supports_meta False
        run_tail(eng, "stage3 Pallas non-meta")
    if 4 in stages:
        eng = BswRunner(opt, np.array(opt.mat), use_pallas=True,
                        dfi=seeder.dfi)
        run_tail(eng, "stage4 Pallas + meta (bench config)")


if __name__ == "__main__":
    main()
