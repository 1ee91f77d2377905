"""Decisive flake localization: run the full chunk N reps with the
PLAIN runner path, capturing raw copies of (a) seeder outputs and
(b) every BSW call's inputs/outputs via cheap np copies (no hashing,
minimal timing perturbation).  Compare artifacts across reps afterwards
and report the FIRST divergent artifact per rep."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax.numpy as jnp

import bench
from compseed_tpu.io.fastq import Read
from compseed_tpu.options import MemOptions
from compseed_tpu.ops.engine import device_seeder
from compseed_tpu.ops.bsw import BswRunner
from compseed_tpu.utils import NT4_TO_ASCII

CHUNK = 16384
N_REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


class CapturingRunner(BswRunner):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.log = []

    def run_flat(self, qbuf, qoff, rbuf, roff, h0, w, pen_clip):
        out = super().run_flat(qbuf, qoff, rbuf, roff, h0, w, pen_clip)
        self.log.append((qbuf.copy(), qoff.copy(), rbuf.copy(),
                         roff.copy(), h0.copy(), int(w),
                         np.stack(out).copy()))
        return out


def main() -> None:
    fm, reads_arr = bench._setup()
    opt = MemOptions()
    seeder = device_seeder(opt, fm, dedup=True)
    from compseed_tpu.native import NativeTail
    from compseed_tpu.pipeline.align import align_chunk
    tail = NativeTail(opt, fm)
    eng = CapturingRunner(opt, np.array(opt.mat), use_pallas=True, dfi=None)

    seed_caps, bsw_caps, sam_caps = [], [], []
    orig_run_flat = seeder.run_flat

    def capturing_seed_run(queries, stats=None):
        res = orig_run_flat(queries, stats)
        seed_caps[-1].append(tuple(np.array(x, copy=True) for x in res))
        return res

    seeder.run_flat = capturing_seed_run

    for rep in range(N_REPS):
        seed_caps.append([])
        eng.log = []
        reads = [Read(name=str(i),
                      seq=bytes(NT4_TO_ASCII[reads_arr[i]]).decode(),
                      qual=None, comment=None) for i in range(CHUNK)]
        align_chunk(opt, fm, reads, 0, engine=eng, seeder=seeder, tail=tail)
        bsw_caps.append(eng.log)
        sam_caps.append([r.sam for r in reads])
        bad = sum(any(ord(c) > 127 for c in s) for s in sam_caps[-1])
        print(f"rep {rep}: {len(eng.log)} bsw calls, {bad} corrupt SAMs")

    base_seeds, base_bsw, base_sams = seed_caps[0], bsw_caps[0], sam_caps[0]
    for rep in range(1, N_REPS):
        first = None
        for si, (a, b) in enumerate(zip(seed_caps[rep], base_seeds)):
            for k, (x, y) in enumerate(zip(a, b)):
                if x.shape != y.shape or not np.array_equal(x, y):
                    first = f"seeder call {si} artifact {k}"
                    break
            if first:
                break
        if first is None:
            for ci, (a, b) in enumerate(zip(bsw_caps[rep], base_bsw)):
                for k in range(5):
                    if a[k].shape != b[k].shape or \
                            not np.array_equal(a[k], b[k]):
                        first = f"bsw call {ci} INPUT {k} (cascade?)"
                        break
                if first:
                    break
                if not np.array_equal(a[6], b[6]):
                    d = np.nonzero((a[6] != b[6]).any(axis=0))[0]
                    first = (f"bsw call {ci} OUTPUT, {len(d)} pairs, "
                             f"first {d[:6].tolist()}")
                    np.savez(f"/tmp/flake_rep{rep}_call{ci}.npz",
                             qbuf=a[0], qoff=a[1], rbuf=a[2], roff=a[3],
                             h0=a[4], w=a[5], out_rep=a[6], out_base=b[6])
                    break
        nsam = sum(1 for x, y in zip(sam_caps[rep], base_sams) if x != y)
        print(f"rep {rep} vs rep 0: first divergent artifact: "
              f"{first or 'NONE'}; {nsam} SAMs differ")


if __name__ == "__main__":
    main()
