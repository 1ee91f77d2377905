"""Benchmark: end-to-end alignment throughput on one TPU chip.

Metric: reads/s/chip for the full pipeline (seeding + merged SAL +
chaining + banded-SW extension + SAM emission) on an E.coli-scale genome
with compressor-reordered simulated reads — the BASELINE.json headline.

vs_baseline compares against the reference CompSeed's published E.coli
throughput (BASELINE.md Table 1: 588 Mbases / 95 s align on SPRING
reordering with 16 CPU threads ~= 61,300 reads/s of 101 bp).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")
GENOME_LEN = 2_000_000
N_READS = 32768
READ_LEN = 101
BASELINE_READS_PER_S = 61_300.0
USE_NATIVE_TAIL = True


def _setup():
    from compseed_tpu.index.build import build_index
    from compseed_tpu.index.fmindex import FMIndex
    from compseed_tpu.index.io import save_index
    from compseed_tpu.utils import NT4_TO_ASCII

    os.makedirs(CACHE, exist_ok=True)
    # sa_intv=8: 4x denser SA sampling than the bwa default caps the
    # inverse-Psi walk at 7 steps (TPU-first trade: HBM for walk depth)
    prefix = os.path.join(CACHE, f"bench_{GENOME_LEN}_sa8")
    fa = prefix + ".fa"
    if not os.path.exists(prefix + ".bwt"):
        rng = np.random.default_rng(2024)
        seq = rng.integers(0, 4, size=GENOME_LEN).astype(np.uint8)
        with open(fa, "w") as f:
            f.write(">bench_chr\n")
            s = bytes(NT4_TO_ASCII[seq]).decode()
            for i in range(0, len(s), 80):
                f.write(s[i: i + 80] + "\n")
        save_index(prefix, build_index(fa, sa_intv=8))
    fm = FMIndex.load(prefix)

    reads_path = os.path.join(CACHE, f"reads_{N_READS}.npy")
    if os.path.exists(reads_path):
        reads = np.load(reads_path)
    else:
        rng = np.random.default_rng(7)
        from compseed_tpu.index.fmindex import unpack_pac_range
        genome = unpack_pac_range(fm.pac, 0, fm.l_pac)
        reads = np.empty((N_READS, READ_LEN), dtype=np.uint8)
        for i in range(N_READS):
            pos = int(rng.integers(0, len(genome) - READ_LEN))
            r = genome[pos: pos + READ_LEN].copy()
            if rng.random() < 0.5:
                r = (3 - r)[::-1]
            err = rng.random(READ_LEN) < 0.01
            r[err] = rng.integers(0, 4, size=err.sum())
            reads[i] = r
        # compressor reordering: lexicographic sort clusters similar reads
        order = np.lexsort(reads.T[::-1])
        reads = reads[order]
        np.save(reads_path, reads)
    return fm, reads


def main() -> None:
    from compseed_tpu.io.fastq import Read
    from compseed_tpu.options import MemOptions
    from compseed_tpu.ops.engine import device_engine, device_seeder
    from compseed_tpu.pipeline.align import align_chunk
    from compseed_tpu.utils import NT4_TO_ASCII

    fm, reads_arr = _setup()
    opt = MemOptions()
    seeder = device_seeder(opt, fm, dedup=True)
    engine = device_engine(opt, fm, dfi=seeder.dfi)
    tail = None
    if USE_NATIVE_TAIL:
        from compseed_tpu.native import NativeTail
        tail = NativeTail(opt, fm)

    def mk_reads(arr, start):
        return [Read(name=str(start + i), seq=bytes(
            NT4_TO_ASCII[arr[i]]).decode(), qual=None, comment=None)
            for i in range(len(arr))]

    # warmup (compiles); cover BOTH timed chunks' shape buckets
    CHUNK = 16384
    for s0 in (0, CHUNK):
        warm = mk_reads(reads_arr[s0: s0 + CHUNK], s0)
        align_chunk(opt, fm, warm, s0, engine=engine, seeder=seeder,
                    tail=tail)

    # timed: stream 2 chunks through the overlapped pipeline (device
    # seeds chunk k+1 while the host tail finishes chunk k), which is
    # how production runs consume a -K chunked input
    from compseed_tpu.pipeline.align import align_stream
    n_timed = 2 * CHUNK
    chunks = [mk_reads(reads_arr[:CHUNK], 0),
              mk_reads(reads_arr[CHUNK: 2 * CHUNK], CHUNK)]
    done = []
    t0 = time.time()
    align_stream(opt, fm, iter(chunks), engine, seeder, tail,
                 on_done=done.extend)
    dt = time.time() - t0
    assert len(done) == n_timed and all(r.sam for r in done)

    value = n_timed / dt
    print(json.dumps({
        "metric": "reads_per_s_per_chip_e2e",
        "value": round(value, 2),
        "unit": "reads/s",
        "vs_baseline": round(value / BASELINE_READS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
