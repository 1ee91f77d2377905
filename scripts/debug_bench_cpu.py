"""Reproduce the bench align_chunk path on CPU to localize the TPU-only
SAM corruption seen at the round-2 checkin (UnicodeDecodeError in
run_batch_flat).  Runs the exact bench configuration — 16384-read chunk,
device seeder with dedup, device engine, native tail — but forces the
CPU backend, then validates every SAM byte is ASCII."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from compseed_tpu.io.fastq import Read  # noqa: E402
from compseed_tpu.options import MemOptions  # noqa: E402
from compseed_tpu.ops.engine import device_engine, device_seeder  # noqa: E402
from compseed_tpu.pipeline.align import align_chunk  # noqa: E402
from compseed_tpu.utils import NT4_TO_ASCII  # noqa: E402


def main() -> None:
    fm, reads_arr = bench._setup()
    opt = MemOptions()
    seeder = device_seeder(opt, fm, dedup=True)
    engine = device_engine(opt, fm, dfi=seeder.dfi)
    from compseed_tpu.native import NativeTail
    tail = NativeTail(opt, fm)

    CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    s0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    reads = [Read(name=str(s0 + i),
                  seq=bytes(NT4_TO_ASCII[reads_arr[s0 + i]]).decode(),
                  qual=None, comment=None) for i in range(CHUNK)]
    align_chunk(opt, fm, reads, s0, engine=engine, seeder=seeder, tail=tail)
    bad = 0
    for r in reads:
        try:
            r.sam.encode("ascii")
        except UnicodeEncodeError:
            bad += 1
            print("NON-ASCII SAM for read", r.name)
    print(f"chunk={CHUNK} start={s0}: {len(reads)} SAMs, {bad} corrupt")
    # persist the seed tensors for TPU-vs-CPU diffing
    lrep, sflat, soff = seeder.run_flat(
        [bench_encode(r.seq) for r in reads], None)
    np.savez("/tmp/seeds_cpu.npz", lrep=lrep, sflat=sflat, soff=soff)
    print("seed tensors saved: sflat", sflat.shape, "soff[-1]", soff[-1])


def bench_encode(seq):
    from compseed_tpu.pipeline.align import encode_read
    return encode_read(seq)


if __name__ == "__main__":
    main()
