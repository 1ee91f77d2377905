"""Paired-end pipeline vs the BWA-MEM 0.7.17 PE golden.

Exercises insert-size inference (mem_pestat), mate rescue (mem_matesw via
the exact ksw_align2 contract), pair scoring (mem_pair) and PE SAM
emission (mem_sam_pe) in the native tail — byte-identical output.
"""

import os

import pytest

from compseed_tpu.options import MemOptions, MEM_F_PE
from compseed_tpu.io.fastq import read_fastq_pair_chunks
from compseed_tpu.pipeline.align import align_chunk

from tests.conftest import FIXTURES


@pytest.mark.slow
def test_pe_golden_parity(tiny_fm):
    from compseed_tpu.native import NativeTail

    opt = MemOptions()
    opt.flag |= MEM_F_PE
    reads = []
    for chunk in read_fastq_pair_chunks(
            os.path.join(FIXTURES, "reads_1.fq"),
            os.path.join(FIXTURES, "reads_2.fq"), 10_000_000):
        reads.extend(chunk)
    tail = NativeTail(opt, tiny_fm)
    align_chunk(opt, tiny_fm, reads, 0, tail=tail)
    mine = "".join(r.sam for r in reads).splitlines(keepends=True)
    golden = [l for l in
              open(os.path.join(FIXTURES, "golden_bwamem_pe.sam"))
              if not l.startswith("@")]
    assert len(mine) == len(golden)
    for i, (m, g) in enumerate(zip(mine, golden)):
        assert m == g, f"record {i}:\n{m}\n{g}"


def test_pe_insert_override(tiny_fm):
    """-I style pes override path produces records for every read."""
    from compseed_tpu.native import NativeTail

    opt = MemOptions()
    opt.flag |= MEM_F_PE
    reads = []
    for chunk in read_fastq_pair_chunks(
            os.path.join(FIXTURES, "reads_1.fq"),
            os.path.join(FIXTURES, "reads_2.fq"), 10_000_000):
        reads.extend(chunk)
    reads = reads[:64]
    tail = NativeTail(opt, tiny_fm)
    pes = []
    for d in range(4):
        if d == 1:
            pes += [0.0, 200.0, 500.0, 350.0, 35.0]
        else:
            pes += [1.0, 0.0, 0.0, 0.0, 0.0]
    align_chunk(opt, tiny_fm, reads, 0, tail=tail, pes_override=pes)
    assert all(r.sam for r in reads)
    flags = [int(r.sam.split("\t")[1]) for r in reads]
    assert all(f & 0x1 for f in flags)          # all paired
    assert any(f & 0x2 for f in flags)          # some proper pairs
