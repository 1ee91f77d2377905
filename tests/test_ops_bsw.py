"""Device banded-SW vs the ksw_extend2 oracle, including pipeline parity."""

import numpy as np
import pytest

from compseed_tpu.cpu import ksw
from compseed_tpu.options import MemOptions, fill_scmat
from compseed_tpu.ops.bsw import BswRunner
from compseed_tpu.pipeline.extension import SeqPair


def _random_pairs(rng, n, qmax=100, tmax=200):
    pairs = []
    for _ in range(n):
        tl = int(rng.integers(1, tmax))
        t = rng.integers(0, 4, size=tl).astype(np.uint8)
        ql = int(rng.integers(1, min(qmax, tl + 30)))
        # query = mutated prefix of target (extension-like workload),
        # possibly longer than the target
        q = np.concatenate([t[:ql],
                            rng.integers(0, 4, size=max(ql - tl, 0))
                            .astype(np.uint8)])[:ql].copy()
        for _ in range(int(rng.integers(0, ql // 8 + 1))):
            q[int(rng.integers(0, ql))] = int(rng.integers(0, 4))
        if rng.random() < 0.1:
            q[int(rng.integers(0, ql))] = 4  # ambiguous base
        h0 = int(rng.integers(1, 120))
        pairs.append(SeqPair(qs=q, rs=t, h0=h0, seqid=0, regid=0))
    # degenerate shapes
    pairs.append(SeqPair(qs=np.zeros(1, np.uint8), rs=np.zeros(0, np.uint8),
                         h0=19, seqid=0, regid=0))
    pairs.append(SeqPair(qs=np.zeros(1, np.uint8),
                         rs=np.zeros(300, np.uint8), h0=5, seqid=0, regid=0))
    return pairs


@pytest.mark.parametrize("w,pen_clip", [(100, 5), (200, 5), (10, 0)])
def test_bsw_vs_oracle(w, pen_clip):
    opt = MemOptions()
    mat = np.array(fill_scmat(1, 4))
    rng = np.random.default_rng(31 + w)
    pairs = _random_pairs(rng, 60)
    runner = BswRunner(opt, mat)
    got = runner(pairs, w, pen_clip)
    for i, sp in enumerate(pairs):
        want = ksw.extend(len(sp.qs), sp.qs, len(sp.rs), sp.rs, mat,
                          opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                          w, pen_clip, opt.zdrop, sp.h0)
        assert got[i] == tuple(want), (i, got[i], tuple(want))


def test_bsw_zdrop_path():
    """Pairs engineered to trigger z-drop / early break."""
    opt = MemOptions()
    mat = np.array(fill_scmat(1, 4))
    rng = np.random.default_rng(77)
    pairs = []
    for _ in range(20):
        t = rng.integers(0, 4, size=180).astype(np.uint8)
        q = np.concatenate([t[:30],
                            rng.integers(0, 4, size=60).astype(np.uint8)])
        pairs.append(SeqPair(qs=q.astype(np.uint8), rs=t, h0=25,
                             seqid=0, regid=0))
    runner = BswRunner(opt, mat)
    got = runner(pairs, 100, 5)
    for i, sp in enumerate(pairs):
        want = ksw.extend(len(sp.qs), sp.qs, len(sp.rs), sp.rs, mat,
                          opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                          100, 5, opt.zdrop, sp.h0)
        assert got[i] == tuple(want), i


def test_pipeline_parity_device_engine(tiny_fm):
    """Device DP engine must give byte-identical SAM to the oracle engine."""
    import os
    from compseed_tpu.io.fastq import read_fastq_chunks
    from compseed_tpu.pipeline.align import align_chunk
    from compseed_tpu.ops.engine import device_engine
    from tests.conftest import FIXTURES

    opt = MemOptions()
    reads = []
    for chunk in read_fastq_chunks(os.path.join(FIXTURES, "reads.fq"),
                                   10_000_000):
        reads.extend(chunk)
    reads = reads[:120]
    align_chunk(opt, tiny_fm, reads, 0, engine=device_engine(opt))
    mine = "".join(r.sam for r in reads).splitlines(keepends=True)
    golden = [l for l in
              open(os.path.join(FIXTURES, "golden_bwamem.sam"))
              if not l.startswith("@")]
    for i, (m, g) in enumerate(zip(mine, golden)):
        assert m == g, f"record {i}:\n{m}\n{g}"


def test_bsw_pallas_kernel_vs_xla():
    """The Pallas TPU kernel (interpret mode on CPU) must be bit-identical
    to the verified XLA program across random extension workloads."""
    import jax.numpy as jnp
    from compseed_tpu.ops.bsw import bsw_extend
    from compseed_tpu.ops.bsw_pallas import LT, bsw_extend_tiles, clamp_band

    opt = MemOptions()
    mat = np.array(fill_scmat(1, 4), dtype=np.int32)
    rng = np.random.default_rng(9)
    P, Q, T = LT, 128, 256
    qlens = rng.integers(0, 102, P).astype(np.int32)
    tlens = rng.integers(0, 221, P).astype(np.int32)
    queries = np.full((P, Q), 4, np.uint8)
    targets = np.full((P, T), 4, np.uint8)
    for i in range(P):
        queries[i, :qlens[i]] = rng.integers(0, 4, qlens[i])
        tl = int(tlens[i])
        if tl and qlens[i]:
            src = np.resize(queries[i, :qlens[i]], tl).copy()
            err = rng.random(tl) < 0.08
            src[err] = rng.integers(0, 4, err.sum())
            targets[i, :tl] = src
    queries[rng.random((P, Q)) < 0.01] = 4
    h0 = rng.integers(1, 102, P).astype(np.int32)
    w = opt.w
    ref = np.asarray(bsw_extend(
        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.zdrop,
        opt.pen_clip5, 1, jnp.asarray(mat.reshape(5, 5)), jnp.int32(w),
        jnp.asarray(queries), jnp.asarray(qlens),
        jnp.asarray(targets), jnp.asarray(tlens), jnp.asarray(h0)))
    ws = clamp_band(qlens, w, 1, opt.pen_clip5, opt.o_del, opt.e_del,
                    opt.o_ins, opt.e_ins)
    out = np.asarray(bsw_extend_tiles(
        jnp.asarray(mat.reshape(1, 25)),
        jnp.asarray(queries.astype(np.int8)), jnp.asarray(qlens[:, None]),
        jnp.asarray(targets.astype(np.int8)), jnp.asarray(tlens[:, None]),
        jnp.asarray(h0[:, None]), jnp.asarray(ws[:, None]),
        o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins,
        zdrop=opt.zdrop, interpret=True))
    for j in range(6):
        assert np.array_equal(ref[j], out[:, j]), j
