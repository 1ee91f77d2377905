"""Diff every Pallas BSW call against the XLA twin on the same inputs
while running the full bench chunk through the native tail on TPU.
Mismatching tile rows (inputs + both outputs) are saved to
/tmp/bsw_mismatch.npz for offline oracle adjudication."""
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
from compseed_tpu.ops import bsw as bsw_mod
from compseed_tpu.ops.bsw import BswRunner, bsw_extend, _bucket
from compseed_tpu.utils import NT4_TO_ASCII

CHUNK = 16384
CAPTURED = dict(n=0)


class CheckingRunner(BswRunner):
    def _run_pallas(self, qbuf, qoff, rbuf, roff, h0, w, pen_clip):
        from compseed_tpu.ops.bsw_pallas import (LT, bsw_extend_tiles,
                                                 clamp_band)
        opt = self.opt
        n = len(h0)
        qlens = (qoff[1:] - qoff[:-1]).astype(np.int32)
        tlens = (roff[1:] - roff[:-1]).astype(np.int32)
        Qall = _bucket(int(qlens.max(initial=1)), 128)
        Tall = _bucket(int(tlens.max(initial=1)), 128)
        q_all, _ = bsw_mod._pack_rows(qbuf, qoff, n, Qall)
        t_all, _ = bsw_mod._pack_rows(rbuf, roff, n, Tall)
        res = np.zeros((n, 6), np.int32)
        for Q, cls in bsw_mod._q_classes(qlens):
            m = len(cls)
            order = cls[np.argsort(tlens[cls], kind="stable")]
            P = _bucket(m, LT)
            T = _bucket(int(tlens[order].max(initial=1)), 128)
            queries = np.full((P, Q), 4, np.int8)
            targets = np.full((P, T), 4, np.int8)
            queries[:m] = q_all[order, :Q].astype(np.int8)
            targets[:m] = t_all[order, :T].astype(np.int8)
            qlp = np.zeros((P, 1), np.int32)
            qlp[:m, 0] = qlens[order]
            tlp = np.zeros((P, 1), np.int32)
            tlp[:m, 0] = tlens[order]
            h0p = np.ones((P, 1), np.int32)
            h0p[:m, 0] = h0[order]
            ws = np.full((P, 1), w, np.int32)
            ws[:m, 0] = clamp_band(qlens[order], w, self.max_sc, pen_clip,
                                   opt.o_del, opt.e_del, opt.o_ins,
                                   opt.e_ins)
            out = np.asarray(bsw_extend_tiles(
                self.mat25, jnp.asarray(queries), jnp.asarray(qlp),
                jnp.asarray(targets), jnp.asarray(tlp), jnp.asarray(h0p),
                jnp.asarray(ws), o_del=opt.o_del, e_del=opt.e_del,
                o_ins=opt.o_ins, e_ins=opt.e_ins, zdrop=opt.zdrop,
                interpret=False, state16=False))[:, :6]
            ref = np.asarray(bsw_extend(
                opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.zdrop,
                pen_clip, self.max_sc, self.mat, jnp.int32(w),
                jnp.asarray(queries.astype(np.uint8)),
                jnp.asarray(qlp[:, 0]),
                jnp.asarray(targets.astype(np.uint8)),
                jnp.asarray(tlp[:, 0]), jnp.asarray(h0p[:, 0]))).T
            bad = np.nonzero(
                (out[:m] != ref[:m].astype(np.int32)).any(axis=1))[0]
            if len(bad):
                k = CAPTURED["n"]
                np.savez(f"/tmp/bsw_mismatch_{k}.npz",
                         queries=queries[bad], targets=targets[bad],
                         qlens=qlp[bad, 0], tlens=tlp[bad, 0],
                         h0=h0p[bad, 0], ws=ws[bad, 0], w=w,
                         pen_clip=pen_clip, out_pallas=out[bad],
                         out_xla=ref[bad])
                CAPTURED["n"] += 1
                print(f"MISMATCH call Q={Q} T={T} P={P} m={m}: "
                      f"{len(bad)} rows (saved _{k})")
                for b in bad[:3]:
                    print("  row", b, "ql", qlp[b, 0], "tl", tlp[b, 0],
                          "h0", h0p[b, 0], "w", ws[b, 0])
                    print("   pallas", out[b], " xla", ref[b])
            res[order] = out[:m]
        return tuple(res[:, j] for j in range(6))


def main() -> None:
    fm, reads_arr = bench._setup()
    opt = MemOptions()
    seeder = device_seeder(opt, fm, dedup=True)
    reads = [Read(name=str(i), seq=bytes(NT4_TO_ASCII[reads_arr[i]]).decode(),
                  qual=None, comment=None) for i in range(CHUNK)]
    from compseed_tpu.native import NativeTail
    from compseed_tpu.pipeline.align import align_chunk
    tail = NativeTail(opt, fm)
    eng = CheckingRunner(opt, np.array(opt.mat), use_pallas=True, dfi=None)
    align_chunk(opt, fm, reads, 0, engine=eng, seeder=seeder, tail=tail)
    print("done;", CAPTURED["n"], "mismatching calls captured")


if __name__ == "__main__":
    main()
