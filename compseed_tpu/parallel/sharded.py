"""Multi-chip data parallelism for the PRODUCTION pipeline.

The reference's parallel runtime is kt_for over 512-read tiles with one
private SST pair per thread (cstl/kthread.c:51-63, comp_seed.cpp:2541-2548).
The TPU-native equivalent here: each -K chunk is split into contiguous
per-device read sub-batches, and the COMPLETE device seeding program
(seeder2 rounds 1-3, match merge, compressive dedup, merged SAL) runs
under ``jax.shard_map`` over a 1-D ``data`` mesh — the FM-index is
replicated (read-only, like the shm-shared index of bwashm.c), reads and
all intermediates are sharded, and the cross-read compressive sort/unique
stages stay *within* each shard exactly as each reference thread's SST
only spans its own tile.  The banded-SW DP rounds shard the pair batch
the same way.

Determinism: every per-read result is independent of the sharding (the
compressive dedup only skips duplicate work, never changes results — the
reference's own invariant, README.md:74-76), and the host tail consumes
the re-assembled per-read flats in original read order, so the SAM is
byte-identical across mesh shapes {1, 2, 4, 8, ...}; tests/test_parallel.py
asserts this.  This is the `-K`-order merge contract of kt_pipeline
(cstl/kthread.c:95-105) carried to a device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from compseed_tpu.ops import bsw as bsw_mod
from compseed_tpu.ops.bsw import BswRunner, _bucket, _pack_rows
from compseed_tpu.ops.seeder2 import (DeviceSeeder, _round_up,
                                      result_dims, seed_bucket,
                                      unpack_results)
from compseed_tpu.parallel.mesh import make_mesh


class ShardedSeeder(DeviceSeeder):
    """run_flat-compatible seeder running the full device seeding program
    data-parallel over a mesh."""

    def __init__(self, opt, fm, mesh: Mesh | None = None, dfi=None,
                 dedup: bool = False):
        super().__init__(opt, fm, dfi=dfi, dedup=dedup)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.S = int(self.mesh.devices.size)
        self._sharded: dict = {}

    def _build_sharded(self, R_shard: int, L: int):
        key = (R_shard, L)
        if key in self._sharded:
            return self._sharded[key]
        fns = self._build(R_shard, L)
        step = jax.jit(jax.shard_map(
            fns["whole"], mesh=self.mesh,
            in_specs=(P(), P("data", None), P("data")),
            out_specs=(P("data"), P("data")),
            check_vma=False))
        self._sharded[key] = step
        return step

    def run_flat(self, queries, stats=None):
        import time
        n_reads = len(queries)
        S = self.S
        per = -(-n_reads // S)               # reads per shard (ceil)
        R_shard = _bucket(max(per, 1), 256)
        lens = np.fromiter((len(q) for q in queries), np.int64,
                           count=n_reads)
        maxlen = int(lens.max(initial=1))
        L = _round_up(maxlen + 1, 32)
        qarr = np.full((S * R_shard, L), 4, dtype=np.uint8)
        rlens = np.zeros(S * R_shard, dtype=np.int32)
        idx = np.arange(n_reads)
        row_map = (idx // per) * R_shard + (idx - (idx // per) * per)
        row_map = row_map.astype(np.int64) if n_reads else \
            np.zeros(1, np.int64)
        rlens[row_map[:n_reads]] = lens
        flat = np.concatenate(queries) if n_reads else \
            np.zeros(0, np.uint8)
        rows = np.repeat(row_map[:n_reads], lens)
        cols = np.arange(len(flat)) - np.repeat(
            np.cumsum(lens) - lens, lens)
        qarr[rows, cols] = flat
        step = self._build_sharded(R_shard, L)
        t0 = time.time()
        qd = jnp.asarray(qarr)
        rd = jnp.asarray(rlens)
        self.last_qd = qd
        self.last_L = L
        self.last_row_map = row_map
        head_all, seed_all = step(self.dfi, qd, rd)
        fns = self._jits[(R_shard, L)]
        _, _, _, MEMCAP, SEEDCAP, _ = fns["sizes"]
        HL, ROWS = result_dims(R_shard, fns["packed"])
        # fetch the stacked heads first; the per-shard stotal counters
        # bound the seed-matrix columns the second fetch must ship
        head = np.asarray(jax.device_get(head_all)).reshape(S, HL)
        clean = ~head[:, 3:14].any(axis=1)
        if clean.any():
            K = seed_bucket(int(head[clean, 1].max(initial=0)), SEEDCAP)
            seed_all = seed_all.reshape(S, ROWS, SEEDCAP)
            seedpk = np.asarray(jax.device_get(seed_all[:, :, :K]))
        else:   # every shard overflowed: all reads rerun on the
            seedpk = np.zeros((S, ROWS, 0), np.int32)  # legacy path
        self.prof["device_s"] = time.time() - t0
        self.prof["d2h_bytes"] = head.nbytes + seedpk.nbytes

        self.last_overflow = False
        lsegs, ssegs = [], []      # one lrep/(sflat, soff) per shard
        for s in range(S):
            lo = s * per
            hi = min(lo + per, n_reads)
            n_local = hi - lo
            if n_local <= 0:
                break
            res = unpack_results(head[s], seedpk[s], R_shard, n_local,
                                 packed=fns["packed"])
            sub = queries[lo:hi]
            if res["oflags"].any():
                # shard-level cap overflow: recompute just this shard's
                # reads with the legacy exact seeder
                self.last_overflow = True
                self.prof["overflow_flags"] = res["oflags"].tolist()
                self._note_fwd_overflow(res["oflags"])
                from compseed_tpu.ops.smem import BatchSeeder
                legacy = BatchSeeder(self.opt, self.fm, self.dfi)
                lrep, sflat, soff = legacy.run_flat(sub, stats)
            else:
                lrep, sflat, soff = (res["lrep"], res["sflat"],
                                     res["soff"])
                bad_reads = np.nonzero(res["bad"])[0]
                if len(bad_reads):
                    lrep, sflat, soff = self._splice_oracle(
                        sub, bad_reads, lrep, sflat, soff)
                if stats is not None:
                    from compseed_tpu.ops.seeder2 import _accumulate_stats
                    _accumulate_stats(stats, res)
            lsegs.append(lrep)
            ssegs.append((sflat, soff))
        if self.last_overflow:
            self.last_qd = None    # meta engines must not reuse stale qd

        # deterministic re-assembly in original read order (shards are
        # contiguous read ranges, so concatenation restores -K order)
        lrep = np.concatenate(lsegs) if lsegs else np.zeros(0, np.int64)
        sflat = np.concatenate([x for x, _ in ssegs]) if ssegs else \
            np.zeros((0, 3), np.int64)
        soff = np.zeros(n_reads + 1, np.int64)
        pos = 0
        sbase = 0
        for x, so in ssegs:
            k = len(so) - 1
            soff[pos + 1: pos + k + 1] = sbase + so[1:]
            sbase += so[-1]
            pos += k
        return lrep, sflat, soff


class ShardedBswRunner(BswRunner):
    """Banded-SW engine sharding the pair batch over the mesh: one
    shard_map'd DP program per (P, Q, T) bucket, each device scanning its
    own pairs with its own early-exit trip count (the per-lane-class
    batching of mem_chain2aln_across_reads_V2, comp_seed.cpp:1692-2126,
    spread over chips instead of SIMD lanes).

    Two pair interfaces, like the single-chip runner:
      * ``run_meta`` (preferred, pod config): 28 B of metadata per pair;
        each pair is routed to the shard OWNING its read (rows are
        shard-major), where the Pallas kernel slices the DP tiles from
        the shard-local read matrix + the replicated packed reference.
      * ``run_flat`` fallback: host-packed tiles through the XLA twin.
    """

    def __init__(self, opt, mat: np.ndarray, mesh: Mesh | None = None,
                 dfi=None):
        # the XLA twin backs run_flat on any backend; run_meta composes
        # the Pallas kernel under shard_map (interpret mode on CPU)
        super().__init__(opt, mat, use_pallas=False, dfi=dfi)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.S = int(self.mesh.devices.size)
        self._steps: dict = {}
        self._meta_steps: dict = {}
        self._R_rows = 0              # rows per shard in the read matrix

    # ---- metadata pair interface -------------------------------------
    def set_query_context(self, qd, L: int = 0, row_map=None) -> None:
        if qd is not None:
            self._R_rows = int(qd.shape[0]) // self.S
        super().set_query_context(qd, L, row_map)

    @property
    def supports_meta(self) -> bool:
        backend_ok = self.interpret or jax.default_backend() != "cpu"
        return (backend_ok and self.mat_is_scmat and
                self.dfi is not None and self._qctx is not None and
                self._R_rows > 0)

    @property
    def supports_meta_dual(self) -> bool:
        return self.supports_meta

    def _meta_dual_step(self, P_shard: int, Q: int, T: int, w0: int):
        from compseed_tpu.ops.bsw import _meta_dual_core, pallas_available
        force_xla = getattr(self, "force_meta_xla", False)
        qflat, L = self._qctx
        key = ("dual", P_shard, Q, T, L, w0, self.interpret, force_xla)
        if key in self._meta_steps:
            return self._meta_steps[key]
        opt = self.opt
        l_pac = self.dfi.l_pac
        interp = self.interpret
        use_pallas = (interp or pallas_available()) and not force_xla
        mat_arg = self.mat25 if use_pallas else self.mat
        wide = jnp.dtype(self.dfi.dtype) == jnp.int64

        def run(mat_in, qflat_s, pac, meta):
            return _meta_dual_core(
                mat_in, qflat_s, pac, meta, Q=Q, T=T, L=L, l_pac=l_pac,
                o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                e_ins=opt.e_ins, zdrop=opt.zdrop, w0=w0,
                use_pallas=use_pallas, interpret=interp, wide_r0=wide)

        step = jax.jit(jax.shard_map(
            run, mesh=self.mesh,
            in_specs=(P(), P("data"), P(), P("data", None)),
            out_specs=P("data", None),
            check_vma=False))
        self._meta_steps[key] = (step, mat_arg)
        return step, mat_arg

    def run_meta_dual(self, qmeta: np.ndarray, rmeta: np.ndarray,
                      h0: np.ndarray, prev: np.ndarray, w: int,
                      pen_clip: int):
        """Fused band-retry pair interface under shard_map: each pair is
        routed to the shard owning its read; one packed H2D buffer, one
        device program (both band rounds + acceptance), one D2H fetch."""
        from compseed_tpu.ops.bsw_pallas import LT, clamp_band
        opt = self.opt
        n = len(h0)
        if n == 0:
            z = np.zeros(0, np.int32)
            return (z,) * 7
        S, R_rows = self.S, self._R_rows
        rows = qmeta[:, 0] if self._row_map is None else \
            np.asarray(self._row_map)[qmeta[:, 0]]
        shard = rows // R_rows
        qlens = qmeta[:, 2].astype(np.int32)
        tlens = rmeta[:, 1].astype(np.int32)
        Q = _bucket(int(qlens.max(initial=1)), 128)
        T = _bucket(int(tlens.max(initial=1)), 128)
        per = np.bincount(shard, minlength=S)
        P_shard = _bucket(int(per.max(initial=1)), LT)
        order = np.argsort(shard, kind="stable")
        within = np.arange(n) - np.repeat(np.cumsum(per) - per, per)
        slot = shard * P_shard + within[np.argsort(order, kind="stable")]
        meta = np.zeros((S * P_shard, 12), np.int32)
        meta[:, 7] = 1
        meta[:, 8] = -2            # pad lanes accept at round 0
        meta[slot, 0:4] = qmeta
        meta[slot, 0] = (rows % R_rows).astype(np.int32)  # shard-local row
        r0 = rmeta[:, 0]
        meta[slot, 4] = (r0 & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
        meta[slot, 5] = (r0 >> 32).astype(np.int32)
        meta[slot, 6] = tlens
        meta[slot, 7] = h0
        meta[slot, 8] = prev
        meta[slot, 9] = clamp_band(qlens, w, self.max_sc, pen_clip,
                                   opt.o_del, opt.e_del, opt.o_ins,
                                   opt.e_ins)
        meta[slot, 10] = clamp_band(qlens, w * 2, self.max_sc, pen_clip,
                                    opt.o_del, opt.e_del, opt.o_ins,
                                    opt.e_ins)
        step, mat_arg = self._meta_dual_step(P_shard, Q, T, int(w))
        qflat, _L = self._qctx
        out = np.asarray(step(mat_arg, qflat, self.dfi.pac_words,
                              jnp.asarray(meta)))
        return tuple(np.ascontiguousarray(out[slot, j].astype(np.int32))
                     for j in range(7))

    def _meta_step(self, P_shard: int, Q: int, T: int, L: int):
        from compseed_tpu.ops.bsw import bsw_meta_xla, pallas_available
        from compseed_tpu.ops.bsw_pallas import bsw_meta_tiles
        force_xla = getattr(self, "force_meta_xla", False)
        key = (P_shard, Q, T, L, self.interpret, force_xla)
        if key in self._meta_steps:
            return self._meta_steps[key]
        opt = self.opt
        l_pac = self.dfi.l_pac
        interp = self.interpret
        # interpret mode (CPU tests) exercises the Pallas kernel without
        # Mosaic; on hardware, fall back to the XLA twin when Mosaic
        # compilation is broken/glacial on this tunnel (see
        # bsw.pallas_available).  force_meta_xla pins the XLA twin so the
        # sharded composition of the fallback is testable on CPU.
        use_pallas = (interp or pallas_available()) and not force_xla
        mat_arg = self.mat25 if use_pallas else self.mat

        def run(mat_in, qflat, pac, qm, r0, rl, h0, ws):
            if use_pallas:
                return bsw_meta_tiles(
                    mat_in, qflat, pac, qm, r0, rl, h0, ws,
                    Q=Q, T=T, L=L, l_pac=l_pac,
                    o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                    e_ins=opt.e_ins, zdrop=opt.zdrop, interpret=interp)
            return bsw_meta_xla(
                mat_in, qflat, pac, qm, r0, rl, h0, ws,
                Q=Q, T=T, L=L, l_pac=l_pac,
                o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                e_ins=opt.e_ins, zdrop=opt.zdrop)

        step = jax.jit(jax.shard_map(
            run, mesh=self.mesh,
            in_specs=(P(), P("data"), P(), P("data", None), P("data"),
                      P("data"), P("data", None), P("data", None)),
            out_specs=P("data", None),
            check_vma=False))
        self._meta_steps[key] = (step, mat_arg)
        return step, mat_arg

    def run_meta(self, qmeta: np.ndarray, rmeta: np.ndarray,
                 h0: np.ndarray, w: int, pen_clip: int):
        from compseed_tpu.ops.bsw_pallas import LT, clamp_band
        opt = self.opt
        n = len(h0)
        if n == 0:
            z = np.zeros(0, np.int32)
            return (z,) * 6
        qflat, L = self._qctx
        S, R_rows = self.S, self._R_rows
        rows = qmeta[:, 0] if self._row_map is None else \
            np.asarray(self._row_map)[qmeta[:, 0]]
        shard = rows // R_rows
        qlens = qmeta[:, 2].astype(np.int32)
        tlens = rmeta[:, 1].astype(np.int32)
        Q = _bucket(int(qlens.max(initial=1)), 128)
        T = _bucket(int(tlens.max(initial=1)), 128)
        per = np.bincount(shard, minlength=S)
        P_shard = _bucket(int(per.max(initial=1)), LT)
        # slot: pair i -> (shard, position within shard)
        order = np.argsort(shard, kind="stable")
        within = np.arange(n) - np.repeat(np.cumsum(per) - per, per)
        slot = shard * P_shard + within[np.argsort(order, kind="stable")]
        qm = np.zeros((S * P_shard, 4), np.int32)
        r0 = np.zeros(S * P_shard, rmeta.dtype)
        rl = np.zeros(S * P_shard, np.int32)
        h0p = np.ones((S * P_shard, 1), np.int32)
        ws = np.full((S * P_shard, 1), w, np.int32)
        qm[slot] = qmeta
        qm[slot, 0] = (rows % R_rows).astype(np.int32)   # shard-local row
        r0[slot] = rmeta[:, 0]
        rl[slot] = tlens
        h0p[slot, 0] = h0
        ws[slot, 0] = clamp_band(qlens, w, self.max_sc, pen_clip,
                                 opt.o_del, opt.e_del, opt.o_ins,
                                 opt.e_ins)
        step, mat_arg = self._meta_step(P_shard, Q, T, L)
        dt = self.dfi.dtype
        out = np.asarray(step(
            mat_arg, qflat, self.dfi.pac_words, jnp.asarray(qm),
            jnp.asarray(r0).astype(dt), jnp.asarray(rl),
            jnp.asarray(h0p), jnp.asarray(ws)))
        return tuple(out[slot, j].astype(np.int32) for j in range(6))

    def _step(self, Pb: int, Q: int, T: int, bonus: int):
        key = (Pb, Q, T, bonus)
        if key in self._steps:
            return self._steps[key]
        opt = self.opt

        def run(mat, w_in, queries, qlens, targets, tlens, h0s):
            return bsw_mod.bsw_extend(
                opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, opt.zdrop,
                bonus, self.max_sc, mat, w_in, queries, qlens, targets,
                tlens, h0s)

        step = jax.jit(jax.shard_map(
            run, mesh=self.mesh,
            in_specs=(P(), P(), P("data", None), P("data"),
                      P("data", None), P("data"), P("data")),
            out_specs=P(None, "data"),
            check_vma=False))
        self._steps[key] = step
        return step

    def run_flat(self, qbuf, qoff, rbuf, roff, h0, w: int, pen_clip: int):
        n = len(h0)
        if n == 0:
            z = np.zeros(0, np.int32)
            return (z,) * 6
        S = self.S
        per = -(-n // S)
        P_shard = _bucket(max(per, 1), 64)
        Pb = S * P_shard
        Q = _bucket(int((qoff[1:] - qoff[:-1]).max(initial=1)), 32)
        T = _bucket(int((roff[1:] - roff[:-1]).max(initial=1)), 32)
        q_packed, qlens = _pack_rows(qbuf, qoff, n, Q)
        t_packed, tlens = _pack_rows(rbuf, roff, n, T)
        # shard-major layout: pair i -> row (i//per)*P_shard + i%per
        rows = np.arange(n)
        srt = (rows // per) * P_shard + rows % per
        queries = np.full((Pb, Q), 4, np.uint8)
        targets = np.full((Pb, T), 4, np.uint8)
        qlp = np.zeros(Pb, np.int32)
        tlp = np.zeros(Pb, np.int32)
        h0p = np.ones(Pb, np.int32)
        queries[srt] = q_packed
        targets[srt] = t_packed
        qlp[srt] = qlens
        tlp[srt] = tlens
        h0p[srt] = h0
        step = self._step(Pb, Q, T, int(pen_clip))
        out = np.asarray(step(self.mat, jnp.int32(w),
                              jnp.asarray(queries), jnp.asarray(qlp),
                              jnp.asarray(targets), jnp.asarray(tlp),
                              jnp.asarray(h0p)))
        return tuple(out[j, srt].astype(np.int32) for j in range(6))
