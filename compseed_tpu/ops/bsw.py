"""Batched banded Smith-Waterman extension on device.

Exact integer semantics of ksw_extend2 (bwalib/ksw.c:380-479) ==
scalarBandedSWA (mapping/bandedSWA.cpp:116-237), vectorized one-pair-per-
lane over the batch dimension (the TPU analogue of the reference's
SSE/AVX lane packing, mapping/bandedSWA.h:57-79) and scanned over target
rows.  Everything that is data-dependent in the scalar code — adaptive
band [beg,end), z-drop, early break, last-argmax tie-breaking — is
reproduced with masks, so results are bit-identical to the oracle.

The F (gap-in-query) recurrence within a row is a max-plus prefix scan,
computed with a cumulative max over t + j*e_ins (O(row) VPU work instead
of a sequential column loop).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(1 << 29)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def bsw_extend(o_del: int, e_del: int, o_ins: int, e_ins: int,
               zdrop: int, end_bonus: int, max_sc: int,
               mat: jax.Array,        # (5, 5) int32 scoring matrix
               w_in: jax.Array,       # () int32 band width this round
               queries: jax.Array,    # (P, Q) uint8, padded with 4
               qlens: jax.Array,      # (P,) int32
               targets: jax.Array,    # (P, T) uint8, padded with 4
               tlens: jax.Array,      # (P,) int32
               h0s: jax.Array,        # (P,) int32
               ):
    """Returns (score, qle, tle, gtle, gscore, max_off), each (P,) int32."""
    i32 = jnp.int32
    qlens = qlens.astype(i32)
    # per-pair band clamp (ksw.c:398-407); C computes in double then truncs
    max_ins = jnp.maximum(
        ((qlens.astype(jnp.float64) * max_sc + end_bonus - o_ins) / e_ins
         + 1.0).astype(i32), 1)
    max_del = jnp.maximum(
        ((qlens.astype(jnp.float64) * max_sc + end_bonus - o_del) / e_del
         + 1.0).astype(i32), 1)
    w = jnp.minimum(jnp.minimum(w_in.astype(i32), max_ins), max_del)  # (P,)
    return _extend_core(o_del, e_del, o_ins, e_ins, zdrop, mat, w,
                        queries, qlens, targets, tlens, h0s)


def _extend_core(o_del: int, e_del: int, o_ins: int, e_ins: int,
                 zdrop: int, mat, w, queries, qlens, targets, tlens, h0s):
    """DP body with the band already clamped per pair (w: (P,) int32)."""
    P, Q = queries.shape
    T = targets.shape[1]
    i32 = jnp.int32
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    qlens = qlens.astype(i32)
    tlens = tlens.astype(i32)
    h0s = h0s.astype(i32)
    w = w.astype(i32)

    jj = jnp.arange(Q + 1, dtype=i32)            # eh index grid
    jq = jnp.arange(Q, dtype=i32)                # column grid

    # first row init (ksw.c:395-397): h[j] = max(h0 - oe_ins - (j-1)e, 0)
    v = h0s[:, None] - oe_ins - (jj[None, :] - 1) * e_ins
    h = jnp.where(jj[None, :] == 0, h0s[:, None], jnp.maximum(v, 0))
    h = jnp.where(jj[None, :] <= qlens[:, None], h, 0).astype(i32)
    e = jnp.zeros((P, Q + 1), dtype=i32)

    # per-base query profiles, computed once; rows select by target char
    # (replaces a per-row 2D gather, which lowers poorly)
    qidx = queries.astype(i32)
    qprof = [mat[c][qidx] for c in range(5)]  # 5 x (P, Q)

    init = dict(
        h=h, e=e,
        beg=jnp.zeros(P, dtype=i32), end=qlens,
        best=h0s, max_i=jnp.full(P, -1, i32), max_j=jnp.full(P, -1, i32),
        max_ie=jnp.full(P, -1, i32), gscore=jnp.full(P, -1, i32),
        max_off=jnp.zeros(P, i32), broken=jnp.zeros(P, jnp.bool_),
    )

    def row_step(i, st):
        active = (~st["broken"]) & (i < tlens)
        beg = jnp.maximum(st["beg"], i - w)
        end = jnp.minimum(jnp.minimum(st["end"], i + w + 1), qlens)
        empty = end <= beg
        h_first = jnp.where(beg == 0,
                            jnp.maximum(h0s - (o_del + e_del * (i + 1)), 0),
                            0).astype(i32)

        tchar = targets[:, i].astype(i32)                     # (P,)
        score = qprof[4]
        for c in range(4):
            score = jnp.where((tchar == c)[:, None], qprof[c], score)

        inb = (jq[None, :] >= beg[:, None]) & (jq[None, :] < end[:, None])
        Hdiag = st["h"][:, :Q]
        Eprev = st["e"][:, :Q]
        M = jnp.where(Hdiag != 0, Hdiag + score, 0)
        e_new = jnp.maximum(Eprev - e_del, jnp.maximum(M - oe_del, 0))
        t_ins = jnp.maximum(M - oe_ins, 0)

        # F prefix scan with a pseudo source (value 0) at column beg-1:
        # T_arr[jj] = 0 at jj==beg, t[jj-1] inside the band, else -inf
        t_pad = jnp.concatenate(
            [jnp.full((P, 1), NEG, i32),
             jnp.where(inb, t_ins, NEG)], axis=1)              # (P, Q+1)
        t_src = jnp.where(jj[None, :] == beg[:, None], 0, t_pad)
        run = jax.lax.associative_scan(jnp.maximum,
                                       t_src + jj[None, :] * e_ins, axis=1)
        f = run[:, :Q] - jq[None, :] * e_ins                   # F entering col j

        h_new = jnp.maximum(jnp.maximum(M, Eprev), f)

        # row max and its LAST column (ksw.c:437-438 tie semantics)
        h_band = jnp.where(inb, h_new, 0)
        m = jnp.max(h_band, axis=1)                            # >= 0
        is_max = (h_band == m[:, None]) & inb
        mj = jnp.max(jnp.where(is_max, jq[None, :], -1), axis=1)
        mj = jnp.where(m == 0, -1, mj)

        # scatter the shifted row back: h[jj] = h_first at beg,
        # H(i, jj-1) for beg < jj <= end; e[jj] = e_new in band, 0 at end
        h_prev = jnp.concatenate([jnp.zeros((P, 1), i32), h_new], axis=1)
        upd1 = jj[None, :] == beg[:, None]
        upd2 = (jj[None, :] > beg[:, None]) & (jj[None, :] <= end[:, None])
        h_out = jnp.where(upd1, h_first[:, None],
                          jnp.where(upd2, h_prev, st["h"]))
        e_pad = jnp.concatenate([e_new, jnp.zeros((P, 1), i32)], axis=1)
        inb_e = (jj[None, :] >= beg[:, None]) & (jj[None, :] < end[:, None])
        e_out = jnp.where(inb_e, e_pad,
                          jnp.where(jj[None, :] == end[:, None], 0, st["e"]))
        h_out = jnp.where(active[:, None], h_out, st["h"])
        e_out = jnp.where(active[:, None], e_out, st["e"])

        # to-query-end score (ksw.c:450-453)
        h1_last = jnp.where(empty, h_first,
                            jnp.take_along_axis(
                                h_new, jnp.maximum(end - 1, 0)[:, None],
                                axis=1)[:, 0])
        at_qend = active & (end == qlens)
        upd_g = at_qend & (st["gscore"] <= h1_last)
        max_ie = jnp.where(upd_g, i, st["max_ie"])
        gscore = jnp.where(at_qend, jnp.maximum(st["gscore"], h1_last),
                           st["gscore"])

        # break / best / z-drop (ksw.c:454-463)
        brk0 = m == 0
        better = m > st["best"]
        best = jnp.where(active & better, m, st["best"])
        max_i = jnp.where(active & better, i, st["max_i"])
        max_j = jnp.where(active & better, mj, st["max_j"])
        max_off = jnp.where(active & better,
                            jnp.maximum(st["max_off"], jnp.abs(mj - i)),
                            st["max_off"])
        di = i - st["max_i"]
        dj = mj - st["max_j"]
        zd_del = st["best"] - m - (di - dj) * e_del > zdrop
        zd_ins = st["best"] - m - (dj - di) * e_ins > zdrop
        zd = jnp.where(di > dj, zd_del, zd_ins)
        brk = brk0 | ((~better) & (zdrop > 0) & zd)
        broken = st["broken"] | (active & brk)

        # band shrink to the non-zero span (ksw.c:465-469), on the
        # updated arrays; skipped for lanes that just broke
        nz = (h_out != 0) | (e_out != 0)
        c1 = nz & (jj[None, :] >= beg[:, None]) & (jj[None, :] < end[:, None])
        beg_new = jnp.min(jnp.where(c1, jj[None, :], end[:, None]), axis=1)
        c2 = nz & (jj[None, :] >= beg_new[:, None]) & \
            (jj[None, :] <= end[:, None])
        last = jnp.max(jnp.where(c2, jj[None, :], beg_new[:, None] - 1),
                       axis=1)
        end_new = jnp.minimum(last + 2, qlens)
        keep = active & ~brk
        beg = jnp.where(keep, beg_new, st["beg"])
        end_out = jnp.where(keep, end_new, st["end"])

        return dict(h=h_out, e=e_out, beg=beg, end=end_out, best=best,
                    max_i=max_i, max_j=max_j, max_ie=max_ie, gscore=gscore,
                    max_off=max_off, broken=broken)

    init["i"] = jnp.asarray(0, i32)

    def cond(st):
        return (st["i"] < T) & jnp.any((~st["broken"]) & (st["i"] < tlens))

    def body(st):
        i = st.pop("i")
        st = row_step(i, st)
        st["i"] = i + 1
        return st

    st = jax.lax.while_loop(cond, body, init)
    # single packed output: one device->host transfer for all six results
    return jnp.stack([st["best"], st["max_j"] + 1, st["max_i"] + 1,
                      st["max_ie"] + 1, st["gscore"], st["max_off"]])


@partial(jax.jit, static_argnames=("Q", "T", "L", "l_pac", "o_del",
                                   "e_del", "o_ins", "e_ins", "zdrop"))
def bsw_meta_xla(mat, qflat, pac,          # device read matrix + reference
                 qmeta,                    # (P, 4) i32: rid, q0, qlen, rev
                 r0,                       # (P,) index dtype
                 rlen,                     # (P,) i32
                 h0s, ws,                  # (P, 1) i32
                 *, Q: int, T: int, L: int, l_pac: int,
                 o_del: int, e_del: int, o_ins: int, e_ins: int,
                 zdrop: int) -> jax.Array:
    """Metadata pair interface backed by the XLA DP twin instead of the
    Pallas kernel: same on-device tile build (only ~28 B/pair crosses
    the host link), same results, ~(P, Q) HBM round trips per row in
    the DP.  Used when Mosaic compilation is unavailable on the target
    (some axon tunnels hang compiling ANY Pallas kernel while plain XLA
    works) — see pallas_available().  Output layout matches the Pallas
    kernel's (P, 8) int32 block."""
    from compseed_tpu.ops.bsw_pallas import build_tiles
    qt, ql, tt = build_tiles(qflat, pac, qmeta, r0, rlen,
                             Q=Q, T=T, L=L, l_pac=l_pac)
    res = _extend_core(o_del, e_del, o_ins, e_ins, zdrop, mat,
                       ws[:, 0], qt, ql.astype(jnp.int32), tt,
                       rlen.astype(jnp.int32), h0s[:, 0])   # (6, P)
    out = res.T.astype(jnp.int32)
    return jnp.concatenate(
        [out, jnp.zeros((out.shape[0], 2), jnp.int32)], axis=1)


def _meta_dual_core(mat_arg, qflat, pac, meta, *, Q, T, L, l_pac,
                    o_del, e_del, o_ins, e_ins, zdrop, w0, use_pallas,
                    interpret=False, state16=False, wide_r0=False):
    """Both band-doubling DP rounds + the retry acceptance in ONE device
    program: round 0 at the nominal band w0, the reference's acceptance
    test (score unchanged OR max_off < (w>>1)+(w>>2), comp_seed.cpp:
    1732-1767), then round 1 at 2*w0 only for rejected lanes (accepted
    lanes get tlen=0 and early-exit).  This replaces two host round
    trips per side (export/engine/apply x2) with one — on the ~30 ms/
    transfer axon tunnel the round trips, not the DP, dominated the
    engine phase.  meta columns: rid, q0, qlen, rev, r0_lo, r0_hi, rlen,
    h0, prev_score, ws0, ws1, pad.  Returns (P, 8) int32: the six DP
    results of the accepted round + col 6 = accepted round index.
    Shared by the single-chip jit (bsw_meta_dual) and the shard_map
    composition (parallel/sharded.py)."""
    from compseed_tpu.ops.bsw_pallas import _call_kernel, build_tiles
    i32 = jnp.int32
    qmeta = meta[:, 0:4]
    if wide_r0:
        r0 = (meta[:, 4].astype(jnp.uint32).astype(jnp.int64) |
              (meta[:, 5].astype(jnp.int64) << 32))
    else:
        r0 = meta[:, 4]
    rlen = meta[:, 6]
    h0s = meta[:, 7:8]
    prev = meta[:, 8]
    ws0 = meta[:, 9:10]
    ws1 = meta[:, 10:11]
    qt, ql, tt = build_tiles(qflat, pac, qmeta, r0, rlen,
                             Q=Q, T=T, L=L, l_pac=l_pac)

    def dp(tl, ws):
        if use_pallas:
            return _call_kernel(
                mat_arg, qt, ql[:, None].astype(i32), tt,
                tl[:, None].astype(i32), h0s, ws,
                o_del, e_del, o_ins, e_ins, zdrop,
                interpret=interpret, state16=state16)
        res = _extend_core(o_del, e_del, o_ins, e_ins, zdrop, mat_arg,
                           ws[:, 0], qt, ql.astype(i32), tt,
                           tl.astype(i32), h0s[:, 0])      # (6, P)
        return res.T.astype(i32)

    out0 = dp(rlen, ws0)
    accept0 = (out0[:, 0] == prev) | \
        (out0[:, 5] < ((w0 >> 1) + (w0 >> 2)))
    out1 = dp(jnp.where(accept0, 0, rlen), ws1)
    res = jnp.where(accept0[:, None], out0[:, :6], out1[:, :6])
    rnd = jnp.where(accept0, 0, 1).astype(i32)
    return jnp.concatenate(
        [res, rnd[:, None], jnp.zeros((res.shape[0], 1), i32)], axis=1)


@partial(jax.jit, static_argnames=("Q", "T", "L", "l_pac", "o_del",
                                   "e_del", "o_ins", "e_ins", "zdrop",
                                   "w0", "use_pallas", "interpret",
                                   "state16", "wide_r0"))
def bsw_meta_dual(mat_arg, qflat, pac,
                  meta,                    # (P, 12) int32 packed pair table
                  *, Q: int, T: int, L: int, l_pac: int,
                  o_del: int, e_del: int, o_ins: int, e_ins: int,
                  zdrop: int, w0: int, use_pallas: bool,
                  interpret: bool = False, state16: bool = False,
                  wide_r0: bool = False) -> jax.Array:
    return _meta_dual_core(
        mat_arg, qflat, pac, meta, Q=Q, T=T, L=L, l_pac=l_pac,
        o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins, zdrop=zdrop,
        w0=w0, use_pallas=use_pallas, interpret=interpret,
        state16=state16, wide_r0=wide_r0)


_PALLAS_OK: bool | None = None

_PALLAS_PROBE_SRC = """
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
def k(x_ref, o_ref):
    o_ref[:] = x_ref[:] + jnp.asarray(1, jnp.int32)
f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))
assert int(np.asarray(f(jnp.zeros((8, 128), jnp.int32)))[0, 0]) == 1
print("ok")
"""


def pallas_available() -> bool:
    """Whether Mosaic kernels can actually be compiled on this backend.

    Some axon TPU tunnels hang server-side compiling ANY Pallas kernel
    (even a trivial copy) while plain XLA programs compile in seconds —
    a blocking call would wedge the whole pipeline, so the probe runs in
    a subprocess under a timeout and the verdict is cached per backend
    in build/.  COMPSEED_PALLAS=0/1 overrides."""
    global _PALLAS_OK
    if _PALLAS_OK is not None:
        return _PALLAS_OK
    import json
    import os
    import subprocess
    import sys

    ov = os.environ.get("COMPSEED_PALLAS")
    if ov in ("0", "1"):
        _PALLAS_OK = ov == "1"
        return _PALLAS_OK
    import jax
    backend = jax.default_backend()
    if backend == "cpu":
        _PALLAS_OK = False        # tests use interpret mode explicitly
        return False
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cache = os.path.join(root, "build", f"pallas_probe_{backend}.json")
    key = jax.__version__
    try:
        with open(cache) as f:
            rec = json.load(f)
        if rec.get("key") == key:
            _PALLAS_OK = bool(rec["ok"])
            return _PALLAS_OK
    except (OSError, ValueError):
        pass
    # threshold, not just a hang guard: a healthy tunnel compiles the
    # trivial kernel in seconds; one measured sick tunnel took 256 s —
    # at that rate the real DP kernels would take hours, so "slower
    # than this" means "fall back to the XLA twin"
    timeout = float(os.environ.get("COMPSEED_PALLAS_PROBE_TIMEOUT", "150"))
    why = ""
    try:
        r = subprocess.run([sys.executable, "-c", _PALLAS_PROBE_SRC],
                           capture_output=True, timeout=timeout)
        ok = r.returncode == 0 and b"ok" in r.stdout
        if not ok:
            err = r.stderr.decode(errors="replace").strip()
            # distinguish "Mosaic can't lower / compile" (cacheable —
            # retrying won't help on this backend+jax) from "the device
            # was busy/unreachable" (transient — do NOT cache, next boot
            # should re-probe; a parent process holding the single-client
            # TPU lock is the common cause)
            transient = any(s in err for s in (
                "UNAVAILABLE", "ALREADY_EXISTS", "RESOURCE_EXHAUSTED",
                "DEADLINE_EXCEEDED", "already in use", "busy",
                "Unable to initialize backend"))
            why = ("transient device/init failure" if transient
                   else "Mosaic compile failure")
            print(f"[compseed] pallas probe failed ({why}); falling back "
                  f"to the XLA DP twin. stderr tail: {err[-400:]}",
                  file=sys.stderr)
            if transient:
                _PALLAS_OK = False   # this run only; not cached
                return False
    except subprocess.TimeoutExpired:
        ok = False
        why = f"probe exceeded {timeout:.0f}s (sick Mosaic tunnel)"
        print(f"[compseed] pallas probe timed out after {timeout:.0f}s; "
              f"caching XLA-twin fallback for jax {key}", file=sys.stderr)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    tmp = cache + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"key": key, "ok": ok, "why": why}, f)
    os.replace(tmp, cache)
    _PALLAS_OK = ok
    return ok


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _bucket(x: int, lo: int) -> int:
    """Next power-of-two-ish size >= x, to bound the jit-cache key set."""
    b = lo
    while b < x:
        b <<= 1
    return b


def _q_classes(qlens: np.ndarray, lo: int = 128):
    """Partition pair indices by the power-of-two bucket of their query
    length (the TPU analogue of the reference's 8/16-bit class split,
    comp_seed.cpp:1550-1560): the kernel's per-row cost scales with the
    static state width Q, so short-query pairs must not pay a long
    pair's tile width.  Yields (bucket, indices) pairs."""
    n = len(qlens)
    buck = np.full(n, lo, np.int32)
    b = lo
    while (qlens > b).any():
        b <<= 1
        buck[qlens > b >> 1] = b
    for bv in np.unique(buck):
        yield int(bv), np.nonzero(buck == bv)[0]


def _pack_rows(buf: np.ndarray, off: np.ndarray, P: int, W: int) -> tuple:
    """Scatter flat concatenated segments into a padded (P, W) matrix."""
    n = len(off) - 1
    lens = (off[1:] - off[:-1]).astype(np.int64)
    out = np.full((P, W), 4, dtype=np.uint8)
    if len(buf):
        rows = np.repeat(np.arange(n), lens)
        cols = np.arange(len(buf)) - np.repeat(off[:-1], lens)
        out[rows, cols] = buf
    return out, lens.astype(np.int32)


class BswRunner:
    """Pads pair batches to bucketed static shapes and runs the DP.

    On TPU the Pallas kernel (ops/bsw_pallas.py) runs; pairs are sorted
    by target length so each LT-lane grid tile early-exits at its own
    longest target (the TPU analogue of the reference's sortPairsLen
    radix bucketing, mapping/comp_seed.cpp:1275-1314).  On CPU the XLA
    program is used (same integer semantics, differentially tested).
    """

    def __init__(self, opt, mat: np.ndarray, use_pallas: bool | None = None,
                 dfi=None):
        self.opt = opt
        self.mat = jnp.asarray(mat.reshape(5, 5).astype(np.int32))
        self.mat25 = jnp.asarray(mat.reshape(1, 25).astype(np.int32))
        self.max_sc = int(mat.max())
        self.dfi = dfi               # device index (pac) for the meta path
        self._qctx = None            # (qflat device array, L) per chunk
        self._row_map = None         # read id -> qd row (sharded layout)
        import jax
        on_device = jax.default_backend() != "cpu"
        if use_pallas is None:
            use_pallas = on_device and pallas_available()
        m = mat.reshape(5, 5).astype(np.int64)
        a, b = int(m[0, 0]), int(m[0, 1])
        pattern = np.full((5, 5), b, np.int64)
        np.fill_diagonal(pattern, a)
        pattern[4, :] = pattern[:, 4] = m[0, 4]
        # the Pallas kernel computes scores from the bwa_fill_scmat
        # pattern (match/mismatch/ambig); exotic matrices use XLA
        self.mat_is_scmat = bool((m == pattern).all())
        self.use_pallas = use_pallas and self.mat_is_scmat
        # metadata pair interface without Mosaic: XLA tile build + DP
        # twin; default on-device whenever the Pallas kernel is not
        # taken (broken Mosaic tunnel, exotic matrix), opt-in on CPU
        # (COMPSEED_BSW_META=1) for differential coverage of the exact
        # production path
        import os
        meta_env = os.environ.get("COMPSEED_BSW_META", "auto")
        self.meta_xla = (meta_env == "1" or
                         (meta_env == "auto" and on_device and
                          not self.use_pallas))
        self.interpret = False       # CPU differential tests set True
        # int16 DP state, STORAGE-only (the v5e VPU has no 16-bit ALU;
        # rows ext/trunc at the VMEM boundary, compute stays int32);
        # applied per kernel class only when the score bounds prove no
        # overflow — the 8/16-bit class-split analogue of
        # mapping/bandedSWA.cpp:116.  Lowering-verified + SAM parity on
        # chip; measured e2e-neutral (seeding-bound pipeline), so
        # opt-in.
        self.state16 = os.environ.get("COMPSEED_BSW_I16", "0") == "1"
        # sub-phase timers for the tail's "engine" bucket (VERDICT r3
        # weak#1): pack = host numpy, call = jit dispatch (async),
        # fetch = np.asarray D2H sync (includes queued device compute)
        self.prof: dict[str, float] = {}

    def _use16(self, Q: int, h0max: int) -> bool:
        """True when every STORED int16 value provably fits.  Since the
        storage-only rework (compute intermediates are int32; rows
        ext/trunc only at the VMEM boundary) the binding bound is just
        the stored H/E range, H <= h0 + Q*a.  The extra (Q-1)*e terms
        below date from the all-int16-compute design and are kept as a
        deliberately conservative margin — they only ever disable the
        (measured e2e-neutral) storage optimization, never correctness."""
        if not self.state16:
            return False
        opt = self.opt
        e = max(opt.e_ins, opt.e_del, 1)
        return ((Q - 1) * e < 16000 and
                h0max + Q * self.max_sc + (Q - 1) * opt.e_ins < 32000)

    def run_flat(self, qbuf: np.ndarray, qoff: np.ndarray, rbuf: np.ndarray,
                 roff: np.ndarray, h0: np.ndarray, w: int, pen_clip: int):
        """Flat-buffer interface; returns six (n,) int32 numpy arrays."""
        n = len(h0)
        if n == 0:
            z = np.zeros(0, np.int32)
            return (z,) * 6
        opt = self.opt
        if self.use_pallas:
            return self._run_pallas(qbuf, qoff, rbuf, roff, h0, w, pen_clip)
        P = _bucket(n, 64)
        Q = _bucket(int((qoff[1:] - qoff[:-1]).max(initial=1)), 32)
        T = _bucket(int((roff[1:] - roff[:-1]).max(initial=1)), 32)
        queries, qlens = _pack_rows(qbuf, qoff, P, Q)
        targets, tlens = _pack_rows(rbuf, roff, P, T)
        h0p = np.ones(P, dtype=np.int32)
        h0p[:n] = h0
        qlp = np.zeros(P, np.int32)
        qlp[:n] = qlens
        tlp = np.zeros(P, np.int32)
        tlp[:n] = tlens
        out = np.asarray(bsw_extend(
            opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
            opt.zdrop, pen_clip, self.max_sc, self.mat,
            jnp.int32(w), jnp.asarray(queries),
            jnp.asarray(qlp), jnp.asarray(targets),
            jnp.asarray(tlp), jnp.asarray(h0p)))
        return tuple(out[j, :n].astype(np.int32) for j in range(6))

    def set_query_context(self, qd, L: int = 0, row_map=None) -> None:
        """Per-chunk device read matrix for metadata-only pair transfer;
        call with None to clear (e.g. a chunk that fell back to the
        legacy seeder has no device read matrix).  ``row_map`` maps a
        read id to its row in qd when the layout is not row==read id
        (the sharded seeder packs reads shard-major)."""
        if qd is None:
            self._qctx = None
            self._row_map = None
            return
        self._qctx = (qd.reshape(-1).astype(jnp.int8), L)
        self._row_map = row_map

    @property
    def supports_meta(self) -> bool:
        return ((self.use_pallas or self.meta_xla) and
                self.dfi is not None and self._qctx is not None)

    def run_meta(self, qmeta: np.ndarray, rmeta: np.ndarray,
                 h0: np.ndarray, w: int, pen_clip: int):
        """Pair metadata interface: sequences are sliced on device from
        the chunk read matrix + packed reference; only ~28 B/pair cross
        the host link (vs the padded tiles of run_flat)."""
        from compseed_tpu.ops.bsw_pallas import (LT, bsw_meta_tiles,
                                                 clamp_band)
        opt = self.opt
        n = len(h0)
        if n == 0:
            z = np.zeros(0, np.int32)
            return (z,) * 6
        qflat, L = self._qctx
        if getattr(self, "_row_map", None) is not None:
            qmeta = qmeta.copy()
            qmeta[:, 0] = self._row_map[qmeta[:, 0]]
        qlens = qmeta[:, 2].astype(np.int32)
        tlens = rmeta[:, 1].astype(np.int32)
        dt = self.dfi.dtype
        res = np.zeros((n, 6), np.int32)
        for Q, cls in _q_classes(qlens):
            m = len(cls)
            order = cls[np.argsort(tlens[cls], kind="stable")]
            P = _bucket(m, LT)
            T = _bucket(int(tlens[order].max(initial=1)), 128)
            qm = np.zeros((P, 4), np.int32)
            qm[:m] = qmeta[order]
            r0 = np.zeros(P, rmeta.dtype)
            r0[:m] = rmeta[order, 0]
            rl = np.zeros(P, np.int32)
            rl[:m] = tlens[order]
            h0p = np.ones((P, 1), np.int32)
            h0p[:m, 0] = h0[order]
            ws = np.full((P, 1), w, np.int32)
            ws[:m, 0] = clamp_band(qlens[order], w, self.max_sc, pen_clip,
                                   opt.o_del, opt.e_del, opt.o_ins,
                                   opt.e_ins)
            if self.use_pallas:
                out = np.asarray(bsw_meta_tiles(
                    self.mat25, qflat, self.dfi.pac_words,
                    jnp.asarray(qm), jnp.asarray(r0).astype(dt),
                    jnp.asarray(rl), jnp.asarray(h0p), jnp.asarray(ws),
                    Q=Q, T=T, L=L, l_pac=self.dfi.l_pac,
                    o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                    e_ins=opt.e_ins, zdrop=opt.zdrop,
                    interpret=self.interpret,
                    state16=self._use16(Q, int(h0[order].max(initial=0)))))
            else:
                out = np.asarray(bsw_meta_xla(
                    self.mat, qflat, self.dfi.pac_words,
                    jnp.asarray(qm), jnp.asarray(r0).astype(dt),
                    jnp.asarray(rl), jnp.asarray(h0p), jnp.asarray(ws),
                    Q=Q, T=T, L=L, l_pac=self.dfi.l_pac,
                    o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                    e_ins=opt.e_ins, zdrop=opt.zdrop))
            res[order] = out[:m, :6].astype(np.int32)
        # each result must be C-contiguous: these cross a raw ctypes
        # pointer into the native tail, which indexes them densely
        return tuple(np.ascontiguousarray(res[:, j]) for j in range(6))

    @property
    def supports_meta_dual(self) -> bool:
        return self.supports_meta

    def run_meta_dual(self, qmeta: np.ndarray, rmeta: np.ndarray,
                      h0: np.ndarray, prev: np.ndarray, w: int,
                      pen_clip: int):
        """Fused band-retry interface: ONE packed H2D buffer, one device
        program running both band rounds + acceptance (bsw_meta_dual),
        one D2H fetch.  Returns seven (n,) int32 arrays: the six DP
        results of the accepted round + the accepted round index."""
        import time as _time
        from compseed_tpu.ops.bsw_pallas import LT, clamp_band
        opt = self.opt
        n = len(h0)
        if n == 0:
            z = np.zeros(0, np.int32)
            return (z,) * 7
        t0 = _time.perf_counter()
        qflat, L = self._qctx
        if getattr(self, "_row_map", None) is not None:
            qmeta = qmeta.copy()
            qmeta[:, 0] = self._row_map[qmeta[:, 0]]
        qlens = qmeta[:, 2].astype(np.int32)
        tlens = rmeta[:, 1].astype(np.int32)
        dt = self.dfi.dtype
        wide = np.dtype(dt) == np.int64
        res = np.zeros((n, 7), np.int32)
        for Q, cls in _q_classes(qlens):
            m = len(cls)
            order = cls[np.argsort(tlens[cls], kind="stable")]
            P = _bucket(m, LT)
            T = _bucket(int(tlens[order].max(initial=1)), 128)
            meta = np.zeros((P, 12), np.int32)
            meta[:m, 0:4] = qmeta[order]
            r0 = rmeta[order, 0]
            meta[:m, 4] = (r0 & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
            meta[:m, 5] = (r0 >> 32).astype(np.int32)
            meta[:m, 6] = tlens[order]
            meta[:, 7] = 1
            meta[:m, 7] = h0[order]
            meta[:, 8] = -2              # pad lanes: accept at round 0
            meta[:m, 8] = prev[order]
            meta[:m, 9] = clamp_band(qlens[order], w, self.max_sc,
                                     pen_clip, opt.o_del, opt.e_del,
                                     opt.o_ins, opt.e_ins)
            meta[:m, 10] = clamp_band(qlens[order], w * 2, self.max_sc,
                                      pen_clip, opt.o_del, opt.e_del,
                                      opt.o_ins, opt.e_ins)
            t1 = _time.perf_counter()
            out_dev = bsw_meta_dual(
                self.mat25 if self.use_pallas else self.mat,
                qflat, self.dfi.pac_words, jnp.asarray(meta),
                Q=Q, T=T, L=L, l_pac=self.dfi.l_pac,
                o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                e_ins=opt.e_ins, zdrop=opt.zdrop, w0=int(w),
                use_pallas=self.use_pallas, interpret=self.interpret,
                state16=self._use16(Q, int(h0[order].max(initial=0))),
                wide_r0=wide)
            t2 = _time.perf_counter()
            out = np.asarray(out_dev)
            t3 = _time.perf_counter()
            res[order] = out[:m, :7].astype(np.int32)
            self.prof["engine_pack"] = \
                self.prof.get("engine_pack", 0.0) + (t1 - t0)
            self.prof["engine_call"] = \
                self.prof.get("engine_call", 0.0) + (t2 - t1)
            self.prof["engine_fetch"] = \
                self.prof.get("engine_fetch", 0.0) + (t3 - t2)
            t0 = _time.perf_counter()
        # each result crosses a raw ctypes pointer: must be C-contiguous
        return tuple(np.ascontiguousarray(res[:, j]) for j in range(7))

    def _run_pallas(self, qbuf, qoff, rbuf, roff, h0, w: int, pen_clip: int):
        from compseed_tpu.ops.bsw_pallas import (LT, bsw_extend_tiles,
                                                 clamp_band)
        opt = self.opt
        n = len(h0)
        qlens = (qoff[1:] - qoff[:-1]).astype(np.int32)
        tlens = (roff[1:] - roff[:-1]).astype(np.int32)
        Qall = _bucket(int(qlens.max(initial=1)), 128)
        Tall = _bucket(int(tlens.max(initial=1)), 128)
        q_all, _ = _pack_rows(qbuf, qoff, n, Qall)
        t_all, _ = _pack_rows(rbuf, roff, n, Tall)
        res = np.zeros((n, 6), np.int32)
        for Q, cls in _q_classes(qlens):
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
                interpret=self.interpret,
                state16=self._use16(Q, int(h0[order].max(initial=0)))))
            res[order] = out[:m, :6].astype(np.int32)
        # C-contiguous per result — consumed through a raw ctypes pointer
        return tuple(np.ascontiguousarray(res[:, j]) for j in range(6))

    def __call__(self, pairs, w: int, pen_clip: int):
        if not pairs:
            return []
        qoff = np.zeros(len(pairs) + 1, np.int64)
        roff = np.zeros(len(pairs) + 1, np.int64)
        np.cumsum([len(sp.qs) for sp in pairs], out=qoff[1:])
        np.cumsum([len(sp.rs) for sp in pairs], out=roff[1:])
        qbuf = np.concatenate([sp.qs for sp in pairs]) if qoff[-1] else \
            np.zeros(0, np.uint8)
        rbuf = np.concatenate([sp.rs for sp in pairs]) if roff[-1] else \
            np.zeros(0, np.uint8)
        h0 = np.array([sp.h0 for sp in pairs], np.int32)
        arrs = self.run_flat(qbuf, qoff, rbuf, roff, h0, w, pen_clip)
        return [tuple(int(a[i]) for a in arrs) for i in range(len(pairs))]
