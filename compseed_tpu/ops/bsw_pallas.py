"""Pallas TPU kernel for batched banded Smith-Waterman extension.

Same integer semantics as ops/bsw.py::bsw_extend (== ksw_extend2,
bwalib/ksw.c:380-479, == scalarBandedSWA, mapping/bandedSWA.cpp:116-237),
re-expressed as a lane-tiled Pallas kernel: each grid step owns LT pairs,
keeps the whole DP state (H/E rows, band, best-cell trackers) in
VMEM/vector registers, and iterates target rows in an early-exiting
while loop.  The XLA version round-trips ~30 HLO ops worth of (P, Q)
intermediates through HBM per row; here a row is pure VPU work on
(LT, Q) tiles, which is the TPU analogue of the reference's
one-pair-per-SIMD-lane AVX layout (mapping/bandedSWA.h:57-79).

State width is Q (not Q+1 as in the scalar eh[] layout): entry Q of the
reference's eh array is written but never read (M only reads j < end <=
Q, and the band-shrink scan's virtual entry `end` equals h1_last, which
is tracked separately), so the stored arrays are
  h[j] = H(i-1, j-1)   (the diagonal input for column j)
  e[j] = E(i, j)
and the shift h[j] <- h_new[j-1] is a lane roll.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 29)
LT = 512  # pairs per grid step


# NB: all scalar constants inside the kernel must be explicit int32 —
# with jax_enable_x64 on, bare python ints become int64 scalars, which
# Mosaic cannot lower.
Z = None  # set in kernel scope


def _c(v):
    return jnp.asarray(v, jnp.int32)


def _roll32(x, amount):
    """Lane-axis roll; Mosaic only implements rotates on 32-bit data,
    so sub-32-bit inputs round-trip through int32."""
    if x.dtype.itemsize < 4:
        return pltpu.roll(x.astype(jnp.int32), amount, 1).astype(x.dtype)
    return pltpu.roll(x, amount, 1)


def _row_shift_right(x, fill):
    """x[:, j] -> x[:, j-1] with column 0 = fill (lane-axis shift).

    The sub-32-bit branch below is DEFENSIVE-ONLY: since the
    storage-only int16 rework both call sites pass int32 values, so it
    is never exercised.  It is kept because it encodes a real Mosaic
    constraint for any future sub-32-bit caller: an i1 mask from an
    int32 comparison carries the (8,128)-tiled layout, which Mosaic
    cannot relayout onto (16,128)-tiled int16 operands (jax 0.9.0
    "Invalid relayout ... replicated in destination but not in
    source"), so the select must run in int32."""
    if x.dtype.itemsize < 4:
        rolled = pltpu.roll(x.astype(jnp.int32), _c(1), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        if not hasattr(fill, "shape"):
            fill = jnp.asarray(fill, jnp.int32)
        else:
            fill = fill.astype(jnp.int32)
        return jnp.where(col == _c(0), fill, rolled).astype(x.dtype)
    rolled = _roll32(x, _c(1))
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if not hasattr(fill, "shape"):
        fill = jnp.asarray(fill, x.dtype)
    return jnp.where(col == _c(0), fill, rolled)


def _prefix_max(x, neg):
    """Inclusive prefix max along axis 1 (log-shift scan).  The column
    iota is compared in x's dtype so the select mask shares x's Mosaic
    vector layout (see _row_shift_right)."""
    n = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1).astype(x.dtype)
    s = 1
    negc = jnp.asarray(neg, x.dtype)
    while s < n:
        shifted = _roll32(x, _c(s))
        x = jnp.maximum(x, jnp.where(col >= jnp.asarray(s, x.dtype),
                                     shifted, negc))
        s <<= 1
    return x


def _kernel(o_del, e_del, o_ins, e_ins, zdrop, Q, T, sdt,
            mat_ref, q_ref, qlen_ref, t_ref, tlen_ref, h0_ref, w_ref,
            out_ref, hb_ref, eb_ref, st_ref):
    i32 = jnp.int32
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    # DP-state dtype: int16 halves the VMEM H/E-row traffic when the
    # runner has proven no stored value can leave [-2^15, 2^15) — the
    # TPU analogue of the reference's 8-bit/16-bit kernel class split
    # (mapping/bandedSWA.cpp:116 smithWaterman256_8 vs _16).  STORAGE
    # only: the v5e VPU has no 16-bit ALU (measured 2026-08-20: i16
    # compare/maxsi/multiply all fail to legalize in Mosaic), so rows
    # extend to int32 on load and truncate on store, and every
    # computation and mask below is identical to the int32 path —
    # state16 changes no numerics, only the scratch layout.
    neg_s = NEG

    def _s(v):
        return jnp.asarray(v, i32)

    qlens = qlen_ref[:].astype(i32)        # (LT, 1)
    tlens = tlen_ref[:].astype(i32)
    h0s = h0_ref[:].astype(i32)
    w = w_ref[:].astype(i32)               # per-pair clamped band width

    col = jax.lax.broadcasted_iota(i32, (LT, Q), 1)

    # scoring follows the bwa_fill_scmat pattern (match a, mismatch -b,
    # ambiguous -1; bwa.c:135-144) — checked host-side by the runner
    qt = q_ref[:].astype(i32)              # (LT, Q)
    q_amb = qt > _c(3)
    sc_a = mat_ref[0, 0].astype(i32)
    sc_b = mat_ref[0, 1].astype(i32)
    sc_n = mat_ref[0, 4].astype(i32)

    # first-row state (ksw.c:395-397).  All loop state lives in VMEM
    # scratch refs; the while loop carries only the scalar row index
    # (Mosaic cannot legalize vector-valued while carries).
    v = h0s - _c(oe_ins) - (col - _c(1)) * _c(e_ins)
    h = jnp.where(col == _c(0), h0s, jnp.maximum(v, _c(0)))
    hb_ref[:] = jnp.where(col <= qlens, h, _c(0)).astype(sdt)
    eb_ref[:] = jnp.zeros((LT, Q), sdt)
    st_ref[:, 0:1] = jnp.zeros((LT, 1), i32)           # beg
    st_ref[:, 1:2] = qlens                             # end
    st_ref[:, 2:3] = h0s                               # best
    st_ref[:, 3:4] = jnp.full((LT, 1), -1, i32)        # max_i
    st_ref[:, 4:5] = jnp.full((LT, 1), -1, i32)        # max_j
    st_ref[:, 5:6] = jnp.full((LT, 1), -1, i32)        # max_ie
    st_ref[:, 6:7] = jnp.full((LT, 1), -1, i32)        # gscore
    st_ref[:, 7:8] = jnp.zeros((LT, 1), i32)           # max_off
    st_ref[:, 8:9] = jnp.zeros((LT, 1), i32)           # broken

    def row_step(i):
        h = hb_ref[:].astype(i32)        # ext on load (identity at i32)
        e = eb_ref[:].astype(i32)
        stv = st_ref[:]                    # (LT, 16), one read
        beg = stv[:, 0:1]
        end = stv[:, 1:2]
        best = stv[:, 2:3]
        max_i = stv[:, 3:4]
        max_j = stv[:, 4:5]
        max_ie = stv[:, 5:6]
        gscore = stv[:, 6:7]
        max_off = stv[:, 7:8]
        broken = stv[:, 8:9]
        active = (broken == _c(0)) & (i < tlens)
        beg_i = jnp.maximum(beg, i - w)
        end_i = jnp.minimum(jnp.minimum(end, i + w + _c(1)), qlens)
        empty = end_i <= beg_i
        h_first = jnp.where(
            beg_i == _c(0),
            jnp.maximum(h0s - (_c(o_del) + _c(e_del) * (i + _c(1))), _c(0)),
            _c(0)).astype(i32)

        # lane-dim dynamic slices must be 128-aligned: read the aligned
        # 128-column block containing i and select the column
        blk_start = pl.multiple_of((i >> 7) * _c(128), 128)
        blk = t_ref[:, pl.ds(blk_start, 128)].astype(i32)     # (LT, 128)
        bcol = jax.lax.broadcasted_iota(i32, (LT, 128), 1)
        tchar = jnp.max(jnp.where(bcol == (i & _c(127)), blk, _c(-1)),
                        axis=1, keepdims=True)                # (LT, 1)
        score = jnp.where(q_amb | (tchar > _c(3)), sc_n,
                          jnp.where(qt == tchar, sc_a, sc_b))

        inb = (col >= beg_i) & (col < end_i)
        M = jnp.where(h != _s(0), h + score, _s(0))
        e_new = jnp.maximum(e - _s(e_del), jnp.maximum(M - _s(oe_del), _s(0)))
        t_ins = jnp.maximum(M - _s(oe_ins), _s(0))

        # F entering column j: prefix max over the shifted t_ins with a
        # zero source at column beg (ksw's sequential F recurrence)
        t_shift = _row_shift_right(jnp.where(inb, t_ins, _s(neg_s)), neg_s)
        t_src = jnp.where(col == beg_i, _s(0), t_shift)
        run = _prefix_max(t_src + col * _s(e_ins), neg_s)
        f = run - col * _s(e_ins)

        h_new = jnp.maximum(jnp.maximum(M, e), f)

        # row max and its LAST attaining column (ksw.c:437-438)
        h_band = jnp.where(inb, h_new, _c(0))
        m = jnp.max(h_band, axis=1, keepdims=True)
        mj = jnp.max(jnp.where((h_band == m) & inb, col, _c(-1)), axis=1,
                     keepdims=True)
        mj = jnp.where(m == _c(0), _c(-1), mj)

        # state update (width Q; entry `end` of the eh layout is virtual)
        h_sh = _row_shift_right(h_new, 0)
        h_out = jnp.where(col == beg_i, h_first,
                          jnp.where((col > beg_i) & (col <= end_i), h_sh, h))
        e_out = jnp.where(inb, e_new,
                          jnp.where(col == end_i, _s(0), e))
        h_out = jnp.where(active, h_out, h)
        e_out = jnp.where(active, e_out, e)

        # to-query-end score (ksw.c:450-453)
        h1_last = jnp.where(
            empty, h_first,
            jnp.max(jnp.where(col == end_i - _c(1), h_new, _c(neg_s)),
                    axis=1, keepdims=True))
        at_qend = active & (end_i == qlens)
        upd_g = at_qend & (gscore <= h1_last)
        max_ie = jnp.where(upd_g, i, max_ie)
        gscore = jnp.where(at_qend, jnp.maximum(gscore, h1_last), gscore)

        # break / best / z-drop (ksw.c:454-463)
        brk0 = m == _c(0)
        better = m > best
        best_n = jnp.where(active & better, m, best)
        max_i_n = jnp.where(active & better, i, max_i)
        max_j_n = jnp.where(active & better, mj, max_j)
        max_off_n = jnp.where(active & better,
                              jnp.maximum(max_off, jnp.abs(mj - i)), max_off)
        di = i - max_i
        dj = mj - max_j
        zd_del = best - m - (di - dj) * _c(e_del) > _c(zdrop)
        zd_ins = best - m - (dj - di) * _c(e_ins) > _c(zdrop)
        delish = di > dj
        zd = (delish & zd_del) | ((~delish) & zd_ins)
        brk = brk0 | ((~better) & (zdrop > 0) & zd)
        broken_n = jnp.where(active & brk, _c(1), broken)

        # band shrink to the non-zero span (ksw.c:465-469); the virtual
        # entry at column end_i has h = h1_last, e = 0
        nz = (h_out != _c(0)) | (e_out != _c(0))
        c1 = nz & (col >= beg_i) & (col < end_i)
        beg_new = jnp.min(jnp.where(c1, col, end_i), axis=1, keepdims=True)
        c2 = nz & (col >= beg_new) & (col <= end_i)
        last = jnp.max(jnp.where(c2, col, beg_new - _c(1)), axis=1,
                       keepdims=True)
        last = jnp.where((h1_last != _c(0)) & (end_i >= beg_new),
                         jnp.maximum(last, end_i), last)
        end_new = jnp.minimum(last + _c(2), qlens)
        keep = active & ~brk
        beg_o = jnp.where(keep, beg_new, beg)
        end_o = jnp.where(keep, end_new, end)

        hb_ref[:] = h_out.astype(sdt)    # trunc on store (identity at i32)
        eb_ref[:] = e_out.astype(sdt)
        st_ref[:] = jnp.concatenate(
            [beg_o, end_o, best_n, max_i_n, max_j_n, max_ie, gscore,
             max_off_n, broken_n, jnp.zeros((LT, 7), i32)], axis=1)
        return i + _c(1)

    def cond(i):
        # scalar-typed reduction (a 0-d bool cannot be squeezed by Mosaic)
        live = jnp.where((st_ref[:, 8:9] == _c(0)) & (i < tlens),
                         _c(1), _c(0))
        return jnp.max(live) > _c(0)

    jax.lax.while_loop(cond, row_step, jnp.asarray(0, i32))

    out = jnp.concatenate(
        [st_ref[:, 2:3], st_ref[:, 4:5] + _c(1), st_ref[:, 3:4] + _c(1),
         st_ref[:, 5:6] + _c(1), st_ref[:, 6:7], st_ref[:, 7:8],
         jnp.zeros((LT, 2), i32)], axis=1)
    out_ref[:] = out


def _call_kernel(mat25, queries, qlens, targets, tlens, h0s, ws,
                 o_del, e_del, o_ins, e_ins, zdrop, interpret=False,
                 state16=False):
    P, Q = queries.shape
    T = targets.shape[1]
    grid = P // LT
    sdt = jnp.int16 if state16 else jnp.int32
    kern = functools.partial(_kernel, o_del, e_del, o_ins, e_ins, zdrop,
                             Q, T, sdt)
    # index maps must return int32 — with x64 on, a bare python 0 traces
    # as int64, which Mosaic cannot legalize in the index function
    z32 = np.int32(0)
    lane_spec = lambda width, space: pl.BlockSpec(
        (LT, width), lambda g: (g, z32), memory_space=space)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 25), lambda g: (z32, z32),
                         memory_space=pltpu.SMEM),
            lane_spec(Q, pltpu.VMEM),
            lane_spec(1, pltpu.VMEM),
            lane_spec(T, pltpu.VMEM),
            lane_spec(1, pltpu.VMEM),
            lane_spec(1, pltpu.VMEM),
            lane_spec(1, pltpu.VMEM),
        ],
        out_specs=lane_spec(8, pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 8), jnp.int32),
        scratch_shapes=[pltpu.VMEM((LT, Q), sdt),
                        pltpu.VMEM((LT, Q), sdt),
                        pltpu.VMEM((LT, 16), jnp.int32)],
        interpret=interpret,
    )(mat25, queries, qlens, targets, tlens, h0s, ws)


@functools.partial(jax.jit,
                   static_argnames=("o_del", "e_del", "o_ins", "e_ins",
                                    "zdrop", "interpret", "state16"))
def bsw_extend_tiles(mat25: jax.Array,     # (1, 25) int32
                     queries: jax.Array,   # (P, Q) int8
                     qlens: jax.Array,     # (P, 1) int32
                     targets: jax.Array,   # (P, T) int8
                     tlens: jax.Array,     # (P, 1) int32
                     h0s: jax.Array,       # (P, 1) int32
                     ws: jax.Array,        # (P, 1) int32 clamped band
                     *, o_del: int, e_del: int, o_ins: int, e_ins: int,
                     zdrop: int, interpret: bool = False,
                     state16: bool = False) -> jax.Array:
    return _call_kernel(mat25, queries, qlens, targets, tlens, h0s, ws,
                        o_del, e_del, o_ins, e_ins, zdrop, interpret,
                        state16)


def build_tiles_ref(qflat, pac, qmeta, r0, rlen, *, Q: int, T: int,
                    L: int, l_pac: int):
    """Per-element reference formulation of the tile build (one gather
    per tile CELL) — kept as the differential oracle for build_tiles.
    Semantics: queries out of the chunk's read matrix, targets out of
    the packed reference with the forward/reverse fold pf = gp < l_pac
    ? gp : 2*l_pac-1-gp and complement on the mirrored side; rev pairs
    consume positions downward (the reference's reversed-copy left
    extension, comp_seed.cpp:630-637)."""
    i32 = jnp.int32
    rid = qmeta[:, 0]
    q0 = qmeta[:, 1]
    ql = qmeta[:, 2]
    rev = qmeta[:, 3]
    sign = jnp.where(rev == 1, -1, 1).astype(i32)
    j = jnp.arange(Q, dtype=i32)
    qpos = q0[:, None] + sign[:, None] * j[None, :]
    flat = rid[:, None] * L + qpos
    inq = j[None, :] < ql[:, None]
    qt = jnp.where(
        inq, qflat[jnp.clip(flat, 0, qflat.shape[0] - 1)], 4)
    j2 = jnp.arange(T, dtype=i32)
    gp = r0[:, None] + (sign[:, None] * j2[None, :]).astype(r0.dtype)
    fwd = gp < l_pac
    pf = jnp.where(fwd, gp, 2 * l_pac - 1 - gp)
    from compseed_tpu.ops.device_index import pac_codes_at
    tv = pac_codes_at(pac, pf).astype(i32)
    tv = jnp.where(fwd, tv, 3 - tv)
    tt = jnp.where(j2[None, :] < rlen[:, None], tv, 4)
    return qt.astype(jnp.int8), ql, tt.astype(jnp.int8)


_SH_ASC = np.array([8 * (t >> 2) + 2 * (3 - (t & 3))
                    for t in range(16)], np.uint32)


def _pac_run(pac, start, d, K: int, T: int, n_words: int):
    """Decode T reference codes per lane along the affine position run
    pf(j) = start + d*j (d: per-lane +/-1) from the 2-bit packed pac
    words, with K word gathers per lane instead of T element gathers
    (flat 1D gathers run ~50 M elem/s on this platform; the tile build
    was the engine's dominant cost at one gather per DP CELL).

    Words are gathered along the run direction; each unpacks to 16
    codes in j-order (reversed within-word for descending lanes),
    giving a (P, 16*K) code strip whose lane offset is start & 15 (or
    its mirror); a 16-way static-shift select aligns j = 0.  Exact for
    any start (out-of-range words clip; callers mask the elements)."""
    i32 = jnp.int32
    k = jnp.arange(K, dtype=i32)[None, :]
    w0 = (start >> 4).astype(i32)[:, None]
    widx = jnp.clip(w0 + d[:, None] * k, 0, n_words - 1)
    words = pac[widx]                                    # (P, K) u32
    pos = d[:, None] == 1
    asc = ((words[:, :, None] >> _SH_ASC[None, None, :])
           & np.uint32(3)).astype(jnp.int8)              # (P, K, 16)
    strip = jnp.where(pos[:, :, None], asc, asc[:, :, ::-1]) \
        .reshape(words.shape[0], 16 * K)
    off = jnp.where(pos[:, 0], (start & 15).astype(i32),
                    15 - (start & 15).astype(i32))
    out = jnp.zeros((words.shape[0], T), jnp.int8)
    for o in range(16):
        out = jnp.where((off == o)[:, None], strip[:, o:o + T], out)
    return out


def build_tiles(qflat, pac, qmeta, r0, rlen, *, Q: int, T: int, L: int,
                l_pac: int):
    """Packed-word tile build — bit-exact twin of build_tiles_ref
    (differential test test_build_tiles_packed) at ~6x fewer gathered
    elements: queries gather 3-bit 8-char window words (one word per 8
    cells, from packed_windows / packed_rev_windows of the read
    matrix), targets gather 2-bit pac words along BOTH fold branches
    (pf is piecewise-affine with one knee at the strand mirror; each
    branch is one affine word run, elements select their branch by
    gp < l_pac).  Returns (qt, ql, tt) with qt (P, Q) / tt (P, T)
    int8."""
    from compseed_tpu.ops.seedscan import (packed_rev_windows,
                                           packed_windows)
    i32 = jnp.int32
    rid = qmeta[:, 0]
    q0 = qmeta[:, 1]
    ql = qmeta[:, 2]
    rev = qmeta[:, 3]
    sign = jnp.where(rev == 1, -1, 1).astype(i32)
    P = rid.shape[0]

    # ---- queries: one 8-char window word per 8 cells.  Forward lanes
    # read packed_windows (chars p..p+7), reverse lanes read
    # packed_rev_windows (chars p..p-7); the window START q0 +/- 8k is
    # exact, so no cross-word alignment select is needed.
    qarr = qflat.reshape(-1, L)
    fw = packed_windows(qarr, 8)                 # (R*(L+2),) u32
    bw = packed_rev_windows(qarr)                # (R*L,) u32
    qcat = jnp.concatenate([fw, bw])
    KQ = (Q + 7) // 8
    kq = jnp.arange(KQ, dtype=i32)[None, :]
    wposf = jnp.clip(q0[:, None] + 8 * kq, 0, L + 1)
    wposr = jnp.clip(q0[:, None] - 8 * kq, 0, L - 1)
    addr = jnp.where((rev == 1)[:, None],
                     fw.shape[0] + rid[:, None] * L + wposr,
                     rid[:, None] * (L + 2) + wposf)
    wq = qcat[jnp.clip(addr, 0, qcat.shape[0] - 1)]      # (P, KQ)
    qsh = np.array([3 * t for t in range(8)], np.uint32)
    qdec = ((wq[:, :, None] >> qsh[None, None, :])
            & np.uint32(7)).astype(jnp.int8)             # (P, KQ, 8)
    qt = qdec.reshape(P, 8 * KQ)[:, :Q]
    j = jnp.arange(Q, dtype=i32)
    inq = j[None, :] < ql[:, None]
    qt = jnp.where(inq, qt, jnp.int8(4))

    # ---- targets: both fold branches as affine word runs with
    # per-lane direction (pf has one knee at the strand mirror; each
    # element selects its branch by gp < l_pac)
    KT = T // 16 + 2
    n_words = pac.shape[0]
    mir = ((2 * l_pac - 1) - r0).astype(r0.dtype)
    A = _pac_run(pac, r0, sign, KT, T, n_words)
    B = _pac_run(pac, mir, -sign, KT, T, n_words)
    j2 = jnp.arange(T, dtype=i32)
    gp = r0[:, None] + (sign[:, None] * j2[None, :]).astype(r0.dtype)
    fwd = gp < l_pac
    tv = jnp.where(fwd, A, (3 - B).astype(jnp.int8))
    tt = jnp.where(j2[None, :] < rlen[:, None], tv, jnp.int8(4))
    return qt, ql, tt


@functools.partial(jax.jit,
                   static_argnames=("Q", "T", "L", "l_pac", "o_del",
                                    "e_del", "o_ins", "e_ins", "zdrop",
                                    "interpret", "state16"))
def bsw_meta_tiles(mat25, qflat, pac,      # device read matrix + reference
                   qmeta,                  # (P, 4) i32: rid, q0, qlen, rev
                   r0,                     # (P,) index dtype
                   rlen,                   # (P,) i32
                   h0s, ws,                # (P, 1) i32
                   *, Q: int, T: int, L: int, l_pac: int,
                   o_del: int, e_del: int, o_ins: int, e_ins: int,
                   zdrop: int, interpret: bool = False,
                   state16: bool = False) -> jax.Array:
    """Build the DP tiles on device from pair metadata and run the
    Pallas kernel; only ~28 B of metadata per pair crosses the host
    link."""
    i32 = jnp.int32
    qt, ql, tt = build_tiles(qflat, pac, qmeta, r0, rlen,
                             Q=Q, T=T, L=L, l_pac=l_pac)
    return _call_kernel(
        mat25, qt, ql[:, None].astype(i32),
        tt, rlen[:, None].astype(i32), h0s, ws,
        o_del, e_del, o_ins, e_ins, zdrop, interpret=interpret,
        state16=state16)


def clamp_band(qlens: np.ndarray, w: int, max_sc: int, end_bonus: int,
               o_del: int, e_del: int, o_ins: int, e_ins: int) -> np.ndarray:
    """Per-pair band clamp (ksw.c:398-407; C truncates from double)."""
    q = qlens.astype(np.float64)
    max_ins = np.maximum(((q * max_sc + end_bonus - o_ins) / e_ins
                          + 1.0).astype(np.int32), 1)
    max_del = np.maximum(((q * max_sc + end_bonus - o_del) / e_del
                          + 1.0).astype(np.int32), 1)
    return np.minimum(np.minimum(np.int32(w), max_ins), max_del)
