"""Device-resident compressive seeding (v2): dense worklists, no lockstep
padding, device-side SMEM reconstruction.

The reference's per-read recursion (collect_mem_with_sst,
mapping/comp_seed.cpp:67-139) serializes a forward LEP sweep and a
backward-shrink loop over a pointer trie.  The TPU decomposition here:

  1. ``scan_collect`` — one forward pass per read (vmapped, one
     bwt_extend per step) that walks pivots in sequence and records every
     LEP interval into a per-read buffer.  Because round-1 pivot advance
     depends only on the forward sweep (ret = forward stop position,
     comp_seed.cpp:92-97), all pivots of a read are discovered in a
     single scan.
  2. Backward shrink is re-derived as INDEPENDENT single-interval walks:
     within one pivot's LEP list (ascending interval size), intervals are
     nested, so survival is monotone — if entry j survives a step, j+1
     does too.  Hence each LEP can walk backward alone (one bwt_extend
     per step), and the reference's emission rule reduces to: emit entry
     j iff its death position is strictly below all earlier deaths, with
     beg = death+1 (equal deaths reproduce the first-slot-only emission
     and the equal-size dedup of comp_seed.cpp:114-137 exactly; the
     pivot==0 fast path falls out as death == -1 on every entry).
     Walks run as a dense flat worklist over the whole chunk with staged
     compaction (argsort live lanes to the front, slice, continue), so
     short walks — the vast majority — cost no lockstep padding.
  3. Reconstruction (emit flags, round-2 task extraction) is neighbor
     logic over the pool in (read, push-order) layout — pure VPU ops.

Everything stays on device; the host only receives the final compact
match/seed arrays.  Overflow of any static cap raises a flag and the
caller falls back to the exact host oracle for the affected reads.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from compseed_tpu.ops import fm as dfm
from compseed_tpu.ops.device_index import DeviceFMIndex

CAPL = 96       # LEP rows per read (round 1, all pivots)
CAPL2 = 32      # LEP rows per round-2 task


def _set_intv(fm: DeviceFMIndex, c):
    dt = fm.dtype
    L2 = fm.L2
    c = c.astype(jnp.int32)
    return jnp.stack([L2[c] + 1, L2[3 - c] + 1, L2[c + 1] - L2[c]]).astype(dt)


# ----------------------------------------------------------------------
# forward collect scan
# ----------------------------------------------------------------------

def _scan_one(fm: DeviceFMIndex, L: int, capl: int, advance: bool,
              q, rlen, pivot0, min_hits, active):
    """One read's forward pass; returns (lep (capl,5), cnt, ovf).

    lep rows: k, l, s, end, pivot.  Push order (descending interval
    size within each pivot group).  With ``advance`` the scan continues
    to the next pivot after each stop (round 1); otherwise it finishes
    after the first collect (round 2 task).
    """
    dt = fm.dtype
    i32 = jnp.int32
    rlen = rlen.astype(i32)
    min_hits = jnp.maximum(min_hits.astype(dt), 1)

    st = dict(
        pivot=pivot0.astype(i32),
        i=jnp.asarray(0, i32),
        phase=jnp.asarray(0, i32),           # 0 = start pivot, 1 = sweep
        ik=jnp.zeros(3, dt),
        end=jnp.asarray(0, i32),
        lep=jnp.zeros((capl, 5), dt),
        cnt=jnp.asarray(0, i32),
        ovf=jnp.asarray(False),
        done=~active,
    )

    def body(st):
        # ---- phase 0: start a new pivot
        start = (st["phase"] == 0) & ~st["done"]
        pv = st["pivot"]
        done = st["done"] | (start & (pv >= rlen))
        do_start = start & (pv < rlen)
        base0 = q[jnp.clip(pv, 0, L - 1)].astype(i32)
        bad = base0 > 3
        pivot = jnp.where(do_start & bad, pv + 1, pv)
        started = do_start & ~bad
        ik = jnp.where(started, _set_intv(fm, jnp.clip(base0, 0, 3)),
                       st["ik"])
        end = jnp.where(started, pv + 1, st["end"])
        i = jnp.where(started, pv + 1, st["i"])
        phase = jnp.where(started, 1, st["phase"])

        # ---- phase 1: one forward step (comp_seed.cpp:76-97); positions
        # past the read end behave as an ambiguous base, which pushes and
        # stops exactly like the i == len exit of the reference
        sweep = (phase == 1) & ~done
        base = jnp.where(i < rlen, q[jnp.clip(i, 0, L - 1)].astype(i32), 4)
        amb = base > 3
        c = 3 - jnp.clip(base, 0, 3)
        ok = dfm.extend_batch(fm, ik, is_back=False)       # (4, 3)
        okc = ok[c]
        changed = okc[2] != ik[2]
        small = okc[2] < min_hits
        push = sweep & (amb | changed)
        stop = sweep & (amb | (changed & small))
        cont = sweep & ~stop & ~amb

        slot = jnp.minimum(st["cnt"], capl - 1)
        row = jnp.concatenate([ik, jnp.stack([
            end.astype(dt), pivot.astype(dt)])])
        lep = jnp.where(push, st["lep"].at[slot].set(row), st["lep"])
        ovf = st["ovf"] | (push & (st["cnt"] >= capl))
        cnt = st["cnt"] + (push & (st["cnt"] < capl)).astype(i32)

        npv = jnp.where(amb, i + 1, i)
        if advance:
            pivot = jnp.where(stop, npv, pivot)
            phase = jnp.where(stop, 0, phase)
        else:
            done = done | stop
        ik = jnp.where(cont, okc.astype(dt), ik)
        end = jnp.where(cont, i + 1, end)
        i = jnp.where(cont, i + 1, i)
        return dict(pivot=pivot, i=i, phase=phase, ik=ik, end=end, lep=lep,
                    cnt=cnt, ovf=ovf, done=done)

    # segmented while (see walk_stage): the all-done check only every
    # 8 fully-masked steps
    def seg(st):
        return jax.lax.fori_loop(0, 8, lambda _, x: body(x), st)

    st = jax.lax.while_loop(lambda s: ~s["done"], seg, st)
    return (st["lep"].reshape(-1),
            st["cnt"].astype(dt), st["ovf"].astype(dt))


def make_scan(fm: DeviceFMIndex, L: int, capl: int, advance: bool):
    f = jax.vmap(partial(_scan_one, fm, L, capl, advance),
                 in_axes=(0, 0, 0, 0, 0))

    def run(qarr, rlens, pivots, min_hits, active):
        lep, cnt, ovf = f(qarr, rlens, pivots, min_hits, active)
        R = qarr.shape[0]
        return lep.reshape(R, capl, 5), cnt, ovf

    return run


# ----------------------------------------------------------------------
# backward walks (dense worklist, staged compaction)
# ----------------------------------------------------------------------

def walk_stage(fm: DeviceFMIndex, qflat, L: int, max_steps: int, state):
    """Advance every live item by up to max_steps backward extensions.

    state: dict of arrays over M lanes:
      k, l, s (dt); rid, i, death (i32); mh (dt, min_hits);
      alive (bool); slot (i32, original pool index; -1 = padding)
    """
    dt = fm.dtype
    i32 = jnp.int32

    def body(carry):
        t, st = carry
        alive = st["alive"]
        i = st["i"]
        base = jnp.where(
            i >= 0,
            qflat[jnp.clip(st["rid"] * L + i, 0, qflat.shape[0] - 1)]
            .astype(i32),
            4)
        c = jnp.clip(base, 0, 3)
        ik = jnp.stack([st["k"], st["l"], st["s"]], axis=-1)      # (M, 3)
        ok = dfm.extend_batch(fm, ik, is_back=True)               # (M, 4, 3)
        okc = jnp.take_along_axis(
            ok, c[:, None, None].astype(i32), axis=1)[:, 0, :]    # (M, 3)
        survive = alive & (base < 4) & (okc[:, 2] >= st["mh"])
        die = alive & ~survive
        st = dict(st)
        st["death"] = jnp.where(die, i, st["death"])
        st["alive"] = survive
        st["k"] = jnp.where(survive, okc[:, 0], st["k"])
        st["l"] = jnp.where(survive, okc[:, 1], st["l"])
        st["s"] = jnp.where(survive, okc[:, 2], st["s"])
        st["i"] = jnp.where(survive, i - 1, i)
        return t + 1, st

    # segmented loop: the while condition's any() reduction costs ~50 ms
    # of launch overhead per iteration on this platform, so check it only
    # every SEG masked steps
    SEG = 8

    def seg_body(carry):
        t, st = carry
        def inner(_, c):
            return body(c)
        return jax.lax.fori_loop(0, SEG, inner, (t, st))

    def cond(carry):
        t, st = carry
        return (t < max_steps) & jnp.any(st["alive"])

    _, st = jax.lax.while_loop(cond, seg_body,
                               (jnp.asarray(0, i32), state))
    return st


def compact_state(state, new_size: int):
    """Sort live lanes to the front (stable) and slice to new_size.

    Returns (sliced live state, finished-results state of the old size,
    ovf flag).  Finished lanes keep their results in the returned 'done'
    copy; live lanes beyond new_size raise ovf.
    """
    alive = state["alive"]
    order = jnp.argsort(~alive, stable=True)
    n_alive = jnp.sum(alive.astype(jnp.int32))
    ovf = n_alive > new_size
    live = {k: v[order][:new_size] for k, v in state.items()}
    return live, ovf


def init_walk_state(dt, M: int):
    i32 = jnp.int32
    return dict(
        k=jnp.zeros(M, dt), l=jnp.zeros(M, dt), s=jnp.zeros(M, dt),
        rid=jnp.zeros(M, i32), i=jnp.full(M, -1, i32),
        death=jnp.full(M, -1, i32), mh=jnp.ones(M, dt),
        alive=jnp.zeros(M, jnp.bool_), slot=jnp.full(M, -1, i32),
    )


# ----------------------------------------------------------------------
# pool building / reconstruction / merge / sampling (device-resident)
# ----------------------------------------------------------------------

def build_pool(lep, cnt, GP: int):
    """Flatten per-read LEP buffers into a dense global pool.

    lep: (R, capl, 5) rows (k,l,s,end,pivot); cnt: (R,).
    Returns pool (GP, 7): k,l,s,end,pivot,rid,valid — stable-compacted so
    valid rows keep (read, push) order; plus n_valid and overflow flag.
    """
    R, capl, _ = lep.shape
    dt = lep.dtype
    slot = jnp.arange(capl, dtype=jnp.int32)[None, :]
    valid = slot < cnt[:, None].astype(jnp.int32)            # (R, capl)
    rid = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None],
                           (R, capl))
    flat = lep.reshape(R * capl, 5)
    vflat = valid.reshape(-1)
    rflat = rid.reshape(-1)
    order = jnp.argsort(~vflat, stable=True)
    n = jnp.sum(vflat.astype(jnp.int32))
    ovf = n > GP
    take = order[:GP]
    pool = jnp.concatenate([
        flat[take],
        rflat[take][:, None].astype(dt),
        vflat[take][:, None].astype(dt)], axis=1)
    return pool, n, ovf


def walk_pool(fm: DeviceFMIndex, qflat, L: int, pool, stages, mh=None):
    """Run the staged backward walks for every valid pool row.

    pool: (GP, 7) as from build_pool; rows with pivot == 0 die on their
    first step (i0 == -1) which reproduces the pivot==0 fast path.
    stages: list of (lane_cap, max_steps); lane caps decrease.
    mh: per-row min_hits (GP,) — 1 (round 1) if omitted.
    Returns (death (GP,) i32, fk, fl, fs (GP,) dt, ovf).
    """
    dt = fm.dtype
    i32 = jnp.int32
    GP = pool.shape[0]
    valid = pool[:, 6] != 0
    if mh is None:
        mh = jnp.ones(GP, dt)

    state = dict(
        k=pool[:, 0], l=pool[:, 1], s=pool[:, 2],
        rid=pool[:, 5].astype(i32),
        i=pool[:, 4].astype(i32) - 1,                  # pivot - 1
        death=jnp.full(GP, -(2), i32),                 # sentinel
        mh=jnp.maximum(mh.astype(dt), 1),
        alive=valid,
        slot=jnp.where(valid, jnp.arange(GP, dtype=i32), -1),
    )

    death = jnp.full(GP, -2, i32)
    fk = pool[:, 0]
    fl = pool[:, 1]
    fs = pool[:, 2]
    ovf = jnp.asarray(False)

    for idx, (cap, steps) in enumerate(stages):
        if idx > 0:
            state, o = compact_state(state, cap)
            ovf = ovf | o
        state = walk_stage(fm, qflat, L, steps, state)
        finished = (~state["alive"]) & (state["slot"] >= 0)
        sl = jnp.where(finished, state["slot"], GP)
        death = death.at[sl].set(
            jnp.where(finished, state["death"], 0), mode="drop")
        fk = fk.at[sl].set(jnp.where(finished, state["k"], 0), mode="drop")
        fl = fl.at[sl].set(jnp.where(finished, state["l"], 0), mode="drop")
        fs = fs.at[sl].set(jnp.where(finished, state["s"], 0), mode="drop")
        # finished lanes must not scatter again in later stages
        state["slot"] = jnp.where(finished, -1, state["slot"])
    ovf = ovf | jnp.any(state["alive"])
    return death, fk, fl, fs, ovf


def reconstruct(pool, death, fk, fl, fs, min_seed_len: int, group_cols):
    """Emission flags + SMEM rows from walked pool rows.

    Within a (group) run of rows (push order), entry sizes DEcrease with
    push index p, so ascending-size order is reversed push order and
    deaths are non-decreasing in p.  The reference's first-slot emission
    + equal-size dedup (comp_seed.cpp:114-137) reduces to:
        emit(p)  <=>  last row of group  OR  death[p] < death[p+1]
    with beg = death+1, end = row end, interval = walked final state.
    group_cols: columns of pool identifying the group (e.g. rid+pivot).
    Returns (emit, rid, k, l, s, beg, end) all (GP,).
    """
    GP = pool.shape[0]
    valid = pool[:, 6] != 0
    gid = [pool[:, c] for c in group_cols]
    nxt_same = valid & jnp.concatenate([
        (jnp.stack([g[1:] == g[:-1] for g in gid]).all(axis=0) &
         (pool[1:, 6] != 0)), jnp.asarray([False])])
    is_last = valid & ~nxt_same
    death_next = jnp.concatenate([death[1:], jnp.asarray([-2], death.dtype)])
    emit = valid & (is_last | (death < death_next))
    beg = death + 1
    end = pool[:, 3].astype(jnp.int32)
    ok = emit & ((end - beg) >= min_seed_len) & (fs > 0)
    return ok, pool[:, 5].astype(jnp.int32), fk, fl, fs, beg, end


# ----------------------------------------------------------------------
# cross-read walk deduplication (the SST's compressive reuse)
# ----------------------------------------------------------------------

def prefix_hashes(qarr):
    """(R, L) uint8 -> (R, L) uint64 rolling hashes; H[:, i] covers
    q[:, :i+1].  A backward walk from position i consumes exactly the
    read prefix below its pivot, so (interval k, size s, pivot,
    prefix-hash) identifies a walk's full outcome across the batch —
    the cross-read state sharing the reference gets from its SST trie
    (mapping/SST.h:60-92), here as a sort/unique over the worklist.

    The returned array is (R, L, 2): two independent 64-bit rolling
    hashes, giving a 128-bit effective key — wide enough that a silent
    collision (which would merge distinct walks and corrupt seeds) has
    negligible probability at any batch scale.
    """

    def comb(x, y):
        m1, a1 = x
        m2, a2 = y
        return m1 * m2, a1 * m2 + a2

    def one(base: int, salt: int):
        a = (qarr.astype(jnp.uint64) + jnp.uint64(salt))
        m = jnp.full(qarr.shape, jnp.uint64(base), jnp.uint64)
        _, h = jax.lax.associative_scan(comb, (m, a), axis=1)
        return h

    h1 = one(0x100000001B3, 1)               # FNV-ish odd multiplier
    h2 = one(0x9E3779B97F4A7C15, 5)          # golden-ratio odd multiplier
    return jnp.stack([h1, h2], axis=-1)


def dedup_pool(pool, ph, CAP_U: int, mh=None):
    """Group pool rows whose walks must be identical; compact one
    representative per group to the front.  mh (per-row min_hits) joins
    the key when walks use varying thresholds (round 2).

    Returns (rep_pool (CAP_U, 7), group (GP,) i32 mapping each row to its
    representative, n_unique, ovf).
    """
    i32 = jnp.int32
    GP = pool.shape[0]
    valid = pool[:, 6] != 0
    rid = pool[:, 5].astype(i32)
    piv = pool[:, 4].astype(i32)
    pcol = jnp.clip(piv - 1, 0, ph.shape[1] - 1)
    hrow = jnp.where(piv > 0, ph[rid, pcol, 0], jnp.uint64(0))
    hrow2 = jnp.where(piv > 0, ph[rid, pcol, 1], jnp.uint64(0))
    if mh is not None:
        hrow = hrow ^ (mh.astype(jnp.uint64) *
                       jnp.uint64(0x9E3779B97F4A7C15))
    big = jnp.iinfo(jnp.int64).max
    k_key = jnp.where(valid, pool[:, 0].astype(jnp.int64), big)
    s_key = jnp.where(valid, pool[:, 2].astype(jnp.int64), big)
    p_key = jnp.where(valid, piv.astype(jnp.int64), big)
    h_key = jnp.where(valid, hrow.astype(jnp.int64), big)
    h2_key = jnp.where(valid, hrow2.astype(jnp.int64), big)
    order = jnp.lexsort((p_key, s_key, k_key, h2_key, h_key))
    ks = [h_key[order], k_key[order], s_key[order], p_key[order],
          h2_key[order]]
    vs = valid[order]
    diff = jnp.concatenate([
        jnp.asarray([True]),
        (ks[0][1:] != ks[0][:-1]) | (ks[1][1:] != ks[1][:-1]) |
        (ks[2][1:] != ks[2][:-1]) | (ks[3][1:] != ks[3][:-1]) |
        (ks[4][1:] != ks[4][:-1])])
    head = vs & diff
    gidx_sorted = jnp.cumsum(head.astype(i32)) - 1     # group per sortpos
    n_u = jnp.sum(head.astype(i32))
    ovf = n_u > CAP_U
    order2 = jnp.argsort(~head, stable=True)
    rep_take = order[order2][:CAP_U]
    rep_pool = pool[rep_take]
    rep_valid = (jnp.arange(CAP_U, dtype=i32) < n_u)
    rep_pool = rep_pool.at[:, 6].set(rep_valid.astype(pool.dtype))
    sortpos = jnp.zeros(GP, i32).at[order].set(
        jnp.arange(GP, dtype=i32))
    group = jnp.clip(gidx_sorted[sortpos], 0, CAP_U - 1)
    return rep_pool, group, n_u, ovf, rep_take
