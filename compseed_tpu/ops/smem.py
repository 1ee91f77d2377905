"""Batched SMEM seeding on device.

The reference walks a per-thread pointer trie (SST, mapping/SST.h) to
memoize FM-index extensions across a batch of compressor-reordered reads.
On TPU the same three seeding rounds (mapping/comp_seed.cpp:2262-2301)
become fixed-shape scan programs vectorized over read lanes:

  round 1  collect_mem (comp_seed.cpp:67-139 == bwt_smem1a, bwt.c:289-351):
           forward sweep collecting LEP intervals, then a backward-shrink
           loop over the LEP frontier.  The frontier is kept compacted in
           ascending-interval-size order, which makes the reference's
           sequential list logic (first-failure emission, equal-size
           dedup) expressible as masked cummax/cumsum passes.
  round 2  re-seeding from SMEM midpoints with min_hits = occ + 1.
  round 3  greedy forward pass (tem_forward_sst, comp_seed.cpp:141-160)
           fused into ONE left-to-right scan per read (the reference
           restarts a scan after each hit; the restart state is carried
           in-lane instead).

Fixed caps (LEP frontier, SMEMs per call) are enforced with overflow
flags; overflowing reads fall back to the scalar oracle so results are
always exact.  All rounds share occ gathers through ops.fm.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from compseed_tpu.cpu import fm_oracle as fo
from compseed_tpu.ops import fm as dfm
from compseed_tpu.ops.device_index import DeviceFMIndex, to_device
from compseed_tpu.pipeline.seeding import SeedingStats
from compseed_tpu.pipeline.types import Seed

MLEP = 64    # LEP frontier cap (ample: pushes need distinct interval sizes)
MMEM = 64    # SMEMs per collect call
MMEM3 = 32   # round-3 seeds per read


def _set_intv(fm: DeviceFMIndex, c):
    dt = fm.cp_occ.dtype
    L2 = fm.L2
    c = c.astype(jnp.int32)
    return jnp.stack([L2[c] + 1, L2[3 - c] + 1, L2[c + 1] - L2[c]]).astype(dt)


def _collect_one(fm: DeviceFMIndex, L: int, q, pivot, min_hits, active):
    """Per-read collect_mem; vmapped over the batch by the caller.

    Returns (mems (MMEM,5), n_mems, ret_pivot, overflow).
    mems rows: k, l, s, beg, end — in emission order (descending beg).
    """
    dt = fm.cp_occ.dtype
    i32 = jnp.int32
    pivot = pivot.astype(i32)
    min_hits = jnp.maximum(min_hits.astype(dt), 1)

    first_base = q[jnp.clip(pivot, 0, L - 1)].astype(i32)
    bad_start = (first_base > 3) | ~active

    # ---------------- forward sweep (comp_seed.cpp:76-97)
    ik0 = _set_intv(fm, jnp.clip(first_base, 0, 3))

    fwd_init = dict(
        ik=ik0, end=pivot + 1, stopped=bad_start,
        ret=jnp.where(bad_start, pivot + 1, jnp.asarray(L, i32)),
        lep=jnp.zeros((MLEP, 3), dt), lep_end=jnp.zeros(MLEP, i32),
        cnt=jnp.asarray(0, i32), ovf=jnp.asarray(False),
        next_c=jnp.asarray(-1, i32),  # pending child when stopped at shrink
    )

    def fwd_step(t, st):
        i = pivot + 1 + t
        act = (~st["stopped"]) & (i < L)
        base = q[jnp.clip(i, 0, L - 1)].astype(i32)
        amb = base > 3
        c = 3 - jnp.clip(base, 0, 3)
        ok = dfm.extend_batch(fm, st["ik"], is_back=False)   # (4, 3)
        okc = ok[c]
        changed = okc[2] != st["ik"][2]
        too_small = okc[2] < min_hits
        push = act & (amb | changed)
        stop_amb = act & amb
        stop_small = act & ~amb & changed & too_small
        reach = act & ~amb & ~stop_small

        slot = jnp.minimum(st["cnt"], MLEP - 1)
        lep = jnp.where(push,
                        st["lep"].at[slot].set(st["ik"]), st["lep"])
        lep_end = jnp.where(push,
                            st["lep_end"].at[slot].set(st["end"]),
                            st["lep_end"])
        ovf = st["ovf"] | (push & (st["cnt"] >= MLEP))
        cnt = st["cnt"] + (push & (st["cnt"] < MLEP)).astype(i32)

        ik = jnp.where(reach, okc.astype(dt), st["ik"])
        end = jnp.where(reach, i + 1, st["end"])
        ret = jnp.where(stop_amb, i + 1,
                        jnp.where(stop_small, i, st["ret"]))
        stopped = st["stopped"] | stop_amb | stop_small
        return dict(ik=ik, end=end, stopped=stopped, ret=ret, lep=lep,
                    lep_end=lep_end, cnt=cnt, ovf=ovf, next_c=st["next_c"])

    st = jax.lax.fori_loop(0, L, fwd_step, fwd_init)

    # final push when the sweep reached the read end (comp_seed.cpp:97)
    reached_end = (~st["stopped"]) & ~bad_start
    slot = jnp.minimum(st["cnt"], MLEP - 1)
    lep = jnp.where(reached_end, st["lep"].at[slot].set(st["ik"]), st["lep"])
    lep_end = jnp.where(reached_end,
                        st["lep_end"].at[slot].set(st["end"]), st["lep_end"])
    ovf = st["ovf"] | (reached_end & (st["cnt"] >= MLEP))
    cnt = st["cnt"] + (reached_end & (st["cnt"] < MLEP)).astype(jnp.int32)
    ret = st["ret"]

    # reverse the LEP list so ascending interval sizes sit at 0..cnt-1
    idx = jnp.arange(MLEP, dtype=jnp.int32)
    src = jnp.clip(cnt - 1 - idx, 0, MLEP - 1)
    cur = lep[src]                       # (MLEP, 3)
    cur_end = lep_end[src]
    valid0 = idx < cnt

    # pivot == 0 fast path: only the longest match is an SMEM
    # (comp_seed.cpp:98-101)
    fast = (pivot == 0) & ~bad_start

    mems = jnp.zeros((MMEM, 5), dt)
    fast_row = jnp.concatenate([cur[0], jnp.asarray([0], dt),
                                cur_end[0].astype(dt)[None]])
    mems_fast = mems.at[0].set(fast_row)

    # ---------------- backward shrink (comp_seed.cpp:105-137)
    bwd_init = dict(
        cur=cur, cur_end=cur_end, n=jnp.where(valid0.any(), cnt, 0),
        mems=mems, n_mems=jnp.asarray(0, jnp.int32),
        last_beg=jnp.asarray(L + 2, jnp.int32),
        done=bad_start | fast, ovf=jnp.asarray(False),
    )

    def bwd_step(u, st):
        i = pivot - 1 - u
        act = (~st["done"]) & (i >= -1)
        base = jnp.where(i >= 0, q[jnp.clip(i, 0, L - 1)].astype(jnp.int32), 4)
        cvalid = base < 4
        c = jnp.clip(base, 0, 3)
        valid = idx < st["n"]
        ok = dfm.extend_batch(fm, st["cur"], is_back=True)  # (MLEP, 4, 3)
        okc = ok[:, c, :]                                    # (MLEP, 3)
        survive = valid & cvalid & (okc[:, 2] >= min_hits)
        # first slot fails -> emit its (old) interval as an SMEM
        fail0 = (st["n"] > 0) & ~(cvalid & (okc[0, 2] >= min_hits))
        emit = act & fail0 & ((st["n_mems"] == 0) |
                              (i + 1 < st["last_beg"]))
        mrow = jnp.concatenate([st["cur"][0],
                                jnp.asarray([i + 1], dt),
                                st["cur_end"][0].astype(dt)[None]])
        mslot = jnp.minimum(st["n_mems"], MMEM - 1)
        mems = jnp.where(emit, st["mems"].at[mslot].set(mrow), st["mems"])
        ovf = st["ovf"] | (emit & (st["n_mems"] >= MMEM))
        n_mems = st["n_mems"] + (emit & (st["n_mems"] < MMEM)).astype(jnp.int32)
        last_beg = jnp.where(emit, i + 1, st["last_beg"])

        # dedup equal sizes (keep first), sizes are non-decreasing
        s_ok = okc[:, 2]
        masked = jnp.where(survive, s_ok, -1)
        run = jax.lax.associative_scan(jnp.maximum, masked)
        excl = jnp.concatenate([jnp.asarray([-1], dt), run[:-1]])
        keep = survive & (masked > excl)
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        dest = jnp.where(keep, pos, MLEP)
        new_cur = jnp.zeros_like(st["cur"]).at[dest].set(okc, mode="drop")
        new_end = jnp.zeros_like(st["cur_end"]).at[dest].set(
            st["cur_end"], mode="drop")
        new_n = keep.sum().astype(jnp.int32)

        done = st["done"] | (act & (new_n == 0)) | (~act & ~st["done"])
        cur_out = jnp.where(act, new_cur, st["cur"])
        end_out = jnp.where(act, new_end, st["cur_end"])
        n_out = jnp.where(act, new_n, st["n"])
        return dict(cur=cur_out, cur_end=end_out, n=n_out, mems=mems,
                    n_mems=n_mems, last_beg=last_beg, done=done, ovf=ovf)

    bst = jax.lax.fori_loop(0, L + 1, bwd_step, bwd_init)

    mems_out = jnp.where(fast, mems_fast, bst["mems"])
    n_out = jnp.where(fast, 1, bst["n_mems"])
    n_out = jnp.where(bad_start, 0, n_out)
    overflow = ovf | bst["ovf"]
    return mems_out, n_out, ret, overflow


def _seed_strategy_one(fm: DeviceFMIndex, L: int, min_len: int,
                       max_intv: int, q, active):
    """Fused round-3 pass for one read (vmapped).

    Returns (mems (MMEM3,5), n, overflow); rows k,l,s,beg,end.
    The reference restarts bwt_seed_strategy1 after every hit/N
    (comp_seed.cpp:2290-2298); one scan carries the restart in-lane.
    """
    dt = fm.cp_occ.dtype
    i32 = jnp.int32

    init = dict(
        s0=jnp.asarray(0, i32),
        ik=jnp.zeros(3, dt),
        mems=jnp.zeros((MMEM3, 5), dt),
        n=jnp.asarray(0, i32),
        ovf=jnp.asarray(False),
    )

    def step(i, st):
        base = q[i].astype(i32)
        amb = base > 3
        at_start = i == st["s0"]
        inside = i > st["s0"]

        # restart cases
        ik_new = _set_intv(fm, jnp.clip(base, 0, 3))
        c = 3 - jnp.clip(base, 0, 3)
        ok = dfm.extend_batch(fm, st["ik"], is_back=False)
        okc = ok[c]
        hit = inside & ~amb & (okc[2] < max_intv) & \
            ((i - st["s0"]) >= min_len) & active
        mrow = jnp.concatenate([okc.astype(dt),
                                st["s0"].astype(dt)[None],
                                jnp.asarray(i + 1, dt)[None]])
        slot = jnp.minimum(st["n"], MMEM3 - 1)
        mems = jnp.where(hit, st["mems"].at[slot].set(mrow), st["mems"])
        ovf = st["ovf"] | (hit & (st["n"] >= MMEM3))
        n = st["n"] + (hit & (st["n"] < MMEM3)).astype(i32)

        s0 = jnp.where(amb | hit, i + 1, st["s0"])
        ik = jnp.where(at_start & ~amb, ik_new,
                       jnp.where(inside & ~amb & ~hit, okc.astype(dt),
                                 st["ik"]))
        return dict(s0=s0, ik=ik, mems=mems, n=n, ovf=ovf)

    st = jax.lax.fori_loop(0, L, step, init)
    return st["mems"], st["n"], st["ovf"]


class BatchSeeder:
    """Device-backed seeder with the pipeline.align seeder interface."""

    def __init__(self, opt, fm, dfi: DeviceFMIndex | None = None):
        self.opt = opt
        self.fm = fm
        self.dfi = dfi if dfi is not None else to_device(fm)
        self._collect_cache = {}
        self._round3_cache = {}
        self._sa_cache = {}

    def _collect_fn(self, L: int):
        if L not in self._collect_cache:
            f = jax.vmap(partial(_collect_one, self.dfi, L))
            self._collect_cache[L] = jax.jit(f)
        return self._collect_cache[L]

    def _round3_fn(self, L: int):
        key = (L, self.opt.min_seed_len, int(self.opt.max_mem_intv))
        if key not in self._round3_cache:
            f = jax.vmap(partial(_seed_strategy_one, self.dfi, L,
                                 self.opt.min_seed_len,
                                 int(self.opt.max_mem_intv)))
            self._round3_cache[key] = jax.jit(f)
        return self._round3_cache[key]

    def _sa_fn(self):
        if "f" not in self._sa_cache:
            self._sa_cache["f"] = jax.jit(partial(dfm.sa_batch, self.dfi))
        return self._sa_cache["f"]

    # ------------------------------------------------------------------
    def __call__(self, fm, opt, queries: list[np.ndarray],
                 stats: SeedingStats | None = None):
        R = len(queries)
        L = _round_up(max(len(q) for q in queries), 32)
        qarr = np.full((R, L), 4, dtype=np.uint8)
        lens = np.zeros(R, dtype=np.int32)
        for i, q in enumerate(queries):
            qarr[i, :len(q)] = q
            lens[i] = len(q)
        # NB: padding with 4 (ambiguous) naturally terminates sweeps at the
        # true read end, but ret_pivot would stall; lanes go inactive when
        # pivot >= true length (checked on host).
        qdev = jnp.asarray(qarr)
        collect = self._collect_fn(L)

        matches: list[list[tuple]] = [[] for _ in range(R)]

        def run_collect(q_rows, piv, mh, act):
            """Pad the lane count to a bucket so jit caches stay warm."""
            n_lanes = len(piv)
            P = _round_up(max(n_lanes, 1), 64)
            qp = np.full((P, L), 4, dtype=np.uint8)
            qp[:n_lanes] = q_rows
            pp = np.zeros(P, np.int32)
            pp[:n_lanes] = piv
            hh = np.ones(P, np.int32)
            hh[:n_lanes] = mh
            aa = np.zeros(P, bool)
            aa[:n_lanes] = act
            mems, n, ret, ovf = collect(jnp.asarray(qp), jnp.asarray(pp),
                                        jnp.asarray(hh), jnp.asarray(aa))
            return (np.asarray(mems)[:n_lanes], np.asarray(n)[:n_lanes],
                    np.asarray(ret)[:n_lanes], np.asarray(ovf)[:n_lanes])

        # -------- round 1: repeated collect until every pivot passes L
        pivots = np.zeros(R, dtype=np.int32)
        while True:
            act = pivots < lens
            if not act.any():
                break
            mems, n, ret, ovf = run_collect(
                qarr, np.where(act, pivots, 0).astype(np.int32),
                np.ones(R, np.int32), act)
            for r in range(R):
                if not act[r]:
                    continue
                if ovf[r]:  # exactness fallback
                    ms, rp = fo.collect_mem(self.fm, queries[r],
                                            int(pivots[r]), 1)
                    for m in ms:
                        if m[4] - m[3] >= opt.min_seed_len:
                            matches[r].append(m)
                    pivots[r] = rp
                    continue
                for j in range(int(n[r]) - 1, -1, -1):  # ascending beg
                    k, l, s, beg, end = (int(x) for x in mems[r, j])
                    if end - beg >= opt.min_seed_len:
                        matches[r].append((k, l, s, beg, end))
                pivots[r] = min(int(ret[r]), int(lens[r]))
                if pivots[r] <= 0:
                    pivots[r] = int(lens[r])  # safety: always progress

        # -------- round 2: re-seed long low-occ matches from midpoints
        split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
        reqs = []  # (read, pivot, min_hits)
        for r in range(R):
            for (k, l, s, beg, end) in list(matches[r]):
                if end - beg < split_len or s > opt.split_width:
                    continue
                reqs.append((r, (beg + end) // 2, s + 1))
        if reqs:
            RR = len(reqs)
            q2 = qarr[[t[0] for t in reqs]]
            p2 = np.array([t[1] for t in reqs], dtype=np.int32)
            h2 = np.array([t[2] for t in reqs], dtype=np.int32)
            mems, n, _, ovf = run_collect(q2, p2, h2, np.ones(RR, bool))
            for t, (r, piv, mh) in enumerate(reqs):
                if ovf[t]:
                    ms, _ = fo.collect_mem(self.fm, queries[r], piv, mh)
                    for m in ms:
                        if m[4] - m[3] >= opt.min_seed_len:
                            matches[r].append(m)
                    continue
                for j in range(int(n[t]) - 1, -1, -1):
                    k, l, s, beg, end = (int(x) for x in mems[t, j])
                    if end - beg >= opt.min_seed_len:
                        matches[r].append((k, l, s, beg, end))

        # -------- round 3: greedy forward seeding
        if opt.max_mem_intv > 0:
            mems, n, ovf = self._round3_fn(L)(
                qdev, jnp.asarray(np.ones(R, bool)))
            mems = np.asarray(mems)
            n = np.asarray(n)
            ovf = np.asarray(ovf)
            for r in range(R):
                if ovf[r]:
                    j = 0
                    while j < lens[r]:
                        if queries[r][j] < 4:
                            mem, j = fo.seed_strategy1(
                                self.fm, queries[r], j, opt.min_seed_len,
                                opt.max_mem_intv)
                            if mem is not None and mem[2] > 0:
                                matches[r].append(mem)
                        else:
                            j += 1
                    continue
                for j in range(int(n[r])):
                    k, l, s, beg, end = (int(x) for x in mems[r, j])
                    if end > lens[r]:
                        continue  # hits inside query padding are impossible
                    if s > 0:
                        matches[r].append((k, l, s, beg, end))

        for r in range(R):
            matches[r].sort(key=lambda m: (m[3] << 32) | m[4])

        # -------- seed sampling + merged SAL on device
        per_read_seeds: list[list[Seed]] = []
        all_locs = []
        for r in range(R):
            seeds = []
            for k, l, s, beg, end in matches[r]:
                step = s // opt.max_occ if s > opt.max_occ else 1
                cnt = 0
                kk = 0
                while kk < s and cnt < opt.max_occ:
                    seeds.append(Seed(rbeg=k + kk, qbeg=beg, len=end - beg,
                                      score=end - beg))
                    all_locs.append(k + kk)
                    kk += step
                    cnt += 1
            per_read_seeds.append(seeds)
        if all_locs:
            uniq = np.unique(np.array(all_locs, dtype=np.int64))
            pad = _round_up(len(uniq), 256)
            padded = np.zeros(pad, dtype=np.int64)
            padded[:len(uniq)] = uniq
            vals = np.asarray(self._sa_fn()(jnp.asarray(padded)))[:len(uniq)]
            table = dict(zip(uniq.tolist(), vals.tolist()))
            for seeds in per_read_seeds:
                for s in seeds:
                    s.rbeg = int(table[s.rbeg])
            if stats is not None:
                stats.sal_queries += len(all_locs)
                stats.sal_calls += len(uniq)
        return list(zip(matches, per_read_seeds))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m
