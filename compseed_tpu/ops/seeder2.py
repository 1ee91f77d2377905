"""Device-resident batch seeder (v2 orchestrator).

Chains the seedscan device programs — forward LEP scan, staged dense
backward walks, on-device SMEM reconstruction, round-2 re-seeding,
round-3 greedy seeding, match merge, seed sampling and merged SAL —
keeping every intermediate on the TPU.  The host receives one compact
result set per chunk (packed matches + seeds); with a ~30 MB/s
host<->device tunnel this is the difference between the pipeline being
transfer-bound and compute-bound.

Any static-cap overflow sets a flag shipped with the results and the
whole chunk falls back to the legacy lockstep seeder (exactness is never
sacrificed).  Caps are sized ~3-6x above the measured means of the
target workload (26 LEPs, 5.6 matches, 5.6 seeds per 101 bp read).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from compseed_tpu.ops import fm as dfm
from compseed_tpu.ops import seedscan as ss
from compseed_tpu.ops.device_index import DeviceFMIndex, to_device
from compseed_tpu.ops.smem import MMEM3, _seed_strategy_one

CAPL = ss.CAPL
CAPL2 = ss.CAPL2


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# scalar head of the result: [mtotal, stotal, n_uniq] + 11 overflow
# flags + per-round BWT counters [n_pool, n_u, n2, n_u2 (walk volumes),
# bq1, bc1, bq2, bc2 (backward steps), fq1, fc1, fq2, fc2, fq3, fc3
# (forward steps)] — queries/calls are STEP-granular like the
# reference's (comp_seed.cpp:81,123,151; SST.h bwt_call)
N_SCAL = 28
FWD_OVF_SLOTS = (2, 7, 10)       # oflags indices of the fwd-dedup flags
BWD_OVF_SLOT = 3                 # backward (walk) dedup cap overflow
R2_OVF_SLOT = 5                  # round-2 walk dedup cap overflow


def result_dims(R: int, packed: bool) -> tuple[int, int]:
    """(len(head), seed-matrix rows) for one shard's j_pack output."""
    return N_SCAL + 2 * R, 2 if packed else 4


def seed_bucket(stotal: int, seedcap: int) -> int:
    """Fetch width for the seed matrix: the D2H transfer ships only
    ~stotal columns instead of the full static cap — on typical input
    the seed buffers run ~35% full.  Quantized to <=32 widths per cap
    so the (trivial) device slice executables stay few."""
    g = max(4096, seedcap // 32)
    k = -(-max(int(stotal), 1) // g) * g
    return min(seedcap, k)


def unpack_results(head: np.ndarray, seedpk: np.ndarray, R: int,
                   n_reads: int, packed: bool = True) -> dict:
    """Decode one shard's (head, seed-matrix) result pair (j_pack
    layout) into host-side flats + counters.  Shared by the single-chip
    and sharded paths.  ``seedpk`` may be column-bucketed (seed_bucket).
    The match list never ships: chaining consumes only the per-read
    repetitive-coverage length l_rep, reduced on device
    (comp_seed.cpp:271-281)."""
    scal = head[:N_SCAL]
    cntbad = head[N_SCAL:N_SCAL + R]
    lrep_h = head[N_SCAL + R:N_SCAL + 2 * R]
    seed_cnt_h = cntbad & 0xFFFFFF
    bad_h = cntbad >> 24
    mtotal_h, stotal_h, n_uniq_h = int(scal[0]), int(scal[1]), int(scal[2])
    oflags = scal[3:14]  # r1 pool/walk/fwd/bwd; r2 x4; merge; seeds; r3
    npool_h, nu_h = int(scal[14]), int(scal[15])
    n2_h, nu2_h = int(scal[16]), int(scal[17])
    bq1, bc1, bq2, bc2 = (int(x) for x in scal[18:22])
    fq1, fc1, fq2, fc2, fq3, fc3 = (int(x) for x in scal[22:28])
    fq_h, fc_h = fq1 + fq2 + fq3, fc1 + fc2 + fc3

    # stotal can exceed the shipped columns only on a cap overflow, in
    # which case the whole chunk is recomputed anyway — clamp.
    k = min(stotal_h, seedpk.shape[1])
    w0 = seedpk[0, :k].astype(np.uint32).astype(np.uint64)
    if packed:
        w1 = seedpk[1, :k].astype(np.uint32)
        rbeg = (w0 | ((w1 & np.uint32(0xFFF)).astype(np.uint64)
                      << np.uint64(32))).astype(np.int64)
        qb_h = ((w1 >> np.uint32(12)) & np.uint32(0x3FF)).astype(np.int64)
        ln_h = (w1 >> np.uint32(22)).astype(np.int64)
    else:
        hi = seedpk[1, :k].astype(np.uint32).astype(np.uint64)
        rbeg = (w0 | (hi << np.uint64(32))).astype(np.int64)
        qb_h = seedpk[2, :k].astype(np.int64)
        ln_h = seedpk[3, :k].astype(np.int64)

    sflat = np.stack([rbeg, qb_h, ln_h], axis=1).astype(np.int64)
    soff = np.zeros(n_reads + 1, dtype=np.int64)
    np.cumsum(seed_cnt_h[:n_reads], out=soff[1:])
    return dict(lrep=lrep_h[:n_reads].astype(np.int64),
                sflat=sflat, soff=soff,
                oflags=oflags, bad=bad_h[:n_reads],
                mtotal=mtotal_h, stotal=stotal_h, n_uniq=n_uniq_h,
                npool=npool_h, n_u=nu_h, n2=n2_h, n_u2=nu2_h,
                bq1=bq1, bc1=bc1, bq2=bq2, bc2=bc2,
                fq=fq_h, fc=fc_h,
                fq1=fq1, fc1=fc1, fq2=fq2, fc2=fc2, fq3=fq3, fc3=fc3)


def _accumulate_stats(stats, res: dict) -> None:
    """Fold one shard/chunk's counters into SeedingStats at the
    reference's granularity — one query per character-extension request,
    one call per executed FM extension (comp_seed.cpp:81,123,151;
    SST.h bwt_call) — for both directions and all three rounds, plus
    the per-round decomposition (VERDICT r3 ask #3)."""
    stats.sal_queries += res["stotal"]
    stats.sal_calls += res["n_uniq"]
    stats.bwt_queries += res["bq1"] + res["bq2"] + res["fq"]
    stats.bwt_calls += res["bc1"] + res["bc2"] + res["fc"]
    r = stats.rounds
    for key in ("npool", "n_u", "n2", "n_u2", "bq1", "bc1", "bq2", "bc2",
                "fq1", "fc1", "fq2", "fc2", "fq3", "fc3"):
        r[key] = r.get(key, 0) + res[key]


def _bucket(x: int, lo: int) -> int:
    b = lo
    while b < x:
        b <<= 1
    return b


class DeviceSeeder:
    """run_flat-compatible seeder backed by the v2 device pipeline."""

    # caps as multiples of R (every downstream op runs at the STATIC
    # cap width, so oversizing is pure waste: sorts/gathers at 48R cost
    # 2x those at 24R.  Overflow paths exist for every cap, so these
    # are sized to measured bench volumes + headroom, env-overridable
    # for sweeps.)
    # measured on the honest 30x bench at 16k chunk (2026-08-19):
    # n_pool=23.2R, n_u=16.8R, n2=13.3R, mems=seeds=5.7R, sal_uniq=3.5R
    GP_F = int(os.environ.get("COMPSEED_GP_F", "36"))    # round-1 pool
    CAPU_F = int(os.environ.get("COMPSEED_CAPU_F", "24"))  # bwd-dedup reps
    # round-2 task LANE width: tasks compact to T2L lanes before the
    # re-seed scan (r4 measured occupancy at the old 8R width was
    # 15.5% — 1.24R tasks — so every round-2 op paid 6.5x its useful
    # width).  Overflow (> T2L tasks) flags and falls back like the
    # other caps; 4R keeps >3x headroom over the bench mean.  The env
    # name keeps its historical spelling for the sweep scripts.
    T2L_F = int(os.environ.get("COMPSEED_T2_F", "4"))
    GP2_F = int(os.environ.get("COMPSEED_GP2_F", "16"))  # round-2 pool
    MEM_F = int(os.environ.get("COMPSEED_MEM_F", "8"))   # merged matches
    SEED_F = int(os.environ.get("COMPSEED_SEED_F", "8"))  # sampled seeds
    U_F = int(os.environ.get("COMPSEED_U_F", "6"))       # unique SAL

    def __init__(self, opt, fm, dfi: DeviceFMIndex | None = None,
                 dedup: bool = False):
        """dedup=True enables the cross-read walk deduplication (the
        compressive SST reuse): worth it on compressor-reordered input
        where >=50% of backward-walk states repeat across the batch; the
        representative pool is then half-sized, so highly diverse input
        would overflow to the legacy path instead."""
        self.opt = opt
        self.fm = fm
        self.dfi = dfi if dfi is not None else to_device(fm)
        self.dedup = dedup
        # round-2 walk dedup: default ON with dedup since r4 — CAP_U2
        # defaults to GP2 (the round-2 pool cap), so the rep list can
        # never overflow and the self-disable can't fire on the bench
        # input (VERDICT r3 weak#3)
        self.r2_dedup = dedup and \
            os.environ.get("COMPSEED_R2_DEDUP", "1") == "1"
        # the dedup passes disable themselves after a cap overflow (low-
        # sharing input would otherwise fall back every chunk)
        self.fwd_disabled = \
            os.environ.get("COMPSEED_FWD_DEDUP", "1") == "0"
        # cross-round extension-chain memo (temporal-free sharing, one
        # memo for all 3 rounds) instead of the stage-synchronous
        # worklist.  Default ON: on the 30x bench input it saves ~30%
        # of forward steps where the staged path overflows its rep caps
        # and self-disables; its lossy caps need no fallback.  =0
        # selects the staged engine for A/B.
        self.fwd_memo = \
            os.environ.get("COMPSEED_FWD_MEMO", "1") == "1"
        # chain width: savings rise steeply as W shrinks but rounds
        # scale ~1/W.  After the r5 per-round op cuts the balance moved
        # DOWN: hardware A/B on one tunnel-day (EVIDENCE/ab_r05.jsonl)
        # measured W=5 at 9,754 reads/s / 38.46% reuse vs W=6 at
        # 9,515 / 35.68% — better on both axes; default 5 (r4's A/B at
        # the old per-round costs had W=6 vs W=8 time-neutral).
        self.chain_w = int(os.environ.get("COMPSEED_CHAIN_W", "5"))
        self.bwd_disabled = \
            os.environ.get("COMPSEED_BWD_DEDUP", "1") == "0"
        # instance copies of the cap factors: a cap overflow at
        # runtime DOUBLES the factor and recompiles (adaptive static
        # shapes) instead of paying the exact-fallback rerun on every
        # chunk — whole-genome interval volumes exceed the bench-sized
        # defaults (the r4 hg19 hit% collapse: the r1 pool overflowed,
        # which disabled the memo path for the rest of the run)
        self.GP_F = type(self).GP_F
        self.CAPU_F = type(self).CAPU_F
        self.T2L_F = type(self).T2L_F
        self.GP2_F = type(self).GP2_F
        self.MEM_F = type(self).MEM_F
        self.SEED_F = type(self).SEED_F
        self.U_F = type(self).U_F
        self.MEM3_F = int(os.environ.get("COMPSEED_MEM3_F", "32"))
        # =0 disables the overflow->double-and-recompile response and
        # falls straight through to the r4 behavior (drop the dedup
        # pass on overflow).  Measured on hg19 full-cohort
        # (EVIDENCE/ab_r05_notes.md): the cap-raised wide programs ran
        # 302 reads/s vs 1,478 for the memo-disabled path — at
        # whole-genome interval volumes the raised widths cost more
        # than the memo saves, so deployments there should set =0
        # until the per-round raise lever lands.
        self.adaptive_caps = \
            os.environ.get("COMPSEED_ADAPTIVE_CAPS", "1") == "1"
        self._cap_raises = 0
        self._jits: dict = {}
        self.prof: dict = {}
        self.last_overflow = False

    # ------------------------------------------------------------------
    def _build(self, R: int, L: int):
        key = (R, L)
        if key in self._jits:
            return self._jits[key]
        fm = self.dfi
        opt = self.opt
        dt = fm.dtype
        i32 = jnp.int32
        GP = self.GP_F * R
        T2 = self.T2L_F * R          # round-2 task lanes (see T2L_F)
        GP2 = self.GP2_F * R
        MEMCAP = self.MEM_F * R
        SEEDCAP = self.SEED_F * R
        UCAP = self.U_F * R
        MAXW = L + 2
        split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
        stages1 = [(GP, 8), (GP // 2, 16), (GP // 8, 48),
                   (GP // 16, MAXW)]
        stages2 = [(GP2, 8), (GP2 // 2, 24), (GP2 // 8, MAXW)]

        # the index is a CALL-TIME argument to every jitted program so
        # its multi-GB arrays are runtime operands, not captured
        # constants (at hg19 scale each embedded copy costs 2.3+ GB of
        # executable memory)
        scan1 = ss.make_scan(None, L, CAPL, advance=True)
        scan2 = ss.make_scan(None, L, CAPL2, advance=False)
        r3fn = jax.vmap(
            lambda fm_, q, act: _seed_strategy_one(
                fm_, L, opt.min_seed_len, int(opt.max_mem_intv), q, act),
            in_axes=(None, 0, 0))

        CAP_U = min(self.CAPU_F * R, GP)
        stages_u = [(CAP_U, 8), (CAP_U // 2, 16), (CAP_U // 4, 32),
                    (CAP_U // 8, 72), (CAP_U // 16, MAXW)]
        use_dedup = self.dedup
        # == GP2: reps can never exceed the pool, so no overflow path
        # (12R and GP2//2 both self-disabled on the representative 30x
        # input, ab6137f / VERDICT r3)
        CAP_U2 = int(os.environ.get("COMPSEED_CAPU2_F",
                                    str(self.GP2_F))) * R
        CAP_U2 = min(CAP_U2, GP2)
        stages_u2 = [(CAP_U2, 8), (CAP_U2 // 2, 24), (CAP_U2 // 4, MAXW)]
        r2_dedup = self.r2_dedup

        fwd_stages = ss.fwd_stages_for(R, L)
        # round-2 tasks run ONE sweep each; conservative rep caps
        fwd_stages2 = [(T2, 8), (T2, 24), (T2, MAXW)]
        use_fwd = use_dedup and not self.fwd_disabled
        use_bwd = use_dedup and not self.bwd_disabled
        # backward engine selection: chained rounds with per-round
        # exact content grouping (walk_pool_chain, round-5 default);
        # =0 falls back to the round-4 probe+staged-walk pair, itself
        # switchable between content-window (BWD_WIN=1) and whole-walk
        # keying — all bit-exact, kept for A/B.
        bwd_chain = os.environ.get("COMPSEED_BWD_CHAIN", "1") == "1"
        bwd_win = os.environ.get("COMPSEED_BWD_WIN", "1") == "1"
        BWD_W = int(os.environ.get("COMPSEED_BWD_W", "8"))

        # COMPSEED_FWD_MEMO=1 swaps the stage-synchronous forward dedup
        # for the cross-round extension-chain memo (ss.chain_scan): one
        # memo dict threads r1 -> r2 -> r3 so later rounds re-use the
        # chains round 1 walked (the bulk of the reference SST's hits).
        use_memo = self.fwd_memo
        CW = self.chain_w
        MEMO_M = (256 // CW) * R              # chain-store rows
        # 4x oversized table: at the natural ~0.25 load a direct-mapped
        # slot eviction costs ~4% of the savings (measured 34.6 -> 30.2
        # at 2x); slots are 41 B vs 24*CW B chain rows, so headroom in
        # the TABLE is the cheap half
        MEMO_H = 1 << (4 * MEMO_M - 1).bit_length()   # table slots

        def fwd_scan(fm_, qa, rl, cap, stages_, memo, u_cap=None, **kw):
            if use_memo:
                return ss.chain_scan(fm_, qa, rl, cap, memo, W=CW,
                                     u_cap=u_cap, **kw)
            pool_, n_, ovf_, fq_, fc_ = ss.forward_scan_dedup(
                fm_, qa, rl, cap, stages_, **kw)
            return pool_, n_, ovf_, fq_, fc_, memo

        def init_memo(dt_):
            if use_memo:
                return ss.make_chain_memo(MEMO_H, MEMO_M, CW, dt_)
            return jnp.zeros(0, jnp.int32)     # inert pytree placeholder

        def nonN_prefix(qarr):
            """S with S[r, i] = # non-N bases of read r in [0, i) —
            turns a walk span into its exact BWT-query count (the
            reference counts one query per non-N character step,
            comp_seed.cpp:123; an N kills the entry without a query)."""
            R_ = qarr.shape[0]
            nn = jnp.cumsum((qarr < 4).astype(i32), axis=1)
            return jnp.concatenate(
                [jnp.zeros((R_, 1), i32), nn], axis=1).reshape(-1)

        def walk_steps(S_flat, pool_, death, valid):
            """Sum of per-entry step counts: queries at i in
            [max(death,0), pivot-1] where seq[i] < 4 (min_hits deaths
            count their killing query; N deaths don't; a full walk to
            -1 counts every non-N below the pivot)."""
            Lp1 = jnp.asarray(L + 1, i32)
            rid = pool_[:, 5].astype(i32)
            piv = pool_[:, 4].astype(i32)
            lo = jnp.maximum(death.astype(i32), 0)
            base = rid * Lp1
            span = S_flat[base + piv] - S_flat[base + lo]
            return jnp.sum(jnp.where(valid, span, 0))

        @jax.jit
        def j_round1(fm, qarr, rlens):
            R_ = qarr.shape[0]
            qflat = qarr.reshape(-1)
            fovf = jnp.asarray(False)
            memo = init_memo(dt)
            if use_fwd:
                # forward SST reuse (SST.h:60-71): staged sweep worklist,
                # one representative walk per (interval, content-window)
                # group; cap overflow raises fovf and the seeder rebuilds
                # without the forward path (adaptive)
                pool, n_pool, fovf, fqc, fcc, memo = fwd_scan(
                    fm, qarr, rlens, GP, fwd_stages, memo,
                    u_cap=max(R_ // 2, 64))
                bad = jnp.zeros(R_, jnp.bool_)        # no per-read caps
                povf = jnp.asarray(False)
            else:
                z = jnp.zeros(R_, i32)
                lep, cnt, sovf = scan1(fm, qarr, rlens, z,
                                       jnp.ones(R_, i32), rlens > 0)
                pool, n_pool, povf = ss.build_pool(lep, cnt, GP)
                fqc = fcc = jnp.asarray(0, i32)
                bad = sovf != 0                       # per read
            dovf = jnp.asarray(False)
            S_flat = nonN_prefix(qarr)
            rw = ss.packed_rev_windows(qarr)
            if use_bwd and bwd_chain:
                # W-char chained rounds, one rep walk per (k, s,
                # content-window) group per round (SST.h:72-92 sharing
                # at chain granularity)
                death, fk, fl, fs, wovf, bc1, n_u = ss.walk_pool_chain(
                    fm, rw, L, pool, CAP_U)
                bq1 = walk_steps(S_flat, pool, death, pool[:, 6] != 0)
            elif use_bwd and bwd_win:
                # backward SST reuse, content-window formulation: walks
                # from DIFFERENT positions holding the same (interval,
                # next-Wb-chars) state share one representative — the
                # cross-read/cross-position sharing of the reference's
                # backward trie (SST.h:72-92).  Position-keyed whole-
                # walk dedup measured 0.01% step sharing on the 30x
                # bench input; this captures the real overlap.
                ph = ss.prefix_hashes(qarr)
                death, fk, fl, fs, wovf, bc1, n_u = ss.walk_pool_dedup(
                    fm, qflat, ph, L, pool, stages_u, Wb=BWD_W,
                    rwflat=rw)
                bq1 = walk_steps(S_flat, pool, death, pool[:, 6] != 0)
            elif use_bwd:
                # whole-walk dedup: one representative per (interval,
                # pivot, prefix) state (exact-duplicate reads only)
                ph = ss.prefix_hashes(qarr)
                rep_pool, group, n_u, dovf, _ = ss.dedup_pool(pool, ph,
                                                              CAP_U)
                death_r, fk_r, fl_r, fs_r, wovf, bc1 = ss.walk_pool(
                    fm, qflat, L, rep_pool, stages_u, rwflat=rw)
                death = death_r[group]
                fk = fk_r[group]
                fs = fs_r[group]
                fl = fl_r[group] - rep_pool[group, 1] + pool[:, 1]
                bq1 = walk_steps(S_flat, pool, death, pool[:, 6] != 0)
            else:
                n_u = n_pool
                death, fk, fl, fs, wovf, bc1 = ss.walk_pool(
                    fm, qflat, L, pool, stages1, rwflat=rw)
                bq1 = walk_steps(S_flat, pool, death, pool[:, 6] != 0)
            ok, rid, k, l, s, beg, end = ss.reconstruct(
                pool, death, fk, fl, fs, opt.min_seed_len, (5, 4))
            flags = jnp.stack([povf, wovf, fovf, dovf])  # chunk-global
            return (pool, ok, rid, k, l, s, beg, end, flags, bad,
                    n_pool, n_u, fqc, fcc, bq1, bc1, memo)

        @jax.jit
        def j_round2(fm, qarr, rlens, ok, rid, k, s, beg, end, memo):
            # task extraction (comp_seed.cpp:2274-2286)
            sel = ok & ((end - beg) >= split_len) & (s <= opt.split_width)
            order = jnp.argsort(~sel, stable=True)
            tovf = jnp.sum(sel.astype(i32)) > T2
            take = order[:T2]
            t_valid = sel[take]
            t_rid = jnp.where(t_valid, rid[take], 0)
            t_mid = jnp.where(t_valid, (beg[take] + end[take]) // 2, 0)
            t_mh = jnp.where(t_valid, s[take] + 1, 1)
            qflat = qarr.reshape(-1)
            R_ = qarr.shape[0]
            fovf2 = jnp.asarray(False)
            fq2 = fc2 = jnp.asarray(0, i32)
            if use_fwd:
                # round-2 re-seed scans through the forward-dedup
                # worklist: per-lane pivots/min_hits, single sweep;
                # in memo mode the tasks mostly consume chains round 1
                # already walked (min_hits is lane-side, not in the key)
                pool2, n2, fovf2, fq2, fc2, memo = fwd_scan(
                    fm, qarr, rlens, GP2, fwd_stages2, memo,
                    u_cap=max(R_ // 4, 64), min_hits=t_mh,
                    pivots0=t_mid.astype(i32), rids=t_rid.astype(i32),
                    advance=False, record_lane_index=True,
                    active=t_valid)
                bad = jnp.zeros(R_, jnp.bool_)
            else:
                q2 = qarr[t_rid]
                rl2 = rlens[t_rid]
                lep2, cnt2, sovf2 = scan2(fm, q2, rl2, t_mid.astype(i32),
                                          t_mh.astype(i32), t_valid)
                pool2, n2, _povf2 = ss.build_pool(lep2, cnt2, GP2)
                fovf2 = fovf2 | _povf2
                bad = jnp.zeros(R_, jnp.bool_).at[t_rid].max(
                    t_valid & (sovf2 != 0))           # per read
            # pool2 col 5 is the task index (the scan's "read id" was the
            # task lane); remap to the real read id for the walks' q-row
            # lookup, and append the task index as the grouping column.
            # One concat build: `.at[:, 5].set` is a 2D column scatter
            # that measured ~50 ms at this width.
            tix = pool2[:, 5].astype(i32)
            pool2 = jnp.concatenate(
                [pool2[:, :5], t_rid[tix][:, None].astype(dt),
                 pool2[:, 6:7], tix[:, None].astype(dt)], axis=1)
            povf2 = jnp.asarray(False)
            # Round-2 walk dedup is gated by COMPSEED_R2_DEDUP=1 (the
            # round-1 "pathological compile" was the dying tunnel — CPU
            # A/B 2026-08-17: +12 s compile).  Its CAP_U2 rep caps
            # overflow on 30x layout-ordered input, so it self-disables
            # adaptively (R2_OVF_SLOT); in memo mode round 2 already
            # re-uses round-1 chains, which supersedes this path.
            mh_rows = t_mh[tix].astype(i32)
            S_flat2 = nonN_prefix(qarr)
            rw2 = ss.packed_rev_windows(qarr)
            if r2_dedup and bwd_chain:
                death2, fk2, fl2, fs2, wovf2, bc2, n_u2 = \
                    ss.walk_pool_chain(fm, rw2, L, pool2, CAP_U2,
                                       mh=mh_rows)
                bq2 = walk_steps(S_flat2, pool2, death2, pool2[:, 6] != 0)
            elif r2_dedup and bwd_win:
                ph2 = ss.prefix_hashes(qarr)
                death2, fk2, fl2, fs2, wovf2, bc2, n_u2 = \
                    ss.walk_pool_dedup(fm, qflat, ph2, L, pool2,
                                       stages_u2, Wb=BWD_W, mh=mh_rows,
                                       rwflat=rw2)
                bq2 = walk_steps(S_flat2, pool2, death2, pool2[:, 6] != 0)
            elif r2_dedup:
                ph2 = ss.prefix_hashes(qarr)
                rep2, group2, n_u2, dovf2, rep_take2 = ss.dedup_pool(
                    pool2, ph2, CAP_U2, mh=mh_rows)
                death_r, fk_r, fl_r, fs_r, wovf2, bc2 = ss.walk_pool(
                    fm, qflat, L, rep2, stages_u2,
                    mh=mh_rows[rep_take2], rwflat=rw2)
                death2 = death_r[group2]
                fk2 = fk_r[group2]
                fs2 = fs_r[group2]
                fl2 = fl_r[group2] - rep2[group2, 1] + pool2[:, 1]
                povf2 = povf2 | dovf2
                bq2 = walk_steps(S_flat2, pool2, death2, pool2[:, 6] != 0)
            else:
                n_u2 = n2
                death2, fk2, fl2, fs2, wovf2, bc2 = ss.walk_pool(
                    fm, qflat, L, pool2, stages2, mh=mh_rows, rwflat=rw2)
                bq2 = walk_steps(S_flat2, pool2, death2, pool2[:, 6] != 0)
            ok2, rid2, k2, l2, s2, beg2, end2 = ss.reconstruct(
                pool2, death2, fk2, fl2, fs2, opt.min_seed_len, (7,))
            flags = jnp.stack([tovf, povf2, wovf2, fovf2])  # chunk-global
            return (ok2, rid2, k2, l2, s2, beg2, end2, flags, bad,
                    fq2, fc2, n2, n_u2, bq2, bc2, memo)

        @jax.jit
        def j_round3(fm, qarr, rlens, memo):
            R_ = qarr.shape[0]
            if use_fwd and int(opt.max_mem_intv) > 0:
                # greedy round-3 through the forward-dedup worklist
                # (tem_forward_sst, comp_seed.cpp:141-160): same sweep
                # machinery in 'r3' mode — one rep walk per group
                GP3 = R_ * self.MEM3_F
                pool3, n3, ovf3g, fq3, fc3, memo = fwd_scan(
                    fm, qarr, rlens, GP3, fwd_stages, memo, mode="r3",
                    u_cap=max(R_ // 2, 64),
                    min_len=int(opt.min_seed_len),
                    max_intv=int(opt.max_mem_intv))
                valid3 = pool3[:, 6] != 0
                rid3 = pool3[:, 5].astype(i32)
                end3 = pool3[:, 3].astype(i32)
                ok3 = valid3 & (pool3[:, 2] > 0)
                ovf3 = jnp.zeros(R_, jnp.bool_)       # no per-read caps
                return (ok3, rid3, pool3[:, 0], pool3[:, 1], pool3[:, 2],
                        pool3[:, 4].astype(i32), end3, ovf3,
                        ovf3g, fq3, fc3)
            packed = r3fn(fm, qarr, rlens > 0)
            mems = packed[:, : MMEM3 * 5].reshape(R_, MMEM3, 5)
            n = packed[:, MMEM3 * 5].astype(i32)
            ovf3 = packed[:, MMEM3 * 5 + 1] != 0      # per read
            slot = jnp.arange(MMEM3, dtype=i32)[None, :]
            valid = slot < n[:, None]
            rid3 = jnp.broadcast_to(
                jnp.arange(R_, dtype=i32)[:, None], (R_, MMEM3)).reshape(-1)
            flat = mems.reshape(-1, 5)
            end3 = flat[:, 4].astype(i32)
            ok3 = valid.reshape(-1) & (flat[:, 2] > 0) & \
                (end3 <= rlens[rid3])
            return (ok3, rid3, flat[:, 0], flat[:, 1], flat[:, 2],
                    flat[:, 3].astype(i32), end3, ovf3,
                    jnp.asarray(False), jnp.asarray(0, i32),
                    jnp.asarray(0, i32))

        @jax.jit
        def j_merge(ok1, rid1, k1, l1, s1, b1, e1,
                    ok2, rid2, k2, l2, s2, b2, e2,
                    ok3, rid3, k3, l3, s3, b3, e3):
            ok = jnp.concatenate([ok1, ok2, ok3])
            rid = jnp.concatenate([rid1, rid2, rid3])
            k = jnp.concatenate([k1, k2, k3])
            l = jnp.concatenate([l1, l2, l3])
            s = jnp.concatenate([s1, s2, s3])
            beg = jnp.concatenate([b1, b2, b3])
            end = jnp.concatenate([e1, e2, e3])
            # single packed-key argsort ((rid, beg, end) bounds are
            # static; a 3-key lexsort costs tens of ms at this width)
            rid_kc = jnp.where(ok, rid.astype(i32), R)
            span = L + 2
            if (R + 2) * span * span < 2**31:
                okey = (rid_kc * span + beg.astype(i32)) * span + \
                    end.astype(i32)
            else:
                okey = (rid_kc.astype(jnp.int64) * span +
                        beg.astype(jnp.int64)) * span + \
                    end.astype(jnp.int64)
            order = jnp.argsort(okey).astype(i32)
            total = jnp.sum(ok.astype(i32))
            movf = total > MEMCAP
            take = order[:MEMCAP]
            return (ok[take], rid[take], k[take], l[take], s[take],
                    beg[take], end[take], total, movf)

        @jax.jit
        def j_seeds(fm, ok, rid, k, s, beg, end):
            # sampling (comp_seed.cpp:2309-2325)
            s64 = s
            step = jnp.where(s64 > opt.max_occ,
                             s64 // opt.max_occ, 1)
            cnt = jnp.minimum(-(-s64 // step),
                              opt.max_occ).astype(i32)
            cnt = jnp.where(ok, cnt, 0)
            total = jnp.sum(cnt)
            sovf = total > SEEDCAP
            starts = jnp.cumsum(cnt) - cnt
            midx = jnp.repeat(jnp.arange(MEMCAP, dtype=i32), cnt,
                              total_repeat_length=SEEDCAP)
            pos = jnp.arange(SEEDCAP, dtype=i32)
            v = pos < total
            within = (pos - starts[midx]).astype(dt)
            locs = jnp.where(v, k[midx] + within * step[midx], 0)
            # merged SAL (comp_seed.cpp:2306-2347)
            lord = jnp.argsort(jnp.where(v, locs, jnp.iinfo(locs.dtype).max),
                               stable=True).astype(i32)
            lsort = locs[lord]
            vsort = v[lord]
            head = vsort & jnp.concatenate([
                jnp.asarray([True]),
                (lsort[1:] != lsort[:-1]) | ~vsort[:-1]])
            n_uniq = jnp.sum(head.astype(i32))
            uovf = n_uniq > UCAP
            # compact unique locations via rank scatter (a bool argsort
            # costs ~24 ms at this width on this platform)
            urank = jnp.cumsum(head.astype(i32)) - 1
            reps = jnp.zeros(UCAP, dt).at[
                jnp.where(head & (urank < UCAP), urank, UCAP)].set(
                lsort, mode="drop")
            sa, wovf = dfm.sa_batch_compact(fm, reps)
            # scatter resolved values back: sorted position -> rep index
            ridx = jnp.cumsum(head.astype(i32)) - 1
            sa_sorted = sa[jnp.clip(ridx, 0, UCAP - 1)]
            rbeg_sorted = jnp.where(vsort, sa_sorted, 0)
            rbeg = jnp.zeros(SEEDCAP, dt).at[lord].set(rbeg_sorted)
            qb = jnp.where(v, beg[midx], 0).astype(i32)
            ln = jnp.where(v, end[midx] - beg[midx], 0).astype(i32)
            seed_rid = jnp.where(v, rid[midx], 0)
            seed_cnt = jnp.zeros(R, i32).at[seed_rid].add(v.astype(i32))
            return (rbeg, qb, ln, total, n_uniq, seed_cnt,
                    sovf | uovf | wovf)

        packed = L < 1024                   # read positions fit 10 bits

        @jax.jit
        def j_pack(mok, mrid, ms, mbeg, mend, mtotal, rbeg, qb, ln,
                   stotal, n_uniq, seed_cnt, f1, f2, bad1, bad2, bad3,
                   f4, f5, f6, n_pool, n_u, n2, n_u2, bq1, bc1, bq2, bc2,
                   fq1, fc1, fq2, fc2, fq3, fc3):
            """Pack results into a scalar+per-read head and a bit-packed
            all-int32 seed matrix — every device->host transfer over the
            tunnel pays a large flat cost, so the host fetches exactly
            two arrays: the head (counters first, so stotal is known
            before the second fetch), then only ``seed_bucket(stotal)``
            columns of the seed matrix.  Packed columns: a seed is two
            int32 words (rbeg lo32; rbeg hi12 | qb<<12 | len<<22 — 12 hi
            bits cover 2*l_pac < 2^44), and the per-read seed count
            carries the fallback bit at bit 24.  The match list itself
            never ships: chaining only needs the per-read l_rep (union
            length of over-occurring match intervals,
            comp_seed.cpp:271-281), reduced here with a segmented
            prefix-max over the (rid, beg, end)-sorted merged matches.
            f1/f2 are chunk-global overflow vectors; bad1-3 are per-read
            overflow bitmaps (scan/r2/r3) for per-read oracle fallback."""
            bad = (bad1 | bad2 | bad3).astype(i32)
            scalars = jnp.concatenate([
                jnp.stack([mtotal.astype(i32), stotal.astype(i32),
                           n_uniq.astype(i32)]),
                f1.astype(i32), f2.astype(i32),
                jnp.stack([f4.astype(i32), f5.astype(i32),
                           f6.astype(i32),
                           n_pool.astype(i32), n_u.astype(i32),
                           n2.astype(i32), n_u2.astype(i32),
                           bq1.astype(i32), bc1.astype(i32),
                           bq2.astype(i32), bc2.astype(i32),
                           fq1.astype(i32), fc1.astype(i32),
                           fq2.astype(i32), fc2.astype(i32),
                           fq3.astype(i32), fc3.astype(i32)])])
            # ---- per-read l_rep: interval union over occ > max_occ
            # matches.  Entries are sorted by (rid, beg, end) with the
            # invalid tail last, so union length = sum over matches of
            # max(0, end - max(beg, M)) with M the segment-exclusive
            # running max of filtered ends.
            occ32 = jnp.minimum(ms, (1 << 31) - 1).astype(i32)
            m_rep = mok & (occ32 > opt.max_occ)
            e32 = jnp.where(m_rep, mend.astype(i32), -1)
            rid32 = mrid.astype(i32)

            def comb(a, b):
                va, ra = a
                vb, rb = b
                return (jnp.where(rb == ra, jnp.maximum(va, vb), vb), rb)

            run, _ = jax.lax.associative_scan(comb, (e32, rid32))
            prev = jnp.concatenate(
                [jnp.full((1,), -1, i32), run[:-1]])
            seg_start = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), rid32[1:] != rid32[:-1]])
            M = jnp.where(seg_start, jnp.asarray(-1, i32), prev)
            contrib = jnp.where(
                m_rep,
                jnp.maximum(
                    mend.astype(i32) - jnp.maximum(mbeg.astype(i32), M),
                    0),
                0)
            tgt = jnp.where(mok, mrid, R).astype(i32)
            lrep = jnp.zeros(R, i32).at[tgt].add(contrib, mode="drop")
            cntbad = seed_cnt.astype(i32) | (bad << 24)
            head = jnp.concatenate([scalars, cntbad, lrep])
            if np.dtype(dt).itemsize == 8:
                lo = (rbeg & 0xFFFFFFFF).astype(i32)   # truncating
                hi = (rbeg >> 32).astype(i32)
            else:
                lo = rbeg.astype(i32)
                hi = jnp.zeros_like(lo)
            if packed:
                w1 = hi | (qb.astype(i32) << 12) | (ln.astype(i32) << 22)
                seedpk = jnp.stack([lo, w1])
            else:
                seedpk = jnp.stack([lo, hi, qb.astype(i32),
                                    ln.astype(i32)])
            return head, seedpk

        def whole(fm, qd, rd):
            """The full per-shard seeding program r1→pack as one traced
            function — the unit the multi-chip path shard_maps over the
            mesh (each device seeds its own read sub-batch with a
            replicated index, like each kt_for thread owning a private
            SST over its tile, comp_seed.cpp:2541-2548)."""
            (pool, ok, rid, k, l, s, beg, end, ovf1, bad1, n_pool, n_u,
             fqc, fcc, bq1, bc1, memo) = j_round1(fm, qd, rd)
            r2 = j_round2(fm, qd, rd, ok, rid, k, s, beg, end, memo)
            r3 = j_round3(fm, qd, rd, r2[15])
            merged = j_merge(ok, rid, k, l, s, beg, end, *r2[:7], *r3[:7])
            mok, mrid, mk, ml, ms, mbeg, mend, mtotal, movf = merged
            seeds = j_seeds(fm, mok, mrid, mk, ms, mbeg, mend)
            rbeg, qb, ln, stotal, n_uniq, seed_cnt, sovf = seeds
            return j_pack(mok, mrid, ms, mbeg, mend, mtotal, rbeg, qb, ln,
                          stotal, n_uniq, seed_cnt, ovf1, r2[7], bad1,
                          r2[8], r3[7], movf, sovf, r3[8], n_pool, n_u,
                          r2[11], r2[12], bq1, bc1, r2[13], r2[14],
                          fqc, fcc, r2[9], r2[10], r3[9], r3[10])

        fns = dict(r1=j_round1, r2=j_round2, r3=j_round3, merge=j_merge,
                   seeds=j_seeds, pack=j_pack, whole=whole, packed=packed,
                   sizes=(GP, T2, GP2, MEMCAP, SEEDCAP, UCAP))
        self._jits[key] = fns
        return fns

    # ------------------------------------------------------------------
    def run_flat(self, queries: list[np.ndarray], stats=None):
        import time
        opt = self.opt
        n_reads = len(queries)
        R = _bucket(n_reads, 256)
        lens = np.fromiter((len(q) for q in queries), np.int64,
                           count=n_reads)
        maxlen = int(lens.max(initial=1))
        L = _round_up(maxlen + 1, 32)
        qarr = np.full((R, L), 4, dtype=np.uint8)
        rlens = np.zeros(R, dtype=np.int32)
        rlens[:n_reads] = lens
        # vectorized row fill (a 16k-iteration Python loop here costs
        # ~100 ms of host time the device idles on)
        flat = np.concatenate(queries) if n_reads else \
            np.zeros(0, np.uint8)
        rows = np.repeat(np.arange(n_reads), lens)
        cols = np.arange(len(flat)) - np.repeat(
            np.cumsum(lens) - lens, lens)
        qarr[rows, cols] = flat
        fns = self._build(R, L)
        t0 = time.time()
        qd = jnp.asarray(qarr)
        rd = jnp.asarray(rlens)
        self.last_qd = qd
        self.last_L = L
        (pool, ok, rid, k, l, s, beg, end, ovf1, bad1, n_pool, n_u,
         fqc, fcc, bq1, bc1, memo) = fns["r1"](self.dfi, qd, rd)
        r2 = fns["r2"](self.dfi, qd, rd, ok, rid, k, s, beg, end, memo)
        r3 = fns["r3"](self.dfi, qd, rd, r2[15])
        merged = fns["merge"](ok, rid, k, l, s, beg, end,
                              *r2[:7], *r3[:7])
        mok, mrid, mk, ml, ms, mbeg, mend, mtotal, movf = merged
        seeds = fns["seeds"](self.dfi, mok, mrid, mk, ms, mbeg, mend)
        rbeg, qb, ln, stotal, n_uniq, seed_cnt, sovf = seeds
        head_d, seed_d = fns["pack"](mok, mrid, ms, mbeg, mend, mtotal,
                                     rbeg, qb, ln, stotal, n_uniq,
                                     seed_cnt, ovf1, r2[7], bad1, r2[8],
                                     r3[7], movf, sovf, r3[8], n_pool,
                                     n_u, r2[11], r2[12], bq1, bc1,
                                     r2[13], r2[14], fqc, fcc,
                                     r2[9], r2[10], r3[9], r3[10])

        # ---- two fetches: the head (counters first) syncs, then only
        # seed_bucket(stotal) columns of the seed matrix come over —
        # and none at all when the head already shows a cap overflow
        # (the whole chunk reruns on the legacy path in that case)
        _, _, _, MEMCAP, SEEDCAP, _ = fns["sizes"]
        head = np.asarray(jax.device_get(head_d))
        if head[3:14].any():
            seedpk = np.zeros((2 if fns["packed"] else 4, 0), np.int32)
        else:
            K = seed_bucket(head[1], SEEDCAP)
            seedpk = np.asarray(jax.device_get(seed_d[:, :K]))
        self.prof["device_s"] = time.time() - t0
        self.prof["d2h_bytes"] = head.nbytes + seedpk.nbytes

        res = unpack_results(head, seedpk, R, n_reads,
                             packed=fns["packed"])

        if res["oflags"].any():
            # chunk-global cap overflow (pool/walk/tasks/merge/seeds):
            # rare, sized generously — whole chunk reruns exactly
            self.last_overflow = True
            self.last_qd = None      # meta engines must not reuse stale qd
            self.prof["overflow_flags"] = res["oflags"].tolist()
            self._note_fwd_overflow(res["oflags"])
            from compseed_tpu.ops.smem import BatchSeeder
            legacy = BatchSeeder(opt, self.fm, self.dfi)
            return legacy.run_flat(queries, stats)
        self.last_overflow = False

        if stats is not None:
            _accumulate_stats(stats, res)
        self._mrows = None
        lrep, sflat, soff = res["lrep"], res["sflat"], res["soff"]
        bad_reads = np.nonzero(res["bad"])[0]
        if len(bad_reads):
            lrep, sflat, soff = self._splice_oracle(
                queries, bad_reads, lrep, sflat, soff)
        return lrep, sflat, soff

    def _note_fwd_overflow(self, oflags) -> None:
        """Adaptive response to a cap overflow.  Pool/buffer caps
        (sized to bench volumes) DOUBLE and recompile — overflow there
        means the input genuinely carries more volume (whole-genome
        interval counts), and per-chunk exact fallback would otherwise
        run forever.  Only the dedup REP caps still respond by
        dropping the dedup pass (low-sharing input).  Raises are
        bounded at 3 doublings per knob (8x memory) before falling
        through to the disable/fallback behavior."""
        import sys
        changed = False
        # oflags: r1 pool/walk/fwd/bwd, r2 task/pool/walk/fwd,
        # merge, seeds, r3
        raises = []
        if self.adaptive_caps and self._cap_raises < 9:
            def bump(attr, slots):
                nonlocal changed
                if any(oflags[s] for s in slots):
                    setattr(self, attr, getattr(self, attr) * 2)
                    raises.append(f"{attr}->{getattr(self, attr)}")
                    self._cap_raises += 1
                    changed = True
            # slots 2/7/10 are pool-equivalent only in memo mode
            # (fovf == pool there); in the staged engine they are the
            # dedup REP caps, whose overflow means low-sharing input —
            # raising pool widths cannot fix that, so those fall
            # through to the disable response below.
            memo = self.fwd_memo and not self.fwd_disabled
            bump("GP_F", (0, 2) if memo else (0,))    # r1 pool
            bump("CAPU_F", (1,))     # r1 walk lane cap
            bump("T2L_F", (4,))      # round-2 task lanes
            bump("GP2_F", (5, 6, 7) if memo else (5, 6))  # r2 pool/walks
            bump("MEM_F", (8,))
            bump("SEED_F", (9,))
            bump("U_F", (9,))
            bump("MEM3_F", (10,) if memo else ())
        if raises:
            print(f"[M::seeder2] cap overflow -> raising {raises} and "
                  "recompiling (results unchanged; the overflowing "
                  "chunk was recomputed exactly)", file=sys.stderr)
            self._jits.clear()
            if hasattr(self, "_sharded"):
                self._sharded.clear()
            return
        if not self.fwd_disabled and any(oflags[s] for s in FWD_OVF_SLOTS):
            print("[M::seeder2] forward-sweep dedup caps overflowed "
                  f"(oflags={list(map(int, oflags))} = r1 pool/walk/"
                  "fwd/bwd, r2 task/pool/walk/fwd, merge, seeds, r3); "
                  "disabling the forward path for subsequent chunks",
                  file=sys.stderr)
            self.fwd_disabled = True
            changed = True
        if not self.bwd_disabled and oflags[BWD_OVF_SLOT]:
            print("[M::seeder2] backward-walk dedup caps overflowed; "
                  "disabling the backward dedup for subsequent chunks",
                  file=sys.stderr)
            self.bwd_disabled = True
            changed = True
        if self.r2_dedup and oflags[R2_OVF_SLOT]:
            print("[M::seeder2] round-2 walk dedup caps overflowed; "
                  "disabling the round-2 dedup for subsequent chunks",
                  file=sys.stderr)
            self.r2_dedup = False
            changed = True
        if changed:
            self._jits.clear()
            if hasattr(self, "_sharded"):
                self._sharded.clear()

    def _splice_oracle(self, queries, bad_reads, lrep, sflat, soff):
        """Per-read exactness fallback: reads whose per-read buffers
        overflowed (LEP scan, round-2 task scan, round-3 hits) are
        recomputed with the scalar oracle and spliced into the flat
        output — the chunk keeps its device results."""
        from compseed_tpu.pipeline import seeding as sd
        from compseed_tpu.pipeline.chain import l_rep_one

        bad = set(int(r) for r in bad_reads)
        n_reads = len(queries)
        lrep = np.array(lrep, dtype=np.int64, copy=True)
        sseg = []
        for r in range(n_reads):
            if r in bad:
                m = sd.collect_matches(self.fm, self.opt, queries[r])
                seeds = sd.sample_seeds(self.opt, m)
                sd.resolve_sal(self.fm, [seeds])
                lrep[r] = l_rep_one(
                    [(beg, end, s) for (_, _, s, beg, end) in m],
                    self.opt.max_occ)
                sseg.append(np.array(
                    [(x.rbeg, x.qbeg, x.len) for x in seeds],
                    dtype=np.int64).reshape(-1, 3))
            else:
                sseg.append(sflat[soff[r]:soff[r + 1]])
        sflat = np.concatenate(sseg) if sseg else sflat[:0]
        soff = np.zeros(n_reads + 1, np.int64)
        np.cumsum([len(x) for x in sseg], out=soff[1:])
        return lrep, sflat, soff

    # ------------------------------------------------------------------
    def __call__(self, fm, opt, queries: list[np.ndarray], stats=None):
        """Per-read debug/test interface: [(matches, seeds)] per read.

        Matches carry full (k, l, s, beg, end) tuples; this path ships
        the extra interval columns and is for tests only.
        """
        from compseed_tpu.pipeline.types import Seed
        out = []
        n_reads = len(queries)
        R = _bucket(n_reads, 256)
        maxlen = max(len(q) for q in queries)
        L = _round_up(maxlen + 1, 32)
        qarr = np.full((R, L), 4, dtype=np.uint8)
        rlens = np.zeros(R, dtype=np.int32)
        for i, q in enumerate(queries):
            qarr[i, :len(q)] = q
            rlens[i] = len(q)
        fns = self._build(R, L)
        qd = jnp.asarray(qarr)
        rd = jnp.asarray(rlens)
        (pool, ok, rid, k, l, s, beg, end, ovf1, bad1, n_pool, n_u,
         fqc, fcc, bq1, bc1, memo) = fns["r1"](self.dfi, qd, rd)
        r2 = fns["r2"](self.dfi, qd, rd, ok, rid, k, s, beg, end, memo)
        r3 = fns["r3"](self.dfi, qd, rd, r2[15])
        merged = fns["merge"](ok, rid, k, l, s, beg, end,
                              *r2[:7], *r3[:7])
        mok, mrid, mk, ml, ms, mbeg, mend, mtotal, movf = merged
        seeds = fns["seeds"](self.dfi, mok, mrid, mk, ms, mbeg, mend)
        rbeg, qb, ln, stotal, n_uniq, seed_cnt, sovf = seeds
        host = jax.device_get((mok, mrid, mk, ml, ms, mbeg, mend,
                               rbeg, qb, ln, stotal, seed_cnt,
                               ovf1, bad1, r2[7], r2[8], r3[7], movf,
                               sovf, r3[8]))
        (mok_h, mrid_h, mk_h, ml_h, ms_h, mbeg_h, mend_h,
         rbeg_h, qb_h, ln_h, stotal_h, seed_cnt_h,
         o1, o2, o3, o4, o5, o6, o7, o8) = host
        if any(np.any(x) for x in (o1, o2, o3, o4, o5, o6, o7, o8)):
            from compseed_tpu.ops.smem import BatchSeeder
            return BatchSeeder(opt or self.opt, self.fm, self.dfi)(
                fm, opt or self.opt, queries, stats)
        valid = mok_h.astype(bool)
        mrid_v = mrid_h[valid]
        rows = np.stack([mk_h[valid], ml_h[valid], ms_h[valid],
                         mbeg_h[valid], mend_h[valid]], axis=1)
        stotal_h = int(stotal_h)
        soff = np.zeros(n_reads + 1, dtype=np.int64)
        np.cumsum(seed_cnt_h[:n_reads], out=soff[1:])
        srows = np.stack([rbeg_h[:stotal_h], qb_h[:stotal_h],
                          ln_h[:stotal_h]], axis=1)
        for r in range(n_reads):
            ms_r = [tuple(int(x) for x in row)
                    for row in rows[mrid_v == r]]
            sd = [Seed(rbeg=int(a), qbeg=int(b), len=int(c), score=int(c))
                  for a, b, c in srows[soff[r]: soff[r + 1]]]
            out.append((ms_r, sd))
        return out
