"""Batched FMD-index queries on device.

Contracts (exact integer semantics, validated against cpu.fm_oracle):
  occ4_batch    — bwt_occ4 (FM_index/bwt.c:169-186)
  extend_batch  — bwt_extend (FM_index/bwt.c:262-275)
  sa_batch      — bwt_sa via inverse-Psi walk (FM_index/bwt.c:53-96)

Design: one occ query = gather one checkpoint row (4 counts) + one
128-byte code row, then a masked compare-reduce over the 128 lanes (VPU
native).  All batch shapes are static; invalid lanes are masked with
k == -1 which the reference also treats as "count zero".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from compseed_tpu.ops.device_index import DeviceFMIndex


def occ4_batch(fm: DeviceFMIndex, k: jax.Array) -> jax.Array:
    """Counts of each base in BWT[0..k] inclusive. k: (...,) -> (..., 4).

    k == -1 lanes return zeros (bwt.c:173-175).
    """
    dt = fm.cp_occ.dtype
    k = k.astype(dt)
    valid = k != -1
    kk = jnp.where(valid, k - (k >= fm.primary).astype(dt), 0)
    block = kk >> 7
    off = kk & 0x7F
    cnt = fm.cp_occ[block]                      # (..., 4)
    codes = fm.bwt_codes[block]                 # (..., 128)
    lane = jnp.arange(128, dtype=jnp.int32)
    inb = lane <= off[..., None].astype(jnp.int32)  # positions <= off
    onehot = (codes[..., None] == jnp.arange(4, dtype=jnp.uint8)) & \
        inb[..., None]
    cnt = cnt + onehot.sum(axis=-2, dtype=dt)
    return jnp.where(valid[..., None], cnt, jnp.zeros_like(cnt))


def extend_batch(fm: DeviceFMIndex, ik: jax.Array, is_back: bool) -> jax.Array:
    """Bidirectional extension. ik: (..., 3) -> ok: (..., 4, 3).

    ok[..., c, :] is the child bi-interval for base c.
    """
    dt = fm.cp_occ.dtype
    ik = ik.astype(dt)
    fwd = 1 - int(bool(is_back))  # coordinate being searched (x[!is_back])
    bwd = 1 - fwd
    x = ik[..., fwd]
    s = ik[..., 2]
    tk = occ4_batch(fm, x - 1)                  # (..., 4)
    tl = occ4_batch(fm, x - 1 + s)
    sizes = tl - tk                             # (..., 4)
    coord_f = fm.L2[:4] + 1 + tk                # (..., 4)
    contains_primary = ((x <= fm.primary) &
                        (x + s - 1 >= fm.primary)).astype(dt)
    b3 = ik[..., bwd] + contains_primary
    b2 = b3 + sizes[..., 3]
    b1 = b2 + sizes[..., 2]
    b0 = b1 + sizes[..., 1]
    coord_b = jnp.stack([b0, b1, b2, b3], axis=-1)
    ok = jnp.zeros(ik.shape[:-1] + (4, 3), dtype=dt)
    ok = ok.at[..., fwd].set(coord_f)
    ok = ok.at[..., bwd].set(coord_b)
    ok = ok.at[..., 2].set(sizes)
    return ok


def bwt_b0_batch(fm: DeviceFMIndex, k: jax.Array) -> jax.Array:
    """Base at BWT position k (bwt_B0, bwt.h:80)."""
    return fm.bwt_codes[k >> 7, k & 0x7F].astype(jnp.int32)


def inv_psi_batch(fm: DeviceFMIndex, k: jax.Array) -> jax.Array:
    """One LF step per lane (bwt_invPsi, bwt.c:53-59)."""
    dt = fm.cp_occ.dtype
    k = k.astype(dt)
    x = k - (k > fm.primary).astype(dt)
    c = bwt_b0_batch(fm, x)
    occ = jnp.take_along_axis(occ4_batch(fm, k), c[..., None].astype(jnp.int32),
                              axis=-1)[..., 0]
    res = fm.L2[c] + occ
    return jnp.where(k == fm.primary, jnp.zeros_like(res), res)


def sa_batch(fm: DeviceFMIndex, k: jax.Array) -> jax.Array:
    """SA[k] per lane via masked inverse-Psi walk (bwt_sa, bwt.c:86-96).

    The walk is at most sa_intv-1 steps; finished lanes idle under a mask.
    """
    dt = fm.cp_occ.dtype
    k = k.astype(dt)
    mask = fm.sa_intv - 1
    steps = jnp.zeros_like(k)

    def body(state):
        k, steps = state
        active = (k & mask) != 0
        k_next = inv_psi_batch(fm, k)
        k = jnp.where(active, k_next, k)
        steps = steps + active.astype(dt)
        return k, steps

    def cond(state):
        k, _ = state
        return jnp.any((k & mask) != 0)

    k, steps = jax.lax.while_loop(cond, body, (k, steps))
    return steps + fm.sa_sampled[k // fm.sa_intv]
