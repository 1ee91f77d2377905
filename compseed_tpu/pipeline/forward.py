"""Fused on-device forward step: seeding -> SA -> ref fetch -> banded SW.

One jittable function covering the whole device compute path of the
aligner for a batch of reads (the "flagship forward step"): per read, the
round-1 SMEM scan finds the longest exact match, its suffix-array position
resolves through the inverse-Psi walk, the reference window gathers from
the device pac, and the banded-SW extension scores the full read against
it.  This is the unit that shards over the `data` mesh axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from compseed_tpu.ops import fm as dfm
from compseed_tpu.ops import smem as dsmem
from compseed_tpu.ops.bsw import bsw_extend
from compseed_tpu.ops.device_index import DeviceFMIndex
from compseed_tpu.ops.ref import fetch_windows


def align_forward_step(dfi: DeviceFMIndex, qbatch: jax.Array,
                       match_score: int = 1, window_pad: int = 32):
    """qbatch: (B, L) uint8 nt4 codes -> (scores, rbegs, seed_lens)."""
    B, L = qbatch.shape
    i32 = jnp.int32

    collect = jax.vmap(partial(dsmem._collect_one, dfi, L))
    packed = collect(
        qbatch,
        jnp.zeros(B, i32),
        jnp.ones(B, i32),
        jnp.ones(B, jnp.bool_),
    )
    mems = packed[:, : dsmem.MMEM * 5].reshape(B, dsmem.MMEM, 5)
    n_mems = packed[:, dsmem.MMEM * 5].astype(i32)
    # longest match per read
    valid = jnp.arange(mems.shape[1])[None, :] < n_mems[:, None]
    lens = jnp.where(valid, (mems[:, :, 4] - mems[:, :, 3]).astype(i32), -1)
    best = jnp.argmax(lens, axis=1)
    m = jnp.take_along_axis(mems, best[:, None, None], axis=1)[:, 0, :]
    k, beg, end = m[:, 0], m[:, 3].astype(i32), m[:, 4].astype(i32)
    seed_len = end - beg

    rbeg = dfm.sa_batch(dfi, k)            # suffix-array resolution

    W = L + 2 * window_pad
    wbeg = rbeg - beg.astype(rbeg.dtype) - window_pad
    windows = fetch_windows(dfi, wbeg, W)  # (B, W)

    import numpy as np
    from compseed_tpu.options import fill_scmat
    mat = jnp.asarray(np.array(fill_scmat(match_score, 4),
                               dtype=np.int32).reshape(5, 5))
    scores, qle, tle, gtle, gscore, max_off = bsw_extend(
        6, 1, 6, 1, 100, 5, match_score, mat,
        jnp.int32(100),
        qbatch, jnp.full(B, L, i32),
        windows, jnp.full(B, W, i32),
        jnp.maximum(seed_len * match_score, 1),
    )
    return scores, rbeg, seed_len
