"""Device-resident FM-index.

HBM layout (TPU-first redesign of the bwt_t blob, FM_index/bwt.h:48-60):
the interleaved on-disk stream is split into two aligned arrays so a batch
occ query is two row gathers:

  * ``cp_occ``    (n_blocks+1, 4)  — checkpoint counts every 128 bases
  * ``bwt_codes`` (n_blocks, 128)  — 2-bit codes expanded to uint8 rows
    (one VPU-lane row per block; byte-expanded because TPU gathers +
    vector compares on int8 lanes beat in-register 2-bit unpacking, and
    128 bytes/block keeps HBM traffic per query at one 128B line pair)
  * ``sa_sampled`` (n_sa,)         — sampled suffix array (intv 32)
  * ``pac_bases`` (l_pac padded,)  — forward reference as uint8 codes for
    on-device reference-window fetches

Counts/positions use int32 when they fit (seq_len + 1 < 2^31), else int64.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from compseed_tpu.index.build import OCC_INTERVAL, unpack_pac
from compseed_tpu.index.fmindex import FMIndex


@partial(jax.tree_util.register_dataclass,
         data_fields=["cp_occ", "bwt_codes", "sa_sampled", "L2", "pac_bases"],
         meta_fields=["primary", "seq_len", "sa_intv", "l_pac", "idx_dtype"])
@dataclass(frozen=True)
class DeviceFMIndex:
    cp_occ: jax.Array      # (n_blocks+1, 4) idx_dtype
    bwt_codes: jax.Array   # (n_blocks, 128) uint8
    sa_sampled: jax.Array  # (n_sa,) idx_dtype
    L2: jax.Array          # (5,) idx_dtype
    pac_bases: jax.Array   # (ceil(l_pac/128)*128,) uint8
    primary: int
    seq_len: int
    sa_intv: int
    l_pac: int
    idx_dtype: np.dtype


def expand_bwt_codes(bwt_words: np.ndarray) -> np.ndarray:
    """(n_blocks, 8) packed uint32 -> (n_blocks, 128) uint8 codes."""
    n_blocks = bwt_words.shape[0]
    shifts = np.array([(15 - j) << 1 for j in range(16)], dtype=np.uint32)
    expanded = (bwt_words[:, :, None] >> shifts[None, None, :]) & 3
    return expanded.reshape(n_blocks, 128).astype(np.uint8)


def to_device(fm: FMIndex) -> DeviceFMIndex:
    idx_dtype = np.int32 if fm.seq_len + 1 < 2**31 else np.int64
    codes = expand_bwt_codes(fm.bwt_words)
    pac = unpack_pac(fm.pac, fm.l_pac)
    pad = (-len(pac)) % 128
    if pad:
        pac = np.concatenate([pac, np.zeros(pad, dtype=np.uint8)])
    return DeviceFMIndex(
        cp_occ=jnp.asarray(fm.cp_occ.astype(idx_dtype)),
        bwt_codes=jnp.asarray(codes),
        sa_sampled=jnp.asarray(fm.sa_sampled.astype(idx_dtype)),
        L2=jnp.asarray(fm.L2.astype(idx_dtype)),
        pac_bases=jnp.asarray(pac),
        primary=fm.primary,
        seq_len=fm.seq_len,
        sa_intv=fm.sa_intv,
        l_pac=fm.l_pac,
        idx_dtype=idx_dtype,
    )
