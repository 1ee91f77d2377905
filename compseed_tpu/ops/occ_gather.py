"""Pallas TPU row-gather kernel for the fused FM occ table.

Every FM operation (ops/fm.py) is bound by random 48-byte row gathers
from the HBM-resident occ table (ops/device_index.py, the TPU redesign
of bwt_occ4's checkpoint+bitplane reads, FM_index/bwt.c:98-105,169-186).
XLA lowers those gathers through its generic gather path, which on this
platform tops out around 57 M rows/s with a ~0.5 ms per-op floor.

This kernel instead issues ONE async DMA per row with a W-deep rotating
in-flight window, so the HBM row-fetch latency is hidden behind DMA
issue; the grid tiles the query vector so the SMEM-resident index block
stays small and output write-back pipelines with the next tile's DMAs.

Opt-in via COMPSEED_PALLAS_GATHER=1 (A/B against the XLA gather on real
hardware before making it the default); interpret mode covers CPU
correctness testing.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024      # queries per grid step (index block lives in SMEM)
WINDOW = 16      # in-flight DMAs per grid step


def _c(v):
    # With jax_enable_x64 on, bare python ints trace as int64 scalars,
    # which Mosaic cannot lower — pin every kernel literal to int32.
    return jnp.asarray(v, jnp.int32)


def _gather_kernel(idx_ref, table_ref, out_ref, sem):
    """out[i] = table[idx[i]] for the tile, W DMAs in flight."""
    T = out_ref.shape[0]
    W = sem.shape[0]

    def dma(i):
        slot = jax.lax.rem(i, _c(W))
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[i], 1), :],
            out_ref.at[pl.ds(i, 1), :],
            sem.at[slot])

    def body(i, carry):
        @pl.when(i >= _c(W))
        def _():
            dma(i - _c(W)).wait()

        @pl.when(i < _c(T))
        def _():
            dma(i).start()

        return carry

    jax.lax.fori_loop(_c(0), _c(T + W), body, _c(0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_call(table: jax.Array, idx: jax.Array, *,
                 interpret: bool = False) -> jax.Array:
    n = idx.shape[0]
    t = TILE if n >= TILE else max(8, -(-n // 8) * 8)
    n_pad = -(-n // t) * t
    idx32 = idx.astype(jnp.int32)
    if n_pad != n:
        idx32 = jnp.concatenate(
            [idx32, jnp.zeros(n_pad - n, jnp.int32)])
    w = min(WINDOW, t)
    out = pl.pallas_call(
        _gather_kernel,
        grid=(n_pad // t,),
        in_specs=[
            pl.BlockSpec((t,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((t, table.shape[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, table.shape[1]),
                                       table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((w,))],
        interpret=interpret,
    )(idx32, table)
    return out[:n]


def gather_rows_pallas(table: jax.Array, idx: jax.Array,
                       *, interpret: bool = False) -> jax.Array:
    """table: (B, C) — returns table[idx] for idx of any shape.

    Equivalent to ``table[idx]`` (XLA gather); idx must be in-range
    (callers clamp, matching the XLA path's semantics only for valid
    indices).
    """
    shape = idx.shape
    flat = _gather_call(table, idx.reshape(-1), interpret=interpret)
    return flat.reshape(shape + (table.shape[1],))


@functools.lru_cache(maxsize=1)
def _mode() -> str:
    return os.environ.get("COMPSEED_PALLAS_GATHER", "0")


def use_pallas_gather() -> bool:
    m = _mode()
    if m == "1":
        return jax.default_backend() != "cpu"
    if m == "interpret":      # CPU correctness testing
        return True
    return False


def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Dispatch: Pallas DMA kernel when enabled, else XLA gather."""
    if use_pallas_gather():
        return gather_rows_pallas(
            table, idx, interpret=jax.default_backend() == "cpu")
    return table[idx]
