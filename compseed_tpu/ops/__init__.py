"""Device (TPU) kernels: batched FM-index queries, SMEM seeding, banded SW.

Everything here is fixed-shape jax (jit/vmap/scan) with Pallas fast paths
for the hot gathers/DP.  int64 support is enabled for large genomes (the
hg19 forward+reverse index has 2*l_pac > 2^32 positions); small genomes use
int32 throughout (DeviceFMIndex.idx_dtype).
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the fused seeding/DP programs take minutes
# to compile on first use; cache them across processes (safe to share, the
# key includes program + flags + platform).
_cache_dir = os.environ.get(
    "COMPSEED_JIT_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
if _cache_dir and _cache_dir != "0":
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # cache is best-effort; never block the import
        pass
