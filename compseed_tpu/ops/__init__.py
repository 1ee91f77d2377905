"""Device (TPU) kernels: batched FM-index queries, SMEM seeding, banded SW.

Everything here is fixed-shape jax (jit/vmap/scan) with Pallas fast paths
for the hot gathers/DP.  int64 support is enabled for large genomes (the
hg19 forward+reverse index has 2*l_pac > 2^32 positions); small genomes use
int32 throughout (DeviceFMIndex.idx_dtype).
"""

import jax

jax.config.update("jax_enable_x64", True)
