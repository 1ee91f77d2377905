"""Multi-device data parallelism on the virtual CPU mesh."""

import numpy as np
import pytest


def test_data_parallel_step_8dev(tiny_fm):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    from compseed_tpu.ops.device_index import to_device
    from compseed_tpu.parallel.mesh import data_parallel_step, make_mesh
    from compseed_tpu.pipeline.forward import align_forward_step
    from tests.test_ops_smem import _fixture_queries

    mesh = make_mesh(jax.devices()[:8])
    dfi = to_device(tiny_fm)
    queries = _fixture_queries(16)
    L = max(len(q) for q in queries)
    qarr = np.full((16, L), 4, np.uint8)
    for i, q in enumerate(queries):
        qarr[i, :len(q)] = q
    run = data_parallel_step(mesh, align_forward_step, dfi)
    scores, rbegs, seed_lens = run(jnp.asarray(qarr))
    assert scores.shape == (16,)
    assert (np.asarray(seed_lens) > 0).all()
    # sharded across all 8 devices
    assert len(scores.sharding.device_set) == 8
