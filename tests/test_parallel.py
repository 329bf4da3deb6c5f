"""Mesh/distributed helpers on the 8-device virtual CPU platform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.parallel.distributed import create_pod_mesh, \
    process_batch_slice
from dcfp_tpu.parallel.mesh import batch_sharding, create_mesh, shard_batch
from dcfp_tpu.utils.profiling import flops_efficiency, sync, timeit


def test_create_pod_mesh_shapes():
    mesh = create_pod_mesh(n_spatial=2)
    assert mesh.axis_names == ("data", "spatial")
    assert mesh.devices.shape == (4, 2)


def test_create_pod_mesh_hybrid_two_slices():
    """Hybrid layout: 2 'slices' x 4 devices -> data axis 8 = 2(DCN) x 4."""
    mesh = create_pod_mesh(n_spatial=1, dcn_data_parallel=2)
    assert mesh.devices.shape == (8, 1)
    assert len({d.id for d in mesh.devices.ravel()}) == 8


def test_create_pod_mesh_validates():
    with pytest.raises(ValueError):
        create_pod_mesh(n_spatial=3)
    with pytest.raises(ValueError):
        create_pod_mesh(n_spatial=1, dcn_data_parallel=3)


def test_process_batch_slice_single_process():
    s = process_batch_slice(8)
    assert (s.start, s.stop) == (0, 8)


def test_spatial_sharded_conv_matches_unsharded():
    """A strided conv over an H-sharded input must equal the unsharded
    result — XLA's SPMD partitioner handles the halo exchange."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 4)).astype(np.float32))

    def f(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = np.asarray(jax.jit(f)(x))
    mesh = create_mesh(n_data=2, n_spatial=4)
    xs = jax.device_put(x, batch_sharding(mesh, spatial=True))
    got = np.asarray(jax.jit(f)(xs))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_timeit_and_sync():
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((128, 128))
    out = timeit(f, x, warmup=1, iters=3)
    assert out["ms"] > 0
    sync(f(x))
    eff = flops_efficiency(1e12, 0.01)
    assert abs(eff["tflops"] - 100.0) < 1e-6
