"""utils.host.device_get and parallel.distributed helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from radar_slam_tpu.parallel import distributed
from radar_slam_tpu.utils.host import device_get


def test_device_get_complex_and_pytree():
    @jax.jit
    def make():
        return {"c": (jnp.arange(6, dtype=jnp.float32)
                      + 1j * jnp.ones(6)).astype(jnp.complex64),
                "f": jnp.ones((2, 3)),
                "i": jnp.arange(4, dtype=jnp.int32)}
    host = device_get(make())
    assert host["c"].dtype == np.complex128 or host["c"].dtype == np.complex64
    np.testing.assert_allclose(host["c"].real, np.arange(6))
    np.testing.assert_allclose(host["c"].imag, 1.0)
    assert isinstance(host["f"], np.ndarray) and host["f"].shape == (2, 3)
    assert host["i"].dtype == np.int32


def test_device_get_passthrough_numpy():
    x = np.ones(3)
    out = device_get({"x": x})
    np.testing.assert_array_equal(out["x"], x)


def test_distributed_topology_single_process():
    info = distributed.initialize()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1
    assert not distributed.is_multihost()
