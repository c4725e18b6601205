"""Safe device-to-host transfer.

The axon TPU backend (the PJRT plugin this container tunnels through) hangs
indefinitely on device-to-host transfers of complex64 arrays (verified:
``np.asarray`` on a jitted complex output never returns).  Everything on the
compute path is fine -- complex math inside jit works -- only the host
transfer is broken.  :func:`device_get` splits complex leaves into re/im
float32 planes on-device and recombines them on the host; all artifact and
checkpoint code routes through it.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _split(x):
    return jnp.real(x), jnp.imag(x)


def _leaf_to_host(x):
    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.complexfloating):
        re, im = _split(x)
        return np.asarray(re) + 1j * np.asarray(im)
    return np.asarray(x)


def device_get(tree: Any) -> Any:
    """Pytree-aware host fetch that is safe for complex arrays."""
    return jax.tree.map(_leaf_to_host, tree)


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


def _leaf_to_device(x):
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.complexfloating):
        # Host->device of complex64 fails on axon at ANY size (verified:
        # jnp.asarray of a 1 MB complex64 array raises UNIMPLEMENTED while
        # 210 MB float32 uploads fine); upload re/im planes and combine
        # on-device.
        return _combine(jnp.asarray(x.real.astype(np.float32)),
                        jnp.asarray(x.imag.astype(np.float32)))
    return jnp.asarray(x)


def device_put(tree: Any) -> Any:
    """Pytree-aware host->device upload that is safe for complex arrays."""
    return jax.tree.map(_leaf_to_device, tree)
