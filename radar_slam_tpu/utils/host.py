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
