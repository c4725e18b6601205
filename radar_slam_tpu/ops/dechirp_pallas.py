"""Pallas TPU kernel: fused dechirp x window x DC-removal.

The first stage of the RDS chain (``signal/rds.py``): multiply each chirp's
fast-time samples by a precomputed complex mix vector (conj reference chirp x
window, or window only for baseband input) and subtract the per-chirp mean
(dechirp.py:122-166 semantics, fused into one VMEM pass).

Complex data is carried as separate re/im float32 planes (TPU Pallas has no
complex registers); the [A, C, S] cube is flattened to rows [A*C, S] and
tiled over the sublane axis.  Everything stays in VMEM for one grid step:
read row tile -> complex multiply -> row-mean subtract -> write.

The jnp reference implementation (used on CPU and as the test oracle) is
:func:`dechirp_window_dc_reference`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dechirp_window_dc_reference(signals: jax.Array, mix: jax.Array,
                                dc_removal: bool = True) -> jax.Array:
    """jnp oracle: signals [..., S] complex64, mix [S] complex64."""
    x = signals * mix
    if dc_removal:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
    return x


def _kernel(sr_ref, si_ref, mr_ref, mi_ref, or_ref, oi_ref, *, dc, n_valid):
    sr = sr_ref[:]                       # [TILE_R, S_pad]
    si = si_ref[:]
    mr = mr_ref[:]                       # [1, S_pad]
    mi = mi_ref[:]
    yr = sr * mr - si * mi
    yi = sr * mi + si * mr
    if dc:
        # Mean over the *valid* samples only (padding columns hold zeros in
        # mix, so they contribute zero to the sum).
        inv_n = 1.0 / float(n_valid)
        mean_r = jnp.sum(yr, axis=1, keepdims=True) * inv_n
        mean_i = jnp.sum(yi, axis=1, keepdims=True) * inv_n
        # Only subtract on valid columns (keep padding at zero).
        col = jax.lax.broadcasted_iota(jnp.int32, yr.shape, 1)
        valid = (col < n_valid).astype(yr.dtype)
        yr = yr - mean_r * valid
        yi = yi - mean_i * valid
    or_ref[:] = yr
    oi_ref[:] = yi


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("dc_removal",))
def dechirp_window_dc(signals: jax.Array, mix: jax.Array,
                      dc_removal: bool = True) -> jax.Array:
    """Fused dechirp+window+DC as a Pallas kernel.

    Args:
        signals: complex64 [A, C, S] (or any [..., S]).
        mix: complex64 [S] (conj reference chirp x window).
    Returns:
        complex64, same shape as ``signals``.
    """
    shape = signals.shape
    S = shape[-1]
    rows = 1
    for d in shape[:-1]:
        rows *= d

    S_pad = _round_up(S, 128)
    R_pad = _round_up(rows, 8)
    TILE_R = 8 if R_pad % 8 == 0 else R_pad

    x = signals.reshape(rows, S)
    sr = jnp.zeros((R_pad, S_pad), jnp.float32).at[:rows, :S].set(x.real)
    si = jnp.zeros((R_pad, S_pad), jnp.float32).at[:rows, :S].set(x.imag)
    mr = jnp.zeros((1, S_pad), jnp.float32).at[0, :S].set(mix.real)
    mi = jnp.zeros((1, S_pad), jnp.float32).at[0, :S].set(mix.imag)

    grid = (R_pad // TILE_R,)
    row_spec = pl.BlockSpec((TILE_R, S_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    mix_spec = pl.BlockSpec((1, S_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    yr, yi = pl.pallas_call(
        functools.partial(_kernel, dc=dc_removal, n_valid=S),
        grid=grid,
        in_specs=[row_spec, row_spec, mix_spec, mix_spec],
        out_specs=[row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct((R_pad, S_pad), jnp.float32),
                   jax.ShapeDtypeStruct((R_pad, S_pad), jnp.float32)],
    )(sr, si, mr, mi)

    y = (yr[:rows, :S] + 1j * yi[:rows, :S]).astype(jnp.complex64)
    return y.reshape(shape)
