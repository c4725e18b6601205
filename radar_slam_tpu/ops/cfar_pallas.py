"""Pallas TPU kernel: power map + local-max + CA-CFAR detection mask.

Fuses the detection front half (``signal/detect.py``): non-coherent power
over antennas, dB conversion, NxN local-maximum test, and the CA-CFAR noise
estimate, producing the power map and the boolean detection mask in one VMEM
pass over the [A, R, D] RDS cube (top-K selection stays in XLA --
``lax.top_k`` is already optimal there).

Sliding windows are computed with separable shifted adds (`pltpu.roll` along
each axis): an NxN box needs 2N rolls instead of N^2, and the local max uses
the same decomposition with `jnp.maximum`.  Everything fits VMEM for the
operating shapes (400 x 64 float32 maps).

jnp oracle: :func:`cfar_mask_reference`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# jnp oracle (mirrors signal/detect.py logic)
# ---------------------------------------------------------------------------

def cfar_mask_reference(rds: jax.Array, threshold_db: float,
                        neighborhood: int, train: int, guard: int,
                        offset_db: float):
    from radar_slam_tpu.signal.detect import (_box_mean2d, _maxpool2d_same,
                                              power_spectrum_db)
    power_db = power_spectrum_db(rds)
    is_peak = _maxpool2d_same(power_db, neighborhood) == power_db
    if train > 0:
        t = 2 * train + 2 * guard + 1
        g = 2 * guard + 1
        p_lin = 10.0 ** (power_db / 10.0)
        noise = _box_mean2d(p_lin, t)
        if guard > 0:
            gm = _box_mean2d(p_lin, g)
            noise = (noise * t * t - gm * g * g) / (t * t - g * g)
        noise_db = 10.0 * jnp.log10(jnp.maximum(noise, 1e-12))
        thresh = jnp.maximum(noise_db + offset_db, threshold_db)
    else:
        thresh = jnp.float32(threshold_db)
    return power_db, is_peak & (power_db > thresh)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _shift2(x, dr, dc, fill):
    """Shift x by (dr, dc) with `fill` at the revealed edge (non-circular).

    pltpu.roll only takes non-negative shifts; negative shifts are expressed
    as (n - d) circular rolls, then the wrapped edge is masked with `fill`.
    """
    R, C = x.shape
    y = x
    if dr:
        y = pltpu.roll(y, (-dr) % R, 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
        valid = (rows < R - dr) if dr > 0 else (rows >= -dr)
        y = jnp.where(valid, y, fill)
    if dc:
        y = pltpu.roll(y, (-dc) % C, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        valid = (cols < C - dc) if dc > 0 else (cols >= -dc)
        y = jnp.where(valid, y, fill)
    return y


def _sep_reduce(x, half, op, fill):
    """Separable (2*half+1)^2 window reduce via shifted ops (unrolled)."""
    acc = x
    for d in range(1, half + 1):
        acc = op(acc, _shift2(x, d, 0, fill))
        acc = op(acc, _shift2(x, -d, 0, fill))
    out = acc
    for d in range(1, half + 1):
        out = op(out, _shift2(acc, 0, d, fill))
        out = op(out, _shift2(acc, 0, -d, fill))
    return out


def _counts2d(R, C, R_valid, C_valid, half):
    """In-bounds cell count of a (2*half+1)^2 window, counting only the
    valid (un-padded) region -- matches the zero-extended oracle whose
    divisor is the in-bounds window size of the *valid* map."""
    i = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    r = jnp.minimum(i, half) + jnp.minimum(jnp.maximum(R_valid - 1 - i, 0), half) + 1
    c = jnp.minimum(j, half) + jnp.minimum(jnp.maximum(C_valid - 1 - j, 0), half) + 1
    return jnp.maximum(r.astype(jnp.float32) * c.astype(jnp.float32), 1.0)


def _kernel(pr_ref, pi_ref, pdb_ref, mask_ref, *, A, R, D, R_valid, D_valid,
            threshold_db, neighborhood, train, guard, offset_db):
    # Non-coherent power over antennas: inputs are [A*R, D] stacked planes.
    p = jnp.zeros((R, D), jnp.float32)
    for a in range(A):
        rr = pr_ref[pl.ds(a * R, R), :]
        ii = pi_ref[pl.ds(a * R, R), :]
        p += rr * rr + ii * ii
    p = p * (1.0 / A)
    power_db = 10.0 * jnp.log10(p + 1e-12)

    nh = neighborhood // 2
    local_max = _sep_reduce(power_db, nh, jnp.maximum, -jnp.inf)
    is_peak = local_max == power_db

    if train > 0:
        th = train + guard
        t_sum = _sep_reduce(p, th, jnp.add, 0.0)
        t_cnt = _counts2d(R, D, R_valid, D_valid, th)
        if guard > 0:
            g_sum = _sep_reduce(p, guard, jnp.add, 0.0)
            g_cnt = _counts2d(R, D, R_valid, D_valid, guard)
            # Mirror signal/detect.py exactly: means are in-bounds box means,
            # recombined with FULL window areas.
            T2 = float((2 * th + 1) ** 2)
            G2 = float((2 * guard + 1) ** 2)
            noise = ((t_sum / t_cnt) * T2 - (g_sum / g_cnt) * G2) / (T2 - G2)
        else:
            noise = t_sum / t_cnt
        noise_db = 10.0 * jnp.log10(jnp.maximum(noise, 1e-12))
        thresh = jnp.maximum(noise_db + offset_db, threshold_db)
    else:
        thresh = jnp.float32(threshold_db)

    pdb_ref[:] = power_db
    mask_ref[:] = (is_peak & (power_db > thresh)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "threshold_db", "neighborhood", "train", "guard", "offset_db"))
def cfar_mask(rds: jax.Array, threshold_db: float = -25.0,
              neighborhood: int = 3, train: int = 0, guard: int = 0,
              offset_db: float = 12.0):
    """Fused power + local-max + CFAR mask over an RDS cube [A, R, D].

    Returns (power_db [R, D], mask [R, D] bool).

    Note: window edges use shrinking (in-bounds) cell counts, equivalent to
    the zero-extended box mean in the jnp oracle.
    """
    A, R, D = rds.shape
    D_pad = -(-D // 128) * 128
    R_pad = -(-R // 8) * 8

    pr = jnp.zeros((A * R_pad, D_pad), jnp.float32)
    pi = jnp.zeros((A * R_pad, D_pad), jnp.float32)
    # Stack antenna planes along rows.
    pr = pr.reshape(A, R_pad, D_pad).at[:, :R, :D].set(rds.real)\
        .reshape(A * R_pad, D_pad)
    pi = pi.reshape(A, R_pad, D_pad).at[:, :R, :D].set(rds.imag)\
        .reshape(A * R_pad, D_pad)

    pdb, mask = pl.pallas_call(
        functools.partial(_kernel, A=A, R=R_pad, D=D_pad,
                          R_valid=R, D_valid=D,
                          threshold_db=float(threshold_db),
                          neighborhood=neighborhood, train=train,
                          guard=guard, offset_db=float(offset_db)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((R_pad, D_pad), jnp.float32),
                   jax.ShapeDtypeStruct((R_pad, D_pad), jnp.float32)],
    )(pr, pi)

    return pdb[:R, :D], mask[:R, :D] > 0.5
