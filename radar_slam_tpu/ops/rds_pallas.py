"""Pallas TPU kernel: the ENTIRE Range-Doppler Spectrum chain in one kernel.

Fuses dechirp x window x DC-removal x range DFT x slow-time window x Doppler
DFT x fftshift (the full ``signal/rds.py`` chain, reference
``src/radar_signal/dechirp.py:122-213``) into a single VMEM-resident program
per frame:

- both transforms are DFT *matmuls* on the MXU (the dechirp/window/DC ops
  fold into the range DFT matrix, the slow-time window and fftshift into the
  Doppler matrix -- see ``signal/rds.py:range_dft_matrix`` /
  ``doppler_dft_matrix``);
- one frame's [A, C, S] cube is read from HBM exactly once and the [A, S, C]
  RDS written exactly once; the XLA FFT path round-trips HBM between the
  dechirp, range FFT, transpose and Doppler FFT stages;
- complex data is carried as separate re/im f32 planes (TPU Pallas has no
  complex registers), so each complex matmul is four real MXU matmuls.

Grid = one program per frame; the DFT matrices use constant index maps so
Pallas keeps them VMEM-resident across grid steps while double-buffering the
frame blocks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


_DIMS = (((1,), (0,)), ((), ()))


def _mm_bf16x3(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32-accurate matmul from three bf16 MXU passes (a_hi b_hi + a_hi b_lo
    + a_lo b_hi; the lo*lo term is below the f32 rounding floor).  Mosaic has
    no HIGH dot precision and its HIGHEST (6-pass) path measured slower than
    XLA's FFT; this is the XLA bf16_3x algorithm done by hand."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=_DIMS,
                            preferred_element_type=jnp.float32)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _mm_f32(a: jax.Array, b: jax.Array) -> jax.Array:
    return jax.lax.dot_general(a, b, dimension_numbers=_DIMS,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _cmm(ar, ai, br, bi, mm):
    """Complex matmul via Karatsuba: 3 real matmuls instead of 4."""
    t1 = mm(ar, br)
    t2 = mm(ai, bi)
    t3 = mm(ar + ai, br + bi)
    return t1 - t2, t3 - t1 - t2


def _kernel(xr_ref, xi_ref, wrr_ref, wri_ref, wdr_ref, wdi_ref,
            or_ref, oi_ref, *, A: int, C: int, use_f32: bool):
    mm = _mm_f32 if use_f32 else _mm_bf16x3

    xr = xr_ref[0]                                  # [A*C, S_pad]
    xi = xi_ref[0]
    zr, zi = _cmm(xr, xi, wrr_ref[:], wri_ref[:], mm)   # range DFT chain

    wdr, wdi = wdr_ref[:], wdi_ref[:]               # [C, C]
    for a in range(A):
        yr = zr[a * C:(a + 1) * C, :].T             # [S_pad, C]
        yi = zi[a * C:(a + 1) * C, :].T
        o_r, o_i = _cmm(yr, yi, wdr, wdi, _mm_f32)  # Doppler DFT (+ shift)
        or_ref[0, a] = o_r
        oi_ref[0, a] = o_i


@functools.partial(jax.jit,
                   static_argnames=("dc_removal", "doppler_window",
                                    "precision_name"))
def rds_fused(signals: jax.Array, mix: jax.Array, dc_removal: bool = True,
              doppler_window: Optional[str] = None,
              precision_name: str = "highest") -> jax.Array:
    """Full RDS as one fused Pallas kernel.

    Args:
        signals: complex64 [..., A, C, S] baseband (or raw, with the conj
            reference chirp folded into ``mix``).
        mix: complex64 [S] dechirp x fast-time-window vector.
    Returns:
        complex64 [..., A, S, C] RDS (range axis unshifted, Doppler axis
        fftshifted -- same conventions as signal/rds.py).
    """
    from radar_slam_tpu.signal.rds import doppler_dft_matrix, range_dft_matrix

    *batch, A, C, S = signals.shape
    F = 1
    for d in batch:
        F *= d
    S_pad = _round_up(S, 128)
    # "highest" -> Mosaic 6-pass f32 dots; anything else -> manual bf16x3
    # (~16-bit mantissa, 2x faster; the Doppler stage always runs f32).
    use_f32 = precision_name == "highest"

    x = signals.reshape(F, A * C, S)
    xr = jnp.zeros((F, A * C, S_pad), jnp.float32).at[..., :S].set(x.real)
    xi = jnp.zeros((F, A * C, S_pad), jnp.float32).at[..., :S].set(x.imag)

    w_rng = range_dft_matrix(S, mix, dc_removal)            # [S, S]
    wrr = jnp.zeros((S_pad, S_pad), jnp.float32).at[:S, :S].set(w_rng.real)
    wri = jnp.zeros((S_pad, S_pad), jnp.float32).at[:S, :S].set(w_rng.imag)
    w_dop = doppler_dft_matrix(C, doppler_window)           # [C, C]
    wdr = w_dop.real.astype(jnp.float32)
    wdi = w_dop.imag.astype(jnp.float32)

    frame_spec = pl.BlockSpec((1, A * C, S_pad), lambda f: (f, 0, 0),
                              memory_space=pltpu.VMEM)
    wr_spec = pl.BlockSpec((S_pad, S_pad), lambda f: (0, 0),
                           memory_space=pltpu.VMEM)
    wd_spec = pl.BlockSpec((C, C), lambda f: (0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, A, S_pad, C), lambda f: (f, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    yr, yi = pl.pallas_call(
        functools.partial(_kernel, A=A, C=C, use_f32=use_f32),
        grid=(F,),
        in_specs=[frame_spec, frame_spec, wr_spec, wr_spec, wd_spec, wd_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((F, A, S_pad, C), jnp.float32),
                   jax.ShapeDtypeStruct((F, A, S_pad, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=F * (8 * A * C * S_pad * S_pad + 8 * A * S_pad * C * C),
            bytes_accessed=F * A * C * (S_pad + S_pad) * 8,
            transcendentals=0),
        # The default 16 MB scoped-VMEM budget is too tight for the f32
        # matmul temporaries at HIGHEST precision; v5e has headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xr, xi, wrr, wri, wdr, wdi)

    rds = (yr[:, :, :S, :] + 1j * yi[:, :, :S, :]).astype(jnp.complex64)
    return rds.reshape(*batch, A, S, C)
