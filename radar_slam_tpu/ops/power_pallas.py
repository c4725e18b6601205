"""Pallas TPU kernel: ADC cube -> non-coherent range-Doppler POWER map.

The detection stage only consumes the antenna-integrated power map
``mean_a |rds[a, r, d]|^2`` (signal/detect.py), and the AoA stage only the
K detected cells' spatial signatures -- the full complex RDS cube
[A, R, D] is an intermediate nobody keeps.  The round-2 shoot-out
(docs/BENCHMARKS.md) found a 3x isolated DFT-matmul win that LOST end to
end because it materialized the cube (and its padded re/im planes) in HBM;
this kernel is the "make the fast kernel fusable" answer (VERDICT round-2
item 1): dechirp x window x DC x range DFT x Doppler DFT x |.|^2 x
antenna-mean in ONE VMEM-resident program that reads each frame's cube
once and writes only the [R, D] float32 power map -- 16x less HBM output
than the complex cube, zero padded planes.

Replaces (with ``signal/rds.py:rds_power``) the reference chain
``src/radar_signal/dechirp.py:168-213`` (RDS) + ``:215-244`` (power) for
the detection path.  Spatial signatures for the top-K detected cells are
recomputed afterwards at f32-exact precision from the same input by
``signal/rds.py:detection_signatures`` -- O(A C S K) instead of O(A C S S).

Layout: the kernel accumulates power as [D, S] per frame (Doppler-major:
32 sublanes x 400 lanes fits the f32 (8, 128) VMEM tiling with no
transposes of the big intermediates -- the Doppler DFT runs as
``W_dop^T @ Z_a``), and the public wrapper transposes the tiny map to the
detection convention [R, D].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radar_slam_tpu.ops.rds_pallas import _cmm, _mm_bf16x3, _mm_f32

_DIMS = (((1,), (0,)), ((), ()))


def _mm_bf16(a: jax.Array, b: jax.Array) -> jax.Array:
    """Single-pass bf16 MXU matmul with f32 accumulation (~3e-3 relative
    error on this workload -- 0.013 dB on the power map, far inside every
    CFAR margin; signatures are recomputed at f32 elsewhere)."""
    return jax.lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                               dimension_numbers=_DIMS,
                               preferred_element_type=jnp.float32)


_MMS = {"default": _mm_bf16, "high": _mm_bf16x3, "highest": _mm_f32}


def _doppler_power(zr, zi, wdtr, wdti, A: int, C: int, mm_dop,
                   layout: str):
    """Doppler DFT + |.|^2 + antenna-sum of range-DFT'd planes.

    zr/zi: [A*C, S] (antenna-major rows); wdtr/wdti: [D, C] (= W_dop^T).
    Returns the un-normalized power accumulator [D, S] (f32).  Shared by
    the cube-input kernel below and ops/synthpower_pallas.py's cube-free
    kernel (identical Doppler stage, different producers).
    """
    S = zr.shape[-1]
    if layout == "wide":
        # One [D, C] @ [C, A*S] matmul instead of A small ones: the A-loop's
        # [D, C] x [C, S] dots are M=K=32-class MXU issues whose per-dot
        # overhead dominates; paying one VMEM relayout (A, C) -> (C, A)
        # buys a single wide-N dot.  The relayout is expressed as lane
        # concatenation of the A [C, S] row-blocks (and the reduction as a
        # lane-slice sum): Mosaic rejects the equivalent 3-D
        # reshape/transpose ("unsupported shape cast" on real hardware).
        z2r = jnp.concatenate([zr[a * C:(a + 1) * C, :] for a in range(A)],
                              axis=1)                     # [C, A*S]
        z2i = jnp.concatenate([zi[a * C:(a + 1) * C, :] for a in range(A)],
                              axis=1)
        o_r, o_i = _cmm(wdtr, wdti, z2r, z2i, mm_dop)     # [D, A*S]
        p = o_r * o_r + o_i * o_i
        acc = jnp.zeros((wdtr.shape[0], S), jnp.float32)
        for a in range(A):
            acc = acc + p[:, a * S:(a + 1) * S]
        return acc
    if layout != "loop":
        raise ValueError(f"Unknown doppler_layout: {layout}")
    acc = jnp.zeros((wdtr.shape[0], S), jnp.float32)      # [D, S]
    for a in range(A):
        zar = zr[a * C:(a + 1) * C, :]                    # [C, S]
        zai = zi[a * C:(a + 1) * C, :]
        o_r, o_i = _cmm(wdtr, wdti, zar, zai, mm_dop)     # Doppler DFT
        acc = acc + (o_r * o_r + o_i * o_i)
    return acc


def _kernel(xr_ref, xi_ref, wrr_ref, wri_ref, wdtr_ref, wdti_ref,
            out_ref, *, A: int, C: int, precision_name: str,
            doppler_precision: str, doppler_layout: str):
    mm = _MMS[precision_name]
    mm_dop = _MMS[doppler_precision]

    xr = xr_ref[0]                                   # [A*C, S]
    xi = xi_ref[0]
    zr, zi = _cmm(xr, xi, wrr_ref[:], wri_ref[:], mm)    # range DFT chain

    # Doppler DFT precision is independent of the range stage: the Mosaic
    # "highest" (6-pass) dots made this loop ~3/4 of kernel time; "high"
    # (manual bf16x3) is f32-accurate at half that, "default" (bf16) is
    # fastest with ~1 dB wobble on cells 30-60 dB below peak.  Power
    # accumulation is always f32 (dots emit f32).
    acc = _doppler_power(zr, zi, wdtr_ref[:], wdti_ref[:], A, C, mm_dop,
                         doppler_layout)
    out_ref[0] = acc * jnp.float32(1.0 / A)


@functools.partial(jax.jit,
                   static_argnames=("dc_removal", "doppler_window",
                                    "precision_name", "doppler_precision",
                                    "doppler_layout"))
def rds_power_fused(signals: jax.Array, mix: jax.Array,
                    dc_removal: bool = True,
                    doppler_window: Optional[str] = None,
                    precision_name: str = "default",
                    doppler_precision: str = "high",
                    doppler_layout: str = "loop") -> jax.Array:
    """Fused power map from baseband/raw ADC cubes.

    Args:
        signals: complex64 [..., A, C, S] (raw inputs need the conj
            reference chirp folded into ``mix``).
        mix: complex64 [S] dechirp x fast-time-window vector.
        precision_name: range-DFT matmul precision -- "default" (bf16,
            fastest), "high" (bf16x3, f32-accurate), "highest" (f32).
        doppler_precision: Doppler-DFT matmul precision, same choices;
            "high" keeps the power map f32-accurate at half the cost of
            the Mosaic 6-pass "highest" path.  Power accumulation is
            always f32.

    Returns:
        float32 [..., S, C] power map ``mean_a |rds|^2`` in the detection
        layout [range_bin, doppler_bin] (range unshifted, Doppler
        fftshifted -- signal/rds.py conventions).
    """
    from radar_slam_tpu.signal.rds import doppler_dft_matrix, range_dft_matrix

    *batch, A, C, S = signals.shape
    F = 1
    for d in batch:
        F *= d

    x = signals.reshape(F, A * C, S)
    xr = jnp.real(x)
    xi = jnp.imag(x)

    w_rng = range_dft_matrix(S, mix, dc_removal)              # [S, S]
    wrr = w_rng.real.astype(jnp.float32)
    wri = w_rng.imag.astype(jnp.float32)
    w_dop_t = doppler_dft_matrix(C, doppler_window).T         # [D, C]
    wdtr = w_dop_t.real.astype(jnp.float32)
    wdti = w_dop_t.imag.astype(jnp.float32)

    frame_spec = pl.BlockSpec((1, A * C, S), lambda f: (f, 0, 0),
                              memory_space=pltpu.VMEM)
    wr_spec = pl.BlockSpec((S, S), lambda f: (0, 0), memory_space=pltpu.VMEM)
    wd_spec = pl.BlockSpec((C, C), lambda f: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, C, S), lambda f: (f, 0, 0),
                            memory_space=pltpu.VMEM)

    power_ds = pl.pallas_call(
        functools.partial(_kernel, A=A, C=C, precision_name=precision_name,
                          doppler_precision=doppler_precision,
                          doppler_layout=doppler_layout),
        grid=(F,),
        in_specs=[frame_spec, frame_spec, wr_spec, wr_spec, wd_spec, wd_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((F, C, S), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=F * (6 * A * C * S * S + 6 * A * S * C * C + 4 * A * C * S),
            bytes_accessed=F * (A * C * S * 8 + C * S * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xr, xi, wrr, wri, wdtr, wdti)

    # [F, D, S] -> [..., S(range), D]: a 51 KB/frame transpose, vs the
    # 820 KB/frame complex cube this kernel never writes.
    return jnp.swapaxes(power_ds, -1, -2).reshape(*batch, S, C)


def rds_power_reference(signals: jax.Array, mix: jax.Array,
                        dc_removal: bool = True,
                        doppler_window: Optional[str] = None) -> jax.Array:
    """f32-exact XLA oracle for :func:`rds_power_fused` (same math through
    signal/rds.py's matmul formulation at HIGHEST precision)."""
    from radar_slam_tpu.signal.rds import _rds_matmul

    rds = _rds_matmul(signals, mix, dc_removal, doppler_window,
                      jax.lax.Precision.HIGHEST)       # [..., A, S, C]
    return jnp.mean(jnp.abs(rds) ** 2, axis=-3)
