"""Batched angle-of-arrival estimators: beamforming, MUSIC, ESPRIT.

TPU-first re-design of ``AngleEstimator``
(``src/angle_estimation/angle_estimation.py:23-309``).  The reference
processes one target at a time with a Python loop over the angle grid; here
all K detections are estimated at once:

- beamforming (``:227-249``): the whole spectrum is one complex matmul
  |S A^H|^2 on the MXU  (S [K, A] signatures, A [G, A] steering matrix);
- MUSIC (``:109-176``): rank-1 covariance per signature -> batched ``eigh``
  over [K, A, A] -> noise-subspace projector -> pseudo-spectrum as matmuls;
- ESPRIT (``:178-225``): batched small-matrix subspace rotation.

All estimators accept a ``num_sources`` array [K] so the MDL model order from
the robust layer can vary per target without shape changes (masked subspace
selection instead of dynamic slicing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from radar_slam_tpu.core.config import AoAConfig, RadarConfig
from radar_slam_tpu.core.geometry import steering_matrix, ura_steering_vector


def azimuth_grid_deg(aoa: AoAConfig) -> jax.Array:
    """Search grid in degrees (angle_estimation.py:56-60)."""
    return jnp.linspace(aoa.search_min_deg, aoa.search_max_deg,
                        aoa.num_grid_points).astype(jnp.float32)


def elevation_grid_deg(aoa: AoAConfig) -> jax.Array:
    """Elevation search grid in degrees (URA arrays)."""
    return jnp.linspace(aoa.el_min_deg, aoa.el_max_deg,
                        aoa.num_el_grid_points).astype(jnp.float32)


def grid_steering_matrix(cfg: RadarConfig, aoa: AoAConfig) -> jax.Array:
    """Steering matrix over the search grid.

    ULA: [G_az, A] over the azimuth grid.  URA (num_antennas_el > 1):
    [G_el * G_az, A_total] over the joint el-major az-el grid."""
    if cfg.num_antennas_el > 1:
        az = jnp.deg2rad(azimuth_grid_deg(aoa))                 # [Gaz]
        el = jnp.deg2rad(elevation_grid_deg(aoa))               # [Gel]
        az_f = jnp.tile(az, aoa.num_el_grid_points)
        el_f = jnp.repeat(el, aoa.num_grid_points)
        return ura_steering_vector(az_f, el_f, cfg.num_antennas,
                                   cfg.num_antennas_el, cfg.spacing,
                                   cfg.spacing_el, cfg.lambda_c)
    grid_rad = jnp.deg2rad(azimuth_grid_deg(aoa))
    return steering_matrix(grid_rad, cfg.num_antennas, cfg.spacing, cfg.lambda_c)


def _refine_peak(spectrum: jax.Array, grid_deg: jax.Array) -> jax.Array:
    """Quadratic (parabolic) sub-bin peak interpolation over the grid.

    The reference returns the raw grid argmax (quantized to the 0.5 or 2 deg
    resolution, angle_estimation.py:173-174); the parabola through the peak
    and its neighbours recovers sub-grid accuracy at no extra cost."""
    g = spectrum.shape[-1]
    idx = jnp.argmax(spectrum, axis=-1)
    im = jnp.clip(idx - 1, 0, g - 1)
    ip = jnp.clip(idx + 1, 0, g - 1)
    # Masked reductions instead of gathers: TPU gather ops carry ~35-50 us
    # fixed overhead each and even a single batched take_along_axis of the
    # three taps traced at ~150 us/64-frame batch; three one-hot weighted
    # sums over the [K, G] spectrum are pure VPU work and fuse with the
    # argmax that produced idx.
    cols = jnp.arange(g)[None, :]
    tap = lambda i: jnp.sum(jnp.where(cols == i[..., None], spectrum, 0.0),
                            axis=-1)
    ym, y0, yp = tap(im), tap(idx), tap(ip)
    denom = ym - 2.0 * y0 + yp
    delta = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (ym - yp) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0),
                      0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    # Only interpolate interior peaks.
    delta = jnp.where((idx > 0) & (idx < g - 1), delta, 0.0)
    step = grid_deg[1] - grid_deg[0]
    return grid_deg[idx] + delta * step


def beamforming_spectrum(signatures: jax.Array, steering: jax.Array) -> jax.Array:
    """Conventional beamforming power spectra [K, G] = |S A^H|^2
    (angle_estimation.py:239-249), as one MXU matmul."""
    resp = signatures @ jnp.conj(steering).T          # [K, G]
    return (resp.real ** 2 + resp.imag ** 2)


def _refine_peak_2d(spec: jax.Array, az_grid: jax.Array, el_grid: jax.Array):
    """Joint (az, el) argmax + per-axis parabolic refinement.

    Args:
        spec: [K, G_el, G_az] power spectra.
    Returns:
        (az_deg [K], el_deg [K])."""
    K, Gel, Gaz = spec.shape
    flat = jnp.argmax(spec.reshape(K, -1), axis=-1)
    ie, ia = flat // Gaz, flat % Gaz

    def parab(ym, y0, yp, interior):
        denom = ym - 2.0 * y0 + yp
        d = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (ym - yp) / jnp.where(jnp.abs(denom) > 1e-12,
                                                  denom, 1.0), 0.0)
        return jnp.where(interior, jnp.clip(d, -0.5, 0.5), 0.0)

    k = jnp.arange(K)
    y0 = spec[k, ie, ia]
    da = parab(spec[k, ie, jnp.clip(ia - 1, 0, Gaz - 1)], y0,
               spec[k, ie, jnp.clip(ia + 1, 0, Gaz - 1)],
               (ia > 0) & (ia < Gaz - 1))
    de = parab(spec[k, jnp.clip(ie - 1, 0, Gel - 1), ia], y0,
               spec[k, jnp.clip(ie + 1, 0, Gel - 1), ia],
               (ie > 0) & (ie < Gel - 1))
    az_step = az_grid[1] - az_grid[0] if Gaz > 1 else jnp.float32(0.0)
    el_step = el_grid[1] - el_grid[0] if Gel > 1 else jnp.float32(0.0)
    return az_grid[ia] + da * az_step, el_grid[ie] + de * el_step


def estimate_beamforming(signatures: jax.Array, cfg: RadarConfig,
                         aoa: AoAConfig, refine: bool = True):
    """Batched beamforming AoA.  Returns (angles_deg [K], spectra [K, G]).

    ULA only; URA arrays go through :func:`estimate_angles_2d`."""
    grid = azimuth_grid_deg(aoa)
    spec = beamforming_spectrum(signatures, grid_steering_matrix(cfg, aoa))
    if cfg.num_antennas_el > 1:
        az, _ = _refine_peak_2d(
            spec.reshape(spec.shape[0], aoa.num_el_grid_points,
                         aoa.num_grid_points), grid, elevation_grid_deg(aoa))
        return az, spec
    if refine:
        ang = _refine_peak(spec, grid)
    else:
        ang = grid[jnp.argmax(spec, axis=-1)]
    return ang, spec


# --------------------------------------------------------------------------
# Subspace methods
# --------------------------------------------------------------------------

def signature_covariances(signatures: jax.Array,
                          forward_backward: bool = False,
                          diagonal_load: float = 0.0) -> jax.Array:
    """Per-detection covariance matrices [K, A, A].

    The reference builds a rank-1 R = s s^H from the single snapshot
    (angle_estimation.py:127).  ``forward_backward`` averages R with
    J conj(R) J (standard FB smoothing for ULAs) which raises the effective
    rank for coherent multipath; ``diagonal_load`` adds eps*I for numerical
    robustness.  ``diagonal_load`` defaults off for reference parity;
    ``forward_backward`` is a *documented parity departure* when reached
    through ``estimate_angles``/``estimate_angles_2d`` with MUSIC/ESPRIT
    (``AoAConfig.music_fb`` defaults True -- a strict accuracy win
    measured at the bench point; pass ``music_fb=False`` for bit-level
    reference behavior, see docs/PARITY.md)."""
    R = signatures[..., :, None] * jnp.conj(signatures[..., None, :])
    if forward_backward:
        A = R.shape[-1]
        J = jnp.flip(jnp.eye(A, dtype=R.dtype), axis=0)
        R = 0.5 * (R + J @ jnp.conj(R) @ J)
    if diagonal_load:
        R = R + diagonal_load * jnp.eye(R.shape[-1], dtype=R.dtype)
    return R


def rank1_eigenvalues(signatures: jax.Array) -> jax.Array:
    """Analytic DESCENDING eigenvalues [K, A] of the rank-1 single-snapshot
    covariance R = s s^H: (||s||^2, 0, ..., 0).

    The MDL model-order stage only consumes eigenvalues, and the
    production front end builds R from one snapshot (reference parity:
    angle_estimation.py:127) -- so the batched 8x8 ``eigh`` the pipeline
    ran for it computed exactly this constant spectrum the slow way
    (traced at 1,140 us/64-frame batch, the single largest op after the
    front-end kernel; scripts/trace_batched.py).  ``mdl_model_order``'s
    rank-1 guard yields the identical model order either way; the
    analytic form is exact where eigh carries ~1e-8 float noise."""
    K, A = signatures.shape
    p = jnp.sum(jnp.abs(signatures) ** 2, axis=-1)
    return jnp.concatenate(
        [p[:, None], jnp.zeros((K, A - 1), p.dtype)], axis=1)


def eigendecompose(R: jax.Array):
    """Batched Hermitian eigendecomposition, eigenvalues DESCENDING.

    Returns (eigenvalues [K, A] real, eigenvectors [K, A, A], column i is the
    i-th eigenvector).  jnp.linalg.eigh returns ascending order
    (angle_estimation.py:130-135 re-sorts likewise)."""
    vals, vecs = jnp.linalg.eigh(R)
    return vals[..., ::-1].real, vecs[..., ::-1]


def _rank2_signal_eigvecs(signatures: jax.Array, forward_backward: bool):
    """Closed-form top-2 eigenvectors of the single-snapshot covariance.

    The covariance here is NEVER general: without FB averaging it is the
    exact rank-1 s s^H (top eigenvector s/|s|); with FB it is
    (s s^H + t t^H)/2 with t = J conj(s) -- rank <= 2, so both nonzero
    eigenvectors live in span{s, t} and come from a 2x2 Hermitian
    eigenproblem with a closed form.  This replaces a [K]-batched A x A
    ``eigh`` (the same trap :func:`rank1_eigenvalues` removed from MDL at
    r04: 1,140 us/64f computing an analytic answer the slow way; the
    MUSIC eigh was the last one standing, ~half of the 657 us/3200-sig
    estimator cost).

    Returns (E [K, 2, A] orthonormal in-span eigenvectors, descending;
    rank [K] effective rank {1, 2}).  Where the FB pair is colinear
    (conjugate-centrosymmetric s) or s = 0, the second row is zero and
    rank reflects it."""
    eps = jnp.asarray(1e-20, jnp.float32)
    ns = jnp.sqrt(jnp.sum(jnp.abs(signatures) ** 2, axis=-1,
                          keepdims=True))                     # [K, 1]
    u1 = signatures / jnp.maximum(ns, eps)
    if not forward_backward:
        E = jnp.stack([u1, jnp.zeros_like(u1)], axis=1)
        return E, (ns[:, 0] > 0).astype(jnp.int32)
    t = jnp.flip(jnp.conj(signatures), axis=-1)               # J conj(s)
    c = jnp.sum(jnp.conj(u1) * t, axis=-1, keepdims=True)     # u1^H t
    w = t - c * u1
    nw = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2, axis=-1, keepdims=True))
    rank2 = nw[:, 0] > 1e-6 * jnp.maximum(ns[:, 0], eps)
    u2 = jnp.where(rank2[:, None], w / jnp.maximum(nw, eps), 0.0)
    # R_fb in the {u1, u2} basis: 0.5 * ([[|s|^2, 0], [0, 0]] + tau tau^H),
    # tau = (c, |w|).
    a11 = 0.5 * (ns[:, 0] ** 2 + jnp.abs(c[:, 0]) ** 2)
    a12 = 0.5 * (c[:, 0] * nw[:, 0])                          # complex
    a22 = 0.5 * nw[:, 0] ** 2
    mean = 0.5 * (a11 + a22)
    disc = jnp.sqrt(jnp.maximum((0.5 * (a11 - a22)) ** 2
                                + jnp.abs(a12) ** 2, 0.0))
    lam1 = mean + disc
    # Eigenvector of [[a11, a12], [conj(a12), a22]] for lam1: prefer the
    # (a12, lam1 - a11) form, falling back to (lam1 - a22, conj(a12)) when
    # that pair degenerates (a12 ~ 0 and lam1 ~ a11 -> e1 = u1).
    v1a = jnp.stack([a12, (lam1 - a11).astype(a12.dtype)], axis=-1)
    v1b = jnp.stack([(lam1 - a22).astype(a12.dtype), jnp.conj(a12)],
                    axis=-1)
    use_b = (jnp.abs(v1b[:, 0]) + jnp.abs(v1b[:, 1])
             > jnp.abs(v1a[:, 0]) + jnp.abs(v1a[:, 1]))
    v1 = jnp.where(use_b[:, None], v1b, v1a)
    n1 = jnp.sqrt(jnp.sum(jnp.abs(v1) ** 2, axis=-1, keepdims=True))
    v1 = jnp.where(n1 > eps, v1 / jnp.maximum(n1, eps),
                   jnp.array([1.0, 0.0], v1.dtype)[None])
    # The in-span orthogonal complement is the lam2 eigenvector.
    v2 = jnp.stack([-jnp.conj(v1[:, 1]), jnp.conj(v1[:, 0])], axis=-1)
    e1 = v1[:, :1] * u1 + v1[:, 1:] * u2
    e2 = v2[:, :1] * u1 + v2[:, 1:] * u2
    e1 = jnp.where(rank2[:, None], e1, u1)
    e2 = jnp.where(rank2[:, None], e2, 0.0)
    rank = (ns[:, 0] > 0).astype(jnp.int32) + rank2.astype(jnp.int32)
    return jnp.stack([e1, e2], axis=1), rank


def music_denominator(signatures: jax.Array, steering: jax.Array,
                      num_sources: jax.Array | int = 1,
                      forward_backward: bool = False) -> jax.Array:
    """MUSIC null spectra [K, G]: d(theta) = a^H P_n a.

    P_n = I - sum_{i < min(m, rank)} e_i e_i^H with the closed-form
    rank-<=2 signal eigenvectors (:func:`_rank2_signal_eigvecs`) -- no
    ``eigh``.  Evaluated as the RESIDUAL NORM ||a - sum (e_i^H a) e_i||^2,
    not as |a|^2 - sum |e_i^H a|^2: near the null d -> 0 while both terms
    of the difference are ~A, so the difference form loses ~1e-7 * A
    absolutely -- which is 100% relative error exactly at the bins the
    sub-grid refinement fits (measured: MUSIC e2e pos RMSE 0.197 -> 0.212
    with the difference form; the residual form restores parity with the
    eigh path at a fraction of its cost).
    Deviation from the generic eigenbasis form: model orders beyond the
    covariance rank used to exclude ARBITRARY null-space directions
    (whatever basis eigh returned); here they exclude nothing, which is
    the mathematically meaningful projector (those targets are MDL-flagged
    multipath and masked out of the reliable set regardless)."""
    K, A = signatures.shape
    m = jnp.broadcast_to(jnp.asarray(num_sources, jnp.int32), (K,))
    E, rank = _rank2_signal_eigvecs(signatures, forward_backward)
    sig_mask = (jnp.arange(2)[None, :] < jnp.minimum(m, rank)[:, None])
    # proj[k, j, g] = e_j^H a_g  (one [K*2, A] x [A, G] matmul).
    proj = jnp.einsum("kja,ga->kjg", jnp.conj(E), steering)
    proj = jnp.where(sig_mask[:, :, None], proj, 0.0)
    resid = steering[None, :, :] - jnp.einsum("kjg,kja->kga", proj, E)
    return jnp.sum(resid.real ** 2 + resid.imag ** 2, axis=-1)  # [K, G]


def music_spectrum(signatures: jax.Array, steering: jax.Array,
                   num_sources: jax.Array | int = 1,
                   forward_backward: bool = False) -> jax.Array:
    """Batched MUSIC pseudo-spectra [K, G] = 1 / (a^H P_n a)
    (angle_estimation.py:109-154)."""
    denom = music_denominator(signatures, steering, num_sources,
                              forward_backward)
    return jnp.where(denom > 1e-12, 1.0 / jnp.maximum(denom, 1e-12), 0.0)


def estimate_music(signatures: jax.Array, cfg: RadarConfig, aoa: AoAConfig,
                   num_sources: jax.Array | int = 1, refine: bool = True,
                   forward_backward: bool = False):
    """Batched MUSIC AoA.  Returns (angles_deg [K], spectra [K, G]).

    Sub-grid refinement runs on the NEGATED DENOMINATOR, not the
    pseudo-spectrum: 1/(a^H P_n a) is a near-pole at the source (its peak
    narrows without bound as SNR grows), so a parabola through three
    pseudo-spectrum samples on a 2 deg grid systematically under-shoots
    the offset -- measured as MUSIC pos RMSE 0.386 m vs beamforming 0.209
    at the r03 bench point (VERDICT r03 weak 3 / next 3).  The null
    function a^H P_n a itself is locally quadratic at the source (it is a
    smooth norm with a zero/minimum there), which is exactly the model the
    three-point parabola assumes.  The selected bin is argmax(-denom),
    which can differ from argmax(spec) where denom <= 1e-12 clamps the
    pseudo-spectrum to 0 (near-noise-free poles) -- there -denom picks the
    more correct bin; the unrefined path and the returned spectra keep the
    clamped spec for reference parity."""
    grid = azimuth_grid_deg(aoa)
    denom = music_denominator(signatures, grid_steering_matrix(cfg, aoa),
                              num_sources, forward_backward)
    spec = jnp.where(denom > 1e-12, 1.0 / jnp.maximum(denom, 1e-12), 0.0)
    if cfg.num_antennas_el > 1:
        az, _ = _refine_peak_2d(
            (-denom).reshape(denom.shape[0], aoa.num_el_grid_points,
                             aoa.num_grid_points), grid,
            elevation_grid_deg(aoa))
        return az, spec
    if refine:
        ang = _refine_peak(-denom, grid)
    else:
        ang = grid[jnp.argmax(spec, axis=-1)]
    return ang, spec


def _multilag_slope(signatures: jax.Array, max_lag: int,
                    sum_axes=(-1,)) -> jax.Array:
    """Weighted multi-lag phase-slope estimate of a single spatial tone.

    The lag-1 correlation angle(s[:-1]^H s[1:]) discards most of the
    aperture: its variance scales ~sigma^2/(A-1) while the single-tone ML
    (periodogram peak) reaches ~sigma^2/A^3.  Using every lag m = 1..M,
    r_m = sum_i conj(s_i) s_{i+m} has expected phase m*phi; each lag's
    angle is unwrapped onto the lag-1 line (m*phi_1 picks the right 2 pi
    branch at working SNRs; standalone-validated to 10 dB) and the slope
    is the |r_m|-weighted least-squares fit through the origin -- a
    closed-form, loop-free estimator that recovers most of the multi-lag
    information (standalone angle RMSE at 20 dB: 0.34 deg lag-1 -> 0.25
    deg full-lag; ESPRIT e2e position RMSE 0.331 -> 0.22 m on the bench
    scene; VERDICT r04 item 5)."""
    rs, ws, ms = [], [], []
    for m in range(1, max_lag + 1):
        # Products shift along the LAST axis; callers orient the shift
        # axis last and pass any extra averaging axes via sum_axes.
        r = jnp.sum(jnp.conj(signatures[..., :-m]) * signatures[..., m:],
                    axis=sum_axes)
        rs.append(r)
        ws.append(jnp.abs(r))
        ms.append(float(m))
    phi1 = jnp.angle(rs[0])
    num = jnp.zeros_like(phi1)
    den = jnp.zeros_like(phi1)
    two_pi = 2.0 * jnp.pi
    for r, w, m in zip(rs, ws, ms):
        phi = jnp.angle(r)
        phi = phi + two_pi * jnp.round((m * phi1 - phi) / two_pi)
        num = num + w * m * phi
        den = den + w * m * m
    return num / jnp.maximum(den, 1e-30)


def estimate_esprit(signatures: jax.Array, cfg: RadarConfig,
                    weighted: bool = True) -> jax.Array:
    """Batched ESPRIT azimuth estimates [K] in degrees.

    The reference (angle_estimation.py:178-225) runs an SVD + pinv per target.
    For a single-snapshot rank-1 signature the dominant-source ESPRIT
    rotation collapses to the total-least-squares phase between the two
    shifted subarrays:

        phi = angle( s[:-1]^H s[1:] ),
        az  = arcsin( phi * lambda / (2 pi d) ).

    ``weighted=True`` (default; ``AoAConfig.esprit_weighted``) replaces the
    lag-1-only phase with the weighted multi-lag slope
    (:func:`_multilag_slope`) -- a deliberate accuracy departure from the
    reference analogous to ``music_fb`` (docs/PARITY.md); ``False``
    restores the reference-equivalent lag-1 estimate.
    """
    if weighted:
        A = signatures.shape[-1]
        phi = _multilag_slope(signatures, max_lag=max(A - 1, 1))
    else:
        s1 = signatures[..., :-1]
        s2 = signatures[..., 1:]
        phi = jnp.angle(jnp.sum(jnp.conj(s1) * s2, axis=-1))
    arg = phi * cfg.lambda_c / (2.0 * jnp.pi * cfg.spacing)
    return jnp.rad2deg(jnp.arcsin(jnp.clip(arg, -1.0, 1.0)))


def estimate_esprit_ura(signatures: jax.Array, cfg: RadarConfig,
                        weighted: bool = True):
    """Batched URA ESPRIT: (az_deg [K], el_deg [K]).

    Shift invariance along azimuth columns gives u_y = cos(el) sin(az),
    along elevation rows gives u_z = sin(el); solved jointly.  ``weighted``
    selects the multi-lag slope per axis (see :func:`estimate_esprit`)."""
    K = signatures.shape[0]
    s = signatures.reshape(K, cfg.num_antennas_el, cfg.num_antennas)
    if weighted:
        phi_az = _multilag_slope(s, max(cfg.num_antennas - 1, 1),
                                 sum_axes=(-2, -1))
        phi_el = _multilag_slope(jnp.swapaxes(s, -1, -2),
                                 max(cfg.num_antennas_el - 1, 1),
                                 sum_axes=(-2, -1))
    else:
        phi_az = jnp.angle(jnp.sum(jnp.conj(s[..., :-1]) * s[..., 1:],
                                   axis=(-2, -1)))
        phi_el = jnp.angle(jnp.sum(jnp.conj(s[:, :-1, :]) * s[:, 1:, :],
                                   axis=(-2, -1)))
    u_y = phi_az * cfg.lambda_c / (2.0 * jnp.pi * cfg.spacing)
    u_z = phi_el * cfg.lambda_c / (2.0 * jnp.pi * cfg.spacing_el)
    el = jnp.arcsin(jnp.clip(u_z, -1.0, 1.0))
    cos_el = jnp.maximum(jnp.cos(el), 1e-3)
    az = jnp.arcsin(jnp.clip(u_y / cos_el, -1.0, 1.0))
    return jnp.rad2deg(az), jnp.rad2deg(el)


@functools.partial(jax.jit, static_argnames=("cfg", "aoa", "method"))
def estimate_angles(signatures: jax.Array, cfg: RadarConfig, aoa: AoAConfig,
                    method: str = "beamforming",
                    num_sources: jax.Array | int = 1):
    """Dispatch over estimation methods (angle_estimation.py:277-286).

    Returns (angles_deg [K], spectra [K, G] or None for esprit)."""
    if method == "beamforming":
        return estimate_beamforming(signatures, cfg, aoa)
    if method == "music":
        return estimate_music(signatures, cfg, aoa, num_sources,
                              forward_backward=aoa.music_fb)
    if method == "esprit":
        if cfg.num_antennas_el > 1:
            return (estimate_esprit_ura(signatures, cfg,
                                        weighted=aoa.esprit_weighted)[0],
                    None)
        return (estimate_esprit(signatures, cfg,
                                weighted=aoa.esprit_weighted), None)
    raise ValueError(f"Unknown method: {method}")


@functools.partial(jax.jit, static_argnames=("cfg", "aoa", "method"))
def estimate_angles_2d(signatures: jax.Array, cfg: RadarConfig,
                       aoa: AoAConfig, method: str = "beamforming",
                       num_sources: jax.Array | int = 1):
    """Joint azimuth-elevation estimation (URA; ROADMAP item 4).

    Returns (az_deg [K], el_deg [K], spectra [K, G] or None).  For ULA
    configs (num_antennas_el == 1) elevation is identically zero and the
    result matches :func:`estimate_angles`."""
    if cfg.num_antennas_el == 1:
        az, spec = estimate_angles(signatures, cfg, aoa, method, num_sources)
        return az, jnp.zeros_like(az), spec

    if method == "esprit":
        az, el = estimate_esprit_ura(signatures, cfg,
                                     weighted=aoa.esprit_weighted)
        return az, el, None
    steering = grid_steering_matrix(cfg, aoa)
    if method == "beamforming":
        spec = beamforming_spectrum(signatures, steering)
        refine_on = spec
    elif method == "music":
        # Refine on the negated null function, not the near-pole
        # pseudo-spectrum (see estimate_music).
        denom = music_denominator(signatures, steering, num_sources,
                                  forward_backward=aoa.music_fb)
        spec = jnp.where(denom > 1e-12, 1.0 / jnp.maximum(denom, 1e-12),
                         0.0)
        refine_on = -denom
    else:
        raise ValueError(f"Unknown method: {method}")
    az, el = _refine_peak_2d(
        refine_on.reshape(spec.shape[0], aoa.num_el_grid_points,
                          aoa.num_grid_points),
        azimuth_grid_deg(aoa), elevation_grid_deg(aoa))
    return az, el, spec
