"""Robust AoA processing: power filter + batched estimation + confidence +
MDL multipath gate + temporal smoothing.

Re-design of ``RobustAngleEstimator.process_targets_robust`` /
``estimate_angle_robust`` (``src/algorithms/robust_angle_estimation.py:
220-272, 346-420``) as one jitted, batched stage.  The reference's duplicate
module copy (``src/robust_angle_estimation.py``, identical md5 -- SURVEY.md
section 2 row 5) has no equivalent here.

Differences from the reference (noted per SURVEY.md section 7):
- detections arrive as a static top-K set already sorted by power, so the
  power filter + ``max_targets`` truncation (``:362-365``) become mask ops;
- unreliable targets are *masked*, not dropped (``:386`` drops them), so
  shapes stay static; downstream consumers use ``Targets.is_reliable``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from radar_slam_tpu.aoa import confidence as conf_mod
from radar_slam_tpu.aoa import estimators, smoothing
from radar_slam_tpu.core.config import AoAConfig, RadarConfig
from radar_slam_tpu.core.types import Detections, Targets
from radar_slam_tpu.signal.detect import extract_spatial_signatures


@functools.partial(jax.jit, static_argnames=("cfg", "aoa", "method", "smooth",
                                             "doppler_bins"))
def process_targets_robust(rds: jax.Array | None, detections: Detections,
                           state: smoothing.SmootherState,
                           cfg: RadarConfig, aoa: AoAConfig,
                           method: str = "beamforming",
                           smooth: bool = True,
                           signatures: jax.Array | None = None,
                           doppler_bins: int | None = None,
                           ) -> Tuple[Targets, smoothing.SmootherState]:
    """Full robust per-frame AoA stage.

    ``rds`` may be None when ``signatures`` [K, A] are precomputed (the
    fused detection path recomputes them from the ADC cube via
    ``signal/rds.py:detection_signatures``); ``doppler_bins`` must then be
    given (it keys the temporal smoother's cell IDs).

    Returns (targets [K], new smoother state)."""
    K = detections.range_bin.shape[0]
    D = rds.shape[-1] if rds is not None else doppler_bins

    # Power filter + top-max_targets (robust_angle_estimation.py:362-365);
    # detections are sorted by descending power already.
    keep = (detections.valid
            & (detections.power_db > aoa.power_filter_db)
            & (jnp.arange(K) < aoa.max_targets))

    if signatures is None:
        signatures = extract_spatial_signatures(rds, detections)    # [K, A]

    # Multipath / model order from covariance eigenvalues (:140-218);
    # rank-1 analytic spectrum instead of a batched eigh (see
    # estimators.rank1_eigenvalues -- MDL consumes eigenvalues only, and
    # the single-snapshot covariance's spectrum is (||s||^2, 0, ..., 0)).
    eigvals = estimators.rank1_eigenvalues(signatures)
    num_sources, is_multipath, _snr = conf_mod.mdl_model_order(eigvals)

    # Initial angle estimate (reference uses beamforming in the robust path,
    # :237-245; MUSIC/ESPRIT supported for the basic-estimator parity).
    # Joint az-el for URA arrays (elevation is zero for ULA).
    angles_deg, el_deg, _ = estimators.estimate_angles_2d(
        signatures, cfg, aoa, method=method, num_sources=num_sources)

    # 3-part confidence (:88-138).
    conf = conf_mod.angle_confidence(signatures, angles_deg, cfg, el_deg)

    # Temporal smoothing keyed by (range_bin, doppler_bin) (:380, :274-330).
    # Azimuth only; elevation (URA) stays per-frame -- its grid is coarse and
    # the solver weights it through the same confidence.
    if smooth:
        det_keys = detections.range_bin * D + detections.doppler_bin
        state, angles_deg, conf = smoothing.update(
            state, det_keys, angles_deg, conf, keep, aoa)

    is_reliable = keep & (conf >= aoa.confidence_threshold) & ~is_multipath

    targets = Targets(
        range_bin=detections.range_bin,
        doppler_bin=detections.doppler_bin,
        range_m=detections.range_m,
        doppler_hz=detections.doppler_hz,
        vr_mps=detections.vr_mps,
        power_db=detections.power_db,
        azimuth_rad=jnp.deg2rad(angles_deg),
        confidence=conf,
        num_sources=num_sources,
        is_multipath=is_multipath,
        is_reliable=is_reliable,
        spatial_signature=signatures,
        valid=keep,
        elevation_rad=jnp.deg2rad(el_deg),
    )
    return targets, state


@functools.partial(jax.jit, static_argnames=("cfg", "aoa", "method"))
def process_targets(rds: jax.Array, detections: Detections,
                    cfg: RadarConfig, aoa: AoAConfig,
                    method: str = "music") -> Targets:
    """Basic (non-robust) AoA stage: parity with ``AngleEstimator.
    process_targets`` (angle_estimation.py:253-309) -- every valid detection
    becomes a target, no confidence gating."""
    dummy_state = smoothing.init_state(aoa)
    targets, _ = process_targets_robust(
        rds, detections, dummy_state, cfg, aoa, method=method, smooth=False)
    # Basic estimator keeps all detections regardless of confidence.
    return targets._replace(is_reliable=targets.valid)
