"""AoA estimator tests: known-angle recovery for beamforming / MUSIC /
ESPRIT, confidence behaviour, MDL model order, temporal smoothing.

Hard-asserted equivalents of the reference's print-only phase-2 demos
(tests/test_phase2_enhancements.py, SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_slam_tpu.aoa import confidence as conf_mod
from radar_slam_tpu.aoa import estimators, robust, smoothing
from radar_slam_tpu.core.config import AoAConfig, DetectionConfig, RadarConfig
from radar_slam_tpu.core.geometry import steering_vector
from radar_slam_tpu.core.types import ScattererBatch
from radar_slam_tpu.signal.detect import detect_peaks
from radar_slam_tpu.signal.rds import range_doppler_spectrum
from radar_slam_tpu.signal.synth import synthesize_frame

CFG = RadarConfig(noise_power=1e-6)
AOA = AoAConfig(search_resolution_deg=0.5)
AOA2 = AoAConfig(search_resolution_deg=2.0)


def signatures_for(angles_deg, noise=0.0, seed=0):
    sv = steering_vector(jnp.deg2rad(jnp.array(angles_deg, jnp.float32)),
                         CFG.num_antennas, CFG.spacing, CFG.lambda_c)
    if noise:
        k1, k2 = jax.random.split(jax.random.key(seed))
        sv = sv + noise * (jax.random.normal(k1, sv.shape)
                           + 1j * jax.random.normal(k2, sv.shape))
    p = jnp.sum(jnp.abs(sv) ** 2, axis=-1, keepdims=True)
    return (sv / jnp.sqrt(p)).astype(jnp.complex64)


TRUE_ANGLES = [-40.0, -12.5, 0.0, 7.3, 33.0, 61.0]


@pytest.mark.parametrize("method,tol", [
    ("beamforming", 0.6), ("music", 0.6), ("esprit", 0.6)])
def test_known_angle_recovery(method, tol):
    sigs = signatures_for(TRUE_ANGLES, noise=0.01)
    est, _ = estimators.estimate_angles(sigs, CFG, AOA, method=method)
    np.testing.assert_allclose(np.asarray(est), TRUE_ANGLES, atol=tol)


def test_subgrid_refinement_beats_grid_quantization():
    sigs = signatures_for([7.3])
    coarse, _ = estimators.estimate_beamforming(sigs, CFG, AOA2, refine=False)
    fine, _ = estimators.estimate_beamforming(sigs, CFG, AOA2, refine=True)
    assert abs(float(fine[0]) - 7.3) < abs(float(coarse[0]) - 7.3)
    assert abs(float(fine[0]) - 7.3) < 0.5  # sub-grid despite 2 deg grid


def test_music_spectrum_peak_sharper_than_beamforming():
    sigs = signatures_for([10.0])
    _, bf = estimators.estimate_beamforming(sigs, CFG, AOA)
    _, mu = estimators.estimate_music(sigs, CFG, AOA)
    bf, mu = np.asarray(bf[0]), np.asarray(mu[0])
    half_bf = np.sum(bf > bf.max() / 2)
    half_mu = np.sum(mu > mu.max() / 2)
    assert half_mu <= half_bf


def test_confidence_orders_clean_vs_noisy():
    # NOTE: the reference normalizes the steering correlation only by the
    # signature power (robust_angle_estimation.py:105-110), so clean
    # signatures saturate the 0-1 clip; ordering is only visible for heavy
    # corruption.  We keep the formula for parity.
    clean = signatures_for([20.0], noise=0.0)
    noisy = signatures_for([20.0], noise=2.0, seed=3)
    c_clean = conf_mod.angle_confidence(clean, jnp.array([20.0]), CFG)
    c_noisy = conf_mod.angle_confidence(noisy, jnp.array([20.0]), CFG)
    assert float(c_clean[0]) > float(c_noisy[0])
    assert 0.0 <= float(c_noisy[0]) <= 1.0


def test_mdl_rank1_single_source():
    sigs = signatures_for([15.0])
    R = estimators.signature_covariances(sigs)
    ev, _ = estimators.eigendecompose(R)
    n, multi, _ = conf_mod.mdl_model_order(ev)
    assert int(n[0]) == 1 and not bool(multi[0])


def test_mdl_two_sources_with_fb_smoothing():
    # Two incoherent sources -> rank-2 covariance.
    s1 = signatures_for([
        -30.0])[0]
    s2 = signatures_for([25.0])[0]
    R = (s1[:, None] * jnp.conj(s1[None, :])
         + s2[:, None] * jnp.conj(s2[None, :]))[None]
    ev, _ = estimators.eigendecompose(R)
    n, multi, _ = conf_mod.mdl_model_order(ev)
    assert int(n[0]) >= 2 and bool(multi[0])


def test_smoother_converges_and_tracks():
    aoa = AoAConfig(temporal_window=5, smoothing_factor=0.7, track_capacity=8)
    state = smoothing.init_state(aoa)
    key = jnp.array([42, 99], jnp.int32)
    true = jnp.array([10.0, -20.0], jnp.float32)
    rng = np.random.default_rng(0)
    last = None
    for i in range(8):
        meas = true + jnp.array(rng.normal(0, 1.0, 2), jnp.float32)
        state, sm, sc = smoothing.update(
            state, key, meas, jnp.array([0.9, 0.8]), jnp.array([True, True]), aoa)
        last = np.asarray(sm)
    assert abs(last[0] - 10.0) < 1.5
    assert abs(last[1] + 20.0) < 1.5
    # Track table holds exactly the two keys.
    used = np.asarray(state.keys) >= 0
    assert used.sum() == 2


def test_smoother_eviction_when_full():
    aoa = AoAConfig(temporal_window=3, track_capacity=4)
    state = smoothing.init_state(aoa)
    for batch in ([1, 2], [3, 4], [5, 6]):
        k = jnp.array(batch, jnp.int32)
        state, _, _ = smoothing.update(
            state, k, jnp.zeros(2), jnp.ones(2), jnp.array([True, True]), aoa)
    keys = set(int(x) for x in np.asarray(state.keys) if x >= 0)
    assert len(keys) == 4
    assert {5, 6} <= keys  # newest tracks survive


def test_robust_pipeline_end_to_end():
    det_cfg = DetectionConfig(threshold_db=-12.0, max_detections=16)
    rows = dict(range_m=jnp.array([30.0, 45.0] + [0.0] * 6),
                azimuth_rad=jnp.array([0.3, -0.35] + [0.0] * 6),
                rcs_db=jnp.array([15.0, 18.0] + [0.0] * 6),
                vr=jnp.array([2.0, -1.0] + [0.0] * 6),
                valid=jnp.array([True, True] + [False] * 6))
    sc = ScattererBatch(**rows)
    sig = synthesize_frame(sc, CFG, jax.random.key(0))
    rds = range_doppler_spectrum(sig, CFG)
    det = detect_peaks(rds, CFG, det_cfg)
    state = smoothing.init_state(AOA2)
    targets, state = robust.process_targets_robust(rds, det, state, CFG, AOA2)

    ok = np.asarray(targets.is_reliable)
    az = np.rad2deg(np.asarray(targets.azimuth_rad))
    rng = np.asarray(targets.range_m)
    # Both planted targets recovered among reliable estimates.
    for r_true, az_true in [(30.0, np.rad2deg(0.3)), (45.0, np.rad2deg(-0.35))]:
        hit = ok & (np.abs(rng - r_true) < 1.0) & (np.abs(az - az_true) < 3.0)
        assert hit.any(), (r_true, az_true, rng[ok], az[ok])


def test_basic_process_targets_music():
    det_cfg = DetectionConfig(threshold_db=-12.0, max_detections=8)
    sc = ScattererBatch(range_m=jnp.array([25.0]), azimuth_rad=jnp.array([-0.2]),
                        rcs_db=jnp.array([15.0]), vr=jnp.array([0.0]),
                        valid=jnp.array([True]))
    sig = synthesize_frame(sc, CFG, jax.random.key(1))
    rds = range_doppler_spectrum(sig, CFG)
    det = detect_peaks(rds, CFG, det_cfg)
    targets = robust.process_targets(rds, det, CFG, AOA, method="music")
    best = int(np.argmax(np.asarray(targets.power_db)))
    assert abs(np.rad2deg(float(targets.azimuth_rad[best])) - np.rad2deg(-0.2)) < 2.0


@pytest.mark.slow
def test_smooth_windowed_matches_scanned_update():
    """The scan-free windowed smoother must reproduce the slot-table scan
    exactly (under the documented no-capacity-eviction condition)."""
    import dataclasses

    import numpy as np

    for seed, W in [(0, 3), (1, 4), (2, 5)]:
        aoa = dataclasses.replace(AOA, temporal_window=W)
        F, K = 50, 12
        rng = np.random.RandomState(seed)
        base = np.arange(K, dtype=np.int32) * 7          # persistent tracks
        keys = np.tile(base, (F, 1))
        valid = rng.rand(F, K) > 0.25                    # gaps
        flip = rng.rand(F, K) > 0.9                      # track breaks
        keys = np.where(flip, rng.randint(500, 600, size=(F, K)),
                        keys).astype(np.int32)
        ang = jnp.asarray(rng.uniform(-80, 80, size=(F, K)).astype(np.float32))
        conf = jnp.asarray(rng.uniform(0.1, 1.0, size=(F, K)).astype(np.float32))
        keys = jnp.asarray(keys)
        valid = jnp.asarray(valid)

        st = smoothing.init_state(aoa)
        ref_a, ref_c = [], []
        for f in range(F):
            st, a, c = smoothing.update(st, keys[f], ang[f], conf[f],
                                        valid[f], aoa)
            ref_a.append(a)
            ref_c.append(c)
        a_win, c_win = smoothing.smooth_windowed(keys, ang, conf, valid, aoa)
        np.testing.assert_allclose(np.asarray(jnp.stack(ref_a)),
                                   np.asarray(a_win), atol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.stack(ref_c)),
                                   np.asarray(c_win), atol=1e-5)
