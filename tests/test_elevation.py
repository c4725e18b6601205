"""URA elevation estimation + v_z observability (ROADMAP item 4).

The reference is azimuth-only (8-element ULA): its "3-D ego-motion" solve
can never observe elevation or v_z -- every direction vector has el = 0 and
the v_z estimate is a regularization artifact.  With a planar array
(RadarConfig.num_antennas_el > 1) the rebuild estimates (az, el) jointly and
recovers v_z from Doppler; hard-asserted here with a ULA control.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_slam_tpu.core.config import (AoAConfig, DetectionConfig,
                                        PipelineConfig, RadarConfig,
                                        VelocityConfig)
from radar_slam_tpu.core.geometry import steering_vector, ura_steering_vector
from radar_slam_tpu.core.types import ScattererBatch
from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene_3d
from radar_slam_tpu.pipeline import frame as pipe

URA = RadarConfig(num_chirps=32, num_antennas=8, num_antennas_el=4,
                  noise_power=1e-6)
AOA = AoAConfig(search_resolution_deg=1.0, el_min_deg=-45.0, el_max_deg=45.0,
                el_resolution_deg=1.5, confidence_threshold=0.5,
                max_targets=50, track_capacity=64)

CFG = PipelineConfig(
    radar=URA,
    detection=DetectionConfig(threshold_db=-10.0, max_detections=64),
    aoa=AOA,
    velocity=VelocityConfig(z_velocity_weight=1.0),
)


def test_ura_steering_reduces_to_ula():
    az = jnp.linspace(-1.2, 1.2, 7)
    el = jnp.zeros(7)
    ula = steering_vector(az, 8, URA.spacing, URA.lambda_c)
    ura = ura_steering_vector(az, el, 8, 1, URA.spacing, URA.spacing_el,
                              URA.lambda_c)
    np.testing.assert_allclose(np.asarray(ula), np.asarray(ura), atol=1e-6)


def test_joint_az_el_recovery():
    """Planted (az, el) scatterers -> URA synthesis -> RDS -> detection ->
    joint 2-D estimation recovers both angles."""
    from radar_slam_tpu.aoa import estimators
    from radar_slam_tpu.signal.detect import (detect_peaks,
                                              extract_spatial_signatures)
    from radar_slam_tpu.signal.rds import range_doppler_spectrum
    from radar_slam_tpu.signal.synth import synthesize_frame

    truth = [(20.0, 0.30, 0.15), (35.0, -0.40, -0.20), (48.0, 0.05, 0.08)]
    S = 16
    sc = ScattererBatch(
        range_m=jnp.asarray(np.pad([t[0] for t in truth], (0, S - 3))),
        azimuth_rad=jnp.asarray(np.pad([t[1] for t in truth], (0, S - 3))),
        rcs_db=jnp.asarray(np.pad([15.0] * 3, (0, S - 3))),
        vr=jnp.zeros(S),
        valid=jnp.asarray(np.arange(S) < 3),
        elevation_rad=jnp.asarray(np.pad([t[2] for t in truth], (0, S - 3))),
    )
    sig = synthesize_frame(sc, URA, jax.random.key(0))
    assert sig.shape == (32, 32, 400)
    rds = range_doppler_spectrum(sig, URA, doppler_window="hann")
    det = detect_peaks(rds, URA, CFG.detection)
    sigs = extract_spatial_signatures(rds, det)
    az_deg, el_deg, _ = estimators.estimate_angles_2d(sigs, URA, AOA)

    ok = np.asarray(det.valid)
    got = {}
    for r, a, e, v in zip(np.asarray(det.range_m)[ok],
                          np.asarray(az_deg)[ok], np.asarray(el_deg)[ok],
                          np.asarray(det.power_db)[ok]):
        key = min(truth, key=lambda t: abs(t[0] - r))
        if key not in got:
            got[key] = (a, e)
    for (r, az, el) in truth:
        assert (r, az, el) in got, f"target at {r} m not detected"
        a, e = got[(r, az, el)]
        assert abs(a - np.degrees(az)) < 2.0, (r, a, np.degrees(az))
        assert abs(e - np.degrees(el)) < 3.0, (r, e, np.degrees(el))


@pytest.fixture(scope="module")
def scene_3d():
    return constant_motion_scene_3d(
        31, num_frames=10, dt=CFG.frame_dt, v_body=(8.0, 0.5, 1.0),
        yaw_rate=0.05,
        scene=SceneConfig(num_points=48, max_scatterers=CFG.max_scatterers),
        z_span=5.0)


@pytest.mark.slow
def test_vz_recovery_with_ura(scene_3d):
    batches, gt = scene_3d
    out = pipe.process_sequence(batches, jax.random.key(0), CFG)
    v = np.asarray(out.motion.velocity)[1:]
    np.testing.assert_allclose(v[:, 0], 8.0, atol=0.4)
    np.testing.assert_allclose(v[:, 2], 1.0, atol=0.4)


def test_vz_unobservable_with_ula(scene_3d):
    """Control: the reference-style ULA cannot see v_z on the same scene."""
    batches, _ = scene_3d
    cfg = dataclasses.replace(
        CFG, radar=dataclasses.replace(URA, num_antennas_el=1))
    out = pipe.process_sequence(batches, jax.random.key(0), cfg)
    v = np.asarray(out.motion.velocity)[1:]
    assert np.abs(v[:, 2]).max() < 0.5, v[:, 2]
    # Horizontal velocity still recovered.
    np.testing.assert_allclose(v[:, 0], 8.0, atol=0.5)
