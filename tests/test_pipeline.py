"""End-to-end pipeline test: known ego motion -> synthetic frames -> full
jitted chain -> velocity + trajectory recovery within hard bounds.

This is the minimum end-to-end slice of SURVEY.md section 7, with the
accuracy thresholds the BASELINE parity bound implies (position RMSE well
under 0.777 m over a 10-frame window)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_slam_tpu.core.config import (AoAConfig, DetectionConfig,
                                        PipelineConfig, RadarConfig,
                                        VelocityConfig)
from radar_slam_tpu.evaluate.pose_metrics import planar_pose_errors
from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
from radar_slam_tpu.pipeline import frame as pipe

CFG = PipelineConfig(
    radar=RadarConfig(noise_power=1e-6, num_chirps=64),
    detection=DetectionConfig(threshold_db=-10.0, max_detections=64),
    aoa=AoAConfig(search_resolution_deg=1.0, confidence_threshold=0.5,
                  max_targets=50),
    velocity=VelocityConfig(),
)


@pytest.fixture(scope="module")
def scene():
    return constant_motion_scene(
        jax.random.key(7), num_frames=10, dt=CFG.frame_dt,
        v_body=(8.0, 0.5), yaw_rate=0.05,
        scene=SceneConfig(num_points=48, max_scatterers=CFG.max_scatterers))


@pytest.mark.slow
def test_sequence_velocity_recovery(scene):
    batches, gt = scene
    out = pipe.process_sequence(batches, jax.random.key(0), CFG)
    ok = np.asarray(out.motion.success)
    assert ok[1:].all(), "every frame after the first should solve"
    v = np.asarray(out.motion.velocity)[1:]
    w = np.asarray(out.motion.angular_velocity)[1:]
    np.testing.assert_allclose(v[:, 0], 8.0, atol=0.3)
    np.testing.assert_allclose(v[:, 1], 0.5, atol=0.3)
    np.testing.assert_allclose(w[:, 2], 0.05, atol=0.05)


def test_sequence_trajectory_parity_bound(scene):
    batches, gt = scene
    out = pipe.process_sequence(batches, jax.random.key(0), CFG)
    est_pose = np.asarray(out.pose)                    # [F, 3] after update
    gt_pose = np.asarray(gt["poses"])                  # pose at frame start
    # Frame 0 makes no update (no previous targets), so out.pose[0] is the
    # origin = gt_pose[0]; frame i's update lands on gt_pose[i].
    m = planar_pose_errors(est_pose, gt_pose)
    assert m["position_rmse"] <= 0.5, m                # beats 0.777 m bound
    assert m["yaw_rmse"] <= 0.1, m                     # beats 0.466 rad bound


@pytest.mark.slow
def test_signal_sequence_entry(scene):
    batches, gt = scene
    from radar_slam_tpu.signal.synth import synthesize_frames_batch
    two = jax.tree.map(lambda x: x[:2], batches)
    signals = synthesize_frames_batch(two, CFG.radar, jax.random.key(0))
    assert signals.shape == (2, 8, 64, 400)
    out = pipe.process_signal_sequence(signals, CFG)
    assert np.asarray(out.pose).shape == (2, 3)


@pytest.mark.slow
def test_streaming_matches_scan(scene):
    """Frame-by-frame stepping must equal the scan driver exactly."""
    batches, _ = scene
    three = jax.tree.map(lambda x: x[:3], batches)
    out_scan = pipe.process_sequence(three, jax.random.key(0), CFG)
    keys = jax.random.split(jax.random.key(0), 3)
    st = pipe.init_state(CFG)
    poses = []
    for i in range(3):
        sc = jax.tree.map(lambda x: x[i], three)
        st, out = pipe.process_scatterers(st, sc, keys[i], CFG)
        poses.append(np.asarray(out.pose))
    np.testing.assert_allclose(np.stack(poses), np.asarray(out_scan.pose),
                               rtol=1e-5, atol=1e-5)
