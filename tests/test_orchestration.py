"""Tests: six-step artifact pipeline, streaming analyzer, real-time runtime,
artifact schema round-trip, RadarScenes loader (gated on dataset)."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_slam_tpu.core.config import (AoAConfig, DetectionConfig,
                                        PipelineConfig, RadarConfig,
                                        VelocityConfig)
from radar_slam_tpu.io import artifacts
from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
from radar_slam_tpu.pipeline.pipeline import EgoMotionPipeline
from radar_slam_tpu.pipeline.streaming import (StreamingAnalyzer,
                                               create_real_time_estimator)

CFG = PipelineConfig(
    radar=RadarConfig(noise_power=1e-6, num_chirps=32),
    detection=DetectionConfig(cfar_train_cells=8, guard_cells=2,
                              cfar_offset_db=12.0, max_detections=32),
    aoa=AoAConfig(search_resolution_deg=2.0, confidence_threshold=0.5,
                  max_targets=32),
    velocity=VelocityConfig(),
)


@pytest.fixture(scope="module")
def scene():
    return constant_motion_scene(
        jax.random.key(11), num_frames=8, dt=CFG.frame_dt,
        v_body=(7.0, 0.0), yaw_rate=0.0,
        scene=SceneConfig(num_points=64, max_scatterers=CFG.max_scatterers))


@pytest.mark.slow
def test_six_step_pipeline(tmp_path, scene):
    batches, gt = scene
    pipe = EgoMotionPipeline(CFG, tmp_path, save_artifacts=True)
    gt_vel = np.zeros((8, 6))
    gt_vel[:, 0] = 7.0
    res = pipe.run_complete_pipeline(batches, gt_velocities=gt_vel)

    assert set(res["step_times"]) == {f"step{i}" for i in range(1, 7)}
    # Artifact schema on disk.
    assert (tmp_path / "raw_sim" / "frame_0000.npy").exists()
    assert (tmp_path / "raw_sim" / "synthesis_metadata.json").exists()
    assert (tmp_path / "rds" / "frame_0003_rds.npy").exists()
    assert (tmp_path / "rds" / "frame_0003_peaks.npz").exists()
    assert (tmp_path / "angles" / "frame_0003_angles.npz").exists()
    assert (tmp_path / "velocities" / "frame_0003_velocity.npz").exists()
    assert (tmp_path / "poses" / "trajectory.npz").exists()
    assert (tmp_path / "poses" / "trajectory.txt").exists()
    assert (tmp_path / "evaluation" / "velocity_report.md").exists()

    # Velocity accuracy (vmap batch mode, frames 1+).
    v = np.load(tmp_path / "velocities" / "frame_0004_velocity.npz")
    assert abs(float(v["velocity"][0]) - 7.0) < 0.3

    # Round-trips.
    rds, peaks = artifacts.load_rds_frame(tmp_path / "rds", 3)
    assert rds.shape == (8, 400, 32)
    assert "range_bin" in peaks
    traj = artifacts.load_trajectory(tmp_path / "poses")
    assert traj["positions"].shape == (8, 3)


def test_pipeline_resume_from_raw(tmp_path, scene):
    batches, gt = scene
    p1 = EgoMotionPipeline(CFG, tmp_path, save_artifacts=True)
    p1.step1_synthesize(batches)
    # New pipeline instance resumes from disk (implicit checkpointing).
    p2 = EgoMotionPipeline(CFG, tmp_path, save_artifacts=False)
    rds, det = p2.step2_process_signals()
    assert rds.shape[0] == 8


@pytest.mark.slow
def test_streaming_analyzer(scene):
    batches, gt = scene
    an = StreamingAnalyzer(CFG)
    metrics = an.analyze_sequence(batches, gt_poses=np.asarray(gt["poses"]))
    assert metrics["frames_processed"] == 8
    assert metrics["successful_estimates"] >= 6
    assert metrics["position_rmse"] < 0.5


def test_streaming_gt_fallback(scene):
    batches, gt = scene
    an = StreamingAnalyzer(CFG, gt_fallback=True)
    # Frame 0 never solves -> pose copied from GT (reference quirk :229-231).
    sc0 = jax.tree.map(lambda x: x[0], batches)
    out = an.process_frame(sc0, gt_pose=np.array([1.0, 2.0, 0.3]))
    assert not out["success"]
    np.testing.assert_allclose(out["pose"], [1.0, 2.0, 0.3])


def test_realtime_estimator(scene):
    batches, gt = scene
    est = create_real_time_estimator(CFG, queue_size=4)
    est.start_estimation()
    try:
        for i in range(8):
            sc = jax.tree.map(lambda x: x[i], batches)
            est.add_frame(sc)
            time.sleep(0.02)
        deadline = time.time() + 30
        while est.processor.frames_processed + est.processor.frames_dropped < 8 \
                and time.time() < deadline:
            time.sleep(0.1)
    finally:
        est.stop_estimation()
    m = est.get_performance_metrics()
    assert m["frames_processed"] >= 4
    assert m["frames_processed"] + m["frames_dropped"] >= 8
    assert est.get_latest_velocity_estimate() is not None
    status = est.processor.get_system_status()
    assert "devices" in status


def test_frame_buffer_memory_budget():
    from radar_slam_tpu.pipeline.streaming import FrameBuffer
    buf = FrameBuffer(max_frames=50, max_memory_mb=0.001)  # 1 KB budget
    for _ in range(10):
        buf.add_frame({"x": np.zeros(256, np.float32)})    # 1 KB each
    assert len(buf) < 10
    assert buf.dropped > 0


DATASET = os.environ.get("RADARSCENES_PATH", "/data/RadarScenes")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(DATASET, "data")),
    reason="RadarScenes dataset not available")
def test_radarscenes_loader_real_dataset():
    from radar_slam_tpu.io.radarscenes import RadarScenesLoader
    loader = RadarScenesLoader(DATASET)
    data = loader.load_sequence_data("sequence_125")
    frames = loader.extract_radar_frames(data)
    assert len(frames) > 0
    gt = loader.get_odometry_at_time(data, frames[0]["timestamp"])
    assert gt is not None
    batches, gts = loader.frames_as_batches(data, frames[:10], 512)
    assert batches.range_m.shape == (10, 512)


def test_radarscenes_loader_synthetic_h5(tmp_path):
    """Loader works on a miniature dataset built in the RadarScenes layout."""
    h5py = pytest.importorskip("h5py")
    root = tmp_path / "rs"
    (root / "data" / "sequence_1").mkdir(parents=True)
    n = 200
    rng = np.random.default_rng(0)
    t = np.sort(rng.integers(0, 1_000_000, n)).astype(np.int64)
    radar = np.zeros(n, dtype=[("timestamp", "i8"), ("sensor_id", "u1"),
                               ("range_sc", "f4"), ("azimuth_sc", "f4"),
                               ("rcs", "f4"), ("vr", "f4"),
                               ("x_cc", "f4"), ("y_cc", "f4")])
    radar["timestamp"] = t
    radar["sensor_id"] = rng.integers(1, 4, n)
    radar["range_sc"] = rng.uniform(2, 50, n)
    radar["azimuth_sc"] = rng.uniform(-1, 1, n)
    radar["rcs"] = rng.uniform(0, 20, n)
    radar["vr"] = rng.uniform(-5, 5, n)
    odo = np.zeros(12, dtype=[("timestamp", "i8"), ("x_seq", "f8"),
                              ("y_seq", "f8"), ("yaw_seq", "f8"),
                              ("vx", "f8"), ("yaw_rate", "f8")])
    odo["timestamp"] = np.linspace(0, 1_000_000, 12).astype(np.int64)
    odo["x_seq"] = np.linspace(0, 10, 12)
    with h5py.File(root / "data" / "sequence_1" / "radar_data.h5", "w") as f:
        f.create_dataset("radar_data", data=radar)
        f.create_dataset("odometry", data=odo)

    from radar_slam_tpu.io.radarscenes import RadarScenesLoader
    loader = RadarScenesLoader(root)
    data = loader.load_sequence_data("sequence_1")
    frames = loader.extract_radar_frames(data, frame_duration_ms=100.0)
    assert 5 <= len(frames) <= 10
    assert sum(f["total_measurements"] for f in frames) == n
    gt = loader.get_odometry_at_time(data, 500_000)
    assert gt is not None and abs(gt["x"] - 5.0) < 1.0
    batches, gts = loader.frames_as_batches(data, frames, 64)
    assert batches.range_m.shape[0] == len(frames)
    assert gts["valid"].all()
    stats = loader.sequence_statistics(data)
    assert stats["num_measurements"] == n
