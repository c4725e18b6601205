"""CLI `analyze --dataset` and `evaluate` over a miniature generated
RadarScenes-layout dataset (full ingest -> pipeline -> metrics path)."""

import json

import numpy as np
import pytest

from radar_slam_tpu.pipeline.cli import main as cli_main


@pytest.fixture()
def mini_dataset(tmp_path):
    h5py = pytest.importorskip("h5py")
    root = tmp_path / "rs"
    (root / "data" / "sequence_9").mkdir(parents=True)
    rng = np.random.default_rng(3)
    # 6 frames x ~40 targets in a 100 ms grid; static world, ego at rest.
    n_frames, per = 6, 40
    rows = []
    for f in range(n_frames):
        t0 = f * 100_000
        for _ in range(per):
            rows.append((t0 + int(rng.integers(0, 90_000)),
                         int(rng.integers(1, 3)),
                         rng.uniform(5, 50), rng.uniform(-0.8, 0.8),
                         rng.uniform(5, 20), 0.0, 0.0, 0.0))
    radar = np.array(rows, dtype=[("timestamp", "i8"), ("sensor_id", "u1"),
                                  ("range_sc", "f4"), ("azimuth_sc", "f4"),
                                  ("rcs", "f4"), ("vr", "f4"),
                                  ("x_cc", "f4"), ("y_cc", "f4")])
    odo = np.zeros(10, dtype=[("timestamp", "i8"), ("x_seq", "f8"),
                              ("y_seq", "f8"), ("yaw_seq", "f8"),
                              ("vx", "f8"), ("yaw_rate", "f8")])
    odo["timestamp"] = np.linspace(0, 600_000, 10).astype(np.int64)
    with h5py.File(root / "data" / "sequence_9" / "radar_data.h5", "w") as f:
        f.create_dataset("radar_data", data=radar)
        f.create_dataset("odometry", data=odo)
    (root / "data" / "sensors.json").write_text(json.dumps({"sensors": [
        {"id": 1, "x": 1.8, "y": 0.9, "yaw": 0.35},
        {"id": 2, "x": 1.8, "y": -0.9, "yaw": -0.35}]}))
    return root


def test_cli_analyze_dataset_defaults_to_rig(mini_dataset, capsys):
    """sensors.json declares off-origin mounts, so the exact-geometry rig
    path is selected WITHOUT --rig (VERDICT round-1 item 3: sensor-origin
    geometry is the default dataset path)."""
    rc = cli_main(["analyze", "--dataset", str(mini_dataset),
                   "--seq", "sequence_9", "--max-frames", "6"])
    assert rc == 0
    out = capsys.readouterr().out
    m = json.loads(out[:out.rindex("}") + 1])
    assert m["rig"] == [[1.8, 0.9, 0.35], [1.8, -0.9, -0.35]]
    assert m["frames"] == 6
    assert m["position_rmse"] < 0.5


def test_cli_analyze_dataset_merged(mini_dataset, capsys):
    """--merged forces the legacy reference-parity path."""
    rc = cli_main(["analyze", "--merged", "--dataset", str(mini_dataset),
                   "--seq", "sequence_9", "--max-frames", "6"])
    assert rc == 0
    out = capsys.readouterr().out
    m = json.loads(out[:out.rindex("}") + 1])
    assert m["frames_processed"] == 6
    # Stationary ego, static world: estimated motion should be ~zero.
    assert m["position_rmse"] < 0.5


def test_cli_analyze_dataset_rig(mini_dataset, capsys):
    """Per-sensor rig path over the mini dataset: sensors.json mounts are
    picked up and the stationary ego stays near the origin."""
    rc = cli_main(["analyze", "--rig", "--dataset", str(mini_dataset),
                   "--seq", "sequence_9", "--max-frames", "6"])
    assert rc == 0
    out = capsys.readouterr().out
    m = json.loads(out[:out.rindex("}") + 1])
    assert m["frames"] == 6
    assert m["rig"] == [[1.8, 0.9, 0.35], [1.8, -0.9, -0.35]]
    assert m["position_rmse"] < 0.5


def test_loader_rig_batches(mini_dataset):
    from radar_slam_tpu.io.radarscenes import RadarScenesLoader
    loader = RadarScenesLoader(str(mini_dataset))
    data = loader.load_sequence_data("sequence_9")
    frames = loader.extract_radar_frames(data, 100.0)
    batches, rig, gt = loader.frames_as_batches_rig(data, frames, 64)
    assert batches.range_m.shape == (len(frames), 2, 64)
    assert rig == ((1.8, 0.9, 0.35), (1.8, -0.9, -0.35))
    # Sensor-frame azimuths must be the raw measurements (no mounting
    # rotation applied by the loader).
    assert np.abs(np.asarray(batches.azimuth_rad)).max() <= 0.8 + 1e-6


def test_cli_evaluate(tmp_path, capsys):
    run = tmp_path / "run"
    rc = cli_main(["pipeline", "--out", str(run), "--max-frames", "4"])
    assert rc == 0
    # GT: the pipeline subcommand's synthetic scene (seed 7, v=(8, .5), w=.05)
    gt_vel = np.zeros((4, 6))
    gt_vel[:, 0], gt_vel[:, 1], gt_vel[:, 5] = 8.0, 0.5, 0.05
    np.save(tmp_path / "gt_vel.npy", gt_vel)
    rc = cli_main(["evaluate", "--run-dir", str(run),
                   "--gt-velocities", str(tmp_path / "gt_vel.npy")])
    assert rc == 0
    assert (run / "evaluation" / "velocity_report.md").exists()


def test_cli_evaluate_shape_mismatch(tmp_path, capsys):
    run = tmp_path / "run"
    assert cli_main(["pipeline", "--out", str(run), "--max-frames", "4"]) == 0
    np.save(tmp_path / "bad.npy", np.zeros((9, 6)))
    rc = cli_main(["evaluate", "--run-dir", str(run),
                   "--gt-velocities", str(tmp_path / "bad.npy")])
    assert rc == 2


def test_cli_evaluate_nothing(tmp_path):
    rc = cli_main(["evaluate", "--run-dir", str(tmp_path)])
    assert rc == 2
