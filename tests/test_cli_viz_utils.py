"""CLI subcommands, visualization, analysis, profiling, checkpointing."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_slam_tpu.pipeline.cli import main as cli_main
from radar_slam_tpu.utils import checkpointing, profiling
from radar_slam_tpu.viz import analyze


def test_cli_quick_compare(capsys):
    rc = cli_main(["quick-compare", "--frames", "8"])
    out = capsys.readouterr().out
    assert "PARITY: PASS" in out
    assert rc == 0
    payload = json.loads(out[:out.rindex("}") + 1])
    assert payload["position_rmse_m"] <= 0.777
    assert payload["yaw_rmse_rad"] <= 0.466


def test_cli_simulate_process_visualize(tmp_path, capsys):
    raw = tmp_path / "raw"
    rc = cli_main(["simulate", "--out", str(raw), "--max-frames", "2"])
    assert rc == 0
    assert (raw / "frame_0001.npy").exists()
    rds = tmp_path / "rds"
    rc = cli_main(["process", "--raw", str(raw), "--out", str(rds)])
    assert rc == 0
    assert (rds / "frame_0001_rds.npy").exists()


def test_cli_analyze(tmp_path, capsys):
    rc = cli_main(["analyze", "--max-frames", "6", "--out", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "complete_analysis.png").exists()
    out = capsys.readouterr().out
    m = json.loads(out[:out.rindex("}") + 1])
    assert m["frames_processed"] == 6


def test_cli_pipeline_and_visualize(tmp_path, capsys):
    run = tmp_path / "run"
    rc = cli_main(["pipeline", "--out", str(run), "--max-frames", "4"])
    assert rc == 0
    rc = cli_main(["visualize", "--run-dir", str(run)])
    assert rc == 0
    viz = run / "visualizations"
    assert (viz / "rds.png").exists()
    assert (viz / "trajectory.png").exists()


def test_analyze_detections():
    det = {
        "range_m": np.array([10.0, 50.0, 20.0, 0.0]),
        "doppler_hz": np.array([100.0, -200.0, 0.0, 0.0]),
        "vr_mps": np.array([2.0, -3.0, 0.1, 0.0]),
        "power_db": np.array([5.0, -3.0, 0.0, 0.0]),
        "valid": np.array([True, True, True, False]),
    }
    stats = analyze.analyze_detections(det)
    assert stats["num_detections"] == 3
    assert stats["near_targets"] == 2 and stats["far_targets"] == 1
    assert stats["moving_targets"] == 2 and stats["stationary_targets"] == 1
    seq = analyze.analyze_sequence_detections([det, det])
    assert seq["total_detections"] == 6


def test_stage_timer_and_benchmark():
    timer = profiling.StageTimer()
    with timer.section("work"):
        _ = jnp.sum(jnp.ones(100)).block_until_ready()
    timer.record("manual", 0.5)
    s = timer.stats()
    assert s["work"]["count"] == 1 and s["manual"]["mean_s"] == 0.5
    r = profiling.benchmark(lambda x: x * 2, jnp.ones(8), reps=2)
    assert r["mean_s"] >= 0


def test_checkpoint_roundtrip(tmp_path):
    from radar_slam_tpu.core.config import complete_analysis_config
    from radar_slam_tpu.pipeline.frame import init_state
    cfg = complete_analysis_config()
    state = init_state(cfg)
    state = state._replace(pose=jnp.array([1.0, 2.0, 0.3]))
    p = checkpointing.save_pytree(tmp_path / "state_0001", state, step=17)
    assert p.exists()
    template = init_state(cfg)
    restored, step = checkpointing.load_pytree(tmp_path / "state_0001",
                                               template)
    assert step == 17
    np.testing.assert_allclose(np.asarray(restored.pose), [1.0, 2.0, 0.3])
    latest = checkpointing.latest_checkpoint(tmp_path)
    assert latest is not None and latest.name == "state_0001.npz"


def test_rds_quality_and_compare():
    rng = np.random.default_rng(0)
    rds = (rng.normal(0, 0.01, (8, 64, 32))
           + 1j * rng.normal(0, 0.01, (8, 64, 32)))
    rds[:, 30, 16] += 10.0
    q = analyze.analyze_rds_quality(rds)
    assert q["dynamic_range_db"] > 40
    assert 0 < q["energy_concentration_top1pct"] <= 1.0
    frames = [{"valid": np.array([True, True]),
               "range_m": np.array([10.0 + i, 20.0 + i])} for i in range(5)]
    c = analyze.compare_frames(frames)
    assert c["count_mean"] == 2.0
    assert abs(c["range_mean_drift_per_frame"] - 1.0) < 1e-9


def test_sequence_quality_analysis(tmp_path):
    import pytest as _pytest
    h5py = _pytest.importorskip("h5py")
    root = tmp_path / "rs"
    (root / "data" / "sequence_2").mkdir(parents=True)
    n = 100
    rng = np.random.default_rng(1)
    radar = np.zeros(n, dtype=[("timestamp", "i8"), ("sensor_id", "u1"),
                               ("range_sc", "f4"), ("azimuth_sc", "f4"),
                               ("rcs", "f4"), ("vr", "f4"),
                               ("x_cc", "f4"), ("y_cc", "f4")])
    radar["timestamp"] = np.sort(rng.integers(0, 2_000_000, n))
    radar["range_sc"] = rng.uniform(2, 60, n)
    odo = np.zeros(20, dtype=[("timestamp", "i8"), ("x_seq", "f8"),
                              ("y_seq", "f8"), ("yaw_seq", "f8"),
                              ("vx", "f8"), ("yaw_rate", "f8")])
    odo["timestamp"] = np.linspace(0, 2_000_000, 20).astype(np.int64)
    odo["x_seq"] = np.linspace(0, 20, 20)
    odo["vx"] = 10.0
    with h5py.File(root / "data" / "sequence_2" / "radar_data.h5", "w") as f:
        f.create_dataset("radar_data", data=radar)
        f.create_dataset("odometry", data=odo)
    from radar_slam_tpu.io.radarscenes import RadarScenesLoader
    loader = RadarScenesLoader(root)
    data = loader.load_sequence_data("sequence_2")
    q = loader.analyze_sequence_quality(data)
    assert q["radar_measurements"] == n
    assert abs(q["total_distance"] - 20.0) < 1e-6
    assert q["velocity_stats"]["mean"] == 10.0
    assert q["duration_seconds"] > 0


@pytest.mark.slow
def test_cli_analyze_data_insights_multiseq(tmp_path, capsys):
    """analyze-data over two synthetic runs: JSON + markdown dataset rollup
    (parity with scripts/analyze_data.py plus multi-sequence aggregation;
    VERDICT round-1 item 10 done criterion)."""
    runs = []
    for name in ("seq_a", "seq_b"):
        run = tmp_path / name
        assert cli_main(["pipeline", "--out", str(run),
                         "--max-frames", "3"]) == 0
        runs.append(run)
    out_dir = tmp_path / "agg"
    rc = cli_main(["analyze-data", "--output", str(runs[0]),
                   "--output", str(runs[1]), "--insights",
                   "--out", str(out_dir)])
    assert rc == 0
    data = json.loads((out_dir / "insights.json").read_text())
    assert data["sequences"] == 2
    assert data["total_frames"] == 6
    assert data["total_peaks"] > 0
    md = (out_dir / "insights.md").read_text()
    assert "## seq_a" in md and "## seq_b" in md
    assert "Close/medium/far" in md


def test_cli_analyze_data_single_frame_and_compare(tmp_path, capsys):
    run = tmp_path / "run"
    assert cli_main(["pipeline", "--out", str(run), "--max-frames", "3"]) == 0
    capsys.readouterr()                      # drain the pipeline's output
    rc = cli_main(["analyze-data", "--output", str(run), "--frame", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    m = json.loads(out[:out.rindex("}") + 1])
    assert m["frame"] == 1
    assert m["peaks"]["num_detections"] > 0
    assert m["rds_quality"]["dynamic_range_db"] > 10
    rc = cli_main(["analyze-data", "--output", str(run), "--compare"])
    assert rc == 0
    out = capsys.readouterr().out
    m = json.loads(out[:out.rindex("}") + 1])
    assert m["frames"] == 3
    rc = cli_main(["analyze-data", "--output", str(tmp_path / "nope")])
    assert rc == 2
