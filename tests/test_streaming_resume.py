"""Streaming crash recovery via checkpoint/resume (VERDICT round-2 item 6;
SURVEY.md section 5 "checkpoint / resume").

The reference's only recovery story is whole-stage artifact re-runs
(``scripts/run_ego_motion_pipeline.py:96-105``); here the streaming runtime
persists its full in-stage state (``FrameState`` pytree + accumulated
results) every N frames, a run is KILLED mid-sequence (``os._exit`` in a
child process -- no cleanup, no atexit), and a fresh analyzer restores the
latest checkpoint and finishes the sequence.  The resumed trajectory must
equal the uninterrupted run's exactly (bitwise: same jitted step, same
per-frame PRNG keys, exact float32 round-trip through the .npz)."""

import json
import os
import subprocess
import sys

import pytest
import jax
import numpy as np

from radar_slam_tpu.core.config import (AoAConfig, DetectionConfig,
                                        PipelineConfig, RadarConfig)
from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
from radar_slam_tpu.pipeline.streaming import StreamingAnalyzer

FRAMES = 9
CKPT_EVERY = 3


def fast_test_config() -> PipelineConfig:
    return PipelineConfig(
        radar=RadarConfig(noise_power=1e-6, num_chirps=32),
        detection=DetectionConfig(cfar_train_cells=8, guard_cells=2,
                                  cfar_offset_db=12.0, max_detections=32),
        aoa=AoAConfig(search_resolution_deg=2.0, max_targets=32),
    )


def _scene(cfg):
    return constant_motion_scene(
        0, FRAMES, cfg.frame_dt, (6.0, 0.3), 0.05,
        SceneConfig(num_points=24, max_scatterers=cfg.max_scatterers))


def _run_full(cfg, batches, gt):
    a = StreamingAnalyzer(cfg)
    a.analyze_sequence(batches, gt_poses=gt["poses"])
    return np.asarray(a.results["estimated_trajectory"])


@pytest.mark.slow
def test_resume_matches_uninterrupted(tmp_path):
    """In-process: abandon an analyzer mid-sequence, restore a new one from
    its checkpoints, finish; trajectories must be identical."""
    cfg = fast_test_config()
    batches, gt = _scene(cfg)
    want = _run_full(cfg, batches, gt)

    ckdir = str(tmp_path / "ck")
    a1 = StreamingAnalyzer(cfg, checkpoint_dir=ckdir,
                           checkpoint_every=CKPT_EVERY)
    for i in range(7):                      # crash after 7 of 9 frames
        sc = jax.tree.map(lambda x: x[i], batches)
        a1.process_frame(sc, gt_pose=gt["poses"][i])
    del a1                                  # "crash"

    a2 = StreamingAnalyzer(cfg, checkpoint_dir=ckdir,
                           checkpoint_every=CKPT_EVERY)
    assert a2.restore_latest()
    assert a2.frame_idx == 6                # latest checkpoint: frame 6
    a2.analyze_sequence(batches, gt_poses=gt["poses"])

    got = np.asarray(a2.results["estimated_trajectory"])
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
    # GT bookkeeping also survives the round trip.
    assert len(a2.results["ground_truth_trajectory"]) == FRAMES
    m = a2.compute_error_metrics()
    assert m["frames_processed"] == FRAMES


@pytest.mark.slow
def test_resume_after_hard_kill(tmp_path):
    """Child process os._exit()s mid-sequence (a real crash: no flush, no
    cleanup); the parent resumes from its checkpoints and matches the
    uninterrupted trajectory."""
    cfg = fast_test_config()
    batches, gt = _scene(cfg)
    want = _run_full(cfg, batches, gt)

    ckdir = str(tmp_path / "ck")
    worker = f"""
import os, sys
sys.path.insert(0, {json.dumps(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from radar_slam_tpu.core.config import (AoAConfig, DetectionConfig,
                                        PipelineConfig, RadarConfig)
from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
from radar_slam_tpu.pipeline.streaming import StreamingAnalyzer
cfg = PipelineConfig(
    radar=RadarConfig(noise_power=1e-6, num_chirps=32),
    detection=DetectionConfig(cfar_train_cells=8, guard_cells=2,
                              cfar_offset_db=12.0, max_detections=32),
    aoa=AoAConfig(search_resolution_deg=2.0, max_targets=32))
batches, gt = constant_motion_scene(
    0, {FRAMES}, cfg.frame_dt, (6.0, 0.3), 0.05,
    SceneConfig(num_points=24, max_scatterers=cfg.max_scatterers))
a = StreamingAnalyzer(cfg, checkpoint_dir={json.dumps(ckdir)},
                      checkpoint_every={CKPT_EVERY})
for i in range(7):
    sc = jax.tree.map(lambda x, i=i: x[i], batches)
    a.process_frame(sc, gt_pose=gt["poses"][i])
os._exit(1)   # hard crash mid-sequence
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run([sys.executable, "-c", worker], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 1, proc.stderr[-2000:]

    a2 = StreamingAnalyzer(cfg, checkpoint_dir=ckdir,
                           checkpoint_every=CKPT_EVERY)
    assert a2.restore_latest()
    a2.analyze_sequence(batches, gt_poses=gt["poses"])
    got = np.asarray(a2.results["estimated_trajectory"])
    np.testing.assert_array_equal(got, want)
