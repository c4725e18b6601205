#!/usr/bin/env python3
"""End-to-end benchmark: full radar ego-motion pipeline frames/s on one chip.

Workload = BASELINE.json config 2 (synthetic raw FMCW): point-cloud
scatterers -> FMCW synthesis -> dechirp + 2-D range-Doppler FFT -> CFAR
detection -> robust AoA (beamforming + confidence + MDL + smoothing) ->
association -> two-step 6-DoF velocity solve -> pose integration, at the
reference's complete-analysis operating point (32 chirps, 8 antennas,
400 samples, 2 deg grid, top-50 targets; radarscenes_complete_analysis.py:
47-87).

Timing methodology (this container's TPU tunnel makes naive timing lie in
BOTH directions: ``block_until_ready`` resolves before device completion,
and each dispatch pays a ~1-2 ms synchronous round trip):
- completion is forced by fetching real output data, the only trustworthy
  barrier;
- per-frame device time is obtained by DIFFERENCING two sequence lengths
  (F2 - F1 frames in one dispatch each), cancelling the constant
  dispatch/fetch overhead;
- the reported frames/s is (F2 - F1) / (T2 - T1), best of several trials.

Baseline: the reference's real pipeline runs 3.28-4.14 s/frame on CPU
(results/analysis/output_radarscenes/sequence_9_results.json; BASELINE.md)
-> 0.27 frames/s.  vs_baseline = our frames/s / 0.27.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
"""

import json
import time

import jax
import numpy as np


def scene(cfg, n_frames):
    from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
    return constant_motion_scene(
        7, num_frames=n_frames, dt=cfg.frame_dt,
        v_body=(8.0, 0.5), yaw_rate=0.05,
        scene=SceneConfig(num_points=96, max_scatterers=cfg.max_scatterers))


def force(out):
    return float(np.asarray(out.pose[-1, 0]))


def time_one(run, trials=4):
    """Wall time of one dispatch + data-fetch, best of trials."""
    out = run()
    force(out)                            # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = run()
        force(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    import dataclasses

    from radar_slam_tpu.core.config import complete_analysis_config
    from radar_slam_tpu.pipeline import frame as pipe

    # Right-size the static scatterer capacity to the workload (96 points);
    # the library default of 512 exists for dense RadarScenes frames and
    # spends ~80% of the synthesis matmul multiplying padding at this
    # operating point.  Capacity is a static-shape knob, not physics: the
    # 96 observed scatterers are identical either way.
    cfg = dataclasses.replace(complete_analysis_config(), max_scatterers=128)
    f1, f2 = 64, 512
    batches1, gt1 = scene(cfg, f1)
    batches2, _ = scene(cfg, f2)

    # RBG PRNG for the synthesis AWGN: the default threefry spends more
    # device time generating 13M Gaussians per 64-frame batch than the
    # synthesis matmul itself; the counter-based RBG is the TPU-native
    # generator (the key's impl propagates through every split).
    key = jax.random.key(0, impl="rbg")
    out1, t1 = time_one(lambda: pipe.process_sequence_batched(batches1, key, cfg))
    out2, t2 = time_one(lambda: pipe.process_sequence_batched(batches2, key, cfg))
    fps = (f2 - f1) / max(t2 - t1, 1e-9)

    _, t1s = time_one(lambda: pipe.process_sequence(batches1, key, cfg))
    _, t2s = time_one(lambda: pipe.process_sequence(batches2, key, cfg))
    fps_scan = (f2 - f1) / max(t2s - t1s, 1e-9)

    # Sanity: the benchmark only counts if the pipeline actually works.
    ok = np.asarray(out1.motion.success)
    pose_err = float(np.linalg.norm(
        np.asarray(out1.pose)[-1][:2] - np.asarray(gt1["poses"])[-1][:2]))
    sane = bool(ok[1:].mean() > 0.9) and pose_err < 0.15 * f1

    baseline_fps = 1.0 / 3.7   # reference complete-analysis s/frame midpoint
    result = {
        "metric": "e2e_pipeline_frames_per_sec_1chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 1),
        "frames_delta": f2 - f1,
        "scan_driver_fps": round(fps_scan, 1),
        "dispatch_s_64f": round(t1, 4),
        "sane": sane,
        "final_pose_err_m": round(pose_err, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
