#!/usr/bin/env python3
"""End-to-end benchmark: full radar ego-motion pipeline frames/s on one chip.

Workload = BASELINE.json config 2 (synthetic raw FMCW): point-cloud
scatterers -> FMCW synthesis -> dechirp + 2-D range-Doppler FFT -> CFAR
detection -> robust AoA (beamforming + confidence + MDL + smoothing) ->
association -> two-step 6-DoF velocity solve -> pose integration, at the
reference's complete-analysis operating point (32 chirps, 8 antennas,
400 samples, 2 deg grid, top-50 targets; radarscenes_complete_analysis.py:
47-87).

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


def main():
    from radar_slam_tpu.core.config import complete_analysis_config
    from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
    from radar_slam_tpu.pipeline import frame as pipe

    cfg = complete_analysis_config()
    n_frames = 64
    batches, gt = constant_motion_scene(
        7, num_frames=n_frames, dt=cfg.frame_dt,
        v_body=(8.0, 0.5), yaw_rate=0.05,
        scene=SceneConfig(num_points=96, max_scatterers=cfg.max_scatterers))
    jax.block_until_ready(batches)

    # Two drivers: the sequential lax.scan (latency-oriented) and the
    # two-phase batched driver (throughput-oriented; heavy stages vmapped
    # over all frames, only the tiny state machine scanned).
    run_batched = lambda: pipe.process_sequence_batched(
        batches, jax.random.key(0), cfg)
    run_scan = lambda: pipe.process_sequence(batches, jax.random.key(0), cfg)

    def timed(run, reps, trials=3):
        out = run()
        jax.block_until_ready(out)       # compile
        for _ in range(3):               # warm the dispatch path
            out = run()
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(reps):
                # Synchronize after EVERY execution: async queuing inflates
                # apparent throughput (deep pipelines overlap host time).
                jax.block_until_ready(run())
            best = min(best, (time.perf_counter() - t0) / reps)
        return out, n_frames / best

    out, fps = timed(run_batched, reps=20)
    _, fps_scan = timed(run_scan, reps=10)

    # Sanity: the benchmark only counts if the pipeline actually works.
    ok = np.asarray(out.motion.success)
    pose_err = float(np.linalg.norm(
        np.asarray(out.pose)[-1][:2] - np.asarray(gt["poses"])[-1][:2]))
    sane = bool(ok[1:].mean() > 0.9) and pose_err < 0.15 * n_frames

    baseline_fps = 1.0 / 3.7   # reference complete-analysis s/frame midpoint
    result = {
        "metric": "e2e_pipeline_frames_per_sec_1chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 1),
        "frames": n_frames,
        "scan_driver_fps": round(fps_scan, 1),
        "sane": sane,
        "final_pose_err_m": round(pose_err, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
