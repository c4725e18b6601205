#!/usr/bin/env python3
"""A/B: dense vs split synthesis-factor layout for the one-pass front end.

Measures e2e batched-driver frames/s at the bench operating point with
ALL FOUR programs (dense/split x 64/512 frames) interleaved per trial, so
a congestion window hits every measurement (bench.py:time_pair rationale),
and reports the differenced fps per layout plus accuracy parity.

Usage: python scripts/bench_factors_ab.py [trials]
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import force, scene  # noqa: E402


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    f1 = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    f2 = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    import jax

    from radar_slam_tpu.core.config import complete_analysis_config
    from radar_slam_tpu.evaluate.pose_metrics import planar_pose_errors
    from radar_slam_tpu.pipeline import frame as pipe

    cfg = dataclasses.replace(complete_analysis_config(), max_scatterers=128)
    cfg_d = dataclasses.replace(cfg, frontend_factors="dense")
    cfg_s = dataclasses.replace(cfg, frontend_factors="split")
    batches1, gt1 = scene(cfg, f1)
    batches2, _ = scene(cfg, f2)
    key = jax.random.key(0, impl="rbg")

    runs = {
        "dense64": lambda: pipe.process_sequence_batched(batches1, key, cfg_d),
        "dense512": lambda: pipe.process_sequence_batched(batches2, key, cfg_d),
        "split64": lambda: pipe.process_sequence_batched(batches1, key, cfg_s),
        "split512": lambda: pipe.process_sequence_batched(batches2, key, cfg_s),
    }
    outs = {}
    for name, r in runs.items():          # compile + warm
        outs[name] = r()
        force(outs[name])
    best = {name: float("inf") for name in runs}
    for _ in range(trials):
        for name, r in runs.items():
            t0 = time.perf_counter()
            force(r())
            best[name] = min(best[name], time.perf_counter() - t0)

    fps_d = (f2 - f1) / max(best["dense512"] - best["dense64"], 1e-9)
    fps_s = (f2 - f1) / max(best["split512"] - best["split64"], 1e-9)
    gt_np = np.asarray(gt1["poses"])
    if f1 <= 64:        # longer open-loop runs drift off the bench scene;
        for name in ("dense64", "split64"):     # their RMSE is not a gate
            pose = np.asarray(outs[name].pose)
            err = float(np.linalg.norm(pose[-1][:2] - gt_np[-1][:2]))
            rmse = float(planar_pose_errors(pose, gt_np)["position_rmse"])
            print(f"{name}: final pose err {err:.3f} m, RMSE {rmse:.3f} m")
    print(f"dense: {fps_d:,.0f} frames/s   (t64 {best['dense64']*1e3:.1f} ms,"
          f" t512 {best['dense512']*1e3:.1f} ms)")
    print(f"split: {fps_s:,.0f} frames/s   (t64 {best['split64']*1e3:.1f} ms,"
          f" t512 {best['split512']*1e3:.1f} ms)")
    print(f"split/dense: {fps_s / fps_d:.3f}x")


if __name__ == "__main__":
    main()
