#!/usr/bin/env python3
"""Fused-detection-path shoot-out on the active device (VERDICT round-2
item 1): ``fft_mode`` in {fft, fused} measured end to end with the
bench.py differencing methodology, plus the isolated power-map stage
(fused Pallas kernel vs XLA FFT + antenna-mean).

Usage: python scripts/bench_fused.py [--f1 64] [--f2 512]
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def e2e_fps(cfg, f1, f2, driver="batched"):
    from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
    from radar_slam_tpu.pipeline import frame as pipe

    key = jax.random.key(0, impl="rbg")
    run = (pipe.process_sequence_batched if driver == "batched"
           else pipe.process_sequence)

    def scene(n):
        return constant_motion_scene(
            7, num_frames=n, dt=cfg.frame_dt, v_body=(8.0, 0.5),
            yaw_rate=0.05,
            scene=SceneConfig(num_points=96,
                              max_scatterers=cfg.max_scatterers))

    def time_one(batches, trials=4):
        def force():
            return float(np.asarray(run(batches, key, cfg).pose[-1, 0]))
        force()
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            force()
            best = min(best, time.perf_counter() - t0)
        return best

    b1, gt1 = scene(f1)
    b2, _ = scene(f2)
    t1, t2 = time_one(b1), time_one(b2)
    out = run(b1, key, cfg)
    err = float(np.linalg.norm(np.asarray(out.pose)[-1, :2]
                               - np.asarray(gt1["poses"])[-1, :2]))
    return (f2 - f1) / max(t2 - t1, 1e-9), err


def stage_time(fn, x, iters=32):
    """Per-call device time by chaining iterations inside one program."""
    @jax.jit
    def chained(x, n):
        def body(i, acc):
            out = fn(jax.tree.map(lambda v: v * (1.0 + 1e-7 * i), x))
            return acc + jnp.sum(jax.tree.leaves(out)[0][..., 0, :4].real)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def t(n):
        float(np.asarray(chained(x, n)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(chained(x, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = max(iters // 4, 1), iters
    return max(t(n2) - t(n1), 1e-9) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f1", type=int, default=64)
    ap.add_argument("--f2", type=int, default=512)
    ap.add_argument("--skip-e2e", action="store_true")
    args = ap.parse_args()

    from radar_slam_tpu.core.config import complete_analysis_config
    from radar_slam_tpu.signal.rds import range_doppler_spectrum, rds_power
    from radar_slam_tpu.utils.host import device_get, device_put

    cfg = dataclasses.replace(complete_analysis_config(), max_scatterers=128)
    rcfg = cfg.radar
    F, A, C, S = args.f1, rcfg.total_antennas, rcfg.num_chirps, \
        rcfg.samples_per_chirp
    rng = np.random.default_rng(0)
    x = device_put((rng.standard_normal((F, A, C, S)).astype(np.float32)
                    + 1j * rng.standard_normal((F, A, C, S))
                    .astype(np.float32)).astype(np.complex64))

    results = {"device": str(jax.devices()[0]), "shape_FACS": [F, A, C, S]}

    # Isolated power-map stage.
    def p_fft(xx):
        return rds_power(xx, rcfg, window=cfg.window,
                         doppler_window=cfg.doppler_window, mode="xla")

    def p_fused(xx, prec):
        return rds_power(xx, rcfg, window=cfg.window,
                         doppler_window=cfg.doppler_window, mode="pallas",
                         dft_precision=prec)

    ref = device_get(p_fft(x[:2]))
    iso = {}
    iso["xla_fft_power"] = {"us_per_batch": round(stage_time(p_fft, x) * 1e6, 1)}
    for prec in ["default", "high"]:
        try:
            got = device_get(p_fused(x[:2], prec))
            db = np.abs(10 * np.log10(got + 1e-12) - 10 * np.log10(ref + 1e-12))
            strong = ref > 1e-3 * ref.max()
            dt = stage_time(lambda xx, p=prec: p_fused(xx, p), x)
            iso[f"pallas_{prec}"] = {
                "us_per_batch": round(dt * 1e6, 1),
                "db_err_strong_cells": round(float(db[strong].max()), 4),
            }
        except Exception as e:  # pragma: no cover
            iso[f"pallas_{prec}"] = {"error": f"{type(e).__name__}: {e}"}
    results["isolated_power_stage"] = iso

    if not args.skip_e2e:
        e2e = {}
        for mode in ["fft", "fused"]:
            c = dataclasses.replace(cfg, fft_mode=mode)
            fps, err = e2e_fps(c, args.f1, args.f2)
            e2e[mode] = {"frames_per_s": round(fps, 1),
                         "final_pose_err_m": round(err, 3)}
        results["e2e_batched"] = e2e
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
