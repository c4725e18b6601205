#!/usr/bin/env python3
"""Cube-free synthetic front end on the chip: isolated + end-to-end.

Compares, at the bench operating point (64-frame batches):

- isolated front end: synthesize -> rds_power (materialized cube) vs
  scatterer_power (cube never in HBM), chained device time;
- isolated signatures: detection_signatures (from the cube) vs
  scatterer_signatures (re-synthesized);
- end-to-end: process_sequence_batched with synth_in_kernel False vs True
  (differencing methodology), with pose error vs ground truth for both.

Usage: python scripts/bench_synthfused.py [--f1 64] [--f2 512]
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


def chained_time(fn, x0, iters=32):
    from radar_slam_tpu.utils.host import device_get

    @jax.jit
    def ch(x, n):
        def body(i, acc):
            xi = jax.tree.map(
                lambda a: a * (1 + 1e-7 * i)
                if jnp.issubdtype(a.dtype, jnp.inexact) else a, x)
            leaf = jax.tree.leaves(fn(xi))[0]
            return acc + jnp.sum(jnp.real(leaf).reshape(-1)[:4]
                                 ).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def tt(n):
        float(device_get(ch(x0, n)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(device_get(ch(x0, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    base = max(iters // 4, 1)
    return (tt(iters) - tt(base)) / (iters - base)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f1", type=int, default=64)
    ap.add_argument("--f2", type=int, default=512)
    args = ap.parse_args()

    from radar_slam_tpu.core.config import complete_analysis_config
    from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
    from radar_slam_tpu.pipeline import frame as pipe
    from radar_slam_tpu.signal.detect import detect_peaks_from_power
    from radar_slam_tpu.signal.rds import (_mix_vector, detection_signatures,
                                           rds_power)
    from radar_slam_tpu.signal.synth import (synthesis_factors,
                                             synthesize_frames_batch)
    from radar_slam_tpu.ops import synthpower_pallas as sp
    from radar_slam_tpu.utils.host import device_get

    cfg = dataclasses.replace(complete_analysis_config(), max_scatterers=128)
    C = cfg.radar.num_chirps
    S = cfg.radar.samples_per_chirp
    sigma = float(cfg.radar.noise_power) ** 0.5
    key = jax.random.key(0, impl="rbg")

    def scene(n):
        return constant_motion_scene(
            7, num_frames=n, dt=cfg.frame_dt, v_body=(8.0, 0.5),
            yaw_rate=0.05,
            scene=SceneConfig(num_points=96,
                              max_scatterers=cfg.max_scatterers))

    b1, gt1 = scene(args.f1)
    out = {"device": str(jax.devices()[0])}

    # ---- isolated front ends ------------------------------------------
    def cube_power(b):
        sig = synthesize_frames_batch(b, cfg.radar, key)
        return rds_power(sig, cfg.radar, window=cfg.window,
                         doppler_window=cfg.doppler_window,
                         dft_precision=cfg.power_precision)

    def cubefree_power(b):
        e_ac, e_fast = jax.vmap(
            lambda s: synthesis_factors(s, cfg.radar))(b)
        seeds = jnp.arange(e_ac.shape[0], dtype=jnp.int32)
        mix = _mix_vector(cfg.radar, cfg.window, "baseband", S)
        return sp.scatterer_power(e_ac, e_fast, seeds, mix, C, sigma,
                                  doppler_window=cfg.doppler_window,
                                  precision_name=cfg.power_precision)

    t_cube = chained_time(cube_power, b1) * 1e6
    t_free = chained_time(cubefree_power, b1) * 1e6
    out["front_end_us_64f"] = {"synth+power_cube": round(t_cube, 1),
                               "scatterer_power_cubefree": round(t_free, 1),
                               "speedup": round(t_cube / t_free, 2)}
    print(out["front_end_us_64f"], flush=True)

    # ---- isolated signatures ------------------------------------------
    p_lin = jax.jit(cubefree_power)(b1)
    det = jax.jit(jax.vmap(lambda p: detect_peaks_from_power(
        p, cfg.radar, cfg.detection)))(p_lin)

    def cube_sigs(b):
        sig = synthesize_frames_batch(b, cfg.radar, key)
        return jax.vmap(lambda s, r, d: detection_signatures(
            s, r, d, cfg.radar, window=cfg.window,
            doppler_window=cfg.doppler_window))(
                sig, det.range_bin, det.doppler_bin)

    def cubefree_sigs(b):
        e_ac, e_fast = jax.vmap(
            lambda s: synthesis_factors(s, cfg.radar))(b)
        seeds = jnp.arange(e_ac.shape[0], dtype=jnp.int32)
        mix = _mix_vector(cfg.radar, cfg.window, "baseband", S)
        return sp.scatterer_signatures(e_ac, e_fast, seeds, det.range_bin,
                                       det.doppler_bin, mix, C, sigma,
                                       doppler_window=cfg.doppler_window)

    out["signatures_us_64f"] = {
        "synth+gather_cube": round(chained_time(cube_sigs, b1) * 1e6, 1),
        "scatterer_sigs_cubefree": round(
            chained_time(cubefree_sigs, b1) * 1e6, 1)}
    print(out["signatures_us_64f"], flush=True)

    # ---- end to end ---------------------------------------------------
    b2, _ = scene(args.f2)
    for name, flag in [("materialized", False), ("cube_free", True)]:
        c = dataclasses.replace(cfg, synth_in_kernel=flag)

        def force(b, c=c):
            return float(device_get(
                pipe.process_sequence_batched(b, key, c).pose)[-1, 0])

        def time_one(b, trials=4):
            force(b)
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                force(b)
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = time_one(b1), time_one(b2)
        fps = (args.f2 - args.f1) / max(t2 - t1, 1e-9)
        pose = device_get(pipe.process_sequence_batched(b1, key, c).pose)
        err = float(np.linalg.norm(pose[-1, :2]
                                   - np.asarray(gt1["poses"])[-1, :2]))
        out[f"e2e_{name}"] = {"fps": round(fps, 1),
                              "final_pose_err_m": round(err, 3)}
        print(name, out[f"e2e_{name}"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
