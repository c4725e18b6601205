#!/usr/bin/env python3
"""Per-stage roofline accounting: achieved device time vs theoretical bound
(VERDICT round-2 item 1 -- "publish a per-stage table of achieved vs
theoretical bound (bytes moved, FLOPs) for synth/RDS/detect/AoA/solve").

For every heavy pipeline stage at the bench operating point (64-frame
batch, 32 chirps x 8 antennas x 400 samples):

- FLOPs and HBM bytes come from XLA's own compiled-program cost model
  (``compiled.cost_analysis()`` -- what the program actually does after
  fusion, not a hand count); the Pallas kernel reports its declared
  ``pl.CostEstimate``.
- compute bound = flops / MXU peak; memory bound = bytes / HBM bandwidth;
  speed-of-light = max(both) -- optimistic (assumes every FLOP rides the
  bf16 MXU peak), so "% of SoL" is a LOWER bound on efficiency.
- achieved = chained-iteration device time (bench.py methodology: iterate
  inside one program, difference two iteration counts -- this backend's
  dispatch semantics make naive timing lie).

Defaults are TPU v5e: 197 TFLOP/s bf16 MXU peak, 819 GB/s HBM.

Usage: python scripts/roofline.py [--json out.json]
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


def _scalar(out):
    leaf = jax.tree.leaves(out)[0]
    return jnp.sum(jnp.real(leaf).reshape(-1)[:4]).astype(jnp.float32)


def chained_time(fn, x0, iters=32):
    @jax.jit
    def chained(x, n):
        def body(i, acc):
            xi = jax.tree.map(lambda a: a * (1 + 1e-7 * i)
                              if jnp.issubdtype(a.dtype, jnp.inexact) else a,
                              x)
            return acc + _scalar(fn(xi))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def t(n):
        float(np.asarray(chained(x0, n)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(chained(x0, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    base = max(iters // 4, 1)
    return max(t(iters) - t(base), 1e-12) / (iters - base)


def cost_of(fn, x0):
    """(flops, bytes) from the compiled program's own cost model."""
    compiled = jax.jit(fn).lower(x0).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="MXU peak, TFLOP/s (v5e bf16)")
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="HBM bandwidth, GB/s (v5e)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    peak = args.peak_tflops * 1e12
    bw = args.hbm_gbps * 1e9

    from radar_slam_tpu.aoa import confidence as conf_mod
    from radar_slam_tpu.aoa import estimators
    from radar_slam_tpu.core.config import complete_analysis_config
    from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
    from radar_slam_tpu.motion.velocity import solve_velocity
    from radar_slam_tpu.signal.detect import detect_peaks_from_power
    from radar_slam_tpu.signal.rds import (detection_signatures,
                                           range_doppler_spectrum, rds_power)
    from radar_slam_tpu.signal.synth import synthesize_frames_batch

    cfg = dataclasses.replace(complete_analysis_config(), max_scatterers=128)
    F = 64
    batches, _ = constant_motion_scene(
        7, num_frames=F, dt=cfg.frame_dt, v_body=(8.0, 0.5), yaw_rate=0.05,
        scene=SceneConfig(num_points=96, max_scatterers=cfg.max_scatterers))
    key = jax.random.key(0)

    signals = synthesize_frames_batch(batches, cfg.radar, key)
    p_lin = rds_power(signals, cfg.radar, window=cfg.window,
                      doppler_window=cfg.doppler_window,
                      dft_precision=cfg.power_precision)
    det = jax.jit(jax.vmap(lambda p: detect_peaks_from_power(
        p, cfg.radar, cfg.detection)))(p_lin)
    sigs = jax.jit(jax.vmap(lambda s, r, d: detection_signatures(
        s, r, d, cfg.radar, window=cfg.window,
        doppler_window=cfg.doppler_window)))(
            signals, det.range_bin, det.doppler_bin)

    def aoa_stage(s):
        flat = s.reshape(-1, s.shape[-1])
        R = estimators.signature_covariances(flat)
        ev, _ = estimators.eigendecompose(R)
        ns, multi, _ = conf_mod.mdl_model_order(ev)
        ang, _ = estimators.estimate_beamforming(flat, cfg.radar, cfg.aoa)
        conf = conf_mod.angle_confidence(flat, ang, cfg.radar)
        return ang, conf, ns

    # Velocity solve at the operating point: F frames x K targets.
    from radar_slam_tpu.core.types import Associations
    K = cfg.detection.max_detections
    rng = np.random.default_rng(0)
    d_raw = rng.standard_normal((F, K, 3)).astype(np.float32)
    d_raw /= np.linalg.norm(d_raw, axis=-1, keepdims=True)
    sol_in = Associations(
        prev_index=jnp.zeros((F, K), jnp.int32),
        distance=jnp.zeros((F, K), jnp.float32),
        temporal_phase_diff=jnp.asarray(
            rng.standard_normal((F, K)), jnp.float32),
        position=jnp.asarray(
            10.0 * rng.standard_normal((F, K, 3)), jnp.float32),
        direction=jnp.asarray(d_raw),
        vr_mps=jnp.asarray(rng.standard_normal((F, K)), jnp.float32),
        apparent_velocity=jnp.asarray(
            rng.standard_normal((F, K, 3)), jnp.float32),
        weight=jnp.asarray(rng.random((F, K)), jnp.float32),
        valid=jnp.ones((F, K), bool))

    def solve_stage(a):
        return jax.vmap(lambda ai: solve_velocity(
            ai, jnp.float32(cfg.frame_dt), cfg.radar.lambda_c,
            cfg.velocity))(a)

    # Cube-free production kernels (TPU backends only): factors + mix are
    # built in-trace (closed-over device arrays become constants whose np
    # materialization the axon backend rejects).
    sk_stages = []
    if jax.default_backend() in ("tpu", "axon"):
        from radar_slam_tpu.ops import synthpower_pallas as sp
        from radar_slam_tpu.signal.rds import _mix_vector
        from radar_slam_tpu.signal.synth import synthesis_factors

        C = cfg.radar.num_chirps
        S = cfg.radar.samples_per_chirp
        sigma = float(cfg.radar.noise_power) ** 0.5

        def sk_power(b):
            mix = _mix_vector(cfg.radar, cfg.window, "baseband", S)
            e_ac, e_fast = jax.vmap(lambda sc: synthesis_factors(
                sc, cfg.radar, cfg.synth_fidelity))(b)
            seeds = jnp.arange(e_ac.shape[0], dtype=jnp.int32)
            return sp.scatterer_power(
                e_ac, e_fast, seeds, mix, C, sigma,
                doppler_window=cfg.doppler_window,
                precision_name=cfg.power_precision,
                doppler_precision=cfg.synth_doppler_precision,
                doppler_layout=cfg.synth_doppler_layout)

        def sk_sigs(args):
            b, rb, db = args
            mix = _mix_vector(cfg.radar, cfg.window, "baseband", S)
            e_ac, e_fast = jax.vmap(lambda sc: synthesis_factors(
                sc, cfg.radar, cfg.synth_fidelity))(b)
            seeds = jnp.arange(e_ac.shape[0], dtype=jnp.int32)
            return sp.scatterer_signatures(
                e_ac, e_fast, seeds, rb, db, mix, C, sigma,
                doppler_window=cfg.doppler_window)

        sk_stages = [
            ("synth_power_kernel (cube-free production)", sk_power, batches),
            ("synth_signatures_kernel (cube-free production)", sk_sigs,
             (batches, det.range_bin, det.doppler_bin)),
        ]

        from radar_slam_tpu.pipeline import frame as pipe_mod
        if pipe_mod._one_pass_active(cfg):
            def sk_onepass(b):
                seeds = jnp.arange(b.range_m.shape[0], dtype=jnp.int32)
                return pipe_mod._onepass_frontend(b, seeds, cfg)[0]

            def sk_onepass_full(b):
                seeds = jnp.arange(b.range_m.shape[0], dtype=jnp.int32)
                _, d, s = pipe_mod._onepass_frontend(b, seeds, cfg)
                return d.range_m

            sk_stages += [
                ("frontend_onepass_kernel (r04+ production)", sk_onepass,
                 batches),
                ("frontend_onepass+topk+sigs (r04+ production)",
                 sk_onepass_full, batches),
            ]

    stages = [
        ("synthesis", lambda b: synthesize_frames_batch(b, cfg.radar, key),
         batches),
        ("rds_fft_cube (old detect path)",
         lambda s: jax.vmap(lambda x: range_doppler_spectrum(
             x, cfg.radar, doppler_window=cfg.doppler_window))(s), signals),
        ("power_fused (new detect path)",
         lambda s: rds_power(s, cfg.radar, window=cfg.window,
                             doppler_window=cfg.doppler_window,
                             dft_precision=cfg.power_precision), signals),
        ("detect_cfar_topk",
         lambda p: jax.vmap(lambda x: detect_peaks_from_power(
             x, cfg.radar, cfg.detection))(p), p_lin),
        ("signatures_topk",
         lambda s: jax.vmap(lambda x, r, d: detection_signatures(
             x, r, d, cfg.radar, window=cfg.window,
             doppler_window=cfg.doppler_window))(
                 s, det.range_bin, det.doppler_bin), signals),
        ("aoa_eigh_mdl_beamform_conf", aoa_stage, sigs),
        ("velocity_solve", solve_stage, sol_in),
    ]
    stages[3:3] = sk_stages

    rows = []
    for name, fn, x0 in stages:
        flops, nbytes = cost_of(fn, x0)
        t_meas = chained_time(fn, x0)
        t_c = flops / peak
        t_m = nbytes / bw
        sol = max(t_c, t_m)
        rows.append({
            "stage": name,
            "gflops_per_batch": round(flops / 1e9, 2),
            "mbytes_per_batch": round(nbytes / 1e6, 2),
            "bound": "compute" if t_c >= t_m else "memory",
            "sol_us": round(sol * 1e6, 1),
            "achieved_us": round(t_meas * 1e6, 1),
            # Differencing noise can produce a ~0 achieved time for very
            # cheap stages; a percentage computed from it is meaningless.
            "pct_of_sol": (round(100.0 * sol / t_meas, 1)
                           if t_meas * 1e6 >= 1.0 else None),
        })

    out = {"device": str(jax.devices()[0]), "frames": F,
           "peak_tflops": args.peak_tflops, "hbm_gbps": args.hbm_gbps,
           "stages": rows}
    print(json.dumps(out, indent=2))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
