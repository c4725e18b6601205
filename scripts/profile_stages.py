#!/usr/bin/env python3
"""Per-stage device-time breakdown of the pipeline (chained timing).

Stages measured independently over a 64-frame batch at the complete-analysis
operating point: synthesis, RDS (dechirp+windows+FFTs), detection
(CFAR+top-K+interp), signatures+eigh+MDL, beamforming+confidence,
association+solve.  Uses the same chained-iteration methodology as
scripts/bench_kernels.py (this backend's dispatch/readiness semantics make
naive timing lie; see that file).
"""

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


def timeit(fn, x0, iters=64):
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


def main():
    from radar_slam_tpu.aoa import confidence as conf_mod
    from radar_slam_tpu.aoa import estimators
    from radar_slam_tpu.core.config import complete_analysis_config
    from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
    from radar_slam_tpu.signal.detect import (detect_peaks,
                                              extract_spatial_signatures)
    from radar_slam_tpu.signal.rds import range_doppler_spectrum
    from radar_slam_tpu.signal.synth import synthesize_frames_batch

    import dataclasses
    # Match bench.py's right-sized scatterer capacity.
    cfg = dataclasses.replace(complete_analysis_config(), max_scatterers=128)
    F = 64
    batches, _ = constant_motion_scene(
        7, num_frames=F, dt=cfg.frame_dt, v_body=(8.0, 0.5), yaw_rate=0.05,
        scene=SceneConfig(num_points=96, max_scatterers=cfg.max_scatterers))

    key = jax.random.key(0)
    signals = synthesize_frames_batch(batches, cfg.radar, key)
    rds = jax.jit(jax.vmap(lambda s: range_doppler_spectrum(
        s, cfg.radar, doppler_window=cfg.doppler_window)))(signals)
    det = jax.jit(jax.vmap(
        lambda r: detect_peaks(r, cfg.radar, cfg.detection)))(rds)
    sigs = jax.jit(jax.vmap(extract_spatial_signatures))(rds, det)

    stages = []

    stages.append(("synthesis", timeit(
        lambda b: synthesize_frames_batch(b, cfg.radar, key), batches)))
    stages.append(("rds_fft", timeit(
        lambda s: jax.vmap(lambda x: range_doppler_spectrum(
            x, cfg.radar, doppler_window=cfg.doppler_window))(s), signals)))
    stages.append(("detection_cfar_topk", timeit(
        lambda r: jax.vmap(lambda x: detect_peaks(
            x, cfg.radar, cfg.detection))(r), rds)))

    def aoa_stage(s):
        R = estimators.signature_covariances(s.reshape(-1, s.shape[-1]))
        ev, _ = estimators.eigendecompose(R)
        ns, multi, _ = conf_mod.mdl_model_order(ev)
        ang, _ = estimators.estimate_beamforming(
            s.reshape(-1, s.shape[-1]), cfg.radar, cfg.aoa)
        conf = conf_mod.angle_confidence(
            s.reshape(-1, s.shape[-1]), ang, cfg.radar)
        return ang, conf, ns

    stages.append(("aoa_eigh_mdl_beamform_conf", timeit(aoa_stage, sigs)))

    # ---- phase B (the batched drivers' windowed smoothing + shift
    # association + batched solves + prefix-sum pose) ----------------------
    from radar_slam_tpu.pipeline import frame as frame_mod

    feats = jax.jit(jax.vmap(
        lambda s: frame_mod.frame_features(s, cfg)))(signals)
    stages.append(("phase_b_smooth_assoc_solve_pose", timeit(
        lambda f: frame_mod._sequence_from_features(f, cfg, True), feats)))

    total_us = sum(t for _, t in stages) * 1e6
    out = {
        "device": str(jax.devices()[0]),
        "frames": F,
        "stages_us_per_64frames": {k: round(t * 1e6, 1) for k, t in stages},
        "measured_total_us": round(total_us, 1),
        "implied_fps_from_stages": round(F / (total_us / 1e6), 1),
    }

    # ---- production (cube-free) path: the config the bench actually runs
    # (synth_in_kernel on TPU backends; neither the ADC cube nor the RDS
    # cube exists in HBM).  Factors are recomputed inside each timed fn --
    # closing over device arrays embeds constants whose np materialization
    # the axon backend rejects.
    if cfg.synth_in_kernel and jax.devices()[0].platform in ("tpu", "axon"):
        from radar_slam_tpu.ops import synthpower_pallas as sp
        from radar_slam_tpu.signal.rds import _mix_vector
        from radar_slam_tpu.signal.synth import synthesis_factors

        C = cfg.radar.num_chirps
        S = cfg.radar.samples_per_chirp
        sigma = float(cfg.radar.noise_power) ** 0.5

        def factors(b):
            return jax.vmap(lambda sc: synthesis_factors(
                sc, cfg.radar, cfg.synth_fidelity))(b)

        def power_from_scatterers(b):
            # mix computed in-trace: a closed-over device array becomes an
            # ir_constant whose np materialization axon rejects.
            mix = _mix_vector(cfg.radar, cfg.window, "baseband", S)
            e_ac, e_fast = factors(b)
            seeds = jnp.arange(e_ac.shape[0], dtype=jnp.int32)
            return sp.scatterer_power(
                e_ac, e_fast, seeds, mix, C, sigma,
                doppler_window=cfg.doppler_window,
                precision_name=cfg.power_precision,
                doppler_precision=cfg.synth_doppler_precision,
                doppler_layout=cfg.synth_doppler_layout)

        from radar_slam_tpu.signal.detect import detect_peaks_from_power
        p_lin = jax.jit(power_from_scatterers)(batches)
        det_p = jax.jit(jax.vmap(lambda x: detect_peaks_from_power(
            x, cfg.radar, cfg.detection)))(p_lin)

        def sigs_from_scatterers(args):
            b, rb, db = args
            mix = _mix_vector(cfg.radar, cfg.window, "baseband", S)
            e_ac, e_fast = factors(b)
            seeds = jnp.arange(e_ac.shape[0], dtype=jnp.int32)
            return sp.scatterer_signatures(
                e_ac, e_fast, seeds, rb, db, mix, C, sigma,
                doppler_window=cfg.doppler_window)

        prod = []
        prod.append(("factors_only", timeit(factors, batches)))
        prod.append(("synth+power_kernel", timeit(
            power_from_scatterers, batches)))
        prod.append(("detect_from_power", timeit(
            lambda pl: jax.vmap(lambda x: detect_peaks_from_power(
                x, cfg.radar, cfg.detection))(pl), p_lin)))
        prod.append(("synth+signatures_kernel", timeit(
            sigs_from_scatterers,
            (batches, det_p.range_bin, det_p.doppler_bin))))

        def phase_a_full(args):
            b, k = args
            return frame_mod.sequence_features_scatterers_fused(b, k, cfg)

        prod.append(("phase_a_complete", timeit(
            phase_a_full, (batches, jax.random.key(0, impl="rbg")))))

        feats_p = jax.jit(lambda b, k:
                          frame_mod.sequence_features_scatterers_fused(
                              b, k, cfg))(batches,
                                          jax.random.key(0, impl="rbg"))
        prod.append(("phase_b", timeit(
            lambda f: frame_mod._sequence_from_features(f, cfg, True),
            feats_p)))

        a_plus_b = ([t for k, t in prod if k == "phase_a_complete"][0]
                    + [t for k, t in prod if k == "phase_b"][0])
        out["production_cube_free_us_per_64frames"] = {
            k: round(t * 1e6, 1) for k, t in prod}
        out["production_implied_fps"] = round(F / a_plus_b, 1)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
