#!/usr/bin/env python3
"""End-to-end benchmark: full radar ego-motion pipeline frames/s on one chip.

Workload = BASELINE.json config 2 (synthetic raw FMCW): point-cloud
scatterers -> cube-free synthesis+power kernel (the ADC cube and the RDS
cube are both synthesized/consumed inside Pallas kernels and never touch
HBM) -> CFAR detection -> exact-noise signature kernel -> robust AoA
(beamforming + confidence + MDL + smoothing) -> association -> two-step
6-DoF velocity solve -> pose integration, at the reference's
complete-analysis operating point (32 chirps, 8 antennas, 400 samples,
2 deg grid, top-50 targets; radarscenes_complete_analysis.py:47-87).

Timing methodology (this container's TPU tunnel makes naive timing lie in
BOTH directions: ``block_until_ready`` resolves before device completion,
and each dispatch pays a ~1-2 ms synchronous round trip):
- completion is forced by fetching real output data, the only trustworthy
  barrier;
- per-frame device time is obtained by DIFFERENCING two sequence lengths
  (one dispatch each), cancelling the constant dispatch/fetch overhead;
- the reported frames/s is (frames_delta) / (T_long - T_short), best of
  several INTERLEAVED trials, with BOTH sizes long enough that the
  differenced window dwarfs the +-2-4 ms dispatch-floor drift: 512 vs
  2048 frames (~45 ms window) for the batched-family drivers (the r05d
  448-frame window was ~10 ms and read 35-81k fps run-to-run at fixed
  code; two independent wide windows agree at 33.3k), 64 vs 512 frames
  (~100 ms at scan speed) for the sequential scan driver;
- per-stage times chain iterations inside one program (fori_loop) and
  difference two iteration counts.

Regression gates, ratcheted to the measured state +- ~10-20% rather than
round numbers (VERDICT r03 item 7; the round-2 lesson was a 0.395 -> 0.538
drift passing unremarked):
- ``pos_err_bound_ok``: final open-loop pose error <= 0.35 m over the 51 m /
  64-frame path (recorded: r02 0.538, r03 0.465, r04 0.409, r05 0.256);
- ``pos_rmse_ok``: trajectory position RMSE <= 0.16 m (r04 0.182,
  r05 0.120 on the spectral-noise realization);
- ``adversarial_ok``: a movers+clutter mismatch scene must stay inside the
  reference parity bound (position RMSE <= 0.777 m);
- ``music_ok``: the same scene with the REFERENCE'S step-3 default
  estimator (MUSIC) must hold <= 0.15 m position RMSE (r03 0.386 before
  the null-function refinement fix, r04 0.169, r05 0.108 with the
  closed-form subspace + spectral noise);
- ``scan_ok``: sequential scan-driver floor 3,800 frames/s (r04: 4,155);
- ``chunked_ok``: the chunked sequential-semantics driver (batched phase A
  per window + Jacobi prior; the throughput path for scan-semantics
  workloads) floor 24,000 frames/s (r05: 26,634-33,463 @ window=16);
- ``rig_ok``: the batched 4-sensor mounted-rig driver (the path real
  RadarScenes data auto-routes to) must hold >= 7,000 rig-frames/s and
  <= 0.10 m position RMSE on its bench scene (r05 measured: 10,109 fps
  standalone, ~8,000 inside the full bench run; scripts/bench_rig.py);
- ``sane`` requires all of the above plus >90 % solve success.

Baseline: the reference's real pipeline runs 3.28-4.14 s/frame on CPU
(results/analysis/output_radarscenes/sequence_9_results.json; BASELINE.md)
-> 0.27 frames/s.  vs_baseline = our frames/s / 0.27.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, ...}
"""

import json
import time

import jax
import jax.numpy as jnp
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


def time_pair(run1, run2, trials=6):
    """Best wall times of two runs with INTERLEAVED trials.

    The differencing estimate (t2 - t1) is only valid when both
    measurements see the same dispatch/tunnel conditions; measuring all
    t1 trials then all t2 trials let a congested window inflate one side
    only (observed: a t1-side slowdown doubled the reported frames/s).
    Alternating trials makes any congestion window hit both."""
    out1 = run1()
    force(out1)                           # compile + warm both programs
    out2 = run2()
    force(out2)
    b1 = b2 = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out1 = run1()
        force(out1)
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        out2 = run2()
        force(out2)
        b2 = min(b2, time.perf_counter() - t0)
    return out1, b1, out2, b2


def chained_time(fn, x0, iters=24):
    """Per-call device time: iterate inside one program, difference two
    iteration counts (scripts/bench_kernels.py methodology)."""
    @jax.jit
    def chained(x, n):
        def body(i, acc):
            xi = jax.tree.map(
                lambda a: a * (1 + 1e-7 * i)
                if jnp.issubdtype(a.dtype, jnp.inexact) else a, x)
            leaf = jax.tree.leaves(fn(xi))[0]
            return acc + jnp.sum(jnp.real(leaf).reshape(-1)[:4]
                                 ).astype(jnp.float32)
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


def stage_breakdown(cfg, batches, key):
    """Device time of the heavy per-frame stages over the 64-frame batch,
    for the path the headline number actually runs (cube-free kernels when
    synth_in_kernel is active on a TPU backend, else the materialized
    stages)."""
    from radar_slam_tpu.signal.detect import detect_peaks_from_power
    from radar_slam_tpu.signal.rds import detection_signatures, rds_power
    from radar_slam_tpu.signal.synth import synthesize_frames_batch

    from radar_slam_tpu.pipeline import frame as pipe

    if (cfg.synth_in_kernel and cfg.fft_mode == "fused"
            and pipe._one_pass_active(cfg)):
        # One-pass front end (r04): synthesis + noise (once) + power +
        # CFAR + top-K + signatures in a single kernel; the [K]-shaped
        # finalize tail is separately timed for completeness.
        seeds = jnp.arange(batches.range_m.shape[0], dtype=jnp.int32)

        def onepass(b):
            return pipe._onepass_frontend(b, seeds, cfg)[0]

        def full_det(b):
            _, det, _ = pipe._onepass_frontend(b, seeds, cfg)
            return det.range_m

        stages = {
            "frontend_onepass_kernel": chained_time(onepass, batches),
            "frontend_plus_finalize": chained_time(full_det, batches),
        }
        return {k: round(v * 1e6, 1) for k, v in stages.items()}

    if (cfg.synth_in_kernel and cfg.fft_mode == "fused"
            and jax.default_backend() in ("tpu", "axon")):
        from radar_slam_tpu.ops import synthpower_pallas as sp
        from radar_slam_tpu.signal.rds import _mix_vector
        from radar_slam_tpu.signal.synth import synthesis_factors

        C = cfg.radar.num_chirps
        S = cfg.radar.samples_per_chirp
        sigma = float(cfg.radar.noise_power) ** 0.5

        def power_cf(b):
            # mix/factors built in-trace (closed-over device arrays become
            # constants whose np materialization the backend rejects).
            mix = _mix_vector(cfg.radar, cfg.window, "baseband", S)
            e_ac, e_fast = jax.vmap(lambda sc: synthesis_factors(
                sc, cfg.radar, cfg.synth_fidelity))(b)
            seeds = jnp.arange(e_ac.shape[0], dtype=jnp.int32)
            return sp.scatterer_power(
                e_ac, e_fast, seeds, mix, C, sigma,
                doppler_window=cfg.doppler_window,
                precision_name=cfg.power_precision,
                doppler_precision=cfg.synth_doppler_precision,
                doppler_layout=cfg.synth_doppler_layout,
                noise_impl=cfg.noise_impl)

        p_lin = jax.jit(power_cf)(batches)
        det = jax.jit(jax.vmap(lambda p: detect_peaks_from_power(
            p, cfg.radar, cfg.detection)))(p_lin)

        def sigs_cf(args):
            b, rb, db = args
            mix = _mix_vector(cfg.radar, cfg.window, "baseband", S)
            e_ac, e_fast = jax.vmap(lambda sc: synthesis_factors(
                sc, cfg.radar, cfg.synth_fidelity))(b)
            seeds = jnp.arange(e_ac.shape[0], dtype=jnp.int32)
            return sp.scatterer_signatures(
                e_ac, e_fast, seeds, rb, db, mix, C, sigma,
                doppler_window=cfg.doppler_window,
                noise_impl=cfg.noise_impl)

        stages = {
            "synth_power_kernel": chained_time(power_cf, batches),
            "detect": chained_time(
                lambda p: jax.vmap(lambda x: detect_peaks_from_power(
                    x, cfg.radar, cfg.detection))(p), p_lin),
            "synth_signatures_kernel": chained_time(
                sigs_cf, (batches, det.range_bin, det.doppler_bin)),
        }
        return {k: round(v * 1e6, 1) for k, v in stages.items()}

    signals = synthesize_frames_batch(batches, cfg.radar, key)
    p_lin = rds_power(signals, cfg.radar, window=cfg.window,
                      doppler_window=cfg.doppler_window,
                      dft_precision=cfg.power_precision,
                      doppler_precision=cfg.doppler_precision,
                      doppler_layout=cfg.doppler_layout)
    det = jax.jit(jax.vmap(lambda p: detect_peaks_from_power(
        p, cfg.radar, cfg.detection)))(p_lin)

    stages = {
        "synth": chained_time(
            lambda b: synthesize_frames_batch(b, cfg.radar, key), batches),
        "power_fused": chained_time(
            lambda s: rds_power(s, cfg.radar, window=cfg.window,
                                doppler_window=cfg.doppler_window,
                                dft_precision=cfg.power_precision,
                                doppler_precision=cfg.doppler_precision,
                                doppler_layout=cfg.doppler_layout), signals),
        "detect": chained_time(
            lambda p: jax.vmap(lambda x: detect_peaks_from_power(
                x, cfg.radar, cfg.detection))(p), p_lin),
        "signatures": chained_time(
            lambda s: jax.vmap(lambda x, r, d: detection_signatures(
                x, r, d, cfg.radar, window=cfg.window,
                doppler_window=cfg.doppler_window))(
                    s, det.range_bin, det.doppler_bin), signals),
    }
    return {k: round(v * 1e6, 1) for k, v in stages.items()}


def rig_check(cfg):
    """Batched 4-sensor mounted-rig driver: frames/s (differenced) and
    position RMSE on a RadarScenes-like mounting geometry.  The CLI
    auto-routes real datasets with sensors.json to this path, so its
    throughput is first-class (VERDICT r04 item 1)."""
    from radar_slam_tpu.evaluate.pose_metrics import planar_pose_errors
    from radar_slam_tpu.io.synthetic import (SceneConfig,
                                             constant_motion_scene_rig)
    from radar_slam_tpu.pipeline import rig as rigmod

    rig4 = ((3.6, 0.8, 0.55), (3.6, -0.8, -0.55),
            (2.4, 0.9, 1.48), (2.4, -0.9, -1.48))

    def rig_scene(n):
        return constant_motion_scene_rig(
            7, num_frames=n, dt=cfg.frame_dt, v_body=(8.0, 0.5),
            yaw_rate=0.05,
            scene=SceneConfig(num_points=96,
                              max_scatterers=cfg.max_scatterers), rig=rig4)

    # Wide differenced window, same rationale as the headline (r05f): the
    # old 128-frame window was ~13 ms at these speeds and read 10.4-15.8k
    # at fixed code under the +-2-4 ms dispatch-floor drift; 448 frames
    # is ~45 ms (wide-window read: 9.4k).  The accuracy gate stays on the
    # 32-frame scene it was calibrated on (r05: 0.038 m; open-loop drift
    # grows with path length, 0.174 m by frame 64).
    f0, f1, f2 = 32, 64, 512
    b0, gt0 = rig_scene(f0)
    b1, _ = rig_scene(f1)
    b2, _ = rig_scene(f2)
    key = jax.random.key(0, impl="rbg")
    out0 = rigmod.process_sequence_rig_batched(b0, key, cfg, rig4)
    force(out0)
    _, t1, _, t2 = time_pair(
        lambda: rigmod.process_sequence_rig_batched(b1, key, cfg, rig4),
        lambda: rigmod.process_sequence_rig_batched(b2, key, cfg, rig4))
    fps = (f2 - f1) / max(t2 - t1, 1e-9)
    m = planar_pose_errors(np.asarray(out0.pose), np.asarray(gt0["poses"]))
    rmse = round(float(m["position_rmse"]), 3)
    return round(fps, 1), rmse, bool(fps >= 7000.0 and rmse <= 0.10)


def adversarial_check(cfg):
    """Movers + clutter mismatch scene through the batched driver; the
    parity bound (0.777 m position RMSE) is the pass line."""
    from radar_slam_tpu.evaluate.pose_metrics import planar_pose_errors
    from radar_slam_tpu.io.synthetic import (MismatchConfig, SceneConfig,
                                             mismatch_scene)
    from radar_slam_tpu.pipeline import frame as pipe

    mm = MismatchConfig(num_movers=4, mover_points=3, mover_oncoming=True,
                        clutter_per_frame=10)
    batches, gt = mismatch_scene(
        3, 12, cfg.frame_dt, (8.0, 0.5), 0.1,
        SceneConfig(num_points=48, max_scatterers=cfg.max_scatterers), mm)
    out = pipe.process_sequence_batched(batches, jax.random.key(0), cfg)
    m = planar_pose_errors(np.asarray(out.pose), np.asarray(gt["poses"]))
    return round(float(m["position_rmse"]), 3), bool(
        m["position_rmse"] <= 0.777)


def chip_smoke():
    """Run the chip-only numerics tier in a subprocess and return
    (ok, n_passed) -- proof in every BENCH file that the compiled-Mosaic
    tests ran on the real chip (VERDICT r04 item 9: through r04 they only
    ran when someone remembered RADAR_SLAM_TEST_TPU=1).

    MUST run before this process touches the backend: the tunnel serves
    one client at a time, and a subprocess alongside an active parent
    client can wedge it (docs/BENCHMARKS.md "tunnel hazards").  Selection
    = the one-pass-kernel equivalence tier + the PRNG statistics tests --
    the numerics only a real chip can validate (interpret-mode Mosaic
    diverges; it once hid a NaN bug)."""
    import os
    import re
    import subprocess
    import sys
    env = dict(os.environ, RADAR_SLAM_TEST_TPU="1")
    try:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x",
             "tests/test_frontend.py", "tests/test_synthpower.py",
             "-k", "chip or tpu or noise"],
            env=env, capture_output=True, text=True, timeout=1500)
        m = re.search(r"(\d+) passed", r.stdout)
        n = int(m.group(1)) if m else 0
        return bool(r.returncode == 0 and n > 0), n
    except subprocess.TimeoutExpired:
        return False, 0


def main():
    import dataclasses
    import sys

    chip_tests_ok, chip_tests_passed = (
        (None, 0) if "--skip-chip-tests" in sys.argv else chip_smoke())

    from radar_slam_tpu.core.config import complete_analysis_config
    from radar_slam_tpu.evaluate.pose_metrics import planar_pose_errors
    from radar_slam_tpu.pipeline import frame as pipe

    # Right-size the static scatterer capacity to the workload (96 points);
    # the library default of 512 exists for dense RadarScenes frames and
    # spends ~80% of the synthesis matmul multiplying padding at this
    # operating point.  Capacity is a static-shape knob, not physics: the
    # 96 observed scatterers are identical either way.
    cfg = dataclasses.replace(complete_analysis_config(), max_scatterers=128)
    # The differenced window must dwarf the tunnel dispatch wobble or the
    # quotient is noise: the dispatch floor itself drifts +-2-4 ms across
    # trial loops, so the r05d 448-frame window (~10 ms at these speeds)
    # read 35-81k fps at FIXED code.  The batched-family drivers
    # (headline, MUSIC, chunked) therefore difference f2=512 vs f3=2048
    # (1,536 frames, ~45 ms): two independent wide windows (1024->2048
    # and 512->2048) agree at 33.3k fps, confirming per-frame cost is
    # flat in F (no superlinear stage) and the estimator has converged.
    # The scan driver keeps (f1, f2): 448 frames is already ~100 ms at
    # its ~4.5k fps.  The 64-frame batch feeds the accuracy gates and
    # the per-64f dispatch figure.
    f1, f2, f3 = 64, 512, 2048
    batches1, gt1 = scene(cfg, f1)
    batches2, _ = scene(cfg, f2)
    batches3, _ = scene(cfg, f3)

    # RBG PRNG for the synthesis AWGN: the default threefry spends more
    # device time generating 13M Gaussians per 64-frame batch than the
    # synthesis matmul itself; the counter-based RBG is the TPU-native
    # generator (the key's impl propagates through every split).
    key = jax.random.key(0, impl="rbg")
    out1, t1 = time_one(
        lambda: pipe.process_sequence_batched(batches1, key, cfg))
    _, t2b, _, t3b = time_pair(
        lambda: pipe.process_sequence_batched(batches2, key, cfg),
        lambda: pipe.process_sequence_batched(batches3, key, cfg))
    fps = (f3 - f2) / max(t3b - t2b, 1e-9)

    _, t1s, _, t2s = time_pair(
        lambda: pipe.process_sequence(batches1, key, cfg),
        lambda: pipe.process_sequence(batches2, key, cfg))
    fps_scan = (f2 - f1) / max(t2s - t1s, 1e-9)

    # Chunked (sequential-semantics) driver: batched phase A per 16-frame
    # window + Jacobi-relaxed prior chain (pipeline/frame.py:
    # process_sequence_chunked; r05 measured 26.6k @ w=16, 34.4k @ w=64).
    _, t2c, _, t3c = time_pair(
        lambda: pipe.process_sequence_chunked(batches2, key, cfg),
        lambda: pipe.process_sequence_chunked(batches3, key, cfg))
    fps_chunked = (f3 - f2) / max(t3c - t2c, 1e-9)

    # Accuracy gates: the benchmark only counts if the pipeline works.
    ok = np.asarray(out1.motion.success)
    pose_np = np.asarray(out1.pose)
    gt_np = np.asarray(gt1["poses"])
    pose_err = float(np.linalg.norm(pose_np[-1][:2] - gt_np[-1][:2]))
    pos_rmse = round(float(
        planar_pose_errors(pose_np, gt_np)["position_rmse"]), 3)
    pos_err_bound_ok = pose_err <= 0.35         # r04 0.409, r05 0.256
    pos_rmse_ok = pos_rmse <= 0.16              # r04 0.182, r05 0.120
    adv_rmse, adversarial_ok = adversarial_check(cfg)

    # Reference's step-3 default estimator (MUSIC) regression guard, with
    # its throughput captured per round (VERDICT r04 item 6).
    cfg_music = dataclasses.replace(
        cfg, aoa=dataclasses.replace(cfg.aoa, method="music"))
    out_music = pipe.process_sequence_batched(batches1, key, cfg_music)
    force(out_music)
    _, t2m, _, t3m = time_pair(
        lambda: pipe.process_sequence_batched(batches2, key, cfg_music),
        lambda: pipe.process_sequence_batched(batches3, key, cfg_music))
    fps_music = (f3 - f2) / max(t3m - t2m, 1e-9)
    music_rmse = round(float(planar_pose_errors(
        np.asarray(out_music.pose), gt_np)["position_rmse"]), 3)
    music_ok = music_rmse <= 0.15               # r05 0.108

    scan_ok = fps_scan >= 3800.0                # r04 4,155
    chunked_ok = fps_chunked >= 24000.0         # r05 26.6-33.5k @ w=16
    rig_fps, rig_rmse, rig_ok = rig_check(cfg)  # r05 10,109 fps / 0.039 m
    sane = (bool(ok[1:].mean() > 0.9) and pos_err_bound_ok and pos_rmse_ok
            and adversarial_ok and music_ok and scan_ok and chunked_ok
            and rig_ok)

    stage_us = stage_breakdown(cfg, batches1, key)

    baseline_fps = 1.0 / 3.7   # reference complete-analysis s/frame midpoint
    result = {
        "metric": "e2e_pipeline_frames_per_sec_1chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 1),
        "frames_delta": f3 - f2,
        "scan_driver_fps": round(fps_scan, 1),
        "dispatch_s_64f": round(t1, 4),
        "sane": sane,
        "final_pose_err_m": round(pose_err, 3),
        "pos_rmse_m": pos_rmse,
        "pos_err_bound_ok": pos_err_bound_ok,
        "pos_rmse_ok": pos_rmse_ok,
        "adversarial_rmse_m": adv_rmse,
        "adversarial_ok": adversarial_ok,
        "music_pos_rmse_m": music_rmse,
        "music_fps": round(fps_music, 1),
        "music_ok": music_ok,
        "scan_ok": scan_ok,
        "chunked_driver_fps": round(fps_chunked, 1),
        "chunked_ok": chunked_ok,
        "rig_fps_4sensor": rig_fps,
        "rig_pos_rmse_m": rig_rmse,
        "rig_ok": rig_ok,
        "stage_us_per_64f": stage_us,
        "chip_tests_ok": chip_tests_ok,
        "chip_tests_passed": chip_tests_passed,
        # Operating-point provenance: the front-end knobs this measurement
        # ran with (so each round's BENCH file records WHAT was measured).
        "frontend_knobs": {
            "noise_domain": cfg.noise_domain,
            "noise_impl": cfg.noise_impl,
            "frontend_topk": cfg.frontend_topk,
            "frontend_factors": cfg.frontend_factors,
            "synth_fidelity": cfg.synth_fidelity,
        },
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
