"""Fused detection path (signal/rds.py:rds_power + detection_signatures +
ops/power_pallas.py): the complex RDS cube is never materialized.

Equivalence targets: the default fft pipeline (power maps identical through
the xla mode; signatures f32-recomputed; end-to-end pose within float
reassociation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from radar_slam_tpu.core.config import complete_analysis_config
from radar_slam_tpu.ops import power_pallas
from radar_slam_tpu.signal.detect import (detect_peaks,
                                          detect_peaks_from_power,
                                          extract_spatial_signatures)
from radar_slam_tpu.signal.rds import (detection_signatures,
                                       range_doppler_spectrum, rds_power)



# Interpret-mode Pallas hangs on the axon/TPU backend (ADVICE r03 applied
# repo-wide in r04): skip these under RADAR_SLAM_TEST_TPU=1.
interpret_only = pytest.mark.skipif(
    jax.devices()[0].platform in ("tpu", "axon"),
    reason="interpret-mode Pallas hangs on the axon/TPU backend")

def _cfg():
    return complete_analysis_config()


def _signals(cfg, frames=2, seed=0):
    from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
    from radar_slam_tpu.signal.synth import synthesize_frames_batch
    batches, _ = constant_motion_scene(
        seed, num_frames=frames, dt=cfg.frame_dt, v_body=(8.0, 0.5),
        yaw_rate=0.05,
        scene=SceneConfig(num_points=64, max_scatterers=cfg.max_scatterers))
    return synthesize_frames_batch(batches, cfg.radar, jax.random.key(1))


def test_rds_power_xla_matches_fft_power():
    cfg = _cfg()
    sig = _signals(cfg)
    rds = range_doppler_spectrum(sig, cfg.radar, window=cfg.window,
                                 doppler_window=cfg.doppler_window)
    want = jnp.mean(jnp.abs(rds) ** 2, axis=-3)
    got = rds_power(sig, cfg.radar, window=cfg.window,
                    doppler_window=cfg.doppler_window, mode="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-8)


@pytest.mark.slow
@interpret_only
def test_power_kernel_matches_reference_interpret():
    """Pallas kernel (interpret mode) vs the f32 XLA oracle; bf16 default
    precision must stay inside the CFAR-safe tolerance, 'high' must be
    f32-accurate."""
    cfg = _cfg()
    sig = np.asarray(_signals(cfg, frames=1))[0]          # [A, C, S]
    from radar_slam_tpu.signal.rds import _mix_vector
    mix = _mix_vector(cfg.radar, cfg.window, "baseband", sig.shape[-1])
    want = np.asarray(power_pallas.rds_power_reference(
        jnp.asarray(sig), mix, True, cfg.doppler_window))
    with pltpu.force_tpu_interpret_mode():
        got_bf16 = np.asarray(power_pallas.rds_power_fused(
            jnp.asarray(sig), mix, True, cfg.doppler_window,
            precision_name="default"))
        got_high = np.asarray(power_pallas.rds_power_fused(
            jnp.asarray(sig), mix, True, cfg.doppler_window,
            precision_name="high"))
    scale = want.max()
    assert np.abs(got_high - want).max() / scale < 1e-4
    # bf16 range DFT: the error is absolute-relative-to-peak (leakage from
    # strong rows), so weak cells see larger dB error.  What detection
    # needs: candidate peaks (within ~30 dB of the frame peak) accurate to
    # a fraction of a dB, and everything the CFAR trains on (within 60 dB)
    # well inside the 12 dB offset margin.
    db_err = np.abs(10 * np.log10(got_bf16 + 1e-12)
                    - 10 * np.log10(want + 1e-12))
    strong = want > 1e-3 * scale
    assert db_err[strong].max() < 0.1, db_err[strong].max()
    detectable = want > 1e-6 * scale
    assert db_err[detectable].max() < 1.0, db_err[detectable].max()


def test_detection_signatures_match_cube_gather():
    cfg = _cfg()
    sig = _signals(cfg, frames=1)[0]
    rds = range_doppler_spectrum(sig, cfg.radar, window=cfg.window,
                                 doppler_window=cfg.doppler_window)
    det = detect_peaks(rds, cfg.radar, cfg.detection)
    want = np.asarray(extract_spatial_signatures(rds, det))
    got = np.asarray(detection_signatures(
        sig, det.range_bin, det.doppler_bin, cfg.radar, window=cfg.window,
        doppler_window=cfg.doppler_window))
    valid = np.asarray(det.valid)
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-4)


def test_fused_detections_match_fft_path():
    cfg = _cfg()
    sig = _signals(cfg, frames=1)[0]
    rds = range_doppler_spectrum(sig, cfg.radar, window=cfg.window,
                                 doppler_window=cfg.doppler_window)
    want = detect_peaks(rds, cfg.radar, cfg.detection)
    p_lin = rds_power(sig, cfg.radar, window=cfg.window,
                      doppler_window=cfg.doppler_window, mode="xla")
    got = detect_peaks_from_power(p_lin, cfg.radar, cfg.detection)
    assert np.array_equal(np.asarray(got.valid), np.asarray(want.valid))
    v = np.asarray(want.valid)
    assert np.array_equal(np.asarray(got.range_bin)[v],
                          np.asarray(want.range_bin)[v])
    assert np.array_equal(np.asarray(got.doppler_bin)[v],
                          np.asarray(want.doppler_bin)[v])
    np.testing.assert_allclose(np.asarray(got.range_m)[v],
                               np.asarray(want.range_m)[v], rtol=1e-5)


@pytest.mark.parametrize("driver", ["scan", "batched"])
@pytest.mark.slow
def test_fused_pipeline_end_to_end_matches_fft(driver):
    """Both sequence drivers, fused mode vs default: same trajectory."""
    import dataclasses

    from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
    from radar_slam_tpu.pipeline import frame as pipe

    cfg = _cfg()
    batches, gt = constant_motion_scene(
        3, num_frames=10, dt=cfg.frame_dt, v_body=(8.0, 0.5), yaw_rate=0.05,
        scene=SceneConfig(num_points=64, max_scatterers=cfg.max_scatterers))
    cfg_fused = dataclasses.replace(cfg, fft_mode="fused")
    key = jax.random.key(0)
    run = (pipe.process_sequence if driver == "scan"
           else pipe.process_sequence_batched)
    out_fft = run(batches, key, cfg)
    out_fus = run(batches, key, cfg_fused)
    np.testing.assert_allclose(np.asarray(out_fus.pose),
                               np.asarray(out_fft.pose),
                               rtol=1e-3, atol=5e-3)
    # And the fused trajectory itself tracks ground truth.
    err = np.linalg.norm(np.asarray(out_fus.pose)[-1, :2]
                         - np.asarray(gt["poses"])[-1, :2])
    assert err < 0.5, err


@pytest.mark.slow
@interpret_only
def test_wide_doppler_layout_matches_loop_interpret():
    """The 'wide' single-matmul Doppler layout is a pure re-association of
    the per-antenna loop: power maps must agree to float tolerance at
    every precision tier."""
    cfg = _cfg()
    sig = np.asarray(_signals(cfg, frames=1))[0]
    from radar_slam_tpu.signal.rds import _mix_vector
    mix = _mix_vector(cfg.radar, cfg.window, "baseband", sig.shape[-1])
    for prec in ["highest", "high", "default"]:
        with pltpu.force_tpu_interpret_mode():
            loop = np.asarray(power_pallas.rds_power_fused(
                jnp.asarray(sig), mix, True, cfg.doppler_window,
                doppler_precision=prec, doppler_layout="loop"))
            wide = np.asarray(power_pallas.rds_power_fused(
                jnp.asarray(sig), mix, True, cfg.doppler_window,
                doppler_precision=prec, doppler_layout="wide"))
        scale = loop.max()
        assert np.abs(wide - loop).max() / scale < 2e-6, prec
