"""MUSIC and ESPRIT as demonstrated end-to-end production paths (VERDICT
round-2 item 3).

The reference's batch pipeline runs MUSIC as its step-3 estimator
(``scripts/run_ego_motion_pipeline.py:183`` ->
``src/angle_estimation/angle_estimation.py:253``); round 2 unit-tested the
subspace estimators but only ever ran beamforming end to end.  Here every
scenario of the adversarial tier's core (clean control, reference-fidelity
anti-inverse-crime, oncoming movers) is hard-asserted for all three
methods, plus the six-step orchestrator's MUSIC-parity default.
"""

import dataclasses

import jax
import numpy as np
import pytest

from radar_slam_tpu.core.config import (complete_analysis_config,
                                        reference_fidelity_config)
from radar_slam_tpu.evaluate.pose_metrics import planar_pose_errors
from radar_slam_tpu.io.synthetic import (MismatchConfig, SceneConfig,
                                         mismatch_scene)
from radar_slam_tpu.pipeline import frame as pipe

V_TRUE = (8.0, 0.5)
W_TRUE = 0.1
PARITY_POS_M = 0.777
PARITY_YAW_RAD = 0.466


def with_method(cfg, method):
    return dataclasses.replace(
        cfg, aoa=dataclasses.replace(cfg.aoa, method=method))


def run_scene(cfg, mm, frames=10, seed=3):
    scene = SceneConfig(num_points=48, max_scatterers=cfg.max_scatterers)
    batches, gt = mismatch_scene(seed, frames, cfg.frame_dt, V_TRUE, W_TRUE,
                                 scene, mm)
    out = pipe.process_sequence(batches, jax.random.key(0), cfg)
    metrics = planar_pose_errors(np.asarray(out.pose),
                                 np.asarray(gt["poses"]))
    ok = np.asarray(out.motion.success)
    sel = ok.copy()
    sel[0] = False
    v_err = (np.abs(np.asarray(out.motion.velocity)[sel, :2]
                    - np.array(V_TRUE)).mean(axis=0)
             if sel.any() else np.array([np.inf, np.inf]))
    return out, gt, metrics, v_err


@pytest.mark.parametrize("method", ["music", "esprit"])
def test_clean_scene(method):
    """Unperturbed scene, subspace estimators: same bound the beamforming
    control meets (tests/test_adversarial.py:test_clean_control)."""
    cfg = with_method(complete_analysis_config(), method)
    _, _, m, v_err = run_scene(cfg, MismatchConfig())
    assert m["position_rmse"] < 0.10, (method, m)
    assert v_err.max() < 0.10, (method, v_err)


@pytest.mark.parametrize("method", ["music", "esprit"])
def test_reference_fidelity_parity(method):
    """Anti-inverse-crime gate with subspace AoA: data from the reference's
    signal model, parity bound hard-asserted."""
    cfg = with_method(reference_fidelity_config(), method)
    out, _, m, v_err = run_scene(cfg, MismatchConfig())
    assert m["position_rmse"] <= PARITY_POS_M, (method, m)
    assert m["yaw_rmse"] <= PARITY_YAW_RAD, (method, m)
    assert m["position_rmse"] <= 0.30, (method, m)
    assert v_err.max() < 0.5, (method, v_err)
    assert np.asarray(out.motion.success)[1:].all()


@pytest.mark.parametrize("method", ["music", "esprit"])
def test_movers(method):
    """Oncoming traffic: the robustness tier must hold regardless of the
    AoA estimator feeding it."""
    mm = MismatchConfig(num_movers=5, mover_points=3, mover_oncoming=True,
                        mover_speed_min=6.0, mover_speed_max=12.0)
    cfg = with_method(complete_analysis_config(), method)
    _, gt, m, v_err = run_scene(cfg, mm)
    assert 0.20 <= gt["mover_fraction"] <= 0.45, gt["mover_fraction"]
    assert m["position_rmse"] < 0.15, (method, m)
    assert v_err.max() < 0.15, (method, v_err)


@pytest.mark.slow
def test_music_within_1p3x_of_beamforming():
    """MUSIC must land within 1.3x of beamforming's position RMSE on the
    same scene (VERDICT r03 item 3: r03 measured 1.8x, caused by parabolic
    refinement on the near-pole pseudo-spectrum; the null-function
    refinement in aoa/estimators.py:estimate_music closes it)."""
    mm = MismatchConfig(num_movers=3, mover_points=3, mover_oncoming=True,
                        clutter_per_frame=6)
    _, _, m_bf, _ = run_scene(
        with_method(complete_analysis_config(), "beamforming"), mm)
    _, _, m_mu, _ = run_scene(
        with_method(complete_analysis_config(), "music"), mm)
    assert m_mu["position_rmse"] <= max(1.3 * m_bf["position_rmse"], 0.05), (
        m_mu, m_bf)


def test_music_refinement_matches_beamforming_accuracy():
    """Unit-level guard for the same regression: on noisy single-source
    signatures the null-function parabola must match beamforming's
    sub-grid accuracy (for rank-1 the null is an affine transform of the
    beamforming spectrum), where the old pseudo-spectrum parabola was
    ~1.6x worse."""
    from radar_slam_tpu.aoa import estimators as est
    from radar_slam_tpu.core.geometry import steering_matrix
    import jax.numpy as jnp

    cfg = complete_analysis_config()
    rc, aoa = cfg.radar, cfg.aoa
    rng = np.random.default_rng(0)
    K = 1024
    true = rng.uniform(-60, 60, K).astype(np.float32)
    a = np.asarray(steering_matrix(jnp.deg2rad(jnp.asarray(true)),
                                   rc.num_antennas, rc.spacing, rc.lambda_c))
    noise = (rng.standard_normal((K, rc.num_antennas))
             + 1j * rng.standard_normal((K, rc.num_antennas))) / np.sqrt(2)
    sig = a * 10.0 + noise                  # 20 dB element SNR
    sig = jnp.asarray((sig / np.linalg.norm(sig, axis=1, keepdims=True))
                      .astype(np.complex64))

    def rmse(x):
        return float(np.sqrt(np.mean((np.asarray(x) - true) ** 2)))

    bf = rmse(est.estimate_beamforming(sig, rc, aoa)[0])
    mu = rmse(est.estimate_music(sig, rc, aoa, 1,
                                 forward_backward=aoa.music_fb)[0])
    assert mu <= 1.05 * bf + 1e-3, (mu, bf)


@pytest.mark.slow
def test_orchestrator_step3_music_parity(tmp_path):
    """The six-step pipeline's step 3 runs MUSIC by default via the CLI
    (run_ego_motion_pipeline.py:183 parity) and recovers the known motion."""
    from radar_slam_tpu.io.synthetic import constant_motion_scene
    from radar_slam_tpu.pipeline.pipeline import EgoMotionPipeline

    cfg = with_method(complete_analysis_config(), "music")
    batches, gt = constant_motion_scene(
        5, num_frames=8, dt=cfg.frame_dt, v_body=V_TRUE, yaw_rate=W_TRUE,
        scene=SceneConfig(num_points=48, max_scatterers=cfg.max_scatterers))
    p = EgoMotionPipeline(cfg, str(tmp_path), save_artifacts=False)
    p.run_complete_pipeline(batches)
    vel = np.asarray(p._motions.velocity)
    ok = np.asarray(p._motions.success)
    assert ok[1:].mean() > 0.9
    assert np.abs(vel[1:, 0] - V_TRUE[0]).mean() < 0.15


def test_cli_pipeline_defaults_to_music():
    """`radar_slam_tpu pipeline` defaults step 3 to MUSIC unless
    --aoa-method overrides (reference parity)."""
    from radar_slam_tpu.pipeline.cli import build_parser, _cfg_from_args
    import dataclasses as dc

    args = build_parser().parse_args(["pipeline", "--out", "/tmp/x"])
    cfg = _cfg_from_args(args)
    if not args.aoa_method:
        cfg = dc.replace(cfg, aoa=dc.replace(cfg.aoa, method="music"))
    assert cfg.aoa.method == "music"
    args2 = build_parser().parse_args(
        ["pipeline", "--out", "/tmp/x", "--aoa-method", "esprit"])
    assert _cfg_from_args(args2).aoa.method == "esprit"


@pytest.mark.slow
def test_esprit_within_1p5x_of_beamforming():
    """ESPRIT must land within 1.5x of beamforming's position RMSE on the
    same scene (VERDICT r04 item 5: lag-1 ESPRIT measured 1.8x; the
    weighted multi-lag slope closes it to ~1.2x on the bench scene)."""
    mm = MismatchConfig(num_movers=3, mover_points=3, mover_oncoming=True,
                        clutter_per_frame=6)
    _, _, m_bf, _ = run_scene(
        with_method(complete_analysis_config(), "beamforming"), mm)
    _, _, m_es, _ = run_scene(
        with_method(complete_analysis_config(), "esprit"), mm)
    assert m_es["position_rmse"] <= max(1.5 * m_bf["position_rmse"], 0.05), (
        m_es, m_bf)


def test_esprit_multilag_beats_lag1():
    """Unit guard for the weighted multi-lag ESPRIT: on noisy single-source
    signatures the full-lag slope must cut angle RMSE vs the lag-1
    (reference-equivalent) estimate by >= 20% and stay unbiased."""
    import jax.numpy as jnp

    from radar_slam_tpu.aoa import estimators as est
    from radar_slam_tpu.core.geometry import steering_matrix

    cfg = complete_analysis_config()
    rc = cfg.radar
    rng = np.random.default_rng(1)
    K = 4096
    true = rng.uniform(-60, 60, K).astype(np.float32)
    a = np.asarray(steering_matrix(jnp.deg2rad(jnp.asarray(true)),
                                   rc.num_antennas, rc.spacing, rc.lambda_c))
    noise = (rng.standard_normal((K, rc.num_antennas))
             + 1j * rng.standard_normal((K, rc.num_antennas))) / np.sqrt(2)
    sig = jnp.asarray((a * 10.0 + noise).astype(np.complex64))  # 20 dB

    def rmse(x):
        return float(np.sqrt(np.mean((np.asarray(x) - true) ** 2)))

    r_lag1 = rmse(est.estimate_esprit(sig, rc, weighted=False))
    r_multi = rmse(est.estimate_esprit(sig, rc, weighted=True))
    assert r_multi <= 0.8 * r_lag1, (r_multi, r_lag1)
    bias = float(np.mean(np.asarray(
        est.estimate_esprit(sig, rc, weighted=True)) - true))
    assert abs(bias) < 0.05, bias
