"""One-pass front-end kernel (ops/frontend_pallas.py): synthesis + noise
(once) + power + CA-CFAR + local-max + top-K + signatures in one Pallas
program.

Equivalence tiers:
- interpret mode (CPU): the kernel's power map must equal the three-stage
  path's (same math), its in-kernel detection must reproduce
  ``detect_peaks_from_power`` run on that same map (CFAR box sums ride the
  MXU as banded matmuls -- rounding-order differences only), and its
  signatures must match the signature kernel's for every VALID slot
  (invalid/NMS-suppressed slots carry raw-bin signatures by design; every
  consumer masks by ``valid``).
- chip (RADAR_SLAM_TEST_TPU=1): same assertions compiled on real Mosaic,
  plus noise identity via the ``noise_cube`` validation surface and
  driver-level trajectory equality one-pass vs three-dispatch.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from radar_slam_tpu.core.config import complete_analysis_config
from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
from radar_slam_tpu.ops import frontend_pallas as fe
from radar_slam_tpu.ops import synthpower_pallas as sp
from radar_slam_tpu.signal import detect as detect_mod
from radar_slam_tpu.signal.detect import detect_peaks_from_power
from radar_slam_tpu.signal.rds import _mix_vector
from radar_slam_tpu.signal.synth import synthesis_factors

interpret_only = pytest.mark.skipif(
    jax.devices()[0].platform in ("tpu", "axon"),
    reason="interpret-mode Pallas hangs on the axon/TPU backend")
chip_only = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="needs a real TPU (compiled Mosaic + real PRNG)")


def _setup(num_frames=3, noise_power=None):
    cfg = dataclasses.replace(complete_analysis_config(), max_scatterers=128)
    if noise_power is not None:
        cfg = dataclasses.replace(
            cfg, radar=dataclasses.replace(cfg.radar,
                                           noise_power=noise_power))
    batches, _ = constant_motion_scene(
        3, num_frames=num_frames, dt=cfg.frame_dt, v_body=(8.0, 0.5),
        yaw_rate=0.05,
        scene=SceneConfig(num_points=64, max_scatterers=cfg.max_scatterers))
    e_ac, e_fast = jax.jit(jax.vmap(
        lambda s: synthesis_factors(s, cfg.radar)))(batches)
    C = cfg.radar.num_chirps
    S = e_fast.shape[-1]
    mix = _mix_vector(cfg.radar, cfg.window, "baseband", S)
    seeds = jnp.arange(num_frames, dtype=jnp.int32) + 29
    sigma = float(np.sqrt(cfg.radar.noise_power))
    return cfg, batches, e_ac, e_fast, mix, seeds, sigma, C, S


def _run_frontend(cfg, e_ac, e_fast, mix, seeds, sigma, C, S, clutter=None,
                  **prec):
    d = cfg.detection
    lo, hi = detect_mod.range_gate_bin_interval(cfg.radar, S, d)
    return fe.scatterer_frontend(
        e_ac, e_fast, seeds, mix, C, sigma, d.max_detections,
        train=d.cfar_train_cells, guard=d.guard_cells,
        neighborhood=d.neighborhood, offset_db=d.cfar_offset_db,
        threshold_db=d.threshold_db, min_range_bin=lo, max_range_bin=hi,
        clutter=clutter, clutter_offset_db=d.clutter_offset_db,
        doppler_window=cfg.doppler_window, **prec)


@interpret_only
def test_frontend_matches_three_stage_interpret():
    cfg, batches, e_ac, e_fast, mix, seeds, sigma, C, S = _setup()
    with pltpu.force_tpu_interpret_mode():
        p_ref = np.asarray(sp.scatterer_power(
            e_ac, e_fast, seeds, mix, C, sigma,
            doppler_window=cfg.doppler_window, synth_precision="highest",
            precision_name="highest", doppler_precision="highest"))
        p, rb, db, vals, sigs = _run_frontend(
            cfg, e_ac, e_fast, mix, seeds, sigma, C, S,
            synth_precision="highest", precision_name="highest",
            doppler_precision="highest", sig_precision="highest")
        p, rb, db, vals, sigs = map(np.asarray, (p, rb, db, vals, sigs))

    # Power map: identical math, identical (degenerate) interpret PRNG.
    assert np.abs(p - p_ref).max() / p_ref.max() < 1e-5

    # Detection: in-kernel CFAR/top-K == the XLA detector on the SAME map.
    det_ref = jax.jit(jax.vmap(lambda x: detect_peaks_from_power(
        x, cfg.radar, cfg.detection)))(jnp.asarray(p))
    det_got = jax.jit(jax.vmap(
        lambda pp, r, dd, v: detect_mod.detections_from_topk(
            pp, r, dd, v, cfg.radar, cfg.detection)))(
                jnp.asarray(p), jnp.asarray(rb), jnp.asarray(db),
                jnp.asarray(vals))
    assert np.array_equal(np.asarray(det_ref.valid),
                          np.asarray(det_got.valid))
    v = np.asarray(det_ref.valid)
    assert v.any()
    for field in ("range_bin", "doppler_bin"):
        assert np.array_equal(np.asarray(getattr(det_ref, field))[v],
                              np.asarray(getattr(det_got, field))[v]), field
    np.testing.assert_allclose(np.asarray(det_got.power_db)[v],
                               np.asarray(det_ref.power_db)[v], atol=1e-4)
    np.testing.assert_allclose(np.asarray(det_got.range_m)[v],
                               np.asarray(det_ref.range_m)[v], atol=1e-4)
    np.testing.assert_allclose(np.asarray(det_got.doppler_hz)[v],
                               np.asarray(det_ref.doppler_hz)[v], atol=1e-3)

    # Signatures: valid slots match the exact-noise signature kernel run at
    # the final (zeroed) bins.
    with pltpu.force_tpu_interpret_mode():
        sig_ref = np.asarray(sp.scatterer_signatures(
            e_ac, e_fast, seeds, det_got.range_bin, det_got.doppler_bin,
            mix, C, sigma, doppler_window=cfg.doppler_window,
            synth_precision="highest", sig_precision="highest"))
    assert np.abs(sigs - sig_ref)[v].max() < 2e-4


@interpret_only
def test_frontend_clutter_gate_interpret():
    """A clutter map equal to the power map itself suppresses everything
    (nothing exceeds background by the offset)."""
    cfg, batches, e_ac, e_fast, mix, seeds, sigma, C, S = _setup(
        num_frames=2)
    with pltpu.force_tpu_interpret_mode():
        p = sp.scatterer_power(
            e_ac, e_fast, seeds, mix, C, sigma,
            doppler_window=cfg.doppler_window, synth_precision="highest",
            precision_name="highest", doppler_precision="highest")
        _, _, _, vals, _ = _run_frontend(
            cfg, e_ac, e_fast, mix, seeds, sigma, C, S, clutter=p,
            synth_precision="highest", precision_name="highest",
            doppler_precision="highest", sig_precision="highest")
        _, _, _, vals_free, _ = _run_frontend(
            cfg, e_ac, e_fast, mix, seeds, sigma, C, S,
            clutter=jnp.zeros_like(p),
            synth_precision="highest", precision_name="highest",
            doppler_precision="highest", sig_precision="highest")
    assert not np.isfinite(np.asarray(vals)).any()
    # All-zero clutter map is a no-op (threshold_db dominates).
    assert np.isfinite(np.asarray(vals_free)).any()


@chip_only
def test_frontend_on_chip_matches_three_stage():
    """Compiled Mosaic: detections and signatures of the one-pass kernel
    vs the three-dispatch path with the SAME seeds (identical PRNG stream
    by construction)."""
    from radar_slam_tpu.utils.host import device_get

    cfg, batches, e_ac, e_fast, mix, seeds, sigma, C, S = _setup()
    # precision_name="high": the one-pass kernel computes Z (and hence the
    # power map) at bf16x3, the three-dispatch power kernel's default was
    # bf16 -- compare against the equal-precision reference.
    p_ref = np.asarray(sp.scatterer_power(
        e_ac, e_fast, seeds, mix, C, sigma,
        doppler_window=cfg.doppler_window, synth_precision="high",
        precision_name="high", doppler_precision="high"))
    p, rb, db, vals, sigs = _run_frontend(
        cfg, e_ac, e_fast, mix, seeds, sigma, C, S)
    p = np.asarray(p)
    assert np.abs(p - p_ref).max() / p_ref.max() < 1e-4

    det_ref = jax.jit(jax.vmap(lambda x: detect_peaks_from_power(
        x, cfg.radar, cfg.detection)))(jnp.asarray(p_ref))
    det_got = jax.jit(jax.vmap(
        lambda pp, r, dd, v: detect_mod.detections_from_topk(
            pp, r, dd, v, cfg.radar, cfg.detection)))(
                jnp.asarray(p), rb, db, vals)
    v = np.asarray(det_ref.valid)
    assert v.any()
    assert np.array_equal(v, np.asarray(det_got.valid))
    assert np.array_equal(np.asarray(det_ref.range_bin)[v],
                          np.asarray(det_got.range_bin)[v])
    assert np.array_equal(np.asarray(det_ref.doppler_bin)[v],
                          np.asarray(det_got.doppler_bin)[v])

    sig_ref = device_get(sp.scatterer_signatures(
        e_ac, e_fast, seeds, det_got.range_bin, det_got.doppler_bin, mix,
        C, sigma, doppler_window=cfg.doppler_window))
    sig_got = device_get(sigs)
    assert np.abs(sig_got - sig_ref)[v].max() < 1e-3


@chip_only
def test_frontend_driver_equivalence_on_chip():
    """Batched driver, one-pass vs three-dispatch: same trajectory (the
    noise realization is identical -- same seeds, same stream)."""
    from radar_slam_tpu.pipeline import frame as pipe

    # noise_domain="time": this test's premise is an IDENTICAL noise
    # realization across the one-pass and three-dispatch paths; the
    # spectral default draws a different (equally valid) realization and
    # is validated by its own tests below.
    cfg3 = dataclasses.replace(complete_analysis_config(),
                               max_scatterers=128,
                               frontend_one_pass=False,
                               noise_domain="time")
    cfg1 = dataclasses.replace(cfg3, frontend_one_pass=True)
    batches, gt = constant_motion_scene(
        11, num_frames=16, dt=cfg1.frame_dt, v_body=(8.0, 0.5),
        yaw_rate=0.05,
        scene=SceneConfig(num_points=96, max_scatterers=128))
    key = jax.random.key(0, impl="rbg")
    out3 = pipe.process_sequence_batched(batches, key, cfg3)
    out1 = pipe.process_sequence_batched(batches, key, cfg1)
    p3 = np.asarray(out3.pose)
    p1 = np.asarray(out1.pose)
    np.testing.assert_allclose(p1, p3, atol=5e-3)
    err = np.linalg.norm(p1[-1, :2] - np.asarray(gt["poses"])[-1, :2])
    assert err < 0.5, err


@chip_only
def test_frontend_rig_equivalence_on_chip():
    """Rig driver, one-pass vs materialized per-sensor cubes, sigma = 0
    (the two paths draw DIFFERENT noise generators, so equality is only
    defined noiselessly; tolerance covers the f32 carrier-rounding
    realization difference between jit programs)."""
    from radar_slam_tpu.io.synthetic import constant_motion_scene_rig
    from radar_slam_tpu.pipeline import rig as rigmod

    base = dataclasses.replace(
        complete_analysis_config(), max_scatterers=128,
        radar=dataclasses.replace(complete_analysis_config().radar,
                                  noise_power=0.0))
    rig = ((1.8, 0.9, 0.4), (1.8, -0.9, -0.4))
    batches, gt = constant_motion_scene_rig(
        7, num_frames=10, dt=base.frame_dt, v_body=(8.0, 0.5),
        yaw_rate=0.1, rig=rig,
        scene=SceneConfig(num_points=96, max_scatterers=128))
    key = jax.random.key(0, impl="rbg")
    out1 = rigmod.process_sequence_rig(
        batches, key, dataclasses.replace(base, frontend_one_pass=True),
        rig)
    out3 = rigmod.process_sequence_rig(
        batches, key, dataclasses.replace(base, frontend_one_pass=False),
        rig)
    p1, p3 = np.asarray(out1.pose), np.asarray(out3.pose)
    np.testing.assert_allclose(p1, p3, atol=5e-2)
    err = np.linalg.norm(p1[-1, :2] - np.asarray(gt["poses"])[-1, :2])
    assert err < 0.5, err


def test_topk_two_stage_equals_lax_topk():
    """Segmented selection (the trace showed lax.top_k lowering to a full
    12,800-sort at ~880 us/64f) must be EXACT, including lax.top_k's
    smaller-index tie order and -inf fills."""
    rng = np.random.default_rng(0)
    for _ in range(20):
        N = int(rng.choice([12800, 777, 130, 64]))
        x = rng.choice([-np.inf, -1e30, 0.5, 1.0, 3.25, 7.0],
                       size=(3, N), p=[.3, .3, .1, .1, .1, .1]
                       ).astype(np.float32)
        x += rng.standard_normal((3, N)).astype(np.float32) * (x > -1e29)
        K = int(rng.choice([5, 50, 64]))
        v1, i1 = jax.lax.top_k(jnp.asarray(x), K)
        for seg in (128, 512, 777):      # incl. the non-divisor pad path
            v2, i2 = fe.topk_two_stage(jnp.asarray(x), K, seg=seg)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@chip_only
def test_spectral_reassociation_matches_time_noiseless():
    """noise_domain="range_freq" reassociates the synthesis->DFT chain
    (e_ac^T (e_fast' W) instead of (e_ac^T e_fast') W); at sigma = 0 the
    two constructions compute the same Z up to bf16x3 reassociation, so
    power maps and detections must agree."""
    from radar_slam_tpu.ops.windows import window_freq_taps

    cfg, batches, e_ac, e_fast, mix, seeds, sigma, C, S = _setup(
        noise_power=0.0)
    p_t, rb_t, db_t, v_t, sig_t = _run_frontend(
        cfg, e_ac, e_fast, mix, seeds, 0.0, C, S, noise_domain="time")
    p_s, rb_s, db_s, v_s, sig_s = _run_frontend(
        cfg, e_ac, e_fast, mix, seeds, 0.0, C, S,
        noise_domain="range_freq", noise_taps=window_freq_taps(cfg.window))
    p_t, p_s = np.asarray(p_t), np.asarray(p_s)
    assert np.abs(p_s - p_t).max() / p_t.max() < 1e-4
    ok_t = np.asarray(v_t) > -np.inf
    ok_s = np.asarray(v_s) > -np.inf
    assert np.array_equal(ok_t, ok_s)
    assert np.array_equal(np.asarray(rb_t)[ok_t], np.asarray(rb_s)[ok_s])
    assert np.array_equal(np.asarray(db_t)[ok_t], np.asarray(db_s)[ok_s])


@chip_only
def test_spectral_noise_exact_construction():
    """Signal = 0, sigma = 1: the spectral kernel's power map must equal
    the XLA oracle computed from the SAME g planes (noise_cube with the
    same seeds IS the kernel's freq-domain draw -- the domain only changes
    interpretation): Z_n = sqrt(S) * (g conv taps), col 0 zeroed, Doppler
    power = mean_a |sum_c w_dop Z|^2.  Validates stream identity, the tap
    structure, and the sqrt(S) scaling bit-for-bit (f32 tolerance)."""
    from radar_slam_tpu.ops.windows import window_freq_taps
    from radar_slam_tpu.utils.host import device_get

    cfg, batches, e_ac, e_fast, mix, seeds, _sig, C, S = _setup()
    A = cfg.radar.num_antennas
    AC = A * C
    taps = window_freq_taps(cfg.window)

    # zeros via jit: eager complex-array creation poisons the axon session
    # (utils/host.py module docstring).
    e_ac0 = jax.jit(lambda a: a * 0)(e_ac)
    p_s = np.asarray(_run_frontend(
        cfg, e_ac0, e_fast, mix, seeds, 1.0, C, S,
        noise_domain="range_freq", noise_taps=taps,
        noise_impl="fast")[0])                                # [F, R, D]

    g = device_get(sp.noise_cube(seeds, AC, S, noise_impl="fast"))
    zn = np.zeros_like(g)
    for off, ccf in taps:
        zn += ccf * np.roll(g, off, axis=-1)
    zn *= np.sqrt(S)
    zn[..., 0] = 0.0                                          # dc_removal
    # Build the Doppler matrix in pure numpy: calling doppler_dft_matrix
    # eagerly creates a complex device array, which poisons the axon
    # session (utils/host.py).
    from radar_slam_tpu.ops.windows import get_window
    c_idx = np.arange(C, dtype=np.float64)
    k_shifted = np.roll(np.arange(C, dtype=np.float64), C // 2)
    wd = np.exp(-1j * (2.0 * np.pi / C) * np.outer(c_idx, k_shifted))
    if cfg.doppler_window is not None:
        wd = np.asarray(get_window(cfg.doppler_window, C))[:, None] * wd
    wd = wd.astype(np.complex64)                               # [C, D]
    zc = zn.reshape(-1, A, C, S)
    rds = np.einsum("facs,cd->fads", zc, wd)
    p_ref = np.mean(np.abs(rds) ** 2, axis=1).transpose(0, 2, 1)  # [F,R,D]
    assert np.abs(p_s - p_ref).max() / p_ref.max() < 1e-4


def _split_setup(fid, num_frames=3):
    cfg, batches, e_ac, e_fast, mix, seeds, sigma, C, S = _setup(num_frames)
    from radar_slam_tpu.signal.synth import (fast_time_base,
                                             synthesis_factors_split)
    e_ac, e_fast = jax.jit(jax.vmap(
        lambda s: synthesis_factors(s, cfg.radar, fid)))(batches)
    sp_f = jax.jit(jax.vmap(
        lambda s: synthesis_factors_split(s, cfg.radar, fid)))(batches)
    t = fast_time_base(cfg.radar, fid)
    eu = cfg.radar.chirp_duration if fid == "reference" else None
    return cfg, e_ac, e_fast, sp_f, t, eu, mix, seeds, sigma, C, S


@interpret_only          # pure-XLA guard; eager complex ops poison axon
@pytest.mark.parametrize("fid", ["tpu", "reference"])
def test_split_factors_compose_to_dense(fid):
    """signal/synth.py:synthesis_factors_split: the per-axis tables must
    recompose to the dense factors -- e_ac EXACTLY (the dense path builds
    it from the same outer product), e_fast to f32 phase-rounding
    tolerance (the split evaluates exp at const - beat*(t[qB] + t[j])
    versus the dense const - beat*t[qB+j]; both round a ~200-cycle
    argument, so they are two ~1 ulp realizations of the same phase)."""
    cfg, e_ac, e_fast, sp_f, t, eu, *_ = _split_setup(fid)
    S = e_fast.shape[-1]
    B = sp_f.fine.shape[-1]
    Q = sp_f.coarse.shape[-1]
    comp_fast = (jnp.repeat(sp_f.coarse, B, axis=-1)[..., :S]
                 * jnp.tile(sp_f.fine, (1, 1, Q))[..., :S])
    gate = (t[None, None, :] >= sp_f.tau[..., None]).astype(jnp.float32)
    if eu is not None:
        gate = gate * ((t[None, None, :] - sp_f.tau[..., None]) <= eu)
    comp_fast = np.asarray(comp_fast * gate)
    comp_ac = np.asarray((sp_f.ant[..., :, None]
                          * sp_f.dopp[..., None, :]).reshape(e_ac.shape))
    assert np.abs(comp_ac - np.asarray(e_ac)).max() == 0.0
    assert np.abs(comp_fast - np.asarray(e_fast)).max() < 2e-3
    assert np.abs(comp_fast - np.asarray(e_fast)).mean() < 1e-4


def _run_frontend_split(cfg, sp_f, t, eu, mix, seeds, sigma, C, S, **prec):
    d = cfg.detection
    lo, hi = detect_mod.range_gate_bin_interval(cfg.radar, S, d)
    return fe.scatterer_frontend_split(
        sp_f.ant, sp_f.dopp, sp_f.coarse, sp_f.fine, sp_f.tau, t,
        seeds, mix, C, sigma, d.max_detections,
        train=d.cfar_train_cells, guard=d.guard_cells,
        neighborhood=d.neighborhood, offset_db=d.cfar_offset_db,
        threshold_db=d.threshold_db, min_range_bin=lo, max_range_bin=hi,
        doppler_window=cfg.doppler_window, echo_upper=eu, **prec)


def _assert_split_matches_dense(outs_d, outs_s, power_rtol, sig_atol):
    from radar_slam_tpu.utils.host import device_get
    p1, rb1, db1, v1, s1 = device_get(tuple(outs_d))
    p2, rb2, db2, v2, s2 = device_get(tuple(outs_s))
    assert np.abs(p1 - p2).max() / p1.max() < power_rtol
    val1, val2 = v1 > -np.inf, v2 > -np.inf
    F = p1.shape[0]
    set1 = {(f, int(r), int(d)) for f in range(F)
            for r, d, ok in zip(rb1[f], db1[f], val1[f]) if ok}
    set2 = {(f, int(r), int(d)) for f in range(F)
            for r, d, ok in zip(rb2[f], db2[f], val2[f]) if ok}
    assert set1, "no detections"
    # Identical noise stream (same Z shape -> same PRNG draw), ~1e-5
    # relative power difference: allow at most one borderline CFAR flip.
    assert len(set1 ^ set2) <= 1, (len(set1 ^ set2), len(set1))
    both = val1 & val2 & (rb1 == rb2) & (db1 == db2)
    assert both.sum() >= 0.95 * val1.sum()
    assert np.abs(s1[both] - s2[both]).max() < sig_atol


@interpret_only
@pytest.mark.parametrize("fid", ["tpu", "reference"])
def test_frontend_split_matches_dense_interpret(fid):
    """ops/frontend_pallas.py:scatterer_frontend_split: in-VMEM factor
    recomposition must reproduce the dense kernel's outputs (identical
    degenerate interpret PRNG): same detection set, power to composed-
    phase rounding, signatures to unit-norm tolerance."""
    cfg, e_ac, e_fast, sp_f, t, eu, mix, seeds, sigma, C, S = \
        _split_setup(fid)
    prec = dict(synth_precision="highest", doppler_precision="highest",
                sig_precision="highest")
    with pltpu.force_tpu_interpret_mode():
        outs_d = _run_frontend(cfg, e_ac, e_fast, mix, seeds, sigma, C, S,
                               precision_name="highest", **prec)
        outs_s = _run_frontend_split(cfg, sp_f, t, eu, mix, seeds, sigma,
                                     C, S, **prec)
        _assert_split_matches_dense(outs_d, outs_s, power_rtol=5e-4,
                                    sig_atol=0.02)


@chip_only
def test_frontend_split_matches_dense_on_chip():
    """Same as the interpret tier but compiled Mosaic at the PRODUCTION
    precision/noise operating point (spectral noise, fast Gaussian): the
    split path must hold the dense path's detections and signatures with
    the real in-kernel PRNG stream (identical for both: Z has the same
    shape, so the draw order is unchanged)."""
    from radar_slam_tpu.ops.windows import window_freq_taps

    cfg, e_ac, e_fast, sp_f, t, eu, mix, seeds, sigma, C, S = \
        _split_setup("tpu")
    prec = dict(noise_domain="range_freq",
                noise_taps=window_freq_taps(cfg.window), noise_impl="fast")
    outs_d = _run_frontend(cfg, e_ac, e_fast, mix, seeds, sigma, C, S,
                           **prec)
    outs_s = _run_frontend_split(cfg, sp_f, t, eu, mix, seeds, sigma,
                                 C, S, **prec)
    _assert_split_matches_dense(outs_d, outs_s, power_rtol=2e-3,
                                sig_atol=0.05)


@interpret_only
def test_cfar_cumsum_matches_matmul_interpret():
    """cfar_impl="cumsum" (exact-f32 prefix-sum differencing) must
    reproduce the banded-matmul CFAR's detections.  Chip-measured a WASH
    (docs/BENCHMARKS.md r05d: even train=0 ablates <~40 us/64f -- Mosaic
    overlaps the box-sum matmuls with the kernel's VPU work), kept as the
    numerically-closer-to-XLA option."""
    cfg, batches, e_ac, e_fast, mix, seeds, sigma, C, S = _setup()
    prec = dict(synth_precision="highest", precision_name="highest",
                doppler_precision="highest", sig_precision="highest")
    with pltpu.force_tpu_interpret_mode():
        o1 = _run_frontend(cfg, e_ac, e_fast, mix, seeds, sigma, C, S,
                           cfar_impl="matmul", **prec)
        o2 = _run_frontend(cfg, e_ac, e_fast, mix, seeds, sigma, C, S,
                           cfar_impl="cumsum", **prec)
    p1, rb1, db1, v1, _ = map(np.asarray, o1)
    p2, rb2, db2, v2, _ = map(np.asarray, o2)
    assert np.array_equal(p1, p2)           # CFAR only affects the mask
    val1, val2 = v1 > -np.inf, v2 > -np.inf
    F = p1.shape[0]
    set1 = {(f, int(r), int(d)) for f in range(F)
            for r, d, ok in zip(rb1[f], db1[f], val1[f]) if ok}
    set2 = {(f, int(r), int(d)) for f in range(F)
            for r, d, ok in zip(rb2[f], db2[f], val2[f]) if ok}
    assert set1 and set1 == set2


@interpret_only
def test_frontend_split_clutter_gate_interpret():
    """The split-factor wrapper's clutter input (used by the streaming
    scan step, pipeline/frame.py:230) gates detections exactly like the
    dense wrapper's: a clutter map equal to the power map suppresses
    everything; an all-zero map is a no-op."""
    cfg, e_ac, e_fast, sp_f, t, eu, mix, seeds, sigma, C, S = \
        _split_setup("tpu")
    prec = dict(synth_precision="highest", doppler_precision="highest",
                sig_precision="highest")
    with pltpu.force_tpu_interpret_mode():
        p, _, _, vals_free0, _ = _run_frontend_split(
            cfg, sp_f, t, eu, mix, seeds, sigma, C, S, **prec)
        _, _, _, vals, _ = _run_frontend_split(
            cfg, sp_f, t, eu, mix, seeds, sigma, C, S,
            clutter=p, clutter_offset_db=cfg.detection.clutter_offset_db,
            **prec)
        _, _, _, vals_free, _ = _run_frontend_split(
            cfg, sp_f, t, eu, mix, seeds, sigma, C, S,
            clutter=jnp.zeros_like(p),
            clutter_offset_db=cfg.detection.clutter_offset_db, **prec)
    assert not np.isfinite(np.asarray(vals)).any()
    assert np.isfinite(np.asarray(vals_free)).any()
    np.testing.assert_array_equal(np.asarray(vals_free),
                                  np.asarray(vals_free0))
