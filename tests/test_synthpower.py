"""Cube-free synthetic front end (ops/synthpower_pallas.py): scatterers ->
power map / signatures with the ADC cube never materialized.

Equivalence methodology: the synthesis carrier term is ~25,600 cycles, so
its f32 fractional part quantizes at ~2e-3 cycles and DIFFERENT jit
programs may legally round it differently (each is a valid realization of
the same physics).  Hence every test below reconstructs the reference
cube from the SAME factor arrays fed to the kernels — then power must
match to f32 tolerance, the in-kernel noise stream must be reproducible
across both kernels (via ``noise_cube``), and signatures must match the
cube gather.  End-to-end accuracy is asserted against ground truth."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from radar_slam_tpu.core.config import complete_analysis_config
from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
from radar_slam_tpu.ops import synthpower_pallas as sp
from radar_slam_tpu.signal.detect import detect_peaks_from_power
from radar_slam_tpu.signal.rds import (_mix_vector, detection_signatures,
                                       rds_power)
from radar_slam_tpu.signal.synth import synthesis_factors

# Interpret-mode Pallas hangs on the axon backend (memory: axon pitfalls),
# and the setup fixture returns signals=None there -- under
# RADAR_SLAM_TEST_TPU=1 these tests must SKIP rather than rely on the
# documented -k "tpu or compiled" filter (ADVICE r03).
interpret_only = pytest.mark.skipif(
    jax.devices()[0].platform in ("tpu", "axon"),
    reason="interpret-mode Pallas hangs on the axon/TPU backend")


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(complete_analysis_config(), max_scatterers=128)
    batches, _ = constant_motion_scene(
        3, num_frames=2, dt=cfg.frame_dt, v_body=(8.0, 0.5), yaw_rate=0.05,
        scene=SceneConfig(num_points=64, max_scatterers=cfg.max_scatterers))
    e_ac, e_fast = jax.jit(jax.vmap(
        lambda s: synthesis_factors(s, cfg.radar)))(batches)
    C = cfg.radar.num_chirps
    A = cfg.radar.total_antennas
    S = e_fast.shape[-1]
    mix = _mix_vector(cfg.radar, cfg.window, "baseband", S)
    seeds = jnp.arange(2, dtype=jnp.int32) + 17
    sigma = float(np.sqrt(cfg.radar.noise_power))
    # Reference cube from the SAME factors + the SAME kernel noise stream.
    if jax.devices()[0].platform in ("tpu", "axon"):
        # Interpret-mode Pallas hangs on the axon backend; the chip-only
        # test (test_noise_seeding_on_tpu) does not use `signals`.
        signals = None
    else:
        with pltpu.force_tpu_interpret_mode():
            nz = sp.noise_cube(seeds, A * C, S)
        synth = jax.jit(lambda a, f: jnp.einsum(
            "bxp,bxs->bps", a, f,
            precision=jax.lax.Precision.HIGHEST))(e_ac, e_fast)
        signals = (synth + sigma * nz).reshape(2, A, C, S)
    return cfg, e_ac, e_fast, mix, seeds, sigma, signals, C, A, S


@interpret_only
def test_power_matches_explicit_cube(setup):
    cfg, e_ac, e_fast, mix, seeds, sigma, signals, C, A, S = setup
    want = np.asarray(rds_power(signals, cfg.radar, window=cfg.window,
                                doppler_window=cfg.doppler_window,
                                mode="xla"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sp.scatterer_power(
            e_ac, e_fast, seeds, mix, C, sigma,
            doppler_window=cfg.doppler_window, synth_precision="highest",
            precision_name="highest", doppler_precision="highest"))
    assert np.abs(got - want).max() / want.max() < 1e-4


@interpret_only
def test_power_bf16_inside_cfar_margin(setup):
    """Production precisions (bf16 range DFT, bf16x3 Doppler): power-map
    dB error far inside the 12 dB CFAR offset on detectable cells."""
    cfg, e_ac, e_fast, mix, seeds, sigma, signals, C, A, S = setup
    want = np.asarray(rds_power(signals, cfg.radar, window=cfg.window,
                                doppler_window=cfg.doppler_window,
                                mode="xla"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sp.scatterer_power(
            e_ac, e_fast, seeds, mix, C, sigma,
            doppler_window=cfg.doppler_window))
    db = np.abs(10 * np.log10(got + 1e-12) - 10 * np.log10(want + 1e-12))
    strong = want > 1e-3 * want.max()
    assert db[strong].max() < 0.1, db[strong].max()
    # Cells near the noise floor see bf16 leakage from strong rows (~1.6 dB
    # observed); what matters is that CFAR DECISIONS are unchanged.
    det_w = jax.jit(jax.vmap(lambda x: detect_peaks_from_power(
        x, cfg.radar, cfg.detection)))(jnp.asarray(want))
    det_g = jax.jit(jax.vmap(lambda x: detect_peaks_from_power(
        x, cfg.radar, cfg.detection)))(jnp.asarray(got))
    assert np.array_equal(np.asarray(det_w.valid), np.asarray(det_g.valid))
    v = np.asarray(det_w.valid)
    assert np.array_equal(np.asarray(det_w.range_bin)[v],
                          np.asarray(det_g.range_bin)[v])
    assert np.array_equal(np.asarray(det_w.doppler_bin)[v],
                          np.asarray(det_g.doppler_bin)[v])


@interpret_only
def test_signatures_match_explicit_cube(setup):
    """Same seeds -> same noise stream: kernel signatures equal the cube
    gather from the explicitly reconstructed noisy cube."""
    cfg, e_ac, e_fast, mix, seeds, sigma, signals, C, A, S = setup
    p = rds_power(signals, cfg.radar, window=cfg.window,
                  doppler_window=cfg.doppler_window, mode="xla")
    det = jax.jit(jax.vmap(lambda x: detect_peaks_from_power(
        x, cfg.radar, cfg.detection)))(p)
    want = np.asarray(jax.vmap(
        lambda s, r, d: detection_signatures(
            s, r, d, cfg.radar, window=cfg.window,
            doppler_window=cfg.doppler_window))(
                signals, det.range_bin, det.doppler_bin))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sp.scatterer_signatures(
            e_ac, e_fast, seeds, det.range_bin, det.doppler_bin, mix, C,
            sigma, doppler_window=cfg.doppler_window,
            synth_precision="highest", sig_precision="highest"))
    v = np.asarray(det.valid)
    assert np.abs(got - want)[v].max() < 2e-4


@interpret_only
def test_noise_stream_is_reproducible(setup):
    """noise_cube twice with the same seeds -> identical realization.

    Interpret mode's Mosaic PRNG is DEGENERATE (prng_random_bits returns
    constant bits and prng_seed is ignored), so on CPU this only pins
    determinism and the power/signature consistency tests above exercise
    the noise plumbing with a constant plane; seed variation and
    distribution statistics are asserted on the real chip below."""
    cfg, e_ac, e_fast, mix, seeds, sigma, signals, C, A, S = setup
    with pltpu.force_tpu_interpret_mode():
        n1 = np.asarray(sp.noise_cube(seeds, A * C, S))
        n2 = np.asarray(sp.noise_cube(seeds, A * C, S))
    np.testing.assert_array_equal(n1, n2)
    assert np.isfinite(n1.view(np.float32)).all()


@pytest.mark.skipif(jax.devices()[0].platform not in ("tpu", "axon"),
                    reason="compiled Mosaic PRNG seeding needs a real TPU "
                           "(interpret mode ignores prng_seed)")
def test_noise_seeding_on_tpu(setup):
    """Real-TPU seeding semantics: per-frame seeds give distinct noise,
    same seed reproduces, and the power/signature kernels share one
    realization (power from explicit cube == fused power)."""
    from radar_slam_tpu.utils.host import device_get

    cfg, e_ac, e_fast, mix, seeds, sigma, signals_unused, C, A, S = setup
    # device_get, not np.asarray: complex device->host transfers hang on
    # the axon backend (utils/host.py module docstring).
    n = device_get(sp.noise_cube(jnp.array([17, 18], jnp.int32), A * C, S))
    m = device_get(sp.noise_cube(jnp.array([17, 999], jnp.int32), A * C, S))
    assert np.abs(n[0] - n[1]).max() > 0.1          # different seeds differ
    np.testing.assert_array_equal(n[0], m[0])       # same seed reproduces
    assert np.abs(n[1] - m[1]).max() > 0.1
    flat = np.concatenate([n[0].real.ravel(), n[0].imag.ravel()])
    assert abs(flat.mean()) < 0.02
    assert abs(flat.std() - 1.0) < 0.02
    assert (np.abs(flat) > 4.0).any()               # unclipped tails
    assert np.abs(flat).max() < 8.0

    # Cross-kernel consistency with the REAL stream: reconstruct the cube
    # from the same factors + real noise, compare the fused power map.
    synth = jax.jit(lambda a, f: jnp.einsum(
        "bxp,bxs->bps", a, f,
        precision=jax.lax.Precision.HIGHEST))(e_ac, e_fast)
    nz = sp.noise_cube(seeds, A * C, S)
    signals = (synth + sigma * nz).reshape(2, A, C, S)
    want = np.asarray(rds_power(signals, cfg.radar, window=cfg.window,
                                doppler_window=cfg.doppler_window,
                                mode="xla"))
    got = np.asarray(sp.scatterer_power(
        e_ac, e_fast, seeds, mix, C, sigma,
        doppler_window=cfg.doppler_window, synth_precision="highest",
        precision_name="highest", doppler_precision="highest"))
    assert np.abs(got - want).max() / want.max() < 1e-4


@interpret_only
@pytest.mark.slow
def test_driver_phase_a_cube_free_matches_standard():
    """The cube-free phase A feeding the standard phase B reproduces the
    materialized driver's trajectory (noise off: interpret-mode PRNG is
    degenerate; tolerance covers the f32 carrier-rounding realization
    difference between jit programs)."""
    from radar_slam_tpu.io.synthetic import constant_motion_scene
    from radar_slam_tpu.pipeline import frame as pipe

    # This compile is the heaviest in the suite and lands after ~180
    # accumulated executables; XLA:CPU's compiler segfaulted here twice at
    # the exact same full-suite position (r04, stack: backend_compile_and
    # _load) while the test passes in any shorter run.  Dropping the
    # executable/tracing caches first keeps the compiler inside whatever
    # resource pool it was exhausting.
    jax.clear_caches()

    cfg = dataclasses.replace(
        complete_analysis_config(), max_scatterers=128, fft_mode="fused",
        radar=dataclasses.replace(complete_analysis_config().radar,
                                  noise_power=0.0))
    batches, gt = constant_motion_scene(
        5, num_frames=8, dt=cfg.frame_dt, v_body=(8.0, 0.5), yaw_rate=0.05,
        scene=SceneConfig(num_points=64, max_scatterers=cfg.max_scatterers))
    key = jax.random.key(0)
    want = pipe.process_sequence_batched(batches, key, cfg)
    with pltpu.force_tpu_interpret_mode():
        features = pipe.sequence_features_scatterers_fused(batches, key, cfg)
        got = pipe._sequence_from_features(features, cfg, True)
    np.testing.assert_allclose(np.asarray(got.pose), np.asarray(want.pose),
                               rtol=1e-3, atol=2e-2)
    err = np.linalg.norm(np.asarray(got.pose)[-1, :2]
                         - np.asarray(gt["poses"])[-1, :2])
    assert err < 0.5, err


@interpret_only
def test_synth_power_wide_layout_matches_loop(setup):
    """Cube-free kernel: 'wide' Doppler layout == per-antenna loop."""
    cfg, e_ac, e_fast, mix, seeds, sigma, signals, C, A, S = setup
    with pltpu.force_tpu_interpret_mode():
        loop = np.asarray(sp.scatterer_power(
            e_ac, e_fast, seeds, mix, C, 0.0,
            doppler_window=cfg.doppler_window, doppler_layout="loop"))
        wide = np.asarray(sp.scatterer_power(
            e_ac, e_fast, seeds, mix, C, 0.0,
            doppler_window=cfg.doppler_window, doppler_layout="wide"))
    assert np.abs(wide - loop).max() / loop.max() < 2e-6


@pytest.mark.skipif(jax.devices()[0].platform not in ("tpu", "axon"),
                    reason="compiled Mosaic PRNG needs a real TPU")
def test_fast_noise_statistics_on_tpu(setup):
    """The "fast" Gaussian (exact Rayleigh radius + 45deg-staggered
    Irwin-Hall direction; the production default) must hold the same
    distribution bar as Box-Muller: mean/std, UNCLIPPED tails past 4
    sigma at roughly the normal rate, and cross-kernel consistency of the
    power map with the explicit-cube reconstruction."""
    from radar_slam_tpu.utils.host import device_get

    cfg, e_ac, e_fast, mix, seeds, sigma, _sig, C, A, S = setup
    n = device_get(sp.noise_cube(jnp.array([17, 18], jnp.int32), A * C, S,
                                 noise_impl="fast"))
    flat = np.concatenate([n[0].real.ravel(), n[0].imag.ravel()])
    assert abs(flat.mean()) < 0.02
    assert abs(flat.std() - 1.0) < 0.02
    n_tail = (np.abs(flat) > 4.0).sum()
    expect = flat.size * 6.334e-5                 # 2*(1-Phi(4))
    assert 0.3 * expect <= n_tail <= 3.0 * expect, (n_tail, expect)
    assert np.abs(flat).max() < 8.0
    # radius exactness: |z|^2/2 ~ Exp(1) -> mean 1, P(>4) = e^-4
    r2 = (n[0].real ** 2 + n[0].imag ** 2) / 2.0
    assert abs(r2.mean() - 1.0) < 0.02
    frac = (r2 > 4.0).mean()
    assert 0.5 * np.exp(-4) < frac < 2.0 * np.exp(-4), frac

    synth = jax.jit(lambda a, f: jnp.einsum(
        "bxp,bxs->bps", a, f,
        precision=jax.lax.Precision.HIGHEST))(e_ac, e_fast)
    nz = sp.noise_cube(seeds, A * C, S, noise_impl="fast")
    signals = (synth + sigma * nz).reshape(2, A, C, S)
    want = np.asarray(rds_power(signals, cfg.radar, window=cfg.window,
                                doppler_window=cfg.doppler_window,
                                mode="xla"))
    got = np.asarray(sp.scatterer_power(
        e_ac, e_fast, seeds, mix, C, sigma,
        doppler_window=cfg.doppler_window, synth_precision="highest",
        precision_name="highest", doppler_precision="highest",
        noise_impl="fast"))
    assert np.abs(got - want).max() / want.max() < 1e-4
