"""Known-truth velocity + association + pose tests (hard asserts).

Equivalent coverage to the reference's ``tests/test_improved_velocity.py``
(truth v = [10, 2, 0] m/s, w = [0, 0, 0.1] rad/s, two consecutive frames),
but with real accuracy assertions -- the reference only prints comparisons
(SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_slam_tpu.core.config import (AoAConfig, DetectionConfig, PoseConfig,
                                        RadarConfig, VelocityConfig)
from radar_slam_tpu.core.geometry import direction_vector, wrap_angle
from radar_slam_tpu.core.types import Associations, Targets
from radar_slam_tpu.motion.associate import associate_targets
from radar_slam_tpu.motion.pose import integrate_pose, planar_pose_step
from radar_slam_tpu.motion.velocity import solve_velocity

CFG = RadarConfig(noise_power=1e-6)
VEL = VelocityConfig()
DT = 0.1


def exact_associations(key, n, v, omega, dt=DT, lam=CFG.lambda_c,
                       vr_noise=0.0, pos_noise=0.0, n_outliers=0):
    """Synthesize exact solver inputs from geometry (no signal chain)."""
    ks = jax.random.split(key, 6)
    rng = jax.random.uniform(ks[0], (n,), minval=5.0, maxval=50.0)
    az = jax.random.uniform(ks[1], (n,), minval=-0.7, maxval=0.7)
    el = jnp.zeros(n)
    d = direction_vector(az, el)                       # [n, 3]
    r = rng[:, None] * d
    v = jnp.asarray(v, jnp.float32)
    omega = jnp.asarray(omega, jnp.float32)
    v_rel = v[None, :] + jnp.cross(jnp.broadcast_to(omega, (n, 3)), r)
    radial = jnp.sum(d * v_rel, axis=-1)               # d.(v + w x r)
    vr = -radial + vr_noise * jax.random.normal(ks[2], (n,))
    phase = wrap_angle(4.0 * jnp.pi * radial * dt / lam)
    apparent = -v_rel + pos_noise * jax.random.normal(ks[3], (n, 3))
    valid = jnp.ones(n, bool)
    if n_outliers:
        vr = vr.at[:n_outliers].add(5.0)               # gross outliers
    return Associations(
        prev_index=jnp.zeros(n, jnp.int32), distance=jnp.zeros(n),
        temporal_phase_diff=phase, position=r, direction=d, vr_mps=vr,
        apparent_velocity=apparent, weight=jnp.ones(n), valid=valid)


def test_doppler_mode_recovers_translation_and_yawrate():
    v_true = [10.0, 2.0, 0.0]
    w_true = [0.0, 0.0, 0.1]
    assoc = exact_associations(jax.random.key(0), 32, v_true, w_true,
                               vr_noise=0.05, pos_noise=0.05)
    est = solve_velocity(assoc, DT, CFG.lambda_c, VEL, mode="doppler")
    assert bool(est.success)
    np.testing.assert_allclose(np.asarray(est.velocity)[:2], [10.0, 2.0], atol=0.15)
    assert abs(float(est.angular_velocity[2]) - 0.1) < 0.03


def test_fused_mode_reaches_phase_precision():
    v_true = [8.0, -1.5, 0.0]
    assoc = exact_associations(jax.random.key(1), 48, v_true, [0, 0, 0],
                               vr_noise=0.004, pos_noise=0.02)
    est = solve_velocity(assoc, DT, CFG.lambda_c, VEL, mode="fused")
    # Phase refinement should land within a small fraction of a wrap
    # (lambda/(4 dt) ~ 1 cm/s radial).
    np.testing.assert_allclose(np.asarray(est.velocity)[:2], [8.0, -1.5],
                               atol=0.01)
    assert float(est.rmse) < 0.5


def test_huber_irls_rejects_outliers():
    v_true = [5.0, 0.0, 0.0]
    clean = exact_associations(jax.random.key(2), 40, v_true, [0, 0, 0],
                               vr_noise=0.02, pos_noise=0.02)
    dirty = exact_associations(jax.random.key(2), 40, v_true, [0, 0, 0],
                               vr_noise=0.02, pos_noise=0.02, n_outliers=6)
    est_c = solve_velocity(clean, DT, CFG.lambda_c, VEL, mode="doppler")
    est_d = solve_velocity(dirty, DT, CFG.lambda_c, VEL, mode="doppler")
    err_d = np.linalg.norm(np.asarray(est_d.velocity)[:2] - [5.0, 0.0])
    assert err_d < 0.25, err_d
    # outliers degrade but don't break
    err_c = np.linalg.norm(np.asarray(est_c.velocity)[:2] - [5.0, 0.0])
    assert err_c < 0.1


def test_insufficient_targets_fails_gracefully():
    assoc = exact_associations(jax.random.key(3), 2, [1, 0, 0], [0, 0, 0])
    est = solve_velocity(assoc, DT, CFG.lambda_c, VEL)
    assert not bool(est.success)
    np.testing.assert_allclose(np.asarray(est.velocity), 0.0)
    prev = jnp.array([3.0, 0, 0, 0, 0, 0.05])
    est2 = solve_velocity(assoc, DT, CFG.lambda_c, VEL, prev_motion=prev)
    np.testing.assert_allclose(np.asarray(est2.velocity), [3.0, 0, 0])


def _mk_targets(rng, az, sig, conf=None):
    n = rng.shape[0]
    c = conf if conf is not None else jnp.ones(n)
    t = jnp.ones(n, bool)
    return Targets(
        range_bin=jnp.arange(n, dtype=jnp.int32),
        doppler_bin=jnp.zeros(n, jnp.int32), range_m=rng,
        doppler_hz=jnp.zeros(n), vr_mps=jnp.zeros(n), power_db=jnp.zeros(n),
        azimuth_rad=az, confidence=c, num_sources=jnp.ones(n, jnp.int32),
        is_multipath=jnp.zeros(n, bool), is_reliable=t,
        spatial_signature=sig, valid=t)


def test_association_greedy_gate():
    A = CFG.num_antennas
    sig = jnp.ones((3, A), jnp.complex64)
    cur = _mk_targets(jnp.array([10.0, 20.0, 40.0]),
                      jnp.array([0.0, 0.3, -0.2]), sig)
    prev = _mk_targets(jnp.array([10.5, 21.0, 90.0]),
                       jnp.array([0.0, 0.3, 0.5]), sig)
    assoc = associate_targets(cur, prev, DT, VEL)
    v = np.asarray(assoc.valid)
    assert v[0] and v[1] and not v[2]          # 40 m target has no match < 5 m
    assert int(assoc.prev_index[0]) == 0
    assert int(assoc.prev_index[1]) == 1


def test_association_phase_diff_sign():
    A = CFG.num_antennas
    dphi = 0.7
    sig_prev = jnp.ones((1, A), jnp.complex64)
    sig_cur = (jnp.exp(1j * jnp.float32(dphi))
               * jnp.ones((1, A))).astype(jnp.complex64)
    cur = _mk_targets(jnp.array([15.0]), jnp.array([0.0]), sig_cur)
    prev = _mk_targets(jnp.array([15.2]), jnp.array([0.0]), sig_prev)
    assoc = associate_targets(cur, prev, DT, VEL)
    assert float(assoc.temporal_phase_diff[0]) == pytest.approx(dphi, abs=1e-5)


def test_pose_integration_straight_line():
    N = 50
    ts = jnp.arange(N, dtype=jnp.float32) * DT
    v = jnp.tile(jnp.array([10.0, 0.0, 0.0]), (N, 1))
    w = jnp.zeros((N, 3))
    traj = integrate_pose(v, w, ts, PoseConfig())
    np.testing.assert_allclose(np.asarray(traj.positions[-1]),
                               [10.0 * DT * (N - 1), 0, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(traj.orientations), 0.0, atol=1e-6)


def test_pose_integration_circle():
    # Constant speed + yaw rate -> circle of radius v/w.
    N, v0, w0 = 200, 5.0, 0.5
    ts = jnp.arange(N, dtype=jnp.float32) * 0.01
    v = jnp.tile(jnp.array([v0, 0.0, 0.0]), (N, 1))
    w = jnp.tile(jnp.array([0.0, 0.0, w0]), (N, 1))
    traj = integrate_pose(v, w, ts, PoseConfig(), rotate_velocities=True)
    radius = v0 / w0
    center = np.array([0.0, radius])
    d = np.linalg.norm(np.asarray(traj.positions)[:, :2] - center, axis=1)
    np.testing.assert_allclose(d, radius, atol=0.05)
    # Yaw tracks w0 * t.
    np.testing.assert_allclose(np.asarray(traj.orientations)[-1, 2],
                               w0 * 0.01 * (N - 1), atol=1e-3)


def test_pose_reference_parity_mode_ignores_heading():
    N = 10
    ts = jnp.arange(N, dtype=jnp.float32) * DT
    v = jnp.tile(jnp.array([10.0, 0.0, 0.0]), (N, 1))
    w = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (N, 1))
    traj = integrate_pose(v, w, ts, PoseConfig(), rotate_velocities=False)
    # Reference-parity: position goes straight despite yawing.
    assert abs(float(traj.positions[-1, 1])) < 1e-5


def test_planar_pose_step():
    pose = jnp.array([0.0, 0.0, jnp.pi / 2])
    new = planar_pose_step(pose, jnp.array([1.0, 0.0, 0.0]), 0.0, 1.0, True)
    np.testing.assert_allclose(np.asarray(new), [0.0, 1.0, jnp.pi / 2], atol=1e-6)
    ref = planar_pose_step(pose, jnp.array([1.0, 0.0, 0.0]), 0.0, 1.0, False)
    np.testing.assert_allclose(np.asarray(ref), [1.0, 0.0, jnp.pi / 2], atol=1e-6)


def test_trapezoid_vs_euler():
    N = 20
    ts = jnp.arange(N, dtype=jnp.float32) * DT
    v = jnp.stack([ts, jnp.zeros(N), jnp.zeros(N)], axis=1)  # accelerating
    w = jnp.zeros((N, 3))
    tr = integrate_pose(v, w, ts, PoseConfig(integration_method="trapezoidal"))
    eu = integrate_pose(v, w, ts, PoseConfig(integration_method="euler"))
    exact = 0.5 * float(ts[-1]) ** 2
    assert abs(float(tr.positions[-1, 0]) - exact) < \
        abs(float(eu.positions[-1, 0]) - exact)
