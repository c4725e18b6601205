"""Doppler ambiguity handling (ROADMAP item 6).

At the reference PRI (100 us, lambda = 3.9 mm) the unambiguous radial
velocity is lambda/(4 PRI) ~= 9.74 m/s; highway ego speeds alias.  The
solver unwraps each target's Doppler vr to the alias nearest a prediction
from the previous motion / apparent velocity (motion/velocity.py
dealias_doppler).  The reference has no equivalent.
"""

import dataclasses

import jax
import numpy as np
import pytest

from radar_slam_tpu.core.config import (AoAConfig, DetectionConfig,
                                        PipelineConfig, RadarConfig,
                                        VelocityConfig)
from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
from radar_slam_tpu.pipeline import frame as pipe

CFG = PipelineConfig(
    radar=RadarConfig(noise_power=1e-6, num_chirps=32),
    detection=DetectionConfig(threshold_db=-10.0, max_detections=64),
    aoa=AoAConfig(search_resolution_deg=1.0, confidence_threshold=0.5,
                  max_targets=50, track_capacity=64),
    velocity=VelocityConfig(),
)

V_FAST = 16.0  # m/s, well past the 9.74 m/s unambiguous limit


@pytest.fixture(scope="module")
def fast_scene():
    assert V_FAST > CFG.radar.max_unambiguous_velocity
    return constant_motion_scene(
        23, num_frames=10, dt=CFG.frame_dt, v_body=(V_FAST, 0.5),
        yaw_rate=0.05,
        scene=SceneConfig(num_points=48, max_scatterers=CFG.max_scatterers))


def test_fast_ego_velocity_recovered(fast_scene):
    batches, gt = fast_scene
    out = pipe.process_sequence(batches, jax.random.key(0), CFG)
    v = np.asarray(out.motion.velocity)[1:]
    np.testing.assert_allclose(v[:, 0], V_FAST, atol=0.4)
    np.testing.assert_allclose(v[:, 1], 0.5, atol=0.4)


def test_dealiasing_is_loadbearing(fast_scene):
    """Without de-aliasing the same workload must NOT recover the speed --
    guards against the scene accidentally staying unambiguous."""
    batches, _ = fast_scene
    cfg = dataclasses.replace(
        CFG, velocity=dataclasses.replace(CFG.velocity,
                                          dealias_doppler=False))
    out = pipe.process_sequence(batches, jax.random.key(0), cfg)
    v = np.asarray(out.motion.velocity)[1:]
    assert np.abs(v[:, 0] - V_FAST).max() > 1.0


def test_dealias_unit():
    """dealias_doppler restores true vr given a half-span-accurate guess."""
    import jax.numpy as jnp
    from radar_slam_tpu.core.types import Associations
    from radar_slam_tpu.motion.velocity import dealias_doppler

    v_un = 9.74
    span = 2 * v_un
    K = 8
    rng = np.random.default_rng(0)
    az = rng.uniform(-1.0, 1.0, K)
    d = np.stack([np.cos(az), np.sin(az), np.zeros(K)], -1).astype(np.float32)
    r = (rng.uniform(5, 50, K)[:, None] * d).astype(np.float32)
    x_true = np.array([14.0, 1.0, 0.0, 0.0, 0.0, 0.0], np.float32)
    vr_true = -(d @ x_true[:3])
    vr_folded = (vr_true + v_un) % span - v_un

    assoc = Associations(
        prev_index=jnp.zeros(K, jnp.int32), distance=jnp.zeros(K),
        temporal_phase_diff=jnp.zeros(K), position=jnp.asarray(r),
        direction=jnp.asarray(d), vr_mps=jnp.asarray(vr_folded),
        apparent_velocity=jnp.zeros((K, 3)), weight=jnp.ones(K),
        valid=jnp.ones(K, bool))
    # Guess off by 3 m/s -- still within half a span.
    x_ref = jnp.asarray(x_true + np.array([3.0, -1.0, 0, 0, 0, 0],
                                          np.float32))
    out = dealias_doppler(assoc, x_ref, v_un)
    np.testing.assert_allclose(np.asarray(out.vr_mps), vr_true, atol=1e-4)
