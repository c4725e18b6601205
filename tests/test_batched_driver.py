"""Two-phase batched driver must match the sequential scan driver."""

import jax
import numpy as np
import pytest

from radar_slam_tpu.core.config import (AoAConfig, DetectionConfig,
                                        PipelineConfig, RadarConfig,
                                        VelocityConfig)
from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
from radar_slam_tpu.pipeline import frame as pipe

# temporal_weight=0: the batched driver solves all frames in parallel and
# drops the (0.001x-weight) temporal motion prior; zeroing it makes the two
# drivers algebraically identical.
CFG = PipelineConfig(
    radar=RadarConfig(noise_power=1e-6, num_chirps=32),
    detection=DetectionConfig(cfar_train_cells=8, guard_cells=2,
                              cfar_offset_db=12.0, max_detections=32),
    aoa=AoAConfig(search_resolution_deg=2.0, confidence_threshold=0.5,
                  max_targets=32),
    velocity=VelocityConfig(temporal_weight=0.0),
)


@pytest.mark.slow
def test_batched_matches_scan():
    batches, gt = constant_motion_scene(
        jax.random.key(5), num_frames=8, dt=CFG.frame_dt,
        v_body=(6.0, -0.5), yaw_rate=0.08,
        scene=SceneConfig(num_points=64, max_scatterers=CFG.max_scatterers))
    a = pipe.process_sequence(batches, jax.random.key(0), CFG)
    b = pipe.process_sequence_batched(batches, jax.random.key(0), CFG)
    np.testing.assert_allclose(np.asarray(b.pose), np.asarray(a.pose),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.motion.velocity),
                               np.asarray(a.motion.velocity),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(b.motion.success),
                                  np.asarray(a.motion.success))
    np.testing.assert_array_equal(np.asarray(b.num_reliable),
                                  np.asarray(a.num_reliable))


@pytest.mark.slow
def test_chunked_matches_scan_exactly():
    """The chunked (software-pipelined) driver runs EXACT scan semantics --
    slot-table smoothing, temporal motion prior, same per-frame keys -- so
    unlike the batched driver it must match process_sequence WITH the
    default temporal prior, to float-reassociation tolerance."""
    import dataclasses as _dc

    from radar_slam_tpu.core.config import VelocityConfig as _V
    cfg = _dc.replace(CFG, velocity=_V())   # restore the temporal prior
    batches, _ = constant_motion_scene(
        jax.random.key(5), num_frames=10, dt=cfg.frame_dt,
        v_body=(6.0, -0.5), yaw_rate=0.08,
        scene=SceneConfig(num_points=64, max_scatterers=cfg.max_scatterers))
    a = pipe.process_sequence(batches, jax.random.key(0), cfg)
    # window=4 with F=10: exercises padding (12 padded frames) + chunking.
    b = pipe.process_sequence_chunked(batches, jax.random.key(0), cfg,
                                      window=4, prior="exact")
    np.testing.assert_allclose(np.asarray(b.pose), np.asarray(a.pose),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.motion.velocity),
                               np.asarray(a.motion.velocity),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(b.motion.success),
                                  np.asarray(a.motion.success))
    np.testing.assert_array_equal(np.asarray(b.num_reliable),
                                  np.asarray(a.num_reliable))

    # Jacobi prior relaxation (the fast default): the temporal prior's
    # weight is 1e-3 of the data terms, so relaxing its chain to two
    # batched sweeps must stay within second-order distance of the exact
    # chain while success flags agree exactly.
    j = pipe.process_sequence_chunked(batches, jax.random.key(0), cfg,
                                      window=4)
    np.testing.assert_array_equal(np.asarray(j.motion.success),
                                  np.asarray(a.motion.success))
    np.testing.assert_allclose(np.asarray(j.pose), np.asarray(a.pose),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(j.motion.velocity),
                               np.asarray(a.motion.velocity), atol=1e-3)
