"""Multi-sequence sharded batch: pipeline + pose-graph GN per sequence,
sequences partitioned over the 8-device mesh."""

import jax
import numpy as np
import pytest

from radar_slam_tpu.core.config import (AoAConfig, DetectionConfig,
                                        PipelineConfig, RadarConfig,
                                        VelocityConfig)
from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
from radar_slam_tpu.parallel import multiseq
from radar_slam_tpu.parallel.mesh import make_mesh

CFG = PipelineConfig(
    radar=RadarConfig(noise_power=1e-6, num_chirps=16,
                      chirp_duration=12.8e-6),   # 128 samples: fast test
    detection=DetectionConfig(cfar_train_cells=6, guard_cells=2,
                              cfar_offset_db=12.0, max_detections=24,
                              max_range=60.0),
    aoa=AoAConfig(search_resolution_deg=3.0, confidence_threshold=0.5,
                  max_targets=24, track_capacity=64),
    velocity=VelocityConfig(),
    max_scatterers=128,
)


def test_multiseq_sharded(eight_devices):
    M, F = 8, 8
    # Stay under the unambiguous radial velocity lambda/(4 PRI) = 9.74 m/s.
    vels = [(3.0 + 0.5 * m, 0.0) for m in range(M)]
    seqs, gts = [], []
    for m in range(M):
        b, gt = constant_motion_scene(
            100 + m, num_frames=F, dt=CFG.frame_dt, v_body=vels[m],
            yaw_rate=0.0,
            scene=SceneConfig(num_points=48, max_range=18.0, min_range=3.0,
                              max_scatterers=CFG.max_scatterers))
        seqs.append(b)
        gts.append(gt)
    batch = jax.tree.map(lambda *xs: jax.numpy.stack(xs), *seqs)
    keys = jax.random.split(jax.random.key(0), M)

    mesh = make_mesh(8, axis_name="s")
    out, poses, costs = multiseq.process_sequences_sharded(
        batch, keys, CFG, mesh)

    assert poses.shape == (M, F + 1, 3)
    v = np.asarray(out.motion.velocity)          # [M, F, 3]
    ok = np.asarray(out.motion.success)
    # Each sequence recovers its own commanded speed.
    recovered = 0
    for m in range(M):
        if ok[m, 1:].mean() > 0.5:
            vm = v[m, 1:][ok[m, 1:]][:, 0].mean()
            if abs(vm - vels[m][0]) < 0.5:
                recovered += 1
    assert recovered >= 6, (recovered,
                            [v[m, 1:, 0].mean() for m in range(M)])
    # Refined pose endpoints track the open-loop distance per sequence.
    for m in range(M):
        if ok[m, 1:].mean() > 0.5:
            d = np.linalg.norm(np.asarray(poses)[m, -1, :2])
            expect = vels[m][0] * CFG.frame_dt * F
            assert abs(d - expect) < 1.0, (m, d, expect)
