"""Synthetic known-truth scene generation for tests and benchmarks.

The reference's universal test fixture is "place 2-3 scatterers at known
(range, azimuth, rcs, vr) and run the real pipeline" (SURVEY.md section 4,
``tests/test_improved_velocity.py:29-77``).  This module generalizes that:
a static world point cloud is observed by an ego vehicle moving with a known
6-DoF motion profile, producing per-frame :class:`ScattererBatch` inputs with
physically consistent ranges, azimuths and radial velocities -- so velocity /
trajectory recovery can be hard-asserted against truth.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radar_slam_tpu.core.config import PipelineConfig
from radar_slam_tpu.core.types import ScattererBatch


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    num_points: int = 64
    min_range: float = 5.0
    max_range: float = 55.0
    rcs_min_db: float = 5.0
    rcs_max_db: float = 20.0
    azimuth_span_rad: float = 1.4      # initial point placement (+/- span/2)
    # Sensor field of view: points outside are not observed.  A ULA cannot
    # distinguish az from pi - az (cone ambiguity), so points drifting behind
    # the array would otherwise alias to mirrored azimuths and corrupt the
    # rotation observable.
    fov_rad: float = 2.4
    max_scatterers: int = 512


def make_world_points(key: jax.Array, scene: SceneConfig
                      ) -> Tuple[jax.Array, jax.Array]:
    """Random static world points [N, 2] (x, y) and RCS [N] around origin."""
    k1, k2, k3 = jax.random.split(key, 3)
    r = jax.random.uniform(k1, (scene.num_points,),
                           minval=scene.min_range, maxval=scene.max_range)
    az = jax.random.uniform(k2, (scene.num_points,),
                            minval=-scene.azimuth_span_rad / 2,
                            maxval=scene.azimuth_span_rad / 2)
    rcs = jax.random.uniform(k3, (scene.num_points,),
                             minval=scene.rcs_min_db, maxval=scene.rcs_max_db)
    pts = jnp.stack([r * jnp.cos(az), r * jnp.sin(az)], axis=-1)
    return pts, rcs


def observe_points(world_xy: jax.Array, rcs_db: jax.Array,
                   ego_xy: jax.Array, ego_yaw: jax.Array,
                   v_body: jax.Array, yaw_rate: jax.Array,
                   max_scatterers: int,
                   max_range: float = 1e9,
                   min_range: float = 1.5,
                   fov_rad: float = 2.4) -> ScattererBatch:
    """Project static world points into the ego body frame at one instant.

    Radial velocity is the physical range rate of a static point seen from a
    moving ego:  vr = -d_b . v_body  (the rotation term contributes nothing
    radially for a colocated sensor -- r x d = 0 when r is parallel to d;
    this is why single-sensor Doppler cannot observe yaw rate, see
    motion/velocity.py docstring)."""
    c, s = jnp.cos(ego_yaw), jnp.sin(ego_yaw)
    rel = world_xy - ego_xy[None, :]
    # world -> body: R(-yaw)
    xb = c * rel[:, 0] + s * rel[:, 1]
    yb = -s * rel[:, 0] + c * rel[:, 1]
    rng = jnp.sqrt(xb * xb + yb * yb)
    az = jnp.arctan2(yb, xb)
    d = jnp.stack([xb, yb], axis=-1) / jnp.maximum(rng[:, None], 1e-6)
    vr = -(d[:, 0] * v_body[0] + d[:, 1] * v_body[1])

    n = world_xy.shape[0]
    pad = max_scatterers - n
    assert pad >= 0, "max_scatterers smaller than point count"
    z = lambda x, fill=0.0: jnp.concatenate(
        [x, jnp.full((pad,), fill, x.dtype)]) if pad else x
    observable = ((rng <= max_range) & (rng >= min_range)
                  & (jnp.abs(az) <= fov_rad / 2))
    valid = jnp.concatenate([observable, jnp.zeros((pad,), bool)]) \
        if pad else observable
    return ScattererBatch(
        range_m=z(rng.astype(jnp.float32)),
        azimuth_rad=z(az.astype(jnp.float32)),
        rcs_db=z(rcs_db.astype(jnp.float32)),
        vr=z(vr.astype(jnp.float32)),
        valid=valid,
    )


def corridor_points(key: jax.Array, scene: SceneConfig, path_xy: jax.Array,
                    lateral: float = 30.0) -> Tuple[jax.Array, jax.Array]:
    """Scatter points around an ego path so targets stay in view for the
    whole sequence: each point is offset laterally + longitudinally from a
    random path sample."""
    k1, k2, k3 = jax.random.split(key, 3)
    n = scene.num_points
    t = jax.random.uniform(k1, (n,), minval=0.0, maxval=1.0)
    idx = (t * (path_xy.shape[0] - 1)).astype(jnp.int32)
    base = path_xy[idx]
    offs = jax.random.uniform(k2, (n, 2), minval=-1.0, maxval=1.0) \
        * jnp.array([scene.max_range * 0.8, lateral])
    rcs = jax.random.uniform(k3, (n,), minval=scene.rcs_min_db,
                             maxval=scene.rcs_max_db)
    return base + offs, rcs


def constant_motion_scene(key: jax.Array, num_frames: int, dt: float,
                          v_body: Tuple[float, float],
                          yaw_rate: float,
                          scene: SceneConfig = SceneConfig()):
    """Generate a frame sequence under constant body velocity + yaw rate.

    Points are distributed along the ego's path (corridor) so the scene
    stays observable over arbitrarily long sequences.

    Returns (scatterer_batches stacked [F, S], gt) where gt is a dict of
    ego poses [F, 3] (x, y, yaw) and body velocities."""
    # Pre-compute the exact path to seed the corridor point distribution.
    kw, key = jax.random.split(key)
    yaws = jnp.float32(yaw_rate) * dt * jnp.arange(num_frames + 1)
    vb0 = jnp.array([v_body[0], v_body[1]], jnp.float32)
    c, s = jnp.cos(yaws[:-1]), jnp.sin(yaws[:-1])
    steps = jnp.stack([c * vb0[0] - s * vb0[1],
                       s * vb0[0] + c * vb0[1]], axis=-1) * dt
    path = jnp.concatenate([jnp.zeros((1, 2)), jnp.cumsum(steps, axis=0)])
    world, rcs = corridor_points(kw, scene, path)
    vb = jnp.array([v_body[0], v_body[1]], jnp.float32)
    w = jnp.float32(yaw_rate)

    poses = []
    x = jnp.zeros(2)
    yaw = jnp.float32(0.0)
    frames = []
    for _ in range(num_frames):
        poses.append(jnp.concatenate([x, yaw[None]]))
        frames.append(observe_points(world, rcs, x, yaw, vb, w,
                                     scene.max_scatterers,
                                     max_range=scene.max_range,
                                     fov_rad=scene.fov_rad))
        # exact constant-twist integration
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        v_world = jnp.stack([c * vb[0] - s * vb[1], s * vb[0] + c * vb[1]])
        x = x + v_world * dt
        yaw = yaw + w * dt

    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    gt = {
        "poses": jnp.stack(poses),                       # [F, 3] x, y, yaw
        "velocity_body": jnp.array([v_body[0], v_body[1], 0.0]),
        "yaw_rate": jnp.float32(yaw_rate),
        "timestamps": jnp.arange(num_frames, dtype=jnp.float32) * dt,
    }
    return batched, gt


def pipeline_scatterer_pad(batch: ScattererBatch, cfg: PipelineConfig
                           ) -> ScattererBatch:
    """Pad/trim a batch to the pipeline's static scatterer capacity."""
    from radar_slam_tpu.core.types import pad_to
    S = cfg.max_scatterers
    return ScattererBatch(*[pad_to(x, S, axis=-1) for x in batch])
