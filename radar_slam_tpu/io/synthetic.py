"""Synthetic known-truth scene generation for tests and benchmarks.

The reference's universal test fixture is "place 2-3 scatterers at known
(range, azimuth, rcs, vr) and run the real pipeline" (SURVEY.md section 4,
``tests/test_improved_velocity.py:29-77``).  This module generalizes that:
a static world point cloud is observed by an ego vehicle moving with a known
6-DoF motion profile, producing per-frame :class:`ScattererBatch` inputs with
physically consistent ranges, azimuths and radial velocities -- so velocity /
trajectory recovery can be hard-asserted against truth.

All generation runs in host numpy (this is loader-side code; the device
first sees data as one uploaded batch).  Keeping it off the device also
matters practically: the axon TPU backend used in this container mishandles
eager-mode ops and some host transfers (see ``utils/host.py``), so
generator code must not run eager jnp.  ``jax.random`` keys are accepted for
API convenience and reduced to host seeds without touching the device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from radar_slam_tpu.core.config import PipelineConfig
from radar_slam_tpu.core.types import ScattererBatch

SeedLike = Union[int, np.integer, jax.Array]


def _rng(seed: SeedLike) -> np.random.Generator:
    if isinstance(seed, (int, np.integer)):
        return np.random.default_rng(int(seed))
    # jax PRNG key: only safe to read back on CPU -- the axon TPU backend
    # hangs on host transfers of eager arrays (even repr would hang), so
    # device-resident keys are rejected with a clear message.
    if isinstance(seed, jax.Array):
        platforms = {d.platform for d in seed.devices()}
        if platforms <= {"cpu"}:
            data = jax.random.key_data(seed)
            seed_int = int(np.asarray(data).sum()) & 0x7FFFFFFF
            return np.random.default_rng(seed_int)
        raise ValueError(
            "scene generators run on the host: pass an int seed instead of "
            f"a device-resident PRNG key (key lives on {sorted(platforms)})")
    return np.random.default_rng(abs(hash(seed)) & 0x7FFFFFFF)


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


def make_world_points(seed: SeedLike, scene: SceneConfig
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Random static world points [N, 2] (x, y) and RCS [N] around origin."""
    rng = _rng(seed)
    r = rng.uniform(scene.min_range, scene.max_range, scene.num_points)
    az = rng.uniform(-scene.azimuth_span_rad / 2, scene.azimuth_span_rad / 2,
                     scene.num_points)
    rcs = rng.uniform(scene.rcs_min_db, scene.rcs_max_db, scene.num_points)
    pts = np.stack([r * np.cos(az), r * np.sin(az)], axis=-1)
    return pts.astype(np.float32), rcs.astype(np.float32)


def corridor_points(seed: SeedLike, scene: SceneConfig, path_xy: np.ndarray,
                    lateral: float = 30.0) -> Tuple[np.ndarray, np.ndarray]:
    """Scatter points around an ego path so targets stay in view for the
    whole sequence: each point is offset laterally + longitudinally from a
    random path sample."""
    rng = _rng(seed)
    n = scene.num_points
    idx = rng.integers(0, len(path_xy), n)
    base = np.asarray(path_xy)[idx]
    offs = rng.uniform(-1.0, 1.0, (n, 2)) * np.array(
        [scene.max_range * 0.8, lateral])
    rcs = rng.uniform(scene.rcs_min_db, scene.rcs_max_db, n)
    return (base + offs).astype(np.float32), rcs.astype(np.float32)


def observe_points(world_xy: np.ndarray, rcs_db: np.ndarray,
                   ego_xy: np.ndarray, ego_yaw: float,
                   v_body: np.ndarray, yaw_rate: float,
                   max_scatterers: int,
                   max_range: float = 1e9,
                   min_range: float = 1.5,
                   fov_rad: float = 2.4) -> Dict[str, np.ndarray]:
    """Project static world points into the ego body frame at one instant.

    Radial velocity is the physical range rate of a static point seen from a
    moving ego:  vr = -d_b . v_body  (rotation contributes nothing radially
    for a colocated sensor -- r x d = 0 when r is parallel to d; this is why
    single-sensor Doppler cannot observe yaw rate, see motion/velocity.py).

    Returns plain numpy columns (range_m, azimuth_rad, rcs_db, vr, valid)
    padded to ``max_scatterers``.
    """
    world_xy = np.asarray(world_xy, np.float64)
    c, s = np.cos(ego_yaw), np.sin(ego_yaw)
    rel = world_xy - np.asarray(ego_xy)[None, :]
    xb = c * rel[:, 0] + s * rel[:, 1]
    yb = -s * rel[:, 0] + c * rel[:, 1]
    rng_m = np.hypot(xb, yb)
    az = np.arctan2(yb, xb)
    d = np.stack([xb, yb], axis=-1) / np.maximum(rng_m[:, None], 1e-6)
    vr = -(d[:, 0] * v_body[0] + d[:, 1] * v_body[1])

    n = len(world_xy)
    assert max_scatterers >= n, "max_scatterers smaller than point count"
    pad = max_scatterers - n

    def z(x):
        return np.pad(np.asarray(x, np.float32), (0, pad))

    observable = ((rng_m <= max_range) & (rng_m >= min_range)
                  & (np.abs(az) <= fov_rad / 2))
    return {
        "range_m": z(rng_m), "azimuth_rad": z(az), "rcs_db": z(rcs_db),
        "vr": z(vr),
        "valid": np.pad(observable, (0, pad)),
    }


def _to_device_batch(frames) -> ScattererBatch:
    stack = {k: np.stack([f[k] for f in frames]) for k in frames[0]}
    return ScattererBatch(
        range_m=jnp.asarray(stack["range_m"]),
        azimuth_rad=jnp.asarray(stack["azimuth_rad"]),
        rcs_db=jnp.asarray(stack["rcs_db"]),
        vr=jnp.asarray(stack["vr"]),
        valid=jnp.asarray(stack["valid"]),
        elevation_rad=(jnp.asarray(stack["elevation_rad"])
                       if "elevation_rad" in stack else None),
    )


def constant_motion_scene(seed: SeedLike, num_frames: int, dt: float,
                          v_body: Tuple[float, float],
                          yaw_rate: float,
                          scene: SceneConfig = SceneConfig()):
    """Generate a frame sequence under constant body velocity + yaw rate.

    Points are distributed along the ego's path (corridor) so the scene
    stays observable over arbitrarily long sequences.

    Returns (ScattererBatch stacked [F, S] on device, gt dict of HOST numpy
    arrays: poses [F, 3] (x, y, yaw), velocity_body [3], yaw_rate,
    timestamps [F])."""
    vb = np.array([v_body[0], v_body[1]], np.float64)
    w = float(yaw_rate)

    # Exact constant-twist path.
    yaws = w * dt * np.arange(num_frames + 1)
    c, s = np.cos(yaws[:-1]), np.sin(yaws[:-1])
    steps = np.stack([c * vb[0] - s * vb[1], s * vb[0] + c * vb[1]],
                     axis=-1) * dt
    path = np.concatenate([np.zeros((1, 2)), np.cumsum(steps, axis=0)])

    world, rcs = corridor_points(seed, scene, path)

    frames = []
    for i in range(num_frames):
        frames.append(observe_points(
            world, rcs, path[i], yaws[i], vb, w, scene.max_scatterers,
            max_range=scene.max_range, fov_rad=scene.fov_rad))

    gt = {
        "poses": np.concatenate([path[:num_frames],
                                 yaws[:num_frames, None]], axis=-1),
        "velocity_body": np.array([v_body[0], v_body[1], 0.0]),
        "yaw_rate": w,
        "timestamps": np.arange(num_frames) * dt,
    }
    return _to_device_batch(frames), gt


def constant_motion_scene_3d(seed: SeedLike, num_frames: int, dt: float,
                             v_body: Tuple[float, float, float],
                             yaw_rate: float,
                             scene: SceneConfig = SceneConfig(),
                             z_span: float = 10.0):
    """3-D variant of :func:`constant_motion_scene`: world points carry
    heights, observations carry elevations, and the ego moves with a full
    3-D body velocity (vz makes the ego climb/descend) -- the workload that
    requires a URA (RadarConfig.num_antennas_el > 1) to recover v_z.

    Returns (ScattererBatch [F, S] with ``elevation_rad``, gt dict)."""
    vb = np.array(v_body, np.float64)
    w = float(yaw_rate)

    yaws = w * dt * np.arange(num_frames + 1)
    c, s = np.cos(yaws[:-1]), np.sin(yaws[:-1])
    steps = np.stack([c * vb[0] - s * vb[1], s * vb[0] + c * vb[1],
                      np.full(num_frames, vb[2])], axis=-1) * dt
    path = np.concatenate([np.zeros((1, 3)), np.cumsum(steps, axis=0)])

    world_xy, rcs = corridor_points(seed, scene, path[:, :2])
    rng = _rng(seed)
    world_z = rng.uniform(-z_span, z_span, len(world_xy))
    world = np.concatenate([world_xy, world_z[:, None]], axis=-1)

    frames = []
    for i in range(num_frames):
        cy, sy = np.cos(yaws[i]), np.sin(yaws[i])
        rel = world - path[i][None, :]
        xb = cy * rel[:, 0] + sy * rel[:, 1]
        yb = -sy * rel[:, 0] + cy * rel[:, 1]
        zb = rel[:, 2]
        rng_m = np.sqrt(xb * xb + yb * yb + zb * zb)
        rh = np.hypot(xb, yb)
        az = np.arctan2(yb, xb)
        el = np.arctan2(zb, np.maximum(rh, 1e-6))
        d = np.stack([xb, yb, zb], -1) / np.maximum(rng_m[:, None], 1e-6)
        # vr = -d . (v + w x p), planar yaw: w x p = (-w yb, w xb, 0).
        vr = -(d[:, 0] * (vb[0] - w * yb) + d[:, 1] * (vb[1] + w * xb)
               + d[:, 2] * vb[2])

        n = len(world)
        pad = scene.max_scatterers - n
        assert pad >= 0

        def z_(x):
            return np.pad(np.asarray(x, np.float32), (0, pad))

        observable = ((rng_m <= scene.max_range) & (rng_m >= 1.5)
                      & (np.abs(az) <= scene.fov_rad / 2))
        frames.append({
            "range_m": z_(rng_m), "azimuth_rad": z_(az), "rcs_db": z_(rcs),
            "vr": z_(vr), "elevation_rad": z_(el),
            "valid": np.pad(observable, (0, pad)),
        })

    gt = {
        "poses": np.concatenate([path[:num_frames, :2],
                                 yaws[:num_frames, None]], axis=-1),
        "velocity_body": vb,
        "yaw_rate": w,
        "timestamps": np.arange(num_frames) * dt,
    }
    return _to_device_batch(frames), gt


def observe_points_from_sensor(world_xy: np.ndarray, rcs_db: np.ndarray,
                               ego_xy: np.ndarray, ego_yaw: float,
                               v_body: np.ndarray, yaw_rate: float,
                               mount: Tuple[float, float, float],
                               max_scatterers: int,
                               max_range: float = 1e9,
                               min_range: float = 1.5,
                               fov_rad: float = 2.4) -> Dict[str, np.ndarray]:
    """Project static world points into ONE mounted sensor's frame.

    ``mount`` = (x, y, yaw) of the sensor in the vehicle frame.  Outputs are
    SENSOR-frame polar coordinates (what a real mounted radar measures; cf.
    RadarScenes per-sensor ``range_sc``/``azimuth_sc``), and the radial
    velocity is the exact range rate of a static point seen from the mounted
    sensor on a translating+rotating ego:

        vr = -d . (v + w x p)      (d = sensor->target LOS, p = target
                                    position, both in the vehicle frame;
                                    see motion/velocity.py design_matrix)

    The w x p lever-arm term is what makes yaw rate observable from Doppler
    alone with a multi-sensor rig -- the colocated :func:`observe_points`
    cannot express it (there d is parallel to p)."""
    world_xy = np.asarray(world_xy, np.float64)
    mx, my, myaw = float(mount[0]), float(mount[1]), float(mount[2])
    c, s = np.cos(ego_yaw), np.sin(ego_yaw)
    rel = world_xy - np.asarray(ego_xy)[None, :]
    # Target position p in the vehicle (body) frame.
    px = c * rel[:, 0] + s * rel[:, 1]
    py = -s * rel[:, 0] + c * rel[:, 1]
    # Sensor->target vector in the vehicle frame.
    ex, ey = px - mx, py - my
    rng_m = np.hypot(ex, ey)
    dx, dy = ex / np.maximum(rng_m, 1e-6), ey / np.maximum(rng_m, 1e-6)
    # Azimuth in the SENSOR frame (boresight rotated by mount yaw).
    az = np.arctan2(ey, ex) - myaw
    az = np.arctan2(np.sin(az), np.cos(az))
    w = float(yaw_rate)
    # v + w x p (planar): (vx - w py, vy + w px).
    vr = -(dx * (v_body[0] - w * py) + dy * (v_body[1] + w * px))

    n = len(world_xy)
    assert max_scatterers >= n, "max_scatterers smaller than point count"
    pad = max_scatterers - n

    def z(x):
        return np.pad(np.asarray(x, np.float32), (0, pad))

    observable = ((rng_m <= max_range) & (rng_m >= min_range)
                  & (np.abs(az) <= fov_rad / 2))
    return {
        "range_m": z(rng_m), "azimuth_rad": z(az), "rcs_db": z(rcs_db),
        "vr": z(vr),
        "valid": np.pad(observable, (0, pad)),
    }


def constant_motion_scene_rig(seed: SeedLike, num_frames: int, dt: float,
                              v_body: Tuple[float, float],
                              yaw_rate: float,
                              rig: Tuple[Tuple[float, float, float], ...],
                              scene: SceneConfig = SceneConfig()):
    """Multi-sensor variant of :func:`constant_motion_scene`.

    Each sensor of ``rig`` ((x, y, yaw) mounts in the vehicle frame) observes
    the same static world in its own frame.  Points are placed around the
    path per sensor so every sensor keeps returns in view.

    Returns (ScattererBatch stacked [F, N_sens, S] on device, gt dict)."""
    vb = np.array([v_body[0], v_body[1]], np.float64)
    w = float(yaw_rate)

    yaws = w * dt * np.arange(num_frames + 1)
    c, s = np.cos(yaws[:-1]), np.sin(yaws[:-1])
    steps = np.stack([c * vb[0] - s * vb[1], s * vb[0] + c * vb[1]],
                     axis=-1) * dt
    path = np.concatenate([np.zeros((1, 2)), np.cumsum(steps, axis=0)])

    rng = _rng(seed)
    worlds = []
    for b, mount in enumerate(rig):
        # Seed world points along boresight of this sensor around the path.
        n = scene.num_points
        idx = rng.integers(0, len(path), n)
        base = path[idx]
        head = yaws[idx] + mount[2]
        along = rng.uniform(scene.min_range, scene.max_range * 0.8, n)
        across = rng.uniform(-0.4, 0.4, n) * scene.max_range
        pts = base + np.stack([
            np.cos(head) * along - np.sin(head) * across,
            np.sin(head) * along + np.cos(head) * across], axis=-1)
        rcs = rng.uniform(scene.rcs_min_db, scene.rcs_max_db, n)
        worlds.append((pts, rcs))

    frames = []
    for i in range(num_frames):
        per_sensor = [
            observe_points_from_sensor(
                worlds[b][0], worlds[b][1], path[i], yaws[i], vb, w, mount,
                scene.max_scatterers, max_range=scene.max_range,
                fov_rad=scene.fov_rad)
            for b, mount in enumerate(rig)]
        frames.append({k: np.stack([ps[k] for ps in per_sensor])
                       for k in per_sensor[0]})

    gt = {
        "poses": np.concatenate([path[:num_frames],
                                 yaws[:num_frames, None]], axis=-1),
        "velocity_body": np.array([v_body[0], v_body[1], 0.0]),
        "yaw_rate": w,
        "timestamps": np.arange(num_frames) * dt,
    }
    return _to_device_batch(frames), gt


def pipeline_scatterer_pad(batch: ScattererBatch, cfg: PipelineConfig
                           ) -> ScattererBatch:
    """Pad/trim a batch to the pipeline's static scatterer capacity."""
    from radar_slam_tpu.core.types import pad_to
    S = cfg.max_scatterers
    return ScattererBatch(*[pad_to(x, S, axis=-1) if x is not None else None
                            for x in batch])
