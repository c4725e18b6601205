"""Velocity-to-pose integration as a ``lax.scan`` over SO(3) increments.

Re-design of ``PoseIntegrator`` (``src/pose_integration/pose_integration.py:
23-269``): the reference's sequential Python loops composing scipy Rotations
(``:139-165``) become a single scan of quaternion products; trapezoidal /
Euler position integration (``:82-99``) becomes a cumulative sum; the
optional ``uniform_filter1d`` smoothing (``:105-109``) becomes an
edge-padded convolution.

One deliberate fix (flagged, defaulted ON): the reference integrates
body-frame velocities as if they were world-frame -- positions accumulate
``dt * v_body`` with no heading rotation (``:90``, and the planar update at
``radarscenes_complete_analysis.py:208-210``).  ``rotate_velocities=True``
rotates each body velocity by the current orientation before integrating
(proper dead reckoning); ``False`` reproduces the reference behaviour.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from radar_slam_tpu.core import geometry as geo
from radar_slam_tpu.core.config import PoseConfig
from radar_slam_tpu.core.types import Trajectory


def _uniform_filter1d(x: jax.Array, size: int) -> jax.Array:
    """scipy.ndimage.uniform_filter1d(mode='nearest') along axis 0."""
    if size <= 1:
        return x
    left = (size - 1) // 2
    right = size - 1 - left
    pad = jnp.concatenate([jnp.repeat(x[:1], left, axis=0), x,
                           jnp.repeat(x[-1:], right, axis=0)], axis=0)
    kernel = jnp.ones((size,), x.dtype) / size
    return jax.vmap(lambda col: jnp.convolve(col, kernel, mode="valid"),
                    in_axes=1, out_axes=1)(pad)


@functools.partial(jax.jit, static_argnames=("cfg", "rotate_velocities"))
def integrate_pose(velocities: jax.Array, angular_velocities: jax.Array,
                   timestamps: jax.Array, cfg: PoseConfig,
                   initial_position: Optional[jax.Array] = None,
                   initial_orientation: Optional[jax.Array] = None,
                   rotate_velocities: bool = True) -> Trajectory:
    """Integrate per-frame body velocities into a trajectory.

    Args:
        velocities: [N, 3] body-frame (vx, vy, vz) per frame.
        angular_velocities: [N, 3] (wx, wy, wz) per frame.
        timestamps: [N] seconds.
        initial_position / initial_orientation: [3] position and Euler-xyz
            orientation of the first pose (pose_integration.py:40-47).

    Returns:
        :class:`Trajectory` with positions, Euler orientations, quaternions.
    """
    N = velocities.shape[0]
    p0 = (initial_position if initial_position is not None
          else jnp.zeros(3)).astype(jnp.float32)
    e0 = (initial_orientation if initial_orientation is not None
          else jnp.zeros(3)).astype(jnp.float32)
    q0 = geo.quat_from_euler_xyz(e0)

    dts = jnp.diff(timestamps).astype(jnp.float32)               # [N-1]

    # ---- orientation scan: q_i = q_{i-1} * dq(w_{i-1} dt) (:139-165) ----
    def orient_step(q, inp):
        w, dt = inp
        dq = geo.quat_from_axis_angle(w * dt)
        q_new = geo.quat_normalize(geo.quat_multiply(q, dq))
        return q_new, q_new

    _, quats_rest = jax.lax.scan(
        orient_step, q0, (angular_velocities[:-1], dts))
    quats = jnp.concatenate([q0[None], quats_rest], axis=0)       # [N, 4]

    # ---- positions ----
    if rotate_velocities:
        v_world = geo.quat_rotate(quats, velocities)
    else:
        v_world = velocities                                      # ref parity

    if cfg.integration_method == "trapezoidal":                   # :82-90
        steps = 0.5 * dts[:, None] * (v_world[:-1] + v_world[1:])
    elif cfg.integration_method == "euler":                       # :92-99
        steps = dts[:, None] * v_world[:-1]
    else:
        raise ValueError(f"Unknown integration method: {cfg.integration_method}")
    positions = p0[None] + jnp.concatenate(
        [jnp.zeros((1, 3)), jnp.cumsum(steps, axis=0)], axis=0)

    if cfg.smoothing and N > cfg.smoothing_window:                # :105-109
        positions = _uniform_filter1d(positions, cfg.smoothing_window)

    return Trajectory(
        timestamps=timestamps,
        positions=positions,
        orientations=geo.quat_to_euler_xyz(quats),
        quaternions=quats,
        velocities=velocities,
        angular_velocities=angular_velocities,
    )


@jax.jit
def planar_pose_step(pose_xyyaw: jax.Array, velocity: jax.Array,
                     yaw_rate: jax.Array, dt: jax.Array,
                     rotate: bool = True) -> jax.Array:
    """One planar dead-reckoning update (x, y, yaw).

    With ``rotate=False`` this is the reference's complete-analysis update
    ``x += vx dt; y += vy dt; yaw += wz dt`` (radarscenes_complete_analysis
    .py:208-210), which ignores heading; ``rotate=True`` applies the body->
    world rotation by the current yaw."""
    x, y, yaw = pose_xyyaw[0], pose_xyyaw[1], pose_xyyaw[2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    vx_w = jnp.where(rotate, c * velocity[0] - s * velocity[1], velocity[0])
    vy_w = jnp.where(rotate, s * velocity[0] + c * velocity[1], velocity[1])
    return jnp.stack([x + vx_w * dt, y + vy_w * dt, yaw + yaw_rate * dt])


def transform_to_world_frame(traj: Trajectory,
                             world_position: jax.Array,
                             world_orientation_euler: jax.Array) -> Trajectory:
    """Rigidly move a body-frame trajectory into a world frame
    (pose_integration.py:222-269)."""
    q_w = geo.quat_from_euler_xyz(world_orientation_euler.astype(jnp.float32))
    new_pos = world_position[None, :] + geo.quat_rotate(
        jnp.broadcast_to(q_w, traj.quaternions.shape), traj.positions)
    new_q = geo.quat_multiply(jnp.broadcast_to(q_w, traj.quaternions.shape),
                              traj.quaternions)
    return traj._replace(positions=new_pos,
                         quaternions=new_q,
                         orientations=geo.quat_to_euler_xyz(new_q))
