"""Geometry primitives: ULA steering vectors, direction vectors, SO(3) utils.

Pure-JAX (jit/vmap friendly, static shapes).  The rotation helpers replace the
reference's ``scipy.spatial.transform.Rotation`` usage
(``src/pose_integration/pose_integration.py:139-165``) with quaternion
composition that works inside ``lax.scan``.

Conventions:
- Quaternions are (w, x, y, z), unit norm, Hamilton convention.
- Euler angles are intrinsic 'xyz' (roll, pitch, yaw), matching
  ``Rotation.as_euler('xyz')`` in the reference.
- The ULA lies on the y-axis-free 1-D array with element n at position
  n * spacing; steering phase for azimuth az is
  2 pi n d sin(az) / lambda (simulate_raw.py:142, angle_estimation.py:105).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Angles
# --------------------------------------------------------------------------

def wrap_angle(theta: jax.Array) -> jax.Array:
    """Wrap angle(s) to (-pi, pi] (velocity_solver_improved.py:255 idiom)."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


# --------------------------------------------------------------------------
# Array / steering geometry
# --------------------------------------------------------------------------

def antenna_positions(num_antennas: int, spacing: float) -> jax.Array:
    """ULA element positions [A] (simulate_raw.py:79)."""
    return jnp.arange(num_antennas, dtype=jnp.float32) * spacing


def steering_vector(azimuth_rad: jax.Array, num_antennas: int, spacing: float,
                    lambda_c: float) -> jax.Array:
    """Steering vector(s) for azimuth(s).

    a_n(az) = exp(j 2 pi n d sin(az) / lambda)  (angle_estimation.py:102-107).

    Args:
        azimuth_rad: scalar or [...] array of azimuths [rad].
    Returns:
        complex64 array [..., A].
    """
    pos = antenna_positions(num_antennas, spacing)                  # [A]
    phase = (2.0 * jnp.pi / lambda_c) * jnp.sin(
        jnp.asarray(azimuth_rad, jnp.float32))[..., None] * pos     # [..., A]
    return jnp.exp(1j * phase.astype(jnp.float32)).astype(jnp.complex64)


def steering_matrix(grid_rad: jax.Array, num_antennas: int, spacing: float,
                    lambda_c: float) -> jax.Array:
    """Steering matrix over an angle grid: [G, A] complex64."""
    return steering_vector(grid_rad, num_antennas, spacing, lambda_c)


def ura_steering_vector(azimuth_rad: jax.Array, elevation_rad: jax.Array,
                        num_az: int, num_el: int,
                        spacing_az: float, spacing_el: float,
                        lambda_c: float) -> jax.Array:
    """Steering vector(s) for a planar (URA) array, flattened row-major
    [el, az] along the antenna axis.

    Array plane is y (azimuth columns) x z (elevation rows); for unit LOS
    u = [cos el cos az, cos el sin az, sin el] element (m, n) sees phase
    2 pi (n d_az u_y + m d_el u_z) / lambda.  For num_el = 1 this reduces
    exactly to the ULA :func:`steering_vector`.

    Returns complex64 [..., num_el * num_az]."""
    az = jnp.asarray(azimuth_rad, jnp.float32)
    el = jnp.asarray(elevation_rad, jnp.float32)
    u_y = jnp.cos(el) * jnp.sin(az)                                # [...]
    u_z = jnp.sin(el)
    pos_az = jnp.arange(num_az, dtype=jnp.float32) * spacing_az    # [Naz]
    pos_el = jnp.arange(num_el, dtype=jnp.float32) * spacing_el    # [Nel]
    phase = (2.0 * jnp.pi / lambda_c) * (
        u_y[..., None, None] * pos_az[None, :]
        + u_z[..., None, None] * pos_el[:, None])                  # [...,Nel,Naz]
    flat = phase.reshape(phase.shape[:-2] + (num_el * num_az,))
    return jnp.exp(1j * flat.astype(jnp.float32)).astype(jnp.complex64)


def direction_vector(azimuth_rad: jax.Array,
                     elevation_rad: jax.Array) -> jax.Array:
    """Unit line-of-sight direction(s) [..., 3]:
    [cos el cos az, cos el sin az, sin el] (velocity_solver.py:94-98)."""
    az = jnp.asarray(azimuth_rad, jnp.float32)
    el = jnp.asarray(elevation_rad, jnp.float32)
    return jnp.stack([jnp.cos(el) * jnp.cos(az),
                      jnp.cos(el) * jnp.sin(az),
                      jnp.sin(el)], axis=-1)


def polar_to_cartesian(range_m: jax.Array, azimuth_rad: jax.Array,
                       elevation_rad: jax.Array | float = 0.0) -> jax.Array:
    """Target position(s) [..., 3] from polar detection coordinates."""
    el = jnp.zeros_like(jnp.asarray(range_m, jnp.float32)) + elevation_rad
    return jnp.asarray(range_m, jnp.float32)[..., None] * direction_vector(
        azimuth_rad, el)


# --------------------------------------------------------------------------
# SO(3): quaternions, rotation matrices, Euler angles
# --------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 * q2; supports batched leading dims."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_from_axis_angle(rotvec: jax.Array) -> jax.Array:
    """Quaternion from rotation vector(s) [..., 3] (axis * angle).

    Numerically stable at ||rotvec|| -> 0 via the sinc expansion; replaces the
    reference's explicit omega_mag > 1e-12 branch (pose_integration.py:146-165)
    with branch-free math usable inside lax.scan.
    """
    angle = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(half)/angle, stable near zero: 0.5 * sinc(half/pi)
    k = 0.5 * jnp.sinc(half / jnp.pi)
    w = jnp.cos(half)
    xyz = rotvec * k
    return jnp.concatenate([w, xyz], axis=-1)


def quat_to_rotvec(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Rotation vector from quaternion(s); angle in [0, pi]."""
    q = quat_normalize(q)
    # Force w >= 0 for the short rotation.
    sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)
    q = q * sign
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm[..., 0], w)
    scale = jnp.where(norm > eps, angle[..., None] / jnp.maximum(norm, eps), 2.0)
    return xyz * scale


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] from quaternion(s)."""
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(r.shape[:-1] + (3, 3))


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Quaternion from rotation matrix [..., 3, 3] (branch-free Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    c0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    c1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    c2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    c3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], axis=-1)

    cond0 = tr > 0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(cond0[..., None], c0,
                  jnp.where(cond1[..., None], c1,
                            jnp.where(cond2[..., None], c2, c3)))
    return quat_normalize(q)


def quat_from_euler_xyz(euler: jax.Array) -> jax.Array:
    """Quaternion from intrinsic-xyz Euler angles [..., 3] (roll, pitch, yaw).

    Intrinsic xyz: R = Rx(roll) @ Ry(pitch) @ Rz(yaw) -> q = qx * qy * qz.
    """
    half = 0.5 * euler
    cr, cp, cy = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sr, sp, sy = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    return jnp.stack([
        cr * cp * cy - sr * sp * sy,
        sr * cp * cy + cr * sp * sy,
        cr * sp * cy - sr * cp * sy,
        cr * cp * sy + sr * sp * cy,
    ], axis=-1)


def quat_to_euler_xyz(q: jax.Array) -> jax.Array:
    """Intrinsic-xyz (roll, pitch, yaw) Euler angles from quaternion(s).

    Matches scipy Rotation.as_euler('xyz') used at pose_integration.py:161.
    """
    R = quat_to_matrix(q)
    # R = Rx(a) Ry(b) Rz(c) (intrinsic xyz):
    #   R[0,2] = sin(b); R[0,1] = -cos(b) sin(c); R[0,0] = cos(b) cos(c)
    #   R[1,2] = -sin(a) cos(b); R[2,2] = cos(a) cos(b)
    pitch = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    roll = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    yaw = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v [..., 3] by quaternion(s) q [..., 4]."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    return quat_multiply(quat_multiply(q, qv), quat_conjugate(q))[..., 1:]
