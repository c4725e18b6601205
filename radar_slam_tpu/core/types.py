"""Static-shape pytree types flowing between pipeline stages.

The reference's inter-stage contract is Python lists of per-target dicts
(``angle_estimation.py:289-300``, ``velocity_solver_improved.py:119-126``);
here every stage exchanges fixed-shape arrays with validity masks so the whole
pipeline traces into a single XLA program.  NamedTuples register as JAX
pytrees automatically.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class ScattererBatch(NamedTuple):
    """Padded scatterer set for one frame+sensor (loader output).

    Mirrors the reference scatterer DataFrame columns
    (radarscenes_loader.py:245-252).  ``elevation_rad`` is None for
    azimuth-only sources (RadarScenes has no elevation; the reference is
    ULA-only), or [S] elevations for URA synthesis."""

    range_m: jax.Array      # [S] float32
    azimuth_rad: jax.Array  # [S] float32
    rcs_db: jax.Array       # [S] float32
    vr: jax.Array           # [S] float32, radial velocity (range rate) [m/s]
    valid: jax.Array        # [S] bool
    elevation_rad: Optional[jax.Array] = None  # [S] float32 or None

    @property
    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid)


class Detections(NamedTuple):
    """Top-K range-Doppler detections (static shape, masked).

    Replaces the reference's variable-length peak dict list
    (dechirp.py:264-271)."""

    range_bin: jax.Array    # [K] int32
    doppler_bin: jax.Array  # [K] int32
    range_m: jax.Array      # [K] float32
    doppler_hz: jax.Array   # [K] float32
    vr_mps: jax.Array       # [K] float32, radial velocity implied by Doppler
    power_db: jax.Array     # [K] float32
    valid: jax.Array        # [K] bool

    @property
    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid)


class Targets(NamedTuple):
    """Detections augmented with AoA estimates + quality metrics.

    Mirrors the reference "target" record (angle_estimation.py:289-300,
    robust_angle_estimation.py:387-399)."""

    range_bin: jax.Array          # [K] int32
    doppler_bin: jax.Array        # [K] int32
    range_m: jax.Array            # [K] float32
    doppler_hz: jax.Array         # [K] float32
    vr_mps: jax.Array             # [K] float32
    power_db: jax.Array           # [K] float32
    azimuth_rad: jax.Array        # [K] float32
    confidence: jax.Array         # [K] float32
    num_sources: jax.Array        # [K] int32 (MDL model order)
    is_multipath: jax.Array       # [K] bool
    is_reliable: jax.Array        # [K] bool
    spatial_signature: jax.Array  # [K, A] complex64, unit power
    valid: jax.Array              # [K] bool
    # Elevation estimates (URA arrays only; None when azimuth-only).
    elevation_rad: Optional[jax.Array] = None  # [K] float32 or None

    @property
    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid)

    @property
    def position(self) -> jax.Array:
        """Cartesian positions [K, 3] (el = 0 when azimuth-only)."""
        if self.elevation_rad is None:
            z = jnp.zeros_like(self.range_m)
            ce = 1.0
        else:
            z = self.range_m * jnp.sin(self.elevation_rad)
            ce = jnp.cos(self.elevation_rad)
        return jnp.stack([ce * self.range_m * jnp.cos(self.azimuth_rad),
                          ce * self.range_m * jnp.sin(self.azimuth_rad), z],
                         axis=-1)


class Associations(NamedTuple):
    """Cross-frame target associations (static shape, masked).

    For each current target k: prev_index[k] is the matched previous-frame
    target (or arbitrary when ~valid[k]).  Replaces the reference association
    dict list (velocity_solver_improved.py:119-126)."""

    prev_index: jax.Array           # [K] int32
    distance: jax.Array             # [K] float32 match distance
    temporal_phase_diff: jax.Array  # [K] float32, angle(s_t[0] conj(s_{t-1}[0]))
    # Geometry of the *current* target (solver inputs):
    position: jax.Array             # [K, 3] float32
    direction: jax.Array            # [K, 3] float32 unit LOS
    vr_mps: jax.Array               # [K] float32 Doppler radial velocity
    apparent_velocity: jax.Array    # [K, 3] float32 (pos_t - pos_{t-1}) / dt
    weight: jax.Array               # [K] float32 (confidence-derived)
    valid: jax.Array                # [K] bool

    @property
    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid)


class MotionEstimate(NamedTuple):
    """One frame's 6-DoF motion solve result (velocity_solver.py:286-299)."""

    velocity: jax.Array          # [3] float32 (vx, vy, vz)
    angular_velocity: jax.Array  # [3] float32 (wx, wy, wz)
    rmse: jax.Array              # scalar phase-residual RMSE [rad]
    max_residual: jax.Array      # scalar
    num_targets: jax.Array       # scalar int32
    success: jax.Array           # scalar bool
    cost: jax.Array              # scalar final cost

    @property
    def params(self) -> jax.Array:
        return jnp.concatenate([self.velocity, self.angular_velocity])


class Trajectory(NamedTuple):
    """Integrated pose trajectory (pose_integration.py:202-213)."""

    timestamps: jax.Array          # [N] float64/float32 seconds
    positions: jax.Array           # [N, 3]
    orientations: jax.Array        # [N, 3] Euler xyz (roll, pitch, yaw)
    quaternions: jax.Array         # [N, 4] (w, x, y, z)
    velocities: jax.Array          # [N, 3]
    angular_velocities: jax.Array  # [N, 3]

    @property
    def rotations(self) -> jax.Array:
        from radar_slam_tpu.core import geometry
        return geometry.quat_to_matrix(self.quaternions)

    @property
    def total_distance(self) -> jax.Array:
        steps = jnp.diff(self.positions, axis=0)
        return jnp.sum(jnp.linalg.norm(steps, axis=-1))

    @property
    def duration(self) -> jax.Array:
        return self.timestamps[-1] - self.timestamps[0]


def pad_to(x: jax.Array, size: int, axis: int = 0, fill=0) -> jax.Array:
    """Pad/truncate ``x`` to ``size`` along ``axis`` (host-side helper)."""
    n = x.shape[axis]
    if n == size:
        return x
    if n > size:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, size)
        return x[tuple(sl)]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, size - n)
    return jnp.pad(x, pad, constant_values=fill)
