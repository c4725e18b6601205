"""Frame-parallel SPMD pipeline over a device mesh.

The sequence pipeline has one cross-frame dependency per stage boundary
(association needs the previous frame's targets; the pose is a prefix sum of
per-frame increments).  Sharding the frame axis into contiguous blocks makes
both distributable:

- each device runs detection + AoA for its block independently (vmap);
- a single ``ppermute`` halo exchange ships each block's LAST frame targets
  to the next device, so every frame can associate against its predecessor;
- the planar pose is a distributed prefix sum: local cumulative yaw /
  displacement + ``all_gather`` of per-block totals -> exclusive prefix
  offsets (the standard scan decomposition over ICI).

Temporal angle smoothing is per-block (tracks reset at block boundaries);
with blocks of tens of frames and a window of 3-5 this only perturbs the
first frames of each block, and single-device results are recovered exactly
with ``n_devices=1`` -- asserted in tests.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radar_slam_tpu.aoa import robust as aoa_robust
from radar_slam_tpu.aoa import smoothing
from radar_slam_tpu.core.config import PipelineConfig
from radar_slam_tpu.core.types import Targets
from radar_slam_tpu.motion.associate import associate_targets
from radar_slam_tpu.motion.velocity import solve_velocity
from radar_slam_tpu.signal.detect import detect_peaks
from radar_slam_tpu.signal.rds import range_doppler_spectrum


def _frame_targets_scan(signals_block: jax.Array, cfg: PipelineConfig
                        ) -> Targets:
    """Per-block detection + robust AoA with a local smoother scan."""
    def step(sm_state, sig):
        rds = range_doppler_spectrum(sig, cfg.radar, window=cfg.window,
                                     chirp_subset=cfg.chirp_subset,
                                     doppler_window=cfg.doppler_window,
                                     fft_mode=cfg.fft_mode,
                                     dft_precision=cfg.dft_precision)
        det = detect_peaks(rds, cfg.radar, cfg.detection)
        targets, sm_state = aoa_robust.process_targets_robust(
            rds, det, sm_state, cfg.radar, cfg.aoa, method=cfg.aoa.method)
        return sm_state, targets

    _, targets = jax.lax.scan(step, smoothing.init_state(cfg.aoa),
                              signals_block)
    return targets


def _block_body(signals_block: jax.Array, cfg: PipelineConfig,
                axis_name: str) -> dict:
    """shard_map body: one contiguous frame block per device."""
    B = signals_block.shape[0]
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    dt = jnp.float32(cfg.frame_dt)

    targets = _frame_targets_scan(signals_block, cfg)           # [B, ...]

    # Halo exchange: last frame of block d -> device d+1 as its "previous".
    last = jax.tree.map(lambda x: x[-1], targets)
    perm = [(i, i + 1) for i in range(n_dev - 1)]
    halo = jax.tree.map(
        lambda x: jax.lax.ppermute(x[None], axis_name, perm)[0], last)
    halo_valid = idx > 0
    halo = halo._replace(valid=halo.valid & halo_valid,
                         is_reliable=halo.is_reliable & halo_valid)

    prev = jax.tree.map(
        lambda h, t: jnp.concatenate([h[None], t[:-1]], axis=0), halo, targets)

    # Per-frame association + velocity solve (vmap over the block).
    def solve_one(cur, prv):
        assoc = associate_targets(cur, prv, dt, cfg.velocity)
        return solve_velocity(assoc, dt, cfg.radar.lambda_c, cfg.velocity,
                              v_unambiguous=cfg.radar.max_unambiguous_velocity)

    motion = jax.vmap(solve_one)(targets, prev)                 # [B, ...]

    # Distributed planar pose prefix-sum.
    wz = jnp.where(motion.success, motion.angular_velocity[:, 2], 0.0)
    dyaw = wz * dt                                              # [B]
    local_yaw_total = jnp.sum(dyaw)
    yaw_totals = jax.lax.all_gather(local_yaw_total, axis_name)  # [n_dev]
    yaw_offset = jnp.sum(jnp.where(jnp.arange(n_dev) < idx, yaw_totals, 0.0))
    yaw_after = yaw_offset + jnp.cumsum(dyaw)                   # yaw after frame
    yaw_before = yaw_after - dyaw

    v = jnp.where(motion.success[:, None], motion.velocity[:, :2], 0.0)
    c, s = jnp.cos(yaw_before), jnp.sin(yaw_before)
    step_xy = jnp.stack([c * v[:, 0] - s * v[:, 1],
                         s * v[:, 0] + c * v[:, 1]], axis=-1) * dt
    local_xy_total = jnp.sum(step_xy, axis=0)
    xy_totals = jax.lax.all_gather(local_xy_total, axis_name)    # [n_dev, 2]
    xy_offset = jnp.sum(jnp.where((jnp.arange(n_dev) < idx)[:, None],
                                  xy_totals, 0.0), axis=0)
    xy_after = xy_offset[None, :] + jnp.cumsum(step_xy, axis=0)

    pose = jnp.concatenate([xy_after, yaw_after[:, None]], axis=-1)
    return {
        "velocity": motion.velocity,
        "angular_velocity": motion.angular_velocity,
        "success": motion.success,
        "rmse": motion.rmse,
        "pose": pose,
        "num_associations": motion.num_targets,
    }


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis_name"))
def process_frames_dp(signals: jax.Array, cfg: PipelineConfig, mesh: Mesh,
                      axis_name: str = "f") -> dict:
    """Run the full per-frame pipeline frame-parallel over the mesh.

    Args:
        signals: [F, A, C, S] baseband cubes; F must divide evenly by the
            mesh size (pad upstream).

    Returns dict of per-frame outputs [F, ...] (fully replicated layout
    follows from the out_specs sharding on the frame axis).
    """
    body = functools.partial(_block_body, cfg=cfg, axis_name=axis_name)
    fn = jax.shard_map(body, mesh=mesh, in_specs=P(axis_name),
                       out_specs=P(axis_name), check_vma=False)
    return fn(signals)


def approximately_equal_to_scan(dp_out: dict, scan_out, atol=1e-3) -> bool:
    """Debug helper: compare dp outputs with the sequential scan driver."""
    import numpy as np
    a = np.asarray(dp_out["pose"])
    b = np.asarray(scan_out.pose)
    return bool(np.allclose(a, b, atol=atol))
