"""Radar loop-closure detection + SE(2) scan matching.

New capability beyond the reference (which, despite the repo name, performs
no SLAM: velocities integrate open-loop and drift unboundedly,
``pose_integration.py``).  Here:

- per-frame radar detection sets double as sparse 2-D scan "point clouds";
- revisit candidates are keyframe pairs whose *estimated* poses are close
  but temporally distant;
- each candidate is verified and measured by a masked SE(2) ICP between the
  two detection sets (static shapes; ``lax.fori_loop`` iterations; batched
  over candidates with ``vmap``);
- accepted matches become loop-closure factors for the distributed
  pose-graph Gauss-Newton solver (``parallel/ba.py``).

The ICP solves the same rigid-registration subproblem as the evaluation
layer's Umeyama alignment, restricted to SE(2) with nearest-neighbour
correspondence under a gate.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LoopClosureConfig:
    revisit_radius: float = 5.0       # candidate gate on estimated poses [m]
    min_separation: int = 20          # frames between keyframes
    icp_iters: int = 8
    match_gate: float = 2.0           # NN correspondence gate [m]
    min_inliers: int = 8
    max_rmse: float = 0.7             # accept threshold on matched RMSE [m]
    max_candidates: int = 16          # static candidate budget
    info_scale: float = 200.0         # factor information per accepted loop
    # Odometry-consistency gate for descriptor-retrieved loops (geometry
    # alone cannot reject perceptual aliasing: a corridor whose wall
    # pattern repeats every T metres yields point clouds that genuinely
    # align, so ICP passes).  A loop is rejected when its ICP delta
    # disagrees with the odometry-integrated relative pose by more than
    # ``odo_gate_abs + odo_gate_frac * path_length(i..j)``: genuine drift
    # disagrees by the accumulated error (~5-15% of the path in the
    # calibration scenes, scripts/characterize_scancontext.py), while an
    # aliased match claims a revisit across a full pattern period -- a
    # ~100% disagreement.
    odo_gate_frac: float = 0.35
    odo_gate_abs: float = 2.0


def _se2_apply(pose: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply pose (x, y, yaw) to points [K, 2]."""
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    R = jnp.array([[c, -s], [s, c]])
    return pts @ R.T + pose[:2]


def _se2_fit(src: jax.Array, dst: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted rigid SE(2) fit dst ~= R src + t (2-D Umeyama, no scale)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    sc = (src - mu_s) * w[:, None]
    dc = dst - mu_d
    # H = sc^T dc ; SE(2) rotation angle from the 2x2 cross-covariance.
    h00 = jnp.sum(sc[:, 0] * dc[:, 0])
    h01 = jnp.sum(sc[:, 0] * dc[:, 1])
    h10 = jnp.sum(sc[:, 1] * dc[:, 0])
    h11 = jnp.sum(sc[:, 1] * dc[:, 1])
    yaw = jnp.arctan2(h01 - h10, h00 + h11)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    t = mu_d - jnp.array([c * mu_s[0] - s * mu_s[1],
                          s * mu_s[0] + c * mu_s[1]])
    return jnp.array([t[0], t[1], yaw])


def icp_se2(src_pts: jax.Array, src_valid: jax.Array,
            dst_pts: jax.Array, dst_valid: jax.Array,
            init: jax.Array, iters: int = 8,
            gate: float = 2.0) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Masked point-to-point SE(2) ICP.

    Args:
        src_pts / dst_pts: [K, 2] body-frame detection positions.
        init: initial relative pose (x, y, yaw) mapping src into dst frame.

    Returns:
        (pose [3], rmse scalar, n_inliers scalar).
    """
    BIG = jnp.float32(1e9)

    def body(_, pose):
        moved = _se2_apply(pose, src_pts)                    # [K, 2]
        d2 = jnp.sum((moved[:, None, :] - dst_pts[None, :, :]) ** 2, -1)
        d2 = jnp.where(src_valid[:, None] & dst_valid[None, :], d2, BIG)
        j = jnp.argmin(d2, axis=1)
        dmin = jnp.sqrt(jnp.take_along_axis(d2, j[:, None], 1)[:, 0])
        w = (src_valid & (dmin < gate)).astype(jnp.float32)
        return _se2_fit(src_pts, dst_pts[j], w)

    pose = jax.lax.fori_loop(0, iters, body, init)

    moved = _se2_apply(pose, src_pts)
    d2 = jnp.sum((moved[:, None, :] - dst_pts[None, :, :]) ** 2, -1)
    d2 = jnp.where(src_valid[:, None] & dst_valid[None, :], d2, BIG)
    dmin = jnp.sqrt(jnp.min(d2, axis=1))
    inlier = src_valid & (dmin < gate)
    n = jnp.sum(inlier)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inlier, dmin ** 2, 0.0))
                    / jnp.maximum(n, 1))
    return pose, rmse, n


def _relative_pose(pi: np.ndarray, pj: np.ndarray) -> np.ndarray:
    """Pose of frame j expressed in frame i (host helper)."""
    c, s = np.cos(pi[2]), np.sin(pi[2])
    dx, dy = pj[0] - pi[0], pj[1] - pi[1]
    return np.array([c * dx + s * dy, -s * dx + c * dy, pj[2] - pi[2]])


def find_loop_closures(points: jax.Array, valid: jax.Array,
                       poses: np.ndarray,
                       cfg: LoopClosureConfig = LoopClosureConfig()
                       ) -> List[dict]:
    """Detect and verify loop closures over a sequence.

    Args:
        points: [F, K, 2] per-frame detection positions (body frame).
        valid: [F, K] masks.
        poses: [F, 3] current (drifty) pose estimates, host numpy.

    Returns:
        list of dicts {i, j, delta, rmse, inliers} with delta = pose of
        frame j in frame i, ready for
        ``posegraph.add_loop_closure(graph, slot, i, j, delta, info)``.
    """
    poses = np.asarray(poses)
    F = len(poses)
    # Candidate pairs: close in space, far in time; keep the closest i per
    # query j, budgeted.  One [F, F] distance matrix (vectorized host
    # numpy; this path is O(F^2) memory by design -- the scan-context
    # proposer in ``parallel/scancontext.py`` is the scalable alternative).
    d = np.linalg.norm(poses[None, :, :2] - poses[:, None, :2], axis=-1)
    i_idx = np.arange(F)[None, :]
    j_idx = np.arange(F)[:, None]
    # Temporal gate convention: pairs with j - i >= min_separation are
    # admitted (same >= convention as scancontext._stage1_candidates).
    d = np.where(i_idx <= j_idx - cfg.min_separation, d, np.inf)
    best_i = np.argmin(d, axis=1)
    best_d = d[np.arange(F), best_i]
    js = np.nonzero(best_d < cfg.revisit_radius)[0]
    cands = [(int(best_i[j]), int(j)) for j in js[:cfg.max_candidates]]
    if not cands:
        return []

    ii = np.array([c[0] for c in cands])
    jj = np.array([c[1] for c in cands])
    init = np.stack([_relative_pose(poses[a], poses[b])
                     for a, b in cands]).astype(np.float32)

    run = jax.jit(jax.vmap(
        lambda s, sv, d, dv, x0: icp_se2(
            s, sv, d, dv, x0, iters=cfg.icp_iters, gate=cfg.match_gate)))
    # ICP maps j-frame points into the i frame: delta = T_i^-1 T_j.
    deltas, rmses, inliers = run(points[jj], valid[jj], points[ii],
                                 valid[ii], jnp.asarray(init))
    deltas = np.asarray(deltas)
    rmses = np.asarray(rmses)
    inliers = np.asarray(inliers)

    out = []
    for k in range(len(cands)):
        if inliers[k] >= cfg.min_inliers and rmses[k] <= cfg.max_rmse:
            out.append({"i": int(ii[k]), "j": int(jj[k]),
                        "delta": deltas[k], "rmse": float(rmses[k]),
                        "inliers": int(inliers[k])})
    return out
