"""Distributed Gauss-Newton for the pose graph (factor-sharded SPMD).

Two solvers, both SPMD over a 1-D device mesh with factors partitioned
across devices and the (small) pose vector replicated:

- :func:`gauss_newton_cg` -- GN with a preconditioned-CG inner solve.  Each
  device computes its factor block's contribution to the gradient and to
  Hessian-vector products; ``psum`` over ICI reduces them.  Handles arbitrary
  loop-closure topology.
- :func:`schur_block_solve` -- direct block elimination for one GN step:
  interior poses of each contiguous keyframe block are eliminated locally
  (dense solve), the reduced Schur system over the block-boundary poses is
  ``all_gather``-ed and solved redundantly on every device, then interiors
  back-substitute locally.  This is the keyframe-partitioned
  Schur-complement reduction BASELINE.json config 5 asks for.

Pose vectors are tiny (3 floats/keyframe) next to the radar data, so
replicating x and reducing factor contributions is the bandwidth-optimal
layout: per GN iteration each device moves O(N) floats over ICI.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from radar_slam_tpu.core.geometry import wrap_angle
from radar_slam_tpu.parallel.posegraph import (PoseGraph, factor_jacobians,
                                               factor_residuals, total_cost)


# ---------------------------------------------------------------------------
# Factor-block primitives (run per device on a factor slice)
# ---------------------------------------------------------------------------

def _block_gradient(poses, graph_slice: PoseGraph):
    """g = J^T W r accumulated into a full-length [N, 3] array."""
    r = factor_residuals(poses, graph_slice)
    Ji, Jj = factor_jacobians(poses, graph_slice)
    w = graph_slice.factor_valid[:, None] * graph_slice.info        # [M, 3]
    wr = w * r
    gi = jnp.einsum("mab,ma->mb", Ji, wr)
    gj = jnp.einsum("mab,ma->mb", Jj, wr)
    N = poses.shape[0]
    g = jnp.zeros((N, 3))
    g = g.at[graph_slice.fi].add(gi, mode="drop")
    g = g.at[graph_slice.fj].add(gj, mode="drop")
    return g


def _block_hvp(poses, graph_slice: PoseGraph, v):
    """(J^T W J) v accumulated into a full-length [N, 3] array."""
    Ji, Jj = factor_jacobians(poses, graph_slice)
    w = graph_slice.factor_valid[:, None] * graph_slice.info
    vi = v[graph_slice.fi]
    vj = v[graph_slice.fj]
    Jv = (jnp.einsum("mab,mb->ma", Ji, vi)
          + jnp.einsum("mab,mb->ma", Jj, vj))                       # [M, 3]
    wJv = w * Jv
    hi = jnp.einsum("mab,ma->mb", Ji, wJv)
    hj = jnp.einsum("mab,ma->mb", Jj, wJv)
    N = poses.shape[0]
    h = jnp.zeros((N, 3))
    h = h.at[graph_slice.fi].add(hi, mode="drop")
    h = h.at[graph_slice.fj].add(hj, mode="drop")
    return h


def _block_diag(poses, graph_slice: PoseGraph):
    """diag(J^T W J) for the Jacobi preconditioner."""
    Ji, Jj = factor_jacobians(poses, graph_slice)
    w = graph_slice.factor_valid[:, None] * graph_slice.info
    di = jnp.einsum("mab,ma,mab->mb", Ji, w, Ji)
    dj = jnp.einsum("mab,ma,mab->mb", Jj, w, Jj)
    N = poses.shape[0]
    d = jnp.zeros((N, 3))
    d = d.at[graph_slice.fi].add(di, mode="drop")
    d = d.at[graph_slice.fj].add(dj, mode="drop")
    return d


def _anchor_terms(poses, graph: PoseGraph):
    ra = poses[0] - graph.anchor
    ra = ra.at[2].set(wrap_angle(ra[2]))
    g = jnp.zeros_like(poses).at[0].add(graph.anchor_info * ra)
    return g


# ---------------------------------------------------------------------------
# Distributed GN + CG
# ---------------------------------------------------------------------------

def _slice_graph(graph: PoseGraph) -> PoseGraph:
    """Identity -- factor arrays are already the shard inside shard_map."""
    return graph


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis_name", "gn_iters",
                                    "cg_iters"))
def gauss_newton_cg(graph: PoseGraph, mesh: Optional[Mesh] = None,
                    axis_name: str = "f", gn_iters: int = 10,
                    cg_iters: int = 50, damping: float = 1e-6
                    ) -> Tuple[jax.Array, jax.Array]:
    """Distributed Gauss-Newton.  Returns (optimized poses [N, 3], cost).

    With ``mesh=None`` runs single-device (same code path, no collectives).
    """
    N = graph.poses.shape[0]

    def psum(x):
        return jax.lax.psum(x, axis_name) if mesh is not None else x

    def gn_body(poses, factor_slice):
        g = psum(_block_gradient(poses, factor_slice)) \
            + _anchor_terms(poses, factor_slice)
        diag = psum(_block_diag(poses, factor_slice))
        diag = diag.at[0].add(factor_slice.anchor_info)
        diag = diag + damping
        minv = 1.0 / diag

        anchor_mask = jnp.zeros((N, 3)).at[0].set(factor_slice.anchor_info)

        def hvp(v):
            return psum(_block_hvp(poses, factor_slice, v)) \
                + anchor_mask * v + damping * v

        # Preconditioned CG on H dx = -g.
        b = -g
        x = jnp.zeros_like(b)
        r = b
        z = minv * r
        p = r * minv

        def cg_step(carry, _):
            x, r, z, p = carry
            hp = hvp(p)
            rz = jnp.sum(r * z)
            alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-30)
            x2 = x + alpha * p
            r2 = r - alpha * hp
            z2 = minv * r2
            beta = jnp.sum(r2 * z2) / jnp.maximum(rz, 1e-30)
            return (x2, r2, z2, z2 + beta * p), None

        (dx, _, _, _), _ = jax.lax.scan(cg_step, (x, r, z, p), None,
                                        length=cg_iters)
        new_poses = poses + dx
        new_poses = new_poses.at[:, 2].set(wrap_angle(new_poses[:, 2]))
        return new_poses

    def run(factor_slice: PoseGraph):
        poses = factor_slice.poses
        poses = jax.lax.fori_loop(
            0, gn_iters, lambda _, p: gn_body(p, factor_slice), poses)
        return poses

    if mesh is None:
        poses = run(graph)
    else:
        fn = jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(PoseGraph(
                poses=P(), fi=P(axis_name), fj=P(axis_name),
                delta=P(axis_name), info=P(axis_name),
                factor_valid=P(axis_name), anchor=P(), anchor_info=P()),),
            out_specs=P(),
            check_vma=False)
        poses = fn(graph)

    return poses, total_cost(poses, graph)


# ---------------------------------------------------------------------------
# Schur-complement block elimination (chain topology)
# ---------------------------------------------------------------------------

def schur_gn_step(graph: PoseGraph, mesh: Mesh, axis_name: str = "f",
                  damping: float = 1e-5) -> jax.Array:
    """One GN step via keyframe-block Schur elimination.

    Poses are partitioned into contiguous blocks (one per device).  Each
    device assembles its local dense Hessian over (its poses + the first pose
    of the next block), eliminates its interior, and contributes a reduced
    system over the block-boundary poses; the boundary system (3 unknowns per
    device boundary) is all_gather-ed, solved redundantly, and interiors are
    back-substituted locally.  Chain factors only (loop slots must be empty).
    """
    N = graph.poses.shape[0]
    n_dev = mesh.devices.size
    assert N % n_dev == 0, "pad keyframes to a multiple of the mesh size"
    B = N // n_dev

    def body(poses, fi, fj, delta, info, valid, anchor, anchor_info):
        idx = jax.lax.axis_index(axis_name)
        # Local variables: B poses + the boundary pose of the next block.
        # Assemble dense H over 3*(B+1) unknowns from this device's factors.
        graph_slice = PoseGraph(poses=poses, fi=fi, fj=fj, delta=delta,
                                info=info, factor_valid=valid,
                                anchor=anchor, anchor_info=anchor_info)
        r = factor_residuals(poses, graph_slice)                 # [Mb, 3]
        Ji, Jj = factor_jacobians(poses, graph_slice)
        w = valid[:, None] * info

        # Local index of each factor endpoint within the (B+1)-pose window;
        # invalid (padding) factors are pushed out of bounds so every scatter
        # drops them (negative indices would wrap).
        base = idx * B
        li = jnp.where(valid, fi - base, B + 1)
        lj = jnp.where(valid, fj - base, B + 1)

        D = 3 * (B + 1)
        H = jnp.zeros((D, D))
        g = jnp.zeros(D)

        def scatter(H, g, J1, l1, J2, l2):
            # H[l1, l2] += J1^T W J2 for every factor (vectorized scatter).
            blocks = jnp.einsum("ma,mab,mac->mbc", w, J1, J2)    # [Mb, 3, 3]
            rows = (3 * l1[:, None] + jnp.arange(3)[None, :])    # [Mb, 3]
            cols = (3 * l2[:, None] + jnp.arange(3)[None, :])
            H = H.at[rows[:, :, None], cols[:, None, :]].add(
                blocks, mode="drop")
            return H

        H = scatter(H, g, Ji, li, Ji, li)
        H = scatter(H, g, Ji, li, Jj, lj)
        H = scatter(H, g, Jj, lj, Ji, li)
        H = scatter(H, g, Jj, lj, Jj, lj)
        wr = w * r
        gi = jnp.einsum("mab,ma->mb", Ji, wr)
        gj = jnp.einsum("mab,ma->mb", Jj, wr)
        rows_i = 3 * li[:, None] + jnp.arange(3)[None, :]
        rows_j = 3 * lj[:, None] + jnp.arange(3)[None, :]
        g = g.at[rows_i].add(gi, mode="drop")
        g = g.at[rows_j].add(gj, mode="drop")

        # Anchor on global pose 0 (device 0, local 0).
        anchor_w = jnp.where(idx == 0, 1.0, 0.0) * anchor_info
        ra = poses[0] - anchor
        ra = ra.at[2].set(wrap_angle(ra[2]))
        H = H.at[jnp.arange(3), jnp.arange(3)].add(anchor_w)
        g = g.at[:3].add(anchor_w * ra)

        H = H + damping * jnp.eye(D)

        # Boundary variables: local pose 0 (shared with previous device) and
        # local pose B (first pose of next block).  Interior: poses 1..B-1.
        sep = jnp.array([0, B])                                   # local ids
        bsel = (3 * sep[:, None] + jnp.arange(3)[None, :]).reshape(-1)
        isel = (3 * (1 + jnp.arange(B - 1))[:, None]
                + jnp.arange(3)[None, :]).reshape(-1)

        Hbb = H[bsel[:, None], bsel[None, :]]
        Hbi = H[bsel[:, None], isel[None, :]]
        Hii = H[isel[:, None], isel[None, :]]
        gb = g[bsel]
        gi_ = g[isel]

        Hii_inv_Hib = jnp.linalg.solve(Hii, Hbi.T)               # [I, 6]
        Hii_inv_gi = jnp.linalg.solve(Hii, gi_)
        S_local = Hbb - Hbi @ Hii_inv_Hib                        # [6, 6]
        y_local = gb - Hbi @ Hii_inv_gi                          # [6]

        # Global boundary system over n_dev+1 boundary poses: device d's
        # boundaries are global boundary ids (d, d+1).
        nb = n_dev + 1
        Sg = jnp.zeros((3 * nb, 3 * nb))
        yg = jnp.zeros(3 * nb)
        off = 3 * idx
        rows = off + jnp.arange(6)
        Sg = Sg.at[rows[:, None], rows[None, :]].add(S_local)
        yg = yg.at[rows].add(y_local)
        Sg = jax.lax.psum(Sg, axis_name)
        yg = jax.lax.psum(yg, axis_name)
        # The last boundary pose (global N, nonexistent) has no factors on
        # the final device's window beyond B... it corresponds to pose of
        # block n_dev which does not exist; regularize its (empty) rows.
        Sg = Sg + 1e-12 * jnp.eye(3 * nb)
        db = -jnp.linalg.solve(Sg, yg)                           # [3 nb]

        db_local = jax.lax.dynamic_slice(db, (off,), (6,))
        di = -Hii_inv_gi - Hii_inv_Hib @ db_local
        dx = jnp.zeros((B + 1, 3))
        dx = dx.at[0].set(db_local[:3])
        dx = dx.at[B].set(db_local[3:])
        dx = dx.at[1:B].set(di.reshape(B - 1, 3))

        local_poses = jax.lax.dynamic_slice_in_dim(poses, base, B, axis=0)
        return local_poses + dx[:B]

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(), P()),
        out_specs=P(axis_name),
        check_vma=False)
    new_poses = fn(graph.poses, graph.fi, graph.fj, graph.delta, graph.info,
                   graph.factor_valid, graph.anchor, graph.anchor_info)
    return new_poses.at[:, 2].set(wrap_angle(new_poses[:, 2]))
