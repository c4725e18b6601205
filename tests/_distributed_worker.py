"""Worker process for the two-process ``jax.distributed`` smoke test
(``tests/test_distributed.py``).  Not collected by pytest (leading
underscore); launched as ``python _distributed_worker.py <coord> <nproc>
<pid>``.

Each process owns 2 virtual CPU devices (4 global).  Exercises the branches
no single-process test can reach: ``parallel.distributed.initialize`` with
process_count > 1, a cross-process psum, and one frame-parallel
``process_frames_dp`` step over a global mesh spanning both processes.
"""

import os
import sys

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from radar_slam_tpu.parallel import distributed  # noqa: E402

topo = distributed.initialize(coordinator_address=coord,
                              num_processes=nproc, process_id=pid)
assert topo["process_count"] == nproc, topo
assert topo["global_devices"] == 2 * nproc, topo
assert distributed.is_multihost()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

mesh = Mesh(np.array(jax.devices()), ("f",))

# --- cross-process psum over all 4 global devices ---------------------------
def body(x):
    return jax.lax.psum(x, "f")

fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P("f"), out_specs=P()))
local = np.arange(1, 3, dtype=np.float32) + 2 * pid        # this process: 2
glob = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("f")), local, global_shape=(2 * nproc,))
total = float(np.asarray(jax.device_get(fn(glob))[0]))
want = float(np.arange(1, 2 * nproc + 1).sum())
assert total == want, (total, want)

# --- one frame-parallel pipeline step across both processes -----------------
from radar_slam_tpu.core.config import (AoAConfig, DetectionConfig,  # noqa: E402
                                        PipelineConfig, RadarConfig,
                                        VelocityConfig)
from radar_slam_tpu.parallel import dp  # noqa: E402

cfg = PipelineConfig(
    radar=RadarConfig(chirp_duration=3.2e-6, num_chirps=8, noise_power=1e-6),
    detection=DetectionConfig(threshold_db=-25.0, max_detections=8),
    aoa=AoAConfig(search_resolution_deg=5.0, max_targets=8,
                  track_capacity=16),
    velocity=VelocityConfig(gn_iterations=2),
)
A, C, S = 8, 8, cfg.radar.samples_per_chirp
F = 2 * 2 * nproc                       # 2 frames per device
rng = np.random.default_rng(0)          # identical on both processes
sig_np = (rng.standard_normal((F, A, C, S)).astype(np.float32)
          + 1j * rng.standard_normal((F, A, C, S)).astype(np.float32)
          ).astype(np.complex64)
B = F // (2 * nproc)
local_frames = sig_np[pid * 2 * B:(pid + 1) * 2 * B]
signals = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("f")), local_frames, global_shape=sig_np.shape)

out = dp.process_frames_dp(signals, cfg, mesh)
jax.block_until_ready(out)
pose_local = np.asarray(
    [s.data for s in out["pose"].addressable_shards][0])
assert np.isfinite(pose_local).all()

# --- pose-graph solvers across both processes (VERDICT round-2 item 5) ------
# The collectives-densest programs (psum-reduced gradients/HVPs in GN-CG,
# psum-reduced boundary Schur system + Woodbury products in schur_gn_step)
# run over the 4-device global mesh; every process checks the result against
# the single-device / dense reference it computes locally.
from radar_slam_tpu.parallel import ba, posegraph  # noqa: E402

n_dev = 2 * nproc


def noisy_chain(n, loop_capacity, drift=0.05, seed=7):
    rng = np.random.default_rng(seed)          # identical on both processes
    v = np.tile(np.array([5.0, 0.0, 0.0]), (n - 1, 1)).astype(np.float32)
    wz = np.full(n - 1, 0.1, np.float32)
    g = posegraph.from_velocities(
        jnp.asarray(v), jnp.asarray(wz), jnp.ones(n - 1, bool), dt=0.1,
        loop_capacity=loop_capacity)
    noisy = np.asarray(g.poses) + rng.normal(0, drift, (n, 3))
    return g._replace(poses=jnp.asarray(noisy.astype(np.float32)))


# GN-CG: 17 poses, 16 chain + 4 loop slots = 20 factors (5 per device), one
# active closure.
g_cg = noisy_chain(17, loop_capacity=4)
g_cg = posegraph.add_loop_closure(
    g_cg, slot=0, i=2, j=14, delta=jnp.array([0.4, 0.1, 0.02]),
    info=jnp.array([1e4, 1e4, 1e4]))
p_ref, c_ref = ba.gauss_newton_cg(g_cg, mesh=None, gn_iters=5, cg_iters=40)
p_dist, c_dist = ba.gauss_newton_cg(g_cg, mesh=mesh, gn_iters=5, cg_iters=40)
jax.block_until_ready(p_dist)
np.testing.assert_allclose(np.asarray(jax.device_get(p_dist)),
                           np.asarray(p_ref), atol=1e-3)
assert abs(float(c_dist) - float(c_ref)) < 1e-3 * max(float(c_ref), 1.0)

# Schur + Woodbury: 16 poses (4 per device), 15 chain + 1 loop factor; ONE
# step must equal the exact dense damped-GN step.
damping = 1e-5
g_s = noisy_chain(16, loop_capacity=1)
g_s = posegraph.add_loop_closure(
    g_s, slot=0, i=2, j=13, delta=jnp.array([0.3, -0.1, 0.04]),
    info=jnp.array([5e3, 5e3, 5e3]))
N_s = g_s.poses.shape[0]
g_grad = np.asarray(ba._block_gradient(g_s.poses, g_s)
                    + ba._anchor_terms(g_s.poses, g_s)).reshape(-1)
H = np.zeros((3 * N_s, 3 * N_s))
for k in range(3 * N_s):
    e = jnp.zeros((N_s, 3)).at[k // 3, k % 3].set(1.0)
    H[:, k] = np.asarray(ba._block_hvp(g_s.poses, g_s, e)).reshape(-1)
H[np.arange(3), np.arange(3)] += np.asarray(g_s.anchor_info)
H += damping * np.eye(3 * N_s)
dense = np.asarray(g_s.poses) - np.linalg.solve(H, g_grad).reshape(N_s, 3)
dense[:, 2] = np.arctan2(np.sin(dense[:, 2]), np.cos(dense[:, 2]))

schur = ba.schur_gn_step(g_s, mesh, damping=damping)
jax.block_until_ready(schur)
B_s = N_s // n_dev
for s in schur.addressable_shards:          # this process's pose rows only
    start = s.index[0].start or 0
    np.testing.assert_allclose(np.asarray(s.data),
                               dense[start:start + B_s], atol=2e-3)

# --- z-aware (x, y, z, yaw) graph across processes (VERDICT r04 item 8) -----
def noisy_chain_z(n, loop_capacity, drift=0.05, seed=11):
    rng = np.random.default_rng(seed)          # identical on both processes
    v = np.tile(np.array([5.0, 0.0, 0.3]), (n - 1, 1)).astype(np.float32)
    wz = np.full(n - 1, 0.1, np.float32)
    g = posegraph.from_velocities(
        jnp.asarray(v), jnp.asarray(wz), jnp.ones(n - 1, bool), dt=0.1,
        loop_capacity=loop_capacity, use_z=True)
    noisy = np.asarray(g.poses) + rng.normal(0, drift, (n, 4))
    return g._replace(poses=jnp.asarray(noisy.astype(np.float32)))


g_z = noisy_chain_z(17, loop_capacity=4)
g_z = posegraph.add_loop_closure(
    g_z, slot=0, i=2, j=14, delta=jnp.array([0.4, 0.1, 0.03, 0.02]),
    info=jnp.full(4, 1e4))
pz_ref, cz_ref = ba.gauss_newton_cg(g_z, mesh=None, gn_iters=5, cg_iters=40)
pz_dist, cz_dist = ba.gauss_newton_cg(g_z, mesh=mesh, gn_iters=5,
                                      cg_iters=40)
jax.block_until_ready(pz_dist)
np.testing.assert_allclose(np.asarray(jax.device_get(pz_dist)),
                           np.asarray(pz_ref), atol=1e-3)

# One z-aware Schur step must equal the locally computed dense damped-GN
# step (same check as the planar one above; the result is sharded across
# processes, so compare this process's addressable rows only).
g_zs = noisy_chain_z(16, loop_capacity=1)
N_z = g_zs.poses.shape[0]
gz_grad = np.asarray(ba._block_gradient(g_zs.poses, g_zs)
                     + ba._anchor_terms(g_zs.poses, g_zs)).reshape(-1)
Hz = np.zeros((4 * N_z, 4 * N_z))
for k in range(4 * N_z):
    e = jnp.zeros((N_z, 4)).at[k // 4, k % 4].set(1.0)
    Hz[:, k] = np.asarray(ba._block_hvp(g_zs.poses, g_zs, e)).reshape(-1)
Hz[np.arange(4), np.arange(4)] += np.asarray(g_zs.anchor_info)
Hz += damping * np.eye(4 * N_z)
dense_z = np.asarray(g_zs.poses) - np.linalg.solve(
    Hz, gz_grad).reshape(N_z, 4)
dense_z[:, 3] = np.arctan2(np.sin(dense_z[:, 3]), np.cos(dense_z[:, 3]))

schur_z = ba.schur_gn_step(g_zs, mesh, damping=damping)
jax.block_until_ready(schur_z)
B_z = N_z // n_dev
for s in schur_z.addressable_shards:
    start = s.index[0].start or 0
    np.testing.assert_allclose(np.asarray(s.data),
                               dense_z[start:start + B_z], atol=2e-3)

# --- config-5 scan-of-Schur across both processes (VERDICT r03 item 6) ------
# solve_graphs_mesh is lax.scan over shard_map'd schur_gn_step -- exactly the
# composition that can behave differently across real process boundaries than
# on a single-process virtual mesh.  Two stacked loopy graphs; every process
# checks the full result against the single-device GN it computes locally.
from radar_slam_tpu.parallel import multiseq  # noqa: E402

gs = []
for m in range(2):
    g_m = noisy_chain(16, loop_capacity=1, seed=30 + m)
    gs.append(posegraph.add_loop_closure(
        g_m, slot=0, i=1 + m, j=12 + m,
        delta=jnp.array([0.3, -0.1, 0.04]), info=jnp.array([5e3, 5e3, 5e3])))
g_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *gs)
poses_ms, costs_ms = multiseq.solve_graphs_mesh(g_batch, mesh, steps=10)
jax.block_until_ready(poses_ms)
ref_all, cref_all = [], []
for g_m in gs:
    ref_m, c_ref_m = ba.gauss_newton_cg(g_m, mesh=None, gn_iters=10,
                                        cg_iters=60)
    ref_all.append(np.asarray(ref_m))
    cref_all.append(float(c_ref_m))
ref_all = np.stack(ref_all)                                  # [2, 16, 3]
# The solved poses span the global mesh; this process can only fetch its
# own shards -- compare each addressable shard against the dense
# reference at the same index slice.
for s in poses_ms.addressable_shards:
    np.testing.assert_allclose(np.asarray(s.data), ref_all[s.index],
                               atol=5e-3)
# Costs are replicated (global psum inside total_cost): any one shard
# holds the full [M] vector.
costs_np = np.asarray(costs_ms.addressable_shards[0].data).reshape(-1)
for m in range(2):
    assert costs_np[m] <= 1.05 * cref_all[m] + 1e-6, (m, costs_np[m],
                                                      cref_all[m])

print(f"WORKER_OK pid={pid} psum={total} pose0={pose_local.reshape(-1)[0]:.6f}"
      f" SOLVERS_OK cost={float(c_dist):.6f}"
      f" MESH_SCAN_OK cost0={float(costs_ms[0]):.6f}",
      flush=True)
