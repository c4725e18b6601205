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
print(f"WORKER_OK pid={pid} psum={total} pose0={pose_local.reshape(-1)[0]:.6f}",
      flush=True)
