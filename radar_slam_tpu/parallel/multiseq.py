"""Multi-sequence batch processing: sequences partitioned across devices.

BASELINE.json config 5 is "multi-sequence RadarScenes batch: keyframe-
partitioned pose-graph BA across hosts".  Two complementary partitionings:

- **across sequences** (this module): independent sequences are data-
  parallel -- each device owns a shard of the sequence batch and runs the
  full pipeline + pose-graph GN for its shard (``shard_map`` over the
  sequence axis; no collectives needed, which is the correct communication
  pattern for independent trajectories);
- **within a sequence** (``ba.gauss_newton_cg`` / ``ba.schur_gn_step``):
  one long trajectory's factors shard across devices with psum/all_gather
  reduction -- used when a single sequence outgrows one device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from radar_slam_tpu.core.config import PipelineConfig
from radar_slam_tpu.core.types import ScattererBatch
from radar_slam_tpu.parallel import ba, posegraph
from radar_slam_tpu.pipeline.frame import FrameOutput, process_sequence_batched


@functools.partial(jax.jit, static_argnames=("cfg",))
def _pipeline_one(scatterers: ScattererBatch, key: jax.Array,
                  cfg: PipelineConfig) -> FrameOutput:
    return process_sequence_batched(scatterers, key, cfg)


def _graph_from_output(out: FrameOutput, dt: float) -> posegraph.PoseGraph:
    return posegraph.from_velocities(
        out.motion.velocity, out.motion.angular_velocity[:, 2],
        out.motion.success, dt, loop_capacity=1)


@functools.partial(jax.jit, static_argnames=("gn_iters", "cg_iters"))
def _solve_batch(graphs: posegraph.PoseGraph, gn_iters: int = 6,
                 cg_iters: int = 40):
    """vmapped single-device GN over a stacked batch of graphs [M, ...]."""
    return jax.vmap(
        lambda g: ba.gauss_newton_cg(g, mesh=None, gn_iters=gn_iters,
                                     cg_iters=cg_iters))(graphs)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis_name",
                                             "gn_iters", "cg_iters"))
def process_sequences_sharded(scatterers: ScattererBatch, keys: jax.Array,
                              cfg: PipelineConfig, mesh: Mesh,
                              axis_name: str = "s", gn_iters: int = 6,
                              cg_iters: int = 40
                              ) -> Tuple[FrameOutput, jax.Array, jax.Array]:
    """Full pipeline + pose-graph GN for a batch of sequences, sequence-
    sharded over the mesh.

    Args:
        scatterers: stacked [M, F, S] scatterer pytree (M sequences).
        keys: [M] PRNG keys.

    Returns (per-frame outputs [M, F, ...], refined poses [M, F+1, 3],
    costs [M])."""
    dt = cfg.frame_dt

    def shard_body(sc: ScattererBatch, ks):
        out = jax.vmap(lambda s, k: _pipeline_one(s, k, cfg))(sc, ks)
        graphs = jax.vmap(lambda o: _graph_from_output(o, dt))(out)
        poses, costs = jax.vmap(
            lambda g: ba.gauss_newton_cg(g, mesh=None, gn_iters=gn_iters,
                                         cg_iters=cg_iters))(graphs)
        return out, poses, costs

    fn = jax.shard_map(shard_body, mesh=mesh,
                       in_specs=(P(axis_name), P(axis_name)),
                       out_specs=P(axis_name), check_vma=False)
    return fn(scatterers, keys)
