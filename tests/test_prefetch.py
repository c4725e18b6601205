"""Double-buffered ingest drivers must be bit-identical to the one-shot
sequence drivers (VERDICT round-2 item 8; SURVEY section 2 row 1 prefetch
pipeline).  Overlap itself is measured on the chip
(``scripts/bench_prefetch.py``); here the CPU mesh pins semantics:
chunking, edge-padding of the last chunk, PRNG key alignment, and state
carry across chunk boundaries."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from radar_slam_tpu.core.config import (AoAConfig, DetectionConfig,
                                        PipelineConfig, RadarConfig)
from radar_slam_tpu.io import prefetch
from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
from radar_slam_tpu.pipeline import frame as pipe

CFG = PipelineConfig(
    radar=RadarConfig(noise_power=1e-6, num_chirps=16,
                      chirp_duration=12.8e-6),
    detection=DetectionConfig(cfar_train_cells=6, guard_cells=2,
                              cfar_offset_db=12.0, max_detections=24),
    aoa=AoAConfig(search_resolution_deg=3.0, max_targets=24,
                  track_capacity=64),
    max_scatterers=128,
)


def _scene(frames=11):
    b, gt = constant_motion_scene(
        3, num_frames=frames, dt=CFG.frame_dt, v_body=(5.0, 0.3),
        yaw_rate=0.05,
        scene=SceneConfig(num_points=48, max_scatterers=CFG.max_scatterers))
    return b, gt


@pytest.mark.slow
def test_prefetch_scatterers_bitwise_equal():
    """Chunked (uneven last chunk) == one-shot scan, every output leaf."""
    batches, _ = _scene(11)                   # 11 frames, chunk 4 -> pad
    key = jax.random.key(0)
    want = pipe.process_sequence(batches, key, CFG)
    host = jax.tree.map(lambda x: np.asarray(x), batches)
    got = prefetch.process_sequence_prefetch(host, key, CFG, chunk=4)
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


@pytest.mark.slow
def test_prefetch_signals_bitwise_equal():
    from radar_slam_tpu.signal.synth import synthesize_frames_batch

    batches, _ = _scene(9)
    signals = synthesize_frames_batch(batches, CFG.radar, jax.random.key(1))
    want = pipe.process_signal_sequence(signals, CFG)
    got = prefetch.process_signal_sequence_prefetch(
        np.asarray(signals), CFG, chunk=4)
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_chunk_uploader_shapes_and_count():
    host = {"a": np.arange(22, dtype=np.float32).reshape(11, 2)}
    chunks = list(prefetch.chunk_uploader(host, 4))
    assert len(chunks) == 3
    for c in chunks:
        assert c["a"].shape == (4, 2)
    # Edge-repeat padding on the tail.
    np.testing.assert_array_equal(np.asarray(chunks[2]["a"])[-1],
                                  host["a"][-1])


@pytest.mark.slow
def test_prefetch_rig_bitwise_equal():
    """Rig prefetch driver (r04: the CLI dataset rig path ingests through
    it) == one-shot process_sequence_rig, bitwise."""
    from radar_slam_tpu.io.synthetic import constant_motion_scene_rig
    from radar_slam_tpu.pipeline import rig as rigmod

    rig = ((1.8, 0.9, 0.4), (1.8, -0.9, -0.4))
    batches, _ = constant_motion_scene_rig(
        7, num_frames=11, dt=CFG.frame_dt, v_body=(5.0, 0.3), yaw_rate=0.05,
        rig=rig,
        scene=SceneConfig(num_points=48, max_scatterers=CFG.max_scatterers))
    key = jax.random.key(4)
    want = rigmod.process_sequence_rig(batches, key, CFG, rig)
    host = jax.tree.map(np.asarray, batches)
    got = prefetch.process_sequence_rig_prefetch(host, key, CFG, rig,
                                                 chunk=4)
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


@pytest.mark.slow
def test_rig_batched_prefetch_matches_one_shot():
    """The chunked-batched rig prefetch driver (host-resident ingest) must
    reproduce the one-shot batched rig driver: same global key split, same
    phase A per frame, one shared phase B."""
    import dataclasses

    from radar_slam_tpu.io.prefetch import (
        process_sequence_rig_batched_prefetch)
    from radar_slam_tpu.io.synthetic import (SceneConfig,
                                             constant_motion_scene_rig)
    from radar_slam_tpu.pipeline import rig as rigmod

    rig = ((1.8, 0.9, 0.4), (1.8, -0.9, -0.4))
    cfg = dataclasses.replace(
        CFG, aoa=dataclasses.replace(CFG.aoa, track_capacity=256))
    batches, _ = constant_motion_scene_rig(
        11, num_frames=10, dt=cfg.frame_dt, v_body=(8.0, 0.5),
        yaw_rate=0.25, rig=rig,
        scene=SceneConfig(num_points=48, max_scatterers=cfg.max_scatterers,
                          fov_rad=1.8))
    host = jax.tree.map(lambda x: np.asarray(x), batches)
    a = rigmod.process_sequence_rig_batched(batches, jax.random.key(0),
                                            cfg, rig)
    # chunk=4 with F=10 exercises padding + multi-chunk accumulation.
    b = process_sequence_rig_batched_prefetch(host, jax.random.key(0),
                                              cfg, rig, chunk=4)
    np.testing.assert_allclose(np.asarray(b.pose), np.asarray(a.pose),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(b.motion.success),
                                  np.asarray(a.motion.success))
    np.testing.assert_array_equal(np.asarray(b.num_reliable),
                                  np.asarray(a.num_reliable))
