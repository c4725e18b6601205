#!/usr/bin/env python3
"""Measure host->device ingest overlap on the active device (VERDICT
round-2 item 8: "measured overlap (upload hidden behind compute)").

Three schedules over the same host-resident ADC-cube sequence:

- ``resident``: everything pre-uploaded; pure compute (the floor).
- ``serial``: per chunk, block on the upload, then block on compute --
  the no-overlap upper bound (what a naive loader does).
- ``prefetch``: ``io/prefetch.py`` double buffering -- chunk i+1's DMA
  enqueued while chunk i computes.

overlap_pct = how much of the serial schedule's upload cost the prefetch
schedule hides: (serial - prefetch) / (serial - resident).

Usage: python scripts/bench_prefetch.py [--frames 128] [--chunk 16]
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from radar_slam_tpu.core.config import complete_analysis_config
    from radar_slam_tpu.io import prefetch
    from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
    from radar_slam_tpu.signal.synth import synthesize_frames_batch

    cfg = dataclasses.replace(complete_analysis_config(), max_scatterers=128)
    F, C = args.frames, args.chunk
    batches, _ = constant_motion_scene(
        7, num_frames=F, dt=cfg.frame_dt, v_body=(8.0, 0.5), yaw_rate=0.05,
        scene=SceneConfig(num_points=96, max_scatterers=cfg.max_scatterers))
    signals = synthesize_frames_batch(batches, cfg.radar, jax.random.key(0))
    host = np.asarray(signals)               # [F, A, Ch, S] c64 on host
    mb = host.nbytes / 1e6

    def force(out):
        return float(np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0]))

    # Warm compiles on one chunk.
    from radar_slam_tpu.pipeline import frame as frame_mod
    state0 = frame_mod.init_state(cfg)
    warm = jax.device_put(host[:C])
    st, out = prefetch._signal_chunk_step(state0, warm, cfg)
    force(out)

    def run_resident():
        dev = jax.device_put(host)
        jax.block_until_ready(dev)
        t0 = time.perf_counter()
        state = frame_mod.init_state(cfg)
        outs = []
        for i in range(F // C):
            state, out = prefetch._signal_chunk_step(
                state, dev[i * C:(i + 1) * C], cfg)
            outs.append(out)
        force(outs[-1])
        return time.perf_counter() - t0

    def run_serial():
        t0 = time.perf_counter()
        state = frame_mod.init_state(cfg)
        outs = []
        for i in range(F // C):
            buf = jax.device_put(host[i * C:(i + 1) * C])
            jax.block_until_ready(buf)            # no overlap allowed
            state, out = prefetch._signal_chunk_step(state, buf, cfg)
            jax.block_until_ready(out.pose)
            outs.append(out)
        force(outs[-1])
        return time.perf_counter() - t0

    def run_prefetch():
        t0 = time.perf_counter()
        out = prefetch.process_signal_sequence_prefetch(host, cfg, chunk=C)
        force(out)
        return time.perf_counter() - t0

    res = {}
    for name, fn in [("resident", run_resident), ("serial", run_serial),
                     ("prefetch", run_prefetch)]:
        best = min(fn() for _ in range(args.trials))
        res[name] = round(best, 4)

    upload_cost = res["serial"] - res["resident"]
    hidden = res["serial"] - res["prefetch"]
    out = {
        "device": str(jax.devices()[0]),
        "frames": F, "chunk": C, "host_mb": round(mb, 1),
        "resident_s": res["resident"], "serial_s": res["serial"],
        "prefetch_s": res["prefetch"],
        "upload_cost_s": round(upload_cost, 4),
        "overlap_pct": round(100.0 * hidden / max(upload_cost, 1e-9), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
