#!/usr/bin/env python3
"""Whole-program profiler trace of the batched driver (VERDICT r03 item 1:
attribute the e2e-vs-device-stage-sum gap with a trace, not a guess).

Captures a ``jax.profiler`` trace of ``process_sequence_batched`` at the
bench differencing batch (512 frames by default), then parses the
``.trace.json.gz`` event dump into a table of the top XLA/Mosaic ops by
total device time, printed as JSON.  The trace directory is also kept for
TensorBoard / xprof.

Caveat: profiler support through the axon tunnel is unverified; if trace
collection produces no device events the script says so explicitly
instead of printing an empty table as if the program were free.

Usage: python scripts/trace_batched.py [--frames 512] [--out /tmp/rstrace]
"""

import argparse
import dataclasses
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--out", type=str, default="/tmp/rstrace")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from radar_slam_tpu.core.config import complete_analysis_config
    from radar_slam_tpu.io.synthetic import SceneConfig, constant_motion_scene
    from radar_slam_tpu.pipeline import frame as pipe

    cfg = dataclasses.replace(complete_analysis_config(), max_scatterers=128)
    batches, _ = constant_motion_scene(
        7, num_frames=args.frames, dt=cfg.frame_dt, v_body=(8.0, 0.5),
        yaw_rate=0.05,
        scene=SceneConfig(num_points=96, max_scatterers=cfg.max_scatterers))
    key = jax.random.key(0, impl="rbg")

    def run():
        out = pipe.process_sequence_batched(batches, key, cfg)
        return float(np.asarray(out.pose[-1, 0]))

    run()                                        # compile + warm
    with jax.profiler.trace(args.out):
        run()

    files = sorted(glob.glob(args.out + "/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        print(json.dumps({"error": "no trace files produced",
                          "out": args.out}))
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # Aggregate complete events ("X") per op name on device lanes.
    per_op = defaultdict(float)
    device_total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        # Host-side python/runtime rows have pid names; keep everything but
        # bucket by name -- the dominant device ops stand out regardless.
        per_op[name] += ev["dur"]
        device_total += ev["dur"]

    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]
    print(json.dumps({
        "trace_file": files[-1],
        "total_event_us": round(device_total, 1),
        "top_ops_us": {k: round(v, 1) for k, v in top},
    }, indent=2))


if __name__ == "__main__":
    main()
