#!/usr/bin/env python3
"""Doppler-stage shoot-out for the fused power kernels on the active chip:
precision {highest, high, default} x layout {loop, wide}, isolated
(chained device time) and end-to-end (bench.py differencing), for both the
cube-input kernel (ops/power_pallas.py) and the cube-free synthesis kernel
(ops/synthpower_pallas.py).

Every measurement runs in its OWN subprocess: a Mosaic compile failure
poisons the tunnel's device state for the rest of the process (spurious
UNIMPLEMENTED on every later call), the same failure mode that forced
bench_aoa_methods.py into subprocess isolation.

The selection this script produces sets PipelineConfig defaults
(doppler_precision / synth_doppler_precision / doppler_layout); accuracy
is reported as strong-cell dB error vs the f32 oracle so the pick is
constrained, not free.

Usage: python scripts/bench_doppler_sweep.py [--f1 64] [--f2 512]
       [--skip-e2e]
"""

import argparse
import dataclasses
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PRECS = ["highest", "high", "default"]
LAYOUTS = ["loop", "wide"]


def chained_time(fn, x, iters=32):
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def chained(x, n):
        def body(i, acc):
            xi = jax.tree.map(
                lambda v: v * (1.0 + 1e-7 * i)
                if jnp.issubdtype(v.dtype, jnp.inexact) else v, x)
            out = fn(xi)
            return acc + jnp.sum(out[..., 0, :4])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def t(n):
        float(np.asarray(chained(x, n)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(chained(x, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = max(iters // 4, 1), iters
    return max(t(n2) - t(n1), 1e-9) / (n2 - n1)


def _measure_one(kind: str, prec: str, layout: str, f1: int) -> dict:
    """One (kernel, precision, layout) measurement; runs inside its own
    subprocess."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from radar_slam_tpu.core.config import complete_analysis_config
    from radar_slam_tpu.signal.rds import _mix_vector, rds_power
    from radar_slam_tpu.utils.host import device_get, device_put

    cfg = dataclasses.replace(complete_analysis_config(), max_scatterers=128)
    rcfg = cfg.radar
    F, A, C, S = f1, rcfg.total_antennas, rcfg.num_chirps, \
        rcfg.samples_per_chirp

    if kind == "power":
        rng = np.random.default_rng(0)
        x = device_put((rng.standard_normal((F, A, C, S)).astype(np.float32)
                        + 1j * rng.standard_normal((F, A, C, S))
                        .astype(np.float32)).astype(np.complex64))

        def power(xx, prec, layout):
            return rds_power(xx, rcfg, window=cfg.window,
                             doppler_window=cfg.doppler_window,
                             mode="pallas",
                             dft_precision=cfg.power_precision,
                             doppler_precision=prec, doppler_layout=layout)

        ref = device_get(power(x[:2], "highest", "loop"))
        got = device_get(power(x[:2], prec, layout))
        dt = chained_time(lambda xx: power(xx, prec, layout), x)
    elif kind == "synthpower":
        from radar_slam_tpu.io.synthetic import (SceneConfig,
                                                 constant_motion_scene)
        from radar_slam_tpu.ops import synthpower_pallas as sp
        from radar_slam_tpu.signal.synth import synthesis_factors

        batches, _ = constant_motion_scene(
            7, num_frames=F, dt=cfg.frame_dt, v_body=(8.0, 0.5),
            yaw_rate=0.05,
            scene=SceneConfig(num_points=96,
                              max_scatterers=cfg.max_scatterers))
        sigma = float(rcfg.noise_power) ** 0.5

        # Factors are computed INSIDE the timed/traced fn from the host
        # scatterer batch: closing over device arrays embeds them as
        # traced constants whose np materialization the axon backend
        # rejects with UNIMPLEMENTED (bench_synthfused.py pattern).
        def spower(b, prec, layout):
            mix = _mix_vector(rcfg, cfg.window, "baseband", S)
            e_ac, e_fast = jax.vmap(
                lambda sc: synthesis_factors(sc, rcfg, "tpu"))(b)
            seeds = jnp.arange(e_ac.shape[0], dtype=jnp.int32) + 11
            return sp.scatterer_power(e_ac, e_fast, seeds, mix, C, sigma,
                                      doppler_window=cfg.doppler_window,
                                      precision_name=cfg.power_precision,
                                      doppler_precision=prec,
                                      doppler_layout=layout)

        import functools
        ref = device_get(jax.jit(functools.partial(
            spower, prec="highest", layout="loop"))(batches))
        got = device_get(jax.jit(functools.partial(
            spower, prec=prec, layout=layout))(batches))
        dt = chained_time(lambda b: spower(b, prec, layout), batches)
    else:
        raise ValueError(kind)

    db = np.abs(10 * np.log10(got + 1e-12) - 10 * np.log10(ref + 1e-12))
    strong = ref > 1e-3 * ref.max()
    return {"us_per_batch": round(dt * 1e6, 1),
            "db_err_strong": round(float(db[strong].max()), 4)}


def _e2e_one(f1: int, f2: int, **over) -> dict:
    from radar_slam_tpu.core.config import complete_analysis_config
    from scripts.bench_fused import e2e_fps

    cfg = dataclasses.replace(complete_analysis_config(),
                              max_scatterers=128, fft_mode="fused", **over)
    fps, err = e2e_fps(cfg, f1, f2)
    return {"frames_per_s": round(fps, 1), "final_pose_err_m": round(err, 3)}


# The mat_* rows must force synth_in_kernel=False (it defaults ON for TPU
# backends since r03c) or they silently measure the cube-free path; the sk_*
# rows steer the cube-free kernel's layout, which reads
# ``synth_doppler_layout`` (``doppler_layout`` configures the cube-input
# kernel the sk path never runs).
E2E_CANDIDATES = {
    "mat_highest_loop": {"synth_in_kernel": False},
    "mat_high_wide": {"synth_in_kernel": False,
                      "doppler_precision": "high", "doppler_layout": "wide"},
    "mat_high_loop": {"synth_in_kernel": False,
                      "doppler_precision": "high", "doppler_layout": "loop"},
    "sk_high_wide_r03default": {"synth_in_kernel": True,
                                "synth_doppler_layout": "wide"},
    "sk_high_loop": {"synth_in_kernel": True, "synth_doppler_layout": "loop"},
}


def _sub(payload: dict) -> dict:
    """Run one measurement in a fresh subprocess; returns its JSON."""
    p = subprocess.run(
        [sys.executable, __file__, "--one", json.dumps(payload)],
        capture_output=True, text=True, timeout=900)
    for line in reversed(p.stdout.strip().splitlines() or [""]):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    tail = (p.stderr or "").strip().splitlines()[-8:]
    return {"error": f"rc={p.returncode}: " + " | ".join(tail)[:500]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f1", type=int, default=64)
    ap.add_argument("--f2", type=int, default=512)
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--one", type=str, default=None,
                    help="internal: one measurement, JSON payload")
    args = ap.parse_args()

    if args.one:
        payload = json.loads(args.one)
        if payload["what"] == "iso":
            out = _measure_one(payload["kind"], payload["prec"],
                               payload["layout"], payload["f1"])
        else:
            out = _e2e_one(payload["f1"], payload["f2"], **payload["over"])
        print(json.dumps(out))
        return

    # NB: the parent must NOT touch jax/devices -- the tunnel serves one
    # client at a time, and holding it here would starve the children.
    results = {}
    for kind in ["power", "synthpower"]:
        iso = {}
        for prec in PRECS:
            for layout in LAYOUTS:
                key = f"{prec}/{layout}"
                iso[key] = _sub({"what": "iso", "kind": kind, "prec": prec,
                                 "layout": layout, "f1": args.f1})
                print(f"{kind} {key}: {iso[key]}", file=sys.stderr)
        results[kind] = iso

    if not args.skip_e2e:
        e2e = {}
        for name, over in E2E_CANDIDATES.items():
            e2e[name] = _sub({"what": "e2e", "f1": args.f1, "f2": args.f2,
                              "over": over})
            print(f"e2e {name}: {e2e[name]}", file=sys.stderr)
        results["e2e_batched"] = e2e

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
