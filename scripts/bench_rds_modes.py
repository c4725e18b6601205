#!/usr/bin/env python3
"""RDS backend shoot-out on the active device (VERDICT round-1 item 4).

Measures ``range_doppler_spectrum`` with ``fft_mode`` in {fft, matmul,
pallas} at the benchmark operating point (complete-analysis: A=8, C=32,
S=400, batched over F frames), validates each mode's numerics against the
XLA-FFT reference, and reports achieved GFLOP/s vs the matmul/HBM rooflines.

The winner (measured on the real chip) is wired into
``core/config.py:complete_analysis_config``; this script is the evidence.

Usage: python scripts/bench_rds_modes.py [--frames 64] [--chirps 32]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_MATMUL_TFLOPS = 197.0   # v5e bf16 MXU
PEAK_HBM_GBS = 820.0


def timeit(fn, x, iters=32):
    """Per-call device time via in-program chaining (see bench_kernels.py:
    block_until_ready resolves early on this backend and each dispatch pays
    a ~1-2 ms RTT, so iterate inside one program and difference two counts).
    """
    @jax.jit
    def chained(x, n):
        def body(i, acc):
            xi = x * (1.0 + 1e-7 * i)        # loop-dependent: prevents LICM
            out = fn(xi)
            return acc + jnp.sum(jnp.abs(out[..., 0, 0, :8]))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def t(n):
        float(np.asarray(chained(x, n)))     # compile + warm, real barrier
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(chained(x, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = max(iters // 4, 1), iters
    return max(t(n2) - t(n1), 1e-9) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--chirps", type=int, default=32)
    args = ap.parse_args()

    from radar_slam_tpu.core.config import RadarConfig
    from radar_slam_tpu.signal.rds import range_doppler_spectrum
    from radar_slam_tpu.utils.host import device_get, device_put

    cfg = RadarConfig(num_chirps=args.chirps, noise_power=1e-6)
    F, A, C, S = args.frames, cfg.total_antennas, cfg.num_chirps, \
        cfg.samples_per_chirp
    rng = np.random.default_rng(0)
    x = device_put((rng.standard_normal((F, A, C, S)).astype(np.float32)
                    + 1j * rng.standard_normal((F, A, C, S))
                    .astype(np.float32)).astype(np.complex64))

    # DFT-as-matmul FLOPs (the matmul/pallas modes' actual work); the FFT
    # mode does O(N log N) but is layout-bound, so the same count is used as
    # the common "useful work" yardstick.
    flops = F * (8 * A * C * S * S + 8 * A * S * C * C)
    bytes_accessed = F * A * C * S * 8 * 2          # one read + one write

    def run_mode(mode, precision="highest", data=None):
        return range_doppler_spectrum(
            x if data is None else data, cfg, window="hann",
            doppler_window="hann", fft_mode=mode, dft_precision=precision)

    # Numerics check on a small sub-batch (the tunnel rejects >~64 MB
    # device->host fetches; timing below fetches only scalars).
    x_small = x[:2]
    ref = device_get(run_mode("fft", data=x_small))
    scale = np.abs(ref).max()

    results = {}
    for mode, prec in [("fft", "highest"), ("matmul", "highest"),
                       ("matmul", "default"), ("pallas", "highest"),
                       ("pallas", "default")]:
        name = mode if prec == "highest" else f"{mode}[{prec}]"
        try:
            out = device_get(run_mode(mode, prec, data=x_small))
            err = float(np.abs(out - ref).max() / scale)
            dt = timeit(lambda xx, m=mode, p=prec: range_doppler_spectrum(
                xx, cfg, window="hann", doppler_window="hann",
                fft_mode=m, dft_precision=p), x)
            results[name] = {
                "time_us_per_batch": round(dt * 1e6, 1),
                "frames_per_s": round(F / dt, 0),
                "gflops": round(flops / dt / 1e9, 1),
                "mxu_util_pct": round(flops / dt / 1e12
                                      / PEAK_MATMUL_TFLOPS * 100, 1),
                "hbm_gbs": round(bytes_accessed / dt / 1e9, 1),
                "rel_err_vs_fft": err,
            }
        except Exception as e:  # pragma: no cover - device-specific
            results[name] = {"error": f"{type(e).__name__}: {e}"}

    fastest = min((r["time_us_per_batch"], k) for k, r in results.items()
                  if "time_us_per_batch" in r)[1]
    print(json.dumps({
        "device": str(jax.devices()[0]),
        "shape_FACS": [F, A, C, S],
        "dft_matmul_gflop": round(flops / 1e9, 2),
        "modes": results,
        "fastest": fastest,
    }, indent=2))


if __name__ == "__main__":
    main()
