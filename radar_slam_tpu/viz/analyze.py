"""Detection / peak statistics analysis (parity with
``scripts/analyze_data.py`` ``RadarDataAnalyzer``: range / Doppler / power
statistics, near/far and moving/stationary classification, :37-140).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def _stats(x: np.ndarray) -> Dict:
    if len(x) == 0:
        return {"count": 0}
    return {
        "count": int(len(x)),
        "min": float(np.min(x)), "max": float(np.max(x)),
        "mean": float(np.mean(x)), "std": float(np.std(x)),
        "median": float(np.median(x)),
    }


def analyze_detections(detections: Dict[str, np.ndarray],
                       near_range_m: float = 30.0,
                       stationary_vr_mps: float = 0.5) -> Dict:
    """Peak statistics for one frame's detection set (analyze_data.py:37-140).

    Accepts the ``*_peaks.npz`` artifact dict (keys range_m, doppler_hz,
    vr_mps, power_db, valid)."""
    ok = np.asarray(detections["valid"], bool)
    rng = np.asarray(detections["range_m"])[ok]
    dop = np.asarray(detections["doppler_hz"])[ok]
    vr = np.asarray(detections["vr_mps"])[ok]
    pwr = np.asarray(detections["power_db"])[ok]

    near = rng <= near_range_m
    moving = np.abs(vr) > stationary_vr_mps
    return {
        "num_detections": int(ok.sum()),
        "range_stats": _stats(rng),
        "doppler_stats": _stats(dop),
        "power_stats": _stats(pwr),
        "radial_velocity_stats": _stats(vr),
        "near_targets": int(near.sum()),
        "far_targets": int((~near).sum()),
        "moving_targets": int(moving.sum()),
        "stationary_targets": int((~moving).sum()),
    }


def analyze_sequence_detections(frames: Sequence[Dict[str, np.ndarray]]
                                ) -> Dict:
    """Aggregate statistics over a sequence of per-frame detection dicts."""
    per_frame = [analyze_detections(f) for f in frames]
    counts = np.array([p["num_detections"] for p in per_frame])
    return {
        "frames": len(per_frame),
        "detections_per_frame": _stats(counts.astype(float)),
        "total_detections": int(counts.sum()),
        "per_frame": per_frame,
    }
