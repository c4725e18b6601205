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


def analyze_rds_quality(rds: np.ndarray, antenna: int = 0) -> Dict:
    """RDS quality metrics (analyze_data.py:146-221): dynamic range, noise
    floor estimate, peak SNR, energy concentration."""
    p = np.abs(np.asarray(rds)[antenna]) ** 2
    p_db = 10 * np.log10(p + 1e-12)
    noise_floor_db = float(np.percentile(p_db, 25))
    peak_db = float(p_db.max())
    total = float(p.sum())
    sorted_p = np.sort(p.ravel())[::-1]
    top1pct = float(sorted_p[:max(len(sorted_p) // 100, 1)].sum())
    return {
        "peak_power_db": peak_db,
        "noise_floor_db": noise_floor_db,
        "dynamic_range_db": peak_db - noise_floor_db,
        "peak_snr_db": peak_db - noise_floor_db,
        "mean_power_db": float(p_db.mean()),
        "energy_concentration_top1pct": top1pct / total if total > 0 else 0.0,
    }


def compare_frames(frames: Sequence[Dict[str, np.ndarray]]) -> Dict:
    """Cross-frame detection-set comparison (analyze_data.py:223-340):
    count stability and range-distribution drift between consecutive
    frames."""
    counts, range_means = [], []
    for f in frames:
        ok = np.asarray(f["valid"], bool)
        counts.append(int(ok.sum()))
        r = np.asarray(f["range_m"])[ok]
        range_means.append(float(r.mean()) if len(r) else 0.0)
    counts = np.asarray(counts, float)
    rm = np.asarray(range_means)
    return {
        "frames": len(frames),
        "count_mean": float(counts.mean()) if len(counts) else 0.0,
        "count_std": float(counts.std()) if len(counts) else 0.0,
        "count_drift_per_frame": float(np.polyfit(
            np.arange(len(counts)), counts, 1)[0]) if len(counts) > 1 else 0.0,
        "range_mean_drift_per_frame": float(np.polyfit(
            np.arange(len(rm)), rm, 1)[0]) if len(rm) > 1 else 0.0,
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
