"""Scan-context loop-closure retrieval tests.

The descriptor proposer's selling point vs the pose-gated one
(``loopclosure.find_loop_closures``): retrieval must survive odometric
drift larger than the revisit gate.  Also pins the FFT shift-search against
a brute-force reference and the shift->yaw sign convention against
explicitly rotated clouds.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from radar_slam_tpu.parallel import slam
from radar_slam_tpu.parallel.loopclosure import (LoopClosureConfig,
                                                 find_loop_closures)
from radar_slam_tpu.parallel.scancontext import (ScanContextConfig,
                                                 build_descriptors,
                                                 find_loop_closures_sc,
                                                 propose_candidates,
                                                 ring_keys, sc_correlate,
                                                 shift_to_yaw)
from tests.test_slam import circle_scene


def test_fft_correlation_matches_bruteforce():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(0, 2, (16, 48)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 2, (16, 48)).astype(np.float32))

    def unit_cols(d):
        return d / np.maximum(np.linalg.norm(d, axis=0, keepdims=True), 1e-9)

    an, bn = unit_cols(np.asarray(a)), unit_cols(np.asarray(b))
    brute = np.array([np.sum(an * np.roll(bn, -n, axis=1)) / 48
                      for n in range(48)])
    sim, shift = sc_correlate(a, b)
    assert abs(float(sim) - brute.max()) < 1e-5
    assert int(shift) == int(brute.argmax())


def test_rotation_invariance_and_yaw_sign():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-30, 30, (80, 2)).astype(np.float32)
    cfg = ScanContextConfig()
    for dpsi in [0.7, -1.1, 2.4]:
        # Frame i at yaw 0, frame j at yaw dpsi, same position:
        # body azimuths in j are those in i minus dpsi.
        c, s = np.cos(dpsi), np.sin(dpsi)
        pts_j = (pts @ np.array([[c, s], [-s, c]]).T).astype(np.float32)
        d = build_descriptors(jnp.asarray(np.stack([pts, pts_j])),
                              jnp.ones((2, 80), bool), cfg)
        sim, shift = sc_correlate(d[0], d[1])
        assert float(sim) > 0.4, dpsi
        yaw = float(shift_to_yaw(shift, cfg.n_sectors))
        err = np.arctan2(np.sin(yaw - dpsi), np.cos(yaw - dpsi))
        # Within one sector of the truth.
        assert abs(err) < 2 * np.pi / cfg.n_sectors + 1e-6, (dpsi, yaw)
        # Ring keys are rotation invariant.
        k = np.asarray(ring_keys(d))
        np.testing.assert_allclose(k[0] @ k[1], 1.0, atol=0.02)


def test_retrieval_is_temporally_gated():
    """Consecutive (near-identical) frames must not propose each other."""
    _, pts, msk = circle_scene(n_frames=30)
    desc = build_descriptors(pts, msk, ScanContextConfig())
    cands = propose_candidates(desc, ScanContextConfig(min_separation=40))
    assert cands == []


def test_scancontext_survives_drift_where_pose_gate_fails():
    """Odometry drift larger than the revisit gate: the pose-gated proposer
    finds nothing, scan-context retrieval still closes the loop and the
    refined endpoint error drops."""
    poses, pts, msk = circle_scene()
    n = len(poses)
    dt = 0.1
    rng = np.random.default_rng(7)
    vel = np.tile([6.0, 0.0, 0.0], (n, 1)) + rng.normal(0, 0.1, (n, 3))
    vel[:, 2] = 0.0
    # Yaw-rate bias: the estimated heading sweeps < 2pi where the true
    # trajectory closes the circle, so the estimated endpoint lands ~7 m
    # from the start -- outside the revisit gate.  (A speed bias would not
    # do it: it rescales the estimated circle but still closes it.)
    wz = np.full(n, 0.7 - 0.1) + rng.normal(0, 0.01, n)
    lc = LoopClosureConfig(revisit_radius=5.0, min_separation=40,
                           max_rmse=0.5)

    res_pose = slam.refine_trajectory(vel, wz, np.ones(n, bool), dt,
                                      frame_points=pts, frame_valid=msk,
                                      lc_cfg=lc, proposer="pose")
    assert not res_pose["loop_closures"], \
        "drift should defeat the pose-gated proposer in this scene"

    res_sc = slam.refine_trajectory(vel, wz, np.ones(n, bool), dt,
                                    frame_points=pts, frame_valid=msk,
                                    lc_cfg=lc, proposer="scancontext")
    assert res_sc["loop_closures"], "scan context should still retrieve"
    lc0 = res_sc["loop_closures"][0]
    assert lc0["j"] - lc0["i"] > 40
    open_err = np.linalg.norm(res_sc["open_loop_poses"][:n, :2]
                              - poses[:, :2], axis=1)
    ref_err = np.linalg.norm(res_sc["poses"][:n, :2] - poses[:, :2], axis=1)
    assert ref_err[-1] < 0.6 * open_err[-1], (open_err[-1], ref_err[-1])


def test_sc_matches_pose_gate_on_mild_drift():
    """On the easy scene both proposers accept a loop and refine similarly."""
    poses, pts, msk = circle_scene()
    n = len(poses)
    rng = np.random.default_rng(5)
    vel = np.tile([6.0, 0.0, 0.0], (n, 1)) + rng.normal(0, 0.15, (n, 3))
    vel[:, 0] += 0.25
    vel[:, 2] = 0.0
    wz = np.full(n, 0.7) + rng.normal(0, 0.01, n)
    lc = LoopClosureConfig(revisit_radius=6.0, min_separation=40,
                           max_rmse=0.5)
    res = {p: slam.refine_trajectory(vel, wz, np.ones(n, bool), 0.1,
                                     frame_points=pts, frame_valid=msk,
                                     lc_cfg=lc, proposer=p)
           for p in ("pose", "scancontext")}
    for p, r in res.items():
        assert r["loop_closures"], p
    e = {p: np.linalg.norm(r["poses"][:n, :2] - poses[:, :2], axis=1).max()
         for p, r in res.items()}
    assert abs(e["pose"] - e["scancontext"]) < 0.5, e
