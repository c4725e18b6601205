"""Six-step artifact pipeline: parity with ``EgoMotionPipeline``
(``scripts/run_ego_motion_pipeline.py:51-446``).

Steps (same artifact schema, see ``io.artifacts``):
1. synthesize raw signals           (:111-132)
2. RDS + peak extraction            (:134-181)
3. angle estimation                 (:183-232)
4. velocity estimation              (:234-289)
5. pose integration                 (:291-345)
6. evaluation                       (:347-403)

Unlike the reference, each step's compute is a single jitted/batched device
program; the filesystem artifacts are an optional interop/checkpoint layer,
and any step can resume from the previous step's files (the reference's
implicit checkpointing, SURVEY.md section 5).  The reference's lambda bug at
:246 (``lambda_c = fc / 3e8``) is not reproduced.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from radar_slam_tpu.aoa import robust as aoa_robust
from radar_slam_tpu.aoa import smoothing
from radar_slam_tpu.core.config import PipelineConfig
from radar_slam_tpu.core.types import ScattererBatch, Trajectory
from radar_slam_tpu.evaluate import pose_metrics, reports, velocity_metrics
from radar_slam_tpu.io import artifacts
from radar_slam_tpu.motion.associate import associate_targets
from radar_slam_tpu.motion.pose import integrate_pose
from radar_slam_tpu.motion.velocity import solve_velocity
from radar_slam_tpu.signal.detect import detect_peaks, power_spectrum_db
from radar_slam_tpu.signal.rds import range_doppler_spectrum
from radar_slam_tpu.signal.synth import synthesize_frames_batch

logger = logging.getLogger(__name__)


class EgoMotionPipeline:
    """File-based six-step pipeline over a frame sequence."""

    def __init__(self, cfg: PipelineConfig, output_dir: str,
                 save_artifacts: bool = True):
        self.cfg = cfg
        self.output_dir = Path(output_dir)
        self.save_artifacts = save_artifacts
        self.dirs = artifacts.ensure_stage_dirs(self.output_dir)
        artifacts.save_config(self.output_dir, cfg)
        self.step_times: Dict[str, float] = {}
        # In-memory stage results (device arrays).
        self._signals = None
        self._rds = None
        self._detections = None
        self._targets = None
        self._motions = None
        self._trajectory: Optional[Trajectory] = None

    # -- step 1 -------------------------------------------------------------

    def step1_synthesize(self, scatterers: ScattererBatch,
                         seed: int = 0) -> np.ndarray:
        """Synthesize raw baseband cubes [F, A, C, S] from scatterer frames."""
        t0 = time.time()
        self._signals = synthesize_frames_batch(
            scatterers, self.cfg.radar, jax.random.key(seed),
            fidelity=self.cfg.synth_fidelity)
        jax.block_until_ready(self._signals)
        if self.save_artifacts:
            for i in range(self._signals.shape[0]):
                artifacts.save_raw_frame(self.dirs["raw_sim"], i,
                                         self._signals[i])
            n_valid = int(jnp.sum(scatterers.valid))
            artifacts.save_synthesis_metadata(
                self.dirs["raw_sim"], self.cfg.radar,
                {"total_frames": int(self._signals.shape[0]),
                 "processed_frames": int(self._signals.shape[0]),
                 "valid_scatterers": n_valid})
        self.step_times["step1"] = time.time() - t0
        return self._signals

    # -- step 2 -------------------------------------------------------------

    def step2_process_signals(self, signals=None):
        t0 = time.time()
        if signals is None:
            signals = self._signals
        if signals is None:
            signals = self._load_raw_frames()
        cfg = self.cfg
        # The six-step orchestrator materializes the complex RDS cube by
        # design (stage artifacts + step-3 signature gathering consume it),
        # so the fused detection mode falls back to the XLA FFT here; the
        # cube-free fused path lives in the streaming/batched drivers
        # (pipeline/frame.py).
        mode = "fft" if cfg.fft_mode == "fused" else cfg.fft_mode
        rds = jax.vmap(lambda s: range_doppler_spectrum(
            s, cfg.radar, window=cfg.window, chirp_subset=cfg.chirp_subset,
            doppler_window=cfg.doppler_window, fft_mode=mode,
            dft_precision=cfg.dft_precision))(signals)
        det = jax.vmap(lambda r: detect_peaks(r, cfg.radar, cfg.detection))(rds)
        jax.block_until_ready((rds, det))
        self._rds, self._detections = rds, det
        if self.save_artifacts:
            for i in range(rds.shape[0]):
                d_i = jax.tree.map(lambda x: x[i], det)
                artifacts.save_rds_frame(self.dirs["rds"], i, rds[i], d_i)
        self.step_times["step2"] = time.time() - t0
        return rds, det

    # -- step 3 -------------------------------------------------------------

    def step3_extract_angles(self, method: Optional[str] = None):
        t0 = time.time()
        cfg = self.cfg
        method = method or cfg.aoa.method

        def scan_step(sm, inp):
            rds_i, det_i = inp
            targets, sm = aoa_robust.process_targets_robust(
                rds_i, det_i, sm, cfg.radar, cfg.aoa, method=method)
            return sm, targets

        _, targets = jax.lax.scan(
            scan_step, smoothing.init_state(cfg.aoa),
            (self._rds, self._detections))
        jax.block_until_ready(targets)
        self._targets = targets
        if self.save_artifacts:
            for i in range(self._rds.shape[0]):
                artifacts.save_angles_frame(
                    self.dirs["angles"], i,
                    jax.tree.map(lambda x: x[i], targets))
        self.step_times["step3"] = time.time() - t0
        return targets

    # -- step 4 -------------------------------------------------------------

    def step4_estimate_velocity(self):
        t0 = time.time()
        cfg = self.cfg
        targets = self._targets
        F = targets.range_m.shape[0]
        prev = jax.tree.map(
            lambda x: jnp.concatenate([x[:1], x[:-1]], axis=0), targets)
        # Frame 0 has no predecessor: invalidate its "previous" targets.
        first_mask = jnp.arange(F) > 0

        def solve_one(cur, prv, has_prev):
            assoc = associate_targets(cur, prv, cfg.frame_dt, cfg.velocity)
            assoc = assoc._replace(valid=assoc.valid & has_prev)
            return solve_velocity(
                assoc, jnp.float32(cfg.frame_dt), cfg.radar.lambda_c,
                cfg.velocity,
                v_unambiguous=cfg.radar.max_unambiguous_velocity)

        motions = jax.vmap(solve_one)(targets, prev, first_mask)
        jax.block_until_ready(motions)
        self._motions = motions
        if self.save_artifacts:
            for i in range(F):
                artifacts.save_velocity_frame(
                    self.dirs["velocities"], i,
                    jax.tree.map(lambda x: x[i], motions))
        self.step_times["step4"] = time.time() - t0
        return motions

    # -- step 5 -------------------------------------------------------------

    def step5_integrate_pose(self, timestamps: Optional[np.ndarray] = None):
        t0 = time.time()
        m = self._motions
        F = m.velocity.shape[0]
        if timestamps is None:
            timestamps = jnp.arange(F, dtype=jnp.float32) * self.cfg.frame_dt
        vel = jnp.where(m.success[:, None], m.velocity, 0.0)
        ang = jnp.where(m.success[:, None], m.angular_velocity, 0.0)
        traj = integrate_pose(vel, ang, jnp.asarray(timestamps),
                              self.cfg.pose)
        jax.block_until_ready(traj)
        self._trajectory = traj
        if self.save_artifacts:
            artifacts.save_trajectory(self.dirs["poses"], traj)
        self.step_times["step5"] = time.time() - t0
        return traj

    # -- step 6 -------------------------------------------------------------

    def step6_evaluate(self, gt_velocities: Optional[np.ndarray] = None,
                       gt_poses7: Optional[np.ndarray] = None) -> Dict:
        t0 = time.time()
        out: Dict = {}
        m = self._motions
        est6 = np.concatenate([np.asarray(m.velocity),
                               np.asarray(m.angular_velocity)], axis=1)
        if gt_velocities is not None:
            res = velocity_metrics.compute_velocity_errors(est6, gt_velocities)
            trends = velocity_metrics.analyze_error_trends(res)
            out["velocity"] = res
            reports.write_report(
                reports.velocity_report_markdown(res, trends),
                self.dirs["evaluation"] / "velocity_report.md")
        if gt_poses7 is not None and self._trajectory is not None:
            est7 = np.column_stack([np.asarray(self._trajectory.positions),
                                    np.asarray(self._trajectory.quaternions)])
            ape = pose_metrics.compute_ape(est7, gt_poses7)
            rte = pose_metrics.compute_rte(est7, gt_poses7)
            out["ape"], out["rte"] = ape, rte
            reports.write_report(reports.pose_report_markdown(ape, rte),
                                 self.dirs["evaluation"] / "pose_report.md")
        if out:
            reports.save_json(
                {k: v for k, v in out.items() if k != "velocity"},
                self.dirs["evaluation"] / "summary.json")
        self.step_times["step6"] = time.time() - t0
        return out

    # -- orchestration -------------------------------------------------------

    def run_complete_pipeline(self, scatterers: ScattererBatch,
                              timestamps: Optional[np.ndarray] = None,
                              gt_velocities: Optional[np.ndarray] = None,
                              gt_poses7: Optional[np.ndarray] = None,
                              seed: int = 0) -> Dict:
        """All six steps (run_ego_motion_pipeline.py:405-446)."""
        self.step1_synthesize(scatterers, seed)
        self.step2_process_signals()
        self.step3_extract_angles()
        self.step4_estimate_velocity()
        self.step5_integrate_pose(timestamps)
        evals = self.step6_evaluate(gt_velocities, gt_poses7)
        logger.info("pipeline complete: %s", self.step_times)
        return {"step_times": dict(self.step_times), "evaluation": evals,
                "trajectory": self._trajectory}

    # -- resume-from-artifacts ----------------------------------------------

    def _load_raw_frames(self):
        files = sorted(self.dirs["raw_sim"].glob("frame_*.npy"))
        if not files:
            raise FileNotFoundError("no raw frames on disk; run step1 first")
        sig = np.stack([np.load(f) for f in files])
        self._signals = jnp.asarray(sig)
        return self._signals
