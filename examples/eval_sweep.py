"""Per-sequence evaluation sweep over the KITTI presets (VERDICT r3 #9).

The reference's authors ran KITTI 00-08 with per-sequence YAML deltas
(`config/kitti_config_{00..08}.yaml` — feature counts, factor weights,
estimate_laser modes, fine_times).  This drives the ENGINE (chunked full
pipeline) under every preset's knob set on a matched synthetic sequence and
records ATE / devkit drift / fps per preset — the committed evidence that
each preset's configuration actually runs end-to-end (not just config
plumbing).  Sequence 02 exercises the estimate_laser=2 path (hand-eye
calibration from scratch).

Writes EVAL_r05.json at the repo root.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python examples/eval_sweep.py
       [--frames 160] [--seqs 0,1,2,3,4,5,8]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.camera import camera_from_config
from lmono_tpu.config import kitti_config
from lmono_tpu.eval.ate import ate_rmse
from lmono_tpu.eval.kitti_metrics import kitti_odometry_errors
from lmono_tpu.fused import FusedPipeline
from lmono_tpu.io import synthetic as syn
from lmono_tpu.utils.lie import Pose

CHUNK = 20


def run_preset(seq: int, n_frames: int, scene, traj,
               traj_excite=None) -> dict:
    cfg = kitti_config(seq)
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    # estimate_laser==2 presets calibrate the extrinsic from scratch —
    # keep the true T_CL out of the config for those (the engine must
    # recover the rotation by hand-eye) and drive them on the rotation-
    # rich figure-8 (VERDICT r4 #4): yaw-only circuit motion is AX=XB
    # rank-deficient and the σ₂ gate correctly refuses it, so the circuit
    # row measured raw odometry, not calibrated fusion
    if cfg.estimator.estimate_laser == 2:
        cfg = cfg.replace(laser_to_camera=None)
        if traj_excite is not None:
            traj = traj_excite
        # the adoption gate needs ~100 accumulated pairs + post-
        # adoption BA frames — run long
        # enough that calibrate→adopt→fuse→freeze completes in ONE run
        n_frames = max(n_frames, 300)
    cam = camera_from_config(cfg.camera)

    sim = jax.jit(lambda p, k: syn.simulate_lidar(
        scene, p, cfg.lidar, noise_std=0.01, key=k))
    cam_render = jax.jit(lambda p: syn.render_camera(scene, p, cfg.camera))

    def gen_chunk(i0: int):
        frames = []
        for i in range(i0, i0 + CHUNK):
            pose = Pose(traj.t[i], traj.q[i])
            s = sim(pose, jax.random.PRNGKey(700 + i))
            fr = {k: s[k] for k in ("points", "ranges", "valid")}
            fr["image"] = cam_render(pose.compose(T_CL.inverse()))
            frames.append(fr)
        ch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
        jax.block_until_ready(ch)
        return ch

    fp = FusedPipeline(cfg, cam, T_CL if cfg.laser_to_camera is not None
                       else None)
    n_chunks = n_frames // CHUNK
    outs = [fp.process_chunk(gen_chunk(0))]
    jax.block_until_ready(outs[0]["pose_t"])
    t_proc = 0.0
    for i in range(1, n_chunks):
        ch = gen_chunk(i * CHUNK)
        t0 = time.perf_counter()
        outs.append(fp.process_chunk(ch))
        jax.block_until_ready(outs[-1]["pose_t"])
        t_proc += time.perf_counter() - t0
    fps = (n_chunks - 1) * CHUNK / t_proc

    est = Pose(jnp.concatenate([o["pose_t"] for o in outs]),
               jnp.concatenate([o["pose_q"] for o in outs]))
    n = n_chunks * CHUNK
    gt = Pose(traj.t[:n], traj.q[:n])
    ate = float(ate_rmse(est, gt, align=True))
    errs = kitti_odometry_errors(est, gt, lengths=(50.0, 100.0, 150.0))
    row = {
        "seq": seq,
        "features": cfg.tracker.max_features,
        "factor_weight": cfg.estimator.factor_weight,
        "estimate_laser": cfg.estimator.estimate_laser,
        "fps": round(fps, 2),
        "ate_m": round(ate, 4),
        "drift_pct": round(float(errs["t_err_pct"]), 3),
        "rot_deg_per_m": round(float(errs["r_err_deg_per_m"]), 5),
    }
    # seq-02 calibrates the extrinsic online from identity on the
    # rotation-rich figure-8 (its ATE row is CALIBRATED FUSION, not raw
    # odometry): hand-eye σ₂ + residual gates clear after ~150 pairs,
    # the estimate is adopted, fusion initializes, and FINE_TIMES freezes
    # the extrinsic (reference path AxxbSolver.cc:89-147 →
    # Estimator.cc:403-430).
    if cfg.estimator.estimate_laser == 2:
        from lmono_tpu.utils.lie import quat_mul, quat_conj
        w = fp.state.est.window
        he = fp.state.est.handeye
        dq = np.asarray(quat_mul(quat_conj(T_CL.q), w.ex_q))
        ang = 2 * np.arccos(min(1.0, abs(float(dq[0]))))
        row["handeye_rot_err_deg"] = round(float(np.rad2deg(ang)), 3)
        row["handeye_converged"] = bool(he.converged)
    print(row, flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--seqs", type=str, default="0,1,2,3,4,5,8")
    args = ap.parse_args()

    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(args.frames + CHUNK)
    traj8 = syn.figure8_trajectory(max(args.frames, 300) + CHUNK)
    rows = [run_preset(int(s), args.frames, scene, traj,
                       traj_excite=traj8)
            for s in args.seqs.split(",")]

    out = {"frames_per_seq": args.frames,
           "note": ("engine (chunked odometry+tracking+fusion) under each "
                    "reference per-sequence preset on a matched synthetic "
                    "sequence; ATE vs simulator ground truth, devkit drift "
                    "over 50-150 m segments"),
           "rows": rows}
    path = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "EVAL_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
