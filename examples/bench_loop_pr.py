"""Loop-closure precision/recall measurement on a long synthetic circuit.

Drives the LoopDetector over N laps of the raycast city (≥500 underlying
frames; default 78 keyframes ≈ 2.5 laps at stride 8) and scores detections
against ground-truth revisits.  Writes LOOP_PR.json at the repo root.

Precision counts a detection as TRUE if the matched keyframe lies within
the shipped geometric gate (TRANS_THRESHOLD); the reference tunes its gates
for zero false loops (`LoopDetector.cc:167-260`) and so do we — the
headline number is false-loop rate 0.

Usage: python examples/bench_loop_pr.py [--kf 156]   # 156 ≈ 5 laps
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.camera import pinhole_camera
from lmono_tpu.config import synthetic_config
from lmono_tpu.io import synthetic as syn
from lmono_tpu.loop import LoopDetector
from lmono_tpu.ops.corners import detect_grid
from lmono_tpu.utils.lie import Pose, quat_rotate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kf", type=int, default=78,
                    help="number of keyframes (stride 8 frames each; "
                         "~31 kf per lap)")
    ap.add_argument("--perturb", action="store_true",
                    help="perturb every revisit-lap keyframe (VERDICT r3 "
                         "#6): brightness scale 0.7-1.3 + gamma, ±2 m "
                         "lateral offset, ±10° yaw — viewpoint/illumination "
                         "robustness instead of same-ray replays")
    ap.add_argument("--out", type=str, default="LOOP_PR.json")
    args = ap.parse_args()
    rng = np.random.RandomState(11)

    CFG = synthetic_config()
    scene = syn.make_city_scene()
    T_CL = syn.synthetic_T_CL()
    lcfg = dataclasses.replace(
        CFG.loop, db_capacity=max(128, args.kf + 2), search_gap=8,
        search_time=0.5, max_keypoints=128, window_points=64,
        min_brief_matches=12, min_pnp_inliers=8, skip_time=0.0, skip_dis=0.0)
    cam_cfg = CFG.camera
    cam = pinhole_camera(cam_cfg.width, cam_cfg.height, cam_cfg.fx,
                         cam_cfg.fy, cam_cfg.cx, cam_cfg.cy)
    det = LoopDetector(lcfg, (cam_cfg.height, cam_cfg.width))

    n_kf = args.kf
    kf_per_lap = 32          # ≈ 2π·32 m / (0.8 m · stride 8)
    traj = syn.circuit_trajectory(8 * n_kf + 4)
    kf_pos, fired, diag = [], {}, {}
    t0 = time.perf_counter()
    for k in range(n_kf):
        i = 8 * k
        pose_wl = Pose(traj.t[i], traj.q[i])
        pose_wc = pose_wl.compose(T_CL.inverse())
        bright, gamma = 1.0, 1.0
        if args.perturb and k >= kf_per_lap:
            # lateral offset ±2 m (camera x = right), yaw ±10°
            from lmono_tpu.utils.lie import quat_mul, so3_exp_quat
            lat = jnp.asarray([rng.uniform(-2.0, 2.0), 0.0, 0.0],
                              jnp.float32)
            yaw = jnp.asarray([0.0, rng.uniform(-0.1745, 0.1745), 0.0],
                              jnp.float32)   # camera y = down ⇒ yaw axis
            pose_wc = Pose(pose_wc.t + quat_rotate(pose_wc.q[None],
                                                   lat[None])[0],
                           quat_mul(pose_wc.q, so3_exp_quat(yaw)))
            bright = rng.uniform(0.7, 1.3)
            gamma = rng.uniform(0.8, 1.25)
        img = syn.render_camera(scene, pose_wc, cam_cfg)
        if bright != 1.0:
            img = jnp.clip(jnp.clip(img * bright, 0.0, 1.0) ** gamma,
                           0.0, 1.0)
        uv, ok = detect_grid(img, 16, lcfg.window_points,
                             jnp.zeros((1, 2)), jnp.zeros(1, bool))
        rays_w = quat_rotate(pose_wc.q[None], cam.lift_projective(uv))
        dist = syn.ray_cast(scene, jnp.broadcast_to(pose_wc.t, rays_w.shape),
                            rays_w)
        pts_w = pose_wc.t + rays_w * dist[:, None]
        res = det.process_keyframe(
            img, cam, uv, cam.lift_to_normalized(uv), pts_w,
            ok & (dist < 1e8), pose_wc, time=float(i) * 0.1)
        kf_pos.append(np.asarray(pose_wc.t))
        if res is not None:
            diag[k] = {"score": float(res.score),
                       "matches": int(res.n_matches),
                       "inliers": int(res.n_inliers),
                       "found": bool(res.found)}
            if bool(res.found):
                fired[k] = int(res.old_seq)
        if k % 20 == 0:
            print(f"kf {k}/{n_kf} fired={len(fired)}", flush=True)
    dt = time.perf_counter() - t0

    kf_pos = np.stack(kf_pos)
    gap = lcfg.search_gap
    tp = sum(1 for k, old in fired.items()
             if np.linalg.norm(kf_pos[old] - kf_pos[k])
             < CFG.loop.trans_threshold)
    revisit = [k for k in range(n_kf)
               if k > gap and np.linalg.norm(
                   kf_pos[: k - gap] - kf_pos[k], axis=-1).min() < 8.0]
    # attribute every missed revisit to the stage that killed it
    miss = {"score_gate": 0, "brief_matches": 0, "pnp_inliers": 0,
            "geom_gate": 0, "skip_gated": 0}
    for k in revisit:
        if k in fired:
            continue
        d = diag.get(k)
        if d is None:
            miss["skip_gated"] += 1
        elif d["score"] < lcfg.score_best_min:
            miss["score_gate"] += 1
        elif d["matches"] < lcfg.min_brief_matches:
            miss["brief_matches"] += 1
        elif d["inliers"] < lcfg.min_pnp_inliers:
            miss["pnp_inliers"] += 1
        else:
            miss["geom_gate"] += 1

    out = {
        "keyframes": n_kf,
        "perturbed": bool(args.perturb),
        "miss_stages": miss,
        "vocab_dim": int(det.codebook.shape[1]),
        "underlying_frames": 8 * n_kf + 4,
        "detections": len(fired),
        "true_positives": tp,
        "false_positives": len(fired) - tp,
        "precision": tp / max(len(fired), 1),
        "recall": (sum(1 for k in revisit if k in fired)
                   / max(len(revisit), 1)),
        "revisit_keyframes": len(revisit),
        "sec_per_keyframe": dt / n_kf,
    }
    print(json.dumps(out, indent=1))
    path = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
