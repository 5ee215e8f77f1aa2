"""Per-lane device timing of the fused pipeline step: odometry vs tracker
vs fusion, each scanned over a chunk in isolation, plus the composed step.

Answers "where do the 18 ms/frame of `bench.py` pipeline go?" with numbers
per lane instead of a trace viewer.  Writes LANES.json.

Run on the chip:  python examples/bench_lanes.py
"""

import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


CHUNK = 20
REPS = 5


def _med(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    from lmono_tpu.camera import camera_from_config
    from lmono_tpu.config import synthetic_config
    from lmono_tpu.estimator.estimator import fusion_step
    from lmono_tpu.estimator.tracker import tracker_step
    from lmono_tpu.fused import FusedState, fused_chunk
    from lmono_tpu.io import synthetic as syn
    from lmono_tpu.lidar.odometry import odometry_step
    from lmono_tpu.utils.lie import Pose

    cfg = synthetic_config()
    import numpy as np
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    cam = camera_from_config(cfg.camera)

    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(CHUNK)
    sim = jax.jit(lambda p, k: syn.simulate_lidar(
        scene, p, cfg.lidar, noise_std=0.01, key=k))
    render = jax.jit(lambda p: syn.render_camera(scene, p, cfg.camera))
    frames = []
    for i in range(CHUNK):
        pose = Pose(traj.t[i], traj.q[i])
        s = sim(pose, jax.random.PRNGKey(100 + i))
        fr = {k: s[k] for k in ("points", "ranges", "valid")}
        fr["image"] = render(pose.compose(T_CL.inverse()))
        frames.append(fr)
    chunk = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    jax.block_until_ready(chunk)

    st0 = FusedState.init(cfg, T_CL)

    # --- composed step (the bench path)
    f_all = jax.jit(lambda st, ch: fused_chunk(st, ch, cam, cfg))
    t_all = _med(f_all, st0, chunk)

    # --- odometry lane only
    def odo_chunk(odo, ch):
        def step(s, fr):
            s2, o = odometry_step(s, fr, cfg.lidar)
            return s2, o["pose"].t
        return jax.lax.scan(step, odo, ch)
    scan_only = {k: chunk[k] for k in ("points", "ranges", "valid")}
    f_odo = jax.jit(odo_chunk)
    t_odo = _med(f_odo, st0.odo, scan_only)

    # --- tracker lane only
    def trk_chunk(trk, images, key):
        def step(carry, img):
            s, k = carry
            k, k1 = jax.random.split(k)
            s2, tr = tracker_step(s, img, cam, cfg.tracker, k1)
            return (s2, k), tr.uv[0, 0]
        return jax.lax.scan(step, (trk, key), images)
    f_trk = jax.jit(trk_chunk)
    t_trk = _med(f_trk, st0.trk, chunk["image"], jax.random.PRNGKey(0))

    # --- fusion lane only (tracker+odometry outputs precomputed once)
    _, (tracks, poses_t, poses_q) = jax.jit(
        lambda st, ch: _collect_inputs(st, ch, cam, cfg))(st0, chunk)
    jax.block_until_ready(tracks)

    def fus_chunk(est, tracks, pt, pq, key):
        def step(carry, inp):
            s, k = carry
            tr, t, q = inp
            k, k1 = jax.random.split(k)
            s2, out = fusion_step(s, tr, Pose(t, q), cfg.estimator, k1)
            return (s2, k), out.pose.t
        return jax.lax.scan(step, (est, key), (tracks, pt, pq))
    f_fus = jax.jit(fus_chunk)
    t_fus = _med(f_fus, st0.est, tracks, poses_t, poses_q,
                 jax.random.PRNGKey(0))

    out = {
        "backend": jax.default_backend(),
        "chunk": CHUNK,
        "composed_ms_per_frame": t_all / CHUNK * 1e3,
        "odometry_ms_per_frame": t_odo / CHUNK * 1e3,
        "tracker_ms_per_frame": t_trk / CHUNK * 1e3,
        "fusion_ms_per_frame": t_fus / CHUNK * 1e3,
    }
    print(json.dumps(out, indent=1))
    with open(_os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "LANES.json"), "w") as f:
        json.dump(out, f, indent=1)


def _collect_inputs(st, ch, cam, cfg):
    """Run odometry+tracker over the chunk, stacking fusion inputs."""
    from lmono_tpu.estimator.tracker import tracker_step
    from lmono_tpu.lidar.odometry import odometry_step

    def step(carry, fr):
        odo, trk, key = carry
        key, k1 = jax.random.split(key)
        scan = {k: fr[k] for k in ("points", "ranges", "valid")}
        odo2, lo = odometry_step(odo, scan, cfg.lidar)
        trk2, track = tracker_step(trk, fr["image"], cam, cfg.tracker, k1)
        return (odo2, trk2, key), (track, lo["pose"].t, lo["pose"].q)
    return jax.lax.scan(step, (st.odo, st.trk, st.key), ch)


if __name__ == "__main__":
    main()
