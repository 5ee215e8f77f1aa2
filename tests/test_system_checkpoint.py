"""System-level checkpoint/resume + deterministic replay tests."""

import os

import jax
import numpy as np
import pytest

from lmono_tpu.config import synthetic_config
from lmono_tpu.io import synthetic as syn
from lmono_tpu.pipeline import SlamSystem
from lmono_tpu.utils.lie import Pose


def _make_inputs(n, cfg, T_CL):
    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(n)
    frames = []
    for i in range(n):
        p = Pose(traj.t[i], traj.q[i])
        scan = syn.simulate_lidar(scene, p, cfg.lidar, noise_std=0.01,
                                  key=jax.random.PRNGKey(i))
        img = syn.render_camera(scene, p.compose(T_CL.inverse()), cfg.camera)
        frames.append((jax.device_get(scan), np.asarray(img)))
    return frames


@pytest.mark.slow
def test_checkpoint_resume_continues_identically(tmp_path):
    cfg = synthetic_config()
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    frames = _make_inputs(10, cfg, T_CL)

    # run A: all 10 frames straight through
    sys_a = SlamSystem(cfg, enable_loop=False, enable_mapping=False)
    out_a = [sys_a.process(s, i) for s, i in frames]

    # run B: 6 frames, checkpoint, new system, resume, 4 more frames
    sys_b = SlamSystem(cfg, enable_loop=False, enable_mapping=False)
    for s, i in frames[:6]:
        sys_b.process(s, i)
    ckpt = os.path.join(tmp_path, "state.npz")
    sys_b.save_checkpoint(ckpt)

    sys_c = SlamSystem(cfg, enable_loop=False, enable_mapping=False)
    sys_c.load_checkpoint(ckpt)
    out_c = [sys_c.process(s, i) for s, i in frames[6:]]

    # resumed trajectory must match the straight-through run closely
    for oa, oc in zip(out_a[6:], out_c):
        d = float(np.linalg.norm(np.asarray(oa["pose"].t)
                                 - np.asarray(oc["pose"].t)))
        assert d < 2e-2, d


@pytest.mark.slow
def test_deterministic_replay():
    """Identical inputs through two fresh systems → identical outputs
    (bitwise-deterministic functional pipeline; reference can't replay)."""
    cfg = synthetic_config()
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    frames = _make_inputs(6, cfg, T_CL)
    outs = []
    for _ in range(2):
        system = SlamSystem(cfg, enable_loop=False, enable_mapping=False)
        outs.append([system.process(s, i)["pose"] for s, i in frames])
    for pa, pb in zip(*outs):
        np.testing.assert_array_equal(np.asarray(pa.t), np.asarray(pb.t))
        np.testing.assert_array_equal(np.asarray(pa.q), np.asarray(pb.q))
