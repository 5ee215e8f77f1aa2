"""System-level checkpoint/resume + deterministic replay tests."""

import dataclasses
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
def test_checkpoint_resume_with_loops_applies_closure(tmp_path):
    """Resume with the loop lane enabled, then apply a closure: the per-node
    history (_node_frames/_node_raw_cam) must be restored from the
    checkpoint — before the fix the first post-load closure raised
    IndexError on self._node_raw_cam[last]."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    cfg = synthetic_config()
    cfg = cfg.replace(loop=dataclasses.replace(
        cfg.loop, skip_time=0.0, skip_dis=0.0))
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    frames = _make_inputs(16, cfg, T_CL)

    sys_a = SlamSystem(cfg, enable_loop=True, enable_mapping=False)
    for s, i in frames:
        sys_a.process(s, i)
    assert sys_a._n_nodes >= 2, "need pose-graph nodes for the test"
    ckpt = os.path.join(tmp_path, "state.npz")
    sys_a.save_checkpoint(ckpt)

    sys_b = SlamSystem(cfg, enable_loop=True, enable_mapping=False)
    sys_b.load_checkpoint(ckpt)
    assert len(sys_b._node_raw_cam) == sys_b._n_nodes
    assert sys_b._node_frames == sys_a._node_frames
    assert len(sys_b._raw_poses) == len(frames)

    # manufacture a found detection between node 0 and the newest node and
    # reap it — exercises the exact path that crashed after resume
    last = sys_b._n_nodes - 1
    rel = sys_b._node_raw_cam[0].inverse().compose(
        sys_b._node_raw_cam[last])
    res = SimpleNamespace(
        found=jnp.asarray(True), old_seq=jnp.asarray(0, jnp.int32),
        rel_t=rel.t, rel_q=rel.q, refined=jnp.asarray(False))
    sys_b._pending.append({"res": res, "node_idx": last,
                           "node_pose": sys_b._node_raw_cam[last],
                           "time": sys_b.frame_idx * 0.1})
    applied = sys_b._reap_loops()
    assert applied == 1
    # full-trajectory export spans pre-resume history too
    traj = sys_b.final_trajectory()
    assert np.asarray(traj.t).shape[0] == len(frames)


def test_load_state_mismatch_names_leaf(tmp_path):
    """Shape-mismatch errors name the offending key path so callers can
    distinguish a grown pose graph from an incompatible checkpoint."""
    from lmono_tpu.utils.checkpoint import load_state, save_state

    path = os.path.join(tmp_path, "s.npz")
    save_state(path, {"a": np.zeros((3,)), "b": np.zeros((2, 2))})
    with pytest.raises(ValueError, match=r"'b'"):
        load_state(path, {"a": np.zeros((3,)), "b": np.zeros((4, 2))})


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
