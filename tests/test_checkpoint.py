"""Checkpoint/resume: bitwise state restoration across all subsystem states."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.config import synthetic_config
from lmono_tpu.estimator.window import WindowState
from lmono_tpu.io.synthetic import synthetic_T_CL
from lmono_tpu.lidar.odometry import OdometryState
from lmono_tpu.utils.checkpoint import load_state, save_state


def test_roundtrip_window_state(tmp_path):
    cfg = synthetic_config()
    st = WindowState.init(cfg.estimator, synthetic_T_CL())
    st = st._replace(t=st.t + 1.5, count=jnp.asarray(3, jnp.int32))
    path = os.path.join(tmp_path, "w.npz")
    n = save_state(path, st)
    assert n > 5
    st2 = load_state(path, WindowState.init(cfg.estimator, synthetic_T_CL()))
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_odometry_state(tmp_path):
    cfg = synthetic_config()
    st = OdometryState.init(cfg.lidar)
    st = st._replace(frame=jnp.asarray(7, jnp.int32))
    path = os.path.join(tmp_path, "o.npz")
    save_state(path, st)
    st2 = load_state(path, OdometryState.init(cfg.lidar))
    assert int(st2.frame) == 7


def test_shape_mismatch_raises(tmp_path):
    cfg = synthetic_config()
    st = OdometryState.init(cfg.lidar)
    path = os.path.join(tmp_path, "o.npz")
    save_state(path, st)
    import dataclasses
    other = OdometryState.init(dataclasses.replace(cfg.lidar,
                                                   map_edge_capacity=123))
    try:
        load_state(path, other)
        assert False, "should have raised"
    except ValueError as e:
        assert "shape" in str(e)
