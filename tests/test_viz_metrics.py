"""Smoke tests for visualization and metrics utilities."""

import json
import os

import numpy as np

from lmono_tpu.utils.metrics import MetricsLogger
from lmono_tpu.viz import (
    depth_to_color,
    draw_tracks,
    loop_mosaic,
    plot_trajectories,
    save_png,
)
from lmono_tpu.utils.lie import Pose
import jax.numpy as jnp


def test_draw_tracks_and_save(tmp_path):
    img = np.random.RandomState(0).rand(60, 80)
    uv = np.array([[10.0, 10.0], [70.0, 50.0], [200.0, 10.0]])
    alive = np.array([True, True, True])
    out = draw_tracks(img, uv, alive, track_cnt=np.array([1, 25, 5]))
    assert out.shape == (60, 80, 3)
    assert (out[10, 10] != out[11, 20]).any()
    save_png(os.path.join(tmp_path, "t.png"), out)
    assert os.path.getsize(os.path.join(tmp_path, "t.png")) > 100


def test_depth_color_and_mosaic():
    d = np.random.RandomState(1).rand(40, 50) * 60
    m = d > 10
    img = depth_to_color(d, m)
    assert img.shape == (40, 50, 3)
    assert (img[~m] == 0).all()
    a = np.random.RandomState(2).rand(40, 50)
    mos = loop_mosaic(a, a, [[5, 5]], [[10, 10]], [True])
    assert mos.shape == (40, 100, 3)
    assert (mos == [0, 255, 255]).all(-1).any()


def test_plot_trajectories(tmp_path):
    t = jnp.asarray(np.random.RandomState(3).rand(50, 3) * 10)
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (50, 1))
    p = os.path.join(tmp_path, "traj.png")
    plot_trajectories(p, {"est": Pose(t, q), "gt": Pose(t + 1, q)})
    assert os.path.getsize(p) > 1000


def test_metrics_logger(tmp_path):
    path = os.path.join(tmp_path, "m.jsonl")
    ml = MetricsLogger(path)
    for i in range(5):
        ml.log(frame=i, ate=0.1 * i, n_tracked=100 - i)
    ml.close()
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 5 and abs(lines[3]["ate"] - 0.3) < 1e-9
    s = ml.summary()
    assert s["n_records"] == 5
    assert abs(s["ate"]["mean"] - 0.2) < 1e-6
