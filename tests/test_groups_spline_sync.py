"""Tests: SO2/SE2/Sim3 groups, splines, measurement sync, extrinsic PnP."""

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.io.sync import MeasurementSync
from lmono_tpu.utils.groups import (
    se2_exp,
    se2_log,
    sim3_exp,
    sim3_log,
    so2_exp,
    so2_log,
)
from lmono_tpu.utils.lie import Pose, quat_rotate, so3_exp_quat
from lmono_tpu.utils.spline import (
    cubic_spline_eval,
    cubic_spline_fit,
    pose_bspline_resample,
)


# ---------------------------------------------------------------- SO2 / SE2

def test_so2_roundtrip():
    th = jnp.linspace(-3.0, 3.0, 13)
    assert np.allclose(so2_log(so2_exp(th)), th, atol=1e-6)


def test_se2_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.normal(size=(32, 3)) * np.array([2.0, 2.0, 1.5]),
                     jnp.float32)
    g = se2_exp(xi)
    assert np.allclose(se2_log(g), xi, atol=1e-4)


def test_se2_compose_inverse_matrix():
    rng = np.random.default_rng(1)
    a = se2_exp(jnp.asarray(rng.normal(size=3), jnp.float32))
    b = se2_exp(jnp.asarray(rng.normal(size=3), jnp.float32))
    ab = a.compose(b)
    assert np.allclose(ab.matrix(), a.matrix() @ b.matrix(), atol=1e-5)
    ident = a.compose(a.inverse()).matrix()
    assert np.allclose(ident, np.eye(3), atol=1e-5)
    x = jnp.array([0.3, -1.2])
    assert np.allclose(a.apply(x), (a.matrix() @ jnp.array([0.3, -1.2, 1.0]))[:2],
                       atol=1e-5)


# -------------------------------------------------------------------- Sim3

def test_sim3_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    xi = np.concatenate([
        rng.normal(size=(64, 3)) * 2.0,          # rho
        rng.normal(size=(64, 3)) * 1.0,          # phi
        rng.normal(size=(64, 1)) * 0.5,          # sigma
    ], axis=-1)
    # include the degenerate corners explicitly
    xi[0] = 0.0
    xi[1, 3:6] = 0.0            # no rotation, with scale
    xi[2, 6] = 0.0              # rotation, no scale
    xi[3, 3:] = 0.0             # pure translation
    # keep |phi| < pi so log is the principal branch (tangent comparable)
    nrm = np.linalg.norm(xi[:, 3:6], axis=-1, keepdims=True)
    xi[:, 3:6] *= np.minimum(1.0, 2.9 / np.maximum(nrm, 1e-9))
    xi = jnp.asarray(xi, jnp.float32)
    g = jax.vmap(sim3_exp)(xi)
    back = jax.vmap(sim3_log)(g)
    assert np.allclose(back, xi, atol=2e-4, rtol=1e-4)
    # and exp∘log is identity on the group regardless of branch
    g2 = jax.vmap(sim3_exp)(back)
    assert np.allclose(jax.vmap(lambda p: p.matrix())(g2),
                       jax.vmap(lambda p: p.matrix())(g), atol=1e-4)


def test_sim3_apply_matches_matrix():
    rng = np.random.default_rng(3)
    xi = jnp.asarray(rng.normal(size=7) * 0.7, jnp.float32)
    g = sim3_exp(xi)
    x = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    xh = jnp.concatenate([x, jnp.ones((5, 1))], -1)
    want = (g.matrix() @ xh.T).T[:, :3]
    assert np.allclose(g.apply(x), want, atol=1e-5)


def test_sim3_compose_inverse():
    rng = np.random.default_rng(4)
    a = sim3_exp(jnp.asarray(rng.normal(size=7) * 0.5, jnp.float32))
    b = sim3_exp(jnp.asarray(rng.normal(size=7) * 0.5, jnp.float32))
    ab = a.compose(b)
    assert np.allclose(ab.matrix(), a.matrix() @ b.matrix(), atol=1e-5)
    ident = a.compose(a.inverse())
    assert np.allclose(ident.matrix(), np.eye(4), atol=1e-5)


# ------------------------------------------------------------------ splines

def test_cubic_spline_interpolates_knots_and_midpoints():
    x = jnp.linspace(0.0, 2.0 * np.pi, 24)
    y = jnp.sin(x)
    sp = cubic_spline_fit(x, y)
    assert np.allclose(cubic_spline_eval(sp, x), y, atol=1e-5)
    xm = 0.5 * (x[:-1] + x[1:])
    assert np.allclose(cubic_spline_eval(sp, xm), np.sin(xm), atol=1e-3)


def test_cubic_spline_vector_values():
    x = jnp.linspace(0.0, 1.0, 9)
    y = jnp.stack([x ** 2, -x], axis=-1)
    sp = cubic_spline_fit(x, y)
    out = cubic_spline_eval(sp, jnp.array([0.25, 0.8]))
    assert out.shape == (2, 2)
    assert np.allclose(out[:, 1], [-0.25, -0.8], atol=1e-4)


def test_pose_bspline_constant_and_line():
    N = 10
    # constant pose trajectory → constant output
    poses = Pose(jnp.zeros((N, 3)) + jnp.array([1.0, 2.0, 3.0]),
                 jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (N, 4)))
    times = jnp.arange(N, dtype=jnp.float32)
    q = jnp.array([2.3, 4.7, 6.1])
    out = pose_bspline_resample(poses, times, q)
    assert np.allclose(out.t, jnp.array([1.0, 2.0, 3.0])[None], atol=1e-5)
    # straight-line trajectory → sampled points stay on the line (x = t)
    line = Pose(jnp.stack([times, 0 * times, 0 * times], -1),
                jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (N, 4)))
    out2 = pose_bspline_resample(line, times, q)
    assert np.allclose(out2.t[:, 1:], 0.0, atol=1e-5)
    # constant-velocity trajectory is reproduced exactly (extrapolated
    # endpoint padding makes the first/last knot intervals live too)
    assert np.allclose(out2.t[:, 0], q, atol=1e-4)


def test_pose_bspline_endpoint_intervals():
    """Queries inside the first and last knot intervals must track the
    trajectory, not collapse to a constant (round-1 advisor finding)."""
    N = 10
    times = jnp.arange(N, dtype=jnp.float32)
    line = Pose(jnp.stack([times, 0 * times, 0 * times], -1),
                jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (N, 4)))
    q = jnp.array([0.0, 0.5, 1.0, 8.0, 8.5, 9.0])
    out = pose_bspline_resample(line, times, q)
    assert np.allclose(out.t[:, 0], q, atol=1e-4), out.t[:, 0]


def test_se2_log_wraps_to_principal_angle():
    """se2_log of a composed transform with |theta| >= 2*pi must return the
    principal branch, not inf/NaN (V(theta) is singular at 2*pi)."""
    from lmono_tpu.utils.groups import SE2, se2_exp, se2_log

    g = se2_exp(jnp.array([1.0, 0.5, 2.5]))
    acc = g
    for _ in range(3):  # total theta = 7.5 rad > 2*pi
        acc = acc.compose(g)
    xi = se2_log(acc)
    assert np.all(np.isfinite(np.asarray(xi)))
    theta = float(xi[2])
    assert -np.pi < theta <= np.pi
    # round trip through the principal representative
    g2 = se2_exp(xi)
    assert np.allclose(np.asarray(g2.t), np.asarray(acc.t), atol=1e-4)
    assert np.allclose(np.cos(float(g2.theta)), np.cos(float(acc.theta)),
                       atol=1e-5)
    assert np.allclose(np.sin(float(g2.theta)), np.sin(float(acc.theta)),
                       atol=1e-5)


def test_pose_bspline_rotation_smooth():
    N = 8
    angles = jnp.linspace(0.0, 1.4, N)
    qs = jax.vmap(lambda a: so3_exp_quat(jnp.array([0.0, 0.0, 1.0]) * a))(angles)
    poses = Pose(jnp.zeros((N, 3)), qs)
    times = jnp.arange(N, dtype=jnp.float32)
    out = pose_bspline_resample(poses, times, jnp.array([3.5]))
    # rotating about z only: quaternion stays in span{w, z}
    assert float(jnp.abs(out.q[0, 1])) < 1e-5
    assert float(jnp.abs(out.q[0, 2])) < 1e-5


# ------------------------------------------------------------- measurement sync

def test_sync_basic_pairing_within_tolerance():
    s = MeasurementSync(delay_time=0.05)
    s.push_odometry(0.00, "o0")
    s.push_odometry(0.10, "o1")
    s.push_image(0.02, "i0")
    s.push_image(0.12, "i1")
    got = s.get_measurements()
    assert [(t, i, o) for t, i, o in got] == [(0.02, "i0", "o0"),
                                             (0.12, "i1", "o1")]


def test_sync_holds_image_until_odometry_arrives():
    s = MeasurementSync(delay_time=0.05)
    s.push_image(1.0, "img")
    assert s.get_measurements() == []          # odometry lagging: held
    s.push_odometry(1.01, "odo")
    assert s.get_measurements() == [(1.0, "img", "odo")]


def test_sync_drops_stale_odometry_and_orphan_images():
    s = MeasurementSync(delay_time=0.05)
    s.push_odometry(0.0, "stale")
    s.push_odometry(5.0, "future")
    s.push_image(1.0, "orphan")   # no odometry within ±0.05 → dropped
    s.push_image(5.0, "good")
    got = s.get_measurements()
    assert got == [(5.0, "good", "future")]
    assert s.n_dropped_images == 1
    assert s.n_dropped_odoms == 1


def test_sync_loop_queue_fifo():
    s = MeasurementSync()
    assert s.get_loop() is None
    s.push_loop("a")
    s.push_loop("b")
    assert s.get_loop() == "a"
    assert s.get_loop() == "b"
    assert s.get_loop() is None


# --------------------------------------------------- extrinsic estimation

def test_estimate_extrinsics_pinhole():
    from lmono_tpu.camera.calibration import estimate_extrinsics
    from lmono_tpu.camera.models import pinhole_camera

    cam = pinhole_camera(fx=718.856, fy=718.856, cx=607.19, cy=185.2,
                         width=1241, height=376)
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.uniform(-2, 2, size=(40, 3))
                    + np.array([0, 0, 8.0]), jnp.float32)
    true = Pose(jnp.array([0.3, -0.2, 0.5]),
                so3_exp_quat(jnp.array([0.05, -0.1, 0.2])))
    Xc = quat_rotate(true.q, X) + true.t
    uv = cam.space_to_plane(Xc)
    pose, inl, ok = estimate_extrinsics(cam, X, uv)
    assert bool(ok)
    assert np.allclose(pose.t, true.t, atol=1e-2)
    assert float(jnp.abs(jnp.dot(pose.q, true.q))) > 1.0 - 1e-5


# --------------------------------------------------- window consistency check

def test_window_consistency_check():
    from lmono_tpu.config import EstimatorConfig
    from lmono_tpu.estimator.window import WindowState, consistency_check

    cfg = EstimatorConfig()
    w = WindowState.init(cfg)
    n = w.w1
    ts = jnp.stack([jnp.arange(n, dtype=jnp.float32),
                    jnp.zeros(n), jnp.zeros(n)], -1)
    qs = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (n, 4))
    # optimized trajectory = laser trajectory shifted by a global offset
    w = w._replace(t=ts + jnp.array([5.0, -2.0, 1.0]), q=qs,
                   lt=ts, lq=qs, count=jnp.asarray(n, jnp.int32))
    out = consistency_check(w)
    assert float(out["max_rot_err_deg"]) < 1e-4
    assert float(out["max_trans_err_m"]) < 1e-4
    # perturb one pose → discrepancy shows on the adjacent pairs
    t2 = w.t.at[3].add(jnp.array([0.5, 0.0, 0.0]))
    out2 = consistency_check(w._replace(t=t2))
    assert float(out2["max_trans_err_m"]) > 0.4


# ------------------------------------------------------------ input replay log

def test_input_log_bitwise_roundtrip(tmp_path):
    from lmono_tpu.io.replay import InputLog

    rng = np.random.default_rng(11)
    log = InputLog()
    for i in range(3):
        log.append({
            "points": rng.normal(size=(64, 3)).astype(np.float32),
            "valid": rng.random(64) > 0.2,
            "image": (rng.random((24, 32)) * 255).astype(np.uint8),
            "time": np.float64(i) * 0.1,
        })
    p = str(tmp_path / "run.npz")
    log.save(p)
    back = InputLog.load(p)
    assert len(back) == 3
    for a, b in zip(log, back):
        assert sorted(a) == sorted(b)
        for k in a:
            assert a[k].dtype == b[k].dtype
            assert np.array_equal(a[k], b[k])
