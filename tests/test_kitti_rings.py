"""HDL-64E ring recovery + calib-derived config (real-KITTI readiness).

Simulates a two-block HDL-64E scan in the .bin's native laser-major order
and checks that (a) scan-order ring recovery is exact, (b) the two-block
elevation model matches, (c) the old uniform split would mis-assign a large
fraction of lower-block points (the failure mode being fixed), and (d) the
native C++ regrid agrees with the Python path.
"""

import os

import numpy as np
import pytest

from lmono_tpu.config import LidarConfig, kitti_config
from lmono_tpu.io.kitti import (
    HDL64_LOWER_STEP_DEG,
    HDL64_LOWER_TOP_DEG,
    HDL64_UPPER_STEP_DEG,
    HDL64_UPPER_TOP_DEG,
    config_from_calib,
    hdl64_ring_from_elevation,
    recover_rings_scanorder,
    scan_to_range_image,
)


def hdl64_elevations_deg() -> np.ndarray:
    """True two-block HDL-64E laser elevations, ring 0 = topmost."""
    upper = HDL64_UPPER_TOP_DEG - HDL64_UPPER_STEP_DEG * np.arange(32)
    lower = HDL64_LOWER_TOP_DEG - HDL64_LOWER_STEP_DEG * np.arange(32)
    return np.concatenate([upper, lower])


def simulate_hdl64_scan(n_cols: int = 600, seed: int = 0):
    """Laser-major scan (ring 0 first), azimuth sweeping the full circle,
    ranges from a flat-ground + ring-dependent wall world; some dropouts."""
    rng = np.random.RandomState(seed)
    elevs = np.deg2rad(hdl64_elevations_deg())
    pts, rings = [], []
    for ring, el in enumerate(elevs):
        azim = np.linspace(np.pi, -np.pi, n_cols, endpoint=False)
        azim += rng.uniform(-1e-4, 1e-4, n_cols)          # jitter
        keep = rng.rand(n_cols) > 0.1                     # 10% dropouts
        azim = azim[keep]
        r = np.where(el < -0.05, 1.6 / np.maximum(-np.sin(el), 0.05),
                     20.0 + 2.0 * np.sin(3 * azim))
        r = np.clip(r, 2.0, 70.0)
        x = r * np.cos(el) * np.cos(azim)
        y = r * np.cos(el) * np.sin(azim)
        z = r * np.sin(el)
        pts.append(np.stack([x, y, z, np.full_like(x, 0.5)], -1))
        rings.append(np.full(len(azim), ring))
    return (np.concatenate(pts).astype(np.float32),
            np.concatenate(rings).astype(np.int64))


def test_scanorder_ring_recovery_exact():
    xyz, true_ring = simulate_hdl64_scan()
    rec = recover_rings_scanorder(xyz, 64)
    assert rec is not None
    assert (rec == true_ring).mean() > 0.999


def test_two_block_elevation_model_matches():
    xyz, true_ring = simulate_hdl64_scan()
    r = np.linalg.norm(xyz[:, :3], axis=-1)
    elev = np.arcsin(xyz[:, 2] / r)
    ring = hdl64_ring_from_elevation(elev)
    assert (ring == true_ring).mean() > 0.99


def test_uniform_model_misassigns_lower_block():
    """The round-1 uniform split is wrong for the HDL-64E lower block —
    this quantifies the bug the two-block model fixes."""
    xyz, true_ring = simulate_hdl64_scan()
    r = np.linalg.norm(xyz[:, :3], axis=-1)
    elev = np.arcsin(xyz[:, 2] / r)
    lo, hi = np.deg2rad(-24.9), np.deg2rad(2.0)
    uniform = np.round((hi - elev) / (hi - lo) * 63).astype(np.int64)
    lower = true_ring >= 32
    mis = (uniform[lower] != true_ring[lower]).mean()
    assert mis > 0.5, f"uniform model unexpectedly fine ({mis:.2%} wrong)"


def test_scan_to_range_image_uses_recovered_rings():
    xyz, true_ring = simulate_hdl64_scan()
    cfg = LidarConfig(num_rings=64, horiz_res=512, min_range=1.0,
                      max_range=80.0)
    out = scan_to_range_image(xyz[:, :3], cfg, ring_mode="auto")
    assert out["valid"].shape == (64, 512)
    # every ring must be populated (uniform model would leave upper-block
    # rows nearly empty because 32 fine-spaced lasers collapse to ~13 rows)
    rows = out["valid"].sum(axis=1)
    assert (rows > 0.5 * 512 * 0.8).mean() > 0.95, rows

    # shuffled points (native order destroyed) must fall back cleanly
    perm = np.random.RandomState(1).permutation(len(xyz))
    out2 = scan_to_range_image(xyz[perm][:, :3], cfg, ring_mode="auto")
    rows2 = out2["valid"].sum(axis=1)
    assert (rows2 > 0).mean() > 0.9  # two-block elevation fallback works


def test_native_regrid_matches_python_hdl64():
    from lmono_tpu.native import load_native, regrid

    if load_native() is None:
        pytest.skip("native lib not built")
    xyz, _ = simulate_hdl64_scan()
    cfg = LidarConfig(num_rings=64, horiz_res=512)
    f_native = regrid(xyz, cfg)
    f_py = scan_to_range_image(xyz[:, :3], cfg, ring_mode="auto")
    agree = (f_native["valid"] == f_py["valid"]).mean()
    assert agree > 0.995, agree
    both = f_native["valid"] & f_py["valid"]
    # a few boundary cells pick a different (near-equal) winner between the
    # f32 C++ and f64 numpy elevation math — demand 99.5% exact agreement
    close = np.abs(f_native["ranges"][both] - f_py["ranges"][both]) < 1e-3
    assert close.mean() > 0.995, close.mean()


def test_config_from_calib():
    calib = {
        "P0": np.array([[707.09, 0, 601.89, 0],
                        [0, 707.09, 183.11, 0],
                        [0, 0, 1, 0]]),
        "Tr": np.array([[0.0, -1.0, 0.0, 0.1],
                        [0.0, 0.0, -1.0, -0.05],
                        [1.0, 0.0, 0.0, 0.3]]),
    }
    cfg = config_from_calib(calib)
    assert abs(cfg.camera.fx - 707.09) < 1e-6
    assert abs(cfg.camera.cx - 601.89) < 1e-6
    T = np.asarray(cfg.laser_to_camera).reshape(4, 4)
    np.testing.assert_allclose(T[:3, :], calib["Tr"])
    np.testing.assert_allclose(T[3], [0, 0, 0, 1])
    # differs from the seq-00 fallback constant
    base = kitti_config()
    assert not np.allclose(np.asarray(base.laser_to_camera).reshape(4, 4)[:3],
                           calib["Tr"])
