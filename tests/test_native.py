"""Native C++ runtime tests: regrid parity with numpy, loader, PLY writer."""

import os
import subprocess

import numpy as np
import pytest

from lmono_tpu.config import LidarConfig
from lmono_tpu.io.kitti import scan_to_range_image
from lmono_tpu import native

CFG = LidarConfig(num_rings=16, horiz_res=256)


def _build_native():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(["make", "-C", os.path.join(root, "native")],
                   check=True, capture_output=True)


def _fake_scan(n=30000, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.uniform(2, 60, n)
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(np.deg2rad(-24.0), np.deg2rad(1.5), n)
    xyz = np.stack([d * np.cos(el) * np.cos(az), d * np.cos(el) * np.sin(az),
                    d * np.sin(el)], -1).astype(np.float32)
    inten = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    return np.concatenate([xyz, inten], -1)


def test_native_regrid_matches_numpy():
    _build_native()
    assert native.load_native() is not None, "native build missing"
    scan = _fake_scan()
    out_c = native.regrid(scan, CFG)
    out_py = scan_to_range_image(scan[:, :3], CFG)
    # same occupancy and near-identical closest ranges
    agree = out_c["valid"] == out_py["valid"]
    assert agree.mean() > 0.999
    both = out_c["valid"] & out_py["valid"]
    np.testing.assert_allclose(out_c["ranges"][both], out_py["ranges"][both],
                               rtol=1e-4, atol=1e-3)


def test_native_loader_prefetch(tmp_path):
    _build_native()
    if native.load_native() is None:
        pytest.skip("no native lib")
    # write 5 fake .bin frames
    for i in range(5):
        _fake_scan(seed=i).tofile(tmp_path / f"{i:06d}.bin")
    ld = native.NativeScanLoader(str(tmp_path), 5, CFG, prefetch=3)
    seen = []
    while True:
        f = ld.next()
        if f is None:
            break
        seen.append(f["index"])
        assert f["ranges"].shape == (CFG.num_rings, CFG.horiz_res)
        assert f["valid"].any()
    ld.close()
    assert seen == [0, 1, 2, 3, 4]


def test_native_ply_write(tmp_path):
    _build_native()
    pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    rgb = np.random.RandomState(1).rand(100, 3).astype(np.float32)
    path = str(tmp_path / "m.ply")
    n = native.ply_write(path, pts, rgb)
    assert n == 100
    data = open(path, "rb").read()
    assert b"element vertex 100" in data
    assert len(data) > 100 * 15
