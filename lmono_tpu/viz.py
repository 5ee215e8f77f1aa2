"""Debug visualization: tracked-feature overlays, depth maps, loop mosaics,
trajectory plots — written as PNG files.

Replaces the reference's ROS/RViz visual surface (`src/visualizer/
Visualizer.cc` publishers + per-frame debug imagery saved by
`FeatureTracker.cc:161-162` and `KeyFrame.cc:594-635`) with file outputs.
"""

from __future__ import annotations

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    return img


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(_to_u8(img)).save(path)


def draw_tracks(image, uv, alive, track_cnt=None, radius: int = 2):
    """Overlay tracked features: green = long track, red = fresh
    (the reference's track image, FeatureTracker.cc:505-530)."""
    img = _to_u8(image).copy()
    H, W, _ = img.shape
    uv = np.asarray(uv)
    alive = np.asarray(alive)
    cnt = np.asarray(track_cnt) if track_cnt is not None else \
        np.full(len(uv), 10)
    for i in range(len(uv)):
        if not alive[i]:
            continue
        x, y = int(round(uv[i, 0])), int(round(uv[i, 1]))
        if not (0 <= x < W and 0 <= y < H):
            continue
        frac = min(cnt[i] / 20.0, 1.0)
        color = np.array([255 * (1 - frac), 255 * frac, 0], np.uint8)
        y0, y1 = max(0, y - radius), min(H, y + radius + 1)
        x0, x1 = max(0, x - radius), min(W, x + radius + 1)
        img[y0:y1, x0:x1] = color
    return img


def depth_to_color(depth, mask, d_max: float = 80.0):
    """Colorize a depth map (turbo-ish ramp) for inspection
    (reference publishes depth/projection images, map_build_node.cc:294-297)."""
    d = np.asarray(depth)
    m = np.asarray(mask)
    x = np.clip(d / d_max, 0, 1)
    r = np.clip(1.5 - np.abs(2.0 * x - 1.0) * 2.0, 0, 1) + x * 0.3
    g = np.clip(1.2 - np.abs(2.0 * x - 0.6) * 2.0, 0, 1)
    b = np.clip(1.0 - x * 1.5, 0, 1)
    img = np.stack([np.clip(r, 0, 1), g, b], -1)
    img[~m] = 0.0
    return img


def loop_mosaic(img_cur, img_old, uv_cur, uv_old, matches_ok):
    """Side-by-side loop match visualization (KeyFrame.cc:594-635)."""
    a = _to_u8(img_cur)
    b = _to_u8(img_old)
    H = max(a.shape[0], b.shape[0])
    canvas = np.zeros((H, a.shape[1] + b.shape[1], 3), np.uint8)
    canvas[: a.shape[0], : a.shape[1]] = a
    canvas[: b.shape[0], a.shape[1]:] = b
    off = a.shape[1]
    uv_cur = np.asarray(uv_cur)
    uv_old = np.asarray(uv_old)
    ok = np.asarray(matches_ok)
    for i in range(len(uv_cur)):
        if not ok[i]:
            continue
        x0, y0 = int(uv_cur[i, 0]), int(uv_cur[i, 1])
        x1, y1 = int(uv_old[i, 0]) + off, int(uv_old[i, 1])
        n = max(abs(x1 - x0), abs(y1 - y0), 1)
        xs = np.linspace(x0, x1, n).astype(int)
        ys = np.linspace(y0, y1, n).astype(int)
        inb = (xs >= 0) & (xs < canvas.shape[1]) & (ys >= 0) & (ys < H)
        canvas[ys[inb], xs[inb]] = [0, 255, 255]
    return canvas


def plot_trajectories(path: str, trajs: dict, plane=("x", "y")):
    """Top-down trajectory comparison plot (external eval parity)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ax_idx = {"x": 0, "y": 1, "z": 2}
    i, j = ax_idx[plane[0]], ax_idx[plane[1]]
    fig, ax = plt.subplots(figsize=(8, 8))
    for name, pose in trajs.items():
        t = np.asarray(pose.t)
        ax.plot(t[:, i], t[:, j], label=name, linewidth=1.2)
    ax.set_xlabel(plane[0] + " [m]")
    ax.set_ylabel(plane[1] + " [m]")
    ax.axis("equal")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
