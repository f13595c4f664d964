"""Back-project depth maps to colored PLY point clouds.

Parity: reference ``utils/depth2points.py`` (open3d replaced by the native
PLY writer in ``utils/io.py``); includes the same >100 depth clamp-to-max
filter.

CLI: ``python -m nerfsos_tpu.tools.depth2points --depth d.npy --rgb img.png
--focal F --out out.ply [--pose pose.npy]``
"""
from __future__ import annotations

import argparse

import numpy as np

from nerfsos_tpu.utils.io import write_ply_points


def depth_to_points(depth: np.ndarray, K: np.ndarray, pose: np.ndarray | None = None,
                    scale: float = 1.0, max_depth: float = 100.0) -> np.ndarray:
    """Pinhole back-projection: [H, W] depth -> [H*W, 3] world points."""
    H, W = depth.shape
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    d = (depth / scale).reshape(-1)
    d = np.where(d > max_depth, d[d < max_depth].max() if np.any(d < max_depth) else max_depth, d)
    X = (u.reshape(-1) - K[0, 2]) / K[0, 0] * d
    Y = (v.reshape(-1) - K[1, 2]) / K[1, 1] * d
    pts = np.stack([X, Y, d], -1)
    if pose is not None:
        pts = pts @ pose[:3, :3].T + pose[:3, 3]
    return pts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", required=True, help=".npy depth map")
    p.add_argument("--rgb", default="", help="optional color image")
    p.add_argument("--pose", default="", help="optional [3,4]/[4,4] c2w .npy")
    p.add_argument("--focal", type=float, required=True)
    p.add_argument("--out", default="points.ply")
    p.add_argument("--scale", type=float, default=1.0)
    a = p.parse_args()

    depth = np.load(a.depth)
    if depth.ndim == 3:
        depth = depth[..., 0]
    H, W = depth.shape
    K = np.array([[a.focal, 0, W / 2], [0, a.focal, H / 2], [0, 0, 1]])
    pose = np.load(a.pose) if a.pose else None
    pts = depth_to_points(depth, K, pose, a.scale)

    colors = None
    if a.rgb:
        from nerfsos_tpu.data.image_io import imread

        colors = imread(a.rgb)[..., :3].reshape(-1, 3)
    write_ply_points(a.out, pts.astype(np.float32), colors)
    print(f"wrote {pts.shape[0]} points to {a.out}")


if __name__ == "__main__":
    main()
