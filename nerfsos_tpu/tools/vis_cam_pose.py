"""Camera pose visualization: plot frustum pyramids of a pose set.

Parity: reference ``utils/vis_cam_pose.py`` + ``utils/camera_pose_visualizer.py``
(matplotlib 3-D frustum plotter over extrinsics).

CLI: ``python -m nerfsos_tpu.tools.vis_cam_pose --poses poses.npy --out p.png``
"""
from __future__ import annotations

import argparse

import numpy as np


class CameraPoseVisualizer:
    """Frustum pyramid plotter (matplotlib Poly3DCollection)."""

    def __init__(self, xlim, ylim, zlim):
        import matplotlib.pyplot as plt

        self.fig = plt.figure(figsize=(10, 8))
        self.ax = self.fig.add_subplot(projection="3d")
        self.ax.set_aspect("auto")
        self.ax.set_xlim(xlim)
        self.ax.set_ylim(ylim)
        self.ax.set_zlim(zlim)
        self.ax.set_xlabel("x")
        self.ax.set_ylabel("y")
        self.ax.set_zlabel("z")

    def extrinsic2pyramid(self, extrinsic: np.ndarray, color="r",
                          focal_len_scaled: float = 5.0, aspect_ratio: float = 0.3):
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        f, a = focal_len_scaled, aspect_ratio
        std = np.array(
            [[0, 0, 0, 1],
             [f * a, -f * a, f, 1], [f * a, f * a, f, 1],
             [-f * a, f * a, f, 1], [-f * a, -f * a, f, 1]]
        )
        if extrinsic.shape[0] == 3:
            extrinsic = np.concatenate([extrinsic, [[0, 0, 0, 1]]], 0)
        verts = (extrinsic @ std.T).T[:, :3]
        meshes = [
            [verts[0], verts[1], verts[2]], [verts[0], verts[2], verts[3]],
            [verts[0], verts[3], verts[4]], [verts[0], verts[4], verts[1]],
            [verts[1], verts[2], verts[3], verts[4]],
        ]
        self.ax.add_collection3d(
            Poly3DCollection(meshes, facecolors=color, linewidths=0.3,
                             edgecolors=color, alpha=0.35)
        )

    def save(self, path: str):
        self.fig.savefig(path, dpi=120, bbox_inches="tight")


def plot_poses(poses: np.ndarray, out_path: str, focal_scale: float = 0.3) -> None:
    import matplotlib.cm as cm

    centers = poses[:, :3, 3]
    lim = float(np.abs(centers).max()) * 1.3 + 1e-3
    viz = CameraPoseVisualizer([-lim, lim], [-lim, lim], [-lim, lim])
    n = poses.shape[0]
    for i, p in enumerate(poses):
        viz.extrinsic2pyramid(p, color=cm.rainbow(i / max(n - 1, 1)),
                              focal_len_scaled=focal_scale * lim)
    viz.save(out_path)
    print("wrote", out_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", required=True, help="[N,3,4] or [N,4,4] .npy")
    ap.add_argument("--out", default="poses.png")
    ap.add_argument("--focal_scale", type=float, default=0.3)
    a = ap.parse_args()
    plot_poses(np.load(a.poses), a.out, a.focal_scale)


if __name__ == "__main__":
    main()
