"""Notebook-equivalent LLFF ray exporter.

Parity: reference ``data/export_nerf.ipynb`` — the interactive notebook that
converts a raw LLFF scene (``poses_bounds.npy`` + ``images/``) into the flat
``.npy`` ray contract: ``rays_{train,test}.npy [N,H,W,2,3]``,
``rgbs_{train,test}.npy [N,H,W,3]``, ``rays_exhibit.npy`` from the render
path, and a ``meta.json`` holding only ``near``/``far``. The notebook's
constants are preserved (factor=8, recenter, bd_factor=.75, ``::8`` holdout,
``near = bds.min()*0.9``, ``far = bds.max()``).

``data/gen_dataset.py`` (this package) is the production superset — it adds
``masks_*``/``val`` splits and a full meta dict; this CLI exists so the one
reference workflow with no direct counterpart (scenes prepared the notebook
way, consumed by the plain Ray/Exhibit datasets) is a single command instead
of a notebook session. Plain-LLFF scenes carry no mask dir, so the loader's
mask requirement is relaxed here (``mask_fallback_imgdir=True``) exactly as
the notebook's bmild loader, which has no mask concept at all.

CLI: ``python -m nerfsos_tpu.tools.export_nerf --data_path <scene_dir>
[--factor 8] [--llffhold 8] [--spherify] [--output_path <dir>]``
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from nerfsos_tpu.data import ray_utils
from nerfsos_tpu.data.load_llff import load_llff_data


def export_nerf(
    data_path: str,
    output_path: str = "",
    factor: int = 8,
    llffhold: int = 8,
    spherify: bool = False,
) -> dict:
    """Run the notebook's export flow; returns the meta dict it wrote."""
    output_path = output_path or data_path
    images, poses, bds, render_poses, _, _ = load_llff_data(
        data_path, factor=factor, recenter=True, bd_factor=0.75,
        spherify=spherify, mask_fallback_imgdir=True,
    )
    hwf = poses[0, :3, -1]
    poses = poses[:, :3, :4]
    H, W, focal = int(hwf[0]), int(hwf[1]), float(hwf[2])

    # Notebook split: every 8th view is test (== val), the rest train.
    i_test = np.arange(images.shape[0])[::llffhold]
    i_train = np.array(
        [i for i in np.arange(images.shape[0]) if i not in i_test]
    )

    near = float(bds.min()) * 0.9
    far = float(bds.max())

    K = ray_utils.persp_intrinsics(H, W, focal)
    rays = ray_utils.persp_rays_batch(H, W, K, poses)  # [N, H, W, 2, 3]
    render_poses = np.asarray(render_poses)
    rays_exhibit = ray_utils.persp_rays_batch(H, W, K, render_poses[:, :3, :4])

    os.makedirs(output_path, exist_ok=True)
    for split, idx in [("train", i_train), ("test", i_test)]:
        np.save(os.path.join(output_path, f"rays_{split}.npy"), rays[idx])
        np.save(
            os.path.join(output_path, f"rgbs_{split}.npy"),
            images[idx].astype(np.float32),
        )
    np.save(os.path.join(output_path, "rays_exhibit.npy"), rays_exhibit)

    meta = {"near": near, "far": far}
    with open(os.path.join(output_path, "meta.json"), "w") as f:
        json.dump(meta, f)
    print(
        f"Exported {len(i_train)} train / {len(i_test)} test views "
        f"({H}x{W}) + {len(rays_exhibit)} exhibit poses to {output_path}"
    )
    return meta


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--data_path", "--datadir", required=True)
    p.add_argument("--output_path", default="")
    p.add_argument("--factor", type=int, default=8)
    p.add_argument("--llffhold", type=int, default=8)
    p.add_argument("--spherify", action="store_true", default=False)
    a = p.parse_args()
    export_nerf(a.data_path, a.output_path, a.factor, a.llffhold, a.spherify)


if __name__ == "__main__":
    main()
