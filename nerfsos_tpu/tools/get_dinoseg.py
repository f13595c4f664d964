"""Standalone DINO k-means segmenter: images -> binary masks.

Parity: reference ``utils/get_dinoseg.py:220-290`` — run the frozen DINO ViT
on each image, k-means(2) over the patch features, upsample the patch labels
to pixels, orient labels so 1 = attended foreground, write ``masks/`` PNGs.
This is how the reference bootstraps the ``segments/`` / ``masks/`` dirs the
LLFF loader expects.

CLI: ``python -m nerfsos_tpu.tools.get_dinoseg --img_dir D [--out_dir D/masks]
[--dino_ckpt path.pth]``
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def dino_segment_image(dino, img: np.ndarray, n_clusters: int = 2) -> np.ndarray:
    """Returns [H, W] uint8 mask in {0, 1} with 1 = foreground."""
    import jax.numpy as jnp
    from sklearn.cluster import KMeans

    H, W = img.shape[:2]
    out = dino.get_vit_attn_feat(jnp.asarray(img[None], jnp.float32))
    feat = np.asarray(out["feat"])[0]  # [N, C]
    attn = np.asarray(out["attn"])[0, 0]  # [N]
    side = int(feat.shape[0] ** 0.5)

    labels = KMeans(n_clusters=n_clusters, random_state=0, n_init=10).fit(feat).labels_
    # orient: cluster with higher mean attention is foreground
    if attn[labels == 1].mean() < attn[labels == 0].mean():
        labels = 1 - labels
    patch_mask = labels.reshape(side, side).astype(np.float32)

    import cv2

    return (cv2.resize(patch_mask, (W, H), interpolation=cv2.INTER_NEAREST)).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img_dir", required=True)
    p.add_argument("--out_dir", default="")
    p.add_argument("--dino_ckpt", default="")
    p.add_argument("--n_clusters", type=int, default=2)
    a = p.parse_args()

    import jax

    from nerfsos_tpu.data.image_io import imread, imwrite, list_images
    from nerfsos_tpu.models.extractor import VitExtractor

    dino = VitExtractor("dino_vits16")
    if a.dino_ckpt and os.path.exists(a.dino_ckpt):
        dino.load_torch_checkpoint(a.dino_ckpt)
    else:
        dino.init(jax.random.PRNGKey(0))
        print("[Warning!] random DINO weights — masks will be noise without --dino_ckpt")

    out_dir = a.out_dir or os.path.join(a.img_dir, os.pardir, "masks")
    os.makedirs(out_dir, exist_ok=True)
    for f in list_images(a.img_dir):
        img = imread(f)[..., :3] / 255.0
        mask = dino_segment_image(dino, img, a.n_clusters)
        name = os.path.splitext(os.path.basename(f))[0] + ".png"
        imwrite(os.path.join(out_dir, name), mask * 255)
        print("wrote", os.path.join(out_dir, name))


if __name__ == "__main__":
    main()
