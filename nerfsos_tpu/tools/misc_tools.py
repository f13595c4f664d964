"""Small offline utilities: images->video, resize, mask inversion, plane
format conversion.

Parity with the reference's standalone scripts ``utils/images2video.py``,
``utils/resize_imgs.py``, ``utils/reverse_mask.py``, ``utils/convert_planes.py``.

CLI: ``python -m nerfsos_tpu.tools.misc_tools <cmd> ...`` with cmd in
{images2video, resize, reverse_mask, convert_planes}.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def images2video(img_dir: str, out_path: str, fps: int = 30) -> None:
    from nerfsos_tpu.data.image_io import imread, list_images
    from nerfsos_tpu.utils.io import write_video

    frames = np.stack([imread(f)[..., :3] for f in list_images(img_dir)], 0)
    write_video(out_path, frames.astype(np.uint8), fps=fps)
    print(f"wrote {frames.shape[0]} frames to {out_path}")


def resize_imgs(img_dir: str, out_dir: str, factor: int = 0,
                width: int = 0, height: int = 0) -> None:
    from PIL import Image

    from nerfsos_tpu.data.image_io import list_images

    os.makedirs(out_dir, exist_ok=True)
    for f in list_images(img_dir):
        with Image.open(f) as im:
            size = (width, height) if width and height else (im.width // factor, im.height // factor)
            im.resize(size, Image.LANCZOS).save(
                os.path.join(out_dir, os.path.splitext(os.path.basename(f))[0] + ".png")
            )
    print("resized into", out_dir)


def reverse_mask(mask_dir: str, out_dir: str) -> None:
    """Invert binary masks (255 - m), as ``utils/reverse_mask.py`` does."""
    from nerfsos_tpu.data.image_io import imread, imwrite, list_images

    os.makedirs(out_dir, exist_ok=True)
    for f in list_images(mask_dir):
        m = imread(f)
        imwrite(os.path.join(out_dir, os.path.basename(f)), (255 - m).astype(np.uint8))
    print("inverted masks into", out_dir)


def convert_planes(in_path: str, out_path: str) -> None:
    """(n, p) plane rows -> (n, D) with D = n.p (``utils/convert_planes.py``)."""
    arr = np.load(in_path)
    norms, points = arr[:, :3], arr[:, 3:]
    D = np.sum(norms * points, axis=-1, keepdims=True)
    np.save(out_path, np.concatenate([norms, D], axis=-1))
    print(f"converted {arr.shape[0]} planes -> {out_path}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("images2video")
    s.add_argument("--img_dir", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--fps", type=int, default=30)

    s = sub.add_parser("resize")
    s.add_argument("--img_dir", required=True)
    s.add_argument("--out_dir", required=True)
    s.add_argument("--factor", type=int, default=0)
    s.add_argument("--width", type=int, default=0)
    s.add_argument("--height", type=int, default=0)

    s = sub.add_parser("reverse_mask")
    s.add_argument("--mask_dir", required=True)
    s.add_argument("--out_dir", required=True)

    s = sub.add_parser("convert_planes")
    s.add_argument("--input", required=True)
    s.add_argument("--output", required=True)

    a = p.parse_args()
    if a.cmd == "images2video":
        images2video(a.img_dir, a.out, a.fps)
    elif a.cmd == "resize":
        resize_imgs(a.img_dir, a.out_dir, a.factor, a.width, a.height)
    elif a.cmd == "reverse_mask":
        reverse_mask(a.mask_dir, a.out_dir)
    elif a.cmd == "convert_planes":
        convert_planes(a.input, a.output)


if __name__ == "__main__":
    main()
