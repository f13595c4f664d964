"""Image reading/resizing helpers (host-side, PIL-backed).

Replaces the reference's ImageMagick ``mogrify`` subprocess minification
(``data/load_llff.py:8-57``) with in-process PIL resizing — no external
binaries, same ``images_{factor}`` cache-directory contract.
"""
from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np

IMG_EXTS = ("JPG", "jpg", "png", "jpeg", "PNG")


def imread(path: str) -> np.ndarray:
    """uint8 (or uint16) array; PNG gamma chunks ignored (PIL never applies them)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im)


def imwrite(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(arr).save(path)


def list_images(d: str) -> List[str]:
    return [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if any(f.endswith(ext) for ext in IMG_EXTS)
    ]


def minify(basedir: str, factors: Sequence[int] = (), resolutions: Sequence[Sequence[int]] = ()) -> None:
    """Create ``images_{f}`` / ``images_{w}x{h}`` downsampled copies as PNG.

    Directory contract parity: reference ``data/load_llff.py:8-57``.
    """
    from PIL import Image

    todo = []
    for r in factors:
        if not os.path.exists(os.path.join(basedir, f"images_{r}")):
            todo.append(("factor", r))
    for r in resolutions:
        if not os.path.exists(os.path.join(basedir, f"images_{r[1]}x{r[0]}")):
            todo.append(("res", r))
    if not todo:
        return

    src = list_images(os.path.join(basedir, "images"))
    for kind, r in todo:
        if kind == "factor":
            outdir = os.path.join(basedir, f"images_{r}")
        else:
            outdir = os.path.join(basedir, f"images_{r[1]}x{r[0]}")
        os.makedirs(outdir, exist_ok=True)
        print(f"Minifying {r} -> {outdir}")
        for f in src:
            with Image.open(f) as im:
                if kind == "factor":
                    size = (round(im.width / r), round(im.height / r))
                else:
                    size = (int(r[1]), int(r[0]))
                im = im.resize(size, Image.LANCZOS)
                name = os.path.splitext(os.path.basename(f))[0] + ".png"
                im.save(os.path.join(outdir, name))


def resize_area(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Area-averaging resize (cv2.INTER_AREA equivalent) for float images."""
    import cv2

    return cv2.resize(img, (width, height), interpolation=cv2.INTER_AREA)
