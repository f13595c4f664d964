"""Visualization helpers: to8b, colorized depth maps, segmentation palette.

Parity: reference ``utils/image.py:37-122, 162-163`` and
``engines/eval.py:277-283`` (``seg2color``).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

COLOR_PALETTE: Dict[int, Tuple[int, int, int]] = {
    0: (0, 0, 0),
    1: (255, 255, 255), 2: (214, 168, 168), 3: (50, 115, 53),
    4: (177, 78, 78), 5: (87, 41, 41), 6: (29, 14, 14),
    7: (222, 210, 179), 8: (168, 186, 214), 9: (111, 140, 187), 10: (68, 97, 144),
    28: (244, 247, 50),
    18: (247, 214, 253), 20: (231, 132, 250), 24: (103, 5, 123),
    11: (245, 250, 245), 12: (224, 241, 225), 13: (203, 232, 204), 14: (182, 223, 184),
    15: (161, 214, 164), 16: (140, 205, 143), 17: (119, 196, 123), 19: (98, 187, 103),
    21: (78, 177, 83), 22: (68, 157, 73), 23: (59, 136, 63), 25: (50, 115, 53),
    26: (41, 94, 44), 27: (32, 73, 34),
    29: (239, 220, 220), 30: (177, 78, 78),
    31: (222, 210, 179), 32: (200, 180, 128), 33: (177, 150, 78), 34: (127, 107, 55),
}


def to8b(x: np.ndarray) -> np.ndarray:
    """Min-max normalize to uint8 (reference ``utils/image.py:162-163``)."""
    x = np.asarray(x)
    rng = x.max() - x.min()
    if rng == 0:
        return np.zeros_like(x, dtype=np.uint8)
    return (255 * (x - x.min()) / rng).astype(np.uint8)


def seg2color(seg: np.ndarray, palette: Dict[int, Tuple[int, int, int]] = COLOR_PALETTE) -> np.ndarray:
    """[H, W] labels -> [H, W, 3] uint8."""
    out = np.zeros((seg.shape[0], seg.shape[1], 3), np.uint8)
    for label, color in palette.items():
        out[seg == label] = color
    return out


def get_vertical_colorbar(h: int, vmin: float, vmax: float, cmap_name: str = "jet",
                          label: Optional[str] = None) -> np.ndarray:
    """Rendered matplotlib colorbar strip (reference ``utils/image.py:53-90``)."""
    import matplotlib as mpl
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    fig = Figure(figsize=(1.2, 8), dpi=100)
    fig.subplots_adjust(right=1.5)
    canvas = FigureCanvasAgg(fig)
    ax = fig.add_subplot(111)
    cmap = mpl.colormaps[cmap_name]
    norm = mpl.colors.Normalize(vmin=vmin, vmax=vmax)
    tick_loc = np.linspace(vmin, vmax, 6)
    cb = mpl.colorbar.ColorbarBase(ax, cmap=cmap, norm=norm, ticks=tick_loc,
                                   orientation="vertical")
    cb.set_ticklabels([f"{x:3.2f}" for x in tick_loc])
    cb.ax.tick_params(labelsize=18, rotation=0)
    if label is not None:
        cb.set_label(label)
    fig.tight_layout()
    canvas.draw()
    s, (width, height) = canvas.print_to_buffer()
    im = np.frombuffer(s, np.uint8).reshape((height, width, 4))[:, :, :3].astype(np.float32) / 255.0
    if h != im.shape[0]:
        import cv2

        w = int(im.shape[1] / im.shape[0] * h)
        im = cv2.resize(im, (w, h), interpolation=cv2.INTER_AREA)
    return im


def colorize_np(x: np.ndarray, cmap_name: str = "jet", mask: Optional[np.ndarray] = None,
                append_cbar: bool = False):
    """Colormap a 2-D array; optional colorbar strip appended.

    Parity: reference ``utils/image.py:93-122``.
    """
    import matplotlib as mpl

    x = np.array(x, copy=True)
    if mask is not None:
        vmin = np.min(x[mask])
        vmax = np.max(x[mask])
        vmin = vmin - np.abs(vmin) * 0.01
        x[np.logical_not(mask)] = vmin
        x = np.clip(x, vmin, vmax)
    else:
        vmin = x.min()
        vmax = x.max() + 1e-5
    x = (x - vmin) / (vmax - vmin)
    x_new = mpl.colormaps[cmap_name](x)[:, :, :3]
    if mask is not None:
        m = np.float32(mask[:, :, None])
        x_new = x_new * m
    cbar = get_vertical_colorbar(h=x.shape[0], vmin=vmin, vmax=vmax, cmap_name=cmap_name)
    if append_cbar:
        return np.concatenate([x_new, np.zeros_like(x_new[:, :5, :]), cbar], axis=1)
    return x_new, cbar
