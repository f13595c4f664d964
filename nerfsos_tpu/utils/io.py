"""Artifact writers: PNG, mp4, MRC density volumes, PLY voxel clouds.

The reference leans on ``mrc`` and ``open3d`` (``engines/eval.py:300-343``),
neither of which exists in this image — the MRC2014 header and binary PLY are
written directly instead (both formats are simple and documented).
"""
from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np


def write_png(path: str, arr: np.ndarray) -> None:
    import imageio

    arr = np.asarray(arr)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    imageio.imwrite(path, arr)


def write_video(path: str, frames: np.ndarray, fps: int = 30, quality: int = 8) -> None:
    """frames: [T, H, W, 3] (or [T, H, W]) uint8.

    The reference uses imageio-ffmpeg (``utils/image.py:183-184``); this image
    has no ffmpeg, so cv2's mp4v writer is the default with imageio fallback.
    """
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = np.repeat(frames[..., None], 3, axis=-1)
    if frames.ndim == 4 and frames.shape[-1] == 1:
        frames = np.repeat(frames, 3, axis=-1)
    try:
        import cv2

        h, w = frames.shape[1:3]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not vw.isOpened():
            raise RuntimeError("cv2 VideoWriter failed to open")
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
    except Exception:
        import imageio

        imageio.mimwrite(path, frames, fps=fps, quality=quality)


def write_mrc(path: str, volume: np.ndarray, voxel_size: float = 1.0) -> None:
    """Minimal MRC2014 (mode 2, float32) volume writer.

    Matches what ``mrc.imsave`` produces for the density export
    (``engines/eval.py:304``); readable by Chimera(X)/EMAN2.
    """
    vol = np.ascontiguousarray(volume, np.float32)
    nz, ny, nx = vol.shape
    header = bytearray(1024)
    struct.pack_into("<3i", header, 0, nx, ny, nz)       # NX NY NZ
    struct.pack_into("<i", header, 12, 2)                # MODE 2 = float32
    struct.pack_into("<3i", header, 16, 0, 0, 0)         # NXSTART...
    struct.pack_into("<3i", header, 28, nx, ny, nz)      # MX MY MZ
    struct.pack_into("<3f", header, 40, nx * voxel_size, ny * voxel_size, nz * voxel_size)
    struct.pack_into("<3f", header, 52, 90.0, 90.0, 90.0)
    struct.pack_into("<3i", header, 64, 1, 2, 3)         # MAPC MAPR MAPS
    struct.pack_into("<3f", header, 76, float(vol.min()), float(vol.max()), float(vol.mean()))
    struct.pack_into("<i", header, 88, 1)                # ISPG
    header[208:212] = b"MAP "
    header[212:216] = b"\x44\x44\x00\x00"                # little-endian machine stamp
    struct.pack_into("<f", header, 216, float(vol.std()))
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(vol.tobytes())


def read_mrc(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.read(1024)
        nx, ny, nz = struct.unpack_from("<3i", header, 0)
        (mode,) = struct.unpack_from("<i", header, 12)
        assert mode == 2, "only float32 supported"
        data = np.frombuffer(f.read(nx * ny * nz * 4), np.float32)
    return data.reshape(nz, ny, nx)


def write_ply_points(path: str, points: np.ndarray,
                     colors: Optional[np.ndarray] = None) -> None:
    """Binary little-endian PLY point cloud."""
    points = np.ascontiguousarray(points, np.float32)
    n = points.shape[0]
    props = "property float x\nproperty float y\nproperty float z\n"
    if colors is not None:
        colors = np.ascontiguousarray(colors, np.uint8)
        props += "property uchar red\nproperty uchar green\nproperty uchar blue\n"
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n{props}end_header\n"
    ).encode()
    with open(path, "wb") as f:
        f.write(header)
        if colors is None:
            f.write(points.tobytes())
        else:
            dt = np.dtype([("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
            rec = np.empty(n, dt)
            rec["xyz"] = points
            rec["rgb"] = colors
            f.write(rec.tobytes())


def write_voxel_ply(path: str, occupancy: np.ndarray, thres: float = 1e-6) -> None:
    """Occupied-voxel centers as a PLY point cloud (replaces open3d voxel grid
    export, reference ``engines/eval.py:310-343``)."""
    xyz = np.stack((occupancy > thres).nonzero(), -1).astype(np.float32)
    xyz = xyz / np.array(occupancy.shape)
    write_ply_points(path, xyz)


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path
