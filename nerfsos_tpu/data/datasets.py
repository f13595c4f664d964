"""Online data pipeline: numpy datasets + batch samplers feeding the TPU.

TPU-native rewrite of the reference datasets (``data/datasets.py`` +
``data/collater.py`` in VITA-Group/NeRF-SOS). The torch DataLoader / collater
machinery (8 worker processes shuffling a precomputed ray pool) is replaced by
vectorized numpy sampling on the host — a single fancy-index gather per step,
which is faster than worker IPC and keeps batches as contiguous arrays ready
for one ``device_put``. Batch layouts match what the reference's trainer sees
AFTER its collate+reshape step (``engines/trainer.py:61-64``):

- ray batches:   ``rays [2, B, 3]``, ``target [B, 3]``, ``masks [B, 1]``
- patch batches: ``rays [2, B*P*P, 3]`` with B, P recoverable statically,
  plus per-patch ``poses [B, 3, 4]`` and crop ``start_idx [B, 2]``.

Lazy generation parity: if ``meta.json`` is missing, ``generate_dataset`` runs
first (reference ``data/datasets.py:21-23``).
"""
from __future__ import annotations

import json
import math
import os
from typing import Dict, Tuple

import numpy as np


class BaseDataset:
    """Loads the `.npy` artifacts for one split.

    Parity: reference ``BaseNeRFDataset`` (``data/datasets.py:12-119``).
    """

    def __init__(
        self,
        root_dir: str,
        split: str = "train",
        args=None,
        subsample: int = 0,
        rgb: bool = True,
        use_masks: bool = True,
        bin_thres: float = 0.3,
        ret_k: bool = False,
        mmap: bool = True,
    ):
        self.split = split
        self.use_masks = use_masks

        if not os.path.exists(os.path.join(root_dir, "meta.json")):
            if args is None:
                raise FileNotFoundError(f"{root_dir}/meta.json (pass args to auto-generate)")
            print("Dataset not prepared, generating rays ...")
            from nerfsos_tpu.data.gen_dataset import generate_dataset

            generate_dataset(args, root_dir)

        with open(os.path.join(root_dir, "meta.json")) as f:
            self.meta = json.load(f)
        for k in ("near", "far"):
            if k not in self.meta:
                raise IOError("Missing required meta data")

        sfx = f"_x{subsample}" if subsample else ""
        mm = "r" if mmap else None
        self.rays = np.load(os.path.join(root_dir, f"rays_{split}{sfx}.npy"), mmap_mode=mm)
        self.rgbs = None
        if rgb:
            self.rgbs = np.load(os.path.join(root_dir, f"rgbs_{split}{sfx}.npy"), mmap_mode=mm)

        if use_masks:
            mask_path = os.path.join(root_dir, f"masks_{split}.npy")
            try:
                masks = np.load(mask_path)
            except Exception:
                print("Warning! Masks path is wrong, use all-ones masks")
                masks = np.ones(self.rays.shape[:3] + (1,), np.float32)
            if bin_thres != -1:
                self.masks = (masks > bin_thres).astype(np.int64)
            else:
                self.masks = masks.astype(np.float32)
        else:
            self.masks = np.zeros(self.rays.shape[:3] + (1,), np.float32)

        # intrinsics (reference builds K from meta when ret_k, :71-76)
        K = np.eye(3, dtype=np.float32)
        K[0, 0] = K[1, 1] = self.meta["focal"]
        K[0, -1] = self.meta["W"] / 2.0
        K[1, -1] = self.meta["H"] / 2.0
        self.K = K
        self.poses = None
        if ret_k:
            try:
                self.poses = np.load(os.path.join(root_dir, f"poses_{split}.npy"))
            except Exception:
                print(f"[Warning!] poses_{split}.npy missing.")
                self.poses = np.zeros([self.rays.shape[0], 3, 4], np.float32)
        else:
            self.poses = np.zeros([self.rays.shape[0], 3, 4], np.float32)

        self.image_count = self.rays.shape[0]
        self.height = self.rays.shape[1]
        self.width = self.rays.shape[2]
        self.image_step = self.height * self.width

    def num_images(self) -> int:
        return self.image_count

    def height_width(self) -> Tuple[int, int]:
        return self.height, self.width

    def near_far(self) -> Tuple[float, float]:
        return self.meta["near"], self.meta["far"]

    def radii(self) -> float:
        """mip-NeRF base radius (reference ``data/datasets.py:118-119``)."""
        return 2.0 / max(self.height, self.width) * 2 / math.sqrt(12)


class RayDataset(BaseDataset):
    """Global shuffled ray pool (train) / per-view rays (val, test).

    Parity: reference ``RayNeRFDataset`` (``data/datasets.py:121-170``) +
    ``RayBatchCollater`` — batches come out as ``rays [2, B, 3]``.
    """

    def __init__(self, root_dir: str, split="train", **kw):
        super().__init__(root_dir, split=split, **kw)
        if split == "train":
            self._flat_rays = np.asarray(self.rays).reshape(-1, 2, 3)
            self._flat_rgbs = np.asarray(self.rgbs).reshape(-1, self.rgbs.shape[-1])
            self._flat_masks = np.asarray(self.masks).reshape(-1, self.masks.shape[-1])

    def __len__(self) -> int:
        return self._flat_rays.shape[0] if self.split == "train" else self.image_count

    def sample_batch(self, rng: np.random.Generator, batch_size: int) -> Dict[str, np.ndarray]:
        from nerfsos_tpu.data import native

        idx = rng.integers(0, self._flat_rays.shape[0], size=batch_size)
        rays = native.gather_rows(self._flat_rays, idx)  # [B, 2, 3]
        return {
            "rays": np.ascontiguousarray(rays.transpose(1, 0, 2)),  # [2, B, 3]
            "target": native.gather_rows(self._flat_rgbs, idx),
            "masks": native.gather_rows(self._flat_masks, idx),
        }

    def epoch_batches(self, rng: np.random.Generator, batch_size: int):
        """One pass over the shuffled pool (reference's DataLoader epoch)."""
        perm = rng.permutation(self._flat_rays.shape[0])
        n = (len(perm) // batch_size) * batch_size
        for i in range(0, n, batch_size):
            idx = perm[i : i + batch_size]
            yield {
                "rays": np.ascontiguousarray(self._flat_rays[idx].transpose(1, 0, 2)),
                "target": self._flat_rgbs[idx],
                "masks": self._flat_masks[idx],
            }

    def get_view(self, i: int) -> Dict[str, np.ndarray]:
        """Per-image access for eval: rays [2, H, W, 3]."""
        rays = np.asarray(self.rays[i]).transpose(2, 0, 1, 3)
        out = {"rays": rays, "masks": np.asarray(self.masks[i])}
        if self.rgbs is not None:
            out["target"] = np.asarray(self.rgbs[i])
        return out


class PatchDataset(BaseDataset):
    """Random strided crops — the NeRF-SOS training set.

    Parity: reference ``PatchNeRFDataset`` (``data/datasets.py:173-254``): a
    random ``crop_size = patch_size * patch_stride`` window per image, strided
    by ``patch_stride`` -> ``patch_size**2`` rays per patch.
    """

    def __init__(self, root_dir: str, split="train", patch_size: int = 64,
                 patch_stride: int = 1, **kw):
        super().__init__(root_dir, split=split, **kw)
        self.patch_size = patch_size
        self.patch_stride = patch_stride
        self.crop_size = patch_size * patch_stride
        if self.crop_size > min(self.height, self.width):
            raise ValueError(
                f"crop {self.crop_size} exceeds image {self.height}x{self.width}"
            )
        self._rays = np.asarray(self.rays)
        self._rgbs = np.asarray(self.rgbs)
        self._masks = np.asarray(self.masks)
        self._perm = np.empty(0, np.int64)  # per-epoch shuffle cursor

    def __len__(self) -> int:
        return self.image_count

    def _next_image_indices(self, rng: np.random.Generator, n: int) -> np.ndarray:
        """Per-epoch shuffle WITHOUT replacement (DataLoader shuffle=True
        semantics, reference ``run_nerf.py:409-412``): each image appears once
        per epoch; a batch only repeats an image if it straddles an epoch
        boundary (the torch loader instead emits a ragged last batch — static
        shapes forbid that here). This keeps ``super_perm``'s no-fixed-point
        negative-mining guarantee meaningful within a batch."""
        parts = []
        while n > 0:
            if self._perm.size == 0:
                self._perm = rng.permutation(self.image_count)
            take = min(n, self._perm.size)
            parts.append(self._perm[:take])
            self._perm = self._perm[take:]
            n -= take
        return np.concatenate(parts)

    def sample_batch(self, rng: np.random.Generator, batch_size: int) -> Dict[str, np.ndarray]:
        from nerfsos_tpu.data import native

        P, s = self.patch_size, self.patch_stride
        img_idx = self._next_image_indices(rng, batch_size)
        h_idx = rng.integers(0, self.height - self.crop_size + 1, size=batch_size)
        w_idx = rng.integers(0, self.width - self.crop_size + 1, size=batch_size)

        rays = native.gather_patches(self._rays, img_idx, h_idx, w_idx, P, s)
        rgbs = native.gather_patches(self._rgbs, img_idx, h_idx, w_idx, P, s)
        masks = native.gather_patches(self._masks, img_idx, h_idx, w_idx, P, s)

        flat_rays = rays.reshape(batch_size * P * P, 2, 3).transpose(1, 0, 2)
        return {
            "rays": np.ascontiguousarray(flat_rays),  # [2, B*P*P, 3]
            "target": rgbs.reshape(batch_size * P * P, -1),
            "masks": masks.reshape(batch_size * P * P, -1),
            "poses": self.poses[img_idx].astype(np.float32),
            "start_idx": np.stack([h_idx, w_idx], -1).astype(np.float32),
        }


class ViewDataset(BaseDataset):
    """Single-image random ray sampling with a precrop schedule.

    Parity: reference ``ViewNeRFDataset`` (``data/datasets.py:257-316``) minus
    its hidden iteration counter (which forbade dataloader workers —
    ``run_nerf.py:416-418``): the step counter is an explicit argument.
    """

    def __init__(self, root_dir: str, split="train", precrop_iters: int = 0,
                 precrop_frac: float = 0.5, **kw):
        super().__init__(root_dir, split=split, **kw)
        self.precrop_iters = precrop_iters
        self.precrop_frac = precrop_frac
        self._rays = np.asarray(self.rays)
        self._rgbs = np.asarray(self.rgbs)

    def __len__(self) -> int:
        return self.image_count

    def sample_batch(self, rng: np.random.Generator, batch_size: int,
                     step: int = 10**9) -> Dict[str, np.ndarray]:
        i = int(rng.integers(0, self.image_count))
        H, W = self.height, self.width
        if step < self.precrop_iters:
            dH = int(H // 2 * self.precrop_frac)
            dW = int(W // 2 * self.precrop_frac)
            hs = rng.integers(H // 2 - dH, H // 2 + dH, size=batch_size)
            ws = rng.integers(W // 2 - dW, W // 2 + dW, size=batch_size)
        else:
            flat = rng.choice(H * W, size=batch_size, replace=False)
            hs, ws = flat // W, flat % W
        rays = self._rays[i, hs, ws]  # [B, 2, 3]
        return {
            "rays": np.ascontiguousarray(rays.transpose(1, 0, 2)),
            "target": self._rgbs[i, hs, ws],
        }


class ExhibitDataset(BaseDataset):
    """Render-path rays only (reference ``data/datasets.py:319-332``)."""

    def __init__(self, root_dir: str, **kw):
        kw.setdefault("use_masks", False)
        super().__init__(root_dir, split="exhibit", rgb=False, **kw)

    def __len__(self) -> int:
        return self.image_count

    def get_view(self, i: int) -> Dict[str, np.ndarray]:
        return {"rays": np.asarray(self.rays[i]).transpose(2, 0, 1, 3)}
