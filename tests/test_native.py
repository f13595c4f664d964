"""Native threaded gather kernels: build, parity with numpy, dataset wiring."""
import numpy as np
import pytest

from nerfsos_tpu.data import native


def test_native_builds():
    assert native.available(), "g++ build of libgather.so failed"


def test_gather_rows_parity(rng):
    src = rng.random((10000, 2, 3)).astype(np.float32)
    idx = rng.integers(0, 10000, 4096)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_rows_various_dtypes(rng):
    for dtype in (np.float32, np.int64, np.uint8):
        src = (rng.random((1000, 5)) * 100).astype(dtype)
        idx = rng.integers(0, 1000, 257)
        np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_patches_parity(rng):
    imgs = rng.random((7, 50, 60, 2, 3)).astype(np.float32)
    B, P, S = 5, 8, 3
    ii = rng.integers(0, 7, B)
    hh = rng.integers(0, 50 - P * S + 1, B)
    ww = rng.integers(0, 60 - P * S + 1, B)
    out = native.gather_patches(imgs, ii, hh, ww, P, S)
    ref = np.stack([imgs[ii[b], hh[b]:hh[b] + P * S:S, ww[b]:ww[b] + P * S:S] for b in range(B)])
    np.testing.assert_array_equal(out, ref)


def test_gather_patches_stride_one_and_3d(rng):
    imgs = rng.random((3, 20, 20, 1)).astype(np.float32)
    ii = np.array([0, 2])
    hh = np.array([0, 5])
    ww = np.array([1, 3])
    out = native.gather_patches(imgs, ii, hh, ww, 4, 1)
    ref = np.stack([imgs[ii[b], hh[b]:hh[b] + 4, ww[b]:ww[b] + 4] for b in range(2)])
    np.testing.assert_array_equal(out, ref)


def test_datasets_still_correct_with_native(tmp_path, rng):
    """PatchDataset crops through the native path must match manual slicing."""
    import json

    H = W = 24
    rays = rng.random((3, H, W, 2, 3)).astype(np.float32)
    rgbs = rng.random((3, H, W, 3)).astype(np.float32)
    masks = rng.random((3, H, W, 1)).astype(np.float32)
    np.save(tmp_path / "rays_train.npy", rays)
    np.save(tmp_path / "rgbs_train.npy", rgbs)
    np.save(tmp_path / "masks_train.npy", masks)
    json.dump({"H": H, "W": W, "focal": 20.0, "near": 1.0, "far": 4.0},
              open(tmp_path / "meta.json", "w"))

    from nerfsos_tpu.data.datasets import PatchDataset, RayDataset

    d = PatchDataset(str(tmp_path), patch_size=4, patch_stride=2)
    b = d.sample_batch(np.random.default_rng(0), 2)
    assert b["rays"].shape == (2, 32, 3)
    # reconstruct from start_idx and compare against direct slicing
    r2 = np.random.default_rng(0)
    img_idx = r2.permutation(3)[:2]  # per-epoch shuffle without replacement
    h_idx = r2.integers(0, H - 8 + 1, 2)
    w_idx = r2.integers(0, W - 8 + 1, 2)
    ref = np.stack([rays[img_idx[i], h_idx[i]:h_idx[i] + 8:2, w_idx[i]:w_idx[i] + 8:2]
                    for i in range(2)])
    ref = ref.reshape(32, 2, 3).transpose(1, 0, 2)
    np.testing.assert_allclose(b["rays"], ref)

    rd = RayDataset(str(tmp_path))
    rb = rd.sample_batch(np.random.default_rng(1), 64)
    assert rb["rays"].shape == (2, 64, 3) and rb["target"].shape == (64, 3)
