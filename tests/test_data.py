"""Data layer tests: pose math, ray gen, dataset generation, online samplers."""
import json
import os

import numpy as np
import pytest

from nerfsos_tpu.data import poses as pose_utils
from nerfsos_tpu.data import ray_utils
from nerfsos_tpu.data.datasets import BaseDataset, ExhibitDataset, PatchDataset, RayDataset, ViewDataset
from nerfsos_tpu.engines.config import ConfigArgumentParser, parse_config_file


# ------------------------------------------------------------- pose math


def test_recenter_makes_avg_pose_identity(rng):
    # random-ish forward-facing poses with hwf column
    N = 7
    poses = np.zeros((N, 3, 5), np.float32)
    for i in range(N):
        angle = 0.1 * (i - 3)
        c, s = np.cos(angle), np.sin(angle)
        poses[i, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        poses[i, :3, 3] = [0.2 * i, 0.05 * i, 0.01 * i]
        poses[i, :3, 4] = [32, 32, 30.0]
    rec = pose_utils.recenter_poses(poses)
    avg = pose_utils.poses_avg(rec)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-5)


def test_spiral_path_count_and_shape():
    c2w = np.concatenate([np.eye(3), np.zeros((3, 1)), np.array([[32], [32], [30.0]])], 1)
    path = pose_utils.render_path_spiral(c2w, np.array([0, 1, 0.0]),
                                         rads=np.array([0.5, 0.5, 0.2]),
                                         focal=3.0, zrate=0.5, rots=2, N=120)
    assert len(path) == 120
    assert path[0].shape == (3, 5)
    # rotations are orthonormal
    R = path[17][:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)


def test_spherify_emits_120_circle_poses(rng):
    N = 10
    poses = np.zeros((N, 3, 5), np.float32)
    for i in range(N):
        th = 2 * np.pi * i / N
        pos = np.array([2 * np.cos(th), 2 * np.sin(th), 0.3])
        z = -pos / np.linalg.norm(pos)  # look at origin
        poses[i, :, :4] = pose_utils.viewmatrix(-z, np.array([0, 0, 1.0]), pos)
        poses[i, :3, 4] = [16, 16, 20.0]
    reset, new_poses, bds = pose_utils.spherify_poses(poses, np.array([[1.0, 5.0]] * N))
    assert new_poses.shape == (120, 3, 5)
    assert reset.shape == (N, 3, 5)
    # rescaled to ~unit radius
    rad = np.sqrt(np.mean(np.sum(reset[:, :3, 3] ** 2, -1)))
    np.testing.assert_allclose(rad, 1.0, atol=1e-5)


def test_pose_spherical_radius():
    p = pose_utils.pose_spherical(45.0, -30.0, 4.0)
    np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 4.0, atol=1e-6)


def test_ray_utils_matches_core_rays():
    import jax.numpy as jnp
    from nerfsos_tpu.core import rays as jrays

    H, W, f = 9, 7, 11.0
    K = ray_utils.persp_intrinsics(H, W, f)
    c2w = np.array([[0.0, 0, 1, 2], [0, 1, 0, 3], [-1, 0, 0, 4]])
    batch = ray_utils.persp_rays_batch(H, W, K, c2w[None])  # [1, H, W, 2, 3]
    jref = np.array(jrays.persp_rays(H, W, jnp.array(K, dtype=jnp.float32), jnp.array(c2w)))
    np.testing.assert_allclose(batch[0, :, :, 0], jref[0], atol=1e-5)
    np.testing.assert_allclose(batch[0, :, :, 1], jref[1], atol=1e-5)


# ------------------------------------------------------------- config


def test_config_parser_file_and_override(tmp_path):
    cfg = tmp_path / "scene.txt"
    cfg.write_text(
        "expname = flower_test\nfactor = 4\nno_batching = True\n"
        "app_corr_params = 0.18 1 0.46 1\n# comment\nN_rand = 1024\n"
    )
    p = ConfigArgumentParser()
    p.add_argument("--config", type=str)
    p.add_argument("--expname", type=str, default="x")
    p.add_argument("--factor", type=int, default=8)
    p.add_argument("--no_batching", action="store_true", default=False)
    p.add_argument("--N_rand", "--batch_size", type=int, default=32)
    p.add_argument("--app_corr_params", nargs="+", type=float, default=[0.0])
    args, _ = p.parse_known_args(["--config", str(cfg), "--factor", "2"])
    assert args.expname == "flower_test"
    assert args.factor == 2  # CLI wins
    assert args.no_batching is True
    assert args.N_rand == 1024
    assert args.app_corr_params == [0.18, 1.0, 0.46, 1.0]
    assert parse_config_file(str(cfg))["expname"] == "flower_test"


# ------------------------------------------------------------- datasets


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """Generate a tiny blender-style scene and run gen_dataset on it."""
    root = tmp_path_factory.mktemp("blender_scene")
    H = W = 20
    from PIL import Image

    os.makedirs(root / "train", exist_ok=True)
    frames = {"train": [], "val": [], "test": []}
    rng = np.random.default_rng(0)
    for s, n in [("train", 4), ("val", 2), ("test", 2)]:
        for i in range(n):
            name = f"{s}/r_{i}"
            img = (rng.random((H, W, 4)) * 255).astype(np.uint8)
            os.makedirs(root / s, exist_ok=True)
            Image.fromarray(img).save(root / f"{name}.png")
            frames[s].append({
                "file_path": name,
                "transform_matrix": pose_utils.pose_spherical(360 * i / n, -30, 4.0).tolist(),
            })
    for s in frames:
        with open(root / f"transforms_{s}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames[s]}, f)

    out = tmp_path_factory.mktemp("generated")
    from nerfsos_tpu.data.gen_dataset import create_arg_parser, generate_dataset

    args, _ = create_arg_parser().parse_known_args(
        ["--data_type", "blender", "--data_path", str(root), "--test_skip", "1",
         "--white_bkgd"]
    )
    generate_dataset(args, str(out))
    return str(out), H, W


def test_gen_dataset_npy_contract(synth_dataset):
    out, H, W = synth_dataset
    rays = np.load(os.path.join(out, "rays_train.npy"))
    assert rays.shape == (4, H, W, 2, 3)
    rgbs = np.load(os.path.join(out, "rgbs_train.npy"))
    assert rgbs.shape == (4, H, W, 3)
    masks = np.load(os.path.join(out, "masks_train.npy"))
    assert masks.shape == (4, H, W, 1)
    assert os.path.exists(os.path.join(out, "rays_exhibit.npy"))
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["near"] == 2.0 and meta["far"] == 6.0
    assert meta["H"] == H


def test_ray_dataset_pool_and_views(synth_dataset, rng):
    out, H, W = synth_dataset
    d = RayDataset(out, split="train")
    assert len(d) == 4 * H * W
    b = d.sample_batch(rng, 64)
    assert b["rays"].shape == (2, 64, 3) and b["target"].shape == (64, 3)
    assert b["masks"].shape == (64, 1)
    t = RayDataset(out, split="test")
    v = t.get_view(0)
    assert v["rays"].shape == (2, H, W, 3) and v["target"].shape == (H, W, 3)
    assert d.near_far() == (2.0, 6.0)
    np.testing.assert_allclose(d.radii(), 2.0 / max(H, W) * 2 / np.sqrt(12))


def test_patch_dataset_strided_crop(synth_dataset, rng):
    out, H, W = synth_dataset
    d = PatchDataset(out, split="train", patch_size=4, patch_stride=3)
    b = d.sample_batch(rng, 2)
    assert b["rays"].shape == (2, 2 * 16, 3)
    assert b["target"].shape == (32, 3)
    assert b["poses"].shape == (2, 3, 4) and b["start_idx"].shape == (2, 2)
    # strided rays must match a manual gather
    h, w = int(b["start_idx"][0, 0]), int(b["start_idx"][0, 1])
    assert 0 <= h <= H - 12 and 0 <= w <= W - 12


def test_patch_dataset_samples_without_replacement(synth_dataset, rng):
    """Each epoch (image_count draws) must cover every image exactly once
    (DataLoader shuffle=True parity); no image repeats within a batch when
    batch_size <= image_count."""
    out, H, W = synth_dataset
    d = PatchDataset(out, split="train", patch_size=4, patch_stride=1)
    n = d.image_count
    for _ in range(3):  # three consecutive epochs
        seen = []
        for _ in range(n // 2):
            seen.extend(d._next_image_indices(rng, 2).tolist())
        assert sorted(seen) == list(range(n))


def test_patch_dataset_rejects_oversized_crop(synth_dataset):
    out, H, W = synth_dataset
    with pytest.raises(ValueError):
        PatchDataset(out, split="train", patch_size=64, patch_stride=6)


def test_view_dataset_precrop(synth_dataset, rng):
    out, H, W = synth_dataset
    d = ViewDataset(out, split="train", precrop_iters=100, precrop_frac=0.5)
    b = d.sample_batch(rng, 32, step=0)  # inside precrop window
    assert b["rays"].shape == (2, 32, 3)
    b2 = d.sample_batch(rng, 32, step=1000)  # full image
    assert b2["rays"].shape == (2, 32, 3)


def test_exhibit_dataset(synth_dataset):
    out, H, W = synth_dataset
    d = ExhibitDataset(out)
    assert len(d) == 40  # blender spherical render path
    assert d.get_view(0)["rays"].shape == (2, H, W, 3)
