"""Eval-stack tests: SSIM parity, LPIPS plumbing, checkpoint conversion,
full evaluate/render_video/export_density on a tiny synthetic scene."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from nerfsos_tpu.engines import checkpoint as ckpt_lib
from nerfsos_tpu.engines.eval import evaluate, export_density, make_render_fn, render_video
from nerfsos_tpu.models.mlp import NeRFMLP
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from nerfsos_tpu.ops.lpips import LPIPSMetric
from nerfsos_tpu.ops.ssim import ssim
from nerfsos_tpu.utils.io import read_mrc, write_mrc, write_ply_points, write_video
from nerfsos_tpu.utils.vis import seg2color, to8b


# ------------------------------------------------------------- SSIM


def _torch_ssim(img1, img2, ws=11):
    """Reference utils/ssim.py algebra as an inline torch oracle."""
    from math import exp

    g = torch.tensor([exp(-((x - ws // 2) ** 2) / (2 * 1.5**2)) for x in range(ws)])
    g = (g / g.sum()).unsqueeze(1)
    win = (g @ g.t()).unsqueeze(0).unsqueeze(0)
    C = img1.shape[1]
    win = win.expand(C, 1, ws, ws)
    mu1 = F.conv2d(img1, win, padding=ws // 2, groups=C)
    mu2 = F.conv2d(img2, win, padding=ws // 2, groups=C)
    s1 = F.conv2d(img1 * img1, win, padding=ws // 2, groups=C) - mu1**2
    s2 = F.conv2d(img2 * img2, win, padding=ws // 2, groups=C) - mu2**2
    s12 = F.conv2d(img1 * img2, win, padding=ws // 2, groups=C) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))
    return m.mean()


def test_ssim_matches_reference_torch(rng):
    a = rng.random((1, 3, 24, 20)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    ours = float(ssim(jnp.array(a), jnp.array(b)))
    ref = float(_torch_ssim(torch.from_numpy(a), torch.from_numpy(b)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ssim_identical_is_one(rng):
    a = rng.random((13, 17, 3)).astype(np.float32)
    assert float(ssim(jnp.array(a), jnp.array(a), data_format="HWC")) > 0.9999


# ------------------------------------------------------------- LPIPS


def test_lpips_random_init_runs(key):
    m = LPIPSMetric("alex")
    m.init_random(key)
    a = jnp.zeros((40, 40, 3))
    b = jnp.ones((40, 40, 3))
    d_ab = float(m(a, b)[0])
    d_aa = float(m(a, a)[0])
    assert np.isfinite(d_ab) and abs(d_aa) < 1e-6


def test_lpips_raises_without_weights():
    m = LPIPSMetric("alex")
    with pytest.raises(RuntimeError):
        m(jnp.zeros((8, 8, 3)), jnp.zeros((8, 8, 3)))


# ------------------------------------------------------------- ckpt conversion


class TorchRefMLP(tnn.Module):
    """Reference models/nerf_mlp.py:24-100 semantics, inline oracle."""

    def __init__(self, input_ch=21, input_ch_views=9, W=32, D=4, skips=(2,),
                 sem_dim=2, sem_with_coord=True):
        super().__init__()
        self.skips = skips
        self.input_ch, self.input_ch_views = input_ch, input_ch_views
        self.pts_linears = tnn.ModuleList(
            [tnn.Linear(input_ch, W)]
            + [tnn.Linear(W, W) if i not in skips else tnn.Linear(W + input_ch, W) for i in range(D - 1)]
        )
        self.alpha_linear = tnn.Linear(W, 1)
        self.feature_linear = tnn.Linear(W, W)
        self.views_linears = tnn.ModuleList([tnn.Linear(input_ch_views + W, W // 2)])
        self.rgb_linear = tnn.Linear(W // 2, 3)
        sem_in = W + input_ch if sem_with_coord else W
        self.semantic_linear = tnn.Sequential(tnn.Linear(sem_in, W // 2), tnn.ReLU(), tnn.Linear(W // 2, sem_dim))
        self.sem_with_coord = sem_with_coord

    def forward(self, x):
        pts, views = torch.split(x, [self.input_ch, self.input_ch_views], dim=-1)
        h = pts
        for i, l in enumerate(self.pts_linears):
            h = F.relu(l(h))
            if i in self.skips:
                h = torch.cat([pts, h], -1)
        alpha = self.alpha_linear(h)
        sem_in = torch.cat([h, pts], -1) if self.sem_with_coord else h
        sem = self.semantic_linear(sem_in)
        feat = self.feature_linear(h)
        hv = F.relu(self.views_linears[0](torch.cat([feat, views], -1)))
        rgb = self.rgb_linear(hv)
        return torch.cat([rgb, alpha, sem], -1)


def test_torch_ckpt_conversion_matches_forward(rng):
    torch.manual_seed(0)
    tm = TorchRefMLP().eval()
    sd = {f"nerf.mlp.{k}": v for k, v in tm.state_dict().items()}
    sd.update({f"nerf_fine.mlp.{k}": v for k, v in tm.state_dict().items()})
    params, step = ckpt_lib.torch_nerf_ckpt_to_params(
        {"global_step": 150000, "model": sd, "optimizer": {}}
    )
    assert step == 150000
    assert "fine" in params

    fm = NeRFMLP(depth=4, width=32, skips=(2,), use_semantics=True, sem_with_coord=True)
    pts_emb = rng.normal(size=(6, 21)).astype(np.float32)
    views_emb = rng.normal(size=(6, 9)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.concatenate([pts_emb, views_emb], -1))).numpy()
    ours = np.array(fm.apply({"params": params["coarse"]["mlp"]},
                             jnp.array(pts_emb), jnp.array(views_emb)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_orbax_roundtrip(tmp_path, key):
    params = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
    ckpt_lib.save_checkpoint(str(tmp_path / "00000100"), 100, params)
    restored = ckpt_lib.load_checkpoint(str(tmp_path / "00000100"))
    assert int(restored["global_step"]) == 100
    np.testing.assert_allclose(np.array(restored["params"]["b"]["c"]), 1.0)
    assert ckpt_lib.find_latest_checkpoint(str(tmp_path)).endswith("00000100")


# ------------------------------------------------------------- IO


def test_mrc_roundtrip(tmp_path, rng):
    vol = rng.random((5, 6, 7)).astype(np.float32)
    p = str(tmp_path / "d.mrc")
    write_mrc(p, vol)
    np.testing.assert_allclose(read_mrc(p), vol)


def test_ply_and_video_and_vis(tmp_path, rng):
    write_ply_points(str(tmp_path / "p.ply"), rng.random((10, 3)).astype(np.float32))
    assert os.path.getsize(tmp_path / "p.ply") > 100
    frames = (rng.random((4, 16, 16, 3)) * 255).astype(np.uint8)
    write_video(str(tmp_path / "v.mp4"), frames, fps=4)
    assert os.path.getsize(tmp_path / "v.mp4") > 100
    seg = np.array([[0, 1], [1, 0]])
    assert seg2color(seg).shape == (2, 2, 3)
    assert to8b(rng.random((4, 4))).dtype == np.uint8


# ------------------------------------------------------------- engine e2e


class _TinyEvalDataset:
    """Duck-typed dataset: two 12x12 views of random rays with gt."""

    def __init__(self, rng, with_target=True):
        self.H = self.W = 12
        self._rng = rng
        self.with_target = with_target

    def __len__(self):
        return 2

    def near_far(self):
        return 1.0, 4.0

    def radii(self):
        return 0.01

    def get_view(self, i):
        r = np.random.default_rng(i)
        rays = r.normal(size=(2, self.H, self.W, 3)).astype(np.float32)
        out = {"rays": rays, "masks": r.integers(0, 2, (self.H, self.W, 1))}
        if self.with_target:
            out["target"] = r.random((self.H, self.W, 3)).astype(np.float32)
        return out


@pytest.fixture(scope="module")
def eval_net():
    cfg = NeRFConfig(netwidth=16, netdepth=2, netwidth_fine=16, netdepth_fine=2,
                     n_samples=4, n_importance=4, multires=2, multires_views=2,
                     use_semantics=True, ray_block=256)
    net = NeRFNet(cfg)
    return net, net.init(jax.random.PRNGKey(0))


def test_evaluate_writes_artifacts(eval_net, tmp_path, rng):
    net, params = eval_net
    ds = _TinyEvalDataset(rng)
    out = evaluate(net, params, ds, save_dir=str(tmp_path), ret_cluster=True, find_fg=False)
    for k in ["mse", "psnr", "ssim", "lpips", "clus_ari", "sem_ari"]:
        assert k in out
    for f in ["rgb_000.png", "depth_000.png", "alpha_000.png", "sem_000.png",
              "clus_000.png", "log.json", "log.txt"]:
        assert os.path.exists(tmp_path / f), f
    log = json.load(open(tmp_path / "log.json"))
    assert len(log["mse"]) == 2 and "total_psnr" in log


def test_evaluate_fast_mode_single_view(eval_net, tmp_path, rng):
    net, params = eval_net
    out = evaluate(net, params, _TinyEvalDataset(rng), save_dir=str(tmp_path),
                   fast_mode=True, find_fg=False)
    log = json.load(open(tmp_path / "log.json"))
    assert len(log["mse"]) == 1


def test_render_video_writes_mp4s(eval_net, tmp_path, rng):
    net, params = eval_net
    ds = _TinyEvalDataset(rng, with_target=False)
    render_video(net, params, ds, save_dir=str(tmp_path), find_fg=False)
    for f in ["rgb.mp4", "disp.mp4", "sem.mp4", "clus.mp4"]:
        assert os.path.exists(tmp_path / f), f


def test_export_density(eval_net, tmp_path):
    net, params = eval_net
    sigma = export_density(net, params, extents=(0.2, 0.2, 0.2), voxel_size=0.02,
                           save_dir=str(tmp_path), chunk=256)
    assert sigma.shape == (10, 10, 10)
    assert np.all(sigma >= 0)
    assert os.path.exists(tmp_path / "density.mrc")
    assert os.path.exists(tmp_path / "density.ply")
    np.testing.assert_allclose(read_mrc(str(tmp_path / "density.mrc")), sigma, atol=0)


def test_find_fg_flip_non_divisible_resolution(key, rng):
    """The DINO fg-orientation flip must handle images whose H/W are not a
    multiple of the ViT patch size (e.g. the real LLFF flower test frames are
    756x1008; 756/16 = 47.25). The repo crops to a patch multiple — the
    reference silently relies on divisibility. Also check the flip semantics:
    when attention mass favors cluster 0, labels invert."""
    from nerfsos_tpu.engines.eval import find_fg_flip
    from nerfsos_tpu.models import vit as vit_lib
    from nerfsos_tpu.models.extractor import VitExtractor

    ext = VitExtractor("dino_vits16")
    ext.vit = vit_lib.VisionTransformer(patch_size=16, embed_dim=32, depth=2,
                                        num_heads=2, pos_embed_size=224)
    ext.init(key)

    H, W = 36, 52  # 36 = 2.25 patches, 52 = 3.25 patches
    rgb = rng.random((H, W, 3)).astype(np.float32)
    clustering = (rng.random((H, W, 1)) > 0.5).astype(np.int32)
    flipped = find_fg_flip(ext, rgb, clustering)
    assert flipped.shape == clustering.shape
    assert set(np.unique(flipped)).issubset({0, 1})
    # flip is an involution up to orientation: either identical or inverted
    same = np.array_equal(flipped, clustering)
    inv = np.array_equal(flipped, 1 - clustering)
    assert same or inv


def test_merge_params_nostrict_keeps_new_head():
    from nerfsos_tpu.engines.checkpoint import merge_params

    current = {"coarse": {"mlp": {"pts_linears_0": {"kernel": np.zeros((3, 4))},
                                  "sem_0": {"kernel": np.ones((4, 2))}}}}
    loaded = {"coarse": {"mlp": {"pts_linears_0": {"kernel": np.full((3, 4), 7.0)}}}}
    out = merge_params(current, loaded, strict=False)
    np.testing.assert_allclose(out["coarse"]["mlp"]["pts_linears_0"]["kernel"], 7.0)
    np.testing.assert_allclose(out["coarse"]["mlp"]["sem_0"]["kernel"], 1.0)  # kept fresh
    with pytest.raises(KeyError):
        merge_params(current, loaded, strict=True)


def test_merge_params_shape_mismatch():
    from nerfsos_tpu.engines.checkpoint import merge_params

    current = {"a": {"kernel": np.zeros((3, 4))}}
    loaded = {"a": {"kernel": np.zeros((5, 4))}}
    out = merge_params(current, loaded, strict=False)  # keeps fresh silently
    assert out["a"]["kernel"].shape == (3, 4)
    with pytest.raises(ValueError):
        merge_params(current, loaded, strict=True)
