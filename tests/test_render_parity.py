"""Full-pipeline parity: deterministic coarse->fine render, torch oracle vs
nerfsos_tpu with CONVERTED weights.

This is the checkpoint-compatibility proof: an inline torch implementation of
the reference semantics (stratified sample, MLP with PE, quadrature composite,
det inverse-CDF resample, merged fine pass — models/{sampler,renderer,
nerf_mlp,nerf_net}.py in VITA-Group/NeRF-SOS) renders the same rays as our
NeRFNet loaded from the torch state dict; outputs must agree to float
tolerance.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from nerfsos_tpu.engines.checkpoint import torch_nerf_ckpt_to_params
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from tests.test_eval import TorchRefMLP

D, W, NS, NI = 4, 32, 8, 8
MULTIRES, MULTIRES_VIEWS = 4, 2
NEAR, FAR = 1.0, 4.0


def torch_pe(x, n_freqs):
    bands = 2.0 ** torch.linspace(0.0, n_freqs - 1, n_freqs)
    out = [x]  # reference order: per-freq [sin(channels), cos(channels)]
    for f in bands:
        out.append(torch.sin(f * x))
        out.append(torch.cos(f * x))
    return torch.cat(out, -1)


def torch_composite(raw, z_vals, rays_d, use_semantics=True):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat([dists, 1e10 * torch.ones_like(dists[..., :1])], -1)
    dists = dists * torch.linalg.norm(rays_d[..., None, :], dim=-1)
    rgb = torch.sigmoid(raw[..., :3])
    alpha = 1.0 - torch.exp(-F.relu(raw[..., 3]) * dists)
    Ts = torch.cat([torch.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1)
    Ts = torch.cumprod(Ts, -1)[..., :-1]
    weights = alpha * Ts
    depth = torch.sum(weights * z_vals, -1, keepdim=True)
    acc = torch.sum(weights, -1, keepdim=True)
    depth[acc <= 1e-10] = 1e10  # vacancy rule (reference renderer.py:72)
    out = {
        "rgb": torch.sum(weights[..., None] * rgb, -2),
        "weights": weights,
        "depth": depth,
        "acc": acc,
    }
    if use_semantics:
        out["semantics"] = torch.sum(weights[..., None] * raw[..., 4:], -2)
    return out


def torch_sample_pdf_det(bins, weights, n):
    weights = weights + 1e-5
    pdf = weights / torch.sum(weights, -1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.0, 1.0, n).expand(list(cdf.shape[:-1]) + [n]).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    inds_g = torch.stack([below, above], -1)
    matched = [inds_g.shape[0], inds_g.shape[1], cdf.shape[-1]]
    cdf_g = torch.gather(cdf.unsqueeze(1).expand(matched), 2, inds_g)
    bins_g = torch.gather(bins.unsqueeze(1).expand(matched), 2, inds_g)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    return bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])


def torch_render(mlp, rays_o, rays_d):
    """Deterministic (perturb=0, noise=0) coarse->fine render."""
    viewdirs = rays_d / torch.norm(rays_d, dim=-1, keepdim=True)
    t = torch.linspace(0.0, 1.0, NS)
    z = NEAR * (1 - t) + FAR * t
    z = z.expand(rays_o.shape[0], NS)

    def query(z_vals):
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        vd = viewdirs[:, None, :].expand(pts.shape)
        emb = torch_pe(pts.reshape(-1, 3), MULTIRES)
        demb = torch_pe(vd.reshape(-1, 3), MULTIRES_VIEWS)
        raw = mlp(torch.cat([emb, demb], -1))
        return raw.reshape(pts.shape[0], pts.shape[1], -1)

    ret0 = torch_composite(query(z), z, rays_d)
    z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
    z_samp = torch_sample_pdf_det(z_mid, ret0["weights"][..., 1:-1], NI)
    z_all, _ = torch.sort(torch.cat([z, z_samp], -1), -1)
    ret = torch_composite(query(z_all), z_all, rays_d)
    return ret0, ret


@pytest.fixture(scope="module")
def parity_setup():
    torch.manual_seed(3)
    # PE dims: 3*(2*MULTIRES+1)=27 pts, 3*(2*MULTIRES_VIEWS+1)=15 dirs
    tm = TorchRefMLP(input_ch=27, input_ch_views=15, W=W, D=D, skips=(2,)).eval()
    sd = {f"nerf.mlp.{k}": v for k, v in tm.state_dict().items()}
    params, _ = torch_nerf_ckpt_to_params({"global_step": 0, "model": sd})

    cfg = NeRFConfig(netdepth=D, netwidth=W, netdepth_fine=D, netwidth_fine=W,
                     n_samples=NS, n_importance=NI,
                     multires=MULTIRES, multires_views=MULTIRES_VIEWS,
                     use_semantics=True, sem_with_coord=True, ray_block=4096,
                     skips=(2,))
    net = NeRFNet(cfg)
    # shared coarse weights for the fine net too (single-MLP torch oracle)
    params = {"coarse": params["coarse"], "fine": params["coarse"]}
    return tm, net, params


def test_full_render_parity_with_torch(parity_setup, rng):
    tm, net, params = parity_setup
    o = rng.normal(size=(50, 3)).astype(np.float32)
    d = rng.normal(size=(50, 3)).astype(np.float32)

    with torch.no_grad():
        t0, t1 = torch_render(tm, torch.from_numpy(o), torch.from_numpy(d))

    out = net(params, jnp.stack([jnp.array(o), jnp.array(d)]), (NEAR, FAR),
              train=False)
    np.testing.assert_allclose(np.array(out["rgb0"]), t0["rgb"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.array(out["rgb"]), t1["rgb"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.array(out["semantics"]), t1["semantics"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.array(out["depth"]), t1["depth"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.array(out["acc"]), t1["acc"].numpy(), atol=2e-4)
