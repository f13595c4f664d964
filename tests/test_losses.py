"""Parity tests for grid-sample and the correlation/contrastive losses.

torch (CPU) is used as the oracle for F.grid_sample and the loss algebra.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from nerfsos_tpu.losses.correlation import (
    CorrelationLoss,
    GeoCorrelationLoss,
    get_similarity_matrix,
    nerf_contrastive,
    super_perm,
)
from nerfsos_tpu.losses.photometric import img2mse, mse2psnr
from nerfsos_tpu.ops.grid_sample import grid_sample_bilinear


def test_img2mse_mse2psnr():
    x = jnp.array([[0.5, 0.5, 0.5]])
    y = jnp.array([[0.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(img2mse(x, y)), 0.25, atol=1e-7)
    np.testing.assert_allclose(float(mse2psnr(jnp.array(0.01))), 20.0, atol=1e-5)


@pytest.mark.parametrize("src_hw", [(9, 7), (40, 33)])
def test_grid_sample_matches_torch(rng, src_hw):
    # (9,7): small-source one-hot contraction path (no TPU gathers);
    # (40,33): H*W > 1024 -> the gather+lerp path.
    H, W = src_hw
    t = rng.normal(size=(3, 4, H, W)).astype(np.float32)
    # grid includes out-of-range coords to exercise border padding
    grid = (rng.random((3, 5, 6, 2)).astype(np.float32) * 3.0 - 1.5)
    ours = np.array(grid_sample_bilinear(jnp.array(t), jnp.array(grid)))
    ref = F.grid_sample(torch.from_numpy(t), torch.from_numpy(grid),
                        mode="bilinear", padding_mode="border",
                        align_corners=True).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _torch_app_helper(f1, f2, c1, c2, shift):
    """Reference helper algebra (utils/image.py:311-333) in torch."""
    def norm(t):
        return F.normalize(t, dim=1, eps=1e-10)

    def corr(a, b):
        return torch.einsum("nchw,ncij->nhwij", a, b)

    with torch.no_grad():
        fd = corr(norm(f1), norm(f2))
        old_mean = fd.mean()
        fd = fd - fd.mean([3, 4], keepdim=True)
        fd = fd - fd.mean() + old_mean
    cd = corr(norm(c1), norm(c2))
    return -cd.clamp(0.0) * (fd - shift)


def test_correlation_helper_matches_torch(rng):
    B, C, S, P = 2, 6, 5, 5
    f1 = rng.normal(size=(B, C, S, S)).astype(np.float32)
    f2 = rng.normal(size=(B, C, S, S)).astype(np.float32)
    c1 = rng.normal(size=(B, 2, P, P)).astype(np.float32)
    c2 = rng.normal(size=(B, 2, P, P)).astype(np.float32)
    loss = CorrelationLoss()
    ours = np.array(loss.helper(jnp.array(f1), jnp.array(f2), jnp.array(c1), jnp.array(c2), 0.18))
    ref = _torch_app_helper(*(torch.from_numpy(a) for a in (f1, f2, c1, c2)), 0.18).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_negative_mining_modes(key, rng):
    sim = jnp.array(rng.normal(size=(6, 6)).astype(np.float32))
    loss = CorrelationLoss()
    np.testing.assert_array_equal(
        np.array(loss.negative_index(key, 6, sim)), np.array(jnp.argmin(sim, axis=0))
    )
    # super_perm: valid permutation-ish mapping with no fixed points
    for seed in range(5):
        p = np.array(super_perm(jax.random.PRNGKey(seed), 8))
        assert not np.any(p == np.arange(8))
        assert np.all((p >= 0) & (p < 8))
    # rand_neg: a true permutation
    p = np.array(CorrelationLoss(rand_neg=True).negative_index(key, 8, None))
    assert sorted(p.tolist()) == list(range(8))


def test_correlation_loss_grads_flow_to_code_not_feats(key, rng):
    feats = jnp.array(rng.normal(size=(3, 8, 6, 6)).astype(np.float32))
    code = jnp.array(rng.normal(size=(3, 2, 6, 6)).astype(np.float32))
    sim = get_similarity_matrix(jnp.array(rng.normal(size=(3, 16)).astype(np.float32)))
    loss = CorrelationLoss.from_params([0.18, 1, 0.46, 1])

    val, (g_feats, g_code) = jax.value_and_grad(
        lambda f, c: loss(key, f, c, sim), argnums=(0, 1)
    )(feats, code)
    assert np.isfinite(float(val))
    # fd is stop_gradient'ed, but feats also enter cd? No — cd uses code only.
    np.testing.assert_allclose(np.array(g_feats), 0.0)
    assert float(jnp.sum(jnp.abs(g_code))) > 0


def _torch_geo_kernel(a, b, max_depth=15.0):
    x = a.unsqueeze(-1).unsqueeze(-1)
    y = b.unsqueeze(2).unsqueeze(3)
    ret = torch.sum(torch.abs(x - y), dim=1).abs()
    ret = 1.0 / (ret + 5e-2)
    ret[ret > max_depth] = max_depth
    return ret


def test_geo_kernel_matches_torch(rng):
    a = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
    b = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
    loss = GeoCorrelationLoss()
    ours = np.array(loss.tensor_correlation(jnp.array(a), jnp.array(b)))
    ref = _torch_geo_kernel(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    assert ours.shape == (2, 4, 4, 4, 4)


def test_geo_depth_filter(key, rng):
    loss = GeoCorrelationLoss.from_params([0.5, 1, 3, 1])
    depth = np.array([[[[1.0, 20.0], [5.0, 14.0]]]], np.float32)  # 20 > max_depth
    ray_o = np.zeros((1, 3, 2, 2), np.float32)
    ray_d = np.ones((1, 3, 2, 2), np.float32)
    code = rng.normal(size=(1, 2, 2, 2)).astype(np.float32)
    sim = jnp.zeros((1, 1))
    v = loss(key, jnp.array(depth), jnp.array(code), (jnp.array(ray_o), jnp.array(ray_d)), sim)
    assert np.isfinite(float(v))


def test_geo_loss_grads_flow_to_depth_and_code(key, rng):
    loss = GeoCorrelationLoss.from_params([0.5, 1, 3, 1])
    B, P = 3, 5
    depth = jnp.array(rng.uniform(1, 5, (B, 1, P, P)).astype(np.float32))
    code = jnp.array(rng.normal(size=(B, 2, P, P)).astype(np.float32))
    ray_o = jnp.array(rng.normal(size=(B, 3, P, P)).astype(np.float32))
    ray_d = jnp.array(rng.normal(size=(B, 3, P, P)).astype(np.float32))
    sim = get_similarity_matrix(jnp.array(rng.normal(size=(B, 8)).astype(np.float32)))

    val, (g_d, g_c) = jax.value_and_grad(
        lambda d, c: loss(key, d, c, (ray_o, ray_d), sim), argnums=(0, 1)
    )(depth, code)
    assert np.isfinite(float(val))
    # geometry features (from depth) are stop_gradient'ed inside helper's fd,
    # but cd is built from code — code must get gradient
    assert float(jnp.sum(jnp.abs(g_c))) > 0
    np.testing.assert_allclose(np.array(g_d), 0.0)  # fd branch is no-grad


def _torch_geo_forward(depth, code, ray_o, ray_d, sim, params, max_depth=15.0):
    """Full reference GeoCorrelationLoss.forward (utils/image.py:373-482):
    depth filter -> depth2pts -> helper (RAW fd, normalized cd) -> weighted mean."""
    self_shift, self_weight, neg_shift, neg_weight = params

    def norm(t):
        return F.normalize(t, dim=1, eps=1e-10)

    def helper(f1, f2, c1, c2, shift):
        with torch.no_grad():
            fd = _torch_geo_kernel(f1, f2, max_depth)  # RAW points (:418)
            old_mean = fd.mean()
            fd = fd - fd.mean([3, 4], keepdim=True)
            fd = fd - fd.mean() + old_mean
        cd = _torch_geo_kernel(norm(c1), norm(c2), max_depth)
        return -cd.clamp(0.0) * (fd - shift)

    depth = depth.clone()
    depth[depth > max_depth] = depth[depth < max_depth].max()
    feats = ray_o + ray_d * depth
    neg_idx = torch.min(sim, dim=0)[1]
    neg_loss = helper(feats, feats[neg_idx], code, code[neg_idx], neg_shift)
    self_loss = helper(feats, feats, code, code, self_shift)
    return neg_weight * neg_loss.mean() + self_weight * self_loss.mean()


def test_geo_forward_matches_torch_end_to_end(key, rng):
    """Full geo forward vs a torch transcription of the reference, including
    the raw-XYZ fd (the round-1 parity bug: fd must NOT be normalized)."""
    B, P = 4, 6
    params = [0.5, 1.0, 3.0, 1.0]
    depth = rng.uniform(0.5, 8.0, (B, 1, P, P)).astype(np.float32)
    depth[0, 0, 0, 0] = 22.0  # exercise the >max_depth filter
    code = rng.normal(size=(B, 2, P, P)).astype(np.float32)
    ray_o = rng.normal(size=(B, 3, P, P)).astype(np.float32)
    ray_d = rng.normal(size=(B, 3, P, P)).astype(np.float32)
    sim = rng.normal(size=(B, B)).astype(np.float32)

    loss = GeoCorrelationLoss.from_params(params, use_sim_matrix=True)
    ours = float(loss(key, jnp.array(depth), jnp.array(code),
                      (jnp.array(ray_o), jnp.array(ray_d)), jnp.array(sim)))
    ref = float(_torch_geo_forward(
        *(torch.from_numpy(a) for a in (depth, code, ray_o, ray_d, sim)), params))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_geo_fd_uses_raw_points(rng):
    """Scaling all points by a constant must CHANGE fd (raw) — under the buggy
    normalized fd it would be invariant."""
    loss = GeoCorrelationLoss()
    pts = jnp.array(rng.uniform(1, 4, (2, 3, 4, 4)).astype(np.float32))
    code = jnp.array(rng.normal(size=(2, 2, 4, 4)).astype(np.float32))
    h1 = loss.helper(pts, pts, code, code, 3.0)
    h2 = loss.helper(pts * 5.0, pts * 5.0, code, code, 3.0)
    assert float(jnp.max(jnp.abs(h1 - h2))) > 1e-3


def test_nerf_contrastive_matches_manual(rng):
    x = rng.normal(size=(5, 7)).astype(np.float32)
    ours = float(nerf_contrastive(jnp.array(x)))
    xt = torch.from_numpy(x)
    sim = F.cosine_similarity(xt.unsqueeze(1), xt.unsqueeze(0), dim=2)
    mask = torch.eye(5, dtype=torch.bool)
    vals = sim[~mask]
    lo, hi = vals.min(), vals.max()
    ref = float(-torch.log(hi / (hi + lo)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_similarity_matrix_symmetric_unit_diag(rng):
    x = jnp.array(rng.normal(size=(4, 9)).astype(np.float32))
    sim = np.array(get_similarity_matrix(x))
    np.testing.assert_allclose(sim, sim.T, atol=1e-6)
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-6)
