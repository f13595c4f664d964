"""Unit tests for core ray math, encoders, samplers, and compositing.

Golden values follow the reference semantics (VITA-Group/NeRF-SOS), computed
independently with numpy here.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsos_tpu.core import encoding, rays, render, sampling


# ---------------------------------------------------------------- rays


def test_persp_rays_center_pixel_points_forward():
    H, W, f = 5, 5, 10.0
    K = rays.persp_intrinsics(H, W, f)
    c2w = jnp.eye(4)[:3]
    r = rays.persp_rays(H, W, K, c2w)
    assert r.shape == (2, H, W, 3)
    # Origin is the camera center
    np.testing.assert_allclose(r[0], 0.0)
    # Pixel at the principal point looks straight down -z
    d_center = np.array(r[1, 2, 2])  # pixel (i=2.5-ish) — use exact: (2 - 2.5)/10
    np.testing.assert_allclose(d_center, [(2 - 2.5) / 10, -(2 - 2.5) / 10, -1.0], atol=1e-6)


def test_persp_rays_rotation_applied():
    H, W = 3, 3
    K = rays.persp_intrinsics(H, W, 5.0)
    # 90 degree rotation about y: x->-z, z->x
    c2w = jnp.array([[0.0, 0, 1, 2], [0, 1, 0, 3], [-1, 0, 0, 4]])
    r = rays.persp_rays(H, W, K, c2w)
    np.testing.assert_allclose(np.array(r[0, 0, 0]), [2.0, 3.0, 4.0])
    # camera-frame dir for pixel (0,0): [(0-1.5)/5, -(0-1.5)/5, -1]
    d_cam = np.array([-0.3, 0.3, -1.0])
    expect = c2w[:3, :3] @ d_cam
    np.testing.assert_allclose(np.array(r[1, 0, 0]), expect, atol=1e-6)


def test_ndc_rays_near_plane():
    o = jnp.array([[0.0, 0.0, -1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    no, nd = rays.ndc_rays(4, 4, 2.0, 1.0, o, d)
    assert no.shape == (1, 3) and nd.shape == (1, 3)
    # On-axis ray maps to ndc origin-ish x,y = 0
    np.testing.assert_allclose(np.array(no[0, :2]), [0.0, 0.0], atol=1e-6)


# ---------------------------------------------------------------- encoding


def test_pe_dims_match_reference():
    # multires=10 -> 63, multires_views=4 -> 27 (reference models/nerf_mlp.py:149-154)
    assert encoding.pe_dim(3, 10) == 63
    assert encoding.pe_dim(3, 4) == 27


def test_pe_column_order_reference_compatible():
    """Layout: [x, sin(f0 x), cos(f0 x), sin(f1 x), ...] with per-freq blocks
    [sin over channels, cos over channels] (reference models/embedder.py:34-48)."""
    x = jnp.array([[0.1, -0.2, 0.3]])
    out = np.array(encoding.positional_encoding(x, n_freqs=2, max_freq=1.0))
    bands = [1.0, 2.0]
    expect = [0.1, -0.2, 0.3]
    for f in bands:
        expect += [np.sin(f * v) for v in [0.1, -0.2, 0.3]]
        expect += [np.cos(f * v) for v in [0.1, -0.2, 0.3]]
    np.testing.assert_allclose(out[0], expect, atol=1e-6)


def test_ipe_shrinks_with_variance():
    x = jnp.ones((4, 3)) * 0.5
    small = encoding.integrated_positional_encoding(x, jnp.zeros((4, 3)), 4)
    big = encoding.integrated_positional_encoding(x, jnp.ones((4, 3)) * 10.0, 4)
    assert small.shape == (4, 24)
    assert float(jnp.max(jnp.abs(big))) < float(jnp.max(jnp.abs(small)))
    # zero variance degenerates to plain sin/cos features
    y = np.array(small[0])
    assert abs(y[0] - np.sin(0.5)) < 1e-6


# ---------------------------------------------------------------- sampling


def test_stratified_no_perturb_is_linspace():
    z = sampling.stratified_sample(None, jnp.full((5, 1), 2.0), jnp.full((5, 1), 6.0), 5)
    np.testing.assert_allclose(np.array(z[0]), [2.0, 3.0, 4.0, 5.0, 6.0], atol=1e-6)


def test_stratified_lindisp():
    z = sampling.stratified_sample(None, jnp.full((1, 1), 1.0), jnp.full((1, 1), 2.0), 3, lindisp=True)
    np.testing.assert_allclose(np.array(z[0]), [1.0, 1.0 / 0.75, 2.0], atol=1e-6)


def test_stratified_perturb_stays_in_strata(key):
    near, far = jnp.full((64, 1), 1.0), jnp.full((64, 1), 5.0)
    z0 = sampling.stratified_sample(None, near, far, 16)
    z = sampling.stratified_sample(key, near, far, 16, perturb=1.0)
    mids = 0.5 * (z0[..., 1:] + z0[..., :-1])
    upper = jnp.concatenate([mids, z0[..., -1:]], -1)
    lower = jnp.concatenate([z0[..., :1], mids], -1)
    assert bool(jnp.all(z >= lower - 1e-6)) and bool(jnp.all(z <= upper + 1e-6))


def test_searchsorted_right_matches_numpy(rng):
    seq = np.sort(rng.random((8, 17)), axis=-1)
    vals = rng.random((8, 9))
    got = np.array(sampling.searchsorted_right(jnp.array(seq), jnp.array(vals)))
    for b in range(8):
        expect = np.searchsorted(seq[b], vals[b], side="right")
        np.testing.assert_array_equal(got[b], expect)


def test_sample_pdf_det_concentrates_on_heavy_bin():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (2, 9))
    w = np.full((2, 8), 1e-8, np.float32)
    w[:, 4] = 1.0  # all mass in bin [0.5, 0.625]
    s = sampling.sample_pdf(None, bins, jnp.array(w), 16, det=True)
    assert s.shape == (2, 16)
    # u=0 and u=1 land on the cdf edges by construction; the middle 14/16 must
    # fall in the heavy bin.
    inside = np.mean((np.array(s) >= 0.5) & (np.array(s) <= 0.625))
    assert inside >= 14.0 / 16.0


def test_sample_pdf_uniform_weights_det_is_uniform():
    bins = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 5), (1, 5))
    w = jnp.ones((1, 4))
    s = np.array(sampling.sample_pdf(None, bins, w, 5, det=True))
    np.testing.assert_allclose(s[0], np.linspace(2.0, 4.0, 5), atol=1e-5)


def test_importance_merge_sorted(key):
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (4, 8))
    w = jax.random.uniform(key, (4, 8))
    z_all, z_s = sampling.importance_sample(key, z, w, 8)
    assert z_all.shape == (4, 16) and z_s.shape == (4, 8)
    assert bool(jnp.all(jnp.diff(z_all, axis=-1) >= 0))


def test_importance_samples_have_no_grad(key):
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (2, 8))

    def f(w):
        _, z_s = sampling.importance_sample(key, z, w, 4)
        return jnp.sum(z_s)

    g = jax.grad(f)(jax.random.uniform(key, (2, 8)))
    np.testing.assert_allclose(np.array(g), 0.0)


# ---------------------------------------------------------------- render


def _manual_composite(raw, z, d):
    """Independent numpy implementation of the reference quadrature."""
    dists = np.concatenate([z[..., 1:] - z[..., :-1], np.full_like(z[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(d, axis=-1, keepdims=True)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    alpha = 1.0 - np.exp(-np.maximum(raw[..., 3], 0.0) * dists)
    T = np.cumprod(np.concatenate([np.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1)[..., :-1]
    w = alpha * T
    return (w[..., None] * rgb).sum(-2), w


def test_volumetric_render_matches_manual(rng):
    R, S = 16, 12
    raw = rng.normal(size=(R, S, 4)).astype(np.float32)
    z = np.sort(rng.uniform(1.0, 5.0, size=(R, S)).astype(np.float32), axis=-1)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    out = render.volumetric_render(jnp.array(raw), jnp.array(z), jnp.array(d))
    rgb_ref, w_ref = _manual_composite(raw, z, d)
    np.testing.assert_allclose(np.array(out["rgb"]), rgb_ref, atol=1e-5)
    np.testing.assert_allclose(np.array(out["weights"]), w_ref, atol=1e-5)
    np.testing.assert_allclose(
        np.array(out["depth"])[:, 0], (w_ref * z).sum(-1), atol=1e-4
    )


def test_opaque_first_sample_dominates():
    z = jnp.array([[1.0, 2.0, 3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    raw = jnp.array([[[10.0, -10.0, -10.0, 1e5], [0.0, 0.0, 0.0, 1e5], [0.0, 0.0, 0.0, 1e5]]])
    out = render.volumetric_render(raw, z, d)
    np.testing.assert_allclose(np.array(out["rgb"][0]), [1.0, 0.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(float(out["depth"][0, 0]), 1.0, atol=1e-4)
    np.testing.assert_allclose(float(out["acc"][0, 0]), 1.0, atol=1e-4)


def test_vacancy_depth_is_inf_and_white_bkgd():
    z = jnp.array([[1.0, 2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    raw = jnp.full((1, 2, 4), -100.0)  # zero density
    out = render.volumetric_render(raw, z, d, white_bkgd=True)
    assert float(out["depth"][0, 0]) == 1e10
    np.testing.assert_allclose(np.array(out["rgb"][0]), 1.0, atol=1e-6)


def test_semantics_composited_like_rgb(rng):
    R, S = 4, 6
    raw = rng.normal(size=(R, S, 6)).astype(np.float32)
    z = np.sort(rng.uniform(1.0, 3.0, (R, S)).astype(np.float32), -1)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    out = render.volumetric_render(
        jnp.array(raw), jnp.array(z), jnp.array(d), use_semantics=True
    )
    assert out["semantics"].shape == (R, 2)
    w = np.array(out["weights"])
    np.testing.assert_allclose(
        np.array(out["semantics"]), (w[..., None] * raw[..., 4:]).sum(-2), atol=1e-5
    )


def test_render_noise_is_keyed(key):
    z = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 8), (4, 8))
    d = jnp.ones((4, 3))
    raw = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 4))
    a = render.volumetric_render(raw, z, d, raw_noise_std=1.0, noise_key=key)
    b = render.volumetric_render(raw, z, d, raw_noise_std=1.0, noise_key=key)
    c = render.volumetric_render(raw, z, d, raw_noise_std=1.0, noise_key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.array(a["weights"]), np.array(b["weights"]))
    assert not np.allclose(np.array(a["weights"]), np.array(c["weights"]))


def test_mip_render_uses_midpoints(rng):
    R, S = 4, 8
    raw = rng.normal(size=(R, S, 4)).astype(np.float32)
    edges = np.sort(rng.uniform(1.0, 5.0, (R, S + 1)).astype(np.float32), -1)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    out = render.mip_volumetric_render(jnp.array(raw), jnp.array(edges), jnp.array(d))
    assert out["rgb"].shape == (R, 3) and out["weights"].shape == (R, S)
    mids = 0.5 * (edges[..., 1:] + edges[..., :-1])
    w = np.array(out["weights"])
    np.testing.assert_allclose(np.array(out["depth"])[:, 0], (w * mids).sum(-1), atol=1e-4)


def test_projection_render_shapes(rng):
    raw = jnp.array(rng.normal(size=(5, 7, 4)).astype(np.float32))
    pts = jnp.array(rng.normal(size=(5, 7, 3)).astype(np.float32))
    out = render.projection_render(raw, pts)
    assert out["rgb"].shape == (5, 4) and out["weights"].shape == (5, 7)


def test_fused_pe_matches_naive(rng):
    x = jnp.array(rng.normal(size=(33, 3)).astype(np.float32))
    a = encoding.positional_encoding(x, 10)
    b = encoding.positional_encoding_fused(x, 10)
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-5)
    a = encoding.positional_encoding(x, 4, include_input=False)
    b = encoding.positional_encoding_fused(x, 4, include_input=False)
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-5)


def test_merge_sorted_matches_sort(rng):
    a = np.sort(rng.random((7, 9)).astype(np.float32), -1)
    b = np.sort(rng.random((7, 5)).astype(np.float32), -1)
    got = np.array(sampling.merge_sorted(jnp.array(a), jnp.array(b)))
    ref = np.sort(np.concatenate([a, b], -1), -1)
    np.testing.assert_allclose(got, ref, atol=0)


def test_merge_sorted_with_ties():
    a = jnp.array([[1.0, 2.0, 2.0, 3.0]])
    b = jnp.array([[2.0, 2.5]])
    got = np.array(sampling.merge_sorted(a, b))
    np.testing.assert_allclose(got[0], [1.0, 2.0, 2.0, 2.0, 2.5, 3.0])


def test_sorted_uniform_is_sorted_and_uniform(key):
    u = np.array(sampling.sorted_uniform(key, (2000, 16)))
    assert np.all(np.diff(u, axis=-1) >= 0)
    assert 0.0 <= u.min() and u.max() <= 1.0
    # marginal of all order stats pooled ~ U(0,1): mean ~0.5, var ~1/12
    np.testing.assert_allclose(u.mean(), 0.5, atol=0.01)
    np.testing.assert_allclose(u.var(), 1.0 / 12, atol=0.01)


def test_doubling_scans_match_numpy(rng):
    """The TPU loop-free scans (scan_ops) vs numpy sequential scans — these
    run on TPU only (the backend gate keeps jnp originals on CPU), so test
    the doubling implementation directly."""
    from nerfsos_tpu.core.scan_ops import _doubling_scan

    for S in (1, 2, 7, 64, 192):
        x = rng.random((4, S)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(_doubling_scan(jnp.asarray(x), jnp.add, 0.0)),
            np.cumsum(x, -1), rtol=3e-6, err_msg=f"cumsum S={S}")
        xp = (x * 0.01 + 0.99).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(_doubling_scan(jnp.asarray(xp), jnp.multiply, 1.0)),
            np.cumprod(xp, -1), rtol=3e-6, err_msg=f"cumprod S={S}")
