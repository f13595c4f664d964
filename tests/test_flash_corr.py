"""Flash blockwise geo-correlation kernel: parity vs the XLA path.

The XLA path itself is torch-oracle-verified (test_losses.py); these tests
pin the Pallas interpret-mode evaluation to it, value and gradient.
On-chip behavior is checked separately (tools/perf_flash_corr.py) per the
round-1 rule: interpret-mode tests cannot catch on-chip bugs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsos_tpu.losses.correlation import (
    GeoCorrelationLoss,
    get_similarity_matrix,
    _norm,
)
from nerfsos_tpu.ops.pallas.flash_corr import (
    flash_geo_helper_mean,
    flash_supported,
)


@pytest.fixture(scope="module")
def geo_inputs():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    B, P, S = 4, 16, 2
    sem = jax.random.normal(ks[0], (B, S, P, P))
    depth = jax.random.uniform(ks[1], (B, 1, P, P)) * 5 + 1
    ray_o = jax.random.normal(ks[2], (B, 3, P, P))
    ray_d = jax.random.normal(ks[3], (B, 3, P, P))
    sim = get_similarity_matrix(jax.random.normal(ks[4], (B, 64)))
    return ks, sem, depth, ray_o, ray_d, sim


def test_flash_supported_blocks():
    assert flash_supported(64 * 64)
    assert flash_supported(16 * 16)
    assert flash_supported(128)
    assert not flash_supported(100)
    assert not flash_supported(17 * 17)


def test_flash_helper_mean_matches_xla(geo_inputs):
    ks, sem, depth, ray_o, ray_d, _ = geo_inputs
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_flash=False)
    pts = geo.depth2pts(depth, ray_o, ray_d)
    sem2 = jnp.roll(sem, 1, axis=0)
    ref = geo.helper(pts, jnp.roll(pts, 1, axis=0), sem, sem2, 3.0).mean()
    got = flash_geo_helper_mean(pts, jnp.roll(pts, 1, axis=0),
                                _norm(sem), _norm(sem2), 3.0, geo.max_depth)
    # closed-form pointwise recenter (fd - rowmean + gmean) drops the exactly-
    # zero inner mean the XLA path subtracts in floats: ~1e-5 rel discrepancy.
    np.testing.assert_allclose(float(got), float(ref), rtol=5e-5)


@pytest.mark.parametrize("use_sim", [True, False])
def test_flash_geo_call_value_and_grad_match_xla(geo_inputs, use_sim):
    ks, sem, depth, ray_o, ray_d, sim = geo_inputs
    sm = sim if use_sim else None
    flash = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=use_sim)
    xla = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=use_sim,
                                         use_flash=False)

    def loss(g, s):
        return g(ks[5], depth, s, (ray_o, ray_d), sm)

    v1, g1 = jax.value_and_grad(lambda s: loss(flash, s))(sem)
    v2, g2 = jax.value_and_grad(lambda s: loss(xla, s))(sem)
    np.testing.assert_allclose(float(v1), float(v2), rtol=5e-5)
    gr = float(jnp.linalg.norm(g1 - g2) / (jnp.linalg.norm(g2) + 1e-12))
    assert gr < 1e-5, f"grad rel {gr}"


def test_flash_no_gradient_to_depth(geo_inputs):
    """fd is stop-gradient in the reference — depth must get zero cotangent
    through the correlation term on both paths."""
    ks, sem, depth, ray_o, ray_d, sim = geo_inputs
    for flash in (True, False):
        geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_flash=flash)
        g = jax.grad(lambda d: geo(ks[5], d, sem, (ray_o, ray_d), sim))(depth)
        np.testing.assert_array_equal(np.array(g), 0.0)


def test_flash_fallback_on_unsupported_shapes(geo_inputs):
    """P*P not tileable -> silently uses the XLA path (same value)."""
    ks, *_ = geo_inputs
    B, P, S = 2, 10, 2  # N=100, not divisible by 128
    sem = jax.random.normal(ks[0], (B, S, P, P))
    depth = jax.random.uniform(ks[1], (B, 1, P, P)) + 1
    ray_o = jax.random.normal(ks[2], (B, 3, P, P))
    ray_d = jax.random.normal(ks[3], (B, 3, P, P))
    flash = GeoCorrelationLoss.from_params([0.5, 1, 3, 1])
    xla = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_flash=False)
    v1 = flash(ks[5], depth, sem, (ray_o, ray_d), None)
    v2 = xla(ks[5], depth, sem, (ray_o, ray_d), None)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)


def test_flash_pair_matches_two_singles(geo_inputs):
    """Paired kernels (shared fd sweep) == two independent flash calls —
    values AND code-side gradients, bit-level tile-order equality."""
    from nerfsos_tpu.ops.pallas.flash_corr import flash_geo_helper_mean_pair

    ks, sem, depth, ray_o, ray_d, _ = geo_inputs
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1])
    pts = geo.depth2pts(depth, ray_o, ray_d)
    neg_pts = jnp.roll(pts, 1, axis=0)
    ca = sem
    cb = jnp.roll(sem, 2, axis=0) * 1.7
    ca2 = jnp.roll(ca, 1, axis=0)
    cb2 = jnp.roll(cb, 1, axis=0)

    def singles(c_a, c_a2, c_b, c_b2):
        la = flash_geo_helper_mean(pts, neg_pts, _norm(c_a), _norm(c_a2),
                                   3.0, geo.max_depth)
        lb = flash_geo_helper_mean(pts, neg_pts, _norm(c_b), _norm(c_b2),
                                   3.0, geo.max_depth)
        return la, lb

    def paired(c_a, c_a2, c_b, c_b2):
        return flash_geo_helper_mean_pair(
            pts, neg_pts, _norm(c_a), _norm(c_a2), _norm(c_b), _norm(c_b2),
            3.0, geo.max_depth)

    (la_s, lb_s) = singles(ca, ca2, cb, cb2)
    (la_p, lb_p) = paired(ca, ca2, cb, cb2)
    np.testing.assert_array_equal(np.asarray(la_p), np.asarray(la_s))
    np.testing.assert_array_equal(np.asarray(lb_p), np.asarray(lb_s))

    # asymmetric weights catch any cross-talk between the halves' cotangents
    def loss_s(c_a, c_a2, c_b, c_b2):
        la, lb = singles(c_a, c_a2, c_b, c_b2)
        return 1.3 * la + 0.7 * lb

    def loss_p(c_a, c_a2, c_b, c_b2):
        la, lb = paired(c_a, c_a2, c_b, c_b2)
        return 1.3 * la + 0.7 * lb

    gs = jax.grad(loss_s, argnums=(0, 1, 2, 3))(ca, ca2, cb, cb2)
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(ca, ca2, cb, cb2)
    for a, b in zip(gs, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("rand_neg", [False, True])
def test_geo_pair_matches_two_calls(geo_inputs, rand_neg):
    """GeoCorrelationLoss.pair == two __call__s for both the fused path
    (sim-matrix negatives) and the key-dependent fallback (rand_neg)."""
    ks, sem, depth, ray_o, ray_d, sim = geo_inputs
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], rand_neg=rand_neg)
    code0 = sem
    code1 = jnp.roll(sem, 1, axis=0) * 0.5 + 0.1
    k0, k1 = ks[5], ks[6]

    def two(c0, c1):
        return (geo(k0, depth, c0, (ray_o, ray_d), sim),
                geo(k1, depth, c1, (ray_o, ray_d), sim))

    def fused(c0, c1):
        return geo.pair(k0, k1, depth, c0, c1, (ray_o, ray_d), sim)

    (g0_t, g1_t), (g0_p, g1_p) = two(code0, code1), fused(code0, code1)
    np.testing.assert_allclose(float(g0_p), float(g0_t), rtol=1e-6)
    np.testing.assert_allclose(float(g1_p), float(g1_t), rtol=1e-6)

    w = lambda f: (lambda c0, c1: sum(x * s for x, s in zip(f(c0, c1), (1.3, 0.7))))
    gt = jax.grad(w(two), argnums=(0, 1))(code0, code1)
    gp = jax.grad(w(fused), argnums=(0, 1))(code0, code1)
    for a, b in zip(gt, gp):
        # atol 1e-7: the quad path's XLA-side cotangent combination (concat
        # split + adds) reassociates sums vs the per-call path
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("bi", [256, 512])
def test_flash_bi_blocks_match_default(bi, monkeypatch):
    """Non-default row blocks (the VMEM-raised 256/512 tilings) == the default
    128-block evaluation, value and gradient — only the tile partition of the
    accumulated sums changes."""
    from nerfsos_tpu.ops.pallas import flash_corr as fc

    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    B, P, S = 2, 32, 2  # N = 1024: bi=512 is a real 2-row-block tiling
    sem = jax.random.normal(ks[0], (B, S, P, P))
    depth = jax.random.uniform(ks[1], (B, 1, P, P)) * 5 + 1
    ray_o = jax.random.normal(ks[2], (B, 3, P, P))
    ray_d = jax.random.normal(ks[3], (B, 3, P, P))
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1])
    pts = geo.depth2pts(depth, ray_o, ray_d)
    neg = jnp.roll(pts, 1, axis=0)

    def loss(c):
        return flash_geo_helper_mean(pts, neg, _norm(c),
                                     _norm(jnp.roll(c, 1, axis=0)),
                                     3.0, geo.max_depth)

    v_ref, g_ref = jax.value_and_grad(loss)(sem)
    monkeypatch.setattr(fc, "_FLASH_BI", bi)
    v, g = jax.value_and_grad(loss)(sem)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-8)


def test_flash_quad_matches_four_singles(geo_inputs):
    """Quad kernels (neg/self sweeps stacked on batch, coarse/fine heads
    paired) == four independent flash calls — values bit-equal, grads exact.
    This is the SOS step's one-kernel-group geometry loss."""
    from nerfsos_tpu.ops.pallas.flash_corr import flash_geo_pair_quad

    ks, sem, depth, ray_o, ray_d, _ = geo_inputs
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1])
    pts = geo.depth2pts(depth, ray_o, ray_d)
    neg_pts = jnp.roll(pts, 1, axis=0)
    c0 = sem
    c1 = jnp.roll(sem, 2, axis=0) * 1.7
    c0n = jnp.roll(c0, 1, axis=0)
    c1n = jnp.roll(c1, 1, axis=0)

    def singles(a0, a0n, a1, a1n):
        return (
            flash_geo_helper_mean(pts, neg_pts, _norm(a0), _norm(a0n),
                                  10.0, geo.max_depth),
            flash_geo_helper_mean(pts, neg_pts, _norm(a1), _norm(a1n),
                                  10.0, geo.max_depth),
            flash_geo_helper_mean(pts, pts, _norm(a0), _norm(a0),
                                  3.0, geo.max_depth),
            flash_geo_helper_mean(pts, pts, _norm(a1), _norm(a1),
                                  3.0, geo.max_depth),
        )

    def quad(a0, a0n, a1, a1n):
        return flash_geo_pair_quad(pts, neg_pts, _norm(a0), _norm(a0n),
                                   _norm(a1), _norm(a1n), 10.0, 3.0,
                                   geo.max_depth)

    vs = singles(c0, c0n, c1, c1n)
    vq = quad(c0, c0n, c1, c1n)
    for s, q in zip(vs, vq):
        np.testing.assert_array_equal(np.asarray(q), np.asarray(s))

    # asymmetric weights catch cross-talk between the four accumulators
    w = (1.3, 0.7, 0.41, 2.2)

    def loss_s(a0, a0n, a1, a1n):
        return sum(x * c for x, c in zip(singles(a0, a0n, a1, a1n), w))

    def loss_q(a0, a0n, a1, a1n):
        return sum(x * c for x, c in zip(quad(a0, a0n, a1, a1n), w))

    gs = jax.grad(loss_s, argnums=(0, 1, 2, 3))(c0, c0n, c1, c1n)
    gq = jax.grad(loss_q, argnums=(0, 1, 2, 3))(c0, c0n, c1, c1n)
    for a, b in zip(gs, gq):
        # values are bit-equal; the grads reassociate in the XLA-side
        # concat-cotangent combination (~3e-8 abs observed)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("rand_neg", [False, True])
def test_app_pair_heads_matches_two_calls(geo_inputs, rand_neg):
    """CorrelationLoss.pair_heads == two __call__s (batched sampling +
    grouped helper), both for sim-matrix argmin mining and the rand_neg
    fallback — values and code gradients."""
    from nerfsos_tpu.losses.correlation import CorrelationLoss

    ks, sem, depth, ray_o, ray_d, sim = geo_inputs
    app = CorrelationLoss.from_params([0.18, 0.67, 0.46, 0.63],
                                      rand_neg=rand_neg)
    B = sem.shape[0]
    feat = jax.random.normal(ks[7], (B, 12, 24, 24))
    code0 = sem
    code1 = jnp.roll(sem, 1, axis=0) * 0.5 + 0.1
    k0, k1 = ks[5], ks[6]

    def two(c0, c1):
        return (app(k0, feat, c0, sim), app(k1, feat, c1, sim))

    def paired(c0, c1):
        return app.pair_heads(k0, k1, feat, c0, c1, sim)

    (a0_t, a1_t), (a0_p, a1_p) = two(code0, code1), paired(code0, code1)
    np.testing.assert_allclose(float(a0_p), float(a0_t), rtol=1e-5)
    np.testing.assert_allclose(float(a1_p), float(a1_t), rtol=1e-5)

    w = lambda f: (lambda c0, c1: sum(x * s for x, s in zip(f(c0, c1), (1.3, 0.7))))
    gt = jax.grad(w(two), argnums=(0, 1))(code0, code1)
    gp = jax.grad(w(paired), argnums=(0, 1))(code0, code1)
    for a, b in zip(gt, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
