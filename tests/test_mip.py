"""mip-NeRF tests: gaussian lifting, blurpool, end-to-end render."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsos_tpu.models.mip import (
    MipNeRFNet,
    blurpool_weights,
    cast_rays,
    conical_frustum_to_gaussian,
    cylinder_to_gaussian,
    lift_gaussian,
)
from nerfsos_tpu.models.nerf import NeRFConfig


def test_lift_gaussian_axis_decomposition():
    """Variance along the ray uses d d^T, perpendicular uses I - dd^T/|d|^2."""
    d = jnp.array([[0.0, 0.0, 2.0]])
    t_mean = jnp.array([[1.0]])
    t_var = jnp.array([[0.25]])
    r_var = jnp.array([[0.04]])
    mean, cov = lift_gaussian(d, t_mean, t_var, r_var)
    np.testing.assert_allclose(np.array(mean[0, 0]), [0, 0, 2.0], atol=1e-6)
    # z gets t_var * dz^2 = 0.25*4 = 1; x,y get r_var * 1 = 0.04
    np.testing.assert_allclose(np.array(cov[0, 0]), [0.04, 0.04, 1.0], atol=1e-6)


def test_conical_stable_matches_unstable_far_from_origin():
    d = jnp.array([[0.0, 0.0, 1.0]])
    t0 = jnp.array([[10.0]])
    t1 = jnp.array([[10.5]])
    r = jnp.array([[0.01]])
    m_s, c_s = conical_frustum_to_gaussian(d, t0, t1, r, stable=True)
    m_u, c_u = conical_frustum_to_gaussian(d, t0, t1, r, stable=False)
    np.testing.assert_allclose(np.array(m_s), np.array(m_u), rtol=1e-4)
    np.testing.assert_allclose(np.array(c_s), np.array(c_u), rtol=1e-2)


def test_cylinder_gaussian():
    d = jnp.array([[0.0, 0.0, 1.0]])
    m, c = cylinder_to_gaussian(d, jnp.array([[1.0]]), jnp.array([[3.0]]), jnp.array([[0.2]]))
    np.testing.assert_allclose(np.array(m[0, 0]), [0, 0, 2.0], atol=1e-6)
    # t_var = 4/12, r_var = 0.01
    np.testing.assert_allclose(np.array(c[0, 0]), [0.01, 0.01, 1.0 / 3], atol=1e-6)


def test_cast_rays_shapes_and_offset():
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 9), (4, 9))
    o = jnp.ones((4, 3)) * 5.0
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    radii = jnp.full((4, 1), 0.01)
    means, covs = cast_rays(z, o, d, radii)
    assert means.shape == (4, 8, 3) and covs.shape == (4, 8, 3)
    # means offset by origin
    assert bool(jnp.all(means[..., 0] == 5.0))


def test_blurpool_matches_manual():
    w = jnp.array([[0.0, 1.0, 0.0, 0.0]])
    out = np.array(blurpool_weights(w))
    # pad -> [0,0,1,0,0,0]; max pairs -> [0,1,1,0,0]; blur -> [.5,1,.5,0]
    np.testing.assert_allclose(out[0], [0.5, 1.0, 0.5, 0.0], atol=1e-6)


@pytest.fixture(scope="module")
def mip_net():
    cfg = NeRFConfig(netwidth=32, netdepth=2, n_samples=8, n_importance=8,
                     multires=4, multires_views=2, ray_block=64)
    net = MipNeRFNet(cfg)
    return net, net.init(jax.random.PRNGKey(0))


def test_mip_forward_contract(mip_net, key):
    net, params = mip_net
    rays = jax.random.normal(key, (2, 10, 3))
    out = net(params, rays, (1.0, 4.0), radii=0.01, key=key, train=True)
    # coarse has n_samples-1 gaussians; fine has (n_samples-1)+n_importance-1
    assert out["weights0"].shape == (10, 7)
    assert out["weights"].shape == (10, 14)
    assert out["rgb"].shape == (10, 3) and out["z_std"].shape == (10,)


def test_mip_shared_params_single_field(mip_net):
    net, params = mip_net
    assert set(params.keys()) == {"mip"}


def test_mip_grads_finite(mip_net, key):
    net, params = mip_net
    rays = jax.random.normal(key, (2, 8, 3))

    def loss(p):
        out = net(p, rays, (1.0, 4.0), radii=0.01, key=key, train=True)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["rgb0"] ** 2)

    g = jax.grad(loss)(params)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(g))


def test_mip_eval_deterministic(mip_net, key):
    net, params = mip_net
    rays = jax.random.normal(key, (2, 6, 3))
    a = net(params, rays, (1.0, 4.0), radii=0.01, key=jax.random.PRNGKey(1))
    b = net(params, rays, (1.0, 4.0), radii=0.01, key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.array(a["rgb"]), np.array(b["rgb"]), atol=0)


# ---------------------------------------------------------------- planar


def test_cast_rays_planar_matches_cast_rays(key):
    from nerfsos_tpu.models.mip import cast_rays_planar

    R, S = 11, 6
    ks = jax.random.split(key, 3)
    z = jnp.sort(jax.random.uniform(ks[0], (R, S + 1)) * 4 + 1, axis=-1)
    o = jax.random.normal(ks[1], (R, 3))
    d = jax.random.normal(ks[2], (R, 3))
    v = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    radii = jnp.full((R, 1), 0.01)
    for shape in ("cone", "cylinder"):
        means, covs = cast_rays(z, o, d, radii, shape)
        pd = cast_rays_planar(z, o, d, radii, v, shape)
        np.testing.assert_allclose(
            np.array(pd[0:3]).reshape(3, R, S),
            np.array(means).transpose(2, 0, 1), rtol=1e-6, err_msg=shape)
        np.testing.assert_allclose(
            np.array(pd[3:6]).reshape(3, R, S),
            np.array(covs).transpose(2, 0, 1), rtol=1e-5, atol=1e-10,
            err_msg=shape)
        np.testing.assert_allclose(
            np.array(pd[6:9]).reshape(3, R, S),
            np.broadcast_to(np.array(v).T[:, :, None], (3, R, S)), rtol=1e-6)


def test_mip_planar_render_matches_xla(mip_net, key):
    """fused_field=True routes mip through the planar IPE kernel (interpret
    on CPU); outputs must match the XLA field end-to-end."""
    import dataclasses

    net, params = mip_net
    pl_net = MipNeRFNet(dataclasses.replace(net.cfg, fused_field=True))
    rays = jax.random.normal(key, (2, 33, 3))
    a = net(params, rays, (1.0, 4.0), radii=0.001, key=jax.random.PRNGKey(2))
    b = pl_net(params, rays, (1.0, 4.0), radii=0.001, key=jax.random.PRNGKey(2))
    for k in ("rgb", "acc", "depth", "rgb0"):
        np.testing.assert_allclose(np.array(a[k]), np.array(b[k]), atol=2e-5,
                                   err_msg=k)


def test_mip_planar_grads_match_xla(mip_net, key):
    import dataclasses

    net, params = mip_net
    pl_net = MipNeRFNet(dataclasses.replace(net.cfg, fused_field=True))
    rays = jax.random.normal(key, (2, 9, 3))
    tgt = jax.random.uniform(jax.random.PRNGKey(7), (9, 3))

    def loss(n, p):
        out = n(p, rays, (1.0, 4.0), 0.001, key=jax.random.PRNGKey(2))
        return jnp.mean((out["rgb"] - tgt) ** 2) + jnp.mean((out["rgb0"] - tgt) ** 2)

    ga = jax.grad(lambda p: loss(net, p))(params)
    gb = jax.grad(lambda p: loss(pl_net, p))(params)
    for (path, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(ga)[0],
                                 jax.tree_util.tree_flatten_with_path(gb)[0]):
        denom = np.abs(np.array(a)).max() + 1e-9
        np.testing.assert_array_less(
            np.abs(np.array(a) - np.array(b)).max() / denom, 3e-5,
            err_msg=jax.tree_util.keystr(path))
