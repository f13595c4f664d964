"""Tests for the flax NeRF MLP, fields, and the coarse/fine orchestrator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsos_tpu.models.fields import MipNeRFField, NeRFField, VoxelField
from nerfsos_tpu.models.mlp import NeRFMLP, VolumeInterpolator
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet


def test_mlp_param_shapes_match_reference(key):
    """Trunk/head shapes per reference models/nerf_mlp.py:40-64 (skip at 4)."""
    m = NeRFMLP(use_semantics=True, sem_with_coord=True)
    p = m.init(key, jnp.zeros((1, 63)), jnp.zeros((1, 27)))["params"]
    assert p["pts_linears_0"]["kernel"].shape == (63, 256)
    assert p["pts_linears_4"]["kernel"].shape == (256, 256)
    # layer after the skip concat consumes [pts_embed, h]
    assert p["pts_linears_5"]["kernel"].shape == (63 + 256, 256)
    assert p["alpha_linear"]["kernel"].shape == (256, 1)
    assert p["feature_linear"]["kernel"].shape == (256, 256)
    assert p["views_linears_0"]["kernel"].shape == (256 + 27, 128)
    assert p["rgb_linear"]["kernel"].shape == (128, 3)
    # semantic head with coord concat: W + input_ch -> W/2 -> sem_dim
    assert p["sem_0"]["kernel"].shape == (256 + 63, 128)
    assert p["sem_1"]["kernel"].shape == (128, 2)


def test_mlp_deep_semantic_head(key):
    m = NeRFMLP(use_semantics=True, sem_layer=4, sem_with_geo=True)
    p = m.init(key, jnp.zeros((1, 63)), jnp.zeros((1, 27)))["params"]
    assert p["sem_0"]["kernel"].shape == (256, 256)
    assert p["sem_1"]["kernel"].shape == (256, 256)
    assert p["sem_2"]["kernel"].shape == (256, 128)
    assert p["sem_3"]["kernel"].shape == (128, 2)
    assert p["geo_0"]["kernel"].shape == (1, 128)
    assert p["geo_1"]["kernel"].shape == (128, 2)


def test_mlp_output_channel_order(key):
    """Output is [rgb(3), alpha(1), semantics(sem_dim)] — renderer relies on it."""
    m = NeRFMLP(use_semantics=True, sem_dim=2)
    x, d = jnp.ones((5, 63)), jnp.ones((5, 27))
    p = m.init(key, x, d)
    out = m.apply(p, x, d)
    assert out.shape == (5, 6)


def test_mlp_no_viewdirs(key):
    m = NeRFMLP(use_viewdirs=False, output_ch=4)
    p = m.init(key, jnp.ones((5, 63)), None)
    assert m.apply(p, jnp.ones((5, 63)), None).shape == (5, 4)


def test_field_applies_pe_and_broadcasts_dirs(key):
    f = NeRFField()
    pts = jnp.ones((7, 11, 3))
    dirs = jnp.ones((7, 3))
    p = f.init(key, pts, dirs)
    out = f.apply(p, pts, dirs)
    assert out.shape == (7, 11, 4)
    assert out.dtype == jnp.float32


def test_field_conv_embed(key):
    f = NeRFField(conv_embed=True)
    pts, dirs = jnp.ones((3, 8, 3)), jnp.ones((3, 3))
    p = f.init(key, pts, dirs)
    assert f.apply(p, pts, dirs).shape == (3, 8, 4)
    assert "conv_embed" in p["params"]


def test_mip_field(key):
    f = MipNeRFField()
    mean, cov, dirs = jnp.ones((4, 6, 3)), jnp.ones((4, 6, 3)) * 0.1, jnp.ones((4, 3))
    p = f.init(key, mean, cov, dirs)
    assert f.apply(p, mean, cov, dirs).shape == (4, 6, 4)


def test_volume_interpolator_trilinear(key):
    m = VolumeInterpolator((2, 2, 2, 1))
    p = m.init(key, jnp.zeros((1, 3)))
    # set corners: value = x index along W
    V = np.zeros((2, 2, 2, 1), np.float32)
    V[:, :, 1, 0] = 1.0
    p = {"params": {"V": jnp.array(V)}}
    # center of the cell -> 0.5; corner (-1,-1,-1) -> 0; (+1,*,*) -> 1
    out = m.apply(p, jnp.array([[0.0, 0.0, 0.0], [-1.0, -1.0, -1.0], [1.0, -1.0, -1.0]]))
    np.testing.assert_allclose(np.array(out[:, 0]), [0.5, 0.0, 1.0], atol=1e-6)


def test_voxel_field(key):
    f = VoxelField(vol_size=(4, 4, 4, 4))
    p = f.init(key, jnp.zeros((2, 5, 3)))
    assert f.apply(p, jnp.zeros((2, 5, 3))).shape == (2, 5, 4)


# ---------------------------------------------------------------- NeRFNet


@pytest.fixture(scope="module")
def tiny_net():
    cfg = NeRFConfig(netwidth=32, netwidth_fine=32, netdepth=4, netdepth_fine=4,
                     n_samples=8, n_importance=8, multires=4, multires_views=2,
                     use_semantics=True, ray_block=16)
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    return net, params


def test_nerfnet_output_contract(tiny_net, key):
    net, params = tiny_net
    rays = jax.random.normal(key, (2, 10, 3))
    out = net(params, rays, (1.0, 4.0), key=key, train=True)
    # fine outputs + coarse '0' buffers + z_std (reference nerf_net.py:124-128)
    for k in ["rgb", "disp", "acc", "depth", "weights", "semantics",
              "rgb0", "disp0", "acc0", "depth0", "weights0", "semantics0", "z_std"]:
        assert k in out, k
    assert out["rgb"].shape == (10, 3)
    assert out["semantics"].shape == (10, 2)
    assert out["weights"].shape == (10, 16)   # n_samples + n_importance
    assert out["weights0"].shape == (10, 8)
    assert out["z_std"].shape == (10,)


def test_nerfnet_unflattens_leading_shape(tiny_net, key):
    net, params = tiny_net
    rays = jax.random.normal(key, (2, 3, 5, 3))
    out = net(params, rays, (1.0, 4.0), key=key)
    assert out["rgb"].shape == (3, 5, 3)
    assert out["z_std"].shape == (3, 5)


def test_nerfnet_blocking_invariance(tiny_net, key):
    """Deterministic eval must not depend on the ray_block size."""
    net, params = tiny_net
    rays = jax.random.normal(key, (2, 37, 3))  # forces padding (block 16)
    out_a = net(params, rays, (1.0, 4.0), key=key, train=False)
    big = NeRFNet(NeRFConfig(**{**vars(net.cfg), "ray_block": 4096}))
    out_b = big(params, rays, (1.0, 4.0), key=key, train=False)
    np.testing.assert_allclose(np.array(out_a["rgb"]), np.array(out_b["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.array(out_a["depth"]), np.array(out_b["depth"]), atol=1e-4)


def test_nerfnet_shared_fine_when_no_importance(key):
    cfg = NeRFConfig(netwidth=16, netdepth=2, n_samples=4, n_importance=0,
                     multires=2, multires_views=2)
    net = NeRFNet(cfg)
    params = net.init(key)
    assert "fine" not in params
    out = net(params, jax.random.normal(key, (2, 6, 3)), (1.0, 2.0), key=key)
    assert "rgb0" not in out and out["rgb"].shape == (6, 3)


def test_nerfnet_grads_flow_and_finite(tiny_net, key):
    net, params = tiny_net
    rays = jax.random.normal(key, (2, 12, 3))
    target = jnp.zeros((12, 3))

    def loss_fn(p):
        out = net(p, rays, (1.0, 4.0), key=key, train=True)
        return jnp.mean((out["rgb"] - target) ** 2) + jnp.mean((out["rgb0"] - target) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    # both coarse and fine fields receive gradient
    gnorm_c = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g["coarse"]))
    gnorm_f = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g["fine"]))
    assert gnorm_c > 0 and gnorm_f > 0


def test_nerfnet_train_flag_controls_perturb(tiny_net, key):
    net, params = tiny_net
    rays = jax.random.normal(key, (2, 6, 3))
    # eval twice with different keys -> identical (perturb=0, noise=0)
    a = net(params, rays, (1.0, 4.0), key=jax.random.PRNGKey(1), train=False)
    b = net(params, rays, (1.0, 4.0), key=jax.random.PRNGKey(2), train=False)
    np.testing.assert_allclose(np.array(a["rgb"]), np.array(b["rgb"]), atol=0)
    # train twice with different keys -> differs (stratified jitter)
    c = net(params, rays, (1.0, 4.0), key=jax.random.PRNGKey(1), train=True)
    d = net(params, rays, (1.0, 4.0), key=jax.random.PRNGKey(2), train=True)
    assert not np.allclose(np.array(c["rgb"]), np.array(d["rgb"]))


def test_nerfnet_bf16_compute(key):
    cfg = NeRFConfig(netwidth=32, netdepth=2, n_samples=4, n_importance=4,
                     multires=2, multires_views=2, compute_dtype="bfloat16")
    net = NeRFNet(cfg)
    params = net.init(key)
    out = net(params, jax.random.normal(key, (2, 6, 3)), (1.0, 2.0), key=key)
    assert out["rgb"].dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))
