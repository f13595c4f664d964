"""Tests for the auxiliary components: camera transformer, vote net,
layered sampler, debug guards, voxel net path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsos_tpu.core.sampling import layered_sample
from nerfsos_tpu.models.camera import (
    CameraTransformer,
    corrupt_cameras,
    quat_to_rotmats,
    transform_rays,
)
from nerfsos_tpu.models.vote_net import VoteNet, polar_to_rotmat, polar_to_xyz
from nerfsos_tpu.utils.debug import assert_finite, check


def test_quat_identity_is_identity_rotation():
    q = jnp.array([[0.0, 0, 0, 1.0]])
    R = quat_to_rotmats(q)
    np.testing.assert_allclose(np.array(R[0]), np.eye(3), atol=1e-4)


def test_quat_rotmats_orthonormal(key):
    q = jax.random.normal(key, (10, 4))
    R = np.array(quat_to_rotmats(q))
    # tolerance bounded by the reference's own 1e-5 norm regularization
    # (models/camera.py:104), which biases small-norm quats by ~1e-5/|q|^2
    for i in range(10):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-3)


def test_camera_transformer_identity_init(key):
    m = CameraTransformer(num_cams=3)
    o = jnp.concatenate([jax.random.normal(key, (5, 3)),
                         jnp.array([[0], [1], [2], [0], [1.0]])], -1)
    d = jnp.concatenate([jax.random.normal(jax.random.PRNGKey(1), (5, 3)), o[:, 3:]], -1)
    params = m.init(key, o, d)
    new_o, new_d = m.apply(params, o, d)
    np.testing.assert_allclose(np.array(new_o), np.array(o[:, :3]), atol=1e-4)
    np.testing.assert_allclose(np.array(new_d), np.array(d[:, :3]), atol=1e-4)


def test_corrupt_cameras_changes_poses(rng):
    poses = np.tile(np.eye(4)[:3][None], (4, 1, 1))
    out = corrupt_cameras(poses, rng)
    assert out.shape == (4, 3, 4)
    assert not np.allclose(out, poses)
    # rotations remain orthonormal
    for i in range(4):
        np.testing.assert_allclose(out[i, :3, :3] @ out[i, :3, :3].T, np.eye(3), atol=1e-6)


def test_transform_rays_zero_is_noop(key):
    o = jax.random.normal(key, (6, 3))
    d = jax.random.normal(jax.random.PRNGKey(1), (6, 3))
    cam_id = jnp.zeros((6,), jnp.int32)
    no, nd = transform_rays(o, d, cam_id, jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.array(no), np.array(o), atol=1e-6)
    np.testing.assert_allclose(np.array(nd), np.array(d), atol=1e-6)


def test_layered_sampler_plane_intersections():
    o = jnp.array([[0.0, 0, 0]])
    d = jnp.array([[0.0, 0, -1]])
    normals = jnp.array([[0.0, 0, -1], [0.0, 0, -1]])
    offsets = jnp.array([2.0, 5.0])
    z = layered_sample(None, o, d, normals, offsets)
    np.testing.assert_allclose(np.array(z[0]), [2.0, 5.0], atol=1e-6)


def test_layered_sampler_perturb_modes(key):
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0, -1]]), (4, 1))
    normals = jnp.tile(jnp.array([[0.0, 0, -1]]), (8, 1))
    offsets = jnp.linspace(1.0, 8.0, 8)
    z2 = layered_sample(key, o, d, normals, offsets, perturb=2.5)
    z4 = layered_sample(key, o, d, normals, offsets, perturb=4.5)
    assert z2.shape == (4, 8) and z4.shape == (4, 8)
    assert bool(jnp.all(jnp.isfinite(z2))) and bool(jnp.all(jnp.isfinite(z4)))


def test_polar_rotmat_orthonormal():
    az = jnp.linspace(-3.0, 3.0, 5)
    ze = jnp.linspace(0.3, 2.8, 5)
    R = np.array(polar_to_rotmat(az, ze))
    for i in range(5):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
    xyz = np.array(polar_to_xyz(az, ze, rad=2.0))
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=-1), 2.0, atol=1e-5)


def test_vote_net_votes_shape(key):
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet

    cfg = NeRFConfig(netwidth=8, netdepth=1, n_samples=2, n_importance=0,
                     multires=2, multires_views=2, ray_block=4096)
    net = NeRFNet(cfg)
    params = net.init(key)
    vn = VoteNet(net, (0.5, 2.0), a_samples=4, z_samples=4)
    o = jax.random.normal(key, (2, 6, 3))
    d = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 3))
    gts = jax.random.uniform(jax.random.PRNGKey(2), (2, 6, 3))
    out = vn(params, o, d, gts)
    assert out["expected"].shape == (2, 2)
    assert out["heatmap"].shape == (4, 4)
    np.testing.assert_allclose(float(jnp.sum(out["heatmap"])), 1.0, atol=1e-5)


def test_debug_guards(key):
    check(x=jnp.ones(3))  # must not raise under trace
    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.array([1.0, jnp.nan])})


def test_voxel_nerf_net_end_to_end(key):
    from nerfsos_tpu.models.nerf import NeRFConfig
    from nerfsos_tpu.models.voxel_nerf import VoxelNeRFNet

    cfg = NeRFConfig(n_samples=4, n_importance=4, ray_block=64)
    net = VoxelNeRFNet(cfg, vol_size=(8, 8, 8, 4))
    params = net.init(key)
    assert set(params) == {"voxel"}
    rays = jax.random.normal(key, (2, 10, 3)) * 0.2
    out = net(params, rays, (0.1, 1.0), key=key, train=True)
    assert out["rgb"].shape == (10, 3)
    g = jax.grad(lambda p: jnp.sum(net(p, rays, (0.1, 1.0), key=key, train=True)["rgb"]))(params)
    assert bool(jnp.all(jnp.isfinite(g["voxel"]["volume"]["V"])))


def test_simclr_contrastive(key):
    from nerfsos_tpu.losses.correlation import simclr_contrastive

    a = jax.random.normal(key, (6, 16))
    # identical pairs should have lower loss than random pairs
    l_same = float(simclr_contrastive(a, a))
    b = jax.random.normal(jax.random.PRNGKey(9), (6, 16))
    l_rand = float(simclr_contrastive(a, b))
    assert np.isfinite(l_same) and np.isfinite(l_rand)
    assert l_same < l_rand


def test_compare_and_update_args():
    import argparse

    from nerfsos_tpu.engines.config import compare_args, update_args

    a = argparse.Namespace(netdepth=8, netwidth=256)
    b = argparse.Namespace(netdepth=8, netwidth=128)
    assert compare_args(a, b, ["netdepth"])
    assert not compare_args(a, b, ["netdepth", "netwidth"])
    update_args(a, b, ["netwidth"])
    assert a.netwidth == 128
