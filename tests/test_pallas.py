"""Fused Pallas field kernel: parity vs the XLA field (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from nerfsos_tpu.ops.pallas.fused_field import (
    _xla_reference,
    fused_field_apply,
    supports_fused,
)


@pytest.fixture(scope="module")
def small_cfg_net():
    cfg = NeRFConfig(netdepth=8, netwidth=32, netdepth_fine=8, netwidth_fine=32,
                     n_samples=4, n_importance=4, multires=10, multires_views=4,
                     use_semantics=True, sem_with_coord=True, ray_block=64)
    net = NeRFNet(cfg)
    return cfg, net, net.init(jax.random.PRNGKey(0))


def test_supports_fused_detection(small_cfg_net):
    cfg, _, _ = small_cfg_net
    assert supports_fused(cfg)
    assert not supports_fused(NeRFConfig(conv_embed=True))
    assert not supports_fused(NeRFConfig(use_semantics=True, sem_layer=4))
    assert not supports_fused(NeRFConfig(use_viewdirs=False))


def test_fused_matches_xla_field(small_cfg_net, key):
    cfg, net, params = small_cfg_net
    pts = jax.random.normal(key, (37, 5, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(1), (37, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ref = net.coarse.apply({"params": params["coarse"]}, pts, dirs)
    fused = fused_field_apply(params["coarse"], pts, dirs, cfg)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.array(fused), np.array(ref), atol=2e-5)


def test_fused_matches_without_semantics(key):
    cfg = NeRFConfig(netdepth=4, netwidth=32, n_samples=4, n_importance=0,
                     multires=6, multires_views=3, use_semantics=False)
    net = NeRFNet(cfg)
    params = net.init(key)
    pts = jax.random.normal(key, (20, 3, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (20, 3))
    ref = net.coarse.apply({"params": params["coarse"]}, pts, dirs)
    fused = fused_field_apply(params["coarse"], pts, dirs, cfg)
    np.testing.assert_allclose(np.array(fused), np.array(ref), atol=2e-5)


def test_fused_gradients_match_xla(small_cfg_net, key):
    """custom_vjp backward (XLA remat) must match grads of the plain field."""
    cfg, net, params = small_cfg_net
    pts = jax.random.normal(key, (16, 4, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(3), (16, 3))

    def loss_fused(p):
        return jnp.sum(fused_field_apply(p, pts, dirs, cfg) ** 2)

    def loss_xla(p):
        return jnp.sum(net.coarse.apply({"params": p}, pts, dirs) ** 2)

    g_f = jax.grad(loss_fused)(params["coarse"])
    g_x = jax.grad(loss_xla)(params["coarse"])
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_f)[0],
        jax.tree_util.tree_flatten_with_path(g_x)[0],
    ):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-3, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_pallas_backward_matches_xla_vjp(small_cfg_net, key):
    """The in-kernel reverse sweep (_fused_backward) vs jax.vjp of the XLA
    twin, ragged N (pad path) included."""
    from nerfsos_tpu.ops.pallas.fused_field import (
        _flatten_mlp_params, _fused_backward, _xla_bwd,
    )

    cfg, net, params = small_cfg_net
    ws, bs = _flatten_mlp_params(params["coarse"]["mlp"], cfg.netdepth, True)
    ws, bs = tuple(ws), tuple(bs)
    N = 77  # not a block multiple
    pts = jax.random.normal(key, (N, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(5), (N, 3))
    g = jax.random.normal(jax.random.PRNGKey(6), (N, 6))

    ref = _xla_bwd(cfg.netdepth, (4,), cfg.multires, cfg.multires_views,
                   True, True, (ws, bs, (pts, dirs)), g)
    got = _fused_backward(ws, bs, (pts, dirs), g, cfg.netdepth, (4,),
                          cfg.multires, cfg.multires_views, True, True,
                          "float32", block=32, interpret=True)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref)[0],
        jax.tree_util.tree_flatten_with_path(got)[0],
    ):
        # rtol 1e-3: PE frequencies up to 2^(multires-1)=512 amplify fp32
        # accumulation-order differences in the dpts chain rule
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-3, rtol=1e-3,
                                   err_msg=jax.tree_util.keystr(path))


def test_pallas_backward_input_grads_off(small_cfg_net, key):
    """input_grads=False (the production train setting: rays are data) must
    leave weight/bias grads identical and return exact zero input grads."""
    from nerfsos_tpu.ops.pallas.fused_field import (
        _flatten_mlp_params, _fused_backward,
    )

    cfg, net, params = small_cfg_net
    ws, bs = _flatten_mlp_params(params["coarse"]["mlp"], cfg.netdepth, True)
    ws, bs = tuple(ws), tuple(bs)
    N = 48
    pts = jax.random.normal(key, (N, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(9), (N, 3))
    g = jax.random.normal(jax.random.PRNGKey(10), (N, 6))
    full = _fused_backward(ws, bs, (pts, dirs), g, cfg.netdepth, (4,),
                           cfg.multires, cfg.multires_views, True, True,
                           "float32", block=48, interpret=True)
    lite = _fused_backward(ws, bs, (pts, dirs), g, cfg.netdepth, (4,),
                           cfg.multires, cfg.multires_views, True, True,
                           "float32", block=48, interpret=True, input_grads=False)
    for a, b in zip(jax.tree_util.tree_leaves(full[:2]),
                    jax.tree_util.tree_leaves(lite[:2])):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6)
    np.testing.assert_allclose(np.array(lite[2][0]), 0.0)
    np.testing.assert_allclose(np.array(lite[2][1]), 0.0)


def test_pallas_backward_no_semantics(key):
    from nerfsos_tpu.ops.pallas.fused_field import (
        _flatten_mlp_params, _fused_backward, _xla_bwd,
    )

    cfg = NeRFConfig(netdepth=4, netwidth=32, n_samples=4, n_importance=0,
                     multires=6, multires_views=3, use_semantics=False)
    net = NeRFNet(cfg)
    params = net.init(key)
    ws, bs = _flatten_mlp_params(params["coarse"]["mlp"], cfg.netdepth, False)
    ws, bs = tuple(ws), tuple(bs)
    pts = jax.random.normal(key, (40, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(7), (40, 3))
    g = jax.random.normal(jax.random.PRNGKey(8), (40, 4))
    ref = _xla_bwd(cfg.netdepth, (4,), cfg.multires, cfg.multires_views,
                   False, False, (ws, bs, (pts, dirs)), g)
    got = _fused_backward(ws, bs, (pts, dirs), g, cfg.netdepth, (4,),
                          cfg.multires, cfg.multires_views, False, False,
                          "float32", block=40, interpret=True)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-4, rtol=1e-4)


def test_fused_end_to_end_render_matches(small_cfg_net, key):
    cfg, net, params = small_cfg_net
    fused_net = NeRFNet(NeRFConfig(**{**vars(cfg), "fused_field": True}))
    rays = jax.random.normal(key, (2, 18, 3))
    a = net(params, rays, (1.0, 4.0), key=key, train=False)
    b = fused_net(params, rays, (1.0, 4.0), key=key, train=False)
    # The fused path (now the planar kernel) differs from XLA only by fp32
    # sum order — but a ~1e-7 coarse-weight difference can flip an
    # inverse-CDF bin on isolated rays, so those rays get genuinely
    # different fine samples (0.1%-level rgb shifts). Assert tight agreement
    # in bulk and bound the boundary-flip tail.
    for k, tail in (("rgb", 1e-3), ("semantics", 1e-3)):
        d = np.abs(np.array(a[k]) - np.array(b[k]))
        assert np.percentile(d, 90) < 1e-5, (k, np.percentile(d, 90))
        assert d.max() < tail, (k, d.max())
    np.testing.assert_allclose(np.array(a["depth"]), np.array(b["depth"]), atol=1e-3)


def test_xla_reference_twin_matches_field(small_cfg_net, key):
    """The backward's jnp twin must itself equal the flax field."""
    cfg, net, params = small_cfg_net
    from nerfsos_tpu.ops.pallas.fused_field import _flatten_mlp_params

    pts = jax.random.normal(key, (11, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(4), (11, 3))
    ws, bs = _flatten_mlp_params(params["coarse"]["mlp"], cfg.netdepth, True)
    ref = net.coarse.apply({"params": params["coarse"]}, pts[:, None, :], dirs)[:, 0]
    twin = _xla_reference(ws, bs, (pts, dirs), cfg.netdepth, (4,), cfg.multires,
                          cfg.multires_views, True, True)
    np.testing.assert_allclose(np.array(twin), np.array(ref), atol=2e-5)


def test_sigma_only_kernel_matches_full_field(small_cfg_net, key):
    """fused_sigma_apply == raw[..., 3:4] of the full fused field."""
    from nerfsos_tpu.ops.pallas.fused_field import fused_sigma_apply

    cfg, net, params = small_cfg_net
    pts = jax.random.normal(key, (37, 5, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(11), (37, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    full = fused_field_apply(params["coarse"], pts, dirs, cfg)
    sigma = fused_sigma_apply(params["coarse"], pts, cfg)
    assert sigma.shape == pts.shape[:-1] + (1,)
    np.testing.assert_allclose(np.array(sigma), np.array(full[..., 3:4]), atol=1e-6)


@pytest.mark.parametrize("fused", [True, False])
def test_coarse_outputs_false_fine_maps_bit_equal(small_cfg_net, fused):
    """Eval's density-only coarse pass must not change the fine outputs:
    same weights feed the same inverse-CDF, so rgb/disp/acc/semantics/z_std
    are bit-identical; only the '0'-suffixed coarse maps disappear."""
    cfg0, _, params = small_cfg_net
    import dataclasses

    cfg = dataclasses.replace(cfg0, fused_field=fused)
    net = NeRFNet(cfg)
    rays = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 3))
    full = net(params, rays, (1.0, 6.0), train=False)
    lean = net(params, rays, (1.0, 6.0), train=False, coarse_outputs=False)
    assert not any(k.endswith("0") for k in lean)
    assert any(k.endswith("0") for k in full)
    for k in ("rgb", "disp", "acc", "depth", "semantics", "z_std"):
        if fused:
            # fused path: eval and train renders use different RAY_BLOCK
            # sizes (adaptive vs bwd-VMEM-bound), so the per-ray segment-sum
            # dot accumulates in different K groupings — same math, ulp-level
            # wiggle allowed
            np.testing.assert_allclose(np.array(full[k]), np.array(lean[k]),
                                       rtol=2e-6, atol=1e-7, err_msg=k)
        else:
            np.testing.assert_array_equal(np.array(full[k]),
                                          np.array(lean[k]), err_msg=k)


def test_make_render_fn_defaults_to_lean_coarse(small_cfg_net):
    from nerfsos_tpu.engines.eval import make_render_fn

    cfg, net, params = small_cfg_net
    rays = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 3))
    out = make_render_fn(net, 1.0, 6.0)(params, rays)
    assert "rgb" in out and "rgb0" not in out
    out_full = make_render_fn(net, 1.0, 6.0, coarse_outputs=True)(params, rays)
    assert "rgb0" in out_full


# ---------------------------------------------------------------- planar


def test_planar_fwd_matches_xla_reference(key):
    """Planar (channel-major IO) fused field == the jnp twin, fp32."""
    from nerfsos_tpu.ops.pallas import fused_field as ff

    cfg = NeRFConfig(use_semantics=True, sem_with_coord=True,
                     compute_dtype="float32")
    net = NeRFNet(cfg)
    params = net.init(key)["coarse"]
    ws, bs = ff._flatten_mlp_params(params["mlp"], 8, True)
    ws, bs = tuple(ws), tuple(bs)
    ks = jax.random.split(key, 2)
    N = 300  # not a block multiple: exercises the planar pad/crop
    pts = jax.random.normal(ks[0], (N, 3))
    dirs = jax.random.normal(ks[1], (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    pd = jnp.concatenate([pts.T, dirs.T], 0)

    ref = ff._xla_reference(ws, bs, (pts, dirs), 8, (4,), 10, 4, True, True)
    out = ff.fused_field_apply_planar({"mlp": params["mlp"]}, pd, cfg)
    np.testing.assert_allclose(np.array(out).T, np.array(ref), atol=2e-5)

    sig = ff.fused_sigma_apply_planar({"mlp": params["mlp"]}, pts.T, cfg)
    np.testing.assert_allclose(np.array(sig), np.array(ref[:, 3]), atol=2e-5)


def test_planar_bwd_matches_xla_vjp(key):
    """Planar in-kernel backward dW/db == jax.vjp of the jnp twin, fp32."""
    from nerfsos_tpu.ops.pallas import fused_field as ff

    cfg = NeRFConfig(use_semantics=True, sem_with_coord=True,
                     compute_dtype="float32")
    net = NeRFNet(cfg)
    params = net.init(key)["coarse"]
    ws, bs = ff._flatten_mlp_params(params["mlp"], 8, True)
    ws, bs = tuple(ws), tuple(bs)
    ks = jax.random.split(key, 3)
    N = 260
    pts = jax.random.normal(ks[0], (N, 3))
    dirs = jax.random.normal(ks[1], (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    pd = jnp.concatenate([pts.T, dirs.T], 0)
    g = jax.random.normal(ks[2], (N, 6))

    def loss_pl(w, b):
        return jnp.sum(ff._fused_apply_pl(w, b, pd, 8, (4,), 10, 4, True,
                                          True, "float32", None) * g.T)

    def loss_ref(w, b):
        return jnp.sum(ff._xla_reference(w, b, (pts, dirs), 8, (4,), 10, 4,
                                         True, True) * g)

    gw_pl, gb_pl = jax.grad(loss_pl, argnums=(0, 1))(ws, bs)
    gw_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(ws, bs)
    for i, (a, b_) in enumerate(zip(gw_pl + gb_pl, gw_r + gb_r)):
        denom = np.abs(np.array(b_)).max() + 1e-8
        np.testing.assert_array_less(
            np.abs(np.array(a) - np.array(b_)).max() / denom, 2e-5,
            err_msg=f"grad {i}")


def test_planar_path_activates_and_matches_rowmajor_render(small_cfg_net, key):
    """With fused_field=True the render uses the planar path (channel-first
    composite); forcing field_input_grads=True falls back to row-major —
    outputs must agree."""
    cfg, net, params = small_cfg_net
    pl_net = NeRFNet(NeRFConfig(**{**vars(cfg), "fused_field": True}))
    rm_net = NeRFNet(NeRFConfig(**{**vars(cfg), "fused_field": True,
                                   "field_input_grads": True}))
    assert pl_net._planar_ok(jnp.zeros((4, 3)), False, False)
    assert not rm_net._planar_ok(jnp.zeros((4, 3)), False, False)
    rays = jax.random.normal(key, (2, 18, 3))
    a = pl_net(params, rays, (1.0, 4.0), key=key, train=False)
    b = rm_net(params, rays, (1.0, 4.0), key=key, train=False)
    # same bulk/tail split as test_fused_end_to_end_render_matches: isolated
    # inverse-CDF bin flips give single rays ~0.1% shifts
    for k in ("rgb", "semantics", "acc"):
        d = np.abs(np.array(a[k]) - np.array(b[k]))
        assert np.percentile(d, 90) < 1e-5, (k, np.percentile(d, 90))
        assert d.max() < 1e-3, (k, d.max())
