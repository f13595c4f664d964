"""Parity tests for the fully-fused eval render kernels (field + composite).

The fused path (ops/pallas/fused_render.py) must reproduce the composite-
outside render exactly (up to the doubling-scan's tree-order rounding): the
XLA path is itself torch-oracle-tested (tests/test_render_parity.py), so
agreement here chains to reference parity.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet


@pytest.fixture(scope="module")
def nets():
    cfg = NeRFConfig(netwidth=16, netdepth=5, netwidth_fine=16, netdepth_fine=5,
                     n_samples=8, n_importance=8, multires=4, multires_views=2,
                     use_semantics=True, sem_with_coord=True, ray_block=4096)
    xla = NeRFNet(cfg)
    fused = NeRFNet(dataclasses.replace(cfg, fused_field=True))
    params = xla.init(jax.random.PRNGKey(0))
    return xla, fused, params


def _rays(key, n):
    o, d = jax.random.normal(key, (2, n, 3))
    return jnp.stack([o, d])


def test_fused_eval_render_matches_xla(nets, key):
    """coarse_outputs=False routes the fused net through the single-kernel
    render; every returned map must match the XLA path."""
    xla, fused, params = nets
    rays = _rays(key, 20)  # 20 % RAY_BLOCK(8) != 0 -> exercises ray padding

    a = xla(params, rays, (1.0, 4.0), train=False, coarse_outputs=False)
    b = fused(params, rays, (1.0, 4.0), train=False, coarse_outputs=False)
    assert set(a.keys()) == set(b.keys())
    for k in a:
        # z_std: the kernel's doubling-scan coarse weights differ from the
        # sequential cumprod at ~1e-7, which can flip an inverse-CDF bin for
        # a u right at a boundary — the sample moves ~one bin (not a bug).
        tol = 5e-3 if k == "z_std" else 2e-5
        np.testing.assert_allclose(np.array(a[k]), np.array(b[k]), atol=tol,
                                   rtol=1e-5 if k != "z_std" else 1e-2,
                                   err_msg=k)


def test_fused_eval_render_white_bkgd(nets, key):
    xla, fused, params = nets
    cfgw = dataclasses.replace(xla.cfg, white_bkgd=True)
    xla_w = NeRFNet(cfgw)
    fused_w = NeRFNet(dataclasses.replace(cfgw, fused_field=True))
    rays = _rays(key, 16)
    a = xla_w(params, rays, (1.0, 4.0), train=False, coarse_outputs=False)
    b = fused_w(params, rays, (1.0, 4.0), train=False, coarse_outputs=False)
    for k in ("rgb", "semantics", "acc"):
        np.testing.assert_allclose(np.array(a[k]), np.array(b[k]), atol=2e-5,
                                   err_msg=k)


def test_fused_render_no_semantics(nets, key):
    _, _, _ = nets
    cfg = NeRFConfig(netwidth=16, netdepth=5, netwidth_fine=16, netdepth_fine=5,
                     n_samples=8, n_importance=8, multires=4, multires_views=2,
                     use_semantics=False, ray_block=4096)
    xla = NeRFNet(cfg)
    fused = NeRFNet(dataclasses.replace(cfg, fused_field=True))
    params = xla.init(jax.random.PRNGKey(3))
    rays = _rays(jax.random.PRNGKey(4), 8)
    a = xla(params, rays, (1.0, 4.0), train=False, coarse_outputs=False)
    b = fused(params, rays, (1.0, 4.0), train=False, coarse_outputs=False)
    assert "semantics" not in b
    for k in a:
        np.testing.assert_allclose(np.array(a[k]), np.array(b[k]), atol=2e-5,
                                   err_msg=k)


def test_fused_render_noise_falls_back(nets, key):
    """raw_noise_std != 0 must NOT take the fused (noise-free) path — the
    two nets agree only because both draw the same per-ray noise through the
    composite-outside route."""
    xla, fused, params = nets
    rays = _rays(key, 8)
    a = xla(params, rays, (1.0, 4.0), key=jax.random.PRNGKey(7), train=False,
            coarse_outputs=False, raw_noise_std=0.7)
    b = fused(params, rays, (1.0, 4.0), key=jax.random.PRNGKey(7), train=False,
              coarse_outputs=False, raw_noise_std=0.7)
    np.testing.assert_allclose(np.array(a["rgb"]), np.array(b["rgb"]),
                               atol=2e-5)


def test_seg_cumprod_matches_numpy():
    """The in-kernel segmented exclusive cumprod against numpy, directly."""
    from nerfsos_tpu.ops.pallas.fused_render import _seg_cumprod_excl, _seg_ids

    r_blk, s = 4, 12
    n = r_blk * s
    x = np.random.default_rng(0).uniform(0.9, 1.1, (1, n)).astype(np.float32)
    _, sid = _seg_ids(n, s)
    got = np.asarray(_seg_cumprod_excl(jnp.asarray(x), sid, s))
    seg = x.reshape(r_blk, s)
    want = np.ones_like(seg)
    want[:, 1:] = np.cumprod(seg[:, :-1], axis=1)
    np.testing.assert_allclose(got, want.reshape(1, n), rtol=1e-6)


# ---------------------------------------------------------------- train path


def test_fused_train_render_forward_matches_xla(nets, key):
    """coarse_outputs=True (the train render) through the fused train
    kernels: every map including the '0'-suffixed coarse set must match."""
    xla, fused, params = nets
    rays = _rays(key, 20)
    a = xla(params, rays, (1.0, 4.0), train=False)
    b = fused(params, rays, (1.0, 4.0), train=False)
    assert set(a.keys()) == set(b.keys())
    for k in a:
        tol = 5e-3 if k == "z_std" else 2e-5
        np.testing.assert_allclose(np.array(a[k]), np.array(b[k]), atol=tol,
                                   rtol=1e-5 if k != "z_std" else 1e-2,
                                   err_msg=k)


def test_fused_train_render_grads_match_xla(nets, key):
    """The fused backward (in-kernel composite cotangents + reverse sweep)
    against jax.grad of the XLA render, on a loss touching every output the
    trainers consume (rgb/rgb0/semantics/semantics0/depth/weights)."""
    xla, fused, params = nets
    rays = _rays(key, 16)
    tgt = jax.random.uniform(jax.random.PRNGKey(9), (16, 3))

    def loss(net, p):
        out = net(p, rays, (1.0, 4.0), train=False)
        return (jnp.mean((out["rgb"] - tgt) ** 2)
                + jnp.mean((out["rgb0"] - tgt) ** 2)
                + 0.3 * jnp.mean(out["semantics"] ** 2)
                + 0.2 * jnp.mean(out["semantics0"] ** 2)
                + 0.1 * jnp.mean(out["depth"])
                + 0.05 * jnp.mean(out["weights"] ** 2))

    ga = jax.grad(lambda p: loss(xla, p))(params)
    gb = jax.grad(lambda p: loss(fused, p))(params)
    for (path, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(ga)[0],
                                 jax.tree_util.tree_flatten_with_path(gb)[0]):
        denom = np.abs(np.array(a)).max() + 1e-9
        np.testing.assert_array_less(
            np.abs(np.array(a) - np.array(b)).max() / denom, 5e-5,
            err_msg=jax.tree_util.keystr(path))


def test_fused_train_render_noise_deterministic_and_distributed(nets, key):
    """In-kernel noise: same key -> bit-identical; distribution sanity via
    the weights' dispersion (the draws are hash-based, not jax.random)."""
    _, fused, params = nets
    rays = _rays(key, 24)
    a = fused(params, rays, (1.0, 4.0), key=jax.random.PRNGKey(5), train=True,
              raw_noise_std=1.0, perturb=0.0)
    b = fused(params, rays, (1.0, 4.0), key=jax.random.PRNGKey(5), train=True,
              raw_noise_std=1.0, perturb=0.0)
    np.testing.assert_array_equal(np.array(a["rgb"]), np.array(b["rgb"]))
    c = fused(params, rays, (1.0, 4.0), key=jax.random.PRNGKey(6), train=True,
              raw_noise_std=1.0, perturb=0.0)
    assert np.abs(np.array(a["rgb"]) - np.array(c["rgb"])).max() > 1e-6
    d = fused(params, rays, (1.0, 4.0), key=jax.random.PRNGKey(5), train=True,
              raw_noise_std=0.0, perturb=0.0)
    assert np.abs(np.array(a["rgb"]) - np.array(d["rgb"])).max() > 1e-6


def test_fused_train_grads_with_noise_finite(nets, key):
    _, fused, params = nets
    rays = _rays(key, 8)

    def loss(p):
        out = fused(p, rays, (1.0, 4.0), key=jax.random.PRNGKey(2), train=True,
                    raw_noise_std=0.5, perturb=0.0)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["rgb0"] ** 2)

    g = jax.grad(loss)(params)
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree_util.tree_leaves(g))


def test_seg_rev_cumsum_matches_numpy():
    from nerfsos_tpu.ops.pallas.fused_render import _seg_ids, _seg_rev_cumsum_excl

    r_blk, s = 4, 12
    n = r_blk * s
    x = np.random.default_rng(1).normal(size=(1, n)).astype(np.float32)
    _, sid = _seg_ids(n, s)
    got = np.asarray(_seg_rev_cumsum_excl(jnp.asarray(x), sid, s))
    seg = x.reshape(r_blk, s)
    want = np.zeros_like(seg)
    want[:, :-1] = np.cumsum(seg[:, ::-1], axis=1)[:, ::-1][:, 1:]
    np.testing.assert_allclose(got, want.reshape(1, n), rtol=1e-5, atol=1e-6)


def test_fused_rgb_loss_step_matches_ad_step(nets, key):
    """The 3x-FLOP loss-in-kernel RGB train step must produce the SAME
    gradients/metrics as value_and_grad over the fused render (identical
    kernels + seeds; the only difference is where the cotangent is formed).
    Checked with noise and perturb ACTIVE — the seed plumbing must line up."""
    import optax

    from nerfsos_tpu.engines.state import TrainState
    from nerfsos_tpu.engines.trainer import (
        _fused_rgb_value_and_grads,
        _supports_fused_rgb_loss,
        make_rgb_train_step,
        rgb_loss_fn,
    )

    _, fused, params = nets
    assert _supports_fused_rgb_loss(fused)
    B = 24
    batch = {"rays": _rays(key, B),
             "target": jax.random.uniform(jax.random.PRNGKey(3), (B, 3)),
             "masks": jnp.zeros((B, 1))}
    k = jax.random.PRNGKey(11)

    import dataclasses
    noisy = NeRFNet(dataclasses.replace(fused.cfg, raw_noise_std=0.6,
                                        perturb=1.0))
    ga, ma = _fused_rgb_value_and_grads(noisy, params, batch, k, 1.0, 4.0, 1.0)
    (_, mb), gb = jax.value_and_grad(
        lambda p: rgb_loss_fn(noisy, p, batch, k, 1.0, 4.0, 1.0),
        has_aux=True)(params)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-6)
    for (path, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(ga)[0],
                                 jax.tree_util.tree_flatten_with_path(gb)[0]):
        denom = np.abs(np.array(b)).max() + 1e-9
        np.testing.assert_array_less(
            np.abs(np.array(a) - np.array(b)).max() / denom, 1e-5,
            err_msg=jax.tree_util.keystr(path))

    # and the whole jitted step runs + decreases the loss
    tx = optax.sgd(1e-2)
    s = TrainState.create(params, tx)
    step = make_rgb_train_step(noisy, 1.0, 4.0, donate=False)
    s2, m2 = step(s, batch, k)
    assert np.isfinite(float(m2["loss"]))
    leaves_changed = any(
        np.abs(np.array(x) - np.array(y)).max() > 0
        for x, y in zip(jax.tree_util.tree_leaves(s.params),
                        jax.tree_util.tree_leaves(s2.params)))
    assert leaves_changed


def test_bcast_mode_split_matches_highest(nets, key):
    """The split-operand broadcast epilogue (_BCAST_MODE="split") must
    reproduce the HIGHEST-precision lowering. In interpret mode both are
    exact f32, so this checks the split/sum plumbing (row bookkeeping,
    dirs reassembly, extras routing); the on-chip BIT-equality claim is
    verified by tools/perf_bcast_split.py."""
    from nerfsos_tpu.ops.pallas import fused_render as fr

    xla, fused, params = nets
    rays = _rays(key, 20)
    outs = {}
    old = fr._BCAST_MODE
    try:
        for mode in ("highest", "split"):
            fr._BCAST_MODE = mode
            ev = fused(params, rays, (1.0, 4.0), train=False,
                       coarse_outputs=False)
            tr = fused(params, rays, (1.0, 4.0), train=True,
                       key=jax.random.PRNGKey(3))
            gt = jax.random.uniform(jax.random.PRNGKey(4), (20, 3))

            def loss(p):
                o = fused(p, rays, (1.0, 4.0), train=True,
                          key=jax.random.PRNGKey(3))
                return (jnp.mean((o["rgb"] - gt) ** 2)
                        + jnp.mean(o["semantics"] ** 2)
                        + jnp.mean(o["depth"]))

            grads = jax.grad(loss)(params)
            outs[mode] = (ev, tr, grads)
    finally:
        fr._BCAST_MODE = old
    for a, b in zip(jax.tree_util.tree_leaves(outs["highest"]),
                    jax.tree_util.tree_leaves(outs["split"])):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   atol=1e-6, rtol=1e-6)


def test_composite_mode_rows_matches_lanes(nets, key):
    """The row-major composite (_COMPOSITE_MODE="rows", [R_blk, S] blocks,
    rays on sublanes) against the round-3 lane-major segmented form, through
    eval render, the train path's grads, and the mip train VJP. Designed
    BIT-equal (same doubling tree per ray, same input bits — see
    fused_render._composite_rows); the on-chip claim is verified by
    tools/perf_composite_rows.py."""
    import dataclasses as _dc

    from nerfsos_tpu.models.mip import MipNeRFNet
    from nerfsos_tpu.ops.pallas import fused_render as fr

    xla, fused, params = nets
    rays = _rays(key, 20)
    mcfg = NeRFConfig(netwidth=16, netdepth=5, n_samples=8, n_importance=8,
                      multires=4, multires_views=2, ray_block=4096,
                      fused_field=True)
    mnet = MipNeRFNet(_dc.replace(mcfg, use_semantics=False))
    mparams = mnet.init(jax.random.PRNGKey(5))
    mo, md = jax.random.normal(jax.random.PRNGKey(6), (2, 12, 3))
    mr = jnp.stack([mo, md])

    outs = {}
    old = fr._COMPOSITE_MODE
    try:
        for mode in ("lanes", "rows"):
            fr._COMPOSITE_MODE = mode
            ev = fused(params, rays, (1.0, 4.0), train=False,
                       coarse_outputs=False)
            gt = jax.random.uniform(jax.random.PRNGKey(4), (20, 3))

            def loss(p):
                o = fused(p, rays, (1.0, 4.0), train=True,
                          key=jax.random.PRNGKey(3))
                return (jnp.mean((o["rgb"] - gt) ** 2)
                        + jnp.mean(o["semantics"] ** 2)
                        + jnp.mean(o["depth"]))

            grads = jax.grad(loss)(params)

            def mip_loss(p):
                o = mnet(p, mr, (1.0, 4.0), train=True,
                         key=jax.random.PRNGKey(8),
                         radii=jnp.full((12,), 0.002))
                return jnp.mean(o["rgb"] ** 2) + jnp.mean(o["depth"])

            mgrads = jax.grad(mip_loss)(mparams)
            outs[mode] = (ev, grads, mgrads)
    finally:
        fr._COMPOSITE_MODE = old
    for a, b in zip(jax.tree_util.tree_leaves(outs["lanes"]),
                    jax.tree_util.tree_leaves(outs["rows"])):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("bwd_mode",
                         ["recompute", "stream_h", "stream_semin",
                          "stream_semin_budget0", "default_blocks"])
def test_frozen_backbone_grads_match_full(nets, key, bwd_mode, monkeypatch):
    """The frozen-backbone backward (semantic-head-only sweep,
    _train_frozen_bwd_kernel) must produce BIT-identical sem-head grads to
    the full backward, exact zeros for every frozen leaf, and identical
    post-update params under the fix_backbone optimizer — with noise and
    perturb ACTIVE (its composite weights come from the forward's output
    residual, so the noise plumbing must line up). Both activation sources
    (trunk recompute / forward-stored h) must match bit-for-bit."""
    from nerfsos_tpu.engines.state import TrainState, make_optimizer, semantic_head_mask
    from nerfsos_tpu.ops.pallas import fused_render as fr

    exact = True
    noise_std = 0.7
    if bwd_mode == "stream_semin_budget0":
        # the residual-HBM budget forces the trace-time fallback to
        # "recompute" (_frozen_stream_mode) — still bit-identical
        monkeypatch.setattr(fr, "_FROZEN_BWD_MODE", "stream_semin")
        monkeypatch.setattr(fr, "_FROZEN_STREAM_MAX_BYTES", 0)
        monkeypatch.setattr(fr, "TRAIN_RAY_BLOCK", 8)
    elif bwd_mode == "default_blocks":
        # shipping partitions: frozen steps run _FROZEN_RAY_BLOCK=16 while
        # the full backward keeps the r3 target — the f32 dW accumulation
        # order differs across partitions, so compare at tolerance (noise
        # off: the per-(block, lane) noise seeds would otherwise draw
        # different iid values entirely)
        exact = False
        noise_std = 0.0
    else:
        monkeypatch.setattr(fr, "_FROZEN_BWD_MODE", bwd_mode)
        # bit-equality needs ONE block partition for both paths (see
        # default_blocks above for the shipping-partition tolerance case)
        monkeypatch.setattr(fr, "TRAIN_RAY_BLOCK", 8)
    _, fused, params = nets
    frozen_net = NeRFNet(dataclasses.replace(fused.cfg, frozen_backbone=True))
    rays = _rays(key, 20)  # 20 % block != 0: exercises the bwd's pad masking
    tgt = jax.random.uniform(jax.random.PRNGKey(9), (20, 3))
    k = jax.random.PRNGKey(7)

    def loss(net, p):
        # SOS-shaped loss: rgb MSE (zero sem-head dependence) + both
        # semantic heads (the correlation losses' inputs)
        out = net(p, rays, (1.0, 4.0), key=k, train=False,
                  raw_noise_std=noise_std, perturb=1.0)
        return (jnp.mean((out["rgb"] - tgt) ** 2)
                + 0.3 * jnp.mean(out["semantics"] ** 2)
                + 0.2 * jnp.mean(out["semantics0"] ** 2))

    g_full = jax.grad(lambda p: loss(fused, p))(params)

    head = semantic_head_mask(params)

    def frozen_loss(p):
        p2 = jax.tree_util.tree_map(
            lambda x, m: x if m else jax.lax.stop_gradient(x), p, head)
        return loss(frozen_net, p2)

    g_frozen = jax.grad(frozen_loss)(params)

    for (path, m), a, b in zip(
            jax.tree_util.tree_flatten_with_path(head)[0],
            jax.tree_util.tree_leaves(g_full),
            jax.tree_util.tree_leaves(g_frozen)):
        name = jax.tree_util.keystr(path)
        if m:  # sem head: identical to the full backward (bit-identical at
            # a pinned common partition; f32-accumulation-order level at the
            # shipping partitions)
            if exact:
                np.testing.assert_array_equal(np.array(a), np.array(b),
                                              err_msg=name)
            else:
                np.testing.assert_allclose(np.array(a), np.array(b),
                                           rtol=2e-5, atol=1e-7, err_msg=name)
        else:  # frozen: exact zeros
            assert np.all(np.array(b) == 0.0), name

    # post-update params identical (multi_transform zeroes frozen updates)
    tx = make_optimizer(1e-2, fix_backbone=True, params=params)
    s_full = TrainState.create(params, tx).apply_gradients(g_full)
    s_frozen = TrainState.create(params, tx).apply_gradients(g_frozen)
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_frozen.params)):
        if exact:
            np.testing.assert_array_equal(np.array(a), np.array(b))
        else:
            np.testing.assert_allclose(np.array(a), np.array(b),
                                       rtol=1e-5, atol=1e-7)
