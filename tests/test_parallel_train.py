"""Data-parallel train-step tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfsos_tpu.engines.state import (
    TrainState,
    exp_decay_schedule,
    fast_forward_schedule,
    make_optimizer,
    semantic_head_mask,
)
from nerfsos_tpu.engines.trainer import make_rgb_train_step
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from nerfsos_tpu.parallel import mesh as pmesh


def _tiny_net(use_semantics=False):
    cfg = NeRFConfig(netwidth=32, netdepth=2, netwidth_fine=32, netdepth_fine=2,
                     n_samples=8, n_importance=8, multires=4, multires_views=2,
                     use_semantics=use_semantics, ray_block=4096)
    net = NeRFNet(cfg)
    return net, net.init(jax.random.PRNGKey(0))


def test_exp_decay_schedule_matches_reference():
    s = exp_decay_schedule(5e-4, 0.1, 250_000)
    np.testing.assert_allclose(float(s(0)), 5e-4)
    np.testing.assert_allclose(float(s(250_000)), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(float(s(125_000)), 5e-4 * 0.1**0.5, rtol=1e-6)


def test_fast_forward_schedule_resumes_decayed_lr():
    """Ingesting a torch ckpt keeps fresh Adam moments but must resume the LR
    schedule at global_step: a 150k-step flower finetune starts at
    5e-4 * 0.1^(150k/250k) ~= 1.26e-4, not 5e-4 (reference run_nerf.py:355)."""
    lrate, step0 = 5e-4, 150_000
    params = {"w": jnp.ones((4,))}
    for fix_backbone in (False, True):
        p = {"sem_0": {"kernel": jnp.ones((4,))}} if fix_backbone else params
        tx = make_optimizer(lrate, 0.1, 250_000, fix_backbone=fix_backbone, params=p)
        state = TrainState.create(p, tx)
        state = state.replace(opt_state=fast_forward_schedule(state.opt_state, step0))
        grads = jax.tree_util.tree_map(jnp.ones_like, p)
        new_state = state.apply_gradients(grads)
        # first Adam step with constant grads moves each param by ~lr
        delta = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a, b: a - b, p, new_state.params)
        )[0]
        expected = lrate * 0.1 ** (step0 / 250_000)
        np.testing.assert_allclose(np.array(delta), expected, rtol=1e-4)


def test_semantic_head_mask_marks_only_sem():
    net, params = _tiny_net(use_semantics=True)
    mask = semantic_head_mask(params)
    flat_m = jax.tree_util.tree_flatten_with_path(mask)[0]
    marked = {jax.tree_util.keystr(p): v for p, v in flat_m}
    assert any(("sem_0" in k) and v for k, v in marked.items())
    assert all(v is False for k, v in marked.items() if "pts_linears" in k or "rgb_linear" in k)


def test_fix_backbone_only_updates_sem_head():
    net, params = _tiny_net(use_semantics=True)
    tx = make_optimizer(1e-2, fix_backbone=True, params=params)
    state = TrainState.create(params, tx)
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 3))

    # Loss that produces gradient for BOTH backbone (rgb) and sem head.
    def loss_fn(p):
        out = net(p, rays, (1.0, 4.0), key=jax.random.PRNGKey(2), train=True)
        return (jnp.mean(out["rgb"] ** 2) + jnp.mean(out["semantics"] ** 2)
                + jnp.mean(out["semantics0"] ** 2))

    grads = jax.grad(loss_fn)(state.params)
    new_state = state.apply_gradients(grads)
    # backbone bit-identical despite nonzero grads, semantic head moved
    same = jax.tree_util.tree_map(lambda a, b: bool(jnp.all(a == b)),
                                  state.params, new_state.params)
    flat = {jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(same)[0]}
    assert all(v for k, v in flat.items() if "pts_linears" in k or "rgb_linear" in k)
    assert all(not v for k, v in flat.items() if "sem_" in k)
    # sanity: backbone grads really were nonzero (freeze did the work)
    gsum = sum(float(jnp.sum(jnp.abs(x)))
               for p, x in jax.tree_util.tree_flatten_with_path(grads)[0]
               if "pts_linears" in jax.tree_util.keystr(p))
    assert gsum > 0


def test_dp_train_step_runs_on_8_device_mesh():
    net, params = _tiny_net()
    m = pmesh.make_mesh(8)
    tx = make_optimizer(5e-4)
    state = TrainState.create(params, tx)
    state = jax.device_put(state, pmesh.replicated(m))
    step = make_rgb_train_step(net, 1.0, 4.0, mesh=m, donate=False)
    B = 64
    batch = {"rays": jax.random.normal(jax.random.PRNGKey(1), (2, B, 3)),
             "target": jnp.zeros((B, 3)), "masks": jnp.zeros((B, 1))}
    batch = {
        "rays": jax.device_put(batch["rays"], pmesh.data_sharding(m, 1, 3)),
        "target": jax.device_put(batch["target"], pmesh.data_sharding(m, 0, 2)),
        "masks": jax.device_put(batch["masks"], pmesh.data_sharding(m, 0, 2)),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))


def test_dp_matches_single_device_gradients():
    """Sharded step must produce the same update as the unsharded step."""
    net, params = _tiny_net()
    tx = make_optimizer(1e-2)
    B = 64
    batch = {"rays": jax.random.normal(jax.random.PRNGKey(1), (2, B, 3)),
             "target": jax.random.uniform(jax.random.PRNGKey(3), (B, 3)),
             "masks": jnp.zeros((B, 1))}
    key = jax.random.PRNGKey(2)

    s1 = TrainState.create(params, tx)
    step1 = make_rgb_train_step(net, 1.0, 4.0, donate=False)
    out1, m1 = step1(s1, batch, key)

    m = pmesh.make_mesh(8)
    s8 = jax.device_put(TrainState.create(params, tx), pmesh.replicated(m))
    step8 = make_rgb_train_step(net, 1.0, 4.0, mesh=m, donate=False)
    sb = {
        "rays": jax.device_put(batch["rays"], pmesh.data_sharding(m, 1, 3)),
        "target": jax.device_put(batch["target"], pmesh.data_sharding(m, 0, 2)),
        "masks": jax.device_put(batch["masks"], pmesh.data_sharding(m, 0, 2)),
    }
    out8, m8 = step8(s8, sb, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for (p1, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(out1.params)[0],
        jax.tree_util.tree_flatten_with_path(out8.params)[0],
    ):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-6,
                                   err_msg=jax.tree_util.keystr(p1))


def test_loss_decreases_over_steps():
    net, params = _tiny_net()
    tx = make_optimizer(5e-3)
    state = TrainState.create(params, tx)
    step = make_rgb_train_step(net, 1.0, 4.0, donate=False)
    key = jax.random.PRNGKey(0)
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 3))
    target = jnp.tile(jnp.array([[0.2, 0.5, 0.8]]), (128, 1))
    batch = {"rays": rays, "target": target}
    losses = []
    for _ in range(30):
        key, sk = jax.random.split(key)
        state, metrics = step(state, batch, sk)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_shard_map_rgb_matches_single_device_det():
    """shard_map DP (explicit collectives, shard-local Pallas) must match the
    single-device step at deterministic render settings (perturb=0)."""
    import dataclasses

    cfg = NeRFConfig(netwidth=32, netdepth=2, netwidth_fine=32, netdepth_fine=2,
                     n_samples=8, n_importance=8, multires=4, multires_views=2,
                     perturb=0.0, ray_block=4096)
    import optax

    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    # SGD: params diff == lr * grads diff (Adam's first step is ~sign(g) and
    # amplifies fp32 mean-association noise into a flaky comparison)
    tx = optax.sgd(1e-2)
    B = 64
    batch = {"rays": jax.random.normal(jax.random.PRNGKey(1), (2, B, 3)),
             "target": jax.random.uniform(jax.random.PRNGKey(3), (B, 3)),
             "masks": jnp.zeros((B, 1))}
    key = jax.random.PRNGKey(2)

    s1 = TrainState.create(params, tx)
    out1, m1 = make_rgb_train_step(net, 1.0, 4.0, donate=False)(s1, batch, key)

    m = pmesh.make_mesh(8)
    s8 = jax.device_put(TrainState.create(params, tx), pmesh.replicated(m))
    step8 = make_rgb_train_step(net, 1.0, 4.0, mesh=m, donate=False,
                                spmd="shard_map")
    sb = {
        "rays": jax.device_put(batch["rays"], pmesh.data_sharding(m, 1, 3)),
        "target": jax.device_put(batch["target"], pmesh.data_sharding(m, 0, 2)),
        "masks": jax.device_put(batch["masks"], pmesh.data_sharding(m, 0, 2)),
    }
    out8, m8 = step8(s8, sb, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["psnr"]), float(m8["psnr"]), rtol=1e-4)
    for (p1, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(out1.params)[0],
        jax.tree_util.tree_flatten_with_path(out8.params)[0],
    ):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-5,
                                   err_msg=jax.tree_util.keystr(p1))


def test_shard_map_sos_matches_gspmd_det():
    """Sharded SOS loss (all_gather negative mining, pmax depth filter,
    shard-local flash kernels) == the GSPMD step at deterministic settings."""
    from nerfsos_tpu.engines.sos import SOSConfig, make_sos_train_step
    from nerfsos_tpu.losses.correlation import CorrelationLoss, GeoCorrelationLoss
    from nerfsos_tpu.models import vit as vit_lib
    from nerfsos_tpu.models.extractor import VitExtractor

    B, P = 8, 16  # N=256 -> the flash geo path is ACTIVE (interpret mode)
    cfg = NeRFConfig(netwidth=32, netdepth=2, netwidth_fine=32, netdepth_fine=2,
                     n_samples=8, n_importance=8, multires=4, multires_views=2,
                     use_semantics=True, sem_with_coord=True, perturb=0.0,
                     ray_block=B * P * P)
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    ext = VitExtractor("dino_vits16")
    ext.vit = vit_lib.VisionTransformer(patch_size=16, embed_dim=32, depth=2,
                                        num_heads=2, mlp_ratio=2.0)
    dino_params = ext.init(jax.random.PRNGKey(1))
    sos_cfg = SOSConfig(batch_size=B, patch_size=P, patch_stride=2)
    app = CorrelationLoss.from_params([0.18, 1, 0.46, 1], use_sim_matrix=True)
    import optax

    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=True)
    tx = optax.sgd(1e-2)  # see the rgb test: clean gradient-parity signal
    N = B * P * P
    batch = {"rays": jax.random.normal(jax.random.PRNGKey(2), (2, N, 3)),
             "target": jax.random.uniform(jax.random.PRNGKey(4), (N, 3)),
             "masks": jnp.zeros((N, 1))}
    key = jax.random.PRNGKey(3)

    m = pmesh.make_mesh(8)
    sb = {
        "rays": jax.device_put(batch["rays"], pmesh.data_sharding(m, 1, 3)),
        "target": jax.device_put(batch["target"], pmesh.data_sharding(m, 0, 2)),
        "masks": jax.device_put(batch["masks"], pmesh.data_sharding(m, 0, 2)),
    }
    outs = {}
    for spmd in ("gspmd", "shard_map"):
        s = jax.device_put(TrainState.create(params, tx), pmesh.replicated(m))
        step = make_sos_train_step(net, ext, app, geo, sos_cfg, 1.0, 4.0,
                                   mesh=m, donate=False, spmd=spmd)
        outs[spmd] = step(s, dino_params, sb, key)

    (sa, ma), (sb_, mb) = outs["gspmd"], outs["shard_map"]
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-5)
    for k in ("img1", "corr0", "corr1", "geo_corr0", "geo_corr1"):
        np.testing.assert_allclose(float(ma[k]), float(mb[k]), rtol=1e-4,
                                   atol=1e-7, err_msg=k)
    for (p1, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(sa.params)[0],
        jax.tree_util.tree_flatten_with_path(sb_.params)[0],
    ):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-5,
                                   err_msg=jax.tree_util.keystr(p1))


def test_shard_map_eval_render_matches_unsharded():
    """make_render_fn(mesh=...) shards rays over devices; outputs must be
    bit-equal to the unsharded render (pure data parallel, padded edge rays
    cropped)."""
    from nerfsos_tpu.engines.eval import make_render_fn

    cfg = NeRFConfig(netwidth=32, netdepth=2, netwidth_fine=32, netdepth_fine=2,
                     n_samples=8, n_importance=8, multires=4, multires_views=2,
                     use_semantics=True, ray_block=4096)
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    H, W = 9, 13  # H*W = 117, NOT divisible by 8 -> exercises the padding
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 3))

    ref = make_render_fn(net, 1.0, 4.0)(params, rays)
    m = pmesh.make_mesh(8)
    got = make_render_fn(net, 1.0, 4.0, mesh=m)(params, rays)
    assert set(ref.keys()) == set(got.keys())
    for k in ref:
        # one-ulp differences allowed: XLA fuses the per-ray math differently
        # for the different block shapes
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(got[k]),
                                   rtol=2e-6, atol=1e-7, err_msg=k)


def test_shard_map_with_fused_planar_field_matches_single_device():
    """The PRODUCTION multi-chip path is shard_map + the fused (planar)
    Pallas field — exercise them together: per-shard interpret-mode kernels,
    explicit pmean grads, vs the single-device fused step."""
    import optax

    cfg = NeRFConfig(netwidth=32, netdepth=2, netwidth_fine=32, netdepth_fine=2,
                     n_samples=8, n_importance=8, multires=4, multires_views=2,
                     use_semantics=True, sem_with_coord=True, perturb=0.0,
                     ray_block=4096, fused_field=True)
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    tx = optax.sgd(1e-2)
    B = 64
    batch = {"rays": jax.random.normal(jax.random.PRNGKey(1), (2, B, 3)),
             "target": jax.random.uniform(jax.random.PRNGKey(3), (B, 3)),
             "masks": jnp.zeros((B, 1))}
    key = jax.random.PRNGKey(2)

    s1 = TrainState.create(params, tx)
    out1, m1 = make_rgb_train_step(net, 1.0, 4.0, donate=False)(s1, batch, key)

    m = pmesh.make_mesh(8)
    s8 = jax.device_put(TrainState.create(params, tx), pmesh.replicated(m))
    step8 = make_rgb_train_step(net, 1.0, 4.0, mesh=m, donate=False,
                                spmd="shard_map")
    sb = {
        "rays": jax.device_put(batch["rays"], pmesh.data_sharding(m, 1, 3)),
        "target": jax.device_put(batch["target"], pmesh.data_sharding(m, 0, 2)),
        "masks": jax.device_put(batch["masks"], pmesh.data_sharding(m, 0, 2)),
    }
    out8, m8 = step8(s8, sb, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for (p1, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(out1.params)[0],
        jax.tree_util.tree_flatten_with_path(out8.params)[0],
    ):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-5,
                                   err_msg=jax.tree_util.keystr(p1))


def test_shard_map_sos_fused_planar_flash_matches_single_device():
    """The FULL production multi-chip SOS program as ONE test: shard_map DP +
    the fused PLANAR field kernels (interpret mode) + the ACTIVE flash geo
    kernel (P*P=256, 128-tileable) + appearance correlation with all_gather
    negative mining — vs the single-device fused SOS step (VERDICT r2 #2).
    """
    import optax

    from nerfsos_tpu.engines.sos import SOSConfig, make_sos_train_step
    from nerfsos_tpu.losses.correlation import CorrelationLoss, GeoCorrelationLoss
    from nerfsos_tpu.models import vit as vit_lib
    from nerfsos_tpu.models.extractor import VitExtractor

    B, P = 8, 16  # P*P = 256 -> flash_supported, flash geo path ACTIVE
    cfg = NeRFConfig(netwidth=32, netdepth=2, netwidth_fine=32, netdepth_fine=2,
                     n_samples=8, n_importance=8, multires=4, multires_views=2,
                     use_semantics=True, sem_with_coord=True, perturb=0.0,
                     ray_block=B * P * P, fused_field=True)
    net = NeRFNet(cfg)
    assert net._planar_ok(jnp.zeros((1, 3)), False, False), \
        "config must route through the planar fused kernels"
    params = net.init(jax.random.PRNGKey(0))
    ext = VitExtractor("dino_vits16")
    ext.vit = vit_lib.VisionTransformer(patch_size=16, embed_dim=32, depth=2,
                                        num_heads=2, mlp_ratio=2.0)
    dino_params = ext.init(jax.random.PRNGKey(1))
    sos_cfg = SOSConfig(batch_size=B, patch_size=P, patch_stride=2)
    app = CorrelationLoss.from_params([0.18, 1, 0.46, 1], use_sim_matrix=True)
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=True)
    assert geo.use_flash and geo.pointwise and geo.zero_clamp, \
        "geo config must route through the flash kernel"
    tx = optax.sgd(1e-2)
    N = B * P * P
    batch = {"rays": jax.random.normal(jax.random.PRNGKey(2), (2, N, 3)),
             "target": jax.random.uniform(jax.random.PRNGKey(4), (N, 3)),
             "masks": jnp.zeros((N, 1))}
    key = jax.random.PRNGKey(3)

    s1 = TrainState.create(params, tx)
    step1 = make_sos_train_step(net, ext, app, geo, sos_cfg, 1.0, 4.0,
                                donate=False)
    out1, m1 = step1(s1, dino_params, batch, key)

    m = pmesh.make_mesh(8)
    s8 = jax.device_put(TrainState.create(params, tx), pmesh.replicated(m))
    step8 = make_sos_train_step(net, ext, app, geo, sos_cfg, 1.0, 4.0,
                                mesh=m, donate=False, spmd="shard_map")
    sb = {
        "rays": jax.device_put(batch["rays"], pmesh.data_sharding(m, 1, 3)),
        "target": jax.device_put(batch["target"], pmesh.data_sharding(m, 0, 2)),
        "masks": jax.device_put(batch["masks"], pmesh.data_sharding(m, 0, 2)),
    }
    out8, m8 = step8(s8, dino_params, sb, key)

    # loss at 5e-5: the pmean'd per-shard partial sums reassociate the fp32
    # reduction (measured delta 1.5e-5; the term tolerances below are looser)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=5e-5)
    for k in ("img1", "corr0", "corr1", "geo_corr0", "geo_corr1"):
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=1e-4,
                                   atol=1e-7, err_msg=k)
    for (p1, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(out1.params)[0],
        jax.tree_util.tree_flatten_with_path(out8.params)[0],
    ):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-5,
                                   err_msg=jax.tree_util.keystr(p1))
