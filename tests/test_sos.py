"""End-to-end SOS train-step tests (tiny shapes, CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfsos_tpu.engines.sos import SOSConfig, make_sos_train_step, online_seg_metrics, sos_loss_fn
from nerfsos_tpu.engines.state import TrainState, make_optimizer
from nerfsos_tpu.losses.correlation import CorrelationLoss, GeoCorrelationLoss
from nerfsos_tpu.models.extractor import VitExtractor
from nerfsos_tpu.models import vit as vit_lib
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from nerfsos_tpu.ops.kmeans import kmeans, segmap_cluster
from nerfsos_tpu.parallel import mesh as pmesh
from nerfsos_tpu.utils.metrics import binary_iou, seg_ari


B, P, STRIDE = 2, 8, 2


@pytest.fixture(scope="module")
def sos_setup():
    net_cfg = NeRFConfig(netwidth=32, netdepth=2, netwidth_fine=32, netdepth_fine=2,
                         n_samples=4, n_importance=4, multires=4, multires_views=2,
                         use_semantics=True, sem_with_coord=True, ray_block=B * P * P)
    net = NeRFNet(net_cfg)
    params = net.init(jax.random.PRNGKey(0))

    ext = VitExtractor("dino_vits16")
    ext.vit = vit_lib.VisionTransformer(patch_size=16, embed_dim=32, depth=2,
                                        num_heads=2, pos_embed_size=224)
    dino_params = ext.init(jax.random.PRNGKey(1))

    cfg = SOSConfig(batch_size=B, patch_size=P, patch_stride=STRIDE)
    app = CorrelationLoss.from_params([0.18, 1, 0.46, 1])
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1])
    return net, params, ext, dino_params, cfg, app, geo


def _batch(key):
    rays = jax.random.normal(key, (2, B * P * P, 3))
    target = jax.random.uniform(jax.random.PRNGKey(9), (B * P * P, 3))
    masks = (jax.random.uniform(jax.random.PRNGKey(10), (B * P * P, 1)) > 0.5).astype(jnp.int32)
    return {"rays": rays, "target": target, "masks": masks}


def test_sos_loss_terms_present_and_finite(sos_setup, key):
    net, params, ext, dino_params, cfg, app, geo = sos_setup
    loss, metrics = sos_loss_fn(net, ext, app, geo, cfg, params, dino_params,
                                _batch(key), key, 1.0, 4.0)
    for k in ["loss", "img0", "img1", "psnr", "corr0", "corr1",
              "geo_corr0", "geo_corr1", "contrast", "sem0", "sem1"]:
        assert k in metrics and np.isfinite(float(metrics[k])), k
    # corr terms actually contribute
    assert float(jnp.abs(metrics["corr0"])) > 0
    assert float(jnp.abs(metrics["geo_corr0"])) > 0


def test_sos_grads_finite_including_sem_head(sos_setup, key):
    net, params, ext, dino_params, cfg, app, geo = sos_setup
    grads = jax.grad(
        lambda p: sos_loss_fn(net, ext, app, geo, cfg, p, dino_params,
                              _batch(key), key, 1.0, 4.0)[0]
    )(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    assert all(bool(jnp.all(jnp.isfinite(v))) for _, v in flat)
    sem_g = sum(float(jnp.sum(jnp.abs(v))) for p, v in flat if "sem_" in jax.tree_util.keystr(p))
    assert sem_g > 0  # correlation losses train the semantic head


def test_dino_preprocessing_chain_matches_torch(rng):
    """resize->norm->resize->norm must match the reference bit-for-bit:
    trainer F.interpolate to P*stride + normalize_batch (trainer.py:104-106),
    then the extractor's F.interpolate to 224 + normalize (extractor.py:205-208).
    The DOUBLE ImageNet normalization is an upstream quirk, preserved."""
    import torch
    import torch.nn.functional as F

    from nerfsos_tpu.models.extractor import normalize_imagenet, resize_nearest_torch

    Bp, Pp, stride = 3, 16, 6
    x = rng.random((Bp, Pp, Pp, 3)).astype(np.float32)

    ours = resize_nearest_torch(jnp.array(x), Pp * stride, Pp * stride)
    ours = normalize_imagenet(ours)
    ours = resize_nearest_torch(ours, 224, 224)
    ours = np.array(normalize_imagenet(ours))

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    t = F.interpolate(t, (Pp * stride, Pp * stride))  # default mode: nearest
    t = (t - mean) / std
    t = F.interpolate(t, (224, 224))
    t = (t - mean) / std
    ref = t.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_use_contrast_grads_flow_through_vit(sos_setup, key):
    """With use_contrast on, gradients must flow through the (frozen) ViT into
    the rendered RGB and hence the NeRF params (reference trainer.py:169-170).
    Isolate the contrast term: rgb_w=0, correlation losses off. Needs B=3:
    with B=2 the min and max off-diagonal CLS similarity coincide and the
    contrast loss is the constant log(2) with an identically zero gradient."""
    net, params, ext, dino_params, _, app, geo = sos_setup
    B3 = 3
    net3 = NeRFNet(NeRFConfig(netwidth=32, netdepth=2, netwidth_fine=32,
                              netdepth_fine=2, n_samples=4, n_importance=4,
                              multires=4, multires_views=2, use_semantics=True,
                              sem_with_coord=True, ray_block=B3 * P * P))
    cfg = SOSConfig(batch_size=B3, patch_size=P, patch_stride=STRIDE,
                    rgb_w=0.0, use_correlation=False, use_geoCorr=False,
                    use_contrast=True, contrast_w=1.0)
    batch = {
        "rays": jax.random.normal(key, (2, B3 * P * P, 3)),
        "target": jax.random.uniform(jax.random.PRNGKey(9), (B3 * P * P, 3)),
        "masks": jnp.zeros((B3 * P * P, 1), jnp.int32),
    }
    grads = jax.grad(
        lambda p: sos_loss_fn(net3, ext, app, geo, cfg, p, dino_params,
                              batch, key, 1.0, 4.0)[0]
    )(params)
    total = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_sos_train_step_frozen_backbone(sos_setup, key):
    net, params, ext, dino_params, cfg, app, geo = sos_setup
    tx = make_optimizer(5e-4, fix_backbone=True, params=params)
    state = TrainState.create(params, tx)
    step = make_sos_train_step(net, ext, app, geo, cfg, 1.0, 4.0, donate=False)
    new_state, metrics = step(state, dino_params, _batch(key), key)
    assert int(new_state.step) == 1 and np.isfinite(float(metrics["loss"]))
    same = jax.tree_util.tree_map(lambda a, b: bool(jnp.all(a == b)), state.params, new_state.params)
    flat = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_flatten_with_path(same)[0]}
    assert all(v for k, v in flat.items() if "pts_linears" in k)
    assert any(not v for k, v in flat.items() if "sem_" in k)


def test_sos_step_on_8_device_mesh(sos_setup, key):
    net, params, ext, dino_params, cfg, app, geo = sos_setup
    m = pmesh.make_mesh(2)  # B=2 patches over 2 devices
    tx = make_optimizer(5e-4)
    state = jax.device_put(TrainState.create(params, tx), pmesh.replicated(m))
    dino_r = jax.device_put(dino_params, pmesh.replicated(m))
    step = make_sos_train_step(net, ext, app, geo, cfg, 1.0, 4.0, mesh=m, donate=False)
    batch = _batch(key)
    batch = {
        "rays": jax.device_put(batch["rays"], pmesh.data_sharding(m, 1, 3)),
        "target": jax.device_put(batch["target"], pmesh.data_sharding(m, 0, 2)),
        "masks": jax.device_put(batch["masks"], pmesh.data_sharding(m, 0, 2)),
    }
    new_state, metrics = step(state, dino_r, batch, key)
    assert np.isfinite(float(metrics["loss"]))


def test_online_seg_metrics(rng):
    sem = rng.normal(size=(B * P * P, 2)).astype(np.float32)
    masks = rng.integers(0, 2, (B * P * P, 1))
    out = online_seg_metrics(sem, masks, B, P, clus_no_sfm=True)
    for k in ["clus_ari", "clus_ari_fg", "sem_ari", "sem_ari_fg"]:
        assert k in out and np.isfinite(out[k])


def test_kmeans_separates_blobs(key):
    a = jax.random.normal(key, (50, 2)) * 0.1 + jnp.array([0.0, 0.0])
    b = jax.random.normal(jax.random.PRNGKey(5), (50, 2)) * 0.1 + jnp.array([5.0, 5.0])
    x = jnp.concatenate([a, b])
    labels, cents = kmeans(key, x, 2)
    l = np.array(labels)
    assert len(np.unique(l[:50])) == 1 and len(np.unique(l[50:])) == 1
    assert l[0] != l[50]


def test_segmap_cluster_shape(key):
    x = jax.random.normal(key, (6, 7, 2))
    out = segmap_cluster(x, 2, key)
    assert out.shape == (6, 7, 1)


def test_seg_metrics_numpy():
    gt = np.array([0, 0, 1, 1])
    pred = np.array([1, 1, 0, 0])  # perfect anti-correlation -> ARI 1
    assert seg_ari(gt, pred)["ari"] == 1.0
    assert binary_iou(pred, gt, adaptive=True) == 1.0
    assert binary_iou(pred, gt, adaptive=False) == 0.0


def test_weights_log_balances_classes():
    from nerfsos_tpu.utils.metrics import weights_log

    masks = np.array([0] * 90 + [1] * 10)
    w = weights_log(masks)
    assert w.shape == (2,) and w[1] > w[0]  # rare class weighted up
    np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-6)
