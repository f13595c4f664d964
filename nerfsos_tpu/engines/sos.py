"""NeRF-SOS patch-finetuning train step (the flagship path).

TPU-native rewrite of the reference train step (``engines/trainer.py:32-213``
in VITA-Group/NeRF-SOS): render patches, run the frozen DINO ViT on the
rendered RGB, assemble RGB + appearance-correlation + geometry-correlation
(+ optional contrastive) losses, Adam step — ALL inside one jitted program.

Parity notes (SURVEY.md §7.4):
- the semantic CE loss is dead code upstream (``sem_loss0/1`` constant zero,
  reference ``:123, 205``) — segmentation trains ONLY via correlation losses;
- the DINO input is nearest-resized to (patch_size * patch_stride)^2 first
  (reference ``:104``, default interpolate mode), then ImageNet-normalized
  (``normalize_batch``, reference ``:106``), then the extractor resizes to
  224^2 and normalizes AGAIN (``models/extractor.py:205-208``) — the double
  normalization is an upstream quirk the published checkpoints were trained
  with; preserved exactly;
- gradients flow through the frozen ViT into the rendered RGB only when
  ``use_contrast`` is on (the correlation losses' fd is no-grad and negative
  mining is argmin, so the DINO backward is pure overhead otherwise —
  reference ``:169-170`` lets input grads flow, weights stay frozen);
- both correlation losses are applied to BOTH coarse ('0') and fine heads;
- the geometry loss consumes the FINE depth for both calls (reference
  ``:159-160``);
- the de-facto invariant SOS mode = patch_tune ∧ use_dino ∧ use_correlation ∧
  use_geoCorr is made explicit here (the reference crashes otherwise).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerfsos_tpu.engines.state import TrainState
from nerfsos_tpu.losses.correlation import (
    CorrelationLoss,
    GeoCorrelationLoss,
    get_similarity_matrix,
    nerf_contrastive,
)
from nerfsos_tpu.losses.photometric import img2mse, mse2psnr
from nerfsos_tpu.models.extractor import (
    VitExtractor,
    normalize_imagenet,
    resize_nearest_torch,
)
from nerfsos_tpu.models.nerf import NeRFNet


@dataclasses.dataclass(frozen=True)
class SOSConfig:
    """SOS loss/pipeline flags (reference ``run_nerf.py`` SOS flag group)."""

    batch_size: int = 8
    patch_size: int = 64
    patch_stride: int = 6
    rgb_w: float = 1.0
    correlation_w: float = 1.0
    Gcorrelation_w: float = 0.01
    contrast_w: float = 0.0
    use_dino: bool = True
    use_correlation: bool = True
    use_geoCorr: bool = True
    use_contrast: bool = False
    # Frozen-backbone finetune (reference ``run_nerf.py:307-318``: every param
    # except ``semantic_linear`` gets requires_grad=False, so torch autograd
    # NEVER BUILDS the trunk backward). Here: the frozen param subtree is
    # stop_gradient'ed inside the loss, so XLA's AD prunes the trunk reverse
    # sweep the same way (grads for frozen leaves are structural zeros; the
    # optimizer's multi_transform mask made their updates zero regardless, so
    # post-update params are bit-identical). The FUSED kernel path needs the
    # companion ``NeRFConfig.frozen_backbone`` flag to skip its opaque
    # full-trunk VJP (custom_vjp is invisible to XLA's pruning).
    fix_backbone: bool = False


def _to_patches(x: jnp.ndarray, B: int, P: int) -> jnp.ndarray:
    """[B*P*P, C] -> [B, C, P, P] (the losses' NCHW layout)."""
    return x.reshape(B, P, P, -1).transpose(0, 3, 1, 2)


def _rows(x: jnp.ndarray, offset: jnp.ndarray, n: int) -> jnp.ndarray:
    """Dynamic row-slice [offset : offset+n] along axis 0."""
    return jax.lax.dynamic_slice_in_dim(x, offset, n, axis=0)


def sos_loss_fn(
    net: NeRFNet,
    extractor: VitExtractor,
    app_loss: CorrelationLoss,
    geo_loss: GeoCorrelationLoss,
    cfg: SOSConfig,
    params: Any,
    dino_params: Any,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    near: float,
    far: float,
    axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The SOS loss — ONE body for both SPMD regimes, parameterized on the
    shard axis (the ``_gmean(axis)`` pattern of losses/correlation.py).

    ``axis=None`` (GSPMD / single device): the batch dim is program-global,
    every collective below degenerates to the identity and the RNG streams
    are exactly the reference single-program draws.

    ``axis="data"`` (shard_map): the batch axis is sharded — each shard
    renders + DINO-encodes its local patches (all Pallas kernels shard-local)
    and the cross-patch pieces ride explicit collectives:

      - CLS similarity / negative mining: ``all_gather`` of the (tiny) local
        CLS vectors -> global [B, B] sim matrix, global argmin;
      - negative patches for the correlation losses: ``all_gather`` of the
        code/feature/point tensors (a few MB), rows picked by the local slice
        of the global negative index;
      - the geometry depth filter's batch-max: ``pmax``;
      - the contrast term is computed identically on every shard from the
        gathered CLS (its all_gather cotangents psum back to the owners).

    The sampled correlation coordinates are drawn at GLOBAL shape from the
    shared key and row-sliced, so at deterministic render settings
    (perturb=0, raw_noise_std=0) the sharded loss matches the GSPMD path
    exactly; with stochastic rendering the per-shard render key is folded
    with the shard index (different but equally valid draws).
    Mean semantics: every term is a per-shard mean whose ``pmean`` equals the
    global mean (equal shard sizes).
    """
    if cfg.fix_backbone:
        # Reference parity (run_nerf.py:307-318): requires_grad=False on all
        # but semantic_linear means torch never builds the trunk backward.
        # stop_gradient on the frozen subtree hands XLA's AD the same pruning
        # (frozen-leaf grads become structural zeros — which is what the
        # optimizer's multi_transform mask turned them into anyway).
        from nerfsos_tpu.engines.state import semantic_head_mask

        head = semantic_head_mask(params)
        params = jax.tree_util.tree_map(
            lambda p, m: p if m else jax.lax.stop_gradient(p), params, head)
        # The fused train kernels' custom VJP is OPAQUE to that pruning —
        # swap in the frozen-cfg twin so its backward runs the semantic-
        # head-only sweep (fused_render._train_frozen_bwd_kernel) instead of
        # the full trunk reverse (same forward, bit-identical sem grads).
        if net.cfg.fused_field and net.cfg.use_semantics and \
                not net.cfg.frozen_backbone:
            net = NeRFNet(dataclasses.replace(net.cfg, frozen_backbone=True))

    B, Psz = cfg.batch_size, cfg.patch_size
    if axis is None:
        shard, Bl, row0 = 0, B, 0
        take = lambda x: x          # local rows of a global-shape draw
        _ag = lambda x: x           # all_gather over the shard axis
    else:
        n_shards = jax.lax.axis_size(axis)
        shard = jax.lax.axis_index(axis)
        Bl = B // n_shards
        row0 = shard * Bl
        take = lambda x: _rows(x, row0, Bl)
        _ag = lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True)
    k_render, k_app0, k_app1, k_geo0, k_geo1 = jax.random.split(key, 5)
    if axis is not None:
        k_render = jax.random.fold_in(k_render, shard)

    out = net(params, batch["rays"], (near, far), key=k_render, train=True)

    gt = batch["target"]  # local [Bl*P*P, 3]
    img_loss = img2mse(out["rgb"], gt)
    img_loss0 = img2mse(out["rgb0"], gt)
    loss = cfg.rgb_w * (img_loss + img_loss0)
    metrics = {
        "img1": img_loss, "img0": img_loss0,
        "psnr": mse2psnr(img_loss), "psnr0": mse2psnr(img_loss0),
        "sem0": jnp.zeros(()), "sem1": jnp.zeros(()),
    }
    zero = jnp.zeros(())
    metrics.update(corr0=zero, corr1=zero, geo_corr0=zero, geo_corr1=zero, contrast=zero)

    if cfg.use_dino:
        rgb_patches = out["rgb"].reshape(Bl, Psz, Psz, 3)
        if not cfg.use_contrast:
            # Only the contrast loss can backprop through the ViT (fd is
            # no-grad, negative mining is argmin); cut the DINO backward
            # entirely when it's off. Reference keeps input grads live
            # (trainer :169-170) — matched when use_contrast is set.
            rgb_patches = jax.lax.stop_gradient(rgb_patches)
        # two-step resize+normalize chain, preserved exactly:
        #   nearest P -> P*stride (trainer :104), ImageNet norm (trainer :106),
        #   nearest -> 224 + ImageNet norm again (inside the extractor).
        dino_in = resize_nearest_torch(
            rgb_patches, Psz * cfg.patch_stride, Psz * cfg.patch_stride,
        )
        dino_in = normalize_imagenet(dino_in)
        dino = extractor.get_vit_attn_feat(dino_in, params=dino_params)
        feat_tokens = dino["feat"]  # [Bl, N, C]
        side = int(feat_tokens.shape[1] ** 0.5)
        feat = feat_tokens.reshape(Bl, side, side, -1).transpose(0, 3, 1, 2)

        cls_all = _ag(dino["cls_"])
        sim_matrix = get_similarity_matrix(cls_all)  # [B, B] (trainer :125)

        def app_single(k, feat_l, code_l, feat_g, code_g):
            k_c1, k_c2, k_neg = jax.random.split(k, 3)
            F = app_loss.feature_samples
            coords1 = take(jax.random.uniform(k_c1, (B, F, F, 2)) * 2.0 - 1.0)
            coords2 = take(jax.random.uniform(k_c2, (B, F, F, 2)) * 2.0 - 1.0)
            feats = app_loss.sample(feat_l, coords1)
            code = app_loss.sample(code_l, coords1)
            neg_idx = take(app_loss.negative_index(k_neg, B, sim_matrix))
            neg_feats = app_loss.sample(feat_g[neg_idx], coords2)
            neg_code = app_loss.sample(code_g[neg_idx], coords2)
            return (app_loss.neg_weight * app_loss.helper_mean(
                        feats, neg_feats, code, neg_code, app_loss.neg_shift,
                        axis=axis)
                    + app_loss.self_weight * app_loss.helper_mean(
                        feats, feats, code, code, app_loss.self_shift,
                        axis=axis))

        def geo_single(k, pts_l, code_l, pts_g, code_g):
            neg_idx = take(geo_loss.negative_index(k, B, sim_matrix))
            neg_pts, neg_code = pts_g[neg_idx], code_g[neg_idx]
            return (geo_loss.neg_weight * geo_loss.helper_mean(
                        pts_l, neg_pts, code_l, neg_code, geo_loss.neg_shift,
                        axis=axis)
                    + geo_loss.self_weight * geo_loss.helper_mean(
                        pts_l, pts_l, code_l, code_l, geo_loss.self_shift,
                        axis=axis))

        if cfg.use_correlation or cfg.use_geoCorr:
            sem0 = _to_patches(out["semantics0"], Bl, Psz)
            sem = _to_patches(out["semantics"], Bl, Psz)
            sem0_g = _ag(sem0)
            sem_g = _ag(sem)

        def app_pair(k0, k1, feat_l, code0_l, code1_l, feat_g,
                     code0_g, code1_g):
            """Both heads' appearance losses, all four helper evaluations
            batched (CorrelationLoss.pair_heads with shard-local sampling;
            coordinate draws at GLOBAL shape from the shared keys, exact
            per-call RNG streams)."""
            F = app_loss.feature_samples
            k1a, k2a, kn0 = jax.random.split(k0, 3)
            k1b, k2b, _ = jax.random.split(k1, 3)
            c1a, c1b, c2a, c2b = (
                take(jax.random.uniform(k, (B, F, F, 2)) * 2.0 - 1.0)
                for k in (k1a, k1b, k2a, k2b))
            neg_idx = take(app_loss.negative_index(kn0, B, sim_matrix))
            featn = feat_g[neg_idx]
            coords = jnp.concatenate([c1a, c1b, c2a, c2b])
            fs = app_loss.sample(
                jnp.concatenate([feat_l, feat_l, featn, featn]), coords)
            cs = app_loss.sample(
                jnp.concatenate([code0_l, code1_l, code0_g[neg_idx],
                                 code1_g[neg_idx]]), coords)
            fa, fb, nfa, nfb = jnp.split(fs, 4)
            ca, cb, nca, ncb = jnp.split(cs, 4)
            m = app_loss._helper_means_grouped(
                jnp.concatenate([fa, fb, fa, fb]),
                jnp.concatenate([fa, fb, nfa, nfb]),
                jnp.concatenate([ca, cb, ca, cb]),
                jnp.concatenate([ca, cb, nca, ncb]),
                (app_loss.self_shift, app_loss.self_shift,
                 app_loss.neg_shift, app_loss.neg_shift), axis=axis)
            return (app_loss.neg_weight * m[2] + app_loss.self_weight * m[0],
                    app_loss.neg_weight * m[3] + app_loss.self_weight * m[1])

        if cfg.use_correlation:
            feat_g = _ag(feat)
            if app_loss.rand_neg:
                # key-dependent negative permutations: independent draws
                a0 = app_single(k_app0, feat, sem0, feat_g, sem0_g)
                a1 = app_single(k_app1, feat, sem, feat_g, sem_g)
            else:
                a0, a1 = app_pair(k_app0, k_app1, feat, sem0, sem,
                                  feat_g, sem0_g, sem_g)
            corr0 = cfg.correlation_w * a0
            corr1 = cfg.correlation_w * a1
            loss = loss + corr0 + corr1
            metrics.update(corr0=corr0, corr1=corr1)

        if cfg.use_geoCorr:
            depth = _to_patches(out["depth"], Bl, Psz)  # FINE depth for both (:159-160)
            ray_o = _to_patches(batch["rays"][0], Bl, Psz)
            ray_d = _to_patches(batch["rays"][1], Bl, Psz)
            # depth filter with the BATCH-GLOBAL max-under (reference :455).
            # The filtered points only feed fd, which is no-grad (depth gets
            # exactly zero cotangent on every path — tested); stop_gradient
            # makes that explicit AND keeps the pmax collective on a constant
            # subgraph (pmax has no differentiation rule).
            maxd = geo_loss.max_depth
            depth_ng = jax.lax.stop_gradient(depth)
            under = jnp.where(depth_ng < maxd, depth_ng, -jnp.inf)
            max_under = jnp.max(under)
            if axis is not None:
                max_under = jax.lax.pmax(max_under, axis)
            depth_f = jnp.where(depth_ng > maxd, max_under, depth_ng)
            pts = geo_loss.depth2pts(depth_f, ray_o, ray_d)
            pts_g = _ag(pts)
            if geo_loss.rand_neg:
                # key-dependent negative permutations: keep independent draws
                g0 = cfg.Gcorrelation_w * geo_single(k_geo0, pts, sem0, pts_g, sem0_g)
                g1 = cfg.Gcorrelation_w * geo_single(k_geo1, pts, sem, pts_g, sem_g)
            else:
                # sim-matrix argmin negatives are key-independent — all four
                # geometry sweeps (neg/self x coarse/fine heads) ride one
                # kernel group (see GeoCorrelationLoss.quad)
                neg_idx = take(geo_loss.negative_index(k_geo0, B, sim_matrix))
                n0, n1, s0, s1 = geo_loss.quad(
                    pts, pts_g[neg_idx], sem0, sem0_g[neg_idx],
                    sem, sem_g[neg_idx], axis=axis)
                g0 = cfg.Gcorrelation_w * (geo_loss.neg_weight * n0
                                           + geo_loss.self_weight * s0)
                g1 = cfg.Gcorrelation_w * (geo_loss.neg_weight * n1
                                           + geo_loss.self_weight * s1)
            loss = loss + g0 + g1
            metrics.update(geo_corr0=g0, geo_corr1=g1)

        if cfg.use_contrast:
            c = cfg.contrast_w * nerf_contrastive(cls_all)
            loss = loss + c
            metrics.update(contrast=c)

    metrics["loss"] = loss
    return loss, metrics


def sos_loss_fn_sharded(*args, axis: str = "data", **kwargs):
    """Back-compat alias: ``sos_loss_fn`` with the shard axis bound."""
    return sos_loss_fn(*args, **kwargs, axis=axis)


def make_sos_train_step(
    net: NeRFNet,
    extractor: VitExtractor,
    app_loss: CorrelationLoss,
    geo_loss: GeoCorrelationLoss,
    cfg: SOSConfig,
    near: float,
    far: float,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    spmd: str = "gspmd",
):
    """Build the jitted SOS train step.

    Batch contract (from ``data.datasets.PatchDataset.sample_batch``):
    ``rays [2, B*P*P, 3]``, ``target [B*P*P, 3]``. DINO params ride in the
    state-free argument ``dino_params`` (frozen; never updated).

    ``spmd``: ``"gspmd"`` (jit shardings, XLA partitions — but Pallas custom
    calls cannot be partitioned on real multi-chip) or ``"shard_map"``
    (per-shard compute via ``sos_loss_fn_sharded`` with explicit collectives;
    every Pallas kernel runs shard-local). See make_rgb_train_step.
    """

    if mesh is not None and spmd == "shard_map":
        if cfg.batch_size % mesh.size != 0:
            raise ValueError(f"batch_size {cfg.batch_size} not divisible by "
                             f"mesh size {mesh.size}")
        batch_specs = {"rays": P(None, "data"), "target": P("data"),
                       "masks": P("data")}

        def local_grads(params, dino_params, batch, key):
            (_, metrics), grads = jax.value_and_grad(
                lambda p: sos_loss_fn(net, extractor, app_loss,
                                      geo_loss, cfg, p, dino_params,
                                      batch, key, near, far, axis="data"),
                has_aux=True,
            )(params)
            # check_vma=False -> classic shard_map AD (see trainer.py):
            # per-shard cotangents, explicit pmean = global-mean gradient.
            grads = jax.lax.pmean(grads, "data")
            metrics = jax.lax.pmean(metrics, "data")
            metrics["psnr"] = mse2psnr(metrics["img1"])
            metrics["psnr0"] = mse2psnr(metrics["img0"])
            return grads, metrics

        sm = jax.shard_map(local_grads, mesh=mesh,
                           in_specs=(P(), P(), batch_specs, P()),
                           out_specs=(P(), P()),
                           # pallas_call outputs carry no vma metadata
                           # on this jax version; skip the check
                           check_vma=False)

        def sm_step(state: TrainState, dino_params: Any, batch, key):
            grads, metrics = sm(state.params, dino_params, batch, key)
            return state.apply_gradients(grads), metrics

        rep = NamedSharding(mesh, P())
        kwargs: Dict[str, Any] = {"donate_argnums": (0,)} if donate else {}
        kwargs["in_shardings"] = (
            rep, rep,
            {k: NamedSharding(mesh, v) for k, v in batch_specs.items()},
            rep,
        )
        kwargs["out_shardings"] = (rep, rep)
        return jax.jit(sm_step, **kwargs)

    def step(state: TrainState, dino_params: Any, batch: Dict[str, jnp.ndarray], key: jax.Array):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: sos_loss_fn(net, extractor, app_loss, geo_loss, cfg, p,
                                  dino_params, batch, key, near, far),
            has_aux=True,
        )(state.params)
        return state.apply_gradients(grads), metrics

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        rep = NamedSharding(mesh, P())
        data1 = NamedSharding(mesh, P("data"))
        kwargs["in_shardings"] = (
            rep,
            rep,
            {"rays": NamedSharding(mesh, P(None, "data")), "target": data1,
             "masks": data1},
            rep,
        )
        kwargs["out_shardings"] = (rep, rep)
    return jax.jit(step, **kwargs)


def online_seg_metrics(semantics: Any, masks: Any, batch_size: int, patch_size: int,
                       n_cluster: int = 2, clus_no_sfm: bool = False) -> Dict[str, float]:
    """Periodic ARI logging (host-side; reference ``engines/trainer.py:174-198``).

    Args: semantics [B*P*P, sem_dim] (device or numpy), masks [B*P*P, 1].
    """
    import numpy as np

    from nerfsos_tpu.ops.kmeans import kmeans
    from nerfsos_tpu.utils.metrics import adjusted_rand_score

    sem = np.asarray(semantics).reshape(batch_size, patch_size, patch_size, -1)
    if clus_no_sfm:
        prob = sem
        sft = _np_softmax(sem)
    else:
        prob = _np_softmax(sem)
        sft = prob
    sem_pred_sft = np.argmax(sft, -1)[..., None]

    # one vmapped in-graph k-means over the batch instead of the reference's
    # per-patch sklearn loop (its engines/trainer.py:183-186, a device->host
    # sync each print step); labels are arbitrary either way (ARI).
    labels = _batched_kmeans(jnp.asarray(prob).reshape(batch_size, -1, prob.shape[-1]),
                             n_cluster)
    sem_pred_clus = np.asarray(labels).reshape(batch_size, patch_size, patch_size, 1)

    sem_gt = np.asarray(masks).reshape(batch_size, patch_size, patch_size, 1)
    fg = sem_gt == 1
    return {
        "clus_ari": adjusted_rand_score(sem_gt.reshape(-1), sem_pred_clus.reshape(-1)),
        "clus_ari_fg": adjusted_rand_score(sem_gt[fg].reshape(-1), sem_pred_clus[fg].reshape(-1)),
        "sem_ari": adjusted_rand_score(sem_gt.reshape(-1), sem_pred_sft.reshape(-1)),
        "sem_ari_fg": adjusted_rand_score(sem_gt[fg].reshape(-1), sem_pred_sft[fg].reshape(-1)),
    }


def _np_softmax(x):
    import numpy as np

    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


@functools.partial(jax.jit, static_argnums=(1,))
def _batched_kmeans(prob: jnp.ndarray, n_cluster: int) -> jnp.ndarray:
    """[B, N, C] -> [B, N] labels; fixed key per patch (seeded like sklearn's
    random_state=0 in spirit — deterministic, labels arbitrary)."""
    from nerfsos_tpu.ops.kmeans import kmeans

    keys = jax.random.split(jax.random.PRNGKey(0), prob.shape[0])
    return jax.vmap(lambda k, x: kmeans(k, x, n_cluster)[0])(keys, prob)
