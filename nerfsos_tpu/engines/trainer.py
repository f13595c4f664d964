"""Jitted train steps (vanilla RGB path; the SOS patch path lives in
``engines/sos.py``).

TPU-native rewrite of the reference train step (``engines/trainer.py:32-213``
in VITA-Group/NeRF-SOS): the whole step — render, loss, backward, Adam — is
ONE jitted program. Data-parallel scaling comes from sharding the ray batch
over the mesh's ``data`` axis with replicated params; XLA inserts the gradient
``psum`` over ICI (SURVEY.md §2.5).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerfsos_tpu.engines.state import TrainState
from nerfsos_tpu.losses.photometric import img2mse, mse2psnr
from nerfsos_tpu.models.nerf import NeRFNet


def rgb_loss_fn(
    net: NeRFNet,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    near: float,
    far: float,
    rgb_w: float = 1.0,
    net_kwargs: Optional[Dict[str, Any]] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Coarse+fine MSE (reference ``engines/trainer.py:113-121``)."""
    out = net(params, batch["rays"], (near, far), key=key, train=True,
              **(net_kwargs or {}))
    img_loss = img2mse(out["rgb"], batch["target"])
    loss = rgb_w * img_loss
    metrics = {"img1": img_loss, "psnr": mse2psnr(img_loss)}
    if "rgb0" in out:
        img_loss0 = img2mse(out["rgb0"], batch["target"])
        loss = loss + rgb_w * img_loss0
        metrics.update(img0=img_loss0, psnr0=mse2psnr(img_loss0))
    metrics["loss"] = loss
    return loss, metrics


def _fused_rgb_value_and_grads(
    net: NeRFNet,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    near: float,
    far: float,
    rgb_w: float,
) -> Tuple[Any, Dict[str, jnp.ndarray]]:
    """Loss + gradients via the 3x-FLOP fused RGB train kernels: ONE Pallas
    kernel per pass computes forward, maps, the in-kernel img2mse cotangent,
    and the full reverse sweep — no separate forward render exists (the
    4x-FLOP custom_vjp path pays fwd kernel + recompute-bwd). Exact same
    gradient as value_and_grad(rgb_loss_fn) on the fused net (the cotangent
    scale rgb_w/(R*3) is applied outside the kernel; the sweep is linear).
    """
    from nerfsos_tpu.core import sampling
    from nerfsos_tpu.ops.pallas import fused_render as fr

    cfg = net.cfg
    rays_o = batch["rays"][0].astype(jnp.float32)
    rays_d = batch["rays"][1].astype(jnp.float32)
    gt = batch["target"]
    R = rays_o.shape[0]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near_b = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (R,))[:, None]
    far_b = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (R,))[:, None]
    k_strat, k_noise_c, k_imp, k_noise_f = jax.random.split(key, 4)

    z_vals = sampling.stratified_sample(
        k_strat, near_b, far_b, cfg.n_samples, perturb=cfg.perturb,
        lindisp=cfg.lindisp)
    odv = jnp.concatenate([rays_o, rays_d, viewdirs], axis=1)  # [R, 9]

    g_c, maps0, w0 = fr.fused_rgb_train_grads(
        params["coarse"], odv, z_vals, gt, cfg, depth=cfg.netdepth,
        noise_std=cfg.raw_noise_std, noise_key=k_noise_c)
    z_all, _ = sampling.importance_sample(
        k_imp, z_vals, w0, cfg.n_importance, det=(cfg.perturb == 0.0))
    g_f, maps, _ = fr.fused_rgb_train_grads(
        params["fine"], odv, z_all, gt, cfg, depth=cfg.netdepth_fine,
        noise_std=cfg.raw_noise_std, noise_key=k_noise_f)

    scale = rgb_w / (R * 3)
    grads = jax.tree_util.tree_map(lambda x: x * scale,
                                   {"coarse": g_c, "fine": g_f})

    def rgbm(m):
        return m[:, 0:3] + ((1.0 - m[:, 4:5]) if cfg.white_bkgd else 0.0)

    img_loss = img2mse(rgbm(maps), gt)
    img_loss0 = img2mse(rgbm(maps0), gt)
    metrics = {"img1": img_loss, "psnr": mse2psnr(img_loss),
               "img0": img_loss0, "psnr0": mse2psnr(img_loss0),
               "loss": rgb_w * (img_loss + img_loss0)}
    return grads, metrics


def _supports_fused_rgb_loss(net) -> bool:
    if not isinstance(net, NeRFNet):
        return False
    cfg = net.cfg
    if not (cfg.fused_field and cfg.use_viewdirs and cfg.n_importance > 0
            and not cfg.field_input_grads):
        return False
    from nerfsos_tpu.ops.pallas.fused_field import supports_fused

    return supports_fused(cfg)


def make_rgb_train_step(
    net: NeRFNet,
    near: float,
    far: float,
    rgb_w: float = 1.0,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    net_kwargs: Optional[Dict[str, Any]] = None,
    spmd: str = "gspmd",
):
    """Build the jitted RGB train step.

    Batch contract: ``rays [2, B, 3]`` (origins, dirs), ``target [B, 3]``.
    With a mesh, rays/target are sharded along B and the state is replicated.
    ``net_kwargs`` threads model-specific statics (e.g. mip-NeRF ``radii``).

    ``spmd``: how data parallelism is expressed when a mesh is given —
      - ``"gspmd"``: jit shardings; XLA partitions the graph and inserts the
        gradient psum. Bit-equal to single-device (partitioned RNG), but XLA
        cannot partition the Pallas custom calls, so on real multi-chip the
        fused kernels would run replicated.
      - ``"shard_map"``: per-shard program with explicit collectives — every
        Pallas kernel runs on its local shard; gradients/metrics are
        ``pmean``-ed over the data axis (the scaling-book DP recipe). The
        per-shard RNG key is folded with the shard index, so stochastic
        renders differ from (but are as valid as) the single-device draw.
    """

    if mesh is not None and spmd == "shard_map":
        batch_specs = {"rays": P(None, "data"), "target": P("data"),
                       "masks": P("data")}

        def local_grads(params, batch, key):
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            if _supports_fused_rgb_loss(net):
                grads, metrics = _fused_rgb_value_and_grads(
                    net, params, batch, key, near, far, rgb_w)
            else:
                (_, metrics), grads = jax.value_and_grad(
                    lambda p: rgb_loss_fn(net, p, batch, key, near, far,
                                          rgb_w, net_kwargs),
                    has_aux=True,
                )(params)
            # check_vma=False -> classic shard_map AD: replicated-param
            # cotangents come back UNREDUCED (per-shard); pmean of the
            # local-mean-loss grads is the exact global-mean gradient.
            # (With check_vma=True the transpose auto-psums instead.)
            grads = jax.lax.pmean(grads, "data")
            metrics = jax.lax.pmean(metrics, "data")
            # psnr is nonlinear in mse: recompute from the exact global mean
            metrics["psnr"] = mse2psnr(metrics["img1"])
            if "img0" in metrics:
                metrics["psnr0"] = mse2psnr(metrics["img0"])
            return grads, metrics

        sm = jax.shard_map(local_grads, mesh=mesh,
                           in_specs=(P(), batch_specs, P()),
                           out_specs=(P(), P()),
                           # pallas_call outputs carry no vma metadata
                           # on this jax version; skip the check
                           check_vma=False)

        def sm_step(state: TrainState, batch, key):
            grads, metrics = sm(state.params, batch, key)
            return state.apply_gradients(grads), metrics

        rep = NamedSharding(mesh, P())
        kwargs: Dict[str, Any] = {"donate_argnums": (0,)} if donate else {}
        kwargs["in_shardings"] = (
            rep,
            {k: NamedSharding(mesh, v) for k, v in batch_specs.items()},
            rep,
        )
        kwargs["out_shardings"] = (rep, rep)
        return jax.jit(sm_step, **kwargs)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], key: jax.Array):
        if _supports_fused_rgb_loss(net):
            grads, metrics = _fused_rgb_value_and_grads(
                net, state.params, batch, key, near, far, rgb_w)
        else:
            (_, metrics), grads = jax.value_and_grad(
                lambda p: rgb_loss_fn(net, p, batch, key, near, far, rgb_w,
                                      net_kwargs),
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
            rep,  # state
            {"rays": NamedSharding(mesh, P(None, "data")),
             "target": data1, "masks": data1},
            rep,  # key
        )
        kwargs["out_shardings"] = (rep, rep)
    return jax.jit(step, **kwargs)
