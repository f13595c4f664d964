"""Coarse/fine NeRF rendering orchestration (functional, jit-first).

TPU-native rewrite of the reference ``NeRFNet`` (``models/nerf_net.py:20-195``
in VITA-Group/NeRF-SOS). Behavior parity:

- coarse stratified sample -> coarse field -> composite; importance resample
  (detached, merge-sorted) -> fine field -> composite (reference ``:71-130``),
- coarse outputs buffered under a ``'0'`` suffix, fine ``z_std`` reported
  (reference ``:124-128``),
- coarse and fine fields SHARE parameters when ``n_importance == 0``
  (reference ``:49-54``),
- viewdirs are the unit-normalized ray directions (reference ``:163-166``),
- scalar near/far broadcast per ray (reference ``:169-173``).

TPU-first deltas:

- The reference's Python ``ray_chunk`` loop (``:177-187``) becomes a
  ``jax.lax.map`` over fixed-size ray blocks INSIDE one compiled graph, with
  ``jax.checkpoint`` on the block body so backward rematerializes per block —
  bounded memory at full MXU utilization, fully differentiable.
- torch global RNG becomes explicit key threading; ``model.training`` becomes
  an explicit ``train`` argument selecting the reference's
  ``render_kwargs_train/test`` defaults (``:57-69``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfsos_tpu.core import sampling
from nerfsos_tpu.core.render import sigma_to_weights, volumetric_render
from nerfsos_tpu.models.fields import NeRFField


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Model + render configuration (reference ``NeRFNet.__init__`` args)."""

    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: int = 8
    netwidth_fine: int = 256
    n_samples: int = 64
    n_importance: int = 64
    use_viewdirs: bool = True
    use_embed: bool = True
    multires: int = 10
    multires_views: int = 4
    conv_embed: bool = False
    perturb: float = 1.0
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    lindisp: bool = False
    use_semantics: bool = False
    skips: tuple = (4,)
    sem_layer: int = 2
    sem_dim: int = 2
    sem_with_coord: bool = False
    sem_with_geo: bool = False
    # TPU execution knobs (replace the reference's ray_chunk/pts_chuck):
    ray_block: int = 4096  # rays per compiled block of the render scan
    remat: bool = True  # rematerialize block bodies in backward
    compute_dtype: str = "float32"  # MLP activation dtype ("bfloat16" for MXU)
    fused_field: bool = False  # Pallas fused PE+MLP kernel (ops/pallas)
    # When False, the fused kernel's backward SKIPS input (pts/dirs) gradients
    # and returns exact zeros for them — correct for every shipped training
    # path (rays are data; importance z-vals are detached). Set True if
    # anything trainable sits upstream of the field inputs (e.g. a camera
    # transformer optimized through the render).
    field_input_grads: bool = False
    # Reference --fix_backbone (run_nerf.py:307-318): every param except the
    # semantic head is requires_grad=False, so torch NEVER builds the trunk
    # backward. With this flag the fused train kernels' custom VJP runs the
    # semantic-head-only sweep (no trunk reverse, no composite cotangents —
    # fused_render._train_frozen_bwd_kernel); grads for frozen leaves are
    # exact zeros. The XLA path needs no flag: stop_gradient on the frozen
    # subtree (engines/sos.py) lets XLA's AD prune the trunk backward itself.
    frozen_backbone: bool = False
    # Override for fused_field's planar-VJP backward point-block (None = the
    # kernel default, 1024 bf16). Only the paths that reach that VJP read it
    # — today that is MIP training (the classic train path uses the fused
    # render kernels, which size their own ray blocks). The round-2 SOS
    # override (768) is retired: its compile failure was the 16 MB default
    # VMEM scoped stack, now raised via CompilerParams where needed.
    field_bwd_block: Optional[int] = None

    @property
    def shared_fine(self) -> bool:
        return self.n_importance <= 0


def _field_kwargs(cfg: NeRFConfig, fine: bool) -> Dict[str, Any]:
    return dict(
        net_depth=cfg.netdepth_fine if fine else cfg.netdepth,
        net_width=cfg.netwidth_fine if fine else cfg.netwidth,
        skips=tuple(cfg.skips),
        use_viewdirs=cfg.use_viewdirs,
        use_embed=cfg.use_embed,
        multires=cfg.multires,
        multires_views=cfg.multires_views,
        conv_embed=cfg.conv_embed,
        output_ch=4,
        use_semantics=cfg.use_semantics,
        sem_layer=cfg.sem_layer,
        sem_dim=cfg.sem_dim,
        sem_with_coord=cfg.sem_with_coord,
        sem_with_geo=cfg.sem_with_geo,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
    )


class NeRFNet:
    """Stateless renderer: holds config + flax field definitions, no params."""

    def __init__(self, cfg: NeRFConfig):
        self.cfg = cfg
        self.coarse = NeRFField(**_field_kwargs(cfg, fine=False), name=None)
        self.fine = None if cfg.shared_fine else NeRFField(**_field_kwargs(cfg, fine=True), name=None)

    # ------------------------------------------------------------- params

    def init(self, key: jax.Array) -> Dict[str, Any]:
        pts = jnp.zeros((2, 3, 3))
        dirs = jnp.zeros((2, 3)) if self.cfg.use_viewdirs else None
        kc, kf = jax.random.split(key)
        params = {"coarse": self.coarse.init(kc, pts, dirs)["params"]}
        if self.fine is not None:
            params["fine"] = self.fine.init(kf, pts, dirs)["params"]
        return params

    def _apply(self, params: Dict[str, Any], which: str, pts: jnp.ndarray,
               viewdirs: Optional[jnp.ndarray]) -> jnp.ndarray:
        fine = which == "fine" and self.fine is not None
        if self.cfg.fused_field and viewdirs is not None:
            from nerfsos_tpu.ops.pallas.fused_field import fused_field_apply, supports_fused

            if supports_fused(self.cfg):
                depth = self.cfg.netdepth_fine if fine else self.cfg.netdepth
                return fused_field_apply(
                    params["fine" if fine else "coarse"], pts, viewdirs,
                    self.cfg, depth=depth,
                )
        if fine:
            return self.fine.apply({"params": params["fine"]}, pts, viewdirs)
        return self.coarse.apply({"params": params["coarse"]}, pts, viewdirs)

    def _planar_ok(self, viewdirs, retraw: bool, retpts: bool) -> bool:
        """The planar (channel-major IO) fused path: same math, unpadded HBM
        streams (see ops/pallas/fused_field.py planar section — the row-major
        [N,3]/[N,C] Pallas operands tile with a measured 42.7x pad).
        Requires field_input_grads=False (zero input cotangents) and no
        raw/pts retention (those consumers expect [..., S, C])."""
        cfg = self.cfg
        if not (cfg.fused_field and cfg.use_viewdirs and viewdirs is not None):
            return False
        if cfg.field_input_grads or retraw or retpts:
            return False
        from nerfsos_tpu.ops.pallas.fused_field import supports_fused

        return supports_fused(cfg)

    def _apply_planar(self, params: Dict[str, Any], which: str,
                      rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                      z_vals: jnp.ndarray, viewdirs: jnp.ndarray) -> jnp.ndarray:
        """Planar fused field on ray geometry: returns raw [C, R, S]."""
        from nerfsos_tpu.ops.pallas.fused_field import fused_field_apply_planar

        fine = which == "fine" and self.fine is not None
        depth = self.cfg.netdepth_fine if fine else self.cfg.netdepth
        pd = sampling.points_along_rays_planar(rays_o, rays_d, z_vals, viewdirs)
        raw = fused_field_apply_planar(params["fine" if fine else "coarse"],
                                       pd, self.cfg, depth=depth)
        return raw.reshape(raw.shape[0], *z_vals.shape)

    def _apply_sigma(self, params: Dict[str, Any], pts: jnp.ndarray,
                     viewdirs: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Coarse densities only ([R, S]) — the eval render's coarse pass.

        Uses the density-only Pallas kernel when the fused field is enabled
        (XLA cannot DCE heads inside an opaque pallas_call); otherwise the
        full XLA field, where slicing sigma lets XLA prune the color heads.
        """
        if self.cfg.fused_field and viewdirs is not None:
            from nerfsos_tpu.ops.pallas.fused_field import fused_sigma_apply, supports_fused

            if supports_fused(self.cfg):
                return fused_sigma_apply(params["coarse"], pts, self.cfg,
                                         depth=self.cfg.netdepth)[..., 0]
        return self._apply(params, "coarse", pts, viewdirs)[..., 3]

    # ------------------------------------------------------------- render

    def render_rays(
        self,
        params: Dict[str, Any],
        rays_o: jnp.ndarray,
        rays_d: jnp.ndarray,
        viewdirs: Optional[jnp.ndarray],
        near: jnp.ndarray,
        far: jnp.ndarray,
        key: Optional[jax.Array],
        *,
        perturb: float,
        raw_noise_std: float,
        n_samples: Optional[int] = None,
        n_importance: Optional[int] = None,
        retraw: bool = False,
        retpts: bool = False,
        coarse_outputs: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Render one block of rays. Parity: reference ``render_rays`` (:71-130).

        ``coarse_outputs=False`` (eval/video renders): the coarse pass runs
        density-only — just enough to drive importance sampling — and the
        ``'0'``-suffixed outputs are omitted. The fine outputs are bit-identical
        to the full path (same weights feed the same inverse-CDF). Training
        must keep the default: the losses consume ``rgb0``/``semantics0``.
        """
        cfg = self.cfg
        n_samples = cfg.n_samples if n_samples is None else n_samples
        n_importance = cfg.n_importance if n_importance is None else n_importance
        if key is None:
            key = jax.random.PRNGKey(0)
        k_strat, k_noise_c, k_imp, k_noise_f = jax.random.split(key, 4)

        z_vals = sampling.stratified_sample(
            k_strat, near, far, n_samples, perturb=perturb, lindisp=cfg.lindisp
        )
        planar = self._planar_ok(viewdirs, retraw, retpts)
        sigma_only = not coarse_outputs and n_importance > 0 and not retraw
        # Fully-fused eval render: field + volumetric composite in ONE kernel
        # per pass (ops/pallas/fused_render.py) — no [C, N] streams or layout
        # relayouts touch HBM. Engages only on the eval path (no coarse
        # outputs, no noise); training keeps the differentiable route.
        if planar and sigma_only and raw_noise_std == 0.0:
            from nerfsos_tpu.ops.pallas import fused_render as fr

            od = jnp.concatenate([rays_o, rays_d], axis=1)            # [R, 6]
            weights = fr.fused_coarse_weights_planar(
                params["coarse"], od, z_vals, cfg, depth=cfg.netdepth)
            z_all, z_samples = sampling.importance_sample(
                k_imp, z_vals, weights, n_importance, det=(perturb == 0.0))
            fine = "fine" if self.fine is not None else "coarse"
            maps, w_fine = fr.fused_render_planar(
                params[fine], jnp.concatenate([od, viewdirs], axis=1),
                z_all, cfg,
                depth=cfg.netdepth_fine if fine == "fine" else cfg.netdepth)
            ret = fr.finish_maps(maps, w_fine, cfg.use_semantics, cfg.white_bkgd)
            ret["z_std"] = jnp.std(z_samples, axis=-1)
            return ret
        # Fused TRAIN render (coarse outputs kept): same single-kernel-per-
        # pass structure with a fused backward (custom_vjp accumulates dW/db
        # in-kernel; odv/z get exact-zero cotangents — rays are data, the
        # importance z is detached). In-kernel pre-relu noise when
        # raw_noise_std > 0 (hash-counter draws; reference contract is the
        # N(0,std) distribution, not torch's stream).
        if planar and coarse_outputs and n_importance > 0:
            from nerfsos_tpu.ops.pallas import fused_render as fr

            odv = jnp.concatenate([rays_o, rays_d, viewdirs], axis=1)  # [R,9]
            maps0, w0 = fr.fused_train_render_planar(
                params["coarse"], odv, z_vals, cfg, depth=cfg.netdepth,
                noise_std=raw_noise_std, noise_key=k_noise_c)
            ret0 = fr.finish_maps(maps0, w0, cfg.use_semantics, cfg.white_bkgd)
            z_all, z_samples = sampling.importance_sample(
                k_imp, z_vals, w0, n_importance, det=(perturb == 0.0))
            fine = "fine" if self.fine is not None else "coarse"
            maps, w_fine = fr.fused_train_render_planar(
                params[fine], odv, z_all, cfg,
                depth=cfg.netdepth_fine if fine == "fine" else cfg.netdepth,
                noise_std=raw_noise_std, noise_key=k_noise_f)
            ret = fr.finish_maps(maps, w_fine, cfg.use_semantics, cfg.white_bkgd)
            ret["z_std"] = jnp.std(z_samples, axis=-1)
            for k, v in ret0.items():
                ret[k + "0"] = v
            return ret
        if sigma_only:
            if planar:
                from nerfsos_tpu.ops.pallas.fused_field import fused_sigma_apply_planar

                p3 = sampling.points_along_rays_planar(rays_o, rays_d, z_vals)
                sigma = fused_sigma_apply_planar(
                    params["coarse"], p3, cfg).reshape(z_vals.shape)
            else:
                pts = sampling.points_along_rays(rays_o, rays_d, z_vals)
                sigma = self._apply_sigma(params, pts, viewdirs)
            ret = {"weights": sigma_to_weights(
                sigma, z_vals, rays_d,
                raw_noise_std=raw_noise_std, noise_key=k_noise_c,
            )}
        else:
            if planar:
                raw = self._apply_planar(params, "coarse", rays_o, rays_d,
                                         z_vals, viewdirs)
            else:
                pts = sampling.points_along_rays(rays_o, rays_d, z_vals)
                raw = self._apply(params, "coarse", pts, viewdirs)
            ret = volumetric_render(
                raw, z_vals, rays_d,
                raw_noise_std=raw_noise_std, white_bkgd=cfg.white_bkgd,
                use_semantics=cfg.use_semantics, noise_key=k_noise_c,
                channels_first=planar,
            )
            if retraw:
                ret["raw"] = raw
            if retpts:
                ret["pts"] = pts

        if n_importance > 0:
            ret0 = ret
            z_all, z_samples = sampling.importance_sample(
                k_imp, z_vals, ret0["weights"], n_importance, det=(perturb == 0.0)
            )
            if planar:
                raw = self._apply_planar(params, "fine", rays_o, rays_d,
                                         z_all, viewdirs)
            else:
                pts = sampling.points_along_rays(rays_o, rays_d, z_all)
                raw = self._apply(params, "fine", pts, viewdirs)
            ret = volumetric_render(
                raw, z_all, rays_d,
                raw_noise_std=raw_noise_std, white_bkgd=cfg.white_bkgd,
                use_semantics=cfg.use_semantics, noise_key=k_noise_f,
                channels_first=planar,
            )
            if retraw:
                ret["raw"] = raw
            if retpts:
                ret["pts"] = pts
            ret["z_std"] = jnp.std(z_samples, axis=-1)  # biased, like torch(unbiased=False)
            if coarse_outputs:
                for k, v in ret0.items():
                    ret[k + "0"] = v
        return ret

    def __call__(
        self,
        params: Dict[str, Any],
        ray_batch: jnp.ndarray,
        bounds: Tuple[Any, Any],
        key: Optional[jax.Array] = None,
        train: bool = False,
        **overrides: Any,
    ) -> Dict[str, jnp.ndarray]:
        """Render a batch of rays of arbitrary leading shape.

        Args:
          ray_batch: [2, ..., 3] stacked (origins, directions).
          bounds: (near, far) — python scalars or per-ray arrays.
        Returns:
          dict of per-ray outputs with the input leading shape restored.
        Parity: reference ``forward`` (``models/nerf_net.py:132-195``).
        """
        cfg = self.cfg
        perturb = overrides.pop("perturb", cfg.perturb if train else 0.0)
        raw_noise_std = overrides.pop("raw_noise_std", cfg.raw_noise_std if train else 0.0)

        rays_o, rays_d = ray_batch[0], ray_batch[1]
        lead_shape = rays_d.shape[:-1]
        rays_o = rays_o.reshape(-1, rays_o.shape[-1]).astype(jnp.float32)
        rays_d = rays_d.reshape(-1, rays_d.shape[-1]).astype(jnp.float32)
        R = rays_o.shape[0]

        viewdirs = None
        if cfg.use_viewdirs:
            viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        near, far = bounds
        near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (R,))[:, None]
        far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (R,))[:, None]

        block = min(cfg.ray_block, R)
        n_blocks = -(-R // block)
        pad = n_blocks * block - R
        if pad:
            def _pad(x):
                return jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], 0)
            rays_o, rays_d, near, far = map(_pad, (rays_o, rays_d, near, far))
            if viewdirs is not None:
                viewdirs = _pad(viewdirs)

        if key is None:
            key = jax.random.PRNGKey(0)

        def body(xs):
            o, d, v, n, f, k = xs
            return self.render_rays(
                params, o, d, v, n, f, k,
                perturb=perturb, raw_noise_std=raw_noise_std, **overrides,
            )

        if cfg.remat:
            body = jax.checkpoint(body)

        if n_blocks == 1:
            out = body((rays_o, rays_d, viewdirs, near, far, key))
            out = {k: v for k, v in out.items()}
        else:
            def blk(x):
                return x.reshape(n_blocks, block, *x.shape[1:])
            keys = jax.random.split(key, n_blocks)
            xs = (blk(rays_o), blk(rays_d),
                  blk(viewdirs) if viewdirs is not None else jnp.zeros((n_blocks, block, 3)),
                  blk(near), blk(far), keys)
            out = jax.lax.map(body, xs)
            out = {k: v.reshape(n_blocks * block, *v.shape[2:]) for k, v in out.items()}

        if pad:
            out = {k: v[:R] for k, v in out.items()}
        return {k: v.reshape(*lead_shape, *v.shape[1:]) for k, v in out.items()}
