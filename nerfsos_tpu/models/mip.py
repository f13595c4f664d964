"""mip-NeRF: conical-frustum Gaussians + IPE + blurpool resampling.

TPU-native rewrite of the reference ``MipNeRFNet`` (``models/mip_nerf_net.py``
in VITA-Group/NeRF-SOS). Behavior parity:

- ``cast_rays`` lifts conical frustums (or cylinders) between z fenceposts to
  diagonal Gaussians using the stable closed forms (reference ``:44-149``),
- coarse and fine passes SHARE one ``MipNeRFMLP`` (reference ``:40-42``),
- fine resampling blurpools the coarse weights (1-pad, pairwise max, 2-tap
  blur) before the inverse CDF over z midpoints (reference ``:195-210``),
- per-ray ``radii`` threads through ``forward`` (reference ``:235-303``).

Same TPU execution model as models/nerf.py: fixed ray blocks under a
rematerialized ``lax.map``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfsos_tpu.core import sampling
from nerfsos_tpu.core.render import mip_volumetric_render
from nerfsos_tpu.models.fields import MipNeRFField
from nerfsos_tpu.models.nerf import NeRFConfig


def lift_gaussian(rays_d: jnp.ndarray, t_mean: jnp.ndarray, t_var: jnp.ndarray,
                  r_var: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lift a 1-D ray Gaussian to 3-D (diagonal covariance).

    Parity: reference ``models/mip_nerf_net.py:44-64`` (diag branch).
    """
    mean = rays_d[..., None, :] * t_mean[..., None]
    d_mag_sq = jnp.maximum(1e-10, jnp.sum(rays_d**2, -1, keepdims=True))
    d_outer_diag = rays_d**2
    null_outer_diag = 1.0 - d_outer_diag / d_mag_sq
    t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
    xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
    return mean, t_cov_diag + xy_cov_diag


def conical_frustum_to_gaussian(rays_d, t0, t1, base_radius, stable: bool = True):
    """Stable conical-frustum moments (reference ``:76-104``)."""
    if stable:
        mu = (t0 + t1) / 2
        hw = (t1 - t0) / 2
        t_mean = mu + (2 * mu * hw**2) / (3 * mu**2 + hw**2)
        t_var = (hw**2) / 3 - (4 / 15) * ((hw**4 * (12 * mu**2 - hw**2)) / (3 * mu**2 + hw**2) ** 2)
        r_var = base_radius**2 * ((mu**2) / 4 + (5 / 12) * hw**2 - (4 / 15) * (hw**4) / (3 * mu**2 + hw**2))
    else:
        t_mean = (3 * (t1**4 - t0**4)) / (4 * (t1**3 - t0**3))
        r_var = base_radius**2 * (3 / 20 * (t1**5 - t0**5) / (t1**3 - t0**3))
        t_mosq = 3 / 5 * (t1**5 - t0**5) / (t1**3 - t0**3)
        t_var = t_mosq - t_mean**2
    return lift_gaussian(rays_d, t_mean, t_var, r_var)


def cylinder_to_gaussian(rays_d, t0, t1, radius):
    """Cylinder moments (reference ``:107-123``)."""
    t_mean = (t0 + t1) / 2
    r_var = radius**2 / 4
    t_var = (t1 - t0) ** 2 / 12
    return lift_gaussian(rays_d, t_mean, t_var, r_var)


def cast_rays(z_vals: jnp.ndarray, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
              radii: jnp.ndarray, ray_shape: str = "cone"):
    """Featurize the frustum between consecutive fenceposts (reference ``:126-149``).

    Args: z_vals [R, S+1] fenceposts; radii [R, 1].
    Returns: (means [R, S, 3], cov_diags [R, S, 3]).
    """
    t0, t1 = z_vals[..., :-1], z_vals[..., 1:]
    radii = jnp.broadcast_to(radii, t0.shape)
    if ray_shape == "cone":
        means, covs = conical_frustum_to_gaussian(rays_d, t0, t1, radii)
    elif ray_shape == "cylinder":
        means, covs = cylinder_to_gaussian(rays_d, t0, t1, radii)
    else:
        raise ValueError(f"Unknown ray shape: {ray_shape}")
    return means + rays_o[..., None, :], covs


def cast_rays_planar(z_vals: jnp.ndarray, rays_o: jnp.ndarray,
                     rays_d: jnp.ndarray, radii: jnp.ndarray,
                     viewdirs: jnp.ndarray, ray_shape: str = "cone") -> jnp.ndarray:
    """``cast_rays`` in the planar layout the fused mip kernel consumes:
    [9, R*S] rows = (mean xyz, cov_diag xyz, viewdirs xyz).

    Same closed forms as :func:`cast_rays`, computed channel-major so no
    [R, S, 3] tensor is ever materialized (those tile with up to 42.7x lane
    padding as Pallas operands — see ops/pallas/fused_field.py)."""
    t0, t1 = z_vals[..., :-1], z_vals[..., 1:]
    radii = jnp.broadcast_to(radii, t0.shape)
    if ray_shape == "cone":
        mu = (t0 + t1) / 2
        hw = (t1 - t0) / 2
        t_mean = mu + (2 * mu * hw**2) / (3 * mu**2 + hw**2)
        t_var = (hw**2) / 3 - (4 / 15) * ((hw**4 * (12 * mu**2 - hw**2)) / (3 * mu**2 + hw**2) ** 2)
        r_var = radii**2 * ((mu**2) / 4 + (5 / 12) * hw**2 - (4 / 15) * (hw**4) / (3 * mu**2 + hw**2))
    elif ray_shape == "cylinder":
        t_mean = (t0 + t1) / 2
        r_var = radii**2 / 4
        t_var = (t1 - t0) ** 2 / 12
    else:
        raise ValueError(f"Unknown ray shape: {ray_shape}")
    d_t = rays_d.T[:, :, None]  # [3, R, 1]
    mean = d_t * t_mean[None] + rays_o.T[:, :, None]  # [3, R, S]
    d_mag_sq = jnp.maximum(1e-10, jnp.sum(rays_d**2, -1))  # [R]
    d_outer_diag = rays_d.T**2  # [3, R]
    null_outer_diag = 1.0 - d_outer_diag / d_mag_sq[None]
    cov = (t_var[None] * d_outer_diag[:, :, None]
           + r_var[None] * null_outer_diag[:, :, None])  # [3, R, S]
    dirs = jnp.broadcast_to(viewdirs.T[:, :, None], mean.shape)
    return jnp.concatenate([mean, cov, dirs], axis=0).reshape(9, -1)


def blurpool_weights(weights: jnp.ndarray) -> jnp.ndarray:
    """Edge-pad, pairwise max, 2-tap blur (reference ``:196-203``)."""
    pad = jnp.concatenate([weights[..., :1], weights, weights[..., -1:]], -1)
    wmax = jnp.maximum(pad[..., :-1], pad[..., 1:])
    return 0.5 * (wmax[..., :-1] + wmax[..., 1:])


class MipNeRFNet:
    """Stateless mip-NeRF renderer; coarse/fine share parameters."""

    def __init__(self, cfg: NeRFConfig, ray_shape: str = "cone"):
        if cfg.use_semantics:
            # Parity: the reference forces semantics off under --mipnerf
            # (run_nerf.py does the same); MipNeRFField has no semantic head
            # and the planar mip kernel reshapes raw to 4 channels — a
            # semantic config would be silently wrong, so fail loudly.
            raise ValueError("MipNeRFNet does not support use_semantics; "
                             "construct with use_semantics=False")
        self.cfg = cfg
        self.ray_shape = ray_shape
        self.field = MipNeRFField(
            net_depth=cfg.netdepth, net_width=cfg.netwidth, skips=(4,),
            use_viewdirs=cfg.use_viewdirs, use_embed=cfg.use_embed,
            multires=cfg.multires, multires_views=cfg.multires_views,
            compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
        )

    def init(self, key: jax.Array) -> Dict[str, Any]:
        pts = jnp.zeros((2, 3, 3))
        cov = jnp.zeros((2, 3, 3))
        dirs = jnp.zeros((2, 3)) if self.cfg.use_viewdirs else None
        return {"mip": self.field.init(key, pts, cov, dirs)["params"]}

    def _apply(self, params, pts, cov, viewdirs):
        return self.field.apply({"params": params["mip"]}, pts, cov, viewdirs)

    def _planar_ok(self, viewdirs) -> bool:
        """Fused planar mip kernel applies: same preconditions as the classic
        planar path (see models/nerf.py `_planar_ok`), delegated to
        `supports_fused` so new fused-kernel preconditions apply here too.
        The mip kernel additionally has NO semantic branch (it reshapes raw to
        4 channels) — semantics is rejected at construction."""
        cfg = self.cfg
        if not (cfg.fused_field and cfg.use_viewdirs and viewdirs is not None
                and not cfg.field_input_grads):
            return False
        from nerfsos_tpu.ops.pallas.fused_field import supports_fused

        return supports_fused(cfg)

    def _field_pass(self, params, z_vals, rays_o, rays_d, viewdirs, radii, planar):
        """One field evaluation over the fenceposts; returns (raw, cf)."""
        if planar:
            from nerfsos_tpu.ops.pallas.fused_field import fused_mip_apply_planar

            pd = cast_rays_planar(z_vals, rays_o, rays_d, radii, viewdirs,
                                  self.ray_shape)
            raw = fused_mip_apply_planar(params["mip"], pd, self.cfg,
                                         depth=self.cfg.netdepth)
            S = z_vals.shape[-1] - 1
            return raw.reshape(4, -1, S), True
        pts, pts_cov = cast_rays(z_vals, rays_o, rays_d, radii, self.ray_shape)
        return self._apply(params, pts, pts_cov, viewdirs), False

    def render_rays(self, params, rays_o, rays_d, viewdirs, near, far, radii, key,
                    *, perturb: float, raw_noise_std: float,
                    n_samples: Optional[int] = None,
                    n_importance: Optional[int] = None,
                    train: bool = False) -> Dict[str, jnp.ndarray]:
        """Parity: reference ``models/mip_nerf_net.py:151-233``."""
        cfg = self.cfg
        n_samples = cfg.n_samples if n_samples is None else n_samples
        n_importance = cfg.n_importance if n_importance is None else n_importance
        if key is None:
            key = jax.random.PRNGKey(0)
        k_strat, k_noise_c, k_imp, k_noise_f = jax.random.split(key, 4)
        planar = self._planar_ok(viewdirs)

        # fenceposts
        z_vals = sampling.stratified_sample(k_strat, near, far, n_samples,
                                            perturb=perturb, lindisp=cfg.lindisp)

        # Fully-fused path: cast_rays + IPE + MLP + mip compositing in ONE
        # kernel per pass (ops/pallas/fused_render.py) — no [9, N] Gaussian
        # streams or layout relayouts touch HBM. Eval rides the forward-only
        # kernel; training (or raw noise) rides the custom-vjp TRAIN kernel
        # (fused backward: recompute + in-kernel composite cotangents +
        # planar reverse sweep, with in-kernel pre-relu noise).
        if planar:
            from nerfsos_tpu.ops.pallas import fused_render as fr

            R = rays_o.shape[0]
            odvr = jnp.concatenate(
                [rays_o, rays_d, viewdirs,
                 jnp.broadcast_to(jnp.asarray(radii, jnp.float32), (R, 1))],
                axis=1)
            fused_train = train or raw_noise_std > 0.0

            def one_pass(z, nk):
                if fused_train:
                    return fr.fused_mip_train_render_planar(
                        params["mip"], odvr, z, cfg, self.ray_shape,
                        depth=cfg.netdepth, noise_std=raw_noise_std,
                        noise_key=nk)
                return fr.fused_mip_render_planar(
                    params["mip"], odvr, z, cfg, self.ray_shape,
                    depth=cfg.netdepth)

            maps0, w0 = one_pass(z_vals, k_noise_c)
            ret = fr.finish_mip_maps(maps0, w0, cfg.white_bkgd)
            if n_importance > 0:
                ret0 = ret
                weights_blur = blurpool_weights(w0)
                z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
                z_all, z_samples = sampling.importance_sample(
                    k_imp, z_mids, weights_blur, n_importance,
                    det=(perturb == 0.0))
                maps, w_fine = one_pass(z_all, k_noise_f)
                ret = fr.finish_mip_maps(maps, w_fine, cfg.white_bkgd)
                ret["z_std"] = jnp.std(z_samples, axis=-1)
                for k, v in ret0.items():
                    ret[k + "0"] = v
            return ret

        raw, cf = self._field_pass(params, z_vals, rays_o, rays_d, viewdirs, radii, planar)
        ret = mip_volumetric_render(raw, z_vals, rays_d, raw_noise_std=raw_noise_std,
                                    white_bkgd=cfg.white_bkgd, noise_key=k_noise_c,
                                    channels_first=cf)

        if n_importance > 0:
            ret0 = ret
            weights_blur = blurpool_weights(ret0["weights"])
            z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_all, z_samples = sampling.importance_sample(
                k_imp, z_mids, weights_blur, n_importance, det=(perturb == 0.0)
            )
            raw, cf = self._field_pass(params, z_all, rays_o, rays_d, viewdirs, radii, planar)
            ret = mip_volumetric_render(raw, z_all, rays_d, raw_noise_std=raw_noise_std,
                                        white_bkgd=cfg.white_bkgd, noise_key=k_noise_f,
                                        channels_first=cf)
            ret["z_std"] = jnp.std(z_samples, axis=-1)
            for k, v in ret0.items():
                ret[k + "0"] = v
        return ret

    def __call__(self, params, ray_batch, bounds, radii, key=None, train=False,
                 **overrides) -> Dict[str, jnp.ndarray]:
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
        radii = jnp.broadcast_to(jnp.asarray(radii, jnp.float32), (R,))[:, None]

        block = min(cfg.ray_block, R)
        n_blocks = -(-R // block)
        pad = n_blocks * block - R
        if pad:
            def _pad(x):
                return jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], 0)
            rays_o, rays_d, near, far, radii = map(_pad, (rays_o, rays_d, near, far, radii))
            if viewdirs is not None:
                viewdirs = _pad(viewdirs)

        if key is None:
            key = jax.random.PRNGKey(0)

        def body(xs):
            o, d, v, n, f, r, k = xs
            return self.render_rays(params, o, d, v, n, f, r, k,
                                    perturb=perturb, raw_noise_std=raw_noise_std,
                                    train=train, **overrides)

        if cfg.remat:
            body = jax.checkpoint(body)

        if n_blocks == 1:
            out = body((rays_o, rays_d, viewdirs, near, far, radii, key))
        else:
            def blk(x):
                return x.reshape(n_blocks, block, *x.shape[1:])
            keys = jax.random.split(key, n_blocks)
            xs = (blk(rays_o), blk(rays_d),
                  blk(viewdirs) if viewdirs is not None else jnp.zeros((n_blocks, block, 3)),
                  blk(near), blk(far), blk(radii), keys)
            out = jax.lax.map(body, xs)
            out = {k: v.reshape(n_blocks * block, *v.shape[2:]) for k, v in out.items()}

        if pad:
            out = {k: v[:R] for k, v in out.items()}
        return {k: v.reshape(*lead_shape, *v.shape[1:]) for k, v in out.items()}
