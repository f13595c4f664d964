"""Ray samplers: stratified (coarse) and inverse-CDF importance (fine).

TPU-native rewrite of the reference samplers (``models/sampler.py:12-170`` in
VITA-Group/NeRF-SOS). Differences by design:

- Explicit ``jax.random`` keys replace torch global RNG (reference
  ``models/sampler.py:61,103``).
- ``torch.searchsorted`` is replaced by a vectorized comparison-sum over the
  (tiny) bin axis — a branchless O(S·B) VPU op that XLA fuses, instead of a
  serial binary search (reference ``models/sampler.py:118``).
- ``detach()`` of fine z-samples (reference ``:159``) becomes
  ``jax.lax.stop_gradient``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nerfsos_tpu.core.scan_ops import cumsum_last


def stratified_sample(
    key: jax.Array | None,
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    perturb: float = 0.0,
    lindisp: bool = False,
) -> jnp.ndarray:
    """Uniform z-values in [near, far], with optional stratified jitter.

    Args:
      key:  PRNG key (required when perturb > 0).
      near: [..., 1] or scalar; far likewise.
    Returns:
      z_vals: [..., n_samples]. Parity: reference ``models/sampler.py:25-74``.
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)

    if perturb > 0.0:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def searchsorted_right(sorted_seq: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Batched ``searchsorted(..., right=True)``.

    Args:
      sorted_seq: [..., B] sorted along the last axis.
      values:     [..., N].
    Returns:
      [..., N] int32 index of the first element strictly greater than value.

    Implemented as a comparison-sum (B is ~65 here) — fully vectorized on the
    VPU, no data-dependent control flow.
    """
    return jnp.sum(
        (sorted_seq[..., None, :] <= values[..., :, None]).astype(jnp.int32), axis=-1
    )


def sorted_uniform(key: jax.Array, shape) -> jnp.ndarray:
    """iid-Uniform(0,1) ORDER STATISTICS along the last axis, generated
    directly via normalized exponential spacings (no sort). Distributionally
    identical to ``sort(uniform(shape))``."""
    e = jax.random.exponential(key, shape[:-1] + (shape[-1] + 1,))
    c = jnp.cumsum(e, axis=-1)
    return c[..., :-1] / c[..., -1:]


def sample_pdf(
    key: jax.Array | None,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    det: bool = False,
    sorted_u: bool = False,
) -> jnp.ndarray:
    """Inverse-CDF sampling of ``n_importance`` z-values per ray.

    Args:
      bins:    [..., B] bin edges (z-val midpoints).
      weights: [..., B-1] unnormalized per-bin weights.
      sorted_u: draw the uniforms as order statistics — the returned samples
        are then monotone along the last axis (the SET of samples is
        distributionally identical to iid draws; enables a sort-free merge).
    Returns:
      samples: [..., n_importance]. Parity: reference
      ``models/sampler.py:91-134`` including the ``+1e-5`` weight floor and
      the ``denom < 1e-5 -> 1`` guard.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = cumsum_last(pdf)  # TPU: loop-free doubling scan (scan_ops)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., B]

    u_shape = cdf.shape[:-1] + (n_importance,)
    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_importance), u_shape)
    elif sorted_u:
        u = sorted_uniform(key, u_shape).astype(cdf.dtype)
    else:
        u = jax.random.uniform(key, u_shape, dtype=cdf.dtype)

    inds = searchsorted_right(cdf, u)
    B = cdf.shape[-1]
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(B - 1, inds)

    # Gather-free lookups: per-row dynamic gathers (take_along_axis) are the
    # hot spot on TPU (~25x the cost of the whole compositing step, measured);
    # with B ~ 65 a one-hot contraction over the bin axis is pure VPU work.
    def pick(table, idx):
        # table [..., Bt], idx [..., I] -> [..., I]. HIGHEST: the default TPU
        # matmul would round the cdf/z tables to bf16 (~0.4% — a real shift
        # in sample positions); the one-hot side is exact, so the multi-pass
        # contraction reproduces the fp32 gather bit-for-bit.
        onehot = (idx[..., None] == jnp.arange(table.shape[-1])).astype(table.dtype)
        return jnp.einsum("...ib,...b->...i", onehot, table,
                          precision=jax.lax.Precision.HIGHEST)

    cdf_below = pick(cdf, below)
    cdf_above = pick(cdf, above)
    nb = bins.shape[-1]
    bins_below = pick(bins, jnp.minimum(below, nb - 1))
    bins_above = pick(bins, jnp.minimum(above, nb - 1))

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two per-row SORTED sequences into one sorted sequence, without a
    sort: output positions come from cross-rank counts, values land via
    one-hot contractions (XLA's sort and per-row gathers are both slow on
    TPU; comparison-sums fuse onto the VPU). Ties place ``a`` first (stable).
    """
    S, I = a.shape[-1], b.shape[-1]
    pos_a = jnp.arange(S) + jnp.sum(
        (b[..., None, :] < a[..., :, None]).astype(jnp.int32), axis=-1
    )
    pos_b = jnp.arange(I) + jnp.sum(
        (a[..., None, :] <= b[..., :, None]).astype(jnp.int32), axis=-1
    )
    out_idx = jnp.arange(S + I)
    oh_a = (pos_a[..., :, None] == out_idx).astype(a.dtype)
    oh_b = (pos_b[..., :, None] == out_idx).astype(b.dtype)
    hp = jax.lax.Precision.HIGHEST  # z-vals must not round through bf16
    return (jnp.einsum("...sp,...s->...p", oh_a, a, precision=hp)
            + jnp.einsum("...ip,...i->...p", oh_b, b, precision=hp))


def importance_sample(
    key: jax.Array | None,
    z_vals: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    det: bool = False,
):
    """Hierarchical resampling: pdf over coarse intervals, merged+sorted z.

    Args:
      z_vals:  [..., S] coarse z-values (sorted).
      weights: [..., S] coarse compositing weights.
    Returns:
      (z_all [..., S+n_importance], z_samples [..., n_importance]).
      Parity: reference ``models/sampler.py:136-170`` — pdf over interval
      midpoints with the edge weights dropped, fine samples detached, then a
      merge-sort with the coarse z. (A gather-free two-way merge over sorted
      order statistics — see ``merge_sorted``/``sorted_uniform`` — measured
      no faster than XLA's sort at S+I=192, so the simpler reference-parity
      path stays.)
    """
    z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(key, z_mids, weights[..., 1:-1], n_importance, det=det)
    z_samples = jax.lax.stop_gradient(z_samples)
    z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    return z_all, z_samples


def points_along_rays(rays_o: jnp.ndarray, rays_d: jnp.ndarray, z_vals: jnp.ndarray) -> jnp.ndarray:
    """pts = o + d * z. Returns [..., S, 3]."""
    return rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]


def points_along_rays_planar(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    viewdirs: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Planar (channel-major) points: [3, R*S] — or [6, R*S] with viewdirs
    rows appended (dx,dy,dz broadcast over samples).

    TPU layout rationale: a [R*S, 3] f32 array feeding a Pallas operand tiles
    to T(8,128) with the 3-lane minor dim padded to 128 — a measured 42.7x
    HBM expansion (6 GB for a 65536x192 render; XLA OOM dump 2026-08-16).
    Channel-major keeps points on lanes: zero padding.
    """
    pts = rays_o.T[:, :, None] + rays_d.T[:, :, None] * z_vals[None]  # [3, R, S]
    if viewdirs is None:
        return pts.reshape(3, -1)
    dirs = jnp.broadcast_to(viewdirs.T[:, :, None], pts.shape)
    return jnp.concatenate([pts, dirs], axis=0).reshape(6, -1)


def layered_sample(
    key: jax.Array | None,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    plane_normals: jnp.ndarray,
    plane_offsets: jnp.ndarray,
    perturb: float = 0.0,
) -> jnp.ndarray:
    """Plane-sweep sampling: z at each ray/plane intersection.

    Parity: reference ``LayeredSampler`` (``models/sampler.py:173-260``; unused
    in its main path): z = (D - o.n) / (d.n) per plane; the exotic perturb>=2
    modes are stratified jitter (2<=p<4) or truncated-Gaussian edge jitter
    (p>=4). Plane offsets may be trainable parameters upstream of this call.
    """
    a = plane_offsets[None, :] - jnp.sum(rays_o[:, None, :] * plane_normals[None], -1)
    b = jnp.sum(rays_d[:, None, :] * plane_normals[None], -1)
    z_vals = a / b

    if perturb >= 2.0 and perturb < 4.0:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    elif perturb >= 4.0:
        t_rand = jnp.clip((perturb - 4.0) * jax.random.normal(key, z_vals.shape), -1.0, 1.0)
        step = 0.5 * (z_vals[..., 1:] - z_vals[..., :-1])
        fwd = jnp.concatenate([step, jnp.zeros_like(z_vals[..., :1])], -1)
        bwd = jnp.concatenate([jnp.zeros_like(z_vals[..., :1]), step], -1)
        z_vals = z_vals + jnp.where(t_rand > 0, t_rand * fwd, 0.0)
        z_vals = z_vals + jnp.where(t_rand < 0, t_rand * bwd, 0.0)
    return z_vals
