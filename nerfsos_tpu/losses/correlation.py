"""Collaborative contrastive correlation losses — the heart of NeRF-SOS.

TPU-native rewrite of the reference losses (``utils/image.py:187-482`` in
VITA-Group/NeRF-SOS):

- ``CorrelationLoss`` (appearance): STEGO-style hinge between the DINO
  patch-feature correlation (no-grad, "pointwise" mean-recentered) and the
  rendered semantic-code correlation, over 11x11 randomly grid-sampled
  coordinates; negative patches mined by min CLS cosine similarity
  (``use_sim_matrix``), derangement (``super_perm``), or uniform permutation
  (``rand_neg``).
- ``GeoCorrelationLoss`` (geometry): rendered depth back-projected to 3-D
  points; correlation kernel = clamped inverse L1 distance; whole-patch
  (no coordinate subsampling).
- ``NeRFContrastive``: min/max CLS cosine contrast.

Explicit ``jax.random`` keys replace torch global RNG; ``stop_gradient``
replaces ``no_grad``; ``where`` replaces in-place masking.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from nerfsos_tpu.ops.grid_sample import grid_sample_bilinear


def _safe_norm(x: jnp.ndarray, axis: int, eps: float) -> jnp.ndarray:
    """||x|| with a finite gradient at x == 0 (torch defines subgradient 0
    there; jnp.linalg.norm yields NaN — rays whose sigmas are all negative
    composite to EXACTLY zero semantic vectors, so this matters)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def get_similarity_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """Pairwise CLS cosine similarity [B, B] (reference ``utils/image.py:187-190``)."""
    xn = x / _safe_norm(x, -1, 1e-8)
    return xn @ xn.T


def super_perm(key: jax.Array, size: int) -> jnp.ndarray:
    """Random permutation with no fixed points (reference ``:306-309``)."""
    perm = jax.random.permutation(key, size)
    perm = jnp.where(perm == jnp.arange(size), perm + 1, perm)
    return perm % size


def _norm(t: jnp.ndarray) -> jnp.ndarray:
    """F.normalize(dim=1, eps=1e-10) parity (safe gradient at zero)."""
    return t / _safe_norm(t, 1, 1e-10)


def _gmean(x: jnp.ndarray, axis: Optional[str]) -> jnp.ndarray:
    """Batch-global mean: plain mean, pmean'd over a shard axis if given
    (equal shard sizes make the mean-of-means exact)."""
    m = x.mean()
    return jax.lax.pmean(m, axis) if axis is not None else m


def _gmean_grouped(x: jnp.ndarray, axis: Optional[str]) -> jnp.ndarray:
    """Per-group batch-global means of a [G, ...] stack -> [G]."""
    m = x.reshape(x.shape[0], -1).mean(axis=1)
    return jax.lax.pmean(m, axis) if axis is not None else m


def _pointwise_recenter(fd: jnp.ndarray, axis: Optional[str] = None) -> jnp.ndarray:
    """fd -= mean over last two dims; then recenter global mean to the old one
    (reference ``:316-319``). ``axis``: shard axis for the BATCH-global means
    when fd's batch dim is sharded (shard_map path)."""
    old_mean = _gmean(fd, axis)
    fd = fd - fd.mean(axis=(3, 4), keepdims=True)
    return fd - _gmean(fd, axis) + old_mean


@dataclasses.dataclass(frozen=True)
class CorrelationLoss:
    """Appearance correlation loss (reference ``utils/image.py:263-370``).

    ``app_corr_params`` order: (self_shift, self_weight, neg_shift, neg_weight).
    """

    self_shift: float = 0.18
    self_weight: float = 0.67
    neg_shift: float = 0.46
    neg_weight: float = 0.63
    feature_samples: int = 11
    zero_clamp: bool = True
    stabilize: bool = False
    pointwise: bool = True
    use_sim_matrix: bool = True
    rand_neg: bool = False

    @classmethod
    def from_params(cls, params: Sequence[float], **kw) -> "CorrelationLoss":
        s = [float(x) for x in params]
        return cls(self_shift=s[0], self_weight=s[1], neg_shift=s[2], neg_weight=s[3], **kw)

    # -- pieces -------------------------------------------------------------

    def tensor_correlation(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """einsum('nchw,ncij->nhwij') (reference ``:297-298``)."""
        return jnp.einsum("nchw,ncij->nhwij", a, b)

    def sample(self, t: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
        """grid_sample with the reference's coords.permute(0,2,1,3) quirk (``:303-304``)."""
        return grid_sample_bilinear(t, coords.transpose(0, 2, 1, 3))

    def _clamp_min(self) -> float:
        return 0.0 if self.zero_clamp else -9999.0

    def feat_transform(self, t: jnp.ndarray) -> jnp.ndarray:
        """Transform applied to the feature side before the correlation kernel.

        Appearance loss L2-normalizes DINO features per pixel (reference
        ``utils/image.py:312``); the geometry loss overrides this to identity —
        its kernel consumes RAW back-projected 3-D points (``:418``, the
        normalized call is commented out at ``:419``).
        """
        return _norm(t)

    def helper(self, f1, f2, c1, c2, shift: float,
               axis: Optional[str] = None) -> jnp.ndarray:
        fd = self.tensor_correlation(self.feat_transform(f1), self.feat_transform(f2))
        if self.pointwise:
            fd = _pointwise_recenter(fd, axis)
        fd = jax.lax.stop_gradient(fd)  # reference computes fd under no_grad (:312)

        cd = self.tensor_correlation(_norm(c1), _norm(c2))
        if self.stabilize:
            cd = jnp.clip(cd, self._clamp_min(), 0.8)
        else:
            cd = jnp.clip(cd, self._clamp_min(), None)
        return -cd * (fd - shift)

    def helper_mean(self, f1, f2, c1, c2, shift: float,
                    axis: Optional[str] = None) -> jnp.ndarray:
        """``helper(...).mean()`` — the scalar the loss actually consumes.
        Subclasses may override with a fused evaluation that never
        materializes the [B,H,W,I,J] correlation tensors. ``axis``: shard
        axis when the batch dim is sharded (pointwise-recenter statistics go
        batch-global via pmean; the row mean stays per-row either way)."""
        return self.helper(f1, f2, c1, c2, shift, axis=axis).mean()

    def helper_mean_pair(self, f1, f2, c1a, c2a, c1b, c2b, shift: float,
                         axis: Optional[str] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Two ``helper_mean`` results over the SAME feature pair (f1, f2)
        with different code pairs — the SOS step's coarse/fine heads. Base
        implementation just evaluates twice; ``GeoCorrelationLoss`` overrides
        with a paired flash kernel that computes the shared fd side once."""
        return (self.helper_mean(f1, f2, c1a, c2a, shift, axis=axis),
                self.helper_mean(f1, f2, c1b, c2b, shift, axis=axis))

    def _helper_means_grouped(self, f1, f2, c1, c2,
                              shifts: Sequence[float],
                              axis: Optional[str] = None) -> jnp.ndarray:
        """``[helper_mean(f1_g, f2_g, c1_g, c2_g, shifts[g]) for g]`` over G
        groups stacked on the batch axis — one einsum/recenter chain instead
        of G (the SOS step's four appearance evaluations were each a
        separate XLA fusion group near the device launch floor). The
        pointwise-recenter statistics and the final mean are computed
        PER GROUP, so each entry equals its separate call (up to reduction-
        order rounding). ``axis``: shard axis for the batch-global means."""
        G = len(shifts)
        fd = self.tensor_correlation(self.feat_transform(f1),
                                     self.feat_transform(f2))
        fd = fd.reshape((G, -1) + fd.shape[1:])  # [G, B, H, W, I, J]
        if self.pointwise:
            old = _gmean_grouped(fd, axis)
            fd = fd - fd.mean(axis=(4, 5), keepdims=True)
            fd = fd + (old - _gmean_grouped(fd, axis)).reshape(
                (G,) + (1,) * (fd.ndim - 1))
        fd = jax.lax.stop_gradient(fd)
        cd = self.tensor_correlation(_norm(c1), _norm(c2))
        if self.stabilize:
            cd = jnp.clip(cd, self._clamp_min(), 0.8)
        else:
            cd = jnp.clip(cd, self._clamp_min(), None)
        cd = cd.reshape(fd.shape)
        sh = jnp.asarray(shifts, fd.dtype).reshape((G,) + (1,) * (fd.ndim - 1))
        t = -cd * (fd - sh)
        means = t.reshape(G, -1).mean(axis=1)
        return jax.lax.pmean(means, axis) if axis is not None else means

    def pair_heads(
        self,
        key0: jax.Array,
        key1: jax.Array,
        orig_feats: jnp.ndarray,   # [B, C, hf, wf] DINO patch features
        code0: jnp.ndarray,        # [B, sem, P, P] coarse-head logits
        code1: jnp.ndarray,        # fine-head logits
        sim_matrix: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``(self(key0, feats, code0, sim), self(key1, feats, code1, sim))``
        with the grid sampling and all four helper evaluations batched.

        The coordinate draws keep each call's exact RNG stream (same key
        splits); with sim-matrix argmin mining the negative index is
        key-independent and shared. Falls back to two calls when the
        negative draw is key-dependent."""
        if self.rand_neg or sim_matrix is None:
            return (self(key0, orig_feats, code0, sim_matrix),
                    self(key1, orig_feats, code1, sim_matrix))
        B = orig_feats.shape[0]
        shape = (B, self.feature_samples, self.feature_samples, 2)
        k1a, k2a, _ = jax.random.split(key0, 3)
        k1b, k2b, _ = jax.random.split(key1, 3)
        coords = jnp.concatenate([
            jax.random.uniform(k, shape) * 2.0 - 1.0
            for k in (k1a, k1b, k2a, k2b)])
        neg_idx = jnp.argmin(sim_matrix, axis=0)
        featn = orig_feats[neg_idx]
        fs = self.sample(jnp.concatenate([orig_feats, orig_feats,
                                          featn, featn]), coords)
        cs = self.sample(jnp.concatenate([code0, code1, code0[neg_idx],
                                          code1[neg_idx]]), coords)
        fa, fb, nfa, nfb = jnp.split(fs, 4)
        ca, cb, nca, ncb = jnp.split(cs, 4)
        m = self._helper_means_grouped(
            jnp.concatenate([fa, fb, fa, fb]),
            jnp.concatenate([fa, fb, nfa, nfb]),
            jnp.concatenate([ca, cb, ca, cb]),
            jnp.concatenate([ca, cb, nca, ncb]),
            (self.self_shift, self.self_shift,
             self.neg_shift, self.neg_shift))
        return (self.neg_weight * m[2] + self.self_weight * m[0],
                self.neg_weight * m[3] + self.self_weight * m[1])

    def negative_index(self, key: jax.Array, batch: int,
                       sim_matrix: Optional[jnp.ndarray]) -> jnp.ndarray:
        if self.rand_neg:
            return jax.random.permutation(key, batch)
        if sim_matrix is None:
            return super_perm(key, batch)
        return jnp.argmin(sim_matrix, axis=0)

    # -- forward ------------------------------------------------------------

    def __call__(
        self,
        key: jax.Array,
        orig_feats: jnp.ndarray,   # [B, C, hf, wf] DINO patch features
        orig_code: jnp.ndarray,    # [B, sem, P, P] rendered semantic logits
        sim_matrix: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        k_c1, k_c2, k_neg = jax.random.split(key, 3)
        B = orig_feats.shape[0]
        shape = (B, self.feature_samples, self.feature_samples, 2)
        coords1 = jax.random.uniform(k_c1, shape) * 2.0 - 1.0
        coords2 = jax.random.uniform(k_c2, shape) * 2.0 - 1.0

        feats = self.sample(orig_feats, coords1)
        code = self.sample(orig_code, coords1)

        neg_idx = self.negative_index(k_neg, B, sim_matrix)
        neg_feats = self.sample(orig_feats[neg_idx], coords2)
        neg_code = self.sample(orig_code[neg_idx], coords2)

        neg_loss = self.helper_mean(feats, neg_feats, code, neg_code, self.neg_shift)
        self_loss = self.helper_mean(feats, feats, code, code, self.self_shift)
        return self.neg_weight * neg_loss + self.self_weight * self_loss


@dataclasses.dataclass(frozen=True)
class GeoCorrelationLoss(CorrelationLoss):
    """Geometry correlation loss (reference ``utils/image.py:373-482``).

    ``geo_corr_params`` order matches ``app_corr_params``. No coordinate
    subsampling — the full P x P patch correlates against itself.
    """

    self_shift: float = 3.0
    neg_shift: float = 10.0
    max_depth: float = 15.0
    # Blockwise Pallas evaluation (ops/pallas/flash_corr.py): the whole-patch
    # pairwise fd/cd tensors are [B,P,P,P,P] (537 MB each at the flagship
    # 8x64x64) — the XLA path materializes them in HBM at ~32 ms/call on one
    # v5e; the flash kernel streams tiles through VMEM. Falls back to the XLA
    # path automatically for unsupported configs (non-pointwise, stabilize,
    # clamp != 0, or P*P not tileable by 128).
    use_flash: bool = True

    def feat_transform(self, t: jnp.ndarray) -> jnp.ndarray:
        """Identity: the geo kernel takes RAW XYZ points. Unit-normalizing 3-D
        scene points before an inverse-L1 distance would erase the depth
        magnitude the geometry loss exists to exploit (reference
        ``utils/image.py:418`` passes ``is_f=True`` raw; ``:419`` commented)."""
        return t

    def tensor_correlation(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Clamped inverse-L1 kernel (reference ``:404-413``)."""
        x = a[..., :, :, None, None]      # [N, C, H, W, 1, 1]
        y = b[:, :, None, None, :, :]     # [N, C, 1, 1, I, J]
        ret = jnp.abs(jnp.sum(jnp.abs(x - y), axis=1))
        ret = 1.0 / (ret + 5e-2)
        return jnp.minimum(ret, self.max_depth)

    @staticmethod
    def depth2pts(depth: jnp.ndarray, ray_o: jnp.ndarray, ray_d: jnp.ndarray) -> jnp.ndarray:
        """XYZ = o + d * depth, all [B, 3, P, P] (depth [B, 1, P, P])."""
        return ray_o + ray_d * depth

    def helper_mean(self, f1, f2, c1, c2, shift: float,
                    axis: Optional[str] = None) -> jnp.ndarray:
        from nerfsos_tpu.ops.pallas.flash_corr import flash_geo_helper_mean, flash_supported

        H, W = f1.shape[-2], f1.shape[-1]
        if (self.use_flash and self.pointwise and self.zero_clamp
                and not self.stabilize and flash_supported(H * W)):
            return flash_geo_helper_mean(f1, f2, _norm(c1), _norm(c2),
                                         shift, self.max_depth, axis=axis)
        return self.helper(f1, f2, c1, c2, shift, axis=axis).mean()

    def helper_mean_pair(self, f1, f2, c1a, c2a, c1b, c2b, shift: float,
                         axis: Optional[str] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from nerfsos_tpu.ops.pallas.flash_corr import (
            flash_geo_helper_mean_pair, flash_supported)

        H, W = f1.shape[-2], f1.shape[-1]
        if (self.use_flash and self.pointwise and self.zero_clamp
                and not self.stabilize and flash_supported(H * W)):
            return flash_geo_helper_mean_pair(
                f1, f2, _norm(c1a), _norm(c2a), _norm(c1b), _norm(c2b),
                shift, self.max_depth, axis=axis)
        return super().helper_mean_pair(f1, f2, c1a, c2a, c1b, c2b, shift,
                                        axis=axis)

    def _filtered_points(self, depth, batch_rays):
        ray_o, ray_d = batch_rays[0], batch_rays[1]
        # depth filter: values over max_depth clamp to the max value UNDER it,
        # computed over the whole batch (reference ``:455``).
        under = jnp.where(depth < self.max_depth, depth, -jnp.inf)
        depth = jnp.where(depth > self.max_depth, jnp.max(under), depth)
        return self.depth2pts(depth, ray_o, ray_d)

    def __call__(
        self,
        key: jax.Array,
        depth: jnp.ndarray,        # [B, 1, P, P] rendered depth
        orig_code: jnp.ndarray,    # [B, sem, P, P]
        batch_rays: Tuple[jnp.ndarray, jnp.ndarray],  # (ray_o, ray_d) [B, 3, P, P]
        sim_matrix: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        feats = self._filtered_points(depth, batch_rays)
        code = orig_code

        neg_idx = self.negative_index(key, feats.shape[0], sim_matrix)
        neg_feats = feats[neg_idx]
        neg_code = code[neg_idx]

        neg_loss = self.helper_mean(feats, neg_feats, code, neg_code, self.neg_shift)
        self_loss = self.helper_mean(feats, feats, code, code, self.self_shift)
        return self.neg_weight * neg_loss + self.self_weight * self_loss

    def pair(
        self,
        key0: jax.Array,
        key1: jax.Array,
        depth: jnp.ndarray,        # [B, 1, P, P] rendered depth (FINE, shared)
        code0: jnp.ndarray,        # [B, sem, P, P] coarse-head codes
        code1: jnp.ndarray,        # fine-head codes
        batch_rays: Tuple[jnp.ndarray, jnp.ndarray],
        sim_matrix: Optional[jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``(self(key0, depth, code0, ...), self(key1, depth, code1, ...))``
        computed with the point-side work shared.

        The SOS step applies the geometry loss to the coarse AND fine semantic
        heads against the SAME fine depth/rays (engines/sos.py; reference
        trainer ``:159-160``): the back-projected points, the depth filter and
        — when negatives come from the sim-matrix argmin — the negative index
        are bit-identical across the two calls, so the paired flash kernels
        evaluate the fd side once. Falls back to two independent calls when
        the negative draw is key-dependent (``rand_neg`` or no sim matrix —
        the keys then produce different permutations)."""
        if self.rand_neg or sim_matrix is None:
            return (self(key0, depth, code0, batch_rays, sim_matrix),
                    self(key1, depth, code1, batch_rays, sim_matrix))

        feats = self._filtered_points(depth, batch_rays)
        neg_idx = self.negative_index(key0, feats.shape[0], sim_matrix)
        neg_feats = feats[neg_idx]
        n0, n1, s0, s1 = self.quad(feats, neg_feats, code0, code0[neg_idx],
                                   code1, code1[neg_idx])
        return (self.neg_weight * n0 + self.self_weight * s0,
                self.neg_weight * n1 + self.self_weight * s1)

    def quad(self, feats, neg_feats, c0, c0_neg, c1, c1_neg,
             axis: Optional[str] = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(neg_coarse, neg_fine, self_coarse, self_fine) — the SOS step's
        four geometry helper_mean results. On the flash path all four ride
        ONE kernel group (the neg/self sweeps stacked on the batch axis on
        top of the round-3 coarse/fine fd pairing): 3 pallas sweeps per step
        instead of 6, bit-equal sums. Falls back to the paired evaluation
        otherwise."""
        from nerfsos_tpu.ops.pallas.flash_corr import (
            flash_geo_pair_quad, flash_supported)

        H, W = feats.shape[-2], feats.shape[-1]
        if (self.use_flash and self.pointwise and self.zero_clamp
                and not self.stabilize and flash_supported(H * W)):
            return flash_geo_pair_quad(
                feats, neg_feats, _norm(c0), _norm(c0_neg), _norm(c1),
                _norm(c1_neg), self.neg_shift, self.self_shift,
                self.max_depth, axis=axis)
        n0, n1 = self.helper_mean_pair(feats, neg_feats, c0, c0_neg,
                                       c1, c1_neg, self.neg_shift, axis=axis)
        s0, s1 = self.helper_mean_pair(feats, feats, c0, c0, c1, c1,
                                       self.self_shift, axis=axis)
        return n0, n1, s0, s1


def simclr_contrastive(emb_i: jnp.ndarray, emb_j: jnp.ndarray,
                       temperature: float = 0.5) -> jnp.ndarray:
    """SimCLR NT-Xent loss over paired embeddings.

    Parity: reference ``ContrastiveLossELI5`` (``utils/image.py:221-259``;
    carries a live debugger break upstream and is unused in the main path) —
    vectorized instead of the per-pair Python loop.
    """
    zi = emb_i / _safe_norm(emb_i, -1, 1e-12)
    zj = emb_j / _safe_norm(emb_j, -1, 1e-12)
    z = jnp.concatenate([zi, zj], axis=0)  # [2N, D]
    sim = get_similarity_matrix(z) / temperature
    n = emb_i.shape[0]
    logits = jnp.where(jnp.eye(2 * n, dtype=bool), -jnp.inf, sim)
    pos_idx = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
    log_prob = logits - jax.nn.logsumexp(logits, axis=1, keepdims=True)
    return -jnp.mean(log_prob[jnp.arange(2 * n), pos_idx])


def nerf_contrastive(embeddings: jnp.ndarray) -> jnp.ndarray:
    """min/max CLS cosine contrast: -log(max / (max + min)) over off-diagonal
    pairs (reference ``utils/image.py:192-218``, ``NeRFContrastive``)."""
    B = embeddings.shape[0]
    sim = get_similarity_matrix(embeddings)
    off = ~jnp.eye(B, dtype=bool)
    lo = jnp.min(jnp.where(off, sim, jnp.inf))
    hi = jnp.max(jnp.where(off, sim, -jnp.inf))
    return -jnp.log(hi / (hi + lo))
