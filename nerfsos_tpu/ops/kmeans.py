"""Jittable Lloyd's k-means for segmentation clustering.

The reference clusters per-pixel semantic logits with sklearn
``KMeans(n_clusters=2, random_state=0)`` on the CPU inside the train/eval
loops (``utils/misc.py:40-53``) — a device->host sync per call. This is a
fixed-iteration JAX implementation that runs in-graph; cluster LABELS are
arbitrary in both (ARI is permutation-invariant, and the eval-time
foreground flip re-orients them — ``engines/eval.py:133-144``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def kmeans(key: jax.Array, x: jnp.ndarray, k: int, iters: int = 25) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster rows of x [N, C] into k clusters.

    Returns (labels [N] int32, centroids [k, C]).
    Init: k-means++-style greedy farthest-point seeding from a keyed start
    (deterministic given the key).
    """
    N = x.shape[0]

    # seeding: first center random, rest = farthest point from chosen set
    first = jax.random.randint(key, (), 0, N)
    centroids0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def seed_body(i, cents):
        d = jnp.min(
            jnp.sum((x[:, None, :] - cents[None, :, :]) ** 2, -1)
            + jnp.where(jnp.arange(k) < i, 0.0, jnp.inf)[None, :],
            axis=1,
        )
        return cents.at[i].set(x[jnp.argmax(d)])

    centroids = jax.lax.fori_loop(1, k, seed_body, centroids0)

    def lloyd(carry, _):
        cents = carry
        d = jnp.sum((x[:, None, :] - cents[None, :, :]) ** 2, -1)  # [N, k]
        labels = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # [N, k]
        counts = one_hot.sum(0)[:, None]  # [k, 1]
        sums = one_hot.T @ x  # [k, C]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), cents)
        return new, None

    centroids, _ = jax.lax.scan(lloyd, centroids, None, length=iters)
    labels = jnp.argmin(jnp.sum((x[:, None, :] - centroids[None, :, :]) ** 2, -1), axis=1)
    return labels.astype(jnp.int32), centroids


def segmap_cluster(x: jnp.ndarray, n_clusters: int = 2,
                   key: jax.Array | None = None) -> jnp.ndarray:
    """Cluster an [H, W, C] logit map -> [H, W, 1] labels.

    API parity with the reference ``utils/misc.py:40-53`` (sklearn KMeans
    seed 0 there; a fixed key here).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    H, W, C = x.shape
    labels, _ = kmeans(key, x.reshape(-1, C), n_clusters)
    return labels.reshape(H, W, 1)
