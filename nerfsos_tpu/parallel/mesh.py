"""Device mesh + sharding helpers (data-parallel ray sharding over ICI).

The reference is single-process/single-GPU (``run_nerf.py:255``; SURVEY.md
§2.5) — this module is the TPU-native scaling story that replaces nothing but
enables pods: a 1-D ``data`` mesh, ray/patch batches sharded along it, params
replicated. Gradients are reduced by XLA-inserted ``psum`` over ICI — no
explicit collectives in user code (GSPMD partitioning via jit shardings).

Multi-host extension: call ``jax.distributed.initialize()`` before building
the mesh; everything below is host-count agnostic. Executable proof:
``tools/dryrun_multihost.py`` (2-process CPU cluster, one DP train step in
both gspmd and shard_map modes; run by ``tests/test_multihost.py``). The one
extra piece multi-host user code needs is assembling global arrays with
``jax.make_array_from_callback`` — see that script's ``globalize``.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, batch_axis: int = 0, ndim: int = 1) -> NamedSharding:
    """Shard axis ``batch_axis`` of an ndim-array over the data axis."""
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_pytree_replicated(mesh: Mesh, tree: Any) -> Any:
    """Place every leaf replicated on the mesh."""
    s = replicated(mesh)
    return jax.device_put(tree, s)


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k
