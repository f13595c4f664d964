"""shard_map-vs-unsharded EXACT parity on the real chip (VERDICT r4 #3 rigor).

tools/perf_frozen_ab.py's [SMOKE] ran the shard_map production program on a
1-device mesh (compiles + steps, +1.7 ms overhead) but its parity arm used
the flagship cfg's perturb=1.0 — the sharded path folds the render key with
the shard index (engines/sos.py), so stochastic draws differ and the 1e-3
post-step param delta is the DOCUMENTED different-but-valid-draws behavior,
not evidence about kernel correctness. This script pins perturb=0 (the
deterministic contract under which sos_loss_fn promises exact equality) and
asserts bit-level post-update param parity through the REAL Mosaic toolchain.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 2000 \
       python tools/onchip_sm_parity.py 2>&1 | tee /tmp/sm_parity.log
"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, "/root/repo")

from nerfsos_tpu.engines.sos import SOSConfig, make_sos_train_step
from nerfsos_tpu.engines.state import TrainState, make_optimizer
from nerfsos_tpu.losses.correlation import CorrelationLoss, GeoCorrelationLoss
from nerfsos_tpu.models.extractor import VitExtractor
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    B, P, stride = 8, 64, 6
    N = B * P * P
    cfg = NeRFConfig(
        n_samples=64, n_importance=128, use_semantics=True,
        sem_with_coord=True, ray_block=N, remat=False,
        compute_dtype="bfloat16", fused_field=True, perturb=0.0,
    )
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    ext = VitExtractor("dino_vits16", dtype=jnp.bfloat16)
    dino_params = ext.init(jax.random.PRNGKey(1))
    sos_cfg = SOSConfig(batch_size=B, patch_size=P, patch_stride=stride,
                        fix_backbone=True)
    app = CorrelationLoss.from_params([0.18, 1, 0.46, 1], use_sim_matrix=True)
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=True)
    state = TrainState.create(
        params, make_optimizer(5e-4, fix_backbone=True, params=params))
    rays = jax.random.normal(jax.random.PRNGKey(2), (2, N, 3))
    batch = {"rays": rays, "target": jnp.zeros((N, 3)),
             "masks": jnp.zeros((N, 1))}
    key = jax.random.PRNGKey(3)

    step = make_sos_train_step(net, ext, app, geo, sos_cfg, 1.2, 14.72,
                               donate=False)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    step_sm = make_sos_train_step(net, ext, app, geo, sos_cfg, 1.2, 14.72,
                                  mesh=mesh, donate=False, spmd="shard_map")

    s_ref, m_ref = step(state, dino_params, batch, key)
    s_sm, m_sm = step_sm(state, dino_params, batch, key)
    jax.block_until_ready((s_ref, s_sm))
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_sm.params)):
        worst = max(worst, float(jnp.max(jnp.abs(a - b))))
    res = {"param_maxdiff": worst,
           "loss_ref": float(m_ref["loss"]), "loss_sm": float(m_sm["loss"]),
           "bit_equal": worst == 0.0}
    log(f"perturb=0 parity: max|sm-ref| = {worst:.3e} "
        f"(loss ref {res['loss_ref']:.6f} sm {res['loss_sm']:.6f})")
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
