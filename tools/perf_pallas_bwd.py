"""TPU check of the fused Pallas backward: parity (bf16, loose tol) + train perf.

Run: PYTHONPATH=$PYTHONPATH:/root/repo python tools/perf_pallas_bwd.py
"""
import sys
import time
import traceback

import jax
import jax.numpy as jnp

N_RAYS = 16384


def log(*a):
    print(*a, flush=True)


def time_fn(fn, *args, iters=4, warmup=1):
    def run(n):
        acc = 0.0
        for _ in range(n):
            acc = acc + jnp.sum(fn(*args))
        return float(acc)

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    return (time.perf_counter() - t0) / iters


def parity():
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
    from nerfsos_tpu.ops.pallas import fused_field as ff

    cfg = NeRFConfig(n_samples=8, n_importance=0, use_semantics=True,
                     sem_with_coord=True, ray_block=256, compute_dtype="bfloat16")
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    mlp = params["coarse"]["mlp"]
    ws, bs = ff._flatten_mlp_params(mlp, 8, True)
    pts = jax.random.normal(jax.random.PRNGKey(1), (512, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (512, 3))
    g = jax.random.normal(jax.random.PRNGKey(3), (512, 6))

    ref = jax.jit(lambda: ff._xla_bwd(8, (4,), 10, 4, True, True,
                                      (tuple(ws), tuple(bs), (pts, dirs)), g))()
    got = jax.jit(lambda: ff._fused_backward(tuple(ws), tuple(bs), (pts, dirs), g,
                                             8, (4,), 10, 4, True, True,
                                             "bfloat16"))()
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        worst = max(worst, float(jnp.max(jnp.abs(a - b))) / scale)
    log(f"pallas bwd bf16 parity: worst rel err {worst:.3e}")


def train_perf(remat: bool):
    from nerfsos_tpu.engines.state import TrainState, make_optimizer
    from nerfsos_tpu.engines.trainer import make_rgb_train_step
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet

    cfg = NeRFConfig(
        n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
        ray_block=N_RAYS, remat=remat, compute_dtype="bfloat16", fused_field=True,
    )
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, make_optimizer(5e-4))
    step = make_rgb_train_step(net, 1.2, 14.72, donate=False)
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, N_RAYS, 3))
    batch = {"rays": rays, "target": jnp.zeros((N_RAYS, 3)),
             "masks": jnp.zeros((N_RAYS, 1))}

    def train_once(s, b, k):
        new_s, _ = step(s, b, k)
        return new_s.params["coarse"]["mlp"]["rgb_linear"]["kernel"]

    dt = time_fn(train_once, state, batch, jax.random.PRNGKey(2))
    log(f"train[pallas-vjp remat={remat}]: {dt*1e3:.1f} ms = {N_RAYS/dt:,.0f} rays/s")


def main():
    log(f"backend: {jax.default_backend()}")
    for fn, a in [(parity, ()), (train_perf, (False,)), (train_perf, (True,))]:
        try:
            fn(*a)
        except Exception:
            log(f"{fn.__name__}{a} FAILED:\n{traceback.format_exc(limit=3)}")


if __name__ == "__main__":
    main()
