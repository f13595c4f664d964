"""One-off TPU experiment: train-step time across remat/fused variants.

Run:  python tools/perf_train_variants.py  (expects the real TPU backend)

Round-1 state: train (remat=True, XLA field) = 433 ms / 16384 rays; the
remat=False backward tripped a libtpu regalloc RET_CHECK. This measures all
four remat x fused combinations (each compile is remote, minutes) to pick the
production train path.
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


def build(remat: bool, fused: bool):
    from nerfsos_tpu.engines.state import TrainState, make_optimizer
    from nerfsos_tpu.engines.trainer import make_rgb_train_step
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet

    cfg = NeRFConfig(
        n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
        ray_block=N_RAYS, remat=remat, compute_dtype="bfloat16", fused_field=fused,
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

    return train_once, (state, batch, jax.random.PRNGKey(2))


def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    for remat in (False, True):
        for fused in (False, True):
            tag = f"remat={remat} fused={fused}"
            try:
                fn, args = build(remat, fused)
                dt = time_fn(fn, *args)
                log(f"train[{tag}]: {dt*1e3:.1f} ms = {N_RAYS/dt:,.0f} rays/s")
            except Exception:
                log(f"train[{tag}] FAILED:\n{traceback.format_exc(limit=3)}")


if __name__ == "__main__":
    main()
