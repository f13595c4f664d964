"""Block-target re-sweep after the one-hot-dot epilogue (fused_render.py).

The round-3-close epilogue replaced the per-ray -> per-point broadcast madds
(~2.2k vreg-ops per 4608-pt eval block) with exact one-hot MXU dots and moved
the viewdirs PE to per-ray width. That changes each block's VPU/VMEM cost
profile, so the measured block rules (eval 4608 / train 1024 / mip 1536 —
CLAUDE.md "Perf state") need re-measuring, including sizes the old epilogue
rejected or lost on.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 3000 python tools/perf_epilogue_sweep.py
"""
import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from nerfsos_tpu.models.mip import MipNeRFNet
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from nerfsos_tpu.ops.pallas import fused_render as fr


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sweep(name, render, params, n_rays, targets, knob):
    best = None
    for t in targets:
        setattr(fr, knob, t)
        try:
            f = jax.jit(render)
            dt = bench.time_fn(f, params, iters=4)
            rps = n_rays / dt
            log(f"{name} target_n={t}: {dt*1e3:.1f} ms = {rps:,.0f} rays/s")
            if best is None or rps > best[1]:
                best = (t, rps)
        except Exception:
            log(f"{name} target_n={t}: FAILED\n{traceback.format_exc(limit=2)}")
    return best


def main():
    log("backend:", jax.default_backend(), jax.devices())

    # ---- eval render (flagship classic) ------------------------------------
    R = 65536
    cfg = NeRFConfig(
        n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
        ray_block=R, remat=False, compute_dtype="bfloat16", fused_field=True,
    )
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, R, 3))

    def render(p):
        return net(p, rays, (1.2, 14.72), train=False, coarse_outputs=False)["rgb"]

    default_eval = fr._EVAL_TARGET_N
    best = sweep("eval", render, params, R, (3072, 4608, 6144, 9216),
                 "_EVAL_TARGET_N")
    fr._EVAL_TARGET_N = default_eval
    log(f"eval best: {best}")

    # ---- mip eval (module-local 1536 target is a literal; sweep via the
    # shared knob only informs — the mip block rule lives at
    # fused_render.py:1116 and must be edited if a bigger block wins) -------
    n = 16384
    mcfg = NeRFConfig(n_samples=64, n_importance=128, multires=10,
                      multires_views=4, ray_block=n, remat=False,
                      compute_dtype="bfloat16", fused_field=True)
    mnet = MipNeRFNet(mcfg)
    mparams = mnet.init(jax.random.PRNGKey(0))
    mrays = jax.random.normal(jax.random.PRNGKey(1), (2, n, 3))

    def mrender(p):
        return mnet(p, mrays, (1.2, 14.72), 0.001, train=False)["rgb"]

    best = sweep("mip", mrender, mparams, n, (1536, 2048, 3072, 4608),
                 "_MIP_TARGET_N") if hasattr(fr, "_MIP_TARGET_N") else None
    log(f"mip best: {best}")

    # ---- train (grad path) --------------------------------------------------
    from nerfsos_tpu.engines.state import TrainState, make_optimizer
    from nerfsos_tpu.engines.trainer import make_rgb_train_step

    N = 16384
    tcfg = NeRFConfig(
        n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
        ray_block=N, remat=False, compute_dtype="bfloat16", fused_field=True,
    )
    tnet = NeRFNet(tcfg)
    tparams = tnet.init(jax.random.PRNGKey(0))
    state = TrainState.create(tparams, make_optimizer(5e-4))
    step = make_rgb_train_step(tnet, 1.2, 14.72, donate=False)
    trays = jax.random.normal(jax.random.PRNGKey(1), (2, N, 3))
    batch = {"rays": trays, "target": jnp.zeros((N, 3)),
             "masks": jnp.zeros((N, 1))}
    key = jax.random.PRNGKey(2)

    def train_once(s):
        # Touch EVERY updated leaf: fetching a single coarse param lets XLA
        # dead-code-eliminate the fine backward pallas_call entirely (the
        # fine loss never feeds coarse grads — z is detached), which made an
        # earlier version of this sweep time a partial step (34 ms vs the
        # real ~116 ms at N=16384).
        new_s, _ = step(s, batch, key)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(new_s.params))

    default_train = fr._TRAIN_TARGET_N
    best = sweep("train", train_once, state, N, (1024, 1536, 2048),
                 "_TRAIN_TARGET_N")
    fr._TRAIN_TARGET_N = default_train
    log(f"train best: {best}")


if __name__ == "__main__":
    main()
