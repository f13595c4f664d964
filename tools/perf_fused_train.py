"""On-chip check + perf for the fused TRAIN render (fused_render.py).

1. Gradient parity of the full RGB train-step gradient vs a CPU fp32
   interpret golden (small batch, flagship dims, noise=0).
2. Train-step timing at 16384 rays; TRAIN_RAY_BLOCK sweep.
3. Noise smoke: loss finite & step time with raw_noise_std=1.0.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 3000 python tools/perf_fused_train.py
"""
import pickle
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from nerfsos_tpu.engines.state import TrainState, make_optimizer
from nerfsos_tpu.engines.trainer import make_rgb_train_step
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from nerfsos_tpu.ops.pallas import fused_render as fr


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=4, warmup=2):
    def run(n):
        acc = 0.0
        for _ in range(n):
            acc = acc + jnp.sum(fn(*args))
        return float(acc)

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    return (time.perf_counter() - t0) / iters


r_childz = r"""
import pickle, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from nerfsos_tpu.models.nerf import NeRFConfig
from nerfsos_tpu.ops.pallas import fused_render as fr
b = pickle.load(open("/tmp/ftz_in.pkl", "rb"))
cfg = NeRFConfig(n_samples=64, n_importance=128, use_semantics=True,
                 sem_with_coord=True, ray_block=16384, remat=False,
                 fused_field=True, compute_dtype="float32")
odv, z, tgt = map(jnp.asarray, (b["odv"], b["z"], b["tgt"]))
def zloss(p):
    maps, w = fr.fused_train_render_planar(p, odv, z, cfg, depth=cfg.netdepth_fine)
    return (jnp.mean((maps[:, 0:3] - tgt) ** 2) + 0.1 * jnp.mean(maps ** 2)
            + 0.05 * jnp.mean(w ** 2))
g = jax.grad(zloss)(b["fparams"])
flat = {"/".join(str(x) for x in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(g)[0]}
np.savez("/tmp/ftz_golden.npz", **flat)
"""

CFG = dict(n_samples=64, n_importance=128, use_semantics=True,
           sem_with_coord=True, ray_block=16384, remat=False,
           fused_field=True)


def grad_parity():
    cfg = NeRFConfig(compute_dtype="bfloat16", **CFG)
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    R = 64
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, R, 3))
    tgt = jax.random.uniform(jax.random.PRNGKey(2), (R, 3))

    def loss(p):
        out = net(p, rays, (1.2, 14.72), train=False)
        return (jnp.mean((out["rgb"] - tgt) ** 2)
                + jnp.mean((out["rgb0"] - tgt) ** 2)
                + 0.1 * jnp.mean(out["semantics"] ** 2))

    g = jax.jit(jax.grad(loss))(params)
    with open("/tmp/ft_in.pkl", "wb") as f:
        pickle.dump({"params": jax.device_get(params), "rays": np.asarray(rays),
                     "tgt": np.asarray(tgt)}, f)
    child = r'''
import pickle, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
b = pickle.load(open("/tmp/ft_in.pkl", "rb"))
cfg = NeRFConfig(n_samples=64, n_importance=128, use_semantics=True,
                 sem_with_coord=True, ray_block=16384, remat=False,
                 fused_field=True, compute_dtype="float32")
net = NeRFNet(cfg)
rays, tgt = jnp.asarray(b["rays"]), jnp.asarray(b["tgt"])
def loss(p):
    out = net(p, rays, (1.2, 14.72), train=False)
    return (jnp.mean((out["rgb"] - tgt) ** 2)
            + jnp.mean((out["rgb0"] - tgt) ** 2)
            + 0.1 * jnp.mean(out["semantics"] ** 2))
g = jax.grad(loss)(b["params"])
flat = {"/".join(str(x) for x in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(g)[0]}
np.savez("/tmp/ft_golden.npz", **flat)
'''
    subprocess.run([sys.executable, "-c", child], check=True)
    want = dict(np.load("/tmp/ft_golden.npz"))
    bad = 0
    for path, v in jax.tree_util.tree_flatten_with_path(g)[0]:
        k = "/".join(str(x) for x in path)
        a, b = np.asarray(v), want[k]
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        if rel > 3e-2:
            log(f"  grad parity FAIL {k}: {rel:.2e}")
            bad += 1
    log(f"grad parity vs CPU fp32: {'PASS' if bad == 0 else f'{bad} FAILS'} "
        f"(tol 3e-2, bf16 chain + CDF flips)")

    # fixed-z gradient parity: no CDF in the chain -> must be uniformly at
    # the bf16-matmul level
    z_sorted = jnp.sort(jax.random.uniform(jax.random.PRNGKey(5), (R, 192))
                        * 13.5 + 1.2, axis=-1)
    o, d = rays[0], rays[1]
    v = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    odv = jnp.concatenate([o, d, v], axis=1)
    fparams = {"mlp": params["fine"]["mlp"]}

    def zloss(p):
        maps, w = fr.fused_train_render_planar(p, odv, z_sorted, cfg,
                                               depth=cfg.netdepth_fine)
        return (jnp.mean((maps[:, 0:3] - tgt) ** 2) + 0.1 * jnp.mean(maps ** 2)
                + 0.05 * jnp.mean(w ** 2))

    gz = jax.jit(jax.grad(zloss))(fparams)
    with open("/tmp/ftz_in.pkl", "wb") as f:
        pickle.dump({"fparams": jax.device_get(fparams),
                     "odv": np.asarray(odv), "z": np.asarray(z_sorted),
                     "tgt": np.asarray(tgt)}, f)
    child2 = r_childz
    subprocess.run([sys.executable, "-c", child2], check=True)
    wantz = dict(np.load("/tmp/ftz_golden.npz"))
    badz = 0
    for path, vv in jax.tree_util.tree_flatten_with_path(gz)[0]:
        k = "/".join(str(x) for x in path)
        a, b = np.asarray(vv), wantz[k]
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        if rel > 2e-2:
            log(f"  fixed-z grad FAIL {k}: {rel:.2e}")
            badz += 1
    log(f"fixed-z grad parity: {'PASS' if badz == 0 else f'{badz} FAILS'} (tol 2e-2)")
    return bad == 0 and badz == 0


def bench_step(noise_std=0.0, iters=4):
    cfg = NeRFConfig(compute_dtype="bfloat16",
                     raw_noise_std=noise_std, **CFG)
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, make_optimizer(5e-4))
    step = make_rgb_train_step(net, 1.2, 14.72, donate=False)
    n = 16384
    batch = {"rays": jax.random.normal(jax.random.PRNGKey(1), (2, n, 3)),
             "target": jnp.zeros((n, 3)), "masks": jnp.zeros((n, 1))}

    def train_once(s, b, k):
        # Touch every leaf — a single coarse param lets XLA DCE the fine
        # backward pallas_call (partial-step timing; see bench.py).
        new_s, m = step(s, b, k)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(new_s.params))

    dt = time_fn(train_once, state, batch, jax.random.PRNGKey(2), iters=iters)
    log(f"train[noise={noise_std}, r_blk={fr.TRAIN_RAY_BLOCK or 8}]: "
        f"{dt*1e3:.1f} ms / {n} rays = {n/dt:,.0f} rays/s")
    return n / dt


def main():
    log("backend:", jax.default_backend(), jax.devices())
    ok = grad_parity()
    for rb in (8, 16):
        fr.TRAIN_RAY_BLOCK = rb
        try:
            bench_step(0.0)
        except Exception as e:
            log(f"r_blk={rb} FAIL: {str(e)[:200]}")
    fr.TRAIN_RAY_BLOCK = None
    try:
        bench_step(1.0)
    except Exception as e:
        log(f"noise step FAIL: {str(e)[:200]}")
    if "--profile" in sys.argv:
        td = "/tmp/fused_train_trace"
        cfg = NeRFConfig(compute_dtype="bfloat16", **CFG)
        net = NeRFNet(cfg)
        params = net.init(jax.random.PRNGKey(0))
        state = TrainState.create(params, make_optimizer(5e-4))
        step = make_rgb_train_step(net, 1.2, 14.72, donate=False)
        n = 16384
        batch = {"rays": jax.random.normal(jax.random.PRNGKey(1), (2, n, 3)),
                 "target": jnp.zeros((n, 3)), "masks": jnp.zeros((n, 1))}
        s1, _ = step(state, batch, jax.random.PRNGKey(2))  # warm-up compile
        float(jnp.sum(s1.params["coarse"]["mlp"]["rgb_linear"]["kernel"]))
        with jax.profiler.trace(td):
            for _ in range(3):
                s2, _ = step(state, batch, jax.random.PRNGKey(2))
                float(jnp.sum(s2.params["coarse"]["mlp"]["rgb_linear"]["kernel"]))
        log("trace:", td)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
