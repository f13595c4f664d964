"""On-chip check + perf for the fully-fused render kernels (fused_render.py).

1. Parity of the fused eval render vs a CPU fp32 golden (flagship dims,
   small ray count) — the verify-skill rule: interpret-mode tests cannot
   catch Mosaic/on-chip bugs.
2. End-to-end eval render timing at 65536 rays vs the round-2 path.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 2400 python tools/perf_fused_render.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=6, warmup=2):
    def run(n):
        acc = 0.0
        for _ in range(n):
            acc = acc + jnp.sum(fn(*args))
        return float(acc)

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    return (time.perf_counter() - t0) / iters


def main():
    log("backend:", jax.default_backend(), jax.devices())

    # ---- parity: flagship dims, 64 rays, on-chip vs CPU fp32 golden ------
    cfg = NeRFConfig(n_samples=64, n_importance=128, use_semantics=True,
                     sem_with_coord=True, ray_block=65536, remat=False,
                     compute_dtype="bfloat16", fused_field=True)
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))

    render = jax.jit(lambda p, r: net(p, r, (1.2, 14.72), train=False,
                                      coarse_outputs=False))
    got = {k: np.asarray(v) for k, v in render(params, rays).items()}

    # CPU fp32 interpret golden from a subprocess (the parent's backend is
    # pinned to the axon TPU; interpret-mode resolution follows it)
    import pickle
    import subprocess

    with open("/tmp/fused_golden_in.pkl", "wb") as f:
        pickle.dump({"params": jax.device_get(params),
                     "rays": np.asarray(rays)}, f)
    child = r'''
import pickle, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
blob = pickle.load(open("/tmp/fused_golden_in.pkl", "rb"))
cfg = NeRFConfig(n_samples=64, n_importance=128, use_semantics=True,
                 sem_with_coord=True, ray_block=65536, remat=False,
                 compute_dtype="float32", fused_field=True)
net = NeRFNet(cfg)
out = net(blob["params"], jnp.asarray(blob["rays"]), (1.2, 14.72),
          train=False, coarse_outputs=False)
np.savez("/tmp/fused_golden_out.npz", **{k: np.asarray(v) for k, v in out.items()})
from nerfsos_tpu.ops.pallas import fused_render as fr
R, S = 64, 192
z_sorted = jnp.sort(jax.random.uniform(jax.random.PRNGKey(5), (R, S)) * 13.5 + 1.2, axis=-1)
o, d = jnp.asarray(blob["rays"])[0], jnp.asarray(blob["rays"])[1]
v = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
odv = jnp.concatenate([o, d, v], axis=1)
fparams = {"mlp": blob["params"]["fine"]["mlp"]}
maps, w = fr.fused_render_planar(fparams, odv, z_sorted, cfg)
wc = fr.fused_coarse_weights_planar({"mlp": blob["params"]["coarse"]["mlp"]},
                                    odv[:, :6], z_sorted, cfg)
np.savez("/tmp/fused_golden_finez.npz", maps=np.asarray(maps), w=np.asarray(w),
         coarse_w=np.asarray(wc))
'''
    subprocess.run([sys.executable, "-c", child], check=True)
    want = dict(np.load("/tmp/fused_golden_out.npz"))
    failures = []
    for k in want:
        a, b = got[k], want[k]
        denom = np.abs(b).max() + 1e-9
        rel = np.abs(a - b) / denom
        log(f"parity[{k}]: max rel {rel.max():.2e}  p99 {np.percentile(rel, 99):.2e}"
            f"  p50 {np.percentile(rel, 50):.2e}")
        # Report-only: the bulk must sit at the bf16-matmul level (p50), but
        # individual rays can be far off — a bf16-level change in a coarse
        # weight flips an inverse-CDF bin for a u at a boundary and moves
        # that ray's fine samples (expected pipeline discreteness, not a
        # kernel bug; disp additionally amplifies via 1/depth). The HARD
        # gates are the fixed-z checks below (no CDF in front).
        if k not in ("z_std",) and np.percentile(rel, 50) >= 5e-3:
            failures.append((k, "p50", float(np.percentile(rel, 50))))

    # ---- fixed-z fine-pass parity (isolates the kernel from the CDF) -----
    from nerfsos_tpu.ops.pallas import fused_render as fr

    R, S = 64, 192
    z_sorted = jnp.sort(jax.random.uniform(jax.random.PRNGKey(5), (R, S))
                        * 13.5 + 1.2, axis=-1)
    o, d = rays[0], rays[1]
    v = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    odv = jnp.concatenate([o, d, v], axis=1)
    fparams = {"mlp": params["fine"]["mlp"]}
    maps_chip, w_chip = jax.jit(
        lambda p, a, z: fr.fused_render_planar(p, a, z, cfg))(fparams, odv, z_sorted)
    wc_chip = jax.jit(
        lambda p, a, z: fr.fused_coarse_weights_planar(p, a, z, cfg))(
        {"mlp": params["coarse"]["mlp"]}, odv[:, :6], z_sorted)
    gz = np.load("/tmp/fused_golden_finez.npz")
    for name, a, b in (("maps", np.asarray(maps_chip), gz["maps"]),
                       ("w", np.asarray(w_chip), gz["w"]),
                       ("coarse_w", np.asarray(wc_chip), gz["coarse_w"])):
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        log(f"fixed-z parity[{name}]: max rel {rel:.2e}")
        if rel >= 2e-2:
            failures.append((name, "fixed-z", float(rel)))

    # ---- perf: 65536-ray eval render -------------------------------------
    n = 65536
    big = jax.random.normal(jax.random.PRNGKey(2), (2, n, 3))
    render_rgb = jax.jit(lambda p, r: net(p, r, (1.2, 14.72), train=False,
                                          coarse_outputs=False)["rgb"])
    dt = time_fn(render_rgb, params, big, iters=6)
    log(f"fused render: {dt*1e3:.1f} ms / {n} rays = {n/dt:,.0f} rays/s")

    if "--profile" in sys.argv:
        td = "/tmp/fused_render_trace"
        with jax.profiler.trace(td):
            for _ in range(3):
                float(jnp.sum(render_rgb(params, big)))
        log("trace:", td)

    if failures:
        log("PARITY FAILURES:", failures)
        sys.exit(1)
    log("parity gates: PASS")


if __name__ == "__main__":
    main()
