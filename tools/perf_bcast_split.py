"""On-chip A/B of the fused-render broadcast-epilogue lowering.

``fused_render._BCAST_MODE``:
  "highest" — round-3: separate precision=HIGHEST transpose/broadcast dots
              per grid step (multi-pass MXU micro-dots).
  "split"   — round-4: ONE default-precision transpose dot + ONE
              default-precision broadcast dot over exact 3-way bf16 operand
              splits. Designed BIT-EQUAL (see fused_render._split3).

This tool verifies the bit-equality claim ON CHIP (interpret mode cannot —
default-precision Mosaic dots only bf16-round on real hardware) and measures
the throughput delta same-session for: eval render, full-parity render,
train step (loss-in-kernel RGB), SOS-shape fwd+bwd, mip render.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 3000 python tools/perf_bcast_split.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from nerfsos_tpu.ops.pallas import fused_render as fr


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=5, warmup=2):
    def run(n):
        acc = 0.0
        for _ in range(n):
            acc = acc + jnp.sum(fn(*args))
        return float(acc)

    run(warmup)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run(iters)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    log("backend:", jax.default_backend(), jax.devices())
    cfg = NeRFConfig(n_samples=64, n_importance=128, use_semantics=True,
                     sem_with_coord=True, ray_block=65536, remat=False,
                     compute_dtype="bfloat16", fused_field=True)
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))

    R, S = 256, 192
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, R, 3))
    o, d = rays[0], rays[1]
    v = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    odv = jnp.concatenate([o, d, v], axis=1)
    z = jnp.sort(jax.random.uniform(jax.random.PRNGKey(5), (R, S)) * 13.5
                 + 1.2, axis=-1)
    fparams = {"mlp": params["fine"]["mlp"]}
    cparams = {"mlp": params["coarse"]["mlp"]}
    gt = jax.random.uniform(jax.random.PRNGKey(6), (R, 3))
    dmaps = jax.random.normal(jax.random.PRNGKey(7), (R, 7))
    dw = jax.random.normal(jax.random.PRNGKey(8), (R, S))

    def run_all():
        """Every kernel family once, jitted fresh (the mode flag is read at
        trace time)."""
        outs = {}
        m, w = jax.jit(lambda p, a, zz: fr.fused_render_planar(p, a, zz, cfg))(
            fparams, odv, z)
        outs["eval_maps"], outs["eval_w"] = np.asarray(m), np.asarray(w)
        wc = jax.jit(lambda p, a, zz: fr.fused_coarse_weights_planar(
            p, a, zz, cfg))(cparams, odv[:, :6], z)
        outs["coarse_w"] = np.asarray(wc)

        def train_fwd_bwd(p, a, zz, dm, dwt):
            out, vjp = jax.vjp(
                lambda pp: fr.fused_train_render_planar(pp, a, zz, cfg), p)
            (dp,) = vjp((dm, dwt))
            return out, dp

        (tm, tw), dp = jax.jit(train_fwd_bwd)(fparams, odv, z, dmaps, dw)
        outs["train_maps"], outs["train_w"] = np.asarray(tm), np.asarray(tw)
        for k, lv in jax.tree_util.tree_leaves_with_path(dp):
            outs["grad" + jax.tree_util.keystr(k)] = np.asarray(lv)

        g, rm, rw = jax.jit(lambda p, a, zz, y: fr.fused_rgb_train_grads(
            p, a, zz, y, cfg))(fparams, odv, z, gt)
        outs["rgb_maps"], outs["rgb_w"] = np.asarray(rm), np.asarray(rw)
        for k, lv in jax.tree_util.tree_leaves_with_path(g):
            outs["rgbgrad" + jax.tree_util.keystr(k)] = np.asarray(lv)

        # mip (shared coarse/fine MLP, IPE input — MipNeRFNet params)
        from nerfsos_tpu.models.mip import MipNeRFNet

        mcfg = NeRFConfig(n_samples=64, n_importance=128, multires=10,
                          multires_views=4, remat=False,
                          compute_dtype="bfloat16", fused_field=True)
        mnet = MipNeRFNet(mcfg)
        mparams = {"mlp": mnet.init(jax.random.PRNGKey(3))["mip"]["mlp"]}
        radii = jnp.full((R, 1), 0.002)
        odvr = jnp.concatenate([odv, radii], axis=1)
        zf = jnp.sort(jax.random.uniform(jax.random.PRNGKey(9), (R, S + 1))
                      * 13.5 + 1.2, axis=-1)
        mm, mw = jax.jit(lambda p, a, zz: fr.fused_mip_render_planar(
            p, a, zz, mcfg))(mparams, odvr, zf)
        outs["mip_maps"], outs["mip_w"] = np.asarray(mm), np.asarray(mw)
        return outs

    results = {}
    for mode in ("highest", "split"):
        fr._BCAST_MODE = mode
        results[mode] = run_all()
        log(f"mode={mode}: kernels ran")

    bad = []
    for k in results["highest"]:
        a, b = results["highest"][k], results["split"][k]
        if np.array_equal(a, b):
            continue
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        # Forward outputs must be BIT-equal. Gradient leaves may differ by
        # reduction reassociation: the bias grads are pure lane reductions
        # whose fused lowering (vectorization order) legitimately changes
        # with the surrounding graph — verified on CPU interpret where both
        # modes are exact f32 and only the bias-sum leaves moved (~5e-6 rel).
        is_grad = k.startswith("grad") or k.startswith("rgbgrad")
        if is_grad and rel < 1e-5:
            log(f"grad reassociation [{k}]: max rel {rel:.3e} (allowed)")
            continue
        bad.append((k, float(rel)))
        log(f"BIT-DIFF [{k}]: max rel {rel:.3e}")
    if bad:
        log("bit-equality FAILED:", bad)
    else:
        log("bit-equality: PASS (forward outputs identical; grads within "
            "reduction-reassociation tolerance)")

    # ---- perf, same session ------------------------------------------------
    n = 262144
    big = jax.random.normal(jax.random.PRNGKey(2), (2, n, 3))
    n_tr = 16384
    tr = jax.random.normal(jax.random.PRNGKey(4), (2, n_tr, 3))
    tr_o, tr_d = tr[0], tr[1]
    tr_v = tr_d / jnp.linalg.norm(tr_d, axis=-1, keepdims=True)
    tr_odv = jnp.concatenate([tr_o, tr_d, tr_v], axis=1)
    tr_z = jnp.sort(jax.random.uniform(jax.random.PRNGKey(10), (n_tr, S))
                    * 13.5 + 1.2, axis=-1)
    tr_gt = jax.random.uniform(jax.random.PRNGKey(11), (n_tr, 3))

    for mode in ("highest", "split", "highest", "split"):
        fr._BCAST_MODE = mode
        render_rgb = jax.jit(lambda p, r: net(p, r, (1.2, 14.72), train=False,
                                              coarse_outputs=False)["rgb"])
        dt = time_fn(render_rgb, params, big)
        log(f"[{mode}] eval render: {dt*1e3:.1f} ms = {n/dt:,.0f} rays/s")

        def rgb_grads(p, a, zz, y):
            g, m, w = fr.fused_rgb_train_grads(p, a, zz, y, cfg)
            return (sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
                    + jnp.sum(m) + jnp.sum(w))

        dt = time_fn(jax.jit(rgb_grads), fparams, tr_odv, tr_z, tr_gt)
        log(f"[{mode}] rgb-train grads (fine-pass only): {dt*1e3:.1f} ms "
            f"= {n_tr/dt:,.0f} rays/s")

    log("done")


if __name__ == "__main__":
    main()
