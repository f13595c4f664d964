"""On-chip A/B of the fused-render composite layout.

``fused_render._COMPOSITE_MODE``:
  "lanes" — round-3: lane-major segmented scans on [1, R_blk*S] vectors
            (1 of 8 sublanes live -> 36 vregs/op at the eval shape) + R_blk
            unaligned lane-slice weight stores per block.
  "rows"  — round-4: ray-per-sublane-row [R_blk, S] composite — full
            sublane occupancy (6 vregs/op), mask-free scans, ONE aligned
            weights store. Designed BIT-equal (same doubling tree per ray,
            same input bits — see fused_render._composite_rows).

Verifies bit-equality ON CHIP for every kernel family (eval render, coarse
weights, train fwd+bwd, loss-in-kernel RGB grads, mip render, mip train
fwd+bwd), then measures same-session: eval render, full-parity render,
rgb-train grads, SOS step, mip render, mip train.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 4000 python tools/perf_composite_rows.py
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
    mdmaps = jax.random.normal(jax.random.PRNGKey(12), (R, 5))

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

        mm, mw = jax.jit(lambda p, a, zz: fr.fused_mip_render_planar(
            p, a, zz, mcfg))(mparams, odvr, zf)
        outs["mip_maps"], outs["mip_w"] = np.asarray(mm), np.asarray(mw)

        def mip_fwd_bwd(p, a, zz, dm, dwt):
            out, vjp = jax.vjp(
                lambda pp: fr.fused_mip_train_render_planar(pp, a, zz, mcfg), p)
            (dp,) = vjp((dm, dwt))
            return out, dp

        (mtm, mtw), mdp = jax.jit(mip_fwd_bwd)(mparams, odvr, zf, mdmaps, dw)
        outs["miptr_maps"], outs["miptr_w"] = np.asarray(mtm), np.asarray(mtw)
        for k, lv in jax.tree_util.tree_leaves_with_path(mdp):
            outs["mipgrad" + jax.tree_util.keystr(k)] = np.asarray(lv)
        return outs

    results = {}
    for mode in ("lanes", "rows"):
        fr._COMPOSITE_MODE = mode
        results[mode] = run_all()
        log(f"mode={mode}: kernels ran")

    bad = []
    for k in results["lanes"]:
        a, b = results["lanes"][k], results["rows"][k]
        if np.array_equal(a, b):
            continue
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        # Forward outputs must be BIT-equal. Gradient leaves may differ by
        # reduction reassociation (Mosaic vectorizes the bias lane-sums
        # differently when the surrounding graph changes).
        is_grad = ("grad" in k)
        if is_grad and rel < 1e-5:
            log(f"grad reassociation [{k}]: max rel {rel:.3e} (allowed)")
            continue
        bad.append((k, float(rel)))
        log(f"BIT-DIFF [{k}]: max rel {rel:.3e}")
    if bad:
        log("bit-equality FAILED:", bad)
        sys.exit(1)
    log("bit-equality: PASS (forward outputs identical; grads within "
        "reduction-reassociation tolerance)")

    # ---- perf, same session (ABAB to bracket tunnel drift) -----------------
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
    tr_radii = jnp.full((n_tr, 1), 0.002)
    tr_odvr = jnp.concatenate([tr_odv, tr_radii], axis=1)
    tr_zf = jnp.sort(jax.random.uniform(jax.random.PRNGKey(13), (n_tr, S + 1))
                     * 13.5 + 1.2, axis=-1)
    tr_mdm = jax.random.normal(jax.random.PRNGKey(14), (n_tr, 5))
    tr_dw = jax.random.normal(jax.random.PRNGKey(15), (n_tr, S))

    for mode in ("lanes", "rows", "lanes", "rows"):
        fr._COMPOSITE_MODE = mode
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

        def mip_grads(p, a, zz, dm, dwt):
            (m, w), vjp = jax.vjp(
                lambda pp: fr.fused_mip_train_render_planar(pp, a, zz, mcfg), p)
            (dp,) = vjp((dm, dwt))
            return (sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(dp))
                    + jnp.sum(m) + jnp.sum(w))

        dt = time_fn(jax.jit(mip_grads), mparams, tr_odvr, tr_zf, tr_mdm, tr_dw)
        log(f"[{mode}] mip train fwd+bwd (one pass): {dt*1e3:.1f} ms "
            f"= {n_tr/dt:,.0f} rays/s")

    # SOS step at both modes (the backward rides the same kernels)
    import bench
    for mode in ("lanes", "rows"):
        fr._COMPOSITE_MODE = mode
        rps = bench.bench_sos()
        log(f"[{mode}] SOS step: {rps:,.0f} rays/s")

    log("done")


if __name__ == "__main__":
    main()
