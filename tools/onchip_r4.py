"""Round-4 on-chip validation + same-session A/B timings.

Parity first (cheap shapes, results stream as they land), then the flagship
timings — kill late and the parity verdicts are already on disk:

1. quad flash geo kernels (ops/pallas/flash_corr.py `flash_geo_pair_quad`):
   on-chip values vs four independent flash singles (bit-equal target; the
   quad stacks the neg/self sweeps on batch, it must not change sums) and a
   gradient spot-check.
2. `CorrelationLoss.pair_heads`: on-chip vs two independent calls (same RNG
   streams by construction; tiny reduction-order tolerance).
3. fused mip TRAIN kernel (ops/pallas/fused_render.py `_mip_train_kernel` +
   custom VJP): on-chip grads vs the XLA planar-IPE train path, f32.
4. SOS flagship step (8 x 64 x 64): paired quad/pair_heads (shipped) vs the
   round-3 grouping (monkeypatched back), SAME-SESSION delta.
   Target: <= 298 ms (>= 110k rays/s), VERDICT r3 #2.
5. mip flagship TRAIN step (16384 rays, 64+128): fused kernel vs the XLA
   planar-IPE route, same-session; plus the eval render for reference.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/onchip_r4.py
"""
import sys
import time

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (time_fn: best-of-3 group means, forces fetches)
from nerfsos_tpu.losses.correlation import (  # noqa: E402
    CorrelationLoss, GeoCorrelationLoss, get_similarity_matrix, _norm)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b) / np.maximum(np.abs(b), 1e-8)


# ---------------------------------------------------------------- 1. quad
def check_quad():
    from nerfsos_tpu.ops.pallas.flash_corr import (
        flash_geo_helper_mean, flash_geo_pair_quad)

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    B, P, S = 4, 16, 2
    sem = jax.random.normal(ks[0], (B, S, P, P))
    depth = jax.random.uniform(ks[1], (B, 1, P, P)) * 5 + 1
    ray_o = jax.random.normal(ks[2], (B, 3, P, P))
    ray_d = jax.random.normal(ks[3], (B, 3, P, P))
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1])
    pts = geo.depth2pts(depth, ray_o, ray_d)
    neg_pts = jnp.roll(pts, 1, axis=0)
    c0 = sem
    c1 = jnp.roll(sem, 2, axis=0) * 1.7
    c0n, c1n = jnp.roll(c0, 1, axis=0), jnp.roll(c1, 1, axis=0)

    @jax.jit
    def singles(a0, a0n, a1, a1n):
        return jnp.stack([
            flash_geo_helper_mean(pts, neg_pts, _norm(a0), _norm(a0n), 10.0,
                                  geo.max_depth),
            flash_geo_helper_mean(pts, neg_pts, _norm(a1), _norm(a1n), 10.0,
                                  geo.max_depth),
            flash_geo_helper_mean(pts, pts, _norm(a0), _norm(a0), 3.0,
                                  geo.max_depth),
            flash_geo_helper_mean(pts, pts, _norm(a1), _norm(a1), 3.0,
                                  geo.max_depth),
        ])

    @jax.jit
    def quad(a0, a0n, a1, a1n):
        return jnp.stack(flash_geo_pair_quad(
            pts, neg_pts, _norm(a0), _norm(a0n), _norm(a1), _norm(a1n),
            10.0, 3.0, geo.max_depth))

    s = np.asarray(singles(c0, c0n, c1, c1n))
    q = np.asarray(quad(c0, c0n, c1, c1n))
    log(f"[quad] singles {s}\n[quad] quad    {q}\n"
        f"[quad] max rel {rel(q, s).max():.2e} "
        f"({'BIT-EQUAL' if np.array_equal(s, q) else 'not bit-equal'})")

    gs = jax.jit(jax.grad(lambda a, b, c, d: jnp.sum(singles(a, b, c, d))))
    gq = jax.jit(jax.grad(lambda a, b, c, d: jnp.sum(quad(a, b, c, d))))
    g1 = np.asarray(gs(c0, c0n, c1, c1n), np.float64)
    g2 = np.asarray(gq(c0, c0n, c1, c1n), np.float64)
    # conditioned rel: unmasked rel on near-zero elements reports pure
    # reassociation noise (first chip run: max 4.3e-4 / p50 9e-8 with
    # bit-equal values — all on tiny-|g| entries)
    mask = np.abs(g1) > 1e-4 * np.abs(g1).max()
    gr = np.abs(g2 - g1)[mask] / np.abs(g1)[mask]
    log(f"[quad] grad ({mask.sum()} conditioned) max rel {gr.max():.2e} "
        f"p50 {np.median(gr):.2e}")
    ok = rel(q, s).max() < 1e-6 and gr.max() < 1e-4
    log(f"[quad] {'PASS' if ok else 'FAIL'}")
    return ok


# ---------------------------------------------------------- 2. pair_heads
def check_pair_heads():
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    B, C, hf, wf, S, P = 8, 16, 13, 13, 2, 16
    feats = jax.random.normal(ks[0], (B, C, hf, wf))
    code0 = jax.random.normal(ks[1], (B, S, P, P))
    code1 = jax.random.normal(ks[2], (B, S, P, P))
    sim = get_similarity_matrix(jax.random.normal(ks[3], (B, 64)))
    app = CorrelationLoss.from_params([0.18, 1, 0.46, 1], use_sim_matrix=True)
    k0, k1 = ks[4], ks[5]

    two = jax.jit(lambda f, a, b: jnp.stack([app(k0, f, a, sim),
                                             app(k1, f, b, sim)]))
    paired = jax.jit(lambda f, a, b: jnp.stack(
        app.pair_heads(k0, k1, f, a, b, sim)))
    t = np.asarray(two(feats, code0, code1))
    p = np.asarray(paired(feats, code0, code1))
    r = rel(p, t)
    log(f"[pair_heads] two {t} paired {p} max rel {r.max():.2e}")
    ok = r.max() < 1e-4
    log(f"[pair_heads] {'PASS' if ok else 'FAIL'}")
    return ok


# ------------------------------------------------- 3. mip train grads parity
def check_mip_train_grads():
    import dataclasses

    from nerfsos_tpu.models.mip import MipNeRFNet
    from nerfsos_tpu.models.nerf import NeRFConfig

    cfg = NeRFConfig(n_samples=16, n_importance=32, multires=10,
                     multires_views=4, ray_block=256, remat=False,
                     compute_dtype="float32", fused_field=False)
    net = MipNeRFNet(cfg)
    pl_net = MipNeRFNet(dataclasses.replace(cfg, fused_field=True))
    params = net.init(jax.random.PRNGKey(0))
    rays = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 3))
    tgt = jax.random.uniform(jax.random.PRNGKey(7), (256, 3))

    def loss(n, p):
        out = n(p, rays, (1.0, 4.0), 0.001, key=jax.random.PRNGKey(2),
                train=True, perturb=0.0)
        return (jnp.mean((out["rgb"] - tgt) ** 2)
                + jnp.mean((out["rgb0"] - tgt) ** 2))

    ga = jax.jit(jax.grad(lambda p: loss(net, p)))(params)
    gb = jax.jit(jax.grad(lambda p: loss(pl_net, p)))(params)
    fa, _ = jax.flatten_util.ravel_pytree(ga)
    fb, _ = jax.flatten_util.ravel_pytree(gb)
    fa, fb = np.asarray(fa, np.float64), np.asarray(fb, np.float64)
    mask = np.abs(fa) > 1e-6 * np.abs(fa).max()
    r = np.abs(fb - fa)[mask] / np.abs(fa)[mask]
    log(f"[mip-train grads] {mask.sum()} conditioned leaves: "
        f"max rel {r.max():.2e} p50 {np.median(r):.2e}")
    ok = np.median(r) < 1e-3 and r.max() < 5e-2
    log(f"[mip-train grads] {'PASS' if ok else 'FAIL'}")
    return ok


# --------------------------------------------------- 4. SOS step A/B timing
def time_sos(paired: bool):
    from nerfsos_tpu.engines.sos import SOSConfig, make_sos_train_step
    from nerfsos_tpu.engines.state import TrainState, make_optimizer
    from nerfsos_tpu.models.extractor import VitExtractor
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet

    saved = (CorrelationLoss.pair_heads, GeoCorrelationLoss.quad)
    if not paired:
        # round-3 grouping: two app calls, geo via the paired (not quad) path
        CorrelationLoss.pair_heads = (
            lambda self, k0, k1, f, c0, c1, sm:
            (self(k0, f, c0, sm), self(k1, f, c1, sm)))

        def _quad_fallback(self, feats, neg_feats, c0, c0n, c1, c1n,
                           axis=None):
            n0, n1 = self.helper_mean_pair(feats, neg_feats, c0, c0n, c1,
                                           c1n, self.neg_shift, axis=axis)
            s0, s1 = self.helper_mean_pair(feats, feats, c0, c0, c1, c1,
                                           self.self_shift, axis=axis)
            return n0, n1, s0, s1

        GeoCorrelationLoss.quad = _quad_fallback
    try:
        B, P, stride = 8, 64, 6
        N = B * P * P
        cfg = NeRFConfig(
            n_samples=64, n_importance=128, use_semantics=True,
            sem_with_coord=True, ray_block=N, remat=False,
            compute_dtype="bfloat16", fused_field=True)
        net = NeRFNet(cfg)
        params = net.init(jax.random.PRNGKey(0))
        ext = VitExtractor("dino_vits16", dtype=jnp.bfloat16)
        dino_params = ext.init(jax.random.PRNGKey(1))
        sos_cfg = SOSConfig(batch_size=B, patch_size=P, patch_stride=stride)
        app = CorrelationLoss.from_params([0.18, 1, 0.46, 1],
                                          use_sim_matrix=True)
        geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1],
                                             use_sim_matrix=True)
        state = TrainState.create(
            params, make_optimizer(5e-4, fix_backbone=True, params=params))
        step = make_sos_train_step(net, ext, app, geo, sos_cfg, 1.2, 14.72,
                                   donate=False)
        rays = jax.random.normal(jax.random.PRNGKey(2), (2, N, 3))
        batch = {"rays": rays, "target": jnp.zeros((N, 3)),
                 "masks": jnp.zeros((N, 1))}

        def sos_once(s, dp, b, k):
            new_s, _ = step(s, dp, b, k)
            return bench._touch_params(new_s.params)

        dt = bench.time_fn(sos_once, state, dino_params, batch,
                           jax.random.PRNGKey(3), iters=4)
        tag = "paired" if paired else "round3-grouping"
        log(f"[sos {tag}] {dt*1e3:.1f} ms = {N/dt:,.0f} rays/s")
        return dt
    finally:
        CorrelationLoss.pair_heads, GeoCorrelationLoss.quad = saved


# --------------------------------------------------- 5. mip train step timing
def time_mip_train(fused: bool):
    from nerfsos_tpu.engines.state import TrainState, make_optimizer
    from nerfsos_tpu.engines.trainer import make_rgb_train_step
    from nerfsos_tpu.models.mip import MipNeRFNet
    from nerfsos_tpu.models.nerf import NeRFConfig

    n = 16384
    # fused=False is the round-3 mip TRAIN baseline: no fused train kernel
    # existed, training ran the XLA field route (fused_field=False + remat
    # to survive the backward graph).
    cfg = NeRFConfig(n_samples=64, n_importance=128, multires=10,
                     multires_views=4, ray_block=n, remat=not fused,
                     compute_dtype="bfloat16", fused_field=fused)
    net = MipNeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, make_optimizer(5e-4))
    step = make_rgb_train_step(net, 1.2, 14.72, donate=False,
                               net_kwargs={"radii": 0.001})
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, n, 3))
    batch = {"rays": rays, "target": jnp.zeros((n, 3)),
             "masks": jnp.zeros((n, 1))}

    def once(s, b, k):
        new_s, _ = step(s, b, k)
        return bench._touch_params(new_s.params)

    dt = bench.time_fn(once, state, batch, jax.random.PRNGKey(2), iters=4)
    tag = "fused-kernel" if fused else "xla-field"
    log(f"[mip train {tag}] {dt*1e3:.1f} ms = {n/dt:,.0f} rays/s")
    return dt


def main():
    log(f"backend: {jax.default_backend()} {jax.devices()}")
    t0 = time.time()
    ok = True
    ok &= check_quad()
    ok &= check_pair_heads()
    ok &= check_mip_train_grads()
    log(f"--- parity done ({time.time()-t0:.0f}s), ok={ok} ---")

    dt_un = time_sos(paired=False)
    dt_pa = time_sos(paired=True)
    N = 8 * 64 * 64
    log(f"[sos] same-session delta: {dt_un*1e3:.1f} -> {dt_pa*1e3:.1f} ms "
        f"({N/dt_un:,.0f} -> {N/dt_pa:,.0f} rays/s); "
        f"target <=298 ms: {'MET' if dt_pa <= 0.298 else 'MISSED'}")

    dt_mf = time_mip_train(fused=True)
    try:
        dt_mx = time_mip_train(fused=False)
        log(f"[mip train] same-session: xla {dt_mx*1e3:.1f} ms vs fused "
            f"{dt_mf*1e3:.1f} ms ({dt_mx/dt_mf:.2f}x)")
    except Exception as e:  # the classic XLA backward killed this compiler
        log(f"[mip train] xla-field baseline failed to build: {e!r}")
    log(f"total {time.time()-t0:.0f}s")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
