"""Benchmark: flagship-config ray throughput on one TPU chip.

Workload = the reference's flagship render/train shape (LLFF flower SOS,
BASELINE.md): 8x256 coarse/fine MLPs with the semantic head, 64 stratified +
128 importance samples per ray, full volumetric pipeline. Measures render
(forward; fused Pallas field with XLA fallback) and train
(forward+backward+Adam) rays/sec; the JSON line reports render throughput.

vs_baseline: the reference records no numbers (BASELINE.md); the denominator
is an estimated PyTorch-A100 render throughput of 50k rays/s for this exact
shape (256 field queries/ray x ~0.6 MFLOP fwd through the 8x256 MLP at fp32
~= 150 MFLOP/ray; A100 fp32 19.5 TFLOPs at ~40% utilization). The BASELINE
north-star is >=10x this.

Timing note: block_until_ready does not force unfetched executions on the
remote-tunneled backend here — every measured call chains into a host-fetched
sum (see time_fn).
"""
import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp

A100_TORCH_RENDER_RAYS_PER_SEC = 50_000.0
N_RAYS = 16384
# Render measures a 1048576-ray block — four 512x512 images per call
# (reachable via --ray_chunk 1048576; the video path renders 120 frames, so
# multi-frame dispatch is the production shape): the planar kernels removed
# the 42.7x-padded buffers that used to OOM far smaller shapes, and the
# bigger block amortizes the ~6 ms per-call tail (65536 -> 131072 -> 262144
# rays measured 409.0k -> 416.7k -> 420.5k rays/s in one session, 2026-08-18,
# /tmp/eval_bigblock; 262144 -> 524288 -> 1048576 measured 428.4k -> 431.1k
# -> 432.5k same-session 2026-08-20, tools/perf_eval_block5.py — +0.95%,
# converging; tools/perf_planar_sweep.py has the older 341k -> 354k story at
# 16384 -> 65536).
N_RAYS_RENDER = 1048576


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- FLOP model
# Useful (unpadded) matmul FLOPs per field query, from the flagship dims —
# the arithmetic of ROUND2_NOTES' MFU analysis, emitted per-mode in the bench
# JSON so the driver tracks the hard number (VERDICT r2 #7).


def _mlp_flops(in_dim: int, width: int = 256, depth: int = 8,
               views_dim: int = 27, use_semantics: bool = True,
               sem_coord: bool = True) -> int:
    """MACs*2 of one point through trunk+heads (skip at 4, sem_layer 2)."""
    macs = in_dim * width                      # layer 0
    macs += (depth - 2) * width * width        # plain trunk layers
    macs += (width + in_dim) * width           # post-skip layer (input 319)
    macs += width                              # alpha head
    macs += width * width                      # feature head
    macs += (width + views_dim) * (width // 2)  # views layer
    macs += (width // 2) * 3                   # rgb head
    if use_semantics:
        sem_in = width + (in_dim if sem_coord else 0)
        macs += sem_in * (width // 2) + (width // 2) * 2
    return 2 * macs


def _sigma_flops(in_dim: int, width: int = 256, depth: int = 8) -> int:
    macs = in_dim * width + (depth - 2) * width * width + (width + in_dim) * width
    return 2 * (macs + width)


def _frozen_bwd_flops(in_dim: int = 63, width: int = 256, depth: int = 8) -> int:
    """Field FLOPs of the frozen-backbone backward kernel per point
    (_train_frozen_bwd_kernel, _FROZEN_BWD_MODE="stream_semin" default): the
    sem-head input is STORED by the forward and streamed back (no recompute,
    no in-kernel PE), so the bwd is just sem-head forward + two dW dots + one
    dx dot (~3x the sem head). The step trades those trunk FLOPs for
    ~sem_in*2 B/pt of HBM round-trip — sos_step_padded_util is accordingly a
    partially bandwidth-bound number."""
    del in_dim, depth  # trunk recompute eliminated by the stream modes
    sem_in = width + 63  # sem_with_coord concat
    sem = sem_in * (width // 2) + (width // 2) * 2
    return 2 * 3 * sem


# flagship: PE in 63 (classic), IPE in 60 (mip); 64 coarse + 192 fine samples
FLOPS_PER_RAY = {
    # eval render: sigma-only coarse + full fine
    "render_eval": 64 * _sigma_flops(63) + 192 * _mlp_flops(63),
    # full-parity render: full coarse + full fine
    "render_full": 256 * _mlp_flops(63),
    # train fwd+bwd ~ 3x the forward matmul FLOPs (dW + dx per matmul)
    "train": 3 * 256 * _mlp_flops(63),
    # SOS fix_backbone step FIELD work (round 5): full train forward +
    # sem-head-only backward — the reference's requires_grad=False prunes the
    # trunk reverse sweep and so do we (fused_render._train_frozen_bwd_kernel)
    "sos": 256 * (_mlp_flops(63) + _frozen_bwd_flops(63)),
    # mip: 63 coarse + 190 fine gaussians, no semantic head, IPE in 60
    "mip_render": (63 + 190) * _mlp_flops(60, use_semantics=False),
    # mip train rides the custom-vjp fused kernel: fwd kernel (1x) + bwd
    # recompute (1x) + reverse-sweep dW/dx matmuls (2x) = 4x the forward
    # (ops/pallas/fused_render.py _mip_train_kernel/_mip_train_bwd_kernel)
    "mip_train": 4 * (63 + 190) * _mlp_flops(60, use_semantics=False),
}


def _pad128(k: int) -> int:
    return ((k + 127) // 128) * 128


def _padded(layers) -> int:
    """FLOPs the MXU actually executes: K and N tile-pad to 128 lanes."""
    return sum(2 * _pad128(k) * _pad128(n) for k, n in layers)


def _layer_dims(sigma_only: bool, in_dim: int = 63, use_semantics: bool = True):
    ls = [(in_dim, 256)] + [(256, 256)] * 6 + [(256 + in_dim, 256), (256, 1)]
    if not sigma_only:
        ls += [(256, 256), (283, 128), (128, 3)]
        if use_semantics:
            ls += [(256 + in_dim, 128), (128, 2)]
    return ls


# The shape's intrinsic ceiling: the flagship dims (63/319/283-wide inputs,
# 1/3/2-wide heads) tile-pad by x1.188 on the MXU (x1.134 sigma-only) — at
# the parity-fixed architecture, useful MFU cannot exceed 1/1.188 = 0.842.
def _frozen_bwd_layer_dims(in_dim: int = 63):
    # stream modes (stream_semin default): no trunk recompute — sem-head dots only
    sem = [(256 + in_dim, 128), (128, 2)]
    return 3 * sem


PADDED_FLOPS_PER_RAY = {
    "render_eval": 64 * _padded(_layer_dims(True)) + 192 * _padded(_layer_dims(False)),
    "render_full": 256 * _padded(_layer_dims(False)),
    "train": 3 * 256 * _padded(_layer_dims(False)),
    "sos": 256 * (_padded(_layer_dims(False)) + _padded(_frozen_bwd_layer_dims())),
    "mip_render": (63 + 190) * _padded(_layer_dims(False, 60, use_semantics=False)),
    "mip_train": 4 * (63 + 190) * _padded(_layer_dims(False, 60, use_semantics=False)),
}


def bench_matmul_ceiling() -> float:
    """Achievable bf16 MXU rate on this chip: CHAINED big square dots inside
    one jit (a single dot is dominated by the tunnel's ~4 ms dispatch floor)
    — the denominator for the per-mode MFU numbers."""
    n, reps = 8192, 12
    # 1/n entries: each product row-sum is n*(1/n^2) = 1/n — a fixed point,
    # so the chained values neither overflow nor denormalize in bf16.
    a = jnp.full((n, n), 1.0 / n, jnp.bfloat16)
    b = jnp.full((n, n), 1.0 / n, jnp.bfloat16)

    @jax.jit
    def chain(x, y):
        for _ in range(reps):
            x = jnp.dot(x, y, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return x[:1, :1]

    dt = time_fn(chain, a, b, iters=6, warmup=2)
    rate = reps * 2 * n**3 / dt
    log(f"matmul ceiling: {rate/1e12:.1f} TFLOPs bf16 (chained {reps}x{n})")
    return rate


def _touch_params(params) -> jnp.ndarray:
    """Scalar depending on every leaf — forces the whole update to execute."""
    return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(params))


def time_fn(fn, *args, iters=6, warmup=2, repeats=3):
    """Best-of-``repeats`` group means of ``iters`` chained calls.

    The axon tunnel's long-run variance band is wider than the nominal 5%
    (identical train code measured 133.9 vs 144.9k rays/s twenty minutes
    apart, 2026-08-18): interference noise only ever ADDS time, so the
    minimum group mean is the estimator of the device's actual rate.
    Measurement is seconds per group — compiles, not timing, dominate bench
    wall-clock."""
    def run(n):
        acc = 0.0
        for _ in range(n):
            acc = acc + jnp.sum(fn(*args))
        return float(acc)

    run(warmup)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(iters)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_render(fused: bool, coarse_outputs: bool = False) -> float:
    """Image-render throughput. ``coarse_outputs=False`` is the eval/video
    path (engines/eval.make_render_fn default): the coarse pass runs the
    density-only Pallas kernel — just enough for importance sampling — because
    no eval consumer reads the '0'-suffixed maps. ``True`` measures the full
    reference-parity render (every output the reference computes)."""
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet

    n = N_RAYS_RENDER if fused else N_RAYS
    cfg = NeRFConfig(
        n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
        ray_block=n, remat=False, compute_dtype="bfloat16", fused_field=fused,
    )
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, n, 3))
    render = jax.jit(lambda p, r: net(p, r, (1.2, 14.72), train=False,
                                      coarse_outputs=coarse_outputs)["rgb"])
    dt = time_fn(render, params, rays)
    name = ("pallas" if fused else "xla") + ("/full" if coarse_outputs else "/eval")
    log(f"render[{name}]: {dt*1e3:.1f} ms / {n} rays = {n/dt:,.0f} rays/s")
    return n / dt


def bench_mip_render() -> float:
    """mip-NeRF family eval render (shared coarse/fine MLP, IPE) through the
    planar fused kernel — 2.06x the XLA field (tools/perf_mip_planar.py).

    Measures N_RAYS_RENDER rays/call like the classic eval arm: the historic
    16384 rays/call left the tunnel's ~4-6 ms dispatch tail ~10% of a 43 ms
    call. Same-session sweep (tools/perf_mip_calls5*.py, 2026-08-20):
    16384 -> 65536 -> 262144 = 339.6k -> 396.7k -> 410.0k rays/s (+20.7%),
    then 262144 -> 524288 -> 1048576 = 410.5k -> 413.3k -> 414.8k
    (converging, +1.1%) — the kernel itself is unchanged (block 1536); only
    the per-call grid and tail amortization move."""
    from nerfsos_tpu.models.mip import MipNeRFNet
    from nerfsos_tpu.models.nerf import NeRFConfig

    n = N_RAYS_RENDER
    cfg = NeRFConfig(
        n_samples=64, n_importance=128, multires=10, multires_views=4,
        ray_block=n, remat=False, compute_dtype="bfloat16", fused_field=True,
    )
    net = MipNeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, n, 3))
    render = jax.jit(lambda p, r: net(p, r, (1.2, 14.72), 0.001,
                                      train=False)["rgb"])
    dt = time_fn(render, params, rays)
    log(f"mip render: {dt*1e3:.1f} ms / {n} rays = {n/dt:,.0f} rays/s")
    return n / dt


def bench_train() -> float:
    from nerfsos_tpu.engines.state import TrainState, make_optimizer
    from nerfsos_tpu.engines.trainer import make_rgb_train_step
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet

    # Production train path: fused Pallas field with its in-kernel VJP lets
    # the step drop remat entirely (the XLA backward graph, with or without
    # remat disabled, crashes the remote libtpu compiler on this toolchain;
    # the Pallas VJP both compiles and is 1.7x faster than remat+XLA).
    cfg = NeRFConfig(
        n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
        ray_block=N_RAYS, remat=False, compute_dtype="bfloat16", fused_field=True,
    )
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, make_optimizer(5e-4))
    step = make_rgb_train_step(net, 1.2, 14.72, donate=False)
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, N_RAYS, 3))
    batch = {"rays": rays, "target": jnp.zeros((N_RAYS, 3)),
             "masks": jnp.zeros((N_RAYS, 1))}

    def train_once(s, b, k):
        # Touch EVERY updated leaf: fetching a single coarse param lets XLA
        # dead-code-eliminate the fine backward pallas_call (the fine loss
        # never feeds coarse grads — importance z is detached), which times
        # a partial step (~34 ms vs the real ~113 ms at 16384 rays, measured
        # on-chip 2026-08-18, tools/perf_epilogue_sweep.py note).
        new_s, _ = step(s, b, k)
        return _touch_params(new_s.params)

    dt = time_fn(train_once, state, batch, jax.random.PRNGKey(2), iters=4)
    log(f"train: {dt*1e3:.1f} ms / {N_RAYS} rays = {N_RAYS/dt:,.0f} rays/s")
    return N_RAYS / dt


def bench_mip_train() -> float:
    """mip-NeRF RGB train step through the fused custom-vjp TRAIN kernel
    (forward + recompute-backward in two Pallas calls per pass, in-kernel
    pre-relu noise; new round 4 — round 3 trained mip on the planar field
    kernel with XLA compositing)."""
    from nerfsos_tpu.engines.state import TrainState, make_optimizer
    from nerfsos_tpu.engines.trainer import make_rgb_train_step
    from nerfsos_tpu.models.mip import MipNeRFNet
    from nerfsos_tpu.models.nerf import NeRFConfig

    n = 16384
    cfg = NeRFConfig(
        n_samples=64, n_importance=128, multires=10, multires_views=4,
        ray_block=n, remat=False, compute_dtype="bfloat16", fused_field=True,
    )
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
        return _touch_params(new_s.params)  # see bench_train: no partial-step DCE

    dt = time_fn(once, state, batch, jax.random.PRNGKey(2), iters=4)
    log(f"mip train: {dt*1e3:.1f} ms / {n} rays = {n/dt:,.0f} rays/s")
    return n / dt


def bench_sos() -> float:
    """Full-scale flagship SOS train step: 8 patches x 64x64 rays, real
    ViT-S/16 DINO (random weights — same FLOPs), both correlation losses,
    frozen-backbone optimizer. The 200k-step production hot path."""
    from nerfsos_tpu.engines.sos import SOSConfig, make_sos_train_step
    from nerfsos_tpu.engines.state import TrainState, make_optimizer
    from nerfsos_tpu.losses.correlation import CorrelationLoss, GeoCorrelationLoss
    from nerfsos_tpu.models.extractor import VitExtractor
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet

    B, P, stride = 8, 64, 6
    N = B * P * P  # 32768 rays/step
    cfg = NeRFConfig(
        n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
        ray_block=N, remat=False, compute_dtype="bfloat16", fused_field=True,
    )
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    ext = VitExtractor("dino_vits16", dtype=jnp.bfloat16)
    dino_params = ext.init(jax.random.PRNGKey(1))
    # fix_backbone: the flagship finetune's semantics (train_flower_node0.sh)
    # — the loss stop-gradients the frozen subtree and the fused VJP runs the
    # semantic-head-only backward (no trunk reverse sweep).
    sos_cfg = SOSConfig(batch_size=B, patch_size=P, patch_stride=stride,
                        fix_backbone=True)
    app = CorrelationLoss.from_params([0.18, 1, 0.46, 1], use_sim_matrix=True)
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=True)
    state = TrainState.create(params, make_optimizer(5e-4, fix_backbone=True, params=params))
    step = make_sos_train_step(net, ext, app, geo, sos_cfg, 1.2, 14.72, donate=False)

    rays = jax.random.normal(jax.random.PRNGKey(2), (2, N, 3))
    batch = {"rays": rays, "target": jnp.zeros((N, 3)), "masks": jnp.zeros((N, 1))}

    def sos_once(s, dp, b, k):
        new_s, _ = step(s, dp, b, k)
        return _touch_params(new_s.params)  # see bench_train: no partial-step DCE

    dt = time_fn(sos_once, state, dino_params, batch, jax.random.PRNGKey(3), iters=4)
    log(f"sos train: {dt*1e3:.1f} ms / {N} rays = {N/dt:,.0f} rays/s")

    # DINO share: forward of the ViT on the step's input shape
    x = jax.random.uniform(jax.random.PRNGKey(4), (B, P * stride, P * stride, 3))
    dino_fwd = jax.jit(lambda dp, xx: ext.get_vit_attn_feat(xx, params=dp)["feat"])
    dt_dino = time_fn(dino_fwd, dino_params, x, iters=4)
    log(f"  dino fwd share: {dt_dino*1e3:.1f} ms ({100*dt_dino/dt:.0f}% of step)")
    return N / dt


def _retry(label, fn, tries=2, wait_s=30.0, default=0.0):
    """Run a bench family, retrying once on failure. The axon tunnel throws
    one-off transients (observed 2026-08-20: FAILED_PRECONDITION on the
    first device op of a fresh process, clean on the identical retry,
    ROUND5_NOTES "Per-call grid amortization") — without a retry, a single
    hiccup zeroes a family in the round's recorded BENCH json."""
    for i in range(tries):
        try:
            return fn()
        except Exception:
            log(f"{label} failed (attempt {i + 1}/{tries}):\n"
                f"{traceback.format_exc(limit=2)}")
            if i + 1 < tries:
                time.sleep(wait_s)
    return default


def _warmup_device(tries=3, wait_s=30.0):
    """Absorb startup transients before any family runs."""
    for i in range(tries):
        try:
            float(jnp.sum(jnp.ones((8, 128), jnp.float32)))
            return
        except Exception:
            log(f"device warmup failed (attempt {i + 1}/{tries}):\n"
                f"{traceback.format_exc(limit=1)}")
            if i + 1 < tries:
                time.sleep(wait_s)


def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    _warmup_device()

    def _renders():
        for fused in (True, False):
            try:
                a = bench_render(fused)  # eval path (the headline)
                b = bench_render(fused, coarse_outputs=True)
                return a, b
            except Exception:
                log(f"render(fused={fused}) failed:\n"
                    f"{traceback.format_exc(limit=2)}")
        raise RuntimeError("both render paths failed")

    render_rps, render_full_rps = _retry("render", _renders,
                                         default=(0.0, 0.0))
    train_rps = _retry("train bench", bench_train)
    sos_rps = _retry("sos bench", bench_sos)
    mip_rps = _retry("mip bench", bench_mip_render)
    mip_train_rps = _retry("mip train bench", bench_mip_train)
    ceiling = _retry("ceiling bench", bench_matmul_ceiling)

    def mfu(rps, mode):
        """Useful model FLOPs per second / measured matmul ceiling."""
        if not (rps and ceiling):
            return None
        return round(rps * FLOPS_PER_RAY[mode] / ceiling, 3)

    def padded_util(rps, mode):
        """MXU-executed (tile-padded) FLOPs per second / measured ceiling —
        how close the kernels run to the machine, independent of the shape's
        intrinsic x1.19 padding waste."""
        if not (rps and ceiling):
            return None
        return round(rps * PADDED_FLOPS_PER_RAY[mode] / ceiling, 3)

    def per_tflop(rps):
        """Ceiling-normalized throughput: rays/s per SAME-SESSION measured
        matmul TFLOP. The axon tunnel's session band (identical train code
        measured 133.9-144.9k rays/s across sessions) moves the raw numbers
        and the ceiling together; dividing them out makes BENCH_rN.json
        comparable round-over-round (VERDICT r3 #6)."""
        if not (rps and ceiling):
            return None
        return round(rps / (ceiling / 1e12), 1)

    print(json.dumps({
        "metric": "flower_flagship_render_rays_per_sec_per_chip",
        "value": round(render_rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(render_rps / A100_TORCH_RENDER_RAYS_PER_SEC, 3),
        "render_full_outputs_rays_per_sec": round(render_full_rps, 1),
        "train_rays_per_sec": round(train_rps, 1),
        "sos_train_rays_per_sec": round(sos_rps, 1),
        "mip_render_rays_per_sec": round(mip_rps, 1),
        "mip_train_rays_per_sec": round(mip_train_rps, 1),
        "matmul_ceiling_tflops": round(ceiling / 1e12, 1),
        "render_eval_mfu": mfu(render_rps, "render_eval"),
        "render_full_mfu": mfu(render_full_rps, "render_full"),
        "train_mfu": mfu(train_rps, "train"),
        "mip_render_mfu": mfu(mip_rps, "mip_render"),
        "mip_train_mfu": mfu(mip_train_rps, "mip_train"),
        "render_eval_padded_util": padded_util(render_rps, "render_eval"),
        "train_padded_util": padded_util(train_rps, "train"),
        # SOS: FIELD-kernel FLOPs (frozen-backbone composition) over the
        # WHOLE step time — the gap to 1.0 is the DINO fwd + correlation
        # tail + any field slack (breakdown: tools/perf_frozen_ab.py [PROF])
        "sos_step_padded_util": padded_util(sos_rps, "sos"),
        "mip_render_padded_util": padded_util(mip_rps, "mip_render"),
        "mip_train_padded_util": padded_util(mip_train_rps, "mip_train"),
        # ceiling-normalized (rays/s per same-session measured TFLOP): the
        # cross-round comparable numbers — see per_tflop.
        "render_eval_rays_per_tflop": per_tflop(render_rps),
        "render_full_rays_per_tflop": per_tflop(render_full_rps),
        "train_rays_per_tflop": per_tflop(train_rps),
        "sos_train_rays_per_tflop": per_tflop(sos_rps),
        "mip_render_rays_per_tflop": per_tflop(mip_rps),
        "mip_train_rays_per_tflop": per_tflop(mip_train_rps),
    }))


if __name__ == "__main__":
    main()
