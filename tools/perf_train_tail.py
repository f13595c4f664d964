"""Where do the train step's non-field milliseconds go?

Train = 166 ms at 16384 rays while field fwd+bwd is ~109 ms (coarse+fine).
Times the composite forward+backward in isolation (suspect: the cumprod VJP
lowers as a sequential scan), plus the samplers, on the flagship shapes.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_train_tail.py
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from nerfsos_tpu.core import sampling
from nerfsos_tpu.core.render import volumetric_render

R, S = 16384, 192


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=8, warmup=2):
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
    log("backend:", jax.default_backend())
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    raw_cf = jax.random.normal(ks[0], (6, R, S))
    z = jnp.sort(jax.random.uniform(ks[1], (R, S)) * 10 + 1.2, axis=-1)
    d = jax.random.normal(ks[2], (R, 3))
    tgt = jax.random.uniform(ks[3], (R, 3))

    def loss(rcf):
        out = volumetric_render(rcf, z, d, use_semantics=True,
                                channels_first=True)
        return jnp.mean((out["rgb"] - tgt) ** 2) + jnp.mean(out["semantics"] ** 2)

    f = jax.jit(loss)
    g = jax.jit(jax.grad(loss))
    log(f"composite fwd (cf):      {time_fn(f, raw_cf)*1e3:6.2f} ms")
    log(f"composite fwd+bwd (cf):  {time_fn(lambda r: g(r)[0,0,:8], raw_cf)*1e3:6.2f} ms")

    # samplers (fwd only; z/weights are detached in train)
    near = jnp.full((R, 1), 1.2)
    far = jnp.full((R, 1), 14.72)
    w = jax.nn.softmax(jax.random.normal(ks[0], (R, 64)))
    fC = jax.jit(lambda k: sampling.stratified_sample(k, near, far, 64, perturb=1.0, lindisp=False))
    z_c = fC(ks[1])
    fD = jax.jit(lambda k, ww: sampling.importance_sample(k, z_c, ww, 128, det=False)[0])
    log(f"stratified:              {time_fn(fC, ks[1])*1e3:6.2f} ms")
    log(f"importance (cdf+merge):  {time_fn(fD, ks[2], w)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
