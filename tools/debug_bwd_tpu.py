"""Granular TPU parity debug for the fused Pallas backward."""
import jax
import jax.numpy as jnp

from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from nerfsos_tpu.ops.pallas import fused_field as ff

NAMES = [f"pts_{i}" for i in range(8)] + ["alpha", "feature", "views", "rgb", "sem0", "sem1"]


def run(dtype_name, N, block):
    cfg = NeRFConfig(n_samples=8, n_importance=0, use_semantics=True,
                     sem_with_coord=True, ray_block=256)
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    ws, bs = ff._flatten_mlp_params(params["coarse"]["mlp"], 8, True)
    ws, bs = tuple(ws), tuple(bs)
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    g = jax.random.normal(jax.random.PRNGKey(3), (N, 6))

    ref = jax.jit(lambda: ff._xla_bwd(8, (4,), 10, 4, True, True,
                                      (ws, bs, (pts, dirs)), g))()
    got = jax.jit(lambda: ff._fused_backward(ws, bs, (pts, dirs), g, 8, (4,),
                                             10, 4, True, True, dtype_name,
                                             block=block))()
    print(f"--- dtype={dtype_name} N={N} block={block}")
    for name, a, b in zip(NAMES, ref[0], got[0]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(a - b))) / scale
        print(f"  dW[{name}]: rel {err:.2e}")
    for name, a, b in zip(NAMES, ref[1], got[1]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(a - b))) / scale
        print(f"  db[{name}]: rel {err:.2e}")
    for name, a, b in [("dpts", ref[2][0], got[2][0]), ("ddirs", ref[2][1], got[2][1])]:
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(a - b))) / scale
        print(f"  {name}: rel {err:.2e}")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    run("float32", 256, 1024)   # single block, fp32: isolates structural bugs
    run("bfloat16", 256, 1024)  # bf16 effects
    run("float32", 2048, 512)   # multi-block: accumulation pattern
