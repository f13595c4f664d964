"""Multi-host (DCN) seam dryrun: 2-process jax.distributed CPU cluster, one
real data-parallel train step.

``parallel/mesh.py`` claims "call ``jax.distributed.initialize()`` before
building the mesh; everything below is host-count agnostic" — this script is
the executable proof (VERDICT r3 #7). It spawns TWO worker processes of
itself, each with 2 virtual CPU devices (4 global), initializes the JAX
distributed runtime over a localhost coordinator, builds the standard 1-D
``data`` mesh over all GLOBAL devices, and drives ONE step of the production
DP program (``engines/trainer.make_rgb_train_step``) in both spmd modes
(gspmd jit shardings and shard_map+pmean). Global arrays are assembled with
``jax.make_array_from_callback`` — the only piece user code needs beyond the
single-host path (each host contributes its addressable shards).

The reference is single-process (SURVEY.md §2.5); there is nothing to cite.

Usage:
    python tools/dryrun_multihost.py            # driver: spawns 2 workers
    python tools/dryrun_multihost.py --worker I # internal

Exit 0 + "MULTIHOST-DRYRUN-OK" on success. Pure CPU; safe to run alongside
TPU jobs.
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROC = 2
LOCAL_DEVICES = 2


def _worker(pid: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=NPROC, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nerfsos_tpu.engines.state import TrainState, make_optimizer
    from nerfsos_tpu.engines.trainer import make_rgb_train_step
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
    from nerfsos_tpu.parallel import mesh as pmesh

    assert jax.process_count() == NPROC
    assert jax.local_device_count() == LOCAL_DEVICES
    assert jax.device_count() == NPROC * LOCAL_DEVICES
    m = pmesh.make_mesh()  # global 1-D data mesh — host-count agnostic
    assert m.devices.size == NPROC * LOCAL_DEVICES

    def globalize(tree, spec_fn):
        """Host numpy tree -> global jax.Arrays (each host feeds its shards)."""
        def leaf(x):
            x = np.asarray(x)
            s = NamedSharding(m, spec_fn(x))
            return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])
        return jax.tree_util.tree_map(leaf, tree)

    cfg = NeRFConfig(netwidth=32, netdepth=2, netwidth_fine=32, netdepth_fine=2,
                     n_samples=8, n_importance=8, multires=4, multires_views=2,
                     perturb=0.0)
    net = NeRFNet(cfg)
    # Identical seed on every process -> identical host params; globalize
    # replicated (the multi-host analogue of device_put(replicated)).
    params = net.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, make_optimizer(1e-2))
    state = globalize(state, lambda x: P())

    B = 8 * jax.device_count()
    rng = np.random.default_rng(0)
    batch_np = {
        "rays": rng.standard_normal((2, B, 3), dtype=np.float32),
        "target": rng.random((B, 3), dtype=np.float32),
        "masks": np.zeros((B, 1), np.float32),
    }

    def batch_spec(x):
        return P(None, "data") if x.ndim == 3 else P("data")

    batch = globalize(batch_np, batch_spec)
    key = globalize(np.asarray(jax.random.PRNGKey(2)), lambda x: P())

    losses = {}
    for spmd in ("gspmd", "shard_map"):
        step = make_rgb_train_step(net, 1.0, 4.0, mesh=m, donate=False,
                                   spmd=spmd)
        new_state, metrics = step(state, batch, key)
        loss = float(metrics["loss"])  # replicated -> addressable everywhere
        assert np.isfinite(loss), (spmd, loss)
        assert int(new_state.step) == 1
        losses[spmd] = loss
        print(f"proc {pid}: {spmd} step ok loss={loss:.6f}", flush=True)
    # gspmd partitions the single-device program: bit-identical math. The
    # shard_map program folds the shard index into the RNG, so its stochastic
    # draws (and hence loss) legitimately differ; finite + step==1 is the
    # contract there (same as tests/test_parallel_train.py).
    print(f"proc {pid}: WORKER-OK gspmd_loss={losses['gspmd']:.9f}", flush=True)
    jax.distributed.shutdown()


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main() -> None:
    port = _free_port()
    env = dict(os.environ)
    # Append (never overwrite: PYTHONPATH carries /root/.axon_site).
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for i in range(NPROC)
    ]
    outs = []
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        outs.append(out)
        print(f"--- worker {i} (rc={p.returncode}) ---\n{out}", flush=True)
        ok = ok and p.returncode == 0 and "WORKER-OK" in out

    if ok:
        g = [line.split("gspmd_loss=")[1] for out in outs
             for line in out.splitlines() if "WORKER-OK" in line]
        assert len(set(g)) == 1, f"gspmd loss differs across hosts: {g}"
        print("MULTIHOST-DRYRUN-OK")
    else:
        sys.exit("multihost dryrun FAILED")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        _worker(int(sys.argv[sys.argv.index("--worker") + 1]),
                int(sys.argv[sys.argv.index("--port") + 1]))
    else:
        main()
