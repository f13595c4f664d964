"""Convert a reference PyTorch NeRF-SOS checkpoint to an orbax checkpoint.

The published ``pretrained_ckpt/*.ckpt`` files (BASELINE.md) load on the fly
through ``--ckpt_path``; this tool materializes the conversion once so
subsequent runs skip torch entirely.

CLI: ``python -m nerfsos_tpu.tools.convert_ckpt --torch_ckpt flower_00150000.ckpt
--out logs/flower/checkpoints/00150000``
"""
from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()

    from nerfsos_tpu.engines.checkpoint import load_torch_nerf_checkpoint, save_checkpoint

    params, step = load_torch_nerf_checkpoint(a.torch_ckpt)
    save_checkpoint(a.out, step, params)
    import jax

    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    print(f"converted step={step}, {n:,} params -> {a.out}")


if __name__ == "__main__":
    main()
