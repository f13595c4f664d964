"""Checkpointing: orbax save/load + converter for the reference's torch ckpts.

Parity targets:
- the reference saves ``{'global_step', 'model', 'optimizer'}`` every
  ``i_weights`` as ``{step:08d}.ckpt`` plus rolling ``latest.ckpt``
  (``engines/trainer.py:216-222``, ``run_nerf.py:495-500``) and auto-resumes
  from the lexicographically newest ``*.ckpt`` (``run_nerf.py:336-342``);
- published ``pretrained_ckpt/*.ckpt`` files must load into this framework
  (BASELINE.md checkpoint-compatibility gate) — ``torch_nerf_ckpt_to_params``
  maps ``NeRFNet.{nerf,nerf_fine}.mlp.*`` module names onto our flax tree.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------- orbax


def save_checkpoint(path: str, step: int, params: Any, opt_state: Any = None) -> None:
    """Write an orbax checkpoint directory at ``path``."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = {"global_step": np.asarray(step), "params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(os.path.abspath(path), payload, force=True)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), item=target)
    return restored


def find_latest_checkpoint(run_dir: str) -> Optional[str]:
    """Newest checkpoint in a run dir (orbax dirs or torch .ckpt files).

    Mirrors the reference's lexicographic auto-discovery (``run_nerf.py:336-342``).
    """
    if not os.path.isdir(run_dir):
        return None
    cands = sorted(
        f for f in os.listdir(run_dir)
        if f.endswith(".ckpt") or re.fullmatch(r"\d{8}|latest|last", f)
    )
    return os.path.join(run_dir, cands[-1]) if cands else None


# ---------------------------------------------------------------- torch -> flax


def _collect_sequential_linears(sd: Dict[str, np.ndarray], prefix: str):
    """Ordered (weight, bias) pairs of the Linear layers inside a torch
    Sequential (keys like ``{prefix}.0.weight``, skipping activations)."""
    idxs = sorted(
        {int(m.group(1)) for k in sd for m in [re.match(re.escape(prefix) + r"\.(\d+)\.weight$", k)] if m}
    )
    return [(sd[f"{prefix}.{i}.weight"], sd[f"{prefix}.{i}.bias"]) for i in idxs]


def _convert_field(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """One NeRFMLP field: torch ``{prefix}.mlp.*`` -> flax ``{'mlp': {...}}``."""

    def lin(name):
        return {
            "kernel": np.asarray(sd[f"{prefix}.mlp.{name}.weight"], np.float32).T,
            "bias": np.asarray(sd[f"{prefix}.mlp.{name}.bias"], np.float32),
        }

    mlp: Dict[str, Any] = {}
    i = 0
    while f"{prefix}.mlp.pts_linears.{i}.weight" in sd:
        mlp[f"pts_linears_{i}"] = lin(f"pts_linears.{i}")
        i += 1

    if f"{prefix}.mlp.output_linear.weight" in sd:
        mlp["output_linear"] = lin("output_linear")
    else:
        mlp["alpha_linear"] = lin("alpha_linear")
        mlp["feature_linear"] = lin("feature_linear")
        mlp["views_linears_0"] = lin("views_linears.0")
        mlp["rgb_linear"] = lin("rgb_linear")

    sem_layers = _collect_sequential_linears(sd, f"{prefix}.mlp.semantic_linear")
    for j, (w, b) in enumerate(sem_layers):
        mlp[f"sem_{j}"] = {"kernel": np.asarray(w, np.float32).T,
                           "bias": np.asarray(b, np.float32)}
    geo_layers = _collect_sequential_linears(sd, f"{prefix}.mlp.geo_map_sem")
    for j, (w, b) in enumerate(geo_layers):
        mlp[f"geo_{j}"] = {"kernel": np.asarray(w, np.float32).T,
                           "bias": np.asarray(b, np.float32)}

    field: Dict[str, Any] = {"mlp": mlp}
    # optional Conv1d embedding smoothers: torch [out, in, k] -> flax [k, in, out]
    for tname, fname in [("conv_embed", "conv_embed"), ("conv_embeddirs", "conv_embeddirs")]:
        if f"{prefix}.{tname}.weight" in sd:
            field[fname] = {
                "kernel": np.asarray(sd[f"{prefix}.{tname}.weight"], np.float32).transpose(2, 1, 0),
                "bias": np.asarray(sd[f"{prefix}.{tname}.bias"], np.float32),
            }
    return field


def torch_nerf_ckpt_to_params(ckpt: Dict[str, Any]) -> Tuple[Dict[str, Any], int]:
    """Convert a reference NeRF-SOS torch checkpoint to (params, global_step).

    Accepts either a loaded torch checkpoint dict (``{'global_step', 'model',
    'optimizer'}``) or a bare model state dict.
    """
    step = int(ckpt.get("global_step", 0)) if isinstance(ckpt, dict) else 0
    sd = ckpt.get("model", ckpt)
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v)) for k, v in sd.items()}

    params = {"coarse": _convert_field(sd, "nerf")}
    if any(k.startswith("nerf_fine.") for k in sd):
        # shared-MLP models alias nerf_fine to nerf; distinct keys mean a real fine net
        fine = _convert_field(sd, "nerf_fine")
        params["fine"] = fine
    return params, step


def merge_params(current: Dict[str, Any], loaded: Dict[str, Any],
                 strict: bool = True) -> Dict[str, Any]:
    """Deep-merge ``loaded`` into ``current``.

    strict=True mirrors torch ``load_state_dict(strict=True)``: every current
    leaf must be provided and no extra keys allowed. strict=False mirrors the
    reference's ``--load_nostrict`` partial load (``run_nerf.py:356``): leaves
    missing from the checkpoint (e.g. a new semantic head) keep their fresh
    initialization; shape-mismatched leaves are also kept fresh.
    """
    import numpy as np

    def rec(cur, new, path):
        if not isinstance(cur, dict):
            if new is None:
                if strict:
                    raise KeyError(f"checkpoint missing param {path}")
                return cur
            if np.shape(new) != np.shape(cur):
                if strict:
                    raise ValueError(
                        f"shape mismatch at {path}: ckpt {np.shape(new)} vs model {np.shape(cur)}"
                    )
                return cur
            return new
        new = new or {}
        if strict:
            extra = set(new) - set(cur)
            if extra:
                raise KeyError(f"unexpected checkpoint keys at {path}: {sorted(extra)}")
        return {k: rec(v, new.get(k), f"{path}/{k}") for k, v in cur.items()}

    return rec(current, loaded, "")


def load_torch_nerf_checkpoint(path: str) -> Tuple[Dict[str, Any], int]:
    import torch

    ckpt = torch.load(path, map_location="cpu")
    return torch_nerf_ckpt_to_params(ckpt)
