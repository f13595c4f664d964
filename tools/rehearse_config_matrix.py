"""On-chip rehearsal of the BASELINE.md config matrix through the real CLI.

VERDICT r2 #8: drive every matrix row's *shapes* through ``run_nerf.main`` on
the TPU with synthetic data (no real scenes/weights in this env), recording
steady-state step time and held-out PSNR per row — proof that each production
config trains AND evals on the chip without shape/compile surprises.

Rows (BASELINE.md "Config matrix"):
  1. lego            — blender-style RGB: ``configs/lego.txt`` (no_batching,
                       precrop, white_bkgd, 400x400, N_rand 1024)
  2. flower_full     — LLFF-style RGB: ``configs/flower_full.txt``
                       (batched rays, raw_noise_std 1.0, 384x512)
  3. flower_mip      — row 2 + ``--mipnerf`` (radii, IPE, blurpool)
  4. flower_sos      — full NeRF-SOS finetune from row 2's checkpoint:
                       8 x 64x64 patches stride 6, DINO (random init — no
                       weights offline), both correlation losses, flower
                       hyperparams (app 0.18/1/0.46/1, geo 0.5/1/3/1)
  5. co3d_sos        — CO3D hyperparam variant (geo 0.25/1/1/1) + the mask
                       video render (``--eval_video --ret_cluster``)

fortress ≡ flower shapes (same config template) — covered by rows 2/4.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 5400 python tools/rehearse_config_matrix.py
Writes /tmp/rehearse_matrix/matrix.json and prints one summary line per row.
"""
from __future__ import annotations

import io
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("REHEARSE_SMALL") == "1":
    # CPU plumbing smoke (the env pins the axon TPU platform; the env var
    # JAX_PLATFORMS alone does not override it — see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import run_nerf  # noqa: E402
from nerfsos_tpu.data import ray_utils  # noqa: E402
from nerfsos_tpu.data.poses import pose_spherical  # noqa: E402
from tools.validate_sos_protocol import _ray_sphere, _texture  # noqa: E402

R_CAM, R_SPHERE, R_BG = 4.0, 1.0, 8.0


def render_analytic(rays: np.ndarray, white_bg: bool):
    o, d = rays[..., 0, :], rays[..., 1, :]
    hit_fg, t_fg = _ray_sphere(o, d, R_SPHERE)
    p_fg = o + t_fg[..., None] * d
    fg_rgb = _texture(p_fg, 6.0, np.array([0.85, 0.35, 0.25]), 0.25)
    if white_bg:
        bg_rgb = np.ones_like(fg_rgb)
    else:
        _, t_bg = _ray_sphere(o, d, R_BG)
        p_bg = o + t_bg[..., None] * d
        bg_rgb = _texture(p_bg, 1.5, np.array([0.2, 0.45, 0.7]), 0.2)
    rgb = np.where(hit_fg[..., None], fg_rgb, bg_rgb).astype(np.float32)
    return rgb, hit_fg[..., None].astype(np.float32)


def build_dataset(root: str, H: int, W: int, white_bg: bool,
                  near: float, far: float) -> None:
    """Write the generate_dataset .npy contract (data/gen_dataset.py) for the
    analytic sphere scene at the requested production resolution."""
    os.makedirs(root, exist_ok=True)
    if os.path.exists(os.path.join(root, "meta.json")):
        return
    focal = 1.25 * max(H, W)
    K = ray_utils.persp_intrinsics(H, W, focal)
    n_train, n_test = 12, 2
    angles = np.linspace(0.0, 360.0, n_train + n_test, endpoint=False)
    poses = np.stack([
        np.asarray(pose_spherical(a, -25.0 - 15.0 * ((i % 3) - 1), R_CAM))[:3, :4]
        for i, a in enumerate(angles)
    ])
    rays = np.asarray(ray_utils.persp_rays_batch(H, W, K, poses))
    rgbs, masks = zip(*(render_analytic(rays[i], white_bg)
                        for i in range(rays.shape[0])))
    rgbs, masks = np.stack(rgbs), np.stack(masks)
    i_train = np.arange(n_train)
    i_test = np.arange(n_train, n_train + n_test)
    for split, idx in [("train", i_train), ("val", i_test), ("test", i_test)]:
        np.save(os.path.join(root, f"rays_{split}.npy"), rays[idx])
        np.save(os.path.join(root, f"rgbs_{split}.npy"), rgbs[idx])
        np.save(os.path.join(root, f"masks_{split}.npy"), masks[idx])
    np.save(os.path.join(root, "rays_exhibit.npy"), rays[i_test])
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump({"H": H, "W": W, "focal": focal, "near": near, "far": far,
                   "i_train": i_train.tolist(), "i_val": i_test.tolist(),
                   "i_test": i_test.tolist(), "ndc": False, "factor": 1,
                   "spherify": False, "llffhold": 0, "half_res": False,
                   "white_bkgd": white_bg, "test_skip": 1, "dv_scene": ""}, f)


class _Tee(io.TextIOBase):
    def __init__(self, *sinks):
        self.sinks = sinks

    def write(self, s):
        for k in self.sinks:
            k.write(s)
        return len(s)

    def flush(self):
        for k in self.sinks:
            k.flush()


_STEP_RE = re.compile(r"Average Time: ([0-9.]+) \((\d+) rays/s\)")


def run_row(name: str, config: str, data: str, logs: str, extra: list) -> dict:
    parser = run_nerf.create_arg_parser()
    argv = ["--config", config, "--data_path", data,
            "--basedir", logs, "--expname", name,
            "--i_print", "100", "--i_weights", "1000000",
            "--i_testset", "1000000", "--i_video", "1000000",
            "--i_img", "1000000"] + extra
    args, _ = parser.parse_known_args(argv)
    buf = io.StringIO()
    t0 = time.time()
    old = sys.stdout
    sys.stdout = _Tee(old, buf)
    try:
        run_nerf.main(args)
    finally:
        sys.stdout = old
    wall = time.time() - t0
    steps = _STEP_RE.findall(buf.getvalue())
    row = {"row": name, "wall_s": round(wall, 1),
           "step_ms": round(float(steps[-1][0]) * 1e3, 1) if steps else None,
           "rays_per_s": int(steps[-1][1]) if steps else None}
    eval_log = os.path.join(logs, name, "eval", "log.json")
    if os.path.exists(eval_log):
        with open(eval_log) as f:
            ev = json.load(f)
        row["psnr"] = round(ev.get("total_psnr", float("nan")), 2)
        for k in ("total_clus_ari", "total_sem_ari"):
            if k in ev:
                row[k.replace("total_", "")] = round(ev[k], 3)
    return row


def main():
    # REHEARSE_SMALL=1: tiny shapes for a CPU plumbing smoke (not the rehearsal)
    small = os.environ.get("REHEARSE_SMALL") == "1"
    steps = int(os.environ.get("REHEARSE_STEPS", "2" if small else "300"))
    hw_b = (64, 64) if small else (400, 400)
    hw_l = (64, 80) if small else (384, 512)
    patch = ["--patch_size", "8", "--patch_stride", "2"] if small else \
            ["--patch_size", "64", "--patch_stride", "6"]
    root = "/tmp/rehearse_matrix_small" if small else "/tmp/rehearse_matrix"
    logs = os.path.join(root, "logs")
    blender_data = os.path.join(root, "data_blender")
    llff_data = os.path.join(root, "data_llff")
    build_dataset(blender_data, *hw_b, white_bg=True, near=2.0, far=6.0)
    build_dataset(llff_data, *hw_l, white_bg=False, near=2.0, far=13.0)
    print("datasets:", blender_data, llff_data)

    rows = []

    def do(name, config, data, extra):
        print(f"=== row: {name} ===", flush=True)
        try:
            rows.append(run_row(name, config, data, logs, extra))
        except Exception as e:  # record the failure, keep rehearsing
            import traceback
            traceback.print_exc(limit=5)
            rows.append({"row": name, "error": f"{type(e).__name__}: {e}"})
        print(json.dumps(rows[-1]), flush=True)

    do("lego", "configs/lego.txt", blender_data, ["--max_steps", str(steps)])
    do("flower_full", "configs/flower_full.txt", llff_data,
       ["--max_steps", str(steps)])
    do("flower_mip", "configs/flower_full.txt", llff_data,
       ["--max_steps", str(steps), "--mipnerf", "--expname", "flower_mip"])
    ckpt = os.path.join(logs, "flower_full", "checkpoints", "last")
    sos_steps = str(steps + (200 if not small else 2))
    sos_common = patch + [
        "--patch_tune",
        "--batch_size", "8", "--use_semantics", "--sem_with_coord",
        "--use_dino", "--use_correlation", "--use_geoCorr",
        "--correlation_w", "1", "--app_corr_params", "0.18", "1", "0.46", "1",
        "--sem_dim", "2", "--N_cluster", "2", "--use_masks",
        # the reference SOS scripts resume their RGB pretrain nostrict
        # (scripts/train_flower_node0.sh:24): the --sem_with_coord head is
        # re-initialized, everything else is loaded
        "--load_nostrict",
        "--ckpt_path", ckpt,
    ]
    # max_steps is global (reference semantics): the ckpt resumes at `steps`.
    do("flower_sos", "configs/flower_full.txt", llff_data,
       sos_common + ["--max_steps", sos_steps, "--expname", "flower_sos",
                     "--Gcorrelation_w", "0.01",
                     "--geo_corr_params", "0.5", "1", "3", "1"])
    do("co3d_sos", "configs/co3d_apple_110.txt", llff_data,
       sos_common + ["--max_steps", sos_steps, "--expname", "co3d_sos",
                     "--Gcorrelation_w", "0.01",
                     "--geo_corr_params", "0.25", "1", "1", "1"])
    # mask video render is a separate CLI mode (run_nerf returns before
    # training when --eval_video is set)
    co3d_ckpt = os.path.join(logs, "co3d_sos", "checkpoints", "last")
    do("co3d_mask_video", "configs/co3d_apple_110.txt", llff_data,
       sos_common[:-2] + ["--expname", "co3d_mask_video",
                          "--ckpt_path", co3d_ckpt,
                          "--eval_video", "--ret_cluster"])

    out = os.path.join(root, "matrix.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", out)
    for r in rows:
        print(json.dumps(r))
    return 0 if all("error" not in r for r in rows) else 1


if __name__ == "__main__":
    raise SystemExit(main())
