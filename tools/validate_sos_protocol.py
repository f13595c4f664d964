"""End-to-end NeRF-SOS protocol validation on synthetic data (no real weights).

Re-establishes the round-1 quality claim with the CORRECTED geometry loss
(raw-XYZ fd, see losses/correlation.py): the full reference recipe —

  1. analytic scene: textured sphere (foreground) in front of a textured
     background shell, 16 train / 2 test views, GT masks from the ray-sphere
     hit test (masks are used ONLY for the ARI metric, never for training);
  2. RGB pretrain of the flagship 8x256 model (semantic head present, idle);
  3. freeze the backbone, patch-finetune with the GEOMETRY correlation loss
     as the only segmentation signal (DINO is random-init offline, so the
     appearance loss is off; geo corr needs only depth + the CLS sim matrix);
  4. held-out evaluation: k-means clustering of the learned semantic logits
     vs GT masks -> ARI;
  5. (phase 3, skippable with --geo-only) a SECOND finetune from the same
     pretrain ckpt with the APPEARANCE correlation loss as the dominant
     signal (production weights: correlation_w 1, Gcorrelation_w 0.01 —
     scripts/train_flower_node0.sh), driven by the photometric oracle
     extractor (--dino_synthetic, models/extractor.py SyntheticExtractor):
     informative features without pretrained DINO weights, so the appearance
     path gets a held-out QUALITY endpoint, not just numerical parity.

Run on the TPU:  PYTHONPATH=$PYTHONPATH:/root/repo python tools/validate_sos_protocol.py
Writes everything under /tmp/sos_protocol/ (incl. summary.json) and prints a
PASS/FAIL summary (pass = each finetune's held-out clus_ari >= 0.5 and the
pretrain PSNR preserved within 0.5 dB).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import run_nerf  # noqa: E402
from nerfsos_tpu.data import ray_utils  # noqa: E402
from nerfsos_tpu.data.poses import pose_spherical  # noqa: E402

H = W = 64
FOCAL = 80.0
R_CAM = 4.0
R_SPHERE = 1.0
R_BG = 8.0
NEAR, FAR = 2.0, 13.0


def _texture(p: np.ndarray, freq: float, base: np.ndarray, amp: float) -> np.ndarray:
    """Smooth 3-D texture so the RGB task is learnable but non-trivial."""
    s = (np.sin(freq * p[..., 0]) * np.sin(freq * p[..., 1]) * np.sin(freq * p[..., 2]))
    return np.clip(base + amp * s[..., None] * np.array([1.0, -0.5, 0.25]), 0.0, 1.0)


def _ray_sphere(o: np.ndarray, d: np.ndarray, radius: float):
    """Smallest positive t of |o + t d| = radius (d unnormalized ok)."""
    a = np.sum(d * d, -1)
    b = 2.0 * np.sum(o * d, -1)
    c = np.sum(o * o, -1) - radius**2
    disc = b * b - 4 * a * c
    hit = disc > 0
    sq = np.sqrt(np.maximum(disc, 0.0))
    t0 = (-b - sq) / (2 * a)
    t1 = (-b + sq) / (2 * a)
    t = np.where(t0 > 1e-3, t0, t1)
    return hit & (t > 1e-3), t


def render_analytic(rays: np.ndarray):
    """rays [H, W, 2, 3] -> rgb [H, W, 3], mask [H, W, 1]."""
    o, d = rays[..., 0, :], rays[..., 1, :]
    hit_fg, t_fg = _ray_sphere(o, d, R_SPHERE)
    _, t_bg = _ray_sphere(o, d, R_BG)  # camera is inside the shell: always hits
    p_fg = o + t_fg[..., None] * d
    p_bg = o + t_bg[..., None] * d
    fg_rgb = _texture(p_fg, 6.0, np.array([0.85, 0.35, 0.25]), 0.25)
    bg_rgb = _texture(p_bg, 1.5, np.array([0.2, 0.45, 0.7]), 0.2)
    rgb = np.where(hit_fg[..., None], fg_rgb, bg_rgb).astype(np.float32)
    return rgb, hit_fg[..., None].astype(np.float32)


def build_dataset(root: str) -> None:
    os.makedirs(root, exist_ok=True)
    K = ray_utils.persp_intrinsics(H, W, FOCAL)
    n_train, n_test = 16, 2
    angles = np.linspace(0.0, 360.0, n_train + n_test, endpoint=False)
    poses = np.stack([
        np.asarray(pose_spherical(a, -25.0 - 15.0 * ((i % 3) - 1), R_CAM))[:3, :4]
        for i, a in enumerate(angles)
    ])
    rays = ray_utils.persp_rays_batch(H, W, K, poses)  # [N, H, W, 2, 3]
    rgbs, masks = [], []
    for i in range(rays.shape[0]):
        rgb, m = render_analytic(np.asarray(rays[i]))
        rgbs.append(rgb)
        masks.append(m)
    rgbs, masks = np.stack(rgbs), np.stack(masks)

    i_train = np.arange(n_train)
    i_test = np.arange(n_train, n_train + n_test)
    for split, idx in [("train", i_train), ("val", i_test), ("test", i_test)]:
        np.save(os.path.join(root, f"rays_{split}.npy"), np.asarray(rays)[idx])
        np.save(os.path.join(root, f"rgbs_{split}.npy"), rgbs[idx])
        np.save(os.path.join(root, f"masks_{split}.npy"), masks[idx])
    np.save(os.path.join(root, "rays_exhibit.npy"), np.asarray(rays)[i_test])
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump({"H": H, "W": W, "focal": FOCAL, "near": NEAR, "far": FAR,
                   "i_train": i_train.tolist(), "i_val": i_test.tolist(),
                   "i_test": i_test.tolist(), "ndc": False, "factor": 1,
                   "spherify": False, "llffhold": 0, "half_res": False,
                   "white_bkgd": False, "test_skip": 1, "dv_scene": ""}, f)


def _args(data, basedir, *extra):
    parser = run_nerf.create_arg_parser()
    base = ["--expname", "x", "--basedir", basedir,
            "--data_path", data, "--data_type", "llff",
            "--N_samples", "64", "--N_importance", "128",
            "--lrate", "5e-4", "--i_print", "200",
            "--i_weights", "100000", "--i_testset", "1000000",
            "--i_video", "1000000", "--i_img", "1000000"]
    args, _ = parser.parse_known_args(base + list(extra))
    return args


def main():
    root = "/tmp/sos_protocol"
    data = os.path.join(root, "data")
    logs = os.path.join(root, "logs")
    skip_pretrain = "--skip-pretrain" in sys.argv and os.path.exists(
        os.path.join(logs, "pretrain", "eval", "log.json"))
    build_dataset(data)
    print("dataset written:", data)

    # ---- 1. RGB pretrain (semantic head present but untrained) -------------
    if not skip_pretrain:
        run_nerf.main(_args(
            data, logs, "--expname", "pretrain", "--max_steps", "1500",
            "--batch_size", "4096", "--use_semantics", "--sem_with_coord",
            "--raw_noise_std", "1.0",
        ))
    with open(os.path.join(logs, "pretrain", "eval", "log.json")) as f:
        pre = json.load(f)
    pre_psnr = pre["total_psnr"]
    print(f"[protocol] pretrain held-out PSNR: {pre_psnr:.2f} dB")

    # ---- 2. frozen-backbone geo-corr patch finetune ------------------------
    ckpt = os.path.join(logs, "pretrain", "checkpoints", "last")
    # max_steps is GLOBAL (reference semantics): the ingested checkpoint
    # resumes at step 1500, so 2000 = 500 finetune steps.
    run_nerf.main(_args(
        data, logs, "--expname", "finetune", "--max_steps", "2000",
        "--use_semantics", "--sem_with_coord", "--raw_noise_std", "1.0",
        "--patch_tune", "--patch_size", "16", "--patch_stride", "2",
        "--batch_size", "8", "--fix_backbone",
        "--use_dino", "--use_geoCorr",  # use_correlation stays off (random DINO)
        "--Gcorrelation_w", "1.0", "--geo_corr_params", "0.5", "1", "3", "1",
        "--ckpt_path", ckpt, "--use_masks",
    ))
    with open(os.path.join(logs, "finetune", "eval", "log.json")) as f:
        fin = json.load(f)
    ari = fin["total_clus_ari"]
    post_psnr = fin["total_psnr"]
    print(f"[protocol] finetune held-out clus ARI: {ari:.3f}  PSNR: {post_psnr:.2f} dB")

    # ---- 3. appearance-dominant finetune (photometric oracle features) -----
    summary = {"pretrain_psnr": pre_psnr, "geo": {"clus_ari": ari, "psnr": post_psnr}}
    ok = ari >= 0.5 and post_psnr >= pre_psnr - 0.5
    if "--geo-only" not in sys.argv:
        run_nerf.main(_args(
            data, logs, "--expname", "finetune_app", "--max_steps", "2000",
            "--use_semantics", "--sem_with_coord", "--raw_noise_std", "1.0",
            "--patch_tune", "--patch_size", "16", "--patch_stride", "2",
            "--batch_size", "8", "--fix_backbone",
            "--use_dino", "--dino_synthetic", "--use_correlation", "--use_geoCorr",
            "--correlation_w", "1.0", "--Gcorrelation_w", "0.01",
            "--geo_corr_params", "0.5", "1", "3", "1",
            "--ckpt_path", ckpt, "--use_masks",
        ))
        with open(os.path.join(logs, "finetune_app", "eval", "log.json")) as f:
            fa = json.load(f)
        ari_app, psnr_app = fa["total_clus_ari"], fa["total_psnr"]
        print(f"[protocol] appearance finetune held-out clus ARI: {ari_app:.3f}"
              f"  PSNR: {psnr_app:.2f} dB")
        summary["appearance"] = {"clus_ari": ari_app, "psnr": psnr_app}
        ok = ok and ari_app >= 0.5 and psnr_app >= pre_psnr - 0.5

    summary["pass"] = ok
    with open(os.path.join(root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[protocol] {'PASS' if ok else 'FAIL'} "
          f"({json.dumps(summary)})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
