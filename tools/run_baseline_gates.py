"""One-command BASELINE.md parity gates — ready for the day real artifacts
(DINO/LPIPS weights, real scene .npy dirs, published checkpoints) appear.

The environment has no network and no pretrained weights (VERDICT missing
#1/#2), so the REAL gates cannot produce reference-parity numbers yet; this
script wires the whole sequence so that when weights land, one command runs
the full flower/fortress/CO3D gate:

  # the real thing (flower example; fortress/CO3D analogous):
  PYTHONPATH="$PYTHONPATH:/root/repo" python tools/run_baseline_gates.py \
      --scene_dir /data/flower_npy --ckpt /ckpts/flower_150k.ckpt \
      --dino_ckpt /weights/dino_vits16.pth --lpips_path /weights/lpips.pth \
      --expect_psnr 25.0 --expect_ari 0.5 --sos_steps 200000

  # synthetic dry run (no weights needed; exercised by tests/test_tools.py):
  PYTHONPATH="$PYTHONPATH:/root/repo" python tools/run_baseline_gates.py --synthetic

Gate sequence (BASELINE.md "Rebuild targets" + reference
``scripts/train_flower_node0.sh``):
  1. EVAL gate — held-out PSNR/SSIM (+ LPIPS when --lpips_path given,
     honest nulls otherwise) + ARI/ARI-fg from the ingested checkpoint.
  2. SOS gate — patch finetune (flower hyperparams: app 0.18/1/0.46/1,
     geo 0.5/1/3/1, Gcorrelation_w 0.01, 8 x 64x64 patches stride 6,
     lr 5e-4) for --sos_steps, with the automatic end-of-train eval;
     total_clus_ari is the segmentation-quality endpoint.
  3. Threshold assertions (--expect_psnr / --expect_ari) when given (the
     reference publishes no in-repo numbers; thresholds come from the paper
     or a reference run).

Synthetic mode swaps in the analytic textured-sphere scene (GT masks from
the ray-sphere hit test), pretrains briefly instead of ingesting a
checkpoint, and — when no --dino_ckpt is given — drives the FULL loss stack
(appearance + geometry, production weights) through the photometric oracle
extractor (--dino_synthetic, models/extractor.py SyntheticExtractor):
informative features without pretrained weights, validated at held-out ARI
0.985 on chip (PROTOCOL_r04.json; a random-init ViT would corrupt the trunk
instead — REHEARSAL_r03 clus_ari 0.006). Exit 0 = all gates pass.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("GATES_CPU") == "1":
    # CPU plumbing smoke (the env pins the axon TPU platform; JAX_PLATFORMS
    # alone does not override it — see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import run_nerf  # noqa: E402


def log(*a):
    print("[gates]", *a, flush=True)


def drive(data, basedir, *extra):
    parser = run_nerf.create_arg_parser()
    base = ["--basedir", basedir, "--data_path", data, "--data_type", "llff",
            "--lrate", "5e-4", "--i_print", "100", "--i_weights", "1000000",
            "--i_testset", "1000000", "--i_video", "1000000",
            "--i_img", "1000000"]
    argv = base + list(extra)
    log("run_nerf", " ".join(argv))
    args, _ = parser.parse_known_args(argv)
    run_nerf.main(args)


def read_eval(basedir: str, exp: str) -> dict:
    path = os.path.join(basedir, exp, "eval", "log.json")
    if not os.path.exists(path):
        # run_nerf.main returns (it does not raise) on e.g. the missing-run-
        # dir --eval guard (run_nerf.py:335-337, reference parity) — surface
        # that as a gate failure instead of a FileNotFoundError traceback.
        raise SystemExit(f"[gates] run_nerf wrote no {path} — the run failed "
                         "or exited early; see its output above")
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", default="", help=".npy artifact dir "
                    "(generate_dataset contract); required unless --synthetic")
    ap.add_argument("--ckpt", default="", help="torch or native checkpoint "
                    "to ingest (published flower/fortress/CO3D ckpts)")
    ap.add_argument("--dino_ckpt", default="", help="DINO ViT-S/16 weights")
    ap.add_argument("--lpips_path", default="")
    ap.add_argument("--lpips_backbone_path", default="")
    ap.add_argument("--out", default="/tmp/baseline_gates")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--sos_steps", type=int, default=0, help="SOS finetune "
                    "steps (default 200000 real / 120 synthetic)")
    ap.add_argument("--pretrain_steps", type=int, default=400,
                    help="synthetic mode only: RGB pretrain steps")
    ap.add_argument("--expect_psnr", type=float, default=None)
    ap.add_argument("--expect_ari", type=float, default=None)
    ap.add_argument("--geo_params", default="0.5,1,3,1",
                    help="geo_corr_params (CO3D scenes: 0.25,1,1,1)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    failures = []
    geo = args.geo_params.split(",")

    if args.synthetic:
        from tools.validate_sos_protocol import build_dataset

        scene = os.path.join(args.out, "scene")
        build_dataset(scene)
        sos_steps = args.sos_steps or 120
        size = ["--N_samples", "32", "--N_importance", "32",
                "--patch_size", "16", "--patch_stride", "2"]
        # RGB pretrain stands in for the published checkpoint
        drive(scene, args.out, "--expname", "gate_pretrain",
              "--max_steps", str(args.pretrain_steps), *size,
              "--batch_size", "4096", "--use_semantics", "--sem_with_coord",
              "--raw_noise_std", "1.0")
        pre = read_eval(args.out, "gate_pretrain")
        log("pretrain eval:", json.dumps({k: pre[k] for k in pre
                                          if k.startswith("total_")}))
        ckpt = os.path.join(args.out, "gate_pretrain", "checkpoints", "last")
        ingest = ["--ckpt_path", ckpt]
        sos_max = str(args.pretrain_steps + sos_steps)  # max_steps is GLOBAL
    else:
        if not args.scene_dir or not args.ckpt:
            raise SystemExit("--scene_dir and --ckpt are required without "
                             "--synthetic")
        scene = args.scene_dir
        size = ["--N_samples", "64", "--N_importance", "128",
                "--patch_size", "64", "--patch_stride", "6"]
        # the reference SOS scripts resume the RGB pretrain nostrict
        # (scripts/train_flower_node0.sh:24): the sem head re-initializes
        ingest = ["--ckpt_path", args.ckpt, "--load_nostrict"]
        sos_max = str(args.sos_steps or 200_000)
    lpips = (["--lpips_path", args.lpips_path] if args.lpips_path else [])
    if args.lpips_backbone_path:
        lpips += ["--lpips_backbone_path", args.lpips_backbone_path]
    # real weights when given; in synthetic mode fall back to the photometric
    # oracle so the appearance loss trains on informative features
    dino = (["--dino_ckpt", args.dino_ckpt] if args.dino_ckpt
            else ["--dino_synthetic"] if args.synthetic else [])

    # ---- gate 1: EVAL from the checkpoint --------------------------------
    # --eval refuses a missing run dir (reference run_nerf.py:264-268; ours
    # :335-337). gate_eval is a fresh expname whose weights come from
    # --ckpt_path, so pre-create the dir — the guard is for typo'd resumes.
    os.makedirs(os.path.join(args.out, "gate_eval"), exist_ok=True)
    drive(scene, args.out, "--expname", "gate_eval", *size, *ingest, *lpips,
          "--use_semantics", "--sem_with_coord", "--use_masks",
          "--ret_cluster", "--eval")
    ev = read_eval(args.out, "gate_eval")
    log("eval:", json.dumps({k: ev[k] for k in ev if k.startswith("total_")}))
    psnr = ev.get("total_psnr")
    if psnr is None or not np.isfinite(psnr):
        failures.append(("eval", "total_psnr missing/NaN", psnr))
    if args.lpips_path and ev.get("total_lpips") is None:
        failures.append(("eval", "lpips requested but null", None))
    if args.expect_psnr is not None and (psnr or 0) < args.expect_psnr:
        failures.append(("eval", f"psnr < {args.expect_psnr}", psnr))

    # ---- gate 2: SOS finetune (+ automatic end-of-train eval) ------------
    # appearance loss is always on: real DINO when --dino_ckpt is given,
    # the photometric oracle in synthetic mode (informative either way)
    app = ["--use_correlation", "--correlation_w", "1",
           "--app_corr_params", "0.18", "1", "0.46", "1"]
    drive(scene, args.out, "--expname", "gate_sos", *size, *ingest, *dino,
          *lpips, "--max_steps", sos_max, "--patch_tune", "--batch_size",
          "8", "--use_semantics", "--sem_with_coord", "--use_dino",
          "--use_geoCorr", "--fix_backbone", *app,
          "--Gcorrelation_w", "0.01",
          "--geo_corr_params", *geo, "--use_masks", "--raw_noise_std", "1.0")
    sv = read_eval(args.out, "gate_sos")
    log("sos eval:", json.dumps({k: sv[k] for k in sv
                                 if k.startswith("total_")}))
    ari = sv.get("total_clus_ari")
    if ari is None or not np.isfinite(ari):
        failures.append(("sos", "total_clus_ari missing/NaN", ari))
    if args.expect_ari is not None and (ari or 0) < args.expect_ari:
        failures.append(("sos", f"clus_ari < {args.expect_ari}", ari))
    # PSNR-stability guard: only meaningful once the finetune has settled
    # (tiny CI-sized runs fluctuate more than the 1 dB band)
    if (args.synthetic and psnr is not None and sv.get("total_psnr")
            and (args.sos_steps or 120) >= 100):
        if sv["total_psnr"] < psnr - 1.0:
            failures.append(("sos", "finetune degraded PSNR > 1 dB",
                             sv["total_psnr"]))

    summary = {"synthetic": bool(args.synthetic), "eval": ev, "sos": sv,
               "failures": failures}
    with open(os.path.join(args.out, "gates.json"), "w") as f:
        json.dump(summary, f, indent=1)
    log("summary ->", os.path.join(args.out, "gates.json"))
    if failures:
        log("FAIL:", failures)
        sys.exit(1)
    log("ALL GATES PASS")


if __name__ == "__main__":
    main()
