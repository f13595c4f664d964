"""End-to-end CLI tests: train a few steps + all eval modes on a synthetic scene."""
import json
import os

import numpy as np
import pytest

import run_nerf
from nerfsos_tpu.data.poses import pose_spherical


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    """Tiny blender scene + generated dataset + shared basedir."""
    from PIL import Image

    root = tmp_path_factory.mktemp("scene")
    H = W = 20
    rng = np.random.default_rng(0)
    for s, n in [("train", 3), ("val", 1), ("test", 1)]:
        os.makedirs(root / s, exist_ok=True)
        frames = []
        for i in range(n):
            img = (rng.random((H, W, 4)) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / s / f"r_{i}.png")
            frames.append({
                "file_path": f"{s}/r_{i}",
                "transform_matrix": pose_spherical(360 * i / n, -30, 4.0).tolist(),
            })
        with open(root / f"transforms_{s}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)
    basedir = tmp_path_factory.mktemp("logs")
    return str(root), str(basedir)


def _args(scene, basedir, *extra, no_semantics=True):
    parser = run_nerf.create_arg_parser()
    base = [
        "--expname", "smoke", "--basedir", basedir,
        "--data_path", scene, "--data_type", "blender",
        "--test_skip", "1", "--white_bkgd",
        "--netdepth", "2", "--netwidth", "16", "--netdepth_fine", "2",
        "--netwidth_fine", "16", "--N_samples", "4", "--N_importance", "4",
        "--multires", "2", "--multires_views", "2",
        "--batch_size", "64", "--max_steps", "6",
        "--i_print", "3", "--i_weights", "5", "--i_testset", "100000",
        "--i_video", "100000", "--ray_chunk", "512", "--fast_mode",
    ]
    if no_semantics:
        base.append("--no_semantics")
    args, _ = parser.parse_known_args(base + list(extra))
    return args


def test_cli_train_creates_run_dir_and_ckpt(scene):
    data, basedir = scene
    run_nerf.main(_args(data, basedir))
    run_dir = os.path.join(basedir, "smoke")
    assert os.path.exists(os.path.join(run_dir, "args.txt"))
    assert os.path.exists(os.path.join(run_dir, "checkpoints", "00000005"))
    assert os.path.exists(os.path.join(run_dir, "checkpoints", "last"))
    # final eval artifacts
    assert os.path.exists(os.path.join(run_dir, "eval", "log.json"))
    assert os.path.exists(os.path.join(run_dir, "tensorboard", "scalars.jsonl"))


def test_cli_native_ckpt_shape_mismatch_resume(scene):
    """Resuming a native checkpoint into a model with a re-shaped head:
    strict load fails with a clear error (torch load_state_dict raises on
    size mismatch even at strict=False, reference run_nerf.py:356); with
    --load_nostrict the mismatched leaf keeps its fresh init and the saved
    optimizer moments are skipped (the reference SOS scripts' resume
    scenario: RGB pretrain -> --sem_with_coord finetune)."""
    data, basedir = scene
    run_nerf.main(_args(data, basedir, "--expname", "pre_sem",
                        no_semantics=False))
    ckpt = os.path.join(basedir, "pre_sem", "checkpoints", "last")
    assert os.path.exists(ckpt)
    # sem_0 input widens netwidth 16 -> 16+pe(2): shape mismatch vs the ckpt
    resume = ["--expname", "ft_sem", "--sem_with_coord",
              "--ckpt_path", ckpt, "--max_steps", "8"]
    with pytest.raises(ValueError, match="shape mismatch"):
        run_nerf.main(_args(data, basedir, *resume, no_semantics=False))
    run_nerf.main(_args(data, basedir, *resume, "--load_nostrict",
                        no_semantics=False))
    assert os.path.exists(os.path.join(basedir, "ft_sem", "eval", "log.json"))


def test_cli_eval_mode_resumes_latest(scene):
    data, basedir = scene
    run_nerf.main(_args(data, basedir, "--eval"))
    log = json.load(open(os.path.join(basedir, "smoke", "eval", "log.json")))
    assert "total_psnr" in log


def test_cli_eval_video_mode(scene):
    data, basedir = scene
    run_nerf.main(_args(data, basedir, "--eval_video"))
    assert os.path.exists(os.path.join(basedir, "smoke", "rgb_smoke.mp4"))


def test_cli_eval_vol_mode(scene):
    data, basedir = scene
    run_nerf.main(_args(data, basedir, "--eval_vol",
                        "--vol_extents", "0.2", "--vol_size", "0.02"))
    assert os.path.exists(os.path.join(basedir, "smoke", "eval", "density.mrc"))


def test_cli_sos_invariant_validated(scene):
    data, basedir = scene
    with pytest.raises(SystemExit):
        run_nerf.main(_args(data, basedir, "--patch_tune", "--use_correlation"))


def test_all_shipped_configs_parse():
    """Config-matrix parity: every shipped scene config (34/34, matching the
    reference's configs/) must parse through create_arg_parser."""
    import glob

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgs = sorted(glob.glob(os.path.join(repo, "configs", "*.txt")))
    assert len(cfgs) == 34
    for c in cfgs:
        parser = run_nerf.create_arg_parser()
        args, _ = parser.parse_known_args(["--config", c])
        assert args.expname, c
        assert args.N_samples == 64, c
        assert args.data_type, c  # --dataset_type aliases to data_type


def test_cli_mipnerf_smoke(scene):
    data, basedir = scene
    args = _args(data, basedir, "--mipnerf", "--expname", "smoke_mip",
                 "--max_steps", "3", "--i_weights", "100000")
    run_nerf.main(args)
    assert os.path.exists(os.path.join(basedir, "smoke_mip", "eval", "log.json"))


def test_cli_config_file_reads_reference_format(scene, tmp_path):
    data, basedir = scene
    cfg = tmp_path / "lego_like.txt"
    cfg.write_text(
        "no_batching = True\nN_rand = 32\nlrate_decay = 500\n"
        "precrop_iters = 2\nprecrop_frac = 0.5\n"
    )
    args = _args(data, basedir, "--config", str(cfg),
                 "--expname", "smoke_view", "--max_steps", "4",
                 "--i_weights", "100000")
    assert args.no_batching is True
    assert args.batch_size == 64  # explicit CLI flag overrides config N_rand
    assert args.decay_step == 500  # lrate_decay alias
    run_nerf.main(args)  # exercises the ViewDataset precrop path
    assert os.path.exists(os.path.join(basedir, "smoke_view", "eval", "log.json"))


def test_cli_loads_torch_checkpoint(scene, tmp_path):
    """--ckpt_path with a reference-format torch .ckpt (the published-weights
    ingestion path) drives load_torch_nerf_checkpoint + deep merge in main()."""
    import torch
    import torch.nn as tnn

    data, basedir = scene

    class RefModel(tnn.Module):
        def __init__(self):
            super().__init__()
            # mirror reference module names for netdepth=2, netwidth=16,
            # multires=2 (pe dim 15), multires_views=2 (pe dim 15)
            self.lins = tnn.ModuleDict()
            names = {
                "pts_linears.0": (15, 16), "pts_linears.1": (16, 16),
                "alpha_linear": (16, 1), "feature_linear": (16, 16),
                "views_linears.0": (16 + 15, 8), "rgb_linear": (8, 3),
            }
            self.state = {}
            for prefix in ("nerf", "nerf_fine"):
                for n, (i, o) in names.items():
                    self.state[f"{prefix}.mlp.{n}.weight"] = torch.randn(o, i)
                    self.state[f"{prefix}.mlp.{n}.bias"] = torch.randn(o)

    rm = RefModel()
    ckpt_path = tmp_path / "ref_00000777.ckpt"
    torch.save({"global_step": 777, "model": rm.state, "optimizer": {}}, ckpt_path)

    args = _args(data, basedir, "--expname", "smoke_torch_ckpt",
                 "--ckpt_path", str(ckpt_path), "--load_nostrict",
                 "--max_steps", "2", "--i_weights", "100000")
    run_nerf.main(args)
    # resumed step counter from the torch ckpt
    assert os.path.exists(os.path.join(basedir, "smoke_torch_ckpt", "eval", "log.json"))


def test_cli_no_viewdirs_and_conv_embed(scene):
    """Exercise the non-fused fallback paths through the CLI."""
    data, basedir = scene
    args = _args(data, basedir, "--expname", "smoke_variants",
                 "--no_viewdirs", "--max_steps", "2", "--i_weights", "100000")
    run_nerf.main(args)
    args = _args(data, basedir, "--expname", "smoke_conv",
                 "--conv_embed", "--max_steps", "2", "--i_weights", "100000")
    run_nerf.main(args)
    assert os.path.exists(os.path.join(basedir, "smoke_conv", "eval", "log.json"))


def test_profiling_helpers(tmp_path):
    from nerfsos_tpu.utils.profiling import StepTimer, trace

    with trace(None):
        pass  # no-op path
    t = StepTimer()
    t.tick(100)
    t.tick(100)
    rep = t.report()
    assert rep["steps"] == 2 and rep["rays_per_sec"] > 0


def test_cli_sos_mode_end_to_end(scene):
    """Full SOS path through main(): patch dataset, DINO (random weights),
    correlation + geo losses, frozen backbone, online ARI logging."""
    data, basedir = scene
    args = _args(
        data, basedir, "--expname", "smoke_sos",
        "--max_steps", "2", "--i_print", "1", "--i_weights", "100000",
        "--patch_tune", "--batch_size", "2", "--patch_size", "4",
        "--patch_stride", "2", "--use_dino", "--use_correlation",
        "--use_geoCorr", "--rand_neg", "--fix_backbone",
        "--correlation_w", "0.1", "--Gcorrelation_w", "0.01",
        "--sem_with_coord", "--use_masks", "--clus_no_sfm", "--ret_cluster",
    )
    # _args appends --no_semantics; SOS needs the semantic branch back on
    args.no_semantics = False
    args.use_semantics = True
    run_nerf.main(args)
    run_dir = os.path.join(basedir, "smoke_sos")
    assert os.path.exists(os.path.join(run_dir, "eval", "log.json"))
    log = json.load(open(os.path.join(run_dir, "eval", "log.json")))
    assert "total_clus_ari" in log


def test_cli_sos_synthetic_extractor(scene):
    """--dino_synthetic swaps the random-init ViT for the photometric oracle
    (models/extractor.py SyntheticExtractor) through the FULL SOS driver:
    patch dataset, appearance + geo correlation losses, frozen backbone,
    eval with find_fg_flip riding the oracle's saliency attention. This is
    the CPU smoke of the appearance-path quality gate
    (tools/validate_sos_protocol.py phase 3)."""
    data, basedir = scene
    args = _args(
        data, basedir, "--expname", "smoke_sos_synth",
        "--max_steps", "2", "--i_print", "1", "--i_weights", "100000",
        "--patch_tune", "--batch_size", "2", "--patch_size", "4",
        "--patch_stride", "2", "--use_dino", "--dino_synthetic",
        "--use_correlation", "--use_geoCorr", "--rand_neg", "--fix_backbone",
        "--correlation_w", "1.0", "--Gcorrelation_w", "0.01",
        "--sem_with_coord", "--use_masks", "--clus_no_sfm", "--ret_cluster",
    )
    args.no_semantics = False
    args.use_semantics = True
    run_nerf.main(args)
    log = json.load(open(os.path.join(basedir, "smoke_sos_synth", "eval",
                                      "log.json")))
    assert "total_clus_ari" in log
    assert np.isfinite(log["total_psnr"])


def test_cli_build_lpips(scene, tmp_path):
    """--lpips_path/--lpips_backbone_path wire local torch weights into eval;
    without them build_lpips returns None (eval reports lpips as null)."""
    import torch

    data, basedir = scene
    args = _args(data, basedir)
    assert run_nerf.build_lpips(args) is None

    # synthesized torchvision-AlexNet + lpips v0.1 linear-head state dicts
    g = torch.Generator().manual_seed(0)
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    idx = [0, 3, 6, 8, 10]
    trunk = {}
    for ti, s in zip(idx, shapes):
        trunk[f"features.{ti}.weight"] = torch.randn(*s, generator=g) * 0.05
        trunk[f"features.{ti}.bias"] = torch.zeros(s[0])
    lin = {f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1, generator=g)
           for i, c in enumerate([64, 192, 384, 256, 256])}
    lp, bp = tmp_path / "alex_lin.pth", tmp_path / "alexnet.pth"
    torch.save(lin, lp)
    torch.save(trunk, bp)

    args = _args(data, basedir, "--lpips_path", str(lp),
                 "--lpips_backbone_path", str(bp))
    metric = run_nerf.build_lpips(args)
    assert metric is not None
    import jax.numpy as jnp

    a = jnp.zeros((64, 64, 3))
    b = jnp.ones((64, 64, 3))
    assert float(metric(a, b)[0]) > 0
    assert abs(float(metric(a, a)[0])) < 1e-6
