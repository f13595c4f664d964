"""NeRF-SOS TPU — main CLI driver.

TPU-native rewrite of the reference entry point (``run_nerf.py`` in
VITA-Group/NeRF-SOS): same flag surface and run-directory layout, four modes
(``--eval``, ``--eval_video``, ``--eval_vol``, train). Differences by design:

- one jitted train step per mode (render+loss+Adam fused) instead of eager
  torch; batches stream from numpy samplers via a single device_put;
- ``--gpuid`` is accepted but ignored (device selection is JAX's); multi-chip
  data parallelism engages automatically when >1 device is visible;
- checkpoints are orbax directories; the reference's torch ``.ckpt`` files
  load transparently through the converter (``engines/checkpoint.py``);
- known upstream flag quirks are fixed: ``--no_semantics`` still overrides
  ``use_semantics`` (parity, reference ``:250-251``), and the de-facto SOS
  invariant (patch_tune ∧ use_dino ∧ use_correlation ∧ use_geoCorr) is
  validated up front instead of crashing mid-step (SURVEY.md §7.4.3).
"""
from __future__ import annotations

import os
import shutil
import time

import numpy as np

from nerfsos_tpu.engines.config import ConfigArgumentParser, write_args_file


def create_arg_parser() -> ConfigArgumentParser:
    parser = ConfigArgumentParser()

    # basic options
    parser.add_argument("--config", type=str, default=None, help="config file path")
    parser.add_argument("--expname", type=str, help="experiment name")
    parser.add_argument("--basedir", type=str, default="./logs/")
    parser.add_argument("--gpuid", type=int, default=0,
                        help="accepted for script parity; device choice is JAX's")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--eval_video", action="store_true")
    parser.add_argument("--eval_vol", action="store_true")
    parser.add_argument("--vol_extents", nargs="+", type=float, default=[2.0])
    parser.add_argument("--vol_size", type=float, default=2.0 / 256)

    # dataset options
    parser.add_argument("--data_path", "--datadir", type=str, required=True)
    parser.add_argument("--data_type", "--dataset_type", type=str, required=True,
                        choices=["llff", "blender", "LINEMOD", "deepvoxels", "toydesk",
                                 "toydesk_custom", "tankstemple", "tankstemple_custom",
                                 "synthetic_custom", "dtu"])
    parser.add_argument("--subsample", type=int, default=0)
    parser.add_argument("--ndc", action="store_true", default=False)
    parser.add_argument("--spherify", action="store_true", default=False)
    parser.add_argument("--factor", type=int, default=8)
    parser.add_argument("--llffhold", type=int, default=8)
    parser.add_argument("--half_res", action="store_true", default=False)
    parser.add_argument("--white_bkgd", action="store_true", default=False)
    parser.add_argument("--test_skip", type=int, default=8)
    parser.add_argument("--dv_scene", type=str, default="greek",
                        choices=["armchair", "cube", "greek", "vase"])

    # training options
    parser.add_argument("--netdepth", type=int, default=8)
    parser.add_argument("--netwidth", type=int, default=256)
    parser.add_argument("--netdepth_fine", type=int, default=8)
    parser.add_argument("--netwidth_fine", type=int, default=256)
    parser.add_argument("--max_steps", "--N_iters", type=int, default=200000)
    parser.add_argument("--batch_size", "--N_rand", type=int, default=32 * 32 * 4)
    parser.add_argument("--lrate", type=float, default=5e-4)
    parser.add_argument("--ray_chunk", type=int, default=1024 * 32,
                        help="rays per compiled block (bounded-memory remat scan)")
    parser.add_argument("--pts_chunk", type=int, default=1024 * 256,
                        help="accepted for parity; points are not chunked on TPU")
    parser.add_argument("--no_batching", action="store_true")
    parser.add_argument("--decay_step", "--lrate_decay", type=int, default=250,
                        help="exp lr decay iteration (in 1000 steps)")
    parser.add_argument("--decay_rate", type=float, default=0.1)
    parser.add_argument("--no_reload", action="store_true")
    parser.add_argument("--ckpt_path", type=str, default="")
    parser.add_argument("--pin_mem", action="store_true", default=True)
    parser.add_argument("--num_workers", type=int, default=8,
                        help="accepted for parity; sampling is vectorized in-process")
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="MLP activation dtype (bfloat16 targets the MXU)")
    parser.add_argument("--no_fused_field", action="store_true",
                        help="disable the fused Pallas field kernel on TPU "
                             "(falls back to the XLA field with remat)")

    # rendering options
    parser.add_argument("--N_samples", type=int, default=64)
    parser.add_argument("--N_importance", type=int, default=64)
    parser.add_argument("--perturb", type=float, default=1.0)
    parser.add_argument("--use_viewdirs", action="store_true", default=True)
    parser.add_argument("--no_viewdirs", action="store_false", dest="use_viewdirs")
    parser.add_argument("--mipnerf", action="store_true", default=False)
    parser.add_argument("--use_embed", action="store_true", default=True)
    parser.add_argument("--no_embed", action="store_false", dest="use_embed")
    parser.add_argument("--conv_embed", action="store_true", default=False)
    parser.add_argument("--multires", type=int, default=10)
    parser.add_argument("--multires_views", type=int, default=4)
    parser.add_argument("--raw_noise_std", type=float, default=0.0)
    parser.add_argument("--precrop_iters", type=int, default=0)
    parser.add_argument("--precrop_frac", type=float, default=0.5)

    # logging/saving options
    parser.add_argument("--i_print", type=int, default=500)
    parser.add_argument("--i_verbose", type=int, default=500)
    parser.add_argument("--i_img", type=int, default=900000)
    parser.add_argument("--log_img_idx", type=int, default=0)
    parser.add_argument("--i_weights", type=int, default=10000)
    parser.add_argument("--i_testset", type=int, default=50000)
    parser.add_argument("--i_video", type=int, default=50000)

    # NeRF-SOS options
    parser.add_argument("--use_semantics", action="store_true", default=True)
    parser.add_argument("--no_semantics", action="store_true", default=False)
    parser.add_argument("--sem_w", type=float, default=0,
                        help="parity only: the semantic CE loss is dead code upstream")
    parser.add_argument("--rgb_w", type=float, default=1)
    parser.add_argument("--load_nostrict", action="store_true", default=False)
    parser.add_argument("--patch_tune", action="store_true", default=False)
    parser.add_argument("--patch_size", type=int, default=32)
    parser.add_argument("--patch_stride", type=int, default=1)
    parser.add_argument("--bin_thres", type=float, default=0.3)
    parser.add_argument("--use_dino", action="store_true", default=False)
    parser.add_argument("--dino_ckpt", type=str, default="",
                        help="local path to DINO ViT-S/16 torch weights "
                             "(torch.hub is unavailable offline)")
    parser.add_argument("--dino_synthetic", action="store_true", default=False,
                        help="replace the DINO backbone with the photometric "
                             "oracle extractor (end-to-end quality gates in "
                             "weightless environments; NOT a reference "
                             "feature — see models/extractor.py "
                             "SyntheticExtractor)")
    parser.add_argument("--lpips_path", type=str, default="",
                        help="local path to the lpips package's linear-head "
                             "weights (e.g. lpips/weights/v0.1/alex.pth); "
                             "without it eval reports lpips as null")
    parser.add_argument("--lpips_backbone_path", type=str, default="",
                        help="local path to the torchvision backbone state "
                             "dict matching --lpips_net")
    parser.add_argument("--lpips_net", type=str, default="alex",
                        choices=["alex", "vgg"])
    parser.add_argument("--debug_nans", action="store_true", default=False,
                        help="enable jax_debug_nans (the reference keeps torch "
                             "anomaly detection ALWAYS on — reference "
                             "run_nerf.py:540; here it is opt-in because the "
                             "deoptimized graphs are a large slowdown)")
    parser.add_argument("--use_contrast", action="store_true", default=False)
    parser.add_argument("--fast_mode", action="store_true", default=False)
    parser.add_argument("--contrast_w", type=float, default=0)
    parser.add_argument("--verbose", action="store_true", default=False)
    parser.add_argument("--sem_layer", type=int, default=2)
    parser.add_argument("--fix_backbone", action="store_true", default=False)
    parser.add_argument("--ret_cluster", action="store_true", default=False)
    parser.add_argument("--correlation_w", type=float, default=0.001)
    parser.add_argument("--Gcorrelation_w", type=float, default=0.001)
    parser.add_argument("--use_correlation", action="store_true", default=False)
    parser.add_argument("--clus_no_sfm", action="store_true", default=False)
    parser.add_argument("--sem_dim", type=int, default=2)
    parser.add_argument("--N_cluster", type=int, default=2)
    parser.add_argument("--self_corr_w", type=float, default=0)
    parser.add_argument("--sem_with_coord", action="store_true", default=False)
    parser.add_argument("--sem_with_geo", action="store_true", default=False)
    parser.add_argument("--use_geoCorr", action="store_true", default=False)
    parser.add_argument("--pos_corr_w", type=float, default=0)
    parser.add_argument("--use_sim_matrix", action="store_true", default=False)
    parser.add_argument("--app_corr_params", nargs="*", type=float,
                        default=[0.18, 0.67, 0.46, 0.63])
    parser.add_argument("--geo_corr_params", nargs="*", type=float,
                        default=[3.0, 0.67, 10.0, 0.63])
    parser.add_argument("--use_masks", action="store_true", default=False)
    parser.add_argument("--rand_neg", action="store_true", default=False)
    parser.add_argument("--seed", type=int, default=0)
    return parser


def build_model(args):
    import jax

    from nerfsos_tpu.models.mip import MipNeRFNet
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet

    cfg = NeRFConfig(
        netdepth=args.netdepth, netwidth=args.netwidth,
        netdepth_fine=args.netdepth_fine, netwidth_fine=args.netwidth_fine,
        n_samples=args.N_samples, n_importance=args.N_importance,
        use_viewdirs=args.use_viewdirs, use_embed=args.use_embed,
        multires=args.multires, multires_views=args.multires_views,
        conv_embed=args.conv_embed, perturb=args.perturb,
        raw_noise_std=args.raw_noise_std, white_bkgd=args.white_bkgd,
        use_semantics=args.use_semantics and not args.mipnerf,
        sem_layer=args.sem_layer, sem_dim=args.sem_dim,
        sem_with_coord=args.sem_with_coord, sem_with_geo=args.sem_with_geo,
        ray_block=args.ray_chunk, compute_dtype=args.compute_dtype,
    )
    if args.mipnerf:
        return MipNeRFNet(cfg), cfg
    # Production TPU path: the fused Pallas render/train kernels (field +
    # composite in one kernel per pass, in-kernel VJP) let the step drop
    # remat entirely — see ops/pallas/fused_render.py and the round-3 numbers
    # in README.md. CPU keeps the XLA field (interpret-mode pallas is
    # debug-only). The old `field_bwd_block=768` SOS override is gone: the
    # SOS/train path routes through fused_train_render_planar, which never
    # reads it (the knob only affects fused_field's planar VJP — the mip
    # train path), and the round-2 compile ceiling that motivated it was the
    # 16 MB default VMEM scoped stack, raisable via CompilerParams.
    if jax.default_backend() == "tpu" and not args.no_fused_field:
        from nerfsos_tpu.ops.pallas.fused_field import supports_fused

        if supports_fused(cfg):
            import dataclasses as _dc

            cfg = _dc.replace(cfg, fused_field=True, remat=False)
    return NeRFNet(cfg), cfg


def build_dino(args):
    """Frozen DINO extractor; random-init fallback when no local weights."""
    import jax
    import jax.numpy as jnp

    from nerfsos_tpu.models.extractor import SyntheticExtractor, VitExtractor

    # DINO inference follows the field's compute dtype: f32 by default
    # (torch parity); bf16 halves the extractor forward on the MXU. Features
    # only feed the no-grad fd / sim-matrix inputs of the correlation losses.
    dt = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    if args.dino_synthetic:
        print("> Photometric oracle extractor (--dino_synthetic): informative "
              "features without pretrained weights — quality gates only.")
        return SyntheticExtractor(dtype=dt)
    dino = VitExtractor("dino_vits16", dtype=dt)
    if args.dino_ckpt and os.path.exists(args.dino_ckpt):
        dino.load_torch_checkpoint(args.dino_ckpt)
        print(f"> Loaded DINO weights from {args.dino_ckpt}")
    else:
        dino.init(jax.random.PRNGKey(42))
        print("[Warning!] No --dino_ckpt provided; DINO is randomly initialized "
              "(correlation-loss features will be meaningless; fine for smoke runs).")
    return dino


def build_lpips(args):
    """LPIPS metric from local weight files, or None (eval reports null).

    The reference instantiates both ``lpips`` nets at import time
    (``utils/image.py:33-34``); here the metric is built only when local
    weights are provided (weights are not downloadable offline).
    """
    if not (args.lpips_path and os.path.exists(args.lpips_path)):
        return None
    import torch

    from nerfsos_tpu.ops.lpips import LPIPSMetric, load_torch_lpips

    lin = torch.load(args.lpips_path, map_location="cpu")
    if not (args.lpips_backbone_path and os.path.exists(args.lpips_backbone_path)):
        print("[Warning!] --lpips_path given without --lpips_backbone_path; "
              "lpips disabled (needs the torchvision trunk weights).")
        return None
    trunk = torch.load(args.lpips_backbone_path, map_location="cpu")
    lin = {k: v.numpy() for k, v in lin.items()}
    trunk = {k: v.numpy() for k, v in trunk.items()}
    metric = LPIPSMetric(net=args.lpips_net,
                         params=load_torch_lpips(lin, trunk, net=args.lpips_net))
    print(f"> Loaded LPIPS ({args.lpips_net}) weights from {args.lpips_path}")
    return metric


class SummaryWriter:
    """TensorBoard writer (torch.utils.tensorboard) with JSONL fallback."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter

            self._tb = TBWriter(log_dir=log_dir)
        except Exception:
            self._tb = None
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value, step: int):
        import json

        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n")
        self._jsonl.flush()

    def add_image(self, tag: str, img, step: int):
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")


def main(args):
    import jax
    import jax.numpy as jnp

    from nerfsos_tpu.data.datasets import ExhibitDataset, PatchDataset, RayDataset, ViewDataset
    from nerfsos_tpu.engines import checkpoint as ckpt_lib
    from nerfsos_tpu.engines import eval as eval_lib
    from nerfsos_tpu.engines.sos import SOSConfig, make_sos_train_step, online_seg_metrics
    from nerfsos_tpu.engines.state import (
        TrainState,
        exp_decay_schedule,
        fast_forward_schedule,
        make_optimizer,
    )
    from nerfsos_tpu.engines.trainer import make_rgb_train_step
    from nerfsos_tpu.losses.correlation import CorrelationLoss, GeoCorrelationLoss
    from nerfsos_tpu.parallel import mesh as pmesh
    from nerfsos_tpu.utils.vis import to8b

    if args.debug_nans:
        from nerfsos_tpu.utils.debug import enable_nan_debugging

        enable_nan_debugging(True)
        print("> jax_debug_nans enabled")
    if args.no_semantics:
        args.use_semantics = False
    print(f"> Semantic branch is {args.use_semantics}")
    print(f"> Devices: {jax.devices()}")

    sos_mode = args.patch_tune and args.use_dino and (args.use_correlation or args.use_geoCorr)
    if args.patch_tune and not args.use_dino and (args.use_correlation or args.use_geoCorr):
        raise SystemExit("--use_correlation/--use_geoCorr require --use_dino "
                         "(the reference crashes here implicitly; we validate up front)")

    # run dir layout parity (reference run_nerf.py:258-274)
    run_dir = os.path.join(args.basedir, args.expname)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    log_dir = os.path.join(run_dir, "tensorboard")
    if not os.path.exists(run_dir) and args.eval:
        print("Error: The specified working directory does not exist!")
        return
    for d in (run_dir, ckpt_dir, log_dir):
        os.makedirs(d, exist_ok=True)
    if not args.eval:
        write_args_file(args, os.path.join(run_dir, "args.txt"))
        if args.config and os.path.exists(args.config):
            shutil.copy(args.config, os.path.join(run_dir, "config.txt"))

    # model / optimizer
    net, cfg = build_model(args)
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params = net.init(init_key)
    tx = make_optimizer(args.lrate, args.decay_rate, args.decay_step * 1000,
                        fix_backbone=args.fix_backbone, params=params)
    state = TrainState.create(params, tx)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    print("Num of Params:", n_params)

    dino = build_dino(args) if args.use_dino else None

    # checkpoint discovery / resume (reference run_nerf.py:336-360)
    global_step = 0
    ckpt_path = args.ckpt_path
    if not ckpt_path and not args.no_reload:
        ckpt_path = ckpt_lib.find_latest_checkpoint(ckpt_dir) or ""
    if ckpt_path and not os.path.exists(ckpt_path):
        raise SystemExit(f"[Error:] ckpt path {ckpt_path} not exist!")
    if ckpt_path and os.path.exists(ckpt_path):
        print("Reloading from checkpoint:", ckpt_path)
        if ckpt_path.endswith(".ckpt") and os.path.isfile(ckpt_path):
            loaded, global_step = ckpt_lib.load_torch_nerf_checkpoint(ckpt_path)
            # Deep-merge: a pretrained RGB-only ckpt must not drop this
            # model's freshly-initialized semantic head (--load_nostrict is
            # exactly the flagship finetune scenario, run_nerf.py:356 upstream)
            merged = ckpt_lib.merge_params(state.params, loaded,
                                           strict=not args.load_nostrict)
            # The torch ckpt's Adam moments are not ingested (fresh optax
            # state), but the LR schedule must resume from global_step — the
            # reference calls scheduler.step(global_step) (run_nerf.py:355,
            # engines/lr.py:20-23), so a 150k-step finetune starts at the
            # decayed LR, not init_lr.
            state = state.replace(
                params=merged,
                step=jnp.asarray(global_step, jnp.int32),
                opt_state=fast_forward_schedule(state.opt_state, global_step),
            )
        else:
            restored = ckpt_lib.load_checkpoint(ckpt_path)
            global_step = int(restored["global_step"])
            # Same merge semantics as the torch-ckpt path: strict load errors
            # on missing/extra/shape-mismatched leaves (torch
            # load_state_dict raises on size mismatch even at strict=False);
            # --load_nostrict keeps the fresh init for such leaves (e.g.
            # resuming an RGB pretrain into a --sem_with_coord SOS model,
            # the reference SOS scripts' scenario).
            merged = ckpt_lib.merge_params(state.params, restored["params"],
                                           strict=not args.load_nostrict)
            changed = any(
                m is not r for m, r in zip(jax.tree_util.tree_leaves(merged),
                                           jax.tree_util.tree_leaves(restored["params"]))
            ) if jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(restored["params"]) else True
            state = state.replace(params=merged,
                                  step=jnp.asarray(global_step, jnp.int32))
            if changed and "opt_state" in restored:
                # params partially re-initialized: the saved Adam moments no
                # longer line up leaf-for-leaf — keep fresh opt state, resume
                # only the LR schedule
                print("[resume] partial param load: skipping optimizer state")
                restored = dict(restored)
                restored.pop("opt_state", None)
                state = state.replace(
                    opt_state=fast_forward_schedule(state.opt_state, global_step)
                )
            if "opt_state" in restored:
                try:
                    state = state.replace(
                        opt_state=jax.tree_util.tree_unflatten(
                            jax.tree_util.tree_structure(state.opt_state),
                            jax.tree_util.tree_leaves(restored["opt_state"]),
                        )
                    )
                except Exception:
                    # mismatched opt structure (e.g. resuming a plain-Adam
                    # pretrain into a fix_backbone multi_transform): keep the
                    # fresh opt state but resume the LR schedule at
                    # global_step (reference scheduler.step(global_step))
                    print("[Error]: optimizer initialization failed!")
                    state = state.replace(
                        opt_state=fast_forward_schedule(state.opt_state, global_step)
                    )

    # datasets
    print("Loading nerf data:", args.data_path)
    test_set = RayDataset(args.data_path, split="test", args=args,
                          subsample=args.subsample, use_masks=args.use_masks,
                          bin_thres=args.bin_thres)
    try:
        exhibit_set = ExhibitDataset(args.data_path, args=args, subsample=args.subsample)
    except FileNotFoundError:
        exhibit_set = None
        print("Warning: No exhibit set!")

    near, far = test_set.near_far()
    radii = test_set.radii()
    mesh = pmesh.make_mesh() if len(jax.devices()) > 1 else None
    # On a real multi-chip TPU mesh the fused Pallas kernels must run
    # shard-local (GSPMD can't partition tpu custom calls) -> shard_map DP
    # with explicit collectives. CPU meshes (tests/dryruns) keep GSPMD, which
    # is bit-equal to single-device there.
    spmd = "shard_map" if (mesh is not None and
                           jax.default_backend() == "tpu") else "gspmd"

    def render_kwargs():
        """Statics for eval/video renders ONLY (feed make_render_fn)."""
        kw = {"radii": radii} if args.mipnerf else {}
        # Multi-chip TPU: shard eval-render rays over the mesh (shard_map in
        # make_render_fn — no collectives, Pallas kernels shard-local).
        if mesh is not None and jax.default_backend() == "tpu":
            kw["mesh"] = mesh
        return kw

    def train_net_kwargs():
        """Statics threaded into the model INSIDE the train step. No 'mesh'
        here: render_rays has no such parameter (the train step expresses its
        own data parallelism via ``spmd``) — passing it crashes at trace time
        on real multi-chip."""
        return {"radii": radii} if args.mipnerf else {}

    lpips_metric = build_lpips(args)

    def do_evaluate(save_dir):
        return eval_lib.evaluate(net, state.params, test_set, save_dir=save_dir,
                                 fast_mode=args.fast_mode, ret_cluster=args.ret_cluster,
                                 clus_no_sfm=args.clus_no_sfm, n_cluster=args.N_cluster,
                                 find_fg=dino is not None, dino=dino,
                                 lpips_metric=lpips_metric, **render_kwargs())

    # ---------------------------------------------------------------- modes
    if args.eval:
        print("> Start to evaluate")
        do_evaluate(os.path.join(run_dir, "eval"))
        return

    if args.eval_video and exhibit_set is not None:
        eval_lib.render_video(net, state.params, exhibit_set, save_dir=run_dir,
                              suffix=args.expname, ret_cluster=args.ret_cluster,
                              clus_no_sfm=args.clus_no_sfm, n_cluster=args.N_cluster,
                              find_fg=dino is not None, dino=dino, **render_kwargs())
        return

    if args.eval_vol:
        print("> Start to export density")
        extents = args.vol_extents
        if len(extents) == 1:
            extents = extents * 3
        if len(extents) != 3:
            print("Unsupported length of extents:", extents)
            return
        eval_lib.export_density(net, state.params, extents=tuple(extents),
                                voxel_size=args.vol_size,
                                save_dir=os.path.join(run_dir, "eval"))
        return

    # ---------------------------------------------------------------- train
    rng = np.random.default_rng(args.seed)
    if not args.no_batching:
        if args.patch_tune:
            train_set = PatchDataset(args.data_path, split="train", args=args,
                                     subsample=args.subsample,
                                     patch_size=args.patch_size,
                                     patch_stride=args.patch_stride,
                                     bin_thres=args.bin_thres,
                                     ret_k=args.use_geoCorr)
        else:
            train_set = RayDataset(args.data_path, split="train", args=args,
                                   subsample=args.subsample, bin_thres=args.bin_thres)
    else:
        train_set = ViewDataset(args.data_path, split="train", args=args,
                                subsample=args.subsample,
                                precrop_iters=args.precrop_iters,
                                precrop_frac=args.precrop_frac)

    if sos_mode:
        sos_cfg = SOSConfig(
            batch_size=args.batch_size, patch_size=args.patch_size,
            patch_stride=args.patch_stride, rgb_w=args.rgb_w,
            correlation_w=args.correlation_w, Gcorrelation_w=args.Gcorrelation_w,
            contrast_w=args.contrast_w, use_dino=args.use_dino,
            use_correlation=args.use_correlation, use_geoCorr=args.use_geoCorr,
            use_contrast=args.use_contrast, fix_backbone=args.fix_backbone,
        )
        app_loss = CorrelationLoss.from_params(
            args.app_corr_params, use_sim_matrix=args.use_sim_matrix, rand_neg=args.rand_neg)
        geo_loss = GeoCorrelationLoss.from_params(
            args.geo_corr_params, use_sim_matrix=args.use_sim_matrix, rand_neg=args.rand_neg)
        step_fn = make_sos_train_step(net, dino, app_loss, geo_loss, sos_cfg,
                                      near, far, mesh=mesh, spmd=spmd)
        dino_params = dino.params
    else:
        step_fn = make_rgb_train_step(net, near, far, rgb_w=args.rgb_w, mesh=mesh,
                                      net_kwargs=train_net_kwargs(), spmd=spmd)

    writer = SummaryWriter(log_dir)
    lr_schedule = exp_decay_schedule(args.lrate, args.decay_rate, args.decay_step * 1000)
    print(f"> Start Iteration from {global_step}")
    time0 = time.time()

    while global_step < args.max_steps:
        global_step += 1
        key, step_key = jax.random.split(key)

        if args.patch_tune:
            batch = train_set.sample_batch(rng, args.batch_size)
        elif args.no_batching:
            batch = train_set.sample_batch(rng, args.batch_size, step=global_step)
        else:
            batch = train_set.sample_batch(rng, args.batch_size)
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                        if k in ("rays", "target", "masks")}
        if "masks" not in device_batch:
            device_batch["masks"] = jnp.zeros((device_batch["target"].shape[0], 1))

        if sos_mode:
            state, metrics = step_fn(state, dino_params, device_batch, step_key)
        else:
            state, metrics = step_fn(state, device_batch, step_key)

        # ------------------------------------------------ logging
        if (global_step % args.i_print == 0) or global_step == 1:
            m = {k: float(v) for k, v in metrics.items()}
            avg_time = (time.time() - time0) / args.i_print
            rays_per_step = device_batch["target"].shape[0]
            seg = {}
            if sos_mode:
                # recompute semantics for online ARI (reference trainer :174-198)
                out = net(state.params, device_batch["rays"], (near, far),
                          key=step_key, train=False)
                seg = online_seg_metrics(out["semantics"], batch["masks"],
                                         args.batch_size, args.patch_size,
                                         n_cluster=args.N_cluster,
                                         clus_no_sfm=args.clus_no_sfm)
            print(f"[Logging info]: expname: {args.expname}")
            print(f"[TRAIN] Iter: {global_step}/{args.max_steps} "
                  f"Loss: {m.get('loss', 0):.4f} L_sem0:{m.get('sem0', 0):.4f} "
                  f"L_sem1:{m.get('sem1', 0):.4f} L_img0:{m.get('img0', 0):.4f} "
                  f"L_img1:{m.get('img1', 0):.4f} L_contrast:{m.get('contrast', 0):.4f}")
            print(f"L_corr0:{m.get('corr0', 0):.4f} L_corr1:{m.get('corr1', 0):.4f} "
                  f"L_geo_corr0:{m.get('geo_corr0', 0):.4f} L_geo_corr1:{m.get('geo_corr1', 0):.4f} "
                  f"PSNR: {m.get('psnr', 0):.4f} Average Time: {avg_time:.4f} "
                  f"({rays_per_step / max(avg_time, 1e-9):.0f} rays/s)")
            if seg:
                print(f"clus_ari: {seg['clus_ari']:.4f} clus_ari_fg: {seg['clus_ari_fg']:.4f} "
                      f"sem_ari: {seg['sem_ari']:.4f} sem_ari_fg: {seg['sem_ari_fg']:.4f}")
            time0 = time.time()
            writer.add_scalar("train/loss", m.get("loss", 0), global_step)
            writer.add_scalar("train/psnr", m.get("psnr", 0), global_step)
            writer.add_scalar("l_rate/group_0", float(lr_schedule(global_step)), global_step)

        if global_step % args.i_img == 0:
            view = test_set.get_view(args.log_img_idx)
            render_fn = eval_lib.make_render_fn(net, near, far, **render_kwargs())
            ret, _ = eval_lib.eval_one_view(render_fn, state.params, view,
                                            clus_no_sfm=args.clus_no_sfm,
                                            n_cluster=args.N_cluster)
            writer.add_image("test/rgb", to8b(ret["rgb"]), global_step)
            writer.add_image("test/disp", to8b(ret["disp"] / np.max(ret["disp"])), global_step)

        if global_step % args.i_weights == 0:
            path = os.path.join(ckpt_dir, f"{global_step:08d}")
            print("Checkpointing at", path)
            ckpt_lib.save_checkpoint(path, global_step, state.params, state.opt_state)
            ckpt_lib.save_checkpoint(os.path.join(ckpt_dir, "latest"), global_step,
                                     state.params, state.opt_state)

        if global_step % args.i_testset == 0:
            print("Evaluating test images ...")
            md = do_evaluate(os.path.join(run_dir, f"testset_{global_step:08d}"))
            writer.add_scalar("test/mse", md["mse"], global_step)
            writer.add_scalar("test/psnr", md["psnr"], global_step)

        if global_step % args.i_video == 0 and exhibit_set is not None:
            eval_lib.render_video(net, state.params, exhibit_set, save_dir=run_dir,
                                  suffix=str(global_step), ret_cluster=args.ret_cluster,
                                  clus_no_sfm=args.clus_no_sfm, n_cluster=args.N_cluster,
                                  find_fg=dino is not None, dino=dino)

    ckpt_lib.save_checkpoint(os.path.join(ckpt_dir, "last"), global_step,
                             state.params, state.opt_state)

    # final eval (reference run_nerf.py:527-532)
    do_evaluate(os.path.join(run_dir, "eval"))
    if args.eval_video and exhibit_set is not None:
        eval_lib.render_video(net, state.params, exhibit_set,
                              save_dir=os.path.join(run_dir, "eval"),
                              ret_cluster=args.ret_cluster, clus_no_sfm=args.clus_no_sfm,
                              n_cluster=args.N_cluster, find_fg=dino is not None, dino=dino)


if __name__ == "__main__":
    np.random.seed(0)
    parser = create_arg_parser()
    parsed, _ = parser.parse_known_args()
    main(parsed)
