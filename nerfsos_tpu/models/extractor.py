"""Frozen DINO feature extraction for NeRF-SOS.

TPU-native rewrite of the reference ``VitExtractor``
(``models/extractor.py:20-224`` in VITA-Group/NeRF-SOS). The torch version
pulls intermediates out with forward hooks; here the flax ViT returns them
directly. API parity for the main path (``get_vit_attn_feat``,
reference ``:204-213``):

- input resized to 224x224 with NEAREST interpolation (torch
  ``F.interpolate`` default mode, reference ``:207``),
- ImageNet mean/std normalization,
- ``attn``: last block's head-mean CLS->patch attention [B, 1, N],
- ``cls_``: last block's CLS token [B, C] (pre-final-norm, per the hook),
- ``feat``: last block's patch tokens [B, N, C].
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from nerfsos_tpu.models import vit as vit_lib

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) / std over the trailing channel axis (NHWC)."""
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def resize_nearest_torch(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch ``F.interpolate(mode='nearest')`` parity: src = floor(dst * in/out).

    (jax.image.resize 'nearest' uses half-pixel centers — different indices.)
    """
    B, H, W, C = x.shape
    hs = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    ws = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    return x[:, hs][:, :, ws]


class VitExtractor:
    """Holds a flax ViT definition + frozen params; methods are pure."""

    def __init__(self, model_name: str = "dino_vits16", params: Optional[Any] = None,
                 dtype=jnp.float32):
        self.model_name = model_name
        if "8" in model_name:
            self.patch_size = 8
        else:
            self.patch_size = 16
        small = ("s" in model_name.replace("dino_vit", "")) or ("small" in model_name)
        self.embed_dim = 384 if small else 768
        self.num_heads = 6 if small else 12
        # f32 default = bit-parity with the torch reference; bf16 halves the
        # on-chip forward (9.6 -> 5.7 ms at the SOS 8x224^2 shape, one v5e).
        # Params stay f32 either way (param_dtype pinned in vit.py).
        self.dtype = dtype
        self.vit = vit_lib.VisionTransformer(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            num_heads=self.num_heads, depth=12, dtype=dtype,
        )
        self.params = params

    # ------------------------------------------------------------- setup

    def init(self, key: jax.Array, image_size: int = 224) -> Any:
        x = jnp.zeros((1, image_size, image_size, 3))
        self.params = self.vit.init(key, x)["params"]
        return self.params

    def load_torch_checkpoint(self, path: str) -> Any:
        """Load torch-hub DINO weights (e.g. dino_deitsmall16_pretrain.pth)."""
        import torch

        sd = torch.load(path, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: v.numpy() for k, v in sd.items()}
        self.params = vit_lib.torch_vit_state_to_flax(sd, depth=12)
        return self.params

    # ------------------------------------------------------------- API

    def get_patch_size(self) -> int:
        return self.patch_size

    def get_head_num(self) -> int:
        return self.num_heads

    def get_embedding_dim(self) -> int:
        return self.embed_dim

    def _forward(self, params: Any, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self.vit.apply({"params": params}, x)

    def get_vit_attn_feat(self, x: jnp.ndarray, params: Optional[Any] = None,
                          resize: bool = True) -> Dict[str, jnp.ndarray]:
        """Args: x [B, H, W, 3] in [0,1]. Returns dict(attn, cls_, feat).

        Parity: reference ``models/extractor.py:204-224`` (``_noresize``
        variant via ``resize=False``). Features come from the frozen
        backbone — callers should wrap in ``stop_gradient`` (the reference
        runs the DINO forward under the frozen module, grads never flow).
        """
        params = self.params if params is None else params
        if resize:
            x = resize_nearest_torch(x, 224, 224)
        x = normalize_imagenet(x)
        out = self._forward(params, x)
        attn = out["attn_last"].mean(axis=1)[:, None, 0, 1:]  # [B, 1, N]
        cls_ = out["tokens"][:, 0, :]
        feat = out["tokens"][:, 1:, :]
        return {"attn": attn, "cls_": cls_, "feat": feat}

    def get_vit_feature(self, x: jnp.ndarray, params: Optional[Any] = None) -> jnp.ndarray:
        """Final-norm patch tokens (reference ``:183-190``)."""
        params = self.params if params is None else params
        out = self._forward(params, normalize_imagenet(x))
        return out["normed"][:, 1:, :]


class Dino:
    """Alternative local-weights DINO loader (reference ``models/dino.py:27-99``,
    the commented-out path at its ``run_nerf.py:326-327``): same backbone as
    ``VitExtractor`` but constructed from an arch name + checkpoint path, with
    a last-layer attention accessor."""

    def __init__(self, arch: str = "vit_small", patch_size: int = 16,
                 ckpt_path: str = "", checkpoint_key: str = "teacher", fix: bool = True):
        name = {"vit_small": "dino_vits", "vit_base": "dino_vitb"}[arch] + str(patch_size)
        self._ext = VitExtractor(name)
        self.fix = fix
        if ckpt_path:
            import torch

            sd = torch.load(ckpt_path, map_location="cpu")
            if checkpoint_key in sd:
                sd = sd[checkpoint_key]
            sd = {k.replace("module.", "").replace("backbone.", ""): v for k, v in sd.items()}
            self._ext.params = vit_lib.torch_vit_state_to_flax(
                {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}, depth=12
            )
        else:
            self._ext.init(jax.random.PRNGKey(0))

    @property
    def params(self):
        return self._ext.params

    def forward_pass(self, x: jnp.ndarray):
        """Returns (cls_token, last-layer attention) like the reference."""
        out = self._ext.get_vit_attn_feat(x)
        return out["cls_"], out["attn"]


class SyntheticExtractor:
    """Oracle photometric feature extractor — a TEST HARNESS, not a
    reference component (the reference always loads pretrained DINO,
    ``models/extractor.py:29`` upstream).

    Interface-compatible with ``VitExtractor.get_vit_attn_feat`` (same
    224^2 nearest resize + ImageNet normalization, same 16x16 token grid,
    same ``{"attn", "cls_", "feat"}`` contract), but the token "features"
    are local photometric statistics — per-patch mean/std RGB — lifted to
    ``embed_dim`` through a fixed deterministic projection. On textured
    synthetic scenes these carry object identity, unlike a random-init ViT
    whose features measurably corrupt the trunk (REHEARSAL_r03 SOS rows:
    clus_ari 0.006). This lets the APPEARANCE-correlation path
    (``losses/correlation.py``; reference ``utils/image.py:263-400``) be
    driven to a held-out segmentation-quality endpoint in environments
    with no pretrained weights: ``tools/validate_sos_protocol.py`` phase 3,
    CLI ``--dino_synthetic``.

    ``attn`` is photometric saliency (distance of each token's stats from
    the image mean, L1-normalized) so ``find_fg_flip`` orients labels to
    the photometrically-distinct object.
    """

    def __init__(self, embed_dim: int = 384, dtype=jnp.float32):
        self.model_name = "synthetic_photometric"
        self.patch_size = 16
        self.embed_dim = embed_dim
        self.num_heads = 1
        self.dtype = dtype
        # Fixed projection stats(6) -> embed_dim: deterministic (PRNGKey(0)),
        # so features are a pure function of the image. Scaled like a random
        # feature map (1/sqrt(fan_in)).
        self.params = {
            "proj": jax.random.normal(jax.random.PRNGKey(0),
                                      (6, embed_dim), jnp.float32)
            / jnp.sqrt(6.0)
        }

    # interface parity with VitExtractor ---------------------------------
    def get_patch_size(self) -> int:
        return self.patch_size

    def get_head_num(self) -> int:
        return self.num_heads

    def get_embedding_dim(self) -> int:
        return self.embed_dim

    def get_vit_attn_feat(self, x: jnp.ndarray, params: Optional[Any] = None,
                          resize: bool = True) -> Dict[str, jnp.ndarray]:
        """x [B, H, W, 3] in [0,1] (H, W patch multiples when resize=False)."""
        params = self.params if params is None else params
        if resize:
            x = resize_nearest_torch(x, 224, 224)
        x = normalize_imagenet(x)
        B, H, W, _ = x.shape
        ps = self.patch_size
        gh, gw = H // ps, W // ps
        p = x.reshape(B, gh, ps, gw, ps, 3)
        mu = p.mean(axis=(2, 4))                       # [B, gh, gw, 3]
        sd = jnp.sqrt(jnp.maximum(
            (p * p).mean(axis=(2, 4)) - mu * mu, 0.0))
        stats = jnp.concatenate([mu, sd], axis=-1).reshape(B, gh * gw, 6)
        feat = (stats @ params["proj"]).astype(self.dtype)  # [B, N, C]
        cls_ = feat.mean(axis=1)                            # [B, C]
        sal = jnp.abs(stats - stats.mean(axis=1, keepdims=True)).sum(-1)
        attn = (sal / jnp.maximum(sal.sum(axis=-1, keepdims=True), 1e-8))
        return {"attn": attn[:, None, :].astype(self.dtype), "cls_": cls_,
                "feat": feat}


def attn_cosine_sim(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Pairwise token cosine similarity (reference ``models/extractor.py:12-17``)."""
    x = x[0]
    norm1 = jnp.linalg.norm(x, axis=2, keepdims=True)
    factor = jnp.maximum(norm1 @ jnp.swapaxes(norm1, 1, 2), eps)
    return (x @ jnp.swapaxes(x, 1, 2)) / factor
