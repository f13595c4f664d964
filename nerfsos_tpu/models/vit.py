"""DINO Vision Transformer (ViT-S/16) in flax, with explicit attention output.

TPU-native rewrite of the reference's vendored DINO ViT
(``models/vision_transformer.py`` in VITA-Group/NeRF-SOS). The reference
harvests intermediates with torch forward hooks (``models/extractor.py:49-88``)
— pure functions just return them: ``__call__`` yields the last block's
residual-stream tokens (pre-final-norm, exactly what the reference's BLOCK
hook captures), the last block's post-softmax attention, and the final
normed tokens.

Parity notes: qkv_bias=True, LayerNorm eps=1e-6, EXACT (erf) GELU — torch
``nn.GELU`` default — and bicubic pos-embed interpolation for non-224 inputs
(``models/vision_transformer.py:174-194``).
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1", dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2", dtype=self.dtype, param_dtype=jnp.float32)(x)


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        H = self.num_heads
        head_dim = C // H
        scale = head_dim**-0.5

        qkv = nn.Dense(C * 3, use_bias=self.qkv_bias, name="qkv",
                       dtype=self.dtype, param_dtype=jnp.float32)(x)
        qkv = qkv.reshape(B, N, 3, H, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, name="proj", dtype=self.dtype, param_dtype=jnp.float32)(out)
        return out, attn.astype(jnp.float32)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y, attn = Attention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        )
        x = x + y
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        )
        return x, attn


class VisionTransformer(nn.Module):
    """DINO ViT. Input NHWC in [0, 1]-normalized space (caller normalizes)."""

    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    pos_embed_size: int = 224  # training resolution that sized pos_embed
    dtype: Dtype = jnp.float32

    def interpolate_pos_encoding(self, pos_embed: jnp.ndarray, npatch: int,
                                 w: int, h: int) -> jnp.ndarray:
        N = pos_embed.shape[1] - 1
        if npatch == N and w == h:
            return pos_embed
        class_pos = pos_embed[:, :1]
        patch_pos = pos_embed[:, 1:]
        dim = pos_embed.shape[-1]
        w0 = w // self.patch_size
        h0 = h // self.patch_size
        side = int(N**0.5)
        patch_pos = patch_pos.reshape(1, side, side, dim)
        patch_pos = jax.image.resize(patch_pos, (1, w0, h0, dim), method="bicubic")
        return jnp.concatenate([class_pos, patch_pos.reshape(1, -1, dim)], axis=1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Args: x [B, H, W, 3]. Returns dict(tokens, attn_last, normed)."""
        B, H, W, _ = x.shape
        x = nn.Conv(self.embed_dim, kernel_size=(self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), name="patch_embed",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = x.reshape(B, -1, self.embed_dim)  # [B, N, C], row-major patches

        cls_token = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                               (1, 1, self.embed_dim), jnp.float32)
        n_pos = (self.pos_embed_size // self.patch_size) ** 2 + 1
        pos_embed = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                               (1, n_pos, self.embed_dim), jnp.float32)

        x = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)), x], axis=1)
        x = x + self.interpolate_pos_encoding(pos_embed, x.shape[1] - 1, H, W)
        x = x.astype(self.dtype)

        attn = None
        for i in range(self.depth):
            x, attn = Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                            dtype=self.dtype, name=f"blocks_{i}")(x)

        tokens = x.astype(jnp.float32)  # last-block residual stream (pre-norm)
        normed = nn.LayerNorm(epsilon=1e-6, name="norm")(x).astype(jnp.float32)
        return {"tokens": tokens, "attn_last": attn, "normed": normed}


def vit_tiny(**kw) -> VisionTransformer:
    return VisionTransformer(embed_dim=192, depth=12, num_heads=3, **kw)


def vit_small(**kw) -> VisionTransformer:
    return VisionTransformer(embed_dim=384, depth=12, num_heads=6, **kw)


def vit_base(**kw) -> VisionTransformer:
    return VisionTransformer(embed_dim=768, depth=12, num_heads=12, **kw)


class DINOHead(nn.Module):
    """DINO projection head (reference ``models/vision_transformer.py:257-291``).

    Not used in the NeRF-SOS main path; kept for component parity. The torch
    weight-norm last layer is folded into a plain Dense at conversion time.
    """

    out_dim: int
    nlayers: int = 3
    hidden_dim: int = 2048
    bottleneck_dim: int = 256

    @nn.compact
    def __call__(self, x):
        if self.nlayers == 1:
            x = nn.Dense(self.bottleneck_dim, name="mlp_0")(x)
        else:
            x = nn.gelu(nn.Dense(self.hidden_dim, name="mlp_0")(x), approximate=False)
            for i in range(self.nlayers - 2):
                x = nn.gelu(nn.Dense(self.hidden_dim, name=f"mlp_{i+1}")(x), approximate=False)
            x = nn.Dense(self.bottleneck_dim, name=f"mlp_{self.nlayers-1}")(x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return nn.Dense(self.out_dim, use_bias=False, name="last_layer")(x)


def torch_vit_state_to_flax(state_dict: Dict[str, Any], depth: int = 12) -> Dict[str, Any]:
    """Convert a torch-hub DINO ViT state dict to this module's param pytree.

    Key map per the reference module names (``models/vision_transformer.py``):
    ``patch_embed.proj`` [C_out, C_in, k, k] -> Conv kernel [k, k, C_in, C_out];
    Linear weights transposed; LayerNorm weight -> scale.
    """
    import numpy as np

    def t(x):
        return np.asarray(x, dtype=np.float32)

    p: Dict[str, Any] = {
        "cls_token": t(state_dict["cls_token"]),
        "pos_embed": t(state_dict["pos_embed"]),
        "patch_embed": {
            "kernel": t(state_dict["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": t(state_dict["patch_embed.proj.bias"]),
        },
        "norm": {
            "scale": t(state_dict["norm.weight"]),
            "bias": t(state_dict["norm.bias"]),
        },
    }
    for i in range(depth):
        b = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": {"scale": t(state_dict[f"{b}.norm1.weight"]),
                      "bias": t(state_dict[f"{b}.norm1.bias"])},
            "norm2": {"scale": t(state_dict[f"{b}.norm2.weight"]),
                      "bias": t(state_dict[f"{b}.norm2.bias"])},
            "attn": {
                "qkv": {"kernel": t(state_dict[f"{b}.attn.qkv.weight"]).T,
                        "bias": t(state_dict[f"{b}.attn.qkv.bias"])},
                "proj": {"kernel": t(state_dict[f"{b}.attn.proj.weight"]).T,
                         "bias": t(state_dict[f"{b}.attn.proj.bias"])},
            },
            "mlp": {
                "fc1": {"kernel": t(state_dict[f"{b}.mlp.fc1.weight"]).T,
                        "bias": t(state_dict[f"{b}.mlp.fc1.bias"])},
                "fc2": {"kernel": t(state_dict[f"{b}.mlp.fc2.weight"]).T,
                        "bias": t(state_dict[f"{b}.mlp.fc2.bias"])},
            },
        }
    return p
