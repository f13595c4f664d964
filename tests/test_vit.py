"""DINO ViT tests: flax architecture + torch-weight conversion parity.

A minimal torch ViT with DINO semantics (pre-norm blocks, qkv bias, exact
GELU, LN eps 1e-6) is built inline here as the parity oracle — its state-dict
keys follow the torch-hub naming the converter expects.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from nerfsos_tpu.models import vit as vit_lib
from nerfsos_tpu.models.extractor import VitExtractor, normalize_imagenet, resize_nearest_torch

DIM, DEPTH, HEADS, PATCH, IMG = 16, 2, 2, 4, 12


class TorchBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        B, N, C = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, N, 3, self.heads, C // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.proj(y)
        x = x + self.fc2(tnn.functional.gelu(self.fc1(self.norm2(x))))
        return x, attn


class TorchViT(tnn.Module):
    def __init__(self):
        super().__init__()
        n = (IMG // PATCH) ** 2
        self.proj = tnn.Conv2d(3, DIM, PATCH, PATCH)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, DIM) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, DIM) * 0.02)
        self.blocks = tnn.ModuleList([TorchBlock(DIM, HEADS) for _ in range(DEPTH)])
        self.norm = tnn.LayerNorm(DIM, eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        x = self.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x, attn = blk(x)
        return x, attn, self.norm(x)

    def hub_state_dict(self):
        sd = {
            "cls_token": self.cls_token.detach(),
            "pos_embed": self.pos_embed.detach(),
            "patch_embed.proj.weight": self.proj.weight.detach(),
            "patch_embed.proj.bias": self.proj.bias.detach(),
            "norm.weight": self.norm.weight.detach(),
            "norm.bias": self.norm.bias.detach(),
        }
        for i, b in enumerate(self.blocks):
            sd.update({
                f"blocks.{i}.norm1.weight": b.norm1.weight.detach(),
                f"blocks.{i}.norm1.bias": b.norm1.bias.detach(),
                f"blocks.{i}.norm2.weight": b.norm2.weight.detach(),
                f"blocks.{i}.norm2.bias": b.norm2.bias.detach(),
                f"blocks.{i}.attn.qkv.weight": b.qkv.weight.detach(),
                f"blocks.{i}.attn.qkv.bias": b.qkv.bias.detach(),
                f"blocks.{i}.attn.proj.weight": b.proj.weight.detach(),
                f"blocks.{i}.attn.proj.bias": b.proj.bias.detach(),
                f"blocks.{i}.mlp.fc1.weight": b.fc1.weight.detach(),
                f"blocks.{i}.mlp.fc1.bias": b.fc1.bias.detach(),
                f"blocks.{i}.mlp.fc2.weight": b.fc2.weight.detach(),
                f"blocks.{i}.mlp.fc2.bias": b.fc2.bias.detach(),
            })
        return sd


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    tm = TorchViT().eval()
    params = vit_lib.torch_vit_state_to_flax(
        {k: v.numpy() for k, v in tm.hub_state_dict().items()}, depth=DEPTH
    )
    fm = vit_lib.VisionTransformer(patch_size=PATCH, embed_dim=DIM, depth=DEPTH,
                                   num_heads=HEADS, pos_embed_size=IMG)
    return tm, fm, params


def test_converted_vit_matches_torch(converted):
    tm, fm, params = converted
    x = np.random.default_rng(0).random((2, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        t_tokens, t_attn, t_normed = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = fm.apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(np.array(out["tokens"]), t_tokens.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.array(out["attn_last"]), t_attn.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.array(out["normed"]), t_normed.numpy(), atol=2e-5)


def test_attention_rows_sum_to_one(converted):
    _, fm, params = converted
    x = jnp.ones((1, IMG, IMG, 3))
    out = fm.apply({"params": params}, x)
    np.testing.assert_allclose(np.array(out["attn_last"].sum(-1)), 1.0, atol=1e-5)


def test_pos_embed_interpolation_other_size(converted):
    _, fm, params = converted
    x = jnp.ones((1, 2 * IMG, 2 * IMG, 3))
    out = fm.apply({"params": params}, x)
    n = (2 * IMG // PATCH) ** 2 + 1
    assert out["tokens"].shape == (1, n, DIM)


def test_nearest_resize_matches_torch():
    x = np.random.default_rng(1).random((1, 10, 14, 3)).astype(np.float32)
    ours = np.array(resize_nearest_torch(jnp.array(x), 224, 224))
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(224, 224)
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=0)


def test_extractor_api_shapes():
    ext = VitExtractor("dino_vits16")
    # tiny stand-in backbone to keep test fast: patch 16 on 32x32 -> 4 tokens
    ext.vit = vit_lib.VisionTransformer(patch_size=16, embed_dim=32, depth=2,
                                        num_heads=2, pos_embed_size=224)
    ext.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 17, 19, 3)) * 0.5  # odd size exercises nearest resize
    out = ext.get_vit_attn_feat(x)
    n = (224 // 16) ** 2
    assert out["attn"].shape == (2, 1, n)
    assert out["cls_"].shape == (2, 32)
    assert out["feat"].shape == (2, n, 32)
    np.testing.assert_allclose(np.array(out["attn"].sum(-1)),
                               np.array(out["attn"].sum(-1)))  # finite
    assert bool(jnp.all(jnp.isfinite(out["feat"])))


def test_extractor_bf16_close_to_f32():
    """bf16 extractor (the CLI's --compute_dtype bfloat16 wiring): params
    stay f32, outputs track the f32 forward to bf16 rounding."""
    f32 = VitExtractor("dino_vits16")
    bf16 = VitExtractor("dino_vits16", dtype=jnp.bfloat16)
    for e in (f32, bf16):
        e.vit = vit_lib.VisionTransformer(patch_size=16, embed_dim=32, depth=2,
                                          num_heads=2, pos_embed_size=224,
                                          dtype=e.dtype)
    params = f32.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    a = f32.get_vit_attn_feat(x, params=params)
    b = bf16.get_vit_attn_feat(x, params=params)
    assert b["feat"].dtype == jnp.float32 or b["feat"].dtype == jnp.bfloat16
    ra = np.array(a["feat"], np.float32)
    rb = np.array(b["feat"], np.float32)
    denom = np.maximum(np.abs(ra), 1e-3)
    assert np.median(np.abs(ra - rb) / denom) < 0.05


def test_extractor_parity_with_torch_pipeline(converted):
    """Full get_vit_attn_feat vs a hand-rolled torch equivalent."""
    tm, fm, params = converted
    ext = VitExtractor("dino_vits16")
    ext.vit = fm
    ext.params = params
    x = np.random.default_rng(2).random((2, 7, 9, 3)).astype(np.float32)

    # torch pipeline: nearest-resize to IMG, imagenet norm, forward, slice
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    xt = torch.nn.functional.interpolate(xt, size=(IMG, IMG))
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        t_tokens, t_attn, _ = tm((xt - mean) / std)
    t_out = {
        "attn": t_attn.mean(1).unsqueeze(1)[:, :, 0, 1:].numpy(),
        "cls_": t_tokens[:, 0, :].numpy(),
        "feat": t_tokens[:, 1:, :].numpy(),
    }

    j_in = resize_nearest_torch(jnp.array(x), IMG, IMG)
    j_out_raw = fm.apply({"params": params}, normalize_imagenet(j_in))
    j_out = {
        "attn": np.array(j_out_raw["attn_last"].mean(1)[:, None, 0, 1:]),
        "cls_": np.array(j_out_raw["tokens"][:, 0, :]),
        "feat": np.array(j_out_raw["tokens"][:, 1:, :]),
    }
    for k in t_out:
        np.testing.assert_allclose(j_out[k], t_out[k], atol=3e-5, err_msg=k)


def test_dino_head_shapes(key):
    head = vit_lib.DINOHead(out_dim=64, hidden_dim=32, bottleneck_dim=16)
    p = head.init(key, jnp.ones((4, 384)))
    out = head.apply(p, jnp.ones((4, 384)))
    assert out.shape == (4, 64)


def test_synthetic_extractor_contract():
    """SyntheticExtractor (the weightless quality-gate oracle) matches the
    VitExtractor return contract, is deterministic, and its features
    actually separate photometrically-distinct regions — the property that
    lets it drive the appearance-correlation loss to a segmentation
    endpoint (tools/validate_sos_protocol.py phase 3)."""
    from nerfsos_tpu.models.extractor import SyntheticExtractor

    ex = SyntheticExtractor()
    # two-tone image: left red-ish, right blue-ish
    x = np.zeros((2, 64, 64, 3), np.float32)
    x[..., :32, 0] = 0.9
    x[..., 32:, 2] = 0.8
    out = ex.get_vit_attn_feat(jnp.array(x))
    assert out["feat"].shape == (2, 196, 384)
    assert out["cls_"].shape == (2, 384)
    assert out["attn"].shape == (2, 1, 196)
    np.testing.assert_allclose(np.array(out["attn"]).sum(-1), 1.0, atol=1e-5)

    out2 = ex.get_vit_attn_feat(jnp.array(x), params=ex.params)
    np.testing.assert_array_equal(np.array(out["feat"]), np.array(out2["feat"]))

    # informativeness: tokens within one color region are mutually closer
    # than tokens across regions
    f = np.array(out["feat"][0]).reshape(14, 14, 384)
    left, right = f[7, 2], f[7, 11]
    left2 = f[3, 3]
    d_same = np.linalg.norm(left - left2)
    d_cross = np.linalg.norm(left - right)
    assert d_cross > 5 * d_same

    # non-square resize=False path (find_fg_flip uses it)
    y = jnp.array(np.random.RandomState(0).rand(1, 32, 48, 3).astype(np.float32))
    o = ex.get_vit_attn_feat(y, resize=False)
    assert o["feat"].shape == (1, (32 // 16) * (48 // 16), 384)
