"""LPIPS perceptual metric in flax (AlexNet / VGG16 backbones).

The reference instantiates both ``lpips`` package nets at import time
(``utils/image.py:33-34`` — an import-time side effect this rebuild
deliberately avoids, SURVEY.md §7.4.7). Weights cannot be downloaded in this
environment; ``load_torch_lpips`` converts the lpips package's checkpoint
(backbone state dict + linear heads) when a local file is available, and
``lpips_fn`` raises a clear error otherwise.

Pipeline parity with lpips v0.1: inputs in [-1, 1], fixed shift/scale
normalization, per-layer unit-normalize over channels, squared diff, learned
1x1 convs, spatial mean, sum over layers.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

SHIFT = jnp.array([-0.030, -0.088, -0.188])
SCALE = jnp.array([0.458, 0.448, 0.450])


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet feature trunk; returns the five relu taps."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []

        def conv(x, feat, k, s, p, name):
            return nn.Conv(feat, (k, k), strides=(s, s), padding=[(p, p), (p, p)], name=name)(x)

        def maxpool(x):
            return nn.max_pool(x, (3, 3), strides=(2, 2))

        x = nn.relu(conv(x, 64, 11, 4, 2, "conv0"))
        taps.append(x)
        x = maxpool(x)
        x = nn.relu(conv(x, 192, 5, 1, 2, "conv1"))
        taps.append(x)
        x = maxpool(x)
        x = nn.relu(conv(x, 384, 3, 1, 1, "conv2"))
        taps.append(x)
        x = nn.relu(conv(x, 256, 3, 1, 1, "conv3"))
        taps.append(x)
        x = nn.relu(conv(x, 256, 3, 1, 1, "conv4"))
        taps.append(x)
        return taps


class VGG16Features(nn.Module):
    """torchvision VGG16 trunk; returns relu1_2/2_2/3_3/4_3/5_3."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        taps = []
        idx = 0
        for feat, reps in cfg:
            for _ in range(reps):
                x = nn.relu(nn.Conv(feat, (3, 3), padding=[(1, 1), (1, 1)], name=f"conv{idx}")(x))
                idx += 1
            taps.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


LPIPS_CHANNELS = {
    "alex": (64, 192, 384, 256, 256),
    "vgg": (64, 128, 256, 512, 512),
}


class LPIPS(nn.Module):
    """net: 'alex' | 'vgg'. Input NHWC in [-1, 1]."""

    net: str = "alex"

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        def norm_input(v):
            return (v - SHIFT) / SCALE

        trunk = AlexNetFeatures(name="trunk") if self.net == "alex" else VGG16Features(name="trunk")
        fx = trunk(norm_input(x))
        fy = trunk(norm_input(y))

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            an = a / jnp.sqrt(jnp.maximum(jnp.sum(a**2, -1, keepdims=True), 1e-10))
            bn = b / jnp.sqrt(jnp.maximum(jnp.sum(b**2, -1, keepdims=True), 1e-10))
            d = (an - bn) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def load_torch_lpips(lpips_state: Dict[str, Any], backbone_state: Dict[str, Any],
                     net: str = "alex") -> Dict[str, Any]:
    """Convert torch weights to the LPIPS param pytree.

    ``lpips_state``: the lpips package's ``lin{i}.model.1.weight`` heads.
    ``backbone_state``: torchvision features state dict
    (``features.{idx}.weight/bias``).
    """
    import numpy as np

    def conv_kernel(w):
        return np.asarray(w, np.float32).transpose(2, 3, 1, 0)

    trunk: Dict[str, Any] = {}
    if net == "alex":
        torch_idx = [0, 3, 6, 8, 10]
    else:  # vgg16 conv layers in features
        torch_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for mine, ti in enumerate(torch_idx):
        trunk[f"conv{mine}"] = {
            "kernel": conv_kernel(backbone_state[f"features.{ti}.weight"]),
            "bias": np.asarray(backbone_state[f"features.{ti}.bias"], np.float32),
        }
    params: Dict[str, Any] = {"trunk": trunk}
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lpips_state:
            key = f"lins.{i}.model.1.weight"
        params[f"lin{i}"] = {"kernel": conv_kernel(lpips_state[key])}
    return params


class LPIPSMetric:
    """Lazy holder usable from eval; raises if weights were never provided."""

    def __init__(self, net: str = "alex", params: Optional[Any] = None):
        self.module = LPIPS(net=net)
        self.params = params
        self.net = net

    def init_random(self, key: jax.Array, size: int = 64) -> Any:
        x = jnp.zeros((1, size, size, 3))
        self.params = self.module.init(key, x, x)["params"]
        return self.params

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray,
                 data_format: str = "HWC") -> jnp.ndarray:
        """Images in [0, 1]; converted to [-1, 1] like the lpips package."""
        if self.params is None:
            raise RuntimeError(
                "LPIPS weights not loaded; call load_torch_lpips with a local "
                "lpips checkpoint + torchvision backbone state dict."
            )
        if data_format == "HWC":
            img1, img2 = img1[None], img2[None]
        elif data_format == "NCHW":
            img1 = img1.transpose(0, 2, 3, 1)
            img2 = img2.transpose(0, 2, 3, 1)
        return self.module.apply({"params": self.params}, img1 * 2 - 1, img2 * 2 - 1)
