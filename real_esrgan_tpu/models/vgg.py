"""VGG19 feature extractor + perceptual ContentLoss, TPU-native (NHWC).

Re-design of the reference ``ContentLoss`` (/root/reference/model.py:278-335):
5 feature taps at torchvision node names features.{2,7,16,25,34} — the conv
outputs of conv1_2, conv2_2, conv3_4, conv4_4, conv5_4 — with ImageNet
normalization of both inputs and an L1 distance per tap.

Tap semantics: torchvision VGG19 uses ``nn.ReLU(inplace=True)``, so although
``create_feature_extractor`` names the conv outputs, the following ReLU
mutates those tensors in place before the loss consumes them — the reference
trainer *effectively* compares post-ReLU features at runtime.  We default to
``post_activation=True`` to match that observed behavior; set it False for
the pre-activation taps of the original Real-ESRGAN/basicsr formulation.

Pretrained ImageNet weights cannot be downloaded in this environment; the
torch->JAX converter (models/convert.py::convert_vgg19) loads a local
torchvision ``vgg19-*.pth`` if available, otherwise the loss runs with random
features (still a valid regularizer; tests exercise it that way).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG19 configuration "E": (name, out_channels); 'M' = 2x2/2 max pool.
VGG19_LAYOUT: Tuple = (
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512), "M",
)

# torchvision features.N index -> conv name (for converter bookkeeping)
TORCHVISION_INDEX = {
    0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3", 16: "conv3_4",
    19: "conv4_1", 21: "conv4_2", 23: "conv4_3", 25: "conv4_4",
    28: "conv5_1", 30: "conv5_2", 32: "conv5_3", 34: "conv5_4",
}

# reference feature_model_extractor_nodes (config.py:131) in conv-name terms:
DEFAULT_NODES = ("conv1_2", "conv2_2", "conv3_4", "conv4_4", "conv5_4")

# Host-side numpy (jit constant-folds): importing this module must never bind
# a device backend.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG19Features(nn.Module):
    """Runs VGG19 up to the deepest requested node, returning tapped features.

    ``post_activation=True`` (default) taps after the ReLU — what the
    reference's inplace-ReLU aliasing actually feeds its loss (see module
    docstring); False taps the raw conv outputs."""
    nodes: Sequence[str] = DEFAULT_NODES
    dtype: Any = jnp.float32
    post_activation: bool = True

    @nn.compact
    def __call__(self, x):
        taps = {}
        deepest = max(_layer_depth(n) for n in self.nodes)
        for i, spec in enumerate(VGG19_LAYOUT):
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            name, ch = spec
            pre = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                          param_dtype=jnp.float32, name=name)(x)
            x = nn.relu(pre)
            if name in self.nodes:
                taps[name] = (x if self.post_activation else pre).astype(
                    jnp.float32)
            if _layer_depth(name) >= deepest:
                break
        return [taps[n] for n in self.nodes]


def _layer_depth(name: str) -> int:
    order = [s[0] for s in VGG19_LAYOUT if s != "M"]
    return order.index(name)


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    return (x - IMAGENET_MEAN.astype(x.dtype)) / IMAGENET_STD.astype(x.dtype)


class ContentLoss:
    """Weighted multi-tap VGG L1 perceptual loss (functional wrapper)."""

    def __init__(self, nodes: Sequence[str] = DEFAULT_NODES,
                 weights: Sequence[float] = (0.1, 0.1, 1.0, 1.0, 1.0),
                 dtype: Any = jnp.float32, post_activation: bool = True):
        self.module = VGG19Features(nodes=tuple(nodes), dtype=dtype,
                                    post_activation=post_activation)
        self.weights = tuple(weights)

    def init(self, key, image_shape=(1, 64, 64, 3)):
        return self.module.init(key, jnp.zeros(image_shape))["params"]

    def __call__(self, params, sr, hr):
        """Returns (total_weighted_loss, per-tap losses)."""
        sr_f = self.module.apply({"params": params}, normalize_imagenet(sr))
        hr_f = self.module.apply({"params": params}, normalize_imagenet(hr))
        losses = [jnp.mean(jnp.abs(a - b)) for a, b in zip(sr_f, hr_f)]
        total = sum(w * l for w, l in zip(self.weights, losses))
        return total, losses
