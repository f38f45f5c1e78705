"""VGG19 feature extractor + content loss tests, including parity of the
converted torchvision-format weights against a torch functional forward."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from real_esrgan_tpu.models.convert import convert_vgg19
from real_esrgan_tpu.models.vgg import (
    ContentLoss, DEFAULT_NODES, TORCHVISION_INDEX, VGG19Features,
    normalize_imagenet,
)

RNG = np.random.default_rng(9)


def _random_torchvision_vgg_state(upto_index=34):
    """Random weights with torchvision vgg19 key naming (features.N)."""
    channels = {0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128),
                10: (128, 256), 12: (256, 256), 14: (256, 256), 16: (256, 256),
                19: (256, 512), 21: (512, 512), 23: (512, 512), 25: (512, 512),
                28: (512, 512), 30: (512, 512), 32: (512, 512), 34: (512, 512)}
    sd = {}
    for idx, (cin, cout) in channels.items():
        if idx > upto_index:
            break
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            (RNG.standard_normal((cout, cin, 3, 3)) * 0.03).astype(np.float32))
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            (RNG.standard_normal(cout) * 0.01).astype(np.float32))
    return sd


def _torch_vgg_features(sd, x, nodes, post_activation):
    """Independent torch functional VGG19 forward returning taps at the given
    conv names.  post_activation=True mirrors the reference's effective
    runtime behavior: nn.ReLU(inplace=True) mutates the FX-extracted conv
    output in place, so the loss sees post-ReLU features."""
    name_of = TORCHVISION_INDEX
    pool_after = {4, 9, 18, 27, 36}
    taps = {}
    t = x
    for idx in range(0, 35):
        if idx in pool_after:
            t = F.max_pool2d(t, 2, 2)
        if f"features.{idx}.weight" in sd:
            pre = F.conv2d(t, sd[f"features.{idx}.weight"],
                           sd[f"features.{idx}.bias"], padding=1)
            t = F.relu(pre)
            if name_of.get(idx) in nodes:
                taps[name_of[idx]] = t if post_activation else pre
    return [taps[n] for n in nodes]


def test_vgg_features_match_torch():
    sd = _random_torchvision_vgg_state()
    params = convert_vgg19(sd)
    x = RNG.random((1, 3, 64, 64)).astype(np.float32)

    for post in (True, False):
        with torch.no_grad():
            expected = _torch_vgg_features(sd, torch.from_numpy(x),
                                           DEFAULT_NODES, post)

        vgg = VGG19Features(nodes=DEFAULT_NODES, post_activation=post)
        got = vgg.apply({"params": params},
                        jnp.asarray(x.transpose(0, 2, 3, 1)))
        assert len(got) == 5
        for g, e in zip(got, expected):
            np.testing.assert_allclose(np.array(g).transpose(0, 3, 1, 2),
                                       e.numpy(), atol=2e-4, rtol=1e-3)


def test_content_loss_weighting_and_zero():
    loss = ContentLoss(weights=(0.1, 0.1, 1.0, 1.0, 1.0))
    params = loss.init(jax.random.PRNGKey(0))
    img = jnp.asarray(RNG.random((1, 64, 64, 3)).astype(np.float32))
    total, taps = loss(params, img, img)
    assert float(total) == 0.0
    img2 = jnp.clip(img + 0.1, 0, 1)
    total2, taps2 = loss(params, img2, img)
    assert float(total2) > 0
    manual = sum(w * float(t) for w, t in zip((0.1, 0.1, 1.0, 1.0, 1.0), taps2))
    np.testing.assert_allclose(float(total2), manual, rtol=1e-5)


def test_imagenet_normalize():
    x = jnp.ones((1, 2, 2, 3)) * 0.5
    out = np.array(normalize_imagenet(x))
    exp = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], exp, atol=1e-6)
