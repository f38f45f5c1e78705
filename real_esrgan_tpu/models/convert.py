"""PyTorch <-> JAX weight conversion.

Loads the reference's published checkpoints into this framework's pytrees:

* Generator ``state_dict`` / ``ema_state_dict`` (the EMA dict carries a
  ``model.`` prefix that consumers strip, /root/reference/inference.py:33-36,
  test.py:33-37) -> Generator params.
* Discriminator with torch ``spectral_norm`` (weight_orig/weight_u keys,
  /root/reference/model.py:140-168) -> UNetDiscriminator params+batch_stats.
* torchvision VGG19 ``features.N`` -> VGG19Features params.

All convs transpose OIHW -> HWIO.  Conversion is pure numpy; torch is only
needed to unpickle ``.pth.tar`` files (helper ``load_torch_checkpoint``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

from real_esrgan_tpu.models.vgg import TORCHVISION_INDEX


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module level
    return t.detach().cpu().numpy()


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def strip_prefix(state_dict: Mapping[str, Any], prefix: str = "model.") -> Dict[str, Any]:
    out = {}
    for k, v in state_dict.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Unpickle a reference ``.pth.tar`` checkpoint into numpy-valued dicts."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def to_numpy(obj):
        if isinstance(obj, dict):
            return {k: to_numpy(v) for k, v in obj.items()}
        if hasattr(obj, "detach"):
            return obj.detach().cpu().numpy()
        return obj

    return to_numpy(ckpt)


_GEN_SEQUENTIAL = {"upsampling1", "upsampling2", "conv3"}


def convert_generator(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference Generator state_dict -> flax params tree.

    Key grammar (reference model.py:206-252):
        conv1.{weight,bias}
        trunk.{i}.rdb{j}.conv{k}.{weight,bias}
        conv2.{weight,bias}
        upsampling{1,2}.0.{weight,bias}   (Sequential)
        conv3.0.{weight,bias}             (Sequential)
        conv4.{weight,bias}
    """
    sd = strip_prefix(dict(state_dict))
    params: Dict[str, Any] = {}

    trunk_re = re.compile(r"^trunk\.(\d+)\.(rdb\d)\.(conv\d)\.(weight|bias)$")
    for key, value in sd.items():
        v = _np(value)
        m = trunk_re.match(key)
        if m:
            i, rdb, conv, leaf = m.groups()
            block = (params.setdefault(f"trunk_{i}", {})
                     .setdefault(rdb, {}).setdefault(conv, {}))
            block["kernel" if leaf == "weight" else "bias"] = (
                _oihw_to_hwio(v) if leaf == "weight" else v)
            continue
        parts = key.split(".")
        if parts[0] in _GEN_SEQUENTIAL and parts[1] == "0":
            name, leaf = parts[0], parts[2]
        elif len(parts) == 2:
            name, leaf = parts
        else:
            raise KeyError(f"Unrecognized generator key: {key}")
        params.setdefault(name, {})["kernel" if leaf == "weight" else "bias"] = (
            _oihw_to_hwio(v) if leaf == "weight" else v)

    return params


def export_generator(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """flax params tree -> reference-format state_dict (for torch users)."""
    sd: Dict[str, np.ndarray] = {}

    def kernel_out(w):
        return np.transpose(np.asarray(w), (3, 2, 0, 1))

    for name, node in params.items():
        if name.startswith("trunk_"):
            i = name.split("_")[1]
            for rdb, convs in node.items():
                for conv, leaves in convs.items():
                    sd[f"trunk.{i}.{rdb}.{conv}.weight"] = kernel_out(leaves["kernel"])
                    sd[f"trunk.{i}.{rdb}.{conv}.bias"] = np.asarray(leaves["bias"])
        else:
            torch_name = f"{name}.0" if name in _GEN_SEQUENTIAL else name
            sd[f"{torch_name}.weight"] = kernel_out(node["kernel"])
            sd[f"{torch_name}.bias"] = np.asarray(node["bias"])
    return sd


_DISC_MAP = {
    "down_block1.0": "down1", "down_block2.0": "down2", "down_block3.0": "down3",
    "up_block1.0": "up1", "up_block2.0": "up2", "up_block3.0": "up3",
    "conv2.0": "conv2", "conv3.0": "conv3",
}
_DISC_SN_INDEX = {  # flax auto-numbers SpectralNorm wrappers in call order
    "down1": 0, "down2": 1, "down3": 2, "up1": 3, "up2": 4, "up3": 5,
    "conv2": 6, "conv3": 7,
}


def convert_discriminator(state_dict: Mapping[str, Any]):
    """Reference Discriminator state_dict -> (params, batch_stats).

    torch spectral_norm stores weight_orig / weight_u / weight_v per wrapped
    conv (model.py:140-168); flax SpectralNorm keeps u and sigma in
    ``batch_stats``.  We map weight_orig and u (both length out_channels) and
    recompute sigma from one power-iteration at first forward.
    """
    sd = strip_prefix(dict(state_dict))
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for plain in ("conv1", "conv4"):
        params[plain] = {
            "kernel": _oihw_to_hwio(_np(sd[f"{plain}.weight"])),
            "bias": _np(sd[f"{plain}.bias"]),
        }

    for torch_name, jax_name in _DISC_MAP.items():
        w = _np(sd[f"{torch_name}.weight_orig"])
        params[jax_name] = {"kernel": _oihw_to_hwio(w)}
        sn = f"SpectralNorm_{_DISC_SN_INDEX[jax_name]}"
        u_key = f"{torch_name}.weight_u"
        entry = {f"{jax_name}/kernel/sigma": np.asarray(1.0, np.float32)}
        if u_key in sd:
            entry[f"{jax_name}/kernel/u"] = _np(sd[u_key]).reshape(1, -1)
        else:
            entry[f"{jax_name}/kernel/u"] = np.random.RandomState(0).normal(
                size=(1, w.shape[0])).astype(np.float32)
        stats[sn] = entry

    return params, stats


def convert_vgg19(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision vgg19 state_dict -> VGG19Features params."""
    params: Dict[str, Any] = {}
    for idx, name in TORCHVISION_INDEX.items():
        wkey = f"features.{idx}.weight"
        if wkey not in state_dict:
            continue
        params[name] = {
            "kernel": _oihw_to_hwio(_np(state_dict[wkey])),
            "bias": _np(state_dict[f"features.{idx}.bias"]),
        }
    return params
