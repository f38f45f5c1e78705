"""NIQE (Natural Image Quality Evaluator), TPU-native split design.

Re-design of the reference's batched torch NIQE
(/root/reference/image_quality_assessment.py:803-1032):

* The heavy per-pixel / per-block work — Y extraction, MSCN maps (7x7
  Gaussian with replicate padding), MATLAB-bicubic half-scale, block AGGD
  fits over a 9801-entry gamma table — runs as one jitted XLA program in
  float32 (all of it is table lookups, reductions and two MXU matmuls).
* The tiny, precision-sensitive tail — nan-aware MVG fit over the ~18 block
  feature vectors, pinv of a 36x36 matrix, Mahalanobis-style distance — runs
  on host in float64 numpy, matching the reference's float64 requirement
  (image_quality_assessment.py:990) without dragging f64 onto the TPU.

Pristine MVG statistics ship in assets/niqe_model.{mat,npz} (binary data
copied from the reference's published model files, keys ``mu_prisparam`` /
``cov_prisparam``, image_quality_assessment.py:976-977).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from real_esrgan_tpu.ops.resize import make_matlab_resize_matrix

DEFAULT_MODEL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets", "niqe_model.mat")

_GAM = np.arange(0.2, 10.001, 0.001)  # 9801 candidate shape params


def _r_gam_table() -> np.ndarray:
    from scipy.special import gammaln
    g = _GAM
    return np.exp(2 * gammaln(2.0 / g) - (gammaln(1.0 / g) + gammaln(3.0 / g)))


def _beta_factor_table() -> np.ndarray:
    """sqrt(gamma(1/a) / gamma(3/a)) for each candidate a."""
    from scipy.special import gammaln
    return np.exp(0.5 * (gammaln(1.0 / _GAM) - gammaln(3.0 / _GAM)))


def _mean_factor_table() -> np.ndarray:
    """gamma(2/a) / gamma(1/a) for each candidate a."""
    from scipy.special import gammaln
    return np.exp(gammaln(2.0 / _GAM) - gammaln(1.0 / _GAM))


def _gaussian_window(size: int = 7, sigma: float = 7.0 / 6.0) -> np.ndarray:
    ax = np.arange(size) - (size - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax)
    w = np.exp(-(xx ** 2 + yy ** 2) / (2 * sigma * sigma))
    return (w / w.sum()).astype(np.float32)


def _filter_replicate(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """2-D correlate with replicate ('nearest') padding on (B, H, W)."""
    k = window.shape[0]
    pad = k // 2
    x = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    return jax.lax.conv_general_dilated(
        x[..., None], window[..., None, None].astype(img.dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]


def _aggd_fit(block: jnp.ndarray, tables) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """AGGD parameter estimation on a flattened block (matches the torch
    variant, image_quality_assessment.py:803-851).

    Returns (alpha, left_beta, right_beta); NaNs propagate for degenerate
    blocks exactly like the reference (they are dropped in the host-side fit).
    """
    r_gam, beta_factor = tables
    v = block.reshape(-1)
    mask_l = v < 0
    mask_r = v > 0
    count_l = jnp.sum(mask_l).astype(jnp.float32)
    count_r = jnp.sum(mask_r).astype(jnp.float32)
    left_std = jnp.sqrt(jnp.sum(jnp.where(mask_l, v * v, 0.0)) / (count_l + 1e-8))
    right_std = jnp.sqrt(jnp.sum(jnp.where(mask_r, v * v, 0.0)) / (count_r + 1e-8))
    gamma_hat = left_std / right_std
    rhat = jnp.mean(jnp.abs(v)) ** 2 / jnp.mean(v * v)
    rhat_norm = (rhat * (gamma_hat ** 3 + 1) * (gamma_hat + 1)) / (
        (gamma_hat ** 2 + 1) ** 2)
    pos = jnp.argmin(jnp.abs(r_gam - rhat_norm))
    alpha = jnp.asarray(_GAM, jnp.float32)[pos]
    bf = beta_factor[pos]
    return alpha, left_std * bf, right_std * bf


def _block_features(block: jnp.ndarray, tables) -> jnp.ndarray:
    """18 NIQE features of one MSCN block (image_quality_assessment.py:854-883).

    2 from the AGGD of the block itself + 4 per circularly-shifted pairwise
    product (H, V, D1, D2).
    """
    r_gam, beta_factor, mean_factor = tables
    alpha, lb, rb = _aggd_fit(block, (r_gam, beta_factor))
    feats = [alpha, (lb + rb) / 2.0]
    for shift in ((0, 1), (1, 0), (1, 1), (1, -1)):
        shifted = jnp.roll(block, shift, axis=(0, 1))
        a, l, r = _aggd_fit(block * shifted, (r_gam, beta_factor))
        pos = jnp.argmin(jnp.abs(jnp.asarray(_GAM, jnp.float32) - a))
        mean = (r - l) * mean_factor[pos]
        feats.extend([a, mean, l, r])
    return jnp.stack(feats)


def _to_blocks(img: jnp.ndarray, bh: int, bw: int) -> jnp.ndarray:
    """(B, H, W) -> (B, nb, bh, bw), column-major block order to match the
    reference's blockproc (idx_w outer, idx_h inner,
    image_quality_assessment.py:140-144)."""
    b, h, w = img.shape
    nbh, nbw = h // bh, w // bw
    x = img[:, :nbh * bh, :nbw * bw].reshape(b, nbh, bh, nbw, bw)
    x = jnp.transpose(x, (0, 3, 1, 2, 4))  # (B, nbw, nbh, bh, bw)
    return x.reshape(b, nbw * nbh, bh, bw)


@functools.partial(jax.jit, static_argnames=("block_size", "crop_border"))
def niqe_features(rgb: jnp.ndarray, crop_border: int = 0,
                  block_size: int = 96) -> jnp.ndarray:
    """Compute the (B, num_blocks, 36) NIQE feature tensor on device.

    Args:
        rgb: (B, H, W, 3) RGB float in [0, 1], NHWC.
    """
    r_gam = jnp.asarray(_r_gam_table(), jnp.float32)
    beta_f = jnp.asarray(_beta_factor_table(), jnp.float32)
    mean_f = jnp.asarray(_mean_factor_table(), jnp.float32)
    tables = (r_gam, beta_f, mean_f)

    if crop_border > 0:
        rgb = rgb[:, crop_border:-crop_border, crop_border:-crop_border, :]

    # MATLAB rgb2ycbcr Y in [16, 235], rounded (reference :985-987 computes
    # (rgb @ w + 16)/255, multiplies back by 255, and rounds)
    y = rgb @ jnp.asarray([65.481, 128.553, 24.966]) + 16.0
    y = jnp.round(y)

    b, h, w = y.shape
    nbh, nbw = h // block_size, w // block_size
    y = y[:, :nbh * block_size, :nbw * block_size]

    window = jnp.asarray(_gaussian_window())
    feats = []
    img = y
    for scale in (1, 2):
        mu = _filter_replicate(img, window)
        ex2 = _filter_replicate(img * img, window)
        sigma = jnp.sqrt(jnp.abs(ex2 - mu * mu) + 1e-8)
        mscn = (img - mu) / (sigma + 1.0)

        blocks = _to_blocks(mscn, block_size // scale, block_size // scale)
        f = jax.vmap(jax.vmap(lambda blk: _block_features(blk, tables)))(blocks)
        feats.append(f)

        if scale == 1:
            # MATLAB-bicubic antialiased half-scale of img/255 (reference :933)
            hh, ww = img.shape[1], img.shape[2]
            mh = jnp.asarray(make_matlab_resize_matrix(hh, int(math.ceil(hh / 2)), 0.5))
            mw = jnp.asarray(make_matlab_resize_matrix(ww, int(math.ceil(ww / 2)), 0.5))
            img = jnp.einsum("oh,bhw->bow", mh, img / 255.0,
                             precision=jax.lax.Precision.HIGHEST)
            img = jnp.einsum("pw,bow->bop", mw, img,
                             precision=jax.lax.Precision.HIGHEST) * 255.0

    return jnp.concatenate(feats, axis=-1)  # (B, nblocks, 36)


class NIQE:
    """Batched NIQE scorer; lower is better.

    Usage:
        metric = NIQE(crop_border=4)      # crop == upscale factor, as the
                                          # trainers do (train_realesrnet.py:100)
        scores = metric(sr_batch_nhwc)    # numpy (B,) float64
    """

    def __init__(self, crop_border: int = 4,
                 model_path: str = DEFAULT_MODEL_PATH,
                 block_size: int = 96):
        self.crop_border = crop_border
        self.block_size = block_size
        if model_path.endswith(".npz"):
            data = np.load(model_path)
            self.mu_pris = np.ravel(data["mu_pris_param"]).astype(np.float64)
            self.cov_pris = data["cov_pris_param"].astype(np.float64)
        else:
            import scipy.io

            data = scipy.io.loadmat(model_path)
            self.mu_pris = np.ravel(data["mu_prisparam"]).astype(np.float64)
            self.cov_pris = data["cov_prisparam"].astype(np.float64)

    def score_features(self, feats: np.ndarray) -> np.ndarray:
        """Host-side f64 MVG fit + distance (reference :938-947)."""
        feats = np.asarray(feats, np.float64)
        scores = []
        for f in feats:
            mu = np.nanmean(f, axis=0)
            good = f[~np.isnan(f).any(axis=1)]
            if good.shape[0] < 2:
                scores.append(np.nan)
                continue
            cov = np.cov(good, rowvar=False)
            inv = np.linalg.pinv((self.cov_pris + cov) / 2.0)
            d = self.mu_pris - mu
            scores.append(float(np.sqrt(max(d @ inv @ d, 0.0))))
        return np.asarray(scores)

    def __call__(self, rgb_nhwc) -> np.ndarray:
        feats = niqe_features(jnp.asarray(rgb_nhwc), self.crop_border,
                              self.block_size)
        return self.score_features(np.asarray(feats))


def niqe(image_rgb: np.ndarray, crop_border: int = 0,
         model_path: str = DEFAULT_MODEL_PATH, block_size: int = 96) -> float:
    """Single-image NIQE convenience (counterpart of the reference's numpy
    ``niqe()`` entry, image_quality_assessment.py:169-212).

    Args:
        image_rgb: (H, W, 3) float RGB in [0, 1].
    """
    scorer = NIQE(crop_border=crop_border, model_path=model_path,
                  block_size=block_size)
    return float(scorer(np.asarray(image_rgb)[None])[0])
