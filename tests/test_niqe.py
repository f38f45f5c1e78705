"""NIQE tests: device feature extraction vs an independent numpy float64
oracle implementing the published NIQE algorithm (Mittal et al., 2013), plus
ranking sanity (noisier/blurrier images must score worse)."""

import math

import cv2
import jax.numpy as jnp
import numpy as np
import scipy.ndimage
from scipy.special import gamma as sp_gamma

from real_esrgan_tpu.metrics.niqe import (
    DEFAULT_MODEL_PATH, NIQE, _gaussian_window, niqe_features,
)
from real_esrgan_tpu.ops.resize import matlab_resize

RNG = np.random.default_rng(21)


# ------------------------- independent numpy oracle -------------------------

_GAM = np.arange(0.2, 10.001, 0.001)
_RGAM = np.square(sp_gamma(2.0 / _GAM)) / (sp_gamma(1.0 / _GAM) * sp_gamma(3.0 / _GAM))


def _oracle_aggd(v):
    v = v.flatten()
    nl, nr = (v < 0).sum(), (v > 0).sum()
    left_std = np.sqrt((v[v < 0] ** 2).sum() / (nl + 1e-8))
    right_std = np.sqrt((v[v > 0] ** 2).sum() / (nr + 1e-8))
    gamma_hat = left_std / right_std
    rhat = np.mean(np.abs(v)) ** 2 / np.mean(v ** 2)
    rhat_norm = (rhat * (gamma_hat ** 3 + 1) * (gamma_hat + 1)) / ((gamma_hat ** 2 + 1) ** 2)
    pos = np.argmin(np.abs(_RGAM - rhat_norm))
    alpha = _GAM[pos]
    bf = np.sqrt(sp_gamma(1 / alpha) / sp_gamma(3 / alpha))
    return alpha, left_std * bf, right_std * bf


def _oracle_block_features(block):
    alpha, lb, rb = _oracle_aggd(block)
    feats = [alpha, (lb + rb) / 2]
    for shift in ((0, 1), (1, 0), (1, 1), (1, -1)):
        shifted = np.roll(block, shift, axis=(0, 1))
        a, l, r = _oracle_aggd(block * shifted)
        feats.extend([a, (r - l) * (sp_gamma(2 / a) / sp_gamma(1 / a)), l, r])
    return np.array(feats)


def _oracle_features(rgb, crop_border=0, block=96):
    if crop_border:
        rgb = rgb[crop_border:-crop_border, crop_border:-crop_border]
    y = np.round(rgb.astype(np.float64) @ np.array([65.481, 128.553, 24.966]) + 16.0)
    nbh, nbw = y.shape[0] // block, y.shape[1] // block
    y = y[:nbh * block, :nbw * block]
    win = _gaussian_window().astype(np.float64)
    img = y
    all_feats = []
    for scale in (1, 2):
        mu = scipy.ndimage.correlate(img, win, mode="nearest")
        sigma = np.sqrt(np.abs(scipy.ndimage.correlate(img * img, win, mode="nearest")
                               - mu * mu) + 1e-8)
        mscn = (img - mu) / (sigma + 1)
        bs = block // scale
        feats = []
        for iw in range(nbw):
            for ih in range(nbh):
                feats.append(_oracle_block_features(
                    mscn[ih * bs:(ih + 1) * bs, iw * bs:(iw + 1) * bs]))
        all_feats.append(np.array(feats))
        if scale == 1:
            img = np.array(matlab_resize(jnp.asarray(img / 255.0), 0.5)) * 255.0
    return np.concatenate(all_feats, axis=1)


def _natural_image(size=224):
    """Center crop of a real photograph (tests/data, RGB [0,1])."""
    import os
    path = os.path.join(os.path.dirname(__file__), "data", "tree_sr.png")
    bgr = cv2.imread(path)
    h, w = bgr.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    crop = bgr[top:top + size, left:left + size, ::-1]
    return crop.astype(np.float32) / 255.0


def test_features_match_numpy_oracle():
    img = _natural_image(224)  # 2x2 blocks of 96 after crop -> use 96 blocks
    feats_dev = np.asarray(niqe_features(jnp.asarray(img[None]), 4, 96))[0]
    feats_ora = _oracle_features(img, 4, 96)
    assert feats_dev.shape == feats_ora.shape
    # f32 device vs f64 oracle: alpha comes from a 0.001-step table lookup,
    # betas are smooth functions — expect near-exact agreement
    np.testing.assert_allclose(feats_dev, feats_ora, atol=5e-3, rtol=2e-2)


def test_niqe_score_close_to_oracle_score():
    img = _natural_image(224)
    metric = NIQE(crop_border=4, model_path=DEFAULT_MODEL_PATH)
    score_dev = metric(img[None])[0]
    score_ora = metric.score_features(_oracle_features(img, 4, 96)[None])[0]
    assert abs(score_dev - score_ora) < 0.15, (score_dev, score_ora)


def test_niqe_ranks_distortions():
    img = _natural_image(224)
    heavy_noise = np.clip(img + RNG.normal(0, 0.25, img.shape), 0, 1).astype(np.float32)
    metric = NIQE(crop_border=0)
    s = metric(np.stack([img, heavy_noise]))
    assert np.isfinite(s).all()
    assert s[1] > s[0], s  # heavy gaussian noise must look less natural


def test_mat_and_npz_models_agree():
    img = _natural_image(224)
    m1 = NIQE(crop_border=0, model_path=DEFAULT_MODEL_PATH)
    m2 = NIQE(crop_border=0, model_path=DEFAULT_MODEL_PATH.replace(".mat", ".npz"))
    s1, s2 = m1(img[None])[0], m2(img[None])[0]
    assert abs(s1 - s2) < 1e-6
