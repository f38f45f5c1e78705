"""The full second-order Real-ESRGAN degradation pipeline, fused on-device.

TPU-native re-design of the per-batch degradation prelude in the reference
trainers (/root/reference/train_realesrnet.py:258-377 and its twin
train_realesrgan.py:300-457) plus the host-side kernel synthesis + augments
(/root/reference/dataset.py:64-143):

* Everything — augmentation, USM, kernel synthesis, blur, random resize,
  noise, JPEG, crop — compiles into ONE jitted function; the host supplies
  only uint8 HR crops.
* Random intermediate shapes become traced *valid extents* on static
  canvases (see ops/resize.resize_dynamic): canvas1 holds up to 1.5x the HR
  size for the first-stage up-resize, canvas2 up to 1.2x the LR size.
* Randomness granularity MATCHES THE REFERENCE exactly: per-sample where it
  draws tensors (noise strengths, gray masks, JPEG qualities, blur kernels,
  crops, orientation — imgproc.py's torch helpers), per-batch where it uses
  Python RNG (resize kind+scale+interpolation mode, Gaussian-vs-Poisson
  family, second blur on/off, the final order coin —
  train_realesrnet.py:275-371).  Per-batch structural choices compile as
  lax.cond/switch so only the chosen branch executes; the resize up-or-not
  kind arrives as a STATIC host-drawn flag (``up1``/``up2``) because it
  selects the canvas size — non-upscaling batches (~80%) run noise/JPEG/
  blur2 on a ~2x smaller canvas.
* Crop alignment: the reference samples the HR corner and floors for LR
  (imgproc.py:1913-1918), which can misalign the pair by up to
  (scale-1)/scale HR pixels; we sample the LR corner and multiply, keeping
  pairs exactly aligned.
* Boundary-band approximation: stages after the first resize operate on the
  full static canvas, whose region beyond the traced valid extent holds
  edge-replicated values.  Resizes clamp their taps to the valid extent, but
  the second blur (reflect-pad at the canvas edge) and DiffJPEG (8x8 blocks
  straddling the extent boundary) do not — pixels within ~kernel-radius of
  the valid region's right/bottom edge see replicated context instead of the
  reference's true-size boundary semantics.  The affected band is a few
  pixels of an intermediate that is subsequently resized and randomly
  cropped; marginal image statistics are unchanged.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from real_esrgan_tpu.configuration import (
    DegradationConfig, KernelSynthesisConfig, PipelineGeometry,
)
from real_esrgan_tpu.ops.augment import (
    apply_orientation, paired_random_crop, random_orientation,
)
from real_esrgan_tpu.ops.blur_kernels import (
    identity_kernel, random_final_sinc_kernel, random_first_order_kernel,
    random_second_order_kernel,
)
from real_esrgan_tpu.ops.diffjpeg import diff_jpeg
from real_esrgan_tpu.ops.filter2d import filter2d
from real_esrgan_tpu.ops.noise import gaussian_noise, poisson_noise
from real_esrgan_tpu.ops.resize import resize_dynamic_static_method
from real_esrgan_tpu.ops.usm import gaussian_kernel_1d, usm_sharpen


def _batch_scale(key: jax.Array, up: bool,
                 probs: Tuple[float, float, float],
                 srange: Tuple[float, float]) -> jnp.ndarray:
    """One resize scale for the whole batch (reference
    train_realesrnet.py:279-286 draws updown_type + scale with Python RNG
    once per batch).  The up-vs-not choice arrives as a STATIC host-drawn
    flag (it selects the canvas size); within the non-up branch the
    down-vs-keep choice keeps its conditional probability as a traced coin."""
    k_kind, k_val = jax.random.split(key)
    if up:
        return jax.random.uniform(k_val, (), minval=1.0, maxval=srange[1])
    denom = probs[1] + probs[2]
    p_keep = probs[2] / denom if denom > 0 else 0.0
    down = jax.random.uniform(k_val, (), minval=srange[0], maxval=1.0)
    return jnp.where(jax.random.uniform(k_kind) < p_keep, 1.0, down)


def _batched_resize(images: jnp.ndarray, in_extent: jnp.ndarray,
                    out_extent: jnp.ndarray, out_canvas: Tuple[int, int],
                    method_idx: jnp.ndarray) -> jnp.ndarray:
    """Per-sample extents, per-BATCH interpolation mode: the traced scalar
    ``method_idx`` selects ONE compiled branch via lax.switch (outside the
    vmap, so the other two modes never execute)."""

    def for_method(m):
        def f(imgs):
            return jax.vmap(
                lambda img, ei, eo: resize_dynamic_static_method(
                    img, (ei, ei), (eo, eo), out_canvas, m)
            )(imgs, in_extent, out_extent)
        return f

    return jax.lax.switch(method_idx, [for_method(0), for_method(1),
                                       for_method(2)], images)


def _mixed_noise(key: jax.Array, image: jnp.ndarray, gaussian_prob: float,
                 sigma_range: Tuple[float, float],
                 poisson_scale_range: Tuple[float, float],
                 gray_prob: float, poisson_approx: bool = False) -> jnp.ndarray:
    """Gaussian-vs-Poisson chosen per batch (reference
    train_realesrnet.py:291-309); strengths and gray masks per sample.
    Only the chosen family's sampler runs (lax.cond)."""
    b = image.shape[0]
    k_coin, k_sig, k_sc, k_gray, k_n = jax.random.split(key, 5)
    use_gauss = jax.random.uniform(k_coin) <= gaussian_prob
    gray = (jax.random.uniform(k_gray, (b,)) < gray_prob).astype(image.dtype)
    sigma = jax.random.uniform(k_sig, (b,), minval=sigma_range[0],
                               maxval=sigma_range[1])
    scale = jax.random.uniform(k_sc, (b,), minval=poisson_scale_range[0],
                               maxval=poisson_scale_range[1])
    noise = jax.lax.cond(
        use_gauss,
        lambda img: gaussian_noise(k_n, img, sigma, gray),
        lambda img: poisson_noise(k_n, img, scale, gray, poisson_approx),
        image)
    return jnp.clip(image + noise, 0.0, 1.0)


def degrade(key: jax.Array,
            hr_uint8: jnp.ndarray,
            geo: PipelineGeometry,
            kcfg: KernelSynthesisConfig,
            dcfg: DegradationConfig,
            augment: bool = True,
            up1: bool = False,
            up2: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Synthesize (lr, hr) training pairs from raw HR uint8 crops, on device.

    Args:
        key: step RNG key.
        hr_uint8: (B, hr_size, hr_size, 3) uint8 RGB (or float in [0,1]).
        up1 / up2: STATIC per-batch flags — whether the stage-1 / stage-2
            random resize upscales.  Drawn on the host with probabilities
            ``dcfg.resize_probs{1,2}[0]`` (the trainers do this per step),
            mirroring the reference's per-batch Python RNG
            (train_realesrnet.py:279-287).  Static because the flag picks
            the canvas size: non-upscaling batches (~80%/70%) run every
            canvas-sized op on a ~2x smaller canvas.

    Returns:
        lr: (B, lr_crop, lr_crop, 3) float32 in [0, 1].
        hr: (B, crop, crop, 3) float32 in [0, 1] (raw, un-sharpened target —
            the reference's loss also targets the raw HR,
            train_realesrnet.py:377,385).
    """
    b = hr_uint8.shape[0]
    hr_size, lr_size = geo.hr_size, geo.lr_size
    c1, c2 = geo.canvas1_for(up1), geo.canvas2_for(up2)

    keys = jax.random.split(key, 16)
    (k_orient, k_k1, k_k2, k_sinc, k_blur1, k_rs1, k_noise1, k_q1,
     k_blur2, k_rs2, k_noise2, k_order, k_rs3, k_q2, k_crop, _) = keys

    hr = hr_uint8.astype(jnp.float32)
    if hr_uint8.dtype == jnp.uint8:
        hr = hr / 255.0

    if augment:
        rot, hf, vf = random_orientation(k_orient, b)
        hr = jax.vmap(apply_orientation)(hr, rot, hf, vf)

    # --- per-sample kernels, synthesized on device ---
    k1 = jax.vmap(lambda k: random_first_order_kernel(k, kcfg))(
        jax.random.split(k_k1, b))
    sinc = jax.vmap(lambda k: random_final_sinc_kernel(k, kcfg))(
        jax.random.split(k_sinc, b))
    ident = identity_kernel(kcfg.pad_to)

    # host numpy (static config): folded into dense blur matrices at trace time
    usm_kernel = gaussian_kernel_1d(dcfg.usm_radius, 0.0)
    out = usm_sharpen(hr, usm_kernel, dcfg.usm_weight, dcfg.usm_threshold)

    # ---------------- first-order degradation ----------------
    # per-sample blur gate via identity-kernel select (prob 1.0 by default)
    blur1_on = jax.random.uniform(k_blur1, (b,)) <= dcfg.first_blur_prob
    k1_eff = jnp.where(blur1_on[:, None, None], k1, ident[None])
    out = filter2d(out, k1_eff, compute_dtype=jnp.bfloat16)

    k_s1, k_m1 = jax.random.split(k_rs1)
    s1 = _batch_scale(k_s1, up1, dcfg.resize_probs1, dcfg.resize_range1)
    extent1 = jnp.full((b,), 1, jnp.int32) * jnp.floor(
        hr_size * s1).astype(jnp.int32)
    method1 = jax.random.randint(k_m1, (), 0, 3)       # per batch
    out = _batched_resize(out, jnp.full((b,), hr_size, jnp.int32), extent1,
                          (c1, c1), method1)

    out = _mixed_noise(k_noise1, out, dcfg.gaussian_noise_prob1,
                       dcfg.noise_range1, dcfg.poisson_scale_range1,
                       dcfg.gray_noise_prob1, dcfg.poisson_approx)

    q1 = jax.random.uniform(k_q1, (b,), minval=dcfg.jpeg_range1[0],
                            maxval=dcfg.jpeg_range1[1])
    out = diff_jpeg(jnp.clip(out, 0.0, 1.0), q1)

    # ---------------- second-order degradation ----------------
    # second blur applied per batch with prob 0.8 (reference :313); skipping
    # it entirely (lax.cond) saves both the 21x21 depthwise pass on the big
    # canvas AND the per-sample kernel synthesis (both live in the branch)
    blur2_coin = jax.random.uniform(k_blur2) < dcfg.second_blur_prob

    def do_blur2(v):
        k2 = jax.vmap(lambda k: random_second_order_kernel(k, kcfg))(
            jax.random.split(k_k2, b))
        return filter2d(v, k2, compute_dtype=jnp.bfloat16)

    out = jax.lax.cond(blur2_coin, do_blur2, lambda v: v, out)

    k_s2, k_m2 = jax.random.split(k_rs2)
    s2 = _batch_scale(k_s2, up2, dcfg.resize_probs2, dcfg.resize_range2)
    extent2 = jnp.full((b,), 1, jnp.int32) * jnp.floor(
        lr_size * s2).astype(jnp.int32)
    method2 = jax.random.randint(k_m2, (), 0, 3)       # per batch
    out = _batched_resize(out, extent1, extent2, (c2, c2), method2)

    out = _mixed_noise(k_noise2, out, dcfg.gaussian_noise_prob2,
                       dcfg.noise_range2, dcfg.poisson_scale_range2,
                       dcfg.gray_noise_prob2, dcfg.poisson_approx)

    # ---------------- final stage: order coin (per batch) ----------------
    # branch A: resize -> sinc -> JPEG ; branch B: JPEG -> resize -> sinc
    # (reference train_realesrnet.py:347-371)
    method3 = jax.random.randint(k_rs3, (), 0, 3)
    q2 = jax.random.uniform(k_q2, (b,), minval=dcfg.jpeg_range2[0],
                            maxval=dcfg.jpeg_range2[1])
    final_extent = jnp.full((b,), lr_size, jnp.int32)

    def branch_a(v):
        resized = _batched_resize(v, extent2, final_extent,
                                  (lr_size, lr_size), method3)
        return diff_jpeg(jnp.clip(filter2d(resized, sinc, compute_dtype=jnp.bfloat16), 0.0, 1.0), q2)

    def branch_b(v):
        jpeged = diff_jpeg(jnp.clip(v, 0.0, 1.0), q2)
        resized = _batched_resize(jpeged, extent2, final_extent,
                                  (lr_size, lr_size), method3)
        return filter2d(resized, sinc, compute_dtype=jnp.bfloat16)

    coin = jax.random.uniform(k_order) < 0.5
    out = jax.lax.cond(coin, branch_a, branch_b, out)

    # quantize to 8-bit levels (train_realesrnet.py:374)
    lr = jnp.clip(jnp.round(out * 255.0), 0.0, 255.0) / 255.0

    lr, hr_crop = paired_random_crop(k_crop, lr, hr, geo.crop_size, geo.scale)
    return lr, hr_crop
