"""On-device photometric augmentation (ColorJitter).

The reference's Stack-B training pipeline jitters brightness/contrast/
saturation +-0.2 via torchvision before normalization
(/root/reference/data/coco_dataset.py:54).  Here the jitter is a pure
jittable op fused into the train step: per-sample factors, per-sample
random op ORDER (torchvision samples a fresh permutation per image), and
torchvision's float-tensor blend semantics:

  brightness: img * f
  contrast:   f * img + (1 - f) * mean(gray(img))      (scalar mean)
  saturation: f * img + (1 - f) * gray(img)            (per-pixel gray)

each clamped to [0, 1], f ~ U[max(0, 1-amt), 1+amt], with grayscale
coefficients (0.2989, 0.587, 0.114).  Deviation from the reference noted:
torchvision's PIL path quantizes to uint8 between ops; this float path
does not (sub-1/255 differences on a stochastic augmentation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_GRAY = jnp.asarray([0.2989, 0.587, 0.114], jnp.float32)


def _gray(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) -> (H, W, 1) luminance."""
    return jnp.sum(img * _GRAY.astype(img.dtype), axis=-1, keepdims=True)


def _jitter_one(key: jax.Array, img: jnp.ndarray, brightness: float,
                contrast: float, saturation: float) -> jnp.ndarray:
    kp, kb, kc, ks = jax.random.split(key, 4)

    def factor(k, amt):
        return jax.random.uniform(
            k, (), jnp.float32, max(0.0, 1.0 - amt), 1.0 + amt)

    fb = factor(kb, brightness)
    fc = factor(kc, contrast)
    fs = factor(ks, saturation)

    def op_brightness(im):
        return jnp.clip(im * fb, 0.0, 1.0)

    def op_contrast(im):
        m = jnp.mean(_gray(im))
        return jnp.clip(fc * im + (1.0 - fc) * m, 0.0, 1.0)

    def op_saturation(im):
        g = _gray(im)
        return jnp.clip(fs * im + (1.0 - fs) * g, 0.0, 1.0)

    order = jax.random.permutation(kp, 3)

    def body(i, im):
        return lax.switch(order[i], (op_brightness, op_contrast,
                                     op_saturation), im)

    return lax.fori_loop(0, 3, body, img)


def color_jitter(rng: jax.Array, images: jnp.ndarray, brightness: float,
                 contrast: float, saturation: float) -> jnp.ndarray:
    """Batched ColorJitter on (B, H, W, 3) images in [0, 1].

    Static no-op when all amounts are zero (the val / default path
    compiles to nothing)."""
    if brightness <= 0 and contrast <= 0 and saturation <= 0:
        return images
    keys = jax.random.split(rng, images.shape[0])
    out = jax.vmap(
        lambda k, im: _jitter_one(k, im, brightness, contrast, saturation)
    )(keys, images)
    return out.astype(images.dtype)


def color_jitter_normalized(rng: jax.Array, images: jnp.ndarray, mean,
                            std, brightness: float, contrast: float,
                            saturation: float) -> jnp.ndarray:
    """ColorJitter applied to ALREADY-NORMALIZED images.

    The fused train step receives (x/255 - mean)/std crops
    (data/pipeline.device_batch); jitter must act on the [0, 1] image, so
    de-normalize, jitter, re-normalize — all inside the jit, where XLA
    fuses the three extra elementwise passes."""
    if brightness <= 0 and contrast <= 0 and saturation <= 0:
        return images
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    x01 = images * std + mean
    x01 = color_jitter(rng, x01, brightness, contrast, saturation)
    return (x01 - mean) / std
