"""Classification-style preprocessing (reference slim/preprocessing/
{vgg,inception}_preprocessing.py, SURVEY.md §3.8) — used by the classifier
pretraining path, device-side and PRNG-keyed like the detection
preprocessor."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mtlx.backbones.resnet import RGB_MEANS


def _random_crop_resize(rng, image, out_size, min_area=0.08, max_area=1.0,
                        min_aspect=0.75, max_aspect=1.333):
    """Inception-style random resized crop on a fixed-size input."""
    from mtlx.ops import roi as roi_lib

    h, w = image.shape[0], image.shape[1]
    r_area, r_aspect, r_y, r_x = jax.random.split(rng, 4)
    area = jax.random.uniform(r_area, minval=min_area, maxval=max_area)
    aspect = jax.random.uniform(r_aspect, minval=min_aspect, maxval=max_aspect)
    ch = jnp.sqrt(area * h * w / aspect)
    cw = ch * aspect
    ch = jnp.minimum(ch, h)
    cw = jnp.minimum(cw, w)
    y0 = jax.random.uniform(r_y) * (h - ch)
    x0 = jax.random.uniform(r_x) * (w - cw)
    box = jnp.stack([y0 / h, x0 / w, (y0 + ch) / h, (x0 + cw) / w])
    return roi_lib.crop_and_resize_mxu(image, box[None], out_size)[0]


def _central_crop_resize(image, out_size, fraction=0.875):
    from mtlx.ops import roi as roi_lib

    lo = (1.0 - fraction) / 2.0
    box = jnp.asarray([lo, lo, 1.0 - lo, 1.0 - lo])
    return roi_lib.crop_and_resize_mxu(image, box[None], out_size)[0]


def vgg_preprocess(rng, image, out_size=(224, 224), is_training=True):
    """VGG/ResNet style: random crop + horizontal flip + mean subtraction
    (0-255 input)."""
    if is_training:
        r_crop, r_flip = jax.random.split(rng)
        image = _random_crop_resize(r_crop, image, out_size, min_area=0.5)
        image = jnp.where(
            jax.random.bernoulli(r_flip, 0.5), image[:, ::-1], image
        )
    else:
        image = _central_crop_resize(image, out_size)
    return image - jnp.asarray(RGB_MEANS, image.dtype)


def inception_preprocess(rng, image, out_size=(224, 224), is_training=True):
    """Inception/MobileNet style: random resized crop + flip + brightness/
    saturation-lite jitter, scaled to [-1, 1] (0-255 input)."""
    if is_training:
        r_crop, r_flip, r_bright = jax.random.split(rng, 3)
        image = _random_crop_resize(r_crop, image, out_size)
        image = jnp.where(
            jax.random.bernoulli(r_flip, 0.5), image[:, ::-1], image
        )
        delta = jax.random.uniform(r_bright, minval=-32.0, maxval=32.0)
        image = jnp.clip(image + delta, 0.0, 255.0)
    else:
        image = _central_crop_resize(image, out_size)
    return image * (2.0 / 255.0) - 1.0
