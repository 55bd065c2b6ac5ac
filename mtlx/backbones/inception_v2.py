"""Inception v2 backbone (reference slim/nets/inception_v2.py, SURVEY.md
§3.8) with the two SSD endpoints (Mixed_4e stride 16, Mixed_5c stride 32)
— the `ssd_inception_v2` feature extractor.

BN is frozen (fine-tuning semantics) or live per bn_trainable — the
reference trains base-network BN whenever conv_hyperparams.batch_norm
sets train: true (slim batch_norm is_training = train and is_training),
as the sample ssd_inception_v2 configs do.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
import flax.linen as nn

from mtlx.backbones.inception_resnet_v2 import BNKnobs, ConvBN

Dtype = Any


class InceptionBlock(BNKnobs):
    """Standard Inception v2 mixed block: 1x1 | 1x1-3x3 | 1x1-3x3-3x3 |
    pool-1x1 branches."""

    b0: int = 0
    b1: Tuple[int, int] = (0, 0)
    b2: Tuple[int, int] = (0, 0)
    pool_proj: int = 0
    use_max_pool: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, **self._bn_kwargs())
        outs = []
        if self.b0:
            outs.append(ConvBN(self.b0, (1, 1), name="b0", **kw)(x, train))
        y = ConvBN(self.b1[0], (1, 1), name="b1a", **kw)(x, train)
        outs.append(ConvBN(self.b1[1], (3, 3), name="b1b", **kw)(y, train))
        y = ConvBN(self.b2[0], (1, 1), name="b2a", **kw)(x, train)
        y = ConvBN(self.b2[1], (3, 3), name="b2b", **kw)(y, train)
        outs.append(ConvBN(self.b2[1], (3, 3), name="b2c", **kw)(y, train))
        if self.use_max_pool:
            p = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            p = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        if self.pool_proj:
            p = ConvBN(self.pool_proj, (1, 1), name="pool_proj", **kw)(p, train)
        outs.append(p)
        return jnp.concatenate(outs, axis=-1)


class ReductionBlock(BNKnobs):
    """Stride-2 inception reduction block."""

    b1: Tuple[int, int] = (0, 0)
    b2: Tuple[int, int] = (0, 0)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, **self._bn_kwargs())
        y = ConvBN(self.b1[0], (1, 1), name="b1a", **kw)(x, train)
        y = ConvBN(self.b1[1], (3, 3), (2, 2), name="b1b", **kw)(y, train)
        z = ConvBN(self.b2[0], (1, 1), name="b2a", **kw)(x, train)
        z = ConvBN(self.b2[1], (3, 3), name="b2b", **kw)(z, train)
        z = ConvBN(self.b2[1], (3, 3), (2, 2), name="b2c", **kw)(z, train)
        p = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        return jnp.concatenate([y, z, p], axis=-1)


class SeparableStem(BNKnobs):
    """slim inception_v2 Conv2d_1a_7x7: depthwise 7x7/2 (channel
    multiplier min(features//3, 8)) -> pointwise 1x1 to `features`, with
    BN+ReLU after the pointwise (slim separable_conv2d applies its
    normalizer/activation once, after the full separable op)."""

    features: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mult = max(1, min(self.features // in_ch, 8))
        x = nn.Conv(
            in_ch * mult, (7, 7), strides=(2, 2), padding="SAME",
            feature_group_count=in_ch, use_bias=False,
            dtype=self.dtype, name="depthwise",
        )(x)
        return ConvBN(
            self.features, (1, 1), name="pointwise",
            dtype=self.dtype, **self._bn_kwargs(),
        )(x, train)


class InceptionV2(BNKnobs):
    """Returns [Mixed_4e (stride 16), Mixed_5c (stride 32)] feature maps."""

    depth_multiplier: float = 1.0
    min_depth: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        d = lambda c: max(int(c * self.depth_multiplier), self.min_depth)
        kw = dict(dtype=self.dtype, **self._bn_kwargs())
        x = x.astype(self.dtype)
        # stem: depthwise-separable 7x7/2, as in slim (Conv2d_1a_7x7)
        x = SeparableStem(features=d(64), name="conv1", **kw)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = ConvBN(d(64), (1, 1), name="conv2a", **kw)(x, train)
        x = ConvBN(d(192), (3, 3), name="conv2b", **kw)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")  # /8
        # 28x28 blocks
        x = InceptionBlock(b0=d(64), b1=(d(64), d(64)), b2=(d(64), d(96)),
                           pool_proj=d(32), name="mixed_3b", **kw)(x, train)
        x = InceptionBlock(b0=d(64), b1=(d(64), d(96)), b2=(d(64), d(96)),
                           pool_proj=d(64), name="mixed_3c", **kw)(x, train)
        x = ReductionBlock(b1=(d(128), d(160)), b2=(d(64), d(96)),
                           name="mixed_4a", **kw)(x, train)  # /16
        # 14x14 blocks
        x = InceptionBlock(b0=d(224), b1=(d(64), d(96)), b2=(d(96), d(128)),
                           pool_proj=d(128), name="mixed_4b", **kw)(x, train)
        x = InceptionBlock(b0=d(192), b1=(d(96), d(128)), b2=(d(96), d(128)),
                           pool_proj=d(128), name="mixed_4c", **kw)(x, train)
        x = InceptionBlock(b0=d(160), b1=(d(128), d(160)), b2=(d(128), d(160)),
                           pool_proj=d(96), name="mixed_4d", **kw)(x, train)
        x = InceptionBlock(b0=d(96), b1=(d(128), d(192)), b2=(d(160), d(192)),
                           pool_proj=d(96), name="mixed_4e", **kw)(x, train)
        endpoint_16 = x
        x = ReductionBlock(b1=(d(128), d(192)), b2=(d(192), d(256)),
                           name="mixed_5a", **kw)(x, train)  # /32
        x = InceptionBlock(b0=d(352), b1=(d(192), d(320)), b2=(d(160), d(224)),
                           pool_proj=d(128), name="mixed_5b", **kw)(x, train)
        x = InceptionBlock(b0=d(352), b1=(d(192), d(320)), b2=(d(192), d(224)),
                           pool_proj=d(128), use_max_pool=True,
                           name="mixed_5c", **kw)(x, train)
        return [endpoint_16, x]


class InceptionV2ProposalFeatures(BNKnobs):
    """Stem through Mixed_4e (stride 16) — the faster_rcnn_inception_v2
    first-stage extractor (reference models/faster_rcnn_inception_v2_
    feature_extractor). bn_trainable honors
    feature_extractor.batch_norm_trainable."""

    depth_multiplier: float = 1.0
    min_depth: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        return InceptionV2(
            depth_multiplier=self.depth_multiplier, min_depth=self.min_depth,
            dtype=self.dtype, name="body", **self._bn_kwargs()
        )(x, train)[0]


class InceptionV2BoxClassifierFeatures(BNKnobs):
    """Mixed_5a..Mixed_5c on ROI crops (the second-stage branch; Mixed_5a
    keeps its stride-2 as in the reference — callers global-pool)."""

    depth_multiplier: float = 1.0
    min_depth: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = lambda c: max(int(c * self.depth_multiplier), self.min_depth)
        kw = dict(dtype=self.dtype, **self._bn_kwargs())
        x = x.astype(self.dtype)
        x = ReductionBlock(b1=(d(128), d(192)), b2=(d(192), d(256)),
                           name="mixed_5a", **kw)(x, train)
        x = InceptionBlock(b0=d(352), b1=(d(192), d(320)), b2=(d(160), d(224)),
                           pool_proj=d(128), name="mixed_5b", **kw)(x, train)
        x = InceptionBlock(b0=d(352), b1=(d(192), d(320)), b2=(d(192), d(224)),
                           pool_proj=d(128), use_max_pool=True,
                           name="mixed_5c", **kw)(x, train)
        return x
