"""Inception v2 backbone (reference slim/nets/inception_v2.py, SURVEY.md
§3.8) with the two SSD endpoints (Mixed_4e stride 16, Mixed_5c stride 32)
— the `ssd_inception_v2` feature extractor."""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
import flax.linen as nn

from mtlx.backbones.inception_resnet_v2 import ConvBN

Dtype = Any


class InceptionBlock(nn.Module):
    """Standard Inception v2 mixed block: 1x1 | 1x1-3x3 | 1x1-3x3-3x3 |
    pool-1x1 branches."""

    b0: int
    b1: Tuple[int, int]
    b2: Tuple[int, int]
    pool_proj: int
    use_max_pool: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        outs = []
        if self.b0:
            outs.append(ConvBN(self.b0, (1, 1), dtype=self.dtype, name="b0")(x))
        y = ConvBN(self.b1[0], (1, 1), dtype=self.dtype, name="b1a")(x)
        outs.append(ConvBN(self.b1[1], (3, 3), dtype=self.dtype, name="b1b")(y))
        y = ConvBN(self.b2[0], (1, 1), dtype=self.dtype, name="b2a")(x)
        y = ConvBN(self.b2[1], (3, 3), dtype=self.dtype, name="b2b")(y)
        outs.append(ConvBN(self.b2[1], (3, 3), dtype=self.dtype, name="b2c")(y))
        if self.use_max_pool:
            p = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            p = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        if self.pool_proj:
            p = ConvBN(self.pool_proj, (1, 1), dtype=self.dtype, name="pool_proj")(p)
        outs.append(p)
        return jnp.concatenate(outs, axis=-1)


class ReductionBlock(nn.Module):
    """Stride-2 inception reduction block."""

    b1: Tuple[int, int]
    b2: Tuple[int, int]
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = ConvBN(self.b1[0], (1, 1), dtype=self.dtype, name="b1a")(x)
        y = ConvBN(self.b1[1], (3, 3), (2, 2), dtype=self.dtype, name="b1b")(y)
        z = ConvBN(self.b2[0], (1, 1), dtype=self.dtype, name="b2a")(x)
        z = ConvBN(self.b2[1], (3, 3), dtype=self.dtype, name="b2b")(z)
        z = ConvBN(self.b2[1], (3, 3), (2, 2), dtype=self.dtype, name="b2c")(z)
        p = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        return jnp.concatenate([y, z, p], axis=-1)


class InceptionV2(nn.Module):
    """Returns [Mixed_4e (stride 16), Mixed_5c (stride 32)] feature maps."""

    depth_multiplier: float = 1.0
    min_depth: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        d = lambda c: max(int(c * self.depth_multiplier), self.min_depth)
        x = x.astype(self.dtype)
        # stem: 7x7/2 depthwise-separable in slim; plain 7x7/2 conv here
        x = ConvBN(d(64), (7, 7), (2, 2), dtype=self.dtype, name="conv1")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = ConvBN(d(64), (1, 1), dtype=self.dtype, name="conv2a")(x)
        x = ConvBN(d(192), (3, 3), dtype=self.dtype, name="conv2b")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")  # /8
        # 28x28 blocks
        x = InceptionBlock(d(64), (d(64), d(64)), (d(64), d(96)), d(32),
                           dtype=self.dtype, name="mixed_3b")(x)
        x = InceptionBlock(d(64), (d(64), d(96)), (d(64), d(96)), d(64),
                           dtype=self.dtype, name="mixed_3c")(x)
        x = ReductionBlock((d(128), d(160)), (d(64), d(96)),
                           dtype=self.dtype, name="mixed_4a")(x)  # /16
        # 14x14 blocks
        x = InceptionBlock(d(224), (d(64), d(96)), (d(96), d(128)), d(128),
                           dtype=self.dtype, name="mixed_4b")(x)
        x = InceptionBlock(d(192), (d(96), d(128)), (d(96), d(128)), d(128),
                           dtype=self.dtype, name="mixed_4c")(x)
        x = InceptionBlock(d(160), (d(128), d(160)), (d(128), d(160)), d(96),
                           dtype=self.dtype, name="mixed_4d")(x)
        x = InceptionBlock(d(96), (d(128), d(192)), (d(160), d(192)), d(96),
                           dtype=self.dtype, name="mixed_4e")(x)
        endpoint_16 = x
        x = ReductionBlock((d(128), d(192)), (d(192), d(256)),
                           dtype=self.dtype, name="mixed_5a")(x)  # /32
        x = InceptionBlock(d(352), (d(192), d(320)), (d(160), d(224)), d(128),
                           dtype=self.dtype, name="mixed_5b")(x)
        x = InceptionBlock(d(352), (d(192), d(320)), (d(192), d(224)), d(128),
                           use_max_pool=True, dtype=self.dtype, name="mixed_5c")(x)
        return [endpoint_16, x]


class InceptionV2ProposalFeatures(nn.Module):
    """Stem through Mixed_4e (stride 16) — the faster_rcnn_inception_v2
    first-stage extractor (reference models/faster_rcnn_inception_v2_
    feature_extractor)."""

    depth_multiplier: float = 1.0
    min_depth: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # frozen BN
        return InceptionV2(
            self.depth_multiplier, self.min_depth, dtype=self.dtype, name="body"
        )(x)[0]


class InceptionV2BoxClassifierFeatures(nn.Module):
    """Mixed_5a..Mixed_5c on ROI crops (the second-stage branch; Mixed_5a
    keeps its stride-2 as in the reference — callers global-pool)."""

    depth_multiplier: float = 1.0
    min_depth: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        d = lambda c: max(int(c * self.depth_multiplier), self.min_depth)
        x = x.astype(self.dtype)
        x = ReductionBlock((d(128), d(192)), (d(192), d(256)),
                           dtype=self.dtype, name="mixed_5a")(x)
        x = InceptionBlock(d(352), (d(192), d(320)), (d(160), d(224)), d(128),
                           dtype=self.dtype, name="mixed_5b")(x)
        x = InceptionBlock(d(352), (d(192), d(320)), (d(192), d(224)), d(128),
                           use_max_pool=True, dtype=self.dtype, name="mixed_5c")(x)
        return x
