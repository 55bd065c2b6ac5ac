"""Inception v1 / GoogLeNet (reference slim/nets/inception_v1.py,
SURVEY.md §3.8 alt backbones) — frozen BN, bf16."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import flax.linen as nn

from mtlx.backbones.inception_resnet_v2 import ConvBN

Dtype = Any


class InceptionModule(nn.Module):
    """Classic GoogLeNet module: 1x1 | 1x1-3x3 | 1x1-5x5 | pool-1x1."""

    b0: int
    b1: Tuple[int, int]
    b2: Tuple[int, int]
    pool_proj: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        o0 = ConvBN(self.b0, (1, 1), dtype=self.dtype, name="b0")(x)
        o1 = ConvBN(self.b1[0], (1, 1), dtype=self.dtype, name="b1a")(x)
        o1 = ConvBN(self.b1[1], (3, 3), dtype=self.dtype, name="b1b")(o1)
        o2 = ConvBN(self.b2[0], (1, 1), dtype=self.dtype, name="b2a")(x)
        o2 = ConvBN(self.b2[1], (5, 5), dtype=self.dtype, name="b2b")(o2)
        p = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        p = ConvBN(self.pool_proj, (1, 1), dtype=self.dtype, name="pool")(p)
        return jnp.concatenate([o0, o1, o2, p], axis=-1)


class InceptionV1Features(nn.Module):
    """Stem through Mixed_5c (stride 32); also returns the Mixed_4f
    stride-16 endpoint."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = ConvBN(64, (7, 7), (2, 2), dtype=self.dtype, name="conv1")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = ConvBN(64, (1, 1), dtype=self.dtype, name="conv2a")(x)
        x = ConvBN(192, (3, 3), dtype=self.dtype, name="conv2b")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")  # /8
        x = InceptionModule(64, (96, 128), (16, 32), 32, self.dtype, name="mixed_3b")(x)
        x = InceptionModule(128, (128, 192), (32, 96), 64, self.dtype, name="mixed_3c")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")  # /16
        x = InceptionModule(192, (96, 208), (16, 48), 64, self.dtype, name="mixed_4b")(x)
        x = InceptionModule(160, (112, 224), (24, 64), 64, self.dtype, name="mixed_4c")(x)
        x = InceptionModule(128, (128, 256), (24, 64), 64, self.dtype, name="mixed_4d")(x)
        x = InceptionModule(112, (144, 288), (32, 64), 64, self.dtype, name="mixed_4e")(x)
        x = InceptionModule(256, (160, 320), (32, 128), 128, self.dtype, name="mixed_4f")(x)
        endpoint_16 = x  # 832 channels
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")  # /32
        x = InceptionModule(256, (160, 320), (32, 128), 128, self.dtype, name="mixed_5b")(x)
        x = InceptionModule(384, (192, 384), (48, 128), 128, self.dtype, name="mixed_5c")(x)
        return endpoint_16, x


class InceptionV1Classifier(nn.Module):
    num_classes: int = 1000
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        _, x = InceptionV1Features(dtype=self.dtype, name="body")(x)
        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="logits")(pooled)
