"""Inception v4 (reference slim/nets/inception_v4.py, SURVEY.md §3.8) —
stem + A/B/C blocks with their reductions; frozen BN, bf16."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from mtlx.backbones.inception_resnet_v2 import ConvBN

Dtype = Any


class BlockA(nn.Module):  # 35x35
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(96, (1, 1), dtype=self.dtype, name="b0")(x)
        b1 = ConvBN(64, (1, 1), dtype=self.dtype, name="b1a")(x)
        b1 = ConvBN(96, (3, 3), dtype=self.dtype, name="b1b")(b1)
        b2 = ConvBN(64, (1, 1), dtype=self.dtype, name="b2a")(x)
        b2 = ConvBN(96, (3, 3), dtype=self.dtype, name="b2b")(b2)
        b2 = ConvBN(96, (3, 3), dtype=self.dtype, name="b2c")(b2)
        p = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        p = ConvBN(96, (1, 1), dtype=self.dtype, name="pool")(p)
        return jnp.concatenate([b0, b1, b2, p], axis=-1)  # 384


class BlockB(nn.Module):  # 17x17
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(384, (1, 1), dtype=self.dtype, name="b0")(x)
        b1 = ConvBN(192, (1, 1), dtype=self.dtype, name="b1a")(x)
        b1 = ConvBN(224, (1, 7), dtype=self.dtype, name="b1b")(b1)
        b1 = ConvBN(256, (7, 1), dtype=self.dtype, name="b1c")(b1)
        b2 = ConvBN(192, (1, 1), dtype=self.dtype, name="b2a")(x)
        b2 = ConvBN(192, (7, 1), dtype=self.dtype, name="b2b")(b2)
        b2 = ConvBN(224, (1, 7), dtype=self.dtype, name="b2c")(b2)
        b2 = ConvBN(224, (7, 1), dtype=self.dtype, name="b2d")(b2)
        b2 = ConvBN(256, (1, 7), dtype=self.dtype, name="b2e")(b2)
        p = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        p = ConvBN(128, (1, 1), dtype=self.dtype, name="pool")(p)
        return jnp.concatenate([b0, b1, b2, p], axis=-1)  # 1024


class BlockC(nn.Module):  # 8x8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(256, (1, 1), dtype=self.dtype, name="b0")(x)
        b1 = ConvBN(384, (1, 1), dtype=self.dtype, name="b1a")(x)
        b1 = jnp.concatenate(
            [
                ConvBN(256, (1, 3), dtype=self.dtype, name="b1b")(b1),
                ConvBN(256, (3, 1), dtype=self.dtype, name="b1c")(b1),
            ],
            axis=-1,
        )
        b2 = ConvBN(384, (1, 1), dtype=self.dtype, name="b2a")(x)
        b2 = ConvBN(448, (3, 1), dtype=self.dtype, name="b2b")(b2)
        b2 = ConvBN(512, (1, 3), dtype=self.dtype, name="b2c")(b2)
        b2 = jnp.concatenate(
            [
                ConvBN(256, (1, 3), dtype=self.dtype, name="b2d")(b2),
                ConvBN(256, (3, 1), dtype=self.dtype, name="b2e")(b2),
            ],
            axis=-1,
        )
        p = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        p = ConvBN(256, (1, 1), dtype=self.dtype, name="pool")(p)
        return jnp.concatenate([b0, b1, b2, p], axis=-1)  # 1536


class InceptionV4Features(nn.Module):
    """Returns (Mixed_6h stride-16 endpoint [1024ch], final Mixed_7d
    stride-32 [1536ch])."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = x.astype(d)
        # stem
        x = ConvBN(32, (3, 3), (2, 2), dtype=d, name="conv1")(x)
        x = ConvBN(32, (3, 3), dtype=d, name="conv2")(x)
        x = ConvBN(64, (3, 3), dtype=d, name="conv3")(x)
        a = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        b = ConvBN(96, (3, 3), (2, 2), dtype=d, name="stem_conv")(x)
        x = jnp.concatenate([a, b], axis=-1)  # /4, 160
        a = ConvBN(64, (1, 1), dtype=d, name="s1a")(x)
        a = ConvBN(96, (3, 3), dtype=d, name="s1b")(a)
        b = ConvBN(64, (1, 1), dtype=d, name="s2a")(x)
        b = ConvBN(64, (1, 7), dtype=d, name="s2b")(b)
        b = ConvBN(64, (7, 1), dtype=d, name="s2c")(b)
        b = ConvBN(96, (3, 3), dtype=d, name="s2d")(b)
        x = jnp.concatenate([a, b], axis=-1)  # 192
        a = ConvBN(192, (3, 3), (2, 2), dtype=d, name="s3")(x)
        b = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = jnp.concatenate([a, b], axis=-1)  # /8, 384
        for i in range(4):
            x = BlockA(dtype=d, name=f"mixed_5{chr(98 + i)}")(x)
        # reduction A -> /16
        a = ConvBN(384, (3, 3), (2, 2), dtype=d, name="ra_b0")(x)
        b = ConvBN(192, (1, 1), dtype=d, name="ra_b1a")(x)
        b = ConvBN(224, (3, 3), dtype=d, name="ra_b1b")(b)
        b = ConvBN(256, (3, 3), (2, 2), dtype=d, name="ra_b1c")(b)
        p = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = jnp.concatenate([a, b, p], axis=-1)  # 1024
        for i in range(7):
            x = BlockB(dtype=d, name=f"mixed_6{chr(98 + i)}")(x)
        endpoint_16 = x
        # reduction B -> /32
        a = ConvBN(192, (1, 1), dtype=d, name="rb_b0a")(x)
        a = ConvBN(192, (3, 3), (2, 2), dtype=d, name="rb_b0b")(a)
        b = ConvBN(256, (1, 1), dtype=d, name="rb_b1a")(x)
        b = ConvBN(256, (1, 7), dtype=d, name="rb_b1b")(b)
        b = ConvBN(320, (7, 1), dtype=d, name="rb_b1c")(b)
        b = ConvBN(320, (3, 3), (2, 2), dtype=d, name="rb_b1d")(b)
        p = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = jnp.concatenate([a, b, p], axis=-1)  # 1536
        for i in range(3):
            x = BlockC(dtype=d, name=f"mixed_7{chr(98 + i)}")(x)
        return endpoint_16, x


class InceptionV4Classifier(nn.Module):
    num_classes: int = 1000
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        _, x = InceptionV4Features(dtype=self.dtype, name="body")(x)
        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="logits")(pooled)
