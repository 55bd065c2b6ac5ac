"""Inception v3 (reference slim/nets/inception_v3.py, SURVEY.md §3.8 alt
backbones) — classification variant + stride-16 feature endpoint
(Mixed_6e), frozen BN, bf16."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from mtlx.backbones.inception_resnet_v2 import ConvBN

Dtype = Any


class MixedA(nn.Module):
    """35x35 block: 1x1 | 5x5 | double-3x3 | pool branches."""

    pool_features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(64, (1, 1), dtype=self.dtype, name="b0")(x)
        b1 = ConvBN(48, (1, 1), dtype=self.dtype, name="b1a")(x)
        b1 = ConvBN(64, (5, 5), dtype=self.dtype, name="b1b")(b1)
        b2 = ConvBN(64, (1, 1), dtype=self.dtype, name="b2a")(x)
        b2 = ConvBN(96, (3, 3), dtype=self.dtype, name="b2b")(b2)
        b2 = ConvBN(96, (3, 3), dtype=self.dtype, name="b2c")(b2)
        p = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        p = ConvBN(self.pool_features, (1, 1), dtype=self.dtype, name="pool")(p)
        return jnp.concatenate([b0, b1, b2, p], axis=-1)


class MixedB(nn.Module):
    """17x17 block with 1x7/7x1 factorized convs."""

    c7: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b0 = ConvBN(192, (1, 1), dtype=self.dtype, name="b0")(x)
        b1 = ConvBN(c7, (1, 1), dtype=self.dtype, name="b1a")(x)
        b1 = ConvBN(c7, (1, 7), dtype=self.dtype, name="b1b")(b1)
        b1 = ConvBN(192, (7, 1), dtype=self.dtype, name="b1c")(b1)
        b2 = ConvBN(c7, (1, 1), dtype=self.dtype, name="b2a")(x)
        b2 = ConvBN(c7, (7, 1), dtype=self.dtype, name="b2b")(b2)
        b2 = ConvBN(c7, (1, 7), dtype=self.dtype, name="b2c")(b2)
        b2 = ConvBN(c7, (7, 1), dtype=self.dtype, name="b2d")(b2)
        b2 = ConvBN(192, (1, 7), dtype=self.dtype, name="b2e")(b2)
        p = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        p = ConvBN(192, (1, 1), dtype=self.dtype, name="pool")(p)
        return jnp.concatenate([b0, b1, b2, p], axis=-1)


class MixedC(nn.Module):
    """8x8 block with expanded 1x3/3x1 branches."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(320, (1, 1), dtype=self.dtype, name="b0")(x)
        b1 = ConvBN(384, (1, 1), dtype=self.dtype, name="b1a")(x)
        b1 = jnp.concatenate(
            [
                ConvBN(384, (1, 3), dtype=self.dtype, name="b1b")(b1),
                ConvBN(384, (3, 1), dtype=self.dtype, name="b1c")(b1),
            ],
            axis=-1,
        )
        b2 = ConvBN(448, (1, 1), dtype=self.dtype, name="b2a")(x)
        b2 = ConvBN(384, (3, 3), dtype=self.dtype, name="b2b")(b2)
        b2 = jnp.concatenate(
            [
                ConvBN(384, (1, 3), dtype=self.dtype, name="b2c")(b2),
                ConvBN(384, (3, 1), dtype=self.dtype, name="b2d")(b2),
            ],
            axis=-1,
        )
        p = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        p = ConvBN(192, (1, 1), dtype=self.dtype, name="pool")(p)
        return jnp.concatenate([b0, b1, b2, p], axis=-1)


class InceptionV3Features(nn.Module):
    """Stem through Mixed_7c; returns (Mixed_6e stride-16 endpoint, final)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = ConvBN(32, (3, 3), (2, 2), dtype=self.dtype, name="conv1a")(x)
        x = ConvBN(32, (3, 3), dtype=self.dtype, name="conv2a")(x)
        x = ConvBN(64, (3, 3), dtype=self.dtype, name="conv2b")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = ConvBN(80, (1, 1), dtype=self.dtype, name="conv3b")(x)
        x = ConvBN(192, (3, 3), dtype=self.dtype, name="conv4a")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")  # /8
        x = MixedA(32, dtype=self.dtype, name="mixed_5b")(x)
        x = MixedA(64, dtype=self.dtype, name="mixed_5c")(x)
        x = MixedA(64, dtype=self.dtype, name="mixed_5d")(x)
        # mixed_6a reduction /16
        b0 = ConvBN(384, (3, 3), (2, 2), dtype=self.dtype, name="m6a_b0")(x)
        b1 = ConvBN(64, (1, 1), dtype=self.dtype, name="m6a_b1a")(x)
        b1 = ConvBN(96, (3, 3), dtype=self.dtype, name="m6a_b1b")(b1)
        b1 = ConvBN(96, (3, 3), (2, 2), dtype=self.dtype, name="m6a_b1c")(b1)
        p = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = jnp.concatenate([b0, b1, p], axis=-1)
        x = MixedB(128, dtype=self.dtype, name="mixed_6b")(x)
        x = MixedB(160, dtype=self.dtype, name="mixed_6c")(x)
        x = MixedB(160, dtype=self.dtype, name="mixed_6d")(x)
        x = MixedB(192, dtype=self.dtype, name="mixed_6e")(x)
        endpoint_16 = x  # 768 channels, stride 16
        # mixed_7a reduction /32
        b0 = ConvBN(192, (1, 1), dtype=self.dtype, name="m7a_b0a")(x)
        b0 = ConvBN(320, (3, 3), (2, 2), dtype=self.dtype, name="m7a_b0b")(b0)
        b1 = ConvBN(192, (1, 1), dtype=self.dtype, name="m7a_b1a")(x)
        b1 = ConvBN(192, (1, 7), dtype=self.dtype, name="m7a_b1b")(b1)
        b1 = ConvBN(192, (7, 1), dtype=self.dtype, name="m7a_b1c")(b1)
        b1 = ConvBN(192, (3, 3), (2, 2), dtype=self.dtype, name="m7a_b1d")(b1)
        p = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = jnp.concatenate([b0, b1, p], axis=-1)
        x = MixedC(dtype=self.dtype, name="mixed_7b")(x)
        x = MixedC(dtype=self.dtype, name="mixed_7c")(x)
        return endpoint_16, x


class InceptionV3Classifier(nn.Module):
    num_classes: int = 1000
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        _, x = InceptionV3Features(dtype=self.dtype, name="body")(x)
        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="logits")(pooled)
