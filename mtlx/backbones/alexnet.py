"""AlexNet (reference slim/nets/alexnet.py, SURVEY.md §3.8 legacy)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class AlexNetFeatures(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(64, (11, 11), strides=(4, 4), padding="VALID",
                            dtype=self.dtype, name="conv1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(192, (5, 5), padding="SAME", dtype=self.dtype,
                            name="conv2")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding="SAME", dtype=self.dtype,
                            name="conv3")(x))
        x = nn.relu(nn.Conv(384, (3, 3), padding="SAME", dtype=self.dtype,
                            name="conv4")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                            name="conv5")(x))
        return nn.max_pool(x, (3, 3), strides=(2, 2))


class AlexNetClassifier(nn.Module):
    num_classes: int = 1000
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = AlexNetFeatures(dtype=self.dtype, name="features")(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.relu(nn.Dense(4096, name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(4096, name="fc7")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        return nn.Dense(self.num_classes, name="fc8")(x)
