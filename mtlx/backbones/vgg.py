"""VGG-16 (reference slim/nets/vgg.py, SURVEY.md §3.8 legacy backbones)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

_CFG16 = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]


class VGG16Features(nn.Module):
    """conv1_1..conv5_3 (stride 16 at conv5). Returns the conv5_3 map."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for block, (reps, ch) in enumerate(_CFG16, start=1):
            for unit in range(1, reps + 1):
                x = nn.relu(
                    nn.Conv(
                        ch, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{block}_{unit}",
                    )(x)
                )
            if block < 5:  # detector variant keeps conv5 at stride 16
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class VGG16Classifier(nn.Module):
    num_classes: int = 1000
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = VGG16Features(dtype=self.dtype, name="features")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.relu(nn.Dense(4096, name="fc6")(x))
        x = nn.relu(nn.Dense(4096, name="fc7")(x))
        return nn.Dense(self.num_classes, name="fc8")(x)
