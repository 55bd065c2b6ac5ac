"""Multi-resolution feature map generation for SSD (reference
models/feature_map_generators.py multi_resolution_feature_maps)."""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class ExtraFeatureLayers(nn.Module):
    """Appends stride-2 conv feature maps after the backbone endpoints:
    each extra layer is 1x1 conv (depth/2) -> 3x3 stride-2 conv (depth)."""

    depths: Sequence[int] = (512, 256, 256, 128)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray]) -> List[jnp.ndarray]:
        out = list(feature_maps)
        x = out[-1]
        for i, depth in enumerate(self.depths):
            x = nn.relu(
                nn.Conv(depth // 2, (1, 1), dtype=self.dtype, name=f"extra{i}_1x1")(x)
            )
            x = nn.relu(
                nn.Conv(
                    depth, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, name=f"extra{i}_3x3",
                )(x)
            )
            out.append(x)
        return out
