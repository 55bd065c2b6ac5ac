"""Multi-resolution feature map generation for SSD (reference
models/feature_map_generators.py multi_resolution_feature_maps,
SURVEY.md §3.2).

The reference builds SSD's feature pyramid from a per-extractor layout
spec: `from_layer` names pick backbone endpoints, empty entries append a
new stride-2 map whose depth comes from `layer_depth`, optionally with an
inserted 1x1 bottleneck conv at half depth; every depth goes through
`depth_fn(d) = max(int(d * depth_multiplier), min_depth)`. We keep the
same spec semantics with endpoints passed positionally (our backbones
return ordered endpoint lists instead of name->tensor dicts).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

# Reference layouts (models/ssd_*_feature_extractor.py): two backbone
# endpoints (stride 16 + stride 32) then stride-2 extras at these depths.
SSD_EXTRA_DEPTHS = (512, 256, 256, 128, 128, 128)


def ssd_layer_depths(num_layers: int, num_endpoints: int = 2) -> List[int]:
    """Layout for an SSD pyramid: -1 marks "consume the next backbone
    endpoint" (reference from_layer non-empty), positive entries are the
    layer_depth of a generated stride-2 extra map."""
    extras = list(SSD_EXTRA_DEPTHS[: max(0, num_layers - num_endpoints)])
    return [-1] * min(num_endpoints, num_layers) + extras


class MultiResolutionFeatureMaps(nn.Module):
    """Config-driven SSD feature pyramid (reference
    multi_resolution_feature_maps).

    layer_depths: -1 entries consume backbone endpoints in order; positive
    entries append a new map: [optional 1x1 conv depth_fn(d/2)] -> 3x3
    stride-2 conv depth_fn(d), both ReLU (slim conv2d default).
    """

    layer_depths: Sequence[int]
    depth_multiplier: float = 1.0
    min_depth: int = 16
    insert_1x1_conv: bool = True
    conv_kernel_size: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, endpoints: List[jnp.ndarray]) -> List[jnp.ndarray]:
        depth_fn = lambda d: max(int(d * self.depth_multiplier), self.min_depth)
        out: List[jnp.ndarray] = []
        next_endpoint = 0
        num_extra = 0  # extras numbered by generated-layer count, so the
        # param names are stable under layout changes that only add/remove
        # leading from_layer entries (checkpoint compatibility)
        k = self.conv_kernel_size
        for layer_depth in self.layer_depths:
            if layer_depth < 0:
                if next_endpoint >= len(endpoints):
                    raise ValueError(
                        f"layout {tuple(self.layer_depths)} wants endpoint "
                        f"{next_endpoint} but backbone provides {len(endpoints)}"
                    )
                out.append(endpoints[next_endpoint])
                next_endpoint += 1
                continue
            if not out:
                raise ValueError("layout must start from a backbone endpoint")
            x = out[-1]
            if self.insert_1x1_conv:
                x = nn.relu(
                    nn.Conv(
                        depth_fn(layer_depth // 2), (1, 1),
                        dtype=self.dtype, name=f"extra{num_extra}_1x1",
                    )(x)
                )
            x = nn.relu(
                nn.Conv(
                    depth_fn(layer_depth), (k, k), strides=(2, 2),
                    padding="SAME", dtype=self.dtype,
                    name=f"extra{num_extra}_3x3",
                )(x)
            )
            out.append(x)
            num_extra += 1
        return out


