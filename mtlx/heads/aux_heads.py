"""Auxiliary self-supervised task heads (MTL-SSL extension, SURVEY.md §3.11).

Three small heads sharing the detector backbone:
  * ForegroundHead — conv head on the stride-16 feature map predicting the
    rasterized union-of-boxes mask (per-pixel sigmoid)
  * MultiObjectHead — MLP on pooled window features predicting the soft
    multi-label class distribution of the window (softmax CE vs soft label)
  * ClosenessHead — MLP on pooled ROI features predicting the proximity-
    weighted class distribution of neighboring objects

Each head optionally emits a refinement feature vector that the detector
can fuse back into the second-stage features (the paper's "refine" path).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class ForegroundHead(nn.Module):
    depth: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features):
        x = nn.relu(
            nn.Conv(self.depth, (3, 3), padding="SAME", dtype=self.dtype, name="conv")(
                features.astype(self.dtype)
            )
        )
        logits = nn.Conv(1, (1, 1), dtype=self.dtype, name="logits")(x)
        return logits.astype(jnp.float32)[..., 0]  # [B, H, W]


class MultiObjectHead(nn.Module):
    num_classes: int
    hidden: int = 1024
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled):
        # LayerNorm: pooled backbone features are unnormalized (frozen-BN
        # backbone); without it the logits start at O(30) and the CE
        # saturates at init
        x = nn.LayerNorm(dtype=jnp.float32, name="ln")(pooled.astype(jnp.float32))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc")(
            x.astype(self.dtype)
        ))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="logits")(x)
        return logits.astype(jnp.float32), x


class ClosenessHead(nn.Module):
    num_classes: int
    hidden: int = 1024
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled):
        x = nn.LayerNorm(dtype=jnp.float32, name="ln")(pooled.astype(jnp.float32))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc")(
            x.astype(self.dtype)
        ))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="logits")(x)
        return logits.astype(jnp.float32), x
