"""MobileNet v1 backbone (reference slim/nets/mobilenet_v1.py, SURVEY.md
§3.8) — depthwise-separable conv stack in Flax, bf16, exposing the two
SSD feature endpoints (conv11 stride-16, conv13 stride-32). BN is frozen
(fine-tuning semantics) or live per bn_trainable — the reference trains
base-network BN whenever conv_hyperparams.batch_norm.train is set."""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
import flax.linen as nn

from mtlx.backbones.resnet import BNSpec, apply_norm, make_norm

Dtype = Any

# (stride, out_channels) per depthwise-separable block, after the conv0 stem
_MOBILENET_V1_DEFS = [
    (1, 64), (2, 128), (1, 128), (2, 256), (1, 256),
    (2, 512), (1, 512), (1, 512), (1, 512), (1, 512), (1, 512),  # conv11
    (2, 1024), (1, 1024),  # conv13
]


def _depth(channels: int, multiplier: float, min_depth: int) -> int:
    return max(int(channels * multiplier), min_depth)


class MobileNetV1(nn.Module):
    """Returns [conv11, conv13] feature maps (strides 16 and 32).

    bn_epsilon follows the extractor's conv_hyperparams.batch_norm
    (slim arg_scope default 0.001 when configured; 1e-5 otherwise)."""

    depth_multiplier: float = 1.0
    min_depth: int = 8
    # slim mobilenet_v1 arg_scope batch-norm epsilon (0.001, like the
    # inception family; resnet alone uses 1e-5)
    bn_epsilon: float = 1e-3
    # conv_hyperparams.batch_norm.{center,scale,decay,train}
    bn_center: bool = True
    bn_scale: bool = True
    # batch_norm.decay (slim ssd configs use 0.9997); only meaningful
    # when bn_trainable — frozen BN never updates its stats
    bn_momentum: float = 0.9997
    bn_trainable: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        spec = BNSpec(momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                      center=self.bn_center, scale=self.bn_scale)

        def bn(v, name):
            return apply_norm(
                make_norm(self.bn_trainable, self.dtype, name, spec), v, train
            )

        x = x.astype(self.dtype)
        out = nn.Conv(
            _depth(32, self.depth_multiplier, self.min_depth), (3, 3),
            strides=(2, 2), padding="SAME", use_bias=False, dtype=self.dtype,
            name="conv0",
        )(x)
        out = nn.relu6(bn(out, "conv0_bn"))
        endpoints = []
        for i, (stride, channels) in enumerate(_MOBILENET_V1_DEFS):
            c = _depth(channels, self.depth_multiplier, self.min_depth)
            dw = nn.Conv(
                out.shape[-1], (3, 3), strides=(stride, stride), padding="SAME",
                feature_group_count=out.shape[-1], use_bias=False,
                dtype=self.dtype, name=f"conv{i + 1}_dw",
            )(out)
            dw = nn.relu6(bn(dw, f"conv{i + 1}_dw_bn"))
            out = nn.Conv(
                c, (1, 1), use_bias=False, dtype=self.dtype, name=f"conv{i + 1}_pw"
            )(dw)
            out = nn.relu6(bn(out, f"conv{i + 1}_pw_bn"))
            if i in (10, 12):  # conv11, conv13
                endpoints.append(out)
        return endpoints


class MobileNetV1Classifier(nn.Module):
    """Classification variant (ImageNet-init source, slim parity). Trains
    with live BN like slim classification (bn_trainable default True)."""

    num_classes: int = 1000
    depth_multiplier: float = 1.0
    bn_trainable: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = MobileNetV1(
            self.depth_multiplier, bn_trainable=self.bn_trainable,
            dtype=self.dtype, name="body",
        )(x, train=train)
        pooled = jnp.mean(feats[-1], axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="logits")(pooled)
