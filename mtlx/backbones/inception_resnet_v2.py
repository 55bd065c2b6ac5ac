"""Inception-ResNet-v2 backbone with the Faster R-CNN split (reference
slim/nets/inception_resnet_v2.py +
models/faster_rcnn_inception_resnet_v2_feature_extractor.py, SURVEY.md
§3.2/§3.8): proposal features = stem + 10x block35 + mixed_6a + 20x
block17 (stride 16, 1088ch); box classifier features = mixed_7a + 9x
block8 + final block8 + conv7b (1536ch), stride 1 on ROI crops."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from mtlx.backbones.resnet import BNSpec, apply_norm, make_norm

Dtype = Any


class ConvBN(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: str = "SAME"
    relu: bool = True
    # slim's inception arg_scope batch-norm epsilon (inception_v2/v3/v4 and
    # inception_resnet_v2 all use 0.001, unlike resnet's 1e-5) — converted
    # slim checkpoints diverge numerically under any other value
    bn_epsilon: float = 1e-3
    # conv_hyperparams.batch_norm.{train,decay,center,scale}: live BN when
    # the owning extractor trains its base network (slim batch_norm
    # is_training semantics; the sample ssd configs set train: true).
    # Frozen and live modes share param/batch_stats names (make_norm), so
    # checkpoints are interchangeable.
    bn_trainable: bool = False
    bn_momentum: float = 0.9997
    bn_center: bool = True
    bn_scale: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=self.padding,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        spec = BNSpec(momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                      center=self.bn_center, scale=self.bn_scale)
        x = apply_norm(
            make_norm(self.bn_trainable, self.dtype, "bn", spec), x, train
        )
        return nn.relu(x) if self.relu else x


class BNKnobs(nn.Module):
    """Mixin holding the feature_extractor batch-norm sub-knobs
    (batch_norm_trainable + batch_norm.{decay,epsilon,center,scale})
    threaded to every ConvBN in the subtree. Defaults are slim's
    inception arg_scope values."""

    bn_trainable: bool = False
    bn_momentum: float = 0.9997
    bn_epsilon: float = 1e-3
    bn_center: bool = True
    bn_scale: bool = True

    def _bn_kwargs(self):
        return dict(
            bn_trainable=self.bn_trainable, bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon, bn_center=self.bn_center,
            bn_scale=self.bn_scale,
        )


class Block35(BNKnobs):
    """35x35 inception-resnet block, scale 0.17."""

    scale: float = 0.17
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, **self._bn_kwargs())
        b0 = ConvBN(32, (1, 1), name="b0", **kw)(x, train)
        b1 = ConvBN(32, (1, 1), name="b1a", **kw)(x, train)
        b1 = ConvBN(32, (3, 3), name="b1b", **kw)(b1, train)
        b2 = ConvBN(32, (1, 1), name="b2a", **kw)(x, train)
        b2 = ConvBN(48, (3, 3), name="b2b", **kw)(b2, train)
        b2 = ConvBN(64, (3, 3), name="b2c", **kw)(b2, train)
        mixed = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="up")(mixed)
        return nn.relu(x + self.scale * up)


class Block17(BNKnobs):
    """17x17 block, scale 0.10."""

    scale: float = 0.10
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, **self._bn_kwargs())
        b0 = ConvBN(192, (1, 1), name="b0", **kw)(x, train)
        b1 = ConvBN(128, (1, 1), name="b1a", **kw)(x, train)
        b1 = ConvBN(160, (1, 7), name="b1b", **kw)(b1, train)
        b1 = ConvBN(192, (7, 1), name="b1c", **kw)(b1, train)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="up")(mixed)
        return nn.relu(x + self.scale * up)


class Block8(BNKnobs):
    """8x8 block, scale 0.20."""

    scale: float = 0.20
    relu: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, **self._bn_kwargs())
        b0 = ConvBN(192, (1, 1), name="b0", **kw)(x, train)
        b1 = ConvBN(192, (1, 1), name="b1a", **kw)(x, train)
        b1 = ConvBN(224, (1, 3), name="b1b", **kw)(b1, train)
        b1 = ConvBN(256, (3, 1), name="b1c", **kw)(b1, train)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="up")(mixed)
        out = x + self.scale * up
        return nn.relu(out) if self.relu else out


class InceptionResnetV2ProposalFeatures(BNKnobs):
    """Stem through block17 repeats — stride 16, 1088 channels.
    bn_trainable honors feature_extractor.batch_norm_trainable."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, **self._bn_kwargs())
        x = x.astype(self.dtype)
        x = ConvBN(32, (3, 3), (2, 2), name="conv1", **kw)(x, train)
        x = ConvBN(32, (3, 3), name="conv2", **kw)(x, train)
        x = ConvBN(64, (3, 3), name="conv3", **kw)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = ConvBN(80, (1, 1), name="conv4", **kw)(x, train)
        x = ConvBN(192, (3, 3), name="conv5", **kw)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        # mixed_5b
        b0 = ConvBN(96, (1, 1), name="m5b_b0", **kw)(x, train)
        b1 = ConvBN(48, (1, 1), name="m5b_b1a", **kw)(x, train)
        b1 = ConvBN(64, (5, 5), name="m5b_b1b", **kw)(b1, train)
        b2 = ConvBN(64, (1, 1), name="m5b_b2a", **kw)(x, train)
        b2 = ConvBN(96, (3, 3), name="m5b_b2b", **kw)(b2, train)
        b2 = ConvBN(96, (3, 3), name="m5b_b2c", **kw)(b2, train)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b3 = ConvBN(64, (1, 1), name="m5b_b3", **kw)(b3, train)
        x = jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 320
        for i in range(10):
            x = Block35(name=f"block35_{i + 1}", **kw)(x, train)
        # mixed_6a (stride 2 -> /16)
        b0 = ConvBN(384, (3, 3), (2, 2), name="m6a_b0", **kw)(x, train)
        b1 = ConvBN(256, (1, 1), name="m6a_b1a", **kw)(x, train)
        b1 = ConvBN(256, (3, 3), name="m6a_b1b", **kw)(b1, train)
        b1 = ConvBN(384, (3, 3), (2, 2), name="m6a_b1c", **kw)(b1, train)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = jnp.concatenate([b0, b1, b2], axis=-1)  # 1088
        for i in range(20):
            x = Block17(name=f"block17_{i + 1}", **kw)(x, train)
        return x


class InceptionResnetV2BoxClassifierFeatures(BNKnobs):
    """mixed_7a + block8 repeats + conv7b on ROI crops (stride 1)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, **self._bn_kwargs())
        x = x.astype(self.dtype)
        # mixed_7a at stride 1 (detector fine-tuning keeps ROI resolution;
        # kernel shapes match the reference's stride-2 form 1:1). Branch 3
        # is the reference's max-pool branch — at stride 1 that is a 3x3/1
        # max pool, NOT the raw identity (converted checkpoints' block8
        # convs expect max-pooled statistics on those channels).
        b0 = ConvBN(256, (1, 1), name="m7a_b0a", **kw)(x, train)
        b0 = ConvBN(384, (3, 3), name="m7a_b0b", **kw)(b0, train)
        b1 = ConvBN(256, (1, 1), name="m7a_b1a", **kw)(x, train)
        b1 = ConvBN(288, (3, 3), name="m7a_b1b", **kw)(b1, train)
        b2 = ConvBN(256, (1, 1), name="m7a_b2a", **kw)(x, train)
        b2 = ConvBN(288, (3, 3), name="m7a_b2b", **kw)(b2, train)
        b2 = ConvBN(320, (3, 3), name="m7a_b2c", **kw)(b2, train)
        pooled = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        x = jnp.concatenate([b0, b1, b2, pooled], axis=-1)
        for i in range(9):
            x = Block8(name=f"block8_{i + 1}", **kw)(x, train)
        x = Block8(relu=False, name="block8_10", **kw)(x, train)
        return ConvBN(1536, (1, 1), name="conv7b", **kw)(x, train)
