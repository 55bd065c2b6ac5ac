"""ResNet v1 backbones (Flax) with the Faster R-CNN two-part split.

Re-implements the capability of the reference's `slim/nets/resnet_v1.py` +
`models/faster_rcnn_resnet_v1_feature_extractor.py` (SURVEY.md §3.2, §3.8):
the network is split into

  * proposal features: conv1 (7x7/2) -> maxpool/2 -> block1 -> block2/2 ->
    block3/2   (total stride 16, 1024 channels for R50/R101)
  * box classifier features: block4 with stride 1, applied to cropped
    14x14 -> maxpooled 7x7 ROI features, then global average pool (2048).

TPU-first details:
  * bfloat16 compute / float32 params by default (MXU-friendly); BN stats
    and residual adds in float32
  * frozen BatchNorm (moving stats folded into a scale/offset affine) —
    the reference fine-tunes with BN frozen (batch size 1); this is both
    faithful and removes all batch-stat traffic from the hot path
  * channels-last NHWC, conv via lax.conv_general_dilated through
    flax.linen.Conv (XLA tiles these onto the MXU directly)
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

BLOCK_SIZES = {
    # depth 10 is a wiring-validation size (1 bottleneck per stage): same
    # stem / stage / stride-transition structure as the production depths
    # at a fraction of the compile time — used by the multi-chip dryrun
    # and sharding tests, not a checkpoint-compatible architecture.
    10: (1, 1, 1, 1),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class BNSpec(NamedTuple):
    """Batch-norm hyperparameters (reference Hyperparams.batch_norm /
    feature_extractor arg_scope). Defaults are slim resnet_arg_scope's:
    decay 0.997, epsilon 1e-5, center + scale affine."""

    momentum: float = 0.997  # reference batch_norm.decay
    epsilon: float = 1e-5
    center: bool = True  # beta/bias param present
    scale: bool = True  # gamma/scale param present


class FrozenBatchNorm(nn.Module):
    """Affine y = gamma * (x - mean) / sqrt(var + eps) + beta with
    non-trainable moving statistics (reference fine-tuning BN semantics).

    `mean`/`var` live in the `batch_stats` collection so a TF checkpoint
    converter can populate them; they receive no gradient and are never
    updated by the train step. center/scale gate the beta/gamma params
    (reference batch_norm.{center,scale}; absent params behave as 0/1,
    matching slim's scale-less BN without a placeholder variable).
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    center: bool = True
    scale: bool = True

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        gamma = (
            self.param("scale", nn.initializers.ones, (features,), jnp.float32)
            if self.scale else jnp.ones((features,), jnp.float32)
        )
        beta = (
            self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
            if self.center else jnp.zeros((features,), jnp.float32)
        )
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        ).value
        # fold into one multiply-add, computed in fp32 then cast back
        inv = gamma * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        y = x.astype(jnp.float32) * inv + (beta - mean * inv)
        return y.astype(self.dtype)


class SpaceToDepthConv1(nn.Module):
    """The 7x7/2 stem conv computed as a 4x4/1 conv over a 2x2
    space-to-depth input (the standard TPU stem optimization, e.g. MLPerf
    ResNet): C=3 badly underfills the MXU's contraction lanes at 7*7*3,
    while the transformed 4*4*12 form runs on 4x fewer spatial positions.

    Numerically EXACT (zero-padded kernel reindexing, verified in
    tests/test_keypoints_backbones.py) and parameter-compatible: the
    param is the same (7, 7, 3, 64) "kernel" an nn.Conv named conv1
    would own, so checkpoints are interchangeable with the plain stem.

    Derivation: out[i] = sum_u xp[2i+u] K[u] with xp = pad(x, 3). With
    u' = u+1, K8 = pad-front(K), xq = pad(x, (4, 2)):
    out[i] = sum_{u'} xq[2i+u'] K8[u'] — an 8x8/2 VALID conv, which
    factors as a 4x4/1 VALID conv over the 2x2 space-to-depth of xq.
    """

    features: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        import jax

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 3, self.features),
            jnp.float32,
        )
        b, h, w, c = x.shape
        if h % 2 or w % 2:  # odd canvas: fall back to the plain form
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        xq = jnp.pad(x.astype(self.dtype), ((0, 0), (4, 2), (4, 2), (0, 0)))
        hq, wq = h + 6, w + 6
        s = (
            xq.reshape(b, hq // 2, 2, wq // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, hq // 2, wq // 2, 4 * c)
        )
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k12 = (
            k8.reshape(4, 2, 4, 2, 3, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, self.features)
        )
        return jax.lax.conv_general_dilated(
            s, k12.astype(self.dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def _bn_reduce_axes(x):
    return tuple(range(x.ndim - 1))


def _paired_sums(a, b, axes):
    """sum(a) and sum(a*b) as ONE variadic lax.reduce (fp32 accumulation).

    Two separate jnp.sum calls over shared inputs make XLA materialize
    the fp32 convert and the product as full-size tensors (each reduce
    gets its own input fusion and the common producers are CSE'd out of
    both); a single two-operand reduce keeps them inside one fusion —
    measured on the SSD step HLO audit (ROADMAP round 5)."""
    af = a.astype(jnp.float32)
    bf = af * b.astype(jnp.float32)
    zero = jnp.zeros((), jnp.float32)
    return jax.lax.reduce(
        (af, bf), (zero, zero),
        lambda acc, val: (acc[0] + val[0], acc[1] + val[1]),
        axes,
    )


def _bn_train_impl(x, gamma, beta, epsilon, dtype):
    axes = _bn_reduce_axes(x)
    n = x.size // x.shape[-1]
    s1, s2 = _paired_sums(x, x, axes)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = gamma * jax.lax.rsqrt(var + epsilon)
    y = x.astype(dtype) * inv.astype(dtype) + (beta - mean * inv).astype(dtype)
    return y, mean, var, inv


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bn_train(x, gamma, beta, epsilon, dtype):
    """Train-mode BN as one folded affine with a hand-written backward.

    Autodiff through the fp32 batch statistics emits full-size fp32
    cotangents (broadcast / multiply / add chains w.r.t. the promoted
    input) that XLA materializes at fusion boundaries — measured 43.9%
    of the SSD step's HBM bytes even after the forward was folded (HLO
    dtype audit, ROADMAP round 5). The analytic BN backward folds to

        dx = dy * a_c + x * b_c + c_c

    with per-channel constants from two reductions (S1 = sum(dy),
    Sx = sum(dy * x), fp32 accumulation): a fully `dtype` elementwise
    fusion, so no full-size fp32 tensor exists in either direction.
    Gradient equivalence vs flax nn.BatchNorm is tested at fp32 in
    tests/test_keypoints_backbones.py.
    """
    y, mean, var, _ = _bn_train_impl(x, gamma, beta, epsilon, dtype)
    return y, mean, var


def _bn_train_fwd(x, gamma, beta, epsilon, dtype):
    y, mean, var, inv = _bn_train_impl(x, gamma, beta, epsilon, dtype)
    n = x.size // x.shape[-1]
    return (y, mean, var), (x, gamma, mean, var, inv, n)


def _bn_train_bwd(epsilon, dtype, res, cts):
    gy, gmean, gvar = cts
    x, gamma, mean, var, inv, n = res
    axes = _bn_reduce_axes(x)
    # one variadic reduce over (gy, gy*x) with fp32 accumulation; the
    # converts/product live inside the reduce's input fusion (no
    # full-size fp32 materialization — see _paired_sums)
    s1, sx = _paired_sums(gy, x, axes)
    # d/d(scale) through y = x*s + (beta - mean*s):  Sx - mean*S1
    stot = sx - mean * s1
    rsig = jax.lax.rsqrt(var + epsilon)  # inv / gamma, but gamma may be 0
    dgamma = rsig * stot
    dbeta = s1
    gv = gvar - 0.5 * rsig * rsig * rsig * gamma * stot
    gmu = gmean - inv * s1 - 2.0 * mean * gv
    a_c = inv.astype(dtype)
    b_c = (2.0 * gv / n).astype(dtype)
    c_c = (gmu / n).astype(dtype)
    dx = (gy.astype(dtype) * a_c + x.astype(dtype) * b_c + c_c).astype(x.dtype)
    return dx, dgamma, dbeta


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


class LiveBatchNorm(nn.Module):
    """Trainable BatchNorm whose full-size math runs in the compute dtype.

    Batch statistics are reduced in fp32 (stability), then mean/var and
    gamma/beta are folded into per-channel scale/offset VECTORS, cast to
    `dtype`, and applied as one multiply-add — so the only full-size
    tensors in either the forward or the backward pass are `dtype`
    (bf16 in production). flax ``nn.BatchNorm`` instead computes
    ``(x - mean) * rsqrt(var + eps) * gamma + beta`` with fp32-promoted
    broadcasts: autodiff saves the fp32 ``x - mean`` intermediate for the
    backward, and on the SSD train step those fp32 residuals were 54.5%
    of all fusion-boundary HBM bytes (13.6 of 24.9 GB/step — HLO dtype
    audit, ROADMAP round 5). Folding reduces the saved residuals to the
    bf16 conv output (already materialized) plus per-channel vectors.

    Semantics match ``nn.BatchNorm(use_fast_variance=True)``: same stats
    (E[x^2] - E[x]^2 in fp32), same running-average update
    ``ra = momentum * ra + (1 - momentum) * batch_stat``, gradients flow
    through the batch statistics. Param (scale/bias) and batch_stats
    (mean/var) names match nn.BatchNorm and FrozenBatchNorm, so
    checkpoints are interchangeable across all three. The only delta is
    the per-channel scale/offset rounding to `dtype` before the affine —
    at bf16 that is the same order as the output cast flax applies
    anyway (equivalence tested in tests/test_keypoints_backbones.py).
    """

    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    center: bool = True
    scale: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        features = x.shape[-1]
        gamma = (
            self.param("scale", nn.initializers.ones, (features,), jnp.float32)
            if self.scale else jnp.ones((features,), jnp.float32)
        )
        beta = (
            self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
            if self.center else jnp.zeros((features,), jnp.float32)
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            inv = gamma * jax.lax.rsqrt(var + self.epsilon)
            scale_c = inv.astype(self.dtype)
            offset_c = (beta - mean * inv).astype(self.dtype)
            return x.astype(self.dtype) * scale_c + offset_c
        y, mean, var = _bn_train(x, gamma, beta, self.epsilon, self.dtype)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y


def make_norm(trainable: bool, dtype, name: str, bn: BNSpec = BNSpec()):
    """BN factory: frozen affine (fine-tuning default) or live BN
    (feature_extractor.batch_norm_trainable). Both use the same param
    (scale/bias) and batch_stats (mean/var) names, so checkpoints are
    interchangeable between the two modes. `bn` carries the reference's
    batch_norm.{decay,epsilon,center,scale} sub-knobs."""
    if trainable:
        return LiveBatchNorm(
            momentum=bn.momentum, epsilon=bn.epsilon,
            center=bn.center, scale=bn.scale,
            dtype=dtype, name=name,
        )
    return FrozenBatchNorm(
        epsilon=bn.epsilon, center=bn.center, scale=bn.scale,
        dtype=dtype, name=name,
    )


def apply_norm(norm, x, train: bool):
    if isinstance(norm, (nn.BatchNorm, LiveBatchNorm)):
        return norm(x, use_running_average=not train)
    return norm(x)


class Bottleneck(nn.Module):
    """ResNet v1 bottleneck: 1x1 -> 3x3(stride) -> 1x1, post-activation.

    slim_padding selects slim resnet_utils.conv2d_same semantics for the
    strided 3x3 conv — explicit symmetric (1,1) padding + VALID — instead
    of TF/flax SAME's (0,1); needed for activation-exact parity with
    converted slim checkpoints. Shortcut: 1x1 conv when the depth changes;
    a parameterless subsample (slim's maxpool-1x1-stride) when only the
    stride differs — slim has no shortcut weights in that case.
    """

    depth: int  # output channels
    depth_bottleneck: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_trainable: bool = False
    slim_padding: bool = False
    bn: BNSpec = BNSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        in_depth = x.shape[-1]

        def conv(f, k, s, name):
            if k > 1 and s > 1 and self.slim_padding:
                pad = [((k - 1) // 2, (k - 1) // 2)] * 2  # conv2d_same
            else:
                pad = "SAME"
            return nn.Conv(
                f, (k, k), strides=(s, s), padding=pad, use_bias=False,
                dtype=self.dtype, name=name,
            )

        bn = lambda v, name: apply_norm(
            make_norm(self.bn_trainable, self.dtype, name, self.bn), v, train
        )

        y = nn.relu(bn(conv(self.depth_bottleneck, 1, 1, "conv1")(x), "bn1"))
        y = nn.relu(bn(conv(self.depth_bottleneck, 3, self.stride, "conv2")(y), "bn2"))
        y = bn(conv(self.depth, 1, 1, "conv3")(y), "bn3")

        if in_depth != self.depth:
            residual = bn(
                conv(self.depth, 1, self.stride, "conv_shortcut")(x), "bn_shortcut"
            )
        elif self.stride != 1:
            residual = x[:, :: self.stride, :: self.stride, :]
        return nn.relu(residual + y)


class ResNetStage(nn.Module):
    """A stack of bottleneck units. Default: stride on the FIRST unit
    (torchvision/v1.5 style). slim_stride_order=True strides the LAST
    unit instead — slim resnet_v1's convention — for activation-exact
    parity with converted TF checkpoints (ROADMAP.md gap 2)."""

    num_units: int
    depth: int
    stride: int
    dtype: Dtype = jnp.bfloat16
    bn_trainable: bool = False
    slim_stride_order: bool = False
    # rematerialize each bottleneck in the backward pass: the train step is
    # HBM-bandwidth-bound (bench.py roofline), so recomputing unit
    # internals on the MXU is cheaper than round-tripping saved
    # activations through HBM. Numerically identical; params unchanged.
    remat: bool = False
    bn: BNSpec = BNSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride_unit = self.num_units - 1 if self.slim_stride_order else 0
        unit_cls = (
            nn.remat(Bottleneck, static_argnums=(2,)) if self.remat else Bottleneck
        )
        for i in range(self.num_units):
            x = unit_cls(
                depth=self.depth,
                depth_bottleneck=self.depth // 4,
                stride=self.stride if i == stride_unit else 1,
                dtype=self.dtype,
                bn_trainable=self.bn_trainable,
                slim_padding=self.slim_stride_order,
                bn=self.bn,
                name=f"unit{i + 1}",
            )(x, train)
        return x


class ResNetProposalFeatures(nn.Module):
    """conv1 + block1..block3 — stride-16 feature map for RPN + ROI crop."""

    depth: int = 50
    dtype: Dtype = jnp.bfloat16
    bn_trainable: bool = False
    slim_stride_order: bool = False
    remat: bool = False
    # exact 2x2 space-to-depth form of the stem conv (see SpaceToDepthConv1).
    # MEASURED NEGATIVE at the 1024^2 operating point (TPU v5e, 2026-08-17:
    # 72.0 -> 69.9 img/s, XLA cost-analysis bytes 8.47 -> 8.79 GB/img) —
    # XLA's native small-C stem handling is already good here; kept as a
    # documented option for other generations/canvas sizes
    conv0_space_to_depth: bool = False
    bn: BNSpec = BNSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        sizes = BLOCK_SIZES[self.depth]
        bt = self.bn_trainable
        so = self.slim_stride_order
        rm = self.remat
        bn = self.bn
        x = x.astype(self.dtype)
        if self.conv0_space_to_depth:
            x = SpaceToDepthConv1(64, dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, dtype=self.dtype, name="conv1",
            )(x)
        x = nn.relu(apply_norm(make_norm(bt, self.dtype, "bn1", bn), x, train))
        # slim pools with TF SAME padding ((0,1) on even inputs); the
        # default keeps the symmetric (1,1) used since round 1
        pool_pad = "SAME" if so else [(1, 1), (1, 1)]
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pool_pad)
        if so:
            # slim: blockN strides at its LAST unit (transition out)
            x = ResNetStage(sizes[0], 256, 2, self.dtype, bt, True, rm, bn, name="block1")(x, train)
            x = ResNetStage(sizes[1], 512, 2, self.dtype, bt, True, rm, bn, name="block2")(x, train)
            x = ResNetStage(sizes[2], 1024, 1, self.dtype, bt, True, rm, bn, name="block3")(x, train)
        else:
            x = ResNetStage(sizes[0], 256, 1, self.dtype, bt, False, rm, bn, name="block1")(x, train)
            x = ResNetStage(sizes[1], 512, 2, self.dtype, bt, False, rm, bn, name="block2")(x, train)
            x = ResNetStage(sizes[2], 1024, 2, self.dtype, bt, False, rm, bn, name="block3")(x, train)
        return x


class ResNetBoxClassifierFeatures(nn.Module):
    """block4 at stride 1 on ROI crops -> [N, h, w, 2048]; caller pools."""

    depth: int = 50
    dtype: Dtype = jnp.bfloat16
    bn_trainable: bool = False
    slim_stride_order: bool = False  # stride 1 -> only affects unit naming parity
    remat: bool = False
    bn: BNSpec = BNSpec()

    @nn.compact
    def __call__(self, x, train: bool = False):
        sizes = BLOCK_SIZES[self.depth]
        return ResNetStage(
            sizes[3], 2048, 1, self.dtype, self.bn_trainable,
            self.slim_stride_order, self.remat, self.bn, name="block4"
        )(x.astype(self.dtype), train)


class ResNetClassifier(nn.Module):
    """Full classification network (the slim-train path that produces
    ImageNet init checkpoints — SURVEY.md §3.8 slim scripts). Trains with
    live BN like slim classification (bn_trainable default True); the
    moving stats it learns are what the detector's frozen BN consumes at
    warm start."""

    depth: int = 50
    num_classes: int = 1000
    bn_trainable: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        bt = self.bn_trainable
        x = ResNetProposalFeatures(
            self.depth, self.dtype, bn_trainable=bt, name="body"
        )(x, train)
        x = ResNetStage(
            BLOCK_SIZES[self.depth][3], 2048, 2, self.dtype, bt, name="block4"
        )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="logits")(
            x.astype(jnp.float32)
        )


# Canonical per-channel means the reference subtracts in preprocess
# (R, G, B order, 0-255 scale).
RGB_MEANS = (123.68, 116.779, 103.939)


def preprocess_images(images: jnp.ndarray) -> jnp.ndarray:
    """Subtract the ImageNet channel means (reference FasterRCNN resnet
    preprocess). Input [..., H, W, 3] in 0-255 RGB float."""
    return images - jnp.asarray(RGB_MEANS, dtype=images.dtype)
