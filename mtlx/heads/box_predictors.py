"""Box predictor heads (reference core/box_predictor.py, SURVEY.md §3.1).

Three head families as Flax modules:
  * RPNHead / ConvolutionalBoxPredictor — conv heads over feature maps
    (RPN first stage; SSD per-layer heads)
  * MaskRCNNBoxPredictor — FC class + per-class box-refinement heads on
    pooled ROI features (Faster R-CNN second stage)
  * RfcnBoxPredictor — position-sensitive score maps (R-FCN second stage)

All heads compute in the module dtype (bfloat16 by default) and emit
float32 logits, so the softmax/losses run in fp32.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class RPNHead(nn.Module):
    """kxk conv trunk + 1x1 objectness/box heads over the stride-16 map
    (k = first_stage_box_predictor_kernel_size, reference default 3;
    kernel_init from first_stage_box_predictor_conv_hyperparams, None =
    flax default).

    Returns ([B, H*W*A, 2] objectness logits, [B, H*W*A, 4] box encodings)
    with the anchor index fastest — matching the GridAnchorGenerator layout.
    """

    num_anchors_per_location: int
    depth: int = 512
    kernel_size: int = 3
    kernel_init: Any = None
    # first_stage_atrous_rate (reference faster_rcnn.proto field 7):
    # dilation of the kxk RPN trunk conv
    atrous_rate: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features):
        b = features.shape[0]
        a = self.num_anchors_per_location
        k = self.kernel_size
        init_kw = {} if self.kernel_init is None else {"kernel_init": self.kernel_init}
        x = nn.relu(
            nn.Conv(self.depth, (k, k), padding="SAME", dtype=self.dtype,
                    kernel_dilation=(self.atrous_rate, self.atrous_rate),
                    name="conv", **init_kw)(features.astype(self.dtype))
        )
        obj = nn.Conv(2 * a, (1, 1), dtype=self.dtype, name="objectness", **init_kw)(x)
        box = nn.Conv(4 * a, (1, 1), dtype=self.dtype, name="box_encodings",
                      **init_kw)(x)
        return (
            obj.astype(jnp.float32).reshape(b, -1, 2),
            box.astype(jnp.float32).reshape(b, -1, 4),
        )


class ConvolutionalBoxPredictor(nn.Module):
    """SSD-style conv head for one feature map: class + box 3x3 convs.

    Returns ([B, H*W*A, num_classes + 1], [B, H*W*A, box_code_size]).
    """

    num_classes: int  # WITHOUT background; +1 column added here
    num_anchors_per_location: int
    box_code_size: int = 4
    kernel_size: int = 3
    # intermediate-conv depth config (reference box_predictor.proto:
    # depth = max(min(features_depth, max_depth), min_depth); that many
    # 1x1 ReLU convs applied num_layers_before_predictor times when > 0)
    min_depth: int = 0
    max_depth: int = 0
    num_layers_before_predictor: int = 0
    use_dropout: bool = False
    dropout_keep_prob: float = 0.8
    apply_sigmoid_to_scores: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features, deterministic: bool = True):
        b = features.shape[0]
        a = self.num_anchors_per_location
        k = self.kernel_size
        x = features.astype(self.dtype)
        depth = max(min(features.shape[-1], self.max_depth), self.min_depth)
        if depth > 0 and self.num_layers_before_predictor > 0:
            for i in range(self.num_layers_before_predictor):
                x = nn.relu(
                    nn.Conv(depth, (1, 1), dtype=self.dtype,
                            name=f"conv_{i}_1x1_{depth}")(x)
                )
        cls_in = x
        if self.use_dropout:
            cls_in = nn.Dropout(1.0 - self.dropout_keep_prob, deterministic=deterministic)(cls_in)
        cls = nn.Conv(
            a * (self.num_classes + 1), (k, k), padding="SAME", dtype=self.dtype,
            name="class_predictor",
        )(cls_in)
        box = nn.Conv(
            a * self.box_code_size, (k, k), padding="SAME", dtype=self.dtype,
            name="box_encoder",
        )(x)
        cls = cls.astype(jnp.float32).reshape(b, -1, self.num_classes + 1)
        if self.apply_sigmoid_to_scores:
            cls = jax.nn.sigmoid(cls)
        return (cls, box.astype(jnp.float32).reshape(b, -1, self.box_code_size))


class MaskRCNNBoxPredictor(nn.Module):
    """FC heads on pooled ROI features.

    Input [N, D] pooled features. Returns
    ([N, num_classes + 1] class logits,
     [N, num_classes (or 1), 4] per-class box refinements).
    """

    num_classes: int
    fc_features: int = 0  # 0 = predict straight from pooled features
    use_dropout: bool = False
    dropout_keep_prob: float = 0.5
    share_box_across_classes: bool = False
    kernel_init: Any = None  # fc_hyperparams initializer; None = flax default
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled, deterministic: bool = True):
        init_kw = {} if self.kernel_init is None else {"kernel_init": self.kernel_init}
        x = pooled.astype(self.dtype)
        if self.fc_features > 0:
            x = nn.relu(nn.Dense(self.fc_features, dtype=self.dtype, name="fc1",
                                 **init_kw)(x))
            x = nn.relu(nn.Dense(self.fc_features, dtype=self.dtype, name="fc2",
                                 **init_kw)(x))
        if self.use_dropout:
            x = nn.Dropout(1.0 - self.dropout_keep_prob, deterministic=deterministic)(x)
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="class_logits",
                       **init_kw)(x)
        num_box = 1 if self.share_box_across_classes else self.num_classes
        box = nn.Dense(num_box * 4, dtype=self.dtype, name="box_refinement",
                       **init_kw)(x)
        return (
            cls.astype(jnp.float32),
            box.astype(jnp.float32).reshape(*pooled.shape[:-1], num_box, 4),
        )


class MaskHead(nn.Module):
    """Instance-mask branch on the (unpooled) ROI feature map (the
    reference MaskRCNNBoxPredictor's predict_instance_masks option):
    2x transpose-conv upsample + per-class 1x1 logits.

    [N, h, w, C] -> [N, 2h, 2w, num_classes] mask logits.
    """

    num_classes: int
    conv_depth: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, roi_features):
        x = roi_features.astype(self.dtype)
        x = nn.relu(
            nn.Conv(self.conv_depth, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(x)
        )
        x = nn.relu(
            nn.ConvTranspose(self.conv_depth, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="upsample")(x)
        )
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="logits")(x)
        return logits.astype(jnp.float32)


class RfcnBoxPredictor(nn.Module):
    """Position-sensitive score/box maps for R-FCN (reference
    RfcnBoxPredictor + utils/ops.position_sensitive_crop_regions).

    __call__ takes the stride-16 feature map and per-image proposal boxes
    (canvas-normalized) and returns class logits / box refinements per box.
    """

    num_classes: int
    num_spatial_bins: Tuple[int, int] = (3, 3)
    depth: int = 1024
    crop_size: Tuple[int, int] = (12, 12)  # divisible by bins
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features, proposal_boxes):
        from mtlx.ops import roi as roi_ops

        bins = self.num_spatial_bins[0] * self.num_spatial_bins[1]
        x = nn.relu(
            nn.Conv(self.depth, (1, 1), dtype=self.dtype, name="reduce")(
                features.astype(self.dtype)
            )
        )
        cls_maps = nn.Conv(
            bins * (self.num_classes + 1), (1, 1), dtype=self.dtype, name="class_maps"
        )(x).astype(jnp.float32)
        box_maps = nn.Conv(
            bins * self.num_classes * 4, (1, 1), dtype=self.dtype, name="box_maps"
        )(x).astype(jnp.float32)

        def per_image(cmap, bmap, boxes):
            cls = roi_ops.position_sensitive_crop_regions(
                cmap, boxes, self.crop_size, self.num_spatial_bins, global_pool=True
            )
            box = roi_ops.position_sensitive_crop_regions(
                bmap, boxes, self.crop_size, self.num_spatial_bins, global_pool=True
            )
            return cls, box.reshape(boxes.shape[0], self.num_classes, 4)

        return jax.vmap(per_image)(cls_maps, box_maps, proposal_boxes)
