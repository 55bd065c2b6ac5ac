"""Faster R-CNN meta-architecture — TPU-native two-stage detector.

Capability match for the reference's
`meta_architectures/faster_rcnn_meta_arch.py` (SURVEY.md §3.3, §4.2) plus
the MTL-SSL auxiliary heads [F], redesigned for XLA:

  * the whole predict/loss path is ONE jitted program: static shapes,
    padded proposal sets with validity masks, `vmap` over the batch
  * training-time proposal sampling and RPN minibatch sampling are pure
    functions of explicit PRNG keys
  * anchors are trace-time constants (computed from the static canvas)
  * bfloat16 backbone compute, fp32 losses

Coordinate convention: absolute pixels on the fixed padded canvas
everywhere inside predict/loss; `postprocess` re-expresses detections
normalized to each image's true (pre-padding) extent, matching the
reference's output contract.

DetectionModel API parity (reference core/model.py): `preprocess`,
`predict`, `loss`, `postprocess`, `provide_groundtruth` (groundtruth is
passed explicitly as a `GroundTruth` pytree — no object state in a
functional framework), `restore_map` (see mtlx/train/checkpoints.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from jax import Array

from mtlx.anchors.grid import GridAnchorGenerator
from mtlx.assign import samplers, target_assigner
from mtlx.backbones import resnet
from mtlx.coders import box_coders
from mtlx.geometry import box_ops
from mtlx.heads import aux_heads, box_predictors
from mtlx.labels import recycle
from mtlx.losses import losses as loss_lib
from mtlx.ops import nms as nms_lib
from mtlx.ops import roi as roi_lib


# --------------------------------------------------------------------------
# Config
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MTLConfig:
    """MTL-SSL auxiliary task switches + loss weights (SURVEY.md §3.11)."""

    multiobject: bool = False
    closeness: bool = False
    foreground: bool = False
    multiobject_weight: float = 1.0
    closeness_weight: float = 1.0
    foreground_weight: float = 1.0
    window_enlarge_factor: float = 2.0
    closeness_sigma: float = 0.5
    # stochastic multi-object windows (proto MTL.window_sampling):
    # per-axis scale ~ U[1, factor] + center jitter keeping the GT box
    # covered; False = deterministic enlarged GT box (the default)
    window_sampling: bool = False
    refine: bool = False  # paper's feature-refinement path

    @property
    def any(self) -> bool:
        return self.multiobject or self.closeness or self.foreground


@dataclasses.dataclass(frozen=True)
class FasterRCNNConfig:
    num_classes: int = 20
    canvas_size: Tuple[int, int] = (1024, 1024)  # static padded canvas
    backbone: str = "resnet50"  # resnet50 | resnet101 | resnet152
    feature_stride: int = 16
    # first stage (RPN)
    anchor_scales: Tuple[float, ...] = (0.25, 0.5, 1.0, 2.0)
    anchor_aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_base_size: Tuple[float, float] = (256.0, 256.0)
    rpn_depth: int = 512
    first_stage_nms_score_threshold: float = 0.0
    first_stage_nms_iou_threshold: float = 0.7
    first_stage_pre_nms_top_k: int = 6000
    first_stage_max_proposals: int = 300
    first_stage_minibatch_size: int = 256
    first_stage_positive_balance_fraction: float = 0.5
    first_stage_localization_loss_weight: float = 2.0
    first_stage_objectness_loss_weight: float = 1.0
    # ROI pooling
    initial_crop_size: int = 14
    maxpool_kernel_size: int = 2
    maxpool_stride: int = 2
    # second stage
    second_stage_batch_size: int = 64
    second_stage_balance_fraction: float = 0.25
    second_stage_nms_score_threshold: float = 0.0
    second_stage_nms_iou_threshold: float = 0.6
    second_stage_max_detections_per_class: int = 100
    second_stage_max_total_detections: int = 300
    second_stage_localization_loss_weight: float = 2.0
    second_stage_classification_loss_weight: float = 1.0
    second_stage_dropout: bool = False
    second_stage_dropout_keep_prob: float = 1.0
    # second_stage_post_processing.score_converter (reference
    # post_processing_builder): softmax | sigmoid | identity
    score_converter: str = "softmax"
    predict_instance_masks: bool = False  # MaskRCNN optional mask branch
    mask_prediction_conv_depth: int = 256
    second_stage_mask_prediction_loss_weight: float = 1.0
    # first_stage_box_predictor_kernel_size + conv_hyperparams initializer
    # (reference faster_rcnn.proto fields 8/9); None initializer = flax
    # default (lecun_normal)
    rpn_kernel_size: int = 3
    rpn_conv_initializer: Any = None
    # first_stage_atrous_rate: dilation of the RPN trunk conv
    rpn_atrous_rate: int = 1
    second_stage_fc_initializer: Any = None
    # optional second-stage hard example mining (reference
    # faster_rcnn.hard_example_miner); None = balanced sampling only
    hard_example_miner: Any = None  # loss_lib.HardExampleMinerConfig
    # rematerialize backbone bottlenecks in the backward pass. MEASURED
    # NEGATIVE for throughput at the 1024^2 operating point (TPU v5e,
    # 2026-08-16: 67.7 -> 64.8 img/s at batch 16; XLA cost analysis bytes
    # did not drop, flops +24% — the saved activations were not the HBM
    # traffic the roofline suggested). Kept as an option because it buys
    # activation memory for larger canvases/batches; numerically identical.
    backbone_remat: bool = False
    # exact space-to-depth stem conv (resnet backbones; see
    # backbones/resnet.py SpaceToDepthConv1) — checkpoint-compatible
    conv0_space_to_depth: bool = False
    # misc
    batch_norm_trainable: bool = False  # feature_extractor.batch_norm_trainable
    # feature_extractor.batch_norm overrides (resnet.BNSpec: momentum/
    # decay, epsilon, center, scale); None = the extractor arg_scope
    # defaults (resnet_arg_scope: 0.997 / 1e-5 / center / scale)
    batch_norm_params: Any = None
    # feature_extractor.slim_stride_order: stride stages at the LAST unit
    # (slim resnet_v1 convention) for parity with converted TF checkpoints
    slim_stride_order: bool = False
    number_of_stages: int = 2  # 1 = RPN-only (reference number_of_stages)
    max_gt_boxes: int = 100
    dtype: Any = jnp.bfloat16
    mtl: MTLConfig = dataclasses.field(default_factory=MTLConfig)

    @property
    def resnet_depth(self) -> int:
        return {
            "resnet10": 10,  # wiring-validation size (see resnet.BLOCK_SIZES)
            "resnet50": 50,
            "resnet101": 101,
            "resnet152": 152,
        }.get(self.backbone, 50)

    @property
    def feature_map_shape(self) -> Tuple[int, int]:
        h, w = self.canvas_size
        s = self.feature_stride
        return (-(-h // s), -(-w // s))


class GroundTruth(dict):
    """Pytree of padded groundtruth:
    boxes [B, G, 4] (absolute canvas px), classes [B, G] int32 0-based,
    mask [B, G] bool, optional weights [B, G]."""


# --------------------------------------------------------------------------
# Learnable modules
# --------------------------------------------------------------------------


class FasterRCNNModules(nn.Module):
    """All parameters of the detector, one Flax module with named methods."""

    cfg: FasterRCNNConfig

    def setup(self):
        c = self.cfg
        if c.backbone == "inception_resnet_v2":
            from mtlx.backbones import inception_resnet_v2 as irv2

            bnp = (
                dict(bn_momentum=c.batch_norm_params[0],
                     bn_epsilon=c.batch_norm_params[1],
                     bn_center=c.batch_norm_params[2],
                     bn_scale=c.batch_norm_params[3])
                if c.batch_norm_params is not None else {}
            )
            self.proposal_features = irv2.InceptionResnetV2ProposalFeatures(
                bn_trainable=c.batch_norm_trainable,
                dtype=c.dtype, name="backbone", **bnp
            )
            self.classifier_features = irv2.InceptionResnetV2BoxClassifierFeatures(
                bn_trainable=c.batch_norm_trainable,
                dtype=c.dtype, name="classifier_backbone", **bnp
            )
            self._setup_heads()
            return
        if c.backbone == "inception_v2":
            from mtlx.backbones import inception_v2 as iv2

            # feature_extractor.batch_norm sub-knobs (defaults = slim
            # inception arg_scope: decay 0.9997, epsilon 1e-3) +
            # batch_norm_trainable, mirroring the resnet path below
            bnp = (
                dict(bn_momentum=c.batch_norm_params[0],
                     bn_epsilon=c.batch_norm_params[1],
                     bn_center=c.batch_norm_params[2],
                     bn_scale=c.batch_norm_params[3])
                if c.batch_norm_params is not None else {}
            )
            self.proposal_features = iv2.InceptionV2ProposalFeatures(
                bn_trainable=c.batch_norm_trainable,
                dtype=c.dtype, name="backbone", **bnp
            )
            self.classifier_features = iv2.InceptionV2BoxClassifierFeatures(
                bn_trainable=c.batch_norm_trainable,
                dtype=c.dtype, name="classifier_backbone", **bnp
            )
            self._setup_heads()
            return
        depth = c.resnet_depth
        bn = (
            resnet.BNSpec(*c.batch_norm_params)
            if c.batch_norm_params is not None else resnet.BNSpec()
        )
        self.proposal_features = resnet.ResNetProposalFeatures(
            depth=depth, dtype=c.dtype, bn_trainable=c.batch_norm_trainable,
            slim_stride_order=c.slim_stride_order, remat=c.backbone_remat,
            conv0_space_to_depth=c.conv0_space_to_depth, bn=bn,
            name="backbone",
        )
        self.classifier_features = resnet.ResNetBoxClassifierFeatures(
            depth=depth, dtype=c.dtype, bn_trainable=c.batch_norm_trainable,
            slim_stride_order=c.slim_stride_order, remat=c.backbone_remat,
            bn=bn,
            name="classifier_backbone",
        )
        self._setup_heads()

    def _setup_heads(self):
        c = self.cfg
        num_anchors = len(c.anchor_scales) * len(c.anchor_aspect_ratios)
        self.rpn = box_predictors.RPNHead(
            num_anchors_per_location=num_anchors, depth=c.rpn_depth,
            kernel_size=c.rpn_kernel_size, kernel_init=c.rpn_conv_initializer,
            atrous_rate=c.rpn_atrous_rate,
            dtype=c.dtype, name="rpn",
        )
        self.box_predictor = box_predictors.MaskRCNNBoxPredictor(
            num_classes=c.num_classes,
            use_dropout=c.second_stage_dropout,
            dropout_keep_prob=c.second_stage_dropout_keep_prob,
            kernel_init=c.second_stage_fc_initializer,
            dtype=c.dtype,
            name="box_predictor",
        )
        if c.predict_instance_masks:
            self.mask_head = box_predictors.MaskHead(
                num_classes=c.num_classes,
                conv_depth=c.mask_prediction_conv_depth,
                dtype=c.dtype,
                name="mask_head",
            )
        if c.mtl.foreground:
            self.foreground_head = aux_heads.ForegroundHead(dtype=c.dtype, name="fg_head")
        if c.mtl.multiobject:
            self.multiobject_head = aux_heads.MultiObjectHead(
                num_classes=c.num_classes, dtype=c.dtype, name="mo_head"
            )
        if c.mtl.closeness:
            self.closeness_head = aux_heads.ClosenessHead(
                num_classes=c.num_classes, dtype=c.dtype, name="cl_head"
            )

    def __call__(self, images):
        # init-only path: touch every submodule once so `init` creates all
        # params (never used in the hot path)
        feats = self.proposal_features(images)
        obj, enc = self.rpn(feats)
        b = images.shape[0]
        cs = self.cfg.initial_crop_size
        pooled_sz = cs // self.cfg.maxpool_stride
        dummy_roi = jnp.zeros(
            (1, pooled_sz, pooled_sz, feats.shape[-1]), feats.dtype
        )
        roi_out = self.classifier_features(dummy_roi)
        if self.cfg.predict_instance_masks:
            _ = self.mask_head(roi_out)
        pooled = jnp.mean(roi_out, axis=(1, 2)).astype(jnp.float32)
        if self.cfg.mtl.refine and (self.cfg.mtl.multiobject or self.cfg.mtl.closeness):
            rpn_pooled = jnp.mean(feats, axis=(1, 2)).astype(jnp.float32)[:1]
            pooled = jnp.concatenate(
                [pooled, self.aux_hidden_for_rois(rpn_pooled)], axis=-1
            )
        cls, box = self.box_predictor(pooled)
        # aux heads consume 7x7-avg-pooled RPN features (C channels, not
        # the 2048-dim classifier pool) — init must match the real path
        aux_pooled = jnp.mean(feats, axis=(1, 2)).astype(jnp.float32)
        extras = []
        if self.cfg.mtl.foreground:
            extras.append(jnp.sum(self.foreground_head(feats)))
        if self.cfg.mtl.multiobject:
            extras.append(jnp.sum(self.multiobject_head(aux_pooled)[0]))
        if self.cfg.mtl.closeness:
            extras.append(jnp.sum(self.closeness_head(aux_pooled)[0]))
        return obj, enc, cls, box

    # --- named-method entry points (model.apply(..., method=...)) ---

    def features(self, images, train: bool = False):
        return self.proposal_features(images, train)

    def rpn_predictions(self, feats):
        return self.rpn(feats)

    def classify_rois(self, roi_crops, deterministic: bool = True,
                      aux_hidden=None, train: bool = False):
        """[N, h, w, C] ROI crops -> (pooled [N, 2048], cls, box_refine).

        aux_hidden: optional [N, D] auxiliary-task hidden features fused in
        before the box predictor (the MTL-SSL refine path, SURVEY.md §3.11
        'Feature refinement')."""
        x = self.classifier_features(roi_crops, train)
        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        features = (
            jnp.concatenate([pooled, aux_hidden], axis=-1)
            if aux_hidden is not None
            else pooled
        )
        cls, box = self.box_predictor(features, deterministic=deterministic)
        masks = self.mask_head(x) if self.cfg.predict_instance_masks else None
        return pooled, cls, box, masks

    def aux_hidden_for_rois(self, pooled_rpn):
        """Aux heads' hidden activations on per-ROI pooled RPN features;
        concatenated refine vector [N, D]."""
        hiddens = []
        if self.cfg.mtl.multiobject:
            hiddens.append(self.multiobject_head(pooled_rpn)[1].astype(jnp.float32))
        if self.cfg.mtl.closeness:
            hiddens.append(self.closeness_head(pooled_rpn)[1].astype(jnp.float32))
        return jnp.concatenate(hiddens, axis=-1)

    def foreground(self, feats):
        return self.foreground_head(feats)

    def multiobject(self, pooled):
        return self.multiobject_head(pooled)

    def closeness(self, pooled):
        return self.closeness_head(pooled)


# --------------------------------------------------------------------------
# The detector
# --------------------------------------------------------------------------


class FasterRCNN:
    """Functional two-stage detector around FasterRCNNModules."""

    # predict/loss handle any 2*stride-multiple compute canvas up to
    # cfg.canvas_size (bucketed compute — see train_step.pad_batch_to_bucket)
    supports_bucketed_compute = True

    def __init__(self, cfg: FasterRCNNConfig):
        self.cfg = cfg
        self.modules = FasterRCNNModules(cfg)
        self._anchor_gen = GridAnchorGenerator(
            scales=cfg.anchor_scales,
            aspect_ratios=cfg.anchor_aspect_ratios,
            base_anchor_size=cfg.anchor_base_size,
            anchor_stride=(float(cfg.feature_stride),) * 2,
        )
        self._anchor_cache: Dict[Tuple[int, int], Array] = {}
        # default full-canvas anchors (back-compat; predict derives the
        # set from the actual input shape — see anchors_for)
        self.anchors = self.anchors_for(cfg.canvas_size)
        self.box_coder = box_coders.make_faster_rcnn_coder()
        self._proposal_assigner = target_assigner.create_target_assigner(
            "FasterRCNN", "proposal"
        )
        self._detection_assigner = target_assigner.create_target_assigner(
            "FasterRCNN", "detection"
        )

    def anchors_for(self, canvas_hw: Tuple[int, int]) -> Array:
        """Anchor grid for a compute canvas of (h, w) pixels, clipped to
        it. The canvas may be any 2*stride multiple up to
        cfg.canvas_size: the train/eval steps run on the 128-bucketed
        true-image region (`pack_batch_images`) instead of the padded
        max canvas, so each bucket shape gets its own anchor constant
        (and jit specialization). Static per trace; cached."""
        key = (int(canvas_hw[0]), int(canvas_hw[1]))
        hit = self._anchor_cache.get(key)
        if hit is None:
            # compile-time eval: anchors_for is called during jit tracing
            # (predict derives the grid from the input shape) and the
            # cached constant must NOT be a tracer of that trace
            with jax.ensure_compile_time_eval():
                s = self.cfg.feature_stride
                raw = self._anchor_gen.generate(
                    (-(-key[0] // s), -(-key[1] // s))
                )
                # clip anchors to the canvas: static-shape stand-in for the
                # reference's prune-outside-window (see module docstring)
                window = jnp.asarray([0.0, 0.0, float(key[0]), float(key[1])])
                hit = box_ops.clip_to_window(raw, window)
            self._anchor_cache[key] = hit
        return hit

    # ---- parameter init ----

    def init_variables(self, rng, batch_size: int = 1):
        """Initialize parameters ON HOST CPU, then transfer.

        The init program is hundreds of tiny RNG ops — a terrible TPU
        program (80s+ via remote compile vs ~2s on host). Init on the CPU
        backend and let the first jitted step transfer the (uncommitted)
        arrays to the accelerator. Parameter shapes are independent of the
        image spatial dims, so a tiny 64x64 dummy keeps the init graph
        (which traces a full forward) cheap to compile.
        """
        del batch_size  # param shapes are batch-independent too
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            variables = jax.jit(self.modules.init)(rng, dummy)
        # uncommitted host arrays: jit on the accelerator picks them up
        return jax.tree_util.tree_map(np.asarray, variables)

    # ---- DetectionModel API ----

    @staticmethod
    def preprocess(images: Array) -> Array:
        """Channel-mean subtraction; resize/pad happens in the data layer."""
        return resnet.preprocess_images(images)

    def predict(
        self,
        variables,
        images: Array,
        true_shapes: Array,
        training: bool = False,
        rng: Optional[Array] = None,
        groundtruth: Optional[GroundTruth] = None,
    ) -> Dict[str, Array]:
        """Run both stages. images: [B, H, W, 3] preprocessed on the static
        canvas; true_shapes: [B, 2] (true h, w) of each image pre-padding.

        In training mode proposals are sampled against groundtruth
        (second_stage_batch_size of them) exactly as the reference does
        inside predict; at eval all max_proposals go forward.
        """
        c = self.cfg
        b = images.shape[0]
        # the compute canvas is the actual input extent — the bucketed
        # true-image region in production (pack_batch_images), the full
        # cfg.canvas_size otherwise; every in-graph normalization and the
        # anchor grid derive from it
        canvas_hw = (int(images.shape[1]), int(images.shape[2]))
        anchors = self.anchors_for(canvas_hw)
        apply = self.modules.apply

        update_bn = training and c.batch_norm_trainable
        if update_bn:
            feats, mutated = apply(
                variables, images, True, method=FasterRCNNModules.features,
                mutable=["batch_stats"],
            )
            variables = dict(variables, batch_stats=mutated["batch_stats"])
        else:
            feats = apply(variables, images, method=FasterRCNNModules.features)
        obj_logits, box_enc = apply(
            variables, feats, method=FasterRCNNModules.rpn_predictions
        )

        # Proposal selection is a training-time constant for stage 2
        # (reference applies stop_gradient to RPN proposals): gradients
        # reach the RPN heads only through the stage-1 losses, never
        # through NMS/decode — which also keeps the backward graph free of
        # the sequential NMS loop (and the Pallas kernel un-differentiated).
        proposals, proposal_scores, proposal_mask = self._postprocess_rpn(
            jax.lax.stop_gradient(obj_logits),
            jax.lax.stop_gradient(box_enc),
            true_shapes,
            anchors,
        )

        pred: Dict[str, Any] = {
            "rpn_features": feats,
            "rpn_objectness_logits": obj_logits,
            "rpn_box_encodings": box_enc,
            "anchors": anchors,
        }

        if training:
            if rng is None or groundtruth is None:
                raise ValueError("training predict needs rng and groundtruth")
            proposals, proposal_mask = self._sample_proposals(
                rng, proposals, proposal_mask, groundtruth
            )

        pred["proposal_boxes"] = proposals  # [B, P, 4] canvas px
        pred["proposal_mask"] = proposal_mask
        if not training:
            pred["proposal_scores"] = proposal_scores

        if c.number_of_stages == 1:
            # RPN-only mode (reference number_of_stages=1): proposals ARE
            # the detections; no second stage, no aux heads. Trainable-BN
            # stats from the backbone must still flow out, or the moving
            # averages stay at init for the whole run
            if update_bn:
                pred["updated_batch_stats"] = variables["batch_stats"]
            return pred

        cls_logits, box_refine, masks, variables = self._predict_second_stage(
            variables, feats, proposals, training, rng, canvas_hw
        )
        pred["class_predictions"] = cls_logits
        pred["refined_box_encodings"] = box_refine
        if masks is not None:
            pred["mask_predictions"] = masks  # [B, P, mh, mw, K]
        if update_bn:
            pred["updated_batch_stats"] = variables["batch_stats"]

        # ---- MTL aux predictions (training only; zero inference cost) ----
        if training and c.mtl.any:
            self._predict_aux(
                variables, pred, feats, groundtruth, canvas_hw, rng=rng
            )
        return pred

    def _predict_second_stage(self, variables, feats, proposals, training,
                              rng, canvas_hw=None):
        """ROI crop -> maxpool -> block4 -> FC heads. Returns
        (class_predictions [B, P, K+1], refined_box_encodings
        [B, P, num_box, 4], mask_predictions-or-None [B, P, mh, mw, K],
        variables) — variables carries updated batch_stats when
        batch_norm_trainable. R-FCN overrides this with position-sensitive
        score maps (reference rfcn_meta_arch)."""
        c = self.cfg
        b, p = proposals.shape[:2]
        ch, cw = canvas_hw if canvas_hw is not None else c.canvas_size
        canvas = jnp.asarray([ch, cw, ch, cw], jnp.float32)
        norm_proposals = proposals / canvas
        crops = roi_lib.batch_crop_and_resize(
            feats, norm_proposals, (c.initial_crop_size, c.initial_crop_size)
        )  # [B, P, cs, cs, C]
        crops = crops.reshape((b * p,) + crops.shape[2:])
        crops = nn.max_pool(
            crops,
            (c.maxpool_kernel_size,) * 2,
            strides=(c.maxpool_stride,) * 2,
        )
        aux_hidden = None
        if c.mtl.refine and (c.mtl.multiobject or c.mtl.closeness):
            # refine path: aux heads run on per-ROI pooled RPN features and
            # their hidden activations augment the detection features
            pooled_rpn = jax.vmap(
                lambda f, bx: roi_lib.mean_pooled_crop(f, bx, (7, 7))
            )(feats, norm_proposals).astype(jnp.float32)
            aux_hidden = self.modules.apply(
                variables,
                pooled_rpn.reshape(b * p, -1),
                method=FasterRCNNModules.aux_hidden_for_rois,
            )
        rngs = {"dropout": rng} if (training and c.second_stage_dropout) else None
        if training and c.batch_norm_trainable:
            (pooled, cls_logits, box_refine, masks), mutated = self.modules.apply(
                variables, crops, not training, aux_hidden, True,
                method=FasterRCNNModules.classify_rois,
                rngs=rngs, mutable=["batch_stats"],
            )
            variables = dict(variables, batch_stats=mutated["batch_stats"])
        else:
            pooled, cls_logits, box_refine, masks = self.modules.apply(
                variables, crops, not training, aux_hidden,
                method=FasterRCNNModules.classify_rois, rngs=rngs,
            )
        return (
            cls_logits.reshape(b, p, -1),
            box_refine.reshape(b, p, -1, 4),
            masks.reshape((b, p) + masks.shape[1:]) if masks is not None else None,
            variables,
        )

    def _predict_aux(self, variables, pred, feats, gt: GroundTruth,
                     canvas_hw=None, rng=None):
        """Aux heads on groundtruth-derived windows (annotation recycling)."""
        c = self.cfg
        apply = self.modules.apply
        ch, cw = canvas_hw if canvas_hw is not None else c.canvas_size
        canvas = jnp.asarray([ch, cw, ch, cw], jnp.float32)
        if c.mtl.foreground:
            pred["foreground_logits"] = apply(
                variables, feats, method=FasterRCNNModules.foreground
            )
        # MXU contraction in model dtype: the gather-based crop in fp32
        # costed ~90ms/step here (HBM-bound row gathers + scatter-add
        # backward); mean_pooled_crop further removes the crop intermediate
        pool_roi = lambda boxes_norm: jax.vmap(
            lambda f, bx: roi_lib.mean_pooled_crop(f, bx, (7, 7))
        )(feats, boxes_norm).astype(jnp.float32)
        if c.mtl.multiobject:
            if c.mtl.window_sampling and rng is not None:
                # per-image keys, decorrelated from the proposal-sampler /
                # dropout uses of the same step rng
                keys = jax.random.split(
                    jax.random.fold_in(rng, 0x517D), gt["boxes"].shape[0]
                )
                windows = jax.vmap(
                    lambda k, bx: recycle.sampled_windows(
                        k, bx, c.mtl.window_enlarge_factor
                    )
                )(keys, gt["boxes"])
            else:
                windows = recycle.enlarged_windows(
                    gt["boxes"], c.mtl.window_enlarge_factor
                )
            pred["multiobject_windows"] = windows
            pooled = pool_roi(windows / canvas)  # [B, G, C]
            logits, _ = apply(
                variables, pooled, method=FasterRCNNModules.multiobject
            )
            pred["multiobject_logits"] = logits
        if c.mtl.closeness:
            pooled = pool_roi(gt["boxes"] / canvas)
            logits, _ = apply(variables, pooled, method=FasterRCNNModules.closeness)
            pred["closeness_logits"] = logits

    def _postprocess_rpn(self, obj_logits, box_enc, true_shapes,
                         anchors=None):
        """Decode anchors -> clip to true image -> top-K -> NMS."""
        c = self.cfg
        if anchors is None:
            anchors = self.anchors

        def per_image(obj, enc, true_hw):
            scores = jax.nn.softmax(obj, axis=-1)[:, 1]
            boxes = self.box_coder.decode(enc, anchors)
            window = jnp.concatenate([jnp.zeros(2), true_hw.astype(jnp.float32)])
            boxes = box_ops.clip_to_window(boxes, window)
            # zero-area boxes (anchors entirely outside the true image —
            # canvas/bucket padding) must not compete for pre-NMS top-k
            # slots: the reference prunes empty boxes at clip time, before
            # any selection. With an undertrained RPN the padding region
            # can otherwise fill most of the top-k and starve real
            # proposals.
            scores = jnp.where(box_ops.area(boxes) > 0, scores, -jnp.inf)
            k = min(c.first_stage_pre_nms_top_k, boxes.shape[0])
            top_scores, top_idx = jax.lax.top_k(scores, k)
            top_boxes = jnp.take(boxes, top_idx, axis=0)
            area_ok = box_ops.area(top_boxes) > 0
            top_scores = jnp.where(area_ok, top_scores, 0.0)
            idx, keep = nms_lib.non_max_suppression_padded(
                top_boxes,
                top_scores,
                max_output_size=c.first_stage_max_proposals,
                iou_threshold=c.first_stage_nms_iou_threshold,
                score_threshold=c.first_stage_nms_score_threshold,
                valid_mask=area_ok,
                # batch-aware dispatch: vmap hides the batch below, and
                # the chunked-vs-Pallas crossover flips at batch 1
                batched=obj_logits.shape[0] > 1,
            )
            return (
                jnp.take(top_boxes, idx, axis=0),
                jnp.where(keep, jnp.take(top_scores, idx), 0.0),
                keep,
            )

        return jax.vmap(per_image)(obj_logits, box_enc, true_shapes)

    def _sample_proposals(self, rng, proposals, proposal_mask, gt: GroundTruth):
        """Balanced-sample second_stage_batch_size proposals per image."""
        c = self.cfg

        def per_image(rng, props, mask, gt_boxes, gt_classes, gt_mask):
            res = self._detection_assigner.assign(
                props, gt_boxes, gt_mask=gt_mask
            )
            positive = (res.match >= 0) & mask
            indicator = mask & (res.match != -2)
            sampled = samplers.balanced_subsample(
                rng, indicator, positive,
                c.second_stage_batch_size, c.second_stage_balance_fraction,
            )
            # compact the <=batch_size sampled rows to the front (static)
            order = jnp.argsort(~sampled)  # True first, stable
            idx = order[: c.second_stage_batch_size]
            return jnp.take(props, idx, axis=0), jnp.take(sampled, idx)

        rngs = jax.random.split(rng, proposals.shape[0])
        return jax.vmap(per_image)(
            rngs, proposals, proposal_mask, gt["boxes"], gt["classes"], gt["mask"]
        )

    # ---- losses ----

    def loss(
        self, pred: Dict[str, Array], groundtruth: GroundTruth, rng: Array
    ) -> Dict[str, Array]:
        c = self.cfg
        out: Dict[str, Array] = {}
        out.update(self._first_stage_loss(pred, groundtruth, rng))
        if c.number_of_stages == 1:
            out["total_loss"] = sum(v for k, v in out.items() if k.startswith("Loss/"))
            return out
        out.update(self._second_stage_loss(pred, groundtruth))
        if (
            c.predict_instance_masks
            and "mask_predictions" in pred
            and "instance_masks" in groundtruth
        ):
            out.update(self._mask_loss(pred, groundtruth))
        if c.mtl.any:
            out.update(self._aux_loss(pred, groundtruth))
        out["total_loss"] = sum(
            v for k, v in out.items() if k.startswith("Loss/")
        )
        return out

    def _first_stage_loss(self, pred, gt: GroundTruth, rng):
        c = self.cfg
        # the anchor set predict actually used (canvas-bucket dependent)
        anchors = pred.get("anchors", self.anchors)

        def per_image(rng, obj, enc, gt_boxes, gt_mask):
            res = self._proposal_assigner.assign(
                anchors, gt_boxes, gt_mask=gt_mask
            )
            indicator = res.cls_weights > 0  # drops ignored anchors
            positive = res.match >= 0
            sampled = samplers.balanced_subsample(
                rng, indicator, positive,
                c.first_stage_minibatch_size,
                c.first_stage_positive_balance_fraction,
            )
            normalizer = jnp.maximum(jnp.sum(sampled.astype(jnp.float32)), 1.0)
            t = res.cls_targets[:, 0]
            onehot = jnp.stack([1.0 - t, t], axis=-1)
            obj_loss = loss_lib.weighted_softmax_classification_loss(
                obj, onehot, sampled.astype(jnp.float32)
            )
            loc_loss = loss_lib.weighted_smooth_l1_loss(
                enc, res.reg_targets, res.reg_weights * sampled
            )
            return jnp.sum(obj_loss) / normalizer, jnp.sum(loc_loss) / normalizer

        rngs = jax.random.split(rng, pred["rpn_objectness_logits"].shape[0])
        obj_l, loc_l = jax.vmap(per_image)(
            rngs,
            pred["rpn_objectness_logits"],
            pred["rpn_box_encodings"],
            gt["boxes"],
            gt["mask"],
        )
        return {
            "Loss/RPNLoss/objectness_loss": jnp.mean(obj_l)
            * c.first_stage_objectness_loss_weight,
            "Loss/RPNLoss/localization_loss": jnp.mean(loc_l)
            * c.first_stage_localization_loss_weight,
        }

    def _second_stage_loss(self, pred, gt: GroundTruth):
        c = self.cfg
        k = c.num_classes

        def per_image(props, mask, cls_logits, box_refine, gt_boxes, gt_classes, gt_mask):
            onehot = jax.nn.one_hot(gt_classes + 1, k + 1)  # col 0 = background
            res = self._detection_assigner.assign(
                props, gt_boxes, gt_labels=onehot, gt_mask=gt_mask,
                unmatched_cls_target=jax.nn.one_hot(0, k + 1),
            )
            w = mask.astype(jnp.float32)
            cls_loss = loss_lib.weighted_softmax_classification_loss(
                cls_logits, res.cls_targets, res.cls_weights * w
            )
            # per-class box refinement: pick the target class row
            target_class = jnp.argmax(res.cls_targets[:, 1:], axis=-1)
            num_box = box_refine.shape[1]
            row = jnp.where(num_box == 1, 0, jnp.clip(target_class, 0, num_box - 1))
            enc = jnp.take_along_axis(
                box_refine, row[:, None, None].repeat(4, axis=2), axis=1
            )[:, 0, :]
            loc_loss = loss_lib.weighted_smooth_l1_loss(
                enc, res.reg_targets, res.reg_weights * w
            )
            normalizer = jnp.maximum(jnp.sum(w), 1.0)
            if c.hard_example_miner is not None:
                # reference: per-ROI losses are normalized by the proposal
                # count FIRST, then the miner picks the hardest ROIs
                # (NMS-style de-dup + negatives cap) and SUMS over only
                # those (meta-arch _unpad_proposals_and_apply_hard_mining →
                # HardExampleMiner reduce_sum of the gathered, already-
                # normalized losses) — NOT a mean over the mined subset,
                # which would inflate the loss (mean of the hardest ≥ mean
                # of all).
                keep = loss_lib.hard_example_mining_mask(
                    cls_loss, loc_loss, props, res.match, c.hard_example_miner
                ).astype(jnp.float32)
                keep = keep * w
                return (
                    jnp.sum(cls_loss * keep) / normalizer,
                    jnp.sum(loc_loss * keep) / normalizer,
                )
            return jnp.sum(cls_loss) / normalizer, jnp.sum(loc_loss) / normalizer

        cls_l, loc_l = jax.vmap(per_image)(
            pred["proposal_boxes"],
            pred["proposal_mask"],
            pred["class_predictions"],
            pred["refined_box_encodings"],
            gt["boxes"],
            gt["classes"],
            gt["mask"],
        )
        return {
            "Loss/BoxClassifierLoss/classification_loss": jnp.mean(cls_l)
            * c.second_stage_classification_loss_weight,
            "Loss/BoxClassifierLoss/localization_loss": jnp.mean(loc_l)
            * c.second_stage_localization_loss_weight,
        }

    def _mask_loss(self, pred, gt: GroundTruth):
        """Per-proposal instance-mask loss (reference MaskRCNN predictor
        mask path, [U] core/box_predictor.py; SURVEY.md §3.1 box_predictor
        row). Groundtruth masks arrive at a reduced canvas resolution
        (data/loader.py mask_stride — a documented deviation from the
        reference's full-resolution masks); each positive proposal's target
        is the matched instance's mask crop+resized to the prediction
        resolution (tf.image.crop_and_resize soft values), compared against
        the matched class's mask logits with sigmoid cross-entropy,
        averaged over pixels and positive proposals."""
        c = self.cfg
        mask_pred = pred["mask_predictions"]  # [B, P, mh, mw, K]
        gt_masks = gt["instance_masks"].astype(jnp.float32)  # [B, G, gh, gw]
        # the gt mask frame follows the compute canvas (the loader crops
        # instance masks to the same 128-bucket as the images)
        ch, cw = self._compute_canvas(pred)
        canvas = jnp.asarray([ch, cw, ch, cw], jnp.float32)
        mh, mw = mask_pred.shape[2:4]

        def per_image(props, pmask, mpred, gt_boxes, gt_classes, gt_mask, gmasks):
            res = self._detection_assigner.assign(props, gt_boxes, gt_mask=gt_mask)
            pos = ((res.match >= 0) & pmask).astype(jnp.float32)
            midx = jnp.clip(res.match, 0, gmasks.shape[0] - 1)
            sel = jnp.take(gmasks, midx, axis=0)  # [P, gh, gw]
            nboxes = props / canvas
            crops = jax.vmap(
                lambda m, bx: roi_lib.crop_and_resize_mxu(
                    m[..., None], bx[None, :], (mh, mw)
                )[0, ..., 0]
            )(sel, nboxes)
            target = jax.lax.stop_gradient(crops)
            cls = jnp.clip(jnp.take(gt_classes, midx, axis=0), 0, c.num_classes - 1)
            logit = jnp.take_along_axis(
                mpred, cls[:, None, None, None], axis=-1
            )[..., 0]
            ce = loss_lib.sigmoid_cross_entropy(logit, target)
            per_prop = jnp.mean(ce, axis=(1, 2))
            return jnp.sum(per_prop * pos) / jnp.maximum(jnp.sum(pos), 1.0)

        loss = jax.vmap(per_image)(
            pred["proposal_boxes"],
            pred["proposal_mask"],
            mask_pred,
            gt["boxes"],
            gt["classes"],
            gt["mask"],
            gt_masks,
        )
        return {
            "Loss/BoxClassifierLoss/mask_loss": jnp.mean(loss)
            * c.second_stage_mask_prediction_loss_weight
        }

    def _compute_canvas(self, pred) -> Tuple[int, int]:
        """Pixel extent of the canvas predict computed on, recovered from
        the feature map (bucketed-compute aware; == cfg.canvas_size when
        the input was the full padded canvas)."""
        feats = pred.get("rpn_features")
        if feats is None:
            return self.cfg.canvas_size
        s = self.cfg.feature_stride
        return (feats.shape[1] * s, feats.shape[2] * s)

    def _aux_loss(self, pred, gt: GroundTruth):
        c = self.cfg
        out = {}
        canvas_h, canvas_w = self._compute_canvas(pred)
        if c.mtl.foreground and "foreground_logits" in pred:
            logits = pred["foreground_logits"]  # [B, Hf, Wf]
            fh, fw = logits.shape[1:]
            norm = jnp.asarray([canvas_h, canvas_w, canvas_h, canvas_w], jnp.float32)
            target = jax.vmap(
                lambda bx, m: recycle.foreground_mask(bx / norm, m, (fh, fw))
            )(gt["boxes"], gt["mask"])
            ce = loss_lib.sigmoid_cross_entropy(logits, target)
            out["Loss/MTL/foreground_loss"] = (
                jnp.mean(ce) * c.mtl.foreground_weight
            )
        if c.mtl.multiobject and "multiobject_logits" in pred:
            labels = jax.vmap(
                lambda w, bx, cl, m: recycle.multiobject_labels(
                    w, bx, cl, m, c.num_classes
                )
            )(pred["multiobject_windows"], gt["boxes"], gt["classes"], gt["mask"])
            valid = gt["mask"] & (jnp.sum(labels, -1) > 0)
            ce = loss_lib.softmax_cross_entropy(pred["multiobject_logits"], labels)
            denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
            out["Loss/MTL/multiobject_loss"] = (
                jnp.sum(ce * valid) / denom * c.mtl.multiobject_weight
            )
        if c.mtl.closeness and "closeness_logits" in pred:
            labels = jax.vmap(
                lambda bx, cl, m: recycle.closeness_labels(
                    bx, cl, m, c.num_classes, c.mtl.closeness_sigma
                )
            )(gt["boxes"], gt["classes"], gt["mask"])
            valid = gt["mask"] & (jnp.sum(labels, -1) > 0)
            ce = loss_lib.softmax_cross_entropy(pred["closeness_logits"], labels)
            denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
            out["Loss/MTL/closeness_loss"] = (
                jnp.sum(ce * valid) / denom * c.mtl.closeness_weight
            )
        return out

    # ---- postprocess ----

    def _convert_scores(self, cls_logits: Array) -> Array:
        """Apply the configured score_converter to [N, K+1] class logits."""
        kind = self.cfg.score_converter
        if kind == "softmax":
            return jax.nn.softmax(cls_logits, axis=-1)
        if kind == "sigmoid":
            return jax.nn.sigmoid(cls_logits)
        if kind == "identity":
            return cls_logits
        raise ValueError(f"unknown score_converter {kind!r}")

    def postprocess(self, pred: Dict[str, Array], true_shapes: Array):
        """Second-stage decode + per-class NMS -> final detections.

        Returns dict with detection_boxes (normalized to the TRUE image),
        detection_scores, detection_classes (0-based), num_detections —
        the reference's output contract (SURVEY.md §4.4). In RPN-only mode
        (number_of_stages=1) the proposals themselves are returned as
        class-agnostic detections, as in the reference.
        """
        c = self.cfg
        if c.number_of_stages == 1:
            def rpn_only(props, scores, mask, true_hw):
                window = jnp.concatenate([jnp.zeros(2), true_hw.astype(jnp.float32)])
                boxes = box_ops.change_coordinate_frame(props, window)
                return (
                    jnp.where(mask[:, None], boxes, 0.0),
                    jnp.where(mask, scores, 0.0),
                    jnp.zeros(props.shape[0], jnp.int32),
                    jnp.sum(mask).astype(jnp.int32),
                )

            boxes, scores, classes, num = jax.vmap(rpn_only)(
                pred["proposal_boxes"], pred["proposal_scores"],
                pred["proposal_mask"], true_shapes,
            )
            return {
                "detection_boxes": boxes,
                "detection_scores": scores,
                "detection_classes": classes,
                "num_detections": num,
            }

        mask_preds = pred.get("mask_predictions")

        def per_image(props, mask, cls_logits, box_refine, true_hw, roi_masks):
            # second_stage_post_processing.score_converter (reference
            # post_processing_builder); background column dropped after
            scores = self._convert_scores(cls_logits)[:, 1:]
            num_box = box_refine.shape[1]
            anchors = jnp.broadcast_to(
                props[:, None, :], (props.shape[0], c.num_classes, 4)
            )
            refine = (
                jnp.broadcast_to(box_refine, anchors.shape)
                if num_box == 1
                else box_refine
            )
            decoded = self.box_coder.decode(
                refine.reshape(-1, 4), anchors.reshape(-1, 4)
            ).reshape(anchors.shape)
            window = jnp.concatenate([jnp.zeros(2), true_hw.astype(jnp.float32)])
            extra = {"masks": roi_masks} if roi_masks is not None else None
            res = nms_lib.multiclass_non_max_suppression(
                decoded,
                scores,
                score_threshold=c.second_stage_nms_score_threshold,
                iou_threshold=c.second_stage_nms_iou_threshold,
                max_size_per_class=c.second_stage_max_detections_per_class,
                max_total_size=c.second_stage_max_total_detections,
                clip_window=window,
                change_coordinate_frame=True,
                valid_mask=mask,
                extra_fields=extra,
            )
            det_masks = None
            if roi_masks is not None:
                per_class = res.extra_fields["masks"]  # [D, mh, mw, K]
                det_masks = jax.nn.sigmoid(
                    jnp.take_along_axis(
                        per_class,
                        res.classes[:, None, None, None],
                        axis=-1,
                    )[..., 0]
                )
            return res.boxes, res.scores, res.classes, res.num_valid, det_masks

        if mask_preds is None:
            per_image_nomask = lambda a, b_, c_, d, e: per_image(a, b_, c_, d, e, None)[:4]
            boxes, scores, classes, num = jax.vmap(per_image_nomask)(
                pred["proposal_boxes"],
                pred["proposal_mask"],
                pred["class_predictions"],
                pred["refined_box_encodings"],
                true_shapes,
            )
            det_masks = None
        else:
            boxes, scores, classes, num, det_masks = jax.vmap(per_image)(
                pred["proposal_boxes"],
                pred["proposal_mask"],
                pred["class_predictions"],
                pred["refined_box_encodings"],
                true_shapes,
                mask_preds,
            )
        out = {
            "detection_boxes": boxes,
            "detection_scores": scores,
            "detection_classes": classes,
            "num_detections": num,
        }
        if det_masks is not None:
            out["detection_masks"] = det_masks
        return out
