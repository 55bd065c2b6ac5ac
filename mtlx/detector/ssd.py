"""SSD meta-architecture (reference meta_architectures/ssd_meta_arch.py,
SURVEY.md §3.3) — single-shot multi-feature-map detector, TPU-native.

Same functional design as the Faster R-CNN meta-arch and the SAME
DetectionModel method signatures, so the config->train->eval drivers are
meta-arch agnostic: one jitted program, static shapes, vmap over batch.
Groundtruth boxes arrive in absolute canvas pixels (the loader contract);
anchors live in canvas-normalized coordinates, so the loss normalizes GT
by the static canvas, and postprocess converts canvas-normalized
detections to true-image-normalized at the boundary (CLAUDE.md geometry
convention).

Classic 3:1 hard-negative mining is implemented as a static top-k over
negative losses (the reference reaches the same behavior through its
HardExampleMiner configured with a large num_hard_examples; a full
NMS-based miner is available in mtlx.losses.losses.hard_example_mining_mask).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import Array

from mtlx.anchors.multi_grid import create_ssd_anchors
from mtlx.assign import matcher as matcher_lib
from mtlx.assign import similarity as sim_lib
from mtlx.assign.target_assigner import TargetAssigner
from mtlx.backbones.feature_maps import MultiResolutionFeatureMaps, ssd_layer_depths
from mtlx.backbones.mobilenet import MobileNetV1
from mtlx.coders import box_coders
from mtlx.heads import box_predictors
from mtlx.losses import losses as loss_lib
from mtlx.ops import nms as nms_lib


@dataclasses.dataclass(frozen=True)
class SSDConfig:
    num_classes: int = 20
    canvas_size: Tuple[int, int] = (320, 320)
    feature_extractor: str = "ssd_mobilenet_v1"  # or ssd_inception_v2
    depth_multiplier: float = 1.0
    min_depth: int = 8
    # feature_extractor.conv_hyperparams.batch_norm.{epsilon,center,scale}
    # (slim arg_scope defaults 0.001/true/false when a batch_norm block is
    # configured). The bare default matches slim mobilenet/inception
    # arg_scope epsilon 0.001.
    bn_epsilon: float = 1e-3
    bn_center: bool = True
    bn_scale: bool = True
    # conv_hyperparams.batch_norm.{train,decay}: live base-network BN
    # during training (reference slim arg_scope semantics — the sample ssd
    # configs set train: true, decay: 0.9997). Honored by both the
    # mobilenet and inception_v2 extractors.
    batch_norm_trainable: bool = False
    bn_momentum: float = 0.999
    # feature pyramid (reference feature_map_generators layout)
    insert_1x1_conv: bool = True
    # anchors
    num_layers: int = 6
    min_scale: float = 0.2
    max_scale: float = 0.95
    aspect_ratios: Tuple[float, ...] = (1.0, 2.0, 0.5, 3.0, 1.0 / 3.0)
    reduce_boxes_in_lowest_layer: bool = True
    # matcher / target assignment
    matched_threshold: float = 0.5
    unmatched_threshold: float = 0.5
    similarity: str = "iou"  # iou | ioa | neg_sq_dist
    box_coder_scales: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)
    # losses
    classification_loss: str = "weighted_sigmoid"  # or weighted_softmax
    localization_weight: float = 1.0
    classification_weight: float = 1.0
    negatives_per_positive: float = 3.0
    min_negatives_per_image: int = 3
    normalize_loss_by_num_matches: bool = True
    # box predictor (reference ConvolutionalBoxPredictor proto)
    predictor_min_depth: int = 0
    predictor_max_depth: int = 0
    num_layers_before_predictor: int = 0
    use_dropout: bool = False
    dropout_keep_prob: float = 0.8
    apply_sigmoid_to_scores: bool = False
    # post-processing
    score_converter: str = "sigmoid"
    nms_score_threshold: float = 1e-8
    nms_iou_threshold: float = 0.6
    max_detections_per_class: int = 100
    max_total_detections: int = 100
    box_code_size: int = 4
    kernel_size: int = 3
    max_gt_boxes: int = 100
    dtype: Any = jnp.bfloat16


class SSDModules(nn.Module):
    cfg: SSDConfig
    anchors_per_location: Tuple[int, ...]

    def setup(self):
        c = self.cfg
        if c.feature_extractor == "ssd_inception_v2":
            from mtlx.backbones.inception_v2 import InceptionV2

            self.backbone = InceptionV2(
                depth_multiplier=c.depth_multiplier, min_depth=c.min_depth,
                bn_epsilon=c.bn_epsilon, bn_center=c.bn_center,
                bn_scale=c.bn_scale, bn_momentum=c.bn_momentum,
                bn_trainable=c.batch_norm_trainable,
                dtype=c.dtype, name="backbone"
            )
        else:
            self.backbone = MobileNetV1(
                c.depth_multiplier, c.min_depth, bn_epsilon=c.bn_epsilon,
                bn_center=c.bn_center, bn_scale=c.bn_scale,
                bn_momentum=c.bn_momentum,
                bn_trainable=c.batch_norm_trainable,
                dtype=c.dtype, name="backbone"
            )
        self.feature_maps = MultiResolutionFeatureMaps(
            layer_depths=tuple(ssd_layer_depths(c.num_layers)),
            depth_multiplier=c.depth_multiplier,
            min_depth=c.min_depth,
            insert_1x1_conv=c.insert_1x1_conv,
            dtype=c.dtype,
            name="extra",
        )
        self.predictors = [
            box_predictors.ConvolutionalBoxPredictor(
                num_classes=c.num_classes,
                num_anchors_per_location=self.anchors_per_location[i],
                box_code_size=c.box_code_size,
                kernel_size=c.kernel_size,
                min_depth=c.predictor_min_depth,
                max_depth=c.predictor_max_depth,
                num_layers_before_predictor=c.num_layers_before_predictor,
                use_dropout=c.use_dropout,
                dropout_keep_prob=c.dropout_keep_prob,
                apply_sigmoid_to_scores=c.apply_sigmoid_to_scores,
                dtype=c.dtype,
                name=f"box_predictor_{i}",
            )
            for i in range(c.num_layers)
        ]

    def __call__(self, images, deterministic: bool = True,
                 train: bool = False):
        base = self.backbone(images, train=train)
        feats = self.feature_maps(base)
        cls_list, box_list = [], []
        for predictor, fmap in zip(self.predictors, feats):
            cls, box = predictor(fmap, deterministic=deterministic)
            cls_list.append(cls)
            box_list.append(box)
        return (
            jnp.concatenate(cls_list, axis=1),  # [B, A, K+1]
            jnp.concatenate(box_list, axis=1),  # [B, A, 4]
            [f.shape[1:3] for f in feats],
        )


class SSD:
    """Functional SSD detector with the DetectionModel 4-method API
    (same signatures as FasterRCNN so train/eval drivers are agnostic)."""

    def __init__(self, cfg: SSDConfig):
        self.cfg = cfg
        self._gen = create_ssd_anchors(
            num_layers=cfg.num_layers,
            min_scale=cfg.min_scale,
            max_scale=cfg.max_scale,
            aspect_ratios=cfg.aspect_ratios,
            reduce_boxes_in_lowest_layer=cfg.reduce_boxes_in_lowest_layer,
        )
        self.modules = SSDModules(
            cfg, tuple(self._gen.num_anchors_per_location)
        )
        self.box_coder = box_coders.make_faster_rcnn_coder(cfg.box_coder_scales)
        similarity_fn = {
            "iou": sim_lib.iou_similarity,
            "ioa": sim_lib.ioa_similarity,
            "neg_sq_dist": sim_lib.neg_sq_dist_similarity,
        }[cfg.similarity]
        self._assigner = TargetAssigner(
            similarity_fn=similarity_fn,
            matcher_fn=matcher_lib.make_argmax_matcher(
                matched_threshold=cfg.matched_threshold,
                unmatched_threshold=cfg.unmatched_threshold,
                force_match_for_each_row=True,
            ),
            box_coder=self.box_coder,
        )
        # anchors are trace-time constants: feature-map shapes follow from
        # the static canvas (endpoints at /16 and /32, then stride-2 extra
        # layers; SAME padding => ceil division, floor 1)
        self.feature_map_shapes = self._feature_shapes(cfg.canvas_size, cfg.num_layers)
        self.anchors = self._gen.generate(self.feature_map_shapes)

    @staticmethod
    def _feature_shapes(canvas, num_layers):
        halve = lambda x: max(1, -(-x // 2))
        h, w = canvas
        for _ in range(4):  # conv0 + 3 stride-2 blocks -> /16 (conv11)
            h, w = halve(h), halve(w)
        shapes = [(h, w)]
        for _ in range(num_layers - 1):  # conv13 + extras
            h, w = halve(h), halve(w)
            shapes.append((h, w))
        return shapes

    def init_variables(self, rng, batch_size: int = 1):
        import numpy as np

        del batch_size  # shapes are batch-independent
        h, w = self.cfg.canvas_size
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            variables = jax.jit(self.modules.init)(rng, dummy)
        return jax.tree_util.tree_map(np.asarray, variables)

    @staticmethod
    def preprocess(images: Array) -> Array:
        """SSD convention: scale to [-1, 1] (reference ssd feature
        extractors use (2/255)x - 1)."""
        return images * (2.0 / 255.0) - 1.0

    def predict(
        self,
        variables,
        images: Array,
        true_shapes: Optional[Array] = None,
        training: bool = False,
        rng=None,
        groundtruth=None,
    ) -> Dict[str, Array]:
        del true_shapes, groundtruth  # fixed-shape resize; no sampling stage
        rngs = None
        if training and self.cfg.use_dropout and rng is not None:
            rngs = {"dropout": rng}
        updated_stats = None
        if training and self.cfg.batch_norm_trainable:
            (cls_logits, box_encodings, shapes), mutated = self.modules.apply(
                variables, images, deterministic=not training, train=True,
                rngs=rngs, mutable=["batch_stats"],
            )
            updated_stats = mutated["batch_stats"]
        else:
            cls_logits, box_encodings, shapes = self.modules.apply(
                variables, images, deterministic=not training, rngs=rngs
            )
        if box_encodings.shape[1] != self.anchors.shape[0]:
            raise ValueError(
                f"anchor count {self.anchors.shape[0]} != predictor outputs "
                f"{box_encodings.shape[1]} (feature shapes {shapes} vs "
                f"precomputed {self.feature_map_shapes})"
            )
        pred = {
            "class_predictions_with_background": cls_logits,
            "box_encodings": box_encodings,
            "anchors": self.anchors,
        }
        if updated_stats is not None:
            pred["updated_batch_stats"] = updated_stats
        return pred

    def _normalize_gt(self, gt_boxes: Array) -> Array:
        """Absolute canvas pixels -> canvas-normalized (the anchor frame)."""
        ch, cw = self.cfg.canvas_size
        return gt_boxes / jnp.asarray([ch, cw, ch, cw], gt_boxes.dtype)

    def loss(self, pred: Dict[str, Array], groundtruth, rng=None) -> Dict[str, Array]:
        del rng  # no sampled minibatch in SSD (every anchor is assigned)
        c = self.cfg
        anchors = pred["anchors"]
        k = c.num_classes

        def per_image(cls_logits, box_enc, gt_boxes, gt_classes, gt_mask):
            onehot = jax.nn.one_hot(gt_classes + 1, k + 1)
            res = self._assigner.assign(
                anchors,
                gt_boxes,
                gt_labels=onehot,
                gt_mask=gt_mask,
                unmatched_cls_target=jax.nn.one_hot(0, k + 1),
            )
            matched = res.match >= 0
            num_matches = jnp.sum(matched.astype(jnp.float32))

            if c.classification_loss == "weighted_sigmoid":
                per_anchor_cls = jnp.sum(
                    loss_lib.weighted_sigmoid_classification_loss(
                        cls_logits, res.cls_targets, res.cls_weights
                    ),
                    axis=-1,
                )
            else:
                per_anchor_cls = loss_lib.weighted_softmax_classification_loss(
                    cls_logits, res.cls_targets, res.cls_weights
                )
            # classic 3:1 hard negative mining via top-k of negative losses;
            # negatives_per_positive <= 0 = no mining (reference: a config
            # without a hard_example_miner trains on ALL negatives)
            neg_mask = (res.match == matcher_lib.UNMATCHED) & (res.cls_weights > 0)
            neg_count = jnp.sum(neg_mask.astype(jnp.float32))
            if c.negatives_per_positive > 0:
                num_neg = jnp.minimum(
                    jnp.maximum(
                        c.negatives_per_positive * num_matches,
                        float(c.min_negatives_per_image),
                    ),
                    neg_count,
                )
            else:
                num_neg = neg_count
            neg_losses = jnp.where(neg_mask, per_anchor_cls, -jnp.inf)
            order = jnp.argsort(-neg_losses)
            ranks = jnp.argsort(order)
            keep_neg = neg_mask & (ranks < num_neg)
            cls_loss = jnp.sum(jnp.where(matched | keep_neg, per_anchor_cls, 0.0))

            loc_loss = jnp.sum(
                loss_lib.weighted_smooth_l1_loss(
                    box_enc, res.reg_targets, res.reg_weights
                )
            )
            normalizer = (
                jnp.maximum(num_matches, 1.0)
                if c.normalize_loss_by_num_matches
                else 1.0
            )
            return cls_loss / normalizer, loc_loss / normalizer

        cls_l, loc_l = jax.vmap(per_image)(
            pred["class_predictions_with_background"],
            pred["box_encodings"],
            self._normalize_gt(groundtruth["boxes"]),
            groundtruth["classes"],
            groundtruth["mask"],
        )
        out = {
            "Loss/classification_loss": jnp.mean(cls_l) * c.classification_weight,
            "Loss/localization_loss": jnp.mean(loc_l) * c.localization_weight,
        }
        out["total_loss"] = out["Loss/classification_loss"] + out["Loss/localization_loss"]
        return out

    def postprocess(
        self, pred: Dict[str, Array], true_shapes: Optional[Array] = None
    ) -> Dict[str, Array]:
        c = self.cfg
        anchors = pred["anchors"]
        ch, cw = c.canvas_size

        def per_image(cls_logits, box_enc, true_shape):
            boxes = self.box_coder.decode(box_enc, anchors)
            if c.score_converter == "sigmoid":
                scores = jax.nn.sigmoid(cls_logits)[:, 1:]
            elif c.score_converter == "softmax":
                scores = jax.nn.softmax(cls_logits, axis=-1)[:, 1:]
            else:
                scores = cls_logits[:, 1:]
            # restrict NMS + clipping to the true-image region of the canvas
            th = true_shape[0].astype(jnp.float32) / ch
            tw = true_shape[1].astype(jnp.float32) / cw
            res = nms_lib.multiclass_non_max_suppression(
                boxes[:, None, :],
                scores,
                score_threshold=c.nms_score_threshold,
                iou_threshold=c.nms_iou_threshold,
                max_size_per_class=c.max_detections_per_class,
                max_total_size=c.max_total_detections,
                clip_window=jnp.stack(
                    [jnp.float32(0.0), jnp.float32(0.0), th, tw]
                ),
            )
            # canvas-normalized -> true-image-normalized at the boundary
            scale = jnp.stack([1.0 / th, 1.0 / tw, 1.0 / th, 1.0 / tw])
            out_boxes = jnp.clip(res.boxes * scale, 0.0, 1.0)
            return out_boxes, res.scores, res.classes, res.num_valid

        b = pred["box_encodings"].shape[0]
        if true_shapes is None:
            true_shapes = jnp.tile(jnp.asarray([[ch, cw]], jnp.int32), (b, 1))
        boxes, scores, classes, num = jax.vmap(per_image)(
            pred["class_predictions_with_background"],
            pred["box_encodings"],
            true_shapes,
        )
        return {
            "detection_boxes": boxes,
            "detection_scores": scores,
            "detection_classes": classes,
            "num_detections": num,
        }
