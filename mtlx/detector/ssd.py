"""SSD meta-architecture (reference meta_architectures/ssd_meta_arch.py,
SURVEY.md §3.3) — single-shot multi-feature-map detector, TPU-native.

Same functional design as the Faster R-CNN meta-arch: one jitted program,
static shapes, vmap over batch, PRNG-free forward (no sampling — SSD
assigns every anchor). Classic 3:1 hard-negative mining is implemented as
a static top-k over negative losses (the reference reaches the same
behavior through its HardExampleMiner configured with a large
num_hard_examples; a full NMS-based miner is available in
mtlx.losses.losses.hard_example_mining_mask).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import Array

from mtlx.anchors.multi_grid import create_ssd_anchors
from mtlx.assign import matcher as matcher_lib
from mtlx.assign import similarity as sim_lib
from mtlx.assign.target_assigner import TargetAssigner
from mtlx.backbones.feature_maps import ExtraFeatureLayers
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
    # anchors
    num_layers: int = 6
    min_scale: float = 0.2
    max_scale: float = 0.95
    aspect_ratios: Tuple[float, ...] = (1.0, 2.0, 0.5, 3.0, 1.0 / 3.0)
    reduce_boxes_in_lowest_layer: bool = True
    # matcher
    matched_threshold: float = 0.5
    unmatched_threshold: float = 0.5
    # losses
    classification_loss: str = "weighted_sigmoid"  # or weighted_softmax
    localization_weight: float = 1.0
    classification_weight: float = 1.0
    negatives_per_positive: float = 3.0
    min_negatives_per_image: int = 3
    normalize_loss_by_num_matches: bool = True
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
                c.depth_multiplier, c.min_depth, dtype=c.dtype, name="backbone"
            )
        else:
            self.backbone = MobileNetV1(
                c.depth_multiplier, c.min_depth, dtype=c.dtype, name="backbone"
            )
        self.extra_layers = ExtraFeatureLayers(dtype=c.dtype, name="extra")
        self.predictors = [
            box_predictors.ConvolutionalBoxPredictor(
                num_classes=c.num_classes,
                num_anchors_per_location=self.anchors_per_location[i],
                box_code_size=c.box_code_size,
                kernel_size=c.kernel_size,
                use_dropout=False,
                dtype=c.dtype,
                name=f"box_predictor_{i}",
            )
            for i in range(c.num_layers)
        ]

    def __call__(self, images):
        feats = self.extra_layers(self.backbone(images))
        cls_list, box_list = [], []
        for predictor, fmap in zip(self.predictors, feats):
            cls, box = predictor(fmap)
            cls_list.append(cls)
            box_list.append(box)
        return (
            jnp.concatenate(cls_list, axis=1),  # [B, A, K+1]
            jnp.concatenate(box_list, axis=1),  # [B, A, 4]
            [f.shape[1:3] for f in feats],
        )


class SSD:
    """Functional SSD detector with the DetectionModel 4-method API."""

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
        self.box_coder = box_coders.make_faster_rcnn_coder()
        self._assigner = TargetAssigner(
            similarity_fn=sim_lib.iou_similarity,
            matcher_fn=matcher_lib.make_argmax_matcher(
                matched_threshold=cfg.matched_threshold,
                unmatched_threshold=cfg.unmatched_threshold,
                force_match_for_each_row=True,
            ),
            box_coder=self.box_coder,
        )
        # anchors are trace-time constants: feature-map shapes follow from
        # the static canvas (MobileNet endpoints at /16 and /32, then 4
        # stride-2 extra layers; SAME padding => ceil division, floor 1)
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

    def init_variables(self, rng):
        import numpy as np

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

    def predict(self, variables, images: Array) -> Dict[str, Array]:
        cls_logits, box_encodings, shapes = self.modules.apply(variables, images)
        if box_encodings.shape[1] != self.anchors.shape[0]:
            raise ValueError(
                f"anchor count {self.anchors.shape[0]} != predictor outputs "
                f"{box_encodings.shape[1]} (feature shapes {shapes} vs "
                f"precomputed {self.feature_map_shapes})"
            )
        return {
            "class_predictions_with_background": cls_logits,
            "box_encodings": box_encodings,
            "anchors": self.anchors,
        }

    def loss(self, pred: Dict[str, Array], groundtruth) -> Dict[str, Array]:
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
            # classic 3:1 hard negative mining via top-k of negative losses
            neg_mask = (res.match == matcher_lib.UNMATCHED) & (res.cls_weights > 0)
            num_neg = jnp.minimum(
                jnp.maximum(
                    c.negatives_per_positive * num_matches,
                    float(c.min_negatives_per_image),
                ),
                jnp.sum(neg_mask.astype(jnp.float32)),
            )
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
            groundtruth["boxes"],
            groundtruth["classes"],
            groundtruth["mask"],
        )
        out = {
            "Loss/classification_loss": jnp.mean(cls_l) * c.classification_weight,
            "Loss/localization_loss": jnp.mean(loc_l) * c.localization_weight,
        }
        out["total_loss"] = out["Loss/classification_loss"] + out["Loss/localization_loss"]
        return out

    def postprocess(self, pred: Dict[str, Array]) -> Dict[str, Array]:
        c = self.cfg
        anchors = pred["anchors"]

        def per_image(cls_logits, box_enc):
            boxes = self.box_coder.decode(box_enc, anchors)
            if c.score_converter == "sigmoid":
                scores = jax.nn.sigmoid(cls_logits)[:, 1:]
            elif c.score_converter == "softmax":
                scores = jax.nn.softmax(cls_logits, axis=-1)[:, 1:]
            else:
                scores = cls_logits[:, 1:]
            res = nms_lib.multiclass_non_max_suppression(
                boxes[:, None, :],
                scores,
                score_threshold=c.nms_score_threshold,
                iou_threshold=c.nms_iou_threshold,
                max_size_per_class=c.max_detections_per_class,
                max_total_size=c.max_total_detections,
                clip_window=jnp.asarray([0.0, 0.0, 1.0, 1.0]),
            )
            return res.boxes, res.scores, res.classes, res.num_valid

        boxes, scores, classes, num = jax.vmap(per_image)(
            pred["class_predictions_with_background"], pred["box_encodings"]
        )
        return {
            "detection_boxes": boxes,
            "detection_scores": scores,
            "detection_classes": classes,
            "num_detections": num,
        }
