"""R-FCN meta-architecture (reference meta_architectures/rfcn_meta_arch.py,
SURVEY.md §3.3): Faster R-CNN with the second stage replaced by position-
sensitive score maps — no per-ROI conv stack, one bank of 1x1 convs over
the shared feature map and a position-sensitive crop per proposal."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from mtlx.detector.faster_rcnn import (
    FasterRCNN,
    FasterRCNNConfig,
    FasterRCNNModules,
)
from mtlx.heads.box_predictors import RfcnBoxPredictor


@dataclasses.dataclass(frozen=True)
class RFCNConfig(FasterRCNNConfig):
    num_spatial_bins: Tuple[int, int] = (3, 3)
    rfcn_depth: int = 1024
    rfcn_crop_size: Tuple[int, int] = (12, 12)


class RFCNModules(FasterRCNNModules):
    """Swaps the box-classifier branch for the R-FCN predictor."""

    def setup(self):
        super().setup()
        c = self.cfg
        self.rfcn_predictor = RfcnBoxPredictor(
            num_classes=c.num_classes,
            num_spatial_bins=c.num_spatial_bins,
            depth=c.rfcn_depth,
            crop_size=c.rfcn_crop_size,
            dtype=c.dtype,
            name="rfcn_predictor",
        )

    def rfcn_predictions(self, feats, norm_proposals, train: bool = False):
        # reference rfcn_meta_arch runs extract_box_classifier_features
        # (resnet block4) IMAGE-WIDE before the position-sensitive
        # predictor: one block4 pass over the shared map (stride 32, 2048
        # ch), then the predictor's 1x1 reduce + score-map convs. This is
        # also where a TF R-FCN checkpoint's SecondStageFeatureExtractor
        # weights land (converter: block4 -> classifier_backbone).
        cls_feats = self.classifier_features(feats, train)
        return self.rfcn_predictor(cls_feats, norm_proposals)

    def __call__(self, images):
        feats = self.proposal_features(images)
        obj, enc = self.rpn(feats)
        dummy_boxes = jnp.tile(
            jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), (images.shape[0], 1, 1)
        )
        cls, box = self.rfcn_predictor(
            self.classifier_features(feats), dummy_boxes
        )
        aux_pooled = jnp.mean(feats, axis=(1, 2)).astype(jnp.float32)
        if self.cfg.mtl.foreground:
            _ = self.foreground_head(feats)
        if self.cfg.mtl.multiobject:
            _ = self.multiobject_head(aux_pooled)
        if self.cfg.mtl.closeness:
            _ = self.closeness_head(aux_pooled)
        return obj, enc, cls, box


class RFCN(FasterRCNN):
    def __init__(self, cfg: RFCNConfig):
        if cfg.mtl.refine:
            # the refine path fuses aux hidden features into the per-ROI
            # FC predictor — R-FCN has no per-ROI features to fuse into
            # (position-sensitive pooling IS the classifier); silently
            # ignoring the flag would fake the paper's refinement
            raise ValueError(
                "mtl.refine is not supported by the R-FCN meta-arch "
                "(no per-ROI feature stack to refine); disable refine "
                "or use faster_rcnn"
            )
        super().__init__(cfg)
        self.modules = RFCNModules(cfg)

    def _predict_second_stage(self, variables, feats, proposals, training,
                              rng, canvas_hw=None):
        c = self.cfg
        ch, cw = canvas_hw if canvas_hw is not None else c.canvas_size
        canvas = jnp.asarray([ch, cw, ch, cw], jnp.float32)
        if training and c.batch_norm_trainable:
            (cls_logits, box_refine), mutated = self.modules.apply(
                variables,
                feats,
                proposals / canvas,
                True,
                method=RFCNModules.rfcn_predictions,
                mutable=["batch_stats"],
            )
            variables = dict(variables, batch_stats=mutated["batch_stats"])
        else:
            cls_logits, box_refine = self.modules.apply(
                variables,
                feats,
                proposals / canvas,
                method=RFCNModules.rfcn_predictions,
            )
        return (
            cls_logits.astype(jnp.float32),
            box_refine.astype(jnp.float32),
            None,  # no mask branch in R-FCN
            variables,
        )
