"""Per-proto component builders (reference builders/*.py, SURVEY.md §3.4:
anchor_generator_builder, box_coder_builder, matcher_builder,
region_similarity_calculator_builder, image_resizer_builder,
post_processing_builder, losses_builder, hyperparams_builder,
input_reader_builder). model_builder/ssd_builder compose these; they are
also the public config-to-component API for users assembling custom
models.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax.numpy as jnp

from mtlx.anchors.grid import GridAnchorGenerator
from mtlx.anchors.multi_grid import create_ssd_anchors
from mtlx.assign import matcher as matcher_lib
from mtlx.assign import similarity as sim_lib
from mtlx.coders import box_coders
from mtlx.losses import losses as loss_lib


def build_anchor_generator(proto):
    """AnchorGenerator proto -> generator object."""
    kind = proto.WhichOneof("anchor_generator_oneof")
    if kind == "grid_anchor_generator":
        g = proto.grid_anchor_generator
        return GridAnchorGenerator(
            scales=tuple(g.scales) or (0.25, 0.5, 1.0, 2.0),
            aspect_ratios=tuple(g.aspect_ratios) or (0.5, 1.0, 2.0),
            base_anchor_size=(float(g.height or 256), float(g.width or 256)),
            anchor_stride=(float(g.height_stride), float(g.width_stride)),
            anchor_offset=(float(g.height_offset), float(g.width_offset)),
        )
    if kind == "ssd_anchor_generator":
        g = proto.ssd_anchor_generator
        return create_ssd_anchors(
            num_layers=g.num_layers,
            min_scale=g.min_scale,
            max_scale=g.max_scale,
            scales=tuple(g.scales),
            aspect_ratios=tuple(g.aspect_ratios) or (1.0, 2.0, 0.5, 3.0, 1.0 / 3.0),
            interpolated_scale_aspect_ratio=g.interpolated_scale_aspect_ratio,
            base_anchor_size=(g.base_anchor_height, g.base_anchor_width),
            reduce_boxes_in_lowest_layer=g.reduce_boxes_in_lowest_layer,
        )
    raise ValueError(f"unknown anchor generator {kind!r}")


def build_box_coder(proto) -> box_coders.BoxCoder:
    kind = proto.WhichOneof("box_coder_oneof")
    if kind == "faster_rcnn_box_coder":
        c = proto.faster_rcnn_box_coder
        return box_coders.make_faster_rcnn_coder(
            (c.y_scale, c.x_scale, c.height_scale, c.width_scale)
        )
    if kind == "mean_stddev_box_coder":
        return box_coders.make_mean_stddev_coder(proto.mean_stddev_box_coder.stddev)
    if kind == "square_box_coder":
        return box_coders.make_square_coder(
            (proto.square_box_coder.scale_factor,) * 3
        )
    if kind == "keypoint_box_coder":
        c = proto.keypoint_box_coder
        scale = (c.y_scale, c.x_scale, c.height_scale, c.width_scale)
        return box_coders.BoxCoder(
            encode=functools.partial(box_coders.keypoint_encode, scale_factors=scale),
            decode=functools.partial(
                box_coders.keypoint_decode,
                num_keypoints=c.num_keypoints,
                scale_factors=scale,
            ),
            code_size=4 + 2 * c.num_keypoints,
        )
    raise ValueError(f"unknown box coder {kind!r}")


def build_matcher(proto) -> Callable:
    kind = proto.WhichOneof("matcher_oneof")
    if kind == "argmax_matcher":
        m = proto.argmax_matcher
        if m.ignore_thresholds:
            # reference matcher_builder: ignore_thresholds disables BOTH
            # thresholds (ArgMaxMatcher(matched_threshold=None)) — every
            # anchor matches its argmax row; there are no negatives or
            # ignores (NOT merely a collapsed ignore band)
            return matcher_lib.make_argmax_matcher(
                matched_threshold=float("-inf"),
                unmatched_threshold=float("-inf"),
                negatives_lower_than_unmatched=m.negatives_lower_than_unmatched,
                force_match_for_each_row=m.force_match_for_each_row,
            )
        return matcher_lib.make_argmax_matcher(
            matched_threshold=m.matched_threshold,
            unmatched_threshold=m.unmatched_threshold,
            negatives_lower_than_unmatched=m.negatives_lower_than_unmatched,
            force_match_for_each_row=m.force_match_for_each_row,
        )
    if kind == "bipartite_matcher":
        return matcher_lib.greedy_bipartite_match
    raise ValueError(f"unknown matcher {kind!r}")


def build_region_similarity_calculator(proto) -> Callable:
    kind = proto.WhichOneof("region_similarity")
    return {
        "iou_similarity": sim_lib.iou_similarity,
        "ioa_similarity": sim_lib.ioa_similarity,
        "neg_sq_dist_similarity": sim_lib.neg_sq_dist_similarity,
    }[kind]


def build_image_resizer(proto) -> Tuple[str, dict]:
    from mtlx.builders.model_builder import resizer_params

    return resizer_params(proto)


def build_post_processing(proto):
    """PostProcessing proto -> (nms kwargs dict, score_converter name)."""
    nms = proto.batch_non_max_suppression
    kwargs = dict(
        score_threshold=nms.score_threshold,
        iou_threshold=nms.iou_threshold,
        max_size_per_class=nms.max_detections_per_class,
        max_total_size=nms.max_total_detections,
    )
    converter = {0: "identity", 1: "sigmoid", 2: "softmax"}[proto.score_converter]
    return kwargs, converter


def build_classification_loss(proto) -> Callable:
    kind = proto.WhichOneof("classification_loss")
    if kind == "weighted_sigmoid" or kind is None:
        return loss_lib.weighted_sigmoid_classification_loss
    if kind == "weighted_softmax":
        return functools.partial(
            loss_lib.weighted_softmax_classification_loss,
            logit_scale=proto.weighted_softmax.logit_scale,
        )
    if kind == "bootstrapped_sigmoid":
        b = proto.bootstrapped_sigmoid
        return functools.partial(
            loss_lib.bootstrapped_sigmoid_classification_loss,
            alpha=b.alpha,
            bootstrap_type="hard" if b.hard_bootstrap else "soft",
        )
    raise ValueError(f"unknown classification loss {kind!r}")


def build_localization_loss(proto) -> Callable:
    kind = proto.WhichOneof("localization_loss")
    if kind == "weighted_l2":
        return loss_lib.weighted_l2_loss
    if kind == "weighted_smooth_l1" or kind is None:
        return loss_lib.weighted_smooth_l1_loss
    if kind == "weighted_iou":
        return loss_lib.weighted_iou_loss
    raise ValueError(f"unknown localization loss {kind!r}")


def build_hard_example_miner(m, cls_loss_weight: float = 0.05,
                             loc_loss_weight: float = 0.06):
    """HardExampleMiner proto -> miner config — the ONE mapping both the
    SSD losses path and the FRCNN model_builder path use (reference
    losses_builder.build_hard_example_miner). Weight defaults follow the
    reference miner; both callers override them with their configured
    cls/loc loss weights so mining ranks by the same weighted loss the
    training loss uses."""
    return loss_lib.HardExampleMinerConfig(
        num_hard_examples=m.num_hard_examples,
        iou_threshold=m.iou_threshold,
        loss_type={0: "both", 1: "cls", 2: "loc"}[m.loss_type],
        cls_loss_weight=cls_loss_weight,
        loc_loss_weight=loc_loss_weight,
        max_negatives_per_positive=float(m.max_negatives_per_positive),
        min_negatives_per_image=m.min_negatives_per_image,
    )


def build_losses(loss_proto):
    """Loss proto -> (cls_fn, loc_fn, cls_weight, loc_weight, miner_config).

    The per-loss `anchorwise_output` flag is accepted for config
    compatibility but has no effect: it only controlled whether the TF
    implementation returned a per-anchor tensor instead of a scalar, and
    mtlx losses are always computed per-anchor and reduced in the
    meta-arch (the hard-example miner consumes the per-anchor form
    directly)."""
    cls_fn = build_classification_loss(loss_proto.classification_loss)
    loc_fn = build_localization_loss(loss_proto.localization_loss)
    miner = None
    if loss_proto.HasField("hard_example_miner"):
        # reference losses_builder passes the Loss proto's configured
        # weights into the miner (overriding HardExampleMiner's 0.05/0.06
        # class defaults) — the miner must rank examples by the same
        # weighted loss the training loss uses
        miner = build_hard_example_miner(
            loss_proto.hard_example_miner,
            cls_loss_weight=loss_proto.classification_weight,
            loc_loss_weight=loss_proto.localization_weight,
        )
    return (
        cls_fn,
        loc_fn,
        loss_proto.classification_weight,
        loss_proto.localization_weight,
        miner,
    )


def build_hyperparams(proto):
    """Hyperparams proto -> dict of flax-friendly settings (initializer,
    regularizer weight, activation). The reference's arg_scope becomes
    explicit module kwargs in a functional framework."""
    import flax.linen as nn

    init_kind = proto.initializer.WhichOneof("initializer_oneof")
    if init_kind == "truncated_normal_initializer":
        tn = proto.initializer.truncated_normal_initializer
        initializer = nn.initializers.truncated_normal(stddev=tn.stddev)
    elif init_kind == "variance_scaling_initializer":
        vs = proto.initializer.variance_scaling_initializer
        mode = {0: "fan_in", 1: "fan_out", 2: "fan_avg"}[vs.mode]
        dist = "uniform" if vs.uniform else "truncated_normal"
        initializer = nn.initializers.variance_scaling(vs.factor, mode, dist)
    else:
        initializer = nn.initializers.lecun_normal()

    reg_kind = proto.regularizer.WhichOneof("regularizer_oneof")
    reg_weight = 0.0
    if reg_kind == "l2_regularizer":
        reg_weight = proto.regularizer.l2_regularizer.weight
    elif reg_kind == "l1_regularizer":
        reg_weight = proto.regularizer.l1_regularizer.weight

    activation = {0: None, 1: "relu", 2: "relu6"}[proto.activation]
    return {
        "op": "fc" if proto.op == 2 else "conv",
        "initializer": initializer,
        "regularizer": reg_kind,
        "regularizer_weight": reg_weight,
        "activation": activation,
        "batch_norm": proto.HasField("batch_norm"),
        "batch_norm_train": proto.batch_norm.train,
    }


def build_input_reader(proto, canvas_size, resizer, max_boxes=100,
                       process_index=0, process_count=1):
    """InputReader proto -> DetectionDataset (reference
    input_reader_builder.build)."""
    from mtlx.data.loader import DetectionDataset

    if proto.WhichOneof("input_reader") != "tf_record_input_reader":
        raise ValueError("only tf_record_input_reader is supported")
    return DetectionDataset(
        list(proto.tf_record_input_reader.input_path),
        canvas_size=canvas_size,
        resizer=resizer,
        max_boxes=max_boxes,
        process_index=process_index,
        process_count=process_count,
        load_instance_masks=proto.load_instance_masks,
        num_keypoints=proto.num_keypoints,
    )
