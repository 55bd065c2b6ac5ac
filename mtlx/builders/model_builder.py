"""model_builder — pipeline proto -> detector instance (reference
builders/model_builder.py, SURVEY.md §3.4). Reads the MTL options [F]."""

from __future__ import annotations

import jax.numpy as jnp

from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig, MTLConfig

FEATURE_EXTRACTORS = {
    "faster_rcnn_resnet50": "resnet50",
    "faster_rcnn_resnet101": "resnet101",
    "faster_rcnn_resnet152": "resnet152",
    "faster_rcnn_inception_resnet_v2": "inception_resnet_v2",
    "faster_rcnn_inception_v2": "inception_v2",
}


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def canvas_from_resizer(image_resizer, stride: int = 16,
                        exact_fixed_shape: bool = False):
    """Static canvas from the image_resizer proto.

    keep_aspect_ratio_resizer(min, max) -> (max, max) canvas (any resized
    image fits after keep-aspect scaling); fixed_shape_resizer -> (h, w).
    Rounded up to a multiple of 2*stride so the FRCNN bucket/anchor-grid
    machinery divides evenly — except exact_fixed_shape (SSD): the
    SAME-padded extractors ceil-divide any size, and SSD300's identity
    (conv11 at 19x19, 1917 anchors for the reference mobilenet/inception
    layouts) requires computing at exactly 300x300, not a 320 round-up.
    """
    mult = 2 * stride
    kind = image_resizer.WhichOneof("image_resizer_oneof")
    if kind == "fixed_shape_resizer":
        r = image_resizer.fixed_shape_resizer
        if exact_fixed_shape:
            return (r.height, r.width)
        return (_round_up(r.height, mult), _round_up(r.width, mult))
    r = image_resizer.keep_aspect_ratio_resizer
    side = _round_up(r.max_dimension, mult)
    return (side, side)


def resizer_params(image_resizer):
    """(kind, params) for the data pipeline's host-side resize."""
    kind = image_resizer.WhichOneof("image_resizer_oneof") or "keep_aspect_ratio_resizer"
    if kind == "fixed_shape_resizer":
        r = image_resizer.fixed_shape_resizer
        return "fixed", {"height": r.height, "width": r.width}
    r = image_resizer.keep_aspect_ratio_resizer
    return "keep_aspect", {
        "min_dimension": r.min_dimension,
        "max_dimension": r.max_dimension,
    }


def build(model_proto, is_training: bool, max_gt_boxes: int = 100,
          dtype=jnp.bfloat16):
    """Dispatch on the model oneof, mirroring the reference's build()."""
    which = model_proto.WhichOneof("model")
    if which == "faster_rcnn":
        return _build_faster_rcnn(model_proto.faster_rcnn, is_training,
                                  max_gt_boxes, dtype)
    if which == "ssd":
        from mtlx.builders import ssd_builder

        return ssd_builder.build(model_proto.ssd, is_training, max_gt_boxes, dtype)
    raise ValueError(f"unknown model type {which!r}")


def regularization_scopes(model_proto):
    """Weight-regularization spec from the model's Hyperparams messages:
    [(top-level param scope prefix, kind, weight), ...] consumed by
    train_step.make_regularization_fn (reference hyperparams_builder
    regularizers summed into total loss, SURVEY.md §3.4/§4.1)."""
    from mtlx.builders.component_builders import build_hyperparams

    def reg(h_proto):
        h = build_hyperparams(h_proto)
        return h["regularizer"], h["regularizer_weight"]

    scopes = []
    which = model_proto.WhichOneof("model")
    if which == "faster_rcnn":
        fr = model_proto.faster_rcnn
        if fr.HasField("first_stage_box_predictor_conv_hyperparams"):
            kind, w = reg(fr.first_stage_box_predictor_conv_hyperparams)
            if kind and w:
                scopes.append(("rpn", kind, w))
        sp = fr.second_stage_box_predictor
        pk = sp.WhichOneof("box_predictor_oneof")
        if pk == "mask_rcnn_box_predictor":
            m = sp.mask_rcnn_box_predictor
            if m.HasField("fc_hyperparams"):
                kind, w = reg(m.fc_hyperparams)
                if kind and w:
                    scopes.append(("box_predictor", kind, w))
            if m.HasField("conv_hyperparams"):
                kind, w = reg(m.conv_hyperparams)
                if kind and w:
                    scopes.append(("mask_head", kind, w))
        elif pk == "rfcn_box_predictor" and sp.rfcn_box_predictor.HasField(
            "conv_hyperparams"
        ):
            kind, w = reg(sp.rfcn_box_predictor.conv_hyperparams)
            if kind and w:
                scopes.append(("rfcn_predictor", kind, w))
    elif which == "ssd":
        ssd = model_proto.ssd
        bp = ssd.box_predictor
        if (
            bp.WhichOneof("box_predictor_oneof") == "convolutional_box_predictor"
            and bp.convolutional_box_predictor.HasField("conv_hyperparams")
        ):
            kind, w = reg(bp.convolutional_box_predictor.conv_hyperparams)
            if kind and w:
                scopes.append(("box_predictor", kind, w))
                scopes.append(("extra", kind, w))
        if ssd.feature_extractor.HasField("conv_hyperparams"):
            kind, w = reg(ssd.feature_extractor.conv_hyperparams)
            if kind and w:
                scopes.append(("backbone", kind, w))
    return scopes


def _build_faster_rcnn(fr, is_training: bool, max_gt_boxes: int, dtype):
    extractor_type = fr.feature_extractor.type or "faster_rcnn_resnet50"
    if extractor_type not in FEATURE_EXTRACTORS:
        raise ValueError(f"unknown feature extractor {extractor_type!r}")
    stride = fr.feature_extractor.first_stage_features_stride or 16
    # feature_extractor.batch_norm overrides the backbone arg_scope BN
    # params (reference hyperparams_builder batch_norm semantics: a present
    # block means slim BatchNorm proto defaults for unset sub-fields)
    bn_params = None
    if fr.feature_extractor.HasField("batch_norm"):
        b = fr.feature_extractor.batch_norm
        bn_params = (b.decay, b.epsilon, b.center, b.scale)

    ag = fr.first_stage_anchor_generator
    if ag.WhichOneof("anchor_generator_oneof") != "grid_anchor_generator":
        raise ValueError("faster_rcnn requires grid_anchor_generator")
    g = ag.grid_anchor_generator
    scales = tuple(g.scales) or (0.25, 0.5, 1.0, 2.0)
    aspects = tuple(g.aspect_ratios) or (0.5, 1.0, 2.0)

    from mtlx.builders.component_builders import build_hyperparams

    rpn_init = None
    if fr.HasField("first_stage_box_predictor_conv_hyperparams"):
        rpn_init = build_hyperparams(
            fr.first_stage_box_predictor_conv_hyperparams
        )["initializer"]
    rpn_kernel_size = fr.first_stage_box_predictor_kernel_size or 3

    sp = fr.second_stage_box_predictor
    predictor_kind = sp.WhichOneof("box_predictor_oneof")
    use_dropout, keep_prob = False, 1.0
    fc_init = None
    miner_cfg = None
    if fr.HasField("hard_example_miner"):
        from mtlx.builders.component_builders import build_hard_example_miner

        # reference model_builder passes the second-stage loss weights into
        # the miner so it ranks ROIs by the same weighted loss training
        # minimizes (losses_builder.build_hard_example_miner(config,
        # second_stage_classification_loss_weight,
        # second_stage_localization_loss_weight))
        miner_cfg = build_hard_example_miner(
            fr.hard_example_miner,
            cls_loss_weight=fr.second_stage_classification_loss_weight,
            loc_loss_weight=fr.second_stage_localization_loss_weight,
        )
    predict_masks, mask_depth = False, 256
    if predictor_kind == "mask_rcnn_box_predictor":
        if sp.mask_rcnn_box_predictor.predict_keypoints:
            # parity with the reference box_predictor, which raises
            # "Keypoint prediction is unimplemented" for this flag
            raise ValueError(
                "predict_keypoints is unimplemented for "
                "MaskRCNNBoxPredictor (as in the reference)"
            )
        use_dropout = sp.mask_rcnn_box_predictor.use_dropout
        keep_prob = sp.mask_rcnn_box_predictor.dropout_keep_probability
        predict_masks = sp.mask_rcnn_box_predictor.predict_instance_masks
        mask_depth = sp.mask_rcnn_box_predictor.mask_prediction_conv_depth
        if sp.mask_rcnn_box_predictor.HasField("fc_hyperparams"):
            fc_init = build_hyperparams(
                sp.mask_rcnn_box_predictor.fc_hyperparams
            )["initializer"]

    pp = fr.second_stage_post_processing
    nms = pp.batch_non_max_suppression
    score_converter = {0: "identity", 1: "sigmoid", 2: "softmax"}[pp.score_converter]

    mtl = MTLConfig(
        multiobject=fr.mtl.window,
        closeness=fr.mtl.closeness,
        foreground=fr.mtl.edgemask,
        multiobject_weight=fr.mtl.window_loss_weight,
        closeness_weight=fr.mtl.closeness_loss_weight,
        foreground_weight=fr.mtl.edgemask_loss_weight,
        window_enlarge_factor=fr.mtl.window_enlarge_factor,
        closeness_sigma=fr.mtl.closeness_sigma,
        window_sampling=fr.mtl.window_sampling,
        refine=fr.mtl.refine,
    )

    # R-FCN is selected by the rfcn_box_predictor oneof (reference
    # model_builder behavior): same config surface, different stage 2.
    if predictor_kind == "rfcn_box_predictor":
        from mtlx.detector.rfcn import RFCN, RFCNConfig

        r = sp.rfcn_box_predictor
        cfg = RFCNConfig(
            num_classes=fr.num_classes,
            canvas_size=canvas_from_resizer(fr.image_resizer, stride),
            backbone=FEATURE_EXTRACTORS[extractor_type],
            feature_stride=stride,
            anchor_scales=scales,
            anchor_aspect_ratios=aspects,
            anchor_base_size=(float(g.height or 256), float(g.width or 256)),
            rpn_depth=fr.first_stage_box_predictor_depth,
            rpn_kernel_size=rpn_kernel_size,
            rpn_atrous_rate=fr.first_stage_atrous_rate or 1,
            rpn_conv_initializer=rpn_init,
            first_stage_nms_score_threshold=fr.first_stage_nms_score_threshold,
            first_stage_nms_iou_threshold=fr.first_stage_nms_iou_threshold,
            first_stage_max_proposals=fr.first_stage_max_proposals,
            first_stage_minibatch_size=fr.first_stage_minibatch_size,
            first_stage_positive_balance_fraction=fr.first_stage_positive_balance_fraction,
            first_stage_localization_loss_weight=fr.first_stage_localization_loss_weight,
            first_stage_objectness_loss_weight=fr.first_stage_objectness_loss_weight,
            second_stage_batch_size=fr.second_stage_batch_size,
            second_stage_balance_fraction=fr.second_stage_balance_fraction,
            second_stage_nms_score_threshold=nms.score_threshold,
            second_stage_nms_iou_threshold=nms.iou_threshold,
            second_stage_max_detections_per_class=nms.max_detections_per_class,
            second_stage_max_total_detections=nms.max_total_detections,
            second_stage_localization_loss_weight=fr.second_stage_localization_loss_weight,
            second_stage_classification_loss_weight=fr.second_stage_classification_loss_weight,
            score_converter=score_converter,
            num_spatial_bins=(r.num_spatial_bins_height, r.num_spatial_bins_width),
            rfcn_depth=r.depth,
            rfcn_crop_size=(r.crop_height, r.crop_width),
            batch_norm_trainable=fr.feature_extractor.batch_norm_trainable,
            batch_norm_params=bn_params,
            slim_stride_order=fr.feature_extractor.slim_stride_order,
            max_gt_boxes=max_gt_boxes,
            dtype=dtype,
            mtl=mtl if is_training else MTLConfig(),
        )
        return RFCN(cfg)

    cfg = FasterRCNNConfig(
        num_classes=fr.num_classes,
        canvas_size=canvas_from_resizer(fr.image_resizer, stride),
        backbone=FEATURE_EXTRACTORS[extractor_type],
        feature_stride=stride,
        anchor_scales=scales,
        anchor_aspect_ratios=aspects,
        anchor_base_size=(float(g.height or 256), float(g.width or 256)),
        rpn_depth=fr.first_stage_box_predictor_depth,
        rpn_kernel_size=rpn_kernel_size,
        rpn_atrous_rate=fr.first_stage_atrous_rate or 1,
        rpn_conv_initializer=rpn_init,
        first_stage_nms_score_threshold=fr.first_stage_nms_score_threshold,
        first_stage_nms_iou_threshold=fr.first_stage_nms_iou_threshold,
        first_stage_max_proposals=fr.first_stage_max_proposals,
        first_stage_minibatch_size=fr.first_stage_minibatch_size,
        first_stage_positive_balance_fraction=fr.first_stage_positive_balance_fraction,
        first_stage_localization_loss_weight=fr.first_stage_localization_loss_weight,
        first_stage_objectness_loss_weight=fr.first_stage_objectness_loss_weight,
        initial_crop_size=fr.initial_crop_size or 14,
        maxpool_kernel_size=fr.maxpool_kernel_size or 2,
        maxpool_stride=fr.maxpool_stride or 2,
        second_stage_batch_size=fr.second_stage_batch_size,
        second_stage_balance_fraction=fr.second_stage_balance_fraction,
        second_stage_nms_score_threshold=nms.score_threshold,
        second_stage_nms_iou_threshold=nms.iou_threshold,
        second_stage_max_detections_per_class=nms.max_detections_per_class,
        second_stage_max_total_detections=nms.max_total_detections,
        second_stage_localization_loss_weight=fr.second_stage_localization_loss_weight,
        second_stage_classification_loss_weight=fr.second_stage_classification_loss_weight,
        second_stage_dropout=use_dropout and is_training,
        second_stage_dropout_keep_prob=keep_prob,
        second_stage_fc_initializer=fc_init,
        score_converter=score_converter,
        predict_instance_masks=predict_masks,
        mask_prediction_conv_depth=mask_depth,
        second_stage_mask_prediction_loss_weight=(
            fr.second_stage_mask_prediction_loss_weight
        ),
        hard_example_miner=miner_cfg,
        batch_norm_trainable=fr.feature_extractor.batch_norm_trainable,
        batch_norm_params=bn_params,
        slim_stride_order=fr.feature_extractor.slim_stride_order,
        number_of_stages=fr.number_of_stages,
        max_gt_boxes=max_gt_boxes,
        dtype=dtype,
        # eval drops the training-only aux heads UNLESS the refine path
        # fuses them into inference features
        mtl=mtl if (is_training or mtl.refine) else MTLConfig(),
    )
    return FasterRCNN(cfg)
