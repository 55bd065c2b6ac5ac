"""Evaluation CLI — `python -m mtlx.eval.eval --pipeline_config_path=...
--checkpoint_dir=... --eval_dir=...` (reference object_detection/eval.py +
evaluator.py + eval_util.py, SURVEY.md §4.3).

Polls checkpoint_dir for new checkpoints (repeated_checkpoint_run), runs
eval_config.num_examples images through the jitted predict+postprocess,
feeds the numpy Pascal evaluator, writes per-class AP / mAP / CorLoc to
stdout and TensorBoard event files. `--run_once` evaluates the latest
checkpoint and exits.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pipeline_config_path", required=True)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--eval_dir", required=True)
    p.add_argument("--run_once", action="store_true")
    p.add_argument("--eval_training_data", action="store_true",
                   help="evaluate on the TRAIN input (reference eval.py "
                        "flag): reads train_input_reader instead of "
                        "eval_input_reader")
    p.add_argument("--master", default="", help=argparse.SUPPRESS)
    p.add_argument("--platform", default=None)
    p.add_argument("--tf1_resize", action="store_true",
                   help="TF1 resize_images convention (see train.py)")
    p.add_argument("--eval_batch_size", type=int, default=8,
                   help="images per eval step (default 8: same metrics as "
                        "the reference's batch-1 loop — per-image "
                        "evaluation is batch-invariant — at a fraction of "
                        "the wall-clock; set 1 for the reference's exact "
                        "execution shape; tail batches are padded and the "
                        "padding is ignored)")
    from mtlx.utils.bucketing import bucket_multiple_arg

    p.add_argument("--bucket_multiple", type=bucket_multiple_arg, default=0,
                   help="transfer/compute bucket granularity in pixels "
                        "(multiple of 32) — see train.py. Overrides the "
                        "pipeline's `bucketing {}` block; default 128")
    p.add_argument("--max_bucket_variants", type=int, default=0,
                   help="bound the eval compute-bucket set to at most N "
                        "shapes (see train.py; metrics are "
                        "padding-invariant). 0 = no bound")
    return p.parse_args(argv)


def build_evaluators(eval_config, categories):
    """metrics_set names -> evaluator list (reference eval_util dispatch,
    SURVEY.md §3.7; default is the Pascal VOC evaluator)."""
    from mtlx.eval.coco_evaluation import (
        CocoDetectionEvaluator,
        CocoMaskEvaluator,
    )
    from mtlx.eval.object_detection_evaluation import (
        OpenImagesDetectionEvaluator,
        PascalDetectionEvaluator,
        PascalInstanceSegmentationEvaluator,
        WeightedPascalDetectionEvaluator,
        WeightedPascalInstanceSegmentationEvaluator,
    )

    names = list(eval_config.metrics_set) or ["pascal_voc_detection_metrics"]
    evaluators = []
    for name in names:
        if name in ("pascal_voc_detection_metrics", "pascal_voc_metrics"):
            evaluators.append(PascalDetectionEvaluator(categories))
        elif name in ("weighted_pascal_voc_detection_metrics",
                      "weighted_pascal_voc_metrics"):
            evaluators.append(WeightedPascalDetectionEvaluator(categories))
        elif name == "pascal_voc_instance_segmentation_metrics":
            evaluators.append(PascalInstanceSegmentationEvaluator(categories))
        elif name == "weighted_pascal_voc_instance_segmentation_metrics":
            evaluators.append(
                WeightedPascalInstanceSegmentationEvaluator(categories)
            )
        elif name == "open_images_V2_detection_metrics":
            evaluators.append(OpenImagesDetectionEvaluator(categories))
        elif name == "coco_detection_metrics":
            evaluators.append(CocoDetectionEvaluator(categories))
        elif name == "coco_mask_metrics":
            evaluators.append(CocoMaskEvaluator(categories))
        else:
            raise ValueError(f"unknown eval_config.metrics_set entry {name!r}")
    return evaluators


def evaluate_checkpoint(model, state, dataset, eval_config, categories,
                        batch_size: int = 1, writer=None, step: int = 0,
                        max_bucket_variants: int = 0):
    """One full evaluation pass; returns the metrics dict. The first
    num_visualizations images are drawn with their detections and written
    as TensorBoard image summaries (reference eval_util behavior)."""
    import jax

    from mtlx.train.train_step import make_eval_step
    from mtlx.utils import visualization_utils as viz
    from mtlx.utils.label_map_util import create_category_index

    ignore_gt = eval_config.ignore_groundtruth
    evaluators = [] if ignore_gt else build_evaluators(eval_config, categories)
    # fail fast on a config that requests mask metrics it can never feed:
    # the Pascal instance-seg evaluators hard-require mask arrays, so a
    # missing gate would otherwise crash mid-loop with a bare KeyError
    mask_evaluators = [
        type(e).__name__ for e in evaluators
        if type(e).__name__ in (
            "CocoMaskEvaluator",
            "PascalInstanceSegmentationEvaluator",
            "WeightedPascalInstanceSegmentationEvaluator",
        )
    ]
    if mask_evaluators:
        if not eval_config.eval_instance_masks:
            raise ValueError(
                f"metrics_set requests {mask_evaluators} but eval_config."
                "eval_instance_masks is false — set it to true (and "
                "load_instance_masks on the eval input reader), or drop "
                "the instance-segmentation metrics_set entries"
            )
        if not getattr(dataset, "load_instance_masks", True):
            raise ValueError(
                f"metrics_set requests {mask_evaluators} but the eval "
                "input reader does not load instance masks — set "
                "eval_input_reader.load_instance_masks: true"
            )
        pascal_mask = [n for n in mask_evaluators if n != "CocoMaskEvaluator"]
        if pascal_mask and not getattr(
            getattr(model, "cfg", None), "predict_instance_masks", True
        ):
            raise ValueError(
                f"metrics_set requests {pascal_mask} but the model does "
                "not predict instance masks — enable predict_instance_"
                "masks on the box predictor (mask_rcnn_box_predictor "
                "{ predict_instance_masks: true })"
            )
    category_index = create_category_index(categories)
    viz_dir = eval_config.visualization_export_dir
    num_viz = (
        eval_config.num_visualizations if (writer is not None or viz_dir) else 0
    )
    if viz_dir:
        os.makedirs(viz_dir, exist_ok=True)
    detections_export = [] if eval_config.export_path else None
    # commit the restored params to the device ONCE — host-resident params
    # passed to a jitted fn are re-transferred on every call (measured:
    # ~2.3 s/batch of pure param upload on a thin host<->device link)
    try:
        state = jax.device_put(state)
    except (TypeError, ValueError):  # non-pytree state (test doubles)
        pass
    # one jitted eval step per model for the whole polling session — a
    # fresh jax.jit closure per checkpoint would retrace AND recompile
    # every poll (minutes per checkpoint on TPU)
    eval_step = getattr(model, "_jitted_eval_step", None)
    if eval_step is None:
        eval_step = jax.jit(make_eval_step(model))
        try:
            model._jitted_eval_step = eval_step
        except (AttributeError, TypeError):  # frozen/slotted test doubles
            pass
    num = min(
        eval_config.num_examples or len(dataset), len(dataset)
    )
    t0 = time.time()
    done = 0
    # bucket-major eval order: a mixed portrait/landscape batch computes
    # at the full-canvas bucket; grouping keeps batches at their own
    # bucket (metrics are per-image, so order does not affect them)
    order = list(range(num))
    coalescer = None
    if ((batch_size > 1 or max_bucket_variants)
            and hasattr(dataset, "peek_target_shape")
            and hasattr(dataset, "canvas_size")):
        from mtlx.data.loader import BucketCoalescer, record_bucket_keys

        keys = record_bucket_keys(dataset, max_records=num)
        if max_bucket_variants:
            # same variant bound as training (--max_bucket_variants):
            # rare buckets pad up to their kept superset, metrics are
            # padding-invariant. Applies at batch_size 1 too — per-image
            # buckets fan out eval-step variants exactly the same way
            coalescer = BucketCoalescer(
                keys, max_bucket_variants, dataset.canvas_size
            )
            keys = [coalescer.map(k) for k in keys]
        if batch_size > 1:
            # bucket-major order only matters for mixed batches; batch 1
            # keeps the reference's dataset order (drives which images
            # get visualization summaries)
            order.sort(key=lambda i: (keys[i], i))
    for start in range(0, num, batch_size):
        idx = order[start : start + batch_size]
        if hasattr(dataset, "get_batch"):
            samples = dataset.get_batch(idx, decode_threads=2)
        else:
            samples = [dataset.get(i) for i in idx]
        from mtlx.data.loader import pack_batch_images

        true_shapes = np.stack([s["true_shape"] for s in samples])
        batch = {
            # bucketed transfer (pack_batch_images) and uint8 on the wire
            # (4x fewer host->device bytes than float32); the eval step
            # pads back to the canvas and upcasts on device
            "image": pack_batch_images(
                np.stack([s["image"] for s in samples]), true_shapes,
                coalescer,
            ),
            "true_shape": true_shapes,
        }
        if len(idx) < batch_size:  # pad the tail batch
            pad = batch_size - len(idx)
            batch = {
                k: np.concatenate([v, np.repeat(v[-1:], pad, 0)]) for k, v in batch.items()
            }
        det = jax.device_get(eval_step(state, batch))
        # eval_config.eval_instance_masks gates mask evaluation /
        # visualization (reference eval.proto field 12) — masks are
        # dropped from the results unless enabled
        if not eval_config.eval_instance_masks:
            det.pop("detection_masks", None)
        want_masks = bool(mask_evaluators)
        if want_masks and "detection_masks" not in det and start == 0:
            print(
                f"[eval] note: {mask_evaluators} requested but no "
                "detection masks reach the evaluator — use a "
                "mask-predicting model (coco_mask_metrics scores zero "
                "mask detections)",
                flush=True,
            )
        for j, s in enumerate(samples):
            th, tw = s["true_shape"]
            gt_n = int(s["gt_mask"].sum())
            # evaluator works in absolute TRUE-image pixel coords
            gt_boxes = s["gt_boxes"][:gt_n]
            gt_info = {
                "groundtruth_boxes": gt_boxes,
                "groundtruth_classes": s["gt_classes"][:gt_n] + 1,
                "groundtruth_difficult": s["gt_difficult"][:gt_n].astype(bool),
            }
            if "gt_group_of" in s:
                gt_info["groundtruth_group_of"] = (
                    s["gt_group_of"][:gt_n].astype(bool)
                )
            n_det = int(det["num_detections"][j])
            boxes_norm = det["detection_boxes"][j][:n_det]
            scale = np.asarray([th, tw, th, tw], np.float32)
            det_info = {
                "detection_boxes": boxes_norm * scale,
                "detection_scores": det["detection_scores"][j][:n_det],
                "detection_classes": det["detection_classes"][j][:n_det] + 1,
            }
            if want_masks and "gt_instance_masks" in s:
                # both sides in the true-image frame: GT masks upscale
                # from the loader's canvas/stride raster, detection mask
                # crops paste into their boxes (reference
                # reframe_box_masks_to_image_masks)
                from PIL import Image as _PILImage

                ms = s["image"].shape[0] // s["gt_instance_masks"].shape[1]
                mth = max(1, round(int(th) / ms))
                mtw = max(1, round(int(tw) / ms))
                gmasks = np.zeros((gt_n, int(th), int(tw)), bool)
                for k in range(gt_n):
                    # crop the true region of the reduced raster, then
                    # upscale to true-image pixels
                    gmasks[k] = np.asarray(
                        _PILImage.fromarray(
                            (s["gt_instance_masks"][k][:mth, :mtw] * 255)
                            .astype(np.uint8),
                            "L",
                        ).resize((int(tw), int(th)), _PILImage.BILINEAR)
                    ) > 127
                gt_info["groundtruth_instance_masks"] = gmasks
                if "detection_masks" in det:
                    det_info["detection_masks"] = viz.paste_instance_masks(
                        det["detection_masks"][j][:n_det], boxes_norm,
                        int(th), int(tw),
                    )
            for evaluator in evaluators:
                evaluator.add_single_ground_truth_image_info(
                    s["source_id"], gt_info
                )
                evaluator.add_single_detected_image_info(
                    s["source_id"], det_info
                )
            if detections_export is not None:
                detections_export.append({
                    "source_id": s["source_id"],
                    "detection_boxes": det_info["detection_boxes"].tolist(),
                    "detection_scores":
                        det_info["detection_scores"].tolist(),
                    "detection_classes":
                        det_info["detection_classes"].tolist(),
                })
            if done < num_viz:
                image = np.array(s["image"][:th, :tw], np.uint8, copy=True)
                viz.visualize_boxes_and_labels_on_image_array(
                    image,
                    boxes_norm,
                    det["detection_classes"][j][:n_det] + 1,
                    det["detection_scores"][j][:n_det],
                    category_index,
                    instance_masks=(
                        viz.paste_instance_masks(
                            det["detection_masks"][j][:n_det], boxes_norm,
                            int(th), int(tw),
                        )
                        if "detection_masks" in det else None
                    ),
                    min_score_thresh=0.3,
                )
                # right half: the groundtruth (reference eval_util draws
                # det|gt side by side under this summary name)
                gt_image = np.array(s["image"][:th, :tw], np.uint8, copy=True)
                scale_n = np.asarray([th, tw, th, tw], np.float32)
                viz.visualize_boxes_and_labels_on_image_array(
                    gt_image,
                    gt_boxes / scale_n,
                    s["gt_classes"][:gt_n] + 1,
                    None,  # no scores: groundtruth
                    category_index,
                    instance_masks=gt_info.get("groundtruth_instance_masks"),
                    min_score_thresh=0.0,
                )
                image = np.concatenate([image, gt_image], axis=1)
                if writer is not None:
                    writer.image(
                        f"Detections_Left_Groundtruth_Right/{done}", image, step
                    )
                if viz_dir:
                    from PIL import Image as _PILImage

                    _PILImage.fromarray(image).save(os.path.join(
                        viz_dir, f"export-{step}-{done}.png"
                    ))
            done += 1
    if detections_export is not None:
        with open(eval_config.export_path, "w") as f:
            json.dump(detections_export, f)
    metrics = {}
    for evaluator in evaluators:
        metrics.update(evaluator.evaluate())
    metrics["eval/images_per_sec"] = done / (time.time() - t0)
    if writer is not None:
        for k, v in metrics.items():
            if np.isfinite(v):
                writer.scalar(k, float(v), step)
        writer.flush()
    return metrics


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from mtlx.builders import model_builder
    from mtlx.builders.model_builder import resizer_params
    from mtlx.config import config_util
    from mtlx.data.loader import DetectionDataset
    from mtlx.train import checkpoints as ckpt_lib
    from mtlx.train.train_step import create_train_state, make_optimizer
    from mtlx.utils import label_map_util
    from mtlx.utils.summary_writer import SummaryWriter

    configs = config_util.get_configs_from_pipeline_file(args.pipeline_config_path)
    for note in config_util.compatibility_notes(configs):
        print(f"[eval] note: {note}", flush=True)
    from mtlx.utils.bucketing import resolve_bucketing

    max_bucket_variants = resolve_bucketing(
        configs.get("bucketing"), args.bucket_multiple,
        args.max_bucket_variants,
    )
    eval_config = configs["eval_config"]
    input_config = (
        configs["train_input_config"] if args.eval_training_data
        else configs["eval_input_config"]
    )
    model = model_builder.build(configs["model"], is_training=False)

    dataset = DetectionDataset(
        list(input_config.tf_record_input_reader.input_path),
        canvas_size=model.cfg.canvas_size,
        resizer=resizer_params(_image_resizer(configs["model"])),
        max_boxes=100,
        load_instance_masks=input_config.load_instance_masks,
        num_keypoints=input_config.num_keypoints,
        tf1_resize=args.tf1_resize,
    )
    if input_config.label_map_path:
        categories = list(
            label_map_util.create_category_index_from_labelmap(
                input_config.label_map_path
            ).values()
        )
    else:
        categories = [
            {"id": i + 1, "name": f"class_{i + 1}"}
            for i in range(model.cfg.num_classes)
        ]

    state = create_train_state(
        model, jax.random.PRNGKey(0), make_optimizer(),
        keep_ema=eval_config.use_moving_averages,
    )
    manager = ckpt_lib.CheckpointManager(args.checkpoint_dir)
    writer = SummaryWriter(args.eval_dir)

    last_step = None
    evals = 0
    metrics = None
    while True:
        step = manager.latest_step()
        if step is not None and step != last_step:
            restored = manager.restore(state, step, params_only=True)
            if (
                eval_config.use_moving_averages
                and getattr(restored, "ema_params", None) is not None
            ):
                # evaluate the averaged weights (reference eval_config
                # use_moving_averages)
                restored = restored.replace(params=restored.ema_params)
            metrics = evaluate_checkpoint(
                model, restored, dataset, eval_config, categories,
                batch_size=args.eval_batch_size, writer=writer, step=step,
                max_bucket_variants=max_bucket_variants,
            )
            print(f"[eval] step {step}: " + json.dumps(
                {k: round(float(v), 4) for k, v in metrics.items()}
            ), flush=True)
            last_step = step
            evals += 1
        if args.run_once or (eval_config.max_evals and evals >= eval_config.max_evals):
            break
        time.sleep(eval_config.eval_interval_secs or 300)
    writer.close()
    return metrics


def _image_resizer(model_proto):
    which = model_proto.WhichOneof("model")
    return getattr(model_proto, which).image_resizer


if __name__ == "__main__":
    main()
