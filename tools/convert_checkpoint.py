"""Convert TF checkpoints (slim classification or TF-OD-API detection) to
mtlx warm-start checkpoints (SURVEY.md §8 phase-1 item 5: "weight
conversion from TF checkpoints is a utility to write").

  python tools/convert_checkpoint.py --tf_checkpoint=/ckpt/resnet_v1_50.ckpt \
      --type=classification --depth=50 --output=/ckpt/mtlx_r50_backbone

  python tools/convert_checkpoint.py --tf_checkpoint=/ckpt/model.ckpt \
      --type=detection --depth=50 --output=/ckpt/mtlx_frcnn

The output is an orbax variables checkpoint consumed by
`train_config.fine_tune_checkpoint` (+ `from_detection_checkpoint`).

Name mapping notes:
  * slim `resnet_v1_XX/blockB/unit_U/bottleneck_v1/{conv1..3,shortcut}` ->
    mtlx `backbone/blockB/unitU/{conv1..3,conv_shortcut}` (+ per-conv BN)
  * TF conv weights are [H, W, in, out] like flax — no transpose needed;
    BatchNorm gamma/beta -> scale/bias params, moving_{mean,variance} ->
    batch_stats mean/var
  * stride placement differs (slim strides the LAST unit of a stage, mtlx
    the FIRST); kernel shapes are identical so weights convert 1:1, but
    activations are not bit-equal — fine-tuning is expected after
    conversion (documented deviation).
"""

from __future__ import annotations

import argparse
import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _set(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = np.asarray(value)


def map_slim_resnet_name(name: str, depth: int):
    """slim variable name -> (collection, mtlx path) or None."""
    prefix = f"resnet_v1_{depth}/"
    for strip in ("FirstStageFeatureExtractor/", "SecondStageFeatureExtractor/"):
        if name.startswith(strip):
            name = name[len(strip):]
    if not name.startswith(prefix):
        return None
    name = name[len(prefix):]

    def bn_leaf(leaf):
        return {
            "gamma": ("params", "scale"),
            "beta": ("params", "bias"),
            "moving_mean": ("batch_stats", "mean"),
            "moving_variance": ("batch_stats", "var"),
        }.get(leaf)

    # stem: conv1/weights, conv1/BatchNorm/*
    m = re.match(r"conv1/weights$", name)
    if m:
        return "params", ("backbone", "conv1", "kernel")
    m = re.match(r"conv1/BatchNorm/(\w+)$", name)
    if m:
        mapped = bn_leaf(m.group(1))
        if mapped:
            return mapped[0], ("backbone", "bn1", mapped[1])
        return None
    # blocks
    m = re.match(
        r"block(\d)/unit_(\d+)/bottleneck_v1/(conv1|conv2|conv3|shortcut)"
        r"/(weights|BatchNorm/(\w+))$",
        name,
    )
    if m:
        block, unit, conv, leaf, bn = m.groups()
        root = "classifier_backbone" if block == "4" else "backbone"
        conv_name = "conv_shortcut" if conv == "shortcut" else conv
        bn_name = {
            "conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
            "shortcut": "bn_shortcut",
        }[conv]
        base = (root, f"block{block}", f"unit{unit}")
        if leaf == "weights":
            return "params", base + (conv_name, "kernel")
        mapped = bn_leaf(bn)
        if mapped:
            return mapped[0], base + (bn_name, mapped[1])
    return None


def map_slim_mobilenet_name(name: str, depth: int = 0):
    """slim MobilenetV1 classification checkpoint -> mtlx SSD backbone
    (`MobilenetV1/Conv2d_{i}_{depthwise,pointwise}` -> `backbone/
    conv{i}_{dw,pw}`). Depthwise kernels transpose [H,W,C,1]->[H,W,1,C]
    (slim depthwise layout vs flax feature_group_count layout)."""
    prefix = "MobilenetV1/"
    if not name.startswith(prefix):
        return None
    name = name[len(prefix):]

    def bn_leaf(leaf):
        return {
            "gamma": ("params", "scale"),
            "beta": ("params", "bias"),
            "moving_mean": ("batch_stats", "mean"),
            "moving_variance": ("batch_stats", "var"),
        }.get(leaf)

    m = re.match(r"Conv2d_0/weights$", name)
    if m:
        return "params", ("backbone", "conv0", "kernel")
    m = re.match(r"Conv2d_0/BatchNorm/(\w+)$", name)
    if m:
        mapped = bn_leaf(m.group(1))
        if mapped:
            return mapped[0], ("backbone", "conv0_bn", mapped[1])
        return None
    m = re.match(
        r"Conv2d_(\d+)_(depthwise|pointwise)/"
        r"(depthwise_weights|weights|BatchNorm/(\w+))$",
        name,
    )
    if m:
        i, kind, leaf, bn = m.groups()
        suffix = "dw" if kind == "depthwise" else "pw"
        base = ("backbone", f"conv{i}_{suffix}")
        if leaf == "depthwise_weights":
            # [H, W, C, 1] -> [H, W, 1, C]
            return "params", base + ("kernel",), lambda v: np.transpose(
                v, (0, 1, 3, 2)
            )
        if leaf == "weights":
            return "params", base + ("kernel",)
        mapped = bn_leaf(bn)
        if mapped:
            return mapped[0], ("backbone", f"conv{i}_{suffix}_bn", mapped[1])
    return None


def map_od_api_name(name: str, depth: int):
    """TF OD API detection-checkpoint names (RPN + box predictor heads)."""
    mapped = map_slim_resnet_name(name, depth)
    if mapped:
        return mapped
    table = {
        "Conv/weights": ("params", ("rpn", "conv", "kernel")),
        "Conv/biases": ("params", ("rpn", "conv", "bias")),
        "FirstStageBoxPredictor/ClassPredictor/weights":
            ("params", ("rpn", "objectness", "kernel")),
        "FirstStageBoxPredictor/ClassPredictor/biases":
            ("params", ("rpn", "objectness", "bias")),
        "FirstStageBoxPredictor/BoxEncodingPredictor/weights":
            ("params", ("rpn", "box_encodings", "kernel")),
        "FirstStageBoxPredictor/BoxEncodingPredictor/biases":
            ("params", ("rpn", "box_encodings", "bias")),
        "SecondStageBoxPredictor/ClassPredictor/weights":
            ("params", ("box_predictor", "class_logits", "kernel")),
        "SecondStageBoxPredictor/ClassPredictor/biases":
            ("params", ("box_predictor", "class_logits", "bias")),
        "SecondStageBoxPredictor/BoxEncodingPredictor/weights":
            ("params", ("box_predictor", "box_refinement", "kernel")),
        "SecondStageBoxPredictor/BoxEncodingPredictor/biases":
            ("params", ("box_predictor", "box_refinement", "bias")),
    }
    return table.get(name)


def convert(tf_checkpoint: str, ckpt_type: str, depth: int,
            arch: str = "resnet"):
    import tensorflow as tf

    reader = tf.train.load_checkpoint(tf_checkpoint)
    shapes = reader.get_variable_to_shape_map()
    params: dict = {}
    batch_stats: dict = {}
    if arch == "mobilenet_v1":
        mapper = map_slim_mobilenet_name
    elif ckpt_type == "classification":
        mapper = map_slim_resnet_name
    else:
        mapper = map_od_api_name
    converted = skipped = 0
    for name in sorted(shapes):
        if any(s in name for s in ("Momentum", "RMSProp", "Adam", "global_step",
                                   "ExponentialMovingAverage")):
            continue
        mapped = mapper(name, depth)
        if mapped is None:
            skipped += 1
            continue
        if len(mapped) == 3:
            collection, path, transform = mapped
        else:
            collection, path = mapped
            transform = None
        value = reader.get_tensor(name)
        if transform is not None:
            value = transform(value)
        if collection == "params":
            _set(params, path, value)
        else:
            _set(batch_stats, path, value)
        converted += 1
    return {"params": params, "batch_stats": batch_stats}, converted, skipped


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tf_checkpoint", required=True)
    p.add_argument("--type", dest="ckpt_type", default="classification",
                   choices=["classification", "detection"])
    p.add_argument("--arch", default="resnet",
                   choices=["resnet", "mobilenet_v1"],
                   help="source network family (mobilenet_v1: slim "
                        "MobilenetV1 classification checkpoints for SSD "
                        "backbone warm start)")
    p.add_argument("--depth", type=int, default=50, choices=[50, 101, 152])
    p.add_argument("--output", required=True)
    args = p.parse_args()

    variables, converted, skipped = convert(
        args.tf_checkpoint, args.ckpt_type, args.depth, args.arch
    )
    from mtlx.train.checkpoints import save_variables

    save_variables(args.output, variables)
    print(f"converted {converted} tensors ({skipped} unmapped) -> {args.output}")
    print("use with train_config.fine_tune_checkpoint + "
          f"from_detection_checkpoint: {str(args.ckpt_type == 'detection').lower()}")


if __name__ == "__main__":
    main()
