"""Pascal VOC dataset utilities (reference create_pascal_tf_record.py +
utils/dataset_util.py, SURVEY.md §3.5/§4.5): XML annotation parsing and
TFRecord creation. The CLI wrapper lives in tools/create_pascal_tf_record.py."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np

from mtlx.data import tfrecord
from mtlx.data.example_decoder import build_example
from mtlx.utils import label_map_util

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def recursive_parse_xml_to_dict(node) -> Dict:
    """ElementTree node -> nested dict (reference dataset_util helper;
    repeated 'object' children become a list)."""
    if len(node) == 0:
        return {node.tag: node.text}
    result: Dict = {}
    for child in node:
        child_dict = recursive_parse_xml_to_dict(child)
        if child.tag == "object":
            result.setdefault("object", []).append(child_dict["object"])
        else:
            result[child.tag] = child_dict[child.tag]
    return {node.tag: result}


def parse_annotation(xml_path: str) -> Dict:
    tree = ET.parse(xml_path)
    return recursive_parse_xml_to_dict(tree.getroot())["annotation"]


def annotation_to_example(
    data: Dict,
    image_bytes: bytes,
    label_map: Dict[str, int],
    ignore_difficult_instances: bool = False,
):
    width = int(data["size"]["width"])
    height = int(data["size"]["height"])
    boxes, labels, texts, difficult, truncated, poses = [], [], [], [], [], []
    for obj in data.get("object", []):
        diff = int(obj.get("difficult", 0) or 0)
        if ignore_difficult_instances and diff:
            continue
        name = obj["name"]
        bb = obj["bndbox"]
        boxes.append(
            [
                float(bb["ymin"]) / height,
                float(bb["xmin"]) / width,
                float(bb["ymax"]) / height,
                float(bb["xmax"]) / width,
            ]
        )
        labels.append(label_map[name])
        texts.append(name)
        difficult.append(diff)
        truncated.append(int(obj.get("truncated", 0) or 0))
        poses.append((obj.get("pose", "Unspecified") or "Unspecified").encode())
    boxes = np.asarray(boxes, np.float32) if boxes else np.zeros((0, 4), np.float32)
    return build_example(
        encoded_image=image_bytes,
        image_format=b"jpeg",
        height=height,
        width=width,
        filename=data.get("filename", ""),
        boxes_norm=boxes,
        class_labels=labels,
        class_texts=texts,
        difficult=difficult,
        truncated=truncated,
        poses=poses,
    )


def create_voc_tf_record(
    data_dir: str,
    output_path: str,
    split: str = "train",
    year: str = "VOC2007",
    label_map_path: Optional[str] = None,
    ignore_difficult_instances: bool = False,
) -> int:
    """Walk a VOCdevkit layout and write a TFRecord; returns example count."""
    if label_map_path:
        label_map = label_map_util.get_label_map_dict(label_map_path)
    else:
        label_map = {name: i + 1 for i, name in enumerate(VOC_CLASSES)}
    root = os.path.join(data_dir, year)
    list_path = os.path.join(root, "ImageSets", "Main", f"{split}.txt")
    with open(list_path) as f:
        ids = [line.strip().split()[0] for line in f if line.strip()]
    count = 0
    with tfrecord.TFRecordWriter(output_path) as writer:
        for example_id in ids:
            xml_path = os.path.join(root, "Annotations", f"{example_id}.xml")
            data = parse_annotation(xml_path)
            img_path = os.path.join(root, "JPEGImages", data["filename"])
            with open(img_path, "rb") as f:
                image_bytes = f.read()
            ex = annotation_to_example(
                data, image_bytes, label_map, ignore_difficult_instances
            )
            writer.write(ex.SerializeToString())
            count += 1
    return count


def write_voc_label_map(path: str):
    with open(path, "w") as f:
        for i, name in enumerate(VOC_CLASSES):
            f.write(f"item {{\n  id: {i + 1}\n  name: '{name}'\n}}\n\n")
