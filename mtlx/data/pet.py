"""Oxford-IIIT Pet dataset -> TFRecord (reference
create_pet_tf_record.py, SURVEY.md §3.5 secondary dataset writers).

Pet layout: images/<Breed>_<n>.jpg, annotations/xmls/<Breed>_<n>.xml
(VOC-format XML whose object name is just cat/dog), annotations/
{trainval,test}.txt example lists. As in the reference, the class is the
breed parsed from the FILENAME (not the XML object name), keeping the
dataset's capitalization (cat breeds capitalized, dog breeds lowercase).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import numpy as np

from mtlx.data import tfrecord
from mtlx.data.example_decoder import build_example
from mtlx.data.voc import parse_annotation
from mtlx.utils import label_map_util

# the 37 breeds, dataset capitalization (reference data/pet_label_map.pbtxt)
PET_CLASSES = (
    "Abyssinian", "american_bulldog", "american_pit_bull_terrier",
    "basset_hound", "beagle", "Bengal", "Birman", "Bombay", "boxer",
    "British_Shorthair", "chihuahua", "Egyptian_Mau",
    "english_cocker_spaniel", "english_setter", "german_shorthaired",
    "great_pyrenees", "havanese", "japanese_chin", "keeshond", "leonberger",
    "Maine_Coon", "miniature_pinscher", "newfoundland", "Persian",
    "pomeranian", "pug", "Ragdoll", "Russian_Blue", "saint_bernard",
    "samoyed", "scottish_terrier", "shiba_inu", "Siamese", "Sphynx",
    "staffordshire_bull_terrier", "wheaten_terrier", "yorkshire_terrier",
)

_FILENAME_RE = re.compile(r"([A-Za-z_]+)_[0-9]+\.(jpg|jpeg|png)", re.IGNORECASE)


def get_class_name_from_filename(file_name: str) -> str:
    """'Abyssinian_100.jpg' -> 'Abyssinian' (reference helper)."""
    m = _FILENAME_RE.match(os.path.basename(file_name))
    if not m:
        raise ValueError(f"cannot parse breed from {file_name!r}")
    return m.groups()[0]


def pet_annotation_to_example(
    data: Dict,
    image_bytes: bytes,
    label_map: Dict[str, int],
    ignore_difficult_instances: bool = False,
):
    """Like voc.annotation_to_example but the class comes from the
    filename breed for every object (reference dict_to_tf_example)."""
    width = int(data["size"]["width"])
    height = int(data["size"]["height"])
    class_name = get_class_name_from_filename(data["filename"])
    boxes, labels, texts, difficult, truncated, poses = [], [], [], [], [], []
    for obj in data.get("object", []):
        diff = int(obj.get("difficult", 0) or 0)
        if ignore_difficult_instances and diff:
            continue
        bb = obj["bndbox"]
        boxes.append(
            [
                float(bb["ymin"]) / height,
                float(bb["xmin"]) / width,
                float(bb["ymax"]) / height,
                float(bb["xmax"]) / width,
            ]
        )
        labels.append(label_map[class_name])
        texts.append(class_name)
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


def create_pet_tf_record(
    data_dir: str,
    output_path: str,
    split: str = "trainval",
    label_map_path: Optional[str] = None,
    ignore_difficult_instances: bool = False,
) -> int:
    """Walk the pet layout and write a TFRecord; returns example count.
    Examples whose XML is missing are skipped (the dataset annotates only
    a subset — reference behavior)."""
    if label_map_path:
        label_map = label_map_util.get_label_map_dict(label_map_path)
    else:
        label_map = {name: i + 1 for i, name in enumerate(PET_CLASSES)}
    list_path = os.path.join(data_dir, "annotations", f"{split}.txt")
    with open(list_path) as f:
        ids = [line.strip().split()[0] for line in f if line.strip()]
    count = 0
    with tfrecord.TFRecordWriter(output_path) as writer:
        for example_id in ids:
            xml_path = os.path.join(data_dir, "annotations", "xmls",
                                    f"{example_id}.xml")
            if not os.path.exists(xml_path):
                continue
            data = parse_annotation(xml_path)
            img_path = os.path.join(data_dir, "images", data["filename"])
            with open(img_path, "rb") as f:
                image_bytes = f.read()
            ex = pet_annotation_to_example(
                data, image_bytes, label_map, ignore_difficult_instances
            )
            writer.write(ex.SerializeToString())
            count += 1
    return count


def write_pet_label_map(path: str):
    with open(path, "w") as f:
        for i, name in enumerate(PET_CLASSES):
            f.write(f"item {{\n  id: {i + 1}\n  name: '{name}'\n}}\n\n")
