"""Label map utilities (reference utils/label_map_util.py, SURVEY.md §3.7).

Label maps are StringIntLabelMap text protos; ids start at 1 (0 =
background). Internally the framework uses 0-based class indices = id - 1.
"""

from __future__ import annotations

from typing import Dict, List

from google.protobuf import text_format

from mtlx.config.protos import string_int_label_map_pb2


def load_labelmap(path: str):
    label_map = string_int_label_map_pb2.StringIntLabelMap()
    with open(path, "r") as f:
        text_format.Parse(f.read(), label_map)
    for item in label_map.item:
        if item.id < 1:
            raise ValueError(f"label map ids must be >= 1, got {item.id}")
    return label_map


def get_label_map_dict(path: str, use_display_name: bool = False) -> Dict[str, int]:
    """name -> id (1-based), reference get_label_map_dict."""
    label_map = load_labelmap(path)
    return {
        (item.display_name if use_display_name else item.name): item.id
        for item in label_map.item
    }


def create_category_index(categories: List[dict]) -> Dict[int, dict]:
    return {cat["id"]: cat for cat in categories}


def convert_label_map_to_categories(
    label_map, max_num_classes: int, use_display_name: bool = True
) -> List[dict]:
    categories = []
    for item in label_map.item:
        if not 0 < item.id <= max_num_classes:
            continue
        name = (
            item.display_name
            if use_display_name and item.HasField("display_name")
            else item.name
        )
        categories.append({"id": item.id, "name": name})
    return categories


def create_category_index_from_labelmap(path: str) -> Dict[int, dict]:
    label_map = load_labelmap(path)
    max_id = max((item.id for item in label_map.item), default=0)
    return create_category_index(
        convert_label_map_to_categories(label_map, max_id)
    )
