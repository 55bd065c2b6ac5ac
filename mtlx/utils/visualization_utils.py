"""Detection visualization (reference utils/visualization_utils.py,
SURVEY.md §3.7): PIL box/label drawing for eval image summaries."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

STANDARD_COLORS = [
    "AliceBlue", "Chartreuse", "Aqua", "Aquamarine", "Azure", "Beige",
    "Bisque", "BlanchedAlmond", "BlueViolet", "BurlyWood", "CadetBlue",
    "Crimson", "Cyan", "DarkOrange", "DeepPink", "DeepSkyBlue", "DodgerBlue",
    "FireBrick", "Gold", "GreenYellow", "HotPink", "IndianRed", "Khaki",
    "LawnGreen", "LightBlue", "LightCoral", "LightGreen", "LightPink",
    "LightSalmon", "LightSeaGreen", "LightSkyBlue", "Lime", "Magenta",
    "MediumOrchid", "MediumSpringGreen", "Orange", "OrangeRed", "Orchid",
    "PaleGreen", "Plum", "Red", "RoyalBlue", "Salmon", "SpringGreen",
    "Tomato", "Turquoise", "Violet", "Yellow", "YellowGreen",
]


def draw_bounding_box_on_image_array(
    image: np.ndarray,
    ymin: float,
    xmin: float,
    ymax: float,
    xmax: float,
    color: str = "red",
    thickness: int = 2,
    display_str: str = "",
    use_normalized_coordinates: bool = True,
) -> None:
    """Draw one box (in place) on a uint8 [H, W, 3] array."""
    from PIL import Image, ImageDraw

    pil = Image.fromarray(image)
    draw = ImageDraw.Draw(pil)
    h, w = image.shape[:2]
    if use_normalized_coordinates:
        ymin, xmin, ymax, xmax = ymin * h, xmin * w, ymax * h, xmax * w
    draw.rectangle([(xmin, ymin), (xmax, ymax)], outline=color, width=thickness)
    if display_str:
        ty = max(ymin - 12, 0)
        draw.text((xmin + 2, ty), display_str, fill=color)
    np.copyto(image, np.asarray(pil))


def visualize_boxes_and_labels_on_image_array(
    image: np.ndarray,
    boxes: np.ndarray,
    classes: np.ndarray,
    scores: Optional[np.ndarray],
    category_index: Dict[int, dict],
    use_normalized_coordinates: bool = True,
    max_boxes_to_draw: int = 20,
    min_score_thresh: float = 0.5,
    line_thickness: int = 2,
) -> np.ndarray:
    """Reference-parity entry point: draws top boxes with class + score
    labels onto `image` (modified in place, also returned)."""
    n = min(len(boxes), max_boxes_to_draw)
    for i in range(n):
        if scores is not None and scores[i] < min_score_thresh:
            continue
        cls = int(classes[i])
        name = category_index.get(cls, {}).get("name", f"id {cls}")
        label = name if scores is None else f"{name}: {int(100 * scores[i])}%"
        color = STANDARD_COLORS[cls % len(STANDARD_COLORS)]
        draw_bounding_box_on_image_array(
            image,
            *boxes[i],
            color=color,
            thickness=line_thickness,
            display_str=label,
            use_normalized_coordinates=use_normalized_coordinates,
        )
    return image
