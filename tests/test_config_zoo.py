"""Every shipped sample config parses and builds (reference parity:
samples/configs/*.config are the reference's public model zoo — a config
that no longer builds is a silent API break)."""

import glob
import os

import pytest

from mtlx.builders import model_builder, optimizer_builder
from mtlx.config import config_util

CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"
)
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.config")))


def test_zoo_nonempty():
    assert len(CONFIGS) >= 8


def test_ssd300_exact_canvas_and_anchor_count():
    """SSD300 parity: fixed_shape_resizer 300x300 computes at exactly
    300x300 (no 320 round-up) and yields the canonical 1917 anchors
    (19x19 first map with the reduced lowest layer — the reference
    ssd_mobilenet/inception 300 layouts)."""
    configs = config_util.get_configs_from_pipeline_file(
        os.path.join(CONFIG_DIR, "ssd_mobilenet_v1_voc.config")
    )
    model = model_builder.build(configs["model"], is_training=False)
    assert tuple(model.cfg.canvas_size) == (300, 300)
    assert model.anchors.shape[0] == 1917
    assert model.feature_map_shapes[0] == (19, 19)


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS]
)
def test_config_builds(path):
    configs = config_util.get_configs_from_pipeline_file(path)
    model = model_builder.build(
        configs["model"], is_training=True,
        max_gt_boxes=configs["train_config"].max_number_of_boxes or 100,
    )
    assert model is not None
    tx, lr, _ = optimizer_builder.build(
        configs["train_config"].optimizer, configs["train_config"]
    )
    assert tx is not None
    # eval-mode build too (different head wiring when MTL refine is off)
    eval_model = model_builder.build(configs["model"], is_training=False)
    assert eval_model is not None
