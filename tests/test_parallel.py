"""Mesh/sharding helpers + spatial partitioning on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from mtlx.parallel import mesh as mesh_lib
from mtlx.parallel import spatial


def test_create_mesh_for_batch_divisibility():
    m = mesh_lib.create_mesh_for_batch(6)  # 8 devices, 6 % 8 != 0 -> 6
    assert m.devices.size == 6
    m = mesh_lib.create_mesh_for_batch(16)
    assert m.devices.size == 8
    m = mesh_lib.create_mesh_for_batch(1)
    assert m.devices.size == 1


def test_shard_batch_and_replicate():
    m = mesh_lib.create_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    sharded = mesh_lib.shard_batch(m, batch)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    rep = mesh_lib.replicate(m, {"w": np.ones(3)})
    assert rep["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_spatially_sharded_backbone_matches_unsharded():
    """H-axis sharded backbone == unsharded backbone (GSPMD halo
    correctness check, SURVEY.md §6.7 stretch goal)."""
    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig

    cfg = FasterRCNNConfig(
        num_classes=3, canvas_size=(128, 64), anchor_scales=(1.0,),
        anchor_aspect_ratios=(1.0,), rpn_depth=16,
        first_stage_pre_nms_top_k=8, first_stage_max_proposals=4,
        max_gt_boxes=4, dtype=jnp.float32,
    )
    model = FasterRCNN(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    images = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (2, 128, 64, 3)), jnp.float32
    )
    mesh = spatial.create_spatial_mesh(n_data=2, n_spatial=4)
    sharded = spatial.spatially_sharded_features(model, variables, images, mesh)
    from mtlx.detector.faster_rcnn import FasterRCNNModules

    plain = model.modules.apply(variables, images, method=FasterRCNNModules.features)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(plain), rtol=2e-4, atol=2e-4
    )
