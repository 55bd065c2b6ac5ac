"""Mesh/sharding helpers + spatial partitioning on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from mtlx.parallel import mesh as mesh_lib
from mtlx.parallel import spatial
import pytest


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


@pytest.mark.smoke
def test_spatial_train_step_matches_data_parallel():
    """FULL train step under the 2-D (data, spatial) mesh == plain DP step
    (losses and updated params), i.e. spatial partitioning covers the
    whole program — backbone, RPN, sampling, second stage, aux heads,
    losses, gradients — not just the backbone forward."""
    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig, MTLConfig
    from mtlx.train.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = FasterRCNNConfig(
        num_classes=3, canvas_size=(64, 64), anchor_scales=(0.5, 1.0),
        anchor_aspect_ratios=(1.0,), anchor_base_size=(32.0, 32.0),
        rpn_depth=16, first_stage_pre_nms_top_k=16,
        first_stage_max_proposals=8, first_stage_minibatch_size=16,
        second_stage_batch_size=8, max_gt_boxes=4, dtype=jnp.float32,
        mtl=MTLConfig(multiobject=True, closeness=True, foreground=True),
    )
    model = FasterRCNN(cfg)
    tx = make_optimizer(learning_rate=0.01)
    state = create_train_state(model, jax.random.PRNGKey(0), tx)

    rs = np.random.RandomState(0)
    b, g = 2, 4
    batch = {
        "image": rs.uniform(0, 255, (b, 64, 64, 3)).astype(np.float32),
        "true_shape": np.tile([[64, 64]], (b, 1)).astype(np.int32),
        "gt_boxes": np.tile(
            np.asarray([[[8, 8, 40, 40], [20, 28, 56, 60],
                         [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32),
            (b, 1, 1),
        ),
        "gt_classes": np.zeros((b, g), np.int32),
        "gt_mask": np.tile(np.asarray([[True, True, False, False]]), (b, 1)),
    }
    rng = jax.random.PRNGKey(1)

    # plain DP on a 2-device mesh
    dp_mesh = mesh_lib.create_mesh(jax.devices()[:2])
    dp_state = mesh_lib.replicate(dp_mesh, state)
    dp_step = jax.jit(make_train_step(model))
    dp_new, dp_metrics = dp_step(
        dp_state, mesh_lib.shard_batch(dp_mesh, batch), rng
    )

    # same batch under (data=2, spatial=4)
    smesh = spatial.create_spatial_mesh(n_data=2, n_spatial=4)
    sp_state = jax.device_put(state, spatial.replicated(smesh))
    sp_step = spatial.make_spatial_train_step(model, smesh)
    sp_new, sp_metrics = sp_step(
        sp_state, spatial.shard_batch_spatial(smesh, batch), rng
    )

    np.testing.assert_allclose(
        float(sp_metrics["total_loss"]), float(dp_metrics["total_loss"]),
        rtol=2e-4, atol=2e-4,
    )
    dl = jax.tree_util.tree_leaves(dp_new.params)
    sl = jax.tree_util.tree_leaves(sp_new.params)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b_))))
        for a, b_ in zip(dl, sl)
    )
    assert worst < 2e-4, worst


def test_spatial_train_step_on_bucketed_batch():
    """SP shards the image H axis of whatever compute bucket arrives:
    a 128-row bucket on a 256-canvas model splits 32 rows/shard and the
    loss matches the unsharded bucketed step."""
    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from mtlx.train.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
        pad_for_model,
    )

    cfg = FasterRCNNConfig(
        num_classes=3, canvas_size=(256, 256), anchor_scales=(0.5, 1.0),
        anchor_aspect_ratios=(1.0,), anchor_base_size=(32.0, 32.0),
        rpn_depth=16, first_stage_pre_nms_top_k=16,
        first_stage_max_proposals=8, first_stage_minibatch_size=16,
        second_stage_batch_size=8, max_gt_boxes=4, dtype=jnp.float32,
    )
    model = FasterRCNN(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0), make_optimizer(0.01)
    )
    rs = np.random.RandomState(0)
    b = 2
    batch = pad_for_model(model, {
        "image": rs.uniform(0, 255, (b, 120, 200, 3)).astype(np.float32),
        "true_shape": np.tile([[120, 200]], (b, 1)).astype(np.int32),
        "gt_boxes": np.tile(
            np.asarray([[[8, 8, 40, 40], [20, 28, 56, 60],
                         [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32),
            (b, 1, 1),
        ),
        "gt_classes": np.zeros((b, 4), np.int32),
        "gt_mask": np.tile(np.asarray([[True, True, False, False]]), (b, 1)),
    })
    assert batch["image"].shape[1:3] == (128, 256)
    rng = jax.random.PRNGKey(1)

    plain = jax.jit(make_train_step(model))
    _, ref_metrics = plain(state, batch, rng)

    smesh = spatial.create_spatial_mesh(n_data=2, n_spatial=4)
    sp_state = jax.device_put(state, spatial.replicated(smesh))
    sp_step = spatial.make_spatial_train_step(model, smesh)
    _, sp_metrics = sp_step(
        sp_state, spatial.shard_batch_spatial(smesh, batch), rng
    )
    np.testing.assert_allclose(
        float(sp_metrics["total_loss"]), float(ref_metrics["total_loss"]),
        rtol=2e-4, atol=2e-4,
    )


def test_hybrid_multislice_mesh_matches_flat_dp():
    """Multi-slice DP: the (DCN, ICI) hybrid mesh runs the identical
    program with batch sharded over BOTH axes, and must produce the same
    loss and updated params as the flat 1-D data mesh over the same
    devices (SURVEY.md §3.9/§6.8 multi-slice story — hierarchical
    all-reduce is an XLA scheduling detail, not a semantics change)."""
    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from mtlx.train.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = FasterRCNNConfig(
        num_classes=3, canvas_size=(64, 64), anchor_scales=(0.5, 1.0),
        anchor_aspect_ratios=(1.0,), anchor_base_size=(32.0, 32.0),
        rpn_depth=16, first_stage_pre_nms_top_k=16,
        first_stage_max_proposals=8, first_stage_minibatch_size=16,
        second_stage_batch_size=8, max_gt_boxes=4, dtype=jnp.float32,
    )
    model = FasterRCNN(cfg)
    tx = make_optimizer(learning_rate=0.01)
    state = create_train_state(model, jax.random.PRNGKey(0), tx)

    rs = np.random.RandomState(1)
    b, g = 8, 4
    batch = {
        "image": rs.uniform(0, 255, (b, 64, 64, 3)).astype(np.float32),
        "true_shape": np.tile([[64, 64]], (b, 1)).astype(np.int32),
        "gt_boxes": np.tile(
            np.asarray([[[8, 8, 40, 40], [20, 28, 56, 60],
                         [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32),
            (b, 1, 1),
        ),
        "gt_classes": np.zeros((b, g), np.int32),
        "gt_mask": np.tile(np.asarray([[True, True, False, False]]), (b, 1)),
    }
    rng = jax.random.PRNGKey(2)
    step = make_train_step(model)

    flat_mesh = mesh_lib.create_mesh(jax.devices()[:8])
    f_new, f_metrics = jax.jit(step)(
        mesh_lib.replicate(flat_mesh, state),
        mesh_lib.shard_batch(flat_mesh, batch), rng,
    )

    hmesh = mesh_lib.create_hybrid_mesh(num_slices=2,
                                        devices=jax.devices()[:8])
    assert hmesh.axis_names == (mesh_lib.DCN_AXIS, mesh_lib.DATA_AXIS)
    assert hmesh.devices.shape == (2, 4)
    h_new, h_metrics = jax.jit(step)(
        mesh_lib.replicate(hmesh, state),
        mesh_lib.shard_batch(hmesh, batch), rng,
    )

    np.testing.assert_allclose(
        float(h_metrics["total_loss"]), float(f_metrics["total_loss"]),
        rtol=2e-4, atol=2e-4,
    )
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(c))))
        for a, c in zip(jax.tree_util.tree_leaves(f_new.params),
                        jax.tree_util.tree_leaves(h_new.params))
    )
    assert worst < 2e-4, worst


def test_create_hybrid_mesh_validation():
    import pytest

    devs = jax.devices()[:8]
    with pytest.raises(ValueError, match="slice"):
        mesh_lib.create_hybrid_mesh(num_slices=3, devices=devs)
    with pytest.raises(ValueError, match="num_slices"):
        mesh_lib.create_hybrid_mesh(devices=devs)  # CPUs have no slice_index


def test_multiprocess_dp_params_identical(tmp_path):
    """True 2-process data parallelism (SURVEY.md §3.9 multi-host DP row):
    2 subprocesses x 2 virtual CPU devices each, jax.distributed against a
    localhost coordinator, each process feeding its process_index shard
    through the real loader. Post-step params must be identical across the
    two processes and match a single-process 4-device run on the same
    global batch (in-suite version of the driver dryrun's stage 5, so a
    regression is caught on every suite run, not only in the driver
    artifact)."""
    import pickle
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    import __graft_entry__ as g

    from mtlx.train.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    n_devices, global_batch = 4, 8
    model = g._flagship(canvas=(64, 64), dtype=jnp.float32, **g._TINY_KW)
    tx = make_optimizer(learning_rate=0.01)
    state0 = create_train_state(model, jax.random.PRNGKey(0), tx)
    state0 = jax.tree_util.tree_map(np.asarray, state0)

    records = str(tmp_path / "synthetic.record")
    g._write_synthetic_records(records, n=global_batch)
    state_path = str(tmp_path / "state0.pkl")
    with open(state_path, "wb") as f:
        pickle.dump(state0.replace(tx=None), f)

    children = g._spawn_mp_children(
        n_devices, records, global_batch, state_path
    )
    mesh = mesh_lib.create_mesh(jax.devices()[:n_devices])
    ref_step = jax.jit(
        make_train_step(model),
        in_shardings=(
            mesh_lib.replicated(mesh),
            mesh_lib.batch_sharding(mesh),
            mesh_lib.replicated(mesh),
        ),
    )
    # raises on child failure, process disagreement, or mismatch vs the
    # single-process reference
    g._collect_mp_children(
        children, n_devices, records, global_batch, ref_step, state0
    )
