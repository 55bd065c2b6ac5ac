"""Keypoint ops + alternative backbone smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mtlx.geometry import keypoint_ops


def test_keypoint_scale_clip_roundtrip():
    kp = jnp.asarray([[[10.0, 20.0], [50.0, 80.0]]])
    scaled = keypoint_ops.scale(kp, 2.0, 0.5)
    np.testing.assert_allclose(scaled, [[[20.0, 10.0], [100.0, 40.0]]])
    clipped = keypoint_ops.clip_to_window(scaled, jnp.asarray([0.0, 0.0, 60.0, 60.0]))
    np.testing.assert_allclose(clipped, [[[20.0, 10.0], [60.0, 40.0]]])


def test_keypoint_prune_outside():
    kp = jnp.asarray([[[10.0, 10.0], [200.0, 10.0]]])
    out = keypoint_ops.prune_outside_window(kp, jnp.asarray([0.0, 0.0, 100.0, 100.0]))
    assert np.isfinite(np.asarray(out[0, 0])).all()
    assert np.isnan(np.asarray(out[0, 1])).all()


def test_keypoint_flip_with_permutation():
    # two keypoints: left(0), right(1); horizontal flip swaps identities
    kp = jnp.asarray([[[0.5, 0.2], [0.5, 0.9]]])
    flipped = keypoint_ops.flip_horizontal(kp, 0.5, flip_permutation=[1, 0])
    np.testing.assert_allclose(flipped, [[[0.5, 0.1], [0.5, 0.8]]], atol=1e-6)


def test_keypoint_change_frame_and_normalize():
    kp = jnp.asarray([[[20.0, 30.0]]])
    win = jnp.asarray([10.0, 10.0, 110.0, 210.0])
    rel = keypoint_ops.change_coordinate_frame(kp, win)
    np.testing.assert_allclose(rel, [[[0.1, 0.1]]], atol=1e-6)
    norm = keypoint_ops.to_normalized_coordinates(kp, 100.0, 300.0)
    np.testing.assert_allclose(norm, [[[0.2, 0.1]]], atol=1e-6)


def test_keypoint_rot90():
    kp = jnp.asarray([[[0.25, 0.75]]])
    np.testing.assert_allclose(keypoint_ops.rot90(kp), [[[0.25, 0.25]]])


def test_mobilenet_endpoints():
    from mtlx.backbones.mobilenet import MobileNetV1

    m = MobileNetV1(depth_multiplier=0.25, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    feats = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert feats[0].shape == (1, 4, 4, 128)  # conv11, stride 16, 512*0.25
    assert feats[1].shape == (1, 2, 2, 256)  # conv13, stride 32


def test_vgg16_feature_stride():
    from mtlx.backbones.vgg import VGG16Features

    m = VGG16Features(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 4, 4, 512)  # stride 16


def test_inception_resnet_v2_shapes():
    from mtlx.backbones.inception_resnet_v2 import (
        InceptionResnetV2BoxClassifierFeatures,
        InceptionResnetV2ProposalFeatures,
    )

    m = InceptionResnetV2ProposalFeatures(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 4, 4, 1088)  # stride 16, 1088ch
    head = InceptionResnetV2BoxClassifierFeatures(dtype=jnp.float32)
    hv = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 7, 7, 1088)))
    hout = head.apply(hv, jnp.zeros((1, 7, 7, 1088)))
    assert hout.shape == (1, 7, 7, 1536)  # stride 1 on ROI crops


def test_inception_trainable_bn_updates_stats():
    """feature_extractor.batch_norm_trainable on the inception family:
    live BN (shared param/stat names with the frozen form) updates moving
    stats under train=True and matches the frozen param tree structure."""
    import numpy as np
    from mtlx.backbones.inception_resnet_v2 import (
        InceptionResnetV2ProposalFeatures,
    )

    frozen = InceptionResnetV2ProposalFeatures(dtype=jnp.float32)
    live = InceptionResnetV2ProposalFeatures(dtype=jnp.float32,
                                             bn_trainable=True,
                                             bn_momentum=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 10
    vf = frozen.init(jax.random.PRNGKey(0), x)
    vl = live.init(jax.random.PRNGKey(0), x)
    # interchangeable checkpoints: identical tree structure both modes
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vl)
    _, mut = live.apply(vl, x, True, mutable=["batch_stats"])
    before = np.concatenate([np.ravel(l) for l in jax.tree.leaves(vl["batch_stats"])])
    after = np.concatenate([np.ravel(l) for l in jax.tree.leaves(mut["batch_stats"])])
    assert np.any(before != after), "live BN must update moving stats"
    _, mut_f = frozen.apply(vf, x, True, mutable=["batch_stats"])
    bf = np.concatenate([np.ravel(l) for l in jax.tree.leaves(vf["batch_stats"])])
    af = np.concatenate([np.ravel(l) for l in jax.tree.leaves(mut_f["batch_stats"])])
    assert np.all(bf == af), "frozen BN must not touch stats"


def test_live_batch_norm_matches_flax_batch_norm():
    """LiveBatchNorm (bf16-affine live BN — the make_norm trainable
    branch) must be numerically equivalent to flax nn.BatchNorm at f32:
    same train/eval outputs, same running-average update, same gradients
    through the batch statistics, identical variable tree. At bf16 the
    only delta is per-channel scale/offset rounding (same order as the
    output cast flax applies)."""
    import numpy as np
    import flax.linen as nn
    from mtlx.backbones.resnet import LiveBatchNorm

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 8, 8, 16), jnp.float32) * 3 + 1.5
    ref = nn.BatchNorm(momentum=0.9, epsilon=1e-3, dtype=jnp.float32)
    live = LiveBatchNorm(momentum=0.9, epsilon=1e-3, dtype=jnp.float32)
    vr = ref.init(rng, x, use_running_average=False)
    vl = live.init(rng, x, use_running_average=False)
    assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vl)

    yr, mr = ref.apply(vr, x, use_running_average=False, mutable=["batch_stats"])
    yl, ml = live.apply(vl, x, use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yl), atol=2e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mr["batch_stats"][k]), np.asarray(ml["batch_stats"][k]),
            atol=1e-6,
        )
    ye_r = ref.apply(
        {"params": vr["params"], "batch_stats": mr["batch_stats"]},
        x, use_running_average=True,
    )
    ye_l = live.apply(
        {"params": vl["params"], "batch_stats": ml["batch_stats"]},
        x, use_running_average=True,
    )
    np.testing.assert_allclose(np.asarray(ye_r), np.asarray(ye_l), atol=2e-6)

    # gradient equivalence — both the input grad and the param grads go
    # through LiveBatchNorm's hand-written custom_vjp (folded BN
    # backward); nontrivial gamma/beta so dgamma/dbeta are exercised
    params = {"scale": jnp.linspace(0.5, 1.5, 16),
              "bias": jnp.linspace(-0.3, 0.4, 16)}

    def loss(mod, stats, p, xx):
        y, _ = mod.apply({"params": p, "batch_stats": stats}, xx,
                         use_running_average=False, mutable=["batch_stats"])
        return jnp.sum(jnp.sin(y * 1.3))

    gr_p, gr_x = jax.grad(
        lambda p, xx: loss(ref, vr["batch_stats"], p, xx), argnums=(0, 1)
    )(params, x)
    gl_p, gl_x = jax.grad(
        lambda p, xx: loss(live, vl["batch_stats"], p, xx), argnums=(0, 1)
    )(params, x)
    np.testing.assert_allclose(np.asarray(gr_x), np.asarray(gl_x), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(gr_p["scale"]), np.asarray(gl_p["scale"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gr_p["bias"]), np.asarray(gl_p["bias"]),
        rtol=1e-4, atol=1e-4,
    )

    live16 = LiveBatchNorm(momentum=0.9, epsilon=1e-3, dtype=jnp.bfloat16)
    v16 = live16.init(rng, x.astype(jnp.bfloat16), use_running_average=False)
    y16, _ = live16.apply(
        v16, x.astype(jnp.bfloat16), use_running_average=False,
        mutable=["batch_stats"],
    )
    assert y16.dtype == jnp.bfloat16
    assert float(jnp.abs(y16.astype(jnp.float32) - yl).max()) < 0.1


def test_resnet_classifier_logits():
    from mtlx.backbones.resnet import ResNetClassifier

    m = ResNetClassifier(depth=50, num_classes=10, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = m.apply(v, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 10)


def test_inception_v2_endpoints():
    from mtlx.backbones.inception_v2 import InceptionV2

    m = InceptionV2(depth_multiplier=0.25, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    feats = m.apply(v, jnp.zeros((1, 128, 128, 3)))
    assert feats[0].shape[1:3] == (8, 8)   # stride 16
    assert feats[1].shape[1:3] == (4, 4)   # stride 32


def test_ssd_inception_v2_builds():
    from mtlx.detector.ssd import SSD, SSDConfig

    cfg = SSDConfig(
        num_classes=2, canvas_size=(128, 128),
        feature_extractor="ssd_inception_v2", depth_multiplier=0.25,
        max_total_detections=5, max_detections_per_class=5, dtype=jnp.float32,
    )
    model = SSD(cfg)
    v = model.init_variables(jax.random.PRNGKey(0))
    pred = model.predict(v, model.preprocess(jnp.zeros((1, 128, 128, 3))))
    assert pred["anchors"].shape[0] == pred["box_encodings"].shape[1]


def test_faster_rcnn_inception_v2_builds():
    import jax.numpy as jnp

    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig

    cfg = FasterRCNNConfig(
        num_classes=2, canvas_size=(64, 64), backbone="inception_v2",
        anchor_scales=(1.0,), anchor_aspect_ratios=(1.0,), rpn_depth=16,
        first_stage_pre_nms_top_k=8, first_stage_max_proposals=4,
        second_stage_batch_size=4, max_gt_boxes=4, dtype=jnp.float32,
    )
    model = FasterRCNN(cfg)
    v = model.init_variables(jax.random.PRNGKey(0))
    images = model.preprocess(jnp.zeros((1, 64, 64, 3)))
    ts = jnp.asarray([[64, 64]])
    det = model.postprocess(model.predict(v, images, ts, training=False), ts)
    assert np.isfinite(np.asarray(det["detection_boxes"])).all()


def test_inception_v3_endpoints_and_classifier():
    from mtlx.backbones.inception_v3 import (
        InceptionV3Classifier,
        InceptionV3Features,
    )

    m = InceptionV3Features(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ep16, final = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert ep16.shape == (1, 4, 4, 768)  # Mixed_6e, stride 16
    assert final.shape == (1, 2, 2, 2048)  # Mixed_7c, stride 32
    c = InceptionV3Classifier(num_classes=7, dtype=jnp.float32)
    cv = c.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = c.apply(cv, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 7)


def test_inception_v1_and_alexnet():
    from mtlx.backbones.alexnet import AlexNetClassifier
    from mtlx.backbones.inception_v1 import InceptionV1Features

    m = InceptionV1Features(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ep16, final = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert ep16.shape == (1, 4, 4, 832)
    assert final.shape == (1, 2, 2, 1024)
    a = AlexNetClassifier(num_classes=5, dtype=jnp.float32)
    av = a.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    out = a.apply(av, jnp.zeros((2, 224, 224, 3)))
    assert out.shape == (2, 5)


def test_inception_v4_endpoints():
    from mtlx.backbones.inception_v4 import InceptionV4Features

    m = InceptionV4Features(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ep16, final = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert ep16.shape == (1, 4, 4, 1024)
    assert final.shape == (1, 2, 2, 1536)


def test_conv0_space_to_depth_exact():
    """The space-to-depth stem equals the plain 7x7/2 conv bit-for-bit in
    fp32 (same params; even and odd canvases; batch > 1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from mtlx.backbones.resnet import SpaceToDepthConv1

    rng = jax.random.PRNGKey(0)
    mod = SpaceToDepthConv1(64, dtype=jnp.float32)
    for hw in ((64, 64), (64, 96), (63, 64)):  # odd H exercises fallback
        x = jax.random.normal(jax.random.fold_in(rng, hw[0]),
                              (2, hw[0], hw[1], 3), jnp.float32)
        v = mod.init(rng, x)
        out = mod.apply(v, x)
        ref = lax.conv_general_dilated(
            x, v["params"]["kernel"], window_strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        assert out.shape == ref.shape, hw
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_conv0_space_to_depth_checkpoint_compatible():
    """Param tree of the stem is unchanged: conv1/kernel (7,7,3,64), so
    converted TF checkpoints restore into either stem form."""
    import jax
    import jax.numpy as jnp

    from mtlx.backbones.resnet import ResNetProposalFeatures

    x = jnp.zeros((1, 64, 64, 3))
    a = ResNetProposalFeatures(50, jnp.float32, conv0_space_to_depth=True)
    b = ResNetProposalFeatures(50, jnp.float32, conv0_space_to_depth=False)
    va = a.init(jax.random.PRNGKey(0), x)
    vb = b.init(jax.random.PRNGKey(0), x)
    sa = jax.tree.map(lambda t: t.shape, va)
    sb = jax.tree.map(lambda t: t.shape, vb)
    assert sa == sb
    # identical outputs with shared params
    ya = a.apply(va, x)
    yb = b.apply(va, x)
    import numpy as np

    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-5, atol=1e-5)
