"""Host-side variable-size geometry augmentation (crop/pad family with a
keep-aspect resizer): the host draws the geometry, rewrites
true_shape/boxes to the post-crop keep-aspect shape, and the device
materializes the pixels with one window-resample
(preprocessor.apply_host_window). Mirrors the reference's crop-then-
resize pipeline semantics (SURVEY.md §3.1 preprocessor + §4.1 input flow)
that static device-side shapes cannot express."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from mtlx.data.host_geometry import (
    AUG_FIELDS,
    HostGeometry,
    split_host_geometry,
)
from mtlx.data.loader import keep_aspect_target
from mtlx.data import preprocessor as prep


def make_sample(pre_h=60, pre_w=100, canvas=(128, 128), boxes=None,
                nmax=4, orig=(120, 200)):
    gt = np.zeros((nmax, 4), np.float32)
    m = np.zeros((nmax,), bool)
    boxes = boxes if boxes is not None else [[10, 10, 40, 50], [20, 60, 50, 90]]
    for i, b in enumerate(boxes):
        gt[i] = b
        m[i] = True
    rs = np.random.RandomState(0)
    img = np.zeros(canvas + (3,), np.uint8)
    img[:pre_h, :pre_w] = rs.randint(1, 255, (pre_h, pre_w, 3))
    return {
        "image": img,
        "true_shape": np.asarray([pre_h, pre_w], np.int32),
        "original_shape": np.asarray(orig, np.int32),
        "gt_boxes": gt,
        "gt_classes": np.zeros((nmax,), np.int32),
        "gt_difficult": np.zeros((nmax,), np.int32),
        "gt_group_of": np.zeros((nmax,), np.int32),
        "gt_mask": m,
    }


def test_split_routes_by_resizer():
    opts = [("random_horizontal_flip", {}), ("random_crop_image", {}),
            ("random_adjust_brightness", {}), ("ssd_random_crop", {})]
    host, device = split_host_geometry(opts, ("keep_aspect", {}))
    assert [n for n, _ in host] == ["random_crop_image", "ssd_random_crop"]
    assert [n for n, _ in device] == ["random_horizontal_flip",
                                      "random_adjust_brightness"]
    host, device = split_host_geometry(opts, ("fixed", {}))
    assert host == [] and len(device) == 4


def test_identity_when_crop_never_fires():
    hg = HostGeometry([("random_crop_image", {"random_coef": 1.0})],
                      60, 100, (128, 128))
    s = make_sample()
    out = hg(s, np.random.default_rng(0))
    np.testing.assert_array_equal(out["true_shape"], s["true_shape"])
    np.testing.assert_allclose(out["gt_boxes"], s["gt_boxes"], atol=1e-5)
    np.testing.assert_array_equal(out["gt_mask"], s["gt_mask"])
    np.testing.assert_array_equal(out["aug_window"], [0, 0, 60, 100])
    np.testing.assert_array_equal(out["pack_shape"], [60, 100])
    # the device resample of the identity window is exactly the image
    res = prep.apply_host_window(
        jnp.asarray(s["image"], jnp.float32),
        jnp.asarray(out["true_shape"]),
        jnp.asarray(out["aug_window"]),
        jnp.asarray(out["aug_src_shape"]),
        jnp.asarray(out["aug_pad_color"]),
    )
    np.testing.assert_allclose(
        np.asarray(res), s["image"].astype(np.float32), atol=1e-4
    )


def test_crop_geometry_and_box_transform():
    hg = HostGeometry(
        [("random_crop_image", {"min_object_covered": 1.0,
                                "min_area": 0.3, "max_area": 0.8,
                                "overlap_thresh": 0.3})],
        60, 100, (128, 128),
    )
    fired = 0
    for seed in range(20):
        s = make_sample()
        out = hg(s, np.random.default_rng(seed))
        w = out["aug_window"].astype(np.float64)
        wh, ww = w[2] - w[0], w[3] - w[1]
        # crop windows stay inside the source true region
        assert w[0] >= -1e-6 and w[1] >= -1e-6
        assert w[2] <= 60 + 1e-6 and w[3] <= 100 + 1e-6
        fh, fw = out["true_shape"]
        if (wh, ww) == (60.0, 100.0):
            continue  # rejection fallback kept the image
        fired += 1
        # final shape follows the keep-aspect rule on the window dims
        assert (fh, fw) == keep_aspect_target(wh, ww, 60, 100)
        # min_object_covered=1.0: some groundtruth box lies fully inside
        ins = [
            i for i in range(2)
            if s["gt_boxes"][i][0] >= w[0] - 1e-6
            and s["gt_boxes"][i][1] >= w[1] - 1e-6
            and s["gt_boxes"][i][2] <= w[2] + 1e-6
            and s["gt_boxes"][i][3] <= w[3] + 1e-6
        ]
        assert ins, (w, s["gt_boxes"])
        # surviving boxes = clip-to-window, shift, scale
        sy, sx = fh / wh, fw / ww
        for i in range(2):
            if not out["gt_mask"][i]:
                continue
            b = s["gt_boxes"][i].astype(np.float64)
            clipped = [max(b[0], w[0]), max(b[1], w[1]),
                       min(b[2], w[2]), min(b[3], w[3])]
            expect = [(clipped[0] - w[0]) * sy, (clipped[1] - w[1]) * sx,
                      (clipped[2] - w[0]) * sy, (clipped[3] - w[1]) * sx]
            np.testing.assert_allclose(out["gt_boxes"][i], expect, atol=1e-3)
    assert fired >= 10  # the sampler must actually crop most of the time


def test_pad_geometry():
    hg = HostGeometry(
        [("random_pad_image", {"min_size_ratio": (1.2, 1.2),
                               "max_size_ratio": (1.8, 1.8),
                               "pad_color": (10.0, 20.0, 30.0)})],
        60, 100, (128, 128),
    )
    s = make_sample()
    out = hg(s, np.random.default_rng(1))
    w = out["aug_window"].astype(np.float64)
    wh, ww = w[2] - w[0], w[3] - w[1]
    assert 1.2 * 60 - 1e-6 <= wh <= 1.8 * 60 + 1e-6
    assert 1.2 * 100 - 1e-6 <= ww <= 1.8 * 100 + 1e-6
    assert w[0] <= 1e-6 and w[1] <= 1e-6  # window extends into pad space
    fh, fw = out["true_shape"]
    assert (fh, fw) == keep_aspect_target(wh, ww, 60, 100)
    np.testing.assert_array_equal(out["aug_pad_color"], [10, 20, 30])
    # boxes shift by the pad offset then scale with the resize
    sy, sx = fh / wh, fw / ww
    top, left = -w[0], -w[1]
    for i in range(2):
        b = s["gt_boxes"][i].astype(np.float64)
        expect = [(b[0] + top) * sy, (b[1] + left) * sx,
                  (b[2] + top) * sy, (b[3] + left) * sx]
        np.testing.assert_allclose(out["gt_boxes"][i], expect, atol=1e-3)
    assert out["gt_mask"].tolist() == s["gt_mask"].tolist()
    # pack extent covers both the source reads and the output writes
    assert out["pack_shape"][0] >= max(fh, min(60, int(w[2])))
    assert out["pack_shape"][1] >= max(fw, min(100, int(w[3])))


def _np_window_resample(image, true_shape, window, src_shape, pad_color,
                        content=None):
    """Independent float64 oracle of preprocessor.apply_host_window."""
    H, W, _ = image.shape
    fh, fw = float(true_shape[0]), float(true_shape[1])
    y0w, x0w, y1w, x1w = [float(v) for v in window]
    wh, ww = y1w - y0w, x1w - x0w
    sh, sw = float(src_shape[0]), float(src_shape[1])
    if content is None:
        content = (0.0, 0.0, sh, sw)
    c0 = max(float(content[0]), 0.0)
    c1 = max(float(content[1]), 0.0)
    c2 = min(float(content[2]), sh)
    c3 = min(float(content[3]), sw)
    out = np.zeros((H, W, 3), np.float64)
    for i in range(H):
        for j in range(W):
            if i >= fh or j >= fw:
                continue
            ys = np.clip((i + 0.5) * wh / fh - 0.5 + y0w,
                         y0w, max(y1w - 1.0, y0w))
            xs = np.clip((j + 0.5) * ww / fw - 0.5 + x0w,
                         x0w, max(x1w - 1.0, x0w))
            y0, x0 = np.floor(ys), np.floor(xs)
            wy, wx = ys - y0, xs - x0
            acc = np.zeros(3)
            for dy, fy in ((0, 1 - wy), (1, wy)):
                for dx, fx in ((0, 1 - wx), (1, wx)):
                    yt, xt = y0 + dy, x0 + dx
                    if c0 <= yt < c2 and c1 <= xt < c3:
                        v = image[int(min(yt, H - 1)), int(min(xt, W - 1))]
                    else:
                        v = np.asarray(pad_color)
                    acc += fy * fx * np.asarray(v, np.float64)
            out[i, j] = acc
    return out


def test_device_resample_matches_numpy_oracle():
    rs = np.random.RandomState(2)
    image = np.zeros((32, 32, 3), np.float32)
    image[:20, :28] = rs.uniform(0, 255, (20, 28, 3)).astype(np.float32)
    src_shape = np.asarray([20, 28], np.int32)
    pad_color = np.asarray([5.0, 6.0, 7.0], np.float32)
    for window, post in [
        (np.asarray([3.5, 2.25, 15.5, 20.75], np.float32), (18, 28)),
        (np.asarray([-4.0, -6.0, 24.0, 30.0], np.float32), (20, 26)),  # pad
        (np.asarray([0.0, 0.0, 20.0, 28.0], np.float32), (20, 28)),  # ident
    ]:
        true_shape = np.asarray(post, np.int32)
        got = np.asarray(prep.apply_host_window(
            jnp.asarray(image), jnp.asarray(true_shape),
            jnp.asarray(window), jnp.asarray(src_shape),
            jnp.asarray(pad_color),
        ))
        want = _np_window_resample(image, true_shape, window, src_shape,
                                   pad_color)
        np.testing.assert_allclose(got, want, atol=1e-2)
    # a content rect smaller than the source (crop-then-pad chains): taps
    # outside it must read pad fill even though they sit inside the source
    window = np.asarray([-4.0, -6.0, 24.0, 30.0], np.float32)
    true_shape = np.asarray([20, 26], np.int32)
    content = np.asarray([4.0, 5.0, 16.0, 22.0], np.float32)
    got = np.asarray(prep.apply_host_window(
        jnp.asarray(image), jnp.asarray(true_shape),
        jnp.asarray(window), jnp.asarray(src_shape),
        jnp.asarray(pad_color), jnp.asarray(content),
    ))
    want = _np_window_resample(image, true_shape, window, src_shape,
                               pad_color, content)
    np.testing.assert_allclose(got, want, atol=1e-2)
    assert np.any(np.all(got == pad_color, axis=-1))


def test_deterministic_per_seed_and_varies_per_epoch():
    hg = HostGeometry(
        [("random_crop_image", {"min_object_covered": 0.0,
                                "min_area": 0.2, "max_area": 0.9})],
        60, 100, (128, 128),
    )
    s = make_sample()
    a = hg(s, np.random.default_rng([7, 0, 3]))
    b = hg(s, np.random.default_rng([7, 0, 3]))
    np.testing.assert_array_equal(a["aug_window"], b["aug_window"])
    epochs = [hg(s, np.random.default_rng([7, e, 3]))["aug_window"]
              for e in range(4)]
    assert any(not np.array_equal(epochs[0], w) for w in epochs[1:])


def test_keypoints_transform_with_crop():
    """Keypoints ride the window affine (translate by the accumulated
    origin, scale with the keep-aspect resize); outside-window points
    become NaN (reference prune_outside_window semantics)."""
    hg = HostGeometry(
        [("random_crop_image", {"min_object_covered": 0.0,
                                "min_area": 0.2, "max_area": 0.7})],
        60, 100, (128, 128),
    )
    s = make_sample()
    # one keypoint inside each box corner region, one far corner
    s["gt_keypoints"] = np.asarray(
        [[[15.0, 20.0], [1.0, 99.0]],
         [[30.0, 70.0], [59.0, 1.0]]] + [[[0.0, 0.0]] * 2] * 2,
        np.float32,
    )
    checked = 0
    for seed in range(12):
        out = hg(s, np.random.default_rng(seed))
        w = out["aug_window"].astype(np.float64)
        wh, ww = w[2] - w[0], w[3] - w[1]
        if (wh, ww) == (60.0, 100.0):
            continue
        checked += 1
        fh, fw = out["true_shape"]
        sy, sx = fh / wh, fw / ww
        for g in range(2):
            for p in range(2):
                kp = s["gt_keypoints"][g, p].astype(np.float64)
                expect = [(kp[0] - w[0]) * sy, (kp[1] - w[1]) * sx]
                got = out["gt_keypoints"][g, p]
                if (0 <= expect[0] <= fh) and (0 <= expect[1] <= fw):
                    np.testing.assert_allclose(got, expect, atol=1e-3)
                else:
                    assert np.isnan(got).all(), (got, expect)
    assert checked >= 5


def test_masks_pass_through_and_device_resample():
    """gt_instance_masks pass through untouched host-side; the train-step
    resample moves them with the same window at mask-stride resolution so
    the mask stays under its (transformed) box."""
    hg = HostGeometry([("random_crop_image", {"min_object_covered": 1.0,
                                              "min_area": 0.3,
                                              "max_area": 0.8})],
                      60, 100, (128, 128))
    s = make_sample()
    ms = 8
    masks = np.zeros((4, 128 // ms, 128 // ms), np.uint8)
    # instance 0's mask fills its box [10, 10, 40, 50] on the mask grid
    masks[0, 2:5, 2:6] = 1
    s["gt_instance_masks"] = masks
    out = hg(s, np.random.default_rng(3))
    np.testing.assert_array_equal(out["gt_instance_masks"], masks)
    w = out["aug_window"]
    assert tuple(w[2:] - w[:2]) != (60.0, 100.0), "crop must fire"

    # device side: same resample the train step applies (per image)
    soft = np.asarray(prep.apply_host_window(
        jnp.asarray(masks.transpose(1, 2, 0), jnp.float32),
        jnp.maximum(jnp.round(jnp.asarray(out["true_shape"]) / ms), 1
                    ).astype(jnp.int32),
        jnp.asarray(w / ms),
        jnp.maximum(jnp.round(jnp.asarray(out["aug_src_shape"]) / ms), 1
                    ).astype(jnp.int32),
        jnp.zeros((4,), jnp.float32),
    )).transpose(2, 0, 1)
    # the transformed box, on the mask grid, is covered by mask mass
    if out["gt_mask"][0]:
        b = out["gt_boxes"][0] / ms
        yc, xc = int((b[0] + b[2]) / 2), int((b[1] + b[3]) / 2)
        assert soft[0, yc, xc] > 0.4, (b, soft[0])
        # and (almost) no mass lands outside a 1-cell-dilated box
        y0, x0 = max(0, int(b[0]) - 1), max(0, int(b[1]) - 1)
        y1, x1 = int(np.ceil(b[2])) + 1, int(np.ceil(b[3])) + 1
        outside = soft[0].copy()
        outside[y0:y1, x0:x1] = 0
        assert outside.max() <= 0.5, outside.max()


def test_ssd_branch_and_pad_composition():
    hg = HostGeometry(
        [("ssd_random_crop", {}),
         ("random_pad_image", {"min_size_ratio": (1.1, 1.1),
                               "max_size_ratio": (1.4, 1.4)})],
        60, 100, (128, 128),
    )
    s = make_sample()
    kinds = set()
    for seed in range(24):
        out = hg(s, np.random.default_rng(seed))
        fh, fw = out["true_shape"]
        w = out["aug_window"].astype(np.float64)
        assert (fh, fw) == keep_aspect_target(w[2] - w[0], w[3] - w[1],
                                              60, 100)
        assert fh <= 128 and fw <= 128
        kinds.add(bool(np.any(out["gt_mask"] != s["gt_mask"])))
    assert kinds == {False, True}  # some branches crop boxes away, some keep


def _write_record(path, n=4):
    from PIL import Image

    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example

    rs = np.random.RandomState(0)
    with tfrecord.TFRecordWriter(path) as w:
        for i in range(n):
            h, wdt = (48, 80) if i % 2 == 0 else (80, 48)
            arr = rs.randint(0, 255, (h, wdt, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            ex = build_example(
                buf.getvalue(), b"jpeg", h, wdt, f"im{i}.jpg",
                np.asarray([[0.1, 0.1, 0.7, 0.8]], np.float32), [1], ["a"],
            )
            w.write(ex.SerializeToString())


def test_loader_batches_with_host_geometry(tmp_path):
    from mtlx.data.loader import DetectionDataset, batches

    record = str(tmp_path / "r.record")
    _write_record(record)
    ds = DetectionDataset(
        [record], (128, 128),
        resizer=("keep_aspect", {"min_dimension": 64, "max_dimension": 128}),
        max_boxes=4,
    )
    hg = HostGeometry(
        [("random_crop_image", {"min_object_covered": 0.3,
                                "min_area": 0.3, "max_area": 0.9,
                                "overlap_thresh": 0.3})],
        64, 128, (128, 128),
    )
    it = batches(ds, 2, shuffle=True, seed=0, epochs=1, pack_images=True,
                 host_geometry=hg)
    n = 0
    for batch in it:
        n += 1
        for f in AUG_FIELDS:
            assert f in batch, f
        assert "pack_shape" not in batch
        hb, wb = batch["image"].shape[1:3]
        assert hb % 128 == 0 or hb == 128
        assert (batch["true_shape"][:, 0] <= hb).all()
        assert (batch["true_shape"][:, 1] <= wb).all()
        # boxes live inside the post-crop true region
        ts = batch["true_shape"].astype(np.float32)
        assert (batch["gt_boxes"][..., 2] <= ts[:, None, 0] + 1e-3).all()
        assert (batch["gt_boxes"][..., 3] <= ts[:, None, 1] + 1e-3).all()
    assert n == 2


def test_grain_loader_with_host_geometry(tmp_path):
    """grain path: HostGeometry runs as a RandomMapTransform — including
    under worker_count > 0, which pickles the transform (and the
    HostGeometry it closes over) into worker processes."""
    import pickle

    from mtlx.data.grain_loader import make_grain_loader
    from mtlx.data.loader import DetectionDataset

    record = str(tmp_path / "g.record")
    _write_record(record)
    ds = DetectionDataset(
        [record], (128, 128),
        resizer=("keep_aspect", {"min_dimension": 64, "max_dimension": 128}),
        max_boxes=4,
    )
    hg = HostGeometry(
        [("random_crop_image", {"min_object_covered": 0.3,
                                "min_area": 0.3, "max_area": 0.9})],
        64, 128, (128, 128),
    )
    assert pickle.loads(pickle.dumps(hg)).ops == hg.ops

    for workers in (0, 1):
        seen = 0
        it = make_grain_loader(ds, batch_size=2, num_epochs=1, seed=3,
                               pack_images=True, worker_count=workers,
                               host_geometry=hg)
        for batch in it:
            seen += 1
            for f in AUG_FIELDS:
                assert f in batch, (workers, f)
            assert "pack_shape" not in batch
            ts = batch["true_shape"]
            assert (ts[:, 0] <= batch["image"].shape[1]).all()
            assert (ts[:, 1] <= batch["image"].shape[2]).all()
        assert seen == 2, workers


def test_augment_fn_resamples_masks_with_window():
    """train.make_augmented_batch_fn: a batch carrying aug_* fields gets
    both image AND instance masks window-resampled (stride derived from
    the shapes), and host-transformed keypoints pass through."""
    import jax

    from mtlx.train.train import make_augmented_batch_fn

    hg = HostGeometry([("random_crop_image", {"min_object_covered": 1.0,
                                              "min_area": 0.3,
                                              "max_area": 0.8})],
                      60, 100, (128, 128))
    s = make_sample()
    ms = 8
    masks = np.zeros((4, 128 // ms, 128 // ms), np.uint8)
    masks[0, 2:5, 2:6] = 1  # fills box [10, 10, 40, 50] on the mask grid
    s["gt_instance_masks"] = masks
    s["gt_keypoints"] = np.asarray(
        [[[15.0, 20.0]], [[30.0, 70.0]], [[0.0, 0.0]], [[0.0, 0.0]]],
        np.float32,
    )
    out = hg(s, np.random.default_rng(3))
    assert tuple(out["aug_window"][2:] - out["aug_window"][:2]) != (60., 100.)

    batch = {
        k: jnp.asarray(np.asarray(v)[None])
        for k, v in out.items()
        if k not in ("source_id", "original_shape", "pack_shape")
    }
    aug = make_augmented_batch_fn([])
    new = jax.jit(lambda b: aug(jax.random.PRNGKey(0), jnp.int32(0), b))(batch)
    for f in AUG_FIELDS:
        assert f not in new
    np.testing.assert_allclose(
        np.asarray(new["gt_keypoints"]), out["gt_keypoints"][None], atol=1e-5
    )
    assert new["gt_instance_masks"].shape == (1, 4, 16, 16)
    soft = np.asarray(new["gt_instance_masks"])[0, 0]
    assert out["gt_mask"][0]
    b = out["gt_boxes"][0] / ms
    yc, xc = int((b[0] + b[2]) / 2), int((b[1] + b[3]) / 2)
    assert soft[yc, xc] > 0.4, (b, soft)
    outside = soft.copy()
    outside[max(0, int(b[0]) - 1):int(np.ceil(b[2])) + 1,
            max(0, int(b[1]) - 1):int(np.ceil(b[3])) + 1] = 0
    assert outside.max() <= 0.5


TRAIN_CONFIG = """
model {{
  faster_rcnn {{
    num_classes: 2
    image_resizer {{
      keep_aspect_ratio_resizer {{ min_dimension: 72 max_dimension: 160 }}
    }}
    feature_extractor {{ type: 'faster_rcnn_resnet50' }}
    first_stage_anchor_generator {{
      grid_anchor_generator {{ scales: [1.0] aspect_ratios: [1.0] height: 64 width: 64 }}
    }}
    first_stage_box_predictor_depth: 16
    first_stage_max_proposals: 8
    first_stage_minibatch_size: 16
    second_stage_batch_size: 4
    initial_crop_size: 14
    maxpool_kernel_size: 2
    maxpool_stride: 2
    second_stage_post_processing {{
      batch_non_max_suppression {{ score_threshold: 0.0 iou_threshold: 0.6 max_detections_per_class: 5 max_total_detections: 10 }}
      score_converter: SOFTMAX
    }}
  }}
}}
train_config {{
  batch_size: 1
  optimizer {{
    momentum_optimizer {{
      learning_rate {{ constant_learning_rate {{ learning_rate: 0.001 }} }}
      momentum_optimizer_value: 0.9
    }}
    use_moving_average: false
  }}
  data_augmentation_options {{ random_horizontal_flip {{}} }}
  data_augmentation_options {{
    random_crop_image {{
      min_object_covered: 0.5 min_area: 0.3 max_area: 0.9
      overlap_thresh: 0.3
    }}
  }}
  num_steps: 3
  max_number_of_boxes: 4
}}
train_input_reader {{
  tf_record_input_reader {{ input_path: "{record}" }}
  label_map_path: "{label_map}"
  shuffle: false
}}
"""


def test_train_cli_with_host_geometry(tmp_path, capsys):
    """End to end: a keep-aspect + random_crop_image config routes the crop
    to host geometry, trains at genuinely variable post-crop shapes, and
    --precompile_buckets covers the post-crop bucket set (the reference's
    crop-then-resize train pipeline, SURVEY.md §3.1/§4.1)."""
    import json

    from mtlx.train import train as train_cli

    record = str(tmp_path / "t.record")
    _write_record(record)
    label_map = str(tmp_path / "label_map.pbtxt")
    with open(label_map, "w") as f:
        f.write("item { id: 1 name: 'a' }\nitem { id: 2 name: 'b' }\n")
    cfg = str(tmp_path / "pipeline.config")
    with open(cfg, "w") as f:
        f.write(TRAIN_CONFIG.format(record=record, label_map=label_map))

    train_cli.main([
        "--pipeline_config_path", cfg,
        "--train_dir", str(tmp_path / "train"),
        "--precompile_buckets",
        "--log_every", "1",
    ])
    out = capsys.readouterr().out
    assert ("host-side variable-size geometry: ['random_crop_image']"
            in out), out
    assert "precompiled" in out
    assert "[train] done at step 3" in out
    losses = [json.loads(line.split("[train] ", 1)[1])
              for line in out.splitlines() if line.startswith("[train] {")]
    assert losses and all(np.isfinite(l["total_loss"]) for l in losses)


def test_crop_then_pad_does_not_resurrect_cropped_pixels():
    """A crop discards source content outside its window; a following pad
    re-covers that territory — the resample must render PAD there, not the
    discarded source pixels (regression: the composed window alone leaked
    them back in). aug_content carries the surviving source rect."""
    hg = HostGeometry(
        [("random_crop_image", {"min_object_covered": 0.0,
                                "min_area": 0.2, "max_area": 0.4}),
         ("random_pad_image", {"min_size_ratio": (1.8, 1.8),
                               "max_size_ratio": (2.0, 2.0),
                               "pad_color": (9.0, 9.0, 9.0)})],
        60, 100, (128, 128),
    )
    s = make_sample()  # source pixels are random in [1, 255)
    checked = 0
    for seed in range(12):
        out = hg(s, np.random.default_rng(seed))
        c = out["aug_content"].astype(np.float64)
        if (c[2] - c[0]) > 0.8 * 60:
            continue  # crop didn't fire / barely cropped
        checked += 1
        w = out["aug_window"].astype(np.float64)
        fh, fw = out["true_shape"]
        res = np.asarray(prep.apply_host_window(
            jnp.asarray(s["image"], jnp.float32),
            jnp.asarray(out["true_shape"]),
            jnp.asarray(w, jnp.float32),
            jnp.asarray(out["aug_src_shape"]),
            jnp.asarray(out["aug_pad_color"]),
            jnp.asarray(c, jnp.float32),
        ))
        # map the content rect into output coords; outside it (with a 2px
        # bilinear margin) everything inside the true region must be pad
        sy, sx = fh / (w[2] - w[0]), fw / (w[3] - w[1])
        oy0, ox0 = (c[0] - w[0]) * sy, (c[1] - w[1]) * sx
        oy1, ox1 = (c[2] - w[0]) * sy, (c[3] - w[1]) * sx
        ys, xs = np.mgrid[0:res.shape[0], 0:res.shape[1]]
        outside = (
            (ys < fh) & (xs < fw)
            & ((ys < oy0 - 2) | (ys > oy1 + 2)
               | (xs < ox0 - 2) | (xs > ox1 + 2))
        )
        assert outside.any()
        np.testing.assert_allclose(
            res[outside], np.full((outside.sum(), 3), 9.0), atol=1e-3
        )
        # and well inside the mapped content the source shows through
        inside = (
            (ys > oy0 + 2) & (ys < oy1 - 2) & (xs > ox0 + 2) & (xs < ox1 - 2)
        )
        if inside.any():
            assert not np.allclose(res[inside], 9.0, atol=1e-3)
    assert checked >= 3


def test_crop_then_pad_prunes_keypoints_outside_content():
    """A keypoint whose SOURCE position was cropped away must stay NaN
    even when the pad places its coordinates back inside the final frame."""
    hg = HostGeometry(
        [("random_crop_image", {"min_object_covered": 0.0,
                                "min_area": 0.2, "max_area": 0.4}),
         ("random_pad_image", {"min_size_ratio": (1.8, 1.8),
                               "max_size_ratio": (2.0, 2.0)})],
        60, 100, (128, 128),
    )
    s = make_sample()
    # keypoints spread over the source so some fall outside any small crop
    gy, gx = np.mgrid[5:60:15, 5:100:25]
    pts = np.stack([gy.ravel(), gx.ravel()], -1).astype(np.float32)
    k = pts.shape[0]
    s["gt_keypoints"] = np.tile(pts[None], (4, 1, 1))[:, :k]
    hit = 0
    for seed in range(12):
        out = hg(s, np.random.default_rng(seed))
        c = out["aug_content"].astype(np.float64)
        if (c[2] - c[0]) > 0.8 * 60:
            continue
        fh, fw = out["true_shape"]
        w = out["aug_window"].astype(np.float64)
        sy, sx = fh / (w[2] - w[0]), fw / (w[3] - w[1])
        for p in range(k):
            src = pts[p].astype(np.float64)
            mapped = [(src[0] - w[0]) * sy, (src[1] - w[1]) * sx]
            in_frame = 0 <= mapped[0] <= fh and 0 <= mapped[1] <= fw
            in_content = (c[0] <= src[0] <= c[2]) and (c[1] <= src[1] <= c[3])
            got = out["gt_keypoints"][0, p]
            if in_frame and not in_content:
                hit += 1  # the leak case: in-frame but cropped away
                assert np.isnan(got).all(), (got, mapped, c)
            elif in_frame and in_content:
                np.testing.assert_allclose(got, mapped, atol=1e-3)
            else:
                assert np.isnan(got).all()
    assert hit >= 1


def test_achievable_buckets_cover_observed_pack_shapes(tmp_path):
    """--precompile_buckets must enumerate every bucket a real batch can
    ship at. With host geometry, pack_shape = max(post-crop shape, window
    read extent) lands BETWEEN the record and post-crop buckets, so the
    achievable set is the full bucket grid (regression: the endpoint-set
    closure missed in-between buckets -> mid-run XLA compiles)."""
    from mtlx.data.loader import (
        DetectionDataset,
        achievable_bucket_shapes,
    )
    from mtlx.utils.bucketing import bucket_multiple

    _PACK_MULTIPLE = bucket_multiple()
    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example
    from PIL import Image

    record = str(tmp_path / "ab.record")
    rs = np.random.RandomState(0)
    with tfrecord.TFRecordWriter(record) as w:
        for i, (h0, w0) in enumerate([(300, 420), (420, 300), (350, 350)]):
            buf = io.BytesIO()
            Image.fromarray(
                rs.randint(0, 255, (h0, w0, 3)).astype(np.uint8)
            ).save(buf, format="JPEG")
            w.write(build_example(
                buf.getvalue(), b"jpeg", h0, w0, f"{i}.jpg",
                np.asarray([[0.2, 0.2, 0.8, 0.8]], np.float32), [1], ["a"],
            ).SerializeToString())
    canvas = (512, 512)
    ds = DetectionDataset(
        [record], canvas,
        resizer=("keep_aspect", {"min_dimension": 192, "max_dimension": 448}),
        max_boxes=3,
    )
    hg = HostGeometry(
        [("random_crop_image", {"min_object_covered": 0.0,
                                "min_area": 0.15, "max_area": 0.9,
                                "min_aspect_ratio": 0.4,
                                "max_aspect_ratio": 2.5}),
         ("random_pad_image", {})],
        192, 448, canvas,
    )
    shapes = set(achievable_bucket_shapes(ds, 2, host_geometry=hg))

    def bucket(v, cap):
        return min(cap, -(-int(np.ceil(v)) // _PACK_MULTIPLE) * _PACK_MULTIPLE)

    seen = set()
    for i in range(len(ds)):
        s = ds.get(i)
        for seed in range(80):
            out = hg(dict(s), np.random.default_rng([seed, i]))
            ph, pw = out["pack_shape"]
            seen.add((bucket(ph, canvas[0]), bucket(pw, canvas[1])))
    missing = seen - shapes
    assert missing == set(), (sorted(missing), sorted(shapes))
    assert len(seen) > 3  # the sweep actually exercised several buckets
