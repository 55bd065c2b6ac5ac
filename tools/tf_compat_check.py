"""Cross-validate the dependency-free TFRecord/Example/event-file codecs
against real TensorFlow parsing (wire-format compatibility proof). Run
manually where TF is installed; the test suite stays TF-free.

  PYTHONPATH=. python tools/tf_compat_check.py
"""

import os
import sys
import tempfile

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
sys.path.insert(0, ".")

import numpy as np


def main():
    # the kernel cross-checks below use jax: run them on host CPU (the
    # remote-TPU backend would recompile every tiny op over the tunnel)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tensorflow as tf

    from mtlx.data import tfrecord
    from mtlx.data.example_decoder import build_example, decode_example
    from mtlx.utils.summary_writer import SummaryWriter

    tmp = tempfile.mkdtemp()

    # --- our writer -> TF reader ---
    import io
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((10, 12, 3), 99, np.uint8)).save(buf, format="JPEG")
    boxes = np.asarray([[0.1, 0.2, 0.6, 0.9]], np.float32)
    ex = build_example(buf.getvalue(), b"jpeg", 10, 12, "x.jpg", boxes, [5], ["cow"],
                       difficult=[1])
    path = os.path.join(tmp, "ours.record")
    with tfrecord.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())

    ds = tf.data.TFRecordDataset([path])
    raw = next(iter(ds)).numpy()
    parsed = tf.io.parse_single_example(raw, {
        "image/object/bbox/ymin": tf.io.VarLenFeature(tf.float32),
        "image/object/class/label": tf.io.VarLenFeature(tf.int64),
        "image/object/difficult": tf.io.VarLenFeature(tf.int64),
        "image/encoded": tf.io.FixedLenFeature([], tf.string),
        "image/source_id": tf.io.FixedLenFeature([], tf.string),
    })
    assert abs(float(tf.sparse.to_dense(parsed["image/object/bbox/ymin"])[0]) - 0.1) < 1e-6
    assert int(tf.sparse.to_dense(parsed["image/object/class/label"])[0]) == 5
    assert int(tf.sparse.to_dense(parsed["image/object/difficult"])[0]) == 1
    assert parsed["image/source_id"].numpy() == b"x.jpg"
    img = tf.io.decode_jpeg(parsed["image/encoded"]).numpy()
    assert img.shape == (10, 12, 3)
    print("ours->TF: TFRecord container + Example fields parse in TF OK")

    # --- TF writer -> our reader ---
    path2 = os.path.join(tmp, "tf.record")
    tf_ex = tf.train.Example(features=tf.train.Features(feature={
        "image/encoded": tf.train.Feature(bytes_list=tf.train.BytesList(value=[buf.getvalue()])),
        "image/object/bbox/ymin": tf.train.Feature(float_list=tf.train.FloatList(value=[0.25])),
        "image/object/bbox/xmin": tf.train.Feature(float_list=tf.train.FloatList(value=[0.5])),
        "image/object/bbox/ymax": tf.train.Feature(float_list=tf.train.FloatList(value=[0.75])),
        "image/object/bbox/xmax": tf.train.Feature(float_list=tf.train.FloatList(value=[1.0])),
        "image/object/class/label": tf.train.Feature(int64_list=tf.train.Int64List(value=[7])),
        "image/source_id": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"tf.jpg"])),
        "image/height": tf.train.Feature(int64_list=tf.train.Int64List(value=[10])),
        "image/width": tf.train.Feature(int64_list=tf.train.Int64List(value=[12])),
    }))
    with tf.io.TFRecordWriter(path2) as w:
        w.write(tf_ex.SerializeToString())
    rec = next(tfrecord.read_records(path2, verify_crc=True))
    out = decode_example(rec)
    np.testing.assert_allclose(out["groundtruth_boxes"][0], [0.25, 0.5, 0.75, 1.0], rtol=1e-6)
    assert out["groundtruth_classes"][0] == 7
    assert out["image"].shape == (10, 12, 3)
    print("TF->ours: real TF records parse in our reader (CRC verified) OK")

    # --- our event files -> TF summary iterator ---
    logdir = os.path.join(tmp, "events")
    sw = SummaryWriter(logdir)
    sw.scalar("loss/total", 1.25, step=7)
    sw.image("img", np.zeros((4, 4, 3), np.uint8), step=7)
    sw.close()
    event_file = [os.path.join(logdir, f) for f in os.listdir(logdir)][0]
    events = list(tf.compat.v1.train.summary_iterator(event_file))
    assert events[0].file_version == "brain.Event:2"
    scalars = [v for e in events for v in e.summary.value if v.tag == "loss/total"]
    assert scalars and abs(scalars[0].simple_value - 1.25) < 1e-6
    images = [v for e in events for v in e.summary.value if v.tag == "img"]
    assert images and images[0].image.height == 4
    print("event files: TensorBoard/TF summary_iterator reads our logs OK")
    # --- kernel semantics vs real TF: crop_and_resize + NMS selection ---
    # (SURVEY.md §8 hard-parts 1/4: mAP parity hinges on these matching
    # TF bit-for-bit; the in-suite oracles are numpy transcriptions, this
    # validates against TensorFlow itself)
    import jax.numpy as jnp

    from mtlx.ops import nms as nms_lib
    from mtlx.ops import roi

    rs = np.random.RandomState(42)
    feat = rs.uniform(-1, 1, (20, 24, 3)).astype(np.float32)
    boxes = np.stack([
        rs.uniform(0, 0.7, 8), rs.uniform(0, 0.7, 8),
        rs.uniform(0.3, 1.1, 8), rs.uniform(0.3, 1.1, 8),
    ], 1).astype(np.float32)  # incl. boxes extending past the image
    tf_crops = tf.image.crop_and_resize(
        feat[None], boxes, tf.zeros(8, tf.int32), (7, 5)
    ).numpy()
    our_crops = np.asarray(
        roi.crop_and_resize(jnp.asarray(feat), jnp.asarray(boxes), (7, 5))
    )
    np.testing.assert_allclose(our_crops, tf_crops, rtol=2e-5, atol=2e-5)
    print("crop_and_resize: matches tf.image.crop_and_resize "
          f"(max |diff| {np.abs(our_crops - tf_crops).max():.2e}) OK")

    n = 60
    # sorted corners ([ymin, xmin, ymax, xmax]) — the framework-wide box
    # invariant (TF's NMS kernel alone also accepts swapped corners by
    # min/max-normalizing; mtlx boxes are sorted everywhere by contract)
    y0 = rs.uniform(0, 80, n)
    x0 = rs.uniform(0, 80, n)
    nboxes = np.stack([
        y0, x0, y0 + rs.uniform(5, 40, n), x0 + rs.uniform(5, 40, n),
    ], 1).astype(np.float32)
    nscores = rs.uniform(0, 1, n).astype(np.float32)
    for iou_t in (0.5, 0.7):
        tf_sel = tf.image.non_max_suppression(
            nboxes, nscores, max_output_size=20, iou_threshold=iou_t
        ).numpy()
        idx, keep = nms_lib.non_max_suppression_padded(
            jnp.asarray(nboxes), jnp.asarray(nscores), 20, iou_threshold=iou_t
        )
        ours = np.asarray(idx)[np.asarray(keep)]
        np.testing.assert_array_equal(ours, tf_sel)
    print("NMS: selection order identical to tf.image.non_max_suppression OK")

    # --- tf1_resize mode vs tf.compat.v1.image.resize_images ---
    from mtlx.data.loader import (
        _imgcodec as codec,
        legacy_resize_bilinear,
        native_decode_resize,
    )

    src_img = rs.randint(0, 255, (90, 130, 3)).astype(np.uint8)
    tf1 = tf.compat.v1.image.resize_images(
        src_img[None].astype(np.float32), (60, 80), align_corners=False
    ).numpy()[0]
    ours_np = legacy_resize_bilinear(src_img, 60, 80).astype(np.float32)
    # uint8 output quantization bounds the difference to rounding
    assert np.abs(ours_np - tf1).max() <= 0.502, np.abs(ours_np - tf1).max()
    if codec is not None:
        jpg = io.BytesIO()
        Image.fromarray(src_img).save(jpg, format="JPEG", quality=100)
        nat = native_decode_resize(
            jpg.getvalue(), "fixed", {"height": 60, "width": 80},
            tf1_resize=True,
        ).astype(np.float32)
        decoded = np.asarray(Image.open(io.BytesIO(jpg.getvalue())))
        tf1_j = tf.compat.v1.image.resize_images(
            decoded[None].astype(np.float32), (60, 80), align_corners=False
        ).numpy()[0]
        assert np.abs(nat - tf1_j).max() <= 1.001, np.abs(nat - tf1_j).max()
    print("tf1_resize: matches tf.compat.v1 resize_images "
          "(align_corners=False) within quantization OK")

    # --- full postprocess chain vs a composition of real TF ops ---
    # (VERDICT r2 #4a: decode -> score-convert -> clip -> per-class NMS ->
    # global top-k cap, the one mAP-relevant chain previously validated
    # only against this repo's own numpy oracles. The TF twin below is
    # built from tf.nn.softmax / tf exp-decode / tf.image.non_max_
    # suppression / tf.math.top_k composed per the reference
    # core/post_processing.multiclass_non_max_suppression.)
    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig

    K = 3  # classes
    N = 24  # proposals
    cfg = FasterRCNNConfig(
        num_classes=K, canvas_size=(64, 64),
        first_stage_max_proposals=N,
        second_stage_nms_score_threshold=0.05,
        second_stage_nms_iou_threshold=0.55,
        second_stage_max_detections_per_class=8,
        second_stage_max_total_detections=12,
        dtype=jnp.float32,
    )
    model = FasterRCNN(cfg)
    y0 = rs.uniform(0, 40, N); x0 = rs.uniform(0, 40, N)
    props = np.stack(
        [y0, x0, y0 + rs.uniform(6, 24, N), x0 + rs.uniform(6, 24, N)], 1
    ).astype(np.float32)
    valid = np.ones(N, bool); valid[-3:] = False
    logits = rs.uniform(-2, 2, (N, K + 1)).astype(np.float32)
    refine = (rs.uniform(-1, 1, (N, K, 4)) * [1.0, 1.0, 0.5, 0.5]).astype(
        np.float32
    )
    true_hw = np.asarray([60, 52], np.int32)
    ours = jax.device_get(model.postprocess(
        {
            "proposal_boxes": props[None],
            "proposal_mask": valid[None],
            "class_predictions": logits[None],
            "refined_box_encodings": refine[None],
        },
        true_hw[None],
    ))

    # TF twin
    probs = tf.nn.softmax(logits)[:, 1:].numpy()  # drop background
    eps = 1e-8
    ya, xa = (props[:, 0] + props[:, 2]) / 2, (props[:, 1] + props[:, 3]) / 2
    ha = props[:, 2] - props[:, 0] + eps
    wa = props[:, 3] - props[:, 1] + eps
    k_cap = cfg.second_stage_max_detections_per_class
    flat_scores, flat_boxes, flat_classes = [], [], []
    for c in range(K):
        ty, tx, th, tw = (refine[:, c, i] / s for i, s in
                          enumerate((10.0, 10.0, 5.0, 5.0)))
        h = tf.exp(th).numpy() * ha
        w = tf.exp(tw).numpy() * wa
        yc, xc = ty * ha + ya, tx * wa + xa
        dec = np.stack(
            [yc - h / 2, xc - w / 2, yc + h / 2, xc + w / 2], 1
        ).astype(np.float32)
        clipped = np.clip(dec, [0, 0, 0, 0],
                          [true_hw[0], true_hw[1], true_hw[0], true_hw[1]])
        area = (clipped[:, 2] - clipped[:, 0]) * (clipped[:, 3] - clipped[:, 1])
        ok = valid & (area > 0)
        masked = np.where(ok, probs[:, c], -1e10).astype(np.float32)
        sel = tf.image.non_max_suppression(
            clipped, masked, k_cap,
            iou_threshold=cfg.second_stage_nms_iou_threshold,
            score_threshold=cfg.second_stage_nms_score_threshold,
        ).numpy()
        pad_scores = np.full(k_cap, -1e10, np.float32)
        pad_boxes = np.zeros((k_cap, 4), np.float32)
        pad_scores[: len(sel)] = probs[sel, c]
        pad_boxes[: len(sel)] = clipped[sel]
        flat_scores.append(pad_scores)
        flat_boxes.append(pad_boxes)
        flat_classes.append(np.full(k_cap, c, np.int32))
    flat_scores = np.concatenate(flat_scores)
    flat_boxes = np.concatenate(flat_boxes)
    flat_classes = np.concatenate(flat_classes)
    total = cfg.second_stage_max_total_detections
    top = tf.math.top_k(flat_scores, total)
    tf_scores = top.values.numpy()
    ti = top.indices.numpy()
    tf_keep = tf_scores > -1e9
    norm = np.asarray(
        [true_hw[0], true_hw[1], true_hw[0], true_hw[1]], np.float32
    )
    tf_boxes = flat_boxes[ti] / norm
    tf_classes = flat_classes[ti]
    n_tf = int(tf_keep.sum())
    n_ours = int(ours["num_detections"][0])
    assert n_ours == n_tf, (n_ours, n_tf)
    np.testing.assert_array_equal(
        np.asarray(ours["detection_classes"][0][:n_tf]), tf_classes[:n_tf]
    )
    np.testing.assert_allclose(
        np.asarray(ours["detection_scores"][0][:n_tf]), tf_scores[:n_tf],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours["detection_boxes"][0][:n_tf]), tf_boxes[:n_tf],
        rtol=1e-4, atol=1e-5,
    )
    print(f"postprocess: decode->softmax->clip->per-class NMS->top-{total} "
          f"matches the TF-op composition ({n_tf} detections, identical "
          "boxes/classes/ordering) OK")

    # --- target assignment vs a TF-ops argmax matcher ---
    # (VERDICT r2 #4b: thresholded argmax + force-match-for-each-row,
    # including argmax tie-breaks — duplicated GT rows create exact ties.)
    from mtlx.assign.matcher import argmax_match
    from mtlx.geometry import box_ops as jbox

    C = 40; R = 6
    ay0 = rs.uniform(0, 50, C); ax0 = rs.uniform(0, 50, C)
    anchors = np.stack(
        [ay0, ax0, ay0 + rs.uniform(5, 20, C), ax0 + rs.uniform(5, 20, C)], 1
    ).astype(np.float32)
    gy0 = rs.uniform(0, 50, R); gx0 = rs.uniform(0, 50, R)
    gt = np.stack(
        [gy0, gx0, gy0 + rs.uniform(5, 20, R), gx0 + rs.uniform(5, 20, R)], 1
    ).astype(np.float32)
    gt[2] = gt[1]  # exact duplicate row -> ties exercise argmax tiebreak
    row_mask = np.asarray([1, 1, 1, 1, 1, 0], bool)  # padded last row

    def tf_iou(b1, b2):
        y11, x11, y12, x12 = tf.split(b1, 4, axis=1)
        y21, x21, y22, x22 = tf.split(b2, 4, axis=1)
        inter_h = tf.maximum(
            0.0, tf.minimum(y12, tf.transpose(y22))
            - tf.maximum(y11, tf.transpose(y21)))
        inter_w = tf.maximum(
            0.0, tf.minimum(x12, tf.transpose(x22))
            - tf.maximum(x11, tf.transpose(x21)))
        inter = inter_h * inter_w
        a1 = (y12 - y11) * (x12 - x11)
        a2 = (y22 - y21) * (x22 - x21)
        union = a1 + tf.transpose(a2) - inter
        return tf.where(inter > 0, inter / union, tf.zeros_like(inter))

    for matched_t, unmatched_t in ((0.7, 0.3), (0.5, 0.5)):
        sim_tf = tf_iou(tf.constant(gt), tf.constant(anchors))
        sim_tf = tf.where(
            tf.constant(row_mask)[:, None], sim_tf,
            tf.fill(tf.shape(sim_tf), -1e9),
        )
        best_row = tf.argmax(sim_tf, axis=0, output_type=tf.int32)
        best_val = tf.reduce_max(sim_tf, axis=0)
        m = tf.where(best_val < unmatched_t, -1, best_row)
        m = tf.where(
            (best_val >= unmatched_t) & (best_val < matched_t), -2, m
        )
        # force-match: each valid row claims its best column; ties between
        # rows resolve to the FIRST row (tf.argmax first-occurrence)
        col_of_row = tf.argmax(sim_tf, axis=1, output_type=tf.int32)
        claims = tf.one_hot(col_of_row, C, dtype=tf.int32)
        claims *= tf.cast(row_mask, tf.int32)[:, None]
        any_claim = tf.reduce_max(claims, axis=0) > 0
        claiming_row = tf.argmax(claims, axis=0, output_type=tf.int32)
        m = tf.where(any_claim, claiming_row, m).numpy()

        sim_ours = jbox.iou(jnp.asarray(gt), jnp.asarray(anchors))
        ours_m = np.asarray(argmax_match(
            sim_ours, row_mask=jnp.asarray(row_mask),
            matched_threshold=matched_t, unmatched_threshold=unmatched_t,
            force_match_for_each_row=True,
        ))
        np.testing.assert_array_equal(ours_m, m)
    print("target assignment: thresholded-argmax + force-match identical "
          "to the TF-op matcher (incl. duplicate-GT tie-breaks) OK")

    print("ALL TF WIRE-COMPAT CHECKS PASSED")


if __name__ == "__main__":
    main()
