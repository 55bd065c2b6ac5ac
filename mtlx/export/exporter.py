"""Model export + standalone inference (reference exporter.py /
export_inference_graph.py, SURVEY.md §4.4).

The frozen-graph/SavedModel concept maps to: a self-contained export
directory holding the pipeline config + an orbax checkpoint of
{params, batch_stats}. `InferenceModel.load` rebuilds the eval-mode
detector and serves the reference's three input types:

  * image_tensor            — [B, H, W, 3] uint8/float arrays
  * encoded_image_string    — list of JPEG/PNG bytes (host decode)
  * tf_example              — list of serialized tf.train.Example

Outputs match the reference contract: detection_boxes (normalized to the
original image), detection_scores, detection_classes (1-based),
num_detections.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np

from mtlx.config import config_util
from mtlx.train import checkpoints as ckpt_lib


def _load_trained(pipeline_config_path: str, trained_checkpoint_dir: str,
                  checkpoint_step: int | None = None,
                  bucket_multiple: int = 0):
    """(configs, eval model, restored state with EMA applied)."""
    import jax

    from mtlx.builders import model_builder
    from mtlx.train.train_step import create_train_state, make_optimizer
    from mtlx.utils import bucketing

    configs = config_util.get_configs_from_pipeline_file(pipeline_config_path)
    # resolve the serving bucket granularity (flag > pipeline `bucketing`
    # block) and record it back so the export's pipeline.config carries
    # the operating point the model trained/serves at
    bucketing.resolve_bucketing(configs.get("bucketing"), bucket_multiple)
    configs["bucketing"].bucket_multiple = bucketing.bucket_multiple()
    model = model_builder.build(configs["model"], is_training=False)
    use_ema = configs["eval_config"].use_moving_averages
    state = create_train_state(
        model, jax.random.PRNGKey(0), make_optimizer(), keep_ema=use_ema
    )
    manager = ckpt_lib.CheckpointManager(trained_checkpoint_dir)
    restored = manager.restore(state, checkpoint_step, params_only=True)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint in {trained_checkpoint_dir}")
    if use_ema and getattr(restored, "ema_params", None) is not None:
        # export the averaged weights (reference exporter reads
        # eval_config.use_moving_averages)
        restored = restored.replace(params=restored.ema_params)
    return configs, model, restored


def export_inference_graph(
    pipeline_config_path: str,
    trained_checkpoint_dir: str,
    output_directory: str,
    checkpoint_step: int | None = None,
    bucket_multiple: int = 0,
) -> str:
    """Bundle config + trained weights into `output_directory`."""
    configs, model, restored = _load_trained(
        pipeline_config_path, trained_checkpoint_dir, checkpoint_step,
        bucket_multiple=bucket_multiple,
    )
    os.makedirs(output_directory, exist_ok=True)
    config_util.save_pipeline_config(
        config_util.create_pipeline_proto_from_configs(configs), output_directory
    )
    ckpt_lib.save_variables(
        os.path.join(output_directory, "variables"),
        {"params": restored.params, "batch_stats": restored.batch_stats},
    )
    with open(os.path.join(output_directory, "export_metadata.json"), "w") as f:
        json.dump({"step": int(restored.step), "format": "mtlx-v1"}, f)
    return output_directory


def export_saved_model(
    pipeline_config_path: str,
    trained_checkpoint_dir: str,
    output_directory: str,
    checkpoint_step: int | None = None,
    bucket_multiple: int = 0,
) -> str:
    """TF SavedModel export for TF-serving stacks (reference exporter.py
    frozen graph / SavedModel contract). Requires TensorFlow at export
    time only; the serving artifact is a plain SavedModel.

    The jitted predict+postprocess is converted with jax2tf (weights
    frozen into the graph, like the reference's frozen inference graph)
    and exposed under the reference's three input-type signatures:

      * serving_default / image_tensor: uint8 [B, H, W, 3] images already
        on the model canvas + int32 [B, 2] true (pre-padding) sizes
      * encoded_image_string: 1-D string tensor of JPEG/PNG blobs —
        TF-ops decode + TF1 resize_images (align_corners=False, the
        reference's convention) + pad-to-canvas feed the same core fn
      * tf_example: 1-D string tensor of serialized tf.train.Examples
        (image/encoded parsed in-graph, then the encoded path)

    Outputs: detection_boxes (normalized to the true image),
    detection_scores, detection_classes (1-based float, as the reference
    emits), num_detections.
    """
    import jax.numpy as jnp
    import tensorflow as tf
    from jax.experimental import jax2tf

    from mtlx.ops import nms as nms_lib

    configs, model, restored = _load_trained(
        pipeline_config_path, trained_checkpoint_dir, checkpoint_step,
        bucket_multiple=bucket_multiple,
    )
    variables = {
        "params": restored.params, "batch_stats": restored.batch_stats
    }
    ch, cw = model.cfg.canvas_size
    kind, params = _resizer_params_of(configs)

    def forward(images, true_shapes):
        pre = model.preprocess(images.astype(jnp.float32))
        pred = model.predict(variables, pre, true_shapes, training=False)
        out = model.postprocess(pred, true_shapes)
        return {
            "detection_boxes": out["detection_boxes"],
            "detection_scores": out["detection_scores"],
            "detection_classes": (out["detection_classes"] + 1).astype(
                jnp.float32
            ),
            "num_detections": out["num_detections"].astype(jnp.float32),
        }

    # keep the exported graph portable: the Pallas NMS kernel is a
    # TPU-only lowering, the jnp path serializes for any platform
    prev = nms_lib.USE_PALLAS
    nms_lib.USE_PALLAS = False
    try:
        tf_forward = jax2tf.convert(
            forward,
            with_gradient=False,
            polymorphic_shapes=[f"(b, {ch}, {cw}, 3)", "(b, 2)"],
        )
    finally:
        nms_lib.USE_PALLAS = prev

    module = tf.Module()
    module.image_tensor = tf.function(
        tf_forward,
        input_signature=[
            tf.TensorSpec([None, ch, cw, 3], tf.uint8, name="image_tensor"),
            tf.TensorSpec([None, 2], tf.int32, name="true_shape"),
        ],
    )

    def _decode_resize_pad(blob):
        img = tf.io.decode_image(blob, channels=3, expand_animations=False)
        shape = tf.shape(img)
        h, w = shape[0], shape[1]
        if kind == "fixed":
            th = tf.constant(params["height"])
            tw = tf.constant(params["width"])
        else:
            scale = tf.minimum(
                params["min_dimension"]
                / tf.cast(tf.minimum(h, w), tf.float64),
                params["max_dimension"]
                / tf.cast(tf.maximum(h, w), tf.float64),
            )
            th = tf.cast(tf.round(tf.cast(h, tf.float64) * scale), tf.int32)
            tw = tf.cast(tf.round(tf.cast(w, tf.float64) * scale), tf.int32)
        # the reference's TF1 resize convention (align_corners=False)
        resized = tf.compat.v1.image.resize_images(
            tf.cast(img, tf.float32)[None], (th, tw), align_corners=False
        )[0]
        resized = tf.cast(tf.math.floor(resized + 0.5), tf.uint8)
        th = tf.minimum(th, ch)
        tw = tf.minimum(tw, cw)
        canvas = tf.image.pad_to_bounding_box(resized[:th, :tw], 0, 0, ch, cw)
        return canvas, tf.stack([th, tw])

    @tf.function(input_signature=[
        tf.TensorSpec([None], tf.string, name="encoded_image")
    ])
    def encoded_image_string(blobs):
        canvases, shapes = tf.map_fn(
            _decode_resize_pad, blobs,
            fn_output_signature=(
                tf.TensorSpec([ch, cw, 3], tf.uint8),
                tf.TensorSpec([2], tf.int32),
            ),
        )
        return module.image_tensor(canvases, shapes)

    module.encoded_image_string = encoded_image_string

    @tf.function(input_signature=[
        tf.TensorSpec([None], tf.string, name="tf_example")
    ])
    def tf_example(serialized):
        parsed = tf.io.parse_example(serialized, {
            "image/encoded": tf.io.FixedLenFeature([], tf.string)
        })
        return encoded_image_string(parsed["image/encoded"])

    module.tf_example = tf_example
    os.makedirs(output_directory, exist_ok=True)

    # reference exporter.py writes frozen_inference_graph.pb alongside the
    # SavedModel: a GraphDef with constant weights and the canonical
    # output node names (detection_boxes/.../num_detections), consumable
    # by TF1-style import_graph_def + Session.run
    from tensorflow.python.framework import convert_to_constants

    @tf.function(input_signature=[
        tf.TensorSpec([None, ch, cw, 3], tf.uint8, name="image_tensor"),
        tf.TensorSpec([None, 2], tf.int32, name="true_shape"),
    ])
    def _named_outputs(images, true_shapes):
        out = tf_forward(images, true_shapes)
        return {k: tf.identity(v, name=k) for k, v in out.items()}

    frozen = convert_to_constants.convert_variables_to_constants_v2(
        _named_outputs.get_concrete_function()
    )
    graph_def = frozen.graph.as_graph_def()
    with open(
        os.path.join(output_directory, "frozen_inference_graph.pb"), "wb"
    ) as f:
        f.write(graph_def.SerializeToString())

    tf.saved_model.save(
        module, output_directory,
        signatures={
            "serving_default": module.image_tensor,
            "image_tensor": module.image_tensor,
            "encoded_image_string": module.encoded_image_string,
            "tf_example": module.tf_example,
        },
    )
    config_util.save_pipeline_config(
        config_util.create_pipeline_proto_from_configs(configs),
        output_directory,
    )
    return output_directory


def _resizer_params_of(configs):
    from mtlx.builders.model_builder import resizer_params

    which = configs["model"].WhichOneof("model")
    return resizer_params(getattr(configs["model"], which).image_resizer)


def _resizer_of(pipeline_config_path: str):
    return _resizer_params_of(
        config_util.get_configs_from_pipeline_file(pipeline_config_path)
    )


class InferenceModel:
    """Standalone detector loaded from an export directory."""

    def __init__(self, model, variables, resizer, bucket_multiple: int = 0):
        import jax

        from mtlx.utils import bucketing

        self.model = model
        # device-commit once: host-resident params would be re-uploaded on
        # every predict call (dominates serving latency on thin links)
        self.variables = jax.device_put(variables)
        self.resizer = resizer
        # per-instance serving granularity (the export's pipeline.config
        # records the trained operating point; `load` passes it so a
        # fresh serving process keeps it without any flag)
        self.bucket_multiple = (
            int(bucket_multiple) or bucketing.bucket_multiple()
        )

        def fn(variables, images, true_shapes):
            pre = model.preprocess(images.astype(np.float32))
            pred = model.predict(variables, pre, true_shapes, training=False)
            return model.postprocess(pred, true_shapes)

        self._fn = jax.jit(fn)

    @classmethod
    def load(cls, export_dir: str) -> "InferenceModel":
        import orbax.checkpoint as ocp

        from mtlx.builders import model_builder
        from mtlx.builders.model_builder import resizer_params

        configs = config_util.get_configs_from_pipeline_file(
            os.path.join(export_dir, "pipeline.config")
        )
        model = model_builder.build(configs["model"], is_training=False)
        variables = ocp.StandardCheckpointer().restore(
            os.path.join(os.path.abspath(export_dir), "variables")
        )
        which = configs["model"].WhichOneof("model")
        resizer = resizer_params(getattr(configs["model"], which).image_resizer)
        bc = configs.get("bucketing")
        return cls(model, variables, resizer,
                   bucket_multiple=int(bc.bucket_multiple) if bc else 0)

    # ---- the three reference input types ----

    def predict_image_tensor(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        """[B, H, W, 3] images already on the model canvas."""
        b, h, w, _ = images.shape
        true_shapes = np.tile([[h, w]], (b, 1)).astype(np.int32)
        return self._postprocess_output(
            self._fn(self.variables, images, true_shapes)
        )

    def predict_encoded_images(self, blobs: Sequence[bytes]) -> Dict[str, np.ndarray]:
        """JPEG bytes in, detections out. Decodes fused-at-target-size
        through the native GIL-free codec thread pool when available
        (serving host path); PIL + python resize otherwise."""
        from mtlx.data import loader as loader_lib

        if loader_lib._imgcodec is not None:
            arrays = None
            # the try covers only the native decode calls: a prediction
            # error must surface, not silently re-route through PIL
            try:
                kind, params = self.resizer
                ths, tws = [], []
                for b in blobs:
                    if kind == "fixed":
                        th, tw = params["height"], params["width"]
                    else:
                        h0, w0 = loader_lib._imgcodec.dims(b)
                        th, tw = loader_lib.keep_aspect_target(h0, w0, **params)
                    ths.append(th)
                    tws.append(tw)
                decoded = loader_lib._imgcodec.decode_batch(
                    list(blobs), ths, tws, 2
                )
                arrays = [
                    np.frombuffer(px, np.uint8).reshape(oh, ow, 3)
                    for px, _, _, oh, ow in decoded
                ]
            except (ValueError, TypeError):
                pass  # non-JPEG input: PIL fallback below
            if arrays is not None:
                return self._predict_decoded(arrays, already_resized=True)
        import io

        from PIL import Image

        arrays = [np.asarray(Image.open(io.BytesIO(b)).convert("RGB")) for b in blobs]
        return self._predict_decoded(arrays)

    def predict_tf_examples(self, serialized: Sequence[bytes]) -> Dict[str, np.ndarray]:
        from mtlx.data.example_decoder import decode_example

        arrays = [decode_example(s)["image"] for s in serialized]
        return self._predict_decoded(arrays)

    def _predict_decoded(self, arrays: List[np.ndarray],
                         already_resized: bool = False) -> Dict[str, np.ndarray]:
        from mtlx.data.loader import resize_fixed, resize_keep_aspect

        canvas_h, canvas_w = self.model.cfg.canvas_size
        # bucketed compute (train_step.pad_batch_to_bucket semantics):
        # serve on the bucket of the batch's max true shape instead of
        # the full padded canvas — fewer backbone rows, same detections
        if getattr(self.model, "supports_bucketed_compute", False):
            _mult = self.bucket_multiple
        else:
            _mult = None
        kind, params = self.resizer
        resized, true_shapes = [], []
        for a in arrays:
            if already_resized:
                pass  # native codec already resized to the target
            elif kind == "keep_aspect":
                a, _ = resize_keep_aspect(a, **params)
            else:
                a = resize_fixed(a, **params)
            th, tw = a.shape[:2]
            resized.append(a[:canvas_h, :canvas_w])
            true_shapes.append([min(th, canvas_h), min(tw, canvas_w)])
        shapes = np.asarray(true_shapes, np.int32)
        if _mult is not None:
            from mtlx.utils.bucketing import bucket_extent

            bh = bucket_extent(shapes[:, 0].max(), canvas_h, _mult)
            bw = bucket_extent(shapes[:, 1].max(), canvas_w, _mult)
        else:
            bh, bw = canvas_h, canvas_w
        images = []
        for a in resized:
            canvas = np.zeros((bh, bw, 3), a.dtype)
            canvas[: a.shape[0], : a.shape[1]] = a
            images.append(canvas)
        out = self._fn(self.variables, np.stack(images), shapes)
        return self._postprocess_output(out)

    @staticmethod
    def _postprocess_output(out) -> Dict[str, np.ndarray]:
        import jax

        out = jax.device_get(out)
        return {
            "detection_boxes": out["detection_boxes"],
            "detection_scores": out["detection_scores"],
            "detection_classes": out["detection_classes"] + 1,  # 1-based ids
            "num_detections": out["num_detections"],
        }


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pipeline_config_path", required=True)
    p.add_argument("--trained_checkpoint_dir", required=True)
    p.add_argument("--output_directory", required=True)
    p.add_argument("--checkpoint_step", type=int, default=None)
    p.add_argument("--saved_model", action="store_true",
                   help="also write a TF SavedModel (jax2tf, frozen "
                        "weights) under <output_directory>/saved_model "
                        "for TF-serving stacks; requires TensorFlow")
    from mtlx.utils.bucketing import bucket_multiple_arg

    p.add_argument("--bucket_multiple", type=bucket_multiple_arg, default=0,
                   help="serving compute-bucket granularity in pixels "
                        "(multiple of 32) — see train.py. Overrides the "
                        "pipeline's `bucketing {}` block and is recorded "
                        "in the export's pipeline.config; default 128")
    args = p.parse_args(argv)
    out = export_inference_graph(
        args.pipeline_config_path,
        args.trained_checkpoint_dir,
        args.output_directory,
        args.checkpoint_step,
        bucket_multiple=args.bucket_multiple,
    )
    print(f"[export] wrote {out}")
    if args.saved_model:
        sm = export_saved_model(
            args.pipeline_config_path,
            args.trained_checkpoint_dir,
            os.path.join(args.output_directory, "saved_model"),
            args.checkpoint_step,
            bucket_multiple=args.bucket_multiple,
        )
        print(f"[export] wrote SavedModel {sm}")


if __name__ == "__main__":
    main()
