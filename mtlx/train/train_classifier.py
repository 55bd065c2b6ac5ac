"""Classification pretraining CLI (reference slim
train_image_classifier.py, SURVEY.md §3.8: the path that produces the
ImageNet-init checkpoints the detector warm-starts from).

  python -m mtlx.train.train_classifier --model=resnet50 \
      --train_record=/data/imagenet_train.record --num_classes=1000 \
      --train_dir=/ckpt/r50_cls [--image_size=224] [--batch_size=256]

Input: TFRecords of Examples with `image/encoded` + `image/class/label`
(the slim dataset schema). Checkpoints are saved in the detector's
warm-start layout: the classifier's `body` subtree maps onto the
detector's `backbone` subtree via --export_backbone.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="resnet50",
                   choices=["resnet50", "resnet101", "resnet152", "mobilenet_v1"])
    p.add_argument("--train_record", required=True)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_steps", type=int, default=1000)
    p.add_argument("--learning_rate", type=float, default=0.1)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--platform", default=None)
    p.add_argument("--export_backbone", default=None,
                   help="after training, write a detector-warm-startable "
                        "checkpoint (backbone subtree) to this path")
    return p.parse_args(argv)


def _decode_batch(records, image_size):
    import io

    from PIL import Image

    from mtlx.config.protos import example_pb2

    images, labels = [], []
    for rec in records:
        ex = example_pb2.Example()
        ex.ParseFromString(rec)
        fmap = ex.features.feature
        raw = fmap["image/encoded"].bytes_list.value[0]
        img = Image.open(io.BytesIO(raw)).convert("RGB")
        img = img.resize((image_size, image_size), Image.BILINEAR)
        images.append(np.asarray(img, np.float32))
        labels.append(int(fmap["image/class/label"].int64_list.value[0]))
    return np.stack(images), np.asarray(labels, np.int64)


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import optax

    from mtlx.backbones import mobilenet, resnet
    from mtlx.data import tfrecord
    from mtlx.train import checkpoints as ckpt_lib

    if args.model.startswith("resnet"):
        model = resnet.ResNetClassifier(
            depth=int(args.model[6:]), num_classes=args.num_classes
        )
        preprocess = resnet.preprocess_images
    else:
        model = mobilenet.MobileNetV1Classifier(num_classes=args.num_classes)
        preprocess = lambda x: x * (2.0 / 255.0) - 1.0

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.image_size, args.image_size, 3)),
        )
    variables = jax.tree_util.tree_map(np.asarray, variables)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.sgd(
            optax.cosine_decay_schedule(args.learning_rate, args.num_steps),
            momentum=0.9,
        ),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, images, labels):
        # live BN (slim classification trains batch norm; the moving
        # stats learned here are what detector warm starts consume)
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                preprocess(images), train=True, mutable=["batch_stats"],
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            return jnp.mean(ce), (acc, mutated["batch_stats"])

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, opt_state,
                loss, acc)

    offsets = tfrecord.record_index(args.train_record)
    rng = np.random.RandomState(0)
    f = open(args.train_record, "rb")
    t0 = time.time()
    for i in range(args.num_steps):
        idx = rng.choice(len(offsets), args.batch_size)
        records = [tfrecord.read_record_at(f, offsets[j]) for j in idx]
        images, labels = _decode_batch(records, args.image_size)
        params, batch_stats, opt_state, loss, acc = step(
            params, batch_stats, opt_state, images, labels
        )
        if (i + 1) % args.log_every == 0 or i == 0:
            print(
                "[cls] "
                + json.dumps(
                    {
                        "step": i + 1,
                        "loss": round(float(loss), 4),
                        "accuracy": round(float(acc), 4),
                        "images_per_sec": round(
                            args.batch_size * (i + 1) / (time.time() - t0), 1
                        ),
                    }
                ),
                flush=True,
            )

    ckpt_lib.save_variables(
        f"{args.train_dir}/classifier", {"params": params, "batch_stats": batch_stats}
    )
    if args.export_backbone:
        # remap classifier body -> detector backbone names for warm start;
        # the resnet classifier keeps block4 OUTSIDE `body` (it is the
        # detector's second-stage classifier_backbone) — dropping it would
        # leave ~15M second-stage params at random init after warm start
        body_params = params.get("body", params)
        body_stats = batch_stats.get("body", batch_stats) if batch_stats else {}
        export = {
            "params": {"backbone": body_params},
            "batch_stats": {"backbone": body_stats},
        }
        if "block4" in params:
            export["params"]["classifier_backbone"] = {
                "block4": params["block4"]
            }
            if batch_stats and "block4" in batch_stats:
                export["batch_stats"]["classifier_backbone"] = {
                    "block4": batch_stats["block4"]
                }
        ckpt_lib.save_variables(args.export_backbone, export)
        print(f"[cls] exported backbone warm-start checkpoint to {args.export_backbone}")
    print("[cls] done", flush=True)


if __name__ == "__main__":
    main()
