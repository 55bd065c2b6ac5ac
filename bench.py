"""Benchmark: Faster R-CNN R50 3-task MTL training throughput (images/sec/chip).

The north-star metric (BASELINE.md): images/sec/chip for Faster R-CNN
ResNet-50 with all three MTL-SSL auxiliary tasks, target >= 2x an A100
running the TF reference. The reference's own numbers are unrecorded
(BASELINE.json "published": {}), so vs_baseline is computed against a
documented assumption: A100_REFERENCE_IMG_PER_SEC = 20.0 (generous estimate
for the TF1-era reference code on an A100; the 2x target is therefore
vs_baseline >= 2.0).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

# NOTE: do NOT set JAX_COMPILATION_CACHE_DIR here — the persistent
# compilation cache deadlocks the remote-compile TPU backend in this
# environment (verified empirically).

import jax
import jax.numpy as jnp
import numpy as np

A100_REFERENCE_IMG_PER_SEC = 20.0

BATCH = 16
CANVAS = (640, 640)
STEPS = 10


def main():
    from mtlx.detector.faster_rcnn import FasterRCNN, FasterRCNNConfig, MTLConfig
    from mtlx.train.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = FasterRCNNConfig(
        num_classes=20,
        canvas_size=CANVAS,
        backbone="resnet50",
        mtl=MTLConfig(multiobject=True, closeness=True, foreground=True),
    )
    model = FasterRCNN(cfg)
    tx = make_optimizer(learning_rate=1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), tx)

    rs = np.random.RandomState(0)
    g = cfg.max_gt_boxes
    boxes = np.zeros((BATCH, g, 4), np.float32)
    n_valid = 8
    for b in range(BATCH):
        y0 = rs.uniform(0, CANVAS[0] - 64, n_valid)
        x0 = rs.uniform(0, CANVAS[1] - 64, n_valid)
        h = rs.uniform(32, 256, n_valid)
        w = rs.uniform(32, 256, n_valid)
        boxes[b, :n_valid] = np.stack(
            [y0, x0, np.minimum(y0 + h, CANVAS[0]), np.minimum(x0 + w, CANVAS[1])], 1
        )
    mask = np.zeros((BATCH, g), bool)
    mask[:, :n_valid] = True
    batch = {
        "image": jnp.asarray(rs.uniform(0, 255, (BATCH, *CANVAS, 3)), jnp.float32),
        "true_shape": jnp.asarray(np.tile([CANVAS], (BATCH, 1)), jnp.int32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rs.randint(0, 20, (BATCH, g)), jnp.int32),
        "gt_mask": jnp.asarray(mask),
    }

    step = jax.jit(make_train_step(model), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    # compile + warmup
    state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["total_loss"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch, rng)
    jax.block_until_ready(metrics["total_loss"])
    dt = time.perf_counter() - t0

    img_per_sec = BATCH * STEPS / dt
    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip_frcnn_r50_mtl3_train",
                "value": round(img_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec / A100_REFERENCE_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
