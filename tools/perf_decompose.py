"""Per-phase time + XLA-cost decomposition of the training step at the
bucketed production operating point.

For each phase this prints ms/img, HBM GB/img and TFLOP/img (from XLA
cost analysis), MFU, and the fraction of the chip's HBM roofline the
phase achieves. Params are committed to device first so host->device
re-uploads never pollute the timings (they did in an early version of
this script: backbone-only "time" was dominated by re-shipping 25M
params per call).

Reference parity note: the upstream TF1 reference exposes per-op timing
only via tf.RunMetadata traces; this tool is the mtlx equivalent,
built on jit cost analysis instead (device XPlane traces hang on this
environment's remote TPU backend — see ROADMAP.md).

Usage (real TPU):
    PYTHONPATH=.:$PYTHONPATH python tools/perf_decompose.py [--batch 8]
        [--iters 10] [--full-canvas]

Representative output (TPU v5e, 2026-08-17, b8 bucketed 640x1024):
    full train step   9.78 ms/img  6.94 GB/img  0.636 TF/img  MFU=33.0%  HBM=86.6%
    forward only      4.02 ms/img  2.18 GB/img  0.215 TF/img  MFU=27.2%  HBM=66.1%
    backbone fwd      1.79 ms/img  0.96 GB/img  0.086 TF/img  MFU=24.3%  HBM=65.8%
    backbone fwd+bwd  5.15 ms/img  4.09 GB/img  0.255 TF/img  MFU=25.1%  HBM=96.9%
The backbone backward IS the step (53% of time) and runs at 97% of the
HBM roofline — at this canvas it is bandwidth speed-of-light; further
gains must come from shipping fewer bytes, not better scheduling. The
full step sits at 87% of roofline overall.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, args, n, peaks, batch=None):
    peak_flops, peak_hbm = peaks
    jfn = jax.jit(fn)
    cost = {}
    try:
        c = jfn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0] if c else {}
        cost = dict(c or {})
    except Exception as e:  # cost analysis is best-effort on some backends
        print(f"{name}: cost analysis unavailable ({e})", flush=True)
    out = jfn(*args)
    jax.device_get(jax.tree.leaves(out)[0])  # sync (block_until_ready
    # under-waits on the remote backend; device_get is the honest fence)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    gb = cost.get("bytes accessed", 0) / 1e9
    tf = cost.get("flops", 0) / 1e12
    b = batch or args_batch(args)
    print(
        f"{name:28s} {dt * 1e3 / b:6.2f} ms/img  {gb / b:6.2f} GB/img  "
        f"{tf / b:6.3f} TF/img  MFU={tf / dt / (peak_flops / 1e12):5.1%}  "
        f"HBM={gb / dt / (peak_hbm / 1e9):5.1%}",
        flush=True,
    )
    return dt


def args_batch(args):
    for a in jax.tree.leaves(args):
        if hasattr(a, "ndim") and a.ndim >= 1:
            return int(a.shape[0]) if a.ndim >= 3 else 8
    return 8


def serving_decompose(fl):
    """Split the serving/eval step (preprocess+predict+postprocess) into
    phases to locate inference hotspots (the bench's
    inference_images_per_sec path)."""
    import bench
    from mtlx.train.train_step import make_eval_step, pad_for_model

    model, state, _, _ = bench.build_from_config()
    peaks = bench._peaks(jax.devices()[0].device_kind)
    rs = np.random.RandomState(0)
    ch, cw = model.cfg.canvas_size
    th, tw = bench.TRUE_SHAPE
    if fl.full_canvas:
        ih, iw = ch, cw
    else:
        from mtlx.utils.bucketing import bucket_extent

        ih = bucket_extent(th, ch)
        iw = bucket_extent(tw, cw)
    b = fl.batch
    batch = {
        "image": jnp.asarray(rs.uniform(0, 255, (b, ih, iw, 3)), jnp.uint8),
        "true_shape": jnp.asarray(np.tile([[th, tw]], (b, 1)), np.int32),
    }
    print("serving compute shape:", (b, ih, iw, 3), flush=True)
    state = jax.device_put(jax.tree.map(jnp.asarray, state))
    batch = jax.device_put(batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    n = fl.iters

    ev = make_eval_step(model)
    timed("full eval step", ev, (state, batch), n, peaks, fl.batch)

    def predict_only(s, bb):
        bb = pad_for_model(model, bb)
        v = {"params": s.params, "batch_stats": s.batch_stats}
        images = model.preprocess(bb["image"].astype(jnp.float32))
        return model.predict(v, images, bb["true_shape"], training=False)

    timed("predict only", predict_only, (state, batch), n, peaks, fl.batch)

    # materialize a prediction dict once, then time postprocess alone
    pred = jax.jit(predict_only)(state, batch)
    pred = jax.device_put(jax.device_get(pred))
    ts = batch["true_shape"]
    timed("postprocess only", model.postprocess, (pred, ts), n, peaks, fl.batch)

    def bb_fwd(v, x):
        feats = model.modules.apply(v, model.preprocess(x), train=False,
                                    method=model.modules.features)
        return jnp.sum(feats.astype(jnp.float32))

    images = jnp.asarray(batch["image"], jnp.float32)
    timed("backbone fwd", bb_fwd, (variables, images), n, peaks, fl.batch)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--full-canvas", action="store_true",
                    help="pad to the full static canvas instead of the "
                         "bucketed true-image region")
    ap.add_argument("--bucket_multiple", type=int, default=0,
                    help="bucket granularity (see train.py "
                         "--bucket_multiple; default 128, 32 is the "
                         "measured-fastest operating point)")
    ap.add_argument("--serving", action="store_true",
                    help="decompose the serving/eval step instead of the "
                         "train step")
    fl = ap.parse_args()
    if fl.bucket_multiple:
        from mtlx.utils.bucketing import set_bucket_multiple

        set_bucket_multiple(fl.bucket_multiple)

    if fl.serving:
        serving_decompose(fl)
        return

    import bench
    from mtlx.train.train_step import pad_for_model

    model, state, step_fn, _ = bench.build_from_config()
    peaks = bench._peaks(jax.devices()[0].device_kind)
    rs = np.random.RandomState(0)
    batch = bench.synthetic_batch(model, fl.batch, rs,
                                  packed=not fl.full_canvas)
    nb = pad_for_model(model, batch)
    print("compute shape:", tuple(nb["image"].shape), flush=True)

    # Commit everything to device ONCE; otherwise every jitted call
    # re-ships host-resident params and the timings measure the tunnel.
    state = jax.tree.map(jnp.asarray, state)
    nb = jax.tree.map(jnp.asarray, nb)
    variables = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    images = jnp.asarray(nb["image"], jnp.float32)
    rng = jax.random.PRNGKey(0)

    n = fl.iters
    timed("full train step", lambda s, b, r: step_fn(s, b, r),
          (state, nb, rng), n, peaks, fl.batch)

    def fwd_loss(s, b, r):
        # forward pass + loss, no backward: isolates bwd cost by subtraction
        r_predict, r_loss = jax.random.split(jax.random.fold_in(r, s.step))
        gt = {"boxes": b["gt_boxes"], "classes": b["gt_classes"],
              "mask": b["gt_mask"]}
        imgs = model.preprocess(b["image"].astype(jnp.float32))
        variables_ = {"params": s.params, "batch_stats": s.batch_stats}
        pred = model.predict(variables_, imgs, b["true_shape"],
                             training=True, rng=r_predict, groundtruth=gt)
        losses = dict(model.loss(pred, gt, r_loss))
        return losses["total_loss"]

    try:
        timed("forward only", fwd_loss, (state, nb, rng), n, peaks, fl.batch)
    except Exception as e:
        print("forward only failed:", repr(e)[:200], flush=True)

    def bb_fwd(v, x):
        feats = model.modules.apply(v, model.preprocess(x), train=False,
                                    method=model.modules.features)
        return jnp.sum(feats.astype(jnp.float32))

    timed("backbone fwd", bb_fwd, (variables, images), n, peaks, fl.batch)
    timed("backbone fwd+bwd",
          lambda v, x: jax.grad(lambda vv: bb_fwd(vv, x))(v),
          (variables, images), n, peaks, fl.batch)


if __name__ == "__main__":
    main()
