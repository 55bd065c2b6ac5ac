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


def make_backbone_fwd(model):
    """Backbone-only forward, agnostic to the meta-architecture: FRCNN
    exposes `features`; SSD runs its trunk via the `backbone` submodule."""
    m = model.modules

    def bb_fwd(v, x):
        im = model.preprocess(x)
        if hasattr(m, "features"):
            feats = m.apply(v, im, train=False, method=m.features)
        else:
            feats = m.apply(
                v, im, method=lambda mm, z: mm.backbone(z, train=False)
            )
        return sum(
            jnp.sum(f.astype(jnp.float32)) for f in jax.tree.leaves(feats)
        )

    return bb_fwd


def resolve_config(fl):
    """(config_path, true_shape) for --config/--true_shape; defaults to
    the flagship MTL config at the bench's VOC operating point."""
    import bench

    if not fl.config:
        return bench.CONFIG, tuple(bench.TRUE_SHAPE)
    path = fl.config
    if not os.path.isabs(path) and not os.path.exists(path):
        path = os.path.join(bench._CONFIG_DIR, path)
    if fl.true_shape:
        th, tw = (int(v) for v in fl.true_shape.split(","))
    else:  # a secondary bench point carries its own typical true region
        th, tw = next(
            (ts for _, cfg, ts, _ in bench.SECONDARY_CONFIGS
             if cfg == os.path.basename(path)),
            bench.TRUE_SHAPE,
        )
    return path, (th, tw)


def serving_decompose(fl):
    """Split the serving/eval step (preprocess+predict+postprocess) into
    phases to locate inference hotspots (the bench's
    inference_images_per_sec path)."""
    import bench
    from mtlx.train.train_step import make_eval_step, pad_for_model

    cfg_path, true_shape = resolve_config(fl)
    model, state, _, _ = bench.build_from_config(cfg_path)
    peaks = bench._peaks(jax.devices()[0].device_kind)
    rs = np.random.RandomState(0)
    ch, cw = model.cfg.canvas_size
    th, tw = true_shape
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

    bb_fwd = make_backbone_fwd(model)
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
    ap.add_argument("--config", default=None,
                    help="pipeline config (absolute path or a name under "
                         "configs/, e.g. ssd_inception_v2_voc.config); "
                         "default: the flagship MTL config")
    ap.add_argument("--true_shape", default=None,
                    help="true image region 'H,W' (default: the config's "
                         "bench operating point, else 600,1000)")
    fl = ap.parse_args()
    if fl.bucket_multiple:
        from mtlx.utils.bucketing import set_bucket_multiple

        set_bucket_multiple(fl.bucket_multiple)

    if fl.serving:
        serving_decompose(fl)
        return

    import bench
    from mtlx.train.train_step import pad_for_model

    cfg_path, true_shape = resolve_config(fl)
    model, state, step_fn, _ = bench.build_from_config(cfg_path)
    peaks = bench._peaks(jax.devices()[0].device_kind)
    rs = np.random.RandomState(0)
    batch = bench.synthetic_batch(model, fl.batch, rs,
                                  packed=not fl.full_canvas,
                                  true_shape=true_shape)
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

    bb_fwd = make_backbone_fwd(model)
    timed("backbone fwd", bb_fwd, (variables, images), n, peaks, fl.batch)
    timed("backbone fwd+bwd",
          lambda v, x: jax.grad(lambda vv: bb_fwd(vv, x))(v),
          (variables, images), n, peaks, fl.batch)

    # assignment + mining + loss alone, on a materialized prediction —
    # isolates the non-backbone train cost (the SSD step audit's target:
    # is the 98.7%-of-roofline byte traffic in the trunk or the matcher?)
    try:
        def predict_train(s, b, r):
            r_predict, _ = jax.random.split(jax.random.fold_in(r, s.step))
            gt = {"boxes": b["gt_boxes"], "classes": b["gt_classes"],
                  "mask": b["gt_mask"]}
            imgs = model.preprocess(b["image"].astype(jnp.float32))
            v = {"params": s.params, "batch_stats": s.batch_stats}
            return model.predict(v, imgs, b["true_shape"], training=True,
                                 rng=r_predict, groundtruth=gt)

        pred = jax.jit(predict_train)(state, nb, rng)
        pred = jax.device_put(jax.device_get(pred))
        gt = {"boxes": nb["gt_boxes"], "classes": nb["gt_classes"],
              "mask": nb["gt_mask"]}

        def loss_only(p, g, r):
            losses = dict(model.loss(p, g, r))
            return losses["total_loss"]

        timed("assign+mine+loss only", loss_only, (pred, gt, rng), n,
              peaks, fl.batch)
    except Exception as e:
        print("loss-only phase failed:", repr(e)[:200], flush=True)


if __name__ == "__main__":
    main()
