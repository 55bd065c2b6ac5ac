"""Measure compute-bucket granularity below 128 at a milestone operating
point (ROADMAP gap 4 / VERDICT r3 weak 7: the remaining perf levers are
*bytes levers*; bucket granularity is the named one).

The train step computes on the `multiple`-rounded true-image region
(train_step.pad_batch_to_bucket). 128 keeps jit variants few; a finer
granularity ships/computes fewer padding rows where the true region
doesn't land near a 128 boundary. At the R101 COCO point (600x800 true
region) 64-granularity cuts the compute canvas 640x896 -> 640x832
(-7.1% area); at the VOC point (600x1000 -> 640x1024) it changes
nothing. This tool measures the real effect on chip so the tradeoff
(throughput vs bucket-variant count) is data, not guesswork.

Usage (real TPU):
    PYTHONPATH=.:$PYTHONPATH python tools/bucket_sweep.py \
        [--config configs/faster_rcnn_resnet101_mtl_coco.config] \
        [--true 600x800] [--batch 16] [--multiples 128,64,32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/faster_rcnn_resnet101_mtl_coco.config")
    ap.add_argument("--true", default="600x800")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--multiples", default="128,64,32")
    fl = ap.parse_args()

    import bench
    from mtlx.utils.bucketing import bucket_extent, set_bucket_multiple

    th, tw = (int(x) for x in fl.true.split("x"))
    multiples = [int(m) for m in fl.multiples.split(",")]

    model, state, step_fn, _ = bench.build_from_config(fl.config)
    peak_flops, peak_bw = bench._peaks(jax.devices()[0].device_kind)
    canvas = model.cfg.canvas_size
    rs = np.random.RandomState(0)
    bench.STEPS = fl.iters

    results = {}
    for mult in multiples:
        # ONE knob: the packed synthetic batch, pad_for_model's compute
        # bucket, and bench's timing loop all follow the global multiple
        # — exactly the production composition (bench.time_batch handles
        # state copies, cost analysis, warmup and honest device_get sync;
        # non-bucketed models like SSD pad to their fixed canvas)
        set_bucket_multiple(mult)
        ips, dt, cost = bench.time_batch(
            model, state, step_fn, fl.batch, rs, packed=True,
            true_shape=(th, tw),
        )
        bh = bucket_extent(th, canvas[0])
        bw = bucket_extent(tw, canvas[1])
        gb = cost.get("bytes accessed", 0) / 1e9
        tf = cost.get("flops", 0) / 1e12
        results[mult] = ips
        print(
            f"multiple={mult:4d}  bucket={bh}x{bw}  {ips:7.2f} img/s  "
            f"{dt * 1e3 / fl.batch:6.2f} ms/img  {gb / fl.batch:5.2f} GB/img  "
            f"MFU={tf / dt / (peak_flops / 1e12):5.1%}  "
            f"HBM={gb / dt / (peak_bw / 1e9):5.1%}",
            flush=True,
        )

    base_ips = results.get(128) or next(iter(results.values()))
    for mult, ips in results.items():
        print(f"multiple={mult}: {ips / base_ips - 1:+.1%} vs 128")


if __name__ == "__main__":
    main()
