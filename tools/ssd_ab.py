"""Quick A/B of the SSD operating point on the real TPU: train img/s vs
serving img/s (VERDICT r4 #1 done-condition: serving >= train, since a
forward-only step must beat fwd+bwd+loss). Runs only the SSD secondary
config — minutes, not the full bench.

  PYTHONPATH=.:$PYTHONPATH python tools/ssd_ab.py [--mcc off]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mcc", default="auto", choices=["auto", "off"],
                    help="off = force the pre-r5 dispatch (vmapped "
                    "per-class Pallas/greedy) for the A side")
    ap.add_argument("--batch", type=int, default=32)
    fl = ap.parse_args()

    import jax

    import bench
    from mtlx.ops import nms

    if fl.mcc == "off":
        nms.USE_MC_CHUNKED = False

    print("devices:", jax.devices(), flush=True)
    key, fname, true_shape, bs = next(
        c for c in bench.SECONDARY_CONFIGS if c[0].startswith("ssd")
    )
    bs = fl.batch or bs
    import os

    model, state, step_fn, _ = bench.build_from_config(
        os.path.join(bench._CONFIG_DIR, fname)
    )
    rs = np.random.RandomState(0)
    ips, dt, _ = bench.time_batch(
        model, state, step_fn, bs, rs, true_shape=true_shape
    )
    print(f"train: {ips:.1f} img/s (b{bs})", flush=True)
    sv = bench.inference_images_per_sec(
        model, state, batch_size=bs, true_shape=true_shape
    )
    print(f"serving: {sv:.1f} img/s (b{bs})  mcc={fl.mcc}", flush=True)
    print(f"serving/train ratio: {sv / ips:.2f}", flush=True)


if __name__ == "__main__":
    main()
