"""Probe one (N, K, b, chunk) shape of the class-parallel priority-chunked
multiclass NMS (mcc) on the real TPU, in an isolated process: the r5 sweep
found N=1917 K=90 b=8 reliably kills the remote TPU worker (a shape inside
the _MC_CHUNKED_MIN_N auto-dispatch region), and a worker crash poisons
every later call in the same process.

  python tools/mcc_crash_probe.py --n 1917 --k 90 --b 8 --chunk 128
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1917)
    p.add_argument("--k", type=int, default=90)
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--per_class", type=int, default=100)
    p.add_argument("--stage", default="full",
                   choices=["full", "sort", "sortk", "gather", "topc",
                            "fixed_point", "loop"])
    p.add_argument("--time", action="store_true",
                   help="also time the stage (ms/call, readback-differenced)")
    fl = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mtlx.ops import nms

    print("devices:", jax.devices(), flush=True)
    nms.USE_FIXED_POINT = False
    nms.USE_MC_CHUNKED = True
    nms._MC_CHUNK_SIZE = fl.chunk  # honored verbatim (fence retired)

    rng = np.random.RandomState(0)
    ymin = rng.uniform(0, 600, (fl.b, fl.n, 1))
    xmin = rng.uniform(0, 600, (fl.b, fl.n, 1))
    h = rng.uniform(4, 200, (fl.b, fl.n, 1))
    w = rng.uniform(4, 200, (fl.b, fl.n, 1))
    boxes = jnp.asarray(
        np.concatenate([ymin, xmin, ymin + h, xmin + w], -1)[:, :, None, :]
        .astype(np.float32)
    )  # [B, N, 1, 4]
    scores = jnp.asarray(
        rng.uniform(0, 1, (fl.b, fl.n, fl.k)).astype(np.float32)
    )

    if fl.stage == "full":
        f = jax.jit(lambda bx, sc: nms.batch_multiclass_non_max_suppression(
            bx, sc, score_threshold=1e-8, iou_threshold=0.6,
            max_size_per_class=fl.per_class, max_total_size=fl.per_class,
        ))
        out = f(boxes, scores)
        val = float(jax.device_get(out.scores).sum())
    elif fl.stage == "sort":
        def sort_only(bx, sc):
            masked = jnp.swapaxes(sc, 1, 2)  # [B, K, N]
            _, order = jax.lax.top_k(masked, masked.shape[-1])
            bkn = jnp.broadcast_to(
                jnp.swapaxes(bx, 1, 2), masked.shape + (4,)
            )
            sb = jnp.take_along_axis(bkn, order[..., None], axis=2)
            return jnp.sum(sb)
        val = float(jax.device_get(jax.jit(sort_only)(boxes, scores)))
    elif fl.stage == "fixed_point":
        def fp_only(bx, sc):
            cb = jnp.broadcast_to(
                jnp.swapaxes(bx, 1, 2)[:, :, : fl.chunk],
                (fl.b, fl.k, fl.chunk, 4),
            ).reshape(fl.b * fl.k, fl.chunk, 4)
            cs = jnp.swapaxes(sc, 1, 2)[:, :, : fl.chunk].reshape(
                fl.b * fl.k, fl.chunk
            )
            live = cs > 0
            alive = nms._greedy_survivors_fixed_point(cb, cs, live, 0.6)
            return jnp.sum(alive)
        val = float(jax.device_get(jax.jit(fp_only)(boxes, scores)))
    else:  # loop: the chunked while_loop via vmapped _multiclass_priority_chunked
        def loop_only(bx, sc):
            bkn = jnp.broadcast_to(
                jnp.swapaxes(bx, 1, 2), (fl.b, fl.k, fl.n, 4)
            )
            skn = jnp.swapaxes(sc, 1, 2)
            live0 = skn > 1e-8
            out = jax.vmap(
                lambda b_, s_, l_: nms._multiclass_priority_chunked(
                    b_, s_, l_, 0.6, fl.per_class
                )
            )(bkn, skn, live0)
            return jnp.sum(out[1])
        val = float(jax.device_get(jax.jit(loop_only)(boxes, scores)))

    print(f"OK stage={fl.stage} N={fl.n} K={fl.k} b={fl.b} "
          f"chunk={fl.chunk} -> {val:.3f}", flush=True)

    if fl.time:
        import time

        fns = {"full": None, "sort": None, "fixed_point": None,
               "loop": None}
        del fns  # single-stage timing: reuse the jitted fn from above
        # (re-dispatch through the same stage body)
        def _sync(x):
            return jax.device_get(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])

        if fl.stage == "full":
            g = jax.jit(lambda bx, sc: nms.batch_multiclass_non_max_suppression(
                bx, sc, score_threshold=1e-8, iou_threshold=0.6,
                max_size_per_class=fl.per_class, max_total_size=fl.per_class))
        elif fl.stage == "sort":
            def sort_only(bx, sc):
                masked = jnp.swapaxes(sc, 1, 2)
                _, order = jax.lax.top_k(masked, masked.shape[-1])
                bkn = jnp.broadcast_to(
                    jnp.swapaxes(bx, 1, 2), masked.shape + (4,))
                sb = jnp.take_along_axis(bkn, order[..., None], axis=2)
                return jnp.sum(sb)
            g = jax.jit(sort_only)
        elif fl.stage == "sortk":  # full-width top_k alone, no box gather
            def sortk_only(bx, sc):
                masked = jnp.swapaxes(sc, 1, 2)
                vals, order = jax.lax.top_k(masked, masked.shape[-1])
                return jnp.sum(vals) + jnp.sum(order)
            g = jax.jit(sortk_only)
        elif fl.stage == "gather":  # the [K, N, 4] box gather alone
            def gather_only(bx, sc):
                masked = jnp.swapaxes(sc, 1, 2)
                order = jnp.argsort(-masked, axis=-1)
                bkn = jnp.broadcast_to(
                    jnp.swapaxes(bx, 1, 2), masked.shape + (4,))
                sb = jnp.take_along_axis(bkn, order[..., None], axis=2)
                return jnp.sum(sb)
            g = jax.jit(gather_only)
        elif fl.stage == "topc":  # one chunk-width top_k (the iterative
            # extraction alternative costs ~trips of these)
            def topc_only(bx, sc):
                masked = jnp.swapaxes(sc, 1, 2)
                vals, order = jax.lax.top_k(masked, fl.chunk)
                return jnp.sum(vals) + jnp.sum(order)
            g = jax.jit(topc_only)
        else:
            raise SystemExit("--time supports full/sort/sortk/gather/topc")
        _sync(g(boxes, scores))

        def run(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = g(boxes, scores)
            _sync(out)
            return time.perf_counter() - t0

        run(5)
        t1 = min(run(5) for _ in range(2))
        t2 = min(run(25) for _ in range(2))
        ms = max(t2 - t1, 0.0) / 20 * 1e3
        print(f"TIME stage={fl.stage}: {ms:.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
