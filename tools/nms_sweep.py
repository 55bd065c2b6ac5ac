"""Sweep NMS formulations across (N, K, batch) on the real TPU to set
the dispatch constants in mtlx/ops/nms.py from measured crossovers
(VERDICT r4 #3). Variants:

  greedy   — vmapped sequential greedy loop (max_out steps), XLA
  pallas   — mtlx/kernels/nms_pallas.py VMEM-resident greedy kernel
  chunked  — priority-chunked fixed point (_nms_priority_chunked)
  fp       — class-chunked fixed point (multiclass only; shared-IoU
             when q == 1), at the current element budget
  fp32m    — same with _FIXED_POINT_MAX_ELEMS raised to 32M (bigger
             class chunks, fewer sequential lax.map blocks)

Operating points covered (SURVEY §3.1 post_processing; configs/):
  RPN train     N=6000 -> 300, iou 0.7, batch 16, single class
  RPN serving   same at batch 1
  FRCNN VOC     N=300, K=20, q=K, iou 0.6, 100/100, batch 16
  FRCNN COCO    N=300, K=90, q=K, batch 8
  SSD serving   N=1917, K=20, q=1, iou 0.6, 100/100, batch 32 and 1

  PYTHONPATH=.:$PYTHONPATH python tools/nms_sweep.py

A TPU worker crash (observed once: vmapped priority-chunked at
N=300 K=90 q=90 b=8 killed the remote worker) takes the whole process's
backend with it, so `--case single:3` / `--case multi:0` run ONE grid row
— drive the full sweep as a shell loop of isolated subprocesses:

  for i in 0 1 2 3 4 5 6; do python tools/nms_sweep.py --case single:$i; done
  for i in 0 1 2 3 4 5; do python tools/nms_sweep.py --case multi:$i; done
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def random_boxes(rng, n, scale=600.0):
    ymin = rng.uniform(0, scale, n)
    xmin = rng.uniform(0, scale, n)
    h = rng.uniform(4, scale / 3, n)
    w = rng.uniform(4, scale / 3, n)
    return np.stack([ymin, xmin, ymin + h, xmin + w], 1).astype(np.float32)


def _sync(out):
    """True device sync: a tiny host readback of one output element.
    block_until_ready can return BEFORE execution finishes on the remote
    axon backend (bench.py documents this), so timings must be bounded
    by an actual device->host value dependency."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return jax.device_get(leaf.reshape(-1)[:1])


def bench(fn, args, iters):
    """Per-call device ms via readback differencing: the single scalar
    readback costs a large fixed RTT (~50 ms on the tunnel), so time two
    queued-iteration counts and divide the delta — the RTT and dispatch
    constants cancel, leaving pure device execution time."""
    i1, i2 = iters, iters * 5
    _sync(fn(*args))  # warmup/compile

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0

    run(i1)  # settle
    t1 = min(run(i1) for _ in range(2))
    t2 = min(run(i2) for _ in range(2))
    return max(t2 - t1, 0.0) / (i2 - i1) * 1e3  # ms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--case", default=None,
        help="run one grid row in isolation, e.g. single:3 or multi:0",
    )
    parser.add_argument(
        "--variant", default=None,
        help="run only this variant name (isolates a crash-suspect, e.g. "
        "fp at the COCO q=90 shape where a prior variant killed the "
        "worker and poisoned the rest of the row)",
    )
    cli = parser.parse_args()
    only_kind = only_idx = None
    if cli.case:
        kind, _, idx = cli.case.partition(":")
        only_kind, only_idx = kind, int(idx)

    import jax
    import jax.numpy as jnp

    from mtlx.ops import nms

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    def knobs(pallas=False, chunked=False, fp=None, elems=None,
              mcc=False, mc_chunk=None):
        nms.USE_PALLAS = pallas
        nms.USE_CHUNKED = chunked
        nms.USE_FIXED_POINT = fp
        nms._FIXED_POINT_MAX_ELEMS = elems or 4_000_000
        nms.USE_MC_CHUNKED = mcc
        nms._MC_CHUNK_SIZE = mc_chunk or 256
        # sweep rows measure the named chunk verbatim — the production
        # codegen fence (K>=46 -> chunk 256) would silently re-route
        nms._MC_CHUNK_FENCE_MIN_K = 1 << 30

    results = []

    # ---------- single-class (RPN scale) ----------
    single_grid = [
        # (N, max_out, iou, batch, iters)
        (300, 100, 0.6, 16, 30),
        (512, 100, 0.6, 16, 30),
        (1024, 100, 0.6, 16, 20),
        (1917, 100, 0.6, 16, 20),
        (2048, 300, 0.7, 16, 20),
        (6000, 300, 0.7, 16, 10),
        (6000, 300, 0.7, 1, 20),
    ]
    for case_i, (n, out, iou, b, iters) in enumerate(single_grid):
        if only_kind and (only_kind != "single" or only_idx != case_i):
            continue
        boxes = jnp.asarray(np.stack([random_boxes(rng, n) for _ in range(b)]))
        scores = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
        row = {"case": f"single N={n}->{out} b={b}"}
        for name, kw in [
            ("greedy", {}),
            ("pallas", {"pallas": True}),
            ("chunked", {"chunked": True}),
        ]:
            if cli.variant and name != cli.variant:
                continue
            knobs(**kw)
            f = jax.jit(jax.vmap(
                lambda bx, sc: nms.non_max_suppression_padded(bx, sc, out, iou)
            ))
            try:
                row[name] = bench(f, (boxes, scores), iters)
            except Exception as e:  # pragma: no cover - sweep robustness
                row[name] = float("nan")
                print(f"  {row['case']} {name}: FAILED {e}", flush=True)
        results.append(row)
        print(row, flush=True)

    # ---------- multiclass (postprocess scale) ----------
    multi_grid = [
        # (N, K, q_shared, batch, per_class, total, iou, iters)
        (300, 20, False, 16, 100, 100, 0.6, 20),
        (300, 90, False, 8, 100, 100, 0.6, 10),
        (1024, 20, True, 16, 100, 100, 0.6, 10),
        (1917, 20, True, 32, 100, 100, 0.6, 10),
        (1917, 20, True, 1, 100, 100, 0.6, 30),
        (1917, 90, True, 8, 100, 100, 0.6, 5),
    ]
    for case_i, (n, k, shared, b, per_class, total, iou, iters) in enumerate(
        multi_grid
    ):
        if only_kind and (only_kind != "multi" or only_idx != case_i):
            continue
        q = 1 if shared else k
        boxes = jnp.asarray(
            np.stack([
                np.stack([random_boxes(rng, n) for _ in range(q)], 1)
                for _ in range(b)
            ])
        )  # [B, N, q, 4]
        scores = jnp.asarray(rng.uniform(0, 1, (b, n, k)).astype(np.float32))
        row = {"case": f"multi N={n} K={k} q={q} b={b}"}
        for name, kw in [
            ("greedy", {"fp": False}),
            ("pallas", {"fp": False, "pallas": True}),
            ("chunked", {"fp": False, "chunked": True}),
            ("fp", {"fp": True}),
            ("fp32m", {"fp": True, "elems": 32_000_000}),
            ("mcc64", {"fp": False, "mcc": True, "mc_chunk": 64}),
            ("mcc128", {"fp": False, "mcc": True, "mc_chunk": 128}),
            ("mcc256", {"fp": False, "mcc": True, "mc_chunk": 256}),
            ("mcc512", {"fp": False, "mcc": True, "mc_chunk": 512}),
        ]:
            if cli.variant and name != cli.variant:
                continue
            knobs(**kw)
            f = jax.jit(lambda bx, sc: nms.batch_multiclass_non_max_suppression(
                bx, sc,
                score_threshold=1e-8, iou_threshold=iou,
                max_size_per_class=per_class, max_total_size=total,
            ))
            try:
                row[name] = bench(f, (boxes, scores), iters)
            except Exception as e:  # pragma: no cover
                row[name] = float("nan")
                print(f"  {row['case']} {name}: FAILED {e}", flush=True)
        results.append(row)
        print(row, flush=True)

    knobs(pallas=None, chunked=None, fp=None)
    nms.USE_PALLAS = None
    nms.USE_CHUNKED = None
    nms.USE_FIXED_POINT = None
    nms.USE_MC_CHUNKED = None

    print("\n=== crossover table (ms/call; * = winner) ===")
    for row in results:
        case = row.pop("case")
        best = min((v for v in row.values() if v == v), default=float("nan"))
        cells = "  ".join(
            f"{k}={v:7.2f}{'*' if v == best else ' '}" for k, v in row.items()
        )
        print(f"{case:28s} {cells}")


if __name__ == "__main__":
    main()
