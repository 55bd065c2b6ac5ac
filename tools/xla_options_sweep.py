"""Sweep XLA TPU compiler options on the flagship train step.

ROADMAP "Known gaps" #4 names XLA flag sweeps as a candidate lever for
the conv-backward ceiling (the FRCNN step sits at ~34% MFU / ~85% HBM
roofline with bytes already minimal — the residual lives in XLA's conv
schedules, below JAX). This tool measures that lever honestly: it
compiles the SAME jitted train step once per compiler-option set via
``lowered.compile(compiler_options=...)`` (per-compile PJRT options —
the only route that reaches a remote-compile backend; process-level
XLA_FLAGS do not) and times each executable at the production operating
point with the bench's honest device_get sync.

Options that this XLA build rejects are reported as "rejected", not
failures — absence of a flag is itself a sweep result. Usage:

  PYTHONPATH=.:$PYTHONPATH python tools/xla_options_sweep.py \
      [--config configs/...] [--batch 16] [--bucket_multiple 32] [--steps 10]

Reference anchor: the TF1 reference has no compiler-tuning surface at
all (SURVEY.md §6.1 — TF1 graph runtime); this is TPU-build-only.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mtlx.utils.bucketing import set_bucket_multiple

# Each entry: (label, {option: value}). Values are strings — PJRT
# env_option_overrides parse them per-flag. Unknown options raise at
# compile time and are reported as rejected.
SWEEP = [
    ("baseline", None),
    # Scoped-VMEM budget: bounds how much VMEM fusions may claim.
    # Larger -> deeper fusions / bigger conv tiles; too large starves
    # double-buffering. v5e has 128 MiB VMEM/core.
    ("scoped_vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("scoped_vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # Memory-space-assignment retries: more aggressive VMEM residency.
    ("msa_max_retries", {"xla_tpu_memory_space_assignment_max_retries": "8"}),
    # Reduce+broadcast fusion off (default on): A/B the BN-stats chains.
    ("rwb_fusion_off", {"xla_tpu_rwb_fusion": "false"}),
    # Let the fusion cost model see through bitcasts (layout changes).
    ("bitcast_opt", {"xla_tpu_enable_bitcast_optimization": "true"}),
    # Flash/latency knobs that exist on some builds; rejected elsewhere.
    ("aggressive_opt", {"xla_tpu_aggressive_opt_barrier_removal": "true"}),
]


def time_executable(compiled, state, batch, rng, steps):
    state = jax.tree_util.tree_map(jnp.array, state)  # donation-safe copy
    state, metrics = compiled(state, batch, rng)
    float(jax.device_get(metrics["total_loss"]))  # true sync (remote backend)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = compiled(state, batch, rng)
    loss = float(jax.device_get(metrics["total_loss"]))
    dt = (time.perf_counter() - t0) / steps
    return dt, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=bench.CONFIG)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bucket_multiple", type=int, default=32)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=2,
                    help="timing repeats per option set (min is reported)")
    fl = ap.parse_args()

    set_bucket_multiple(fl.bucket_multiple)
    model, state, step_fn, _ = bench.build_from_config(fl.config)
    from mtlx.train.train_step import pad_for_model

    rs = np.random.RandomState(0)
    batch = bench.synthetic_batch(model, fl.batch, rs, packed=True)

    def stepped(state, batch, rng):
        return step_fn(state, pad_for_model(model, batch), rng)

    rng = jax.random.PRNGKey(1)
    lowered = jax.jit(stepped, donate_argnums=(0,)).lower(state, batch, rng)

    print(f"# config={os.path.basename(fl.config)} batch={fl.batch} "
          f"bucket_multiple={fl.bucket_multiple} steps={fl.steps} "
          f"device={jax.devices()[0].device_kind}", flush=True)

    base_dt = None
    results = []
    for label, opts in SWEEP:
        try:
            compiled = lowered.compile(compiler_options=opts) if opts \
                else lowered.compile()
        except Exception as e:  # unknown flag / backend rejection
            msg = str(e).splitlines()[0][:120]
            print(f"{label:18s} REJECTED: {msg}", flush=True)
            results.append((label, None))
            continue
        dts = []
        for _ in range(fl.repeats):
            dt, loss = time_executable(compiled, state, batch, rng, fl.steps)
            dts.append(dt)
        dt = min(dts)
        if base_dt is None and label == "baseline":
            base_dt = dt
        rel = (base_dt / dt - 1.0) * 100 if base_dt else 0.0
        ips = fl.batch / dt
        print(f"{label:18s} {dt * 1e3 / fl.batch:6.3f} ms/img  "
              f"{ips:7.2f} img/s  {rel:+5.1f}% vs baseline  "
              f"(loss {loss:.4f})", flush=True)
        results.append((label, dt))

    timed = [(l, d) for l, d in results if d]
    best = min(timed, key=lambda r: r[1])
    print(f"# best: {best[0]} at {fl.batch / best[1]:.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
