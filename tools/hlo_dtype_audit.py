"""HLO dtype audit of a compiled train step (VERDICT r4 #4: mirror the
round-3 FRCNN audit for SSD): list the largest tensors that CROSS the
fusion boundary (i.e., reach HBM) and their dtypes. f32 tensors inside a
fusion are free — only fusion parameters/results cost bandwidth, so a
big f32 fusion OUTPUT is a bytes bug when the value could ship bf16.

  PYTHONPATH=.:$PYTHONPATH python tools/hlo_dtype_audit.py \
      --config ssd_inception_v2_voc.config --batch 32 [--top 40]

Works against the remote-compile TPU backend: `lowered.compile()` runs
remotely but `.as_text()` of the optimized module is returned to the
host (the round-3 FRCNN audit used the same path).
"""

import argparse
import re
import sys

import numpy as np

sys.path.insert(0, ".")

_SHAPE_RE = re.compile(r"(bf16|f32|f16|s32|u8|pred|s8|u32)\[([0-9,]*)\]")


def tensor_bytes(dtype: str, dims: str) -> int:
    size = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4,
            "u8": 1, "s8": 1, "pred": 1}[dtype]
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--true_shape", default=None)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--min_mb", type=float, default=1.0)
    fl = ap.parse_args()

    import jax

    import bench
    sys.path.insert(0, "tools")
    from perf_decompose import resolve_config

    cfg_path, true_shape = resolve_config(fl)
    model, state, step_fn, _ = bench.build_from_config(cfg_path)
    rs = np.random.RandomState(0)
    batch = bench.synthetic_batch(model, fl.batch, rs, packed=True,
                                  true_shape=true_shape)
    from mtlx.train.train_step import pad_for_model

    nb = pad_for_model(model, batch)
    rng = jax.random.PRNGKey(0)
    lowered = jax.jit(step_fn, donate_argnums=(0,)).lower(state, nb, rng)
    print("lowered; compiling (remote)...", flush=True)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"optimized HLO: {len(txt)} chars", flush=True)

    # Fusion boundary crossings: root-level instruction RESULT types.
    # Lines inside fusion computations are indented under `fused_computation`
    # blocks; ENTRY/while bodies etc. also cost HBM for their big params.
    # Heuristic (same as the r3 audit): take every instruction line whose
    # RESULT is a large tensor and whose opcode is fusion / convolution /
    # dot / copy / transpose / all-reduce / custom-call — these
    # materialize, unlike ops folded into fusions.
    mat_ops = ("fusion(", "convolution(", "dot(", "copy(", "transpose(",
               "custom-call(", "all-reduce(", "reduce-scatter(",
               "all-gather(", "dynamic-slice(", "dynamic-update-slice(",
               "sort(", "scatter(", "gather(", "reduce-window(")
    rows = []
    # Instructions INSIDE fusion computations are free (no HBM traffic);
    # only count instruction results in materializing computations
    # (ENTRY, while bodies/conditions, called computations). A fusion
    # body opens with `%fused_computation...{` / `%region_...{` and the
    # instructions are the indented lines until the closing brace.
    in_fusion_body = False
    for line in txt.splitlines():
        s = line.strip()
        if not in_fusion_body and re.match(
            r"%?(fused_computation|region_)[\w.\-]*\s.*\{", s
        ):
            in_fusion_body = True
            continue
        if in_fusion_body:
            if s.startswith("}"):
                in_fusion_body = False
            continue
        # opcode = the called operation on the RHS of `=`, first token
        # after the result type (operand names like %transpose.3 or
        # metadata strings must not match)
        rhs = s.split("=", 1)
        if len(rhs) != 2:
            continue
        opm = re.match(r"\s*\S+\s+(\S+?)\(", rhs[1])
        if not opm or opm.group(1) + "(" not in mat_ops:
            continue
        m = _SHAPE_RE.search(rhs[1])
        if not m:
            continue
        dt, dims = m.groups()
        b = tensor_bytes(dt, dims)
        if b < fl.min_mb * 1e6:
            continue
        rows.append((b, dt, dims, opm.group(1), s[:110]))
    rows.sort(reverse=True)
    f32_total = sum(r[0] for r in rows if r[1] == "f32")
    all_total = sum(r[0] for r in rows)
    print(f"\nmaterialized tensors >= {fl.min_mb} MB: {len(rows)}; "
          f"f32 share {f32_total / max(all_total, 1):.1%} "
          f"({f32_total / 1e6:.0f} / {all_total / 1e6:.0f} MB)\n")
    for b, dt, dims, opcode, s in rows[: fl.top]:
        print(f"{b / 1e6:9.1f} MB  {dt:5s} [{dims}]  {opcode:12s} {s[:80]}")


if __name__ == "__main__":
    main()
