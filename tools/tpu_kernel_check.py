"""Validate the Pallas kernels COMPILED on the real TPU against the jnp
references (tests/ run them in interpreter mode on CPU; this closes the
pallas == jnp == numpy triple on hardware). Also times kernel vs XLA.

  PYTHONPATH=. python tools/tpu_kernel_check.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from mtlx.geometry import box_ops
    from mtlx.kernels import iou_pallas, nms_pallas
    from mtlx.ops import nms as nms_ref

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    def random_boxes(n, scale=600.0):
        ymin = rng.uniform(0, scale, n)
        xmin = rng.uniform(0, scale, n)
        h = rng.uniform(4, scale / 3, n)
        w = rng.uniform(4, scale / 3, n)
        return np.stack([ymin, xmin, ymin + h, xmin + w], 1).astype(np.float32)

    # ---- IoU ----
    b1, b2 = jnp.asarray(random_boxes(2048)), jnp.asarray(random_boxes(512))
    got = iou_pallas.iou_matrix(b1, b2)
    want = box_ops.iou(b1, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
    f_pal = jax.jit(iou_pallas.iou_matrix)
    f_xla = jax.jit(box_ops.iou)
    for name, f in [("pallas", f_pal), ("xla", f_xla)]:
        f(b1, b2).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(50):
            out = f(b1, b2)
        out.block_until_ready()
        print(f"iou 2048x512 {name}: {(time.perf_counter() - t0) / 50 * 1e6:.0f} us")

    # ---- NMS ----
    n, k = 6000, 300
    boxes = jnp.asarray(random_boxes(n))
    scores = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    nms_ref.USE_PALLAS = False
    ref_idx, ref_keep = jax.jit(
        lambda b, s: nms_ref.non_max_suppression_padded(b, s, k, 0.7)
    )(boxes, scores)
    got_idx, got_keep = nms_pallas.non_max_suppression_pallas(boxes, scores, k, 0.7)
    np.testing.assert_array_equal(np.asarray(got_keep), np.asarray(ref_keep))
    np.testing.assert_array_equal(
        np.asarray(got_idx)[np.asarray(got_keep)],
        np.asarray(ref_idx)[np.asarray(ref_keep)],
    )
    f_pal = jax.jit(
        lambda b, s: nms_pallas.non_max_suppression_pallas(b, s, k, 0.7)
    )
    f_xla = jax.jit(lambda b, s: nms_ref.non_max_suppression_padded(b, s, k, 0.7))
    for name, f in [("pallas", f_pal), ("xla", f_xla)]:
        jax.block_until_ready(f(boxes, scores))
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(boxes, scores)
        jax.block_until_ready(out)
        print(f"nms 6000->300 {name}: {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms")

    # ---- fused ROI crop (exactness; the einsum form stays production) ----
    from mtlx.kernels.roi_pallas import crop_and_resize_fused
    from mtlx.ops.roi import crop_and_resize_mxu

    img = jnp.asarray(rng.normal(0, 1, (40, 40, 256)), jnp.bfloat16)
    y0 = rng.uniform(0, 0.6, 16)
    x0 = rng.uniform(0, 0.6, 16)
    rboxes = jnp.asarray(
        np.stack([y0, x0, y0 + 0.3, x0 + 0.3], 1), np.float32
    )
    fused = crop_and_resize_fused(img, rboxes, (14, 14)).astype(jnp.float32)
    mxu = crop_and_resize_mxu(img, rboxes, (14, 14)).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(mxu), rtol=2e-2, atol=2e-2)
    print("fused ROI crop matches MXU einsum form on chip")

    # vmapped (per-image / per-class use)
    vb = jnp.stack([boxes[:1024]] * 8)
    vs = jnp.stack([scores[:1024]] * 8)
    vidx, vkeep = jax.jit(
        jax.vmap(lambda b, s: nms_pallas.non_max_suppression_pallas(b, s, 100, 0.6))
    )(vb, vs)
    print("vmapped pallas NMS ok:", vidx.shape, flush=True)
    print("ALL TPU KERNEL CHECKS PASSED")


if __name__ == "__main__":
    main()
