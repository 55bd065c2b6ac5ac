"""BoxList containers (jnp pytree + numpy) — reference API parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlx.geometry import box_list as bl
from mtlx.geometry import np_box_list as nbl


def test_jnp_boxlist_fields_and_ops():
    b = bl.BoxList(
        jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 20.0, 25.0]]),
        scores=jnp.asarray([0.9, 0.4]),
    )
    assert b.num_boxes() == 2
    assert b.has_field("scores") and b.get_extra_fields() == ["scores"]
    np.testing.assert_allclose(b.area(), [100.0, 300.0])
    g = b.gather(jnp.asarray([1]))
    np.testing.assert_allclose(g.get_field("scores"), [0.4])
    clipped = b.clip_to_window(jnp.asarray([0.0, 0.0, 15.0, 15.0]))
    np.testing.assert_allclose(clipped.get()[1], [5.0, 5.0, 15.0, 15.0])


def test_jnp_boxlist_is_pytree():
    b = bl.BoxList(jnp.zeros((3, 4)), scores=jnp.ones(3))

    @jax.jit
    def f(boxlist):
        return boxlist.scale(2.0, 2.0)

    out = f(b)
    assert out.num_boxes() == 3
    np.testing.assert_allclose(out.get_field("scores"), 1.0)


def test_jnp_boxlist_concat_and_sort():
    a = bl.BoxList(jnp.zeros((2, 4)), scores=jnp.asarray([0.1, 0.9]))
    b = bl.BoxList(jnp.ones((1, 4)), scores=jnp.asarray([0.5]))
    cat = bl.concatenate([a, b])
    assert cat.num_boxes() == 3
    s = bl.sort_by_field(cat, "scores")
    np.testing.assert_allclose(s.get_field("scores"), [0.9, 0.5, 0.1])


def test_np_boxlist_validation_and_nms():
    with pytest.raises(ValueError):
        nbl.BoxList(np.asarray([[10.0, 0.0, 0.0, 10.0]]))  # ymax < ymin
    b = nbl.BoxList(
        np.asarray([[0, 0, 10, 10], [0, 0, 10, 10.5], [50, 50, 60, 60]], np.float32)
    )
    b.add_field("scores", np.asarray([0.8, 0.9, 0.7]))
    kept = nbl.non_max_suppression(b, max_output_size=5, iou_threshold=0.5)
    np.testing.assert_allclose(kept.get_field("scores"), [0.9, 0.7])
    srt = nbl.sort_by_field(b, "scores")
    assert srt.get_field("scores")[0] == 0.9
    assert nbl.iou(b, b).shape == (3, 3)
