"""BoxList — tensor-backed box container (reference core/box_list.py).

The mtlx hot path works on plain arrays (mtlx.geometry.box_ops); this
container exists for API parity and for code that carries named per-box
fields (scores, classes, masks) together. It is a registered pytree, so it
passes through jit/vmap transparently.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
from jax import Array

from mtlx.geometry import box_ops


@jax.tree_util.register_pytree_node_class
class BoxList:
    """[N, 4] boxes ([ymin, xmin, ymax, xmax]) + named extra fields."""

    def __init__(self, boxes: Array, **fields):
        boxes = jnp.asarray(boxes)
        if boxes.ndim != 2 or boxes.shape[-1] != 4:
            raise ValueError(f"boxes must be [N, 4], got {boxes.shape}")
        self._data: Dict[str, Array] = {"boxes": boxes, **fields}

    # --- reference API ---

    def num_boxes(self) -> int:
        return self._data["boxes"].shape[0]

    def get(self) -> Array:
        return self._data["boxes"]

    def set(self, boxes: Array) -> None:
        self._data["boxes"] = boxes

    def get_field(self, name: str) -> Array:
        return self._data[name]

    def add_field(self, name: str, value: Array) -> None:
        value = jnp.asarray(value)
        n = self.num_boxes()
        if value.ndim == 0 or value.shape[0] != n:
            # np_box_list raises on this too; a silent mismatch would
            # be clamped (not error) by later jnp.take gathers
            raise ValueError(
                f"field {name!r} has leading dim "
                f"{value.shape[0] if value.ndim else None}, expected {n}"
            )
        self._data[name] = value

    def has_field(self, name: str) -> bool:
        return name in self._data

    def get_extra_fields(self) -> List[str]:
        return [k for k in self._data if k != "boxes"]

    # --- ops mirroring box_list_ops on the container ---

    def area(self) -> Array:
        return box_ops.area(self.get())

    def gather(self, indices: Array) -> "BoxList":
        return BoxList(
            jnp.take(self.get(), indices, axis=0),
            **{
                k: jnp.take(v, indices, axis=0)
                for k, v in self._data.items()
                if k != "boxes"
            },
        )

    def clip_to_window(self, window: Array) -> "BoxList":
        out = self.copy()
        out.set(box_ops.clip_to_window(self.get(), window))
        return out

    def scale(self, y_scale, x_scale) -> "BoxList":
        out = self.copy()
        out.set(box_ops.scale(self.get(), y_scale, x_scale))
        return out

    def copy(self) -> "BoxList":
        return BoxList(self.get(), **{k: v for k, v in self._data.items() if k != "boxes"})

    # --- pytree protocol ---

    def tree_flatten(self):
        keys = sorted(self._data)
        return [self._data[k] for k in keys], tuple(keys)

    @classmethod
    def tree_unflatten(cls, keys, values):
        data = dict(zip(keys, values))
        obj = cls.__new__(cls)
        obj._data = data
        return obj


def concatenate(boxlists: List[BoxList]) -> BoxList:
    """reference box_list_ops.concatenate: shared fields are concatenated."""
    fields = set(boxlists[0].get_extra_fields())
    for b in boxlists[1:]:
        fields &= set(b.get_extra_fields())
    return BoxList(
        jnp.concatenate([b.get() for b in boxlists], axis=0),
        **{
            f: jnp.concatenate([b.get_field(f) for b in boxlists], axis=0)
            for f in fields
        },
    )


def sort_by_field(boxlist: BoxList, field: str, descending: bool = True) -> BoxList:
    values = boxlist.get_field(field)
    order = jnp.argsort(-values if descending else values)
    return boxlist.gather(order)
