"""The jitted train step + optimizer construction.

Replaces the reference's trainer core (SURVEY.md §4.1: clones, gradient
averaging, SyncReplicasOptimizer, slim.learning.train step loop) with one
XLA program: forward (both stages + aux heads) -> losses -> grad ->
clip -> SGD-momentum update, data-parallel over the mesh. The reference's
bias-gradient-multiplier and clip-by-norm knobs map to optax transforms.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from mtlx.detector.faster_rcnn import FasterRCNN


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # exponential moving average of params (train_config optimizer
    # use_moving_average, reference [U] builders/optimizer_builder.py);
    # None when disabled
    ema_params: Any = None

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def create_train_state(model: FasterRCNN, rng, tx: optax.GradientTransformation,
                       batch_size: int = 1, keep_ema: bool = False) -> TrainState:
    variables = model.init_variables(rng, batch_size)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", core.freeze({})),
        opt_state=tx.init(params),
        tx=tx,
        ema_params=jax.tree_util.tree_map(jnp.asarray, params) if keep_ema else None,
    )


def make_regularization_fn(scopes) -> Optional[Callable]:
    """Weight regularization from Hyperparams protos (reference slim
    arg_scope regularizers summed into total loss by the trainer,
    SURVEY.md §3.4 hyperparams_builder / §4.1).

    scopes: [(top-level param scope prefix, kind, weight)] where kind is
    'l1_regularizer' | 'l2_regularizer'. TF semantics: l2 = weight *
    sum(w^2)/2 (tf.nn.l2_loss), l1 = weight * sum(|w|); applied to kernel
    weights only (slim regularizes weights, never biases or BN params).
    """
    scopes = [s for s in (scopes or []) if s[2]]
    if not scopes:
        return None

    def reg_fn(params) -> jax.Array:
        total = jnp.zeros((), jnp.float32)
        for scope, kind, weight in scopes:
            for top_key in params:
                if not str(top_key).startswith(scope):
                    continue
                for path, w in jax.tree_util.tree_leaves_with_path(params[top_key]):
                    if getattr(path[-1], "key", None) != "kernel":
                        continue
                    w32 = w.astype(jnp.float32)
                    if kind == "l1_regularizer":
                        total = total + weight * jnp.sum(jnp.abs(w32))
                    else:
                        total = total + weight * 0.5 * jnp.sum(w32 * w32)
        return total

    return reg_fn


def pad_batch_to_canvas(batch: Dict[str, jax.Array], canvas) -> Dict:
    """Restore the static canvas for images that arrived cropped to a
    transfer bucket (loader pack_images): pad bottom/right with zeros —
    exactly the bytes the loader stripped. No-op at full canvas size."""
    ch, cw = canvas
    img = batch["image"]
    h, w = img.shape[1], img.shape[2]
    if (h, w) == (ch, cw):
        return batch
    if h > ch or w > cw:
        raise ValueError(f"image {img.shape} exceeds canvas {canvas}")
    out = dict(batch)
    out["image"] = jnp.pad(img, ((0, 0), (0, ch - h), (0, cw - w), (0, 0)))
    return out


def pad_batch_to_bucket(batch: Dict[str, jax.Array], canvas,
                        multiple: int = 0) -> Dict:
    """Pad a packed batch up to its compute BUCKET (next `multiple`,
    capped at the full canvas) instead of the max canvas: the detector
    computes on the bucket, so the backbone skips the all-zero canvas
    padding entirely — at the VOC operating point (600x1000 true region
    on a 1024x1024 canvas) that is 37% of the rows. Each distinct bucket
    shape is one extra jit specialization; anchors and every in-graph
    normalization follow the bucket (FasterRCNN.anchors_for). Matches
    the reference more closely than full-canvas compute does — its
    dynamic-shape graph never saw padding at all.

    gt instance masks (carried at canvas/mask_stride resolution) are
    cropped to the matching bucket so their frame tracks the images'.
    """
    from mtlx.utils.bucketing import bucket_multiple

    multiple = multiple or bucket_multiple()
    ch, cw = canvas
    img = batch["image"]
    h, w = img.shape[1], img.shape[2]
    if h > ch or w > cw:
        raise ValueError(f"image {img.shape} exceeds canvas {canvas}")
    bh = min(ch, -(-h // multiple) * multiple)
    bw = min(cw, -(-w // multiple) * multiple)
    out = dict(batch)
    if (h, w) != (bh, bw):
        out["image"] = jnp.pad(
            img, ((0, 0), (0, bh - h), (0, bw - w), (0, 0))
        )
    if "gt_instance_masks" in out and out["gt_instance_masks"] is not None:
        m = out["gt_instance_masks"]
        ms = ch // m.shape[2]  # mask stride (loader mask canvas = CH/ms)
        out["gt_instance_masks"] = m[:, :, : bh // ms, : bw // ms]
    return out


def pad_for_model(model, batch: Dict[str, jax.Array]) -> Dict:
    """Bucket padding when the model supports variable compute canvases
    (FasterRCNN/RFCN), full-canvas padding otherwise (SSD anchors are
    fixed to the canvas)."""
    canvas = getattr(getattr(model, "cfg", None), "canvas_size", None)
    if canvas is None:
        return batch
    if getattr(model, "supports_bucketed_compute", False):
        return pad_batch_to_bucket(batch, canvas)
    return pad_batch_to_canvas(batch, canvas)


def freeze_transform(patterns) -> Optional[optax.GradientTransformation]:
    """train_config.freeze_variables: zero the updates of every param
    whose '/'-joined path matches one of the regex patterns (reference
    variables_helper.freeze_gradients_matching_regex — applied to the
    gradients before clipping, so frozen params neither move nor
    contribute to the clip norm)."""
    import re

    patterns = [p for p in (patterns or []) if p]
    if not patterns:
        return None
    compiled = [re.compile(p) for p in patterns]

    def mask(params):
        def hit(path, _):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            return any(c.search(name) for c in compiled)
        return jax.tree_util.tree_map_with_path(hit, params)

    return optax.masked(optax.set_to_zero(), mask)


def bias_multiplier_transform(
    bias_grad_multiplier: float,
) -> Optional[optax.GradientTransformation]:
    """train_config.bias_grad_multiplier: scale the gradients of every
    `bias` param (reference trainer applies it regardless of optimizer
    choice). None when the multiplier is unset."""
    if not bias_grad_multiplier or bias_grad_multiplier <= 0:
        return None

    def bias_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                getattr(k, "key", None) == "bias" for k in path
            ),
            params,
        )

    return optax.masked(optax.scale(bias_grad_multiplier), bias_mask)


def make_optimizer(
    learning_rate: Any = 1e-3,
    momentum: float = 0.9,
    gradient_clipping_by_norm: float = 10.0,
    bias_grad_multiplier: float = 0.0,
    freeze_variables=(),
) -> optax.GradientTransformation:
    """Momentum SGD + grad clip (+ optional bias gradient multiplier and
    frozen-variable patterns), mirroring the reference train_config knobs."""
    chain = []
    bias_tx = bias_multiplier_transform(bias_grad_multiplier)
    if bias_tx is not None:
        chain.append(bias_tx)
    frozen = freeze_transform(freeze_variables)
    if frozen is not None:
        chain.append(frozen)
    if gradient_clipping_by_norm and gradient_clipping_by_norm > 0:
        chain.append(optax.clip_by_global_norm(gradient_clipping_by_norm))
    chain.append(optax.sgd(learning_rate, momentum=momentum))
    return optax.chain(*chain)


def make_train_step(
    model: FasterRCNN,
    regularization_fn: Optional[Callable] = None,
    ema_decay: Optional[float] = None,
) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics). Jit it with
    batch sharded over the data axis; gradients sync via XLA collectives.

    batch: {image [B,H,W,3] uint8/float, true_shape [B,2],
            gt_boxes [B,G,4], gt_classes [B,G], gt_mask [B,G]}.

    regularization_fn(params) -> scalar added to the total loss (the
    reference trainer's regularization-loss summing). ema_decay enables
    the params moving average (train_config optimizer use_moving_average).
    """

    def step(state: TrainState, batch: Dict[str, jax.Array], rng):
        rng = jax.random.fold_in(rng, state.step)
        rng_predict, rng_loss = jax.random.split(rng)
        gt = {
            "boxes": batch["gt_boxes"],
            "classes": batch["gt_classes"],
            "mask": batch["gt_mask"],
        }
        if "gt_instance_masks" in batch:
            gt["instance_masks"] = batch["gt_instance_masks"]
        images = model.preprocess(batch["image"].astype(jnp.float32))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            pred = model.predict(
                variables,
                images,
                batch["true_shape"],
                training=True,
                rng=rng_predict,
                groundtruth=gt,
            )
            losses = dict(model.loss(pred, gt, rng_loss))
            if regularization_fn is not None:
                reg = regularization_fn(params)
                losses["Loss/regularization_loss"] = reg
                losses["total_loss"] = losses["total_loss"] + reg
            new_stats = pred.get("updated_batch_stats", state.batch_stats)
            return losses["total_loss"], (losses, new_stats)

        grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        if ema_decay is not None and state.ema_params is not None:
            d = jnp.float32(ema_decay)
            new_state = new_state.replace(
                ema_params=jax.tree_util.tree_map(
                    lambda e, p: (e * d + p.astype(e.dtype) * (1.0 - d)).astype(e.dtype),
                    state.ema_params,
                    new_state.params,
                )
            )
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def make_eval_step(model: FasterRCNN) -> Callable:
    def step(state: TrainState, batch):
        batch = pad_for_model(model, batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        images = model.preprocess(batch["image"].astype(jnp.float32))
        pred = model.predict(variables, images, batch["true_shape"], training=False)
        return model.postprocess(pred, batch["true_shape"])

    return step
