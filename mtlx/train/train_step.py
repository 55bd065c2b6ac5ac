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

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def create_train_state(model: FasterRCNN, rng, tx: optax.GradientTransformation,
                       batch_size: int = 1) -> TrainState:
    variables = model.init_variables(rng, batch_size)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", core.freeze({})),
        opt_state=tx.init(params),
        tx=tx,
    )


def make_optimizer(
    learning_rate: Any = 1e-3,
    momentum: float = 0.9,
    gradient_clipping_by_norm: float = 10.0,
    bias_grad_multiplier: float = 0.0,
) -> optax.GradientTransformation:
    """Momentum SGD + grad clip (+ optional bias gradient multiplier),
    mirroring the reference train_config knobs."""
    chain = []
    if gradient_clipping_by_norm and gradient_clipping_by_norm > 0:
        chain.append(optax.clip_by_global_norm(gradient_clipping_by_norm))
    if bias_grad_multiplier and bias_grad_multiplier > 0:
        def bias_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: any(
                    getattr(k, "key", None) == "bias" for k in path
                ),
                params,
            )
        chain.append(
            optax.masked(
                optax.scale(bias_grad_multiplier), bias_mask
            )
        )
    chain.append(optax.sgd(learning_rate, momentum=momentum))
    return optax.chain(*chain)


def make_train_step(model: FasterRCNN) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics). Jit it with
    batch sharded over the data axis; gradients sync via XLA collectives.

    batch: {image [B,H,W,3] uint8/float, true_shape [B,2],
            gt_boxes [B,G,4], gt_classes [B,G], gt_mask [B,G]}.
    """

    def step(state: TrainState, batch: Dict[str, jax.Array], rng):
        rng = jax.random.fold_in(rng, state.step)
        rng_predict, rng_loss = jax.random.split(rng)
        gt = {
            "boxes": batch["gt_boxes"],
            "classes": batch["gt_classes"],
            "mask": batch["gt_mask"],
        }
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
            losses = model.loss(pred, gt, rng_loss)
            new_stats = pred.get("updated_batch_stats", state.batch_stats)
            return losses["total_loss"], (losses, new_stats)

        grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def make_eval_step(model: FasterRCNN) -> Callable:
    def step(state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        images = model.preprocess(batch["image"].astype(jnp.float32))
        pred = model.predict(variables, images, batch["true_shape"], training=False)
        return model.postprocess(pred, batch["true_shape"])

    return step
