"""optimizer_builder + learning schedules (reference builders/
optimizer_builder.py + utils/learning_schedules.py, SURVEY.md §3.4/§3.7).

Maps the Optimizer proto to an optax transformation and the LearningRate
proto to an optax schedule. Moving-average of weights (use_moving_average)
is returned as the EMA decay rate; the train step maintains
TrainState.ema_params with it and eval/export read the averaged params
when eval_config.use_moving_averages is set.
"""

from __future__ import annotations

import optax

from mtlx.train.train_step import (
    bias_multiplier_transform,
    freeze_transform,
    make_optimizer,
)


def build_learning_rate(lr_proto):
    kind = lr_proto.WhichOneof("learning_rate")
    if kind is None or kind == "constant_learning_rate":
        return lr_proto.constant_learning_rate.learning_rate
    if kind == "exponential_decay_learning_rate":
        p = lr_proto.exponential_decay_learning_rate
        return optax.exponential_decay(
            init_value=p.initial_learning_rate,
            transition_steps=p.decay_steps,
            decay_rate=p.decay_factor,
            staircase=p.staircase,
        )
    if kind == "manual_step_learning_rate":
        p = lr_proto.manual_step_learning_rate
        boundaries_and_scales = {}
        prev = p.initial_learning_rate
        for s in p.schedule:
            boundaries_and_scales[int(s.step)] = s.learning_rate / prev
            prev = s.learning_rate
        return optax.piecewise_constant_schedule(
            init_value=p.initial_learning_rate,
            boundaries_and_scales=boundaries_and_scales,
        )
    if kind == "cosine_decay_learning_rate":
        p = lr_proto.cosine_decay_learning_rate
        return optax.warmup_cosine_decay_schedule(
            init_value=p.warmup_learning_rate,
            peak_value=p.learning_rate_base,
            warmup_steps=p.warmup_steps,
            decay_steps=p.total_steps,
        )
    raise ValueError(f"unknown learning rate {kind!r}")


def build(optimizer_proto, train_config=None):
    """Returns (optax transformation, schedule-or-constant, ema_decay).

    ema_decay is the moving-average rate when use_moving_average is set
    (proto default true, matching the reference), else None."""
    kind = optimizer_proto.WhichOneof("optimizer")
    clip = train_config.gradient_clipping_by_norm if train_config else 0.0
    bias_mult = train_config.bias_grad_multiplier if train_config else 0.0
    freeze = tuple(train_config.freeze_variables) if train_config else ()
    ema_decay = (
        optimizer_proto.moving_average_decay
        if optimizer_proto.use_moving_average
        else None
    )

    if kind == "momentum_optimizer":
        p = optimizer_proto.momentum_optimizer
        lr = build_learning_rate(p.learning_rate)
        tx = make_optimizer(
            learning_rate=lr,
            momentum=p.momentum_optimizer_value,
            gradient_clipping_by_norm=clip,
            bias_grad_multiplier=bias_mult,
            freeze_variables=freeze,
        )
        return tx, lr, ema_decay

    def _chain(inner):
        # same knob order as make_optimizer's momentum path: the
        # reference trainer applies the bias multiplier and clipping
        # regardless of optimizer choice
        chain = []
        bias_tx = bias_multiplier_transform(bias_mult)
        if bias_tx is not None:
            chain.append(bias_tx)
        frozen = freeze_transform(freeze)
        if frozen is not None:
            chain.append(frozen)
        if clip:
            chain.append(optax.clip_by_global_norm(clip))
        chain.append(inner)
        return optax.chain(*chain)

    if kind == "rms_prop_optimizer":
        p = optimizer_proto.rms_prop_optimizer
        lr = build_learning_rate(p.learning_rate)
        return _chain(optax.rmsprop(
            lr, decay=p.decay, eps=p.epsilon,
            momentum=p.momentum_optimizer_value,
        )), lr, ema_decay
    if kind == "adam_optimizer":
        p = optimizer_proto.adam_optimizer
        lr = build_learning_rate(p.learning_rate)
        return _chain(optax.adam(lr)), lr, ema_decay
    raise ValueError(f"unknown optimizer {kind!r}")
