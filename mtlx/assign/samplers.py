"""Minibatch samplers — static-shape, PRNG-keyed.

Equivalent of the reference's `core/minibatch_sampler.py` +
`core/balanced_positive_negative_sampler.py` (SURVEY.md §3.1): subsample an
indicator vector down to a fixed batch with a target positive fraction
(RPN: 256 @ 0.5; second stage: 64 @ 0.25).

The reference shuffles indices and slices (dynamic shapes). Here selection
is a pure function of a PRNG key with static shapes: each candidate gets a
uniform random score, scores are ranked with a double-argsort, and the mask
keeps ranks below the (traced) quota. `rank < k` with a traced k is a
vectorized compare — no dynamic shapes anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def random_rank(rng: jax.Array, mask: Array) -> Array:
    """Random permutation rank among mask=True entries (invalid entries get
    large ranks)."""
    scores = jax.random.uniform(rng, mask.shape)
    scores = jnp.where(mask, scores, -1.0)
    order = jnp.argsort(-scores)  # descending: valid entries first, random order
    ranks = jnp.argsort(order)
    return ranks


def subsample_mask(rng: jax.Array, mask: Array, k) -> Array:
    """Randomly keep min(k, sum(mask)) True entries of mask; k may be traced."""
    return mask & (random_rank(rng, mask) < k)


def balanced_subsample(
    rng: jax.Array,
    indicator: Array,
    labels: Array,
    batch_size: int,
    positive_fraction: float = 0.5,
):
    """Balanced positive/negative subsampling.

    Args:
      rng: PRNG key.
      indicator: [N] bool — candidates eligible for sampling.
      labels: [N] bool — True for positives.
      batch_size: total samples wanted.
      positive_fraction: max fraction of positives in the batch.

    Returns:
      [N] bool sample mask with at most batch_size True entries, at most
      int(positive_fraction * batch_size) of them positive; negatives fill
      the remainder (fewer if not enough candidates) — reference
      BalancedPositiveNegativeSampler.subsample semantics.
    """
    rng_pos, rng_neg = jax.random.split(rng)
    pos_mask = indicator & labels
    neg_mask = indicator & (~labels)
    max_pos = int(positive_fraction * batch_size)
    num_pos = jnp.minimum(jnp.sum(pos_mask), max_pos)
    sampled_pos = subsample_mask(rng_pos, pos_mask, num_pos)
    num_neg = batch_size - jnp.sum(sampled_pos)
    sampled_neg = subsample_mask(rng_neg, neg_mask, num_neg)
    return sampled_pos | sampled_neg
