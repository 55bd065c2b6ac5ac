"""Matchers — anchor/groundtruth matching from a similarity matrix.

Functional equivalents of the reference's `matchers/argmax_matcher.py` and
`matchers/bipartite_matcher.py` plus the `core/matcher.py` Match wrapper
(SURVEY.md §3.1–3.2). A match result is an int32 vector of length
num_columns (anchors) with values:

    >= 0  : matched to that groundtruth row
    -1    : unmatched (negative)
    -2    : ignored (between thresholds)

All functions take a `row_mask` marking valid (non-padding) groundtruth
rows; padded rows can never match, and an image with zero valid rows yields
all-unmatched — the static-shape replacement for the reference's dynamic
`tf.cond` on empty groundtruth.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

MATCHED = 0  # values >= 0
UNMATCHED = -1
IGNORED = -2

_NEG = -1e9


def argmax_match(
    similarity: Array,
    row_mask: Optional[Array] = None,
    matched_threshold: float = 0.5,
    unmatched_threshold: float = 0.5,
    negatives_lower_than_unmatched: bool = True,
    force_match_for_each_row: bool = True,
) -> Array:
    """Thresholded argmax matching (reference ArgMaxMatcher semantics).

    Args:
      similarity: [R, C] similarity (rows = groundtruth, cols = anchors).
      row_mask: [R] bool validity of rows; padded rows never match.
      matched_threshold: similarity >= this -> matched.
      unmatched_threshold: similarity < this -> unmatched; values in
        [unmatched, matched) are ignored (or the swapped convention when
        negatives_lower_than_unmatched=False).
      force_match_for_each_row: every valid row captures its own best
        column, overriding thresholds (RPN force-matching).

    Returns: [C] int32 match vector.
    """
    if matched_threshold < unmatched_threshold:
        raise ValueError("matched_threshold must be >= unmatched_threshold")
    sim = similarity
    if row_mask is not None:
        sim = jnp.where(row_mask[:, None], sim, _NEG)
    num_rows = sim.shape[0]

    best_row = jnp.argmax(sim, axis=0)  # [C]
    best_val = jnp.max(sim, axis=0)  # [C]

    below_unmatched = best_val < unmatched_threshold
    between = (best_val >= unmatched_threshold) & (best_val < matched_threshold)
    if negatives_lower_than_unmatched:
        matches = jnp.where(below_unmatched, UNMATCHED, best_row)
        matches = jnp.where(between, IGNORED, matches)
    else:
        matches = jnp.where(below_unmatched, IGNORED, best_row)
        matches = jnp.where(between, UNMATCHED, matches)

    if force_match_for_each_row and num_rows > 0:
        # Each valid row forces a match at its own best column.
        col_of_row = jnp.argmax(sim, axis=1)  # [R]
        # one-hot [R, C]: row r claims column col_of_row[r]
        claims = jax.nn.one_hot(col_of_row, sim.shape[1], dtype=jnp.int32)
        if row_mask is not None:
            claims = claims * row_mask.astype(jnp.int32)[:, None]
        # also never claim via an all-padding similarity row
        row_has_signal = jnp.max(sim, axis=1) > _NEG / 2
        claims = claims * row_has_signal.astype(jnp.int32)[:, None]
        any_claim = jnp.max(claims, axis=0) > 0  # [C]
        # If several rows claim one column, the LOWEST row index wins:
        # tf.argmax over the one-hot claims returns the first maximal row,
        # and jnp.argmax has the same first-occurrence tiebreak.
        claiming_row = jnp.argmax(claims, axis=0)
        matches = jnp.where(any_claim, claiming_row, matches)
    return matches.astype(jnp.int32)


def greedy_bipartite_match(
    similarity: Array,
    row_mask: Optional[Array] = None,
    col_mask: Optional[Array] = None,
) -> Array:
    """Greedy bipartite matching (reference tf.image.bipartite_match is the
    greedy algorithm, not Hungarian): repeatedly pick the globally best
    (row, col) pair, remove both, until rows are exhausted.

    Returns [C] int32 match vector (>=0 matched row, -1 unmatched).
    """
    sim = similarity
    if row_mask is not None:
        sim = jnp.where(row_mask[:, None], sim, _NEG)
    if col_mask is not None:
        sim = jnp.where(col_mask[None, :], sim, _NEG)
    num_rows, num_cols = sim.shape

    def body(_, state):
        s, matches = state
        flat = jnp.argmax(s)
        r, c = flat // num_cols, flat % num_cols
        valid = s[r, c] > _NEG / 2
        matches = jnp.where(
            valid, matches.at[c].set(r.astype(jnp.int32)), matches
        )
        s = jnp.where(valid, s.at[r, :].set(_NEG).at[:, c].set(_NEG), s)
        return s, matches

    matches = jnp.full((num_cols,), UNMATCHED, dtype=jnp.int32)
    _, matches = jax.lax.fori_loop(0, num_rows, body, (sim, matches))
    return matches


def matched_column_mask(match: Array) -> Array:
    return match >= 0


def unmatched_column_mask(match: Array) -> Array:
    return match == UNMATCHED


def ignored_column_mask(match: Array) -> Array:
    return match == IGNORED


def gather_based_on_match(
    match: Array, gathered: Array, unmatched_value, ignored_value=None
) -> Array:
    """For each column, pick gathered[match] when matched, else the
    unmatched/ignored fill value (reference Match.gather_based_on_match)."""
    if ignored_value is None:
        ignored_value = unmatched_value
    safe = jnp.clip(match, 0, gathered.shape[0] - 1)
    picked = jnp.take(gathered, safe, axis=0)
    unmatched_value = jnp.asarray(unmatched_value, dtype=picked.dtype)
    ignored_value = jnp.asarray(ignored_value, dtype=picked.dtype)
    expand = (slice(None),) + (None,) * (picked.ndim - 1)
    out = jnp.where((match >= 0)[expand], picked, unmatched_value)
    out = jnp.where((match == IGNORED)[expand], ignored_value, out)
    return out


def make_argmax_matcher(
    matched_threshold: float,
    unmatched_threshold: Optional[float] = None,
    negatives_lower_than_unmatched: bool = True,
    force_match_for_each_row: bool = False,
):
    """Factory used by the builders layer."""
    if unmatched_threshold is None:
        unmatched_threshold = matched_threshold
    return partial(
        argmax_match,
        matched_threshold=matched_threshold,
        unmatched_threshold=unmatched_threshold,
        negatives_lower_than_unmatched=negatives_lower_than_unmatched,
        force_match_for_each_row=force_match_for_each_row,
    )
