"""Vectorized Pareto front (all-max sense) over a padded candidate matrix.

Replaces the ``paretoset`` dependency (reference leaf_scorer.py:158-163).
The candidate count is tiny (<= max_leaves), so the O(k^2) dominance
check is one broadcasted comparison -- fully jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pareto_mask"]


def pareto_mask(scores: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Return the non-dominated mask of `scores` restricted to `valid` rows.

    scores : (K, M) float -- higher is better on every column
             (sense=['max']*M, matching leaf_scorer.py:158).
    valid  : (K,) bool -- padded / filtered rows are never on the front
             and never dominate anyone.
    """
    s = jnp.asarray(scores)
    valid = jnp.asarray(valid, bool)

    ge = jnp.all(s[:, None, :] >= s[None, :, :], axis=-1)   # ge[j,i]: j>=i
    gt = jnp.any(s[:, None, :] > s[None, :, :], axis=-1)    # strict somewhere
    dominates = ge & gt & valid[:, None]                    # j dominates i
    dominated = jnp.any(dominates, axis=0)                  # over j
    return valid & ~dominated
