"""Top-k candidate extraction with minimum-spacing suppression.

Replaces the reference's host-side greedy argsort loop
(grasp_point_selector.py:447-482) with a fixed-length ``lax.scan`` of
masked argmaxes -- static shapes, fully on-device.

Equivalence note: the reference accepts a point iff its
(2r+1)x(2r+1) box does not intersect any previously-marked box, which is
exactly "Chebyshev distance to every accepted candidate > 2r".  So k
iterations of {argmax; suppress a Chebyshev ball of radius 2r} reproduce
the reference's candidate set and order (up to ties between exactly equal
scores, which the reference breaks by descending flat index and we break
by ascending flat index -- impossible for distinct float scores).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["Candidates", "topk_min_distance"]

_NEG = jnp.float32(-jnp.inf)


class Candidates(NamedTuple):
    x: jnp.ndarray        # (k,) int32 column coordinates
    y: jnp.ndarray        # (k,) int32 row coordinates
    score: jnp.ndarray    # (k,) float32 score at the point (pre-suppression)
    accepted: jnp.ndarray  # (k,) bool: False once the frame ran out of pixels


@functools.partial(jax.jit, static_argnames=("k", "min_distance"))
def topk_min_distance(score: jnp.ndarray, valid: jnp.ndarray,
                      k: int = 20, min_distance: int = 10) -> Candidates:
    """Greedy spaced top-k of ``score * valid`` (reference semantics:
    invalid pixels participate with score 0, grasp_point_selector.py:452)."""
    h, w = score.shape
    masked = jnp.where(jnp.asarray(valid, bool),
                       jnp.asarray(score, jnp.float32), 0.0)
    radius = 2 * min_distance

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def step(s, _):
        idx = jnp.argmax(s)
        y = (idx // w).astype(jnp.int32)
        x = (idx % w).astype(jnp.int32)
        val = s.reshape(-1)[idx]
        suppress = ((jnp.abs(rows - y) <= radius)
                    & (jnp.abs(cols - x) <= radius))
        s = jnp.where(suppress, _NEG, s)
        return s, (x, y, val)

    _, (xs, ys, vals) = jax.lax.scan(step, masked, None, length=k)
    return Candidates(x=xs, y=ys, score=vals,
                      accepted=jnp.isfinite(vals))
