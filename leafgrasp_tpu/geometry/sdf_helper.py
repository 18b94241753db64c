"""Standalone SDF utilities (rebuild of scripts/utils/sdf_helper.py).

The reference keeps these as a separate helper class whose logic partly
duplicates the leaf scorer (SURVEY.md 2.3); they are preserved here as
jit-able functions because downstream robot code may call them directly:
global SDF of the leaf union, per-leaf SDF, the approach vector (Sobel
gradient of the leaf SDF at the grasp point, sdf_helper.py:49-76), and
the isolation metric mean(leaf SDF)/max(global SDF)
(sdf_helper.py:78-100).
"""

from __future__ import annotations

import jax.numpy as jnp

from leafgrasp_tpu.ops.edt import edt, signed_edt
from leafgrasp_tpu.ops.conv import sobel_gradients

__all__ = ["global_sdf", "leaf_sdf", "approach_vector", "isolation_metric"]


def global_sdf(all_mask: jnp.ndarray) -> jnp.ndarray:
    """Distance field of the background w.r.t. every leaf: 0 on leaves
    (skfmm.distance on the inverted union, sdf_helper.py:13-36)."""
    return edt(jnp.asarray(all_mask, bool))


def leaf_sdf(leaf_mask: jnp.ndarray) -> jnp.ndarray:
    """Signed per-leaf field: positive inside (sdf_helper.py:38-47 uses
    skfmm.distance(~mask) which is distance-to-leaf outside; the signed
    variant carries both sides and matches the gradient use below)."""
    return signed_edt(leaf_mask)


def approach_vector(leaf_mask: jnp.ndarray, grasp_uv) -> jnp.ndarray:
    """Normalized 2D approach direction = Sobel gradient of the leaf SDF
    at the grasp pixel (sdf_helper.py:49-76)."""
    sdf = leaf_sdf(leaf_mask)
    gx, gy = sobel_gradients(sdf)
    u = jnp.asarray(grasp_uv[0], jnp.int32)
    v = jnp.asarray(grasp_uv[1], jnp.int32)
    g = jnp.stack([gx[v, u], gy[v, u]])
    n = jnp.linalg.norm(g)
    return jnp.where(n > 1e-8, g / jnp.maximum(n, 1e-8),
                     jnp.array([0.0, -1.0]))


def isolation_metric(leaf_mask: jnp.ndarray,
                     all_mask: jnp.ndarray) -> jnp.ndarray:
    """mean(leaf interior distance) / max(global SDF)
    (sdf_helper.py:78-100)."""
    m = jnp.asarray(leaf_mask, bool)
    interior = edt(~m)
    gsdf = global_sdf(all_mask)
    mean_leaf = jnp.sum(interior * m) / jnp.maximum(jnp.sum(m), 1.0)
    return mean_leaf / jnp.maximum(jnp.max(gsdf), 1e-6)
