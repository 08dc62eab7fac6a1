"""Disparity error metrics (utils/metric.py:5-30)."""

from __future__ import annotations

import jax.numpy as jnp


def d1_metric(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Fraction of pixels with error >3px AND >5% of |gt|
    (utils/metric.py:5-8; mean over all pixels, as the reference)."""
    e = jnp.abs(pred - gt)
    bad = (e > 3.0) & (e / jnp.abs(gt) > 0.05)
    return jnp.mean(bad.astype(jnp.float32))


def p1_metric(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Fraction of pixels with error >1px (utils/metric.py:10-13)."""
    return jnp.mean((jnp.abs(pred - gt) > 1.0).astype(jnp.float32))


def thres_metric(
    pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray, thres: float
) -> jnp.ndarray:
    """Fraction of masked pixels with error > thres
    (utils/metric.py:16-30)."""
    m = mask.astype(jnp.float32)
    bad = (jnp.abs(pred - gt) > thres).astype(jnp.float32)
    return jnp.sum(bad * m) / jnp.maximum(jnp.sum(m), 1.0)
