"""Loss functions with reference-equivalent reductions.

- ``bce_with_logits``: max(x,0) - x*z + log1p(exp(-|x|)), size-averaged —
  scalann nn/BCECriterionWithLogits.scala:29-60.
- ``cross_entropy``: LogSoftMax + ClassNLL, size-averaged — scalann
  nn/CrossEntropyCriterion.scala.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Mean binary cross-entropy over all elements (optionally masked).

    weights: same shape as logits; 0 excludes an element from both the sum and
    the denominator (used for padded sample rows).
    """
    x, z = logits, targets
    per = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if weights is None:
        return jnp.mean(per)
    total = jnp.sum(per * weights)
    return total / jnp.maximum(jnp.sum(weights), 1.0)


def cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels.

    logits [N, C], labels [N] int; weights [N] optional row mask.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if weights is None:
        return -jnp.mean(picked)
    return -jnp.sum(picked * weights) / jnp.maximum(jnp.sum(weights), 1.0)
