"""Embedding lookup with padding semantics.

Mirrors scalann's LookupTable mixin (nn/mixin/LookupTable.scala:17-96): index
== PADDING_IDX (-1) yields a zero vector and receives no gradient.  On TPU we
implement this as a clamped gather multiplied by a validity mask — XLA fuses
the mask into the gather's consumer, and the multiply-by-zero kills the
backward scatter-add contribution for padded rows exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from dismember_tpu.constants import PADDING_IDX


def embed_lookup(table: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """table [V, E], indices [...], returns [..., E] with -1 -> zeros.

    Reduced-precision tables (bf16 storage for big catalogs) are upcast to
    float32 after the gather so all compute stays f32.
    """
    valid = indices != PADDING_IDX
    safe = jnp.where(valid, indices, 0)
    out = table[safe]
    if out.dtype in (jnp.bfloat16, jnp.float16):
        out = out.astype(jnp.float32)
    return out * valid[..., None].astype(out.dtype)
