"""Gradient compression codec for cross-slice (DCN) exchange.

Capability parity with the reference's FP16CompressedTensor
(scalann parameters/FP16CompressedTensor.scala — fp32→fp16 truncation
compress / decompress / parallel-add, a parameter-server heritage that is
unused in-repo but part of the surface).  On TPU, intra-slice gradient
reduction rides ICI inside pjit and needs no codec; these helpers halve
gradient bytes for DCN-side aggregation between slices, using bf16 (native
TPU dtype; fp16 offered for byte-compatibility with the reference's codec
semantics of dropping mantissa bits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compress(tree, dtype=jnp.bfloat16):
    """fp32 pytree -> reduced-precision pytree (truncation, like the
    reference's fp16 truncation compress)."""
    return jax.tree.map(lambda x: x.astype(dtype), tree)


def decompress(tree, dtype=jnp.float32):
    return jax.tree.map(lambda x: x.astype(dtype), tree)


def compressed_add(a, b, acc_dtype=jnp.float32):
    """Add two compressed pytrees with fp32 accumulation (parAdd parity:
    the reference sums fp16 buffers slice-parallel; accumulating in fp32
    avoids its precision loss)."""
    return jax.tree.map(
        lambda x, y: (x.astype(acc_dtype) + y.astype(acc_dtype)).astype(x.dtype),
        a,
        b,
    )
