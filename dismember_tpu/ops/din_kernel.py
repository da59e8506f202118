"""Fused Pallas TPU kernel for the DIN scorer forward pass.

The serving hot loop (beam search) calls the DIN scorer once per tree level on
a [B, U] candidate frontier.  The XLA path materializes the attention scores,
softmax, attention output and MLP activations in HBM between fusions; this
kernel keeps the whole scorer — scaled-dot attention with padding mask,
bias-free attention Linear, concat-MLP — in VMEM for a batch tile, with the
MLP matmuls on the MXU.

Matches models/din.py:forward bit-for-bit in math (same masking constant,
same reduction order up to float addition): embeddings are pre-gathered by
XLA (gather fuses with the surrounding level loop), the kernel fuses
everything after the gather.

Layout notes (pallas_guide.md): tiles are (8,128)-aligned by the compiler;
per grid step we process TILE_B batch rows; U and E are zero-padded to lane
multiples by the caller when needed.  All intermediates for one tile —
[TILE_B, U, L] scores and [TILE_B·U, 2E] MLP input — stay well under the
~16MB VMEM budget for practical (U ≤ 256, L ≤ 64, E ≤ 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dismember_tpu.constants import MASK_VALUE


def _din_kernel(
    item_e_ref,  # [TB, U, E]
    seq_e_ref,  # [TB, L, E]
    pad_ref,  # [TB, L] float32: 1.0 where padding
    att_w_ref,  # [E, E]
    w1_ref,  # [E, 2E]
    b1_ref,  # [1, E]
    w2_ref,  # [1, E]  (row vector of the final Linear)
    b2_ref,  # [1, 1]
    out_ref,  # [TB, U]
):
    item_e = item_e_ref[:]
    seq_e = seq_e_ref[:]
    tb, u, e = item_e.shape
    l = seq_e.shape[1]

    # attention scores [TB, U, L]: batched contraction over E on the MXU
    scale = 1.0 / jnp.sqrt(jnp.float32(e))
    scores = (
        jax.lax.dot_general(
            item_e,
            seq_e,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    pad = pad_ref[:][:, None, :] > 0.5  # [TB, 1, L]
    scores = jnp.where(pad, MASK_VALUE, scores)
    probs = jax.nn.softmax(scores, axis=-1)

    # attention output [TB, U, E]: batched probs x values on the MXU
    att = jax.lax.dot_general(
        probs,
        seq_e,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # bias-free attention Linear (MXU)
    att2d = att.reshape(tb * u, e)
    att_lin = jnp.dot(att2d, att_w_ref[:].T, preferred_element_type=jnp.float32)

    # concat([item, att_lin]) -> Linear(2E, E) -> ReLU -> Linear(E, 1)
    item2d = item_e.reshape(tb * u, e)
    w1 = w1_ref[:]  # [E, 2E]
    h = (
        jnp.dot(item2d, w1[:, :e].T, preferred_element_type=jnp.float32)
        + jnp.dot(att_lin, w1[:, e:].T, preferred_element_type=jnp.float32)
        + b1_ref[0, :]
    )
    h = jnp.maximum(h, 0.0)
    logit = jnp.dot(
        h, w2_ref[0, :][:, None], preferred_element_type=jnp.float32
    ) + b2_ref[0, 0]
    out_ref[:] = logit.reshape(tb, u)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def din_forward_pallas(
    params,
    items: jnp.ndarray,  # [B, U] int32 codes (-1 invalid)
    seqs: jnp.ndarray,  # [B, L] int32 codes (-1 pad)
    tile_b: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for models.din.forward on TPU."""
    table = params["embedding"]
    e = table.shape[1]
    b, u = items.shape
    l = seqs.shape[1]

    # XLA-side gathers (fuse with the caller); padding -> zero rows
    item_valid = items >= 0
    seq_valid = seqs >= 0
    item_e = table[jnp.where(item_valid, items, 0)] * item_valid[..., None].astype(
        table.dtype
    )
    seq_e = table[jnp.where(seq_valid, seqs, 0)] * seq_valid[..., None].astype(
        table.dtype
    )
    pad = (~seq_valid).astype(jnp.float32)

    # pad B to a tile multiple
    b_pad = (-b) % tile_b
    if b_pad:
        item_e = jnp.pad(item_e, ((0, b_pad), (0, 0), (0, 0)))
        seq_e = jnp.pad(seq_e, ((0, b_pad), (0, 0), (0, 0)))
        pad = jnp.pad(pad, ((0, b_pad), (0, 0)), constant_values=1.0)
    bp = b + b_pad

    grid = (bp // tile_b,)
    out = pl.pallas_call(
        _din_kernel,
        out_shape=jax.ShapeDtypeStruct((bp, u), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, u, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, l, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, 2 * e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, u), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        item_e,
        seq_e,
        pad,
        params["att_linear"]["weight"],
        params["mlp1"]["weight"],
        params["mlp1"]["bias"][None, :],
        params["mlp2"]["weight"],
        params["mlp2"]["bias"][None, :],
    )
    return out[:b]


def make_din_pallas_forward(tile_b: int = 128, interpret: bool = False):
    """Forward with the din.forward signature, for beam search / serving."""

    def forward(params, items, seqs):
        return din_forward_pallas(params, items, seqs, tile_b=tile_b, interpret=interpret)

    return forward
