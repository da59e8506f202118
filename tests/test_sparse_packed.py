"""Packed-moments sparse Adam (interleaved m|v in 128-lane physical rows).

The packed path (train/sparse_adam._apply_rows_packed + ops/row_writer.py)
must be bit-compatible with the split-format path: same Adam math, same
dedup/duplicate-sum semantics, same padding handling.  On CPU the Pallas DMA
writer falls back to XLA scatter-set, so these tests exercise the full
selection/merge apparatus (int32 bitcast contractions, physical-row segment
combine) that the TPU path shares.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.ops.row_writer import write_rows_128
from dismember_tpu.train import sparse_adam


@pytest.mark.parametrize("embed", [16, 32, 64])
def test_packed_matches_split_bitwise(embed):
    rng = np.random.default_rng(0)
    v = 1000
    table0 = jnp.asarray(rng.normal(size=(v, embed)), jnp.float32)
    split = sparse_adam.init_state(table0, packed=False)
    packed = sparse_adam.init_state(table0, packed=True)
    assert "mv" in packed and "m" in split

    t_split, t_packed = table0, table0
    for step in range(4):
        r = 64
        codes = rng.integers(0, v, size=r).astype(np.int32)
        codes[: 5 + step] = codes[0]  # duplicates: grads must sum
        codes[-3:] = -1  # padding slots: dropped
        g = rng.normal(size=(r, embed)).astype(np.float32)
        fc = jnp.asarray(codes)
        gj = jnp.asarray(g)
        t_split, split = sparse_adam.apply_rows(t_split, split, fc, gj, 1e-3)
        t_packed, packed = sparse_adam.apply_rows(t_packed, packed, fc, gj, 1e-3)
        # ulp-level tolerance: the split path stores moments via delta-form
        # scatter-add (m + (m_new - m_rows)) while packed stores m_new
        # directly — same Adam math, ±1ulp storage rounding that compounds
        np.testing.assert_allclose(
            np.asarray(t_split), np.asarray(t_packed), rtol=1e-6, atol=1e-7,
            err_msg=f"param tables diverged at step {step}",
        )
        mv = np.asarray(packed["mv"])[:-1]  # drop scratch row
        mv = mv.reshape(-1, 2 * embed)[:v]
        np.testing.assert_allclose(
            np.asarray(split["m"]), mv[:, :embed], rtol=1e-5, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(split["v"]), mv[:, embed:], rtol=1e-5, atol=1e-8
        )


def test_packed_rejected_for_odd_width():
    table = jnp.zeros((10, 48), jnp.float32)  # 2E=96 doesn't divide 128
    state = sparse_adam.init_state(table)
    assert "m" in state
    with pytest.raises(ValueError):
        sparse_adam.init_state(table, packed=True)


def test_write_rows_128_fallback_and_dups():
    table = jnp.arange(12 * 128, dtype=jnp.float32).reshape(12, 128)
    rows = -jnp.ones((4, 128), jnp.float32)
    idx = jnp.asarray([3, 7, 7, 7], jnp.int32)  # dups carry identical payload
    out = np.asarray(write_rows_128(table, idx, rows, use_pallas=False))
    np.testing.assert_array_equal(out[3], -np.ones(128))
    np.testing.assert_array_equal(out[7], -np.ones(128))
    np.testing.assert_array_equal(out[0], np.arange(128))


def test_packed_under_jit_with_donation():
    """The packed step composes with jit + donated buffers (trainer usage)."""
    v, e = 257, 16  # V not divisible by slots-per-row: scratch row padding
    table0 = jnp.asarray(
        np.random.default_rng(1).normal(size=(v, e)), jnp.float32
    )
    state = sparse_adam.init_state(table0, packed=True)

    @jax.jit
    def step(t, s, codes, g):
        return sparse_adam.apply_rows(t, s, codes, g, 1e-2)

    codes = jnp.asarray([0, 1, 1, 256, -1], jnp.int32)
    g = jnp.ones((5, e), jnp.float32)
    t1, s1 = step(table0, state, codes, g)
    # rows 0, 1, 256 moved; everything else untouched
    moved = np.unique([0, 1, 256])
    still = np.setdiff1d(np.arange(v), moved)
    np.testing.assert_array_equal(
        np.asarray(t1)[still], np.asarray(table0)[still]
    )
    assert not np.allclose(np.asarray(t1)[moved], np.asarray(table0)[moved])
    # duplicate code 1 got the summed gradient -> same first-step update as
    # code 0 in magnitude (Adam normalizes), but moments differ
    s = 128 // (2 * e)
    mv = np.asarray(s1["mv"])
    m_row0 = mv[0, :e]
    m_row1 = mv[0, 2 * e : 3 * e] if s > 1 else mv[1 // s, :e]
    np.testing.assert_allclose(m_row1, 2 * m_row0, rtol=1e-6)
