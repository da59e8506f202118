"""Pallas fused DIN scorer: interpret-mode equivalence with the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.models import din
from dismember_tpu.ops.din_kernel import din_forward_pallas


@pytest.mark.parametrize("b,u,l,e", [(5, 8, 4, 16), (16, 40, 10, 16)])
def test_pallas_matches_xla(b, u, l, e):
    key = jax.random.PRNGKey(0)
    num_index = 127
    params = din.init_params(key, num_index, e)
    k1, k2 = jax.random.split(key)
    items = jax.random.randint(k1, (b, u), -1, num_index)
    seqs = jax.random.randint(k2, (b, l), -1, num_index)
    ref = din.forward(params, items, seqs)
    got = din_forward_pallas(params, items, seqs, tile_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-5)


def test_pallas_handles_all_padding_row(
):
    key = jax.random.PRNGKey(1)
    params = din.init_params(key, 63, 8)
    items = jnp.array([[1, 2]])
    seqs = jnp.full((1, 4), -1)
    ref = din.forward(params, items, seqs)
    got = din_forward_pallas(params, items, seqs, tile_b=1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-5)
