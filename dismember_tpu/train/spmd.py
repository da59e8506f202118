"""SPMD train step: pjit over the ('data','model') mesh.

Wraps the single-chip TDM train step with explicit shardings:
- target/sequence batches sharded on 'data' (per-device sub-batch; gradient
  mean-psum is emitted by sharded autodiff — the reference's hand-rolled
  slice reduction, tdm LocalOptimizer.scala:164-187, becomes implicit);
- embedding/node tables row-sharded on 'model' (north-star P3);
- Adam moments inherit the parameter sharding (P2).

The embedding row count must be padded to a multiple of the 'model' axis; use
:func:`padded_num_index`.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from dismember_tpu.core import mesh as meshlib
from dismember_tpu.models.losses import bce_with_logits


def padded_num_index(num_index: int, mesh) -> int:
    return meshlib.round_up(num_index, mesh.shape[meshlib.MODEL_AXIS])


def make_sharded_train_step(
    forward: Callable,
    sampler,
    optimizer: optax.GradientTransformation,
    mesh,
    params: Any,
    opt_state: Any,
):
    """Build (step_fn, sharded_params, sharded_opt_state).

    step_fn(params, opt_state, key, target_codes [B], seq_codes [B, L])
      -> (params, opt_state, loss); B must divide by the 'data' axis size.
    """
    pspec = meshlib.param_spec(params)
    pshard = meshlib.shard_like(pspec, mesh)
    params = jax.device_put(params, pshard)
    ospec = meshlib.opt_state_spec(opt_state, pspec, params)
    oshard = meshlib.shard_like(ospec, mesh)
    opt_state = jax.device_put(opt_state, oshard)
    bshard = NamedSharding(mesh, meshlib.batch_spec())
    rshard = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(pshard, oshard, rshard, bshard, bshard),
        out_shardings=(pshard, oshard, rshard),
        donate_argnums=(0, 1),
    )
    def step(p, o, key, target_codes, seq_codes):
        codes, labels, weights = sampler.sample(key, target_codes)

        def loss_fn(pp):
            logits = forward(pp, codes, seq_codes)
            return bce_with_logits(logits, labels, weights)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, new_o = optimizer.update(grads, o, p)
        new_p = optax.apply_updates(p, updates)
        return new_p, new_o, loss

    return step, params, opt_state
