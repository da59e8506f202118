"""Deep Retrieval E-step training, evaluation and serving.

Reference (deep-retrieval/.../optim/LocalOptimizer.scala:19-269): per batch,
(a) the layer model trains on (sample x path) rows with a D-vector of softmax
cross-entropies — thread-parallel clones + sliced gradient sync + Adam — and
(b) the rerank model trains with SampledSoftmaxLoss whose embedded Adam
updates the softmax projection.  Here both collapse into two jitted steps:
the layer step optimizes the *sum* of the D losses (identical gradient to the
reference's per-head backward accumulation) and the rerank step treats the
softmax projection as ordinary parameter leaves (see models/dr_models.py).

Serving (DeepRetrieval.recommend:26-46): path beam search -> union of items
on the top paths (deduplicated here — the reference keeps duplicates when an
item sits on several retrieved paths) -> rerank scores -> top-k.
"""

from __future__ import annotations

import dataclasses
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dismember_tpu.core.metrics import compute_metrics
from dismember_tpu.data.dr_dataset import DRData
from dismember_tpu.index.paths import PathIndex
from dismember_tpu.models import dr_models
from dismember_tpu.models.losses import cross_entropy
from dismember_tpu.retrieval.path_beam import path_beam_search

logger = logging.getLogger("dismember_tpu.dr")


@dataclasses.dataclass
class DREvalResult:
    layer_loss: list[float]
    rerank_loss: float
    precision: float
    recall: float
    ndcg: float

    def __str__(self) -> str:
        ll = ", ".join(f"{x:.4f}" for x in self.layer_loss)
        return (
            f"{{layer loss: [{ll}], rerank loss: {self.rerank_loss:.4f}, "
            f"precision: {self.precision:.6f}, recall: {self.recall:.6f}, "
            f"ndcg: {self.ndcg:.6f}}}"
        )


class DRTrainer:
    def __init__(
        self,
        data: DRData,
        num_layers: int = 3,
        num_nodes: int = 100,
        num_paths_per_item: int = 2,
        embed_size: int = 16,
        learning_rate: float = 3e-3,
        train_batch_size: int = 8192,
        eval_batch_size: int = 8192,
        num_sampled: int = 1,
        topk: int = 10,
        beam_size: int = 20,
        seq_len: int = 10,
        seed: int = 0,
        path_index: PathIndex | None = None,
        sparse_embed_update: bool | None = None,
        mesh=None,
    ):
        """``mesh``: a ('data','model') jax mesh — the item-scaled tables
        (layer embedding, rerank embedding, softmax w|b) row-shard on
        'model' in packed p|m|v form with shard-local lazy-Adam updates
        (train/spmd_dr.py), batches shard on 'data'.  Requires widths that
        p|m|v-pack (pmv_slots(E) > 0 and pmv_slots(E+1) > 0)."""
        self.data = data
        self.num_layers = num_layers
        self.num_nodes = num_nodes
        self.num_paths = num_paths_per_item
        self.topk = topk
        self.beam = beam_size
        self.num_sampled = num_sampled
        self.seed = seed
        self.mesh = mesh
        self.num_targets_per_batch = max(1, train_batch_size // num_paths_per_item)
        if mesh is not None:
            from dismember_tpu.core.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            self.num_targets_per_batch = max(
                n_data, self.num_targets_per_batch // n_data * n_data
            )
        self.eval_targets_per_batch = max(1, eval_batch_size // num_paths_per_item)
        if mesh is not None:
            from dismember_tpu.core.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            self.eval_targets_per_batch = max(
                n_data, self.eval_targets_per_batch // n_data * n_data
            )
        self.path_index = path_index or PathIndex.random_init(
            data.num_items, num_layers, num_nodes, num_paths_per_item, seed
        )

        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        self.layer_params = dr_models.init_layer_params(
            k1, data.num_items, num_nodes, num_layers, seq_len, embed_size
        )
        self.rerank_params = dr_models.init_rerank_params(
            k2, data.num_items, seq_len, embed_size
        )
        self.learning_rate = learning_rate
        self.layer_opt = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
        self.rerank_opt = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
        # lazy row-sparse Adam on the item-scaled tables (train/sparse_adam.py)
        # — auto-on at >=2^20 items, where dense Adam's O(table) HBM traffic
        # dominates; dense (exact reference Adam semantics) below.
        if sparse_embed_update is not None:
            self._sparse = sparse_embed_update
        else:
            from dismember_tpu.train.sparse_adam import sparse_worthwhile

            # layer step is the heavy table workload: per step it touches
            # B*(L + J*(D-1)) rows of the (num_items + K*(D-1))-row table
            touched = self.num_targets_per_batch * (
                seq_len + num_paths_per_item * (num_layers - 1)
            )
            self._sparse = sparse_worthwhile(
                data.num_items + num_nodes * (num_layers - 1), touched,
                embed_dim=embed_size,
            )
        # pmv mode: params + moments share one 128-lane packed row, so the
        # whole table update is one gather + one Pallas row write (no XLA
        # scatter).  self.layer_params / self.rerank_params stay valid [V, E]
        # mirrors for every consumer outside the train loop; _sync_mirrors()
        # re-materializes them from the packed state at epoch/eval/train-end
        # boundaries, and train() re-packs if a mirror was externally
        # replaced (load_pytree and friends).
        from dismember_tpu.train.sparse_adam import pmv_slots

        self._pmv = (
            self._sparse
            and pmv_slots(embed_size) > 0
            and pmv_slots(embed_size + 1) > 0
        )
        self._mirrors_stale = False
        self._embed_size = embed_size
        if mesh is not None:
            # sharded pmv mode (train/spmd_dr.py): the item-scaled tables +
            # their lazy-Adam state row-shard on 'model', updates shard-local
            if pmv_slots(embed_size) == 0 or pmv_slots(embed_size + 1) == 0:
                raise ValueError(
                    f"mesh mode needs p|m|v-packable widths; E={embed_size} "
                    "does not pack (3*E and 3*(E+1) must fit 128 lanes)"
                )
            from dismember_tpu.core.mesh import MODEL_AXIS
            from dismember_tpu.train import spmd_dr

            self._sparse = True
            self._pmv = True
            (
                self._layer_step_pmv,
                self._rerank_step_pmv,
                self.layer_opt_state,
                self.rerank_opt_state,
                self._shard_geometry,
            ) = spmd_dr.make_sharded_dr_steps(self, mesh)
            self._layer_step = self._layer_step_pmv_wrap
            self._rerank_step = self._rerank_step_pmv_wrap
            n_model = mesh.shape[MODEL_AXIS]
            self._pmv_unpack = (
                lambda st, v, e: spmd_dr.pmv_unpack_sharded(st, v, e, n_model)
            )
            from jax.sharding import NamedSharding, PartitionSpec as _P

            _rowsh = NamedSharding(mesh, _P(MODEL_AXIS, None))

            def _refresh(st, table):
                new = spmd_dr.pmv_refresh_sharded(st, table, n_model)
                return {
                    "pmv": jax.device_put(new["pmv"], _rowsh),
                    "count": new["count"],
                }

            self._pmv_refresh = _refresh
            self._record_mirror_ids()
        elif self._pmv:
            from dismember_tpu.train import sparse_adam

            self.layer_opt_state = (
                self.layer_opt.init({"heads": self.layer_params["heads"]}),
                sparse_adam.pmv_init(self.layer_params["embedding"]),
            )
            # softmax weights and bias train as ONE [V, E+1] packed table:
            # they share candidate codes, so folding the bias into the w
            # rows removes a pathological 1-D [num_items] gather + scatter
            # + dense Adam pass from every rerank step (xplane: ~4.7ms of
            # the 10M-item step)
            self.rerank_opt_state = (
                self.rerank_opt.init({"linear": self.rerank_params["linear"]}),
                sparse_adam.pmv_init(self.rerank_params["embedding"]),
                sparse_adam.pmv_init(self._wb_mirror()),
            )
            self._layer_step_pmv = jax.jit(
                self._layer_step_pmv_impl, donate_argnums=(0, 1)
            )
            self._rerank_step_pmv = jax.jit(
                self._rerank_step_pmv_impl, donate_argnums=(0, 1)
            )
            self._layer_step = self._layer_step_pmv_wrap
            self._rerank_step = self._rerank_step_pmv_wrap
            # fused E-step: layer + rerank in ONE dispatch (VERDICT r4 #5)
            # — same math as the two separate steps (it literally composes
            # the two impls, tests/test_dr.py::test_fused_estep_matches),
            # but XLA schedules the two models' gathers/matmuls together
            # and the per-dispatch fixed overhead is paid once
            self._estep_pmv = jax.jit(
                self._estep_pmv_impl, donate_argnums=(0, 1, 2, 3)
            )
            # chunked + internally jitted (donated buffers) — do not re-jit:
            # a whole-table one-shot program OOMs at 10M items (CLAUDE.md)
            self._pmv_unpack = sparse_adam.pmv_unpack
            self._pmv_refresh = sparse_adam.pmv_refresh
            self._record_mirror_ids()
        elif self._sparse:
            from dismember_tpu.train import sparse_adam

            self.layer_opt_state = (
                self.layer_opt.init({"heads": self.layer_params["heads"]}),
                sparse_adam.init_state(self.layer_params["embedding"]),
            )
            self.rerank_opt_state = (
                self.rerank_opt.init(
                    {
                        "linear": self.rerank_params["linear"],
                        "softmax_b": self.rerank_params["softmax_b"],
                    }
                ),
                sparse_adam.init_state(self.rerank_params["embedding"]),
                sparse_adam.init_state(self.rerank_params["softmax_w"]),
            )
            self._layer_step = jax.jit(
                self._layer_step_sparse_impl, donate_argnums=(0, 1)
            )
            self._rerank_step = jax.jit(
                self._rerank_step_sparse_impl, donate_argnums=(0, 1)
            )
        else:
            self.layer_opt_state = self.layer_opt.init(self.layer_params)
            self.rerank_opt_state = self.rerank_opt.init(self.rerank_params)
            self._layer_step = jax.jit(
                self._layer_step_impl, donate_argnums=(0, 1)
            )
            self._rerank_step = jax.jit(
                self._rerank_step_impl, donate_argnums=(0, 1)
            )
        self._embed_size = embed_size
        self._layer_losses = jax.jit(self._layer_losses_impl)
        self._rerank_full_loss = jax.jit(
            lambda p, seqs, labels: dr_models.full_softmax_loss(
                p, dr_models.rerank_user_vector(p, seqs), labels
            )
        )
        self._user_vec = jax.jit(dr_models.rerank_user_vector)

    # ------------------------------------------------------------------
    def _layer_losses_of(self, params, seqs, paths):
        logits = dr_models.layer_forward_training(
            params, seqs, paths, self.data.num_items, self.num_nodes
        )
        losses = []
        for d in range(self.num_layers):
            flat = logits[d].reshape(-1, self.num_nodes)
            labels = paths[:, :, d].reshape(-1)
            losses.append(cross_entropy(flat, labels))
        return jnp.stack(losses)

    def _layer_losses_impl(self, params, seqs, paths):
        return self._layer_losses_of(params, seqs, paths)

    def _layer_step_impl(self, params, opt_state, seqs, paths):
        """Dense layer step with a single-gather forward.

        Differentiating the naive forward (layer_forward_training) scatters
        the embedding gradient once per gather site — two O(table) scatter
        passes (seq rows + prefix rows) that the Adam fusion then reads
        separately (xplane: 7.1 ms of 18.9 at 10M items).  Gathering all rows
        through ONE flat index vector yields one scatter and one dense-grad
        read; the summed-gradient and optax.adam math are unchanged."""
        table = params["embedding"]
        b, l = seqs.shape
        j = paths.shape[1]
        nd = self.num_layers - 1
        offsets = self.data.num_items + jnp.arange(
            max(nd, 1), dtype=paths.dtype
        ) * self.num_nodes
        prefix_ids = (paths[:, :, :nd] + offsets[:nd]).reshape(-1)
        flat = jnp.concatenate([seqs.reshape(-1), prefix_ids])
        valid = flat >= 0
        safe = jnp.where(valid, flat, 0)
        rows = table[safe]
        rows = rows * valid[:, None].astype(rows.dtype)

        def loss_fn(rows_in, heads_in):
            seq_e = rows_in[: b * l].reshape(b, l, -1)
            prefix_e = rows_in[b * l :].reshape(b, j, nd, -1)
            logits = dr_models.layer_logits_from_emb(
                heads_in["heads"], seq_e, prefix_e, self.num_nodes
            )
            losses = []
            for d in range(self.num_layers):
                lf = logits[d].reshape(-1, self.num_nodes)
                losses.append(cross_entropy(lf, paths[:, :, d].reshape(-1)))
            losses = jnp.stack(losses)
            return jnp.sum(losses), losses

        (_, losses), (g_rows, g_heads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rows, {"heads": params["heads"]})
        g_rows = g_rows * valid[:, None].astype(g_rows.dtype)
        g_table = jnp.zeros_like(table).at[safe].add(g_rows)
        grads = {"embedding": g_table, "heads": g_heads["heads"]}
        updates, new_opt = self.layer_opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, losses

    def _rerank_step_impl(self, params, opt_state, key, seqs, labels):
        def loss_fn(p):
            vec = dr_models.rerank_user_vector(p, seqs)
            return dr_models.sampled_softmax_loss(
                p, vec, labels, key, self.num_sampled
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = self.rerank_opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    # --- sparse (lazy row-Adam) variants for item-scaled tables ----------
    def _layer_step_sparse_impl(self, params, opt_state, seqs, paths):
        """Layer step with the shared embedding updated row-sparsely.

        Same forward math / gradients as _layer_step_impl (duplicate row
        grads are segment-summed like dense scatter-add autodiff); Adam on
        the heads stays dense optax."""
        from dismember_tpu.train import sparse_adam

        heads_opt, emb_opt = opt_state
        table = params["embedding"]
        b, l = seqs.shape
        j = paths.shape[1]
        nd = self.num_layers - 1
        # position i of any path prefix uses row num_items + i*K + node
        offsets = self.data.num_items + jnp.arange(
            max(nd, 1), dtype=paths.dtype
        ) * self.num_nodes
        prefix_ids = (paths[:, :, :nd] + offsets[:nd]).reshape(-1)
        flat = jnp.concatenate([seqs.reshape(-1), prefix_ids])
        valid = flat >= 0
        rows = table[jnp.where(valid, flat, 0)]
        rows = rows * valid[:, None].astype(rows.dtype)

        def loss_fn(rows_in, heads_in):
            seq_e = rows_in[: b * l].reshape(b, l, -1)
            prefix_e = rows_in[b * l :].reshape(b, j, nd, -1)
            logits = dr_models.layer_logits_from_emb(
                heads_in["heads"], seq_e, prefix_e, self.num_nodes
            )
            losses = []
            for d in range(self.num_layers):
                lf = logits[d].reshape(-1, self.num_nodes)
                losses.append(cross_entropy(lf, paths[:, :, d].reshape(-1)))
            losses = jnp.stack(losses)
            return jnp.sum(losses), losses

        (_, losses), (g_rows, g_heads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rows, {"heads": params["heads"]})
        updates, new_heads_opt = self.layer_opt.update(
            g_heads, heads_opt, {"heads": params["heads"]}
        )
        new_heads = optax.apply_updates({"heads": params["heads"]}, updates)
        g_rows = g_rows * valid[:, None].astype(g_rows.dtype)
        new_table, new_emb_opt = sparse_adam.apply_rows(
            table, emb_opt, flat, g_rows, self.learning_rate
        )
        new_params = {"embedding": new_table, "heads": new_heads["heads"]}
        return new_params, (new_heads_opt, new_emb_opt), losses

    def _rerank_step_sparse_impl(self, params, opt_state, key, seqs, labels):
        """Rerank step with the item embedding and softmax weight tables
        updated row-sparsely; linear + softmax bias stay dense optax (the
        [num_items] bias is 4 bytes/row — dense Adam on it is cheap)."""
        from dismember_tpu.train import sparse_adam

        rest_opt, emb_opt, w_opt = opt_state
        table = params["embedding"]
        smw = params["softmax_w"]
        rest = {"linear": params["linear"], "softmax_b": params["softmax_b"]}
        b, l = seqs.shape
        negs = dr_models.sample_negatives(
            key, labels, smw.shape[0], self.num_sampled
        )
        cand = jnp.concatenate(
            [labels[:, None].astype(negs.dtype), negs], axis=1
        )  # [B, 1+S]
        seq_flat = seqs.reshape(-1)
        seq_valid = seq_flat >= 0
        erows = table[jnp.where(seq_valid, seq_flat, 0)]
        erows = erows * seq_valid[:, None].astype(erows.dtype)
        wrows = smw[cand.reshape(-1)].reshape(b, cand.shape[1], -1)

        def loss_fn(erows_in, wrows_in, rest_in):
            flat = erows_in.reshape(b, -1)
            vec = flat @ rest_in["linear"]["weight"].T + rest_in["linear"]["bias"]
            bb = rest_in["softmax_b"][cand]
            logits = jnp.einsum("be,bse->bs", vec, wrows_in) + bb
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(logp[:, 0])

        loss, (g_e, g_w, g_rest) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2)
        )(erows, wrows, rest)
        updates, new_rest_opt = self.rerank_opt.update(g_rest, rest_opt, rest)
        new_rest = optax.apply_updates(rest, updates)
        g_e = g_e * seq_valid[:, None].astype(g_e.dtype)
        new_table, new_emb_opt = sparse_adam.apply_rows(
            table, emb_opt, seq_flat, g_e, self.learning_rate
        )
        new_w, new_w_opt = sparse_adam.apply_rows(
            smw, w_opt, cand.reshape(-1), g_w.reshape(-1, g_w.shape[-1]),
            self.learning_rate,
        )
        new_params = {
            "embedding": new_table,
            "linear": new_rest["linear"],
            "softmax_w": new_w,
            "softmax_b": new_rest["softmax_b"],
        }
        return new_params, (new_rest_opt, new_emb_opt, new_w_opt), loss

    # --- pmv (packed p|m|v rows) variants: zero-scatter table updates ----
    def _layer_step_pmv_impl(self, heads_params, opt_state, seqs, paths):
        """Layer step against the packed p|m|v embedding state.

        Identical forward math and gradients to _layer_step_sparse_impl —
        the rows enter the loss as materialized [R, E] leaves either way;
        only the storage they are gathered from and written back to differs
        (one Pallas row write instead of a ~100ns/row XLA scatter)."""
        from dismember_tpu.train import sparse_adam

        heads_opt, emb_pmv = opt_state
        e = self._embed_size
        b, l = seqs.shape
        j = paths.shape[1]
        nd = self.num_layers - 1
        offsets = self.data.num_items + jnp.arange(
            max(nd, 1), dtype=paths.dtype
        ) * self.num_nodes
        prefix_ids = (paths[:, :, :nd] + offsets[:nd]).reshape(-1)
        flat = jnp.concatenate([seqs.reshape(-1), prefix_ids])
        valid = flat >= 0
        rows = sparse_adam.pmv_gather(
            emb_pmv["pmv"], jnp.where(valid, flat, 0), e
        )
        rows = rows * valid[:, None].astype(rows.dtype)

        def loss_fn(rows_in, heads_in):
            seq_e = rows_in[: b * l].reshape(b, l, -1)
            prefix_e = rows_in[b * l :].reshape(b, j, nd, -1)
            logits = dr_models.layer_logits_from_emb(
                heads_in["heads"], seq_e, prefix_e, self.num_nodes
            )
            losses = []
            for d in range(self.num_layers):
                lf = logits[d].reshape(-1, self.num_nodes)
                losses.append(cross_entropy(lf, paths[:, :, d].reshape(-1)))
            losses = jnp.stack(losses)
            return jnp.sum(losses), losses

        (_, losses), (g_rows, g_heads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rows, heads_params)
        updates, new_heads_opt = self.layer_opt.update(
            g_heads, heads_opt, heads_params
        )
        new_heads = optax.apply_updates(heads_params, updates)
        g_rows = g_rows * valid[:, None].astype(g_rows.dtype)
        new_emb_pmv = sparse_adam.pmv_apply_rows(
            emb_pmv, flat, g_rows, self.learning_rate
        )
        return new_heads, (new_heads_opt, new_emb_pmv), losses

    def _layer_step_pmv_wrap(self, params, opt_state, seqs, paths):
        new_heads, new_opt, losses = self._layer_step_pmv(
            {"heads": params["heads"]}, opt_state, seqs, paths
        )
        self._mirrors_stale = True
        return (
            {"embedding": params["embedding"], "heads": new_heads["heads"]},
            new_opt,
            losses,
        )

    def _rerank_step_pmv_impl(self, rest, opt_state, key, seqs, labels):
        """Rerank step on packed state: item embedding as a [V, E] p|m|v
        table, softmax projection as ONE [V, E+1] p|m|v table whose last
        param lane is the bias (bias gradient = d logits, appended as the
        E+1-th gradient column — exactly the dense step's math).

        Deliberate deviation from the dense/reference path
        (SampledSoftmaxLoss.scala:49-143 keeps a dense Adam over the bias,
        as does the split-sparse step): folding the bias into the packed
        w|b rows makes it LAZY per-touched-row Adam — bias rows of items
        not among a step's candidates keep un-decayed moments and skip the
        momentum-only nudge dense Adam would give them.  This is the same
        lazy-vs-dense semantics the embedding tables already have, bounded
        by ~lr per skipped step, and is what removes the pathological 1-D
        [num_items] gather+scatter+dense-Adam pass (BASELINE.md).  The
        bounded divergence is asserted in
        tests/test_dr.py::test_pmv_lazy_bias_bounded_divergence."""
        from dismember_tpu.train import sparse_adam

        rest_opt, emb_pmv, wb_pmv = opt_state
        e = self._embed_size
        b, l = seqs.shape
        negs = dr_models.sample_negatives(
            key, labels, self.data.num_items, self.num_sampled
        )
        cand = jnp.concatenate(
            [labels[:, None].astype(negs.dtype), negs], axis=1
        )  # [B, 1+S]
        seq_flat = seqs.reshape(-1)
        seq_valid = seq_flat >= 0
        erows = sparse_adam.pmv_gather(
            emb_pmv["pmv"], jnp.where(seq_valid, seq_flat, 0), e
        )
        erows = erows * seq_valid[:, None].astype(erows.dtype)
        wbrows = sparse_adam.pmv_gather(
            wb_pmv["pmv"], cand.reshape(-1), e + 1
        ).reshape(b, cand.shape[1], e + 1)

        def loss_fn(erows_in, wbrows_in, rest_in):
            flat = erows_in.reshape(b, -1)
            vec = flat @ rest_in["linear"]["weight"].T + rest_in["linear"]["bias"]
            logits = (
                jnp.einsum("be,bse->bs", vec, wbrows_in[..., :e])
                + wbrows_in[..., e]
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(logp[:, 0])

        loss, (g_e, g_wb, g_rest) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2)
        )(erows, wbrows, rest)
        updates, new_rest_opt = self.rerank_opt.update(g_rest, rest_opt, rest)
        new_rest = optax.apply_updates(rest, updates)
        g_e = g_e * seq_valid[:, None].astype(g_e.dtype)
        new_emb_pmv = sparse_adam.pmv_apply_rows(
            emb_pmv, seq_flat, g_e, self.learning_rate
        )
        new_wb_pmv = sparse_adam.pmv_apply_rows(
            wb_pmv, cand.reshape(-1), g_wb.reshape(-1, e + 1),
            self.learning_rate,
        )
        return new_rest, (new_rest_opt, new_emb_pmv, new_wb_pmv), loss

    def _estep_pmv_impl(
        self, heads_params, layer_opt, rest, rerank_opt, key, seqs, paths,
        labels,
    ):
        """One-dispatch E-step: the layer and rerank pmv steps composed
        verbatim (identical math and state updates to calling them
        separately)."""
        new_heads, new_layer_opt, losses = self._layer_step_pmv_impl(
            heads_params, layer_opt, seqs, paths
        )
        new_rest, new_rerank_opt, rloss = self._rerank_step_pmv_impl(
            rest, rerank_opt, key, seqs, labels
        )
        return new_heads, new_layer_opt, new_rest, new_rerank_opt, losses, rloss

    def _estep_fused(self, key, seqs, paths, labels):
        """Run the fused E-step, updating trainer state in place; returns
        (layer losses, rerank loss).  Single-chip pmv mode only."""
        new_heads, new_layer_opt, new_rest, new_rerank_opt, losses, rloss = (
            self._estep_pmv(
                {"heads": self.layer_params["heads"]},
                self.layer_opt_state,
                {"linear": self.rerank_params["linear"]},
                self.rerank_opt_state,
                key, seqs, paths, labels,
            )
        )
        self._mirrors_stale = True
        self.layer_params = {
            "embedding": self.layer_params["embedding"],
            "heads": new_heads["heads"],
        }
        self.layer_opt_state = new_layer_opt
        self.rerank_params = dict(
            self.rerank_params, linear=new_rest["linear"]
        )
        self.rerank_opt_state = new_rerank_opt
        return losses, rloss

    def _rerank_step_pmv_wrap(self, params, opt_state, key, seqs, labels):
        rest = {"linear": params["linear"]}
        new_rest, new_opt, loss = self._rerank_step_pmv(
            rest, opt_state, key, seqs, labels
        )
        self._mirrors_stale = True
        return (
            {
                "embedding": params["embedding"],
                "linear": new_rest["linear"],
                "softmax_w": params["softmax_w"],
                "softmax_b": params["softmax_b"],
            },
            new_opt,
            loss,
        )

    def _wb_mirror(self) -> jnp.ndarray:
        """[V, E+1] softmax projection: weights with the bias as last lane."""
        return jnp.concatenate(
            [
                self.rerank_params["softmax_w"],
                self.rerank_params["softmax_b"][:, None],
            ],
            axis=1,
        )

    def _sync_mirrors(self) -> None:
        """Re-materialize the [V, E] param mirrors from the packed p|m|v
        state (no-op outside pmv mode or when already in sync)."""
        if not getattr(self, "_pmv", False) or not self._mirrors_stale:
            return
        e = self._embed_size
        emb_rows = self.data.num_items + self.num_nodes * (self.num_layers - 1)
        self.layer_params["embedding"] = self._pmv_unpack(
            self.layer_opt_state[1], emb_rows, e
        )
        self.rerank_params["embedding"] = self._pmv_unpack(
            self.rerank_opt_state[1], self.data.num_items, e
        )
        wb = self._pmv_unpack(
            self.rerank_opt_state[2], self.data.num_items, e + 1
        )
        self.rerank_params["softmax_w"] = wb[:, :e]
        self.rerank_params["softmax_b"] = wb[:, e]
        self._mirrors_stale = False
        self._record_mirror_ids()

    def _record_mirror_ids(self) -> None:
        """Remember the identity of the mirror arrays we handed out, so
        _adopt_mirrors can tell an external assignment (load_pytree etc.)
        from the mirrors it produced itself."""
        self._mirror_ids = {
            "layer_embedding": id(self.layer_params["embedding"]),
            "rerank_embedding": id(self.rerank_params["embedding"]),
            "softmax_w": id(self.rerank_params["softmax_w"]),
            "softmax_b": id(self.rerank_params["softmax_b"]),
        }

    def _replaced_mirrors(self) -> set[str]:
        cur = {
            "layer_embedding": id(self.layer_params["embedding"]),
            "rerank_embedding": id(self.rerank_params["embedding"]),
            "softmax_w": id(self.rerank_params["softmax_w"]),
            "softmax_b": id(self.rerank_params["softmax_b"]),
        }
        return {k for k, v in cur.items() if v != self._mirror_ids[k]}

    def _adopt_mirrors(self) -> None:
        """Push externally-assigned param mirrors into the packed state's p
        lanes (keeps moments).  Called at train() entry.

        When the packed state is the newer side (_mirrors_stale — e.g. after
        raw-step driving as in bench scripts) the mirrors are normally left
        untouched; but if an external assignment replaced a mirror array in
        that window (detected by array identity), the external values win:
        they are pushed into the packed state with a warning, since silently
        overwriting a checkpoint load on the next _sync_mirrors would be
        worse (ADVICE r2)."""
        if not getattr(self, "_pmv", False):
            return
        if self._mirrors_stale:
            replaced = self._replaced_mirrors()
            if not replaced:
                return
            logger.warning(
                "param mirrors %s were externally replaced while the packed "
                "p|m|v state was newer (raw-step driving without "
                "_sync_mirrors); adopting the external values into the "
                "packed state (moments kept). softmax w/b adopt jointly.",
                sorted(replaced),
            )
        else:
            replaced = {
                "layer_embedding", "rerank_embedding", "softmax_w", "softmax_b"
            }
        heads_opt, emb_pmv = self.layer_opt_state
        if "layer_embedding" in replaced:
            emb_pmv = self._pmv_refresh(emb_pmv, self.layer_params["embedding"])
        self.layer_opt_state = (heads_opt, emb_pmv)
        rest_opt, remb_pmv, wb_pmv = self.rerank_opt_state
        if "rerank_embedding" in replaced:
            remb_pmv = self._pmv_refresh(remb_pmv, self.rerank_params["embedding"])
        if "softmax_w" in replaced or "softmax_b" in replaced:
            wb_pmv = self._pmv_refresh(wb_pmv, self._wb_mirror())
        self.rerank_opt_state = (rest_opt, remb_pmv, wb_pmv)
        self._record_mirror_ids()

    # -- step-level checkpoint state (train/step_resume.py) -------------
    _MIRROR_KEYS = ("embedding", "softmax_w", "softmax_b")

    def _step_state(self, key) -> dict:
        """Loop-state pytree for within-stage snapshots.  In pmv mode the
        packed p|m|v states inside the opt states own the tables, so the
        [V, E] mirrors (layer/rerank embedding, softmax w/b) are excluded —
        saving them would double the multi-GB snapshot."""
        lp, rp = self.layer_params, self.rerank_params
        if getattr(self, "_pmv", False):
            lp = {k: v for k, v in lp.items() if k != "embedding"}
            rp = {k: v for k, v in rp.items() if k not in self._MIRROR_KEYS}
        return {
            "layer_params": lp,
            "layer_opt_state": self.layer_opt_state,
            "rerank_params": rp,
            "rerank_opt_state": self.rerank_opt_state,
            "key": key,
        }

    def _restore_step_state(self, st: dict) -> None:
        self.layer_opt_state = st["layer_opt_state"]
        self.rerank_opt_state = st["rerank_opt_state"]
        if getattr(self, "_pmv", False):
            self.layer_params = dict(
                st["layer_params"], embedding=self.layer_params["embedding"]
            )
            self.rerank_params = dict(
                st["rerank_params"],
                **{k: self.rerank_params[k] for k in self._MIRROR_KEYS},
            )
            self._mirrors_stale = True
            self._record_mirror_ids()
        else:
            self.layer_params = st["layer_params"]
            self.rerank_params = st["rerank_params"]

    # ------------------------------------------------------------------
    def train(
        self,
        num_epochs: int,
        progress_interval: int = 0,
        rerank_epochs: int | None = None,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 0,
    ) -> list[DREvalResult]:
        """``rerank_epochs`` mirrors the reference's ``reRankStoppingEpoch``
        (dr LocalOptimizer.scala:35-38,88-96): rerank training stops after
        that many epochs while the layer model keeps training.

        ``checkpoint_path``/``checkpoint_every`` (in batches) enable
        within-stage step-level snapshots with bit-compatible resume
        (train/step_resume.py)."""
        from dismember_tpu.train import step_resume

        self._adopt_mirrors()
        d = self.data
        n = len(d.train_seqs)
        rng = np.random.default_rng(self.seed)
        key = jax.random.PRNGKey(self.seed + 1)
        results: list[DREvalResult] = []
        self.train_loss_log: list[dict] = []
        bsz = self.num_targets_per_batch
        rerank_stop = rerank_epochs if rerank_epochs is not None else num_epochs
        start_epoch, start_s = 1, 0
        if checkpoint_path:
            loaded = step_resume.load_step_state(
                checkpoint_path, self._step_state(key)
            )
            if loaded is not None:
                st, meta = loaded
                self._restore_step_state(st)
                key = jnp.asarray(st["key"])
                step_resume.rng_state_from_json(rng, meta["rng_before_perm"])
                start_epoch = int(meta["epoch"])
                start_s = int(meta["s"]) + bsz
                logger.info(
                    f"resumed step checkpoint {checkpoint_path} at epoch "
                    f"{start_epoch} offset {meta['s']}"
                )
        for epoch in range(start_epoch, num_epochs + 1):
            rng_before_perm = step_resume.rng_state_to_json(rng)
            perm = rng.permutation(n)
            t0 = time.perf_counter()
            it = 0
            epoch_layer = np.zeros(self.num_layers)
            epoch_rerank = 0.0
            s0, start_s = start_s, 0  # resume lands mid-epoch once
            for s in range(s0, n, bsz):
                idx = perm[s : s + bsz]
                seqs = jnp.asarray(d.train_seqs[idx], jnp.int32)
                targets = d.train_targets[idx]
                paths = jnp.asarray(self.path_index.item_paths[targets], jnp.int32)
                if epoch <= rerank_stop and getattr(self, "_estep_pmv", None):
                    # fused single-dispatch E-step (same math — composes the
                    # two impls; one dispatch instead of two)
                    key, sub = jax.random.split(key)
                    losses, rloss = self._estep_fused(
                        sub, seqs, paths, jnp.asarray(targets, jnp.int32)
                    )
                elif epoch <= rerank_stop:
                    self.layer_params, self.layer_opt_state, losses = (
                        self._layer_step(
                            self.layer_params, self.layer_opt_state, seqs,
                            paths,
                        )
                    )
                    key, sub = jax.random.split(key)
                    self.rerank_params, self.rerank_opt_state, rloss = (
                        self._rerank_step(
                            self.rerank_params,
                            self.rerank_opt_state,
                            sub,
                            seqs,
                            jnp.asarray(targets, jnp.int32),
                        )
                    )
                else:
                    self.layer_params, self.layer_opt_state, losses = (
                        self._layer_step(
                            self.layer_params, self.layer_opt_state, seqs,
                            paths,
                        )
                    )
                    rloss = float("nan")
                it += 1
                epoch_layer += np.asarray(losses)
                epoch_rerank += float(rloss)
                if (
                    checkpoint_path
                    and checkpoint_every > 0
                    and it % checkpoint_every == 0
                    and s + bsz < n
                ):
                    step_resume.save_step_state(
                        checkpoint_path,
                        self._step_state(key),
                        {
                            "epoch": epoch,
                            "s": s,
                            "rng_before_perm": rng_before_perm,
                        },
                    )
                    logger.info(
                        f"step checkpoint saved at epoch {epoch} offset {s}"
                    )
                if progress_interval > 0 and it % progress_interval == 0:
                    ll = ", ".join(f"{float(x):.4f}" for x in losses)
                    logger.info(
                        f"Epoch {epoch} iter {it}: layer loss [{ll}], "
                        f"rerank loss {float(rloss):.4f}"
                    )
            self.train_loss_log.append(
                {
                    "layer_loss": (epoch_layer / max(it, 1)).tolist(),
                    "rerank_loss": epoch_rerank / max(it, 1),
                }
            )
            ev = self.evaluate()
            logger.info(
                f"Epoch {epoch} time {time.perf_counter() - t0:.1f}s metrics {ev}"
            )
            results.append(ev)
        self._sync_mirrors()
        return results

    # ------------------------------------------------------------------
    def beam_search_paths_async(self, seqs: np.ndarray):
        """Dispatch one beam-search batch and return DEVICE arrays (no
        host sync) — lets callers pipeline batches so the device/relay
        computes batch i+1 while the host drains batch i (the blocked
        per-batch fetch dominated coordinate descent's wall time)."""
        self._sync_mirrors()
        return path_beam_search(
            self.layer_params,
            jnp.asarray(seqs, jnp.int32),
            self.beam,
            self.data.num_items,
            self.num_nodes,
            self.num_layers,
        )

    def beam_search_paths(self, seqs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        paths, probs = self.beam_search_paths_async(seqs)
        return np.asarray(paths), np.asarray(probs)

    def recommend_batch(
        self,
        seqs: np.ndarray,
        topk: int | None = None,
        consumed: list[np.ndarray] | None = None,
        path_to_items: dict[tuple, list[int]] | None = None,
    ) -> list[np.ndarray]:
        k = topk or self.topk
        p2i = path_to_items if path_to_items is not None else self.path_index.path_to_items()
        paths, _probs = self.beam_search_paths(seqs)
        user_vecs = np.asarray(self._user_vec(self.rerank_params, jnp.asarray(seqs, jnp.int32)))
        sw = np.asarray(self.rerank_params["softmax_w"])
        sb = np.asarray(self.rerank_params["softmax_b"])
        out: list[np.ndarray] = []
        for i in range(len(seqs)):
            cands: list[int] = []
            seen: set[int] = set()
            for path in paths[i]:
                for item in p2i.get(tuple(int(x) for x in path), ()):  # noqa: B905
                    if item not in seen:
                        seen.add(item)
                        cands.append(item)
            if consumed is not None and len(consumed[i]) > 0:
                cset = set(int(x) for x in consumed[i])
                cands = [c for c in cands if c not in cset]
            if not cands:
                out.append(np.empty(0, np.int64))
                continue
            carr = np.asarray(cands, dtype=np.int64)
            scores = sw[carr] @ user_vecs[i] + sb[carr]
            order = np.argsort(-scores, kind="stable")[:k]
            out.append(carr[order])
        return out

    def evaluate(self) -> DREvalResult:
        """Eval parity with dr Evaluator.evaluate: per-batch layer CE vector +
        exact-softmax rerank loss + per-user recommend metrics.

        The recommend leg runs on device (path beam -> dense path table ->
        rerank -> top-k, one jit per batch) with padded consumed filtering;
        metrics are batch-vectorized.  Falls back to the host recommend path
        when the dense path table doesn't fit."""
        from dismember_tpu.core.metrics import compute_metrics_batch
        from dismember_tpu.retrieval.dr_serve import make_dr_serving_fn

        self._sync_mirrors()
        d = self.data
        m = len(d.eval_seqs)
        if m == 0:
            return DREvalResult([0.0] * self.num_layers, 0.0, 0.0, 0.0, 0.0)
        if self.mesh is not None:
            from dismember_tpu.train.spmd_dr import make_sharded_dr_serving_fn

            serve = make_sharded_dr_serving_fn(self, self.mesh, topk=self.topk)
        else:
            serve = make_dr_serving_fn(self, topk=self.topk)
        p2i = None if serve is not None else self.path_index.path_to_items()
        max_consumed = max(
            (len(d.user_consumed.get(int(u), ())) for u in d.eval_users),
            default=0,
        )
        layer_loss = np.zeros(self.num_layers)
        rerank_loss = 0.0
        prec = rec = ndcg = 0.0
        count = 0
        bsz = self.eval_targets_per_batch
        for s in range(0, m, bsz):
            e = min(s + bsz, m)
            b = e - s
            seqs_np = d.eval_seqs[s:e]
            seqs = jnp.asarray(seqs_np, jnp.int32)
            targets = d.eval_labels[s:e, 0]
            paths = jnp.asarray(self.path_index.item_paths[targets], jnp.int32)
            layer_loss += np.asarray(
                self._layer_losses(self.layer_params, seqs, paths)
            ) * (e - s)
            rerank_loss += float(
                self._rerank_full_loss(
                    self.rerank_params, seqs, jnp.asarray(targets, jnp.int32)
                )
            ) * (e - s)
            if serve is not None:
                # fixed shapes per jit: pad the tail batch, mask it out after
                pad = bsz - b
                sp = (
                    np.concatenate([seqs_np, np.repeat(seqs_np[:1], pad, 0)])
                    if pad
                    else seqs_np
                )
                cons = np.full((bsz, max(max_consumed, 1)), -1, dtype=np.int32)
                for i, u in enumerate(d.eval_users[s:e]):
                    c = d.user_consumed.get(int(u), ())
                    cons[i, : len(c)] = c
                items, _sc = serve(
                    self.layer_params,
                    self.rerank_params,
                    jnp.asarray(sp, jnp.int32),
                    jnp.asarray(cons),
                )
                recs_arr = np.asarray(items)[:b]
                p, r, nd = compute_metrics_batch(recs_arr, d.eval_labels[s:e])
                prec += float(p.sum())
                rec += float(r.sum())
                ndcg += float(nd.sum())
            else:
                consumed = [
                    d.user_consumed.get(int(u), np.empty(0, np.int64))
                    for u in d.eval_users[s:e]
                ]
                recs = self.recommend_batch(
                    seqs_np, topk=self.topk, consumed=consumed, path_to_items=p2i
                )
                for i, r in enumerate(recs):
                    labels = d.eval_labels[s + i]
                    p, rcl, nd = compute_metrics(r, labels[labels >= 0])
                    prec += p
                    rec += rcl
                    ndcg += nd
            count += e - s
        return DREvalResult(
            layer_loss=(layer_loss / count).tolist(),
            rerank_loss=rerank_loss / count,
            precision=prec / count,
            recall=rec / count,
            ndcg=ndcg / count,
        )
