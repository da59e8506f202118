"""OTM training: beam-search-aware optimal pseudo-targets, per-level BCE.

Reference (otm/.../optim/LocalOptimizer.scala:18-274, tree/OTMTree.scala):
per batch, with *frozen* parameters, compute (a) the per-level target node
sets — either bottom-up optimal pseudo-targets (Algorithm 1 of arXiv
2006.15408) or plain ancestor targets — and (b) the per-level beam-search
trajectories; then, level by level (top-down), run one BCE-with-logits
gradient step on (beam nodes, level targets).  The per-level optimizer steps
are inherently sequential; each is one jit here.

TPU-first: the reference's per-thread Scala lists become fixed-shape device
arrays: beam trajectories [n_levels, B, 2*beam], target sets [n_levels, B, J]
(-1 padded).  The bottom-up parent reduction (group-by-parent + label sum +
clip, OTMTree.computeTargets:104-129) is a row-wise sort + equality-matrix
segment sum — J = label_num is tiny, so the O(J^2) mask matmul is free.
"""

from __future__ import annotations

import dataclasses
import logging
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dismember_tpu.data.otm_dataset import OTMData, lower_log2, upper_log2
from dismember_tpu.models import deepfm, din
from dismember_tpu.models.losses import bce_with_logits

logger = logging.getLogger("dismember_tpu.otm")

_NEG_INF = jnp.float32(-3.4e38)
_INT_MAX = jnp.int32(2**31 - 1)


@dataclasses.dataclass
class OTMEvalResult:
    loss: float = 0.0
    precision: float = 0.0
    recall: float = 0.0
    ndcg: float = 0.0

    def __str__(self) -> str:
        return (
            f"{{precision: {self.precision:.6f}, recall: {self.recall:.6f}, "
            f"ndcg: {self.ndcg:.6f}}}"
        )


def level_labels(nodes, t_ids, t_labels, dtype):
    """Per-level BCE labels/weights from the (beam nodes, target set) match
    (otm LocalOptimizer.scala:96-117): label = clipped sum of target labels
    whose id equals the node, weight masks the -1 beam pads.  Shared by the
    single-chip level steps and the sharded-sparse scan (spmd_sparse.py)."""
    valid = nodes >= 0
    eq = nodes[:, :, None] == jnp.where(t_ids >= 0, t_ids, -2)[:, None, :]
    labels = jnp.clip(
        jnp.einsum("bwj,bj->bw", eq.astype(dtype), t_labels), 0.0, 1.0
    )
    return labels, valid


def _row_group_parents(parents: jnp.ndarray, values: jnp.ndarray):
    """Group duplicate parent ids within each row, summing their labels.

    parents/values: [B, J]; invalid ids < 0.  Returns (ids [B, J], labels
    [B, J]) where each distinct parent appears once (label clipped to [0,1],
    mirroring ``clipValue``) and remaining slots are -1.
    """
    key = jnp.where(parents < 0, _INT_MAX, parents)
    order = jnp.argsort(key, axis=1)
    ps = jnp.take_along_axis(key, order, axis=1)
    vs = jnp.take_along_axis(values, order, axis=1)
    eq = ps[:, :, None] == ps[:, None, :]
    sums = jnp.einsum("bjk,bk->bj", eq.astype(vs.dtype), vs)
    first = jnp.concatenate(
        [jnp.ones_like(ps[:, :1], bool), ps[:, 1:] != ps[:, :-1]], axis=1
    )
    valid = ps != _INT_MAX
    keep = first & valid
    new_ids = jnp.where(keep, ps, -1)
    new_labels = jnp.where(keep, jnp.clip(sums, 0.0, 1.0), 0.0)
    return new_ids, new_labels


class OTMTrainer:
    def __init__(
        self,
        data: OTMData,
        model_type: str = "din",
        embed_size: int = 16,
        learning_rate: float = 3e-3,
        total_train_batch_size: int = 8192,
        total_eval_batch_size: int = 8192,
        beam_size: int = 20,
        topk: int = 10,
        seq_len: int = 10,
        target_mode: str = "pseudo",
        seed: int = 42,
        precision: str = "f32",
        sparse_embed_update: bool | None = None,
        sparse_format: str = "auto",
        mesh=None,
    ):
        """``precision="f64"`` reproduces the reference's Double-precision OTM
        (otm/.../optim/LocalOptimizer.scala:18 — NumericDouble throughout):
        params, pseudo-target scores, losses and Adam state all run float64
        (via a thread-local ``jax.enable_x64`` scope, so the rest
        of the process stays f32).  Default f32 is the TPU-native dtype.

        ``sparse_embed_update``: lazy row-sparse Adam on the node embedding
        table inside the per-level scan (train/sparse_adam.py).  OTM is the
        worst dense-Adam case of the four algorithms: each *batch* pays
        n_levels sequential optimizer steps, each O(table) HBM traffic —
        ~24 full table+moment rewrites per batch at a 10M-item catalog.
        None = auto by the measured cost model
        (:func:`~dismember_tpu.train.sparse_adam.sparse_worthwhile`);
        unavailable in f64 parity mode (moments are kept f32).

        ``sparse_format``: packed-state format of the sparse scan.  "pmv"
        packs params+moments into one 128-lane row so a level's table
        update is one row gather + one Pallas DMA write with ZERO XLA
        table scatters — the mv format's per-level scatter measured
        26.0 ms/batch = 40% of the 64.6 ms whole-batch at 10M items
        (scripts/profile_otm_scatter.py, data/r4/otm_scatter_ops.json);
        OTM pays it n_levels times per batch, making it the worst scatter
        case of the four algorithms.  In pmv mode ``params["embedding"]``
        becomes a MIRROR re-materialized at train/eval boundaries (same
        contract as TDMTrainer/DRTrainer).  "mv" keeps the table
        addressable; "auto" = pmv when the width packs (3E <= 128) and the
        trainer is single-chip (meshes use the sharded mv state).

        ``mesh``: a ('data','model') jax.sharding.Mesh — the whole-batch
        dispatch runs SPMD with the batch sharded on 'data' and the node
        table (plus Adam state) row-sharded on 'model'
        (train/spmd.make_sharded_otm_train_batch; sparse trainers get the
        scan-carried sharded lazy-Adam state, train/spmd_sparse.py).  The
        train batch size is rounded to a 'data'-axis multiple and ragged
        epoch tails (< one batch of rows) are dropped."""
        if precision not in ("f32", "f64"):
            raise ValueError(f"precision must be f32 or f64, got {precision!r}")
        self._x64 = precision == "f64"
        self.dtype = jnp.float64 if self._x64 else jnp.float32
        self.data = data
        self.model_type = model_type
        self.embed_size = embed_size
        self.learning_rate = learning_rate
        self.beam = beam_size
        self.topk = topk
        self.seq_len = seq_len
        self.target_mode = target_mode
        self.seed = seed
        self.start_level = lower_log2(beam_size)
        self.leaf_level = upper_log2(data.num_items)
        self.n_levels = self.leaf_level - self.start_level
        self.label_num = data.label_num or data.train_labels.shape[1]
        self.train_batch_size = max(1, total_train_batch_size // (beam_size * 2))
        self.eval_batch_size = max(1, total_eval_batch_size // (beam_size * 2))
        self.mesh = mesh
        if mesh is not None:
            if self._x64:
                raise ValueError("mesh mode is f32-only (no f64 SPMD path)")
            from dismember_tpu.core.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            self.train_batch_size = max(
                n_data, self.train_batch_size // n_data * n_data
            )

        num_index = data.num_tree_nodes
        key = jax.random.PRNGKey(seed)
        # init is always drawn in f32 (jax.random produces *different* sample
        # values per dtype) and upcast, so f32/f64 runs start from identical
        # weights and precision is the only difference between the modes
        if model_type == "din":
            params = din.init_params(key, num_index, embed_size)
            self.forward = din.forward
        elif model_type == "deepfm":
            params = deepfm.init_params(key, num_index, embed_size, seq_len)
            self.forward = deepfm.forward
        else:
            raise ValueError(f"unknown deep model: {model_type}")
        if sparse_embed_update and self._x64:
            raise ValueError(
                "sparse_embed_update keeps f32 moments; it is not available "
                "in the f64 parity mode"
            )
        if sparse_embed_update is not None:
            self._sparse = sparse_embed_update
        else:
            from dismember_tpu.train.sparse_adam import sparse_worthwhile

            touched = self.train_batch_size * (2 * beam_size + seq_len)
            self._sparse = not self._x64 and sparse_worthwhile(
                num_index, touched, embed_dim=embed_size
            )
        self._pmv = False
        self._mirrors_stale = False
        if sparse_format not in ("auto", "mv", "pmv"):
            raise ValueError(f"unknown sparse_format {sparse_format!r}")
        if self._sparse:
            from dismember_tpu.train import sparse_adam

            if sparse_format == "auto":
                self._pmv = (
                    sparse_adam.pmv_slots(embed_size) > 0 and mesh is None
                )
            else:
                self._pmv = sparse_format == "pmv"
                if self._pmv and sparse_adam.pmv_slots(embed_size) == 0:
                    raise ValueError(
                        f"pmv needs a packable width (3*E <= 128; E="
                        f"{embed_size})"
                    )
                if self._pmv and mesh is not None:
                    raise ValueError(
                        "pmv is single-chip; meshes use the sharded mv state"
                    )
        with self._ctx():
            self.params = jax.tree.map(lambda x: x.astype(self.dtype), params)
            self.optimizer = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
            if self._sparse:
                from dismember_tpu.train import sparse_adam

                rest = {
                    k: v for k, v in self.params.items() if k != "embedding"
                }
                if self._pmv:
                    self.opt_state = (
                        self.optimizer.init(rest),
                        sparse_adam.pmv_init(self.params["embedding"]),
                    )
                else:
                    self.opt_state = (
                        self.optimizer.init(rest),
                        sparse_adam.init_state(self.params["embedding"]),
                    )
            else:
                self.opt_state = self.optimizer.init(self.params)

        self._beam_traj = jax.jit(self._beam_trajectory)
        self._pseudo = jax.jit(self._pseudo_targets)
        self._level_step = jax.jit(self._level_step_impl, donate_argnums=(0, 1))
        if self._pmv:
            self._train_batch = self._make_pmv_train_batch()
            self._record_mirror_id()
        else:
            self._train_batch = jax.jit(
                self._train_batch_impl, donate_argnums=(0, 1)
            )
        if mesh is not None:
            from dismember_tpu.train import spmd

            self._train_batch, self.params, self.opt_state = (
                spmd.make_sharded_otm_train_batch(self, mesh)
            )

    def _ctx(self):
        """Thread-local x64 scope for f64 parity mode; no-op in f32."""
        if self._x64:
            return jax.enable_x64(True)
        import contextlib

        return contextlib.nullcontext()

    # ------------------------------------------------------------------
    def _beam_trajectory(self, params, seqs):
        """Frozen-model beam trajectories (OTMTree.beamSearchNodes).

        Returns (nodes [n_levels, B, 2*beam], scores [...]) with -1/-inf pads.
        """
        return self._beam_trajectory_from(
            lambda nodes: self.forward(params, nodes, seqs), seqs.shape[0]
        )

    def _beam_trajectory_from(self, logits_fn, b):
        """_beam_trajectory with the scorer abstracted to ``logits_fn(nodes
        [B, W] with -1 pads) -> logits [B, W]`` — the sharded-sparse batch
        (spmd_sparse.make_sharded_sparse_otm_train_batch) reuses the exact
        same trajectory math with a distributed row gather inside."""
        width = 2 * self.beam
        s = self.start_level
        start_lo, start_hi = (1 << s) - 1, (1 << (s + 1)) - 1
        init = np.arange(start_lo, start_hi, dtype=np.int32)
        children0 = np.stack([2 * init + 1, 2 * init + 2], -1).reshape(-1)
        pad = np.full(width - len(children0), -1, dtype=np.int32)
        first = jnp.asarray(np.concatenate([children0, pad]))
        nodes = jnp.broadcast_to(first, (b, width))
        valid = nodes >= 0
        logits = logits_fn(jnp.where(valid, nodes, -1))
        scores = jnp.where(valid, logits, _NEG_INF)
        from dismember_tpu.retrieval.tree_beam import onehot_select

        all_nodes, all_scores = [nodes], [scores]
        for _ in range(1, self.n_levels):
            _, top_idx = jax.lax.top_k(scores, self.beam)
            top_codes = onehot_select(nodes, top_idx)
            nodes = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], -1).reshape(
                b, width
            )
            logits = logits_fn(nodes)
            scores = logits
            all_nodes.append(nodes)
            all_scores.append(scores)
        return jnp.stack(all_nodes), jnp.stack(all_scores)

    def _pseudo_targets(self, params, seqs, target_items):
        """Bottom-up optimal pseudo targets (OTMTree.optimalPseudoTargets).

        target_items [B, J] leaf codes (-1 pad).  Returns (ids, labels) each
        [n_levels, B, J]; index i <-> tree level start_level+1+i.
        """
        return self._pseudo_targets_from(
            lambda nodes: self.forward(params, nodes, seqs), target_items
        )

    def _pseudo_targets_from(self, logits_fn, target_items):
        """_pseudo_targets with the scorer abstracted (see
        :meth:`_beam_trajectory_from`)."""
        ids = target_items.astype(jnp.int32)
        labels = (ids >= 0).astype(self.dtype)
        out_ids, out_labels = [ids], [labels]
        for _ in range(self.n_levels - 1):
            valid = ids >= 0
            sib = jnp.where(ids % 2 == 1, ids + 1, ids - 1)
            sib = jnp.where(valid, sib, -1)
            # sibling's current label when the sibling is also a target node
            eq = ids[:, None, :] == jnp.where(valid, sib, -2)[:, :, None]
            sib_label = jnp.einsum("bjk,bk->bj", eq.astype(labels.dtype), labels)
            pos_pred = logits_fn(ids)
            neg_pred = logits_fn(sib)
            contrib = jnp.where(pos_pred >= neg_pred, labels, sib_label)
            contrib = jnp.where(valid, contrib, 0.0)
            parents = jnp.where(valid, (ids - 1) >> 1, -1)
            ids, labels = _row_group_parents(parents, contrib)
            out_ids.append(ids)
            out_labels.append(labels)
        # built bottom-up: reverse so index 0 = level start_level+1
        return jnp.stack(out_ids[::-1]), jnp.stack(out_labels[::-1])

    def _normal_targets(self, target_items):
        """Plain ancestor targets (OTMTree.normalTargets): the ancestor of
        each target at every level, label 1.  Pure jnp — runs inside jit."""
        ids_levels = []
        labels_levels = []
        cur = jnp.asarray(target_items, jnp.int32)
        for _ in range(self.n_levels):
            ids_levels.append(cur)
            labels_levels.append((cur >= 0).astype(self.dtype))
            cur = jnp.where(cur >= 0, (cur - 1) >> 1, -1)
        return jnp.stack(ids_levels[::-1]), jnp.stack(labels_levels[::-1])

    def _level_step_impl(self, params, opt_state, nodes, t_ids, t_labels, seqs):
        """One BCE step on (beam nodes, level targets)."""
        labels, valid = level_labels(nodes, t_ids, t_labels, self.dtype)
        weights = valid.astype(self.dtype)

        def loss_fn(p):
            logits = self.forward(p, jnp.where(valid, nodes, -1), seqs)
            return bce_with_logits(logits, labels, weights)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = self.optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, loss

    def _sparse_level_step(self, params, opt_state, nodes, t_ids, t_labels, seqs):
        """One BCE level step with lazy row-sparse Adam on the embedding.

        Same math as :meth:`_level_step_impl` (labels from the target-set
        match, weights mask the -1 beam pads) but the gradient is taken
        w.r.t. the *gathered* embedding rows (beam nodes + sequence codes)
        and only those rows get an Adam update — per-level HBM traffic drops
        from O(table) to O(B·(2·beam + L)·E).  Dense Adam on the MLP params.
        """
        from dismember_tpu.constants import PADDING_IDX
        from dismember_tpu.models import deepfm as _deepfm, din as _din
        from dismember_tpu.train import sparse_adam

        mod = {"din": _din, "deepfm": _deepfm}[self.model_type]
        rest_opt, emb_opt = opt_state
        table = params["embedding"]
        rest = {k: v for k, v in params.items() if k != "embedding"}

        labels, valid_nodes = level_labels(nodes, t_ids, t_labels, self.dtype)
        weights = valid_nodes.astype(self.dtype)

        b, w = nodes.shape
        l = seqs.shape[1]
        flat = jnp.concatenate(
            [
                jnp.where(valid_nodes, nodes, PADDING_IDX).reshape(-1),
                seqs.reshape(-1),
            ]
        )
        valid = flat != PADDING_IDX
        rows = table[jnp.where(valid, flat, 0)]
        rows = rows * valid[:, None].astype(rows.dtype)
        pad = (seqs == PADDING_IDX)[:, None, :]
        dummy = jax.lax.stop_gradient(table[:1])

        def loss_fn(rows_in, rest_in):
            p = dict(rest_in, embedding=dummy)
            item_e = rows_in[: b * w].reshape(b, w, -1)
            seq_e = rows_in[b * w :].reshape(b, l, -1)
            ctx = mod.ctx_from_seq_emb(p, seq_e, pad)
            logits = mod.apply_from_emb(p, item_e, ctx)
            return bce_with_logits(logits, labels, weights)

        loss, (g_rows, g_rest) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            rows, rest
        )
        updates, new_rest_opt = self.optimizer.update(g_rest, rest_opt, rest)
        new_rest = optax.apply_updates(rest, updates)
        g_rows = g_rows * valid[:, None].astype(g_rows.dtype)
        new_table, new_emb_opt = sparse_adam.apply_rows(
            table, emb_opt, flat, g_rows, self.learning_rate
        )
        new_params = dict(new_rest, embedding=new_table)
        return new_params, (new_rest_opt, new_emb_opt), loss

    def _train_batch_impl(self, params, opt_state, seqs, targets):
        """One whole OTM batch in a single dispatch: pseudo/normal targets +
        frozen-model beam trajectory (both with the pre-update parameters,
        as in the reference), then a lax.scan of the sequential per-level
        BCE+Adam steps.  Returns (params, opt_state, per-level losses)."""
        if self.target_mode == "pseudo":
            t_ids, t_labels = self._pseudo_targets(params, seqs, targets)
        else:
            t_ids, t_labels = self._normal_targets(targets)
        nodes, _scores = self._beam_trajectory(params, seqs)
        step = self._sparse_level_step if self._sparse else self._level_step_impl

        def level_step(carry, x):
            p, o = carry
            nodes_l, tid_l, tlab_l = x
            p, o, loss = step(p, o, nodes_l, tid_l, tlab_l, seqs)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            level_step, (params, opt_state), (nodes, t_ids, t_labels)
        )
        return params, opt_state, losses

    # ------------------------------------------------------------------
    def _make_pmv_train_batch(self):
        """Whole OTM batch on the packed p|m|v table: per level, one row
        gather + one Pallas row write — ZERO XLA table scatters.  The mv
        format's per-level scatter measured 26.0 ms/batch = 40% of the
        64.6 ms 10M-item whole-batch (scripts/profile_otm_scatter.py), paid
        n_levels times per batch; pmv removes all of them.  The frozen
        forwards (pseudo targets + beam trajectory) gather param lanes from
        the same packed state, so the scan needs no [V, E] table at all.

        ``params["embedding"]`` becomes a MIRROR re-materialized by
        ``_sync_mirrors`` at train/eval boundaries; ``_adopt_mirrors``
        pushes external assignments back into the packed state — the same
        contract as TDMTrainer/DRTrainer."""
        import functools

        from dismember_tpu.constants import PADDING_IDX
        from dismember_tpu.models import deepfm as _deepfm, din as _din
        from dismember_tpu.train import sparse_adam

        mod = {"din": _din, "deepfm": _deepfm}[self.model_type]
        e = self.embed_size
        lr = self.learning_rate
        optimizer = self.optimizer

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(rest, opt_state, seqs, targets):
            rest_opt, emb_pmv = opt_state
            b, l = seqs.shape
            pad_mask = (seqs == PADDING_IDX)[:, None, :]
            dummy = jnp.zeros((1, e), jnp.float32)

            def gather(pmv, nodes):
                flat = nodes.reshape(-1)
                valid = flat != PADDING_IDX
                rows = sparse_adam.pmv_gather(
                    pmv, jnp.where(valid, flat, 0), e
                )
                rows = rows * valid[:, None].astype(rows.dtype)
                return rows.reshape(nodes.shape + (e,))

            p_dummy = dict(rest, embedding=dummy)
            pmv0 = emb_pmv["pmv"]
            ctx0 = mod.ctx_from_seq_emb(p_dummy, gather(pmv0, seqs), pad_mask)

            def frozen_logits(nodes):
                return mod.apply_from_emb(p_dummy, gather(pmv0, nodes), ctx0)

            if self.target_mode == "pseudo":
                t_ids, t_labels = self._pseudo_targets_from(
                    frozen_logits, targets
                )
            else:
                t_ids, t_labels = self._normal_targets(targets)
            nodes, _scores = self._beam_trajectory_from(frozen_logits, b)

            def level_step(carry, x):
                est, rp, ro = carry
                nodes_l, tid_l, tlab_l = x
                labels, valid_nodes = level_labels(
                    nodes_l, tid_l, tlab_l, jnp.float32
                )
                weights = valid_nodes.astype(jnp.float32)
                w = nodes_l.shape[1]
                flat = jnp.concatenate(
                    [
                        jnp.where(
                            valid_nodes, nodes_l, PADDING_IDX
                        ).reshape(-1),
                        seqs.reshape(-1),
                    ]
                )
                valid = flat != PADDING_IDX
                rows = sparse_adam.pmv_gather(
                    est["pmv"], jnp.where(valid, flat, 0), e
                )
                rows = rows * valid[:, None].astype(rows.dtype)

                def loss_fn(rows_in, rest_in):
                    p = dict(rest_in, embedding=dummy)
                    item_e = rows_in[: b * w].reshape(b, w, -1)
                    seq_e = rows_in[b * w :].reshape(b, l, -1)
                    ctx = mod.ctx_from_seq_emb(p, seq_e, pad_mask)
                    logits = mod.apply_from_emb(p, item_e, ctx)
                    return bce_with_logits(logits, labels, weights)

                loss, (g_rows, g_rest) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1)
                )(rows, rp)
                updates, new_ro = optimizer.update(g_rest, ro, rp)
                new_rp = optax.apply_updates(rp, updates)
                g_rows = g_rows * valid[:, None].astype(g_rows.dtype)
                new_est = sparse_adam.pmv_apply_rows(est, flat, g_rows, lr)
                return (new_est, new_rp, new_ro), loss

            (emb_pmv, rest, rest_opt), losses = jax.lax.scan(
                level_step, (emb_pmv, rest, rest_opt),
                (nodes, t_ids, t_labels),
            )
            return rest, (rest_opt, emb_pmv), losses

        def run(params, opt_state, seqs, targets):
            rest = {k: v for k, v in params.items() if k != "embedding"}
            new_rest, new_opt, losses = step(rest, opt_state, seqs, targets)
            self._mirrors_stale = True
            return (
                dict(new_rest, embedding=params["embedding"]),
                new_opt,
                losses,
            )

        return run

    # -- pmv mirror management (same contract as TDMTrainer/DRTrainer) --
    def _record_mirror_id(self) -> None:
        self._mirror_id = id(self.params["embedding"])

    def _sync_mirrors(self) -> None:
        """Re-materialize the [V, E] embedding mirror from the packed p|m|v
        state (no-op outside pmv mode or when already in sync).  Replaces
        ``self.params`` with a fresh dict so identity-keyed caches
        (``_packed_search``) rebuild."""
        if not self._pmv or not self._mirrors_stale:
            return
        from dismember_tpu.train import sparse_adam

        v_rows, e = self.params["embedding"].shape
        self.params = dict(
            self.params,
            embedding=sparse_adam.pmv_unpack(self.opt_state[1], v_rows, e),
        )
        self._mirrors_stale = False
        self._record_mirror_id()

    def _adopt_mirrors(self) -> None:
        """Push an externally-assigned ``params["embedding"]`` (checkpoint
        load etc., detected by array identity) into the packed state's p
        lanes, keeping moments.  Called at train() entry."""
        if not self._pmv:
            return
        from dismember_tpu.train import sparse_adam

        if id(self.params["embedding"]) == self._mirror_id:
            return
        if self._mirrors_stale:
            logger.warning(
                "embedding mirror was externally replaced while the packed "
                "p|m|v state was newer (raw-step driving without "
                "_sync_mirrors); adopting the external values into the "
                "packed state (moments kept)."
            )
        rest_opt, emb_pmv = self.opt_state
        self.opt_state = (
            rest_opt,
            sparse_adam.pmv_refresh(
                emb_pmv, self.params["embedding"].astype(jnp.float32)
            ),
        )
        self._mirrors_stale = False
        self._record_mirror_id()

    # -- step-level checkpoint state (train/step_resume.py) -------------
    def _step_state(self) -> dict:
        """Loop-state pytree for within-stage snapshots; the pmv embedding
        MIRROR is excluded (the packed state in opt_state owns the table)."""
        params = self.params
        if self._pmv:
            params = {k: v for k, v in params.items() if k != "embedding"}
        return {"params": params, "opt_state": self.opt_state}

    def _restore_step_state(self, st: dict) -> None:
        self.opt_state = st["opt_state"]
        if self._pmv:
            self.params = dict(
                st["params"], embedding=self.params["embedding"]
            )
            self._mirrors_stale = True
            self._record_mirror_id()
        else:
            self.params = st["params"]

    # ------------------------------------------------------------------
    def train(
        self,
        num_epochs: int,
        progress_interval: int = 0,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 0,
    ) -> list[dict]:
        """``checkpoint_path``/``checkpoint_every`` (in batches) enable
        within-stage step-level snapshots with bit-compatible resume — see
        train/step_resume.py; the epoch a kill lands in resumes mid-epoch
        (skipped batches' losses are absent from that epoch's log entry)."""
        from dismember_tpu.train import step_resume

        d = self.data
        n = len(d.train_seqs)
        rng = np.random.default_rng(self.seed)
        logs: list[dict] = []
        self._adopt_mirrors()
        start_epoch, start_bi = 1, 0
        if checkpoint_path:
            loaded = step_resume.load_step_state(
                checkpoint_path, self._step_state()
            )
            if loaded is not None:
                st, meta = loaded
                self._restore_step_state(st)
                step_resume.rng_state_from_json(rng, meta["rng_before_perm"])
                start_epoch = int(meta["epoch"])
                start_bi = int(meta["batch"]) + 1
                logger.info(
                    f"resumed step checkpoint {checkpoint_path} at epoch "
                    f"{start_epoch} batch {meta['batch']}"
                )
        if self.mesh is not None:
            from dismember_tpu.core.mesh import DATA_AXIS

            n_data = self.mesh.shape[DATA_AXIS]
        from collections import deque

        for epoch in range(start_epoch, num_epochs + 1):
            rng_before_perm = step_resume.rng_state_to_json(rng)
            perm = rng.permutation(n)
            epoch_losses: list[list[float]] = []
            t0 = time.perf_counter()
            num_batches = math.ceil(n / self.train_batch_size)
            # FIFO window of in-flight loss fetches: materializing each
            # batch's losses immediately blocks one relay round-trip per
            # batch; a window keeps the device busy on batches i+1..i+W
            # while the host drains batch i (same pattern as
            # jtm.compute_weights / dr_coordinate._pipelined_beam).  One
            # fetch moves ALL level losses (the per-float loop before it
            # cost n_levels round-trips per batch).
            inflight: deque = deque()

            def drain() -> None:
                epoch_losses.append(
                    np.asarray(inflight.popleft()).astype(float).tolist()
                )

            bi0, start_bi = start_bi, 0  # resume lands mid-epoch once
            for bi in range(bi0, num_batches):
                idx = perm[bi * self.train_batch_size : (bi + 1) * self.train_batch_size]
                if self.mesh is not None and len(idx) % n_data:
                    # ragged epoch tail: SPMD batches must split over 'data'
                    idx = idx[: len(idx) // n_data * n_data]
                    if len(idx) == 0:
                        continue
                seqs = jnp.asarray(d.train_seqs[idx], dtype=jnp.int32)
                targets_np = d.train_labels[idx]
                if targets_np.shape[1] > self.label_num:
                    # ragged one_user_sample labels: pad each batch only to
                    # its own max (power-of-2 bucketed to bound recompiles),
                    # matching the reference's variable-length target lists
                    # (otm LocalDataSet.scala:69-104)
                    jmax = int((targets_np >= 0).sum(axis=1).max(initial=0))
                    width = max(self.label_num, 1 << max(jmax - 1, 0).bit_length())
                    targets_np = targets_np[:, : min(width, targets_np.shape[1])]
                targets = jnp.asarray(targets_np, dtype=jnp.int32)
                with self._ctx():
                    self.params, self.opt_state, losses = self._train_batch(
                        self.params, self.opt_state, seqs, targets
                    )
                inflight.append(losses)
                if len(inflight) >= 8:
                    drain()
                if (
                    checkpoint_path
                    and checkpoint_every > 0
                    and (bi + 1) % checkpoint_every == 0
                    and bi + 1 < num_batches
                ):
                    step_resume.save_step_state(
                        checkpoint_path,
                        self._step_state(),
                        {
                            "epoch": epoch,
                            "batch": bi,
                            "rng_before_perm": rng_before_perm,
                        },
                    )
                    logger.info(
                        f"step checkpoint saved at epoch {epoch} batch {bi + 1}"
                    )
                if progress_interval > 0 and (bi + 1) % progress_interval == 0:
                    if not epoch_losses:
                        drain()
                    # epoch_losses[-1] is the OLDEST drained batch (the FIFO
                    # window holds up to 8 in flight) — label it with its
                    # true batch index instead of claiming it is bi+1's.
                    logger.info(
                        f"Epoch {epoch} iter {bi + 1}/{num_batches} "
                        f"loss(last level, batch {len(epoch_losses)}): "
                        f"{epoch_losses[-1][-1]:.4f}"
                    )
            while inflight:
                drain()
            ev = self.evaluate()
            logs.append(
                {
                    "epoch": epoch,
                    "time": time.perf_counter() - t0,
                    "level_losses": [
                        float(np.mean([l[i] for l in epoch_losses]))
                        for i in range(self.n_levels)
                    ],
                    "eval_loss": ev.loss,
                    "precision": ev.precision,
                    "recall": ev.recall,
                    "ndcg": ev.ndcg,
                }
            )
            logger.info(
                f"Epoch {epoch} time {logs[-1]['time']:.1f}s "
                f"losses {['%.4f' % x for x in logs[-1]['level_losses']]} "
                f"eval loss {ev.loss:.4f} metrics {ev}"
            )
        return logs

    # ------------------------------------------------------------------
    def _packed_search(self):
        """Packed pair-table serving loop over the OTM complete tree.

        Serving-only fast path (training trajectories stay on _beam_traj):
        the same deep-catalog layout win as TDM's packed beam
        (retrieval/packed_beam.py — one 128-lane row gather per level instead
        of a code-indexed embedding gather).  OTM's tree is complete, so
        every heap slot "exists" (the classic trajectory never masks) and the
        id lanes carry the leaf CODE itself; validity/consumed filtering
        stays in recommend_batch exactly as for the classic path.  Rebuilt
        lazily whenever ``self.params`` is replaced (each train batch returns
        fresh donated arrays, so identity tracks staleness).  f64 parity mode
        keeps the classic f32/f64 trajectory path.
        """
        if self._x64 or self.n_levels < 1:
            return None
        cached = getattr(self, "_packed_cache", None)
        if cached is not None and cached[0] is self.params:
            return cached[1]
        from dismember_tpu.retrieval.packed_beam import (
            PackedTree,
            build_pair_table,
            make_hybrid_beam_fn,
        )
        from dismember_tpu.retrieval.tree_beam import TreeBeamConfig
        from dismember_tpu.train.tdm import packed_fns

        total = self.data.num_tree_nodes
        s = self.start_level
        start = np.arange((1 << s) - 1, (1 << (s + 1)) - 1, dtype=np.int64)
        width = 2 * self.beam
        padded = np.concatenate([start, np.full(width - len(start), -1)])
        cfg = TreeBeamConfig(
            beam=self.beam,
            max_level=self.leaf_level,
            start_level=s,
            start_codes_padded=tuple(int(c) for c in padded),
        )
        table = build_pair_table(
            self.params["embedding"],
            np.ones(total, dtype=bool),
            np.arange(total, dtype=np.int64),
            total,
        )
        packed = PackedTree(
            pair_table=table, embed_size=self.embed_size, cfg=cfg
        )
        pre, app = packed_fns(self.model_type)
        from dismember_tpu.train.tdm import MATMUL_FIRST_SCORERS

        # contraction einsums round operands to bf16 on TPU — exact only
        # for matmul-first scorers (see serving.TDMServing._matmul_first)
        fn = make_hybrid_beam_fn(
            packed, pre, app,
            max_contract_rows=(
                8192 if self.model_type in MATMUL_FIRST_SCORERS else 0
            ),
        )
        self._packed_cache = (self.params, fn)
        return fn

    def batch_beam_search(self, seqs: np.ndarray):
        """Final-level candidates [B, 2*beam] (codes) + scores."""
        self._sync_mirrors()
        fn = self._packed_search()
        if fn is not None:
            codes, scores = fn(self.params, jnp.asarray(seqs, jnp.int32))
            return np.asarray(codes), np.asarray(scores)
        with self._ctx():
            nodes, scores = self._beam_traj(
                self.params, jnp.asarray(seqs, jnp.int32)
            )
        return np.asarray(nodes[-1]), np.asarray(scores[-1])

    def recommend_batch(
        self,
        seqs: np.ndarray,
        topk: int | None = None,
        consumed: list[np.ndarray] | None = None,
        return_codes: bool = False,
        with_scores: bool = False,
    ):
        """Top-k per row; candidates filtered to existing leaves (allNodes)
        and non-consumed (otm Evaluator.scala:58-66)."""
        k = topk or self.topk
        nodes, scores = self.batch_beam_search(seqs)
        out = []
        all_nodes = self.data.all_nodes
        for i in range(len(nodes)):
            ids, sc = nodes[i], scores[i].copy()
            ok = (ids >= 0) & (ids < len(all_nodes))
            ok &= np.where(ok, all_nodes[np.clip(ids, 0, len(all_nodes) - 1)], False)
            if consumed is not None and len(consumed[i]) > 0:
                ok &= ~np.isin(ids, consumed[i])
            idx = np.flatnonzero(ok)
            order = idx[np.argsort(-sc[idx], kind="stable")][:k]
            codes = ids[order]
            if return_codes:
                out.append((codes, sc[order]) if with_scores else codes)
            else:
                items = np.asarray(
                    [self.data.code_to_item[int(c)] for c in codes], dtype=np.int64
                )
                out.append((items, sc[order]) if with_scores else items)
        return out

    def evaluate(self) -> OTMEvalResult:
        """Eval parity with otm Evaluator.evaluate: beam search per eval
        sample, consumed+validity filter, top-k; loss = summed BCE of top-k
        scores against membership labels / eval size; metrics averaged.

        Fully batch-vectorized (no per-row host loop): filtering/top-k as
        masked argsort over the whole batch, metrics via
        :func:`~dismember_tpu.core.metrics.compute_metrics_batch`."""
        from dismember_tpu.core.metrics import compute_metrics_batch

        d = self.data
        m = len(d.eval_seqs)
        if m == 0:
            return OTMEvalResult()
        all_nodes = d.all_nodes
        max_consumed = max(
            (len(d.user_consumed.get(int(u), ())) for u in d.eval_users), default=0
        )
        total_loss = 0.0
        prec = rec = ndcg = 0.0
        k = self.topk
        for s in range(0, m, self.eval_batch_size):
            e = min(s + self.eval_batch_size, m)
            b = e - s
            ids, scores = self.batch_beam_search(d.eval_seqs[s:e])
            ok = (ids >= 0) & (ids < len(all_nodes))
            ok &= np.where(ok, all_nodes[np.clip(ids, 0, len(all_nodes) - 1)], False)
            if max_consumed > 0:
                cons = np.full((b, max_consumed), -1, dtype=np.int64)
                for i, u in enumerate(d.eval_users[s:e]):
                    c = d.user_consumed.get(int(u), ())
                    cons[i, : len(c)] = c
                ok &= ~(ids[:, :, None] == cons[:, None, :]).any(-1)
            masked = np.where(ok, scores.astype(np.float64), -np.inf)
            order = np.argsort(-masked, axis=1, kind="stable")[:, :k]
            codes = np.take_along_axis(ids, order, axis=1)
            sc = np.take_along_axis(masked, order, axis=1)
            sel = np.isfinite(sc)
            codes = np.where(sel, codes, -1)

            labels = d.eval_labels[s:e]
            is_pos = (
                (codes[:, :, None] == labels[:, None, :]) & (labels >= 0)[:, None, :]
            ).any(-1)
            x = np.where(sel, sc, 0.0)
            total_loss += float(
                np.sum(
                    np.where(
                        sel,
                        np.maximum(x, 0) - x * is_pos + np.log1p(np.exp(-np.abs(x))),
                        0.0,
                    )
                )
            )
            p, r, nd = compute_metrics_batch(codes, labels)
            prec += float(p.sum())
            rec += float(r.sum())
            ndcg += float(nd.sum())
        return OTMEvalResult(
            loss=total_loss / m, precision=prec / m, recall=rec / m, ndcg=ndcg / m
        )
