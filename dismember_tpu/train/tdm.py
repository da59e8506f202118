"""TDM training loop: level-sampled BCE over the tree, one jit per step.

Reference call stack (SURVEY.md §3.1, tdm/.../optim/LocalOptimizer.scala):
per iteration the reference converts a batch on N threads (negative sampling
+ sequence duplication), runs N weight-shared model clones, reduces gradient
slices and takes one Adam step on a flat parameter tensor.  The TPU rebuild
folds all of that into a single jitted train step:

    sample negatives on device (Gumbel top-k per level)
    -> grouped model forward [B, U] (sequence embeddings shared per target)
    -> BCE-with-logits
    -> grad + optax Adam update (grads mean over batch-sharded data axis is
       implicit once the step is pjit-ed over a mesh).

Batch accounting parity: ``total_batch_size`` counts *expanded* rows, so the
number of targets per step is ``max(1, total_batch // unit)`` with ``unit`` the
per-target sampled-node count (tdm MiniBatch.scala:19).
"""

from __future__ import annotations

import dataclasses
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dismember_tpu.core.metrics import EvalResult, compute_metrics_batch
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.models import deepfm, din
from dismember_tpu.models.losses import bce_with_logits
from dismember_tpu.retrieval.tree_beam import filter_topk, make_beam_fn
from dismember_tpu.train.sampler import TreeSampler

logger = logging.getLogger("dismember_tpu.tdm")


def build_model(model_type: str, tree_max_level: int, embed_size: int, seq_len: int, key):
    """Create (init_params, forward) for a scorer over tree-node codes.

    num_index = 2^(max_level+1) - 1, mirroring DIN.buildModel
    (tdm/.../model/DIN.scala:17).
    """
    num_index = (1 << (tree_max_level + 1)) - 1
    if model_type == "din":
        params = din.init_params(key, num_index, embed_size)
        return params, din.forward
    elif model_type == "deepfm":
        params = deepfm.init_params(key, num_index, embed_size, seq_len)
        return params, deepfm.forward
    raise ValueError(f"unknown deep model: {model_type}")


def serving_fns(model_type: str):
    """(precompute, apply) pair with the level-invariant sequence side hoisted
    out of the beam-search level loop."""
    mod = {"din": din, "deepfm": deepfm}[model_type]
    return mod.precompute_seq, mod.apply_with_ctx


def packed_fns(model_type: str):
    """(precompute, apply_from_emb) pair for the packed pair-table beam loop
    (retrieval/packed_beam.py), which feeds the scorer gathered embeddings."""
    mod = {"din": din, "deepfm": deepfm}[model_type]
    return mod.precompute_seq, mod.apply_from_emb


# Scorers whose every use of the candidate embedding flows through a matmul
# (the MXU rounds matmul operands to bf16, so bf16 pair-table lanes and the
# hybrid beam's contraction einsum are score-invisible for them).  DeepFM is
# NOT in this set: its FM term is elementwise f32 VPU math
# (models/deepfm.py apply_from_emb), so bf16-rounded embeddings perturb its
# scores — deepfm serving keeps f32 tables and skips contraction levels.
MATMUL_FIRST_SCORERS = frozenset({"din"})


@dataclasses.dataclass
class ResidentWindows:
    """Compact sliding-window training set for ``train_resident``: the
    [U, S] per-user item-code matrix uploads ONCE and every batch's windows
    are gathered on device.  Logical row ``r`` of the [U * (t_hi - t_lo)]
    dataset is user ``r // n_win`` at target position ``t = t_lo + r %
    n_win``: sequence = items[u, t-L:t], target = items[u, t] — the
    reference's TreeInit windowing (tdm TDMInit.scala) evaluated lazily on
    device instead of materialized [N, L] on host.  At 10M-item scale this
    is a ~120MB one-time upload instead of ~700MB of expanded windows
    through the relay (CLAUDE.md transfer rates)."""

    item_codes: np.ndarray  # [U, S] tree codes (int32)
    seq_len: int
    t_lo: int
    t_hi: int

    @classmethod
    def from_items(cls, tree: ArrayTree, items: np.ndarray, seq_len: int,
                   t_lo: int, t_hi: int) -> "ResidentWindows":
        return cls(
            item_codes=tree.ids_to_codes(items).astype(np.int32),
            seq_len=seq_len, t_lo=t_lo, t_hi=t_hi,
        )

    @property
    def n_win(self) -> int:
        return self.t_hi - self.t_lo

    def __len__(self) -> int:
        return len(self.item_codes) * self.n_win


@dataclasses.dataclass
class TDMTrainer:
    tree: ArrayTree
    model_type: str = "din"
    embed_size: int = 16
    learning_rate: float = 1e-4
    total_batch_size: int = 8192
    total_eval_batch_size: int = 8192
    seq_len: int = 10
    layer_neg_counts: str = "0,1,2,3,4"
    sample_with_prob: bool = False
    sample_tolerance: int = 20
    start_sample_level: int = 1
    topk: int = 10
    beam_size: int = 20
    seed: int = 0
    mesh: object = None  # jax.sharding.Mesh -> SPMD train step (spmd.py)
    embed_dtype: object = None  # e.g. jnp.bfloat16: halve table memory for
    # huge catalogs (compute stays f32; Adam moments kept f32)
    sparse_embed_update: bool | None = None  # lazy row-sparse Adam on the
    # embedding table (train/sparse_adam.py).  None = auto: on for >=2^20-row
    # tables, where dense Adam's O(table) HBM traffic dominates the step;
    # dense (exact reference Adam) otherwise.  Composes with `mesh`: the
    # table + Adam state row-shard on 'model' with shard-local row updates
    # (train/spmd_sparse.py).
    sparse_format: str = "auto"  # packed-state format of the sparse step:
    # "pmv" packs params+moments into one 128-lane row (zero XLA table
    # scatters; measured 3.57 -> 2.60 ms/step at 10M items,
    # scripts/profile_pmv_tdm.py) but makes params["embedding"] a MIRROR
    # synced at eval/train boundaries; "mv" keeps the table addressable
    # (one ~100ns/row scatter per step).  "auto" = pmv when the width packs,
    # the table is f32 and single-chip; mv otherwise (bf16 tables, meshes).

    def __post_init__(self):
        key = jax.random.PRNGKey(self.seed)
        num_levels = self.tree.max_level
        base_num_index = (1 << (num_levels + 1)) - 1
        self.sampler = TreeSampler.build(
            self.tree,
            self.layer_neg_counts,
            start_level=self.start_sample_level,
            with_prob=self.sample_with_prob,
            tolerance=self.sample_tolerance,
        )
        self.num_targets_per_batch = max(1, self.total_batch_size // self.sampler.unit)
        if self.mesh is not None:
            # batch must split across the 'data' axis
            from dismember_tpu.core.mesh import DATA_AXIS

            n_data = self.mesh.shape[DATA_AXIS]
            self.num_targets_per_batch = max(
                n_data, self.num_targets_per_batch // n_data * n_data
            )
        if self.sparse_embed_update is not None:
            self._sparse = self.sparse_embed_update
        else:
            from dismember_tpu.train.sparse_adam import sparse_worthwhile

            touched = self.num_targets_per_batch * (
                self.sampler.unit + self.seq_len
            )
            self._sparse = sparse_worthwhile(
                base_num_index, touched, embed_dim=self.embed_size
            )
        if self.mesh is not None:
            # pad the node table so it row-shards over the 'model' axis (and,
            # for the sharded-sparse step, so each shard's rows slot-pack)
            if self._sparse:
                from dismember_tpu.train import spmd_sparse

                num_index = spmd_sparse.sparse_padded_rows(
                    base_num_index, self.mesh, self.embed_size
                )
            else:
                from dismember_tpu.train import spmd

                num_index = spmd.padded_num_index(base_num_index, self.mesh)
            if self.model_type == "din":
                self.params = din.init_params(key, num_index, self.embed_size)
                self.forward = din.forward
            else:
                self.params = deepfm.init_params(
                    key, num_index, self.embed_size, self.seq_len
                )
                self.forward = deepfm.forward
        else:
            self.params, self.forward = build_model(
                self.model_type, num_levels, self.embed_size, self.seq_len, key
            )
        if self.embed_dtype is not None:
            self.params["embedding"] = self.params["embedding"].astype(
                self.embed_dtype
            )
        self.optimizer = optax.adam(
            self.learning_rate, b1=0.9, b2=0.999, eps=1e-8,
            mu_dtype=jnp.float32,  # full-precision moments under bf16 params
        )
        self._pmv = False  # pmv mode: params["embedding"] is a MIRROR of the
        # packed p|m|v state, re-materialized by _sync_mirrors at eval/train
        # boundaries (same contract as DRTrainer)
        self._mirrors_stale = False
        if self._sparse and self.mesh is not None:
            from dismember_tpu.train import spmd_sparse

            self._train_step, self.params, self.opt_state = (
                spmd_sparse.make_sharded_sparse_train_step(
                    self.model_type, self.sampler, self.optimizer,
                    self.mesh, self.params, self.learning_rate,
                )
            )
        elif self._sparse:
            from dismember_tpu.train import sparse_adam

            if self.sparse_format not in ("auto", "mv", "pmv"):
                raise ValueError(f"unknown sparse_format {self.sparse_format!r}")
            f32_table = self.embed_dtype is None or self.embed_dtype == jnp.float32
            if self.sparse_format == "auto":
                self._pmv = (
                    sparse_adam.pmv_slots(self.embed_size) > 0 and f32_table
                )
            else:
                self._pmv = self.sparse_format == "pmv"
                if self._pmv and (
                    sparse_adam.pmv_slots(self.embed_size) == 0 or not f32_table
                ):
                    raise ValueError(
                        f"pmv needs a packable width (3*E <= 128; E="
                        f"{self.embed_size}) and an f32 table"
                    )
            rest = {k: v for k, v in self.params.items() if k != "embedding"}
            if self._pmv:
                self.opt_state = (
                    self.optimizer.init(rest),
                    sparse_adam.pmv_init(self.params["embedding"]),
                )
                self._train_step = self._make_pmv_train_step()
                self._record_mirror_id()
            else:
                self.opt_state = (
                    self.optimizer.init(rest),
                    sparse_adam.init_state(self.params["embedding"]),
                )
                self._train_step = self._make_sparse_train_step()
        elif self.mesh is not None:
            from dismember_tpu.train.spmd import make_sharded_train_step

            self.opt_state = self.optimizer.init(self.params)
            self._train_step, self.params, self.opt_state = make_sharded_train_step(
                self.forward, self.sampler, self.optimizer, self.mesh,
                self.params, self.opt_state,
            )
        else:
            self.opt_state = self.optimizer.init(self.params)
            self._train_step = self._make_train_step()
        self._eval_loss_step = self._make_eval_loss_step()
        self._beam_fn = None
        self._beam_fn_width = None

    # ------------------------------------------------------------------
    def _make_train_step(self):
        forward = self.forward
        sampler = self.sampler
        optimizer = self.optimizer
        sampler_state = sampler.device_state()

        def step_impl(params, opt_state, key, target_codes, seq_codes, sstate):
            codes, labels, weights = sampler.sample(key, target_codes, sstate)

            def loss_fn(p):
                logits = forward(p, codes, seq_codes)
                return bce_with_logits(logits, labels, weights)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state, loss

        self._step_impl = step_impl  # un-jitted: train_resident scans over it
        step = jax.jit(step_impl)
        return lambda p, o, k, tc, sc: step(p, o, k, tc, sc, sampler_state)

    def _make_sparse_train_step(self):
        """Train step for huge catalogs: differentiate w.r.t. the gathered
        embedding rows and lazy-Adam only the touched rows (sparse_adam.py).

        Same forward math and same gradients as the dense step (duplicate
        row gradients are segment-summed exactly like dense scatter-add
        autodiff); Adam semantics differ only for UNtouched rows, which the
        dense/reference step nudges along stale momentum each iteration and
        this step leaves in place (TF LazyAdam / torch SparseAdam).  Buffers
        are donated so the table and moments update in place — per-step HBM
        traffic is O(batch*unit*E), not O(table)."""
        import functools

        from dismember_tpu.constants import PADDING_IDX
        from dismember_tpu.models import deepfm as _deepfm, din as _din
        from dismember_tpu.train import sparse_adam

        mod = {"din": _din, "deepfm": _deepfm}[self.model_type]
        sampler = self.sampler
        rest_optimizer = self.optimizer
        lr = self.learning_rate
        sampler_state = sampler.device_state()

        def step_impl(params, opt_state, key, target_codes, seq_codes, sstate):
            rest_opt, emb_opt = opt_state
            codes, labels, weights = sampler.sample(key, target_codes, sstate)
            b, u = codes.shape
            l = seq_codes.shape[1]
            table = params["embedding"]
            rest = {k: v for k, v in params.items() if k != "embedding"}
            flat = jnp.concatenate([codes.reshape(-1), seq_codes.reshape(-1)])
            valid = flat != PADDING_IDX
            rows = table[jnp.where(valid, flat, 0)]
            if rows.dtype in (jnp.bfloat16, jnp.float16):
                rows = rows.astype(jnp.float32)
            rows = rows * valid[:, None].astype(rows.dtype)
            pad = (seq_codes == PADDING_IDX)[:, None, :]
            dummy = jax.lax.stop_gradient(table[:1])

            def loss_fn(rows_in, rest_in):
                p = dict(rest_in, embedding=dummy)
                item_e = rows_in[: b * u].reshape(b, u, -1)
                seq_e = rows_in[b * u :].reshape(b, l, -1)
                ctx = mod.ctx_from_seq_emb(p, seq_e, pad)
                logits = mod.apply_from_emb(p, item_e, ctx)
                return bce_with_logits(logits, labels, weights)

            loss, (g_rows, g_rest) = jax.value_and_grad(
                loss_fn, argnums=(0, 1)
            )(rows, rest)
            updates, new_rest_opt = rest_optimizer.update(
                g_rest, rest_opt, rest
            )
            new_rest = optax.apply_updates(rest, updates)
            g_rows = g_rows * valid[:, None].astype(g_rows.dtype)
            new_table, new_emb_opt = sparse_adam.apply_rows(
                table, emb_opt, flat, g_rows, lr
            )
            new_params = dict(new_rest, embedding=new_table)
            return new_params, (new_rest_opt, new_emb_opt), loss

        self._step_impl = step_impl  # un-jitted: train_resident scans over it
        step = functools.partial(jax.jit, donate_argnums=(0, 1))(step_impl)
        return lambda p, o, k, tc, sc: step(p, o, k, tc, sc, sampler_state)

    def _make_pmv_train_step(self):
        """Sparse step on the packed p|m|v table: one row gather + one Pallas
        row write, ZERO XLA table scatters — the mv step's last ~100ns/row
        scatter removed (measured 3.57 -> 2.60 ms/step at 10M items,
        scripts/profile_pmv_tdm.py).  Same per-touched-row Adam math as the
        mv/dense step (bit-identical given identical gradients).

        In this mode the packed state inside ``opt_state`` owns the table;
        ``params["embedding"]`` becomes a MIRROR used only by consumers
        outside the train loop (eval, beam serving, export, checkpoints).
        ``_sync_mirrors`` re-materializes it at train/eval boundaries and
        ``_adopt_mirrors`` pushes external assignments (checkpoint loads)
        back into the packed state — the same contract as DRTrainer."""
        import functools

        from dismember_tpu.constants import PADDING_IDX
        from dismember_tpu.models import deepfm as _deepfm, din as _din
        from dismember_tpu.train import sparse_adam

        mod = {"din": _din, "deepfm": _deepfm}[self.model_type]
        sampler = self.sampler
        rest_optimizer = self.optimizer
        lr = self.learning_rate
        e = self.embed_size
        sampler_state = sampler.device_state()

        def step_impl(rest, opt_state, key, target_codes, seq_codes, sstate):
            rest_opt, emb_pmv = opt_state
            codes, labels, weights = sampler.sample(key, target_codes, sstate)
            b, u = codes.shape
            l = seq_codes.shape[1]
            flat = jnp.concatenate([codes.reshape(-1), seq_codes.reshape(-1)])
            valid = flat != PADDING_IDX
            rows = sparse_adam.pmv_gather(
                emb_pmv["pmv"], jnp.where(valid, flat, 0), e
            )
            rows = rows * valid[:, None].astype(rows.dtype)
            pad = (seq_codes == PADDING_IDX)[:, None, :]
            dummy = jnp.zeros((1, e), rows.dtype)

            def loss_fn(rows_in, rest_in):
                p = dict(rest_in, embedding=dummy)
                item_e = rows_in[: b * u].reshape(b, u, -1)
                seq_e = rows_in[b * u :].reshape(b, l, -1)
                ctx = mod.ctx_from_seq_emb(p, seq_e, pad)
                logits = mod.apply_from_emb(p, item_e, ctx)
                return bce_with_logits(logits, labels, weights)

            loss, (g_rows, g_rest) = jax.value_and_grad(
                loss_fn, argnums=(0, 1)
            )(rows, rest)
            updates, new_rest_opt = rest_optimizer.update(
                g_rest, rest_opt, rest
            )
            new_rest = optax.apply_updates(rest, updates)
            g_rows = g_rows * valid[:, None].astype(g_rows.dtype)
            new_emb_pmv = sparse_adam.pmv_apply_rows(emb_pmv, flat, g_rows, lr)
            return new_rest, (new_rest_opt, new_emb_pmv), loss

        self._step_impl = step_impl  # un-jitted: train_resident scans over it
        step = functools.partial(jax.jit, donate_argnums=(0, 1))(step_impl)

        def run(params, opt_state, key, target_codes, seq_codes):
            rest = {k: v for k, v in params.items() if k != "embedding"}
            new_rest, new_opt, loss = step(
                rest, opt_state, key, target_codes, seq_codes, sampler_state
            )
            self._mirrors_stale = True
            return (
                dict(new_rest, embedding=params["embedding"]),
                new_opt,
                loss,
            )

        return run

    # -- pmv mirror management (same contract as DRTrainer, dr.py:580-669) --
    def _record_mirror_id(self) -> None:
        self._mirror_id = id(self.params["embedding"])

    def _sync_mirrors(self) -> None:
        """Re-materialize the [V, E] embedding mirror from the packed p|m|v
        state (no-op outside pmv mode or when already in sync)."""
        if not self._pmv or not self._mirrors_stale:
            return
        from dismember_tpu.train import sparse_adam

        v_rows, e = self.params["embedding"].shape
        self.params["embedding"] = sparse_adam.pmv_unpack(
            self.opt_state[1], v_rows, e
        )
        self._mirrors_stale = False
        self._record_mirror_id()

    def _adopt_mirrors(self) -> None:
        """Push an externally-assigned ``params["embedding"]`` (checkpoint
        load etc., detected by array identity) into the packed state's p
        lanes, keeping moments.  Called at train() entry.  If the packed
        state is newer (_mirrors_stale after raw-step driving) and a mirror
        was still replaced externally, the external values win with a
        warning (ADVICE r2)."""
        if not self._pmv:
            return
        from dismember_tpu.train import sparse_adam

        replaced = id(self.params["embedding"]) != self._mirror_id
        if not replaced:
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

    def _make_eval_loss_step(self):
        forward = self.forward
        sampler = self.sampler
        sampler_state = sampler.device_state()

        @jax.jit
        def step(params, key, target_codes, seq_codes, sstate):
            codes, labels, weights = sampler.sample(key, target_codes, sstate)
            logits = forward(params, codes, seq_codes)
            return bce_with_logits(logits, labels, weights)

        return lambda p, k, tc, sc: step(p, k, tc, sc, sampler_state)

    # ------------------------------------------------------------------
    def train(
        self,
        train_seqs: np.ndarray,  # [N, L] raw item ids
        train_targets: np.ndarray,  # [N] raw item ids
        iterations: int,
        eval_data: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
        user_consumed: dict[int, np.ndarray] | None = None,
        progress_interval: int = 100,
        shuffle: bool = True,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 0,
    ) -> list[dict]:
        """Run the training loop; returns per-progress-point logs.

        ``checkpoint_path`` + ``checkpoint_every`` enable within-stage
        step-level snapshots (train/step_resume.py): every N iterations the
        (params, opt state, PRNG cursors, position) tuple is persisted
        atomically, and a restarted call with the same arguments resumes
        bit-compatibly with an uninterrupted run (tests/test_step_resume.py).
        The reference's OptimMethod.save (scalann OptimMethod.scala:28-33)
        snapshots but never resumes."""
        from dismember_tpu.train import step_resume

        self._adopt_mirrors()
        seq_codes_all = self.tree.ids_to_codes(train_seqs)
        target_codes_all = self.tree.ids_to_codes(train_targets)
        n = len(target_codes_all)
        bsz = self.num_targets_per_batch
        rng = np.random.default_rng(self.seed)
        rng_before_perm = step_resume.rng_state_to_json(rng)
        perm = rng.permutation(n) if shuffle else np.arange(n)
        key = jax.random.PRNGKey(self.seed + 1)
        start_it, pos = 1, 0
        if checkpoint_path:
            loaded = step_resume.load_step_state(
                checkpoint_path, self._step_state(key)
            )
            if loaded is not None:
                st, meta = loaded
                self._restore_step_state(st)
                key = jnp.asarray(st["key"])
                step_resume.rng_state_from_json(rng, meta["rng_before_perm"])
                rng_before_perm = step_resume.rng_state_to_json(rng)
                perm = rng.permutation(n) if shuffle else np.arange(n)
                pos = int(meta["pos"])
                start_it = int(meta["iteration"]) + 1
                logger.info(
                    f"resumed step checkpoint {checkpoint_path} at iteration "
                    f"{meta['iteration']} (pos {pos})"
                )

        logs: list[dict] = []
        t_epoch = time.perf_counter()
        for it in range(start_it, iterations + 1):
            if pos + bsz > n:
                rng_before_perm = step_resume.rng_state_to_json(rng)
                perm = rng.permutation(n) if shuffle else np.arange(n)
                pos = 0
            idx = perm[pos : pos + bsz]
            pos += bsz
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            self.params, self.opt_state, loss = self._train_step(
                self.params,
                self.opt_state,
                sub,
                jnp.asarray(target_codes_all[idx]),
                jnp.asarray(seq_codes_all[idx]),
            )
            if it % progress_interval == 0 or it == iterations:
                loss_val = float(loss)
                iter_time = time.perf_counter() - t0
                elapsed = time.perf_counter() - t_epoch
                rows_s = it * bsz * self.sampler.unit / max(elapsed, 1e-9)
                entry = {
                    "iteration": it,
                    "train_loss": loss_val,
                    "iter_time": iter_time,
                    "elapsed": elapsed,
                    "expanded_rows_per_s": rows_s,
                }
                msg = (
                    f"Iteration {it} time: {iter_time:.4f}s, "
                    f"Train loss: {loss_val:.4f}, "
                    f"{rows_s:,.0f} expanded rows/s"
                )
                if eval_data is not None:
                    ev = self.evaluate(eval_data, user_consumed)
                    entry.update(
                        {
                            "eval_loss": ev.loss / max(ev.count, 1),
                            "precision": ev.precision / max(ev.count, 1),
                            "recall": ev.recall / max(ev.count, 1),
                            "ndcg": ev.ndcg / max(ev.count, 1),
                        }
                    )
                    msg += f"\n\tMetrics: {ev}"
                logger.info(msg)
                logs.append(entry)
            if (
                checkpoint_path
                and checkpoint_every > 0
                and it % checkpoint_every == 0
                and it < iterations
            ):
                step_resume.save_step_state(
                    checkpoint_path,
                    self._step_state(key),
                    {
                        "iteration": it,
                        "pos": pos,
                        "rng_before_perm": rng_before_perm,
                    },
                )
                logger.info(f"step checkpoint saved at iteration {it}")
        self._sync_mirrors()
        return logs

    # ------------------------------------------------------------------
    def _make_resident_run(self, windows_meta: tuple[int, int] | None):
        """Jitted chunk runner for ``train_resident``: ``lax.scan`` over K
        train steps with the dataset DEVICE-RESIDENT — each dispatch carries
        only scalars (global step, epoch position), so the per-step relay
        upload that dominates the host loop's wall time (28ms wall vs 2.6ms
        device at 10M items) disappears.  ``windows_meta`` = (t_lo, n_win)
        selects the on-device sliding-window gather (ResidentWindows);
        None = flat (tc_all, sc_all) row gathers."""
        import functools

        impl = self._step_impl
        b = self.num_targets_per_batch
        seq_len = self.seq_len

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run(carry_p, carry_o, dset, perm, sstate, base_key, gs0, pos0,
                steps):
            def body(carry, i):
                p, o = carry
                key = jax.random.fold_in(base_key, gs0 + i)
                idx = jax.lax.dynamic_slice(perm, ((pos0 + i) * b,), (b,))
                if windows_meta is not None:
                    t_lo, n_win = windows_meta
                    items = dset
                    u = idx // n_win
                    t = t_lo + idx % n_win
                    cols = t[:, None] + jnp.arange(-seq_len, 0)[None, :]
                    sc = items[u[:, None], cols]
                    tc = items[u, t]
                else:
                    tc_all, sc_all = dset
                    tc = tc_all[idx]
                    sc = sc_all[idx]
                p, o, loss = impl(p, o, key, tc, sc, sstate)
                return (p, o), loss

            (p, o), losses = jax.lax.scan(body, (carry_p, carry_o), steps)
            return p, o, losses

        return run

    def train_resident(
        self,
        data,  # ResidentWindows | (train_seqs [N, L], train_targets [N])
        iterations: int,
        chunk: int = 64,
        progress_interval: int = 1000,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 0,
    ) -> list[dict]:
        """Device-resident training driver: upload the dataset once, then
        drive the loop in ``chunk``-step ``lax.scan`` dispatches whose only
        per-call payload is scalars — losses drain through a FIFO window so
        the device runs chunk i+1 while the host reads chunk i.

        Equivalent training to :meth:`train` (same step math; the batch
        permutation and per-step PRNG keys come from counter-derived device
        streams — ``fold_in(key, global_step)`` / per-epoch device
        ``jax.random.permutation`` — instead of the host loop's split chain,
        so the two drivers match in distribution, not bit-for-bit;
        chunk-size choice IS bit-invariant, tests/test_resident.py).
        Single-chip; mesh training keeps the host loop (spmd.py handles its
        transfers).  Checkpoints (``checkpoint_every`` iterations, rounded
        to chunk boundaries) need only (params, opt state, global step):
        both streams are counter-derived, so resume is exact."""
        from dismember_tpu.train import step_resume

        if self.mesh is not None:
            raise ValueError("train_resident is single-chip; use train()")
        self._adopt_mirrors()
        b = self.num_targets_per_batch
        windows_meta = None
        if isinstance(data, ResidentWindows):
            n = len(data)
            windows_meta = (data.t_lo, data.n_win)
            dset = jnp.asarray(data.item_codes, jnp.int32)
        else:
            train_seqs, train_targets = data
            n = len(train_targets)
            dset = (
                jnp.asarray(
                    self.tree.ids_to_codes(train_targets), jnp.int32
                ),
                jnp.asarray(self.tree.ids_to_codes(train_seqs), jnp.int32),
            )
        steps_per_epoch = n // b
        if steps_per_epoch < 1:
            raise ValueError(f"dataset ({n} rows) smaller than one batch ({b})")
        key_attr = "_resident_run_win" if windows_meta else "_resident_run_flat"
        run = getattr(self, key_attr, None)
        if run is None:
            run = self._make_resident_run(windows_meta)
            setattr(self, key_attr, run)
        sstate = self.sampler.device_state()
        base_key = jax.random.PRNGKey(self.seed + 1)
        perm_key = jax.random.PRNGKey(self.seed + 3)
        perm_fn = jax.jit(
            lambda k: jax.random.permutation(k, steps_per_epoch * b)
        )

        if self._pmv:
            carry_p = {k: v for k, v in self.params.items() if k != "embedding"}
        else:
            carry_p = self.params
        carry_o = self.opt_state
        gs = 0
        if checkpoint_path:
            loaded = step_resume.load_step_state(
                checkpoint_path, {"params": carry_p, "opt_state": carry_o}
            )
            if loaded is not None:
                st, meta = loaded
                carry_p, carry_o = st["params"], st["opt_state"]
                gs = int(meta["global_step"])
                logger.info(
                    f"resumed resident checkpoint {checkpoint_path} at "
                    f"global step {gs}"
                )

        from collections import deque

        steps_cache: dict[int, jnp.ndarray] = {}
        fifo: deque = deque()
        logs: list[dict] = []
        cur_epoch, perm = -1, None
        next_ckpt = (
            (gs // checkpoint_every + 1) * checkpoint_every
            if checkpoint_every > 0 else None
        )
        next_log = (gs // progress_interval + 1) * progress_interval
        t0 = time.perf_counter()
        gs_start = gs

        def drain() -> None:
            nonlocal next_log
            g0, k, lo = fifo.popleft()
            lo = np.asarray(lo)
            if g0 + k >= next_log:
                elapsed = time.perf_counter() - t0
                rows_s = (g0 + k - gs_start) * b * self.sampler.unit / max(
                    elapsed, 1e-9
                )
                entry = {
                    "iteration": g0 + k,
                    "train_loss": float(lo[-1]),
                    "elapsed": elapsed,
                    "expanded_rows_per_s": rows_s,
                }
                logger.info(
                    f"Iteration {g0 + k} Train loss: {entry['train_loss']:.4f}, "
                    f"{rows_s:,.0f} expanded rows/s (resident)"
                )
                logs.append(entry)
                next_log = ((g0 + k) // progress_interval + 1) * progress_interval

        while gs < iterations:
            epoch = gs // steps_per_epoch
            if epoch != cur_epoch:
                perm = perm_fn(jax.random.fold_in(perm_key, epoch))
                cur_epoch = epoch
            pos0 = gs % steps_per_epoch
            k = min(chunk, steps_per_epoch - pos0, iterations - gs)
            if next_ckpt is not None:
                k = min(k, next_ckpt - gs)
            if k not in steps_cache:
                steps_cache[k] = jnp.arange(k, dtype=jnp.int32)
            carry_p, carry_o, losses = run(
                carry_p, carry_o, dset, perm, sstate, base_key,
                jnp.int32(gs), jnp.int32(pos0), steps_cache[k],
            )
            gs += k
            fifo.append((gs - k, k, losses))
            if len(fifo) >= 4:
                drain()
            if next_ckpt is not None and gs == next_ckpt:
                while fifo:
                    drain()
                if gs < iterations:
                    step_resume.save_step_state(
                        checkpoint_path,
                        {"params": carry_p, "opt_state": carry_o},
                        {"global_step": gs},
                    )
                    logger.info(f"resident checkpoint saved at step {gs}")
                next_ckpt += checkpoint_every
        while fifo:
            drain()
        self.opt_state = carry_o
        if self._pmv:
            self.params = dict(carry_p, embedding=self.params["embedding"])
            self._mirrors_stale = True
            self._record_mirror_id()
            self._sync_mirrors()
        else:
            self.params = carry_p
        return logs

    # -- step-level checkpoint state (train/step_resume.py) -------------
    def _step_state(self, key) -> dict:
        """Loop-state pytree for within-stage snapshots.  In pmv mode the
        packed p|m|v state inside opt_state owns the table, so the [V, E]
        embedding MIRROR is excluded (it re-materializes via _sync_mirrors;
        saving it would double the multi-GB snapshot)."""
        params = self.params
        if self._pmv:
            params = {k: v for k, v in params.items() if k != "embedding"}
        return {"params": params, "opt_state": self.opt_state, "key": key}

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
    def evaluate(
        self,
        eval_data: tuple[np.ndarray, np.ndarray, np.ndarray],
        user_consumed: dict[int, np.ndarray] | None = None,
        candidate_num: int | None = None,
    ) -> EvalResult:
        """Eval loss (same sampling path as training, target = first label,
        mirroring TDMEvalSample.target = labels.head) + full beam-search
        metrics per user (Evaluator.scala:14-74)."""
        self._sync_mirrors()
        eval_seqs, eval_labels, eval_users = eval_data
        seq_codes = self.tree.ids_to_codes(eval_seqs)
        targets = eval_labels[:, 0]
        target_codes = self.tree.ids_to_codes(targets)

        result = EvalResult()
        m = len(targets)
        ebsz = max(1, self.total_eval_batch_size // self.sampler.unit)
        key = jax.random.PRNGKey(self.seed + 2)
        for s in range(0, m, ebsz):
            e = min(s + ebsz, m)
            key, sub = jax.random.split(key)
            loss = self._eval_loss_step(
                self.params,
                sub,
                jnp.asarray(target_codes[s:e]),
                jnp.asarray(seq_codes[s:e]),
            )
            result.loss += float(loss) * (e - s)
            result.count += e - s

        # beam-search metrics; reference widens the beam for heavy users
        # ((consumed + topk)/2, Recommender.scala:29-33) — use the batch max.
        cn = candidate_num if candidate_num is not None else self.beam_size
        if user_consumed:
            max_consumed = max(
                (len(user_consumed.get(int(u), ())) for u in eval_users), default=0
            )
            cn = max((max_consumed + self.topk) // 2, cn)
        rec_lists = self.recommend_batch(
            eval_seqs, candidate_num=cn, consumed=[
                user_consumed.get(int(u), np.empty(0, np.int64))
                for u in eval_users
            ] if user_consumed else None,
        )
        rec_padded = np.full((len(rec_lists), self.topk), -1, dtype=np.int64)
        for i, rec in enumerate(rec_lists):
            rec_padded[i, : len(rec)] = rec
        p, r, nd = compute_metrics_batch(rec_padded, eval_labels)
        result.precision += float(p.sum())
        result.recall += float(r.sum())
        result.ndcg += float(nd.sum())
        return result

    def recommend_batch(
        self,
        seqs: np.ndarray,  # [B, L] raw item ids
        candidate_num: int | None = None,
        topk: int | None = None,
        consumed: list[np.ndarray] | None = None,
        batch_size: int = 4096,
    ) -> list[np.ndarray]:
        self._sync_mirrors()
        cn = candidate_num or self.beam_size
        k = topk or self.topk
        if self._beam_fn is None or self._beam_fn_width != cn:
            pre, app = serving_fns(self.model_type)
            self._beam_fn = make_beam_fn(
                self.forward, self.tree, cn, precompute=pre, apply=app
            )
            self._beam_fn_width = cn
        seq_codes = self.tree.ids_to_codes(seqs)
        out: list[np.ndarray] = []
        for s in range(0, len(seq_codes), batch_size):
            e = min(s + batch_size, len(seq_codes))
            ids, scores = self._beam_fn(self.params, jnp.asarray(seq_codes[s:e]))
            out.extend(
                filter_topk(
                    np.asarray(ids),
                    np.asarray(scores),
                    k,
                    consumed[s:e] if consumed is not None else None,
                )
            )
        return out

    def recommend(
        self,
        sequence: np.ndarray,
        topk: int | None = None,
        candidate_num: int | None = None,
        consumed: np.ndarray | None = None,
    ) -> np.ndarray:
        """Single-query recommend (TDM.recommend parity incl. the per-user
        candidate-num widening, Recommender.scala:29-33)."""
        k = topk or self.topk
        cn = candidate_num or self.beam_size
        if consumed is not None and len(consumed) > 0:
            cn = max((len(consumed) + k) // 2, cn)
        return self.recommend_batch(
            sequence[None, :],
            candidate_num=cn,
            topk=k,
            consumed=[consumed] if consumed is not None else None,
        )[0]

    # ------------------------------------------------------------------
    def export_embeddings(self, path: str) -> None:
        """Leaf-item embeddings CSV: ``id, e1, ..., ed`` keyed by item id,
        rows read from the shared embedding table at each item's leaf code
        (tdm/.../utils/Serialization.scala:15-58)."""
        self._sync_mirrors()
        table = np.asarray(self.params["embedding"])
        from dismember_tpu.core.io import open_file

        with open_file(path, "w", encoding="utf-8") as f:
            for iid, code in zip(self.tree.item_ids, self.tree.item_codes):
                vec = table[code]
                f.write(str(int(iid)))
                for v in vec:
                    f.write(f", {float(v):.12g}")
                f.write("\n")
