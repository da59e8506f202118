"""Serving facades: load persisted artifacts, score and recommend.

Parity with the reference's serving surface:
- TDMServing   <- tdm/.../model/TDM.scala:8-59 (``predict`` = sigmoid scores,
  ``recommend`` = beam search + consumed filter + top-k) and the Java API
  demo (examples/src/main/java/.../JavaRecommend.java) — load a saved model
  + tree and serve queries with no training machinery attached.
- OTMServing   <- otm/.../model/OTM.scala facade over CandidateSearcher.
- DRServing    <- deep-retrieval/.../model/DeepRetrieval.scala:15-107.
"""

from __future__ import annotations

import numpy as np

from dismember_tpu.core.checkpoint import load_meta, load_pytree


class TDMServing:
    def __init__(self, params, forward, tree, precompute=None, apply=None,
                 apply_emb=None, packed: bool | None = None,
                 packed_dtype: str | None = None, model_type: str | None = None,
                 topk: int = 10, candidate_num: int = 20):
        self.params = params
        self.forward = forward
        self.tree = tree
        self.precompute = precompute
        self.apply = apply
        self.apply_emb = apply_emb
        # packed pair-table beam (retrieval/packed_beam.py): ~4x serving
        # throughput at deep catalogs.  None = auto (on when the scorer
        # supports it and the tree is deep enough to matter); params are
        # frozen at serving time so the pair table is built once.
        self.packed = packed
        # pair-table lane dtype: "float32" | "bfloat16" | None = auto
        # (bf16 when the f32 table would exceed _BF16_TABLE_BYTES — halves
        # HBM at 10M-item catalogs; score-identical on TPU ONLY for
        # matmul-first scorers, where the MXU rounds operands to bf16
        # either way.  DeepFM's FM term is elementwise f32, so auto keeps
        # f32 for it; pass packed_dtype="bfloat16" to accept the rounding.)
        self.packed_dtype = packed_dtype
        # model name ("din"/"deepfm") when known: gates the bf16/contraction
        # exactness shortcuts above.  None (direct construction) is treated
        # as matmul-first, matching the din-based fns tests/benches pass in.
        self.model_type = model_type
        self.topk = topk
        self.candidate_num = candidate_num
        self._beam_fns: dict[int, object] = {}
        self._pair_table = None

    _BF16_TABLE_BYTES = 4 << 30  # auto-switch threshold for the f32 table

    @classmethod
    def load(cls, model_path: str, tree_path: str, **kwargs) -> "TDMServing":
        import jax

        from dismember_tpu.index.arraytree import ArrayTree
        from dismember_tpu.train.tdm import build_model, packed_fns, serving_fns

        tree = ArrayTree.from_file(tree_path)
        meta = load_meta(model_path)
        params_like, forward = build_model(
            meta["model"], tree.max_level, meta["embed_size"], meta["seq_len"],
            jax.random.PRNGKey(0),
        )
        params = load_pytree(model_path, params_like)
        pre, app = serving_fns(meta["model"])
        _, app_emb = packed_fns(meta["model"])
        kwargs.setdefault("model_type", meta["model"])
        return cls(params, forward, tree, precompute=pre, apply=app,
                   apply_emb=app_emb, **kwargs)

    # ------------------------------------------------------------------
    def predict(self, sequence: np.ndarray, items: np.ndarray) -> np.ndarray:
        """Sigmoid scores of candidate items given a sequence (TDM.predict)."""
        import jax.numpy as jnp

        seq_codes = self.tree.ids_to_codes(sequence[None, :])
        item_codes = self.tree.ids_to_codes(items)[None, :]
        logits = self.forward(
            self.params, jnp.asarray(item_codes), jnp.asarray(seq_codes)
        )
        return np.asarray(1.0 / (1.0 + np.exp(-np.asarray(logits[0]))))

    def _use_packed(self, cn: int) -> bool:
        if self.apply_emb is None or self.precompute is None:
            return False
        if self.packed is not None:
            return self.packed
        # auto: the packed loop wins across catalog sizes but needs at least
        # one level below the start level; small trees stay on the classic
        # loop to avoid building a pair table for toy catalogs
        from dismember_tpu.retrieval.tree_beam import make_config

        cfg = make_config(self.tree, cn)
        return self.tree.max_level >= 8 and cfg.max_level - cfg.start_level >= 1

    def _matmul_first(self) -> bool:
        """True when bf16 lanes / contraction einsums cannot change scores
        (see train.tdm.MATMUL_FIRST_SCORERS).  Unknown model_type (direct
        construction) keeps the historical matmul-first behavior."""
        from dismember_tpu.train.tdm import MATMUL_FIRST_SCORERS

        return self.model_type is None or self.model_type in MATMUL_FIRST_SCORERS

    def _beam_fn(self, cn: int):
        if cn not in self._beam_fns:
            if self._use_packed(cn):
                from dismember_tpu.retrieval.packed_beam import (
                    PackedTree,
                    build_pair_table,
                    make_hybrid_beam_fn,
                )
                from dismember_tpu.retrieval.tree_beam import make_config

                if self._pair_table is None:
                    import jax.numpy as jnp

                    if self.packed_dtype is not None:
                        dt = {"float32": jnp.float32,
                              "bfloat16": jnp.bfloat16}[self.packed_dtype]
                    else:
                        e = int(self.params["embedding"].shape[1])
                        n_pairs = (self.tree.total_codes - 1) // 2
                        rw = ((2 * e + 6 + 127) // 128) * 128
                        f32_bytes = n_pairs * rw * 4
                        dt = (jnp.bfloat16
                              if f32_bytes > self._BF16_TABLE_BYTES
                              and self._matmul_first()
                              else jnp.float32)
                    self._pair_table = build_pair_table(
                        self.params["embedding"], self.tree.node_exists,
                        self.tree.node_id, self.tree.total_codes, dtype=dt,
                    )
                packed = PackedTree(
                    pair_table=self._pair_table,
                    embed_size=int(self.params["embedding"].shape[1]),
                    cfg=make_config(self.tree, cn),
                )
                # hybrid = packed + contraction for the shallow levels;
                # exact parity for matmul-first scorers, 19.3 -> 12.4
                # ms/batch at 1M items.  Elementwise-f32 scorers (deepfm)
                # skip contraction: the einsum rounds operands to bf16 on
                # TPU, which their FM term would see.
                self._beam_fns[cn] = make_hybrid_beam_fn(
                    packed, self.precompute, self.apply_emb,
                    max_contract_rows=8192 if self._matmul_first() else 0,
                )
            else:
                from dismember_tpu.retrieval.tree_beam import make_beam_fn

                self._beam_fns[cn] = make_beam_fn(
                    self.forward, self.tree, cn,
                    precompute=self.precompute, apply=self.apply,
                )
        return self._beam_fns[cn]

    def recommend(
        self,
        sequence: np.ndarray,
        topk: int | None = None,
        candidate_num: int | None = None,
        consumed: np.ndarray | None = None,
    ) -> np.ndarray:
        k = topk or self.topk
        cn = candidate_num or self.candidate_num
        if consumed is not None and len(consumed) > 0:
            cn = max((len(consumed) + k) // 2, cn)
        return self.recommend_batch(
            sequence[None, :], topk=k, candidate_num=cn,
            consumed=[consumed] if consumed is not None else None,
        )[0]

    def recommend_batch(
        self,
        seqs: np.ndarray,
        topk: int | None = None,
        candidate_num: int | None = None,
        consumed: list[np.ndarray] | None = None,
    ) -> list[np.ndarray]:
        import jax.numpy as jnp

        from dismember_tpu.retrieval.tree_beam import filter_topk

        k = topk or self.topk
        cn = candidate_num or self.candidate_num
        fn = self._beam_fn(cn)
        seq_codes = self.tree.ids_to_codes(seqs)
        ids, scores = fn(self.params, jnp.asarray(seq_codes))
        return filter_topk(np.asarray(ids), np.asarray(scores), k, consumed)


class OTMServing:
    """OTM facade (otm/.../model/OTM.scala): load model + item<->leaf-code
    mapping, serve beam-search recommendations in raw item-id space."""

    def __init__(self, trainer):
        self._trainer = trainer

    @classmethod
    def load(
        cls, model_path: str, mapping_path: str, data_path: str,
        seq_len: int = 10, min_seq_len: int = 2, split_ratio: float = 0.8,
        label_num: int = 5, beam_size: int = 20, topk: int = 10,
    ) -> "OTMServing":
        from dismember_tpu.data.otm_dataset import build_otm_data, load_mapping
        from dismember_tpu.train.otm import OTMTrainer

        mapping = load_mapping(mapping_path)
        data = build_otm_data(
            data_path, seq_len, min_seq_len, split_ratio,
            label_num=label_num, mapping=mapping,
        )
        meta = load_meta(model_path)
        trainer = OTMTrainer(
            data, model_type=meta["model"], embed_size=meta["embed_size"],
            beam_size=beam_size, topk=topk, seq_len=meta["seq_len"],
        )
        trainer.params = load_pytree(model_path, trainer.params)
        return cls(trainer)

    def recommend(
        self, sequence_items: np.ndarray, topk: int | None = None,
        consumed_items: np.ndarray | None = None,
    ) -> np.ndarray:
        """sequence/result in raw item-id space (codes mapped internally)."""
        t = self._trainer
        seq_codes = np.asarray(
            [t.data.item_to_code.get(int(i), -1) for i in sequence_items],
            dtype=np.int64,
        )
        consumed_codes = None
        if consumed_items is not None:
            consumed_codes = [np.asarray(
                [t.data.item_to_code[int(i)] for i in consumed_items
                 if int(i) in t.data.item_to_code], dtype=np.int64,
            )]
        return t.recommend_batch(
            seq_codes[None, :], topk=topk, consumed=consumed_codes
        )[0]


class DRServing:
    def __init__(self, trainer):
        self._trainer = trainer
        self._p2i = trainer.path_index.path_to_items()
        self._device_fns: dict[tuple, object] = {}

    def device_serving_fn(self, topk: int = 10, beam: int | None = None):
        """Jitted on-device batch serving (retrieval.dr_serve); ~3000x the
        host path's throughput.  None when the dense path table is too big.
        Cached per (topk, beam)."""
        key = (topk, beam)
        if key not in self._device_fns:
            from dismember_tpu.retrieval.dr_serve import make_dr_serving_fn

            self._device_fns[key] = make_dr_serving_fn(
                self._trainer, beam=beam, topk=topk
            )
        return self._device_fns[key]

    def recommend_batch_device(self, seqs, topk: int = 10):
        import jax.numpy as jnp

        fn = self.device_serving_fn(topk=topk)
        if fn is None:
            return [
                self.recommend(s, topk=topk) for s in seqs
            ]
        ids, _scores = fn(
            self._trainer.layer_params,
            self._trainer.rerank_params,
            jnp.asarray(seqs, jnp.int32),
        )
        return np.asarray(ids)

    @classmethod
    def load(
        cls, model_path: str, mapping_path: str, data_path: str,
        seq_len: int = 10, min_seq_len: int = 2, split_ratio: float = 0.8,
        num_nodes: int = 100, **trainer_kwargs,
    ) -> "DRServing":
        from dismember_tpu.data.dr_dataset import build_dr_data
        from dismember_tpu.index.paths import PathIndex
        from dismember_tpu.train.dr import DRTrainer

        path_index, item_to_id = PathIndex.read(mapping_path, num_nodes)
        data = build_dr_data(data_path, seq_len, min_seq_len, split_ratio, item_to_id)
        meta = load_meta(model_path + ".layer")
        trainer = DRTrainer(
            data,
            num_layers=meta["num_layer"],
            num_nodes=meta["num_node"],
            num_paths_per_item=path_index.num_paths_per_item,
            embed_size=meta["embed_size"],
            seq_len=meta["seq_len"],
            path_index=path_index,
            **trainer_kwargs,
        )
        trainer.layer_params = load_pytree(model_path + ".layer", trainer.layer_params)
        trainer.rerank_params = load_pytree(
            model_path + ".rerank", trainer.rerank_params
        )
        return cls(trainer)

    def recommend(
        self, sequence: np.ndarray, topk: int = 10, beam_size: int | None = None,
        consumed: np.ndarray | None = None,
    ) -> np.ndarray:
        """sequence/result in dense item-id space (map via data.item_to_id)."""
        if beam_size is not None:
            self._trainer.beam = beam_size
        return self._trainer.recommend_batch(
            sequence[None, :], topk=topk,
            consumed=[consumed] if consumed is not None else None,
            path_to_items=self._p2i,
        )[0]
