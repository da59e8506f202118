"""Alternating train → index → retrain driver with stage checkpoint/resume.

The reference's alternation protocol is human-driven: re-run the CLIs with
``initialize_mapping=false`` etc. (doc/OTM.md:22, doc/Deep-Retrieval.md:22 in
the reference), persisting each stage's full output (model blob, tree pb,
mapping).  Here the loop is one program; after every stage a checkpoint
records (stage tag, round, params, optimizer state, index artifact paths,
RNG seed) so a killed run resumes at the stage boundary — the failure-
recovery capability the reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time


from dismember_tpu.core.checkpoint import load_pytree, save_pytree
from dismember_tpu.core.io import exists as path_exists, open_file

logger = logging.getLogger("dismember_tpu.pipeline")


@dataclasses.dataclass
class StageState:
    """Persisted progress marker."""

    round: int  # completed alternation rounds
    stage: str  # last completed stage
    artifacts: dict  # stage -> artifact path

    def save(self, path: str) -> None:
        with open_file(path, "w", encoding="utf-8") as f:
            json.dump(dataclasses.asdict(self), f)

    @classmethod
    def load(cls, path: str) -> "StageState | None":
        if not path_exists(path):
            return None
        with open_file(path, "r", encoding="utf-8") as f:
            return cls(**json.load(f))


def run_tdm_alternation(
    workdir: str,
    samples,  # TDMSamples
    initial_tree_path: str,
    rounds: int = 2,
    iterations_per_round: int = 2000,
    cluster_type: str = "kmeans",
    cluster_iter: int = 10,
    trainer_kwargs: dict | None = None,
    eval_every_round: bool = True,
):
    """TDM loop: train scorer -> export embeddings -> re-cluster tree ->
    retrain.  Returns (final trainer, per-round eval results)."""
    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.cluster import cluster_tree_from_embeddings
    from dismember_tpu.train.tdm import TDMTrainer

    if "://" not in workdir:
        os.makedirs(workdir, exist_ok=True)
    state_path = os.path.join(workdir, "pipeline_state.json")
    state = StageState.load(state_path) or StageState(
        round=0, stage="init", artifacts={"tree": initial_tree_path}
    )
    results = []
    trainer = None
    kwargs = dict(trainer_kwargs or {})

    eval_data = (samples.eval_seqs, samples.eval_labels, samples.eval_users)
    while state.round < rounds:
        rnd = state.round + 1
        tree = ArrayTree.from_file(state.artifacts["tree"])
        trainer = TDMTrainer(tree=tree, **kwargs)
        model_ckpt = os.path.join(workdir, f"model_round{rnd}")
        if state.stage == "trained" and path_exists(model_ckpt + ".npz"):
            trainer.params = load_pytree(model_ckpt, trainer.params)
        else:
            t0 = time.perf_counter()
            trainer.train(
                samples.train_seqs,
                samples.train_targets,
                iterations=iterations_per_round,
                progress_interval=max(1, iterations_per_round // 4),
            )
            logger.info(f"round {rnd} train: {time.perf_counter() - t0:.1f}s")
            save_pytree(model_ckpt, trainer.params, meta={"round": rnd})
            state.stage = "trained"
            state.artifacts[f"model_round{rnd}"] = model_ckpt
            state.save(state_path)

        if eval_every_round and len(samples.eval_users):
            ev = trainer.evaluate(eval_data, samples.user_consumed)
            logger.info(f"round {rnd} eval: {ev}")
            results.append(ev)

        if rnd < rounds:
            # index stage: export embeddings, re-cluster
            embed_path = os.path.join(workdir, f"embed_round{rnd}.csv")
            new_tree = os.path.join(workdir, f"tree_round{rnd + 1}.bin")
            trainer.export_embeddings(embed_path)
            t0 = time.perf_counter()
            cluster_tree_from_embeddings(
                embed_path, new_tree, cluster_iter, cluster_type
            )
            logger.info(f"round {rnd} cluster: {time.perf_counter() - t0:.1f}s")
            state.artifacts["tree"] = new_tree
        state.round = rnd
        state.stage = "indexed"
        state.save(state_path)
    return trainer, results


def run_dr_alternation(
    workdir: str,
    data,  # DRData
    rounds: int = 2,
    epochs_per_round: int = 2,
    cd_kwargs: dict | None = None,
    trainer_kwargs: dict | None = None,
):
    """Deep Retrieval EM loop: E-step training -> M-step coordinate descent.

    Returns (trainer, per-round eval results)."""
    from dismember_tpu.index.paths import PathIndex
    from dismember_tpu.train.dr import DRTrainer
    from dismember_tpu.train.dr_coordinate import coordinate_descent

    if "://" not in workdir:
        os.makedirs(workdir, exist_ok=True)
    state_path = os.path.join(workdir, "dr_pipeline_state.json")
    state = StageState.load(state_path) or StageState(
        round=0, stage="init", artifacts={}
    )
    kwargs = dict(trainer_kwargs or {})
    trainer = DRTrainer(data, **kwargs)
    mapping_path = state.artifacts.get("mapping")
    if mapping_path and path_exists(mapping_path):
        trainer.path_index, _ = PathIndex.read(mapping_path, trainer.num_nodes)
    layer_ckpt = state.artifacts.get("layer_params")
    if layer_ckpt and path_exists(layer_ckpt + ".npz"):
        trainer.layer_params = load_pytree(layer_ckpt, trainer.layer_params)
        trainer.rerank_params = load_pytree(
            state.artifacts["rerank_params"], trainer.rerank_params
        )

    results = []
    while state.round < rounds:
        rnd = state.round + 1
        res = trainer.train(num_epochs=epochs_per_round)
        results.extend(res)
        layer_ckpt = os.path.join(workdir, f"dr_layer_round{rnd}")
        rerank_ckpt = os.path.join(workdir, f"dr_rerank_round{rnd}")
        save_pytree(layer_ckpt, trainer.layer_params, meta={"round": rnd})
        save_pytree(rerank_ckpt, trainer.rerank_params)
        state.artifacts.update(
            layer_params=layer_ckpt, rerank_params=rerank_ckpt
        )
        state.stage = "trained"
        state.save(state_path)

        if rnd < rounds:
            trainer.path_index = coordinate_descent(
                trainer, data.train_seqs, data.train_targets, **(cd_kwargs or {})
            )
            mapping_path = os.path.join(workdir, f"dr_mapping_round{rnd + 1}.bin")
            trainer.path_index.write(mapping_path, data.item_to_id)
            state.artifacts["mapping"] = mapping_path
        state.round = rnd
        state.stage = "indexed"
        state.save(state_path)
    return trainer, results
