"""dismember-tpu: TPU-native tree/path-indexed retrieval framework.

A from-scratch JAX/XLA/Pallas implementation of the four structure-indexed
retrieval algorithms provided by the reference system (massquantity/dismember):

- TDM  (tree-based deep model, arXiv 1801.02294)
- JTM  (joint tree & model learning, arXiv 1902.07565)
- OTM  (optimal tree model with beam-search-aware targets, arXiv 2006.15408)
- DR   (Deep Retrieval path structures, arXiv 2007.07203)

Design: item catalogs are decomposed by an index structure (binary tree or
D-layer path structure) living in device arrays; scoring models are pure
functional JAX; serving is a single-jit batched beam search; training is
pjit/shard_map SPMD over a ('data', 'model') device mesh.
"""

__version__ = "0.1.0"

from dismember_tpu.constants import PADDING_ID, PADDING_IDX

__all__ = [
    "PADDING_ID",
    "PADDING_IDX",
    # Heavier modules are imported lazily; canonical entry points:
    #   dismember_tpu.index.arraytree.ArrayTree
    #   dismember_tpu.train.tdm.TDMTrainer
    #   dismember_tpu.train.otm.OTMTrainer
    #   dismember_tpu.train.dr.DRTrainer
    #   dismember_tpu.train.jtm.TreeLearner
    #   dismember_tpu.train.pipeline.run_tdm_alternation / run_dr_alternation
    #   dismember_tpu.serving.TDMServing / DRServing
]
