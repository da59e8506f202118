"""Vectorized hierarchical negative sampling on device.

Semantics parity with tdm/.../utils/NegativeSampler.scala:
- per target leaf, the positives are its ancestors at every level from
  ``start_sample_level`` to ``max_level`` (NegativeSampler.scala:76-114);
- per level, ``neg_counts[level]`` negatives are drawn *without replacement*
  from the existing nodes at that level, excluding the positive
  (``sampleFromUniformDistribution``:146-158), either uniformly or weighted by
  node occurrence probability (``sampleFromCategoricalDistribution``:116-144);
- the per-target output unit is ``[pos, negs...]`` per level, concatenated over
  levels, with labels 1/0 (``sample``:76-114).

TPU-first design: instead of the reference's per-thread rejection loops, each
level draws Gumbel-perturbed logits over the level's candidate table and takes
``lax.top_k`` — exact without-replacement sampling, fully batched, no dynamic
shapes.  The per-level candidate tables are device arrays built once per tree.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dismember_tpu.index.arraytree import ArrayTree

_NEG_INF = -1e30


def parse_layer_neg_counts(layer_neg_counts: str, max_level: int) -> list[int]:
    """Parse the ``layer_negative_counts`` config string.

    Mirrors MiniBatch.computeSampleUnit (tdm MiniBatch.scala:19-38): the
    string must cover all ``max_level + 1`` levels and each count must be
    strictly less than the level's capacity 2^level.
    """
    counts = [int(float(x)) for x in layer_neg_counts.split(",")]
    if len(counts) < max_level + 1:
        raise ValueError(
            f"not enough negative sample layers: need {max_level + 1}, got {len(counts)}"
        )
    for i, c in enumerate(counts[: max_level + 1]):
        if c >= 2**i:
            raise ValueError(
                f"num of negative samples must not exceed max numbers in layer {i}"
            )
    return counts[: max_level + 1]


@dataclasses.dataclass
class TreeSampler:
    """Per-tree sampling state: level candidate tables + static layout."""

    max_level: int
    start_level: int
    neg_counts: list[int]  # per level (index = level), only [start..max] used
    unit: int  # rows per target = sum(1 + neg) over levels
    level_tables: list[jnp.ndarray]  # per level: candidate codes [n_l]
    level_logits: list[jnp.ndarray]  # per level: base logits [n_l]
    # static per-unit-position labels (1 for positives)
    unit_labels: np.ndarray  # [unit] float32

    @classmethod
    def build(
        cls,
        tree: ArrayTree,
        layer_neg_counts: str,
        start_level: int = 1,
        with_prob: bool = False,
    ) -> "TreeSampler":
        if start_level < 1:
            raise ValueError(f"start sample level should be at least 1, got {start_level}")
        counts = parse_layer_neg_counts(layer_neg_counts, tree.max_level)
        level_tables = []
        level_logits = []
        labels: list[float] = []
        unit = 0
        for level in range(start_level, tree.max_level + 1):
            codes = tree.level_codes[level]
            level_tables.append(jnp.asarray(codes, dtype=jnp.int32))
            if with_prob:
                probs = tree.node_prob[codes].astype(np.float64)
                logits = np.log(np.maximum(probs, 1e-30))
            else:
                logits = np.zeros(len(codes), dtype=np.float64)
            level_logits.append(jnp.asarray(logits, dtype=jnp.float32))
            unit += 1 + counts[level]
            labels.extend([1.0] + [0.0] * counts[level])
        return cls(
            max_level=tree.max_level,
            start_level=start_level,
            neg_counts=counts,
            unit=unit,
            level_tables=level_tables,
            level_logits=level_logits,
            unit_labels=np.asarray(labels, dtype=np.float32),
        )

    def sample(
        self, key: jax.Array, target_codes: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Draw the per-level positives + negatives for a batch of targets.

        target_codes: [B] bottom-level leaf codes.
        Returns (codes [B, U], labels [B, U], weights [B, U]); weights are 0
        for padded/unfillable rows (level candidate pool too small).
        """
        b = target_codes.shape[0]
        parts_codes: list[jnp.ndarray] = []
        parts_weights: list[jnp.ndarray] = []
        keys = jax.random.split(key, len(self.level_tables))
        for i, level in enumerate(range(self.start_level, self.max_level + 1)):
            table = self.level_tables[i]
            base = self.level_logits[i]
            neg = self.neg_counts[level]
            # ancestor of the bottom-level code at `level`
            shift = self.max_level - level
            pos = ((target_codes + 1) >> shift) - 1  # [B]
            parts_codes.append(pos[:, None])
            parts_weights.append(jnp.ones((b, 1), jnp.float32))
            if neg == 0:
                continue
            g = -jnp.log(
                -jnp.log(
                    jax.random.uniform(
                        keys[i], (b, table.shape[0]), minval=1e-20, maxval=1.0
                    )
                )
            )
            logits = base[None, :] + g
            logits = jnp.where(table[None, :] == pos[:, None], _NEG_INF, logits)
            picked_logits, idx = jax.lax.top_k(logits, neg)
            codes = table[idx]  # [B, neg]
            ok = picked_logits > _NEG_INF / 2
            parts_codes.append(jnp.where(ok, codes, -1))
            parts_weights.append(ok.astype(jnp.float32))
        codes = jnp.concatenate(parts_codes, axis=1)
        weights = jnp.concatenate(parts_weights, axis=1)
        labels = jnp.broadcast_to(jnp.asarray(self.unit_labels), (b, self.unit))
        return codes, labels, weights
