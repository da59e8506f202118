"""Serving API demo: load persisted TDM artifacts and recommend.

The rebuild's counterpart of the reference's Java API demo
(examples/src/main/java/com/mass/retrieval/tdm/JavaRecommend.java): load a
saved model + tree, run a recommendation, and measure single-query latency.

Usage: python examples/recommend_demo.py <model_ckpt> <tree.bin>
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dismember_tpu.serving import TDMServing


def main(model_path: str, tree_path: str) -> None:
    serving = TDMServing.load(model_path, tree_path, topk=10, candidate_num=20)
    sequence = np.asarray(serving.tree.item_ids[:10])

    rec = serving.recommend(sequence, topk=10)
    print(f"Recommendation result: {rec.tolist()}")

    n = 100
    start = time.perf_counter()
    for _ in range(n):
        serving.recommend(sequence, topk=10)
    avg_ms = (time.perf_counter() - start) / n * 1e3
    print(f"Average recommend time: {avg_ms:.4f}ms")

    # batched serving is where the TPU shines
    batch = np.tile(sequence, (4096, 1))
    serving.recommend_batch(batch)  # warm up
    start = time.perf_counter()
    serving.recommend_batch(batch)
    qps = len(batch) / (time.perf_counter() - start)
    print(f"Batched throughput: {qps:,.0f} queries/s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
