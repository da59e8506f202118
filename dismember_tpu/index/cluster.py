"""Tree construction from learned embeddings: batched recursive clustering.

Semantics parity with tdm/.../cluster/RecursiveCluster.scala:16-211 and
tdm/src/main/java/com/mass/clustering/SpectralClustering.java:14-71:
- recursive 2-way split of the item set; children codes 2c+1 / 2c+2;
- a split runs k-means(k=2) (or spectral embedding + k-means) on the subset,
  takes centroid 0, sorts items by squared distance to it, and cuts at the
  midpoint (``balanceTree``: argPartition at n/2) so the tree stays balanced;
- 2-item sets assign directly (left/right in index order); singletons keep the
  parent's child code; leaf codes are later sunk to the bottom level by the
  tree builder;
- spectral: affinity exp(-||x-y||^2 / (2 sigma^2)), normalized Laplacian
  D^-1/2 W D^-1/2, top-k eigenvectors, row-unitized, k-means in the projected
  space (distances to centroid 0 measured there).

TPU-first design (SURVEY.md §2.8 P6): instead of the reference's ForkJoin
recursion, splitting is *level-synchronous*: every cluster at the current
depth is padded to a common width and split by one vmapped 2-means — tree
construction stays on-device as a sequence of O(log N) batched kernels.
ARPACK's ``syev`` top-k EVD becomes ``jnp.linalg.eigh``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dismember_tpu.core.io import open_file

from dismember_tpu.index.tree_io import write_tree


@functools.partial(jax.jit, static_argnames=("iters",))
def _two_means_batch(x: jnp.ndarray, mask: jnp.ndarray, iters: int):
    """Batched k-means with k=2.

    x [S, m, E] (padded), mask [S, m] validity.  Returns centroid0 [S, E].
    Init: centroid0 = first valid point, centroid1 = farthest valid point
    from it (deterministic k-means++-style seeding).
    """
    big = jnp.float32(1e30)
    inv_mask = ~mask

    first_idx = jnp.argmax(mask, axis=1)  # [S]
    c0 = jnp.take_along_axis(x, first_idx[:, None, None], axis=1)[:, 0]  # [S, E]
    d0 = jnp.sum((x - c0[:, None, :]) ** 2, axis=-1)
    d0 = jnp.where(inv_mask, -big, d0)
    far_idx = jnp.argmax(d0, axis=1)
    c1 = jnp.take_along_axis(x, far_idx[:, None, None], axis=1)[:, 0]

    def body(_, carry):
        c0, c1 = carry
        d0 = jnp.sum((x - c0[:, None, :]) ** 2, axis=-1)
        d1 = jnp.sum((x - c1[:, None, :]) ** 2, axis=-1)
        assign0 = (d0 <= d1) & mask  # [S, m]
        assign1 = (~(d0 <= d1)) & mask
        w0 = assign0.astype(x.dtype)
        w1 = assign1.astype(x.dtype)
        n0 = jnp.sum(w0, axis=1, keepdims=True)
        n1 = jnp.sum(w1, axis=1, keepdims=True)
        new_c0 = jnp.einsum("sm,sme->se", w0, x) / jnp.maximum(n0, 1.0)
        new_c1 = jnp.einsum("sm,sme->se", w1, x) / jnp.maximum(n1, 1.0)
        # keep old centroid when a cluster empties
        new_c0 = jnp.where(n0 > 0, new_c0, c0)
        new_c1 = jnp.where(n1 > 0, new_c1, c1)
        return new_c0, new_c1

    c0, c1 = jax.lax.fori_loop(0, iters, body, (c0, c1))
    return c0


@functools.partial(jax.jit, static_argnames=("iters",))
def _distance_rank_batch(x: jnp.ndarray, mask: jnp.ndarray, iters: int):
    """Run 2-means and return, per cluster, item positions sorted by squared
    distance to centroid 0 (valid items first).  [S, m] int32."""
    c0 = _two_means_batch(x, mask, iters)
    d = jnp.sum((x - c0[:, None, :]) ** 2, axis=-1)
    d = jnp.where(mask, d, jnp.float32(1e30))
    return jnp.argsort(d, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def _spectral_project_batch(x: jnp.ndarray, sigma: float = 1.0, k: int = 2):
    """Batched spectral embedding: x [S, m, E] (equal-size clusters).

    Mirrors SpectralClustering.fit/fitMatrix per cluster: Gaussian affinity
    (zero diagonal), symmetric normalization, top-k eigenvectors of the
    normalized affinity (largest algebraic), rows unitized.  Batched eigh —
    one dispatch for all clusters of a size class instead of one per cluster.
    """
    sq = jnp.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, axis=-1)
    w = jnp.exp(-0.5 / (sigma * sigma) * sq)
    eye = jnp.eye(x.shape[1], dtype=bool)[None]
    w = jnp.where(eye, 0.0, w)  # the reference leaves W[i,i] = 0
    d = jnp.sum(w, axis=2)
    dinv = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-12))
    m = w * dinv[:, :, None] * dinv[:, None, :]
    _, vecs = jnp.linalg.eigh(m)  # ascending
    proj = vecs[:, :, -k:]  # [S, m, k]
    norms = jnp.linalg.norm(proj, axis=2, keepdims=True)
    return proj / jnp.maximum(norms, 1e-12)


def _spectral_features(
    feats: list[np.ndarray], sigma: float = 1.0, k: int = 2
) -> list[np.ndarray]:
    """Project every cluster, batching by exact size (at a given tree depth
    cluster sizes differ by at most 1, so this is <= 2 eigh dispatches)."""
    by_size: dict[int, list[int]] = {}
    for i, f in enumerate(feats):
        by_size.setdefault(len(f), []).append(i)
    out: list[np.ndarray | None] = [None] * len(feats)
    # eigh runs on the CPU backend: LAPACK syevd is fast and shape-agnostic,
    # while TPU eigh pays a slow compile per (batch, m) shape — the reference
    # also ran its EVD on CPU (ARPACK via JNI)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    for size, idxs in by_size.items():
        x = np.stack([feats[i] for i in idxs])
        # pad the batch dim to a power of two (repeat rows) so jit shapes
        # recur across levels instead of recompiling for every cluster count
        s = len(idxs)
        s_pad = 1 << (s - 1).bit_length()
        if s_pad != s:
            x = np.concatenate([x, np.repeat(x[:1], s_pad - s, axis=0)])
        if cpu is not None:
            with jax.default_device(cpu):
                proj = np.asarray(_spectral_project_batch(jnp.asarray(x), k=k))
        else:
            proj = np.asarray(_spectral_project_batch(jnp.asarray(x), k=k))
        for j, i in enumerate(idxs):
            out[i] = proj[j]
    return out  # type: ignore[return-value]


@functools.partial(jax.jit, static_argnames=("iters", "n_seg"))
def _flat_two_means_rank(x: jnp.ndarray, seg: jnp.ndarray, iters: int, n_seg: int):
    """Segment-based 2-means over ALL clusters of a level at once.

    x [N, E] points, seg [N] cluster id per point (any values < n_seg).
    Returns squared distance of each point to its cluster's centroid 0 —
    the ranking key for the balanced midpoint split.

    Shape-stable across tree levels (only the *values* of ``seg`` change), so
    the whole recursive construction reuses ONE compiled program — the
    per-level (num_clusters, width) recompiles of the padded formulation cost
    ~30s each through a remote compiler, dominating construction time.
    """
    n, e = x.shape
    arange = jnp.arange(n, dtype=jnp.int32)

    # deterministic k-means++-style init per segment:
    # c0 = first point of the segment, c1 = farthest point from c0
    first_idx = jax.ops.segment_min(arange, seg, num_segments=n_seg)
    c0 = x[jnp.clip(first_idx, 0, n - 1)[seg]]
    d0 = jnp.sum((x - c0) ** 2, axis=1)
    seg_max_d = jax.ops.segment_max(d0, seg, num_segments=n_seg)
    is_far = d0 >= seg_max_d[seg] - 1e-12
    far_idx = jax.ops.segment_min(
        jnp.where(is_far, arange, n), seg, num_segments=n_seg
    )
    c1 = x[jnp.clip(far_idx, 0, n - 1)[seg]]

    def body(_, carry):
        c0, c1 = carry  # per-point centroid views [N, E]
        d0 = jnp.sum((x - c0) ** 2, axis=1)
        d1 = jnp.sum((x - c1) ** 2, axis=1)
        assign = (d1 < d0).astype(jnp.int32)  # 1 -> cluster 1
        key2 = seg * 2 + assign
        sums = jax.ops.segment_sum(x, key2, num_segments=2 * n_seg)
        counts = jax.ops.segment_sum(
            jnp.ones((n, 1), x.dtype), key2, num_segments=2 * n_seg
        )
        cent = sums / jnp.maximum(counts, 1.0)
        ok = counts > 0
        new_c0 = jnp.where(ok[seg * 2], cent[seg * 2], c0)
        new_c1 = jnp.where(ok[seg * 2 + 1], cent[seg * 2 + 1], c1)
        return new_c0, new_c1

    c0, c1 = jax.lax.fori_loop(0, iters, body, (c0, c1))
    return jnp.sum((x - c0) ** 2, axis=1)


@functools.partial(jax.jit, static_argnames=("iters",))
def _sorted_two_means_rank(
    x: jnp.ndarray,  # [N, E] points, contiguous by segment
    start: jnp.ndarray,  # [N] int32: index of the point's segment start
    end: jnp.ndarray,  # [N] int32: index one past the segment end
    iters: int,
):
    """Scatter-free segment 2-means for segment-sorted points.

    Segment reductions become exclusive-cumsum differences (cs[end]-cs[start])
    plus row gathers — no segment_sum scatters, which are the TPU bottleneck
    of the unsorted formulation.  All shapes fixed at [N, E]/[N].
    Returns per-point squared distance to centroid 0 (the split-ranking key).
    """
    n, e = x.shape

    def seg_sum(values):  # [N, k] -> per-point segment sum [N, k]
        cs = jnp.concatenate(
            [jnp.zeros((1, values.shape[1]), values.dtype),
             jnp.cumsum(values, axis=0)], axis=0
        )
        return cs[end] - cs[start]

    # init: c0/c1 = first/last point of the segment.  Points enter each level
    # ordered by distance rank of the parent split, so the ends of a segment
    # are naturally spread apart — a scan-free stand-in for farthest-point
    # seeding.
    c0 = x[start]
    c1 = x[jnp.clip(end - 1, 0, n - 1)]

    def body(_, carry):
        c0, c1 = carry
        d0 = jnp.sum((x - c0) ** 2, axis=1)
        d1 = jnp.sum((x - c1) ** 2, axis=1)
        a1 = (d1 < d0).astype(x.dtype)[:, None]  # [N, 1]
        a0 = 1.0 - a1
        sum0 = seg_sum(x * a0)
        sum1 = seg_sum(x * a1)
        n0 = seg_sum(a0)
        n1 = seg_sum(a1)
        new_c0 = jnp.where(n0 > 0, sum0 / jnp.maximum(n0, 1.0), c0)
        new_c1 = jnp.where(n1 > 0, sum1 / jnp.maximum(n1, 1.0), c1)
        return new_c0, new_c1

    c0, c1 = jax.lax.fori_loop(0, iters, body, (c0, c1))
    return jnp.sum((x - c0) ** 2, axis=1)


def _tree_cluster_kmeans_flat(
    ids: np.ndarray, embeddings: np.ndarray, cluster_iter: int
) -> tuple[np.ndarray, np.ndarray]:
    """Level-synchronous balanced construction with the flat segment kernel."""
    n = len(ids)
    x = jnp.asarray(embeddings, jnp.float32)
    codes = np.zeros(n, dtype=np.int64)
    # active points: cluster code + position; level-synchronous arrays
    seg_code = np.zeros(n, dtype=np.int64)  # heap code of each point's cluster
    active = np.ones(n, dtype=bool)

    while active.any():
        act_idx = np.flatnonzero(active)
        sub_codes = seg_code[act_idx]
        # compact cluster ids 0..S-1 for the active set
        uniq, seg_act = np.unique(sub_codes, return_inverse=True)
        sizes = np.bincount(seg_act)

        # size-1 clusters keep their code; size-2 assign left/right directly
        # (vectorized: deep levels finalize ~N/2 clusters at once)
        small = sizes <= 2
        if small.any():
            order_s = np.argsort(seg_act, kind="stable")
            seg_sorted_s = seg_act[order_s]
            pts_sorted = act_idx[order_s]
            starts_s = np.searchsorted(seg_sorted_s, np.arange(len(uniq)))
            rank_s = np.arange(len(pts_sorted)) - starts_s[seg_sorted_s]
            size_of = sizes[seg_sorted_s]
            code_of = uniq[seg_sorted_s]
            one = size_of == 1
            two = size_of == 2
            codes[pts_sorted[one]] = code_of[one]
            codes[pts_sorted[two]] = 2 * code_of[two] + 1 + rank_s[two]
            active[pts_sorted[one | two]] = False

        big = sizes > 2
        if not big.any():
            break
        # permutation layout, shape-stable at [n] for every level: active big
        # clusters first (contiguous by segment), then every other point as a
        # singleton segment.  The device kernel sees fixed [n]/[n, E] shapes,
        # so the whole construction compiles once.
        n_big = int(big.sum())
        remap = np.full(len(uniq), -1, dtype=np.int64)
        remap[np.flatnonzero(big)] = np.arange(n_big)
        seg_of_point = np.full(n, -1, dtype=np.int64)
        seg_of_point[act_idx] = remap[seg_act]

        pts = np.flatnonzero(seg_of_point >= 0)
        seg2 = seg_of_point[pts]
        order0 = np.argsort(seg2, kind="stable")
        pts_sorted = pts[order0]
        seg_sorted0 = seg2[order0]
        sizes2 = np.bincount(seg2, minlength=n_big)
        seg_starts = np.concatenate([[0], np.cumsum(sizes2)])
        m = len(pts)
        parked = np.flatnonzero(seg_of_point < 0)
        perm = np.concatenate([pts_sorted, parked]).astype(np.int32)
        start_arr = np.empty(n, dtype=np.int32)
        end_arr = np.empty(n, dtype=np.int32)
        start_arr[:m] = seg_starts[seg_sorted0]
        end_arr[:m] = seg_starts[seg_sorted0 + 1]
        start_arr[m:] = np.arange(m, n)
        end_arr[m:] = np.arange(m + 1, n + 1)

        d0 = np.asarray(
            _sorted_two_means_rank(
                x[jnp.asarray(perm)],
                jnp.asarray(start_arr),
                jnp.asarray(end_arr),
                cluster_iter,
            )
        )[:m]

        # balanced midpoint split per segment, ranking by distance to c0
        big_codes = uniq[big]
        order1 = np.lexsort((d0, seg_sorted0))
        pts_final = pts_sorted[order1]
        seg_final = seg_sorted0[order1]
        rank = np.arange(m) - seg_starts[seg_final]
        left = rank < (sizes2[seg_final] // 2)
        child = np.where(
            left, 2 * big_codes[seg_final] + 1, 2 * big_codes[seg_final] + 2
        )
        seg_code[pts_final] = child

    return np.asarray(ids), codes


def tree_cluster(
    ids: np.ndarray,
    embeddings: np.ndarray,
    cluster_iter: int = 10,
    cluster_type: str = "kmeans",
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Assign tree codes to items by recursive balanced clustering.

    Returns (ids, codes) ready for :func:`write_tree`.
    """
    if cluster_type not in ("kmeans", "spectral"):
        raise ValueError("cluster_type must be one of ('kmeans', 'spectral')")
    n = len(ids)
    embeddings = np.asarray(embeddings, dtype=np.float32)
    codes = np.zeros(n, dtype=np.int64)

    # The host CPU backend wins at every scale measured so far: the flat
    # kernel's segment scatters are slow on TPU (round-2 item: sorted-segment
    # cumsum reduction), and the spectral path pays a TPU compile per shape.
    # 1M items x 16 dims cluster in ~22s on CPU vs ~12 min on the TPU paths.
    # Set DISMEMBER_CLUSTER_ON_DEVICE=1 to keep construction on the default
    # accelerator.
    import os

    device = None
    if not os.environ.get("DISMEMBER_CLUSTER_ON_DEVICE"):
        try:
            device = jax.devices("cpu")[0]
        except RuntimeError:
            device = None

    import contextlib

    ctx = jax.default_device(device) if device is not None else contextlib.nullcontext()
    with ctx:
        if cluster_type == "kmeans":
            # flat segment formulation: one compiled kernel for all levels
            return _tree_cluster_kmeans_flat(ids, embeddings, cluster_iter)
        return _tree_cluster_impl(ids, embeddings, cluster_iter, cluster_type, n, codes)


def _tree_cluster_impl(ids, embeddings, cluster_iter, cluster_type, n, codes):
    # clusters at the current level: (code, item positions)
    clusters: list[tuple[int, np.ndarray]] = [(0, np.arange(n))]

    while clusters:
        next_clusters: list[tuple[int, np.ndarray]] = []
        to_split: list[tuple[int, np.ndarray]] = []
        for code, idx in clusters:
            if len(idx) == 1:
                codes[idx[0]] = code
            elif len(idx) == 2:
                codes[idx[0]] = 2 * code + 1
                codes[idx[1]] = 2 * code + 2
            else:
                to_split.append((code, idx))
        if not to_split:
            break

        if cluster_type == "spectral":
            feats = _spectral_features([embeddings[idx] for _, idx in to_split])
        else:
            feats = [embeddings[idx] for _, idx in to_split]

        m = max(len(idx) for _, idx in to_split)
        e = feats[0].shape[1]
        s = len(to_split)
        x = np.zeros((s, m, e), dtype=np.float32)
        mask = np.zeros((s, m), dtype=bool)
        for i, f in enumerate(feats):
            x[i, : len(f)] = f
            mask[i, : len(f)] = True
        order = np.asarray(
            _distance_rank_batch(jnp.asarray(x), jnp.asarray(mask), cluster_iter)
        )
        for i, (code, idx) in enumerate(to_split):
            ranked = idx[order[i, : len(idx)]]
            mid = len(idx) // 2
            next_clusters.append((2 * code + 1, ranked[:mid]))
            next_clusters.append((2 * code + 2, ranked[mid:]))
        clusters = next_clusters

    return np.asarray(ids), codes


def cooccurrence_embeddings(
    train_seqs: np.ndarray,
    train_targets: np.ndarray,
    num_items: int,
    dim: int = 32,
    n_iters: int = 8,
    seed: int = 0,
) -> np.ndarray:
    """Item features from SESSION CO-OCCURRENCE instead of learned leaf
    embeddings — the cluster-input fix for the alternation at catalog scale.

    Round-3 diagnosis (scripts/diagnose_alternation.py, BASELINE.md): leaf
    embeddings trained for ~2 epochs carry almost no genre signal (purity
    0.017-0.028 vs the 0.747 ceiling), so k-means over them builds
    structured-but-WRONG trees that lower recall below the random tree.
    Co-occurrence is a model-free signal that exists in the data itself:
    items consumed in the same session share taste structure (the
    reference's category init, TdmInit.scala, is the labeled version of
    the same idea).

    Method: power-iterated random projection of the (target, seq-item)
    co-occurrence operator — f <- orthogonalize(C @ f) from a Gaussian
    start.  Eight subspace iterations (the settled default below)
    approximate the operator's top eigenspace
    (spectral clustering without materializing the [N, N] graph); k-means
    over f then groups items that co-occur, directly yielding
    genre-aligned splits on genre-structured data.  Cost: one edge-list
    sort + n_iters gather/reduceat passes over R*L edges — O(R*L*dim)
    host work, no [N, N] materialization.

    ``train_seqs`` [R, L] / ``train_targets`` [R] hold item POSITIONS in
    [0, num_items) (-1 = padding).  Returns [num_items, dim] float32,
    row-normalized; items never seen keep their random init (they land in
    arbitrary clusters, as the reference's random init does).

    Recipe settled by the 200k-item purity sweep (data/r4/cooc_sweep*.log;
    genre purity vs the 0.747 contiguity ceiling, embedding-based baseline
    0.017-0.028): deduped count-weighted edges + SYMMETRIC normalization
    (D^-1/2 W D^-1/2 — plain sums let Zipf-hot items dominate every
    feature: 0.158) + column ORTHOGONALIZATION each iteration (subspace
    iteration; row-normalizing instead collapses all dim directions onto
    the top eigenvector: 0.138) -> purity 0.193 at dim=32, n_iters=8.
    The features' NN-genre-consistency caps near 0.30 on this data — the
    residual gap to the ceiling is occurrence noise (Zipf-tail items have
    1-5 sessions), not the method.
    """
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((num_items, dim), dtype=np.float32)

    seqs = np.asarray(train_seqs, np.int64)
    tgt = np.asarray(train_targets, np.int64)
    valid = (seqs >= 0) & (tgt[:, None] >= 0)
    a = np.broadcast_to(tgt[:, None], seqs.shape)[valid]
    b = seqs[valid]
    # symmetric operator (both directions), deduped to weighted edges
    key = np.concatenate([b, a]) * num_items + np.concatenate([a, b])
    uk, counts = np.unique(key, return_counts=True)
    dst = (uk // num_items).astype(np.int64)
    src = (uk % num_items).astype(np.int64)
    w = counts.astype(np.float32)
    starts = np.concatenate([[0], np.flatnonzero(np.diff(dst)) + 1])
    segs = dst[starts]
    deg = np.zeros(num_items, np.float32)
    np.add.at(deg, dst, w)
    wn_flat = (w / (np.sqrt(deg[src]) * np.sqrt(deg[dst]) + 1e-12)).astype(
        np.float32
    )
    wn = wn_flat[:, None]
    touched = np.zeros(num_items, bool)
    touched[segs] = True
    from dismember_tpu.data.native import cooc_apply_native

    for _ in range(n_iters):
        g = np.zeros_like(f)
        # threaded native pass (r5: the numpy form — a [E, dim] product
        # materialization + scalar-loop reduceat — dominated the 1M cooc
        # stage at ~1300s; bit-identical fallback kept below)
        if not cooc_apply_native(starts, segs, src, wn_flat, f, g):
            g[segs] = np.add.reduceat(f[src] * wn, starts, axis=0)
        # column orthonormalization via the Gram matrix (symmetric /
        # Loewdin orthogonalization): two thin matmuls + a [dim, dim] eigh
        # instead of a tall QR (11.5s/iter at 1M x 32; this is ~1.5s).
        # Subspace iteration is basis-invariant and k-means + the final row
        # normalization are rotation-invariant, so swapping QR's Q for
        # Q @ O changes nothing downstream; near-null directions are
        # clamped (the rank-deficiency case reduced QR handled).
        g64 = g.astype(np.float64)
        lam, vec = np.linalg.eigh(g64.T @ g64)
        lam_max = max(float(lam[-1]), 1e-30)
        inv = 1.0 / np.sqrt(np.maximum(lam, 1e-12 * lam_max))
        g = (g64 @ ((vec * inv) @ vec.T) * np.sqrt(num_items)).astype(
            np.float32
        )
        f = np.where(touched[:, None], g, f)
    return f / (np.linalg.norm(f, axis=1, keepdims=True) + 1e-12)


def read_embeddings_csv(path: str, delimiter: str = ",") -> tuple[np.ndarray, np.ndarray]:
    """Read the ``id, e1, ..., ed`` embeddings CSV written by the trainer
    (RecursiveCluster.readFile parity)."""
    ids: list[int] = []
    vecs: list[list[float]] = []
    with open_file(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(delimiter)
            if len(parts) < 2:
                continue
            ids.append(int(parts[0].strip()))
            vecs.append([float(p) for p in parts[1:]])
    return np.asarray(ids, dtype=np.int64), np.asarray(vecs, dtype=np.float32)


def cluster_tree_from_embeddings(
    embed_path: str,
    output_tree_path: str,
    cluster_iter: int = 10,
    cluster_type: str = "kmeans",
) -> tuple[np.ndarray, np.ndarray]:
    """The ``tdm-cluster-tree`` stage: embeddings CSV -> re-clustered pb tree
    (examples/.../tdm/TDMClusterTree.scala flow)."""
    ids, embeds = read_embeddings_csv(embed_path)
    ids, codes = tree_cluster(ids, embeds, cluster_iter, cluster_type)
    write_tree(output_tree_path, ids, codes)
    return ids, codes
