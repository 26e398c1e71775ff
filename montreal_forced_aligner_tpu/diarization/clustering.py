"""Clustering for speaker diarization (numpy implementations).

Behavioral spec: reference ``diarization/multiprocessing.py:245-465``
(``cluster_matrix``: agglomerative/kmeans/spectral... over cosine or PLDA
distances). sklearn/hdbscan are not baked into this image; average-link
agglomerative clustering and k-means are implemented directly — both are
small host-side computations next to i-vector extraction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def cosine_distance_matrix(x: np.ndarray) -> np.ndarray:
    n = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-10)
    return 1.0 - n @ n.T


def agglomerative_cluster(
    distances: np.ndarray,
    num_clusters: Optional[int] = None,
    threshold: Optional[float] = None,
) -> np.ndarray:
    """Average-linkage agglomerative clustering on a distance matrix.

    Stops at ``num_clusters`` clusters, or when the closest pair exceeds
    ``threshold`` (one of the two must be given).
    """
    if num_clusters is None and threshold is None:
        raise ValueError("need num_clusters or threshold")
    N = distances.shape[0]
    D = distances.astype(np.float64).copy()
    np.fill_diagonal(D, np.inf)
    active = list(range(N))
    members = {i: [i] for i in range(N)}
    while len(active) > (num_clusters or 1):
        sub = D[np.ix_(active, active)]
        flat = np.argmin(sub)
        i_loc, j_loc = divmod(flat, len(active))
        if i_loc == j_loc:
            break
        d_min = sub[i_loc, j_loc]
        if threshold is not None and d_min > threshold:
            break
        a, b = active[i_loc], active[j_loc]
        # average-link update into a
        na, nb = len(members[a]), len(members[b])
        for k in active:
            if k in (a, b):
                continue
            D[a, k] = D[k, a] = (na * D[a, k] + nb * D[b, k]) / (na + nb)
        members[a].extend(members[b])
        del members[b]
        active.remove(b)
        D[b, :] = np.inf
        D[:, b] = np.inf
    labels = np.zeros(N, dtype=np.int32)
    for ci, (root, mem) in enumerate(sorted(members.items())):
        for m in mem:
            labels[m] = ci
    return labels


def kmeans_cluster(
    x: np.ndarray, k: int, num_iters: int = 50, seed: int = 0
) -> np.ndarray:
    rng = np.random.RandomState(seed)
    N = len(x)
    # k-means++ init
    centers = [x[rng.randint(N)]]
    for _ in range(1, k):
        d2 = np.min(
            [np.sum((x - c) ** 2, axis=1) for c in centers], axis=0
        )
        probs = d2 / max(d2.sum(), 1e-10)
        centers.append(x[rng.choice(N, p=probs)])
    C = np.stack(centers)
    labels = np.zeros(N, np.int32)
    for _ in range(num_iters):
        d = ((x[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        new_labels = d.argmin(axis=1).astype(np.int32)
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
        for c in range(k):
            sel = labels == c
            if sel.any():
                C[c] = x[sel].mean(axis=0)
    return labels
