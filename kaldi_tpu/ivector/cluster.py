"""Agglomerative clustering for diarization (parity:
ivector/agglomerative-clustering.h + agglomerative-cluster binary):
bottom-up merging of per-segment embeddings by pairwise score until a
threshold or target cluster count."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def agglomerative_cluster(scores: np.ndarray,
                          threshold: Optional[float] = None,
                          num_clusters: Optional[int] = None) -> np.ndarray:
    """scores: (N, N) pairwise similarity (e.g. PLDA LLR). Merges the
    highest-scoring pair (average linkage) until the best remaining
    score < threshold or the target count is reached. Returns (N,)
    cluster ids (0-based, contiguous)."""
    N = scores.shape[0]
    if threshold is None and num_clusters is None:
        num_clusters = 1
    active = {i: [i] for i in range(N)}
    sim = {}
    for i in range(N):
        for j in range(i + 1, N):
            sim[(i, j)] = scores[i, j]

    def pair_score(a: List[int], b: List[int]) -> float:
        return float(np.mean([scores[i, j] for i in a for j in b]))

    next_id = N
    while len(active) > 1:
        if num_clusters is not None and len(active) <= num_clusters:
            break
        keys = sorted(active)
        best, bi, bj = -np.inf, None, None
        for x in range(len(keys)):
            for y in range(x + 1, len(keys)):
                s = pair_score(active[keys[x]], active[keys[y]])
                if s > best:
                    best, bi, bj = s, keys[x], keys[y]
        # threshold stop (only binding when no hard cluster-count target)
        if num_clusters is None and threshold is not None \
                and best < threshold:
            break
        merged = active[bi] + active[bj]
        del active[bi], active[bj]
        active[next_id] = merged
        next_id += 1
    out = np.zeros(N, np.int32)
    for cid, members in enumerate(sorted(active.values(),
                                         key=lambda m: min(m))):
        for i in members:
            out[i] = cid
    return out


def cluster_embeddings(embeddings: np.ndarray, plda=None,
                       threshold: float = 0.0,
                       num_clusters: Optional[int] = None) -> np.ndarray:
    """Diarization front door: pairwise PLDA (or cosine) scores +
    agglomerative clustering."""
    N = embeddings.shape[0]
    scores = np.zeros((N, N))
    if plda is not None:
        trans = [plda.transform_ivector(e) for e in embeddings]
        for i in range(N):
            for j in range(N):
                if i != j:
                    scores[i, j] = plda.log_likelihood_ratio(
                        trans[i], 1, trans[j])
    else:
        norm = embeddings / (np.linalg.norm(embeddings, axis=1,
                                            keepdims=True) + 1e-9)
        scores = norm @ norm.T
    return agglomerative_cluster(scores, threshold=threshold,
                                 num_clusters=num_clusters)
