"""Regression-tree fMLLR (parity: transform/regression-tree.{h,cc},
transform/regtree-fmllr-diag-gmm.{h,cc}).

A binary regression tree clusters the acoustic model's Gaussians by
mean; each LEAF is a base class. Per speaker, fMLLR stats are
accumulated per base class and transforms are estimated at the deepest
tree nodes whose pooled occupancy clears min_count — so a speaker with
lots of data gets several region-specific transforms and a speaker
with little data shares one global transform. At likelihood time each
Gaussian evaluates the features through ITS class's transform."""

from __future__ import annotations

from typing import BinaryIO, Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log
from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs


class RegressionTree:
    """Bisecting clustering of all (pdf, gauss) means; binary tree
    stored as parent pointers, leaves = base classes."""

    def __init__(self, num_baseclasses: int, parents: List[int],
                 gauss2bclass: Dict[Tuple[int, int], int],
                 leaves: List[int]):
        self.num_baseclasses = num_baseclasses
        self.parents = parents          # node -> parent (root: itself)
        self.gauss2bclass = gauss2bclass
        self.leaves = leaves            # node id per baseclass

    @classmethod
    def build(cls, am, num_baseclasses: int = 4,
              seed: int = 0) -> "RegressionTree":
        rng = np.random.default_rng(seed)
        keys: List[Tuple[int, int]] = []
        means = []
        for pdf in range(am.num_pdfs):
            g = am.get_pdf(pdf)
            m = g.get_means()
            for j in range(g.num_gauss):
                keys.append((pdf, j))
                means.append(m[j])
        means = np.asarray(means)
        # bisecting k-means down to num_baseclasses clusters, recording
        # the binary tree as we split
        clusters: List[np.ndarray] = [np.arange(len(keys))]
        node_of_cluster = [0]
        parents = [0]
        while len(clusters) < num_baseclasses:
            # split the biggest cluster
            i = int(np.argmax([len(c) for c in clusters]))
            idx = clusters[i]
            if len(idx) < 2:
                break
            x = means[idx]
            # 2-means with deterministic perturbed-centroid init
            c0 = x.mean(axis=0)
            d = x.std(axis=0) + 1e-3
            cents = np.stack([c0 - 0.5 * d, c0 + 0.5 * d])
            for _ in range(10):
                assign = np.argmin(
                    ((x[:, None, :] - cents[None]) ** 2).sum(-1), axis=1)
                for k in (0, 1):
                    if np.any(assign == k):
                        cents[k] = x[assign == k].mean(axis=0)
            if len(set(assign.tolist())) < 2:
                assign[rng.integers(len(assign))] ^= 1
            parent_node = node_of_cluster[i]
            left = len(parents)
            parents.append(parent_node)
            right = len(parents)
            parents.append(parent_node)
            clusters[i] = idx[assign == 0]
            node_of_cluster[i] = left
            clusters.append(idx[assign == 1])
            node_of_cluster.append(right)
        gauss2bclass = {}
        for b, idx in enumerate(clusters):
            for i in idx:
                gauss2bclass[keys[i]] = b
        log(f"regression tree: {len(clusters)} base classes over "
            f"{len(keys)} gaussians, {len(parents)} nodes")
        return cls(len(clusters), parents, gauss2bclass,
                   list(node_of_cluster))

    def ancestors(self, bclass: int) -> List[int]:
        """Node ids from the leaf up to the root."""
        node = self.leaves[bclass]
        out = [node]
        while self.parents[node] != node:
            node = self.parents[node]
            out.append(node)
        return out


class RegtreeFmllrAccs:
    """Per-baseclass fMLLR stats."""

    def __init__(self, tree: RegressionTree, dim: int):
        self.tree = tree
        self.accs = [FmllrDiagGmmAccs(dim)
                     for _ in range(tree.num_baseclasses)]

    def accumulate_from_alignment(self, am, tm, feats: np.ndarray,
                                  alignment: Sequence[int]) -> None:
        pdfs = tm.transition_ids_to_pdfs(alignment)
        feats = np.asarray(feats, np.float64)
        for pdf in np.unique(pdfs):
            g = am.get_pdf(int(pdf))
            sub = feats[pdfs == pdf]
            post = g.component_posteriors(sub.astype(np.float32))
            self._accumulate_pdf(int(pdf), g, sub, post)

    def accumulate_from_posterior(self, am, tm, feats: np.ndarray,
                                  post) -> None:
        """Soft-count accumulation from transition-id posteriors
        (gmm-est-regtree-fmllr.cc)."""
        feats = np.asarray(feats, np.float64)
        by_pdf: Dict[int, Tuple[list, list]] = {}
        for t, frame in enumerate(post):
            if t >= feats.shape[0]:
                break
            for tid, w in frame:
                if w == 0.0:
                    continue
                pdf = tm.transition_id_to_pdf(int(tid))
                rows, wts = by_pdf.setdefault(pdf, ([], []))
                rows.append(t)
                wts.append(float(w))
        for pdf, (rows, wts) in by_pdf.items():
            g = am.get_pdf(int(pdf))
            sub = feats[rows]
            gp = g.component_posteriors(sub.astype(np.float32)) \
                * np.asarray(wts)[:, None]
            self._accumulate_pdf(int(pdf), g, sub, gp)

    def _accumulate_pdf(self, pdf: int, g, sub: np.ndarray,
                        post: np.ndarray) -> None:
        # split the per-component posteriors by base class
        by_class: Dict[int, List[int]] = {}
        for j in range(g.num_gauss):
            by_class.setdefault(
                self.tree.gauss2bclass[(pdf, j)], []).append(j)
        for b, comps in by_class.items():
            p = np.zeros_like(post)
            p[:, comps] = post[:, comps]
            self.accs[b].accumulate_from_posteriors(g, sub, p)


class RegtreeFmllr:
    """Estimated transforms: one (D, D+1) matrix per base class."""

    def __init__(self, W: np.ndarray, bclass2xform: List[int]):
        self.W = W                      # (num_xforms, D, D+1)
        self.bclass2xform = bclass2xform

    def transform_for(self, bclass: int) -> np.ndarray:
        return self.W[self.bclass2xform[bclass]]

    def write(self, stream: BinaryIO, binary: bool = True) -> None:
        iof.write_token(stream, binary, "<RegtreeFmllr>")
        iof.write_int32(stream, binary, self.W.shape[0])
        iof.write_int_vector(stream, binary, self.bclass2xform)
        for k in range(self.W.shape[0]):
            iof.write_matrix(stream, binary, self.W[k].astype(np.float32))
        iof.write_token(stream, binary, "</RegtreeFmllr>")

    @classmethod
    def read(cls, stream: BinaryIO, binary: bool = True) -> "RegtreeFmllr":
        iof.expect_token(stream, binary, "<RegtreeFmllr>")
        n = iof.read_int32(stream, binary)
        b2x = iof.read_int_vector(stream, binary)
        W = np.stack([iof.read_matrix(stream, binary).astype(np.float64)
                      for _ in range(n)])
        iof.expect_token(stream, binary, "</RegtreeFmllr>")
        return cls(W, list(b2x))


def estimate_regtree_fmllr(accs: RegtreeFmllrAccs,
                           min_count: float = 200.0
                           ) -> Tuple[RegtreeFmllr, float]:
    """Walk the tree: each base class uses the deepest ancestor node
    whose pooled stats clear min_count; one transform is estimated per
    selected node (regtree-fmllr-diag-gmm.cc ComputeFmllrRegTree).
    Returns (transforms, total auxf improvement)."""
    tree = accs.tree
    D = accs.accs[0].dim
    # pool stats per node
    node_accs: Dict[int, FmllrDiagGmmAccs] = {}
    for b, a in enumerate(accs.accs):
        for node in tree.ancestors(b):
            na = node_accs.setdefault(node, FmllrDiagGmmAccs(D))
            na.beta += a.beta
            na.K += a.K
            na.G += a.G
    # choose per-baseclass node: deepest with count >= min_count
    chosen: Dict[int, int] = {}
    for b in range(tree.num_baseclasses):
        node = tree.ancestors(b)[-1]   # root fallback (share globally)
        for cand in tree.ancestors(b):
            if node_accs[cand].beta >= min_count:
                node = cand
                break
        chosen[b] = node
    # estimate one transform per distinct chosen node
    xform_of_node: Dict[int, int] = {}
    Ws: List[np.ndarray] = []
    tot_impr = 0.0
    for node in sorted(set(chosen.values())):
        W, impr = node_accs[node].update(min_count=min(
            min_count, max(node_accs[node].beta, 1.0)))
        xform_of_node[node] = len(Ws)
        Ws.append(W)
        tot_impr += impr * node_accs[node].beta
    b2x = [xform_of_node[chosen[b]] for b in range(tree.num_baseclasses)]
    return RegtreeFmllr(np.stack(Ws), b2x), tot_impr


def regtree_log_likes(am, tree: RegressionTree, xforms: RegtreeFmllr,
                      feats: np.ndarray) -> np.ndarray:
    """(T, num_pdfs) log-likelihoods with each Gaussian scored through
    its base class's transform, including that transform's
    log|det A| Jacobian term (regtree-fmllr-diag-gmm.cc
    ComputeLogDets; without it Gaussians under different transforms
    are weighted inconsistently)."""
    feats = np.asarray(feats, np.float64)
    T = feats.shape[0]
    ext = np.concatenate([feats, np.ones((T, 1))], axis=1)
    transformed = {k: ext @ xforms.W[k].T
                   for k in range(xforms.W.shape[0])}
    D = feats.shape[1]
    logdets = [float(np.linalg.slogdet(xforms.W[k][:, :D])[1])
               for k in range(xforms.W.shape[0])]
    out = np.full((T, am.num_pdfs), -np.inf)
    for pdf in range(am.num_pdfs):
        g = am.get_pdf(pdf)
        comp_ll = np.full((T, g.num_gauss), -np.inf)
        for j in range(g.num_gauss):
            b = tree.gauss2bclass[(pdf, j)]
            k = xforms.bclass2xform[b]
            x = transformed[k]
            cl = g.component_log_likes(x.astype(np.float32))
            comp_ll[:, j] = cl[:, j] + logdets[k]
        m = comp_ll.max(axis=1, keepdims=True)
        out[:, pdf] = (m + np.log(np.exp(comp_ll - m)
                                  .sum(axis=1, keepdims=True)))[:, 0]
    return out
