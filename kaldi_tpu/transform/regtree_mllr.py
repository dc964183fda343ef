"""Regression-tree MLLR — mean-only adaptation (parity:
transform/regtree-mllr-diag-gmm.{h,cc}).

MLLR transforms the GAUSSIAN MEANS, mu' = W [mu; 1], leaving
variances and features untouched; it has a closed-form row-wise
solution (no determinant term, unlike fMLLR).  Per base class b:
  K_b[i]  = sum_j invvar[j,i] * xbar[j,i] * xi_j         (D, D+1)
  G_b[i]  = sum_j invvar[j,i] * gamma_j * xi_j xi_j'     (D, D+1, D+1)
with xi_j = [mu_j, 1], gamma_j = sum_t post[t,j],
xbar[j] = sum_t post[t,j] x_t; then W[i] = solve(G[i], K[i])."""

from __future__ import annotations

from typing import BinaryIO, Dict, List, Sequence, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.transform.regtree_fmllr import RegressionTree


class RegtreeMllrAccs:
    """Per-baseclass MLLR mean-transform stats."""

    def __init__(self, tree: RegressionTree, dim: int):
        self.tree = tree
        self.dim = dim
        B = tree.num_baseclasses
        self.K = np.zeros((B, dim, dim + 1))
        self.G = np.zeros((B, dim, dim + 1, dim + 1))
        self.beta = np.zeros(B)

    def _accumulate_pdf(self, pdf: int, g, sub: np.ndarray,
                        post: np.ndarray) -> None:
        means = g.get_means().astype(np.float64)          # (M, D)
        inv_vars = g.inv_vars.astype(np.float64)          # (M, D)
        gamma = post.sum(axis=0)                          # (M,)
        xbar = post.T @ sub                               # (M, D)
        M = means.shape[0]
        xi = np.concatenate([means, np.ones((M, 1))], axis=1)
        for j in range(M):
            if gamma[j] <= 0:
                continue
            b = self.tree.gauss2bclass[(pdf, j)]
            self.K[b] += inv_vars[j][:, None] \
                * xbar[j][:, None] * xi[j][None, :]
            outer = np.outer(xi[j], xi[j])
            self.G[b] += inv_vars[j][:, None, None] * gamma[j] \
                * outer[None, :, :]
            self.beta[b] += gamma[j]

    def accumulate_from_posterior(self, am, tm, feats: np.ndarray,
                                  post) -> None:
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

    def accumulate_from_alignment(self, am, tm, feats: np.ndarray,
                                  alignment: Sequence[int]) -> None:
        pdfs = tm.transition_ids_to_pdfs(alignment)
        feats = np.asarray(feats, np.float64)
        for pdf in np.unique(pdfs):
            g = am.get_pdf(int(pdf))
            sub = feats[pdfs == pdf]
            post = g.component_posteriors(sub.astype(np.float32))
            self._accumulate_pdf(int(pdf), g, sub, post)


class RegtreeMllr:
    """Estimated mean transforms: one (D, D+1) matrix per xform."""

    def __init__(self, W: np.ndarray, bclass2xform: List[int]):
        self.W = W
        self.bclass2xform = bclass2xform

    def transform_for(self, bclass: int) -> np.ndarray:
        return self.W[self.bclass2xform[bclass]]

    def write(self, stream: BinaryIO, binary: bool = True) -> None:
        iof.write_token(stream, binary, "<RegtreeMllr>")
        iof.write_int32(stream, binary, self.W.shape[0])
        iof.write_int_vector(stream, binary, self.bclass2xform)
        for k in range(self.W.shape[0]):
            iof.write_matrix(stream, binary,
                             self.W[k].astype(np.float32))
        iof.write_token(stream, binary, "</RegtreeMllr>")

    @classmethod
    def read(cls, stream: BinaryIO, binary: bool = True
             ) -> "RegtreeMllr":
        iof.expect_token(stream, binary, "<RegtreeMllr>")
        n = iof.read_int32(stream, binary)
        b2x = iof.read_int_vector(stream, binary)
        W = np.stack([iof.read_matrix(stream, binary).astype(np.float64)
                      for _ in range(n)])
        iof.expect_token(stream, binary, "</RegtreeMllr>")
        return cls(W, list(b2x))


def estimate_regtree_mllr(accs: RegtreeMllrAccs,
                          min_count: float = 200.0) -> RegtreeMllr:
    """Deepest-sufficient-node transform selection like the fMLLR
    variant, but with the closed-form row solve."""
    tree = accs.tree
    D = accs.dim
    node_K: Dict[int, np.ndarray] = {}
    node_G: Dict[int, np.ndarray] = {}
    node_beta: Dict[int, float] = {}
    for b in range(tree.num_baseclasses):
        for node in tree.ancestors(b):
            node_K[node] = node_K.get(node, 0.0) + accs.K[b]
            node_G[node] = node_G.get(node, 0.0) + accs.G[b]
            node_beta[node] = node_beta.get(node, 0.0) \
                + float(accs.beta[b])
    chosen: Dict[int, int] = {}
    for b in range(tree.num_baseclasses):
        node = tree.ancestors(b)[-1]
        for cand in tree.ancestors(b):
            if node_beta[cand] >= min_count:
                node = cand
                break
        chosen[b] = node
    xform_of_node: Dict[int, int] = {}
    Ws: List[np.ndarray] = []
    eye = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
    for node in sorted(set(chosen.values())):
        if node_beta[node] <= 0:
            W = eye
        else:
            K, G = node_K[node], node_G[node]
            W = np.stack([
                np.linalg.solve(G[i] + 1e-6 * np.eye(D + 1), K[i])
                for i in range(D)])
        xform_of_node[node] = len(Ws)
        Ws.append(W)
    b2x = [xform_of_node[chosen[b]]
           for b in range(tree.num_baseclasses)]
    return RegtreeMllr(np.stack(Ws), b2x)


def regtree_mllr_log_likes(am, tree: RegressionTree,
                           xforms: RegtreeMllr,
                           feats: np.ndarray) -> np.ndarray:
    """(T, num_pdfs) log-likelihoods with each Gaussian's MEAN mapped
    through its class transform (regtree-mllr-diag-gmm.cc
    GetTransformedMeans)."""
    feats = np.asarray(feats, np.float64)
    T = feats.shape[0]
    out = np.full((T, am.num_pdfs), -np.inf)
    for pdf in range(am.num_pdfs):
        g = am.get_pdf(pdf)
        means = g.get_means().astype(np.float64)
        inv_vars = g.inv_vars.astype(np.float64)
        M, D = means.shape
        xi = np.concatenate([means, np.ones((M, 1))], axis=1)
        new_means = np.stack([
            xforms.transform_for(tree.gauss2bclass[(pdf, j)]) @ xi[j]
            for j in range(M)])
        # diag-gaussian loglikes at the adapted means
        gconst = (-0.5 * (D * np.log(2 * np.pi)
                          - np.log(inv_vars).sum(axis=1)
                          + (new_means ** 2 * inv_vars).sum(axis=1)))
        comp = (feats @ (new_means * inv_vars).T
                - 0.5 * (feats ** 2) @ inv_vars.T
                + gconst[None, :]
                + np.log(np.maximum(g.weights, 1e-30))[None, :])
        m = comp.max(axis=1, keepdims=True)
        out[:, pdf] = (m + np.log(np.exp(comp - m)
                                  .sum(axis=1, keepdims=True)))[:, 0]
    return out
