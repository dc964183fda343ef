"""MLLT / global STC estimation (parity: transform/mllt.h MlltAccs).

Accumulates per-Gaussian posterior-weighted scatter of (x - mu) in the
current feature space; update() does the classic row-wise iterative
optimization of  Q(M) = beta log|det M| - 1/2 Σ_i m_iᵀ G_i m_i."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof


class MlltAccs:
    def __init__(self, dim: int):
        self.beta = 0.0
        self.G = np.zeros((dim, dim, dim))  # per-dim outer products

    @property
    def dim(self):
        return self.G.shape[0]

    def accumulate_from_posteriors(self, gmm, data: np.ndarray,
                                   posteriors: np.ndarray) -> None:
        """gmm: DiagGmm in the CURRENT feature space; data (T, D);
        posteriors (T, M)."""
        data = np.asarray(data, np.float64)
        post = np.asarray(posteriors, np.float64)
        means = gmm.get_means()          # (M, D)
        inv_vars = gmm.inv_vars.astype(np.float64)
        T, D = data.shape
        M = means.shape[0]
        # For each gaussian m: sum_t post[t,m] * outer(x_t - mu_m)
        # weighted by inv_var per dim i: G_i += w * invvar[m,i] * outer
        for m in range(M):
            w = post[:, m]
            if w.sum() < 1e-8:
                continue
            diff = data - means[m]
            S = (diff * w[:, None]).T @ diff  # (D, D)
            self.G += inv_vars[m][:, None, None] * S[None, :, :]
            self.beta += w.sum()

    def update(self, num_iters: int = 20
               ) -> Tuple[np.ndarray, float]:
        """Returns (M (D,D), objf improvement per frame)."""
        D = self.dim
        M = np.eye(D)
        if self.beta <= 0:
            return M, 0.0
        G = self.G / self.beta

        def objf(Mm):
            sign, logdet = np.linalg.slogdet(Mm)
            q = sum(Mm[i] @ G[i] @ Mm[i] for i in range(D))
            return logdet - 0.5 * q

        start = objf(M)
        for _ in range(num_iters):
            for i in range(D):
                inv = np.linalg.inv(M)
                cofactor = inv[:, i]  # ∝ row of cofactors
                Gi_inv = np.linalg.inv(G[i] + 1e-10 * np.eye(D))
                d = Gi_inv @ cofactor
                denom = cofactor @ d
                if denom <= 0:
                    continue
                M[i] = d * np.sqrt(1.0 / denom)
        impr = objf(M) - start
        return M, float(impr)

    def add(self, other: "MlltAccs") -> None:
        """Sum accumulators (sum-mllt-accs)."""
        self.beta += other.beta
        self.G += other.G

    def write(self, stream, binary: bool = True) -> None:
        iof.write_token(stream, binary, "<MLLTACCS>")
        iof.write_double(stream, binary, self.beta)
        for i in range(self.dim):
            iof.write_matrix(stream, binary, self.G[i])
        iof.write_token(stream, binary, "</MLLTACCS>")

    @classmethod
    def read(cls, stream, binary: bool = True) -> "MlltAccs":
        iof.expect_token(stream, binary, "<MLLTACCS>")
        beta = iof.read_double(stream, binary)
        first = iof.read_matrix(stream, binary)
        out = cls(first.shape[0])
        out.beta = beta
        out.G[0] = first
        for i in range(1, out.dim):
            out.G[i] = iof.read_matrix(stream, binary)
        iof.expect_token(stream, binary, "</MLLTACCS>")
        return out
