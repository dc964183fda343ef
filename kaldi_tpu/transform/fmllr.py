"""fMLLR (CMLLR) estimation (parity: transform/fmllr-diag-gmm.h
FmllrDiagGmmAccs + the row-wise update with cofactors).

Affine transform W = [A; b] (D × D+1) maximizing the GMM likelihood of
transformed features; stats are K (D × D+1) and per-row quadratic
G_i (D+1 × D+1)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof


def apply_affine_transform(feats: np.ndarray, W: np.ndarray) -> np.ndarray:
    """feats (T, D), W (D, D+1) -> (T, D)."""
    feats = np.asarray(feats, np.float32)
    A = W[:, :-1].astype(np.float32)
    b = W[:, -1].astype(np.float32)
    return feats @ A.T + b


class FmllrDiagGmmAccs:
    def __init__(self, dim: int):
        self.beta = 0.0
        self.K = np.zeros((dim, dim + 1))
        self.G = np.zeros((dim, dim + 1, dim + 1))

    @property
    def dim(self):
        return self.K.shape[0]

    def accumulate_from_posteriors(self, gmm, data: np.ndarray,
                                   posteriors: np.ndarray) -> None:
        data = np.asarray(data, np.float64)
        post = np.asarray(posteriors, np.float64)
        T, D = data.shape
        ext = np.concatenate([data, np.ones((T, 1))], axis=1)  # (T, D+1)
        means = gmm.get_means()
        inv_vars = gmm.inv_vars.astype(np.float64)
        for m in range(means.shape[0]):
            w = post[:, m]
            tot = w.sum()
            if tot < 1e-9:
                continue
            self.beta += tot
            wx = ext * w[:, None]
            # K_i += invvar[m,i] * mu[m,i] * sum_t w x_ext
            s1 = wx.sum(axis=0)            # (D+1,)
            self.K += (inv_vars[m] * means[m])[:, None] * s1[None, :]
            S = wx.T @ ext                 # (D+1, D+1)
            self.G += inv_vars[m][:, None, None] * S[None, :, :]

    def accumulate_from_alignment(self, am, tm, data: np.ndarray,
                                  alignment) -> None:
        """Viterbi-style accumulation using 1-best state posteriors."""
        pdfs = tm.transition_ids_to_pdfs(alignment)
        for pdf in np.unique(pdfs):
            idx = np.nonzero(pdfs == pdf)[0]
            g = am.get_pdf(int(pdf))
            sub = data[idx]
            post = g.component_posteriors(sub.astype(np.float32))
            self.accumulate_from_posteriors(g, sub, post)

    def accumulate_from_posterior(self, am, tm, data: np.ndarray,
                                  post) -> None:
        """Soft-count accumulation from transition-id posteriors
        (fmllr-diag-gmm.cc AccumulateFromPosteriors path of
        gmm-est-fmllr.cc): each (tid, w) entry contributes the pdf's
        Gaussian posteriors scaled by w."""
        by_pdf: dict = {}
        for t, frame in enumerate(post):
            if t >= data.shape[0]:
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
            sub = data[rows]
            gp = g.component_posteriors(sub.astype(np.float32))
            self.accumulate_from_posteriors(
                g, sub, gp * np.asarray(wts)[:, None])

    def accumulate_from_gauss_post(self, am, data: np.ndarray,
                                   gpost) -> None:
        """Accumulation from Gaussian-level posteriors
        (gmm-est-fmllr-gpost.cc): entries carry (pdf-id,
        per-Gaussian weight vector)."""
        by_pdf: dict = {}
        for t, frame in enumerate(gpost):
            if t >= data.shape[0]:
                break
            for pdf, vec in frame:
                rows, vecs = by_pdf.setdefault(int(pdf), ([], []))
                rows.append(t)
                vecs.append(np.asarray(vec, np.float64))
        for pdf, (rows, vecs) in by_pdf.items():
            g = am.get_pdf(int(pdf))
            self.accumulate_from_posteriors(g, data[rows],
                                            np.stack(vecs))

    def update(self, num_iters: int = 20, min_count: float = 500.0
               ) -> Tuple[np.ndarray, float]:
        """Row-wise iterative update; returns (W (D, D+1), objf impr/frame)."""
        D = self.dim
        W = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
        if self.beta < min_count:
            return W, 0.0

        def objf(Wm):
            A = Wm[:, :D]
            sign, logdet = np.linalg.slogdet(A)
            if sign <= 0:
                return -np.inf
            q = sum(Wm[i] @ self.G[i] @ Wm[i] for i in range(D))
            return self.beta * logdet + np.sum(Wm * self.K) - 0.5 * q

        start = objf(W) / self.beta
        for _ in range(num_iters):
            for i in range(D):
                A = W[:, :D]
                inv = np.linalg.inv(A.T)
                cof = np.zeros(D + 1)
                cof[:D] = inv[i]  # cofactor row direction
                Gi_inv = np.linalg.inv(self.G[i]
                                       + 1e-6 * np.eye(D + 1))
                k = self.K[i]
                p = Gi_inv @ cof
                q = Gi_inv @ k
                a = p @ self.G[i] @ p
                b = p @ self.G[i] @ q - p @ k
                c = -self.beta
                # solve a s^2 + b s + c = 0 for step s along p
                disc = b * b - 4 * a * c
                if disc < 0 or abs(a) < 1e-12:
                    continue
                s1 = (-b + np.sqrt(disc)) / (2 * a)
                s2 = (-b - np.sqrt(disc)) / (2 * a)
                cand = []
                for s in (s1, s2):
                    row = q + s * p
                    Wtry = W.copy()
                    Wtry[i] = row
                    val = objf(Wtry)
                    cand.append((val, row))
                val, row = max(cand, key=lambda t: t[0])
                if np.isfinite(val):
                    W[i] = row
        impr = (objf(W) - start * self.beta) / self.beta
        return W, float(impr)


def estimate_fmllr(am, tm, feats: np.ndarray, alignment,
                   min_count: float = 100.0) -> np.ndarray:
    accs = FmllrDiagGmmAccs(feats.shape[1])
    accs.accumulate_from_alignment(am, tm, feats, alignment)
    W, _ = accs.update(min_count=min_count)
    return W
