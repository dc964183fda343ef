"""fMLLR on RAW (pre-splice, pre-LDA) features, with the model living
in the LDA+MLLT-transformed space.

Spec: transform/fmllr-raw.{h,cc} (FmllrRawAccs) — estimate the d x
(d+1) transform F applied to each raw frame BEFORE splicing and the
full (non-reduced) LDA+MLLT matrix, maximizing the likelihood of the
transformed data under the model, with the rejected LDA rows modeled
as unit-variance zero-mean Gaussians (fmllr-raw.h:36-66).  The
auxiliary is an exact quadratic in vec(F) plus splice_width * count *
logdet(F_square); the update iterates the standard row-wise fMLLR
cofactor solution.

Vectorized structure (instead of the reference's per-frame commit
loop): one einsum per utterance builds the (model x spliced-data)
moment tensors, and the reference's sparse N_ijk tensor (ComputeM,
fmllr-raw.cc:412) is assembled as one dense (full+1, d*(d+1), full+1)
array indexed analytically."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError, log, warn

M_LOG_2PI = 1.8378770664093454836


@dataclass
class FmllrRawOptions:
    min_count: float = 100.0
    num_iters: int = 20


def fmllr_inner_update(inv_G: np.ndarray, k: np.ndarray, beta: float,
                       row: int, W: np.ndarray) -> None:
    """One row of the fMLLR update (fmllr-diag-gmm.cc:193
    FmllrInnerUpdate): maximize w G w /(-2) + w k + beta log|det| over
    row `row` of W in place."""
    dim = W.shape[0]
    cof = np.zeros(dim + 1)
    cof[:dim] = np.linalg.inv(W[:, :dim].T)[row]
    cig = inv_G @ cof
    e1 = cig @ cof
    e2 = cig @ k
    discr = math.sqrt(e2 * e2 + 4 * e1 * beta)
    best = None
    for alpha in ((-e2 + discr) / (2 * e1), (-e2 - discr) / (2 * e1)):
        auxf = beta * math.log(abs(alpha * e1 + e2)) \
            - 0.5 * alpha * alpha * e1
        if best is None or auxf > best[0]:
            best = (auxf, alpha)
    W[row] = inv_G @ (best[1] * cof + k)


class FmllrRawAccs:
    """Accumulator for raw-space fMLLR.  full_transform: the FULL
    (square, or square plus offset column) LDA+MLLT matrix including
    rejected rows (get-full-lda-mat)."""

    def __init__(self, raw_dim: int, model_dim: int,
                 full_transform: np.ndarray):
        full_transform = np.asarray(full_transform, np.float64)
        full_dim = full_transform.shape[0]
        if full_transform.shape[1] not in (full_dim, full_dim + 1):
            raise KaldiTpuError(
                "full LDA+MLLT transform must be square or d x (d+1) "
                "(include the rejected rows, see get-full-lda-mat)")
        if raw_dim <= 0 or full_dim % raw_dim != 0:
            raise KaldiTpuError(f"raw dim {raw_dim} must divide the "
                                f"full feature dim {full_dim}")
        self.raw_dim = raw_dim
        self.model_dim = model_dim
        self.full_dim = full_dim
        self.T = full_transform[:, :full_dim]
        self.offset = (full_transform[:, full_dim]
                       if full_transform.shape[1] == full_dim + 1
                       else np.zeros(full_dim))
        m = model_dim
        # moment tensors over committed frames:
        #   Q[i]  = sum_t a_ext_i(t) * s_ext(t)      (m+1, full+1)
        #   S[i]  = sum_t b_ext_i(t) * s_ext s_ext^T (m+1, full+1, full+1)
        self.Q = np.zeros((m + 1, full_dim + 1))
        self.S = np.zeros((m + 1, full_dim + 1, full_dim + 1))
        self.count = 0.0

    @property
    def splice_width(self) -> int:
        return self.full_dim // self.raw_dim

    def _transformed(self, data: np.ndarray) -> np.ndarray:
        return data @ self.T.T + self.offset

    def accumulate_for_gmm(self, gmm, data: np.ndarray,
                           weight: float = 1.0) -> float:
        """data: (full_dim,) SPLICED raw features.  Computes Gaussian
        posteriors under the transformed data and accumulates; returns
        the weighted log-like (including the rejected dimensions'
        unit-Gaussian term, fmllr-raw.cc:135)."""
        z = self._transformed(np.asarray(data, np.float64))
        proj = z[:self.model_dim]
        ll = float(gmm.log_likelihood(proj)[0]) * weight
        post = gmm.component_posteriors(proj)[0]
        self.accumulate_from_posteriors(gmm, data, weight * post)
        rej = z[self.model_dim:]
        if rej.size:
            ll += -0.5 * (rej @ rej + rej.size * M_LOG_2PI)
        return ll

    def accumulate_from_posteriors(self, gmm, data: np.ndarray,
                                   posterior: np.ndarray) -> None:
        data = np.asarray(data, np.float64)
        post = np.asarray(posterior, np.float64)
        c = float(post.sum())
        if c == 0.0:
            return
        a = post @ np.asarray(gmm.means_invvars, np.float64)
        b = post @ np.asarray(gmm.inv_vars, np.float64)
        a -= b * self.offset[:self.model_dim]
        self._commit(np.concatenate([a, [c]]),
                     np.concatenate([b, [c]]), data, c)

    def accumulate_batch(self, A: np.ndarray, B: np.ndarray,
                         counts: np.ndarray, data: np.ndarray) -> None:
        """Whole-utterance accumulation: A/B (T, model_dim) per-frame
        sum of post*mean/var and post/var (offset NOT yet removed),
        counts (T,), data (T, full_dim) spliced raw frames."""
        T = data.shape[0]
        A = A - B * self.offset[None, :self.model_dim]
        a_ext = np.concatenate([A, counts[:, None]], axis=1)
        b_ext = np.concatenate([B, counts[:, None]], axis=1)
        s_ext = np.concatenate([data, np.ones((T, 1))], axis=1)
        self.Q += a_ext.T @ s_ext
        self.S += np.einsum("ti,tj,tk->ijk", b_ext, s_ext, s_ext,
                            optimize=True)
        self.count += float(counts.sum())

    def _commit(self, a_ext, b_ext, data, c):
        s_ext = np.concatenate([data, [1.0]])
        self.Q += np.outer(a_ext, s_ext)
        self.S += b_ext[:, None, None] * np.outer(s_ext, s_ext)
        self.count += c

    # -- update ---------------------------------------------------------

    def _m_tensor(self) -> np.ndarray:
        """M[l, (j1,j2), (k1,k2 | bias)] with
        y_l = vec(F) . M[l] . s_ext (ComputeM, fmllr-raw.cc:412):
        M[l][(j1,j2), (k1,k2)] = T[l, k1*d + j1] * delta(j2 == k2)
        and M[l][(j1, d), bias] = sum_c T[l, c*d + j1]."""
        d, C, full = self.raw_dim, self.splice_width, self.full_dim
        M = np.zeros((full + 1, d, d + 1, full + 1))
        Tm = self.T.reshape(full, C, d)       # T[l, k1, j1]
        for j2 in range(d):
            # k = k1*d + j2 column for param (j1, j2)
            M[:full, :, j2, :full].reshape(full, d, C, d)[
                :, :, :, j2] = np.transpose(Tm, (0, 2, 1))
        M[:full, :, d, full] = Tm.sum(axis=1)
        # row `full` of M is zero (the s_ext bias row enters via q/S)
        return M[:full].reshape(full, d * (d + 1), full + 1)

    def _simple_stats(self) -> Tuple[np.ndarray, np.ndarray]:
        """(linear (d*(d+1),), quadratic (d*(d+1), d*(d+1))) of the
        exact auxiliary in vec(F) (ConvertToSimpleStats)."""
        m, full = self.model_dim, self.full_dim
        M = self._m_tensor()
        # per-full-dim stats: model rows use their own stats; rejected
        # rows use the count row (unit variance) with mean
        # -offset (fmllr-raw.cc:473-483)
        q = np.zeros((full, full + 1))
        q[:m] = self.Q[:m]
        q[m:] = -self.offset[m:, None] * self.Q[m][None, :]
        S_all = np.zeros((full, full + 1, full + 1))
        S_all[:m] = self.S[:m]
        S_all[m:] = self.S[m][None]
        linear = np.einsum("ijk,ik->j", M, q, optimize=True)
        quad = np.einsum("ijk,ikl,iml->jm", M, S_all, M, optimize=True)
        return linear, quad

    def auxf(self, linear, quad, F: np.ndarray) -> float:
        v = F.reshape(-1)
        sign, logdet = np.linalg.slogdet(F[:, :self.raw_dim])
        if sign <= 0:
            return -np.inf
        return float(v @ linear - 0.5 * v @ quad @ v
                     + logdet * self.splice_width * self.count)

    def update(self, opts: Optional[FmllrRawOptions] = None,
               F0: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, float, float]:
        """Returns (F (d, d+1), objf improvement, count)."""
        if opts is None:
            opts = FmllrRawOptions()
        d = self.raw_dim
        F = np.concatenate([np.eye(d), np.zeros((d, 1))], axis=1) \
            if F0 is None else np.asarray(F0, np.float64).copy()
        if self.count < opts.min_count:
            warn(f"not updating raw fMLLR: count {self.count} < "
                 f"min-count {opts.min_count}")
            return F, 0.0, self.count
        linear, quad = self._simple_stats()
        rd1 = d + 1
        lin_rows = linear.reshape(d, rd1)
        # per-row quadratic blocks; G_i = diag block of `quad`
        inv_G = []
        try:
            for i in range(d):
                blk = quad[i * rd1:(i + 1) * rd1, i * rd1:(i + 1) * rd1]
                inv_G.append(np.linalg.inv(blk))
        except np.linalg.LinAlgError:
            warn("raw fMLLR stats not invertible; not updating")
            return F, 0.0, self.count
        beta = self.count * self.splice_width
        auxf0 = self.auxf(linear, quad, F)
        for _ in range(opts.num_iters):
            for i in range(d):
                k = lin_rows[i].copy()
                for j in range(d):
                    if j != i:
                        k -= quad[i * rd1:(i + 1) * rd1,
                                  j * rd1:(j + 1) * rd1] @ F[j]
                fmllr_inner_update(inv_G[i], k, beta, i, F)
        impr = self.auxf(linear, quad, F) - auxf0
        log(f"raw fMLLR: objf impr/frame {impr / self.count:.4f} over "
            f"{self.count:.1f} frames")
        if impr < 0:
            return (np.concatenate([np.eye(d), np.zeros((d, 1))], axis=1)
                    if F0 is None else F0), 0.0, self.count
        return F, float(impr), self.count


def apply_raw_fmllr(raw_feats: np.ndarray, F: np.ndarray) -> np.ndarray:
    """Apply F (d, d+1) to raw (unspliced) frames (T, d)."""
    return raw_feats @ F[:, :-1].T + F[:, -1]
