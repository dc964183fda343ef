"""i-vector extraction (parity: ivector/ivector-extractor.h:136
IvectorExtractor, :314 OnlineIvectorEstimationStats, :481 training
stats).

Model: per-UBM-Gaussian total-variability projections M_i (D × R);
an utterance's i-vector posterior given zeroth/first-order stats
(γ_i, x_i) is

  precision L = I(+prior) + Σ_i γ_i  M_iᵀ Σ_i⁻¹ M_i
  linear    b = prior_offset·e₀ + Σ_i M_iᵀ Σ_i⁻¹ x_i
  E[w] = L⁻¹ b

Σ_i is diagonal when the UBM is a DiagGmm and FULL when it is a
FullGmm (the reference's fgmm-global UBM configuration). The batched
E-step is einsums over (utterances × gaussians × dims) — MXU-friendly;
this replaces the reference's per-utterance CPU/CUDA loops (cudafeat
batched i-vectors).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log
from kaldi_tpu.gmm.diag_gmm import DiagGmm


@dataclass
class IvectorExtractorOptions:
    ivector_dim: int = field(default=100, metadata={"doc": "Dimension of iVector"})
    num_iters: int = 10
    prior_offset: float = 100.0


class IvectorExtractor:
    def __init__(self, ubm, ivector_dim: int,
                 prior_offset: float = 100.0, seed: int = 0):
        self.ubm = ubm
        G, D = ubm.num_gauss, ubm.dim
        self.R = ivector_dim
        self.prior_offset = prior_offset
        rng = np.random.default_rng(seed)
        # M[g]: (D, R); column 0 initialised to the UBM mean so that
        # ivector[0] ≈ prior_offset reproduces the UBM (the reference's
        # convention)
        self.M = rng.normal(scale=0.1, size=(G, D, ivector_dim))
        self.M[:, :, 0] = ubm.get_means() / prior_offset
        if hasattr(ubm, "inv_covars"):      # full-covariance UBM
            self.sigma_inv = ubm.inv_covars.astype(np.float64).copy()
        else:
            self.sigma_inv = ubm.inv_vars.astype(np.float64).copy()

    @property
    def full_cov(self) -> bool:
        return self.sigma_inv.ndim == 3

    def _ms(self) -> np.ndarray:
        """MS[g] = Sigma_g^{-1} M_g : (G, D, R), for either diagonal or
        full covariances."""
        if self.full_cov:
            return np.einsum("gde,ger->gdr", self.sigma_inv, self.M)
        return self.M * self.sigma_inv[:, :, None]

    @property
    def num_gauss(self):
        return self.M.shape[0]

    @property
    def dim(self):
        return self.M.shape[1]

    # -- stats -----------------------------------------------------------------

    def acc_utt_stats(self, feats: np.ndarray,
                      posteriors: Optional[np.ndarray] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Zeroth/first-order stats (γ (G,), x (G, D)) against the UBM."""
        feats = np.asarray(feats, np.float64)
        if posteriors is None:
            posteriors = self.ubm.component_posteriors(
                feats.astype(np.float32)).astype(np.float64)
        gamma = posteriors.sum(axis=0)
        x = posteriors.T @ feats
        return gamma, x

    # -- posterior i-vector ------------------------------------------------------

    def _precision_linear(self, gamma: np.ndarray, x: np.ndarray):
        # U[g] = M_g^T Sigma_g^{-1} M_g : (G, R, R)
        MS = self._ms()                                     # (G, D, R)
        U = np.einsum("gdr,gds->grs", MS, self.M)
        L = np.eye(self.R) + np.einsum("g,grs->rs", gamma, U)
        b = np.einsum("gdr,gd->r", MS, x)
        b[0] += self.prior_offset
        return L, b

    def extract(self, feats: np.ndarray,
                posteriors: Optional[np.ndarray] = None) -> np.ndarray:
        gamma, x = self.acc_utt_stats(feats, posteriors)
        L, b = self._precision_linear(gamma, x)
        return np.linalg.solve(L, b)

    def extract_offset_removed(self, feats) -> np.ndarray:
        iv = self.extract(feats)
        iv[0] -= self.prior_offset
        return iv

    # -- I/O ---------------------------------------------------------------------

    def write(self, stream, binary: bool = True) -> None:
        iof.write_token(stream, binary, "<IvectorExtractor>")
        iof.write_float(stream, binary, self.prior_offset)
        iof.write_int32(stream, binary, self.num_gauss)
        iof.write_int32(stream, binary, self.dim)
        iof.write_int32(stream, binary, self.R)
        for g in range(self.num_gauss):
            iof.write_matrix(stream, binary, self.M[g])
        if self.full_cov:
            iof.write_token(stream, binary, "<SigmaInvFull>")
            iof.write_matrix(stream, binary,
                             self.sigma_inv.reshape(-1, self.dim))
        else:
            iof.write_matrix(stream, binary, self.sigma_inv)
        self.ubm.write(stream, binary)
        iof.write_token(stream, binary, "</IvectorExtractor>")

    @classmethod
    def read(cls, stream, binary: bool = True) -> "IvectorExtractor":
        iof.expect_token(stream, binary, "<IvectorExtractor>")
        prior = iof.read_float(stream, binary)
        G = iof.read_int32(stream, binary)
        D = iof.read_int32(stream, binary)
        R = iof.read_int32(stream, binary)
        M = np.stack([iof.read_matrix(stream, binary).astype(np.float64)
                      for _ in range(G)])
        full = iof.peek_token(stream, binary) == "<SigmaInvFull>"
        if full:
            iof.expect_token(stream, binary, "<SigmaInvFull>")
            sigma_inv = iof.read_matrix(stream, binary).astype(np.float64)
            sigma_inv = sigma_inv.reshape(G, D, D)
            from kaldi_tpu.gmm.full_gmm import FullGmm
            ubm = FullGmm.read(stream, binary)
        else:
            sigma_inv = iof.read_matrix(stream, binary).astype(np.float64)
            ubm = DiagGmm.read(stream, binary)
        iof.expect_token(stream, binary, "</IvectorExtractor>")
        out = cls.__new__(cls)
        out.ubm = ubm
        out.M = M
        out.sigma_inv = sigma_inv
        out.R = R
        out.prior_offset = prior
        return out


class OnlineIvectorEstimationStats:
    """Streaming linear/quadratic stats (ivector-extractor.h:314):
    accumulate frames (possibly weighted), read out the current MAP
    i-vector at any time."""

    def __init__(self, extractor: IvectorExtractor,
                 max_count: float = 0.0):
        self.ex = extractor
        self.R = extractor.R
        self.linear = np.zeros(self.R)
        self.linear[0] = extractor.prior_offset
        self.quadratic = np.eye(self.R)
        self.num_frames = 0.0
        self.max_count = max_count

    def acc_frames(self, feats: np.ndarray,
                   weights: Optional[np.ndarray] = None) -> None:
        feats = np.asarray(feats, np.float64)
        post = self.ex.ubm.component_posteriors(
            feats.astype(np.float32)).astype(np.float64)
        if weights is not None:
            post = post * np.asarray(weights, np.float64)[:, None]
        gamma = post.sum(axis=0)
        x = post.T @ feats
        MS = self.ex._ms()
        U = np.einsum("gdr,gds->grs", MS, self.ex.M)
        self.quadratic += np.einsum("g,grs->rs", gamma, U)
        self.linear += np.einsum("gdr,gd->r", MS, x)
        self.num_frames += float(gamma.sum())

    def ivector(self) -> np.ndarray:
        quad, lin = self.quadratic, self.linear
        if self.max_count > 0 and self.num_frames > self.max_count:
            # downweight like the reference's max-count scaling
            scale = self.max_count / self.num_frames
            quad = np.eye(self.R) + (self.quadratic - np.eye(self.R)) * scale
            lin = self.linear.copy() * scale
            lin[0] += self.ex.prior_offset * (1 - scale)
        return np.linalg.solve(quad, lin)

    def scale(self, s: float) -> None:
        """Scale stats (for decaying old utterances' influence)."""
        self.quadratic = np.eye(self.R) + (self.quadratic - np.eye(self.R)) * s
        off = np.zeros(self.R)
        off[0] = self.ex.prior_offset
        self.linear = off + (self.linear - off) * s
        self.num_frames *= s


class IvectorExtractorStats:
    """Accumulable E-step statistics (ivector-extractor.h:481
    IvectorExtractorStats): acc per utterance, sum across jobs
    (ivector-extractor-sum-accs), update() applies the M-step
    (ivector-extractor-est)."""

    def __init__(self, ex: IvectorExtractor):
        G, D, R = ex.num_gauss, ex.dim, ex.R
        self.A = np.zeros((G, R, R))   # Σ_u γ_u,g E[w wᵀ]
        self.B = np.zeros((G, D, R))   # Σ_u x_u,g E[w]ᵀ
        self.num_utts = 0

    def acc_stats(self, ex: IvectorExtractor, feats: np.ndarray,
                  posteriors: Optional[np.ndarray] = None) -> None:
        gamma, x = ex.acc_utt_stats(feats, posteriors)
        self.acc_from_utt_stats(ex, gamma, x)

    def acc_from_utt_stats(self, ex: IvectorExtractor,
                           gamma: np.ndarray, x: np.ndarray) -> None:
        L, b = ex._precision_linear(gamma, x)
        cov = np.linalg.inv(L)
        mean = cov @ b
        Eww = cov + np.outer(mean, mean)
        self.A += gamma[:, None, None] * Eww[None, :, :]
        self.B += np.einsum("gd,r->gdr", x, mean)
        self.num_utts += 1

    def add(self, other: "IvectorExtractorStats") -> None:
        self.A += other.A
        self.B += other.B
        self.num_utts += other.num_utts

    def update(self, ex: IvectorExtractor) -> None:
        """M-step: M_g = B_g A_g^{-1} (row-wise; diagonal or full
        sigma factors out of the per-gaussian solve)."""
        for g in range(ex.num_gauss):
            ex.M[g] = np.linalg.solve(self.A[g].T, self.B[g].T).T

    # -- I/O -----------------------------------------------------------

    def write(self, stream, binary: bool = True) -> None:
        iof.write_token(stream, binary, "<IvectorExtractorStats>")
        iof.write_int32(stream, binary, self.num_utts)
        G = self.A.shape[0]
        iof.write_int32(stream, binary, G)
        for g in range(G):
            iof.write_matrix(stream, binary, self.A[g])
            iof.write_matrix(stream, binary, self.B[g])
        iof.write_token(stream, binary, "</IvectorExtractorStats>")

    @classmethod
    def read(cls, stream, binary: bool = True
             ) -> "IvectorExtractorStats":
        iof.expect_token(stream, binary, "<IvectorExtractorStats>")
        out = cls.__new__(cls)
        out.num_utts = iof.read_int32(stream, binary)
        G = iof.read_int32(stream, binary)
        A, B = [], []
        for _ in range(G):
            A.append(iof.read_matrix(stream, binary))
            B.append(iof.read_matrix(stream, binary))
        out.A = np.stack(A).astype(np.float64)
        out.B = np.stack(B).astype(np.float64)
        iof.expect_token(stream, binary, "</IvectorExtractorStats>")
        return out


def train_ivector_extractor(ubm, feats_list: Sequence[np.ndarray],
                            opts: Optional[IvectorExtractorOptions] = None
                            ) -> IvectorExtractor:
    """EM training of the T-matrix (ivector-extractor.h:481 stats +
    update); ubm may be a DiagGmm or a full-covariance FullGmm."""
    if opts is None:
        opts = IvectorExtractorOptions()
    ex = IvectorExtractor(ubm, opts.ivector_dim, opts.prior_offset)
    utt_stats = [ex.acc_utt_stats(f) for f in feats_list]
    for it in range(opts.num_iters):
        stats = IvectorExtractorStats(ex)
        for gamma, x in utt_stats:
            stats.acc_from_utt_stats(ex, gamma, x)
        stats.update(ex)
        log(f"ivector EM iteration {it} done")
    return ex
