"""Basis fMLLR: speaker adaptation with very little data.

Parity: transform/basis-fmllr-diag-gmm.{h,cc} (BasisFmllrAccus,
BasisFmllrEstimate). The fMLLR transform is constrained to
W = W0 + sum_b c_b B_b where the bases B_b are the top eigenvectors of
the (normalized) gradient scatter collected over training speakers,
and the number of coefficients actually used scales with the amount
of adaptation data — so 5 seconds of speech estimates 20 numbers, not
the full D*(D+1) matrix.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs


class BasisFmllrAccus:
    """Gradient-scatter accumulator over training speakers
    (BasisFmllrAccus::AccuGradientScatter)."""

    def __init__(self, dim: int):
        self.dim = dim
        self.grad_scatter = np.zeros((dim * (dim + 1), dim * (dim + 1)))
        self.beta = 0.0

    def accumulate_gradient_scatter(self, accs: FmllrDiagGmmAccs) -> None:
        D = self.dim
        if accs.beta <= 0:
            return
        W0 = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
        grad = _auxf_gradient(W0, accs)
        v = grad.reshape(-1) / np.sqrt(accs.beta)
        self.grad_scatter += np.outer(v, v)
        self.beta += accs.beta

    def add(self, other: "BasisFmllrAccus") -> None:
        """Sum accumulators (parallel jobs feed
        gmm-basis-fmllr-training)."""
        self.grad_scatter += other.grad_scatter
        self.beta += other.beta

    def write(self, stream, binary: bool = True) -> None:
        from kaldi_tpu.base import io_funcs as iof
        iof.write_token(stream, binary, "<BasisFmllrAccus>")
        iof.write_token(stream, binary, "<Beta>")
        iof.write_float(stream, binary, self.beta)
        iof.write_token(stream, binary, "<Dim>")
        iof.write_int32(stream, binary, self.dim)
        iof.write_token(stream, binary, "<GradScatter>")
        iof.write_matrix(stream, binary, self.grad_scatter)
        iof.write_token(stream, binary, "</BasisFmllrAccus>")

    @classmethod
    def read(cls, stream, binary: bool = True) -> "BasisFmllrAccus":
        from kaldi_tpu.base import io_funcs as iof
        iof.expect_token(stream, binary, "<BasisFmllrAccus>")
        iof.expect_token(stream, binary, "<Beta>")
        beta = iof.read_float(stream, binary)
        iof.expect_token(stream, binary, "<Dim>")
        out = cls(iof.read_int32(stream, binary))
        out.beta = beta
        iof.expect_token(stream, binary, "<GradScatter>")
        out.grad_scatter = np.asarray(iof.read_matrix(stream, binary),
                                      np.float64)
        iof.expect_token(stream, binary, "</BasisFmllrAccus>")
        return out


def _auxf(W: np.ndarray, accs: FmllrDiagGmmAccs) -> float:
    D = accs.dim
    A = W[:, :D]
    sign, logdet = np.linalg.slogdet(A)
    if sign <= 0:
        return -np.inf
    q = sum(W[i] @ accs.G[i] @ W[i] for i in range(D))
    return accs.beta * logdet + float(np.sum(W * accs.K)) - 0.5 * q


def _auxf_gradient(W: np.ndarray, accs: FmllrDiagGmmAccs) -> np.ndarray:
    """d auxf / d W = beta [inv(A)^T | 0] + K - (W G_i rows)."""
    D = accs.dim
    A = W[:, :D]
    grad = accs.K - np.stack([accs.G[i] @ W[i] for i in range(D)])
    grad[:, :D] += accs.beta * np.linalg.inv(A).T
    return grad


class BasisFmllrEstimate:
    """Holds the estimated basis; computes per-speaker transforms."""

    def __init__(self, dim: int):
        self.dim = dim
        self.bases: List[np.ndarray] = []    # each (D, D+1), orthonormal

    @property
    def basis_size(self) -> int:
        return len(self.bases)

    def estimate_fmllr_basis(self, accus: BasisFmllrAccus,
                             basis_size: Optional[int] = None) -> None:
        """Top eigenvectors of the gradient scatter
        (BasisFmllrEstimate::EstimateFmllrBasis)."""
        D = self.dim
        if basis_size is None:
            basis_size = D * (D + 1)
        evals, evecs = np.linalg.eigh(accus.grad_scatter)
        order = np.argsort(evals)[::-1]
        self.bases = [evecs[:, j].reshape(D, D + 1)
                      for j in order[:basis_size]]
        kept = sum(float(evals[j]) for j in order[:basis_size])
        total = float(np.maximum(evals, 0).sum())
        log(f"fMLLR basis: kept {basis_size} bases "
            f"({100 * kept / max(total, 1e-10):.1f}% of scatter energy)")

    def compute_transform(self, accs: FmllrDiagGmmAccs,
                          size_scale: float = 0.2,
                          num_iters: int = 10
                          ) -> Tuple[np.ndarray, float, int]:
        """Per-speaker transform constrained to the basis span
        (BasisFmllrEstimate::ComputeTransform). Number of coefficients
        = min(basis_size, size_scale * frame count). Gradient ascent
        with backtracking line search on the exact auxiliary; returns
        (W, auxf improvement per frame, #coefficients)."""
        D = self.dim
        W = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
        if accs.beta <= 0 or not self.bases:
            return W, 0.0, 0
        n = int(min(len(self.bases), max(1, size_scale * accs.beta)))
        bases = self.bases[:n]
        coeffs = np.zeros(n)
        f0 = _auxf(W, accs)
        f_prev = f0
        for _ in range(num_iters):
            grad = _auxf_gradient(W, accs)
            d_coeffs = np.array([float(np.sum(grad * B)) for B in bases])
            direction = sum(d * B for d, B in zip(d_coeffs, bases))
            gnorm = float(np.sum(direction * direction))
            if gnorm < 1e-12 * max(1.0, accs.beta):
                break
            # backtracking line search (exact auxf, cheap at D ~ 40)
            step = 1.0 / max(accs.beta, 1.0)
            improved = False
            for _ in range(30):
                W_try = W + step * direction
                f_try = _auxf(W_try, accs)
                if f_try > f_prev:
                    W, f_prev = W_try, f_try
                    coeffs += step * d_coeffs
                    improved = True
                    break
                step *= 0.5
            if not improved:
                break
        return W, (f_prev - f0) / accs.beta, n
