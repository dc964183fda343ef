"""LDA estimation (parity: transform/lda-estimate.h).

Accumulate per-class (pdf) first/second-order stats; Estimate() returns
the (target_dim × full_dim(+1)) transform maximizing between/within
class separation, with the reference's within-class-covariance
normalization convention so MLLT can follow.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof


@dataclass
class LdaOptions:
    dim: int = field(default=40, metadata={"doc": "Dimension to project to with LDA"})
    within_class_factor: float = 1.0
    allow_large_dim: bool = False
    remove_offset: bool = field(default=True, metadata={"doc": "Remove the mean (add an offset column to the transform)"})


class LdaEstimate:
    def __init__(self, num_classes: int, dim: int):
        self.zero_acc = np.zeros(num_classes)
        self.first_acc = np.zeros((num_classes, dim))
        self.total_second_acc = np.zeros((dim, dim))

    @property
    def dim(self):
        return self.first_acc.shape[1]

    def accumulate(self, data: np.ndarray, class_id: int,
                   weight: float = 1.0) -> None:
        x = np.asarray(data, np.float64)
        if x.ndim == 1:
            x = x[None, :]
        self.zero_acc[class_id] += weight * x.shape[0]
        self.first_acc[class_id] += weight * x.sum(axis=0)
        self.total_second_acc += weight * x.T @ x

    def add(self, other: "LdaEstimate") -> None:
        self.zero_acc += other.zero_acc
        self.first_acc += other.first_acc
        self.total_second_acc += other.total_second_acc

    def estimate(self, opts: LdaOptions
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (lda_mat (target, dim[+1]), full_mat (dim, dim[+1]))."""
        count = self.zero_acc.sum()
        D = self.dim
        mean = self.first_acc.sum(axis=0) / count
        total_covar = self.total_second_acc / count - np.outer(mean, mean)
        # between-class covariance
        bc = np.zeros((D, D))
        mask = self.zero_acc > 0
        cmeans = self.first_acc[mask] / self.zero_acc[mask][:, None]
        diffs = cmeans - mean
        bc = (self.zero_acc[mask][:, None, None]
              * np.einsum("cd,ce->cde", diffs, diffs)).sum(axis=0) / count
        wc = total_covar - bc
        wc += 1e-8 * np.trace(wc) / D * np.eye(D)
        # solve generalized eig: wc^{-1/2} bc wc^{-1/2}
        vals, vecs = np.linalg.eigh(wc)
        w_half_inv = (vecs * (1.0 / np.sqrt(np.maximum(vals, 1e-10)))) @ vecs.T
        m = w_half_inv @ bc @ w_half_inv.T
        evals, evecs = np.linalg.eigh(m)
        order = np.argsort(-evals)
        full = (evecs[:, order].T @ w_half_inv)  # (D, D)
        if opts.within_class_factor != 1.0:
            scale = np.sqrt(opts.within_class_factor
                            / np.maximum(1.0 + evals[order], 1e-10))
            full = full * scale[:, None]
        lda = full[:opts.dim]
        if opts.remove_offset:
            off_full = -full @ mean
            off = -lda @ mean
            full = np.concatenate([full, off_full[:, None]], axis=1)
            lda = np.concatenate([lda, off[:, None]], axis=1)
        return lda, full

    def write(self, stream, binary: bool = True) -> None:
        iof.write_token(stream, binary, "<LDAACCS>")
        iof.write_vector(stream, binary, self.zero_acc)
        iof.write_matrix(stream, binary, self.first_acc)
        iof.write_matrix(stream, binary, self.total_second_acc)
        iof.write_token(stream, binary, "</LDAACCS>")

    @classmethod
    def read(cls, stream, binary: bool = True) -> "LdaEstimate":
        iof.expect_token(stream, binary, "<LDAACCS>")
        za = iof.read_vector(stream, binary).astype(np.float64)
        fa = iof.read_matrix(stream, binary).astype(np.float64)
        sa = iof.read_matrix(stream, binary).astype(np.float64)
        iof.expect_token(stream, binary, "</LDAACCS>")
        obj = cls(len(za), fa.shape[1])
        obj.zero_acc, obj.first_acc, obj.total_second_acc = za, fa, sa
        return obj
