"""Linear VTLN (parity: transform/lvtln.{h,cc} LinearVtln,
gmmbin/gmm-train-lvtln-special.cc, steps/train_lvtln.sh).

VTLN warps the mel filterbank per speaker; LINEAR VTLN approximates
each warp factor's effect as a single linear transform on the
features, trained as the least-squares map from unwarped to warped
features over the training data. Per speaker, the class (warp) is
chosen to maximize the fMLLR auxiliary given the speaker's GMM stats,
with an offset (bias) re-estimated per class — so test-time warping
needs no second feature-extraction pass."""

from __future__ import annotations

from typing import BinaryIO, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log
from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs


class LinearVtln:
    def __init__(self, dim: int, warps: Sequence[float]):
        self.warps = list(warps)
        self.A = np.stack([np.eye(dim) for _ in warps])

    @property
    def dim(self) -> int:
        return self.A.shape[1]

    @property
    def num_classes(self) -> int:
        return len(self.warps)

    def set_transform(self, c: int, A: np.ndarray) -> None:
        self.A[c] = np.asarray(A, np.float64)

    def compute_transform(self, accs: FmllrDiagGmmAccs,
                          norm_type: str = "offset"
                          ) -> Tuple[np.ndarray, float, float]:
        """Select the best class for a speaker.  Returns
        (W (D, D+1), chosen warp, auxf improvement/frame).
        norm_type: 'offset' re-estimates a bias per class; 'none' uses
        the bare linear transform."""
        D = self.dim
        if accs.beta <= 0:
            return np.concatenate([np.eye(D), np.zeros((D, 1))], 1), \
                self.warps[len(self.warps) // 2], 0.0

        def auxf(W):
            A = W[:, :D]
            sign, logdet = np.linalg.slogdet(A)
            if sign <= 0:
                return -np.inf
            q = sum(W[i] @ accs.G[i] @ W[i] for i in range(D))
            return accs.beta * logdet + float(np.sum(W * accs.K)) \
                - 0.5 * q

        W0 = np.concatenate([np.eye(D), np.zeros((D, 1))], 1)
        f0 = auxf(W0)
        best = (f0, W0, 1.0)
        for c, warp in enumerate(self.warps):
            W = np.concatenate([self.A[c], np.zeros((D, 1))], 1)
            if norm_type == "offset":
                # per-row bias maximizing the auxiliary given fixed A:
                # d/db_i = K_i[D] - (G_i W_i)[D] = 0
                for i in range(D):
                    g = accs.G[i]
                    num = accs.K[i, D] - self.A[c][i] @ g[:D, D]
                    den = max(g[D, D], 1e-10)
                    W[i, D] = num / den
            f = auxf(W)
            if f > best[0]:
                best = (f, W, warp)
        return best[1], best[2], (best[0] - f0) / accs.beta

    # -- I/O -----------------------------------------------------------------

    def write(self, stream: BinaryIO, binary: bool = True) -> None:
        iof.write_token(stream, binary, "<LinearVtln>")
        iof.write_int32(stream, binary, self.dim)
        iof.write_int32(stream, binary, self.num_classes)
        iof.write_vector(stream, binary,
                         np.asarray(self.warps, np.float32))
        for c in range(self.num_classes):
            iof.write_matrix(stream, binary, self.A[c].astype(np.float32))
        iof.write_token(stream, binary, "</LinearVtln>")

    @classmethod
    def read(cls, stream: BinaryIO, binary: bool = True) -> "LinearVtln":
        iof.expect_token(stream, binary, "<LinearVtln>")
        dim = iof.read_int32(stream, binary)
        n = iof.read_int32(stream, binary)
        warps = iof.read_vector(stream, binary).tolist()
        out = cls(dim, warps)
        for c in range(n):
            out.A[c] = iof.read_matrix(stream, binary).astype(np.float64)
        iof.expect_token(stream, binary, "</LinearVtln>")
        return out


def train_lvtln(unwarped: Sequence[np.ndarray],
                warped_per_class: Sequence[Sequence[np.ndarray]],
                warps: Sequence[float]) -> LinearVtln:
    """Fit each class transform as the least-squares linear map from
    unwarped to warped features over the whole corpus
    (gmm-train-lvtln-special's MSE solution): A_c = (Y X^T)(X X^T)^-1
    with X, Y frame-parallel."""
    D = unwarped[0].shape[1]
    lv = LinearVtln(D, warps)
    X = np.concatenate([np.asarray(f, np.float64) for f in unwarped])
    XtX = X.T @ X + 1e-6 * np.eye(D)
    for c, warped in enumerate(warped_per_class):
        Y = np.concatenate([np.asarray(f, np.float64) for f in warped])
        assert Y.shape == X.shape, "parallel features required"
        A = np.linalg.solve(XtX.T, (X.T @ Y)).T    # A = Y^T X (X^T X)^-1
        lv.set_transform(c, A)
        err = float(np.mean((X @ A.T - Y) ** 2))
        log(f"lvtln class {c} (warp {warps[c]}): mse {err:.4f}")
    return lv
