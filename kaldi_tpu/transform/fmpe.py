"""fMPE: discriminatively trained feature offsets.

Parity: transform/fmpe.{h,cc} (Povey et al. 2005, "fMPE:
Discriminatively trained features for speech recognition"): features
are offset by a learned projection of a high-dimensional, sparse
frame descriptor

    x'_t = x_t + M h_t,    h_t = [posteriors of an fMPE GMM at frames
                                  t+c for each context offset c]

The reference hand-derives the MPE "direct + indirect" differentials
and updates M by per-dimension learning rates; here the projection is
trained TPU-natively by jax autodiff of a frame-discriminative
objective (log-posterior of the aligned pdf under the full acoustic
model, an MMI-style surrogate for MPE at this scale), with the model
loglikes computed by the same MXU kernel the decoder uses — so the
gradient through the offsets is exact."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.base.logging import log
from kaldi_tpu.gmm.am_diag_gmm import _log_likes_kernel
from kaldi_tpu.gmm.diag_gmm import DiagGmm


@dataclass
class FmpeOptions:
    context_offsets: Sequence[int] = (-2, -1, 0, 1, 2)
    post_floor: float = 1e-3       # sparsify the descriptor
    learning_rate: float = 0.05
    num_epochs: int = 10


class Fmpe:
    def __init__(self, fmpe_gmm: DiagGmm, feat_dim: int,
                 opts: Optional[FmpeOptions] = None):
        self.gmm = fmpe_gmm
        self.opts = opts or FmpeOptions()
        C = len(self.opts.context_offsets)
        G = fmpe_gmm.num_gauss
        self.M = np.zeros((C, G, feat_dim), np.float32)

    def descriptor(self, feats: np.ndarray) -> np.ndarray:
        """(T, D) -> (T, C, G) sparse context-expanded posteriors."""
        post = self.gmm.component_posteriors(
            np.asarray(feats, np.float32))
        post = np.where(post >= self.opts.post_floor, post, 0.0)
        T = feats.shape[0]
        t = np.arange(T)
        cols = [post[np.clip(t + c, 0, T - 1)]
                for c in self.opts.context_offsets]
        return np.stack(cols, axis=1).astype(np.float32)   # (T, C, G)

    def offsets(self, feats: np.ndarray,
                M: Optional[np.ndarray] = None) -> np.ndarray:
        h = self.descriptor(feats)
        M = self.M if M is None else M
        return np.einsum("tcg,cgd->td", h, M)

    def apply(self, feats: np.ndarray) -> np.ndarray:
        return np.asarray(feats) + self.offsets(feats)


def train_fmpe(fmpe: Fmpe, am, feats_list: Sequence[np.ndarray],
               pdf_ali_list: Sequence[Sequence[int]]) -> List[float]:
    """Gradient training of the projection M; returns per-epoch
    frame-posterior objective values."""
    gconsts, mi, iv, seg = am._pack()
    num_pdfs = am.num_pdfs
    descs = [jnp.asarray(fmpe.descriptor(f)) for f in feats_list]
    raw = [jnp.asarray(f, jnp.float32) for f in feats_list]
    alis = [jnp.asarray(np.asarray(a, np.int32)) for a in pdf_ali_list]

    @jax.jit
    def objective(M, x, h, ali):
        xp = x + jnp.einsum("tcg,cgd->td", h, M)
        ll = _log_likes_kernel(xp, gconsts, mi, iv, seg, num_pdfs)
        logpost = ll - jax.scipy.special.logsumexp(ll, axis=-1,
                                                   keepdims=True)
        return jnp.mean(jnp.take_along_axis(
            logpost, ali[:, None], axis=1))

    grad_fn = jax.jit(jax.grad(objective))
    M = jnp.asarray(fmpe.M)
    objs: List[float] = []
    for epoch in range(fmpe.opts.num_epochs):
        tot = 0.0
        for x, h, ali in zip(raw, descs, alis):
            g = grad_fn(M, x, h, ali)
            M = M + fmpe.opts.learning_rate * g
            tot += float(objective(M, x, h, ali))
        objs.append(tot / len(raw))
        log(f"fMPE epoch {epoch}: frame objective {objs[-1]:.4f}")
    fmpe.M = np.asarray(M)
    return objs


class FmpeStats:
    """Accumulated gradient of the discriminative objective wrt the
    fMPE projection M (transform/fmpe.h FmpeStats; the reference also
    carries per-dimension checks used by its learning-rate rule —
    here the update consumes the plain gradient)."""

    def __init__(self, shape):
        self.grad = np.zeros(shape, np.float64)   # (C, G, D)
        self.tot_frames = 0.0

    def add(self, other: "FmpeStats") -> None:
        self.grad += other.grad
        self.tot_frames += other.tot_frames

    def write(self, stream, binary: bool = True) -> None:
        from kaldi_tpu.base import io_funcs as iof
        iof.write_token(stream, binary, "<FmpeStats>")
        iof.write_int32(stream, binary, self.grad.shape[0])
        iof.write_int32(stream, binary, self.grad.shape[1])
        iof.write_double(stream, binary, self.tot_frames)
        for c in range(self.grad.shape[0]):
            iof.write_matrix(stream, binary, self.grad[c])
        iof.write_token(stream, binary, "</FmpeStats>")

    @classmethod
    def read(cls, stream, binary: bool = True) -> "FmpeStats":
        from kaldi_tpu.base import io_funcs as iof
        iof.expect_token(stream, binary, "<FmpeStats>")
        C = iof.read_int32(stream, binary)
        _G = iof.read_int32(stream, binary)
        tot = iof.read_double(stream, binary)
        mats = [iof.read_matrix(stream, binary) for _ in range(C)]
        out = cls((C, mats[0].shape[0], mats[0].shape[1]))
        out.grad = np.stack(mats).astype(np.float64)
        out.tot_frames = tot
        iof.expect_token(stream, binary, "</FmpeStats>")
        return out


def fmpe_objective_grad(fmpe: Fmpe, am, feats: np.ndarray,
                        pdf_post) -> Tuple[np.ndarray, float]:
    """Gradient of the soft-count frame log-posterior objective wrt M
    for one utterance (gmm-fmpe-acc-stats.cc: the direct
    differential, computed here by autodiff through the same MXU
    loglike kernel used at decode time).  pdf_post: per frame
    [(pdf, weight), ...]."""
    gconsts, mi, iv, seg = am._pack()
    num_pdfs = am.num_pdfs
    h = jnp.asarray(fmpe.descriptor(feats))
    x = jnp.asarray(np.asarray(feats, np.float32))
    T = feats.shape[0]
    tgt = np.zeros((T, num_pdfs), np.float32)
    for t, frame in enumerate(pdf_post):
        if t >= T:
            break
        for p, w in frame:
            tgt[t, p] += w
    tgt_j = jnp.asarray(tgt)

    def objective(M):
        xp = x + jnp.einsum("tcg,cgd->td", h, M)
        ll = _log_likes_kernel(xp, gconsts, mi, iv, seg, num_pdfs)
        logpost = ll - jax.scipy.special.logsumexp(ll, axis=-1,
                                                   keepdims=True)
        return jnp.sum(tgt_j * logpost)

    val, grad = jax.value_and_grad(objective)(jnp.asarray(fmpe.M))
    return np.asarray(grad, np.float64), float(val)
