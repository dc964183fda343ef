"""Acoustic model = one DiagGmm per pdf (parity: gmm/am-diag-gmm.h:36),
with batched TPU scoring of all (frame, pdf) loglikes at once.

The reference scores per (frame, pdf) on demand inside the decoder
(DecodableAmDiagGmmScaled). TPU-first redesign: pack every Gaussian of
every pdf into one (total_gauss × dim) matrix, compute all component
loglikes for a whole utterance batch with two MXU matmuls, then
segment-logsumexp per pdf — the full (frames × pdfs) matrix feeds the
decoder/aligner directly.
"""

from __future__ import annotations

import functools
from typing import BinaryIO, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import KaldiTpuError
from kaldi_tpu.gmm.diag_gmm import DiagGmm


class AmDiagGmm:
    def __init__(self):
        self.densities: List[DiagGmm] = []
        self._packed = None

    @property
    def num_pdfs(self) -> int:
        return len(self.densities)

    @property
    def dim(self) -> int:
        return self.densities[0].dim if self.densities else 0

    def num_gauss(self) -> int:
        return sum(g.num_gauss for g in self.densities)

    def add_pdf(self, gmm: DiagGmm) -> None:
        self.densities.append(gmm)
        self._packed = None

    def get_pdf(self, i: int) -> DiagGmm:
        return self.densities[i]

    def invalidate_pack(self) -> None:
        self._packed = None

    # -- batched scoring -----------------------------------------------------

    def _pack(self):
        if self._packed is None:
            gconsts = np.concatenate([g.gconsts for g in self.densities])
            mi = np.concatenate([g.means_invvars for g in self.densities])
            iv = np.concatenate([g.inv_vars for g in self.densities])
            seg = np.concatenate([np.full(g.num_gauss, i, np.int32)
                                  for i, g in enumerate(self.densities)])
            self._packed = (jnp.asarray(gconsts), jnp.asarray(mi),
                            jnp.asarray(iv), jnp.asarray(seg))
        return self._packed

    def log_likes_batch(self, feats: np.ndarray) -> np.ndarray:
        """(T, D) or (B, T, D) -> (..., num_pdfs) loglikes, on device."""
        gconsts, mi, iv, seg = self._pack()
        out = _log_likes_kernel(jnp.asarray(feats, jnp.float32), gconsts, mi,
                                iv, seg, self.num_pdfs)
        return np.asarray(out)

    # -- I/O (format of am-diag-gmm.cc) -------------------------------------

    def write(self, stream: BinaryIO, binary: bool = True) -> None:
        iof.write_token(stream, binary, "<DIMENSION>")
        iof.write_int32(stream, binary, self.dim)
        iof.write_token(stream, binary, "<NUMPDFS>")
        iof.write_int32(stream, binary, self.num_pdfs)
        for g in self.densities:
            g.write(stream, binary)

    @classmethod
    def read(cls, stream: BinaryIO, binary: bool = True) -> "AmDiagGmm":
        am = cls()
        iof.expect_token(stream, binary, "<DIMENSION>")
        iof.read_int32(stream, binary)
        iof.expect_token(stream, binary, "<NUMPDFS>")
        n = iof.read_int32(stream, binary)
        for _ in range(n):
            am.add_pdf(DiagGmm.read(stream, binary))
        return am


@functools.partial(jax.jit, static_argnums=(5,))
def _log_likes_kernel(feats, gconsts, mi, iv, seg, num_pdfs):
    """Component loglikes as two MXU matmuls + segment logsumexp."""
    hp = jax.lax.Precision.HIGHEST
    comp = (gconsts
            + jnp.matmul(feats, mi.T, precision=hp)
            - 0.5 * jnp.matmul(feats * feats, iv.T, precision=hp))
    comp_t = jnp.moveaxis(comp, -1, 0)  # (M, ...)
    seg_max = jax.ops.segment_max(comp_t, seg, num_segments=num_pdfs)
    per_comp_max = seg_max[seg]
    sums = jax.ops.segment_sum(jnp.exp(comp_t - per_comp_max), seg,
                               num_segments=num_pdfs)
    out = seg_max + jnp.log(sums)
    return jnp.moveaxis(out, 0, -1)
