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


def cluster_gaussians_to_ubm(am: AmDiagGmm, state_occs,
                             ubm_num_gauss: int = 400,
                             num_iters: int = 20,
                             seed: int = 0) -> DiagGmm:
    """Cluster all of an AM's Gaussians into one background GMM
    (am-diag-gmm.cc:195 ClusterGaussiansToUbm / sgmm2bin init-ubm).

    Every (pdf, gauss) pair enters with weight state_occ * w; a
    weighted k-means over the means forms ubm_num_gauss clusters,
    each moment-matched to a single diagonal Gaussian.  (The
    reference uses an agglomerative tree-cluster pass before the
    merge; the k-means route reaches an equivalent UBM without the
    O(N^2) pair scan.)"""
    import numpy as _np
    occs = _np.asarray(state_occs, _np.float64)
    means, var, w = [], [], []
    for pdf in range(am.num_pdfs):
        g = am.get_pdf(pdf)
        means.append(g.get_means().astype(_np.float64))
        var.append((1.0 / g.inv_vars).astype(_np.float64))
        w.append(_np.asarray(g.weights, _np.float64)
                 * (float(occs[pdf]) + 1e-10))
    means = _np.concatenate(means)
    var = _np.concatenate(var)
    w = _np.concatenate(w)
    K = min(int(ubm_num_gauss), len(w))
    rng = _np.random.default_rng(seed)
    # weighted k-means++ style init: sample K means by weight
    idx = rng.choice(len(w), K, replace=False,
                     p=w / w.sum()) if len(w) > K else _np.arange(K)
    cents = means[idx]
    for _ in range(num_iters):
        d2 = ((means[:, None, :] - cents[None]) ** 2).sum(-1) \
            if len(w) * K * means.shape[1] < 5e7 else None
        if d2 is None:
            # chunked distance computation for big models
            d2 = _np.empty((len(w), K))
            step = max(1, int(5e7 / (K * means.shape[1])))
            for s in range(0, len(w), step):
                d2[s:s + step] = ((means[s:s + step, None, :]
                                   - cents[None]) ** 2).sum(-1)
        assign = d2.argmin(axis=1)
        for k in range(K):
            sel = assign == k
            if not _np.any(sel):
                continue
            ww = w[sel]
            cents[k] = (means[sel] * ww[:, None]).sum(0) / ww.sum()
    # moment-match each cluster to one gaussian
    out_w = _np.zeros(K)
    out_m = _np.zeros((K, means.shape[1]))
    out_v = _np.ones((K, means.shape[1]))
    x2 = var + means ** 2
    for k in range(K):
        sel = assign == k
        if not _np.any(sel):
            out_m[k] = cents[k]
            continue
        ww = w[sel]
        out_w[k] = ww.sum()
        out_m[k] = (means[sel] * ww[:, None]).sum(0) / ww.sum()
        mx2 = (x2[sel] * ww[:, None]).sum(0) / ww.sum()
        out_v[k] = _np.maximum(mx2 - out_m[k] ** 2, 1e-10)
    keep = out_w > 0
    ubm = DiagGmm(int(keep.sum()), means.shape[1])
    ubm.set_from_means_and_vars(out_w[keep] / out_w[keep].sum(),
                                out_m[keep], out_v[keep])
    ubm.compute_gconsts()
    return ubm
