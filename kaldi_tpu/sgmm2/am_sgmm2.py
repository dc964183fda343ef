"""Subspace GMM acoustic model (SGMM2).

Parity: sgmm2/am-sgmm2.h:228 AmSgmm2, sgmm2/estimate-am-sgmm2.h
MleAmSgmm2Accs/MleAmSgmm2Updater (Povey et al. 2010, "The subspace
Gaussian mixture model — a structured model for speech recognition").
The reference treats this as a legacy optional extension
(src/Makefile EXT_SUBDIRS); implemented here for inventory
completeness, without the speaker subspace (N_i) — the spk-vector
machinery was superseded by i-vectors, which live in ivector/.

Model (I shared full-covariance Gaussians, phonetic subspace dim S):

  p(x | j) = sum_m c_jm sum_i w_jmi N(x; M_i v_jm, Sigma_i)
  w_jmi    = softmax_i(w_i . v_jm)

All state-level quantities derive from the per-substate vectors v_jm;
the globally shared M_i / w_i / Sigma_i are estimated over all states.
Likelihood evaluation is einsums over (frames x substates x gaussians)
— MXU-shaped, no per-state loops."""

from __future__ import annotations

from dataclasses import dataclass
from typing import BinaryIO, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.gmm.full_gmm import FullGmm

M_LOG_2PI = 1.8378770664093454835606594728112


@dataclass
class Sgmm2Options:
    phn_dim: Optional[int] = None     # S; default D + 1
    num_iters: int = 8
    update_flags: str = "vMwSc"       # which globals/state params
    max_cond: float = 1e5
    min_substate_occupancy: float = 1.0


class AmSgmm2:
    def __init__(self, ubm: FullGmm, num_states: int,
                 phn_dim: Optional[int] = None, seed: int = 0):
        rng = np.random.default_rng(seed)
        I, D = ubm.num_gauss, ubm.dim
        S = phn_dim or (D + 1)
        self.SigmaInv = ubm.inv_covars.astype(np.float64).copy()  # (I,D,D)
        means = ubm.get_means()
        # M_i: column 0 carries the UBM mean so v = e1 reproduces the UBM
        self.M = np.zeros((I, D, S))
        self.M[:, :, 0] = means
        self.M[:, :, 1:] += 0.1 * rng.normal(size=(I, D, S - 1))
        self.w = np.zeros((I, S))
        # per-state substate vectors and weights (start: one substate e1)
        self.v: List[np.ndarray] = [np.eye(1, S)[0:1].copy()
                                    for _ in range(num_states)]
        self.c: List[np.ndarray] = [np.ones(1) for _ in range(num_states)]
        self._cache = None

    # -- dimensions --------------------------------------------------------

    @property
    def num_states(self) -> int:
        return len(self.v)

    @property
    def num_gauss(self) -> int:
        return self.M.shape[0]

    @property
    def dim(self) -> int:
        return self.M.shape[1]

    @property
    def phn_dim(self) -> int:
        return self.M.shape[2]

    def invalidate(self):
        self._cache = None

    # -- likelihoods --------------------------------------------------------

    def _pack(self):
        """Flatten substates: returns (state_of (JM,), logc (JM,),
        means (JM, I, D), logw (JM, I), gconst (JM, I))."""
        if self._cache is not None:
            return self._cache
        state_of = []
        vs = []
        logc = []
        for j, (vj, cj) in enumerate(zip(self.v, self.c)):
            for m in range(vj.shape[0]):
                state_of.append(j)
                vs.append(vj[m])
                logc.append(np.log(max(cj[m], 1e-20)))
        V = np.asarray(vs)                              # (JM, S)
        means = np.einsum("ids,ms->mid", self.M, V)     # (JM, I, D)
        logits = V @ self.w.T                           # (JM, I)
        logw = logits - _logsumexp(logits, axis=1, keepdims=True)
        sign, logdet = np.linalg.slogdet(self.SigmaInv)
        if np.any(sign <= 0):
            raise ValueError("SGMM2: non-PD covariance")
        # gconst_mi = -0.5(D log2pi - logdet SigmaInv_i + mu' SigInv mu)
        quad = np.einsum("mid,ide,mie->mi", means, self.SigmaInv, means)
        gconst = -0.5 * (self.dim * M_LOG_2PI - logdet[None, :] + quad)
        cache = (np.asarray(state_of), np.asarray(logc), means, logw,
                 gconst)
        self._cache = cache
        return cache

    def log_likes(self, feats: np.ndarray) -> np.ndarray:
        """(T, D) -> (T, num_states) log-likelihoods."""
        comp = self.component_log_likes(feats)          # (T, JM, I)
        state_of, logc, _, _, _ = self._pack()
        sub = _logsumexp(comp, axis=2) + logc[None, :]  # (T, JM)
        out = np.full((feats.shape[0], self.num_states), -np.inf)
        for jm, j in enumerate(state_of):
            out[:, j] = np.logaddexp(out[:, j], sub[:, jm])
        return out

    def component_log_likes(self, feats: np.ndarray) -> np.ndarray:
        """(T, D) -> (T, JM, I): log [w_jmi N(x; mu_jmi, Sigma_i)]."""
        state_of, logc, means, logw, gconst = self._pack()
        x = np.asarray(feats, np.float64)
        # -0.5 x' SigInv_i x  : (T, I)
        xSx = np.einsum("td,ide,te->ti", x, self.SigmaInv, x,
                        optimize=True)
        # x' SigInv_i mu_jmi : (T, JM, I)
        Smu = np.einsum("ide,mie->mid", self.SigmaInv, means)   # (JM,I,D)
        lin = np.einsum("td,mid->tmi", x, Smu, optimize=True)
        return (gconst[None] + logw[None] + lin
                - 0.5 * xSx[:, None, :])

    # -- serialization -------------------------------------------------------

    def write(self, stream: BinaryIO, binary: bool = True) -> None:
        iof.write_token(stream, binary, "<SGMM2>")
        iof.write_int32(stream, binary, self.num_states)
        iof.write_int32(stream, binary, self.num_gauss)
        iof.write_int32(stream, binary, self.dim)
        iof.write_int32(stream, binary, self.phn_dim)
        for i in range(self.num_gauss):
            iof.write_matrix(stream, binary, self.M[i])
            iof.write_matrix(stream, binary, self.SigmaInv[i])
        iof.write_matrix(stream, binary, self.w)
        for j in range(self.num_states):
            iof.write_matrix(stream, binary, self.v[j])
            iof.write_vector(stream, binary, self.c[j])
        iof.write_token(stream, binary, "</SGMM2>")

    @classmethod
    def read(cls, stream: BinaryIO, binary: bool = True) -> "AmSgmm2":
        iof.expect_token(stream, binary, "<SGMM2>")
        J = iof.read_int32(stream, binary)
        I = iof.read_int32(stream, binary)
        D = iof.read_int32(stream, binary)
        S = iof.read_int32(stream, binary)
        out = cls.__new__(cls)
        out.M = np.zeros((I, D, S))
        out.SigmaInv = np.zeros((I, D, D))
        for i in range(I):
            out.M[i] = iof.read_matrix(stream, binary)
            out.SigmaInv[i] = iof.read_matrix(stream, binary)
        out.w = iof.read_matrix(stream, binary).astype(np.float64)
        out.v = []
        out.c = []
        for _ in range(J):
            out.v.append(iof.read_matrix(stream, binary).astype(np.float64))
            out.c.append(iof.read_vector(stream, binary).astype(np.float64))
        iof.expect_token(stream, binary, "</SGMM2>")
        out._cache = None
        return out


def _logsumexp(a, axis, keepdims=False):
    m = np.max(a, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(a - m), axis=axis, keepdims=True))
    return out if keepdims else np.squeeze(out, axis=axis)


class MleAmSgmm2Accs:
    """EM statistics (estimate-am-sgmm2.h MleAmSgmm2Accs)."""

    def __init__(self, model: AmSgmm2):
        state_of, _, _, _, _ = model._pack()
        JM, I, D = len(state_of), model.num_gauss, model.dim
        self.gamma = np.zeros((JM, I))       # occupancies
        self.y = np.zeros((JM, I, D))        # first moments
        self.S = np.zeros((I, D, D))         # scatter per gaussian
        self.total_like = 0.0
        self.total_frames = 0.0

    def accumulate(self, model: AmSgmm2, feats: np.ndarray,
                   states: Sequence[int]) -> float:
        """Viterbi-style supervision: frame t belongs to state[t]."""
        state_of, logc, _, _, _ = model._pack()
        x = np.asarray(feats, np.float64)
        comp = model.component_log_likes(x)              # (T, JM, I)
        comp = comp + logc[None, :, None]
        states = np.asarray(states)
        # mask substates not belonging to the aligned state
        mask = state_of[None, :] == states[:, None]      # (T, JM)
        masked = np.where(mask[:, :, None], comp, -np.inf)
        flat = masked.reshape(x.shape[0], -1)
        tot = _logsumexp(flat, axis=1)                   # (T,)
        post = np.exp(masked - tot[:, None, None])       # (T, JM, I)
        self.gamma += post.sum(axis=0)
        self.y += np.einsum("tmi,td->mid", post, x, optimize=True)
        gi = post.sum(axis=1)                            # (T, I)
        self.S += np.einsum("ti,td,te->ide", gi, x, x, optimize=True)
        self.total_like += float(tot.sum())
        self.total_frames += len(states)
        return float(tot.sum())


def _update_v(model: AmSgmm2, accs: MleAmSgmm2Accs,
              num_newton: int = 3) -> None:
    """Per-substate vector update: ascend the exact auxiliary
    Q(v) = sum_i gamma_i (w_i.v - logsumexp(w v)) +
           v' M_i' SigInv y_i - 0.5 gamma_i v' H_i v
    with damped Newton steps (estimate-am-sgmm2.cc UpdateVectors)."""
    I, D, S = model.num_gauss, model.dim, model.phn_dim
    H = np.einsum("ids,ide,iet->ist", model.M, model.SigmaInv, model.M)
    MtSig = np.einsum("ids,ide->ise", model.M, model.SigmaInv)  # (I,S,D)
    jm = 0
    for j in range(model.num_states):
        for m in range(model.v[j].shape[0]):
            gam = accs.gamma[jm]                      # (I,)
            if gam.sum() < 1e-3:
                jm += 1
                continue
            lin = np.einsum("ise,ie->s", MtSig, accs.y[jm])

            def q(v):
                logits = model.w @ v
                lse = _logsumexp(logits[None, :], axis=1)[0]
                return (float(gam @ (logits - lse)) + float(v @ lin)
                        - 0.5 * float(np.einsum(
                            "i,s,ist,t->", gam, v, H, v)))

            v = model.v[j][m].copy()
            for _ in range(num_newton):
                logits = model.w @ v
                wbar = np.exp(logits - _logsumexp(logits[None, :],
                                                  axis=1)[0])
                gamma_tot = gam.sum()
                grad = (model.w.T @ (gam - gamma_tot * wbar) + lin
                        - np.einsum("i,ist,t->s", gam, H, v))
                hess = (np.einsum("i,ist->st", gam, H)
                        + gamma_tot * (model.w.T * wbar) @ model.w
                        + 1e-4 * np.eye(S))
                step = np.linalg.solve(hess, grad)
                # backtracking on the exact auxiliary
                q0 = q(v)
                alpha = 1.0
                for _ in range(12):
                    if q(v + alpha * step) > q0:
                        v = v + alpha * step
                        break
                    alpha *= 0.5
            model.v[j][m] = v
            jm += 1
    model.invalidate()


def _update_M(model: AmSgmm2, accs: MleAmSgmm2Accs) -> None:
    """M_i = Y_i Q_i^{-1} (Sigma cancels; estimate-am-sgmm2.cc
    UpdateM)."""
    state_of, _, _, _, _ = model._pack()
    V = np.concatenate([model.v[j] for j in range(model.num_states)])
    for i in range(model.num_gauss):
        Q = np.einsum("m,ms,mt->st", accs.gamma[:, i], V, V)
        Y = np.einsum("md,ms->ds", accs.y[:, i], V)
        if accs.gamma[:, i].sum() < 1e-2:
            continue
        model.M[i] = Y @ np.linalg.inv(
            Q + 1e-6 * np.trace(Q) / model.phn_dim * np.eye(model.phn_dim))
    model.invalidate()


def _update_w(model: AmSgmm2, accs: MleAmSgmm2Accs,
              num_iters: int = 3) -> None:
    """Weight projections: gradient ascent with backtracking on the
    exact log-linear auxiliary (UpdateW)."""
    V = np.concatenate([model.v[j] for j in range(model.num_states)])
    gam = accs.gamma                                   # (JM, I)
    gam_m = gam.sum(axis=1)                            # (JM,)

    def q(w):
        logits = V @ w.T                               # (JM, I)
        lse = _logsumexp(logits, axis=1)
        return float((gam * logits).sum() - (gam_m * lse).sum())

    w = model.w.copy()
    for _ in range(num_iters):
        logits = V @ w.T
        wbar = np.exp(logits - _logsumexp(logits, axis=1, keepdims=True))
        grad = (gam - gam_m[:, None] * wbar).T @ V     # (I, S)
        scale = 1.0 / max(gam_m.sum(), 1.0)
        q0 = q(w)
        alpha = 1.0
        for _ in range(15):
            if q(w + alpha * scale * grad) > q0:
                w = w + alpha * scale * grad
                break
            alpha *= 0.5
    model.w = w
    model.invalidate()


def _update_sigma(model: AmSgmm2, accs: MleAmSgmm2Accs,
                  floor_frac: float = 1e-3) -> None:
    """Sigma_i from the scatter minus cross terms (UpdateVars)."""
    state_of, _, means, _, _ = model._pack()
    for i in range(model.num_gauss):
        g = accs.gamma[:, i]
        tot = g.sum()
        if tot < model.dim:
            continue
        cross = np.einsum("md,me->de", accs.y[:, i], means[:, i])
        mumut = np.einsum("m,md,me->de", g, means[:, i], means[:, i])
        sigma = (accs.S[i] - cross - cross.T + mumut) / tot
        sigma = 0.5 * (sigma + sigma.T)
        evals, evecs = np.linalg.eigh(sigma)
        floor = max(evals.max() * floor_frac, 1e-6)
        evals = np.maximum(evals, floor)
        model.SigmaInv[i] = (evecs / evals) @ evecs.T
    model.invalidate()


def _update_c(model: AmSgmm2, accs: MleAmSgmm2Accs) -> None:
    jm = 0
    for j in range(model.num_states):
        n = model.v[j].shape[0]
        g = accs.gamma[jm:jm + n].sum(axis=1)
        tot = g.sum()
        if tot > 0:
            model.c[j] = np.maximum(g / tot, 1e-8)
            model.c[j] /= model.c[j].sum()
        jm += n
    model.invalidate()


def train_sgmm2(ubm: FullGmm, feats_list: Sequence[np.ndarray],
                states_list: Sequence[Sequence[int]], num_states: int,
                opts: Optional[Sgmm2Options] = None) -> AmSgmm2:
    """EM training from aligned data (the sgmm2 recipe's
    align -> acc -> est loop at library level)."""
    opts = opts or Sgmm2Options()
    model = AmSgmm2(ubm, num_states, opts.phn_dim)
    for it in range(opts.num_iters):
        accs = MleAmSgmm2Accs(model)
        like = 0.0
        for f, st in zip(feats_list, states_list):
            like += accs.accumulate(model, f, st)
        log(f"SGMM2 iter {it}: avg loglike/frame "
            f"{like / max(accs.total_frames, 1):.4f}")
        if "v" in opts.update_flags:
            _update_v(model, accs)
        if "M" in opts.update_flags:
            _update_M(model, accs)
        if "w" in opts.update_flags:
            _update_w(model, accs)
        if "S" in opts.update_flags:
            _update_sigma(model, accs)
        if "c" in opts.update_flags:
            _update_c(model, accs)
    return model
