"""Subspace GMM acoustic model (SGMM2).

Parity: sgmm2/am-sgmm2.h:228 AmSgmm2, sgmm2/estimate-am-sgmm2.h
MleAmSgmm2Accs/MleAmSgmm2Updater (Povey et al. 2010, "The subspace
Gaussian mixture model — a structured model for speech recognition").
The reference treats this as a legacy optional extension
(src/Makefile EXT_SUBDIRS); implemented here for inventory
completeness.  The speaker subspace (N_i, speaker vectors v^(s)) and
the symmetric-SGMM speaker weight projections (u_i; the "2" in SGMM2,
am-sgmm2.h:61 comment block) are both implemented — enable with
init_speaker_subspace().

Model (I shared full-covariance Gaussians, phonetic subspace dim S,
speaker subspace dim T):

  p(x | j, s) = sum_m c_jm sum_i w_jmi(s) N(x; M_i v_jm + N_i v^(s), Sigma_i)
  w_jmi(s)    = softmax_i(w_i . v_jm + u_i . v^(s))

All state-level quantities derive from the per-substate vectors v_jm;
the globally shared M_i / w_i / Sigma_i are estimated over all states.
Likelihood evaluation is einsums over (frames x substates x gaussians)
— MXU-shaped, no per-state loops."""

from __future__ import annotations

from dataclasses import dataclass
from typing import BinaryIO, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log
from kaldi_tpu.gmm.full_gmm import FullGmm

M_LOG_2PI = 1.8378770664093454835606594728112


@dataclass
class Sgmm2Options:
    phn_dim: Optional[int] = None     # S; default D + 1
    num_iters: int = 8
    update_flags: str = "vMwSc"       # which globals/state params
    max_cond: float = 1e5
    min_substate_occupancy: float = 1.0
    # speaker subspace (enabled when spk_dim is set and speaker labels
    # are passed to train_sgmm2); "N" / "u" are appended to
    # update_flags automatically
    spk_dim: Optional[int] = None     # T; None = no speaker subspace
    use_u: bool = True                # symmetric-SGMM spk weights u_i


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
        self.N: Optional[np.ndarray] = None   # (I, D, T) spk projections
        self.u: Optional[np.ndarray] = None   # (I, T) spk weight proj
        self._cache = None

    def init_speaker_subspace(self, spk_dim: int, use_u: bool = True,
                              seed: int = 0) -> None:
        """Add the speaker subspace (am-sgmm2.h speaker vectors): N_i
        projects a per-speaker vector v^(s) into a per-Gaussian mean
        offset; u_i (symmetric SGMM2) adds u_i . v^(s) to the weight
        logits.  N starts small-random (a zero N makes the first
        speaker-vector estimation degenerate), u starts at zero (no
        initial weight effect)."""
        rng = np.random.default_rng(seed)
        I, D = self.num_gauss, self.dim
        self.N = 0.1 * rng.normal(size=(I, D, int(spk_dim)))
        self.u = np.zeros((I, int(spk_dim))) if use_u else None

    @property
    def spk_dim(self) -> int:
        return 0 if self.N is None else self.N.shape[2]

    def spk_offsets(self, spk_vec: np.ndarray) -> np.ndarray:
        """(T,) speaker vector -> (I, D) per-Gaussian mean offsets."""
        return np.einsum("idt,t->id", self.N, np.asarray(spk_vec,
                                                         np.float64))

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

    def log_likes(self, feats: np.ndarray,
                  spk_vec: Optional[np.ndarray] = None) -> np.ndarray:
        """(T, D) -> (T, num_states) log-likelihoods (speaker-adapted
        when spk_vec is given and the speaker subspace exists)."""
        comp = self.component_log_likes(feats, spk_vec)  # (T, JM, I)
        state_of, logc, _, _, _ = self._pack()
        sub = _logsumexp(comp, axis=2) + logc[None, :]  # (T, JM)
        out = np.full((feats.shape[0], self.num_states), -np.inf)
        for jm, j in enumerate(state_of):
            out[:, j] = np.logaddexp(out[:, j], sub[:, jm])
        return out

    def component_log_likes(self, feats: np.ndarray,
                            spk_vec: Optional[np.ndarray] = None
                            ) -> np.ndarray:
        """(T, D) -> (T, JM, I): log [w_jmi(s) N(x; mu_jmi + o_i(s),
        Sigma_i)] — o_i(s) = N_i v^(s) = 0 without a speaker vector."""
        state_of, logc, means, logw, gconst = self._pack()
        x = np.asarray(feats, np.float64)
        # -0.5 x' SigInv_i x  : (T, I)
        xSx = np.einsum("td,ide,te->ti", x, self.SigmaInv, x,
                        optimize=True)
        # x' SigInv_i mu_jmi : (T, JM, I)
        Smu = np.einsum("ide,mie->mid", self.SigmaInv, means)   # (JM,I,D)
        lin = np.einsum("td,mid->tmi", x, Smu, optimize=True)
        if spk_vec is not None and self.N is not None:
            o = self.spk_offsets(spk_vec)                       # (I, D)
            So = np.einsum("ide,ie->id", self.SigmaInv, o)      # (I, D)
            # quadratic-term corrections for the shifted mean
            lin = lin + np.einsum("td,id->ti", x, So)[:, None, :]
            cross = np.einsum("mid,id->mi", means, So)
            oo = np.einsum("id,id->i", o, So)
            gconst = gconst - cross - 0.5 * oo[None, :]
            if self.u is not None:
                # symmetric SGMM2: logits shift u_i . v^(s); logw rows
                # are shift-invariant so renormalizing them is exact
                shift = self.u @ np.asarray(spk_vec, np.float64)
                lg = logw + shift[None, :]
                logw = lg - _logsumexp(lg, axis=1, keepdims=True)
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
        if self.N is not None:
            iof.write_token(stream, binary, "<SpkSpace>")
            iof.write_int32(stream, binary, self.spk_dim)
            for i in range(self.num_gauss):
                iof.write_matrix(stream, binary, self.N[i])
            iof.write_int32(stream, binary, 0 if self.u is None else 1)
            if self.u is not None:
                iof.write_matrix(stream, binary, self.u)
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
        out.N = out.u = None
        tok = iof.read_token(stream, binary)
        if tok == "<SpkSpace>":
            T = iof.read_int32(stream, binary)
            out.N = np.zeros((I, D, T))
            for i in range(I):
                out.N[i] = iof.read_matrix(stream, binary)
            if iof.read_int32(stream, binary):
                out.u = iof.read_matrix(stream, binary).astype(np.float64)
            tok = iof.read_token(stream, binary)
        if tok != "</SGMM2>":
            raise ValueError(f"AmSgmm2.read: expected </SGMM2>, got {tok!r}")
        out._cache = None
        return out


def _logsumexp(a, axis, keepdims=False):
    m = np.max(a, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(a - m), axis=axis, keepdims=True))
    return out if keepdims else np.squeeze(out, axis=axis)


class MleAmSgmm2Accs:
    """EM statistics (estimate-am-sgmm2.h MleAmSgmm2Accs).

    With speaker vectors the first/second moments are accumulated on
    speaker-normalized data x - o_i(s) (the reference subtracts the
    offset inside AccumulateFromPosteriors), so the v/M/Sigma update
    formulas are unchanged; Z/R additionally collect the speaker-
    projection stats for UpdateN, and grad/Fisher pieces for UpdateU."""

    def __init__(self, model: AmSgmm2):
        state_of, _, _, _, _ = model._pack()
        JM, I, D = len(state_of), model.num_gauss, model.dim
        self.gamma = np.zeros((JM, I))       # occupancies
        self.y = np.zeros((JM, I, D))        # first moments
        self.S = np.zeros((I, D, D))         # scatter per gaussian
        self.total_like = 0.0
        self.total_frames = 0.0
        if model.N is not None:
            T = model.spk_dim
            self.Z = np.zeros((I, model.dim, T))   # UpdateN numerator
            self.R = np.zeros((I, T, T))           # UpdateN denominator
            if model.u is not None:
                self.u_grad = np.zeros((I, T))
                self.u_hess = np.zeros((I, T, T))  # Fisher blocks

    def write(self, stream: BinaryIO, binary: bool = True) -> None:
        iof.write_token(stream, binary, "<SGMM2Accs>")
        iof.write_matrix(stream, binary, self.gamma)
        iof.write_int32(stream, binary, self.y.shape[0])
        for m in range(self.y.shape[0]):
            iof.write_matrix(stream, binary, self.y[m])
        for i in range(self.S.shape[0]):
            iof.write_matrix(stream, binary, self.S[i])
        has_spk = int(hasattr(self, "Z"))
        iof.write_int32(stream, binary, has_spk)
        if has_spk:
            for i in range(self.Z.shape[0]):
                iof.write_matrix(stream, binary, self.Z[i])
                iof.write_matrix(stream, binary, self.R[i])
            has_u = int(hasattr(self, "u_grad"))
            iof.write_int32(stream, binary, has_u)
            if has_u:
                iof.write_matrix(stream, binary, self.u_grad)
                for i in range(self.u_hess.shape[0]):
                    iof.write_matrix(stream, binary, self.u_hess[i])
        iof.write_vector(stream, binary,
                         np.array([self.total_like, self.total_frames]))
        iof.write_token(stream, binary, "</SGMM2Accs>")

    @classmethod
    def read(cls, stream: BinaryIO, binary: bool = True
             ) -> "MleAmSgmm2Accs":
        iof.expect_token(stream, binary, "<SGMM2Accs>")
        out = cls.__new__(cls)
        out.gamma = iof.read_matrix(stream, binary).astype(np.float64)
        JM = iof.read_int32(stream, binary)
        out.y = np.stack([iof.read_matrix(stream, binary)
                          for _ in range(JM)]).astype(np.float64)
        I = out.gamma.shape[1]
        out.S = np.stack([iof.read_matrix(stream, binary)
                          for _ in range(I)]).astype(np.float64)
        if iof.read_int32(stream, binary):
            Z, R = [], []
            for _ in range(I):
                Z.append(iof.read_matrix(stream, binary))
                R.append(iof.read_matrix(stream, binary))
            out.Z = np.stack(Z).astype(np.float64)
            out.R = np.stack(R).astype(np.float64)
            if iof.read_int32(stream, binary):
                out.u_grad = iof.read_matrix(stream,
                                             binary).astype(np.float64)
                out.u_hess = np.stack(
                    [iof.read_matrix(stream, binary)
                     for _ in range(I)]).astype(np.float64)
        tot = iof.read_vector(stream, binary)
        out.total_like, out.total_frames = float(tot[0]), float(tot[1])
        iof.expect_token(stream, binary, "</SGMM2Accs>")
        return out

    def add(self, other: "MleAmSgmm2Accs") -> None:
        """Sum accumulators (sgmm2-sum-accs)."""
        self.gamma += other.gamma
        self.y += other.y
        self.S += other.S
        for f in ("Z", "R", "u_grad", "u_hess"):
            if hasattr(self, f) and hasattr(other, f):
                setattr(self, f, getattr(self, f) + getattr(other, f))
        self.total_like += other.total_like
        self.total_frames += other.total_frames

    def accumulate(self, model: AmSgmm2, feats: np.ndarray,
                   states: Sequence[int],
                   spk_vec: Optional[np.ndarray] = None,
                   weights: Optional[Sequence[float]] = None) -> float:
        """Viterbi-style supervision: frame t belongs to state[t].

        With `weights`, frame t counts with soft weight weights[t]
        (sgmm2-acc-stats.cc posterior path: a frame carrying posterior
        mass over several pdfs is passed as repeated rows, one per
        (pdf, weight) entry)."""
        state_of, logc, means, _, _ = model._pack()
        x = np.asarray(feats, np.float64)
        comp = model.component_log_likes(x, spk_vec)     # (T, JM, I)
        comp = comp + logc[None, :, None]
        states = np.asarray(states)
        # mask substates not belonging to the aligned state
        mask = state_of[None, :] == states[:, None]      # (T, JM)
        masked = np.where(mask[:, :, None], comp, -np.inf)
        flat = masked.reshape(x.shape[0], -1)
        tot = _logsumexp(flat, axis=1)                   # (T,)
        post = np.exp(masked - tot[:, None, None])       # (T, JM, I)
        if weights is not None:
            w = np.asarray(weights, np.float64)
            post = post * w[:, None, None]
        else:
            w = np.ones(len(states))
        self._accumulate_post(model, x, post, spk_vec)
        like = float(np.dot(w, tot))
        self.total_like += like
        self.total_frames += float(w.sum())
        return like

    def accumulate_from_gpost(self, model: AmSgmm2, feats: np.ndarray,
                              gpost,
                              spk_vec: Optional[np.ndarray] = None
                              ) -> float:
        """Accumulate from precomputed substate/Gaussian-level
        posteriors (sgmm2-acc-stats-gpost.cc): gpost is per frame a
        list of (first_substate_row, posterior matrix (n_sub, I))."""
        x = np.asarray(feats, np.float64)
        JM = self.gamma.shape[0]
        I = self.gamma.shape[1]
        post = np.zeros((x.shape[0], JM, I))
        tot_w = 0.0
        for t, frame in enumerate(gpost):
            if t >= x.shape[0]:
                break
            for jm0, mat in frame:
                mat = np.asarray(mat, np.float64)
                post[t, jm0:jm0 + mat.shape[0]] += mat
                tot_w += float(mat.sum())
        self._accumulate_post(model, x, post, spk_vec)
        self.total_frames += tot_w
        return tot_w

    def _accumulate_post(self, model: AmSgmm2, x: np.ndarray,
                         post: np.ndarray,
                         spk_vec: Optional[np.ndarray]) -> None:
        """Moment accumulation given explicit (T, JM, I) posteriors."""
        _state_of, _logc, means, _, _ = model._pack()
        self.gamma += post.sum(axis=0)
        gi = post.sum(axis=1)                            # (T, I)
        g = gi.sum(axis=0)                               # (I,)
        b = np.einsum("ti,td->id", gi, x)                # (I, D)
        A = np.einsum("ti,td,te->ide", gi, x, x, optimize=True)
        if spk_vec is not None and model.N is not None:
            vs = np.asarray(spk_vec, np.float64)
            o = model.spk_offsets(vs)                    # (I, D)
            # speaker-normalized moments: y -= gamma_mi o_i, S gets the
            # (x-o)(x-o)' expansion
            self.y += (np.einsum("tmi,td->mid", post, x, optimize=True)
                       - post.sum(0)[:, :, None] * o[None])
            self.S += (A - np.einsum("id,ie->ide", b, o)
                       - np.einsum("id,ie->ide", o, b)
                       + g[:, None, None] * np.einsum("id,ie->ide", o, o))
            # UpdateN stats: Z_i += [sum_t gi x - sum_m gamma_mi mu_mi]
            # v_s', R_i += gamma_i(utt) v_s v_s'
            c = np.einsum("mi,mid->id", post.sum(0), means)
            self.Z += (b - c)[:, :, None] * vs[None, None, :]
            self.R += g[:, None, None] * np.einsum("s,t->st", vs, vs)
            if model.u is not None:
                # weight-logit posteriors at the current u (exact grad
                # of sum log w_jmi(s); Fisher for the Newton step)
                _, _, _, logw, _ = model._pack()
                lg = logw + (model.u @ vs)[None, :]
                p = np.exp(lg - _logsumexp(lg, axis=1, keepdims=True))
                gamma_m = post.sum(axis=(0, 2))          # (JM,)
                diff = post.sum(0) - gamma_m[:, None] * p   # (JM, I)
                self.u_grad += diff.sum(0)[:, None] * vs[None, :]
                w_occ = (gamma_m[:, None] * p * (1.0 - p)).sum(0)  # (I,)
                self.u_hess += w_occ[:, None, None] * \
                    np.einsum("s,t->st", vs, vs)
        else:
            self.y += np.einsum("tmi,td->mid", post, x, optimize=True)
            self.S += A


def compute_gauss_post(model: AmSgmm2, feats: np.ndarray,
                       states: Sequence[int],
                       spk_vec: Optional[np.ndarray] = None,
                       weights: Optional[Sequence[float]] = None):
    """Per-frame substate/Gaussian posteriors for the aligned states
    (sgmm2-post-to-gpost.cc): returns (gpost, total loglike) where
    gpost[t] = [(first_substate_row, matrix (n_sub, I))]."""
    state_of, logc, _means, _, _ = model._pack()
    x = np.asarray(feats, np.float64)
    comp = model.component_log_likes(x, spk_vec) + logc[None, :, None]
    states = np.asarray(states)
    mask = state_of[None, :] == states[:, None]
    masked = np.where(mask[:, :, None], comp, -np.inf)
    tot = _logsumexp(masked.reshape(x.shape[0], -1), axis=1)
    post = np.exp(masked - tot[:, None, None])
    if weights is not None:
        w = np.asarray(weights, np.float64)
        post = post * w[:, None, None]
    else:
        w = np.ones(len(states))
    # first substate row per state
    first_row = {}
    for row, j in enumerate(state_of):
        first_row.setdefault(int(j), row)
    gpost = []
    for t in range(x.shape[0]):
        j = int(states[t])
        jm0 = first_row[j]
        n_sub = int((state_of == j).sum())
        gpost.append([(jm0, post[t, jm0:jm0 + n_sub]
                       .astype(np.float32))])
    return gpost, float(np.dot(w, tot))


class MleSgmm2SpeakerAccs:
    """Per-speaker vector estimation stats (estimate-am-sgmm2.h
    MleSgmm2SpeakerAccs): accumulate over the speaker's aligned
    frames, then estimate() solves for v^(s) by damped Newton ascent
    on the exact auxiliary (mean term closed-form quadratic; weight
    term via the u-logit softmax when the model is symmetric)."""

    def __init__(self, model: AmSgmm2):
        if model.N is None:
            raise ValueError("model has no speaker subspace")
        T = model.spk_dim
        self.y_s = np.zeros(T)                     # linear term
        self.gamma_i = np.zeros(model.num_gauss)   # per-gaussian occ
        state_of, _, _, _, _ = model._pack()
        self.gamma = np.zeros((len(state_of), model.num_gauss))

    def accumulate(self, model: AmSgmm2, feats: np.ndarray,
                   states: Sequence[int],
                   spk_vec: Optional[np.ndarray] = None) -> None:
        """Posteriors at the current spk_vec (None = zero vector)."""
        state_of, logc, means, _, _ = model._pack()
        x = np.asarray(feats, np.float64)
        comp = model.component_log_likes(x, spk_vec) + logc[None, :, None]
        states = np.asarray(states)
        mask = state_of[None, :] == states[:, None]
        masked = np.where(mask[:, :, None], comp, -np.inf)
        tot = _logsumexp(masked.reshape(x.shape[0], -1), axis=1)
        post = np.exp(masked - tot[:, None, None])       # (T, JM, I)
        self._accumulate_post(model, x, post)

    def accumulate_from_gpost(self, model: AmSgmm2, feats: np.ndarray,
                              gpost) -> None:
        """Accumulate from precomputed gposts
        (sgmm2-est-spkvecs-gpost.cc)."""
        x = np.asarray(feats, np.float64)
        JM, I = self.gamma.shape
        post = np.zeros((x.shape[0], JM, I))
        for t, frame in enumerate(gpost):
            if t >= x.shape[0]:
                break
            for jm0, mat in frame:
                mat = np.asarray(mat, np.float64)
                post[t, jm0:jm0 + mat.shape[0]] += mat
        self._accumulate_post(model, x, post)

    def _accumulate_post(self, model: AmSgmm2, x: np.ndarray,
                         post: np.ndarray) -> None:
        _state_of, _logc, means, _, _ = model._pack()
        gi = post.sum(axis=1)                            # (Tt, I)
        self.gamma_i += gi.sum(0)
        self.gamma += post.sum(0)
        # y_s += sum_{t,m,i} post N_i' SigInv_i (x_t - mu_mi)
        NtS = np.einsum("idt,ide->ite", model.N, model.SigmaInv)  # (I,T,D)
        b = np.einsum("ti,td->id", gi, x)                # (I, D)
        c = np.einsum("mi,mid->id", post.sum(0), means)  # (I, D)
        self.y_s += np.einsum("ite,ie->t", NtS, b - c)

    def estimate(self, model: AmSgmm2,
                 start: Optional[np.ndarray] = None,
                 num_newton: int = 3) -> np.ndarray:
        T = model.spk_dim
        H = np.einsum("i,idt,ide,ies->ts", self.gamma_i, model.N,
                      model.SigmaInv, model.N, optimize=True)
        _, _, _, logw, _ = model._pack()
        gamma_m = self.gamma.sum(axis=1)                 # (JM,)

        def q(v):
            out = float(self.y_s @ v) - 0.5 * float(v @ H @ v)
            if model.u is not None:
                lg = logw + (model.u @ v)[None, :]
                lse = _logsumexp(lg, axis=1)
                base_lse = _logsumexp(logw, axis=1)      # = 0 rows
                out += float((self.gamma * (model.u @ v)[None, :]).sum()
                             - gamma_m @ (lse - base_lse))
            return out

        v = np.zeros(T) if start is None else np.asarray(start,
                                                         np.float64)
        for _ in range(num_newton):
            grad = self.y_s - H @ v
            hess = H.copy()
            if model.u is not None:
                lg = logw + (model.u @ v)[None, :]
                p = np.exp(lg - _logsumexp(lg, axis=1, keepdims=True))
                diff = self.gamma - gamma_m[:, None] * p
                grad = grad + model.u.T @ diff.sum(0)
                w_occ = (gamma_m[:, None] * p * (1.0 - p)).sum(0)
                hess = hess + (model.u.T * w_occ) @ model.u
            step = np.linalg.solve(hess + 1e-6 * np.eye(T), grad)
            q0, alpha = q(v), 1.0
            for _ in range(12):
                if q(v + alpha * step) >= q0:
                    v = v + alpha * step
                    break
                alpha *= 0.5
        return v


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


def _update_N(model: AmSgmm2, accs: MleAmSgmm2Accs) -> None:
    """Speaker projections N_i = Z_i R_i^{-1} (Sigma cancels, same
    shape as UpdateM; estimate-am-sgmm2.cc UpdateN)."""
    T = model.spk_dim
    for i in range(model.num_gauss):
        if np.trace(accs.R[i]) < 1e-3:
            continue
        ridge = 1e-6 * np.trace(accs.R[i]) / T * np.eye(T)
        model.N[i] = accs.Z[i] @ np.linalg.inv(accs.R[i] + ridge)
    model.invalidate()


def _update_u(model: AmSgmm2, accs: MleAmSgmm2Accs,
              max_step: float = 1.0) -> None:
    """Symmetric-SGMM speaker weight projections: one damped Newton
    step per EM iteration on the accumulated gradient/Fisher blocks
    (estimate-am-sgmm2.cc UpdateU uses the same quadratic
    approximation with a step cap)."""
    T = model.spk_dim
    for i in range(model.num_gauss):
        hess = accs.u_hess[i] + 1e-4 * np.eye(T)
        step = np.linalg.solve(hess, accs.u_grad[i])
        norm = float(np.linalg.norm(step))
        if norm > max_step:
            step *= max_step / norm
        model.u[i] = model.u[i] + step
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


def estimate_speaker_vectors(model: AmSgmm2,
                             feats_list: Sequence[np.ndarray],
                             states_list: Sequence[Sequence[int]],
                             speakers: Sequence[int],
                             prev: Optional[dict] = None) -> dict:
    """One speaker-vector pass: {spk: v^(s)} from each speaker's
    aligned utterances (posteriors at the previous vector)."""
    out: dict = {}
    for s in sorted(set(speakers)):
        sacc = MleSgmm2SpeakerAccs(model)
        start = None if prev is None else prev.get(s)
        for f, st, sp in zip(feats_list, states_list, speakers):
            if sp == s:
                sacc.accumulate(model, f, st, start)
        out[s] = sacc.estimate(model, start)
    return out


def train_sgmm2(ubm: FullGmm, feats_list: Sequence[np.ndarray],
                states_list: Sequence[Sequence[int]], num_states: int,
                opts: Optional[Sgmm2Options] = None,
                speakers: Optional[Sequence[int]] = None
                ) -> AmSgmm2:
    """EM training from aligned data (the sgmm2 recipe's
    align -> acc -> est loop at library level).  When `speakers`
    (one label per utterance) and opts.spk_dim are given, each
    iteration first re-estimates per-speaker vectors, then
    accumulates speaker-normalized stats and updates N (and u).
    Returns the model; the final speaker vectors are available via
    estimate_speaker_vectors at decode time (the reference's
    sgmm2-est-spkvecs)."""
    opts = opts or Sgmm2Options()
    model = AmSgmm2(ubm, num_states, opts.phn_dim)
    use_spk = speakers is not None and opts.spk_dim is not None
    spk_vecs: dict = {}
    if use_spk:
        model.init_speaker_subspace(opts.spk_dim, use_u=opts.use_u)
    for it in range(opts.num_iters):
        if use_spk and it > 0:     # iteration 0: v_s = 0 (UBM-like)
            spk_vecs = estimate_speaker_vectors(
                model, feats_list, states_list, speakers,
                spk_vecs or None)
        accs = MleAmSgmm2Accs(model)
        like = 0.0
        spks = speakers if use_spk else [None] * len(feats_list)
        for f, st, sp in zip(feats_list, states_list, spks):
            like += accs.accumulate(model, f, st,
                                    spk_vecs.get(sp) if use_spk else
                                    None)
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
        if use_spk:
            _update_N(model, accs)
            if model.u is not None:
                _update_u(model, accs)
    return model
