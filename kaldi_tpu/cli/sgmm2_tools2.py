"""SGMM2 tail (parity: src/sgmm2bin sgmm2-post-to-gpost.cc,
sgmm2-acc-stats-gpost.cc, sgmm2-acc-stats2.cc,
sgmm2-est-spkvecs-gpost.cc, sgmm2-comp-prexform.cc,
sgmm2-est-fmllr.cc (fmllr-sgmm2.cc), sgmm2-est-ebw.cc
(estimate-am-sgmm2-ebw.cc), sgmm2-project.cc)."""

from __future__ import annotations

from typing import BinaryIO, List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (Holder, RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


# -- Sgmm2GauPost container ---------------------------------------------------

def write_sgmm2_gpost(stream: BinaryIO, binary: bool, gpost) -> None:
    iof.write_int32(stream, binary, len(gpost))
    for frame in gpost:
        iof.write_int32(stream, binary, len(frame))
        for jm0, mat in frame:
            iof.write_int32(stream, binary, int(jm0))
            iof.write_matrix(stream, binary, np.asarray(mat, np.float32))


def read_sgmm2_gpost(stream: BinaryIO, binary: bool):
    T = iof.read_int32(stream, binary)
    out = []
    for _ in range(T):
        n = iof.read_int32(stream, binary)
        out.append([(iof.read_int32(stream, binary),
                     iof.read_matrix(stream, binary))
                    for _ in range(n)])
    return out


class Sgmm2GauPostHolder(Holder):
    def read(self, stream):
        binary = iof.init_input_stream(stream)
        return read_sgmm2_gpost(stream, binary)

    def write(self, stream, binary, value):
        write_sgmm2_gpost(stream, binary, value)


def sgmm2_post_to_gpost(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert state-level posteriors to SGMM2 substate/Gaussian "
        "level posteriors (sgmm2-post-to-gpost.cc).\n"
        "Usage: sgmm2-post-to-gpost [options] <model-in> "
        "<feature-rspecifier> <posteriors-rspecifier> "
        "<gpost-wspecifier>")
    spk_vecs_rs = po.register_value(
        "spk-vecs", "", "rspecifier for speaker vectors")
    utt2spk_rs = po.register_value(
        "utt2spk", "", "rspecifier for utterance-to-speaker map")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.sgmm2_tools import (_read_spk_vecs,
                                           _utt_spk_vec, read_am_sgmm2)
    from kaldi_tpu.sgmm2.am_sgmm2 import compute_gauss_post
    tm, am = read_am_sgmm2(po.get_arg(1))
    post_reader = RandomAccessTableReader("posterior", po.get_arg(3))
    vecs = _read_spk_vecs(spk_vecs_rs[0])
    utt2spk = (RandomAccessTableReader("token-vector", utt2spk_rs[0])
               if utt2spk_rs[0] else None)
    writer = TableWriter(Sgmm2GauPostHolder(), po.get_arg(4))
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in post_reader:
            err += 1
            continue
        post = post_reader[key]
        feats = np.asarray(feats)
        rows, states, wts = [], [], []
        for t, frame in enumerate(post):
            if t >= feats.shape[0]:
                break
            for tid, w in frame:
                if w == 0.0:
                    continue
                rows.append(t)
                states.append(tm.transition_id_to_pdf(int(tid)))
                wts.append(float(w))
        if not rows:
            err += 1
            continue
        sv = _utt_spk_vec(vecs, utt2spk, key)
        gp_rows, _like = compute_gauss_post(am, feats[rows], states,
                                            sv, weights=wts)
        # regroup expanded rows back onto original frames
        gpost = [[] for _ in range(feats.shape[0])]
        for r, t in enumerate(rows):
            gpost[t].extend(gp_rows[r])
        writer.write(key, gpost)
        n += 1
    writer.close()
    log(f"converted posteriors to gposts for {n} utterances "
        f"({err} errors)")
    return 0 if n else 1


def sgmm2_acc_stats_gpost(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate SGMM2 stats from precomputed gposts "
        "(sgmm2-acc-stats-gpost.cc).\n"
        "Usage: sgmm2-acc-stats-gpost [options] <model-in> "
        "<feature-rspecifier> <gpost-rspecifier> <stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    spk_vecs_rs = po.register_value(
        "spk-vecs", "", "rspecifier for speaker vectors")
    utt2spk_rs = po.register_value(
        "utt2spk", "", "rspecifier for utterance-to-speaker map")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.sgmm2_tools import (_read_spk_vecs,
                                           _utt_spk_vec, read_am_sgmm2)
    from kaldi_tpu.sgmm2.am_sgmm2 import MleAmSgmm2Accs
    tm, am = read_am_sgmm2(po.get_arg(1))
    gpost_reader = RandomAccessTableReader(Sgmm2GauPostHolder(),
                                           po.get_arg(3))
    vecs = _read_spk_vecs(spk_vecs_rs[0])
    utt2spk = (RandomAccessTableReader("token-vector", utt2spk_rs[0])
               if utt2spk_rs[0] else None)
    accs = MleAmSgmm2Accs(am)
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in gpost_reader:
            warn(f"no gpost for {key}")
            err += 1
            continue
        accs.accumulate_from_gpost(am, np.asarray(feats),
                                   gpost_reader[key],
                                   _utt_spk_vec(vecs, utt2spk, key))
        n += 1
    kaldi_io.write_kaldi_object(accs.write, po.get_arg(4), binary[0])
    log(f"accumulated stats from {n} gpost utterances ({err} errors)")
    return 0 if n else 1


def sgmm2_acc_stats2(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate numerator and denominator SGMM2 stats from "
        "signed posteriors (sgmm2-acc-stats2.cc; positive entries "
        "feed the num accs, negative the den accs).\n"
        "Usage: sgmm2-acc-stats2 [options] <model-in> "
        "<feature-rspecifier> <posteriors-rspecifier> "
        "<num-stats-out> <den-stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    spk_vecs_rs = po.register_value(
        "spk-vecs", "", "rspecifier for speaker vectors")
    utt2spk_rs = po.register_value(
        "utt2spk", "", "rspecifier for utterance-to-speaker map")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.sgmm2_tools import (_read_spk_vecs,
                                           _utt_spk_vec, read_am_sgmm2)
    from kaldi_tpu.sgmm2.am_sgmm2 import MleAmSgmm2Accs
    tm, am = read_am_sgmm2(po.get_arg(1))
    post_reader = RandomAccessTableReader("posterior", po.get_arg(3))
    vecs = _read_spk_vecs(spk_vecs_rs[0])
    utt2spk = (RandomAccessTableReader("token-vector", utt2spk_rs[0])
               if utt2spk_rs[0] else None)
    num_accs = MleAmSgmm2Accs(am)
    den_accs = MleAmSgmm2Accs(am)
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in post_reader:
            continue
        post = post_reader[key]
        feats = np.asarray(feats)
        sv = _utt_spk_vec(vecs, utt2spk, key)
        for sign, accs in ((1.0, num_accs), (-1.0, den_accs)):
            rows, states, wts = [], [], []
            for t, frame in enumerate(post):
                if t >= feats.shape[0]:
                    break
                for tid, w in frame:
                    if w * sign <= 0.0:
                        continue
                    rows.append(t)
                    states.append(tm.transition_id_to_pdf(int(tid)))
                    wts.append(abs(float(w)))
            if rows:
                accs.accumulate(am, feats[rows], states, sv,
                                weights=wts)
        n += 1
    kaldi_io.write_kaldi_object(num_accs.write, po.get_arg(4),
                                binary[0])
    kaldi_io.write_kaldi_object(den_accs.write, po.get_arg(5),
                                binary[0])
    log(f"accumulated num/den stats from {n} utterances "
        f"(num {num_accs.total_frames:.1f}, den "
        f"{den_accs.total_frames:.1f} frames)")
    return 0 if n else 1


def sgmm2_est_spkvecs_gpost(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate SGMM2 speaker vectors from precomputed gposts "
        "(sgmm2-est-spkvecs-gpost.cc).\n"
        "Usage: sgmm2-est-spkvecs-gpost [options] <model-in> "
        "<feature-rspecifier> <gpost-rspecifier> <vecs-wspecifier>")
    spk2utt_rs = po.register_value(
        "spk2utt", "", "rspecifier for speaker-to-utterance-list map")
    spk_vecs_rs = po.register_value(
        "spk-vecs", "", "rspecifier for previous speaker vectors")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.sgmm2_tools import _read_spk_vecs, read_am_sgmm2
    from kaldi_tpu.sgmm2.am_sgmm2 import MleSgmm2SpeakerAccs
    tm, am = read_am_sgmm2(po.get_arg(1))
    if am.N is None:
        warn("model has no speaker subspace")
        return 1
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(2))
    gpost_reader = RandomAccessTableReader(Sgmm2GauPostHolder(),
                                           po.get_arg(3))
    prev = _read_spk_vecs(spk_vecs_rs[0])
    writer = TableWriter("vector", po.get_arg(4))
    n = 0

    def estimate(spk_key, utts):
        nonlocal n
        sacc = MleSgmm2SpeakerAccs(am)
        start = (np.asarray(prev[spk_key])
                 if prev is not None and spk_key in prev else None)
        used = 0
        for u in utts:
            if u not in feats_reader or u not in gpost_reader:
                continue
            sacc.accumulate_from_gpost(am,
                                       np.asarray(feats_reader[u]),
                                       gpost_reader[u])
            used += 1
        if used:
            writer.write(spk_key, sacc.estimate(am, start))
            n += 1

    if spk2utt_rs[0]:
        for spk, utts in SequentialTableReader("token-vector",
                                               spk2utt_rs[0]):
            estimate(spk, list(utts))
    else:
        for utt in sorted(feats_reader.keys()):
            estimate(utt, [utt])
    writer.close()
    log(f"estimated speaker vectors for {n} speakers from gposts")
    return 0 if n else 1


# -- pre-transform / fMLLR ----------------------------------------------------

def _model_global_moments(am, occs):
    """Weighted global mean and within-class covariance over all
    substate Gaussians (fmllr-sgmm2.cc prexform computation)."""
    state_of, _logc, means, _, _ = am._pack()
    JM, I = means.shape[0], means.shape[1]
    # substate weights: occs per state spread by substate weights c
    w = np.zeros((JM, I))
    jm = 0
    for j in range(am.num_states):
        n_sub = am.v[j].shape[0]
        for m in range(n_sub):
            w[jm] = float(occs[j]) * float(am.c[j][m]) / I
            jm += 1
    tot = w.sum()
    w = w / max(tot, 1e-10)
    mu = np.einsum("mi,mid->d", w, means)
    # within = sum w_i Sigma_i + scatter of means
    wi = w.sum(axis=0)
    sigma = np.linalg.inv(am.SigmaInv)
    sigma_w = np.einsum("i,ide->de", wi, sigma)
    diff = means - mu[None, None, :]
    sigma_w = sigma_w + np.einsum("mi,mid,mie->de", w, diff, diff,
                                  optimize=True)
    return mu, sigma_w


def sgmm2_comp_prexform(argv: List[str]) -> int:
    po = ParseOptions(
        "Compute the fMLLR pre-transform (whitening of the model's "
        "global within-class distribution) and append it to the "
        "model (sgmm2-comp-prexform.cc).\n"
        "Usage: sgmm2-comp-prexform [options] <sgmm2-in> <occs-in> "
        "<sgmm2-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.sgmm2_tools import read_am_sgmm2
    tm, am = read_am_sgmm2(po.get_arg(1))
    occs = np.asarray(kaldi_io.read_kaldi_object(
        iof.read_vector, po.get_arg(2)), np.float64)
    if len(occs) != am.num_states:
        print(f"sgmm2-comp-prexform: occs dim {len(occs)} vs "
              f"{am.num_states} states", flush=True)
        return 1
    mu, sigma_w = _model_global_moments(am, occs)
    D = len(mu)
    L = np.linalg.cholesky(sigma_w + 1e-6 * np.eye(D))
    A = np.linalg.inv(L)                     # whitening
    b = -A @ mu
    pre = np.concatenate([A, b[:, None]], axis=1)       # (D, D+1)
    Ainv = L
    inv = np.concatenate([Ainv, mu[:, None]], axis=1)   # x = Ainv x' + mu

    def w(stream, b_):
        tm.write(stream, b_)
        am.write(stream, b_)
        iof.write_token(stream, b_, "<Sgmm2FmllrPreXform>")
        iof.write_matrix(stream, b_, pre)
        iof.write_matrix(stream, b_, inv)
        iof.write_token(stream, b_, "</Sgmm2FmllrPreXform>")

    kaldi_io.write_kaldi_object(w, po.get_arg(3), binary[0])
    log("computed fMLLR pre-transform (whitened global covariance)")
    return 0


def _read_prexform(path):
    from kaldi_tpu.hmm import TransitionModel
    from kaldi_tpu.sgmm2.am_sgmm2 import AmSgmm2
    with kaldi_io.input_stream(path) as f:
        binary = iof.init_input_stream(f)
        tm = TransitionModel.read(f, binary)
        am = AmSgmm2.read(f, binary)
        pre = inv = None
        try:
            iof.expect_token(f, binary, "<Sgmm2FmllrPreXform>")
            pre = np.asarray(iof.read_matrix(f, binary), np.float64)
            inv = np.asarray(iof.read_matrix(f, binary), np.float64)
            iof.expect_token(f, binary, "</Sgmm2FmllrPreXform>")
        except Exception:
            pre = inv = None
    return tm, am, pre, inv


class _PreXformShim:
    """Duck-typed diag GMM over one state's substate Gaussians in the
    pre-transformed (whitened) space, for FmllrDiagGmmAccs."""

    def __init__(self, means_pre):
        self._means = means_pre
        self.inv_vars = np.ones_like(means_pre)

    def get_means(self):
        return self._means


def sgmm2_est_fmllr(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate fMLLR transforms for an SGMM2, per utterance or "
        "per speaker (sgmm2-est-fmllr.cc).  Runs in the whitened "
        "pre-transform space (sgmm2-comp-prexform), where the "
        "model's within-class covariance is identity, then composes "
        "back to feature space.\n"
        "Usage: sgmm2-est-fmllr [options] <model-in> "
        "<feature-rspecifier> <post-rspecifier> <mats-wspecifier>")
    spk2utt_rs = po.register_value(
        "spk2utt", "", "rspecifier for speaker-to-utterance-list map")
    fmllr_min_count = po.register_value(
        "fmllr-min-count", 100.0, "Minimum count to estimate fMLLR")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
    tm, am, pre, inv = _read_prexform(po.get_arg(1))
    if pre is None:
        print("sgmm2-est-fmllr: model has no pre-transform; run "
              "sgmm2-comp-prexform first", flush=True)
        return 1
    state_of, _logc, means, _, _ = am._pack()
    D = am.dim
    A_pre, b_pre = pre[:, :D], pre[:, D]
    # per-state substate-mean shims in whitened space
    first_row = {}
    for row, j in enumerate(state_of):
        first_row.setdefault(int(j), row)
    post_reader = RandomAccessTableReader("posterior", po.get_arg(3))
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(2))
    writer = TableWriter("matrix", po.get_arg(4))
    n = 0

    def accumulate(accs, u):
        feats = np.asarray(feats_reader[u], np.float64)
        xw = feats @ A_pre.T + b_pre
        post = post_reader[u]
        for t, frame in enumerate(post):
            if t >= feats.shape[0]:
                break
            for tid, wgt in frame:
                if wgt == 0.0:
                    continue
                j = tm.transition_id_to_pdf(int(tid))
                jm0 = first_row[j]
                n_sub = am.v[j].shape[0]
                mu = means[jm0:jm0 + n_sub].reshape(-1, D)
                mu_w = mu @ A_pre.T + b_pre
                shim = _PreXformShim(mu_w)
                # gaussian posteriors in whitened space (unit vars)
                d2 = ((xw[t][None] - mu_w) ** 2).sum(-1)
                p = np.exp(-(d2 - d2.min()) / 2)
                p = p / p.sum() * wgt
                accs.accumulate_from_posteriors(shim, xw[t:t + 1],
                                                p[None, :])

    def groups():
        if spk2utt_rs[0]:
            for spk, utts in SequentialTableReader("token-vector",
                                                   spk2utt_rs[0]):
                yield spk, list(utts)
        else:
            for u in sorted(feats_reader.keys()):
                yield u, [u]

    for spk, utts in groups():
        accs = FmllrDiagGmmAccs(D)
        for u in utts:
            if u not in feats_reader or u not in post_reader:
                continue
            accumulate(accs, u)
        if accs.beta <= 0:
            continue
        Ww, _impr = accs.update(min_count=fmllr_min_count[0])
        # compose: x -> inv(W_w(pre(x)))
        Aw, bw = Ww[:, :D], Ww[:, D]
        A_inv, b_inv = inv[:, :D], inv[:, D]
        A_tot = A_inv @ Aw @ A_pre
        b_tot = A_inv @ (Aw @ b_pre + bw) + b_inv
        writer.write(spk, np.concatenate([A_tot, b_tot[:, None]],
                                         axis=1).astype(np.float32))
        n += 1
    writer.close()
    log(f"estimated {n} SGMM2 fMLLR transforms")
    return 0 if n else 1


def sgmm2_est_ebw(argv: List[str]) -> int:
    po = ParseOptions(
        "Discriminative (EBW) update of SGMM2 state vectors and "
        "substate weights from num/den stats "
        "(sgmm2-est-ebw.cc; estimate-am-sgmm2-ebw.cc — this "
        "implementation updates the v/c flags via smoothed "
        "num-minus-den statistics).\n"
        "Usage: sgmm2-est-ebw [options] <model-in> <num-stats-in> "
        "<den-stats-in> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    tau_v = po.register_value("tau-v", 50.0,
                              "Smoothing constant for vectors")
    cov_min_value = po.register_value(
        "cov-min-value", 0.5, "Accepted for compatibility")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.sgmm2_tools import read_am_sgmm2, write_am_sgmm2
    from kaldi_tpu.sgmm2.am_sgmm2 import (MleAmSgmm2Accs, _update_c,
                                          _update_v)
    tm, am = read_am_sgmm2(po.get_arg(1))
    num = kaldi_io.read_kaldi_object(MleAmSgmm2Accs.read, po.get_arg(2))
    den = kaldi_io.read_kaldi_object(MleAmSgmm2Accs.read, po.get_arg(3))
    # effective accs: num - den + smoothing towards the current model
    eff = MleAmSgmm2Accs(am)
    state_of, _logc, means, _, _ = am._pack()
    D_jm = tau_v[0] * num.gamma.sum(axis=1, keepdims=True) \
        / np.maximum(num.gamma.sum(), 1.0) + 1e-3
    smooth_gamma = D_jm * num.gamma \
        / np.maximum(num.gamma.sum(axis=1, keepdims=True), 1e-10)
    eff.gamma = num.gamma - den.gamma + smooth_gamma
    # smoothing first moments at the model's own means keeps v fixed
    # where there is no discriminative signal
    eff.y = num.y - den.y + smooth_gamma[:, :, None] * means
    eff.S = num.S - den.S
    neg = float((eff.gamma < 0).mean())
    if neg > 0:
        # floor negative effective occupancies (EBW safety)
        eff.y = np.where(eff.gamma[:, :, None] > 0, eff.y, 0.0)
        eff.gamma = np.maximum(eff.gamma, 0.0)
    _update_v(am, eff)
    _update_c(am, eff)
    write_am_sgmm2(po.get_arg(4), tm, am, binary[0])
    log(f"EBW-updated SGMM2 vectors/weights "
        f"({100 * neg:.1f}% occupancies floored)")
    return 0


def sgmm2_project(argv: List[str]) -> int:
    po = ParseOptions(
        "Project an SGMM2 to model a sub-range of a pre-LDA space "
        "(sgmm2-project.cc, predictive SGMMs): takes the full "
        "(square) LDA+MLLT matrix, keeps rows "
        "[--start-dim, --end-dim), and writes the projected model "
        "plus the projection matrix.\n"
        "Usage: sgmm2-project [options] <model-in> "
        "<lda-mllt-mat-in> <model-out> <new-projection-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    start_dim = po.register_value("start-dim", 0,
                                  "First kept dimension")
    end_dim = po.register_value("end-dim", -1,
                                "One past the last kept dimension "
                                "(-1 = model dim)")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.sgmm2_tools import read_am_sgmm2, write_am_sgmm2
    tm, am = read_am_sgmm2(po.get_arg(1))
    full = np.asarray(kaldi_io.read_kaldi_object(
        iof.read_matrix, po.get_arg(2)), np.float64)
    s, e = start_dim[0], (end_dim[0] if end_dim[0] > 0 else am.dim)
    if full.shape[0] < e or full.shape[1] not in (full.shape[0],
                                                  full.shape[0] + 1):
        print("sgmm2-project: bad LDA matrix shape "
              f"{full.shape} for range [{s},{e})", flush=True)
        return 1
    proj = full[s:e, :am.dim]                       # (d', D)
    # project model parameters: means live in M (per-gaussian bases)
    # and covariances in Sigma
    am.M = np.einsum("pd,ids->ips", proj, am.M)
    sigma = np.linalg.inv(am.SigmaInv)
    sigma_p = np.einsum("pd,ide,qe->ipq", proj, sigma, proj)
    am.SigmaInv = np.linalg.inv(
        sigma_p + 1e-6 * np.eye(sigma_p.shape[-1])[None])
    if am.N is not None:
        am.N = np.einsum("pd,idt->ipt", proj, am.N)
    am.invalidate()
    write_am_sgmm2(po.get_arg(3), tm, am, binary[0])
    kaldi_io.write_kaldi_object(
        lambda st, b_: iof.write_matrix(st, b_,
                                        proj.astype(np.float32)),
        po.get_arg(4), binary[0])
    log(f"projected SGMM2 to dims [{s},{e}) of the pre-LDA space")
    return 0
