"""Round-3 CLI tail batch 5 (parity: src/ivectorbin
logistic-regression-train.cc, logistic-regression-eval.cc,
logistic-regression-copy.cc; src/bin compute-gop.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def logistic_regression_train(argv: List[str]) -> int:
    po = ParseOptions(
        "Train a multinomial logistic regression model on vectors "
        "(e.g. i-vectors for language id).\n"
        "Usage: logistic-regression-train [options] "
        "<vector-rspecifier> <utt2class-rspecifier> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    max_steps = po.register_value("max-steps", 200,
                                  "Optimization steps")
    normalizer = po.register_value("normalizer", 0.0025,
                                   "L2 regularization weight")
    mix_up = po.register_value("mix-up", 0,
                               "Target number of mixture components")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.logistic_regression import (
        LogisticRegressionConfig, train_logistic_regression)
    cls_reader = RandomAccessTableReader("int", po.get_arg(2))
    xs, ys = [], []
    for key, vec in SequentialTableReader("vector", po.get_arg(1)):
        if key not in cls_reader:
            warn(f"no class for {key}")
            continue
        xs.append(np.asarray(vec, np.float64))
        ys.append(int(cls_reader[key]))
    if not xs:
        warn("no training vectors")
        return 1
    cfg = LogisticRegressionConfig(max_steps=max_steps[0],
                                   normalizer=normalizer[0],
                                   mix_up=mix_up[0])
    model = train_logistic_regression(np.stack(xs), np.asarray(ys),
                                      cfg)
    kaldi_io.write_kaldi_object(model.write, po.get_arg(3), binary[0])
    return 0


def logistic_regression_eval(argv: List[str]) -> int:
    po = ParseOptions(
        "Evaluate a logistic regression model: write per-utterance "
        "class log-posterior vectors (apply --apply-log=false for "
        "posteriors).\n"
        "Usage: logistic-regression-eval [options] <model-in> "
        "<vector-rspecifier> <log-posterior-wspecifier>")
    apply_log = po.register_value("apply-log", True,
                                  "Write log-posteriors (else "
                                  "posteriors)")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.logistic_regression import LogisticRegression
    model = kaldi_io.read_kaldi_object(LogisticRegression.read,
                                       po.get_arg(1))
    writer = TableWriter("vector", po.get_arg(3))
    n = 0
    for key, vec in SequentialTableReader("vector", po.get_arg(2)):
        lp = model.log_posteriors(np.asarray(vec)[None, :])[0]
        writer.write(key, lp if apply_log[0] else np.exp(lp))
        n += 1
    writer.close()
    log(f"evaluated {n} vectors")
    return 0 if n else 1


def logistic_regression_copy(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy a logistic regression model, optionally scaling the "
        "class priors out of the offsets.\n"
        "Usage: logistic-regression-copy [options] <model-in> "
        "<model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    scale_priors = po.register_value(
        "scale-priors", "", "Colon-separated per-class prior scales "
        "applied to the offsets (log is added)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.logistic_regression import LogisticRegression
    model = kaldi_io.read_kaldi_object(LogisticRegression.read,
                                       po.get_arg(1))
    if scale_priors[0]:
        scales = [float(s) for s in scale_priors[0].split(":")]
        if len(scales) != model.num_classes:
            print("logistic-regression-copy: #scales must equal "
                  "#classes", flush=True)
            return 1
        for comp, cls in enumerate(model.class_of):
            model.weights[comp, -1] += np.log(max(scales[cls], 1e-30))
    kaldi_io.write_kaldi_object(model.write, po.get_arg(2), binary[0])
    return 0


def compute_gop(argv: List[str]) -> int:
    po = ParseOptions(
        "Compute Goodness of Pronunciation: GOP(phone segment) = "
        "LPP(p) - max_q LPP(q), LPP = mean log phone posterior over "
        "the segment (compute-gop.cc, Hu et al. 2015).  Writes one "
        "posterior-format entry per phone segment: [(phone, gop)]; "
        "with a 4th argument also writes per-segment phone-posterior "
        "feature vectors.\n"
        "Usage: compute-gop [options] <model-in> <ali-rspecifier> "
        "<prob-matrix-rspecifier> <gop-wspecifier> "
        "[<phone-feature-wspecifier>]")
    log_input = po.register_value(
        "log-input", True, "Input matrices are log-posteriors / "
        "loglikes (else raw posteriors)")
    po.read(argv)
    if po.num_args() < 4 or po.num_args() > 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    tm = _read_tm(po.get_arg(1))
    # pdf -> phone mass map (a pdf may serve several phones in shared
    # trees; mass is split uniformly among them like a flat phone LM)
    phones = sorted(tm.get_phones())
    phone_idx = {p: i for i, p in enumerate(phones)}
    P, Np = tm.num_pdfs, len(phones)
    pdf_phone = np.zeros((P, Np), np.float64)
    for ts in range(1, tm.num_transition_states + 1):
        ph = phone_idx[tm.transition_state_to_phone(ts)]
        pdf_phone[tm.transition_state_to_forward_pdf(ts), ph] = 1.0
        pdf_phone[tm.transition_state_to_self_loop_pdf(ts), ph] = 1.0
    pdf_phone /= np.maximum(pdf_phone.sum(axis=1, keepdims=True), 1.0)
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(2))
    gop_writer = TableWriter("posterior", po.get_arg(4))
    feat_writer = (TableWriter("matrix", po.get_arg(5))
                   if po.num_args() == 5 else None)
    n = err = 0
    for key, probs in SequentialTableReader("matrix", po.get_arg(3)):
        if key not in ali_reader:
            warn(f"no alignment for {key}")
            err += 1
            continue
        ali = ali_reader[key]
        probs = np.asarray(probs, np.float64)
        if log_input[0]:
            mx = probs.max(axis=1, keepdims=True)
            post = np.exp(probs - mx)
            post /= post.sum(axis=1, keepdims=True)
        else:
            post = probs / np.maximum(
                probs.sum(axis=1, keepdims=True), 1e-30)
        T = min(len(ali), post.shape[0])
        lpp = np.log(np.maximum(post[:T] @ pdf_phone, 1e-30))  # (T,Np)
        # phone segments from the alignment
        segs = []
        for t in range(T):
            ph = phone_idx[tm.transition_id_to_phone(int(ali[t]))]
            starts = (t == 0 or segs[-1][0] != ph
                      or (not tm.is_self_loop(int(ali[t]))
                          and tm.transition_id_to_hmm_state(
                              int(ali[t])) == 0
                          and tm.transition_id_to_hmm_state(
                              int(ali[t - 1])) != 0))
            if starts:
                segs.append([ph, t, 0])
            segs[-1][2] += 1
        gop = []
        feats = []
        for ph, start, dur in segs:
            seg_lpp = lpp[start:start + dur].mean(axis=0)
            g = float(seg_lpp[ph] - seg_lpp.max())
            gop.append([(phones[ph], g)])
            feats.append(seg_lpp)
        gop_writer.write(key, gop)
        if feat_writer:
            feat_writer.write(key, np.stack(feats))
        n += 1
    gop_writer.close()
    if feat_writer:
        feat_writer.close()
    log(f"computed GOP for {n} utterances ({err} errors)")
    return 0 if n else 1
