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


def draw_tree(argv: List[str]) -> int:
    po = ParseOptions(
        "Write a decision tree in GraphViz dot format (draw-tree.cc; "
        "pipe into `dot -Tps`).\n"
        "Usage: draw-tree [options] <phones-symbol-table|-> <tree-in>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.tree.context_dep import ContextDependency
    from kaldi_tpu.tree.event_map import (ConstantEventMap,
                                          SplitEventMap, TableEventMap)
    names = {}
    if po.get_arg(1) != "-":
        with open(po.get_arg(1)) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    names[int(parts[1])] = parts[0]
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      po.get_arg(2))
    lines = ["digraph tree {", "node [shape=box];"]
    counter = [0]

    def phone_name(v):
        return names.get(v, str(v))

    def walk(node) -> int:
        nid = counter[0]
        counter[0] += 1
        if node is None:
            lines.append(f"n{nid} [label=\"NULL\"];")
        elif isinstance(node, ConstantEventMap):
            lines.append(f"n{nid} [label=\"pdf {node.answer}\" "
                         "shape=ellipse];")
        elif isinstance(node, SplitEventMap):
            ys = " ".join(phone_name(v) for v in node.yes_set[:12])
            more = "..." if len(node.yes_set) > 12 else ""
            lines.append(
                f"n{nid} [label=\"key {node.key} in "
                f"{{{ys}{more}}}?\"];")
            y = walk(node.yes)
            n = walk(node.no)
            lines.append(f"n{nid} -> n{y} [label=\"yes\"];")
            lines.append(f"n{nid} -> n{n} [label=\"no\"];")
        elif isinstance(node, TableEventMap):
            lines.append(f"n{nid} [label=\"table on key "
                         f"{node.key}\"];")
            for v, child in enumerate(node.table):
                if child is None:
                    continue
                c = walk(child)
                lines.append(f"n{nid} -> n{c} "
                             f"[label=\"{phone_name(v)}\"];")
        else:
            lines.append(f"n{nid} [label=\"{type(node).__name__}\"];")
        return nid

    walk(tree.to_pdf)
    lines.append("}")
    print("\n".join(lines))
    return 0


def extend_wav_with_silence(argv: List[str]) -> int:
    po = ParseOptions(
        "Append (and prepend) silence to waveforms "
        "(extend-wav-with-silence.cc).\n"
        "Usage: extend-wav-with-silence [options] <wav-rspecifier> "
        "<wav-wspecifier>")
    extra = po.register_value("extra-silence-length", 1.0,
                              "Seconds of silence to append")
    prepend = po.register_value("prepend", False,
                                "Also prepend the same amount")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.feat.wave import WaveData
    writer = TableWriter("wave", po.get_arg(2))
    n = 0
    for key, wav in SequentialTableReader("wave", po.get_arg(1)):
        fs = wav.samp_freq
        pad = np.zeros((wav.data.shape[0], int(extra[0] * fs)),
                       np.float32)
        parts = ([pad, wav.data, pad] if prepend[0]
                 else [wav.data, pad])
        writer.write(key, WaveData(fs, np.concatenate(parts, axis=1)))
        n += 1
    writer.close()
    log(f"extended {n} waveforms by {extra[0]}s of silence")
    return 0 if n else 1


def nnet3_xvector_get_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Get x-vector training examples: fixed-length feature chunks "
        "labeled with the utterance's speaker id "
        "(nnet3-xvector-get-egs.cc).  Targets are one (spk-id, 1.0) "
        "posterior entry per chunk.\n"
        "Usage: nnet3-xvector-get-egs [options] <feats-rspecifier> "
        "<utt2spkid-rspecifier (int)> <egs-wspecifier>")
    frames_per_chunk = po.register_value("frames-per-chunk", 100,
                                         "Chunk length in frames")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.egs import ExampleHolder, NnetExample
    spk_reader = RandomAccessTableReader("int", po.get_arg(2))
    writer = TableWriter(ExampleHolder(), po.get_arg(3))
    n = err = 0
    k = frames_per_chunk[0]
    for key, feats in SequentialTableReader("matrix", po.get_arg(1)):
        if key not in spk_reader:
            warn(f"no speaker id for {key}")
            err += 1
            continue
        spk = int(spk_reader[key])
        f = np.asarray(feats)
        for i, t0 in enumerate(range(0, f.shape[0] - k + 1, k)):
            writer.write(f"{key}-{i}",
                         NnetExample(f[t0:t0 + k], [[(spk, 1.0)]]))
            n += 1
    writer.close()
    log(f"generated {n} x-vector chunks ({err} errors)")
    return 0 if n else 1


def sum_lda_accs(argv: List[str]) -> int:
    po = ParseOptions(
        "Sum LDA accumulators (sum-lda-accs.cc).\n"
        "Usage: sum-lda-accs [options] <stats-out> <stats-in1> ...")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.transform.lda import LdaEstimate
    total = None
    for i in range(2, po.num_args() + 1):
        acc = kaldi_io.read_kaldi_object(LdaEstimate.read, po.get_arg(i))
        if total is None:
            total = acc
        else:
            total.add(acc)
    kaldi_io.write_kaldi_object(total.write, po.get_arg(1), binary[0])
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
