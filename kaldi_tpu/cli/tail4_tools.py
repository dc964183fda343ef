"""Round-3 CLI tail, batch 2: posterior utilities, model/tree copy,
matrix utilities (parity: bin/{copy-post,scale-post,sum-post,
weight-post,post-to-pdf-post,post-to-phone-post,matrix-dim,
copy-transition-model,show-transitions}.cc, featbin/extract-rows.cc,
gmmbin/gmm-copy.cc, bin/copy-tree.cc)."""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from kaldi_tpu.base.logging import log
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def _each_post(rspec, wspec, fn, name):
    n = 0
    with TableWriter("posterior", wspec) as w:
        for key, post in SequentialTableReader("posterior", rspec):
            out = fn(key, post)
            if out is not None:
                w.write(key, out)
                n += 1
    log(f"{name}: {n} utterances")
    return 0


def copy_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy archives of posteriors, with optional scaling\n"
        "Usage: copy-post <post-rspecifier> <post-wspecifier>")
    scale = po.register_value("scale", 1.0, "Scaling factor")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    s = float(scale[0])
    return _each_post(
        po.get_arg(1), po.get_arg(2),
        lambda k, post: [[(i, p * s) for i, p in frame]
                         for frame in post], "copy-post")


def scale_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Scale posteriors with either a global scale or per-utterance "
        "scales from a table\n"
        "Usage: scale-post <post-rspecifier> "
        "<scale-rspecifier|scale> <post-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    arg2 = po.get_arg(2)
    try:
        gscale = float(arg2)
        scales = None
    except ValueError:
        gscale = None
        scales = RandomAccessTableReader("float", arg2)

    def fn(key, post):
        if gscale is not None:
            s = gscale
        else:
            if key not in scales:
                return None
            s = float(scales[key])
        return [[(i, p * s) for i, p in frame] for frame in post]
    return _each_post(po.get_arg(1), po.get_arg(3), fn, "scale-post")


def sum_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Sum two archives of posteriors frame by frame\n"
        "Usage: sum-post <post-rspecifier1> <post-rspecifier2> "
        "<post-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    second = RandomAccessTableReader("posterior", po.get_arg(2))

    def fn(key, post):
        if key not in second:
            return None
        other = second[key]
        out = []
        for t in range(max(len(post), len(other))):
            acc = {}
            for src in (post[t] if t < len(post) else [],
                        other[t] if t < len(other) else []):
                for i, p in src:
                    acc[i] = acc.get(i, 0.0) + p
            out.append(sorted(acc.items()))
        return out
    return _each_post(po.get_arg(1), po.get_arg(3), fn, "sum-post")


def weight_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Weight posteriors by per-frame weights from a vector table\n"
        "Usage: weight-post <post-rspecifier> <weights-rspecifier> "
        "<post-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    weights = RandomAccessTableReader("vector", po.get_arg(2))

    def fn(key, post):
        if key not in weights:
            return None
        w = np.asarray(weights[key])
        return [[(i, p * float(w[t])) for i, p in frame]
                if t < len(w) else [] for t, frame in enumerate(post)]
    return _each_post(po.get_arg(1), po.get_arg(3), fn, "weight-post")


def _map_post(rspec, wspec, model_rx, mapper, name):
    # any model file starting with a TransitionModel works (gmm .mdl,
    # chain .mdl — the reference binaries read the same prefix)
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.util import kaldi_io
    tm = kaldi_io.read_kaldi_object(TransitionModel.read, model_rx)
    return _each_post(
        rspec, wspec,
        lambda k, post: [_merge([(mapper(tm, i), p) for i, p in frame])
                         for frame in post], name)


def _merge(pairs):
    acc = {}
    for i, p in pairs:
        acc[i] = acc.get(i, 0.0) + p
    return sorted(acc.items())


def post_to_pdf_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert posteriors over transition-ids to posteriors over "
        "pdf-ids\n"
        "Usage: post-to-pdf-post <model> <post-rspecifier> "
        "<post-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    return _map_post(po.get_arg(2), po.get_arg(3), po.get_arg(1),
                     lambda tm, tid: tm.transition_id_to_pdf(tid),
                     "post-to-pdf-post")


def post_to_phone_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert posteriors over transition-ids to posteriors over "
        "phones\n"
        "Usage: post-to-phone-post <model> <post-rspecifier> "
        "<post-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    return _map_post(po.get_arg(2), po.get_arg(3), po.get_arg(1),
                     lambda tm, tid: tm.transition_id_to_phone(tid),
                     "post-to-phone-post")


def matrix_dim(argv: List[str]) -> int:
    po = ParseOptions(
        "Print dimension info of matrices in an archive\n"
        "Usage: matrix-dim <matrix-rspecifier>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    for key, mat in SequentialTableReader("matrix", po.get_arg(1)):
        print(f"{key}\t{mat.shape[0]}\t{mat.shape[1]}")
    return 0


def matrix_scale(argv: List[str]) -> int:
    po = ParseOptions(
        "Scale matrices, or archives of matrices\n"
        "Usage: matrix-scale [options] <matrix-rspecifier> "
        "<matrix-wspecifier>")
    scale = po.register_value("scale", 1.0, "Scaling factor")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    n = 0
    with TableWriter("matrix", po.get_arg(2)) as w:
        for key, mat in SequentialTableReader("matrix", po.get_arg(1)):
            w.write(key, np.asarray(mat) * scale[0])
            n += 1
    log(f"matrix-scale: {n} matrices")
    return 0


def extract_rows(argv: List[str]) -> int:
    po = ParseOptions(
        "Extract row ranges of matrices: each line of <range-file> is "
        "'<new-key> <old-key> <start> <end>' (end exclusive).\n"
        "Usage: extract-rows <range-file> <matrix-rspecifier> "
        "<matrix-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    mats = RandomAccessTableReader("matrix", po.get_arg(2))
    n = 0
    with TableWriter("matrix", po.get_arg(3)) as w:
        with open(po.get_arg(1)) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 4:
                    continue
                new, old, s, e = (parts[0], parts[1], int(parts[2]),
                                  int(parts[3]))
                if old not in mats:
                    continue
                m = np.asarray(mats[old])
                w.write(new, m[s:e])
                n += 1
    log(f"extract-rows: {n} ranges")
    return 0


def gmm_copy(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy GMM-based model (possibly changing binary/text mode)\n"
        "Usage: gmm-copy [options] <model-in> <model-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm, write_am_gmm
    tm, am = read_am_gmm(po.get_arg(1))
    write_am_gmm(po.get_arg(2), tm, am, binary=bool(binary[0]))
    return 0


def copy_transition_model(argv: List[str]) -> int:
    po = ParseOptions(
        "Copies a transition model (e.g. to extract it from an "
        "acoustic model file)\n"
        "Usage: copy-transition-model [options] "
        "<transition-model-or-model-in> <transition-model-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.util import kaldi_io
    tm = kaldi_io.read_kaldi_object(TransitionModel.read, po.get_arg(1))
    kaldi_io.write_kaldi_object(tm.write, po.get_arg(2),
                                binary=bool(binary[0]))
    return 0


def copy_tree(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy decision tree (possibly changing binary/text mode)\n"
        "Usage: copy-tree [options] <tree-in> <tree-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.tree.context_dep import ContextDependency
    from kaldi_tpu.util import kaldi_io
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      po.get_arg(1))
    kaldi_io.write_kaldi_object(tree.write, po.get_arg(2),
                                binary=bool(binary[0]))
    return 0


def show_transitions(argv: List[str]) -> int:
    po = ParseOptions(
        "Print debugging info from the transition model\n"
        "Usage: show-transitions <phones-symbol-table|-> <model-file>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    names = {}
    if po.get_arg(1) != "-":
        with open(po.get_arg(1)) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    names[int(parts[1])] = parts[0]
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.util import kaldi_io
    tm = kaldi_io.read_kaldi_object(TransitionModel.read, po.get_arg(2))
    import math
    for ts in range(1, tm.num_transition_states + 1):
        ph = tm.transition_state_to_phone(ts)
        print(f"Transition-state {ts}: phone = {names.get(ph, ph)} "
              f"pdf = {tm.transition_state_to_forward_pdf(ts)}")
        for idx in range(tm.num_transition_indices(ts)):
            tid = tm.pair_to_transition_id(ts, idx)
            p = math.exp(tm.get_transition_log_prob(tid))
            print(f" Transition-id = {tid} p = {p:.3f}")
    return 0
