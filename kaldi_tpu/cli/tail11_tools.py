"""Round-3 CLI tail batch 9 (parity: src/gmmbin gmm-est-map.cc,
gmm-acc-stats.cc, gmm-decode-faster.cc, gmm-align.cc,
gmm-transform-means.cc, gmm-transform-means-global.cc,
fgmm-global-get-frame-likes.cc; src/bin train-transitions.cc,
paste-post.cc; src/nnet3bin nnet3-am-info.cc; src/latbin
lattice-expand-ngram.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def gmm_est_map(argv: List[str]) -> int:
    po = ParseOptions(
        "MAP re-estimation of GMM means (and optionally weights) "
        "from accumulated stats: mu = (tau mu0 + x) / (tau + gamma) "
        "(gmm-est-map.cc).\n"
        "Usage: gmm-est-map [options] <model-in> <stats-in> "
        "<model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    mean_tau = po.register_value("mean-tau", 10.0,
                                 "Smoothing constant for means")
    weight_tau = po.register_value("weight-tau", 10.0,
                                   "Smoothing constant for weights "
                                   "(0 = keep old weights)")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm, write_am_gmm
    from kaldi_tpu.gmm.mle import AccumAmDiagGmm
    tm, am = read_am_gmm(po.get_arg(1))
    accs = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read,
                                      po.get_arg(2))
    tot = 0.0
    for pdf in range(am.num_pdfs):
        g = am.get_pdf(pdf)
        a = accs.accs[pdf]
        mu0 = g.get_means()
        gamma = a.occupancy
        mu = (mean_tau[0] * mu0 + a.mean_accs) / \
            (mean_tau[0] + gamma[:, None])
        w = g.weights
        if weight_tau[0] > 0 and gamma.sum() > 0:
            w = gamma + weight_tau[0] * g.weights
            w = w / w.sum()
        g.set_from_means_and_vars(w, mu, g.get_vars())
        tot += float(gamma.sum())
    am.invalidate_pack()
    write_am_gmm(po.get_arg(3), tm, am, binary[0])
    log(f"MAP-updated {am.num_pdfs} pdfs from {tot:.0f} frames of "
        "stats")
    return 0


def gmm_acc_stats(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate GMM stats from (transition-id) POSTERIORS "
        "(gmm-acc-stats.cc; soft counts, vs gmm-acc-stats-ali's "
        "Viterbi alignment).\n"
        "Usage: gmm-acc-stats [options] <model-in> <feats-rspecifier> "
        "<posteriors-rspecifier> <stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.gmm.mle import AccumAmDiagGmm
    tm, am = read_am_gmm(po.get_arg(1))
    post_reader = RandomAccessTableReader("posterior", po.get_arg(3))
    acc = AccumAmDiagGmm(am, num_transition_ids=tm.num_transition_ids)
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in post_reader:
            warn(f"no posteriors for {key}")
            err += 1
            continue
        acc.accumulate_posterior(am, tm, np.asarray(feats),
                                 post_reader[key])
        n += 1
    kaldi_io.write_kaldi_object(acc.write, po.get_arg(4), binary[0])
    log(f"accumulated stats from {n} utterances ({err} errors)")
    return 0 if n else 1


def gmm_decode_faster(argv: List[str]) -> int:
    po = ParseOptions(
        "Best-path decode with a GMM model (gmm-decode-faster.cc; "
        "the lattice-free cousin of gmm-latgen-faster).\n"
        "Usage: gmm-decode-faster [options] <model-in> <fst-in> "
        "<feature-rspecifier> <words-wspecifier> "
        "[<alignments-wspecifier>]")
    from kaldi_tpu.decoder.viterbi import FasterDecoder, \
        FasterDecoderOptions
    dopts = FasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() < 4 or po.num_args() > 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    tm, am = read_am_gmm(po.get_arg(1))
    hclg = read_fst_file(po.get_arg(2))
    word_writer = TableWriter("int-vector", po.get_arg(4))
    ali_writer = (TableWriter("int-vector", po.get_arg(5))
                  if po.num_args() == 5 else None)
    dec = FasterDecoder(hclg, dopts)
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(3)):
        ll = am.log_likes_batch(feats)
        res = dec.decode(np.asarray(ll), tm.id2pdf_id,
                         acoustic_scale[0])
        if res is None:
            warn(f"decode failed for {key}")
            err += 1
            continue
        word_writer.write(key, res[1])
        if ali_writer:
            ali_writer.write(key, res[0])
        n += 1
    word_writer.close()
    if ali_writer:
        ali_writer.close()
    log(f"decoded {n} utterances ({err} failed)")
    return 0 if n else 1


def gmm_align(argv: List[str]) -> int:
    po = ParseOptions(
        "Align features to transcripts, compiling training graphs "
        "on the fly from a lexicon FST (gmm-align.cc = "
        "compile-train-graphs + gmm-align-compiled in one).\n"
        "Usage: gmm-align [options] <tree-in> <model-in> "
        "<lexicon-fst-in> <feature-rspecifier> "
        "<transcriptions-rspecifier (int words)> "
        "<alignments-wspecifier>")
    beam = po.register_value("beam", 10.0, "Decoding beam")
    retry_beam = po.register_value("retry-beam", 40.0,
                                   "Beam for the second attempt")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    transition_scale = po.register_value(
        "transition-scale", 1.0, "Scale on transition probabilities")
    self_loop_scale = po.register_value(
        "self-loop-scale", 0.1, "Scale on self-loop probabilities")
    po.read(argv)
    if po.num_args() != 6:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.decoder.graph import compile_graph_from_lexicon_fst
    from kaldi_tpu.decoder.viterbi import FasterDecoder, \
        FasterDecoderOptions
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.tree.context_dep import ContextDependency
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      po.get_arg(1))
    tm, am = read_am_gmm(po.get_arg(2))
    lex = read_fst_file(po.get_arg(3))
    trans_reader = RandomAccessTableReader("int-vector", po.get_arg(5))
    writer = TableWriter("int-vector", po.get_arg(6))
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(4)):
        if key not in trans_reader:
            warn(f"no transcript for {key}")
            err += 1
            continue
        words = [int(w) for w in trans_reader[key]]
        graph = compile_graph_from_lexicon_fst(
            lex, words, tm, tree, transition_scale[0],
            self_loop_scale[0])
        ll = am.log_likes_batch(feats)
        res = FasterDecoder(graph, FasterDecoderOptions(
            beam=beam[0])).decode(np.asarray(ll), tm.id2pdf_id,
                                  acoustic_scale[0])
        if res is None and retry_beam[0] > beam[0]:
            res = FasterDecoder(graph, FasterDecoderOptions(
                beam=retry_beam[0])).decode(np.asarray(ll),
                                            tm.id2pdf_id,
                                            acoustic_scale[0])
        if res is None:
            warn(f"alignment failed for {key}")
            err += 1
            continue
        writer.write(key, res[0])
        n += 1
    writer.close()
    log(f"aligned {n} utterances ({err} failed)")
    return 0 if n else 1


def _transform_means(am, mat: np.ndarray) -> None:
    D = am.dim
    A, b = (mat[:, :D], mat[:, D]) if mat.shape[1] == D + 1 else \
        (mat, np.zeros(D))
    for pdf in range(am.num_pdfs):
        g = am.get_pdf(pdf)
        mu = g.get_means() @ A.T + b
        g.set_from_means_and_vars(g.weights, mu, g.get_vars())
    am.invalidate_pack()


def gmm_transform_means(argv: List[str]) -> int:
    po = ParseOptions(
        "Apply a linear/affine transform to all GMM means (e.g. after "
        "est-mllt; gmm-transform-means.cc).\n"
        "Usage: gmm-transform-means [options] <transform-rxfilename> "
        "<model-in> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm, write_am_gmm
    mat = np.asarray(kaldi_io.read_kaldi_object(iof.read_matrix,
                                                po.get_arg(1)),
                     np.float64)
    tm, am = read_am_gmm(po.get_arg(2))
    _transform_means(am, mat)
    write_am_gmm(po.get_arg(3), tm, am, binary[0])
    log(f"transformed means of {am.num_pdfs} pdfs")
    return 0


def gmm_transform_means_global(argv: List[str]) -> int:
    po = ParseOptions(
        "Apply a linear/affine transform to a single GMM's means "
        "(gmm-transform-means-global.cc).\n"
        "Usage: gmm-transform-means-global [options] "
        "<transform-rxfilename> <gmm-in> <gmm-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    mat = np.asarray(kaldi_io.read_kaldi_object(iof.read_matrix,
                                                po.get_arg(1)),
                     np.float64)
    gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(2))
    D = gmm.dim
    A, b = (mat[:, :D], mat[:, D]) if mat.shape[1] == D + 1 else \
        (mat, np.zeros(D))
    gmm.set_from_means_and_vars(gmm.weights,
                                gmm.get_means() @ A.T + b,
                                gmm.get_vars())
    kaldi_io.write_kaldi_object(gmm.write, po.get_arg(3), binary[0])
    return 0


def fgmm_global_get_frame_likes(argv: List[str]) -> int:
    po = ParseOptions(
        "Per-frame log-likelihoods under a full-covariance GMM "
        "(fgmm-global-get-frame-likes.cc).\n"
        "Usage: fgmm-global-get-frame-likes [options] <model-in> "
        "<feats-rspecifier> <likes-wspecifier>")
    average = po.register_value("average", False,
                                "Write per-utterance averages")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.full_gmm import FullGmm
    gmm = kaldi_io.read_kaldi_object(FullGmm.read, po.get_arg(1))
    writer = TableWriter("float" if average[0] else "vector",
                         po.get_arg(3))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        ll = gmm.log_likelihood(np.asarray(feats, np.float32))
        writer.write(key, float(np.mean(ll)) if average[0]
                     else np.asarray(ll, np.float32))
        n += 1
    writer.close()
    log(f"frame likes for {n} utterances")
    return 0 if n else 1


def train_transitions(argv: List[str]) -> int:
    po = ParseOptions(
        "Re-estimate HMM transition probabilities from alignments "
        "(train-transitions.cc / nnet3-am-train-transitions.cc).\n"
        "Usage: train-transitions [options] <model-in> "
        "<ali-rspecifier> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    transition_floor = po.register_value(
        "transition-floor", 0.01, "Probability floor")
    transition_min_count = po.register_value(
        "transition-min-count", 5.0, "Minimum state count to update")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.base.io_funcs import init_input_stream
    from kaldi_tpu.hmm.transition_model import TransitionModel
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        b = init_input_stream(f)
        tm = TransitionModel.read(f, b)
        rest = f.read()            # whatever AM follows, byte-preserved
    stats = np.zeros(tm.num_transition_ids + 1, np.float64)
    n = 0
    for _key, ali in SequentialTableReader("int-vector", po.get_arg(2)):
        np.add.at(stats, np.asarray(ali, np.int64), 1.0)
        n += 1
    impr, count = tm.mle_update(stats, floor=transition_floor[0],
                                min_count=transition_min_count[0])

    def w(stream, b_):
        tm.write(stream, b_)
        stream.write(rest)

    kaldi_io.write_kaldi_object(w, po.get_arg(3), binary[0])
    log(f"transition update from {n} alignments: impr/frame "
        f"{impr:.4f} over {count:.0f} frames")
    return 0 if n else 1


def nnet3_am_info(argv: List[str]) -> int:
    po = ParseOptions(
        "Print information about an nnet3 acoustic model "
        "(nnet3-am-info.cc).\n"
        "Usage: nnet3-am-info <model-in>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_any
    tm, graph, info = read_nnet3_any(po.get_arg(1))
    if tm is not None:
        print(f"number of pdfs {tm.num_pdfs}")
        print(f"number of transition-ids {tm.num_transition_ids}")
    print(f"num-components {len(graph.components)}")
    print(f"num-nodes {len(graph.nodes)}")
    for k, v in (info or {}).items():
        print(f"{k} {v}")
    for name, comp in list(graph.components.items())[:200]:
        print(f"component name={name} type={type(comp).TYPE}")
    return 0


def paste_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Paste posteriors from multiple archives frame by frame, "
        "offsetting each source's ids by the preceding sources' "
        "dims (paste-post.cc; used to build multi-output targets).\n"
        "Usage: paste-post <post1-rspecifier> <dim1> "
        "<post2-rspecifier> <dim2> ... <post-wspecifier>")
    po.read(argv)
    if po.num_args() < 5 or po.num_args() % 2 == 0:
        po.print_usage()
        return 1
    n_src = (po.num_args() - 1) // 2
    rspecs = [po.get_arg(2 * i + 1) for i in range(n_src)]
    dims = [int(po.get_arg(2 * i + 2)) for i in range(n_src)]
    extras = [RandomAccessTableReader("posterior", r)
              for r in rspecs[1:]]
    writer = TableWriter("posterior", po.get_arg(po.num_args()))
    n = err = 0
    for key, post in SequentialTableReader("posterior", rspecs[0]):
        parts = [post]
        ok = True
        for r in extras:
            if key not in r:
                ok = False
                break
            parts.append(r[key])
        if not ok or any(len(p) != len(post) for p in parts):
            warn(f"missing/mismatched posteriors for {key}")
            err += 1
            continue
        out = []
        for t in range(len(post)):
            frame = []
            off = 0
            for p, d in zip(parts, dims):
                frame.extend((pid + off, w) for pid, w in p[t])
                off += d
            out.append(frame)
        writer.write(key, out)
        n += 1
    writer.close()
    log(f"pasted posteriors for {n} utterances ({err} errors)")
    return 0 if n else 1


def lattice_expand_ngram(argv: List[str]) -> int:
    po = ParseOptions(
        "Expand lattice states so every state has a unique word "
        "n-gram history of order n-1 (lattice-expand-ngram.cc; "
        "needed before per-state n-gram operations).\n"
        "Usage: lattice-expand-ngram [options] <lattice-rspecifier> "
        "<lattice-wspecifier>")
    n_opt = po.register_value("n", 3, "N-gram order (history n-1)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.fst import Arc, EPS, LatticeWeight, VectorFst
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    hist_len = max(0, n_opt[0] - 1)
    writer = TableWriter(LatticeHolder(), po.get_arg(2))
    n = 0
    tot_in = tot_out = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(1)):
        out = VectorFst(LatticeWeight)
        smap = {}
        work = []

        def get(key_):
            if key_ not in smap:
                smap[key_] = out.add_state()
                work.append(key_)
            return smap[key_]

        out.set_start(get((lat.start, ())))
        while work:
            s, hist = work.pop()
            cur = smap[(s, hist)]
            out.finals[cur] = lat.finals[s]
            for a in lat.arcs[s]:
                nh = hist if a.olabel == EPS else \
                    (hist + (a.olabel,))[-hist_len:] if hist_len \
                    else ()
                out.add_arc(cur, Arc(a.ilabel, a.olabel, a.weight,
                                     get((a.nextstate, nh))))
        tot_in += lat.num_states
        tot_out += out.num_states
        writer.write(key, out)
        n += 1
    writer.close()
    log(f"expanded {n} lattices: {tot_in} -> {tot_out} states "
        f"(order {n_opt[0]})")
    return 0 if n else 1
