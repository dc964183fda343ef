"""Round-3 CLI tail batch 10 (parity: src/bin align-equal.cc,
compile-train-graphs-fsts.cc; src/gmmbin gmm-init-model-flat.cc,
gmm-global-gselect-to-post.cc, fgmm-global-gselect-to-post.cc,
fgmm-global-acc-stats-post.cc; src/ivectorbin ivector-extractor-copy.cc,
ivector-randomize.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def align_equal(argv: List[str]) -> int:
    po = ParseOptions(
        "Equally-spaced alignments, compiling graphs on the fly "
        "(align-equal.cc = compile-train-graphs + "
        "align-equal-compiled).\n"
        "Usage: align-equal [options] <tree-in> <model-in> "
        "<lexicon-fst-in> <features-rspecifier> "
        "<transcriptions-rspecifier> <alignments-wspecifier>")
    po.read(argv)
    if po.num_args() != 6:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.decoder.graph import compile_graph_from_lexicon_fst
    from kaldi_tpu.decoder.viterbi import align_equal as eq
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.tree.context_dep import ContextDependency
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      po.get_arg(1))
    tm = _read_tm(po.get_arg(2))
    lex = read_fst_file(po.get_arg(3))
    trans_reader = RandomAccessTableReader("int-vector", po.get_arg(5))
    writer = TableWriter("int-vector", po.get_arg(6))
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(4)):
        if key not in trans_reader:
            warn(f"no transcript for {key}")
            err += 1
            continue
        graph = compile_graph_from_lexicon_fst(
            lex, [int(w) for w in trans_reader[key]], tm, tree)
        ali = eq(graph, feats.shape[0], tm)
        if ali is None:
            warn(f"could not align {key} (too short?)")
            err += 1
            continue
        writer.write(key, ali)
        n += 1
    writer.close()
    log(f"equal-aligned {n} utterances ({err} failed)")
    return 0 if n else 1


def compile_train_graphs_fsts(argv: List[str]) -> int:
    po = ParseOptions(
        "Compile training graphs from per-utterance word FSTs "
        "instead of linear transcripts (compile-train-graphs-fsts.cc; "
        "used by data-cleanup recipes with uncertainty in the "
        "transcript).\n"
        "Usage: compile-train-graphs-fsts [options] <tree-in> "
        "<model-in> <lexicon-fst-in> <fsts-rspecifier> "
        "<graphs-wspecifier>")
    transition_scale = po.register_value(
        "transition-scale", 1.0, "Scale on transition probabilities")
    self_loop_scale = po.register_value(
        "self-loop-scale", 1.0, "Scale on self-loop probabilities")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.decoder.graph import compile_graph_from_lexicon_fst
    from kaldi_tpu.fstext.fst import VectorFst
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.tree.context_dep import ContextDependency
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      po.get_arg(1))
    tm = _read_tm(po.get_arg(2))
    lex = read_fst_file(po.get_arg(3))
    writer = TableWriter(VectorFst, po.get_arg(5))
    n = err = 0
    for key, g in SequentialTableReader("fst", po.get_arg(4)):
        try:
            graph = compile_graph_from_lexicon_fst(
                lex, g, tm, tree, transition_scale[0],
                self_loop_scale[0])
            writer.write(key, graph)
            n += 1
        except Exception as e:  # noqa: BLE001 — per-utt error contract
            warn(f"failed to compile graph for {key}: {e}")
            err += 1
    writer.close()
    log(f"compiled {n} training graphs from FSTs ({err} failures)")
    return 0 if n else 1


def gmm_init_model_flat(argv: List[str]) -> int:
    po = ParseOptions(
        "Flat-start GMM: every pdf gets one Gaussian at the global "
        "feature mean/variance (gmm-init-model-flat.cc).\n"
        "Usage: gmm-init-model-flat [options] <tree-in> <topo-in> "
        "<model-out> [<features-rspecifier>]")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 3 or po.num_args() > 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.gmm.am_diag_gmm import AmDiagGmm
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.hmm import HmmTopology, TransitionModel
    from kaldi_tpu.tree.context_dep import ContextDependency
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      po.get_arg(1))
    topo = kaldi_io.read_kaldi_object(HmmTopology.read, po.get_arg(2))
    if po.num_args() == 4:
        tot = np.zeros(0)
        tot2 = np.zeros(0)
        count = 0
        for _k, feats in SequentialTableReader("matrix",
                                               po.get_arg(4)):
            f = np.asarray(feats, np.float64)
            if count == 0:
                tot = f.sum(axis=0)
                tot2 = (f * f).sum(axis=0)
            else:
                tot += f.sum(axis=0)
                tot2 += (f * f).sum(axis=0)
            count += f.shape[0]
        if count == 0:
            warn("no features")
            return 1
        mean = tot / count
        var = np.maximum(tot2 / count - mean * mean, 1e-4)
    else:
        mean = np.zeros(39)
        var = np.ones(39)
    D = len(mean)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm()
    for _ in range(tree.num_pdfs):
        g = DiagGmm(1, D)
        g.set_from_means_and_vars([1.0], mean[None, :], var[None, :])
        am.add_pdf(g)
    write_am_gmm(po.get_arg(3), tm, am, binary[0])
    log(f"flat-initialized {am.num_pdfs} pdfs, dim {D}")
    return 0


def _gselect_to_post(argv: List[str], name: str, full: bool) -> int:
    po = ParseOptions(
        f"Posteriors restricted to preselected Gaussians ({name}; "
        "the i-vector pipeline's pruned E-step).\n"
        f"Usage: {name} [options] <model-in> <feats-rspecifier> "
        "<gselect-rspecifier> <post-wspecifier>")
    min_post = po.register_value("min-post", 0.0,
                                 "Prune posteriors below this")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    if full:
        from kaldi_tpu.gmm.full_gmm import FullGmm
        gmm = kaldi_io.read_kaldi_object(FullGmm.read, po.get_arg(1))
    else:
        from kaldi_tpu.gmm.diag_gmm import DiagGmm
        gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    gsel_reader = RandomAccessTableReader("int-vector-vector",
                                          po.get_arg(3))
    writer = TableWriter("posterior", po.get_arg(4))
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in gsel_reader:
            warn(f"no gselect for {key}")
            err += 1
            continue
        gsel = gsel_reader[key]
        comp = gmm.component_log_likes(np.asarray(feats, np.float32))
        out = []
        for t, row in enumerate(gsel):
            idx = np.asarray(list(row), np.int64)
            ll = comp[t, idx]
            p = np.exp(ll - ll.max())
            p /= p.sum()
            frame = [(int(i), float(pi)) for i, pi in zip(idx, p)
                     if pi > min_post[0]]
            out.append(frame)
        writer.write(key, out)
        n += 1
    writer.close()
    log(f"{name}: posteriors for {n} utterances ({err} errors)")
    return 0 if n else 1


def gmm_global_gselect_to_post(argv: List[str]) -> int:
    return _gselect_to_post(argv, "gmm-global-gselect-to-post",
                            full=False)


def fgmm_global_gselect_to_post(argv: List[str]) -> int:
    return _gselect_to_post(argv, "fgmm-global-gselect-to-post",
                            full=True)


def fgmm_global_acc_stats_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate full-covariance GMM stats from precomputed "
        "posteriors (fgmm-global-acc-stats-post.cc; the UBM stage of "
        "the i-vector pipeline).\n"
        "Usage: fgmm-global-acc-stats-post [options] <model-in> "
        "<post-rspecifier> <feats-rspecifier> <stats-out>")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.full_gmm import AccumFullGmm, FullGmm
    fgmm = kaldi_io.read_kaldi_object(FullGmm.read, po.get_arg(1))
    post_reader = RandomAccessTableReader("posterior", po.get_arg(2))
    acc = AccumFullGmm(fgmm.num_gauss, fgmm.dim)
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(3)):
        if key not in post_reader:
            warn(f"no posteriors for {key}")
            err += 1
            continue
        post = post_reader[key]
        f = np.asarray(feats, np.float64)
        T = min(len(post), f.shape[0])
        dense = np.zeros((T, fgmm.num_gauss))
        for t in range(T):
            for gi, w in post[t]:
                dense[t, gi] = w
        acc.accumulate(f[:T], dense)
        n += 1
    with kaldi_io.output_stream(po.get_arg(4)) as f:
        np.savez(f, occupancy=acc.occupancy, mean_accs=acc.mean_accs,
                 covar_accs=acc.covar_accs)
    log(f"accumulated posterior stats from {n} utterances "
        f"({err} errors)")
    return 0 if n else 1


def ivector_extractor_copy(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy an i-vector extractor (possibly changing format).\n"
        "Usage: ivector-extractor-copy [options] <extractor-in> "
        "<extractor-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.extractor import IvectorExtractor
    ex = kaldi_io.read_kaldi_object(IvectorExtractor.read,
                                    po.get_arg(1))
    kaldi_io.write_kaldi_object(ex.write, po.get_arg(2), binary[0])
    return 0


def ivector_randomize(argv: List[str]) -> int:
    po = ParseOptions(
        "Randomize rows of online-ivector matrices: each row is kept "
        "or replaced by a LATER row with probability "
        "--randomize-prob (ivector-randomize.cc; a training-time "
        "augmentation making the nnet robust to i-vector "
        "staleness).\n"
        "Usage: ivector-randomize [options] <ivector-rspecifier> "
        "<ivector-wspecifier>")
    prob = po.register_value("randomize-prob", 0.5,
                             "Replacement probability")
    seed = po.register_value("srand", 0, "Random seed")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    rng = np.random.default_rng(seed[0])
    writer = TableWriter("matrix", po.get_arg(2))
    n = 0
    for key, mat in SequentialTableReader("matrix", po.get_arg(1)):
        m = np.asarray(mat).copy()
        T = m.shape[0]
        for t in range(T - 1):
            if rng.random() < prob[0]:
                m[t] = m[int(rng.integers(t, T))]
        writer.write(key, m)
        n += 1
    writer.close()
    log(f"randomized online ivectors for {n} utterances")
    return 0 if n else 1
