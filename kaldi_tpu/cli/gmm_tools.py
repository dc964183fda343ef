"""gmmbin-equivalent CLIs (gmm-init-mono, compile-train-graphs,
gmm-align-compiled, gmm-acc-stats-ali, gmm-sum-accs, gmm-est,
gmm-latgen-faster, gmm-info, gmm-mixup).

Model files follow the reference convention: TransitionModel then
AmDiagGmm in one (binary) stream, so `final.mdl` files round-trip.
"""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.gmm import (AccumAmDiagGmm, AmDiagGmm, DiagGmm,
                           MleDiagGmmOptions, mle_am_diag_gmm_update)
from kaldi_tpu.hmm import HmmTopology, TransitionModel
from kaldi_tpu.tree import (ContextDependency,
                            monophone_context_dependency,
                            monophone_context_dependency_shared)
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)
from kaldi_tpu.fstext.fst import VectorFst


def read_am_gmm(rxfilename: str):
    with kaldi_io.input_stream(rxfilename) as f:
        binary = iof.init_input_stream(f)
        tm = TransitionModel.read(f, binary)
        am = AmDiagGmm.read(f, binary)
    return tm, am


def write_am_gmm(wxfilename: str, tm: TransitionModel, am: AmDiagGmm,
                 binary: bool = True):
    with kaldi_io.output_stream(wxfilename) as f:
        iof.init_output_stream(f, binary)
        tm.write(f, binary)
        am.write(f, binary)


def gmm_init_mono(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize monophone GMM.\n"
        "Usage: gmm-init-mono <topology-in> <dim> <model-out> <tree-out>\n"
        "e.g.: gmm-init-mono topo 39 mono.mdl mono.tree")
    train_feats = po.register_value("train-feats", "", "rspecifier for training features [used to set mean and variance]")
    shared_phones = po.register_value("shared-phones", "", "rxfilename containing sets of phones to share pdfs with [integer lines]")
    perturb_factor = po.register_value("perturb-factor", 0.0, "Perturb the means using this fraction of standard deviation")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    topo = kaldi_io.read_kaldi_object(HmmTopology.read, po.get_arg(1))
    dim = int(po.get_arg(2))
    mean = np.zeros(dim)
    var = np.ones(dim)
    if train_feats[0]:
        count = 0.0
        s = np.zeros(dim)
        s2 = np.zeros(dim)
        for i, (key, feats) in enumerate(
                SequentialTableReader("matrix", train_feats[0])):
            s += feats.sum(axis=0)
            s2 += (feats.astype(np.float64) ** 2).sum(axis=0)
            count += feats.shape[0]
            if i >= 10:
                break
        if count:
            mean = s / count
            var = np.maximum(s2 / count - mean ** 2, 1e-4)
    phones = topo.phones
    npc = {p: topo.num_pdf_classes(p) for p in phones}
    if shared_phones[0]:
        sets = []
        with open(shared_phones[0]) as f:
            for line in f:
                if line.strip():
                    sets.append([int(t) for t in line.split()])
        tree = monophone_context_dependency_shared(sets, npc)
    else:
        tree = monophone_context_dependency(phones, npc)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm()
    rng = np.random.default_rng(0)
    for _ in range(tree.num_pdfs):
        g = DiagGmm(1, dim)
        m = mean.copy()
        if perturb_factor[0]:
            m = m + perturb_factor[0] * rng.normal(size=dim) * np.sqrt(var)
        g.set_from_means_and_vars([1.0], m[None, :], var[None, :])
        am.add_pdf(g)
    write_am_gmm(po.get_arg(3), tm, am)
    kaldi_io.write_kaldi_object(tree.write, po.get_arg(4))
    log(f"initialized mono system: {tree.num_pdfs} pdfs, dim {dim}")
    return 0


def compile_train_graphs(argv: List[str]) -> int:
    po = ParseOptions(
        "Creates training graphs (without transition-probabilities, by default)\n"
        "Usage: compile-train-graphs [options] <tree-in> <model-in> "
        "<lexicon-fst-in> <transcriptions-rspecifier> <graphs-wspecifier>")
    transition_scale = po.register_value("transition-scale", 1.0, "Scale of transition probabilities (excluding self-loops)")
    self_loop_scale = po.register_value("self-loop-scale", 1.0, "Scale of self-loop versus non-self-loop log probs [relative to acoustics]")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    tree = kaldi_io.read_kaldi_object(ContextDependency.read, po.get_arg(1))
    # only the TransitionModel is needed, so ANY .mdl (GMM, SGMM2,
    # nnet3) works — the reference reads just the TM here too
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        binary = iof.init_input_stream(f)
        tm = TransitionModel.read(f, binary)
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    lex = read_fst_file(po.get_arg(3))
    from kaldi_tpu.decoder.graph import compile_graph_from_lexicon_fst
    writer = TableWriter(VectorFst, po.get_arg(5))
    n = err = 0
    for key, words in SequentialTableReader("int-vector", po.get_arg(4)):
        try:
            g = compile_graph_from_lexicon_fst(
                lex, words, tm, tree, transition_scale[0], self_loop_scale[0])
            writer.write(key, g)
            n += 1
        except Exception as e:
            warn(f"failed to compile graph for {key}: {e}")
            err += 1
    writer.close()
    log(f"compiled {n} training graphs, {err} failures")
    return 0 if n else 1


def gmm_align_compiled(argv: List[str]) -> int:
    po = ParseOptions(
        "Align features given [GMM-based] models.\n"
        "Usage: gmm-align-compiled [options] <model-in> <graphs-rspecifier> "
        "<feature-rspecifier> <alignments-wspecifier>")
    beam = po.register_value("beam", 10.0, "Decoding beam used in alignment")
    retry_beam = po.register_value("retry-beam", 40.0, "Decoding beam for second try at alignment")
    acoustic_scale = po.register_value("acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    transition_scale = po.register_value("transition-scale", 1.0, "Transition-probability scale [relative to acoustics]")
    careful = po.register_value("careful", False, "If true, do 'careful' alignment")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions
    tm, am = read_am_gmm(po.get_arg(1))
    graphs = RandomAccessTableReader(VectorFst, po.get_arg(2))
    writer = TableWriter("int-vector", po.get_arg(4))
    n = err = 0
    tot_like = 0.0
    tot_frames = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(3)):
        if key not in graphs:
            warn(f"no graph for {key}")
            err += 1
            continue
        loglikes = am.log_likes_batch(feats)
        graph = graphs[key]
        res = FasterDecoder(graph, FasterDecoderOptions(beam=beam[0])).decode(
            loglikes, tm.id2pdf_id, acoustic_scale[0])
        if res is None and retry_beam[0] > beam[0]:
            res = FasterDecoder(graph, FasterDecoderOptions(
                beam=retry_beam[0])).decode(loglikes, tm.id2pdf_id,
                                            acoustic_scale[0])
        if res is None:
            warn(f"alignment failed for {key}")
            err += 1
            continue
        writer.write(key, res[0])
        tot_like -= res[2]
        tot_frames += feats.shape[0]
        n += 1
    writer.close()
    log(f"aligned {n} utterances ({err} failed); avg cost/frame "
        f"{-tot_like / max(tot_frames, 1):.4f}")
    return 0 if n else 1


def gmm_acc_stats_ali(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate stats for GMM training.\n"
        "Usage: gmm-acc-stats-ali [options] <model-in> <feature-rspecifier> "
        "<alignments-rspecifier> <stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    tm, am = read_am_gmm(po.get_arg(1))
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(3))
    acc = AccumAmDiagGmm(am, num_transition_ids=tm.num_transition_ids)
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in ali_reader:
            warn(f"no alignment for {key}")
            err += 1
            continue
        ali = ali_reader[key]
        if len(ali) != feats.shape[0]:
            warn(f"{key}: alignment length {len(ali)} vs {feats.shape[0]} frames")
            err += 1
            continue
        acc.accumulate_alignment(am, tm, feats, ali)
        n += 1
    kaldi_io.write_kaldi_object(acc.write, po.get_arg(4), binary[0])
    log(f"accumulated stats from {n} utterances ({err} errors); "
        f"loglike/frame {acc.total_loglike / max(acc.total_frames, 1):.4f}")
    return 0 if n else 1


def gmm_sum_accs(argv: List[str]) -> int:
    po = ParseOptions("Sum multiple accumulated stats files for GMM training.\n"
                      "Usage: gmm-sum-accs [options] <stats-out> <stats-in1> <stats-in2> ...")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    total = None
    for i in range(2, po.num_args() + 1):
        acc = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(i))
        if total is None:
            total = acc
        else:
            total.add(acc)
    kaldi_io.write_kaldi_object(total.write, po.get_arg(1))
    return 0


def gmm_est(argv: List[str]) -> int:
    po = ParseOptions(
        "Do Maximum Likelihood re-estimation of GMM-based acoustic model\n"
        "Usage: gmm-est [options] <model-in> <stats-in> <model-out>")
    opts = MleDiagGmmOptions()
    po.register_struct(opts)
    mix_up = po.register_value("mix-up", 0, "Increase number of mixture components to this overall target")
    power = po.register_value("power", 0.25, "If mixing up, power to allocate Gaussians to states")
    perturb_factor = po.register_value("perturb-factor", 0.01, "While mixing up, perturb means by standard deviation times this factor")
    update_flags = po.register_value("update-flags", "mvwt", "Which GMM parameters to update: subset of mvwt")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    tm, am = read_am_gmm(po.get_arg(1))
    acc = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(2))
    mle_am_diag_gmm_update(opts, acc, am,
                           tm if "t" in update_flags[0] else None,
                           mixup=mix_up[0] if mix_up[0] else None,
                           perturb_factor=perturb_factor[0])
    write_am_gmm(po.get_arg(3), tm, am)
    log(f"estimated model: {am.num_gauss()} gaussians")
    return 0


def gmm_latgen_faster(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate lattices using GMM-based model.\n"
        "Usage: gmm-latgen-faster [options] <model-in> <fst-in> "
        "<features-rspecifier> <lattice-wspecifier> "
        "[<words-wspecifier> [<alignments-wspecifier>]]")
    from kaldi_tpu.decoder.lattice_decoder import (
        LatticeFasterDecoder, LatticeFasterDecoderOptions)
    from kaldi_tpu.lat.functions import (determinize_lattice,
                                         lattice_best_path)
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value("acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    allow_partial = po.register_value("allow-partial", False, "If true, produce output even if end state was not reached")
    word_symbol_table = po.register_value("word-symbol-table", "", "Symbol table for words [for debug output]")
    po.read(argv)
    if po.num_args() < 4 or po.num_args() > 6:
        po.print_usage()
        return 1
    tm, am = read_am_gmm(po.get_arg(1))
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    hclg = read_fst_file(po.get_arg(2))
    lat_writer = TableWriter(LatticeHolder(), po.get_arg(4))
    word_writer = (TableWriter("int-vector", po.get_arg(5))
                   if po.num_args() >= 5 and po.get_arg(5) else None)
    ali_writer = (TableWriter("int-vector", po.get_arg(6))
                  if po.num_args() >= 6 else None)
    dec = LatticeFasterDecoder(hclg, dopts)
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(3)):
        loglikes = am.log_likes_batch(feats)
        lat = dec.decode(loglikes, tm.id2pdf_id, acoustic_scale[0])
        if lat is None:
            warn(f"decode failed for {key}")
            err += 1
            continue
        out_lat = determinize_lattice(lat) if dopts.determinize_lattice else lat
        lat_writer.write(key, out_lat)
        if word_writer or ali_writer:
            ali, words, _ = lattice_best_path(lat)
            if word_writer:
                word_writer.write(key, words)
            if ali_writer:
                ali_writer.write(key, ali)
        n += 1
    lat_writer.close()
    if word_writer:
        word_writer.close()
    if ali_writer:
        ali_writer.close()
    log(f"decoded {n} utterances ({err} failed)")
    return 0 if n else 1


def gmm_info(argv: List[str]) -> int:
    po = ParseOptions("Write to standard output various properties of GMM-based model\n"
                      "Usage: gmm-info [options] <model-in>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    tm, am = read_am_gmm(po.get_arg(1))
    print(f"number of phones {len(tm.get_phones())}")
    print(f"number of pdfs {am.num_pdfs}")
    print(f"number of transition-ids {tm.num_transition_ids}")
    print(f"number of transition-states {tm.num_transition_states}")
    print(f"feature dimension {am.dim}")
    print(f"number of gaussians {am.num_gauss()}")
    return 0


def gmm_est_gaussians_ebw(argv: List[str]) -> int:
    po = ParseOptions(
        "Update GMM means and variances with Extended Baum-Welch from\n"
        "numerator and denominator stats (discriminative MMI/MPE)\n"
        "Usage: gmm-est-gaussians-ebw [options] <model-in> <num-stats-in> "
        "<den-stats-in> <model-out>")
    from kaldi_tpu.gmm.ebw import EbwOptions, update_ebw_am_diag_gmm
    opts = EbwOptions()
    po.register_struct(opts)
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    tm, am = read_am_gmm(po.get_arg(1))
    num = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(2))
    den = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(3))
    update_ebw_am_diag_gmm(num, den, am, opts)
    write_am_gmm(po.get_arg(4), tm, am)
    return 0


def gmm_est_weights_ebw(argv: List[str]) -> int:
    po = ParseOptions(
        "Update GMM weights with Extended Baum-Welch\n"
        "Usage: gmm-est-weights-ebw [options] <model-in> <num-stats-in> "
        "<den-stats-in> <model-out>")
    from kaldi_tpu.gmm.ebw import update_ebw_weights_diag_gmm
    weight_iters = po.register_value(
        "weight-iters", 1, "Iterations of the weight auxiliary solve")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    tm, am = read_am_gmm(po.get_arg(1))
    num = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(2))
    den = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(3))
    impr = 0.0
    for pdf in range(am.num_pdfs):
        impr += update_ebw_weights_diag_gmm(num.accs[pdf], den.accs[pdf],
                                            am.get_pdf(pdf),
                                            weight_iters[0])
    am.invalidate_pack()
    log(f"EBW weight update: total auxf impr {impr:.2f}")
    write_am_gmm(po.get_arg(4), tm, am)
    return 0


def gmm_ismooth_stats(argv: List[str]) -> int:
    po = ParseOptions(
        "Apply I-smoothing to GMM stats (add tau frames of the source\n"
        "stats' per-Gaussian average to the destination)\n"
        "Usage: gmm-ismooth-stats [options] <src-stats-in> <dst-stats-in> "
        "<stats-out>")
    from kaldi_tpu.gmm.ebw import ismooth_stats_diag_gmm
    tau = po.register_value("tau", 100.0, "I-smoothing constant")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    src = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(1))
    dst = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(2))
    for pdf in range(len(dst.accs)):
        ismooth_stats_diag_gmm(src.accs[pdf], tau[0], dst.accs[pdf])
    kaldi_io.write_kaldi_object(dst.write, po.get_arg(3), binary=True)
    return 0


def latgen_faster_mapped(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate lattices, reading log-likelihoods as matrices\n"
        "(model is needed only for the integer mappings in its "
        "transition-model)\n"
        "Usage: latgen-faster-mapped [options] <model-in> <fst-in> "
        "<loglikes-rspecifier> <lattice-wspecifier> "
        "[<words-wspecifier> [<alignments-wspecifier>]]")
    from kaldi_tpu.decoder.lattice_decoder import (
        LatticeFasterDecoder, LatticeFasterDecoderOptions)
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.hmm import TransitionModel
    from kaldi_tpu.lat.functions import (determinize_lattice,
                                         lattice_best_path)
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() < 4:
        po.print_usage()
        return 1
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        binary = iof.init_input_stream(f)
        tm = TransitionModel.read(f, binary)
    hclg = read_fst_file(po.get_arg(2))
    lat_writer = TableWriter(LatticeHolder, po.get_arg(4))
    word_writer = (TableWriter("int-vector", po.get_arg(5))
                   if po.num_args() >= 5 and po.get_arg(5) else None)
    ali_writer = (TableWriter("int-vector", po.get_arg(6))
                  if po.num_args() >= 6 else None)
    dec = LatticeFasterDecoder(hclg, dopts)
    n = err = 0
    for key, loglikes in SequentialTableReader("matrix", po.get_arg(3)):
        lat = dec.decode(loglikes, tm.id2pdf_id, acoustic_scale[0])
        if lat is None:
            warn(f"decode failed for {key}")
            err += 1
            continue
        out_lat = determinize_lattice(lat) if dopts.determinize_lattice \
            else lat
        lat_writer.write(key, out_lat)
        if word_writer or ali_writer:
            ali, words, _ = lattice_best_path(lat)
            if word_writer:
                word_writer.write(key, words)
            if ali_writer:
                ali_writer.write(key, ali)
        n += 1
    lat_writer.close()
    if word_writer:
        word_writer.close()
    if ali_writer:
        ali_writer.close()
    log(f"decoded {n} utterances ({err} failed)")
    return 0 if n else 1


def gmm_global_init_from_feats(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize a single diagonal GMM from features (for UBM init)\n"
        "Usage: gmm-global-init-from-feats [options] "
        "<feature-rspecifier> <model-out>")
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    num_gauss = po.register_value("num-gauss", 100, "Number of Gaussians")
    num_iters = po.register_value("num-iters", 4, "Number of EM iterations on the init sample")
    num_frames = po.register_value("num-frames", 200000, "Maximum frames to sample")
    srand = po.register_value("srand", 0, "Random seed")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    import numpy as np
    rows = []
    total = 0
    for _key, m in SequentialTableReader("matrix", po.get_arg(1)):
        rows.append(m)
        total += m.shape[0]
        if total >= num_frames[0]:
            break
    feats = np.concatenate(rows)[: num_frames[0]]
    rng = np.random.default_rng(srand[0])
    G = min(num_gauss[0], len(feats))
    gmm = DiagGmm(G, feats.shape[1])
    sel = feats[rng.choice(len(feats), G, replace=False)]
    gmm.set_from_means_and_vars(np.ones(G) / G, sel,
                                np.tile(np.maximum(feats.var(0), 1e-4),
                                        (G, 1)))
    from kaldi_tpu.gmm.mle import (AccumDiagGmm, MleDiagGmmOptions,
                                   mle_diag_gmm_update)
    for it in range(num_iters[0]):
        acc = AccumDiagGmm(gmm.num_gauss, gmm.dim)
        ll = acc.accumulate_from_gmm(gmm, feats)
        mle_diag_gmm_update(MleDiagGmmOptions(min_gaussian_occupancy=1.0),
                            acc, gmm)
        log(f"init iter {it}: avg loglike {ll / len(feats):.4f}")
    kaldi_io.write_kaldi_object(gmm.write, po.get_arg(2))
    return 0


def gmm_global_acc_stats(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate stats for a single diagonal GMM\n"
        "Usage: gmm-global-acc-stats [options] <model-in> "
        "<feature-rspecifier> <stats-out>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.gmm.mle import AccumDiagGmm
    gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    acc = AccumDiagGmm(gmm.num_gauss, gmm.dim)
    n = 0
    like = 0.0
    for _key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        like += acc.accumulate_from_gmm(gmm, feats)
        n += feats.shape[0]
    log(f"accumulated over {n} frames, avg loglike {like / max(n,1):.4f}")
    kaldi_io.write_kaldi_object(acc.write, po.get_arg(3))
    return 0


def gmm_global_est(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate a single diagonal GMM from stats\n"
        "Usage: gmm-global-est [options] <model-in> <stats-in> <model-out>")
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.gmm.mle import (AccumDiagGmm, MleDiagGmmOptions,
                                   mle_diag_gmm_update)
    opts = MleDiagGmmOptions()
    po.register_struct(opts)
    mix_up = po.register_value("mix-up", 0, "Target number of Gaussians to mix up to")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    acc = kaldi_io.read_kaldi_object(AccumDiagGmm.read, po.get_arg(2))
    mle_diag_gmm_update(opts, acc, gmm)
    if mix_up[0] > gmm.num_gauss:
        gmm.split(mix_up[0])
    kaldi_io.write_kaldi_object(gmm.write, po.get_arg(3))
    log(f"estimated global GMM with {gmm.num_gauss} gaussians")
    return 0


def gmm_global_to_fgmm(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert a single diagonal GMM to a full-covariance GMM\n"
        "Usage: gmm-global-to-fgmm <model-in> <fgmm-out>")
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.gmm.full_gmm import FullGmm
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    kaldi_io.write_kaldi_object(FullGmm.from_diag(gmm).write,
                                po.get_arg(2))
    return 0


def fgmm_global_acc_stats(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate stats for a full-covariance GMM\n"
        "Usage: fgmm-global-acc-stats [options] <model-in> "
        "<feature-rspecifier> <stats-out>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    import numpy as np
    from kaldi_tpu.gmm.full_gmm import AccumFullGmm, FullGmm
    fgmm = kaldi_io.read_kaldi_object(FullGmm.read, po.get_arg(1))
    acc = AccumFullGmm(fgmm.num_gauss, fgmm.dim)
    n = 0
    like = 0.0
    for _key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        like += acc.accumulate_from_full(fgmm, feats.astype(np.float64))
        n += feats.shape[0]
    log(f"accumulated over {n} frames, avg loglike {like / max(n,1):.4f}")
    with kaldi_io.output_stream(po.get_arg(3)) as f:
        np.savez(f, occupancy=acc.occupancy, mean_accs=acc.mean_accs,
                 covar_accs=acc.covar_accs)
    return 0


def fgmm_global_est(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate a full-covariance GMM from stats\n"
        "Usage: fgmm-global-est [options] <model-in> <stats-in> "
        "<model-out>")
    from kaldi_tpu.gmm.full_gmm import (AccumFullGmm, FullGmm,
                                        MleFullGmmOptions,
                                        mle_full_gmm_update)
    import numpy as np
    opts = MleFullGmmOptions()
    po.register_struct(opts)
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    fgmm = kaldi_io.read_kaldi_object(FullGmm.read, po.get_arg(1))
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        data = np.load(f)
        acc = AccumFullGmm(fgmm.num_gauss, fgmm.dim)
        acc.occupancy = data["occupancy"]
        acc.mean_accs = data["mean_accs"]
        acc.covar_accs = data["covar_accs"]
    mle_full_gmm_update(opts, acc, fgmm)
    kaldi_io.write_kaldi_object(fgmm.write, po.get_arg(3))
    return 0
