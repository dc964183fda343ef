"""SGMM2 tools (parity: src/sgmm2bin — sgmm2-init.cc,
sgmm2-acc-stats-ali.cc, sgmm2-sum-accs.cc, sgmm2-est.cc,
sgmm2-est-spkvecs.cc, sgmm2-latgen-faster.cc, sgmm2-info.cc,
sgmm2-copy.cc).

Model files follow the reference convention: TransitionModel then
the SGMM2 acoustic model in one stream."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.gmm.full_gmm import FullGmm
from kaldi_tpu.hmm import HmmTopology, TransitionModel
from kaldi_tpu.sgmm2.am_sgmm2 import (AmSgmm2, MleAmSgmm2Accs,
                                      MleSgmm2SpeakerAccs, _update_M,
                                      _update_N, _update_c,
                                      _update_sigma, _update_u,
                                      _update_v, _update_w)
from kaldi_tpu.tree.context_dep import ContextDependency
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def read_am_sgmm2(rxfilename: str):
    from kaldi_tpu.base import io_funcs as iof
    with kaldi_io.input_stream(rxfilename) as f:
        binary = iof.init_input_stream(f)
        tm = TransitionModel.read(f, binary)
        am = AmSgmm2.read(f, binary)
    return tm, am


def write_am_sgmm2(wxfilename: str, tm: TransitionModel, am: AmSgmm2,
                   binary: bool = True) -> None:
    def w(stream, b):
        tm.write(stream, b)
        am.write(stream, b)
    kaldi_io.write_kaldi_object(w, wxfilename, binary)


def sgmm2_init(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize an SGMM2 from a full-covariance UBM.\n"
        "Usage: sgmm2-init [options] <topo-in> <tree-in> <full-ubm-in> "
        "<sgmm2-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    phn_dim = po.register_value(
        "phn-space-dim", 0, "Phonetic subspace dimension (0 = feat-dim+1)")
    spk_dim = po.register_value(
        "spk-space-dim", 0, "Speaker subspace dimension (0 = none)")
    use_u = po.register_value(
        "speaker-dependent-weights", True,
        "Symmetric SGMM2: add speaker weight projections u_i")
    seed = po.register_value("seed", 0, "Random init seed")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    topo = kaldi_io.read_kaldi_object(HmmTopology.read, po.get_arg(1))
    tree = kaldi_io.read_kaldi_object(ContextDependency.read, po.get_arg(2))
    ubm = kaldi_io.read_kaldi_object(FullGmm.read, po.get_arg(3))
    tm = TransitionModel(topo, tree)
    am = AmSgmm2(ubm, tree.num_pdfs, phn_dim[0] or None, seed=seed[0])
    if spk_dim[0] > 0:
        am.init_speaker_subspace(spk_dim[0], use_u=use_u[0],
                                 seed=seed[0])
    write_am_sgmm2(po.get_arg(4), tm, am, binary[0])
    log(f"initialized SGMM2: {am.num_states} states, {am.num_gauss} "
        f"gaussians, phn-dim {am.phn_dim}, spk-dim {am.spk_dim}")
    return 0


def _read_spk_vecs(rspecifier: str):
    return (RandomAccessTableReader("vector", rspecifier)
            if rspecifier else None)


def _utt_spk_vec(vecs, utt2spk, key):
    """Resolve a speaker vector for an utterance (None if absent)."""
    if vecs is None:
        return None
    k = key
    if utt2spk is not None:
        if key not in utt2spk:
            return None
        k = utt2spk[key][0]
    return np.asarray(vecs[k]) if k in vecs else None


def sgmm2_acc_stats_ali(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate stats for SGMM2 training (from alignments).\n"
        "Usage: sgmm2-acc-stats-ali [options] <model-in> "
        "<feature-rspecifier> <alignments-rspecifier> <stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    spk_vecs_rs = po.register_value(
        "spk-vecs", "", "rspecifier for speaker vectors")
    utt2spk_rs = po.register_value(
        "utt2spk", "", "rspecifier for utterance-to-speaker map "
        "(with --spk-vecs keyed by speaker)")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    tm, am = read_am_sgmm2(po.get_arg(1))
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(3))
    vecs = _read_spk_vecs(spk_vecs_rs[0])
    utt2spk = (RandomAccessTableReader("token-vector", utt2spk_rs[0])
               if utt2spk_rs[0] else None)
    accs = MleAmSgmm2Accs(am)
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in ali_reader:
            warn(f"no alignment for {key}")
            err += 1
            continue
        ali = ali_reader[key]
        if len(ali) != feats.shape[0]:
            warn(f"{key}: alignment length {len(ali)} vs "
                 f"{feats.shape[0]} frames")
            err += 1
            continue
        pdfs = tm.transition_ids_to_pdfs(ali)
        accs.accumulate(am, feats, pdfs.tolist(),
                        _utt_spk_vec(vecs, utt2spk, key))
        n += 1
    kaldi_io.write_kaldi_object(accs.write, po.get_arg(4), binary[0])
    log(f"accumulated stats from {n} utterances ({err} errors); "
        f"loglike/frame "
        f"{accs.total_like / max(accs.total_frames, 1):.4f}")
    return 0 if n else 1


def sgmm2_acc_stats(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate stats for SGMM2 training from (transition-id) "
        "POSTERIORS (sgmm2-acc-stats.cc; soft counts).\n"
        "Usage: sgmm2-acc-stats [options] <model-in> "
        "<feature-rspecifier> <posteriors-rspecifier> <stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    spk_vecs_rs = po.register_value(
        "spk-vecs", "", "rspecifier for speaker vectors")
    utt2spk_rs = po.register_value(
        "utt2spk", "", "rspecifier for utterance-to-speaker map")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    tm, am = read_am_sgmm2(po.get_arg(1))
    post_reader = RandomAccessTableReader("posterior", po.get_arg(3))
    vecs = _read_spk_vecs(spk_vecs_rs[0])
    utt2spk = (RandomAccessTableReader("token-vector", utt2spk_rs[0])
               if utt2spk_rs[0] else None)
    accs = MleAmSgmm2Accs(am)
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in post_reader:
            warn(f"no posteriors for {key}")
            err += 1
            continue
        post = post_reader[key]
        feats = np.asarray(feats)
        sv = _utt_spk_vec(vecs, utt2spk, key)
        # expand posterior entries to (frame, pdf, weight) rows; a frame
        # with mass on several pdfs becomes several soft-weighted rows
        rows, pdfs, wts = [], [], []
        for t, frame in enumerate(post):
            if t >= feats.shape[0]:
                break
            for tid, w in frame:
                if w == 0.0:
                    continue
                rows.append(t)
                pdfs.append(tm.transition_id_to_pdf(int(tid)))
                wts.append(float(w))
        if rows:
            accs.accumulate(am, feats[rows], pdfs, sv, weights=wts)
        n += 1
    kaldi_io.write_kaldi_object(accs.write, po.get_arg(4), binary[0])
    log(f"accumulated stats from {n} utterances ({err} errors)")
    return 0 if n else 1


def sgmm2_sum_accs(argv: List[str]) -> int:
    po = ParseOptions(
        "Sum SGMM2 stats.\n"
        "Usage: sgmm2-sum-accs [options] <stats-out> <stats-in1> "
        "<stats-in2> ...")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    total = None
    for i in range(2, po.num_args() + 1):
        acc = kaldi_io.read_kaldi_object(MleAmSgmm2Accs.read,
                                         po.get_arg(i))
        if total is None:
            total = acc
        else:
            total.add(acc)
    kaldi_io.write_kaldi_object(total.write, po.get_arg(1), binary[0])
    return 0


def sgmm2_est(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate SGMM2 model parameters from accumulated stats.\n"
        "Usage: sgmm2-est [options] <model-in> <stats-in> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    update_flags = po.register_value(
        "update-flags", "vMwScNu",
        "Which SGMM2 parameters to update (subset of vMwScNu)")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    tm, am = read_am_sgmm2(po.get_arg(1))
    accs = kaldi_io.read_kaldi_object(MleAmSgmm2Accs.read, po.get_arg(2))
    flags = update_flags[0]
    if "v" in flags:
        _update_v(am, accs)
    if "M" in flags:
        _update_M(am, accs)
    if "w" in flags:
        _update_w(am, accs)
    if "S" in flags:
        _update_sigma(am, accs)
    if "c" in flags:
        _update_c(am, accs)
    if "N" in flags and am.N is not None and hasattr(accs, "Z"):
        _update_N(am, accs)
    if "u" in flags and am.u is not None and hasattr(accs, "u_grad"):
        _update_u(am, accs)
    write_am_sgmm2(po.get_arg(3), tm, am, binary[0])
    log(f"estimated SGMM2 (flags {flags}); stats loglike/frame "
        f"{accs.total_like / max(accs.total_frames, 1):.4f}")
    return 0


def sgmm2_est_spkvecs(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate SGMM2 speaker vectors.\n"
        "Usage: sgmm2-est-spkvecs [options] <model-in> "
        "<feature-rspecifier> <alignments-rspecifier> "
        "<vecs-wspecifier>")
    spk2utt_rs = po.register_value(
        "spk2utt", "", "rspecifier for speaker-to-utterance-list map "
        "(without it, vectors are per utterance)")
    spk_vecs_rs = po.register_value(
        "spk-vecs", "", "rspecifier for previous speaker vectors "
        "(posteriors are computed at these)")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    tm, am = read_am_sgmm2(po.get_arg(1))
    if am.N is None:
        warn("model has no speaker subspace (run sgmm2-init with "
             "--spk-space-dim)")
        return 1
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(2))
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(3))
    prev = _read_spk_vecs(spk_vecs_rs[0])
    writer = TableWriter("vector", po.get_arg(4))
    n = err = 0

    def estimate(spk_key, utts):
        nonlocal n, err
        sacc = MleSgmm2SpeakerAccs(am)
        start = (np.asarray(prev[spk_key])
                 if prev is not None and spk_key in prev else None)
        used = 0
        for u in utts:
            if u not in feats_reader or u not in ali_reader:
                warn(f"missing feats or alignment for {u}")
                err += 1
                continue
            feats = feats_reader[u]
            pdfs = tm.transition_ids_to_pdfs(ali_reader[u])
            if len(pdfs) != feats.shape[0]:
                err += 1
                continue
            sacc.accumulate(am, feats, pdfs.tolist(), start)
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
    log(f"estimated speaker vectors for {n} speakers ({err} errors)")
    return 0 if n else 1


def sgmm2_latgen_faster(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate lattices using an SGMM2 model.\n"
        "Usage: sgmm2-latgen-faster [options] <model-in> <fst-in> "
        "<feature-rspecifier> <lattice-wspecifier> "
        "[<words-wspecifier> [<alignments-wspecifier>]]")
    from kaldi_tpu.decoder.lattice_decoder import (
        LatticeFasterDecoder, LatticeFasterDecoderOptions)
    from kaldi_tpu.lat.functions import (determinize_lattice,
                                         lattice_best_path)
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    spk_vecs_rs = po.register_value(
        "spk-vecs", "", "rspecifier for speaker vectors")
    utt2spk_rs = po.register_value(
        "utt2spk", "", "rspecifier for utterance-to-speaker map")
    po.read(argv)
    if po.num_args() < 4 or po.num_args() > 6:
        po.print_usage()
        return 1
    tm, am = read_am_sgmm2(po.get_arg(1))
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    hclg = read_fst_file(po.get_arg(2))
    vecs = _read_spk_vecs(spk_vecs_rs[0])
    utt2spk = (RandomAccessTableReader("token-vector", utt2spk_rs[0])
               if utt2spk_rs[0] else None)
    lat_writer = TableWriter(LatticeHolder(), po.get_arg(4))
    word_writer = (TableWriter("int-vector", po.get_arg(5))
                   if po.num_args() >= 5 and po.get_arg(5) else None)
    ali_writer = (TableWriter("int-vector", po.get_arg(6))
                  if po.num_args() >= 6 else None)
    dec = LatticeFasterDecoder(hclg, dopts)
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(3)):
        loglikes = am.log_likes(feats, _utt_spk_vec(vecs, utt2spk, key))
        lat = dec.decode(loglikes, tm.id2pdf_id, acoustic_scale[0])
        if lat is None:
            warn(f"decode failed for {key}")
            err += 1
            continue
        out_lat = (determinize_lattice(lat)
                   if dopts.determinize_lattice else lat)
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


def sgmm2_gselect(argv: List[str]) -> int:
    po = ParseOptions(
        "Precompute per-frame top-N Gaussian indices for an SGMM2 "
        "(sgmm2-gselect.cc; indices over the shared full-covariance "
        "background Gaussians).\n"
        "Usage: sgmm2-gselect [options] <model-in> <feats-rspecifier> "
        "<gselect-wspecifier>")
    n_sel = po.register_value("full-gmm-nbest", 15,
                              "Number of Gaussians to select")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    tm, am = read_am_sgmm2(po.get_arg(1))
    writer = TableWriter("int-vector-vector", po.get_arg(3))
    n = 0
    # per-Gaussian loglikes via the substate-marginalized component
    # scores at the UBM point (v = e1 substates make this the shared
    # background); sufficient for pruning parity
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        comp = am.component_log_likes(np.asarray(feats, np.float64))
        ll = comp.max(axis=1)                      # (T, I)
        k = min(n_sel[0], ll.shape[1])
        idx = np.argpartition(-ll, k - 1, axis=1)[:, :k]
        row = np.take_along_axis(ll, idx, axis=1)
        order = np.argsort(-row, axis=1, kind="stable")
        idx = np.take_along_axis(idx, order, axis=1)
        writer.write(key, [r.tolist() for r in idx])
        n += 1
    writer.close()
    log(f"wrote gselect for {n} utterances")
    return 0 if n else 1


def sgmm2_align_compiled(argv: List[str]) -> int:
    po = ParseOptions(
        "Align features to compiled training graphs with an SGMM2 "
        "model (sgmm2-align-compiled.cc).\n"
        "Usage: sgmm2-align-compiled [options] <model-in> "
        "<graphs-rspecifier> <feature-rspecifier> "
        "<alignments-wspecifier>")
    from kaldi_tpu.decoder.viterbi import FasterDecoder, \
        FasterDecoderOptions
    from kaldi_tpu.fstext.fst import VectorFst
    beam = po.register_value("beam", 10.0, "Decoding beam")
    retry_beam = po.register_value("retry-beam", 40.0,
                                   "Beam for the second attempt")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    spk_vecs_rs = po.register_value(
        "spk-vecs", "", "rspecifier for speaker vectors")
    utt2spk_rs = po.register_value(
        "utt2spk", "", "rspecifier for utterance-to-speaker map")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    tm, am = read_am_sgmm2(po.get_arg(1))
    graphs = RandomAccessTableReader(VectorFst, po.get_arg(2))
    vecs = _read_spk_vecs(spk_vecs_rs[0])
    utt2spk = (RandomAccessTableReader("token-vector", utt2spk_rs[0])
               if utt2spk_rs[0] else None)
    writer = TableWriter("int-vector", po.get_arg(4))
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(3)):
        if key not in graphs:
            warn(f"no graph for {key}")
            err += 1
            continue
        ll = am.log_likes(np.asarray(feats),
                          _utt_spk_vec(vecs, utt2spk, key))
        res = FasterDecoder(graphs[key], FasterDecoderOptions(
            beam=beam[0])).decode(ll, tm.id2pdf_id, acoustic_scale[0])
        if res is None and retry_beam[0] > beam[0]:
            res = FasterDecoder(graphs[key], FasterDecoderOptions(
                beam=retry_beam[0])).decode(ll, tm.id2pdf_id,
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


def sgmm2_rescore_lattice(argv: List[str]) -> int:
    po = ParseOptions(
        "Replace lattice acoustic scores with an SGMM2 model's "
        "(sgmm2-rescore-lattice.cc; speaker vectors supported).\n"
        "Usage: sgmm2-rescore-lattice [options] <model-in> "
        "<lattice-rspecifier> <feats-rspecifier> "
        "<lattice-wspecifier>")
    spk_vecs_rs = po.register_value(
        "spk-vecs", "", "rspecifier for speaker vectors")
    utt2spk_rs = po.register_value(
        "utt2spk", "", "rspecifier for utterance-to-speaker map")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.nnet3.discriminative_train import \
        rescore_lattice_acoustics
    tm, am = read_am_sgmm2(po.get_arg(1))
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(3))
    vecs = _read_spk_vecs(spk_vecs_rs[0])
    utt2spk = (RandomAccessTableReader("token-vector", utt2spk_rs[0])
               if utt2spk_rs[0] else None)
    writer = TableWriter(LatticeHolder(), po.get_arg(4))
    n = err = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(2)):
        if key not in feats_reader:
            warn(f"no feats for {key}")
            err += 1
            continue
        ll = am.log_likes(np.asarray(feats_reader[key]),
                          _utt_spk_vec(vecs, utt2spk, key))
        writer.write(key, rescore_lattice_acoustics(lat, tm, ll))
        n += 1
    writer.close()
    log(f"rescored {n} lattices ({err} errors)")
    return 0 if n else 1


def sgmm2_info(argv: List[str]) -> int:
    po = ParseOptions(
        "Print information about an SGMM2 model.\n"
        "Usage: sgmm2-info <model-in>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    tm, am = read_am_sgmm2(po.get_arg(1))
    nsub = sum(v.shape[0] for v in am.v)
    print(f"number of pdfs {am.num_states}")
    print(f"number of gaussians {am.num_gauss}")
    print(f"feature dimension {am.dim}")
    print(f"phn-space dimension {am.phn_dim}")
    print(f"spk-space dimension {am.spk_dim}")
    print(f"number of substates {nsub}")
    print(f"speaker-dependent weights "
        f"{'yes' if am.u is not None else 'no'}")
    print(f"number of transition-ids {tm.num_transition_ids}")
    return 0


def sgmm2_copy(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy an SGMM2 model (possibly changing binary/text format).\n"
        "Usage: sgmm2-copy [options] <model-in> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    tm, am = read_am_sgmm2(po.get_arg(1))
    write_am_sgmm2(po.get_arg(2), tm, am, binary[0])
    return 0
