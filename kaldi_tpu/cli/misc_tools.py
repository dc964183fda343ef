"""Additional CLI families: transform estimation (est-lda, est-mllt,
gmm-est-fmllr, transform-feats), VAD + i-vectors (compute-vad,
ivector-extract, ivector-compute-plda, ivector-plda-scoring), LM
rescoring (lattice-lmrescore), MBR/CTM (lattice-mbr-decode,
lattice-to-ctm-conf), nnet3 (nnet3-init, nnet3-info, nnet3-compute),
misc (copy-vector, sum-matrices)."""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  RandomAccessTableReaderMapped,
                                  SequentialTableReader, TableWriter)


# ---------------------------------------------------------------------------
# transforms

def transform_feats(argv: List[str]) -> int:
    po = ParseOptions(
        "Apply transform (e.g. LDA; fMLLR) to features\n"
        "Usage: transform-feats [options] (<transform-rspecifier>|<transform-rxfilename>) <feats-rspecifier> <feats-wspecifier>")
    utt2spk = po.register_value("utt2spk", "", "rspecifier for utterance to speaker map")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.transform.fmllr import apply_affine_transform
    t_arg = po.get_arg(1)
    is_table = ":" in t_arg and t_arg.split(":")[0].split(",")[0] in \
        ("ark", "scp")
    reader = (RandomAccessTableReaderMapped("matrix", t_arg, utt2spk[0])
              if is_table else None)
    global_t = (None if is_table
                else kaldi_io.read_kaldi_object(iof.read_matrix, t_arg))
    writer = TableWriter("matrix", po.get_arg(3))
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        t = global_t
        if reader is not None:
            if key not in reader:
                warn(f"no transform for {key}")
                err += 1
                continue
            t = reader[key]
        D = feats.shape[1]
        if t.shape[1] == D + 1:
            out = apply_affine_transform(feats, t)
        elif t.shape[1] == D:
            out = feats @ t.T
        else:
            warn(f"{key}: transform shape {t.shape} vs dim {D}")
            err += 1
            continue
        writer.write(key, out)
        n += 1
    writer.close()
    log(f"transformed {n} feature matrices ({err} errors)")
    return 0 if n else 1


def est_lda(argv: List[str]) -> int:
    po = ParseOptions("Estimate LDA transform using stats obtained with acc-lda.\n"
                      "Usage: est-lda [options] <lda-matrix-out> <lda-acc-1> <lda-acc-2> ...")
    from kaldi_tpu.transform.lda import LdaEstimate, LdaOptions
    opts = LdaOptions()
    po.register_struct(opts)
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    total = None
    for i in range(2, po.num_args() + 1):
        acc = kaldi_io.read_kaldi_object(LdaEstimate.read, po.get_arg(i))
        if total is None:
            total = acc
        else:
            total.add(acc)
    lda, _ = total.estimate(opts)
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, lda), po.get_arg(1))
    return 0


def acc_lda(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate LDA statistics based on pdf-ids.\n"
        "Usage: acc-lda [options] <transition-model> <features-rspecifier> "
        "<posteriors-rspecifier> <lda-acc-out>")
    rand_prune = po.register_value("rand-prune", 0.0, "Randomized pruning threshold for posteriors")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.transform.lda import LdaEstimate
    tm, am = read_am_gmm(po.get_arg(1))
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(3))
    est = None
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in ali_reader:
            continue
        ali = ali_reader[key]
        if est is None:
            est = LdaEstimate(tm.num_pdfs, feats.shape[1])
        pdfs = tm.transition_ids_to_pdfs(ali)
        for pdf in np.unique(pdfs):
            est.accumulate(feats[pdfs == pdf], int(pdf))
    kaldi_io.write_kaldi_object(est.write, po.get_arg(4))
    return 0


def gmm_est_fmllr(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate global fMLLR transforms, either per utterance or for "
        "the supplied set of speakers (spk2utt option).\n"
        "Usage: gmm-est-fmllr [options] <model-in> <feature-rspecifier> "
        "<post-rspecifier> <transform-wspecifier>")
    spk2utt = po.register_value("spk2utt", "", "rspecifier for speaker to utterance-list map")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
    tm, am = read_am_gmm(po.get_arg(1))
    post_reader = RandomAccessTableReader("posterior", po.get_arg(3))
    writer = TableWriter("matrix", po.get_arg(4))
    n = 0
    if spk2utt[0]:
        feat_reader = RandomAccessTableReader("matrix", po.get_arg(2))
        for spk, utts in SequentialTableReader("token-vector", spk2utt[0]):
            accs = None
            for utt in utts:
                if utt not in feat_reader or utt not in post_reader:
                    continue
                feats = np.asarray(feat_reader[utt], np.float64)
                if accs is None:
                    accs = FmllrDiagGmmAccs(feats.shape[1])
                accs.accumulate_from_posterior(am, tm, feats,
                                               post_reader[utt])
            if accs is None:
                continue
            W, impr = accs.update()
            writer.write(spk, W)
            n += 1
    else:
        for utt, feats in SequentialTableReader("matrix", po.get_arg(2)):
            if utt not in post_reader:
                continue
            accs = FmllrDiagGmmAccs(feats.shape[1])
            accs.accumulate_from_posterior(am, tm,
                                           np.asarray(feats, np.float64),
                                           post_reader[utt])
            W, impr = accs.update()
            writer.write(utt, W)
            n += 1
    writer.close()
    log(f"estimated {n} fMLLR transforms")
    return 0 if n else 1


# ---------------------------------------------------------------------------
# VAD / ivectors

def compute_vad(argv: List[str]) -> int:
    po = ParseOptions("Apply energy-based voice activity detection\n"
                      "Usage: compute-vad [options] <feats-rspecifier> <vad-wspecifier>")
    from kaldi_tpu.ivector.vad import VadEnergyOptions, compute_vad_energy
    opts = VadEnergyOptions()
    po.register_struct(opts)
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter("vector", po.get_arg(2))
    for key, feats in SequentialTableReader("matrix", po.get_arg(1)):
        writer.write(key, compute_vad_energy(opts, feats))
    writer.close()
    return 0


def ivector_extract(argv: List[str]) -> int:
    po = ParseOptions(
        "Extract iVectors for utterances\n"
        "Usage: ivector-extract [options] <model-in> <feature-rspecifier> "
        "<ivector-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector import IvectorExtractor
    ex = kaldi_io.read_kaldi_object(IvectorExtractor.read, po.get_arg(1))
    writer = TableWriter("vector", po.get_arg(3))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        writer.write(key, ex.extract_offset_removed(feats))
        n += 1
    writer.close()
    log(f"extracted {n} ivectors")
    return 0


def ivector_compute_plda(argv: List[str]) -> int:
    po = ParseOptions(
        "Computes a Plda object from a set of iVectors.\n"
        "Usage: ivector-compute-plda [options] <spk2utt-rspecifier> "
        "<ivector-rspecifier> <plda-out>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.plda import train_plda
    iv_reader = RandomAccessTableReader("vector", po.get_arg(2))
    classes = {}
    for spk, utts in SequentialTableReader("token-vector", po.get_arg(1)):
        vecs = [iv_reader[u] for u in utts if u in iv_reader]
        if vecs:
            classes[spk] = vecs
    plda = train_plda(classes)
    kaldi_io.write_kaldi_object(plda.write, po.get_arg(3))
    return 0


# ---------------------------------------------------------------------------
# lattice rescoring / MBR / CTM

def lattice_lmrescore_cli(argv: List[str]) -> int:
    po = ParseOptions(
        "Add lm_scale * [cost of best path through LM FST] to graph "
        "costs of the lattice.\n"
        "Usage: lattice-lmrescore [options] <lattice-rspecifier> "
        "<arpa-lm-rxfilename> <words-txt> <lattice-wspecifier>")
    lm_scale = po.register_value("lm-scale", 1.0, "Scaling factor for language model costs; frequently 1.0 or -1.0")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.lm.arpa import parse_arpa
    from kaldi_tpu.lm.rescore import DeterministicLm, lattice_lmrescore
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        lm = parse_arpa(f.read().decode("utf-8"))
    word_names = {}
    with open(po.get_arg(3)) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                word_names[int(parts[1])] = parts[0]
    det = DeterministicLm(lm, word_names)
    writer = TableWriter(LatticeHolder(), po.get_arg(4))
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        writer.write(key, lattice_lmrescore(lat, det, lm_scale[0]))
        n += 1
    writer.close()
    log(f"rescored {n} lattices")
    return 0


def lattice_mbr_decode(argv: List[str]) -> int:
    po = ParseOptions(
        "Do Minimum Bayes Risk decoding (decoding that aims to minimize the "
        "expected word error rate).\n"
        "Usage: lattice-mbr-decode [options] <lattice-rspecifier> "
        "<transcriptions-wspecifier> [<bayes-risk-wspecifier> [<sausage-stats-wspecifier>]]")
    lm_scale = po.register_value("lm-scale", 1.0, "Scaling factor for graph/lm costs")
    acoustic_scale = po.register_value("acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.lat.functions import lattice_scale
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.lat.sausages import MinimumBayesRisk
    writer = TableWriter("int-vector", po.get_arg(2))
    risk_writer = (TableWriter("float", po.get_arg(3))
                   if po.num_args() >= 3 else None)
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        scaled = lattice_scale(lat, lm_scale[0], acoustic_scale[0])
        mbr = MinimumBayesRisk(scaled)
        writer.write(key, mbr.get_one_best())
        if risk_writer:
            risk_writer.write(key, mbr.get_bayes_risk())
    writer.close()
    if risk_writer:
        risk_writer.close()
    return 0


def lattice_to_ctm_conf(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate 1-best path through lattices; output as CTM with "
        "confidences.\n"
        "Usage: lattice-to-ctm-conf [options] <lattice-rspecifier> <ctm-wxfilename>")
    acoustic_scale = po.register_value("acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    lm_scale = po.register_value("lm-scale", 1.0, "Scaling factor for LM probabilities")
    frame_shift = po.register_value("frame-shift", 0.01, "Time in seconds between frames")
    decode_mbr = po.register_value("decode-mbr", True, "If true, do Minimum Bayes Risk decoding")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.lat.functions import lattice_scale
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.lat.word_align import format_ctm, lattice_to_ctm
    entries = []
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        scaled = lattice_scale(lat, lm_scale[0], acoustic_scale[0])
        entries.extend(lattice_to_ctm(scaled, None, key, frame_shift[0],
                                      decode_mbr=decode_mbr[0]))
    with kaldi_io.output_stream(po.get_arg(2)) as f:
        f.write(format_ctm(entries).encode())
    return 0


# ---------------------------------------------------------------------------
# nnet3

def nnet3_init(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize nnet3 neural network from a config file (xconfig "
        "subset); writes the model (params + config) with orbax.\n"
        "Usage: nnet3-init [options] <config-in> <raw-nnet-out>")
    srand = po.register_value("srand", 0, "Seed for random number generator")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.nnet3.xconfig import build_xconfig_model, parse_xconfig
    with open(po.get_arg(1)) as f:
        text = f.read()
    layers = parse_xconfig(text)
    model = build_xconfig_model(text)
    dims = {l.name: l.get_int("dim") for l in layers
            if l.layer_type == "input"}
    inputs = {name: jnp.zeros((1, 21, d)) for name, d in dims.items()}
    variables = model.init(jax.random.PRNGKey(srand[0]), inputs)
    from kaldi_tpu.parallel.checkpoint import save_checkpoint
    import os
    out = po.get_arg(2)
    save_checkpoint(out, variables, 0, extra={"xconfig": text})
    log(f"initialized model at {out}")
    return 0


def nnet3_compute(argv: List[str]) -> int:
    po = ParseOptions(
        "Propagate the features through raw neural network model.\n"
        "Usage: nnet3-compute [options] <nnet-dir> <features-rspecifier> "
        "<matrix-wspecifier>")
    use_xent = po.register_value("use-xent-output", False, "Use the output-xent head instead of output")
    use_device = po.register_value(
        "use-device", True,
        "Run imported models through the jitted device path "
        "(nnet3/jax_bridge; falls back to host eval for component "
        "types without a device mapping)")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.nnet3.xconfig import build_xconfig_model
    from kaldi_tpu.parallel.checkpoint import restore_checkpoint
    import json
    import os
    base = os.path.abspath(po.get_arg(1))
    if os.path.isfile(base):
        # reference-format model file (.raw or .mdl with TransitionModel)
        from kaldi_tpu.nnet3.mdl_io import read_nnet3_any
        _, graph, _ = read_nnet3_any(base)
        head = "output-xent" if use_xent[0] else "output"
        fwd = None
        if use_device[0]:
            try:
                from kaldi_tpu.nnet3.jax_bridge import compile_graph
                fn = compile_graph(graph, output_name=head)
                jitted = jax.jit(fn)

                def fwd(feats):
                    return np.asarray(
                        jitted(jnp.asarray(feats[None], jnp.float32))[0])
            except Exception as e:   # unsupported component type
                warn(f"nnet3-compute: device path unavailable ({e}); "
                     f"falling back to host evaluation")
                fwd = None
        if fwd is None:
            def fwd(feats):
                return graph.forward(feats, output_name=head)
        writer = TableWriter("matrix", po.get_arg(3))
        n = 0
        for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
            writer.write(key, fwd(feats))
            n += 1
        writer.close()
        log(f"computed outputs for {n} utterances (nnet3 model file)")
        return 0
    meta = json.load(open(os.path.join(base, "step_0.meta.json")))
    text = meta["xconfig"]
    model = build_xconfig_model(text, train=False)
    # restore with a fresh-init template
    from kaldi_tpu.nnet3.xconfig import parse_xconfig
    layers = parse_xconfig(text)
    dims = {l.name: l.get_int("dim") for l in layers
            if l.layer_type == "input"}
    inputs0 = {name: jnp.zeros((1, 21, d)) for name, d in dims.items()}
    template = model.init(jax.random.PRNGKey(0), inputs0)
    variables, _, _ = restore_checkpoint(base, template)
    writer = TableWriter("matrix", po.get_arg(3))
    head = "output-xent" if use_xent[0] else "output"
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        inputs = {"input": jnp.asarray(feats[None])}
        out = model.apply(variables, inputs)
        writer.write(key, np.asarray(out[head][0]))
        n += 1
    writer.close()
    log(f"computed outputs for {n} utterances")
    return 0


def copy_vector(argv: List[str]) -> int:
    po = ParseOptions("Copy vectors, or archives of vectors\n"
                      "Usage: copy-vector [options] <vector-rspecifier> <vector-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter("vector", po.get_arg(2))
    for key, vec in SequentialTableReader("vector", po.get_arg(1)):
        writer.write(key, vec)
    writer.close()
    return 0


def gmm_boost_silence(argv: List[str]) -> int:
    po = ParseOptions(
        "Modify GMM-based model to boost (by a certain factor) all\n"
        "probabilities associated with the specified phones (could be "
        "all silence phones)\n"
        "Usage: gmm-boost-silence [options] <silence-phones-list> <model-in> <model-out>")
    boost = po.register_value("boost", 1.5, "Factor by which to boost silence probs")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm, write_am_gmm
    phones = [int(p) for p in po.get_arg(1).split(":") if p]
    tm, am = read_am_gmm(po.get_arg(2))
    pdfs = set()
    for ts in range(1, tm.num_transition_states + 1):
        if tm.transition_state_to_phone(ts) in phones:
            pdfs.add(tm.transition_state_to_forward_pdf(ts))
            pdfs.add(tm.transition_state_to_self_loop_pdf(ts))
    for pdf in pdfs:
        g = am.get_pdf(pdf)
        g.gconsts = g.gconsts + np.float32(np.log(boost[0]))
    am.invalidate_pack()
    write_am_gmm(po.get_arg(3), tm, am)
    log(f"boosted {len(pdfs)} pdfs by factor {boost[0]}")
    return 0


def tree_info(argv: List[str]) -> int:
    po = ParseOptions("Print information about decision tree\n"
                      "Usage: tree-info <tree-in>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    from kaldi_tpu.tree import ContextDependency
    tree = kaldi_io.read_kaldi_object(ContextDependency.read, po.get_arg(1))
    print(f"num-pdfs {tree.num_pdfs}")
    print(f"context-width {tree.context_width()}")
    print(f"central-position {tree.central_position()}")
    return 0


def am_info(argv: List[str]) -> int:
    po = ParseOptions("Write to stdout various properties of a model\n"
                      "Usage: am-info [options] <model-in>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import gmm_info
    return gmm_info(["gmm-info", po.get_arg(1)])


def lattice_depth(argv: List[str]) -> int:
    po = ParseOptions("Compute the lattice depths in terms of the average number of arcs that\n"
                      "cross a frame.  See also lattice-depth-per-frame\n"
                      "Usage: lattice-depth <lattice-rspecifier> [<depth-wspecifier>]")
    po.read(argv)
    if po.num_args() < 1:
        po.print_usage()
        return 1
    from kaldi_tpu.lat.functions import lattice_state_times
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    writer = (TableWriter("float", po.get_arg(2))
              if po.num_args() >= 2 else None)
    total_arcs = total_frames = 0
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        times = lattice_state_times(lat)
        T = max((t for t in times if t >= 0), default=0)
        n_emitting = sum(1 for arcs in lat.arcs for a in arcs
                         if a.ilabel != 0)
        depth = n_emitting / max(T, 1)
        if writer:
            writer.write(key, depth)
        total_arcs += n_emitting
        total_frames += T
    if writer:
        writer.close()
    log(f"overall density {total_arcs / max(total_frames, 1):.2f}")
    return 0


def lattice_oracle(argv: List[str]) -> int:
    po = ParseOptions(
        "Finds the path having the smallest edit-distance between a lattice\n"
        "and a reference string.\n"
        "Usage: lattice-oracle [options] <test-lattice-rspecifier> "
        "<reference-rspecifier> <transcriptions-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.lat.functions import lattice_nbest
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.util.edit_distance import edit_distance_counts
    ref_reader = RandomAccessTableReader("int-vector", po.get_arg(2))
    writer = TableWriter("int-vector", po.get_arg(3))
    tot_err = tot_words = 0
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        if key not in ref_reader:
            continue
        ref = ref_reader[key]
        best_err, best_words = None, []
        for _, words, _ in lattice_nbest(lat, 50):
            i, d, s = edit_distance_counts(ref, words)
            if best_err is None or i + d + s < best_err:
                best_err, best_words = i + d + s, words
        writer.write(key, best_words)
        tot_err += best_err or 0
        tot_words += len(ref)
    writer.close()
    log(f"%WER (oracle, nbest-approx) "
        f"{100.0 * tot_err / max(tot_words, 1):.2f} "
        f"[ {tot_err} / {tot_words} ]")
    return 0


def wav_reverberate(argv: List[str]) -> int:
    po = ParseOptions(
        "Corrupts the wave files supplied via input pipe with the specified\n"
        "room-impulse response and additive noise distortions.\n"
        "Usage: wav-reverberate [options] <wav-in-rxfilename> <wav-out-wxfilename>")
    impulse_response = po.register_value("impulse-response", "", "rxfilename of the impulse response wav")
    additive_signals = po.register_value("additive-signals", "", "rxfilename of additive noise wav")
    snrs = po.register_value("snrs", "20", "SNR(dB) for the additive noise")
    volume = po.register_value("volume", 0.0, "If nonzero, scale the output wave by this factor")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.feat.perturb import add_noise, reverberate, volume_perturb
    from kaldi_tpu.feat.wave import WaveData
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        wav = WaveData.read(f)
    out = wav.channel(0)
    if impulse_response[0]:
        with kaldi_io.input_stream(impulse_response[0]) as f:
            rir = WaveData.read(f).channel(0)
        out = reverberate(out, rir)
    if additive_signals[0]:
        with kaldi_io.input_stream(additive_signals[0]) as f:
            noise = WaveData.read(f).channel(0)
        out = add_noise(out, noise, float(snrs[0].split(":")[0]))
    if volume[0]:
        out = volume_perturb(out, volume[0])
    with kaldi_io.output_stream(po.get_arg(2)) as f:
        WaveData(wav.samp_freq, out[None, :]).write(f)
    return 0


def nnet3_xvector_compute(argv: List[str]) -> int:
    po = ParseOptions(
        "Propagate features through an xvector neural network model and write\n"
        "the output vectors (embeddings from the stats-pooling layer).\n"
        "Usage: nnet3-xvector-compute [options] <model-dir> "
        "<features-rspecifier> <vector-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    import json
    import os

    import jax
    import jax.numpy as jnp

    from kaldi_tpu.nnet3.xvector import (XvectorConfig, XvectorModel,
                                         extract_xvectors)
    from kaldi_tpu.parallel.checkpoint import restore_checkpoint
    base = os.path.abspath(po.get_arg(1))
    meta = json.load(open(os.path.join(base, "step_0.meta.json")))
    cfg = XvectorConfig(**meta["config"])
    model = XvectorModel(cfg, train=False)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 30, cfg.feat_dim)))
    variables, _, _ = restore_checkpoint(base, template)
    keys, feats = [], []
    for key, f in SequentialTableReader("matrix", po.get_arg(2)):
        keys.append(key)
        feats.append(f)
    embs = extract_xvectors(model, variables, feats)
    with TableWriter("vector", po.get_arg(3)) as w:
        for k, e in zip(keys, embs):
            w.write(k, e)
    log(f"extracted {len(keys)} xvectors")
    return 0


def prepare_lang(argv: List[str]) -> int:
    po = ParseOptions(
        "Prepare a lang directory from a lexicon file "
        "(utils/prepare_lang.sh equivalent).\n"
        "Usage: prepare-lang [options] <lexicon-file> <lang-dir>")
    sil_phone = po.register_value("sil-phone", "SIL", "Silence phone symbol")
    sil_prob = po.register_value("sil-prob", 0.5, "Probability of optional silence")
    oov_word = po.register_value("oov-word", "", "Word mapped to out-of-vocabulary words")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.decoder.lang_dir import prepare_lang as _prep
    _prep(po.get_arg(1), po.get_arg(2), sil_phone=sil_phone[0],
          sil_prob=sil_prob[0], oov_word=oov_word[0] or None)
    return 0


def fstpushspecial(argv: List[str]) -> int:
    po = ParseOptions(
        "Push weights so every state's total outgoing mass is equal\n"
        "(works on FSTs whose weights don't sum to one, e.g. HCLG)\n"
        "Usage: fstpushspecial [options] [<fst-in> [<fst-out>]]")
    from kaldi_tpu.fstext.openfst_io import read_fst_file, write_fst
    from kaldi_tpu.fstext.ops import push_special
    delta = po.register_value("delta", 1e-4, "Convergence threshold")
    po.read(argv)
    if po.num_args() > 2:
        po.print_usage()
        return 1
    fst = read_fst_file(po.get_arg(1) if po.num_args() >= 1 else "-")
    out = push_special(fst, delta[0])
    dest = po.get_arg(2) if po.num_args() == 2 else "-"
    import sys as _sys
    if dest == "-":
        write_fst(_sys.stdout.buffer, out)
    else:
        with open(dest, "wb") as f:
            write_fst(f, out)
    return 0


def nnet3_am_copy(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy nnet3 acoustic model files, optionally converting\n"
        "binary/text or stripping the transition model (--raw)\n"
        "Usage: nnet3-am-copy [options] <nnet-in> <nnet-out>")
    from kaldi_tpu.nnet3.mdl_io import (read_nnet3_any, write_nnet3_am,
                                        write_raw_nnet3)
    binary = po.register_value("binary", True, "Write output in binary mode")
    raw = po.register_value("raw", False,
                            "If true, write only the raw neural net")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    src, dst = po.get_arg(1), po.get_arg(2)
    tm, graph, info = read_nnet3_any(src)
    if raw[0] or tm is None:
        write_raw_nnet3(graph, dst, binary=binary[0])
    else:
        write_nnet3_am(dst, tm, graph,
                       left_context=info["left_context"],
                       right_context=info["right_context"],
                       priors=info["priors"], binary=binary[0])
    log(f"copied {src} -> {dst}")
    return 0


def validate_data_dir_cli(argv: List[str]) -> int:
    po = ParseOptions(
        "Validate a data directory (wav.scp/text/utt2spk/... consistency)\n"
        "Usage: validate-data-dir [options] <data-dir>")
    from kaldi_tpu.util.validation import validate_data_dir
    no_text = po.register_value("no-text", False, "Do not require a text file")
    no_feats = po.register_value("no-feats", True, "Do not require feats.scp")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    problems = validate_data_dir(po.get_arg(1),
                                 require_text=not no_text[0],
                                 require_feats=not no_feats[0])
    for p in problems:
        warn(p)
    if not problems:
        log(f"{po.get_arg(1)}: valid data directory")
    return 0 if not problems else 1


def validate_lang_cli(argv: List[str]) -> int:
    po = ParseOptions("Validate a lang directory\n"
                      "Usage: validate-lang [options] <lang-dir>")
    from kaldi_tpu.util.validation import validate_lang_dir
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    problems = validate_lang_dir(po.get_arg(1))
    for p in problems:
        warn(p)
    if not problems:
        log(f"{po.get_arg(1)}: valid lang directory")
    return 0 if not problems else 1


def fix_data_dir_cli(argv: List[str]) -> int:
    po = ParseOptions("Fix a data directory by removing inconsistent "
                      "utterances and sorting all files\n"
                      "Usage: fix-data-dir <data-dir>")
    from kaldi_tpu.util.validation import fix_data_dir
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    fix_data_dir(po.get_arg(1))
    return 0


def ivector_plda_scoring(argv: List[str]) -> int:
    po = ParseOptions(
        "Compute log-likelihood-ratio PLDA scores for trials\n"
        "Usage: ivector-plda-scoring <plda> <train-ivector-rspecifier> "
        "<test-ivector-rspecifier> <trials-rxfilename> <scores-wxfilename>\n"
        "Trials file: lines of '<train-key> <test-key>'.")
    from kaldi_tpu.ivector.plda import Plda
    num_utts = po.register_value("num-utts", "", "rspecifier for number of utterances per train key")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    plda = kaldi_io.read_kaldi_object(Plda.read, po.get_arg(1))
    train = {k: v for k, v in SequentialTableReader("vector",
                                                    po.get_arg(2))}
    test = {k: v for k, v in SequentialTableReader("vector",
                                                   po.get_arg(3))}
    counts = {}
    if num_utts[0]:
        counts = {k: int(v[0]) for k, v in
                  SequentialTableReader("vector", num_utts[0])}
    tr_t = {k: plda.transform_ivector(v, counts.get(k, 1))
            for k, v in train.items()}
    te_t = {k: plda.transform_ivector(v, 1) for k, v in test.items()}
    out = (sys.stdout if po.get_arg(5) == "-" else open(po.get_arg(5),
                                                        "w"))
    n = err = 0
    with open(po.get_arg(4)) as trials:
        for line in trials:
            parts = line.split()
            if len(parts) < 2:
                continue
            a, b = parts[0], parts[1]
            if a not in tr_t or b not in te_t:
                err += 1
                continue
            score = plda.log_likelihood_ratio(tr_t[a], counts.get(a, 1),
                                              te_t[b])
            out.write(f"{a} {b} {score:.6f}\n")
            n += 1
    if out is not sys.stdout:
        out.close()
    log(f"scored {n} trials ({err} missing)")
    return 0 if n else 1


def copy_feats_to_htk(argv: List[str]) -> int:
    po = ParseOptions(
        "Save features as HTK-format files (one per utterance)\n"
        "Usage: copy-feats-to-htk [options] <feats-rspecifier>")
    from kaldi_tpu.feat.htk import write_htk
    import os as _os
    output_dir = po.register_value("output-dir", "./", "Output directory")
    output_ext = po.register_value("output-ext", "fea", "Output extension")
    sample_period = po.register_value("sample-period", 100000, "HTK sample period (100ns units)")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    _os.makedirs(output_dir[0], exist_ok=True)
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(1)):
        path = _os.path.join(output_dir[0], f"{key}.{output_ext[0]}")
        with open(path, "wb") as f:
            write_htk(f, feats, sample_period=sample_period[0],
                      parm_kind=9)  # USER kind
        n += 1
    log(f"wrote {n} HTK feature files to {output_dir[0]}")
    return 0 if n else 1


def ivector_mean(argv: List[str]) -> int:
    po = ParseOptions(
        "Average iVectors over speakers (spk2utt map)\n"
        "Usage: ivector-mean <spk2utt-rspecifier> <ivector-rspecifier> "
        "<ivector-wspecifier> [<num-utts-wspecifier>]")
    po.read(argv)
    if po.num_args() < 3:
        po.print_usage()
        return 1
    import numpy as np
    ivecs = RandomAccessTableReader("vector", po.get_arg(2))
    writer = TableWriter("vector", po.get_arg(3))
    nw = (TableWriter("vector", po.get_arg(4))
          if po.num_args() >= 4 else None)
    n = 0
    for spk, utts in SequentialTableReader("token-vector", po.get_arg(1)):
        vecs = [ivecs[u] for u in utts if u in ivecs]
        if not vecs:
            continue
        writer.write(spk, np.mean(vecs, axis=0))
        if nw:
            nw.write(spk, np.array([float(len(vecs))], np.float32))
        n += 1
    writer.close()
    if nw:
        nw.close()
    log(f"averaged ivectors for {n} speakers")
    return 0 if n else 1


def fstcompile(argv: List[str]) -> int:
    po = ParseOptions(
        "Compile a text-format FST (OpenFst fstcompile syntax: lines of\n"
        "'src dst ilabel olabel [weight]' and final lines 'state "
        "[weight]')\nUsage: fstcompile [options] [<text-fst-in> "
        "[<fst-out>]]")
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.openfst_io import write_fst
    isymbols = po.register_value("isymbols", "", "Input symbol table")
    osymbols = po.register_value("osymbols", "", "Output symbol table")
    acceptor = po.register_value("acceptor", False, "Input is an acceptor")
    po.read(argv)
    from kaldi_tpu.decoder.lang_dir import read_symbol_table
    isym = read_symbol_table(isymbols[0]) if isymbols[0] else None
    osym = read_symbol_table(osymbols[0]) if osymbols[0] else None

    def to_id(tok, table):
        if table is not None and tok in table:
            return table[tok]
        return int(tok)

    src_file = po.get_arg(1) if po.num_args() >= 1 else "-"
    stream = sys.stdin if src_file == "-" else open(src_file)
    fst = VectorFst(TropicalWeight)

    def state(n):
        while fst.num_states <= n:
            fst.add_state()
        return n

    first = True
    for line in stream:
        parts = line.split()
        if not parts:
            continue
        if len(parts) >= (4 if not acceptor[0] else 3):
            s = state(int(parts[0]))
            d = state(int(parts[1]))
            il = to_id(parts[2], isym)
            ol = il if acceptor[0] else to_id(parts[3], osym)
            w = float(parts[4 if not acceptor[0] else 3]) \
                if len(parts) > (4 if not acceptor[0] else 3) else 0.0
            fst.add_arc(s, Arc(il, ol, w, d))
            if first:
                fst.set_start(s)
                first = False
        elif len(parts) <= 2:
            s = state(int(parts[0]))
            fst.finals[s] = float(parts[1]) if len(parts) == 2 else 0.0
            if first:
                fst.set_start(s)
                first = False
    if stream is not sys.stdin:
        stream.close()
    dest = po.get_arg(2) if po.num_args() >= 2 else "-"
    out = sys.stdout.buffer if dest == "-" else open(dest, "wb")
    write_fst(out, fst)
    if out is not sys.stdout.buffer:
        out.close()
    return 0


def fstprint(argv: List[str]) -> int:
    po = ParseOptions(
        "Print an FST in OpenFst text format\n"
        "Usage: fstprint [options] [<fst-in> [<text-out>]]")
    from kaldi_tpu.fstext.fst import TropicalWeight
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    isymbols = po.register_value("isymbols", "", "Input symbol table")
    osymbols = po.register_value("osymbols", "", "Output symbol table")
    po.read(argv)
    from kaldi_tpu.decoder.lang_dir import read_symbol_table
    isym = {v: k for k, v in read_symbol_table(isymbols[0]).items()} \
        if isymbols[0] else None
    osym = {v: k for k, v in read_symbol_table(osymbols[0]).items()} \
        if osymbols[0] else None
    fst = read_fst_file(po.get_arg(1) if po.num_args() >= 1 else "-")
    dest = po.get_arg(2) if po.num_args() >= 2 else "-"
    out = sys.stdout if dest == "-" else open(dest, "w")

    def name(i, table):
        return table[i] if table is not None and i in table else str(i)

    # print start state's arcs first (OpenFst convention)
    order = list(range(fst.num_states))
    if fst.start > 0:
        order.remove(fst.start)
        order.insert(0, fst.start)
    for s in order:
        for a in fst.arcs[s]:
            w = float(a.weight)
            wstr = "" if w == 0.0 else f"\t{w:g}"
            out.write(f"{s}\t{a.nextstate}\t{name(a.ilabel, isym)}"
                      f"\t{name(a.olabel, osym)}{wstr}\n")
        fw = fst.finals[s]
        if fw != TropicalWeight.zero:
            w = float(fw)
            out.write(f"{s}\t{w:g}\n" if w else f"{s}\n")
    if out is not sys.stdout:
        out.close()
    return 0


def nnet3_info(argv: List[str]) -> int:
    po = ParseOptions(
        "Print information about an nnet3 model (reference .raw/.mdl "
        "format)\nUsage: nnet3-info <nnet3-in>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_any
    import numpy as np
    tm, graph, info = read_nnet3_any(po.get_arg(1))
    if tm is not None:
        print(f"transition-model: {tm.num_pdfs} pdfs, "
              f"{tm.num_transition_ids} transition-ids")
        print(f"left-context: {info['left_context']}  "
              f"right-context: {info['right_context']}")
    n_params = 0
    for name, comp in graph.components.items():
        fields = []
        for key in ("LinearParams", "Params"):
            if key in comp.fields:
                m = np.asarray(comp.fields[key])
                n_params += m.size
                fields.append(f"{key.lower()}={m.shape[0]}x{m.shape[1]}")
        if "BiasParams" in comp.fields:
            n_params += np.asarray(comp.fields["BiasParams"]).size
        print(f"component name={name} type={comp.TYPE} "
              + " ".join(fields))
    print(f"num-parameters: {n_params}")
    for node in graph.nodes:
        print(node.config_line())
    return 0
