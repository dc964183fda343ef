"""Multi-threaded decode/determinize CLI variants (parity:
src/gmmbin/gmm-latgen-faster-parallel.cc,
src/bin/latgen-faster-mapped-parallel.cc,
src/nnet3bin/nnet3-latgen-faster-parallel.cc,
src/sgmm2bin/sgmm2-latgen-faster-parallel.cc,
src/latbin/lattice-determinize-pruned-parallel.cc,
src/latbin/lattice-determinize-phone-pruned{,-parallel}.cc).

The reference's `-parallel` binaries differ from their base tools only
in running N decode tasks concurrently with output written in input
order (DecodeUtteranceLatticeFasterClass + TaskSequencer); these
implementations share that structure via util.profile.TaskSequencer —
each worker owns its own decoder instance, the main thread reads
input and drains ordered results to the writers."""

from __future__ import annotations

import sys
from typing import Callable, List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def _run_latgen_parallel(name: str, loglike_fn: Callable, id2pdf,
                         hclg, dopts, acoustic_scale: float,
                         num_threads: int, feats_rspec: str,
                         lat_wspec: str, word_wspec: str,
                         ali_wspec: str) -> int:
    """Shared core: decode utterances on a thread pool, write lattices
    (and optional words/alignments) in input order."""
    from kaldi_tpu.decoder.lattice_decoder import LatticeFasterDecoder
    from kaldi_tpu.lat.functions import (determinize_lattice,
                                         lattice_best_path)
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.util.profile import TaskSequencer
    lat_writer = TableWriter(LatticeHolder(), lat_wspec)
    word_writer = TableWriter("int-vector", word_wspec) \
        if word_wspec else None
    ali_writer = TableWriter("int-vector", ali_wspec) \
        if ali_wspec else None
    stats = {"n": 0, "err": 0}

    def work(key, feats):
        loglikes = loglike_fn(key, feats)
        if loglikes is None:
            return key, None, None, None
        dec = LatticeFasterDecoder(hclg, dopts)
        lat = dec.decode(np.asarray(loglikes), id2pdf, acoustic_scale)
        if lat is None:
            return key, None, None, None
        out_lat = determinize_lattice(lat) \
            if dopts.determinize_lattice else lat
        ali = words = None
        if word_writer is not None or ali_writer is not None:
            ali, words, _ = lattice_best_path(lat)
        return key, out_lat, words, ali

    def emit(res):
        key, out_lat, words, ali = res
        if out_lat is None:
            warn(f"decode failed for {key}")
            stats["err"] += 1
            return
        lat_writer.write(key, out_lat)
        if word_writer is not None and words is not None:
            word_writer.write(key, words)
        if ali_writer is not None and ali is not None:
            ali_writer.write(key, ali)
        stats["n"] += 1

    seq = TaskSequencer(num_threads)
    for key, feats in SequentialTableReader("matrix", feats_rspec):
        seq.run(work, key, feats, callback=emit)
    seq.wait()
    lat_writer.close()
    if word_writer is not None:
        word_writer.close()
    if ali_writer is not None:
        ali_writer.close()
    log(f"{name}: decoded {stats['n']} utterances "
        f"({stats['err']} failed) with {num_threads} threads")
    return 0 if stats["n"] else 1


def gmm_latgen_faster_parallel(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate lattices with a GMM model, decoding utterances on "
        "--num-threads worker threads with in-order output "
        "(gmm-latgen-faster-parallel.cc).\n"
        "Usage: gmm-latgen-faster-parallel [options] <model-in> "
        "<fst-in> <features-rspecifier> <lattice-wspecifier> "
        "[<words-wspecifier> [<alignments-wspecifier>]]")
    from kaldi_tpu.decoder.lattice_decoder import \
        LatticeFasterDecoderOptions
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    num_threads = po.register_value("num-threads", 4,
                                    "Number of decode threads")
    po.read(argv)
    if po.num_args() < 4 or po.num_args() > 6:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    tm, am = read_am_gmm(po.get_arg(1))
    hclg = read_fst_file(po.get_arg(2))
    return _run_latgen_parallel(
        "gmm-latgen-faster-parallel",
        lambda key, feats: am.log_likes_batch(feats), tm.id2pdf_id,
        hclg, dopts, acoustic_scale[0], num_threads[0], po.get_arg(3),
        po.get_arg(4), po.get_arg(5) if po.num_args() >= 5 else "",
        po.get_arg(6) if po.num_args() >= 6 else "")


def latgen_faster_mapped_parallel(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate lattices from pdf-indexed loglike matrices on "
        "--num-threads worker threads "
        "(latgen-faster-mapped-parallel.cc).\n"
        "Usage: latgen-faster-mapped-parallel [options] "
        "<trans-model-in> <fst-in> <loglikes-rspecifier> "
        "<lattice-wspecifier> [<words-wspecifier> "
        "[<alignments-wspecifier>]]")
    from kaldi_tpu.decoder.lattice_decoder import \
        LatticeFasterDecoderOptions
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    num_threads = po.register_value("num-threads", 4,
                                    "Number of decode threads")
    po.read(argv)
    if po.num_args() < 4 or po.num_args() > 6:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    tm = _read_tm(po.get_arg(1))
    hclg = read_fst_file(po.get_arg(2))
    return _run_latgen_parallel(
        "latgen-faster-mapped-parallel",
        lambda key, ll: ll, tm.id2pdf_id, hclg, dopts,
        acoustic_scale[0], num_threads[0], po.get_arg(3),
        po.get_arg(4), po.get_arg(5) if po.num_args() >= 5 else "",
        po.get_arg(6) if po.num_args() >= 6 else "")


def sgmm2_latgen_faster_parallel(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate lattices with an SGMM2 model on --num-threads "
        "worker threads (sgmm2-latgen-faster-parallel.cc).\n"
        "Usage: sgmm2-latgen-faster-parallel [options] <model-in> "
        "<fst-in> <feature-rspecifier> <lattice-wspecifier> "
        "[<words-wspecifier> [<alignments-wspecifier>]]")
    from kaldi_tpu.decoder.lattice_decoder import \
        LatticeFasterDecoderOptions
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    num_threads = po.register_value("num-threads", 4,
                                    "Number of decode threads")
    spk_vecs_rs = po.register_value(
        "spk-vecs", "", "rspecifier for speaker vectors")
    utt2spk_rs = po.register_value(
        "utt2spk", "", "rspecifier for utterance-to-speaker map")
    po.read(argv)
    if po.num_args() < 4 or po.num_args() > 6:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.sgmm2_tools import (_read_spk_vecs, _utt_spk_vec,
                                           read_am_sgmm2)
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    tm, am = read_am_sgmm2(po.get_arg(1))
    hclg = read_fst_file(po.get_arg(2))
    vecs = _read_spk_vecs(spk_vecs_rs[0])
    utt2spk = (RandomAccessTableReader("token-vector", utt2spk_rs[0])
               if utt2spk_rs[0] else None)
    return _run_latgen_parallel(
        "sgmm2-latgen-faster-parallel",
        lambda key, feats: am.log_likes(
            feats, _utt_spk_vec(vecs, utt2spk, key)),
        tm.id2pdf_id, hclg, dopts, acoustic_scale[0], num_threads[0],
        po.get_arg(3), po.get_arg(4),
        po.get_arg(5) if po.num_args() >= 5 else "",
        po.get_arg(6) if po.num_args() >= 6 else "")


def nnet3_latgen_faster_parallel(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate lattices with an xconfig-checkpoint nnet3 model on "
        "--num-threads worker threads; the acoustic forward runs "
        "batched on the accelerator, the graph searches run on the "
        "pool (nnet3-latgen-faster-parallel.cc).\n"
        "Usage: nnet3-latgen-faster-parallel [options] <trans-model> "
        "<nnet-dir> <fst-in> <features-rspecifier> "
        "<lattice-wspecifier> [<words-wspecifier>]")
    from kaldi_tpu.decoder.lattice_decoder import \
        LatticeFasterDecoderOptions
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0,
        "Scaling factor for acoustic likelihoods")
    num_threads = po.register_value("num-threads", 4,
                                    "Number of decode threads")
    po.read(argv)
    if po.num_args() < 5 or po.num_args() > 6:
        po.print_usage()
        return 1
    import json
    import os

    import jax
    import jax.numpy as jnp

    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.hmm import TransitionModel
    from kaldi_tpu.nnet3.xconfig import build_xconfig_model, parse_xconfig
    from kaldi_tpu.parallel.checkpoint import restore_checkpoint
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        binary = iof.init_input_stream(f)
        tm = TransitionModel.read(f, binary)
    base = os.path.abspath(po.get_arg(2))
    meta = json.load(open(os.path.join(base, "step_0.meta.json")))
    model = build_xconfig_model(meta["xconfig"], train=False)
    layers = parse_xconfig(meta["xconfig"])
    dims = {l.name: l.get_int("dim") for l in layers
            if l.layer_type == "input"}
    inputs0 = {name: jnp.zeros((1, 21, d)) for name, d in dims.items()}
    template = model.init(jax.random.PRNGKey(0), inputs0)
    variables, _, _ = restore_checkpoint(base, template)
    hclg = read_fst_file(po.get_arg(3))

    def loglike_fn(key, feats):
        out = model.apply(variables,
                          {"input": jnp.asarray(feats[None])})
        return np.asarray(out["output"][0])

    return _run_latgen_parallel(
        "nnet3-latgen-faster-parallel", loglike_fn, tm.id2pdf_id,
        hclg, dopts, acoustic_scale[0], num_threads[0], po.get_arg(4),
        po.get_arg(5), po.get_arg(6) if po.num_args() >= 6 else "", "")


def _determinize_parallel(argv: List[str], phone_mode: bool) -> int:
    name = ("lattice-determinize-phone-pruned-parallel" if phone_mode
            else "lattice-determinize-pruned-parallel")
    usage = (
        "Determinize lattices (phone-pass then word-pass pruned "
        "determinization) on --num-threads worker threads "
        "(lattice-determinize-phone-pruned-parallel.cc).\n"
        f"Usage: {name} [options] <model-in> <lattice-rspecifier> "
        "<lattice-wspecifier>") if phone_mode else (
        "Determinize lattices with interleaved beam pruning on "
        "--num-threads worker threads "
        "(lattice-determinize-pruned-parallel.cc).\n"
        f"Usage: {name} [options] <lattice-rspecifier> "
        "<lattice-wspecifier>")
    po = ParseOptions(usage)
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    beam = po.register_value("beam", 10.0,
                             "Pruning beam [applied after scaling]")
    max_states = po.register_value(
        "max-states", 50000,
        "Maximum states per determinized lattice")
    num_threads = po.register_value("num-threads", 4,
                                    "Number of worker threads")
    phone_det = word_det = None
    if phone_mode:
        phone_det = po.register_value(
            "phone-determinize", True,
            "Run the first pass with phone symbols inserted")
        word_det = po.register_value(
            "word-determinize", True,
            "Run the second, word-level pass")
    po.read(argv)
    want_args = 3 if phone_mode else 2
    if po.num_args() != want_args:
        po.print_usage()
        return 1
    if acoustic_scale[0] == 0.0:
        print(f"{name}: --acoustic-scale must be nonzero",
              file=sys.stderr)
        return 1
    from kaldi_tpu.lat.functions import lattice_scale
    from kaldi_tpu.lat.functions import (
        determinize_lattice_phone_pruned, determinize_lattice_pruned)
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.util.profile import TaskSequencer
    tm = None
    if phone_mode:
        from kaldi_tpu.cli.tail5_tools import _read_tm
        tm = _read_tm(po.get_arg(1))
    writer = TableWriter(LatticeHolder(), po.get_arg(want_args))
    stats = {"n": 0}

    def work(key, lat):
        scaled = lattice_scale(lat, 1.0, acoustic_scale[0])
        if phone_mode:
            det = determinize_lattice_phone_pruned(
                scaled, tm, beam=beam[0],
                phone_determinize=phone_det[0],
                word_determinize=word_det[0],
                max_states=max_states[0])
        else:
            det = determinize_lattice_pruned(
                scaled, beam=beam[0], max_states=max_states[0])
        return key, lattice_scale(det, 1.0, 1.0 / acoustic_scale[0])

    def emit(res):
        key, det = res
        writer.write(key, det)
        stats["n"] += 1

    seq = TaskSequencer(num_threads[0])
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(want_args - 1)):
        seq.run(work, key, lat, callback=emit)
    seq.wait()
    writer.close()
    log(f"{name}: determinized {stats['n']} lattices with "
        f"{num_threads[0]} threads")
    return 0 if stats["n"] else 1


def lattice_determinize_pruned_parallel(argv: List[str]) -> int:
    return _determinize_parallel(argv, phone_mode=False)


def lattice_determinize_phone_pruned_parallel(argv: List[str]) -> int:
    return _determinize_parallel(argv, phone_mode=True)


def lattice_determinize_phone_pruned(argv: List[str]) -> int:
    po = ParseOptions(
        "Determinize lattices in two passes: first over phone+word "
        "symbols (phones spliced in at phone starts), then over "
        "words (lattice-determinize-phone-pruned.cc).\n"
        "Usage: lattice-determinize-phone-pruned [options] "
        "<model-in> <lattice-rspecifier> <lattice-wspecifier>")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    beam = po.register_value("beam", 10.0,
                             "Pruning beam [applied after scaling]")
    max_states = po.register_value(
        "max-states", 50000, "Maximum states per determinized lattice")
    phone_det = po.register_value(
        "phone-determinize", True,
        "Run the first pass with phone symbols inserted")
    word_det = po.register_value(
        "word-determinize", True, "Run the second, word-level pass")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    if acoustic_scale[0] == 0.0:
        print("lattice-determinize-phone-pruned: --acoustic-scale "
              "must be nonzero", file=sys.stderr)
        return 1
    from kaldi_tpu.lat.functions import lattice_scale
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.lat.functions import determinize_lattice_phone_pruned
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    tm = _read_tm(po.get_arg(1))
    writer = TableWriter(LatticeHolder(), po.get_arg(3))
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(2)):
        scaled = lattice_scale(lat, 1.0, acoustic_scale[0])
        det = determinize_lattice_phone_pruned(
            scaled, tm, beam=beam[0], phone_determinize=phone_det[0],
            word_determinize=word_det[0], max_states=max_states[0])
        writer.write(key, lattice_scale(det, 1.0,
                                        1.0 / acoustic_scale[0]))
        n += 1
    writer.close()
    log(f"determinized {n} lattices (phone-pruned)")
    return 0 if n else 1
