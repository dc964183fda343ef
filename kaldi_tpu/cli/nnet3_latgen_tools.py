"""nnet3 latgen variants: -looped (streaming constant-memory AM
evaluation), -batch (minibatched AM forward), -lookahead (on-the-fly
HCLr o Gr composition).  Parity:
src/nnet3bin/nnet3-latgen-faster-looped.cc:1,
src/nnet3bin/nnet3-latgen-faster-batch.cc:1,
src/nnet3bin/nnet3-latgen-faster-lookahead.cc:1."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def _load_tm_and_model(tm_arg: str, nnet_dir: str):
    """(tm, model, variables, forward(batch feats) -> loglikes)."""
    import json
    import os

    import jax
    import jax.numpy as jnp

    from kaldi_tpu.hmm import TransitionModel
    from kaldi_tpu.nnet3.xconfig import build_xconfig_model, parse_xconfig
    from kaldi_tpu.parallel.checkpoint import restore_checkpoint
    with kaldi_io.input_stream(tm_arg) as f:
        binary = iof.init_input_stream(f)
        tm = TransitionModel.read(f, binary)
    base = os.path.abspath(nnet_dir)
    meta = json.load(open(os.path.join(base, "step_0.meta.json")))
    text = meta["xconfig"]
    model = build_xconfig_model(text, train=False)
    layers = parse_xconfig(text)
    dims = {l.name: l.get_int("dim") for l in layers
            if l.layer_type == "input"}
    inputs0 = {name: jnp.zeros((1, 21, d)) for name, d in dims.items()}
    template = model.init(jax.random.PRNGKey(0), inputs0)
    variables, _, _ = restore_checkpoint(base, template)

    def forward(feats_b: np.ndarray) -> np.ndarray:
        out = model.apply(variables, {"input": jnp.asarray(feats_b)})
        return np.asarray(out["output"])

    return tm, model, variables, forward


def _decode_loop(items, dec, tm, acoustic_scale, dopts, lat_wspec,
                 words_wspec, name):
    from kaldi_tpu.lat.functions import (determinize_lattice,
                                         lattice_best_path)
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    lat_writer = TableWriter(LatticeHolder(), lat_wspec)
    word_writer = (TableWriter("int-vector", words_wspec)
                   if words_wspec else None)
    n = err = 0
    for key, loglikes in items:
        lat = dec.decode(loglikes, tm.id2pdf_id, acoustic_scale)
        if lat is None:
            err += 1
            continue
        out_lat = determinize_lattice(lat) if dopts.determinize_lattice \
            else lat
        lat_writer.write(key, out_lat)
        if word_writer:
            _, words, _ = lattice_best_path(lat)
            word_writer.write(key, words)
        n += 1
    lat_writer.close()
    if word_writer:
        word_writer.close()
    log(f"{name}: decoded {n} utterances ({err} failed)")
    return 0 if n else 1


def nnet3_latgen_faster_looped(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate lattices with a LOOPED (streaming, constant-memory) "
        "nnet3 computation — recurrent/TDNN history carried across "
        "chunks (decodable-online-looped.h:135 AdvanceChunk; here a "
        "rolling input window, nnet3/streaming.py).\n"
        "Usage: nnet3-latgen-faster-looped [options] <trans-model> "
        "<nnet-dir> <fst-in> <features-rspecifier> "
        "<lattice-wspecifier> [<words-wspecifier>]")
    from kaldi_tpu.decoder.lattice_decoder import (
        LatticeFasterDecoder, LatticeFasterDecoderOptions)
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    chunk = po.register_value(
        "frames-per-chunk", 50, "Input frames per streaming chunk")
    extra_left = po.register_value(
        "extra-left-context", 20, "Left context frames kept per chunk")
    extra_right = po.register_value(
        "extra-right-context", 20, "Right lookahead frames per chunk")
    sub = po.register_value(
        "frame-subsampling-factor", 1,
        "Output frame subsampling of the nnet")
    po.read(argv)
    if po.num_args() < 5:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.nnet3.streaming import OnlineNnetScorer
    tm, _m, _v, forward = _load_tm_and_model(po.get_arg(1),
                                             po.get_arg(2))
    hclg = read_fst_file(po.get_arg(3))
    dec = LatticeFasterDecoder(hclg, dopts)

    def items():
        for key, feats in SequentialTableReader("matrix", po.get_arg(4)):
            scorer = OnlineNnetScorer(
                lambda w: forward(w), left_context=extra_left[0],
                right_context=extra_right[0], subsample=sub[0])
            outs = []
            T = feats.shape[0]
            for s in range(0, T, chunk[0]):
                got = scorer.accept_features(feats[s:s + chunk[0]])
                if got.size:
                    outs.append(got)
            got = scorer.finish()
            if got.size:
                outs.append(got)
            yield key, np.concatenate(outs) if outs else \
                np.zeros((0, 1), np.float32)

    return _decode_loop(items(), dec, tm, acoustic_scale[0], dopts,
                        po.get_arg(5),
                        po.get_arg(6) if po.num_args() >= 6 else None,
                        "nnet3-latgen-faster-looped")


def nnet3_latgen_faster_batch(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate lattices with the nnet3 forward MINIBATCHED across "
        "utterances (nnet3-latgen-faster-batch.cc: batched AM "
        "computation; here one padded device batch per --minibatch-"
        "size utterances — the TPU-native form of the same saturation"
        ").\n"
        "Usage: nnet3-latgen-faster-batch [options] <trans-model> "
        "<nnet-dir> <fst-in> <features-rspecifier> "
        "<lattice-wspecifier> [<words-wspecifier>]")
    from kaldi_tpu.decoder.lattice_decoder import (
        LatticeFasterDecoder, LatticeFasterDecoderOptions)
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    mb = po.register_value("minibatch-size", 8,
                           "Utterances per AM forward batch")
    po.read(argv)
    if po.num_args() < 5:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    tm, _m, _v, forward = _load_tm_and_model(po.get_arg(1),
                                             po.get_arg(2))
    hclg = read_fst_file(po.get_arg(3))
    dec = LatticeFasterDecoder(hclg, dopts)

    def items():
        pend: List = []
        for kv in SequentialTableReader("matrix", po.get_arg(4)):
            pend.append(kv)
            if len(pend) == mb[0]:
                yield from flush(pend)
                pend = []
        if pend:
            yield from flush(pend)

    def flush(pend):
        Tmax = max(f.shape[0] for _, f in pend)
        D = pend[0][1].shape[1]
        batch = np.zeros((len(pend), Tmax, D), np.float32)
        for i, (_, f) in enumerate(pend):
            batch[i, :f.shape[0]] = f
        out = forward(batch)
        ratio = out.shape[1] / float(Tmax)
        for i, (key, f) in enumerate(pend):
            T_out = max(1, int(round(f.shape[0] * ratio)))
            yield key, out[i, :T_out]

    return _decode_loop(items(), dec, tm, acoustic_scale[0], dopts,
                        po.get_arg(5),
                        po.get_arg(6) if po.num_args() >= 6 else None,
                        "nnet3-latgen-faster-batch")


def nnet3_latgen_faster_lookahead(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate lattices decoding an HCLr graph composed ON THE FLY "
        "with a grammar Gr (nnet3-latgen-faster-lookahead.cc: "
        "lookahead composition replaces the prebuilt HCLG; "
        "decoder/biglm.py LazyComposeFst).\n"
        "Usage: nnet3-latgen-faster-lookahead [options] <trans-model> "
        "<nnet-dir> <hcl-fst> <g-fst> <features-rspecifier> "
        "<lattice-wspecifier> [<words-wspecifier>]")
    from kaldi_tpu.decoder.lattice_decoder import (
        LatticeFasterDecoder, LatticeFasterDecoderOptions)
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() < 6:
        po.print_usage()
        return 1
    from kaldi_tpu.decoder.biglm import BackoffWordFst, LazyComposeFst
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    tm, _m, _v, forward = _load_tm_and_model(po.get_arg(1),
                                             po.get_arg(2))
    hcl = read_fst_file(po.get_arg(3))
    g = BackoffWordFst(read_fst_file(po.get_arg(4)))
    dec = LatticeFasterDecoder(LazyComposeFst(hcl, g), dopts)

    def items():
        for key, feats in SequentialTableReader("matrix", po.get_arg(5)):
            yield key, forward(feats[None])[0]

    return _decode_loop(items(), dec, tm, acoustic_scale[0], dopts,
                        po.get_arg(6),
                        po.get_arg(7) if po.num_args() >= 7 else None,
                        "nnet3-latgen-faster-lookahead")


def nnet3_latgen_faster_looped_parallel(argv: List[str]) -> int:
    """nnet3-latgen-faster-looped-parallel.cc: the reference runs N
    decoder threads over a shared looped computation; here the
    worker pool decodes utterances concurrently (the nnet forward is
    one shared jitted computation; the host-side lattice
    determinization is the parallel part, as in the reference's
    DecodeUtteranceLatticeFasterClass)."""
    import concurrent.futures as _cf
    # strip --num-threads (accepted for contract parity) and delegate
    # the remaining flags to the looped implementation with a
    # thread-pooled decode loop
    num_threads = 4
    rest = []
    for a in argv[1:]:
        if a.startswith("--num-threads"):
            num_threads = int(a.split("=", 1)[1])
        else:
            rest.append(a)
    if num_threads <= 1:
        return nnet3_latgen_faster_looped(
            ["nnet3-latgen-faster-looped"] + rest)
    # monkey-patch-free parallel path: reuse the looped single-utt
    # pipeline but fan the per-utterance work over a pool
    po = ParseOptions(
        "Parallel variant of nnet3-latgen-faster-looped "
        "(nnet3-latgen-faster-looped-parallel.cc).\n"
        "Usage: nnet3-latgen-faster-looped-parallel [options] "
        "<trans-model> <nnet-dir> <fst-in> <features-rspecifier> "
        "<lattice-wspecifier> [<words-wspecifier>]")
    from kaldi_tpu.decoder.lattice_decoder import (
        LatticeFasterDecoder, LatticeFasterDecoderOptions)
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    chunk = po.register_value(
        "frames-per-chunk", 50, "Input frames per streaming chunk")
    extra_left = po.register_value(
        "extra-left-context", 20, "Left context frames kept per chunk")
    extra_right = po.register_value(
        "extra-right-context", 20, "Right lookahead frames per chunk")
    sub = po.register_value(
        "frame-subsampling-factor", 1,
        "Output frame subsampling of the nnet")
    po.read(["nnet3-latgen-faster-looped-parallel"] + rest)
    if po.num_args() < 5:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.nnet3.streaming import OnlineNnetScorer
    tm, _m, _v, forward = _load_tm_and_model(po.get_arg(1),
                                             po.get_arg(2))
    hclg = read_fst_file(po.get_arg(3))
    dec = LatticeFasterDecoder(hclg, dopts)

    def loglikes_of(feats):
        scorer = OnlineNnetScorer(
            lambda w: forward(w), left_context=extra_left[0],
            right_context=extra_right[0], subsample=sub[0])
        outs = []
        for s in range(0, feats.shape[0], chunk[0]):
            got = scorer.accept_features(feats[s:s + chunk[0]])
            if got.size:
                outs.append(got)
        got = scorer.finish()
        if got.size:
            outs.append(got)
        return np.concatenate(outs) if outs else \
            np.zeros((0, 1), np.float32)

    # the nnet forward stays sequential (one device); the decode +
    # determinization runs in the pool
    with _cf.ThreadPoolExecutor(max_workers=num_threads) as pool:
        futures = []
        for key, feats in SequentialTableReader("matrix",
                                                po.get_arg(4)):
            ll = loglikes_of(np.asarray(feats))
            futures.append((key, pool.submit(
                LatticeFasterDecoder(hclg, dopts).decode, ll,
                tm.id2pdf_id, acoustic_scale[0])))
        results = [(key, fut.result()) for key, fut in futures]
    from kaldi_tpu.lat.functions import (determinize_lattice,
                                         lattice_best_path)
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    lat_writer = TableWriter(LatticeHolder(), po.get_arg(5))
    word_writer = (TableWriter("int-vector", po.get_arg(6))
                   if po.num_args() >= 6 else None)
    n = err = 0
    for key, lat in results:
        if lat is None:
            err += 1
            continue
        out_lat = determinize_lattice(lat) if dopts.determinize_lattice \
            else lat
        lat_writer.write(key, out_lat)
        if word_writer:
            _, words, _ = lattice_best_path(lat)
            word_writer.write(key, words)
        n += 1
    lat_writer.close()
    if word_writer:
        word_writer.close()
    log(f"nnet3-latgen-faster-looped-parallel: decoded {n} utterances "
        f"({err} failed) with {num_threads} threads")
    return 0 if n else 1
