"""Online + alignment CLI tail (parity: src/online2bin
online2-tcp-nnet3-decode-faster.cc, online2-wav-dump-features.cc;
src/bin align-compiled-mapped.cc; src/nnet3bin
nnet3-align-compiled.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def _read_words(path: str):
    """words.txt symbol table -> {id: word}."""
    names = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                names[int(parts[1])] = parts[0]
    return names


def online2_tcp_nnet3_decode_faster(argv: List[str]) -> int:
    po = ParseOptions(
        "TCP server for streaming nnet3 decoding: clients stream raw "
        "16-bit little-endian PCM; partial hypotheses come back "
        "'\\r'-terminated, finals '\\n'-terminated "
        "(online2-tcp-nnet3-decode-faster.cc protocol).\n"
        "Usage: online2-tcp-nnet3-decode-faster [options] <nnet3-in> "
        "<fst-in> <word-symbol-table>")
    from kaldi_tpu.feat.frontend import MfccOptions
    mfcc_opts = MfccOptions()
    po.register_struct(mfcc_opts)
    port = po.register_value("port-num", 5050, "Port to listen on")
    samp_freq = po.register_value("samp-freq", 8000.0,
                                  "Sampling frequency of the audio")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    sub = po.register_value("frame-subsampling-factor", 3,
                            "Frame subsampling factor of the model")
    chunk_ms = po.register_value("chunk-length-ms", 180,
                                 "Audio chunk size in milliseconds")
    max_conn = po.register_value(
        "num-connections", 0, "Exit after serving this many "
        "connections (0 = serve forever); used by tests")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_any
    from kaldi_tpu.online.features import (OnlineFeature,
                                           OnlineFeaturePipeline)
    from kaldi_tpu.online.server import TcpDecodeServer
    tm, graph, _info = read_nnet3_any(po.get_arg(1))
    if tm is None:
        warn("raw model given (no transition model); an .mdl is needed")
        return 1
    hclg = read_fst_file(po.get_arg(2))
    names = _read_words(po.get_arg(3))
    s = sub[0]

    def scorer(feats):
        out = graph.forward(np.asarray(feats))
        return out[::s] if s > 1 else out

    server = TcpDecodeServer(
        hclg, tm, scorer=scorer, word_names=names,
        make_pipeline=lambda: OnlineFeaturePipeline(
            OnlineFeature(mfcc_opts)),
        samp_freq=samp_freq[0], acoustic_scale=acoustic_scale[0],
        chunk_ms=chunk_ms[0], port=port[0])
    server.start()
    print(f"# listening on {server.host}:{server.port}", flush=True)
    try:
        import time as _time
        while True:
            _time.sleep(0.25)
            if max_conn[0] and server.num_served >= max_conn[0]:
                break
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
    return 0


def online2_wav_dump_features(argv: List[str]) -> int:
    po = ParseOptions(
        "Simulate the online feature pipeline on wav input and dump "
        "the features it would feed the decoder "
        "(online2-wav-dump-features.cc).\n"
        "Usage: online2-wav-dump-features [options] <wav-rspecifier> "
        "<feats-wspecifier>")
    from kaldi_tpu.feat.frontend import MfccOptions
    mfcc_opts = MfccOptions()
    po.register_struct(mfcc_opts)
    chunk_length = po.register_value(
        "chunk-length", 0.18, "Length of audio chunks fed to the "
        "online pipeline, in seconds")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.online.features import (OnlineFeature,
                                           OnlineFeaturePipeline)
    writer = TableWriter("matrix", po.get_arg(2))
    n = 0
    fs = mfcc_opts.frame_opts.samp_freq
    step = max(1, int(chunk_length[0] * fs))
    for key, wave_data in SequentialTableReader("wave", po.get_arg(1)):
        pipe = OnlineFeaturePipeline(OnlineFeature(mfcc_opts))
        wave = np.asarray(wave_data.channel(0))
        for i in range(0, len(wave), step):
            pipe.accept_waveform(fs, wave[i:i + step])
        pipe.input_finished()
        T = pipe.num_frames_ready()
        writer.write(key, pipe.get_frames(0, T))
        n += 1
    writer.close()
    log(f"dumped online features for {n} utterances")
    return 0 if n else 1


def align_compiled_mapped(argv: List[str]) -> int:
    po = ParseOptions(
        "Viterbi-align pre-computed loglike matrices to compiled "
        "training graphs (align-compiled-mapped.cc).\n"
        "Usage: align-compiled-mapped [options] <model-in> "
        "<graphs-rspecifier> <loglikes-rspecifier> "
        "<alignments-wspecifier>")
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.decoder.viterbi import FasterDecoder, \
        FasterDecoderOptions
    from kaldi_tpu.fstext.fst import VectorFst
    beam = po.register_value("beam", 10.0, "Decoding beam")
    retry_beam = po.register_value("retry-beam", 40.0,
                                   "Beam for the second attempt")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    tm = _read_tm(po.get_arg(1))
    graphs = RandomAccessTableReader(VectorFst, po.get_arg(2))
    writer = TableWriter("int-vector", po.get_arg(4))
    n = err = 0
    for key, ll in SequentialTableReader("matrix", po.get_arg(3)):
        if key not in graphs:
            warn(f"no graph for {key}")
            err += 1
            continue
        graph = graphs[key]
        ll = np.asarray(ll)
        res = FasterDecoder(graph, FasterDecoderOptions(
            beam=beam[0])).decode(ll, tm.id2pdf_id, acoustic_scale[0])
        if res is None and retry_beam[0] > beam[0]:
            res = FasterDecoder(graph, FasterDecoderOptions(
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


def nnet3_align_compiled(argv: List[str]) -> int:
    po = ParseOptions(
        "Viterbi-align features to compiled training graphs using an "
        "nnet3 model (nnet3-align-compiled.cc).  Chain models: "
        "--frame-subsampling-factor=3 (the alignment is at the "
        "subsampled rate, like the reference).\n"
        "Usage: nnet3-align-compiled [options] <nnet3-in> "
        "<graphs-rspecifier> <feats-rspecifier> "
        "<alignments-wspecifier>")
    from kaldi_tpu.decoder.viterbi import FasterDecoder, \
        FasterDecoderOptions
    from kaldi_tpu.fstext.fst import VectorFst
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_any
    beam = po.register_value("beam", 10.0, "Decoding beam")
    retry_beam = po.register_value("retry-beam", 40.0,
                                   "Beam for the second attempt")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    sub = po.register_value("frame-subsampling-factor", 1,
                            "Frame subsampling factor of the model")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    tm, graph_model, _info = read_nnet3_any(po.get_arg(1))
    if tm is None:
        warn("raw model given (no transition model); an .mdl is needed")
        return 1
    graphs = RandomAccessTableReader(VectorFst, po.get_arg(2))
    writer = TableWriter("int-vector", po.get_arg(4))
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(3)):
        if key not in graphs:
            warn(f"no graph for {key}")
            err += 1
            continue
        ll = graph_model.forward(np.asarray(feats))
        if sub[0] > 1:
            ll = ll[::sub[0]]
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
