"""online2bin-equivalent CLIs: online2-wav-gmm-latgen-faster (streaming
decode of wav tables with chunked feature/decoder advance, endpointing
and RTF reporting)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def online2_wav_gmm_latgen_faster(argv: List[str]) -> int:
    po = ParseOptions(
        "Reads in wav file(s) and simulates online decoding with a GMM-based\n"
        "model, decoding in chunks as audio arrives.\n"
        "Usage: online2-wav-gmm-latgen-faster [options] <model-in> <fst-in> "
        "<wav-rspecifier> <word-wspecifier>")
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.decoder.viterbi import FasterDecoderOptions
    from kaldi_tpu.feat.frontend import MfccOptions
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.online.decoding import SingleUtteranceDecoder
    from kaldi_tpu.online.features import OnlineFeature, OnlineFeaturePipeline
    from kaldi_tpu.util.profile import OnlineTimer
    mfcc_opts = MfccOptions()
    po.register_struct(mfcc_opts)
    chunk_length = po.register_value("chunk-length", 0.18, "Length of chunk size in seconds, that we process")
    acoustic_scale = po.register_value("acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    beam = po.register_value("beam", 16.0, "Decoding beam")
    do_endpointing = po.register_value("do-endpointing", False, "If true, apply endpoint detection")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    tm, am = read_am_gmm(po.get_arg(1))
    hclg = read_fst_file(po.get_arg(2))
    writer = TableWriter("int-vector", po.get_arg(4))
    n = 0
    total_audio = total_wall = 0.0
    for key, wave_data in SequentialTableReader("wave", po.get_arg(3)):
        pipe = OnlineFeaturePipeline(OnlineFeature(mfcc_opts))
        dec = SingleUtteranceDecoder(
            hclg, tm, lambda f: am.log_likes_batch(f), pipe,
            acoustic_scale=acoustic_scale[0],
            opts=FasterDecoderOptions(beam=beam[0]))
        timer = OnlineTimer(key)
        wav = wave_data.channel(0)
        chunk = max(int(chunk_length[0] * wave_data.samp_freq), 1)
        for start in range(0, len(wav), chunk):
            pipe.accept_waveform(wave_data.samp_freq,
                                 wav[start:start + chunk])
            dec.advance_decoding()
        pipe.input_finished()
        dec.advance_decoding()
        res = dec.finalize_decoding()
        timer.compute_now(wave_data.duration)
        if res is None:
            warn(f"decode failed for {key}")
            continue
        writer.write(key, res[1])
        total_audio += wave_data.duration
        total_wall += timer.real_time_factor() * wave_data.duration
        n += 1
    writer.close()
    if total_wall > 0:
        log(f"decoded {n} utterances; overall RTF "
            f"{total_wall / max(total_audio, 1e-9):.3f} "
            f"({total_audio / max(total_wall, 1e-9):.1f}x realtime)")
    return 0 if n else 1


def online2_wav_nnet3_latgen_faster(argv: List[str]) -> int:
    po = ParseOptions(
        "Reads in wav file(s) and simulates online decoding with a "
        "neural net\n(nnet3 .mdl as produced by our exporter or the "
        "reference), decoding\nin chunks as audio arrives. Chain models: "
        "use --frame-subsampling-factor=3 --acoustic-scale=1.0.\n"
        "Usage: online2-wav-nnet3-latgen-faster [options] <nnet3-in> "
        "<fst-in> <wav-rspecifier> <word-wspecifier>")
    from kaldi_tpu.decoder.viterbi import FasterDecoderOptions
    from kaldi_tpu.feat.frontend import MfccOptions
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_any
    from kaldi_tpu.online.decoding import SingleUtteranceDecoder
    from kaldi_tpu.online.features import (OnlineFeature,
                                           OnlineFeaturePipeline)
    from kaldi_tpu.util.profile import OnlineTimer
    mfcc_opts = MfccOptions()
    po.register_struct(mfcc_opts)
    chunk_length = po.register_value("chunk-length", 0.18, "Length of chunk size in seconds, that we process")
    acoustic_scale = po.register_value("acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    beam = po.register_value("beam", 15.0, "Decoding beam")
    word_ins_penalty = po.register_value("word-ins-penalty", 0.0, "Word insertion penalty")
    sub = po.register_value("frame-subsampling-factor", 3, "Frame subsampling factor of the model")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    tm, graph, _info = read_nnet3_any(po.get_arg(1))
    if tm is None:
        warn("raw model given (no transition model); an .mdl is needed")
        return 1
    hclg = read_fst_file(po.get_arg(2))

    def scorer(feats):
        out = graph.forward(np.asarray(feats))
        return out[::sub[0]] if sub[0] > 1 else out

    class _SubsampledPipe:
        """Presents the feature pipeline to the decoder at the OUTPUT
        frame rate so scores and decoder frames line up."""

        def __init__(self, pipe):
            self.pipe = pipe

        def num_frames_ready(self):
            return self.pipe.num_frames_ready() // sub[0] * sub[0]

        def get_frames(self, lo, hi):
            return self.pipe.get_frames(lo, hi)

    writer = TableWriter("int-vector", po.get_arg(4))
    n = 0
    total_audio = total_wall = 0.0
    for key, wave_data in SequentialTableReader("wave", po.get_arg(3)):
        pipe = OnlineFeaturePipeline(OnlineFeature(mfcc_opts))
        dec = SingleUtteranceDecoder(
            hclg, tm, scorer, _SubsampledPipe(pipe),
            acoustic_scale=acoustic_scale[0],
            opts=FasterDecoderOptions(beam=beam[0]),
            word_ins_penalty=word_ins_penalty[0])
        timer = OnlineTimer(key)
        wav = wave_data.channel(0)
        chunk = max(int(chunk_length[0] * wave_data.samp_freq), 1)
        for start in range(0, len(wav), chunk):
            pipe.accept_waveform(wave_data.samp_freq,
                                 wav[start:start + chunk])
            dec.advance_decoding()
        pipe.input_finished()
        dec.advance_decoding()
        res = dec.finalize_decoding()
        timer.compute_now(wave_data.duration)
        if res is None:
            warn(f"decode failed for {key}")
            continue
        writer.write(key, res[1])
        total_audio += wave_data.duration
        total_wall += timer.real_time_factor() * wave_data.duration
        n += 1
    writer.close()
    if total_wall > 0:
        log(f"decoded {n} utterances; overall RTF "
            f"{total_wall / max(total_audio, 1e-9):.3f} "
            f"({total_audio / max(total_wall, 1e-9):.1f}x realtime)")
    return 0 if n else 1
