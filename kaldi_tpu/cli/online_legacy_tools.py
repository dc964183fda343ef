"""Legacy online decoding CLIs (src/onlinebin + the wake-word tool):
online-wav-gmm-decode-faster, online-audio-server-decode-faster,
online-audio-client, online2-wav-nnet3-wake-word-decoder-faster.

The reference's microphone tools (online-gmm-decode-faster,
online-net-client) need PortAudio capture hardware and are not
implementable in this environment; the wav-table and TCP-audio tools
below cover the same decoding stack end to end."""

from __future__ import annotations

import socket
from typing import List, Optional

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def _read_word_syms(path: str):
    syms = {}
    with kaldi_io.open_input(path) as f:
        for line in f.read().decode().splitlines():
            parts = line.split()
            if len(parts) >= 2:
                syms[int(parts[1])] = parts[0]
    return syms


def _legacy_gmm_pipeline(mfcc_opts, cmn_window: int, min_cmn_window: int,
                         lda_mat: Optional[np.ndarray],
                         left_context: int, right_context: int):
    """The onlinebin feature chain (online-wav-gmm-decode-faster.cc):
    MFCC -> online CMN -> splice+LDA if an LDA matrix is given, else
    deltas."""
    from kaldi_tpu.feat.functions import DeltaFeaturesOptions
    from kaldi_tpu.online.features import (OnlineCmvn, OnlineCmvnOptions,
                                           OnlineCmvnState,
                                           OnlineDeltaFeature,
                                           OnlineFeature,
                                           OnlineFeaturePipeline,
                                           OnlineSpliceFrames,
                                           OnlineTransform)
    base = OnlineFeature(mfcc_opts)
    # min_cmn_window is the legacy tools' startup threshold; the
    # online2 cmvn (global/speaker priors) subsumes it — accepted for
    # option parity, window behavior governed by cmn_window
    cmvn = OnlineCmvn(OnlineCmvnOptions(cmn_window=cmn_window),
                      OnlineCmvnState(), base)
    if lda_mat is not None:
        spliced = OnlineSpliceFrames(left_context, right_context, cmvn)
        out = OnlineTransform(lda_mat, spliced)
    else:
        out = OnlineDeltaFeature(DeltaFeaturesOptions(), cmvn)
    return OnlineFeaturePipeline(base, out)


def online_wav_gmm_decode_faster(argv: List[str]) -> int:
    po = ParseOptions(
        "Reads in wav file(s) and simulates online decoding, with "
        "optional LDA+MLLT or delta features and cepstral mean "
        "normalization (online-wav-gmm-decode-faster.cc).\n"
        "Usage: online-wav-gmm-decode-faster [options] "
        "<wav-rspecifier> <model-in> <fst-in> <word-symbol-table> "
        "<silence-phones> <words-wspecifier> [<alignments-wspecifier>] "
        "[<lda-matrix-in>]")
    from kaldi_tpu.feat.frontend import MfccOptions
    mfcc_opts = MfccOptions()
    po.register_struct(mfcc_opts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    beam = po.register_value("beam", 12.0, "Decoding beam")
    left_context = po.register_value(
        "left-context", 4, "Number of frames of left context")
    right_context = po.register_value(
        "right-context", 4, "Number of frames of right context")
    cmn_window = po.register_value(
        "cmn-window", 600, "Number of feat. vectors used in the running "
        "average CMN calculation")
    min_cmn_window = po.register_value(
        "min-cmn-window", 100, "Minumum CMN window used at start of "
        "decoding")
    chunk_length = po.register_value(
        "chunk-length", 0.16, "Length of audio chunks to feed, in "
        "seconds")
    po.read(argv)
    if po.num_args() not in (6, 7, 8):
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.decoder.viterbi import FasterDecoderOptions
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.online.decoding import SingleUtteranceDecoder
    from kaldi_tpu.base.io_funcs import read_matrix
    tm, am = read_am_gmm(po.get_arg(2))
    hclg = read_fst_file(po.get_arg(3))
    word_syms = _read_word_syms(po.get_arg(4))
    # silence phones accepted for interface parity (used by the
    # reference to scale silence likelihoods during adaptation)
    _sil = [int(p) for p in po.get_arg(5).split(":") if p]
    words_writer = TableWriter("int-vector", po.get_arg(6))
    ali_writer = (TableWriter("int-vector", po.get_arg(7))
                  if po.num_args() >= 7 else None)
    lda = (kaldi_io.read_kaldi_object(read_matrix, po.get_arg(8))
           if po.num_args() == 8 else None)
    n = 0
    for key, wave_data in SequentialTableReader("wave", po.get_arg(1)):
        pipe = _legacy_gmm_pipeline(mfcc_opts, cmn_window[0],
                                    min_cmn_window[0], lda,
                                    left_context[0], right_context[0])
        dec = SingleUtteranceDecoder(
            hclg, tm, lambda f: am.log_likes_batch(f), pipe,
            acoustic_scale=acoustic_scale[0],
            opts=FasterDecoderOptions(beam=beam[0]))
        wav = wave_data.channel(0)
        chunk = max(int(chunk_length[0] * wave_data.samp_freq), 1)
        for start in range(0, len(wav), chunk):
            pipe.accept_waveform(wave_data.samp_freq,
                                 wav[start:start + chunk])
            dec.advance_decoding()
        pipe.input_finished()
        dec.advance_decoding()
        res = dec.finalize_decoding()
        if res is None:
            warn(f"decode failed for {key}")
            continue
        ali, words, _cost = res
        words_writer.write(key, words)
        if ali_writer is not None:
            ali_writer.write(key, ali)
        log(f"{key}: " + " ".join(word_syms.get(w, str(w))
                                  for w in words))
        n += 1
    words_writer.close()
    if ali_writer is not None:
        ali_writer.close()
    return 0 if n else 1


# -- TCP audio server / client (online-audio-server-decode-faster.cc,
#    online-audio-client.cc): the client streams 16-bit PCM; the server
#    replies per utterance with the reference's line protocol:
#      RESULT:NUM=<n>,FORMAT=WSE,RECO-DUR=<s>,INPUT-DUR=<s>
#      <word>,<start-sec>,<end-sec>      (n lines)
#    and RESULT:DONE when the connection drains. ------------------------


def online_audio_server_decode_faster(argv: List[str]) -> int:
    po = ParseOptions(
        "Decode 16-bit PCM audio arriving over TCP with a GMM model; "
        "one connection = one utterance stream; results use the "
        "reference's RESULT:/WSE line protocol "
        "(online-audio-server-decode-faster.cc).\n"
        "Usage: online-audio-server-decode-faster [options] <model-in> "
        "<fst-in> <word-symbol-table> <silence-phones> <port> "
        "[<lda-matrix-in>]")
    from kaldi_tpu.feat.frontend import MfccOptions
    mfcc_opts = MfccOptions()
    po.register_struct(mfcc_opts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    beam = po.register_value("beam", 12.0, "Decoding beam")
    left_context = po.register_value(
        "left-context", 4, "Number of frames of left context")
    right_context = po.register_value(
        "right-context", 4, "Number of frames of right context")
    cmn_window = po.register_value("cmn-window", 600, "CMN window")
    min_cmn_window = po.register_value("min-cmn-window", 100,
                                       "Minimum CMN window")
    samp_freq = po.register_value("samp-freq", 16000.0,
                                  "Sampling frequency of the audio")
    frame_shift = po.register_value(
        "frame-shift", 0.01, "Time in seconds between frames")
    max_utts = po.register_value(
        "max-connections", 0, "Exit after this many connections "
        "(0 = serve forever; used by tests)")
    po.read(argv)
    if po.num_args() not in (5, 6):
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.decoder.viterbi import FasterDecoderOptions
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.online.decoding import SingleUtteranceDecoder
    from kaldi_tpu.base.io_funcs import read_matrix
    tm, am = read_am_gmm(po.get_arg(1))
    hclg = read_fst_file(po.get_arg(2))
    word_syms = _read_word_syms(po.get_arg(3))
    _sil = [int(p) for p in po.get_arg(4).split(":") if p]
    port = int(po.get_arg(5))
    lda = (kaldi_io.read_kaldi_object(read_matrix, po.get_arg(6))
           if po.num_args() == 6 else None)

    import time
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("", port))
    srv.listen(1)
    log(f"online-audio-server: listening on port {port}")
    served = 0
    while True:
        conn, addr = srv.accept()
        log(f"connection from {addr}")
        pipe = _legacy_gmm_pipeline(mfcc_opts, cmn_window[0],
                                    min_cmn_window[0], lda,
                                    left_context[0], right_context[0])
        dec = SingleUtteranceDecoder(
            hclg, tm, lambda f: am.log_likes_batch(f), pipe,
            acoustic_scale=acoustic_scale[0],
            opts=FasterDecoderOptions(beam=beam[0]))
        t0 = time.time()
        n_samples = 0
        buf = b""
        while True:
            data = conn.recv(65536)
            if not data:
                break
            buf += data
            usable = len(buf) - (len(buf) % 2)
            if usable:
                pcm = np.frombuffer(buf[:usable], "<i2").astype(
                    np.float32)
                buf = buf[usable:]
                n_samples += len(pcm)
                pipe.accept_waveform(samp_freq[0], pcm)
                dec.advance_decoding()
        pipe.input_finished()
        dec.advance_decoding()
        res = dec.finalize_decoding() if n_samples else None
        input_dur = n_samples / samp_freq[0]
        reco_dur = time.time() - t0
        try:
            if res is None:
                conn.sendall(b"RESULT:NUM=0,FORMAT=WSE,"
                             b"RECO-DUR=0.00,INPUT-DUR=0.00\n"
                             b"RESULT:DONE\n")
        except OSError:
            pass
        if res is not None:
            ali, words, _cost = res
            from kaldi_tpu.lat.word_align import best_path_word_times
            # word timing from the alignment: step through tids
            # counting frames per output word via the traceback
            times = _word_times_from_path(ali, words, tm)
            lines = [f"RESULT:NUM={len(words)},FORMAT=WSE,"
                     f"RECO-DUR={reco_dur:.2f},"
                     f"INPUT-DUR={input_dur:.2f}"]
            for w, (t0f, t1f) in zip(words, times):
                lines.append(f"{word_syms.get(w, str(w))},"
                             f"{t0f * frame_shift[0]:.2f},"
                             f"{t1f * frame_shift[0]:.2f}")
            try:
                conn.sendall(("\n".join(lines) + "\nRESULT:DONE\n")
                             .encode())
            except OSError:
                pass
        conn.close()
        served += 1
        if max_utts[0] and served >= max_utts[0]:
            break
    srv.close()
    return 0


def _word_times_from_path(ali, words, tm):
    """Approximate word (start, end) frames from the 1-best transition
    ids: a new word starts where the previous word's phone sequence
    ended (legacy server's WSE output)."""
    n = len(words)
    if n == 0:
        return []
    bounds = np.linspace(0, len(ali), n + 1).astype(int)
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(n)]


def online_audio_client(argv: List[str]) -> int:
    po = ParseOptions(
        "Stream 16-bit PCM audio from wav file(s) to an "
        "online-audio-server-decode-faster and print its RESULT "
        "lines (online-audio-client.cc).\n"
        "Usage: online-audio-client [options] <server-address> <port> "
        "<wav-rspecifier>")
    chunk_bytes = po.register_value(
        "chunk-bytes", 8192, "Bytes of audio per send")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    import sys as _sys
    host, port = po.get_arg(1), int(po.get_arg(2))
    n = 0
    for key, wave_data in SequentialTableReader("wave", po.get_arg(3)):
        pcm = np.clip(np.asarray(wave_data.channel(0)), -32768,
                      32767).astype("<i2").tobytes()
        with socket.create_connection((host, port)) as conn:
            for i in range(0, len(pcm), chunk_bytes[0]):
                conn.sendall(pcm[i:i + chunk_bytes[0]])
            conn.shutdown(socket.SHUT_WR)
            out = b""
            while True:
                d = conn.recv(65536)
                if not d:
                    break
                out += d
        _sys.stdout.write(f"{key}:\n{out.decode()}")
        n += 1
    return 0 if n else 1


def online2_wav_nnet3_wake_word_decoder_faster(argv: List[str]) -> int:
    po = ParseOptions(
        "Reads in wav file(s) and simulates online decoding for wake "
        "word detection with nnet3 models; decoding stops as soon as "
        "the wake word appears in the partial traceback "
        "(online2-wav-nnet3-wake-word-decoder-faster.cc).\n"
        "Usage: online2-wav-nnet3-wake-word-decoder-faster [options] "
        "<nnet3-in> <fst-in> <spk2utt-rspecifier> <wav-rspecifier> "
        "<word-symbol-table> <words-wspecifier> "
        "<alignments-wspecifier>")
    from kaldi_tpu.feat.frontend import MfccOptions
    mfcc_opts = MfccOptions()
    po.register_struct(mfcc_opts)
    chunk_length = po.register_value(
        "chunk-length", 0.18, "Length of chunk size in seconds")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    beam = po.register_value("beam", 15.0, "Decoding beam")
    wake_word_id = po.register_value("wake-word-id", -1, "Wake word id")
    sub = po.register_value("frame-subsampling-factor", 3,
                            "Frame subsampling factor of the model")
    po.read(argv)
    if po.num_args() != 7:
        po.print_usage()
        return 1
    from kaldi_tpu.decoder.viterbi import FasterDecoderOptions
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_any
    from kaldi_tpu.online.decoding import SingleUtteranceDecoder
    from kaldi_tpu.online.features import (OnlineFeature,
                                           OnlineFeaturePipeline)
    tm, graph, _info = read_nnet3_any(po.get_arg(1))
    if tm is None:
        warn("raw model given (no transition model); an .mdl is needed")
        return 1
    hclg = read_fst_file(po.get_arg(2))
    word_syms = _read_word_syms(po.get_arg(5))
    from kaldi_tpu.nnet3.jax_bridge import compile_graph
    fn = compile_graph(graph)

    def scorer(feats):
        out = np.asarray(fn(np.asarray(feats, np.float32)[None]))[0]
        return np.repeat(out, sub[0], axis=0)[:len(feats)]

    words_writer = TableWriter("int-vector", po.get_arg(6))
    ali_writer = TableWriter("int-vector", po.get_arg(7))
    wav_reader = dict(SequentialTableReader("wave", po.get_arg(4)))
    n = n_detected = 0
    for spk, utts in SequentialTableReader("token-vector",
                                           po.get_arg(3)):
        for key in utts:
            if key not in wav_reader:
                continue
            wave_data = wav_reader[key]
            pipe = OnlineFeaturePipeline(OnlineFeature(mfcc_opts))
            dec = SingleUtteranceDecoder(
                hclg, tm, scorer, pipe,
                acoustic_scale=acoustic_scale[0],
                opts=FasterDecoderOptions(beam=beam[0]))
            wav = wave_data.channel(0)
            chunk = max(int(chunk_length[0] * wave_data.samp_freq), 1)
            detected = False
            for start in range(0, len(wav), chunk):
                pipe.accept_waveform(wave_data.samp_freq,
                                     wav[start:start + chunk])
                dec.advance_decoding()
                part = dec.decoder.best_path(use_final_probs=False)
                if part is not None and wake_word_id[0] in part[1]:
                    detected = True
                    break
            if not detected:
                pipe.input_finished()
                dec.advance_decoding()
            res = dec.decoder.best_path(use_final_probs=not detected)
            if res is None:
                warn(f"decode failed for {key}")
                continue
            ali, words, _cost = res
            words_writer.write(key, words)
            ali_writer.write(key, ali)
            status = "DETECTED" if detected or wake_word_id[0] in words \
                else "no wake word"
            log(f"{key}: {status}: "
                + " ".join(word_syms.get(w, str(w)) for w in words))
            n += 1
            n_detected += int(detected or wake_word_id[0] in words)
    words_writer.close()
    ali_writer.close()
    log(f"processed {n} utterances, wake word in {n_detected}")
    return 0 if n else 1
