"""TCP streaming decode server (parity: online2-tcp-nnet3-decode-faster
protocol): raw 16-bit PCM in, partial ('\\r') and final ('\\n')
hypotheses out, over a real socket."""

import socket

import numpy as np
import pytest

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus, unigram_g  # noqa: E402


@pytest.fixture(scope="module")
def served_system():
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.online.features import (OnlineFeature,
                                           OnlineFeaturePipeline)
    from kaldi_tpu.online.server import TcpDecodeServer
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)

    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=2)
    opts = MfccOptions(frame_opts=FrameExtractionOptions(samp_freq=FS,
                                                         dither=0.0))
    comp = OfflineFeature(opts)
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=5, totgauss=24,
                                       realign_iters=(1, 2, 3, 4)))
    hclg = make_hclg(sys_, unigram_g(lang))

    def make_pipeline():
        return OnlineFeaturePipeline(OnlineFeature(opts))

    server = TcpDecodeServer(
        hclg, sys_.tm,
        scorer=lambda feats: np.asarray(sys_.am.log_likes_batch(feats)),
        word_names=lang.word_names, make_pipeline=make_pipeline,
        samp_freq=FS, acoustic_scale=0.1)
    server.start()
    yield server, test_wav, test_txt, lang
    server.shutdown()


def _stream(server, wave, chunk=1600):
    """Client: stream PCM, half-close, collect the reply."""
    pcm = np.clip(wave, -32768, 32767).astype("<i2").tobytes()
    with socket.create_connection((server.host, server.port),
                                  timeout=30) as sock:
        for i in range(0, len(pcm), chunk):
            sock.sendall(pcm[i:i + chunk])
        sock.shutdown(socket.SHUT_WR)
        out = b""
        while True:
            data = sock.recv(4096)
            if not data:
                break
            out += data
    return out.decode()


def test_final_transcript_over_socket(served_system):
    server, test_wav, test_txt, lang = served_system
    for utt, wave in test_wav.items():
        reply = _stream(server, wave)
        finals = [seg for seg in reply.split("\n") if seg]
        final = finals[-1].split("\r")[-1].split()
        assert final == test_txt[utt], (utt, reply)


def test_partial_hypotheses_emitted(served_system):
    server, test_wav, test_txt, lang = served_system
    utt, wave = next(iter(test_wav.items()))
    reply = _stream(server, wave)
    # '\r'-terminated partials precede the final '\n' line
    assert "\r" in reply
    assert reply.rstrip().split("\r")[-1].split() == test_txt[utt]


def test_two_concurrent_clients(served_system):
    import threading
    server, test_wav, test_txt, lang = served_system
    results = {}

    def client(utt):
        results[utt] = _stream(server, test_wav[utt])

    threads = [threading.Thread(target=client, args=(u,))
               for u in test_wav]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for utt in test_wav:
        final = results[utt].rstrip().split("\r")[-1].split()
        assert final == test_txt[utt]
