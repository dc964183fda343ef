"""Native C++ decoder fast path: equality with the Python decoder and a
speed sanity check."""

import time

import numpy as np
import pytest

from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions
from kaldi_tpu.native import NativeViterbi, get_lib

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus, unigram_g

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no native toolchain")


@pytest.fixture(scope="module")
def system():
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=3)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=6, totgauss=30,
                                       realign_iters=(1, 2, 3, 4, 5)))
    hclg = make_hclg(sys_, unigram_g(lang))
    return sys_, hclg, sf


def test_matches_python_decoder(system):
    sys_, hclg, sf = system
    nat = NativeViterbi(hclg)
    assert nat.available
    for utt, feats in sf.items():
        ll = sys_.am.log_likes_batch(feats)
        py = FasterDecoder(hclg, FasterDecoderOptions(beam=1e9)).decode(
            ll, sys_.tm.id2pdf_id, 0.1)
        na = nat.decode(ll, sys_.tm.id2pdf_id, 0.1)
        assert na is not None and py is not None
        assert na[1] == py[1]
        assert na[0] == py[0]
        # C++ accumulates the path cost in fp32; at |cost| ~ 1e3 over
        # hundreds of frames the drift vs the fp64 Python sum is ~1e-3
        assert na[2] == pytest.approx(py[2], rel=1e-5, abs=1e-3)


def test_beam_pruning_still_correct(system):
    sys_, hclg, sf = system
    nat = NativeViterbi(hclg)
    utt = list(sf)[0]
    ll = sys_.am.log_likes_batch(sf[utt])
    exact = nat.decode(ll, sys_.tm.id2pdf_id, 0.1, beam=1e9)
    beamed = nat.decode(ll, sys_.tm.id2pdf_id, 0.1, beam=16.0)
    assert beamed is not None
    assert beamed[1] == exact[1]


def test_faster_than_python(system):
    sys_, hclg, sf = system
    nat = NativeViterbi(hclg)
    utt = list(sf)[0]
    ll = np.tile(sys_.am.log_likes_batch(sf[utt]), (4, 1))
    t0 = time.time()
    nat.decode(ll, sys_.tm.id2pdf_id, 0.1)
    t_native = time.time() - t0
    t0 = time.time()
    FasterDecoder(hclg, FasterDecoderOptions(beam=1e9)).decode(
        ll, sys_.tm.id2pdf_id, 0.1)
    t_python = time.time() - t0
    print(f"native {t_native * 1e3:.1f}ms vs python {t_python * 1e3:.1f}ms")
    assert t_native < t_python
