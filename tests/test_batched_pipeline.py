"""Multi-stream batched online pipeline: interleaved streams decode
identically to single-utterance decoding."""

import numpy as np
import pytest

from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions
from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
from kaldi_tpu.feat.window import FrameExtractionOptions
from kaldi_tpu.online.batched_pipeline import (BatchedOnlinePipeline,
                                               decode_streams)

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus, unigram_g


@pytest.fixture(scope="module")
def system():
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=5)
    fopts = MfccOptions(frame_opts=FrameExtractionOptions(
        samp_freq=FS, dither=0.0))
    comp = OfflineFeature(fopts)
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=6, totgauss=30,
                                       realign_iters=(1, 2, 3, 4, 5)))
    hclg = make_hclg(sys_, unigram_g(lang))
    return sys_, hclg, fopts, test_wav, test_txt, lang, comp


def test_multi_stream_equals_single(system):
    sys_, hclg, fopts, test_wav, test_txt, lang, comp = system
    pipeline = BatchedOnlinePipeline(
        hclg, sys_.tm, fopts,
        scorer=lambda f: sys_.am.log_likes_batch(f),
        num_channels=3, acoustic_scale=0.1)
    results = decode_streams(pipeline, test_wav, FS, chunk_seconds=0.25)
    # reference: offline single-utterance decoding
    dec = FasterDecoder(hclg, FasterDecoderOptions(beam=16.0))
    for utt, wave in test_wav.items():
        feats = comp.compute(wave)
        ll = sys_.am.log_likes_batch(feats)
        ref = dec.decode(ll, sys_.tm.id2pdf_id, 0.1)
        assert results[utt] == ref[1], utt


def test_channel_reuse(system):
    sys_, hclg, fopts, test_wav, test_txt, lang, comp = system
    pipeline = BatchedOnlinePipeline(
        hclg, sys_.tm, fopts,
        scorer=lambda f: sys_.am.log_likes_batch(f),
        num_channels=1, acoustic_scale=0.1)
    # 1 channel, many utterances: forces serial channel reuse
    results = decode_streams(pipeline, dict(list(test_wav.items())[:3]), FS)
    assert len(results) == 3
    for utt, words in results.items():
        hyp = [lang.word_names[w] for w in words]
        assert hyp == test_txt[utt]
