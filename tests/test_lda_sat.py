"""LDA+MLLT and SAT recipe drivers end-to-end on the synthetic corpus."""

import numpy as np
import pytest

from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
from kaldi_tpu.feat.window import FrameExtractionOptions
from kaldi_tpu.recipes.lda_mllt import (TrainLdaMlltOptions, TrainSatOptions,
                                        train_lda_mllt, train_sat)
from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all, decode,
                                    make_hclg, train_mono)
from kaldi_tpu.transform.fmllr import apply_affine_transform
from kaldi_tpu.util.edit_distance import WerStats

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus, unigram_g


@pytest.fixture(scope="module")
def bootstrap():
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=10, num_test=3)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    mono = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=6, totgauss=30,
                                       realign_iters=(1, 2, 3, 4, 5)))
    compiler = TrainingGraphCompiler(mono.tm, mono.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    ali = _align_all(mono, graphs, tf, 10.0, 0.1, 1.0)
    return lang, tf, sf, train_txt, test_txt, mono, ali


@pytest.mark.slow
def test_train_lda_mllt(bootstrap):
    lang, tf, sf, train_txt, test_txt, mono, ali = bootstrap
    opts = TrainLdaMlltOptions(num_iters=6, totgauss=50, num_leaves=25,
                               realign_iters=(2, 4), tree_min_gain=20.0,
                               lda_dim=20, splice_left=2, splice_right=2,
                               mllt_iters=(1, 2))
    sys_, transform, feats = train_lda_mllt(lang, tf, train_txt, mono,
                                            ali, opts)
    assert transform.shape == (20, 13 * 5 + 1)
    # decode test set in the transformed space
    from kaldi_tpu.feat.functions import splice_frames
    sf_t = {u: apply_affine_transform(splice_frames(f, 2, 2), transform)
            for u, f in sf.items()}
    hclg = make_hclg(sys_, unigram_g(lang))
    hyps = decode(sys_, hclg, sf_t, acoustic_scale=0.1)
    stats = WerStats()
    for utt, ref in test_txt.items():
        stats.add(ref, hyps[utt])
    print("LDA+MLLT:", stats.report())
    assert stats.wer <= 10.0, stats.report()


@pytest.mark.slow
def test_train_sat(bootstrap):
    lang, tf, sf, train_txt, test_txt, mono, ali = bootstrap
    utt2spk = {u: f"spk{int(u[2:]) % 2}" for u in tf}
    opts = TrainSatOptions(num_iters=5, totgauss=50, num_leaves=25,
                           realign_iters=(2, 4), tree_min_gain=20.0,
                           fmllr_iters=(1, 2), fmllr_min_count=50.0)
    sys_, transforms = train_sat(lang, tf, train_txt, utt2spk, mono,
                                 ali, opts)
    assert transforms  # got per-speaker transforms
    for W in transforms.values():
        assert W.shape == (13, 14)
