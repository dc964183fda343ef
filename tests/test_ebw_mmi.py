"""EBW discriminative updates + lattice-based MMI training (parity:
gmm/ebw-diag-gmm.cc, steps/train_mmi.sh)."""

import numpy as np
import pytest

from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.gmm.ebw import (EbwOptions, ismooth_stats_diag_gmm,
                               update_ebw_diag_gmm,
                               update_ebw_weights_diag_gmm)
from kaldi_tpu.gmm.mle import AccumDiagGmm


def _stats_from(data, post):
    acc = AccumDiagGmm(post.shape[1], data.shape[1])
    acc.accumulate(data, post)
    return acc


class TestEbwUnit:
    def test_means_move_toward_numerator(self):
        rng = np.random.default_rng(0)
        gmm = DiagGmm(1, 2)
        gmm.set_from_means_and_vars([1.0], [[0.0, 0.0]], [[1.0, 1.0]])
        num_data = rng.normal(loc=+1.0, size=(200, 2))
        den_data = rng.normal(loc=-1.0, size=(100, 2))
        num = _stats_from(num_data, np.ones((200, 1)))
        den = _stats_from(den_data, np.ones((100, 1)))
        impr, count = update_ebw_diag_gmm(num, den, gmm)
        mean = gmm.get_means()[0]
        assert np.all(mean > 0.5)          # pushed toward numerator
        assert np.all(gmm.get_vars()[0] > 0)
        assert impr > 0 and count > 0

    def test_variance_stays_positive_with_adversarial_den(self):
        # den stats with larger spread than num: naive subtraction would
        # give negative variance; D-doubling must rescue it
        rng = np.random.default_rng(1)
        gmm = DiagGmm(1, 2)
        gmm.set_from_means_and_vars([1.0], [[0.0, 0.0]], [[1.0, 1.0]])
        num = _stats_from(rng.normal(scale=0.1, size=(50, 2)),
                          np.ones((50, 1)))
        den = _stats_from(rng.normal(scale=3.0, size=(50, 2)),
                          np.ones((50, 1)))
        update_ebw_diag_gmm(num, den, gmm, EbwOptions(E=0.5))
        assert np.all(gmm.get_vars()[0] > 0)

    def test_weight_update(self):
        gmm = DiagGmm(2, 1)
        gmm.set_from_means_and_vars([0.5, 0.5], [[-1.0], [1.0]],
                                    [[1.0], [1.0]])
        num = AccumDiagGmm(2, 1)
        num.occupancy = np.array([80.0, 20.0])
        den = AccumDiagGmm(2, 1)
        den.occupancy = np.array([30.0, 30.0])
        delta = update_ebw_weights_diag_gmm(num, den, gmm)
        assert gmm.weights[0] > 0.5        # numerator prefers comp 0
        assert gmm.weights.sum() == pytest.approx(1.0)
        assert delta >= 0                  # auxf non-decreasing

    def test_ismooth(self):
        src = AccumDiagGmm(1, 2)
        src.occupancy = np.array([10.0])
        src.mean_accs = np.array([[20.0, 30.0]])
        src.var_accs = np.array([[50.0, 100.0]])
        dst = AccumDiagGmm(1, 2)
        ismooth_stats_diag_gmm(src, 5.0, dst)
        assert dst.occupancy[0] == pytest.approx(5.0)
        # tau frames' worth of the average stats
        assert dst.mean_accs[0, 0] == pytest.approx(10.0)
        assert dst.var_accs[0, 1] == pytest.approx(50.0)


@pytest.mark.slow
def test_mmi_end_to_end():
    """bMMI on the synthetic corpus: objective should not degrade and
    the train set should still decode at 0% WER after EBW updates."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_mono_e2e import FS, make_corpus, unigram_g

    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.recipes.mmi import TrainMmiOptions, train_mmi
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, decode,
                                        make_hclg, train_mono)
    from kaldi_tpu.util.edit_distance import WerStats

    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=10, num_test=3)
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
    objs = train_mmi(sys_, tf, train_txt, unigram_g(lang),
                     TrainMmiOptions(num_iters=3, boost=0.1))
    assert len(objs) == 3
    assert all(np.isfinite(o) for o in objs)
    assert objs[-1] >= objs[0] - 1e-3      # criterion non-degrading

    hclg = make_hclg(sys_, unigram_g(lang))
    hyps = decode(sys_, hclg, tf, acoustic_scale=0.1)
    stats = WerStats()
    for utt, ref in train_txt.items():
        stats.add(ref, hyps[utt])
    assert stats.wer == 0.0, stats.report()
