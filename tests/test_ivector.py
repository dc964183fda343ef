"""i-vector / PLDA / VAD tests: EM objective behavior, speaker
discrimination on synthetic speaker-shifted data, online==offline
estimation, PLDA same/diff scoring, VAD thresholds."""

import io

import numpy as np
import pytest

from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.ivector import (IvectorExtractor, IvectorExtractorOptions,
                               OnlineIvectorEstimationStats, Plda,
                               VadEnergyOptions, compute_vad_energy,
                               train_ivector_extractor, train_plda)


@pytest.fixture(scope="module")
def speaker_data():
    """Synthetic 2-speaker data: global GMM structure + per-speaker
    mean offsets along a hidden direction."""
    rng = np.random.default_rng(0)
    D = 8
    comp_means = rng.normal(scale=2.0, size=(4, D))
    spk_dirs = rng.normal(scale=1.0, size=(2, D))
    utts = {}
    for spk in range(4):
        offset = (spk % 2 * 2 - 1) * spk_dirs[0] + \
            ((spk // 2) * 2 - 1) * 0.5 * spk_dirs[1]
        for u in range(3):
            comps = rng.integers(0, 4, 120)
            x = comp_means[comps] + offset + rng.normal(scale=0.8,
                                                        size=(120, D))
            utts[f"spk{spk}_u{u}"] = x.astype(np.float32)
    # UBM on everything
    allx = np.concatenate(list(utts.values()))
    ubm = DiagGmm(4, D)
    w = np.full(4, 0.25)
    ubm.set_from_means_and_vars(w, comp_means, np.ones((4, D)))
    return ubm, utts


class TestIvectorExtractor:
    def test_training_and_discrimination(self, speaker_data):
        ubm, utts = speaker_data
        ex = train_ivector_extractor(
            ubm, list(utts.values()),
            IvectorExtractorOptions(ivector_dim=4, num_iters=4))
        ivs = {k: ex.extract_offset_removed(v) for k, v in utts.items()}
        # same-speaker ivectors closer than different-speaker on average
        def spk(k):
            return k.split("_")[0]
        same, diff = [], []
        keys = list(ivs)
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                d = np.linalg.norm(ivs[keys[i]] - ivs[keys[j]])
                (same if spk(keys[i]) == spk(keys[j]) else diff).append(d)
        assert np.mean(same) < np.mean(diff)

    def test_online_matches_offline(self, speaker_data):
        ubm, utts = speaker_data
        ex = IvectorExtractor(ubm, 4)
        feats = next(iter(utts.values()))
        offline = ex.extract(feats)
        online = OnlineIvectorEstimationStats(ex)
        for chunk in np.array_split(feats, 5):
            online.acc_frames(chunk)
        np.testing.assert_allclose(online.ivector(), offline, atol=1e-6)

    def test_empty_stats_give_prior(self, speaker_data):
        ubm, _ = speaker_data
        ex = IvectorExtractor(ubm, 4)
        online = OnlineIvectorEstimationStats(ex)
        iv = online.ivector()
        np.testing.assert_allclose(iv, [ex.prior_offset, 0, 0, 0], atol=1e-9)

    def test_io_roundtrip(self, speaker_data):
        ubm, utts = speaker_data
        ex = IvectorExtractor(ubm, 4)
        buf = io.BytesIO()
        ex.write(buf)
        buf.seek(0)
        got = IvectorExtractor.read(io.BufferedReader(buf))
        feats = next(iter(utts.values()))
        np.testing.assert_allclose(got.extract(feats), ex.extract(feats),
                                   atol=1e-5)


class TestPlda:
    def test_same_vs_diff_scoring(self):
        rng = np.random.default_rng(1)
        D = 6
        spk_means = rng.normal(scale=2.0, size=(10, D))
        train = {f"s{i}": spk_means[i] + rng.normal(scale=0.5, size=(8, D))
                 for i in range(8)}
        plda = train_plda(train)
        # enroll speaker 8 and 9; test same vs different
        enroll8 = (spk_means[8] + rng.normal(scale=0.5, size=(5, D))).mean(0)
        test8 = spk_means[8] + rng.normal(scale=0.5, size=D)
        test9 = spk_means[9] + rng.normal(scale=0.5, size=D)
        t_enroll = plda.transform_ivector(enroll8, num_examples=5)
        llr_same = plda.log_likelihood_ratio(
            t_enroll, 5, plda.transform_ivector(test8))
        llr_diff = plda.log_likelihood_ratio(
            t_enroll, 5, plda.transform_ivector(test9))
        assert llr_same > llr_diff

    def test_io(self):
        rng = np.random.default_rng(2)
        plda = Plda(rng.normal(size=4), rng.normal(size=(4, 4)),
                    np.abs(rng.normal(size=4)))
        buf = io.BytesIO()
        plda.write(buf)
        buf.seek(0)
        got = Plda.read(io.BufferedReader(buf))
        np.testing.assert_allclose(got.transform, plda.transform)


class TestVad:
    def test_energy_vad(self):
        T = 100
        feats = np.zeros((T, 13), np.float32)
        feats[:, 0] = -5.0
        feats[40:60, 0] = 10.0  # "speech"
        vad = compute_vad_energy(VadEnergyOptions(vad_energy_threshold=0.0,
                                                  vad_energy_mean_scale=0.5),
                                 feats)
        assert vad[45] == 1.0 and vad[10] == 0.0
        assert vad.sum() == 20

    def test_context_smoothing(self):
        feats = np.zeros((50, 2), np.float32)
        feats[::2, 0] = 10.0  # alternating
        opts = VadEnergyOptions(vad_energy_threshold=5.0,
                                vad_energy_mean_scale=0.0,
                                vad_frames_context=2,
                                vad_proportion_threshold=0.4)
        vad = compute_vad_energy(opts, feats)
        assert vad[10] == 1.0  # smoothing fills alternating gaps


class TestFullCovUbm:
    def test_full_cov_extractor(self, speaker_data):
        """i-vector extractor over a full-covariance UBM (fgmm-global
        configuration): trains, discriminates speakers, round-trips."""
        from kaldi_tpu.gmm.full_gmm import FullGmm
        ubm_diag, utts = speaker_data
        ubm = FullGmm.from_diag(ubm_diag)
        ex = train_ivector_extractor(
            ubm, list(utts.values()),
            IvectorExtractorOptions(ivector_dim=4, num_iters=4))
        assert ex.full_cov
        ivs = {k: ex.extract_offset_removed(v) for k, v in utts.items()}

        def spk(k):
            return k.split("_")[0]

        same, diff = [], []
        keys = list(ivs)
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                d = np.linalg.norm(ivs[keys[i]] - ivs[keys[j]])
                (same if spk(keys[i]) == spk(keys[j]) else diff).append(d)
        assert np.mean(same) < np.mean(diff)

    def test_full_cov_io_roundtrip(self, speaker_data):
        from kaldi_tpu.gmm.full_gmm import FullGmm
        ubm_diag, utts = speaker_data
        ubm = FullGmm.from_diag(ubm_diag)
        ex = IvectorExtractor(ubm, 4)
        buf = io.BytesIO()
        ex.write(buf, binary=True)
        buf.seek(0)
        ex2 = IvectorExtractor.read(buf, binary=True)
        assert ex2.full_cov
        f = next(iter(utts.values()))
        np.testing.assert_allclose(ex2.extract(f), ex.extract(f),
                                   atol=1e-4)

    def test_full_cov_matches_diag_when_covars_diagonal(self, speaker_data):
        """With a truly diagonal covariance, the full-cov math must
        reproduce the diagonal extractor exactly."""
        from kaldi_tpu.gmm.full_gmm import FullGmm
        ubm_diag, utts = speaker_data
        ubm_full = FullGmm.from_diag(ubm_diag)
        ex_d = IvectorExtractor(ubm_diag, 4, seed=7)
        ex_f = IvectorExtractor(ubm_full, 4, seed=7)
        ex_f.M = ex_d.M.copy()
        f = next(iter(utts.values()))
        post = ubm_diag.component_posteriors(f)
        np.testing.assert_allclose(ex_f.extract(f, post),
                                   ex_d.extract(f, post), atol=1e-5)
