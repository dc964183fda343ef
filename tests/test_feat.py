"""Feature frontend tests: fused batched implementation vs per-frame
oracle, framing math, wav round-trip, CMVN/deltas/splice."""

import io

import numpy as np
import pytest

import oracle_feat
from kaldi_tpu.feat.frontend import (FbankOptions, MfccOptions, OfflineFeature,
                                     SpectrogramOptions)
from kaldi_tpu.feat.functions import (DeltaFeaturesOptions, acc_cmvn_stats,
                                      apply_cmvn, compute_deltas,
                                      delta_scales, sliding_window_cmn,
                                      splice_frames)
from kaldi_tpu.feat.wave import WaveData
from kaldi_tpu.feat.window import (FrameExtractionOptions,
                                   feature_window_function, num_frames)


def make_wave(n=16000, seed=0, freq=300.0, fs=16000.0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    sig = (5000 * np.sin(2 * np.pi * freq * t)
           + 500 * rng.normal(size=n)).astype(np.float32)
    return sig


class TestWindowMath:
    def test_num_frames_snip(self):
        o = FrameExtractionOptions()
        assert o.window_size() == 400 and o.window_shift() == 160
        assert o.padded_window_size() == 512
        assert num_frames(399, o) == 0
        assert num_frames(400, o) == 1
        assert num_frames(560, o) == 2
        assert num_frames(16000, o) == 1 + (16000 - 400) // 160

    def test_num_frames_nosnip(self):
        o = FrameExtractionOptions(snip_edges=False)
        assert num_frames(16000, o) == 100
        assert num_frames(80, o) == 1

    def test_povey_window(self):
        o = FrameExtractionOptions()
        w = feature_window_function(o)
        assert w[0] == 0.0 and w[-1] == pytest.approx(0.0, abs=1e-6)
        assert w[len(w) // 2] == pytest.approx(1.0, rel=1e-4)


@pytest.mark.parametrize("snip", [True, False])
class TestAgainstOracle:
    def _frame_opts(self, snip):
        return FrameExtractionOptions(dither=0.0, snip_edges=snip)

    def test_mfcc(self, snip):
        opts = MfccOptions(frame_opts=self._frame_opts(snip))
        wave = make_wave(7895)
        got = OfflineFeature(opts).compute(wave)
        want = oracle_feat.mfcc(wave, opts)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)

    def test_fbank(self, snip):
        opts = FbankOptions(frame_opts=self._frame_opts(snip))
        wave = make_wave(12345, seed=1)
        got = OfflineFeature(opts).compute(wave)
        want = oracle_feat.fbank(wave, opts)
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)

    def test_spectrogram(self, snip):
        opts = SpectrogramOptions(frame_opts=self._frame_opts(snip))
        wave = make_wave(5000, seed=2)
        got = OfflineFeature(opts).compute(wave)
        want = oracle_feat.spectrogram(wave, opts)
        np.testing.assert_allclose(got, want, atol=3e-3, rtol=1e-4)


class TestOptionVariants:
    def test_mfcc_energy_variants(self):
        wave = make_wave(4000, seed=3)
        for kw in [dict(use_energy=False), dict(raw_energy=False),
                   dict(htk_compat=True), dict(use_energy=False, htk_compat=True),
                   dict(cepstral_lifter=0.0), dict(num_ceps=20)]:
            opts = MfccOptions(frame_opts=FrameExtractionOptions(dither=0.0), **kw)
            got = OfflineFeature(opts).compute(wave)
            want = oracle_feat.mfcc(wave, opts)
            np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4,
                                       err_msg=str(kw))

    def test_fbank_variants(self):
        wave = make_wave(4000, seed=4)
        for kw in [dict(use_energy=True), dict(use_power=False),
                   dict(use_log_fbank=False), dict(use_energy=True, htk_compat=True)]:
            opts = FbankOptions(frame_opts=FrameExtractionOptions(dither=0.0), **kw)
            got = OfflineFeature(opts).compute(wave)
            want = oracle_feat.fbank(wave, opts)
            np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-4,
                                       err_msg=str(kw))

    def test_8khz(self):
        fo = FrameExtractionOptions(samp_freq=8000.0, dither=0.0)
        opts = MfccOptions(frame_opts=fo)
        wave = make_wave(8000, seed=5, fs=8000.0)
        got = OfflineFeature(opts).compute(wave)
        want = oracle_feat.mfcc(wave, opts)
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)

    def test_dither_changes_output_but_is_bounded(self):
        opts = MfccOptions()  # dither=1.0 default
        wave = make_wave(4000, seed=6)
        f = OfflineFeature(opts)
        a = f.compute(wave, seed=1)
        b = f.compute(wave, seed=2)
        assert not np.allclose(a, b)
        assert np.abs(a - b).max() < 1.0  # dither is a tiny perturbation

    def test_batch_matches_single(self):
        opts = MfccOptions(frame_opts=FrameExtractionOptions(dither=0.0))
        f = OfflineFeature(opts)
        waves = [make_wave(3000, seed=7), make_wave(9000, seed=8),
                 make_wave(401, seed=9)]
        batch = f.compute_batch(waves)
        for w, got in zip(waves, batch):
            np.testing.assert_allclose(got, f.compute(w), atol=1e-4)

    def test_empty_and_short(self):
        opts = MfccOptions(frame_opts=FrameExtractionOptions(dither=0.0))
        f = OfflineFeature(opts)
        assert f.compute(np.zeros(10, np.float32)).shape == (0, 13)


class TestWave:
    def test_roundtrip(self):
        wave = make_wave(2000, seed=10)
        wd = WaveData(16000.0, wave[None, :])
        buf = io.BytesIO()
        wd.write(buf)
        buf.seek(0)
        got = WaveData.read(buf)
        assert got.samp_freq == 16000.0
        np.testing.assert_allclose(got.data, np.round(wd.data), atol=1.0)

    def test_stereo(self):
        data = np.stack([make_wave(500, seed=11), make_wave(500, seed=12)])
        buf = io.BytesIO()
        WaveData(8000.0, data).write(buf)
        buf.seek(0)
        got = WaveData.read(buf)
        assert got.data.shape == (2, 500)


class TestCmvnDeltasSplice:
    def test_cmvn(self):
        rng = np.random.default_rng(13)
        feats = rng.normal(loc=3.0, scale=2.0, size=(200, 13)).astype(np.float32)
        stats = acc_cmvn_stats(feats)
        assert stats.shape == (2, 14) and stats[0, 13] == 200
        out = apply_cmvn(feats, stats, norm_vars=True)
        np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-2)
        back = apply_cmvn(out, stats, norm_vars=True, reverse=True)
        np.testing.assert_allclose(back, feats, atol=1e-3)

    def test_delta_scales(self):
        s = delta_scales(DeltaFeaturesOptions(order=2, window=2))
        np.testing.assert_allclose(s[1], np.array([-2, -1, 0, 1, 2]) / 10.0,
                                   atol=1e-6)
        assert len(s[2]) == 9

    def test_deltas_linear_signal(self):
        # For a linear ramp, delta == slope (away from the edges)
        T, D = 30, 3
        feats = (np.arange(T)[:, None] * np.array([1.0, 2.0, -0.5])).astype(np.float32)
        out = compute_deltas(feats)
        assert out.shape == (T, 9)
        np.testing.assert_allclose(out[5:-5, 3:6],
                                   np.tile([1.0, 2.0, -0.5], (T - 10, 1)),
                                   atol=1e-4)
        np.testing.assert_allclose(out[5:-5, 6:9], 0.0, atol=1e-4)

    def test_splice(self):
        feats = np.arange(12, dtype=np.float32).reshape(4, 3)
        out = splice_frames(feats, 1, 1)
        assert out.shape == (4, 9)
        np.testing.assert_array_equal(out[0, :3], feats[0])  # edge replicated
        np.testing.assert_array_equal(out[1], np.concatenate([feats[0], feats[1], feats[2]]))

    def test_sliding_cmvn(self):
        rng = np.random.default_rng(14)
        feats = rng.normal(loc=5.0, size=(300, 4)).astype(np.float32)
        out = sliding_window_cmn(feats)
        assert abs(out.mean()) < 0.3


def test_mulaw_wire_close_to_int16():
    """8-bit mu-law wire: decoded features must be close to the int16
    path (telephony-fidelity companding; used by the bench to beat the
    tunnel ingest bound)."""
    from kaldi_tpu.feat.frontend import (MfccOptions, OfflineFeature,
                                         mulaw_encode)
    from kaldi_tpu.feat.window import FrameExtractionOptions
    rng = np.random.default_rng(0)
    fs = 16000
    t = np.arange(int(0.5 * fs)) / fs
    wave = (6000 * np.sin(2 * np.pi * 440 * t)
            + 300 * rng.normal(size=t.size)).astype(np.int16)
    comp = OfflineFeature(MfccOptions(frame_opts=FrameExtractionOptions(
        samp_freq=fs, dither=0.0)))
    ref = comp.compute_batch([wave])[0]
    got = comp.compute_batch([mulaw_encode(wave)])[0]
    assert got.shape == ref.shape
    err = np.abs(got - ref).mean()
    scale = np.abs(ref).mean()
    assert err < 0.05 * scale, (err, scale)
