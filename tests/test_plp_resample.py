"""PLP (vs per-frame oracle following feature-plp.cc literally) and
resampling tests."""

import numpy as np
import pytest

from kaldi_tpu.feat.frontend import OfflineFeature
from kaldi_tpu.feat.mel import mel_banks_matrix
from kaldi_tpu.feat.plp import (PlpOptions, equal_loudness_vector,
                                idft_bases)
from kaldi_tpu.feat.resample import LinearResample
from kaldi_tpu.feat.window import FrameExtractionOptions

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
import oracle_feat


def oracle_plp(wave, opts: PlpOptions):
    fo = opts.frame_opts
    melw, centers = mel_banks_matrix(opts.mel_opts, fo, 1.0)
    eql = equal_loudness_vector(centers)
    bases = idft_bases(opts.lpc_order + 1, opts.mel_opts.num_bins + 2)
    lifter = None
    if opts.cepstral_lifter != 0.0:
        from kaldi_tpu.feat.mel import compute_lifter_coeffs
        lifter = compute_lifter_coeffs(opts.cepstral_lifter, opts.num_ceps)
    rows = []
    for buf, raw_e, win_e in oracle_feat.frame_pipeline(wave, fo):
        spec = np.fft.rfft(buf)
        power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
        mel = melw @ power[:len(buf) // 2]
        mel = np.maximum(mel * eql, np.finfo(np.float32).eps) \
            ** opts.compress_factor
        dup = np.concatenate([[mel[0]], mel, [mel[-1]]])
        auto = bases @ dup
        # scalar Durbin (mel-computations.cc:267)
        n = opts.lpc_order
        E = auto[0]
        lpc = np.zeros(n)
        for i in range(n):
            ki = auto[i + 1] + sum(lpc[j] * auto[i - j] for j in range(i))
            ki /= E
            c = max(1 - ki * ki, 1e-5)
            E *= c
            tmp = np.zeros(i + 1)
            tmp[i] = -ki
            for j in range(i):
                tmp[j] = lpc[j] - ki * lpc[i - j - 1]
            lpc[:i + 1] = tmp
        resid = max(np.log(max(E, 1e-37)), np.finfo(np.float32).tiny)
        ceps = np.zeros(n)
        for i in range(n):
            s = sum((i - j) * lpc[j] * ceps[i - j - 1] for j in range(i))
            ceps[i] = -lpc[i] - s / (i + 1)
        feat = np.concatenate([[resid], ceps[:opts.num_ceps - 1]])
        if lifter is not None:
            feat = feat * lifter
        if opts.use_energy:
            feat[0] = raw_e
        rows.append(feat)
    return np.array(rows, np.float32)


def make_wave(n, seed=0, fs=16000.0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    return (3000 * np.sin(2 * np.pi * 440 * t)
            + 300 * rng.normal(size=n)).astype(np.float32)


class TestPlp:
    @pytest.mark.parametrize("kw", [dict(), dict(use_energy=False),
                                    dict(lpc_order=10, num_ceps=11)])
    def test_vs_oracle(self, kw):
        opts = PlpOptions(frame_opts=FrameExtractionOptions(dither=0.0), **kw)
        wave = make_wave(6400, seed=3)
        got = OfflineFeature(opts).compute(wave)
        want = oracle_plp(wave, opts)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3,
                                   err_msg=str(kw))


class TestResample:
    def test_downsample_preserves_tone(self):
        fs_in, fs_out = 16000, 8000
        n = 16000
        t = np.arange(n) / fs_in
        wave = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
        out = LinearResample(fs_in, fs_out).resample(wave)
        assert abs(len(out) - n // 2) <= 1
        # compare against the ideal 1 kHz tone at 8 kHz (skip edges)
        t_out = np.arange(len(out)) / fs_out
        ideal = np.sin(2 * np.pi * 1000 * t_out)
        sl = slice(100, -100)
        err = np.abs(out[sl] - ideal[sl]).max()
        assert err < 0.02

    def test_upsample_roundtrip(self):
        fs = 8000
        n = 4000
        rng = np.random.default_rng(0)
        # bandlimited signal: sum of tones below 3 kHz
        t = np.arange(n) / fs
        wave = sum(np.sin(2 * np.pi * f * t + p) for f, p in
                   [(500, 0.1), (1200, 1.0), (2500, 2.0)]).astype(np.float32)
        up = LinearResample(fs, 2 * fs).resample(wave)
        down = LinearResample(2 * fs, fs).resample(up)
        m = min(len(down), n)
        sl = slice(200, m - 200)
        assert np.abs(down[sl] - wave[sl]).max() < 0.02
