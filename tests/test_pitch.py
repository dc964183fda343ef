"""Pitch tracker tests: tone frequency recovery, voicing contrast,
processed-feature shapes."""

import numpy as np
import pytest

from kaldi_tpu.feat.pitch import (PitchExtractionOptions,
                                  ProcessPitchOptions,
                                  compute_and_process_kaldi_pitch,
                                  compute_kaldi_pitch)


def tone(freq, seconds=1.0, fs=16000, amp=8000):
    t = np.arange(int(seconds * fs)) / fs
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestPitch:
    @pytest.mark.parametrize("f0", [100.0, 220.0, 330.0])
    def test_recovers_tone_frequency(self, f0):
        pitch = compute_kaldi_pitch(tone(f0))
        assert pitch.shape[0] > 50
        mid = pitch[10:-10, 1]
        med = float(np.median(mid))
        assert med == pytest.approx(f0, rel=0.05), med

    def test_voicing_contrast(self):
        rng = np.random.default_rng(0)
        voiced = compute_kaldi_pitch(tone(150))
        noise = compute_kaldi_pitch(
            (500 * rng.normal(size=16000)).astype(np.float32))
        assert np.median(voiced[:, 0]) > np.median(noise[:, 0]) + 0.2

    def test_pitch_changes_tracked(self):
        # two-tone signal: pitch switches midway. A constant loud tone
        # has no quiet frames, so the energy ballast (which assumes
        # voiced frames are much louder than the long-run mean square —
        # true for real speech with silences) must be reduced here.
        w = np.concatenate([tone(120, 0.5), tone(240, 0.5)])
        opts = PitchExtractionOptions(nccf_ballast=0.1)
        pitch = compute_kaldi_pitch(w, opts)
        first = np.median(pitch[5:40, 1])
        second = np.median(pitch[60:-5, 1])
        assert second > first * 1.5

    def test_processed_features(self):
        feats = compute_and_process_kaldi_pitch(tone(200, 0.5))
        assert feats.shape[1] == 3
        assert np.isfinite(feats).all()
        # normalized log pitch should be near zero for a constant tone
        assert abs(np.median(feats[5:-5, 1])) < 0.5
