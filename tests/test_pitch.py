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


class TestOnlinePitch:
    def test_streaming_matches_offline_after_finish(self):
        from kaldi_tpu.feat.pitch import (PitchExtractionOptions,
                                          compute_and_process_kaldi_pitch)
        from kaldi_tpu.online.features import OnlinePitchFeature
        fs = 8000.0
        rng = np.random.default_rng(0)
        t = np.arange(int(1.2 * fs)) / fs
        f0 = 150 + 40 * np.sin(2 * np.pi * 1.5 * t)
        wave = (np.sin(2 * np.pi * np.cumsum(f0) / fs)
                + 0.05 * rng.normal(size=len(t))).astype(np.float32)
        opts = PitchExtractionOptions(samp_freq=fs)
        offline = compute_and_process_kaldi_pitch(wave, opts)

        online = OnlinePitchFeature(opts, max_frames_latency=20)
        chunk = int(0.1 * fs)
        emitted_early = {}
        for start in range(0, len(wave), chunk):
            online.accept_waveform(fs, wave[start:start + chunk])
            n = online.num_frames_ready()
            for f in range(n):
                emitted_early.setdefault(f, online.get_frame(f).copy())
        online.input_finished()
        n = online.num_frames_ready()
        assert n == offline.shape[0]
        np.testing.assert_allclose(online.get_frames(range(n)), offline,
                                   atol=1e-5)

    def test_finalized_frames_do_not_change(self):
        from kaldi_tpu.feat.pitch import PitchExtractionOptions
        from kaldi_tpu.online.features import OnlinePitchFeature
        fs = 8000.0
        t = np.arange(int(1.0 * fs)) / fs
        wave = np.sin(2 * np.pi * 200 * t).astype(np.float32)
        online = OnlinePitchFeature(PitchExtractionOptions(samp_freq=fs),
                                    max_frames_latency=10)
        snapshots = {}
        chunk = int(0.15 * fs)
        for start in range(0, len(wave), chunk):
            online.accept_waveform(fs, wave[start:start + chunk])
            final_upto = online._num_final
            for f in range(final_upto):
                if f in snapshots:
                    np.testing.assert_array_equal(
                        snapshots[f], online.get_frame(f))
                else:
                    snapshots[f] = online.get_frame(f).copy()
        online.input_finished()
        for f, v in snapshots.items():
            np.testing.assert_array_equal(v, online.get_frame(f))

    def test_real_audio_deviations_only_in_unvoiced(self):
        """On noisy real-style audio, bounded-latency online pitch may
        revise differently from offline ONLY where POV is low (silence);
        voiced frames match exactly, and unbounded latency matches
        everywhere (reference online-pitch semantics)."""
        import os, sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_mono_e2e import synth_utterance, FS
        from kaldi_tpu.feat.pitch import (PitchExtractionOptions,
                                          _nccf_to_pov,
                                          compute_and_process_kaldi_pitch,
                                          compute_kaldi_pitch)
        from kaldi_tpu.online.features import OnlinePitchFeature
        wave = synth_utterance(["YES", "NO"], seed=5)
        opts = PitchExtractionOptions(samp_freq=FS)
        offline = compute_and_process_kaldi_pitch(wave, opts)
        pov = _nccf_to_pov(compute_kaldi_pitch(wave, opts)[:, 0])

        def run(latency):
            online = OnlinePitchFeature(opts, max_frames_latency=latency)
            chunk = int(0.05 * FS)
            for s in range(0, len(wave), chunk):
                online.accept_waveform(FS, wave[s:s + chunk])
            online.input_finished()
            return online.get_frames(range(online.num_frames_ready()))

        bounded = run(20)
        assert bounded.shape == offline.shape
        voiced = pov > 0.5
        if voiced.any():
            np.testing.assert_allclose(bounded[voiced], offline[voiced],
                                       atol=1e-5)
        unbounded = run(10 ** 6)
        np.testing.assert_allclose(unbounded, offline, atol=1e-6)
