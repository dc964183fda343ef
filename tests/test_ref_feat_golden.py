"""Feature parity against archives produced by binaries COMPILED FROM
THE REFERENCE'S OWN C++ (tools/ref_fixtures/build_ref_tools.sh +
gen_fixtures.sh: compute-mfcc-feats, compute-fbank-feats,
compute-kaldi-pitch-feats, process-kaldi-pitch-feats run on the real
speech recording src/feat/test_data/test.wav).  Stronger than the HTK
goldens (test_htk_golden.py): these pin the reference's own defaults
(povey window, dithering off, snip-edges) end to end."""

import os

import numpy as np
import pytest

from kaldi_tpu.feat.wave import WaveData
from kaldi_tpu.util.table import SequentialTableReader

DATA = os.path.join(os.path.dirname(__file__), "data", "ref_golden")
WAV = "/root/reference/src/feat/test_data/test.wav"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "mfcc.ark")),
    reason="reference-compiled feature goldens not generated")


def golden(name):
    [(key, mat)] = list(SequentialTableReader(
        "matrix", f"ark:{os.path.join(DATA, name)}"))
    assert key == "tst"
    return np.asarray(mat)


@pytest.fixture(scope="module")
def wave():
    with open(WAV, "rb") as f:
        wd = WaveData.read(f)
    return np.asarray(wd.data[0]), wd.samp_freq


def test_mfcc_matches_reference_binary(wave):
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    w, fs = wave
    opts = MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=fs, dither=0.0))
    got = np.asarray(OfflineFeature(opts).compute(w))
    ref = golden("mfcc.ark")
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)


def test_fbank_matches_reference_binary(wave):
    from kaldi_tpu.feat.frontend import FbankOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    w, fs = wave
    opts = FbankOptions(
        frame_opts=FrameExtractionOptions(samp_freq=fs, dither=0.0))
    got = np.asarray(OfflineFeature(opts).compute(w))
    ref = golden("fbank.ark")
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)


def test_kaldi_pitch_matches_reference_binary(wave):
    from kaldi_tpu.feat.pitch import (PitchExtractionOptions,
                                      compute_kaldi_pitch)
    w, fs = wave
    got = compute_kaldi_pitch(w, PitchExtractionOptions(samp_freq=fs))
    ref = golden("pitch.ark")
    assert got.shape == ref.shape, (got.shape, ref.shape)
    # measured parity: pitch 5e-7 rel, NCCF 3e-6 abs (the Viterbi runs
    # in float32 like the reference; track decisions match exactly)
    np.testing.assert_allclose(got[:, 1], ref[:, 1], rtol=1e-4)
    np.testing.assert_allclose(got[:, 0], ref[:, 0], atol=1e-4)


def test_processed_pitch_matches_reference_binary(wave):
    from kaldi_tpu.feat.pitch import (PitchExtractionOptions,
                                      ProcessPitchOptions,
                                      compute_kaldi_pitch, process_pitch)
    w, fs = wave
    raw = compute_kaldi_pitch(w, PitchExtractionOptions(samp_freq=fs))
    got = process_pitch(raw, ProcessPitchOptions(
        delta_pitch_noise_stddev=0.0))
    ref = golden("pitch_processed.ark")  # generated with noise 0
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)  # measured 2e-5
