"""Linear VTLN (parity: transform/lvtln.cc,
gmm-train-lvtln-special)."""

import io

import numpy as np
import pytest

from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
from kaldi_tpu.feat.window import FrameExtractionOptions
from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
from kaldi_tpu.transform.lvtln import LinearVtln, train_lvtln

FS = 8000.0
WARPS = [0.9, 1.0, 1.1]


def _tone(f0, seed, dur=1.0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * FS)) / FS
    return (2000 * np.sin(2 * np.pi * f0 * t)
            + 800 * np.sin(2 * np.pi * 2.2 * f0 * t)
            + 40 * rng.normal(size=len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    waves = [_tone(f0, i) for i, f0 in enumerate([250, 400, 600, 850])]
    unwarped = [comp.compute(w, vtln_warp=1.0) for w in waves]
    per_class = [[comp.compute(w, vtln_warp=wf) for w in waves]
                 for wf in WARPS]
    lv = train_lvtln(unwarped, per_class, WARPS)
    # a GMM on the unwarped training features
    allx = np.concatenate(unwarped)
    gmm = DiagGmm(8, allx.shape[1])
    rng = np.random.default_rng(0)
    sel = allx[rng.choice(len(allx), 8, replace=False)]
    gmm.set_from_means_and_vars(np.ones(8) / 8, sel,
                                np.tile(allx.var(0), (8, 1)))
    from kaldi_tpu.gmm.mle import (AccumDiagGmm, MleDiagGmmOptions,
                                   mle_diag_gmm_update)
    for _ in range(5):
        acc = AccumDiagGmm(8, allx.shape[1])
        acc.accumulate_from_gmm(gmm, allx)
        mle_diag_gmm_update(MleDiagGmmOptions(), acc, gmm)
    return comp, lv, gmm, waves


def _accs(gmm, feats):
    a = FmllrDiagGmmAccs(feats.shape[1])
    post = gmm.component_posteriors(feats.astype(np.float32))
    a.accumulate_from_posteriors(gmm, feats, post)
    return a


class TestLvtln:
    def test_transforms_approximate_warping(self, setup):
        comp, lv, gmm, waves = setup
        # applying class c's linear map to unwarped features should be
        # much closer to truly-warped features than doing nothing
        w = waves[0]
        x = comp.compute(w, vtln_warp=1.0)
        y = comp.compute(w, vtln_warp=0.9)
        mapped = x @ lv.A[0].T
        assert np.mean((mapped - y) ** 2) < 0.25 * np.mean((x - y) ** 2)

    def test_selects_matching_warp(self, setup):
        """A 'speaker' whose audio we warp at extraction time should be
        assigned the inverse-matching LVTLN class."""
        comp, lv, gmm, waves = setup
        wave = _tone(500, seed=99)
        # speaker's features look warped by 1.1; LVTLN should pick a
        # class that improves the GMM fit vs doing nothing
        feats = comp.compute(wave, vtln_warp=1.1)
        W, warp, impr = lv.compute_transform(_accs(gmm, feats))
        assert impr >= 0
        # the unwarped speaker should keep warp ~1.0
        feats0 = comp.compute(wave, vtln_warp=1.0)
        W0, warp0, impr0 = lv.compute_transform(_accs(gmm, feats0))
        assert abs(warp0 - 1.0) <= abs(warp - 1.0) + 1e-9

    def test_offset_improves_over_bare(self, setup):
        comp, lv, gmm, waves = setup
        feats = comp.compute(waves[1], vtln_warp=1.1) + 3.0  # mean shift
        _, _, impr_off = lv.compute_transform(_accs(gmm, feats), "offset")
        _, _, impr_none = lv.compute_transform(_accs(gmm, feats), "none")
        assert impr_off >= impr_none

    def test_io_round_trip(self, setup):
        _, lv, _, _ = setup
        buf = io.BytesIO()
        lv.write(buf, binary=True)
        buf.seek(0)
        lv2 = LinearVtln.read(buf, binary=True)
        assert lv2.warps == pytest.approx(lv.warps)
        np.testing.assert_allclose(lv2.A, lv.A, atol=1e-5)
