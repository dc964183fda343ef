"""Regression-tree fMLLR (parity: transform/regression-tree.cc,
regtree-fmllr-diag-gmm.cc)."""

import io

import numpy as np
import pytest

from kaldi_tpu.gmm.am_diag_gmm import AmDiagGmm
from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.hmm import HmmTopology, TransitionModel
from kaldi_tpu.transform.regtree_fmllr import (RegressionTree,
                                               RegtreeFmllr,
                                               RegtreeFmllrAccs,
                                               estimate_regtree_fmllr,
                                               regtree_log_likes)
from kaldi_tpu.tree import monophone_context_dependency

D = 4


def _system(seed=0):
    """AM with two well-separated acoustic regions (pdf 0/1 low, pdf
    2/3 high) so the regression tree splits them apart."""
    rng = np.random.default_rng(seed)
    am = AmDiagGmm()
    centers = [-6.0, -5.0, 5.0, 6.0]
    for c in centers:
        g = DiagGmm(2, D)
        g.set_from_means_and_vars(
            [0.5, 0.5],
            c + rng.normal(scale=0.3, size=(2, D)),
            np.ones((2, D)))
        am.add_pdf(g)
    phones = [1, 2, 3, 4]
    topo = HmmTopology.chain_topology(phones)
    # chain topo gives 2 pdf-classes/phone = 8 pdfs; rebuild with 4:
    # use a 1-pdf-per-phone trivial mapping instead
    npc = {p: 1 for p in phones}

    class _Tm:
        def transition_ids_to_pdfs(self, ali):
            return np.asarray(ali)

    return am, _Tm()


def _speaker_data(am, affine, n_per_pdf, seed):
    rng = np.random.default_rng(seed)
    feats, ali = [], []
    A, b = affine
    for pdf in range(am.num_pdfs):
        g = am.get_pdf(pdf)
        comps = rng.choice(g.num_gauss, p=g.weights, size=n_per_pdf)
        x = g.get_means()[comps] + np.sqrt(g.get_vars())[comps] \
            * rng.normal(size=(n_per_pdf, D))
        feats.append(x @ A.T + b)
        ali.extend([pdf] * n_per_pdf)
    return np.concatenate(feats), ali


class TestRegressionTree:
    def test_build_separates_regions(self):
        am, _ = _system()
        tree = RegressionTree.build(am, num_baseclasses=2)
        # pdfs 0,1 (low region) in one class, 2,3 (high) in the other
        c_low = {tree.gauss2bclass[(p, j)] for p in (0, 1)
                 for j in range(2)}
        c_high = {tree.gauss2bclass[(p, j)] for p in (2, 3)
                  for j in range(2)}
        assert len(c_low) == 1 and len(c_high) == 1
        assert c_low != c_high


class TestRegtreeFmllr:
    def test_region_specific_transforms_beat_global(self):
        """Distort the two acoustic regions DIFFERENTLY: a single
        global fMLLR cannot model it, two regional transforms can."""
        am, tm = _system()
        tree = RegressionTree.build(am, num_baseclasses=2)
        rng = np.random.default_rng(1)
        # region-dependent distortion: shift low region one way, high
        # region the other
        feats_lo, ali_lo = _speaker_data(
            am, (np.eye(D), np.full(D, +1.5)), 120, 2)
        mask = np.asarray(ali_lo) < 2
        feats = feats_lo.copy()
        feats[~mask] -= 3.0          # high region shifted oppositely
        ali = ali_lo

        accs = RegtreeFmllrAccs(tree, D)
        accs.accumulate_from_alignment(am, tm, feats, ali)
        xf2, impr2 = estimate_regtree_fmllr(accs, min_count=100.0)
        assert xf2.W.shape[0] == 2    # two regional transforms

        # global: same stats pooled (min_count too high to split)
        xf1, impr1 = estimate_regtree_fmllr(accs, min_count=1e6)
        assert xf1.W.shape[0] == 1
        assert impr2 > impr1

        ll2 = regtree_log_likes(am, tree, xf2, feats)
        ll1 = regtree_log_likes(am, tree, xf1, feats)
        lpf2 = float(np.take_along_axis(
            ll2, np.asarray(ali)[:, None], 1).mean())
        lpf1 = float(np.take_along_axis(
            ll1, np.asarray(ali)[:, None], 1).mean())
        # with the log|det A| term (reference decodable) the margin
        # narrows; region-specific must still beat global
        assert lpf2 > lpf1 + 0.1

    def test_small_data_falls_back_to_shared_transform(self):
        am, tm = _system()
        tree = RegressionTree.build(am, num_baseclasses=2)
        feats, ali = _speaker_data(am, (np.eye(D), np.zeros(D)), 30, 3)
        accs = RegtreeFmllrAccs(tree, D)
        accs.accumulate_from_alignment(am, tm, feats, ali)
        xf, _ = estimate_regtree_fmllr(accs, min_count=200.0)
        # 240 frames total but 120 per class < 200 -> share the root
        assert xf.W.shape[0] == 1
        assert xf.bclass2xform[0] == xf.bclass2xform[1]

    def test_io_round_trip(self):
        am, tm = _system()
        tree = RegressionTree.build(am, num_baseclasses=2)
        feats, ali = _speaker_data(am, (np.eye(D), np.ones(D)), 120, 4)
        accs = RegtreeFmllrAccs(tree, D)
        accs.accumulate_from_alignment(am, tm, feats, ali)
        xf, _ = estimate_regtree_fmllr(accs, min_count=100.0)
        buf = io.BytesIO()
        xf.write(buf, binary=True)
        buf.seek(0)
        xf2 = RegtreeFmllr.read(buf, binary=True)
        np.testing.assert_allclose(xf2.W, xf.W, atol=1e-5)
        assert xf2.bclass2xform == xf.bclass2xform
