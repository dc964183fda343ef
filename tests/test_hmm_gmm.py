"""Tests for topology, transition model, trees, and GMMs: round trips,
mapping invariants (the reference's transition-model checks), EM
objective-improvement property tests (mle-diag-gmm-test style)."""

import io

import numpy as np
import pytest

from kaldi_tpu.gmm import (AccumAmDiagGmm, AccumDiagGmm, AmDiagGmm, DiagGmm,
                           MleDiagGmmOptions, mle_am_diag_gmm_update)
from kaldi_tpu.gmm.mle import mle_diag_gmm_update
from kaldi_tpu.hmm import HmmTopology, TransitionModel
from kaldi_tpu.tree import (ContextDependency, monophone_context_dependency,
                            monophone_context_dependency_shared)


def simple_topo(phones=(1, 2, 3), sil=(1,)):
    return HmmTopology.three_state(list(phones), sil_phones=list(sil))


def mono_system(phones=(1, 2, 3), sil=(1,)):
    topo = simple_topo(phones, sil)
    npc = {p: topo.num_pdf_classes(p) for p in phones}
    tree = monophone_context_dependency(list(phones), npc)
    tm = TransitionModel(topo, tree)
    return topo, tree, tm


def roundtrip(obj, reader, binary=True):
    buf = io.BytesIO()
    obj.write(buf, binary)
    buf.seek(0)
    return reader(io.BufferedReader(buf), binary)


class TestTopology:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, binary):
        topo = simple_topo()
        got = roundtrip(topo, HmmTopology.read, binary)
        assert got == topo

    def test_pdf_classes(self):
        topo = simple_topo()
        assert topo.num_pdf_classes(2) == 3   # nonsil: 3 emitting states
        assert topo.num_pdf_classes(1) == 5   # sil: 5 emitting states
        assert topo.is_hmm()


class TestTree:
    def test_mono_tree(self):
        _, tree, _ = mono_system()
        # phone 1 (sil, 5 classes) gets pdfs 0-4; phone 2 gets 5-7; 3: 8-10
        assert tree.compute([1], 0) == 0
        assert tree.compute([1], 4) == 4
        assert tree.compute([2], 0) == 5
        assert tree.compute([3], 2) == 10
        assert tree.num_pdfs == 11
        assert tree.pdfs_for(2, 1) == [6]

    @pytest.mark.parametrize("binary", [True, False])
    def test_tree_roundtrip(self, binary):
        _, tree, _ = mono_system()
        got = roundtrip(tree, ContextDependency.read, binary)
        assert got.N == 1 and got.P == 0
        for ph in (1, 2, 3):
            for pc in range(3):
                assert got.compute([ph], pc) == tree.compute([ph], pc)

    def test_shared_phones(self):
        topo = simple_topo((1, 2, 3), sil=())
        npc = {p: topo.num_pdf_classes(p) for p in (1, 2, 3)}
        tree = monophone_context_dependency_shared([[1], [2, 3]], npc)
        assert tree.compute([2], 0) == tree.compute([3], 0)
        assert tree.compute([1], 0) != tree.compute([2], 0)


class TestTransitionModel:
    def test_mappings(self):
        _, tree, tm = mono_system()
        assert tm.num_transition_states == 11  # one per (phone, state) tuple
        # check invariants like TransitionModel::Check
        for tid in range(1, tm.num_transition_ids + 1):
            ts = tm.transition_id_to_transition_state(tid)
            assert 1 <= ts <= tm.num_transition_states
            pdf = tm.transition_id_to_pdf(tid)
            assert 0 <= pdf < 11
        # total ids = sum of per-state indices
        total = sum(tm.num_transition_indices(ts)
                    for ts in range(1, tm.num_transition_states + 1))
        assert total == tm.num_transition_ids

    def test_self_loops(self):
        _, _, tm = mono_system()
        for ts in range(1, tm.num_transition_states + 1):
            sl = tm.self_loop_of(ts)
            assert sl != 0 and tm.is_self_loop(sl)

    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, binary):
        _, _, tm = mono_system()
        got = roundtrip(tm, TransitionModel.read, binary)
        assert got.tuples == tm.tuples
        np.testing.assert_allclose(got.log_probs, tm.log_probs, atol=1e-6)

    def test_mle_update_improves(self):
        _, _, tm = mono_system()
        stats = np.zeros(tm.num_transition_ids + 1)
        rng = np.random.default_rng(0)
        stats[1:] = rng.integers(0, 100, tm.num_transition_ids)
        impr, count = tm.mle_update(stats)
        assert impr >= 0.0 and count > 0


class TestDiagGmm:
    def make_gmm(self, m=4, d=6, seed=0):
        rng = np.random.default_rng(seed)
        g = DiagGmm(m, d)
        w = rng.uniform(0.2, 1.0, m)
        g.set_from_means_and_vars(w / w.sum(),
                                  rng.normal(size=(m, d)) * 2,
                                  rng.uniform(0.5, 2.0, (m, d)))
        return g

    def test_loglike_matches_direct(self):
        g = self.make_gmm()
        rng = np.random.default_rng(1)
        x = rng.normal(size=(10, 6)).astype(np.float32)
        got = g.log_likelihood(x)
        # direct dense computation
        means, vars_, w = g.get_means(), g.get_vars(), g.weights
        ll = np.zeros((10, g.num_gauss))
        for m in range(g.num_gauss):
            ll[:, m] = (np.log(w[m])
                        - 0.5 * (np.log(2 * np.pi * vars_[m]).sum()
                                 + ((x - means[m]) ** 2 / vars_[m]).sum(axis=1)))
        want = np.log(np.exp(ll - ll.max(1, keepdims=True)).sum(1)) + ll.max(1)
        np.testing.assert_allclose(got, want, atol=1e-3)

    @pytest.mark.parametrize("binary", [True])
    def test_roundtrip(self, binary):
        g = self.make_gmm()
        got = roundtrip(g, DiagGmm.read, binary)
        np.testing.assert_allclose(got.means_invvars, g.means_invvars)
        np.testing.assert_allclose(got.weights, g.weights, atol=1e-7)

    def test_em_improves_likelihood(self):
        # property test: EM iterations increase data loglike
        rng = np.random.default_rng(2)
        data = np.concatenate([rng.normal(-2, 1, (100, 3)),
                               rng.normal(3, 0.5, (150, 3))]).astype(np.float32)
        g = DiagGmm(2, 3)
        g.set_from_means_and_vars([0.5, 0.5], rng.normal(size=(2, 3)),
                                  np.ones((2, 3)))
        opts = MleDiagGmmOptions(min_gaussian_occupancy=1.0)
        prev = -np.inf
        for _ in range(5):
            acc = AccumDiagGmm(g.num_gauss, g.dim)
            ll = acc.accumulate_from_gmm(g, data)
            # monotone up to f32 scoring noise
            assert ll > prev - 1e-2
            prev = ll
            mle_diag_gmm_update(opts, acc, g)

    def test_split(self):
        g = self.make_gmm(m=2)
        before = g.log_likelihood(np.zeros((1, 6), np.float32))
        g.split(4, perturb_factor=0.001)
        assert g.num_gauss == 4
        after = g.log_likelihood(np.zeros((1, 6), np.float32))
        np.testing.assert_allclose(after, before, atol=0.1)


class TestAmDiagGmm:
    def test_batched_loglikes(self):
        rng = np.random.default_rng(3)
        am = AmDiagGmm()
        for pdf in range(5):
            g = DiagGmm(3, 4)
            w = rng.uniform(0.1, 1, 3)
            g.set_from_means_and_vars(w / w.sum(), rng.normal(size=(3, 4)),
                                      rng.uniform(0.5, 1.5, (3, 4)))
            am.add_pdf(g)
        x = rng.normal(size=(20, 4)).astype(np.float32)
        batch = am.log_likes_batch(x)
        assert batch.shape == (20, 5)
        for pdf in range(5):
            np.testing.assert_allclose(batch[:, pdf],
                                       am.get_pdf(pdf).log_likelihood(x),
                                       atol=1e-3)

    def test_accumulate_alignment_and_update(self):
        _, tree, tm = mono_system()
        rng = np.random.default_rng(4)
        am = AmDiagGmm()
        for _ in range(tree.num_pdfs):
            g = DiagGmm(1, 2)
            g.set_from_means_and_vars([1.0], rng.normal(size=(1, 2)),
                                      np.ones((1, 2)))
            am.add_pdf(g)
        feats = rng.normal(size=(30, 2)).astype(np.float32)
        # fake alignment: any valid transition ids
        tids = [tm.self_loop_of(ts) for ts in
                rng.integers(1, tm.num_transition_states + 1, 30)]
        acc = AccumAmDiagGmm(am, num_transition_ids=tm.num_transition_ids)
        acc.accumulate_alignment(am, tm, feats, tids)
        assert acc.total_frames == 30
        opts = MleDiagGmmOptions(min_gaussian_occupancy=0.5)
        mle_am_diag_gmm_update(opts, acc, am, tm)
        # accs roundtrip
        buf = io.BytesIO()
        acc.write(buf)
        buf.seek(0)
        got = AccumAmDiagGmm.read(io.BufferedReader(buf))
        assert got.total_frames == acc.total_frames
