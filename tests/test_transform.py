"""Transform estimation tests: LDA separates classes, MLLT improves its
objective, fMLLR recovers a known affine corruption."""

import numpy as np
import pytest

from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.transform import (FmllrDiagGmmAccs, LdaEstimate, LdaOptions,
                                 MlltAccs, apply_affine_transform)


class TestLda:
    def test_separates_classes(self):
        rng = np.random.default_rng(0)
        D, C = 6, 3
        # class-informative along 2 dims, noise elsewhere
        means = np.zeros((C, D))
        means[:, 0] = [0, 5, 10]
        means[:, 1] = [0, -4, 4]
        est = LdaEstimate(C, D)
        data = {}
        for c in range(C):
            x = means[c] + rng.normal(scale=1.0, size=(200, D))
            est.accumulate(x, c)
            data[c] = x
        lda, full = est.estimate(LdaOptions(dim=2))
        assert lda.shape == (2, D + 1)
        # projected class means well separated relative to within-class std
        proj = {c: apply_affine_transform(data[c], lda) for c in range(C)}
        pm = np.stack([proj[c].mean(axis=0) for c in range(C)])
        within_std = np.mean([proj[c].std(axis=0).mean() for c in range(C)])
        dists = [np.linalg.norm(pm[i] - pm[j])
                 for i in range(C) for j in range(i + 1, C)]
        assert min(dists) > 3 * within_std

    def test_accs_add(self):
        rng = np.random.default_rng(1)
        a = LdaEstimate(2, 3)
        b = LdaEstimate(2, 3)
        a.accumulate(rng.normal(size=(10, 3)), 0)
        b.accumulate(rng.normal(size=(10, 3)), 1)
        a.add(b)
        assert a.zero_acc.sum() == 20


class TestMllt:
    def test_objf_improves_on_correlated_data(self):
        rng = np.random.default_rng(2)
        D = 4
        # data correlated via mixing matrix; diagonal GMM mismodels it
        mix = np.eye(D) + 0.5 * rng.normal(size=(D, D)) * 0.3
        means = rng.normal(scale=3.0, size=(3, D))
        gmm = DiagGmm(3, D)
        gmm.set_from_means_and_vars(np.full(3, 1 / 3), means, np.ones((3, D)))
        accs = MlltAccs(D)
        for m in range(3):
            x = (means[m] + rng.normal(size=(300, D)) @ mix.T)
            post = np.zeros((300, 3))
            post[:, m] = 1.0
            accs.accumulate_from_posteriors(gmm, x, post)
        M, impr = accs.update()
        assert impr > 0.0
        assert np.linalg.det(M) > 0


class TestFmllr:
    def test_recovers_affine_corruption(self):
        rng = np.random.default_rng(3)
        D = 4
        means = rng.normal(scale=4.0, size=(4, D))
        gmm = DiagGmm(4, D)
        gmm.set_from_means_and_vars(np.full(4, 0.25), means,
                                    np.full((4, D), 0.5))
        # clean data from the model; corrupt with affine transform
        comps = rng.integers(0, 4, 2000)
        clean = means[comps] + rng.normal(scale=np.sqrt(0.5),
                                          size=(2000, D))
        A_true = np.eye(D) + 0.2 * rng.normal(size=(D, D)) * 0.5
        b_true = rng.normal(scale=1.0, size=D)
        corrupted = clean @ A_true.T + b_true
        # estimate fMLLR to map corrupted back toward the model
        accs = FmllrDiagGmmAccs(D)
        post = gmm.component_posteriors(clean.astype(np.float32))
        accs.accumulate_from_posteriors(gmm, corrupted, post)
        W, impr = accs.update(min_count=10)
        assert impr > 0.0
        restored = apply_affine_transform(corrupted, W)
        ll_corrupt = gmm.log_likelihood(corrupted.astype(np.float32)).mean()
        ll_restored = gmm.log_likelihood(restored).mean()
        ll_clean = gmm.log_likelihood(clean.astype(np.float32)).mean()
        assert ll_restored > ll_corrupt + 0.5
        assert ll_restored > ll_clean - 1.5  # close to clean
