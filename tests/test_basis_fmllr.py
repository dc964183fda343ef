"""Basis fMLLR (parity: transform/basis-fmllr-diag-gmm.cc)."""

import numpy as np
import pytest

from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.transform.basis_fmllr import (BasisFmllrAccus,
                                             BasisFmllrEstimate)
from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs

D = 6


def _gmm(seed=0, m=4):
    rng = np.random.default_rng(seed)
    g = DiagGmm(m, D)
    g.set_from_means_and_vars(np.ones(m) / m,
                              rng.normal(size=(m, D)) * 3,
                              rng.uniform(0.5, 2.0, (m, D)))
    return g


def _speaker_data(gmm, n, affine, seed):
    """Sample from the GMM, then distort by the speaker's affine."""
    rng = np.random.default_rng(seed)
    comps = rng.choice(gmm.num_gauss, p=gmm.weights, size=n)
    means = gmm.get_means()
    stds = np.sqrt(gmm.get_vars())
    x = means[comps] + stds[comps] * rng.normal(size=(n, D))
    A, b = affine
    return x @ A.T + b


def _spk_affine(seed, scale=0.2):
    rng = np.random.default_rng(seed)
    A = np.eye(D) + scale * rng.normal(size=(D, D)) / np.sqrt(D)
    b = scale * rng.normal(size=D)
    return A, b


def _accumulate(gmm, data):
    accs = FmllrDiagGmmAccs(D)
    post = gmm.component_posteriors(data.astype(np.float32))
    accs.accumulate_from_posteriors(gmm, data, post)
    return accs


@pytest.fixture(scope="module")
def basis():
    gmm = _gmm()
    accus = BasisFmllrAccus(D)
    for s in range(12):  # training speakers, plenty of data each
        data = _speaker_data(gmm, 400, _spk_affine(100 + s), seed=s)
        accus.accumulate_gradient_scatter(_accumulate(gmm, data))
    est = BasisFmllrEstimate(D)
    est.estimate_fmllr_basis(accus)
    return gmm, est


def test_basis_orthonormal(basis):
    _, est = basis
    flat = np.stack([b.reshape(-1) for b in est.bases])
    gram = flat @ flat.T
    np.testing.assert_allclose(gram, np.eye(len(est.bases)), atol=1e-8)


def test_transform_improves_loglike(basis):
    gmm, est = basis
    data = _speaker_data(gmm, 300, _spk_affine(999), seed=42)
    accs = _accumulate(gmm, data)
    W, impr, n = est.compute_transform(accs)
    assert impr > 0
    assert n >= 1
    ext = np.concatenate([data, np.ones((len(data), 1))], axis=1)
    adapted = ext @ W.T
    ll_before = float(gmm.log_likelihood(data).mean())
    ll_after = float(gmm.log_likelihood(adapted).mean())
    # auxf improvement should show up as true loglike improvement
    # (up to the log-det Jacobian term, which impr already includes)
    assert ll_after + np.linalg.slogdet(W[:, :D])[1] > ll_before


def test_coefficient_count_scales_with_data(basis):
    gmm, est = basis
    few = _accumulate(gmm, _speaker_data(gmm, 10, _spk_affine(7), seed=1))
    many = _accumulate(gmm, _speaker_data(gmm, 300, _spk_affine(7), seed=2))
    _, _, n_few = est.compute_transform(few)
    _, _, n_many = est.compute_transform(many)
    assert n_few < n_many
    assert n_few <= 2 + int(0.2 * 10)


def test_tiny_data_stays_near_identity(basis):
    """With 8 frames, the basis-restricted estimate must not blow up
    the way an unconstrained fMLLR row update could."""
    gmm, est = basis
    accs = _accumulate(gmm, _speaker_data(gmm, 8, _spk_affine(3), seed=3))
    W, impr, n = est.compute_transform(accs)
    assert impr >= 0
    dev = np.abs(W[:, :D] - np.eye(D)).max()
    assert dev < 1.0
    assert np.isfinite(W).all()
