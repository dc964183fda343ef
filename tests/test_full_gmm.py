"""Full-covariance GMMs (parity: gmm/full-gmm.cc, mle-full-gmm.cc)."""

import io

import numpy as np
import pytest

from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.gmm.full_gmm import (AccumFullGmm, FullGmm,
                                    MleFullGmmOptions, mle_full_gmm_update)


def _make_full(seed=0, m=3, d=4):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(m, d)) * 2
    covars = []
    for _ in range(m):
        a = rng.normal(size=(d, d))
        covars.append(a @ a.T + np.eye(d))
    w = rng.uniform(0.5, 1.5, m)
    g = FullGmm(m, d)
    g.set_from_means_and_covars(w / w.sum(), means, np.stack(covars))
    return g


def test_loglike_matches_reference_formula():
    g = _make_full()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, g.dim))
    ll = g.log_likelihood(x)
    # independent dense computation per frame/component
    means = g.get_means()
    covars = g.get_covars()
    for t in range(5):
        comps = []
        for j in range(g.num_gauss):
            diff = x[t] - means[j]
            _, logdet = np.linalg.slogdet(covars[j])
            c = (-0.5 * (g.dim * np.log(2 * np.pi) + logdet
                         + diff @ np.linalg.solve(covars[j], diff))
                 + np.log(g.weights[j]))
            comps.append(c)
        expected = np.logaddexp.reduce(comps)
        assert ll[t] == pytest.approx(expected, abs=1e-8)


def test_diag_round_trip():
    d = DiagGmm(2, 3)
    d.set_from_means_and_vars([0.3, 0.7], [[0, 1, 2], [3, 4, 5]],
                              [[1, 2, 1], [0.5, 1, 2]])
    f = FullGmm.from_diag(d)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 3))
    np.testing.assert_allclose(f.log_likelihood(x), d.log_likelihood(x),
                               atol=1e-4)
    d2 = f.to_diag()
    np.testing.assert_allclose(d2.log_likelihood(x), d.log_likelihood(x),
                               atol=1e-4)


def test_mle_recovers_parameters():
    truth = _make_full(seed=3, m=2, d=3)
    rng = np.random.default_rng(4)
    # sample from the true model
    comps = rng.choice(2, p=truth.weights, size=4000)
    means = truth.get_means()
    covars = truth.get_covars()
    chols = [np.linalg.cholesky(c) for c in covars]
    x = np.stack([means[c] + chols[c] @ rng.normal(size=3) for c in comps])
    # init from perturbed truth, run EM
    est = FullGmm(2, 3)
    est.set_from_means_and_covars(
        [0.5, 0.5], means + rng.normal(scale=0.3, size=means.shape),
        covars)
    lls = []
    for _ in range(8):
        acc = AccumFullGmm(2, 3)
        ll = acc.accumulate_from_full(est, x)
        lls.append(ll / len(x))
        mle_full_gmm_update(MleFullGmmOptions(), acc, est)
    assert lls[-1] >= lls[0]
    # loglike should be close to the truth's own
    truth_ll = float(truth.log_likelihood(x).mean())
    assert lls[-1] >= truth_ll - 0.1


def test_serialization_round_trip():
    g = _make_full(seed=5)
    buf = io.BytesIO()
    g.write(buf, binary=True)
    buf.seek(0)
    g2 = FullGmm.read(buf, binary=True)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(3, g.dim))
    np.testing.assert_allclose(g2.log_likelihood(x), g.log_likelihood(x),
                               atol=1e-3)


def test_variance_floor():
    # degenerate data on a line: floor keeps covariances invertible
    rng = np.random.default_rng(7)
    t = rng.normal(size=(500, 1))
    x = np.concatenate([t, 2 * t, -t], axis=1)  # rank-1
    g = FullGmm(1, 3)
    g.set_from_means_and_covars([1.0], [[0, 0, 0]], [np.eye(3)])
    acc = AccumFullGmm(1, 3)
    acc.accumulate_from_full(g, x)
    mle_full_gmm_update(MleFullGmmOptions(variance_floor=0.01), acc, g)
    evals = np.linalg.eigvalsh(g.get_covars()[0])
    assert np.all(evals >= 0.009)
    assert np.isfinite(g.log_likelihood(x)).all()
