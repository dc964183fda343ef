"""Arc-level MBR (lat/sausages.cc recursion) property tests: the
computed Bayes risk must equal the brute-force posterior-weighted edit
distance over ALL lattice paths, and the MBR hypothesis must not be
worse than the MAP hypothesis under that metric."""

import numpy as np
import pytest

from kaldi_tpu.lat.functions import lattice_best_path
from kaldi_tpu.lat.sausages import MinimumBayesRisk, MinimumBayesRiskOptions
from kaldi_tpu.util.edit_distance import edit_distance_counts
from tests.test_lattice_properties import _all_paths, random_lattice


def expected_edit(lat, hyp):
    paths = _all_paths(lat)
    costs = np.array([c for _, c in paths])
    post = np.exp(-(costs - costs.min()))
    post /= post.sum()
    tot = 0.0
    for (words, _c), p in zip(paths, post):
        ins, dels, subs = edit_distance_counts(list(words), list(hyp))
        tot += p * (ins + dels + subs)
    return tot


@pytest.mark.parametrize("seed", range(8))
def test_bayes_risk_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    lat = random_lattice(rng, T=4, width=3, num_words=3)
    mbr = MinimumBayesRisk(lat)
    hyp = mbr.get_one_best()
    want = expected_edit(lat, hyp)
    # the recursion computes an UPPER BOUND on the true expected edit
    # distance (the per-arc minimization is locally optimal; see the
    # paper's discussion) — it must never be below the brute-force
    # value and should be close to it
    L = mbr.get_bayes_risk()
    assert L >= want - 1e-6
    assert L <= want + 0.2 * max(want, 1.0)


@pytest.mark.parametrize("seed", range(8))
def test_mbr_no_worse_than_map(seed):
    rng = np.random.default_rng(seed + 50)
    lat = random_lattice(rng, T=5, width=3, num_words=2)
    _ali, map_words, _c = lattice_best_path(lat)
    mbr = MinimumBayesRisk(lat)
    # the guarantee is on the SURROGATE risk (the recursion's L): the
    # MBR iterations never increase it relative to the MAP start
    map_risk = MinimumBayesRisk(
        lat, MinimumBayesRiskOptions(decode_mbr=False)).get_bayes_risk()
    assert mbr.get_bayes_risk() <= map_risk + 1e-6


@pytest.mark.parametrize("seed", range(4))
def test_gamma_bins_normalized_and_sorted(seed):
    rng = np.random.default_rng(seed + 99)
    lat = random_lattice(rng, T=5, width=3, num_words=3)
    mbr = MinimumBayesRisk(lat)
    for bin_ in mbr.get_sausage_stats():
        tot = sum(g for _w, g in bin_)
        assert tot == pytest.approx(1.0, abs=0.05)
        gs = [g for _w, g in bin_]
        assert gs == sorted(gs, reverse=True)
    # confidences accompany the one-best words
    assert len(mbr.confidences) == len(mbr.get_one_best())
    assert all(0.0 <= c <= 1.0 + 1e-6 for c in mbr.confidences)
    # times are monotone per the one-best output
    tb = mbr.get_one_best_times()
    for (b0, e0), (b1, e1) in zip(tb, tb[1:]):
        assert e0 <= b1 + 1e-6


def test_map_mode_keeps_hypothesis():
    rng = np.random.default_rng(3)
    lat = random_lattice(rng, T=4, width=2, num_words=3)
    _ali, map_words, _c = lattice_best_path(lat)
    mbr = MinimumBayesRisk(lat, MinimumBayesRiskOptions(decode_mbr=False))
    assert mbr.get_one_best() == map_words
