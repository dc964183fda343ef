"""LexChain lattice mode: exact best-path preservation, alternatives,
determinization, and beam behavior (the GetRawLattice contract of the
cudadecoder, adapted to the entry-LM layout — see
decoder/lexchain.py decode_batch_lattice)."""

import numpy as np
import pytest

from kaldi_tpu.decoder.lexchain import LexChainDecoder, LexChainGraph
from kaldi_tpu.lat.functions import (determinize_lattice_pruned,
                                     lattice_best_path)

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_lexchain import random_lexicon, random_lm


def build(seed, use_sil, V=7):
    rng = np.random.default_rng(seed)
    lm = random_lm(V, rng)
    prons, pron_word, pron_cost = random_lexicon(V, rng)
    g = LexChainGraph.build(prons, lm, pron_word=pron_word,
                            pron_cost=pron_cost, num_pdfs=12,
                            use_sil=use_sil, sil_phone=5, sil_prob=0.4)
    return g, rng


@pytest.mark.parametrize("seed,use_sil", [(0, False), (1, True),
                                          (2, True), (3, False)])
def test_best_path_preserved(seed, use_sil):
    g, rng = build(seed, use_sil)
    dec = LexChainDecoder(g)
    B, T = 3, 9
    ll = rng.normal(size=(B, T, g.num_pdfs)).astype(np.float32)
    best = dec.decode_batch(ll, acoustic_scale=1.0)
    lats = dec.decode_batch_lattice(ll, acoustic_scale=1.0,
                                    lattice_beam=20.0, J=4)
    for b in range(B):
        assert best[b] is not None and lats[b] is not None
        words0, _tids, cost0 = best[b]
        _ali, words1, cost1 = lattice_best_path(lats[b])
        assert words1 == words0, (b, words1, words0)
        assert abs(cost1 - cost0) < 1e-2, (b, cost1, cost0)
        # frame-exact: every lattice path consumes T input frames
        assert len(_ali) == T
        # alternatives exist at a wide beam
        n_arcs = sum(len(lats[b].arcs[s])
                     for s in range(lats[b].num_states))
        assert n_arcs > len(words0) + T
        # determinizes cleanly, best path preserved
        det = determinize_lattice_pruned(lats[b], beam=10.0)
        _a2, words2, cost2 = lattice_best_path(det)
        assert words2 == words0
        assert abs(cost2 - cost0) < 1e-2


def test_beam_monotone():
    """A smaller lattice beam yields a (weakly) smaller lattice, and
    the best path survives any beam."""
    g, rng = build(5, True)
    dec = LexChainDecoder(g)
    ll = rng.normal(size=(1, 10, g.num_pdfs)).astype(np.float32)
    best = dec.decode_batch(ll, acoustic_scale=1.0)[0]
    sizes = []
    for beam in (2.0, 8.0, 25.0):
        lat = dec.decode_batch_lattice(ll, acoustic_scale=1.0,
                                       lattice_beam=beam, J=4)[0]
        assert lat is not None
        _ali, words, cost = lattice_best_path(lat)
        assert words == best[0]
        assert abs(cost - best[2]) < 1e-2
        sizes.append(sum(len(lat.arcs[s])
                         for s in range(lat.num_states)))
    assert sizes[0] <= sizes[1] <= sizes[2]


def test_lattice_alternatives_costs_are_true_paths():
    """Every complete lattice path cost must be >= the Viterbi best
    (exactness: alternatives are real paths, not underestimates)."""
    from kaldi_tpu.lat.functions import lattice_nbest
    g, rng = build(6, True)
    dec = LexChainDecoder(g)
    ll = rng.normal(size=(1, 8, g.num_pdfs)).astype(np.float32)
    best = dec.decode_batch(ll, acoustic_scale=1.0)[0]
    lat = dec.decode_batch_lattice(ll, acoustic_scale=1.0,
                                   lattice_beam=25.0, J=4)[0]
    paths = lattice_nbest(lat, n=10)
    assert len(paths) >= 2
    costs = []
    for path in paths:
        ali, words, cost = path
        costs.append(cost)
    assert min(costs) >= best[2] - 1e-2
    assert abs(min(costs) - best[2]) < 1e-2
