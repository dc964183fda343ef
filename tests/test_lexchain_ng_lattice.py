"""NgramLexDecoder lattice mode: best-path preservation vs the exact
Viterbi decode, frame-exactness, beam monotonicity, and alternative
paths being true paths — on trigram-LM x context-dependent graphs
with the fixed-capacity event-dump design (decoder/lexchain_ng.py
decode_batch_lattice; the scalable analogue of the cudadecoder
GetRawLattice split)."""

import os
import sys

import numpy as np
import pytest

from kaldi_tpu.decoder.lexchain_ng import NgramLexDecoder
from kaldi_tpu.lat.functions import (determinize_lattice_pruned,
                                     lattice_best_path)

sys.path.insert(0, os.path.dirname(__file__))
from test_lexchain_ng import build_graph


@pytest.mark.parametrize("seed,use_sil,ctx", [
    (0, False, 1), (1, True, 3), (2, True, 1), (3, False, 3)])
def test_best_path_preserved(seed, use_sil, ctx):
    g, rng = build_graph(seed, use_sil=use_sil, synth_context=ctx)
    dec = NgramLexDecoder(g)
    B, T = 3, 9
    ll = rng.normal(size=(B, T, g.num_pdfs)).astype(np.float32)
    best = dec.decode_batch(ll, acoustic_scale=1.0)
    lats = dec.decode_batch_lattice(ll, acoustic_scale=1.0,
                                    lattice_beam=20.0, J=4)
    for b in range(B):
        assert best[b] is not None and lats[b] is not None
        words0, _tids, cost0 = best[b]
        ali, words1, cost1 = lattice_best_path(lats[b])
        assert words1 == words0, (b, words1, words0)
        assert abs(cost1 - cost0) < 1e-2, (b, cost1, cost0)
        assert len(ali) == T
        # determinizes cleanly, best path preserved
        det = determinize_lattice_pruned(lats[b], beam=10.0)
        _a2, words2, cost2 = lattice_best_path(det)
        assert words2 == words0
        assert abs(cost2 - cost0) < 1e-2


def test_beam_monotone_and_alternatives():
    g, rng = build_graph(5, V=8, use_sil=True, synth_context=3)
    dec = NgramLexDecoder(g)
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
    assert sizes[2] > sizes[0]          # wide beam adds alternatives


def test_alternative_paths_are_true_paths():
    """Complete lattice path costs are >= the Viterbi best and match
    an independent host decode of the same graph when forced through
    that path's words (spot check: n-best costs all >= best)."""
    g, rng = build_graph(7, V=6, use_sil=True, synth_context=1)
    dec = NgramLexDecoder(g)
    ll = rng.normal(size=(1, 8, g.num_pdfs)).astype(np.float32)
    best = dec.decode_batch(ll, acoustic_scale=1.0)[0]
    lat = dec.decode_batch_lattice(ll, acoustic_scale=1.0,
                                   lattice_beam=30.0, J=4)[0]
    assert lat is not None
    from kaldi_tpu.lat.functions import lattice_nbest
    paths = lattice_nbest(lat, n=8)
    assert len(paths) >= 1
    costs = []
    for p in paths:
        tot = p[2] if not isinstance(p[2], tuple) else sum(p[2])
        costs.append(tot)
    assert abs(min(costs) - best[2]) < 1e-2
    assert all(c >= best[2] - 1e-3 for c in costs)


def test_event_cap_keeps_best_path():
    """Even with a tiny per-frame event cap the Viterbi path survives
    (its events are within-beam by construction)."""
    g, rng = build_graph(2, V=8, use_sil=True, synth_context=3)
    dec = NgramLexDecoder(g)
    ll = rng.normal(size=(2, 10, g.num_pdfs)).astype(np.float32)
    best = dec.decode_batch(ll, acoustic_scale=1.0)
    lats = dec.decode_batch_lattice(ll, acoustic_scale=1.0,
                                    lattice_beam=6.0, J=2,
                                    event_cap=8)
    for b in range(2):
        assert lats[b] is not None
        _ali, words, cost = lattice_best_path(lats[b])
        assert words == best[b][0]
        assert abs(cost - best[b][2]) < 1e-2
