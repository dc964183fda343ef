"""Pruned lattice determinization: semantics vs brute force, bounded
memory on blowup lattices (lat/determinize-lattice-pruned.h parity)."""

import numpy as np
import pytest

from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
from kaldi_tpu.lat.functions import (determinize_lattice_pruned,
                                     lattice_best_path)
from tests.test_lattice_properties import _all_paths, random_lattice


def _best_per_wordseq(paths):
    best = {}
    for words, cost in paths:
        if words not in best or cost < best[words]:
            best[words] = cost
    return best


def _is_word_deterministic(lat):
    """At word level: no det state may offer the same word twice.
    (Chain states carrying tid strings have a single outgoing arc.)"""
    for s in range(lat.num_states):
        arcs = lat.arcs[s]
        words = [a.olabel for a in arcs if a.olabel != 0]
        if len(words) != len(set(words)):
            return False
        n_eps = sum(1 for a in arcs if a.olabel == 0)
        if n_eps and (len(arcs) > len(words) + n_eps):
            return False
    return True


@pytest.mark.parametrize("seed", range(8))
def test_matches_bruteforce_within_beam(seed):
    rng = np.random.default_rng(seed)
    lat = random_lattice(rng, T=5, width=3)
    beam = 3.0
    det = determinize_lattice_pruned(lat, beam=beam)
    in_best = _best_per_wordseq(_all_paths(lat))
    best_cost = min(in_best.values())
    out_best = _best_per_wordseq(_all_paths(det))
    # every surviving word-seq keeps its exact input best cost
    for words, cost in out_best.items():
        assert words in in_best
        assert abs(cost - in_best[words]) < 1e-4
    # each output word-seq appears on exactly one path
    out_counts = {}
    for words, _ in _all_paths(det):
        out_counts[words] = out_counts.get(words, 0) + 1
    assert all(c == 1 for c in out_counts.values())
    # every word-seq safely within the beam is present
    for words, cost in in_best.items():
        if cost <= best_cost + beam - 1e-6:
            assert words in out_best, f"lost in-beam seq {words}"
    # pruning is per det-state, so out-of-beam prefixes that merge into
    # in-beam suffixes may survive (same over-keep as the reference);
    # they must still be rare relative to the out-of-beam population
    n_in = sum(1 for c in in_best.values() if c <= best_cost + beam)
    n_over = sum(1 for w in out_best if in_best[w] > best_cost + beam + 1e-6)
    n_out_total = len(in_best) - n_in
    if n_out_total > 10:
        assert n_over < n_out_total, "beam pruning had no effect"
    assert _is_word_deterministic(det)


@pytest.mark.parametrize("seed", range(4))
def test_best_path_preserved(seed):
    rng = np.random.default_rng(seed + 50)
    lat = random_lattice(rng, T=6, width=3)
    det = determinize_lattice_pruned(lat, beam=5.0)
    ali0, words0, cost0 = lattice_best_path(lat)
    ali1, words1, cost1 = lattice_best_path(det)
    assert abs(cost0 - cost1) < 1e-4
    assert words0 == words1
    assert ali0 == ali1          # tid strings preserved exactly


def test_blowup_lattice_bounded():
    """2^40 word sequences; unpruned determinization would explode,
    the beam keeps it tiny."""
    f = VectorFst(LatticeWeight)
    D = 40
    s = f.add_state()
    f.set_start(s)
    cur = s
    for d in range(D):
        a = f.add_state()
        b = f.add_state()
        j = f.add_state()
        f.add_arc(cur, Arc(1, 2 * d + 1, (0.0, 0.0), a))
        f.add_arc(cur, Arc(2, 2 * d + 2, (0.5, 0.3), b))
        f.add_arc(a, Arc(3, 0, (0.0, 0.0), j))
        f.add_arc(b, Arc(4, 0, (0.0, 0.0), j))
        cur = j
    f.finals[cur] = (0.0, 0.0)
    det = determinize_lattice_pruned(f, beam=2.0, max_states=5000)
    # suffix merging keeps the output compact (2^40 paths, tiny DAG)
    assert det.num_states < 2000
    _, words, cost = lattice_best_path(det)
    assert abs(cost) < 1e-6
    assert words == [2 * d + 1 for d in range(D)]
    # arc-level beam: every arc lies on some path within the beam
    from kaldi_tpu.lat.functions import _forward_backward_costs
    fwd, bwd = _forward_backward_costs(det)
    for s in range(det.num_states):
        for a in det.arcs[s]:
            tot = fwd[s] + a.weight[0] + a.weight[1] + bwd[a.nextstate]
            assert tot <= 2.0 + 1e-6
    # a beam below the deviation cost keeps only the single best path
    det2 = determinize_lattice_pruned(f, beam=0.5, max_states=5000)
    n_paths = 1
    for s in range(det2.num_states):
        assert len(det2.arcs[s]) <= 1


def test_empty_and_unreachable():
    f = VectorFst(LatticeWeight)
    s = f.add_state()
    f.set_start(s)
    det = determinize_lattice_pruned(f, beam=5.0)
    assert det.num_states == 0 or _all_paths(det) == []
