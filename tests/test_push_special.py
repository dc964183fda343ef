"""push_special (parity: fstext/push-special.cc PushSpecial)."""

import math

import numpy as np
import pytest

from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
from kaldi_tpu.fstext.ops import push_special, shortest_path


def _example_fst():
    """Cyclic, non-stochastic FST (like HCLG: weights don't sum to 1)."""
    f = VectorFst(TropicalWeight)
    s0, s1, s2 = f.add_state(), f.add_state(), f.add_state()
    f.set_start(s0)
    f.add_arc(s0, Arc(1, 1, 2.5, s1))
    f.add_arc(s0, Arc(2, 2, 2.0, s2))
    f.add_arc(s1, Arc(3, 3, 0.3, s2))
    f.add_arc(s1, Arc(4, 4, 1.1, s1))   # self-loop
    f.add_arc(s2, Arc(5, 5, 0.7, s0))   # cycle back
    f.finals[s2] = 0.9
    return f


def _state_masses(f):
    """Per state: total outgoing prob incl. final treated as an arc to
    the start state (the quantity push_special equalizes)."""
    masses = []
    for s in range(f.num_states):
        m = sum(math.exp(-float(a.weight)) for a in f.arcs[s])
        if f.finals[s] != TropicalWeight.zero:
            m += math.exp(-float(f.finals[s]))
        masses.append(m)
    return masses


def test_uniform_state_mass():
    f = _example_fst()
    before = _state_masses(f)
    assert max(before) / min(before) > 1.5      # clearly non-uniform
    g = push_special(f, delta=1e-6)
    after = _state_masses(g)
    assert max(after) == pytest.approx(min(after), rel=1e-3)
    assert after[0] == pytest.approx(1.0, rel=1e-3)


def test_structure_and_relative_weights_preserved():
    f = _example_fst()
    g = push_special(f, delta=1e-6)
    assert g.num_states == f.num_states
    for s in range(f.num_states):
        assert [(a.ilabel, a.nextstate) for a in g.arcs[s]] == \
            [(a.ilabel, a.nextstate) for a in f.arcs[s]]
    # equal-arc-count full paths (start -> final) keep relative weight:
    # path A = 1,3 (2 arcs + final), path B = 2 then 5,1,3 is longer —
    # compare the two 1-arc-different alternatives 1·3 vs 2 directly
    costA_f = 2.5 + 0.3 + 0.9
    # reweighting telescopes: cost'(path) = cost(path) + (n+1) log lam
    costA_g = (float(g.arcs[0][0].weight) + float(g.arcs[1][0].weight)
               + float(g.finals[2]))
    # a second path with the SAME arc count: 2 (s0->s2) + self... none;
    # use the cycle: 1,4,3 (3 arcs) vs 2,5,1,3? different counts. So
    # verify the telescoped invariant instead: lam from state masses
    costB_f = 2.0 + 0.9
    costB_g = float(g.arcs[0][1].weight) + float(g.finals[2])
    # cost'(A) - cost'(B) = cost(A) - cost(B) + (nA - nB) log lam
    lam_shift = (costA_g - costB_g) - (costA_f - costB_f)
    # nA - nB = 1 arc -> shift = log lam; check consistency with a
    # third pair differing by one arc as well (1,4,3 vs 1,3)
    costC_f = 2.5 + 1.1 + 0.3 + 0.9
    costC_g = (float(g.arcs[0][0].weight) + float(g.arcs[1][1].weight)
               + float(g.arcs[1][0].weight) + float(g.finals[2]))
    lam_shift2 = (costC_g - costA_g) - (costC_f - costA_f)
    assert lam_shift == pytest.approx(lam_shift2, abs=1e-3)


def test_best_path_labels_stable_on_acyclic():
    # On an acyclic graph with equal-length alternatives, the best path
    # is unchanged by pushing
    f = VectorFst(TropicalWeight)
    states = [f.add_state() for _ in range(4)]
    f.set_start(states[0])
    f.add_arc(states[0], Arc(1, 1, 0.1, states[1]))
    f.add_arc(states[0], Arc(2, 2, 1.5, states[2]))
    f.add_arc(states[1], Arc(3, 3, 0.2, states[3]))
    f.add_arc(states[2], Arc(4, 4, 0.2, states[3]))
    f.finals[states[3]] = 0.0
    g = push_special(f, delta=1e-6)
    sp_f = shortest_path(f)
    sp_g = shortest_path(g)

    def labels(sp):
        out, s = [], sp.start
        while s >= 0 and sp.finals[s] == TropicalWeight.zero:
            a = sp.arcs[s][0]
            out.append(a.ilabel)
            s = a.nextstate
        return out

    assert labels(sp_f) == labels(sp_g) == [1, 3]
