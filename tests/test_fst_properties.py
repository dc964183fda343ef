"""Property-based tests for the WFST core: random machines, checked
against brute-force path enumeration (the reference's fstext test
style: random FSTs + algebraic invariants)."""

import numpy as np
import pytest

from kaldi_tpu.fstext.fst import EPS, Arc, TropicalWeight, VectorFst
from kaldi_tpu.fstext.ops import (arcsort, compose, connect,
                                  determinize_star, equal_paths,
                                  minimize_encoded, push_special,
                                  rm_epsilon, shortest_path)


def random_fst(rng, num_states=6, num_arcs=12, num_labels=3,
               acyclic=True, eps_prob=0.2, functional=True):
    f = VectorFst(TropicalWeight)
    for _ in range(num_states):
        f.add_state()
    f.set_start(0)
    for _ in range(num_arcs):
        s = int(rng.integers(0, num_states - 1))
        d = int(rng.integers(s + 1, num_states)) if acyclic \
            else int(rng.integers(0, num_states))
        il = 0 if rng.random() < eps_prob else int(
            rng.integers(1, num_labels + 1))
        ol = il if functional else (0 if rng.random() < eps_prob else int(
            rng.integers(1, num_labels + 1)))
        f.add_arc(s, Arc(il, ol, float(rng.uniform(0, 2)), d))
    n_final = int(rng.integers(1, 3))
    for _ in range(n_final):
        f.finals[int(rng.integers(num_states // 2, num_states))] = \
            float(rng.uniform(0, 1))
    return f


def _paths(f, max_len=10):
    """All (ilabels, olabels, weight) paths, tropical-collapsed by
    label pair."""
    out = {}
    if f.start is None or f.start < 0 or f.num_states == 0:
        return out
    stack = [(f.start, (), (), 0.0)]
    while stack:
        s, ils, ols, w = stack.pop()
        if f.finals[s] != TropicalWeight.zero:
            key = (ils, ols)
            tot = w + float(f.finals[s])
            if tot < out.get(key, 1e30):
                out[key] = tot
        if len(ils) + len(ols) > 2 * max_len:
            continue
        for a in f.arcs[s]:
            stack.append((a.nextstate,
                          ils + ((a.ilabel,) if a.ilabel else ()),
                          ols + ((a.olabel,) if a.olabel else ()),
                          w + float(a.weight)))
    return out


@pytest.mark.parametrize("seed", range(12))
def test_determinize_star_preserves_language(seed):
    rng = np.random.default_rng(seed)
    f = random_fst(rng, functional=True)
    if f.start < 0 or not _paths(f):
        return
    det = determinize_star(f)
    assert _close(_paths(f), _paths(det))
    # determinism on input labels after eps removal
    for s in range(det.num_states):
        seen = set()
        for a in det.arcs[s]:
            if a.ilabel != EPS:
                assert a.ilabel not in seen
                seen.add(a.ilabel)


@pytest.mark.parametrize("seed", range(12))
def test_minimize_preserves_language(seed):
    rng = np.random.default_rng(100 + seed)
    f = random_fst(rng, functional=True)
    if not _paths(f):
        return
    det = determinize_star(f)
    mini = minimize_encoded(det.copy() if hasattr(det, "copy") else det)
    assert _close(_paths(det), _paths(mini))
    assert mini.num_states <= det.num_states


@pytest.mark.parametrize("seed", range(12))
def test_compose_equals_bruteforce(seed):
    rng = np.random.default_rng(200 + seed)
    a = random_fst(rng, num_states=5, num_arcs=8, functional=False)
    b = random_fst(rng, num_states=5, num_arcs=8, functional=False)
    b = arcsort(b, "ilabel")
    c = compose(a, b)
    pa, pb = _paths(a), _paths(b)
    expected = {}
    for (ia, oa), wa in pa.items():
        for (ib, ob), wb in pb.items():
            if oa == ib:
                key = (ia, ob)
                tot = wa + wb
                if tot < expected.get(key, 1e30):
                    expected[key] = tot
    assert _close(expected, _paths(c))


@pytest.mark.parametrize("seed", range(8))
def test_rm_epsilon_preserves_language(seed):
    rng = np.random.default_rng(300 + seed)
    f = random_fst(rng, eps_prob=0.4, functional=True)
    if not _paths(f):
        return
    g = rm_epsilon(f)
    assert _close(_paths(f), _paths(g))
    for s in range(g.num_states):
        for a in g.arcs[s]:
            assert a.ilabel != EPS


@pytest.mark.parametrize("seed", range(8))
def test_push_special_uniformizes_random_cyclic(seed):
    rng = np.random.default_rng(400 + seed)
    f = random_fst(rng, acyclic=False, num_states=5, num_arcs=12)
    f = connect(f)
    if f.start < 0 or f.num_states < 2:
        return
    import math
    try:
        g = push_special(f, delta=1e-6)
    except ValueError:
        return  # dead state: legitimately rejected
    masses = []
    for s in range(g.num_states):
        m = sum(math.exp(-float(a.weight)) for a in g.arcs[s])
        if g.finals[s] != TropicalWeight.zero:
            m += math.exp(-float(g.finals[s]))
        if m > 0:
            masses.append(m)
    assert max(masses) / min(masses) < 1.01


def _close(a, b, tol=1e-3):
    if set(a) != set(b):
        return False
    return all(abs(a[k] - b[k]) < tol for k in a)
