"""GrammarFst: lazy splicing equivalence against a hand-built static
graph (parity: decoder/grammar-fst.h GrammarFstTpl + grammar-fst.cc
PrepareForGrammarFst), and decoding through LatticeFasterDecoder via
the duck-typed FST surface."""

import math

import numpy as np
import pytest

from kaldi_tpu.fstext.fst import EPS, Arc, TropicalWeight, VectorFst
from kaldi_tpu.fstext.grammar_fst import (GrammarFst,
                                          KALDI_GRAMMAR_FST_SPECIAL_WEIGHT,
                                          NONTERM_BEGIN, NONTERM_END,
                                          NONTERM_REENTER, encode_symbol,
                                          prepare_for_grammar_fst)

OFFSET = 10                 # nonterm_phones_offset in phones.txt
NT_X = OFFSET + 4           # #nonterm:x


def enc(kind_or_nt, phone):
    return encode_symbol(OFFSET, kind_or_nt, phone)


def build_top():
    """0 -a:100-> 1 -(invoke #nonterm:x, ctx a)-> ret -(reenter b|c)->
    tails -> final."""
    f = VectorFst(TropicalWeight)
    s = [f.add_state() for _ in range(6)]
    f.set_start(s[0])
    f.add_arc(s[0], Arc(1, 100, 0.5, s[1]))
    f.add_arc(s[1], Arc(enc(NT_X, 1), EPS, 0.3, s[2]))
    f.add_arc(s[2], Arc(enc(OFFSET + NONTERM_REENTER, 2), EPS, 0.1,
                        s[3]))
    f.add_arc(s[2], Arc(enc(OFFSET + NONTERM_REENTER, 3), EPS, 0.2,
                        s[4]))
    f.add_arc(s[3], Arc(1, 101, 0.4, s[5]))
    f.add_arc(s[4], Arc(2, 102, 0.4, s[5]))
    f.set_final(s[5], 0.0)
    return f


def build_sub():
    """entry (ctx a) -> b:200 | c:201 -> end arcs with ctx b / c."""
    f = VectorFst(TropicalWeight)
    t = [f.add_state() for _ in range(5)]
    f.set_start(t[0])
    f.add_arc(t[0], Arc(enc(OFFSET + NONTERM_BEGIN, 1), EPS, 0.05, t[1]))
    f.add_arc(t[1], Arc(2, 200, 0.6, t[2]))
    f.add_arc(t[1], Arc(3, 201, 0.7, t[3]))
    f.add_arc(t[2], Arc(enc(OFFSET + NONTERM_END, 2), EPS, 0.15, t[4]))
    f.add_arc(t[3], Arc(enc(OFFSET + NONTERM_END, 3), EPS, 0.25, t[4]))
    return f


def build_static():
    """The same composed graph, spliced by hand, including the
    -log(num_entry/reentry_arcs) corrections the splice applies."""
    lg2 = -math.log(2.0)    # two reentry arcs; entry has 1 -> 0
    f = VectorFst(TropicalWeight)
    s = [f.add_state() for _ in range(8)]
    f.set_start(s[0])
    f.add_arc(s[0], Arc(1, 100, 0.5, s[1]))
    # invoke: leaving 0.3 + entry-arc 0.05 (ctx a), one entry arc
    f.add_arc(s[1], Arc(EPS, EPS, 0.3 + 0.05, s[2]))
    f.add_arc(s[2], Arc(2, 200, 0.6, s[3]))
    f.add_arc(s[2], Arc(3, 201, 0.7, s[4]))
    # exits: leaving 0.15/0.25 + reentry 0.1/0.2 + (-log 2)
    f.add_arc(s[3], Arc(EPS, EPS, 0.15 + 0.1 + lg2, s[5]))
    f.add_arc(s[4], Arc(EPS, EPS, 0.25 + 0.2 + lg2, s[6]))
    f.add_arc(s[5], Arc(1, 101, 0.4, s[7]))
    f.add_arc(s[6], Arc(2, 102, 0.4, s[7]))
    f.set_final(s[7], 0.0)
    return f


def all_paths(fst, max_depth=20):
    """[(ilabels, olabels, cost)] of all complete paths; duck-typed."""
    out = []
    stack = [(fst.start, (), (), 0.0)]
    while stack:
        s, il, ol, w = stack.pop()
        fw = float(fst.finals[s])
        if fw < 1e29 and fw != TropicalWeight.zero:
            out.append((il, ol, w + fw))
        if len(il) >= max_depth:
            continue
        for a in fst.arcs[s]:
            stack.append((a.nextstate,
                          il + ((a.ilabel,) if a.ilabel else ()),
                          ol + ((a.olabel,) if a.olabel else ()),
                          w + float(a.weight)))
    return sorted((o, i, round(c, 5)) for i, o, c in out)


@pytest.fixture
def grammar():
    top = prepare_for_grammar_fst(build_top(), OFFSET)
    sub = prepare_for_grammar_fst(build_sub(), OFFSET)
    return GrammarFst(OFFSET, top, [(NT_X, sub)])


class TestGrammarFst:
    def test_prepare_marks_special_states(self):
        top = prepare_for_grammar_fst(build_top(), OFFSET)
        marked = [s for s in range(top.num_states)
                  if float(top.finals[s])
                  == KALDI_GRAMMAR_FST_SPECIAL_WEIGHT]
        assert marked, "no special states marked"

    def test_paths_match_static_splice(self, grammar):
        want = all_paths(build_static())
        got = all_paths(grammar)
        assert got == want

    def test_instances_created_lazily(self, grammar):
        assert len(grammar.instances) == 1
        all_paths(grammar)
        assert len(grammar.instances) == 2
        # revisiting reuses the instance
        all_paths(grammar)
        assert len(grammar.instances) == 2

    def test_decode_through_lattice_faster_decoder(self, grammar):
        from kaldi_tpu.decoder.lattice_decoder import (
            LatticeFasterDecoder, LatticeFasterDecoderOptions)
        from kaldi_tpu.lat.functions import lattice_best_path
        # phones 1..3 -> pdfs 0..2; favor path a b a (olabels
        # 100 200 101)
        tid_to_pdf = np.array([0, 0, 1, 2])
        T = 3
        ll = np.full((T, 3), -5.0, np.float32)
        ll[0, 0] = ll[1, 1] = ll[2, 0] = 0.0
        opts = LatticeFasterDecoderOptions(beam=30.0, lattice_beam=20.0)
        dec = LatticeFasterDecoder(grammar, opts)
        lat = dec.decode(ll, tid_to_pdf, acoustic_scale=1.0)
        assert lat is not None
        _ali, words, cost = lattice_best_path(lat)
        assert words == [100, 200, 101]
        ref = LatticeFasterDecoder(build_static(), opts)
        rlat = ref.decode(ll, tid_to_pdf, acoustic_scale=1.0)
        _ra, rwords, rcost = lattice_best_path(rlat)
        assert rwords == words
        assert cost == pytest.approx(rcost, abs=1e-4)

    def test_mixed_state_is_split(self):
        """A state with both a normal arc and an invocation arc must be
        split by prepare_for_grammar_fst and still expand correctly."""
        top = build_top()
        # add a normal bypass arc from the invocation state
        top.add_arc(1, Arc(3, 103, 2.0, 5))
        static = build_static()
        static.add_arc(1, Arc(3, 103, 2.0, 7))
        g = GrammarFst(OFFSET, prepare_for_grammar_fst(top, OFFSET),
                       [(NT_X, prepare_for_grammar_fst(build_sub(),
                                                       OFFSET))])
        assert all_paths(g) == all_paths(static)

    def test_olabel_on_special_arc_is_pushed(self):
        top = build_top()
        # put an olabel on the invocation arc
        top.arcs[1][0] = Arc(top.arcs[1][0].ilabel, 999,
                             top.arcs[1][0].weight,
                             top.arcs[1][0].nextstate)
        static = build_static()
        static.arcs[1][0] = Arc(EPS, 999, static.arcs[1][0].weight,
                                static.arcs[1][0].nextstate)
        g = GrammarFst(OFFSET, prepare_for_grammar_fst(top, OFFSET),
                       [(NT_X, prepare_for_grammar_fst(build_sub(),
                                                       OFFSET))])
        assert all_paths(g) == all_paths(static)
