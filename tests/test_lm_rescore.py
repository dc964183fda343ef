"""ARPA parsing, G compilation, const-LM rescoring, MBR, RNNLM tests."""

import math

import numpy as np
import pytest

from kaldi_tpu.fstext.fst import EPS, Arc, LatticeWeight, TropicalWeight, VectorFst
from kaldi_tpu.lat.functions import lattice_best_path
from kaldi_tpu.lat.sausages import MinimumBayesRisk, MinimumBayesRiskOptions
from kaldi_tpu.lm.arpa import arpa_to_fst, parse_arpa
from kaldi_tpu.lm.rescore import DeterministicLm, lattice_lmrescore

ARPA = """
\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-0.7 </s>
-99 <s> -0.6
-0.6 a -0.4
-0.9 b -0.3
-1.2 c -0.2

\\2-grams:
-0.3 <s> a
-0.4 a b
-0.5 b </s>
-0.8 b c

\\end\\
"""


class TestArpa:
    def test_parse(self):
        lm = parse_arpa(ARPA)
        assert lm.order == 2
        assert lm.ngrams[0][("a",)] == (-0.6, -0.4)
        assert lm.ngrams[1][("a", "b")] == (-0.4, 0.0)

    def test_sentence_scores_with_backoff(self):
        lm = parse_arpa(ARPA)
        # p(a|<s>) direct bigram; p(c|a) backs off: bo(a) + p(c)
        s = lm.score_sentence_log10(["a", "c"])
        want = -0.3 + (-0.4 + -1.2) + (-0.2 + -0.7)  # last: bo(c)+p(</s>)
        assert s == pytest.approx(want, abs=1e-5)

    def test_g_fst_matches_lm(self):
        lm = parse_arpa(ARPA)
        words = {"a": 1, "b": 2, "c": 3}
        g = arpa_to_fst(lm, words)
        from kaldi_tpu.fstext.ops import shortest_path
        # score "a b" through G: compose with linear acceptor
        from kaldi_tpu.fstext.ops import compose, arcsort
        lin = VectorFst(TropicalWeight)
        s0 = lin.add_state(); s1 = lin.add_state(); s2 = lin.add_state()
        lin.set_start(s0); lin.set_final(s2)
        lin.add_arc(s0, Arc(1, 1, 0.0, s1))
        lin.add_arc(s1, Arc(2, 2, 0.0, s2))
        c = compose(arcsort(g, "olabel") and g, lin)
        best = shortest_path(c)
        # total tropical cost should equal -ln10 * log10 p(a b)
        total = 0.0
        s = best.start
        while not best.is_final(s):
            a = best.arcs[s][0]
            total += a.weight
            s = a.nextstate
        total += best.finals[s]
        want = -(lm.score_sentence_log10(["a", "b"])) * math.log(10)
        assert total == pytest.approx(want, abs=1e-4)


def two_path_lattice():
    lat = VectorFst(LatticeWeight)
    s = [lat.add_state() for _ in range(3)]
    lat.set_start(s[0])
    lat.add_arc(s[0], Arc(10, 1, (0.0, 1.0), s[1]))   # word a
    lat.add_arc(s[0], Arc(11, 3, (0.0, 0.5), s[2]))   # word c (better ac)
    lat.add_arc(s[1], Arc(12, 2, (0.0, 1.0), s[2]))   # word b
    lat.set_final(s[2], (0.0, 0.0))
    return lat


class TestRescore:
    def test_lm_changes_best_path(self):
        lm = parse_arpa(ARPA)
        det = DeterministicLm(lm, {1: "a", 2: "b", 3: "c"})
        lat = two_path_lattice()
        # acoustics alone prefer [c]
        _, words, _ = lattice_best_path(lat)
        assert words == [3]
        rescored = lattice_lmrescore(lat, det, lm_scale=10.0)
        _, words2, _ = lattice_best_path(rescored)
        # LM strongly prefers "a b" (direct bigrams) over unigram c
        assert words2 == [1, 2]


class TestMbr:
    def test_mbr_picks_consensus(self):
        # lattice with 3 paths: "a b" (p~.4), "a c" (p~.35), "d" (p~.25)
        # MAP = "a b" but consensus at slot2 = b; mbr keeps a b
        lat = VectorFst(LatticeWeight)
        s = [lat.add_state() for _ in range(4)]
        lat.set_start(s[0])
        lat.add_arc(s[0], Arc(1, 1, (0.9, 0.0), s[1]))
        lat.add_arc(s[1], Arc(2, 2, (1.0, 0.0), s[3]))
        lat.add_arc(s[1], Arc(3, 3, (1.1, 0.0), s[3]))
        lat.add_arc(s[0], Arc(4, 4, (2.2, 0.0), s[3]))
        lat.set_final(s[3], (0.0, 0.0))
        mbr = MinimumBayesRisk(lat)
        hyp = mbr.get_one_best()
        assert hyp[0] == 1  # 'a' dominates first slot
        assert len(mbr.confidences) == len(hyp)
        assert all(0 <= c <= 1.0 + 1e-6 for c in mbr.confidences)
        # confidence of 'a' > confidence of second slot (b vs c split)
        if len(hyp) > 1:
            assert mbr.confidences[0] > mbr.confidences[1]


class TestRnnlm:
    def test_train_and_rescore(self):
        from kaldi_tpu.rnnlm import (RnnLm, RnnLmConfig, RnnLmDeterministic,
                                     rnnlm_rescore_nbest, sentence_logprob,
                                     train_rnnlm)
        rng = np.random.default_rng(0)
        # toy grammar: sentences alternate 3,4,3,4,...
        sents = []
        for _ in range(200):
            L = rng.integers(2, 6)
            sents.append([3 + (i % 2) for i in range(L)])
        cfg = RnnLmConfig(vocab_size=8, embed_dim=16, hidden_dim=32)
        model, params = train_rnnlm(cfg, sents, num_epochs=3, batch_size=16)
        good = sentence_logprob(model, params, [3, 4, 3, 4])
        bad = sentence_logprob(model, params, [4, 4, 4, 4])
        assert good > bad
        # deterministic-automaton interface
        det = RnnLmDeterministic(model, params, {1: 3, 2: 4})
        h = det.start()
        h, c1 = det.step(h, 1)
        h, c2 = det.step(h, 2)
        assert c1 > 0 and c2 > 0
        # n-best rescoring prefers the grammatical path
        nbest = [([], [1, 1, 1, 1], 0.0), ([], [1, 2, 1, 2], 0.0)]
        rescored = rnnlm_rescore_nbest(model, params, nbest,
                                       {1: 3, 2: 4}, rnnlm_weight=1.0)
        assert rescored[0][1] == [1, 2, 1, 2]
