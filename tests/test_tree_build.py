"""Tree building + triphone pipeline tests: clusterable math, question
generation, greedy splitting gains (the reference's build-tree test
style), context expansion windows, and the train_deltas end-to-end."""

import numpy as np
import pytest

from kaldi_tpu.fstext.context import context_expand
from kaldi_tpu.fstext.fst import EPS, Arc, TropicalWeight, VectorFst
from kaldi_tpu.tree.build_tree import (BuildTreeOptions,
                                       accumulate_tree_stats, build_tree,
                                       cluster_phones)
from kaldi_tpu.tree.clusterable import GaussClusterable
from kaldi_tpu.tree.event_map import PDF_CLASS_KEY

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))


class TestClusterable:
    def test_objf_and_distance(self):
        rng = np.random.default_rng(0)
        a = GaussClusterable(3)
        b = GaussClusterable(3)
        a.accumulate(rng.normal(0, 1, (100, 3)))
        b.accumulate(rng.normal(5, 1, (100, 3)))
        # merging two well-separated clusters loses likelihood
        assert a.distance(b) > 100.0
        c = GaussClusterable(3)
        c.accumulate(rng.normal(0, 1, (100, 3)))
        assert a.distance(c) < a.distance(b)


def linear_phone_fst(phones):
    f = VectorFst(TropicalWeight)
    s = f.add_state()
    f.set_start(s)
    for p in phones:
        t = f.add_state()
        f.add_arc(s, Arc(p, p, 0.0, t))
        s = t
    f.set_final(s)
    return f


class TestContextExpand:
    def test_triphone_windows(self):
        lg = linear_phone_fst([1, 2, 3])
        clg, info = context_expand(lg, N=3, P=1)
        # collect windows along the single path
        wins = []
        s = clg.start
        while not clg.is_final(s):
            a = clg.arcs[s][0]
            if a.ilabel != EPS:
                wins.append(info[a.ilabel])
            s = a.nextstate
        assert wins == [(0, 1, 2), (1, 2, 3), (2, 3, 0)]

    def test_single_phone(self):
        lg = linear_phone_fst([7])
        clg, info = context_expand(lg, N=3, P=1)
        wins = []
        s = clg.start
        while not clg.is_final(s):
            a = clg.arcs[s][0]
            if a.ilabel != EPS:
                wins.append(info[a.ilabel])
            s = a.nextstate
        assert wins == [(0, 7, 0)]

    def test_left_biphone(self):
        lg = linear_phone_fst([1, 2])
        clg, info = context_expand(lg, N=2, P=1)
        wins = []
        s = clg.start
        while not clg.is_final(s):
            a = clg.arcs[s][0]
            if a.ilabel != EPS:
                wins.append(info[a.ilabel])
            s = a.nextstate
        assert wins == [(0, 1), (1, 2)]


class TestBuildTree:
    def make_stats(self):
        """Phones 1,2 with context-dependent means: phone 1 after 1 vs
        after 2 differ strongly."""
        rng = np.random.default_rng(1)
        stats = {}
        dim = 2

        def add(event, mean, n=50):
            g = GaussClusterable(dim)
            g.accumulate(rng.normal(mean, 0.3, (n, dim)))
            stats[tuple(sorted(event))] = g

        for pc in range(3):
            add([(PDF_CLASS_KEY, pc), (0, 1), (1, 1), (2, 2)], 0.0 + pc)
            add([(PDF_CLASS_KEY, pc), (0, 2), (1, 1), (2, 2)], 10.0 + pc)
            add([(PDF_CLASS_KEY, pc), (0, 1), (1, 2), (2, 1)], -10.0 + pc)
            add([(PDF_CLASS_KEY, pc), (0, 2), (1, 2), (2, 1)], -20.0 + pc)
        return stats

    def test_split_finds_context(self):
        stats = self.make_stats()
        questions = {k: [[1], [2], [1, 2]] for k in range(3)}
        questions[PDF_CLASS_KEY] = [[0], [0, 1], [1], [2]]
        roots = [([1], True, True), ([2], True, True)]
        tree = build_tree(stats, questions, roots, N=3, P=1,
                          opts=BuildTreeOptions(max_leaves=50, min_gain=5.0))
        # distinct pdfs for phone 1 in left-context 1 vs 2
        p_a = tree.compute([1, 1, 2], 0)
        p_b = tree.compute([2, 1, 2], 0)
        assert p_a is not None and p_b is not None and p_a != p_b
        # phones get disjoint pdfs
        assert tree.compute([1, 1, 2], 0) != tree.compute([1, 2, 1], 0)
        assert tree.num_pdfs >= 8

    def test_min_gain_limits_splits(self):
        stats = self.make_stats()
        questions = {k: [[1], [2], [1, 2]] for k in range(3)}
        questions[PDF_CLASS_KEY] = [[0], [0, 1], [1], [2]]
        roots = [([1], True, True), ([2], True, True)]
        small = build_tree(stats, questions, roots, 3, 1,
                           BuildTreeOptions(max_leaves=50, min_gain=1e9))
        assert small.num_pdfs == 2  # just the roots


@pytest.mark.slow
def test_train_deltas_end_to_end():
    from test_mono_e2e import FS, make_corpus, unigram_g
    from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.deltas import TrainDeltasOptions, train_deltas
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, _align_all, decode,
                                        make_hclg, train_mono)
    from kaldi_tpu.util.edit_distance import WerStats

    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=10, num_test=3)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    mono = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=6, totgauss=30,
                                       realign_iters=(1, 2, 3, 4, 5)))
    compiler = TrainingGraphCompiler(mono.tm, mono.tree, lang)
    graphs = {u: compiler.compile(train_txt[u]) for u in tf}
    mono_ali = _align_all(mono, graphs, tf, 10.0, 0.1, 1.0)

    tri = train_deltas(lang, tf, train_txt, mono, mono_ali,
                       TrainDeltasOptions(num_iters=8, totgauss=60,
                                          num_leaves=30,
                                          realign_iters=(2, 4, 6),
                                          tree_min_gain=20.0))
    assert tri.tree.context_width() == 3
    assert tri.tree.num_pdfs > mono.tree.num_pdfs // 2
    hclg = make_hclg(tri, unigram_g(lang))
    hyps = decode(tri, hclg, sf, acoustic_scale=0.1)
    stats = WerStats()
    for utt, ref in test_txt.items():
        stats.add(ref, hyps[utt])
    print(stats.report())
    assert stats.wer <= 10.0, stats.report()
