"""End-to-end monophone pipeline test — the yesno-recipe equivalent
(SURVEY.md §4.5): synthesize a tiny two-word corpus, extract MFCCs,
flat-start + EM-train a monophone GMM system, build HCLG, decode, and
require ~0% WER. (The real yesno audio needs a download; this corpus
is acoustically equivalent in difficulty.)"""

import numpy as np
import pytest

from kaldi_tpu.decoder.graph import Lang, add_lex_disambig, make_lexicon_fst
from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
from kaldi_tpu.feat.window import FrameExtractionOptions
from kaldi_tpu.fstext.fst import EPS, Arc, TropicalWeight, VectorFst
from kaldi_tpu.recipes.mono import (TrainMonoOptions, decode, make_hclg,
                                    train_mono)
from kaldi_tpu.util.edit_distance import WerStats, edit_distance_counts

FS = 8000.0
WORD_TONES = {"YES": (350.0, 900.0), "NO": (1600.0, 2600.0)}


def synth_utterance(words, seed):
    """Each word = 0.25s two-tone segment; 0.25s silence between (long
    enough that silence must be modeled by SIL, not stretched word
    states)."""
    rng = np.random.default_rng(seed)
    sil = lambda n: 60.0 * rng.normal(size=n)
    parts = [sil(int(0.3 * FS))]
    for w in words:
        n = int(0.25 * FS)
        t = np.arange(n) / FS
        f1, f2 = WORD_TONES[w]
        seg = (2500 * np.sin(2 * np.pi * f1 * t)
               + 1500 * np.sin(2 * np.pi * f2 * t)
               + 60 * rng.normal(size=n))
        env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n)) / (0.02 * FS))
        parts.append(seg * env)
        parts.append(sil(int(0.25 * FS)))
    return np.concatenate(parts).astype(np.float32)


def make_corpus(num_train=10, num_test=4, words_per_utt=4):
    rng = np.random.default_rng(42)
    def draw(i, n):
        ws = [("YES", "NO")[rng.integers(2)] for _ in range(words_per_utt)]
        return ws
    train = {f"tr{i:02d}": draw(i, words_per_utt) for i in range(num_train)}
    test = {f"te{i:02d}": draw(100 + i, words_per_utt) for i in range(num_test)}
    train_wav = {u: synth_utterance(ws, i) for i, (u, ws) in enumerate(train.items())}
    test_wav = {u: synth_utterance(ws, 1000 + i)
                for i, (u, ws) in enumerate(test.items())}
    return train, train_wav, test, test_wav


def unigram_g(lang: Lang, words=("YES", "NO")) -> VectorFst:
    g = VectorFst(TropicalWeight)
    s = g.add_state()
    g.set_start(s)
    g.set_final(s)
    cost = float(np.log(len(words)))
    for w in words:
        wid = lang.words[w]
        g.add_arc(s, Arc(wid, wid, cost, s))
    return g


@pytest.fixture(scope="module")
def corpus():
    return make_corpus()


@pytest.fixture(scope="module")
def features(corpus):
    _, train_wav, _, test_wav = corpus
    opts = MfccOptions(frame_opts=FrameExtractionOptions(
        samp_freq=FS, dither=0.0))
    computer = OfflineFeature(opts)
    def extract(waves):
        keys = list(waves)
        feats = computer.compute_batch([waves[k] for k in keys])
        return dict(zip(keys, feats))
    return extract(train_wav), extract(test_wav)


class TestLexicon:
    def test_disambig(self):
        lex = {"A": [["x", "y"]], "B": [["x", "y"]], "C": [["x"]]}
        d, n = add_lex_disambig(lex)
        assert n == 2  # homophones A/B need #1/#2; C is a prefix -> #1
        assert d["A"][0][1] != d["B"][0][1]
        assert d["C"][0][1] != 0

    def test_lexicon_fst_builds(self):
        lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL")
        L = make_lexicon_fst(lang)
        assert L.num_states > 0


class TestMonoEndToEnd:
    def test_train_and_decode(self, corpus, features):
        train_txt, _, test_txt, _ = corpus
        train_feats, test_feats = features
        lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                    sil_prob=0.5)
        lang.make_topology(num_nonsil_states=3, num_sil_states=5)
        opts = TrainMonoOptions(num_iters=8, totgauss=40,
                                realign_iters=(1, 2, 3, 4, 5, 6, 7),
                                min_gaussian_occupancy=3.0)
        sys_ = train_mono(lang, train_feats, train_txt, opts)
        assert sys_.am.num_gauss() > sys_.am.num_pdfs // 2

        # decode the test set
        hclg = make_hclg(sys_, unigram_g(lang))
        assert hclg.num_states > 0
        hyps = decode(sys_, hclg, test_feats, acoustic_scale=0.1, beam=16.0)
        stats = WerStats()
        for utt, ref in test_txt.items():
            stats.add(ref, hyps[utt])
        print(stats.report())
        assert stats.wer <= 5.0, stats.report()

        # training data should decode perfectly
        hyps_tr = decode(sys_, hclg, train_feats)
        stats_tr = WerStats()
        for utt, ref in train_txt.items():
            stats_tr.add(ref, hyps_tr[utt])
        assert stats_tr.wer == 0.0, stats_tr.report()


class TestWer:
    def test_counts(self):
        assert edit_distance_counts("abc", "abc") == (0, 0, 0)
        assert edit_distance_counts("abc", "axc") == (0, 0, 1)
        assert edit_distance_counts("abc", "ac") == (0, 1, 0)
        assert edit_distance_counts("ac", "abc") == (1, 0, 0)

    def test_stats(self):
        st = WerStats()
        st.add(["a", "b"], ["a", "b"])
        st.add(["a", "b"], ["a", "c"])
        assert st.errors == 1 and st.ref_words == 4
        assert st.wer == 25.0
