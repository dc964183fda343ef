"""Lattice tests: decoder lattice vs best-path consistency, pruning,
posteriors sum to one, n-best ordering, scaling, text round-trip —
mirroring lat/ test style (lattice-utils-test.cc)."""

import io

import numpy as np
import pytest

from kaldi_tpu.decoder.lattice_decoder import (LatticeFasterDecoder,
                                               LatticeFasterDecoderOptions)
from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions
from kaldi_tpu.fstext.fst import EPS, Arc, LatticeWeight, VectorFst
from kaldi_tpu.lat.functions import (add_word_ins_penalty, determinize_lattice,
                                     lattice_best_path,
                                     lattice_forward_backward_post,
                                     lattice_nbest, lattice_prune,
                                     lattice_scale, lattice_state_times)
from kaldi_tpu.lat.kaldi_lattice import (LatticeHolder, compact_to_lattice,
                                         lattice_to_compact,
                                         read_lattice_text,
                                         write_lattice_text)

import os, sys
sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus, unigram_g


@pytest.fixture(scope="module")
def decode_setup():
    """A small trained system + HCLG + loglikes for a test utterance."""
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=2)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=6, totgauss=30,
                                       realign_iters=(1, 2, 3, 4, 5)))
    hclg = make_hclg(sys_, unigram_g(lang))
    utt = list(sf)[0]
    loglikes = sys_.am.log_likes_batch(sf[utt])
    return sys_, hclg, loglikes, test_txt[utt], lang


def simple_lattice():
    """Two paths: words [1,2] cost 3 and [1,3] cost 5."""
    lat = VectorFst(LatticeWeight)
    s = [lat.add_state() for _ in range(4)]
    lat.set_start(s[0])
    lat.add_arc(s[0], Arc(10, 1, (1.0, 0.5), s[1]))
    lat.add_arc(s[1], Arc(11, 2, (1.0, 0.5), s[2]))
    lat.add_arc(s[1], Arc(12, 3, (2.0, 1.5), s[3]))
    lat.set_final(s[2], (0.0, 0.0))
    lat.set_final(s[3], (0.0, 0.0))
    return lat


class TestLatticeOps:
    def test_best_path(self):
        ali, words, cost = lattice_best_path(simple_lattice())
        assert words == [1, 2] and ali == [10, 11]
        assert cost == pytest.approx(3.0)

    def test_nbest(self):
        res = lattice_nbest(simple_lattice(), 5)
        assert len(res) == 2
        assert res[0][1] == [1, 2] and res[1][1] == [1, 3]
        assert res[0][2] < res[1][2]

    def test_scale(self):
        lat = lattice_scale(simple_lattice(), lm_scale=2.0,
                            acoustic_scale=0.5)
        a = lat.arcs[lat.start][0]
        assert a.weight == (2.0, 0.25)

    def test_word_ins_penalty(self):
        lat = add_word_ins_penalty(simple_lattice(), 1.0)
        a = lat.arcs[lat.start][0]
        assert a.weight[0] == pytest.approx(2.0)

    def test_prune(self):
        lat = simple_lattice()
        pruned = lattice_prune(lat, 1.0)  # second path is 2.0 worse
        assert len(lattice_nbest(pruned, 5)) == 1
        pruned2 = lattice_prune(lat, 5.0)
        assert len(lattice_nbest(pruned2, 5)) == 2

    def test_posteriors_sum_to_one(self):
        post = lattice_forward_backward_post(simple_lattice())
        for frame in post:
            assert sum(p for _, p in frame) == pytest.approx(1.0, abs=1e-5)

    def test_state_times(self):
        times = lattice_state_times(simple_lattice())
        assert times[0] == 0 and times[1] == 1

    def test_text_roundtrip(self):
        lat = simple_lattice()
        buf = io.BytesIO()
        write_lattice_text(buf, lat)
        buf.seek(0)
        got = read_lattice_text(io.BufferedReader(buf))
        assert got.num_states == lat.num_states
        ali, words, cost = lattice_best_path(got)
        assert words == [1, 2] and cost == pytest.approx(3.0)

    def test_compact_roundtrip(self):
        lat = simple_lattice()
        clat = lattice_to_compact(lat)
        back = compact_to_lattice(clat)
        ali, words, cost = lattice_best_path(back)
        assert words == [1, 2] and ali == [10, 11]
        assert cost == pytest.approx(3.0)


class TestLatticeDecoder:
    def test_lattice_contains_best_path(self, decode_setup):
        sys_, hclg, loglikes, ref, lang = decode_setup
        dec = LatticeFasterDecoder(hclg, LatticeFasterDecoderOptions(
            beam=16.0, lattice_beam=8.0))
        lat = dec.decode(loglikes, sys_.tm.id2pdf_id, acoustic_scale=0.1)
        assert lat is not None and lat.num_states > 0
        ali, words, cost = lattice_best_path(lat)
        # must match the viterbi decoder's best path
        vres = FasterDecoder(hclg, FasterDecoderOptions(beam=16.0)).decode(
            loglikes, sys_.tm.id2pdf_id, 0.1)
        assert vres is not None
        assert words == vres[1]
        assert cost == pytest.approx(vres[2], abs=0.1)
        assert len(ali) == loglikes.shape[0]

    def test_determinize_and_nbest(self, decode_setup):
        sys_, hclg, loglikes, ref, lang = decode_setup
        dec = LatticeFasterDecoder(hclg, LatticeFasterDecoderOptions(
            beam=14.0, lattice_beam=6.0))
        lat = dec.decode(loglikes, sys_.tm.id2pdf_id, acoustic_scale=0.1)
        det = determinize_lattice(lattice_prune(lat, 4.0))
        nb = lattice_nbest(det, 5)
        assert len(nb) >= 1
        word_seqs = [tuple(w) for _, w, _ in nb]
        assert len(set(word_seqs)) == len(word_seqs)  # distinct after det
        best_words = [lang.word_names[w] for w in nb[0][1]]
        assert best_words == ref

    def test_posteriors_on_real_lattice(self, decode_setup):
        sys_, hclg, loglikes, ref, lang = decode_setup
        dec = LatticeFasterDecoder(hclg, LatticeFasterDecoderOptions(
            beam=14.0, lattice_beam=6.0))
        lat = dec.decode(loglikes, sys_.tm.id2pdf_id, acoustic_scale=0.1)
        post = lattice_forward_backward_post(lat, acoustic_scale=1.0)
        assert len(post) == loglikes.shape[0]
        for frame in post:
            assert sum(p for _, p in frame) == pytest.approx(1.0, abs=1e-3)


class TestPeriodicLinkPruning:
    """PruneActiveTokens equivalent: wide-beam lattice decoding on
    dense scores must stay memory-bounded and preserve the best path
    (regression for the chain-decode blowup)."""

    def _setup(self):
        from kaldi_tpu.decoder.graph import Lang, make_decoding_graph
        from kaldi_tpu.hmm import HmmTopology, TransitionModel
        from kaldi_tpu.tree import monophone_context_dependency
        import os, sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_mono_e2e import unigram_g
        lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                    sil_prob=0.5)
        phones = sorted(lang.phones.values())
        topo = HmmTopology.chain_topology(phones)
        lang.topo = topo
        npc = {p: topo.num_pdf_classes(p) for p in phones}
        tree = monophone_context_dependency(phones, npc)
        tm = TransitionModel(topo, tree)
        hclg = make_decoding_graph(lang, unigram_g(lang), tree, tm,
                                   transition_scale=1.0,
                                   self_loop_scale=1.0)
        rng = np.random.default_rng(0)
        ll = rng.normal(scale=2.0, size=(60, tm.num_pdfs)) \
            .astype(np.float32)
        return hclg, tm, ll

    def test_bounded_and_best_path_preserved(self):
        from kaldi_tpu.decoder.lattice_decoder import (
            LatticeFasterDecoder, LatticeFasterDecoderOptions)
        from kaldi_tpu.lat.functions import lattice_best_path
        hclg, tm, ll = self._setup()
        pruned = LatticeFasterDecoder(hclg, LatticeFasterDecoderOptions(
            beam=100.0, lattice_beam=6.0, prune_interval=5,
            determinize_lattice=False))
        lat_p = pruned.decode(ll, tm.id2pdf_id, 1.0)
        unpruned = LatticeFasterDecoder(hclg, LatticeFasterDecoderOptions(
            beam=100.0, lattice_beam=6.0, prune_interval=0,
            determinize_lattice=False))
        lat_u = unpruned.decode(ll, tm.id2pdf_id, 1.0)
        _, wp, cp = lattice_best_path(lat_p)
        _, wu, cu = lattice_best_path(lat_u)
        assert wp == wu
        assert cp == pytest.approx(cu, abs=1e-3)
        assert pruned.stats["max_live_links"] > 0
