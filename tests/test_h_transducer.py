"""Ha-transducer route to HCLG (parity: make-h-transducer.cc +
add-self-loops.cc vs the fused expand_hmm): composing Ha with CLG and
adding self-loops must decode identically to the integrated graph."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


@pytest.fixture(scope="module")
def system():
    from test_mono_e2e import FS, make_corpus, unigram_g
    from kaldi_tpu.decoder.graph import Lang
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.recipes.mono import (TrainMonoOptions, make_hclg,
                                        train_mono)
    train_txt, train_wav, test_txt, test_wav = make_corpus(
        num_train=8, num_test=3)
    comp = OfflineFeature(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=FS, dither=0.0)))
    tf = dict(zip(train_wav, comp.compute_batch(list(train_wav.values()))))
    sf = dict(zip(test_wav, comp.compute_batch(list(test_wav.values()))))
    lang = Lang({"YES": [["Y"]], "NO": [["N"]]}, sil_phone="SIL",
                sil_prob=0.5)
    lang.make_topology()
    sys_ = train_mono(lang, tf, train_txt,
                      TrainMonoOptions(num_iters=4, totgauss=20,
                                       realign_iters=(1, 2, 3)))
    g = unigram_g(lang)
    return dict(sys=sys_, lang=lang, g=g, sf=sf,
                hclg=make_hclg(sys_, g))


def build_clg(system):
    """The CLG the integrated route feeds expand_hmm (monophone)."""
    from kaldi_tpu.decoder.graph import (_remove_disambig,
                                         make_lexicon_fst)
    from kaldi_tpu.fstext.ops import (arcsort, compose,
                                      determinize_star,
                                      minimize_encoded, rm_epsilon)
    lang, g = system["lang"], system["g"]
    L = make_lexicon_fst(lang, with_disambig=True)
    lg = compose(L, arcsort(g, "ilabel"))
    lg = determinize_star(lg)
    lg = minimize_encoded(lg)
    lg = _remove_disambig(lg, lang)
    return rm_epsilon(lg)


def test_h_compose_route_matches_integrated(system):
    from kaldi_tpu.decoder.viterbi import FasterDecoder, \
        FasterDecoderOptions
    from kaldi_tpu.fstext.ops import arcsort, compose, connect
    from kaldi_tpu.hmm.hmm_utils import add_self_loops, \
        make_h_transducer
    sys_ = system["sys"]
    clg = build_clg(system)
    max_phone = max(sys_.tm.get_phones())
    ilabel_info = [()] + [(p,) if p in set(sys_.tm.get_phones())
                          else () for p in range(1, max_phone + 1)]
    ha, disambig = make_h_transducer(ilabel_info, sys_.tree, sys_.tm)
    assert disambig == []        # no disambig entries passed
    hclg2 = connect(compose(arcsort(ha, "olabel"),
                            arcsort(clg, "ilabel")))
    hclg2 = add_self_loops(hclg2, sys_.tm)
    hclg1 = system["hclg"]
    # decode every test utterance through both graphs
    for utt, feats in system["sf"].items():
        ll = sys_.am.log_likes_batch(feats)
        r1 = FasterDecoder(hclg1, FasterDecoderOptions(beam=16.0)) \
            .decode(ll, sys_.tm.id2pdf_id, acoustic_scale=0.1)
        r2 = FasterDecoder(hclg2, FasterDecoderOptions(beam=16.0)) \
            .decode(ll, sys_.tm.id2pdf_id, acoustic_scale=0.1)
        assert r1 is not None and r2 is not None
        assert r1[1] == r2[1], (r1[1], r2[1])          # words
        assert r1[2] == pytest.approx(r2[2], abs=1e-3)  # total cost
        # frame-level alignments agree too (same weight scheme)
        assert r1[0] == r2[0]


def test_compile_graph_cli_matches_integrated(system, tmp_path):
    """compile-graph (one-binary mkgraph) from L_disambig.fst + G.fst
    files decodes identically to the integrated make_hclg."""
    from kaldi_tpu.cli import get_tool
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.decoder.graph import make_lexicon_fst
    from kaldi_tpu.decoder.viterbi import FasterDecoder, \
        FasterDecoderOptions
    from kaldi_tpu.fstext.openfst_io import read_fst_file, write_fst
    from kaldi_tpu.util import kaldi_io
    sys_ = system["sys"]
    L = make_lexicon_fst(system["lang"], with_disambig=True)
    with open(f"{tmp_path}/L_disambig.fst", "wb") as f:
        write_fst(f, L)
    with open(f"{tmp_path}/G.fst", "wb") as f:
        write_fst(f, system["g"])
    write_am_gmm(f"{tmp_path}/final.mdl", sys_.tm, sys_.am)
    kaldi_io.write_kaldi_object(sys_.tree.write, f"{tmp_path}/tree")
    rc = get_tool("compile-graph")([
        "compile-graph", f"{tmp_path}/tree", f"{tmp_path}/final.mdl",
        f"{tmp_path}/L_disambig.fst", f"{tmp_path}/G.fst",
        f"{tmp_path}/HCLG.fst"])
    assert rc == 0
    hclg2 = read_fst_file(f"{tmp_path}/HCLG.fst")
    hclg1 = system["hclg"]
    for utt, feats in system["sf"].items():
        ll = sys_.am.log_likes_batch(feats)
        r1 = FasterDecoder(hclg1, FasterDecoderOptions(beam=16.0)) \
            .decode(ll, sys_.tm.id2pdf_id, acoustic_scale=0.1)
        r2 = FasterDecoder(hclg2, FasterDecoderOptions(beam=16.0)) \
            .decode(ll, sys_.tm.id2pdf_id, acoustic_scale=0.1)
        assert r1 is not None and r2 is not None
        assert r1[1] == r2[1]
        assert r1[2] == pytest.approx(r2[2], abs=1e-3)


def test_add_self_loops_inconsistent_raises(system):
    from kaldi_tpu.fstext.fst import (Arc, TropicalWeight, VectorFst)
    from kaldi_tpu.hmm.hmm_utils import add_self_loops
    sys_ = system["sys"]
    # two different transition-states feeding one state
    f = VectorFst(TropicalWeight)
    s0, s1 = f.add_state(), f.add_state()
    f.set_start(s0)
    f.set_final(s1, TropicalWeight.one)
    tid_a = 1
    ts_a = sys_.tm.transition_id_to_transition_state(tid_a)
    tid_b = None
    for t in range(1, sys_.tm.num_transition_ids + 1):
        if sys_.tm.transition_id_to_transition_state(t) != ts_a:
            tid_b = t
            break
    assert tid_b is not None
    f.add_arc(s0, Arc(tid_a, 0, TropicalWeight.one, s1))
    f.add_arc(s0, Arc(tid_b, 0, TropicalWeight.one, s1))
    with pytest.raises(ValueError, match="inconsistent"):
        add_self_loops(f, sys_.tm)
