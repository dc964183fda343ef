"""Beam-sparse device decoder (parity: cudadecoder batched beam search,
cuda-decoder.h ExpandArcs/PruneAndPreprocess)."""

import numpy as np
import pytest

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus, unigram_g

from kaldi_tpu.decoder.beam_sparse import (BeamSparseDecoder,
                                           SparseDeviceGraph,
                                           cap_out_degree)
from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions
from kaldi_tpu.fstext.fst import EPS, Arc, TropicalWeight, VectorFst
from kaldi_tpu.fstext.ops import equal_paths


def test_cap_out_degree_preserves_language():
    rng = np.random.default_rng(0)
    f = VectorFst(TropicalWeight)
    states = [f.add_state() for _ in range(4)]
    f.set_start(states[0])
    # state 0 with out-degree 9
    for i in range(9):
        f.add_arc(states[0], Arc(i % 3 + 1, i % 3 + 1,
                                 float(rng.uniform(0, 2)),
                                 states[1 + i % 3]))
    for s in states[1:]:
        f.finals[s] = 0.5
    g = cap_out_degree(f, 4)
    assert all(len(g.arcs[s]) <= 4 for s in range(g.num_states))
    assert equal_paths(f, g)


@pytest.fixture(scope="module")
def system():
    from kaldi_tpu.feat.frontend import MfccOptions, OfflineFeature
    from kaldi_tpu.feat.window import FrameExtractionOptions
    from kaldi_tpu.decoder.graph import Lang
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
                      TrainMonoOptions(num_iters=5, totgauss=24,
                                       realign_iters=(1, 2, 3, 4)))
    hclg = make_hclg(sys_, unigram_g(lang))
    return sys_, hclg, sf, test_txt, lang


def test_matches_host_decoder_exactly(system):
    sys_, hclg, sf, test_txt, lang = system
    sg = SparseDeviceGraph.build(hclg, sys_.tm.id2pdf_id, max_degree=4)
    dec = BeamSparseDecoder(sg, beam=1e9, capacity=512)
    host = FasterDecoder(hclg, FasterDecoderOptions(beam=1e9))
    for utt, feats in sf.items():
        ll = np.asarray(sys_.am.log_likes_batch(feats))
        hres = host.decode(ll, sys_.tm.id2pdf_id, 0.1)
        dres = dec.decode(ll, 0.1)
        assert dres is not None and hres is not None
        assert dres[0] == hres[1], utt          # same word sequence
        assert dres[2] == pytest.approx(hres[2], abs=2e-2)


def test_beam_pruning_still_correct(system):
    sys_, hclg, sf, test_txt, lang = system
    sg = SparseDeviceGraph.build(hclg, sys_.tm.id2pdf_id, max_degree=4)
    dec = BeamSparseDecoder(sg, beam=14.0, capacity=128)
    stats_err = 0
    for utt, feats in sf.items():
        ll = np.asarray(sys_.am.log_likes_batch(feats))
        res = dec.decode(ll, 0.1)
        assert res is not None
        hyp = [lang.word_names[w] for w in res[0]]
        if hyp != test_txt[utt]:
            stats_err += 1
    assert stats_err == 0


def test_capacity_overflow_degrades_gracefully(system):
    """A tiny frontier must still produce a hypothesis (may be wrong,
    must not crash)."""
    sys_, hclg, sf, _, _ = system
    sg = SparseDeviceGraph.build(hclg, sys_.tm.id2pdf_id, max_degree=4)
    dec = BeamSparseDecoder(sg, beam=8.0, capacity=8)
    utt, feats = next(iter(sf.items()))
    ll = np.asarray(sys_.am.log_likes_batch(feats))
    res = dec.decode(ll, 0.1)
    assert res is None or isinstance(res[0], list)


def test_medium_random_graph_stress():
    """Structured random graph (5k states after capping) — device
    search must agree with the host decoder on the best path cost."""
    rng = np.random.default_rng(1)
    S, P = 2000, 20
    f = VectorFst(TropicalWeight)
    for _ in range(S):
        f.add_state()
    f.set_start(0)
    tid2pdf = np.zeros(P * 3 + 1, np.int64)
    for tid in range(1, P * 3 + 1):
        tid2pdf[tid] = (tid - 1) % P
    for s in range(S):
        deg = int(rng.integers(2, 12))
        for _ in range(deg):
            tid = int(rng.integers(1, P * 3 + 1))
            f.add_arc(s, Arc(tid, int(rng.integers(0, 5)),
                             float(rng.uniform(0, 3.0)),
                             int(rng.integers(0, S))))
    for s in range(S - 20, S):
        f.finals[s] = float(rng.uniform(0, 1))
    T = 30
    ll = rng.normal(size=(T, P)).astype(np.float32)
    sg = SparseDeviceGraph.build(f, tid2pdf, max_degree=8)
    dec = BeamSparseDecoder(sg, beam=1e9, capacity=2048)
    dres = dec.decode(ll, 1.0)
    host = FasterDecoder(f, FasterDecoderOptions(beam=1e9))
    hres = host.decode(ll, tid2pdf, 1.0)
    assert dres is not None and hres is not None
    assert dres[2] == pytest.approx(hres[2], abs=5e-2)


def test_batched_lanes_match_single(system):
    sys_, hclg, sf, _, _ = system
    sg = SparseDeviceGraph.build(hclg, sys_.tm.id2pdf_id, max_degree=4)
    dec = BeamSparseDecoder(sg, beam=1e9, capacity=512)
    utts = list(sf)
    lls = [np.asarray(sys_.am.log_likes_batch(sf[u])) for u in utts]
    T = max(l.shape[0] for l in lls)
    # pad lanes to common T with frames that keep costs finite
    padded = np.stack([np.pad(l, ((0, T - l.shape[0]), (0, 0)))
                       for l in lls])
    batch = dec.decode_batch(padded, 0.1)
    for i, u in enumerate(utts):
        if lls[i].shape[0] != T:
            continue  # padded lanes legitimately differ
        single = dec.decode(lls[i], 0.1)
        assert batch[i] is not None and single is not None
        assert batch[i][0] == single[0]
        assert batch[i][2] == pytest.approx(single[2], abs=1e-3)
