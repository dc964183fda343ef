"""Dense-relaxation device decoder (parity: cudadecoder batched beam
search, cuda-decoder.h:171 — but exact Viterbi via dense in-arc
relaxation, see decoder/dense_relax.py)."""

import numpy as np
import pytest

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_mono_e2e import FS, make_corpus, unigram_g

from kaldi_tpu.decoder.dense_relax import (DenseDeviceGraph,
                                           DenseViterbiDecoder)
from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions
from kaldi_tpu.fstext.fst import EPS, Arc, TropicalWeight, VectorFst


def _random_graph(rng, S=200, P=10, eps_frac=0.2, n_finals=10,
                  olabel_range=5):
    f = VectorFst(TropicalWeight)
    for _ in range(S):
        f.add_state()
    f.set_start(0)
    tid2pdf = np.zeros(P * 3 + 1, np.int64)
    for tid in range(1, P * 3 + 1):
        tid2pdf[tid] = (tid - 1) % P
    for s in range(S):
        deg = int(rng.integers(1, 8))
        for _ in range(deg):
            if rng.uniform() < eps_frac and s < S - 1:
                # forward-only eps arcs keep the eps subgraph a DAG
                f.add_arc(s, Arc(EPS, int(rng.integers(0, olabel_range)),
                                 float(rng.uniform(0, 1.5)),
                                 int(rng.integers(s + 1, S))))
            else:
                f.add_arc(s, Arc(int(rng.integers(1, P * 3 + 1)),
                                 int(rng.integers(0, olabel_range)),
                                 float(rng.uniform(0, 3.0)),
                                 int(rng.integers(0, S))))
    for s in rng.choice(S, n_finals, replace=False):
        f.finals[int(s)] = float(rng.uniform(0, 1))
    return f, tid2pdf


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_graphs_match_host_decoder(seed):
    """Exact Viterbi vs the host FasterDecoder with infinite beam on
    random graphs WITH epsilon arcs and olabels everywhere."""
    rng = np.random.default_rng(seed)
    f, tid2pdf = _random_graph(rng)
    T = 25
    ll = rng.normal(size=(T, 10)).astype(np.float32)
    g = DenseDeviceGraph.build(f, tid2pdf)
    dec = DenseViterbiDecoder(g, chunk=7)  # deliberately not dividing T
    dres = dec.decode(ll, 1.0)
    host = FasterDecoder(f, FasterDecoderOptions(beam=1e9))
    hres = host.decode(ll, tid2pdf, 1.0)
    assert (dres is None) == (hres is None)
    if dres is None:
        return
    assert dres[2] == pytest.approx(hres[2], abs=2e-2), f"seed {seed}"
    # word sequence may differ only under exact cost ties; verify the
    # decoded words correspond to a path of the same total cost by
    # checking cost match (the strong check) and sequence equality in
    # the common no-tie case
    if abs(dres[2] - hres[2]) < 1e-4:
        assert len(dres[0]) == len(hres[1]) or dres[0] == hres[1]


def test_batched_variable_lengths():
    rng = np.random.default_rng(5)
    f, tid2pdf = _random_graph(rng, eps_frac=0.0)
    lens = [9, 17, 25]
    T = max(lens)
    ll = rng.normal(size=(len(lens), T, 10)).astype(np.float32)
    g = DenseDeviceGraph.build(f, tid2pdf)
    dec = DenseViterbiDecoder(g, chunk=8)
    host = FasterDecoder(f, FasterDecoderOptions(beam=1e9))
    results = dec.decode_batch(ll, 1.0, lengths=lens)
    for b, L in enumerate(lens):
        hres = host.decode(ll[b, :L], tid2pdf, 1.0)
        dres = results[b]
        assert (dres is None) == (hres is None)
        if dres is not None:
            assert dres[2] == pytest.approx(hres[2], abs=2e-2), b
            assert len(dres[1]) == L  # one ilabel per frame


def test_matches_host_on_yesno_hclg():
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
    g = DenseDeviceGraph.build(hclg, sys_.tm.id2pdf_id)
    dec = DenseViterbiDecoder(g, chunk=16)
    host = FasterDecoder(hclg, FasterDecoderOptions(beam=1e9))
    for utt, feats in sf.items():
        ll = np.asarray(sys_.am.log_likes_batch(feats))
        hres = host.decode(ll, sys_.tm.id2pdf_id, 0.1)
        dres = dec.decode(ll, 0.1)
        assert dres is not None and hres is not None
        assert dres[0] == hres[1], utt          # same word sequence
        assert dres[2] == pytest.approx(hres[2], abs=2e-2)


def test_from_arrays_matches_build():
    """The vectorized flat-array constructor must agree with the
    FST-based builder (and therefore the host decoder)."""
    from kaldi_tpu.decoder.dense_relax import INF
    rng = np.random.default_rng(11)
    f, tid2pdf = _random_graph(rng, S=150, eps_frac=0.0)
    src, dst, pdf, ol, w, il = [], [], [], [], [], []
    for s in range(f.num_states):
        for a in f.arcs[s]:
            src.append(s)
            dst.append(a.nextstate)
            pdf.append(int(tid2pdf[a.ilabel]))
            ol.append(a.olabel)
            w.append(float(a.weight))
            il.append(a.ilabel)
    finals = np.array([float(fw) if fw != TropicalWeight.zero else INF
                       for fw in f.finals], np.float32)
    g1 = DenseDeviceGraph.build(f, tid2pdf)
    g2 = DenseDeviceGraph.from_arrays(
        np.array(src), np.array(dst), np.array(pdf), np.array(ol),
        np.array(w), finals, f.start, ilabel=np.array(il),
        num_pdfs=10)
    d1 = DenseViterbiDecoder(g1, chunk=9)
    d2 = DenseViterbiDecoder(g2, chunk=9)
    T = 20
    ll = rng.normal(size=(T, 10)).astype(np.float32)
    r1, r2 = d1.decode(ll, 1.0), d2.decode(ll, 1.0)
    assert (r1 is None) == (r2 is None)
    if r1 is not None:
        assert r1[2] == pytest.approx(r2[2], abs=1e-3)
        assert r1[0] == r2[0]


def test_no_reachable_final_returns_none():
    f = VectorFst(TropicalWeight)
    s0, s1 = f.add_state(), f.add_state()
    f.set_start(s0)
    f.add_arc(s0, Arc(1, 1, 0.5, s1))
    # no final state at all
    tid2pdf = np.array([0, 0], np.int64)
    g = DenseDeviceGraph.build(f, tid2pdf)
    dec = DenseViterbiDecoder(g)
    ll = np.zeros((3, 1), np.float32)
    assert dec.decode(ll, 1.0) is None


def test_eps_cycle_rejected():
    from kaldi_tpu.base.logging import KaldiTpuError
    f = VectorFst(TropicalWeight)
    s0, s1 = f.add_state(), f.add_state()
    f.set_start(s0)
    f.add_arc(s0, Arc(EPS, 0, 0.1, s1))
    f.add_arc(s1, Arc(EPS, 0, 0.1, s0))
    f.finals[s1] = 0.0
    with pytest.raises(KaldiTpuError):
        DenseDeviceGraph.build(f, np.array([0], np.int64))
