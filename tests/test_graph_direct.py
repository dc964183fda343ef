"""Direct vectorized HCLG builder: structure + decode equivalence."""

import numpy as np
import pytest

from kaldi_tpu.decoder.graph_direct import (DirectGraphSpec, build_direct_hclg,
                                            synth_bigram, synth_lexicon,
                                            to_dense_device_graph)


def small_spec(**kw):
    d = dict(vocab=10, num_phones=7, min_pron=1, max_pron=4,
             num_pdfs=64, seed=3)
    d.update(kw)
    return DirectGraphSpec(**d)


def test_structure_invariants():
    spec = small_spec()
    g = build_direct_hclg(spec)
    V = spec.vocab
    assert g.num_states > V
    assert (g.src >= 0).all() and (g.src < g.num_states).all()
    assert (g.dst >= 0).all() and (g.dst < g.num_states).all()
    assert (g.ilabel >= 1).all()
    assert (g.tid2pdf[g.ilabel] < spec.num_pdfs).all()
    assert np.isfinite(g.weight).all()
    # exactly V final states (one per word-end root)
    assert (g.finals < 1e29).sum() == V
    # every state reachable: BFS from start over arcs
    S = g.num_states
    adj_src, adj_dst = g.src, g.dst
    seen = np.zeros(S, bool)
    seen[g.start] = True
    frontier = np.array([g.start])
    for _ in range(S):
        m = seen[adj_src] & ~seen[adj_dst]
        if not m.any():
            break
        seen[adj_dst[m]] = True
    assert seen.all(), f"{(~seen).sum()} unreachable states"
    # self-loops: every state except sentence-begin root has exactly one
    loops = np.bincount(g.src[(g.src == g.dst)], minlength=S)
    assert loops[g.start] == 0
    assert (np.delete(loops, g.start) == 1).all()


def test_scales_vectorized():
    spec = small_spec(vocab=300, min_pron=3, max_pron=8, num_pdfs=512)
    g = build_direct_hclg(spec)
    assert g.num_states > 50_000
    assert g.num_arcs > 2 * g.num_states


@pytest.mark.parametrize("seed", [0, 1])
def test_dense_decode_matches_host_decoder(seed):
    spec = small_spec(seed=seed)
    g = build_direct_hclg(spec)
    fst = g.to_vector_fst()
    dg = to_dense_device_graph(g)
    from kaldi_tpu.decoder.dense_relax import DenseViterbiDecoder
    from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions

    dec = DenseViterbiDecoder(dg, chunk=4)
    host = FasterDecoder(fst, FasterDecoderOptions(beam=1e9,
                                                   max_active=10 ** 9))
    rng = np.random.default_rng(seed + 10)
    T = 11
    loglikes = rng.normal(size=(2, T, spec.num_pdfs)).astype(np.float32)
    out = dec.decode_batch(loglikes, acoustic_scale=1.0)
    for b in range(2):
        ref = host.decode(loglikes[b], g.tid2pdf, acoustic_scale=1.0)
        assert ref is not None and out[b] is not None
        words, ilabels, cost = out[b]
        r_ali, r_words, r_cost = ref
        assert abs(cost - r_cost) < 1e-3 * max(1.0, abs(r_cost))
        assert words == r_words
        assert ilabels == r_ali
