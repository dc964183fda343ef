"""Block-chain gather-free device decoder: exact-match vs host decoder."""

import numpy as np
import pytest

from kaldi_tpu.decoder.block_chain import BlockChainDecoder, BlockChainGraph
from kaldi_tpu.decoder.graph_direct import DirectGraphSpec, synth_bigram, \
    synth_lexicon
from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions


def build_small(seed=0, V=9, num_pdfs=48):
    spec = DirectGraphSpec(vocab=V, num_phones=6, min_pron=1, max_pron=4,
                           num_pdfs=num_pdfs, seed=seed)
    prons = synth_lexicon(spec)
    bigram = synth_bigram(spec)
    return BlockChainGraph.build(prons, bigram, eos_cost=1.5,
                                 num_pdfs=num_pdfs)


def test_flat_graph_structure():
    g = build_small()
    f = g.to_flat_graph()
    assert f.num_states == g.num_states
    assert (f.finals < 1e29).sum() == g.V
    # begin root is the start and has no self-loop
    assert f.start == g.U * g.N + g.V
    assert not ((f.src == f.start) & (f.dst == f.start)).any()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_exact_match_host(seed):
    g = build_small(seed=seed)
    dec = BlockChainDecoder(g, interpret=True)
    host = FasterDecoder(g.to_flat_graph().to_vector_fst(),
                         FasterDecoderOptions(beam=1e9, max_active=10 ** 9))
    rng = np.random.default_rng(seed + 20)
    B, T = 3, 9
    ll = rng.normal(size=(B, T, g.num_pdfs)).astype(np.float32)
    lengths = [T, T - 2, T - 5]
    out = dec.decode_batch(ll, acoustic_scale=1.0, lengths=lengths)
    tid2pdf = g.tid2pdf
    for b in range(B):
        ref = host.decode(ll[b, :lengths[b]], tid2pdf, acoustic_scale=1.0)
        assert ref is not None and out[b] is not None
        words, tids, cost = out[b]
        r_ali, r_words, r_cost = ref
        assert abs(cost - r_cost) < 1e-3 * max(1.0, abs(r_cost)), \
            f"lane {b}: {cost} vs {r_cost}"
        assert words == r_words
        assert tids == r_ali


@pytest.mark.parametrize("seed", [0, 1])
def test_lattice_mode(seed):
    from kaldi_tpu.lat.functions import (determinize_lattice_pruned,
                                         lattice_best_path)
    g = build_small(seed=seed)
    dec = BlockChainDecoder(g, interpret=True)
    rng = np.random.default_rng(seed + 30)
    B, T = 2, 8
    ll = rng.normal(size=(B, T, g.num_pdfs)).astype(np.float32)
    best = dec.decode_batch(ll, acoustic_scale=1.0)
    lats = dec.decode_batch_lattice(ll, acoustic_scale=1.0,
                                    lattice_beam=20.0, J=4)
    for b in range(B):
        assert lats[b] is not None and best[b] is not None
        words0, _tids, cost0 = best[b]
        _ali, words1, cost1 = lattice_best_path(lats[b])
        assert words1 == words0
        assert abs(cost1 - cost0) < 1e-3, f"{cost1} vs {cost0}"
        # alternatives exist at a wide beam
        n_arcs = sum(len(lats[b].arcs[s]) for s in range(lats[b].num_states))
        assert n_arcs > len(words0) + T
        # determinizes cleanly, best path preserved
        det = determinize_lattice_pruned(lats[b], beam=10.0)
        _a2, words2, cost2 = lattice_best_path(det)
        assert words2 == words0
        assert abs(cost2 - cost0) < 1e-3
