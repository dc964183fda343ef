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
