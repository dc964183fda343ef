"""Entry-LM shared-lexicon device decoder: exact-match vs the host
decoder, sparse-backoff LM semantics, and real (tm, tree) tables.

The graph under test is the round-3 successor of the block-chain
layout (VERDICT r2 items 1-2): ONE shared lexicon block + sparse
backoff bigram roots, so states grow O(lexicon + vocab) instead of
O(V^2).  Reference bar: the cudadecoder decodes any HCLG
(src/cudadecoder/cuda-fst.h:62); here the HCLG equivalence is pinned
by decoding the SAME graph with the host FasterDecoder."""

import numpy as np
import pytest

from kaldi_tpu.decoder.lexchain import LexChainDecoder, LexChainGraph
from kaldi_tpu.decoder.viterbi import FasterDecoder, FasterDecoderOptions
from kaldi_tpu.lm.bigram import BigramBackoffLm


def random_lm(V, rng, n_expl=12):
    words = [f"W{i}" for i in range(V)]
    pairs = set()
    while len(pairs) < n_expl:
        pairs.add((int(rng.integers(0, V + 1)), int(rng.integers(0, V))))
    pairs = sorted(pairs, key=lambda t: (t[1], t[0]))
    return BigramBackoffLm(
        words=words,
        uni=rng.uniform(1.0, 4.0, V).astype(np.float32),
        bo=rng.uniform(0.2, 1.5, V + 1).astype(np.float32),
        expl_src=np.asarray([p[0] for p in pairs], np.int32),
        expl_dst=np.asarray([p[1] for p in pairs], np.int32),
        expl_cost=rng.uniform(0.5, 2.0, len(pairs)).astype(np.float32),
        eos=rng.uniform(0.5, 2.0, V + 1).astype(np.float32))


def random_lexicon(V, rng, num_phones=5, extra_variants=1):
    prons, pron_word = [], []
    for w in range(V):
        k = int(rng.integers(1, 4))
        prons.append(rng.integers(1, num_phones + 1, k).astype(np.int32))
        pron_word.append(w)
    for _ in range(extra_variants):
        w = int(rng.integers(0, V))
        prons.append(rng.integers(1, num_phones + 1, 2).astype(np.int32))
        pron_word.append(w)
    cost = np.zeros(len(prons), np.float32)
    cost[V:] = 0.3
    return prons, pron_word, cost


@pytest.mark.parametrize("seed,use_sil", [(0, False), (0, True),
                                          (1, False), (1, True),
                                          (2, True)])
def test_exact_match_host(seed, use_sil):
    rng = np.random.default_rng(seed)
    V = 7
    lm = random_lm(V, rng)
    prons, pron_word, pron_cost = random_lexicon(V, rng)
    g = LexChainGraph.build(prons, lm, pron_word=pron_word,
                            pron_cost=pron_cost, num_pdfs=12,
                            use_sil=use_sil, sil_phone=5, sil_prob=0.4)
    dec = LexChainDecoder(g)
    host = FasterDecoder(g.to_flat_graph().to_vector_fst(),
                         FasterDecoderOptions(beam=1e9, max_active=10**9))
    B, T = 3, 9
    ll = rng.normal(size=(B, T, g.num_pdfs)).astype(np.float32)
    lengths = [T, T - 2, T - 4]
    out = dec.decode_batch(ll, acoustic_scale=1.0, lengths=lengths)
    for b in range(B):
        ref = host.decode(ll[b, :lengths[b]], g.tid2pdf,
                          acoustic_scale=1.0)
        assert ref is not None and out[b] is not None
        words_d, tids_d, cost_d = out[b]
        r_ali, r_words, r_cost = ref
        assert abs(cost_d - r_cost) < 1e-3 * max(1, abs(r_cost)), \
            (b, cost_d, r_cost)
        assert words_d == r_words, (b, words_d, r_words)
        assert tids_d == r_ali


@pytest.mark.parametrize("seed,use_sil", [(0, True), (1, False)])
def test_pruned_full_k_matches_exact(seed, use_sil):
    """Beam-pruned entry expansion with K >= VC and exact top-k must
    reproduce the exact decode bitwise (same candidate set, same
    scatter-min reduction), including the traceback."""
    rng = np.random.default_rng(seed)
    V = 7
    lm = random_lm(V, rng)
    prons, pron_word, pron_cost = random_lexicon(V, rng)
    g = LexChainGraph.build(prons, lm, pron_word=pron_word,
                            pron_cost=pron_cost, num_pdfs=12,
                            use_sil=use_sil, sil_phone=5, sil_prob=0.4)
    dec = LexChainDecoder(g)
    B, T = 3, 9
    ll = rng.normal(size=(B, T, g.num_pdfs)).astype(np.float32)
    lengths = [T, T - 2, T - 4]
    ref = dec.decode_batch(ll, acoustic_scale=1.0, lengths=lengths)
    out = dec.decode_batch(ll, acoustic_scale=1.0, lengths=lengths,
                           prune_k=dec.VC, exact_topk=True)
    for b in range(B):
        assert out[b] is not None
        assert out[b][0] == ref[b][0]
        assert out[b][1] == ref[b][1]
        assert abs(out[b][2] - ref[b][2]) < 1e-4 * max(1, abs(ref[b][2]))


def test_pruned_small_k_degrades_gracefully(seed=0):
    """With a tiny K and a finite beam the decode must still produce
    word sequences on every lane, with cost >= the exact cost."""
    rng = np.random.default_rng(seed)
    V = 7
    lm = random_lm(V, rng)
    prons, pron_word, pron_cost = random_lexicon(V, rng)
    g = LexChainGraph.build(prons, lm, pron_word=pron_word,
                            pron_cost=pron_cost, num_pdfs=12,
                            use_sil=True, sil_phone=5, sil_prob=0.4)
    dec = LexChainDecoder(g)
    B, T = 2, 9
    ll = rng.normal(size=(B, T, g.num_pdfs)).astype(np.float32)
    ref = dec.decode_batch(ll, acoustic_scale=1.0)
    out = dec.decode_batch(ll, acoustic_scale=1.0, prune_k=2,
                           prune_beam=20.0, exact_topk=True)
    for b in range(B):
        assert out[b] is not None
        assert len(out[b][0]) > 0
        assert out[b][2] >= ref[b][2] - 1e-4


def test_state_count_linear_in_vocab():
    """The whole point vs block_chain: states grow O(rows + V), not
    O(V^2).  V=200 with <=4-phone prons must stay under 2k states
    (the block-chain equivalent is ~160k)."""
    rng = np.random.default_rng(3)
    V = 200
    lm = random_lm(V, rng, n_expl=300)
    prons, pron_word, pron_cost = random_lexicon(V, rng, num_phones=20,
                                                 extra_variants=0)
    g = LexChainGraph.build(prons, lm, pron_word=pron_word,
                            pron_cost=pron_cost, num_pdfs=40,
                            use_sil=True, sil_phone=1)
    assert g.num_states < 2000
    # and the FlatGraph agrees
    assert g.to_flat_graph().num_states == g.num_states


class TestBigramBackoffLm:
    def test_from_counts_is_a_distribution(self):
        rng = np.random.default_rng(0)
        vocab = [f"w{i}" for i in range(6)]
        sents = [[vocab[rng.integers(6)] for _ in range(rng.integers(1, 8))]
                 for _ in range(40)]
        lm = BigramBackoffLm.from_counts(sents, vocab)
        V = lm.V
        dense = lm.dense_cost()
        for u in range(V + 1):
            mass = np.exp(-dense[u]).sum() + np.exp(-lm.eos[u])
            assert mass < 1.02, (u, mass)
            assert mass > 0.5, (u, mass)   # most mass accounted for

    def test_dense_matches_scalar_cost(self):
        rng = np.random.default_rng(1)
        lm = random_lm(5, rng, n_expl=8)
        dense = lm.dense_cost()
        for u in range(6):
            for w in range(5):
                assert abs(dense[u, w] - lm.cost(u, w)) < 1e-5

    def test_arpa_round_trip(self):
        """to_arpa -> parse_arpa -> from_arpa reproduces the effective
        bigram costs (the decode-relevant quantity)."""
        from kaldi_tpu.lm.arpa import parse_arpa
        rng = np.random.default_rng(2)
        vocab = [f"w{i}" for i in range(5)]
        sents = [[vocab[rng.integers(5)] for _ in range(rng.integers(1, 6))]
                 for _ in range(30)]
        lm = BigramBackoffLm.from_counts(sents, vocab)
        lm2 = BigramBackoffLm.from_arpa(parse_arpa(lm.to_arpa()),
                                        vocab=vocab)
        np.testing.assert_allclose(lm2.dense_cost(), lm.dense_cost(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(lm2.eos, lm.eos, rtol=1e-4, atol=1e-4)


class TestRealModelTables:
    def _chain_system(self, phones):
        from kaldi_tpu.hmm.topology import HmmTopology
        from kaldi_tpu.hmm.transition_model import TransitionModel
        from kaldi_tpu.tree import monophone_context_dependency
        topo = HmmTopology.chain_topology(list(phones))
        tree = monophone_context_dependency(list(phones),
                                            {p: 2 for p in phones})
        return TransitionModel(topo, tree), tree

    def test_tables_consistent_with_tm(self):
        phones = [1, 2, 3, 4]
        tm, tree = self._chain_system(phones)
        rng = np.random.default_rng(4)
        lm = random_lm(4, rng, n_expl=5)
        prons = [np.array([1, 2]), np.array([2]), np.array([3, 1, 4]),
                 np.array([4, 4])]
        g = LexChainGraph.build(prons, lm, tm=tm, tree=tree,
                                use_sil=True, sil_phone=3)
        assert g.num_pdfs == tree.num_pdfs
        for n in range(g.n_true):
            assert g.tid2pdf[g.tid_fwd_row[n]] == g.pdf_fwd_row[n]
            assert g.tid2pdf[g.tid_self_row[n]] == g.pdf_self_row[n]
            assert not tm.is_self_loop(int(g.tid_fwd_row[n]))
            assert tm.is_self_loop(int(g.tid_self_row[n]))
            assert tm.transition_id_to_phone(int(g.tid_fwd_row[n])) == \
                g.row_phone[n]
        for p in range(g.P):
            assert g.tid2pdf[g.tid_end[p]] == g.pdf_end[p]
            assert tm.transition_id_to_phone(int(g.tid_end[p])) == \
                int(g.prons[p][-1])
        assert tm.is_self_loop(g.sil_tid_self)
        assert tm.transition_id_to_phone(g.sil_tid_fwd) == 3

    def test_exact_match_host_real_tm(self):
        phones = [1, 2, 3, 4, 5]
        tm, tree = self._chain_system(phones)
        rng = np.random.default_rng(5)
        lm = random_lm(5, rng, n_expl=8)
        prons, pron_word, pron_cost = random_lexicon(5, rng, num_phones=5)
        g = LexChainGraph.build(prons, lm, pron_word=pron_word,
                                pron_cost=pron_cost, tm=tm, tree=tree,
                                use_sil=True, sil_phone=2)
        dec = LexChainDecoder(g)
        host = FasterDecoder(g.to_flat_graph().to_vector_fst(),
                             FasterDecoderOptions(beam=1e9,
                                                  max_active=10**9))
        B, T = 2, 8
        ll = rng.normal(size=(B, T, g.num_pdfs)).astype(np.float32)
        out = dec.decode_batch(ll, acoustic_scale=1.0)
        for b in range(B):
            ref = host.decode(ll[b], g.tid2pdf, acoustic_scale=1.0)
            words_d, tids_d, cost_d = out[b]
            r_ali, r_words, r_cost = ref
            assert abs(cost_d - r_cost) < 1e-3 * max(1, abs(r_cost))
            assert words_d == r_words
            assert tids_d == r_ali


def test_dense_and_bucket_corrections_identical():
    """The exact forward's explicit-bigram corrections have two
    layouts (one padded dense gather vs the bucketed-CSR loop); both
    must produce bitwise-equal decodes."""
    rng = np.random.default_rng(11)
    V = 30
    lm = random_lm(V, rng, n_expl=500)
    prons, pron_word, pron_cost = random_lexicon(V, rng, num_phones=4)
    g = LexChainGraph.build(prons, lm, pron_word=pron_word,
                            pron_cost=pron_cost)
    dec1 = LexChainDecoder(g)
    dec2 = LexChainDecoder(g)
    dec2._use_dense_corr = not dec1._use_dense_corr
    ll = rng.normal(size=(4, 25, g.num_pdfs)).astype(np.float32) * 2
    out1 = dec1.decode_batch(ll, 1.0)
    out2 = dec2.decode_batch(ll, 1.0)
    for a, b in zip(out1, out2):
        assert a[0] == b[0] and a[1] == b[1]
        assert abs(a[2] - b[2]) < 1e-4
