"""End-to-end WER through the DEVICE pipeline on the bench corpus:
wav -> batched MFCC -> chain TDNN-F -> LexChain device Viterbi ->
words, with the graph built from the trained tree + estimated backoff
LM (VERDICT r2 items 1 and 7: speech through the device decoder to a
pinned WER, sensitive to scale/beam-class bugs)."""

import numpy as np
import pytest

from kaldi_tpu.nnet3.models import ChainTdnnfConfig
from kaldi_tpu.recipes.bench_corpus import (BenchCorpusSpec,
                                            build_decode_graph,
                                            mfcc_options, train_system,
                                            wer_of)


@pytest.fixture(scope="module")
def system():
    spec = BenchCorpusSpec(vocab=30, num_phone_groups=5,
                           phones_per_group=2, words_per_utt=8,
                           num_train=48, num_test=16, num_lm_sents=600,
                           noise=850.0, f2_gap=120.0, seed=11)
    from kaldi_tpu.recipes.chain import ChainTrainOptions
    cfg = ChainTdnnfConfig(feat_dim=13, num_pdfs=2 * (spec.num_phones + 1),
                           hidden_dim=64, bottleneck_dim=16,
                           prefinal_dim=32, num_layers=4,
                           subsample_layer=2, frame_subsampling_factor=3)
    opts = ChainTrainOptions(num_epochs=20, learning_rate=2e-3,
                             minibatch_size=8, chunk_width=150,
                             left_tolerance=5, right_tolerance=5)
    sysd = train_system(spec, cfg=cfg, chain_opts=opts, num_ceps=13,
                        mono_iters=8, mono_totgauss=300)
    graph = build_decode_graph(sysd["lexicon"], sysd["lm_text"],
                               sysd["chain_tm"], sysd["chain_tree"],
                               lang=sysd["lang"])
    return sysd, graph, spec


def _pipeline(sysd, graph, spec, acoustic_scale=1.0):
    import jax
    from kaldi_tpu.decoder.batched_pipeline2 import BatchedOfflinePipeline2
    from kaldi_tpu.decoder.lexchain import LexChainDecoder
    from kaldi_tpu.feat.frontend import OfflineFeature
    from kaldi_tpu.nnet3.models import ChainTdnnf
    model = sysd["model"]
    eval_model = ChainTdnnf(model.cfg, train=False)
    dec = LexChainDecoder(graph)
    fe = OfflineFeature(mfcc_options(spec, num_ceps=13))
    return BatchedOfflinePipeline2(
        eval_model, sysd["variables"]["params"],
        sysd["variables"].get("batch_stats", {}), dec, fe,
        acoustic_scale=acoustic_scale, sample_rate=spec.fs)


def _decode_wer(sysd, graph, spec, **kw):
    pipe = _pipeline(sysd, graph, spec, **kw)
    utts = sorted(sysd["test_wav"])
    waves = [sysd["test_wav"][u] for u in utts]
    out = pipe.decode_batch(waves)
    hyps = {}
    for u, o in zip(utts, out):
        hyps[u] = [] if o is None else [graph.words[w] for w in o[0]]
    return wer_of(hyps, sysd["test_txt"])


@pytest.mark.slow
class TestBenchCorpusDevicePipeline:
    def test_device_pipeline_wer_band(self, system):
        """Pinned band for the full device pipeline.  The corpus is
        built to be hard (confusable last phones, noise): WER must be
        nonzero but the system must clearly work."""
        sysd, graph, spec = system
        wer = _decode_wer(sysd, graph, spec)
        print(f"device pipeline WER: {wer:.2f}%")
        assert 0.0 < wer <= 25.0, f"WER {wer:.1f}% out of band"

    def test_acoustic_scale_bug_detected(self, system):
        """A mis-scaled AM must blow the band (sensitivity proof):
        with the acoustics scaled down 50x the LM dominates and the
        decode must collapse toward LM-preferred text."""
        sysd, graph, spec = system
        good = _decode_wer(sysd, graph, spec)
        bad = _decode_wer(sysd, graph, spec, acoustic_scale=0.02)
        assert bad > good + 15.0, (good, bad)

    def test_wave_pipelined_decode_matches_single(self, system):
        """num_waves>1 (ingest/compute overlap) must be a pure
        performance option: identical words and costs to the
        single-wave decode."""
        sysd, graph, spec = system
        pipe = _pipeline(sysd, graph, spec)
        utts = sorted(sysd["test_wav"])
        waves = [sysd["test_wav"][u] for u in utts]
        ref = pipe.decode_batch(waves)
        out = pipe.decode_batch(waves, num_waves=3)
        assert len(out) == len(ref)
        for r, o in zip(ref, out):
            assert (r is None) == (o is None)
            if r is not None:
                assert o[0] == r[0]
                assert o[1] == pytest.approx(r[1], abs=1e-3)

    def test_lm_informative(self, system):
        """The estimated bigram must model held-out text far better
        than a flat LM (perplexity — the statistically stable check at
        this corpus size), and decoding with it must not blow up WER."""
        from kaldi_tpu.lm.bigram import BigramBackoffLm
        from kaldi_tpu.decoder.lexchain import LexChainGraph
        sysd, graph, spec = system
        lm = graph.lm
        vocab = {w: i for i, w in enumerate(lm.words)}
        V = graph.V
        # held-out per-word cost under the backoff bigram
        tot_cost, n_words = 0.0, 0
        for sent in sysd["test_txt"].values():
            prev = V                       # <s>
            for w in sent:
                i = vocab[w]
                tot_cost += lm.cost(prev, i)
                n_words += 1
                prev = i
            tot_cost += float(lm.eos[prev])
            n_words += 1
        bigram_nll = tot_cost / n_words
        flat_nll = np.log(V + 1)
        print(f"held-out NLL/word: bigram {bigram_nll:.3f} vs flat "
              f"{flat_nll:.3f}")
        assert bigram_nll < flat_nll - 0.3, (bigram_nll, flat_nll)
        # WER guard: the LM must not degrade decoding materially
        good = _decode_wer(sysd, graph, spec)
        flat = BigramBackoffLm(
            words=list(lm.words),
            uni=np.full(V, np.log(V), np.float32),
            bo=np.zeros(V + 1, np.float32),
            expl_src=np.zeros(0, np.int32),
            expl_dst=np.zeros(0, np.int32),
            expl_cost=np.zeros(0, np.float32),
            eos=np.full(V + 1, np.log(V), np.float32))
        g_flat = LexChainGraph.build(
            graph.prons, flat, pron_word=graph.pron_word,
            pron_cost=graph.pron_cost, tm=sysd["chain_tm"],
            tree=sysd["chain_tree"], use_sil=True,
            sil_phone=sysd["lang"].phones["SIL"], sil_prob=0.5)
        flat_wer = _decode_wer(sysd, g_flat, spec)
        print(f"bigram {good:.2f}% vs flat {flat_wer:.2f}%")
        assert good <= flat_wer + 3.0, (good, flat_wer)
