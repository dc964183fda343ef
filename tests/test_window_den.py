"""The tied pair-state window denominator LM (the vocabulary-scale
denominator form) must train a usable AM.

Regression for the round-4 scale failure: the sparse unsmoothed
token-bigram denominator made LF-MMI collapse the AM to silence
(objf climbing without plateau, deletion-only decodes, WER 97-99% on
BOTH the V=20k scale system and — forced on — the known-good V=30
fixture).  estimate_window_lm replaces it; this test trains the V=30
fixture with window_den=True and requires the WER band the dense
small-corpus denominator achieves (~4-6%)."""

import numpy as np
import pytest

from kaldi_tpu.recipes.bench_corpus import (BenchCorpusSpec,
                                            build_decode_graph_ng,
                                            mfcc_options, train_system,
                                            wer_of)
from kaldi_tpu.recipes.chain import ChainTrainOptions


@pytest.mark.slow
def test_window_den_trains_fixture():
    spec = BenchCorpusSpec(vocab=30, num_phone_groups=5,
                           phones_per_group=2, words_per_utt=8,
                           num_train=48, num_test=48,
                           num_lm_sents=3000, noise=850.0,
                           f2_gap=120.0, seed=11)
    opts = ChainTrainOptions(num_epochs=20, learning_rate=2e-3,
                             minibatch_size=8, chunk_width=150,
                             left_tolerance=5, right_tolerance=5)
    sysd = train_system(spec, cfg=None, chain_opts=opts, num_ceps=13,
                        mono_iters=8, mono_totgauss=300, ctx=True,
                        max_leaves=60, min_gain=30.0, window_den=True)
    graph = build_decode_graph_ng(sysd["lexicon"], sysd["lm_text"],
                                  sysd["chain_tm"],
                                  sysd["chain_tree"],
                                  lang=sysd["lang"], prune_tri=1)
    from kaldi_tpu.decoder.batched_pipeline2 import \
        BatchedOfflinePipeline2
    from kaldi_tpu.decoder.lexchain_ng import NgramLexDecoder
    from kaldi_tpu.feat.frontend import OfflineFeature
    from kaldi_tpu.nnet3.models import ChainTdnnf
    eval_model = ChainTdnnf(sysd["model"].cfg, train=False)
    pipe = BatchedOfflinePipeline2(
        eval_model, sysd["variables"]["params"],
        sysd["variables"].get("batch_stats", {}),
        NgramLexDecoder(graph),
        OfflineFeature(mfcc_options(spec, num_ceps=13)),
        acoustic_scale=1.0, sample_rate=spec.fs)
    utts = sorted(sysd["test_wav"])
    out = pipe.decode_batch([sysd["test_wav"][u] for u in utts])
    hyps = {u: ([] if o is None else [graph.words[w] for w in o[0]])
            for u, o in zip(utts, out)}
    wer = wer_of(hyps, sysd["test_txt"])
    hyplen = np.mean([len(h) for h in hyps.values()])
    reflen = np.mean([len(sysd["test_txt"][u]) for u in utts])
    print(f"window-den fixture WER {wer:.2f}% "
          f"(hyplen {hyplen:.1f} / ref {reflen:.1f})")
    # the silence-collapse failure mode gives ~97% WER and hyplen < 1;
    # the healthy band (dense den) is ~4%.  Gate generously.
    assert wer <= 15.0, f"WER {wer:.1f}% out of band"
    assert hyplen > 0.7 * reflen, "deletion collapse"
