#!/usr/bin/env python
"""On-chip search-kernel profiling for the headline pipeline: stage
split (forward scan / follow scan / host traceback) of
LexChainDecoder.decode_batch on the bench graph with DEVICE-RESIDENT
loglikes (isolates search from ingest and the AM), across
{unroll 1,4} x {dense, bucket} correction layouts.

Run alone on the real chip: python egs/bench_corpus/profile_search.py"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from kaldi_tpu.decoder.lexchain import LexChainDecoder
    from kaldi_tpu.feat.frontend import OfflineFeature
    from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
    from kaldi_tpu.recipes.bench_corpus import (BenchCorpusSpec,
                                                build_decode_graph,
                                                chain_tm_tree_for,
                                                load_params,
                                                make_corpus,
                                                mfcc_options)
    spec = BenchCorpusSpec()
    lexicon, _tr, _trw, test_txt, test_wav, lm_text = make_corpus(spec)
    lang, chain_tm, chain_tree = chain_tm_tree_for(lexicon)
    graph = build_decode_graph(lexicon, lm_text, chain_tm, chain_tree,
                               lang=lang)
    cfg = ChainTdnnfConfig(feat_dim=40, num_pdfs=chain_tm.num_pdfs,
                           frame_subsampling_factor=3,
                           hidden_dim=1536, bottleneck_dim=160,
                           prefinal_dim=256, num_layers=17,
                           subsample_layer=8)
    model = ChainTdnnf(cfg, train=False)
    variables = load_params(os.path.join(
        REPO, "egs/bench_corpus/flagship_params.npz"))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        variables["params"])
    fe = OfflineFeature(mfcc_options(spec, num_ceps=40))
    utts = sorted(test_wav)
    feats = fe.compute_batch([np.asarray(test_wav[u], np.float32)
                              for u in utts])
    Tmax = max(f.shape[0] for f in feats)
    Tmax = -(-Tmax // 3) * 3
    batch = np.zeros((len(utts), Tmax, 40), np.float32)
    for i, f in enumerate(feats):
        batch[i, :f.shape[0]] = f

    @jax.jit
    def am(x):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             x)
        return out

    ll = am(jnp.asarray(batch))
    np.asarray(ll[0, 0, 0])          # materialize on device
    lengths = [f.shape[0] // 3 for f in feats]
    audio_s = sum(len(test_wav[u]) for u in utts) / spec.fs
    print(f"# {len(utts)} lanes, loglikes {ll.shape}, "
          f"{audio_s:.0f}s audio", file=sys.stderr)
    for unroll in (1, 4):
        os.environ["KALDI_TPU_SCAN_UNROLL"] = str(unroll)
        for dense in (True, False):
            dec = LexChainDecoder(graph)
            dec._use_dense_corr = dense
            t0 = time.time()
            out = dec.decode_batch(ll, 1.0, lengths=lengths)
            compile_s = time.time() - t0
            times = []
            stats = {}
            for it in range(3):
                t0 = time.time()
                out = dec.decode_batch(ll, 1.0, lengths=lengths)
                times.append(time.time() - t0)
            dec.decode_batch(ll, 1.0, lengths=lengths, stats=stats)
            med = sorted(times)[1]
            n_ok = sum(o is not None for o in out)
            print(f"unroll={unroll} dense={int(dense)}: "
                  f"median {med * 1000:.0f}ms = {audio_s / med:.0f}x RT "
                  f"(fwd {stats['fwd_s'] * 1000:.0f}ms, fol "
                  f"{stats['fol_s'] * 1000:.0f}ms, traceback "
                  f"{stats['traceback_s'] * 1000:.0f}ms; compile "
                  f"{compile_s:.0f}s; {n_ok} ok)")


if __name__ == "__main__":
    main()
