#!/usr/bin/env python
"""On-chip measurement of the SCALE online pipeline (VERDICT r4 #7):
BatchedDeviceOnlinePipelineNg (trigram x triphone NgramLexDecoder,
V=20k, ~500k states) with ENDPOINTING enabled — streams x chunk
latency x aggregate xRT, plus WER of the finalized outputs against
the bench test set.

Mirrors the reference's online configuration
(cudadecoder/batched-threaded-nnet3-cuda-online-pipeline.h:48 lanes/
channels + online2/online-endpoint.h rules) on the round-4 production
decoder.  i-vectors are estimated per-utterance up front with the
batched device extractor (the offline bench does the same); the
streaming AM consumes them per lane.

Run ALONE on the real chip (never share the tunnel):
    python egs/bench_corpus/measure_online_ng.py [--lanes 64]
        [--chunk 32] [--quick]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
ART = os.path.join(REPO, "egs", "bench_corpus")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--prune-k", type=int, default=128)
    ap.add_argument("--quick", action="store_true",
                    help="tiny subset smoke (still needs artifacts)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from kaldi_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from kaldi_tpu.decoder.lexchain_ng import NgramLexDecoder
    from kaldi_tpu.feat.frontend import OfflineFeature
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.ivector.batched import BatchedIvectorExtractor
    from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
    from kaldi_tpu.online.batched_device_pipeline import \
        BatchedDeviceOnlinePipelineNg
    from kaldi_tpu.recipes.bench_corpus import (bench_scale_spec,
                                                build_decode_graph_ng,
                                                load_ivector_extractor,
                                                load_params,
                                                make_corpus,
                                                mfcc_options,
                                                wer_of)
    from kaldi_tpu.tree.context_dep import ContextDependency
    from kaldi_tpu.util import kaldi_io

    spec = bench_scale_spec()
    t0 = time.time()
    lexicon, _tr, _trw, test_txt, test_wav, lm_text = \
        make_corpus(spec, train_audio=False)
    tm = kaldi_io.read_kaldi_object(
        TransitionModel.read, os.path.join(ART, "flagship_ng.tm"))
    tree = kaldi_io.read_kaldi_object(
        ContextDependency.read, os.path.join(ART, "flagship_ng.tree"))
    graph = build_decode_graph_ng(lexicon, lm_text, tm, tree,
                                  prune_bi=2, prune_tri=3)
    dec = NgramLexDecoder(graph)
    print(f"# graph: S={graph.num_states} V={graph.V} U={graph.U} "
          f"(built {time.time() - t0:.0f}s)", file=sys.stderr)

    meta = json.load(open(os.path.join(ART, "flagship_ng_meta.json")))
    cfg = ChainTdnnfConfig(
        feat_dim=40, ivector_dim=32, num_pdfs=meta["num_pdfs"],
        hidden_dim=1536, bottleneck_dim=160, prefinal_dim=256,
        num_layers=17, subsample_layer=8, frame_subsampling_factor=3)
    model = ChainTdnnf(cfg, train=False)
    variables = load_params(os.path.join(ART, "flagship_ng_params.npz"))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        variables["params"])
    batch_stats = variables["batch_stats"]
    fe = OfflineFeature(mfcc_options(spec, num_ceps=40))
    bex = BatchedIvectorExtractor(load_ivector_extractor(
        os.path.join(ART, "flagship_ng_ivec.npz")))

    B, Tc = args.lanes, args.chunk
    if args.quick:
        args.rounds = 1
    utts = sorted(test_wav)[:B]
    # stacked output-rate features (one decode step per 3 input frames)
    sub = cfg.frame_subsampling_factor
    raw = [np.asarray(fe.compute(np.asarray(test_wav[u], np.float32)))
           for u in utts]
    feats = {}
    for u, f in zip(utts, raw):
        T = (f.shape[0] // sub) * sub
        feats[u] = f[:T].reshape(T // sub, sub * f.shape[1])
    # per-lane utterance i-vectors from the batched device extractor
    Tmax = max(f.shape[0] for f in raw)
    batch = np.zeros((len(utts), Tmax, 40), np.float32)
    for i, f in enumerate(raw):
        batch[i, :f.shape[0]] = f
    lane_ivecs = np.asarray(bex.extract_batch(jnp.asarray(batch)))

    @jax.jit
    def am(x, iv):
        out, _ = model.apply({"params": params,
                              "batch_stats": batch_stats}, x,
                             iv.astype(jnp.bfloat16))
        return out

    iv_dev = jnp.asarray(lane_ivecs)

    def scorer(stacked):
        b, tc, d = stacked.shape
        x = np.asarray(stacked).reshape(b, tc * sub, d // sub)
        return np.asarray(am(jnp.asarray(x), iv_dev))

    pipe = BatchedDeviceOnlinePipelineNg(
        dec, scorer, feat_dim=40 * sub, num_lanes=B, chunk_frames=Tc,
        endpointing=True, prune_k=args.prune_k, prune_beam=16.0)

    results = {}
    chunk_lat = []
    for rnd in range(args.rounds):
        for b, u in enumerate(utts):
            pipe.init_channel(b, u)
        cursors = [0] * B
        t0 = time.time()
        n_chunks = 0
        fin_lat = []
        while True:
            fed = False
            for b, u in enumerate(utts):
                f = feats[u]
                c = cursors[b]
                if c < f.shape[0]:
                    pipe.accept_features(b, f[c:c + Tc])
                    cursors[b] += Tc
                    fed = True
            if not fed:
                break
            t1 = time.time()
            pipe.compute()
            if rnd == args.rounds - 1:
                chunk_lat.append(time.time() - t1)
            n_chunks += 1
        while pipe.compute():
            pass
        for b in range(B):
            t1 = time.time()
            results[utts[b]] = pipe.finalize(b)
            fin_lat.append(time.time() - t1)
            pipe.free_channel(b)
        wall = time.time() - t0
        audio_s = sum(f.shape[0] for f in feats.values()) * 0.03
        print(f"# round {rnd}: {audio_s:.0f}s audio, wall {wall:.2f}s "
              f"({audio_s / wall:.0f}x RT aggregate, {n_chunks} "
              f"chunks), finalize p50 {np.median(fin_lat) * 1e3:.1f}ms "
              f"p99 {np.percentile(fin_lat, 99) * 1e3:.1f}ms",
              file=sys.stderr)
    hyps = {u: ([] if r is None else [graph.words[w] for w in r[0]])
            for u, r in results.items()}
    refs = {u: test_txt[u] for u in utts}
    wer = wer_of(hyps, refs)
    n_ok = sum(r is not None for r in results.values())
    print(json.dumps({
        "metric": "online_ng_pipeline_aggregate_xRT",
        "value": round(audio_s / wall, 1), "unit": "x realtime",
        "lanes": B, "chunk_frames": Tc, "endpointing": True,
        "states": graph.num_states, "vocab": graph.V,
        "chunk_ms_p50": round(
            float(np.median(chunk_lat)) * 1e3, 1) if chunk_lat else None,
        "finalize_ms_p50": round(float(np.median(fin_lat)) * 1e3, 2),
        "finalize_ms_p99": round(
            float(np.percentile(fin_lat, 99)) * 1e3, 2),
        "wer": round(wer, 2), "decoded": n_ok,
    }))


if __name__ == "__main__":
    main()
