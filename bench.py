"""Benchmark: FULL-PIPELINE batched offline decode on one chip, at a
pinned WER, on a VOCABULARY-SCALE graph — wav -> fused MFCC frontend
-> batched device i-vectors -> TRAINED chain TDNN-F (flagship 17x1536
shape, bf16) -> batched device Viterbi over a ~500k-state graph BUILT
FROM DATA (V=20k lexicon x estimated backoff TRIGRAM x trained
TRIPHONE-tree pdf/transition tables, decoder/lexchain_ng.py) -> words
-> WER.

This mirrors the reference's metric of record, the `RealTimeX =
total_audio/total_time` line of batched-wav-nnet3-cuda2
(src/cudadecoderbin/batched-wav-nnet3-cuda2.cc:246-249; ~3524x RT on a
V100 per arXiv:1910.10032, measured on a LibriSpeech-scale HCLG — the
graph class this bench now matches).  Prints ONE JSON line {"metric",
"value", "unit", "vs_baseline", "wer", "states", "vocab"}.

Configuration: the deterministic vocabulary-scale corpus
(kaldi_tpu.recipes.bench_corpus.bench_scale_spec): 128 test utterances
(~4.5 s, 16 kHz, 24 synthetic speakers with VTLN-like warps), V=20000
vocabulary, optional-silence lexicon, trigram estimated from 600k
corpus sentences, triphone chain tree (~2000 leaves); AM = flagship
LibriSpeech TDNN-F trunk (17x1536, bottleneck 160) + 32-dim i-vectors,
trained by `egs/bench_corpus/train.py --scale` (committed artifacts
egs/bench_corpus/flagship_ng_*).  Falls back to the legacy V=200
bigram bench (round 3) if the scale artifacts are absent.

Timing: wall-clock host waves -> host word sequences; the traceback
transfer forces a device sync (axon block_until_ready does not
reliably synchronize, BASELINE.md).

Usage: python bench.py [--quick] [--legacy] [--with-lattices]
                       [--wire=mulaw|int16] [--prune-k=N]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
ART = os.path.join(REPO, "egs", "bench_corpus")


def run_pipeline(pipe, waves, quick, graph, test_txt, utts,
                 with_lattices=False):
    from kaldi_tpu.decoder.batched_pipeline2 import PipelineStats
    from kaldi_tpu.recipes.bench_corpus import wer_of
    t0 = time.time()
    out = pipe.decode_batch(waves)                 # compile + warm
    print(f"# compile+warmup: {time.time() - t0:.1f}s",
          file=sys.stderr)
    xrts = []
    for it in range(1 if quick else 3):
        stats = PipelineStats()
        out = pipe.decode_batch(waves, stats=stats)
        n_ok = sum(o is not None for o in out)
        xrts.append(stats.xrt)
        print(f"# iter{it}: {stats.total_audio_s:.0f}s audio in "
              f"{stats.wall_s:.2f}s wall (feat {stats.feat_s:.2f}s, "
              f"am {stats.am_s:.2f}s, search {stats.search_s:.2f}s), "
              f"{n_ok}/{len(waves)} lanes decoded", file=sys.stderr)
    xrt = sorted(xrts)[len(xrts) // 2]
    hyps = {u: ([] if o is None else [graph.words[w] for w in o[0]])
            for u, o in zip(utts, out)}
    wer = wer_of(hyps, test_txt)
    print(f"# WER: {wer:.2f}% over "
          f"{sum(len(r) for r in test_txt.values())} words",
          file=sys.stderr)
    lat_xrt = None
    if with_lattices:
        t0 = time.time()
        pipe.decode_batch(waves, generate_lattices=True)
        print(f"# lattice-mode compile+warmup: {time.time() - t0:.1f}s",
              file=sys.stderr)
        lstats = PipelineStats()
        lout = pipe.decode_batch(waves, stats=lstats,
                                 generate_lattices=True)
        n_lat = sum(o is not None and o[2] is not None for o in lout)
        lhyps = {u: ([] if o is None else
                     [graph.words[w] for w in o[0]])
                 for u, o in zip(utts, lout)}
        lwer = wer_of(lhyps, test_txt)
        lat_xrt = lstats.xrt
        print(f"# lattice pipeline: {lstats.total_audio_s:.0f}s audio "
              f"in {lstats.wall_s:.2f}s = {lstats.xrt:.1f}x RT, "
              f"{n_lat}/{len(waves)} lattices, best-path WER "
              f"{lwer:.2f}%", file=sys.stderr)
    return xrt, wer, lat_xrt


def stage_waves(test_wav, utts, wire):
    if wire == "mulaw":
        from kaldi_tpu.feat.frontend import mulaw_encode
        waves = [mulaw_encode(np.clip(test_wav[u], -32767, 32767))
                 for u in utts]
    else:
        waves = [np.clip(test_wav[u], -32767, 32767).astype(np.int16)
                 for u in utts]
    print(f"# wire: {wire} "
          f"({sum(w.nbytes for w in waves) / 1e6:.1f} MB/batch)",
          file=sys.stderr)
    return waves


def main_scale(quick):
    """The round-4 headline: V=20k trigram x triphone, trained
    flagship + i-vectors, WER on a ~500k-state graph."""
    import jax
    from kaldi_tpu.decoder.batched_pipeline2 import \
        BatchedOfflinePipeline2
    from kaldi_tpu.decoder.lexchain_ng import NgramLexDecoder
    from kaldi_tpu.feat.frontend import OfflineFeature
    from kaldi_tpu.ivector.batched import BatchedIvectorExtractor
    from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
    from kaldi_tpu.recipes.bench_corpus import (bench_scale_spec,
                                                build_decode_graph_ng,
                                                corpus_fingerprint,
                                                load_ivector_extractor,
                                                load_params,
                                                make_corpus,
                                                mfcc_options)
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.tree.context_dep import ContextDependency
    from kaldi_tpu.util import kaldi_io

    spec = bench_scale_spec()
    t0 = time.time()
    lexicon, _tr, _trw, test_txt, test_wav, lm_text = \
        make_corpus(spec, train_audio=False)
    chain_tm = kaldi_io.read_kaldi_object(
        TransitionModel.read, os.path.join(ART, "flagship_ng.tm"))
    chain_tree = kaldi_io.read_kaldi_object(
        ContextDependency.read, os.path.join(ART, "flagship_ng.tree"))
    graph = build_decode_graph_ng(lexicon, lm_text, chain_tm,
                                  chain_tree, prune_bi=2, prune_tri=3)
    decoder = NgramLexDecoder(graph)
    print(f"# corpus+graph: V={graph.V} states={graph.num_states} "
          f"units={graph.U} (LM: {graph.lm.SP} pair states, "
          f"{graph.lm.num_explicit_bi} bi, "
          f"{graph.lm.num_explicit_tri} tri) built in "
          f"{time.time() - t0:.1f}s", file=sys.stderr)

    variables = load_params(os.path.join(ART,
                                         "flagship_ng_params.npz"))
    params, batch_stats = variables["params"], variables["batch_stats"]
    meta = json.load(open(os.path.join(ART, "flagship_ng_meta.json")))
    # refuse to report a silently-drifted WER: the committed model must
    # have been trained on THIS corpus generator (VERDICT r4 weak #1)
    fp = corpus_fingerprint(spec, lexicon, test_txt, test_wav, lm_text)
    hash_ok = meta.get("corpus_hash") == fp
    if not hash_ok:
        print(f"# CORPUS HASH MISMATCH: committed model trained on "
              f"{meta.get('corpus_hash')}, generator now produces "
              f"{fp} — WER below is NOT comparable; retrain "
              f"(egs/bench_corpus/train.py --scale)", file=sys.stderr)
    cfg = ChainTdnnfConfig(
        feat_dim=40, ivector_dim=32, num_pdfs=meta["num_pdfs"],
        hidden_dim=1536, bottleneck_dim=160, prefinal_dim=256,
        num_layers=17, subsample_layer=8, frame_subsampling_factor=3)
    model = ChainTdnnf(cfg, train=False)
    import jax.numpy as jnp
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params)
    bex = BatchedIvectorExtractor(load_ivector_extractor(
        os.path.join(ART, "flagship_ng_ivec.npz")))

    prune_k = 128
    for a in sys.argv:
        if a.startswith("--prune-k="):
            prune_k = int(a.split("=", 1)[1])
    pipe = BatchedOfflinePipeline2(
        model, params, batch_stats, decoder,
        OfflineFeature(mfcc_options(spec)), acoustic_scale=1.0,
        sample_rate=spec.fs, ivector_extractor=bex,
        search_kwargs=dict(prune_k=prune_k, prune_beam=16.0,
                           exact_topk=False))
    utts = sorted(test_wav)
    wire = "mulaw"
    for a in sys.argv:
        if a.startswith("--wire="):
            wire = a.split("=", 1)[1]
    waves = stage_waves(test_wav, utts, wire)
    xrt, wer, lat_xrt = run_pipeline(
        pipe, waves, quick, graph, test_txt, utts,
        with_lattices="--with-lattices" in sys.argv)
    baseline = 3524.0   # V100 full-pipeline RealTimeX, arXiv:1910.10032
    out = {
        "metric": "full_pipeline_offline_decode_xRT_per_chip",
        "value": round(xrt, 1),
        "unit": "x realtime",
        "vs_baseline": round(xrt / baseline, 3),
        "wer": round(wer, 2),
        "states": graph.num_states,
        "vocab": graph.V,
    }
    if lat_xrt is not None:
        out["lattice_xrt"] = round(lat_xrt, 1)
    if not hash_ok:
        out["degraded"] = True
        out["note"] = ("corpus hash mismatch: committed model was "
                       "trained on a different corpus-generator "
                       "version; WER not comparable")
    print(json.dumps(out))


def main_legacy(quick, degraded_reason=None):
    """Round-3 headline (V=200 bigram lexchain), kept for continuity
    and as the fallback when scale artifacts are absent."""
    from kaldi_tpu.decoder.batched_pipeline2 import \
        BatchedOfflinePipeline2
    from kaldi_tpu.decoder.lexchain import LexChainDecoder
    from kaldi_tpu.feat.frontend import OfflineFeature
    from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
    from kaldi_tpu.recipes.bench_corpus import (BenchCorpusSpec,
                                                build_decode_graph,
                                                chain_tm_tree_for,
                                                load_params,
                                                make_corpus,
                                                mfcc_options)
    import jax
    import jax.numpy as jnp
    if quick:
        spec = BenchCorpusSpec(vocab=24, num_phone_groups=4,
                               phones_per_group=2, words_per_utt=5,
                               num_train=2, num_test=6,
                               num_lm_sents=80)
        cfg_dims = dict(hidden_dim=128, bottleneck_dim=32,
                        prefinal_dim=64, num_layers=4,
                        subsample_layer=2)
    else:
        spec = BenchCorpusSpec()
        cfg_dims = dict(hidden_dim=1536, bottleneck_dim=160,
                        prefinal_dim=256, num_layers=17,
                        subsample_layer=8)
    t0 = time.time()
    lexicon, _tr, _trw, test_txt, test_wav, lm_text = make_corpus(
        spec, train_audio=False)
    lang, chain_tm, chain_tree = chain_tm_tree_for(lexicon)
    graph = build_decode_graph(lexicon, lm_text, chain_tm, chain_tree,
                               lang=lang)
    decoder = LexChainDecoder(graph)
    print(f"# corpus+graph: V={graph.V} states={graph.num_states} "
          f"built in {time.time() - t0:.1f}s", file=sys.stderr)
    cfg = ChainTdnnfConfig(feat_dim=40, num_pdfs=chain_tm.num_pdfs,
                           frame_subsampling_factor=3, **cfg_dims)
    model = ChainTdnnf(cfg, train=False)
    params_path = os.path.join(ART, "flagship_params.npz")
    trained = (not quick) and os.path.exists(params_path)
    if trained:
        variables = load_params(params_path)
        params, batch_stats = variables["params"], \
            variables["batch_stats"]
    else:
        feats0 = jnp.zeros((2, 50, cfg.feat_dim), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), feats0)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params)
    pipe = BatchedOfflinePipeline2(
        model, params, batch_stats, decoder,
        OfflineFeature(mfcc_options(spec, num_ceps=40)),
        acoustic_scale=1.0, sample_rate=spec.fs)
    utts = sorted(test_wav)
    wire = "mulaw"
    for a in sys.argv:
        if a.startswith("--wire="):
            wire = a.split("=", 1)[1]
    waves = stage_waves(test_wav, utts, wire)
    xrt, wer, lat_xrt = run_pipeline(
        pipe, waves, quick, graph, test_txt, utts,
        with_lattices="--with-lattices" in sys.argv)
    baseline = 3524.0
    out = {
        "metric": "full_pipeline_offline_decode_xRT_per_chip",
        "value": round(xrt, 1),
        "unit": "x realtime",
        "vs_baseline": round(xrt / baseline, 3),
        "wer": None if not trained else round(wer, 2),
        "states": graph.num_states,
        "vocab": graph.V,
        "note": "legacy V=200 bigram bench",
    }
    if trained:
        meta_path = os.path.join(ART, "flagship_meta.json")
        meta = json.load(open(meta_path)) if \
            os.path.exists(meta_path) else {}
        from kaldi_tpu.recipes.bench_corpus import corpus_fingerprint
        fp = corpus_fingerprint(spec, lexicon, test_txt, test_wav,
                                lm_text)
        if meta.get("corpus_hash") != fp:
            out["degraded"] = True
            out["note"] += ("; corpus hash mismatch (model "
                            f"{meta.get('corpus_hash')} vs generator "
                            f"{fp}) — WER not comparable, retrain")
    if degraded_reason:
        out["degraded"] = True
        out["note"] += "; " + degraded_reason
    print(json.dumps(out))


def main():
    quick = "--quick" in sys.argv
    from kaldi_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    scale_ready = all(os.path.exists(os.path.join(ART, f)) for f in
                      ("flagship_ng_params.npz", "flagship_ng.tm",
                       "flagship_ng.tree", "flagship_ng_ivec.npz",
                       "flagship_ng_meta.json"))
    if "--legacy" in sys.argv or quick or not scale_ready:
        degraded_reason = None
        if not scale_ready and "--legacy" not in sys.argv \
                and not quick:
            print("# SCALE ARTIFACTS MISSING; falling back to the "
                  "legacy V=200 bench (run egs/bench_corpus/train.py "
                  "--scale)", file=sys.stderr)
            degraded_reason = ("scale artifacts (flagship_ng_*) "
                               "missing — this is the TOY fallback, "
                               "not the headline metric")
        main_legacy(quick, degraded_reason=degraded_reason)
    else:
        main_scale(quick)


def _probe_backend(timeout_s: int = 240, retries: int = 3) -> bool:
    """Backend-health gate: a wedged axon tunnel hangs jax init
    forever inside C code (observed 2026-08-17: 'UNAVAILABLE: TPU
    backend setup/compile error' after 30 min).  Probe in a
    subprocess with a hard timeout, retrying in case the service is
    mid-recovery, so the driver's bench run fails FAST and HONESTLY
    instead of eating its whole time budget."""
    import subprocess
    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                timeout=timeout_s, capture_output=True, text=True)
            if r.returncode == 0 and "ok" in r.stdout:
                return True
            print(f"# backend probe attempt {attempt}: rc="
                  f"{r.returncode} {r.stderr.strip()[-200:]}",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# backend probe attempt {attempt}: timed out "
                  f"after {timeout_s}s", file=sys.stderr)
        time.sleep(30)
    return False


if __name__ == "__main__":
    if "--no-probe" not in sys.argv and not _probe_backend():
        print(json.dumps({
            "metric": "full_pipeline_offline_decode_xRT_per_chip",
            "value": None, "unit": "x realtime", "vs_baseline": None,
            "wer": None,
            "error": "TPU backend unavailable (tunnel/backend init "
                     "wedged; see BASELINE.md round-3 outage note)",
        }))
        sys.exit(2)
    main()
