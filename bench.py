"""Benchmark: FULL-PIPELINE batched offline decode on one chip, at a
pinned WER — wav -> fused MFCC frontend -> TRAINED chain TDNN-F
(flagship 17x1536 shape, bf16) -> exact batched device Viterbi over a
graph BUILT FROM DATA (real lexicon + estimated backoff bigram +
trained-tree pdf-ids, decoder/lexchain.py) -> words -> WER.

This mirrors the reference's metric of record, the `RealTimeX =
total_audio/total_time` line of batched-wav-nnet3-cuda2
(src/cudadecoderbin/batched-wav-nnet3-cuda2.cc:246-249; ~3524x RT on a
V100 per arXiv:1910.10032) — measured, like the reference, while
producing real transcripts whose WER is reported alongside.  Prints
ONE JSON line {"metric", "value", "unit", "vs_baseline", "wer"}.

Configuration: the deterministic bench corpus
(kaldi_tpu/recipes/bench_corpus.py): 128 test utterances (~4.5 s,
16 kHz int16), V=200 vocabulary, optional-silence lexicon, backoff
bigram estimated from corpus text, chain system with real
transition-ids; AM = flagship LibriSpeech TDNN-F trunk (17x1536,
bottleneck 160) trained by egs/bench_corpus/train.py (weights in
egs/bench_corpus/flagship_params.npz).  If the weights are absent the
bench falls back to random weights and reports "wer": null.

--scale adds a stderr throughput line on a V=20k-vocabulary graph
(sparse synthetic ARPA) — the vocabulary-scale demonstration.

Timing: wall-clock host waves -> host word sequences; the traceback
transfer forces a device sync (axon block_until_ready does not
reliably synchronize, BASELINE.md).

Usage: python bench.py [--quick] [--scale] [--with-lattices]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def build_scale_graph(vocab=20000, seed=0):
    """V=20k sparse-LM graph: Zipf-ish synthetic backoff bigram with
    ~12 explicit successors per context, random 2-5 phone lexicon."""
    from kaldi_tpu.decoder.lexchain import LexChainGraph
    from kaldi_tpu.lm.bigram import BigramBackoffLm
    rng = np.random.default_rng(seed)
    V = vocab
    uni = (1.0 + 2.5 * np.log1p(np.arange(V) * 0.01)).astype(np.float32)
    n_hot = 12
    src = np.repeat(np.arange(V + 1), n_hot)
    dst = rng.integers(0, V, size=(V + 1) * n_hot)
    order = np.argsort(dst, kind="stable")
    lm = BigramBackoffLm(
        words=[f"W{i:05d}" for i in range(V)],
        uni=uni, bo=rng.uniform(0.3, 1.2, V + 1).astype(np.float32),
        expl_src=src[order].astype(np.int32),
        expl_dst=dst[order].astype(np.int32),
        expl_cost=rng.uniform(1.0, 4.0, len(src)).astype(np.float32),
        eos=rng.uniform(1.0, 4.0, V + 1).astype(np.float32))
    prons = [rng.integers(1, 41, rng.integers(2, 6)).astype(np.int32)
             for _ in range(V)]
    return LexChainGraph.build(prons, lm, num_pdfs=3456)


def main():
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from kaldi_tpu.decoder.batched_pipeline2 import (BatchedOfflinePipeline2,
                                                     PipelineStats)
    from kaldi_tpu.decoder.lexchain import LexChainDecoder
    from kaldi_tpu.feat.frontend import OfflineFeature
    from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
    from kaldi_tpu.recipes.bench_corpus import (BenchCorpusSpec,
                                                build_decode_graph,
                                                chain_tm_tree_for,
                                                load_params, make_corpus,
                                                mfcc_options, wer_of)

    if quick:
        spec = BenchCorpusSpec(vocab=24, num_phone_groups=4,
                               phones_per_group=2, words_per_utt=5,
                               num_train=2, num_test=6, num_lm_sents=80)
        cfg_dims = dict(hidden_dim=128, bottleneck_dim=32,
                        prefinal_dim=64, num_layers=4, subsample_layer=2)
    else:
        spec = BenchCorpusSpec()
        cfg_dims = dict(hidden_dim=1536, bottleneck_dim=160,
                        prefinal_dim=256, num_layers=17,
                        subsample_layer=8)

    t0 = time.time()
    lexicon, _tr, _trw, test_txt, test_wav, lm_text = make_corpus(spec)
    lang, chain_tm, chain_tree = chain_tm_tree_for(lexicon)
    graph = build_decode_graph(lexicon, lm_text, chain_tm, chain_tree,
                               lang=lang)
    decoder = LexChainDecoder(graph)
    print(f"# corpus+graph: V={graph.V} rows={graph.n_true} "
          f"states={graph.num_states} explicit={graph.lm.num_explicit} "
          f"built in {time.time() - t0:.1f}s", file=sys.stderr)

    cfg = ChainTdnnfConfig(feat_dim=40, num_pdfs=chain_tm.num_pdfs,
                           frame_subsampling_factor=3, **cfg_dims)
    model = ChainTdnnf(cfg, train=False)
    params_path = os.path.join(REPO, "egs/bench_corpus",
                               "flagship_params.npz")
    trained = (not quick) and os.path.exists(params_path)
    if trained:
        variables = load_params(params_path)
        params, batch_stats = variables["params"], variables["batch_stats"]
        print(f"# loaded trained params from {params_path}",
              file=sys.stderr)
    else:
        feats0 = jnp.zeros((2, 50, cfg.feat_dim), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), feats0)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if not quick:
            print("# WARNING: no trained params found; WER will be null "
                  "(run egs/bench_corpus/train.py)", file=sys.stderr)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    fe = OfflineFeature(mfcc_options(spec, num_ceps=40))
    pipe = BatchedOfflinePipeline2(model, params, batch_stats, decoder,
                                   fe, acoustic_scale=1.0,
                                   sample_rate=spec.fs)

    utts = sorted(test_wav)
    # wire format: 8-bit mu-law by default (the tunnel-attached chip's
    # ~20 MB/s ingest otherwise caps xRT regardless of compute;
    # BASELINE.md); --wire=int16 for the PCM comparison
    wire = "mulaw"
    for a in sys.argv:
        if a.startswith("--wire="):
            wire = a.split("=", 1)[1]
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

    # --waves=N splits the batch into N ingest waves whose H2D is all
    # launched up front (equivalence pinned by tests/
    # test_bench_corpus_e2e.py).  Measured on this chip: W=2 LOSES
    # (600x vs 866x) — search at B=64 twice costs more than the
    # overlapped transfer saves — so the default is 1.
    W = 1
    for a in sys.argv:
        if a.startswith("--waves="):
            W = int(a.split("=", 1)[1])
    t0 = time.time()
    out = pipe.decode_batch(waves, num_waves=W)    # compile + warm
    print(f"# compile+warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    xrts = []
    for it in range(1 if quick else 3):
        stats = PipelineStats()
        out = pipe.decode_batch(waves, stats=stats, num_waves=W)
        n_ok = sum(o is not None for o in out)
        xrts.append(stats.xrt)
        print(f"# iter{it}: {stats.total_audio_s:.0f}s audio in "
              f"{stats.wall_s:.2f}s wall (feat {stats.feat_s:.2f}s, am "
              f"{stats.am_s:.2f}s, search {stats.search_s:.2f}s), "
              f"{n_ok}/{len(waves)} lanes decoded", file=sys.stderr)
    xrt = sorted(xrts)[len(xrts) // 2]

    hyps = {u: ([] if o is None else [graph.words[w] for w in o[0]])
            for u, o in zip(utts, out)}
    wer = wer_of(hyps, test_txt)
    print(f"# WER: {wer:.2f}% over "
          f"{sum(len(r) for r in test_txt.values())} words "
          f"({'trained' if trained else 'RANDOM'} model)",
          file=sys.stderr)

    if "--with-lattices" in sys.argv:
        t0 = time.time()
        pipe.decode_batch(waves, generate_lattices=True)
        print(f"# lattice-mode compile+warmup: {time.time() - t0:.1f}s",
              file=sys.stderr)
        lstats = PipelineStats()
        lout = pipe.decode_batch(waves, stats=lstats,
                                 generate_lattices=True)
        n_lat = sum(o is not None and o[2] is not None for o in lout)
        print(f"# lattice pipeline: {lstats.total_audio_s:.0f}s audio "
              f"in {lstats.wall_s:.2f}s = {lstats.xrt:.1f}x RT, "
              f"{n_lat}/{len(waves)} lattices", file=sys.stderr)

    if "--scale" in sys.argv:
        # vocabulary-scale demo: V=20k sparse-backoff graph, decoded
        # with the beam-pruned active-context expansion on
        # DEVICE-RESIDENT loglikes (feeding host arrays would measure
        # the ~20 MB/s tunnel H2D, not the search — BASELINE.md)
        from functools import partial
        t0 = time.time()
        gs = build_scale_graph(vocab=20000)
        ds = LexChainDecoder(gs)
        print(f"# scale graph: V={gs.V} states={gs.num_states} "
              f"explicit={gs.lm.num_explicit} built in "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
        B_s, T_s = 128, 500

        @partial(jax.jit, static_argnums=1)
        def _mk_ll(key, b):
            return jax.random.normal(key, (b, T_s, 3456),
                                     jnp.float32) * 2.0

        ll = _mk_ll(jax.random.PRNGKey(0), B_s)
        float(ll[0, 0, 0])                          # materialize
        audio_s = B_s * T_s * 0.03                  # 30ms per sub-frame
        for tag, kw in (("pruned K=128",
                         dict(prune_k=128, exact_topk=True)),
                        ("exact", {})):
            ds.decode_batch(ll, **kw)               # compile + warm
            t0 = time.time()
            out_s = ds.decode_batch(ll, **kw)
            dt = time.time() - t0
            print(f"# scale decode [{tag}]: V=20k, {audio_s:.0f}s "
                  f"audio in {dt:.2f}s = {audio_s / dt:.1f}x RT "
                  f"(search only, device-resident loglikes), "
                  f"{sum(o is not None for o in out_s)}/{B_s} lanes",
                  file=sys.stderr)

    baseline = 3524.0  # V100 full-pipeline RealTimeX, arXiv:1910.10032
    print(json.dumps({
        "metric": "full_pipeline_offline_decode_xRT_per_chip",
        "value": round(xrt, 1),
        "unit": "x realtime",
        "vs_baseline": round(xrt / baseline, 3),
        "wer": None if not trained else round(wer, 2),
    }))


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
