"""Train the flagship-shape chain TDNN-F on the bench corpus (run on
the real chip) and save params for bench.py.

The saved artifact egs/bench_corpus/flagship_params.npz is what lets
bench.py report xRT *at a pinned WER* without re-training per run:
the corpus, the graph, and the chain system are all deterministic in
BenchCorpusSpec; only the trained weights need to persist.

Usage: python egs/bench_corpus/train.py [--small] [--epochs N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main_scale():
    """--scale: the round-4 vocabulary-scale system — V=20k corpus,
    TRIPHONE chain tree (word-internal windows), trained flagship (or
    --scale-small calibration model), decoded through the n-gram
    device pipeline (estimated trigram, NgramLexDecoder) for WER."""
    from kaldi_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from kaldi_tpu.nnet3.models import ChainTdnnf, ChainTdnnfConfig
    from kaldi_tpu.recipes.bench_corpus import (bench_scale_spec,
                                                build_decode_graph_ng,
                                                corpus_fingerprint,
                                                mfcc_options,
                                                save_params,
                                                train_system, wer_of)
    from kaldi_tpu.recipes.chain import ChainTrainOptions
    from kaldi_tpu.chain.objective import ChainTrainingOptions

    small = "--scale-small" in sys.argv
    epochs = 4 if small else 16
    ivector_dim = 32
    over = {}
    for i, a in enumerate(sys.argv):
        if a == "--epochs":
            epochs = int(sys.argv[i + 1])
        elif a == "--noise":
            over["noise"] = float(sys.argv[i + 1])
        elif a == "--gap":
            over["f2_gap"] = float(sys.argv[i + 1])
        elif a == "--ivector-dim":
            ivector_dim = int(sys.argv[i + 1])
        elif a == "--speakers":
            over["num_speakers"] = int(sys.argv[i + 1])
        elif a == "--vocab":
            over["vocab"] = int(sys.argv[i + 1])
        elif a == "--warp":
            lo, hi = sys.argv[i + 1].split(",")
            over["warp_lo"], over["warp_hi"] = float(lo), float(hi)
    spec = bench_scale_spec(**over)
    if small:
        def mk_cfg(num_pdfs):
            return ChainTdnnfConfig(
                feat_dim=40, ivector_dim=ivector_dim,
                num_pdfs=num_pdfs, hidden_dim=256,
                bottleneck_dim=64, prefinal_dim=128, num_layers=6,
                subsample_layer=3, frame_subsampling_factor=3)
    else:
        def mk_cfg(num_pdfs):
            return ChainTdnnfConfig(
                feat_dim=40, ivector_dim=ivector_dim,
                num_pdfs=num_pdfs, hidden_dim=1536,
                bottleneck_dim=160, prefinal_dim=256, num_layers=17,
                subsample_layer=8, frame_subsampling_factor=3)
    opts = ChainTrainOptions(
        num_epochs=epochs, learning_rate=7e-4,
        final_learning_rate=1e-4, minibatch_size=32, chunk_width=150,
        left_tolerance=5, right_tolerance=5,
        chain=ChainTrainingOptions(l2_regularize=5e-5,
                                   leaky_hmm_coefficient=0.1,
                                   xent_regularize=0.1))
    t0 = time.time()
    sysd = train_system(spec, cfg=mk_cfg, chain_opts=opts, num_ceps=40,
                        ctx=True, max_leaves=2000, min_gain=30.0,
                        ivector_dim=ivector_dim)
    num_pdfs = sysd["chain_tm"].num_pdfs
    print(f"# training took {time.time() - t0:.0f}s "
          f"(num_pdfs={num_pdfs})", file=sys.stderr)
    out_dir = os.path.dirname(os.path.abspath(__file__))
    name = "scale_small_params.npz" if small else \
        "flagship_ng_params.npz"
    save_params(os.path.join(out_dir, name), sysd["variables"])
    if sysd.get("ivector_extractor") is not None:
        from kaldi_tpu.recipes.bench_corpus import \
            save_ivector_extractor
        save_ivector_extractor(
            os.path.join(out_dir, name.replace("params", "ivec")),
            sysd["ivector_extractor"])
    # the ctx tree/transition-model are DATA-dependent (built from
    # alignments): persist them so bench.py can rebuild the decode
    # graph without retraining (native wire format, golden-tested
    # against reference bytes in tests/test_ref_golden.py)
    from kaldi_tpu.util import kaldi_io
    stem = name.replace("_params.npz", "")
    kaldi_io.write_kaldi_object(
        sysd["chain_tm"].write, os.path.join(out_dir, stem + ".tm"))
    kaldi_io.write_kaldi_object(
        sysd["chain_tree"].write,
        os.path.join(out_dir, stem + ".tree"))

    t0 = time.time()
    graph = build_decode_graph_ng(sysd["lexicon"], sysd["lm_text"],
                                  sysd["chain_tm"], sysd["chain_tree"],
                                  lang=sysd["lang"], prune_bi=2,
                                  prune_tri=3)
    print(f"# graph: {graph.num_states} states built in "
          f"{time.time() - t0:.0f}s", file=sys.stderr)
    from kaldi_tpu.decoder.batched_pipeline2 import \
        BatchedOfflinePipeline2
    from kaldi_tpu.decoder.lexchain_ng import NgramLexDecoder
    from kaldi_tpu.feat.frontend import OfflineFeature
    eval_model = ChainTdnnf(sysd["model"].cfg, train=False)
    bex = None
    if sysd.get("ivector_extractor") is not None:
        from kaldi_tpu.ivector.batched import BatchedIvectorExtractor
        bex = BatchedIvectorExtractor(sysd["ivector_extractor"])
    pipe = BatchedOfflinePipeline2(
        eval_model, sysd["variables"]["params"],
        sysd["variables"].get("batch_stats", {}),
        NgramLexDecoder(graph), OfflineFeature(mfcc_options(spec)),
        acoustic_scale=1.0, sample_rate=spec.fs,
        search_kwargs=dict(prune_k=128, prune_beam=16.0,
                           exact_topk=False),
        ivector_extractor=bex)
    utts = sorted(sysd["test_wav"])
    waves = [sysd["test_wav"][u] for u in utts]
    out = pipe.decode_batch(waves)
    hyps = {u: ([] if o is None else [graph.words[w] for w in o[0]])
            for u, o in zip(utts, out)}
    wer = wer_of(hyps, sysd["test_txt"])
    print(f"# device-pipeline WER (V={spec.vocab}, "
          f"{graph.num_states} states): {wer:.2f}%", file=sys.stderr)
    meta = {"wer": round(wer, 2), "num_pdfs": num_pdfs,
            "config": "scale-small" if small else "flagship-ng",
            "epochs": epochs, "vocab": spec.vocab,
            "noise": spec.noise, "f2_gap": spec.f2_gap,
            "states": graph.num_states,
            # pins the corpus generator version this model was trained
            # on; bench.py refuses to report a silently-drifted WER
            "corpus_hash": corpus_fingerprint(
                spec, sysd["lexicon"], sysd["test_txt"],
                sysd["test_wav"], sysd["lm_text"])}
    with open(os.path.join(out_dir, name.replace("params.npz",
                                                 "meta.json")),
              "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


def main():
    from kaldi_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from kaldi_tpu.nnet3.models import ChainTdnnfConfig
    from kaldi_tpu.recipes.bench_corpus import (BenchCorpusSpec,
                                                build_decode_graph,
                                                save_params,
                                                train_system)
    from kaldi_tpu.recipes.chain import ChainTrainOptions

    small = "--small" in sys.argv
    epochs = 8
    noise, gap = None, None
    for i, a in enumerate(sys.argv):
        if a == "--epochs":
            epochs = int(sys.argv[i + 1])
        elif a == "--noise":
            noise = float(sys.argv[i + 1])
        elif a == "--gap":
            gap = float(sys.argv[i + 1])

    spec = BenchCorpusSpec()
    if noise is not None:
        spec.noise = noise
    if gap is not None:
        spec.f2_gap = gap
    num_pdfs = 2 * (spec.num_phones + 1)
    if small:
        cfg = ChainTdnnfConfig(feat_dim=40, num_pdfs=num_pdfs,
                               hidden_dim=256, bottleneck_dim=64,
                               prefinal_dim=128, num_layers=6,
                               subsample_layer=3,
                               frame_subsampling_factor=3)
    else:
        # flagship LibriSpeech TDNN-F trunk (run_tdnn_1d.sh shape:
        # 17 layers, 1536 hidden, 160 bottleneck) with this corpus's
        # pdf count on the output
        cfg = ChainTdnnfConfig(feat_dim=40, num_pdfs=num_pdfs,
                               hidden_dim=1536, bottleneck_dim=160,
                               prefinal_dim=256, num_layers=17,
                               subsample_layer=8,
                               frame_subsampling_factor=3)
    from kaldi_tpu.chain.objective import ChainTrainingOptions
    opts = ChainTrainOptions(
        num_epochs=epochs, learning_rate=7e-4,
        final_learning_rate=1e-4, minibatch_size=32, chunk_width=150,
        left_tolerance=5, right_tolerance=5,
        chain=ChainTrainingOptions(l2_regularize=5e-5,
                                   leaky_hmm_coefficient=0.1,
                                   xent_regularize=0.1))
    t0 = time.time()
    sysd = train_system(spec, cfg=cfg, chain_opts=opts, num_ceps=40)
    print(f"# training took {time.time() - t0:.0f}s", file=sys.stderr)

    out_dir = os.path.dirname(os.path.abspath(__file__))
    name = "small_params.npz" if small else "flagship_params.npz"
    save_params(os.path.join(out_dir, name), sysd["variables"])

    # quick WER check through the device pipeline
    from kaldi_tpu.decoder.batched_pipeline2 import BatchedOfflinePipeline2
    from kaldi_tpu.decoder.lexchain import LexChainDecoder
    from kaldi_tpu.feat.frontend import OfflineFeature
    from kaldi_tpu.nnet3.models import ChainTdnnf
    from kaldi_tpu.recipes.bench_corpus import mfcc_options, wer_of
    graph = build_decode_graph(sysd["lexicon"], sysd["lm_text"],
                               sysd["chain_tm"], sysd["chain_tree"],
                               lang=sysd["lang"])
    eval_model = ChainTdnnf(cfg, train=False)
    pipe = BatchedOfflinePipeline2(
        eval_model, sysd["variables"]["params"],
        sysd["variables"].get("batch_stats", {}),
        LexChainDecoder(graph), OfflineFeature(mfcc_options(spec)),
        acoustic_scale=1.0, sample_rate=spec.fs)
    utts = sorted(sysd["test_wav"])
    waves = [sysd["test_wav"][u] for u in utts]
    out = pipe.decode_batch(waves)
    hyps = {u: ([] if o is None else [graph.words[w] for w in o[0]])
            for u, o in zip(utts, out)}
    wer = wer_of(hyps, sysd["test_txt"])
    print(f"# device-pipeline WER: {wer:.2f}%", file=sys.stderr)
    from kaldi_tpu.recipes.bench_corpus import corpus_fingerprint
    meta = {"wer": round(wer, 2), "num_pdfs": num_pdfs,
            "config": "small" if small else "flagship",
            "epochs": epochs,
            "corpus_hash": corpus_fingerprint(
                spec, sysd["lexicon"], sysd["test_txt"],
                sysd["test_wav"], sysd["lm_text"])}
    with open(os.path.join(out_dir, name.replace("params.npz",
                                                 "meta.json")),
              "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    if "--scale" in sys.argv or "--scale-small" in sys.argv:
        main_scale()
    else:
        main()
