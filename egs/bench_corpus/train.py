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
    meta = {"wer": round(wer, 2), "num_pdfs": num_pdfs,
            "config": "small" if small else "flagship",
            "epochs": epochs}
    with open(os.path.join(out_dir, name.replace("params.npz",
                                                 "meta.json")),
              "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
