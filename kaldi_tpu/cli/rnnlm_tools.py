"""RNNLM CLI surface (parity: src/rnnlmbin rnnlm-train.cc,
rnnlm-sentence-probs.cc, rnnlm-compute-prob.cc,
rnnlm-get-sampling-lm.cc, src/latbin
lattice-lmrescore-kaldi-rnnlm.cc).

Model files are .npz archives holding the flattened flax param tree
plus the config (this framework's native format; the reference's
kaldi-nnet3 RNNLM raw format belongs to its own importer path)."""

from __future__ import annotations

import json
from typing import Dict, List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def save_rnnlm(path: str, cfg, params) -> None:
    import jax
    flat = {"/".join(str(k.key) for k in path_): np.asarray(v)
            for path_, v in jax.tree_util.tree_flatten_with_path(
                params)[0]}
    flat["__config__"] = np.frombuffer(
        json.dumps(cfg.__dict__).encode(), np.uint8)
    np.savez(path, **flat)


def load_rnnlm(path: str):
    from kaldi_tpu.rnnlm.model import RnnLm, RnnLmConfig
    data = np.load(path if path.endswith(".npz") else path,
                   allow_pickle=False)
    cfg = RnnLmConfig(**json.loads(
        bytes(data["__config__"].tolist()).decode()))
    params: Dict = {}
    for key in data.files:
        if key == "__config__":
            continue
        d = params
        parts = key.split("/")
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = data[key]
    return RnnLm(cfg), params


def _read_sentences(rspecifier: str):
    return [(k, [int(w) for w in v])
            for k, v in SequentialTableReader("int-vector", rspecifier)]


def rnnlm_train(argv: List[str]) -> int:
    po = ParseOptions(
        "Train an LSTM language model on integer sentences "
        "(word ids >= 3; 0=pad, 1=<s>, 2=</s>).\n"
        "Usage: rnnlm-train [options] <sentences-rspecifier> "
        "<model-out (.npz)>")
    vocab_size = po.register_value("vocab-size", 0,
                                   "Vocabulary size (0 = max id + 1)")
    embed_dim = po.register_value("embedding-dim", 64, "Embedding dim")
    hidden_dim = po.register_value("hidden-dim", 128, "LSTM hidden dim")
    num_layers = po.register_value("num-layers", 1, "LSTM layers")
    num_epochs = po.register_value("num-epochs", 5, "Training epochs")
    learning_rate = po.register_value("learning-rate", 1e-3,
                                      "Adam learning rate")
    seed = po.register_value("srand", 0, "Random seed")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.rnnlm.model import RnnLmConfig, train_rnnlm
    sents = [s for _k, s in _read_sentences(po.get_arg(1))]
    if not sents:
        warn("no training sentences")
        return 1
    V = vocab_size[0] or (max(max(s, default=0) for s in sents) + 1)
    cfg = RnnLmConfig(vocab_size=max(V, 3), embed_dim=embed_dim[0],
                      hidden_dim=hidden_dim[0],
                      num_layers=num_layers[0])
    model, params = train_rnnlm(cfg, sents, num_epochs=num_epochs[0],
                                learning_rate=learning_rate[0],
                                seed=seed[0])
    save_rnnlm(po.get_arg(2), cfg, params)
    log(f"trained RNNLM (V={cfg.vocab_size}) on {len(sents)} "
        "sentences")
    return 0


def rnnlm_sentence_probs(argv: List[str]) -> int:
    po = ParseOptions(
        "Per-sentence RNNLM log-probabilities (natural log), one "
        "'<key> <logprob>' line each.\n"
        "Usage: rnnlm-sentence-probs [options] <model (.npz)> "
        "<sentences-rspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.rnnlm.model import sentence_logprob
    model, params = load_rnnlm(po.get_arg(1))
    n = 0
    for key, sent in _read_sentences(po.get_arg(2)):
        ll = sentence_logprob(model, params, sent)
        print(f"{key} {ll:.4f}")
        n += 1
    return 0 if n else 1


def rnnlm_compute_prob(argv: List[str]) -> int:
    po = ParseOptions(
        "Aggregate RNNLM log-probability / perplexity over a corpus "
        "(diagnostic, rnnlm-compute-prob.cc).\n"
        "Usage: rnnlm-compute-prob [options] <model (.npz)> "
        "<sentences-rspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.rnnlm.model import sentence_logprob
    model, params = load_rnnlm(po.get_arg(1))
    tot = words = 0.0
    n = 0
    for _key, sent in _read_sentences(po.get_arg(2)):
        tot += sentence_logprob(model, params, sent)
        words += len(sent) + 1          # + </s>
        n += 1
    avg = tot / max(words, 1.0)
    print(f"log-prob per word: {avg:.4f} over {words:.0f} words "
          f"({n} sentences); perplexity {np.exp(-avg):.2f}")
    return 0 if n else 1


def rnnlm_get_sampling_lm(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate the backoff sampling LM used for sampled-softmax "
        "RNNLM training (rnnlm-get-sampling-lm.cc).\n"
        "Usage: rnnlm-get-sampling-lm [options] "
        "<sentences-rspecifier> <sampling-lm-out>")
    vocab_size = po.register_value("vocab-size", 0,
                                   "Vocabulary size (0 = max id + 1)")
    ngram_order = po.register_value(
        "ngram-order", 3, "Proposal LM order (sampling-lm-estimate.h; "
        "arbitrary order, higher orders pruned against their backoff)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.rnnlm.sampling import SamplingLm, SamplingLmOptions
    sents = [s for _k, s in _read_sentences(po.get_arg(1))]
    if not sents:
        return 1
    V = vocab_size[0] or (max(max(s, default=0) for s in sents) + 1)
    lm = SamplingLm(SamplingLmOptions(vocab_size=max(V, 3),
                                      ngram_order=ngram_order[0]))
    for s in sents:
        lm.process_line(1.0, s)
    lm.estimate()
    # persist the estimated distribution: unigram array + sparse
    # corrections packed as (hist, word, prob) rows + per-history
    # unigram weights
    # histories are tuples of up to order-1 words (left-padded -1)
    H = max(lm.opts.ngram_order - 1, 1)

    def hrow(h):
        return [-1] * (H - len(h)) + list(h)
    rows = [hrow(h) + [w, p] for h, kept in lm.sparse.items()
            for w, p in kept]
    uw = [hrow(h) + [w] for h, w in lm.backoff_weight.items()]
    np.savez(po.get_arg(2), unigram=lm.unigram,
             order=lm.opts.ngram_order,
             sparse=np.asarray(rows, np.float64).reshape(
                 len(rows), H + 2),
             uweight=np.asarray(uw, np.float64).reshape(
                 len(uw), H + 1))
    log(f"estimated sampling LM over V={V}: {len(lm.sparse)} sparse "
        "histories")
    return 0


def lattice_lmrescore_kaldi_rnnlm(argv: List[str]) -> int:
    po = ParseOptions(
        "Rescore lattices with a trained RNNLM (on-demand "
        "deterministic composition; use a negative --lm-scale pass "
        "with lattice-lmrescore first to remove the old LM).\n"
        "Usage: lattice-lmrescore-kaldi-rnnlm [options] <model (.npz)> "
        "<lattice-rspecifier> <lattice-wspecifier>")
    lm_scale = po.register_value("lm-scale", 1.0,
                                 "Scale on the RNNLM costs")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.lm.rescore import lattice_lmrescore
    from kaldi_tpu.rnnlm.rescore import RnnLmDeterministic
    model, params = load_rnnlm(po.get_arg(1))
    V = model.cfg.vocab_size
    det = RnnLmDeterministic(model, params,
                             {w: w for w in range(V)})
    writer = TableWriter(LatticeHolder(), po.get_arg(3))
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(2)):
        writer.write(key, lattice_lmrescore(lat, det,
                                            lm_scale=lm_scale[0]))
        n += 1
    writer.close()
    log(f"rnnlm-rescored {n} lattices")
    return 0 if n else 1
