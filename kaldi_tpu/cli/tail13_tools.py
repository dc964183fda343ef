"""Round-3 CLI tail batch 11 (parity: src/nnet3bin nnet3-am-init.cc,
nnet3-am-adjust-priors.cc, nnet3-show-progress.cc; src/chainbin
nnet3-chain-compute-post.cc; src/rnnlmbin
rnnlm-get-word-embedding.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def nnet3_am_init(argv: List[str]) -> int:
    po = ParseOptions(
        "Combine a transition model and a raw nnet into an .mdl "
        "acoustic model (nnet3-am-init.cc).\n"
        "Usage: nnet3-am-init [options] <transition-model-or-mdl-in> "
        "<raw-nnet-in> <mdl-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.nnet3.mdl_io import read_raw_nnet3, write_nnet3_am
    tm = _read_tm(po.get_arg(1))
    graph = read_raw_nnet3(po.get_arg(2))
    write_nnet3_am(po.get_arg(3), tm, graph, binary=binary[0])
    log(f"combined transition model ({tm.num_pdfs} pdfs) with raw "
        f"nnet ({len(graph.components)} components)")
    return 0


def nnet3_am_adjust_priors(argv: List[str]) -> int:
    po = ParseOptions(
        "Set the .mdl's pdf priors from a counts/posterior-sum "
        "vector (nnet3-am-adjust-priors.cc; the priors divide the "
        "nnet output at decode time).\n"
        "Usage: nnet3-am-adjust-priors [options] <mdl-in> "
        "<counts-vector-in> <mdl-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    prior_floor = po.register_value("prior-floor", 1e-8,
                                    "Probability floor")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_am, write_nnet3_am
    tm, graph, info = read_nnet3_am(po.get_arg(1))
    counts = np.asarray(kaldi_io.read_kaldi_object(
        iof.read_vector, po.get_arg(2)), np.float64)
    if len(counts) != tm.num_pdfs:
        print(f"nnet3-am-adjust-priors: counts dim {len(counts)} vs "
              f"{tm.num_pdfs} pdfs", flush=True)
        return 1
    priors = np.maximum(counts / max(counts.sum(), 1e-20),
                        prior_floor[0])
    priors /= priors.sum()
    write_nnet3_am(po.get_arg(3), tm, graph,
                   left_context=info.get("left_context", 0),
                   right_context=info.get("right_context", 0),
                   priors=priors, binary=binary[0])
    log(f"set priors over {tm.num_pdfs} pdfs (entropy "
        f"{-float((priors * np.log(priors)).sum()):.3f} nats)")
    return 0


def nnet3_show_progress(argv: List[str]) -> int:
    po = ParseOptions(
        "Show per-component parameter-change norms between two raw "
        "models (nnet3-show-progress.cc; the training driver's "
        "per-iteration diagnostic).\n"
        "Usage: nnet3-show-progress <old-raw-nnet> <new-raw-nnet>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.mdl_io import read_raw_nnet3
    g1 = read_raw_nnet3(po.get_arg(1))
    g2 = read_raw_nnet3(po.get_arg(2))
    total_sq = 0.0
    for name, c1 in g1.components.items():
        if name not in g2.components:
            print(f"component {name}: only in old model")
            continue
        c2 = g2.components[name]
        sq = 0.0
        for key, v1 in c1.fields.items():
            v2 = c2.fields.get(key)
            if (isinstance(v1, np.ndarray) and v2 is not None
                    and np.issubdtype(np.asarray(v1).dtype,
                                      np.floating)):
                d = np.asarray(v2, np.float64) - np.asarray(
                    v1, np.float64)
                sq += float((d * d).sum())
        if sq > 0:
            print(f"component {name}: parameter-change "
                  f"{np.sqrt(sq):.6f}")
            total_sq += sq
    print(f"total parameter-change: {np.sqrt(total_sq):.6f}")
    return 0


def nnet3_chain_compute_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Per-frame pdf POSTERIORS from a chain model: the gradient "
        "of the denominator-graph log-likelihood with respect to the "
        "nnet output (nnet3-chain-compute-post.cc computes the same "
        "quantity with its forward-backward; autodiff of the FB IS "
        "that backward pass).\n"
        "Usage: nnet3-chain-compute-post [options] <model-dir-in> "
        "<den-fst-in> <feats-rspecifier> <post-matrix-wspecifier>")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    import json
    import os
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.chain.graphs import den_graph_from_fst_file
    from kaldi_tpu.chain.objective import _forward_loglike
    from kaldi_tpu.nnet3.xconfig import build_xconfig_model, \
        parse_xconfig
    from kaldi_tpu.parallel.checkpoint import restore_checkpoint
    base = os.path.abspath(po.get_arg(1))
    meta = json.load(open(os.path.join(base, "step_0.meta.json")))
    model = build_xconfig_model(meta["xconfig"], train=False)
    layers = parse_xconfig(meta["xconfig"])
    dims = {l.name: l.get_int("dim") for l in layers
            if l.layer_type == "input"}
    inputs0 = {name: jnp.zeros((1, 21, d)) for name, d in dims.items()}
    template = model.init(jax.random.PRNGKey(0), inputs0)
    variables, _, _ = restore_checkpoint(base, template)
    den = den_graph_from_fst_file(po.get_arg(2))
    g = den.graph
    args = [jnp.asarray(a) for a in
            (g.src, g.dst, g.pdf, g.log_prob, g.initial, g.final)]

    @jax.jit
    def post_of(out):
        return jax.grad(lambda o: _forward_loglike(
            o, *args, leaky=1e-5, num_states=g.num_states))(out)

    writer = TableWriter("matrix", po.get_arg(4))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(3)):
        out = model.apply(variables,
                          {"input": jnp.asarray(feats[None])})
        out = out["output"][0] if isinstance(out, dict) else out[0]
        p = np.asarray(post_of(jnp.asarray(out)))
        writer.write(key, p.astype(np.float32))
        n += 1
    writer.close()
    log(f"computed chain posteriors for {n} utterances")
    return 0 if n else 1


def rnnlm_get_word_embedding(argv: List[str]) -> int:
    po = ParseOptions(
        "Dump the word embedding matrix of a trained RNNLM "
        "(rnnlm-get-word-embedding.cc).\n"
        "Usage: rnnlm-get-word-embedding <rnnlm (.npz)> "
        "<embedding-matrix-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.rnnlm_tools import load_rnnlm
    model, params = load_rnnlm(po.get_arg(1))
    emb = np.asarray(params["embed"]["embedding"])
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, emb), po.get_arg(2),
        binary[0])
    log(f"wrote embedding {emb.shape}")
    return 0
