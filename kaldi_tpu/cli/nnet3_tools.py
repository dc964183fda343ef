"""nnet3bin/chainbin-style CLIs: nnet3-latgen-faster, tree tools
(acc-tree-stats, sum-tree-stats, cluster-phones, build-tree),
nnet3-chain egs tools."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def nnet3_latgen_faster(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate lattices using neural net model.\n"
        "Usage: nnet3-latgen-faster [options] <trans-model> <nnet-dir> "
        "<fst-in> <features-rspecifier> <lattice-wspecifier> "
        "[<words-wspecifier>]")
    from kaldi_tpu.decoder.lattice_decoder import (
        LatticeFasterDecoder, LatticeFasterDecoderOptions)
    from kaldi_tpu.lat.functions import determinize_lattice, lattice_best_path
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value("acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods (chain models typically 1.0)")
    po.read(argv)
    if po.num_args() < 5:
        po.print_usage()
        return 1
    import json
    import os

    import jax
    import jax.numpy as jnp

    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.hmm import TransitionModel
    from kaldi_tpu.nnet3.xconfig import build_xconfig_model, parse_xconfig
    from kaldi_tpu.parallel.checkpoint import restore_checkpoint
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        binary = iof.init_input_stream(f)
        tm = TransitionModel.read(f, binary)
    base = os.path.abspath(po.get_arg(2))
    meta = json.load(open(os.path.join(base, "step_0.meta.json")))
    text = meta["xconfig"]
    model = build_xconfig_model(text, train=False)
    layers = parse_xconfig(text)
    dims = {l.name: l.get_int("dim") for l in layers
            if l.layer_type == "input"}
    inputs0 = {name: jnp.zeros((1, 21, d)) for name, d in dims.items()}
    template = model.init(jax.random.PRNGKey(0), inputs0)
    variables, _, _ = restore_checkpoint(base, template)
    hclg = read_fst_file(po.get_arg(3))
    lat_writer = TableWriter(LatticeHolder(), po.get_arg(5))
    word_writer = (TableWriter("int-vector", po.get_arg(6))
                   if po.num_args() >= 6 else None)
    dec = LatticeFasterDecoder(hclg, dopts)
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(4)):
        out = model.apply(variables, {"input": jnp.asarray(feats[None])})
        loglikes = np.asarray(out["output"][0])
        lat = dec.decode(loglikes, tm.id2pdf_id, acoustic_scale[0])
        if lat is None:
            err += 1
            continue
        out_lat = determinize_lattice(lat) if dopts.determinize_lattice \
            else lat
        lat_writer.write(key, out_lat)
        if word_writer:
            _, words, _ = lattice_best_path(lat)
            word_writer.write(key, words)
        n += 1
    lat_writer.close()
    if word_writer:
        word_writer.close()
    log(f"decoded {n} utterances with nnet3 model ({err} failed)")
    return 0 if n else 1


def acc_tree_stats(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate statistics for phonetic-context tree building.\n"
        "Usage: acc-tree-stats [options] <model-in> <features-rspecifier> "
        "<alignments-rspecifier> <tree-accs-out>")
    context_width = po.register_value("context-width", 3, "Context window size [must match context-width]")
    central_position = po.register_value("central-position", 1, "Central position in context window [must match central-position]")
    ci_phones = po.register_value("ci-phones", "", "Colon-separated list of integer indices of context-independent phones")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.tree.build_tree import accumulate_tree_stats
    from kaldi_tpu.tree.clusterable import write_build_tree_stats
    tm, _ = read_am_gmm(po.get_arg(1))
    ci = [int(p) for p in ci_phones[0].split(":") if p]
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(3))
    stats = {}
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in ali_reader:
            continue
        accumulate_tree_stats(tm, tm.topo, feats, ali_reader[key],
                              context_width[0], central_position[0],
                              stats, ci_phones=ci)
        n += 1
    # reference BuildTreeStats wire format (build-tree-utils.cc:29),
    # binary with the \0B marker — interoperable with the reference's
    # {acc,sum}-tree-stats and safe to read (no pickle).
    with kaldi_io.output_stream(po.get_arg(4)) as f:
        iof.init_output_stream(f, True)
        write_build_tree_stats(f, True, stats)
    log(f"accumulated tree stats from {n} utterances ({len(stats)} events)")
    return 0


def _read_tree_stats(rxfilename: str):
    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.tree.clusterable import read_build_tree_stats
    with kaldi_io.input_stream(rxfilename) as f:
        import io as _io
        if not hasattr(f, "peek"):
            f = _io.BufferedReader(f)
        binary = iof.init_input_stream(f)
        return read_build_tree_stats(f, binary)


def sum_tree_stats(argv: List[str]) -> int:
    po = ParseOptions("Sum statistics for phonetic-context tree building.\n"
                      "Usage: sum-tree-stats [options] <tree-accs-out> <tree-accs-in1> <tree-accs-in2> ...")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.base import io_funcs as iof
    from kaldi_tpu.tree.clusterable import write_build_tree_stats
    total = None
    for i in range(2, po.num_args() + 1):
        stats = _read_tree_stats(po.get_arg(i))
        if total is None:
            total = stats
        else:
            for k, v in stats.items():
                if k in total:
                    total[k] = total[k].add(v)
                else:
                    total[k] = v
    with kaldi_io.output_stream(po.get_arg(1)) as f:
        iof.init_output_stream(f, True)
        write_build_tree_stats(f, True, total or {})
    return 0


def cluster_phones_cli(argv: List[str]) -> int:
    po = ParseOptions(
        "Cluster phones (or sets of phones) into sets for various purposes\n"
        "Usage: cluster-phones [options] <tree-stats-in> <phone-sets-in> <clustered-phones-out>")
    central_position = po.register_value("central-position", 1, "Central position in context window")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.tree.build_tree import cluster_phones
    stats = _read_tree_stats(po.get_arg(1))
    phones = []
    with open(po.get_arg(2)) as f:
        for line in f:
            phones.extend(int(t) for t in line.split())
    questions = cluster_phones(stats, phones, central_position[0])
    with open(po.get_arg(3), "w") as f:
        for q in questions:
            f.write(" ".join(str(p) for p in q) + "\n")
    log(f"wrote {len(questions)} questions")
    return 0


def build_tree_cli(argv: List[str]) -> int:
    po = ParseOptions(
        "Train decision tree\n"
        "Usage: build-tree [options] <tree-stats-in> <roots-file> "
        "<questions-file> <topo-file> <tree-out>")
    max_leaves = po.register_value("max-leaves", 1000, "Maximum number of leaves to be used in tree-building")
    context_width = po.register_value("context-width", 3, "Context window size")
    central_position = po.register_value("central-position", 1, "Central position in context window")
    thresh = po.register_value("thresh", 300.0, "Log-likelihood change threshold for tree-building")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.hmm import HmmTopology
    from kaldi_tpu.tree.build_tree import BuildTreeOptions, build_tree
    from kaldi_tpu.tree.event_map import PDF_CLASS_KEY
    stats = _read_tree_stats(po.get_arg(1))
    roots = []
    with open(po.get_arg(2)) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            shared = parts[0] == "shared"
            split = parts[1] == "split"
            phones = [int(t) for t in parts[2:]]
            roots.append((phones, shared, split))
    phone_qs = []
    with open(po.get_arg(3)) as f:
        for line in f:
            if line.strip():
                phone_qs.append([int(t) for t in line.split()])
    topo = kaldi_io.read_kaldi_object(HmmTopology.read, po.get_arg(4))
    max_pc = max(topo.num_pdf_classes(p) for r in roots for p in r[0])
    questions = {k: phone_qs for k in range(context_width[0])}
    questions[PDF_CLASS_KEY] = [list(range(k + 1)) for k in range(max_pc)]
    tree = build_tree(stats, questions, roots, context_width[0],
                      central_position[0],
                      BuildTreeOptions(max_leaves=max_leaves[0],
                                       min_gain=thresh[0]), topo=topo)
    kaldi_io.write_kaldi_object(tree.write, po.get_arg(5))
    log(f"built tree with {tree.num_pdfs} leaves")
    return 0
