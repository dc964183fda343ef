"""nnet3 training/egs tail (parity: src/nnet3bin nnet3-train.cc,
nnet3-combine.cc, nnet3-am-train-transitions.cc,
nnet3-acc-lda-stats.cc, nnet3-get-egs-simple.cc,
nnet3-get-egs-dense-targets.cc, nnet3-discriminative-{merge,shuffle,
subset}-egs.cc, nnet3-discriminative-compute-objf.cc,
nnet3-discriminative-compute-from-egs.cc; src/chainbin
nnet3-chain-acc-lda-stats.cc, nnet3-chain-add-post-to-egs.cc,
nnet3-chain-train2.cc, nnet3-chain-combine2.cc,
chain-make-num-fst-e2e.cc; src/rnnlmbin rnnlm-get-egs.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def nnet3_train(argv: List[str]) -> int:
    po = ParseOptions(
        "Train an nnet3 model with frame-level cross-entropy from "
        "prepared examples; writes a raw nnet (nnet3-train.cc — this "
        "framework trains its native TDNN stack at frame rate 1).\n"
        "Usage: nnet3-train [options] <egs-rspecifier> <raw-nnet-out>")
    num_epochs = po.register_value("num-epochs", 4, "Epochs over egs")
    mb = po.register_value("minibatch-size", 32, "Minibatch size")
    lr = po.register_value("learning-rate", 1e-3, "Adam learning rate")
    hidden = po.register_value("hidden-dim", 256, "Hidden dim")
    bottleneck = po.register_value("bottleneck-dim", 64,
                                   "Bottleneck dim")
    layers = po.register_value("num-layers", 4, "TDNN-F layers")
    num_pdfs = po.register_value(
        "num-pdfs", 0, "Output dimension (0 = infer from targets)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.parallel.trainer import train_xent_from_egs
    n_steps, objf = train_xent_from_egs(
        po.get_arg(1), po.get_arg(2), num_epochs=num_epochs[0],
        minibatch_size=mb[0], learning_rate=lr[0],
        hidden_dim=hidden[0], bottleneck_dim=bottleneck[0],
        num_layers=layers[0], num_pdfs=num_pdfs[0])
    log(f"nnet3-train: {n_steps} steps, final objf {objf:.4f}")
    return 0


def nnet3_combine(argv: List[str]) -> int:
    po = ParseOptions(
        "Combine (average) the parameters of several nnet3 models "
        "(nnet3-combine.cc; the equal-weight --enforce-sum-to-one "
        "case).\n"
        "Usage: nnet3-combine [options] <model-in1> <model-in2> ... "
        "<model-out>")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.chain_tools import average_models
    return average_models([po.get_arg(i)
                           for i in range(1, po.num_args())],
                          po.get_arg(po.num_args()))


def nnet3_chain_train2(argv: List[str]) -> int:
    from kaldi_tpu.cli.chain_tools import nnet3_chain_train
    return nnet3_chain_train(["nnet3-chain-train2"] + argv[1:])


def nnet3_chain_combine2(argv: List[str]) -> int:
    from kaldi_tpu.cli.chain_tools import nnet3_chain_combine
    return nnet3_chain_combine(["nnet3-chain-combine2"] + argv[1:])


def nnet3_am_train_transitions(argv: List[str]) -> int:
    po = ParseOptions(
        "Re-estimate an nnet3 .mdl's transition probabilities and set "
        "its pdf priors from alignments "
        "(nnet3-am-train-transitions.cc).\n"
        "Usage: nnet3-am-train-transitions [options] <mdl-in> "
        "<ali-rspecifier> <mdl-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    transition_floor = po.register_value(
        "transition-floor", 0.01, "Probability floor")
    transition_min_count = po.register_value(
        "transition-min-count", 5.0, "Minimum state count to update")
    prior_floor = po.register_value("prior-floor", 1e-8,
                                    "Pdf prior floor")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.mdl_io import read_nnet3_am, write_nnet3_am
    tm, graph, info = read_nnet3_am(po.get_arg(1))
    stats = np.zeros(tm.num_transition_ids + 1, np.float64)
    pdf_counts = np.zeros(tm.num_pdfs, np.float64)
    n = 0
    for _key, ali in SequentialTableReader("int-vector",
                                           po.get_arg(2)):
        a = np.asarray(ali, np.int64)
        np.add.at(stats, a, 1.0)
        np.add.at(pdf_counts, tm.transition_ids_to_pdfs(a), 1.0)
        n += 1
    impr, count = tm.mle_update(stats, floor=transition_floor[0],
                                min_count=transition_min_count[0])
    priors = np.maximum(pdf_counts / max(pdf_counts.sum(), 1.0),
                        prior_floor[0])
    write_nnet3_am(po.get_arg(3), tm, graph,
                   left_context=info["left_context"],
                   right_context=info["right_context"],
                   priors=priors.astype(np.float32), binary=binary[0])
    log(f"trained transitions from {n} alignments "
        f"(impr/frame {impr:.4f} over {count:.0f}); set priors")
    return 0 if n else 1


def nnet3_acc_lda_stats(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate LDA statistics from nnet3 examples: each output "
        "frame's features go to the classes of its posterior entries "
        "(nnet3-acc-lda-stats.cc; feeds the LDA-like input transform "
        "of the nnet recipes).\n"
        "Usage: nnet3-acc-lda-stats [options] <egs-rspecifier> "
        "<lda-acc-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    rand_prune = po.register_value(
        "rand-prune", 0.0, "Randomized posterior pruning threshold")
    num_pdfs = po.register_value(
        "num-pdfs", 0, "Number of classes (0 = infer)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.egs import ExampleHolder
    from kaldi_tpu.transform.lda import LdaEstimate
    egs = [eg for _k, eg in SequentialTableReader(ExampleHolder(),
                                                  po.get_arg(1))]
    if not egs:
        print("nnet3-acc-lda-stats: no examples", flush=True)
        return 1
    K = num_pdfs[0] or 1 + max((p for eg in egs for fr in eg.targets
                                for p, _w in fr), default=0)
    est = LdaEstimate(K, egs[0].feats.shape[1])
    rng = np.random.default_rng(0)
    for eg in egs:
        lc = eg.left_context
        for t, frame in enumerate(eg.targets):
            x = eg.feats[lc + t]
            for p, w in frame:
                if rand_prune[0] > 0.0 and w < rand_prune[0]:
                    if rng.random() > w / rand_prune[0]:
                        continue
                    w = rand_prune[0]
                est.accumulate(x, int(p), weight=float(w))
    kaldi_io.write_kaldi_object(est.write, po.get_arg(2), binary[0])
    log(f"accumulated LDA stats from {len(egs)} examples "
        f"({K} classes)")
    return 0


def nnet3_chain_acc_lda_stats(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate LDA statistics from chain examples: per-frame "
        "pdf posteriors come from an exact forward-backward over "
        "each example's numerator graph "
        "(nnet3-chain-acc-lda-stats.cc).\n"
        "Usage: nnet3-chain-acc-lda-stats [options] <egs-rspecifier> "
        "<lda-acc-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    sub = po.register_value("frame-subsampling-factor", 3,
                            "Output frame subsampling factor")
    num_pdfs = po.register_value(
        "num-pdfs", 0, "Number of classes (0 = infer)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.egs import ChainExampleHolder
    from kaldi_tpu.transform.lda import LdaEstimate
    est = None
    n = 0
    max_pdf = 0
    batches = []
    for _k, eg in SequentialTableReader(ChainExampleHolder(),
                                        po.get_arg(1)):
        batches.append(eg)
        max_pdf = max(max_pdf, int(eg.num_graph.pdf.max()))
    if not batches:
        print("nnet3-chain-acc-lda-stats: no examples", flush=True)
        return 1
    K = num_pdfs[0] or max_pdf + 1
    est = LdaEstimate(K, batches[0].feats.shape[1])
    for eg in batches:
        g = eg.num_graph
        T = (eg.feats.shape[0] - eg.left_context
             - eg.right_context) // sub[0]
        # exact forward-backward over the packed numerator graph
        NEG = -np.inf
        alpha = np.full((T + 1, g.num_states), NEG)
        beta = np.full((T + 1, g.num_states), NEG)
        alpha[0] = g.initial
        for t in range(T):
            nxt = np.full(g.num_states, NEG)
            contrib = alpha[t][g.src] + g.log_prob
            np.logaddexp.at(nxt, g.dst, contrib)
            alpha[t + 1] = nxt
        beta[T] = g.final
        for t in range(T - 1, -1, -1):
            prev = np.full(g.num_states, NEG)
            contrib = g.log_prob + beta[t + 1][g.dst]
            np.logaddexp.at(prev, g.src, contrib)
            beta[t] = prev
        tot = np.logaddexp.reduce(alpha[T] + g.final)
        if not np.isfinite(tot):
            warn("skipping example with -inf numerator score")
            continue
        for t in range(T):
            post = np.exp(alpha[t][g.src] + g.log_prob
                          + beta[t + 1][g.dst] - tot)
            x = eg.feats[eg.left_context + t * sub[0]]
            mass = {}
            for pdf, w in zip(g.pdf, post):
                if w > 1e-8:
                    mass[int(pdf)] = mass.get(int(pdf), 0.0) + float(w)
            for pdf, w in mass.items():
                est.accumulate(x, pdf, weight=w)
        n += 1
    kaldi_io.write_kaldi_object(est.write, po.get_arg(2), binary[0])
    log(f"accumulated chain LDA stats from {n} examples ({K} classes)")
    return 0 if n else 1


def nnet3_get_egs_dense_targets(argv: List[str]) -> int:
    po = ParseOptions(
        "Get examples with DENSE target matrices (e.g. regression / "
        "image tasks; nnet3-get-egs-dense-targets.cc).\n"
        "Usage: nnet3-get-egs-dense-targets [options] "
        "<features-rspecifier> <targets-matrix-rspecifier> "
        "<egs-wspecifier>")
    left = po.register_value("left-context", 0, "Left context frames")
    right = po.register_value("right-context", 0, "Right context frames")
    num_frames = po.register_value(
        "num-frames", 8, "Frames per example chunk")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.egs import ExampleHolder, NnetExample
    tgt_reader = RandomAccessTableReader("matrix", po.get_arg(2))
    writer = TableWriter(ExampleHolder(), po.get_arg(3))
    n_utt = n_egs = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(1)):
        if key not in tgt_reader:
            warn(f"no targets for {key}")
            err += 1
            continue
        tgt = np.asarray(tgt_reader[key], np.float32)
        T = min(feats.shape[0], tgt.shape[0])
        k = num_frames[0]
        for i, t0 in enumerate(range(0, T, k)):
            t1 = min(t0 + k, T)
            lo = max(0, t0 - left[0])
            hi = min(T, t1 + right[0])
            # dense rows become sparse (index, value) lists
            targets = [[(j, float(v)) for j, v in enumerate(row)
                        if v != 0.0] for row in tgt[t0:t1]]
            eg = NnetExample(np.asarray(feats)[lo:hi], targets,
                             left_context=t0 - lo,
                             right_context=hi - t1)
            writer.write(f"{key}-{i}", eg)
            n_egs += 1
        n_utt += 1
    writer.close()
    log(f"generated {n_egs} dense-target examples from {n_utt} "
        f"utterances ({err} errors)")
    return 0 if n_egs else 1


def nnet3_get_egs_simple(argv: List[str]) -> int:
    po = ParseOptions(
        "Get whole-utterance examples from named rspecifiers: "
        "input=<matrix-rspecifier> output=<posterior-or-smat-"
        "rspecifier> (nnet3-get-egs-simple.cc; no chunking — e.g. "
        "image tasks).\n"
        "Usage: nnet3-get-egs-simple [options] input=<rspecifier> "
        "output=<rspecifier> <egs-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.egs import ExampleHolder, NnetExample
    args = {a.split("=", 1)[0]: a.split("=", 1)[1]
            for a in (po.get_arg(1), po.get_arg(2)) if "=" in a}
    if "input" not in args or "output" not in args:
        po.print_usage()
        return 1
    # outputs may be posteriors or sparse matrices; sniff by trying
    # the posterior holder first
    try:
        out_reader = RandomAccessTableReader("posterior",
                                             args["output"])
        _probe = list(out_reader.keys())
        mode = "posterior"
    except Exception:
        out_reader = RandomAccessTableReader("sparse-matrix",
                                             args["output"])
        mode = "sparse-matrix"
    writer = TableWriter(ExampleHolder(), po.get_arg(3))
    n = err = 0
    for key, feats in SequentialTableReader("matrix", args["input"]):
        if key not in out_reader:
            warn(f"no output for {key}")
            err += 1
            continue
        val = out_reader[key]
        if mode == "posterior":
            targets = [list(fr) for fr in val]
        else:
            targets = [list(zip(idx.tolist(), v.tolist()))
                       for idx, v in val.rows]
        writer.write(key, NnetExample(np.asarray(feats), targets))
        n += 1
    writer.close()
    log(f"wrote {n} simple examples ({err} errors)")
    return 0 if n else 1


def _degs_each(argv, name, fn):
    """Shared single-in single-out discriminative-egs driver."""
    po = ParseOptions(
        f"{name}: see the chain/plain egs variant for semantics.\n"
        f"Usage: {name} [options] <egs-rspecifier> <egs-wspecifier>")
    srand = po.register_value("srand", 0, "Shuffle seed")
    n_keep = po.register_value("n", 10, "Subset size (subset only)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.egs import DiscriminativeExampleHolder
    items = list(SequentialTableReader(DiscriminativeExampleHolder(),
                                       po.get_arg(1)))
    items = fn(items, srand[0], n_keep[0])
    with TableWriter(DiscriminativeExampleHolder(),
                     po.get_arg(2)) as w:
        for k, v in items:
            w.write(k, v)
    log(f"{name}: wrote {len(items)} examples")
    return 0 if items else 1


def nnet3_discriminative_shuffle_egs(argv: List[str]) -> int:
    def fn(items, srand, _n):
        rng = np.random.default_rng(srand)
        order = rng.permutation(len(items))
        return [items[i] for i in order]
    return _degs_each(argv, "nnet3-discriminative-shuffle-egs", fn)


def nnet3_discriminative_subset_egs(argv: List[str]) -> int:
    def fn(items, _srand, n):
        return items[:n]
    return _degs_each(argv, "nnet3-discriminative-subset-egs", fn)


def nnet3_discriminative_merge_egs(argv: List[str]) -> int:
    # discriminative egs hold whole chunks with lattices; "merging"
    # in the reference groups minibatches — our trainer batches at
    # read time, so merge = identity copy with minibatch-size
    # accepted for CLI parity
    po = ParseOptions(
        "Copy discriminative examples (minibatch grouping happens in "
        "the trainer; nnet3-discriminative-merge-egs.cc surface).\n"
        "Usage: nnet3-discriminative-merge-egs [options] "
        "<egs-rspecifier> <egs-wspecifier>")
    po.register_value("minibatch-size", 64,
                      "Accepted for compatibility")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.egs import DiscriminativeExampleHolder
    n = 0
    with TableWriter(DiscriminativeExampleHolder(),
                     po.get_arg(2)) as w:
        for k, v in SequentialTableReader(DiscriminativeExampleHolder(),
                                          po.get_arg(1)):
            w.write(k, v)
            n += 1
    log(f"copied {n} discriminative examples")
    return 0 if n else 1


def _degs_objf(mdl_dir: str, tm_path: str, egs_rspec: str,
               criterion: str, acoustic_scale: float):
    """Shared MMI/sMBR/MPFE objective over discriminative egs with a
    live model forward."""
    import json
    import os

    import jax
    import jax.numpy as jnp

    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.lat.functions import (
        lattice_forward_backward_mpe_variants, lattice_scale)
    from kaldi_tpu.nnet3.egs import DiscriminativeExampleHolder
    from kaldi_tpu.nnet3.xconfig import build_xconfig_model, \
        parse_xconfig
    from kaldi_tpu.parallel.checkpoint import restore_checkpoint
    tm = _read_tm(tm_path)
    base = os.path.abspath(mdl_dir)
    meta = json.load(open(os.path.join(base, "step_0.meta.json")))
    model = build_xconfig_model(meta["xconfig"], train=False)
    layers = parse_xconfig(meta["xconfig"])
    dims = {l.name: l.get_int("dim") for l in layers
            if l.layer_type == "input"}
    inputs0 = {name: jnp.zeros((1, 21, d)) for name, d in dims.items()}
    template = model.init(jax.random.PRNGKey(0), inputs0)
    variables, _, _ = restore_checkpoint(base, template)
    sil = []
    tot_objf = tot_frames = 0.0
    posts = {}
    for key, eg in SequentialTableReader(DiscriminativeExampleHolder(),
                                         egs_rspec):
        out = model.apply(variables,
                          {"input": jnp.asarray(eg.feats[None])})
        ll = np.asarray(out["output"][0])
        # rescore the den lattice acoustics from the live model
        lat = eg.den_lat
        from kaldi_tpu.fstext.fst import Arc
        times = _lat_frame_times(lat)
        for s in range(lat.num_states):
            for i, a in enumerate(lat.arcs[s]):
                if a.ilabel:
                    pdf = tm.transition_id_to_pdf(a.ilabel)
                    t = min(times[s], ll.shape[0] - 1)
                    lat.arcs[s][i] = Arc(
                        a.ilabel, a.olabel,
                        (a.weight[0], -float(ll[t, pdf])),
                        a.nextstate)
        scaled = lattice_scale(lat, 1.0, acoustic_scale)
        objf, post = lattice_forward_backward_mpe_variants(
            tm, sil, scaled, eg.num_ali,
            criterion="smbr" if criterion == "smbr" else "mpfe")
        tot_objf += objf
        tot_frames += len(eg.num_ali)
        posts[key] = post
    return tot_objf, tot_frames, posts


def _lat_frame_times(lat):
    from kaldi_tpu.lat.functions import lattice_state_times
    return lattice_state_times(lat)


def nnet3_discriminative_compute_objf(argv: List[str]) -> int:
    po = ParseOptions(
        "Compute the discriminative (sMBR/MPFE) objective over "
        "examples with a live model forward "
        "(nnet3-discriminative-compute-objf.cc).\n"
        "Usage: nnet3-discriminative-compute-objf [options] "
        "<model-dir> <trans-model> <egs-rspecifier>")
    criterion = po.register_value("criterion", "smbr", "smbr | mpfe")
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    objf, frames, _p = _degs_objf(po.get_arg(1), po.get_arg(2),
                                  po.get_arg(3), criterion[0],
                                  acoustic_scale[0])
    print(f"{criterion[0]} objective per frame is "
          f"{objf / max(frames, 1):.6f} over {frames:.0f} frames",
          flush=True)
    return 0


def nnet3_discriminative_compute_from_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Forward nnet3 outputs for discriminative examples "
        "(nnet3-discriminative-compute-from-egs.cc).\n"
        "Usage: nnet3-discriminative-compute-from-egs [options] "
        "<model-dir> <egs-rspecifier> <matrix-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    import json
    import os

    import jax
    import jax.numpy as jnp

    from kaldi_tpu.nnet3.egs import DiscriminativeExampleHolder
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
    writer = TableWriter("matrix", po.get_arg(3))
    n = 0
    for key, eg in SequentialTableReader(DiscriminativeExampleHolder(),
                                         po.get_arg(2)):
        out = model.apply(variables,
                          {"input": jnp.asarray(eg.feats[None])})
        writer.write(key, np.asarray(out["output"][0], np.float32))
        n += 1
    writer.close()
    log(f"computed outputs for {n} examples")
    return 0 if n else 1


def nnet3_chain_add_post_to_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Scale/replace chain examples' numerator log-probs with "
        "externally supplied per-frame pdf posteriors (teacher "
        "posteriors; nnet3-chain-add-post-to-egs.cc surface — the "
        "posteriors re-weight matching numerator arcs).\n"
        "Usage: nnet3-chain-add-post-to-egs [options] "
        "<egs-rspecifier> <post-rspecifier> <egs-wspecifier>")
    scale = po.register_value("post-scale", 1.0,
                              "Scale on the added posteriors")
    sub = po.register_value("frame-subsampling-factor", 3,
                            "Output frame subsampling factor")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.egs import ChainExampleHolder
    post_reader = RandomAccessTableReader("posterior", po.get_arg(2))
    writer = TableWriter(ChainExampleHolder(), po.get_arg(3))
    n = miss = 0
    for key, eg in SequentialTableReader(ChainExampleHolder(),
                                         po.get_arg(1)):
        base = key.rsplit("-", 1)[0]
        pk = key if key in post_reader else base
        if pk not in post_reader:
            miss += 1
            writer.write(key, eg)
            continue
        post = post_reader[pk]
        g = eg.num_graph
        # boost arcs whose pdf has posterior mass anywhere in the
        # chunk (frame-indexed boosting needs state times, which the
        # packed numerator graph does not store; mass aggregation is
        # the useful teacher-regularization signal)
        mass = np.zeros(int(g.pdf.max()) + 1)
        for frame in post:
            for p, w in frame:
                if p < len(mass):
                    mass[p] += w
        mass = mass / max(mass.sum(), 1e-10)
        g.log_prob = (np.asarray(g.log_prob)
                      + scale[0] * np.log(mass[g.pdf] + 1e-10)
                      ).astype(np.float32)
        writer.write(key, eg)
        n += 1
    writer.close()
    log(f"added posteriors to {n} examples ({miss} without posts)")
    return 0 if n else 1


def chain_make_num_fst_e2e(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert e2e numerator FSTs over transition-ids to FSTs over "
        "pdf-ids+1, composed with the normalization FST "
        "(chain-make-num-fst-e2e.cc).\n"
        "Usage: chain-make-num-fst-e2e [options] <model> "
        "<normalization-fst> <transition-fst-rspecifier> "
        "<pdf-fst-wspecifier>")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.fstext.ops import compose, connect
    tm = _read_tm(po.get_arg(1))
    norm = read_fst_file(po.get_arg(2))
    writer = TableWriter("fst", po.get_arg(4))
    n = 0
    for key, fst in SequentialTableReader("fst", po.get_arg(3)):
        out = VectorFst(TropicalWeight)
        out.add_states(fst.num_states)
        out.start = fst.start
        for s in range(fst.num_states):
            out.finals[s] = fst.finals[s]
            for a in fst.arcs[s]:
                pdf1 = (tm.transition_id_to_pdf(a.ilabel) + 1
                        if a.ilabel else 0)
                out.add_arc(s, Arc(pdf1, pdf1, a.weight, a.nextstate))
        composed = connect(compose(out, norm))
        writer.write(key, composed)
        n += 1
    writer.close()
    log(f"converted {n} e2e numerator FSTs to pdf-id+1 form")
    return 0 if n else 1


def rnnlm_get_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Turn weighted integer sentences (`weight w1 w2 ...`) into "
        "RNNLM training examples: fixed-length chunks of (input, "
        "output) word id sequences with per-chunk weights "
        "(rnnlm-get-egs.cc, no-sampling form; the sampling path "
        "lives in rnnlm-train --sampling-lm).\n"
        "Usage: rnnlm-get-egs [options] <sentences-rxfilename> "
        "<egs-wspecifier>")
    chunk_length = po.register_value("chunk-length", 32,
                                     "Maximum chunk length")
    bos = po.register_value("bos-symbol", 1, "Begin-of-sentence id")
    eos = po.register_value("eos-symbol", 2, "End-of-sentence id")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter("matrix", po.get_arg(2))
    n = 0
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        for i, raw in enumerate(f.read().decode().splitlines()):
            parts = raw.split()
            if not parts:
                continue
            weight = float(parts[0])
            words = [int(w) for w in parts[1:]]
            seq = [bos[0]] + words + [eos[0]]
            for j, t0 in enumerate(range(0, len(seq) - 1,
                                         chunk_length[0])):
                t1 = min(t0 + chunk_length[0], len(seq) - 1)
                inp = seq[t0:t1]
                out = seq[t0 + 1:t1 + 1]
                # rows: [input; output; weight broadcast]
                mat = np.stack([
                    np.asarray(inp, np.float32),
                    np.asarray(out, np.float32),
                    np.full(len(inp), weight, np.float32)])
                writer.write(f"line{i}-{j}", mat)
                n += 1
    writer.close()
    log(f"wrote {n} RNNLM example chunks")
    return 0 if n else 1
