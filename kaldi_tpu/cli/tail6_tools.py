"""Round-3 CLI tail batch 4 (parity: src/gmmbin gmm-init-model.cc,
gmm-mixup.cc, gmm-gselect.cc, fgmm-gselect.cc, gmm-global-info.cc,
fgmm-global-info.cc, fgmm-global-copy.cc, gmm-global-get-post.cc,
gmm-acc-mllt.cc; src/bin convert-ali.cc, est-mllt.cc, est-pca.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def gmm_init_model(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize a GMM from a decision tree and tree stats (one "
        "Gaussian per pdf from its pooled stats).\n"
        "Usage: gmm-init-model [options] <tree-in> <tree-stats-in> "
        "<topo-in> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import write_am_gmm
    from kaldi_tpu.hmm import HmmTopology, TransitionModel
    from kaldi_tpu.recipes.deltas import init_model_from_tree_stats
    from kaldi_tpu.tree.clusterable import read_build_tree_stats
    from kaldi_tpu.tree.context_dep import ContextDependency
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      po.get_arg(1))
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        b = iof.init_input_stream(f)
        stats = read_build_tree_stats(f, b)
    topo = kaldi_io.read_kaldi_object(HmmTopology.read, po.get_arg(3))
    tm = TransitionModel(topo, tree)
    dim = len(next(iter(stats.values())).mean()) if stats else 0
    if not dim:
        warn("gmm-init-model: empty tree stats")
        return 1
    am = init_model_from_tree_stats(tree, tm, stats, dim)
    write_am_gmm(po.get_arg(4), tm, am, binary[0])
    log(f"initialized model: {am.num_pdfs} pdfs, dim {dim}")
    return 0


def gmm_mixup(argv: List[str]) -> int:
    po = ParseOptions(
        "Split GMM components to a target total, proportional to "
        "occupancy^power.\n"
        "Usage: gmm-mixup [options] <model-in> <state-occs-in> "
        "<model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    mixup = po.register_value("mixup", 0, "Target total #Gaussians")
    power = po.register_value("power", 0.2, "Occupancy power for "
                              "allocating Gaussians to states")
    min_count = po.register_value(
        "min-count", 20.0, "Minimum per-Gaussian occupancy")
    perturb = po.register_value("perturb-factor", 0.01,
                                "Mean perturbation when splitting")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm, write_am_gmm
    tm, am = read_am_gmm(po.get_arg(1))
    occs = np.asarray(kaldi_io.read_kaldi_object(iof.read_vector,
                                                 po.get_arg(2)))
    if len(occs) != am.num_pdfs:
        print(f"gmm-mixup: occs dim {len(occs)} vs {am.num_pdfs} pdfs",
              flush=True)
        return 1
    target = mixup[0] or am.num_gauss()
    # allocate proportional to occ^power, bounded by occ/min_count
    w = np.maximum(occs, 1e-10) ** power[0]
    alloc = np.maximum(1, np.floor(
        target * w / w.sum()).astype(int))
    cap = np.maximum(1, (occs / max(min_count[0], 1e-10)).astype(int))
    alloc = np.minimum(alloc, cap)
    for pdf in range(am.num_pdfs):
        g = am.get_pdf(pdf)
        if alloc[pdf] > g.num_gauss:
            g.split(int(alloc[pdf]), perturb_factor=perturb[0])
    am.invalidate_pack()
    write_am_gmm(po.get_arg(3), tm, am, binary[0])
    log(f"mixed up to {am.num_gauss()} Gaussians "
        f"(target {target})")
    return 0


def _gselect(argv: List[str], name: str, full: bool) -> int:
    po = ParseOptions(
        f"Precompute top-N Gaussian indices per frame ({name}).\n"
        f"Usage: {name} [options] <model-in> <feats-rspecifier> "
        "<gselect-wspecifier>")
    n_sel = po.register_value("n", 50, "Number of Gaussians to select")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    if full:
        from kaldi_tpu.gmm.full_gmm import FullGmm
        gmm = kaldi_io.read_kaldi_object(FullGmm.read, po.get_arg(1))
        def comp_ll(x):
            return gmm.component_log_likes(x)
    else:
        from kaldi_tpu.gmm.diag_gmm import DiagGmm
        gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
        def comp_ll(x):
            return gmm.component_log_likes(x)
    writer = TableWriter("int-vector-vector", po.get_arg(3))
    n = 0
    k = n_sel[0]
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        ll = np.asarray(comp_ll(np.asarray(feats, np.float32)))
        kk = min(k, ll.shape[1])
        idx = np.argpartition(-ll, kk - 1, axis=1)[:, :kk]
        # order selected by decreasing loglike (reference contract)
        row = np.take_along_axis(ll, idx, axis=1)
        order = np.argsort(-row, axis=1, kind="stable")
        idx = np.take_along_axis(idx, order, axis=1)
        writer.write(key, [r.tolist() for r in idx])
        n += 1
    writer.close()
    log(f"{name}: wrote gselect for {n} utterances (n={k})")
    return 0 if n else 1


def gmm_gselect(argv: List[str]) -> int:
    return _gselect(argv, "gmm-gselect", full=False)


def fgmm_gselect(argv: List[str]) -> int:
    return _gselect(argv, "fgmm-gselect", full=True)


def gmm_global_get_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Per-frame top-N Gaussian posteriors from a global diagonal "
        "GMM.\n"
        "Usage: gmm-global-get-post [options] <model-in> "
        "<feats-rspecifier> <post-wspecifier>")
    n_sel = po.register_value("n", 50, "Posterior entries per frame")
    min_post = po.register_value("min-post", 0.0,
                                 "Prune posteriors below this")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    writer = TableWriter("posterior", po.get_arg(3))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        post = gmm.component_posteriors(np.asarray(feats, np.float32))
        out = []
        for row in post:
            kk = min(n_sel[0], len(row))
            idx = np.argpartition(-row, kk - 1)[:kk]
            idx = idx[np.argsort(-row[idx], kind="stable")]
            sel = [(int(i), float(row[i])) for i in idx
                   if row[i] > min_post[0]]
            s = sum(p for _, p in sel)
            if s > 0:
                sel = [(i, p / s) for i, p in sel]
            out.append(sel)
        writer.write(key, out)
        n += 1
    writer.close()
    log(f"wrote posteriors for {n} utterances")
    return 0 if n else 1


def _global_info(argv: List[str], name: str, full: bool) -> int:
    po = ParseOptions(
        f"Print info about a global GMM.\nUsage: {name} <model-in>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    if full:
        from kaldi_tpu.gmm.full_gmm import FullGmm
        gmm = kaldi_io.read_kaldi_object(FullGmm.read, po.get_arg(1))
    else:
        from kaldi_tpu.gmm.diag_gmm import DiagGmm
        gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    print(f"number of gaussians {gmm.num_gauss}")
    print(f"feature dimension {gmm.dim}")
    return 0


def gmm_global_info(argv: List[str]) -> int:
    return _global_info(argv, "gmm-global-info", full=False)


def fgmm_global_info(argv: List[str]) -> int:
    return _global_info(argv, "fgmm-global-info", full=True)


def fgmm_global_copy(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy a full-covariance GMM (possibly changing format).\n"
        "Usage: fgmm-global-copy [options] <model-in> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.full_gmm import FullGmm
    gmm = kaldi_io.read_kaldi_object(FullGmm.read, po.get_arg(1))
    kaldi_io.write_kaldi_object(gmm.write, po.get_arg(2), binary[0])
    return 0


def convert_ali(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert alignments between systems (e.g. mono -> triphone): "
        "phone segment durations are preserved; pdfs come from the "
        "new tree over the utterance's phone context.\n"
        "Usage: convert-ali [options] <old-model> <new-model> "
        "<new-tree> <old-ali-rspecifier> <new-ali-wspecifier>")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.hmm.topology import NO_PDF
    from kaldi_tpu.tree.context_dep import ContextDependency
    tm_old = _read_tm(po.get_arg(1))
    tm_new = _read_tm(po.get_arg(2))
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      po.get_arg(3))
    N, P = tree.context_width(), tree.central_position()
    writer = TableWriter("int-vector", po.get_arg(5))
    n = err = 0
    for key, ali in SequentialTableReader("int-vector", po.get_arg(4)):
        phones = [tm_old.transition_id_to_phone(int(t)) for t in ali]
        # phone segments: (phone, start, dur) — a segment boundary is a
        # non-self-loop transition into hmm-state 0 or a phone change
        segs = []
        for t, p in enumerate(phones):
            tid = int(ali[t])
            starts = (t == 0 or phones[t - 1] != p
                      or (tm_old.transition_id_to_hmm_state(tid) == 0
                          and not tm_old.is_self_loop(tid)
                          and tm_old.transition_id_to_hmm_state(
                              int(ali[t - 1])) != 0))
            if starts:
                segs.append([p, t, 0])
            segs[-1][2] += 1
        seq = [s[0] for s in segs]
        out: List[int] = []
        ok = True
        for i, (p, start, dur) in enumerate(segs):
            window = [seq[j] if 0 <= j < len(seq) else 0
                      for j in range(i - P, i - P + N)]
            entry = tm_new.topo.topology_for_phone(p)
            try:
                for t in range(start, start + dur):
                    tid_old = int(ali[t])
                    hs = tm_old.transition_id_to_hmm_state(tid_old)
                    if hs >= len(entry) or \
                            entry[hs].forward_pdf_class == NO_PDF:
                        raise ValueError(
                            f"topology mismatch for phone {p} "
                            f"state {hs}")
                    pdf = tree.compute(window,
                                       entry[hs].forward_pdf_class)
                    spdf = tree.compute(window,
                                        entry[hs].self_loop_pdf_class)
                    ts = tm_new.tuple_to_transition_state(
                        p, hs, pdf, spdf)
                    if tm_old.is_self_loop(tid_old):
                        out.append(tm_new.self_loop_of(ts))
                    else:
                        # the forward transition out of this state:
                        # pick the first non-self-loop index
                        tid = None
                        for ti in range(
                                tm_new.num_transition_indices(ts)):
                            cand = tm_new.pair_to_transition_id(ts, ti)
                            if not tm_new.is_self_loop(cand):
                                tid = cand
                                break
                        if tid is None:
                            raise ValueError("no forward transition")
                        out.append(tid)
            except (ValueError, KeyError) as e:
                warn(f"convert-ali: {key}: {e}")
                ok = False
                break
        if not ok or len(out) != len(ali):
            err += 1
            continue
        writer.write(key, np.asarray(out, np.int32))
        n += 1
    writer.close()
    log(f"converted {n} alignments ({err} errors)")
    return 0 if n else 1


def gmm_acc_mllt(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate MLLT (global STC) statistics.\n"
        "Usage: gmm-acc-mllt [options] <model-in> <feats-rspecifier> "
        "<posteriors-rspecifier> <stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.transform.mllt import MlltAccs
    tm, am = read_am_gmm(po.get_arg(1))
    post_reader = RandomAccessTableReader("posterior", po.get_arg(3))
    accs = MlltAccs(am.dim)
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in post_reader:
            warn(f"no posteriors for {key}")
            err += 1
            continue
        feats = np.asarray(feats, np.float64)
        post = post_reader[key]
        # per-pdf gaussian-level accumulation
        by_pdf: dict = {}
        for t, frame in enumerate(post):
            for pid, wgt in frame:
                pdf = tm.transition_id_to_pdf(int(pid))
                by_pdf.setdefault(pdf, []).append((t, wgt))
        for pdf, tw in by_pdf.items():
            idx = np.asarray([t for t, _ in tw])
            w = np.asarray([x for _, x in tw])
            gmm = am.get_pdf(pdf)
            cp = gmm.component_posteriors(
                feats[idx].astype(np.float32))
            accs.accumulate_from_posteriors(gmm, feats[idx],
                                            cp * w[:, None])
        n += 1

    def write_accs(stream, b):
        iof.write_token(stream, b, "<MlltAccs>")
        iof.write_double(stream, b, accs.beta)
        iof.write_int32(stream, b, accs.dim)
        for i in range(accs.dim):
            iof.write_matrix(stream, b, accs.G[i])
        iof.write_token(stream, b, "</MlltAccs>")

    kaldi_io.write_kaldi_object(write_accs, po.get_arg(4), binary[0])
    log(f"accumulated MLLT stats from {n} utterances ({err} errors), "
        f"beta {accs.beta:.1f}")
    return 0 if n else 1


def est_mllt(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate the MLLT (global STC) transform from stats.\n"
        "Usage: est-mllt [options] <mat-out> <stats-in1> ...")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.transform.mllt import MlltAccs
    total = None
    for i in range(2, po.num_args() + 1):
        with kaldi_io.input_stream(po.get_arg(i)) as f:
            b = iof.init_input_stream(f)
            iof.expect_token(f, b, "<MlltAccs>")
            beta = iof.read_double(f, b)
            dim = iof.read_int32(f, b)
            acc = MlltAccs(dim)
            acc.beta = beta
            for d in range(dim):
                acc.G[d] = iof.read_matrix(f, b)
            iof.expect_token(f, b, "</MlltAccs>")
        if total is None:
            total = acc
        else:
            total.beta += acc.beta
            total.G += acc.G
    mat, impr = total.update()
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, mat), po.get_arg(1),
        binary[0])
    log(f"estimated MLLT: objf impr/frame {impr:.4f} over "
        f"{total.beta:.1f} frames")
    return 0


def compile_graph(argv: List[str]) -> int:
    po = ParseOptions(
        "Build a decoding graph HCLG from file-level inputs in one "
        "step (compile-graph.cc / utils/mkgraph.sh): "
        "L_disambig.fst ∘ G.fst -> determinize -> strip disambig "
        "-> minimize -> context expansion (for triphone trees) -> "
        "H expansion with reorder self-loops.\n"
        "Input labels of the lexicon FST that are not phones of the "
        "model are treated as disambiguation symbols.\n"
        "Usage: compile-graph [options] <tree-in> <model-in> "
        "<lexicon-fst-in> <g-fst-in> <hclg-out>")
    transition_scale = po.register_value(
        "transition-scale", 1.0, "Scale on transition probabilities")
    self_loop_scale = po.register_value(
        "self-loop-scale", 0.1, "Scale on self-loop probabilities")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.fst_tools import _write_fst_out
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.fstext.fst import EPS
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.fstext.ops import (arcsort, compose,
                                      determinize_star,
                                      minimize_encoded, relabel,
                                      rm_epsilon)
    from kaldi_tpu.hmm.hmm_utils import expand_hmm
    from kaldi_tpu.tree.context_dep import ContextDependency
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      po.get_arg(1))
    tm = _read_tm(po.get_arg(2))
    L = read_fst_file(po.get_arg(3))
    G = read_fst_file(po.get_arg(4))
    lg = compose(L, arcsort(G, "ilabel"))
    lg = determinize_star(lg)
    lg = minimize_encoded(lg)
    phones = set(tm.get_phones())
    dmap = {}
    for arcs in lg.arcs:
        for a in arcs:
            if a.ilabel != EPS and a.ilabel not in phones:
                dmap[a.ilabel] = EPS
    lg = rm_epsilon(relabel(lg, ilabel_map=dmap))
    ilabel_info = None
    if tree.context_width() != 1:
        from kaldi_tpu.fstext.context import context_expand
        lg, ilabel_info = context_expand(lg, tree.context_width(),
                                         tree.central_position())
    hclg = expand_hmm(lg, tm, tree, transition_scale[0],
                      self_loop_scale[0], ilabel_info=ilabel_info)
    _write_fst_out(hclg, po.get_arg(5))
    log(f"compiled HCLG: {hclg.num_states} states, "
        f"{hclg.num_arcs()} arcs")
    return 0


def make_h_transducer(argv: List[str]) -> int:
    po = ParseOptions(
        "Make the Ha transducer (transition-ids, self-loops excluded, "
        "to context-dependent-phone ilabel indices; "
        "make-h-transducer.cc).\n"
        "Usage: make-h-transducer [options] <ilabel-info-file> "
        "<tree-in> <model-in> [<H-out>]")
    transition_scale = po.register_value(
        "transition-scale", 1.0, "Scale on transition probabilities "
        "(excluding self-loops)")
    disambig_out = po.register_value(
        "disambig-syms-out", "", "File to write the H-side "
        "disambiguation symbol ids")
    po.read(argv)
    if po.num_args() < 3 or po.num_args() > 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.fst_tools import _write_fst_out
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.hmm.hmm_utils import make_h_transducer as make_h
    from kaldi_tpu.tree.context_dep import ContextDependency
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        b = iof.init_input_stream(f)
        count = iof.read_int32(f, b)
        ilabel_info = [tuple(iof.read_int_vector(f, b))
                       for _ in range(count)]
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      po.get_arg(2))
    tm = _read_tm(po.get_arg(3))
    ha, disambig = make_h(ilabel_info, tree, tm,
                          transition_scale=transition_scale[0])
    if disambig_out[0]:
        with open(disambig_out[0], "w") as f:
            for d in disambig:
                f.write(f"{d}\n")
    _write_fst_out(ha, po.get_arg(4) if po.num_args() == 4 else "-")
    log(f"made H transducer: {ha.num_states} states, "
        f"{len(disambig)} disambig syms")
    return 0


def add_self_loops(argv: List[str]) -> int:
    po = ParseOptions(
        "Add self-loops (reorder=true) and undo the 1-p_self "
        "renormalization at the given scale (add-self-loops.cc).\n"
        "Usage: add-self-loops [options] <model-in> [<fst-in> "
        "[<fst-out>]]")
    self_loop_scale = po.register_value(
        "self-loop-scale", 0.1, "Scale on self-loop log-probs")
    po.read(argv)
    if po.num_args() < 1 or po.num_args() > 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.fst_tools import _write_fst_out
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.hmm.hmm_utils import add_self_loops as add_sl
    tm = _read_tm(po.get_arg(1))
    fin = po.get_arg(2) if po.num_args() >= 2 else "-"
    fst = read_fst_file(fin)
    out = add_sl(fst, tm, self_loop_scale=self_loop_scale[0])
    _write_fst_out(out, po.get_arg(3) if po.num_args() == 3 else "-")
    return 0


def est_pca(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate a PCA transform from features (est-pca.cc; "
        "--read-vectors for vector input).\n"
        "Usage: est-pca [options] <feats-rspecifier> <pca-matrix-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    dim = po.register_value("dim", 0, "Output dimension (0 = input)")
    read_vectors = po.register_value(
        "read-vectors", False, "Input is a vector archive (e.g. "
        "i-vectors) instead of matrices")
    normalize_variance = po.register_value(
        "normalize-variance", False, "Whiten the projected space")
    normalize_mean = po.register_value(
        "normalize-mean", False, "Append a bias column removing the "
        "mean")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    holder = "vector" if read_vectors[0] else "matrix"
    count = 0
    first = second = None
    for _key, val in SequentialTableReader(holder, po.get_arg(1)):
        x = np.asarray(val, np.float64)
        if x.ndim == 1:
            x = x[None, :]
        if first is None:
            D = x.shape[1]
            first = np.zeros(D)
            second = np.zeros((D, D))
        first += x.sum(axis=0)
        second += x.T @ x
        count += x.shape[0]
    if not count:
        warn("est-pca: no input")
        return 1
    mean = first / count
    covar = second / count - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(covar)
    order = np.argsort(-evals)
    d = dim[0] or len(mean)
    basis = evecs[:, order[:d]].T           # (d, D)
    if normalize_variance[0]:
        lam = np.maximum(evals[order[:d]], 1e-10)
        basis = basis / np.sqrt(lam)[:, None]
    if normalize_mean[0]:
        bias = -(basis @ mean)
        basis = np.concatenate([basis, bias[:, None]], axis=1)
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, basis), po.get_arg(2),
        binary[0])
    log(f"estimated PCA {basis.shape} from {count} frames")
    return 0
