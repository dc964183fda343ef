"""Tree / context-FST tail (parity: src/bin compile-questions.cc,
build-tree-two-level.cc, make-ilabel-transducer.cc; src/gmmbin
gmm-init-biphone.cc; src/fstbin fstmakecontextfst.cc,
fstmakecontextsyms.cc; src/bin
compile-train-graphs-without-lexicon semantics are covered by
align-equal-style direct transcript FSTs)."""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def compile_questions(argv: List[str]) -> int:
    po = ParseOptions(
        "Compile a questions text file (one phone set per line) into "
        "the binary Questions object used by tree building "
        "(compile-questions.cc): phone-set questions on every context "
        "position plus pdf-class refinement questions from the "
        "topology.\n"
        "Usage: compile-questions [options] <topo> "
        "<questions-text-file> <questions-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    context_width = po.register_value("context-width", 3,
                                      "Context window size N")
    central_position = po.register_value("central-position", 1,
                                         "Central position P")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.hmm import HmmTopology
    topo = kaldi_io.read_kaldi_object(HmmTopology.read, po.get_arg(1))
    phone_sets = []
    with open(po.get_arg(2)) as f:
        for line in f:
            s = [int(t) for t in line.split()]
            if s:
                phone_sets.append(s)
    max_states = max(topo.num_pdf_classes(p) for p in topo.phones)
    # pdf-class questions: {0}, {0,1}, ... (nesting, like the
    # reference's automatically-added hmm-state questions)
    pdf_questions = [list(range(k + 1)) for k in range(max_states - 1)]

    def w(stream, b):
        iof.write_token(stream, b, "<Questions>")
        iof.write_int32(stream, b, context_width[0])
        iof.write_int32(stream, b, central_position[0])
        iof.write_int32(stream, b, len(phone_sets))
        for s in phone_sets:
            iof.write_int_vector(stream, b, s)
        iof.write_int32(stream, b, len(pdf_questions))
        for s in pdf_questions:
            iof.write_int_vector(stream, b, s)
        iof.write_token(stream, b, "</Questions>")

    kaldi_io.write_kaldi_object(w, po.get_arg(3), binary[0])
    log(f"compiled {len(phone_sets)} phone-set questions + "
        f"{len(pdf_questions)} pdf-class questions")
    return 0


def read_questions(path: str):
    """Read a compiled questions file -> (N, P, per-key dict for
    build_tree)."""
    with kaldi_io.input_stream(path) as f:
        b = iof.init_input_stream(f)
        iof.expect_token(f, b, "<Questions>")
        N = iof.read_int32(f, b)
        P = iof.read_int32(f, b)
        n = iof.read_int32(f, b)
        phone_sets = [iof.read_int_vector(f, b) for _ in range(n)]
        k = iof.read_int32(f, b)
        pdf_qs = [iof.read_int_vector(f, b) for _ in range(k)]
        iof.expect_token(f, b, "</Questions>")
    from kaldi_tpu.tree.event_map import PDF_CLASS_KEY
    qs = {pos: [list(s) for s in phone_sets] for pos in range(N)}
    qs[PDF_CLASS_KEY] = [list(s) for s in pdf_qs]
    return N, P, qs


def build_tree_two_level(argv: List[str]) -> int:
    po = ParseOptions(
        "Train a two-level decision tree: the full tree plus a "
        "mapping from its leaves to a smaller number of first-level "
        "clusters (build-tree-two-level.cc; tied-mixture systems).\n"
        "Usage: build-tree-two-level [options] <tree-stats-in> "
        "<roots-file> <questions-file> <topo-file> <tree-out> "
        "<mapping-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    max_leaves_first = po.register_value(
        "max-leaves-first", 100, "First-level (small) leaf count")
    max_leaves_second = po.register_value(
        "max-leaves-second", 400, "Second-level (full) leaf count")
    context_width = po.register_value("context-width", 3,
                                      "Context window size")
    central_position = po.register_value("central-position", 1,
                                         "Central position")
    po.read(argv)
    if po.num_args() != 6:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.nnet3_tools import _read_tree_stats
    from kaldi_tpu.hmm import HmmTopology
    from kaldi_tpu.tree.build_tree import BuildTreeOptions, build_tree
    from kaldi_tpu.tree.event_map import PDF_CLASS_KEY, event_to_dict
    stats = _read_tree_stats(po.get_arg(1))
    roots = []
    with open(po.get_arg(2)) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            shared = parts[-2] == "shared"
            split = parts[-1] == "split"
            phones = [int(p) for p in parts[:-2]]
            roots.append((phones, shared, split))
    # questions: compiled (binary) or plain text phone sets
    try:
        N, P, questions = read_questions(po.get_arg(3))
    except Exception:
        N, P = context_width[0], central_position[0]
        phone_sets = []
        with open(po.get_arg(3)) as f:
            for line in f:
                s = [int(t) for t in line.split()]
                if s:
                    phone_sets.append(s)
        questions = {pos: phone_sets for pos in range(N)}
        questions[PDF_CLASS_KEY] = [[0], [0, 1]]
    topo = kaldi_io.read_kaldi_object(HmmTopology.read, po.get_arg(4))
    tree = build_tree(stats, questions, roots, N, P,
                      BuildTreeOptions(max_leaves=max_leaves_second[0],
                                       min_gain=0.0), topo=topo)
    # pool stats per full-tree leaf
    dim = next(iter(stats.values())).stats_sum.shape[0]
    num_pdfs = tree.num_pdfs
    count = np.zeros(num_pdfs)
    s1 = np.zeros((num_pdfs, dim))
    s2 = np.zeros((num_pdfs, dim))
    for event, g in stats.items():
        d = event_to_dict(event)
        window = [d.get(pos, 0) for pos in range(N)]
        pdf = tree.compute(window, d.get(PDF_CLASS_KEY, 0))
        if pdf is None:
            continue
        count[pdf] += g.count
        s1[pdf] += g.stats_sum
        s2[pdf] += g.stats_sumsq
    # cluster leaves to the first level: weighted k-means on means
    K = min(max_leaves_first[0], num_pdfs)
    means = s1 / np.maximum(count[:, None], 1e-10)
    rng = np.random.default_rng(0)
    nonzero = np.nonzero(count > 0)[0]
    init = nonzero[rng.permutation(len(nonzero))[:K]] \
        if len(nonzero) >= K else np.arange(K) % num_pdfs
    cents = means[init]
    for _ in range(15):
        d2 = ((means[:, None, :] - cents[None]) ** 2).sum(-1)
        assign = d2.argmin(axis=1)
        for k in range(K):
            sel = (assign == k) & (count > 0)
            if np.any(sel):
                cents[k] = (means[sel] * count[sel, None]).sum(0) \
                    / count[sel].sum()
    mapping = d2.argmin(axis=1).astype(np.int32)
    kaldi_io.write_kaldi_object(tree.write, po.get_arg(5), binary[0])
    kaldi_io.write_kaldi_object(
        lambda st, b: iof.write_int_vector(st, b, mapping.tolist()),
        po.get_arg(6), binary[0])
    log(f"two-level tree: {num_pdfs} leaves -> {K} clusters")
    return 0


def gmm_init_biphone(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize a FULL biphone (left-context) tree and a flat "
        "GMM model over it, for end-to-end tree-free training "
        "(gmm-init-biphone.cc).\n"
        "Usage: gmm-init-biphone [options] <topology-in> <dim> "
        "<model-out> <tree-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    shared_phones = po.register_value(
        "shared-phones", "", "File with sets of phones sharing "
        "leaves (one set per line; default: none shared)")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.am_diag_gmm import AmDiagGmm
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.hmm import HmmTopology, TransitionModel
    from kaldi_tpu.tree.context_dep import ContextDependency
    from kaldi_tpu.tree.event_map import (PDF_CLASS_KEY,
                                          ConstantEventMap,
                                          TableEventMap)
    topo = kaldi_io.read_kaldi_object(HmmTopology.read, po.get_arg(1))
    dim = int(po.get_arg(2))
    phones = sorted(topo.phones)
    # phone classes (shared phones collapse to one leaf set)
    cls_of = {p: i for i, p in enumerate(phones)}
    if shared_phones[0]:
        with open(shared_phones[0]) as f:
            for line in f:
                s = [int(t) for t in line.split()]
                for p in s[1:]:
                    cls_of[p] = cls_of[s[0]]
        # re-densify class ids
        remap = {c: i for i, c in enumerate(sorted(set(cls_of.values())))}
        cls_of = {p: remap[c] for p, c in cls_of.items()}
    num_classes = len(set(cls_of.values()))
    max_pc = {p: topo.num_pdf_classes(p) for p in phones}
    # leaf id = ((left_class + 1) * num_center_classes... enumerate
    next_pdf = 0
    leaf: Dict[Tuple[int, int, int], int] = {}
    for p in phones:
        for left in [0] + phones:       # 0 = no left context
            lc = -1 if left == 0 else cls_of[left]
            for pc in range(max_pc[p]):
                key = (lc, cls_of[p], pc)
                if key not in leaf:
                    leaf[key] = next_pdf
                    next_pdf += 1
    # event map: table over center phone -> table over pdf-class ->
    # table over left phone
    center_tables = {}
    for p in phones:
        pc_tables = []
        for pc in range(max_pc[p]):
            left_map = {0: leaf[(-1, cls_of[p], pc)]}
            for left in phones:
                left_map[left] = leaf[(cls_of[left], cls_of[p], pc)]
            size = max(left_map) + 1
            table = [ConstantEventMap(
                left_map.get(i, left_map[0])) for i in range(size)]
            pc_tables.append(TableEventMap(0, table))
        center_tables[p] = TableEventMap(PDF_CLASS_KEY, pc_tables)
    size = max(phones) + 1
    root = TableEventMap(
        1, [center_tables.get(i, ConstantEventMap(0))
            for i in range(size)])
    tree = ContextDependency(2, 1, root)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm()
    for _ in range(next_pdf):
        g = DiagGmm(1, dim)
        g.set_from_means_and_vars(np.ones(1), np.zeros((1, dim)),
                                  np.ones((1, dim)))
        g.compute_gconsts()
        am.add_pdf(g)

    def w(stream, b):
        tm.write(stream, b)
        am.write(stream, b)

    kaldi_io.write_kaldi_object(w, po.get_arg(3), binary[0])
    kaldi_io.write_kaldi_object(tree.write, po.get_arg(4), binary[0])
    log(f"initialized biphone tree with {next_pdf} leaves "
        f"({num_classes} phone classes)")
    return 0


def fstmakecontextfst(argv: List[str]) -> int:
    po = ParseOptions(
        "Construct an explicit context FST C (inefficient for large "
        "phone sets — prefer fstcomposecontext; fstmakecontextfst.cc)."
        " Writes C and the ilabel-info file.\n"
        "Usage: fstmakecontextfst [options] <phones-symbol-table> "
        "<subsequential-symbol> <ilabels-output-file> [<out-fst>]")
    context_width = po.register_value("context-width", 3,
                                      "Context window size N")
    central_position = po.register_value("central-position", 1,
                                         "Central position P")
    read_dis = po.register_value(
        "read-disambig-syms", "",
        "File with list of disambiguation symbols")
    po.read(argv)
    if po.num_args() < 3 or po.num_args() > 4:
        po.print_usage()
        return 1
    from kaldi_tpu.base import io_funcs
    from kaldi_tpu.fstext.context import context_expand
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.openfst_io import write_fst
    phones = []
    with open(po.get_arg(1)) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2 and int(parts[1]) > 0:
                phones.append(int(parts[1]))
    subseq = int(po.get_arg(2))
    disambig = []
    if read_dis[0]:
        with open(read_dis[0]) as f:
            disambig = [int(t) for t in f.read().split()]
    phones = [p for p in phones if p != subseq and p not in disambig]
    # C = context expansion of the universal phone acceptor
    uni = VectorFst(TropicalWeight)
    s = uni.add_state()
    uni.set_start(s)
    uni.set_final(s, 0.0)
    for p in phones + disambig:
        uni.add_arc(s, Arc(p, p, 0.0, s))
    clg, ilabel_info = context_expand(
        uni, N=context_width[0], P=central_position[0],
        disambig_syms=disambig)
    with kaldi_io.output_stream(po.get_arg(3)) as f:
        io_funcs.init_output_stream(f, True)
        io_funcs.write_int32(f, True, len(ilabel_info))
        for entry in ilabel_info:
            io_funcs.write_int_vector(f, True, list(entry))
    import sys as _sys
    if po.num_args() >= 4 and po.get_arg(4) != "-":
        with open(po.get_arg(4), "wb") as f:
            write_fst(f, clg)
    else:
        write_fst(_sys.stdout.buffer, clg)
    log(f"wrote context FST: {clg.num_states} states, "
        f"{len(ilabel_info)} ilabels")
    return 0


def fstmakecontextsyms(argv: List[str]) -> int:
    po = ParseOptions(
        "Create a text symbol table for CLG input labels from the "
        "phones table and an ilabels file (fstmakecontextsyms.cc).\n"
        "Usage: fstmakecontextsyms [options] <phones-symtab> "
        "<ilabels-input-file> [<output-symtab.txt>]")
    phone_separator = po.register_value(
        "phone-separator", "/",
        "Separator for phones in phone-in-context symbols")
    initial_disambig = po.register_value(
        "initial-disambig", "#-1",
        "Name for the initial disambiguation symbol")
    po.read(argv)
    if po.num_args() < 2 or po.num_args() > 3:
        po.print_usage()
        return 1
    names = {0: "<eps>"}
    with open(po.get_arg(1)) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                names[int(parts[1])] = parts[0]
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        b = iof.init_input_stream(f)
        n = iof.read_int32(f, b)
        entries = [iof.read_int_vector(f, b) for _ in range(n)]
    lines = []
    for i, entry in enumerate(entries):
        if len(entry) == 0:
            sym = "<eps>"
        elif len(entry) == 1 and entry[0] == -1:
            sym = initial_disambig[0]
        elif len(entry) == 1 and entry[0] < 0:
            sym = f"#{-entry[0] - 1}" if entry[0] != -1 else \
                initial_disambig[0]
        elif len(entry) == 1 and entry[0] in names and \
                names[entry[0]].startswith("#"):
            sym = names[entry[0]]
        else:
            sym = phone_separator[0].join(
                names.get(p, f"?{p}") for p in entry)
        lines.append(f"{sym} {i}")
    import sys as _sys
    out = (_sys.stdout if po.num_args() < 3 or po.get_arg(3) == "-"
           else open(po.get_arg(3), "w"))
    out.write("\n".join(lines) + "\n")
    if out is not _sys.stdout:
        out.close()
    return 0


def make_ilabel_transducer(argv: List[str]) -> int:
    po = ParseOptions(
        "Make a transducer that merges context-dependent ilabels "
        "which the tree maps to the same pdf sequence, writing the "
        "reduced ilabel-info (make-ilabel-transducer.cc; used to "
        "reuse a CLG with a new tree).\n"
        "Usage: make-ilabel-transducer [options] <old-ilabel-info> "
        "<tree-file> <model> <new-ilabel-info> [<mapping-fst-out>]")
    binary = po.register_value("binary", True, "Write output in binary mode")
    old2new_wx = po.register_value(
        "old-to-new-mapping", "", "Write the old->new int map here")
    po.read(argv)
    if po.num_args() < 4 or po.num_args() > 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.openfst_io import write_fst
    from kaldi_tpu.tree.context_dep import ContextDependency
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        b = iof.init_input_stream(f)
        n = iof.read_int32(f, b)
        old_info = [tuple(iof.read_int_vector(f, b)) for _ in range(n)]
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      po.get_arg(2))
    tm = _read_tm(po.get_arg(3))
    P = tree.central_position()

    def signature(entry):
        if not entry or (len(entry) == 1 and entry[0] <= 0):
            return ("special", entry)
        window = list(entry)
        phone = window[P] if len(window) > P else window[-1]
        if phone <= 0 or phone not in tm.topo.phone2idx:
            # disambig / padded edge windows stay distinct
            return ("special", entry)
        pcs = tm.topo.num_pdf_classes(phone)
        # pad the window to the NEW tree's width around its center
        Nn = tree.context_width()
        if len(window) != Nn:
            c = window.index(phone) if phone in window else P
            padded = [0] * Nn
            for k in range(Nn):
                src = c - P + k
                padded[k] = window[src] if 0 <= src < len(window) else 0
            window = padded
        return (phone,) + tuple(tree.compute(window, pc)
                                for pc in range(pcs))

    sig_to_new: Dict = {}
    new_info: List[Tuple[int, ...]] = []
    old2new = []
    for i, entry in enumerate(old_info):
        sig = (("eps",) if i == 0 else signature(entry))
        if i == 0:
            old2new.append(0)
            if not new_info:
                new_info.append(())
            continue
        if sig not in sig_to_new:
            sig_to_new[sig] = len(new_info)
            new_info.append(entry)
        old2new.append(sig_to_new[sig])
    with kaldi_io.output_stream(po.get_arg(4)) as f:
        iof.init_output_stream(f, True)
        iof.write_int32(f, True, len(new_info))
        for entry in new_info:
            iof.write_int_vector(f, True, list(entry))
    if old2new_wx[0]:
        kaldi_io.write_kaldi_object(
            lambda st, b_: iof.write_int_vector(st, b_, old2new),
            old2new_wx[0], binary[0])
    # mapping FST: single state, old ilabel -> new ilabel
    fst = VectorFst(TropicalWeight)
    s = fst.add_state()
    fst.set_start(s)
    fst.set_final(s, 0.0)
    for i, j in enumerate(old2new):
        if i == 0:
            continue
        fst.add_arc(s, Arc(j, i, 0.0, s))
    import sys as _sys
    if po.num_args() >= 5 and po.get_arg(5) != "-":
        with open(po.get_arg(5), "wb") as f:
            write_fst(f, fst)
    else:
        write_fst(_sys.stdout.buffer, fst)
    log(f"ilabel transducer: {len(old_info)} -> {len(new_info)} "
        "labels")
    return 0


def compile_train_graphs_without_lexicon(argv: List[str]) -> int:
    po = ParseOptions(
        "Compile training graphs directly from phone transcripts "
        "(no lexicon; compile-train-graphs-without-lexicon semantics "
        "for e2e/tree-free setups): each transcript is a phone "
        "sequence, compiled through the H-level expansion.\n"
        "Usage: compile-train-graphs-without-lexicon [options] "
        "<tree-in> <model-in> <phone-transcript-rspecifier> "
        "<graphs-wspecifier>")
    transition_scale = po.register_value(
        "transition-scale", 1.0, "Scale on transition probabilities")
    self_loop_scale = po.register_value(
        "self-loop-scale", 1.0, "Scale on self-loop probabilities")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.decoder.graph import make_linear_word_acceptor
    from kaldi_tpu.hmm.hmm_utils import expand_hmm
    from kaldi_tpu.tree.context_dep import ContextDependency
    tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                      po.get_arg(1))
    tm = _read_tm(po.get_arg(2))
    writer = TableWriter("fst", po.get_arg(4))
    n = err = 0
    for key, phones in SequentialTableReader("int-vector",
                                             po.get_arg(3)):
        try:
            pfst = make_linear_word_acceptor([int(p) for p in phones])
            ilabel_info = None
            if tree.context_width() != 1:
                from kaldi_tpu.fstext.context import context_expand
                pfst, ilabel_info = context_expand(
                    pfst, tree.context_width(),
                    tree.central_position())
            g = expand_hmm(pfst, tm, tree, transition_scale[0],
                           self_loop_scale[0],
                           ilabel_info=ilabel_info)
            if g.num_states == 0:
                raise ValueError("empty graph")
        except Exception as e:
            warn(f"graph compilation failed for {key}: {e}")
            err += 1
            continue
        writer.write(key, g)
        n += 1
    writer.close()
    log(f"compiled {n} lexicon-free graphs ({err} failed)")
    return 0 if n else 1
