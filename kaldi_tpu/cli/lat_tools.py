"""latbin-equivalent CLIs: lattice-best-path, lattice-scale,
lattice-prune, lattice-add-penalty, lattice-determinize,
lattice-to-nbest, nbest-to-linear, lattice-1best, lattice-copy,
lattice-to-post."""

from __future__ import annotations

import sys
from typing import List

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.lat.functions import (add_word_ins_penalty,
                                     determinize_lattice, lattice_best_path,
                                     lattice_forward_backward_post,
                                     lattice_nbest, lattice_prune,
                                     lattice_scale)
from kaldi_tpu.lat.kaldi_lattice import Lattice, LatticeHolder
from kaldi_tpu.fstext.fst import EPS, Arc, LatticeWeight, VectorFst
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import SequentialTableReader, TableWriter


def _each(rspec, wspec, fn, name):
    reader = SequentialTableReader(LatticeHolder(), rspec)
    writer = TableWriter(LatticeHolder(), wspec)
    n = 0
    for key, lat in reader:
        out = fn(key, lat)
        if out is not None:
            writer.write(key, out)
            n += 1
    writer.close()
    log(f"{name}: processed {n} lattices")
    return 0 if n else 1


def lattice_copy(argv: List[str]) -> int:
    po = ParseOptions("Copy lattices (e.g. useful for changing to text mode)\n"
                      "Usage: lattice-copy [options] <lattice-rspecifier> <lattice-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    return _each(po.get_arg(1), po.get_arg(2), lambda k, l: l, "lattice-copy")


def lattice_scale_cli(argv: List[str]) -> int:
    po = ParseOptions("Apply scaling to lattice weights\n"
                      "Usage: lattice-scale [options] <lattice-rspecifier> <lattice-wspecifier>")
    lm_scale = po.register_value("lm-scale", 1.0, "Scaling factor for graph/lm costs")
    acoustic_scale = po.register_value("acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    inv_acoustic_scale = po.register_value("inv-acoustic-scale", 1.0, "An alternative way of setting the acoustic scale: you can set its inverse")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    ac = acoustic_scale[0]
    if inv_acoustic_scale[0] != 1.0:
        ac = 1.0 / inv_acoustic_scale[0]
    return _each(po.get_arg(1), po.get_arg(2),
                 lambda k, l: lattice_scale(l, lm_scale[0], ac),
                 "lattice-scale")


def lattice_add_penalty(argv: List[str]) -> int:
    po = ParseOptions("Add word insertion penalty to the lattice.\n"
                      "Usage: lattice-add-penalty [options] <lattice-rspecifier> <lattice-wspecifier>")
    word_ins_penalty = po.register_value("word-ins-penalty", 0.0, "Word insertion penalty")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    return _each(po.get_arg(1), po.get_arg(2),
                 lambda k, l: add_word_ins_penalty(l, word_ins_penalty[0]),
                 "lattice-add-penalty")


def lattice_prune_cli(argv: List[str]) -> int:
    po = ParseOptions("Prune lattices, keeping only best paths within beam\n"
                      "Usage: lattice-prune [options] <lattice-rspecifier> <lattice-wspecifier>")
    beam = po.register_value("beam", 4.0, "Pruning beam [applied after acoustic scaling]")
    acoustic_scale = po.register_value("acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    if acoustic_scale[0] == 0.0:
        print("lattice-prune: --acoustic-scale must be nonzero "
              "(the inverse rescale is undefined)", file=sys.stderr)
        return 1

    def fn(k, lat):
        scaled = lattice_scale(lat, 1.0, acoustic_scale[0])
        pruned = lattice_prune(scaled, beam[0])
        return lattice_scale(pruned, 1.0, 1.0 / acoustic_scale[0])
    return _each(po.get_arg(1), po.get_arg(2), fn, "lattice-prune")


def lattice_determinize_cli(argv: List[str]) -> int:
    po = ParseOptions("Determinize lattices, keeping only the best path (sequence of acoustic states) for each input-symbol sequence.\n"
                      "Usage: lattice-determinize [options] <lattice-rspecifier> <lattice-wspecifier>")
    po.register_value("acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    return _each(po.get_arg(1), po.get_arg(2),
                 lambda k, l: determinize_lattice(l), "lattice-determinize")


def lattice_determinize_pruned_cli(argv: List[str]) -> int:
    po = ParseOptions(
        "Determinize lattices, keeping only the best path for each word "
        "sequence, with interleaved beam pruning (bounded memory; "
        "parity: latbin/lattice-determinize-pruned.cc).\n"
        "Usage: lattice-determinize-pruned [options] "
        "<lattice-rspecifier> <lattice-wspecifier>")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    beam = po.register_value("beam", 10.0,
                             "Pruning beam [applied after scaling]")
    max_states = po.register_value(
        "max-states", 50000,
        "Maximum states per determinized lattice (backoff shrinks the "
        "beam when exceeded, like --max-mem in the reference)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    if acoustic_scale[0] == 0.0:
        print("lattice-determinize-pruned: --acoustic-scale must be "
              "nonzero (the inverse rescale is undefined)",
              file=sys.stderr)
        return 1

    def fn(k, lat):
        from kaldi_tpu.lat.functions import determinize_lattice_pruned
        scaled = lattice_scale(lat, 1.0, acoustic_scale[0])
        det = determinize_lattice_pruned(scaled, beam=beam[0],
                                         max_states=max_states[0])
        return lattice_scale(det, 1.0, 1.0 / acoustic_scale[0])
    return _each(po.get_arg(1), po.get_arg(2), fn,
                 "lattice-determinize-pruned")


def lattice_best_path_cli(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate 1-best path through lattices; output as transcriptions and alignments\n"
        "Usage: lattice-best-path [options] <lattice-rspecifier> "
        "[<transcriptions-wspecifier> [<alignments-wspecifier>]]")
    lm_scale = po.register_value("lm-scale", 1.0, "Scaling factor for graph/lm costs")
    acoustic_scale = po.register_value("acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    word_symbol_table = po.register_value("word-symbol-table", "", "Symbol table for words [for debug output]")
    po.read(argv)
    if po.num_args() < 1:
        po.print_usage()
        return 1
    words_writer = (TableWriter("int-vector", po.get_arg(2))
                    if po.num_args() >= 2 else None)
    ali_writer = (TableWriter("int-vector", po.get_arg(3))
                  if po.num_args() >= 3 else None)
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        scaled = lattice_scale(lat, lm_scale[0], acoustic_scale[0])
        ali, words, cost = lattice_best_path(scaled)
        if words_writer:
            words_writer.write(key, words)
        if ali_writer:
            ali_writer.write(key, ali)
        n += 1
    if words_writer:
        words_writer.close()
    if ali_writer:
        ali_writer.close()
    log(f"found best paths for {n} lattices")
    return 0 if n else 1


def lattice_1best(argv: List[str]) -> int:
    po = ParseOptions(
        "Compute best path through lattices and write out AS lattices "
        "(one path per lattice; lattice-1best.cc — note this differs "
        "from lattice-best-path, which writes transcriptions).\n"
        "Usage: lattice-1best [options] <lattice-rspecifier> "
        "<lattice-wspecifier>")
    lm_scale = po.register_value("lm-scale", 1.0,
                                 "Scaling factor for graph/lm costs")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.lat.functions import lattice_best_path_lattice
    writer = TableWriter(LatticeHolder, po.get_arg(2))
    n = err = 0
    for key, lat in SequentialTableReader(LatticeHolder, po.get_arg(1)):
        scaled = lattice_scale(lat, lm_scale[0], acoustic_scale[0])
        best = lattice_best_path_lattice(scaled)
        if best is None:
            warn(f"no best path for {key}")
            err += 1
            continue
        writer.write(key, lattice_scale(
            best, 1.0 / lm_scale[0] if lm_scale[0] else 1.0,
            1.0 / acoustic_scale[0] if acoustic_scale[0] else 1.0))
        n += 1
    writer.close()
    log(f"found best paths for {n} lattices ({err} failed)")
    return 0 if n else 1


def lattice_to_nbest(argv: List[str]) -> int:
    po = ParseOptions(
        "Work out N-best paths in lattices and write out as FSTs\n"
        "Usage: lattice-to-nbest [options] <lattice-rspecifier> <nbest-wspecifier>")
    n_opt = po.register_value("n", 1, "Number of distinct paths")
    lm_scale = po.register_value("lm-scale", 1.0, "Scaling factor for graph/lm costs")
    acoustic_scale = po.register_value("acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter(LatticeHolder(), po.get_arg(2))
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        scaled = lattice_scale(lat, lm_scale[0], acoustic_scale[0])
        for i, (ali, words, cost) in enumerate(
                lattice_nbest(scaled, n_opt[0]), 1):
            linear = VectorFst(LatticeWeight)
            cur = linear.add_state()
            linear.set_start(cur)
            L = max(len(ali), len(words))
            for j in range(L):
                ns = linear.add_state()
                il = ali[j] if j < len(ali) else EPS
                ol = words[j] if j < len(words) else EPS
                w = (cost, 0.0) if j == 0 else (0.0, 0.0)
                linear.add_arc(cur, Arc(il, ol, w, ns))
                cur = ns
            linear.set_final(cur, (0.0, 0.0))
            writer.write(f"{key}-{i}", linear)
    writer.close()
    return 0


def nbest_to_linear(argv: List[str]) -> int:
    po = ParseOptions(
        "Takes as input lattices/n-bests which must be linear (single path);\n"
        "convert from lattice to up to 4 archives containing transcriptions, alignments,\n"
        "and acoustic and LM costs\n"
        "Usage: nbest-to-linear [options] <nbest-rspecifier> <alignments-wspecifier> "
        "[<transcriptions-wspecifier> [<lm-cost-wspecifier> [<ac-cost-wspecifier>]]]")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    ali_writer = TableWriter("int-vector", po.get_arg(2))
    words_writer = (TableWriter("int-vector", po.get_arg(3))
                    if po.num_args() >= 3 else None)
    lm_writer = (TableWriter("float", po.get_arg(4))
                 if po.num_args() >= 4 else None)
    ac_writer = (TableWriter("float", po.get_arg(5))
                 if po.num_args() >= 5 else None)
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        ali, words, cost = lattice_best_path(lat)
        ali_writer.write(key, ali)
        if words_writer:
            words_writer.write(key, words)
        # total lm/ac costs along best path
        if lm_writer or ac_writer:
            g = a = 0.0
            # recompute by walking arcs of the linear fst
            s = lat.start
            while s >= 0:
                if lat.finals[s] != LatticeWeight.zero:
                    g += lat.finals[s][0]
                    a += lat.finals[s][1]
                    break
                if not lat.arcs[s]:
                    break
                arc = lat.arcs[s][0]
                g += arc.weight[0]
                a += arc.weight[1]
                s = arc.nextstate
            if lm_writer:
                lm_writer.write(key, g)
            if ac_writer:
                ac_writer.write(key, a)
    ali_writer.close()
    for w in (words_writer, lm_writer, ac_writer):
        if w:
            w.close()
    return 0


def lattice_to_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Do forward-backward and collect posteriors over lattices.\n"
        "Usage: lattice-to-post [options] lats-rspecifier posts-wspecifier")
    acoustic_scale = po.register_value("acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter("posterior", po.get_arg(2))
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        post = lattice_forward_backward_post(lat, acoustic_scale[0])
        writer.write(key, post)
        n += 1
    writer.close()
    log(f"posteriors for {n} lattices")
    return 0


def lattice_align_words(argv: List[str]) -> int:
    po = ParseOptions(
        "Word-align lattices so each CompactLattice arc carries one "
        "word's transition-ids (lattice-align-words.cc; linear "
        "lattices — run lattice-1best/lattice-to-nbest first).\n"
        "Usage: lattice-align-words [options] <word-boundary-file> "
        "<model> <lattice-rspecifier> <lattice-wspecifier>\n"
        "   or (legacy 3-arg form): lattice-align-words [options] "
        "<model> <lattice-rspecifier> <ctm-wxfilename>  — best-path "
        "CTM output")
    frame_shift = po.register_value("frame-shift", 0.01, "Frame shift in seconds")
    silence_label = po.register_value(
        "silence-label", 0, "Word id to give to silence segments")
    partial_word_label = po.register_value(
        "partial-word-label", 0,
        "Word id for partial/broken word segments")
    po.read(argv)
    if po.num_args() == 4:
        from kaldi_tpu.cli.tail5_tools import _read_tm
        from kaldi_tpu.lat.kaldi_lattice import (CompactLatticeHolder,
                                                 LatticeHolder as _LH)
        from kaldi_tpu.lat.word_align import (WordBoundaryInfo,
                                              word_align_lattice)
        info = WordBoundaryInfo.from_file(
            po.get_arg(1), silence_label=silence_label[0],
            partial_word_label=partial_word_label[0])
        tm4 = _read_tm(po.get_arg(2))
        writer = TableWriter(CompactLatticeHolder(), po.get_arg(4))
        n = err = 0
        for key, lat in SequentialTableReader(_LH(), po.get_arg(3)):
            res = word_align_lattice(lat, tm4, info)
            if res is None:
                warn(f"word alignment failed for {key} (lattice not "
                     "linear)")
                err += 1
                continue
            clat, ok = res
            if not ok:
                warn(f"{key}: partial/forced word alignment")
            writer.write(key, clat)
            n += 1
        writer.close()
        log(f"word-aligned {n} lattices ({err} failed)")
        return 0 if n else 1
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.lat.word_align import format_ctm, lattice_to_ctm
    tm, _am = read_am_gmm(po.get_arg(1))
    import sys as _sys
    out = (_sys.stdout if po.get_arg(3) == "-"
           else open(po.get_arg(3), "w"))
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder, po.get_arg(2)):
        entries = lattice_to_ctm(lat, tm, key, frame_shift=frame_shift[0])
        out.write(format_ctm(entries))
        n += 1
    if out is not _sys.stdout:
        out.close()
    log(f"aligned {n} lattices")
    return 0 if n else 1


def lattice_rmali(argv: List[str]) -> int:
    po = ParseOptions(
        "Remove (zero out) the alignments from lattices\n"
        "Usage: lattice-rmali <lattice-rspecifier> <lattice-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter(LatticeHolder, po.get_arg(2))
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder, po.get_arg(1)):
        for s in range(lat.num_states):
            for a in lat.arcs[s]:
                a.ilabel = 0
        writer.write(key, lat)
        n += 1
    writer.close()
    return 0 if n else 1


# ---------------------------------------------------------------------------
# ConstArpaLm rescoring family (parity: lmbin/arpa-to-const-arpa.cc,
# latbin/lattice-lmrescore-const-arpa.cc, lattice-lmrescore-pruned.cc)

def arpa_to_const_arpa(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert an ARPA format language model into ConstArpaLm format.\n"
        "Usage: arpa-to-const-arpa [opts] <arpa-rxfilename> "
        "<const-arpa-wxfilename>")
    bos = po.register_value("bos-symbol", -1,
                            "Symbol id for <s> (integer-word ARPA)")
    eos = po.register_value("eos-symbol", -1,
                            "Symbol id for </s> (integer-word ARPA)")
    unk = po.register_value("unk-symbol", -1, "Symbol id for <unk>")
    symtab = po.register_value("read-symbol-table", "",
                               "words.txt mapping word strings to ids "
                               "(for string-word ARPA)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.lm.const_arpa import ConstArpaLm
    symbols = None
    if symtab[0]:
        symbols = {}
        with open(symtab[0]) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    symbols[parts[0]] = int(parts[1])
    lm = ConstArpaLm.build_from_arpa(po.get_arg(1), symbols=symbols)
    if int(bos[0]) >= 0:
        lm.bos_id = int(bos[0])
    if int(eos[0]) >= 0:
        lm.eos_id = int(eos[0])
    if int(unk[0]) >= 0:
        lm.unk_id = int(unk[0])
    if lm.bos_id < 0 or lm.eos_id < 0:
        warn("bos/eos ids unresolved; pass --bos-symbol/--eos-symbol "
             "or --read-symbol-table")
    lm.write(po.get_arg(2))
    log(f"wrote ConstArpaLm order {lm.order}, ngrams {lm.num_ngrams}")
    return 0


def lattice_lmrescore_const_arpa(argv: List[str]) -> int:
    po = ParseOptions(
        "Adds lm_scale * [cost of best path through ConstArpaLm] to "
        "graph costs.\n"
        "Usage: lattice-lmrescore-const-arpa [options] "
        "<lattice-rspecifier> <const-arpa-rxfilename> "
        "<lattice-wspecifier>")
    lm_scale = po.register_value("lm-scale", 1.0,
                                 "Scaling factor for LM costs")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.lm.const_arpa import ConstArpaLm
    from kaldi_tpu.lm.rescore import lattice_lmrescore
    lm = ConstArpaLm.read(po.get_arg(2))
    return _each(po.get_arg(1), po.get_arg(3),
                 lambda k, lat: lattice_lmrescore(lat, lm, lm_scale[0]),
                 "lattice-lmrescore-const-arpa")


def lattice_lmrescore_pruned_cli(argv: List[str]) -> int:
    po = ParseOptions(
        "Replace LM scores with a big LM using pruned composition: "
        "subtract the old (small) ARPA G exactly, add the new "
        "ConstArpaLm within a compose beam.\n"
        "Usage: lattice-lmrescore-pruned [options] <lattice-rspecifier> "
        "<old-arpa-rxfilename> <words-txt> <const-arpa-rxfilename> "
        "<lattice-wspecifier>")
    lm_scale = po.register_value("lm-scale", 1.0,
                                 "Scale for the LM being added")
    beam = po.register_value("compose-beam", 6.0,
                             "Pruning beam of the composed output")
    max_arcs = po.register_value("max-arcs", 100000,
                                 "Arc budget per lattice")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.lat.compose_pruned import compose_lattice_pruned
    from kaldi_tpu.lm.arpa import parse_arpa
    from kaldi_tpu.lm.const_arpa import ConstArpaLm
    from kaldi_tpu.lm.rescore import DeterministicLm, lattice_lmrescore
    from kaldi_tpu.util import kaldi_io
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        old = parse_arpa(f.read().decode("utf-8"))
    names = {}
    with open(po.get_arg(3)) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                names[int(parts[1])] = parts[0]
    old_det = DeterministicLm(old, names)
    new_lm = ConstArpaLm.read(po.get_arg(4))

    def fn(key, lat):
        sub = lattice_lmrescore(lat, old_det, -lm_scale[0])
        return compose_lattice_pruned(sub, new_lm, lm_scale[0],
                                      beam=beam[0],
                                      max_arcs=int(max_arcs[0]))

    return _each(po.get_arg(1), po.get_arg(5), fn,
                 "lattice-lmrescore-pruned")
