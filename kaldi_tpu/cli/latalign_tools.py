"""Lattice alignment / manipulation tail (parity: src/latbin
lattice-align-phones.cc (phone-align-lattice.h),
lattice-align-words-lexicon.cc (word-align-lattice-lexicon.h),
nbest-to-prons.cc, lattice-difference.cc, lattice-expand.cc
(lattice-functions.cc:1115 ExpandCompactLattice),
lattice-path-cover.cc, lattice-determinize-non-compact.cc).

The word/phone aligners are exact for LINEAR (single-path) lattices —
the nbest/ctm pipelines' form (`lattice-1best | lattice-align-words`);
branching inputs are reported as alignment failures."""

from __future__ import annotations

import math
from typing import List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def _clat_holder():
    from kaldi_tpu.lat.kaldi_lattice import CompactLatticeHolder
    return CompactLatticeHolder()


def _lat_holder():
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    return LatticeHolder()


def lattice_align_phones(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert lattices so that each CompactLattice arc carries "
        "exactly one phone's transition-ids "
        "(lattice-align-phones.cc; linear lattices).\n"
        "Usage: lattice-align-phones [options] <model> "
        "<lattice-rspecifier> <lattice-wspecifier>")
    replace = po.register_value(
        "replace-output-symbols", False,
        "If true, arc labels become phone ids instead of words")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.lat.word_align import phone_align_lattice
    tm = _read_tm(po.get_arg(1))
    writer = TableWriter(_clat_holder(), po.get_arg(3))
    n = err = 0
    for key, lat in SequentialTableReader(_lat_holder(),
                                          po.get_arg(2)):
        clat = phone_align_lattice(lat, tm,
                                   replace_output_symbols=replace[0])
        if clat is None:
            warn(f"phone alignment failed for {key} (lattice not "
                 "linear; run lattice-1best / lattice-to-nbest first)")
            err += 1
            continue
        writer.write(key, clat)
        n += 1
    writer.close()
    log(f"phone-aligned {n} lattices ({err} failed)")
    return 0 if n else 1


def lattice_align_words_lexicon(argv: List[str]) -> int:
    po = ParseOptions(
        "Word-align lattices using an integer align-lexicon: each "
        "line `word-in word-out phone1 ... phoneN`; entries with "
        "word-in 0 are optional (silence) and may be inserted freely "
        "(lattice-align-words-lexicon.cc; linear lattices).\n"
        "Usage: lattice-align-words-lexicon [options] <lexicon-file> "
        "<model> <lattice-rspecifier> <lattice-wspecifier>")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.lat.word_align import word_align_lattice_lexicon
    lexicon = []
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        for raw in f.read().decode().splitlines():
            parts = [int(x) for x in raw.split()]
            if len(parts) >= 2:
                lexicon.append((parts[0], parts[1], tuple(parts[2:])))
    tm = _read_tm(po.get_arg(2))
    writer = TableWriter(_clat_holder(), po.get_arg(4))
    n = err = 0
    for key, lat in SequentialTableReader(_lat_holder(),
                                          po.get_arg(3)):
        clat = word_align_lattice_lexicon(lat, tm, lexicon)
        if clat is None:
            warn(f"lexicon word alignment failed for {key}")
            err += 1
            continue
        writer.write(key, clat)
        n += 1
    writer.close()
    log(f"word-aligned {n} lattices via lexicon ({err} failed)")
    return 0 if n else 1


def nbest_to_prons(argv: List[str]) -> int:
    po = ParseOptions(
        "From word-aligned LINEAR CompactLattices (see "
        "lattice-align-words*), write per-word pronunciations: "
        "lines `<utt> <begin-frame> <num-frames> <word> "
        "<phone1> ... <phoneN>` (nbest-to-prons.cc).\n"
        "Usage: nbest-to-prons [options] <model> "
        "<aligned-linear-lattice-rspecifier> <output-wxfilename>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    tm = _read_tm(po.get_arg(1))
    import sys as _sys
    out = (_sys.stdout if po.get_arg(3) == "-"
           else open(po.get_arg(3), "w"))
    n = err = 0
    for key, clat in SequentialTableReader(_clat_holder(),
                                           po.get_arg(2)):
        # walk the linear compact lattice
        s = clat.start
        t = 0
        lines = []
        ok = True
        while ok:
            arcs = clat.arcs[s]
            if not arcs:
                break
            if len(arcs) != 1:
                ok = False
                break
            a = arcs[0]
            _lw, tids = a.weight
            phones = []
            for tid in tids or ():
                if (tm.transition_id_to_hmm_state(tid) == 0
                        and not tm.is_self_loop(tid)) or not phones:
                    phones.append(tm.transition_id_to_phone(tid))
            nf = len(tids or ())
            lines.append(f"{key} {t} {nf} {a.ilabel} "
                         + " ".join(str(p) for p in phones))
            t += nf
            s = a.nextstate
        if not ok:
            warn(f"{key}: lattice not linear")
            err += 1
            continue
        out.write("\n".join(lines) + ("\n" if lines else ""))
        n += 1
    if out is not _sys.stdout:
        out.close()
    log(f"wrote prons for {n} utterances ({err} failed)")
    return 0 if n else 1


def _word_seq_dfa(lat):
    """Subset-construction DFA over a lattice's word sequences
    (epsilon-olabels skipped). Returns (transitions dict
    {(state, word): state}, accepting set, start)."""
    from kaldi_tpu.fstext.fst import LatticeWeight

    def eps_closure(states):
        stack = list(states)
        seen = set(states)
        while stack:
            s = stack.pop()
            for a in lat.arcs[s]:
                if a.olabel == 0 and a.nextstate not in seen:
                    seen.add(a.nextstate)
                    stack.append(a.nextstate)
        return frozenset(seen)

    start = eps_closure({lat.start})
    trans = {}
    accepting = set()
    ids = {start: 0}
    stack = [start]
    while stack:
        cur = stack.pop()
        cid = ids[cur]
        if any(lat.finals[s] != LatticeWeight.zero for s in cur):
            accepting.add(cid)
        by_word = {}
        for s in cur:
            for a in lat.arcs[s]:
                if a.olabel != 0:
                    by_word.setdefault(a.olabel, set()).add(a.nextstate)
        for w, nxt in by_word.items():
            tgt = eps_closure(nxt)
            if tgt not in ids:
                ids[tgt] = len(ids)
                stack.append(tgt)
            trans[(cid, w)] = ids[tgt]
    return trans, accepting, 0


def lattice_difference(argv: List[str]) -> int:
    po = ParseOptions(
        "Remove from each lattice in the first archive every path "
        "whose word sequence appears in the matching second-archive "
        "lattice (lattice-difference.cc; MCE denominators).\n"
        "Usage: lattice-difference [options] <lattice1-rspecifier> "
        "<lattice2-rspecifier> <lattice-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
    from kaldi_tpu.fstext.ops import connect
    sub_reader = RandomAccessTableReader(_lat_holder(), po.get_arg(2))
    writer = TableWriter(_lat_holder(), po.get_arg(3))
    n = empty = 0
    for key, lat in SequentialTableReader(_lat_holder(),
                                          po.get_arg(1)):
        if key not in sub_reader:
            writer.write(key, lat)
            n += 1
            continue
        trans, accepting, dfa0 = _word_seq_dfa(sub_reader[key])
        DEAD = -1
        # product: (lat state, dfa state); paths accepted by the DFA
        # lose finality
        out = VectorFst(LatticeWeight)
        ids = {(lat.start, dfa0): out.add_state()}
        out.set_start(0)
        stack = [(lat.start, dfa0)]
        while stack:
            s, q = stack.pop()
            sid = ids[(s, q)]
            if lat.finals[s] != LatticeWeight.zero and \
                    (q == DEAD or q not in accepting):
                out.finals[sid] = lat.finals[s]
            for a in lat.arcs[s]:
                if a.olabel == 0 or q == DEAD:
                    q2 = q
                else:
                    q2 = trans.get((q, a.olabel), DEAD)
                tgt = (a.nextstate, q2)
                if tgt not in ids:
                    ids[tgt] = out.add_state()
                    stack.append(tgt)
                out.add_arc(sid, Arc(a.ilabel, a.olabel, a.weight,
                                     ids[tgt]))
        out = connect(out)
        if out.num_states == 0 or out.start < 0:
            warn(f"{key}: difference is empty, not writing")
            empty += 1
            continue
        writer.write(key, out)
        n += 1
    writer.close()
    log(f"computed difference for {n} lattices ({empty} empty)")
    return 0 if n else 1


def lattice_expand(argv: List[str]) -> int:
    po = ParseOptions(
        "Expand lattices so that arcs with posterior above --epsilon "
        "have unique histories (lattice-functions.cc:1115 "
        "ExpandCompactLattice; used before NN LM rescoring).\n"
        "Usage: lattice-expand [options] <lattice-rspecifier> "
        "<lattice-wspecifier>")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    epsilon = po.register_value(
        "epsilon", 0.1, "Posterior threshold above which arcs get "
        "unique histories")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    if not (0 < epsilon[0] <= 1):
        print("lattice-expand: --epsilon must be in (0, 1]",
              flush=True)
        return 1
    from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
    from kaldi_tpu.lat.functions import _topsort

    def logadd(a, b):
        if a < b:
            a, b = b, a
        if b == -math.inf:
            return a
        return a + math.log1p(math.exp(b - a))

    writer = TableWriter(_lat_holder(), po.get_arg(2))
    n = 0
    stats_in = stats_out = 0
    for key, lat in SequentialTableReader(_lat_holder(),
                                          po.get_arg(1)):
        scale = acoustic_scale[0]
        order = _topsort(lat)
        NEG = -math.inf
        beta = [NEG] * lat.num_states
        for s in reversed(order):
            if lat.finals[s] != LatticeWeight.zero:
                beta[s] = -(lat.finals[s][0]
                            + scale * lat.finals[s][1])
            for a in lat.arcs[s]:
                like = -(a.weight[0] + scale * a.weight[1])
                beta[s] = logadd(beta[s], like + beta[a.nextstate])
        tot = beta[lat.start]
        out = VectorFst(LatticeWeight)
        start = out.add_state()
        out.set_start(start)
        alpha = [0.0]
        state_map = {(lat.start, start): start}
        shared = {}   # orig -> copy for low-posterior targets
        queue = [(lat.start, start)]
        while queue:
            s1, s2 = queue.pop(0)
            if lat.finals[s1] != LatticeWeight.zero:
                out.finals[s2] = lat.finals[s1]
            for a in lat.arcs[s1]:
                like = -(a.weight[0] + scale * a.weight[1])
                this_alpha = alpha[s2] + like
                post = math.exp(min(this_alpha
                                    + beta[a.nextstate] - tot, 0.0))
                if post > epsilon[0]:
                    copy = out.add_state()
                    state_map[(a.nextstate, copy)] = copy
                    queue.append((a.nextstate, copy))
                else:
                    if a.nextstate in shared:
                        copy = shared[a.nextstate]
                    else:
                        copy = out.add_state()
                        shared[a.nextstate] = copy
                        state_map[(a.nextstate, copy)] = copy
                        queue.append((a.nextstate, copy))
                out.add_arc(s2, Arc(a.ilabel, a.olabel, a.weight,
                                    copy))
                while len(alpha) <= copy:
                    alpha.append(NEG)
                alpha[copy] = logadd(alpha[copy], this_alpha)
        writer.write(key, out)
        stats_in += lat.num_states
        stats_out += out.num_states
        n += 1
    writer.close()
    log(f"expanded {n} lattices: {stats_in} -> {stats_out} states")
    return 0 if n else 1


def lattice_path_cover(argv: List[str]) -> int:
    po = ParseOptions(
        "Minimal set of paths covering every lattice arc, each the "
        "best path through at least one arc; writes transcriptions, "
        "state sequences and costs keyed <utt>-<i> "
        "(lattice-path-cover.cc; NN LM rescoring helper).\n"
        "Usage: lattice-path-cover [options] <lattice-rspecifier> "
        "[<transcriptions-wspecifier> [<states-wspecifier> "
        "[<path-costs-wspecifier>]]]")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    lm_scale = po.register_value(
        "lm-scale", 1.0, "Scaling factor for graph/lm costs")
    po.read(argv)
    if po.num_args() < 1 or po.num_args() > 4:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.fst import LatticeWeight
    from kaldi_tpu.lat.functions import _topsort
    trans_writer = (TableWriter("int-vector", po.get_arg(2))
                    if po.num_args() >= 2 else None)
    state_writer = (TableWriter("int-vector", po.get_arg(3))
                    if po.num_args() >= 3 else None)
    cost_writer = (TableWriter("float", po.get_arg(4))
                   if po.num_args() >= 4 else None)
    n = 0
    for key, lat in SequentialTableReader(_lat_holder(),
                                          po.get_arg(1)):
        def cost_of(w):
            return lm_scale[0] * w[0] + acoustic_scale[0] * w[1]

        order = _topsort(lat)
        INF = math.inf
        ns = lat.num_states
        fwd = [INF] * ns
        pred = [None] * ns
        fwd[lat.start] = 0.0
        for s in order:
            for a in lat.arcs[s]:
                c = fwd[s] + cost_of(a.weight)
                if c < fwd[a.nextstate]:
                    fwd[a.nextstate] = c
                    pred[a.nextstate] = (s, a)
        bwd = [INF] * ns
        succ = [None] * ns
        for s in reversed(order):
            if lat.finals[s] != LatticeWeight.zero:
                bwd[s] = cost_of(lat.finals[s])
            for a in lat.arcs[s]:
                c = cost_of(a.weight) + bwd[a.nextstate]
                if c < bwd[s]:
                    bwd[s] = c
                    succ[s] = a
        paths = {}
        for s in order:
            for a in lat.arcs[s]:
                total = fwd[s] + cost_of(a.weight) + bwd[a.nextstate]
                if not math.isfinite(total):
                    continue
                # best path through this arc
                states = [s]
                cur = s
                while pred[cur] is not None:
                    cur = pred[cur][0]
                    states.append(cur)
                states.reverse()
                words = []
                cur = lat.start
                arcs_seq = []
                # rebuild forward arc seq from pred chain
                chain = []
                cur = s
                while pred[cur] is not None:
                    p, pa = pred[cur]
                    chain.append(pa)
                    cur = p
                chain.reverse()
                arcs_seq = chain + [a]
                cur = a.nextstate
                st_seq = states + [a.nextstate]
                while succ[cur] is not None:
                    arcs_seq.append(succ[cur])
                    cur = succ[cur].nextstate
                    st_seq.append(cur)
                words = [x.olabel for x in arcs_seq if x.olabel != 0]
                sig = tuple(st_seq)
                if sig not in paths:
                    paths[sig] = (total, words)
        ordered = sorted(paths.items(), key=lambda kv: kv[1][0])
        for i, (sig, (total, words)) in enumerate(ordered):
            cur_key = f"{key}-{i + 1}"
            if trans_writer:
                trans_writer.write(cur_key,
                                   np.asarray(words, np.int32))
            if state_writer:
                state_writer.write(cur_key,
                                   np.asarray(sig, np.int32))
            if cost_writer:
                cost_writer.write(cur_key, float(total))
        n += 1
    for w in (trans_writer, state_writer, cost_writer):
        if w is not None:
            w.close()
    log(f"computed path covers for {n} lattices")
    return 0 if n else 1


def lattice_determinize_non_compact(argv: List[str]) -> int:
    po = ParseOptions(
        "Determinize lattices with pruning, writing the result as a "
        "normal (non-compact) lattice with alignments kept on arc "
        "chains (lattice-determinize-non-compact.cc; this "
        "framework's lattices are stored in expanded form, so the "
        "output container matches the reference's contract "
        "directly).\n"
        "Usage: lattice-determinize-non-compact [options] "
        "<lattice-rspecifier> <lattice-wspecifier>")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    beam = po.register_value("beam", 10.0, "Pruning beam")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    if acoustic_scale[0] == 0.0:
        print("lattice-determinize-non-compact: --acoustic-scale "
              "must be nonzero", flush=True)
        return 1
    from kaldi_tpu.lat.functions import (determinize_lattice_pruned,
                                         lattice_scale)
    writer = TableWriter(_lat_holder(), po.get_arg(2))
    n = 0
    for key, lat in SequentialTableReader(_lat_holder(),
                                          po.get_arg(1)):
        scaled = lattice_scale(lat, 1.0, acoustic_scale[0])
        det = determinize_lattice_pruned(scaled, beam=beam[0])
        writer.write(key, lattice_scale(det, 1.0,
                                        1.0 / acoustic_scale[0]))
        n += 1
    writer.close()
    log(f"determinized {n} lattices (non-compact)")
    return 0 if n else 1
