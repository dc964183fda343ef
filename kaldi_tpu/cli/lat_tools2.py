"""latbin tail, round 2: lattice-union, lattice-reverse,
lattice-project, lattice-to-fst, lattice-depth-per-frame,
lattice-arc-post, lattice-confidence, lattice-equivalent,
lattice-limit-depth, lattice-to-phone-lattice, lattice-boost-ali,
linear-to-nbest, nbest-to-ctm (parity with the same-named
src/latbin/*.cc tools)."""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError, log, warn
from kaldi_tpu.fstext.fst import EPS, Arc, LatticeWeight, TropicalWeight, \
    VectorFst
from kaldi_tpu.lat.functions import (_forward_backward_costs, _topsort,
                                     lattice_best_path, lattice_nbest,
                                     lattice_scale, lattice_state_times)
from kaldi_tpu.lat.kaldi_lattice import Lattice, LatticeHolder
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

INF = float("inf")


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


# -- structural transforms -------------------------------------------------

def lattice_union_op(a: Lattice, b: Lattice) -> Lattice:
    out = VectorFst(LatticeWeight)
    start = out.add_state()
    out.set_start(start)
    for src in (a, b):
        if src.num_states == 0 or src.start is None:
            continue
        off = out.num_states
        for _ in range(src.num_states):
            out.add_state()
        for s in range(src.num_states):
            for arc in src.arcs[s]:
                out.add_arc(off + s, Arc(arc.ilabel, arc.olabel,
                                         arc.weight, off + arc.nextstate))
            if src.finals[s] != LatticeWeight.zero:
                out.finals[off + s] = src.finals[s]
        out.add_arc(start, Arc(EPS, EPS, (0.0, 0.0), off + src.start))
    return out


def lattice_reverse_op(lat: Lattice) -> Lattice:
    """Arcs reversed; finals become start-arcs and vice versa
    (latbin/lattice-reverse.cc semantics for sMBR-style backward
    passes)."""
    out = VectorFst(LatticeWeight)
    for _ in range(lat.num_states + 1):
        out.add_state()
    super_start = lat.num_states
    out.set_start(super_start)
    for s in range(lat.num_states):
        for a in lat.arcs[s]:
            out.add_arc(a.nextstate, Arc(a.ilabel, a.olabel, a.weight, s))
        if lat.finals[s] != LatticeWeight.zero:
            out.add_arc(super_start, Arc(EPS, EPS, lat.finals[s], s))
    out.finals[lat.start] = (0.0, 0.0)
    return out


def lattice_union(argv: List[str]) -> int:
    po = ParseOptions(
        "Takes two archives of lattices (for the same utterances) and "
        "outputs their unions.\n"
        "Usage: lattice-union [options] <lattice-rspecifier1> "
        "<lattice-rspecifier2> <lattice-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    second = RandomAccessTableReader(LatticeHolder(), po.get_arg(2))

    def fn(key, lat):
        if second.has_key(key):
            return lattice_union_op(lat, second[key])
        warn(f"lattice-union: no second lattice for {key}")
        return lat

    return _each(po.get_arg(1), po.get_arg(3), fn, "lattice-union")


def lattice_reverse(argv: List[str]) -> int:
    po = ParseOptions("Reverse a lattice in order to rescore the lattice "
                      "with a RNNLM trained reversed.\n"
                      "Usage: lattice-reverse <lattice-rspecifier> "
                      "<lattice-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    return _each(po.get_arg(1), po.get_arg(2),
                 lambda k, lat: lattice_reverse_op(lat),
                 "lattice-reverse")


def lattice_project(argv: List[str]) -> int:
    po = ParseOptions(
        "Project lattices (in their transducer form); by default "
        "project on output (words).\n"
        "Usage: lattice-project <lattice-rspecifier> <lattice-wspecifier>")
    project_output = po.register_value("project-output", True,
                                       "Project on output (words)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1

    def fn(key, lat):
        out = VectorFst(LatticeWeight)
        for _ in range(lat.num_states):
            out.add_state()
        out.set_start(lat.start)
        for s in range(lat.num_states):
            for a in lat.arcs[s]:
                lab = a.olabel if project_output[0] else a.ilabel
                out.add_arc(s, Arc(lab, lab, a.weight, a.nextstate))
            out.finals[s] = lat.finals[s]
        return out

    return _each(po.get_arg(1), po.get_arg(2), fn, "lattice-project")


def lattice_to_fst_cli(argv: List[str]) -> int:
    po = ParseOptions(
        "Turn lattices into normal FSTs, retaining only the word labels.\n"
        "Usage: lattice-to-fst [options] <lattice-rspecifier> "
        "<fsts-wspecifier>")
    lm_scale = po.register_value("lm-scale", 0.0, "LM scale to apply")
    acoustic_scale = po.register_value("acoustic-scale", 0.0,
                                       "Acoustic scale to apply")
    rm_eps = po.register_value("rm-eps", True, "Remove epsilons")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.ops import rm_epsilon
    writer = TableWriter(VectorFst, po.get_arg(2))
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        scaled = lattice_scale(lat, lm_scale[0], acoustic_scale[0])
        out = VectorFst(TropicalWeight)
        for _ in range(scaled.num_states):
            out.add_state()
        out.set_start(scaled.start)
        for s in range(scaled.num_states):
            for a in scaled.arcs[s]:
                g, ac = a.weight
                out.add_arc(s, Arc(a.olabel, a.olabel, g + ac,
                                   a.nextstate))
            if scaled.finals[s] != LatticeWeight.zero:
                g, ac = scaled.finals[s]
                out.set_final(s, g + ac)
        if rm_eps[0]:
            out = rm_epsilon(out)
        writer.write(key, out)
        n += 1
    writer.close()
    log(f"lattice-to-fst: converted {n}")
    return 0


def lattice_to_phone_lattice(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert the words or transition-ids into phones, which are "
        "worked out from the transition-ids.\n"
        "Usage: lattice-to-phone-lattice [options] <model> "
        "<lattice-rspecifier> <lattice-wspecifier>")
    replace_words = po.register_value(
        "replace-words", True,
        "If true, replace words with phones; otherwise replace "
        "transition-ids with phones")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.util.kaldi_io import read_kaldi_object
    tm = read_kaldi_object(TransitionModel.read, po.get_arg(1))

    def fn(key, lat):
        out = VectorFst(LatticeWeight)
        for _ in range(lat.num_states):
            out.add_state()
        out.set_start(lat.start)
        for s in range(lat.num_states):
            out.finals[s] = lat.finals[s]
            for a in lat.arcs[s]:
                phone = 0
                if a.ilabel != 0:
                    # lattice-functions.cc ConvertLatticeToPhones: show
                    # the phone on the transition that STARTS it
                    if (tm.transition_id_to_hmm_state(a.ilabel) == 0
                            and not tm.is_self_loop(a.ilabel)):
                        phone = tm.transition_id_to_phone(a.ilabel)
                if replace_words[0]:
                    out.add_arc(s, Arc(a.ilabel, phone, a.weight,
                                       a.nextstate))
                else:
                    out.add_arc(s, Arc(phone, a.olabel, a.weight,
                                       a.nextstate))
        return out

    return _each(po.get_arg(2), po.get_arg(3), fn,
                 "lattice-to-phone-lattice")


# -- statistics / pruning ---------------------------------------------------

def lattice_depth_per_frame(argv: List[str]) -> int:
    po = ParseOptions(
        "For each lattice, compute a vector of length (num-frames) "
        "saying how may arcs cross each frame.\n"
        "Usage: lattice-depth-per-frame <lattice-rspecifier> "
        "<depth-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter("int-vector", po.get_arg(2))
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        times = lattice_state_times(lat)
        T = max(times) if times else 0
        depth = np.zeros(max(T, 0), np.int64)
        for s in range(lat.num_states):
            if times[s] < 0:       # unreachable state
                continue
            for a in lat.arcs[s]:
                t0, t1 = times[s], times[a.nextstate]
                if t1 < 0:
                    continue
                depth[t0:t1] += 1
        writer.write(key, depth.tolist())
        n += 1
    writer.close()
    log(f"lattice-depth-per-frame: {n} lattices")
    return 0


def lattice_limit_depth(argv: List[str]) -> int:
    po = ParseOptions(
        "Limit the number of arcs crossing any frame, to a specified "
        "maximum.  Requires an acoustic scale; keeps the best arcs by "
        "posterior.\n"
        "Usage: lattice-limit-depth [options] <lattice-rspecifier> "
        "<lattice-wspecifier>")
    max_arcs = po.register_value("max-arcs-per-frame", 1000,
                                 "Maximum number of arcs that are "
                                 "allowed to cross any given frame")
    acoustic_scale = po.register_value("acoustic-scale", 1.0,
                                       "Scaling factor for acoustic "
                                       "likelihoods")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.ops import connect

    def fn(key, lat):
        scaled = lattice_scale(lat, 1.0, acoustic_scale[0])
        fwd, bwd = _forward_backward_costs(scaled)
        best = min((f + b for f, b in zip(fwd, bwd)), default=INF)
        times = lattice_state_times(lat)
        T = max(times) if times else 0
        # per-frame sorted arc extra-costs
        per_frame: List[List[float]] = [[] for _ in range(max(T, 1))]
        arc_extra: Dict[Tuple[int, int], float] = {}
        for s in range(lat.num_states):
            for i, a in enumerate(scaled.arcs[s]):
                g, ac = a.weight
                extra = fwd[s] + g + ac + bwd[a.nextstate] - best
                arc_extra[(s, i)] = extra
                for t in range(times[s], times[a.nextstate]):
                    per_frame[t].append(extra)
        cutoff = INF
        for t in range(len(per_frame)):
            row = sorted(per_frame[t])
            if len(row) > max_arcs[0]:
                cutoff = min(cutoff, row[max_arcs[0]])
        if cutoff == INF:
            return lat
        out = VectorFst(LatticeWeight)
        for _ in range(lat.num_states):
            out.add_state()
        out.set_start(lat.start)
        for s in range(lat.num_states):
            out.finals[s] = lat.finals[s]
            for i, a in enumerate(lat.arcs[s]):
                if arc_extra[(s, i)] < cutoff:
                    out.add_arc(s, a)
        connect(out)
        return out

    return _each(po.get_arg(1), po.get_arg(2), fn, "lattice-limit-depth")


def lattice_arc_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Print out information regarding posteriors of lattice arcs.\n"
        "Usage: lattice-arc-post [options] <lattice-rspecifier> "
        "<output-wxfilename>")
    acoustic_scale = po.register_value("acoustic-scale", 1.0,
                                       "Scaling factor for acoustic "
                                       "likelihoods")
    min_post = po.register_value("min-post", 0.0001,
                                 "Arc posteriors below this threshold "
                                 "will be pruned away")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.util import kaldi_io
    lines: List[str] = []
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        scaled = lattice_scale(lat, 1.0, acoustic_scale[0])
        # log-domain forward/backward for posteriors
        order = _topsort(scaled)
        if order is None:
            warn(f"{key}: cyclic lattice")
            continue
        alpha = {s: -INF for s in range(scaled.num_states)}
        alpha[scaled.start] = 0.0
        for s in order:
            for a in scaled.arcs[s]:
                g, ac = a.weight
                w = -(g + ac)
                alpha[a.nextstate] = np.logaddexp(
                    alpha[a.nextstate], alpha[s] + w)
        beta = {s: -INF for s in range(scaled.num_states)}
        tot = -INF
        for s in order:
            if scaled.finals[s] != LatticeWeight.zero:
                g, ac = scaled.finals[s]
                beta[s] = -(g + ac)
                tot = np.logaddexp(tot, alpha[s] + beta[s])
        for s in reversed(order):
            for a in scaled.arcs[s]:
                g, ac = a.weight
                beta[s] = np.logaddexp(beta[s],
                                       -(g + ac) + beta[a.nextstate])
        times = lattice_state_times(lat)
        for s in order:
            for a in scaled.arcs[s]:
                g, ac = a.weight
                post = math.exp(alpha[s] - (g + ac) + beta[a.nextstate]
                                - tot)
                if post >= min_post[0] and a.olabel != 0:
                    lines.append(
                        f"{key} {times[s]} "
                        f"{times[a.nextstate] - times[s]} {post:.6f} "
                        f"{a.olabel}\n")
        n += 1
    with kaldi_io.output_stream(po.get_arg(2)) as f:
        f.write("".join(lines).encode())
    log(f"lattice-arc-post: {n} lattices")
    return 0


def lattice_confidence(argv: List[str]) -> int:
    po = ParseOptions(
        "Compute sentence-level lattice confidence measures for each "
        "lattice: the difference between the total costs of the best "
        "path and the second-best path with a different word sequence.\n"
        "Usage: lattice-confidence <lattice-rspecifier> "
        "<confidence-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter("float", po.get_arg(2))
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        paths = lattice_nbest(lat, 50)
        if not paths:
            continue
        best_words = paths[0][1]
        conf = 1e10     # reference's "very large value" when unique
        for _ali, words, cost in paths[1:]:
            if words != best_words:
                conf = cost - paths[0][2]
                break
        writer.write(key, float(conf))
        n += 1
    writer.close()
    log(f"lattice-confidence: {n} lattices")
    return 0


def lattice_equivalent(argv: List[str]) -> int:
    po = ParseOptions(
        "Test whether sets of lattices are equivalent (best path and "
        "total path sets within delta).\n"
        "Usage: lattice-equivalent <lattice-rspecifier1> "
        "<lattice-rspecifier2>")
    delta = po.register_value("delta", 0.1,
                              "Delta parameter for equivalence test")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    second = RandomAccessTableReader(LatticeHolder(), po.get_arg(2))
    n_eq = n_neq = 0
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        if not second.has_key(key):
            n_neq += 1
            continue
        _a1, w1, c1 = lattice_best_path(lat)
        _a2, w2, c2 = lattice_best_path(second[key])
        if w1 == w2 and abs(c1 - c2) < delta[0]:
            n_eq += 1
        else:
            n_neq += 1
    log(f"lattice-equivalent: {n_eq} equivalent, {n_neq} inequivalent")
    return 0 if n_neq == 0 else 1


def lattice_boost_ali(argv: List[str]) -> int:
    po = ParseOptions(
        "Boost graph likelihoods (decrease graph costs) by b * "
        "frame-phone-accuracy relative to the alignment (for boosted "
        "MMI training).\n"
        "Usage: lattice-boost-ali [options] <model> "
        "<lattice-rspecifier> <ali-rspecifier> <lattice-wspecifier>")
    b = po.register_value("b", 0.05, "Boosting factor")
    silence_phones = po.register_value(
        "silence-phones", "", "Colon-separated silence phones: frames "
        "aligned to these count as errors regardless")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.util.kaldi_io import read_kaldi_object
    tm = read_kaldi_object(TransitionModel.read, po.get_arg(1))
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(3))
    sil = set(int(p) for p in silence_phones[0].split(":") if p)

    def fn(key, lat):
        if not ali_reader.has_key(key):
            warn(f"lattice-boost-ali: no alignment for {key}")
            return None
        ali = ali_reader[key]
        ref_phones = [tm.transition_id_to_phone(t) for t in ali]
        times = lattice_state_times(lat)
        out = VectorFst(LatticeWeight)
        for _ in range(lat.num_states):
            out.add_state()
        out.set_start(lat.start)
        for s in range(lat.num_states):
            out.finals[s] = lat.finals[s]
            for a in lat.arcs[s]:
                g, ac = a.weight
                if a.ilabel != 0 and times[s] < len(ref_phones):
                    phone = tm.transition_id_to_phone(a.ilabel)
                    ref = ref_phones[times[s]]
                    err = 1.0 if (phone != ref or phone in sil) else 0.0
                    g = g - b[0] * err
                out.add_arc(s, Arc(a.ilabel, a.olabel, (g, ac),
                                   a.nextstate))
        return out

    return _each(po.get_arg(2), po.get_arg(4), fn, "lattice-boost-ali")


# -- n-best utilities --------------------------------------------------------

def linear_to_nbest(argv: List[str]) -> int:
    po = ParseOptions(
        "This does the opposite of nbest-to-linear: take alignments "
        "and word sequences and construct linear lattices.\n"
        "Usage: linear-to-nbest [options] <ali-rspecifier> "
        "<transcriptions-rspecifier> <lm-cost-rspecifier|''> "
        "<ac-cost-rspecifier|''> <nbest-wspecifier>")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    words_reader = RandomAccessTableReader("int-vector", po.get_arg(2))
    lm_reader = (RandomAccessTableReader("float", po.get_arg(3))
                 if po.get_arg(3) else None)
    ac_reader = (RandomAccessTableReader("float", po.get_arg(4))
                 if po.get_arg(4) else None)
    writer = TableWriter(LatticeHolder(), po.get_arg(5))
    n = 0
    for key, ali in SequentialTableReader("int-vector", po.get_arg(1)):
        if not words_reader.has_key(key):
            warn(f"linear-to-nbest: no words for {key}")
            continue
        words = words_reader[key]
        lm_cost = lm_reader[key] if lm_reader and \
            lm_reader.has_key(key) else 0.0
        ac_cost = ac_reader[key] if ac_reader and \
            ac_reader.has_key(key) else 0.0
        n_arcs = max(len(ali), len(words))
        lat = VectorFst(LatticeWeight)
        states = [lat.add_state() for _ in range(n_arcs + 1)]
        lat.set_start(states[0])
        for i in range(n_arcs):
            lat.add_arc(states[i], Arc(
                ali[i] if i < len(ali) else 0,
                words[i] if i < len(words) else 0,
                (0.0, 0.0), states[i + 1]))
        lat.finals[states[-1]] = (float(lm_cost), float(ac_cost))
        writer.write(key, lat)
        n += 1
    writer.close()
    log(f"linear-to-nbest: {n} lattices")
    return 0


def nbest_to_ctm(argv: List[str]) -> int:
    po = ParseOptions(
        "Takes linear lattices (single path; e.g. output of "
        "lattice-1best or nbest-to-linear) and converts to ctm format.\n"
        "Usage: nbest-to-ctm [options] <nbest-rspecifier> "
        "<ctm-wxfilename>")
    frame_shift = po.register_value("frame-shift", 0.01,
                                    "Time in seconds between frames")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.util import kaldi_io
    lines: List[str] = []
    for key, lat in SequentialTableReader(LatticeHolder(), po.get_arg(1)):
        entries = []
        s = lat.start
        t = 0
        cur_word = None
        cur_start = 0
        while s is not None:
            if lat.finals[s] != LatticeWeight.zero or not lat.arcs[s]:
                break
            a = lat.arcs[s][0]
            if a.olabel != 0:
                if cur_word is not None:
                    entries.append((cur_word, cur_start, t - cur_start))
                cur_word, cur_start = a.olabel, t
            if a.ilabel != 0:
                t += 1
            s = a.nextstate
        if cur_word is not None:
            entries.append((cur_word, cur_start, max(t - cur_start, 1)))
        for w, st, dur in entries:
            lines.append(f"{key} 1 {st * frame_shift[0]:.2f} "
                         f"{dur * frame_shift[0]:.2f} {w}\n")
    with kaldi_io.output_stream(po.get_arg(2)) as f:
        f.write("".join(lines).encode())
    log(f"nbest-to-ctm: wrote {len(lines)} entries")
    return 0


# -- composition family ------------------------------------------------------

def compose_lattice_fst_op(lat: Lattice, fst: VectorFst) -> Lattice:
    """Compose a lattice's word (output) side with a tropical FST,
    adding FST costs to graph costs (latbin/lattice-compose.cc with an
    fst as arg2). FST input-eps arcs advance the FST freely; lattice
    eps-word arcs advance the lattice freely."""
    from collections import deque
    out = VectorFst(LatticeWeight)
    # composed state = (lat state, fst state, filter); filter = 1 after
    # an FST eps-input move, which forbids a lattice eps-olabel move —
    # the 2-value epsilon-sequencing filter of OpenFst composition, so
    # adjacent eps sequences have exactly ONE interleaving (all lattice
    # eps first, then fst eps) and no path is duplicated.
    state_map: Dict[Tuple[int, int, int], int] = {}
    work = deque()

    def get(ls, fs, filt):
        key = (ls, fs, filt)
        s = state_map.get(key)
        if s is None:
            s = out.add_state()
            state_map[key] = s
            work.append(key)
        return s

    if lat.num_states == 0 or lat.start is None or \
            fst.num_states == 0 or fst.start is None:
        return out
    # sort fst arcs by ilabel for lookup
    by_label: List[Dict[int, List[Arc]]] = []
    for s in range(fst.num_states):
        d: Dict[int, List[Arc]] = {}
        for a in fst.arcs[s]:
            d.setdefault(a.ilabel, []).append(a)
        by_label.append(d)
    start = get(lat.start, fst.start, 0)
    out.set_start(start)
    while work:
        ls, fs, filt = work.popleft()
        cur = state_map[(ls, fs, filt)]
        if lat.finals[ls] != LatticeWeight.zero and \
                fst.finals[fs] != TropicalWeight.zero:
            g, ac = lat.finals[ls]
            out.finals[cur] = (g + float(fst.finals[fs]), ac)
        # fst eps-input arcs: free advance (sets the filter)
        for fa in by_label[fs].get(EPS, []):
            g = float(fa.weight)
            ns = get(ls, fa.nextstate, 1)
            out.add_arc(cur, Arc(EPS, fa.olabel, (g, 0.0), ns))
        for a in lat.arcs[ls]:
            if a.olabel == EPS:
                if filt == 1:
                    continue       # eps-lat after eps-fst forbidden
                ns = get(a.nextstate, fs, 0)
                out.add_arc(cur, Arc(a.ilabel, a.olabel, a.weight, ns))
                continue
            for fa in by_label[fs].get(a.olabel, []):
                g, ac = a.weight
                ns = get(a.nextstate, fa.nextstate, 0)
                out.add_arc(cur, Arc(a.ilabel, fa.olabel,
                                     (g + float(fa.weight), ac), ns))
    from kaldi_tpu.fstext.ops import connect
    connect(out)
    return out


def lattice_compose(argv: List[str]) -> int:
    po = ParseOptions(
        "Composes lattices (on the word level) with a tropical FST "
        "(e.g. a grammar or LM fst read once).\n"
        "Usage: lattice-compose [options] <lattice-rspecifier1> "
        "<fst-rxfilename> <lattice-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    fst = read_fst_file(po.get_arg(2))
    return _each(po.get_arg(1), po.get_arg(3),
                 lambda k, lat: compose_lattice_fst_op(lat, fst),
                 "lattice-compose")


def lattice_interp(argv: List[str]) -> int:
    po = ParseOptions(
        "Takes two archives of lattices (indexed by utterances) and "
        "composes the individual lattice pairs (one from each "
        "archive), with weights scaled by alpha and 1-alpha.\n"
        "Usage: lattice-interp [options] <lattice-rspecifier-a> "
        "<lattice-rspecifier-b> <lattice-wspecifier>")
    alpha = po.register_value("alpha", 0.5,
                              "Scale of the first lattice's weights")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.ops import rm_epsilon
    second = RandomAccessTableReader(LatticeHolder(), po.get_arg(2))
    n_ok = [0]

    def fn(key, lat):
        a = alpha[0]
        la = lattice_scale(lat, a, a)
        if not second.has_key(key):
            warn(f"lattice-interp: no second lattice for {key}")
            return None
        lb = lattice_scale(second[key], 1.0 - a, 1.0 - a)
        # project b onto words as a tropical fst, compose with a
        proj = VectorFst(TropicalWeight)
        for _ in range(lb.num_states):
            proj.add_state()
        proj.set_start(lb.start)
        for s in range(lb.num_states):
            for arc in lb.arcs[s]:
                g, ac = arc.weight
                proj.add_arc(s, Arc(arc.olabel, arc.olabel, g + ac,
                                    arc.nextstate))
            if lb.finals[s] != LatticeWeight.zero:
                g, ac = lb.finals[s]
                proj.set_final(s, g + ac)
        proj = rm_epsilon(proj)
        comp = compose_lattice_fst_op(la, proj)
        if comp.num_states == 0:
            warn(f"lattice-interp: empty composition for {key}; "
                 "keeping scaled first lattice")
            return lattice_scale(lat, 1.0, 1.0)
        n_ok[0] += 1
        return comp

    return _each(po.get_arg(1), po.get_arg(3), fn, "lattice-interp")


def lattice_push(argv: List[str]) -> int:
    po = ParseOptions(
        "Push lattices, in the tropical semiring sense: move the total "
        "cost as early as possible without changing any path cost.\n"
        "Usage: lattice-push [options] <lattice-rspecifier> "
        "<lattice-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1

    def fn(key, lat):
        if lat.num_states == 0 or lat.start is None:
            return lat
        _fwd, bwd = _forward_backward_costs(lat)
        out = VectorFst(LatticeWeight)
        for _ in range(lat.num_states):
            out.add_state()
        out.set_start(lat.start)
        for s in range(lat.num_states):
            for a in lat.arcs[s]:
                g, ac = a.weight
                # shift the GRAPH part only (the acoustic split is
                # preserved; path totals telescope unchanged)
                delta = bwd[a.nextstate] - bwd[s] if \
                    np.isfinite(bwd[a.nextstate]) and \
                    np.isfinite(bwd[s]) else 0.0
                out.add_arc(s, Arc(a.ilabel, a.olabel,
                                   (g + delta, ac), a.nextstate))
            if lat.finals[s] != LatticeWeight.zero:
                g, ac = lat.finals[s]
                delta = -bwd[s] if np.isfinite(bwd[s]) else 0.0
                out.finals[s] = (g + delta, ac)
        # total path cost moved to the start: put it on an initial
        # epsilon arc... simpler: fold bwd[start] onto arcs out of the
        # start state (kaldi keeps the total weight unless
        # push-total-weight is requested; we keep it)
        for i, a in enumerate(out.arcs[lat.start]):
            g, ac = a.weight
            out.arcs[lat.start][i] = Arc(a.ilabel, a.olabel,
                                         (g + bwd[lat.start], ac),
                                         a.nextstate)
        if out.finals[lat.start] != LatticeWeight.zero:
            g, ac = out.finals[lat.start]
            out.finals[lat.start] = (g + bwd[lat.start], ac)
        return out

    return _each(po.get_arg(1), po.get_arg(2), fn, "lattice-push")


def _lat_to_discrim_post(argv: List[str], criterion: str,
                         name: str) -> int:
    po = ParseOptions(
        f"Do forward-backward and collect {criterion} frame accuracies "
        "over lattices scored against a numerator alignment; output\n"
        "posteriors weighted by accuracy-difference (the gradients of "
        f"{'MPFE' if criterion == 'mpfe' else 'sMBR'} training).\n"
        f"Usage: {name} [options] <model> <num-ali-rspecifier> "
        "<lats-rspecifier> <posts-wspecifier>\n"
        "(src/latbin/" + name + ".cc)")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Scaling factor for acoustic likelihoods")
    lm_scale = po.register_value(
        "lm-scale", 1.0, "Scaling factor for graph/LM costs")
    one_silence_class = po.register_value(
        "one-silence-class", False, "If true, newer behavior that "
        "will tend to reduce insertions")
    silence_phones_str = po.register_value(
        "silence-phones", "", "Colon-separated list of integer ids of "
        "silence phones")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    if acoustic_scale[0] == 0.0:
        raise KaldiTpuError("do not use a zero acoustic scale "
                            "(cannot be inverted)")
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.lat.functions import \
        lattice_forward_backward_mpe_variants
    from kaldi_tpu.util.kaldi_io import read_kaldi_object
    tm = read_kaldi_object(TransitionModel.read, po.get_arg(1))
    sil = [int(p) for p in silence_phones_str[0].split(":") if p]
    if not sil:
        warn(f"{name}: no silence phones specified, make sure this "
             "is what you intended")
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(2))
    writer = TableWriter("posterior", po.get_arg(4))
    n = 0
    tot_acc = 0.0
    tot_t = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(3)):
        if not ali_reader.has_key(key):
            warn(f"{name}: no alignment for utterance {key}")
            continue
        if acoustic_scale[0] != 1.0 or lm_scale[0] != 1.0:
            lat = lattice_scale(lat, lm_scale=lm_scale[0],
                                acoustic_scale=acoustic_scale[0])
        acc, post = lattice_forward_backward_mpe_variants(
            tm, sil, lat, ali_reader[key], criterion=criterion,
            one_silence_class=one_silence_class[0])
        writer.write(key, post)
        tot_acc += acc
        tot_t += len(post)
        n += 1
    writer.close()
    if tot_t:
        log(f"overall average frame-accuracy is {tot_acc / tot_t} "
            f"over {tot_t} frames")
    log(f"done {n} lattices")
    return 0 if n else 1


def lattice_to_mpe_post(argv: List[str]) -> int:
    return _lat_to_discrim_post(argv, "mpfe", "lattice-to-mpe-post")


def lattice_to_smbr_post(argv: List[str]) -> int:
    return _lat_to_discrim_post(argv, "smbr", "lattice-to-smbr-post")
