"""Lattice + KWS CLI tail (parity: src/latbin
lattice-add-trans-probs.cc, lattice-copy-backoff.cc,
lattice-rescore-mapped.cc, nbest-to-lattice.cc, lattice-minimize.cc;
src/kwsbin lattice-to-kws-index.cc, kws-index-union.cc,
kws-search.cc, compute-atwv.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def lattice_add_trans_probs(argv: List[str]) -> int:
    po = ParseOptions(
        "Add transition log-probabilities from the model to lattice "
        "graph costs (undoing decode graphs built with zero "
        "transition scale).\n"
        "Usage: lattice-add-trans-probs [options] <model-in> "
        "<lattice-rspecifier> <lattice-wspecifier>")
    transition_scale = po.register_value(
        "transition-scale", 1.0, "Scale on the non-self-loop "
        "transition log-probs")
    self_loop_scale = po.register_value(
        "self-loop-scale", 1.0, "Scale on the self-loop transition "
        "log-probs")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    tm = _read_tm(po.get_arg(1))
    writer = TableWriter(LatticeHolder(), po.get_arg(3))
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(2)):
        for s in range(lat.num_states):
            for a in lat.arcs[s]:
                if a.ilabel == 0:
                    continue
                lp = float(tm.log_probs[a.ilabel])
                scale = (self_loop_scale[0]
                         if tm.is_self_loop(a.ilabel)
                         else transition_scale[0])
                g, ac = a.weight
                a.weight = (g - scale * lp, ac)
        writer.write(key, lat)
        n += 1
    writer.close()
    log(f"added transition probs to {n} lattices")
    return 0 if n else 1


def lattice_copy_backoff(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy lattices, falling back to a second archive for keys "
        "missing from the first.\n"
        "Usage: lattice-copy-backoff <lat-rspecifier1> "
        "<lat-rspecifier2> <key-rxfilename> <lat-wspecifier>\n"
        "(keys are read one per line from <key-rxfilename>)")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    first = RandomAccessTableReader(LatticeHolder(), po.get_arg(1))
    second = RandomAccessTableReader(LatticeHolder(), po.get_arg(2))
    writer = TableWriter(LatticeHolder(), po.get_arg(4))
    n = back = err = 0
    with kaldi_io.input_stream(po.get_arg(3)) as f:
        keys = [ln.split()[0] for ln in
                f.read().decode("utf-8").splitlines() if ln.split()]
    for key in keys:
        if key in first:
            writer.write(key, first[key])
            n += 1
        elif key in second:
            writer.write(key, second[key])
            n += 1
            back += 1
        else:
            warn(f"no lattice for {key} in either archive")
            err += 1
    writer.close()
    log(f"copied {n} lattices ({back} from backoff, {err} missing)")
    return 0 if n else 1


def lattice_rescore_mapped(argv: List[str]) -> int:
    po = ParseOptions(
        "Replace lattice acoustic scores from loglike matrices "
        "(rows = frames, columns = pdfs via the model's map).\n"
        "Usage: lattice-rescore-mapped [options] <model-in> "
        "<lattice-rspecifier> <loglikes-rspecifier> "
        "<lattice-wspecifier>")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.tail5_tools import _read_tm
    from kaldi_tpu.nnet3.discriminative_train import \
        rescore_lattice_acoustics
    tm = _read_tm(po.get_arg(1))
    ll_reader = RandomAccessTableReader("matrix", po.get_arg(3))
    writer = TableWriter(LatticeHolder(), po.get_arg(4))
    n = err = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(2)):
        if key not in ll_reader:
            warn(f"no loglikes for {key}")
            err += 1
            continue
        writer.write(key, rescore_lattice_acoustics(
            lat, tm, np.asarray(ll_reader[key])))
        n += 1
    writer.close()
    log(f"rescored {n} lattices ({err} errors)")
    return 0 if n else 1


def nbest_to_lattice(argv: List[str]) -> int:
    po = ParseOptions(
        "Union per-utterance n-best entries (keys utt-1, utt-2, ...) "
        "back into one lattice per utterance.\n"
        "Usage: nbest-to-lattice <nbest-rspecifier> "
        "<lattice-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.fst import Arc
    writer = TableWriter(LatticeHolder(), po.get_arg(2))
    cur_key = None
    cur_lat = None
    n_in = n_out = 0

    def fst_union(f1, f2):
        sr = f1.semiring
        off = f1.num_states
        for _ in range(f2.num_states):
            f1.add_state()
        for s in range(f2.num_states):
            for a in f2.arcs[s]:
                f1.add_arc(off + s, Arc(a.ilabel, a.olabel, a.weight,
                                        off + a.nextstate))
            if f2.finals[s] != sr.zero:
                f1.set_final(off + s, f2.finals[s])
        ns = f1.add_state()
        f1.add_arc(ns, Arc(0, 0, sr.one, f1.start))
        f1.add_arc(ns, Arc(0, 0, sr.one, off + f2.start))
        f1.set_start(ns)
        return f1

    def flush():
        nonlocal n_out
        if cur_key is not None:
            writer.write(cur_key, cur_lat)
            n_out += 1

    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(1)):
        base = key.rsplit("-", 1)[0] if "-" in key else key
        n_in += 1
        if base != cur_key:
            flush()
            cur_key, cur_lat = base, lat
        else:
            cur_lat = fst_union(cur_lat, lat)
    flush()
    writer.close()
    log(f"combined {n_in} n-best entries into {n_out} lattices")
    return 0 if n_out else 1


def lattice_minimize(argv: List[str]) -> int:
    po = ParseOptions(
        "Minimize lattices by bisimulation (merge states with "
        "identical continuations; language- and score-preserving).\n"
        "Usage: lattice-minimize <lattice-rspecifier> "
        "<lattice-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
    writer = TableWriter(LatticeHolder(), po.get_arg(2))
    n = 0
    tot_in = tot_out = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(1)):
        S = lat.num_states
        # partition refinement on (final weight, outgoing signature)
        cls = np.zeros(S, np.int64)
        for _ in range(S + 1):
            sigs = {}
            new_cls = np.empty(S, np.int64)
            for s in range(S):
                sig = (lat.finals[s],
                       tuple(sorted((a.ilabel, a.olabel, a.weight,
                                     int(cls[a.nextstate]))
                                    for a in lat.arcs[s])))
                if sig not in sigs:
                    sigs[sig] = len(sigs)
                new_cls[s] = sigs[sig]
            if (new_cls == cls).all():
                break
            cls = new_cls
        k = int(cls.max()) + 1 if S else 0
        out = VectorFst(LatticeWeight)
        for _ in range(k):
            out.add_state()
        out.set_start(int(cls[lat.start]))
        done = set()
        for s in range(S):
            c = int(cls[s])
            if c in done:
                continue
            done.add(c)
            out.finals[c] = lat.finals[s]
            seen = set()
            for a in lat.arcs[s]:
                t = (a.ilabel, a.olabel, a.weight, int(cls[a.nextstate]))
                if t in seen:
                    continue
                seen.add(t)
                out.add_arc(c, Arc(a.ilabel, a.olabel, a.weight,
                                   int(cls[a.nextstate])))
        tot_in += S
        tot_out += k
        writer.write(key, out)
        n += 1
    writer.close()
    log(f"minimized {n} lattices: {tot_in} -> {tot_out} states")
    return 0 if n else 1


# ---------------------------------------------------------------------------
# KWS (src/kwsbin)
# ---------------------------------------------------------------------------

def lattice_to_kws_index(argv: List[str]) -> int:
    po = ParseOptions(
        "Build an inverted keyword-search index from lattices.\n"
        "Usage: lattice-to-kws-index [options] <lattice-rspecifier> "
        "<index-wxfilename>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    acoustic_scale = po.register_value(
        "acoustic-scale", 1.0, "Acoustic scale for arc posteriors")
    min_post = po.register_value(
        "min-posterior", 1e-3, "Prune word tokens below this posterior")
    index_type = po.register_value(
        "index-type", "postings", "postings (inverted posting lists) "
        "or factor (the reference's timed factor transducer over the "
        "lexicographic semiring, kws/kws-functions.h)")
    max_sil = po.register_value(
        "max-silence-frames", 50, "Sever factors across silence "
        "longer than this (factor index only)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    if index_type[0] == "factor":
        from kaldi_tpu.kws.factor_index import FactorIndex
        lats = {key: lat for key, lat in SequentialTableReader(
            LatticeHolder(), po.get_arg(1))}
        index = FactorIndex.build(lats,
                                  acoustic_scale=acoustic_scale[0],
                                  max_silence_frames=max_sil[0])
        kaldi_io.write_kaldi_object(index.write, po.get_arg(2),
                                    binary[0])
        log(f"indexed {len(lats)} lattices: factor transducer with "
            f"{index.fst.num_states} states")
        return 0 if lats else 1
    from kaldi_tpu.kws.index import KwsIndex
    index = KwsIndex(min_posterior=min_post[0])
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(1)):
        index.add_lattice(key, lat, acoustic_scale=acoustic_scale[0])
        n += 1
    kaldi_io.write_kaldi_object(index.write, po.get_arg(2), binary[0])
    log(f"indexed {n} lattices, {len(index.postings)} distinct words")
    return 0 if n else 1


def kws_index_union(argv: List[str]) -> int:
    po = ParseOptions(
        "Merge keyword-search indices.\n"
        "Usage: kws-index-union <index-out> <index-in1> <index-in2> ...")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.kws import _read_any_index
    total = None
    for i in range(2, po.num_args() + 1):
        idx = _read_any_index(po.get_arg(i))
        if total is None:
            total = idx
        else:
            total = total.union(idx) or total
    kaldi_io.write_kaldi_object(total.write, po.get_arg(1), binary[0])
    return 0


def kws_search(argv: List[str]) -> int:
    po = ParseOptions(
        "Search a keyword index; writes one result line per hit: "
        "<kwid> <utt> <start-frame> <end-frame> <score>.\n"
        "Usage: kws-search [options] <index-rxfilename> "
        "<keywords-rspecifier> <results-wxfilename>")
    nbest = po.register_value("nbest", 0, "Keep only the best N hits "
                              "per keyword (0 = all)")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    import sys as _sys
    from kaldi_tpu.kws import _read_any_index
    index = _read_any_index(po.get_arg(1))
    out = (_sys.stdout if po.get_arg(3) == "-"
           else open(po.get_arg(3), "w"))
    n_kw = n_hits = 0
    for kwid, words in SequentialTableReader("int-vector",
                                             po.get_arg(2)):
        hits = index.search([int(w) for w in words])
        if nbest[0] > 0:
            hits = hits[:nbest[0]]
        for h in hits:
            out.write(f"{kwid} {h.utt} {h.start_frame} {h.end_frame} "
                      f"{h.score:.6f}\n")
        n_kw += 1
        n_hits += len(hits)
    if out is not _sys.stdout:
        out.close()
    log(f"searched {n_kw} keywords, {n_hits} hits")
    return 0 if n_kw else 1


def compute_atwv(argv: List[str]) -> int:
    po = ParseOptions(
        "Compute Actual Term-Weighted Value from hypothesis hits vs "
        "reference hits (both in kws-search's line format; a hyp hit "
        "is correct if it overlaps a same-keyword reference hit in "
        "the same utterance).\n"
        "Usage: compute-atwv [options] <total-audio-seconds> "
        "<ref-rxfilename> <hyp-rxfilename>")
    beta = po.register_value("beta", 999.9, "False-alarm weight "
                             "(NIST STD-06 beta)")
    frame_shift = po.register_value("frame-shift", 0.01,
                                    "Frame shift in seconds")
    threshold = po.register_value("threshold", 0.5,
                                  "Score threshold for hypothesis hits")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1

    def read_hits(path):
        hits = {}
        with kaldi_io.input_stream(path) as f:
            for ln in f.read().decode("utf-8").splitlines():
                parts = ln.split()
                if len(parts) < 5:
                    continue
                kwid, utt, t0, t1, score = parts[:5]
                hits.setdefault(kwid, []).append(
                    (utt, int(t0), int(t1), float(score)))
        return hits

    T = float(po.get_arg(1))
    ref = read_hits(po.get_arg(2))
    hyp = read_hits(po.get_arg(3))
    twvs = []
    for kwid, refs in ref.items():
        n_true = len(refs)
        if n_true == 0:
            continue
        found = [False] * n_true
        n_fa = 0
        for utt, t0, t1, score in hyp.get(kwid, []):
            if score < threshold[0]:
                continue
            matched = False
            for i, (ru, r0, r1, _s) in enumerate(refs):
                if not found[i] and ru == utt and t0 < r1 and r0 < t1:
                    found[i] = True
                    matched = True
                    break
            if not matched:
                n_fa += 1
        p_miss = 1.0 - sum(found) / n_true
        t_nt = max(T - n_true * frame_shift[0], 1.0)
        p_fa = n_fa / t_nt
        twvs.append(1.0 - p_miss - beta[0] * p_fa)
    atwv = float(np.mean(twvs)) if twvs else 0.0
    print(f"ATWV = {atwv:.4f} over {len(twvs)} keywords")
    return 0
