"""Neural-LM lattice rescoring + pron/KWS tail (parity: src/latbin
lattice-add-nnlmscore.cc, lattice-lmrescore-rnnlm.cc,
lattice-lmrescore-kaldi-rnnlm-pruned.cc; src/bin phones-to-prons.cc,
prons-to-wordali.cc; src/kwsbin generate-proxy-keywords.cc,
print-proxy-keywords.cc; src/online2bin ivector-extract-online2.cc)."""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def lattice_add_nnlmscore(argv: List[str]) -> int:
    po = ParseOptions(
        "Add externally estimated neural-LM scores to lattice arcs "
        "(lattice-add-nnlmscore.cc). The scores file has lines "
        "`<utt> <start-state> <end-state> <score>`; lm-scale * score "
        "is added to the arc's graph cost.\n"
        "Usage: lattice-add-nnlmscore [options] <lattice-rspecifier> "
        "<nnlm-scores-file> <lattice-wspecifier>")
    lm_scale = po.register_value(
        "lm-scale", 1.0, "Scaling factor for language model scores")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.fst import Arc
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    scores: Dict[str, Dict[Tuple[int, int], float]] = {}
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        for line in f.read().decode().splitlines():
            parts = line.split()
            if len(parts) != 4:
                continue
            scores.setdefault(parts[0], {})[
                (int(parts[1]), int(parts[2]))] = \
                lm_scale[0] * float(parts[3])
    writer = TableWriter(LatticeHolder(), po.get_arg(3))
    n = miss = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(1)):
        table = scores.get(key)
        if table is None:
            warn(f"no scores for {key}")
            miss += 1
            writer.write(key, lat)
            continue
        for s in range(lat.num_states):
            for i, a in enumerate(lat.arcs[s]):
                add = table.get((s, a.nextstate))
                if add is not None:
                    lat.arcs[s][i] = Arc(a.ilabel, a.olabel,
                                         (a.weight[0] + add,
                                          a.weight[1]), a.nextstate)
        writer.write(key, lat)
        n += 1
    writer.close()
    log(f"added NN LM scores to {n} lattices ({miss} without scores)")
    return 0 if n else 1


def lattice_lmrescore_rnnlm(argv: List[str]) -> int:
    po = ParseOptions(
        "Rescore lattices with an RNNLM via deterministic on-demand "
        "composition (lattice-lmrescore-rnnlm.cc; use a negative "
        "--lm-scale to subtract).\n"
        "Usage: lattice-lmrescore-rnnlm [options] "
        "<word-symbol-table> <lattice-rspecifier> "
        "<rnnlm-rxfilename (.npz)> <lattice-wspecifier>")
    lm_scale = po.register_value("lm-scale", 1.0,
                                 "Scale on the RNNLM costs")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.rnnlm_tools import load_rnnlm
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.lm.rescore import lattice_lmrescore
    from kaldi_tpu.rnnlm.rescore import RnnLmDeterministic
    model, params = load_rnnlm(po.get_arg(3))
    V = model.cfg.vocab_size
    # the symbol table defines the lattice-word -> rnnlm-token map
    # (identity for ids inside the vocab; OOV ids map to token 0)
    word_map = {}
    with open(po.get_arg(1)) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                wid = int(parts[1])
                word_map[wid] = wid if wid < V else 0
    det = RnnLmDeterministic(model, params, word_map)
    writer = TableWriter(LatticeHolder(), po.get_arg(4))
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(2)):
        writer.write(key, lattice_lmrescore(lat, det,
                                            lm_scale=lm_scale[0]))
        n += 1
    writer.close()
    log(f"RNNLM-rescored {n} lattices")
    return 0 if n else 1


def lattice_lmrescore_kaldi_rnnlm_pruned(argv: List[str]) -> int:
    po = ParseOptions(
        "Pruned RNNLM rescoring: subtract the old ARPA G exactly, "
        "add the RNNLM within a compose beam "
        "(lattice-lmrescore-kaldi-rnnlm-pruned.cc; A* pruned "
        "composition).\n"
        "Usage: lattice-lmrescore-kaldi-rnnlm-pruned [options] "
        "<old-arpa-rxfilename> <words-txt> <rnnlm-rxfilename (.npz)> "
        "<lattice-rspecifier> <lattice-wspecifier>")
    lm_scale = po.register_value("lm-scale", 1.0,
                                 "Scale on the RNNLM being added")
    beam = po.register_value("lattice-compose-beam", 6.0,
                             "Pruning beam of the composed output")
    max_arcs = po.register_value("max-arcs", 100000,
                                 "Arc budget per lattice")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.rnnlm_tools import load_rnnlm
    from kaldi_tpu.lat.compose_pruned import compose_lattice_pruned
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.lm.arpa import parse_arpa
    from kaldi_tpu.lm.rescore import DeterministicLm, lattice_lmrescore
    from kaldi_tpu.rnnlm.rescore import RnnLmDeterministic
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        old = parse_arpa(f.read().decode("utf-8"))
    names = {}
    with open(po.get_arg(2)) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                names[int(parts[1])] = parts[0]
    old_det = DeterministicLm(old, names)
    model, params = load_rnnlm(po.get_arg(3))
    V = model.cfg.vocab_size
    rnn_det = RnnLmDeterministic(
        model, params, {w: (w if w < V else 0) for w in names})
    writer = TableWriter(LatticeHolder(), po.get_arg(5))
    n = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(4)):
        sub = lattice_lmrescore(lat, old_det, -lm_scale[0])
        out = compose_lattice_pruned(sub, rnn_det, lm_scale[0],
                                     beam=beam[0],
                                     max_arcs=int(max_arcs[0]))
        writer.write(key, out)
        n += 1
    writer.close()
    log(f"pruned-RNNLM-rescored {n} lattices")
    return 0 if n else 1


# -- prons ---------------------------------------------------------------

def _extract_lexicon_from_align_fst(fst, word_start: int,
                                    word_end: int):
    """Enumerate prons from an L_align FST: paths from the start that
    emit one word, bracketed by word-start/word-end symbols on the "
    "input side.  Returns {word: [phone lists]} plus nonword prons
    under key 0."""
    from kaldi_tpu.fstext.fst import EPS, TropicalWeight
    lex: Dict[int, List[List[int]]] = {}
    # DFS with a path budget; lexicon FSTs are small and acyclic
    # apart from the root loop
    start = fst.start
    stack = [(start, [], 0, set())]
    budget = 200000
    while stack and budget > 0:
        s, phones, word, opened = stack.pop()
        budget -= 1
        back_at_root = s == start and (phones or word)
        if (back_at_root or fst.finals[s] != TropicalWeight.zero) \
                and (phones or word):
            pron = [p for p in phones
                    if p not in (word_start, word_end)]
            if pron or word:
                lex.setdefault(word, []).append(pron)
            if back_at_root:
                continue
        if s == start and (phones or word):
            continue
        for a in fst.arcs[s]:
            np_ = phones + ([a.ilabel] if a.ilabel != EPS else [])
            nw = a.olabel if a.olabel != EPS else word
            key = (a.nextstate, tuple(np_), nw)
            if key in opened:
                continue
            stack.append((a.nextstate, np_, nw,
                          opened | {key}))
    # dedupe
    for w in lex:
        uniq = []
        for p in lex[w]:
            if p not in uniq:
                uniq.append(p)
        lex[w] = uniq
    return lex


def phones_to_prons(argv: List[str]) -> int:
    po = ParseOptions(
        "Pair (phone-level, word-level) transcriptions into per-word "
        "pronunciations via the alignment lexicon "
        "(phones-to-prons.cc): output rows `word phone1 ... phoneN` "
        "(word 0 = nonword phones like optional silence).\n"
        "Usage: phones-to-prons [options] <L_align.fst> "
        "<word-start-sym> <word-end-sym> <phones-rspecifier> "
        "<words-rspecifier> <prons-wspecifier>")
    po.read(argv)
    if po.num_args() != 6:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    lfst = read_fst_file(po.get_arg(1))
    ws, we = int(po.get_arg(2)), int(po.get_arg(3))
    lex = _extract_lexicon_from_align_fst(lfst, ws, we)
    words_reader = RandomAccessTableReader("int-vector", po.get_arg(5))
    writer = TableWriter("int-vector-vector", po.get_arg(6))
    n = err = 0
    import functools
    for key, phones in SequentialTableReader("int-vector",
                                             po.get_arg(4)):
        if key not in words_reader:
            warn(f"no word transcript for {key}")
            err += 1
            continue
        words = [int(w) for w in words_reader[key]]
        phones = [int(p) for p in phones]

        @functools.lru_cache(maxsize=None)
        def solve(i, k):
            if i == len(phones):
                return [] if k == len(words) else None
            for pron in lex.get(0, []):
                m = len(pron)
                if m and phones[i:i + m] == pron:
                    rest = solve(i + m, k)
                    if rest is not None:
                        return [(0, pron)] + rest
            if k < len(words):
                for pron in lex.get(words[k], []):
                    m = len(pron)
                    if m and phones[i:i + m] == pron:
                        rest = solve(i + m, k + 1)
                        if rest is not None:
                            return [(words[k], pron)] + rest
            return None

        sol = solve(0, 0)
        solve.cache_clear()
        if sol is None:
            warn(f"could not align phones to words for {key}")
            err += 1
            continue
        writer.write(key, [[w] + list(p) for w, p in sol])
        n += 1
    writer.close()
    log(f"wrote prons for {n} utterances ({err} failed)")
    return 0 if n else 1


def prons_to_wordali(argv: List[str]) -> int:
    po = ParseOptions(
        "Combine per-utterance prons (phones-to-prons output) with "
        "per-phone lengths (ali-to-phones --write-lengths) into "
        "(word, num-frames) pairs (prons-to-wordali.cc).\n"
        "Usage: prons-to-wordali [options] <prons-rspecifier> "
        "<phone-lengths-rspecifier> <wordali-wspecifier>")
    per_frame = po.register_value(
        "per-frame", False,
        "If true, write one word id per frame instead of pairs")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    len_reader = RandomAccessTableReader("int-pair-vector",
                                         po.get_arg(2))
    writer = TableWriter(
        "int-vector" if per_frame[0] else "int-pair-vector",
        po.get_arg(3))
    n = err = 0
    for key, prons in SequentialTableReader("int-vector-vector",
                                            po.get_arg(1)):
        if key not in len_reader:
            warn(f"no phone lengths for {key}")
            err += 1
            continue
        lengths = [(int(p), int(d)) for p, d in len_reader[key]]
        li = 0
        out = []
        ok = True
        for row in prons:
            word = int(row[0])
            frames = 0
            for ph in row[1:]:
                if li >= len(lengths) or lengths[li][0] != int(ph):
                    ok = False
                    break
                frames += lengths[li][1]
                li += 1
            if not ok:
                break
            out.append((word, frames))
        if not ok or li != len(lengths):
            warn(f"prons/lengths mismatch for {key}")
            err += 1
            continue
        if per_frame[0]:
            flat = []
            for w, fcount in out:
                flat.extend([w] * fcount)
            writer.write(key, np.asarray(flat, np.int32))
        else:
            writer.write(key, out)
        n += 1
    writer.close()
    log(f"wrote word alignments for {n} utterances ({err} failed)")
    return 0 if n else 1


# -- KWS proxies ---------------------------------------------------------

def generate_proxy_keywords(argv: List[str]) -> int:
    po = ParseOptions(
        "Generate proxy keywords by composing each keyword with a "
        "confusion/lexicon transducer (the reference's pre-composed "
        "L2xE.fst) and keeping the best paths within beam/nbest "
        "(generate-proxy-keywords.cc).\n"
        "Usage: generate-proxy-keywords [options] <L2xE.fst> "
        "<L1-inv.fst> <keyword-rspecifier> <proxy-wspecifier>")
    beam = po.register_value("proxy-beam", 5.0,
                             "Cost beam around the best proxy")
    nbest = po.register_value("proxy-nbest", 100,
                              "Maximum proxies per keyword")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.decoder.graph import make_linear_word_acceptor
    from kaldi_tpu.fstext.fst import Arc, TropicalWeight, VectorFst
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.fstext.ops import (arcsort, compose, connect,
                                      project, rm_epsilon)
    l2xe = read_fst_file(po.get_arg(1))
    l1_inv = read_fst_file(po.get_arg(2))
    writer = TableWriter("fst", po.get_arg(4))
    n = err = 0
    for key, kw in SequentialTableReader("int-vector", po.get_arg(3)):
        acc = make_linear_word_acceptor([int(w) for w in kw])
        try:
            mid = connect(compose(acc, arcsort(l2xe, "ilabel")))
            full = connect(compose(mid, arcsort(l1_inv, "ilabel")))
            full = rm_epsilon(project(full, project_output=True))
        except Exception as e:
            warn(f"composition failed for {key}: {e}")
            err += 1
            continue
        if full.num_states == 0:
            warn(f"no proxies for {key}")
            err += 1
            continue
        # keep best paths within beam, up to nbest
        from kaldi_tpu.fstext.ops import shortest_distance
        dist = shortest_distance(full, reverse=True)
        best = dist[full.start] if full.start < len(dist) else 0.0
        # prune arcs whose best completion exceeds beam
        pruned = VectorFst(TropicalWeight)
        pruned.add_states(full.num_states)
        pruned.start = full.start
        fwd = shortest_distance(full)
        for s in range(full.num_states):
            pruned.finals[s] = full.finals[s]
            for a in full.arcs[s]:
                tot = fwd[s] + float(a.weight) + dist[a.nextstate]
                if tot <= best + beam[0]:
                    pruned.add_arc(s, a)
        pruned = connect(pruned)
        writer.write(key, pruned)
        n += 1
    writer.close()
    log(f"generated proxies for {n} keywords ({err} failed)")
    return 0 if n else 1


def print_proxy_keywords(argv: List[str]) -> int:
    po = ParseOptions(
        "Print proxy keyword paths as `kwid weight w1 w2 ...` lines "
        "(print-proxy-keywords.cc).\n"
        "Usage: print-proxy-keywords [options] <proxy-rspecifier> "
        "[<kwlist-wxfilename>]")
    nbest = po.register_value("nbest", 20,
                              "Maximum paths printed per keyword")
    po.read(argv)
    if po.num_args() < 1 or po.num_args() > 2:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.ops import _all_paths
    import sys as _sys
    out = (_sys.stdout if po.num_args() < 2 or po.get_arg(2) == "-"
           else open(po.get_arg(2), "w"))
    n = 0
    for key, fst in SequentialTableReader("fst", po.get_arg(1)):
        paths = _all_paths(fst, max_len=32, max_paths=2000)
        scored = sorted(((ols, w) for (_ils, ols), w in paths.items()),
                        key=lambda p: p[1])[:nbest[0]]
        for ols, w in scored:
            words = " ".join(str(x) for x in ols if x)
            out.write(f"{key} {float(w):.4f} {words}\n")
        n += 1
    if out is not _sys.stdout:
        out.close()
    log(f"printed proxies for {n} keywords")
    return 0 if n else 1


def ivector_extract_online2(argv: List[str]) -> int:
    po = ParseOptions(
        "Extract online i-vectors with speaker carry-over: the "
        "spk2utt map primes each utterance with the speaker's "
        "accumulated stats, as the online2 decoding pipeline does "
        "(ivector-extract-online2.cc).\n"
        "Usage: ivector-extract-online2 [options] <spk2utt-rspecifier> "
        "<extractor-in> <feats-rspecifier> <ivector-wspecifier>")
    period = po.register_value("ivector-period", 10,
                               "Frames between i-vector outputs")
    max_count = po.register_value(
        "max-count", 0.0, "Soft cap on the stats count (0 = none)")
    repeat = po.register_value(
        "repeat", False,
        "If true, output one row per frame instead of per period")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.extractor import (
        IvectorExtractor, OnlineIvectorEstimationStats)
    ex = kaldi_io.read_kaldi_object(IvectorExtractor.read,
                                    po.get_arg(2))
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(3))
    writer = TableWriter("matrix", po.get_arg(4))
    n = 0
    for spk, utts in SequentialTableReader("token-vector",
                                           po.get_arg(1)):
        stats = OnlineIvectorEstimationStats(ex,
                                             max_count=max_count[0])
        for u in utts:
            if u not in feats_reader:
                warn(f"no features for {u}")
                continue
            feats = np.asarray(feats_reader[u])
            rows = []
            step = 1 if repeat[0] else period[0]
            for t0 in range(0, feats.shape[0], step):
                stats.acc_frames(feats[t0:t0 + step])
                rows.append(stats.ivector())
            writer.write(u, np.stack(rows).astype(np.float32))
            n += 1
    writer.close()
    log(f"extracted online2 i-vectors for {n} utterances")
    return 0 if n else 1
