"""bin-equivalent alignment/scoring CLIs: align-equal-compiled,
ali-to-phones, ali-to-pdf, copy-int-vector, compute-wer, align-text."""

from __future__ import annotations

import sys
from typing import List

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.cli.gmm_tools import read_am_gmm
from kaldi_tpu.fstext.fst import VectorFst
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.edit_distance import WerStats, align_text as _align_text
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def align_equal_compiled(argv: List[str]) -> int:
    po = ParseOptions("Write an equally spaced alignment (for getting training started)\n"
                      "Usage: align-equal-compiled <graphs-rspecifier> <features-rspecifier> <alignments-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.decoder.viterbi import align_equal

    class _TmShim:
        pass

    graphs = RandomAccessTableReader(VectorFst, po.get_arg(1))
    writer = TableWriter("int-vector", po.get_arg(3))
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in graphs:
            warn(f"no graph for {key}")
            err += 1
            continue
        ali = align_equal(graphs[key], feats.shape[0], None, seed=n + err)
        if ali is None:
            err += 1
            continue
        writer.write(key, ali)
        n += 1
    writer.close()
    log(f"equal-aligned {n} utterances ({err} failed)")
    return 0 if n else 1


def ali_to_phones(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert model-level alignments to phone-sequences (in integer, "
        "not symbolic, form)\n"
        "Usage: ali-to-phones [options] <model> <alignments-rspecifier> <phone-transcript-wspecifier>")
    per_frame = po.register_value("per-frame", False, "If true, write out the frame-level phone alignment")
    write_lengths = po.register_value("write-lengths", False, "If true, write the #frames for each phone (different format)")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    tm, _ = read_am_gmm(po.get_arg(1))
    holder = "int-pair-vector" if write_lengths[0] else "int-vector"
    writer = TableWriter(holder, po.get_arg(3))
    for key, ali in SequentialTableReader("int-vector", po.get_arg(2)):
        if per_frame[0]:
            writer.write(key, [tm.transition_id_to_phone(t) for t in ali])
            continue
        segs = []  # (phone, length)
        for t in ali:
            phone = tm.transition_id_to_phone(t)
            is_start = (tm.transition_id_to_hmm_state(t) == 0
                        and not tm.is_self_loop(t))
            if is_start or not segs:
                segs.append([phone, 1])
            else:
                segs[-1][1] += 1
        if write_lengths[0]:
            writer.write(key, [(p, l) for p, l in segs])
        else:
            writer.write(key, [p for p, _ in segs])
    writer.close()
    return 0


def ali_to_pdf(argv: List[str]) -> int:
    po = ParseOptions("Converts alignments (containing transition-ids) to pdf-ids, zero-based.\n"
                      "Usage: ali-to-pdf [options] <model> <alignments-rspecifier> <pdfs-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    tm, _ = read_am_gmm(po.get_arg(1))
    writer = TableWriter("int-vector", po.get_arg(3))
    for key, ali in SequentialTableReader("int-vector", po.get_arg(2)):
        writer.write(key, [int(p) for p in tm.transition_ids_to_pdfs(ali)])
    writer.close()
    return 0


def copy_int_vector(argv: List[str]) -> int:
    po = ParseOptions("Copy archives of vectors of integers, or archives of single integers\n"
                      "Usage: copy-int-vector [options] <vector-rspecifier> <vector-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter("int-vector", po.get_arg(2))
    n = 0
    for key, vec in SequentialTableReader("int-vector", po.get_arg(1)):
        writer.write(key, vec)
        n += 1
    writer.close()
    log(f"copied {n} vectors of int32.")
    return 0


def compute_wer(argv: List[str]) -> int:
    po = ParseOptions(
        "Compute WER by comparing different transcriptions\n"
        "Usage: compute-wer [options] <ref-rspecifier> <hyp-rspecifier>\n"
        "E.g.: compute-wer --text --mode=present ark:data/train/text ark:hyp_text")
    mode = po.register_value("mode", "strict", "Scoring mode: strict|present|all")
    text = po.register_value("text", True, "Deprecated option! Keeping for compatibility")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    refs = dict(SequentialTableReader("token-vector", po.get_arg(1)))
    hyps = dict(SequentialTableReader("token-vector", po.get_arg(2)))
    stats = WerStats()
    absent = 0
    for key, ref in refs.items():
        if key not in hyps:
            absent += 1
            if mode[0] == "present":
                continue
            if mode[0] == "strict":
                print(f"compute-wer: no hypothesis for key {key}",
                      file=sys.stderr)
                return 1
            stats.add(ref, [])
            continue
        stats.add(ref, hyps[key])
    print(stats.report())
    print(f"%SER {100.0 * stats.wrong_sentences / max(stats.sentences, 1):.2f} "
          f"[ {stats.wrong_sentences} / {stats.sentences} ]")
    if absent:
        print(f"{absent} absent sentences.", file=sys.stderr)
    return 0


def align_text(argv: List[str]) -> int:
    po = ParseOptions(
        "Computes alignment between two sentences with the same key in the\n"
        "two given input text-rspecifiers.\n"
        "Usage: align-text [options] <text1-rspecifier> <text2-rspecifier> <alignment-wspecifier>")
    special_symbol = po.register_value("special-symbol", "<eps>", "Special symbol to be aligned with the inserted or deleted words")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    t1 = dict(SequentialTableReader("token-vector", po.get_arg(1)))
    t2 = RandomAccessTableReader("token-vector", po.get_arg(2))
    writer = TableWriter("token-vector", po.get_arg(3))
    for key, ref in t1.items():
        if key not in t2:
            continue
        pairs = _align_text(ref, t2[key], special_symbol[0])
        toks = []
        for r, h in pairs:
            toks.extend([r, h, ";"])
        writer.write(key, toks[:-1] if toks else [])
    writer.close()
    return 0


def ali_to_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert alignments to posteriors (weight 1.0 per frame)\n"
        "Usage: ali-to-post [options] <alignments-rspecifier> "
        "<posteriors-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter("posterior", po.get_arg(2))
    n = 0
    for key, ali in SequentialTableReader("int-vector", po.get_arg(1)):
        writer.write(key, [[(int(t), 1.0)] for t in ali])
        n += 1
    writer.close()
    log(f"converted {n} alignments to posteriors")
    return 0 if n else 1


def weight_silence_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Apply weight to silence phones' posterior entries\n"
        "Usage: weight-silence-post [options] <silence-weight> "
        "<silence-phones-csl> <model> <posteriors-rspecifier> "
        "<posteriors-wspecifier>")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    weight = float(po.get_arg(1))
    sil = {int(p) for p in po.get_arg(2).split(":")}
    tm, _am = read_am_gmm(po.get_arg(3))
    writer = TableWriter("posterior", po.get_arg(5))
    n = 0
    for key, post in SequentialTableReader("posterior", po.get_arg(4)):
        out = []
        for frame in post:
            new = []
            for tid, w in frame:
                if tm.transition_id_to_phone(tid) in sil:
                    if weight > 0:
                        new.append((tid, w * weight))
                else:
                    new.append((tid, w))
            out.append(new)
        writer.write(key, out)
        n += 1
    writer.close()
    log(f"reweighted {n} posteriors")
    return 0 if n else 1


def post_to_weights(argv: List[str]) -> int:
    po = ParseOptions(
        "Turn posteriors into per-frame weights (sum of entries)\n"
        "Usage: post-to-weights <post-rspecifier> <weights-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    import numpy as np
    writer = TableWriter("vector", po.get_arg(2))
    n = 0
    for key, post in SequentialTableReader("posterior", po.get_arg(1)):
        writer.write(key, np.array([sum(w for _, w in frame)
                                    for frame in post], np.float32))
        n += 1
    writer.close()
    return 0 if n else 1


def show_alignments(argv: List[str]) -> int:
    po = ParseOptions(
        "Display alignments in human-readable phone-segment form\n"
        "Usage: show-alignments <phones-symbol-table> <model> "
        "<alignments-rspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.decoder.lang_dir import read_symbol_table
    syms = {i: w for w, i in
            read_symbol_table(po.get_arg(1)).items()}
    tm, _am = read_am_gmm(po.get_arg(2))
    for key, ali in SequentialTableReader("int-vector", po.get_arg(3)):
        segs = []
        for tid in ali:
            ph = tm.transition_id_to_phone(tid)
            start = (tm.transition_id_to_hmm_state(tid) == 0
                     and not tm.is_self_loop(tid))
            if start or not segs or segs[-1][0] != ph:
                segs.append([ph, 1])
            else:
                segs[-1][1] += 1
        pretty = " ".join(f"{syms.get(p, p)}({d})" for p, d in segs)
        print(f"{key} {pretty}")
    return 0
