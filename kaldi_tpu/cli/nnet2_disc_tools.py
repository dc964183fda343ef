"""nnet2bin discriminative-training + decode CLIs:
nnet-get-egs-discriminative, nnet-copy-egs-discriminative,
nnet-shuffle-egs-discriminative, nnet-combine-egs-discriminative,
nnet-compare-hash-discriminative, nnet-train-discriminative-simple,
nnet-train-discriminative-parallel, nnet-align-compiled,
nnet-latgen-faster, nnet-latgen-faster-parallel (src/nnet2bin/*.cc)."""

from __future__ import annotations

import random as _random
from typing import List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def _deg_reader(rspec):
    from kaldi_tpu.nnet2.egs import DiscriminativeNnetExample
    return SequentialTableReader(DiscriminativeNnetExample, rspec)


def _deg_writer(wspec):
    from kaldi_tpu.nnet2.egs import DiscriminativeNnetExample
    return TableWriter(DiscriminativeNnetExample, wspec)


def _read_am(path):
    from kaldi_tpu.nnet2 import read_nnet2_am
    return read_nnet2_am(path)


def _pseudo_loglikes(am, feats):
    """nnet2 decodable: log posterior - log prior
    (nnet2/decodable-am-nnet.h)."""
    post = am.nnet.forward(np.asarray(feats, np.float32),
                           pad_input=True)
    pri = np.maximum(np.asarray(am.priors, np.float64), 1e-20)
    return (np.log(np.maximum(post, 1e-20)) - np.log(pri)[None, :]
            ).astype(np.float32)


def nnet_get_egs_discriminative(argv: List[str]) -> int:
    po = ParseOptions(
        "Get examples for discriminative nnet2 training: numerator "
        "alignment + denominator lattice + input frames, split at "
        "frames where the lattice passes through a single state and "
        "bounded by --max-length "
        "(nnet2bin/nnet-get-egs-discriminative.cc).\n"
        "Usage: nnet-get-egs-discriminative [options] <model> "
        "<features-rspecifier> <ali-rspecifier> <den-lat-rspecifier> "
        "<training-examples-out>")
    max_length = po.register_value(
        "max-length", 1024, "Maximum length (frames) of any example")
    criterion = po.register_value("criterion", "smbr",
                                  "smbr|mpfe|mmi (affects discarding)")
    drop_frames = po.register_value(
        "drop-frames", False, "For MMI, drop frames where the "
        "numerator is absent from the denominator lattice")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.lat.functions import lattice_state_times
    from kaldi_tpu.lat.kaldi_lattice import (CompactLatticeHolder,
                                             compact_to_lattice,
                                             lattice_to_compact)
    from kaldi_tpu.nnet2.egs import DiscriminativeNnetExample
    tm, am = _read_am(po.get_arg(1))
    lc, rc = am.nnet.left_context(), am.nnet.right_context()
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(3))
    lat_reader = RandomAccessTableReader(CompactLatticeHolder(),
                                         po.get_arg(4))
    writer = _deg_writer(po.get_arg(5))
    n_utt = n_egs = n_err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in ali_reader or key not in lat_reader:
            n_err += 1
            continue
        ali = list(ali_reader[key])
        clat = lat_reader[key]
        lat = compact_to_lattice(clat)
        T = min(len(ali), feats.shape[0])
        feats = np.asarray(feats, np.float32)
        padded = np.concatenate(
            [np.repeat(feats[:1], lc, axis=0), feats[:T],
             np.repeat(feats[T - 1:T], rc, axis=0)])
        times = lattice_state_times(lat)
        # split points: frame boundaries crossed by exactly one state
        counts = np.zeros(T + 1, np.int64)
        for s in range(lat.num_states):
            if 0 <= times[s] <= T:
                counts[times[s]] += 1
        cuts = [0]
        for t in range(1, T):
            if counts[t] == 1 and t - cuts[-1] >= 1 and \
                    (t - cuts[-1] >= max_length[0] // 2
                     or t - cuts[-1] >= max_length[0]):
                cuts.append(t)
        cuts.append(T)
        # fall back to whole utterance when no single-state cut exists
        if len(cuts) == 2 and T > max_length[0]:
            warn(f"{key}: {T} frames > max-length {max_length[0]} "
                 f"but no single-state split point; keeping whole")
        state_at = {}
        for s in range(lat.num_states):
            state_at.setdefault(times[s], []).append(s)
        for ci in range(len(cuts) - 1):
            t0, t1 = cuts[ci], cuts[ci + 1]
            if len(cuts) == 2:
                sub_lat = lat
            else:
                sub_lat = _extract_sublattice(lat, times, t0, t1)
                if sub_lat is None:
                    sub_lat = lat if ci == 0 and len(cuts) == 2 else None
            if sub_lat is None:
                n_err += 1
                continue
            eg = DiscriminativeNnetExample(
                1.0, ali[t0:t1], lattice_to_compact(sub_lat),
                padded[t0:t1 + lc + rc], lc)
            writer.write(f"{key}-{ci}" if len(cuts) > 2 else key, eg)
            n_egs += 1
        n_utt += 1
    writer.close()
    log(f"nnet-get-egs-discriminative: {n_egs} examples from "
        f"{n_utt} utterances ({n_err} errors) "
        f"[criterion={criterion[0]}, drop-frames={drop_frames[0]}]")
    return 0 if n_egs else 1


def _extract_sublattice(lat, times, t0, t1):
    """Sub-lattice covering frames [t0, t1): states with t0 <= time <=
    t1, entered at the unique time-t0 state, final at time-t1 states."""
    from kaldi_tpu.fstext.fst import Arc, LatticeWeight
    from kaldi_tpu.lat.kaldi_lattice import Lattice
    keep = [s for s in range(lat.num_states) if t0 <= times[s] <= t1]
    entry = [s for s in keep if times[s] == t0]
    if t0 == 0:
        entry = [lat.start]
    if len(entry) != 1:
        return None
    remap = {s: i for i, s in enumerate(keep)}
    sub = Lattice(semiring=LatticeWeight)
    for _ in keep:
        sub.add_state()
    sub.set_start(remap[entry[0]])
    for s in keep:
        if times[s] == t1:
            sub.finals[remap[s]] = (0.0, 0.0)
            continue
        for a in lat.arcs[s]:
            if a.nextstate in remap:
                sub.add_arc(remap[s], Arc(a.ilabel, a.olabel,
                                          a.weight, remap[a.nextstate]))
    return sub


def nnet_copy_egs_discriminative(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy discriminative nnet2 examples, round-robin over "
        "outputs (nnet2bin/nnet-copy-egs-discriminative.cc).\n"
        "Usage: nnet-copy-egs-discriminative [options] "
        "<egs-rspecifier> <egs-wspecifier1> [<egs-wspecifier2> ...]")
    random = po.register_value("random", False,
                               "Write to a random output")
    srand = po.register_value("srand", 0, "Random seed")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    writers = [_deg_writer(po.get_arg(i))
               for i in range(2, po.num_args() + 1)]
    rng = _random.Random(srand[0])
    n = 0
    for key, eg in _deg_reader(po.get_arg(1)):
        idx = rng.randrange(len(writers)) if random[0] \
            else n % len(writers)
        writers[idx].write(key, eg)
        n += 1
    for w in writers:
        w.close()
    log(f"nnet-copy-egs-discriminative: copied {n} examples")
    return 0 if n else 1


def nnet_shuffle_egs_discriminative(argv: List[str]) -> int:
    po = ParseOptions(
        "Shuffle discriminative nnet2 examples "
        "(nnet2bin/nnet-shuffle-egs-discriminative.cc).\n"
        "Usage: nnet-shuffle-egs-discriminative [options] "
        "<egs-rspecifier> <egs-wspecifier>")
    srand = po.register_value("srand", 0, "Random seed")
    buffer_size = po.register_value("buffer-size", 0,
                                    "If >0, bounded-buffer shuffle")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    rng = _random.Random(srand[0])
    writer = _deg_writer(po.get_arg(2))
    n = 0
    if buffer_size[0] > 0:
        buf = []
        for kv in _deg_reader(po.get_arg(1)):
            if len(buf) < buffer_size[0]:
                buf.append(kv)
            else:
                i = rng.randrange(buffer_size[0])
                writer.write(*buf[i])
                n += 1
                buf[i] = kv
        rng.shuffle(buf)
    else:
        buf = list(_deg_reader(po.get_arg(1)))
        rng.shuffle(buf)
    for key, eg in buf:
        writer.write(key, eg)
        n += 1
    writer.close()
    log(f"nnet-shuffle-egs-discriminative: shuffled {n} examples")
    return 0 if n else 1


def nnet_combine_egs_discriminative(argv: List[str]) -> int:
    po = ParseOptions(
        "Combine successive discriminative examples when their "
        "combined length stays under --max-length "
        "(nnet2bin/nnet-combine-egs-discriminative.cc).  Combination "
        "concatenates alignments/frames and unions the lattices "
        "shifted in time.\n"
        "Usage: nnet-combine-egs-discriminative [options] "
        "<egs-rspecifier> <egs-wspecifier>")
    max_length = po.register_value("max-length", 512,
                                   "Maximum combined length (frames)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.fst import Arc
    from kaldi_tpu.lat.kaldi_lattice import (CompactLattice,
                                             compact_to_lattice,
                                             lattice_to_compact)
    from kaldi_tpu.lat.functions import lattice_state_times
    from kaldi_tpu.lat.kaldi_lattice import Lattice
    from kaldi_tpu.nnet2.egs import DiscriminativeNnetExample
    writer = _deg_writer(po.get_arg(2))
    pending = None
    pending_key = None
    n_in = n_out = 0

    def concat(a, b):
        """Serial concatenation of the two den lattices (b shifted)."""
        from kaldi_tpu.fstext.fst import LatticeWeight
        la = compact_to_lattice(a.den_lat)
        lb = compact_to_lattice(b.den_lat)
        out = Lattice(semiring=LatticeWeight)
        na = la.num_states
        for _ in range(na + lb.num_states):
            out.add_state()
        out.set_start(la.start)
        for s in range(na):
            for arc in la.arcs[s]:
                out.add_arc(s, arc)
        for s in range(lb.num_states):
            for arc in lb.arcs[s]:
                out.add_arc(na + s, Arc(arc.ilabel, arc.olabel,
                                        arc.weight,
                                        na + arc.nextstate))
            w = lb.finals[s]
            if w is not None and w != lb.semiring.zero:
                out.finals[na + s] = w
        from kaldi_tpu.fstext.fst import EPS, LatticeWeight
        for s in range(na):
            w = la.finals[s]
            if w is not None and w != la.semiring.zero:
                out.add_arc(s, Arc(EPS, EPS, w, na + lb.start))
        lc = a.left_context
        frames = np.concatenate(
            [a.input_frames[:lc + len(a.num_ali)],
             b.input_frames[b.left_context:]])
        return DiscriminativeNnetExample(
            a.weight, list(a.num_ali) + list(b.num_ali),
            lattice_to_compact(out), frames, lc)

    for key, eg in _deg_reader(po.get_arg(1)):
        n_in += 1
        if pending is None:
            pending, pending_key = eg, key
        elif (len(pending.num_ali) + len(eg.num_ali) <= max_length[0]
              and pending.weight == eg.weight
              and pending.left_context == eg.left_context
              and pending.input_frames.shape[1]
              == eg.input_frames.shape[1]):
            pending = concat(pending, eg)
        else:
            writer.write(pending_key, pending)
            n_out += 1
            pending, pending_key = eg, key
    if pending is not None:
        writer.write(pending_key, pending)
        n_out += 1
    writer.close()
    log(f"nnet-combine-egs-discriminative: {n_in} -> {n_out} examples")
    return 0 if n_out else 1


def nnet_compare_hash_discriminative(argv: List[str]) -> int:
    po = ParseOptions(
        "Compare two archives of discriminative examples by "
        "structure hash (nnet2bin/nnet-compare-hash-discriminative.cc)"
        ".\nUsage: nnet-compare-hash-discriminative [options] "
        "<model-rxfilename> <egs-rspecifier1> <egs-rspecifier2>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    h1 = {k: eg.hash_value() for k, eg in _deg_reader(po.get_arg(2))}
    h2 = {k: eg.hash_value() for k, eg in _deg_reader(po.get_arg(3))}
    n_match = sum(1 for k in h1 if h2.get(k) == h1[k])
    n_union = len(set(h1) | set(h2))
    log(f"hash comparison: {n_match}/{n_union} matching")
    if n_match == n_union:
        print("equal")
        return 0
    print("differ")
    return 1


def _train_discriminative(argv: List[str], name: str,
                          parallel: bool) -> int:
    po = ParseOptions(
        f"Train nnet2 parameters with a discriminative objective "
        f"(MMI, sMBR or MPFE) from examples made by "
        f"nnet-get-egs-discriminative (nnet2bin/{name}.cc).  The "
        f"denominator lattice's acoustic scores are recomputed from "
        f"the current model before each forward-backward.\n"
        f"Usage: {name} [options] <model-in> "
        f"<training-examples-in> <model-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    criterion = po.register_value("criterion", "smbr",
                                  "smbr|mpfe|mmi")
    acoustic_scale = po.register_value("acoustic-scale", 0.1,
                                       "Acoustic probability scale")
    one_silence_class = po.register_value(
        "one-silence-class", False, "All silence phones count as one "
        "class for accuracy")
    silence_phones_str = po.register_value(
        "silence-phones", "", "Colon-separated silence phone ids")
    boost = po.register_value("boost", 0.0,
                              "Boosting factor for boosted MMI")
    num_threads = po.register_value(
        "num-threads", 4, "Training threads (parallel variant only)")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.fst import EPS
    from kaldi_tpu.lat.kaldi_lattice import compact_to_lattice
    from kaldi_tpu.nnet2.train import (apply_update, backprop,
                                       forward_store)
    from kaldi_tpu.nnet3.discriminative import (
        DiscriminativeOptions, compute_discriminative_objf_and_grad)
    tm, am = _read_am(po.get_arg(1))
    opts = DiscriminativeOptions(
        criterion=criterion[0], acoustic_scale=acoustic_scale[0],
        one_silence_class=one_silence_class[0],
        silence_phones=[int(p) for p in
                        silence_phones_str[0].split(":") if p])
    pri = np.maximum(np.asarray(am.priors, np.float64), 1e-20)
    num_pdfs = tm.num_pdfs
    tot_objf = tot_frames = 0.0
    lock = None
    if parallel:
        import threading
        lock = threading.Lock()

    def train_eg(eg):
        nonlocal tot_objf, tot_frames
        x = eg.input_frames
        if eg.spk_info.size:
            x = np.concatenate(
                [x, np.broadcast_to(eg.spk_info,
                                    (x.shape[0], eg.spk_info.size))],
                axis=1)
        acts = forward_store(am.nnet, x[None])
        y = acts[-1][0]                           # (T, num_pdfs)
        T = len(eg.num_ali)
        if y.shape[0] != T:
            warn(f"output rows {y.shape[0]} != {T} labeled frames "
                 f"(check example context)")
            return
        loglikes = np.log(np.maximum(y, 1e-20)) - np.log(pri)[None, :]
        lat = compact_to_lattice(eg.den_lat)
        # replace acoustic scores with the current model's
        from kaldi_tpu.lat.functions import lattice_state_times
        times = lattice_state_times(lat)
        for s in range(lat.num_states):
            t = times[s]
            for i, a in enumerate(lat.arcs[s]):
                if a.ilabel != EPS and t < T:
                    pdf = tm.transition_id_to_pdf(a.ilabel)
                    g, _ac = a.weight
                    lat.arcs[s][i] = type(a)(
                        a.ilabel, a.olabel,
                        (g, float(-loglikes[t, pdf])), a.nextstate)
        objf, grad = compute_discriminative_objf_and_grad(
            opts, tm, eg.num_ali, lat, num_pdfs)
        # d objf / d y = (d objf / d loglike) / y
        dy = np.zeros_like(acts[-1])
        dy[0] = eg.weight * grad / np.maximum(y, 1e-20)
        if lock is not None:
            lock.acquire()
        try:
            _, grads = backprop(am.nnet, acts, dy, store_stats=True)
            for comp, g in zip(am.nnet.components, grads):
                if g is not None:
                    apply_update(comp, g)
            tot_objf += objf * T * eg.weight
            tot_frames += T * eg.weight
        finally:
            if lock is not None:
                lock.release()

    if parallel:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=num_threads[0]) as pool:
            list(pool.map(lambda kv: train_eg(kv[1]),
                          _deg_reader(po.get_arg(2))))
    else:
        for _key, eg in _deg_reader(po.get_arg(2)):
            train_eg(eg)
    log(f"{name}: [{criterion[0]}] average objf "
        f"{tot_objf / max(tot_frames, 1e-20):.4f} over "
        f"{tot_frames:.0f} frames"
        + (f" (boost={boost[0]})" if boost[0] else ""))
    from kaldi_tpu.nnet2 import write_nnet2_am
    write_nnet2_am(po.get_arg(3), tm, am, binary[0])
    return 0 if tot_frames > 0 else 1


def nnet_train_discriminative_simple(argv: List[str]) -> int:
    return _train_discriminative(argv,
                                 "nnet-train-discriminative-simple",
                                 parallel=False)


def nnet_train_discriminative_parallel(argv: List[str]) -> int:
    return _train_discriminative(argv,
                                 "nnet-train-discriminative-parallel",
                                 parallel=True)


# ---------------------------------------------------------------------------
# decode / align


def nnet_align_compiled(argv: List[str]) -> int:
    po = ParseOptions(
        "Align features given an nnet2 model "
        "(nnet2bin/nnet-align-compiled.cc).\n"
        "Usage: nnet-align-compiled [options] <model-in> "
        "<graphs-rspecifier> <feature-rspecifier> "
        "<alignments-wspecifier>")
    beam = po.register_value("beam", 10.0, "Decoding beam")
    retry_beam = po.register_value("retry-beam", 40.0,
                                   "Second-try beam")
    acoustic_scale = po.register_value("acoustic-scale", 0.1,
                                       "Acoustic scale")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.decoder.viterbi import (FasterDecoder,
                                           FasterDecoderOptions)
    from kaldi_tpu.fstext.fst import VectorFst
    tm, am = _read_am(po.get_arg(1))
    graphs = RandomAccessTableReader(VectorFst, po.get_arg(2))
    writer = TableWriter("int-vector", po.get_arg(4))
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(3)):
        if key not in graphs:
            warn(f"no graph for {key}")
            err += 1
            continue
        loglikes = _pseudo_loglikes(am, feats)
        graph = graphs[key]
        res = FasterDecoder(graph, FasterDecoderOptions(
            beam=beam[0])).decode(loglikes, tm.id2pdf_id,
                                  acoustic_scale[0])
        if res is None and retry_beam[0] > beam[0]:
            res = FasterDecoder(graph, FasterDecoderOptions(
                beam=retry_beam[0])).decode(loglikes, tm.id2pdf_id,
                                            acoustic_scale[0])
        if res is None:
            warn(f"alignment failed for {key}")
            err += 1
            continue
        writer.write(key, res[0])
        n += 1
    writer.close()
    log(f"nnet-align-compiled: aligned {n} utterances ({err} failed)")
    return 0 if n else 1


def _latgen(argv: List[str], name: str) -> int:
    po = ParseOptions(
        f"Generate lattices with an nnet2 model "
        f"(nnet2bin/{name}.cc).\n"
        f"Usage: {name} [options] <nnet-in> <fst-in> "
        f"<features-rspecifier> <lattice-wspecifier> "
        f"[<words-wspecifier> [<alignments-wspecifier>]]")
    from kaldi_tpu.decoder.lattice_decoder import (
        LatticeFasterDecoder, LatticeFasterDecoderOptions)
    dopts = LatticeFasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value("acoustic-scale", 0.1,
                                       "Acoustic scale")
    allow_partial = po.register_value("allow-partial", False,
                                      "Output partial hypotheses")
    num_threads = po.register_value(
        "num-threads", 1, "Decoding threads (the -parallel variant)")
    po.read(argv)
    if po.num_args() < 4:
        po.print_usage()
        return 1
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    from kaldi_tpu.lat.functions import (determinize_lattice,
                                         lattice_best_path)
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    tm, am = _read_am(po.get_arg(1))
    hclg = read_fst_file(po.get_arg(2))
    lat_writer = TableWriter(LatticeHolder(), po.get_arg(4))
    word_writer = (TableWriter("int-vector", po.get_arg(5))
                   if po.num_args() >= 5 else None)
    ali_writer = (TableWriter("int-vector", po.get_arg(6))
                  if po.num_args() >= 6 else None)
    dec = LatticeFasterDecoder(hclg, dopts)

    def decode_one(key, feats):
        loglikes = _pseudo_loglikes(am, feats)
        lat = dec.decode(loglikes, tm.id2pdf_id, acoustic_scale[0])
        return key, lat

    n = err = 0
    work = SequentialTableReader("matrix", po.get_arg(3))
    if num_threads[0] > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=num_threads[0]) as pool:
            results = pool.map(lambda kv: decode_one(*kv), work)
            results = list(results)
    else:
        results = (decode_one(k, f) for k, f in work)
    for key, lat in results:
        if lat is None:
            err += 1
            continue
        out_lat = determinize_lattice(lat) \
            if dopts.determinize_lattice else lat
        lat_writer.write(key, out_lat)
        if word_writer or ali_writer:
            tids, words, _ = lattice_best_path(lat)
            if word_writer:
                word_writer.write(key, words)
            if ali_writer:
                ali_writer.write(key, tids)
        n += 1
    lat_writer.close()
    if word_writer:
        word_writer.close()
    if ali_writer:
        ali_writer.close()
    log(f"{name}: decoded {n} utterances ({err} failed)")
    return 0 if n else 1


def nnet_latgen_faster(argv: List[str]) -> int:
    return _latgen(argv, "nnet-latgen-faster")


def nnet_latgen_faster_parallel(argv: List[str]) -> int:
    return _latgen(argv, "nnet-latgen-faster-parallel")
