"""nnet2bin egs + compute CLIs: nnet-get-egs, nnet-get-weighted-egs,
nnet-copy-egs, nnet-shuffle-egs, nnet-subset-egs, nnet-relabel-egs,
nnet-compute, nnet-compute-from-egs, nnet-compute-prob
(src/nnet2bin/*.cc)."""

from __future__ import annotations

import random as _random
from typing import List

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def _eg_reader(rspec):
    from kaldi_tpu.nnet2.egs import NnetExample
    return SequentialTableReader(NnetExample, rspec)


def _eg_writer(wspec):
    from kaldi_tpu.nnet2.egs import NnetExample
    return TableWriter(NnetExample, wspec)


def nnet_get_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Get frame-by-frame examples of data for neural network "
        "training (a format change from features + pdf posteriors; "
        "nnet2bin/nnet-get-egs.cc).\n"
        "Usage: nnet-get-egs [options] <features-rspecifier> "
        "<pdf-post-rspecifier> <training-examples-out>")
    left_context = po.register_value(
        "left-context", 0, "Number of frames of left context")
    right_context = po.register_value(
        "right-context", 0, "Number of frames of right context")
    num_frames = po.register_value(
        "num-frames", 1, "Number of frames with labels that each "
        "example contains")
    const_feat_dim = po.register_value(
        "const-feat-dim", 0, "If specified, the last const-feat-dim "
        "dims of the feature input are treated as constant over the "
        "example (stored as spk_info)")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2.egs import extract_egs
    post_reader = RandomAccessTableReader("posterior", po.get_arg(2))
    writer = _eg_writer(po.get_arg(3))
    n_utt = n_egs = n_miss = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(1)):
        if key not in post_reader:
            n_miss += 1
            continue
        egs = extract_egs(np.asarray(feats), post_reader[key],
                          left_context[0], right_context[0],
                          frames_per_eg=num_frames[0],
                          const_feat_dim=const_feat_dim[0])
        for i, eg in enumerate(egs):
            writer.write(f"{key}-{i}", eg)
        n_utt += 1
        n_egs += len(egs)
    writer.close()
    log(f"nnet-get-egs: wrote {n_egs} examples from {n_utt} "
        f"utterances ({n_miss} missing posteriors)")
    return 0 if n_egs else 1


def nnet_get_weighted_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Get frame-by-frame training examples with per-frame weights "
        "(nnet2bin/nnet-get-weighted-egs.cc).\n"
        "Usage: nnet-get-weighted-egs [options] <features-rspecifier> "
        "<pdf-post-rspecifier> <weights-rspecifier> "
        "<training-examples-out>")
    left_context = po.register_value("left-context", 0,
                                     "Frames of left context")
    right_context = po.register_value("right-context", 0,
                                      "Frames of right context")
    num_frames = po.register_value("num-frames", 1,
                                   "Labeled frames per example")
    const_feat_dim = po.register_value(
        "const-feat-dim", 0, "Trailing feature dims stored as "
        "constant spk_info")
    keep_proportion = po.register_value(
        "keep-proportion", 1.0, "If <1.0, keep this proportion of "
        "examples")
    srand = po.register_value("srand", 0, "Random seed")
    weight_threshold = po.register_value(
        "weight-threshold", 0.0, "Keep only frames with weights "
        "above this threshold")
    use_frame_selection = po.register_value(
        "use-frame-selection", True, "Remove frames below threshold")
    use_frame_weights = po.register_value(
        "use-frame-weights", False, "Scale derivatives by the weight")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2.egs import extract_egs
    post_reader = RandomAccessTableReader("posterior", po.get_arg(2))
    wt_reader = RandomAccessTableReader("vector", po.get_arg(3))
    writer = _eg_writer(po.get_arg(4))
    rng = np.random.RandomState(srand[0])
    n_utt = n_egs = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(1)):
        if key not in post_reader or key not in wt_reader:
            continue
        w = np.asarray(wt_reader[key], np.float64)
        if use_frame_selection[0]:
            sel = (w > weight_threshold[0]).astype(np.float64)
        else:
            sel = np.ones_like(w)
        fw = w * sel if use_frame_weights[0] else sel
        egs = extract_egs(np.asarray(feats), post_reader[key],
                          left_context[0], right_context[0],
                          frames_per_eg=num_frames[0],
                          const_feat_dim=const_feat_dim[0],
                          frame_weights=fw,
                          keep_proportion=keep_proportion[0], rng=rng)
        for i, eg in enumerate(egs):
            writer.write(f"{key}-{i}", eg)
        n_utt += 1
        n_egs += len(egs)
    writer.close()
    log(f"nnet-get-weighted-egs: wrote {n_egs} examples from "
        f"{n_utt} utterances")
    return 0 if n_egs else 1


def nnet_copy_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy nnet2 training examples, round-robin over multiple "
        "outputs (nnet2bin/nnet-copy-egs.cc).\n"
        "Usage: nnet-copy-egs [options] <egs-rspecifier> "
        "<egs-wspecifier1> [<egs-wspecifier2> ...]")
    random = po.register_value(
        "random", False, "If true, write to a random output instead "
        "of round-robin")
    keep_proportion = po.register_value(
        "keep-proportion", 1.0, "If <1.0 keep this proportion; if "
        ">1.0, duplicate with this expectation")
    srand = po.register_value("srand", 0, "Random seed")
    frame_str = po.register_value(
        "frame", "", "If set to a number, select this single labeled "
        "frame of each example; 'random' picks one at random")
    left_context = po.register_value(
        "left-context", -1, "Truncate feature left context")
    right_context = po.register_value(
        "right-context", -1, "Truncate feature right context")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    writers = [_eg_writer(po.get_arg(i))
               for i in range(2, po.num_args() + 1)]
    rng = _random.Random(srand[0])
    n_in = n_out = 0
    for key, eg in _eg_reader(po.get_arg(1)):
        n_in += 1
        # how many copies (expectation keep_proportion)
        kp = keep_proportion[0]
        count = int(kp) + (1 if rng.random() < kp - int(kp) else 0)
        for _ in range(count):
            if frame_str[0]:
                t = rng.randrange(eg.num_frames) \
                    if frame_str[0] == "random" else int(frame_str[0])
                out_eg = eg.subrange(t, 1, left_context[0],
                                     right_context[0])
            elif left_context[0] >= 0 or right_context[0] >= 0:
                out_eg = eg.subrange(0, eg.num_frames, left_context[0],
                                     right_context[0])
            else:
                out_eg = eg
            idx = rng.randrange(len(writers)) if random[0] \
                else n_out % len(writers)
            writers[idx].write(key, out_eg)
            n_out += 1
    for w in writers:
        w.close()
    log(f"nnet-copy-egs: read {n_in}, wrote {n_out} examples to "
        f"{len(writers)} outputs")
    return 0 if n_out else 1


def nnet_shuffle_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Shuffle the order of nnet2 training examples "
        "(nnet2bin/nnet-shuffle-egs.cc).\n"
        "Usage: nnet-shuffle-egs [options] <egs-rspecifier> "
        "<egs-wspecifier>")
    srand = po.register_value("srand", 0, "Random seed")
    buffer_size = po.register_value(
        "buffer-size", 0, "If >0, shuffle with a fixed-size buffer "
        "instead of keeping everything in memory")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    rng = _random.Random(srand[0])
    writer = _eg_writer(po.get_arg(2))
    n = 0
    if buffer_size[0] > 0:
        buf = []
        for key, eg in _eg_reader(po.get_arg(1)):
            if len(buf) < buffer_size[0]:
                buf.append((key, eg))
            else:
                i = rng.randrange(buffer_size[0])
                writer.write(*buf[i])
                n += 1
                buf[i] = (key, eg)
        rng.shuffle(buf)
        for key, eg in buf:
            writer.write(key, eg)
            n += 1
    else:
        pairs = list(_eg_reader(po.get_arg(1)))
        rng.shuffle(pairs)
        for key, eg in pairs:
            writer.write(key, eg)
            n += 1
    writer.close()
    log(f"nnet-shuffle-egs: shuffled {n} examples")
    return 0 if n else 1


def nnet_subset_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Creates a random subset of the input examples of a specified "
        "size; uses no more memory than the subset "
        "(reservoir sampling; nnet2bin/nnet-subset-egs.cc).\n"
        "Usage: nnet-subset-egs [options] <egs-rspecifier> "
        "<egs-wspecifier>")
    srand = po.register_value("srand", 0, "Random seed")
    n_opt = po.register_value("n", 1000, "Number of examples to output")
    randomize_order = po.register_value(
        "randomize-order", True, "If true, randomize the output order")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    rng = _random.Random(srand[0])
    reservoir = []
    seen = 0
    for key, eg in _eg_reader(po.get_arg(1)):
        if len(reservoir) < n_opt[0]:
            reservoir.append((key, eg))
        else:
            j = rng.randrange(seen + 1)
            if j < n_opt[0]:
                reservoir[j] = (key, eg)
        seen += 1
    if randomize_order[0]:
        rng.shuffle(reservoir)
    writer = _eg_writer(po.get_arg(2))
    for key, eg in reservoir:
        writer.write(key, eg)
    writer.close()
    log(f"nnet-subset-egs: selected {len(reservoir)} of {seen}")
    return 0 if reservoir else 1


def nnet_relabel_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Relabel nnet2 egs with new pdf-id alignments; example keys "
        "must be <utt>-<frame> as written by nnet-get-egs "
        "(nnet2bin/nnet-relabel-egs.cc).\n"
        "Usage: nnet-relabel-egs [options] <pdf-ali-rspecifier> "
        "<egs-rspecifier1> ... <egs-wspecifier1> ...")
    po.read(argv)
    n_args = po.num_args()
    if n_args < 3 or (n_args - 1) % 2 != 0:
        po.print_usage()
        return 1
    half = (n_args - 1) // 2
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(1))
    n = n_relabel = n_miss = 0
    for i in range(half):
        writer = _eg_writer(po.get_arg(2 + half + i))
        for key, eg in _eg_reader(po.get_arg(2 + i)):
            utt, _, frame_s = key.rpartition("-")
            if utt and frame_s.isdigit() and utt in ali_reader:
                ali = ali_reader[utt]
                t0 = int(frame_s)
                new_labels = []
                for t, frame in enumerate(eg.labels):
                    if t0 + t < len(ali):
                        new_labels.append(
                            [(int(ali[t0 + t]),
                              sum(w for _, w in frame) or 1.0)])
                        n_relabel += 1
                    else:
                        new_labels.append(frame)
                eg.labels = new_labels
            else:
                n_miss += 1
            writer.write(key, eg)
            n += 1
        writer.close()
    log(f"nnet-relabel-egs: {n} examples, {n_relabel} frames "
        f"relabeled, {n_miss} without alignment")
    return 0 if n else 1


def nnet_compute(argv: List[str]) -> int:
    po = ParseOptions(
        "Propagate features through a raw nnet2 net "
        "(nnet2bin/nnet-compute.cc).\n"
        "Usage: nnet-compute [options] <raw-nnet-in> "
        "<feature-rspecifier> <feature-or-loglikes-wspecifier>")
    apply_log = po.register_value("apply-log", False,
                                  "Apply log to the output")
    pad_input = po.register_value(
        "pad-input", True, "If true, pad the input by the net's "
        "context so output rows == input rows")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import read_raw_nnet2
    nnet = read_raw_nnet2(po.get_arg(1))
    writer = TableWriter("matrix", po.get_arg(3))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        out = nnet.forward(np.asarray(feats, np.float32),
                           pad_input=pad_input[0])
        if apply_log[0]:
            out = np.log(np.maximum(out, 1e-20))
        writer.write(key, out.astype(np.float32))
        n += 1
    writer.close()
    log(f"nnet-compute: processed {n} utterances")
    return 0 if n else 1


def nnet_compute_from_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Propagate nnet2 egs through a raw net, ignoring labels "
        "(nnet2bin/nnet-compute-from-egs.cc).\n"
        "Usage: nnet-compute-from-egs [options] <raw-nnet-in> "
        "<egs-rspecifier> <feature-wspecifier>")
    apply_log = po.register_value("apply-log", False,
                                  "Apply log to the output")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import read_raw_nnet2
    from kaldi_tpu.nnet2.train import format_minibatch, forward_store
    nnet = read_raw_nnet2(po.get_arg(1))
    writer = TableWriter("matrix", po.get_arg(3))
    n = 0
    for key, eg in _eg_reader(po.get_arg(2)):
        x3, _ = format_minibatch([eg])
        out = forward_store(nnet, x3)[-1][0]
        if apply_log[0]:
            out = np.log(np.maximum(out, 1e-20))
        writer.write(key, out.astype(np.float32))
        n += 1
    writer.close()
    log(f"nnet-compute-from-egs: processed {n} examples")
    return 0 if n else 1


def nnet_compute_prob(argv: List[str]) -> int:
    po = ParseOptions(
        "Print the average log-prob per frame of the given data "
        "under an nnet2 model (nnet2bin/nnet-compute-prob.cc; the "
        "number also goes to stdout).\n"
        "Usage: nnet-compute-prob [options] <model-in> "
        "<training-examples-in>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import read_nnet2_am
    from kaldi_tpu.nnet2.train import compute_prob
    _tm, am = read_nnet2_am(po.get_arg(1))
    tot, tot_w = compute_prob(am.nnet,
                              (eg for _, eg in
                               _eg_reader(po.get_arg(2))))
    avg = tot / max(tot_w, 1e-20)
    log(f"Saw {tot_w:.0f} examples, average probability is {avg:.4f}")
    print(f"{avg:.6f}")
    return 0
