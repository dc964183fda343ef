"""Round-3 CLI tail batch 8 (parity: src/gmmbin
gmm-global-sum-accs.cc, gmm-global-copy.cc,
gmm-global-get-frame-likes.cc, gmm-global-est-fmllr.cc,
fgmm-global-sum-accs.cc, fgmm-global-to-gmm.cc, gmm-acc-stats2.cc;
src/bin copy-gselect.cc, extend-transform-dim.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def gmm_global_sum_accs(argv: List[str]) -> int:
    po = ParseOptions(
        "Sum stats for a single diagonal GMM.\n"
        "Usage: gmm-global-sum-accs [options] <stats-out> "
        "<stats-in1> <stats-in2> ...")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.mle import AccumDiagGmm
    total = None
    for i in range(2, po.num_args() + 1):
        acc = kaldi_io.read_kaldi_object(AccumDiagGmm.read,
                                         po.get_arg(i))
        if total is None:
            total = acc
        else:
            total.add(acc)
    kaldi_io.write_kaldi_object(total.write, po.get_arg(1), binary[0])
    return 0


def gmm_global_copy(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy a single diagonal GMM (possibly changing format).\n"
        "Usage: gmm-global-copy [options] <model-in> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    kaldi_io.write_kaldi_object(gmm.write, po.get_arg(2), binary[0])
    return 0


def gmm_global_get_frame_likes(argv: List[str]) -> int:
    po = ParseOptions(
        "Per-frame log-likelihoods under a global diagonal GMM "
        "(gmm-global-get-frame-likes.cc; --average prints one float "
        "per utterance instead).\n"
        "Usage: gmm-global-get-frame-likes [options] <model-in> "
        "<feats-rspecifier> <likes-wspecifier>")
    average = po.register_value("average", False,
                                "Write per-utterance averages")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    writer = TableWriter("float" if average[0] else "vector",
                         po.get_arg(3))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        ll = gmm.log_likelihood(np.asarray(feats, np.float32))
        writer.write(key, float(np.mean(ll)) if average[0]
                     else np.asarray(ll, np.float32))
        n += 1
    writer.close()
    log(f"frame likes for {n} utterances")
    return 0 if n else 1


def gmm_global_est_fmllr(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate (UBM-level) fMLLR transforms against a global "
        "diagonal GMM (gmm-global-est-fmllr.cc; diarization/SRE "
        "front-end adaptation).\n"
        "Usage: gmm-global-est-fmllr [options] <gmm-in> "
        "<feats-rspecifier> <trans-wspecifier>")
    spk2utt = po.register_value("spk2utt", "",
                                "Speaker-to-utterance map rspecifier")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
    gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(2))
    writer = TableWriter("matrix", po.get_arg(3))
    if spk2utt[0]:
        groups = [(s, list(us)) for s, us in
                  SequentialTableReader("token-vector", spk2utt[0])]
    else:
        groups = [(k, [k]) for k in sorted(feats_reader.keys())]
    n = 0
    for spk, utts in groups:
        accs = FmllrDiagGmmAccs(gmm.dim)
        for u in utts:
            if u not in feats_reader:
                continue
            x = np.asarray(feats_reader[u], np.float64)
            post = gmm.component_posteriors(x.astype(np.float32))
            accs.accumulate_from_posteriors(gmm, x, post)
        if accs.beta <= 0:
            continue
        W, _impr = accs.update(min_count=100.0)
        writer.write(spk, W)
        n += 1
    writer.close()
    log(f"global fMLLR transforms for {n} speakers")
    return 0 if n else 1


def fgmm_global_sum_accs(argv: List[str]) -> int:
    po = ParseOptions(
        "Sum stats for a full-covariance GMM (npz container, matching "
        "fgmm-global-acc-stats).\n"
        "Usage: fgmm-global-sum-accs <stats-out> <stats-in1> ...")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    tot = None
    for i in range(2, po.num_args() + 1):
        with kaldi_io.input_stream(po.get_arg(i)) as f:
            data = np.load(f)
            cur = {k: data[k] for k in data.files}
        if tot is None:
            tot = cur
        else:
            for k in tot:
                tot[k] = tot[k] + cur[k]
    with kaldi_io.output_stream(po.get_arg(1)) as f:
        np.savez(f, **tot)
    return 0


def fgmm_global_to_gmm(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert a full-covariance GMM to diagonal "
        "(fgmm-global-to-gmm.cc).\n"
        "Usage: fgmm-global-to-gmm [options] <fgmm-in> <gmm-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.full_gmm import FullGmm
    fgmm = kaldi_io.read_kaldi_object(FullGmm.read, po.get_arg(1))
    kaldi_io.write_kaldi_object(fgmm.to_diag().write, po.get_arg(2),
                                binary[0])
    return 0


def copy_gselect(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy Gaussian-selection indices, optionally limiting to the "
        "first n per frame (copy-gselect.cc).\n"
        "Usage: copy-gselect [options] <gselect-rspecifier> "
        "<gselect-wspecifier>")
    n_keep = po.register_value("n", 0, "Keep only the best n "
                               "(0 = all; input order is best-first)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter("int-vector-vector", po.get_arg(2))
    n = 0
    for key, gsel in SequentialTableReader("int-vector-vector",
                                           po.get_arg(1)):
        if n_keep[0] > 0:
            gsel = [row[:n_keep[0]] for row in gsel]
        writer.write(key, gsel)
        n += 1
    writer.close()
    log(f"copied gselect for {n} utterances")
    return 0 if n else 1


def gmm_acc_stats2(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate numerator and denominator GMM stats in one pass "
        "from SIGNED posteriors (gmm-acc-stats2.cc; positive weights "
        "feed the num accs, negative the den accs — the MMI "
        "accumulation contract).\n"
        "Usage: gmm-acc-stats2 [options] <model-in> "
        "<feats-rspecifier> <posteriors-rspecifier> <num-stats-out> "
        "<den-stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.gmm.mle import AccumAmDiagGmm
    tm, am = read_am_gmm(po.get_arg(1))
    post_reader = RandomAccessTableReader("posterior", po.get_arg(3))
    num = AccumAmDiagGmm(am, num_transition_ids=tm.num_transition_ids)
    den = AccumAmDiagGmm(am, num_transition_ids=tm.num_transition_ids)
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in post_reader:
            warn(f"no posteriors for {key}")
            err += 1
            continue
        post = post_reader[key]
        pos = [[(tid, w) for tid, w in frame if w > 0]
               for frame in post]
        neg = [[(tid, -w) for tid, w in frame if w < 0]
               for frame in post]
        num.accumulate_posterior(am, tm, np.asarray(feats), pos)
        den.accumulate_posterior(am, tm, np.asarray(feats), neg)
        n += 1
    kaldi_io.write_kaldi_object(num.write, po.get_arg(4), binary[0])
    kaldi_io.write_kaldi_object(den.write, po.get_arg(5), binary[0])
    log(f"accumulated num/den stats from {n} utterances ({err} "
        "errors)")
    return 0 if n else 1


def extend_transform_dim(argv: List[str]) -> int:
    po = ParseOptions(
        "Extend a linear/affine transform to a higher dimension, "
        "acting as identity on the new dims (extend-transform-dim.cc; "
        "e.g. reuse an LDA+MLLT transform when deltas are appended).\n"
        "Usage: extend-transform-dim [options] <transform-in> "
        "<transform-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    new_dim = po.register_value("new-dimension", 0,
                                "Extended input dimension")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    mat = np.asarray(kaldi_io.read_kaldi_object(iof.read_matrix,
                                                po.get_arg(1)),
                     np.float64)
    rows, cols = mat.shape
    affine = cols == rows + 1
    din = cols - 1 if affine else cols
    dn = new_dim[0]
    if dn <= din:
        print("extend-transform-dim: --new-dimension must exceed the "
              "current input dim", flush=True)
        return 1
    add = dn - din
    out = np.zeros((rows + add, dn + (1 if affine else 0)))
    out[:rows, :din] = mat[:, :din]
    out[rows:, din:din + add] = np.eye(add)
    if affine:
        out[:rows, -1] = mat[:, -1]
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, out), po.get_arg(2),
        binary[0])
    log(f"extended transform {mat.shape} -> {out.shape}")
    return 0
