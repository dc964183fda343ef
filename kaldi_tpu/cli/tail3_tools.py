"""Round-3 CLI tail: scoring (EER, bootstrap WER CI), diarization
(agglomerative-cluster, dense PLDA scoring), i-vector post-processing,
lattice-combine, vector utilities, and the nnet3 discriminative egs
surface.

Parity targets: ivectorbin/{compute-eer,agglomerative-cluster,
ivector-subtract-global-mean,ivector-normalize-length,
ivector-plda-scoring-dense}.cc, bin/compute-wer-bootci.cc,
latbin/lattice-combine.cc, bin/vector-scale.cc,
nnet3bin/nnet3-discriminative-{get,copy}-egs.cc.
"""

from __future__ import annotations

import sys
from typing import Dict, List

import numpy as np

from kaldi_tpu.base.logging import log
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


# ----------------------------------------------------------------------
# scoring

def compute_eer(argv: List[str]) -> int:
    po = ParseOptions(
        "Computes the Equal Error Rate.\n"
        "Input is a series of lines, each with two fields: score, and "
        "either the string 'target' or 'nontarget'.\n"
        "Usage: compute-eer <scores-in>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    fn = po.get_arg(1)
    target, nontarget = [], []
    stream = sys.stdin if fn == "-" else open(fn)
    try:
        for line in stream:
            parts = line.split()
            if len(parts) != 2:
                print(f"compute-eer: bad line {line!r}",
                      file=sys.stderr)
                return 1
            score = float(parts[0])
            if parts[1] == "target":
                target.append(score)
            elif parts[1] == "nontarget":
                nontarget.append(score)
            else:
                print(f"compute-eer: bad label {parts[1]!r}",
                      file=sys.stderr)
                return 1
    finally:
        if stream is not sys.stdin:
            stream.close()
    if not target or not nontarget:
        print("compute-eer: need both target and nontarget scores",
              file=sys.stderr)
        return 1
    t = np.sort(np.asarray(target))
    n = np.sort(np.asarray(nontarget))
    # sweep thresholds over target scores: FRR rises, FAR falls
    frr = np.arange(len(t)) / len(t)
    far = 1.0 - np.searchsorted(n, t, side="left") / len(n)
    i = int(np.argmin(np.abs(frr - far)))
    eer = 0.5 * (frr[i] + far[i])
    print(f"{eer * 100:.4f}%")
    log(f"compute-eer: EER {eer * 100:.4f}% threshold {t[i]:.4f} "
        f"({len(t)} target / {len(n)} nontarget)")
    return 0


def compute_wer_bootci(argv: List[str]) -> int:
    po = ParseOptions(
        "Compute a bootstrapping of WER to extract the 95% confidence "
        "interval.\n"
        "Usage: compute-wer-bootci [options] <ref-rspecifier> "
        "<hyp-rspecifier>")
    mode = po.register_value("mode", "present",
                             "Scoring mode: present|all")
    replications = po.register_value("replications", 10000,
                                     "Number of replications")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.util.edit_distance import edit_distance_counts
    refs: Dict[str, List[int]] = {}
    for key, vec in SequentialTableReader("int-vector", po.get_arg(1)):
        refs[key] = list(vec)
    per_utt = []            # (errs, ref_len)
    hyp_keys = set()
    for key, vec in SequentialTableReader("int-vector", po.get_arg(2)):
        hyp_keys.add(key)
        if key not in refs:
            continue
        ins, dels, subs = edit_distance_counts(refs[key], list(vec))
        per_utt.append((ins + dels + subs, len(refs[key])))
    if mode[0] == "all":
        for key, ref in refs.items():
            if key not in hyp_keys:
                per_utt.append((len(ref), len(ref)))
    if not per_utt:
        print("compute-wer-bootci: no utterances scored",
              file=sys.stderr)
        return 1
    arr = np.asarray(per_utt, np.float64)
    wer = 100.0 * arr[:, 0].sum() / max(arr[:, 1].sum(), 1.0)
    rng = np.random.default_rng(0)
    n = len(arr)
    idx = rng.integers(0, n, size=(int(replications[0]), n))
    errs = arr[idx, 0].sum(axis=1)
    lens = np.maximum(arr[idx, 1].sum(axis=1), 1.0)
    wers = 100.0 * errs / lens
    lo, hi = np.percentile(wers, [2.5, 97.5])
    print(f"Set1: %WER {wer:.2f} 95% Conf Interval "
          f"[ {lo:.2f}%, {hi:.2f}% ]")
    return 0


# ----------------------------------------------------------------------
# i-vector post-processing / diarization

def ivector_subtract_global_mean(argv: List[str]) -> int:
    po = ParseOptions(
        "Copies a table of iVectors but subtracts the global mean as "
        "it does so.\n"
        "Usage: ivector-subtract-global-mean <ivector-rspecifier> "
        "<ivector-wspecifier>\n"
        "   or: ivector-subtract-global-mean <mean-rxfilename> "
        "<ivector-rspecifier> <ivector-wspecifier>")
    po.read(argv)
    if po.num_args() not in (2, 3):
        po.print_usage()
        return 1
    if po.num_args() == 3:
        from kaldi_tpu.base import io_funcs as iof
        from kaldi_tpu.util import kaldi_io
        mean = kaldi_io.read_kaldi_object(iof.read_vector,
                                          po.get_arg(1))
        rspec, wspec = po.get_arg(2), po.get_arg(3)
    else:
        rspec, wspec = po.get_arg(1), po.get_arg(2)
        vecs = [(k, v) for k, v in
                SequentialTableReader("vector", rspec)]
        if not vecs:
            print("no ivectors", file=sys.stderr)
            return 1
        mean = np.mean([v for _, v in vecs], axis=0)
        with TableWriter("vector", wspec) as w:
            for k, v in vecs:
                w.write(k, v - mean)
        log(f"ivector-subtract-global-mean: {len(vecs)} vectors")
        return 0
    n = 0
    with TableWriter("vector", wspec) as w:
        for k, v in SequentialTableReader("vector", rspec):
            w.write(k, v - mean)
            n += 1
    log(f"ivector-subtract-global-mean: {n} vectors")
    return 0


def ivector_normalize_length(argv: List[str]) -> int:
    po = ParseOptions(
        "Normalize length of iVectors to equal sqrt(feature-dimension)\n"
        "Usage: ivector-normalize-length <ivector-rspecifier> "
        "<ivector-wspecifier>")
    normalize = po.register_value("normalize", True,
                                  "Set this to false to disable "
                                  "normalization")
    scaleup = po.register_value("scaleup", True,
                                "If 'true', the normalized iVector is "
                                "scaled-up by sqrt(ivector-dim)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    n = 0
    ratio_sum = 0.0
    with TableWriter("vector", po.get_arg(2)) as w:
        for k, v in SequentialTableReader("vector", po.get_arg(1)):
            norm = float(np.linalg.norm(v))
            ratio = norm / np.sqrt(v.size)
            ratio_sum += ratio
            if normalize[0] and norm > 0:
                scale = (np.sqrt(v.size) / norm) if scaleup[0] \
                    else 1.0 / norm
                v = v * scale
            w.write(k, v)
            n += 1
    log(f"ivector-normalize-length: {n} vectors, avg ratio "
        f"{ratio_sum / max(n, 1):.4f}")
    return 0


def agglomerative_cluster(argv: List[str]) -> int:
    po = ParseOptions(
        "Cluster utterances by similarity score (diarization).\n"
        "Takes a table of score matrices (one per recording, utterances "
        "in reco2utt order) and clusters agglomeratively to a stopping "
        "threshold or a known number of speakers.\n"
        "Usage: agglomerative-cluster <scores-rspecifier> "
        "<reco2utt-rspecifier> <labels-wspecifier>")
    threshold = po.register_value("threshold", 0.0,
                                  "Merging stops when the best score "
                                  "falls below this")
    num_spk = po.register_value("num-speakers", 0,
                                "If > 0, cluster to this many speakers "
                                "(reco2num-spk mode uses the table "
                                "variant)")
    reco2num = po.register_value("reco2num-spk-rspecifier", "",
                                 "Table of recording -> num speakers")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.cluster import agglomerative_cluster as _ac
    r2n = {}
    if reco2num[0]:
        for k, v in SequentialTableReader("int-vector", reco2num[0]):
            r2n[k] = int(v[0])
    n = 0
    with TableWriter("int-vector", po.get_arg(3)) as w:
        reco2utt = {k: list(v) for k, v in
                    SequentialTableReader("token-vector",
                                          po.get_arg(2))}
        for reco, scores in SequentialTableReader("matrix",
                                                  po.get_arg(1)):
            utts = reco2utt.get(reco)
            k = r2n.get(reco, num_spk[0])
            labels = _ac(np.asarray(scores),
                         threshold=float(threshold[0]),
                         num_clusters=k if k > 0 else None)
            if utts is not None:
                for u, lab in zip(utts, labels):
                    w.write(u, [int(lab) + 1])
            else:
                w.write(reco, [int(x) + 1 for x in labels])
            n += 1
    log(f"agglomerative-cluster: {n} recordings")
    return 0


def ivector_plda_scoring_dense(argv: List[str]) -> int:
    po = ParseOptions(
        "Perform PLDA scoring for speaker diarization: for each "
        "recording, compute the pairwise PLDA score matrix of its "
        "utterance iVectors (in reco2utt order).\n"
        "Usage: ivector-plda-scoring-dense <plda> <reco2utt-rspecifier> "
        "<ivectors-rspecifier> <scores-wspecifier>")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.plda import Plda
    from kaldi_tpu.util import kaldi_io
    plda = kaldi_io.read_kaldi_object(Plda.read, po.get_arg(1))
    ivecs = RandomAccessTableReader("vector", po.get_arg(3))
    n = 0
    with TableWriter("matrix", po.get_arg(4)) as w:
        for reco, utt_toks in SequentialTableReader("token-vector",
                                                    po.get_arg(2)):
            utts = list(utt_toks)
            X = np.stack([np.asarray(ivecs[u]) for u in utts])
            tr = [plda.transform_ivector(x, 1) for x in X]
            S = np.zeros((len(utts), len(utts)), np.float32)
            for i in range(len(utts)):
                for j in range(len(utts)):
                    S[i, j] = plda.log_likelihood_ratio(tr[i], 1, tr[j])
            w.write(reco, S)
            n += 1
    log(f"ivector-plda-scoring-dense: {n} recordings")
    return 0


# ----------------------------------------------------------------------
# lattice / vector utilities

def lattice_combine(argv: List[str]) -> int:
    po = ParseOptions(
        "Combine lattices from multiple sources (systems) by taking "
        "their union per utterance; missing entries pass through.\n"
        "Usage: lattice-combine <lattice-rspecifier1> "
        "<lattice-rspecifier2> [...] <lattice-wspecifier>")
    po.read(argv)
    if po.num_args() < 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.lat_tools2 import lattice_union_op
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    others = [RandomAccessTableReader(LatticeHolder(), po.get_arg(i))
              for i in range(2, po.num_args())]
    n = 0
    with TableWriter(LatticeHolder(), po.get_arg(po.num_args())) as w:
        for key, lat in SequentialTableReader(LatticeHolder(),
                                              po.get_arg(1)):
            for r in others:
                if key in r:
                    lat = lattice_union_op(lat, r[key])
            w.write(key, lat)
            n += 1
    log(f"lattice-combine: {n} lattices")
    return 0


def vector_scale(argv: List[str]) -> int:
    po = ParseOptions(
        "Scale vectors, or archives of vectors\n"
        "Usage: vector-scale [options] <vector-rspecifier> "
        "<vector-wspecifier>")
    scale = po.register_value("scale", 1.0, "Scaling factor")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    n = 0
    with TableWriter("vector", po.get_arg(2)) as w:
        for k, v in SequentialTableReader("vector", po.get_arg(1)):
            w.write(k, np.asarray(v) * scale[0])
            n += 1
    log(f"vector-scale: {n} vectors")
    return 0


# ----------------------------------------------------------------------
# nnet3 discriminative egs surface

def nnet3_discriminative_get_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Get frame-by-frame examples for nnet3 discriminative "
        "training (sMBR/MMI): feature chunks with numerator alignments "
        "and denominator lattices.\n"
        "Usage: nnet3-discriminative-get-egs [options] "
        "<features-rspecifier> <ali-rspecifier> "
        "<den-lat-rspecifier> <egs-wspecifier>")
    chunk_width = po.register_value("num-frames", 150,
                                    "Frames per chunk (output rate)")
    left = po.register_value("left-context", 13, "Left context frames")
    right = po.register_value("right-context", 13,
                              "Right context frames")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.nnet3.egs import (DiscriminativeExampleHolder,
                                     NnetDiscriminativeExample)
    alis = RandomAccessTableReader("int-vector", po.get_arg(2))
    lats = RandomAccessTableReader(LatticeHolder(), po.get_arg(3))
    n = 0
    cw = int(chunk_width[0])
    with TableWriter(DiscriminativeExampleHolder(),
                     po.get_arg(4)) as w:
        for utt, feats in SequentialTableReader("matrix",
                                                po.get_arg(1)):
            if utt not in alis or utt not in lats:
                continue
            ali = list(alis[utt])
            lat = lats[utt]
            T = min(feats.shape[0], len(ali))
            # whole-utterance example when short, else one chunk per
            # cw frames with the FULL lattice attached (splitting a
            # lattice in time needs state times; the trainer rescores
            # per chunk anyway)
            if T <= cw:
                w.write(utt, NnetDiscriminativeExample(
                    feats[:T], ali[:T], lat, 0, 0))
                n += 1
                continue
            for start in range(0, T - cw + 1, cw):
                lo = max(0, start - int(left[0]))
                hi = min(T, start + cw + int(right[0]))
                w.write(f"{utt}-{start}", NnetDiscriminativeExample(
                    feats[lo:hi], ali[start:start + cw], lat,
                    start - lo, hi - start - cw))
                n += 1
    log(f"nnet3-discriminative-get-egs: {n} examples")
    return 0


def nnet3_discriminative_copy_egs(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy examples for nnet3 discriminative training, possibly "
        "changing the binary mode; supports multiple output archives "
        "(round-robin split).\n"
        "Usage: nnet3-discriminative-copy-egs <egs-rspecifier> "
        "<egs-wspecifier1> [<egs-wspecifier2> ...]")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet3.egs import DiscriminativeExampleHolder
    writers = [TableWriter(DiscriminativeExampleHolder(), po.get_arg(i))
               for i in range(2, po.num_args() + 1)]
    n = 0
    for key, eg in SequentialTableReader(DiscriminativeExampleHolder(),
                                         po.get_arg(1)):
        writers[n % len(writers)].write(key, eg)
        n += 1
    for w in writers:
        w.close()
    log(f"nnet3-discriminative-copy-egs: {n} examples -> "
        f"{len(writers)} archives")
    return 0
