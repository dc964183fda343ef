"""Round-3 CLI tail batch 3 (parity: src/bin, src/gmmbin,
src/ivectorbin tails): posterior conversions, vector/matrix utilities,
VAD ops, GMM MAP adaptation / likes / lattice rescoring, the
ivector-extractor training ladder, and decode-faster-mapped."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


# ---------------------------------------------------------------------------
# posterior conversions (src/bin/feat-to-post.cc, prob-to-post.cc,
# logprob-to-post.cc, get-post-on-ali.cc, post-to-tacc.cc)
# ---------------------------------------------------------------------------

def feat_to_post(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert features into posterior format (each row's values "
        "become (index, value) pairs; used for fMPE/sparse targets).\n"
        "Usage: feat-to-post [options] <feats-rspecifier> "
        "<post-wspecifier>")
    top_n = po.register_value(
        "top-n", 10, "Keep only the largest top-n values per frame "
        "(<= 0 keeps all)")
    rescale = po.register_value(
        "rescale", False, "Rescale kept values to sum to one")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter("posterior", po.get_arg(2))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(1)):
        post = []
        k = top_n[0]
        for row in np.asarray(feats):
            if 0 < k < len(row):
                idx = np.argpartition(-row, k - 1)[:k]
                idx = idx[np.argsort(-row[idx], kind="stable")]
            else:
                idx = np.argsort(-row, kind="stable")
            vals = row[idx]
            if rescale[0]:
                s = vals.sum()
                if s != 0:
                    vals = vals / s
            post.append([(int(i), float(v))
                         for i, v in zip(idx, vals)])
        writer.write(key, post)
        n += 1
    writer.close()
    log(f"converted {n} feature matrices to posteriors")
    return 0 if n else 1


def _matrix_to_post(argv, name, transform):
    po = ParseOptions(
        f"Convert a matrix of {'log-' if name == 'logprob-to-post' else ''}"
        "probabilities to posteriors, pruning entries below min-post.\n"
        f"Usage: {name} [options] <prob-rspecifier> <post-wspecifier>")
    min_post = po.register_value(
        "min-post", 0.01, "Minimum posterior to keep (entries below "
        "are pruned, the rest renormalized)")
    random_prune = po.register_value(
        "random-prune", True, "Keep sub-threshold entries with "
        "probability post/min-post (unbiased; matches the reference)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    rng = np.random.default_rng(0)
    writer = TableWriter("posterior", po.get_arg(2))
    n = 0
    for key, mat in SequentialTableReader("matrix", po.get_arg(1)):
        probs = transform(np.asarray(mat, np.float64))
        post = []
        for row in probs:
            keep = row >= min_post[0]
            if random_prune[0]:
                sub = (~keep) & (row > 0)
                if sub.any():
                    lucky = rng.random(sub.sum()) < row[sub] / min_post[0]
                    row = row.copy()
                    row[np.flatnonzero(sub)[lucky]] = min_post[0]
                    keep = row >= min_post[0]
            idx = np.flatnonzero(keep)
            idx = idx[np.argsort(-row[idx], kind="stable")]
            post.append([(int(i), float(row[i])) for i in idx])
        writer.write(key, post)
        n += 1
    writer.close()
    log(f"{name}: processed {n} matrices")
    return 0 if n else 1


def prob_to_post(argv: List[str]) -> int:
    return _matrix_to_post(argv, "prob-to-post", lambda m: m)


def logprob_to_post(argv: List[str]) -> int:
    return _matrix_to_post(argv, "logprob-to-post", np.exp)


def get_post_on_ali(argv: List[str]) -> int:
    po = ParseOptions(
        "Extract the posterior weight of the aligned transition per "
        "frame (per-frame confidences).\n"
        "Usage: get-post-on-ali [options] <post-rspecifier> "
        "<ali-rspecifier> <conf-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(2))
    writer = TableWriter("vector", po.get_arg(3))
    n = err = 0
    for key, post in SequentialTableReader("posterior", po.get_arg(1)):
        if key not in ali_reader:
            warn(f"no alignment for {key}")
            err += 1
            continue
        ali = ali_reader[key]
        if len(ali) != len(post):
            warn(f"{key}: alignment length {len(ali)} vs posterior "
                 f"{len(post)}")
            err += 1
            continue
        conf = np.zeros(len(ali), np.float32)
        for t, (frame, a) in enumerate(zip(post, ali)):
            for pid, w in frame:
                if pid == a:
                    conf[t] += w
        writer.write(key, conf)
        n += 1
    writer.close()
    log(f"got posteriors-on-alignment for {n} utterances ({err} errors)")
    return 0 if n else 1


def post_to_tacc(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate total per-id posterior mass (e.g. for priors).\n"
        "Usage: post-to-tacc [options] <post-rspecifier> <acc-vector-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    dim = po.register_value("dim", 0, "Output dimension (0 = max id + 1)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    counts: dict = {}
    n = 0
    for key, post in SequentialTableReader("posterior", po.get_arg(1)):
        for frame in post:
            for pid, w in frame:
                counts[pid] = counts.get(pid, 0.0) + w
        n += 1
    d = dim[0] or (max(counts, default=-1) + 1)
    acc = np.zeros(d, np.float64)
    for pid, w in counts.items():
        if pid < d:
            acc[pid] = w
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_vector(s, b, acc), po.get_arg(2),
        binary[0])
    log(f"accumulated posteriors from {n} utterances, dim {d}")
    return 0 if n else 1


# ---------------------------------------------------------------------------
# matrix / vector utilities (src/bin matrix-sum-rows.cc, sum-matrices,
# paste-vectors, multiply-vectors, transform-vec, compare-int-vector)
# ---------------------------------------------------------------------------

def matrix_sum_rows(argv: List[str]) -> int:
    po = ParseOptions(
        "Sum the rows of each matrix into a vector.\n"
        "Usage: matrix-sum-rows <matrix-rspecifier> <vector-wspecifier>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    writer = TableWriter("vector", po.get_arg(2))
    n = 0
    for key, mat in SequentialTableReader("matrix", po.get_arg(1)):
        writer.write(key, np.asarray(mat).sum(axis=0))
        n += 1
    writer.close()
    log(f"summed rows of {n} matrices")
    return 0 if n else 1


def sum_matrices(argv: List[str]) -> int:
    po = ParseOptions(
        "Sum matrices from rxfilenames.\n"
        "Usage: sum-matrices [options] <matrix-out> <matrix-in1> ...")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    total = None
    for i in range(2, po.num_args() + 1):
        m = kaldi_io.read_kaldi_object(iof.read_matrix, po.get_arg(i))
        total = m if total is None else total + m
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, total), po.get_arg(1),
        binary[0])
    return 0


def paste_vectors(argv: List[str]) -> int:
    po = ParseOptions(
        "Concatenate vectors from multiple archives key-by-key.\n"
        "Usage: paste-vectors <rspecifier1> <rspecifier2> ... "
        "<wspecifier>")
    po.read(argv)
    if po.num_args() < 3:
        po.print_usage()
        return 1
    extras = [RandomAccessTableReader("vector", po.get_arg(i))
              for i in range(2, po.num_args())]
    writer = TableWriter("vector", po.get_arg(po.num_args()))
    n = err = 0
    for key, vec in SequentialTableReader("vector", po.get_arg(1)):
        parts = [np.asarray(vec)]
        ok = True
        for r in extras:
            if key not in r:
                ok = False
                break
            parts.append(np.asarray(r[key]))
        if not ok:
            err += 1
            continue
        writer.write(key, np.concatenate(parts))
        n += 1
    writer.close()
    log(f"pasted vectors for {n} keys ({err} missing)")
    return 0 if n else 1


def multiply_vectors(argv: List[str]) -> int:
    po = ParseOptions(
        "Elementwise product of vectors from two archives.\n"
        "Usage: multiply-vectors <rspecifier1> <rspecifier2> "
        "<wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    other = RandomAccessTableReader("vector", po.get_arg(2))
    writer = TableWriter("vector", po.get_arg(3))
    n = err = 0
    for key, vec in SequentialTableReader("vector", po.get_arg(1)):
        if key not in other:
            err += 1
            continue
        writer.write(key, np.asarray(vec) * np.asarray(other[key]))
        n += 1
    writer.close()
    log(f"multiplied vectors for {n} keys ({err} missing)")
    return 0 if n else 1


def transform_vec(argv: List[str]) -> int:
    po = ParseOptions(
        "Apply a linear or affine transform to vectors (e.g. an LDA "
        "matrix to i-vectors).\n"
        "Usage: transform-vec <transform-rxfilename> <vec-rspecifier> "
        "<vec-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    mat = np.asarray(kaldi_io.read_kaldi_object(iof.read_matrix,
                                                po.get_arg(1)))
    writer = TableWriter("vector", po.get_arg(3))
    n = 0
    for key, vec in SequentialTableReader("vector", po.get_arg(2)):
        v = np.asarray(vec)
        if mat.shape[1] == len(v):
            out = mat @ v
        elif mat.shape[1] == len(v) + 1:     # affine: last col = bias
            out = mat[:, :-1] @ v + mat[:, -1]
        else:
            raise ValueError(
                f"transform-vec: transform cols {mat.shape[1]} vs "
                f"vector dim {len(v)}")
        writer.write(key, out)
        n += 1
    writer.close()
    log(f"transformed {n} vectors")
    return 0 if n else 1


def compare_int_vector(argv: List[str]) -> int:
    po = ParseOptions(
        "Compare integer vector archives, printing per-key and total "
        "disagreement stats.\n"
        "Usage: compare-int-vector <rspecifier1> <rspecifier2>")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    other = RandomAccessTableReader("int-vector", po.get_arg(2))
    tot = diff = n = err = 0
    for key, v1 in SequentialTableReader("int-vector", po.get_arg(1)):
        if key not in other:
            warn(f"no vector for {key} in second archive")
            err += 1
            continue
        v2 = other[key]
        if len(v1) != len(v2):
            warn(f"{key}: length mismatch {len(v1)} vs {len(v2)}")
            err += 1
            continue
        d = int((np.asarray(v1) != np.asarray(v2)).sum())
        tot += len(v1)
        diff += d
        n += 1
    pct = 100.0 * diff / max(tot, 1)
    print(f"compared {n} vectors ({err} errors); {diff}/{tot} "
          f"({pct:.2f}%) differ")
    return 0 if n else 1


def analyze_counts(argv: List[str]) -> int:
    po = ParseOptions(
        "Count symbol occurrences in integer-vector archives "
        "(e.g. pdf counts for nnet priors).\n"
        "Usage: analyze-counts [options] <int-vector-rspecifier> "
        "<counts-out>")
    binary = po.register_value("binary", False, "Write counts in binary")
    counts_dim = po.register_value(
        "counts-dim", 0, "Output dimension (0 = max symbol + 1)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    counts: dict = {}
    n = 0
    for key, vec in SequentialTableReader("int-vector", po.get_arg(1)):
        for s in np.asarray(vec):
            counts[int(s)] = counts.get(int(s), 0) + 1
        n += 1
    d = counts_dim[0] or (max(counts, default=-1) + 1)
    acc = np.zeros(d, np.float64)
    for s, c in counts.items():
        if 0 <= s < d:
            acc[s] = c
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_vector(s, b, acc), po.get_arg(2),
        binary[0])
    log(f"counted symbols over {n} utterances, dim {d}")
    return 0 if n else 1


# ---------------------------------------------------------------------------
# VAD ops (src/ivectorbin select-voiced-frames.cc, merge-vads.cc,
# src/bin compute-vad-from-frame-likes.cc)
# ---------------------------------------------------------------------------

def select_voiced_frames(argv: List[str]) -> int:
    po = ParseOptions(
        "Select the feature rows whose VAD decision is voiced.\n"
        "Usage: select-voiced-frames <feats-rspecifier> "
        "<vad-rspecifier> <feats-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    vad_reader = RandomAccessTableReader("vector", po.get_arg(2))
    writer = TableWriter("matrix", po.get_arg(3))
    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(1)):
        if key not in vad_reader:
            warn(f"no VAD for {key}")
            err += 1
            continue
        vad = np.asarray(vad_reader[key])
        if len(vad) != feats.shape[0]:
            warn(f"{key}: VAD length {len(vad)} vs {feats.shape[0]}")
            err += 1
            continue
        sel = np.asarray(feats)[vad > 0.5]
        if len(sel) == 0:
            warn(f"{key}: no voiced frames")
            err += 1
            continue
        writer.write(key, sel)
        n += 1
    writer.close()
    log(f"selected voiced frames for {n} utterances ({err} errors)")
    return 0 if n else 1


def merge_vads(argv: List[str]) -> int:
    po = ParseOptions(
        "Merge VAD decisions from two archives (logical AND by "
        "default, OR with --map='or').\n"
        "Usage: merge-vads [options] <vad-rspecifier1> "
        "<vad-rspecifier2> <vad-wspecifier>")
    mode = po.register_value("map", "and", "Combination: and | or")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    other = RandomAccessTableReader("vector", po.get_arg(2))
    writer = TableWriter("vector", po.get_arg(3))
    n = err = 0
    for key, v1 in SequentialTableReader("vector", po.get_arg(1)):
        if key not in other:
            err += 1
            continue
        a = np.asarray(v1) > 0.5
        b = np.asarray(other[key]) > 0.5
        if len(a) != len(b):
            err += 1
            continue
        out = (a | b) if mode[0] == "or" else (a & b)
        writer.write(key, out.astype(np.float32))
        n += 1
    writer.close()
    log(f"merged VAD for {n} utterances ({err} errors)")
    return 0 if n else 1


def compute_vad_from_frame_likes(argv: List[str]) -> int:
    po = ParseOptions(
        "Compute VAD decisions from per-class frame log-likelihood "
        "archives (class 0 = silence, others = speech).\n"
        "Usage: compute-vad-from-frame-likes [options] "
        "<likes-rspecifier-1> <likes-rspecifier-2> ... <vad-wspecifier>")
    prior = po.register_value(
        "priors", "", "Comma-separated class priors (default uniform)")
    po.read(argv)
    if po.num_args() < 3:
        po.print_usage()
        return 1
    k = po.num_args() - 1
    extras = [RandomAccessTableReader("vector", po.get_arg(i))
              for i in range(2, k + 1)]
    pri = (np.asarray([float(x) for x in prior[0].split(",")])
           if prior[0] else np.ones(k))
    if len(pri) != k:
        print("compute-vad-from-frame-likes: #priors must equal "
              "#classes", flush=True)
        return 1
    logp = np.log(pri / pri.sum())
    writer = TableWriter("vector", po.get_arg(k + 1))
    n = err = 0
    for key, l0 in SequentialTableReader("vector", po.get_arg(1)):
        ls = [np.asarray(l0) + logp[0]]
        ok = True
        for i, r in enumerate(extras):
            if key not in r:
                ok = False
                break
            ls.append(np.asarray(r[key]) + logp[i + 1])
        if not ok or any(len(x) != len(ls[0]) for x in ls):
            err += 1
            continue
        best = np.argmax(np.stack(ls), axis=0)
        writer.write(key, (best > 0).astype(np.float32))
        n += 1
    writer.close()
    log(f"computed VAD for {n} utterances ({err} errors)")
    return 0 if n else 1


# ---------------------------------------------------------------------------
# GMM tail (src/gmmbin gmm-compute-likes.cc, gmm-adapt-map.cc,
# gmm-rescore-lattice.cc, src/bin decode-faster-mapped.cc, hmm-info.cc)
# ---------------------------------------------------------------------------

def _read_tm(rxfilename: str):
    """Read just the TransitionModel from a model file (the TM leads
    every reference .mdl regardless of the AM that follows)."""
    from kaldi_tpu.hmm import TransitionModel
    with kaldi_io.input_stream(rxfilename) as f:
        binary = iof.init_input_stream(f)
        return TransitionModel.read(f, binary)

def gmm_compute_likes(argv: List[str]) -> int:
    po = ParseOptions(
        "Compute per-pdf log-likelihood matrices from a GMM model.\n"
        "Usage: gmm-compute-likes [options] <model-in> "
        "<feats-rspecifier> <likes-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    tm, am = read_am_gmm(po.get_arg(1))
    writer = TableWriter("matrix", po.get_arg(3))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        writer.write(key, am.log_likes_batch(feats))
        n += 1
    writer.close()
    log(f"computed likes for {n} utterances")
    return 0 if n else 1


def gmm_adapt_map(argv: List[str]) -> int:
    po = ParseOptions(
        "MAP adaptation of GMM means per speaker (gmm-adapt-map.cc): "
        "mu = (tau mu0 + gamma xbar) / (tau + gamma).\n"
        "Usage: gmm-adapt-map [options] <model-in> <feats-rspecifier> "
        "<posteriors-rspecifier> <map-am-wspecifier>")
    tau = po.register_value("mean-tau", 10.0, "Smoothing constant tau")
    spk2utt_rs = po.register_value(
        "spk2utt", "", "rspecifier for speaker-to-utterance map "
        "(adapt per speaker instead of per utterance)")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    import copy as _copy
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.gmm.am_diag_gmm import AmDiagGmm
    from kaldi_tpu.util.table import ObjectHolder
    tm, am = read_am_gmm(po.get_arg(1))
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(2))
    post_reader = RandomAccessTableReader("posterior", po.get_arg(3))
    writer = TableWriter(ObjectHolder(AmDiagGmm), po.get_arg(4))
    n = err = 0

    def adapt(spk, utts):
        nonlocal n, err
        # per-pdf accumulation: gamma (num_gauss,), x (num_gauss, D)
        accs = [(np.zeros(g.num_gauss), np.zeros((g.num_gauss, am.dim)))
                for g in am.densities]
        used = 0
        for u in utts:
            if u not in feats_reader or u not in post_reader:
                warn(f"missing feats or posterior for {u}")
                err += 1
                continue
            feats = np.asarray(feats_reader[u], np.float64)
            post = post_reader[u]
            # group (frame, weight) pairs by pdf, then one batched
            # component-posterior call per pdf
            by_pdf: dict = {}
            for t, frame in enumerate(post):
                for pid, wgt in frame:
                    pdf = tm.transition_id_to_pdf(int(pid))
                    by_pdf.setdefault(pdf, []).append((t, wgt))
            for pdf, tw in by_pdf.items():
                idx = np.asarray([t for t, _ in tw])
                w = np.asarray([wg for _, wg in tw])
                cp = am.get_pdf(pdf).component_posteriors(
                    feats[idx].astype(np.float32))      # (n, G)
                g, x = accs[pdf]
                g += (w[:, None] * cp).sum(axis=0)
                x += np.einsum("n,ng,nd->gd", w, cp, feats[idx])
            used += 1
        if not used:
            return
        adapted = _copy.deepcopy(am)
        for pdf, (g, x) in enumerate(accs):
            gmm = adapted.get_pdf(pdf)
            mu0 = gmm.get_means()
            denom = tau[0] + g
            mu = (tau[0] * mu0 + x) / denom[:, None]
            gmm.set_from_means_and_vars(gmm.weights, mu, gmm.get_vars())
        adapted.invalidate_pack()
        writer.write(spk, adapted)
        n += 1

    if spk2utt_rs[0]:
        for spk, utts in SequentialTableReader("token-vector",
                                               spk2utt_rs[0]):
            adapt(spk, list(utts))
    else:
        for utt in sorted(feats_reader.keys()):
            adapt(utt, [utt])
    writer.close()
    log(f"MAP-adapted models for {n} speakers ({err} errors)")
    return 0 if n else 1


def gmm_rescore_lattice(argv: List[str]) -> int:
    po = ParseOptions(
        "Replace lattice acoustic scores with a (new) GMM model's.\n"
        "Usage: gmm-rescore-lattice [options] <model-in> "
        "<lattice-rspecifier> <feats-rspecifier> <lattice-wspecifier>")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.lat.kaldi_lattice import LatticeHolder
    from kaldi_tpu.nnet3.discriminative_train import \
        rescore_lattice_acoustics
    tm, am = read_am_gmm(po.get_arg(1))
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(3))
    writer = TableWriter(LatticeHolder(), po.get_arg(4))
    n = err = 0
    for key, lat in SequentialTableReader(LatticeHolder(),
                                          po.get_arg(2)):
        if key not in feats_reader:
            warn(f"no feats for {key}")
            err += 1
            continue
        ll = am.log_likes_batch(feats_reader[key])
        writer.write(key, rescore_lattice_acoustics(lat, tm, ll))
        n += 1
    writer.close()
    log(f"rescored {n} lattices ({err} errors)")
    return 0 if n else 1


def decode_faster_mapped(argv: List[str]) -> int:
    po = ParseOptions(
        "Best-path decode from loglike matrices (rows indexed by "
        "transition-id via the model's pdf map).\n"
        "Usage: decode-faster-mapped [options] <model-in> <fst-in> "
        "<loglikes-rspecifier> <words-wspecifier> "
        "[<alignments-wspecifier>]")
    from kaldi_tpu.decoder.viterbi import FasterDecoder, \
        FasterDecoderOptions
    dopts = FasterDecoderOptions()
    po.register_struct(dopts)
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    po.read(argv)
    if po.num_args() < 4 or po.num_args() > 5:
        po.print_usage()
        return 1
    tm = _read_tm(po.get_arg(1))
    from kaldi_tpu.fstext.openfst_io import read_fst_file
    hclg = read_fst_file(po.get_arg(2))
    word_writer = TableWriter("int-vector", po.get_arg(4))
    ali_writer = (TableWriter("int-vector", po.get_arg(5))
                  if po.num_args() >= 5 else None)
    dec = FasterDecoder(hclg, dopts)
    n = err = 0
    for key, ll in SequentialTableReader("matrix", po.get_arg(3)):
        res = dec.decode(np.asarray(ll), tm.id2pdf_id,
                         acoustic_scale=acoustic_scale[0])
        if res is None:
            warn(f"decode failed for {key}")
            err += 1
            continue
        ali, words, _cost = res
        word_writer.write(key, words)
        if ali_writer:
            ali_writer.write(key, ali)
        n += 1
    word_writer.close()
    if ali_writer:
        ali_writer.close()
    log(f"decoded {n} utterances ({err} failed)")
    return 0 if n else 1


def hmm_info(argv: List[str]) -> int:
    po = ParseOptions(
        "Print information about an HMM topology / transition model.\n"
        "Usage: hmm-info <model-in>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    tm = _read_tm(po.get_arg(1))
    print(f"number of phones {len(tm.topo.phones)}")
    print(f"number of pdfs {tm.num_pdfs}")
    print(f"number of transition-ids {tm.num_transition_ids}")
    print(f"number of transition-states {tm.num_transition_states}")
    return 0


# ---------------------------------------------------------------------------
# ivector-extractor training ladder (src/ivectorbin
# ivector-extractor-{init,acc-stats,sum-accs,est}.cc,
# ivector-compute-lda.cc, ivector-transform.cc)
# ---------------------------------------------------------------------------

def ivector_extractor_init(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize an i-vector extractor from a (diag or full) UBM.\n"
        "Usage: ivector-extractor-init [options] <ubm-in> "
        "<extractor-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    ivector_dim = po.register_value("ivector-dim", 100,
                                    "Dimension of iVector")
    prior_offset = po.register_value(
        "prior-offset", 100.0, "Offset of the prior's mean in dim 0")
    full = po.register_value(
        "use-full-ubm", False, "Read the UBM as full-covariance "
        "(fgmm-global)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.extractor import IvectorExtractor
    if full[0]:
        from kaldi_tpu.gmm.full_gmm import FullGmm
        ubm = kaldi_io.read_kaldi_object(FullGmm.read, po.get_arg(1))
    else:
        from kaldi_tpu.gmm.diag_gmm import DiagGmm
        ubm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    ex = IvectorExtractor(ubm, ivector_dim[0], prior_offset[0])
    kaldi_io.write_kaldi_object(ex.write, po.get_arg(2), binary[0])
    log(f"initialized extractor: {ex.num_gauss} gaussians, dim "
        f"{ex.dim}, ivector-dim {ex.R}")
    return 0


def ivector_extractor_acc_stats(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate i-vector extractor training stats.\n"
        "Usage: ivector-extractor-acc-stats [options] <extractor-in> "
        "<feats-rspecifier> <stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.extractor import (IvectorExtractor,
                                             IvectorExtractorStats)
    ex = kaldi_io.read_kaldi_object(IvectorExtractor.read, po.get_arg(1))
    stats = IvectorExtractorStats(ex)
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        stats.acc_stats(ex, np.asarray(feats))
        n += 1
    kaldi_io.write_kaldi_object(stats.write, po.get_arg(3), binary[0])
    log(f"accumulated extractor stats from {n} utterances")
    return 0 if n else 1


def ivector_extractor_sum_accs(argv: List[str]) -> int:
    po = ParseOptions(
        "Sum i-vector extractor stats.\n"
        "Usage: ivector-extractor-sum-accs <stats-out> <stats-in1> ...")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.extractor import IvectorExtractorStats
    total = None
    for i in range(2, po.num_args() + 1):
        s = kaldi_io.read_kaldi_object(IvectorExtractorStats.read,
                                       po.get_arg(i))
        if total is None:
            total = s
        else:
            total.add(s)
    kaldi_io.write_kaldi_object(total.write, po.get_arg(1), binary[0])
    return 0


def ivector_extractor_est(argv: List[str]) -> int:
    po = ParseOptions(
        "Apply the M-step to an i-vector extractor from stats.\n"
        "Usage: ivector-extractor-est [options] <extractor-in> "
        "<stats-in> <extractor-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.ivector.extractor import (IvectorExtractor,
                                             IvectorExtractorStats)
    ex = kaldi_io.read_kaldi_object(IvectorExtractor.read, po.get_arg(1))
    stats = kaldi_io.read_kaldi_object(IvectorExtractorStats.read,
                                       po.get_arg(2))
    stats.update(ex)
    kaldi_io.write_kaldi_object(ex.write, po.get_arg(3), binary[0])
    log(f"re-estimated extractor from {stats.num_utts} utterances "
        "of stats")
    return 0


def ivector_compute_lda(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate an LDA projection for i-vectors using speaker "
        "labels as classes.\n"
        "Usage: ivector-compute-lda [options] <ivector-rspecifier> "
        "<utt2spk-rspecifier> <lda-matrix-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    lda_dim = po.register_value("dim", 0, "LDA output dim (0 = input)")
    covariance_factor = po.register_value(
        "covariance-factor", 0.1, "Extra diagonal smoothing of the "
        "within-class covariance")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    utt2spk = RandomAccessTableReader("token-vector", po.get_arg(2))
    ivecs, spk_of = [], []
    for key, vec in SequentialTableReader("vector", po.get_arg(1)):
        if key not in utt2spk:
            continue
        ivecs.append(np.asarray(vec, np.float64))
        spk_of.append(utt2spk[key][0])
    if not ivecs:
        warn("no i-vectors with speaker labels")
        return 1
    X = np.stack(ivecs)
    spks = sorted(set(spk_of))
    sid = {s: i for i, s in enumerate(spks)}
    y = np.asarray([sid[s] for s in spk_of])
    from kaldi_tpu.transform.lda import LdaEstimate, LdaOptions
    est = LdaEstimate(len(spks), X.shape[1])
    for x, c in zip(X, y):
        est.accumulate(x[None, :], int(c))
    d = lda_dim[0] or X.shape[1]
    mat = est.estimate(LdaOptions(dim=d))
    if isinstance(mat, tuple):
        mat = mat[0]
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, np.asarray(mat)),
        po.get_arg(3), binary[0])
    log(f"estimated i-vector LDA {np.asarray(mat).shape} from "
        f"{len(ivecs)} ivectors / {len(spks)} speakers")
    return 0


def ivector_transform(argv: List[str]) -> int:
    po = ParseOptions(
        "Apply a transform matrix to i-vectors (alias of "
        "transform-vec with the reference's ivectorbin name).\n"
        "Usage: ivector-transform <matrix-rxfilename> "
        "<ivector-rspecifier> <ivector-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    return transform_vec(["transform-vec"] + [po.get_arg(i)
                                              for i in (1, 2, 3)])
