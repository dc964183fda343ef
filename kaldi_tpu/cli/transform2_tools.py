"""Gaussian-level posterior (gpost) + fMLLR CLI tail (parity:
src/gmmbin gmm-post-to-gpost.cc, gmm-est-fmllr-gpost.cc,
gmm-est-fmllr-global.cc, gmm-basis-fmllr-accs.cc,
gmm-basis-fmllr-accs-gpost.cc, gmm-est-basis-fmllr-gpost.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def gmm_post_to_gpost(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert state-level posteriors to Gaussian-level posteriors "
        "(gmm-post-to-gpost.cc; output pairs carry pdf-ids).\n"
        "Usage: gmm-post-to-gpost [options] <model-in> "
        "<feature-rspecifier> <posteriors-rspecifier> "
        "<gpost-wspecifier>")
    rand_prune = po.register_value(
        "rand-prune", 0.0,
        "Randomized pruning of posteriors less than this")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.hmm.posterior import posterior_to_pdf
    tm, am = read_am_gmm(po.get_arg(1))
    post_reader = RandomAccessTableReader("posterior", po.get_arg(3))
    writer = TableWriter("gauss-post", po.get_arg(4))
    rng = np.random.default_rng(0)
    n = err = 0
    tot_like = tot_w = 0.0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        if key not in post_reader:
            err += 1
            continue
        post = post_reader[key]
        feats = np.asarray(feats, np.float64)
        if len(post) != feats.shape[0]:
            warn(f"{key}: posterior length {len(post)} vs "
                 f"{feats.shape[0]} frames")
            err += 1
            continue
        pdf_post = posterior_to_pdf(post, tm)
        gpost = []
        for t, frame in enumerate(pdf_post):
            out_frame = []
            for pdf, w in frame:
                g = am.get_pdf(int(pdf))
                vec = g.component_posteriors(
                    feats[t:t + 1].astype(np.float32))[0] * w
                like = g.log_likelihood(feats[t:t + 1])[0]
                tot_like += float(like) * w
                tot_w += w
                if rand_prune[0] > 0.0:
                    # randomized pruning preserving expectation
                    # (RandPrune): small values survive with
                    # probability |v|/rand_prune at value rand_prune
                    small = np.abs(vec) < rand_prune[0]
                    keep = rng.random(vec.shape) <= \
                        np.abs(vec) / rand_prune[0]
                    vec = np.where(
                        small,
                        np.where(keep, np.sign(vec) * rand_prune[0],
                                 0.0), vec)
                if np.any(vec != 0.0):
                    out_frame.append((int(pdf),
                                      vec.astype(np.float32)))
            gpost.append(out_frame)
        writer.write(key, gpost)
        n += 1
    writer.close()
    log(f"converted posteriors for {n} utterances ({err} errors); "
        f"avg like {tot_like / max(tot_w, 1):.4f}")
    return 0 if n else 1


def _est_fmllr_groups(po, spk2utt_rs, feats_arg, post_arg, holder,
                      accumulate, writer, min_count=500.0):
    """Shared spk2utt/per-utt driver for fMLLR estimation tools:
    accumulate(accs, feats, post) per utterance, update per group."""
    n = 0
    tot_impr = tot_beta = 0.0
    if spk2utt_rs:
        feat_reader = RandomAccessTableReader("matrix", feats_arg)
        post_reader = RandomAccessTableReader(holder, post_arg)
        groups = [(spk, list(utts)) for spk, utts in
                  SequentialTableReader("token-vector", spk2utt_rs)]

        def utt_iter(utts):
            for u in utts:
                if u not in feat_reader or u not in post_reader:
                    warn(f"missing features or posteriors for {u}")
                    continue
                yield u, np.asarray(feat_reader[u], np.float64), \
                    post_reader[u]
    else:
        post_reader = RandomAccessTableReader(holder, post_arg)
        groups = None

    from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
    if groups is not None:
        for spk, utts in groups:
            accs = None
            for _u, feats, post in utt_iter(utts):
                if accs is None:
                    accs = FmllrDiagGmmAccs(feats.shape[1])
                accumulate(accs, feats, post)
            if accs is None or accs.beta <= 0:
                continue
            W, impr = accs.update(min_count=min_count)
            writer.write(spk, W)
            tot_impr += impr * accs.beta
            tot_beta += accs.beta
            n += 1
    else:
        for utt, feats in SequentialTableReader("matrix", feats_arg):
            if utt not in post_reader:
                warn(f"no posteriors for {utt}")
                continue
            feats = np.asarray(feats, np.float64)
            accs = FmllrDiagGmmAccs(feats.shape[1])
            accumulate(accs, feats, post_reader[utt])
            if accs.beta <= 0:
                continue
            W, impr = accs.update(min_count=min_count)
            writer.write(utt, W)
            tot_impr += impr * accs.beta
            tot_beta += accs.beta
            n += 1
    writer.close()
    return n, tot_impr, tot_beta


def gmm_est_fmllr_gpost(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate global fMLLR transforms from Gaussian-level "
        "posteriors, per utterance or per speaker "
        "(gmm-est-fmllr-gpost.cc).\n"
        "Usage: gmm-est-fmllr-gpost [options] <model-in> "
        "<feature-rspecifier> <gpost-rspecifier> "
        "<transform-wspecifier>")
    spk2utt = po.register_value(
        "spk2utt", "", "rspecifier for speaker to utterance-list map")
    fmllr_min_count = po.register_value(
        "fmllr-min-count", 500.0,
        "Minimum count required to update fMLLR")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    tm, am = read_am_gmm(po.get_arg(1))
    writer = TableWriter("matrix", po.get_arg(4))
    n, impr, beta = _est_fmllr_groups(
        po, spk2utt[0], po.get_arg(2), po.get_arg(3), "gauss-post",
        lambda accs, feats, gp:
            accs.accumulate_from_gauss_post(am, feats, gp),
        writer, min_count=fmllr_min_count[0])
    log(f"estimated {n} fMLLR transforms from gposts; auxf impr/frame "
        f"{impr / max(beta, 1):.4f}")
    return 0 if n else 1


def gmm_est_fmllr_global(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate global fMLLR transforms against a single diagonal "
        "GMM (e.g. a UBM), per utterance or per speaker; --gselect "
        "restricts each frame's posterior computation to the "
        "pre-selected Gaussians (gmm-est-fmllr-global.cc).\n"
        "Usage: gmm-est-fmllr-global [options] <gmm-in> "
        "<feature-rspecifier> <transform-wspecifier>")
    spk2utt = po.register_value(
        "spk2utt", "", "rspecifier for speaker to utterance-list map")
    gselect_rs = po.register_value(
        "gselect", "", "rspecifier for Gaussian-selection information")
    fmllr_min_count = po.register_value(
        "fmllr-min-count", 500.0,
        "Minimum count required to update fMLLR")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
    gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    gsel = (RandomAccessTableReader("int-vector-vector", gselect_rs[0])
            if gselect_rs[0] else None)
    writer = TableWriter("matrix", po.get_arg(3))

    def accumulate(accs: FmllrDiagGmmAccs, key: str,
                   feats: np.ndarray) -> None:
        post = gmm.component_posteriors(feats.astype(np.float32))
        if gsel is not None and key in gsel:
            sel = gsel[key]
            mask = np.zeros_like(post)
            for t, idxs in enumerate(sel):
                if t >= post.shape[0]:
                    break
                mask[t, list(idxs)] = 1.0
            post = post * mask
            denom = post.sum(axis=1, keepdims=True)
            post = np.where(denom > 0, post / np.maximum(denom, 1e-30),
                            0.0)
        accs.accumulate_from_posteriors(gmm, feats, post)

    n = 0
    tot_impr = tot_beta = 0.0
    if spk2utt[0]:
        feat_reader = RandomAccessTableReader("matrix", po.get_arg(2))
        for spk, utts in SequentialTableReader("token-vector",
                                               spk2utt[0]):
            accs = FmllrDiagGmmAccs(gmm.dim)
            for u in utts:
                if u not in feat_reader:
                    warn(f"no features for {u}")
                    continue
                accumulate(accs, u,
                           np.asarray(feat_reader[u], np.float64))
            if accs.beta <= 0:
                continue
            W, impr = accs.update(min_count=fmllr_min_count[0])
            writer.write(spk, W)
            tot_impr += impr * accs.beta
            tot_beta += accs.beta
            n += 1
    else:
        for utt, feats in SequentialTableReader("matrix",
                                                po.get_arg(2)):
            accs = FmllrDiagGmmAccs(gmm.dim)
            accumulate(accs, utt, np.asarray(feats, np.float64))
            if accs.beta <= 0:
                continue
            W, impr = accs.update(min_count=fmllr_min_count[0])
            writer.write(utt, W)
            tot_impr += impr * accs.beta
            tot_beta += accs.beta
            n += 1
    writer.close()
    log(f"estimated {n} global fMLLR transforms; auxf impr/frame "
        f"{tot_impr / max(tot_beta, 1):.4f}")
    return 0 if n else 1


def _basis_fmllr_accs(argv: List[str], gpost_mode: bool) -> int:
    name = "gmm-basis-fmllr-accs-gpost" if gpost_mode \
        else "gmm-basis-fmllr-accs"
    src = "Gaussian-level posteriors" if gpost_mode else "posteriors"
    po = ParseOptions(
        f"Accumulate the fMLLR-basis gradient scatter from {src}, "
        "per utterance or per speaker "
        f"({name}.cc).\n"
        f"Usage: {name} [options] <model-in> <feature-rspecifier> "
        "<post-rspecifier> <accs-wxfilename>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    spk2utt = po.register_value(
        "spk2utt", "", "rspecifier for speaker to utterance-list map")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.cli.tail8_tools import _spk_groups
    from kaldi_tpu.transform.basis_fmllr import BasisFmllrAccus
    from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
    tm, am = read_am_gmm(po.get_arg(1))
    holder = "gauss-post" if gpost_mode else "posterior"
    feat_reader = RandomAccessTableReader("matrix", po.get_arg(2))
    post_reader = RandomAccessTableReader(holder, po.get_arg(3))
    accus = BasisFmllrAccus(am.dim)
    n = 0
    for spk, utts in _spk_groups(po, spk2utt[0], feat_reader.keys()):
        spk_accs = FmllrDiagGmmAccs(am.dim)
        for u in utts:
            if u not in feat_reader or u not in post_reader:
                continue
            feats = np.asarray(feat_reader[u], np.float64)
            if gpost_mode:
                spk_accs.accumulate_from_gauss_post(am, feats,
                                                    post_reader[u])
            else:
                spk_accs.accumulate_from_posterior(am, tm, feats,
                                                   post_reader[u])
        if spk_accs.beta > 0:
            accus.accumulate_gradient_scatter(spk_accs)
            n += 1
    kaldi_io.write_kaldi_object(accus.write, po.get_arg(4), binary[0])
    log(f"{name}: gradient scatter over {n} speakers "
        f"(beta {accus.beta:.1f})")
    return 0 if n else 1


def gmm_basis_fmllr_accs(argv: List[str]) -> int:
    return _basis_fmllr_accs(argv, gpost_mode=False)


def gmm_basis_fmllr_accs_gpost(argv: List[str]) -> int:
    return _basis_fmllr_accs(argv, gpost_mode=True)


def gmm_est_basis_fmllr_gpost(argv: List[str]) -> int:
    po = ParseOptions(
        "Per-speaker basis-fMLLR transforms from Gaussian-level "
        "posteriors (gmm-est-basis-fmllr-gpost.cc).\n"
        "Usage: gmm-est-basis-fmllr-gpost [options] <model-in> "
        "<basis-in> <feature-rspecifier> <gpost-rspecifier> "
        "<transform-wspecifier>")
    spk2utt = po.register_value(
        "spk2utt", "", "rspecifier for speaker to utterance-list map")
    size_scale = po.register_value(
        "size-scale", 0.2, "Coefficients per frame of speaker data")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.cli.tail8_tools import (_read_basis, _spk_groups)
    from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
    tm, am = read_am_gmm(po.get_arg(1))
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        b = iof.init_input_stream(f)
        est = _read_basis(f, b)
    feat_reader = RandomAccessTableReader("matrix", po.get_arg(3))
    gpost_reader = RandomAccessTableReader("gauss-post", po.get_arg(4))
    writer = TableWriter("matrix", po.get_arg(5))
    n = 0
    tot_impr = tot_beta = 0.0
    for spk, utts in _spk_groups(po, spk2utt[0], feat_reader.keys()):
        accs = FmllrDiagGmmAccs(am.dim)
        for u in utts:
            if u not in feat_reader or u not in gpost_reader:
                continue
            accs.accumulate_from_gauss_post(
                am, np.asarray(feat_reader[u], np.float64),
                gpost_reader[u])
        if accs.beta <= 0:
            continue
        W, impr, _k = est.compute_transform(accs,
                                            size_scale=size_scale[0])
        writer.write(spk, W)
        tot_impr += impr * accs.beta
        tot_beta += accs.beta
        n += 1
    writer.close()
    log(f"basis-fMLLR (gpost) transforms for {n} speakers; auxf "
        f"impr/frame {tot_impr / max(tot_beta, 1):.4f}")
    return 0 if n else 1


def _est_fmllr_raw_common(argv: List[str], usage: str, name: str,
                           gpost_mode: bool) -> int:
    """Shared driver for gmm-est-fmllr-raw / -gpost: estimate fMLLR in
    the pre-splice raw space against a model in LDA+MLLT space
    (gmm-est-fmllr-raw.cc; math in transform/fmllr_raw.py)."""
    po = ParseOptions(usage)
    spk2utt = po.register_value(
        "spk2utt", "", "rspecifier for speaker to utterance-list map")
    raw_feat_dim = po.register_value(
        "raw-feat-dim", 13, "Dimension of raw features prior to "
        "splicing")
    from kaldi_tpu.transform.fmllr_raw import (FmllrRawAccs,
                                               FmllrRawOptions)
    opts = FmllrRawOptions()
    min_count = po.register_value(
        "fmllr-min-count", opts.min_count,
        "Minimum count required to update fMLLR")
    num_iters = po.register_value(
        "fmllr-num-iters", opts.num_iters,
        "Number of iterations in fMLLR update phase")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    tm, am = read_am_gmm(po.get_arg(1))
    from kaldi_tpu.base.io_funcs import read_matrix
    full_mat = kaldi_io.read_kaldi_object(read_matrix, po.get_arg(2))
    opts = FmllrRawOptions(min_count=min_count[0],
                           num_iters=num_iters[0])
    post_kind = "gauss-post" if gpost_mode else "posterior"
    post_reader = RandomAccessTableReader(post_kind, po.get_arg(4))
    writer = TableWriter("matrix", po.get_arg(5))
    model_dim = am.get_pdf(0).dim

    def accumulate(accs, feats, post):
        for t, frame in enumerate(post):
            if t >= feats.shape[0]:
                break
            if gpost_mode:
                for pdf, vec in frame:
                    accs.accumulate_from_posteriors(
                        am.get_pdf(int(pdf)), feats[t],
                        np.asarray(vec, np.float64))
            else:
                for tid, w in frame:
                    if w == 0.0:
                        continue
                    pdf = tm.transition_id_to_pdf(int(tid))
                    accs.accumulate_for_gmm(am.get_pdf(pdf), feats[t],
                                            float(w))

    n, tot_impr, tot_count = 0, 0.0, 0.0
    if spk2utt[0]:
        feat_reader = RandomAccessTableReader("matrix", po.get_arg(3))
        groups = [(spk, [u for u in utts if u in feat_reader
                         and u in post_reader])
                  for spk, utts in SequentialTableReader(
                      "token-vector", spk2utt[0])]
    else:
        groups = None
    if groups is not None:
        for spk, utts in groups:
            accs = FmllrRawAccs(raw_feat_dim[0], model_dim, full_mat)
            for utt in utts:
                accumulate(accs, np.asarray(feat_reader[utt],
                                            np.float64),
                           post_reader[utt])
            if accs.count == 0:
                continue
            F, impr, count = accs.update(opts)
            writer.write(spk, F.astype(np.float32))
            tot_impr += impr
            tot_count += count
            n += 1
    else:
        for utt, feats in SequentialTableReader("matrix",
                                                po.get_arg(3)):
            if utt not in post_reader:
                warn(f"no posteriors for {utt}")
                continue
            accs = FmllrRawAccs(raw_feat_dim[0], model_dim, full_mat)
            accumulate(accs, np.asarray(feats, np.float64),
                       post_reader[utt])
            if accs.count == 0:
                continue
            F, impr, count = accs.update(opts)
            writer.write(utt, F.astype(np.float32))
            tot_impr += impr
            tot_count += count
            n += 1
    writer.close()
    log(f"{name}: estimated {n} raw fMLLR transforms, auxf impr/frame "
        f"{tot_impr / max(tot_count, 1.0):.4f} over {tot_count:.0f} "
        f"frames")
    return 0 if n else 1


def gmm_est_fmllr_raw(argv: List[str]) -> int:
    return _est_fmllr_raw_common(
        argv,
        "Estimate fMLLR transforms in the space before splicing and "
        "linear transforms such as LDA+MLLT, but using models in the "
        "space transformed by these transforms.  Requires the original "
        "spliced features, and the full LDA+MLLT matrix including the "
        "'rejected' rows (see get-full-lda-mat).\n"
        "Usage: gmm-est-fmllr-raw [options] <model-in> "
        "<full-lda-mat-in> <feature-rspecifier> <post-rspecifier> "
        "<transform-wspecifier>", "gmm-est-fmllr-raw", False)


def gmm_est_fmllr_raw_gpost(argv: List[str]) -> int:
    return _est_fmllr_raw_common(
        argv,
        "Estimate fMLLR transforms in the space before splicing and "
        "linear transforms, from Gaussian-level posteriors.\n"
        "Usage: gmm-est-fmllr-raw-gpost [options] <model-in> "
        "<full-lda-mat-in> <feature-rspecifier> <gpost-rspecifier> "
        "<transform-wspecifier>", "gmm-est-fmllr-raw-gpost", True)
