"""MLLT-global / LDA / UBM-init / rescale CLI tail (parity:
src/gmmbin gmm-acc-mllt-global.cc, gmm-est-rescale.cc;
src/bin sum-mllt-accs.cc; src/featbin get-full-lda-mat.cc;
src/sgmm2bin init-ubm.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def gmm_acc_mllt_global(argv: List[str]) -> int:
    po = ParseOptions(
        "Accumulate MLLT (global STC) statistics against a single "
        "global GMM, e.g. a UBM; --gselect restricts each frame to "
        "the pre-selected Gaussians (gmm-acc-mllt-global.cc).\n"
        "Usage: gmm-acc-mllt-global [options] <gmm-in> "
        "<feature-rspecifier> <stats-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    gselect_rs = po.register_value(
        "gselect", "", "rspecifier for Gaussian-selection information")
    rand_prune = po.register_value(
        "rand-prune", 0.25, "Randomized pruning threshold for "
        "posteriors (preserves expectations)")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.transform.mllt import MlltAccs
    gmm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    gsel = (RandomAccessTableReader("int-vector-vector", gselect_rs[0])
            if gselect_rs[0] else None)
    accs = MlltAccs(gmm.dim)
    rng = np.random.default_rng(0)
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        feats = np.asarray(feats, np.float64)
        post = gmm.component_posteriors(feats.astype(np.float32)
                                        ).astype(np.float64)
        if gsel is not None and key in gsel:
            mask = np.zeros_like(post)
            for t, idxs in enumerate(gsel[key]):
                if t >= post.shape[0]:
                    break
                mask[t, list(idxs)] = 1.0
            post = post * mask
            denom = post.sum(axis=1, keepdims=True)
            post = np.where(denom > 0,
                            post / np.maximum(denom, 1e-30), 0.0)
        if rand_prune[0] > 0.0:
            small = post < rand_prune[0]
            keep = rng.random(post.shape) <= post / rand_prune[0]
            post = np.where(small,
                            np.where(keep, rand_prune[0], 0.0), post)
        accs.accumulate_from_posteriors(gmm, feats, post)
        n += 1
    kaldi_io.write_kaldi_object(accs.write, po.get_arg(3), binary[0])
    log(f"accumulated global MLLT stats from {n} utterances "
        f"(beta {accs.beta:.1f})")
    return 0 if n else 1


def sum_mllt_accs(argv: List[str]) -> int:
    po = ParseOptions(
        "Sum MLLT (STC) statistics (sum-mllt-accs.cc).\n"
        "Usage: sum-mllt-accs [options] <stats-out> <stats-in1> "
        "<stats-in2> ...")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.transform.mllt import MlltAccs
    total = None
    for i in range(2, po.num_args() + 1):
        a = kaldi_io.read_kaldi_object(MlltAccs.read, po.get_arg(i))
        if total is None:
            total = a
        else:
            total.add(a)
    kaldi_io.write_kaldi_object(total.write, po.get_arg(1), binary[0])
    log(f"summed {po.num_args() - 1} MLLT stats (beta {total.beta:.1f})")
    return 0


def get_full_lda_mat(argv: List[str]) -> int:
    po = ParseOptions(
        "Combine a (reduced-dim) LDA+MLLT matrix with the full LDA "
        "matrix from est-lda --write-full-matrix: the output applies "
        "LDA+MLLT on the kept rows and the remaining full-LDA rows "
        "below, and is square/invertible (get-full-lda-mat.cc, used "
        "by predictive SGMMs and fMPE).\n"
        "Usage: get-full-lda-mat [options] <lda-mllt-rxfilename> "
        "<full-lda-rxfilename> <full-lda-mllt-wxfilename> "
        "[<inv-full-lda-mllt-wxfilename>]")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 3 or po.num_args() > 4:
        po.print_usage()
        return 1
    lda_mllt = np.asarray(kaldi_io.read_kaldi_object(
        iof.read_matrix, po.get_arg(1)), np.float64)
    full_lda = np.asarray(kaldi_io.read_kaldi_object(
        iof.read_matrix, po.get_arg(2)), np.float64)
    d, full_d = lda_mllt.shape
    if full_lda.shape != (full_d, full_d):
        print(f"get-full-lda-mat: full LDA matrix must be square "
              f"{full_d}x{full_d}, got {full_lda.shape}", flush=True)
        return 1
    out = np.concatenate([lda_mllt, full_lda[d:]], axis=0)
    kaldi_io.write_kaldi_object(
        lambda s, b: iof.write_matrix(s, b, out.astype(np.float32)),
        po.get_arg(3), binary[0])
    if po.num_args() >= 4:
        inv = np.linalg.inv(out)
        kaldi_io.write_kaldi_object(
            lambda s, b: iof.write_matrix(s, b,
                                          inv.astype(np.float32)),
            po.get_arg(4), binary[0])
    log(f"wrote full LDA+MLLT matrix ({full_d}x{full_d})")
    return 0


def gmm_est_rescale(argv: List[str]) -> int:
    po = ParseOptions(
        "Re-scaling re-estimation: shift each Gaussian's mean by the "
        "change in the data's ML mean and scale its variance by the "
        "ratio of ML variances, preserving the model-vs-data offset "
        "from prior discriminative training (gmm-est-rescale.cc, "
        "used in fMPE; indirect-diff-diag-gmm.cc:177 "
        "DoRescalingUpdate). Transitions and weights unchanged.\n"
        "Usage: gmm-est-rescale [options] <model-in> <old-stats-in> "
        "<new-stats-in> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    min_variance = po.register_value(
        "min-variance", 0.001, "Variance floor (absolute variance)")
    min_occ = po.register_value(
        "min-gaussian-occupancy", 10.0,
        "Minimum occupancy to update a Gaussian")
    po.read(argv)
    if po.num_args() != 4:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm, write_am_gmm
    from kaldi_tpu.gmm.mle import AccumAmDiagGmm
    tm, am = read_am_gmm(po.get_arg(1))
    old = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(2))
    new = kaldi_io.read_kaldi_object(AccumAmDiagGmm.read, po.get_arg(3))
    if len(old.accs) != am.num_pdfs or len(new.accs) != am.num_pdfs:
        print("gmm-est-rescale: stats do not match the model",
              flush=True)
        return 1
    tot_count = tot_div = 0.0
    for pdf in range(am.num_pdfs):
        g = am.get_pdf(pdf)
        oa, na = old.accs[pdf], new.accs[pdf]
        means = g.get_means().astype(np.float64)
        var = (1.0 / g.inv_vars).astype(np.float64)
        for m in range(g.num_gauss):
            oc, nc = float(oa.occupancy[m]), float(na.occupancy[m])
            if oc <= min_occ[0] or nc <= min_occ[0]:
                warn(f"skipping gaussian with small count "
                     f"(old, new) = {oc:.1f}, {nc:.1f}")
                continue
            tot_count += nc
            old_mean = oa.mean_accs[m] / oc
            old_var = oa.var_accs[m] / oc - old_mean ** 2
            new_mean = na.mean_accs[m] / nc
            new_var = na.var_accs[m] / nc - new_mean ** 2
            model_mean = means[m] + new_mean - old_mean
            model_var = np.maximum(
                min_variance[0],
                var[m] * new_var / np.maximum(old_var, 1e-20))
            div = 0.5 * (((model_mean - means[m]) ** 2
                          + model_var - var[m]) / var[m]
                         + np.log(var[m] / model_var))
            tot_div += float(div.sum()) * nc
            means[m], var[m] = model_mean, model_var
        g.set_from_means_and_vars(g.weights, means, var)
        g.compute_gconsts()
    write_am_gmm(po.get_arg(4), tm, am, binary[0])
    log(f"rescaled model: K-L divergence from old to new "
        f"{tot_div / max(tot_count, 1):.4f} over {tot_count:.0f} "
        "frames")
    return 0


def init_ubm(argv: List[str]) -> int:
    po = ParseOptions(
        "Cluster the Gaussians in a diagonal-GMM acoustic model to a "
        "single full- or diagonal-covariance background GMM "
        "(sgmm2bin/init-ubm.cc).\n"
        "Usage: init-ubm [options] <model-file> <state-occs> "
        "<gmm-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    fullcov = po.register_value("fullcov-ubm", True,
                                "Write out a full covariance UBM")
    ubm_num_gauss = po.register_value(
        "ubm-num-gauss", 400, "Number of Gaussians in the final UBM")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.gmm.am_diag_gmm import cluster_gaussians_to_ubm
    tm, am = read_am_gmm(po.get_arg(1))
    occs = np.asarray(kaldi_io.read_kaldi_object(
        iof.read_vector, po.get_arg(2)), np.float64)
    if len(occs) != am.num_pdfs:
        print(f"init-ubm: occs dim {len(occs)} vs {am.num_pdfs} pdfs",
              flush=True)
        return 1
    ubm = cluster_gaussians_to_ubm(am, occs, ubm_num_gauss[0])
    if fullcov[0]:
        from kaldi_tpu.gmm.full_gmm import FullGmm
        full = FullGmm(ubm.num_gauss, ubm.dim)
        covars = np.stack([np.diag(v)
                           for v in (1.0 / ubm.inv_vars)
                           .astype(np.float64)])
        full.set_from_means_and_covars(ubm.weights, ubm.get_means(),
                                       covars)
        kaldi_io.write_kaldi_object(full.write, po.get_arg(3),
                                    binary[0])
    else:
        kaldi_io.write_kaldi_object(ubm.write, po.get_arg(3),
                                    binary[0])
    log(f"initialized UBM with {ubm.num_gauss} gaussians "
        f"({'full' if fullcov[0] else 'diagonal'} covariance)")
    return 0
