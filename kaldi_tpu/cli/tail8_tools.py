"""Round-3 CLI tail batch 6: speaker-transform estimation tools
(parity: src/gmmbin gmm-basis-fmllr-training.cc,
gmm-est-basis-fmllr.cc, gmm-init-lvtln.cc, gmm-train-lvtln-special.cc,
gmm-est-lvtln-trans.cc, gmm-make-regtree.cc,
gmm-est-regtree-fmllr-ali.cc; src/fmpebin? fmpe-init.cc, fmpe-est.cc,
fmpe-apply-transform.cc in src/gmmbin)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


# -- serialization helpers (container formats local to the CLI) -----------

def _write_basis(stream, binary, est) -> None:
    iof.write_token(stream, binary, "<BasisFmllr>")
    iof.write_int32(stream, binary, est.dim)
    iof.write_int32(stream, binary, len(est.bases))
    for b in est.bases:
        iof.write_matrix(stream, binary, b)
    iof.write_token(stream, binary, "</BasisFmllr>")


def _read_basis(stream, binary):
    from kaldi_tpu.transform.basis_fmllr import BasisFmllrEstimate
    iof.expect_token(stream, binary, "<BasisFmllr>")
    dim = iof.read_int32(stream, binary)
    n = iof.read_int32(stream, binary)
    est = BasisFmllrEstimate(dim)
    est.bases = [iof.read_matrix(stream, binary).astype(np.float64)
                 for _ in range(n)]
    iof.expect_token(stream, binary, "</BasisFmllr>")
    return est


def _write_lvtln(stream, binary, lv) -> None:
    iof.write_token(stream, binary, "<LinearVtln>")
    iof.write_vector(stream, binary, np.asarray(lv.warps, np.float64))
    for c in range(lv.num_classes):
        iof.write_matrix(stream, binary, lv.A[c])
    iof.write_token(stream, binary, "</LinearVtln>")


def _read_lvtln(stream, binary):
    from kaldi_tpu.transform.lvtln import LinearVtln
    iof.expect_token(stream, binary, "<LinearVtln>")
    warps = iof.read_vector(stream, binary).tolist()
    first = iof.read_matrix(stream, binary).astype(np.float64)
    lv = LinearVtln(first.shape[0], warps)
    lv.set_transform(0, first)
    for c in range(1, len(warps)):
        lv.set_transform(c, iof.read_matrix(stream, binary))
    iof.expect_token(stream, binary, "</LinearVtln>")
    return lv


def _write_regtree(stream, binary, tree) -> None:
    iof.write_token(stream, binary, "<RegressionTree>")
    iof.write_int32(stream, binary, tree.num_baseclasses)
    iof.write_int_vector(stream, binary, list(tree.parents))
    iof.write_int_vector(stream, binary, list(tree.leaves))
    rows = [(p, j, b) for (p, j), b in sorted(tree.gauss2bclass.items())]
    iof.write_int32(stream, binary, len(rows))
    for p, j, b in rows:
        iof.write_int32(stream, binary, p)
        iof.write_int32(stream, binary, j)
        iof.write_int32(stream, binary, b)
    iof.write_token(stream, binary, "</RegressionTree>")


def _read_regtree(stream, binary):
    from kaldi_tpu.transform.regtree_fmllr import RegressionTree
    iof.expect_token(stream, binary, "<RegressionTree>")
    nb = iof.read_int32(stream, binary)
    parents = list(iof.read_int_vector(stream, binary))
    leaves = list(iof.read_int_vector(stream, binary))
    n = iof.read_int32(stream, binary)
    g2b = {}
    for _ in range(n):
        p = iof.read_int32(stream, binary)
        j = iof.read_int32(stream, binary)
        b = iof.read_int32(stream, binary)
        g2b[(p, j)] = b
    iof.expect_token(stream, binary, "</RegressionTree>")
    return RegressionTree(nb, parents, g2b, leaves)


def _write_fmpe(stream, binary, fmpe) -> None:
    iof.write_token(stream, binary, "<Fmpe>")
    fmpe.gmm.write(stream, binary)
    iof.write_int_vector(stream, binary,
                         list(fmpe.opts.context_offsets))
    iof.write_float(stream, binary, fmpe.opts.post_floor)
    iof.write_int32(stream, binary, fmpe.M.shape[2])
    for c in range(fmpe.M.shape[0]):
        iof.write_matrix(stream, binary, fmpe.M[c])
    iof.write_token(stream, binary, "</Fmpe>")


def _read_fmpe(stream, binary):
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.transform.fmpe import Fmpe, FmpeOptions
    iof.expect_token(stream, binary, "<Fmpe>")
    gmm = DiagGmm.read(stream, binary)
    offsets = tuple(iof.read_int_vector(stream, binary))
    floor = iof.read_float(stream, binary)
    feat_dim = iof.read_int32(stream, binary)
    fmpe = Fmpe(gmm, feat_dim,
                FmpeOptions(context_offsets=offsets, post_floor=floor))
    fmpe.M = np.stack([iof.read_matrix(stream, binary)
                       .astype(np.float32)
                       for _ in range(len(offsets))])
    iof.expect_token(stream, binary, "</Fmpe>")
    return fmpe


def _spk_groups(po, spk2utt_rs, keys):
    """[(spk, [utts])] — per spk2utt or per utterance."""
    if spk2utt_rs:
        return [(spk, list(utts)) for spk, utts in
                SequentialTableReader("token-vector", spk2utt_rs)]
    return [(k, [k]) for k in sorted(keys)]


# -- basis fMLLR ------------------------------------------------------------

def gmm_basis_fmllr_training(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate the fMLLR basis from training speakers' gradient "
        "scatter (gmm-basis-fmllr-training.cc, Povey & Yao 2012).\n"
        "Usage: gmm-basis-fmllr-training [options] <model-in> "
        "<feats-rspecifier> <ali-rspecifier> <basis-out>\n"
        "   or: gmm-basis-fmllr-training [options] <model-in> "
        "<basis-out> <accs-in1> [<accs-in2> ...]  (reference form: "
        "read gradient-scatter accs from gmm-basis-fmllr-accs)")
    binary = po.register_value("binary", True, "Write output in binary mode")
    spk2utt = po.register_value("spk2utt", "",
                                "Speaker-to-utterance map rspecifier")
    basis_size = po.register_value(
        "basis-size", 0, "Number of basis matrices to keep "
        "(0 = D*(D+1))")
    po.read(argv)
    if po.num_args() < 3:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.transform.basis_fmllr import (BasisFmllrAccus,
                                                 BasisFmllrEstimate)
    from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
    if not any(po.get_arg(2).startswith(p) for p in ("ark", "scp")):
        # reference form: args are accs files
        tm, am = read_am_gmm(po.get_arg(1))
        accus = None
        for i in range(3, po.num_args() + 1):
            a = kaldi_io.read_kaldi_object(BasisFmllrAccus.read,
                                           po.get_arg(i))
            if accus is None:
                accus = a
            else:
                accus.add(a)
        est = BasisFmllrEstimate(am.dim)
        est.estimate_fmllr_basis(accus, basis_size[0] or None)
        kaldi_io.write_kaldi_object(
            lambda s, b: _write_basis(s, b, est), po.get_arg(2),
            binary[0])
        log(f"estimated fMLLR basis from {po.num_args() - 2} accs "
            f"(beta {accus.beta:.1f})")
        return 0
    if po.num_args() != 4:
        po.print_usage()
        return 1
    tm, am = read_am_gmm(po.get_arg(1))
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(2))
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(3))
    accus = BasisFmllrAccus(am.dim)
    n = 0
    for spk, utts in _spk_groups(po, spk2utt[0], feats_reader.keys()):
        spk_accs = FmllrDiagGmmAccs(am.dim)
        for u in utts:
            if u not in feats_reader or u not in ali_reader:
                continue
            spk_accs.accumulate_from_alignment(
                am, tm, np.asarray(feats_reader[u], np.float64),
                ali_reader[u])
        if spk_accs.beta > 0:
            accus.accumulate_gradient_scatter(spk_accs)
            n += 1
    est = BasisFmllrEstimate(am.dim)
    est.estimate_fmllr_basis(accus, basis_size[0] or None)
    kaldi_io.write_kaldi_object(
        lambda s, b: _write_basis(s, b, est), po.get_arg(4), binary[0])
    log(f"estimated fMLLR basis from {n} speakers")
    return 0 if n else 1


def gmm_est_basis_fmllr(argv: List[str]) -> int:
    po = ParseOptions(
        "Per-speaker basis-fMLLR transforms (coefficients scale with "
        "the speaker's frame count; gmm-est-basis-fmllr.cc).\n"
        "Usage: gmm-est-basis-fmllr [options] <model-in> <basis-in> "
        "<feats-rspecifier> <ali-rspecifier> <trans-wspecifier>")
    spk2utt = po.register_value("spk2utt", "",
                                "Speaker-to-utterance map rspecifier")
    size_scale = po.register_value(
        "size-scale", 0.2, "Coefficients per frame of speaker data")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
    tm, am = read_am_gmm(po.get_arg(1))
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        b = iof.init_input_stream(f)
        est = _read_basis(f, b)
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(3))
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(4))
    writer = TableWriter("matrix", po.get_arg(5))
    n = 0
    tot_impr = tot_beta = 0.0
    for spk, utts in _spk_groups(po, spk2utt[0], feats_reader.keys()):
        accs = FmllrDiagGmmAccs(am.dim)
        for u in utts:
            if u not in feats_reader or u not in ali_reader:
                continue
            accs.accumulate_from_alignment(
                am, tm, np.asarray(feats_reader[u], np.float64),
                ali_reader[u])
        if accs.beta <= 0:
            continue
        W, impr, k = est.compute_transform(accs,
                                           size_scale=size_scale[0])
        writer.write(spk, W)
        tot_impr += impr * accs.beta
        tot_beta += accs.beta
        n += 1
    writer.close()
    log(f"basis-fMLLR transforms for {n} speakers; auxf impr/frame "
        f"{tot_impr / max(tot_beta, 1):.4f}")
    return 0 if n else 1


# -- LVTLN ------------------------------------------------------------------

def gmm_init_lvtln(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize a linear-VTLN object with identity transforms.\n"
        "Usage: gmm-init-lvtln [options] <lvtln-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    dim = po.register_value("dim", 13, "Feature dimension")
    num_classes = po.register_value("num-classes", 31,
                                    "Number of warp classes")
    default_class = po.register_value("default-class", 15,
                                      "Index of the 1.0 warp")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    from kaldi_tpu.transform.lvtln import LinearVtln
    C, d0 = num_classes[0], default_class[0]
    warps = [1.0 + 0.01 * (c - d0) for c in range(C)]
    lv = LinearVtln(dim[0], warps)
    kaldi_io.write_kaldi_object(
        lambda s, b: _write_lvtln(s, b, lv), po.get_arg(1), binary[0])
    log(f"initialized LVTLN: dim {dim[0]}, {C} classes, warps "
        f"{warps[0]:.2f}..{warps[-1]:.2f}")
    return 0


def gmm_train_lvtln_special(argv: List[str]) -> int:
    po = ParseOptions(
        "Train one LVTLN class transform as the least-squares map "
        "from unwarped to warped parallel features "
        "(gmm-train-lvtln-special.cc).\n"
        "Usage: gmm-train-lvtln-special [options] <class-index> "
        "<lvtln-in> <lvtln-out> <feats-unwarped-rspecifier> "
        "<feats-warped-rspecifier>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    warp = po.register_value("warp", 0.0,
                             "Record this warp factor for the class "
                             "(0 = keep current)")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    c = int(po.get_arg(1))
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        b = iof.init_input_stream(f)
        lv = _read_lvtln(f, b)
    warped_reader = RandomAccessTableReader("matrix", po.get_arg(5))
    X, Y = [], []
    for key, un in SequentialTableReader("matrix", po.get_arg(4)):
        if key not in warped_reader:
            warn(f"no warped feats for {key}")
            continue
        w = np.asarray(warped_reader[key], np.float64)
        u = np.asarray(un, np.float64)
        T = min(len(u), len(w))
        X.append(u[:T])
        Y.append(w[:T])
    if not X:
        return 1
    Xc = np.concatenate(X)
    Yc = np.concatenate(Y)
    D = lv.dim
    XtX = Xc.T @ Xc + 1e-6 * np.eye(D)
    A = np.linalg.solve(XtX.T, (Xc.T @ Yc)).T
    lv.set_transform(c, A)
    if warp[0]:
        lv.warps[c] = warp[0]
    kaldi_io.write_kaldi_object(
        lambda s, b_: _write_lvtln(s, b_, lv), po.get_arg(3),
        binary[0])
    err = float(np.mean((Xc @ A.T - Yc) ** 2))
    log(f"trained LVTLN class {c}: mse {err:.5f} over "
        f"{Xc.shape[0]} frames")
    return 0


def gmm_est_lvtln_trans(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate per-speaker linear-VTLN transforms (choose the "
        "best warp class by fMLLR auxiliary; "
        "gmm-est-lvtln-trans.cc).\n"
        "Usage: gmm-est-lvtln-trans [options] <model-in> <lvtln-in> "
        "<feats-rspecifier> <ali-rspecifier> <trans-wspecifier> "
        "[<warp-wspecifier>]")
    spk2utt = po.register_value("spk2utt", "",
                                "Speaker-to-utterance map rspecifier")
    po.read(argv)
    if po.num_args() < 5 or po.num_args() > 6:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
    tm, am = read_am_gmm(po.get_arg(1))
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        b = iof.init_input_stream(f)
        lv = _read_lvtln(f, b)
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(3))
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(4))
    writer = TableWriter("matrix", po.get_arg(5))
    warp_writer = (TableWriter("float", po.get_arg(6))
                   if po.num_args() == 6 else None)
    n = 0
    warps_out = []
    for spk, utts in _spk_groups(po, spk2utt[0], feats_reader.keys()):
        accs = FmllrDiagGmmAccs(am.dim)
        for u in utts:
            if u not in feats_reader or u not in ali_reader:
                continue
            accs.accumulate_from_alignment(
                am, tm, np.asarray(feats_reader[u], np.float64),
                ali_reader[u])
        if accs.beta <= 0:
            continue
        W, warp, impr = lv.compute_transform(accs)
        writer.write(spk, W)
        if warp_writer:
            warp_writer.write(spk, float(warp))
        warps_out.append(warp)
        n += 1
    writer.close()
    if warp_writer:
        warp_writer.close()
    log(f"LVTLN transforms for {n} speakers; warps "
        f"{min(warps_out, default=0):.2f}.."
        f"{max(warps_out, default=0):.2f}")
    return 0 if n else 1


# -- regression-tree fMLLR ---------------------------------------------------

def gmm_make_regtree(argv: List[str]) -> int:
    po = ParseOptions(
        "Build a Gaussian-level regression tree for a GMM model "
        "(gmm-make-regtree.cc).\n"
        "Usage: gmm-make-regtree [options] <model-in> <regtree-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    max_leaves = po.register_value("max-leaves", 4,
                                   "Number of base classes")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.transform.regtree_fmllr import RegressionTree
    tm, am = read_am_gmm(po.get_arg(1))
    tree = RegressionTree.build(am, num_baseclasses=max_leaves[0])
    kaldi_io.write_kaldi_object(
        lambda s, b: _write_regtree(s, b, tree), po.get_arg(2),
        binary[0])
    log(f"built regression tree with {tree.num_baseclasses} "
        "base classes")
    return 0


def gmm_est_regtree_fmllr_ali(argv: List[str]) -> int:
    po = ParseOptions(
        "Estimate per-speaker regression-tree fMLLR transforms from "
        "alignments (gmm-est-regtree-fmllr-ali.cc).\n"
        "Usage: gmm-est-regtree-fmllr-ali [options] <model-in> "
        "<feats-rspecifier> <ali-rspecifier> <regtree-in> "
        "<xforms-wspecifier>")
    spk2utt = po.register_value("spk2utt", "",
                                "Speaker-to-utterance map rspecifier")
    min_count = po.register_value("fmllr-min-count", 200.0,
                                  "Minimum frames per transform")
    po.read(argv)
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.transform.regtree_fmllr import (RegtreeFmllr,
                                                   RegtreeFmllrAccs,
                                                   estimate_regtree_fmllr)
    from kaldi_tpu.util.table import ObjectHolder
    tm, am = read_am_gmm(po.get_arg(1))
    with kaldi_io.input_stream(po.get_arg(4)) as f:
        b = iof.init_input_stream(f)
        tree = _read_regtree(f, b)
    feats_reader = RandomAccessTableReader("matrix", po.get_arg(2))
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(3))
    writer = TableWriter(ObjectHolder(RegtreeFmllr), po.get_arg(5))
    n = 0
    for spk, utts in _spk_groups(po, spk2utt[0], feats_reader.keys()):
        accs = RegtreeFmllrAccs(tree, am.dim)
        used = 0
        for u in utts:
            if u not in feats_reader or u not in ali_reader:
                continue
            accs.accumulate_from_alignment(
                am, tm, np.asarray(feats_reader[u], np.float64),
                ali_reader[u])
            used += 1
        if not used:
            continue
        xforms, impr = estimate_regtree_fmllr(accs,
                                              min_count=min_count[0])
        writer.write(spk, xforms)
        n += 1
    writer.close()
    log(f"regtree-fMLLR transforms for {n} speakers")
    return 0 if n else 1


# -- fMPE ---------------------------------------------------------------------

def fmpe_init(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize an fMPE transform from a (small) diagonal UBM "
        "(fmpe-init.cc).\n"
        "Usage: fmpe-init [options] <diag-ubm-in> <fmpe-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.transform.fmpe import Fmpe
    ubm = kaldi_io.read_kaldi_object(DiagGmm.read, po.get_arg(1))
    fmpe = Fmpe(ubm, ubm.dim)
    kaldi_io.write_kaldi_object(
        lambda s, b: _write_fmpe(s, b, fmpe), po.get_arg(2), binary[0])
    log(f"initialized fMPE: {ubm.num_gauss} gaussians, "
        f"{fmpe.M.shape[0]} contexts")
    return 0


def fmpe_est(argv: List[str]) -> int:
    po = ParseOptions(
        "Train the fMPE projection: either fused gradient epochs on "
        "aligned data, or the reference form applying accumulated "
        "stats from gmm-fmpe-acc-stats / fmpe-sum-accs "
        "(fmpe-est.cc).\n"
        "Usage: fmpe-est [options] <model-in> <fmpe-in> "
        "<feats-rspecifier> <ali-rspecifier> <fmpe-out>\n"
        "   or: fmpe-est [options] <fmpe-in> <stats-in> <fmpe-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    num_epochs = po.register_value("num-epochs", 10, "Gradient epochs")
    learning_rate = po.register_value(
        "learning-rate", 0.0,
        "Step size for the stats-mode update (0 = the fmpe object's "
        "configured rate)")
    po.read(argv)
    if po.num_args() == 3:
        from kaldi_tpu.transform.fmpe import FmpeStats
        with kaldi_io.input_stream(po.get_arg(1)) as f:
            b = iof.init_input_stream(f)
            fmpe = _read_fmpe(f, b)
        stats = kaldi_io.read_kaldi_object(FmpeStats.read,
                                           po.get_arg(2))
        lr = learning_rate[0] or fmpe.opts.learning_rate
        fmpe.M = (fmpe.M + lr * stats.grad
                  / max(stats.tot_frames, 1.0)).astype(np.float32)
        kaldi_io.write_kaldi_object(
            lambda s, b_: _write_fmpe(s, b_, fmpe), po.get_arg(3),
            binary[0])
        log(f"applied fMPE stats update (lr {lr}, "
            f"{stats.tot_frames:.0f} frames)")
        return 0
    if po.num_args() != 5:
        po.print_usage()
        return 1
    from kaldi_tpu.cli.gmm_tools import read_am_gmm
    from kaldi_tpu.transform.fmpe import train_fmpe
    tm, am = read_am_gmm(po.get_arg(1))
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        b = iof.init_input_stream(f)
        fmpe = _read_fmpe(f, b)
    fmpe.opts.num_epochs = num_epochs[0]
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(4))
    feats_list, ali_list = [], []
    for key, feats in SequentialTableReader("matrix", po.get_arg(3)):
        if key not in ali_reader:
            continue
        feats_list.append(np.asarray(feats, np.float64))
        ali_list.append(tm.transition_ids_to_pdfs(
            ali_reader[key]).tolist())
    if not feats_list:
        return 1
    objfs = train_fmpe(fmpe, am, feats_list, ali_list)
    kaldi_io.write_kaldi_object(
        lambda s, b_: _write_fmpe(s, b_, fmpe), po.get_arg(5),
        binary[0])
    log(f"fMPE trained: objf {objfs[0]:.4f} -> {objfs[-1]:.4f}")
    return 0


def fmpe_apply_transform(argv: List[str]) -> int:
    po = ParseOptions(
        "Apply an fMPE transform to features "
        "(fmpe-apply-transform.cc).\n"
        "Usage: fmpe-apply-transform [options] <fmpe-in> "
        "<feats-rspecifier> <feats-wspecifier>")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        b = iof.init_input_stream(f)
        fmpe = _read_fmpe(f, b)
    writer = TableWriter("matrix", po.get_arg(3))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        writer.write(key, fmpe.apply(np.asarray(feats, np.float32)))
        n += 1
    writer.close()
    log(f"applied fMPE to {n} utterances")
    return 0 if n else 1
