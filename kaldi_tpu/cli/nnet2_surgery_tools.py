"""nnet2bin model-surgery CLIs: nnet-insert, nnet-replace-last-layers,
nnet-am-mixup, nnet-am-widen, nnet-am-fix, nnet-am-reinitialize,
nnet-am-switch-preconditioning, nnet-normalize-stddev,
nnet-get-feature-transform, nnet-get-feature-transform-multi
(src/nnet2bin/*.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions


def _read_am(path):
    from kaldi_tpu.nnet2 import read_nnet2_am
    return read_nnet2_am(path)


def _write_am(path, tm, am, binary):
    from kaldi_tpu.nnet2 import write_nnet2_am
    write_nnet2_am(path, tm, am, binary)


def nnet_insert(argv: List[str]) -> int:
    po = ParseOptions(
        "Insert components into an nnet2 acoustic model; by default "
        "before the affine preceding the softmax, randomizing that "
        "affine (nnet2bin/nnet-insert.cc).\n"
        "Usage: nnet-insert [options] <nnet-in> "
        "<raw-nnet-to-insert-in> <nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    randomize_next = po.register_value(
        "randomize-next-component", True, "Randomize the parameters "
        "of the component after the insertion point")
    insert_at = po.register_value(
        "insert-at", -1, "Insert before this zero-based component "
        "index; -1 = before the component before the softmax")
    stddev_factor = po.register_value(
        "stddev-factor", 0.1, "Factor on the randomization stddev")
    srand = po.register_value("srand", 0, "Random seed")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import read_raw_nnet2
    from kaldi_tpu.nnet2.surgery import (index_of_softmax,
                                         insert_components)
    tm, am = _read_am(po.get_arg(1))
    src = read_raw_nnet2(po.get_arg(2))
    at = insert_at[0]
    if at < 0:
        at = index_of_softmax(am.nnet)
        if at < 0:
            warn("no unique softmax component; use --insert-at")
            return 1
        at -= 1
    insert_components(am.nnet, src, at,
                      randomize_next=randomize_next[0],
                      stddev_factor=stddev_factor[0],
                      rng=np.random.RandomState(srand[0]))
    log(f"Inserted {len(src.components)} components at position {at}")
    _write_am(po.get_arg(3), tm, am, binary[0])
    return 0


def nnet_replace_last_layers(argv: List[str]) -> int:
    po = ParseOptions(
        "Remove the last --remove-layers components and append the "
        "supplied raw net (nnet2bin/nnet-replace-last-layers.cc).\n"
        "Usage: nnet-replace-last-layers [options] <nnet-in> "
        "<raw-nnet-to-insert-in> <nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    remove_layers = po.register_value("remove-layers", 2,
                                      "Number of components to remove")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import read_raw_nnet2
    from kaldi_tpu.nnet2.surgery import replace_last_components
    tm, am = _read_am(po.get_arg(1))
    src = read_raw_nnet2(po.get_arg(2))
    replace_last_components(am.nnet, src, remove_layers[0])
    log(f"Replaced last {remove_layers[0]} components with "
        f"{len(src.components)} new ones")
    _write_am(po.get_arg(3), tm, am, binary[0])
    return 0


def nnet_am_mixup(argv: List[str]) -> int:
    po = ParseOptions(
        "Add mixture components to an nnet2 model (like GMM mixtures; "
        "nnet2bin/nnet-am-mixup.cc).\n"
        "Usage: nnet-am-mixup [options] <nnet-in> <nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    num_mixtures = po.register_value(
        "num-mixtures", 0, "Target number of mixture components "
        "(must exceed #pdfs)")
    power = po.register_value("power", 0.25,
                              "Occupancy power for allocation")
    min_count = po.register_value("min-count", 1000.0,
                                  "Minimum count per mixture")
    perturb_stddev = po.register_value(
        "perturb-stddev", 0.1, "Stddev of the duplicate perturbation")
    srand = po.register_value("srand", 0, "Random seed")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2.surgery import mixup_nnet
    tm, am = _read_am(po.get_arg(1))
    target = num_mixtures[0] or tm.num_pdfs
    mixup_nnet(am.nnet, target, power=power[0], min_count=min_count[0],
               perturb_stddev=perturb_stddev[0],
               rng=np.random.RandomState(srand[0]))
    _write_am(po.get_arg(2), tm, am, binary[0])
    return 0


def nnet_am_widen(argv: List[str]) -> int:
    po = ParseOptions(
        "Widen the hidden layers of an nnet2 model "
        "(nnet2bin/nnet-am-widen.cc).\n"
        "Usage: nnet-am-widen [options] <nnet-in> <nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    hidden_layer_dim = po.register_value(
        "hidden-layer-dim", -1, "New dimension of the hidden layers")
    param_stddev_factor = po.register_value(
        "param-stddev-factor", 1.0, "Factor on the stddev (relative "
        "to 1/sqrt(input-dim)) of new rows")
    srand = po.register_value("srand", 0, "Random seed")
    po.read(argv)
    if po.num_args() != 2 or hidden_layer_dim[0] <= 0:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2.surgery import widen_nnet
    tm, am = _read_am(po.get_arg(1))
    widen_nnet(am.nnet, hidden_layer_dim[0],
               param_stddev_factor=param_stddev_factor[0],
               rng=np.random.RandomState(srand[0]))
    _write_am(po.get_arg(2), tm, am, binary[0])
    return 0


def nnet_am_fix(argv: List[str]) -> int:
    po = ParseOptions(
        "Fix pathologies in an nnet2 model using stored derivative "
        "statistics (nnet2bin/nnet-am-fix.cc).\n"
        "Usage: nnet-am-fix [options] <nnet-in> <nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    min_average_deriv = po.register_value(
        "min-average-deriv", 0.1, "Minimum average derivative "
        "relative to the nonlinearity maximum")
    max_average_deriv = po.register_value(
        "max-average-deriv", 0.75, "Maximum average derivative")
    parameter_factor = po.register_value(
        "parameter-factor", 2.0, "Maximum parameter rescale factor")
    relu_bias_change = po.register_value(
        "relu-bias-change", 1.0, "Bias change for stuck ReLUs")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2.surgery import fix_nnet
    tm, am = _read_am(po.get_arg(1))
    fix_nnet(am.nnet, min_average_deriv=min_average_deriv[0],
             max_average_deriv=max_average_deriv[0],
             parameter_factor=parameter_factor[0],
             relu_bias_change=relu_bias_change[0])
    _write_am(po.get_arg(2), tm, am, binary[0])
    return 0


def nnet_am_reinitialize(argv: List[str]) -> int:
    po = ParseOptions(
        "Resize and zero the last layer of an nnet2 model to match a "
        "new transition model (language/tree transfer; "
        "nnet2bin/nnet-am-reinitialize.cc).\n"
        "Usage: nnet-am-reinitialize [options] <nnet-in> "
        "<new-transition-model> <nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.nnet2.surgery import reinitialize_last_layer
    _tm_old, am = _read_am(po.get_arg(1))
    tm_new = kaldi_io.read_kaldi_object(TransitionModel.read,
                                        po.get_arg(2))
    reinitialize_last_layer(am.nnet, tm_new.num_pdfs)
    am.priors = np.zeros(tm_new.num_pdfs, np.float32)
    _write_am(po.get_arg(3), tm_new, am, binary[0])
    log(f"nnet-am-reinitialize: resized last layer to "
        f"{tm_new.num_pdfs} pdfs")
    return 0


def nnet_am_switch_preconditioning(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert affine components to online-preconditioned ones "
        "(nnet2bin/nnet-am-switch-preconditioning.cc).\n"
        "Usage: nnet-am-switch-preconditioning [options] <nnet-in> "
        "<nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    rank_in = po.register_value("rank-in", 20,
                                "Rank for input-side preconditioner")
    rank_out = po.register_value("rank-out", 80,
                                 "Rank for output-side preconditioner")
    update_period = po.register_value(
        "update-period", 4, "Preconditioner update period")
    num_samples_history = po.register_value(
        "num-samples-history", 2000.0, "Samples of history")
    alpha = po.register_value("alpha", 4.0, "Smoothing constant")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2.surgery import switch_preconditioning
    tm, am = _read_am(po.get_arg(1))
    switch_preconditioning(am.nnet, rank_in=rank_in[0],
                           rank_out=rank_out[0],
                           update_period=update_period[0],
                           num_samples_history=num_samples_history[0],
                           alpha=alpha[0])
    _write_am(po.get_arg(2), tm, am, binary[0])
    log("nnet-am-switch-preconditioning: done")
    return 0


def nnet_normalize_stddev(argv: List[str]) -> int:
    po = ParseOptions(
        "Rescale affine layers followed by pnorm+normalize so their "
        "parameter stddev is 1.0 (or --stddev / matches "
        "--stddev-from) (nnet2bin/nnet-normalize-stddev.cc).\n"
        "Usage: nnet-normalize-stddev [options] <model-in> "
        "<model-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    stddev = po.register_value("stddev", 1.0, "Target stddev")
    stddev_from = po.register_value(
        "stddev-from", "", "Model whose per-layer stddevs to match")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2.surgery import normalize_stddev
    tm, am = _read_am(po.get_arg(1))
    ref = None
    if stddev_from[0]:
        _t, am_ref = _read_am(stddev_from[0])
        ref = am_ref.nnet
    normalize_stddev(am.nnet, stddev=stddev[0], stddev_from=ref)
    _write_am(po.get_arg(2), tm, am, binary[0])
    return 0


def _estimate_feature_transform(lda, dim, within_class_factor,
                                max_singular_value, remove_offset):
    """FeatureTransformEstimate::EstimateInternal
    (nnet2/get-feature-transform.cc): whiten the within-class
    covariance, diagonalize the between-class covariance, scale each
    direction by sqrt((within_class_factor + s) / (1 + s)), cap
    singular values, optionally append a mean-offset column."""
    count = lda.zero_acc.sum()
    D = lda.dim
    mean = lda.first_acc.sum(axis=0) / count
    total_covar = lda.total_second_acc / count - np.outer(mean, mean)
    mask = lda.zero_acc > 0
    cmeans = lda.first_acc[mask] / lda.zero_acc[mask][:, None]
    bc = ((lda.zero_acc[mask][:, None, None]
           * np.einsum("ci,cj->cij", cmeans - mean, cmeans - mean))
          .sum(axis=0)) / count
    wc = total_covar - bc
    target = dim if dim > 0 else D
    try:
        L = np.linalg.cholesky(wc)
    except np.linalg.LinAlgError:
        smooth = 1.0e-03 * np.trace(wc) / D
        log(f"Cholesky failed, adding {smooth:.3g} to diagonal")
        L = np.linalg.cholesky(wc + smooth * np.eye(D))
    Linv = np.linalg.inv(L)
    tmp = Linv @ bc @ Linv.T
    svd_u, svd_d, _ = np.linalg.svd((tmp + tmp.T) / 2.0)
    log(f"LDA singular values are {np.round(svd_d, 4).tolist()}")
    M = (svd_u.T @ Linv)[:target]
    if within_class_factor != 1.0:
        for i in range(min(target, len(svd_d))):
            scale = np.sqrt((within_class_factor + svd_d[i])
                            / (1.0 + svd_d[i]))
            M[i] *= scale
    if max_singular_value > 0:
        U, s, Vt = np.linalg.svd(M, full_matrices=False)
        n = int((s > max_singular_value).sum())
        if n > 0:
            log(f"Applied ceiling to {n} of {len(s)} singular values")
            M = U @ (np.minimum(s, max_singular_value)[:, None] * Vt)
    if remove_offset:
        M = np.hstack([M, (-(M @ mean))[:, None]])
    return M.astype(np.float32)


def nnet_get_feature_transform(argv: List[str]) -> int:
    po = ParseOptions(
        "Get a feature-projection transform from LDA stats "
        "(acc-lda accumulators; nnet2bin/nnet-get-feature-transform.cc"
        " / nnet2/get-feature-transform.h).\n"
        "Usage: nnet-get-feature-transform [options] <matrix-out> "
        "<lda-acc-1> <lda-acc-2> ...")
    binary = po.register_value("binary", True, "Write in binary mode")
    dim = po.register_value("dim", -1, "Dimension to project to")
    within_class_factor = po.register_value(
        "within-class-factor", 0.001, "Target within-class variance "
        "in the projected space")
    max_singular_value = po.register_value(
        "max-singular-value", 5.0, "Ceiling on the transform's "
        "singular values")
    remove_offset = po.register_value(
        "remove-offset", True, "Append a mean-removal offset column")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.transform.lda import LdaEstimate
    lda = None
    for i in range(2, po.num_args() + 1):
        with kaldi_io.input_stream(po.get_arg(i)) as f:
            b = iof.init_input_stream(f)
            acc = LdaEstimate.read(f, b)
        if lda is None:
            lda = acc
        else:
            lda.add(acc)
    M = _estimate_feature_transform(lda, dim[0],
                                    within_class_factor[0],
                                    max_singular_value[0],
                                    remove_offset[0])
    with kaldi_io.output_stream(po.get_arg(1)) as f:
        iof.init_output_stream(f, binary[0])
        iof.write_matrix(f, binary[0], M)
    log(f"nnet-get-feature-transform: wrote {M.shape[0]}x{M.shape[1]} "
        f"transform")
    return 0


def nnet_get_feature_transform_multi(argv: List[str]) -> int:
    po = ParseOptions(
        "Get a feature transform for MultiBasisComponent-style "
        "setups: one sub-transform per provided index set, stacked "
        "block-diagonally over the selected input dims "
        "(nnet2bin/nnet-get-feature-transform-multi.cc).\n"
        "Usage: nnet-get-feature-transform-multi [options] "
        "<lda-acc-rxfilename> <indexes-rxfilename> "
        "<matrix-wxfilename>\n"
        "The indexes file has one space-separated list of feature "
        "indices per line.")
    binary = po.register_value("binary", True, "Write in binary mode")
    within_class_factor = po.register_value(
        "within-class-factor", 0.001, "Target within-class variance")
    max_singular_value = po.register_value(
        "max-singular-value", 5.0, "Singular-value ceiling")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.transform.lda import LdaEstimate
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        b = iof.init_input_stream(f)
        lda = LdaEstimate.read(f, b)
    index_sets: List[List[int]] = []
    with kaldi_io.open_input(po.get_arg(2)) as f:
        for line in f.read().decode().splitlines():
            if line.strip():
                index_sets.append([int(x) for x in line.split()])
    D = lda.dim
    blocks = []
    for idxs in index_sets:
        sub = LdaEstimate(lda.zero_acc.shape[0], len(idxs))
        sub.zero_acc = lda.zero_acc.copy()
        sub.first_acc = lda.first_acc[:, idxs].copy()
        sub.total_second_acc = \
            lda.total_second_acc[np.ix_(idxs, idxs)].copy()
        M = _estimate_feature_transform(sub, -1,
                                        within_class_factor[0],
                                        max_singular_value[0], True)
        blocks.append((idxs, M))
    rows = sum(m.shape[0] for _, m in blocks)
    out = np.zeros((rows, D + 1), np.float32)
    r = 0
    for idxs, M in blocks:
        out[r:r + M.shape[0], idxs] = M[:, :-1]
        out[r:r + M.shape[0], D] = M[:, -1]
        r += M.shape[0]
    with kaldi_io.output_stream(po.get_arg(3)) as f:
        iof.init_output_stream(f, binary[0])
        iof.write_matrix(f, binary[0], out)
    log(f"nnet-get-feature-transform-multi: {rows}x{D + 1} transform "
        f"from {len(blocks)} index sets")
    return 0
