"""nnet1 (Karel) tool family (parity: src/nnetbin/*.cc).

The nnet1 stack here is the legacy-format compat surface
(kaldi_tpu/nnet1/nnet.py); the TPU training path is nnet3."""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.nnet1 import nnet as nnet1_module
from kaldi_tpu.nnet1.nnet import Nnet, Rbm, Softmax, nnet_from_proto
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)


def _read_nnet(rxfilename: str) -> Nnet:
    return kaldi_io.read_kaldi_object(Nnet.read, rxfilename)


def _write_nnet(net: Nnet, wxfilename: str, binary: bool) -> None:
    kaldi_io.write_kaldi_object(net.write, wxfilename, binary)


def _load_feature_transform(path: str):
    return _read_nnet(path) if path else None


def _log_priors(class_frame_counts: str, prior_floor: float) -> np.ndarray:
    """nnet-pdf-prior.cc:34-70: rel freqs, floored classes get +inf
    log-prior so their loglik is pushed to -inf."""
    with kaldi_io.input_stream(class_frame_counts) as f:
        binary = iof.init_input_stream(f)
        counts = iof.read_vector(f, binary)
    counts = np.asarray(counts, np.float64)
    rel = counts / counts.sum()
    lp = np.where(rel < prior_floor, 1e20, np.log(np.maximum(rel, 1e-20)))
    return lp.astype(np.float32)


def nnet_initialize(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize Neural Network parameters according to a prototype "
        "(nnet-initialize.cc).\n"
        "Usage: nnet-initialize [options] <nnet-prototype-in> <nnet-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    seed = po.register_value("seed", 777, "Random seed")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    np.random.seed(seed[0] & 0x7FFFFFFF)
    nnet1_module.seed_init_rng(seed[0])
    with kaldi_io.input_stream(po.get_arg(1)) as f:
        text = f.read().decode("utf-8")
    net = nnet_from_proto(text)
    _write_nnet(net, po.get_arg(2), binary[0])
    log(f"Written initialized model to {po.get_arg(2)}")
    return 0


def nnet_copy(argv: List[str]) -> int:
    po = ParseOptions(
        "Copy Neural Network model, optionally remove components "
        "(nnet-copy.cc).\nUsage: nnet-copy [options] <model-in> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    rm_first = po.register_value("remove-first-components", 0,
                                 "Remove N first components")
    rm_last = po.register_value("remove-last-components", 0,
                                "Remove N last components")
    from_ = po.register_value("from-component", 1,
                              "Keep from this component (1-based)")
    to = po.register_value("to-component", -1,
                           "Keep up to this component (1-based, -1=all)")
    dropout = po.register_value("dropout-rate", -1.0,
                                "Set dropout rate on Dropout components")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    net = _read_nnet(po.get_arg(1))
    comps = net.components
    if to[0] > 0 or from_[0] > 1:
        hi = to[0] if to[0] > 0 else len(comps)
        comps = comps[from_[0] - 1:hi]
    if rm_first[0] > 0:
        comps = comps[rm_first[0]:]
    if rm_last[0] > 0:
        comps = comps[:-rm_last[0]]
    if dropout[0] >= 0.0:
        for c in comps:
            if hasattr(c, "dropout_rate"):
                c.dropout_rate = dropout[0]
    net.components = comps
    _write_nnet(net, po.get_arg(2), binary[0])
    log(f"Written model to {po.get_arg(2)}")
    return 0


def nnet_info(argv: List[str]) -> int:
    po = ParseOptions("Print human-readable information about the network "
                      "(nnet-info.cc).\nUsage: nnet-info [options] <nnet-in>")
    po.read(argv)
    if po.num_args() != 1:
        po.print_usage()
        return 1
    print(_read_nnet(po.get_arg(1)).info())
    return 0


def nnet_concat(argv: List[str]) -> int:
    po = ParseOptions(
        "Concatenate Neural Networks (nnet-concat.cc).\n"
        "Usage: nnet-concat [options] <nnet-in1> ... <nnet-inN> <nnet-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    net = _read_nnet(po.get_arg(1))
    for i in range(2, po.num_args()):
        net.components.extend(_read_nnet(po.get_arg(i)).components)
    _write_nnet(net, po.get_arg(po.num_args()), binary[0])
    log(f"Written model to {po.get_arg(po.num_args())}")
    return 0


def nnet_forward(argv: List[str]) -> int:
    po = ParseOptions(
        "Perform forward pass through Neural Network (nnet-forward.cc).\n"
        "Usage: nnet-forward [options] <nnet1-in> <feature-rspecifier> "
        "<feature-wspecifier>")
    feature_transform = po.register_value("feature-transform", "",
                                          "Feature transform front-end")
    no_softmax = po.register_value(
        "no-softmax", False,
        "Remove <Softmax> from the nnet (run likes on log-posteriors)")
    apply_log = po.register_value("apply-log", False,
                                  "Transform NN output by log()")
    class_frame_counts = po.register_value("class-frame-counts", "",
                                           "Counts to compute log-priors")
    prior_scale = po.register_value("prior-scale", 1.0,
                                    "Scaling factor of log-priors")
    prior_floor = po.register_value(
        "prior-floor", 1e-10, "Flooring constant for prior probability")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    net = _read_nnet(po.get_arg(1))
    if no_softmax[0] and net.components and \
            isinstance(net.components[-1], Softmax):
        net.components = net.components[:-1]
    ft = _load_feature_transform(feature_transform[0])
    log_priors = (_log_priors(class_frame_counts[0], prior_floor[0])
                  if class_frame_counts[0] else None)
    writer = TableWriter("matrix", po.get_arg(3))
    n = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        x = np.asarray(feats, np.float32)
        if ft is not None:
            x = ft.propagate(x)
        y = net.propagate(x)
        if apply_log[0]:
            y = np.log(np.maximum(y, 1e-20))
        if log_priors is not None:
            y = y - prior_scale[0] * log_priors
        writer.write(key, y.astype(np.float32))
        n += 1
    writer.close()
    log(f"Done {n} files")
    return 0 if n else 1


def transf_to_nnet(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert transformation matrix to <LinearTransform> "
        "(transf-to-nnet.cc).\n"
        "Usage: transf-to-nnet [options] <transf-in> <nnet-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet1.nnet import LinearTransform
    mat = kaldi_io.read_kaldi_object(iof.read_matrix, po.get_arg(1))
    lin = LinearTransform(mat.shape[1], mat.shape[0])
    lin.linearity = np.asarray(mat, np.float32)
    _write_nnet(Nnet([lin]), po.get_arg(2), binary[0])
    log(f"Written model to {po.get_arg(2)}")
    return 0


def cmvn_to_nnet(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert cmvn-stats into <AddShift> and <Rescale> components "
        "(cmvn-to-nnet.cc).\n"
        "Usage: cmvn-to-nnet [options] <transf-in> <nnet-out>")
    binary = po.register_value("binary", False, "Write output in binary mode")
    std_dev = po.register_value("std-dev", 1.0,
                                "Standard deviation of the output")
    var_floor = po.register_value("var-floor", 1e-10, "Floor the variance")
    learn_rate_coef = po.register_value(
        "learn-rate-coef", 0.0, "Initialize learning-rate coefficient")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet1.nnet import AddShift, Rescale
    stats = kaldi_io.read_kaldi_object(iof.read_matrix, po.get_arg(1))
    stats = np.asarray(stats, np.float64)
    if stats.shape[0] != 2:
        print("cmvn-to-nnet: expected 2-row cmvn stats", file=sys.stderr)
        return 1
    dim = stats.shape[1] - 1
    count = stats[0, dim]
    mean = stats[0, :dim] / count
    var = stats[1, :dim] / count - mean * mean
    var = np.maximum(var, var_floor[0])
    shift = AddShift(dim, dim)
    shift.shift = (-mean).astype(np.float32)
    shift.learn_rate_coef = learn_rate_coef[0]
    scale = Rescale(dim, dim)
    scale.scale = (std_dev[0] / np.sqrt(var)).astype(np.float32)
    scale.learn_rate_coef = learn_rate_coef[0]
    _write_nnet(Nnet([shift, scale]), po.get_arg(2), binary[0])
    log(f"Written cmvn in 'nnet1' model to: {po.get_arg(2)}")
    return 0


def nnet_set_learnrate(argv: List[str]) -> int:
    po = ParseOptions(
        "Sets learning-rate coefficients in the model "
        "(nnet-set-learnrate.cc).\n"
        "Usage: nnet-set-learnrate [options] <nnet-in> <nnet-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    components = po.register_value(
        "components", "", "Comma-separated 1-based component indices")
    coef = po.register_value("coef", 1.0,
                             "Learn-rate coefficient to set")
    bias_coef = po.register_value("bias-coef", -1.0,
                                  "Bias learn-rate coefficient (-1: same)")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    net = _read_nnet(po.get_arg(1))
    sel = (set(int(s) for s in components[0].split(",") if s)
           if components[0] else set(range(1, len(net.components) + 1)))
    bc = bias_coef[0] if bias_coef[0] >= 0 else coef[0]
    for i, c in enumerate(net.components, 1):
        if i not in sel:
            continue
        if hasattr(c, "learn_rate_coef"):
            c.learn_rate_coef = coef[0]
        if hasattr(c, "bias_learn_rate_coef"):
            c.bias_learn_rate_coef = bc
    _write_nnet(net, po.get_arg(2), binary[0])
    log(f"Written model to {po.get_arg(2)}")
    return 0


def _targets_to_matrix(post, num_rows: int, dim: int) -> np.ndarray:
    tgt = np.zeros((num_rows, dim), np.float32)
    for t, frame in enumerate(post[:num_rows]):
        for idx, w in frame:
            tgt[t, int(idx)] += w
    return tgt


def _run_frm_train(argv: List[str], tool: str, per_utt: bool,
                   multistream: bool = False) -> int:
    po = ParseOptions(
        f"Perform one iteration of nnet1 training by SGD ({tool}.cc).\n"
        f"Usage: {tool} [options] <feature-rspecifier> "
        "<targets-rspecifier> <model-in> [<model-out>]")
    binary = po.register_value("binary", True, "Write output in binary mode")
    learn_rate = po.register_value("learn-rate", 0.008, "Learning rate")
    momentum = po.register_value("momentum", 0.0, "Momentum")
    l2_penalty = po.register_value("l2-penalty", 0.0, "L2 penalty")
    minibatch_size = po.register_value("minibatch-size", 256,
                                       "Size of a minibatch")
    cross_validate = po.register_value(
        "cross-validate", False, "Perform cross-validation (no backprop)")
    feature_transform = po.register_value("feature-transform", "",
                                          "Feature transform front-end")
    objective_function = po.register_value(
        "objective-function", "xent", "Objective function: xent|mse")
    randomize = po.register_value("randomize", True,
                                  "Shuffle the frames (frmshuff only)")
    num_streams = po.register_value("num-streams", 4,
                                    "Number of parallel streams "
                                    "(multistream only)")
    po.read(argv)
    want = 3 if cross_validate[0] else 4
    if po.num_args() != want:
        po.print_usage()
        return 1
    net = _read_nnet(po.get_arg(3))
    ft = _load_feature_transform(feature_transform[0])
    tgt_reader = RandomAccessTableReader("posterior", po.get_arg(2))
    xent = objective_function[0] == "xent"
    dim = net.output_dim
    tot_frames = 0
    tot_obj = 0.0
    tot_correct = 0
    xs, ts = [], []

    def consume(x, tgt):
        nonlocal tot_frames, tot_obj, tot_correct
        y, acts = net.propagate(x, keep=True)
        if xent:
            obj = float((tgt * np.log(np.maximum(y, 1e-20))).sum())
            tot_correct += int(
                (y.argmax(axis=1) == tgt.argmax(axis=1)).sum())
            dy = y - tgt        # softmax+xent combined derivative
        else:
            diff = y - tgt
            obj = -0.5 * float((diff * diff).sum())
            dy = diff
        tot_obj += obj
        tot_frames += x.shape[0]
        if not cross_validate[0]:
            # reference nnet1 SGD applies the learning rate per minibatch
            # without frame-count scaling (nnet-affine-transform.h Update)
            net.backprop_update(acts, dy, learn_rate[0],
                                momentum=momentum[0], l2=l2_penalty[0])

    n = err = 0
    for key, feats in SequentialTableReader("matrix", po.get_arg(1)):
        if key not in tgt_reader:
            warn(f"missing targets for {key}")
            err += 1
            continue
        x = np.asarray(feats, np.float32)
        if ft is not None:
            x = ft.propagate(x)
        post = tgt_reader[key]
        # reference nnet-train-* checks feature/target length mismatch
        # (length_tolerance); trim to the common length, skip on gross
        # mismatch so untargeted frames never train as all-zero rows
        T = min(len(post), x.shape[0])
        if abs(len(post) - x.shape[0]) > 5:
            warn(f"{key}: feature/target length mismatch "
                 f"{x.shape[0]} vs {len(post)}, skipping")
            err += 1
            continue
        x = x[:T]
        tgt = _targets_to_matrix(post, T, dim)
        n += 1
        if per_utt or multistream:
            consume(x, tgt)
        else:
            xs.append(x)
            ts.append(tgt)
    if xs:
        X = np.concatenate(xs)
        T = np.concatenate(ts)
        idx = np.arange(X.shape[0])
        if randomize[0]:
            np.random.default_rng(777).shuffle(idx)
        mb = minibatch_size[0]
        for o in range(0, len(idx), mb):
            sel = idx[o:o + mb]
            consume(X[sel], T[sel])
    if not cross_validate[0]:
        _write_nnet(net, po.get_arg(4), binary[0])
    frm = max(tot_frames, 1)
    mode = "CROSSVAL" if cross_validate[0] else "TRAINING"
    log(f"Done {n} files ({err} with errors); [{mode}] "
        f"obj/frame {tot_obj / frm:.4f}"
        + (f", frame-acc {100.0 * tot_correct / frm:.2f}%" if xent else ""))
    return 0 if n else 1


def nnet_train_frmshuff(argv: List[str]) -> int:
    return _run_frm_train(argv, "nnet-train-frmshuff", per_utt=False)


def nnet_train_perutt(argv: List[str]) -> int:
    return _run_frm_train(argv, "nnet-train-perutt", per_utt=True)


def nnet_train_multistream(argv: List[str]) -> int:
    return _run_frm_train(argv, "nnet-train-multistream", per_utt=False,
                          multistream=True)


def nnet_train_multistream_perutt(argv: List[str]) -> int:
    return _run_frm_train(argv, "nnet-train-multistream-perutt",
                          per_utt=True, multistream=True)


def _run_seq_train(argv: List[str], tool: str, criterion: str) -> int:
    po = ParseOptions(
        f"Sequence-discriminative {criterion.upper()} training of nnet1 "
        f"by SGD ({tool}.cc).\nUsage: {tool} [options] <model-in> "
        "<transition-model-in> <feature-rspecifier> <den-lat-rspecifier> "
        "<ali-rspecifier> <model-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    learn_rate = po.register_value("learn-rate", 1e-5, "Learning rate")
    acoustic_scale = po.register_value(
        "acoustic-scale", 0.1, "Scaling factor for acoustic likelihoods")
    feature_transform = po.register_value("feature-transform", "",
                                          "Feature transform front-end")
    class_frame_counts = po.register_value("class-frame-counts", "",
                                           "Counts to compute log-priors")
    prior_floor = po.register_value("prior-floor", 1e-10, "Prior floor")
    silence_phones_str = po.register_value(
        "silence-phones", "", "Colon-separated silence phones (MPE/sMBR)")
    one_silence_class = po.register_value("one-silence-class", False,
                                          "Single silence class")
    po.read(argv)
    if po.num_args() != 6:
        po.print_usage()
        return 1
    from kaldi_tpu.hmm import TransitionModel
    from kaldi_tpu.nnet3.discriminative import (
        DiscriminativeOptions, compute_discriminative_objf_and_grad)
    net = _read_nnet(po.get_arg(1))
    tm = kaldi_io.read_kaldi_object(TransitionModel.read, po.get_arg(2))
    ft = _load_feature_transform(feature_transform[0])
    log_priors = (_log_priors(class_frame_counts[0], prior_floor[0])
                  if class_frame_counts[0] else None)
    sil = [int(p) for p in silence_phones_str[0].split(":") if p]
    d_opts = DiscriminativeOptions(
        criterion=criterion, acoustic_scale=acoustic_scale[0],
        silence_phones=sil, one_silence_class=one_silence_class[0])
    lat_reader = RandomAccessTableReader("lattice", po.get_arg(4))
    ali_reader = RandomAccessTableReader("int-vector", po.get_arg(5))
    num_pdfs = net.output_dim
    n = err = 0
    tot_obj = tot_frames = 0.0
    from kaldi_tpu.nnet3.discriminative_train import \
        rescore_lattice_acoustics
    for key, feats in SequentialTableReader("matrix", po.get_arg(3)):
        if key not in lat_reader or key not in ali_reader:
            warn(f"missing lattice/alignment for {key}")
            err += 1
            continue
        x = np.asarray(feats, np.float32)
        if ft is not None:
            x = ft.propagate(x)
        y, acts = net.propagate(x, keep=True)
        ll = np.log(np.maximum(y, 1e-20))
        if log_priors is not None:
            ll = ll - log_priors
        ali = list(ali_reader[key])
        T = min(len(ali), ll.shape[0])
        lat = rescore_lattice_acoustics(lat_reader[key], tm, ll)
        objf, grad = compute_discriminative_objf_and_grad(
            d_opts, tm, ali[:T], lat, num_pdfs)
        # chain through log-softmax: d obj / d activation (pre-softmax)
        g = np.zeros_like(y)
        g[:grad.shape[0]] = grad[:y.shape[0]]
        dy = -(g - y * g.sum(axis=1, keepdims=True))
        net.backprop_update(acts, dy * acoustic_scale[0],
                            learn_rate[0])
        tot_obj += objf * T
        tot_frames += T
        n += 1
    _write_nnet(net, po.get_arg(6), binary[0])
    log(f"Done {n} files ({err} with errors); {criterion} objf/frame "
        f"{tot_obj / max(tot_frames, 1):.4f}")
    return 0 if n else 1


def nnet_train_mmi_sequential(argv: List[str]) -> int:
    return _run_seq_train(argv, "nnet-train-mmi-sequential", "mmi")


def nnet_train_mpe_sequential(argv: List[str]) -> int:
    return _run_seq_train(argv, "nnet-train-mpe-sequential", "mpfe")


def rbm_convert_to_nnet(argv: List[str]) -> int:
    po = ParseOptions(
        "Convert RBM to <AffineTransform> + <Sigmoid> "
        "(rbm-convert-to-nnet.cc).\n"
        "Usage: rbm-convert-to-nnet [options] <rbm-in> <nnet-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet1.nnet import Sigmoid
    rbm_net = _read_nnet(po.get_arg(1))
    out = Nnet()
    for c in rbm_net.components:
        if isinstance(c, Rbm):
            out.components.append(c.to_feedforward())
            if c.hid_type == "bern":
                out.components.append(Sigmoid(c.out_dim, c.out_dim))
        else:
            out.components.append(c)
    _write_nnet(out, po.get_arg(2), binary[0])
    log(f"Written model to {po.get_arg(2)}")
    return 0


def rbm_train_cd1_frmshuff(argv: List[str]) -> int:
    po = ParseOptions(
        "Train RBM by Contrastive Divergence (CD-1) "
        "(rbm-train-cd1-frmshuff.cc).\n"
        "Usage: rbm-train-cd1-frmshuff [options] <rbm-in> "
        "<feature-rspecifier> <rbm-out>")
    binary = po.register_value("binary", True, "Write output in binary mode")
    learn_rate = po.register_value("learn-rate", 0.008, "Learning rate")
    momentum = po.register_value("momentum", 0.5, "Momentum")
    l2_penalty = po.register_value("l2-penalty", 0.0002, "L2 penalty")
    minibatch_size = po.register_value("minibatch-size", 256,
                                       "Size of a minibatch")
    feature_transform = po.register_value("feature-transform", "",
                                          "Feature transform front-end")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    net = _read_nnet(po.get_arg(1))
    rbm = next((c for c in net.components if isinstance(c, Rbm)), None)
    if rbm is None:
        print("rbm-train-cd1-frmshuff: model contains no <Rbm>",
              file=sys.stderr)
        return 1
    ft = _load_feature_transform(feature_transform[0])
    xs = []
    for key, feats in SequentialTableReader("matrix", po.get_arg(2)):
        x = np.asarray(feats, np.float32)
        if ft is not None:
            x = ft.propagate(x)
        xs.append(x)
    if not xs:
        return 1
    X = np.concatenate(xs)
    rng = np.random.default_rng(777)
    idx = rng.permutation(X.shape[0])
    mom_w = np.zeros_like(rbm.vis_hid)
    mom_vb = np.zeros_like(rbm.vis_bias)
    mom_hb = np.zeros_like(rbm.hid_bias)
    mse = 0.0
    mb = minibatch_size[0]
    for o in range(0, len(idx), mb):
        v0 = X[idx[o:o + mb]]
        h0 = rbm.propagate(v0)
        if rbm.hid_type == "bern":
            h0s = (rng.random(h0.shape) < h0).astype(np.float32)
        else:
            h0s = h0
        v1 = rbm.reconstruct(h0s)
        h1 = rbm.propagate(v1)
        n = v0.shape[0]
        gw = (h0.T @ v0 - h1.T @ v1) / n
        gvb = (v0 - v1).mean(axis=0)
        ghb = (h0 - h1).mean(axis=0)
        mom_w = momentum[0] * mom_w + gw
        mom_vb = momentum[0] * mom_vb + gvb
        mom_hb = momentum[0] * mom_hb + ghb
        rbm.vis_hid += learn_rate[0] * (mom_w - l2_penalty[0] * rbm.vis_hid)
        rbm.vis_bias += learn_rate[0] * mom_vb
        rbm.hid_bias += learn_rate[0] * mom_hb
        mse += float(((v0 - v1) ** 2).sum())
    _write_nnet(net, po.get_arg(3), binary[0])
    log(f"Done CD-1 on {X.shape[0]} frames, "
        f"mse/frame {mse / X.shape[0]:.4f}")
    return 0
