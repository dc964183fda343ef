"""nnet2bin training CLIs: nnet-init, nnet-am-init, nnet-train-simple,
nnet-train-parallel, nnet-train-ensemble, nnet-train-transitions,
nnet-combine, nnet-combine-fast, nnet-am-average,
nnet-modify-learning-rates, nnet-adjust-priors, nnet-show-progress
(src/nnet2bin/*.cc)."""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.base import io_funcs as iof
from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.util import kaldi_io
from kaldi_tpu.util.parse_options import ParseOptions
from kaldi_tpu.util.table import SequentialTableReader


def _read_am(path):
    from kaldi_tpu.nnet2 import read_nnet2_am
    return read_nnet2_am(path)


def _write_am(path, tm, am, binary):
    from kaldi_tpu.nnet2 import write_nnet2_am
    write_nnet2_am(path, tm, am, binary)


def _eg_iter(rspec):
    from kaldi_tpu.nnet2.egs import NnetExample
    return (eg for _, eg in SequentialTableReader(NnetExample, rspec))


def nnet_init(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize an nnet2 neural network from a config file with "
        "one line per component (nnet2bin/nnet-init.cc).\n"
        "Usage: nnet-init [options] <config-in> <raw-nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    srand = po.register_value("srand", 0, "Random seed")
    po.read(argv)
    if po.num_args() != 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2 import write_raw_nnet2
    from kaldi_tpu.nnet2.surgery import init_from_config
    with kaldi_io.open_input(po.get_arg(1)) as f:
        text = f.read().decode("utf-8")
    nnet = init_from_config(text, srand[0])
    write_raw_nnet2(nnet, po.get_arg(2), binary[0])
    log(f"nnet-init: initialized {len(nnet.components)} components")
    return 0


def nnet_am_init(argv: List[str]) -> int:
    po = ParseOptions(
        "Initialize an nnet2 acoustic model from a tree, a topology, "
        "and a raw net — or from a transition model and a raw net "
        "(nnet2bin/nnet-am-init.cc).\n"
        "Usage: nnet-am-init [options] <tree-in> <topo-in> "
        "<raw-nnet-in> <nnet-am-out>\n"
        "  or:  nnet-am-init [options] <transition-model-in> "
        "<raw-nnet-in> <nnet-am-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    po.read(argv)
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.nnet2 import AmNnet2, read_raw_nnet2
    if po.num_args() == 4:
        from kaldi_tpu.hmm.topology import HmmTopology
        from kaldi_tpu.tree.context_dep import ContextDependency
        tree = kaldi_io.read_kaldi_object(ContextDependency.read,
                                          po.get_arg(1))
        with kaldi_io.input_stream(po.get_arg(2)) as f:
            b = iof.init_input_stream(f)
            topo = HmmTopology.read(f, b)
        tm = TransitionModel(topo, tree)
        raw = read_raw_nnet2(po.get_arg(3))
        out = po.get_arg(4)
    elif po.num_args() == 3:
        tm = kaldi_io.read_kaldi_object(TransitionModel.read,
                                        po.get_arg(1))
        raw = read_raw_nnet2(po.get_arg(2))
        out = po.get_arg(3)
    else:
        po.print_usage()
        return 1
    if raw.output_dim() != tm.num_pdfs:
        warn(f"raw net output dim {raw.output_dim()} != num-pdfs "
             f"{tm.num_pdfs}")
        return 1
    am = AmNnet2(raw, np.zeros(tm.num_pdfs, np.float32))
    _write_am(out, tm, am, binary[0])
    log(f"nnet-am-init: {tm.num_pdfs} pdfs")
    return 0


def nnet_train_simple(argv: List[str]) -> int:
    po = ParseOptions(
        "Train nnet2 parameters with backprop and SGD over "
        "minibatches (nnet2bin/nnet-train-simple.cc).\n"
        "Usage: nnet-train-simple [options] <model-in> "
        "<training-examples-in> <model-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    zero_stats = po.register_value(
        "zero-stats", True, "If true, zero stored component stats "
        "before training")
    srand = po.register_value("srand", 0, "Random seed")
    minibatch_size = po.register_value(
        "minibatch-size", 500, "Samples per minibatch")
    minibatches_per_phase = po.register_value(
        "minibatches-per-phase", 50, "Minibatches between objective "
        "logs")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    np.random.seed(srand[0])
    from kaldi_tpu.nnet2.train import train_simple
    tm, am = _read_am(po.get_arg(1))
    if zero_stats[0]:
        for c in am.nnet.components:
            for k in ("ValueSum", "DerivSum"):
                if k in c.fields:
                    c.fields[k] = np.zeros_like(
                        np.asarray(c.fields[k], np.float64))
            if "Count" in c.fields:
                c.fields["Count"] = 0.0
    stats = train_simple(am.nnet, _eg_iter(po.get_arg(2)),
                         minibatch_size=minibatch_size[0],
                         minibatches_per_phase=minibatches_per_phase[0])
    _write_am(po.get_arg(3), tm, am, binary[0])
    return 0 if stats.tot_weight > 0 else 1


def nnet_train_parallel(argv: List[str]) -> int:
    po = ParseOptions(
        "Train nnet2 parameters with Hogwild-style multithreaded SGD "
        "(nnet2bin/nnet-train-parallel.cc; threads share the "
        "parameters without locks, BLAS releases the GIL).\n"
        "Usage: nnet-train-parallel [options] <model-in> "
        "<training-examples-in> <model-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    zero_stats = po.register_value("zero-stats", True,
                                   "Zero stats before training")
    srand = po.register_value("srand", 0, "Random seed")
    num_threads = po.register_value("num-threads", 4,
                                    "Number of training threads")
    minibatch_size = po.register_value("minibatch-size", 500,
                                       "Samples per minibatch")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    np.random.seed(srand[0])
    from concurrent.futures import ThreadPoolExecutor

    from kaldi_tpu.nnet2.train import (TrainStats, _eg_shape,
                                       train_one_minibatch)
    tm, am = _read_am(po.get_arg(1))
    if zero_stats[0]:
        for c in am.nnet.components:
            for k in ("ValueSum", "DerivSum"):
                if k in c.fields:
                    c.fields[k] = np.zeros_like(
                        np.asarray(c.fields[k], np.float64))
    stats = TrainStats()
    pool = ThreadPoolExecutor(max_workers=num_threads[0])
    pending = []
    buffers = {}
    for eg in _eg_iter(po.get_arg(2)):
        key = _eg_shape(eg)
        buf = buffers.setdefault(key, [])
        buf.append(eg)
        if len(buf) >= minibatch_size[0]:
            pending.append(pool.submit(train_one_minibatch, am.nnet,
                                       buf, stats))
            buffers[key] = []
    for buf in buffers.values():
        if buf:
            pending.append(pool.submit(train_one_minibatch, am.nnet,
                                       buf, stats))
    for f in pending:
        f.result()
    pool.shutdown()
    log(f"nnet-train-parallel: {stats.tot_weight:.0f} frames in "
        f"{stats.minibatches} minibatches over {num_threads[0]} "
        f"threads; average objf {stats.avg:.4f}")
    _write_am(po.get_arg(3), tm, am, binary[0])
    return 0 if stats.tot_weight > 0 else 1


def nnet_train_ensemble(argv: List[str]) -> int:
    po = ParseOptions(
        "Train an ensemble of nnet2 nets with a term encouraging "
        "similar outputs: the target is labels + beta * average "
        "ensemble posterior (nnet2/train-nnet-ensemble.cc).\n"
        "Usage: nnet-train-ensemble [options] <model-in-1> ... "
        "<model-in-n> <egs-in> <model-out-1> ... <model-out-n>")
    binary = po.register_value("binary", True, "Write in binary mode")
    srand = po.register_value("srand", 0, "Random seed")
    beta = po.register_value(
        "beta", 0.5, "Weight of the ensemble-agreement term")
    minibatch_size = po.register_value("minibatch-size", 500,
                                       "Samples per minibatch")
    po.read(argv)
    n_args = po.num_args()
    if n_args < 3 or n_args % 2 == 0:
        po.print_usage()
        return 1
    n_nets = (n_args - 1) // 2
    np.random.seed(srand[0])
    from kaldi_tpu.nnet2.train import (apply_update, backprop,
                                       format_minibatch, forward_store,
                                       objf_and_deriv, _eg_shape)
    models = [_read_am(po.get_arg(i + 1)) for i in range(n_nets)]
    tot_objf = tot_w = 0.0

    def train_mb(buf):
        nonlocal tot_objf, tot_w
        x3, labels = format_minibatch(buf)
        acts_all = [forward_store(am.nnet, x3) for _, am in models]
        post_avg = np.mean([a[-1] for a in acts_all], axis=0) * beta[0]
        for t_acts, (_, am) in zip(acts_all, models):
            y3 = t_acts[-1]
            objf, w, dy = objf_and_deriv(y3, labels)
            # ensemble-agreement part: target += beta*avg posterior,
            # deriv of sum target*log(y) wrt y adds beta*avg/y
            dy = dy + post_avg / np.maximum(y3, 1e-20)
            _, grads = backprop(am.nnet, t_acts, dy, store_stats=True)
            for comp, g in zip(am.nnet.components, grads):
                if g is not None:
                    apply_update(comp, g)
            tot_objf += objf
            tot_w += w

    buffers = {}
    for eg in _eg_iter(po.get_arg(n_nets + 1)):
        key = _eg_shape(eg)
        buf = buffers.setdefault(key, [])
        buf.append(eg)
        if len(buf) >= minibatch_size[0]:
            train_mb(buf)
            buffers[key] = []
    for buf in buffers.values():
        if buf:
            train_mb(buf)
    log(f"nnet-train-ensemble: {n_nets} nets, avg objf "
        f"{tot_objf / max(tot_w / n_nets, 1e-20) / n_nets:.4f} over "
        f"{tot_w / n_nets:.0f} frames")
    for i, (tm, am) in enumerate(models):
        _write_am(po.get_arg(n_nets + 2 + i), tm, am, binary[0])
    return 0 if tot_w > 0 else 1


def nnet_train_transitions(argv: List[str]) -> int:
    po = ParseOptions(
        "Train the transition probabilities of an nnet2 acoustic "
        "model from alignments, and set the pdf priors "
        "(nnet2bin/nnet-train-transitions.cc).\n"
        "Usage: nnet-train-transitions [options] <nnet-in> "
        "<ali-rspecifier> <nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    set_priors = po.register_value(
        "set-priors", True, "Also set the per-pdf priors from the "
        "alignment counts")
    prior_floor = po.register_value(
        "prior-floor", 5.0e-06, "Floor on pdf priors")
    transition_floor = po.register_value(
        "transition-floor", 0.01, "Floor on transition probabilities")
    transition_min_count = po.register_value(
        "transition-min-count", 5.0, "Minimum count required to "
        "update transitions from a state")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    tm, am = _read_am(po.get_arg(1))
    counts = np.zeros(tm.num_transition_ids + 1, np.float64)
    n = 0
    for _key, ali in SequentialTableReader("int-vector", po.get_arg(2)):
        for t in ali:
            counts[t] += 1.0
        n += 1
    log(f"Accumulated transition counts from {n} alignments")
    tm.mle_update(counts, floor=transition_floor[0],
                  min_count=transition_min_count[0])
    if set_priors[0]:
        pdf_counts = np.zeros(tm.num_pdfs, np.float64)
        for t in range(1, tm.num_transition_ids + 1):
            pdf_counts[tm.transition_id_to_pdf(t)] += counts[t]
        priors = pdf_counts / max(pdf_counts.sum(), 1e-20)
        priors = np.maximum(priors, prior_floor[0])
        am.priors = (priors / priors.sum()).astype(np.float32)
        log(f"Set priors over {tm.num_pdfs} pdfs")
    _write_am(po.get_arg(3), tm, am, binary[0])
    return 0 if n else 1


def _combine_common(argv: List[str], name: str) -> int:
    po = ParseOptions(
        f"Compute an optimal per-layer combination of nnet2 models "
        f"over a validation set (nnet2bin/{name}.cc; combination "
        f"weights per updatable component, optimized by gradient "
        f"ascent with backtracking from the best single model).\n"
        f"Usage: {name} [options] <model-in1> ... <model-inN> "
        f"<valid-examples-in> <model-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    num_iters = po.register_value(
        "num-bfgs-iters", 30, "Maximum optimization iterations")
    initial_model = po.register_value(
        "initial-model", -1, "Index of model to initialize from "
        "(default: best on validation)")
    po.read(argv)
    if po.num_args() < 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2.train import combine_nnets
    n_models = po.num_args() - 2
    models = [_read_am(po.get_arg(i + 1)) for i in range(n_models)]
    valid = list(_eg_iter(po.get_arg(n_models + 1)))
    combined, objf = combine_nnets([am.nnet for _, am in models],
                                   valid, num_iters=num_iters[0],
                                   initial_model=initial_model[0])
    tm, am0 = models[0]
    am0.nnet = combined
    _write_am(po.get_arg(n_models + 2), tm, am0, binary[0])
    log(f"{name}: final objf {objf:.4f} over {len(valid)} validation "
        f"examples")
    return 0


def nnet_combine(argv: List[str]) -> int:
    return _combine_common(argv, "nnet-combine")


def nnet_combine_fast(argv: List[str]) -> int:
    return _combine_common(argv, "nnet-combine-fast")


def nnet_am_average(argv: List[str]) -> int:
    po = ParseOptions(
        "Average (or sum) the parameters over nnet2 models "
        "(nnet2bin/nnet-am-average.cc).\n"
        "Usage: nnet-am-average [options] <model1> ... <modelN> "
        "<model-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    sum_opt = po.register_value("sum", False, "Sum instead of average")
    skip_last_layer = po.register_value(
        "skip-last-layer", False, "Copy the last updatable layer from "
        "<model1> instead of averaging")
    weights_s = po.register_value(
        "weights", "", "Colon-separated model weights")
    po.read(argv)
    if po.num_args() < 2:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2.surgery import average_nnets
    n_models = po.num_args() - 1
    models = [_read_am(po.get_arg(i + 1)) for i in range(n_models)]
    weights = [float(x) for x in weights_s[0].split(":") if x] or None
    avg = average_nnets([am.nnet for _, am in models], weights=weights,
                        sum_mode=sum_opt[0],
                        skip_last_layer=skip_last_layer[0])
    tm, am0 = models[0]
    am0.nnet = avg
    _write_am(po.get_arg(n_models + 1), tm, am0, binary[0])
    log(f"nnet-am-average: averaged {n_models} models")
    return 0


def nnet_modify_learning_rates(argv: List[str]) -> int:
    po = ParseOptions(
        "Modify learning rates to equalize relative per-layer "
        "parameter changes, keeping the geometric mean "
        "(nnet2bin/nnet-modify-learning-rates.cc).\n"
        "Usage: nnet-modify-learning-rates [options] <prev-model> "
        "<cur-model> <modified-cur-model>")
    binary = po.register_value("binary", True, "Write in binary mode")
    avg_lr = po.register_value(
        "average-learning-rate", 0.0, "If >0, target geometric mean "
        "of the learning rates")
    first_layer_factor = po.register_value(
        "first-layer-factor", 1.0, "Extra factor on the first layer's "
        "learning rate")
    last_layer_factor = po.register_value(
        "last-layer-factor", 1.0, "Extra factor on the last layer's "
        "learning rate")
    retroactive = po.register_value(
        "retroactive", False, "Scale the parameter differences "
        "retroactively")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    from kaldi_tpu.nnet2.surgery import modify_learning_rates
    _tm_p, am_prev = _read_am(po.get_arg(1))
    tm, am_cur = _read_am(po.get_arg(2))
    modify_learning_rates(am_prev.nnet, am_cur.nnet,
                          average_learning_rate=avg_lr[0],
                          first_layer_factor=first_layer_factor[0],
                          last_layer_factor=last_layer_factor[0],
                          retroactive=retroactive[0])
    _write_am(po.get_arg(3), tm, am_cur, binary[0])
    return 0


def nnet_adjust_priors(argv: List[str]) -> int:
    po = ParseOptions(
        "Set the priors of an nnet2 model to computed average "
        "posteriors (nnet2bin/nnet-adjust-priors.cc).\n"
        "Usage: nnet-adjust-priors [options] <nnet-in> "
        "<summed-posterior-vector-in> <nnet-out>")
    binary = po.register_value("binary", True, "Write in binary mode")
    prior_floor = po.register_value("prior-floor", 1.0e-15,
                                    "Floor on priors")
    po.read(argv)
    if po.num_args() != 3:
        po.print_usage()
        return 1
    tm, am = _read_am(po.get_arg(1))
    with kaldi_io.input_stream(po.get_arg(2)) as f:
        b = iof.init_input_stream(f)
        post = np.asarray(iof.read_vector(f, b), np.float64)
    if post.size != tm.num_pdfs:
        warn(f"posterior dim {post.size} != num-pdfs {tm.num_pdfs}")
        return 1
    priors = np.maximum(post / max(post.sum(), 1e-20), prior_floor[0])
    am.priors = (priors / priors.sum()).astype(np.float32)
    _write_am(po.get_arg(3), tm, am, binary[0])
    log(f"nnet-adjust-priors: set priors over {tm.num_pdfs} pdfs")
    return 0


def nnet_show_progress(argv: List[str]) -> int:
    po = ParseOptions(
        "Show per-layer parameter differences between two nnet2 "
        "models, and (given egs) the objective at their midpoint "
        "(nnet2bin/nnet-show-progress.cc).\n"
        "Usage: nnet-show-progress [options] <old-model-in> "
        "<new-model-in> [<training-examples-in>]")
    num_egs = po.register_value("num-examples", 500,
                                "Maximum examples to use")
    po.read(argv)
    if po.num_args() not in (2, 3):
        po.print_usage()
        return 1
    import copy

    from kaldi_tpu.nnet2.train import (compute_prob, get_params,
                                       set_params, updatable_indices)
    _tm1, am_old = _read_am(po.get_arg(1))
    _tm2, am_new = _read_am(po.get_arg(2))
    upd = updatable_indices(am_new.nnet)
    for k, i in enumerate(upd):
        p_old = get_params(am_old.nnet, i)
        p_new = get_params(am_new.nnet, i)
        d = np.linalg.norm(p_new - p_old)
        base = np.linalg.norm(p_old)
        print(f"Component {i} "
              f"({type(am_new.nnet.components[i]).__name__}): "
              f"parameter-change {d:.4f} relative "
              f"{d / max(base, 1e-20):.4f}")
    if po.num_args() == 3:
        egs = []
        for eg in _eg_iter(po.get_arg(3)):
            egs.append(eg)
            if len(egs) >= num_egs[0]:
                break
        mid = copy.deepcopy(am_new.nnet)
        for i in upd:
            set_params(mid, i, 0.5 * (get_params(am_old.nnet, i)
                                      + get_params(am_new.nnet, i)))
        for name, nn in (("old", am_old.nnet), ("mid", mid),
                         ("new", am_new.nnet)):
            tot, w = compute_prob(nn, egs)
            print(f"Objf with {name} model: "
                  f"{tot / max(w, 1e-20):.4f}")
    return 0
