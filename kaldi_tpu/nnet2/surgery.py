"""nnet2 model initialization + surgery: config-file init (nnet-init),
component insertion/replacement, mixing-up, widening, pathology fixes,
stddev normalization, preconditioning switches, learning-rate
equalization, and model averaging.

Behavioral specs: nnet2/nnet-component.cc InitFromString field
conventions, nnet2/nnet-functions.cc (InsertComponents,
ReplaceLastComponents, IndexOfSoftmaxLayer), nnet2/mixup-nnet.cc,
nnet2/widen-nnet.cc, nnet2/nnet-fix.cc,
nnet2bin/nnet-normalize-stddev.cc, nnet2bin/nnet-modify-learning-rates.cc,
gmm/model-common.cc GetSplitTargets."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError, log, warn
from kaldi_tpu.nnet2.model import (AffineComponent,
                                   AffineComponentPreconditioned,
                                   AffineComponentPreconditionedOnline,
                                   FixedAffineComponent,
                                   FixedBiasComponent,
                                   FixedScaleComponent,
                                   LogSoftmaxComponent, Nnet2,
                                   Nnet2Component, NormalizeComponent,
                                   PnormComponent,
                                   RectifiedLinearComponent,
                                   SigmoidComponent, SoftmaxComponent,
                                   SpliceComponent, SumGroupComponent,
                                   TanhComponent, _Affine, _Nonlinear)

# ---------------------------------------------------------------------------
# nnet-init config parsing


def _parse_kv(parts: Sequence[str]) -> Dict[str, str]:
    kv = {}
    for p in parts:
        if "=" not in p:
            raise KaldiTpuError(f"nnet2 config: bad field {p!r}")
        k, v = p.split("=", 1)
        kv[k] = v
    return kv


def _affine_from_config(cls, kv: Dict[str, str],
                        rng: np.random.RandomState) -> Nnet2Component:
    lr = float(kv.get("learning-rate", 0.001))
    if "matrix" in kv:
        from kaldi_tpu.util import kaldi_io
        from kaldi_tpu.base import io_funcs as iof
        with kaldi_io.input_stream(kv["matrix"]) as f:
            binary = iof.init_input_stream(f)
            mat = iof.read_matrix(f, binary)
        W, b = mat[:, :-1], mat[:, -1]
    else:
        din, dout = int(kv["input-dim"]), int(kv["output-dim"])
        param_stddev = float(kv.get("param-stddev",
                                    1.0 / np.sqrt(din)))
        bias_stddev = float(kv.get("bias-stddev", 1.0))
        W = (rng.randn(dout, din) * param_stddev).astype(np.float32)
        b = (rng.randn(dout) * bias_stddev).astype(np.float32)
    fields = dict(LearningRate=lr, LinearParams=W, BiasParams=b)
    if cls is AffineComponent:
        fields["IsGradient"] = False
    elif cls is AffineComponentPreconditioned:
        fields["Alpha"] = float(kv.get("alpha", 0.1))
        fields["MaxChange"] = float(kv.get("max-change", 0.0))
    elif cls is AffineComponentPreconditionedOnline:
        fields["RankIn"] = int(kv.get("rank-in", 30))
        fields["RankOut"] = int(kv.get("rank-out", 80))
        fields["UpdatePeriod"] = int(kv.get("update-period", 4))
        fields["NumSamplesHistory"] = float(
            kv.get("num-samples-history", 2000.0))
        fields["Alpha"] = float(kv.get("alpha", 4.0))
        fields["MaxChangePerSample"] = float(
            kv.get("max-change-per-sample", 0.0))
    return cls(**fields)


def component_from_config(line: str,
                          rng: np.random.RandomState) -> Nnet2Component:
    """One config line -> component (Component::InitFromString)."""
    parts = line.split()
    name, kv = parts[0], _parse_kv(parts[1:])
    if name == "SpliceComponent":
        din = int(kv["input-dim"])
        if "context" in kv:
            ctx = [int(x) for x in kv["context"].split(",")]
        else:
            lc = int(kv.get("left-context", 0))
            rc = int(kv.get("right-context", 0))
            ctx = list(range(-lc, rc + 1))
        return SpliceComponent(
            InputDim=din, Context=ctx,
            ConstComponentDim=int(kv.get("const-component-dim", 0)))
    if name in ("AffineComponent", "AffineComponentPreconditioned",
                "AffineComponentPreconditionedOnline"):
        cls = {"AffineComponent": AffineComponent,
               "AffineComponentPreconditioned":
                   AffineComponentPreconditioned,
               "AffineComponentPreconditionedOnline":
                   AffineComponentPreconditionedOnline}[name]
        return _affine_from_config(cls, kv, rng)
    if name == "FixedAffineComponent":
        from kaldi_tpu.util import kaldi_io
        from kaldi_tpu.base import io_funcs as iof
        with kaldi_io.input_stream(kv["matrix"]) as f:
            binary = iof.init_input_stream(f)
            mat = iof.read_matrix(f, binary)
        return FixedAffineComponent(LinearParams=mat[:, :-1],
                                    BiasParams=mat[:, -1].copy())
    if name == "PnormComponent":
        return PnormComponent(InputDim=int(kv["input-dim"]),
                              OutputDim=int(kv["output-dim"]),
                              P=float(kv.get("p", 2.0)))
    if name == "NormalizeComponent":
        return NormalizeComponent(Dim=int(kv["dim"]))
    if name == "SumGroupComponent":
        return SumGroupComponent(
            Sizes=[int(x) for x in kv["sizes"].split(",")])
    simple = {"TanhComponent": TanhComponent,
              "SigmoidComponent": SigmoidComponent,
              "RectifiedLinearComponent": RectifiedLinearComponent,
              "SoftmaxComponent": SoftmaxComponent,
              "LogSoftmaxComponent": LogSoftmaxComponent}
    if name in simple:
        return simple[name](Dim=int(kv["dim"]))
    raise KaldiTpuError(f"nnet2 config: unsupported component {name}")


def init_from_config(text: str, srand: int = 0) -> Nnet2:
    rng = np.random.RandomState(srand)
    comps = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if line:
            comps.append(component_from_config(line, rng))
    if not comps:
        raise KaldiTpuError("nnet-init: empty config")
    return Nnet2(comps)


# ---------------------------------------------------------------------------
# structural edits (nnet-functions.cc)


def index_of_softmax(nnet: Nnet2) -> int:
    idx = [i for i, c in enumerate(nnet.components)
           if isinstance(c, SoftmaxComponent)]
    return idx[0] if len(idx) == 1 else -1


def insert_components(nnet: Nnet2, src: Nnet2, insert_at: int,
                      randomize_next: bool = True,
                      stddev_factor: float = 0.1,
                      rng: Optional[np.random.RandomState] = None
                      ) -> None:
    nnet.components[insert_at:insert_at] = src.components
    if randomize_next:
        c = nnet.components[insert_at + len(src.components)]
        if "LinearParams" not in c.fields:
            raise KaldiTpuError("component to randomize is not updatable")
        W = np.asarray(c.fields["LinearParams"])
        rng = rng or np.random.RandomState(0)
        stddev = stddev_factor / np.sqrt(W.shape[1])
        c.fields["LinearParams"] = \
            (rng.randn(*W.shape) * stddev).astype(np.float32)
        c.fields["BiasParams"] = np.zeros(W.shape[0], np.float32)


def replace_last_components(nnet: Nnet2, src: Nnet2,
                            remove_layers: int) -> None:
    if remove_layers >= len(nnet.components):
        raise KaldiTpuError("removing all components")
    nnet.components = nnet.components[:-remove_layers] + src.components


# ---------------------------------------------------------------------------
# mixing up (mixup-nnet.cc)


def get_split_targets(occs: np.ndarray, target: int, power: float,
                      min_count: float) -> List[int]:
    """gmm/model-common.cc GetSplitTargets: allocate `target` mixtures
    by repeatedly splitting the state with max occ^power / n."""
    import heapq
    occs = np.asarray(occs, np.float64)
    n = len(occs)
    heap = [(-(occs[i] ** power), 1, i) for i in range(n)]
    heapq.heapify(heap)
    num = n
    while num < target:
        negocc, k, i = heapq.heappop(heap)
        if negocc == 0.0:
            warn(f"could not split to {target} mixtures due to "
                 f"min-count {min_count}")
            heapq.heappush(heap, (negocc, k, i))
            break
        if (k + 1) * min_count >= occs[i]:
            heapq.heappush(heap, (0.0, k, i))
        else:
            heapq.heappush(heap, (-(occs[i] ** power) / (k + 1), k + 1,
                                  i))
            num += 1
    out = [0] * n
    for negocc, k, i in heap:
        out[i] = k
    return out


def mixup_nnet(nnet: Nnet2, num_mixtures: int, power: float = 0.25,
               min_count: float = 1000.0, perturb_stddev: float = 0.1,
               rng: Optional[np.random.RandomState] = None) -> None:
    """MixupNnet: ensure trailing SumGroupComponent, then split
    high-count softmax rows of the preceding AffineComponent (duplicate
    + perturb, bias += log(0.5))."""
    rng = rng or np.random.RandomState(0)
    comps = nnet.components
    if not isinstance(comps[-1], SumGroupComponent):
        dim = comps[-1].output_dim(0) if not isinstance(
            comps[-1], SoftmaxComponent) else \
            int(comps[-1].fields["Dim"])
        log("Adding SumGroupComponent to neural net.")
        comps.append(SumGroupComponent(Sizes=[1] * dim))
    sc = comps[-1]
    softmax = comps[-2]
    affine = comps[-3]
    if not isinstance(softmax, SoftmaxComponent) or \
            not isinstance(affine, _Affine):
        raise KaldiTpuError("mixup: expected ... Affine, Softmax, "
                            "SumGroup topology")
    sizes = [int(s) for s in sc.fields["Sizes"]]
    value_sum = np.asarray(softmax.fields.get("ValueSum", []),
                           np.float64)
    if value_sum.size != sum(sizes) or value_sum.sum() <= 0:
        raise KaldiTpuError("mixup: softmax has no stored counts "
                            "(train first so StoreStats runs)")
    off = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    counts = np.asarray([value_sum[off[i]:off[i + 1]].sum()
                         for i in range(len(sizes))])
    targets = get_split_targets(counts, num_mixtures, power, min_count)
    new_sizes = [max(t, s) for t, s in zip(targets, sizes)]
    W = np.asarray(affine.fields["LinearParams"], np.float32)
    b = np.asarray(affine.fields["BiasParams"], np.float32)
    new_W, new_b, new_counts = [], [], []
    for i, (s_old, s_new) in enumerate(zip(sizes, new_sizes)):
        Wi = W[off[i]:off[i + 1]].copy()
        bi = b[off[i]:off[i + 1]].copy()
        ci = value_sum[off[i]:off[i + 1]].copy()
        while Wi.shape[0] < s_new:
            j = int(np.argmax(ci))
            ci[j] *= 0.5
            ci = np.append(ci, ci[j])
            r = rng.randn(W.shape[1]).astype(np.float32)
            new_row = Wi[j].copy() - perturb_stddev * r
            Wi[j] += perturb_stddev * r
            Wi = np.vstack([Wi, new_row[None]])
            bi[j] += np.log(0.5)
            bi = np.append(bi, bi[j])
        new_W.append(Wi)
        new_b.append(bi)
        new_counts.append(ci)
    affine.fields["LinearParams"] = np.vstack(new_W)
    affine.fields["BiasParams"] = np.concatenate(new_b).astype(
        np.float32)
    sc.fields["Sizes"] = new_sizes
    softmax.fields["ValueSum"] = np.concatenate(new_counts)
    softmax.fields["Dim"] = int(sum(new_sizes))
    softmax.fields["Count"] = float(
        np.concatenate(new_counts).sum())
    log(f"Mixed up from dimension of {sum(sizes)} to {sum(new_sizes)} "
        f"in the softmax layer.")


# ---------------------------------------------------------------------------
# widening / fixing / normalization


def widen_nnet(nnet: Nnet2, hidden_dim: int,
               param_stddev_factor: float = 1.0,
               rng: Optional[np.random.RandomState] = None) -> None:
    """widen-nnet.cc: for each affine -> nonlinearity(s) -> affine
    chain, grow the first affine's output to hidden_dim (random new
    rows), resize the nonlinearities, zero-extend the next affine's
    inputs."""
    rng = rng or np.random.RandomState(0)
    comps = nnet.components
    for i, c in enumerate(comps):
        if not isinstance(c, _Affine) or \
                "LearningRate" not in c.fields:
            continue
        # find following nonlinearities then the next affine
        nls = []
        j = i + 1
        while j < len(comps) and isinstance(comps[j], _Nonlinear) and \
                not isinstance(comps[j], (SoftmaxComponent,
                                          LogSoftmaxComponent)):
            nls.append(comps[j])
            j += 1
        if not nls or j >= len(comps) or \
                not isinstance(comps[j], _Affine):
            continue
        c3 = comps[j]
        W = np.asarray(c.fields["LinearParams"], np.float32)
        b = np.asarray(c.fields["BiasParams"], np.float32)
        old_dim = W.shape[0]
        extra = hidden_dim - old_dim
        if extra <= 0:
            warn(f"not widening component {i}: new dim {hidden_dim} "
                 f"<= old dim {old_dim}")
            continue
        param_stddev = param_stddev_factor / np.sqrt(W.shape[1])
        c.fields["LinearParams"] = np.vstack(
            [W, (rng.randn(extra, W.shape[1]) * param_stddev
                 ).astype(np.float32)])
        c.fields["BiasParams"] = np.concatenate(
            [b, (rng.randn(extra) * param_stddev).astype(np.float32)])
        for nl in nls:
            nl.fields["Dim"] = hidden_dim
            for k in ("ValueSum", "DerivSum"):
                v = np.asarray(nl.fields.get(k, []), np.float64)
                if v.size == old_dim:
                    nl.fields[k] = np.concatenate(
                        [v, np.zeros(extra)])
        W3 = np.asarray(c3.fields["LinearParams"], np.float32)
        c3.fields["LinearParams"] = np.hstack(
            [W3, np.zeros((W3.shape[0], extra), np.float32)])
        log(f"widened component {i} from {old_dim} to {hidden_dim}")


def fix_nnet(nnet: Nnet2, min_average_deriv: float = 0.1,
             max_average_deriv: float = 0.75,
             parameter_factor: float = 2.0,
             relu_bias_change: float = 1.0) -> None:
    """nnet-fix.cc FixNnet: rescale rows of affine components whose
    following nonlinearity's average derivative (from stored stats) is
    out of range; for ReLUs adjust the bias instead."""
    comps = nnet.components
    for i in range(len(comps) - 1):
        ac, nc = comps[i], comps[i + 1]
        if not isinstance(ac, _Affine):
            continue
        t = type(nc).__name__
        if t == "SigmoidComponent":
            max_deriv, is_relu = 0.25, False
        elif t == "TanhComponent":
            max_deriv, is_relu = 1.0, False
        elif t == "RectifiedLinearComponent":
            max_deriv, is_relu = 1.0, True
        else:
            continue
        count = float(nc.fields.get("Count", 0.0))
        deriv_sum = np.asarray(nc.fields.get("DerivSum", []),
                               np.float64)
        if count == 0.0 or deriv_sum.size == 0:
            warn("cannot fix neural net: no statistics stored")
            continue
        W = np.asarray(ac.fields["LinearParams"], np.float32)
        b = np.asarray(ac.fields["BiasParams"], np.float32)
        ratio = deriv_sum / (count * max_deriv)
        n_small = n_large = 0
        for d in range(len(ratio)):
            if ratio[d] < min_average_deriv:
                if is_relu:
                    b[d] += relu_bias_change
                else:
                    f = min(min_average_deriv / max(ratio[d], 1e-20),
                            parameter_factor)
                    b[d] /= f
                    W[d] /= f
                n_small += 1
            elif ratio[d] > max_average_deriv:
                if is_relu:
                    b[d] -= relu_bias_change
                else:
                    f = min(ratio[d] / max_average_deriv,
                            parameter_factor)
                    b[d] *= f
                    W[d] *= f
                n_large += 1
        ac.fields["LinearParams"] = W
        ac.fields["BiasParams"] = b
        log(f"layer {i}: adjusted {n_small} small-deriv and {n_large} "
            f"large-deriv units out of {len(ratio)}")


def normalize_stddev(nnet: Nnet2, stddev: float = 1.0,
                     stddev_from: Optional[Nnet2] = None) -> None:
    """nnet-normalize-stddev.cc: rescale affine layers followed by
    pnorm + normalize so their (combined W|b) stddev is `stddev` (or
    matches the corresponding layer of stddev_from)."""
    comps = nnet.components
    ref = stddev_from.components if stddev_from is not None else None
    for i in range(len(comps) - 2):
        if not (isinstance(comps[i], _Affine)
                and "LearningRate" in comps[i].fields
                and isinstance(comps[i + 1], PnormComponent)
                and isinstance(comps[i + 2], NormalizeComponent)):
            continue
        W = np.asarray(comps[i].fields["LinearParams"], np.float64)
        b = np.asarray(comps[i].fields["BiasParams"], np.float64)
        vec = np.concatenate([W.ravel(), b])
        cur = float(np.sqrt((vec * vec).mean()))
        target = stddev
        if ref is not None:
            Wr = np.asarray(ref[i].fields["LinearParams"], np.float64)
            br = np.asarray(ref[i].fields["BiasParams"], np.float64)
            vr = np.concatenate([Wr.ravel(), br])
            target = float(np.sqrt((vr * vr).mean()))
        if cur <= 0:
            continue
        scale = target / cur
        comps[i].fields["LinearParams"] = (W * scale).astype(np.float32)
        comps[i].fields["BiasParams"] = (b * scale).astype(np.float32)
        log(f"component {i}: stddev {cur:.4f} -> {target:.4f}")


def switch_preconditioning(nnet: Nnet2, rank_in: int = 20,
                           rank_out: int = 80, update_period: int = 4,
                           num_samples_history: float = 2000.0,
                           alpha: float = 4.0) -> None:
    """nnet-am-switch-preconditioning.cc: convert every
    AffineComponent-derived component to
    AffineComponentPreconditionedOnline."""
    for i, c in enumerate(nnet.components):
        if isinstance(c, _Affine) and "LearningRate" in c.fields and \
                not isinstance(c, AffineComponentPreconditionedOnline):
            nnet.components[i] = AffineComponentPreconditionedOnline(
                LearningRate=c.fields["LearningRate"],
                LinearParams=c.fields["LinearParams"],
                BiasParams=c.fields["BiasParams"],
                RankIn=rank_in, RankOut=rank_out,
                UpdatePeriod=update_period,
                NumSamplesHistory=num_samples_history, Alpha=alpha,
                MaxChangePerSample=float(
                    c.fields.get("MaxChangePerSample", 0.075)))


def reinitialize_last_layer(nnet: Nnet2, num_pdfs: int) -> None:
    """nnet-am-reinitialize.cc: resize+zero the last affine to match a
    new transition model; drop any trailing SumGroupComponent."""
    if isinstance(nnet.components[-1], SumGroupComponent):
        nnet.components.pop()
    softmax = nnet.components[-1]
    affine = nnet.components[-2]
    if not isinstance(affine, _Affine):
        raise KaldiTpuError("reinitialize: expected affine before "
                            "softmax")
    W = np.asarray(affine.fields["LinearParams"])
    affine.fields["LinearParams"] = np.zeros((num_pdfs, W.shape[1]),
                                             np.float32)
    affine.fields["BiasParams"] = np.zeros(num_pdfs, np.float32)
    softmax.fields["Dim"] = num_pdfs
    for k in ("ValueSum", "DerivSum"):
        if k in softmax.fields:
            softmax.fields[k] = np.zeros(num_pdfs, np.float64)


# ---------------------------------------------------------------------------
# learning rates / averaging


def modify_learning_rates(prev: Nnet2, cur: Nnet2,
                          average_learning_rate: float = 0.0,
                          first_layer_factor: float = 1.0,
                          last_layer_factor: float = 1.0,
                          retroactive: bool = False) -> None:
    """nnet-modify-learning-rates.cc: lr_i ∝ prev_lr_i / relative
    parameter change of layer i, rescaled to the target geometric
    mean."""
    from kaldi_tpu.nnet2.train import (get_params, set_params,
                                       updatable_indices)
    upd = updatable_indices(cur)
    rel = np.zeros(len(upd))
    prev_lr = np.array([float(prev.components[i].fields["LearningRate"])
                        for i in upd])
    cur_lr = np.array([float(cur.components[i].fields["LearningRate"])
                       for i in upd])
    for k, i in enumerate(upd):
        d = get_params(cur, i) - get_params(prev, i)
        base = np.linalg.norm(get_params(prev, i))
        rel[k] = np.linalg.norm(d) / max(base, 1e-20)
    log(f"Relative parameter differences per layer are "
        f"{np.round(rel, 6).tolist()}")
    nz = rel != 0.0
    if not nz.all() and nz.any():
        rel[~nz] = rel[nz].mean()
    target_gm = average_learning_rate if average_learning_rate > 0 \
        else float(np.exp(np.log(np.maximum(cur_lr, 1e-20)).mean()))
    new_lr = prev_lr / np.maximum(rel, 1e-20)
    new_lr[-1] *= last_layer_factor
    new_lr[0] *= first_layer_factor
    gm = float(np.exp(np.log(np.maximum(new_lr, 1e-20)).mean()))
    new_lr *= target_gm / max(gm, 1e-20)
    log(f"New learning rates are {np.round(new_lr, 8).tolist()}")
    if retroactive:
        scale = new_lr / np.maximum(prev_lr, 1e-20)
        for k, i in enumerate(upd):
            p0 = get_params(prev, i)
            set_params(cur, i,
                       p0 + scale[k] * (get_params(cur, i) - p0))
    for k, i in enumerate(upd):
        cur.components[i].fields["LearningRate"] = float(new_lr[k])
        cur.components[i].fields.pop("MaxChange", None)


def average_nnets(nnets: List[Nnet2],
                  weights: Optional[Sequence[float]] = None,
                  sum_mode: bool = False,
                  skip_last_layer: bool = False) -> Nnet2:
    """nnet-am-average.cc: parameter-wise (weighted) average."""
    import copy
    from kaldi_tpu.nnet2.train import (get_params, set_params,
                                       updatable_indices)
    out = copy.deepcopy(nnets[0])
    upd = updatable_indices(out)
    n = len(nnets)
    w = np.asarray(weights if weights is not None
                   else [1.0 / n] * n, np.float64)
    if sum_mode:
        w = np.ones(n)
    for k, i in enumerate(upd):
        if skip_last_layer and k == len(upd) - 1:
            continue
        set_params(out, i, sum(w[m] * get_params(nnets[m], i)
                               for m in range(n)))
    return out
