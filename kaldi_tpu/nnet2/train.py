"""nnet2 training math: batched forward/backprop over component lists,
cross-entropy objective, SGD updates with the (alpha) minibatch
preconditioner, model combination, and the progress/stat machinery.

References (behavioral spec, no code copied):
  nnet2/nnet-update.cc       NnetUpdater: FormatInput / Propagate /
                             ComputeObjfAndDeriv / Backprop
  nnet2/train-nnet.cc        TrainNnetSimple minibatch loop
  nnet2/nnet-precondition.cc PreconditionDirectionsAlphaRescaled
  nnet2/combine-nnet.cc      per-updatable-component combination weights
                             optimized on validation egs
  nnet2/train-nnet-ensemble.cc  interpolated-posterior ensemble term

Minibatches are (B, T, D) arrays: every component is row-wise except
SpliceComponent, which slides over the T axis; an eg with N labeled
frames and C context rows contributes one lane of T = N + C rows.
The objective is ascent on total weighted log-prob (the reference's
convention), so updates ADD learning_rate * gradient.

The AffineComponentPreconditionedOnline update applies the same
minibatch-local alpha preconditioner as AffineComponentPreconditioned:
the low-rank cross-minibatch Fisher state of natural-gradient-online.h
is deliberately not carried (capability-once: the real online NG lives
in nnet3/natural_gradient.py); this matches the reference's math in
the first minibatch and differs only in the smoothing horizon.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError, log, warn
from kaldi_tpu.nnet2.egs import NnetExample
from kaldi_tpu.nnet2.model import (AffineComponent, Nnet2,
                                   Nnet2Component, PnormComponent,
                                   SpliceComponent, _Affine, _Nonlinear)

# ---------------------------------------------------------------------------
# batched forward / backward


def _fwd(comp: Nnet2Component, x3: np.ndarray) -> np.ndarray:
    """(B, T, D) forward; splice slides over T, the rest are row-wise."""
    B, T, D = x3.shape
    if isinstance(comp, SpliceComponent):
        return np.stack([comp.forward(x3[b]) for b in range(B)]) \
            if B > 1 else comp.forward(x3[0])[None]
    y = comp.forward(x3.reshape(B * T, D))
    return y.reshape(B, T, -1)


def forward_store(nnet: Nnet2, x3: np.ndarray) -> List[np.ndarray]:
    """Returns activations [x0, x1, ..., y]; x3 is (B, T_in, D)."""
    acts = [np.asarray(x3, np.float32)]
    for comp in nnet.components:
        acts.append(_fwd(comp, acts[-1]))
    return acts


def _backprop(comp: Nnet2Component, x_in: np.ndarray,
              x_out: np.ndarray, dy: np.ndarray
              ) -> Tuple[np.ndarray, Optional[Dict[str, np.ndarray]]]:
    """(dx, grads); all of x_in/x_out/dy are (B, T, D)-shaped."""
    t = type(comp).__name__
    if isinstance(comp, SpliceComponent):
        ctx = list(comp.fields["Context"])
        c = int(comp.fields.get("ConstComponentDim", 0))
        B, T_in, D = x_in.shape
        var = D - c
        T_out = x_out.shape[1]
        dx = np.zeros_like(x_in)
        for j, o in enumerate(ctx):
            sl = slice(o - min(ctx), o - min(ctx) + T_out)
            dx[:, sl, :var] += dy[:, :, j * var:(j + 1) * var]
        if c:
            sl = slice(-min(ctx), -min(ctx) + T_out)
            dx[:, sl, var:] += dy[:, :, len(ctx) * var:]
        return dx, None
    if isinstance(comp, _Affine):
        W = np.asarray(comp.fields["LinearParams"], np.float32)
        B, T, _ = x_in.shape
        x2 = x_in.reshape(B * T, -1)
        d2 = dy.reshape(B * T, -1)
        dx = (d2 @ W).reshape(x_in.shape)
        grads = None
        if "LearningRate" in comp.fields:     # updatable
            grads = {"LinearParams": d2.T @ x2, "BiasParams": d2.sum(0),
                     "_in": x2, "_dout": d2}
        return dx, grads
    if t == "FixedLinearComponent":
        W = np.asarray(comp.fields["CuMatrix"], np.float32)
        return (dy.reshape(-1, dy.shape[-1]) @ W).reshape(x_in.shape), \
            None
    if t == "FixedScaleComponent":
        return dy * np.asarray(comp.fields["Scales"], np.float32), None
    if t == "FixedBiasComponent":
        return dy, None
    if t == "TanhComponent":
        return dy * (1.0 - x_out * x_out), None
    if t == "SigmoidComponent":
        return dy * x_out * (1.0 - x_out), None
    if t == "RectifiedLinearComponent":
        return dy * (x_out > 0.0), None
    if t == "SoftmaxComponent":
        dot = (dy * x_out).sum(axis=-1, keepdims=True)
        return x_out * (dy - dot), None
    if t == "LogSoftmaxComponent":
        return dy - np.exp(x_out) * dy.sum(axis=-1, keepdims=True), None
    if t == "NormalizeComponent":
        # y = x / rms(x): dx = (dy - y * <dy, y>/D_scaled) / rms
        from kaldi_tpu.nnet2.model import KNORM_FLOOR
        D = x_in.shape[-1]
        p = np.maximum((x_in * x_in).mean(axis=-1, keepdims=True),
                       KNORM_FLOOR)
        rms = np.sqrt(p)
        dot = (dy * x_in).sum(axis=-1, keepdims=True)
        return dy / rms - x_in * (dot / (D * p * rms)), None
    if isinstance(comp, PnormComponent):
        din = int(comp.fields["InputDim"])
        dout = int(comp.fields["OutputDim"])
        p = float(comp.fields["P"])
        gsz = din // dout
        shp = x_in.shape[:-1]
        g = x_in.reshape(*shp, dout, gsz)
        yq = np.maximum(x_out, 1e-20) ** (p - 1.0)
        dg = (dy / yq)[..., None] * np.sign(g) * np.abs(g) ** (p - 1.0)
        return dg.reshape(x_in.shape), None
    if t == "SumGroupComponent":
        sizes = list(comp.fields["Sizes"])
        reps = np.repeat(np.arange(len(sizes)), sizes)
        return dy[..., reps], None
    if t == "DropoutComponent":
        return dy, None
    raise KaldiTpuError(f"nnet2 backprop: unsupported component {t}")


def backprop(nnet: Nnet2, acts: List[np.ndarray], dy: np.ndarray,
             store_stats: bool = False
             ) -> Tuple[np.ndarray, List[Optional[Dict]]]:
    """Backward pass; returns (d_input, per-component grads)."""
    grads: List[Optional[Dict]] = [None] * len(nnet.components)
    for i in range(len(nnet.components) - 1, -1, -1):
        comp = nnet.components[i]
        if store_stats and isinstance(comp, _Nonlinear):
            _store_stats(comp, acts[i + 1])
        dy, g = _backprop(comp, acts[i], acts[i + 1], dy)
        grads[i] = g
    return dy, grads


def _store_stats(comp: _Nonlinear, y3: np.ndarray) -> None:
    """NonlinearComponent::StoreStats: running sums of activations and
    derivatives (used by nnet-am-fix / mixup counts)."""
    y2 = y3.reshape(-1, y3.shape[-1])
    t = type(comp).__name__
    vs = comp.fields.get("ValueSum")
    if vs is None or len(np.atleast_1d(vs)) != y2.shape[1]:
        vs = np.zeros(y2.shape[1], np.float64)
    comp.fields["ValueSum"] = np.asarray(vs, np.float64) + y2.sum(0)
    if t in ("SigmoidComponent", "TanhComponent",
             "RectifiedLinearComponent"):
        if t == "SigmoidComponent":
            d = y2 * (1.0 - y2)
        elif t == "TanhComponent":
            d = 1.0 - y2 * y2
        else:
            d = (y2 > 0.0).astype(np.float64)
        ds = comp.fields.get("DerivSum")
        if ds is None or len(np.atleast_1d(ds)) != y2.shape[1]:
            ds = np.zeros(y2.shape[1], np.float64)
        comp.fields["DerivSum"] = np.asarray(ds, np.float64) + d.sum(0)
    comp.fields["Count"] = float(comp.fields.get("Count", 0.0)
                                 ) + y2.shape[0]


# ---------------------------------------------------------------------------
# objective


def objf_and_deriv(y3: np.ndarray,
                   labels: Sequence[Sequence[Sequence[Tuple[int, float]]]]
                   ) -> Tuple[float, float, np.ndarray]:
    """CE on softmax outputs: objf = sum w*log(y[b,t,pdf]); the output
    deriv is w / y at the labels (nnet-update.cc ComputeObjfAndDeriv).
    Returns (tot_objf, tot_weight, dy)."""
    dy = np.zeros_like(y3)
    tot = 0.0
    tot_w = 0.0
    for b, frames in enumerate(labels):
        for t, frame in enumerate(frames):
            for pdf, w in frame:
                p = max(float(y3[b, t, pdf]), 1e-20)
                tot += w * np.log(p)
                tot_w += w
                dy[b, t, pdf] += w / p
    return tot, tot_w, dy


# ---------------------------------------------------------------------------
# updates


def _precondition(R: np.ndarray, alpha: float) -> np.ndarray:
    """PreconditionDirectionsAlphaRescaled (nnet-precondition.cc): rows
    of R are multiplied by the inverse of a smoothed scatter, then the
    result is rescaled to preserve the Frobenius norm."""
    N, D = R.shape
    if N == 0 or alpha <= 0:
        return R
    S = R.T @ R / max(N - 1, 1)
    lam = alpha * np.trace(S) / max(D, 1)
    if lam <= 0:
        return R
    P = R @ np.linalg.inv(S + lam * np.eye(D, dtype=R.dtype))
    nr, npn = np.linalg.norm(R), np.linalg.norm(P)
    return P * (nr / npn) if npn > 0 else R


def apply_update(comp: Nnet2Component, grads: Dict[str, np.ndarray]
                 ) -> None:
    """SGD ascent step with the component's stored learning rate;
    preconditioned variants smooth the minibatch directions first."""
    t = type(comp).__name__
    lr = float(comp.fields.get("LearningRate", 0.0))
    if lr == 0.0 or grads is None:
        return
    dW, db = grads["LinearParams"], grads["BiasParams"]
    if t in ("AffineComponentPreconditioned",
             "AffineComponentPreconditionedOnline"):
        alpha = float(comp.fields.get("Alpha", 4.0))
        x1 = np.concatenate([grads["_in"],
                             np.ones((grads["_in"].shape[0], 1),
                                     np.float32)], axis=1)
        xp = _precondition(x1, alpha)
        dp = _precondition(grads["_dout"], alpha)
        dW = dp.T @ xp[:, :-1]
        db = dp.T @ xp[:, -1]
        max_change = float(comp.fields.get("MaxChange", 0.0) or 0.0)
        if not max_change:
            mcps = float(comp.fields.get("MaxChangePerSample", 0.0)
                         or 0.0)
            max_change = mcps * grads["_in"].shape[0]
        if max_change > 0:
            norm = lr * np.sqrt(np.sum(dW * dW) + np.sum(db * db))
            if norm > max_change:
                scale = max_change / norm
                dW, db = dW * scale, db * scale
    comp.fields["LinearParams"] = \
        np.asarray(comp.fields["LinearParams"], np.float32) + lr * dW
    comp.fields["BiasParams"] = \
        np.asarray(comp.fields["BiasParams"], np.float32) + lr * db


# ---------------------------------------------------------------------------
# minibatch formatting + the training loop


def format_minibatch(egs: Sequence[NnetExample]
                     ) -> Tuple[np.ndarray, List]:
    """Stack same-shape egs into (B, T, D[+spk]) + label nests; the
    spk_info columns are appended to every frame (FormatInput)."""
    rows = []
    labels = []
    for eg in egs:
        x = eg.input_frames
        if eg.spk_info.size:
            x = np.concatenate(
                [x, np.broadcast_to(eg.spk_info,
                                    (x.shape[0], eg.spk_info.size))],
                axis=1)
        rows.append(x)
        labels.append(eg.labels)
    return np.stack(rows).astype(np.float32), labels


def _eg_shape(eg: NnetExample) -> Tuple[int, int, int]:
    return (eg.input_frames.shape[0], eg.input_frames.shape[1],
            len(eg.labels))


class TrainStats:
    def __init__(self):
        self.tot_objf = 0.0
        self.tot_weight = 0.0
        self.minibatches = 0

    @property
    def avg(self) -> float:
        return self.tot_objf / max(self.tot_weight, 1e-20)


def train_one_minibatch(nnet: Nnet2, egs: Sequence[NnetExample],
                        stats: TrainStats,
                        store_stats: bool = True) -> float:
    x3, labels = format_minibatch(egs)
    acts = forward_store(nnet, x3)
    objf, weight, dy = objf_and_deriv(acts[-1], labels)
    _, grads = backprop(nnet, acts, dy, store_stats=store_stats)
    for comp, g in zip(nnet.components, grads):
        if g is not None:
            apply_update(comp, g)
    stats.tot_objf += objf
    stats.tot_weight += weight
    stats.minibatches += 1
    return objf / max(weight, 1e-20)


def train_simple(nnet: Nnet2, egs_iter: Iterable[NnetExample],
                 minibatch_size: int = 500,
                 minibatches_per_phase: int = 50,
                 momentum: float = 0.0) -> TrainStats:
    """TrainNnetSimple (train-nnet.cc): buffer egs by shape, run
    minibatch SGD, log per phase."""
    stats = TrainStats()
    buffers: Dict[Tuple[int, int, int], List[NnetExample]] = {}
    phase_objf, phase_w, mb_in_phase, phase = 0.0, 0.0, 0, 0

    def flush(buf):
        nonlocal phase_objf, phase_w, mb_in_phase, phase
        before = (stats.tot_objf, stats.tot_weight)
        train_one_minibatch(nnet, buf, stats)
        phase_objf += stats.tot_objf - before[0]
        phase_w += stats.tot_weight - before[1]
        mb_in_phase += 1
        if mb_in_phase == minibatches_per_phase:
            log(f"Training objective function for phase {phase} is "
                f"{phase_objf / max(phase_w, 1e-20):.4f} over "
                f"{phase_w:.0f} frames")
            phase_objf, phase_w, mb_in_phase = 0.0, 0.0, 0
            phase += 1

    for eg in egs_iter:
        key = _eg_shape(eg)
        buf = buffers.setdefault(key, [])
        buf.append(eg)
        if len(buf) >= minibatch_size:
            flush(buf)
            buffers[key] = []
    for buf in buffers.values():
        if buf:
            flush(buf)
    log(f"Trained on {stats.tot_weight:.0f} frames in "
        f"{stats.minibatches} minibatches; average objf "
        f"{stats.avg:.4f}")
    return stats


def compute_prob(nnet: Nnet2, egs: Iterable[NnetExample]
                 ) -> Tuple[float, float]:
    """nnet-compute-prob: average log-prob per frame (no update)."""
    tot, tot_w = 0.0, 0.0
    buf: Dict[Tuple[int, int, int], List[NnetExample]] = {}
    for eg in egs:
        buf.setdefault(_eg_shape(eg), []).append(eg)
    for group in buf.values():
        for i in range(0, len(group), 512):
            x3, labels = format_minibatch(group[i:i + 512])
            y3 = forward_store(nnet, x3)[-1]
            o, w, _ = objf_and_deriv(y3, labels)
            tot += o
            tot_w += w
    return tot, tot_w


# ---------------------------------------------------------------------------
# parameter views (for combine / average / progress)


def updatable_indices(nnet: Nnet2) -> List[int]:
    return [i for i, c in enumerate(nnet.components)
            if "LearningRate" in c.fields and "LinearParams" in c.fields]


def get_params(nnet: Nnet2, i: int) -> np.ndarray:
    c = nnet.components[i]
    W = np.asarray(c.fields["LinearParams"], np.float64)
    b = np.asarray(c.fields["BiasParams"], np.float64)
    return np.concatenate([W.ravel(), b.ravel()])


def set_params(nnet: Nnet2, i: int, vec: np.ndarray) -> None:
    c = nnet.components[i]
    W = np.asarray(c.fields["LinearParams"])
    nW = W.size
    c.fields["LinearParams"] = \
        vec[:nW].reshape(W.shape).astype(np.float32)
    c.fields["BiasParams"] = vec[nW:].astype(np.float32)


def combine_nnets(nnets: List[Nnet2], valid_egs: List[NnetExample],
                  num_iters: int = 40,
                  initial_model: int = -1) -> Tuple[Nnet2, float]:
    """nnet-combine/-fast: per-(model, updatable-component) combination
    weights optimized by gradient ascent on the validation objective
    (the reference uses BFGS; plain ascent with backtracking converges
    on the same quadratic-ish surface).  Initialized one-hot from the
    best single model (combine-nnet.cc:GetInitialModel)."""
    import copy
    upd = updatable_indices(nnets[0])
    M, C = len(nnets), len(upd)
    probs = []
    for m, nn in enumerate(nnets):
        tot, w = compute_prob(nn, valid_egs)
        probs.append(tot / max(w, 1e-20))
        log(f"Objf with model {m} is {probs[-1]:.4f}")
    best = int(np.argmax(probs)) if initial_model < 0 else \
        min(initial_model, M - 1)
    weights = np.zeros((M, C))
    weights[best, :] = 1.0
    params = np.array(
        [[get_params(nn, i) for i in upd] for nn in nnets],
        dtype=object)
    work = copy.deepcopy(nnets[best])

    def apply_weights(wt):
        for ci, i in enumerate(upd):
            vec = sum(wt[m, ci] * params[m, ci] for m in range(M))
            set_params(work, i, vec)

    def objf_of(wt):
        apply_weights(wt)
        tot, w = compute_prob(work, valid_egs)
        return tot / max(w, 1e-20)

    def grad_of(wt):
        apply_weights(wt)
        x3, labels = format_minibatch(valid_egs)
        acts = forward_store(work, x3)
        _, tot_w, dy = objf_and_deriv(acts[-1], labels)
        _, grads = backprop(work, acts, dy)
        gw = np.zeros_like(wt)
        for ci, i in enumerate(upd):
            g = grads[i]
            gvec = np.concatenate([g["LinearParams"].ravel(),
                                   g["BiasParams"].ravel()]).astype(
                                       np.float64)
            for m in range(M):
                gw[m, ci] = float(gvec @ params[m, ci])
        return gw / max(tot_w, 1e-20)

    cur = objf_of(weights)
    log(f"Initial objf (best single model {best}) is {cur:.4f}")
    step = 0.5
    for it in range(num_iters):
        g = grad_of(weights)
        gn = np.linalg.norm(g)
        if gn < 1e-8:
            break
        while step > 1e-6:
            trial = weights + step * g / gn
            t_obj = objf_of(trial)
            if t_obj > cur:
                weights, cur = trial, t_obj
                step *= 1.2
                break
            step *= 0.5
        else:
            break
    log(f"Combined objf is {cur:.4f} (weights row-sums "
        f"{np.round(weights.sum(axis=0), 3).tolist()})")
    apply_weights(weights)
    return work, cur
