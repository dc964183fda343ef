"""Sequence-discriminative fine-tuning of nnet3 acoustic models
(parity: nnet3bin/nnet3-discriminative-train + the
steps/nnet3/train_discriminative.sh loop).

The reference pipeline decodes the training data once (denominator
lattices), aligns it (numerator), then fine-tunes with MMI/MPFE/sMBR.
The split here mirrors nnet3/discriminative.py's contract: the
lattice forward-backward runs on host per utterance (lattices are
small after pruning), producing a per-frame pdf-gradient matrix G;
the parameter update is the jitted backprop of  sum(loglikes * G)
through the acoustic model — exactly the chain rule the reference's
DiscriminativeComputation applies on GPU."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import log
from kaldi_tpu.nnet3.discriminative import (DiscriminativeOptions,
                                            compute_discriminative_objf_and_grad)


@dataclass
class DiscTrainOptions:
    num_epochs: int = 2
    learning_rate: float = 1e-4
    acoustic_scale: float = 0.1
    criterion: str = "smbr"
    l2: float = 1e-5


def rescore_lattice_acoustics(lat, tm, loglikes: np.ndarray):
    """Replace each arc's acoustic cost with -loglike[t, pdf(tid)]
    under the CURRENT model (the reference recomputes arc loglikes
    from the nnet output every minibatch; stored lattice acoustics
    would go stale as parameters move)."""
    from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
    from kaldi_tpu.lat.functions import lattice_state_times
    times = lattice_state_times(lat)
    out = VectorFst(LatticeWeight)
    for _ in range(lat.num_states):
        out.add_state()
    out.set_start(lat.start)
    T = loglikes.shape[0]
    for s in range(lat.num_states):
        out.finals[s] = lat.finals[s]
        for a in lat.arcs[s]:
            g, ac = a.weight
            if a.ilabel != 0 and times[s] < T:
                pdf = tm.transition_id_to_pdf(a.ilabel)
                ac = -float(loglikes[times[s], pdf])
            out.add_arc(s, Arc(a.ilabel, a.olabel, (g, ac),
                               a.nextstate))
    return out


def train_discriminative(apply_fn: Callable, params, tm,
                         feats: Dict[str, np.ndarray],
                         num_ali: Dict[str, Sequence[int]],
                         den_lats: Dict[str, object],
                         num_pdfs: int,
                         opts: Optional[DiscTrainOptions] = None):
    """apply_fn(params, feats (1, T, D)) -> loglikes (1, T, num_pdfs).
    Returns (params, per-epoch objective list)."""
    import jax
    import jax.numpy as jnp
    import optax

    opts = opts or DiscTrainOptions()
    d_opts = DiscriminativeOptions(criterion=opts.criterion,
                                   acoustic_scale=opts.acoustic_scale)
    tx = optax.adam(opts.learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, f, g):
        def loss_fn(p):
            ll = apply_fn(p, f)[0]
            # maximize sum(ll * G): G is d(objf)/d(loglikes), held
            # constant for the linearized update (the reference's
            # supply-derivative-at-output pattern)
            obj = (ll * g).sum() * d_opts.acoustic_scale
            l2_term = opts.l2 * sum(jnp.sum(x * x)
                                    for x in jax.tree.leaves(p))
            return -obj + l2_term
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    objfs: List[float] = []
    utts = sorted(feats)
    for epoch in range(opts.num_epochs):
        tot_obj = tot_frames = 0.0
        for u in utts:
            f = jnp.asarray(feats[u][None])
            ll = np.asarray(apply_fn(params, f)[0])
            T = min(len(num_ali[u]), ll.shape[0])
            lat = rescore_lattice_acoustics(den_lats[u], tm, ll)
            objf, grad = compute_discriminative_objf_and_grad(
                d_opts, tm, list(num_ali[u])[:T], lat, num_pdfs)
            g = np.zeros_like(ll)
            g[:grad.shape[0]] = grad[:ll.shape[0]]
            params, opt_state, _ = step(params, opt_state, f,
                                        jnp.asarray(g))
            tot_obj += objf * T
            tot_frames += T
        objfs.append(tot_obj / max(tot_frames, 1))
        log(f"discriminative epoch {epoch} ({opts.criterion}): "
            f"objf/frame {objfs[-1]:.4f}")
    return params, objfs
