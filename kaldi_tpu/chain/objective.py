"""Chain (LF-MMI) objective: batched forward(-backward via autodiff)
over packed HMM graphs.

Parity: chain/chain-training.h:146 ComputeChainObjfAndDeriv =
numerator FB − denominator FB + L2 + cross-entropy regularizer.
The reference implements α/β recursions as CUDA kernels in the
probability domain with per-frame renormalization
(chain-denominator.h:44-180); here the recursion is a log-domain
lax.scan with per-arc gathers + segment-logsumexp — XLA fuses the
gather/scatter, jax.checkpoint bounds memory, and the gradient
(= occupancies) comes from autodiff of the scan, which reproduces the
β recursion exactly. Leaky-HMM is the same rank-1 escape to the
initial distribution each frame.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@dataclass(frozen=True)
class ChainTrainingOptions:
    l2_regularize: float = 0.0
    leaky_hmm_coefficient: float = 1.0e-05
    xent_regularize: float = 0.0


def _segment_logsumexp(vals, seg, num_segments):
    m = jax.ops.segment_max(vals, seg, num_segments=num_segments)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jax.ops.segment_sum(jnp.exp(vals - m_safe[seg]), seg,
                            num_segments=num_segments)
    return m_safe + jnp.log(jnp.maximum(s, 1e-37)) + jnp.where(
        jnp.isfinite(m), 0.0, NEG_INF)


def _forward_loglike(nnet_out, src, dst, pdf, log_prob, initial, final,
                     leaky: float, num_states: int):
    """Single-sequence forward pass. nnet_out: (T, P) log-space scores.
    Returns total log-like of the graph against the scores."""

    log_leaky = jnp.log(leaky) if leaky > 0 else NEG_INF

    def step(alpha, out_t):
        # leaky-HMM: from total mass, escape to initial distribution
        if leaky > 0:
            tot = jax.scipy.special.logsumexp(alpha)
            alpha = jnp.logaddexp(alpha, log_leaky + initial + tot)
        arc_scores = alpha[src] + log_prob + out_t[pdf]
        new_alpha = _segment_logsumexp(arc_scores, dst, num_states)
        # renormalize to keep magnitudes bounded; track the constant
        shift = jnp.max(new_alpha)
        new_alpha = new_alpha - shift
        return new_alpha, shift

    alpha0 = initial
    alpha_T, shifts = jax.lax.scan(jax.checkpoint(step), alpha0, nnet_out)
    total = jax.scipy.special.logsumexp(alpha_T + final)
    return total + jnp.sum(shifts)


@functools.partial(jax.jit, static_argnames=("num_states", "den_num_states",
                                             "leaky"))
def _chain_objf(nnet_out,
                num_src, num_dst, num_pdf, num_lp, num_init, num_final,
                den_src, den_dst, den_pdf, den_lp, den_init, den_final,
                num_states: int, den_num_states: int, leaky: float):
    """Batched num/den loglikes. nnet_out (B, T, P); numerator arrays are
    (B, ...) per-sequence; denominator arrays are shared (no batch dim).
    Returns (num_logprob (B,), den_logprob (B,))."""
    num_fb = jax.vmap(
        lambda out, s, d, p, lp, i, f: _forward_loglike(
            out, s, d, p, lp, i, f, 0.0, num_states))
    num_ll = num_fb(nnet_out, num_src, num_dst, num_pdf, num_lp,
                    num_init, num_final)
    den_fb = jax.vmap(
        lambda out: _forward_loglike(out, den_src, den_dst, den_pdf, den_lp,
                                     den_init, den_final, leaky,
                                     den_num_states))
    den_ll = den_fb(nnet_out)
    return num_ll, den_ll


def chain_objf_and_grad(opts: ChainTrainingOptions,
                        den_graph, num_graphs_batched,
                        nnet_out: jnp.ndarray,
                        xent_out: Optional[jnp.ndarray] = None):
    """Compute (objf, grad wrt nnet_out[, xent objf]) — the functional
    equivalent of ComputeChainObjfAndDeriv. Typically you instead call
    `chain_loss` inside your training loss so autodiff flows end-to-end.
    """
    loss, grads = jax.value_and_grad(
        lambda out: -chain_loss(opts, den_graph, num_graphs_batched, out,
                                xent_out)[0])(nnet_out)
    return -loss, -grads


def chain_loss(opts: ChainTrainingOptions, den_graph, num_graphs_batched,
               nnet_out: jnp.ndarray,
               xent_out: Optional[jnp.ndarray] = None,
               num_posteriors: Optional[jnp.ndarray] = None
               ) -> Tuple[jnp.ndarray, dict]:
    """Differentiable objective PER FRAME (higher is better):
    (num − den + xent_regularize * xent) / (B*T), plus l2 on nnet_out
    (the reference's 'output-l2' style regularizer).

    den_graph: DenominatorGraph. num_graphs_batched: tuple of stacked
    arrays from chain.graphs.batch_pack. num_posteriors: optional
    (B, T, P) one-hot/soft targets for the xent head (defaults to being
    skipped)."""
    n_src, n_dst, n_pdf, n_lp, n_init, n_final = [
        jnp.asarray(a) for a in num_graphs_batched]
    g = den_graph.graph
    B, T, P = nnet_out.shape
    num_ll, den_ll = _chain_objf(
        nnet_out,
        n_src, n_dst, n_pdf, n_lp, n_init, n_final,
        jnp.asarray(g.src), jnp.asarray(g.dst), jnp.asarray(g.pdf),
        jnp.asarray(g.log_prob), jnp.asarray(g.initial),
        jnp.asarray(g.final),
        num_states=int(n_init.shape[1]), den_num_states=g.num_states,
        leaky=float(opts.leaky_hmm_coefficient))
    tot_frames = B * T
    objf = (num_ll.sum() - den_ll.sum()) / tot_frames
    aux = {"num": num_ll.sum() / tot_frames,
           "den": den_ll.sum() / tot_frames}
    if opts.l2_regularize > 0:
        l2 = -0.5 * opts.l2_regularize * jnp.mean(jnp.sum(nnet_out ** 2,
                                                          axis=-1))
        objf = objf + l2
        aux["l2"] = l2
    if opts.xent_regularize > 0 and xent_out is not None \
            and num_posteriors is not None:
        xent = jnp.mean(jnp.sum(num_posteriors * xent_out, axis=-1))
        objf = objf + opts.xent_regularize * xent
        aux["xent"] = xent
    return objf, aux
