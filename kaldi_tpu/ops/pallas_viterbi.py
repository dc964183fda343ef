"""TPU kernels for the batched Viterbi relaxation step.

The device decoder's per-frame hot op is, for every lane b and state s:

    new_cost[b, s] = min_k ( cost[b, in_src[s, k]] + in_w[s, k]
                             - scale * loglikes[b, in_pdf[s, k]] )

where (in_src, in_w, in_pdf) is the PADDED INCOMING-ARC TABLE (S, K)
built once at pack time (dead entries carry +inf weight). This
formulation replaces scatter-min (slow on TPU) with gathers + a K-way
min — pure VPU work with MXU-free regular access.

Two implementations with identical semantics:
  relax_padded        — jnp (XLA) version, used everywhere by default
  pallas_relax        — Pallas kernel keeping the cost row and arc
                        table blocks in VMEM (grid over lane blocks);
                        the building block for a fully VMEM-resident
                        multi-frame search kernel in a later round.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

INF = np.float32(1e30)


def build_incoming_table(num_states, src, dst, weight, pdf):
    """Pad incoming arcs per destination to a power-of-two K.
    Returns (in_src (S,K) int32, in_w (S,K) f32, in_pdf (S,K) int32, K).
    Dead slots: src = S (a dead state the caller keeps at +inf),
    w = +inf, pdf = 0."""
    S = num_states
    counts = np.zeros(S, np.int64)
    np.add.at(counts, dst, 1)
    kmax = int(counts.max(initial=1))
    K = 1
    while K < kmax:
        K *= 2
    in_src = np.full((S, K), S, np.int32)
    in_w = np.full((S, K), INF, np.float32)
    in_pdf = np.zeros((S, K), np.int32)
    fill = np.zeros(S, np.int64)
    for a in range(len(src)):
        d = dst[a]
        j = fill[d]
        in_src[d, j] = src[a]
        in_w[d, j] = weight[a]
        in_pdf[d, j] = pdf[a]
        fill[d] += 1
    return in_src, in_w, in_pdf, K


def relax_padded(cost, in_src, in_w, in_pdf, loglikes_t, acoustic_scale):
    """jnp version. cost: (B, S+1) with cost[:, S] == +inf (dead state);
    loglikes_t: (B, P). Returns new (B, S) costs (pre-epsilon)."""
    prev = jnp.take(cost, in_src, axis=1)                   # (B, S, K)
    ac = jnp.take(loglikes_t, in_pdf, axis=1)               # (B, S, K)
    cand = prev + in_w[None] - acoustic_scale * ac
    return jnp.min(cand, axis=-1)


def pallas_relax(cost, in_src, in_w, in_pdf, loglikes_t,
                 acoustic_scale: float, state_block: int = 512,
                 interpret: bool = False):
    """Pallas version: grid over state blocks; each program loads its
    (SB, K) arc-table tile and the full lane cost rows (resident in
    VMEM) and emits the (B, SB) relaxed tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S1 = cost.shape
    S, K = in_src.shape
    SB = min(state_block, S)
    grid = ((S + SB - 1) // SB,)

    def kernel(cost_ref, src_ref, w_ref, pdf_ref, ll_ref, out_ref):
        src = src_ref[:]                       # (SB, K)
        w = w_ref[:]
        pdf = pdf_ref[:]
        c = cost_ref[:]                        # (B, S+1)
        ll = ll_ref[:]                         # (B, P)
        prev = c[:, src.reshape(-1)].reshape(c.shape[0], SB, K)
        ac = ll[:, pdf.reshape(-1)].reshape(c.shape[0], SB, K)
        cand = prev + w[None] - acoustic_scale * ac
        out_ref[:] = jnp.min(cand, axis=-1)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, S1), lambda i: (0, 0)),
            pl.BlockSpec((SB, K), lambda i: (i, 0)),
            pl.BlockSpec((SB, K), lambda i: (i, 0)),
            pl.BlockSpec((SB, K), lambda i: (i, 0)),
            pl.BlockSpec((B, loglikes_t.shape[1]), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, SB), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, grid[0] * SB), cost.dtype),
        interpret=interpret,
    )(cost, in_src, in_w, in_pdf, loglikes_t)[:, :S]
