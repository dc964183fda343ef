"""Batched device Viterbi over packed graphs.

TPU-native equivalent of the cudadecoder's batched search
(SURVEY.md §2.5, cuda-decoder.h:171 lanes/channels): utterances are
lanes in a dense (batch × states) cost tensor; each frame is one
emitting relaxation (per-arc gather + segment-min — the same
data-parallel shape as the CUDA ExpandArcs kernel) followed by a fixed
number of epsilon relaxations (the graph's epsilon depth, computed at
pack time, replaces the data-dependent non-emitting iteration loop).
All frames run inside one lax.scan; the per-frame cost tables stream
back and the traceback is recovered on the host by cost-consistency
(no backpointer storage on device).

Exact (no beam) — correct for per-utterance training/alignment graphs
and small-to-medium decoding graphs where S×A fits the arithmetic
budget; the beam-sparse large-vocabulary variant builds on this in a
later round.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.base.logging import warn
from kaldi_tpu.fstext.fst import EPS, Arc, TropicalWeight, VectorFst

INF = np.float32(1e30)


@dataclass
class DeviceGraph:
    """Arc-parallel packing of one decoding/alignment graph."""
    e_src: np.ndarray
    e_dst: np.ndarray
    e_ilabel: np.ndarray   # transition-ids
    e_olabel: np.ndarray
    e_weight: np.ndarray
    ne_src: np.ndarray
    ne_dst: np.ndarray
    ne_olabel: np.ndarray
    ne_weight: np.ndarray
    start: int
    final: np.ndarray      # (S,) final costs (INF if none)
    num_states: int
    eps_depth: int

    def padded(self, S: int, EA: int, NA: int) -> "DeviceGraph":
        def pad_i(a, n, fill):
            return np.concatenate([a, np.full(n - len(a), fill, a.dtype)])
        dead = S - 1
        return DeviceGraph(
            pad_i(self.e_src, EA, dead), pad_i(self.e_dst, EA, dead),
            pad_i(self.e_ilabel, EA, 0), pad_i(self.e_olabel, EA, 0),
            pad_i(self.e_weight, EA, INF),
            pad_i(self.ne_src, NA, dead), pad_i(self.ne_dst, NA, dead),
            pad_i(self.ne_olabel, NA, 0), pad_i(self.ne_weight, NA, INF),
            self.start, pad_i(self.final, S, INF), S, self.eps_depth)


def pack_graph(fst: VectorFst) -> DeviceGraph:
    e = [[], [], [], [], []]
    ne = [[], [], [], []]
    for s in range(fst.num_states):
        for a in fst.arcs[s]:
            if a.ilabel == EPS:
                ne[0].append(s)
                ne[1].append(a.nextstate)
                ne[2].append(a.olabel)
                ne[3].append(a.weight)
            else:
                e[0].append(s)
                e[1].append(a.nextstate)
                e[2].append(a.ilabel)
                e[3].append(a.olabel)
                e[4].append(a.weight)
    final = np.array([w if w != TropicalWeight.zero else INF
                      for w in fst.finals], np.float32)
    # epsilon depth: longest chain of eps arcs (assumed acyclic in
    # weight-bearing direction; cycles get capped)
    depth = _eps_depth(fst)
    return DeviceGraph(
        np.array(e[0], np.int32), np.array(e[1], np.int32),
        np.array(e[2], np.int32), np.array(e[3], np.int32),
        np.array(e[4], np.float32),
        np.array(ne[0], np.int32), np.array(ne[1], np.int32),
        np.array(ne[2], np.int32), np.array(ne[3], np.float32),
        fst.start, final, fst.num_states, depth)


def _eps_depth(fst: VectorFst, cap: int = 10) -> int:
    from collections import deque
    n = fst.num_states
    depth = [0] * n
    changed = True
    iters = 0
    while changed and iters < cap:
        changed = False
        iters += 1
        for s in range(n):
            for a in fst.arcs[s]:
                if a.ilabel == EPS and depth[a.nextstate] < depth[s] + 1:
                    depth[a.nextstate] = depth[s] + 1
                    changed = True
    return min(max(depth, default=0) + 1, cap)


@functools.partial(jax.jit, static_argnames=("num_states", "eps_iters"))
def _viterbi_device(loglikes, acoustic_scale,
                    e_in_src, e_in_w, e_in_pdf,
                    ne_in_src, ne_in_w,
                    init_cost, num_states: int, eps_iters: int):
    """loglikes: (B, T, P); padded incoming-arc tables are (B, S, K)
    (scatter-free gather+min relaxation — see ops/pallas_viterbi).
    Cost rows carry a dead state at index S kept at +inf. Returns
    (B, T+1, S+1) post-closure cost tables."""
    B, S1 = init_cost.shape

    def gather_state(cost, idx):
        # cost (B, S+1), idx (B, S, K) -> (B, S, K)
        flat = jnp.take_along_axis(
            cost, idx.reshape(B, -1), axis=1)
        return flat.reshape(idx.shape)

    def eps_close(cost):
        def one(cost, _):
            cand = gather_state(cost, ne_in_src) + ne_in_w
            upd = jnp.min(cand, axis=-1)
            new = jnp.minimum(cost[:, :-1], upd)
            return jnp.concatenate([new, cost[:, -1:]], axis=1), None
        cost, _ = jax.lax.scan(one, cost, None, length=eps_iters)
        return cost

    cost0 = eps_close(init_cost)

    def step(cost, ll_t):
        ac = jnp.take_along_axis(ll_t, e_in_pdf.reshape(B, -1),
                                 axis=1).reshape(e_in_pdf.shape)
        cand = gather_state(cost, e_in_src) + e_in_w - acoustic_scale * ac
        new = jnp.min(cand, axis=-1)
        new = jnp.concatenate([new, jnp.full((B, 1), INF, new.dtype)],
                              axis=1)
        new = eps_close(new)
        return new, new

    final_cost, costs = jax.lax.scan(step, cost0,
                                     jnp.swapaxes(loglikes, 0, 1))
    costs = jnp.concatenate([cost0[:, None], jnp.swapaxes(costs, 0, 1)],
                            axis=1)
    return costs


class BatchedViterbi:
    """Batched exact Viterbi for a SHARED graph over many utterances
    (decode) or per-utterance graphs (alignment)."""

    def __init__(self, graphs, tid_to_pdf: np.ndarray,
                 acoustic_scale: float = 1.0):
        if isinstance(graphs, VectorFst):
            graphs = [graphs]
        self.shared = len(graphs) == 1
        self.packed = [pack_graph(g) for g in graphs]
        self.tid_to_pdf = np.asarray(tid_to_pdf, np.int64)
        self.acoustic_scale = acoustic_scale

    def _prepare(self, B: int):
        from kaldi_tpu.ops.pallas_viterbi import build_incoming_table
        gs = self.packed if not self.shared else self.packed * B
        gs = gs[:B]
        S = max(g.num_states for g in gs) + 1  # +1 dead state
        padded = [g.padded(S, max(1, max(len(g.e_src) for g in gs)),
                           max(1, max(len(g.ne_src) for g in gs)))
                  for g in gs]
        # padded incoming-arc tables per lane (common K across lanes)
        tables = []
        for g in padded:
            e_pdf = self.tid_to_pdf[np.clip(g.e_ilabel, 0,
                                            len(self.tid_to_pdf) - 1)]
            e_tab = build_incoming_table(S, g.e_src, g.e_dst, g.e_weight,
                                         e_pdf.astype(np.int32))
            ne_tab = build_incoming_table(S, g.ne_src, g.ne_dst,
                                          g.ne_weight,
                                          np.zeros_like(g.ne_src))
            tables.append((e_tab, ne_tab))
        KE = max(t[0][3] for t in tables)
        KN = max(t[1][3] for t in tables)

        def pad_k(arr, K, fill):
            S_, k = arr.shape
            if k == K:
                return arr
            out = np.full((S_, K), fill, arr.dtype)
            out[:, :k] = arr
            return out

        e_in_src = np.stack([pad_k(t[0][0], KE, S) for t in tables])
        e_in_w = np.stack([pad_k(t[0][1], KE, INF) for t in tables])
        e_in_pdf = np.stack([pad_k(t[0][2], KE, 0) for t in tables])
        ne_in_src = np.stack([pad_k(t[1][0], KN, S) for t in tables])
        ne_in_w = np.stack([pad_k(t[1][1], KN, INF) for t in tables])

        init = np.full((B, S + 1), INF, np.float32)
        for b, g in enumerate(padded):
            init[b, g.start] = 0.0
        eps_iters = max(g.eps_depth for g in padded)
        arrays = dict(e_in_src=e_in_src, e_in_w=e_in_w, e_in_pdf=e_in_pdf,
                      ne_in_src=ne_in_src, ne_in_w=ne_in_w, init_cost=init)
        return padded, arrays, S, eps_iters

    def run(self, loglikes: np.ndarray, lengths: Optional[Sequence[int]] = None
            ) -> List[Optional[Tuple[List[int], List[int], float]]]:
        """loglikes: (B, T, P) (padded); returns per-utterance
        (alignment, words, cost)."""
        loglikes = np.asarray(loglikes, np.float32)
        B, T, P = loglikes.shape
        if lengths is None:
            lengths = [T] * B
        padded, arrays, S, eps_iters = self._prepare(B)
        costs = np.asarray(_viterbi_device(
            jnp.asarray(loglikes), self.acoustic_scale,
            **{k: jnp.asarray(v) for k, v in arrays.items()},
            num_states=S, eps_iters=eps_iters))[:, :, :S]
        out = []
        for b in range(B):
            out.append(self._traceback(padded[b], costs[b],
                                       loglikes[b], lengths[b]))
        return out

    def _traceback(self, g: DeviceGraph, costs: np.ndarray,
                   loglikes: np.ndarray, T: int):
        """Recover the best path from per-frame post-closure cost tables
        by cost-consistency."""
        final_tot = costs[T] + g.final
        s = int(np.argmin(final_tot))
        best_cost = float(final_tot[s])
        if best_cost >= INF / 2:
            warn("batched viterbi: no final state reachable")
            return None
        tol = 1e-3
        rev: List[Tuple[int, int]] = []  # (ilabel, olabel)

        def relax_ne_into(cost_vec, state, budget):
            """Follow eps arcs backwards within a frame while consistent."""
            nonlocal rev
            steps = 0
            cur = state
            while steps < budget:
                cands = np.nonzero(g.ne_dst == cur)[0]
                if cands.size == 0:
                    return cur
                pre = cost_vec[g.ne_src[cands]] + g.ne_weight[cands]
                k = int(np.argmin(np.abs(pre - cost_vec[cur])))
                if abs(pre[k] - cost_vec[cur]) > tol:
                    return cur
                a = cands[k]
                if g.ne_olabel[a] != 0:
                    rev.append((0, int(g.ne_olabel[a])))
                cur = int(g.ne_src[a])
                steps += 1
            return cur

        for t in range(T, 0, -1):
            s = relax_ne_into(costs[t], s, g.eps_depth)
            # find the emitting arc into s consistent with costs[t-1]
            cands = np.nonzero(g.e_dst == s)[0]
            if cands.size == 0:
                warn("batched viterbi traceback failed (no emitting arc)")
                return None
            pdfs = self.tid_to_pdf[np.clip(g.e_ilabel[cands], 0,
                                           len(self.tid_to_pdf) - 1)]
            ac = -self.acoustic_scale * loglikes[t - 1, pdfs]
            pre = costs[t - 1][g.e_src[cands]] + g.e_weight[cands] + ac
            k = int(np.argmin(np.abs(pre - costs[t][s])))
            a = cands[k]
            rev.append((int(g.e_ilabel[a]), int(g.e_olabel[a])))
            s = int(g.e_src[a])
        relax_ne_into(costs[0], s, g.eps_depth)
        rev.reverse()
        ali = [il for il, ol in rev if il != 0]
        words = [ol for il, ol in rev if ol != 0]
        return ali, words, best_cost
