"""Dense-relaxation batched device decoder: exact Viterbi over large
decoding graphs as fixed-shape gather/min programs.

TPU-native replacement for the cudadecoder batched beam search
(reference: src/cudadecoder/cuda-decoder.h:171 lanes/channels,
cuda-decoder-kernels.h:80-196 ExpandArcs/hashmap-dedup/histogram-beam).
Where the CUDA design keeps a dynamic token frontier with hashtable
dedup and adaptive beams, the TPU design keeps the WHOLE cost vector
dense and relaxes every state's in-arcs each frame:

    next_cost[s] = min_d  cost[src[s,d]] + w[s,d] + am_t[pdf[s,d]]

This removes every data-dependent structure from the hot loop: no
sorts, no hashing, no beams — one fused row-gather (the measured fast
path on this TPU stack: one big gather of the concatenated [cost; am]
table is ~2x faster than two separate gathers) plus a min-reduction
over the in-degree axis, all static shapes inside one lax.scan. Exact
Viterbi falls out for free (a beam search is an approximation of this).

Build-time transformations that make the graph dense-friendly:

  * EPSILON REMOVAL: eps arcs are composed into emitting arcs by
    closure (the eps subgraph must be a DAG, as the reference assumes
    post-rmepslocal); olabel strings of closure paths are kept on the
    HOST side per arc, so the device tables stay (src, pdf, weight).
    Initial closure costs/olabels and effective final costs fold in
    the same way.
  * IN-DEGREE TIERING (ELL/HYB): states are renumbered contiguously by
    in-degree bucket so each tier is a (S_t, D_t) padded table and the
    per-tier results concatenate back — no scatter anywhere.

Lanes (cudadecoder terminology) = the B axis; cost is laid out (S, B)
so the gather fetches B-wide rows (the TPU-friendly access pattern).

Traceback is two-pass (rematerialized, like the reference's
device-tokens->host-lattice split, batched-threaded pipelines keep
search on device and assembly on host):

  pass 1  forward over all T frames, checkpointing the cost vector
          every `chunk` frames (device-resident);
  pass 2  per chunk in reverse: recompute the chunk forward, keep the
          int16 argmin slot per (frame, state), then follow the
          pointers backward on device. Only the (T, B) chosen-arc ids
          are transferred to the host, which maps them to words.

The traceback is self-consistent within pass 2 (it follows argmins of
its own recomputation), so no floating-point consistency tolerance is
needed anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError, log, vlog, warn
from kaldi_tpu.fstext.fst import EPS, TropicalWeight, VectorFst

INF = np.float32(1e30)

# in-degree bucket capacities (last bucket is extended to the true max);
# fine-grained low buckets keep the padded-slot count (= gather size,
# the per-frame cost driver) close to the true arc count
_TIER_CAPS = (2, 4, 8, 16, 32, 64, 128, 512, 4096)


def _eps_closure(fst: VectorFst, max_expansion: int = 64
                 ) -> List[List[Tuple[int, float, Tuple[int, ...]]]]:
    """Per state: list of (dst, cost, olabels) for all eps paths from
    the state, including the empty path. Eps subgraph must be a DAG."""
    S = fst.num_states
    eps_arcs: List[List] = [[] for _ in range(S)]
    order_ready = True
    for s in range(S):
        for a in fst.arcs[s]:
            if a.ilabel == EPS:
                eps_arcs[s].append(a)
    # topological order of the eps subgraph
    indeg = np.zeros(S, np.int64)
    for s in range(S):
        for a in eps_arcs[s]:
            indeg[a.nextstate] += 1
    from collections import deque
    dq = deque(np.nonzero(indeg == 0)[0].tolist())
    topo: List[int] = []
    while dq:
        s = dq.popleft()
        topo.append(s)
        for a in eps_arcs[s]:
            indeg[a.nextstate] -= 1
            if indeg[a.nextstate] == 0:
                dq.append(a.nextstate)
    if len(topo) < S and any(eps_arcs[s] for s in range(S)):
        raise KaldiTpuError("dense_relax: epsilon cycle in graph")
    closure: List[List[Tuple[int, float, Tuple[int, ...]]]] = \
        [[] for _ in range(S)]
    for s in reversed(topo):
        # keep per-destination minimum cost only
        best: Dict[int, Tuple[float, Tuple[int, ...]]] = {s: (0.0, ())}
        for a in eps_arcs[s]:
            lab = (a.olabel,) if a.olabel else ()
            for (d2, c2, o2) in closure[a.nextstate]:
                c = float(a.weight) + c2
                if d2 not in best or c < best[d2][0]:
                    best[d2] = (c, lab + o2)
        if len(best) > max_expansion:
            # keep the cheapest targets; drop the tail with a warning
            items = sorted(best.items(), key=lambda kv: kv[1][0])
            best = dict(items[:max_expansion])
            warn(f"dense_relax: eps closure of state {s} truncated to "
                 f"{max_expansion} targets")
        closure[s] = [(d, c, o) for d, (c, o) in best.items()]
    return closure


@dataclass
class DenseDeviceGraph:
    """Tiered in-arc tables over renumbered states (device side) plus
    host-side label/metadata for traceback assembly."""
    # per tier: (src (S_t, D_t) int32, pdf (S_t, D_t) int32,
    #            w (S_t, D_t) f32) in renumbered ids; padded entries
    # have src=0, pdf=0, w=INF
    tiers: List[Tuple[np.ndarray, np.ndarray, np.ndarray]]
    # flat per-state arc records, concatenated in renumbered-state
    # order: offsets (S+1,), src_flat, ilabel_flat, and olabel tuples
    row_offset: np.ndarray       # (S+1,) int64 into flat arc arrays
    src_flat: np.ndarray         # (A,) int32 renumbered src
    ilabel_flat: np.ndarray      # (A,) int32 original ilabel (tid)
    olabels_flat: List[Tuple[int, ...]]  # per arc olabel string
    init_cost: np.ndarray        # (S,) f32 closure costs from start
    init_olabels: List[Tuple[int, ...]]  # per state
    final_cost: np.ndarray       # (S,) f32 effective final costs
    final_olabels: List[Tuple[int, ...]]
    perm: np.ndarray             # old id -> new id
    inv_perm: np.ndarray         # new id -> old id
    num_pdfs: int

    @property
    def num_states(self) -> int:
        return len(self.init_cost)

    @classmethod
    def build(cls, fst: VectorFst, tid2pdf: Sequence[int],
              num_pdfs: Optional[int] = None) -> "DenseDeviceGraph":
        tid2pdf = np.asarray(tid2pdf, np.int32)
        S = fst.num_states
        closure = _eps_closure(fst)
        # eps-removed emitting in-arc lists per ORIGINAL destination:
        # (src, pdf, weight, ilabel, olabels)
        in_arcs: List[List[Tuple[int, int, float, int, Tuple[int, ...]]]] = \
            [[] for _ in range(S)]
        for s in range(S):
            for a in fst.arcs[s]:
                if a.ilabel == EPS:
                    continue
                pdf = int(tid2pdf[a.ilabel])
                lab = (a.olabel,) if a.olabel else ()
                for (d2, c2, o2) in closure[a.nextstate]:
                    in_arcs[d2].append((s, pdf, float(a.weight) + c2,
                                        a.ilabel, lab + o2))
        # initial closure from start; effective finals through closure
        init_cost = np.full(S, INF, np.float32)
        init_olabels: List[Tuple[int, ...]] = [() for _ in range(S)]
        for (d, c, o) in closure[fst.start]:
            if c < init_cost[d]:
                init_cost[d] = c
                init_olabels[d] = o
        final_cost = np.full(S, INF, np.float32)
        final_olabels: List[Tuple[int, ...]] = [() for _ in range(S)]
        raw_final = np.array(
            [float(w) if w != TropicalWeight.zero else INF
             for w in fst.finals], np.float32)
        for s in range(S):
            for (d, c, o) in closure[s]:
                tot = c + raw_final[d]
                if tot < final_cost[s]:
                    final_cost[s] = tot
                    final_olabels[s] = o

        # tier assignment by in-degree; renumber contiguously per tier
        indeg = np.array([len(a) for a in in_arcs], np.int64)
        max_indeg = int(indeg.max()) if S else 0
        if max_indeg > 32767:
            raise KaldiTpuError(
                f"dense_relax: state in-degree {max_indeg} exceeds the "
                "int16 traceback-slot limit")
        caps = [c for c in _TIER_CAPS if c < max_indeg] + [max(max_indeg, 1)]
        tier_of = np.searchsorted(np.asarray(caps), indeg, side="left")
        order = np.argsort(tier_of, kind="stable")
        perm = np.empty(S, np.int64)
        perm[order] = np.arange(S)
        inv_perm = order

        tiers: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        row_offset = np.zeros(S + 1, np.int64)
        src_flat: List[int] = []
        ilabel_flat: List[int] = []
        olabels_flat: List[Tuple[int, ...]] = []
        new_id = 0
        for ti, cap in enumerate(caps):
            members = order[tier_of[order] == ti]
            St = len(members)
            if St == 0:
                tiers.append((np.zeros((0, cap), np.int32),
                              np.zeros((0, cap), np.int32),
                              np.full((0, cap), INF, np.float32)))
                continue
            src = np.zeros((St, cap), np.int32)
            pdf = np.zeros((St, cap), np.int32)
            w = np.full((St, cap), INF, np.float32)
            for r, old in enumerate(members):
                arcs = in_arcs[old]
                for d, (a_src, a_pdf, a_w, a_il, a_ol) in enumerate(arcs):
                    src[r, d] = perm[a_src]
                    pdf[r, d] = a_pdf
                    w[r, d] = a_w
                    src_flat.append(perm[a_src])
                    ilabel_flat.append(a_il)
                    olabels_flat.append(a_ol)
            tiers.append((src, pdf, w))
            new_id += St
        # per-state flat-arc offsets in new-id order (arcs were appended
        # in exactly this order above)
        counts = np.array([len(in_arcs[inv_perm[n]]) for n in range(S)],
                          np.int64)
        row_offset = np.concatenate([[0], np.cumsum(counts)])

        P = int(num_pdfs if num_pdfs is not None
                else (tid2pdf.max() + 1 if len(tid2pdf) else 1))
        tot_padded = sum(t[0].shape[0] * t[0].shape[1] for t in tiers)
        log(f"DenseDeviceGraph: {S} states, {len(src_flat)} eps-removed "
            f"arcs ({tot_padded} padded slots), tiers "
            f"{[(t[0].shape) for t in tiers]}, max in-degree {max_indeg}")
        return cls(tiers,
                   row_offset,
                   np.asarray(src_flat, np.int32),
                   np.asarray(ilabel_flat, np.int32),
                   olabels_flat,
                   init_cost[inv_perm].astype(np.float32),
                   [init_olabels[o] for o in inv_perm],
                   final_cost[inv_perm].astype(np.float32),
                   [final_olabels[o] for o in inv_perm],
                   perm.astype(np.int64), inv_perm.astype(np.int64), P)

    @classmethod
    def from_arrays(cls, src: np.ndarray, dst: np.ndarray,
                    pdf: np.ndarray, olabel: np.ndarray,
                    weight: np.ndarray, finals: np.ndarray, start: int,
                    ilabel: Optional[np.ndarray] = None,
                    num_pdfs: Optional[int] = None) -> "DenseDeviceGraph":
        """Vectorized constructor for large eps-free graphs given flat
        arc arrays (the CSR-pack path, reference cuda-fst.h:62 CudaFst).
        finals: (S,) costs with INF for non-final states."""
        src = np.asarray(src, np.int32)
        dst = np.asarray(dst, np.int32)
        pdf = np.asarray(pdf, np.int32)
        olabel = np.asarray(olabel, np.int32)
        weight = np.asarray(weight, np.float32)
        finals = np.asarray(finals, np.float32)
        if ilabel is None:
            ilabel = pdf
        ilabel = np.asarray(ilabel, np.int32)
        S = len(finals)
        A = len(src)
        indeg = np.bincount(dst, minlength=S).astype(np.int64)
        max_indeg = int(indeg.max()) if S else 0
        if max_indeg > 32767:
            raise KaldiTpuError(
                f"dense_relax: state in-degree {max_indeg} exceeds the "
                "int16 traceback-slot limit")
        caps = ([c for c in _TIER_CAPS if c < max_indeg]
                + [max(max_indeg, 1)])
        tier_of = np.searchsorted(np.asarray(caps), indeg, side="left")
        order = np.argsort(tier_of, kind="stable")      # new-id order
        perm = np.empty(S, np.int64)
        perm[order] = np.arange(S)

        # sort arcs by (new dst id, stable) and compute slot ranks
        new_dst = perm[dst]
        arc_order = np.argsort(new_dst, kind="stable")
        nd_sorted = new_dst[arc_order]
        # slot index within each state's run
        first_of_run = np.concatenate([[0], np.cumsum(
            np.bincount(nd_sorted, minlength=S))[:-1]])
        slot = np.arange(A) - first_of_run[nd_sorted]

        tiers: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        tier_row0 = {}
        row = 0
        for ti, cap in enumerate(caps):
            members = np.nonzero(tier_of[order] == ti)[0]  # new ids
            St = len(members)
            tier_row0[ti] = (row, cap)
            tsrc = np.zeros((St, cap), np.int32)
            tpdf = np.zeros((St, cap), np.int32)
            tw = np.full((St, cap), INF, np.float32)
            tiers.append((tsrc, tpdf, tw))
            row += St
        # fill tiers vectorized: each arc's (tier, local row, slot)
        arc_tier = tier_of[order][nd_sorted]
        for ti, cap in enumerate(caps):
            m = arc_tier == ti
            if not m.any():
                continue
            r0, _cap = tier_row0[ti]
            rows_local = nd_sorted[m] - r0
            sl = slot[m]
            ids = arc_order[m]
            tsrc, tpdf, tw = tiers[ti]
            tsrc[rows_local, sl] = perm[src[ids]]
            tpdf[rows_local, sl] = pdf[ids]
            tw[rows_local, sl] = weight[ids]

        row_offset = np.concatenate(
            [[0], np.cumsum(indeg[order])]).astype(np.int64)
        src_flat = perm[src[arc_order]].astype(np.int32)
        ilabel_flat = ilabel[arc_order]
        ol_sorted = olabel[arc_order]
        olabels_flat = [(int(o),) if o else () for o in ol_sorted]

        init_cost = np.full(S, INF, np.float32)
        init_cost[perm[start]] = 0.0
        P = int(num_pdfs if num_pdfs is not None else pdf.max() + 1)
        log(f"DenseDeviceGraph.from_arrays: {S} states, {A} arcs, tiers "
            f"{[t[0].shape for t in tiers]}, max in-degree {max_indeg}")
        empty: List[Tuple[int, ...]] = [()] * S
        return cls(tiers, row_offset, src_flat, ilabel_flat, olabels_flat,
                   init_cost, list(empty), finals[order].astype(np.float32),
                   list(empty), perm, order.astype(np.int64), P)


class DenseViterbiDecoder:
    """Batched exact Viterbi over a DenseDeviceGraph.

    decode_batch(loglikes (B, T, P)) -> per-lane (words, ilabels,
    total_cost) — the words are olabels along the best path, ilabels
    the per-frame input labels (transition-ids for HCLG graphs)."""

    def __init__(self, graph: DenseDeviceGraph, chunk: int = 32):
        self.g = graph
        self.chunk = int(chunk)
        S = graph.num_states
        # fused gather index: all tier (src, pdf) slots; pdf indices
        # offset by S into the concatenated [cost; am_t] table
        idx_parts = []
        for (src, pdf, _w) in graph.tiers:
            idx_parts.append(src.reshape(-1))
        for (src, pdf, _w) in graph.tiers:
            idx_parts.append(pdf.reshape(-1) + S)
        self._idx = jnp.asarray(np.concatenate(idx_parts).astype(np.int32))
        self._w = [jnp.asarray(t[2]) for t in graph.tiers]
        self._n_slots = sum(t[0].shape[0] * t[0].shape[1]
                            for t in graph.tiers)
        self._init_cost = jnp.asarray(graph.init_cost)
        self._final_cost = jnp.asarray(graph.final_cost)
        self._row_offset = jnp.asarray(graph.row_offset.astype(np.int32))
        self._src_flat = jnp.asarray(graph.src_flat)
        # per-state tier slot table start (for argmin slot -> flat arc id
        # we use row_offset, since arcs are stored per state in slot order)
        self._jit_cache: Dict = {}

    # -- device programs ----------------------------------------------------

    def _relax(self, cost: jnp.ndarray, am_t: jnp.ndarray,
               with_argmin: bool):
        """cost (S, B), am_t (P, B) -> new cost (S, B) [+ argmin slots]."""
        g = self.g
        tab = jnp.concatenate([cost, am_t], axis=0)
        rows = tab[self._idx]                      # (2*n_slots, B)
        n = self._n_slots
        costs_g, am_g = rows[:n], rows[n:]
        parts = []
        amins = []
        off = 0
        B = cost.shape[1]
        for ti, (src, pdf, _w) in enumerate(g.tiers):
            St, Dt = src.shape
            if St == 0:
                continue
            c = costs_g[off:off + St * Dt].reshape(St, Dt, B)
            e = am_g[off:off + St * Dt].reshape(St, Dt, B)
            cand = c + self._w[ti][:, :, None] + e
            parts.append(cand.min(axis=1))
            if with_argmin:
                amins.append(cand.argmin(axis=1).astype(jnp.int16))
            off += St * Dt
        new = jnp.concatenate(parts, axis=0)
        if with_argmin:
            return new, jnp.concatenate(amins, axis=0)
        return new

    def _full_fns(self, n_chunks: int, C: int):
        """Whole-utterance forward and backward as single programs
        (one device dispatch each; per-chunk host calls would serialize
        on dispatch latency through the device tunnel)."""
        key = (n_chunks, C)
        if key in self._jit_cache:
            return self._jit_cache[key]
        n_arcs = int(self.g.src_flat.shape[0])

        def chunk_fwd(cost, xs):
            am_c, act_c = xs           # (C, P, B), (C, B)

            def step(c, x):
                am_t, act = x
                new = self._relax(c, am_t, with_argmin=False)
                return jnp.where(act[None, :], new, c), None

            new, _ = jax.lax.scan(step, cost, (am_c, act_c))
            return new, cost           # emit the chunk-START checkpoint

        def forward(cost0, am, active):
            am_r = am.reshape(n_chunks, C, *am.shape[1:])
            act_r = active.reshape(n_chunks, C, -1)
            last, ckpts = jax.lax.scan(chunk_fwd, cost0, (am_r, act_r))
            return last, ckpts

        def chunk_bwd(cur, xs):
            ckpt, am_c, act_c = xs

            def step(c, x):
                am_t, act = x
                new, amin = self._relax(c, am_t, with_argmin=True)
                return jnp.where(act[None, :], new, c), amin

            _last, amins = jax.lax.scan(step, ckpt, (am_c, act_c))
            B = cur.shape[0]
            lane = jnp.arange(B)

            def follow(cur_s, x):
                amin_t, act = x
                slot = amin_t[cur_s, lane].astype(jnp.int32)
                arc = self._row_offset[cur_s] + slot
                # clip: padded-slot argmins (unreachable lanes) must
                # not index out of the flat arc array
                src = self._src_flat[jnp.clip(arc, 0, n_arcs - 1)]
                arc = jnp.where(act, arc, -1)
                return jnp.where(act, src, cur_s), arc

            cur_out, arcs = jax.lax.scan(follow, cur,
                                         (amins, act_c), reverse=True)
            return cur_out, arcs       # arcs (C, B) in frame order

        def backward(ckpts, am, active, cur):
            am_r = am.reshape(n_chunks, C, *am.shape[1:])
            act_r = active.reshape(n_chunks, C, -1)
            first, arcs = jax.lax.scan(chunk_bwd, cur,
                                       (ckpts, am_r, act_r), reverse=True)
            return first, arcs.reshape(n_chunks * C, -1)

        fns = (jax.jit(forward), jax.jit(backward))
        self._jit_cache[key] = fns
        return fns

    # -- public API ----------------------------------------------------------

    def decode_batch(self, loglikes: np.ndarray,
                     acoustic_scale: float = 0.1,
                     lengths: Optional[Sequence[int]] = None
                     ) -> List[Optional[Tuple[List[int], List[int], float]]]:
        """loglikes: (B, T, P) log-likelihood scores (device or host
        array). Returns per lane (olabels, ilabels, total_cost) of the
        exact Viterbi path, or None if no final state is reachable."""
        g = self.g
        S = g.num_states
        B, T, P = loglikes.shape
        if P < g.num_pdfs:
            raise KaldiTpuError(
                f"dense_relax: loglikes pdf dim {P} < graph {g.num_pdfs}")
        lengths = np.asarray(lengths if lengths is not None
                             else [T] * B, np.int64)
        # pad T to a multiple of the chunk (padding frames inactive)
        C = min(self.chunk, T) if T else 1
        n_chunks = max(1, -(-T // C))
        T_pad = n_chunks * C
        # (T_pad, P, B) acoustic costs
        am = jnp.transpose(jnp.asarray(loglikes) * (-acoustic_scale),
                           (1, 2, 0))
        if T_pad > T:
            am = jnp.pad(am, ((0, T_pad - T), (0, 0), (0, 0)))
        active = jnp.asarray(
            np.arange(T_pad)[:, None] < lengths[None, :])

        fwd, bwd = self._full_fns(n_chunks, C)
        cost0 = jnp.tile(self._init_cost[:, None], (1, B))
        cost, ckpts = fwd(cost0, am, active)

        # best final per lane
        total = cost + self._final_cost[:, None]
        best_state = jnp.argmin(total, axis=0)
        best_cost = jnp.min(total, axis=0)

        # pass 2: recompute chunks in reverse, follow pointers on device
        first_state, arcs_all_dev = bwd(ckpts, am, active, best_state)
        best_state_np = np.asarray(best_state)
        best_cost_np = np.asarray(best_cost)
        arcs_all = np.asarray(arcs_all_dev)
        first_state = np.asarray(first_state)

        out: List[Optional[Tuple[List[int], List[int], float]]] = []
        for b in range(B):
            if best_cost_np[b] >= INF / 2:
                out.append(None)
                continue
            words: List[int] = list(g.init_olabels[int(first_state[b])])
            ilabels: List[int] = []
            for t in range(int(lengths[b])):
                a = int(arcs_all[t, b])
                if a < 0:
                    continue
                ilabels.append(int(g.ilabel_flat[a]))
                words.extend(g.olabels_flat[a])
            words.extend(g.final_olabels[int(best_state_np[b])])
            out.append((words, ilabels, float(best_cost_np[b])))
        return out

    def decode(self, loglikes: np.ndarray, acoustic_scale: float = 0.1
               ) -> Optional[Tuple[List[int], List[int], float]]:
        """Single-utterance decode: loglikes (T, P)."""
        return self.decode_batch(loglikes[None], acoustic_scale)[0]
