"""Block-chain device decoder: gather-free exact Viterbi for
lexicon-shaped decoding graphs, as a Pallas TPU kernel.

This is the TPU answer to the cudadecoder batched beam search
(reference src/cudadecoder/cuda-decoder.h:171, cuda-decoder-kernels.h:
80-196).  Where dense_relax.py handles ARBITRARY eps-free graphs with
one big fused gather (bandwidth-limited by XLA's gather, ~25% of HBM
peak), this module co-designs the GRAPH LAYOUT with the kernel so the
hot loop contains no gather at all:

  * the graph is the direct HCLG of graph_direct.py (bigram LM x
    lexicon x 1-state chain topology, reorder=true H expansion), but
    pronunciations are stored as UNSHARED linear chains bucketed by
    pronunciation length instead of a prefix trie;
  * states are laid out (context u, chain row n) so that within a
    context block the Viterbi in-arc sources are: the row itself
    (self-loop), the PREVIOUS row (next phone of the same word), or
    the block's root (word start) — i.e. relaxation = roll(1) + min;
  * word-end rows of each length bucket sit at a fixed stride, so the
    cross-block word-transition candidates are strided slices, and the
    per-frame cross-block reduction (into the V word-root states) is a
    running min in VMEM scratch across the sequential grid.

Per frame the kernel streams each (N, B) context block HBM->VMEM->HBM
exactly once: pure sequential traffic, no sorts, no hashing, no
gathers, exact Viterbi.

Traceback is SINGLE-PASS: every state's per-frame winner is one bit
(forward vs self-loop), bit-packed 8 states/byte inside the kernel
(root states store the winning context as an int32 plane).  For B=64
lanes this is S*B/8 bytes per frame — small enough to keep the whole
utterance's decisions resident in HBM, so no checkpoint/recompute
backward pass is needed (compare dense_relax.py's two-pass remat).
A device-side follow pass walks the bits backward and only the (T, B)
state trajectory reaches the host.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError, log

LN2 = float(np.log(2.0))
INF = np.float32(1e30)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pdf_hash(a: np.ndarray, b: np.ndarray, num_pdfs: int,
              salt: int) -> np.ndarray:
    h = (np.asarray(a, np.uint64) * np.uint64(2654435761)
         + np.asarray(b, np.uint64) * np.uint64(40503)
         + np.uint64(salt) * np.uint64(97))
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return ((h >> np.uint64(17)) % np.uint64(num_pdfs)).astype(np.int32)


@dataclass
class BlockChainGraph:
    """Direct HCLG in block-chain layout.

    States: chain rows id = u*N + n for u in [0, U), n in [0, N);
    roots id = U*N + u (u < V: word-u root; u = V: sentence begin).
    N is padded to a multiple of 8 with inert rows."""
    prons: List[np.ndarray]          # per word, 1-based phone ids
    bigram: np.ndarray               # (U, V) -log P(w|u), U = V+1
    eos_cost: np.ndarray             # (V,)
    num_pdfs: int
    # derived (set by build):
    word_order: np.ndarray = field(default=None)   # layout word index -> word
    N: int = 0                       # padded rows per block
    n_true: int = 0
    row_word: np.ndarray = field(default=None)     # (N,) layout word (or -1)
    row_pos: np.ndarray = field(default=None)      # (N,) j within chain
    row_phone: np.ndarray = field(default=None)    # (N,) phone (0 pad)
    row_is_first: np.ndarray = field(default=None)  # (N,) bool, j == 0
    end_row: np.ndarray = field(default=None)      # (V,) chain-end row, -1 k=1
    seg_lens: List[Tuple[int, int, int]] = field(default_factory=list)
    # pdf tables
    pdf_fwd_row: np.ndarray = field(default=None)   # (N,)
    pdf_self_row: np.ndarray = field(default=None)  # (N,)
    pdf_wend_fwd: np.ndarray = field(default=None)  # (V,) word-end fwd pdf
    pdf_root_self: np.ndarray = field(default=None)  # (V,)

    @property
    def V(self) -> int:
        return len(self.prons)

    @property
    def U(self) -> int:
        return self.V + 1

    @property
    def num_states(self) -> int:
        return self.U * self.N + self.U

    @classmethod
    def build(cls, prons: Sequence[np.ndarray], bigram: np.ndarray,
              eos_cost=2.0, num_pdfs: int = 3456) -> "BlockChainGraph":
        V = len(prons)
        if bigram.shape != (V + 1, V):
            raise KaldiTpuError(f"bigram shape {bigram.shape}")
        prons = [np.asarray(p, np.int32) for p in prons]
        if any(len(p) < 1 for p in prons):
            raise KaldiTpuError("empty pronunciation")
        eos = np.broadcast_to(np.asarray(eos_cost, np.float32), (V,)).copy()
        g = cls(prons=list(prons), bigram=np.asarray(bigram, np.float32),
                eos_cost=eos, num_pdfs=num_pdfs)
        lens = np.array([len(p) for p in prons])
        # layout order: words sorted by pron length (stable)
        order = np.argsort(lens, kind="stable")
        g.word_order = order.astype(np.int32)
        row_word, row_pos, row_phone = [], [], []
        end_row = np.full(V, -1, np.int64)
        seg_lens = []
        off = 0
        for k in sorted(set(lens.tolist())):
            members = order[lens[order] == k]
            if k == 1:
                continue           # no chain rows
            for w in members:
                p = prons[w]
                for j in range(k - 1):
                    row_word.append(w)
                    row_pos.append(j)
                    row_phone.append(int(p[j]))
                end_row[w] = off + (k - 1) - 1
                off += k - 1
            seg_lens.append((k, len(members),
                             off - len(members) * (k - 1)))
        n_true = off
        N = max(8, _round_up(n_true, 8))
        pad = N - n_true
        row_word += [-1] * pad
        row_pos += [0] * pad
        row_phone += [0] * pad
        g.N = N
        g.n_true = n_true
        g.row_word = np.asarray(row_word, np.int32)
        g.row_pos = np.asarray(row_pos, np.int32)
        g.row_phone = np.asarray(row_phone, np.int32)
        g.row_is_first = (g.row_pos == 0) & (g.row_word >= 0)
        g.end_row = end_row
        g.seg_lens = seg_lens
        # pdfs: forward pdf of row (u,n) = consuming phone row_phone[n]
        # entering (w, j) — hash on (phone, word*16+pos) to mimic a
        # context-dependent tree's granularity
        ctxkey = g.row_word.astype(np.int64) * 16 + g.row_pos
        g.pdf_fwd_row = _pdf_hash(g.row_phone, ctxkey, num_pdfs, salt=1)
        g.pdf_self_row = _pdf_hash(g.row_phone, ctxkey, num_pdfs, salt=2)
        last_phone = np.array([int(p[-1]) for p in prons], np.int32)
        wkey = np.arange(V, dtype=np.int64) * 16 + 15
        g.pdf_wend_fwd = _pdf_hash(last_phone, wkey, num_pdfs, salt=1)
        g.pdf_root_self = _pdf_hash(last_phone, wkey, num_pdfs, salt=2)
        log(f"BlockChainGraph: V={V}, N={N} rows/block x {V + 1} blocks "
            f"+ {V + 1} roots = {g.num_states} states")
        return g

    # -- tids (forward tid = pdf+1, self-loop tid = num_pdfs+pdf+1) ------
    def fwd_tid(self, pdf: int) -> int:
        return int(pdf) + 1

    def self_tid(self, pdf: int) -> int:
        return self.num_pdfs + int(pdf) + 1

    @property
    def tid2pdf(self) -> np.ndarray:
        return np.concatenate([[0], np.arange(self.num_pdfs),
                               np.arange(self.num_pdfs)]).astype(np.int32)

    def to_flat_graph(self):
        """Equivalent FlatGraph (for host decoders / cross-tests).
        State numbering identical to the device layout."""
        from kaldi_tpu.decoder.graph_direct import FlatGraph
        U, N, V = self.U, self.N, self.V
        root0 = U * N
        src, dst, ilab, olab, wgt = [], [], [], [], []

        def add(s, d, tid, ol, w):
            src.append(s)
            dst.append(d)
            ilab.append(tid)
            olab.append(ol)
            wgt.append(w)

        for u in range(U):
            base = u * N
            for n in range(self.n_true):
                w = int(self.row_word[n])
                j = int(self.row_pos[n])
                s = base + n
                # self-loop
                add(s, s, self.self_tid(self.pdf_self_row[n]), 0, LN2)
                # in-arc (fwd): from previous row or root u
                p = base + n - 1 if j > 0 else root0 + u
                add(p, s, self.fwd_tid(self.pdf_fwd_row[n]), 0, LN2)
            # word transitions into each root w
            for w in range(V):
                e = int(self.end_row[w])
                s = base + e if e >= 0 else root0 + u
                add(s, root0 + w, self.fwd_tid(self.pdf_wend_fwd[w]),
                    w + 1, float(self.bigram[u, w]) + LN2)
        for w in range(V):
            r = root0 + w
            add(r, r, self.self_tid(self.pdf_root_self[w]), 0, LN2)
        S = U * N + U
        finals = np.full(S, INF, np.float32)
        finals[root0:root0 + V] = self.eos_cost
        words = ["<eps>"] + [f"W{w:05d}" for w in range(V)]
        return FlatGraph(np.asarray(src, np.int32), np.asarray(dst, np.int32),
                         np.asarray(ilab, np.int32), np.asarray(olab, np.int32),
                         np.asarray(wgt, np.float32), finals,
                         start=root0 + V, tid2pdf=self.tid2pdf,
                         num_pdfs=self.num_pdfs, words=words)


class BlockChainDecoder:
    """Batched exact Viterbi over a BlockChainGraph via the gather-free
    Pallas block kernel.  decode_batch(loglikes (B,T,P)) -> per lane
    (words, tids, cost)."""

    def __init__(self, graph: BlockChainGraph, interpret: bool = False):
        import jax.numpy as jnp
        g = graph
        self.g = g
        self.interpret = interpret
        U, V, N = g.U, g.V, g.N
        self.Vp = _round_up(max(V, 8), 8)
        self.Up = _round_up(U, 8)
        # device constants
        self._first = jnp.asarray(g.row_is_first[:, None])       # (N,1)
        self._alive = jnp.asarray((g.row_word >= 0)[:, None])    # (N,1)
        big = np.full((self.Up, self.Vp), INF, np.float32)
        big[:U, :V] = g.bigram + LN2
        self._bigram = jnp.asarray(big)
        # segment end-slices: list of (row_offset, V_k, k-1) for k>=2,
        # and layout indices of those words; k==1 words use the root
        self._segs = [(off, vk, k - 1) for (k, vk, off) in g.seg_lens]
        order = g.word_order
        lens = np.array([len(p) for p in g.prons])
        self._k1_words = order[lens[order] == 1].astype(np.int32)
        segw = [order[lens[order] == k].astype(np.int32)
                for (k, vk, off) in g.seg_lens]
        self._seg_words = segw
        # map: position in kernel 'ends' vector -> word id
        ends_words = np.concatenate([self._k1_words] + segw) \
            if (len(self._k1_words) or segw) else np.zeros(0, np.int32)
        assert len(ends_words) == V
        self._ends_words = ends_words                    # (V,)
        inv = np.empty(V, np.int64)
        inv[ends_words] = np.arange(V)
        self._word_to_endpos = inv
        # bigram columns permuted to ends order, padded
        bigp = np.full((self.Up, self.Vp), INF, np.float32)
        bigp[:U, :V] = (g.bigram + LN2)[:, ends_words]
        self._bigram_ends = jnp.asarray(bigp)
        # am row indices
        self._pdf_fwd_row = jnp.asarray(g.pdf_fwd_row)
        self._pdf_self_row = jnp.asarray(g.pdf_self_row)
        self._pdf_wend_ends = jnp.asarray(
            np.pad(g.pdf_wend_fwd[ends_words], (0, self.Vp - V)))
        self._pdf_root_self = jnp.asarray(
            np.pad(g.pdf_root_self, (0, self.Vp - V)))
        eosp = np.full(self.Vp, INF, np.float32)
        eosp[:V] = g.eos_cost
        self._eos = jnp.asarray(eosp)
        self._jit = {}

    # ------------------------------------------------------------------
    def _make_step(self, B: int):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        g = self.g
        U, V, N, Vp, Up = g.U, g.V, g.N, self.Vp, self.Up
        Nb = N // 8
        segs = self._segs
        n_k1 = len(self._k1_words)

        G = 8                     # context blocks per grid step: the
        # per-step overhead (DMA issue + sequential-grid latency) was
        # the wall at ~12us/step; processing 8 blocks per step cuts
        # the sequential step count 8x for the same total traffic
        assert Up % G == 0

        def kernel(cost_ref, ovr_ref, amf_ref, ams_ref, first_ref, big_ref,
                   out_ref, bits_ref, rootexp_ref, rootarg_ref,
                   best_s, arg_s):
            ub = pl.program_id(0)
            first = first_ref[:] > 0.5
            amf = LN2 + amf_ref[:]
            ams = LN2 + ams_ref[:]
            for g_i in range(G):
                u = ub * G + g_i
                blk = cost_ref[g_i]                        # (N, B)
                root_row = ovr_ref[u][None, :]             # (1, B)
                rolled = pltpu.roll(blk, 1, 0)
                fwd_src = jnp.where(first, root_row, rolled)
                fwd_cand = fwd_src + amf
                self_cand = blk + ams
                take_fwd = fwd_cand < self_cand
                new = jnp.where(take_fwd, fwd_cand, self_cand)
                out_ref[g_i] = new
                # bit-pack decisions: bit r of byte i = row 8*i+r
                d3 = take_fwd.astype(jnp.int32).reshape(Nb, 8, B)
                w8 = (1 << jax.lax.broadcasted_iota(jnp.int32,
                                                    (Nb, 8, B), 1))
                bits_ref[g_i] = (d3 * w8).sum(axis=1).astype(jnp.uint8)
                # word-transition candidates out of this block (OLD)
                parts = [jnp.broadcast_to(root_row, (n_k1, B))] \
                    if n_k1 else []
                for (off, vk, km1) in segs:
                    seg = blk[off:off + vk * km1].reshape(vk, km1, B)
                    parts.append(seg[:, km1 - 1, :])
                if Vp > V:
                    parts.append(jnp.full((Vp - V, B), INF, jnp.float32))
                ends = jnp.concatenate(parts, axis=0)      # (Vp, B)
                cand = ends + big_ref[g_i][:, None]        # (Vp, B)

                if g_i == 0:
                    @pl.when(ub == 0)
                    def _():
                        best_s[:] = jnp.full((Vp, B), INF, jnp.float32)
                        arg_s[:] = jnp.zeros((Vp, B), jnp.int32)

                better = cand < best_s[:]
                best_s[:] = jnp.where(better, cand, best_s[:])
                arg_s[:] = jnp.where(better, u, arg_s[:])

            @pl.when(ub == pl.num_programs(0) - 1)
            def _():
                rootexp_ref[:] = best_s[:]
                rootarg_ref[:] = arg_s[:]

        grid_call = pl.pallas_call(
            kernel,
            grid=(Up // G,),
            in_specs=[
                pl.BlockSpec((G, N, B), lambda u: (u, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Vp), lambda u: (u, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((G, N, B), lambda u: (u, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Nb, B), lambda u: (u, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Up, N, B), jnp.float32),
                jax.ShapeDtypeStruct((Up, Nb, B), jnp.uint8),
                jax.ShapeDtypeStruct((Vp, B), jnp.float32),
                jax.ShapeDtypeStruct((Vp, B), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((Vp, B), jnp.float32),
                            pltpu.VMEM((Vp, B), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )

        pdf_fwd_row = self._pdf_fwd_row
        pdf_self_row = self._pdf_self_row
        pdf_wend = self._pdf_wend_ends
        pdf_root_self = self._pdf_root_self
        word_to_endpos = jnp.asarray(self._word_to_endpos.astype(np.int32))
        first_f = jnp.asarray(self.g.row_is_first.astype(np.float32)[:, None])
        bigram_ends = self._bigram_ends

        def frame(carry, x):
            cost, ovr = carry                  # (Up,N,B), (Up,B)
            am_t, act = x                      # (P,B), (B,)
            amf = am_t[pdf_fwd_row]            # (N,B)
            ams = am_t[pdf_self_row]
            new, bits, rootexp, rootarg = grid_call(
                cost, ovr, amf, ams, first_f, bigram_ends)
            # root update (ends order -> word order)
            exp_cand = rootexp + am_t[pdf_wend] + 0.0      # (Vp,B)
            exp_w = exp_cand[word_to_endpos]               # (V,B) word order
            arg_w = rootarg[word_to_endpos]
            self_c = ovr[:V] + LN2 + am_t[pdf_root_self[:V]]
            take_self = self_c <= exp_w
            root_new = jnp.where(take_self, self_c, exp_w)
            ovr_new = jnp.concatenate(
                [root_new, jnp.full((Up - V, B), INF, jnp.float32)], axis=0)
            # freeze inactive lanes
            new = jnp.where(act[None, None, :], new, cost)
            ovr_new = jnp.where(act[None, :], ovr_new, ovr)
            ys = (bits, arg_w.astype(jnp.int32), take_self)
            return (new, ovr_new), ys

        def forward(cost0, ovr0, am, active):
            (cost, ovr), ys = jax.lax.scan(frame, (cost0, ovr0),
                                           (am, active))
            return cost, ovr, ys

        # ---- follow pass (device): walk decisions backward ------------
        row_is_first = jnp.asarray(g.row_is_first)
        end_row = jnp.asarray(g.end_row.astype(np.int32))
        k1_mask = jnp.asarray(g.end_row < 0)
        root0 = U * N

        def follow(ys, active, final_state):
            bits_all, arg_all, self_all = ys
            lane = jnp.arange(B)

            def step(cur, x):
                bits, arg, selfw, act = x
                is_root = cur >= root0
                # chain-row predecessor
                u_c = jnp.clip(cur // N, 0, U - 1)
                n_c = jnp.clip(cur % N, 0, N - 1)
                byte = bits[u_c, n_c >> 3, lane].astype(jnp.int32)
                bit = (byte >> (n_c & 7)) & 1
                chain_prev = jnp.where(
                    bit == 1,
                    jnp.where(row_is_first[n_c], root0 + u_c, cur - 1),
                    cur)
                # root predecessor
                w_r = jnp.clip(cur - root0, 0, V - 1)
                u_win = arg[w_r, lane]
                is_begin = cur == root0 + V
                root_prev = jnp.where(
                    selfw[w_r, lane] | is_begin,
                    cur,
                    jnp.where(k1_mask[w_r], root0 + u_win,
                              u_win * N + end_row[w_r]))
                prev = jnp.where(is_root, root_prev, chain_prev)
                prev = jnp.where(act, prev, cur)
                return prev, cur

            first_state, states = jax.lax.scan(
                step, final_state,
                (bits_all, arg_all, self_all, active), reverse=True)
            return first_state, states

        fwd_j = jax.jit(forward, donate_argnums=(0,))
        fol_j = jax.jit(follow)
        return fwd_j, fol_j

    # ------------------------------------------------------------------
    def _make_lattice_step(self, B: int, J: int):
        """Forward pass variant for lattice generation: propagates each
        state's word-entry frame alongside its cost and collects the
        top-J (context, entry-time, cost) predecessors per (word,
        frame) on device — the equivalent of the cudadecoder token
        dumps that its host lattice workers consume
        (cuda-decoder.h GetRawLattice / lattice-postprocessor.h:73)."""
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        g = self.g
        U, V, N, Vp, Up = g.U, g.V, g.N, self.Vp, self.Up
        segs = self._segs
        n_k1 = len(self._k1_words)

        G = 4               # context blocks per grid step (VMEM:
        # the lattice variant streams 2x the planes of _make_step)
        assert Up % G == 0

        def kernel(t_ref, cost_ref, ent_ref, ovr_ref, amf_ref, ams_ref,
                   first_ref, big_ref,
                   out_ref, eout_ref, rc_ref, ru_ref, re_ref,
                   c_s, u_s, e_s):
            ub = pl.program_id(0)
            t = t_ref[0].astype(jnp.float32)
            first = first_ref[:] > 0.5
            amf = LN2 + amf_ref[:]
            ams = LN2 + ams_ref[:]
            for g_i in range(G):
                u = ub * G + g_i
                blk = cost_ref[g_i]                        # (N, B)
                ent = ent_ref[g_i]                         # (N, B) f32
                root_row = ovr_ref[u][None, :]
                rolled = pltpu.roll(blk, 1, 0)
                rolled_e = pltpu.roll(ent, 1, 0)
                fwd_src = jnp.where(first, root_row, rolled)
                fwd_ent = jnp.where(first, t, rolled_e)
                fwd_cand = fwd_src + amf
                self_cand = blk + ams
                take_fwd = fwd_cand < self_cand
                out_ref[g_i] = jnp.where(take_fwd, fwd_cand, self_cand)
                eout_ref[g_i] = jnp.where(take_fwd, fwd_ent, ent)
                # word-transition candidates (OLD costs/entries)
                parts = [jnp.broadcast_to(root_row, (n_k1, B))] \
                    if n_k1 else []
                eparts = [jnp.full((n_k1, B), 0.0, jnp.float32) + t] \
                    if n_k1 else []
                for (off, vk, km1) in segs:
                    seg = blk[off:off + vk * km1].reshape(vk, km1, B)
                    parts.append(seg[:, km1 - 1, :])
                    es = ent[off:off + vk * km1].reshape(vk, km1, B)
                    eparts.append(es[:, km1 - 1, :])
                if Vp > V:
                    parts.append(jnp.full((Vp - V, B), INF, jnp.float32))
                    eparts.append(jnp.zeros((Vp - V, B), jnp.float32))
                cand = jnp.concatenate(parts, 0) + big_ref[u][:, None]
                cand_e = jnp.concatenate(eparts, 0)

                if g_i == 0:
                    @pl.when(ub == 0)
                    def _():
                        c_s[:] = jnp.full((J, Vp, B), INF, jnp.float32)
                        u_s[:] = jnp.zeros((J, Vp, B), jnp.float32)
                        e_s[:] = jnp.zeros((J, Vp, B), jnp.float32)

                # bubble the candidate into the sorted top-J planes
                cu = jnp.zeros((Vp, B), jnp.float32) + \
                    u.astype(jnp.float32)
                ce = cand_e
                cc = cand
                for j in range(J):
                    better = cc < c_s[j]
                    c_old, u_old, e_old = c_s[j], u_s[j], e_s[j]
                    c_s[j] = jnp.where(better, cc, c_old)
                    u_s[j] = jnp.where(better, cu, u_old)
                    e_s[j] = jnp.where(better, ce, e_old)
                    cc = jnp.where(better, c_old, cc)
                    cu = jnp.where(better, u_old, cu)
                    ce = jnp.where(better, e_old, ce)

            @pl.when(ub == pl.num_programs(0) - 1)
            def _():
                rc_ref[:] = c_s[:]
                ru_ref[:] = u_s[:]
                re_ref[:] = e_s[:]

        grid_call = pl.pallas_call(
            kernel,
            grid=(Up // G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((G, N, B), lambda u: (u, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, N, B), lambda u: (u, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=[
                pl.BlockSpec((G, N, B), lambda u: (u, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, N, B), lambda u: (u, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Up, N, B), jnp.float32),
                jax.ShapeDtypeStruct((Up, N, B), jnp.float32),
                jax.ShapeDtypeStruct((J, Vp, B), jnp.float32),
                jax.ShapeDtypeStruct((J, Vp, B), jnp.float32),
                jax.ShapeDtypeStruct((J, Vp, B), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((J, Vp, B), jnp.float32),
                            pltpu.VMEM((J, Vp, B), jnp.float32),
                            pltpu.VMEM((J, Vp, B), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )

        pdf_fwd_row = self._pdf_fwd_row
        pdf_self_row = self._pdf_self_row
        pdf_wend = self._pdf_wend_ends
        pdf_root_self = self._pdf_root_self
        word_to_endpos = jnp.asarray(self._word_to_endpos.astype(np.int32))
        first_f = jnp.asarray(self.g.row_is_first.astype(np.float32)[:, None])
        bigram_ends = self._bigram_ends

        def frame(carry, x):
            cost, ent, ovr, t = carry
            am_t, act = x
            amf = am_t[pdf_fwd_row]
            ams = am_t[pdf_self_row]
            am_rs = am_t[pdf_root_self]                    # (Vp, B)
            new, ent_new, rc, ru, re = grid_call(
                jnp.full((1,), t, jnp.int32), cost, ent, ovr,
                amf, ams, first_f, bigram_ends)
            exp_all = rc + am_t[pdf_wend][None]            # (J, Vp, B)
            exp_w = exp_all[:, word_to_endpos]             # word order
            arg_w = ru[:, word_to_endpos]
            ent_w = re[:, word_to_endpos]
            self_c = ovr[:V] + LN2 + am_rs[:V]
            take_self = self_c <= exp_w[0]
            root_new = jnp.where(take_self, self_c, exp_w[0])
            ovr_new = jnp.concatenate(
                [root_new, jnp.full((Up - V, B), INF, jnp.float32)], 0)
            new = jnp.where(act[None, None, :], new, cost)
            ent_new = jnp.where(act[None, None, :], ent_new, ent)
            ovr_new = jnp.where(act[None, :], ovr_new, ovr)
            ys = (exp_w, arg_w, ent_w, ovr_new[:Up], am_rs)
            return (new, ent_new, ovr_new, t + 1), ys

        def forward(cost0, ent0, ovr0, am, active):
            (cost, ent, ovr, _), ys = jax.lax.scan(
                frame, (cost0, ent0, ovr0, jnp.int32(0)), (am, active))
            return ovr, ys

        return jax.jit(forward, donate_argnums=(0, 1))

    def _make_lat_post(self, B: int, J: int, beam: float):
        """Device-side pruning + packing after the lattice forward —
        the analogue of the cudadecoder's in-GPU lattice-beam token
        pruning before host copy (cuda-decoder.cc PruneAndCopyToHost):
        only a survivor BITMASK and small per-frame reductions cross
        the (slow, tunneled) D2H link; survivor payloads are fetched
        afterwards with targeted device gathers."""
        import jax
        import jax.numpy as jnp
        V, Vp, Up = self.g.V, self.Vp, self.Up

        def post(exp_w, alpha, am_rs, lengths):
            T = exp_w.shape[0]
            a_best = jnp.min(alpha[:, :V, :], axis=1)        # (T, B)
            keep = (exp_w[:, :, :V, :] <=
                    (a_best[:, None, None, :] + beam))
            keepp = jnp.concatenate(
                [keep, jnp.zeros((T, J, Vp - V, B), bool)], axis=2)
            flat = keepp.reshape(T, (J * Vp) // 8, 8, B).astype(jnp.int32)
            w8 = (1 << jax.lax.broadcasted_iota(jnp.int32,
                                                (1, 1, 8, 1), 2))
            bits = (flat * w8).sum(axis=2).astype(jnp.uint8)
            idx = jnp.maximum(lengths - 1, 0)[None, None, :]
            alpha_fin = jnp.take_along_axis(
                alpha, jnp.broadcast_to(idx, (1, Up, B)), axis=0)[0]
            am_cs = jnp.cumsum(am_rs, axis=0)                # (T, Vp, B)
            return bits, a_best, alpha_fin, am_cs

        return jax.jit(post)

    def _gather3(self, arrs, ovr_all, t, j, w, b):
        """Fetch survivor payloads exp/arg/ent at (t, j, w, b) AND the
        source alpha ovr[ent-1, arg, b] in ONE device call (the chained
        dependency stays on device; each host round-trip over the
        tunnel costs more than the gather itself)."""
        import jax
        import jax.numpy as jnp
        S = 1 << max(int(np.ceil(np.log2(max(len(t), 1)))), 4)
        key = ("g3", S)
        if key not in self._jit:
            Up = self.Up

            @jax.jit
            def g3(e, a, en, ovr, ti, ji, wi, bi):
                ev = e[ti, ji, wi, bi]
                av = a[ti, ji, wi, bi]
                env = en[ti, ji, wi, bi]
                te = env.astype(jnp.int32)
                u = jnp.clip(av.astype(jnp.int32), 0, Up - 1)
                src = ovr[jnp.maximum(te - 1, 0), u, bi]
                src = jnp.where(te >= 1, src, 0.0)
                return ev, av, env, src
            self._jit[key] = g3
        pad = S - len(t)
        ti = jnp.asarray(np.pad(t, (0, pad)))
        ji = jnp.asarray(np.pad(j, (0, pad)))
        wi = jnp.asarray(np.pad(w, (0, pad)))
        bi = jnp.asarray(np.pad(b, (0, pad)))
        e, a, en, src = self._jit[key](*arrs, ovr_all, ti, ji, wi, bi)
        n = len(t)
        return (np.asarray(e)[:n], np.asarray(a)[:n],
                np.asarray(en)[:n], np.asarray(src)[:n])

    def _gather2(self, arr, i0, i1, b, name):
        """Fetch arr[i0, i1, b] (alpha sources / am cumsums)."""
        import jax
        import jax.numpy as jnp
        S = 1 << max(int(np.ceil(np.log2(max(len(i0), 1)))), 4)
        key = (name, S)
        if key not in self._jit:
            @jax.jit
            def g2(a, x, y, z):
                return a[x, y, z]
            self._jit[key] = g2
        pad = S - len(i0)
        x = jnp.asarray(np.pad(i0, (0, pad)))
        y = jnp.asarray(np.pad(i1, (0, pad)))
        z = jnp.asarray(np.pad(b, (0, pad)))
        return np.asarray(self._jit[key](arr, x, y, z))[:len(i0)]

    def decode_batch_lattice(self, loglikes, acoustic_scale: float = 1.0,
                             lengths: Optional[Sequence[int]] = None,
                             lattice_beam: float = 8.0, J: int = 4,
                             stats: Optional[Dict[str, float]] = None):
        """Full-lattice decode: returns per lane a word Lattice
        (ilabel=tid, olabel=word, weights (graph, acoustic)) pruned to
        `lattice_beam`, or None.  Word alternatives carry exact costs
        and exact (graph, acoustic) splits; within-word alignments of
        non-best paths distribute self-loop frames on the last chain
        row (the reference recovers exact alignments only for paths the
        token store kept; same contract here).  Determinize with
        lat.functions.determinize_lattice_pruned afterwards.

        Wire budget: the dense per-frame dumps stay ON DEVICE; the host
        receives a survivor bitmask (T*J*Vp/8 bytes per lane) plus
        per-survivor gathers, mirroring the reference's GPU-side
        lattice-beam pruning before host lattice assembly."""
        import jax.numpy as jnp
        g = self.g
        U, V, N = g.U, g.V, g.N
        B, T, P = loglikes.shape
        lengths = np.asarray(lengths if lengths is not None else [T] * B,
                             np.int64)
        key = ("lat", B, J)
        if key not in self._jit:
            self._jit[key] = self._make_lattice_step(B, J)
        fwd = self._jit[key]
        am = jnp.transpose(jnp.asarray(loglikes) * (-acoustic_scale),
                           (1, 2, 0))
        active = jnp.asarray(np.arange(T)[:, None] < lengths[None, :])
        cost0 = jnp.full((self.Up, N, B), INF, jnp.float32)
        ent0 = jnp.zeros((self.Up, N, B), jnp.float32)
        ovr0 = jnp.full((self.Up, B), INF, jnp.float32).at[V].set(0.0)
        import time as _time
        _t0 = _time.time()
        ovr_fin, (exp_w, arg_w, ent_w, ovr_all, am_rs) = \
            fwd(cost0, ent0, ovr0, am, active)
        ovr_fin.block_until_ready()
        if stats is not None:
            stats["fwd_s"] = _time.time() - _t0
        _t0 = _time.time()
        pkey = ("latpost", B, J, float(lattice_beam))
        if pkey not in self._jit:
            self._jit[pkey] = self._make_lat_post(B, J, lattice_beam)
        bits_d, a_best_d, alpha_fin_d, am_cs_d = self._jit[pkey](
            exp_w, ovr_all, am_rs, jnp.asarray(lengths.astype(np.int32)))
        bits = np.asarray(bits_d)          # (T, J*Vp/8, B) uint8
        a_best = np.asarray(a_best_d)      # (T, B)
        alpha_fin = np.asarray(alpha_fin_d)  # (Up, B)
        if stats is not None:
            stats["post_s"] = _time.time() - _t0
        _t0 = _time.time()
        # unpack survivor indices (all lanes at once)
        u8 = np.unpackbits(bits.transpose(2, 0, 1).reshape(B, T, -1),
                           axis=2, bitorder="little")
        u8 = u8.reshape(B, T, J, self.Vp)[:, :, :, :V]
        bs, ts, js, ws = np.nonzero(u8)
        # filter t >= lengths[b]
        m = ts < lengths[bs]
        bs, ts, js, ws = bs[m], ts[m], js[m], ws[m]
        if stats is not None:
            stats["unpack_s"] = _time.time() - _t0
            stats["n_survivors"] = len(ts)
        _t0 = _time.time()
        cvals, uvals, tevals, a_src = self._gather3(
            (exp_w, arg_w, ent_w), ovr_all, ts, js, ws, bs)
        uvals = np.rint(uvals).astype(np.int64)
        tevals = np.rint(tevals).astype(np.int64)
        # vectorized validity filter (mirrors the reference's token
        # sanity checks before GetRawLattice)
        begin = tevals == 0
        valid = np.isfinite(cvals) & (cvals < INF / 2)
        valid &= np.where(begin, uvals == U - 1, uvals < U - 1)
        valid &= begin | (np.isfinite(a_src) & (a_src < INF / 2))
        bs, ts, ws = bs[valid], ts[valid], ws[valid]
        cvals, uvals, tevals = cvals[valid], uvals[valid], tevals[valid]
        a_src, begin = a_src[valid], begin[valid]
        arc_cost = (cvals - a_src).astype(np.float64)

        # node table per lane: (w, t) word-end nodes, encoded w*T + t
        dst_key = ws * T + ts
        src_key = np.where(begin, -1, uvals * T + (tevals - 1))
        lane_nodes: List[np.ndarray] = []
        lane_info = []
        for b in range(B):
            sel = np.nonzero(bs == b)[0]
            keys = np.unique(np.concatenate(
                [dst_key[sel], src_key[sel][~begin[sel]]]))
            lane_nodes.append(keys)
            lane_info.append(sel)
        # batched node-alpha gather: alpha[t, w, b] for every node
        all_nw = np.concatenate([k // T for k in lane_nodes]) \
            if lane_nodes else np.zeros(0, np.int64)
        all_nt = np.concatenate([k % T for k in lane_nodes]) \
            if lane_nodes else np.zeros(0, np.int64)
        all_nb = np.concatenate(
            [np.full(len(k), b, np.int64)
             for b, k in enumerate(lane_nodes)]) \
            if lane_nodes else np.zeros(0, np.int64)
        node_alpha_all = self._gather2(ovr_all, all_nt, all_nw, all_nb,
                                       "asrc") \
            if len(all_nt) else np.zeros(0, np.float32)
        if stats is not None:
            stats["gather_s"] = _time.time() - _t0
        _t0 = _time.time()
        # batched am-cumsum gather for per-word consecutive self spans
        self_src_l, self_dst_l, self_b, self_t0, self_t1, self_w = \
            [], [], [], [], [], []
        off = 0
        node_off = []
        for b in range(B):
            node_off.append(off)
            keys = lane_nodes[b]
            kw, kt = keys // T, keys % T
            # consecutive node times within each word: keys are sorted
            # by (w, t) already (encoded w*T + t)
            if len(keys) > 1:
                same_w = kw[1:] == kw[:-1]
                idx = np.nonzero(same_w)[0]
                self_src_l.append(idx + off)
                self_dst_l.append(idx + 1 + off)
                self_b.append(np.full(len(idx), b, np.int64))
                self_t0.append(kt[idx])
                self_t1.append(kt[idx + 1])
                self_w.append(kw[idx])
            off += len(keys)
        if self_b:
            s_src = np.concatenate(self_src_l)
            s_dst = np.concatenate(self_dst_l)
            s_b = np.concatenate(self_b)
            s_t0 = np.concatenate(self_t0)
            s_t1 = np.concatenate(self_t1)
            s_w = np.concatenate(self_w)
            hi = self._gather2(am_cs_d, s_t1, s_w, s_b, "amcs")
            lo = self._gather2(am_cs_d, s_t0, s_w, s_b, "amcs")
            s_ac = (hi - lo).astype(np.float64)
        else:
            s_src = s_dst = s_b = s_t0 = s_t1 = s_w = \
                np.zeros(0, np.int64)
            s_ac = np.zeros(0)
        if stats is not None:
            stats["selfseg_s"] = _time.time() - _t0
        _t0 = _time.time()
        lats: List[Optional[object]] = []
        for b in range(B):
            sel = lane_info[b]
            keys = lane_nodes[b]
            n0 = node_off[b]
            ssel = np.nonzero(s_b == b)[0]
            lats.append(self._assemble_lane_pruned(
                b, int(lengths[b]), T, keys,
                node_alpha_all[n0:n0 + len(keys)],
                ts[sel], ws[sel], uvals[sel], tevals[sel],
                cvals[sel], a_src[sel], arc_cost[sel], begin[sel],
                s_src[ssel] - n0, s_dst[ssel] - n0, s_t0[ssel],
                s_t1[ssel], s_w[ssel], s_ac[ssel],
                alpha_fin[:, b], lattice_beam))
        if stats is not None:
            stats["assemble_s"] = _time.time() - _t0
        return lats

    def _assemble_lane_pruned(self, b, Tb, T, node_keys, node_alpha,
                              ts, ws, uvals, tevals, cvals, a_src,
                              arc_cost, begin, ss, sd, st0, st1, sw,
                              s_ac, alpha_fin, beam):
        """Host lattice assembly for one lane with EXACT alpha+beta
        lattice-beam pruning on the word-level survivor graph BEFORE
        any FST objects are built (the reference's raw-lattice
        extra-cost pruning, lattice-faster-decoder.cc PruneActiveTokens
        / determinize-lattice-pruned.h beam semantics)."""
        from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
        from kaldi_tpu.fstext.ops import connect
        g = self.g
        V, U = g.V, g.U
        if Tb == 0 or len(node_keys) == 0:
            return None
        fin = alpha_fin[:V] + g.eos_cost
        best = float(fin.min())
        if not np.isfinite(best) or best >= INF / 2:
            return None
        cutoff = best + beam + 1e-4
        n = len(node_keys)
        node_w = node_keys // T
        node_t = node_keys % T
        # word-arc endpoints as node indices
        dst_i = np.searchsorted(node_keys, ws * T + ts)
        src_i = np.where(begin, -1,
                         np.searchsorted(node_keys,
                                         np.where(begin, 0, uvals) * T
                                         + (tevals - 1)))
        # ---- beta (backward best completion) over the node graph ----
        beta = np.full(n, np.inf)
        last = node_t == Tb - 1
        beta[last] = g.eos_cost[node_w[last]]
        self_cost = (st1 - st0) * LN2 + s_ac
        # group arcs by source frame, process frames descending
        a_src_t = np.where(begin, -1, tevals - 1)
        for f in range(Tb - 2, -2, -1):
            if f < 0:
                break
            wa = np.nonzero(a_src_t == f)[0]
            if len(wa):
                cand = arc_cost[wa] + beta[dst_i[wa]]
                np.minimum.at(beta, src_i[wa], cand)
            sa = np.nonzero(st0 == f)[0]
            if len(sa):
                cand = self_cost[sa] + beta[sd[sa]]
                np.minimum.at(beta, ss[sa], cand)
        # ---- prune ----
        na = node_alpha.astype(np.float64)
        keep_node = na + beta <= cutoff
        keep_arc = np.where(
            begin, arc_cost + beta[dst_i] <= cutoff,
            a_src.astype(np.float64) + arc_cost + beta[dst_i] <= cutoff)
        keep_arc &= keep_node[dst_i]
        if not keep_arc.any():
            return None
        # ---- build ----
        lat = VectorFst(LatticeWeight)
        nodes: Dict[int, int] = {}

        def node_state(i):
            s = nodes.get(i)
            if s is None:
                s = lat.add_state()
                nodes[i] = s
            return s

        start = lat.add_state()
        lat.set_start(start)
        prons = g.prons
        raw_big = g.bigram
        for i in np.nonzero(keep_arc)[0]:
            t, w = int(ts[i]), int(ws[i])
            u = int(uvals[i])
            te = int(tevals[i])
            c = float(cvals[i])
            src = start if begin[i] else node_state(int(src_i[i]))
            dur = t - te + 1
            graph = float(raw_big[u, w]) + dur * LN2
            acoustic = c - float(a_src[i]) - graph
            dst = node_state(int(dst_i[i]))
            k = len(prons[w])
            tids = []
            e = int(g.end_row[w])
            if e >= 0:
                first_row = e - (k - 2)
                tids = [g.fwd_tid(g.pdf_fwd_row[r])
                        for r in range(first_row, e + 1)]
                tids += [g.self_tid(g.pdf_self_row[e])] * (dur - k)
            tids.append(g.fwd_tid(g.pdf_wend_fwd[w]))
            cur = src
            for q, tid in enumerate(tids):
                lastq = q == len(tids) - 1
                nxt = dst if lastq else lat.add_state()
                wgt = (graph, acoustic) if q == 0 else (0.0, 0.0)
                lat.add_arc(cur, Arc(tid, (w + 1) if q == 0 else 0,
                                     wgt, nxt))
                cur = nxt
        # self-extension arcs re-linked across pruned-away nodes:
        # within a word, connect consecutive KEPT nodes; span costs are
        # partial sums of the consecutive raw segments
        kept_set = set(int(i) for i in nodes)
        for w in np.unique(sw):
            seg_sel = np.nonzero(sw == w)[0]
            if not len(seg_sel):
                continue
            # chain of nodes for this word, in time order
            first = int(ss[seg_sel[0]])
            prev_kept = first if first in kept_set else None
            prev_t = int(node_t[first])
            run_ac = 0.0
            for i in seg_sel:
                nxt_node = int(sd[i])
                run_ac += float(s_ac[i])
                if nxt_node in kept_set:
                    if prev_kept is not None:
                        t0, t1 = prev_t, int(node_t[nxt_node])
                        gcost = (t1 - t0) * LN2
                        tid = g.self_tid(g.pdf_root_self[int(w)])
                        cur = nodes[prev_kept]
                        dsts = nodes[nxt_node]
                        for tt in range(t0 + 1, t1 + 1):
                            lastq = tt == t1
                            nxt2 = dsts if lastq else lat.add_state()
                            wgt = (gcost, run_ac) if tt == t0 + 1 \
                                else (0.0, 0.0)
                            lat.add_arc(cur, Arc(tid, 0, wgt, nxt2))
                            cur = nxt2
                    prev_kept = nxt_node
                    prev_t = int(node_t[nxt_node])
                    run_ac = 0.0
        # finals
        for i, s in nodes.items():
            if int(node_t[i]) == Tb - 1:
                lat.set_final(s, (float(g.eos_cost[int(node_w[i])]),
                                  0.0))
        connect(lat)
        if lat.num_states == 0 or lat.start is None:
            return None
        return lat

    def decode_batch(self, loglikes, acoustic_scale: float = 1.0,
                     lengths: Optional[Sequence[int]] = None
                     ) -> List[Optional[Tuple[List[int], List[int], float]]]:
        import jax.numpy as jnp
        g = self.g
        U, V, N = g.U, g.V, g.N
        B, T, P = loglikes.shape
        if P < g.num_pdfs:
            raise KaldiTpuError(f"loglikes pdf dim {P} < {g.num_pdfs}")
        lengths = np.asarray(lengths if lengths is not None else [T] * B,
                             np.int64)
        key = B
        if key not in self._jit:
            self._jit[key] = self._make_step(B)
        fwd, fol = self._jit[key]

        am = jnp.transpose(jnp.asarray(loglikes) * (-acoustic_scale),
                           (1, 2, 0))                       # (T,P,B)
        active = jnp.asarray(np.arange(T)[:, None] < lengths[None, :])
        cost0 = jnp.full((self.Up, N, B), INF, jnp.float32)
        ovr0 = jnp.full((self.Up, B), INF, jnp.float32)
        ovr0 = ovr0.at[V].set(0.0)                          # begin root
        cost, ovr, ys = fwd(cost0, ovr0, am, active)

        # best final root per lane
        total = ovr[:V] + self._eos[:V, None]
        best_w = jnp.argmin(total, axis=0)
        best_cost = jnp.min(total, axis=0)
        final_state = U * N + best_w

        first_state, states = fol(ys, active, final_state)
        states = np.asarray(states)                         # (T, B)
        first_state = np.asarray(first_state)
        best_cost = np.asarray(best_cost)
        final_state = np.asarray(final_state)

        root0 = U * N
        out: List[Optional[Tuple[List[int], List[int], float]]] = []
        for b in range(B):
            Tb = int(lengths[b])
            if best_cost[b] >= INF / 2:
                out.append(None)
                continue
            # trajectory: states[t, b] = state AFTER consuming frame t
            # (follow emitted cur before stepping back); first_state is
            # the state before frame 0 (must be the begin root).
            traj = [int(first_state[b])] + \
                [int(states[t, b]) for t in range(Tb)]
            words: List[int] = []
            tids: List[int] = []
            # a valid traceback must start at the begin root (the only
            # state with cost 0 before frame 0)
            if traj[0] != root0 + V:
                out.append(None)
                continue
            for t in range(1, Tb + 1):
                prev, cur = traj[t - 1], traj[t]
                if cur >= root0:                       # at a root
                    w = cur - root0
                    if prev == cur:                    # root self-loop
                        tids.append(g.self_tid(g.pdf_root_self[w]))
                    else:                              # word-final arc
                        tids.append(g.fwd_tid(g.pdf_wend_fwd[w]))
                        words.append(w + 1)
                else:
                    n = cur % N
                    if prev == cur:
                        tids.append(g.self_tid(g.pdf_self_row[n]))
                    else:
                        tids.append(g.fwd_tid(g.pdf_fwd_row[n]))
            out.append((words, tids, float(best_cost[b])))
        return out

    def decode(self, loglikes, acoustic_scale: float = 1.0):
        return self.decode_batch(loglikes[None], acoustic_scale)[0]
