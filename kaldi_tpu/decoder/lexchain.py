"""Entry-LM shared-lexicon device decoder: exact batched Viterbi over
(real lexicon) x (sparse backoff bigram) x (chain topology) graphs.

This is the round-3 successor of decoder/block_chain.py and the TPU
answer to the cudadecoder loading an arbitrary HCLG
(src/cudadecoder/cuda-fst.h:62, cuda-decoder.h:171).  The block-chain
layout replicated the whole lexicon once per LM context because it
applied the LM weight at word END — O(V^2) states (2.2M at V=700),
and the per-frame kernel streamed every copy.  Moving the LM weight to
word ENTRY (the standard weight-pushing freedom of HCLG) makes the
lexicon block CONTEXT-FREE:

  * ONE shared block of chain rows — variant p with k phones
    contributes k-1 rows (reorder=true H expansion: a row means
    "consumed >=1 frame of its phone", the word-final forward arc
    consumes the first frame of the LAST phone);
  * one root state per pronunciation variant ("consumed >=1 frame of
    the variant's last phone", carrying that phone's self-loop) plus a
    sentence-begin root;
  * optional per-root silence shadow states (optional inter-word
    silence of the L composition, make_lexicon_fst.pl semantics);
  * word entry at frame t relaxes over all roots r:
        entry[w] = min_r(root[r] + cost(w | word(r)))
    with the SPARSE backoff decomposition
        cost(w|u) = min(explicit(u, w), bo(u) + uni(w))
    so the per-frame work is O(N + V + E) instead of O(V * N): a
    single backoff reduction + a segmented min over the explicit
    bigram arcs (lm/bigram.py; the ConstArpaLm structure on device).

States: N + (P+1) + (P+1) total (rows + roots + shadows) — for
LibriSpeech-scale V=200k with ~6 phones/word this is ~1.2M states
versus the block-chain's ~10^11; the dense-bigram wall is gone.

The decoder is pure XLA (jnp under lax.scan): at these state counts
the per-frame arrays are KBs-to-MBs, so XLA fusion handles them well
and the program is portable to the CPU mesh for tests.  Exactness is
pinned against the host FasterDecoder on to_flat_graph()
(tests/test_lexchain.py).

Traceback is single-pass as in block_chain.py: chain rows store one
bit per frame (forward vs self-loop), roots/shadows one bool, entries
the winning source root — a device follow pass walks them backward and
only the (T, B) state trajectory reaches the host.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError, log
from kaldi_tpu.lm.bigram import BigramBackoffLm

LN2 = float(np.log(2.0))
INF = np.float32(1e30)
BIG = np.float32(1e10)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class LexChainGraph:
    """Shared-lexicon decoding graph with entry-applied sparse LM.

    State numbering (to_flat_graph / traceback):
      [0, N)                    chain rows (variant interiors)
      N + p, p in [0, P)        variant roots
      N + P                     sentence-begin root (start)
      N + P + 1 + p, p in [0, P]  silence shadows (if use_sil;
                                  shadow P = initial silence)
    """
    prons: List[np.ndarray]          # per variant, 1-based phone ids
    pron_word: np.ndarray            # (P,) word id in [0, V)
    pron_cost: np.ndarray            # (P,) -ln pron prob
    lm: BigramBackoffLm
    num_pdfs: int
    words: List[str]                 # id -> word, [0] = "<eps>"
    use_sil: bool = False
    sil_phone: int = 0
    sil_cost: float = LN2            # -ln P(take optional silence)
    nosil_cost: float = 0.0          # -ln P(skip optional silence)
    # --- derived row layout (set by _finalize) ---
    N: int = 0
    n_true: int = 0
    row_var: np.ndarray = field(default=None)     # (N,) variant or -1
    row_pos: np.ndarray = field(default=None)
    row_phone: np.ndarray = field(default=None)
    row_is_first: np.ndarray = field(default=None)
    row_word: np.ndarray = field(default=None)    # (N,) word of variant
    end_row: np.ndarray = field(default=None)     # (P,) or -1 if k==1
    # --- acoustic/transition tables ---
    pdf_fwd_row: np.ndarray = field(default=None)   # (N,)
    pdf_self_row: np.ndarray = field(default=None)  # (N,)
    tid_fwd_row: np.ndarray = field(default=None)
    tid_self_row: np.ndarray = field(default=None)
    tr_fwd_row: np.ndarray = field(default=None)    # (N,) -ln p
    tr_self_row: np.ndarray = field(default=None)
    pdf_end: np.ndarray = field(default=None)       # (P,) last-phone fwd
    tid_end: np.ndarray = field(default=None)
    tr_end: np.ndarray = field(default=None)
    pdf_root_self: np.ndarray = field(default=None)  # (P,)
    tid_root_self: np.ndarray = field(default=None)
    tr_root_self: np.ndarray = field(default=None)
    sil_pdf_fwd: int = 0
    sil_pdf_self: int = 0
    sil_tid_fwd: int = 0
    sil_tid_self: int = 0
    sil_tr_fwd: float = LN2
    sil_tr_self: float = LN2
    tid2pdf: np.ndarray = field(default=None)

    # ------------------------------------------------------------------
    @property
    def V(self) -> int:
        return self.lm.V

    @property
    def P(self) -> int:
        return len(self.prons)

    @property
    def num_states(self) -> int:
        base = self.N + self.P + 1
        return base + (self.P + 1 if self.use_sil else 0)

    @property
    def start_state(self) -> int:
        return self.N + self.P

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, prons: Sequence[np.ndarray], lm: BigramBackoffLm,
              pron_word: Optional[Sequence[int]] = None,
              pron_cost: Optional[Sequence[float]] = None,
              tm=None, tree=None, num_pdfs: Optional[int] = None,
              use_sil: bool = False, sil_phone: int = 0,
              sil_prob: float = 0.5) -> "LexChainGraph":
        """Build from pronunciations + sparse LM.

        With (tm, tree): REAL pdf-ids from the trained tree
        (ContextDependency.compute, monophone/1-state chain topology)
        and real transition-ids/probs from the TransitionModel —
        the trained-system path.  Without: synthetic pdf numbering
        fwd=pdf(phone,0)=2*(phone-1), self=2*(phone-1)+1 and
        tids pdf+1 / num_pdfs+pdf+1 (benchmark graphs)."""
        P = len(prons)
        prons = [np.asarray(p, np.int32) for p in prons]
        if any(len(p) < 1 for p in prons):
            raise KaldiTpuError("empty pronunciation")
        if pron_word is None:
            if P != lm.V:
                raise KaldiTpuError(f"{P} prons vs V={lm.V}; pass pron_word")
            pron_word = np.arange(P, dtype=np.int32)
        pron_word = np.asarray(pron_word, np.int32)
        if pron_cost is None:
            pron_cost = np.zeros(P, np.float32)
        g = cls(prons=list(prons), pron_word=pron_word,
                pron_cost=np.asarray(pron_cost, np.float32), lm=lm,
                num_pdfs=0, words=["<eps>"] + list(lm.words),
                use_sil=use_sil, sil_phone=sil_phone,
                sil_cost=float(-np.log(sil_prob)) if use_sil else LN2,
                nosil_cost=float(-np.log(1.0 - sil_prob))
                if use_sil else 0.0)
        g._layout()
        if tm is not None and tree is not None:
            g._tables_from_model(tm, tree)
            g.num_pdfs = tree.num_pdfs
        else:
            max_phone = max(int(p.max()) for p in prons)
            if use_sil:
                max_phone = max(max_phone, sil_phone)
            g.num_pdfs = num_pdfs or 2 * max_phone
            g._tables_synthetic()
        log(f"LexChainGraph: V={g.V} P={P} rows={g.n_true} (N={g.N}) "
            f"states={g.num_states} explicit-bigrams={lm.num_explicit}")
        return g

    def _layout(self) -> None:
        row_var, row_pos, row_phone = [], [], []
        end_row = np.full(self.P, -1, np.int64)
        for p_i, p in enumerate(self.prons):
            k = len(p)
            for j in range(k - 1):
                row_var.append(p_i)
                row_pos.append(j)
                row_phone.append(int(p[j]))
            if k >= 2:
                end_row[p_i] = len(row_var) - 1
        self.n_true = len(row_var)
        self.N = max(8, _round_up(self.n_true, 8))
        pad = self.N - self.n_true
        row_var += [-1] * pad
        row_pos += [0] * pad
        row_phone += [0] * pad
        self.row_var = np.asarray(row_var, np.int32)
        self.row_pos = np.asarray(row_pos, np.int32)
        self.row_phone = np.asarray(row_phone, np.int32)
        self.row_is_first = (self.row_pos == 0) & (self.row_var >= 0)
        self.row_word = np.where(self.row_var >= 0,
                                 self.pron_word[np.maximum(self.row_var, 0)],
                                 -1).astype(np.int32)
        self.end_row = end_row

    def _tables_synthetic(self) -> None:
        def fwd_pdf(ph):
            return (2 * (ph - 1)) % self.num_pdfs

        def self_pdf(ph):
            return (2 * (ph - 1) + 1) % self.num_pdfs
        ph = np.maximum(self.row_phone, 1)
        self.pdf_fwd_row = fwd_pdf(ph).astype(np.int32)
        self.pdf_self_row = self_pdf(ph).astype(np.int32)
        self.tid_fwd_row = (self.pdf_fwd_row + 1).astype(np.int32)
        self.tid_self_row = (self.num_pdfs + self.pdf_self_row + 1
                             ).astype(np.int32)
        self.tr_fwd_row = np.full(self.N, LN2, np.float32)
        self.tr_self_row = np.full(self.N, LN2, np.float32)
        last = np.asarray([int(p[-1]) for p in self.prons], np.int32)
        self.pdf_end = fwd_pdf(last).astype(np.int32)
        self.tid_end = (self.pdf_end + 1).astype(np.int32)
        self.tr_end = np.full(self.P, LN2, np.float32)
        self.pdf_root_self = self_pdf(last).astype(np.int32)
        self.tid_root_self = (self.num_pdfs + self.pdf_root_self + 1
                              ).astype(np.int32)
        self.tr_root_self = np.full(self.P, LN2, np.float32)
        if self.use_sil:
            self.sil_pdf_fwd = int(fwd_pdf(self.sil_phone))
            self.sil_pdf_self = int(self_pdf(self.sil_phone))
            self.sil_tid_fwd = self.sil_pdf_fwd + 1
            self.sil_tid_self = self.num_pdfs + self.sil_pdf_self + 1
        self.tid2pdf = np.concatenate(
            [[0], np.arange(self.num_pdfs),
             np.arange(self.num_pdfs)]).astype(np.int32)

    def _tables_from_model(self, tm, tree) -> None:
        """Real pdf/tid/transition-prob tables from a trained
        (TransitionModel, ContextDependency) with the 1-state chain
        topology (hmm/topology.py chain_topology; reference
        steps/nnet3/chain/gen_topo.py)."""
        phones = sorted(set(int(x) for x in self.row_phone if x > 0)
                        | {int(p[-1]) for p in self.prons}
                        | ({self.sil_phone} if self.use_sil else set()))
        fwd_pdf, self_pdf, fwd_tid, self_tid = {}, {}, {}, {}
        fwd_tr, self_tr = {}, {}
        for ph in phones:
            p0 = tree.compute([ph], 0)
            p1 = tree.compute([ph], 1)
            ts = tm.tuple_to_transition_state(ph, 0, p0, p1)
            sl = tm.self_loop_of(ts)
            fw = None
            for idx in range(tm.num_transition_indices(ts)):
                tid = tm.pair_to_transition_id(ts, idx)
                if not tm.is_self_loop(tid):
                    fw = tid
                    break
            if fw is None or sl is None:
                raise KaldiTpuError(f"phone {ph}: not chain topology")
            fwd_pdf[ph], self_pdf[ph] = p0, p1
            fwd_tid[ph], self_tid[ph] = fw, sl
            fwd_tr[ph] = -tm.get_transition_log_prob(fw)
            self_tr[ph] = -tm.get_transition_log_prob(sl)

        def tab(d, idx_phones, dtype=np.int32):
            return np.asarray([d.get(int(ph), 0) for ph in idx_phones],
                              dtype)
        self.pdf_fwd_row = tab(fwd_pdf, self.row_phone)
        self.pdf_self_row = tab(self_pdf, self.row_phone)
        self.tid_fwd_row = tab(fwd_tid, self.row_phone)
        self.tid_self_row = tab(self_tid, self.row_phone)
        self.tr_fwd_row = tab(fwd_tr, self.row_phone, np.float32)
        self.tr_self_row = tab(self_tr, self.row_phone, np.float32)
        last = [int(p[-1]) for p in self.prons]
        self.pdf_end = tab(fwd_pdf, last)
        self.tid_end = tab(fwd_tid, last)
        self.tr_end = tab(fwd_tr, last, np.float32)
        self.pdf_root_self = tab(self_pdf, last)
        self.tid_root_self = tab(self_tid, last)
        self.tr_root_self = tab(self_tr, last, np.float32)
        if self.use_sil:
            sp = self.sil_phone
            self.sil_pdf_fwd = fwd_pdf[sp]
            self.sil_pdf_self = self_pdf[sp]
            self.sil_tid_fwd = fwd_tid[sp]
            self.sil_tid_self = self_tid[sp]
            self.sil_tr_fwd = fwd_tr[sp]
            self.sil_tr_self = self_tr[sp]
        n_tids = tm.num_transition_ids
        self.tid2pdf = np.asarray(
            [0] + [tm.transition_id_to_pdf(t)
                   for t in range(1, n_tids + 1)], np.int32)

    # ------------------------------------------------------------------
    def entry_cost_table(self) -> np.ndarray:
        """(P+1, V) effective word-entry cost from each root context
        (host reference; row P = sentence begin)."""
        dense = self.lm.dense_cost()            # (V+1, V)
        ctx = np.concatenate([self.pron_word, [self.lm.V]])
        return dense[ctx]

    def eos_of_root(self) -> np.ndarray:
        """(P+1,) end-of-sentence cost per root."""
        ctx = np.concatenate([self.pron_word, [self.lm.V]])
        return self.lm.eos[ctx]

    def to_flat_graph(self):
        """Equivalent FlatGraph for host decoders (exactness tests).
        Word-entry arcs carry the olabel and the (densified) LM cost —
        one min-arc per (root, word) pair, tropical-equivalent to the
        explicit+backoff pair."""
        from kaldi_tpu.decoder.graph_direct import FlatGraph
        N, P, V = self.N, self.P, self.V
        root0 = N
        begin = N + P
        sil0 = N + P + 1
        ent = self.entry_cost_table()            # (P+1, V)
        eos = self.eos_of_root()
        src, dst, ilab, olab, wgt = [], [], [], [], []

        def add(s, d, tid, ol, w):
            src.append(s)
            dst.append(d)
            ilab.append(int(tid))
            olab.append(int(ol))
            wgt.append(float(w))

        sources = [(root0 + p, p) for p in range(P)] + [(begin, P)]
        if self.use_sil:
            sources += [(sil0 + p, p) for p in range(P + 1)]
        # chain interior
        for n in range(self.n_true):
            v = int(self.row_var[n])
            w = int(self.row_word[n])
            add(n, n, self.tid_self_row[n], 0, self.tr_self_row[n])
            if self.row_is_first[n]:
                for (s, ctx) in sources:
                    extra = self.nosil_cost if s < sil0 or not self.use_sil \
                        else 0.0
                    if s == begin and not self.use_sil:
                        extra = 0.0
                    add(s, n, self.tid_fwd_row[n], w + 1,
                        ent[ctx, w] + self.pron_cost[v] + extra
                        + self.tr_fwd_row[n])
            else:
                add(n - 1, n, self.tid_fwd_row[n], 0, self.tr_fwd_row[n])
        # word-final arcs into roots
        for p in range(P):
            w = int(self.pron_word[p])
            e = int(self.end_row[p])
            if e >= 0:
                add(e, root0 + p, self.tid_end[p], 0, self.tr_end[p])
            else:
                for (s, ctx) in sources:
                    extra = self.nosil_cost if (s < sil0
                                                or not self.use_sil) else 0.0
                    add(s, root0 + p, self.tid_end[p], w + 1,
                        ent[ctx, w] + self.pron_cost[p] + extra
                        + self.tr_end[p])
            add(root0 + p, root0 + p, self.tid_root_self[p], 0,
                self.tr_root_self[p])
        # silence shadows
        if self.use_sil:
            for p in range(P + 1):
                r = root0 + p if p < P else begin
                add(r, sil0 + p, self.sil_tid_fwd, 0,
                    self.sil_cost + self.sil_tr_fwd)
                add(sil0 + p, sil0 + p, self.sil_tid_self, 0,
                    self.sil_tr_self)
        finals = np.full(self.num_states, INF, np.float32)
        for p in range(P):
            finals[root0 + p] = eos[p]
        if self.use_sil:
            for p in range(P + 1):
                finals[sil0 + p] = eos[p]
        return FlatGraph(np.asarray(src, np.int32),
                         np.asarray(dst, np.int32),
                         np.asarray(ilab, np.int32),
                         np.asarray(olab, np.int32),
                         np.asarray(wgt, np.float32), finals,
                         start=begin, tid2pdf=self.tid2pdf,
                         num_pdfs=self.num_pdfs, words=self.words)


class LexChainDecoder:
    """Batched exact Viterbi over a LexChainGraph, pure XLA.

    decode_batch(loglikes (B, T, num_pdfs)) -> per lane
    (word_ids, tids, cost); word_ids index graph.words (1-based)."""

    def __init__(self, graph: LexChainGraph):
        import jax.numpy as jnp
        g = graph
        self.g = g
        self._c: Dict[str, object] = {}
        N, P, V = g.N, g.P, g.V
        lm = g.lm
        # explicit arcs at root level, padded so every word has >= 1
        # arc (dummy with BIG cost); sorted by destination word
        counts = np.bincount(lm.expl_dst, minlength=V)
        dst = np.concatenate([lm.expl_dst,
                              np.nonzero(counts == 0)[0].astype(np.int32)])
        srcw = np.concatenate([lm.expl_src,
                               np.zeros((counts == 0).sum(), np.int32)])
        cost = np.concatenate([lm.expl_cost,
                               np.full((counts == 0).sum(), BIG,
                                       np.float32)])
        order = np.argsort(dst, kind="stable")
        dst, srcw, cost = dst[order], srcw[order], cost[order]
        # ---- bucketed-CSR layout for the best-path entry relaxation:
        # words grouped by in-degree class (next pow2), each bucket a
        # dense (n_words, class) table of (source word, cost) — the
        # per-frame segmented min becomes one gather + one dense
        # reduction per class (O(E * B) total, no log-depth scan;
        # this is what makes V >= 20k vocabularies fast)
        indeg = np.bincount(dst, minlength=V)
        seg_start = np.concatenate([[0], np.cumsum(indeg)[:-1]])
        classes = np.maximum(1, 1 << np.ceil(
            np.log2(np.maximum(indeg, 1))).astype(np.int64))
        self._buckets = []
        perm = []                         # bucket-sorted word order
        for c in sorted(set(classes.tolist())):
            wsel = np.nonzero(classes == c)[0]
            nw = len(wsel)
            src_tab = np.zeros((nw, c), np.int64)
            cost_tab = np.full((nw, c), BIG, np.float32)
            for row, w in enumerate(wsel):
                s0, d = int(seg_start[w]), int(indeg[w])
                src_tab[row, :d] = srcw[s0:s0 + d]
                cost_tab[row, :d] = cost[s0:s0 + d]
            self._buckets.append((jnp.asarray(src_tab.astype(np.int32)),
                                  jnp.asarray(cost_tab)))
            perm.append(wsel)
        perm = np.concatenate(perm) if perm else np.zeros(0, np.int64)
        inv_perm = np.empty(V, np.int64)
        inv_perm[perm] = np.arange(V)
        self._bucket_inv_perm = jnp.asarray(inv_perm)
        # dense per-word arc table (V, maxdeg) for the lattice
        # survivor-pool gather-compute (BIG-padded; same candidate set
        # as the buckets, so mins agree bitwise)
        maxdeg = int(indeg.max()) if V else 1
        srcw_tab = np.zeros((V, maxdeg), np.int64)
        costw_tab = np.full((V, maxdeg), BIG, np.float32)
        for w_i in range(V):
            s0, d = int(seg_start[w_i]), int(indeg[w_i])
            srcw_tab[w_i, :d] = srcw[s0:s0 + d]
            costw_tab[w_i, :d] = cost[s0:s0 + d]
        self._srcw_tab = jnp.asarray(srcw_tab.astype(np.int32))
        self._costw_tab = jnp.asarray(costw_tab)
        # the exact forward uses this dense table instead of the
        # bucket loop when the padding blowup is modest: ONE gather +
        # one reduction per frame instead of ~#classes of each (per-op
        # fixed cost dominates at small V; see BASELINE.md) — at large
        # V with skewed in-degree the bucketed layout stays
        self._use_dense_corr = V * maxdeg <= 8 * max(len(dst), 1)
        # reverse buckets (arcs grouped by SOURCE context word) for the
        # lattice backward pass; every context appears exactly once
        # (out-degree 0 -> a BIG dummy in the class-1 bucket)
        order2 = np.argsort(srcw, kind="stable")
        s2, d2, c2 = srcw[order2], dst[order2], cost[order2]
        outdeg = np.bincount(s2, minlength=V + 1)
        start2 = np.concatenate([[0], np.cumsum(outdeg)[:-1]])
        classes2 = np.maximum(1, 1 << np.ceil(
            np.log2(np.maximum(outdeg, 1))).astype(np.int64))
        self._rev_buckets = []
        perm2 = []
        for cc in sorted(set(classes2.tolist())):
            usel = np.nonzero(classes2 == cc)[0]
            nc = len(usel)
            dtab = np.zeros((nc, cc), np.int64)
            ctab = np.full((nc, cc), BIG, np.float32)
            for row, u in enumerate(usel):
                s0, d = int(start2[u]), int(outdeg[u])
                dtab[row, :d] = d2[s0:s0 + d]
                ctab[row, :d] = c2[s0:s0 + d]
            self._rev_buckets.append(
                (jnp.asarray(dtab.astype(np.int32)), jnp.asarray(ctab)))
            perm2.append(usel)
        perm2 = np.concatenate(perm2)
        inv2 = np.empty(V + 1, np.int64)
        inv2[perm2] = np.arange(V + 1)
        self._rev_inv_perm = jnp.asarray(inv2)
        # backward-pass row helpers
        is_end = np.zeros(g.N, bool)
        for e in g.end_row:
            if e >= 0:
                is_end[e] = True
        self._c["is_end_row"] = jnp.asarray(is_end[:, None])
        self._c["var_of_row"] = jnp.asarray(
            np.maximum(g.row_var, 0).astype(np.int32))
        klen = np.asarray([len(p) for p in g.prons])
        self._c["first_row_of_var"] = jnp.asarray(
            np.where(g.end_row >= 0,
                     g.end_row - (klen - 2), 0).astype(np.int32))
        self._c["k1_mask"] = jnp.asarray((g.end_row < 0)[:, None])
        self._c["tr_fwd_pad"] = jnp.asarray(
            (g.tr_fwd_row + np.where(g.row_var < 0, BIG, 0.0)
             )[:, None].astype(np.float32))
        self._c["tr_self_pad"] = jnp.asarray(
            (g.tr_self_row + np.where(g.row_var < 0, BIG, 0.0)
             )[:, None].astype(np.float32))
        # map context word -> representative... contexts are per-ROOT;
        # explicit arc from word u applies to every variant root of u.
        # Instead of expanding arcs per variant, precompute for each
        # context word its variant list and fold at the ROOT level:
        # rword[r,b] = min over variants of word u of root cost — a
        # (V+1, B) segment-min over roots grouped by word.
        wcounts = np.bincount(g.pron_word, minlength=V)
        self._word_has_var = jnp.asarray(wcounts > 0)
        # dense variant table: word -> its variant roots, padded by
        # repeating the first entry (duplicates don't change a min).
        # The per-frame root->word fold becomes one gather + a min
        # over a <=maxvar axis instead of a log-depth associative
        # scan over P roots — the fold runs every frame of the
        # forward, lattice-forward AND backward scans, so this is
        # the single hottest op of the decoder.
        vlists: Dict[int, List[int]] = {}
        for p_i, w_i in enumerate(g.pron_word.tolist()):
            vlists.setdefault(int(w_i), []).append(p_i)
        maxvar = max((len(v) for v in vlists.values()), default=1)
        vtab = np.zeros((V, maxvar), np.int64)
        for w_i in range(V):
            lst = vlists.get(w_i, [0])
            vtab[w_i] = lst + [lst[0]] * (maxvar - len(lst))
        self._vtab = jnp.asarray(vtab.astype(np.int32))
        self._maxvar = maxvar
        # constants
        c = self._c
        c["first"] = jnp.asarray(g.row_is_first)
        c["row_word"] = jnp.asarray(np.maximum(g.row_word, 0))
        c["pdf_fwd_row"] = jnp.asarray(g.pdf_fwd_row)
        c["pdf_self_row"] = jnp.asarray(g.pdf_self_row)
        pad_big = np.where(g.row_var < 0, BIG, 0.0).astype(np.float32)
        first_extra = np.where(
            g.row_is_first,
            g.pron_cost[np.maximum(g.row_var, 0)], 0.0).astype(np.float32)
        c["fwd_extra"] = jnp.asarray(
            (g.tr_fwd_row + pad_big + first_extra)[:, None])
        c["self_extra"] = jnp.asarray((g.tr_self_row + pad_big)[:, None])
        c["end_row"] = jnp.asarray(np.maximum(g.end_row, 0).astype(np.int32))
        c["end_is_row"] = jnp.asarray((g.end_row >= 0)[:, None])
        c["pdf_end"] = jnp.asarray(g.pdf_end)
        c["tr_end"] = jnp.asarray(g.tr_end[:, None])
        c["end_word"] = jnp.asarray(g.pron_word)
        c["end_pron_cost"] = jnp.asarray(g.pron_cost[:, None])
        c["pdf_root_self"] = jnp.asarray(g.pdf_root_self)
        c["tr_root_self"] = jnp.asarray(g.tr_root_self[:, None])
        # per-root LM context data (roots 0..P-1 = variants, P = <s>)
        ctx_word = np.concatenate([g.pron_word, [V]]).astype(np.int32)
        self._ctx_word = ctx_word
        c["root_bo"] = jnp.asarray(lm.bo[ctx_word][:, None])
        c["uni"] = jnp.asarray(lm.uni[:, None])
        c["eos"] = jnp.asarray(lm.eos[ctx_word][:, None])
        c["nosil"] = jnp.float32(g.nosil_cost if g.use_sil else 0.0)
        c["uni_flat"] = jnp.asarray(lm.uni)                    # (V,)
        # ---- virtual-context tables for the PRUNED entry expansion
        # (reference cuda-decoder ExpandArcs over the ACTIVE token set,
        # cuda-decoder-kernels.h:80; here "tokens" are LM contexts):
        # explicit arcs CSR-by-source, split into rows of <= VC_D arcs;
        # a context with out-degree d becomes ceil(d/VC_D) virtual rows
        # that share its root value, so the per-frame top-K selection
        # is over fixed-shape rows and the expansion of the K winners
        # is a dense (K, VC_D) gather + scatter-min.
        self.VC_D = 16
        vc_ctx, vc_dst, vc_cost = [], [], []
        for u in range(V + 1):
            s0, d = int(start2[u]), int(outdeg[u])
            for off in range(0, d, self.VC_D):
                sl = slice(s0 + off, s0 + min(off + self.VC_D, d))
                k = sl.stop - sl.start
                vc_ctx.append(u)
                vc_dst.append(np.concatenate(
                    [d2[sl], np.zeros(self.VC_D - k, np.int64)]))
                vc_cost.append(np.concatenate(
                    [c2[sl], np.full(self.VC_D - k, BIG, np.float32)]))
        # pad the row count so top-k never sees a degenerate shape;
        # padded rows point at the INF context slot (index V+1)
        n_vc = max(8, len(vc_ctx))
        while len(vc_ctx) < n_vc:
            vc_ctx.append(V + 1)
            vc_dst.append(np.zeros(self.VC_D, np.int64))
            vc_cost.append(np.full(self.VC_D, BIG, np.float32))
        self.VC = len(vc_ctx)
        self._vc_ctx = jnp.asarray(np.asarray(vc_ctx, np.int32))
        self._vc_dst = jnp.asarray(
            np.asarray(vc_dst, np.int64).astype(np.int32))
        self._vc_cost = jnp.asarray(np.asarray(vc_cost, np.float32))
        self._jit = {}

    # ------------------------------------------------------------------
    def _make_step(self, B: int, prune: Optional[Tuple] = None):
        """prune = None for the exact full-E entry expansion, or
        (K, beam, exact_topk) for the beam-pruned active-context
        expansion: per frame each lane expands only the explicit arcs
        of its top-K in-beam LM contexts (the cudadecoder active-token
        ExpandArcs analogue, cuda-decoder-kernels.h:80) and the
        traceback argument is recovered from the stored candidate pool
        instead of a dense (V, B) argmin plane."""
        import jax
        import jax.numpy as jnp
        g = self.g
        N, P, V = g.N, g.P, g.V
        c = self._c
        use_sil = g.use_sil
        word_has_var = self._word_has_var
        vtab = self._vtab
        buckets = self._buckets
        inv_perm = self._bucket_inv_perm
        vc_ctx, vc_dst, vc_cost = self._vc_ctx, self._vc_dst, self._vc_cost
        if prune is not None:
            Kp, beam_p, exact_topk = prune
            Kp = int(min(Kp, self.VC))

        def frame(carry, x):
            cost, roots, sil = carry     # (N,B), (P+1,B), (P+1,B)
            am_t, act = x                # (num_pdfs, B), (B,)
            lane = jnp.arange(B)
            # --- source combination: root vs its silence shadow -----
            radj = roots + c["nosil"]
            if use_sil:
                rmin = jnp.minimum(radj, sil)
                pick_sil = sil < radj                  # (P+1,B)
            else:
                rmin = radj
                pick_sil = jnp.zeros_like(radj, bool)
            # --- fold variant roots to word level (vtab gather+min) -
            rv = rmin[vtab]                            # (V,maxvar,B)
            am1 = jnp.argmin(rv, axis=1)               # (V,B)
            rword_v = jnp.min(rv, axis=1)              # (V,B)
            rword_a = vtab[jnp.arange(V)[:, None], am1]  # (V,B) root
            rword_v = jnp.where(word_has_var[:, None], rword_v, INF)
            # --- backoff entry --------------------------------------
            bo_cand = rmin + c["root_bo"]              # (P+1,B)
            gval = jnp.min(bo_cand, axis=0)            # (B,)
            garg = jnp.argmin(bo_cand, axis=0).astype(jnp.int32)
            base = gval[None, :] + c["uni"]            # (V,B)
            if prune is None:
                # --- explicit-bigram corrections ---------------------
                # source-word value table extended with the <s> row
                rword_ext = jnp.concatenate([rword_v, rmin[P][None, :]],
                                            0)
                rarg_ext = jnp.concatenate(
                    [rword_a, jnp.full((1, B), P, jnp.int32)], 0)
                if self._use_dense_corr:
                    # one padded (V, maxdeg, B) gather + reduction
                    # (BIG padding loses every min; same candidates
                    # as the buckets, so values agree bitwise)
                    src_tab, cost_tab = self._srcw_tab, self._costw_tab
                    cand = rword_ext[src_tab] + cost_tab[..., None]
                    corr = jnp.min(cand, axis=1)             # (V,B)
                    win = jnp.argmin(cand, axis=1)
                    sw_win = src_tab[
                        jnp.arange(src_tab.shape[0])[:, None], win]
                else:
                    parts_v, parts_sw = [], []
                    for (src_tab, cost_tab) in buckets:
                        nw = src_tab.shape[0]
                        cand = rword_ext[src_tab] + cost_tab[..., None]
                        parts_v.append(jnp.min(cand, axis=1))  # (nw,B)
                        win = jnp.argmin(cand, axis=1)         # (nw,B)
                        parts_sw.append(
                            src_tab[jnp.arange(nw)[:, None], win])
                    corr = jnp.concatenate(parts_v, 0)[inv_perm]
                    sw_win = jnp.concatenate(parts_sw, 0)[inv_perm]
                corr_a = rarg_ext[sw_win, jnp.arange(B)[None, :]]
                take_corr = corr < base
                entry = jnp.where(take_corr, corr, base)   # (V,B)
                entry_arg = jnp.where(take_corr, corr_a,
                                      garg[None, :]).astype(jnp.int32)
            else:
                # --- pruned explicit corrections --------------------
                # value table with <s> row and an INF slot for padding
                rword_ext = jnp.concatenate(
                    [rword_v, rmin[P][None, :],
                     jnp.full((1, B), INF, jnp.float32)], 0)
                rarg_ext = jnp.concatenate(
                    [rword_a, jnp.full((2, B), P, jnp.int32)], 0)
                vvals = rword_ext[vc_ctx]              # (VC,B)
                cutoff = jnp.min(rmin, axis=0) + beam_p
                vm = jnp.where(vvals <= cutoff[None, :], vvals, INF)
                vt = vm.T                              # (B,VC)
                if exact_topk:
                    neg, ids = jax.lax.top_k(-vt, Kp)
                    vals = -neg                        # (B,K)
                else:
                    vals, ids = jax.lax.approx_min_k(vt, Kp)
                ids = ids.astype(jnp.int32)
                dsts = vc_dst[ids]                     # (B,K,D)
                cand = vals[:, :, None] + vc_cost[ids]
                corr = jnp.full((V, B), INF, jnp.float32).at[
                    dsts, lane[:, None, None]].min(cand)
                entry = jnp.minimum(corr, base)        # (V,B)
                root_k = rarg_ext[vc_ctx[ids], lane[:, None]]  # (B,K)
                sil_k = pick_sil[root_k, lane[:, None]]
                g_sil = pick_sil[garg, lane]           # (B,)
            # --- chain rows -----------------------------------------
            amf = am_t[c["pdf_fwd_row"]] + c["fwd_extra"]    # (N,B)
            ams = am_t[c["pdf_self_row"]] + c["self_extra"]
            rolled = jnp.roll(cost, 1, axis=0)
            fwd_src = jnp.where(c["first"][:, None],
                                entry[c["row_word"]], rolled)
            fwd_cand = fwd_src + amf
            self_cand = cost + ams
            take_fwd = fwd_cand < self_cand
            new_cost = jnp.where(take_fwd, fwd_cand, self_cand)
            # bit-pack decisions
            d3 = take_fwd.astype(jnp.int32).reshape(N // 8, 8, B)
            w8 = (1 << jax.lax.broadcasted_iota(jnp.int32,
                                                (1, 8, 1), 1))
            bits = (d3 * w8).sum(axis=1).astype(jnp.uint8)
            # --- roots ----------------------------------------------
            am_end = am_t[c["pdf_end"]] + c["tr_end"]        # (P,B)
            end_src = jnp.where(
                c["end_is_row"], cost[c["end_row"]],
                entry[c["end_word"]] + c["end_pron_cost"])
            end_cand = end_src + am_end
            self_r = roots[:P] + am_t[c["pdf_root_self"]] + \
                c["tr_root_self"]
            take_end = end_cand < self_r
            roots_new = jnp.concatenate(
                [jnp.where(take_end, end_cand, self_r),
                 jnp.full((1, B), INF, jnp.float32)], axis=0)
            # --- silence shadows ------------------------------------
            if use_sil:
                sil_in = roots + g.sil_cost + g.sil_tr_fwd + \
                    am_t[g.sil_pdf_fwd][None, :]
                sil_self = sil + g.sil_tr_self + \
                    am_t[g.sil_pdf_self][None, :]
                sil_take = sil_in < sil_self
                sil_new = jnp.where(sil_take, sil_in, sil_self)
            else:
                sil_take = jnp.zeros_like(roots, bool)
                sil_new = sil
            # --- freeze inactive lanes ------------------------------
            new_cost = jnp.where(act[None, :], new_cost, cost)
            roots_new = jnp.where(act[None, :], roots_new, roots)
            sil_new = jnp.where(act[None, :], sil_new, sil)
            if prune is None:
                ys = (bits, entry_arg, pick_sil, take_end, sil_take)
            else:
                ys = (bits, ids, vals, root_k, sil_k, gval, garg,
                      g_sil, take_end, sil_take)
            return (new_cost, roots_new, sil_new), ys

        # scan unroll trades per-step loop overhead for program size
        # (KALDI_TPU_SCAN_UNROLL, default 1; the per-frame ops here
        # are tiny, so step overhead can dominate — measured on-chip)
        import os as _os
        unroll = max(1, int(_os.environ.get("KALDI_TPU_SCAN_UNROLL",
                                            "1")))

        def forward(cost0, roots0, sil0, am, active):
            (cost, roots, sil), ys = jax.lax.scan(
                frame, (cost0, roots0, sil0), (am, active),
                unroll=unroll)
            return cost, roots, sil, ys

        # ---- device follow pass -----------------------------------
        first_np = self.g.row_is_first
        row_word = jnp.asarray(np.maximum(g.row_word, 0))
        row_first = jnp.asarray(first_np)
        end_row = jnp.asarray(np.maximum(g.end_row, 0).astype(np.int32))
        end_is_row = jnp.asarray(g.end_row >= 0)
        end_word = jnp.asarray(g.pron_word)
        root0 = N
        begin = N + P
        sil0_id = N + P + 1

        def follow(ys, active, final_state):
            lane = jnp.arange(B)

            if prune is None:
                def entry_src(w, x):
                    _bits, arg, pick, _tend, _stake = x
                    p_src = arg[w, lane]                 # (B,)
                    from_sil = pick[p_src, lane]
                    return jnp.where(from_sil, sil0_id + p_src,
                                     jnp.where(p_src == P, begin,
                                               root0 + p_src))
            else:
                def entry_src(w, x):
                    (_bits, ids, vals, root_k, sil_k, gval, garg,
                     g_sil, _tend, _stake) = x
                    # recover the winning source among the frame's
                    # stored top-K candidate pool (same candidate set
                    # the forward scatter-min reduced, so the min
                    # value matches the forward's entry bitwise)
                    dsts = vc_dst[ids]                   # (B,K,D)
                    cand = vals[:, :, None] + vc_cost[ids]
                    candw = jnp.where(dsts == w[:, None, None],
                                      cand, INF)
                    flat = candw.reshape(B, -1)
                    amin = jnp.argmin(flat, axis=1)      # (B,)
                    cmin = jnp.min(flat, axis=1)
                    k_win = (amin // self.VC_D).astype(jnp.int32)
                    base_w = gval + c["uni_flat"][w]
                    use_corr = cmin < base_w
                    p_src = jnp.where(use_corr, root_k[lane, k_win],
                                      garg)
                    from_sil = jnp.where(use_corr,
                                         sil_k[lane, k_win], g_sil)
                    return jnp.where(from_sil, sil0_id + p_src,
                                     jnp.where(p_src == P, begin,
                                               root0 + p_src))

            def step(cur, xa):
                x, act = xa
                bits, tend, stake = x[0], x[-2], x[-1]
                is_row = cur < N
                is_shadow = cur >= sil0_id
                is_begin = cur == begin
                # chain row predecessor
                n_c = jnp.clip(cur, 0, N - 1)
                byte = bits[n_c >> 3, lane].astype(jnp.int32)
                bit = (byte >> (n_c & 7)) & 1
                w_row = row_word[n_c]
                row_prev = jnp.where(
                    bit == 1,
                    jnp.where(row_first[n_c],
                              entry_src(w_row, x),
                              cur - 1),
                    cur)
                # root predecessor
                p_c = jnp.clip(cur - root0, 0, P - 1)
                te = tend[p_c, lane]
                root_prev = jnp.where(
                    te,
                    jnp.where(end_is_row[p_c], end_row[p_c],
                              entry_src(end_word[p_c], x)),
                    cur)
                # shadow predecessor
                ps = jnp.clip(cur - sil0_id, 0, P)
                sh_prev = jnp.where(
                    stake[ps, lane],
                    jnp.where(ps == P, begin, root0 + ps), cur)
                prev = jnp.where(is_row, row_prev,
                                 jnp.where(is_shadow, sh_prev,
                                           jnp.where(is_begin, cur,
                                                     root_prev)))
                prev = jnp.where(act, prev, cur)
                return prev, cur

            first_state, states = jax.lax.scan(
                step, final_state, (ys, active), reverse=True,
                unroll=unroll)
            return first_state, states

        return jax.jit(forward, donate_argnums=(0,)), jax.jit(follow)

    # ------------------------------------------------------------------
    def decode_batch(self, loglikes, acoustic_scale: float = 1.0,
                     lengths: Optional[Sequence[int]] = None,
                     prune_k: Optional[int] = None,
                     prune_beam: float = float(BIG),
                     exact_topk: bool = False,
                     stats: Optional[Dict[str, float]] = None
                     ) -> List[Optional[Tuple[List[int], List[int],
                                              float]]]:
        """prune_k: expand only each lane's top-K in-beam LM contexts'
        explicit arcs per frame (beam-pruned search; None = exact).
        prune_beam: contexts worse than best+beam are dropped before
        the top-K. exact_topk uses lax.top_k instead of approx_min_k
        (exact selection; approx trades ~5% recall for speed).
        stats (optional dict): per-stage wall seconds fwd_s / fol_s /
        traceback_s — each stage ends with a small forced D2H sync, so
        passing stats changes pipelining; use only to profile."""
        import time as _time
        import jax.numpy as jnp
        g = self.g
        N, P, V = g.N, g.P, g.V
        B, T, Pdf = loglikes.shape
        if Pdf < g.num_pdfs:
            raise KaldiTpuError(f"loglikes pdf dim {Pdf} < {g.num_pdfs}")
        lengths = np.asarray(lengths if lengths is not None
                             else [T] * B, np.int64)
        prune = None if prune_k is None else \
            (int(prune_k), float(prune_beam), bool(exact_topk))
        key = (B, prune)
        if key not in self._jit:
            self._jit[key] = self._make_step(B, prune)
        fwd, fol = self._jit[key]
        am = jnp.transpose(jnp.asarray(loglikes) * (-acoustic_scale),
                           (1, 2, 0))
        active = jnp.asarray(np.arange(T)[:, None] < lengths[None, :])
        cost0 = jnp.full((N, B), INF, jnp.float32)
        roots0 = jnp.full((P + 1, B), INF, jnp.float32)
        roots0 = roots0.at[P].set(0.0)
        sil0 = jnp.full((P + 1, B), INF, jnp.float32)
        _t0 = _time.time()
        cost, roots, sil, ys = fwd(cost0, roots0, sil0, am, active)
        if stats is not None:
            np.asarray(roots[0, 0])         # force D2H sync
            stats["fwd_s"] = _time.time() - _t0
            _t0 = _time.time()

        eos = self._c["eos"]
        fin_root = roots + eos                 # (P+1,B)
        fin_sil = sil + eos if g.use_sil else \
            jnp.full_like(fin_root, INF)
        allfin = jnp.concatenate([fin_root, fin_sil], axis=0)
        best_i = jnp.argmin(allfin, axis=0)
        best_cost = jnp.min(allfin, axis=0)
        final_state = jnp.where(
            best_i <= P,
            jnp.where(best_i == P, N + P, N + best_i),
            N + P + 1 + (best_i - (P + 1)))
        first_state, states = fol(ys, active, final_state)
        states = np.asarray(states)
        first_state = np.asarray(first_state)
        best_cost = np.asarray(best_cost)
        if stats is not None:
            stats["fol_s"] = _time.time() - _t0
            _t0 = _time.time()
        out = self._traceback(states, first_state, best_cost, lengths)
        if stats is not None:
            stats["traceback_s"] = _time.time() - _t0
        return out

    def _traceback(self, states, first_state, best_cost, lengths):
        """Vectorized over (frames, lanes): the per-pair case split of
        the scalar version as numpy selects on the whole (T, B) plane
        (the scalar loop was ~0.1s/batch at B=128 — pure-Python host
        time on the decode critical path)."""
        g = self.g
        N, P = g.N, g.P
        root0, begin, sil0 = N, N + P, N + P + 1
        out: List[Optional[Tuple[List[int], List[int], float]]] = []
        T, B = states.shape
        if T == 0:
            return [None if best_cost[b] >= INF / 2 else ([], [],
                    float(best_cost[b])) for b in range(B)]
        prev = np.vstack([first_state[None, :], states[:-1]])  # (T,B)
        cur = states
        self_loop = prev == cur
        is_row = cur < N
        is_shadow = cur >= sil0
        n_c = np.clip(cur, 0, N - 1)
        p_c = np.clip(cur - root0, 0, P - 1)
        tid_all = np.where(
            is_row,
            np.where(self_loop, g.tid_self_row[n_c], g.tid_fwd_row[n_c]),
            np.where(
                is_shadow,
                np.where(self_loop, g.sil_tid_self, g.sil_tid_fwd),
                np.where(self_loop, g.tid_root_self[p_c],
                         g.tid_end[p_c])))
        word_all = np.where(
            is_row & ~self_loop & g.row_is_first[n_c] & (prev >= N),
            g.row_word[n_c] + 1,
            np.where(~is_row & ~is_shadow & ~self_loop
                     & (g.end_row[p_c] < 0),
                     g.pron_word[p_c] + 1, 0))
        hit_begin = cur == begin
        for b in range(B):
            Tb = int(lengths[b])
            if best_cost[b] >= INF / 2:
                out.append(None)
                continue
            if Tb > 0 and (int(first_state[b]) != begin
                           or hit_begin[:Tb, b].any()):
                out.append(None)
                continue
            wv = word_all[:Tb, b]
            out.append((wv[wv > 0].tolist(), tid_all[:Tb, b].tolist(),
                        float(best_cost[b])))
        return out

    def decode(self, loglikes, acoustic_scale: float = 1.0):
        return self.decode_batch(loglikes[None], acoustic_scale)[0]

    # ==================================================================
    # Lattice mode: device forward with per-frame top-J word-entry
    # candidate dumps, device beam pruning to a survivor bitmask, host
    # lattice assembly — the cudadecoder GetRawLattice split
    # (cuda-decoder.cc token dumps -> host lattice workers,
    # lattice-postprocessor.h:73), adapted to the entry-LM layout:
    # lattice nodes are (variant root, frame) word-end events; word
    # arcs carry the top-J entry sources (root / silence-shadow /
    # begin) with exact cost splits; optional-silence frames ride on
    # the entry arc (the source-time gap determines the silence span).
    # ==================================================================
    def _make_lattice_step(self, B: int, J: int):
        """Lattice forward scan.  Unlike the round-2 version this
        computes ONLY the j=0 entry VALUE in the sequential body (the
        recursion needs nothing else); the top-J candidate pools are
        a pure function of the dumped per-frame (rmin, src_time) and
        are recomputed batched over all frames by _make_pools — one
        throughput-bound op instead of ~60% of the per-frame scan."""
        import jax
        import jax.numpy as jnp
        g = self.g
        N, P, V = g.N, g.P, g.V
        c = self._c
        use_sil = g.use_sil
        word_has_var = self._word_has_var
        vtab = self._vtab
        buckets = self._buckets
        inv_perm = self._bucket_inv_perm

        def frame(carry, x):
            cost, ent, roots, sil, sil_t, t = carry
            am_t, act = x
            tf = t.astype(jnp.float32)
            radj = roots + c["nosil"]
            if use_sil:
                rmin = jnp.minimum(radj, sil)
                pick_sil = sil < radj
            else:
                rmin = radj
                pick_sil = jnp.zeros_like(radj, bool)
            src_time = jnp.where(pick_sil, sil_t,
                                 jnp.broadcast_to(tf - 1.0, radj.shape))
            # fold variant roots to word level (vtab gather+min)
            rword_v = jnp.min(rmin[vtab], axis=1)       # (V,B)
            rword_v = jnp.where(word_has_var[:, None], rword_v, INF)
            # j=0 entry value (identical op sequence to _make_pools'
            # first merge candidate, so alphas match the pool values
            # bitwise)
            gval = jnp.min(rmin + c["root_bo"], axis=0)  # (B,)
            base = gval[None, :] + c["uni"]              # (V,B)
            rword_ext = jnp.concatenate([rword_v, rmin[P][None, :]], 0)
            parts_v = []
            for (src_tab, cost_tab) in buckets:
                cand = rword_ext[src_tab] + cost_tab[..., None]
                parts_v.append(jnp.min(cand, axis=1))    # (nw,B)
            corr = jnp.concatenate(parts_v, 0)[inv_perm]  # (V,B)
            entry = jnp.minimum(corr, base)
            # ---------- chain rows (+ entry-time propagation) --------
            amf = am_t[c["pdf_fwd_row"]] + c["fwd_extra"]
            ams = am_t[c["pdf_self_row"]] + c["self_extra"]
            rolled = jnp.roll(cost, 1, axis=0)
            rolled_e = jnp.roll(ent, 1, axis=0)
            fwd_src = jnp.where(c["first"][:, None],
                                entry[c["row_word"]], rolled)
            fwd_ent = jnp.where(c["first"][:, None],
                                jnp.broadcast_to(tf, ent.shape), rolled_e)
            fwd_cand = fwd_src + amf
            self_cand = cost + ams
            take_fwd = fwd_cand < self_cand
            new_cost = jnp.where(take_fwd, fwd_cand, self_cand)
            new_ent = jnp.where(take_fwd, fwd_ent, ent)
            # ---------- roots ----------------------------------------
            am_end = am_t[c["pdf_end"]] + c["tr_end"]
            end_src = jnp.where(
                c["end_is_row"], cost[c["end_row"]],
                entry[c["end_word"]] + c["end_pron_cost"])
            end_cand = end_src + am_end                  # arrival cost
            arr_te = jnp.where(c["end_is_row"], ent[c["end_row"]],
                               jnp.broadcast_to(tf, end_cand.shape))
            am_rs = am_t[c["pdf_root_self"]]             # (P,B) raw
            self_r = roots[:P] + am_rs + c["tr_root_self"]
            take_end = end_cand < self_r
            roots_new = jnp.concatenate(
                [jnp.where(take_end, end_cand, self_r),
                 jnp.full((1, B), INF, jnp.float32)], axis=0)
            # ---------- silence shadows ------------------------------
            if use_sil:
                sil_in = roots + g.sil_cost + g.sil_tr_fwd + \
                    am_t[g.sil_pdf_fwd][None, :]
                sil_self = sil + g.sil_tr_self + \
                    am_t[g.sil_pdf_self][None, :]
                sil_take = sil_in < sil_self
                sil_new = jnp.where(sil_take, sil_in, sil_self)
                sil_t_new = jnp.where(sil_take, tf - 1.0, sil_t)
            else:
                sil_new, sil_t_new = sil, sil_t
            # freeze inactive lanes
            new_cost = jnp.where(act[None, :], new_cost, cost)
            new_ent = jnp.where(act[None, :], new_ent, ent)
            roots_new = jnp.where(act[None, :], roots_new, roots)
            sil_new = jnp.where(act[None, :], sil_new, sil)
            sil_t_new = jnp.where(act[None, :], sil_t_new, sil_t)
            ys = (rmin, src_time, entry, end_cand, arr_te, take_end,
                  roots_new, am_rs)
            return (new_cost, new_ent, roots_new, sil_new, sil_t_new,
                    t + 1), ys

        def forward(cost0, ent0, roots0, sil0, silt0, am, active):
            (cost, ent, roots, sil, sil_t, _), ys = jax.lax.scan(
                frame, (cost0, ent0, roots0, sil0, silt0, jnp.int32(0)),
                (am, active))
            return roots, sil, sil_t, ys

        return jax.jit(forward, donate_argnums=(0, 1))

    def _make_surv_pools(self, B: int, J: int, beam: float):
        """Top-J entry-candidate pools computed ONLY at the surviving
        (frame, word, lane) positions — a gather-compute over the
        dumped per-frame (rmin, src_time).  Because the per-word pool
        is sorted, a word position whose BEST (j=0) entry fails the
        alpha+beta beam has no surviving candidate at all, so the
        word-level bitmask from _make_lat_post is exactly the union
        over j — and the O(T*V*B*J + T*E*B*J) full-pool computation
        of the previous design collapses to O(S*(P+V+maxdeg)) for S
        survivors (~10^3-10^4).  Op sequences mirror the scan's j=0
        entry computation, so values match the forward alphas
        bitwise."""
        import jax
        import jax.numpy as jnp
        g = self.g
        P, V = g.P, g.V
        c = self._c
        word_has_var = self._word_has_var
        vtab = self._vtab
        srcw_tab = self._srcw_tab        # (V, maxdeg)
        costw_tab = self._costw_tab
        root_bo = c["root_bo"][:, 0]     # (P+1,)
        uni = c["uni"][:, 0]             # (V,)

        def pools(rmin_all, srct_all, bentry, best, st, sw, sb):
            # st/sw/sb: (S,) padded survivor coordinates
            S = st.shape[0]
            rmin_s = rmin_all[st, :, sb]             # (S, P+1)
            srct_s = srct_all[st, :, sb]
            # ---- backoff pool: top-J root sources ----
            pool_m = rmin_s + root_bo[None, :]
            pv, pa, pt, plm = [], [], [], []
            for _ in range(J):
                a = jnp.argmin(pool_m, axis=1)       # (S,)
                m = jnp.min(pool_m, axis=1)
                rsrc = jnp.take_along_axis(rmin_s, a[:, None], 1)[:, 0]
                pv.append(m)
                pa.append(a.astype(jnp.float32))
                pt.append(jnp.take_along_axis(srct_s,
                                              a[:, None], 1)[:, 0])
                plm.append(m - rsrc)                 # bo cost only
                pool_m = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, pool_m.shape, 1)
                    == a[:, None], INF, pool_m)
            bo_v = jnp.stack(pv, 1)                  # (S,J)
            bo_a = jnp.stack(pa, 1)
            bo_t = jnp.stack(pt, 1)
            bo_lm = jnp.stack(plm, 1)
            # ---- fold roots to word level ----
            rv = rmin_s[:, vtab]                     # (S,V,maxvar)
            am1 = jnp.argmin(rv, axis=2)             # (S,V)
            rword_v = jnp.min(rv, axis=2)
            rword_a = vtab[jnp.arange(V)[None, :], am1]
            rword_v = jnp.where(word_has_var[None, :], rword_v, INF)
            tw = jnp.take_along_axis(srct_s, rword_a, axis=1)
            rword_ext = jnp.concatenate([rword_v, rmin_s[:, P:P + 1]],
                                        1)           # (S,V+1)
            rarg_ext = jnp.concatenate(
                [rword_a, jnp.full((S, 1), P, jnp.int32)], 1)
            time_ext = jnp.concatenate([tw, srct_s[:, P:P + 1]], 1)
            # ---- explicit pool: this word's arc rows ----
            stab = srcw_tab[sw]                      # (S, maxdeg)
            ctab = costw_tab[sw]
            cand = jnp.take_along_axis(rword_ext, stab, axis=1) + ctab
            cols = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
            taken = jnp.zeros(cand.shape, bool)
            vs, sws, lms = [], [], []
            for _ in range(J):
                m = jnp.where(taken, INF, cand)
                a = jnp.argmin(m, axis=1)            # (S,)
                vs.append(jnp.min(m, axis=1))
                sws.append(jnp.take_along_axis(stab,
                                               a[:, None], 1)[:, 0])
                lms.append(jnp.take_along_axis(ctab,
                                               a[:, None], 1)[:, 0])
                taken = taken | (cols == a[:, None])
            ex_v = jnp.stack(vs, 1)                  # (S,J)
            ex_sw = jnp.stack(sws, 1)
            ex_lm = jnp.stack(lms, 1)
            ex_a = jnp.take_along_axis(rarg_ext, ex_sw, axis=1
                                       ).astype(jnp.float32)
            ex_t = jnp.take_along_axis(time_ext, ex_sw, axis=1)
            # ---- merge pools: top-J of 2J ----
            uni_s = uni[sw][:, None]                 # (S,1)
            all_v = jnp.concatenate([bo_v + uni_s, ex_v], axis=1)
            all_a = jnp.concatenate([bo_a, ex_a], axis=1)
            all_t = jnp.concatenate([bo_t, ex_t], axis=1)
            all_lm = jnp.concatenate([bo_lm + uni_s, ex_lm], axis=1)
            mv, ma, mt, mlm = [], [], [], []
            for _ in range(J):
                a = jnp.argmin(all_v, axis=1)
                mv.append(jnp.min(all_v, axis=1))
                ma.append(jnp.take_along_axis(all_a,
                                              a[:, None], 1)[:, 0])
                mt.append(jnp.take_along_axis(all_t,
                                              a[:, None], 1)[:, 0])
                mlm.append(jnp.take_along_axis(all_lm,
                                               a[:, None], 1)[:, 0])
                all_v = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, all_v.shape, 1)
                    == a[:, None], INF, all_v)
            ecv = jnp.stack(mv, 1)                   # (S,J) sorted
            esv = jnp.stack(ma, 1)
            etv = jnp.stack(mt, 1)
            elv = jnp.stack(mlm, 1)
            # ---- per-candidate beam filter (matches the round-2
            # elementwise keep); j=0 always kept (it defines the
            # survivor, and forced Viterbi entries must stay)
            bent_s = bentry[st, sw, sb]              # (S,)
            cut = best[sb] + beam + 1e-3
            valid = ecv + bent_s[:, None] <= cut[:, None]
            valid = valid.at[:, 0].set(True)
            return ecv, esv, etv, elv, valid

        return jax.jit(pools)

    def _make_backward_step(self, B: int):
        """EXACT device backward (beta) pass over the same graph —
        the mirror of the forward scan.  Emits per frame:
        bentry[t, w] = best completion cost of ENTERING word w with
        frame t (pron + first-frame am + beta of the word interior),
        and broots[t, p] = beta of variant root p AFTER frame t.
        These turn the survivor filters into exact alpha+beta beam
        decisions against the global best (the reference prunes raw
        lattices the same way, just on host)."""
        import jax
        import jax.numpy as jnp
        g = self.g
        N, P, V = g.N, g.P, g.V
        c = self._c
        use_sil = g.use_sil
        word_has_var = self._word_has_var
        vtab = self._vtab
        rev_buckets = self._rev_buckets
        rev_inv = self._rev_inv_perm
        ctxw = jnp.asarray(self._ctx_word)
        uni = c["uni"]
        lm_bo = jnp.asarray(g.lm.bo)

        def frame(carry, x):
            bcost, broots, bsil = carry       # beta AFTER frame t
            am_t, act = x                     # am at frame t
            amf = am_t[c["pdf_fwd_row"]] + c["tr_fwd_pad"]
            ams = am_t[c["pdf_self_row"]] + c["tr_self_pad"]
            am_end = am_t[c["pdf_end"]] + c["tr_end"]        # (P,B)
            am_rs = am_t[c["pdf_root_self"]] + c["tr_root_self"]
            # ---- ys: entry/arrival betas for frame t -----------------
            cand_var = jnp.where(
                c["k1_mask"], am_end + broots[:P],
                amf[c["first_row_of_var"]]
                + bcost[c["first_row_of_var"]]) + c["end_pron_cost"]
            bentry = jnp.min(cand_var[vtab], axis=1)     # (V,B)
            bentry = jnp.where(word_has_var[:, None], bentry, INF)
            ys = (bentry, broots[:P])
            # ---- update to beta BEFORE frame t -----------------------
            rolled = jnp.roll(bcost, -1, axis=0)
            amf_next = jnp.roll(amf, -1, axis=0)
            next_val = jnp.where(
                c["is_end_row"],
                am_end[c["var_of_row"]] + broots[c["var_of_row"]],
                amf_next + rolled)
            bcost_new = jnp.minimum(ams + bcost, next_val)
            h = jnp.min(uni + bentry, axis=0)            # (B,)
            parts = []
            for (dtab, ctab) in rev_buckets:
                cnd = bentry[dtab] + ctab[..., None]
                parts.append(jnp.min(cnd, axis=1))
            expl_u = jnp.concatenate(parts, 0)[rev_inv]  # (V+1,B)
            eb = jnp.minimum(lm_bo[:, None] + h[None, :], expl_u)
            wordexit = eb[ctxw]                          # (P+1,B)
            root_self = jnp.concatenate(
                [am_rs + broots[:P], jnp.full((1, B), INF, jnp.float32)],
                axis=0)
            broots_new = jnp.minimum(root_self,
                                     wordexit + c["nosil"])
            if use_sil:
                sil_in = g.sil_cost + g.sil_tr_fwd + \
                    am_t[g.sil_pdf_fwd][None, :] + bsil
                broots_new = jnp.minimum(broots_new, sil_in)
                bsil_new = jnp.minimum(
                    g.sil_tr_self + am_t[g.sil_pdf_self][None, :] + bsil,
                    wordexit)
            else:
                bsil_new = bsil
            bcost_new = jnp.where(act[None, :], bcost_new, bcost)
            broots_new = jnp.where(act[None, :], broots_new, broots)
            bsil_new = jnp.where(act[None, :], bsil_new, bsil)
            return (bcost_new, broots_new, bsil_new), ys

        def backward(binit_roots, binit_sil, am, active):
            bcost0 = jnp.full((N, B), INF, jnp.float32)
            _, ys = jax.lax.scan(frame, (bcost0, binit_roots, binit_sil),
                                 (am, active), reverse=True)
            return ys        # (bentry (T,V,B), broots (T,P,B))

        return jax.jit(backward)

    def _make_lat_post(self, B: int, beam: float):
        """Device pruning after forward + backward: surviving WORD
        positions are those whose best (j=0) entry's EXACT alpha+beta
        path cost is within `beam` of the lane's best final cost —
        the true raw-lattice beam — packed to bitmasks before the
        (tunneled, slow) D2H.  Per-candidate (j>0) filtering happens
        in _make_surv_pools."""
        import jax
        import jax.numpy as jnp
        g = self.g
        P, V = g.P, g.V
        Vp8 = _round_up(V, 8)
        Pp8 = _round_up(P, 8)

        def post(entry_all, bentry, broots_b, take_end, arr_cost,
                 roots_all, am_rs, best, lengths):
            T = entry_all.shape[0]
            cut = best + beam + 1e-3                     # (B,)
            keep = entry_all + bentry <= cut[None, None, :]  # (T,V,B)
            keepp = jnp.concatenate(
                [keep, jnp.zeros((T, Vp8 - V, B), bool)], axis=1)
            flat = keepp.reshape(T, Vp8 // 8, 8, B).astype(jnp.int32)
            w8 = (1 << jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1),
                                                2))
            bits = (flat * w8[0]).sum(axis=2).astype(jnp.uint8)
            arr_keep = take_end & (arr_cost + broots_b
                                   <= cut[None, None, :])
            te_pad = jnp.concatenate(
                [arr_keep, jnp.zeros((T, Pp8 - P, B), bool)], axis=1)
            tf = te_pad.reshape(T, Pp8 // 8, 8, B).astype(jnp.int32)
            te_bits = (tf * w8[0]).sum(axis=1 + 1).astype(jnp.uint8)
            am_cs = jnp.cumsum(am_rs, axis=0)            # (T,P,B)
            idx = jnp.maximum(lengths - 1, 0)[None, None, :]
            alpha_fin = jnp.take_along_axis(
                roots_all, jnp.broadcast_to(idx, (1, P + 1, B)),
                axis=0)[0]
            return bits, te_bits, am_cs, alpha_fin

        return jax.jit(post)

    def _gather_jit(self, name, fn, n):
        """Jitted padded gather cache (pow2 sizes)."""
        import jax
        S = 1 << max(int(np.ceil(np.log2(max(n, 1)))), 4)
        key = (name, S)
        if key not in self._jit:
            self._jit[key] = jax.jit(fn)
        return self._jit[key], S

    def decode_batch_lattice(self, loglikes, acoustic_scale: float = 1.0,
                             lengths: Optional[Sequence[int]] = None,
                             lattice_beam: float = 8.0, J: int = 4,
                             stats: Optional[Dict[str, float]] = None):
        """Full word-lattice decode: per lane a Lattice (ilabel=tid,
        olabel=word id, weights (graph, acoustic)) pruned to
        `lattice_beam`, or None.  Within-word alignments of non-best
        entry alternatives reuse the winner's time span (self-loop
        frames distributed on the last chain row), matching the
        block-chain lattice contract."""
        import time as _time
        import jax.numpy as jnp
        g = self.g
        N, P, V = g.N, g.P, g.V
        B, T, Pdf = loglikes.shape
        lengths = np.asarray(lengths if lengths is not None
                             else [T] * B, np.int64)
        key = ("lat", B, J)
        if key not in self._jit:
            self._jit[key] = self._make_lattice_step(B, J)
        fwd = self._jit[key]
        am = jnp.transpose(jnp.asarray(loglikes) * (-acoustic_scale),
                           (1, 2, 0))
        active = jnp.asarray(np.arange(T)[:, None] < lengths[None, :])
        cost0 = jnp.full((N, B), INF, jnp.float32)
        ent0 = jnp.zeros((N, B), jnp.float32)
        roots0 = jnp.full((P + 1, B), INF, jnp.float32).at[P].set(0.0)
        sil0 = jnp.full((P + 1, B), INF, jnp.float32)
        silt0 = jnp.full((P + 1, B), -1.0, jnp.float32)
        _t0 = _time.time()
        roots_fin, sil_fin, sil_t_fin, ys = fwd(
            cost0, ent0, roots0, sil0, silt0, am, active)
        (rmin_all, srct_all, entry_all, arr_cost_d, arr_te_d,
         take_end_d, roots_all, am_rs) = ys
        if stats is not None:            # sync for stage attribution
            np.asarray(roots_fin[0, 0])
            stats["fwd_scan_s"] = _time.time() - _t0
            _t1 = _time.time()
        # lane-best final costs (the alpha+beta cut anchor)
        eos = self._c["eos"]
        fin_root = roots_fin + eos
        fin_sil = sil_fin + eos if g.use_sil else \
            jnp.full_like(fin_root, INF)
        best_d = jnp.minimum(jnp.min(fin_root, axis=0),
                             jnp.min(fin_sil, axis=0))
        # exact backward pass
        bkey = ("latbwd", B)
        if bkey not in self._jit:
            self._jit[bkey] = self._make_backward_step(B)
        eosr_np = self.g.lm.eos[self._ctx_word]
        binit = jnp.broadcast_to(
            jnp.asarray(eosr_np.astype(np.float32))[:, None],
            (P + 1, B))
        bentry_d, broots_d = self._jit[bkey](
            binit, binit if g.use_sil else jnp.full_like(binit, INF),
            am, active)
        if stats is not None:
            np.asarray(bentry_d[0, 0, 0])
            stats["bwd_scan_s"] = _time.time() - _t1
            _t1 = _time.time()
        pkey = ("latpost", B, float(lattice_beam))
        if pkey not in self._jit:
            self._jit[pkey] = self._make_lat_post(B, lattice_beam)
        bits_d, te_bits_d, am_cs_d, alpha_fin_d = \
            self._jit[pkey](entry_all, bentry_d, broots_d, take_end_d,
                            arr_cost_d, roots_all, am_rs, best_d,
                            jnp.asarray(lengths.astype(np.int32)))
        bits = np.asarray(bits_d)
        te_bits = np.asarray(te_bits_d)
        alpha_fin = np.asarray(alpha_fin_d)
        sil_fin_np = np.asarray(sil_fin)
        sil_t_fin_np = np.asarray(sil_t_fin)
        if stats is not None:
            stats["post_s"] = _time.time() - _t1
            stats["fwd_s"] = _time.time() - _t0
        _t0 = _time.time()
        Vp8 = _round_up(V, 8)
        Pp8 = _round_up(P, 8)

        def sparse_unpack(packed):
            """(T, nbytes, B) uint8 -> (t, bitindex, b) of set bits —
            sparse: only nonzero BYTES are expanded (survivor masks
            are overwhelmingly zero after exact pruning)."""
            Tn, nbytes, Bn = packed.shape
            flat = np.ascontiguousarray(packed).reshape(-1)
            nz = np.flatnonzero(flat)
            if not len(nz):
                z = np.zeros(0, np.int64)
                return z, z, z
            vals = flat[nz]
            bits8 = np.unpackbits(vals[:, None], axis=1,
                                  bitorder="little")   # (n, 8)
            byi, bit = np.nonzero(bits8)
            g_t = nz[byi] // (nbytes * Bn)
            rem = nz[byi] % (nbytes * Bn)
            g_byte = rem // Bn
            g_b = rem % Bn
            return g_t, g_byte * 8 + bit, g_b

        st, sw, sb = sparse_unpack(bits)     # word-level survivors
        m = (sw < V) & (st < lengths[sb])
        sb, st, sw = sb[m], st[m], sw[m]
        at_, ap, ab = sparse_unpack(te_bits)
        ma = (ap < P) & (at_ < lengths[ab])
        ab, at_, ap = ab[ma], at_[ma], ap[ma]
        if stats is not None:
            stats["unpack_s"] = _time.time() - _t0
            stats["n_arrival"] = len(ab)
        _t0 = _time.time()
        import jax

        # arrival payloads first (their entry times drive force-keep)
        def g3(ac, ate, ti, pi, bi):
            return ac[ti, pi, bi], ate[ti, pi, bi]
        fn3, S3 = self._gather_jit("lat_g3", g3, len(ab))
        pad3 = S3 - len(ab)
        args3 = [jnp.asarray(np.pad(x, (0, pad3))) for x in
                 (at_, ap, ab)]
        arrc, arrte = (np.asarray(a)[:len(ab)] for a in
                       fn3(arr_cost_d, arr_te_d, *args3))
        arrte = np.rint(arrte).astype(np.int64)
        word_of_var = g.pron_word
        # force-keep: the word entry feeding every arrival must
        # survive, or the Viterbi path itself is lost when the device
        # beam filter is tight (vectorized set diff over encoded
        # (b, te, w) keys)
        req_key = (ab * T + np.maximum(arrte, 0)) * V + word_of_var[ap]
        req_key = np.unique(req_key)
        have_key = np.unique((sb * T + st) * V + sw)
        missing = np.setdiff1d(req_key, have_key, assume_unique=True)
        if len(missing):
            mb = missing // (T * V)
            mt = (missing // V) % T
            mw = missing % V
            sb = np.concatenate([sb, mb])
            st = np.concatenate([st, mt])
            sw = np.concatenate([sw, mw])
        if stats is not None:
            stats["n_word_surv"] = len(sb)

        # top-J entry pools computed only at survivor positions
        # (gather-compute over the scan's rmin/src_time dumps)
        spkey = ("latsurv", B, J, float(lattice_beam))
        if spkey not in self._jit:
            self._jit[spkey] = self._make_surv_pools(B, J, lattice_beam)
        n_sv = len(sb)
        Sp = 1 << max(int(np.ceil(np.log2(max(n_sv, 1)))), 4)
        padn = Sp - n_sv
        ecv2, esv2, etv2, elv2, valid2 = self._jit[spkey](
            rmin_all, srct_all, bentry_d, best_d,
            jnp.asarray(np.pad(st, (0, padn))),
            jnp.asarray(np.pad(sw, (0, padn))),
            jnp.asarray(np.pad(sb, (0, padn))))
        ecv2, esv2, etv2, elv2, valid2 = (
            np.asarray(a)[:n_sv] for a in
            (ecv2, esv2, etv2, elv2, valid2))
        keepf = valid2.reshape(-1)
        sb_r = np.repeat(sb, J)[keepf]
        st_r = np.repeat(st, J)[keepf]
        sw_r = np.repeat(sw, J)[keepf]
        ecv = ecv2.reshape(-1)[keepf]
        esv = esv2.reshape(-1)[keepf]
        etv = etv2.reshape(-1)[keepf]
        elv = elv2.reshape(-1)[keepf]

        # winning (j=0) entry value per arrival from the scan's dump
        def g1(ea, ti, wi, bi):
            return ea[ti, wi, bi]
        fn1, S1 = self._gather_jit("lat_g1", g1, len(ab))
        pad1 = S1 - len(ab)
        argw = jnp.asarray(np.pad(word_of_var[ap], (0, pad1)))
        argt = jnp.asarray(np.pad(np.maximum(arrte, 0), (0, pad1)))
        argb = jnp.asarray(np.pad(ab, (0, pad1)))
        entry_win = np.asarray(fn1(entry_all, argt, argw,
                                   argb))[:len(ab)]
        sb, st, sw = sb_r, st_r, sw_r
        if stats is not None:
            stats["n_entry"] = len(sb)
            stats["gather_s"] = _time.time() - _t0
        _t0 = _time.time()
        # vectorized arc expansion: each arrival joins the sorted
        # survivor span of its (b, te, w) key
        surv_key = (sb * T + st) * V + sw
        order = np.argsort(surv_key, kind="stable")
        surv_key_s = surv_key[order]
        fin_ok = np.isfinite(entry_win) & (entry_win < INF / 2)
        keys = (ab * T + np.maximum(arrte, 0)) * V + word_of_var[ap]
        lo = np.searchsorted(surv_key_s, keys)
        hi = np.searchsorted(surv_key_s, keys, side="right")
        counts = np.where(fin_ok, hi - lo, 0)
        total = int(counts.sum())
        arr_i = np.repeat(np.arange(len(ab)), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = lo[arr_i] + (np.arange(total) - starts[arr_i])
        sidx = order[pos]
        a_cost = (arrc[arr_i] - entry_win[arr_i]
                  + ecv[sidx]).astype(np.float64)
        a_lm = elv[sidx].astype(np.float64)
        a_srcp = np.rint(esv[sidx]).astype(np.int64)
        a_srct = np.rint(etv[sidx]).astype(np.int64)
        a_dstp = ap[arr_i]
        a_dstt = at_[arr_i]
        a_te = arrte[arr_i]
        a_b = ab[arr_i]
        ok = np.isfinite(a_cost) & (a_cost < INF / 2)
        (a_cost, a_lm, a_srcp, a_srct, a_dstp, a_dstt, a_te, a_b) = (
            x[ok] for x in (a_cost, a_lm, a_srcp, a_srct, a_dstp,
                            a_dstt, a_te, a_b))
        if stats is not None:
            stats["expand_s"] = _time.time() - _t0
            stats["n_arcs"] = len(a_cost)
        _t0 = _time.time()
        # ---- global node set + ONE batched gather of node alphas and
        # am-cumsum values (replaces two full (T,P,B) D2H transfers,
        # ~30MB over the ~20MB/s tunnel) ------------------------------
        eosr = self.g.lm.eos[self._ctx_word]
        fin_r_all = alpha_fin[:P, :] + eosr[:P, None]       # (P,B)
        fin_s_all = (sil_fin_np[:P, :] + eosr[:P, None]) if g.use_sil \
            else np.full((P, B), np.inf, np.float32)
        fin_beg_all = (sil_fin_np[P, :] + eosr[P]) if g.use_sil \
            else np.full(B, np.inf, np.float32)
        best_all = np.minimum(np.minimum(fin_r_all.min(0),
                                         fin_s_all.min(0)), fin_beg_all)
        cutoff_all = best_all + lattice_beam + 1e-4
        gk = []
        src_ok = ~((a_srcp >= P) | (a_srct < 0))
        gk.append((a_b * P + a_dstp) * T + a_dstt)
        gk.append(((a_b * P + a_srcp) * T + a_srct)[src_ok])
        fp, fb = np.nonzero(fin_r_all <= cutoff_all[None, :])
        gk.append((fb * P + fp) * T + (lengths[fb] - 1))
        if g.use_sil:
            sp, sb2 = np.nonzero(fin_s_all <= cutoff_all[None, :])
            tsrc = np.rint(sil_t_fin_np[sp, sb2]).astype(np.int64)
            ok2 = tsrc >= 0
            gk.append(((sb2 * P + sp) * T + tsrc)[ok2])
        gkeys = np.unique(np.concatenate(gk))
        n_b = gkeys // (P * T)
        n_p = (gkeys // T) % P
        n_t = gkeys % T

        def g2(ra, cs, ti, pi, bi):
            return ra[ti, pi, bi], cs[ti, pi, bi]
        fn2, S2 = self._gather_jit("lat_g2", g2, len(gkeys))
        pad2 = S2 - len(gkeys)
        argn = [jnp.asarray(np.pad(x, (0, pad2)))
                for x in (n_t, n_p, n_b)]
        node_alpha_all, node_amcs_all = (
            np.asarray(a)[:len(gkeys)] for a in
            fn2(roots_all, am_cs_d, *argn))
        if stats is not None:
            stats["nodegather_s"] = _time.time() - _t0
            stats["n_nodes"] = len(gkeys)
        _t0 = _time.time()
        lats = []
        for b in range(B):
            sel = np.nonzero(a_b == b)[0]
            nsel = np.nonzero(n_b == b)[0]
            lats.append(self._assemble_lane(
                b, int(lengths[b]), T,
                a_srcp[sel], a_srct[sel], a_dstp[sel], a_dstt[sel],
                a_cost[sel], a_lm[sel], a_te[sel],
                gkeys[nsel] % (P * T), node_alpha_all[nsel],
                node_amcs_all[nsel],
                alpha_fin[:, b], sil_fin_np[:, b], sil_t_fin_np[:, b],
                lattice_beam))
        if stats is not None:
            stats["assemble_s"] = _time.time() - _t0
        return lats

    def _assemble_lane(self, b, Tb, T, a_srcp, a_srct, a_dstp, a_dstt,
                       a_cost, a_lm, a_te, node_keys, node_alpha,
                       node_amcs, alpha_fin, sil_fin, sil_t_fin, beam):
        """Host lattice assembly for one lane with exact alpha+beta
        pruning on the word-event node graph.  Arc arrays arrive
        pre-expanded and node alphas/am-cumsums pre-gathered
        (decode_batch_lattice batches both across all lanes)."""
        from kaldi_tpu.fstext.fst import Arc, LatticeWeight, VectorFst
        from kaldi_tpu.fstext.ops import connect
        g = self.g
        P, V = g.P, g.V
        if Tb == 0 or len(a_cost) == 0 or len(node_keys) == 0:
            return None
        eosr = self.g.lm.eos[self._ctx_word]           # (P+1,)
        fin_r = alpha_fin[:P] + eosr[:P]
        fin_s = sil_fin[:P] + eosr[:P] if g.use_sil else \
            np.full(P, np.inf)
        fin_s_begin = sil_fin[P] + eosr[P] if g.use_sil else np.inf
        best = min(float(np.min(fin_r)), float(np.min(fin_s)),
                   float(fin_s_begin))
        if not np.isfinite(best) or best >= INF / 2:
            return None
        cutoff = best + beam + 1e-4

        # ---- node set: pre-gathered (sorted by p * T + t) -----------
        # start node = -1 (p == P or t < 0 on source side)
        src_is_start = (a_srcp >= P) | (a_srct < 0)
        src_keys = np.where(src_is_start, -1, a_srcp * T + a_srct)
        dst_keys = a_dstp * T + a_dstt
        node_p = node_keys // T
        node_t = node_keys % T
        node_alpha = node_alpha.astype(np.float64)
        n = len(node_keys)
        src_i = np.where(src_is_start, -1,
                         np.searchsorted(node_keys, src_keys))
        dst_i = np.searchsorted(node_keys, dst_keys)
        # ---- self-extension arcs between consecutive same-p nodes ---
        # node_keys sorted by (p, t): consecutive entries with equal p
        same = node_p[1:] == node_p[:-1]
        ss = np.nonzero(same)[0]
        sd = ss + 1
        s_ac = (node_amcs[sd] - node_amcs[ss]).astype(np.float64)
        s_cost = (node_t[sd] - node_t[ss]) * \
            np.asarray(g.tr_root_self, np.float64)[node_p[ss]] + s_ac
        # ---- final-silence arcs -------------------------------------
        # a path may end inside a silence shadow: arc from node
        # (p, sil_t_fin[p]) consuming trailing sil frames
        fin_sil_arcs = []
        if g.use_sil:
            for p in range(P + 1):
                val = fin_s[p] if p < P else fin_s_begin
                if not np.isfinite(val) or val > cutoff:
                    continue
                t_src = int(round(float(sil_t_fin[p])))
                src = -1 if (p >= P or t_src < 0) else \
                    int(np.searchsorted(node_keys, p * T + t_src))
                if src >= 0 and (src >= n
                                 or node_keys[src] != p * T + t_src):
                    continue          # source node not in graph
                fin_sil_arcs.append((src, p, t_src,
                                     float(sil_fin[p])))
        # ---- beta over the node graph -------------------------------
        beta = np.full(n, np.inf)
        last = node_t == Tb - 1
        beta[last] = eosr[node_p[last]]
        arc_src_t = np.where(src_is_start, -1, a_srct)
        arc_delta = a_cost - \
            np.where(src_is_start, 0.0, node_alpha[np.maximum(src_i, 0)])
        # final-silence contributions to beta (fin_s includes eos)
        for (src, p, t_src, _val) in fin_sil_arcs:
            if src >= 0:
                fv = fin_s[p] if p < P else fin_s_begin
                beta[src] = min(beta[src], fv - node_alpha[src])
        for f in range(Tb - 1, -2, -1):
            # self-extension arcs with src time f
            if len(ss):
                m_s = node_t[ss] == f
                if m_s.any():
                    cand = np.asarray(s_cost)[m_s] + beta[sd[m_s]]
                    np.minimum.at(beta, ss[m_s], cand)
            wa = np.nonzero(arc_src_t == f)[0]
            if len(wa):
                cand = arc_delta[wa] + beta[dst_i[wa]]
                np.minimum.at(beta, src_i[wa], cand)
        # ---- prune + build ------------------------------------------
        keep_node = node_alpha + beta <= cutoff
        lat = VectorFst(LatticeWeight)
        nodes: Dict[int, int] = {}
        start = lat.add_state()
        lat.set_start(start)

        def node_state(i):
            s = nodes.get(i)
            if s is None:
                s = lat.add_state()
                nodes[i] = s
            return s

        def emit_chain(cur, dst_state, p, te, t, olabel, graph, acous):
            """Arc path for one word instance of variant p spanning
            [te, t] (dur = t - te + 1)."""
            e = int(g.end_row[p])
            k = len(g.prons[p])
            dur = t - te + 1
            tids = []
            if e >= 0:
                first_row = e - (k - 2)
                tids = [int(g.tid_fwd_row[r])
                        for r in range(first_row, e + 1)]
                tids += [int(g.tid_self_row[e])] * (dur - k)
            tids.append(int(g.tid_end[p]))
            for q, tid in enumerate(tids):
                lastq = q == len(tids) - 1
                nxt = dst_state if lastq else lat.add_state()
                wgt = (graph, acous) if q == 0 else (0.0, 0.0)
                lat.add_arc(cur, Arc(tid, olabel if q == 0 else 0,
                                     wgt, nxt))
                cur = nxt

        def emit_sil(cur, n_frames):
            for q in range(n_frames):
                nxt = lat.add_state()
                lat.add_arc(cur, Arc(
                    int(g.sil_tid_fwd if q == 0 else g.sil_tid_self),
                    0, (0.0, 0.0), nxt))
                cur = nxt
            return cur

        src_alpha_arr = np.where(src_is_start, 0.0,
                                 node_alpha[np.maximum(src_i, 0)])
        keep_arc = keep_node[dst_i] & \
            (src_is_start | keep_node[np.maximum(src_i, 0)]) & \
            (src_alpha_arr + arc_delta + beta[dst_i] <= cutoff)
        for i in np.nonzero(keep_arc)[0]:
            src_t = int(a_srct[i])
            p, t, te = int(a_dstp[i]), int(a_dstt[i]), int(a_te[i])
            lm_cost = float(a_lm[i])
            is_start = bool(src_is_start[i])
            di = int(dst_i[i])
            cur = start if is_start else node_state(int(src_i[i]))
            dst = node_state(di)
            n_sil = (te - 1) - src_t
            k = len(g.prons[p])
            dur = t - te + 1
            e = int(g.end_row[p])
            # graph cost decomposition
            gcost = lm_cost + float(g.pron_cost[p]) + float(g.tr_end[p])
            if e >= 0:
                first_row = e - (k - 2)
                gcost += float(np.sum(g.tr_fwd_row[first_row:e + 1]))
                gcost += (dur - k) * float(g.tr_self_row[e])
            if n_sil > 0:
                gcost += g.sil_cost + g.sil_tr_fwd + \
                    (n_sil - 1) * g.sil_tr_self
            else:
                gcost += g.nosil_cost
            acous = float(arc_delta[i]) - gcost
            if n_sil > 0:
                mid = emit_sil(cur, n_sil)
                # silence carries its share of the graph cost on its
                # first arc; fold all into the word arc instead (the
                # split across arcs is a convention, totals are exact)
                cur = mid
            emit_chain(cur, dst, p, te, t, int(g.pron_word[p]) + 1,
                       gcost, acous)
        # self-extension arcs
        for k2 in range(len(ss)):
            i0, i1 = int(ss[k2]), int(sd[k2])
            if not (keep_node[i0] and keep_node[i1]):
                continue
            if node_alpha[i0] + s_cost[k2] + beta[i1] > cutoff:
                continue
            p = int(node_p[i0])
            t0, t1 = int(node_t[i0]), int(node_t[i1])
            cur = nodes.get(i0)
            if cur is None:
                continue
            dstn = node_state(i1)
            gc = (t1 - t0) * float(g.tr_root_self[p])
            for q in range(t0 + 1, t1 + 1):
                lastq = q == t1
                nxt = dstn if lastq else lat.add_state()
                wgt = (gc, float(s_ac[k2])) if q == t0 + 1 else \
                    (0.0, 0.0)
                lat.add_arc(cur, Arc(int(g.tid_root_self[p]), 0, wgt,
                                     nxt))
                cur = nxt
        # finals
        for i, s in list(nodes.items()):
            if int(node_t[i]) == Tb - 1:
                lat.set_final(s, (float(eosr[int(node_p[i])]), 0.0))
        # final-silence arcs
        for (src, p, t_src, sil_alpha) in fin_sil_arcs:
            if src >= 0 and src not in nodes:
                continue
            cur = start if src < 0 else nodes[src]
            src_alpha = 0.0 if src < 0 else float(node_alpha[src])
            n_frames = (Tb - 1) - t_src
            if n_frames <= 0:
                continue
            gcost = g.sil_cost + g.sil_tr_fwd + \
                (n_frames - 1) * g.sil_tr_self
            acous = (sil_alpha - src_alpha) - gcost
            nxt = lat.add_state()
            lat.add_arc(cur, Arc(int(g.sil_tid_fwd), 0, (gcost, acous),
                                 nxt))
            for q in range(1, n_frames):
                nn = lat.add_state()
                lat.add_arc(nxt, Arc(int(g.sil_tid_self), 0,
                                     (0.0, 0.0), nn))
                nxt = nn
            lat.set_final(nxt, (float(eosr[min(p, P)]), 0.0))
        connect(lat)
        if lat.num_states == 0 or lat.start is None:
            return None
        return lat
