"""Sparse backoff trigram LM in flat arrays — the n-gram device
decoder's first-pass LM (decoder/lexchain_ng.py).

The reference decodes its headline numbers with a PRUNED TRIGRAM first
pass (tgsmall; egs/librispeech/s5/local/chain/tuning/run_tdnn_1d.sh:21)
statically compiled into HCLG (lm/arpa-lm-compiler.h:32).  The TPU
decoder keeps the LM factored at decode time, so what it needs is the
ARPA state machine itself:

  states   : null, unigram states u in [0, V] (V = <s>),
             pair states s = (u, v) — one per explicit bigram context
             that exists at the trigram level or as an explicit bigram
  move     : from uni(u) on w: explicit bigram (u,w) -> pair(u,w);
             backoff bo1(u) -> null -> unigram w -> uni(w)
             from pair(u,v) on w: explicit trigram -> pair(v,w);
             backoff bo2(u,v) -> uni(v) and continue as above
  final    : explicit </s> probabilities at each level, with backoff

Costs are -ln p.  Semantics match the epsilon-backoff G compiled by
the reference (arpa-lm-compiler.cc adds backoff epsilon arcs, so the
tropical G takes the min over routes; the DESTINATION of a move
depends on the route taken — explicit arcs land in the full-history
state, backoff routes land in the unigram state).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError, log

M_LN10 = math.log(10.0)
BIG = 1e10


@dataclass
class TrigramBackoffLm:
    """Backoff trigram over V words; unigram context index V = <s>.

    Pair states are indexed [0, SP); `pair_id` maps (u, v) -> index.
    Explicit bigram arcs are stored twice: flat (bi_src/bi_dst/bi_cost)
    and as `bi_cost_of_pair` aligned with the pair-state table (every
    explicit bigram (u,v) HAS a pair state; pair states may also exist
    purely as trigram contexts, with bi_cost_of_pair = BIG)."""
    words: List[str]                     # V entries
    uni: np.ndarray                      # (V,)   -ln P(w)
    bo1: np.ndarray                      # (V+1,) -ln backoff(u)
    pair_u: np.ndarray                   # (SP,) first word in [0, V]
    pair_v: np.ndarray                   # (SP,) last word in [0, V)
    bo2: np.ndarray                      # (SP,) -ln backoff((u,v))
    bi_cost_of_pair: np.ndarray          # (SP,) -ln P(v|u) or BIG
    tri_src: np.ndarray                  # (E3,) source pair index
    tri_dst_pair: np.ndarray             # (E3,) destination pair index
    tri_cost: np.ndarray                 # (E3,) -ln P(w|u,v)
    eos_uni: float                       # -ln P(</s>)
    eos_bi: np.ndarray                   # (V+1,) explicit -ln P(</s>|u) or BIG
    eos_tri: np.ndarray                  # (SP,)  explicit -ln P(</s>|u,v) or BIG

    # ------------------------------------------------------------------
    @property
    def V(self) -> int:
        return len(self.words)

    @property
    def SP(self) -> int:
        return len(self.pair_u)

    @property
    def num_explicit_bi(self) -> int:
        return int((self.bi_cost_of_pair < BIG / 2).sum())

    @property
    def num_explicit_tri(self) -> int:
        return len(self.tri_src)

    def pair_id_map(self) -> Dict[Tuple[int, int], int]:
        return {(int(u), int(v)): i
                for i, (u, v) in enumerate(zip(self.pair_u, self.pair_v))}

    # ------------------------------------------------------------------
    # host-side scoring (tests, ARPA-FST reference semantics)
    def eos_state_cost(self) -> Tuple[np.ndarray, np.ndarray]:
        """Folded final costs: (uni-level (V+1,), pair-level (SP,))."""
        eos_u = np.minimum(self.eos_bi, self.bo1 + self.eos_uni)
        eos_p = np.minimum(self.eos_tri,
                           self.bo2 + eos_u[self.pair_v])
        return eos_u.astype(np.float32), eos_p.astype(np.float32)

    def moves_from_uni(self, u: int) -> Dict[int, List[Tuple[float, int]]]:
        """All moves from unigram state u: word -> [(cost, dst_state)]
        where dst_state is a pair index or -1 - w for uni(w)."""
        out: Dict[int, List[Tuple[float, int]]] = {}
        for sp in np.nonzero(self.pair_u == u)[0]:
            c = float(self.bi_cost_of_pair[sp])
            if c < BIG / 2:
                w = int(self.pair_v[sp])
                out.setdefault(w, []).append((c, int(sp)))
        for w in range(self.V):
            out.setdefault(w, []).append(
                (float(self.bo1[u] + self.uni[w]), -1 - w))
        return out

    def moves_from_pair(self, sp: int) -> Dict[int, List[Tuple[float, int]]]:
        v = int(self.pair_v[sp])
        out: Dict[int, List[Tuple[float, int]]] = {}
        for e in np.nonzero(self.tri_src == sp)[0]:
            dst = int(self.tri_dst_pair[e])
            w = int(self.pair_v[dst])
            out.setdefault(w, []).append((float(self.tri_cost[e]), dst))
        for w, lst in self.moves_from_uni(v).items():
            for (c, d) in lst:
                out.setdefault(w, []).append((float(self.bo2[sp]) + c, d))
        return out

    def sentence_cost(self, word_ids: Sequence[int]) -> float:
        """Best-path -ln P of the sentence through the state machine
        (host Viterbi over states; tests)."""
        # state -> cost; states: ('u', u) or ('p', sp)
        cur: Dict[Tuple[str, int], float] = {("u", self.V): 0.0}
        for w in word_ids:
            nxt: Dict[Tuple[str, int], float] = {}
            for (kind, s), cost in cur.items():
                moves = self.moves_from_uni(s) if kind == "u" \
                    else self.moves_from_pair(s)
                for (c, d) in moves.get(int(w), []):
                    key = ("p", d) if d >= 0 else ("u", -1 - d)
                    tot = cost + c
                    if tot < nxt.get(key, np.inf):
                        nxt[key] = tot
            cur = nxt
        eos_u, eos_p = self.eos_state_cost()
        best = np.inf
        for (kind, s), cost in cur.items():
            f = eos_u[s] if kind == "u" else eos_p[s]
            best = min(best, cost + float(f))
        return float(best)

    # ------------------------------------------------------------------
    @classmethod
    def from_counts(cls, sentences: Sequence[Sequence[str]],
                    vocab: Optional[Sequence[str]] = None,
                    discount: float = 0.5,
                    prune_bi: int = 1, prune_tri: int = 2
                    ) -> "TrigramBackoffLm":
        """Interpolated absolute-discounting backoff estimate from text
        (Chen & Goodman 'interpolated' form, the in-repo stand-in for
        the SRILM/pocolm builds the reference recipes shell out to).

        P(w|u,v) = max(c(u,v,w)-D,0)/c(u,v) + bo(u,v) P(w|v)
        P(w|v)   = max(c(v,w)-D,0)/c(v)     + bo(v)   P(w)
        Trigrams/bigrams below the prune counts fall to the backoff
        path; every kept trigram's (v,w) bigram is force-kept so the
        state machine is suffix-closed (SRILM guarantees likewise)."""
        if vocab is None:
            vocab = sorted({w for s in sentences for w in s})
        words = list(vocab)
        V = len(words)
        wid = {w: i for i, w in enumerate(words)}
        BOS = V
        EOS = -2                          # sentinel word id for </s>
        uni_c = np.zeros(V)
        eos_total = 0
        bi_c: Dict[Tuple[int, int], int] = {}
        tri_c: Dict[Tuple[int, int, int], int] = {}
        ctx1_c = np.zeros(V + 1)
        ctx2_c: Dict[Tuple[int, int], int] = {}
        for s in sentences:
            ids = [wid[w] for w in s] + [EOS]
            prev2, prev1 = None, BOS
            for w in ids:
                if w >= 0:
                    uni_c[w] += 1
                else:
                    eos_total += 1
                bi_c[(prev1, w)] = bi_c.get((prev1, w), 0) + 1
                ctx1_c[prev1] += 1
                # trigram counting with (prev2, prev1) context; the
                # first word of a sentence has only the <s> bigram ctx
                if prev2 is not None:
                    tri_c[(prev2, prev1, w)] = \
                        tri_c.get((prev2, prev1, w), 0) + 1
                    ctx2_c[(prev2, prev1)] = \
                        ctx2_c.get((prev2, prev1), 0) + 1
                prev2, prev1 = prev1, w
                if w == EOS:
                    break
        # unigram (add-discount smoothing over V words + </s>)
        tot = uni_c.sum() + eos_total
        uni_p = (uni_c + discount) / (tot + discount * (V + 1))
        eos_uni_p = (eos_total + discount) / (tot + discount * (V + 1))
        # ---- bigram level -------------------------------------------
        kept_bi = {k for k, c in bi_c.items() if c >= prune_bi}
        # force-keep (v,w) for every kept trigram (suffix closure)
        kept_tri_all = {k for k, c in tri_c.items() if c >= prune_tri}
        for (u, v, w) in kept_tri_all:
            if v >= 0 and w != EOS:
                kept_bi.add((v, w))
        n1p1 = np.zeros(V + 1)
        for (u, w) in kept_bi:
            n1p1[u] += 1
        bo1 = np.ones(V + 1)
        for u in range(V + 1):
            cu = ctx1_c[u]
            bo1[u] = max(discount * max(n1p1[u], 1.0) / cu, 1e-10) \
                if cu > 0 else 1.0
        def p_bi(u, w):
            cu = ctx1_c[u]
            c = bi_c.get((u, w), 0)
            base = eos_uni_p if w == EOS else uni_p[w]
            if cu == 0:
                return bo1[u] * base
            return max(c - discount, 0.0) / cu + bo1[u] * base
        # ---- trigram level ------------------------------------------
        n1p2: Dict[Tuple[int, int], int] = {}
        for (u, v, w) in kept_tri_all:
            n1p2[(u, v)] = n1p2.get((u, v), 0) + 1
        # pair states: all kept bigrams (u,v) with v a real word, plus
        # any trigram context (u,v)
        pair_set = {(u, v) for (u, v) in kept_bi if v >= 0}
        pair_set |= {(u, v) for (u, v) in n1p2 if v >= 0}
        pairs = sorted(pair_set)
        pid = {p: i for i, p in enumerate(pairs)}
        SP = len(pairs)
        bo2 = np.ones(SP)
        for i, (u, v) in enumerate(pairs):
            c2 = ctx2_c.get((u, v), 0)
            if c2 > 0:
                bo2[i] = max(discount * max(n1p2.get((u, v), 0), 1.0)
                             / c2, 1e-10)
            else:
                bo2[i] = 1.0
        def p_tri(u, v, w):
            c2 = ctx2_c.get((u, v), 0)
            sp = pid[(u, v)]
            if c2 == 0:
                return bo2[sp] * p_bi(v, w)
            return max(tri_c.get((u, v, w), 0) - discount, 0.0) / c2 \
                + bo2[sp] * p_bi(v, w)
        # ---- assemble flat arrays -----------------------------------
        bi_cost_of_pair = np.full(SP, BIG, np.float64)
        for (u, w) in kept_bi:
            if w >= 0:
                bi_cost_of_pair[pid[(u, w)]] = -math.log(p_bi(u, w))
        eos_bi = np.full(V + 1, BIG, np.float64)
        for (u, w) in kept_bi:
            if w == EOS:
                eos_bi[u] = -math.log(p_bi(u, EOS))
        t_src, t_dstp, t_cost = [], [], []
        eos_tri = np.full(SP, BIG, np.float64)
        for (u, v, w) in sorted(kept_tri_all):
            sp = pid.get((u, v))
            if sp is None:          # context (<s>, EOS)-ish degenerate
                continue
            if w == EOS:
                eos_tri[sp] = -math.log(p_tri(u, v, EOS))
                continue
            t_src.append(sp)
            t_dstp.append(pid[(v, w)])
            t_cost.append(-math.log(p_tri(u, v, w)))
        lm = cls(words=words,
                 uni=(-np.log(uni_p)).astype(np.float32),
                 bo1=(-np.log(bo1)).astype(np.float32),
                 pair_u=np.asarray([p[0] for p in pairs], np.int32),
                 pair_v=np.asarray([p[1] for p in pairs], np.int32),
                 bo2=(-np.log(bo2)).astype(np.float32),
                 bi_cost_of_pair=bi_cost_of_pair.astype(np.float32),
                 tri_src=np.asarray(t_src, np.int32),
                 tri_dst_pair=np.asarray(t_dstp, np.int32),
                 tri_cost=np.asarray(t_cost, np.float32),
                 eos_uni=float(-math.log(eos_uni_p)),
                 eos_bi=eos_bi.astype(np.float32),
                 eos_tri=eos_tri.astype(np.float32))
        log(f"TrigramBackoffLm.from_counts: V={V}, {SP} pair states, "
            f"{lm.num_explicit_bi} bigrams, {lm.num_explicit_tri} "
            f"trigrams")
        return lm

    # ------------------------------------------------------------------
    @classmethod
    def from_arpa(cls, lm, vocab: Optional[Sequence[str]] = None,
                  bos: str = "<s>", eos: str = "</s>"
                  ) -> "TrigramBackoffLm":
        """From a parsed ArpaLm (lm/arpa.py).  Orders > 3 are cut to
        the trigram level.  Missing suffix bigrams of kept trigrams get
        a pair state with bo2 = 0 (ArpaLmCompiler's missing-low-order
        handling, arpa-lm-compiler.cc)."""
        uni_tab = lm.ngrams[0]
        if vocab is None:
            vocab = sorted(w for (w,) in uni_tab
                           if w not in (bos, eos, "<unk>", "<UNK>"))
        words = list(vocab)
        V = len(words)
        wid = {w: i for i, w in enumerate(words)}

        def ix(w):
            if w == bos:
                return V
            return wid.get(w)

        uni = np.full(V, 99.0 * M_LN10, np.float32)
        bo1 = np.zeros(V + 1, np.float32)
        eos_uni = 99.0 * M_LN10
        if (eos,) in uni_tab:
            eos_uni = -uni_tab[(eos,)][0] * M_LN10
        for (w,), (lp, b) in uni_tab.items():
            if w == eos:
                continue
            i = ix(w)
            if i is None:
                continue
            if i < V:
                uni[i] = -lp * M_LN10
            bo1[i] = -b * M_LN10
        pair_map: Dict[Tuple[int, int], Tuple[float, float]] = {}
        eos_bi = np.full(V + 1, BIG, np.float64)
        if lm.order >= 2:
            for (u, w), (lp, b) in lm.ngrams[1].items():
                ui = ix(u)
                if ui is None:
                    continue
                if w == eos:
                    eos_bi[ui] = -lp * M_LN10
                    continue
                i = ix(w)
                if i is None or i >= V:
                    continue
                pair_map[(ui, i)] = (-lp * M_LN10, -b * M_LN10)
        tri_list: List[Tuple[int, int, int, float]] = []
        eos_tri_map: Dict[Tuple[int, int], float] = {}
        if lm.order >= 3:
            for (u, v, w), (lp, _b) in lm.ngrams[2].items():
                ui, vi = ix(u), ix(v)
                if ui is None or vi is None or vi >= V:
                    continue
                if (ui, vi) not in pair_map:
                    pair_map[(ui, vi)] = (BIG, 0.0)
                if w == eos:
                    eos_tri_map[(ui, vi)] = -lp * M_LN10
                    continue
                i = ix(w)
                if i is None or i >= V:
                    continue
                if (vi, i) not in pair_map:
                    pair_map[(vi, i)] = (BIG, 0.0)
                tri_list.append((ui, vi, i, -lp * M_LN10))
        pairs = sorted(pair_map)
        pid = {p: i for i, p in enumerate(pairs)}
        SP = len(pairs)
        bo2 = np.asarray([pair_map[p][1] for p in pairs], np.float32)
        bi_cost = np.asarray([pair_map[p][0] for p in pairs], np.float32)
        eos_tri = np.full(SP, BIG, np.float32)
        for (u, v), c in eos_tri_map.items():
            eos_tri[pid[(u, v)]] = c
        t_src = np.asarray([pid[(u, v)] for (u, v, w, c) in tri_list],
                           np.int32)
        t_dstp = np.asarray([pid[(v, w)] for (u, v, w, c) in tri_list],
                            np.int32)
        t_cost = np.asarray([c for (u, v, w, c) in tri_list], np.float32)
        return cls(words=words, uni=uni, bo1=bo1,
                   pair_u=np.asarray([p[0] for p in pairs], np.int32),
                   pair_v=np.asarray([p[1] for p in pairs], np.int32),
                   bo2=bo2, bi_cost_of_pair=bi_cost,
                   tri_src=t_src, tri_dst_pair=t_dstp, tri_cost=t_cost,
                   eos_uni=float(eos_uni),
                   eos_bi=eos_bi.astype(np.float32), eos_tri=eos_tri)

    # ------------------------------------------------------------------
    @classmethod
    def from_bigram(cls, bg) -> "TrigramBackoffLm":
        """Wrap a BigramBackoffLm as a trigram with no pair states'
        trigram level: pair states = explicit bigrams with bo2 = 0 and
        no trigram arcs (exact same distribution; lets one decoder
        serve both orders)."""
        pairs = sorted({(int(u), int(w))
                        for u, w in zip(bg.expl_src, bg.expl_dst)})
        pid = {p: i for i, p in enumerate(pairs)}
        bi_cost = np.full(len(pairs), BIG, np.float32)
        for u, w, c in zip(bg.expl_src, bg.expl_dst, bg.expl_cost):
            i = pid[(int(u), int(w))]
            bi_cost[i] = min(bi_cost[i], float(c))
        # bg.eos is backoff-FOLDED: recover an explicit-only view where
        # cheaper than the backoff route so min semantics match
        eos_bi = np.where(bg.eos < bg.bo + bg.eos_uni - 1e-7,
                          bg.eos, BIG).astype(np.float32)
        return cls(words=list(bg.words), uni=bg.uni.copy(),
                   bo1=bg.bo.copy(),
                   pair_u=np.asarray([p[0] for p in pairs], np.int32),
                   pair_v=np.asarray([p[1] for p in pairs], np.int32),
                   bo2=np.zeros(len(pairs), np.float32),
                   bi_cost_of_pair=bi_cost,
                   tri_src=np.zeros(0, np.int32),
                   tri_dst_pair=np.zeros(0, np.int32),
                   tri_cost=np.zeros(0, np.float32),
                   eos_uni=float(bg.eos_uni), eos_bi=eos_bi,
                   eos_tri=np.full(len(pairs), BIG, np.float32))
