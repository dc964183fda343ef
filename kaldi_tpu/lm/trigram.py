"""Sparse backoff trigram LM in flat arrays — the n-gram device
decoder's first-pass LM (decoder/lexchain_ng.py).

The reference decodes its headline numbers with a PRUNED TRIGRAM first
pass (tgsmall; egs/librispeech/s5/local/chain/tuning/run_tdnn_1d.sh:21)
statically compiled into HCLG (lm/arpa-lm-compiler.h:32).  The TPU
decoder keeps the LM factored at decode time, so what it needs is the
ARPA state machine itself — MINIMIZED the way ArpaLmCompiler builds
it: a state exists only for contexts that distinguish the future.

  states   : null, unigram states u in [0, V] (V = <s>),
             pair states (u, v) ONLY where explicit trigram
             continuations (or an explicit trigram </s>) exist
  moves    : from uni(u) on w:
               explicit bigram (u,w) -> pair(u,w)  [if (u,w) is a state]
               explicit bigram (u,w) FOLDED -> uni(w) with cost
                 bi(u,w) + bo2(u,w)                [otherwise; a state
                 with no explicit continuations is equivalent to its
                 backoff target shifted by the backoff cost]
               backoff bo1(u) -> null -> unigram w -> uni(w)
             from pair(u,v) on w:
               explicit trigram -> pair(v,w) or FOLDED -> uni(w)
               backoff bo2(u,v) -> uni(v), continue as above
  final    : explicit </s> at each level, with backoff

Costs are -ln p.  Backoff weights are mass-exact: pruned n-grams
return their probability to the backoff path, and a context with no
kept continuations has backoff weight 1 (else the state distribution
would not normalize).
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

    Pair states [0, SP) exist only for trigram contexts.  Explicit
    arcs are split by destination kind:
      - `ent_bi_cost[sp]`: the bigram arc INTO pair state sp from
        uni(pair_u[sp]) (BIG if that bigram is not explicit — then the
        state is only reachable through its trigram arcs' sources)
      - fold_src/fold_dst/fold_cost: explicit bigrams whose
        destination state was folded away -> uni(fold_dst); cost
        already includes the folded state's backoff weight
      - tri_src (pair idx) / tri_dst (ENCODED: < SP pair index,
        >= SP folded to uni(tri_dst - SP)) / tri_cost (folded-dest
        costs include the destination pair's backoff weight)."""
    words: List[str]                     # V entries
    uni: np.ndarray                      # (V,)   -ln P(w)
    bo1: np.ndarray                      # (V+1,) -ln backoff(u)
    fold_src: np.ndarray                 # (E2f,) uni context in [0, V]
    fold_dst: np.ndarray                 # (E2f,) word
    fold_cost: np.ndarray                # (E2f,)
    pair_u: np.ndarray                   # (SP,)
    pair_v: np.ndarray                   # (SP,)
    bo2: np.ndarray                      # (SP,)
    ent_bi_cost: np.ndarray              # (SP,) or BIG
    tri_src: np.ndarray                  # (E3,) pair index
    tri_dst: np.ndarray                  # (E3,) encoded destination
    tri_cost: np.ndarray                 # (E3,)
    eos_uni: float
    eos_bi: np.ndarray                   # (V+1,) explicit or BIG
    eos_tri: np.ndarray                  # (SP,)  explicit or BIG

    # ------------------------------------------------------------------
    @property
    def V(self) -> int:
        return len(self.words)

    @property
    def SP(self) -> int:
        return len(self.pair_u)

    @property
    def num_explicit_bi(self) -> int:
        return len(self.fold_src) + int(
            (self.ent_bi_cost < BIG / 2).sum())

    @property
    def num_explicit_tri(self) -> int:
        return len(self.tri_src)

    # ------------------------------------------------------------------
    # host-side scoring (tests, ARPA-FST reference semantics)
    def eos_state_cost(self) -> Tuple[np.ndarray, np.ndarray]:
        """Folded final costs: (uni-level (V+1,), pair-level (SP,))."""
        eos_u = np.minimum(self.eos_bi, self.bo1 + self.eos_uni)
        eos_p = np.minimum(self.eos_tri,
                           self.bo2 + eos_u[self.pair_v]) \
            if self.SP else np.zeros(0, np.float32)
        return eos_u.astype(np.float32), np.asarray(eos_p, np.float32)

    def moves_from_uni(self, u: int) -> Dict[int, List[Tuple[float, int]]]:
        """All moves from unigram state u: word -> [(cost, dst)] with
        dst = pair index >= 0 or -1 - w for uni(w)."""
        out: Dict[int, List[Tuple[float, int]]] = {}
        for sp in np.nonzero(self.pair_u == u)[0]:
            c = float(self.ent_bi_cost[sp])
            if c < BIG / 2:
                out.setdefault(int(self.pair_v[sp]), []).append(
                    (c, int(sp)))
        for e in np.nonzero(self.fold_src == u)[0]:
            w = int(self.fold_dst[e])
            out.setdefault(w, []).append(
                (float(self.fold_cost[e]), -1 - w))
        for w in range(self.V):
            out.setdefault(w, []).append(
                (float(self.bo1[u] + self.uni[w]), -1 - w))
        return out

    def moves_from_pair(self, sp: int) -> Dict[int, List[Tuple[float, int]]]:
        v = int(self.pair_v[sp])
        out: Dict[int, List[Tuple[float, int]]] = {}
        for e in np.nonzero(self.tri_src == sp)[0]:
            d = int(self.tri_dst[e])
            if d < self.SP:
                w = int(self.pair_v[d])
                out.setdefault(w, []).append(
                    (float(self.tri_cost[e]), d))
            else:
                w = d - self.SP
                out.setdefault(w, []).append(
                    (float(self.tri_cost[e]), -1 - w))
        for w, lst in self.moves_from_uni(v).items():
            for (c, d) in lst:
                out.setdefault(w, []).append((float(self.bo2[sp]) + c, d))
        return out

    def sentence_cost(self, word_ids: Sequence[int]) -> float:
        """Best-path -ln P of the sentence through the state machine
        (host Viterbi over states; tests)."""
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
    def _assemble(cls, words, uni, bo1, bi_map, bo2_map, tri_map,
                  eos_uni, eos_bi_map, eos_tri_map):
        """Shared assembly from dict-level tables.

        bi_map: (u,w) -> cost (explicit bigrams, real words only)
        bo2_map: (u,v) -> backoff cost of the pair context (0.0 when
                 unlisted = weight 1)
        tri_map: (u,v,w) -> cost
        eos_bi_map: u -> cost; eos_tri_map: (u,v) -> cost"""
        V = len(words)
        # pair states: contexts that distinguish the future.  Sorted
        # by (v, u) so the states of one word v are CONTIGUOUS: the
        # decoder's per-word backoff fold then runs over monotone
        # index ranges (TPU axis-0 gathers are fast only for monotone
        # indices — a random permutation gather of an (SP, B) plane
        # measured 30 ms/frame at SP=81k, ~20x the whole row update)
        pair_set = sorted({(u, v) for (u, v, w) in tri_map}
                          | set(eos_tri_map),
                          key=lambda p: (p[1], p[0]))
        pid = {p: i for i, p in enumerate(pair_set)}
        SP = len(pair_set)
        pair_u = np.asarray([p[0] for p in pair_set], np.int32)
        pair_v = np.asarray([p[1] for p in pair_set], np.int32)
        bo2 = np.asarray([bo2_map.get(p, 0.0) for p in pair_set],
                         np.float32)
        ent_bi = np.full(SP, BIG, np.float32)
        f_src, f_dst, f_cost = [], [], []
        for (u, w), c in sorted(bi_map.items()):
            sp = pid.get((u, w))
            if sp is not None:
                ent_bi[sp] = c
            else:
                f_src.append(u)
                f_dst.append(w)
                f_cost.append(c + bo2_map.get((u, w), 0.0))
        t_src, t_dst, t_cost = [], [], []
        eos_tri = np.full(SP, BIG, np.float32)
        for (u, v, w), c in sorted(tri_map.items()):
            s = pid[(u, v)]
            d = pid.get((v, w))
            if d is None:
                t_dst.append(SP + w)
                t_cost.append(c + bo2_map.get((v, w), 0.0))
            else:
                t_dst.append(d)
                t_cost.append(c)
            t_src.append(s)
        for (u, v), c in eos_tri_map.items():
            eos_tri[pid[(u, v)]] = c
        eos_bi = np.full(V + 1, BIG, np.float32)
        for u, c in eos_bi_map.items():
            eos_bi[u] = c
        lm = cls(words=list(words),
                 uni=np.asarray(uni, np.float32),
                 bo1=np.asarray(bo1, np.float32),
                 fold_src=np.asarray(f_src, np.int32),
                 fold_dst=np.asarray(f_dst, np.int32),
                 fold_cost=np.asarray(f_cost, np.float32),
                 pair_u=pair_u, pair_v=pair_v, bo2=bo2,
                 ent_bi_cost=ent_bi,
                 tri_src=np.asarray(t_src, np.int32),
                 tri_dst=np.asarray(t_dst, np.int32),
                 tri_cost=np.asarray(t_cost, np.float32),
                 eos_uni=float(eos_uni), eos_bi=eos_bi,
                 eos_tri=eos_tri)
        log(f"TrigramBackoffLm: V={V}, {SP} pair states, "
            f"{lm.num_explicit_bi} bigrams ({len(f_src)} folded), "
            f"{lm.num_explicit_tri} trigrams")
        return lm

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
        Backoff weights return the discounted AND pruned mass, so
        every context distribution sums to one."""
        if vocab is None:
            vocab = sorted({w for s in sentences for w in s})
        words = list(vocab)
        V = len(words)
        wid = {w: i for i, w in enumerate(words)}
        # counting is fully vectorized (the LM-text corpus reaches
        # millions of tokens at vocabulary scale).  Internal EOS code
        # E = V+1; BOS = V; the dict tables handed to _assemble use
        # the original convention (EOS key = -2 never appears there).
        E = V + 1
        lens = np.asarray([len(s) + 1 for s in sentences], np.int64)
        total = int(lens.sum())
        ids = np.full(total, E, np.int64)
        flat = [wid[w] for s in sentences for w in s]
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        body = np.ones(total, bool)
        body[np.cumsum(lens) - 1] = False          # EOS positions
        ids[body] = np.asarray(flat, np.int64)
        prev1 = np.empty(total, np.int64)
        prev1[1:] = ids[:-1]
        prev1[starts] = V                           # BOS
        prev2 = np.full(total, -1, np.int64)
        prev2[1:] = prev1[:-1]
        prev2[starts] = -1                          # no trigram at t=0
        uni_c = np.bincount(ids[ids < V], minlength=V).astype(float)
        eos_total = int((ids == E).sum())
        ctx1_c = np.bincount(prev1, minlength=V + 1).astype(float)
        K = V + 2
        bk, bc = np.unique(prev1 * K + ids, return_counts=True)
        m3 = prev2 >= 0
        tk, tc = np.unique((prev2[m3] * K + prev1[m3]) * K + ids[m3],
                           return_counts=True)
        ck, cc = np.unique(prev2[m3] * K + prev1[m3],
                           return_counts=True)
        tot = uni_c.sum() + eos_total
        uni_p = (uni_c + discount) / (tot + discount * (V + 1))
        eos_uni_p = (eos_total + discount) / (tot + discount * (V + 1))
        # ---- bigram level: mass-exact backoff weights ---------------
        b_u, b_w = bk // K, bk % K
        b_kept = bc >= prune_bi
        disc_mass1 = np.bincount(
            b_u, weights=np.where(b_kept, discount, bc),
            minlength=V + 1)
        has_kept1 = np.zeros(V + 1, bool)
        has_kept1[b_u[b_kept]] = True
        bo1 = np.ones(V + 1)
        m = (ctx1_c > 0) & has_kept1
        bo1[m] = np.maximum(disc_mass1[m] / ctx1_c[m], 1e-10)
        base_all = np.concatenate([uni_p, [0.0, eos_uni_p]])

        def p_bi_vec(u, w):
            """Vector P(w|u) with (u, w) kept-bigram lookup by
            searchsorted into the unique bigram keys."""
            u = np.asarray(u, np.int64)
            w = np.asarray(w, np.int64)
            key = u * K + w
            pos = np.searchsorted(bk, key)
            pos_c = np.minimum(pos, len(bk) - 1) if len(bk) else pos * 0
            hit = (len(bk) > 0) & (bk[pos_c] == key) & b_kept[pos_c] \
                & (ctx1_c[u] > 0)
            expl = np.where(
                hit,
                np.maximum(bc[pos_c] - discount, 0.0)
                / np.maximum(ctx1_c[u], 1.0), 0.0)
            return expl + bo1[u] * base_all[w]
        # ---- trigram level ------------------------------------------
        t_uv, t_w = tk // K, tk % K
        t_u, t_v = t_uv // K, t_uv % K
        t_kept = tc >= prune_tri
        # per-ctx2 discounted mass + has-kept flags over unique ctx2
        cpos = np.searchsorted(ck, t_uv)
        disc_mass2 = np.zeros(len(ck))
        np.add.at(disc_mass2, cpos, np.where(t_kept, discount, tc))
        has_kept2 = np.zeros(len(ck), bool)
        has_kept2[cpos[t_kept]] = True
        bo2_arr = np.ones(len(ck))
        m = (cc > 0) & has_kept2
        bo2_arr[m] = np.maximum(disc_mass2[m] / cc[m], 1e-10)
        bo2_map = {(int(k // K), int(k % K)): float(-np.log(b))
                   for k, b, hm in zip(ck, bo2_arr, m) if hm}
        # ---- dict tables --------------------------------------------
        kb_u, kb_w, kb_p = b_u[b_kept], b_w[b_kept], \
            p_bi_vec(b_u[b_kept], b_w[b_kept])
        bi_map = {(int(u), int(w)): float(-np.log(p))
                  for u, w, p in zip(kb_u, kb_w, kb_p) if w != E}
        eos_bi_map = {int(u): float(-np.log(p))
                      for u, w, p in zip(kb_u, kb_w, kb_p) if w == E}
        kt = t_kept
        kt_u, kt_v, kt_w = t_u[kt], t_v[kt], t_w[kt]
        kt_c2 = cc[cpos[kt]]
        kt_bo = bo2_arr[cpos[kt]] * has_kept2[cpos[kt]] \
            + 1.0 * ~has_kept2[cpos[kt]]
        kt_p = np.maximum(tc[kt] - discount, 0.0) \
            / np.maximum(kt_c2, 1.0) * (kt_c2 > 0) \
            + kt_bo * p_bi_vec(kt_v, kt_w)
        tri_map = {}
        eos_tri_map = {}
        for u, v, w, p in zip(kt_u, kt_v, kt_w, kt_p):
            if v == E:
                continue
            if w == E:
                eos_tri_map[(int(u), int(v))] = float(-np.log(p))
            else:
                tri_map[(int(u), int(v), int(w))] = float(-np.log(p))
        return cls._assemble(
            words, -np.log(uni_p), -np.log(bo1), bi_map, bo2_map,
            tri_map, -math.log(eos_uni_p), eos_bi_map, eos_tri_map)

    # ------------------------------------------------------------------
    @classmethod
    def from_arpa(cls, lm, vocab: Optional[Sequence[str]] = None,
                  bos: str = "<s>", eos: str = "</s>"
                  ) -> "TrigramBackoffLm":
        """From a parsed ArpaLm (lm/arpa.py).  Orders > 3 are cut to
        the trigram level; bigram states without trigram continuations
        are folded through their listed backoff weight (exactly
        ArpaLmCompiler's reachable-state construction)."""
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
        bi_map: Dict[Tuple[int, int], float] = {}
        bo2_map: Dict[Tuple[int, int], float] = {}
        eos_bi_map: Dict[int, float] = {}
        if lm.order >= 2:
            for (u, w), (lp, b) in lm.ngrams[1].items():
                ui = ix(u)
                if ui is None:
                    continue
                if w == eos:
                    eos_bi_map[ui] = -lp * M_LN10
                    continue
                i = ix(w)
                if i is None or i >= V:
                    continue
                bi_map[(ui, i)] = -lp * M_LN10
                bo2_map[(ui, i)] = -b * M_LN10
        tri_map: Dict[Tuple[int, int, int], float] = {}
        eos_tri_map: Dict[Tuple[int, int], float] = {}
        if lm.order >= 3:
            for (u, v, w), (lp, _b) in lm.ngrams[2].items():
                ui, vi = ix(u), ix(v)
                if ui is None or vi is None or vi >= V:
                    continue
                if w == eos:
                    eos_tri_map[(ui, vi)] = -lp * M_LN10
                    continue
                i = ix(w)
                if i is None or i >= V:
                    continue
                tri_map[(ui, vi, i)] = -lp * M_LN10
        return cls._assemble(words, uni, bo1, bi_map, bo2_map, tri_map,
                             eos_uni, eos_bi_map, eos_tri_map)

    # ------------------------------------------------------------------
    @classmethod
    def from_bigram(cls, bg) -> "TrigramBackoffLm":
        """Wrap a BigramBackoffLm: no trigram level, so every explicit
        bigram folds to its unigram destination — structurally the
        round-3 bigram lexchain graph, served by the n-gram decoder."""
        V = bg.V
        bi_map = {}
        for u, w, c in zip(bg.expl_src, bg.expl_dst, bg.expl_cost):
            k = (int(u), int(w))
            bi_map[k] = min(bi_map.get(k, BIG), float(c))
        # bg.eos is backoff-FOLDED; keep explicit only where cheaper
        eos_bi_map = {u: float(bg.eos[u]) for u in range(V + 1)
                      if bg.eos[u] < bg.bo[u] + bg.eos_uni - 1e-7}
        return cls._assemble(list(bg.words), bg.uni.copy(),
                             bg.bo.copy(), bi_map, {}, {},
                             float(bg.eos_uni), eos_bi_map, {})
