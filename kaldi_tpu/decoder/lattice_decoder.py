"""Lattice-generating beam decoder.

Parity: decoder/lattice-faster-decoder.h:243 LatticeFasterDecoderTpl —
per-frame token lists with forward links, beam + lattice-beam pruning,
GetRawLattice / GetLattice (determinized). The acoustic scores arrive
as a precomputed (frames × pdfs) device-batched matrix.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from kaldi_tpu.base.logging import warn
from kaldi_tpu.fstext.fst import (EPS, INF, Arc, LatticeWeight,
                                  TropicalWeight, VectorFst)
from kaldi_tpu.lat.kaldi_lattice import Lattice


@dataclass
class LatticeFasterDecoderOptions:
    beam: float = field(default=16.0, metadata={"doc": "Decoding beam"})
    lattice_beam: float = field(default=10.0, metadata={"doc": "Lattice generation beam"})
    max_active: int = field(default=7000, metadata={"doc": "Max active states"})
    min_active: int = 200
    prune_interval: int = 25
    determinize_lattice: bool = True


class LatticeFasterDecoder:
    def __init__(self, fst: VectorFst,
                 opts: Optional[LatticeFasterDecoderOptions] = None):
        self.fst = fst
        self.opts = opts or LatticeFasterDecoderOptions()

    def decode(self, loglikes: np.ndarray, tid_to_pdf: np.ndarray,
               acoustic_scale: float = 1.0) -> Optional[Lattice]:
        """Returns the raw (state-level) lattice: ilabels = transition
        ids, olabels = words, weights = (graph_cost, acoustic_cost)."""
        fst = self.fst
        opts = self.opts
        T = loglikes.shape[0]
        self.stats: Dict[str, int] = {"max_live_links": 0}
        # token keys: (frame, state); store best cost per key
        cost: Dict[Tuple[int, int], float] = {}
        # links: (src_key, dst_key, ilabel, olabel, gcost, acost)
        links: List[Tuple] = []

        cur: Dict[int, float] = {fst.start: 0.0}
        cur = self._eps_closure(cur, 0, links, opts.beam)
        for s, c in cur.items():
            cost[(0, s)] = c
        for t in range(T):
            frame = loglikes[t]
            best = min(cur.values())
            cutoff = best + opts.beam
            if len(cur) > opts.max_active:
                cs = sorted(cur.values())
                cutoff = min(cutoff, cs[opts.max_active - 1])
            nxt: Dict[int, float] = {}
            for s, c in cur.items():
                if c > cutoff:
                    continue
                for a in fst.arcs[s]:
                    if a.ilabel == EPS:
                        continue
                    ac = -acoustic_scale * float(frame[tid_to_pdf[a.ilabel]])
                    nc = c + a.weight + ac
                    links.append(((t, s), (t + 1, a.nextstate),
                                  a.ilabel, a.olabel, a.weight, ac))
                    if nc < nxt.get(a.nextstate, INF):
                        nxt[a.nextstate] = nc
            if not nxt:
                warn(f"lattice decode: no tokens at frame {t}")
                return None
            nbest = min(nxt.values())
            nxt = {s: c for s, c in nxt.items() if c <= nbest + opts.beam}
            nxt = self._eps_closure(nxt, t + 1, links, opts.beam)
            for s, c in nxt.items():
                k = (t + 1, s)
                if c < cost.get(k, INF):
                    cost[k] = c
            cur = nxt
            # periodic forward-link pruning (PruneActiveTokens,
            # lattice-faster-decoder.cc): links that cannot be within
            # lattice_beam of the best path through the CURRENT frontier
            # can never survive the final pruning — drop them now so
            # memory stays bounded on dense graphs
            if opts.prune_interval > 0 and (t + 1) % opts.prune_interval \
                    == 0:
                links = self._prune_links(links, cost, cur, t + 1)
                self.stats["max_live_links"] = max(
                    self.stats.get("max_live_links", 0), len(links))

        # ---- build raw lattice with forward/backward pruning ----
        finals = {s: fst.finals[s] for s in cur
                  if fst.finals[s] != TropicalWeight.zero}
        if not finals:
            warn("lattice decode: no final tokens; using all last-frame "
                 "tokens as final")
            finals = {s: 0.0 for s in cur}
        # backward costs over link graph
        by_dst: Dict[Tuple[int, int], List[int]] = {}
        by_src: Dict[Tuple[int, int], List[int]] = {}
        for i, (src, dst, il, ol, g, a) in enumerate(links):
            by_dst.setdefault(dst, []).append(i)
            by_src.setdefault(src, []).append(i)
        back: Dict[Tuple[int, int], float] = {}
        from collections import deque
        queue = deque()
        for s, fw in finals.items():
            back[(T, s)] = fw
            queue.append((T, s))
        while queue:
            key = queue.popleft()
            b = back[key]
            for i in by_dst.get(key, ()):
                src, dst, il, ol, g, a = links[i]
                if cost.get(src) is None:
                    continue
                nb = b + g + a
                if nb < back.get(src, INF) - 1e-9:
                    back[src] = nb
                    queue.append(src)
        best_total = min((cost[(T, s)] + fw for s, fw in finals.items()
                          if (T, s) in cost), default=INF)
        if best_total == INF:
            return None
        keep = {k for k in cost
                if k in back and cost[k] + back[k] <= best_total
                + self.opts.lattice_beam}
        # map keys to lattice states
        lat = VectorFst(LatticeWeight)
        state_of: Dict[Tuple[int, int], int] = {}

        def get(k):
            if k not in state_of:
                state_of[k] = lat.add_state()
            return state_of[k]

        start_key = min(keep, key=lambda k: (k[0], cost[k]))
        # the true start is (0, fst.start)
        if (0, self.fst.start) in keep:
            start_key = (0, self.fst.start)
        lat.set_start(get(start_key))
        seen_links = set()
        for i, (src, dst, il, ol, g, a) in enumerate(links):
            if src in keep and dst in keep:
                sig = (src, dst, il, ol, round(g, 6), round(a, 6))
                if sig in seen_links:
                    continue
                seen_links.add(sig)
                lat.add_arc(get(src), Arc(il, ol, (g, a), get(dst)))
        for s, fw in finals.items():
            k = (T, s)
            if k in keep:
                lat.finals[get(k)] = (fw, 0.0)
        from kaldi_tpu.fstext.ops import connect
        connect(lat)
        return lat

    def _prune_links(self, links: List, cost: Dict, frontier: Dict[int,
                                                                   float],
                     t: int) -> List:
        """Drop links not on any path within lattice_beam of the best
        path reaching the current frontier (backward pass over the
        link graph with frontier tokens as temporary finals)."""
        best = min(frontier.values())
        cutoff = best + self.opts.lattice_beam
        back: Dict[Tuple[int, int], float] = {(t, s): 0.0
                                              for s in frontier}
        # links are appended in time order; one reverse sweep relaxes
        # everything (epsilon links within a frame are appended after
        # the emitting link into that frame, so reversed order is a
        # valid topological order of the link DAG)
        INF_ = INF
        for src, dst, il, ol, g, a in reversed(links):
            b = back.get(dst)
            if b is None:
                continue
            nb = b + g + a
            if nb < back.get(src, INF_):
                back[src] = nb
        kept = []
        for link in links:
            src, dst = link[0], link[1]
            c = cost.get(src)
            b = back.get(dst)
            if c is None or b is None:
                continue
            if c + link[4] + link[5] + b <= cutoff:
                kept.append(link)
        # also drop dead cost entries to bound the token map
        live = {k for link in kept for k in (link[0], link[1])}
        live.update((t, s) for s in frontier)
        for k in list(cost.keys()):
            if k not in live:
                del cost[k]
        return kept

    def _eps_closure(self, tokens: Dict[int, float], t: int,
                     links: List, beam: float) -> Dict[int, float]:
        fst = self.fst
        queue = list(tokens.keys())
        best = min(tokens.values(), default=0.0)
        while queue:
            s = queue.pop()
            c = tokens[s]
            if c > best + beam:
                continue
            for a in fst.arcs[s]:
                if a.ilabel != EPS:
                    continue
                nc = c + a.weight
                links.append(((t, s), (t, a.nextstate), EPS, a.olabel,
                              a.weight, 0.0))
                if nc < tokens.get(a.nextstate, INF) - 1e-9:
                    tokens[a.nextstate] = nc
                    queue.append(a.nextstate)
        return tokens
