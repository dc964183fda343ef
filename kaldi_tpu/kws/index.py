"""Keyword search over lattices (capability parity: src/kws —
kws-functions.h factor-transducer inverted index + search).

The index maps word -> postings of (utterance, start_frame, end_frame,
posterior); multi-word keywords are found by joining adjacent postings.
Posteriors and times come from lattice forward-backward over word arcs
(the reference's timed factor transducer stores the same tuple; the
lexicographic-semiring machinery is an encoding of it)."""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.fstext.fst import EPS, LatticeWeight
from kaldi_tpu.lat.functions import (_topsort, lattice_state_times)
from kaldi_tpu.lat.kaldi_lattice import Lattice


@dataclass
class KwsHit:
    utt: str
    start_frame: int
    end_frame: int
    score: float  # posterior


class KwsIndex:
    def __init__(self, frame_shift: float = 0.01,
                 min_posterior: float = 1e-3,
                 cluster_tolerance: int = 3):
        self.postings: Dict[int, List[Tuple[str, int, int, float]]] = \
            defaultdict(list)
        self.frame_shift = frame_shift
        self.min_posterior = min_posterior
        self.cluster_tolerance = cluster_tolerance

    # -- indexing ----------------------------------------------------------------

    def add_lattice(self, utt: str, lat: Lattice,
                    acoustic_scale: float = 1.0) -> None:
        """Index every word arc with its posterior and time span."""
        n = lat.num_states
        order = _topsort(lat)
        times = lattice_state_times(lat)

        def arc_ll(a):
            return -(a.weight[0] + acoustic_scale * a.weight[1])

        alpha = np.full(n, -np.inf)
        alpha[lat.start] = 0.0
        for s in order:
            if alpha[s] == -np.inf:
                continue
            for a in lat.arcs[s]:
                v = alpha[s] + arc_ll(a)
                alpha[a.nextstate] = np.logaddexp(alpha[a.nextstate], v)
        beta = np.full(n, -np.inf)
        for s in range(n):
            if lat.finals[s] != LatticeWeight.zero:
                beta[s] = -(lat.finals[s][0]
                            + acoustic_scale * lat.finals[s][1])
        for s in reversed(order):
            for a in lat.arcs[s]:
                beta[s] = np.logaddexp(beta[s], arc_ll(a) + beta[a.nextstate])
        total = beta[lat.start]
        if not np.isfinite(total):
            return
        # word spans: a word token on arc (s -> d) spans from time(s) to
        # the next word boundary; approximate with the arc's target time
        # extended until a frame advances (fine-grained spans come from
        # word-aligned lattices)
        raw: Dict[int, List[Tuple[int, int, float]]] = defaultdict(list)
        for s in order:
            if alpha[s] == -np.inf:
                continue
            for a in lat.arcs[s]:
                if a.olabel == EPS:
                    continue
                post = float(np.exp(alpha[s] + arc_ll(a)
                                    + beta[a.nextstate] - total))
                if post < self.min_posterior:
                    continue
                t0 = times[s]
                t1 = max(times[a.nextstate], t0 + 1)
                raw[a.olabel].append((t0, t1, post))
        # consolidate: a word's posterior is fragmented over parallel
        # lattice paths emitting it at slightly different frames; merge
        # overlapping/near spans and sum their posteriors (the
        # reference's kws result clustering, kws-functions.cc
        # ClusterLattice)
        tol = self.cluster_tolerance
        for word, entries in raw.items():
            entries.sort()
            merged: List[List] = []
            for t0, t1, p in entries:
                if merged and t0 <= merged[-1][1] + tol:
                    merged[-1][1] = max(merged[-1][1], t1)
                    merged[-1][2] = min(1.0, merged[-1][2] + p)
                else:
                    merged.append([t0, t1, p])
            for t0, t1, p in merged:
                self.postings[word].append((utt, t0, t1, p))

    # -- I/O (kws-index-union/kws-search file exchange) ---------------

    def write(self, stream, binary: bool = True) -> None:
        from kaldi_tpu.base import io_funcs as iof
        iof.write_token(stream, binary, "<KwsIndex>")
        utts = sorted({e[0] for es in self.postings.values()
                       for e in es})
        uid = {u: i for i, u in enumerate(utts)}
        iof.write_int32(stream, binary, len(utts))
        for u in utts:
            iof.write_token(stream, binary, u)
        iof.write_int32(stream, binary, len(self.postings))
        for word in sorted(self.postings):
            es = self.postings[word]
            iof.write_int32(stream, binary, int(word))
            iof.write_int32(stream, binary, len(es))
            arr = np.asarray([[uid[u], t0, t1] for u, t0, t1, _ in es],
                             np.float64).reshape(len(es), 3)
            ps = np.asarray([p for *_x, p in es], np.float64)
            iof.write_matrix(
                stream, binary,
                np.concatenate([arr, ps[:, None]], axis=1))
        iof.write_token(stream, binary, "</KwsIndex>")

    @classmethod
    def read(cls, stream, binary: bool = True) -> "KwsIndex":
        from kaldi_tpu.base import io_funcs as iof
        iof.expect_token(stream, binary, "<KwsIndex>")
        out = cls()
        nu = iof.read_int32(stream, binary)
        utts = [iof.read_token(stream, binary) for _ in range(nu)]
        nw = iof.read_int32(stream, binary)
        for _ in range(nw):
            word = iof.read_int32(stream, binary)
            ne = iof.read_int32(stream, binary)
            mat = iof.read_matrix(stream, binary)
            assert mat.shape == (ne, 4), mat.shape
            out.postings[word] = [
                (utts[int(r[0])], int(r[1]), int(r[2]), float(r[3]))
                for r in mat]
        iof.expect_token(stream, binary, "</KwsIndex>")
        return out

    def union(self, other: "KwsIndex") -> None:
        """Merge another index's postings (kws-index-union)."""
        for word, es in other.postings.items():
            self.postings[word].extend(es)

    # -- search -------------------------------------------------------------------

    def search(self, keyword: Sequence[int],
               max_gap_frames: int = 50) -> List[KwsHit]:
        """Find occurrences of a (multi-)word keyword; score = product
        of word posteriors."""
        if not keyword:
            return []
        hits: List[KwsHit] = []
        first = self.postings.get(keyword[0], [])
        for utt, t0, t1, p in first:
            chains = [(t1, p)]
            ok = True
            end, score = t1, p
            cur_end = t1
            for w in keyword[1:]:
                nxt = [e for e in self.postings.get(w, [])
                       if e[0] == utt and cur_end <= e[1]
                       <= cur_end + max_gap_frames]
                if not nxt:
                    ok = False
                    break
                best = max(nxt, key=lambda e: e[3])
                cur_end = best[2]
                score *= best[3]
                end = best[2]
            if ok:
                hits.append(KwsHit(utt, t0, end, score))
        hits.sort(key=lambda h: -h.score)
        return hits
