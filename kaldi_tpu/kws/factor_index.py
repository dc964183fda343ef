"""Timed factor transducer KWS index.

Capability parity with the reference's optimized lattice index
(src/kws/kws-functions.h:66-101, kws-functions.cc:40-116 ClusterLattice,
:160-262 CreateFactorTransducer, :264-300 RemoveLongSilences,
kws-functions2.cc:53-116 DoFactorMerging/DoFactorDisambiguation/
OptimizeFactorTransducer, src/kwsbin/lattice-to-kws-index.cc): every
time-stamped factor (substring) of every lattice is indexed in ONE
deterministic machine whose path weight carries
(-log posterior, start frame, end frame) and whose final arc carries the
utterance id.  Search is then a deterministic walk, independent of the
corpus' lattice sizes — unlike the posting-list `kws.index.KwsIndex`
(which this module is tested for hit-parity against), the factor algebra
merges identical word sequences ACROSS paths at build time.

Semirings (kaldi-kws.h:34-49): factor generation/merging run over the
product of (log posterior) x (tropical start-time) x (arctic end-time);
the final optimization runs over the lexicographic tropical^3 weight.
Both plug into the framework's generic `fstext.ops.determinize_star`
via duck typing (plus/times/divide/zero/one/quantize).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.fstext.fst import EPS, Arc, LatticeWeight, VectorFst
from kaldi_tpu.fstext.ops import connect, determinize_star
from kaldi_tpu.kws.index import KwsHit
from kaldi_tpu.lat.functions import _topsort, lattice_state_times
from kaldi_tpu.lat.kaldi_lattice import Lattice

INF = float("inf")


class KwsProductWeight:
    """(neg-log posterior, start frame, end frame):
    log semiring x tropical (min) start x arctic (max) end —
    the reference's LogXStdXStdprimeWeight (kaldi-kws.h:40)."""
    zero = (INF, INF, -INF)
    one = (0.0, 0.0, 0.0)

    @staticmethod
    def plus(a, b):
        if a[0] == INF:
            p = b[0]
        elif b[0] == INF:
            p = a[0]
        else:
            lo, hi = (a[0], b[0]) if a[0] < b[0] else (b[0], a[0])
            p = lo - math.log1p(math.exp(lo - hi))
        return (p, min(a[1], b[1]), max(a[2], b[2]))

    @staticmethod
    def times(a, b):
        return (a[0] + b[0], a[1] + b[1], a[2] + b[2])

    @staticmethod
    def divide(a, b):
        return (a[0] - b[0], a[1] - b[1], a[2] - b[2])

    @staticmethod
    def approx_equal(a, b, delta: float = 1e-4) -> bool:
        return (abs(a[0] - b[0]) <= delta and a[1] == b[1]
                and a[2] == b[2])

    @staticmethod
    def quantize(w, delta: float):
        return (INF if w[0] == INF else round(w[0] / delta), w[1], w[2])


class KwsLexicographicWeight:
    """Lexicographic tropical^3 (cost, start, end) — the reference's
    StdLStdLStdWeight (kaldi-kws.h:35): plus picks the
    lexicographically smaller triple, times adds componentwise."""
    zero = (INF, INF, INF)
    one = (0.0, 0.0, 0.0)

    @staticmethod
    def plus(a, b):
        return a if a <= b else b

    @staticmethod
    def times(a, b):
        return (a[0] + b[0], a[1] + b[1], a[2] + b[2])

    @staticmethod
    def divide(a, b):
        return (a[0] - b[0], a[1] - b[1], a[2] - b[2])

    @staticmethod
    def approx_equal(a, b, delta: float = 1e-4) -> bool:
        return (abs(a[0] - b[0]) <= delta and a[1] == b[1]
                and a[2] == b[2])

    @staticmethod
    def quantize(w, delta: float):
        return (INF if w[0] == INF else round(w[0] / delta), w[1], w[2])


def _arc_ll(a, acoustic_scale: float) -> float:
    return -(a.weight[0] + acoustic_scale * a.weight[1])


def cluster_lattice(lat: Lattice, state_times: Sequence[int],
                    acoustic_scale: float = 1.0
                    ) -> Dict[Tuple[int, int, int], int]:
    """Assign a cluster id to every word arc: arcs with the same word
    and overlapping spans share a cluster (kws-functions.cc:40
    ClusterLattice — cluster heads are the time-sorted non-overlapping
    representatives; each arc joins the head it overlaps most).

    Returns {(state, arc_index, word): cluster_label} with labels
    unique per (word, head) pair, 1-based."""
    spans: Dict[int, List[Tuple[int, int]]] = {}
    for s in range(lat.num_states):
        for a in lat.arcs[s]:
            if a.olabel == EPS:
                continue
            spans.setdefault(a.olabel, []).append(
                (state_times[s], state_times[a.nextstate]))
    heads: Dict[int, List[Tuple[int, int]]] = {}
    for w, sp in spans.items():
        sp.sort()
        keep = [sp[0]]
        for iv in sp[1:]:
            if keep[-1][1] <= iv[0]:
                keep.append(iv)
        heads[w] = keep
    # one global label space: (word, head index) -> label
    label: Dict[Tuple[int, int], int] = {}
    for w in sorted(heads):
        for i in range(len(heads[w])):
            label[(w, i)] = len(label) + 1
    out: Dict[Tuple[int, int, int], int] = {}
    for s in range(lat.num_states):
        for ai, a in enumerate(lat.arcs[s]):
            if a.olabel == EPS:
                continue
            t0, t1 = state_times[s], state_times[a.nextstate]
            best, best_ov = 0, 0
            for i, (h0, h1) in enumerate(heads[a.olabel]):
                ov = max(0, min(t1, h1) - max(t0, h0))
                if ov > best_ov:
                    best_ov, best = ov, i
            out[(s, ai, a.olabel)] = label[(a.olabel, best)]
    return out


def create_factor_transducer(lat: Lattice, utt_id: int,
                             acoustic_scale: float = 1.0,
                             max_silence_frames: int = 50
                             ) -> Optional[VectorFst]:
    """Posterior-pushed factor transducer of one word lattice
    (kws-functions.cc:160 CreateFactorTransducer + :264
    RemoveLongSilences): state s gains an entry arc from the new
    super-start weighted by s's posterior mass and start time, and an
    exit arc to the new super-final carrying the utterance id and end
    time; every path is then a time-stamped factor.  Arc ilabels are
    words, olabels are time-overlap cluster ids (so distinct
    occurrences stay distinct through determinization).  Factors are
    severed across silence longer than max_silence_frames: in this
    framework's per-frame lattices a silence region is a RUN of
    consecutive epsilon-word arcs, so the cut applies to the
    accumulated run length (the reference's per-arc rule,
    RemoveLongSilences, is the single-arc special case)."""
    n = lat.num_states
    order = _topsort(lat)
    times = lattice_state_times(lat)
    cluster = cluster_lattice(lat, times, acoustic_scale)

    alpha = np.full(n, -np.inf)
    alpha[lat.start] = 0.0
    for s in order:
        if alpha[s] == -np.inf:
            continue
        for a in lat.arcs[s]:
            v = alpha[s] + _arc_ll(a, acoustic_scale)
            alpha[a.nextstate] = np.logaddexp(alpha[a.nextstate], v)
    beta = np.full(n, -np.inf)
    for s in range(n):
        if lat.finals[s] != LatticeWeight.zero:
            beta[s] = -(lat.finals[s][0]
                        + acoustic_scale * lat.finals[s][1])
    for s in reversed(order):
        for a in lat.arcs[s]:
            beta[s] = np.logaddexp(
                beta[s], _arc_ll(a, acoustic_scale) + beta[a.nextstate])
    if not np.isfinite(beta[lat.start]):
        return None

    # silence-run length ending at each state (for the long-silence cut)
    sil_run = np.zeros(n, np.int64)
    for s in order:
        for a in lat.arcs[s]:
            if a.olabel == EPS:
                dur = times[a.nextstate] - times[s]
                sil_run[a.nextstate] = max(sil_run[a.nextstate],
                                           sil_run[s] + dur)

    W = KwsProductWeight
    ft = VectorFst(W)
    for _ in range(n):
        ft.add_state()
    ss = ft.add_state()
    fs = ft.add_state()
    ft.set_start(ss)
    ft.finals[fs] = W.one
    has_word_in = np.zeros(n, bool)
    has_word_out = np.zeros(n, bool)
    for s in range(n):
        for ai, a in enumerate(lat.arcs[s]):
            # pushed cost: sum of outgoing probs at every state = 1
            cost = -(_arc_ll(a, acoustic_scale)
                     + beta[a.nextstate] - beta[s])
            if a.olabel == EPS:
                # silence/eps arc: drop once the accumulated silence
                # run exceeds the allowed intra-keyword gap
                # (RemoveLongSilences)
                if sil_run[s] + (times[a.nextstate] - times[s]) \
                        > max_silence_frames:
                    continue
                ft.add_arc(s, Arc(EPS, EPS, (cost, 0.0, 0.0),
                                  a.nextstate))
            else:
                ft.add_arc(s, Arc(a.olabel,
                                  cluster[(s, ai, a.olabel)],
                                  (cost, 0.0, 0.0), a.nextstate))
                has_word_out[s] = True
                has_word_in[a.nextstate] = True
    for s in range(n):
        post = alpha[s] + beta[s] - beta[lat.start]
        if not np.isfinite(post):
            continue
        if has_word_out[s]:
            ft.add_arc(ss, Arc(EPS, EPS, (-post, float(times[s]), 0.0), s))
        if has_word_in[s]:
            ft.add_arc(s, Arc(EPS, utt_id, (0.0, 0.0, float(times[s])),
                              fs))
    return connect(ft)


def _encode_det(fst: VectorFst, semiring, delta: float = 1e-4
                ) -> VectorFst:
    """Encoded determinization (the reference's EncodeMapper
    kEncodeLabels + DeterminizeStar + Decode, kws-functions2.cc:58-97):
    (ilabel, olabel) pairs become acceptor symbols (true epsilons stay
    epsilon so determinization removes them), the framework's generic
    determinize_star runs over `semiring`, and labels are decoded
    back."""
    codes: Dict[Tuple[int, int], int] = {}
    enc = VectorFst(semiring)
    for _ in range(fst.num_states):
        enc.add_state()
    enc.set_start(fst.start)
    enc.finals = list(fst.finals)
    for s in range(fst.num_states):
        for a in fst.arcs[s]:
            if a.ilabel == EPS and a.olabel == EPS:
                code = EPS
            else:
                key = (a.ilabel, a.olabel)
                code = codes.setdefault(key, len(codes) + 1)
            enc.add_arc(s, Arc(code, EPS, a.weight, a.nextstate))
    det = determinize_star(enc, delta=delta, functional=True)
    decode = {c: k for k, c in codes.items()}
    out = VectorFst(semiring)
    for _ in range(det.num_states):
        out.add_state()
    out.set_start(det.start)
    out.finals = list(det.finals)
    for s in range(det.num_states):
        for a in det.arcs[s]:
            il, ol = decode.get(a.ilabel, (EPS, EPS))
            out.add_arc(s, Arc(il, ol, a.weight, a.nextstate))
    return out


def factor_merge(ft: VectorFst) -> VectorFst:
    """Merge identical factors: encoded epsilon-removing
    determinization over the product semiring — posteriors of merged
    occurrences ADD (log plus), start takes the min, end the max
    (DoFactorMerging, kws-functions2.cc:53)."""
    return _encode_det(ft, KwsProductWeight)


def disambiguate(index: VectorFst) -> VectorFst:
    """Final arcs get a unique-per-state input disambiguation symbol,
    non-final arcs lose their cluster olabel (DoFactorDisambiguation,
    kws-functions2.cc:99): afterwards the input side is the word
    sequence + disambig, the output side is the utterance id."""
    out = VectorFst(index.semiring)
    for _ in range(index.num_states):
        out.add_state()
    out.set_start(index.start)
    out.finals = list(index.finals)
    base = index.num_states  # disambig ids disjoint from state ids
    for s in range(index.num_states):
        for a in index.arcs[s]:
            if index.is_final(a.nextstate):
                out.add_arc(s, Arc(base + s, a.olabel, a.weight,
                                   a.nextstate))
            else:
                out.add_arc(s, Arc(a.ilabel, EPS, a.weight, a.nextstate))
    return out


def to_lexicographic(fst: VectorFst) -> VectorFst:
    """Product -> lexicographic weight map
    (KwsProductFstToKwsLexicographicFstMapper, kws-functions.h:117)."""
    out = VectorFst(KwsLexicographicWeight)
    for _ in range(fst.num_states):
        out.add_state()
    out.set_start(fst.start)
    for st, w in enumerate(fst.finals):
        out.finals[st] = (w[0], w[1], -w[2])
    for s in range(fst.num_states):
        for a in fst.arcs[s]:
            w = a.weight
            out.add_arc(s, Arc(a.ilabel, a.olabel,
                               (w[0], w[1], -w[2]), a.nextstate))
    return out


def optimize_index(index: VectorFst) -> VectorFst:
    """Encoded determinization over the lexicographic semiring
    (OptimizeFactorTransducer, kws-functions2.cc:116)."""
    return _encode_det(index, KwsLexicographicWeight)


class FactorIndex:
    """One optimized index FST over a set of utterances.  The machine
    is input-deterministic on word labels; `search` walks it and reads
    each hit off a final arc: utterance from the olabel, posterior/
    start/end from the accumulated lexicographic weight (end frames are
    stored negated so the lexicographic min prefers max end — the
    arctic component of the product semiring)."""

    def __init__(self, fst: Optional[VectorFst] = None,
                 utt_names: Optional[List[str]] = None):
        self.fst = fst if fst is not None \
            else VectorFst(KwsLexicographicWeight)
        self.utt_names: List[str] = list(utt_names or [])

    # -- construction --------------------------------------------------

    @classmethod
    def build(cls, lattices: Dict[str, Lattice],
              acoustic_scale: float = 1.0,
              max_silence_frames: int = 50) -> "FactorIndex":
        utts = sorted(lattices)
        parts = []
        for i, u in enumerate(utts):
            ft = create_factor_transducer(
                lattices[u], utt_id=i + 1,
                acoustic_scale=acoustic_scale,
                max_silence_frames=max_silence_frames)
            if ft is None:
                continue
            merged = factor_merge(ft)
            parts.append(optimize_index(
                disambiguate(to_lexicographic(merged))))
        return cls(_union(parts, KwsLexicographicWeight), utts)

    def union(self, other: "FactorIndex") -> "FactorIndex":
        """kws-index-union: utterance ids are renumbered into a shared
        space, then the machines are unioned and re-optimized."""
        off = len(self.utt_names)
        shifted = VectorFst(KwsLexicographicWeight)
        for _ in range(other.fst.num_states):
            shifted.add_state()
        shifted.set_start(other.fst.start)
        shifted.finals = list(other.fst.finals)
        for s in range(other.fst.num_states):
            for a in other.fst.arcs[s]:
                ol = a.olabel + off if a.olabel != EPS else EPS
                shifted.add_arc(s, Arc(a.ilabel, ol, a.weight,
                                       a.nextstate))
        merged = _union([self.fst, shifted], KwsLexicographicWeight)
        return FactorIndex(optimize_index(merged),
                           self.utt_names + other.utt_names)

    # -- search --------------------------------------------------------

    def search(self, keyword: Sequence[int],
               min_posterior: float = 0.0) -> List[KwsHit]:
        if not keyword or self.fst.start < 0:
            return []
        W = KwsLexicographicWeight

        def eps_close(frontier: Dict[int, Tuple]) -> Dict[int, Tuple]:
            # union/super-start epsilon arcs (per-utterance machines are
            # internally epsilon-free after determinization)
            stack = list(frontier)
            while stack:
                s = stack.pop()
                for a in self.fst.arcs[s]:
                    if a.ilabel != EPS or self.fst.is_final(a.nextstate):
                        continue
                    nw = W.times(frontier[s], a.weight)
                    cur = frontier.get(a.nextstate)
                    new = nw if cur is None else W.plus(cur, nw)
                    if new != cur:
                        frontier[a.nextstate] = new
                        stack.append(a.nextstate)
            return frontier

        frontier = eps_close({self.fst.start: W.one})
        for word in keyword:
            nxt: Dict[int, Tuple] = {}
            for s, w in frontier.items():
                for a in self.fst.arcs[s]:
                    if a.ilabel == word \
                            and not self.fst.is_final(a.nextstate):
                        nw = W.times(w, a.weight)
                        cur = nxt.get(a.nextstate)
                        nxt[a.nextstate] = nw if cur is None \
                            else W.plus(cur, nw)
            if not nxt:
                return []
            frontier = eps_close(nxt)
        hits: List[KwsHit] = []
        for s, w in frontier.items():
            for a in self.fst.arcs[s]:
                if not self.fst.is_final(a.nextstate):
                    continue
                tot = W.times(W.times(w, a.weight),
                              self.fst.finals[a.nextstate])
                post = math.exp(-tot[0])
                if post < min_posterior:
                    continue
                utt = self.utt_names[a.olabel - 1] \
                    if 0 < a.olabel <= len(self.utt_names) \
                    else str(a.olabel)
                hits.append(KwsHit(utt, int(round(tot[1])),
                                   int(round(-tot[2])),
                                   min(post, 1.0)))
        hits.sort(key=lambda h: -h.score)
        return hits

    # -- I/O (kws index file exchange) ----------------------------------

    def write(self, stream, binary: bool = True) -> None:
        from kaldi_tpu.base import io_funcs as iof
        iof.write_token(stream, binary, "<KwsFactorIndex>")
        iof.write_int32(stream, binary, len(self.utt_names))
        for u in self.utt_names:
            iof.write_token(stream, binary, u)
        f = self.fst
        iof.write_int32(stream, binary, f.num_states)
        iof.write_int32(stream, binary, f.start)
        finals = [(s, w) for s, w in enumerate(f.finals)
                  if w != KwsLexicographicWeight.zero]
        iof.write_int32(stream, binary, len(finals))
        fin = np.asarray([[s, w[0], w[1], w[2]] for s, w in finals],
                         np.float64).reshape(len(finals), 4)
        iof.write_matrix(stream, binary, fin)
        arcs = [[s, a.ilabel, a.olabel, a.nextstate,
                 a.weight[0], a.weight[1], a.weight[2]]
                for s in range(f.num_states) for a in f.arcs[s]]
        iof.write_int32(stream, binary, len(arcs))
        iof.write_matrix(stream, binary,
                         np.asarray(arcs, np.float64).reshape(
                             len(arcs), 7))
        iof.write_token(stream, binary, "</KwsFactorIndex>")

    @classmethod
    def read(cls, stream, binary: bool = True) -> "FactorIndex":
        from kaldi_tpu.base import io_funcs as iof
        iof.expect_token(stream, binary, "<KwsFactorIndex>")
        nu = iof.read_int32(stream, binary)
        utts = [iof.read_token(stream, binary) for _ in range(nu)]
        fst = VectorFst(KwsLexicographicWeight)
        ns = iof.read_int32(stream, binary)
        start = iof.read_int32(stream, binary)
        for _ in range(ns):
            fst.add_state()
        if start >= 0:
            fst.set_start(start)
        nf = iof.read_int32(stream, binary)
        fin = iof.read_matrix(stream, binary)
        assert fin.shape == (nf, 4)
        for r in fin:
            fst.finals[int(r[0])] = (float(r[1]), float(r[2]),
                                     float(r[3]))
        na = iof.read_int32(stream, binary)
        mat = iof.read_matrix(stream, binary)
        assert mat.shape == (na, 7)
        for r in mat:
            fst.add_arc(int(r[0]), Arc(int(r[1]), int(r[2]),
                                       (float(r[4]), float(r[5]),
                                        float(r[6])), int(r[3])))
        iof.expect_token(stream, binary, "</KwsFactorIndex>")
        return cls(fst, utts)


def _union(parts: List[VectorFst], semiring) -> VectorFst:
    out = VectorFst(semiring)
    if not parts:
        return out
    start = out.add_state()
    out.set_start(start)
    for p in parts:
        if p.start < 0:
            continue
        off = out.num_states
        for _ in range(p.num_states):
            out.add_state()
        for s, w in enumerate(p.finals):
            if w != semiring.zero:
                out.finals[s + off] = w
        for s in range(p.num_states):
            for a in p.arcs[s]:
                out.add_arc(s + off, Arc(a.ilabel, a.olabel, a.weight,
                                         a.nextstate + off))
        out.add_arc(start, Arc(EPS, EPS, semiring.one, p.start + off))
    return out
