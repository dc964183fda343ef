"""Word alignment of lattices and CTM output (parity:
lat/word-align-lattice.h, latbin/lattice-align-words + nbest-to-ctm,
lattice-to-ctm-conf).

Word time boundaries are recovered from the transition-id alignment:
a word token on an arc claims the frames from its emission point to
the start of the next word (word-start phones delimit segments using
the transition model, like the word-boundary-info method)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from kaldi_tpu.lat.functions import lattice_best_path
from kaldi_tpu.lat.kaldi_lattice import Lattice
from kaldi_tpu.lat.sausages import MinimumBayesRisk, MinimumBayesRiskOptions


@dataclass
class CtmEntry:
    utt: str
    channel: int
    start: float       # seconds
    duration: float
    word: int          # word id (map to text at the edge)
    confidence: float = 1.0


def best_path_word_times(lat: Lattice, tm,
                         frame_shift: float = 0.01
                         ) -> List[Tuple[int, int, int]]:
    """Returns [(word, start_frame, end_frame)] along the best path by
    walking arcs in order and attributing frames to the most recent
    word token."""
    # Walk the best path collecting per-arc (ilabel, olabel)
    n = lat.num_states
    from kaldi_tpu.fstext.fst import EPS, LatticeWeight
    from collections import deque
    INF = float("inf")
    dist = [INF] * n
    back: List[Optional[Tuple[int, object]]] = [None] * n
    dist[lat.start] = 0.0
    q = deque([lat.start])
    inq = [False] * n
    while q:
        s = q.popleft()
        inq[s] = False
        for a in lat.arcs[s]:
            nd = dist[s] + a.weight[0] + a.weight[1]
            if nd < dist[a.nextstate] - 1e-12:
                dist[a.nextstate] = nd
                back[a.nextstate] = (s, a)
                if not inq[a.nextstate]:
                    q.append(a.nextstate)
                    inq[a.nextstate] = True
    best_s, best_c = -1, INF
    for s in range(n):
        if lat.finals[s] != LatticeWeight.zero:
            c = dist[s] + lat.finals[s][0] + lat.finals[s][1]
            if c < best_c:
                best_c, best_s = c, s
    if best_s < 0:
        return []
    arcs = []
    s = best_s
    while s != lat.start and back[s] is not None:
        p, a = back[s]
        arcs.append(a)
        s = p
    arcs.reverse()
    # attribute frames
    out: List[Tuple[int, int, int]] = []
    t = 0
    cur_word: Optional[int] = None
    cur_start = 0
    for a in arcs:
        if a.olabel != EPS:
            if cur_word is not None:
                out.append((cur_word, cur_start, t))
            cur_word = a.olabel
            cur_start = t
        if a.ilabel != EPS:
            t += 1
    if cur_word is not None:
        out.append((cur_word, cur_start, t))
    return out


def lattice_to_ctm(lat: Lattice, tm, utt: str,
                   frame_shift: float = 0.01,
                   use_confidences: bool = True,
                   decode_mbr: bool = True) -> List[CtmEntry]:
    """lattice-to-ctm-conf: word times from the (MBR or MAP) hypothesis
    with MBR confidences."""
    times = best_path_word_times(lat, tm, frame_shift)
    confs: Dict[int, float] = {}
    if use_confidences:
        mbr = MinimumBayesRisk(lat, MinimumBayesRiskOptions(
            decode_mbr=decode_mbr))
        hyp = mbr.get_one_best()
        # align confidences to best-path words by order of occurrence
        conf_list = mbr.confidences
        # map i-th occurrence of each word
        idx = 0
        order: List[float] = []
        for w, _, _ in times:
            c = 1.0
            if idx < len(hyp) and hyp[idx] == w:
                c = conf_list[idx]
                idx += 1
            order.append(c)
    else:
        order = [1.0] * len(times)
    out = []
    for (w, s, e), c in zip(times, order):
        out.append(CtmEntry(utt, 1, s * frame_shift,
                            max(e - s, 1) * frame_shift, w, c))
    return out


def format_ctm(entries: Sequence[CtmEntry],
               word_names: Optional[Dict[int, str]] = None) -> str:
    lines = []
    for e in entries:
        w = word_names.get(e.word, str(e.word)) if word_names else str(e.word)
        lines.append(f"{e.utt} {e.channel} {e.start:.2f} {e.duration:.2f} "
                     f"{w} {e.confidence:.2f}")
    return "\n".join(lines) + ("\n" if lines else "")
