"""Chain supervision and denominator-graph construction.

Parity: chain/chain-supervision.h (numerator supervision; round-1
implementation derives exact linear numerators from alignments — the
lattice-derived time-tolerant supervision generalizes this in a later
milestone), chain/language-model.h (phone LM), chain-den-graph.h:159
(den graph = phone LM expanded to an HMM acceptor over pdfs, with
initial probs from the stationary distribution).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import log
from kaldi_tpu.chain.graphs import DenominatorGraph, PackedGraph, \
    pack_emission_fst
from kaldi_tpu.fstext.fst import EPS, Arc, TropicalWeight, VectorFst
from kaldi_tpu.fstext.ops import connect, rm_epsilon
from kaldi_tpu.hmm.hmm_utils import expand_hmm
from kaldi_tpu.hmm.transition_model import TransitionModel


def estimate_phone_lm(phone_seqs: Sequence[Sequence[int]],
                      phones: Sequence[int],
                      interp: float = 0.1) -> VectorFst:
    """Bigram phone LM as an acceptor (chain-est-phone-lm equivalent;
    bigram with unigram interpolation — dense over seen phones so the
    denominator stays compact)."""
    phones = sorted(set(phones))
    uni = Counter()
    bi: Dict[int, Counter] = defaultdict(Counter)
    end_count = Counter()
    start_count = Counter()
    n_seq = 0
    for seq in phone_seqs:
        if not seq:
            continue
        n_seq += 1
        start_count[seq[0]] += 1
        for p in seq:
            uni[p] += 1
        for a, b in zip(seq, seq[1:]):
            bi[a][b] += 1
        end_count[seq[-1]] += 1
    tot_uni = sum(uni.values())
    uni_p = {p: (uni[p] + 1.0) / (tot_uni + len(phones)) for p in phones}

    fst = VectorFst(TropicalWeight)
    start = fst.add_state()
    fst.set_start(start)
    state_of = {p: fst.add_state() for p in phones}

    def add_arcs(src: int, counts: Counter, total: float,
                 end_c: float = 0.0):
        total = total + end_c
        for p in phones:
            prob = ((1 - interp) * counts.get(p, 0) / total if total else 0.0) \
                + interp * uni_p[p]
            fst.add_arc(src, Arc(p, p, -math.log(max(prob, 1e-10)),
                                 state_of[p]))
        if total:
            fend = max(end_c / total, 1e-4)
        else:
            fend = 1e-4
        fst.finals[src] = -math.log(fend)

    add_arcs(start, start_count, float(n_seq))
    for p in phones:
        tot = float(sum(bi[p].values()))
        add_arcs(state_of[p], bi[p], tot, float(end_count[p]))
    # start state should not be final
    fst.finals[start] = TropicalWeight.zero
    return fst


def _stationary_initial(pg: PackedGraph, iters: int = 100) -> np.ndarray:
    """Initial probs for the denominator = approximate stationary
    distribution of the transition structure (chain-den-graph.cc
    SetInitialProbs)."""
    S = pg.num_states
    probs = np.exp(np.maximum(pg.log_prob, -80))
    pi = np.exp(np.maximum(pg.initial, -80))
    if pi.sum() <= 0:
        pi = np.ones(S)
    pi = pi / pi.sum()
    for _ in range(iters):
        nxt = np.zeros(S)
        np.add.at(nxt, pg.dst, pi[pg.src] * probs)
        tot = nxt.sum()
        if tot <= 0:
            break
        pi = nxt / tot
    pi = np.maximum(pi, 1e-20)
    return np.log(pi).astype(np.float32)


def make_denominator_graph(phone_seqs: Sequence[Sequence[int]],
                           tm: TransitionModel, ctx_dep,
                           interp: float = 0.1) -> DenominatorGraph:
    """Phone LM -> HMM acceptor over pdfs -> packed arrays."""
    lm = estimate_phone_lm(phone_seqs, tm.get_phones(), interp)
    # expand phones to HMMs with TRUE probabilities (scale 1/1)
    h = expand_hmm(lm, tm, ctx_dep, transition_scale=1.0,
                   self_loop_scale=1.0)
    # relabel transition-ids -> pdf+1 and strip output labels
    for arcs in h.arcs:
        for a in arcs:
            if a.ilabel != EPS:
                a.ilabel = int(tm.id2pdf_id[a.ilabel]) + 1
            a.olabel = a.ilabel
    h = rm_epsilon(h)
    # make all "phone boundary" structure final-free: the den graph in
    # the reference is an acceptor where ending anywhere is allowed via
    # final-probs; we keep the LM's final probs.
    pg = pack_emission_fst(h)
    pg.initial = _stationary_initial(pg)
    log(f"denominator graph: {pg.num_states} states, {pg.num_arcs} arcs")
    return DenominatorGraph(pg)


def alignment_to_numerator_graph(alignment: Sequence[int],
                                 tm: TransitionModel,
                                 subsample: int = 3) -> PackedGraph:
    """Exact linear numerator from a frame-level transition-id
    alignment, subsampled to the output frame rate: state t --pdf--> t+1
    for each output frame (chain supervision with zero tolerance)."""
    pdfs = tm.transition_ids_to_pdfs(alignment)
    sub = pdfs[subsample // 2::subsample]
    if len(sub) == 0:
        sub = pdfs[:1]
    T = len(sub)
    src = np.arange(T, dtype=np.int32)
    dst = src + 1
    ninf = -1e30
    initial = np.full(T + 1, ninf, np.float32)
    initial[0] = 0.0
    final = np.full(T + 1, ninf, np.float32)
    final[T] = 0.0
    return PackedGraph(src, dst, np.asarray(sub, np.int32),
                       np.zeros(T, np.float32), initial, final)
