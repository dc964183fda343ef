"""Monophone GMM training + decoding driver.

Parity: steps/train_mono.sh (flat start, equal alignment, EM with
realignment and Gaussian mixing-up, train_mono.sh:73-120 conventions)
and steps/decode.sh / gmm-latgen-faster for decoding — re-expressed as
a Python API over batched-TPU acoustic scoring (AmDiagGmm
.log_likes_batch) with host-side search. The driver replaces the
run.pl array-job layer: utterances are processed as device batches
instead of forked jobs (SURVEY.md §2.13 data-parallel row).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.decoder.graph import (Lang, TrainingGraphCompiler,
                                     make_decoding_graph)
from kaldi_tpu.decoder.viterbi import (FasterDecoder, FasterDecoderOptions,
                                       align_equal)
from kaldi_tpu.fstext.fst import VectorFst
from kaldi_tpu.gmm import (AccumAmDiagGmm, AmDiagGmm, DiagGmm,
                           MleDiagGmmOptions, mle_am_diag_gmm_update)
from kaldi_tpu.hmm.transition_model import TransitionModel
from kaldi_tpu.tree.context_dep import (ContextDependency,
                                        monophone_context_dependency)


@dataclass
class TrainMonoOptions:
    num_iters: int = 40
    max_iter_inc: int = 30
    totgauss: int = 1000
    beam: float = 6.0
    initial_beam: float = 10.0
    realign_iters: Sequence[int] = field(default_factory=lambda: (
        1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 16, 18, 20, 23, 26, 29, 32,
        35, 38))
    transition_scale: float = 1.0
    acoustic_scale: float = 0.1
    self_loop_scale: float = 0.1
    min_gaussian_occupancy: float = 3.0


class MonoSystem:
    """A trained monophone system: lang + tree + transition model + GMMs."""

    def __init__(self, lang: Lang, tree: ContextDependency,
                 tm: TransitionModel, am: AmDiagGmm):
        self.lang = lang
        self.tree = tree
        self.tm = tm
        self.am = am


def init_mono(lang: Lang, feats: Sequence[np.ndarray],
              shared_phones: Optional[Sequence[Sequence[int]]] = None
              ) -> MonoSystem:
    """Flat start (gmm-init-mono): trivial tree, one global-stats
    Gaussian per pdf."""
    topo = lang.topo or lang.make_topology()
    phones = sorted(lang.phones.values())
    npc = {p: topo.num_pdf_classes(p) for p in phones}
    tree = monophone_context_dependency(phones, npc)
    tm = TransitionModel(topo, tree)
    stack = np.concatenate([np.asarray(f) for f in feats], axis=0)
    mean = stack.mean(axis=0)
    var = np.maximum(stack.var(axis=0), 1e-4)
    am = AmDiagGmm()
    for _ in range(tree.num_pdfs):
        g = DiagGmm(1, stack.shape[1])
        g.set_from_means_and_vars([1.0], mean[None, :], var[None, :])
        am.add_pdf(g)
    return MonoSystem(lang, tree, tm, am)


def train_mono(lang: Lang, feats: Dict[str, np.ndarray],
               transcripts: Dict[str, List[str]],
               opts: Optional[TrainMonoOptions] = None) -> MonoSystem:
    if opts is None:
        opts = TrainMonoOptions()
    sys_ = init_mono(lang, list(feats.values()))
    tm, tree, am = sys_.tm, sys_.tree, sys_.am
    compiler = TrainingGraphCompiler(tm, tree, lang, opts.transition_scale,
                                     opts.self_loop_scale)
    graphs = {utt: compiler.compile(transcripts[utt]) for utt in feats}
    log(f"compiled {len(graphs)} training graphs")

    # iteration 0: equal alignment + first estimate
    alignments: Dict[str, List[int]] = {}
    for i, (utt, f) in enumerate(feats.items()):
        ali = align_equal(graphs[utt], f.shape[0], tm, seed=i)
        if ali is None:
            warn(f"could not equal-align {utt} "
                 f"({f.shape[0]} frames); skipping")
            continue
        alignments[utt] = ali
    _estimate(sys_, feats, alignments, opts, mixup=None, first_iter=True)

    num_gauss = am.num_gauss()
    inc = ((opts.totgauss - num_gauss) // opts.max_iter_inc
           if opts.totgauss > num_gauss else 0)
    if opts.totgauss > num_gauss:
        inc = max(inc, 1)
    for it in range(1, opts.num_iters):
        if it in opts.realign_iters:
            beam = opts.initial_beam if it == 1 else opts.beam
            alignments = _align_all(sys_, graphs, feats, beam,
                                    opts.acoustic_scale,
                                    opts.transition_scale,
                                    prev=alignments)
        if num_gauss < opts.totgauss:
            num_gauss = min(opts.totgauss, num_gauss + inc)
        _estimate(sys_, feats, alignments, opts, mixup=num_gauss)
    return sys_


def _align_all(sys_: MonoSystem, graphs: Dict[str, VectorFst],
               feats: Dict[str, np.ndarray], beam: float,
               acoustic_scale: float, transition_scale: float,
               prev: Optional[Dict[str, List[int]]] = None
               ) -> Dict[str, List[int]]:
    """gmm-align-compiled equivalent: batched device loglikes, host
    Viterbi per utterance."""
    out: Dict[str, List[int]] = {}
    utts = list(feats.keys())
    # batched loglikes on device (padded batch)
    lens = [feats[u].shape[0] for u in utts]
    dim = feats[utts[0]].shape[1]
    Tmax = max(lens)
    batch = np.zeros((len(utts), Tmax, dim), np.float32)
    for i, u in enumerate(utts):
        batch[i, :lens[i]] = feats[u]
    loglikes = sys_.am.log_likes_batch(batch)  # (B, Tmax, P)
    from kaldi_tpu.native import get_lib, NativeViterbi
    use_native = get_lib() is not None
    for i, utt in enumerate(utts):
        if use_native:
            nat = NativeViterbi(graphs[utt])
            res = nat.decode(loglikes[i, :lens[i]], sys_.tm.id2pdf_id,
                             acoustic_scale, beam=beam)
            if res is None:
                res = nat.decode(loglikes[i, :lens[i]], sys_.tm.id2pdf_id,
                                 acoustic_scale, beam=beam * 4)
        else:
            dec = FasterDecoder(graphs[utt], FasterDecoderOptions(beam=beam))
            res = dec.decode(loglikes[i, :lens[i]], sys_.tm.id2pdf_id,
                             acoustic_scale)
            if res is None:
                # retry with wide beam like steps' retry-beam
                dec = FasterDecoder(graphs[utt],
                                    FasterDecoderOptions(beam=beam * 4))
                res = dec.decode(loglikes[i, :lens[i]], sys_.tm.id2pdf_id,
                                 acoustic_scale)
        if res is None:
            warn(f"alignment failed for {utt}")
            if prev and utt in prev:
                out[utt] = prev[utt]
            continue
        out[utt] = res[0]
    return out


def _estimate(sys_: MonoSystem, feats: Dict[str, np.ndarray],
              alignments: Dict[str, List[int]], opts: TrainMonoOptions,
              mixup: Optional[int], first_iter: bool = False) -> None:
    """gmm-acc-stats-ali + gmm-est."""
    acc = AccumAmDiagGmm(sys_.am,
                         num_transition_ids=sys_.tm.num_transition_ids)
    for utt, ali in alignments.items():
        acc.accumulate_alignment(sys_.am, sys_.tm, feats[utt], ali)
    gopts = MleDiagGmmOptions(
        min_gaussian_occupancy=opts.min_gaussian_occupancy)
    mle_am_diag_gmm_update(gopts, acc, sys_.am, sys_.tm, mixup=mixup)
    if acc.total_frames:
        log(f"avg loglike/frame {acc.total_loglike / acc.total_frames:.4f} "
            f"over {int(acc.total_frames)} frames; "
            f"{sys_.am.num_gauss()} gaussians")


def decode(sys_: MonoSystem, hclg: VectorFst, feats: Dict[str, np.ndarray],
           acoustic_scale: float = 0.1, beam: float = 16.0
           ) -> Dict[str, List[str]]:
    """gmm-latgen-faster (best path only for now) over batched loglikes."""
    out: Dict[str, List[str]] = {}
    utts = list(feats.keys())
    if not utts:
        return out
    lens = [feats[u].shape[0] for u in utts]
    Tmax = max(lens)
    dim = feats[utts[0]].shape[1]
    batch = np.zeros((len(utts), Tmax, dim), np.float32)
    for i, u in enumerate(utts):
        batch[i, :lens[i]] = feats[u]
    loglikes = sys_.am.log_likes_batch(batch)
    from kaldi_tpu.native import NativeViterbi, get_lib
    nat = NativeViterbi(hclg) if get_lib() is not None else None
    dec = FasterDecoder(hclg, FasterDecoderOptions(beam=beam))
    for i, utt in enumerate(utts):
        if nat is not None:
            res = nat.decode(loglikes[i, :lens[i]], sys_.tm.id2pdf_id,
                             acoustic_scale, beam=beam)
        else:
            res = dec.decode(loglikes[i, :lens[i]], sys_.tm.id2pdf_id,
                             acoustic_scale)
        if res is None:
            warn(f"decode failed for {utt}")
            out[utt] = []
            continue
        out[utt] = [sys_.lang.word_names[w] for w in res[1]]
    return out


def make_hclg(sys_: MonoSystem, g_fst: VectorFst,
              transition_scale: float = 1.0,
              self_loop_scale: float = 0.1) -> VectorFst:
    return make_decoding_graph(sys_.lang, g_fst, sys_.tree, sys_.tm,
                               transition_scale, self_loop_scale)
