"""Discriminative GMM training: lattice-based MMI with EBW updates.

Parity: steps/train_mmi.sh + gmmbin/gmm-rescore-lattice +
gmm-acc-stats2 + gmm-est-gaussians-ebw / gmm-est-weights-ebw.
Numerator stats come from the reference-transcription Viterbi
alignment; denominator stats from forward-backward posteriors of
lattices decoded against a weak (unigram) LM; the model-space update
is Extended Baum-Welch (gmm/ebw.py). Boosted MMI (b > 0) subtracts
b * (frame accuracy vs the numerator alignment) from each lattice
arc's graph cost before the denominator FB (Povey et al. 2008)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.decoder.graph import TrainingGraphCompiler
from kaldi_tpu.decoder.lattice_decoder import (LatticeFasterDecoder,
                                               LatticeFasterDecoderOptions)
from kaldi_tpu.fstext.fst import EPS, VectorFst
from kaldi_tpu.gmm.ebw import EbwOptions, update_ebw_am_diag_gmm
from kaldi_tpu.gmm.mle import AccumAmDiagGmm
from kaldi_tpu.lat.functions import (lattice_forward_backward_post,
                                     lattice_state_times)
from kaldi_tpu.recipes.mono import MonoSystem, _align_all, make_hclg


@dataclass
class TrainMmiOptions:
    num_iters: int = 4
    acoustic_scale: float = 0.1
    beam: float = 16.0
    lattice_beam: float = 10.0
    align_beam: float = 10.0
    transition_scale: float = 1.0
    self_loop_scale: float = 0.1
    boost: float = 0.0             # boosted MMI factor b
    ebw: EbwOptions = field(default_factory=lambda: EbwOptions(
        E=2.0, tau=100.0))
    update_weights: bool = False


def _boost_lattice(lat, alignment: Sequence[int], tm,
                   boost: float) -> None:
    """Subtract boost * [arc pdf == numerator pdf at that frame] from
    each arc's graph cost in place (lattice-boost-ali)."""
    times = lattice_state_times(lat)
    num_pdfs = [tm.transition_id_to_pdf(t) for t in alignment]
    for s in range(lat.num_states):
        t = times[s]
        if t < 0 or t >= len(num_pdfs):
            continue
        for a in lat.arcs[s]:
            if a.ilabel == EPS:
                continue
            if tm.transition_id_to_pdf(a.ilabel) == num_pdfs[t]:
                a.weight = (a.weight[0] - boost, a.weight[1])


def mmi_objf(num_acc: AccumAmDiagGmm, den_acc: AccumAmDiagGmm,
             acoustic_scale: float) -> float:
    """Per-frame MMI criterion estimate from the accumulators."""
    frames = max(num_acc.total_frames, 1.0)
    return acoustic_scale * (num_acc.total_loglike
                             - den_acc.total_loglike) / frames


def train_mmi(sys_: MonoSystem, feats: Dict[str, np.ndarray],
              transcripts: Dict[str, List[str]], g_fst: VectorFst,
              opts: Optional[TrainMmiOptions] = None) -> List[float]:
    """Run MMI/bMMI iterations in place on sys_.am; returns the
    per-iteration objective values."""
    opts = opts or TrainMmiOptions()
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, sys_.lang,
                                     opts.transition_scale,
                                     opts.self_loop_scale)
    graphs = {u: compiler.compile(transcripts[u]) for u in feats}
    hclg = make_hclg(sys_, g_fst, opts.transition_scale,
                     opts.self_loop_scale)
    lat_dec = LatticeFasterDecoder(hclg, LatticeFasterDecoderOptions(
        beam=opts.beam, lattice_beam=opts.lattice_beam))
    objs: List[float] = []
    for it in range(opts.num_iters):
        num_acc = AccumAmDiagGmm(
            sys_.am, num_transition_ids=sys_.tm.num_transition_ids)
        den_acc = AccumAmDiagGmm(
            sys_.am, num_transition_ids=sys_.tm.num_transition_ids)
        alignments = _align_all(sys_, graphs, feats, opts.align_beam,
                                opts.acoustic_scale,
                                opts.transition_scale)
        for u, f in feats.items():
            if u not in alignments:
                continue
            num_acc.accumulate_alignment(sys_.am, sys_.tm, f,
                                         alignments[u])
            ll = sys_.am.log_likes_batch(f)
            lat = lat_dec.decode(np.asarray(ll), sys_.tm.id2pdf_id,
                                 opts.acoustic_scale)
            if lat is None:
                warn(f"MMI: lattice decode failed for {u}")
                continue
            if opts.boost > 0:
                _boost_lattice(lat, alignments[u], sys_.tm, opts.boost)
            post = lattice_forward_backward_post(lat, 1.0)
            den_acc.accumulate_posterior(sys_.am, sys_.tm, f, post)
        obj = mmi_objf(num_acc, den_acc, opts.acoustic_scale)
        objs.append(obj)
        log(f"MMI iter {it}: objf/frame {obj:.4f} "
            f"(num {num_acc.total_frames:.0f} frames, "
            f"den {den_acc.total_frames:.0f})")
        update_ebw_am_diag_gmm(num_acc, den_acc, sys_.am, opts.ebw,
                               opts.update_weights)
    return objs
