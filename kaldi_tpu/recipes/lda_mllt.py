"""LDA+MLLT and SAT (fMLLR) training drivers
(parity: steps/train_lda_mllt.sh and steps/train_sat.sh).

train_lda_mllt: splice raw features, estimate LDA from aligned classes,
train a triphone system in the transformed space with periodic MLLT
(STC) updates composed into the feature transform.

train_sat: speaker-adapted training — per-speaker fMLLR transforms
estimated between EM iterations and applied to features.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import log, warn
from kaldi_tpu.decoder.graph import Lang, TrainingGraphCompiler
from kaldi_tpu.feat.functions import splice_frames
from kaldi_tpu.recipes.deltas import TrainDeltasOptions, train_deltas
from kaldi_tpu.recipes.mono import MonoSystem, _align_all, _estimate
from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs, apply_affine_transform
from kaldi_tpu.transform.lda import LdaEstimate, LdaOptions
from kaldi_tpu.transform.mllt import MlltAccs


@dataclass
class TrainLdaMlltOptions(TrainDeltasOptions):
    lda_dim: int = 40
    splice_left: int = 3
    splice_right: int = 3
    mllt_iters: Sequence[int] = field(default_factory=lambda: (2, 4, 6))


def estimate_lda(sys_: MonoSystem, feats_spliced: Dict[str, np.ndarray],
                 alignments: Dict[str, List[int]], dim: int) -> np.ndarray:
    tm = sys_.tm
    first = next(iter(feats_spliced.values()))
    est = LdaEstimate(tm.num_pdfs, first.shape[1])
    for utt, ali in alignments.items():
        f = feats_spliced[utt]
        T = min(f.shape[0], len(ali))
        pdfs = tm.transition_ids_to_pdfs(ali[:T])
        for pdf in np.unique(pdfs):
            est.accumulate(f[:T][pdfs == pdf], int(pdf))
    lda, _ = est.estimate(LdaOptions(dim=dim))
    return lda


def train_lda_mllt(lang: Lang, raw_feats: Dict[str, np.ndarray],
                   transcripts: Dict[str, List[str]],
                   prev_sys: MonoSystem,
                   prev_alignments: Dict[str, List[int]],
                   opts: Optional[TrainLdaMlltOptions] = None
                   ) -> Tuple[MonoSystem, np.ndarray, Dict[str, np.ndarray]]:
    """Returns (system, final feature transform (affine), transformed
    features)."""
    if opts is None:
        opts = TrainLdaMlltOptions()
    spliced = {u: splice_frames(f, opts.splice_left, opts.splice_right)
               for u, f in raw_feats.items()}
    lda = estimate_lda(prev_sys, spliced, prev_alignments, opts.lda_dim)
    transform = lda  # (dim, spliced_dim + 1)
    feats = {u: apply_affine_transform(f, transform)
             for u, f in spliced.items()}
    # build a triphone system in the LDA space from converted alignments
    sys_ = train_deltas(lang, feats, transcripts, prev_sys,
                        prev_alignments, opts)
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang,
                                     opts.transition_scale,
                                     opts.self_loop_scale)
    graphs = {u: compiler.compile(transcripts[u]) for u in feats}
    alignments = _align_all(sys_, graphs, feats, opts.beam,
                            opts.acoustic_scale, opts.transition_scale)
    # MLLT iterations: estimate STC in current space, compose into the
    # global transform, transform means
    for it in opts.mllt_iters:
        accs = MlltAccs(opts.lda_dim)
        tm = sys_.tm
        for utt, ali in alignments.items():
            f = feats[utt]
            T = min(f.shape[0], len(ali))
            pdfs = tm.transition_ids_to_pdfs(ali[:T])
            for pdf in np.unique(pdfs):
                g = sys_.am.get_pdf(int(pdf))
                sub = f[:T][pdfs == pdf]
                post = g.component_posteriors(sub)
                accs.accumulate_from_posteriors(g, sub, post)
        M, impr = accs.update()
        log(f"MLLT iteration {it}: objf impr {impr:.4f}")
        # compose: transform <- M @ transform ; means <- M @ means
        transform = np.concatenate(
            [M @ transform[:, :-1], (M @ transform[:, -1])[:, None]], axis=1)
        for g in sys_.am.densities:
            means = g.get_means() @ M.T
            g.set_from_means_and_vars(g.weights, means, g.get_vars())
        sys_.am.invalidate_pack()
        feats = {u: apply_affine_transform(f, transform)
                 for u, f in spliced.items()}
        alignments = _align_all(sys_, graphs, feats, opts.beam,
                                opts.acoustic_scale, opts.transition_scale,
                                prev=alignments)
        from kaldi_tpu.recipes.mono import TrainMonoOptions
        _estimate(sys_, feats, alignments,
                  TrainMonoOptions(min_gaussian_occupancy=
                                   opts.min_gaussian_occupancy),
                  mixup=None)
    return sys_, transform, feats


@dataclass
class TrainSatOptions(TrainDeltasOptions):
    fmllr_iters: Sequence[int] = field(default_factory=lambda: (2, 4, 6))
    fmllr_min_count: float = 100.0


def train_sat(lang: Lang, feats: Dict[str, np.ndarray],
              transcripts: Dict[str, List[str]],
              utt2spk: Dict[str, str],
              prev_sys: MonoSystem,
              prev_alignments: Dict[str, List[int]],
              opts: Optional[TrainSatOptions] = None
              ) -> Tuple[MonoSystem, Dict[str, np.ndarray]]:
    """Speaker-adapted training. Returns (system, per-speaker fMLLR
    transforms)."""
    if opts is None:
        opts = TrainSatOptions()
    sys_ = train_deltas(lang, feats, transcripts, prev_sys,
                        prev_alignments, opts)
    compiler = TrainingGraphCompiler(sys_.tm, sys_.tree, lang,
                                     opts.transition_scale,
                                     opts.self_loop_scale)
    graphs = {u: compiler.compile(transcripts[u]) for u in feats}
    alignments = _align_all(sys_, graphs, feats, opts.beam,
                            opts.acoustic_scale, opts.transition_scale)
    transforms: Dict[str, np.ndarray] = {}
    cur_feats = feats
    for it in opts.fmllr_iters:
        # per-speaker fMLLR from current alignments
        by_spk: Dict[str, FmllrDiagGmmAccs] = {}
        dim = next(iter(feats.values())).shape[1]
        for utt, ali in alignments.items():
            spk = utt2spk.get(utt, utt)
            accs = by_spk.setdefault(spk, FmllrDiagGmmAccs(dim))
            f = feats[utt]
            T = min(f.shape[0], len(ali))
            accs.accumulate_from_alignment(sys_.am, sys_.tm, f[:T], ali[:T])
        for spk, accs in by_spk.items():
            W, impr = accs.update(min_count=opts.fmllr_min_count)
            transforms[spk] = W
        cur_feats = {u: apply_affine_transform(
            feats[u], transforms.get(utt2spk.get(u, u),
                                     _identity(dim)))
            for u in feats}
        alignments = _align_all(sys_, graphs, cur_feats, opts.beam,
                                opts.acoustic_scale, opts.transition_scale,
                                prev=alignments)
        from kaldi_tpu.recipes.mono import TrainMonoOptions
        _estimate(sys_, cur_feats, alignments,
                  TrainMonoOptions(min_gaussian_occupancy=
                                   opts.min_gaussian_occupancy),
                  mixup=None)
        log(f"SAT iteration {it}: {len(transforms)} speaker transforms")
    return sys_, transforms


def _identity(dim: int) -> np.ndarray:
    return np.concatenate([np.eye(dim), np.zeros((dim, 1))],
                          axis=1).astype(np.float32)
