"""Online decoding + endpointing (parity: online2/online-nnet3-decoding.h:52
SingleUtteranceDecoder, online2/online-endpoint.h:84,123,175).

The decoder advances chunk by chunk over device-computed acoustic
scores; endpointing applies the reference's 5 default rules over
(trailing silence, relative cost, utterance length).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.base.logging import warn
from kaldi_tpu.decoder.viterbi import (FasterDecoderOptions, INF, _Token)
from kaldi_tpu.fstext.fst import EPS, TropicalWeight, VectorFst


class OnlineFasterDecoder:
    """Incremental version of the beam Viterbi decoder: init /
    advance(chunk) / best path so far."""

    def __init__(self, fst: VectorFst,
                 opts: Optional[FasterDecoderOptions] = None):
        self.fst = fst
        self.opts = opts or FasterDecoderOptions()
        self.init_decoding()

    def init_decoding(self) -> None:
        from kaldi_tpu.decoder.viterbi import FasterDecoder
        self._helper = FasterDecoder(self.fst, self.opts)
        self.cur: Dict[int, _Token] = {
            self.fst.start: _Token(0.0, None, 0, 0)}
        self.cur = self._helper._process_nonemitting(self.cur,
                                                     self.opts.beam)
        self.num_frames_decoded = 0

    def advance_decoding(self, loglikes: np.ndarray, tid_to_pdf: np.ndarray,
                         acoustic_scale: float = 1.0,
                         word_ins_penalty: float = 0.0) -> None:
        fst = self.fst
        beam = self.opts.beam
        for t in range(loglikes.shape[0]):
            frame = loglikes[t]
            nxt: Dict[int, _Token] = {}
            best = min(tok.cost for tok in self.cur.values())
            cutoff = best + beam
            if len(self.cur) > self.opts.max_active:
                costs = sorted(tok.cost for tok in self.cur.values())
                cutoff = min(cutoff, costs[self.opts.max_active - 1])
            next_best = INF
            for state, tok in self.cur.items():
                if tok.cost > cutoff:
                    continue
                for a in fst.arcs[state]:
                    if a.ilabel == EPS:
                        continue
                    ac = -acoustic_scale * float(frame[tid_to_pdf[a.ilabel]])
                    c = tok.cost + a.weight + ac
                    if word_ins_penalty and a.olabel != EPS:
                        c += word_ins_penalty
                    if c >= next_best + beam:
                        continue
                    old = nxt.get(a.nextstate)
                    if old is None or c < old.cost:
                        nxt[a.nextstate] = _Token(c, tok, a.ilabel, a.olabel)
                        next_best = min(next_best, c)
            if not nxt:
                warn("online decode: no tokens survived; keeping state")
                return
            nxt = {s: tok for s, tok in nxt.items()
                   if tok.cost <= next_best + beam}
            self.cur = self._helper._process_nonemitting(nxt, beam)
            self.num_frames_decoded += 1

    def best_path(self, use_final_probs: bool = True
                  ) -> Optional[Tuple[List[int], List[int], float]]:
        best_tok, best_cost, final = None, INF, False
        if use_final_probs:
            for state, tok in self.cur.items():
                fw = self.fst.finals[state]
                if fw != TropicalWeight.zero and tok.cost + fw < best_cost:
                    best_cost = tok.cost + fw
                    best_tok = tok
                    final = True
        if best_tok is None:
            for state, tok in self.cur.items():
                if tok.cost < best_cost:
                    best_cost, best_tok = tok.cost, tok
        if best_tok is None:
            return None
        ali, words = [], []
        tok = best_tok
        while tok is not None:
            if tok.arc_ilabel != EPS:
                ali.append(tok.arc_ilabel)
            if tok.arc_olabel != EPS:
                words.append(tok.arc_olabel)
            tok = tok.prev
        ali.reverse()
        words.reverse()
        return ali, words, best_cost

    def final_relative_cost(self) -> float:
        """Difference between best final and best overall cost
        (lattice-faster-online-decoder FinalRelativeCost)."""
        best = min((t.cost for t in self.cur.values()), default=INF)
        best_final = min((t.cost + self.fst.finals[s]
                          for s, t in self.cur.items()
                          if self.fst.finals[s] != TropicalWeight.zero),
                         default=INF)
        return best_final - best


@dataclass
class EndpointRule:
    must_contain_nonsilence: bool = True
    min_trailing_silence: float = 1.0   # seconds
    max_relative_cost: float = float("inf")
    min_utterance_length: float = 0.0

    def active(self, utt_len: float, trailing_sil: float,
               relative_cost: float, contains_nonsilence: bool) -> bool:
        return ((contains_nonsilence or not self.must_contain_nonsilence)
                and trailing_sil >= self.min_trailing_silence
                and relative_cost <= self.max_relative_cost
                and utt_len >= self.min_utterance_length)


@dataclass
class OnlineEndpointConfig:
    """The reference's 5 default rules (online-endpoint.h:84)."""
    silence_phones: Sequence[int] = field(default_factory=list)
    rule1: EndpointRule = field(default_factory=lambda: EndpointRule(
        False, 5.0, float("inf"), 0.0))
    rule2: EndpointRule = field(default_factory=lambda: EndpointRule(
        True, 0.5, 2.0, 0.0))
    rule3: EndpointRule = field(default_factory=lambda: EndpointRule(
        True, 1.0, 8.0, 0.0))
    rule4: EndpointRule = field(default_factory=lambda: EndpointRule(
        True, 2.0, float("inf"), 0.0))
    rule5: EndpointRule = field(default_factory=lambda: EndpointRule(
        False, 0.0, float("inf"), 20.0))

    def rules(self):
        return [self.rule1, self.rule2, self.rule3, self.rule4, self.rule5]


def trailing_silence_frames(tm, alignment: Sequence[int],
                            silence_phones: Sequence[int]) -> int:
    sil = set(silence_phones)
    n = 0
    for tid in reversed(alignment):
        if tm.transition_id_to_phone(tid) in sil:
            n += 1
        else:
            break
    return n


def endpoint_detected(config: OnlineEndpointConfig, tm,
                      decoder: OnlineFasterDecoder,
                      frame_shift_seconds: float,
                      tid_alignment: Optional[Sequence[int]] = None) -> bool:
    """EndpointDetected (online-endpoint.h:175)."""
    if decoder.num_frames_decoded == 0:
        return False
    if tid_alignment is None:
        res = decoder.best_path(use_final_probs=False)
        if res is None:
            return False
        tid_alignment = res[0]
    trailing = trailing_silence_frames(tm, tid_alignment,
                                       config.silence_phones)
    trailing_s = trailing * frame_shift_seconds
    utt_s = decoder.num_frames_decoded * frame_shift_seconds
    contains_nonsil = trailing < len(tid_alignment)
    relative_cost = decoder.final_relative_cost()
    return any(r.active(utt_s, trailing_s, relative_cost, contains_nonsil)
               for r in config.rules())


class SingleUtteranceDecoder:
    """online2's SingleUtteranceNnet3Decoder shape: ties a feature
    pipeline, an acoustic scorer (callable feats->loglikes), and the
    online decoder together."""

    def __init__(self, hclg: VectorFst, tm, scorer,
                 pipeline, acoustic_scale: float = 0.1,
                 opts: Optional[FasterDecoderOptions] = None,
                 word_ins_penalty: float = 0.0):
        self.decoder = OnlineFasterDecoder(hclg, opts)
        self.tm = tm
        self.scorer = scorer
        self.pipeline = pipeline
        self.acoustic_scale = acoustic_scale
        self.word_ins_penalty = word_ins_penalty
        self._frames_consumed = 0

    def advance_decoding(self) -> None:
        ready = self.pipeline.num_frames_ready()
        if ready <= self._frames_consumed:
            return
        feats = self.pipeline.get_frames(self._frames_consumed, ready)
        loglikes = self.scorer(feats)
        self.decoder.advance_decoding(loglikes, self.tm.id2pdf_id,
                                      self.acoustic_scale,
                                      self.word_ins_penalty)
        self._frames_consumed = ready

    def finalize_decoding(self):
        return self.decoder.best_path(use_final_probs=True)

    def endpoint_detected(self, config: OnlineEndpointConfig,
                          frame_shift: float = 0.01) -> bool:
        return endpoint_detected(config, self.tm, self.decoder, frame_shift)


@dataclass
class OnlineGmmDecodingAdaptationPolicy:
    """When to (re-)estimate fMLLR within an utterance
    (online-gmm-decoding.h AdaptationPolicy: a few early re-estimates,
    then periodic)."""
    adaptation_frames: Sequence[int] = (100, 200, 400)
    adaptation_interval: int = 500   # after the listed marks
    min_frames: int = 50             # below this, keep the old transform


class OnlineGmmAdaptationState:
    """Speaker state carried across utterances
    (online-gmm-decoding.h OnlineGmmAdaptationState)."""

    def __init__(self):
        self.transform: Optional[np.ndarray] = None   # (D, D+1)


class SingleUtteranceGmmDecoder:
    """online2's SingleUtteranceGmmDecoder: GMM decoding with IN-LOOP
    basis-fMLLR — at the adaptation marks, the current partial
    traceback provides alignment posteriors, the basis-restricted
    fMLLR transform is re-estimated from the utterance's RAW features,
    and subsequent frames are decoded under the new transform. The
    estimated transform persists in the adaptation state for the next
    utterance."""

    def __init__(self, hclg: VectorFst, am, tm, pipeline,
                 basis=None,   # BasisFmllrEstimate or None (plain fMLLR)
                 adaptation_state: Optional[OnlineGmmAdaptationState] = None,
                 acoustic_scale: float = 0.1,
                 policy: Optional[OnlineGmmDecodingAdaptationPolicy] = None,
                 opts: Optional[FasterDecoderOptions] = None):
        self.decoder = OnlineFasterDecoder(hclg, opts)
        self.am = am
        self.tm = tm
        self.pipeline = pipeline
        self.basis = basis
        self.state = adaptation_state or OnlineGmmAdaptationState()
        self.acoustic_scale = acoustic_scale
        self.policy = policy or OnlineGmmDecodingAdaptationPolicy()
        self._frames_consumed = 0
        self._raw: List[np.ndarray] = []
        self._next_adapt = list(self.policy.adaptation_frames)
        self.num_adaptations = 0

    def _apply_transform(self, feats: np.ndarray) -> np.ndarray:
        W = self.state.transform
        if W is None:
            return feats
        ext = np.concatenate([feats, np.ones((len(feats), 1),
                                             feats.dtype)], axis=1)
        return (ext @ W.T).astype(feats.dtype)

    def advance_decoding(self) -> None:
        ready = self.pipeline.num_frames_ready()
        while self._frames_consumed < ready:
            # decode up to the next adaptation mark, then re-estimate
            stop = ready
            if self._next_adapt:
                stop = min(stop, self._next_adapt[0])
            elif self.policy.adaptation_interval > 0:
                k = self.policy.adaptation_interval
                stop = min(stop, ((self._frames_consumed // k) + 1) * k)
            if stop > self._frames_consumed:
                feats = self.pipeline.get_frames(self._frames_consumed,
                                                 stop)
                self._raw.append(np.asarray(feats))
                loglikes = self.am.log_likes_batch(
                    self._apply_transform(np.asarray(feats)))
                self.decoder.advance_decoding(np.asarray(loglikes),
                                              self.tm.id2pdf_id,
                                              self.acoustic_scale)
                self._frames_consumed = stop
            if self._next_adapt and self._frames_consumed >= \
                    self._next_adapt[0]:
                self._next_adapt.pop(0)
                self.estimate_fmllr()
            elif (not self._next_adapt
                  and self.policy.adaptation_interval > 0
                  and self._frames_consumed % self.policy.
                  adaptation_interval == 0):
                self.estimate_fmllr()

    def estimate_fmllr(self) -> bool:
        """Re-estimate the speaker transform from the current partial
        traceback; returns True if the transform was updated."""
        from kaldi_tpu.transform.fmllr import FmllrDiagGmmAccs
        res = self.decoder.best_path(use_final_probs=False)
        if res is None or not self._raw:
            return False
        ali = res[0]
        raw = np.concatenate(self._raw)[:len(res[0])]
        if len(ali) < self.policy.min_frames or len(ali) > raw.shape[0]:
            return False
        accs = FmllrDiagGmmAccs(raw.shape[1])
        accs.accumulate_from_alignment(self.am, self.tm,
                                       raw[:len(ali)], ali)
        if self.basis is not None:
            W, impr, n = self.basis.compute_transform(accs)
        else:
            W, impr = accs.update()
        if not np.isfinite(W).all():
            return False
        self.state.transform = W
        self.num_adaptations += 1
        return True

    def finalize_decoding(self):
        return self.decoder.best_path(use_final_probs=True)

    def get_adaptation_state(self) -> OnlineGmmAdaptationState:
        return self.state
