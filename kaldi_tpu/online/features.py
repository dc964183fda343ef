"""Streaming feature extraction (parity: feat/online-feature.h —
OnlineGenericBaseFeature:78, OnlineCmvn:321 with OnlineCmvnState:266,
OnlineSpliceFrames:458, OnlineDeltaFeature:530, OnlineAppendFeature;
online2/online-nnet2-feature-pipeline.h:200 pipeline).

Frames are computed in device batches as audio arrives: accept_waveform
buffers samples, and all newly-complete frames are extracted with one
batched call — the streaming state is only (sample buffer, frames
emitted), since frame extraction is a pure function of the waveform.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from kaldi_tpu.base.logging import KaldiTpuError
from kaldi_tpu.feat import window as win
from kaldi_tpu.feat.frontend import OfflineFeature
from kaldi_tpu.feat.functions import (DeltaFeaturesOptions, compute_deltas,
                                      delta_scales)


class OnlineFeatureInterface:
    """itf/online-feature-itf.h:49 contract."""

    def dim(self) -> int:
        raise NotImplementedError

    def num_frames_ready(self) -> int:
        raise NotImplementedError

    def is_last_frame(self, frame: int) -> bool:
        raise NotImplementedError

    def get_frame(self, frame: int) -> np.ndarray:
        return self.get_frames([frame])[0]

    def get_frames(self, frames) -> np.ndarray:
        return np.stack([self.get_frame(f) for f in frames])


class OnlineFeature(OnlineFeatureInterface):
    """OnlineGenericBaseFeature: streaming MFCC/PLP/fbank."""

    def __init__(self, opts):
        self.computer = OfflineFeature(opts)
        self.opts = opts
        self.fo = opts.frame_opts
        self.waveform: List[np.ndarray] = []
        self.num_samples = 0
        self.input_finished = False
        self._frames: List[np.ndarray] = []
        self.samp_freq_checked = False

    def dim(self) -> int:
        return self.computer.dim()

    def accept_waveform(self, samp_freq: float, wave: np.ndarray) -> None:
        if self.input_finished:
            raise KaldiTpuError("accept_waveform after input_finished")
        if abs(samp_freq - self.fo.samp_freq) > 0.01:
            raise KaldiTpuError("sample rate mismatch")
        wave = np.asarray(wave, np.float32).reshape(-1)
        if wave.size:
            self.waveform.append(wave)
            self.num_samples += len(wave)
        self._compute_ready()

    def finish_input(self) -> None:
        self.input_finished = True
        self._compute_ready()

    input_finished_fn = finish_input

    def _compute_ready(self) -> None:
        total = win.num_frames(self.num_samples, self.fo,
                               flush=self.input_finished)
        have = len(self._frames)
        if total <= have:
            return
        wave = (np.concatenate(self.waveform) if self.waveform
                else np.zeros(0, np.float32))
        # compute all frames [have, total) in one batched call
        feats = self.computer.compute_batch([wave])[0] \
            if self.input_finished else self._partial(wave, total)
        for f in range(have, min(total, feats.shape[0])):
            self._frames.append(feats[f])

    def _partial(self, wave: np.ndarray, total: int) -> np.ndarray:
        # offline computation over the received prefix: with
        # snip_edges=True every complete frame is final, so recomputation
        # matches streaming emission exactly
        return self.computer.compute_batch([wave])[0]

    def num_frames_ready(self) -> int:
        return len(self._frames)

    def is_last_frame(self, frame: int) -> bool:
        return (self.input_finished
                and frame == self.num_frames_ready() - 1)

    def get_frame(self, frame: int) -> np.ndarray:
        return self._frames[frame]


@dataclass
class OnlineCmvnOptions:
    cmn_window: int = field(default=600, metadata={"doc": "Number of frames of sliding context for cepstral mean normalization"})
    speaker_frames: int = field(default=600, metadata={"doc": "Number of frames of previous utterance(s) from this speaker to use in cepstral mean normalization"})
    global_frames: int = field(default=200, metadata={"doc": "Number of frames of global-average stats to use for cepstral mean normalization"})
    normalize_mean: bool = field(default=True, metadata={"doc": "If true, do mean normalization"})
    normalize_variance: bool = field(default=False, metadata={"doc": "If true, normalize variance to one"})


@dataclass
class OnlineCmvnState:
    """online-feature.h:266 — carried between utterances of a speaker."""
    speaker_cmvn_stats: Optional[np.ndarray] = None  # (2, dim+1)
    global_cmvn_stats: Optional[np.ndarray] = None
    frozen_state: Optional[np.ndarray] = None


class OnlineCmvn(OnlineFeatureInterface):
    def __init__(self, opts: OnlineCmvnOptions, state: OnlineCmvnState,
                 src: OnlineFeatureInterface):
        self.opts = opts
        self.state = state
        self.src = src
        self._cumulative: List[np.ndarray] = []  # prefix sums (2, dim+1)

    def dim(self) -> int:
        return self.src.dim()

    def num_frames_ready(self) -> int:
        return self.src.num_frames_ready()

    def is_last_frame(self, frame):
        return self.src.is_last_frame(frame)

    def _stats_up_to(self, t: int) -> np.ndarray:
        """Cumulative raw stats over frames [0, t]."""
        dim = self.dim()
        while len(self._cumulative) <= t:
            i = len(self._cumulative)
            x = self.src.get_frame(i).astype(np.float64)
            row = np.zeros((2, dim + 1))
            row[0, :dim] = x
            row[0, dim] = 1.0
            row[1, :dim] = x * x
            if i:
                row += self._cumulative[-1]
            self._cumulative.append(row)
        return self._cumulative[t]

    def get_frame(self, t: int) -> np.ndarray:
        opts = self.opts
        dim = self.dim()
        x = np.asarray(self.src.get_frame(t), np.float32)
        if self.state.frozen_state is not None:
            stats = self.state.frozen_state
        else:
            upto = self._stats_up_to(t)
            lo = t - opts.cmn_window
            stats = upto - self._stats_up_to(lo) if lo >= 0 else upto.copy()
            count = stats[0, dim]
            # augment from speaker then global stats (online-feature.cc
            # smoothing)
            if count < opts.cmn_window:
                sp = self.state.speaker_cmvn_stats
                if sp is not None and sp[0, dim] > 0:
                    take = min(opts.speaker_frames, opts.cmn_window - count)
                    stats = stats + sp * (take / sp[0, dim])
                    count = stats[0, dim]
            if count < opts.cmn_window:
                gl = self.state.global_cmvn_stats
                if gl is not None and gl[0, dim] > 0:
                    take = min(opts.global_frames, opts.cmn_window - count)
                    stats = stats + gl * (take / gl[0, dim])
        from kaldi_tpu.feat.functions import apply_cmvn
        if not self.opts.normalize_mean:
            return x
        return apply_cmvn(x[None, :], stats,
                          norm_vars=opts.normalize_variance)[0]

    def freeze(self, t: int) -> None:
        """Freeze the normalization at frame t (used when i-vectors take
        over adaptation)."""
        upto = self._stats_up_to(t)
        lo = t - self.opts.cmn_window
        self.state.frozen_state = (upto - self._stats_up_to(lo)
                                   if lo >= 0 else upto.copy())

    def get_state(self, t: int) -> OnlineCmvnState:
        """State to carry to the next utterance of this speaker."""
        new = OnlineCmvnState(global_cmvn_stats=self.state.global_cmvn_stats)
        utt = self._stats_up_to(t) if t >= 0 else None
        prev = self.state.speaker_cmvn_stats
        tot = None
        for s in (prev, utt):
            if s is not None:
                tot = s if tot is None else tot + s
        new.speaker_cmvn_stats = tot
        return new


class OnlineSpliceFrames(OnlineFeatureInterface):
    def __init__(self, left_context: int, right_context: int,
                 src: OnlineFeatureInterface):
        self.left = left_context
        self.right = right_context
        self.src = src

    def dim(self):
        return self.src.dim() * (self.left + self.right + 1)

    def num_frames_ready(self):
        n = self.src.num_frames_ready()
        if n == 0:
            return 0
        if self.src.is_last_frame(n - 1):
            return n
        return max(0, n - self.right)

    def is_last_frame(self, frame):
        return self.src.is_last_frame(self.src.num_frames_ready() - 1) \
            and frame == self.num_frames_ready() - 1

    def get_frame(self, t):
        n = self.src.num_frames_ready()
        parts = []
        for off in range(-self.left, self.right + 1):
            idx = min(max(t + off, 0), n - 1)
            parts.append(self.src.get_frame(idx))
        return np.concatenate(parts)


class OnlineDeltaFeature(OnlineFeatureInterface):
    def __init__(self, opts: DeltaFeaturesOptions,
                 src: OnlineFeatureInterface):
        self.opts = opts
        self.src = src
        self.scales = delta_scales(opts)
        self.context = (len(self.scales[-1]) - 1) // 2

    def dim(self):
        return self.src.dim() * (self.opts.order + 1)

    def num_frames_ready(self):
        n = self.src.num_frames_ready()
        if n == 0:
            return 0
        if self.src.is_last_frame(n - 1):
            return n
        return max(0, n - self.context)

    def is_last_frame(self, frame):
        return self.src.is_last_frame(self.src.num_frames_ready() - 1) \
            and frame == self.num_frames_ready() - 1

    def get_frame(self, t):
        n = self.src.num_frames_ready()
        out = []
        for scales in self.scales:
            mo = (len(scales) - 1) // 2
            acc = None
            for j in range(-mo, mo + 1):
                s = scales[j + mo]
                if s == 0.0:
                    continue
                idx = min(max(t + j, 0), n - 1)
                v = s * self.src.get_frame(idx)
                acc = v if acc is None else acc + v
            out.append(acc)
        return np.concatenate(out)


class OnlineTransform(OnlineFeatureInterface):
    """Apply a linear or affine transform (e.g. LDA+MLLT or fMLLR) to
    an online feature stream (online-feature.h OnlineTransform)."""

    def __init__(self, mat: np.ndarray, src: OnlineFeatureInterface):
        mat = np.asarray(mat, np.float32)
        self.src = src
        if mat.shape[1] == src.dim() + 1:   # affine: offset column
            self.linear = mat[:, :-1]
            self.offset = mat[:, -1]
        else:
            self.linear = mat
            self.offset = np.zeros(mat.shape[0], np.float32)

    def dim(self):
        return self.linear.shape[0]

    def num_frames_ready(self):
        return self.src.num_frames_ready()

    def is_last_frame(self, frame):
        return self.src.is_last_frame(frame)

    def get_frame(self, t):
        return self.linear @ self.src.get_frame(t) + self.offset


class OnlineAppendFeature(OnlineFeatureInterface):
    def __init__(self, src1, src2):
        self.src1, self.src2 = src1, src2

    def dim(self):
        return self.src1.dim() + self.src2.dim()

    def num_frames_ready(self):
        return min(self.src1.num_frames_ready(),
                   self.src2.num_frames_ready())

    def is_last_frame(self, frame):
        return (self.src1.is_last_frame(frame)
                or self.src2.is_last_frame(frame))

    def get_frame(self, t):
        return np.concatenate([self.src1.get_frame(t),
                               self.src2.get_frame(t)])


class OnlineFeaturePipeline:
    """online2 feature pipeline: base feature [+ cmvn] [+ splice/delta]
    [+ i-vectors via OnlineAppendFeature] — construct with the pieces
    you need; this wrapper manages waveform flow + final interface."""

    def __init__(self, base: OnlineFeature,
                 output: Optional[OnlineFeatureInterface] = None):
        self.base = base
        self.output = output or base

    def accept_waveform(self, samp_freq, wave):
        self.base.accept_waveform(samp_freq, wave)

    def input_finished(self):
        self.base.finish_input()

    def dim(self):
        return self.output.dim()

    def num_frames_ready(self):
        return self.output.num_frames_ready()

    def get_frames(self, lo: int, hi: int) -> np.ndarray:
        return np.stack([self.output.get_frame(t) for t in range(lo, hi)]) \
            if hi > lo else np.zeros((0, self.dim()), np.float32)


class OnlinePitchFeature(OnlineFeatureInterface):
    """Latency-controlled online pitch (parity: feat/pitch-functions.cc
    OnlinePitchFeature + online-feature.cc OnlineProcessPitch).

    The Viterbi lag decisions for recent frames can change as more
    audio arrives, so frames within `max_frames_latency` of the end of
    the stream are PROVISIONAL: they are re-estimated on every
    accept_waveform() (full recomputation over a bounded trailing
    window) and only become final once they fall more than the latency
    window (plus the normalization right-context) behind the newest
    frame, or when input_finished() is called.

    Like the reference's online pitch, finalized frames may differ
    from the offline two-pass output when the global Viterbi backtrace
    would have revised a lag beyond the latency window — in practice
    this happens only in unvoiced/silence regions where pitch is
    ill-defined (voiced frames match exactly); with
    max_frames_latency >= the stream length the output is
    bit-identical to compute_and_process_kaldi_pitch().
    """

    def __init__(self, pitch_opts=None, process_opts=None,
                 max_frames_latency: int = 30):
        from kaldi_tpu.feat.pitch import (PitchExtractionOptions,
                                          ProcessPitchOptions,
                                          compute_and_process_kaldi_pitch)
        self.pitch_opts = pitch_opts or PitchExtractionOptions()
        self.process_opts = process_opts or ProcessPitchOptions()
        self._compute = compute_and_process_kaldi_pitch
        self.max_frames_latency = max_frames_latency
        self.waveform: List[np.ndarray] = []
        self.num_samples = 0
        self.finished = False
        self._feats = np.zeros((0, 3), np.float32)
        self._num_final = 0

    def dim(self) -> int:
        return self._feats.shape[1] if self._feats.size else 3

    def accept_waveform(self, samp_freq: float,
                        waveform: np.ndarray) -> None:
        assert not self.finished
        if abs(samp_freq - self.pitch_opts.samp_freq) > 1e-3:
            raise ValueError("sampling frequency mismatch")
        self.waveform.append(np.asarray(waveform, np.float32))
        self.num_samples += len(waveform)
        self._recompute()

    def input_finished(self) -> None:
        self.finished = True
        self._recompute()
        self._num_final = self._feats.shape[0]

    def _recompute(self) -> None:
        wave = np.concatenate(self.waveform) if self.waveform else \
            np.zeros(0, np.float32)
        if len(wave) < int(0.025 * self.pitch_opts.samp_freq):
            return
        feats = self._compute(wave, self.pitch_opts, self.process_opts)
        # frames already finalized must not change
        if self._num_final:
            feats = np.concatenate([self._feats[:self._num_final],
                                    feats[self._num_final:]])
        self._feats = feats
        if not self.finished:
            # a frame is final only when its normalization window's
            # rightmost frame (t + right_context) is itself past the
            # Viterbi revision window — so the lags ADD, not max
            lag = (self.max_frames_latency
                   + self.process_opts.normalization_right_context)
            self._num_final = max(self._num_final, feats.shape[0] - lag)

    def num_frames_ready(self) -> int:
        return self._feats.shape[0]

    def is_last_frame(self, frame: int) -> bool:
        return self.finished and frame == self._feats.shape[0] - 1

    def get_frame(self, frame: int) -> np.ndarray:
        return self._feats[frame]

    def get_frames(self, frames) -> np.ndarray:
        return self._feats[np.asarray(frames)]
