"""Kaldi-pitch features (capability parity: feat/pitch-functions.h:300,
the Ghahremani et al. 2014 NCCF+Viterbi tracker, and the
process-pitch post-processing that produces the 3-dim
(pov, normalized-log-pitch, delta-pitch) feature stream).

Batched TPU-first structure: the waveform is resampled to `resample_freq`,
framed once, and all NCCF lag correlations are computed as one
(frames × window) @ (window × lags) style batch of dot products; the
per-frame Viterbi over lag candidates (octave-jump penalty) runs on the
host (tiny state space)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from kaldi_tpu.feat.resample import LinearResample


@dataclass
class PitchExtractionOptions:
    samp_freq: float = field(default=16000.0, metadata={"name": "sample-frequency", "doc": "Waveform data sample frequency"})
    frame_shift_ms: float = field(default=10.0, metadata={"name": "frame-shift", "doc": "Frame shift in milliseconds"})
    frame_length_ms: float = field(default=25.0, metadata={"name": "frame-length", "doc": "Frame length in milliseconds"})
    min_f0: float = field(default=50.0, metadata={"doc": "min. F0 to search for (Hz)"})
    max_f0: float = field(default=400.0, metadata={"doc": "max. F0 to search for (Hz)"})
    resample_freq: float = field(default=4000.0, metadata={"doc": "Frequency that we down-sample the signal to"})
    penalty_factor: float = field(default=0.1, metadata={"doc": "cost factor for FO change"})
    nccf_ballast: float = field(default=7000.0, metadata={"doc": "Increasing this factor reduces NCCF for quiet frames"})
    soft_min_f0: float = field(default=10.0, metadata={"doc": "Minimum f0, applied in soft way; must not exceed min-f0"})
    lowpass_cutoff: float = field(default=1000.0, metadata={"doc": "cutoff frequency for LowPass filter (Hz)"})


@dataclass
class ProcessPitchOptions:
    pitch_scale: float = field(default=2.0, metadata={"doc": "Scaling factor for the final normalized log-pitch value"})
    pov_scale: float = field(default=2.0, metadata={"doc": "Scaling factor for final POV (probability of voicing) feature"})
    delta_pitch_scale: float = field(default=10.0, metadata={"doc": "Term to scale the final delta log-pitch feature"})
    normalization_left_context: int = 75
    normalization_right_context: int = 75
    add_pov_feature: bool = True
    add_normalized_log_pitch: bool = True
    add_delta_pitch: bool = True
    add_raw_log_pitch: bool = False


def compute_kaldi_pitch(wave: np.ndarray, opts: Optional[PitchExtractionOptions] = None
                        ) -> np.ndarray:
    """Returns (T, 2): [nccf_pov, pitch_hz] per 10ms frame."""
    if opts is None:
        opts = PitchExtractionOptions()
    wave = np.asarray(wave, np.float64)
    # 1. resample to resample_freq with lowpass
    if abs(opts.samp_freq - opts.resample_freq) > 1:
        rs = LinearResample(opts.samp_freq, opts.resample_freq,
                            filter_cutoff=opts.lowpass_cutoff, num_zeros=6)
        x = rs.resample(wave).astype(np.float64)
    else:
        x = wave
    fs = opts.resample_freq
    shift = int(fs * 0.001 * opts.frame_shift_ms)
    # NCCF needs window >= max lag + correlation support
    max_lag = int(fs / opts.min_f0)
    min_lag = max(1, int(fs / opts.max_f0))
    corr_win = int(fs * 0.001 * opts.frame_length_ms)
    frame_len = corr_win + max_lag
    if len(x) < frame_len:
        return np.zeros((0, 2), np.float32)
    T = 1 + (len(x) - frame_len) // shift
    idx = (np.arange(T)[:, None] * shift + np.arange(frame_len)[None, :])
    frames = x[idx]                                   # (T, frame_len)
    base = frames[:, :corr_win]
    base = base - base.mean(axis=1, keepdims=True)
    e1 = (base * base).sum(axis=1)
    lags = np.arange(min_lag, max_lag + 1)
    # batched correlations: for each lag l, dot(base, frames[l:l+corr_win]).
    # Two NCCF variants like the reference (pitch-functions.cc:133,978):
    # with ballast (for the Viterbi) and without (for POV).
    nccf = np.zeros((T, len(lags)))       # ballasted
    nccf_pov = np.zeros((T, len(lags)))   # un-ballasted
    mean_sq = (x * x).mean() + 1e-20
    ballast = opts.nccf_ballast * (mean_sq * corr_win) ** 2
    for j, l in enumerate(lags):
        seg = frames[:, l:l + corr_win]
        seg = seg - seg.mean(axis=1, keepdims=True)
        e2 = (seg * seg).sum(axis=1)
        num = (base * seg).sum(axis=1)
        norm_prod = e1 * e2
        nccf[:, j] = num / np.sqrt(norm_prod + ballast + 1e-20)
        nccf_pov[:, j] = num / np.sqrt(norm_prod + 1e-20)
    # 2. Viterbi over lag candidates with octave-jump penalty
    log_lags = np.log(lags.astype(np.float64))
    penalty = opts.penalty_factor
    # local cost (paper eq. 5): 1 - Phi(t,i) (1 - soft_min_f0 * L_i)
    # — the lag-in-seconds term breaks period-doubling ties toward the
    # true (shorter) period
    lag_seconds = lags / fs
    local = 1.0 - nccf * (1.0 - opts.soft_min_f0 * lag_seconds[None, :])
    Tn, L = local.shape
    cost = local[0].copy()
    bp = np.zeros((Tn, L), np.int32)
    for t in range(1, Tn):
        trans = penalty * (log_lags[None, :] - log_lags[:, None]) ** 2
        total = cost[:, None] + trans
        best_prev = np.argmin(total, axis=0)
        cost = total[best_prev, np.arange(L)] + local[t]
        bp[t] = best_prev
    path = np.zeros(Tn, np.int32)
    path[-1] = int(np.argmin(cost))
    for t in range(Tn - 1, 0, -1):
        path[t - 1] = bp[t, path[t]]
    pitch_hz = fs / lags[path]
    pov_nccf = nccf_pov[np.arange(Tn), path]
    return np.stack([pov_nccf, pitch_hz], axis=1).astype(np.float32)


def _nccf_to_pov(nccf: np.ndarray) -> np.ndarray:
    """NCCF -> probability of voicing (pitch-functions.cc NccfToPov
    polynomial fit)."""
    r = np.clip(nccf, -1.0, 1.0)
    a = np.abs(r)
    # the reference's learned polynomial
    ndash = -5.2 + 5.4 * np.exp(7.5 * (a - 1)) + 4.8 * a \
        - 2.0 * np.exp(-10 * a) + 4.2 * np.exp(20 * (a - 1))
    p = 1.0 / (1 + np.exp(-ndash))
    return p


def process_pitch(pitch: np.ndarray,
                  opts: Optional[ProcessPitchOptions] = None) -> np.ndarray:
    """(T, 2) [nccf, pitch_hz] -> pitch feature stream (typically 3-dim:
    pov-feature, normalized-log-pitch, delta-pitch)."""
    if opts is None:
        opts = ProcessPitchOptions()
    if pitch.shape[0] == 0:
        dim = sum([opts.add_pov_feature, opts.add_normalized_log_pitch,
                   opts.add_delta_pitch, opts.add_raw_log_pitch])
        return np.zeros((0, dim), np.float32)
    nccf, hz = pitch[:, 0], np.maximum(pitch[:, 1], 1e-3)
    log_pitch = np.log(hz)
    pov = _nccf_to_pov(nccf)
    T = len(nccf)
    cols = []
    if opts.add_pov_feature:
        cols.append(opts.pov_scale * _pov_feature(nccf))
    if opts.add_normalized_log_pitch:
        # POV-weighted moving-average subtraction
        norm = np.zeros(T)
        lw, rw = (opts.normalization_left_context,
                  opts.normalization_right_context)
        for t in range(T):
            lo, hi = max(0, t - lw), min(T, t + rw + 1)
            w = pov[lo:hi]
            norm[t] = (w * log_pitch[lo:hi]).sum() / max(w.sum(), 1e-8)
        cols.append(opts.pitch_scale * (log_pitch - norm))
    if opts.add_delta_pitch:
        delta = np.zeros(T)
        delta[1:-1] = (log_pitch[2:] - log_pitch[:-2]) / 2
        cols.append(opts.delta_pitch_scale * delta)
    if opts.add_raw_log_pitch:
        cols.append(log_pitch)
    return np.stack(cols, axis=1).astype(np.float32)


def _pov_feature(nccf: np.ndarray) -> np.ndarray:
    """The reference's pov 'feature' warping of NCCF."""
    r = np.clip(nccf, -1.0, 1.0)
    return 2.0 * (np.power((1.0001 - r), 0.15) - 1.0) * -1.0


def compute_and_process_kaldi_pitch(
        wave: np.ndarray,
        pitch_opts: Optional[PitchExtractionOptions] = None,
        process_opts: Optional[ProcessPitchOptions] = None) -> np.ndarray:
    return process_pitch(compute_kaldi_pitch(wave, pitch_opts),
                         process_opts)
