"""Frame extraction: options, frame counting and window functions.

Behavioral parity with feat/feature-window.{h,cc} (FrameExtractionOptions
feature-window.h:35-116, NumFrames/FirstSampleOfFrame feature-window.cc:31-88,
FeatureWindowFunction feature-window.cc:110): dither → DC removal →
(raw energy) → pre-emphasis → window multiply, 25ms/10ms povey-window
defaults, snip-edges frame counting, reflection padding otherwise.

The per-frame loop of the reference is re-designed as a batched gather:
`frame_indices` builds an index matrix (frames × window) once per
(num_frames, length) shape; all subsequent math is vectorized and jitted
in the frontend module.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


def round_up_to_nearest_power_of_two(n: int) -> int:
    assert n > 0
    p = 1
    while p < n:
        p *= 2
    return p


@dataclass
class FrameExtractionOptions:
    samp_freq: float = field(default=16000.0, metadata={
        "name": "sample-frequency",
        "doc": "Waveform data sample frequency"})
    frame_shift_ms: float = field(default=10.0, metadata={
        "name": "frame-shift", "doc": "Frame shift in milliseconds"})
    frame_length_ms: float = field(default=25.0, metadata={
        "name": "frame-length", "doc": "Frame length in milliseconds"})
    dither: float = field(default=1.0, metadata={"doc": "Dithering constant (0.0 means no dither)"})
    preemph_coeff: float = field(default=0.97, metadata={
        "name": "preemphasis-coefficient",
        "doc": "Coefficient for use in signal preemphasis"})
    remove_dc_offset: bool = field(default=True, metadata={"doc": "Subtract mean from waveform on each frame"})
    window_type: str = field(default="povey", metadata={"doc": "Type of window (hamming|hanning|povey|rectangular|sine|blackman)"})
    round_to_power_of_two: bool = field(default=True, metadata={"doc": "Round window size to power of two by zero-padding input to FFT"})
    blackman_coeff: float = field(default=0.42, metadata={"doc": "Constant coefficient for generalized Blackman window"})
    snip_edges: bool = field(default=True, metadata={"doc": "Output only frames that fit completely in the file"})
    allow_downsample: bool = False
    allow_upsample: bool = False
    max_feature_vectors: int = -1

    def window_shift(self) -> int:
        return int(self.samp_freq * 0.001 * self.frame_shift_ms)

    def window_size(self) -> int:
        return int(self.samp_freq * 0.001 * self.frame_length_ms)

    def padded_window_size(self) -> int:
        if self.round_to_power_of_two:
            return round_up_to_nearest_power_of_two(self.window_size())
        return self.window_size()


def first_sample_of_frame(frame: int, opts: FrameExtractionOptions) -> int:
    shift = opts.window_shift()
    if opts.snip_edges:
        return frame * shift
    midpoint = shift * frame + shift // 2
    return midpoint - opts.window_size() // 2


def num_frames(num_samples: int, opts: FrameExtractionOptions,
               flush: bool = True) -> int:
    shift = opts.window_shift()
    length = opts.window_size()
    if opts.snip_edges:
        if num_samples < length:
            return 0
        return 1 + (num_samples - length) // shift
    n = (num_samples + shift // 2) // shift
    if flush:
        return n
    end_of_last = first_sample_of_frame(n - 1, opts) + length
    while n > 0 and end_of_last > num_samples:
        n -= 1
        end_of_last -= shift
    return n


def feature_window_function(opts: FrameExtractionOptions) -> np.ndarray:
    """The window vector (float64 math then f32, like the reference)."""
    m = opts.window_size()
    a = 2.0 * np.pi / (m - 1)
    i = np.arange(m, dtype=np.float64)
    wt = opts.window_type
    if wt == "hanning":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif wt == "sine":
        w = np.sin(0.5 * a * i)
    elif wt == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif wt == "povey":
        w = np.power(0.5 - 0.5 * np.cos(a * i), 0.85)
    elif wt == "rectangular":
        w = np.ones(m)
    elif wt == "blackman":
        w = (opts.blackman_coeff - 0.5 * np.cos(a * i)
             + (0.5 - opts.blackman_coeff) * np.cos(2 * a * i))
    else:
        raise ValueError(f"invalid window type {wt!r}")
    return w.astype(np.float32)


def frame_indices(max_frames: int, wave_len: int,
                  opts: FrameExtractionOptions) -> np.ndarray:
    """Index matrix (max_frames, window_size) into a zero-padded waveform
    buffer of length `wave_len`. Reflection around utterance edges is
    applied later (it depends on the per-utterance true length)."""
    starts = np.array([first_sample_of_frame(f, opts)
                       for f in range(max_frames)], dtype=np.int32)
    offs = np.arange(opts.window_size(), dtype=np.int32)
    return starts[:, None] + offs[None, :]


def reflect_indices(idx, n):
    """Reflect indices into [0, n) about the edges (feature-window.cc:205
    convention: -1 -> 0, n -> n-1). Two passes handle all practical cases
    (window ≤ 2×utterance)."""
    import jax.numpy as jnp
    for _ in range(2):
        idx = jnp.where(idx < 0, -idx - 1, idx)
        idx = jnp.where(idx >= n, 2 * n - 1 - idx, idx)
    return jnp.clip(idx, 0, n - 1)
